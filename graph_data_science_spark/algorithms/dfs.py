"""Depth-first search (reference ``gds.dfs`` — SURVEY.md §2.D Path
family): the visit ORDER from a source node, children explored
smallest-vid-first (the reference uses insertion order; a total order
makes ours deterministic).

Honesty note on the execution model: DFS visit order is inherently
sequential — node k's position depends on the entire traversal before it
— so there is no BSP/frontier formulation (this is why DFS was the one
§2.D item documented out of scope in rounds 1-2; the reference's own
implementation is single-threaded too). The Spark-first compromise:

1. the REACHABLE node set is computed distributively (the engine's BFS —
   one frontier superstep loop, cluster-scale);
2. the induced adjacency on that set is bounded by ``max_nodes`` and
   only then collected to the driver for the sequential visit-order walk
   (the part that cannot be parallelized anyway);
3. exceeding the bound raises instead of silently collecting a 100-TB
   graph — callers page with ``max_depth`` or raise the bound knowingly.

So the distributed part does the data-sized work (finding the reachable
subgraph), and the driver does only the inherently-sequential part on an
explicitly bounded state — the same discipline as the path-walk collects
in paths.py (guarded by a row threshold).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.projection import ProjectedGraph


@dataclass
class DfsResult:
    visits: DataFrame  # (vid, visit_order)
    visited_count: int
    metrics: list[dict] = field(default_factory=list)


def dfs(
    graph: ProjectedGraph,
    source_node,
    max_depth: int | None = None,
    max_nodes: int = 100_000,
) -> DfsResult:
    """→ (vid, visit_order) in deterministic DFS preorder from
    ``source_node`` (an original node id). ``max_depth`` bounds the BFS
    reachability pass AND the stack depth; ``max_nodes`` bounds the
    driver-side adjacency collect (raises when exceeded)."""
    from graph_data_science_spark.algorithms.paths import bfs

    spark = graph.nodes.sparkSession
    src_row = graph.nodes.filter(F.col("orig_id") == source_node).select("vid").collect()
    if not src_row:
        raise ValueError(f"source_node {source_node!r} not in graph")
    src = int(src_row[0]["vid"])

    reach = bfs(graph, [source_node], max_iterations=max_depth or 1000)
    reachable = reach.distances.select("vid")
    n_reach = reachable.count()
    if n_reach > max_nodes:
        raise ValueError(
            f"DFS reachable set ({n_reach}) exceeds max_nodes ({max_nodes}); "
            "DFS visit order is inherently sequential — bound the traversal "
            "with max_depth or raise max_nodes explicitly"
        )
    # induced adjacency, collected only after the bound check
    r1 = reachable.withColumnRenamed("vid", "src")
    r2 = reachable.withColumnRenamed("vid", "dst")
    adj_rows = (
        graph.edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .join(r1, "src")
        .join(r2, "dst")
        .collect()
    )
    adj: dict[int, list[int]] = {}
    for r in adj_rows:
        adj.setdefault(r["src"], []).append(r["dst"])
    for k in adj:
        adj[k].sort(reverse=True)  # pop() yields smallest-vid first

    # mark-on-POP (duplicates allowed on the stack): this reproduces the
    # exact recursive preorder; mark-on-push would reorder revisits
    order: list[tuple[int, int]] = []
    seen: set[int] = set()
    stack: list[tuple[int, int]] = [(src, 0)]  # (vid, depth)
    while stack:
        v, d = stack.pop()
        if v in seen:
            continue
        seen.add(v)
        order.append((v, len(order)))
        if max_depth is not None and d >= max_depth:
            continue
        for w in adj.get(v, []):  # reverse-sorted → smallest popped first
            if w not in seen:
                stack.append((w, d + 1))
    visits = spark.createDataFrame(order, "vid long, visit_order long")
    return DfsResult(visits=visits, visited_count=len(order))
