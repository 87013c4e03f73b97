"""Betweenness centrality (reference ``gds.betweenness`` — Brandes 2001
with source sampling, SURVEY.md §2.D Centrality).

Per sampled source s, two level-synchronous passes over the directed
graph:

1. **Forward** (BFS wave): ``dist(v)``, and the shortest-path counts
   ``σ(v) = Σ σ(u)`` over predecessors u (``dist(u) = dist(v) − 1``).
   One join + sum-reduce per level — the same superstep shape as BFS with
   a sum instead of a min.
2. **Backward** (dependency accumulation, deepest level first):
   ``δ(v) += σ(v)/σ(w) · (1 + δ(w))`` over successors w one level deeper.
   One join per level, walking levels down.

``betweenness(v) = Σ_s δ_s(v)`` over the sampled sources (exact when
``sampling_size`` ≥ node count — then every node is a source, the full
Brandes). Sampling is deterministic: the ``sampling_size`` smallest vids
(upstream samples randomly; determinism is load-bearing for our parity
and resume story).

Scale shape: each source costs O(diameter) superstep jobs over the shared
persisted edge table; sources are independent, so on a real cluster they
can be dispatched as separate jobs in parallel (driver threads) — kept
sequential here for determinism of measurement, not of results.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graph_data_science_spark.projection import ProjectedGraph


@dataclass
class BetweennessResult:
    scores: DataFrame  # (vid, score)
    sources_used: int


def _single_source_dependencies(edges: DataFrame, nodes: DataFrame, src_vid: int) -> DataFrame:
    """δ_s per vid (0 where unreached / the source itself)."""
    # forward: (vid, dist, sigma), wave by wave
    levels = [
        nodes.sparkSession.createDataFrame(
            [(src_vid, 0, 1.0)], "vid long, dist int, sigma double"
        ).localCheckpoint(eager=True)
    ]
    visited = levels[0].select("vid").localCheckpoint(eager=True)
    d = 0
    while True:
        frontier = levels[-1]
        nxt = (
            frontier.join(edges, frontier["vid"] == edges["src"])
            .join(visited.withColumnRenamed("vid", "dst"), "dst", "left_anti")
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.sum("sigma").alias("sigma"))
            .select("vid", F.lit(d + 1).alias("dist"), "sigma")
            .localCheckpoint(eager=True)
        )
        if nxt.limit(1).count() == 0:
            break
        levels.append(nxt)
        visited = visited.unionByName(nxt.select("vid")).localCheckpoint(eager=True)
        d += 1

    # backward: deepest level first
    delta = levels[-1].select("vid", F.lit(0.0).alias("delta"))
    acc = [delta]
    for l in range(len(levels) - 1, 0, -1):
        below = acc[-1].join(levels[l], "vid").select(
            "vid", "sigma", (F.lit(1.0) + F.col("delta")).alias("factor")
        )
        contrib = (
            edges.join(below.withColumnRenamed("vid", "dst"), "dst")
            .join(
                levels[l - 1].select(F.col("vid").alias("src"), F.col("sigma").alias("sigma_u")),
                "src",
            )
            .groupBy(F.col("src").alias("vid"))
            .agg(F.sum(F.col("sigma_u") / F.col("sigma") * F.col("factor")).alias("d_in"))
        )
        up = (
            levels[l - 1].select("vid")
            .join(contrib, "vid", "left")
            .select("vid", F.coalesce("d_in", F.lit(0.0)).alias("delta"))
            .localCheckpoint(eager=True)
        )
        acc.append(up)

    deps = acc[0].select("vid", "delta")
    for a in acc[1:]:
        deps = deps.unionByName(a)
    return deps.filter(F.col("vid") != src_vid)


def betweenness(
    graph: ProjectedGraph,
    sampling_size: int | None = None,
) -> BetweennessResult:
    """→ (vid, score). ``sampling_size=None`` uses every node (exact
    Brandes); otherwise the ``sampling_size`` smallest vids are sources."""
    edges = graph.edges.select("src", "dst").distinct().persist(
        StorageLevel.MEMORY_AND_DISK
    )
    edges.count()
    n_sources = (
        graph.node_count if sampling_size is None else min(sampling_size, graph.node_count)
    )
    nodes = graph.nodes.select("vid")
    total = None
    for s in range(n_sources):
        deps = _single_source_dependencies(edges, nodes, s)
        total = deps if total is None else total.unionByName(deps)
        if (s + 1) % 8 == 0 and total is not None:
            total = total.groupBy("vid").agg(F.sum("delta").alias("delta")).localCheckpoint(
                eager=True
            )
    if total is None:
        scores = nodes.select("vid", F.lit(0.0).alias("score"))
    else:
        summed = total.groupBy("vid").agg(F.sum("delta").alias("score"))
        scores = (
            nodes.join(summed, "vid", "left")
            .select("vid", F.coalesce("score", F.lit(0.0)).alias("score"))
        )
    edges.unpersist()
    return BetweennessResult(scores=scores, sources_used=n_sources)
