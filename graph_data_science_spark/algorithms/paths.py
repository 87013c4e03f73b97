"""Path-finding algorithms (SURVEY.md §2.D Path family): BFS hop counts
and single-source shortest paths, both as frontier supersteps on the
Pregel harness — the same min-reduce kernel as WCC, with distance instead
of label.

- ``bfs``: level-synchronous — superstep i settles exactly the nodes at
  hop distance i; the frontier (newly settled nodes) is the only state
  that emits messages, so late supersteps touch only the growing wave,
  not the whole graph.
- ``sssp``: label-correcting Bellman-Ford (``dist_v ← min(dist_v,
  min_{u→v} dist_u + w_uv)``), frontier = nodes whose distance improved.
  Converges in ≤ longest-shortest-path-hops supersteps; negative weights
  are rejected (GDS Dijkstra/Delta-stepping semantics — non-negative
  weights only). This is the distributed delta-relaxation shape
  (delta-stepping without the bucket ordering, which a BSP frontier
  subsumes at the cost of re-relaxations).

Unreached nodes are omitted from the result (the reference streams only
reached nodes).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.plans.messaging import EdgePlan
from graph_data_science_spark.plans.pregel import run_pregel
from graph_data_science_spark.projection import ProjectedGraph

_INF = float("inf")


@dataclass
class PathResult:
    distances: DataFrame  # (vid, distance)
    iterations: int
    metrics: list[dict] = field(default_factory=list)


def _source_vids(graph: ProjectedGraph, sources) -> DataFrame:
    """Original source ids → vid set."""
    src_df = graph.nodes.sparkSession.createDataFrame(
        [(s,) for s in sources], ["orig_id"]
    )
    return graph.nodes.join(F.broadcast(src_df), "orig_id").select("vid")


def _relax(
    graph: ProjectedGraph,
    sources,
    weighted: bool,
    max_iterations: int,
    edge_plan: EdgePlan | None = None,
) -> PathResult:
    if weighted:
        neg = graph.edges.filter(F.col("weight") < 0).limit(1).count()
        if neg:
            raise ValueError("sssp requires non-negative edge weights")
    plan = edge_plan or EdgePlan(graph.edges)
    srcs = _source_vids(graph, sources)
    init = (
        graph.nodes.select("vid")
        .join(srcs.withColumn("_s", F.lit(1)), "vid", "left")
        .select(
            "vid",
            F.when(F.col("_s").isNotNull(), F.lit(0.0)).otherwise(F.lit(_INF)).alias("dist"),
            F.when(F.col("_s").isNotNull(), F.lit(1)).otherwise(F.lit(0)).alias("changed"),
        )
    )
    step_w = F.col("weight") if weighted else F.lit(1.0)

    def step(state: DataFrame, i: int) -> DataFrame:
        frontier = state.filter(F.col("changed") == 1).select("vid", "dist")
        msgs = plan.messages(
            frontier, {"m": F.col("dist") + step_w}, {"m": F.min("m")}
        )
        better = F.least(F.col("dist"), F.coalesce(F.col("m"), F.col("dist")))
        return state.join(msgs, "vid", "left").select(
            "vid",
            better.alias("dist"),
            (better < F.col("dist")).cast("int").alias("changed"),
        )

    def metrics(state: DataFrame, i: int) -> dict:
        return {"changed": int(state.agg(F.sum("changed")).collect()[0][0] or 0)}

    res = run_pregel(
        init,
        step,
        max_iterations=max_iterations,
        metrics_fn=metrics,
        stop_fn=lambda m, i: m["changed"] == 0,
    )
    if edge_plan is None:
        plan.unpersist()
    reached = res.state.filter(F.col("dist") != _INF).select(
        "vid", F.col("dist").alias("distance")
    )
    return PathResult(distances=reached, iterations=res.iterations, metrics=res.metrics)


def bfs(
    graph: ProjectedGraph,
    sources,
    max_iterations: int = 1000,
    edge_plan: EdgePlan | None = None,
) -> PathResult:
    """Hop distance from the source set → (vid, distance)."""
    return _relax(graph, sources, weighted=False, max_iterations=max_iterations, edge_plan=edge_plan)


def sssp(
    graph: ProjectedGraph,
    sources,
    max_iterations: int = 1000,
    edge_plan: EdgePlan | None = None,
) -> PathResult:
    """Weighted shortest-path distance from the source set → (vid, distance)."""
    return _relax(graph, sources, weighted=True, max_iterations=max_iterations, edge_plan=edge_plan)


def all_pairs_hops(
    graph: ProjectedGraph, sources: DataFrame | None = None, max_iterations: int = 1000
) -> DataFrame:
    """Multi-source BFS: hop distances for every (source, node) pair in
    ONE superstep loop (the reference's MS-BFS idea, relationally:
    the frontier is (src, vid) pairs instead of per-source bitsets).
    → (src, vid, hops). ``sources=None`` uses every node (exact
    all-pairs; state is O(n · reach) — sample sources at scale).
    """
    from pyspark.storagelevel import StorageLevel

    edges = graph.edges.select(F.col("src").alias("u"), F.col("dst").alias("v")).distinct()
    edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
    edges.count()
    if sources is None:
        sources = graph.nodes.select("vid")
    settled = sources.select(
        F.col("vid").alias("src"), F.col("vid").alias("vid"), F.lit(0).alias("hops")
    ).localCheckpoint(eager=True)
    frontier = settled
    d = 0
    while d < max_iterations:
        nxt = (
            frontier.join(edges, frontier["vid"] == edges["u"])
            .select("src", F.col("v").alias("vid"))
            .distinct()
            .join(settled.select("src", "vid"), ["src", "vid"], "left_anti")
            .withColumn("hops", F.lit(d + 1))
            .localCheckpoint(eager=True)
        )
        if nxt.limit(1).count() == 0:
            break
        settled = settled.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
        d += 1
    edges.unpersist()
    return settled


def closeness(
    graph: ProjectedGraph,
    wasserman_faust: bool = False,
    max_iterations: int = 1000,
) -> DataFrame:
    """Closeness centrality (reference ``gds.closeness``) via multi-source
    BFS: c(v) = (r−1) / Σ_u d(v,u) over the r nodes v reaches along
    out-edges; the Wasserman-Faust variant multiplies by (r−1)/(n−1).
    → (vid, closeness, harmonic): harmonic c_h(v) = Σ 1/d / (n−1) comes
    free from the same pair table. (Run on ``graph.to_undirected()`` or a
    REVERSE projection for undirected / in-distance variants.)"""
    pairs = all_pairs_hops(graph, max_iterations=max_iterations)
    n = max(graph.node_count, 1)
    per = pairs.filter(F.col("hops") > 0).groupBy("src").agg(
        F.count(F.lit(1)).alias("r1"),  # reached minus self
        F.sum("hops").alias("sum_d"),
        F.sum(1.0 / F.col("hops")).alias("sum_inv"),
    )
    base = F.col("r1") / F.col("sum_d")
    c = base * ((F.col("r1")) / F.lit(float(n - 1))) if wasserman_faust else base
    out = per.select(
        F.col("src").alias("vid"),
        c.alias("closeness"),
        (F.col("sum_inv") / F.lit(float(n - 1))).alias("harmonic"),
    )
    return (
        graph.nodes.select("vid")
        .join(out, "vid", "left")
        .select(
            "vid",
            F.coalesce("closeness", F.lit(0.0)).alias("closeness"),
            F.coalesce("harmonic", F.lit(0.0)).alias("harmonic"),
        )
    )
