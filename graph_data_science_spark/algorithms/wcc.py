"""Weakly connected components: iterative min-label hash propagation.

Two executors, cross-checked in tests (SURVEY.md §2.C.2):

- ``algorithm="two_phase"`` (default): alternating **large-star /
  small-star** (Kiveris et al., "Connected Components in MapReduce and
  Beyond", SoCC 2014). Converges in O(log n) rounds regardless of graph
  diameter — the only viable choice at 10^12-edge scale where derived
  transcript graphs are chain-shaped (per-tool consecutive-conv links ⇒
  diameter ~ #convs, which plain propagation would need as many rounds).
- ``algorithm="propagation"``: plain frontier min-label propagation
  (``label_v ← min(label_v, min_{u~v} label_u)`` per superstep, only
  changed vertices re-emit). O(diameter) rounds; the semantic reference.

Component ids: the reference's union-find representatives are arbitrary
internal ids; parity is defined up to relabeling, so both executors here
return the **minimum vid of the component** — and because vid is the dense
rank of the original id (order-preserving, projection.py), min-vid maps
back to min-original-id, i.e. results are already canonical (SURVEY.md
§2.C.2 SEMANTICS-CRITICAL).

``threshold``: only edges with weight > threshold participate (reference
``threshold`` config). ``consecutive_ids``: remap components to 0..k-1 by
a dense rank over component ids.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.plans.messaging import EdgePlan
from graph_data_science_spark.plans.pregel import run_pregel
from graph_data_science_spark.projection import ProjectedGraph, assign_dense_ids


@dataclass
class WccResult:
    components: DataFrame  # (vid, component)
    iterations: int
    component_count: int = -1
    metrics: list[dict] = field(default_factory=list)


def _edge_pairs(graph: ProjectedGraph, threshold: float | None) -> DataFrame:
    e = graph.edges
    if threshold is not None:
        e = e.filter(F.col("weight") > threshold)
    return e.select("src", "dst").filter(F.col("src") != F.col("dst"))


def _canonical(pairs: DataFrame) -> DataFrame:
    """Undirected edge set as (u, v) with u > v, deduplicated."""
    return (
        pairs.select(
            F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(canon: DataFrame) -> DataFrame:
    """For each node u: link every neighbor v > u to min(Γ(u) ∪ {u})."""
    sym = canon.select(F.col("u").alias("a"), F.col("v").alias("b")).unionByName(
        canon.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )
    nbr_min = sym.groupBy("a").agg(F.min("b").alias("mn"))
    m = F.least(F.col("mn"), F.col("a"))
    return (
        sym.join(nbr_min, "a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("u"), m.alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(canon: DataFrame) -> DataFrame:
    """For each node u over smaller neighbors: relink all of them (and u) to
    the minimum."""
    nbr_min = canon.groupBy("u").agg(F.min("v").alias("m"))
    joined = canon.join(nbr_min, "u")
    relink = joined.filter(F.col("v") != F.col("m")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    self_link = nbr_min.select(F.col("u"), F.col("m").alias("v"))
    return relink.unionByName(self_link).filter(F.col("u") != F.col("v")).distinct()


def _fingerprint(canon: DataFrame) -> tuple[int, int]:
    # bit_xor: order-insensitive and overflow-free (ANSI mode forbids a
    # wrapping sum of hashes — verified failure at a few hundred edges).
    row = canon.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def _wcc_two_phase(graph: ProjectedGraph, threshold: float | None, max_rounds: int) -> WccResult:
    canon = _canonical(_edge_pairs(graph, threshold)).localCheckpoint(eager=True)
    fp = _fingerprint(canon)
    rounds = 0
    history: list[dict] = []
    for rounds in range(1, max_rounds + 1):
        nxt = _small_star(_large_star(canon)).localCheckpoint(eager=True)
        nfp = _fingerprint(nxt)
        canon.unpersist()
        canon = nxt
        history.append({"round": rounds, "edges": nfp[0]})
        if nfp == fp:
            break
        fp = nfp
    # Converged: star forest — every (u, v) points u at its component min v.
    parent = canon.groupBy(F.col("u").alias("vid")).agg(F.min("v").alias("component"))
    components = (
        graph.nodes.select("vid")
        .join(parent, "vid", "left")
        .select("vid", F.coalesce("component", F.col("vid")).alias("component"))
    )
    return WccResult(components=components, iterations=rounds, metrics=history)


def _wcc_propagation(
    graph: ProjectedGraph,
    threshold: float | None,
    max_rounds: int,
    executor: str = "relational",
) -> WccResult:
    pairs = _edge_pairs(graph, threshold)
    sym = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).withColumn("weight", F.lit(1.0))
    if executor == "csr":
        from graph_data_science_spark.plans.csr import CsrPlan

        plan = CsrPlan(sym, graph.node_count)
    else:
        plan = EdgePlan(sym)
    init = graph.nodes.select(
        "vid", F.col("vid").alias("label"), F.lit(1).alias("changed")
    )

    def step(state: DataFrame, i: int) -> DataFrame:
        frontier = state.filter(F.col("changed") == 1).select("vid", "label")
        if executor == "csr":
            msgs = plan.messages(frontier, "label", op="min").withColumnRenamed(
                "msg", "m"
            ).select("vid", F.col("m").cast("long").alias("m"))
        else:
            msgs = plan.messages(frontier, {"m": F.col("label")}, {"m": F.min("m")})
        new_label = F.least(F.col("label"), F.coalesce(F.col("m"), F.col("label")))
        return state.join(msgs, "vid", "left").select(
            "vid",
            new_label.alias("label"),
            (new_label < F.col("label")).cast("int").alias("changed"),
        )

    def metrics(state: DataFrame, i: int) -> dict:
        return {"changed": state.agg(F.sum("changed")).collect()[0][0] or 0}

    res = run_pregel(
        init,
        step,
        max_iterations=max_rounds,
        metrics_fn=metrics,
        stop_fn=lambda m, i: m["changed"] == 0,
    )
    plan.unpersist()
    comps = res.state.select("vid", F.col("label").alias("component"))
    return WccResult(components=comps, iterations=res.iterations, metrics=res.metrics)


def wcc(
    graph: ProjectedGraph,
    threshold: float | None = None,
    algorithm: str = "two_phase",
    max_rounds: int = 50,
    consecutive_ids: bool = False,
    with_stats: bool = False,
) -> WccResult:
    if algorithm == "two_phase":
        res = _wcc_two_phase(graph, threshold, max_rounds)
    elif algorithm == "propagation":
        res = _wcc_propagation(graph, threshold, max_rounds * 40)
    elif algorithm == "propagation_csr":
        res = _wcc_propagation(graph, threshold, max_rounds * 40, executor="csr")
    else:
        raise ValueError(
            "algorithm must be 'two_phase', 'propagation', or 'propagation_csr'"
        )
    if consecutive_ids:
        remap = assign_dense_ids(
            res.components.select(F.col("component").alias("orig_id")), "orig_id"
        ).select(F.col("orig_id").alias("component"), F.col("vid").alias("_cid"))
        res.components = (
            res.components.join(remap, "component")
            .select("vid", F.col("_cid").alias("component"))
        )
    if with_stats:
        res.component_count = res.components.select("component").distinct().count()
    return res
