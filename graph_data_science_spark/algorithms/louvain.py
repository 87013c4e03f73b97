"""Modularity metric + Louvain community detection (SURVEY.md §2.D
Community family: ``gds.modularity`` / ``gds.louvain``).

**Modularity** of a partition C on an undirected weighted graph:

    Q = Σ_c [ Σ_in(c) / 2m  −  (Σ_tot(c) / 2m)² ]

where 2m = total weight of the symmetrized edge table, Σ_in(c) = weight
of intra-community edge endpoints (counting both directions; self-loops
once per direction stored), Σ_tot(c) = total degree-weight of c. Pure
relational: two joins + one groupBy — and SQL-expressible, so the metric
has a DuckDB oracle in the driver contract.

**Louvain** here is the distributed BSP variant (parallel label moving +
graph coarsening — the standard "distributed Louvain" shape, e.g.
Que et al., IPDPS 2015):

- *Move phase* (synchronous, deterministic): every node evaluates the
  modularity gain of adopting each neighboring community,
  ``ΔQ ∝ w(v→c) − deg(v)·Σ_tot(c\\v) / 2m``, and takes the argmax
  (ties → min community id). All gains for all nodes are computed in ONE
  join + groupBy per round; a round is a superstep.
  Synchronous moving can oscillate (two nodes swapping), so a round
  only moves nodes whose gain is strictly positive AND we stop when the
  global modularity stops improving — the standard BSP guard.
- *Coarsen phase*: contract communities to super-nodes
  (``groupBy(c_src, c_dst).sum(weight)``), keep self-loops (intra
  weight), recurse. ``final community = composition of the per-level
  maps``, streamed like GDS ``includeIntermediateCommunities=false``.

Deterministic by construction (no RNG, total tie-break order), which is
stronger than the reference's parallel implementation — parity with GDS
is therefore "valid partition with comparable modularity", not equal ids;
tests assert modularity quality + determinism + golden structures.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graph_data_science_spark.projection import ProjectedGraph, undirect_edges


def modularity(
    graph: ProjectedGraph, communities: DataFrame, community_col: str = "community"
) -> float:
    """Q of the given (vid → community) assignment on the symmetrized
    graph. One pass; exact."""
    edges = (
        graph.edges
        if graph.orientation == "UNDIRECTED"
        else undirect_edges(graph.edges)
    )
    com = communities.select("vid", F.col(community_col).alias("_c"))
    cs = com.select(F.col("vid").alias("src"), F.col("_c").alias("c_src"))
    cd = com.select(F.col("vid").alias("dst"), F.col("_c").alias("c_dst"))
    tagged = edges.join(cs, "src").join(cd, "dst")
    two_m = tagged.agg(F.sum("weight")).collect()[0][0]
    if not two_m:
        return 0.0
    intra = (
        tagged.filter(F.col("c_src") == F.col("c_dst"))
        .groupBy("c_src")
        .agg(F.sum("weight").alias("w_in"))
    )
    tot = tagged.groupBy("c_src").agg(F.sum("weight").alias("w_tot"))
    row = (
        tot.join(intra, "c_src", "left")
        .select(
            (
                F.coalesce("w_in", F.lit(0.0)) / F.lit(two_m)
                - (F.col("w_tot") / F.lit(two_m)) ** 2
            ).alias("q")
        )
        .agg(F.sum("q"))
        .collect()[0][0]
    )
    return float(row or 0.0)


def conductance(
    graph: ProjectedGraph, communities: DataFrame, community_col: str = "community"
) -> DataFrame:
    """Per-community conductance (reference ``gds.conductance``):
    φ(C) = external edge weight / (external + internal edge weight),
    counted over the stored (directed) edges — GDS counts each
    relationship once. → (community, conductance)."""
    com = communities.select("vid", F.col(community_col).alias("_c"))
    cs = com.select(F.col("vid").alias("src"), F.col("_c").alias("c_src"))
    cd = com.select(F.col("vid").alias("dst"), F.col("_c").alias("c_dst"))
    tagged = graph.edges.join(cs, "src").join(cd, "dst")
    # an inter-community edge is external to BOTH endpoints' communities
    per_src = tagged.groupBy(F.col("c_src").alias("community")).agg(
        F.sum(F.when(F.col("c_src") == F.col("c_dst"), F.col("weight")).otherwise(0.0)).alias("internal"),
        F.sum(F.when(F.col("c_src") != F.col("c_dst"), F.col("weight")).otherwise(0.0)).alias("ext_out"),
    )
    per_dst = tagged.filter(F.col("c_src") != F.col("c_dst")).groupBy(
        F.col("c_dst").alias("community")
    ).agg(F.sum("weight").alias("ext_in"))
    return (
        per_src.join(per_dst, "community", "outer")
        .select(
            "community",
            F.coalesce("internal", F.lit(0.0)).alias("internal"),
            (F.coalesce("ext_out", F.lit(0.0)) + F.coalesce("ext_in", F.lit(0.0))).alias("external"),
        )
        .select(
            "community",
            F.when(
                F.col("internal") + F.col("external") > 0,
                F.col("external") / (F.col("internal") + F.col("external")),
            )
            .otherwise(F.lit(0.0))
            .alias("conductance"),
        )
    )


@dataclass
class LouvainResult:
    communities: DataFrame  # (vid, community) — final level, vid space
    modularity: float
    levels: int
    metrics: list[dict] = field(default_factory=list)


def _move_phase(
    edges: DataFrame,
    two_m: float,
    max_rounds: int,
    init_assign: DataFrame | None = None,
    tolerance: float = 1e-12,
    compare_stay: bool | None = None,
) -> tuple[DataFrame, float]:
    """Synchronous label moving on one level. ``edges`` is symmetrized
    (both directions present), self-loops carry intra weight.
    Returns (assignment (vid, community), modularity achieved).

    Oscillation control: only one vid-parity class may move per round
    (deterministic symmetry breaker — kills synchronous pair swaps), plus
    revert-on-non-improvement. Two measured dead ends, kept out on
    purpose: an all-movers gate (~30% faster, q 0.20 → 0.16 at sf0.01 —
    the singleton-state herd locks into poor basins, which is why
    production distributed Louvain gates by coloring; parity is the
    2-coloring approximation) and a stay-gain move criterion for the
    singleton start (more "correct" per node, but the aggressive
    absolute-gain rule + global revert guard explores better: q 0.30 vs
    0.28 on the gnm goldens, and the extra per-round plan width cost 5×
    wall on this latency-bound loop).

    With ``compare_stay`` (default: on whenever ``init_assign`` is given;
    Leiden forces it on at every level) the move criterion compares
    against the gain of STAYING — mandatory for non-singleton starts,
    where staying is not gain-zero — by adding a zero own-community
    candidate row per node and a strict stay-beat filter."""
    deg = edges.groupBy(F.col("src").alias("vid")).agg(F.sum("weight").alias("k"))
    deg = deg.persist(StorageLevel.MEMORY_AND_DISK)
    if init_assign is None:
        assign = deg.select("vid", F.col("vid").alias("community"))
    else:  # Leiden: the aggregated level starts from the parent partition
        assign = deg.select("vid").join(init_assign, "vid", "left").select(
            "vid", F.coalesce("community", F.col("vid")).alias("community")
        )
    assign = assign.localCheckpoint(eager=True)
    if compare_stay is None:
        compare_stay = init_assign is not None

    def q_of(a: DataFrame) -> float:
        # single job: per-community (intra, total) partials then one agg
        cs = a.select(F.col("vid").alias("src"), F.col("community").alias("c_src"))
        cd = a.select(F.col("vid").alias("dst"), F.col("community").alias("c_dst"))
        tagged = edges.join(cs, "src").join(cd, "dst")
        per = tagged.groupBy("c_src").agg(
            F.sum("weight").alias("t"),
            F.sum(
                F.when(F.col("c_src") == F.col("c_dst"), F.col("weight")).otherwise(0.0)
            ).alias("i"),
        )
        row = per.agg(
            F.sum("i").alias("intra"), F.sum(F.col("t") * F.col("t")).alias("tt")
        ).collect()[0]
        return (row["intra"] or 0.0) / two_m - (row["tt"] or 0.0) / (two_m * two_m)

    best_q = q_of(assign)
    best_assign = assign
    stale = 0
    for _rnd in range(max_rounds):
        cs = assign.select(F.col("vid").alias("src"), F.col("community").alias("c_src"))
        cd = assign.select(F.col("vid").alias("dst"), F.col("community").alias("c_dst"))
        # w(v → community c) over v's incident edges (src side of sym table)
        links = edges.join(cd, "dst").filter(F.col("src") != F.col("dst")).select(
            "src", "c_dst", F.col("weight").alias("w_vc")
        )
        if compare_stay:
            # ensure a "stay" candidate row exists for every node
            links = links.unionByName(
                assign.select(
                    F.col("vid").alias("src"),
                    F.col("community").alias("c_dst"),
                    F.lit(0.0).alias("w_vc"),
                )
            )
        links = links.groupBy("src", "c_dst").agg(F.sum("w_vc").alias("w_vc"))
        sigma = assign.join(deg, "vid").groupBy("community").agg(
            F.sum("k").alias("sigma")
        )
        cand = (
            links.join(deg.select(F.col("vid").alias("src"), "k"), "src")
            .join(cs.select(F.col("src"), "c_src").distinct(), "src")
            .join(sigma.select(F.col("community").alias("c_dst"), "sigma"), "c_dst")
        )
        # ΔQ of moving v into c (Σ_tot excludes v when already inside)
        sig_excl = F.col("sigma") - F.when(
            F.col("c_dst") == F.col("c_src"), F.col("k")
        ).otherwise(F.lit(0.0))
        gain = F.col("w_vc") - F.col("k") * sig_excl / F.lit(two_m)
        scored = cand.select(
            F.col("src").alias("vid"),
            "c_src",
            F.col("c_dst").alias("target"),
            gain.alias("gain"),
        )
        # deterministic argmax: max gain, ties → min community id
        best = scored.groupBy("vid", "c_src").agg(
            F.max(F.struct(F.col("gain"), (-F.col("target")).alias("neg"))).alias("b")
        ).select(
            "vid",
            "c_src",
            F.col("b.gain").alias("gain"),
            (-F.col("b.neg")).alias("target"),
        )
        parity = F.pmod(F.col("vid"), F.lit(2)) == F.lit(_rnd % 2)
        if not compare_stay:
            moved = best.filter(
                (F.col("gain") > 1e-12) & (F.col("target") != F.col("c_src")) & parity
            ).select("vid", F.col("target").alias("community"))
        else:
            # non-singleton start: a move must STRICTLY beat staying
            stay = scored.filter(F.col("target") == F.col("c_src")).select(
                "vid", F.col("gain").alias("stay_gain")
            )
            moved = best.join(stay, "vid").filter(
                (F.col("gain") > F.col("stay_gain") + 1e-12)
                & (F.col("target") != F.col("c_src"))
                & parity
            ).select("vid", F.col("target").alias("community"))
        if moved.limit(1).count() == 0:
            stale += 1
            if stale >= 2:  # neither parity class has a move left
                break
            continue
        new_assign = (
            assign.join(moved.withColumnRenamed("community", "_new"), "vid", "left")
            .select("vid", F.coalesce("_new", F.col("community")).alias("community"))
            .localCheckpoint(eager=True)
        )
        new_q = q_of(new_assign)
        if new_q <= best_q + tolerance:
            # no global improvement: REVERT to the best partition seen
            new_assign.unpersist()
            assign = best_assign
            stale += 1
            if stale >= 2:
                break
            continue
        prev = assign  # == best_assign here; unpersist the superseded one
        assign = new_assign
        best_assign = new_assign
        if prev is not new_assign:
            prev.unpersist()
        best_q = new_q
        stale = 0
    deg.unpersist()
    return assign.select("vid", "community"), best_q


def modularity_optimization(
    graph: ProjectedGraph,
    max_iterations: int = 10,
    init_communities: DataFrame | None = None,
) -> LouvainResult:
    """Standalone modularity optimization (reference
    ``gds.beta.modularityOptimization``): ONE level of synchronous label
    moving — Louvain without the coarsening recursion — optionally seeded
    with an initial (vid, community) assignment. Returns min-member
    canonical communities and the achieved modularity."""
    edges = (
        graph.edges
        if graph.orientation == "UNDIRECTED"
        else undirect_edges(graph.edges)
    ).persist(StorageLevel.MEMORY_AND_DISK)
    two_m = float(edges.agg(F.sum("weight")).collect()[0][0] or 0.0)
    if two_m == 0.0:
        edges.unpersist()
        return LouvainResult(
            communities=graph.nodes.select("vid", F.col("vid").alias("community")),
            modularity=0.0,
            levels=0,
        )
    assign, q = _move_phase(
        edges, two_m, max_iterations, init_assign=init_communities,
        compare_stay=init_communities is not None,
    )
    # isolated nodes (possible with an explicit node set) keep singletons
    full = (
        graph.nodes.select("vid")
        .join(assign.withColumnRenamed("community", "_c"), "vid", "left")
        .select("vid", F.coalesce("_c", F.col("vid")).alias("community"))
    )
    edges.unpersist()
    canon = full.groupBy("community").agg(F.min("vid").alias("_cid"))
    final = full.join(canon, "community").select(
        "vid", F.col("_cid").alias("community")
    )
    return LouvainResult(communities=final, modularity=q, levels=1)


def louvain(
    graph: ProjectedGraph,
    max_levels: int = 10,
    max_rounds_per_level: int = 10,
) -> LouvainResult:
    edges = (
        graph.edges
        if graph.orientation == "UNDIRECTED"
        else undirect_edges(graph.edges)
    ).persist(StorageLevel.MEMORY_AND_DISK)
    two_m = float(edges.agg(F.sum("weight")).collect()[0][0] or 0.0)
    if two_m == 0.0:
        return LouvainResult(
            communities=graph.nodes.select("vid", F.col("vid").alias("community")),
            modularity=0.0,
            levels=0,
        )

    # vid → community composition across levels
    mapping = graph.nodes.select("vid", F.col("vid").alias("community")).localCheckpoint(
        eager=True
    )
    metrics: list[dict] = []
    q = 0.0
    levels = 0
    level_edges = edges
    for level in range(max_levels):
        assign, q_new = _move_phase(level_edges, two_m, max_rounds_per_level)
        n_comms = assign.select("community").distinct().count()
        n_nodes = assign.count()
        metrics.append({"level": level, "modularity": q_new, "communities": n_comms})
        # compose: vid → old community → new community of that super-node.
        # LEFT join: _move_phase only sees edge endpoints, so an isolated
        # node (possible with an explicit node set) has no row in `assign`
        # — it keeps its own community id (a singleton, GDS semantics).
        mapping = (
            mapping.join(
                assign.select(
                    F.col("vid").alias("community"), F.col("community").alias("_next")
                ),
                "community",
                "left",
            )
            .select("vid", F.coalesce("_next", F.col("community")).alias("community"))
            .localCheckpoint(eager=True)
        )
        levels = level + 1
        q = q_new
        if n_comms == n_nodes:  # no merge happened → done
            break
        # coarsen: communities become super-nodes; keep self-loops
        cs = assign.select(F.col("vid").alias("src"), F.col("community").alias("c_src"))
        cd = assign.select(F.col("vid").alias("dst"), F.col("community").alias("c_dst"))
        coarse = (
            level_edges.join(cs, "src")
            .join(cd, "dst")
            .groupBy(F.col("c_src").alias("src"), F.col("c_dst").alias("dst"))
            .agg(F.sum("weight").alias("weight"))
            .localCheckpoint(eager=True)
        )
        if level_edges is not edges:
            level_edges.unpersist()
        level_edges = coarse
    edges.unpersist()
    # canonicalize to min member vid (stable across equivalent labelings)
    canon = mapping.groupBy("community").agg(F.min("vid").alias("_cid"))
    final = mapping.join(canon, "community").select(
        "vid", F.col("_cid").alias("community")
    )
    return LouvainResult(communities=final, modularity=q, levels=levels, metrics=metrics)
