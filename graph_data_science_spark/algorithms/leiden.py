"""Leiden community detection (reference ``gds.leiden`` — Traag,
Waltman & van Eck 2019, SURVEY.md §2.D Community family).

Leiden = Louvain + a *refinement* phase between moving and aggregation:

1. **Move phase** — identical to the distributed Louvain move phase
   (louvain.py): parity-gated synchronous ΔQ argmax moves.
2. **Refinement** — within each move-phase community, restart from
   singletons and re-run constrained moving over the INTRA-community
   edges only. Because merge targets always come from incident edges,
   every refined sub-community is connected by construction — the Leiden
   well-connectedness guarantee Louvain lacks (a Louvain community can be
   internally disconnected after aggregation).
3. **Aggregation on the refined partition** — the coarse graph has one
   super-node per refined sub-community (finer than Louvain's), and the
   next level's move phase STARTS from the move-phase partition (each
   super-node initially assigned to its parent community), so splitting
   decisions can be revisited.

The streamed communities are the composed move-phase communities (the
reference's default ``includeIntermediateCommunities=false`` shape).
Deterministic throughout: no RNG (upstream refinement samples randomly —
our argmax tie-break is min community id), so parity with GDS is "valid
well-connected partition with comparable modularity", pinned by quality
tests against Louvain plus connectivity assertions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graph_data_science_spark.algorithms.louvain import LouvainResult, _move_phase
from graph_data_science_spark.projection import ProjectedGraph, undirect_edges


def _global_q(edges: DataFrame, assign: DataFrame, two_m: float) -> float:
    cs = assign.select(F.col("vid").alias("src"), F.col("community").alias("c_src"))
    cd = assign.select(F.col("vid").alias("dst"), F.col("community").alias("c_dst"))
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


def leiden(
    graph: ProjectedGraph,
    max_levels: int = 5,
    max_rounds_per_level: int = 6,
    refine_rounds: int = 3,
) -> LouvainResult:
    """→ LouvainResult (same shape as ``louvain``): (vid, community) with
    min-member canonical ids, final modularity, level count."""
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

    # original vid → current-level super-node id (composed through the
    # REFINED partitions, which is what gets aggregated)
    mapping = graph.nodes.select("vid", F.col("vid").alias("community")).localCheckpoint(
        eager=True
    )
    metrics: list[dict] = []
    levels = 0
    level_edges = edges
    init = None
    final_assign = None
    prev_q = float("-inf")
    q = 0.0
    best_qv = float("-inf")
    best_final = None
    for level in range(max_levels):
        assign1, _q1 = _move_phase(
            level_edges, two_m, max_rounds_per_level, init_assign=init,
            compare_stay=True,
        )
        assign1 = assign1.localCheckpoint(eager=True)
        level_nodes = assign1.select("vid")
        n_nodes = level_nodes.count()
        n_comms = assign1.select("community").distinct().count()
        # final (streamed) communities at this level: node → its
        # super-node's move-phase community
        final_assign = (
            mapping.join(
                assign1.select(
                    F.col("vid").alias("community"), F.col("community").alias("_c")
                ),
                "community",
                "left",
            )
            .select("vid", F.coalesce("_c", F.col("community")).alias("community"))
            .localCheckpoint(eager=True)
        )
        levels = level + 1
        # unlike Louvain, the aggregated graph does NOT shrink monotonically
        # (refinement can split every community back apart), so levels are
        # gated on GLOBAL quality progress, not on node-count shrinkage
        q = _global_q(edges, final_assign, two_m)
        if q > best_qv:
            best_qv, best_final = q, final_assign
        # Refinement + aggregation only shape the NEXT level's graph; on the
        # final level they are dead work (the streamed communities are the
        # move-phase assignment) — skip them instead of computing a coarse
        # graph nothing consumes. Halves the job count at max_levels=1.
        if level + 1 >= max_levels or n_comms == n_nodes or q <= prev_q + 1e-9:
            metrics.append(
                {"level": level, "communities": n_comms, "refined": n_nodes, "q": q}
            )
            break
        prev_q = q
        # refinement: singleton restart over INTRA-community edges — every
        # refined sub-community grows along edges inside one parent, so it
        # is connected by construction
        cs = assign1.select(F.col("vid").alias("src"), F.col("community").alias("c_src"))
        cd = assign1.select(F.col("vid").alias("dst"), F.col("community").alias("c_dst"))
        intra = (
            level_edges.join(cs, "src")
            .join(cd, "dst")
            .filter(F.col("c_src") == F.col("c_dst"))
            .select("src", "dst", "weight")
        )
        refined, _qr = _move_phase(intra, two_m, refine_rounds, compare_stay=True)
        # nodes with no intra edge stay singletons
        refined = (
            level_nodes.join(refined, "vid", "left")
            .select("vid", F.coalesce("community", F.col("vid")).alias("community"))
            .localCheckpoint(eager=True)
        )
        n_ref = refined.select("community").distinct().count()
        metrics.append(
            {"level": level, "communities": n_comms, "refined": n_ref, "q": q}
        )
        # compose the ORIGINAL-vid mapping through the refined partition
        mapping = (
            mapping.join(
                refined.select(
                    F.col("vid").alias("community"), F.col("community").alias("_next")
                ),
                "community",
                "left",
            )
            .select("vid", F.coalesce("_next", F.col("community")).alias("community"))
            .localCheckpoint(eager=True)
        )
        # aggregate on the refined partition
        rs = refined.select(F.col("vid").alias("src"), F.col("community").alias("r_src"))
        rd = refined.select(F.col("vid").alias("dst"), F.col("community").alias("r_dst"))
        coarse = (
            level_edges.join(rs, "src")
            .join(rd, "dst")
            .groupBy(F.col("r_src").alias("src"), F.col("r_dst").alias("dst"))
            .agg(F.sum("weight").alias("weight"))
            .localCheckpoint(eager=True)
        )
        # next level starts from the move-phase partition: each refined
        # super-node initially belongs to its parent community
        init = (
            refined.join(assign1.withColumnRenamed("community", "_parent"), "vid")
            .select(F.col("community").alias("vid"), F.col("_parent").alias("community"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        if level_edges is not edges:
            level_edges.unpersist()
        level_edges = coarse
    edges.unpersist()
    if best_final is None:
        best_qv, best_final = q, final_assign
    canon = best_final.groupBy("community").agg(F.min("vid").alias("_cid"))
    final = best_final.join(canon, "community").select(
        "vid", F.col("_cid").alias("community")
    )
    return LouvainResult(
        communities=final, modularity=best_qv, levels=levels, metrics=metrics
    )
