"""Topology-based link-prediction scores (reference
``gds.alpha.linkprediction.*`` functions: adamicAdar, commonNeighbors,
resourceAllocation, preferentialAttachment, totalNeighbors,
sameCommunity — SURVEY.md §2.D ML family, function tier).

The reference exposes these as per-pair Cypher functions; the batch
analogue scores every candidate pair in one shot. Spark plan — the same
inverted-index shape as node_similarity / the dedup index: the adjacency
IS the index (shared neighbor z → node), one self-join on z generates
exactly the pairs with ≥1 common neighbor, and every score is an
aggregate over that pair stream joined with the degree table:

- ``common_neighbors(a,b)``      = |N(a) ∩ N(b)|
- ``adamic_adar(a,b)``           = Σ_{z ∈ N(a)∩N(b)} 1 / ln |N(z)|
- ``resource_allocation(a,b)``   = Σ_{z ∈ N(a)∩N(b)} 1 / |N(z)|
- ``preferential_attachment``    = |N(a)| · |N(b)|
- ``total_neighbors(a,b)``       = |N(a) ∪ N(b)|
- ``same_community(a,b)``        = 1 iff both nodes carry equal community

Cost is Σ_z indeg(z)² over shared neighbors z — the hot-token df²
blowup — so ``degree_cutoff_max`` is the 100-TB scale guard: drop hub
index keys above the cutoff (documented recall loss on pairs whose ONLY
witnesses are hubs), exactly the ``max_df`` cut the n-gram dedup uses.
No iteration; three shuffles (index build, pair agg, degree join).

Neighborhoods are the projected out-neighbor sets; project UNDIRECTED
for the reference's classic undirected semantics. Pairs are emitted once
with node1 < node2 (all scores are symmetric).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graph_data_science_spark.projection import ProjectedGraph


def topology_link_prediction(
    graph: ProjectedGraph,
    min_common_neighbors: int = 1,
    degree_cutoff_max: int | None = None,
    top_k: int | None = None,
    community: DataFrame | None = None,
) -> DataFrame:
    """→ (node1, node2, common_neighbors, adamic_adar,
    resource_allocation, preferential_attachment, total_neighbors
    [, same_community]) in vid space, node1 < node2, restricted to pairs
    with ≥ ``min_common_neighbors`` shared neighbors (pairs with zero
    common neighbors score 0 on the Σ-metrics and are the n² ocean — a
    batch engine only materializes the witnessed pairs).

    ``top_k`` keeps the k best pairs per node1 by (adamic_adar desc,
    node2 asc) — deterministic. ``community``: (vid, community) rows to
    emit the reference's sameCommunity flag.
    """
    adj = graph.edges.select("src", "dst").distinct()
    deg = adj.groupBy("src").agg(F.count(F.lit(1)).alias("sz"))

    # inverted index: shared neighbor z -> node; hub guard on z's fan-in
    idx = adj.select(F.col("src").alias("node"), F.col("dst").alias("z"))
    if degree_cutoff_max is not None:
        zdf = idx.groupBy("z").agg(F.count(F.lit(1)).alias("df"))
        idx = idx.join(
            F.broadcast(zdf.filter(F.col("df") > degree_cutoff_max).select("z")),
            "z",
            "left_anti",
        )
    # z's own neighborhood size for the weighted sums (1/ln, 1/sz);
    # z is a common neighbor of two distinct nodes => |N(z)| >= 2 on an
    # undirected projection, so ln|N(z)| > 0; nullif guards directed use.
    # LEFT join: on a directed projection a witness z may have zero
    # out-degree — it must still COUNT as a common neighbor (zsz null →
    # its 1/ln and 1/sz terms are null and F.sum skips them).
    zdeg = deg.select(F.col("src").alias("z"), F.col("sz").alias("zsz"))
    idx = idx.join(zdeg, "z", "left")

    a = idx.select(F.col("node").alias("node1"), "z", "zsz")
    b = idx.select(F.col("node").alias("node2"), "z")
    pairs = (
        a.join(b, "z")
        .filter(F.col("node1") < F.col("node2"))
        .groupBy("node1", "node2")
        .agg(
            F.count(F.lit(1)).alias("common_neighbors"),
            F.sum(
                1.0 / F.nullif(F.log(F.col("zsz").cast("double")), F.lit(0.0))
            ).alias("adamic_adar"),
            F.sum(1.0 / F.col("zsz")).alias("resource_allocation"),
        )
        .filter(F.col("common_neighbors") >= min_common_neighbors)
    )
    # total_neighbors = |N(a) ∪ N(b)| must use the SAME neighbor sets the
    # intersection was counted over: with a hub cutoff active, union sizes
    # come from the filtered index (otherwise sz1+sz2−common overstates the
    # union by exactly the dropped hubs). preferential_attachment keeps the
    # true degrees — the reference defines it on full neighborhood sizes
    # and no intersection consistency is at stake.
    if degree_cutoff_max is not None:
        udeg = idx.groupBy("node").agg(F.count(F.lit(1)).alias("usz"))
    else:
        udeg = deg.select(F.col("src").alias("node"), F.col("sz").alias("usz"))
    s1 = deg.select(F.col("src").alias("node1"), F.col("sz").alias("sz1"))
    s2 = deg.select(F.col("src").alias("node2"), F.col("sz").alias("sz2"))
    u1 = udeg.select(F.col("node").alias("node1"), F.col("usz").alias("usz1"))
    u2 = udeg.select(F.col("node").alias("node2"), F.col("usz").alias("usz2"))
    out = (
        pairs.join(s1, "node1")
        .join(s2, "node2")
        .join(u1, "node1")
        .join(u2, "node2")
        .select(
            "node1",
            "node2",
            "common_neighbors",
            "adamic_adar",
            "resource_allocation",
            (F.col("sz1") * F.col("sz2")).cast("long").alias(
                "preferential_attachment"
            ),
            (F.col("usz1") + F.col("usz2") - F.col("common_neighbors"))
            .cast("long")
            .alias("total_neighbors"),
        )
    )
    if community is not None:
        c1 = community.select(F.col("vid").alias("node1"), F.col("community").alias("_c1"))
        c2 = community.select(F.col("vid").alias("node2"), F.col("community").alias("_c2"))
        out = (
            out.join(c1, "node1", "left")
            .join(c2, "node2", "left")
            .withColumn(
                "same_community",
                (F.col("_c1").isNotNull() & (F.col("_c1") == F.col("_c2"))).cast("int"),
            )
            .drop("_c1", "_c2")
        )
    if top_k is not None:
        w = Window.partitionBy("node1").orderBy(
            F.col("adamic_adar").desc(), F.col("node2").asc()
        )
        out = out.withColumn("_rn", F.row_number().over(w)).filter(
            F.col("_rn") <= top_k
        ).drop("_rn")
    return out
