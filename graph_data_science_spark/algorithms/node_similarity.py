"""Node Similarity (reference ``gds.nodeSimilarity``): pairwise similarity
of nodes by their out-neighbor sets — Jaccard (default), Overlap, or
Cosine — with ``similarity_cutoff``, ``degree_cutoff`` and per-node
``top_k`` (SURVEY.md §2.D Similarity family).

Spark plan — identical shape to the document-dedup inverted index
(operators/dedup.py): the adjacency IS the index (neighbor → node), one
self-join on the shared neighbor generates exactly the pairs with
non-empty intersection, ``groupBy(pair).count`` is the intersection size,
and the set sizes come from the degree table. Cost is Σ_n indeg(n)² over
neighbors n — the same df² blowup as hot tokens, so ``degree_cutoff_max``
(reference's upper degree bound) is the scale guard for hub neighbors.
No iteration; three shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graph_data_science_spark.projection import ProjectedGraph

METRICS = ("jaccard", "overlap", "cosine")


def node_similarity(
    graph: ProjectedGraph,
    metric: str = "jaccard",
    similarity_cutoff: float = 1e-42,
    degree_cutoff: int = 1,
    degree_cutoff_max: int | None = None,
    top_k: int | None = 10,
    source_nodes: DataFrame | None = None,
    target_nodes: DataFrame | None = None,
) -> DataFrame:
    """→ (node1, node2, similarity) in vid space, node1 ≠ node2; both
    (a,b) and (b,a) emitted when they pass cutoffs (GDS streams directed
    pairs); ``top_k`` keeps the k most similar per node1 (ties broken by
    ascending node2 — deterministic, unlike the reference's parallel
    stream order)."""
    if metric not in METRICS:
        raise ValueError(f"metric must be one of {METRICS}, got {metric!r}")
    # neighbor sets: distinct out-edges (weights ignored for set metrics)
    adj = graph.edges.select("src", "dst").distinct()
    deg = adj.groupBy("src").agg(F.count(F.lit(1)).alias("sz"))
    deg = deg.filter(F.col("sz") >= degree_cutoff)
    if degree_cutoff_max is not None:
        deg = deg.filter(F.col("sz") <= degree_cutoff_max)
    adj = adj.join(deg.select("src"), "src")

    a = adj.select(F.col("src").alias("node1"), F.col("dst").alias("nbr"))
    b = adj.select(F.col("src").alias("node2"), F.col("dst").alias("nbr"))
    inter = (
        a.join(b, "nbr")
        .filter(F.col("node1") != F.col("node2"))
        .groupBy("node1", "node2")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    s1 = deg.select(F.col("src").alias("node1"), F.col("sz").alias("sz1"))
    s2 = deg.select(F.col("src").alias("node2"), F.col("sz").alias("sz2"))
    joined = inter.join(s1, "node1").join(s2, "node2")
    i = F.col("inter").cast("double")
    if metric == "jaccard":
        sim = i / (F.col("sz1") + F.col("sz2") - F.col("inter"))
    elif metric == "overlap":
        sim = i / F.least("sz1", "sz2")
    else:  # cosine over binary membership vectors
        sim = i / F.sqrt(F.col("sz1") * F.col("sz2"))
    out = joined.select("node1", "node2", sim.alias("similarity")).filter(
        F.col("similarity") >= similarity_cutoff
    )
    # Filtered variant (reference ``gds.nodeSimilarity.filtered``):
    # restrict the pair stream to the given source/target vid sets via
    # semi-joins BEFORE the per-source top-k, so k is taken over the
    # filtered targets (GDS semantics). Small filter sets broadcast.
    if source_nodes is not None:
        out = out.join(
            source_nodes.select(F.col("vid").alias("node1")), "node1", "semi"
        )
    if target_nodes is not None:
        out = out.join(
            target_nodes.select(F.col("vid").alias("node2")), "node2", "semi"
        )
    if top_k is not None:
        w = Window.partitionBy("node1").orderBy(F.desc("similarity"), F.asc("node2"))
        out = (
            out.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= top_k)
            .drop("_rn")
        )
    return out
