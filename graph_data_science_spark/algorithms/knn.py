"""KNN (reference ``gds.knn`` — SURVEY.md §2.D Similarity family): the
k most similar neighbors per node by a node-property vector.

The reference runs an iterative NN-Descent-style refinement over sampled
candidates; our two strategies map to Spark's execution model instead:

- ``method="exact"`` — all-pairs scoring. The pair generation is a single
  self-join; per-pair similarity is a JVM higher-order expression. O(n²)
  by definition: correct for small/medium node sets and as the oracle
  twin.
- ``method="lsh"`` — the scale path: random-hyperplane bucket blocking
  (operators/similarity.py): each vector lands in one bucket per table,
  pairs are generated within buckets only — expected cost n²/2^bits per
  table, recall tunable by (n_bits, n_tables) exactly like the embedding
  ANN (recall pinned in tests there).

Deterministic: ties broken by ascending neighbor id (the reference's
parallel stream order is not deterministic; ours is — load-bearing for
the oracle/resume story).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graph_data_science_spark.functions import cosine_similarity
from graph_data_science_spark.operators.similarity import lsh_buckets, with_unit_vectors


def knn(
    node_vectors: DataFrame,
    k: int = 10,
    id_col: str = "vid",
    vec_col: str = "vec",
    similarity_cutoff: float = 0.0,
    method: str = "exact",
    n_bits: int = 6,
    n_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """→ (node1, node2, similarity): per node1 the k most cosine-similar
    other nodes (ties → min node2), similarity ≥ cutoff."""
    if method not in ("exact", "lsh"):
        raise ValueError(f"method must be 'exact' or 'lsh', got {method!r}")
    if method == "exact":
        a = node_vectors.select(
            F.col(id_col).alias("node1"), F.col(vec_col).alias("_va")
        )
        b = node_vectors.select(
            F.col(id_col).alias("node2"), F.col(vec_col).alias("_vb")
        )
        pairs = a.join(b, F.col("node1") != F.col("node2")).select(
            "node1",
            "node2",
            cosine_similarity(F.col("_va"), F.col("_vb")).alias("similarity"),
        )
    else:
        dim = len(node_vectors.select(vec_col).first()[0])
        bk = lsh_buckets(node_vectors, dim, n_bits, n_tables, seed, id_col, vec_col)
        # Candidate generation carries ONLY the id pair through the
        # cross-table dedup shuffle (2 longs/row, not 2×dim floats); the
        # unit vectors are joined back afterwards — at scale this is the
        # difference between shuffling ids and shuffling the embedding
        # table n_tables× over.
        cand = (
            bk.select(F.col("id").alias("node1"), "table", "bucket")
            .join(bk.select(F.col("id").alias("node2"), "table", "bucket"), ["table", "bucket"])
            .filter(F.col("node1") != F.col("node2"))
            .select("node1", "node2")
            .dropDuplicates(["node1", "node2"])
        )
        uv = with_unit_vectors(node_vectors, vec_col).select(
            F.col(id_col).alias("id"), "unit_vec"
        )
        pairs = (
            cand.join(uv.select(F.col("id").alias("node1"), F.col("unit_vec").alias("_va")), "node1")
            .join(uv.select(F.col("id").alias("node2"), F.col("unit_vec").alias("_vb")), "node2")
            .select(
                "node1",
                "node2",
                cosine_similarity(F.col("_va"), F.col("_vb")).alias("similarity"),
            )
        )
    pairs = pairs.filter(F.col("similarity") >= similarity_cutoff)
    w = Window.partitionBy("node1").orderBy(F.desc("similarity"), F.asc("node2"))
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def knn_filtered(
    node_vectors: DataFrame,
    source_nodes: DataFrame | None = None,
    target_nodes: DataFrame | None = None,
    **kw,
) -> DataFrame:
    """Filtered KNN (reference ``gds.knn.filtered``, production tier):
    ``source_nodes`` restricts which nodes GET neighbor lists,
    ``target_nodes`` restricts the candidate pool — both applied BEFORE
    the top-k ranking (upstream semantics: each source still receives k
    neighbors drawn from the filtered candidates). Filters are one-column
    id DataFrames; either may be omitted. Implementation: semi-join the
    two sides of :func:`knn`'s pair generation — the filters prune the
    O(n·m) candidate space itself, they are not a post-filter."""
    src = node_vectors
    tgt = node_vectors
    id_col = kw.get("id_col", "vid")
    if source_nodes is not None:
        s = source_nodes.toDF("_fid")
        src = node_vectors.join(
            F.broadcast(s), node_vectors[id_col] == F.col("_fid"), "left_semi"
        )
    if target_nodes is not None:
        t = target_nodes.toDF("_fid")
        tgt = node_vectors.join(
            F.broadcast(t), node_vectors[id_col] == F.col("_fid"), "left_semi"
        )
    if source_nodes is None and target_nodes is None:
        return knn(node_vectors, **kw)
    method = kw.get("method", "exact")
    if method not in ("exact", "lsh"):
        raise ValueError(f"method must be 'exact' or 'lsh', got {method!r}")
    vec_col = kw.get("vec_col", "vec")
    if method == "lsh":
        # scale path: bucket the two FILTERED sides with the same
        # hyperplanes (same dim/seed ⇒ identical tables), join buckets
        # source×target — the filters prune candidate GENERATION, exactly
        # like knn()'s unfiltered LSH path, not a post-filter.
        dim = len(node_vectors.select(vec_col).first()[0])
        n_bits = kw.get("n_bits", 6)
        n_tables = kw.get("n_tables", 8)
        seed = kw.get("seed", 42)
        sb = lsh_buckets(src, dim, n_bits, n_tables, seed, id_col, vec_col)
        tb = lsh_buckets(tgt, dim, n_bits, n_tables, seed, id_col, vec_col)
        cand = (
            sb.select(F.col("id").alias("node1"), "table", "bucket")
            .join(tb.select(F.col("id").alias("node2"), "table", "bucket"), ["table", "bucket"])
            .filter(F.col("node1") != F.col("node2"))
            .select("node1", "node2")
            .dropDuplicates(["node1", "node2"])
        )
        uv = with_unit_vectors(node_vectors, vec_col).select(
            F.col(id_col).alias("id"), "unit_vec"
        )
        pairs = (
            cand.join(uv.select(F.col("id").alias("node1"), F.col("unit_vec").alias("_va")), "node1")
            .join(uv.select(F.col("id").alias("node2"), F.col("unit_vec").alias("_vb")), "node2")
            .select(
                "node1",
                "node2",
                cosine_similarity(F.col("_va"), F.col("_vb")).alias("similarity"),
            )
        )
    else:
        a = src.select(F.col(id_col).alias("node1"), F.col(vec_col).alias("_va"))
        b = tgt.select(F.col(id_col).alias("node2"), F.col(vec_col).alias("_vb"))
        pairs = a.join(b, F.col("node1") != F.col("node2")).select(
            "node1",
            "node2",
            cosine_similarity(F.col("_va"), F.col("_vb")).alias("similarity"),
        )
    pairs = pairs.filter(F.col("similarity") >= kw.get("similarity_cutoff", 0.0))
    w = Window.partitionBy("node1").orderBy(F.desc("similarity"), F.asc("node2"))
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= kw.get("k", 10))
        .drop("_rn")
    )
