"""Node2Vec embeddings (reference ``gds.node2vec`` — SURVEY.md §2.D
Embeddings family; Grover & Leskovec, KDD 2016).

The walk stage is :func:`..randomwalk.node2vec_walks` (second-order p/q
biased walks). This module adds the TRAINING stage the reference runs as
skip-gram-with-negative-sampling (SGNS) over the walk corpus.

Spark-first restructuring — SGNS as closed-form matrix factorization:
Levy & Goldberg (NeurIPS 2014) showed SGNS converges to factorizing the
shifted PPMI matrix ``SPPMI(u,c) = max(0, PMI(u,c) − ln k)`` over the
(word, context) co-occurrence counts SGNS trains on. We compute exactly
those counts from the walk corpus (window-w skip-gram pairs), form SPPMI,
and factorize by a deterministic Johnson–Lindenstrauss signed random
projection — ``emb(u) = Σ_c SPPMI(u,c)·r(c)/√d``, r(c)[j] = ±1 from
``xxhash64(c, j, seed)`` — the same hash-sign projection FastRP uses, so
cosine(emb(u), emb(v)) ≈ ⟨SPPMI row_u, SPPMI row_v⟩ / norms: nodes that
share walk contexts (i.e. graph neighborhoods under the p/q bias) land
close, which is the property SGNS training is run for.

Why not SGD here: mini-batched gradient descent needs either a parameter
server or per-epoch model broadcast — the former doesn't exist in Spark,
the latter caps the model at driver memory (node_count × d doubles).
The factorization route is one shuffle per stage, embarrassingly
parallel, hash-deterministic on any cluster size, and the pair counts —
NOT the model — are the only shuffled state. At 100 TB the (u, c)
co-occurrence table is walks × window sized and partial-aggregates
map-side; the d-wide projection uses the skew-safe posexplode +
groupBy(u, dim) reduce (see fastrp.py's plan note).

Plan shape:
  walks self-join (walk_id, |Δstep| ≤ window)   — one shuffle on walk_id
  → groupBy(u, c) count                         — one shuffle, map-combined
  → broadcast-free PMI via two groupBy margins  — two small shuffles
  → posexplode d dims → groupBy(u, dim) sum     — one shuffle, map-combined
  → array reassembly + L2 normalize             — JVM expressions only
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graph_data_science_spark.projection import ProjectedGraph
from graph_data_science_spark.algorithms.randomwalk import node2vec_walks


@dataclass
class Node2VecResult:
    embeddings: DataFrame  # (vid, embedding array<double>)
    walk_count: int
    pair_count: int
    metrics: list[dict] = field(default_factory=list)


def skipgram_pairs(walks: DataFrame, window: int = 5) -> DataFrame:
    """(u, c, n): window-``window`` skip-gram co-occurrence counts from a
    (walk_id, step, vid) corpus — the exact multiset SGNS trains on
    (symmetric: both (u,c) and (c,u) directions are emitted by the
    |Δstep| ≤ window self-join)."""
    a = walks.select(
        F.col("walk_id"), F.col("step").alias("s_u"), F.col("vid").alias("u")
    )
    b = walks.select(
        F.col("walk_id"), F.col("step").alias("s_c"), F.col("vid").alias("c")
    )
    return (
        a.join(b, "walk_id")
        .filter(
            (F.col("s_u") != F.col("s_c"))
            & (F.abs(F.col("s_u") - F.col("s_c")) <= window)
        )
        .groupBy("u", "c")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def node2vec(
    graph: ProjectedGraph,
    embedding_dimension: int = 64,
    walks_per_node: int = 4,
    walk_length: int = 10,
    window_size: int = 5,
    negative_sampling_rate: int = 1,
    return_factor: float = 1.0,
    in_out_factor: float = 1.0,
    seed: int = 42,
) -> Node2VecResult:
    """→ (vid, embedding[d]), L2-normalized. ``negative_sampling_rate``
    is SGNS's k (the PMI shift ln k); default 1 = plain PPMI — on walk
    corpora the co-occurrence distribution is much flatter than natural
    text, so word2vec's k=5 shift clips nearly every cell to zero (all-
    zero embeddings on small graphs); k=1 keeps the homophily signal and
    larger k remains available for sparsification at scale. Deterministic
    for fixed seed on any partitioning — walks and projection are
    hash-derived."""
    d = embedding_dimension
    res = node2vec_walks(
        graph,
        walks_per_node=walks_per_node,
        walk_length=walk_length,
        return_factor=return_factor,
        in_out_factor=in_out_factor,
        seed=seed,
    )
    walks = res.walks.persist(StorageLevel.MEMORY_AND_DISK)
    pairs = skipgram_pairs(walks, window=window_size).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    totals = pairs.agg(F.sum("n").alias("D")).collect()[0]
    big_d = float(totals["D"] or 0.0)
    if big_d == 0.0:
        walks.unpersist()
        pairs.unpersist()
        empty = graph.nodes.select(
            "vid", F.array_repeat(F.lit(0.0), d).alias("embedding")
        )
        return Node2VecResult(embeddings=empty, walk_count=res.walk_count, pair_count=0)

    n_u = pairs.groupBy("u").agg(F.sum("n").alias("n_u"))
    n_c = pairs.groupBy("c").agg(F.sum("n").alias("n_c"))
    shift = float(max(negative_sampling_rate, 1))
    sppmi = (
        pairs.join(n_u, "u")
        .join(n_c, "c")
        .select(
            "u",
            "c",
            F.greatest(
                F.lit(0.0),
                F.log(
                    F.col("n") * F.lit(big_d) / (F.col("n_u") * F.col("n_c"))
                )
                - F.lit(float(math.log(shift))),
            ).alias("w"),
        )
        .filter(F.col("w") > 0.0)
    )

    # JL projection: value(u, j) = Σ_c w(u,c) · sign(hash(c, j)).
    # posexplode the d-sequence so a hub's fan-in partial-aggregates
    # map-side per (u, j) — never a collect_list of arrays.
    dims = F.sequence(F.lit(0), F.lit(d - 1))
    per_dim = (
        sppmi.select("u", "w", F.explode(dims).alias("j"), "c")
        .select(
            "u",
            "j",
            (
                F.col("w")
                * F.when(
                    F.pmod(F.xxhash64("c", "j", F.lit(seed + 7)), F.lit(2)) == 0,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0))
            ).alias("v"),
        )
        .groupBy("u", "j")
        .agg(F.sum("v").alias("s"))
    )
    assembled = per_dim.groupBy("u").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("j", "s"))), lambda st: st["s"]
        ).alias("raw")
    )
    norm = F.sqrt(F.aggregate("raw", F.lit(0.0), lambda a, x: a + x * x))
    emb = assembled.select(
        F.col("u").alias("vid"),
        F.when(norm > 0, F.transform("raw", lambda x: x / norm))
        .otherwise(F.col("raw"))
        .alias("embedding"),
    )
    out = (
        graph.nodes.select("vid")
        .join(emb, "vid", "left")
        .select(
            "vid",
            F.coalesce("embedding", F.array_repeat(F.lit(0.0), d)).alias("embedding"),
        )
    )
    pair_count = pairs.count()
    walks.unpersist()
    pairs.unpersist()
    return Node2VecResult(
        embeddings=out,
        walk_count=res.walk_count,
        pair_count=pair_count,
        metrics=[{"D": big_d, "dims": d, "window": window_size, "shift_k": shift}],
    )
