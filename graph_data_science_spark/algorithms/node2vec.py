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
    training: str = "sppmi",
    epochs: int = 5,
    learning_rate: float = 0.5,
) -> Node2VecResult:
    """→ (vid, embedding[d]), L2-normalized. ``negative_sampling_rate``
    is SGNS's k (the PMI shift ln k); default 1 = plain PPMI — on walk
    corpora the co-occurrence distribution is much flatter than natural
    text, so word2vec's k=5 shift clips nearly every cell to zero (all-
    zero embeddings on small graphs); k=1 keeps the homophily signal and
    larger k remains available for sparsification at scale. Deterministic
    for fixed seed on any partitioning — walks and projection are
    hash-derived.

    ``training``: ``"sppmi"`` (default — closed-form SPPMI+JL
    factorization, the scale path documented in the module docstring) or
    ``"sgd"`` — TRUE skip-gram-with-negative-sampling gradient descent
    (:func:`sgns_train`), for users expecting word2vec-parity vectors;
    ``epochs``/``learning_rate``/``negative_sampling_rate`` then carry
    their word2vec meanings (k = negative_sampling_rate negatives/pair)."""
    if training not in ("sppmi", "sgd"):
        raise ValueError(f"training must be 'sppmi' or 'sgd', got {training!r}")
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

    if training == "sgd":
        emb_sgd = sgns_train(
            pairs,
            node_count=graph.node_count,
            embedding_dimension=d,
            epochs=epochs,
            learning_rate=learning_rate,
            negative_samples=max(1, negative_sampling_rate),
            seed=seed,
        )
        out = (
            graph.nodes.select("vid")
            .join(emb_sgd, "vid", "left")
            .select(
                "vid",
                F.coalesce(
                    "embedding", F.array_repeat(F.lit(0.0), d)
                ).alias("embedding"),
            )
        )
        pair_count = pairs.count()
        walks.unpersist()
        pairs.unpersist()
        return Node2VecResult(
            embeddings=out,
            walk_count=res.walk_count,
            pair_count=pair_count,
            metrics=[{"D": big_d, "dims": d, "training": "sgd",
                      "epochs": epochs}],
        )
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


# ------------------------------------------------------------ true SGNS --
#
# The factorization route above is the scale default; ``training="sgd"``
# (node2vec(..., training="sgd") or sgns_train directly) runs TRUE
# skip-gram-with-negative-sampling — the same objective word2vec/the
# reference optimizes — as full-batch gradient descent where the in/out
# embedding TABLES are the distributed parameters (the exact pattern of
# ml/kge.py train_kge: hash-deterministic init + negatives, pure JVM
# array-expression gradients, per-(vid, dim) partial+final scatter sums;
# no parameter server, no driver-sized model, no UDF).

_SG_INIT_A, _SG_INIT_B, _SG_INIT_C, _SG_INIT_MOD = (
    1103515245, 12345, 2654435761, 2_000_000,
)
_SG_NEG_A, _SG_NEG_B, _SG_NEG_D = 2654435761, 1103515245, 12345


def _sg_init(id_col, dim: int, seed: int):
    inv = 1.0 / math.sqrt(dim)
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            F.pmod(
                id_col * F.lit(_SG_INIT_A) + j.cast("long") * F.lit(_SG_INIT_B)
                + F.lit(seed * _SG_INIT_C),
                F.lit(_SG_INIT_MOD),
            ).cast("double") / F.lit(1_000_000.0) - F.lit(1.0)
        ) * F.lit(inv),
    )


def _sg_scatter(grads: DataFrame) -> DataFrame:
    return (
        grads.select("id", F.posexplode("g").alias("dim", "x"))
        .groupBy("id", "dim")
        .agg(F.sum("x").alias("gx"))
        .groupBy("id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "gx"))),
                lambda s: s["gx"],
            ).alias("g")
        )
    )


def sgns_train(
    pairs: DataFrame,
    node_count: int,
    embedding_dimension: int = 64,
    epochs: int = 5,
    learning_rate: float = 0.5,
    negative_samples: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Full-batch SGNS over a (u, c, n) co-occurrence table (dense vids
    in [0, node_count)) → (vid, embedding array<double>), the IN vectors,
    L2-normalized (word2vec convention: the context table is discarded).

    Objective (Mikolov 2013):  max Σ_(u,c) n·[ln σ(w_u·c_c)
                                   + Σ_i ln σ(−w_u·c_neg(u,c,i))]
    Negatives: neg(u,c,i) = hash-mix(u, c, i, seed) mod node_count —
    deterministic, replayed exactly by the numpy twin
    (tests/test_node2vec_sgns.py). Each epoch: join pairs against the two
    embedding tables, gradient vectors as zip_with/transform expressions,
    scatter via per-(vid, dim) sums, update with lr/Σn. Everything
    shuffles on vids; the only collect is the scalar Σn normalizer
    (no per-epoch loss is materialized — unlike train_kge, which
    tracks one).
    """
    d = embedding_dimension
    q = max(1, negative_samples)
    pr = (
        pairs.withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(q - 1))))
        .withColumn(
            "neg",
            F.pmod(
                F.col("u") * F.lit(_SG_NEG_A) + F.col("c") * F.lit(_SG_NEG_B)
                + (F.col("i") * F.lit(31) + F.lit(seed)) * F.lit(_SG_NEG_D),
                F.lit(node_count),
            ).cast("long"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    total = pairs.agg(F.sum("n")).collect()[0][0] or 0
    spark = pairs.sparkSession
    ids = spark.range(node_count).select(F.col("id"))
    w_emb = ids.select("id", _sg_init(F.col("id"), d, seed).alias("emb")
                       ).localCheckpoint(eager=True)
    c_emb = ids.select("id", _sg_init(F.col("id"), d, seed + 1).alias("emb")
                       ).localCheckpoint(eager=True)
    if total == 0:
        pr.unpersist()
        return w_emb.select(F.col("id").alias("vid"),
                            F.array_repeat(F.lit(0.0), d).alias("embedding"))
    dot = lambda a, b: F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    step = learning_rate / float(total)
    for _ep in range(epochs):
        j = (
            pr.join(w_emb.select(F.col("id").alias("u"),
                                 F.col("emb").alias("wu")), "u")
            .join(c_emb.select(F.col("id").alias("c"),
                               F.col("emb").alias("cc")), "c")
            .join(c_emb.select(F.col("id").alias("neg"),
                               F.col("emb").alias("cn")), "neg")
            .withColumn("sp", dot(F.col("wu"), F.col("cc")))
            .withColumn("sn", dot(F.col("wu"), F.col("cn")))
            # positive coefficient: only the i=0 replica carries the
            # positive pair (pairs fan out q-fold for negatives)
            .withColumn(
                "cp",
                F.when(
                    F.col("i") == 0,
                    F.col("n") * (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("sp"))) - F.lit(1.0)),
                ).otherwise(F.lit(0.0)),
            )
            .withColumn("cgn", F.col("n") * (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("sn")))))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        w_grads = j.select(
            F.col("u").alias("id"),
            F.zip_with(
                F.transform("cc", lambda x: F.col("cp") * x),
                F.transform("cn", lambda x: F.col("cgn") * x),
                lambda a, b: a + b,
            ).alias("g"),
        )
        c_grads = (
            j.filter(F.col("i") == 0).select(
                F.col("c").alias("id"),
                F.transform("wu", lambda x: F.col("cp") * x).alias("g"),
            )
            .unionByName(
                j.select(
                    F.col("neg").alias("id"),
                    F.transform("wu", lambda x: F.col("cgn") * x).alias("g"),
                )
            )
        )
        upd = lambda emb, gr: (
            emb.join(_sg_scatter(gr).withColumnRenamed("id", "_gid"),
                     emb["id"] == F.col("_gid"), "left")
            .select(
                emb["id"],
                F.when(F.col("g").isNull(), emb["emb"])
                .otherwise(F.zip_with(emb["emb"], F.col("g"),
                                      lambda e, x: e - F.lit(step) * x))
                .alias("emb"),
            )
        )
        new_w = upd(w_emb, w_grads).localCheckpoint(eager=True)
        new_c = upd(c_emb, c_grads).localCheckpoint(eager=True)
        j.unpersist()
        w_emb.unpersist()
        c_emb.unpersist()
        w_emb, c_emb = new_w, new_c
    pr.unpersist()
    norm = F.sqrt(F.aggregate("emb", F.lit(0.0), lambda a, x: a + x * x))
    return w_emb.select(
        F.col("id").alias("vid"),
        F.when(norm > 0, F.transform("emb", lambda x: x / norm))
        .otherwise(F.col("emb"))
        .alias("embedding"),
    )
