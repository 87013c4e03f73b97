"""Knowledge-graph-embedding link scoring AND training (reference
``gds.ml.kge.predict`` — the KGE prediction surface of the ML family;
upstream GDS trains KGE models externally through its PyG integration,
so ``train_kge`` below is this engine's Spark-native closure of that
gap — see the training section).

Scores candidate (head, relation, tail) triples against node- and
relation-embedding tables with the two standard scoring functions:

- ``transe``  : −‖h + r − t‖₂           (Bordes et al., NeurIPS 2013)
- ``distmult``: Σ_d h_d · r_d · t_d     (Yang et al., ICLR 2015)
- ``rotate``  : −‖h ∘ e^{iθ_r} − t‖₂    (Sun et al., ICLR 2019;
  predict-only — entity dims are (re, im) pairs, relation dims phases)

Spark plan: two broadcast-or-shuffle joins (triples ⋈ node emb ×2 ⋈ rel
emb) and ONE pure-JVM column expression per score (``zip_with`` +
``aggregate`` — no UDF, no Python in the hot path). At 100 TB the triple
stream is the big side and embeddings join-partition by id; the
expression pipeline stays inside whole-stage codegen.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

SCORINGS = ("transe", "distmult", "rotate")


def _transe(h: Column, r: Column, t: Column) -> Column:
    diff2 = F.aggregate(
        F.zip_with(F.zip_with(h, r, lambda a, b: a + b), t, lambda s, c: s - c),
        F.lit(0.0),
        lambda acc, x: acc + x * x,
    )
    return -F.sqrt(diff2)


def _distmult(h: Column, r: Column, t: Column) -> Column:
    return F.aggregate(
        F.zip_with(F.zip_with(h, r, lambda a, b: a * b), t, lambda p, c: p * c),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _rotate(h: Column, r: Column, t: Column) -> Column:
    """RotatE (Sun et al., ICLR 2019): −‖h ∘ e^{iθ_r} − t‖₂ over paired
    (re, im) entity dims; the relation vector holds d/2 phase angles.
    Still a pure JVM expression — ``aggregate`` over the phase index with
    1-based ``element_at`` picks on the entity arrays."""
    def term(acc: Column, i: Column) -> Column:
        re_ = F.element_at(h, i * 2 + 1)
        im_ = F.element_at(h, i * 2 + 2)
        tr = F.element_at(t, i * 2 + 1)
        ti = F.element_at(t, i * 2 + 2)
        th = F.element_at(r, i + 1)
        dre = re_ * F.cos(th) - im_ * F.sin(th) - tr
        dim_ = re_ * F.sin(th) + im_ * F.cos(th) - ti
        return acc + dre * dre + dim_ * dim_

    idx = F.sequence(F.lit(0), F.size(r) - 1)
    return -F.sqrt(F.aggregate(idx, F.lit(0.0), term))


def predict_kge(
    triples: DataFrame,
    node_embeddings: DataFrame,
    relation_embeddings: DataFrame,
    scoring: str = "transe",
    id_col: str = "id",
    vec_col: str = "embedding",
    rel_col: str = "rel",
) -> DataFrame:
    """``triples``: (head, rel, tail); ``node_embeddings``: (id, vec);
    ``relation_embeddings``: (rel, vec) → (head, rel, tail, score)."""
    if scoring not in SCORINGS:
        raise ValueError(f"scoring must be one of {SCORINGS}, got {scoring!r}")
    he = node_embeddings.select(
        F.col(id_col).alias("head"), F.col(vec_col).alias("_h")
    )
    te = node_embeddings.select(
        F.col(id_col).alias("tail"), F.col(vec_col).alias("_t")
    )
    re_ = relation_embeddings.select(
        F.col(rel_col).alias("rel"), F.col(vec_col).alias("_r")
    )
    j = triples.join(he, "head").join(te, "tail").join(F.broadcast(re_), "rel")
    fn = {"transe": _transe, "distmult": _distmult, "rotate": _rotate}[scoring]
    return j.select(
        "head",
        "rel",
        "tail",
        fn(F.col("_h"), F.col("_r"), F.col("_t")).alias("score"),
    )

# ---------------------------------------------------------------- training --
#
# Reference surface: the GDS ML family trains KGE models externally (its
# docs route ``gds.ml.kge`` training through the PyG integration) and
# imports them through the model catalog. This engine closes that gap
# Spark-natively: full-batch gradient descent where the PARAMETERS ARE THE
# EMBEDDING TABLES themselves, so — unlike GraphSAGE's tiny dense weight
# matrices — updates stay fully distributed: every epoch is a handful of
# hash joins plus a per-(id, dim) partial+final gradient sum. No UDF, no
# Arrow kernel, no Python in the loop body: scores, losses, and gradient
# vectors are all ``zip_with``/``aggregate``/``transform`` JVM expressions
# inside whole-stage codegen.
#
# Determinism: init and negative sampling use integer hash mixes over the
# DENSE entity/relation ranks (assign_dense_ids), so a numpy twin can
# replay the entire run exactly (tests/test_kge_train.py) and a DuckDB
# oracle can unroll epochs as CTEs (__spark_entry__.q_kge_train).

from dataclasses import dataclass, field

# Hash-mix constants (shared verbatim by the numpy + SQL oracles).
_INIT_A, _INIT_B, _INIT_C, _INIT_MOD = 1103515245, 12345, 2654435761, 2_000_000
_NEG_A, _NEG_B, _NEG_C, _NEG_D = 2654435761, 1103515245, 97, 12345


@dataclass
class KgeTrainResult:
    node_embeddings: DataFrame      # (id, embedding array<double>)
    relation_embeddings: DataFrame  # (rel, embedding array<double>)
    losses: list = field(default_factory=list)  # mean loss per epoch
    scoring: str = "transe"
    dimension: int = 0


def _hash_init(id_col: Column, dim: int, seed: int) -> Column:
    """Deterministic init vector for a dense id: per dim,
    v = (((id*A + dim*B + seed*C) mod 2e6) / 1e6 − 1) / √dim ∈ [−1/√d, 1/√d).
    Pure JVM expression; exact-replayable with Python ints."""
    inv = 1.0 / math.sqrt(dim)
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: (
            F.pmod(
                id_col * F.lit(_INIT_A) + d.cast("long") * F.lit(_INIT_B)
                + F.lit(seed * _INIT_C),
                F.lit(_INIT_MOD),
            ).cast("double") / F.lit(1_000_000.0) - F.lit(1.0)
        ) * F.lit(inv),
    )


def _scatter_sum(grads: DataFrame, dim: int) -> DataFrame:
    """(id, g array<double>) rows → (id, g) element-wise summed per id.
    posexplode → partial+final sum per (id, dim) → sorted-struct rebuild:
    the engine's standard skew-safe element-wise aggregation (same shape
    as FastRP / GraphSAGE gathers)."""
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


def _apply_update(emb: DataFrame, grads: DataFrame, step: float, dim: int,
                  normalize: bool) -> DataFrame:
    """emb ← emb − step·grad (ids without gradient keep their vector);
    optionally renormalize rows to unit L2 (Bordes 2013 does this for
    entity embeddings every epoch)."""
    out = (
        emb.join(grads.withColumnRenamed("id", "_gid"),
                 emb["id"] == F.col("_gid"), "left")
        .select(
            emb["id"],
            F.when(
                F.col("g").isNull(), emb["emb"]
            ).otherwise(
                F.zip_with(emb["emb"], F.col("g"),
                           lambda e, gr: e - F.lit(step) * gr)
            ).alias("emb"),
        )
    )
    if normalize:
        out = out.select(
            "id",
            F.transform(
                "emb",
                lambda x: x / F.greatest(
                    F.sqrt(F.aggregate(F.col("emb"), F.lit(0.0),
                                       lambda a, e: a + e * e)),
                    F.lit(1e-12),
                ),
            ).alias("emb"),
        )
    return out


def train_kge(
    triples: DataFrame,
    scoring: str = "transe",
    embedding_dimension: int = 16,
    epochs: int = 10,
    learning_rate: float = 0.1,
    negative_samples: int = 2,
    margin: float = 1.0,
    seed: int = 42,
    head_col: str = "head",
    rel_col: str = "rel",
    tail_col: str = "tail",
) -> KgeTrainResult:
    """Train TransE / DistMult embeddings on a (head, rel, tail) triple
    table with full-batch gradient descent.

    - ``transe`` (Bordes et al., NeurIPS 2013): margin ranking loss
      ``max(0, γ + d(pos) − d(neg))`` with the SQUARED-L2 energy
      ``d = ‖h+r−t‖²`` (squared keeps the gradient linear — ``2(h+r−t)``
      — with no divide-by-norm singularity; documented deviation from the
      paper's plain L2). Entity rows are L2-renormalized after every
      epoch, per the paper.
    - ``distmult`` (Yang et al., ICLR 2015): logistic loss on the
      trilinear score, positives label 1, hash negatives label 0;
      gradient wrt h is ``(σ(s)−y)·(r∘t)`` etc. No renormalization.

    Negatives: ``negative_samples`` corruptions per positive; even sample
    index corrupts the tail, odd the head, with the replacement entity
    drawn by an integer hash mix over the dense ranks — deterministic,
    collision-with-truth allowed (standard sampling noise, replayed
    exactly by the oracles).

    Scale: per epoch, 4–5 hash joins of the (|triples|·(1+Q))-row pair
    table against the entity table plus one per-(id, dim) gradient sum.
    Everything shuffles on entity/relation ids; the per-epoch loss is the
    only driver collect. Dense ranks must stay below ~3.4e9 for the hash
    mixes to avoid 64-bit wrap (fine: that bound is per-distinct-entity,
    not per-row).
    """
    if scoring not in ("transe", "distmult"):
        raise ValueError(
            f"training supports 'transe' and 'distmult', got {scoring!r} "
            "(rotate is predict-only)"
        )
    from graph_data_science_spark.projection import assign_dense_ids

    d = embedding_dimension
    t3 = triples.select(
        F.col(head_col).alias("h_orig"),
        F.col(rel_col).alias("r_orig"),
        F.col(tail_col).alias("t_orig"),
    )
    ents = assign_dense_ids(
        t3.select(F.col("h_orig").alias("orig_id"))
        .union(t3.select(F.col("t_orig").alias("orig_id")))
        .distinct()
    ).persist(StorageLevel.MEMORY_AND_DISK)
    rels = assign_dense_ids(
        t3.select(F.col("r_orig").alias("orig_id")).distinct()
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n_ent = ents.count()
    n_rel = rels.count()

    dense = (
        t3.join(ents.select(F.col("orig_id").alias("h_orig"),
                            F.col("vid").alias("h")), "h_orig")
        .join(ents.select(F.col("orig_id").alias("t_orig"),
                          F.col("vid").alias("t")), "t_orig")
        .join(F.broadcast(rels.select(F.col("orig_id").alias("r_orig"),
                                      F.col("vid").alias("r"))), "r_orig")
        .select("h", "r", "t")
    )
    # one row per (positive, sample i) with the corrupted pair precomputed
    q = max(1, negative_samples)
    corrupt = F.pmod(
        F.col("h") * F.lit(_NEG_A) + F.col("t") * F.lit(_NEG_B)
        + F.col("r") * F.lit(_NEG_C)
        + (F.col("i") * F.lit(31) + F.lit(seed)) * F.lit(_NEG_D),
        F.lit(n_ent),
    ).cast("long")
    pairs = (
        dense.withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(q - 1))))
        .withColumn("corr", corrupt)
        .withColumn("nh", F.when(F.col("i") % 2 == 1, F.col("corr"))
                           .otherwise(F.col("h")))
        .withColumn("nt", F.when(F.col("i") % 2 == 0, F.col("corr"))
                           .otherwise(F.col("t")))
        .drop("corr")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_pairs = pairs.count()

    ent_emb = ents.select(
        F.col("vid").alias("id"), _hash_init(F.col("vid"), d, seed).alias("emb")
    ).localCheckpoint(eager=True)
    rel_emb = rels.select(
        F.col("vid").alias("id"),
        _hash_init(F.col("vid"), d, seed + 1).alias("emb"),
    ).localCheckpoint(eager=True)

    losses: list[float] = []
    for _ep in range(epochs):
        e = ent_emb
        r_ = rel_emb
        j = (
            pairs
            .join(e.select(F.col("id").alias("h"), F.col("emb").alias("eh")), "h")
            .join(e.select(F.col("id").alias("t"), F.col("emb").alias("et")), "t")
            .join(e.select(F.col("id").alias("nh"), F.col("emb").alias("enh")), "nh")
            .join(e.select(F.col("id").alias("nt"), F.col("emb").alias("ent_")), "nt")
            .join(F.broadcast(
                r_.select(F.col("id").alias("r"), F.col("emb").alias("er"))), "r")
        )
        if scoring == "transe":
            epos = F.zip_with(F.zip_with(F.col("eh"), F.col("er"),
                                         lambda a, b: a + b),
                              F.col("et"), lambda s, c: s - c)
            eneg = F.zip_with(F.zip_with(F.col("enh"), F.col("er"),
                                         lambda a, b: a + b),
                              F.col("ent_"), lambda s, c: s - c)
            sq = lambda v: F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x)
            j = (
                j.withColumn("epos", epos).withColumn("eneg", eneg)
                .withColumn("viol",
                            F.lit(margin) + sq(F.col("epos")) - sq(F.col("eneg")))
                .withColumn("act",
                            F.when(F.col("viol") > 0, F.lit(1.0))
                            .otherwise(F.lit(0.0)))
            ).persist(StorageLevel.MEMORY_AND_DISK)
            loss_row = j.agg(
                F.sum(F.greatest(F.col("viol"), F.lit(0.0))).alias("L")
            ).collect()[0]
            losses.append(float(loss_row["L"] or 0.0) / n_pairs)
            scale = lambda v, s: F.transform(v, lambda x: F.col("act") * F.lit(s) * x * 2.0)
            ent_grads = (
                j.select(F.col("h").alias("id"), scale(F.col("epos"), 1.0).alias("g"))
                .unionByName(j.select(F.col("t").alias("id"),
                                      scale(F.col("epos"), -1.0).alias("g")))
                .unionByName(j.select(F.col("nh").alias("id"),
                                      scale(F.col("eneg"), -1.0).alias("g")))
                .unionByName(j.select(F.col("nt").alias("id"),
                                      scale(F.col("eneg"), 1.0).alias("g")))
            )
            rel_grads = j.select(
                F.col("r").alias("id"),
                F.transform(
                    F.zip_with(F.col("epos"), F.col("eneg"), lambda p, ng: p - ng),
                    lambda x: F.col("act") * x * 2.0,
                ).alias("g"),
            )
            normalize = True
        else:  # distmult — logistic over pos row + neg row per pair
            tri = lambda a, b: F.zip_with(F.col(a), F.col(b), lambda x, y: x * y)
            dot3 = lambda a, b, c: F.aggregate(
                F.zip_with(F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
                           F.col(c), lambda p, z: p * z),
                F.lit(0.0), lambda acc, x: acc + x)
            # dedupe the positive row: sample i=0 carries it; negatives all
            pos = (
                j.filter(F.col("i") == 0)
                .withColumn("s", dot3("eh", "er", "et"))
                .withColumn("c", F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("s"))) - F.lit(1.0))
                .withColumn("l", F.log1p(F.exp(-F.col("s"))))
                .select("h", "r", "t", F.col("eh").alias("xh"),
                        F.col("er").alias("xr"), F.col("et").alias("xt"),
                        "c", "l",
                        F.col("h").alias("gh"), F.col("t").alias("gt"))
            )
            neg = (
                j.withColumn("s", dot3("enh", "er", "ent_"))
                .withColumn("c", F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("s"))))
                .withColumn("l", F.log1p(F.exp(F.col("s"))))
                .select("h", "r", "t", F.col("enh").alias("xh"),
                        F.col("er").alias("xr"), F.col("ent_").alias("xt"),
                        "c", "l",
                        F.col("nh").alias("gh"), F.col("nt").alias("gt"))
            )
            rows = pos.unionByName(neg).persist(StorageLevel.MEMORY_AND_DISK)
            n_rows = n_pairs // q + n_pairs  # positives + negatives
            loss_row = rows.agg(F.sum("l").alias("L")).collect()[0]
            losses.append(float(loss_row["L"] or 0.0) / n_rows)
            cmul = lambda v: F.transform(v, lambda x: F.col("c") * x)
            ent_grads = (
                rows.select(F.col("gh").alias("id"),
                            cmul(F.zip_with(F.col("xr"), F.col("xt"),
                                            lambda a, b: a * b)).alias("g"))
                .unionByName(
                    rows.select(F.col("gt").alias("id"),
                                cmul(F.zip_with(F.col("xh"), F.col("xr"),
                                                lambda a, b: a * b)).alias("g")))
            )
            rel_grads = rows.select(
                F.col("r").alias("id"),
                cmul(F.zip_with(F.col("xh"), F.col("xt"),
                                lambda a, b: a * b)).alias("g"),
            )
            j = rows
            normalize = False
            n_pairs_eff = n_rows
        denom = n_pairs if scoring == "transe" else n_pairs_eff
        step = learning_rate / denom
        new_ent = _apply_update(
            ent_emb, _scatter_sum(ent_grads, d), step, d, normalize
        ).localCheckpoint(eager=True)
        new_rel = _apply_update(
            rel_emb, _scatter_sum(rel_grads, d), step, d, False
        ).localCheckpoint(eager=True)
        j.unpersist()
        ent_emb.unpersist()
        rel_emb.unpersist()
        ent_emb, rel_emb = new_ent, new_rel

    node_out = ent_emb.join(
        ents.select(F.col("orig_id").alias("node"), F.col("vid").alias("id")), "id"
    ).select(F.col("node").alias("id"), F.col("emb").alias("embedding"))
    rel_out = rel_emb.join(
        rels.select(F.col("orig_id").alias("relname"), F.col("vid").alias("id")),
        "id",
    ).select(F.col("relname").alias("rel"), F.col("emb").alias("embedding"))
    pairs.unpersist()
    ents.unpersist()
    rels.unpersist()
    return KgeTrainResult(
        node_embeddings=node_out,
        relation_embeddings=rel_out,
        losses=losses,
        scoring=scoring,
        dimension=d,
    )
