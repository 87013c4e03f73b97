"""Knowledge-graph-embedding link scoring (reference
``gds.ml.kge.predict`` — the KGE prediction surface of the ML family;
TRAINING, like GraphSAGE's, is a parameter-server shape documented out of
scope — models import via the model catalog or arrive as embedding
tables).

Scores candidate (head, relation, tail) triples against node- and
relation-embedding tables with the two standard scoring functions:

- ``transe``  : −‖h + r − t‖₂           (Bordes et al., NeurIPS 2013)
- ``distmult``: Σ_d h_d · r_d · t_d     (Yang et al., ICLR 2015)

Spark plan: two broadcast-or-shuffle joins (triples ⋈ node emb ×2 ⋈ rel
emb) and ONE pure-JVM column expression per score (``zip_with`` +
``aggregate`` — no UDF, no Python in the hot path). At 100 TB the triple
stream is the big side and embeddings join-partition by id; the
expression pipeline stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCORINGS = ("transe", "distmult")


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
    fn = _transe if scoring == "transe" else _distmult
    return j.select(
        "head",
        "rel",
        "tail",
        fn(F.col("_h"), F.col("_r"), F.col("_t")).alias("score"),
    )
