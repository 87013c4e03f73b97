"""Link-prediction pipeline (reference ``gds.beta.pipeline.linkPrediction``
— SURVEY.md §2.D ML family: addNodeProperty → addFeature → train →
predict).

Spark-first shape:
- **feature step**: node-pair features from a per-node embedding table
  (FastRP / Node2Vec / HashGNN output) via pure JVM array expressions —
  HADAMARD (elementwise product), L2 (squared diff), COSINE (1-dim).
- **example building**: positives = the projected edges; negatives =
  hash-deterministic non-edge pairs (same count), anti-joined against
  the edge set — one join + one anti-join, no driver sampling loop.
- **train**: the shared distributed LR trainer (ml/logreg.py).
- **predict**: score candidate pairs with the model as a column
  expression — usable inside any DataFrame plan, no UDF.

Determinism: negative sampling derives from ``xxhash64(slot, seed)``;
the trainer is full-batch; same inputs → same model on any cluster.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graph_data_science_spark.ml.logreg import (
    LogisticRegressionModel,
    train_logistic_regression,
)
from graph_data_science_spark.projection import ProjectedGraph

FEATURE_TYPES = ("HADAMARD", "L2", "COSINE")


@dataclass
class LinkPredictionModel:
    feature_type: str
    lr: LogisticRegressionModel
    train_metrics: dict = field(default_factory=dict)


def pair_features(
    pairs: DataFrame,
    embeddings: DataFrame,
    feature_type: str = "HADAMARD",
    id_col: str = "vid",
    vec_col: str = "embedding",
) -> DataFrame:
    """(src, dst, …) ⋈ embeddings² → + features array<double>."""
    ft = feature_type.upper()
    if ft not in FEATURE_TYPES:
        raise ValueError(f"feature_type must be one of {FEATURE_TYPES}, got {feature_type!r}")
    ea = embeddings.select(F.col(id_col).alias("src"), F.col(vec_col).alias("_ea"))
    eb = embeddings.select(F.col(id_col).alias("dst"), F.col(vec_col).alias("_eb"))
    j = pairs.join(ea, "src").join(eb, "dst")
    if ft == "HADAMARD":
        feat = F.zip_with("_ea", "_eb", lambda a, b: a * b)
    elif ft == "L2":
        feat = F.zip_with("_ea", "_eb", lambda a, b: (a - b) * (a - b))
    else:  # COSINE → single scalar feature
        from graph_data_science_spark.functions import cosine_similarity

        feat = F.array(cosine_similarity(F.col("_ea"), F.col("_eb")))
    return j.withColumn("features", feat).drop("_ea", "_eb")


def _negative_pairs(graph: ProjectedGraph, m: int, seed: int) -> DataFrame:
    """m hash-deterministic node pairs that are NOT edges (and not self
    loops). Oversample 3× slots, anti-join the edge set, keep the first m
    in slot order (deterministic)."""
    spark = graph.nodes.sparkSession
    n = graph.node_count
    slots = spark.range(3 * m)
    cand = slots.select(
        F.col("id").alias("_slot"),
        F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(n)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(n)).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    non_edges = cand.join(
        graph.edges.select("src", "dst").distinct(), ["src", "dst"], "left_anti"
    )
    return (
        non_edges.orderBy("_slot")
        .limit(m)
        .select("src", "dst")
    )


def train_link_prediction(
    graph: ProjectedGraph,
    embeddings: DataFrame,
    feature_type: str = "HADAMARD",
    id_col: str = "vid",
    vec_col: str = "embedding",
    negative_ratio: float = 1.0,
    seed: int = 42,
    negatives: DataFrame | None = None,
    model: str = "lr",
    **lr_config,
) -> LinkPredictionModel:
    """``negatives``: optional explicit (src, dst) non-edge pairs (the
    reference analogue of configured negative sampling); default = the
    hash-deterministic sampler ``_negative_pairs``.

    ``model``: ``"lr"`` (logistic regression, default), ``"mlp"``
    (one-hidden-layer MLP, ml/mlp.py), ``"rf"`` (histogram random
    forest, ml/rf.py), or ``"auto"`` (train the ``model_candidates``
    config list on a hash-split train fold, pick by validation accuracy,
    refit the winner on all examples — ml/model_select.py; the reference
    pipelines' candidate auto-tuning). Every family exposes the same
    ``score_expr`` contract so everything downstream is model-agnostic."""
    pos = (
        graph.edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .withColumn("label", F.lit(1))
    )
    m_pos = pos.count()
    if negatives is not None:
        neg = negatives.select("src", "dst").withColumn("label", F.lit(0))
    else:
        neg = _negative_pairs(graph, int(m_pos * negative_ratio), seed).withColumn(
            "label", F.lit(0)
        )
    examples = pair_features(
        pos.unionByName(neg), embeddings, feature_type, id_col, vec_col
    ).persist(StorageLevel.MEMORY_AND_DISK)
    selection = None
    if model == "mlp":
        from graph_data_science_spark.ml.mlp import train_mlp_classifier

        lr = train_mlp_classifier(examples, **lr_config)
    elif model == "rf":
        from graph_data_science_spark.ml.rf import train_random_forest

        lr = train_random_forest(examples, **lr_config)
    elif model == "auto":
        # upstream parity: train every candidate on a hash-split train
        # fold, pick by validation accuracy, refit winner on everything
        from graph_data_science_spark.ml.model_select import select_and_train

        cands = lr_config.pop(
            "model_candidates", [{"model": "lr"}, {"model": "mlp"}]
        )
        res = select_and_train(examples, cands, **lr_config)
        lr, selection = res.model, res
    elif model == "lr":
        lr = train_logistic_regression(examples, **lr_config)
    else:
        raise ValueError(
            f"model must be 'lr', 'mlp', 'rf' or 'auto', got {model!r}"
        )
    # train-set quality: accuracy at 0.5 (cheap; honest label: TRAIN metric)
    scored = examples.select(
        "label", (lr.score_expr(F.col("features")) >= 0.5).cast("int").alias("pred")
    )
    acc_row = scored.agg(
        F.avg((F.col("label") == F.col("pred")).cast("double")).alias("acc"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    examples.unpersist()
    tm = {
        "train_accuracy": float(acc_row["acc"] or 0.0),
        "examples": int(acc_row["n"]),
        "final_loss": lr.metrics[-1].get("loss") if lr.metrics else None,
    }
    if selection is not None:
        tm["selected_model"] = selection.winner
        tm["candidates"] = selection.candidates
    return LinkPredictionModel(
        feature_type=feature_type.upper(),
        lr=lr,
        train_metrics=tm,
    )


def predict_link_prediction(
    model: LinkPredictionModel,
    pairs: DataFrame,
    embeddings: DataFrame,
    id_col: str = "vid",
    vec_col: str = "embedding",
) -> DataFrame:
    """Score candidate (src, dst) pairs → (src, dst, probability)."""
    feats = pair_features(pairs, embeddings, model.feature_type, id_col, vec_col)
    return feats.select(
        "src", "dst", model.lr.score_expr(F.col("features")).alias("probability")
    )
