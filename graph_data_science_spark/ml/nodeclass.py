"""Node-classification pipeline (reference
``gds.beta.pipeline.nodeClassification`` — SURVEY.md §2.D ML family).

One-vs-rest logistic regression over a per-node feature table (an
embedding column, optionally concatenated with scalar node properties).
Each class trains via the shared distributed LR (ml/logreg.py); predict
is an argmax over the per-class score expressions — one pass, no UDF,
plan width O(#classes).
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


@dataclass
class NodeClassificationModel:
    classes: list
    per_class: dict  # label -> LogisticRegressionModel
    train_metrics: dict = field(default_factory=dict)


def train_node_classification(
    features: DataFrame,
    id_col: str = "vid",
    feat_col: str = "features",
    label_col: str = "label",
    model: str = "lr",
    **lr_config,
) -> NodeClassificationModel:
    """``features``: (id, features array<double>, label). Labels may be
    any orderable type; classes are trained in sorted order
    (deterministic).

    ``model``: ``"lr"`` (default), ``"mlp"`` (one-hidden-layer MLP,
    ml/mlp.py), ``"rf"`` (histogram random forest, ml/rf.py), or
    ``"auto"`` (per-class candidate selection on a hash-split validation
    fold — ml/model_select.py) — one-vs-rest either way; every model
    family exposes the same ``score_expr`` contract, so predict is
    unchanged."""
    data = features.select(
        F.col(id_col).alias("id"), F.col(feat_col).alias("features"), F.col(label_col).alias("label")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    classes = sorted(r["label"] for r in data.select("label").distinct().collect())
    if model == "mlp":
        from graph_data_science_spark.ml.mlp import train_mlp_classifier as _train
    elif model == "rf":
        from graph_data_science_spark.ml.rf import train_random_forest as _train
    elif model == "auto":
        from graph_data_science_spark.ml.model_select import select_and_train

        cands = lr_config.pop(
            "model_candidates", [{"model": "lr"}, {"model": "mlp"}]
        )

        def _train(ex, feat_col, label_col, **cfg):
            return select_and_train(
                ex, cands, feat_col=feat_col, label_col=label_col, **cfg
            ).model

    elif model == "lr":
        _train = train_logistic_regression
    else:
        raise ValueError(
            f"model must be 'lr', 'mlp', 'rf' or 'auto', got {model!r}"
        )
    per_class = {}
    for c in classes:
        ex = data.select(
            "features", (F.col("label") == F.lit(c)).cast("int").alias("y")
        )
        per_class[c] = _train(ex, feat_col="features", label_col="y", **lr_config)
    # train accuracy via the same argmax expression predict uses
    pred = predict_node_classification(
        NodeClassificationModel(classes=classes, per_class=per_class),
        data,
        id_col="id",
        feat_col="features",
    )
    acc = (
        pred.join(data.select("id", "label"), "id")
        .agg(F.avg((F.col("predicted") == F.col("label")).cast("double")))
        .collect()[0][0]
    )
    data.unpersist()
    return NodeClassificationModel(
        classes=classes,
        per_class=per_class,
        train_metrics={"train_accuracy": float(acc or 0.0), "classes": len(classes)},
    )


def predict_node_classification(
    model: NodeClassificationModel,
    features: DataFrame,
    id_col: str = "vid",
    feat_col: str = "features",
) -> DataFrame:
    """→ (id, predicted, probability): argmax class by σ score, ties →
    first class in sorted order (deterministic struct max)."""
    scored = F.array(
        *[
            F.struct(
                model.per_class[c].score_expr(F.col(feat_col)).alias("p"),
                F.lit(-i).alias("negrank"),  # tie → smaller class index wins
                F.lit(c).alias("cls"),
            )
            for i, c in enumerate(model.classes)
        ]
    )
    best = F.array_max(scored)
    return features.select(
        F.col(id_col).alias("id"),
        best["cls"].alias("predicted"),
        best["p"].alias("probability"),
    )
