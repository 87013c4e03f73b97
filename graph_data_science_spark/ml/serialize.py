"""Pipeline-model (de)serialization for the model catalog.

Upstream GDS pipeline training (``gds.beta.pipeline.linkPrediction.train``
etc. — SURVEY.md §2.D ML) stores the trained model in the model catalog
and ``...predict`` resolves it by name. This module gives every model
family here the same round-trip: each model's parameters are plain
Python floats/ints/lists, so the catalog's JSON manifest (ml/models.py)
carries them losslessly — ``float`` survives JSON exactly (repr
round-trip), so a loaded model's ``score_expr`` literals are
bit-identical to the trained one's.

``model_params`` → ``(type, params)`` for ``ModelCatalog.store``;
``model_from_params`` reverses it. Covers the base families (LR, linear,
MLP, random forest) and the pipeline wrappers (link prediction, node
classification, node regression), which nest a base model per class.
"""

from __future__ import annotations

from typing import Any


def _base_params(model: Any) -> tuple[str, dict]:
    from graph_data_science_spark.ml.logreg import LogisticRegressionModel
    from graph_data_science_spark.ml.mlp import MLPClassifierModel
    from graph_data_science_spark.ml.nodereg import LinearRegressionModel
    from graph_data_science_spark.ml.rf import RandomForestModel

    if isinstance(model, LogisticRegressionModel):
        return "lr", {
            "weights": list(model.weights),
            "bias": model.bias,
            "iterations": model.iterations,
        }
    if isinstance(model, LinearRegressionModel):
        return "linear", {
            "weights": list(model.weights),
            "bias": model.bias,
            "iterations": model.iterations,
        }
    if isinstance(model, MLPClassifierModel):
        return "mlp", {
            "w1": [list(r) for r in model.w1],
            "b1": list(model.b1),
            "w2": list(model.w2),
            "b2": model.b2,
            "iterations": model.iterations,
        }
    if isinstance(model, RandomForestModel):
        # JSON keys are strings — node ids stringify here, int() back on load
        return "rf", {
            "splits": [
                {str(nd): [s.dim, s.threshold] for nd, s in t.items()}
                for t in model.splits
            ],
            "leaves": [
                {str(nd): p for nd, p in t.items()} for t in model.leaves
            ],
            "n_dims": model.n_dims,
        }
    raise TypeError(f"unsupported base model type: {type(model).__name__}")


def _base_from_params(kind: str, p: dict) -> Any:
    if kind == "lr":
        from graph_data_science_spark.ml.logreg import LogisticRegressionModel

        return LogisticRegressionModel(
            weights=[float(w) for w in p["weights"]],
            bias=float(p["bias"]),
            iterations=int(p["iterations"]),
        )
    if kind == "linear":
        from graph_data_science_spark.ml.nodereg import LinearRegressionModel

        return LinearRegressionModel(
            weights=[float(w) for w in p["weights"]],
            bias=float(p["bias"]),
            iterations=int(p["iterations"]),
        )
    if kind == "mlp":
        from graph_data_science_spark.ml.mlp import MLPClassifierModel

        return MLPClassifierModel(
            w1=[[float(v) for v in r] for r in p["w1"]],
            b1=[float(v) for v in p["b1"]],
            w2=[float(v) for v in p["w2"]],
            b2=float(p["b2"]),
            iterations=int(p["iterations"]),
        )
    if kind == "rf":
        from graph_data_science_spark.ml.rf import RandomForestModel, _Split

        return RandomForestModel(
            splits=[
                {
                    int(nd): _Split(dim=int(v[0]), threshold=float(v[1]))
                    for nd, v in t.items()
                }
                for t in p["splits"]
            ],
            leaves=[
                {int(nd): float(v) for nd, v in t.items()} for t in p["leaves"]
            ],
            n_dims=int(p["n_dims"]),
        )
    raise ValueError(f"unknown base model kind: {kind!r}")


def model_params(model: Any) -> tuple[str, dict]:
    """(catalog model_type, JSON-safe params) for any trained model —
    base family or pipeline wrapper."""
    from graph_data_science_spark.ml.linkpred import LinkPredictionModel
    from graph_data_science_spark.ml.nodeclass import NodeClassificationModel
    from graph_data_science_spark.ml.nodereg import NodeRegressionModel

    if isinstance(model, LinkPredictionModel):
        kind, base = _base_params(model.lr)
        return "link_prediction", {
            "feature_type": model.feature_type,
            "model": kind,
            "base": base,
            "train_metrics": model.train_metrics,
        }
    if isinstance(model, NodeClassificationModel):
        per = {}
        kinds = {}
        for c, m in model.per_class.items():
            kinds[str(c)], per[str(c)] = _base_params(m)
        return "node_classification", {
            "classes": list(model.classes),
            "kinds": kinds,
            "per_class": per,
            "train_metrics": model.train_metrics,
        }
    if isinstance(model, NodeRegressionModel):
        kind, base = _base_params(model.lin)
        return "node_regression", {
            "model": kind,
            "base": base,
            "train_metrics": model.train_metrics,
        }
    kind, base = _base_params(model)
    return kind, base


def model_from_params(model_type: str, p: dict) -> Any:
    """Inverse of :func:`model_params`."""
    if model_type == "link_prediction":
        from graph_data_science_spark.ml.linkpred import LinkPredictionModel

        return LinkPredictionModel(
            feature_type=p["feature_type"],
            lr=_base_from_params(p["model"], p["base"]),
            train_metrics=p.get("train_metrics", {}),
        )
    if model_type == "node_classification":
        from graph_data_science_spark.ml.nodeclass import NodeClassificationModel

        classes = list(p["classes"])
        # JSON stringifies dict keys; recover by aligning with `classes`
        # (whose element types JSON preserves for ints/strings)
        per = {
            c: _base_from_params(p["kinds"][str(c)], p["per_class"][str(c)])
            for c in classes
        }
        return NodeClassificationModel(
            classes=classes,
            per_class=per,
            train_metrics=p.get("train_metrics", {}),
        )
    if model_type == "node_regression":
        from graph_data_science_spark.ml.nodereg import NodeRegressionModel

        return NodeRegressionModel(
            lin=_base_from_params(p["model"], p["base"]),
            train_metrics=p.get("train_metrics", {}),
        )
    return _base_from_params(model_type, p)
