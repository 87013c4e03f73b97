"""Model candidate auto-selection for the LP/NC pipelines (reference:
upstream pipelines take a LIST of model candidates — logistic
regression / MLP / random forest configs — and auto-select on a
validation split before refitting the winner; ``addLogisticRegression``
/ ``addMLP`` + train-time selection in ``ml/ml-algo``).

Spark-first: the split is a deterministic hash of the whole feature
array (xxhash64 of its JSON rendering — no row ids required, stable
across partitionings), candidates train on the train fold only, the
winner is picked by validation accuracy (ties → first candidate, so the
candidate list order is the deterministic tie-break, matching upstream's
"first best" semantics), then refit on ALL examples. Everything is
DataFrame-side except the per-candidate (accuracy, loss) scalars.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def _trainer(model: str) -> Callable[..., Any]:
    if model == "lr":
        from graph_data_science_spark.ml.logreg import train_logistic_regression

        return train_logistic_regression
    if model == "mlp":
        from graph_data_science_spark.ml.mlp import train_mlp_classifier

        return train_mlp_classifier
    if model == "rf":
        from graph_data_science_spark.ml.rf import train_random_forest

        return train_random_forest
    raise ValueError(f"candidate model must be 'lr', 'mlp' or 'rf', got {model!r}")


@dataclass
class SelectionResult:
    model: Any  # the refit winner (exposes score_expr)
    winner: dict  # the winning candidate config
    candidates: list[dict] = field(default_factory=list)  # per-candidate metrics


def select_and_train(
    examples: DataFrame,
    candidates: list[dict],
    feat_col: str = "features",
    label_col: str = "label",
    validation_fraction: float = 0.2,
    seed: int = 42,
    **common_config,
) -> SelectionResult:
    """``examples``: (features array<double>, label 0/1). Each candidate
    is a config dict with a ``model`` key ('lr' | 'mlp'); the rest are
    that trainer's kwargs. ``common_config`` kwargs (e.g. a pipeline's
    max_iterations/tolerance) apply to EVERY candidate, with the
    candidate's own keys winning on conflict — this is how the LP/NC
    pipelines forward their trainer config to model='auto'. Trains every
    candidate on the train fold, scores validation accuracy, refits the
    winner on all examples."""
    if not candidates:
        raise ValueError("candidates must be a non-empty list of config dicts")
    candidates = [{**common_config, **c} for c in candidates]
    data = examples.select(
        F.col(feat_col).alias("features"),
        F.col(label_col).cast("double").alias("label"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # deterministic, partitioning-independent fold assignment
    bucket = F.pmod(F.xxhash64(F.to_json(F.struct("features", "label")), F.lit(seed)), F.lit(1000))
    val_cut = int(validation_fraction * 1000)
    train = data.filter(bucket >= val_cut)
    val = data.filter(bucket < val_cut).persist(StorageLevel.MEMORY_AND_DISK)
    n_val = val.count()
    report: list[dict] = []
    best_i, best_acc = 0, -1.0
    for i, cand in enumerate(candidates):
        cfg = dict(cand)
        name = cfg.pop("model", "lr")
        m = _trainer(name)(train, feat_col="features", label_col="label", **cfg)
        if n_val:
            acc_row = val.agg(
                F.avg(
                    (
                        (m.score_expr(F.col("features")) >= 0.5).cast("double")
                        == F.col("label")
                    ).cast("double")
                ).alias("acc")
            ).collect()[0]
            acc = float(acc_row["acc"] or 0.0)
        else:  # degenerate: no validation rows → fall back to train loss
            # (tree models report no loss → 0.0, i.e. candidate-order tie)
            acc = -float(m.metrics[-1].get("loss", 0.0)) if m.metrics else 0.0
        report.append({"model": name, "config": cfg, "validation_accuracy": acc})
        if acc > best_acc:
            best_i, best_acc = i, acc
    win = dict(candidates[best_i])
    name = win.pop("model", "lr")
    final = _trainer(name)(data, feat_col="features", label_col="label", **win)
    val.unpersist()
    data.unpersist()
    return SelectionResult(
        model=final,
        winner={"model": name, **win, "validation_accuracy": best_acc},
        candidates=report,
    )
