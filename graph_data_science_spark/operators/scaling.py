"""Property scaling (reference ``gds.scaleProperties``): apply a scaler
to one or more node-property columns in a single pass.

Scalers (upstream set): minmax, max, mean, log, stdscore (z-score),
l1norm, l2norm, center. Each is one global aggregate (collected to the
driver — a handful of doubles) + one ``select`` — no shuffle beyond the
aggregate's partial+final pass, and the aggregate over all requested
columns is computed in ONE job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALERS = ("minmax", "max", "mean", "log", "stdscore", "l1norm", "l2norm", "center")


def scale_properties(
    df: DataFrame, properties: dict[str, str], suffix: str = "_scaled"
) -> DataFrame:
    """``properties`` maps column → scaler name; appends ``<col><suffix>``
    columns. E.g. ``scale_properties(deg, {"degree": "minmax"})``."""
    for col, scaler in properties.items():
        if scaler not in SCALERS:
            raise ValueError(f"scaler must be one of {SCALERS}, got {scaler!r}")
    aggs = []
    for col in properties:
        c = F.col(col)
        aggs += [
            F.min(c).alias(f"{col}__mn"),
            F.max(c).alias(f"{col}__mx"),
            F.avg(c).alias(f"{col}__avg"),
            F.stddev_pop(c).alias(f"{col}__std"),
            F.sum(F.abs(c)).alias(f"{col}__l1"),
            F.sqrt(F.sum(c * c)).alias(f"{col}__l2"),
        ]
    stats = df.agg(*aggs).collect()[0]

    out = df
    for col, scaler in properties.items():
        c = F.col(col).cast("double")
        mn, mx = stats[f"{col}__mn"], stats[f"{col}__mx"]
        avg, std = stats[f"{col}__avg"], stats[f"{col}__std"]
        l1, l2 = stats[f"{col}__l1"], stats[f"{col}__l2"]
        if scaler == "minmax":
            span = (mx - mn) or 1.0
            e = (c - F.lit(mn)) / F.lit(span)
        elif scaler == "max":
            e = c / F.lit(mx or 1.0)
        elif scaler == "mean":
            span = (mx - mn) or 1.0
            e = (c - F.lit(avg)) / F.lit(span)
        elif scaler == "log":
            e = F.log(c)
        elif scaler == "stdscore":
            e = (c - F.lit(avg)) / F.lit(std or 1.0)
        elif scaler == "l1norm":
            e = c / F.lit(l1 or 1.0)
        elif scaler == "l2norm":
            e = c / F.lit(l2 or 1.0)
        else:  # center
            e = c - F.lit(avg)
        out = out.withColumn(f"{col}{suffix}", e)
    return out
