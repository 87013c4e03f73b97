"""Reusable Column-expression helpers (the reference exposes per-node /
per-relationship functions; here they are composable JVM-side expressions
— SURVEY.md §2.E). Everything in this module is a pure expression
builder: no jobs, no Python rows, safe inside whole-stage codegen (the
higher-order array functions are interpreted but still JVM-side and
Arrow-free).

Vector helpers operate on ``array<numeric>`` columns and are the shared
kernels of operators/similarity.py, operators/kmeans.py and
algorithms/fastrp.py-style code: precompute ``unit_vector`` once, then
every cosine is a plain ``dot``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "as_double_array",
    "dot",
    "l2_norm",
    "unit_vector",
    "cosine_similarity",
    "euclidean_sq",
    "hamming64",
    "log_normalize",
]


def as_double_array(col: Column) -> Column:
    """array<any numeric> → array<double> (Spark 4 ANSI mode makes silent
    numeric widening a hard error; cast explicitly once at the edge)."""
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate — no explode, no Python."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def unit_vector(a: Column) -> Column:
    """L2-normalized copy; the zero vector stays zero (not NaN)."""
    v = as_double_array(a)
    n = l2_norm(v)
    return F.when(n > 0, F.transform(v, lambda x: x / n)).otherwise(v)


def cosine_similarity(a: Column, b: Column) -> Column:
    """cos(a, b) with zero-norm guard (0.0 when either side is zero)."""
    va, vb = as_double_array(a), as_double_array(b)
    na, nb = l2_norm(va), l2_norm(vb)
    return F.when((na > 0) & (nb > 0), dot(va, vb) / (na * nb)).otherwise(F.lit(0.0))


def euclidean_sq(a: Column, b: Column) -> Column:
    """Squared L2 distance (the k-means assignment kernel)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance of two 64-bit sketches (SimHash verify kernel)."""
    return F.bit_count(a.bitwiseXOR(b))


def log_normalize(col: Column) -> Column:
    """log(1+x) — the scaler GDS calls ``log`` (guarding x = 0)."""
    return F.log1p(col)
