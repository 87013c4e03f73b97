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
    "jaccard",
    "overlap",
    "pearson",
    "euclidean_distance",
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


def jaccard(a: Column, b: Column) -> Column:
    """Set Jaccard of two array columns (reference function
    ``gds.similarity.jaccard``): |a∩b| / |a∪b|, 0 when both empty.
    Duplicates are collapsed (set semantics, matching the reference)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def overlap(a: Column, b: Column) -> Column:
    """Overlap coefficient (``gds.similarity.overlap``):
    |a∩b| / min(|a|, |b|), 0 when either side is empty."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    denom = F.least(
        F.size(F.array_distinct(a)), F.size(F.array_distinct(b))
    ).cast("double")
    return F.when(denom > 0, inter / denom).otherwise(F.lit(0.0))


def pearson(a: Column, b: Column) -> Column:
    """Pearson correlation of two equal-length vectors
    (``gds.similarity.pearson``), 0 when either side is constant.
    Single-pass expression form: r = (n·Σxy − Σx·Σy) /
    (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²))."""
    va, vb = as_double_array(a), as_double_array(b)
    n = F.size(va).cast("double")
    sx = F.aggregate(va, F.lit(0.0), lambda acc, x: acc + x)
    sy = F.aggregate(vb, F.lit(0.0), lambda acc, x: acc + x)
    sxx = F.aggregate(va, F.lit(0.0), lambda acc, x: acc + x * x)
    syy = F.aggregate(vb, F.lit(0.0), lambda acc, x: acc + x * x)
    sxy = dot(va, vb)
    den = F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    return F.when(den > 0, (n * sxy - sx * sy) / den).otherwise(F.lit(0.0))


def euclidean_distance(a: Column, b: Column) -> Column:
    """L2 distance (``gds.similarity.euclideanDistance``)."""
    return F.sqrt(euclidean_sq(as_double_array(a), as_double_array(b)))
