"""Expression-helper tests (graph_data_science_spark.functions): numpy
cross-checks for the vector kernels shared by similarity / kmeans."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from graph_data_science_spark import functions as X


def test_vector_kernels_match_numpy(spark):
    rng = np.random.default_rng(3)
    a = rng.normal(size=8)
    b = rng.normal(size=8)
    df = spark.createDataFrame(
        [([float(x) for x in a], [float(x) for x in b])], ["a", "b"]
    )
    row = df.select(
        X.dot(X.as_double_array(F.col("a")), X.as_double_array(F.col("b"))).alias("dot"),
        X.l2_norm(X.as_double_array(F.col("a"))).alias("norm"),
        X.cosine_similarity(F.col("a"), F.col("b")).alias("cos"),
        X.euclidean_sq(X.as_double_array(F.col("a")), X.as_double_array(F.col("b"))).alias("d2"),
        X.unit_vector(F.col("a")).alias("unit"),
    ).collect()[0]
    assert abs(row["dot"] - float(a @ b)) < 1e-9
    assert abs(row["norm"] - float(np.linalg.norm(a))) < 1e-9
    want_cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert abs(row["cos"] - want_cos) < 1e-9
    assert abs(row["d2"] - float(((a - b) ** 2).sum())) < 1e-9
    assert np.allclose(row["unit"], a / np.linalg.norm(a), atol=1e-9)


def test_zero_vector_guards(spark):
    df = spark.createDataFrame([([0.0, 0.0], [1.0, 2.0])], ["z", "v"])
    row = df.select(
        X.cosine_similarity(F.col("z"), F.col("v")).alias("cos"),
        X.unit_vector(F.col("z")).alias("unit"),
    ).collect()[0]
    assert row["cos"] == 0.0
    assert list(row["unit"]) == [0.0, 0.0]


def test_hamming64(spark):
    df = spark.createDataFrame([(0b1011, 0b0001)], "x long, y long")
    assert df.select(X.hamming64(F.col("x"), F.col("y")).alias("h")).collect()[0]["h"] == 2
