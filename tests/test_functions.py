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


def test_similarity_function_tier(spark):
    # gds.similarity.jaccard / overlap / pearson / euclideanDistance
    import numpy as np

    a, b = [1.0, 2.0, 3.0, 4.0], [2.0, 2.0, 5.0, 1.0]
    df = spark.createDataFrame([(a, b)], ["a", "b"])
    row = df.select(
        X.jaccard(F.col("a"), F.col("b")).alias("j"),
        X.overlap(F.col("a"), F.col("b")).alias("o"),
        X.pearson(F.col("a"), F.col("b")).alias("p"),
        X.euclidean_distance(F.col("a"), F.col("b")).alias("e"),
    ).collect()[0]
    # sets: a={1,2,3,4}, b={1,2,5}: inter={1,2}, union={1,2,3,4,5}
    assert abs(row["j"] - 2 / 5) < 1e-12
    assert abs(row["o"] - 2 / 3) < 1e-12
    assert abs(row["p"] - float(np.corrcoef(a, b)[0, 1])) < 1e-9
    assert abs(row["e"] - float(np.linalg.norm(np.array(a) - np.array(b)))) < 1e-9


def test_similarity_function_guards(spark):
    df = spark.createDataFrame(
        [([], [1.0], [3.0, 3.0], [1.0, 2.0])],
        "empty array<double>, one array<double>, const array<double>, var array<double>",
    )
    row = df.select(
        X.jaccard(F.col("empty"), F.col("empty")).alias("j0"),
        X.overlap(F.col("empty"), F.col("one")).alias("o0"),
        X.pearson(F.col("const"), F.col("var")).alias("p0"),
    ).collect()[0]
    assert row["j0"] == 0.0 and row["o0"] == 0.0 and row["p0"] == 0.0
