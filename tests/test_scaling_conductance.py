"""scaleProperties + conductance vs hand-computed oracles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.louvain import conductance
from graph_data_science_spark.operators.scaling import scale_properties
from graph_data_science_spark.projection import project

from tests import fixtures


def test_scalers_match_manual(spark):
    df = spark.createDataFrame([(i, float(v)) for i, v in enumerate([2, 4, 6, 8])], ["id", "x"])
    out = scale_properties(
        df, {"x": "minmax"}, suffix="_mm"
    )
    out = scale_properties(out, {"x": "stdscore"}, suffix="_z")
    out = scale_properties(out, {"x": "l2norm"}, suffix="_l2")
    r = {row["id"]: row for row in out.collect()}
    assert [r[i]["x_mm"] for i in range(4)] == [0.0, pytest.approx(1/3), pytest.approx(2/3), 1.0]
    import statistics
    mean, sd = 5.0, statistics.pstdev([2, 4, 6, 8])
    assert r[0]["x_z"] == pytest.approx((2 - mean) / sd)
    l2 = (4 + 16 + 36 + 64) ** 0.5
    assert r[3]["x_l2"] == pytest.approx(8 / l2)


def test_bad_scaler_rejected(spark):
    df = spark.createDataFrame([(1, 1.0)], ["id", "x"])
    with pytest.raises(ValueError, match="scaler"):
        scale_properties(df, {"x": "nope"})


def test_conductance_matches_hand_computation(spark):
    # two triangles + bridge, communities = the two triangles
    nodes, edges = fixtures.two_triangles_bridge()
    df = fixtures.to_df(spark, nodes, edges)
    nodes_df = spark.createDataFrame([(n,) for n in nodes], "id string")
    g = project(df, nodes=nodes_df)
    com = g.nodes.select(
        "vid",
        F.when(F.col("orig_id").isin("a", "b", "c"), 0).otherwise(1).alias("community"),
    )
    got = {r["community"]: r["conductance"] for r in conductance(g, com).collect()}
    # each triangle: internal weight 3, one bridge edge c→d external
    assert got[0] == pytest.approx(1 / 4)
    assert got[1] == pytest.approx(1 / 4)


def test_conductance_single_community_zero(spark):
    nodes, edges = fixtures.cycle()
    df = fixtures.to_df(spark, nodes, edges)
    g = project(df)
    com = g.nodes.select("vid", F.lit(0).alias("community"))
    got = conductance(g, com).collect()
    assert len(got) == 1 and got[0]["conductance"] == 0.0
