import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.projection import assign_dense_ids, project

from tests import fixtures


def test_dense_ids_are_global_rank(spark):
    df = spark.createDataFrame([(x,) for x in "fdbace"], "orig_id string")
    out = {r["orig_id"]: r["vid"] for r in assign_dense_ids(df).collect()}
    assert out == {"a": 0, "b": 1, "c": 2, "d": 3, "e": 4, "f": 5}


def test_dense_ids_deterministic_across_partitionings(spark):
    vals = [(f"k{i:04d}",) for i in range(500)]
    a = spark.createDataFrame(vals, "orig_id string").repartition(7)
    b = spark.createDataFrame(list(reversed(vals)), "orig_id string").repartition(2)
    ra = {r["orig_id"]: r["vid"] for r in assign_dense_ids(a).collect()}
    rb = {r["orig_id"]: r["vid"] for r in assign_dense_ids(b).collect()}
    assert ra == rb
    assert sorted(ra.values()) == list(range(500))


def test_parallel_edge_aggregation(spark):
    nodes, edges = fixtures.parallel_and_self()
    df = fixtures.to_df(spark, nodes, edges)
    g = project(df, aggregation="sum")
    rels = {(r["src"], r["dst"]): r["weight"] for r in g.stream_relationships().collect()}
    assert rels[("a", "b")] == 3.0  # three parallel edges summed
    assert rels[("c", "c")] == 1.0  # self-loop kept by projection
    g_cnt = project(df.select("src", "dst"), weight_col=None, aggregation="count")
    rels2 = {(r["src"], r["dst"]): r["weight"] for r in g_cnt.stream_relationships().collect()}
    assert rels2[("a", "b")] == 3.0


def test_orientations(spark):
    df = fixtures.to_df(spark, *fixtures.chain())
    nat = project(df, orientation="NATURAL")
    rev = project(df, orientation="REVERSE")
    und = project(df, orientation="UNDIRECTED")
    nat_edges = {(r["src"], r["dst"]) for r in nat.stream_relationships().collect()}
    rev_edges = {(r["src"], r["dst"]) for r in rev.stream_relationships().collect()}
    und_edges = {(r["src"], r["dst"]) for r in und.stream_relationships().collect()}
    assert rev_edges == {(b, a) for a, b in nat_edges}
    assert und_edges == nat_edges | rev_edges
    assert und.edge_count == 2 * nat.edge_count


def test_explicit_node_set_keeps_isolated(spark):
    df = fixtures.to_df(spark, *fixtures.chain())
    nodes_df = spark.createDataFrame([("a",), ("z",)], "id string")
    g = project(df, nodes=nodes_df)
    assert g.node_count == 5
    ids = {r["orig_id"] for r in g.nodes.collect()}
    assert "z" in ids


def test_degrees(spark):
    df = fixtures.to_df(spark, *fixtures.star())
    g = project(df)
    out_deg = {r["vid"]: r["degree"] for r in g.degrees("out").collect()}
    in_deg = {r["vid"]: r["degree"] for r in g.degrees("in").collect()}
    hub_vid = {r["orig_id"]: r["vid"] for r in g.nodes.collect()}["h"]
    assert out_deg[hub_vid] == 0.0  # dangling hub
    assert in_deg[hub_vid] == 10.0
    assert sum(out_deg.values()) == 10.0


def test_invalid_args(spark):
    df = fixtures.to_df(spark, *fixtures.chain())
    with pytest.raises(ValueError):
        project(df, orientation="SIDEWAYS")
    with pytest.raises(ValueError):
        project(df, aggregation="median")
