"""Random-walk tests: structural validity (every hop is an edge),
determinism, retirement at dangling nodes, and choice reproducibility."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.randomwalk import random_walk
from graph_data_science_spark.projection import project

from tests import fixtures


def _project(spark, nodes, edges, **kw):
    df = fixtures.to_df(spark, nodes, edges)
    nodes_df = spark.createDataFrame([(n,) for n in nodes], "id string")
    return project(df, nodes=nodes_df, **kw)


@pytest.fixture(scope="module")
def graph(spark):
    nodes, edges = fixtures.gnm(n=25, m=100, seed=31)
    nodes = [str(n) for n in nodes]
    dedup = sorted({(str(s), str(d)) for s, d, _ in edges})
    return _project(spark, nodes, [(s, d, 1.0) for s, d in dedup])


def test_every_hop_is_an_edge(spark, graph):
    res = random_walk(graph, walks_per_node=2, walk_length=6)
    w = Window = None  # noqa: F841
    from pyspark.sql import Window as W

    nxt = res.walks.withColumn(
        "nvid", F.lead("vid").over(W.partitionBy("walk_id").orderBy("step"))
    ).filter(F.col("nvid").isNotNull())
    bad = nxt.join(
        graph.edges.select(F.col("src").alias("vid"), F.col("dst").alias("nvid")).distinct(),
        ["vid", "nvid"],
        "left_anti",
    ).count()
    assert bad == 0


def test_deterministic(spark, graph):
    a = sorted(map(tuple, random_walk(graph, 1, 5).walks.collect()))
    b = sorted(map(tuple, random_walk(graph, 1, 5).walks.collect()))
    assert a == b
    c = sorted(map(tuple, random_walk(graph, 1, 5, seed=7).walks.collect()))
    assert a != c


def test_walks_start_everywhere_and_stop_at_dangling(spark):
    nodes, edges = fixtures.chain()  # a→b→c→d, d dangling
    g = _project(spark, nodes, edges)
    res = random_walk(g, walks_per_node=1, walk_length=10)
    rows = res.walks.collect()
    starts = {r["walk_id"] for r in rows if r["step"] == 0}
    assert len(starts) == 4
    # the walk starting at 'a' is forced down the chain and stops at d
    vid_of = {r["orig_id"]: r["vid"] for r in g.nodes.collect()}
    a_walk = sorted(
        [(r["step"], r["vid"]) for r in rows if r["walk_id"] == vid_of["a"]]
    )
    assert [v for _, v in a_walk] == [vid_of["a"], vid_of["b"], vid_of["c"], vid_of["d"]]


def test_walk_counts(spark, graph):
    res = random_walk(graph, walks_per_node=3, walk_length=4)
    assert res.walk_count == graph.node_count * 3
    per_step0 = res.walks.filter("step = 0").count()
    assert per_step0 == res.walk_count
