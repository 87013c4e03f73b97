"""Delta-stepping (paths.py delta_stepping) — the real bucketed variant
must produce bit-identical distances to the plain BSP relax (sssp) and
the pure-Python Dijkstra oracle, for any Δ."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.paths import delta_stepping, sssp
from graph_data_science_spark.projection import project

from tests import fixtures, oracles


def _project(spark, nodes, edges, **kw):
    df = fixtures.to_df(spark, nodes, edges)
    nodes_df = spark.createDataFrame([(n,) for n in nodes], "id string")
    return project(df, nodes=nodes_df, **kw)


def _by_orig(g, df, col):
    rows = df.join(g.nodes, "vid").select("orig_id", col).collect()
    return {r["orig_id"]: r[col] for r in rows}


@pytest.fixture(scope="module")
def weighted_graph():
    # gnm with deterministic non-uniform weights so light/heavy buckets
    # both matter: w(s,d) ∈ {0.5, 1.5, 2.5, ..., 9.5}
    nodes, edges = fixtures.gnm(n=30, m=120, seed=11)
    seen = {}
    for s, d, _w in edges:
        seen[(str(s), str(d))] = ((s * 7 + d * 13) % 10) + 0.5
    return (
        [str(n) for n in nodes],
        [(s, d, w) for (s, d), w in sorted(seen.items())],
    )


@pytest.mark.parametrize("delta", [None, 2.0, 0.6, 100.0])
def test_delta_stepping_matches_dijkstra(spark, weighted_graph, delta):
    nodes, edges = weighted_graph
    g = _project(spark, nodes, edges)
    src = nodes[0]
    got = _by_orig(g, delta_stepping(g, [src], delta=delta).distances, "distance")
    want = oracles.sssp_oracle(nodes, edges, [src])
    assert got.keys() == want.keys()
    assert all(abs(got[k] - want[k]) < 1e-9 for k in want)


def test_delta_stepping_equals_sssp(spark, weighted_graph):
    nodes, edges = weighted_graph
    g = _project(spark, nodes, edges)
    src = nodes[1]
    a = _by_orig(g, delta_stepping(g, [src]).distances, "distance")
    b = _by_orig(g, sssp(g, [src]).distances, "distance")
    assert a == b


def test_delta_stepping_golden_chain(spark):
    # a -1-> b -5-> c -1-> d with a 10-weight shortcut a->c: buckets must
    # settle b (light) before the heavy 5-edge fires, and the shortcut
    # (heavy, worse) must lose.
    nodes = ["a", "b", "c", "d"]
    edges = [("a", "b", 1.0), ("b", "c", 5.0), ("c", "d", 1.0), ("a", "c", 10.0)]
    g = _project(spark, nodes, edges)
    got = _by_orig(g, delta_stepping(g, ["a"], delta=2.0).distances, "distance")
    assert got == {"a": 0.0, "b": 1.0, "c": 6.0, "d": 7.0}


def test_delta_stepping_unreached_omitted_and_multisource(spark):
    nodes, edges = fixtures.disconnected()
    g = _project(spark, nodes, edges)
    got = _by_orig(g, delta_stepping(g, ["p"]).distances, "distance")
    assert got == {"p": 0.0, "q": 1.0, "r": 2.0}


def test_delta_stepping_rejects_negative(spark):
    g = _project(spark, ["a", "b"], [("a", "b", -1.0)])
    with pytest.raises(ValueError, match="non-negative"):
        delta_stepping(g, ["a"])
