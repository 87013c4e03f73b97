"""Closeness/harmonic centrality via multi-source BFS vs per-source BFS
oracle."""

from __future__ import annotations

import pytest

from graph_data_science_spark.algorithms.paths import all_pairs_hops, closeness
from graph_data_science_spark.projection import project

from tests import fixtures, oracles


def _project(spark, nodes, edges, **kw):
    df = fixtures.to_df(spark, nodes, edges)
    nodes_df = spark.createDataFrame([(n,) for n in nodes], "id string")
    return project(df, nodes=nodes_df, **kw)


def test_all_pairs_hops_chain(spark):
    nodes, edges = fixtures.chain()
    g = _project(spark, nodes, edges)
    vid = {r["orig_id"]: r["vid"] for r in g.nodes.collect()}
    got = {(r["src"], r["vid"]): r["hops"] for r in all_pairs_hops(g).collect()}
    assert got[(vid["a"], vid["d"])] == 3
    assert got[(vid["b"], vid["c"])] == 1
    assert (vid["d"], vid["a"]) not in got  # directed


def test_closeness_matches_oracle(spark):
    nodes, edges = fixtures.gnm(n=30, m=110, seed=47)
    nodes = [str(n) for n in nodes]
    edges = [(s, d, 1.0) for s, d in sorted({(str(a), str(b)) for a, b, _ in edges})]
    g = _project(spark, nodes, edges)
    rows = closeness(g).join(g.nodes, "vid").select("orig_id", "closeness", "harmonic").collect()
    got_c = {r["orig_id"]: r["closeness"] for r in rows}
    got_h = {r["orig_id"]: r["harmonic"] for r in rows}
    want_c, want_h = oracles.closeness_oracle(nodes, edges)
    assert all(abs(got_c[k] - want_c[k]) < 1e-9 for k in want_c)
    assert all(abs(got_h[k] - want_h[k]) < 1e-9 for k in want_h)


def test_wasserman_faust_scales_by_reach(spark):
    nodes, edges = fixtures.disconnected()
    g = _project(spark, nodes, edges)
    plain = {r["vid"]: r["closeness"] for r in closeness(g).collect()}
    wf = {r["vid"]: r["closeness"] for r in closeness(g, wasserman_faust=True).collect()}
    assert all(wf[k] <= plain[k] + 1e-12 for k in plain)


def test_sampled_all_pivots_symmetric_equals_exact(spark):
    # on a symmetric graph with pivots = ALL nodes, the pivot estimate
    # c(v) = |P_v| / sum d(p, v) reduces to exact closeness (d symmetric)
    nodes, edges = fixtures.two_triangles_bridge()
    edges = fixtures.symmetrize(edges)
    g = _project(spark, nodes, edges)
    exact = {r["vid"]: (r["closeness"], r["harmonic"]) for r in closeness(g).collect()}
    # harmonic in sample mode divides by k = n, exact divides by n-1
    n = g.node_count
    sampled = {
        r["vid"]: (r["closeness"], r["harmonic"])
        for r in closeness(g, sample_sources=n).collect()
    }
    for k in exact:
        assert abs(exact[k][0] - sampled[k][0]) < 1e-9
        assert abs(exact[k][1] * (n - 1) / n - sampled[k][1]) < 1e-9


def test_sampled_all_pivots_directed_equals_exact(spark):
    # ADVICE r2: sampled mode must estimate the SAME out-closeness as
    # exact mode on DIRECTED graphs (pivot BFS over reversed edges).
    # With pivots = ALL nodes the estimate is exact — also on a directed
    # graph where in- and out-closeness differ.
    nodes, edges = fixtures.gnm(n=25, m=60, seed=13)
    nodes = [str(n) for n in nodes]
    edges = [(s, d, 1.0) for s, d in sorted({(str(a), str(b)) for a, b, _ in edges if a != b})]
    g = _project(spark, nodes, edges)
    exact = {r["vid"]: (r["closeness"], r["harmonic"]) for r in closeness(g).collect()}
    n = g.node_count
    sampled = {
        r["vid"]: (r["closeness"], r["harmonic"])
        for r in closeness(g, sample_sources=n).collect()
    }
    for k in exact:
        assert abs(exact[k][0] - sampled[k][0]) < 1e-9
        assert abs(exact[k][1] * (n - 1) / n - sampled[k][1]) < 1e-9
