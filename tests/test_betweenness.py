"""Betweenness centrality vs the pure-Python Brandes oracle (exact and
sampled)."""

from __future__ import annotations

import pytest

from graph_data_science_spark.algorithms.betweenness import betweenness
from graph_data_science_spark.projection import project

from tests import fixtures, oracles


def _project(spark, nodes, edges, **kw):
    df = fixtures.to_df(spark, nodes, edges)
    nodes_df = spark.createDataFrame([(n,) for n in nodes], "id string")
    return project(df, nodes=nodes_df, **kw)


def _by_orig(g, df, col):
    rows = df.join(g.nodes, "vid").select("orig_id", col).collect()
    return {r["orig_id"]: r[col] for r in rows}


def test_chain_exact(spark):
    nodes, edges = fixtures.chain()  # a→b→c→d
    g = _project(spark, nodes, edges)
    got = _by_orig(g, betweenness(g).scores, "score")
    # b on a→c, a→d; c on a→d, b→d  → b: 2, c: 2, ends: 0
    assert got == {"a": 0.0, "b": 2.0, "c": 2.0, "d": 0.0}


def test_random_exact_matches_brandes(spark):
    nodes, edges = fixtures.gnm(n=25, m=80, seed=41)
    nodes = [str(n) for n in nodes]
    edges = [(s, d, 1.0) for s, d in sorted({(str(a), str(b)) for a, b, _ in edges})]
    g = _project(spark, nodes, edges)
    got = _by_orig(g, betweenness(g).scores, "score")
    want = oracles.betweenness_oracle(nodes, edges)
    assert all(abs(got[k] - want[k]) < 1e-9 for k in want), {
        k: (got[k], want[k]) for k in want if abs(got[k] - want[k]) > 1e-9
    }


def test_sampled_matches_restricted_oracle(spark):
    nodes, edges = fixtures.gnm(n=25, m=80, seed=43)
    nodes = [str(n) for n in nodes]
    edges = [(s, d, 1.0) for s, d in sorted({(str(a), str(b)) for a, b, _ in edges})]
    g = _project(spark, nodes, edges)
    k = 5
    got = _by_orig(g, betweenness(g, sampling_size=k).scores, "score")
    # engine sources = k smallest vids = k smallest orig ids (dense rank)
    sources = sorted(nodes)[:k]
    want = oracles.betweenness_oracle(nodes, edges, sources)
    assert all(abs(got[kk] - want[kk]) < 1e-9 for kk in want)
