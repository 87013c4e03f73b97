"""DAG topological levels / longest path vs pure-Python DP oracle."""

from __future__ import annotations

import pytest

from graph_data_science_spark.algorithms.dag import longest_path, topological_levels
from graph_data_science_spark.projection import project

from tests import fixtures


def _project(spark, nodes, edges, **kw):
    df = fixtures.to_df(spark, nodes, edges)
    nodes_df = spark.createDataFrame([(n,) for n in nodes], "id string")
    return project(df, nodes=nodes_df, **kw)


def _dp_oracle(nodes, edges, weighted):
    # longest path into v on a DAG via DP over topological order
    from collections import defaultdict

    preds = defaultdict(list)
    for s, d, w in edges:
        preds[d].append((s, w if weighted else 1.0))
    level = {}

    def get(v):
        if v not in level:
            level[v] = max((get(u) + w for u, w in preds[v]), default=0.0)
        return level[v]

    return {v: get(v) for v in nodes}


@pytest.fixture(scope="module")
def dag(spark):
    # random DAG: edges only from smaller to larger id
    import random

    rng = random.Random(53)
    nodes = [f"{i:02d}" for i in range(30)]
    edges = sorted(
        {
            (nodes[min(a, b)], nodes[max(a, b)])
            for a, b in ((rng.randrange(30), rng.randrange(30)) for _ in range(120))
            if a != b
        }
    )
    return nodes, [(s, d, float((int(s) + int(d)) % 5 + 1)) for s, d in edges]


def test_levels_match_dp(spark, dag):
    nodes, edges = dag
    g = _project(spark, nodes, edges)
    got = {
        r["orig_id"]: r["level"]
        for r in topological_levels(g).levels.join(g.nodes, "vid").select("orig_id", "level").collect()
    }
    want = {k: int(v) for k, v in _dp_oracle(nodes, edges, weighted=False).items()}
    assert got == want


def test_longest_path_matches_dp(spark, dag):
    nodes, edges = dag
    g = _project(spark, nodes, edges)
    got = {
        r["orig_id"]: r["level"]
        for r in longest_path(g).levels.join(g.nodes, "vid").select("orig_id", "level").collect()
    }
    want = _dp_oracle(nodes, edges, weighted=True)
    assert all(abs(got[k] - want[k]) < 1e-9 for k in want)


def test_levels_give_valid_topo_order(spark, dag):
    nodes, edges = dag
    g = _project(spark, nodes, edges)
    lv = {
        r["orig_id"]: r["level"]
        for r in topological_levels(g).levels.join(g.nodes, "vid").select("orig_id", "level").collect()
    }
    assert all(lv[s] < lv[d] for s, d, _ in edges)


def test_cycle_detected(spark):
    nodes, edges = fixtures.cycle()
    g = _project(spark, nodes, edges)
    with pytest.raises(ValueError, match="cycle"):
        topological_levels(g)
