"""Golden tests for the breadth algorithms (paths, node similarity,
k-core, eigenvector family) vs independent pure-Python oracles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.centrality import article_rank, eigenvector, hits
from graph_data_science_spark.algorithms.kcore import k_core
from graph_data_science_spark.algorithms.node_similarity import node_similarity
from graph_data_science_spark.algorithms.paths import bfs, sssp
from graph_data_science_spark.algorithms import paths as paths_mod
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
def random_graph():
    # dedupe parallel edges so the raw-edge-list oracles and the
    # (parallel-edge-aggregating) projection see the same simple graph;
    # string ids to match the projected orig_id type
    nodes, edges = fixtures.gnm(n=40, m=160, seed=5)
    seen = {(str(s), str(d)): 1.0 for s, d, _w in edges}
    return [str(n) for n in nodes], [(s, d, w) for (s, d), w in sorted(seen.items())]


class TestPaths:
    def test_bfs_chain(self, spark):
        nodes, edges = fixtures.chain()
        g = _project(spark, nodes, edges)
        got = _by_orig(g, bfs(g, ["a"]).distances, "distance")
        assert got == {"a": 0.0, "b": 1.0, "c": 2.0, "d": 3.0}

    def test_bfs_unreached_omitted(self, spark):
        nodes, edges = fixtures.disconnected()
        g = _project(spark, nodes, edges)
        got = _by_orig(g, bfs(g, ["p"]).distances, "distance")
        assert got == {"p": 0.0, "q": 1.0, "r": 2.0}

    def test_bfs_random_matches_oracle(self, spark, random_graph):
        nodes, edges = random_graph
        g = _project(spark, nodes, edges)
        src = nodes[0]
        got = _by_orig(g, bfs(g, [src]).distances, "distance")
        want = {k: float(v) for k, v in oracles.bfs_oracle(nodes, edges, [src]).items()}
        assert got == want

    def test_sssp_random_matches_dijkstra(self, spark, random_graph):
        nodes, edges = random_graph
        g = _project(spark, nodes, edges)
        src = nodes[0]
        got = _by_orig(g, sssp(g, [src]).distances, "distance")
        want = oracles.sssp_oracle(nodes, edges, [src])
        assert got.keys() == want.keys()
        assert all(abs(got[k] - want[k]) < 1e-9 for k in want)

    def test_sssp_rejects_negative_weights(self, spark):
        nodes = ["a", "b"]
        g = _project(spark, nodes, [("a", "b", -1.0)])
        with pytest.raises(ValueError, match="non-negative"):
            sssp(g, ["a"])

    def test_multi_source(self, spark):
        nodes, edges = fixtures.chain()
        g = _project(spark, nodes, edges)
        got = _by_orig(g, bfs(g, ["a", "c"]).distances, "distance")
        assert got == {"a": 0.0, "b": 1.0, "c": 0.0, "d": 1.0}


class TestNodeSimilarity:
    @pytest.mark.parametrize("metric", ["jaccard", "overlap", "cosine"])
    def test_matches_oracle(self, spark, random_graph, metric):
        nodes, edges = random_graph
        g = _project(spark, nodes, edges)
        res = node_similarity(g, metric=metric, top_k=None)
        vid_to_orig = {r["vid"]: r["orig_id"] for r in g.nodes.collect()}
        got = {
            (vid_to_orig[r["node1"]], vid_to_orig[r["node2"]]): r["similarity"]
            for r in res.collect()
        }
        want = oracles.node_similarity_oracle(nodes, edges, metric)
        assert got.keys() == want.keys()
        assert all(abs(got[k] - want[k]) < 1e-9 for k in want)

    def test_top_k(self, spark, random_graph):
        nodes, edges = random_graph
        g = _project(spark, nodes, edges)
        res = node_similarity(g, top_k=2)
        per_node = res.groupBy("node1").count().agg(F.max("count")).collect()[0][0]
        assert per_node <= 2

    def test_degree_cutoff(self, spark, random_graph):
        nodes, edges = random_graph
        g = _project(spark, nodes, edges)
        full = node_similarity(g, top_k=None).count()
        cut = node_similarity(g, top_k=None, degree_cutoff=3).count()
        assert cut <= full


class TestKCore:
    def test_two_triangles_bridge(self, spark):
        nodes, edges = fixtures.two_triangles_bridge()
        g = _project(spark, nodes, edges, orientation="UNDIRECTED")
        got = _by_orig(g, k_core(g).cores, "core")
        assert got == oracles.kcore_oracle(nodes, edges)

    def test_random_matches_peeling(self, spark, random_graph):
        nodes, edges = random_graph
        g = _project(spark, nodes, edges, orientation="UNDIRECTED")
        got = _by_orig(g, k_core(g).cores, "core")
        assert got == oracles.kcore_oracle(nodes, edges)

    def test_requires_undirected(self, spark):
        nodes, edges = fixtures.chain()
        g = _project(spark, nodes, edges)
        with pytest.raises(ValueError, match="UNDIRECTED"):
            k_core(g)


class TestEigenFamily:
    def test_eigenvector_matches_power_iteration(self, spark, random_graph):
        nodes, edges = random_graph
        g = _project(spark, nodes, edges)
        got = _by_orig(g, eigenvector(g, tolerance=0.0, max_iterations=15).scores, "score")
        want = oracles.eigenvector_oracle(nodes, edges, max_iterations=15)
        assert all(abs(got[k] - want[k]) < 1e-6 for k in want)

    def test_article_rank_matches_oracle(self, spark, random_graph):
        nodes, edges = random_graph
        g = _project(spark, nodes, edges)
        got = _by_orig(g, article_rank(g, tolerance=0.0, max_iterations=12).scores, "score")
        want = oracles.article_rank_oracle(nodes, edges, max_iterations=12)
        assert all(abs(got[k] - want[k]) < 1e-6 for k in want)

    def test_hits_matches_oracle(self, spark, random_graph):
        nodes, edges = random_graph
        g = _project(spark, nodes, edges)
        res = hits(g, tolerance=0.0, max_iterations=10)
        rows = res.scores.join(g.nodes, "vid").select("orig_id", "auth", "hub").collect()
        got_a = {r["orig_id"]: r["auth"] for r in rows}
        got_h = {r["orig_id"]: r["hub"] for r in rows}
        want_a, want_h = oracles.hits_oracle(nodes, edges, max_iterations=10)
        assert all(abs(got_a[k] - want_a[k]) < 1e-6 for k in want_a)
        assert all(abs(got_h[k] - want_h[k]) < 1e-6 for k in want_h)


class TestTargetPaths:
    def test_shortest_path_chain(self, spark):
        nodes, edges = fixtures.chain()
        g = _project(spark, nodes, edges)
        row = paths_mod.shortest_path(g, "a", "d").collect()
        assert len(row) == 1
        assert list(row[0]["node_ids"]) == ["a", "b", "c", "d"]
        assert row[0]["total_cost"] == 3.0

    def test_shortest_path_unreachable_is_empty(self, spark):
        nodes, edges = fixtures.chain()
        g = _project(spark, nodes, edges)
        assert paths_mod.shortest_path(g, "d", "a").count() == 0

    def test_shortest_path_matches_oracle_random(self, spark, random_graph):
        nodes, edges = random_graph
        g = _project(spark, nodes, edges)
        src = nodes[0]
        reached = oracles.bfs_oracle(nodes, edges, [src])
        tgt = max(reached)
        row = paths_mod.shortest_path(g, src, tgt).collect()[0]
        cost, path = oracles.dijkstra_path_oracle(nodes, edges, src, tgt)
        assert row["total_cost"] == cost
        assert list(row["node_ids"]) == path

    def test_yens_unique_cost_graph_matches_enumeration(self, spark):
        nodes = list("abcde")
        edges = [
            ("a", "b", 1.0), ("b", "e", 1.0),
            ("a", "c", 2.0), ("c", "e", 1.5),
            ("a", "d", 3.0), ("d", "e", 2.0),
            ("b", "c", 0.25),
        ]
        g = _project(spark, nodes, edges)
        got = [
            (r["total_cost"], list(r["node_ids"]))
            for r in paths_mod.yens_k_shortest(g, "a", "e", k=3).orderBy("index").collect()
        ]
        want = oracles.simple_paths_oracle(nodes, edges, "a", "e", 3)
        assert got == want

    def test_yens_paths_are_valid_loopless_and_sorted(self, spark, random_graph):
        nodes, edges = random_graph
        g = _project(spark, nodes, edges)
        src = nodes[0]
        tgt = max(oracles.bfs_oracle(nodes, edges, [src]))
        rows = paths_mod.yens_k_shortest(g, src, tgt, k=3).orderBy("index").collect()
        eset = {(s, d) for s, d, _w in edges}
        seen_paths = set()
        costs = []
        for r in rows:
            p = list(r["node_ids"])
            assert p[0] == src and p[-1] == tgt
            assert len(set(p)) == len(p)  # loopless
            assert all((u, v) in eset for u, v in zip(p, p[1:]))
            assert tuple(p) not in seen_paths
            seen_paths.add(tuple(p))
            costs.append(r["total_cost"])
        assert costs == sorted(costs)
        # the first path is the true shortest
        c0, _p0 = oracles.dijkstra_path_oracle(nodes, edges, src, tgt)
        assert costs[0] == c0
        # costs are the k smallest loopless costs (enumeration pruned at
        # the max returned cost — sound, and polynomial on dense graphs)
        want = [
            c
            for c, _p in oracles.simple_paths_oracle(
                nodes, edges, src, tgt, len(costs), cost_limit=max(costs)
            )
        ]
        assert costs == want
