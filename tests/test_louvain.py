"""Louvain + modularity tests: metric vs pure-Python oracle; community
structure on golden graphs; determinism; modularity quality on random
graphs; personalized PageRank vs numpy oracle."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.louvain import louvain, modularity
from graph_data_science_spark.algorithms.pagerank import page_rank
from graph_data_science_spark.algorithms.wcc import wcc
from graph_data_science_spark.projection import project

from tests import fixtures, oracles


def _project(spark, nodes, edges, **kw):
    df = fixtures.to_df(spark, nodes, edges)
    nodes_df = spark.createDataFrame([(n,) for n in nodes], "id string")
    return project(df, nodes=nodes_df, **kw)


def _communities_by_orig(g, df):
    rows = df.join(g.nodes, "vid").select("orig_id", "community").collect()
    return {r["orig_id"]: r["community"] for r in rows}


def ring_of_cliques(k=4, size=5):
    """k cliques of `size`, joined in a ring by single bridges — the
    canonical Louvain fixture (each clique = one community)."""
    nodes, edges = [], []
    for c in range(k):
        members = [f"c{c}n{i}" for i in range(size)]
        nodes += members
        for i in range(size):
            for j in range(i + 1, size):
                edges.append((members[i], members[j], 1.0))
        edges.append((members[0], f"c{(c + 1) % k}n0", 1.0))
    return nodes, edges


class TestModularity:
    def test_matches_oracle_on_wcc_partition(self, spark):
        nodes, edges = fixtures.gnm(n=40, m=120, seed=13)
        nodes = [str(n) for n in nodes]
        edges = [(str(s), str(d), w) for s, d, w in edges]
        g = _project(spark, nodes, edges)
        comps = wcc(g).components.withColumnRenamed("component", "community")
        got = modularity(g, comps)
        vid_to_orig = {r["vid"]: r["orig_id"] for r in g.nodes.collect()}
        assignment = {
            vid_to_orig[r["vid"]]: r["community"] for r in comps.collect()
        }
        # oracle needs orig-id keyed communities and the aggregated edges
        agg = {}
        for s, d, w in edges:
            agg[(s, d)] = agg.get((s, d), 0.0) + w
        want = oracles.modularity_oracle(
            nodes, [(s, d, w) for (s, d), w in agg.items()], assignment
        )
        assert abs(got - want) < 1e-9

    def test_single_community_zero(self, spark):
        nodes, edges = fixtures.cycle()
        g = _project(spark, nodes, edges)
        one = g.nodes.select("vid", F.lit(0).alias("community"))
        assert abs(modularity(g, one)) < 1e-12


class TestLouvain:
    def test_ring_of_cliques_recovers_cliques(self, spark):
        nodes, edges = ring_of_cliques(k=4, size=5)
        g = _project(spark, nodes, edges, orientation="UNDIRECTED")
        res = louvain(g)
        com = _communities_by_orig(g, res.communities)
        for c in range(4):
            members = {com[f"c{c}n{i}"] for i in range(5)}
            assert len(members) == 1, f"clique {c} split: {members}"
        assert len({com[f"c{c}n0"] for c in range(4)}) == 4
        assert res.modularity > 0.5

    def test_two_triangles_bridge(self, spark):
        nodes, edges = fixtures.two_triangles_bridge()
        g = _project(spark, nodes, edges, orientation="UNDIRECTED")
        res = louvain(g)
        com = _communities_by_orig(g, res.communities)
        assert com["a"] == com["b"] == com["c"]
        assert com["d"] == com["e"] == com["f"]
        assert com["a"] != com["d"]

    def test_deterministic(self, spark):
        nodes, edges = ring_of_cliques(k=3, size=4)
        g = _project(spark, nodes, edges, orientation="UNDIRECTED")
        a = _communities_by_orig(g, louvain(g).communities)
        b = _communities_by_orig(g, louvain(g).communities)
        assert a == b

    def test_reported_modularity_is_exact(self, spark):
        nodes, edges = ring_of_cliques(k=3, size=4)
        g = _project(spark, nodes, edges, orientation="UNDIRECTED")
        res = louvain(g)
        recomputed = modularity(g, res.communities)
        assert abs(res.modularity - recomputed) < 1e-9

    def test_beats_trivial_partitions_on_random_graph(self, spark):
        nodes, edges = fixtures.gnm(n=40, m=100, seed=21)
        nodes = [str(n) for n in nodes]
        edges = sorted({(str(s), str(d)) for s, d, _ in edges})
        edges = [(s, d, 1.0) for s, d in edges]
        g = _project(spark, nodes, edges, orientation="UNDIRECTED")
        res = louvain(g)
        singletons = modularity(g, g.nodes.select("vid", F.col("vid").alias("community")))
        assert res.modularity >= singletons - 1e-12


class TestPersonalizedPageRank:
    def test_matches_numpy_oracle(self, spark):
        nodes, edges = fixtures.gnm(n=30, m=90, seed=17)
        nodes = [str(n) for n in nodes]
        edges = sorted({(str(s), str(d)) for s, d, _ in edges})
        edges = [(s, d, 1.0) for s, d in edges]
        g = _project(spark, nodes, edges)
        sources = sorted(nodes)[:3]
        res = page_rank(g, tolerance=0.0, max_iterations=15, source_nodes=sources)
        got = {
            r["orig_id"]: r["score"]
            for r in res.scores.join(g.nodes, "vid").select("orig_id", "score").collect()
        }
        # oracle: r ← (1−d)·e_S + d·M r, init e_S, dangling mass lost
        idx = {n: i for i, n in enumerate(sorted(nodes))}
        n = len(idx)
        out_deg = np.zeros(n)
        for s, d, _w in edges:
            out_deg[idx[s]] += 1
        e_s = np.zeros(n)
        for s in sources:
            e_s[idx[s]] = 1.0
        r = e_s.copy()
        for _ in range(15):
            contrib = np.divide(r, out_deg, out=np.zeros(n), where=out_deg > 0)
            msg = np.zeros(n)
            for s, d, _w in edges:
                msg[idx[d]] += contrib[idx[s]]
            r = 0.15 * e_s + 0.85 * msg
        inv = {i: k for k, i in idx.items()}
        assert all(abs(got[inv[i]] - r[i]) < 1e-9 for i in range(n))

    def test_non_source_teleport_zero(self, spark):
        nodes, edges = fixtures.chain()
        g = _project(spark, nodes, edges)
        res = page_rank(g, tolerance=0.0, max_iterations=10, source_nodes=["a"])
        got = {
            r["orig_id"]: r["score"]
            for r in res.scores.join(g.nodes, "vid").select("orig_id", "score").collect()
        }
        # 'a' has no in-links: its stationary score is exactly (1−d)
        assert abs(got["a"] - 0.15) < 1e-9
        # mass decays down the chain, everything reachable is positive
        assert got["a"] > got["b"] > got["c"] > got["d"] > 0


class TestLeiden:
    def _connected(self, members, edge_set):
        members = set(members)
        if len(members) <= 1:
            return True
        start = next(iter(members))
        seen, stack = {start}, [start]
        while stack:
            u = stack.pop()
            for a, b in edge_set:
                v = None
                if a == u and b in members:
                    v = b
                elif b == u and a in members:
                    v = a
                if v is not None and v not in seen:
                    seen.add(v)
                    stack.append(v)
        return seen == members

    def test_ring_of_cliques_quality_and_connectivity(self, spark):
        from graph_data_science_spark.algorithms.leiden import leiden

        nodes, edges = ring_of_cliques(k=4, size=5)
        g = _project(spark, nodes, edges, orientation="UNDIRECTED")
        res = leiden(g, max_levels=3, max_rounds_per_level=10, refine_rounds=2)
        # the known optimum on this fixture (4 cliques) has Q = 0.659 —
        # louvain reaches it too; assert leiden matches that quality
        assert res.modularity > 0.65
        com = _communities_by_orig(g, res.communities)
        edge_set = {(s, d) for s, d, _w in edges} | {(d, s) for s, d, _w in edges}
        for c in set(com.values()):
            assert self._connected([n for n, cc in com.items() if cc == c], edge_set)

    def test_two_triangles_and_determinism(self, spark):
        from graph_data_science_spark.algorithms.leiden import leiden

        nodes, edges = fixtures.two_triangles_bridge()
        g = _project(spark, nodes, edges, orientation="UNDIRECTED")
        a = _communities_by_orig(g, leiden(g, max_levels=1, max_rounds_per_level=6).communities)
        b = _communities_by_orig(g, leiden(g, max_levels=1, max_rounds_per_level=6).communities)
        assert a == b
        assert a["a"] == a["b"] == a["c"]
        assert a["d"] == a["e"] == a["f"]
        assert a["a"] != a["d"]

    def test_random_graph_quality_invariants(self, spark):
        from graph_data_science_spark.algorithms.leiden import leiden

        nodes, edges = fixtures.gnm(n=40, m=100, seed=21)
        nodes = [str(n) for n in nodes]
        edges = [(s, d, 1.0) for s, d in sorted({(str(a), str(b)) for a, b, _ in edges})]
        g = _project(spark, nodes, edges, orientation="UNDIRECTED")
        res = leiden(g, max_levels=1, max_rounds_per_level=4, refine_rounds=2)
        # beats the singleton baseline and reports the true global Q
        singletons = modularity(g, g.nodes.select("vid", F.col("vid").alias("community")))
        assert res.modularity >= singletons - 1e-12
        recomputed = modularity(g, res.communities)
        assert abs(res.modularity - recomputed) < 1e-9
