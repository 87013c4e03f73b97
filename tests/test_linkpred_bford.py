"""Golden tests for Bellman-Ford (negative weights + cycle detection)
and topology link-prediction scores vs pure-Python oracles."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.linkpred_topology import (
    topology_link_prediction,
)
from graph_data_science_spark.algorithms.paths import bellman_ford
from graph_data_science_spark.projection import project

from tests import fixtures


def _project(spark, nodes, edges, **kw):
    df = fixtures.to_df(spark, nodes, edges)
    nodes_df = spark.createDataFrame([(n,) for n in nodes], "id string")
    return project(df, nodes=nodes_df, **kw)


def _by_orig(g, df, col):
    rows = df.join(g.nodes, "vid").select("orig_id", col).collect()
    return {r["orig_id"]: r[col] for r in rows}


def _python_bellman_ford(nodes, edges, src):
    dist = {n: math.inf for n in nodes}
    dist[src] = 0.0
    for _ in range(len(nodes)):
        for s, d, w in edges:
            if dist[s] + w < dist[d]:
                dist[d] = dist[s] + w
    return {n: v for n, v in dist.items() if v < math.inf}


class TestBellmanFord:
    def test_negative_weights_no_cycle(self, spark):
        nodes = list("abcde")
        # DAG with negatives: the cheap route a->b->c->d beats a->d direct
        edges = [
            ("a", "b", 2.0),
            ("b", "c", -3.0),
            ("c", "d", 1.0),
            ("a", "d", 5.0),
            ("d", "e", -1.0),
        ]
        g = _project(spark, nodes, edges)
        res = bellman_ford(g, ["a"])
        assert res.negative_cycle is False
        got = _by_orig(g, res.distances, "distance")
        assert got == _python_bellman_ford(nodes, edges, "a")
        assert got["d"] == 0.0 and got["e"] == -1.0

    def test_positive_weights_matches_sssp_semantics(self, spark):
        nodes, edges = fixtures.two_triangles_bridge()
        g = _project(spark, nodes, edges)
        res = bellman_ford(g, ["a"])
        assert res.negative_cycle is False
        assert _by_orig(g, res.distances, "distance") == _python_bellman_ford(
            nodes, edges, "a"
        )

    def test_negative_cycle_detected_and_poisoned(self, spark):
        nodes = list("abcdez")
        # b->c->d->b is a -1 cycle reachable from a; e hangs off the
        # cycle (poisoned downstream); z is reached only by a safe edge
        edges = [
            ("a", "b", 1.0),
            ("b", "c", 1.0),
            ("c", "d", 1.0),
            ("d", "b", -3.0),
            ("d", "e", 1.0),
            ("a", "z", 4.0),
        ]
        g = _project(spark, nodes, edges)
        res = bellman_ford(g, ["a"])
        assert res.negative_cycle is True
        got = _by_orig(g, res.distances, "distance")
        assert got["a"] == 0.0 and got["z"] == 4.0
        for n in "bcde":
            assert got[n] == -math.inf


def _python_topo_scores(nodes, edges):
    """edges: directed simple list; neighborhoods = out-neighbor sets."""
    nbrs = {n: set() for n in nodes}
    for s, d, _w in edges:
        nbrs[s].add(d)
    out = {}
    ns = sorted(nodes)
    for i, a in enumerate(ns):
        for b in ns[i + 1 :]:
            common = nbrs[a] & nbrs[b]
            if not common:
                continue
            out[(a, b)] = {
                "common_neighbors": len(common),
                "adamic_adar": sum(
                    1.0 / math.log(len(nbrs[z])) for z in common if len(nbrs[z]) > 1
                ),
                "resource_allocation": sum(1.0 / len(nbrs[z]) for z in common),
                "preferential_attachment": len(nbrs[a]) * len(nbrs[b]),
                "total_neighbors": len(nbrs[a] | nbrs[b]),
            }
    return out


class TestTopologyLinkPrediction:
    def _got(self, g, df):
        m = {r["vid"]: r["orig_id"] for r in g.nodes.collect()}
        out = {}
        for r in df.collect():
            out[(m[r["node1"]], m[r["node2"]])] = {
                k: r[k]
                for k in (
                    "common_neighbors",
                    "adamic_adar",
                    "resource_allocation",
                    "preferential_attachment",
                    "total_neighbors",
                )
            }
        return out

    def test_scores_match_python_oracle(self, spark):
        nodes, edges = fixtures.gnm(n=25, m=80, seed=11)
        nodes = [str(n) for n in nodes]
        simple = sorted({(str(s), str(d)) for s, d, _ in edges if str(s) != str(d)})
        edges = [(s, d, 1.0) for s, d in simple]
        g = _project(spark, nodes, edges, orientation="UNDIRECTED")
        und = sorted({(s, d) for a, b, _ in edges for s, d in ((a, b), (b, a))})
        want = _python_topo_scores(nodes, [(s, d, 1.0) for s, d in und])
        got = self._got(g, topology_link_prediction(g))
        # vid order preserves orig order, so pair keys line up directly
        assert set(got) == set(want)
        for k, w in want.items():
            for fld, v in w.items():
                assert abs(got[k][fld] - v) < 1e-9, (k, fld)

    def test_min_common_and_top_k(self, spark):
        nodes, edges = fixtures.two_triangles_bridge()
        g = _project(spark, nodes, edges, orientation="UNDIRECTED")
        all_pairs = topology_link_prediction(g).collect()
        filtered = topology_link_prediction(g, min_common_neighbors=2).collect()
        assert {(r["node1"], r["node2"]) for r in filtered} <= {
            (r["node1"], r["node2"]) for r in all_pairs
        }
        assert all(r["common_neighbors"] >= 2 for r in filtered)
        topped = topology_link_prediction(g, top_k=1)
        counts = topped.groupBy("node1").count().collect()
        assert all(r["count"] == 1 for r in counts)

    def test_same_community_flag(self, spark):
        nodes, edges = fixtures.two_triangles_bridge()
        g = _project(spark, nodes, edges, orientation="UNDIRECTED")
        comm = g.nodes.select(
            "vid", (F.col("vid") < 3).cast("long").alias("community")
        )
        out = topology_link_prediction(g, community=comm)
        assert "same_community" in out.columns
        for r in out.collect():
            want = 1 if (r["node1"] < 3) == (r["node2"] < 3) else 0
            assert r["same_community"] == want

    def test_degree_cutoff_max_drops_hub_witnesses(self, spark):
        nodes, edges = fixtures.star()
        g = _project(spark, nodes, edges, orientation="UNDIRECTED")
        # every spoke pair's only witness is the hub (fan-in 10)
        assert topology_link_prediction(g).count() > 0
        assert topology_link_prediction(g, degree_cutoff_max=5).count() == 0


class TestAllPairsDistances:
    def test_matches_floyd_warshall(self, spark):
        from graph_data_science_spark.algorithms.paths import all_pairs_distances

        nodes, edges = fixtures.two_triangles_bridge()
        g = _project(spark, nodes, edges)
        n = len(nodes)
        idx = {x: i for i, x in enumerate(sorted(nodes))}
        d = [[math.inf] * n for _ in range(n)]
        for i in range(n):
            d[i][i] = 0.0
        for s, t, w in edges:
            d[idx[s]][idx[t]] = min(d[idx[s]][idx[t]], w)
        for k in range(n):
            for i in range(n):
                for j in range(n):
                    if d[i][k] + d[k][j] < d[i][j]:
                        d[i][j] = d[i][k] + d[k][j]
        res = all_pairs_distances(g)
        m = {r["vid"]: r["orig_id"] for r in g.nodes.collect()}
        got = {
            (m[r["src"]], m[r["vid"]]): r["distance"] for r in res.collect()
        }
        want = {
            (a, b): d[idx[a]][idx[b]]
            for a in nodes
            for b in nodes
            if d[idx[a]][idx[b]] < math.inf
        }
        assert got == want

    def test_sampled_sources_subset(self, spark):
        from graph_data_science_spark.algorithms.paths import all_pairs_distances
        from pyspark.sql import functions as SF

        nodes, edges = fixtures.two_triangles_bridge()
        g = _project(spark, nodes, edges)
        srcs = g.nodes.orderBy("vid").limit(2).select("vid")
        sub = all_pairs_distances(g, sources=srcs)
        assert sub.select("src").distinct().count() == 2


def _python_bridges(nodes, und_pairs):
    """Brute oracle: edge is a bridge iff endpoints disconnect without it."""
    import collections

    adj = collections.defaultdict(set)
    for a, b in und_pairs:
        adj[a].add(b)
        adj[b].add(a)

    def connected(a, b, skip):
        seen, stack = {a}, [a]
        while stack:
            x = stack.pop()
            if x == b:
                return True
            for y in adj[x]:
                if {x, y} == set(skip):
                    continue
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        return False

    return {
        (a, b) for a, b in und_pairs if not connected(a, b, (a, b))
    }


class TestBridges:
    def _got(self, spark, nodes, pairs):
        from graph_data_science_spark.algorithms.bridges import bridges

        edges = [(a, b, 1.0) for a, b in pairs]
        g = _project(spark, nodes, edges, orientation="UNDIRECTED")
        m = {r["vid"]: r["orig_id"] for r in g.nodes.collect()}
        return {
            tuple(sorted((m[r["src"]], m[r["dst"]])))
            for r in bridges(g).bridges.collect()
        }

    def test_goldens(self, spark):
        cases = [
            # two triangles joined by one bridge
            ([("a", "b"), ("b", "c"), ("c", "a"), ("d", "e"), ("e", "f"),
              ("f", "d"), ("c", "d")], {("c", "d")}),
            # path: every edge a bridge
            ([("a", "b"), ("b", "c"), ("c", "d")],
             {("a", "b"), ("b", "c"), ("c", "d")}),
            # cycle: none
            ([("a", "b"), ("b", "c"), ("c", "a")], set()),
            # disconnected: bridge in one component only
            ([("a", "b"), ("p", "q"), ("q", "r"), ("r", "p")], {("a", "b")}),
        ]
        for i, (pairs, want) in enumerate(cases):
            nodes = sorted({x for p in pairs for x in p})
            assert self._got(spark, nodes, pairs) == want, i

    def test_random_graph_matches_brute_oracle(self, spark):
        nodes, edges = fixtures.gnm(n=24, m=30, seed=9)
        nodes = [str(n) for n in nodes]
        pairs = sorted({tuple(sorted((str(s), str(d)))) for s, d, _ in edges if str(s) != str(d)})
        want = _python_bridges(nodes, pairs)
        assert self._got(spark, nodes, pairs) == want


def _python_articulation(nodes, und_pairs):
    import collections

    adj = collections.defaultdict(set)
    for a, b in und_pairs:
        adj[a].add(b)
        adj[b].add(a)

    def comp_count(skip):
        seen = set()
        cnt = 0
        for start in nodes:
            if start == skip or start in seen:
                continue
            cnt += 1
            stack = [start]
            seen.add(start)
            while stack:
                x = stack.pop()
                for y in adj[x]:
                    if y != skip and y not in seen:
                        seen.add(y)
                        stack.append(y)
        return cnt

    base = comp_count(None)
    # a non-isolated v cuts iff removing it increases the component count
    return {v for v in nodes if adj[v] and comp_count(v) > base}


class TestArticulationPoints:
    def _got(self, spark, nodes, pairs):
        from graph_data_science_spark.algorithms.bridges import articulation_points

        edges = [(a, b, 1.0) for a, b in pairs]
        g = _project(spark, nodes, edges, orientation="UNDIRECTED")
        m = {r["vid"]: r["orig_id"] for r in g.nodes.collect()}
        return {m[r["vid"]] for r in articulation_points(g).points.collect()}

    def test_goldens(self, spark):
        cases = [
            # two triangles sharing vertex c: no bridges, c cuts
            ([("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e"),
              ("e", "c")], {"c"}),
            # path: interior nodes cut
            ([("a", "b"), ("b", "c"), ("c", "d")], {"b", "c"}),
            # cycle: none
            ([("a", "b"), ("b", "c"), ("c", "a")], set()),
            # star: hub cuts
            ([("h", "s1"), ("h", "s2"), ("h", "s3")], {"h"}),
        ]
        for i, (pairs, want) in enumerate(cases):
            nodes = sorted({x for p in pairs for x in p})
            assert self._got(spark, nodes, pairs) == want, i

    def test_random_graph_matches_brute_oracle(self, spark):
        nodes, edges = fixtures.gnm(n=22, m=26, seed=13)
        nodes = [str(n) for n in nodes]
        pairs = sorted({tuple(sorted((str(s), str(d)))) for s, d, _ in edges if str(s) != str(d)})
        want = _python_articulation(nodes, pairs)
        assert self._got(spark, nodes, pairs) == want


class TestKSpanningAndSplit:
    def test_k_spanning_tree_trims_expensive_leaves(self, spark):
        from graph_data_science_spark.algorithms.spanning import (
            k_spanning_tree,
            minimum_spanning_forest,
        )

        # path a-b-c-d-e with increasing weights; kmin trims the most
        # expensive leaf edge first (d-e), then c-d
        nodes = list("abcde")
        edges = [("a", "b", 1.0), ("b", "c", 2.0), ("c", "d", 3.0), ("d", "e", 4.0)]
        g = _project(spark, nodes, edges, orientation="UNDIRECTED")
        msf = minimum_spanning_forest(g)
        assert msf.edges.count() == 4
        res = k_spanning_tree(g, k=3, objective="min")
        m = {r["vid"]: r["orig_id"] for r in g.nodes.collect()}
        kept = {(m[r["src"]], m[r["dst"]]) for r in res.edges.collect()}
        assert kept == {("a", "b"), ("b", "c")}
        res_max = k_spanning_tree(g, k=3, objective="max")
        kept_max = {(m[r["src"]], m[r["dst"]]) for r in res_max.edges.collect()}
        assert kept_max == {("c", "d"), ("d", "e")}

    def test_split_partitions_and_is_deterministic(self, spark):
        from graph_data_science_spark.ml.split import split_relationships

        nodes, edges = fixtures.gnm(n=30, m=90, seed=3)
        nodes = [str(n) for n in nodes]
        edges = [(str(s), str(d), 1.0) for s, d, _ in edges if str(s) != str(d)]
        g = _project(spark, nodes, edges)
        sp = split_relationships(g, holdout_fraction=0.2)
        n_train, n_hold = sp.train.count(), sp.holdout.count()
        total = g.edges.filter("src != dst").count()
        assert n_train + n_hold == total
        assert 0 < n_hold <= total // 4
        # disjoint + deterministic re-run
        assert sp.train.join(sp.holdout, ["src", "dst"], "semi").count() == 0
        sp2 = split_relationships(g, holdout_fraction=0.2)
        assert (
            sp.holdout.exceptAll(sp2.holdout).count() == 0
            and sp2.holdout.exceptAll(sp.holdout).count() == 0
        )

    def test_split_undirected_no_direction_leak(self, spark):
        """On an UNDIRECTED projection both directions of a relationship
        must land on the SAME side of the split (ADVICE r3: ranking the
        directed rows independently leaked holdout edges into train)."""
        from graph_data_science_spark.ml.split import split_relationships

        nodes, edges = fixtures.gnm(n=20, m=40, seed=5)
        nodes = [str(n) for n in nodes]
        edges = [(str(s), str(d), 1.0) for s, d, _ in edges if str(s) != str(d)]
        g = _project(spark, nodes, edges, orientation="UNDIRECTED")
        sp = split_relationships(g, holdout_fraction=0.2)
        hold = {(r["src"], r["dst"]) for r in sp.holdout.collect()}
        train = {(r["src"], r["dst"]) for r in sp.train.collect()}
        assert hold and train
        assert all((b, a) in hold for (a, b) in hold)
        assert all((b, a) in train for (a, b) in train)
        assert hold.isdisjoint(train)
        total = g.edges.filter("src != dst").count()
        assert len(hold) + len(train) == total


class TestKgePredict:
    def test_matches_numpy(self, spark):
        import numpy as np
        from graph_data_science_spark.ml.kge import predict_kge

        rng = np.random.default_rng(7)
        nvec = {i: rng.normal(size=6) for i in range(5)}
        rvec = {r: rng.normal(size=6) for r in range(2)}
        emb = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in nvec.items()],
            "id long, embedding array<double>",
        )
        rels = spark.createDataFrame(
            [(r, [float(x) for x in v]) for r, v in rvec.items()],
            "rel long, embedding array<double>",
        )
        triples = spark.createDataFrame(
            [(0, 0, 1), (1, 1, 2), (3, 0, 4)], "head long, rel long, tail long"
        )
        te = {
            (r["head"], r["rel"], r["tail"]): r["score"]
            for r in predict_kge(triples, emb, rels, scoring="transe").collect()
        }
        dm = {
            (r["head"], r["rel"], r["tail"]): r["score"]
            for r in predict_kge(triples, emb, rels, scoring="distmult").collect()
        }
        for h, r, t in [(0, 0, 1), (1, 1, 2), (3, 0, 4)]:
            want_te = -float(np.linalg.norm(nvec[h] + rvec[r] - nvec[t]))
            want_dm = float(np.sum(nvec[h] * rvec[r] * nvec[t]))
            assert abs(te[(h, r, t)] - want_te) < 1e-9
            assert abs(dm[(h, r, t)] - want_dm) < 1e-9

    def test_rejects_unknown_scoring(self, spark):
        import pytest as _pytest
        from graph_data_science_spark.ml.kge import predict_kge

        emb = spark.createDataFrame([(0, [1.0])], "id long, embedding array<double>")
        rels = spark.createDataFrame([(0, [1.0])], "rel long, embedding array<double>")
        tr = spark.createDataFrame([(0, 0, 0)], "head long, rel long, tail long")
        # "rotate" became a real scoring in r4 — use a genuinely bogus name
        with _pytest.raises(ValueError):
            predict_kge(tr, emb, rels, scoring="bogus")


class TestFacade:
    def test_bellman_ford_proc(self, spark):
        from graph_data_science_spark import SparkGDS

        nodes = list("abcd")
        edges = [("a", "b", 2.0), ("b", "c", -3.0), ("a", "c", 1.0), ("c", "d", 2.0)]
        g = _project(spark, nodes, edges)
        gds = SparkGDS(spark)
        stats = gds.bellman_ford.stats(g, source_node="a")
        assert stats["contains_negative_cycle"] is False
        got = {r["node_id"]: r["distance"] for r in gds.bellman_ford.stream(g, source_node="a").collect()}
        assert got == {"a": 0.0, "b": 2.0, "c": -1.0, "d": 1.0}

    def test_linkprediction_proc_maps_ids(self, spark):
        from graph_data_science_spark import SparkGDS

        nodes, edges = fixtures.two_triangles_bridge()
        g = _project(spark, nodes, edges, orientation="UNDIRECTED")
        rows = SparkGDS(spark).linkprediction.stream(g).collect()
        assert rows and all(isinstance(r["node1"], str) for r in rows)
        cols = set(rows[0].asDict())
        assert {"common_neighbors", "adamic_adar", "resource_allocation",
                "preferential_attachment", "total_neighbors"} <= cols
