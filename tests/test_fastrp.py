"""FastRP tests: hash-based base-vector properties + numpy propagation
oracle (base vectors are read from the engine's generator — which is
pinned by determinism/sparsity/value-set tests — then the propagation
arithmetic is verified independently in numpy)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.fastrp import _base_vectors, fast_rp
from graph_data_science_spark.projection import project

from tests import fixtures


def _project(spark, nodes, edges, **kw):
    df = fixtures.to_df(spark, nodes, edges)
    nodes_df = spark.createDataFrame([(n,) for n in nodes], "id string")
    return project(df, nodes=nodes_df, **kw)


@pytest.fixture(scope="module")
def graph(spark):
    nodes, edges = fixtures.gnm(n=30, m=120, seed=23)
    nodes = [str(n) for n in nodes]
    dedup = sorted({(str(s), str(d)) for s, d, _ in edges})
    return _project(spark, nodes, [(s, d, 1.0) for s, d in dedup])


class TestBaseVectors:
    def test_deterministic_and_value_set(self, spark, graph):
        dim = 16
        a = {r["vid"]: r["emb"] for r in _base_vectors(graph.nodes.select("vid"), dim, 42).collect()}
        b = {r["vid"]: r["emb"] for r in _base_vectors(graph.nodes.select("vid"), dim, 42).collect()}
        assert a == b
        s = int(round(dim**0.5))
        vals = [v for emb in a.values() for v in emb]
        assert all(
            v == 0.0 or abs(abs(v) - s**0.5) < 1e-12 for v in vals
        )
        # expected nonzero fraction = 1/s = 1/4; loose bound over 480 comps
        nz = sum(1 for v in vals if v != 0.0) / len(vals)
        assert 0.1 < nz < 0.45

    def test_seed_changes_vectors(self, spark, graph):
        a = {r["vid"]: r["emb"] for r in _base_vectors(graph.nodes.select("vid"), 16, 1).collect()}
        b = {r["vid"]: r["emb"] for r in _base_vectors(graph.nodes.select("vid"), 16, 2).collect()}
        assert a != b


class TestPropagation:
    def test_matches_numpy(self, spark, graph):
        dim, weights = 16, (0.0, 1.0, 0.5)
        res = fast_rp(graph, embedding_dimension=dim, iteration_weights=weights, seed=7)
        got = {r["vid"]: np.array(r["embedding"]) for r in res.embeddings.collect()}

        base = {
            r["vid"]: np.array(r["emb"])
            for r in _base_vectors(graph.nodes.select("vid"), dim, 7).collect()
        }
        edges = [(r["src"], r["dst"]) for r in graph.edges.select("src", "dst").collect()]
        n = graph.node_count
        in_nbrs = {v: [] for v in range(n)}
        for s, d in edges:
            in_nbrs[d].append(s)
        cur = {v: base[v] for v in range(n)}
        acc = {v: np.zeros(dim) for v in range(n)}
        for w in weights:
            nxt = {}
            for v in range(n):
                if in_nbrs[v]:
                    m = np.mean([cur[u] for u in in_nbrs[v]], axis=0)
                else:
                    m = np.zeros(dim)
                norm = np.linalg.norm(m)
                nxt[v] = m / norm if norm > 0 else m
            cur = nxt
            for v in range(n):
                acc[v] = acc[v] + w * cur[v]
        for v in range(n):
            assert np.allclose(got[v], acc[v], atol=1e-9), f"vid {v}"

    def test_embedding_shape_and_determinism(self, spark, graph):
        r1 = fast_rp(graph, embedding_dimension=8)
        r2 = fast_rp(graph, embedding_dimension=8)
        a = {r["vid"]: r["embedding"] for r in r1.embeddings.collect()}
        b = {r["vid"]: r["embedding"] for r in r2.embeddings.collect()}
        assert set(a) == set(range(graph.node_count))
        assert all(len(v) == 8 for v in a.values())
        assert all(np.allclose(a[k], b[k], atol=1e-12) for k in a)

    def test_degree_scaling_changes_result(self, spark, graph):
        a = fast_rp(graph, embedding_dimension=8, normalization_strength=0.5)
        b = fast_rp(graph, embedding_dimension=8)
        ea = {r["vid"]: r["embedding"] for r in a.embeddings.collect()}
        eb = {r["vid"]: r["embedding"] for r in b.embeddings.collect()}
        assert any(not np.allclose(ea[k], eb[k]) for k in ea)
