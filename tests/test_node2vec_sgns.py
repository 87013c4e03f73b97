"""True-SGNS Node2Vec training (node2vec.py sgns_train) — exact numpy
twin over a fixed (u, c, n) pair table, plus an end-to-end homophily
check through node2vec(training="sgd")."""

from __future__ import annotations

import math

import numpy as np
import pytest

from graph_data_science_spark.algorithms.node2vec import (
    _SG_INIT_A,
    _SG_INIT_B,
    _SG_INIT_C,
    _SG_INIT_MOD,
    _SG_NEG_A,
    _SG_NEG_B,
    _SG_NEG_D,
    node2vec,
    sgns_train,
)

# (u, c, n) — a small asymmetric co-occurrence multiset over 6 nodes
PAIRS = [
    (0, 1, 4), (1, 0, 4), (0, 2, 2), (2, 0, 2), (1, 2, 3), (2, 1, 3),
    (3, 4, 5), (4, 3, 5), (4, 5, 2), (5, 4, 2), (2, 3, 1), (3, 2, 1),
]
N = 6


def _np_init(n, d, seed):
    out = np.zeros((n, d))
    inv = 1.0 / math.sqrt(d)
    for i in range(n):
        for j in range(d):
            m = (i * _SG_INIT_A + j * _SG_INIT_B + seed * _SG_INIT_C) % _SG_INIT_MOD
            out[i, j] = (m / 1_000_000.0 - 1.0) * inv
    return out


def _np_sgns(pairs, n, d, epochs, lr, q, seed):
    W = _np_init(n, d, seed)
    C = _np_init(n, d, seed + 1)
    total = sum(p[2] for p in pairs)
    rows = []
    for u, c, cnt in pairs:
        for i in range(q):
            neg = (u * _SG_NEG_A + c * _SG_NEG_B + (i * 31 + seed) * _SG_NEG_D) % n
            rows.append((u, c, cnt, i, neg))
    step = lr / total
    for _ in range(epochs):
        gW = np.zeros_like(W)
        gC = np.zeros_like(C)
        for u, c, cnt, i, neg in rows:
            sn = float(W[u] @ C[neg])
            cgn = cnt * (1.0 / (1.0 + math.exp(-sn)))
            if i == 0:
                sp = float(W[u] @ C[c])
                cp = cnt * (1.0 / (1.0 + math.exp(-sp)) - 1.0)
                gW[u] += cp * C[c]
                gC[c] += cp * W[u]
            gW[u] += cgn * C[neg]
            gC[neg] += cgn * W[u]
        W = W - step * gW
        C = C - step * gC
    norms = np.sqrt((W * W).sum(axis=1))
    out = W.copy()
    nz = norms > 0
    out[nz] = W[nz] / norms[nz, None]
    return out


def test_sgns_numpy_parity(spark):
    d, epochs, lr, q, seed = 4, 3, 0.5, 2, 42
    pdf = spark.createDataFrame(PAIRS, "u long, c long, n long")
    got = {
        r["vid"]: r["embedding"]
        for r in sgns_train(
            pdf, N, embedding_dimension=d, epochs=epochs,
            learning_rate=lr, negative_samples=q, seed=seed,
        ).collect()
    }
    want = _np_sgns(PAIRS, N, d, epochs, lr, q, seed)
    assert set(got) == set(range(N))
    for v in range(N):
        np.testing.assert_allclose(got[v], want[v], rtol=1e-9, atol=1e-12)


def test_node2vec_sgd_homophily(spark):
    # two 4-cliques joined by one edge: SGD-trained vectors must place
    # same-clique nodes closer than cross-clique ones on average
    from graph_data_science_spark.projection import project
    from tests import fixtures

    edges = []
    for block, off in ((0, 0), (1, 4)):
        for a in range(4):
            for b in range(4):
                if a != b:
                    edges.append((str(off + a), str(off + b), 1.0))
    edges += [("0", "4", 1.0), ("4", "0", 1.0)]
    nodes = [str(i) for i in range(8)]
    g = project(
        fixtures.to_df(spark, nodes, edges),
        nodes=spark.createDataFrame([(n,) for n in nodes], "id string"),
    )
    res = node2vec(
        g, embedding_dimension=8, walks_per_node=8, walk_length=10,
        window_size=3, training="sgd", epochs=15, learning_rate=3.0,
        negative_sampling_rate=2, seed=1,
    )
    emb = {
        r["orig_id"]: np.array(r["embedding"])
        for r in res.embeddings.join(g.nodes, "vid")
        .select("orig_id", "embedding").collect()
    }
    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return float(a @ b / (na * nb)) if na and nb else 0.0
    same, cross = [], []
    for i in range(8):
        for j in range(i + 1, 8):
            c = cos(emb[str(i)], emb[str(j)])
            (same if (i < 4) == (j < 4) else cross).append(c)
    assert np.mean(same) > np.mean(cross)


def test_node2vec_rejects_unknown_training(spark):
    from graph_data_science_spark.projection import project
    from tests import fixtures

    nodes, edges = fixtures.chain()
    g = project(
        fixtures.to_df(spark, nodes, edges),
        nodes=spark.createDataFrame([(n,) for n in nodes], "id string"),
    )
    with pytest.raises(ValueError, match="sppmi"):
        node2vec(g, training="bogus")
