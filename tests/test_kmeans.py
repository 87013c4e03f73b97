"""K-Means vs a numpy Lloyd's oracle replicating the deterministic init
and tie-break exactly."""

from __future__ import annotations

import numpy as np
import pytest

from graph_data_science_spark.operators.kmeans import k_means


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(3)
    centers = rng.normal(size=(3, 8)) * 5
    rows = []
    for i in range(60):
        c = i % 3
        rows.append((i, [float(x) for x in centers[c] + rng.normal(size=8) * 0.3]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"]), rows


def _oracle(rows, k, iters, tol=1e-6):
    ids = sorted(r[0] for r in rows)
    V = {r[0]: np.array(r[1]) for r in rows}
    centroids = [V[i].copy() for i in ids[:k]]
    assign = {}
    for _ in range(iters):
        for i in ids:
            d = [float(((V[i] - c) ** 2).sum()) for c in centroids]
            best = min(range(k), key=lambda j: (d[j], j))
            assign[i] = (best, d[best])
        new = []
        for j in range(k):
            members = [V[i] for i in ids if assign[i][0] == j]
            new.append(np.mean(members, axis=0) if members else centroids[j])
        shift = max(np.linalg.norm(a - b) for a, b in zip(centroids, new))
        centroids = new
        if shift < tol:
            break
    return assign, centroids


def test_matches_numpy_oracle(spark, vectors):
    df, rows = vectors
    res = k_means(df, k=3, max_iterations=8)
    got = {r["id"]: (r["cluster"], r["distance"]) for r in res.assignments.collect()}
    want, want_cent = _oracle(rows, 3, 8)
    assert all(got[i][0] == want[i][0] for i in want)
    assert all(abs(got[i][1] - want[i][1] ** 0.5) < 1e-9 for i in want)
    for a, b in zip(res.centroids, want_cent):
        assert np.allclose(a, b, atol=1e-9)


def test_separated_clusters_recovered(spark, vectors):
    df, rows = vectors
    res = k_means(df, k=3, max_iterations=10)
    got = {r["id"]: r["cluster"] for r in res.assignments.collect()}
    # all points generated from center c land in one cluster
    for c in range(3):
        labels = {got[i] for i in range(60) if i % 3 == c}
        assert len(labels) == 1
    assert len({got[i] for i in range(3)}) == 3


def test_deterministic(spark, vectors):
    df, _ = vectors
    a = {r["id"]: r["cluster"] for r in k_means(df, k=3).assignments.collect()}
    b = {r["id"]: r["cluster"] for r in k_means(df, k=3).assignments.collect()}
    assert a == b


def test_zero_iterations_assigns_to_seed_centroids(spark, vectors):
    df, rows = vectors
    res = k_means(df, k=3, max_iterations=0)
    assert res.iterations == 0
    got = {r["id"]: r["cluster"] for r in res.assignments.collect()}
    assert len(got) == len(rows)
    # seed centroids are the k smallest ids; each seeds its own cluster
    for i in range(3):
        assert got[i] == i


def test_empty_input(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    res = k_means(df, k=3, max_iterations=5)
    assert res.assignments.count() == 0
    assert res.centroids == []
    assert res.iterations == 0


def test_large_k_join_path_matches_literal(spark, vectors):
    """k > 128 switches to the broadcast-join assignment plan (O(1) plan
    size in k); it must produce the same assignments/centroids as the
    literal plan and the numpy oracle."""
    rng = np.random.default_rng(11)
    rows = [
        (i, [float(x) for x in rng.normal(size=16)]) for i in range(300)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    res = k_means(df, k=150, max_iterations=2)
    want, want_cent = _oracle(rows, 150, 2)
    got = {r["id"]: (r["cluster"], r["distance"]) for r in res.assignments.collect()}
    assert all(got[i][0] == want[i][0] for i in want)
    for a, b in zip(res.centroids, want_cent):
        assert np.allclose(a, b, atol=1e-9)
