"""KGE training (ml/kge.py train_kge) — exact numpy-twin parity.

The trainer's init and negative sampling are integer hash mixes over the
dense entity/relation ranks, so this twin replays the ENTIRE full-batch
GD run in numpy and compares embeddings allclose (Spark's per-(id,dim)
gradient sums are unordered float adds, hence allclose not equality).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from graph_data_science_spark.ml.kge import (
    _INIT_A,
    _INIT_B,
    _INIT_C,
    _INIT_MOD,
    _NEG_A,
    _NEG_B,
    _NEG_C,
    _NEG_D,
    train_kge,
)

TRIPLES = [
    # (head, rel, tail) — two relation types over 8 entities, with a hub
    (0, "likes", 1), (0, "likes", 2), (1, "likes", 2), (2, "likes", 3),
    (3, "knows", 4), (4, "knows", 5), (5, "knows", 0), (6, "knows", 7),
    (7, "likes", 0), (1, "knows", 6), (2, "knows", 7), (6, "likes", 3),
]


def _np_init(n: int, d: int, seed: int) -> np.ndarray:
    out = np.zeros((n, d))
    inv = 1.0 / math.sqrt(d)
    for i in range(n):
        for dim in range(d):
            m = (i * _INIT_A + dim * _INIT_B + seed * _INIT_C) % _INIT_MOD
            out[i, dim] = (m / 1_000_000.0 - 1.0) * inv
    return out


def _np_train(triples, scoring, d, epochs, lr, q, margin, seed):
    ents = sorted({t[0] for t in triples} | {t[2] for t in triples})
    rels = sorted({t[1] for t in triples})
    emap = {e: i for i, e in enumerate(ents)}
    rmap = {r: i for i, r in enumerate(rels)}
    n_ent = len(ents)
    dense = [(emap[h], rmap[r], emap[t]) for h, r, t in triples]
    pairs = []
    for h, r, t in dense:
        for i in range(q):
            corr = (h * _NEG_A + t * _NEG_B + r * _NEG_C
                    + (i * 31 + seed) * _NEG_D) % n_ent
            nh = corr if i % 2 == 1 else h
            nt = corr if i % 2 == 0 else t
            pairs.append((h, r, t, nh, nt, i))
    E = _np_init(n_ent, d, seed)
    R = _np_init(len(rels), d, seed + 1)
    losses = []
    for _ in range(epochs):
        gE = np.zeros_like(E)
        gR = np.zeros_like(R)
        if scoring == "transe":
            L = 0.0
            for h, r, t, nh, nt, _i in pairs:
                epos = E[h] + R[r] - E[t]
                eneg = E[nh] + R[r] - E[nt]
                viol = margin + epos @ epos - eneg @ eneg
                L += max(0.0, viol)
                if viol > 0:
                    gE[h] += 2 * epos
                    gE[t] -= 2 * epos
                    gE[nh] -= 2 * eneg
                    gE[nt] += 2 * eneg
                    gR[r] += 2 * (epos - eneg)
            n = len(pairs)
            losses.append(L / n)
            E = E - (lr / n) * gE
            R = R - (lr / n) * gR
            norms = np.maximum(np.sqrt((E * E).sum(axis=1)), 1e-12)
            E = E / norms[:, None]
        else:
            rows = []
            for h, r, t, nh, nt, i in pairs:
                if i == 0:
                    rows.append((h, r, t, 1.0))
                rows.append((nh, r, nt, 0.0))
            L = 0.0
            for h, r, t, y in rows:
                s = float((E[h] * R[r] * E[t]).sum())
                c = 1.0 / (1.0 + math.exp(-s)) - y
                L += math.log1p(math.exp(-s)) if y == 1.0 else math.log1p(math.exp(s))
                gE[h] += c * R[r] * E[t]
                gE[t] += c * E[h] * R[r]
                gR[r] += c * E[h] * E[t]
            n = len(rows)
            losses.append(L / n)
            E = E - (lr / n) * gE
            R = R - (lr / n) * gR
    return ents, rels, E, R, losses


@pytest.mark.parametrize("scoring", ["transe", "distmult"])
def test_kge_train_numpy_parity(spark, scoring):
    d, epochs, lr, q, margin, seed = 4, 3, 0.2, 2, 1.0, 42
    tdf = spark.createDataFrame(TRIPLES, "head long, rel string, tail long")
    res = train_kge(
        tdf, scoring=scoring, embedding_dimension=d, epochs=epochs,
        learning_rate=lr, negative_samples=q, margin=margin, seed=seed,
    )
    ents, rels, E, R, losses = _np_train(
        TRIPLES, scoring, d, epochs, lr, q, margin, seed
    )
    got_e = {r["id"]: r["embedding"] for r in res.node_embeddings.collect()}
    got_r = {r["rel"]: r["embedding"] for r in res.relation_embeddings.collect()}
    assert set(got_e) == set(ents)
    assert set(got_r) == set(rels)
    for i, e in enumerate(ents):
        np.testing.assert_allclose(got_e[e], E[i], rtol=1e-9, atol=1e-12)
    for i, r in enumerate(rels):
        np.testing.assert_allclose(got_r[r], R[i], rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(res.losses, losses, rtol=1e-9)


def test_kge_train_loss_decreases_and_scores_rank_positives(spark):
    tdf = spark.createDataFrame(TRIPLES, "head long, rel string, tail long")
    res = train_kge(
        tdf, scoring="distmult", embedding_dimension=8, epochs=30,
        learning_rate=4.0, negative_samples=2, seed=7,
    )
    assert res.losses[-1] < res.losses[0]

    # trained embeddings should score true triples above hash corruptions
    from graph_data_science_spark.ml.kge import predict_kge
    import pyspark.sql.functions as F

    pos = tdf
    neg = tdf.select(
        F.col("head"),
        F.col("rel"),
        F.pmod(F.col("head") * 7 + F.col("tail") * 13 + 5, F.lit(8))
        .cast("long").alias("tail"),
    )
    ne = res.node_embeddings
    re_ = res.relation_embeddings
    sp = [r["score"] for r in predict_kge(pos, ne, re_, scoring="distmult").collect()]
    sn = [r["score"] for r in predict_kge(neg, ne, re_, scoring="distmult").collect()]
    assert sum(sp) / len(sp) > sum(sn) / len(sn)


def test_kge_train_deterministic(spark):
    tdf = spark.createDataFrame(TRIPLES, "head long, rel string, tail long")
    kw = dict(scoring="transe", embedding_dimension=4, epochs=2,
              learning_rate=0.1, negative_samples=1, seed=3)
    a = {r["id"]: r["embedding"] for r in train_kge(tdf, **kw).node_embeddings.collect()}
    b = {r["id"]: r["embedding"] for r in train_kge(tdf, **kw).node_embeddings.collect()}
    assert a == b


def test_rotate_scoring_numpy_parity(spark):
    """RotatE predict: −‖h ∘ e^{iθ} − t‖ vs a numpy complex twin."""
    from graph_data_science_spark.ml.kge import predict_kge

    rng = np.random.RandomState(3)
    d = 8
    ents = {i: rng.uniform(-1, 1, d) for i in range(5)}
    phases = {"r0": rng.uniform(-np.pi, np.pi, d // 2)}
    ne = spark.createDataFrame(
        [(i, v.tolist()) for i, v in ents.items()], "id long, embedding array<double>"
    )
    re_ = spark.createDataFrame(
        [(r, v.tolist()) for r, v in phases.items()], "rel string, embedding array<double>"
    )
    triples = spark.createDataFrame(
        [(a, "r0", b) for a in range(5) for b in range(5) if a != b],
        "head long, rel string, tail long",
    )
    got = {
        (r["head"], r["tail"]): r["score"]
        for r in predict_kge(triples, ne, re_, scoring="rotate").collect()
    }
    for (a, b), s in got.items():
        h = ents[a][0::2] + 1j * ents[a][1::2]
        t = ents[b][0::2] + 1j * ents[b][1::2]
        rot = np.exp(1j * phases["r0"])
        want = -np.linalg.norm(h * rot - t)
        assert abs(s - want) < 1e-9


def test_kge_train_rejects_rotate(spark):
    tdf = spark.createDataFrame(TRIPLES, "head long, rel string, tail long")
    with pytest.raises(ValueError, match="predict-only"):
        train_kge(tdf, scoring="rotate")
