"""Tests for training-data pipeline operators (dedup / similarity / text /
multimodal) — planted-duplicate fixtures and brute-force baselines, never
the operator under test as its own oracle."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.operators import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "The quick brown fox jumps over the lazy dog"),
        (1, "The quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "The quick brown fox jumped over the lazy dog"),  # near dup of 0
        (3, "el perro y el gato en la casa de la abuela"),
        (4, "die katze und der hund sind mit das kind zu haus"),
        (5, "completely different words about spark partitions shuffling"),
        (6, ""),  # empty doc edge case
        (7, "the  QUICK   Brown fox Jumps over the lazy dog"),  # ws/case variant
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 16))
    # plant near-dups: vec 20 := vec 0 + tiny noise, vec 21 := vec 1 scaled
    base[20] = base[0] + 0.01 * rng.normal(size=16)
    base[21] = base[1] * 3.0
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


class TestText:
    def test_token_count(self, docs):
        got = {
            r["doc_id"]: r["n_tokens"]
            for r in text.token_count(docs).select("doc_id", "n_tokens").collect()
        }
        assert got[0] == 9
        assert got[6] == 0
        assert got[7] == 9

    def test_quality_monotonic_and_bounded(self, docs):
        out = text.quality_score(docs).select("doc_id", "quality").collect()
        q = {r["doc_id"]: r["quality"] for r in out}
        assert all(0.0 <= v <= 1.0 for v in q.values())
        # stopword-rich English sentence beats the empty doc
        assert q[0] > q[6]

    def test_language_id(self, docs):
        out = {r["doc_id"]: r["pred_lang"] for r in text.language_id(docs).collect()}
        assert out[0] == "en"
        assert out[3] == "es"
        assert out[4] == "de"
        assert out[6] == "und"

    def test_fingerprint_normalizes_whitespace_and_case(self, docs):
        fp = {r["doc_id"]: r["fingerprint"] for r in text.content_fingerprint(docs).collect()}
        assert fp[0] == fp[1] == fp[7]
        assert fp[0] != fp[2]

    def test_winnowing_sketch_deterministic_and_overlapping(self, docs):
        out = text.winnowing_fingerprint(docs)
        s = {r["doc_id"]: r["winnow_sketch"] for r in out.collect()}
        assert s[0] == s[1]
        # near-dup shares most sketch hashes, unrelated doc shares few
        near = len(set(s[0]) & set(s[2])) / max(len(set(s[0]) | set(s[2])), 1)
        far = len(set(s[0]) & set(s[5])) / max(len(set(s[0]) | set(s[5])), 1)
        assert near > 0.5 > far


class TestDedup:
    def test_exact(self, docs):
        out = {r["doc_id"]: r["canonical_id"] for r in dedup.exact_duplicates(docs).collect()}
        assert out[1] == 0 and out[7] == 0 and out[0] == 0
        assert out[2] == 2  # near-dup is NOT an exact dup

    def _exact_jaccard(self, docs, threshold):
        rows = docs.collect()
        toks = {r["doc_id"]: set(t.lower() for t in __import__("re").findall(r"[a-z0-9]+", r["text"].lower())) for r in rows}
        pairs = set()
        ids = sorted(toks)
        for i in ids:
            for j in ids:
                if i < j and toks[i] | toks[j]:
                    jac = len(toks[i] & toks[j]) / len(toks[i] | toks[j])
                    if jac >= threshold:
                        pairs.add((i, j))
        return pairs

    def test_ngram_jaccard_matches_python_oracle(self, docs):
        got = {
            (r["id_a"], r["id_b"])
            for r in dedup.ngram_jaccard_pairs(docs, 0.5).collect()
        }
        assert got == self._exact_jaccard(docs, 0.5)

    def test_minhash_lsh_finds_planted_near_dups(self, docs):
        got = {
            (r["id_a"], r["id_b"])
            for r in dedup.minhash_lsh_pairs(docs, 0.5, bands=32).collect()
        }
        want = self._exact_jaccard(docs, 0.5)
        # verify step guarantees precision; high-sim planted pairs recalled
        assert got <= want
        assert (0, 1) in got and (0, 2) in got

    def test_minhash_degenerate_identical_corpus_is_bounded(self, spark):
        # 300 identical docs + 2 distinct: the identical-set collapse must
        # reduce LSH to 3 representatives (ZERO giant-bucket self-join) and
        # still emit every within-group pair at jaccard 1.0.
        rows = [(i, "all these documents are byte for byte the same text") for i in range(300)]
        rows += [(300, "a fully unrelated document about spark shuffles"),
                 (301, "another unrelated text concerning arrow buffers")]
        corpus = spark.createDataFrame(rows, ["doc_id", "text"])
        out = dedup.minhash_lsh_pairs(corpus, 0.9).collect()
        pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out}
        assert len(pairs) == 300 * 299 // 2
        assert all(v == 1.0 for v in pairs.values())
        # candidate generation over representatives is empty (3 distinct
        # sets, no band collisions between unrelated texts)
        sigs = dedup.minhash_signatures(
            corpus.join(
                spark.createDataFrame([(0,), (300,), (301,)], ["doc_id"]), "doc_id"
            )
        )
        cands = dedup._banded_candidates(sigs, bands=16, r=4, max_bucket_size=2048)
        assert cands.count() == 0

    def test_oversize_bucket_split_keeps_identical_signatures_together(self, spark):
        # force one giant bucket: 64 ids sharing one signature A, 64 sharing
        # B (A≠B). With a cap of 8 the bucket splits, but signature-identical
        # members always land in the same sub-bucket, so all A-A and B-B
        # pairs survive as candidates.
        sig_a = [1] * 64
        sig_b = [2] * 64
        rows = [(i, sig_a) for i in range(64)] + [(100 + i, sig_b) for i in range(64)]
        sigs = spark.createDataFrame(rows, ["id", "sig"])
        got = {
            (r["id_a"], r["id_b"])
            for r in dedup._banded_candidates(sigs, bands=16, r=4, max_bucket_size=8).collect()
        }
        same_a = {(i, j) for i in range(64) for j in range(64) if i < j}
        same_b = {(100 + i, 100 + j) for i in range(64) for j in range(64) if i < j}
        assert same_a <= got and same_b <= got

    def test_max_df_guard_drops_hot_tokens(self, docs):
        full = dedup.ngram_jaccard_pairs(docs, 0.5).count()
        cut = dedup.ngram_jaccard_pairs(docs, 0.5, max_df=2).count()
        assert cut <= full

    def test_simhash(self, docs):
        sh = {r["id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
        assert sh[0] == sh[1]  # identical token sets → identical sketch
        assert sh[6] == 0
        assert all(v >= 0 for v in sh.values())
        ham = lambda a, b: bin(a ^ b).count("1")
        assert ham(sh[0], sh[2]) < ham(sh[0], sh[5])

    def test_simhash_pairs_blocking_is_exhaustive(self, docs):
        # brute-force hamming ≤ 12 must equal the chunk-blocked result ≤ 3·4
        sh = {r["id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
        for d in (1, 3):
            want = {
                (i, j)
                for i in sh
                for j in sh
                if i < j and bin(sh[i] ^ sh[j]).count("1") <= d
            }
            got = {
                (r["id_a"], r["id_b"])
                for r in dedup.simhash_pairs(docs, max_hamming=d).collect()
            }
            assert got == want


class TestSimilarity:
    def _brute(self, vectors, k):
        rows = sorted(vectors.collect(), key=lambda r: r["vec_id"])
        M = np.array([r["embedding"] for r in rows])
        M = M / np.linalg.norm(M, axis=1, keepdims=True)
        sims = M @ M.T
        out = {}
        for i in range(len(rows)):
            order = sorted(
                (j for j in range(len(rows)) if j != i),
                key=lambda j: (-round(sims[i, j], 6), j),
            )
            out[i] = order[:k]
        return out

    def test_bruteforce_topk_matches_numpy(self, vectors):
        got = {}
        res = similarity.cosine_topk_bruteforce(vectors, vectors.filter("vec_id < 5"), 3)
        for r in res.collect():
            got.setdefault(r["query_id"], []).append((r["cosine"], r["neighbor_id"]))
        want = self._brute(vectors, 3)
        for q in range(5):
            ordered = [n for _, n in sorted(got[q], key=lambda t: (-t[0], t[1]))]
            assert ordered == want[q], f"query {q}"

    def test_planted_neardups_found(self, vectors):
        pairs = {
            (r["id_a"], r["id_b"])
            for r in similarity.embedding_neardup_pairs(
                vectors, 0.99, dim=16, exact=True
            ).collect()
        }
        assert (0, 20) in pairs and (1, 21) in pairs

    def test_lsh_recall(self, vectors):
        k = 5
        want = self._brute(vectors, k)
        # random-gaussian "neighbors" only reach cosine ~0.3, so use short
        # codes + many tables here; real near-dup corpora (cosine ≥ 0.9)
        # support far longer codes (see operators/similarity.py docstring)
        res = similarity.cosine_lsh_topk(
            vectors, vectors, k, dim=16, n_bits=3, n_tables=16
        )
        got = {}
        for r in res.collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        hits = sum(len(got.get(q, set()) & set(want[q])) for q in want)
        recall = hits / (len(want) * k)
        assert recall >= 0.8, f"LSH recall {recall:.2f}"

    def test_lsh_neardup_agrees_with_exact_on_planted(self, vectors):
        approx = {
            (r["id_a"], r["id_b"])
            for r in similarity.embedding_neardup_pairs(
                vectors, 0.99, dim=16, n_bits=4, n_tables=8
            ).collect()
        }
        assert (0, 20) in approx and (1, 21) in approx


class TestMultimodal:
    def test_generate_deterministic(self, spark):
        a = multimodal.generate_media(spark, 50).orderBy("media_id").collect()
        b = multimodal.generate_media(spark, 50).orderBy("media_id").collect()
        assert [bytes(r["media"]) for r in a] == [bytes(r["media"]) for r in b]
        assert {r["modality"] for r in a} == {"image", "audio", "video"}

    def test_feature_extraction_plumbing(self, spark):
        m = multimodal.generate_media(spark, 50, partitions=4)
        f = multimodal.extract_features(m)
        rows = f.collect()
        assert len(rows) == 50
        assert all(len(r["feature"]) == multimodal.FEATURE_DIM for r in rows)
        assert all(r["n_bytes"] > 0 for r in rows)
        # deterministic across partitioning
        f2 = multimodal.extract_features(multimodal.generate_media(spark, 50, partitions=1))
        a = {r["media_id"]: r["feature"] for r in rows}
        b = {r["media_id"]: r["feature"] for r in f2.collect()}
        assert a == b

    def test_real_backend_is_stubbed(self, spark):
        m = multimodal.generate_media(spark, 2)
        with pytest.raises(Exception, match="NotImplementedError|real media decoding"):
            multimodal.extract_features(m, decode_backend="real").collect()

    def test_frame_sample_plan(self, spark):
        m = multimodal.generate_media(spark, 100)
        plan = multimodal.frame_sample_plan(m, every_ms=1000)
        per = plan.groupBy("media_id").count()
        joined = m.filter("modality = 'video'").join(per, "media_id")
        bad = joined.filter(
            F.col("count") != (F.floor((F.col("duration_ms") - 1) / 1000) + 1)
        ).count()
        assert bad == 0
