"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design (the point of every choice here):

- **Exact** is a hash group-by — one shuffle on a 16-byte key, no text
  moves after the md5 is computed at the scan.
- **n-gram Jaccard** builds an inverted index (token → doc) and
  self-joins it, so cost is Σ_token df(token)²; the ``max_df`` cut drops
  ubiquitous tokens (which contribute O(df²) pairs but ~no information) —
  at 100 TB this cut is what makes the join finite. Both the cut and the
  join are expressed relationally so Catalyst handles partial aggregation
  and AQE splits skewed token buckets.
- **MinHash+LSH** replaces the quadratic verify set with banded signature
  buckets: k=64 hashes, b bands × r rows; candidate pairs come only from
  equal (band, band-signature) buckets — the shuffle key is the band
  signature, so identical near-dups co-locate and unrelated docs never
  meet. Signatures are computed with higher-order array expressions over
  the token-hash array (no explode of k×tokens, no Python).
- **SimHash** is one 64-bit sketch per doc: per-bit majority vote of
  token hashes, banded into 4×16-bit chunks for Hamming-distance ≤ 3
  blocking (pigeonhole: any pair within distance 3 shares ≥1 chunk).
- **Embedding near-dup** canonicalizes vectors to unit norm then blocks
  by random-hyperplane sign bits (cosine LSH) — brute force within
  buckets only.

Affine MinHash permutations use p = 2^31 − 1 and a,b < 2^20 so a·h + b
stays far below 2^63 (Spark ANSI mode makes silent overflow a hard error).
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.operators.text import content_fingerprint, tokenize

MERSENNE31 = (1 << 31) - 1


def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup groups: (doc_id, canonical_id) where canonical_id is the
    min doc id sharing the same normalized-content fingerprint."""
    fp = content_fingerprint(df.select(id_col, text_col), text_col)
    canon = fp.groupBy("fingerprint").agg(F.min(id_col).alias("canonical_id"))
    return fp.join(canon, "fingerprint").select(
        F.col(id_col), F.col("canonical_id"), F.col("fingerprint")
    )


def _token_sets(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, token) exploded distinct token set per document."""
    return (
        df.select(F.col(id_col).alias("id"), F.explode(tokenize(F.col(text_col))).alias("token"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """All-pairs token-set Jaccard ≥ threshold via inverted-index self-join.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded to 6dp.
    ``max_df`` drops tokens appearing in more than that many docs before
    pairing (df² blowup guard); sizes are computed *before* the cut so the
    reported Jaccard stays the true one only when max_df is None — with a
    cut it is a lower bound, which is the standard blocking trade-off.
    """
    tok = _token_sets(df, id_col, text_col)
    sizes = tok.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    if max_df is not None:
        keep = tok.groupBy("token").agg(F.count(F.lit(1)).alias("df_")).filter(
            F.col("df_") <= max_df
        )
        tok = tok.join(keep.select("token"), "token")
    a = tok.select(F.col("id").alias("id_a"), "token")
    b = tok.select(F.col("id").alias("id_b"), "token")
    inter = (
        a.join(b, "token")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    jac = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double")
            ).alias("j"),
        )
        .filter(F.col("j") >= threshold)
    )
    return jac.select("id_a", "id_b", F.round("j", 6).alias("jaccard"))


def _minhash_params(k: int, seed: int) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [(rng.randrange(1, 1 << 20), rng.randrange(0, 1 << 20)) for _ in range(k)]


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    seed: int = 42,
) -> DataFrame:
    """(id, sig: array<long>[k]) MinHash signatures over the token set.

    Token base hash = xxhash64 folded into [0, 2^31−1); permutation i is
    (aᵢ·h + bᵢ) mod p. The signature is ONE fold over the token-hash
    array: per token, evaluate all k permutations into a k-array, then
    ``aggregate``+``zip_with(least)`` element-wise — so ``tokenize`` and
    the base hash run exactly once per row. (The naive shape — k separate
    ``array_min(transform(…))`` expressions — re-tokenizes per
    permutation: higher-order functions are interpreted, with no common
    subexpression elimination; measured 64× regexp cost.)
    Empty doc → all-sentinel signature (the fold's start value).
    """
    params = _minhash_params(num_hashes, seed)
    toks = F.array_distinct(tokenize(F.col(text_col)))
    hashes = F.transform(toks, lambda t: F.pmod(F.xxhash64(t), F.lit(MERSENNE31)))

    def _perms_of(h: Column) -> Column:
        return F.array(
            *[
                F.pmod(F.lit(a) * h + F.lit(b), F.lit(MERSENNE31))
                for a, b in params
            ]
        )

    sig = F.aggregate(
        F.transform(hashes, _perms_of),
        F.array_repeat(F.lit(MERSENNE31).cast("long"), num_hashes),
        lambda acc, x: F.zip_with(acc, x, lambda u, v: F.least(u, v)),
    )
    return df.select(F.col(id_col).alias("id"), sig.alias("sig"))


def _banded_candidates(
    sigs: DataFrame, bands: int, r: int, max_bucket_size: int | None
) -> DataFrame:
    """(id_a, id_b) candidate pairs from LSH band buckets over
    (id, sig) signatures, with the oversize-bucket split guard.

    A degenerate band bucket of m members contributes m² rows to the
    self-join; buckets larger than ``max_bucket_size`` are
    deterministically sub-split by a hash of the FULL signature, so
    signature-identical members always stay together while near-identical
    ones scatter. A true pair split apart in one band still meets in any
    of the other b−1 bands (per-band match probability j^r), so the
    recall impact at j ≥ the target threshold is negligible — this is the
    production LSH analogue of the ``max_df`` hot-token cut.
    """
    banded = sigs.select(
        "id",
        F.xxhash64(F.col("sig").cast("string")).alias("fsig"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.xxhash64(F.slice("sig", i * r + 1, r).cast("string")).alias("sig_h"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "fsig", F.col("bk.band").alias("band"), F.col("bk.sig_h").alias("sig_h"))
    # materialize once: referenced by the bucket-size count AND both sides
    # of the pair self-join — without a barrier each branch re-runs the
    # whole signature pipeline
    banded = banded.localCheckpoint(eager=True)
    if max_bucket_size is not None:
        sizes = banded.groupBy("band", "sig_h").agg(F.count(F.lit(1)).alias("bsz"))
        banded = banded.join(sizes, ["band", "sig_h"]).withColumn(
            "sub",
            F.when(F.col("bsz") <= max_bucket_size, F.lit(0)).otherwise(
                F.pmod(
                    F.col("fsig"),
                    F.ceil(F.col("bsz") / F.lit(max_bucket_size)).cast("long"),
                )
            ),
        )
    else:
        banded = banded.withColumn("sub", F.lit(0))
    left = banded.select(F.col("id").alias("id_a"), "band", "sig_h", "sub")
    right = banded.select(F.col("id").alias("id_b"), "band", "sig_h", "sub")
    return (
        left.join(right, ["band", "sig_h", "sub"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    max_bucket_size: int | None = 2048,
) -> DataFrame:
    """Near-dup pairs: LSH banding for candidates, exact Jaccard verify.

    b=16 × r=4 over k=64 → candidate threshold ≈ (1/16)^(1/4) ≈ 0.5; pairs
    sharing ≥1 band bucket are verified with the true token-set Jaccard
    and kept when ≥ threshold. Returns (id_a, id_b, jaccard) rounded 6dp.

    Two scale guards keep candidate generation bounded on degenerate
    (self-similar) corpora:

    1. **Identical-set collapse (exact).** Documents with the same
       distinct-token set have Jaccard exactly 1 and identical signatures,
       so a duplicate group of size m would put m members into EVERY band
       bucket (m² candidates × b bands). We collapse each distinct token
       set to one representative, run LSH over representatives only, and
       expand pairs back through group membership at the end (within-group
       pairs are emitted directly with jaccard 1.0). No recall loss.
    2. **Oversize-bucket split** (see ``_banded_candidates``): buckets of
       *distinct* signatures larger than ``max_bucket_size`` are sub-split
       by full-signature hash; ``None`` disables.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    # 1. collapse identical token sets (empty-set docs are excluded: their
    # Jaccard is undefined/0 and the oracle's token table omits them too)
    toks = F.sort_array(F.array_distinct(tokenize(F.col(text_col))))
    member = (
        df.select(F.col(id_col).alias("id"), toks.alias("_ts"))
        .filter(F.size("_ts") > 0)
        .select("id", F.xxhash64(F.col("_ts").cast("string")).alias("fp"))
        .localCheckpoint(eager=True)  # one tokenize pass, reused 3×
    )
    groups = member.groupBy("fp").agg(F.min("id").alias("rep")).localCheckpoint(eager=True)
    reps_df = df.join(
        groups.select(F.col("rep").alias(id_col)), id_col
    ).localCheckpoint(eager=True)  # feeds signatures AND the verify arrays
    sigs = minhash_signatures(reps_df, id_col, text_col, num_hashes, seed)
    cands = _banded_candidates(sigs, bands, r, max_bucket_size)
    # Exact verify: Jaccard over true token sets, restricted to candidates
    # (representatives only — one doc per distinct token set). The token
    # SETS travel as sorted arrays and the intersection is a per-pair
    # ``array_intersect`` in whole-stage codegen — on a near-identical
    # corpus the old explode-join emitted Σ|A∩B| ≈ candidates × doc-length
    # rows through a shuffle agg; this shape emits one row per candidate.
    # The rep table is one row per DISTINCT token set (small even when the
    # corpus is huge and duplicate-heavy), so Catalyst broadcasts it.
    rep_tok = reps_df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(tokenize(F.col(text_col))).alias("th"),
    ).select("id", "th", F.size("th").alias("sz"))
    ja = rep_tok.select(
        F.col("id").alias("id_a"), F.col("th").alias("th_a"), F.col("sz").alias("sz_a")
    )
    jb = rep_tok.select(
        F.col("id").alias("id_b"), F.col("th").alias("th_b"), F.col("sz").alias("sz_b")
    )
    rep_pairs = (
        cands.join(ja, "id_a")
        .join(jb, "id_b")
        # exact necessary condition: j ≤ min(sz)/max(sz) — prune before
        # the O(|A|+|B|) intersection
        .filter(
            F.least("sz_a", "sz_b")
            >= F.lit(threshold) * F.greatest("sz_a", "sz_b")
        )
        .withColumn("inter", F.size(F.array_intersect("th_a", "th_b")))
        .select(
            "id_a",
            "id_b",
            (
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double")
            ).alias("j"),
        )
        .filter(F.col("j") >= threshold)
    )
    # 3. expand representative pairs back through group membership
    m = member.join(groups, "fp")  # (id, fp, rep)
    ma = m.select(F.col("rep").alias("id_a"), F.col("id").alias("ga"))
    mb = m.select(F.col("rep").alias("id_b"), F.col("id").alias("gb"))
    cross = (
        rep_pairs.join(ma, "id_a")
        .join(mb, "id_b")
        .select(
            F.least("ga", "gb").alias("id_a"),
            F.greatest("ga", "gb").alias("id_b"),
            "j",
        )
    )
    x, y = m.alias("x"), m.alias("y")
    within = (
        x.join(y, (F.col("x.fp") == F.col("y.fp")) & (F.col("x.id") < F.col("y.id")))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.lit(1.0).alias("j"),
        )
    )
    out = cross.unionByName(within) if threshold <= 1.0 else cross
    return out.select("id_a", "id_b", F.round("j", 6).alias("jaccard"))


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash per document → (id, simhash: long).

    Per-bit majority vote over the distinct-token xxhash64 values:
    bit j of the sketch is 1 iff more token hashes have bit j set than
    clear. 64 aggregate expressions over one exploded token-hash column —
    partial aggregation keeps the shuffle at 64 longs per (task, doc).
    """
    toks = (
        df.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(tokenize(F.col(text_col)))).alias("t"))
        .select("id", F.xxhash64("t").alias("h"))
    )
    votes = toks.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.col("h").bitwiseAND(F.lit(1 << j)) != 0, 1).otherwise(-1)
            ).alias(f"b{j}")
            for j in range(63)  # bit 63 is the sign bit; keep sketches non-negative
        ]
    )
    sketch = None
    for j in range(63):
        bit = F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sketch = bit if sketch is None else sketch + bit
    out = votes.select("id", sketch.alias("simhash"))
    empties = df.select(F.col(id_col).alias("id")).join(out.select("id"), "id", "left_anti")
    return out.unionByName(empties.withColumn("simhash", F.lit(0).cast("long")))


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance ≤ ``max_hamming``.

    Blocking: split the 64-bit sketch into ``max_hamming + 1`` chunks —
    any pair within the distance budget agrees exactly on ≥1 chunk
    (pigeonhole), so candidates come from equality joins on (chunk_idx,
    chunk_value) and are then verified with bit_count(xor).
    """
    chunks = max_hamming + 1
    width = 64 // chunks
    sk = simhash(df, id_col, text_col)
    banded = sk.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.shiftrightunsigned("simhash", i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("cv"),
                    )
                    for i in range(chunks)
                ]
            )
        ).alias("c"),
    ).select("id", "simhash", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv"))
    lft = banded.select(F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"), "ci", "cv")
    rgt = banded.select(F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"), "ci", "cv")
    return (
        lft.join(rgt, ["ci", "cv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
