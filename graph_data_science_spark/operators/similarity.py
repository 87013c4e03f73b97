"""Similarity search over embedding columns (array<float>).

- ``cosine_topk_bruteforce`` — exact top-k: broadcast the (small) query
  set against the full corpus; dot products are JVM higher-order
  expressions (``zip_with`` + ``aggregate``) over double-cast arrays, so
  the scan stays in whole-stage codegen and the only shuffle is the
  per-query top-k window.
- ``cosine_lsh_topk`` — the scale path: random-hyperplane (sign) LSH
  buckets; each corpus vector lands in one bucket per table, queries
  probe their buckets only. Recall is tunable by (n_bits, n_tables);
  verified against brute force in tests.
- ``embedding_neardup_pairs`` — all corpus pairs with cosine ≥ τ,
  LSH-blocked the same way.

100 TB framing: brute force is O(Q·N·d) — fine when Q is a broadcastable
probe set, impossible for all-pairs. The LSH variant shuffles each vector
``n_tables`` times on a 32-bit bucket key and compares only within
buckets, i.e. cost follows bucket occupancy (expected N²/2^bits per
table), not N².
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


from graph_data_science_spark.functions import dot as _dot  # shared kernels
from graph_data_science_spark.functions import unit_vector


def with_unit_vectors(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "unit_vec"
) -> DataFrame:
    """Normalize to unit L2 norm (zero vectors stay zero). Precomputing
    units turns every cosine into a plain dot product downstream."""
    return df.withColumn(out_col, unit_vector(F.col(vec_col)))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k → (query_id, neighbor_id, cosine), ties broken
    by ascending neighbor id; cosine rounded to 6dp (hash-stable).
    Self-matches (same id) are excluded."""
    c = with_unit_vectors(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("unit_vec").alias("cv")
    )
    q = with_unit_vectors(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("unit_vec").alias("qv")
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_dot(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def _hyperplanes(dim: int, n_bits: int, n_tables: int, seed: int) -> list[list[list[float]]]:
    rng = random.Random(seed)
    return [
        [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_bits)]
        for _ in range(n_tables)
    ]


def _bucket_expr(unit_vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id of one LSH table: bit i = sign(<v, plane_i>)."""
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        arr = F.array(*[F.lit(x) for x in plane])
        bucket = bucket + F.when(_dot(unit_vec, arr) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_buckets(
    df: DataFrame,
    dim: int,
    n_bits: int = 12,
    n_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, unit_vec, table, bucket) — one row per (vector, table)."""
    planes = _hyperplanes(dim, n_bits, n_tables, seed)
    u = with_unit_vectors(df, vec_col).select(
        F.col(id_col).alias("id"), F.col("unit_vec")
    )
    tables = F.array(
        *[
            F.struct(F.lit(t).alias("table"), _bucket_expr(F.col("unit_vec"), planes[t]).alias("bucket"))
            for t in range(n_tables)
        ]
    )
    return u.select("id", "unit_vec", F.explode(tables).alias("tb")).select(
        "id", "unit_vec", F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket")
    )


def euclidean_lsh_buckets(
    df: DataFrame,
    dim: int,
    bucket_width: float | None = None,
    n_projections: int = 2,
    n_tables: int = 6,
    n_buckets: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, table, bucket) — p-stable LSH for EUCLIDEAN distance (Datar,
    Immorlica, Indyk & Mirrokni 2004): per table, the key concatenates
    ``n_projections`` quantized Gaussian projections
    ``floor(<v, a_i> / w)``; nearby points (≪ w) collide with high
    probability. Unlike :func:`lsh_buckets` (sign-hyperplane, cosine),
    this respects magnitudes — the right blocker for euclidean consumers
    (HDBSCAN's mutual-reachability graph).

    ``bucket_width=None`` picks w per (table, projection) as
    (max−min)/``n_buckets`` of that projection — one distributed
    aggregate, deterministic, and scale-free w.r.t. the data's units."""
    rng = random.Random(seed * 2 + 1)
    planes = [
        [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_projections)]
        for _ in range(n_tables)
    ]
    v = df.select(F.col(id_col).alias("id"),
                  F.col(vec_col).cast("array<double>").alias("_v"))
    proj_cols = {
        f"_p_{t}_{i}": _dot(F.col("_v"), F.array(*[F.lit(x) for x in planes[t][i]]))
        for t in range(n_tables)
        for i in range(n_projections)
    }
    p = v.select("id", *[c.alias(n) for n, c in proj_cols.items()])
    if bucket_width is None:
        # per-projection width from the global span: one scalar aggregate
        stats = p.agg(
            *[F.max(n).alias(f"mx{n}") for n in proj_cols],
            *[F.min(n).alias(f"mn{n}") for n in proj_cols],
        ).collect()[0]
        widths = {
            n: max((stats[f"mx{n}"] - stats[f"mn{n}"]) / float(n_buckets), 1e-12)
            for n in proj_cols
        }
    else:
        widths = {n: float(bucket_width) for n in proj_cols}
    tables = F.array(
        *[
            F.struct(
                F.lit(t).alias("table"),
                F.xxhash64(
                    F.lit(t),
                    *[
                        F.floor(F.col(f"_p_{t}_{i}") / F.lit(widths[f"_p_{t}_{i}"]))
                        for i in range(n_projections)
                    ],
                ).alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )
    return p.select("id", F.explode(tables).alias("tb")).select(
        "id", F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket")
    )


def euclidean_ann_pairs(
    df: DataFrame,
    dim: int,
    bucket_width: float | None = None,
    n_projections: int = 2,
    n_tables: int = 6,
    n_buckets: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Blocked euclidean candidate pairs (a, b), a ≠ b, symmetric (both
    directions present): points sharing a p-stable bucket in ≥1 table.
    Pure equality joins — no all-pairs / nested-loop stage anywhere in
    the plan; expected cost follows bucket occupancy, not N². Feed to
    ``hdbscan(candidate_pairs=...)`` or any euclidean k-NN consumer."""
    bk = euclidean_lsh_buckets(
        df, dim, bucket_width, n_projections, n_tables, n_buckets, seed,
        id_col, vec_col,
    )
    return (
        bk.select(F.col("id").alias("a"), "table", "bucket")
        .join(bk.select(F.col("id").alias("b"), "table", "bucket"),
              ["table", "bucket"])
        .filter(F.col("a") != F.col("b"))
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )


def cosine_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    n_bits: int = 10,
    n_tables: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: compare queries only to corpus vectors
    sharing an LSH bucket in ≥1 table. Same output contract as brute
    force; recall measured in tests (≥0.9@10 on the test corpus)."""
    cb = lsh_buckets(corpus, dim, n_bits, n_tables, seed, id_col, vec_col)
    qb = lsh_buckets(queries, dim, n_bits, n_tables, seed, id_col, vec_col)
    # Dedup candidate pairs on ids only (2 keys/row through the shuffle),
    # then join the unit vectors back — the vectors never ride the
    # n_tables-wide candidate shuffle.
    cand = (
        cb.select(F.col("id").alias("neighbor_id"), "table", "bucket")
        .join(
            qb.select(F.col("id").alias("query_id"), "table", "bucket"),
            ["table", "bucket"],
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    cuv = with_unit_vectors(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("unit_vec").alias("cv")
    )
    quv = with_unit_vectors(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("unit_vec").alias("qv")
    )
    scored = (
        cand.join(quv, "query_id")
        .join(cuv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(_dot(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float,
    dim: int,
    n_bits: int = 8,
    n_tables: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
) -> DataFrame:
    """Corpus pairs with cosine ≥ threshold → (id_a, id_b, cosine),
    id_a < id_b. ``exact=True`` brute-forces all pairs (test scale /
    oracle twin); default blocks through LSH tables first."""
    if exact:
        u = with_unit_vectors(df, vec_col).select(F.col(id_col).alias("id"), "unit_vec")
        a = u.select(F.col("id").alias("id_a"), F.col("unit_vec").alias("va"))
        b = u.select(F.col("id").alias("id_b"), F.col("unit_vec").alias("vb"))
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    else:
        bk = lsh_buckets(df, dim, n_bits, n_tables, seed, id_col, vec_col)
        # Id-only candidate dedup, vectors joined back after (see
        # cosine_lsh_topk) — the candidate shuffle carries 2 longs/row.
        cand = (
            bk.select(F.col("id").alias("id_a"), "table", "bucket")
            .join(bk.select(F.col("id").alias("id_b"), "table", "bucket"), ["table", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .dropDuplicates(["id_a", "id_b"])
        )
        u = with_unit_vectors(df, vec_col).select(F.col(id_col).alias("id"), "unit_vec")
        pairs = (
            cand.join(u.select(F.col("id").alias("id_a"), F.col("unit_vec").alias("va")), "id_a")
            .join(u.select(F.col("id").alias("id_b"), F.col("unit_vec").alias("vb")), "id_b")
        )
    return (
        pairs.select(
            "id_a", "id_b", F.round(_dot(F.col("va"), F.col("vb")), 6).alias("cosine")
        )
        .filter(F.col("cosine") >= threshold)
    )
