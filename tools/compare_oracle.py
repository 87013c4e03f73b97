"""Local stand-in for the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB at sf0.01, compare row count, column names, and order-insensitive
values. Usage: python tools/compare_oracle.py [query ...]
"""

from __future__ import annotations

import functools
import math
import os
import sys
import time

# Line-flushed output: a bounded/killed gate run must keep every line
# already produced (fully-buffered stdout loses ALL of it on SIGKILL).
print = functools.partial(print, flush=True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from graph_data_science_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in idx) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), x) for x in t))
    return [cols[i] for i in idx], out


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark(app_name="oracle-compare", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, SF_DIR)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        t1 = time.time()
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(srows)} rows, {t1 - t0:.1f}s spark")
            if not srows:
                print(f"  !! EMPTY result for rows-only query {name}")
                failures += 1
            continue
        cur = con.execute(oracles[name])
        ocols = [d[0] for d in cur.description]
        orows = [tuple(r) for r in cur.fetchall()]
        t2 = time.time()
        sc, sr = norm_rows(scols, srows)
        oc, orw = norm_rows(ocols, orows)
        ok = True
        if sc != oc:
            print(f"  !! {name}: column mismatch spark={sc} oracle={oc}")
            ok = False
        if len(sr) != len(orw):
            print(f"  !! {name}: row count spark={len(sr)} oracle={len(orw)}")
            ok = False
        if ok and sr != orw:
            diffs = [(a, b) for a, b in zip(sr, orw) if a != b]
            print(f"  !! {name}: {len(diffs)} value mismatches; first 3: {diffs[:3]}")
            ok = False
        status = "OK " if ok else "FAIL"
        print(
            f"{name:24s} {status} {len(sr)} rows, spark {t1 - t0:.1f}s duckdb {t2 - t1:.1f}s"
        )
        failures += 0 if ok else 1
    print("ALL OK" if failures == 0 else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
