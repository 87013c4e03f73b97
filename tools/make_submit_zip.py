"""Package the engine for ``spark-submit --py-files`` on a real cluster.

Produces ``dist/graph_data_science_spark.zip`` (the importable package,
zip-safe — no data files) and leaves driver scripts in ``scripts/``::

    spark-submit \
        --deploy-mode cluster \
        --py-files dist/graph_data_science_spark.zip \
        scripts/run_pagerank.py \
        --edges s3://bucket/edges/ --output s3://bucket/scores/ \
        --checkpoint s3://bucket/ckpt/run1

Run at N and 4N executors with identical input for the scaling-efficiency
measurement (BENCH/BASELINE.md documents the in-sandbox local[8]/local[32]
equivalent).
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "graph_data_science_spark"


def main() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, f"{PKG}.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    print(out)
    return out


if __name__ == "__main__":
    main()
