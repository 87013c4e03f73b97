"""Cluster driver script: PageRank over an edge table (or raw transcripts)
via ``spark-submit --py-files dist/graph_data_science_spark.zip``.

The master/executor topology comes from spark-submit; this script only
declares the job. Examples::

    # from a pre-derived edge table
    spark-submit --py-files dist/graph_data_science_spark.zip \
        scripts/run_pagerank.py --edges /data/edges --output /data/scores

    # from raw transcripts (conv_id, turn_idx, role, text, tool, ts)
    spark-submit ... scripts/run_pagerank.py \
        --transcripts mycat.db.transcripts --output /data/scores \
        --checkpoint /data/ckpt/run1 --damping 0.85 --max-iterations 20
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main() -> None:
    p = argparse.ArgumentParser()
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--edges", help="parquet path of (src, dst[, weight])")
    src.add_argument(
        "--transcripts",
        help="parquet path OR catalog table (e.g. Iceberg) of transcripts",
    )
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint", help="checkpoint-store root (resumable runs)")
    p.add_argument("--run-id", default=None)
    p.add_argument("--damping", type=float, default=0.85)
    p.add_argument("--tolerance", type=float, default=1e-7)
    p.add_argument("--max-iterations", type=int, default=20)
    p.add_argument("--executor", choices=["relational", "csr"], default="relational")
    p.add_argument("--weighted", action="store_true")
    args = p.parse_args()

    spark = (
        SparkSession.builder.appName("gds-pagerank")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    from graph_data_science_spark.algorithms.pagerank import page_rank
    from graph_data_science_spark.plans.checkpoint import CheckpointStore
    from graph_data_science_spark.projection import project
    from graph_data_science_spark.sources.edges import derive_edges

    if args.edges:
        edges = spark.read.parquet(args.edges)
    else:
        t = args.transcripts
        df = spark.table(t) if "/" not in t else spark.read.parquet(t)
        edges = derive_edges(df)

    g = project(edges, name="submitted")
    ckpt = None
    if args.checkpoint:
        ckpt = CheckpointStore(
            spark,
            args.checkpoint,
            run_id=args.run_id,
            config={
                "algo": "pagerank",
                "damping": args.damping,
                "tolerance": args.tolerance,
                "max_iterations": args.max_iterations,
                "weighted": args.weighted,
            },
        )
    res = page_rank(
        g,
        damping=args.damping,
        tolerance=args.tolerance,
        max_iterations=args.max_iterations,
        weighted=args.weighted,
        executor=args.executor,
        checkpoint=ckpt,
    )
    out = res.scores.join(g.nodes, "vid").select("orig_id", "score")
    out.write.mode("overwrite").parquet(args.output)
    print(
        f"pagerank: iterations={res.iterations} converged={res.did_converge} "
        f"nodes={g.node_count} edges={g.edge_count}"
    )


if __name__ == "__main__":
    main()
