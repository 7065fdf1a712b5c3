#!/usr/bin/env python
"""Cluster entrypoint: build / incrementally maintain the at-rest
stride-blocks window layout.

    spark-submit --py-files engine.zip jobs/blocks_maintain_job.py \
        --mode build  --input <rows parquet>   --blocks <table path> \
        --feature-col v --shift 767 [--buckets 16]
    spark-submit --py-files engine.zip jobs/blocks_maintain_job.py \
        --mode append --input <append parquet> --blocks <table path> \
        --feature-col v --shift 767 [--buckets 16] [--on-late drop]

`build` computes windows.stride_blocks over the full input and writes
the bucket-partitioned table (the one-time layout cost the r6 bench
measured as the one-shot extractor's scaling floor).  `append` merges
a strictly-later-ts batch via windows.append_stride_blocks
(changed_only) through the partition-pruned upsert — only each
appended entity's tail block plus its new blocks are rewritten.  Any
consumer then materializes windows of ANY W stepping by `shift` with
windows.windows_from_stride_blocks (zero-Exchange over the bucketed
read) — see BENCH/HISTORY.md round 6 for the measured efficiencies.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", required=True, choices=["build", "append"])
    ap.add_argument("--input", required=True)
    ap.add_argument("--blocks", required=True, help="blocks table path")
    ap.add_argument("--feature-col", required=True)
    ap.add_argument("--shift", type=int, required=True)
    ap.add_argument("--entity", default="image_id")
    ap.add_argument("--ts", default="ts")
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument(
        "--on-late", default="error", choices=["error", "drop", "ignore"],
        help="append mode: rows not strictly after the entity's stored "
             "max ts (error = raise, drop = skip already-applied/late "
             "rows — the idempotent-replay setting)",
    )
    args = ap.parse_args()

    from gfwspark import sources, windows
    from gfwspark.session import get_spark

    spark = get_spark("gfwspark-blocks-maintain", master=None)
    rows = spark.read.parquet(args.input)
    if args.mode == "build":
        changed = windows.stride_blocks(
            rows, args.feature_col, args.shift, entity=args.entity, ts=args.ts
        )
    else:
        import pyspark.sql.functions as F

        from gfwspark.checkpoint import bucket_of

        # prune the stored table to the batch's buckets before the
        # merge (same contract as streaming.stream_stride_blocks_sink):
        # per-run cost tracks batch size, not table size
        touched = [
            r["_b"]
            for r in rows.select(
                bucket_of(args.entity, args.buckets).alias("_b")
            ).distinct().collect()
        ]
        blocks = (
            sources.read_table(spark, args.blocks)
            .filter(F.col("_bucket").isin(touched))
            .drop("_bucket")
        )
        changed = windows.append_stride_blocks(
            blocks, rows, args.feature_col, args.shift,
            entity=args.entity, ts=args.ts,
            changed_only=True, on_late=args.on_late,
        )
    r = sources.upsert_partitioned(
        spark, changed, args.blocks, keys=[args.entity, "block_id"],
        entity=args.entity, n_buckets=args.buckets, collect_stats=False,
    )
    print({"mode": args.mode, **r})


if __name__ == "__main__":
    main()
