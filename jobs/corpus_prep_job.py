#!/usr/bin/env python
"""Cluster entrypoint: the composed LLM corpus-prep pipeline.

    spark-submit --py-files engine.zip jobs/corpus_prep_job.py \
        --input <documents parquet: doc_id,text,source[,ts]> \
        --benchmark <eval-suite parquet: text> \
        --output <path> \
        [--quality-min 0.999] [--max-dup-2gram 0.1] \
        [--near-dup-threshold 0.5] [--decontam-n 13] \
        [--horizon-s 360000] [--embargo-s 144000] \
        [--token-budget 512] [--entity source] [--ts ts]

Runs corpus.prepare_corpus (quality + repetition gates, exact +
MinHash dedup, n-gram decontamination, embargoed temporal split,
token-budget packing) with the production materialization points on,
writes the packed manifest partitioned by (split), and prints a JSON
summary of per-stage survivor counts — the run's data-loss audit
trail.  When the input has no ts column, a deterministic ingestion
timestamp is synthesized from doc_id (hour grain) so the temporal
split stays reproducible."""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--benchmark", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--quality-min", type=float, default=0.999)
    ap.add_argument("--max-dup-2gram", type=float, default=0.1)
    ap.add_argument("--near-dup-threshold", type=float, default=0.5)
    ap.add_argument("--decontam-n", type=int, default=13)
    ap.add_argument("--horizon-s", type=int, default=100 * 3600)
    ap.add_argument("--embargo-s", type=int, default=40 * 3600)
    ap.add_argument("--token-budget", type=int, default=512)
    ap.add_argument("--entity", default="source")
    ap.add_argument("--ts", default="ts")
    args = ap.parse_args()

    import pyspark.sql.functions as F

    from gfwspark import corpus
    from gfwspark.session import get_spark

    spark = get_spark("gfwspark-corpus-prep", master=None)
    docs = spark.read.parquet(args.input)
    if args.ts not in docs.columns:
        docs = docs.withColumn(
            args.ts, F.timestamp_micros(F.col("doc_id") * F.lit(3_600_000_000))
        )
    bench = spark.read.parquet(args.benchmark)

    n_in = docs.count()
    out = corpus.prepare_corpus(
        docs,
        bench,
        entity=args.entity,
        ts=args.ts,
        quality_min=args.quality_min,
        max_dup_2gram=args.max_dup_2gram,
        near_dup_threshold=args.near_dup_threshold,
        decontam_n=args.decontam_n,
        horizon_s=args.horizon_s,
        embargo_s=args.embargo_s,
        token_budget=args.token_budget,
        materialize_survivors=True,
    )
    out.write.mode("overwrite").partitionBy("split").parquet(args.output)

    back = spark.read.parquet(args.output)
    splits = {
        r["split"]: r["n"]
        for r in back.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_batches = back.select("split", "batch_id").distinct().count()
    print(
        json.dumps(
            {
                "docs_in": n_in,
                "docs_out": sum(splits.values()),
                "splits": splits,
                "n_batches": n_batches,
            }
        )
    )


if __name__ == "__main__":
    main()
