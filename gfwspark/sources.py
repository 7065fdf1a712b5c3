"""Sources & sinks (SURVEY §2.1 S6–S11).

The reference reads CSV metadata (DictReader, metadata.py:368-377),
newline id lists (metadata.py:389-402), fishing-range CSVs with UTC
timestamps (metadata.py:418-433), and writes JSON inference rows
(run_inference.py:84-97) and CSV/BQ training tables
(train/create_train_info.py:509-526).  Spark equivalents, schema-first:

- every reader takes an explicit schema (never inferSchema on 100 TB —
  schema inference is a full extra pass)
- sinks write partitioned parquet (the Iceberg-layout stand-in:
  partition columns + deterministic file layout) or JSON/CSV
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

# entity metadata CSV: the char_info/det_info analog
# (classification/metadata_test.py:25-41: id,label,length,split,…)
ENTITY_INFO_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("label", T.StringType()),
        T.StructField("length", T.DoubleType()),
        T.StructField("split", T.StringType()),
    ]
)

# interval/annotation CSV: the fishing-range analog
# (id,start_time,end_time,is_fishing — metadata.py:418-433)
ANNOTATION_CSV_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("start_time", T.StringType()),
        T.StructField("end_time", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def read_entity_info(spark: SparkSession, path: str) -> DataFrame:
    """Header CSV → typed rows; blank labels dropped (reference P7,
    metadata.py:313-316), duplicate ids resolved keep-first by file
    order is NOT reproduced — dedup is explicit (A2 rank pattern)."""
    df = spark.read.option("header", True).schema(ENTITY_INFO_SCHEMA).csv(path)
    return df.filter(F.length(F.trim(F.coalesce("label", F.lit("")))) > 0)


def read_id_list(spark: SparkSession, path: str) -> DataFrame:
    """Newline-delimited id list (metadata.py:389-402): one trimmed,
    non-empty id per row."""
    return (
        spark.read.text(path)
        .select(F.trim("value").alias("image_id"))
        .filter(F.length("image_id") > 0)
    )


def read_annotation_csv(spark: SparkSession, path: str) -> DataFrame:
    """Interval CSV with ISO or unix-epoch timestamps, forced UTC
    (metadata.py:405-415 parses both forms)."""
    raw = spark.read.option("header", True).schema(ANNOTATION_CSV_SCHEMA).csv(path)

    def parse(col: str):
        c = F.col(col)
        return F.when(
            c.rlike(r"^\d+(\.\d+)?$"),
            F.timestamp_seconds(c.cast("double")),
        ).otherwise(F.to_timestamp(c))

    return raw.select(
        "image_id",
        parse("start_time").alias("start_ts"),
        parse("end_time").alias("end_ts"),
        "value",
    ).filter(F.col("start_ts") <= F.col("end_ts"))


def with_file_id(
    df: DataFrame,
    pattern: str = r"([^/]+)\.(?:parquet|csv|tfrecord|json)(?:/|$)",
    out: str = "file_id",
) -> DataFrame:
    """S4: filename→entity-id projection.  The reference derives the
    vessel id from the shard filename (`<id>.tfrecord`,
    run_inference.py:44-48, feature_generation paths); the Spark analog
    extracts it from input_file_name() at scan time — pure metadata, no
    extra I/O.  The default pattern matches the OUTERMOST
    `<id>.<ext>` path component, so both flat files (`/data/<id>.csv`)
    and Spark-written dataset dirs (`/data/<id>.parquet/part-….parquet`)
    yield `<id>`."""
    return df.withColumn(out, F.regexp_extract(F.input_file_name(), pattern, 1))


def write_json_results(df: DataFrame, path: str) -> None:
    """JSON-lines sink (run_inference.py:84-97 analog)."""
    df.write.mode("overwrite").json(path)


def iceberg_available(spark: SparkSession) -> bool:
    """Capability probe: is the Iceberg Spark runtime on the classpath?

    Probe result in THIS container (recorded 2026-08-16, see README):
    org.apache.iceberg.spark.SparkCatalog is absent and no network is
    available to fetch spark-runtime jars, so the engine uses the
    documented parquet stand-in (hive partition dirs + manifest/snapshot
    JSON in checkpoint.py).  On a real cluster with
    `spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog`
    configured, write_partitioned upgrades to a true Iceberg table —
    same call sites, no silent substitution either way."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    iceberg_table: str | None = None,
) -> None:
    """Iceberg-style layout: hive partition dirs + within-file sort so
    downstream as-of scans get clustered, sorted input without
    re-shuffling (the engine's write-side layout contract,
    layout.partition_sorted at rest).

    When `iceberg_table` is given AND the Iceberg runtime is on the
    classpath (iceberg_available), writes a real Iceberg table with the
    same partitioning; otherwise falls back to plain parquet at `path`
    (the documented stand-in — lineage manifests + snapshots come from
    checkpoint.py)."""
    out = df
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    if iceberg_table and iceberg_available(df.sparkSession):
        (
            out.writeTo(iceberg_table)
            .using("iceberg")
            .partitionedBy(*[F.col(c) for c in partition_cols])
            .createOrReplace()
        )
        return
    out.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    key_cols: list[str],
    fraction: float,
    seed: int = 42,
    max_weight: float = 100.0,
) -> DataFrame:
    """Deterministic weighted sampling — the reference's weighted
    training source (S2, feature_generation.py:43-61) without RNG
    state: keep a row iff u(key, seed) < fraction * min(weight,
    max_weight), where u is the md5-prefix hash of the key mapped to
    [0,1).  Pure function of the row → identical samples at any
    partitioning, resumable, and oracle-replayable.  max_weight caps
    replication skew exactly like MAX_WEIGHT=100 (metadata.py:268-272).
    """
    from gfwspark.text import token_hash32

    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols], F.lit(str(seed)))
    u = token_hash32(key).cast("double") / F.lit(float(1 << 32))
    p = F.least(F.col(weight_col).cast("double"), F.lit(max_weight)) * fraction
    return df.filter(u < p)


def stratified_sample(
    df: DataFrame,
    class_col: str,
    n_per_class: int,
    key_cols: list[str],
    seed: int = 42,
) -> DataFrame:
    """Deterministic EXACT-COUNT per-class sampling (class rebalancing
    for training sets): rank rows inside each class by the md5 draw of
    their key and keep the first `n_per_class`.  Pure function of
    (keys, seed) → identical samples at any partition count, and a
    class with fewer rows keeps them all.  One shuffle on class_col;
    rebalances a skewed label distribution without the replication
    blowup of weighted oversampling (weighted_sample covers that
    side)."""
    from pyspark.sql import Window as _W

    from gfwspark.text import token_hash32

    u = token_hash32(
        F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols], F.lit(str(seed)))
    )
    w = _W.partitionBy(class_col).orderBy(u, *[F.col(c) for c in key_cols])
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_class)
        .drop("_rk")
    )


def pack_token_budget_batches(
    df: DataFrame,
    token_col: str,
    budget: int,
    order_cols: list[str],
    partition_col: str | list[str] | None = None,
    allow_global: bool = False,
) -> DataFrame:
    """Contiguous token-budget sharding (training-batch packing): rows
    in deterministic `order_cols` order get batch_id =
    floor(exclusive_running_token_sum / budget) — a new batch starts
    when a row's start offset crosses a budget boundary, so every
    batch's token sum is <= budget + max_row_tokens (classic contiguous
    bin slack; exact greedy closing is inherently sequential and buys
    <1 row per batch).  `partition_col` packs independently per
    partition (e.g. per language) — that is also what keeps the
    running sum distributed at 100 TB: one entity-partitioned window,
    no global serial scan.

    partition_col=None means an UNPARTITIONED running-sum window — the
    whole input collapses onto one task.  That is only sane for small
    frames, so it must be opted into explicitly with
    allow_global=True; otherwise this raises rather than silently
    degrading to a serial plan.  A list packs independently per
    composite key (e.g. (split, source)) — the parallelism is the
    composite cardinality, so prefer the widest key that still means
    "one training shard"."""
    from pyspark.sql import Window as _W

    if partition_col is None and not allow_global:
        raise ValueError(
            "pack_token_budget_batches with partition_col=None runs the "
            "running-sum window on a single task (not distributed). Pass "
            "partition_col=<col> to pack per-partition, or "
            "allow_global=True to accept the serial global scan on a "
            "small frame."
        )
    if partition_col is None:
        part = []
    elif isinstance(partition_col, str):
        part = [partition_col]
    else:
        part = list(partition_col)
    w = (
        _W.partitionBy(*part)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(_W.unboundedPreceding, 0)
    )
    cum_incl = F.sum(F.col(token_col).cast("long")).over(w)
    start = cum_incl - F.col(token_col)
    return df.withColumn("batch_id", F.floor(start / budget).cast("long")).withColumn(
        "batch_start_offset", start
    )


def temporal_split_embargo(
    df: DataFrame,
    horizon_s: int,
    embargo_s: int,
    entity: str = "image_id",
    ts: str = "ts",
) -> DataFrame:
    """Per-entity leakage-free temporal train/validation split with an
    embargo gap — the split a windowed feature pipeline must use so
    that NO trailing-window feature computed at a validation timestamp
    overlaps training rows (the north rule's zero-temporal-leakage
    requirement applied to the split itself, not just the join).

    cutoff(entity) = max(ts) - horizon: the last `horizon_s` seconds
    of each entity's timeline become validation.  Rows inside
    (cutoff - embargo, cutoff] are DROPPED: any validation row's
    trailing feature window of length <= embargo_s ends strictly
    before every surviving training row, so set embargo_s to the
    longest feature window in the pipeline.  (The classic purged /
    embargoed split from leakage-safe backtesting, e.g. de Prado,
    "Advances in Financial Machine Learning" ch. 7 — public method.)

    One window-max over the entity partitioning (reused by every
    downstream per-entity stage — no extra exchange); pure JVM.
    Returns the input rows (minus the embargo band) + `split` column.
    """
    from pyspark.sql import Window as _W

    from gfwspark.util import epoch_us

    cutoff = F.max(epoch_us(ts)).over(_W.partitionBy(entity)) - F.lit(
        int(horizon_s) * 1_000_000
    )
    t = epoch_us(ts)
    return (
        df.withColumn(
            "split",
            F.when(t > cutoff, F.lit("val")).when(
                t <= cutoff - F.lit(int(embargo_s) * 1_000_000), F.lit("train")
            ),
        )
        .filter(F.col("split").isNotNull())
    )


#: Sidecar recording the table's authoritative column set (Iceberg
#: keeps this in its metadata tree; the parquet stand-in needs it too,
#: because a plain `spark.read.parquet` infers the schema from ONE
#: arbitrary file — on a mixed-schema table that silently drops the
#: evolved columns from any rewrite).  Leading underscore keeps Spark's
#: parquet reader from treating it as data.
_SCHEMA_MANIFEST = "_table_schema.json"

#: Sidecar SUBDIRS carried through layout rewrites (compact/zorder):
#: their content is row-for-row independent of file layout, so a
#: rewrite that drops them silently deletes a still-valid artifact
#: (read_entity_stats then raises and the CDC sink re-bootstraps with
#: a full-table scan).
_CARRIED_SIDECARS = ("_entity_stats",)


def _carry_sidecars(src: str, dst: str) -> None:
    """Copy layout-independent sidecar dirs from the live table into a
    rewrite's tmp dir before the atomic swap."""
    import os
    import shutil

    for name in _CARRIED_SIDECARS:
        p = os.path.join(src, name)
        if os.path.isdir(p):
            shutil.copytree(p, os.path.join(dst, name), dirs_exist_ok=True)


def _read_table_meta(path: str) -> dict | None:
    import json
    import os

    p = os.path.join(path, _SCHEMA_MANIFEST)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _read_schema_manifest(path: str) -> list[str] | None:
    meta = _read_table_meta(path)
    return None if meta is None else meta["columns"]


def _write_schema_manifest(
    path: str, columns: list[str], extra: dict | None = None
) -> None:
    # tmp + atomic rename: a crash mid-dump must not leave a truncated
    # manifest (which would turn every later read_table into a
    # JSONDecodeError — the sidecar must be as crash-safe as the
    # rewrite protocol it guards).  ``extra`` carries table-level
    # metadata beyond the column set (today: n_buckets for the upsert
    # layout); rewriters must pass the source table's extras through.
    import json
    import os

    p = os.path.join(path, _SCHEMA_MANIFEST)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump({**(extra or {}), "columns": sorted(columns)}, f)
    os.replace(tmp, p)


def read_table(
    spark: SparkSession, path: str, force_merge: bool = False
) -> DataFrame:
    """Read a managed parquet table with its COMPLETE schema: if the
    schema manifest says the cheap (first-file-schema) read is missing
    columns — i.e. the table has evolved and the inferred schema came
    from a pre-evolution file — re-read with mergeSchema.  The
    footer-scan cost is paid only when the table actually holds mixed
    schemas, never on the hot path.  ``force_merge`` skips the
    manifest heuristic and always merges — for tables whose schema
    history is unknown (no manifest)."""
    if force_merge:
        return spark.read.option("mergeSchema", "true").parquet(path)
    df = spark.read.parquet(path)
    manifest = _read_schema_manifest(path)
    if manifest is not None and not set(manifest) <= set(df.columns):
        df = spark.read.option("mergeSchema", "true").parquet(path)
    return df


def upsert_partitioned(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    keys: list[str],
    entity: str = "image_id",
    n_buckets: int = 16,
    collect_stats: bool = True,
    allow_schema_evolution: bool = False,
    extra_meta: dict | None = None,
) -> dict:
    """MERGE-style upsert into a bucket-partitioned parquet table —
    the parquet stand-in for Iceberg MERGE INTO (same trick Iceberg's
    copy-on-write merge performs: rewrite ONLY the data files whose
    partitions the batch touches).

    1. batch rows get `_bucket` = crc32(entity) % n_buckets
       (checkpoint.bucket_of — the table's layout key);
    2. the existing table is read WITH a partition-pruning filter to
       only the touched buckets (everything else is never scanned,
       never rewritten — at 10^12 rows that is the entire point);
    3. existing rows that match a batch row on `keys` are dropped
       (left_anti), the batch is unioned in;
    4. dynamic partition overwrite rewrites only the touched bucket
       directories.

    The merged frame is localCheckpoint'ed before the write because
    Spark refuses to overwrite a path it is concurrently reading
    (self-overwrite); the materialization is bounded by the touched
    buckets, not the table.  Returns {touched_buckets, upserted,
    deleted} counts for the caller's lineage record.

    Concurrency contract: single writer (like any filesystem parquet
    table); a real Iceberg catalog upgrades this to optimistic
    snapshot commits with no code change upstream.

    ``extra_meta``: caller-owned table-level metadata recorded in the
    schema-manifest sidecar alongside n_buckets (e.g. the stride-blocks
    layout's shift/feature_cols contract) — the caller is responsible
    for validating it against _read_table_meta before merging.
    """
    import os

    from gfwspark.checkpoint import bucket_of

    meta = _read_table_meta(path) if os.path.exists(path) else None
    if meta is not None and meta.get("n_buckets") not in (None, n_buckets):
        raise ValueError(
            f"upsert_partitioned: table at {path} was built with "
            f"n_buckets={meta['n_buckets']} but this call passed "
            f"n_buckets={n_buckets} — a mismatched bucket modulus would "
            "assign keys to the wrong _bucket dirs and duplicate rows"
        )
    b = batch.withColumn("_bucket", bucket_of(entity, n_buckets))
    touched = sorted(r["_bucket"] for r in b.select("_bucket").distinct().collect())
    n_up = b.count()
    deleted: int | None = 0
    if os.path.exists(path):
        from functools import reduce
        from operator import and_

        # read_table consults the schema manifest: a table that holds
        # mixed-schema files (a prior evolved upsert) is ALWAYS read
        # with mergeSchema — otherwise Spark infers the schema from one
        # arbitrary file, and an old-schema draw would make this merge
        # silently rewrite the touched buckets without the evolved
        # columns (permanent data loss).  The footer-scan cost is paid
        # only on genuinely mixed tables; the hot path (uniform schema,
        # streaming per-batch upserts) keeps the cheap first-file read.
        # A table WITHOUT a manifest has an unknown schema history
        # (created before the sidecar existed, or by a plain parquet
        # write): force mergeSchema once — this upsert then writes the
        # manifest and the cheap path resumes.
        existing = read_table(
            spark, path, force_merge=_read_schema_manifest(path) is None
        ).filter(F.col("_bucket").isin(touched))
        new_cols = set(b.columns) - set(existing.columns)
        lost_cols = set(existing.columns) - set(b.columns) - {"_bucket"}
        if (new_cols or lost_cols) and not allow_schema_evolution:
            raise ValueError(
                "upsert batch schema differs from the table "
                f"(added={sorted(new_cols)}, missing={sorted(lost_cols)}); "
                "pass allow_schema_evolution=True to union-by-name with "
                "null padding (Iceberg-style additive evolution), and read "
                "the table with mergeSchema afterwards"
            )
        bk = b.select(*keys).distinct()
        # eqNullSafe: MERGE key matching must treat NULL = NULL as a
        # match, or null-keyed rows duplicate on every re-upsert
        cond = reduce(and_, [existing[k].eqNullSafe(bk[k]) for k in keys])
        keep = existing.join(bk, cond, "left_anti")
        if collect_stats:
            # one semi-join count of the touched buckets, not the
            # count(existing) - count(keep) pair (two full rescans)
            deleted = existing.join(bk, cond, "left_semi").count()
        else:
            deleted = None
        out = keep.unionByName(b, allowMissingColumns=allow_schema_evolution)
    else:
        out = b
    out = out.localCheckpoint(eager=True)
    if os.path.exists(path):
        # manifest BEFORE the data write: a crash mid-write leaves
        # mixed-schema buckets, and the already-updated manifest makes
        # read_table take the mergeSchema path (a manifest column not
        # yet in any file only costs a conservative footer scan; the
        # reverse ordering would let the cheap old-file read pass the
        # manifest check and reopen the evolved-column loss)
        _write_schema_manifest(
            path, out.columns, {"n_buckets": n_buckets, **(extra_meta or {})}
        )
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_bucket")
        .parquet(path)
    )
    # record the now-authoritative column set so every later read —
    # including a default (non-evolving) upsert's — sees the full
    # schema even while untouched buckets still hold old-schema files
    # (idempotent re-write covers the fresh-table branch above)
    _write_schema_manifest(
        path, out.columns, {"n_buckets": n_buckets, **(extra_meta or {})}
    )
    return {"touched_buckets": touched, "upserted": n_up, "deleted": deleted}


def recover_rewrite(path: str, suffix: str) -> tuple[str, str]:
    """Entry half of the crash-safe in-place rewrite protocol shared
    by compact_table and layout.zorder_table.  Recover from a previous
    crashed run before touching anything:
     - old exists, path missing -> crashed between the two renames:
       the original table is intact under `old`; put it back.
     - old exists alongside path -> crashed before cleanup; old is a
       superseded copy, drop it.
     - tmp is always an incomplete/stale write at entry; drop it.
    Returns (tmp, old) for the caller to write into / commit_rewrite."""
    import os
    import shutil

    tmp = path.rstrip("/") + suffix + "_tmp"
    old = path.rstrip("/") + suffix + "_old"
    if os.path.exists(old):
        if not os.path.exists(path):
            os.rename(old, path)
        else:
            shutil.rmtree(old)
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    return tmp, old


def commit_rewrite(path: str, tmp: str, old: str) -> None:
    """Commit half: atomically swap the completed `tmp` write into
    `path` (rename is the atomic unit; a crash at any point is healed
    by the next recover_rewrite).  A `path` that does not exist yet
    (first write to a new location) is a plain rename."""
    import os
    import shutil

    if os.path.exists(path):
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)
    else:
        os.rename(tmp, path)


def compact_table(
    spark: SparkSession,
    path: str,
    target_mb: int = 128,
    sort_cols: list[str] | None = None,
) -> dict:
    """Small-file compaction (the Iceberg `rewrite_data_files` /
    OPTIMIZE stand-in): rewrite a parquet directory into
    ceil(bytes / target_mb) files, optionally re-sorting within files
    to restore the engine's at-rest clustering (layout.partition_sorted
    contract) that incremental appends erode.

    The small-files problem is a first-order 100-TB cost: a table
    accreted by per-bucket upserts / streaming commits ends up with
    thousands of KB-sized files, and every downstream scan pays one
    task + one open per file.  Sizing uses the on-disk byte total (not
    row counts), so compressed width is what drives the output count.

    Writes to a temp sibling then atomically swaps directories —
    Spark cannot overwrite a path it is reading, and a crash mid-write
    must not lose the original.  Single-writer contract, like the
    upsert sink.  Returns {files_before, files_after, bytes}."""
    import os
    import shutil

    def _stats(p: str) -> tuple[int, int]:
        n, b = 0, 0
        for root, dirs, files in os.walk(p):
            # sidecar dirs (e.g. _entity_stats) are metadata, not table
            # data: their parquet files must not count toward the
            # compaction sizing.  Partition dirs (_bucket=k) keep the
            # "=" and stay included.
            dirs[:] = [
                d for d in dirs if "=" in d or not d.startswith(("_", "."))
            ]
            for f in files:
                if f.endswith(".parquet"):
                    n += 1
                    b += os.path.getsize(os.path.join(root, f))
        return n, b

    tmp, old = recover_rewrite(path, suffix="._compact")
    src_meta = _read_table_meta(path) or {}
    extra = {k: v for k, v in src_meta.items() if k != "columns"}
    files_before, total_bytes = _stats(path)
    n_out = max(1, -(-total_bytes // (target_mb * 1024 * 1024)))
    # manifest-aware read: compacting an evolved (mixed-schema) table
    # must rewrite the union schema, not one arbitrary file's
    df = read_table(spark, path)
    # a bucket-partitioned upsert table (_bucket=k/ dirs) must keep its
    # layout: a flat rewrite would leave root-level files that collide
    # with the next upsert's partition dirs ("conflicting directory
    # structures") and break its partition-pruned bucket rewrites.
    # Range-partitioning on (_bucket, <within-bucket order>) honors
    # target_mb ACROSS buckets — a bucket bigger than target_mb spans
    # several range partitions (several files in its dir), instead of
    # collapsing to one oversized single-task file — and starting the
    # within-partition sort with _bucket means the partitioned writer's
    # required ordering is already satisfied (no extra SortExec to
    # scramble the sort_cols clustering on spill).
    bucketed = "_bucket" in df.columns
    if bucketed:
        inner = (
            [F.col(c) for c in sort_cols] if sort_cols
            # no requested order: seeded rand only spreads FILE
            # assignment inside a bucket; table content is unaffected
            else [F.rand(42)]
        )
        out = df.repartitionByRange(n_out, F.col("_bucket"), *inner)
        out = out.sortWithinPartitions("_bucket", *(sort_cols or []))
    else:
        out = df.repartition(n_out)
        if sort_cols:
            out = out.sortWithinPartitions(*sort_cols)
    w = out.write.mode("overwrite")
    if bucketed:
        w = w.partitionBy("_bucket")
    w.parquet(tmp)
    _write_schema_manifest(tmp, out.columns, extra)
    _carry_sidecars(path, tmp)
    commit_rewrite(path, tmp, old)
    files_after, _ = _stats(path)
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes": total_bytes,
    }
