"""Layout invariants: secondary sort, skew detection, salting."""

from __future__ import annotations

import pyspark.sql.functions as F

from gfwspark import layout, tables


def test_partition_sorted_invariant(spark):
    df = tables.synthesize_image_caption(spark, n_entities=12, rows_per_entity=10)
    sorted_df = layout.partition_sorted(df, num_partitions=4)
    assert layout.assert_sorted_within_entities(sorted_df) == 0

    # entities are contiguous within partitions: each entity maps to
    # exactly one partition id
    pid = sorted_df.withColumn("pid", F.spark_partition_id())
    multi = (
        pid.groupBy("image_id")
        .agg(F.countDistinct("pid").alias("np"))
        .filter(F.col("np") > 1)
        .count()
    )
    assert multi == 0


def test_detect_skew_finds_hot_entity(spark):
    df = tables.synthesize_image_caption(spark, n_entities=12, rows_per_entity=10)
    hot = layout.detect_skew(df, hot_threshold_rows=50).toPandas()
    assert "img_000000" in set(hot.image_id)


def test_salting_partitions_and_remerges(spark):
    df = tables.synthesize_image_caption(spark, n_entities=12, rows_per_entity=10)
    hot = layout.detect_skew(df, hot_threshold_rows=50)
    salted = layout.salted(df, n_salts=4, hot_keys=hot)

    # cold keys keep salt 0; hot key spreads over >1 salt
    cold = salted.filter(F.col("image_id") == "img_000002")
    assert cold.select(F.countDistinct("salt")).first()[0] == 1
    hot_salts = (
        salted.filter(F.col("image_id") == "img_000000")
        .select(F.countDistinct("salt"))
        .first()[0]
    )
    assert hot_salts > 1

    # two-phase agg over (entity, salt) re-merged == direct agg
    direct = df.groupBy("image_id").agg(F.count(F.lit(1)).alias("n")).toPandas()
    twophase = (
        salted.groupBy("image_id", "salt")
        .agg(F.count(F.lit(1)).alias("pn"))
        .groupBy("image_id")
        .agg(F.sum("pn").alias("n"))
        .toPandas()
    )
    a = direct.sort_values("image_id").reset_index(drop=True)
    b = twophase.sort_values("image_id").reset_index(drop=True)
    assert (a["n"].to_numpy() == b["n"].to_numpy()).all()


def test_salt_is_deterministic(spark):
    df = tables.synthesize_image_caption(spark, n_entities=6, rows_per_entity=8)
    a = layout.salted(df, n_salts=8).select("image_id", "ts", "salt").toPandas()
    b = layout.salted(df.repartition(7), n_salts=8).select("image_id", "ts", "salt").toPandas()
    a = a.sort_values(["image_id", "ts"]).reset_index(drop=True)
    b = b.sort_values(["image_id", "ts"]).reset_index(drop=True)
    assert (a["salt"].to_numpy() == b["salt"].to_numpy()).all()


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    """Two tables bucketed by the same key/count join with ZERO
    Exchange — the co-located layout the engine prescribes for
    fact-to-fact joins at scale."""
    import pandas as pd
    import pyspark.sql.functions as F

    from gfwspark import layout, tables

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ev = tables.load_table(spark, "/root/testdata/sf0.001", "events")
        a = ev.select("user_id", "ts", "value")
        b = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        layout.write_bucketed(a, "bk_facts", ["user_id"], 8, sort_cols=["user_id", "ts"])
        layout.write_bucketed(b, "bk_dim", ["user_id"], 8)
        joined = spark.table("bk_facts").join(spark.table("bk_dim"), "user_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle at all
        assert joined.count() == a.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bk_facts")
        spark.sql("DROP TABLE IF EXISTS bk_dim")


def test_window_ops_reuse_partition_sorted_layout(spark):
    """The north-rule layout sentence, as a plan invariant: per-entity
    window operators over partition_sorted (repartitionByRange +
    sortWithinPartitions) add ZERO exchanges — the one range exchange
    paid at layout time is the only entity-keyed shuffle in the plan
    (RangePartitioning(entity) satisfies the Window's clustering)."""
    from gfwspark import tables, windows

    img = tables.synthesize_image_caption(spark, n_entities=8, rows_per_entity=6, seed=1)
    laid = layout.partition_sorted(
        img.select("image_id", "ts", "phash"), num_partitions=4
    )
    out = windows.with_sliding_agg(laid, "phash", 4, prefix="p")
    plan = out._jdf.queryExecution().executedPlan().toString()
    entity_exchanges = [
        l for l in plan.splitlines() if "Exchange" in l and "image_id" in l
    ]
    assert len(entity_exchanges) == 1, entity_exchanges
    assert "rangepartitioning" in entity_exchanges[0]


def test_zorder_table_envelope_property(spark, tmp_path):
    """Z-order clustering must give every output file a narrow min/max
    envelope in BOTH dimensions simultaneously (a single-column sort
    narrows only its leading column) — the property parquet row-group
    / Iceberg file skipping prunes on.  Also: rewrite preserves rows
    exactly."""
    import pyspark.sql.functions as F

    from gfwspark import layout, tables

    ev = tables.load_table(spark, "/root/testdata/sf0.01", "events").select(
        "event_id", "user_id", "value"
    )
    path = str(tmp_path / "z")
    r = layout.zorder_table(ev, path, ["user_id", "value"], bits=4, n_files=8)
    assert set(r["boundaries"]) == {"user_id", "value"}
    back = spark.read.parquet(path)
    assert back.count() == ev.count()
    a = ev.toPandas().sort_values("event_id").reset_index(drop=True)
    b = back.toPandas().sort_values("event_id").reset_index(drop=True)[a.columns]
    assert a.equals(b)

    env = (
        back.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(
            (F.max("user_id") - F.min("user_id")).alias("du"),
            (F.max("value") - F.min("value")).alias("dv"),
        )
        .agg(F.avg("du").alias("mu"), F.avg("dv").alias("mv"))
        .first()
    )
    g = ev.agg(
        (F.max("user_id") - F.min("user_id")).alias("gu"),
        (F.max("value") - F.min("value")).alias("gv"),
    ).first()
    # both dimensions narrowed at once (each file spans well under the
    # global range); a lexicographic sort would leave one near 100%
    assert env["mu"] < 0.7 * g["gu"]
    assert env["mv"] < 0.5 * g["gv"]


def test_zorder_key_interleave_locality():
    """Morton-key math: interleaving is exact bit placement, and key
    distance bounds per-dimension bucket distance (locality)."""
    import pyspark.sql.functions as F

    from gfwspark import layout
    from gfwspark.session import get_spark

    spark = get_spark()
    rows = [(a, b) for a in range(8) for b in range(8)]
    df = spark.createDataFrame(rows, "x int, y int")
    out = df.withColumn(
        "z", layout.zorder_key([F.col("x"), F.col("y")], bits=3)
    ).collect()
    for r in out:
        want = sum(((r["x"] >> j) & 1) << (2 * j) for j in range(3)) + sum(
            ((r["y"] >> j) & 1) << (2 * j + 1) for j in range(3)
        )
        assert r["z"] == want, (r["x"], r["y"], r["z"], want)


def test_bucketed_asof_zero_shuffle(spark, tmp_path):
    """The at-rest answer to the as-of shuffle: with BOTH sides written
    bucketed by entity (layout.write_bucketed), the PER-ENTITY cogroup
    (coarse_buckets=None — coarse bucketing groups on a derived
    crc32 key the scan's partitioning cannot satisfy) meets its
    clustering requirement straight from the scan — ZERO Exchange in
    the plan (the union form cannot: Union discards children's
    partitioning, so it re-shuffles even over bucketed reads).
    Results equal the union form exactly."""
    import pyspark.sql.functions as F

    from gfwspark import asof, layout, tables

    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in ("zb_facts", "zb_ann"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # a stale location from a crashed/previous session survives the
        # catalog drop and blocks saveAsTable (LOCATION_ALREADY_EXISTS)
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    img = tables.image_caption_from_events(spark, "/root/testdata/sf0.001").select(
        "image_id", "ts", "event_id"
    )
    ann = (
        tables.synthesize_annotations(spark, n_entities=20, seed=1)
        .groupBy("image_id", "start_ts")
        .agg(F.max("value").alias("label"))
    )
    layout.write_bucketed(img, "zb_facts", ["image_id"], 4, sort_cols=["image_id", "ts"])
    layout.write_bucketed(ann, "zb_ann", ["image_id"], 4, sort_cols=["image_id", "start_ts"])
    f, a = spark.table("zb_facts"), spark.table("zb_ann")

    out = asof.asof_join_cogroup(f, a, value_cols=("label",), coarse_buckets=None)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 0, plan

    import pandas as pd

    want = (
        asof.asof_join_union(f, a, value_cols=("label",))
        .toPandas().sort_values(["image_id", "ts", "event_id"]).reset_index(drop=True)
    )
    got = out.toPandas().sort_values(["image_id", "ts", "event_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(want, got[want.columns], check_dtype=False)


def test_entity_stats_roundtrip_feeds_asof_auto(spark, tmp_path):
    """Profile-once flow: collect_entity_stats -> write beside the
    table -> read back -> asof auto consumes it (no pre-scan) and
    matches the union form."""
    import pandas as pd
    import pyspark.sql.functions as F

    from gfwspark import asof, layout, tables

    img = tables.image_caption_from_events(spark, "/root/testdata/sf0.001").select(
        "image_id", "ts", "event_id"
    )
    ann = (
        tables.synthesize_annotations(spark, n_entities=20, seed=1)
        .groupBy("image_id", "start_ts")
        .agg(F.max("value").alias("label"))
    )
    stats = layout.collect_entity_stats(img)
    p = str(tmp_path / "tbl")
    img.write.parquet(p)
    sp = layout.write_entity_stats(stats, p)
    assert sp.endswith("/_entity_stats")
    back = layout.read_entity_stats(spark, p)

    want = (
        asof.asof_join_union(img, ann, value_cols=("label",))
        .toPandas().sort_values(["image_id", "ts", "event_id"]).reset_index(drop=True)
    )
    got = (
        asof.asof_join(
            img, ann, value_cols=("label",), strategy="auto",
            hot_threshold_rows=10, entity_stats=back,
        )
        .toPandas().sort_values(["image_id", "ts", "event_id"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(want, got, check_dtype=False)


def test_zorder_table_in_place_and_crash_recovery(spark, tmp_path):
    """zorder_table must support the natural OPTIMIZE ZORDER call —
    df reading from `path` itself — via the write-to-tmp + atomic-swap
    protocol (a direct mode('overwrite') to the source path would
    throw or destroy the table), and recover_rewrite must heal a crash
    that happened between the two renames (old present, path gone)."""
    import os
    import shutil

    from gfwspark import layout, tables
    from gfwspark.sources import recover_rewrite

    ev = tables.load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "value"
    )
    path = str(tmp_path / "z")
    ev.write.parquet(path)
    n = ev.count()

    # in-place rewrite: read from path, zorder back into path
    src = spark.read.parquet(path)
    layout.zorder_table(src, path, ["user_id", "value"], bits=3, n_files=4)
    assert spark.read.parquet(path).count() == n

    # crash between renames: path moved aside to old, tmp gone
    old = path + "._zorder_old"
    shutil.move(path, old)
    assert not os.path.exists(path)
    recover_rewrite(path, suffix="._zorder")
    assert os.path.exists(path) and not os.path.exists(old)
    assert spark.read.parquet(path).count() == n


def test_recover_rewrite_drops_stale_tmp_and_superseded_old(tmp_path):
    """Entry recovery: a stale tmp is always dropped; an old alongside
    an intact path is a superseded copy and is dropped too."""
    import os

    from gfwspark.sources import recover_rewrite

    path = str(tmp_path / "t")
    os.makedirs(path)
    os.makedirs(path + "._x_tmp")
    os.makedirs(path + "._x_old")
    tmp, old = recover_rewrite(path, suffix="._x")
    assert os.path.exists(path)
    assert not os.path.exists(tmp) and not os.path.exists(old)


def test_stride_blocks_at_rest_zero_shuffle_windows(spark):
    """The at-rest answer to the W1m block-build floor (the measured
    scaling limiter, BENCH/HISTORY.md r6 sweep): stride_blocks written
    bucketed by entity, then windows_from_stride_blocks over the
    bucketed read — the whole window materialization plans with ZERO
    Exchange, and the output equals the one-shot
    sliding_feature_windows on the original rows exactly."""
    import shutil
    from urllib.parse import urlparse

    import pandas as pd

    from gfwspark import tables, windows

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    spark.sql("DROP TABLE IF EXISTS zb_blocks")
    shutil.rmtree(f"{wh}/zb_blocks", ignore_errors=True)

    img = tables.image_caption_from_events(spark, "/root/testdata/sf0.001").select(
        "image_id", "ts", "phash"
    )
    W_, S_ = 8, 3
    blocks = windows.stride_blocks(img, "phash", shift=S_)
    layout.write_bucketed(
        blocks, "zb_blocks", ["image_id"], 4, sort_cols=["image_id", "block_id"]
    )
    out = windows.windows_from_stride_blocks(
        spark.table("zb_blocks"), window_size=W_, shift=S_
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 0, plan

    key = ["image_id", "win_end_ts"]
    want = (
        windows.sliding_feature_windows(img, "phash", window_size=W_, shift=S_)
        .toPandas().sort_values(key).reset_index(drop=True)
    )
    got = out.toPandas().sort_values(key).reset_index(drop=True)
    assert want[key + ["win_start_ts", "n_points"]].equals(
        got[key + ["win_start_ts", "n_points"]]
    )
    for a, b in zip(want.features, got.features):
        assert list(a) == list(b)


def test_blocks_manifest_records_and_validates_shift(spark, tmp_path):
    """r7 (ADVICE): the blocks-table manifest records the layout's
    shift and feature_cols; a merge with a mismatched shift or feature
    set raises before anything is written (mismatched block ids would
    silently corrupt every window reconstructed from the table)."""
    import pyspark.sql.functions as F
    import pytest as _pytest

    from gfwspark import sources, windows

    rows = spark.range(40).select(
        F.concat(F.lit("e"), (F.col("id") % 2).cast("string")).alias("image_id"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
        F.col("id").cast("double").alias("v"),
    )
    tbl = str(tmp_path / "blocks")
    windows.merge_append_into_blocks_table(
        spark, rows, tbl, "v", shift=4, n_buckets=4
    )
    meta = sources._read_table_meta(tbl)
    assert meta["shift"] == 4
    assert meta["feature_cols"] == ["v"]

    later = spark.range(8).select(
        F.lit("e0").alias("image_id"),
        F.timestamp_seconds(F.lit(1_700_000_100) + F.col("id")).alias("ts"),
        F.col("id").cast("double").alias("v"),
    )
    with _pytest.raises(ValueError, match="shift"):
        windows.merge_append_into_blocks_table(
            spark, later, tbl, "v", shift=5, n_buckets=4
        )
    with _pytest.raises(ValueError, match="feature_cols"):
        windows.merge_append_into_blocks_table(
            spark, later, tbl, "w", shift=4, n_buckets=4
        )
    # the matching contract still merges
    windows.merge_append_into_blocks_table(
        spark, later, tbl, "v", shift=4, n_buckets=4, on_late="drop"
    )


def test_rewrites_preserve_entity_stats_sidecar(spark, tmp_path):
    """r7 (ADVICE): compact_table and zorder_table must carry the
    _entity_stats sidecar through their tmp/swap rewrite (its content
    is layout-independent), and compaction sizing must not count the
    sidecar's parquet files."""
    import os

    import pyspark.sql.functions as F

    from gfwspark import layout, sources

    rows = spark.range(200).select(
        F.concat(F.lit("e"), (F.col("id") % 5).cast("string")).alias("image_id"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
        F.col("id").cast("double").alias("value"),
    )
    p = str(tmp_path / "tbl")
    rows.repartition(8).write.parquet(p)
    layout.write_entity_stats(layout.collect_entity_stats(rows), p)
    before = layout.read_entity_stats(spark, p).toPandas().sort_values(
        "image_id").reset_index(drop=True)

    r = sources.compact_table(spark, p, target_mb=1024)
    # sidecar survived the swap and its files never counted as data
    assert os.path.isdir(os.path.join(p, "_entity_stats"))
    after = layout.read_entity_stats(spark, p).toPandas().sort_values(
        "image_id").reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(before, after)
    data_files = 0
    for root, dirs, files in os.walk(p):
        dirs[:] = [d for d in dirs if "=" in d or not d.startswith(("_", "."))]
        data_files += sum(f.endswith(".parquet") for f in files)
    assert r["files_after"] == data_files

    layout.zorder_table(
        sources.read_table(spark, p), p, ["value"], bits=2, n_files=2
    )
    assert os.path.isdir(os.path.join(p, "_entity_stats"))
    after_z = layout.read_entity_stats(spark, p).toPandas().sort_values(
        "image_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after_z)
