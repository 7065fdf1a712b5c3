"""Streaming mirrors converge to batch results when replayed with
availableNow (the reference's re-run-batch-windows model, §2.10)."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pytest

from gfwspark import sessionize, streaming, tables


@pytest.fixture(scope="module")
def parquet_input(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream") / "img")
    df = tables.synthesize_image_caption(spark, n_entities=10, rows_per_entity=10)
    df = df.select("image_id", F.col("ts").cast("timestamp").alias("ts"), "phash", "w")
    df.write.mode("overwrite").parquet(path)
    return path


def _run_stream(spark, df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if name in ("ham", "slmean", "asoflbl") else "complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {name}")


def test_stream_sessionize_matches_batch(spark, parquet_input):
    batch_df = spark.read.parquet(parquet_input)
    stream_df = spark.readStream.schema(batch_df.schema).parquet(parquet_input)

    got = _run_stream(
        spark,
        streaming.stream_sessionize(stream_df, gap="1 hour", value_col="w"),
        "sess",
    ).toPandas()

    want = (
        sessionize.session_stats(batch_df, "w", gap_seconds=3600)
        .toPandas()
    )
    # session_window end = last_ts + gap; compare on (entity, start, n)
    a = got[["image_id", "session_start", "n_points"]].sort_values(
        ["image_id", "session_start"]).reset_index(drop=True)
    b = want.rename(columns={"session_start": "session_start", "n_points": "n_points"})[
        ["image_id", "session_start", "n_points"]
    ].sort_values(["image_id", "session_start"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_stream_tumbling_counts(spark, parquet_input):
    batch_df = spark.read.parquet(parquet_input)
    stream_df = spark.readStream.schema(batch_df.schema).parquet(parquet_input)
    got = _run_stream(
        spark,
        streaming.stream_tumbling(stream_df, "w", duration="1 day", entity="image_id"),
        "tumb",
    ).toPandas()
    assert got["n"].sum() == batch_df.count()


def test_stream_hamming_state_matches_batch_lag(spark, parquet_input):
    from pyspark.sql import Window

    batch_df = spark.read.parquet(parquet_input)
    stream_df = spark.readStream.schema(batch_df.schema).parquet(parquet_input)
    got = _run_stream(
        spark, streaming.stream_hamming_state(stream_df), "ham"
    ).toPandas().sort_values(["image_id", "ts"]).reset_index(drop=True)

    w = Window.partitionBy("image_id").orderBy("ts")
    want = (
        batch_df.withColumn(
            "phash_hamming",
            F.bit_count(F.col("phash").bitwiseXOR(F.lag("phash").over(w))).cast("int"),
        )
        .select("image_id", "ts", "phash", "phash_hamming")
        .toPandas()
        .sort_values(["image_id", "ts"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["image_id", "phash", "phash_hamming"]],
        want[["image_id", "phash", "phash_hamming"]],
        check_dtype=False,
    )


def test_stream_dedup_exact_keeps_one_per_hash(spark, tmp_path):
    """Planted duplicate texts collapse to one row per content hash
    through the streaming dedup (availableNow replay)."""
    import pandas as pd

    from gfwspark import streaming

    base = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": ["aa", "bb", "aa", "cc", "bb"],
            "ts": [base + pd.Timedelta(minutes=k) for k in range(5)],
        }
    )
    src = str(tmp_path / "src")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("doc_id long, text string, ts timestamp").parquet(src)
    out = streaming.stream_dedup_exact(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT text, count(*) n FROM dedup_stream GROUP BY text").toPandas()
    assert set(got["text"]) == {"aa", "bb", "cc"}
    assert (got["n"] == 1).all()


def test_stream_sliding_mean_matches_batch(spark, parquet_input):
    """Bounded-state trailing mean (state = last W-1 values) equals the
    batch rowsBetween average at every entity x timestamp."""
    from gfwspark import windows

    batch_df = spark.read.parquet(parquet_input).withColumn(
        "v", F.col("phash").cast("double")
    )
    stream_df = spark.readStream.schema(batch_df.schema).parquet(parquet_input)
    got = (
        _run_stream(
            spark,
            streaming.stream_sliding_mean(
                stream_df.withColumn("v", F.col("phash").cast("double")),
                window_size=5,
            ),
            "slmean",
        )
        .toPandas().sort_values(["image_id", "ts"]).reset_index(drop=True)
    )
    want = (
        windows.with_sliding_agg(batch_df, "v", 5, aggs=("avg",), prefix="b")
        .select("image_id", "ts", F.col("b_avg"))
        .toPandas().sort_values(["image_id", "ts"]).reset_index(drop=True)
    )
    import numpy as np

    assert len(got) == len(want)
    assert np.allclose(got["v_w_avg"], want["b_avg"])


def test_stream_asof_label_matches_batch(spark, parquet_input):
    """Stream-static as-of converges to the batch broadcast strategy
    when the fact stream is replayed with availableNow."""
    from gfwspark import asof

    batch_df = spark.read.parquet(parquet_input)
    ann = (
        batch_df.groupBy("image_id")
        .agg(F.min("ts").alias("start_ts"))
        .select("image_id", "start_ts", F.lit("first").alias("label"))
    )
    stream_df = spark.readStream.schema(batch_df.schema).parquet(parquet_input)

    got = _run_stream(
        spark, streaming.stream_asof_label(stream_df, ann), "asoflbl"
    ).toPandas()
    want = asof.asof_join_broadcast(batch_df, ann).toPandas()

    key = ["image_id", "ts"]
    a = got.sort_values(key).reset_index(drop=True)[key + ["asof_label"]]
    b = want.sort_values(key).reset_index(drop=True)[key + ["asof_label"]]
    pd.testing.assert_frame_equal(a, b)
