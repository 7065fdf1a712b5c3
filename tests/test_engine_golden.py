"""Golden-vector parity: engine operators vs the numpy oracle on the
synthetic image_caption table (FIXTURES.md §4), plus the temporal-
leakage invariant."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from gfwspark import asof, features, oracle, sessionize, tables, windows

N_ENTITIES = 20
SEED = 42


@pytest.fixture(scope="module")
def img_pdf(spark):
    df = tables.synthesize_image_caption(spark, n_entities=N_ENTITIES, rows_per_entity=12, seed=SEED)
    return df.drop("bytes").toPandas()


@pytest.fixture(scope="module")
def img_df(spark, img_pdf):
    return spark.createDataFrame(img_pdf)


@pytest.fixture(scope="module")
def ann_df(spark):
    return tables.synthesize_annotations(spark, n_entities=N_ENTITIES, seed=SEED)


def test_synthesis_is_deterministic(spark, img_pdf):
    again = (
        tables.synthesize_image_caption(
            spark, n_entities=N_ENTITIES, rows_per_entity=12, seed=SEED, n_partitions=3
        )
        .drop("bytes")
        .toPandas()
    )
    a = img_pdf.sort_values(["image_id", "ts"]).reset_index(drop=True)
    b = again.sort_values(["image_id", "ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_entity_skew_present(img_pdf):
    counts = img_pdf.groupby("image_id").size()
    assert counts.loc["img_000000"] == counts.max()
    assert counts.loc["img_000001"] == 3  # short series → repeat-pad path


def test_sliding_agg_matches_oracle(img_df, img_pdf):
    out = (
        windows.with_sliding_agg(img_df, "phash", window_size=4, aggs=("avg",), prefix="ph")
        .select("image_id", "ts", "ph_avg")
        .toPandas()
        .sort_values(["image_id", "ts"])
    )
    for eid, grp in img_pdf.groupby("image_id"):
        grp = grp.sort_values("ts")
        want = oracle.sliding_mean(grp["phash"].to_numpy(dtype=np.float64), 4)
        got = out[out.image_id == eid]["ph_avg"].to_numpy()
        assert np.allclose(got, want, equal_nan=True), eid


def test_session_ids_match_oracle(img_df, img_pdf):
    out = (
        sessionize.with_session_id(img_df, gap_seconds=3600)
        .select("image_id", "ts", "session_id")
        .toPandas()
        .sort_values(["image_id", "ts"])
    )
    for eid, grp in img_pdf.groupby("image_id"):
        ts_us = grp.sort_values("ts")["ts"].astype("int64").to_numpy() // 1000
        want = oracle.session_ids(ts_us, gap_us=3600 * 1_000_000)
        got = out[out.image_id == eid]["session_id"].to_numpy()
        assert np.array_equal(got, want), eid


def test_asof_union_matches_oracle(img_df, ann_df, img_pdf):
    ann_pdf = ann_df.toPandas()
    ann1 = ann_df.groupBy("image_id", "start_ts").agg(F.max("value").alias("value"))
    out = (
        asof.asof_join_union(img_df, ann1, value_cols=("value",))
        .select("image_id", "ts", "asof_value")
        .toPandas()
        .sort_values(["image_id", "ts"])
    )
    ann_pdf = ann_pdf.groupby(["image_id", "start_ts"], as_index=False)["value"].max()
    for eid, grp in img_pdf.groupby("image_id"):
        grp = grp.sort_values("ts")
        a = ann_pdf[ann_pdf.image_id == eid]
        want = oracle.asof_backward(
            grp["ts"].astype("int64").to_numpy(),
            a["start_ts"].astype("int64").to_numpy(),
            a["value"].to_numpy(dtype=np.float64),
        )
        got = out[out.image_id == eid]["asof_value"].to_numpy(dtype=np.float64)
        assert np.allclose(got, want, equal_nan=True), eid


def test_asof_cogroup_equals_union(img_df, ann_df):
    ann1 = ann_df.groupBy("image_id", "start_ts").agg(F.max("value").alias("value"))
    small = img_df.select("image_id", "ts", "phash")
    a = (
        asof.asof_join_union(small, ann1, value_cols=("value",))
        .toPandas().sort_values(["image_id", "ts"]).reset_index(drop=True)
    )
    b = (
        asof.asof_join_cogroup(small, ann1, value_cols=("value",))
        .toPandas().sort_values(["image_id", "ts"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_interval_labels_match_oracle(img_df, ann_df, img_pdf):
    out = (
        asof.interval_label_join(img_df.select("image_id", "ts"), ann_df)
        .toPandas()
        .sort_values(["image_id", "ts"])
    )
    ann_pdf = ann_df.toPandas()
    for eid, grp in img_pdf.groupby("image_id"):
        grp = grp.sort_values("ts")
        a = ann_pdf[ann_pdf.image_id == eid]
        want = oracle.dense_interval_labels(
            grp["ts"].astype("int64").to_numpy(),
            a["start_ts"].astype("int64").to_numpy(),
            a["end_ts"].astype("int64").to_numpy(),
            a["value"].to_numpy(dtype=np.float64),
        )
        got = out[out.image_id == eid]["label"].to_numpy(dtype=np.float64)
        assert np.allclose(got, want), eid


def test_interval_labels_no_annotations_default(img_df, ann_df):
    """Entities with no annotations (eidx%7==3) are fully -1 — the
    reference's zero-window/out-of-range case."""
    out = asof.interval_label_join(img_df.select("image_id", "ts"), ann_df)
    bad = out.filter(
        (F.col("image_id") == "img_000003") & (F.col("label") != -1.0)
    ).count()
    assert bad == 0


def test_repeat_pad_matches_oracle(img_df, img_pdf):
    out = windows.repeat_pad_windows(img_df, ["phash", "w"], window_size=16).toPandas()
    assert (out["features"].apply(len) == 16).all()
    for _, row in out.iterrows():
        grp = img_pdf[img_pdf.image_id == row.image_id].sort_values("ts")
        mat = grp[["phash", "w"]].to_numpy(dtype=np.float64)
        want = oracle.repeat_pad(mat, 16)
        got = np.array([list(r) for r in row.features])
        assert np.allclose(got, want), row.image_id


def test_sliding_feature_windows_geometry(img_df, img_pdf):
    out = windows.sliding_feature_windows(
        img_df, "phash", window_size=8, shift=3
    ).toPandas()
    for eid, grp in img_pdf.groupby("image_id"):
        n = len(grp)
        want_slices = oracle.sliding_slices(n, 8, 3)
        got = out[out.image_id == eid].sort_values("win_end_ts")
        assert len(got) == len(want_slices), eid
        grp = grp.sort_values("ts").reset_index(drop=True)
        for (s, e), (_, row) in zip(want_slices, got.iterrows()):
            assert row.n_points == 8
            want_feat = grp["phash"].iloc[s:e].to_numpy(dtype=np.float64)
            assert np.allclose(np.array(row.features, dtype=np.float64), want_feat)


def test_zero_temporal_leakage(spark, img_df, ann_df, img_pdf):
    """Every feature at ts must be identical when all rows with ts' > ts
    are dropped (SURVEY.md §5(d))."""
    cutoff = img_pdf["ts"].quantile(0.6)
    full = features.featurize(img_df, ann_df.groupBy("image_id", "start_ts").agg(
        F.max("value").alias("label")), window_size=4)
    trunc_img = img_df.filter(F.col("ts") <= F.lit(cutoff))
    trunc_ann = ann_df.filter(F.col("start_ts") <= F.lit(cutoff))
    trunc = features.featurize(trunc_img, trunc_ann.groupBy("image_id", "start_ts").agg(
        F.max("value").alias("label")), window_size=4)

    cols = ["image_id", "ts", "phash_hamming", "ham_w_avg", "session_id", "asof_label"]
    a = (
        full.filter(F.col("ts") <= F.lit(cutoff)).select(*cols)
        .toPandas().sort_values(["image_id", "ts"]).reset_index(drop=True)
    )
    b = trunc.select(*cols).toPandas().sort_values(["image_id", "ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_aligned_windows_match_oracle(img_df, img_pdf):
    start = img_pdf["ts"].quantile(0.2)
    end = img_pdf["ts"].quantile(0.8)
    out = windows.aligned_windows(
        img_df, ["phash", "w"], window_size=6, shift=2, start_ts=start, end_ts=end
    ).toPandas()
    for eid, grp in img_pdf.groupby("image_id"):
        grp = grp.sort_values("ts")
        sel = grp[(grp.ts >= start) & (grp.ts <= end)]
        want = oracle.aligned_windows_np(
            sel[["phash", "w"]].to_numpy(dtype=np.float64), 6, 2
        )
        got = out[out.image_id == eid].sort_values("win_idx")
        assert len(got) == len(want), eid
        for (_, row), w_mat in zip(got.iterrows(), want):
            assert np.allclose(np.array([list(r) for r in row.features]), w_mat)
        if len(sel) == 0:
            assert len(got) == 0  # zero-window case


def test_ffill_matches_oracle(spark, img_df, img_pdf):
    import pyspark.sql.functions as F

    # knock out some values deterministically, then forward-fill
    holey = img_df.withColumn(
        "v", F.when(F.col("w") % 3 == 0, F.lit(None).cast("double")).otherwise(F.col("w").cast("double"))
    )
    out = (
        windows.with_ffill(holey, ["v"])
        .select("image_id", "ts", "v", "v_ffill")
        .toPandas()
        .sort_values(["image_id", "ts"])
    )
    for eid, grp in out.groupby("image_id"):
        want = oracle.ffill(grp["v"].to_numpy(dtype=np.float64))
        got = grp["v_ffill"].to_numpy(dtype=np.float64)
        assert np.allclose(got, want, equal_nan=True), eid


def test_asof_broadcast_equals_union(img_df, ann_df):
    ann1 = ann_df.groupBy("image_id", "start_ts").agg(F.max("value").alias("value"))
    small = img_df.select("image_id", "ts", "phash")
    a = (
        asof.asof_join_union(small, ann1, value_cols=("value",))
        .toPandas().sort_values(["image_id", "ts"]).reset_index(drop=True)
    )
    b = (
        asof.asof_join_broadcast(small, ann1, value_col="value")
        .toPandas().sort_values(["image_id", "ts"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_chunked_time_range_agg_equals_window(spark, img_df):
    """Hot-entity chunked kernel == plain rangeBetween window (exact),
    while spreading each entity over multiple parallel chunks."""
    plain = (
        windows.with_time_range_agg(
            img_df.select("image_id", "ts", "phash"), "phash",
            duration_s=1800, prefix="p",
        )
        .toPandas().sort_values(["image_id", "ts"]).reset_index(drop=True)
    )
    chunked = (
        windows.chunked_time_range_agg(
            img_df.select("image_id", "ts", "phash"), "phash",
            duration_s=1800, chunk_s=3600, prefix="p",
        )
        .toPandas().sort_values(["image_id", "ts"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        plain[["image_id", "ts", "p_cnt", "p_min", "p_max"]],
        chunked[["image_id", "ts", "p_cnt", "p_min", "p_max"]],
        check_dtype=False,
    )
    # the hot entity really is split across chunks (parallel tasks)
    from gfwspark.util import epoch_us
    n_chunks = (
        img_df.filter(F.col("image_id") == "img_000000")
        .select(F.floor(epoch_us("ts") / (3600 * 1_000_000)).alias("c"))
        .distinct().count()
    )
    assert n_chunks > 1


def test_chunked_time_range_agg_duplicate_ts(spark):
    """RANGE BETWEEN includes ALL equal-ts peers — even ones that sort
    after the current row.  The chunked kernel must agree on a fixture
    with duplicate timestamps (including a run straddling nothing but
    sharing one instant)."""
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    # entity A: three rows at the SAME instant with different values,
    # plus neighbors inside/outside the 1800 s lookback
    for off_s, val in [(0, 5.0), (1000, 1.0), (1000, 9.0), (1000, 4.0),
                       (2000, 2.0), (4000, 7.0), (4000, 3.0)]:
        rows.append(("A", base + pd.Timedelta(seconds=off_s), val))
    # entity B: duplicate instants right at a chunk boundary (3600 s)
    for off_s, val in [(3599, 1.0), (3600, 8.0), (3600, 2.0), (5000, 6.0)]:
        rows.append(("B", base + pd.Timedelta(seconds=off_s), val))
    pdf = pd.DataFrame(rows, columns=["image_id", "ts", "phash"])
    df = spark.createDataFrame(pdf)

    def norm(out):
        return (
            out.toPandas()
            .sort_values(["image_id", "ts", "phash"], kind="mergesort")
            .reset_index(drop=True)
        )

    plain = norm(windows.with_time_range_agg(df, "phash", duration_s=1800, prefix="p"))
    chunked = norm(
        windows.chunked_time_range_agg(df, "phash", duration_s=1800, chunk_s=3600, prefix="p")
    )
    cols = ["image_id", "ts", "phash", "p_cnt", "p_min", "p_max"]
    pd.testing.assert_frame_equal(plain[cols], chunked[cols], check_dtype=False)
    # equal-ts peers after the row ARE included: every row at +1000 s
    # sees all three peer values {1, 9, 4} plus the 0 s row
    at_1000 = plain[(plain.image_id == "A") & (plain.ts == base + pd.Timedelta(seconds=1000))]
    assert (at_1000.p_cnt == 4).all() and (at_1000.p_max == 9.0).all()
