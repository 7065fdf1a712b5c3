"""Property-based tests (hypothesis): engine kernels vs the numpy
oracle on arbitrary generated series — beyond the fixed fixtures."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from gfwspark import asof, oracle, sessionize

# strictly-increasing int64 second offsets (entity series invariant)
def series_strategy(min_size=1, max_size=40):
    return st.lists(
        st.integers(min_value=1, max_value=10_000), min_size=min_size, max_size=max_size
    ).map(lambda gaps: np.cumsum(np.array(gaps, dtype=np.int64)))


@settings(max_examples=25, deadline=None)
@given(ts=series_strategy(), gap=st.integers(min_value=1, max_value=5000))
def test_session_ids_property(spark, ts, gap):
    pdf = pd.DataFrame({
        "image_id": "e0",
        "ts": pd.to_datetime(ts * 1_000_000_000 // 1000, unit="us"),
    })
    df = spark.createDataFrame(pdf)
    got = (
        sessionize.with_session_id(df, gap_seconds=gap)
        .orderBy("ts").toPandas()["session_id"].to_numpy()
    )
    want = oracle.session_ids(ts * 1_000_000, gap_us=gap * 1_000_000)
    assert np.array_equal(got, want)


@settings(max_examples=25, deadline=None)
@given(
    ts=series_strategy(min_size=1, max_size=30),
    ann=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=300_000),
            st.floats(min_value=0, max_value=1, allow_nan=False),
        ),
        min_size=0, max_size=10,
    ),
)
def test_asof_union_property(spark, ts, ann):
    facts = spark.createDataFrame(pd.DataFrame({
        "image_id": "e0",
        "ts": pd.to_datetime(ts, unit="s"),
    }))
    if ann:
        # dedupe annotation starts (engine contract: unique (entity, start))
        dd = {}
        for s, v in ann:
            dd[s] = max(v, dd.get(s, -1.0))
        ann_pdf = pd.DataFrame({
            "image_id": "e0",
            "start_ts": pd.to_datetime(sorted(dd), unit="s"),
            "value": [dd[k] for k in sorted(dd)],
        })
    else:
        ann_pdf = pd.DataFrame({
            "image_id": pd.Series([], dtype="str"),
            "start_ts": pd.Series([], dtype="datetime64[us]"),
            "value": pd.Series([], dtype="float64"),
        })
    anns = spark.createDataFrame(
        ann_pdf, schema="image_id string, start_ts timestamp, value double"
    )
    got = (
        asof.asof_join_union(facts, anns, value_cols=("value",))
        .orderBy("ts").toPandas()["asof_value"].to_numpy(dtype=np.float64)
    )
    want = oracle.asof_backward(
        np.array(ts, dtype=np.int64),
        ann_pdf["start_ts"].astype("int64").to_numpy() // 10**9,
        ann_pdf["value"].to_numpy(dtype=np.float64),
    )
    assert np.allclose(got, want, equal_nan=True)


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=60),
    w=st.integers(min_value=1, max_value=20),
    shift=st.integers(min_value=1, max_value=10),
)
def test_sliding_slices_property(spark, n, w, shift):
    from gfwspark import windows

    pdf = pd.DataFrame({
        "image_id": "e0",
        "ts": pd.to_datetime(np.arange(1, n + 1) * 60, unit="s"),
        "v": np.arange(n, dtype=np.float64),
    })
    df = spark.createDataFrame(pdf)
    got = (
        windows.sliding_feature_windows(df, "v", window_size=w, shift=shift)
        .orderBy("win_end_ts").toPandas()
    )
    want = oracle.sliding_slices(n, w, shift)
    assert len(got) == len(want)
    for (s, e), (_, row) in zip(want, got.iterrows()):
        assert np.allclose(np.array(row.features), np.arange(s, e, dtype=np.float64))
