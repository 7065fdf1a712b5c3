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


@settings(max_examples=15, deadline=None)
@given(
    ts=series_strategy(min_size=1, max_size=30),
    n=st.integers(min_value=1, max_value=4),
    L=st.integers(min_value=2, max_value=8),
    r0=st.integers(min_value=0, max_value=10_000),
    span=st.integers(min_value=1, max_value=200_000),
    seed=st.integers(min_value=0, max_value=99),
)
def test_range_anchored_windows_property(spark, ts, n, L, r0, span, seed):
    """W4 on arbitrary series/ranges == the numpy searchsorted oracle,
    including empty-candidate and straddling-window cases."""
    from gfwspark import sampling

    pdf = pd.DataFrame(
        {"image_id": "e0", "ts": pd.to_datetime(ts, unit="s"), "v": np.arange(len(ts), dtype=np.float64)}
    )
    df = spark.createDataFrame(pdf)
    ranges = spark.createDataFrame(
        pd.DataFrame({"range_start": [pd.Timestamp(r0, unit="s")],
                      "range_end": [pd.Timestamp(r0 + span, unit="s")]})
    )
    got = (
        sampling.range_anchored_windows(
            df, ranges, n=n, output_length=L, seed=seed,
            entity="image_id", ts="ts", value_col="v",
        )
        .toPandas().sort_values("sample_idx").reset_index(drop=True)
    )
    ts_us = ts * 1_000_000
    starts = oracle.range_anchored_starts(
        ts_us, [(r0 * 1_000_000, (r0 + span) * 1_000_000)], n, L, "e0", seed
    )
    assert len(got) == len(starts)
    for i, s in enumerate(starts):
        assert got.loc[i, "start_idx"] == s
        assert list(got.loc[i, "features"]) == list(np.arange(len(ts), dtype=np.float64)[s : s + L])


@settings(max_examples=15, deadline=None)
@given(
    ts=series_strategy(min_size=1, max_size=30),
    n=st.integers(min_value=1, max_value=3),
    L=st.integers(min_value=2, max_value=10),
    m=st.integers(min_value=1, max_value=5),
    delta=st.integers(min_value=1, max_value=5_000),
    seed=st.integers(min_value=0, max_value=99),
)
def test_sampled_time_windows_property(spark, ts, n, L, m, delta, seed):
    """W3 random form on arbitrary series == the numpy oracle, including
    the too-short / max_time < min_time empty cases and repeat-pad."""
    from gfwspark import sampling

    m = min(m, L)
    pdf = pd.DataFrame(
        {"image_id": "e0", "ts": pd.to_datetime(ts, unit="s"), "v": np.arange(len(ts), dtype=np.float64)}
    )
    df = spark.createDataFrame(pdf)
    got = (
        sampling.sampled_time_windows(
            df, n=n, max_time_delta=delta, output_length=L,
            min_timeslice_size=m, seed=seed,
            entity="image_id", ts="ts", value_col="v",
        )
        .toPandas().sort_values("sample_idx").reset_index(drop=True)
    )
    slices = oracle.sampled_time_slices(ts, n, delta, L, m, "e0", seed)
    assert len(got) == len(slices)
    vals = np.arange(len(ts), dtype=np.float64)
    for i, (start_time, start_idx, padded) in enumerate(slices):
        assert got.loc[i, "start_time_s"] == start_time
        assert got.loc[i, "start_idx"] == start_idx
        assert list(got.loc[i, "features"]) == list(vals[padded])


def test_samplers_partition_count_invariant(spark):
    """North-rule determinism: identical sampler output at 1 and 32
    input partitions."""
    from gfwspark import sampling, tables

    ev = tables.load_table(spark, "/root/testdata/sf0.001", "events")
    ranges = spark.createDataFrame(
        [("2024-01-05 00:00:00", "2024-01-20 00:00:00")],
        "range_start string, range_end string",
    ).select(F.col("range_start").cast("timestamp"), F.col("range_end").cast("timestamp"))

    def norm(df):
        return (
            df.toPandas()
            .sort_values(["user_id", "sample_idx"])
            .reset_index(drop=True)
            .astype(str)
        )

    a = norm(sampling.range_anchored_windows(ev.repartition(1), ranges, n=2, output_length=6, order_tiebreak="event_id"))
    b = norm(sampling.range_anchored_windows(ev.repartition(32), ranges, n=2, output_length=6, order_tiebreak="event_id"))
    pd.testing.assert_frame_equal(a, b)
    c = norm(sampling.sampled_time_windows(ev.repartition(1), n=2, max_time_delta=86400, output_length=12, min_timeslice_size=4, order_tiebreak="event_id"))
    d = norm(sampling.sampled_time_windows(ev.repartition(32), n=2, max_time_delta=86400, output_length=12, min_timeslice_size=4, order_tiebreak="event_id"))
    pd.testing.assert_frame_equal(c, d)


@settings(max_examples=10, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1, max_size=40,
    ).filter(lambda es: any(a != b for a, b in es)),
)
def test_dup_clusters_property(spark, edges):
    """Connected components on arbitrary random graphs == a plain
    union-find oracle (roots = min id per component)."""
    from gfwspark import dedup

    pairs = [(min(a, b), max(a, b)) for a, b in edges if a != b]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = dedup.dup_clusters(df).toPandas().set_index("doc_id")["cluster_root"]

    # union-find oracle
    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    assert dict(got) == want


@settings(max_examples=20, deadline=None)
@given(
    ts=series_strategy(min_size=1, max_size=30),
    W=st.integers(min_value=2, max_value=10),
    data=st.data(),
    bounds=st.tuples(
        st.one_of(st.none(), st.integers(min_value=0, max_value=350_000)),
        st.one_of(st.none(), st.integers(min_value=0, max_value=350_000)),
    ),
)
def test_aligned_windows_property(spark, ts, W, data, bounds):
    """W2 closed-form source-row index vs the reference-exact numpy
    oracle over random series, geometries (win_start included) and
    optional/None start/end bounds — the edge surface the fixed
    fixtures cannot sweep (all-before-start, all-after-end, empty
    span, exact-W spans, pure-padding windows)."""
    from gfwspark import windows

    shift = data.draw(st.integers(min_value=1, max_value=W - 1))
    b = data.draw(st.integers(min_value=0, max_value=W - shift - 1))
    start_s, end_s = bounds
    vals = np.arange(len(ts), dtype=np.float64)
    pdf = pd.DataFrame(
        {"image_id": "e0", "ts": pd.to_datetime(ts, unit="s"), "v": vals}
    )
    df = spark.createDataFrame(pdf)
    start = pd.Timestamp(start_s, unit="s") if start_s is not None else None
    end = pd.Timestamp(end_s, unit="s") if end_s is not None else None
    out = windows.aligned_windows(
        df, ["v"], window_size=W, shift=shift,
        start_ts=start, end_ts=end, win_start=b,
    ).toPandas()
    want = oracle.aligned_windows_np(
        ts.astype(np.int64),
        vals[:, None],
        W,
        shift,
        start=start_s,
        end=end_s,
        win_start=b,
    )
    assert out["win_idx"].nunique() == len(want)
    for k, w_mat in enumerate(want):
        g = out[out.win_idx == k].sort_values("pos")
        assert np.allclose(g["v"].to_numpy(), w_mat[:, 0]), (k, W, shift, b)


@settings(max_examples=15, deadline=None)
@given(
    ts=series_strategy(min_size=1, max_size=30),
    W=st.integers(min_value=1, max_value=12),
    nulls=st.lists(st.booleans(), min_size=30, max_size=30),
)
def test_sliding_agg_large_property(spark, ts, W, nulls):
    """O(n) running-sum-difference == naive bounded frame on random
    series WITH NULLS (null-aware count, sum/avg NULL on empty)."""
    from gfwspark import windows

    vals = [None if nulls[i] else float(i * 7 % 13) for i in range(len(ts))]
    pdf = pd.DataFrame(
        {"image_id": "e0", "ts": pd.to_datetime(ts, unit="s"), "v": vals}
    )
    df = spark.createDataFrame(pdf).withColumn("v", F.col("v").cast("double"))
    fast = (
        windows.with_sliding_agg_large(df, "v", W, prefix="p", with_var=True)
        .orderBy("ts").toPandas()
    )
    naive = (
        windows.with_sliding_agg(df, "v", W, aggs=("sum", "avg", "count"), prefix="q")
        .orderBy("ts").toPandas()
    )
    assert fast["p_cnt"].tolist() == naive["q_count"].tolist()
    assert np.allclose(
        fast["p_sum"].astype(float), naive["q_sum"].astype(float), equal_nan=True
    )
    assert np.allclose(
        fast["p_avg"].astype(float), naive["q_avg"].astype(float), equal_nan=True
    )
    # variance vs pandas rolling population variance
    s = pd.Series([np.nan if v is None else v for v in vals])
    want_var = s.rolling(W, min_periods=1).var(ddof=0).round(6)
    got_var = fast["p_var"].astype(float)
    assert np.allclose(got_var, want_var, equal_nan=True, atol=1e-6)


from hypothesis import HealthCheck


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.lists(
        st.integers(min_value=-(2**40), max_value=2**40),
        min_size=1, max_size=40, unique=True,
    ),
    extra=st.lists(
        st.integers(min_value=-(2**40), max_value=2**40),
        min_size=0, max_size=40,
    ),
)
def test_bloom_no_false_negatives_property(spark, keys, extra):
    """∀ key sets: every true member passes the Bloom pre-filter (false
    negatives are impossible by construction; false positives are the
    exact join's job) — even with a deliberately tiny, saturated
    bitmap."""
    from gfwspark import bloom

    kdf = spark.createDataFrame([(int(k),) for k in keys], "k long")
    facts = spark.createDataFrame(
        [(int(k),) for k in keys + extra], "k long"
    )
    bm = bloom.bloom_bitmap(kdf, "k", m_bits=1024, n_hashes=3)
    passed = {
        r["k"]
        for r in facts.filter(
            bloom.bloom_might_contain(F.col("k"), bm, 1024, 3)
        ).collect()
    }
    assert set(keys) <= passed
