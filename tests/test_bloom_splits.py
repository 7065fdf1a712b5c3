"""Bloom-filter join pruning (gfwspark/bloom.py) and the leakage-free
temporal split (sources.temporal_split_embargo)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from gfwspark import bloom, sources


@pytest.fixture()
def facts_keys(spark):
    facts = spark.range(100_000).select(
        (F.col("id") % 10_007).alias("k"), F.col("id").alias("v")
    )
    keys = spark.range(300).select((F.col("id") * 31).alias("k"))
    return facts, keys


def test_bloom_semi_join_exact(spark, facts_keys):
    """Output == plain left_semi join, bit for bit (the final exact
    join removes any Bloom false positives)."""
    facts, keys = facts_keys
    got = (
        bloom.bloom_semi_join(facts, keys, "k")
        .toPandas().sort_values(["k", "v"]).reset_index(drop=True)
    )
    want = (
        facts.join(keys.distinct(), "k", "left_semi")
        .toPandas().sort_values(["k", "v"]).reset_index(drop=True)
    )
    assert got.equals(want)


def test_bloom_semi_join_exact_string_keys(spark, facts_keys):
    facts, keys = facts_keys
    fs = facts.select(F.concat(F.lit("id_"), "k").alias("k"), "v")
    ks = keys.select(F.concat(F.lit("id_"), "k").alias("k"))
    got = bloom.bloom_semi_join(fs, ks, "k").toPandas()
    want = fs.join(ks.distinct(), "k", "left_semi").toPandas()
    key = ["k", "v"]
    assert (
        got.sort_values(key).reset_index(drop=True)
        .equals(want.sort_values(key).reset_index(drop=True))
    )


def test_bloom_prefilter_prunes_before_shuffle(spark, facts_keys):
    """The point of the sketch: the map-side pre-filter alone passes a
    superset of the true members that is a small fraction of the fact
    table — rows the shuffle never has to move."""
    facts, keys = facts_keys
    bm = bloom.bloom_bitmap(keys, "k")
    passed = facts.filter(
        bloom.bloom_might_contain(F.col("k"), bm, 1 << 19)
    ).count()
    exact = facts.join(keys.distinct(), "k", "left_semi").count()
    assert exact <= passed  # no false negatives, ever
    assert passed < facts.count() * 0.05  # >95% pruned at the scan


def test_bloom_false_positives_are_removed(spark, facts_keys):
    """A deliberately tiny bitmap (128 bits for 300 keys) saturates and
    passes many non-members — the exact join must still produce the
    plain semi-join result."""
    facts, keys = facts_keys
    m = 128
    bm = bloom.bloom_bitmap(keys, "k", m_bits=m, n_hashes=2)
    passed = facts.filter(
        bloom.bloom_might_contain(F.col("k"), bm, m, n_hashes=2)
    ).count()
    exact = facts.join(keys.distinct(), "k", "left_semi").count()
    assert passed > exact  # the sketch really is saturated
    got = bloom.bloom_semi_join(facts, keys, "k", m_bits=m, n_hashes=2).count()
    assert got == exact


def test_bloom_filter_sits_below_the_exchange(spark, facts_keys):
    """Plan shape: the Bloom conjuncts (element_at probes) evaluate on
    the fact side BEFORE its Exchange — that ordering is the entire
    value of the operator at scale."""
    facts, keys = facts_keys
    plan = (
        bloom.bloom_semi_join(facts, keys, "k")
        ._jdf.queryExecution().executedPlan().toString()
    )
    probe = plan.find("element_at")
    assert probe != -1
    # every Exchange in the plan occurs after the probe text — the
    # filter is in the scan-side stage, not post-shuffle
    first_exchange = plan.find("Exchange")
    assert first_exchange == -1 or probe < first_exchange or "BroadcastExchange" in plan[:probe]


def test_bloom_rejects_bad_m_bits():
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom.bloom_bitmap(None, "k", m_bits=100)


def test_temporal_split_embargo_properties(spark):
    """Per entity: val == last horizon of the timeline, train ends at
    least `embargo` before the cutoff, the band in between is dropped,
    and embargo=0 keeps every row."""
    rows = []
    t0 = dt.datetime(2024, 1, 1)
    for e, n in (("a", 50), ("b", 7)):
        rows += [(e, t0 + dt.timedelta(hours=6 * i)) for i in range(n)]
    df = spark.createDataFrame(rows, "image_id string, ts timestamp")
    horizon, embargo = 2 * 86400, 86400
    out = sources.temporal_split_embargo(
        df, horizon_s=horizon, embargo_s=embargo
    ).toPandas()
    src = df.toPandas()
    for e, grp in out.groupby("image_id"):
        cutoff = src[src.image_id == e]["ts"].max() - dt.timedelta(seconds=horizon)
        val = grp[grp.split == "val"]["ts"]
        train = grp[grp.split == "train"]["ts"]
        assert (val > cutoff).all()
        assert (train <= cutoff - dt.timedelta(seconds=embargo)).all()
        n_band = (
            (src.image_id == e)
            & (src.ts > cutoff - dt.timedelta(seconds=embargo))
            & (src.ts <= cutoff)
        ).sum()
        assert len(grp) == (src.image_id == e).sum() - n_band
    # embargo 0: partition of the full input
    out0 = sources.temporal_split_embargo(df, horizon_s=horizon, embargo_s=0)
    assert out0.count() == df.count()


def test_temporal_split_short_series_all_val(spark):
    """A series shorter than the horizon is entirely validation (no
    training rows pre-date its cutoff) — the guard a fresh entity
    needs rather than an error."""
    df = spark.createDataFrame(
        [("x", dt.datetime(2024, 1, 1, h)) for h in range(5)],
        "image_id string, ts timestamp",
    )
    out = sources.temporal_split_embargo(df, horizon_s=86400, embargo_s=3600)
    got = out.toPandas()
    assert (got["split"] == "val").all() and len(got) == 5
