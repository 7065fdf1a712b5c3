"""Driver queries for the seeded training-window samplers (W4 + W3
random form) with full DuckDB oracles.

Both queries emit EXPLODED scalar rows (one row per window position)
rather than array columns, so the driver's value-hash compares scalar
cells.  The md5-based draw is the engine/oracle-shared construction
(see sampling._md5_draw) — both engines compute the identical start
index, so results are value-exact, not just statistically alike.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from gfwspark import sampling, tables
from gfwspark.queries import register

# ---------------------------------------------------------------------
# W4: range-anchored seeded windows (extract_n_random_fixed_points,
# reference feature_utilities.py:153-206)
# ---------------------------------------------------------------------

_W4_L, _W4_N, _W4_SEED = 8, 3, 42
_W4_RANGES = [
    ("2024-01-05 00:00:00", "2024-01-08 00:00:00"),
    ("2024-01-20 12:00:00", "2024-01-21 00:00:00"),
]

_W4_ORACLE = f"""
WITH facts AS (
  SELECT user_id, ts, value,
    cast(floor(epoch(ts)) AS bigint) AS ts_s,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rn
  FROM events
),
rngs(range_start, range_end) AS (VALUES
  (timestamp '{_W4_RANGES[0][0]}', timestamp '{_W4_RANGES[0][1]}'),
  (timestamp '{_W4_RANGES[1][0]}', timestamp '{_W4_RANGES[1][1]}')
),
per_range AS (
  SELECT f.user_id, r.range_start, r.range_end,
    count(*) AS n_rows,
    cast(sum(CASE WHEN f.ts < r.range_start THEN 1 ELSE 0 END) AS bigint) AS start_ndx,
    cast(sum(CASE WHEN f.ts <= r.range_end THEN 1 ELSE 0 END) AS bigint) AS end_ndx
  FROM facts f CROSS JOIN rngs r
  GROUP BY f.user_id, r.range_start, r.range_end
),
iv AS (
  SELECT user_id,
    greatest(0, start_ndx - {_W4_L} + 1) AS lo,
    least(n_rows - {_W4_L} + 1, end_ndx) AS hi
  FROM per_range WHERE n_rows >= {_W4_L}
),
cand AS (
  SELECT DISTINCT user_id, start_idx FROM (
    SELECT user_id, unnest(generate_series(lo, hi - 1)) AS start_idx
    FROM iv WHERE hi > lo
  )
),
candk AS (
  SELECT user_id, start_idx,
    row_number() OVER (PARTITION BY user_id ORDER BY start_idx) - 1 AS k,
    count(*) OVER (PARTITION BY user_id) AS n_cand
  FROM cand
),
draws AS (
  SELECT e.user_id, e.sample_idx, c.start_idx
  FROM (
    SELECT user_id, n_cand, unnest(generate_series(0, {_W4_N - 1})) AS sample_idx
    FROM (SELECT DISTINCT user_id, n_cand FROM candk)
  ) e
  JOIN candk c ON c.user_id = e.user_id AND c.k =
    cast(('0x' || substr(md5(concat_ws(':', e.user_id, e.sample_idx, {_W4_SEED})), 1, 8)) AS bigint)
      % e.n_cand
)
SELECT d.user_id, d.sample_idx, d.start_idx,
  f.rn - d.start_idx AS pos, f.ts_s, f.value AS feature,
  min(f.ts_s) OVER (PARTITION BY d.user_id, d.sample_idx) AS win_start_s,
  max(f.ts_s) OVER (PARTITION BY d.user_id, d.sample_idx) AS win_end_s
FROM draws d
JOIN facts f ON f.user_id = d.user_id
  AND f.rn >= d.start_idx AND f.rn < d.start_idx + {_W4_L}
"""


@register("range_anchored_windows", _W4_ORACLE)
def q_range_anchored(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load_table(spark, sf_dir, "events")
    ranges = spark.createDataFrame(
        _W4_RANGES, "range_start string, range_end string"
    ).select(
        F.col("range_start").cast("timestamp"), F.col("range_end").cast("timestamp")
    )
    w = sampling.range_anchored_windows(
        ev,
        ranges,
        n=_W4_N,
        output_length=_W4_L,
        seed=_W4_SEED,
        order_tiebreak="event_id",
    )
    z = F.arrays_zip(F.col("timestamps_s").alias("ts_s"), F.col("features").alias("v"))
    return w.select(
        "user_id",
        F.col("sample_idx").cast("long").alias("sample_idx"),
        "start_idx",
        F.posexplode(z).alias("pos", "e"),
        "win_start_s",
        "win_end_s",
    ).select(
        "user_id",
        "sample_idx",
        "start_idx",
        F.col("pos").cast("long").alias("pos"),
        F.col("e.ts_s").alias("ts_s"),
        F.col("e.v").alias("feature"),
        "win_start_s",
        "win_end_s",
    )


# ---------------------------------------------------------------------
# W3 random form: seeded fixed-duration window sampling
# (extract_n_random_fixed_times, reference feature_utilities.py:246-294)
# ---------------------------------------------------------------------

_W3_L, _W3_M, _W3_N, _W3_DELTA, _W3_SEED = 60, 5, 4, 86400, 7

_W3_ORACLE = f"""
WITH facts AS (
  SELECT user_id, value,
    cast(floor(epoch(ts)) AS bigint) AS s,
    row_number() OVER (PARTITION BY user_id
                       ORDER BY cast(floor(epoch(ts)) AS bigint), event_id) - 1 AS rn,
    row_number() OVER (PARTITION BY user_id
                       ORDER BY cast(floor(epoch(ts)) AS bigint) DESC, event_id DESC) AS rnd
  FROM events
),
bounds AS (
  SELECT user_id, count(*) AS n_rows, min(s) AS ts0, max(s) AS tslast,
    max(CASE WHEN rnd = {_W3_M} THEN s END) AS ts_maxndx
  FROM facts GROUP BY user_id HAVING count(*) >= {_W3_M}
),
lims AS (
  SELECT user_id, n_rows,
    ts0 - ({_W3_L} - {_W3_M}) AS min_time,
    least(ts_maxndx, tslast - {_W3_DELTA}) AS max_time
  FROM bounds
  WHERE least(ts_maxndx, tslast - {_W3_DELTA}) >= ts0 - ({_W3_L} - {_W3_M})
),
draws AS (
  SELECT user_id, n_rows, sample_idx,
    min_time + cast(('0x' || substr(md5(concat_ws(':', user_id, sample_idx, {_W3_SEED})), 1, 8)) AS bigint)
      % (max_time - min_time + 1) AS start_time_s
  FROM (SELECT *, unnest(generate_series(0, {_W3_N - 1})) AS sample_idx FROM lims)
),
sidx AS (
  SELECT d.user_id, d.sample_idx, d.start_time_s, d.n_rows,
    cast(sum(CASE WHEN f.s < d.start_time_s THEN 1 ELSE 0 END) AS bigint) AS start_idx
  FROM draws d JOIN facts f USING (user_id)
  GROUP BY d.user_id, d.sample_idx, d.start_time_s, d.n_rows
),
winmeta AS (
  SELECT user_id, sample_idx, start_time_s, start_idx,
    least(n_rows - start_idx, {_W3_L}) AS n_real
  FROM sidx
),
posgrid AS (
  SELECT *, unnest(generate_series(0, {_W3_L - 1})) AS pos FROM winmeta
)
SELECT p.user_id, p.sample_idx, p.start_time_s, p.start_idx, p.n_real, p.pos,
  f.s AS ts_s, f.value AS feature
FROM posgrid p
JOIN facts f ON f.user_id = p.user_id
  AND f.rn = p.start_idx + (p.pos % p.n_real)
"""


@register("sampled_time_windows", _W3_ORACLE)
def q_sampled_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load_table(spark, sf_dir, "events")
    w = sampling.sampled_time_windows(
        ev,
        n=_W3_N,
        max_time_delta=_W3_DELTA,
        output_length=_W3_L,
        min_timeslice_size=_W3_M,
        seed=_W3_SEED,
        order_tiebreak="event_id",
    )
    z = F.arrays_zip(F.col("timestamps_s").alias("ts_s"), F.col("features").alias("v"))
    return w.select(
        "user_id",
        F.col("sample_idx").cast("long").alias("sample_idx"),
        "start_time_s",
        "start_idx",
        F.col("n_real").cast("long").alias("n_real"),
        F.posexplode(z).alias("pos", "e"),
    ).select(
        "user_id",
        "sample_idx",
        "start_time_s",
        "start_idx",
        "n_real",
        F.col("pos").cast("long").alias("pos"),
        F.col("e.ts_s").alias("ts_s"),
        F.col("e.v").alias("feature"),
    )


# ---------------------------------------------------------------------
# Inference-time per-range window extraction
# (np_array_extract_slices_for_time_ranges, feature_utilities.py:296-345;
# drives the monthly scoring grid of run_inference.py:50-73)
# ---------------------------------------------------------------------

_RFW_W, _RFW_MIN = 24, 5
_RFW_RANGES = [
    ("2024-01-03 00:00:00", "2024-01-10 00:00:00"),   # typically > W points
    ("2024-01-20 00:00:00", "2024-01-20 06:00:00"),   # often < min_points
    ("2034-01-01 00:00:00", "2034-02-01 00:00:00"),   # empty -> dropped
]
_RFW_VALUES = ", ".join(
    f"(timestamp '{a}', timestamp '{b}')" for a, b in _RFW_RANGES
)

_RFW_ORACLE = f"""
WITH rngs(rs, re) AS (VALUES {_RFW_VALUES}),
rows_ AS (
  SELECT e.user_id, e.ts, e.value, r.rs, r.re,
    row_number() OVER (PARTITION BY e.user_id, r.rs, r.re
                       ORDER BY e.ts, e.event_id) - 1 AS idx
  FROM events e JOIN rngs r ON e.ts >= r.rs AND e.ts < r.re
),
meta AS (
  SELECT user_id, rs, re, count(*) AS n,
    greatest(0, count(*) - {_RFW_W}) AS off,
    least(count(*), {_RFW_W}) AS c
  FROM rows_ GROUP BY user_id, rs, re
  HAVING count(*) >= {_RFW_MIN}
),
posg AS (
  SELECT *, unnest(generate_series(0, {_RFW_W - 1})) AS pos FROM meta
)
SELECT p.user_id, p.rs AS range_start, p.re AS range_end,
  p.n AS n_in_range, cast(p.pos AS int) AS pos,
  cast(floor(epoch(r.ts)) AS bigint) AS ts_s, r.value AS feature
FROM posg p
JOIN rows_ r ON r.user_id = p.user_id AND r.rs = p.rs AND r.re = p.re
  AND r.idx = p.off + (p.pos % p.c)
"""


@register("range_feature_windows", _RFW_ORACLE)
def q_range_feature_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load_table(spark, sf_dir, "events")
    ranges = spark.createDataFrame(
        _RFW_RANGES, "range_start string, range_end string"
    ).select(
        F.col("range_start").cast("timestamp"), F.col("range_end").cast("timestamp")
    )
    w = sampling.range_feature_windows(
        ev, ranges, window_size=_RFW_W, min_points=_RFW_MIN,
        order_tiebreak="event_id",
    )
    return w.select(
        "user_id", "range_start", "range_end", "n_in_range",
        F.col("pos").cast("int").alias("pos"), "ts_s", "feature",
    )
