"""Seeded window sampling — the reference's training-data samplers.

Two operators the reference uses to draw training windows from each
entity's time series (`make_training_input_fn`,
reference classification/feature_generation/feature_utilities.py):

- W4 `range_anchored_windows` — extract_n_random_fixed_points
  (feature_utilities.py:153-206): candidate start INDICES are every
  position whose fixed-count window overlaps a label range
  (searchsorted(starts,'left') / searchsorted(ends,'right') shifted by
  the window length); n starts are drawn from the candidate set.
  Zero points in range -> zero windows
  (fishing_feature_generation_test.py:58-82).

- W3 random form `sampled_time_windows` — extract_n_random_fixed_times
  (feature_utilities.py:246-294): a random start TIME in
  [min_time, max_time] (bounds derived from output_length /
  min_timeslice_size / max_time_delta exactly as the reference),
  searchsorted slice of output_length points, repeat-pad short slices
  (np_pad_repeat_slice: out[k] = slice[k % len(slice)]).

Determinism: the reference draws from an UNSEEDED-ordering set /
RandomState; here every draw is a pure function of
(entity, sample_idx, seed) via a 32-bit md5 prefix — reproducible at
any partition count and expressible identically in DuckDB for the
oracle gate (same construction as the engine's token hash, see the
float-exactness policy in queries.py).

Spark-first: both operators are pure DataFrame ops (conditional-count
searchsorted, sequence/explode candidate enumeration, broadcast range
join, transform-modulo repeat-pad) — no Python UDF, whole plan stays
in codegen.  Per-entity sample fan-out is n rows, so the fact join
explodes each row at most n times; the heavy side shuffles ONCE on
the entity key.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from gfwspark.util import epoch_s


def _md5_draw(*cols) -> F.Column:
    """Deterministic 32-bit uniform draw over (entity, idx, seed) —
    the engine's shared cross-engine hash (text.token_hash32; DuckDB
    twin ('0x' || substr(md5(...), 1, 8))::BIGINT)."""
    from gfwspark.text import token_hash32

    return token_hash32(F.concat_ws(":", *cols))


def range_anchored_windows(
    df: DataFrame,
    ranges: DataFrame,
    n: int,
    output_length: int,
    seed: int = 42,
    entity: str = "user_id",
    ts: str = "ts",
    value_col: str = "value",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """W4: n seeded fixed-count windows per entity, anchored to ranges.

    `ranges` is a small dim (range_id, range_start, range_end) —
    broadcast.  Candidate starts for one range (0-based row index
    within the entity's ts-sorted series, reference
    feature_utilities.py:180-198):

        start_ndx = searchsorted(ts, range_start, 'left')
        end_ndx   = searchsorted(ts, range_end, 'right')
        [max(0, start_ndx - L + 1), min(n_rows - L + 1, end_ndx))

    i.e. every window of L points that contains at least one point in
    the range.  Candidates are the union over ranges; entities shorter
    than L or with an empty candidate set yield NO windows.  Draw i is
    candidate[md5(entity:i:seed) % n_candidates] over the SORTED
    candidate list (deterministic stand-in for the reference's
    random_state.choice over an unordered set).

    Output: one row per (entity, sample_idx) with the window's feature
    and epoch-second timestamp arrays plus [win_start_s, win_end_s] —
    the cook_features payload (feature_utilities.py:122-151).
    """
    L = output_length
    tiebreaks = [order_tiebreak] if order_tiebreak else []

    # --- searchsorted WITHOUT exploding facts x ranges ---------------
    # Interleave per-(entity, range) boundary rows into the fact stream
    # (the asof_join_union trick): a running count of fact rows at a
    # start boundary (sorted BEFORE equal-ts facts) is exactly
    # searchsorted(ts, start, 'left'); at an end boundary (sorted
    # AFTER) it is searchsorted(ts, end, 'right').  Facts shuffle ONCE
    # on entity; boundary rows are |entities| x |ranges| (tiny).  The
    # old shape — crossJoin(ranges) then conditional counts — shipped
    # |facts| x |ranges| rows into the aggregation, which at web scale
    # multiplies the biggest shuffle in the job by the range count.
    f = df.select(
        entity,
        F.col(ts).alias("_ts"),
        F.col(value_col).cast("double").alias("_val"),
        *tiebreaks,
    ).select(
        "*", F.lit(1).alias("_side"), F.lit(None).cast("string").alias("_rkey")
    )
    ents = df.select(entity).distinct()
    # _rkey must be a DETERMINISTIC function of the range row: it is
    # evaluated independently in the two union branches below, and a
    # nondeterministic id (monotonically_increasing_id) could disagree
    # between them under exchange-reuse loss / task retry, pairing a
    # start boundary with the wrong end.  Identical ranges sharing a
    # key is harmless (identical candidate intervals).
    rng = ranges.select(
        "range_start",
        "range_end",
        # null-safe key: concat_ws silently DROPS nulls, which would
        # collapse (NULL, x) and (x, NULL) into one key
        F.md5(
            F.concat(
                F.coalesce(F.col("range_start").cast("string"), F.lit("<null>")),
                F.lit("|"),
                F.coalesce(F.col("range_end").cast("string"), F.lit("<null>")),
            )
        ).alias("_rkey"),
    )
    bnd_pairs = ents.crossJoin(F.broadcast(rng))
    bnd = bnd_pairs.select(
        entity,
        F.col("range_start").alias("_ts"),
        F.lit(None).cast("double").alias("_val"),
        *[F.lit(None).cast(df.schema[c].dataType).alias(c) for c in tiebreaks],
        F.lit(0).alias("_side"),
        "_rkey",
    ).unionByName(
        bnd_pairs.select(
            entity,
            F.col("range_end").alias("_ts"),
            F.lit(None).cast("double").alias("_val"),
            *[F.lit(None).cast(df.schema[c].dataType).alias(c) for c in tiebreaks],
            F.lit(2).alias("_side"),
            "_rkey",
        )
    )
    order = [F.col("_ts").asc(), F.col("_side").asc()] + [
        F.col(c).asc() for c in tiebreaks
    ]
    wrun = (
        Window.partitionBy(entity)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy(entity)
    stream = (
        f.unionByName(bnd)
        .withColumn("_cnt", F.sum(F.when(F.col("_side") == 1, 1).otherwise(0)).over(wrun))
        .withColumn("_n_rows", F.sum(F.when(F.col("_side") == 1, 1).otherwise(0)).over(wall))
    )
    facts = stream.filter(F.col("_side") == 1).select(
        entity, "_ts", "_val", (F.col("_cnt") - 1).alias("_rn")
    )
    per_range = (
        stream.filter(F.col("_side") != 1)
        .groupBy(entity, "_rkey")
        .agg(
            F.max(F.when(F.col("_side") == 0, F.col("_cnt"))).alias("_start_ndx"),
            F.max(F.when(F.col("_side") == 2, F.col("_cnt"))).alias("_end_ndx"),
            F.max("_n_rows").alias("_n_rows"),
        )
        .filter(F.col("_n_rows") >= L)
        .select(
            entity,
            F.greatest(F.lit(0), F.col("_start_ndx") - L + 1).alias("_lo"),
            F.least(F.col("_n_rows") - L + 1, F.col("_end_ndx")).alias("_hi"),
        )
        .filter(F.col("_hi") > F.col("_lo"))
    )

    candidates = (
        per_range.select(
            entity, F.explode(F.sequence(F.col("_lo"), F.col("_hi") - 1)).alias("_start")
        )
        .distinct()
        .withColumn(
            "_k", F.row_number().over(Window.partitionBy(entity).orderBy("_start")) - 1
        )
        .withColumn("_n_cand", F.count(F.lit(1)).over(Window.partitionBy(entity)))
    )

    draws = (
        candidates.select(entity, "_n_cand")
        .distinct()
        .select(
            entity,
            "_n_cand",
            F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("sample_idx"),
        )
        .withColumn(
            "_k",
            _md5_draw(F.col(entity), F.col("sample_idx"), F.lit(seed))
            % F.col("_n_cand"),
        )
        .join(candidates.select(entity, "_k", "_start"), [entity, "_k"])
        .select(entity, "sample_idx", F.col("_start").alias("start_idx"))
    )

    # window materialization: entity equi-join + rn range filter; each
    # fact row joins at most n sample rows.  The draw side is
    # |entities| x n rows — broadcast keeps the fact stream map-side
    # (no re-shuffle of the checkpointed facts).
    win = facts.join(F.broadcast(draws), entity).filter(
        (F.col("_rn") >= F.col("start_idx")) & (F.col("_rn") < F.col("start_idx") + L)
    )
    arr = F.sort_array(
        F.collect_list(F.struct(F.col("_rn"), epoch_s("_ts").alias("_s"), F.col("_val")))
    )
    return (
        win.groupBy(entity, "sample_idx", "start_idx")
        .agg(arr.alias("_w"))
        .select(
            entity,
            "sample_idx",
            "start_idx",
            F.expr("transform(_w, r -> r._val)").alias("features"),
            F.expr("transform(_w, r -> r._s)").alias("timestamps_s"),
            F.expr("_w[0]._s").alias("win_start_s"),
            F.element_at(F.col("_w"), L).getField("_s").alias("win_end_s"),
        )
    )


def sampled_time_windows(
    df: DataFrame,
    n: int,
    max_time_delta: int,
    output_length: int,
    min_timeslice_size: int,
    seed: int = 42,
    entity: str = "user_id",
    ts: str = "ts",
    value_col: str = "value",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """W3 random form: n seeded fixed-TIME windows per entity.

    Start-time bounds exactly as the reference
    (feature_utilities.py:273-280, working in epoch seconds — note the
    reference's quirk of subtracting a POINT COUNT from a time):

        min_time = ts[0] - (output_length - min_timeslice_size)
        max_time = min(ts[n_rows - min_timeslice_size],
                       ts[-1] - max_time_delta)

    Entities with fewer than min_timeslice_size points, or
    max_time < min_time, yield NO windows.  Draw i starts at
    min_time + md5(entity:i:seed) % (max_time - min_time + 1); the
    slice is the output_length points from searchsorted(ts, start,
    'left'), repeat-padded to output_length
    (np_pad_repeat_slice: out[k] = slice[k % len]).

    Output: (entity, sample_idx, start_time_s, start_idx, n_real,
    features, timestamps_s, win_start_s, win_end_s) — win bounds are
    min/max over the PADDED window (= over the real slice), matching
    cook_features_into (feature_utilities.py:231-238).
    """
    L, m = output_length, min_timeslice_size
    keys = ["_s"] + ([order_tiebreak] if order_tiebreak else [])
    wo = Window.partitionBy(entity).orderBy(*[F.col(k).asc() for k in keys])
    wall = Window.partitionBy(entity)
    # ONE window pass: the old second (descending) row_number sorted the
    # whole fact stream a second time only to find the m-th row from the
    # series end — that row is _rn == n_rows - m over the ascending rank
    # plus the partition count, both available in the same pass.  The
    # checkpoint pins the sorted/ranked facts so the three consumers
    # below (bounds agg, start_idx fan-out, slice join) read it instead
    # of each re-running the sort (column pruning makes their subtrees
    # physically distinct, defeating ReuseExchange).
    facts = (
        df.select(
            entity,
            epoch_s(ts).alias("_s"),
            F.col(value_col).cast("double").alias("_val"),
            *([order_tiebreak] if order_tiebreak else []),
        )
        .withColumn("_rn", F.row_number().over(wo) - 1)
        .withColumn("_n_rows", F.count(F.lit(1)).over(wall))
        .select(entity, "_s", "_val", "_rn", "_n_rows")
        .localCheckpoint(eager=True)
    )

    bounds = (
        facts.groupBy(entity)
        .agg(
            F.max("_n_rows").alias("_n_rows"),
            F.min("_s").alias("_ts0"),
            F.max("_s").alias("_tslast"),
            # ts[n_rows - m], i.e. the m-th row counted from the end
            F.max(
                F.when(F.col("_rn") == F.col("_n_rows") - m, F.col("_s"))
            ).alias("_ts_maxndx"),
        )
        .filter(F.col("_n_rows") >= m)
        .select(
            entity,
            "_n_rows",
            (F.col("_ts0") - (L - m)).alias("_min_time"),
            F.least(F.col("_ts_maxndx"), F.col("_tslast") - max_time_delta).alias(
                "_max_time"
            ),
        )
        .filter(F.col("_max_time") >= F.col("_min_time"))
    )

    draws = bounds.select(
        entity,
        "_n_rows",
        "_min_time",
        "_max_time",
        F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("sample_idx"),
    ).select(
        entity,
        "_n_rows",
        "sample_idx",
        (
            F.col("_min_time")
            + _md5_draw(F.col(entity), F.col("sample_idx"), F.lit(seed))
            % (F.col("_max_time") - F.col("_min_time") + 1)
        ).alias("start_time_s"),
    )

    # searchsorted(ts, start_time, 'left') == count(ts < start_time).
    # The draw side is |entities| x n rows — broadcast it so both
    # fact-stream passes below stay map-side (the checkpointed facts
    # are never re-shuffled); the partial aggregation collapses each
    # task's contribution to one row per draw before the tiny exchange.
    meta = (
        facts.join(F.broadcast(draws.drop("_n_rows")), entity)
        .groupBy(entity, "sample_idx", "start_time_s")
        .agg(
            F.sum(F.when(F.col("_s") < F.col("start_time_s"), 1).otherwise(0)).alias(
                "start_idx"
            )
        )
    )
    slice_rows = facts.join(F.broadcast(meta), entity).filter(
        (F.col("_rn") >= F.col("start_idx"))
        & (F.col("_rn") < F.col("start_idx") + L)
    )
    arr = F.sort_array(F.collect_list(F.struct("_rn", "_s", "_val")))
    pad = lambda field: F.expr(  # noqa: E731  out[k] = slice[k % n_real]
        f"transform(sequence(0, {L - 1}), k -> _w[int(k % size(_w))].{field})"
    )
    return (
        slice_rows.groupBy(entity, "sample_idx", "start_time_s", "start_idx")
        .agg(arr.alias("_w"))
        .select(
            entity,
            "sample_idx",
            "start_time_s",
            "start_idx",
            F.size("_w").alias("n_real"),
            pad("_val").alias("features"),
            pad("_s").alias("timestamps_s"),
            F.expr("_w[0]._s").alias("win_start_s"),
            F.expr("_w[size(_w) - 1]._s").alias("win_end_s"),
        )
    )


def range_feature_windows(
    df: DataFrame,
    ranges: DataFrame,
    window_size: int,
    min_points: int,
    entity: str = "user_id",
    ts: str = "ts",
    value_col: str = "value",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Inference-time per-range window extraction
    (np_array_extract_slices_for_time_ranges, reference
    feature_utilities.py:296-345 — the slicer feeding the monthly
    scoring windows of run_inference.py:50-73).

    Per (entity, range): rows with range_start <= ts < range_end
    (searchsorted LEFT on both bounds); ranges with fewer than
    `min_points` rows emit nothing; longer slices keep the LAST
    window_size points — note the reference computes a random
    start_offset but then slices with max_offset (a dead variable,
    feature_utilities.py:337-339), so its actual behavior IS the
    deterministic last-window, which we reproduce; short slices
    repeat-pad (out[k] = slice[k % len]).

    Spark-first: broadcast coverage join (rows replicate only into the
    ranges that contain them), one shuffle on (entity, range) for the
    within-range rank, modulo join for the pad — no Python.  Exploded
    output: (entity, range_start, range_end, n_in_range, pos, ts_s,
    feature).
    """
    W = window_size
    keys = ["_ts"] + ([order_tiebreak] if order_tiebreak else [])
    rng = ranges.select(
        F.col("range_start").alias("_rs"), F.col("range_end").alias("_re")
    )
    rows = (
        df.select(
            entity,
            F.col(ts).alias("_ts"),
            F.col(value_col).cast("double").alias("_val"),
            *([order_tiebreak] if order_tiebreak else []),
        )
        .join(
            F.broadcast(rng),
            (F.col("_ts") >= F.col("_rs")) & (F.col("_ts") < F.col("_re")),
        )
        .withColumn(
            "_idx",
            F.row_number().over(
                Window.partitionBy(entity, "_rs", "_re").orderBy(
                    *[F.col(k).asc() for k in keys]
                )
            )
            - 1,
        )
    )
    meta = (
        rows.groupBy(entity, "_rs", "_re")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= min_points)
        .select(
            entity,
            "_rs",
            "_re",
            "_n",
            F.greatest(F.lit(0), F.col("_n") - W).alias("_off"),
            F.least(F.col("_n"), F.lit(W)).alias("_c"),
        )
    )
    posg = meta.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(W - 1))).alias("pos")
    ).withColumn(
        # the source row index is computable BEFORE the join — making it
        # a join KEY keeps this a pure equi-join.  Joining on
        # (entity, range) alone and filtering afterwards would stream
        # W x n_in_range pairs per range through the join (the same
        # amplification class as the old W1m collect_list)
        "_src",
        F.col("_off") + (F.col("pos") % F.col("_c")),
    )
    rr = rows.select(
        entity, "_rs", "_re", F.col("_idx").alias("_src"), "_ts", "_val"
    )
    out = posg.join(rr, [entity, "_rs", "_re", "_src"])
    return out.select(
        entity,
        F.col("_rs").alias("range_start"),
        F.col("_re").alias("range_end"),
        F.col("_n").alias("n_in_range"),
        "pos",
        epoch_s("_ts").alias("ts_s"),
        F.col("_val").alias("feature"),
    )
