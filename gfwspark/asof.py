"""Point-in-time / as-of joins — the heart of the engine.

Reference semantics being reproduced (SURVEY.md §2.3 J1–J3):

- *backward as-of*: for each fact row (entity, ts), attach the most
  recent annotation with start_ts <= ts.  Backward-only ⇒ zero temporal
  leakage (the reference's dense-label fill walks ranges already in the
  past, fishing_feature_generation.py:52-68).
- *point-in-interval*: attach the label of an interval [start_ts,
  end_ts] covering ts; boundary convention start-inclusive /
  end-inclusive per the reference's searchsorted sides
  (fishing_feature_generation.py:59-60); -1.0 (UNCLASSIFIED) elsewhere.

Four physical strategies, same results (all gate-checked against the
same DuckDB ASOF oracle):

1. ``asof_join_union`` — pure DataFrame plan: union facts+annotations,
   one window `last(value, ignorenulls=True)` over
   (entity, ts) rowsBetween(unboundedPreceding, 0).  One shuffle, fully
   JVM-side, whole-stage-codegen'd; the default at scale.
2. ``asof_join_cogroup`` — cogroup().applyInPandas(pd.merge_asof):
   per-entity Arrow-batched sort-merge, linear like the reference's
   searchsorted.  Used when the payload is wide (many annotation
   columns) or semantics exceed what the window trick expresses
   (e.g. tolerance).
3. ``asof_join_broadcast`` — map-side searchsorted against a broadcast
   per-entity annotation index: ZERO shuffle of the fact table.  The
   pick when the annotation dim is small, which at 10^12 fact rows is
   the difference between moving nothing and moving everything.
4. ``asof_join_chunked`` — time-salted + re-merged: for SKEWED
   entities, where strategies 1-2 serialize each entity into one task.
   Salt = time chunk; local union-form merge per (entity, chunk);
   terminal annotation state re-merged through a tiny per-chunk carry
   frame.  Measured on one 12.8M-row hot entity at 8 cores: 11.3 s
   (union, serial window) -> 4.1 s (2.8x; the gap grows linearly with
   hot-entity size).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

# NULL-entity stand-in for pandas merge_asof(by=...) — an object()
# singleton no data value can equal (see asof_join_cogroup)
_NULL_BY_KEY = object()


def asof_join_union(
    facts: DataFrame,
    annotations: DataFrame,
    entity: str = "image_id",
    ts: str = "ts",
    ann_ts: str = "start_ts",
    value_cols: tuple[str, ...] = ("label",),
) -> DataFrame:
    """Backward as-of via union + last(ignorenulls) window.

    Annotation rows are interleaved at their start_ts; `last(...,
    ignorenulls=True)` over an unbounded-preceding frame carries the
    latest annotation value forward onto every fact row.  Tie at equal
    ts: annotation sorts *before* the fact row (`_src` ordering), so a
    same-timestamp annotation is visible — matching searchsorted
    side='right' start-inclusion in the reference.

    Plan shape: one shuffle on (entity), window sort (entity, ts, _src),
    then a filter — no join node at all, so there is no skew-join risk
    and AQE coalesces the output.
    """
    fact_cols = facts.columns
    a = annotations.select(
        F.col(entity),
        F.col(ann_ts).alias(ts),
        F.lit(0).alias("_src"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    f = facts.select(
        "*",
        F.lit(1).alias("_src"),
        *[F.lit(None).cast(a.schema[f"_v_{c}"].dataType).alias(f"_v_{c}") for c in value_cols],
    )
    unioned = f.unionByName(a, allowMissingColumns=True)
    w = (
        Window.partitionBy(entity)
        .orderBy(F.col(ts).asc(), F.col("_src").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = unioned.select(
        "*",
        *[
            F.last(F.col(f"_v_{c}"), ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return out.filter(F.col("_src") == 1).select(
        *fact_cols, *[f"asof_{c}" for c in value_cols]
    )


def asof_join_cogroup(
    facts: DataFrame,
    annotations: DataFrame,
    entity: str = "image_id",
    ts: str = "ts",
    ann_ts: str = "start_ts",
    value_cols: tuple[str, ...] = ("label",),
    tolerance: pd.Timedelta | None = None,
    coarse_buckets: int | None = -1,
) -> DataFrame:
    """Backward as-of via cogroup + pd.merge_asof (Arrow sort-merge).

    Both sides shuffle once on the grouping key; each cogroup arrives
    as pandas frames and merge_asof runs the linear backward scan.
    This is the direct Spark analog of the reference's per-vessel
    searchsorted kernel.

    ``coarse_buckets`` — per-ENTITY cogroups pay the Arrow + Python
    call overhead once per entity (~3 ms), which dominates when
    entities are small (1500 entities x 67 rows: 4.8 s vs 0.3 s for
    the union form).  The default cogroups on crc32(entity) %
    (4 x defaultParallelism) buckets instead and lets ONE
    merge_asof(by=entity) handle every entity in the bucket —
    identical semantics (pandas `by` matching = per-entity backward
    scan), overhead amortized across the bucket, skew no worse (a hot
    entity still occupies one bucket, exactly as it occupied one
    cogroup).  -1 = auto (4 x defaultParallelism); None/0 = one
    cogroup per entity.

    Pass None when both sides are AT-REST bucketed by entity
    (layout.write_bucketed): per-entity grouping is satisfied by the
    scan's hashpartitioning(entity) — ZERO Exchange (plan-pinned in
    tests/test_layout.py) — while the coarse crc32 key would force a
    re-shuffle.  Coarse is for ad-hoc inputs that shuffle anyway.
    """
    import pyspark.sql.types as T

    out_fields = list(facts.schema.fields) + [
        T.StructField(f"asof_{c}", annotations.schema[c].dataType) for c in value_cols
    ]
    out_schema = T.StructType(out_fields)
    fact_names = [f.name for f in facts.schema.fields]

    if coarse_buckets == -1:
        coarse_buckets = 4 * facts.sparkSession.sparkContext.defaultParallelism

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(columns=[f.name for f in out_fields])
        left = left.sort_values(ts, kind="mergesort")
        if right.empty:
            out = left.copy()
            for c in value_cols:
                out[f"asof_{c}"] = None
            return out
        right = right.sort_values(ann_ts, kind="mergesort")[
            [entity, ann_ts, *value_cols]
        ]
        right = right.rename(columns={c: f"asof_{c}" for c in value_cols})
        # pandas `by` hash-matching skips NaN/None keys, but SQL group
        # semantics must match NULL entities to NULL annotations (the
        # dirty-data hot key).  The fill value is a process-local
        # object() singleton, which no data value can collide with (a
        # string sentinel would conflate a legitimate entity equal to
        # it with the NULL group).
        by_l, by_r = left[entity], right[entity]
        if by_l.isna().any() or by_r.isna().any():
            null_key = _NULL_BY_KEY
            left = left.assign(
                **{entity: by_l.astype(object).where(by_l.notna(), null_key)}
            )
            right = right.assign(
                **{entity: by_r.astype(object).where(by_r.notna(), null_key)}
            )
            restore_null = True
        else:
            restore_null = False
        merged = pd.merge_asof(
            left,
            right,
            left_on=ts,
            right_on=ann_ts,
            by=entity,
            direction="backward",
            tolerance=tolerance,
        )
        if restore_null:
            col = merged[entity]
            merged[entity] = col.where([v is not _NULL_BY_KEY for v in col], None)
        return merged[fact_names + [f"asof_{c}" for c in value_cols]]

    if coarse_buckets:
        key = (
            F.crc32(F.coalesce(F.col(entity).cast("string"), F.lit("\x00__null__")))
            % coarse_buckets
        ).alias("_cg")
        grouped = facts.groupBy(key).cogroup(annotations.groupBy(key))
    else:
        # one entity per cogroup: `by` matching is vacuous, same kernel
        grouped = facts.groupBy(entity).cogroup(annotations.groupBy(entity))
    return grouped.applyInPandas(merge, schema=out_schema)


def interval_label_join(
    facts: DataFrame,
    intervals: DataFrame,
    entity: str = "image_id",
    ts: str = "ts",
    start: str = "start_ts",
    end: str = "end_ts",
    value: str = "value",
    default: float = -1.0,
) -> DataFrame:
    """Dense point-in-interval labelling (reference J1).

    Each fact row gets the value of the LATEST-STARTING interval with
    start <= ts, IF that interval still covers ts (start <= ts <= end,
    both inclusive per fishing_feature_generation.py:59-60); `default`
    (-1.0, the reference's UNCLASSIFIED fill) otherwise.

    Overlapping-interval caveat: this diverges from the reference's
    sequential overwrite (add_labels, fishing_feature_generation.py:
    52-68) when intervals NEST — a point past a later-starting
    interval's end but still inside an earlier interval gets `default`
    here, whereas the reference keeps the earlier interval's label
    (it only overwrites [start_ndx:end_ndx]).  For non-overlapping or
    merely abutting intervals (the reference's actual fishing-range
    data) the two agree.  For reference-exact resolution on nested
    intervals use ``interval_label_join_covering``.

    Implementation: backward as-of on interval starts carrying
    (start,end,value), then a coverage filter — two window columns, one
    shuffle, no join.
    """
    fact_cols = facts.columns
    a = intervals.select(
        F.col(entity),
        F.col(start).alias(ts),
        F.lit(0).alias("_src"),
        F.col(end).alias("_end"),
        F.col(value).alias("_val"),
    )
    f = facts.select(
        "*",
        F.lit(1).alias("_src"),
        F.lit(None).cast(a.schema["_end"].dataType).alias("_end"),
        F.lit(None).cast(a.schema["_val"].dataType).alias("_val"),
    )
    unioned = f.unionByName(a)
    w = (
        Window.partitionBy(entity)
        .orderBy(F.col(ts).asc(), F.col("_src").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    lab = unioned.select(
        "*",
        F.last("_end", ignorenulls=True).over(w).alias("_last_end"),
        F.last("_val", ignorenulls=True).over(w).alias("_last_val"),
    )
    return (
        lab.filter(F.col("_src") == 1)
        .select(
            *fact_cols,
            F.when(F.col(ts) <= F.col("_last_end"), F.col("_last_val"))
            .otherwise(F.lit(default))
            .alias("label"),
        )
    )


def interval_label_join_covering(
    facts: DataFrame,
    intervals: DataFrame,
    entity: str = "image_id",
    ts: str = "ts",
    start: str = "start_ts",
    end: str = "end_ts",
    value: str = "value",
    default: float = -1.0,
) -> DataFrame:
    """Reference-EXACT point-in-interval labelling for overlapping /
    nested intervals: each point takes the value of the latest-STARTING
    interval that actually COVERS it — equivalent to the reference's
    sequential overwrite of the dense label array in start order
    (add_labels, fishing_feature_generation.py:52-68), which only
    writes inside [start_ndx:end_ndx] so an enclosing earlier interval
    survives past a nested one's end.

    Implementation — interval flattening on the DIM side, zero fact
    shuffle: the interval table (an annotation dim, small by contract)
    is decomposed into DISJOINT segments at every start / end+1
    boundary (epoch-microsecond integers); each segment carries the
    label of the latest-starting interval covering it (ties on start
    resolve to the larger value, deterministically).  Facts then take a
    single broadcast hash join on entity with the range predicate as
    the join residual — at most ONE matching segment per fact row, so
    no argmax, no groupBy, and the fact table never moves.
    """
    from gfwspark.util import epoch_us

    fact_cols = facts.columns
    iv = intervals.select(
        F.col(entity).alias("_e"),
        epoch_us(start).alias("_start_us"),
        epoch_us(end).alias("_end_us"),
        F.col(value).alias("_val"),
    )
    bounds = (
        iv.select("_e", F.col("_start_us").alias("_b"))
        .unionByName(iv.select("_e", (F.col("_end_us") + 1).alias("_b")))
        .distinct()
    )
    w = Window.partitionBy("_e").orderBy("_b")
    seg = (
        bounds.withColumn("_b_next", F.lead("_b").over(w))
        .filter(F.col("_b_next").isNotNull())
    )
    segments = (
        seg.alias("s")
        .join(
            iv.alias("i"),
            (F.col("s._e") == F.col("i._e"))
            & (F.col("i._start_us") <= F.col("s._b"))
            & (F.col("i._end_us") >= F.col("s._b")),
        )
        .groupBy(F.col("s._e").alias("_e"), "_b", "_b_next")
        .agg(F.max_by("_val", F.struct("_start_us", "_val")).alias("_val"))
    )
    ts_us = epoch_us(ts)
    out = facts.join(
        F.broadcast(segments),
        (F.col(entity) == F.col("_e"))
        & (ts_us >= F.col("_b"))
        & (ts_us < F.col("_b_next")),
        "left",
    )
    return out.select(
        *fact_cols, F.coalesce(F.col("_val"), F.lit(default)).alias("label")
    )


def asof_join_broadcast(
    facts: DataFrame,
    annotations: DataFrame,
    entity: str = "image_id",
    ts: str = "ts",
    ann_ts: str = "start_ts",
    value_col: str = "label",
    max_broadcast_rows: int = 2_000_000,
) -> DataFrame:
    """Backward as-of with a BROADCAST annotation side — zero shuffle
    of the fact table.

    When the annotation dim is small (the common production shape: a
    label/config table versioned over time), shuffling 10^12 fact rows
    to meet it is absurd.  Here the annotations are collected into a
    per-entity sorted numpy index, broadcast to every executor, and the
    facts stream through ``mapInPandas`` doing the reference's exact
    searchsorted lookup (fishing_feature_generation.py:59-60) batch by
    batch — any fact partitioning works, nothing moves.

    The driver-side collect is guarded: more than `max_broadcast_rows`
    annotation rows raises ValueError (use asof_join_union /
    asof_join_cogroup for large annotation sides) instead of silently
    OOMing the driver.  No-match rows get SQL NULL; values round-trip
    in the annotation column's own dtype (ints/strings/bools stay
    exact — nothing is funneled through float64).

    Physical analog of J5 (broadcast dict lookup, metadata.py:142-161)
    fused with J1's binary search.
    """
    import numpy as np
    import pyspark.sql.types as T

    ann_rows = (
        annotations.select(entity, ann_ts, value_col)
        .limit(max_broadcast_rows + 1)
        .toPandas()
        .sort_values([entity, ann_ts], kind="mergesort")
    )
    if len(ann_rows) > max_broadcast_rows:
        raise ValueError(
            f"asof_join_broadcast: annotation side exceeds "
            f"max_broadcast_rows={max_broadcast_rows}; use asof_join_union "
            f"or asof_join_cogroup for large annotation tables"
        )
    index: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for eid, grp in ann_rows.groupby(entity):
        index[eid] = (
            grp[ann_ts].astype("datetime64[us]").astype("int64").to_numpy(),
            # object dtype: preserves the annotation dtype exactly
            # (int64 > 2^53, strings, bools) and admits None
            grp[value_col].to_numpy(dtype=object),
        )
    bc = facts.sparkSession.sparkContext.broadcast(index)

    out_schema = T.StructType(
        list(facts.schema.fields)
        + [T.StructField(f"asof_{value_col}", annotations.schema[value_col].dataType)]
    )

    def lookup(batches):
        idx = bc.value
        for pdf in batches:
            ts_us = pdf[ts].astype("datetime64[us]").astype("int64").to_numpy()
            out = np.full(len(pdf), None, dtype=object)
            for eid, rows in pdf.groupby(entity).groups.items():
                hit = idx.get(eid)
                if hit is None:
                    continue
                ann_us, vals = hit
                pos = np.searchsorted(ann_us, ts_us[rows], side="right") - 1
                ok = pos >= 0
                res = np.full(len(rows), None, dtype=object)
                res[ok] = vals[np.clip(pos, 0, None)][ok]
                out[rows] = res
            res_pdf = pdf.copy()
            res_pdf[f"asof_{value_col}"] = out
            yield res_pdf

    return facts.mapInPandas(lookup, schema=out_schema)


def asof_join_chunked(
    facts: DataFrame,
    annotations: DataFrame,
    chunk_s: int,
    entity: str = "image_id",
    ts: str = "ts",
    ann_ts: str = "start_ts",
    value_cols: tuple[str, ...] = ("label",),
    hot_ids: list | None = None,
) -> DataFrame:
    """Backward as-of for SKEWED entities: time-salted + re-merged.

    Observationally identical to ``asof_join_union``, but each entity's
    timeline is salted into ``ceil(span / chunk_s)`` time chunks so a
    hot entity (one image_id holding a large fraction of a 10^12-row
    table) spreads over many parallel tasks instead of serializing one
    window task.  This is the north-star's "skewed keys salted and
    re-merged" applied to the as-of merge itself:

    1. *salt*: union facts+annotations, chunk = epoch_us(ts) / chunk_s
       (deterministic, content-derived — no RNG);
    2. *local merge*: the union-form window runs per (entity, chunk);
    3. *re-merge*: each chunk's terminal annotation state — one tiny
       row per (entity, chunk) from a groupBy — is forward-carried
       across chunks by a window over the summary frame (strictly
       prior chunks only), then joined back and coalesced under the
       within-chunk result.  The carry frame is |entities| x |chunks|
       rows, so the cross-chunk dependency costs a near-zero shuffle
       while the heavy stages are embarrassingly parallel in
       (entity, chunk).

    Same tie semantics as asof_join_union (annotation at ts == fact ts
    is visible: searchsorted side='right' start-inclusion,
    fishing_feature_generation.py:59-60).  Annotations are assumed
    deduped to one row per (entity, ann_ts) — same contract as the
    other strategies.  Chunk sizing follows chunked_time_range_agg:
    pick chunk_s coarse (thousands of rows per chunk) so the summary
    frame stays tiny and per-chunk Arrow/agg overhead is amortized.

    ``hot_ids``: when given (the layout.salted pattern: salt only the
    skewed keys), ONLY those entities are time-chunked; every other
    entity gets the constant chunk 0, i.e. exactly the union-form
    single window per entity, inside the SAME single pipeline — one
    scan of the fact table, one (entity, chunk) shuffle, one tiny
    carry join.  This is how asof_join(strategy='auto') mixes the two
    strategies without running two pipelines over the input.
    """
    from gfwspark.util import epoch_us

    fact_cols = facts.columns
    chunk_us = int(chunk_s) * 1_000_000
    a = annotations.select(
        F.col(entity),
        F.col(ann_ts).alias(ts),
        F.lit(0).alias("_src"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    f = facts.select(
        "*",
        F.lit(1).alias("_src"),
        *[
            F.lit(None).cast(a.schema[f"_v_{c}"].dataType).alias(f"_v_{c}")
            for c in value_cols
        ],
    )
    chunk_expr = F.floor(epoch_us(ts) / F.lit(chunk_us))
    if hot_ids is not None:
        non_null = [h for h in hot_ids if h is not None]
        is_hot = F.col(entity).isin(non_null) if non_null else F.lit(False)
        if any(h is None for h in hot_ids):
            # isin() never matches NULL (SQL semantics); a NULL hot
            # group must be salted explicitly or it would serialize
            # into the single chunk-0 window auto exists to prevent
            is_hot = is_hot | F.col(entity).isNull()
        chunk_expr = F.when(is_hot, chunk_expr).otherwise(F.lit(0).cast("long"))
    u = f.unionByName(a, allowMissingColumns=True).withColumn("_chunk", chunk_expr)
    # local merge: the union-form carry, salted by (entity, chunk)
    w_in = (
        Window.partitionBy(entity, "_chunk")
        .orderBy(F.col(ts).asc(), F.col("_src").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = u.select(
        "*",
        *[
            F.last(F.col(f"_v_{c}"), ignorenulls=True).over(w_in).alias(f"_in_{c}")
            for c in value_cols
        ],
    )
    # terminal annotation state per (entity, chunk) — max-of-struct so
    # fact rows (null value) and annotation-less chunks fold to NULL.
    # Every (entity, chunk) present in the union gets a summary row, so
    # the cross-chunk ffill below covers annotation-less fact chunks.
    summ = u.groupBy(entity, "_chunk").agg(
        *[
            F.max(
                F.when(
                    F.col(f"_v_{c}").isNotNull(),
                    F.struct(F.col(ts).alias("_t"), F.col(f"_v_{c}").alias("_v")),
                )
            )["_v"].alias(f"_last_{c}")
            for c in value_cols
        ]
    )
    # re-merge: carry = latest terminal state from STRICTLY PRIOR chunks
    w_carry = (
        Window.partitionBy(entity)
        .orderBy("_chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = summ.select(
        entity,
        "_chunk",
        *[
            F.last(F.col(f"_last_{c}"), ignorenulls=True)
            .over(w_carry)
            .alias(f"_carry_{c}")
            for c in value_cols
        ],
    )
    # join strategy deliberately left to the planner (sort-merge with
    # the big side's window sort REUSED — no re-sort of `within`): an
    # r7 experiment hinting the tiny carry side to shuffled-hash
    # measured faster standalone (1.97 -> 1.73 s interleaved minima)
    # but ~2x SLOWER inside the full bench session (2.06 -> 3.87 s,
    # asof_skew_auto 2.13 -> 5.56 s) — under AQE the hint forces
    # partition alignment against the coalesced window shuffle and the
    # big side pays a fresh exchange.  Reverted; measure in context.
    out = within.join(carry, on=[entity, "_chunk"], how="left")
    return out.filter(F.col("_src") == 1).select(
        *fact_cols,
        *[
            F.coalesce(F.col(f"_in_{c}"), F.col(f"_carry_{c}")).alias(f"asof_{c}")
            for c in value_cols
        ],
    )


def asof_join(
    facts: DataFrame,
    annotations: DataFrame,
    entity: str = "image_id",
    ts: str = "ts",
    ann_ts: str = "start_ts",
    value_cols: tuple[str, ...] = ("label",),
    strategy: str = "auto",
    hot_threshold_rows: int = 3_000_000,
    chunk_s: int | None = None,
    min_chunk_s: int = 3600,
    entity_stats: DataFrame | None = None,
    max_hot_ids: int = 256,
) -> DataFrame:
    """Strategy-dispatched backward as-of join (the engine's front door).

    ``strategy`` picks the physical plan; all strategies are
    observationally identical (shared DuckDB ASOF oracle + goldens):

    - ``'union'``    — asof_join_union (default at scale; one shuffle).
    - ``'cogroup'``  — asof_join_cogroup (Arrow merge_asof; wide payloads).
    - ``'broadcast'``— asof_join_broadcast (zero fact shuffle; small
      annotation dims only — raises past its row cap).  Single value
      column (the broadcast index carries one payload array).
    - ``'chunked'``  — asof_join_chunked (time-salted; hot entities).
      Requires ``chunk_s``.
    - ``'auto'``     — measure per-entity fact counts once (a tiny
      groupBy count + min/max-ts agg whose output is only the keys
      above ``hot_threshold_rows``), then run ONE chunked pipeline in
      which only the hot keys are time-salted (``hot_ids``) — cold
      entities get the constant chunk 0, which degenerates to exactly
      the union-form window per entity.  Single scan of the facts,
      single (entity, chunk) shuffle, one tiny carry join; no second
      pipeline over the input.  The crossover default (3M rows/entity)
      is the measured break-even of chunked-vs-union on this engine
      (BENCH/HISTORY.md r3: 2.8x at 12.8M rows/entity, ~parity at
      3-5M).  Cold traffic pays only the salting CASE expression; hot
      traffic stops serializing into single window tasks.

    Auto's decision pass is one map-side-combined groupBy over the fact
    table producing O(hot entities) rows — at 10^12 rows that is the
    cheap pre-scan that saves the serialized hot-entity window.  When
    the skew profile is already known, call the strategies directly
    (or pre-filter with layout.detect_skew) and skip the pass.

    ``chunk_s`` (auto mode): derived so each hot entity spans roughly
    ``4 x defaultParallelism`` chunks of its observed time span,
    floored at ``min_chunk_s`` — coarse chunks, per the chunked-kernel
    sizing rule (thousands of rows per chunk; Arrow overhead amortized).
    Pass an explicit ``chunk_s`` to override.
    """
    if strategy == "union":
        return asof_join_union(facts, annotations, entity, ts, ann_ts, value_cols)
    if strategy == "cogroup":
        return asof_join_cogroup(facts, annotations, entity, ts, ann_ts, value_cols)
    if strategy == "broadcast":
        if len(value_cols) != 1:
            raise ValueError(
                "asof_join(strategy='broadcast') supports exactly one "
                f"value column, got {value_cols!r}"
            )
        return asof_join_broadcast(
            facts, annotations, entity, ts, ann_ts, value_col=value_cols[0]
        )
    if strategy == "chunked":
        if chunk_s is None:
            raise ValueError("asof_join(strategy='chunked') requires chunk_s")
        return asof_join_chunked(
            facts, annotations, chunk_s, entity, ts, ann_ts, value_cols
        )
    if strategy != "auto":
        raise ValueError(f"unknown as-of strategy {strategy!r}")

    from gfwspark.util import epoch_us

    if entity_stats is not None:
        # caller already profiled the layout (layout.detect_skew, a
        # checkpoint manifest, table stats) — don't re-scan the facts.
        # Required columns: entity + n_rows; lo_us/hi_us optional
        # (falls back to a global span probe only if chunk_s is unset).
        stats = entity_stats
        have_span = {"lo_us", "hi_us"} <= set(stats.columns)
        sel = [entity, "n_rows"] + (["lo_us", "hi_us"] if have_span else [])
        hot_rows = (
            stats.select(*sel)
            .filter(F.col("n_rows") > hot_threshold_rows)
            .limit(max_hot_ids + 1)
            .collect()
        )
    else:
        have_span = True
        hot_rows = (
            facts.groupBy(entity)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.min(epoch_us(ts)).alias("lo_us"),
                F.max(epoch_us(ts)).alias("hi_us"),
            )
            .filter(F.col("n_rows") > hot_threshold_rows)
            .limit(max_hot_ids + 1)
            .collect()
        )
    if not hot_rows:
        return asof_join_union(facts, annotations, entity, ts, ann_ts, value_cols)

    if chunk_s is None:
        if have_span and hot_rows:
            span_s = max((r["hi_us"] - r["lo_us"]) // 1_000_000 for r in hot_rows)
        else:
            g = facts.agg(
                F.min(epoch_us(ts)).alias("lo"), F.max(epoch_us(ts)).alias("hi")
            ).first()
            span_s = (g["hi"] - g["lo"]) // 1_000_000
        n_chunks = 4 * facts.sparkSession.sparkContext.defaultParallelism
        chunk_s = max(int(span_s // n_chunks) + 1, min_chunk_s)

    if len(hot_rows) > max_hot_ids:
        # hot set too large to embed as an isin()/CASE literal on the
        # driver — the skew is broad, so time-chunk EVERY entity
        # (hot_ids=None): cold keys pay the salting arithmetic but the
        # plan stays bounded regardless of key cardinality.
        return asof_join_chunked(
            facts, annotations, chunk_s, entity, ts, ann_ts, value_cols,
            hot_ids=None,
        )

    # a NULL entity group is the classic dirty-data hot key: it groups
    # like any value in groupBy/window, but isin() never matches NULL,
    # so it must be carried explicitly (sorted() would also choke on
    # None next to strings)
    hot_ids = sorted(
        (r[entity] for r in hot_rows), key=lambda v: (v is None, v)
    )
    return asof_join_chunked(
        facts, annotations, chunk_s, entity, ts, ann_ts, value_cols,
        hot_ids=hot_ids,
    )
