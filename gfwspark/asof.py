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

Two physical strategies, same results:

1. ``asof_join_union`` — pure DataFrame plan: union facts+annotations,
   one window `last(value, ignorenulls=True)` over
   (entity, ts) rowsBetween(unboundedPreceding, 0).  One shuffle, fully
   JVM-side, whole-stage-codegen'd; the default at scale.
2. ``asof_join_cogroup`` — cogroup().applyInPandas(pd.merge_asof):
   per-entity Arrow-batched sort-merge, linear like the reference's
   searchsorted.  Used when the payload is wide (many annotation
   columns) or semantics exceed what the window trick expresses
   (e.g. tolerance).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


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
) -> DataFrame:
    """Backward as-of via cogroup + pd.merge_asof (Arrow sort-merge).

    Both sides shuffle once on the entity key; each cogroup arrives as
    pandas frames, is sorted (cheap — layout.partition_sorted already
    clustered it), and merge_asof runs the linear backward scan.  This
    is the direct Spark analog of the reference's per-vessel
    searchsorted kernel.
    """
    import pyspark.sql.types as T

    out_fields = list(facts.schema.fields) + [
        T.StructField(f"asof_{c}", annotations.schema[c].dataType) for c in value_cols
    ]
    out_schema = T.StructType(out_fields)
    fact_names = [f.name for f in facts.schema.fields]

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(columns=[f.name for f in out_fields])
        left = left.sort_values(ts, kind="mergesort")
        if right.empty:
            out = left.copy()
            for c in value_cols:
                out[f"asof_{c}"] = None
            return out
        right = right.sort_values(ann_ts, kind="mergesort")[[ann_ts, *value_cols]]
        right = right.rename(columns={c: f"asof_{c}" for c in value_cols})
        merged = pd.merge_asof(
            left,
            right,
            left_on=ts,
            right_on=ann_ts,
            direction="backward",
            tolerance=tolerance,
        )
        return merged[fact_names + [f"asof_{c}" for c in value_cols]]

    return (
        facts.groupBy(entity)
        .cogroup(annotations.groupBy(entity))
        .applyInPandas(lambda left, right: merge(left, right), schema=out_schema)
    )


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

    Each fact row gets the value of the latest-starting interval that
    covers its ts (start <= ts <= end, both inclusive per
    fishing_feature_generation.py:59-60); `default` (-1.0, the
    reference's UNCLASSIFIED fill) elsewhere.

    Implementation: backward as-of on interval starts carrying
    (start,end,value), then a coverage filter — two window columns, one
    shuffle, no join.  Overlapping intervals resolve to the
    latest-starting one, matching the reference's sequential overwrite
    of the dense label array.
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
