"""Small shared expression helpers."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def epoch_s(col: str | Column) -> Column:
    """Epoch seconds from a timestamp column, NTZ-safe.

    Parquet timestamps may arrive as TIMESTAMP_NTZ (Spark 4 cannot cast
    those straight to BIGINT); routing through TIMESTAMP interprets the
    wall-clock in the session timezone (pinned to UTC in session.py),
    matching DuckDB's epoch()."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp").cast("long")


def epoch_us(col: str | Column) -> Column:
    """Exact epoch microseconds (bigint) — the only safe currency for
    gap/duration arithmetic shared with the DuckDB oracle, whose
    ``epoch()`` returns a rounding double while Spark's long-cast
    truncates (off-by-one at sub-second boundaries)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))
