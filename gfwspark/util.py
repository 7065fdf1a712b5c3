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


def round_half_up(x: float, nd: int = 6) -> float:
    """Driver-side rounding that matches Spark F.round and DuckDB
    round(): half-AWAY-from-zero on the double's SHORTEST-DECIMAL
    representation (see classify._round6 docstring for the two ways
    naive python disagrees).  Use for any driver-computed constant
    that an oracle recomputes in SQL."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-nd)
    return float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))
