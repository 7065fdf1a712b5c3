"""Distributed quality-classifier training: full-batch logistic
regression by gradient descent — the corpus-prep "model-based quality
filter" stage (public recipe: LLM pipelines train a lightweight
classifier on doc-stat features to score documents; this is its
distributed trainer, the iterative-algorithm sibling of
similarity.kmeans_fit).

Determinism contract (the engine float policy, README "bit-exact"):
- every transcendental (sigmoid) is round(·, 6) per row, z clipped to
  [-30, 30] BEFORE exp;
- every unordered cross-row sum routes through decimal(20,12) so
  partial-sum order cannot change the result;
- weight updates re-round to 6 decimals each iteration.
With that, K iterations unroll into K oracle CTEs that match
bit-for-bit (see queries_ml._LOGREG_ORACLE).

Scale shape: one map-side-combined aggregation per iteration over the
feature frame (the only traffic is |features|+2 decimal partials per
task), weights live on the driver as literals — the classic
broadcast-gradient pattern; no per-row Python anywhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from gfwspark.util import round_half_up


def _round6(x: float) -> float:
    """Round to 6 dp exactly the way Spark F.round and DuckDB round()
    do: half-AWAY-from-zero on the SHORTEST-DECIMAL representation of
    the double (Java BigDecimal.valueOf goes through Double.toString;
    DuckDB behaves identically — round(5e-7, 6) is 1e-6 even though
    the double is 4.9999...e-7 in exact binary).  Python's round() is
    half-even and disagrees on dyadic ties (0.0078125 -> 0.007812 vs
    SQL 0.007813); Decimal(x) (exact expansion) disagrees just below
    repr-ties — Decimal(repr(x)) matches both engines (util.round_half_up)."""
    return round_half_up(x, 6)


def _sigmoid6(z):
    zc = F.greatest(F.lit(-30.0), F.least(F.lit(30.0), z))
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-zc)), 6)


def logreg_fit(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    n_iter: int = 2,
    lr: float = 1.0,
) -> tuple[dict[str, float], float]:
    """Fit w, b by `n_iter` full-batch GD steps from w = 0, b = 0.

    Gradient of the mean log-loss: X^T (y - sigmoid(Xw + b)) / n.
    Returns ({feature: weight}, bias), every value an exact multiple
    of 1e-6 by construction."""
    w = {c: 0.0 for c in feature_cols}
    b = 0.0
    for _ in range(n_iter):
        z = F.lit(b)
        for c in feature_cols:
            z = z + F.lit(w[c]) * F.col(c)
        p = _sigmoid6(F.round(z, 6))
        resid = F.col(label_col).cast("double") - p
        aggs = [
            F.sum(F.round(F.col(c) * resid, 6).cast("decimal(20,12)")).alias(c)
            for c in feature_cols
        ]
        aggs.append(F.sum(F.round(resid, 6).cast("decimal(20,12)")).alias("_b"))
        aggs.append(F.count(F.lit(1)).alias("_n"))
        row = df.agg(*aggs).first()
        n = row["_n"]
        for c in feature_cols:
            w[c] = _round6(w[c] + lr * _round6(float(row[c]) / n))
        b = _round6(b + lr * _round6(float(row["_b"]) / n))
    return w, b


def logreg_score(
    df: DataFrame,
    weights: dict[str, float],
    bias: float,
    score_col: str = "p_quality",
) -> DataFrame:
    """Score rows with a fitted model: round-6 sigmoid of the linear
    term — map-side only, broadcast weights as literals."""
    z = F.lit(bias)
    for c, wc in weights.items():
        z = z + F.lit(wc) * F.col(c)
    return df.withColumn(score_col, _sigmoid6(F.round(z, 6)))
