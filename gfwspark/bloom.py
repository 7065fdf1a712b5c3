"""Bloom-filter runtime join pruning — the 100-TB semi-join shape.

At 10^12 fact rows, a membership join `facts SEMI JOIN keys` pays a
full shuffle of the fact table even when <1% of rows survive.  The
standard fix (Spark's own InjectRuntimeFilter, Trino/Flink runtime
filters) is a Bloom filter built over the key side, broadcast to the
fact scan, and applied MAP-SIDE so non-members never enter the
shuffle; an exact join over the survivors removes the false positives,
so results are observationally identical to the plain semi join (which
is also the DuckDB oracle for the registered query).

PySpark 4.1 exposes neither `bloom_filter_agg` (SQL-internal) nor
`DataFrameStat.bloomFilter` (Scala-only), so the sketch is built as a
composition of DataFrame ops — everything stays JVM-side:

1. positions: explode each key into k = `n_hashes` bit positions
   pmod(xxhash64(key, seed_i), m)  (seeded xxhash64: the same family
   Spark's own BloomFilterAggregate uses);
2. bitmap: groupBy word index (position / 64), bit_or of
   shiftleft(1L, position % 64) — a <= m/64-row frame, collected once
   (m/64 longs, e.g. 8 KiB words for the default m = 2^19 bits);
3. membership: the bitmap becomes one array<long> literal in the fact
   plan; each of the k probes is
   element_at(bitmap, word+1) & mask != 0 — pure codegen conjuncts,
   no Python, no join, evaluated at the scan.

False-positive rate: standard (1 - e^(-kn/m))^k; with the defaults
(m = 2^19, k = 5) a 50k-key dim stays under ~1%.  Size m to
~10 bits/key.  The collect in step 2 moves only the bitmap words —
never keys — and is the exact analog of broadcasting the sketch.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def bloom_bitmap(keys: DataFrame, on: str, m_bits: int = 1 << 19,
                 n_hashes: int = 5) -> list[int]:
    """Build the Bloom bitmap for `keys[on]` as a list of m_bits/64
    signed 64-bit words (Java long semantics, ready for F.lit)."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    pos_cols = [
        F.pmod(F.xxhash64(F.col(on), F.lit(i)), F.lit(m_bits))
        for i in range(n_hashes)
    ]
    words = (
        keys.select(F.explode(F.array(*pos_cols)).alias("p"))
        .select(
            (F.col("p") / 64).cast("long").alias("w"),
            F.pmod(F.col("p"), 64).cast("int").alias("b"),
        )
        .groupBy("w")
        # SQL shiftleft accepts a column shift amount (the PySpark
        # wrapper insists on a literal int)
        .agg(F.bit_or(F.expr("shiftleft(1L, b)")).alias("word"))
        .collect()
    )
    bitmap = [0] * (m_bits // 64)
    for r in words:
        bitmap[r["w"]] = r["word"]
    return bitmap


def bloom_might_contain(col, bitmap: list[int], m_bits: int,
                        n_hashes: int = 5):
    """Pure-JVM membership predicate column: AND of the k probe bits."""
    tests = []
    # one shared array literal — building it inside the loop would put
    # k full copies of the bitmap into the expression tree
    arr = F.lit(bitmap)
    for i in range(n_hashes):
        p = F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m_bits))
        word = F.element_at(arr, ((p / 64).cast("int") + 1))
        # call_function: SQL shiftleft takes a column shift amount (the
        # typed PySpark wrapper insists on a literal int)
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), F.pmod(p, 64).cast("int")
        )
        tests.append(word.bitwiseAND(mask) != 0)
    return reduce(lambda a, b: a & b, tests)


def bloom_semi_join(
    facts: DataFrame,
    keys: DataFrame,
    on: str,
    m_bits: int = 1 << 19,
    n_hashes: int = 5,
) -> DataFrame:
    """`facts LEFT SEMI JOIN keys ON facts[on] = keys[on]`, with a
    broadcast Bloom pre-filter so non-members are dropped at the fact
    scan, BEFORE the shuffle.  Exact: the final left_semi join removes
    Bloom false positives, so output == plain semi join, always.

    The keys frame is traversed twice (bitmap + exact join) — at the
    intended scale keys is the small side (a dim / id-list several
    orders smaller than facts), so the second pass is noise against
    the saved fact shuffle.

    Both sides must carry the SAME type for `on`: xxhash64 is
    type-sensitive (int 5 and bigint 5 hash differently), so a type
    mismatch would set bits from one representation and probe with the
    other — silent false negatives where the plain semi join (which
    implicitly casts) keeps the row.  Raised here instead of silently
    casting: the caller should decide which side widens."""
    ft = facts.schema[on].dataType
    kt = keys.schema[on].dataType
    if ft != kt:
        raise ValueError(
            f"bloom_semi_join: facts[{on}] is {ft.simpleString()} but "
            f"keys[{on}] is {kt.simpleString()}; xxhash64 is type-"
            "sensitive, so cast both sides to a common type first"
        )
    bitmap = bloom_bitmap(keys, on, m_bits, n_hashes)
    pruned = facts.filter(bloom_might_contain(F.col(on), bitmap, m_bits, n_hashes))
    return pruned.join(keys.select(on).distinct(), on=on, how="left_semi")
