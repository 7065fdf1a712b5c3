"""End-to-end LLM training-corpus preparation: the composed pipeline
the individual text/dedup/split/pack operators exist for.

Stage order (the public web-corpus recipe — C4/MassiveText/The Pile
lineage, each stage an already-oracled operator in this engine):

1. quality gate        — text.with_quality_score       (length/alpha/punct)
2. repetition gate     — text.with_repetition_stats    (Gopher dup-ngram)
3. exact dedup         — md5(text) keep-min-id         (dedup_exact form)
4. near dedup          — dedup.minhash_near_dups       (MinHash-LSH + exact
                         Jaccard verify; drop the GREATER id of each pair)
5. decontamination     — text.ngram_decontaminate      (13-gram collision)
6. temporal split      — sources.temporal_split_embargo (purged/embargoed)
7. batch packing       — sources.pack_token_budget_batches per
                         (split, entity) composite key

Cheap row-local gates run FIRST so the shuffle-bearing stages (3-5)
see the smallest possible corpus; the split runs after dedup so a
val-set document can't survive via a train-set duplicate (that is
itself a leakage channel: near-identical train/val rows).

Scale shape: stages 1-2 are map-side only.  Stage 3 is one shuffle on
the content hash.  Stages 4-5 shuffle on shingle/gram keys (explode
widths bounded by token counts; the LSH band join is linear in bucket
collisions).  Stages 6-7 share ONE (entity)-clustered exchange: the
split's window partitions by entity and the packer by (split, entity)
— a subset-keyed window over an already entity-partitioned frame needs
no new exchange... but (split, entity) is NOT a subset of (entity)
hash-clustering's guarantee in Spark's required-distribution model, so
the plan test pins the observed exchange count instead of assuming.

Reference parity: this composes the same prepare-then-featurize data
flow as the reference's pipeline stages (vessel-classification
pipe_features' filter -> dedup -> split -> write flow); semantics per
stage are cited in each operator's own docstring.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from gfwspark import dedup, sources, text


def prepare_corpus(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    entity: str = "source",
    ts: str = "ts",
    quality_min: float = 0.999,
    max_dup_2gram: float = 0.1,
    near_dup_threshold: float = 0.5,
    decontam_n: int = 13,
    horizon_s: int = 100 * 3600,
    embargo_s: int = 40 * 3600,
    token_budget: int = 512,
    materialize_survivors: bool = False,
) -> DataFrame:
    """Run the 7-stage corpus-prep pipeline; returns one row per
    SURVIVING document: (id, entity, quality, dup_2gram_frac,
    n_tokens, split, batch_id, batch_start_offset).

    ``benchmark`` is the evaluation-suite frame for decontamination
    (one text column named ``text``).  Near-dup semantics: from every
    verified pair (a < b), b is dropped — the deterministic keep-min
    greedy, not transitive-closure clustering (dedup.dedup_clusters
    does that when cluster identity itself is wanted).

    ``materialize_survivors``: the exact-dedup survivor frame feeds
    FOUR downstream branches (minhash pairs, its own anti-join,
    decontamination, the split) and Spark's column pruning makes each
    branch's subtree physically distinct, defeating ReuseExchange — so
    lazily each branch re-runs scan + gates + dedup window.  True
    localCheckpoints the survivor frame once (one corpus-sized
    materialization buys back three full recomputes; the right trade
    on a production run, kept opt-out so single-action oracle replays
    stay one lazy plan)."""
    d = docs
    # 1-2: row-local quality + repetition gates (no shuffle)
    d = text.with_quality_score(d, text_col).filter(
        F.col("quality") >= quality_min
    )
    d = text.with_repetition_stats(d, text_col, ns=(2,)).filter(
        F.col("dup_2gram_frac") <= max_dup_2gram
    )
    # 3: exact dedup — keep the smallest id per content hash
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    d = (
        d.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if materialize_survivors:
        d = d.localCheckpoint(eager=True)
    # 4: MinHash-LSH near dedup (exact-Jaccard verified) — drop doc_b.
    # Staged rather than via dedup.minhash_near_dups so the shingle
    # frame can share the materialization point: the verify step reads
    # it three times (signatures, sizes, intersection), and lazily
    # each read re-runs the tokenize+shingle+hash explode.
    sh = dedup.shingles(d, id_col=id_col, text_col=text_col)
    if materialize_survivors:
        sh = sh.localCheckpoint(eager=True)
    sig = dedup.minhash_signatures(sh, id_col=id_col)
    cand = dedup.lsh_candidates(sig, id_col=id_col)
    pairs = dedup.jaccard_verify(cand, sh, id_col=id_col, threshold=near_dup_threshold)
    drop_b = pairs.select(F.col("doc_b").alias(id_col)).distinct()
    d = d.join(drop_b, id_col, "left_anti")
    # 5: benchmark decontamination — drop any doc sharing an n-gram
    contaminated = text.ngram_decontaminate(
        d, benchmark, n=decontam_n, id_col=id_col, text_col=text_col
    ).select(id_col)
    d = d.join(contaminated, id_col, "left_anti")
    # 6: leakage-free temporal split (drops the embargo band)
    d = sources.temporal_split_embargo(
        d, horizon_s=horizon_s, embargo_s=embargo_s, entity=entity, ts=ts
    )
    # 7: token counting + contiguous budget packing per (split, entity)
    d = d.withColumn("n_tokens", F.size(text.tokens_col(text_col)).cast("long"))
    d = sources.pack_token_budget_batches(
        d,
        "n_tokens",
        budget=token_budget,
        order_cols=[id_col],
        partition_col=["split", entity],
    )
    return d.select(
        id_col,
        entity,
        "quality",
        "dup_2gram_frac",
        "n_tokens",
        "split",
        "batch_id",
        "batch_start_offset",
    )
