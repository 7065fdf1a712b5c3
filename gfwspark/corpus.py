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
from gfwspark.text import ensure_explode_parallelism as _ensure_parallelism

#: (stage_idx, stage_name) in pipeline order — the audit vocabulary.
STAGES: tuple[tuple[int, str], ...] = (
    (1, "quality_gate"),
    (2, "repetition_gate"),
    (3, "exact_dedup"),
    (4, "minhash_near_dedup"),
    (5, "decontaminate"),
    (6, "temporal_split_embargo"),
    (7, "token_budget_pack"),
)


def _stage_frames(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    entity: str,
    ts: str,
    quality_min: float,
    max_dup_2gram: float,
    near_dup_threshold: float,
    decontam_n: int,
    horizon_s: int,
    embargo_s: int,
    token_budget: int,
    materialize_survivors: bool,
    materialize_stages: bool = False,
) -> list[DataFrame]:
    """The pipeline, one frame per completed stage (len == 7, indexed
    by STAGES order).  ``materialize_stages`` additionally
    localCheckpoints the per-stage outputs (1-6; 7 reuses 6's block)
    so an audit that counts every stage touches each subtree exactly
    once and each stage builds from its predecessor's materialized
    blocks — the production audit configuration; without it the stages
    stay one lazy plan."""
    frames: list[DataFrame] = []
    d = docs
    # Gate barrier (materializing runs only): Catalyst pushes a filter
    # on a computed column below Exchanges all the way to the scan,
    # (a) re-deriving the gate expression inside the predicate — the
    # built-in analog of the guide's duplicated-UDF pushdown — and
    # (b) evaluating it at SCAN parallelism, which for a small-file
    # corpus is ONE task.  A localCheckpoint between computing the gate
    # column and filtering on it pins the expensive expression to one
    # evaluation at repartitioned parallelism (measured at sf1.0:
    # repetition gate 31 s -> ~3 s on local[32]).  Lazy (default)
    # builds keep the one-plan contract for oracle replay.
    barrier = materialize_survivors or materialize_stages
    # 1-2: row-local quality + repetition gates (no shuffle beyond the
    # explode-parallelism repartition)
    if barrier and not materialize_stages:
        # fused gate barrier: compute BOTH gate columns in one
        # projection behind one checkpoint, then filter in stage order.
        # dup_2gram_frac is evaluated on the (few) quality-rejected
        # rows too, but one checkpoint pass beats two; the staged-audit
        # path below keeps one checkpoint per stage so each count reads
        # its own materialized frame.
        d = text.with_repetition_stats(
            text.with_quality_score(_ensure_parallelism(d), text_col),
            text_col,
            ns=(2,),
        ).localCheckpoint(eager=True)
        d = d.filter(F.col("quality") >= quality_min)
        frames.append(d)
        d = d.filter(F.col("dup_2gram_frac") <= max_dup_2gram)
        frames.append(d)
    else:
        if barrier:
            d = _ensure_parallelism(d)
        d = text.with_quality_score(d, text_col)
        if barrier:
            d = d.localCheckpoint(eager=True)
        d = d.filter(F.col("quality") >= quality_min)
        if materialize_stages:
            # without this, the audit's n1/n2 counts re-run the
            # raw-corpus scan + gates that the stage-3 build also runs;
            # checkpointing here also lets every later stage read from
            # this block instead of rescanning the source
            d = d.localCheckpoint(eager=True)
        frames.append(d)
        d = text.with_repetition_stats(d, text_col, ns=(2,))
        if barrier:
            d = d.localCheckpoint(eager=True)
        d = d.filter(F.col("dup_2gram_frac") <= max_dup_2gram)
        if materialize_stages:
            d = d.localCheckpoint(eager=True)
        frames.append(d)
    # 3: exact dedup — keep the smallest id per content hash
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    d = (
        d.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if materialize_survivors or materialize_stages:
        # stage-3 output feeds 4 branches (and the audit's n3 count);
        # under materialize_stages the audit contract is every stage
        # builds from its predecessor's blocks, regardless of the
        # survivor-materialization setting
        d = d.localCheckpoint(eager=True)
    frames.append(d)
    # 4: MinHash-LSH near dedup (exact-Jaccard verified) — drop doc_b.
    # Staged rather than via dedup.minhash_near_dups so the shingle
    # frame can share the materialization point: both consumers
    # (signatures, the verify's set-collect) would otherwise re-run
    # the tokenize+shingle+hash explode.  The stream stays RAW
    # (distinct=False): minhash min() is duplicate-insensitive and
    # jaccard_verify collects a SET, so the posting distinct and its
    # full-stream exchange are pure overhead here.
    sh = dedup.shingles(d, id_col=id_col, text_col=text_col, distinct=False)
    if materialize_survivors:
        sh = sh.localCheckpoint(eager=True)
    sig = dedup.minhash_signatures(sh, id_col=id_col)
    cand = dedup.lsh_candidates(sig, id_col=id_col)
    pairs = dedup.jaccard_verify(cand, sh, id_col=id_col, threshold=near_dup_threshold)
    drop_b = pairs.select(F.col("doc_b").alias(id_col)).distinct()
    d = d.join(drop_b, id_col, "left_anti")
    if materialize_stages:
        d = d.localCheckpoint(eager=True)
    frames.append(d)
    # 5: benchmark decontamination — drop any doc sharing an n-gram
    contaminated = text.ngram_decontaminate(
        d, benchmark, n=decontam_n, id_col=id_col, text_col=text_col
    ).select(id_col)
    d = d.join(contaminated, id_col, "left_anti")
    if materialize_stages:
        d = d.localCheckpoint(eager=True)
    frames.append(d)
    # 6: leakage-free temporal split (drops the embargo band)
    d = sources.temporal_split_embargo(
        d, horizon_s=horizon_s, embargo_s=embargo_s, entity=entity, ts=ts
    )
    if materialize_stages:
        d = d.localCheckpoint(eager=True)
    frames.append(d)
    # 7: token counting + contiguous budget packing per (split, entity)
    d = d.withColumn("n_tokens", F.size(text.tokens_col(text_col)).cast("long"))
    d = sources.pack_token_budget_batches(
        d,
        "n_tokens",
        budget=token_budget,
        order_cols=[id_col],
        partition_col=["split", entity],
    )
    frames.append(d)
    return frames


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
    frames = _stage_frames(
        docs, benchmark, id_col, text_col, entity, ts, quality_min,
        max_dup_2gram, near_dup_threshold, decontam_n, horizon_s,
        embargo_s, token_budget, materialize_survivors,
    )
    return frames[-1].select(
        id_col,
        entity,
        "quality",
        "dup_2gram_frac",
        "n_tokens",
        "split",
        "batch_id",
        "batch_start_offset",
    )


def prepare_corpus_audit(
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
    materialize_survivors: bool = True,
) -> DataFrame:
    """The pipeline's data-loss accounting as a first-class frame:
    one row per stage — (stage_idx int, stage string, rows_in long,
    rows_out long, dropped long) — so a 100-TB run's per-gate
    attrition is queryable/persistable rather than scraped from
    stdout.  Stage 7 (packing) drops nothing by construction; its row
    makes that auditable instead of assumed.

    Counting strategy: each stage frame is localCheckpointed
    (materialize_stages), so the 8 counts touch each subtree exactly
    once and downstream stages read their predecessor's materialized
    blocks — the audit costs one extra pass over each stage's
    SURVIVORS, not a recompute of the pipeline per count.  The counts
    are folded into a single 1-row frame (7 crossJoins of 1-row
    aggregates, then checkpointed — bounded at one row) and exploded
    into the per-stage rows, keeping the whole audit one distributed
    plan with no driver-side .count() loop."""
    frames = _stage_frames(
        docs, benchmark, id_col, text_col, entity, ts, quality_min,
        max_dup_2gram, near_dup_threshold, decontam_n, horizon_s,
        embargo_s, token_budget, materialize_survivors,
        materialize_stages=True,
    )

    def _cnt(df: DataFrame, alias: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("long").alias(alias))

    row = _cnt(docs, "n0")
    for i, f in enumerate(frames, start=1):
        row = row.crossJoin(_cnt(f, f"n{i}"))
    # one row; eager so the 7 per-stage selects below don't each
    # re-evaluate the crossJoin-of-aggregates subtree
    row = row.localCheckpoint(eager=True)
    parts = [
        row.select(
            F.lit(idx).cast("int").alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.col(f"n{idx - 1}").alias("rows_in"),
            F.col(f"n{idx}").alias("rows_out"),
            (F.col(f"n{idx - 1}") - F.col(f"n{idx}")).alias("dropped"),
        )
        for idx, name in STAGES
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
