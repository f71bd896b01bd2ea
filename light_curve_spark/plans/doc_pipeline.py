"""The composed LLM-training-data job (round-3 verdict item 1): every
dedup/text operator chained as ONE resumable, lineage-tracked pipeline —
the product a 100 TB corpus owner actually runs:

    exact dedup -> MinHash+LSH near-dup pairs -> star connected
    components -> semantic (embedding-ANN) near-dup clusters [optional]
    -> train/eval decontamination -> language + quality filters ->
    token counts -> clean corpus + per-doc lineage + stats

Resume model — STAGE snapshots, not doc groups: the sequence pipeline
(:mod:`light_curve_spark.plans.pipeline`) shards its input into doc
groups because every operator there is per-sequence. Dedup is GLOBAL —
near-dup pairs cross any input split — so sharding cannot checkpoint it.
Instead each stage materializes its (doc_id-keyed, text-free) output as
a storage snapshot and records itself in a JSON checkpoint; a restarted
run skips completed stages and reads their snapshots. Stage outputs
carry doc ids + small attributes only — text is always re-read from the
pinned ``input_snapshot``, so checkpoints stay orders of magnitude
smaller than the corpus.

Lineage: ``dp_doc_status`` holds one row per input document — kept or
the exact stage that dropped it (and the survivor it lost to, for dedup
drops). ``dp_metrics`` holds one row per stage run: rows in/out, wall,
input snapshot. ``dp_stats`` is the per-language corpus rollup
(docs/tokens kept) a training-mix planner consumes.

Scale posture: every stage is the already-audited operator plan
(PLANS.md) — digest groupBy, banded-LSH equi-joins, O(log n) star
contraction, inverted-index decontamination, pure-codegen filters. The
pipeline adds NO new shuffle of its own: stage boundaries are parquet
snapshots partitioned by the same keys the next stage shuffles on.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from light_curve_spark.operators.dedup import (
    cross_ngram_contamination,
    dedup_clusters,
    exact_dedup,
    minhash_lsh_pairs,
)
from light_curve_spark.operators.text import document_attributes
from light_curve_spark.plans.caching import cache_scope

STAGES = (
    "exact", "pairs", "clusters", "semantic", "contamination", "filters",
    "finalize",
)


@dataclass
class DocPipelineConfig:
    out_root: str
    input_snapshot: str = "unversioned"
    ngram_n: int = 3
    num_hashes: int = 16
    bands: int = 4
    minhash_threshold: float = 0.5
    contamination_min_shared: int = 2
    # df-prune for the cross-corpus gram join: ultra-common grams carry
    # no contamination signal and quadratically inflate the join (the 2x
    # growth run measured the stage superlinear with a fixed eval set —
    # BENCH.md); lower this on huge corpora
    contamination_max_df: int = 1000
    min_quality: float = 0.0
    allowed_langs: tuple[str, ...] = field(default_factory=tuple)  # empty = all
    text_col: str = "text"
    # semantic (embedding-ANN) dedup stage — active when the caller
    # passes doc_embeddings; LSH-bucketed cosine pairs, never all-pairs
    semantic_threshold: float = 0.95
    semantic_n_planes: int = 8


def _ckpt_path(cfg: DocPipelineConfig) -> str:
    return os.path.join(cfg.out_root, "_doc_checkpoint.json")


def _load_ckpt(cfg: DocPipelineConfig) -> dict:
    path = _ckpt_path(cfg)
    if os.path.exists(path):
        with open(path) as f:
            state = json.load(f)
        if state.get("input_snapshot") == cfg.input_snapshot:
            return state
    return {"input_snapshot": cfg.input_snapshot, "done_stages": []}


def _save_ckpt(cfg: DocPipelineConfig, state: dict) -> None:
    os.makedirs(cfg.out_root, exist_ok=True)
    tmp = _ckpt_path(cfg) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, _ckpt_path(cfg))


def run_document_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    cfg: DocPipelineConfig,
    eval_docs: DataFrame | None = None,
    doc_embeddings: DataFrame | None = None,
    storage=None,
) -> dict:
    """Run (or resume) the composed document job. Returns run stats
    (per-stage wall seconds; stages skipped on resume).

    ``doc_embeddings`` (doc_id, embedding: array<float>) enables the
    SEMANTIC dedup stage (round-4 verdict item 4): embedding-cosine
    near-dup pairs over the current survivor set — LSH-bucketed
    hyperplane candidates, exact-cosine verified, never all-pairs (the
    already-fixture-oracled :func:`embedding_cosine_pairs_lsh`) —
    resolved through the same star-contraction used for text pairs.
    The stage runs AFTER the text cluster stage, on its survivors: each
    stage operates on the current survivor set (same contract as
    contamination/filters), so a doc whose only semantic partner was
    already dropped as a text dup is NOT transitively chained through
    that dropped doc. Drops carry lineage stage tag ``semantic``; the
    discovered pairs persist as ``dp_pairs_semantic``."""
    from light_curve_spark.sources.catalog import get_storage

    storage = storage or get_storage(spark, cfg.out_root)
    state = _load_ckpt(cfg)
    done = set(state["done_stages"])
    stats = {"stages_run": 0, "stages_skipped": len(done)}

    def finish(stage: str, t0: float, rows_in: int, rows_out: int) -> None:
        metrics = spark.createDataFrame(
            [
                (
                    stage,
                    cfg.input_snapshot,
                    rows_in,
                    rows_out,
                    int((time.time() - t0) * 1000),
                )
            ],
            "stage string, input_snapshot string, rows_in long, "
            "rows_out long, wall_ms long",
        )
        storage.append(metrics, "dp_metrics")
        state["done_stages"].append(stage)
        _save_ckpt(cfg, state)
        stats["stages_run"] += 1
        stats[f"{stage}_sec"] = time.time() - t0

    def losers(stage: str) -> DataFrame:
        # .distinct(): a crash between a stage's append and its
        # checkpoint record makes the rerun re-append the same loser
        # rows; anti-joins don't care, but counts must not double
        return (
            storage.read("dp_losers")
            .filter(F.col("stage") == stage)
            .distinct()
        )

    def survivors_after(*stages: str) -> DataFrame:
        # anti-join the RECORDED losers of every listed stage — never
        # gate on this call's arguments: a resume invoked without
        # eval_docs/doc_embeddings after those stages already ran (and
        # appended losers) must still exclude their drops, or the clean
        # corpus would contradict dp_doc_status (round-5 review
        # finding). A stage that never ran simply has no loser rows and
        # the anti-join is a no-op.
        out = docs
        for s in stages:
            out = out.join(
                losers(s).select("doc_id"), "doc_id", "left_anti"
            )
        return out

    tc = cfg.text_col

    # -- stage 1: exact dedup --------------------------------------------
    if "exact" not in done:
        t0 = time.time()
        with cache_scope():
            groups = exact_dedup(docs, text_col=tc, min_dups=2)
            dig = docs.select(
                "doc_id",
                F.md5(
                    F.regexp_replace(F.lower(F.trim(F.col(tc))), r"\s+", " ")
                ).alias("digest"),
            )
            drop = (
                # join shape: digest-keyed equi-join; AQE broadcasts the
                # duplicate-group side when it is small enough
                dig.join(groups, "digest")
                .filter(F.col("doc_id") != F.col("keep_id"))
                .select(
                    "doc_id",
                    F.lit("exact").alias("stage"),
                    F.col("keep_id").alias("lost_to"),
                )
            )
            n_in = docs.count()
            storage.append(drop, "dp_losers")
            n_drop = losers("exact").count()
        finish("exact", t0, n_in, n_in - n_drop)

    # -- stage 2: near-dup pairs (MinHash + banded LSH) ------------------
    if "pairs" not in done:
        t0 = time.time()
        with cache_scope():
            surv = survivors_after("exact")
            pairs = minhash_lsh_pairs(
                surv,
                n=cfg.ngram_n,
                num_hashes=cfg.num_hashes,
                bands=cfg.bands,
                threshold=cfg.minhash_threshold,
                text_col=tc,
            )
            storage.append(pairs, "dp_pairs")
            n_in = surv.count()
            n_pairs = storage.read_snapshot("dp_pairs").count()
        finish("pairs", t0, n_in, n_pairs)

    # -- stage 3: duplicate clusters (star CC) ---------------------------
    if "clusters" not in done:
        t0 = time.time()
        with cache_scope():
            # latest snapshot only: a crashed pairs attempt may have left
            # an extra identical snapshot; each snapshot is complete
            pairs = storage.read_snapshot("dp_pairs")
            labels = dedup_clusters(pairs)  # auto -> star, O(log n) rounds
            drop = labels.filter(F.col("doc_id") != F.col("keep_id")).select(
                "doc_id",
                F.lit("clusters").alias("stage"),
                F.col("keep_id").alias("lost_to"),
            )
            storage.append(drop, "dp_losers")
            n_in = survivors_after("exact").count()
            n_drop = losers("clusters").count()
        finish("clusters", t0, n_in, n_in - n_drop)

    # -- stage 4: semantic (embedding-ANN) near-dup clusters -------------
    if "semantic" not in done and doc_embeddings is not None:
        t0 = time.time()
        with cache_scope():
            from light_curve_spark.operators.similarity import (
                embedding_cosine_pairs_lsh,
            )

            surv = survivors_after("exact", "clusters")
            # restrict embeddings to the current survivors BEFORE any
            # bucketing — dropped docs must not generate candidates
            emb = doc_embeddings.join(
                surv.select("doc_id"), "doc_id", "left_semi"
            )
            sem_pairs = embedding_cosine_pairs_lsh(
                emb,
                threshold=cfg.semantic_threshold,
                n_planes=cfg.semantic_n_planes,
                id_col="doc_id",
            ).select(
                F.col("id_a").alias("doc_a"),
                F.col("id_b").alias("doc_b"),
                "cosine",
            )
            storage.append(sem_pairs, "dp_pairs_semantic")
            labels = dedup_clusters(
                storage.read_snapshot("dp_pairs_semantic")
            )
            drop = labels.filter(F.col("doc_id") != F.col("keep_id")).select(
                "doc_id",
                F.lit("semantic").alias("stage"),
                F.col("keep_id").alias("lost_to"),
            )
            storage.append(drop, "dp_losers")
            n_in = surv.count()
            n_drop = losers("semantic").count()
        finish("semantic", t0, n_in, n_in - n_drop)
    elif "semantic" not in done:
        state["done_stages"].append("semantic")
        _save_ckpt(cfg, state)

    # -- stage 5: train/eval decontamination -----------------------------
    if "contamination" not in done and eval_docs is not None:
        t0 = time.time()
        with cache_scope():
            surv = survivors_after("exact", "clusters", "semantic")
            hits = cross_ngram_contamination(
                surv,
                eval_docs,
                n=cfg.ngram_n,
                max_df=cfg.contamination_max_df,
                min_shared=cfg.contamination_min_shared,
                text_col=tc,
            )
            drop = (
                hits.groupBy(F.col("train_id").alias("doc_id"))
                .agg(F.min("eval_id").alias("lost_to"))
                .select(
                    "doc_id",
                    F.lit("contamination").alias("stage"),
                    "lost_to",
                )
            )
            storage.append(drop, "dp_losers")
            n_in = surv.count()
            n_drop = losers("contamination").count()
        finish("contamination", t0, n_in, n_in - n_drop)
    elif "contamination" not in done:
        state["done_stages"].append("contamination")
        _save_ckpt(cfg, state)

    # -- stage 6: language + quality filters -----------------------------
    if "filters" not in done:
        t0 = time.time()
        with cache_scope():
            surv = survivors_after(
                "exact", "clusters", "semantic", "contamination"
            )
            # one projection pass, zero joins — lang/quality are pure
            # per-row expressions (see document_attributes)
            attrs = document_attributes(surv, text_col=tc)
            bad = F.col("quality") < F.lit(cfg.min_quality)
            if cfg.allowed_langs:
                bad = bad | ~F.col("lang_pred").isin(*cfg.allowed_langs)
            drop = attrs.filter(bad).select(
                "doc_id",
                F.lit("filters").alias("stage"),
                F.lit(None).cast("long").alias("lost_to"),
            )
            storage.append(drop, "dp_losers")
            n_in = surv.count()
            n_drop = losers("filters").count()
        finish("filters", t0, n_in, n_in - n_drop)

    # -- stage 7: finalize — clean corpus, per-doc lineage, stats --------
    if "finalize" not in done:
        t0 = time.time()
        with cache_scope():
            surv = survivors_after(
                "exact", "clusters", "semantic", "contamination", "filters"
            )
            # corpus + attributes in one pass — no doc_id join at all
            clean = document_attributes(surv, text_col=tc, include_input=True)
            # partition the clean corpus by predicted language: a
            # training-mix consumer filters by lang, and at 100 TB that
            # filter must prune at the source, not post-scan. Within each
            # language directory, files are range-clustered on quality
            # (round 5): a mix planner's quality-threshold filter then
            # prunes row groups via footer min/max — the second skipping
            # axis the partition key can't give
            storage.append(
                clean,
                "dp_clean",
                partition_by=["lang_pred"],
                cluster_by=["quality"],
            )

            # .distinct(): a crash between a stage's append and its
            # checkpoint record re-appends identical loser rows on the
            # rerun; without it this left join would emit duplicate
            # status rows and break the one-row-per-document contract
            all_losers = storage.read("dp_losers").distinct()
            status = docs.select("doc_id").join(
                all_losers.select(
                    "doc_id",
                    F.col("stage").alias("drop_stage"),
                    "lost_to",
                ),
                "doc_id",
                "left",
            )
            storage.append(status, "dp_doc_status")

            stats_tbl = (
                storage.read_snapshot("dp_clean")
                .groupBy("lang_pred")
                .agg(
                    F.count("*").alias("n_docs"),
                    F.sum("ws_tokens").alias("n_tokens"),
                    F.sum("bpe_tokens").alias("n_bpe_tokens"),
                    F.avg("quality").alias("mean_quality"),
                )
                .withColumn("input_snapshot", F.lit(cfg.input_snapshot))
            )
            storage.append(stats_tbl, "dp_stats")
            n_in = docs.count()
            n_out = storage.read_snapshot("dp_clean").count()
        finish("finalize", t0, n_in, n_out)

    return stats
