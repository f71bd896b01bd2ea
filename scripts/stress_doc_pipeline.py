"""Full-pipeline stress (round-3 verdict item 1): run
run_document_pipeline end-to-end on the scaled stress corpus
(SPARK_GRAFT_STRESS_SCALE=2 -> 181k docs / ~280 MB), with a
mid-pipeline resume exercised by re-running after a simulated stop.

Protocol:
1. synthesize the deterministic corpus (scripts/stress_dedup.py
   generators) and write it to parquet — the pinned input snapshot;
2. run the pipeline INTERRUPTED: a hook raises after the 'pairs' stage
   commits, simulating a driver loss mid-job;
3. re-run normally: completed stages must be skipped, the job finishes
   from the checkpoint;
4. re-run once more: full no-op (all 6 stages skipped);
5. report per-stage walls, docs/s over the end-to-end corpus, survivor
   breakdown by drop stage.

Run: PYTHONPATH=.:scripts python scripts/stress_doc_pipeline.py
Prints a JSON line; transcribed into BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from stress_dedup import N_DOCS, synth_docs  # noqa: E402


def main() -> None:
    import tempfile

    import light_curve_spark.plans.doc_pipeline as dp
    from light_curve_spark.plans.doc_pipeline import (
        DocPipelineConfig,
        run_document_pipeline,
    )
    from light_curve_spark.session import build_session
    from light_curve_spark.sources.catalog import ParquetSnapshotStorage

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(
        app_name="stress-doc-pipeline", master=f"local[{cpus}]",
        shuffle_partitions=4 * cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="dp-stress-")
    t0 = time.time()
    corpus_path = os.path.join(root, "corpus.parquet")
    synth_docs(spark).write.parquet(corpus_path)
    docs = spark.read.parquet(corpus_path)
    n_docs = docs.count()
    n_bytes = docs.agg(F.sum(F.length("text"))).head()[0]
    gen_s = time.time() - t0

    # eval set: 500 docs that share text with the corpus by construction
    # (contamination stage must do real work)
    ev = (
        docs.filter(F.col("doc_id") % 361 == 0)
        .limit(500)
        .select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
    )
    ev_path = os.path.join(root, "eval.parquet")
    ev.write.parquet(ev_path)
    eval_docs = spark.read.parquet(ev_path)

    cfg = DocPipelineConfig(
        out_root=os.path.join(root, "out"),
        input_snapshot="stress-v1",
        min_quality=0.05,
        contamination_min_shared=2,
    )

    # interrupted first run: die after the pairs stage commits
    real_clusters = dp.dedup_clusters

    def boom(*a, **k):
        raise RuntimeError("simulated driver loss")

    dp.dedup_clusters = boom
    t1 = time.time()
    try:
        run_document_pipeline(spark, docs, cfg, eval_docs=eval_docs)
        raise AssertionError("interrupt hook did not fire")
    except RuntimeError:
        pass
    finally:
        dp.dedup_clusters = real_clusters
    interrupted_s = time.time() - t1

    t2 = time.time()
    stats = run_document_pipeline(spark, docs, cfg, eval_docs=eval_docs)
    resumed_s = time.time() - t2
    assert stats["stages_skipped"] == 2, stats

    t3 = time.time()
    noop = run_document_pipeline(spark, docs, cfg, eval_docs=eval_docs)
    assert noop["stages_run"] == 0 and noop["stages_skipped"] == 7, noop
    noop_s = time.time() - t3

    st = ParquetSnapshotStorage(spark, cfg.out_root)
    by_stage = {
        r.drop_stage or "kept": r["count"]
        for r in st.read("dp_doc_status").groupBy("drop_stage").count().collect()
    }
    total_wall = interrupted_s + resumed_s
    res = {
        "n_docs": n_docs,
        "corpus_mb": round(n_bytes / 1e6, 1),
        "cpus": cpus,
        "gen_s": round(gen_s, 1),
        "interrupted_run_s": round(interrupted_s, 1),
        "resumed_run_s": round(resumed_s, 1),
        "noop_resume_s": round(noop_s, 2),
        "end_to_end_s": round(total_wall, 1),
        "docs_per_s": int(n_docs / total_wall),
        "stage_walls_s": {
            k.removesuffix("_sec"): round(v, 1)
            for k, v in stats.items()
            if k.endswith("_sec")
        },
        "doc_status_breakdown": by_stage,
    }
    assert sum(by_stage.values()) == N_DOCS
    print(json.dumps(res))


if __name__ == "__main__":
    main()
