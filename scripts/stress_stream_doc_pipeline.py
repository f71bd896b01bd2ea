"""Streaming document pipeline stress (round-4 verdict item 3): the
stream-fed pipeline (streaming/documents.run_stream_document_pipeline)
at the batch twin's corpus scale, with a kill mid-stream.

Protocol:
1. synthesize the deterministic stress corpus (scripts/stress_dedup
   generators; SPARK_GRAFT_STRESS_SCALE scales it) + the 500-doc eval
   set used by the batch stress;
2. deliver the corpus as N_ARRIVALS arrival batches (doc_id mod split,
   so duplicate partners arrive in DIFFERENT batches and retroactive
   revocation does real work); each delivery is one availableNow drain;
3. KILL the stream during a mid-run delivery, inside the crash window
   the idempotency design targets: after the MinHash index append
   committed but before the label-forest fold — the rerun must
   re-deliver the batch, no-op the index append, and complete the fold;
4. after all deliveries, derive keep/drop with read_document_status and
   compare the KEPT SET against the batch pipeline
   (plans/doc_pipeline.run_document_pipeline) on the same corpus+eval;
5. report stream wall, docs/s, and the equality verdict.

Run: PYTHONPATH=.:scripts python scripts/stress_stream_doc_pipeline.py
Prints a JSON line; transcribed into BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from stress_dedup import synth_docs  # noqa: E402

N_ARRIVALS = 6
KILL_AT_DELIVERY = 3


def main() -> None:
    import light_curve_spark.operators.dedup as dd
    from light_curve_spark.plans.caching import release_operator_caches
    from light_curve_spark.plans.doc_pipeline import (
        DocPipelineConfig,
        run_document_pipeline,
    )
    from light_curve_spark.session import build_session
    from light_curve_spark.sources.catalog import ParquetSnapshotStorage
    from light_curve_spark.streaming.documents import (
        read_document_status,
        run_stream_document_pipeline,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(
        app_name="stress-stream-doc", master=f"local[{cpus}]",
        shuffle_partitions=4 * cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="sdp-stress-")
    corpus_path = os.path.join(root, "corpus.parquet")
    synth_docs(spark).write.parquet(corpus_path)
    docs = spark.read.parquet(corpus_path)
    n_docs = docs.count()
    ev = (
        docs.filter(F.col("doc_id") % 361 == 0)
        .limit(500)
        .select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
    )
    ev.write.parquet(os.path.join(root, "eval.parquet"))
    eval_docs = spark.read.parquet(os.path.join(root, "eval.parquet"))

    # ---- batch reference ------------------------------------------------
    cfg = DocPipelineConfig(
        out_root=os.path.join(root, "batch"),
        input_snapshot="stress-v1",
        min_quality=0.05,
        contamination_min_shared=2,
    )
    t0 = time.time()
    run_document_pipeline(spark, docs, cfg, eval_docs=eval_docs)
    batch_s = time.time() - t0
    st_b = ParquetSnapshotStorage(spark, cfg.out_root)
    batch_kept = {
        r.doc_id
        for r in st_b.read("dp_doc_status")
        .filter(F.col("drop_stage").isNull())
        .select("doc_id")
        .collect()
    }
    release_operator_caches()

    # ---- streamed arrival ----------------------------------------------
    schema = StructType(
        [StructField("doc_id", LongType(), True),
         StructField("text", StringType(), True)]
    )
    in_dir = os.path.join(root, "in")
    ckpt = os.path.join(root, "sckpt")
    storage = ParquetSnapshotStorage(spark, os.path.join(root, "stream"))

    # run_stream_document_pipeline imports incremental_dedup_clusters
    # from operators.dedup at CALL time, so patching the source module
    # before the call injects the crash
    real_fold = dd.incremental_dedup_clusters
    state = {"arm": False}

    def killing_fold(*a, **k):
        if state["arm"]:
            state["arm"] = False
            raise RuntimeError("simulated driver loss mid-fold")
        return real_fold(*a, **k)

    stream_s = 0.0
    killed = False
    delivery_walls = []
    for i in range(N_ARRIVALS):
        docs.filter(F.col("doc_id") % N_ARRIVALS == i).coalesce(4).write.parquet(
            f"{in_dir}/b{i}"
        )
        t1 = time.time()
        if i == KILL_AT_DELIVERY:
            # crash window: index append committed, labels fold not
            state["arm"] = True
            dd.incremental_dedup_clusters = killing_fold
            try:
                run_stream_document_pipeline(
                    spark, in_dir + "/*", schema, storage, ckpt,
                    eval_docs=eval_docs,
                )
                raise AssertionError("kill hook did not fire")
            except Exception as exc:  # noqa: BLE001 — StreamingQueryException
                assert "simulated driver loss" in str(exc), exc
                killed = True
            finally:
                dd.incremental_dedup_clusters = real_fold
            release_operator_caches()
            # restart: checkpoint re-delivers the failed batch
            run_stream_document_pipeline(
                spark, in_dir + "/*", schema, storage, ckpt,
                eval_docs=eval_docs,
            )
        else:
            run_stream_document_pipeline(
                spark, in_dir + "/*", schema, storage, ckpt,
                eval_docs=eval_docs,
            )
        delivery_walls.append(round(time.time() - t1, 1))
        stream_s += time.time() - t1
        release_operator_caches()

    status = read_document_status(storage, min_quality=0.05)
    stream_kept = {
        r.doc_id
        for r in status.filter(F.col("drop_stage").isNull())
        .select("doc_id")
        .collect()
    }

    # ---- round-6: fold-to-snapshot compaction ---------------------------
    from light_curve_spark.streaming.compact import (
        compact_stream_state,
        materialize_document_status,
    )

    def _du(path: str) -> tuple[int, int]:
        total, files = 0, 0
        for dp, _dirs, fs in os.walk(path):
            for f in fs:
                total += os.path.getsize(os.path.join(dp, f))
                files += 1
        return total, files

    def _read_wall() -> float:
        best = float("inf")
        for _ in range(2):
            t = time.time()
            read_document_status(storage, min_quality=0.05).filter(
                F.col("drop_stage").isNull()
            ).count()
            best = min(best, time.time() - t)
        return best

    pre_wall = _read_wall()
    pre_bytes, pre_files = _du(storage.root)
    t2 = time.time()
    compact_stream_state(storage, prefix="dpx")
    compact_s = time.time() - t2
    post_wall = _read_wall()
    post_bytes, post_files = _du(storage.root)
    compact_kept = {
        r.doc_id
        for r in read_document_status(storage, min_quality=0.05)
        .filter(F.col("drop_stage").isNull())
        .select("doc_id")
        .collect()
    }
    t3 = time.time()
    materialize_document_status(storage, prefix="dpx", min_quality=0.05)
    mat_s = time.time() - t3
    t4 = time.time()
    n_mat = storage.read_snapshot("dpx_status").filter(
        F.col("drop_stage").isNull()
    ).count()
    mat_read_s = time.time() - t4
    release_operator_caches()

    # ---- round-6: tombstone deletes at stress scale ---------------------
    # delete every 97th doc (~1%): hits dup winners AND losers,
    # contamination carriers, and background docs. Status with
    # tombstones must equal a batch run on the reduced corpus; then
    # compaction must physically erase every trace and hand reads back
    # to the fast persisted-forest path.
    from light_curve_spark.streaming.documents import tombstone_documents

    dead_df = docs.select("doc_id").filter(F.col("doc_id") % 97 == 0)
    n_dead = dead_df.count()
    t5 = time.time()
    tombstone_documents(storage, dead_df, prefix="dpx")
    tomb_append_s = time.time() - t5
    t6 = time.time()
    tomb_kept = {
        r.doc_id
        for r in read_document_status(storage, min_quality=0.05)
        .filter(F.col("drop_stage").isNull())
        .select("doc_id")
        .collect()
    }
    tomb_read_s = time.time() - t6  # re-derivation path (forest dirty)
    release_operator_caches()

    cfg2 = DocPipelineConfig(
        out_root=os.path.join(root, "batch_reduced"),
        input_snapshot="stress-v2",
        min_quality=0.05,
        contamination_min_shared=2,
    )
    t7 = time.time()
    run_document_pipeline(
        spark, docs.join(dead_df, "doc_id", "left_anti"), cfg2,
        eval_docs=eval_docs,
    )
    batch_reduced_s = time.time() - t7
    st_r = ParquetSnapshotStorage(spark, cfg2.out_root)
    reduced_kept = {
        r.doc_id
        for r in st_r.read("dp_doc_status")
        .filter(F.col("drop_stage").isNull())
        .select("doc_id")
        .collect()
    }
    release_operator_caches()

    t8 = time.time()
    compact_stream_state(storage, prefix="dpx")
    erase_s = time.time() - t8
    erase_read_s = _read_wall()  # fast path again (forest rebuilt clean)
    leftovers = 0
    for tbl in ("dpx_attrs", "dpx_index", "dpx_pairs", "dpx_contam_matches"):
        df = storage.read(tbl)
        for c in ("doc_id", "train_id", "doc_a", "doc_b"):
            if c in df.columns:
                leftovers += df.join(
                    dead_df.withColumnRenamed("doc_id", c), c, "left_semi"
                ).count()
    forest = storage.read_snapshot("dpx_labels")
    leftovers += forest.join(dead_df, "doc_id", "left_semi").count()
    leftovers += forest.join(
        dead_df.withColumnRenamed("doc_id", "keep_id"), "keep_id", "left_semi"
    ).count()
    erased_kept = {
        r.doc_id
        for r in read_document_status(storage, min_quality=0.05)
        .filter(F.col("drop_stage").isNull())
        .select("doc_id")
        .collect()
    }
    release_operator_caches()

    res = {
        "n_docs": n_docs,
        "cpus": cpus,
        "n_arrival_batches": N_ARRIVALS,
        "killed_mid_stream": killed,
        "kill_at_delivery": KILL_AT_DELIVERY,
        "stream_total_s": round(stream_s, 1),
        "delivery_walls_s": delivery_walls,
        "stream_docs_per_s": int(n_docs / stream_s),
        "batch_pipeline_s": round(batch_s, 1),
        "n_kept_stream": len(stream_kept),
        "n_kept_batch": len(batch_kept),
        "kept_sets_equal": stream_kept == batch_kept,
        "compact_s": round(compact_s, 1),
        "status_read_s_pre_compact": round(pre_wall, 2),
        "status_read_s_post_compact": round(post_wall, 2),
        "storage_mb_pre_compact": round(pre_bytes / 1e6, 1),
        "storage_mb_post_compact": round(post_bytes / 1e6, 1),
        "files_pre_compact": pre_files,
        "files_post_compact": post_files,
        "kept_equal_post_compact": compact_kept == stream_kept,
        "materialize_status_s": round(mat_s, 1),
        "materialized_status_read_s": round(mat_read_s, 2),
        "n_kept_materialized": n_mat,
        "n_tombstoned": n_dead,
        "tombstone_append_s": round(tomb_append_s, 1),
        "status_read_s_tombstone_rederive": round(tomb_read_s, 2),
        "batch_reduced_s": round(batch_reduced_s, 1),
        "tombstone_kept_equal_batch_reduced": tomb_kept == reduced_kept,
        "erase_compact_s": round(erase_s, 1),
        "status_read_s_post_erase": round(erase_read_s, 2),
        "erased_rows_remaining": leftovers,
        "kept_equal_post_erase": erased_kept == tomb_kept,
    }
    print(json.dumps(res))
    if stream_kept != batch_kept:
        only_s = sorted(stream_kept - batch_kept)[:10]
        only_b = sorted(batch_kept - stream_kept)[:10]
        print("DIVERGENCE stream-only:", only_s, "batch-only:", only_b)
        sys.exit(1)
    if compact_kept != stream_kept or n_mat != len(stream_kept):
        print("COMPACTION DIVERGENCE")
        sys.exit(1)
    if tomb_kept != reduced_kept:
        only_s = sorted(tomb_kept - reduced_kept)[:10]
        only_b = sorted(reduced_kept - tomb_kept)[:10]
        print("TOMBSTONE DIVERGENCE stream-only:", only_s,
              "batch-only:", only_b)
        sys.exit(1)
    if leftovers or erased_kept != tomb_kept:
        print("ERASURE DIVERGENCE leftovers:", leftovers)
        sys.exit(1)


if __name__ == "__main__":
    main()
