"""Round-7 regression tests.

1. Empty-partitioned-snapshot poisoning (round-6 ADVICE highs + medium):
   an empty hive-partitioned append/replace used to write only _SUCCESS,
   making every later read of the table raise UNABLE_TO_INFER_SCHEMA.
   The storage layer now rewrites such snapshots non-partitioned (schema-
   bearing), so an all-tombstoned delivery or a delete-everything
   compaction leaves the table readable.
2. tombstone_documents accepts string ids (ADVICE low).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_empty_partitioned_append_stays_readable(spark, tmp_path):
    from light_curve_spark.sources.catalog import ParquetSnapshotStorage

    st = ParquetSnapshotStorage(spark, str(tmp_path / "s"))
    df = spark.range(10).select(
        F.col("id").alias("doc_id"), F.pmod(F.col("id"), F.lit(4)).alias("_pb")
    )
    st.append(df, "t", partition_by=["_pb"], meta={"batch_id": "b1"})
    # the NON-empty append must stay hive-partitioned (the rewrite guard
    # must not misread '_pb=N' dirs as metadata just because they start
    # with an underscore)
    import os

    snap0 = st.snapshots("t")[0]["path"]
    assert [d for d in os.listdir(snap0) if d.startswith("_pb=")]
    # the poison case: zero rows into a partitioned append
    st.append(df.filter(F.col("doc_id") < 0), "t", partition_by=["_pb"],
              meta={"batch_id": "b2"})
    out = st.read("t")
    assert out.count() == 10
    assert set(out.columns) == {"doc_id", "_pb"}
    # partition pruning column still filterable across the union
    assert out.filter(F.col("_pb") == 1).count() == df.filter(
        F.pmod(F.col("id"), F.lit(4)) == 1
    ).count()
    # batch ids recorded for BOTH snapshots (idempotency probes intact)
    assert [m["batch_id"] for m in st.snapshot_metas("t")] == ["b1", "b2"]


def test_empty_partitioned_replace_stays_readable(spark, tmp_path):
    from light_curve_spark.sources.catalog import ParquetSnapshotStorage

    st = ParquetSnapshotStorage(spark, str(tmp_path / "s"))
    df = spark.range(6).select(
        F.col("id").alias("doc_id"), F.pmod(F.col("id"), F.lit(3)).alias("_pb")
    )
    st.append(df, "t", partition_by=["_pb"])
    # delete-everything compaction: replace with zero rows
    st.replace(df.filter(F.col("doc_id") < 0), "t", partition_by=["_pb"],
               meta={"compacted": True})
    out = st.read("t")
    assert out.count() == 0
    assert set(out.columns) == {"doc_id", "_pb"}


def test_all_tombstoned_minhash_batch_keeps_index_readable(spark, tmp_path):
    """End-to-end ADVICE-high repro: tombstone ids, deliver a batch of
    ONLY those ids, then deliver a fresh batch — the index must still be
    readable and the fresh delivery must pair against batch 1."""
    from light_curve_spark.operators.dedup import (
        incremental_minhash_pairs,
        tombstone_minhash,
    )
    from light_curve_spark.plans.caching import release_operator_caches
    from light_curve_spark.sources.catalog import ParquetSnapshotStorage

    st = ParquetSnapshotStorage(spark, str(tmp_path / "mh"))
    text = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, text + f" tail{i % 2}") for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    incremental_minhash_pairs(st, docs.filter("doc_id < 4"), threshold=0.1)
    tombstone_minhash(st, [100, 101], prefix="mh")
    # batch of ONLY tombstoned ids -> empty after the anti-join
    dead = spark.createDataFrame(
        [(100, text), (101, text)], "doc_id long, text string"
    )
    incremental_minhash_pairs(st, dead, threshold=0.1)
    # the index must still be readable and a fresh batch must fold
    pairs = incremental_minhash_pairs(st, docs.filter("doc_id >= 4"), threshold=0.1)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    assert got, "fresh batch found no pairs against the stored index"
    assert all(a < 100 and b < 100 for a, b in got)
    release_operator_caches()


def test_or_amplified_lsh_dedups_before_verify(spark):
    """Round-6 verdict item 5: the T>1 path now dedups candidate pairs
    BEFORE the cosine. Gate: the T-table pair set must equal the union
    of the T single-table runs (which verify inline, the old path) —
    same pairs, same cosine values."""
    import numpy as np

    from light_curve_spark.operators.similarity import embedding_cosine_pairs_lsh

    rng = np.random.default_rng(11)
    base = rng.normal(size=(40, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        # planted near-dup twin of each vector
        rows.append((1000 + i, [float(x) for x in v + rng.normal(scale=0.01, size=16)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    T = 3
    amp = {
        (r.id_a, r.id_b, round(r.cosine, 12))
        for r in embedding_cosine_pairs_lsh(
            emb, threshold=0.9, n_planes=6, seed=42, n_tables=T
        ).collect()
    }
    single = set()
    for t in range(T):
        single |= {
            (r.id_a, r.id_b, round(r.cosine, 12))
            for r in embedding_cosine_pairs_lsh(
                emb, threshold=0.9, n_planes=6, seed=42 + 1000 * t, n_tables=1
            ).collect()
        }
    assert amp == single and amp
    from light_curve_spark.plans.caching import release_operator_caches

    release_operator_caches()


def _fab_doc_state(spark, st, attrs_ids, pairs, forest):
    """Fabricate minimal document-pipeline state: attrs + pairs (edge
    persistence precondition) + a labels forest snapshot."""
    attrs = spark.createDataFrame(
        [(i, "en", 0.9, 10) for i in attrs_ids],
        "doc_id long, lang_pred string, quality double, ws_tokens long",
    )
    pdf = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    fdf = spark.createDataFrame(forest, "doc_id long, keep_id long")
    st.append(attrs, "dpx_attrs", meta={"batch_id": "b1"})
    st.append(pdf, "dpx_pairs", meta={"batch_id": "b1"})
    st.append(fdf, "dpx_labels")


def _status_map(st):
    from light_curve_spark.streaming.documents import read_document_status

    return {
        r.doc_id: r.drop_stage for r in read_document_status(st, "dpx").collect()
    }


def test_scoped_forest_rederivation_split_and_merge(spark, tmp_path):
    """Round-6 verdict item 6: after a document tombstone, cluster
    re-derivation is scoped to AFFECTED components. Chain 1-2-3 splits
    when 2 is deleted (1 and 3 both become kept); triangle 11-12-13
    stays merged through the direct 11-13 edge (13 stays a dup); the
    untouched cluster 21-22 splices in from the persisted forest."""
    from light_curve_spark.plans.caching import release_operator_caches
    from light_curve_spark.sources.catalog import ParquetSnapshotStorage
    from light_curve_spark.streaming.documents import tombstone_documents

    st = ParquetSnapshotStorage(spark, str(tmp_path / "s"))
    _fab_doc_state(
        spark, st,
        attrs_ids=[1, 2, 3, 11, 12, 13, 21, 22],
        pairs=[(1, 2), (2, 3), (11, 12), (12, 13), (11, 13), (21, 22)],
        forest=[(1, 1), (2, 1), (3, 1), (11, 11), (12, 11), (13, 11), (21, 21), (22, 21)],
    )
    tombstone_documents(st, [2, 12], prefix="dpx")
    status = _status_map(st)
    assert 2 not in status and 12 not in status  # deleted docs gone
    assert status[13] == "dup" and status[22] == "dup"
    assert status[1] is None and status[3] is None  # split cluster: both kept
    assert status[11] is None and status[21] is None
    release_operator_caches()


def test_scoped_forest_rederivation_unfolded_edge(spark, tmp_path):
    """Crash-window completeness: an edge persisted in pairs but not yet
    folded into the labels forest (doc 31 missing from the forest) makes
    its component dirty, so the scoped re-derivation still absorbs it —
    exactly like the previous full re-derivation did."""
    from light_curve_spark.plans.caching import release_operator_caches
    from light_curve_spark.sources.catalog import ParquetSnapshotStorage
    from light_curve_spark.streaming.documents import tombstone_documents

    st = ParquetSnapshotStorage(spark, str(tmp_path / "s"))
    _fab_doc_state(
        spark, st,
        attrs_ids=[1, 2, 21, 22, 31],
        pairs=[(1, 2), (21, 22), (21, 31)],
        forest=[(1, 1), (2, 1), (21, 21), (22, 21)],  # 31 not folded yet
    )
    tombstone_documents(st, [2], prefix="dpx")
    status = _status_map(st)
    assert status[1] is None          # lost its only neighbor -> kept
    assert status[21] is None
    assert status[22] == "dup" and status[31] == "dup"
    release_operator_caches()


def test_tombstone_documents_accepts_string_ids(spark, tmp_path):
    """ADVICE low: the old ad-hoc int(i) coercion raised on string doc
    ids. Fabricate the minimal edge-persistence precondition state, then
    tombstone string ids — must not raise, stored as strings."""
    from light_curve_spark.sources.catalog import ParquetSnapshotStorage
    from light_curve_spark.streaming.documents import tombstone_documents

    st = ParquetSnapshotStorage(spark, str(tmp_path / "dp"))
    attrs = spark.createDataFrame([("a", 0.5)], "doc_id string, quality double")
    pairs = spark.createDataFrame([("a", "b", 1.0)],
                                  "doc_a string, doc_b string, jaccard double")
    st.append(attrs, "dpx_attrs", meta={"batch_id": "b1"})
    st.append(pairs, "dpx_pairs", meta={"batch_id": "b1"})
    tombstone_documents(st, ["a", "b"], prefix="dpx")
    tset = {r.doc_id for r in st.read("dpx_tombstones").collect()}
    assert tset == {"a", "b"}
