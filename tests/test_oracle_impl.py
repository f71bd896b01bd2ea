"""The fixture-oracle reference implementations (scripts/oracle_impl)
must agree with Spark's hash family and the engine's generators —
otherwise the fixture oracles prove nothing."""

import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo/scripts")


def test_xxh64_matches_spark_strings(spark):
    from oracle_impl import spark_xxhash64_str

    cases = [
        "",
        "a",
        "abcd",
        "hello w",
        "12345678",
        "the quick brown fox jumps over the lazy dog",
        "x" * 31,
        "y" * 32,
        "z" * 100,
        "émoji ünïcode ✓",
    ]
    df = spark.createDataFrame([(s,) for s in cases], ["s"]).select(
        "s", F.xxhash64("s").alias("h")
    )
    for r in df.collect():
        assert r.h == spark_xxhash64_str(r.s), r.s


def test_xxh64_matches_spark_longs_and_chains(spark):
    from oracle_impl import spark_xxhash64_longs

    longs = [(0,), (1,), (-1,), (42,), (2**63 - 1,), (-(2**63),)]
    df = spark.createDataFrame(longs, ["v"]).select("v", F.xxhash64("v").alias("h"))
    for r in df.collect():
        assert r.h == spark_xxhash64_longs([r.v])
    pairs = [(5, 77), (-3, 2**40), (0, 0)]
    df2 = spark.createDataFrame(pairs, ["a", "b"]).select(
        "a", "b", F.xxhash64("a", "b").alias("h")
    )
    for r in df2.collect():
        assert r.h == spark_xxhash64_longs([r.a, r.b])
    # array<long> hashing (band hashes over signature slices)
    df3 = spark.createDataFrame([([1, 2, 3, 4],)], ["arr"]).select(
        F.xxhash64("arr").alias("h")
    )
    assert df3.head().h == spark_xxhash64_longs([1, 2, 3, 4])


def test_sequence_row_ref_matches_engine_generator(spark):
    from oracle_impl import sequence_row_ref

    from light_curve_spark.sources.synthetic import synthetic_sequences

    rows = {r.doc_id: r for r in synthetic_sequences(spark, 20, seed=42).collect()}
    for rid in range(20):
        doc_id, n_tok, tokens = sequence_row_ref(rid, 42)
        assert rows[doc_id].n_tok == n_tok
        assert list(rows[doc_id].tokens) == tokens


def test_media_row_ref_matches_engine_stub(spark):
    from oracle_impl import media_row_ref

    from light_curve_spark.operators.multimodal import (
        decode_and_featurize,
        synthetic_media,
    )

    out = {
        r.media_id: r
        for r in decode_and_featurize(synthetic_media(spark, 10, seed=42), fake=True).collect()
    }
    for mid in range(10):
        _, kind, n_bytes, f0 = media_row_ref(mid, 42)
        assert out[mid].kind == kind
        assert out[mid].n_bytes == n_bytes
        assert out[mid].feature[0] == pytest.approx(f0, abs=1e-12)


def test_hyperplanes_ref_matches_engine():
    import numpy as np
    from oracle_impl import hyperplanes_ref

    from light_curve_spark.operators.similarity import _hyperplanes

    eng = _hyperplanes(16, 8, seed=42)
    ref = np.asarray(hyperplanes_ref(16, 8, seed=42))
    assert np.array_equal(eng, ref)
