"""Deterministic, distributed generator for the primary input table.

Schema per BASELINE.json input_hint:
    (doc_id: string, tokens: array<int32>, n_tok: int32, source: string)

Design points (FIXTURES.md §1):
- **Counter-based randomness, not stateful RNG.** Every value is a pure
  function of (seed, row_id, position) through splitmix64, so the output
  is bit-identical regardless of partition count, executor count, or
  scheduling order — the property that makes goldens reproducible on a
  1000-executor cluster and in local[8]/local[32] scaling runs alike.
- **Distributed generation.** ``spark.range(n)`` + ``mapInPandas``: the
  driver never materializes rows; at 10^12 rows the generator is just
  another scan.
- **Long-tail n_tok** (Pareto-like, median ≈ 128, clipped at 16384) to
  exercise skew/salting, and skewed source frequencies (web ≈ 70%).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

SEQUENCES_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("tokens", ArrayType(IntegerType(), False), False),
        StructField("n_tok", IntegerType(), False),
        StructField("source", StringType(), False),
    ]
)

VOCAB_SIZE = 50257
MAX_N_TOK = 16384
_SOURCES = np.array(["web", "code", "books", "wiki"])
_SOURCE_CUM = np.array([0.70, 0.85, 0.95, 1.0])


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants)."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _uniform01(x: np.ndarray) -> np.ndarray:
    return (_splitmix64(x) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def row_fields(ids: np.ndarray, seed: int) -> tuple[np.ndarray, np.ndarray, list]:
    """(n_tok, source, tokens-list) for a batch of row ids. Pure function."""
    ids = ids.astype(np.uint64)
    s = np.uint64(seed)
    u_len = _uniform01(ids * np.uint64(3) + s)
    # Pareto(a=1.2) scaled so the median lands at ~128, clipped long tail.
    n_tok = np.minimum(
        MAX_N_TOK, np.maximum(1, (72.0 * (1.0 - u_len) ** (-1.0 / 1.2)).astype(np.int64))
    ).astype(np.int32)
    u_src = _uniform01(ids * np.uint64(3) + np.uint64(1) + s)
    source = _SOURCES[np.searchsorted(_SOURCE_CUM, u_src, side="right").clip(0, 3)]

    total = int(n_tok.sum())
    offsets = np.cumsum(n_tok.astype(np.int64)) - n_tok
    elem = np.repeat(np.arange(ids.shape[0]), n_tok)
    pos = np.arange(total, dtype=np.int64) - offsets[elem]
    # token_{i,j} = splitmix64(seed ^ mix(row_id, j)) % VOCAB
    ctr = ids[elem] * np.uint64(0x1000003) + pos.astype(np.uint64) + (s << np.uint64(32))
    flat = (_splitmix64(ctr) % np.uint64(VOCAB_SIZE)).astype(np.int32)
    tokens = np.split(flat, offsets[1:] if ids.shape[0] > 1 else [])
    return n_tok, source, tokens


def synthetic_sequences(
    spark: SparkSession, n_rows: int, seed: int = 42, num_partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic sequences table of ``n_rows`` rows."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            n_tok, source, tokens = row_fields(ids, seed)
            yield pd.DataFrame(
                {
                    "doc_id": [f"doc{int(i):08d}" for i in ids],
                    "tokens": tokens,
                    "n_tok": n_tok,
                    "source": source,
                }
            )

    rng = spark.range(n_rows, numPartitions=num_partitions)
    return rng.mapInPandas(gen, schema=SEQUENCES_SCHEMA)
