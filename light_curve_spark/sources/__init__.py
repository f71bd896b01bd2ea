"""Sources & sinks: the deterministic synthetic sequences generator
(input_hint schema), testdata loaders, and the snapshot-capable storage
layer (Iceberg when available, parquet + manifest fallback)."""

from light_curve_spark.sources.catalog import load_table, load_tables
from light_curve_spark.sources.synthetic import SEQUENCES_SCHEMA, synthetic_sequences

__all__ = ["SEQUENCES_SCHEMA", "load_table", "load_tables", "synthetic_sequences"]
