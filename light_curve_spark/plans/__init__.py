"""Job planning: salted repartitioning, the end-to-end pipeline with
snapshot-checkpoint resume and per-partition lineage metrics."""
