"""Skew-adversarial rollup/encode bench (round-3 verdict item 8): plant
ONE 10^6-token mega-sequence (61x the generator's 16,384 cap, ~1,250x
the mean) in the 200k-sequence bench corpus and push it through the
pipeline's heavy per-partition path:

    weighted_salted_repartition -> rollup_tiers_arrays (1x/10x/100x)
    -> encode_chunks(with_lineage=True)

Evidence reported:
- wall for the full pass with and without the mega-key,
- per-task encode wall distribution (max / median ratio) from the
  lineage columns measured INSIDE the kernel — the direct signal of
  whether byte-weighted salting + outlier chunking absorb the key or
  one straggler task owns the tail,
- zero task failures (the job completing IS the assertion in local
  mode: any task failure fails the job).

Run: PYTHONPATH=. python scripts/stress_skew_rollup.py
Prints a JSON line; transcribed into BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _mega_doc(spark, n_tok: int):
    from light_curve_spark.sources.synthetic import SEQUENCES_SCHEMA, VOCAB_SIZE

    def gen(batches):
        for pdf in batches:
            toks = ((np.arange(n_tok, dtype=np.int64) * 48271 + 7) % VOCAB_SIZE
                    ).astype(np.int32)
            yield pd.DataFrame(
                {
                    "doc_id": ["megadoc00000000"],
                    "tokens": [toks],
                    "n_tok": np.array([n_tok], dtype=np.int32),
                    "source": ["web"],
                }
            )

    return spark.range(1).mapInPandas(gen, schema=SEQUENCES_SCHEMA)


def _run(spark, seq, num_partitions: int):
    from light_curve_spark.operators.compress import encode_chunks
    from light_curve_spark.operators.rollup import rollup_tiers_arrays
    from light_curve_spark.plans.salting import weighted_salted_repartition

    t0 = time.time()
    spread = weighted_salted_repartition(seq, num_partitions)
    spread.persist()
    spread.count()
    rollup_n = rollup_tiers_arrays(spread).count()
    chunks = encode_chunks(spread, with_lineage=True)
    # _wall_ms is the kernel wall spread across the batch's rows — SUM
    # per partition id reconstructs each task's encode wall (same
    # aggregation as the pipeline's metrics table)
    per_task = (
        chunks.groupBy("_pid")
        .agg(F.sum("_wall_ms").alias("wall_ms"), F.count("*").alias("rows"))
        .collect()
    )
    wall = time.time() - t0
    spread.unpersist()
    walls = np.array([r.wall_ms for r in per_task], dtype=np.float64)
    return {
        "wall_s": round(wall, 1),
        "rollup_rows": rollup_n,
        "n_tasks": len(per_task),
        "task_wall_ms": {
            "median": float(np.median(walls)),
            "p95": float(np.percentile(walls, 95)),
            "max": float(walls.max()),
            "max_over_median": round(float(walls.max() / max(np.median(walls), 1)), 2),
        },
    }


def main() -> None:
    from light_curve_spark.session import build_session
    from light_curve_spark.sources.synthetic import synthetic_sequences

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_seq = int(os.environ.get("SPARK_GRAFT_SKEW_N", "200000"))
    mega_tok = int(os.environ.get("SPARK_GRAFT_MEGA_TOK", "1000000"))
    spark = build_session(
        app_name="stress-skew-rollup", master=f"local[{cpus}]",
        shuffle_partitions=4 * cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = synthetic_sequences(spark, n_seq, seed=42, num_partitions=64)
    res = {"n_seq": n_seq, "mega_tokens": mega_tok, "cpus": cpus}
    _run(spark, base, num_partitions=4 * cpus)  # warmup (JIT + page cache)
    res["baseline"] = _run(spark, base, num_partitions=4 * cpus)
    with_mega = base.unionByName(_mega_doc(spark, mega_tok))
    res["with_mega_key"] = _run(spark, with_mega, num_partitions=4 * cpus)
    res["wall_overhead_pct"] = round(
        100.0
        * (res["with_mega_key"]["wall_s"] - res["baseline"]["wall_s"])
        / res["baseline"]["wall_s"],
        1,
    )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
