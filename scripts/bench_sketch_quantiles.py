"""Sketch-vs-exact tier quantiles at stress scale (round-3 mandate):
put a NUMBER on the documented trade-off of
``operators/rollup.rollup_quantiles_approx`` (Greenwald-Khanna
percentile_approx, bounded-memory mergeable — "for when the exactness
gate is waived") against the two exact paths.

Three contenders on the same synthetic corpus (200k sequences, ~61M
tokens — the scaling-bench input):
- exact array-native (`rollup_quantiles_arrays`): zero-shuffle
  mapInArrow over the sequences table;
- exact relational (`rollup_quantiles`): explode + per-tier shuffle
  (medians are non-decomposable);
- sketch (`rollup_quantiles_approx`, accuracy=10000): explode + one
  hash-agg per tier, mergeable partials (map-side combine), no full
  per-bucket sort.

Error metric: max / mean |p50_sketch - median_exact| over every
(doc, source, tier, bucket) group, plus the share of groups hit
exactly. GK guarantees RANK error <= n/accuracy; with per-bucket n
<< accuracy=10^4 the sketch is rank-exact here (verified: every
ODD-count bucket matches the exact median bit-for-bit). The residual
difference is purely the even-count mean-of-two-middles convention,
which GK cannot represent; on widely-spaced values that definitional
gap is the distance between the two middle order statistics —
data-dependent, and the dominant term in the reported max/mean.

Run: PYTHONPATH=. python scripts/bench_sketch_quantiles.py
Prints one JSON line; transcribed into BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N_SEQ = 200_000


def main() -> None:
    from light_curve_spark.operators.rollup import (
        rollup_quantiles,
        rollup_quantiles_approx,
        rollup_quantiles_arrays,
    )
    from light_curve_spark.operators.series import explode_series
    from light_curve_spark.plans.caching import release_operator_caches
    from light_curve_spark.session import build_session
    from light_curve_spark.sources.synthetic import synthetic_sequences

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(
        app_name="bench-sketch-quantiles", master=f"local[{cpus}]",
        shuffle_partitions=4 * cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    seq = synthetic_sequences(spark, N_SEQ, seed=42).persist()
    n_tok = seq.agg(F.sum("n_tok")).head()[0]
    series = explode_series(seq)

    def timed(fn, reps=2):
        best = None
        for _ in range(reps):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            release_operator_caches()
            best = dt if best is None else min(best, dt)
        return best

    res = {"n_seq": N_SEQ, "n_tokens": int(n_tok), "cpus": cpus}
    res["exact_arrays_s"] = round(
        timed(lambda: rollup_quantiles_arrays(seq).count()), 2
    )
    res["exact_relational_s"] = round(
        timed(lambda: rollup_quantiles(series).count()), 2
    )
    res["sketch_s"] = round(
        timed(lambda: rollup_quantiles_approx(series).count()), 2
    )

    exact = rollup_quantiles_arrays(seq)
    approx = rollup_quantiles_approx(series)
    joined = exact.join(
        approx, ["doc_id", "source", "tier", "bucket"]
    ).select(F.abs(F.col("p50") - F.col("v_median")).alias("err"))
    stats = joined.agg(
        F.count("*").alias("n"),
        F.max("err").alias("mx"),
        F.avg("err").alias("avg"),
        F.sum(F.when(F.col("err") == 0.0, 1).otherwise(0)).alias("hits"),
    ).head()
    res["groups_compared"] = stats["n"]
    res["p50_max_abs_err"] = float(stats["mx"])
    res["p50_mean_abs_err"] = round(float(stats["avg"]), 6)
    res["p50_exact_share"] = round(stats["hits"] / stats["n"], 4)
    res["speedup_vs_relational"] = round(
        res["exact_relational_s"] / res["sketch_s"], 2
    )
    res["speedup_vs_arrays"] = round(res["exact_arrays_s"] / res["sketch_s"], 2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
