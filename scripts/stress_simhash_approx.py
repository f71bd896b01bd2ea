"""Weighted-SimHash scale path: exact two-shuffle kernel vs sampled-df
broadcast kernel (round-3 verdict item 5) on the SAME 91k-doc stress
corpus as scripts/stress_dedup.py.

Measures (min of 2 warm runs, operator caches released between runs):
- wall for the full simhash_dedup(weighted=True, max_hamming=8) pipeline
  with each kernel,
- pair-set delta (|exact ∩ approx| / |exact|, plus counts) — the honest
  cost of approximating the df WEIGHT BUCKETS (votes stay exact ints),
- per-doc hash agreement fraction.

Run: PYTHONPATH=. python scripts/stress_simhash_approx.py
Prints a JSON line; results are transcribed into BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stress_dedup import synth_docs, timed  # noqa: E402


def main() -> None:
    from light_curve_spark.operators.dedup import (
        simhash_dedup,
        simhash_weighted_approx_kernel,
        simhash_weighted_kernel,
    )
    from light_curve_spark.plans.caching import release_operator_caches
    from light_curve_spark.session import build_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    rate = float(os.environ.get("SPARK_GRAFT_SIMHASH_RATE", "0.1"))
    spark = build_session(
        app_name="stress-simhash-approx", master=f"local[{cpus}]",
        shuffle_partitions=4 * cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    docs = synth_docs(spark).persist()
    n_docs = docs.count()
    res = {"n_docs": n_docs, "cpus": cpus, "sample_rate": rate,
           "gen_s": round(time.time() - t0, 1)}

    t_ex, _ = timed(
        lambda: simhash_dedup(docs, weighted=True, max_hamming=8).count()
    )
    exact_pairs = simhash_dedup(docs, weighted=True, max_hamming=8).persist()
    n_exact = exact_pairs.count()

    t_ap, _ = timed(
        lambda: simhash_dedup(
            docs, weighted=True, approx_df=rate, max_hamming=8
        ).count()
    )
    approx_pairs = simhash_dedup(
        docs, weighted=True, approx_df=rate, max_hamming=8
    ).persist()
    n_approx = approx_pairs.count()
    overlap = exact_pairs.join(
        approx_pairs, ["doc_a", "doc_b"], "left_semi"
    ).count()

    sh_e = simhash_weighted_kernel(docs).withColumnRenamed("sh", "sh_e")
    sh_a = simhash_weighted_approx_kernel(docs, sample_rate=rate) \
        .withColumnRenamed("sh", "sh_a")
    agree = (
        sh_e.join(sh_a, "doc_id")
        .agg(F.avg((F.col("sh_e") == F.col("sh_a")).cast("double")))
        .head()[0]
    )
    release_operator_caches()

    res["exact"] = {"wall_s": round(t_ex, 2), "pairs": n_exact}
    res["approx"] = {"wall_s": round(t_ap, 2), "pairs": n_approx,
                     "pair_recall_vs_exact": round(overlap / n_exact, 4)
                     if n_exact else None,
                     "speedup": round(t_ex / t_ap, 2)}
    res["hash_agreement_frac"] = round(float(agree), 4)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
