"""Weighted-SimHash banding knob sweep (round-4 follow-through on the
round-3 finding that weighted-simhash recall vs the exact Jaccard truth
was 0.388 at band_bits=16): recall/pairs/wall for band_bits in {8, 16}
on the 91k-doc stress corpus, using the sampled-df kernel (the scale
path; its pair recall vs the exact-df kernel is measured separately in
stress_simhash_approx.py).

band_bits=b means 64/b bands of b bits; smaller b = more, looser bands
= more candidate collisions = higher recall at higher pair volume (the
same OR-amplification trade MinHash's 16x4 vs 32x8 showed).

Run: PYTHONPATH=.:scripts python scripts/stress_simhash_bands.py
Prints a JSON line; transcribed into BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stress_dedup import synth_docs, timed  # noqa: E402


def main() -> None:
    from light_curve_spark.operators.dedup import (
        ngram_jaccard_pairs,
        simhash_dedup,
    )
    from light_curve_spark.session import build_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    rate = float(os.environ.get("SPARK_GRAFT_SIMHASH_RATE", "0.1"))
    spark = build_session(
        app_name="stress-simhash-bands", master=f"local[{cpus}]",
        shuffle_partitions=4 * cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    docs = synth_docs(spark).persist()
    n_docs = docs.count()
    res = {"n_docs": n_docs, "cpus": cpus, "sample_rate": rate,
           "gen_s": round(time.time() - t0, 1)}

    truth = ngram_jaccard_pairs(docs, threshold=0.5, max_df=1000).persist()
    n_truth = truth.count()
    res["exact_jaccard_truth_pairs"] = n_truth

    for bb in (16, 8):
        t, _ = timed(
            lambda: simhash_dedup(
                docs, band_bits=bb, weighted=True, approx_df=rate,
                max_hamming=8,
            ).count()
        )
        pairs = simhash_dedup(
            docs, band_bits=bb, weighted=True, approx_df=rate, max_hamming=8
        ).persist()
        n_pairs = pairs.count()
        hit = pairs.join(truth, ["doc_a", "doc_b"], "left_semi").count()
        res[f"band_bits_{bb}"] = {
            "wall_s": round(t, 2),
            "pairs": n_pairs,
            "recall_vs_exact_jaccard": round(hit / n_truth, 4),
        }
        pairs.unpersist()
    print(json.dumps(res))


if __name__ == "__main__":
    main()
