"""Round-7 optimization harness (guide §1.4): isolate individual
declared queries with the noop sink, min-of-N timing, optional
.explain("formatted") dump to plans/r07/<query>_<tag>.txt.

NOT the driver bench — bench.py stays frozen.  Usage:

    PYTHONPATH=. python bench_extra.py [--sf /root/testdata/sf1.0] \
        [--reps 3] [--plans TAG] [--seq] [query ...]

With no query names: runs the full headline+extra list.  --plans TAG
writes plans/r07/<query>_TAG.txt for each query.  --seq additionally
times the sequences pipeline stages (features/quantiles/rollup/encode/
decode) the way bench.py does.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    "rollup_tiers_events",
    "features_events",
    "features_events_kernel",
    "eta_trend_events",
    "dmdt_events_kernel",
    "interpolate_events",
    "locf_events_daily",
    "cosine_topk_embeddings",
    "ngram_jaccard_documents",
    "minhash_lsh_documents",
    "simhash_documents",
    "fingerprint_documents",
    "token_count_documents",
    "rollup_retract_events",
    "rollup_distinct_events",
    "bm25_documents",
    "simhash_weighted_documents",
    "media_features_real",
    "sessions_events_ties",
    "asof_join_events_ties",
]


def _noop(df):
    df.write.mode("overwrite").format("noop").save()


def formatted(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None, help="tag: dump plans/r07/<q>_<tag>.txt")
    ap.add_argument("--seq", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from light_curve_spark.plans.caching import release_operator_caches
    from light_curve_spark.session import build_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(
        app_name="lcs-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(2 * cpus, 32),
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = entrymod.queries()

    def _q(name):
        return queries.get(name) or getattr(entrymod, f"q_{name}")

    names = args.queries or QUERIES
    plan_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r07")
    if args.plans:
        os.makedirs(plan_dir, exist_ok=True)

    out: dict[str, dict] = {}
    for name in names:
        fn = _q(name)
        release_operator_caches()
        if args.plans:
            with open(os.path.join(plan_dir, f"{name}_{args.plans}.txt"), "w") as fh:
                fh.write(formatted(fn(spark, args.sf)))
        reps = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.time()
            _noop(fn(spark, args.sf))
            reps.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(reps), "reps": reps}
        print(json.dumps({name: out[name]}), flush=True)
    release_operator_caches()

    if args.seq:
        import numpy as np
        from pyspark.sql import functions as F

        from light_curve_spark.operators.compress import decode_chunks, encode_chunks
        from light_curve_spark.operators.features import extract_features
        from light_curve_spark.operators.rollup import (
            rollup_quantiles_arrays,
            rollup_tiers_arrays,
        )
        from light_curve_spark.plans.salting import salted_repartition
        from light_curve_spark.sources.synthetic import synthetic_sequences

        n_seq = int(os.environ.get("LCS_BENCH_SEQUENCES", "20000"))
        seq = salted_repartition(synthetic_sequences(spark, n_seq, seed=42), 4 * cpus).persist()
        seq.count()
        stages = {
            "seq_features_kernel": lambda: _noop(
                extract_features(seq, freqs=np.linspace(0.05, 0.45, 9))
            ),
            "seq_quantiles_arrays": lambda: _noop(
                rollup_quantiles_arrays(seq, base_width=16, tiers=(1, 10, 100))
            ),
            "seq_rollup_cascade": lambda: rollup_tiers_arrays(
                seq, base_width=16, tiers=(1, 10, 100)
            ).count(),
            "seq_gorilla_encode": lambda: encode_chunks(seq, max_len=4096)
            .select((F.sum(F.length("ts_dod")) + F.sum(F.length("vals_gorilla"))).alias("b"))
            .head(),
        }
        for name, fn in stages.items():
            reps = []
            for _ in range(args.reps):
                spark.sparkContext.setJobDescription(f"bench_extra: {name}")
                t0 = time.time()
                fn()
                reps.append(round(time.time() - t0, 3))
            out[name] = {"min": min(reps), "reps": reps}
            print(json.dumps({name: out[name]}), flush=True)
        chunks_df = encode_chunks(seq, max_len=4096).persist()
        chunks_df.count()
        reps = []
        for _ in range(args.reps):
            t0 = time.time()
            decode_chunks(chunks_df).select(F.sum(F.size("tokens"))).head()
            reps.append(round(time.time() - t0, 3))
        out["seq_gorilla_decode"] = {"min": min(reps), "reps": reps}
        print(json.dumps({"seq_gorilla_decode": out["seq_gorilla_decode"]}), flush=True)
        chunks_df.unpersist()
        seq.unpersist()

    print(json.dumps({"TOTAL_MIN": round(sum(v["min"] for v in out.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
