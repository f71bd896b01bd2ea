"""Two-cluster-size scaling evidence (north_rule: throughput scaling
efficiency >= 0.8 from N to 4N executors; sandbox protocol per
BASELINE.md: identical job + identical input at local[8] and local[32]).

Runs the sequences pipeline workload (features kernel + tier rollup +
Gorilla encode over the synthetic tokens table) at both parallelism
levels IN SEPARATE JVMs (fresh SparkSession each; a shared JVM would let
the second run reuse warmed code caches) and writes BENCH.md.

    PYTHONPATH=. python scripts/scaling_bench.py [n_sequences]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
import numpy as np
from pyspark.sql import functions as F
from light_curve_spark.session import build_session
from light_curve_spark.operators.compress import encode_chunks
from light_curve_spark.operators.features import extract_features
from light_curve_spark.operators.rollup import rollup_tiers_arrays
from light_curve_spark.plans.salting import salted_repartition
from light_curve_spark.sources.synthetic import synthetic_sequences

cpus = int(sys.argv[1]); n_rows = int(sys.argv[2])
spark = build_session(app_name=f"scale-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(2 * cpus, 16))
spark.sparkContext.setLogLevel("ERROR")

def run(df):
    df.write.mode("overwrite").format("noop").save()

seq = salted_repartition(synthetic_sequences(spark, n_rows, seed=42), 4 * cpus).persist()
n_tokens = int(seq.select(F.sum("n_tok")).head()[0])

# warm-up (JIT, Arrow, Python workers) — excluded from the measurement
run(extract_features(seq.limit(200)))

t0 = time.time()
run(extract_features(seq, freqs=np.linspace(0.05, 0.45, 9)))
t_feat = time.time() - t0

t0 = time.time()
rolled = rollup_tiers_arrays(seq, base_width=16, tiers=(1, 10, 100))
n_rolled = rolled.count()
t_roll = time.time() - t0

t0 = time.time()
enc = encode_chunks(seq, max_len=4096)
enc_bytes = int(enc.select((F.sum(F.length("ts_dod")) + F.sum(F.length("vals_gorilla"))).alias("b")).head()[0])
t_enc = time.time() - t0

print("RESULT " + json.dumps({
    "cpus": cpus, "n_sequences": n_rows, "n_tokens": n_tokens,
    "t_features": t_feat, "t_rollup": t_roll, "t_encode": t_enc,
    "t_total": t_feat + t_roll + t_enc,
    "rolled_points": n_rolled, "encoded_bytes": enc_bytes,
}))
spark.stop()
""" % {"repo": REPO}


def run_at(cpus: int, n_rows: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cpus), str(n_rows)],
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=REPO,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker failed (cpus={cpus}):\n{out.stdout[-2000:]}\n{out.stderr[-3000:]}")


def main() -> None:
    # modes:
    #   scaling_bench.py [n]                  run both levels, write BENCH.md
    #   scaling_bench.py --single CPUS N OUT  one level -> OUT json
    #   scaling_bench.py --compose R8 R32     compose BENCH.md from jsons
    if len(sys.argv) > 1 and sys.argv[1] == "--single":
        cpus, n_rows, out = int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
        res = run_at(cpus, n_rows)
        with open(out, "w") as f:
            json.dump(res, f)
        print(res)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--compose":
        with open(sys.argv[2]) as f:
            r8 = json.load(f)
        with open(sys.argv[3]) as f:
            r32 = json.load(f)
        _write_report(r8, r32, r8["n_sequences"])
        return
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 40000
    results = {}
    for cpus in (8, 32):
        t0 = time.time()
        results[cpus] = run_at(cpus, n_rows)
        print(f"local[{cpus}]: {results[cpus]}  (wall {time.time()-t0:.0f}s)")
    _write_report(results[8], results[32], n_rows)


def _write_report(r8: dict, r32: dict, n_rows: int) -> None:
    tput8 = r8["n_tokens"] / r8["t_total"]
    tput32 = r32["n_tokens"] / r32["t_total"]
    eff = (tput32 / tput8) / 4.0
    lines = [
        "# BENCH — scaling evidence (local[8] vs local[32])",
        "",
        "Protocol per BASELINE.md: identical job (sequences pipeline:",
        "feature kernels + 1x/10x/100x rollup cascade + DoD/Gorilla encode)",
        "on identical input (synthetic sequences, seed=42, "
        f"n={n_rows}, {r8['n_tokens']} tokens), fresh JVM per run,",
        "warm-up excluded.",
        "",
        "| config | features s | rollup s | encode s | total s | tokens/s |",
        "|---|---|---|---|---|---|",
    ]
    for cpus, r in ((8, r8), (32, r32)):
        lines.append(
            f"| local[{cpus}] | {r['t_features']:.2f} | {r['t_rollup']:.2f} "
            f"| {r['t_encode']:.2f} | {r['t_total']:.2f} "
            f"| {r['n_tokens']/r['t_total']:.0f} |"
        )
    lines += [
        "",
        f"- rolled-up points (all tiers): {r32['rolled_points']}",
        f"- rollup points/sec at local[32]: {r32['rolled_points']/r32['t_rollup']:.0f}",
        f"- token-bytes/sec through Gorilla encode at local[32]: "
        f"{r32['n_tokens']*4/r32['t_encode']:.0f}",
        f"- compressed size: {r32['encoded_bytes']} bytes "
        f"({r32['encoded_bytes']/(r32['n_tokens']*12):.3f} of raw 12 B/point)",
        "",
        f"**Scaling efficiency (N=8 -> 4N=32): (tput32/tput8)/4 = "
        f"({tput32:.0f}/{tput8:.0f})/4 = {eff:.3f}**"
        + (" — meets the >= 0.8 criterion." if eff >= 0.8 else " — BELOW the 0.8 criterion."),
        "",
        json.dumps({"local8": r8, "local32": r32, "scaling_efficiency": round(eff, 4)}),
        "",
    ]
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
