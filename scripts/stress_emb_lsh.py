"""Embedding-LSH at 1M vectors (round-5 verdict items 4 + 5): the
OR-amplification recall/wall curve and the hub-bucket skew guard.

Part A — n_tables curve (unclustered corpus, 1M vectors, dim 32,
n_planes=16): plant 10k near-duplicate twins (vector + tiny noise),
take the planted pairs whose exact cosine clears the threshold as
ground truth, then run ``embedding_cosine_pairs_lsh`` at n_tables ∈
{1, 2, 4, 8} measuring recall, wall, and the within-bucket candidate
count (sum of C(s,2) over (table, bucket) occupancies — the join work).
Expected shape: per-table collision probability at threshold 0.95 is
~0.9^16 ≈ 0.19, OR-amplified to 1-(1-p)^T.

Part B — bucket skew (clustered corpus, 20 centers): sign-pattern
buckets concentrate on cluster centroids, so a few hub buckets carry
most rows and the uncapped within-bucket join is quadratic in the hub
size. Report the bucket-size distribution and the UNCAPPED candidate
count (computed analytically — deliberately not executed), then run the
join with ``bucket_cap`` and report wall + planted-twin recall. The cap
bounds the join at O(s * cap) per hub; lost recall is the documented
price (and n_tables is the antidote).

Run: PYTHONPATH=. python scripts/stress_emb_lsh.py
Prints one JSON line; transcribed into BENCH.md.
Scale down with SPARK_GRAFT_EMB_N (default 1_000_000).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
from pyspark.sql import functions as F

DIM = 32
N_PLANES = 16
THRESHOLD = 0.95
TWIN_EVERY = 100
# sized so planted cosines land just above the 0.95 threshold (~0.96-
# 0.99) — near-threshold pairs are the ones OR-amplification exists for
# (a tiny-noise twin at cosine 0.9996 collides per-table ~86% of the
# time and the curve saturates at T=2, showing nothing)
NOISE = 0.2


def _vecs_for_ids(ids: np.ndarray, centers: np.ndarray | None, seed: int) -> np.ndarray:
    """Deterministic vector per id via the repo's splitmix64 uniforms —
    partition-independent, so twins can be re-derived anywhere."""
    from light_curve_spark.sources.synthetic import _uniform01

    salt = np.uint64((seed * 0x9E3779B97F4A7C15) % (1 << 64))
    with np.errstate(over="ignore"):
        ctr = (
            ids.astype(np.uint64)[:, None] * np.uint64(DIM)
            + np.arange(DIM, dtype=np.uint64)[None, :]
            + salt
        )
    u = _uniform01(ctr.ravel()).reshape(len(ids), DIM)
    v = (u - 0.5) * 2.0
    if centers is not None:
        # cluster spread sized so INTRA-cluster cosines sit BELOW the
        # 0.95 threshold (~0.85 expected): hub sign-pattern buckets
        # still form (the skew being measured), but the true pair set
        # stays the planted twins instead of going quadratic in the
        # cluster size (first run of this script: 0.15 spread made
        # every same-cluster pair a true pair — 1.5e9 of them)
        v = centers[ids % len(centers)] + 0.45 * v
    return v


def synth_corpus(spark, n: int, clustered: bool, seed: int):
    """(vec_id, embedding) with a planted twin (id + 10^9) for every
    TWIN_EVERY-th id: twin = vec + NOISE * noise_vec."""
    n_centers = 20
    centers = (
        (_vecs_for_ids(np.arange(n_centers, dtype=np.uint64), None, seed + 7))
        if clustered
        else None
    )

    def gen(batches):
        for batch in batches:
            ids = batch.column("id").to_numpy().astype(np.uint64)
            base = _vecs_for_ids(ids, centers, seed)
            out_ids = [ids.astype(np.int64)]
            out_vecs = [base]
            twin_mask = (ids % TWIN_EVERY) == 0
            if twin_mask.any():
                tids = ids[twin_mask]
                noise = _vecs_for_ids(tids, None, seed + 99) * NOISE
                out_ids.append((tids + np.uint64(1_000_000_000)).astype(np.int64))
                out_vecs.append(base[twin_mask] + noise)
            all_ids = np.concatenate(out_ids)
            all_vecs = np.concatenate(out_vecs)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(all_ids, type=pa.int64()),
                    pa.array(list(all_vecs), type=pa.list_(pa.float64())),
                ],
                names=["vec_id", "embedding"],
            )

    return (
        spark.range(n)
        .repartition(64)
        .mapInArrow(gen, "vec_id long, embedding array<double>")
    )


def planted_truth(n: int, clustered: bool, seed: int) -> set[tuple[int, int]]:
    """Exact-cosine-verified planted pairs (numpy, same generator)."""
    n_centers = 20
    centers = (
        _vecs_for_ids(np.arange(n_centers, dtype=np.uint64), None, seed + 7)
        if clustered
        else None
    )
    ids = np.arange(0, n, TWIN_EVERY, dtype=np.uint64)
    base = _vecs_for_ids(ids, centers, seed)
    twin = base + _vecs_for_ids(ids, None, seed + 99) * NOISE
    cos = (base * twin).sum(1) / (
        np.linalg.norm(base, axis=1) * np.linalg.norm(twin, axis=1)
    )
    keep = cos >= THRESHOLD
    return {
        (int(i), int(i + 1_000_000_000)) for i in ids[keep]
    }, float(cos.min())


def bucket_stats(emb, n_tables: int, seed: int = 42):
    """Occupancy of every (table, bucket): candidate count = sum C(s,2)
    — the within-bucket join work — plus the top bucket's share."""
    from light_curve_spark.operators.similarity import (
        _hyperplanes,
        lsh_bucket_expr,
    )

    planes = [_hyperplanes(DIM, N_PLANES, seed + 1000 * t) for t in range(n_tables)]
    keyed = emb.select(
        F.posexplode(
            F.array(*[lsh_bucket_expr("embedding", p) for p in planes])
        ).alias("_tbl", "_bucket")
    )
    sizes = keyed.groupBy("_tbl", "_bucket").agg(F.count("*").alias("s"))
    row = sizes.agg(
        F.sum(F.col("s") * (F.col("s") - 1) / 2).alias("cand"),
        F.max("s").alias("max_bucket"),
        F.count("*").alias("n_buckets"),
        F.sum("s").alias("total"),
    ).head()
    return {
        "candidates": int(row["cand"]),
        "max_bucket": int(row["max_bucket"]),
        "n_buckets": int(row["n_buckets"]),
        "max_bucket_share": round(row["max_bucket"] / (row["total"] / n_tables), 4),
    }


def main() -> None:
    from light_curve_spark.operators.similarity import embedding_cosine_pairs_lsh
    from light_curve_spark.session import build_session

    n = int(os.environ.get("SPARK_GRAFT_EMB_N", "1000000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(
        app_name="stress-emb-lsh", master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    res: dict = {"n": n, "dim": DIM, "n_planes": N_PLANES, "cpus": cpus}

    # ---- Part A: n_tables curve on the unclustered corpus --------------
    emb = synth_corpus(spark, n, clustered=False, seed=1).persist()
    n_rows = emb.count()
    truth, min_cos = planted_truth(n, clustered=False, seed=1)
    res["rows"] = n_rows
    res["n_truth"] = len(truth)
    res["planted_min_cosine"] = round(min_cos, 4)

    curve = []
    for t in (1, 2, 4, 8):
        stats = bucket_stats(emb, t, seed=42)
        t0 = time.time()
        found = {
            (r.id_a, r.id_b)
            for r in embedding_cosine_pairs_lsh(
                emb, threshold=THRESHOLD, n_planes=N_PLANES, n_tables=t
            )
            .select("id_a", "id_b")
            .collect()
        }
        wall = time.time() - t0
        hit = len(found & truth)
        curve.append(
            {
                "n_tables": t,
                "wall_s": round(wall, 1),
                "recall": round(hit / max(1, len(truth)), 4),
                "pairs_found": len(found),
                "candidates": stats["candidates"],
                "max_bucket": stats["max_bucket"],
            }
        )
    res["or_amplification_curve"] = curve
    emb.unpersist()

    # ---- Part B: hub-bucket skew + cap on the clustered corpus ---------
    n_b = max(1, n // 4)
    cemb = synth_corpus(spark, n_b, clustered=True, seed=2).persist()
    c_rows = cemb.count()
    ctruth, c_min_cos = planted_truth(n_b, clustered=True, seed=2)
    skew = bucket_stats(cemb, 1, seed=42)
    cap = 2000
    t0 = time.time()
    capped_found = {
        (r.id_a, r.id_b)
        for r in embedding_cosine_pairs_lsh(
            cemb, threshold=THRESHOLD, n_planes=N_PLANES, n_tables=1,
            bucket_cap=cap,
        )
        .select("id_a", "id_b")
        .collect()
    }
    cap_wall = time.time() - t0
    t0 = time.time()
    capped4 = {
        (r.id_a, r.id_b)
        for r in embedding_cosine_pairs_lsh(
            cemb, threshold=THRESHOLD, n_planes=N_PLANES, n_tables=4,
            bucket_cap=cap,
        )
        .select("id_a", "id_b")
        .collect()
    }
    cap4_wall = time.time() - t0
    res["skew"] = {
        "rows": c_rows,
        "n_truth": len(ctruth),
        "planted_min_cosine": round(c_min_cos, 4),
        "uncapped_candidates_not_executed": skew["candidates"],
        "max_bucket": skew["max_bucket"],
        "max_bucket_share": skew["max_bucket_share"],
        "bucket_cap": cap,
        "capped_wall_s_T1": round(cap_wall, 1),
        "capped_recall_T1": round(
            len(capped_found & ctruth) / max(1, len(ctruth)), 4
        ),
        "capped_wall_s_T4": round(cap4_wall, 1),
        "capped_recall_T4": round(
            len(capped4 & ctruth) / max(1, len(ctruth)), 4
        ),
    }
    cemb.unpersist()
    print(json.dumps(res))


if __name__ == "__main__":
    main()
