"""Star-contraction connected-components stress at millions of edges
(round-3 mandate follow-through: the 91k-doc corpus only exercised ~27k
pairs; this is the direct graph-scale evidence).

Deterministic synthetic edge set, all generated JVM-side:
- 150,000 chains of length 10 (1.35M edges) — the shallow near-dup
  cluster shape at fleet scale;
- ONE permuted chain of 131,071 nodes (adversarial diameter; the ids
  are scrambled by the bijection i -> i*48271 mod 131071 so the chain
  is not id-monotone);
- 10,000 stars of 50 leaves (500k edges) — already-collapsed clusters.

Total ~1.98M edges / ~2.1M nodes. Records wall seconds, rounds to
convergence (must be O(log n) — the 131k-node chain alone would need
~65k label-propagation rounds), and cluster-count sanity.

Run: PYTHONPATH=. python scripts/stress_star_cc.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

P = 131071  # 2^17 - 1, prime: i*48271 mod P is a bijection on [0, P)


def edges(spark):
    # 150k chains of 10: nodes [0, 1.5M)
    c10 = spark.range(150_000 * 9).select(
        (F.col("id") % 9 + (F.col("id") / 9).cast("long") * 10).alias("doc_a"),
        (F.col("id") % 9 + (F.col("id") / 9).cast("long") * 10 + 1).alias("doc_b"),
    )
    # permuted mega chain: nodes [2e6, 2e6 + P)
    base = F.lit(2_000_000)
    perm = lambda c: (c * 48271) % F.lit(P) + base  # noqa: E731
    mega = spark.range(P - 1).select(
        perm(F.col("id")).alias("doc_a"), perm(F.col("id") + 1).alias("doc_b")
    )
    # 10k stars of 50: hubs at 3e6 + 51*k, leaves following
    stars = spark.range(10_000 * 50).select(
        (F.lit(3_000_000) + (F.col("id") / 50).cast("long") * 51).alias("doc_a"),
        (
            F.lit(3_000_000)
            + (F.col("id") / 50).cast("long") * 51
            + (F.col("id") % 50)
            + 1
        ).alias("doc_b"),
    )
    return c10.unionByName(mega).unionByName(stars)


def main() -> None:
    from light_curve_spark.operators.dedup import _star_labels
    from light_curve_spark.session import build_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(
        app_name="stress-star-cc", master=f"local[{cpus}]",
        shuffle_partitions=4 * cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    # reliable checkpoint dir: exercises the round-4 superseded-round
    # cleanup at stress scale (pre-r4, ~16 rounds x ~full-edge-set
    # copies accumulated here)
    import tempfile

    ckpt = tempfile.mkdtemp(prefix="starcc-ckpt-")
    spark.sparkContext.setCheckpointDir(ckpt)
    e = edges(spark).persist()
    n_edges = e.count()
    t0 = time.time()
    labels, rounds, _ckpts = _star_labels(e, "doc_a", "doc_b", max_iter=50)
    labels = labels.persist()
    n_nodes = labels.count()
    wall = time.time() - t0
    n_clusters = labels.select("keep_id").distinct().count()
    # the bijection covers [0, P), so the mega chain's min node is 2e6
    mega_size = labels.filter(F.col("keep_id") == 2_000_000).count()
    print(
        json.dumps(
            {
                "n_edges": n_edges,
                "n_nodes": n_nodes,
                "rounds": rounds,
                "wall_s": round(wall, 1),
                "n_clusters": n_clusters,
                "mega_chain_size": mega_size,
                "surviving_ckpt_dirs": sum(
                    1
                    for dp, dirs, _ in os.walk(ckpt)
                    for d in dirs
                    if d.startswith("rdd-")
                ),
                "expected": {"clusters": 150_000 + 1 + 10_000, "mega": P},
            }
        )
    )


if __name__ == "__main__":
    main()
