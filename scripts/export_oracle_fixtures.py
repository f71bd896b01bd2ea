"""Materialize independent-oracle fixtures for the queries whose math
DuckDB SQL cannot express (hash families, LSH, winnowing, periodogram
moments, LTTB, media stubs).

Each fixture is computed by the NAIVE pure-Python/plain-numpy reference
implementations in scripts/oracle_impl.py (no shared code with the
engine's vectorized kernels or JVM expressions) over the sf0.01 driver
tables — the scale at which the driver runs its correctness gate. The
matching ``oracle_sql()`` entries in __spark_entry__.py are plain
``SELECT ... FROM read_parquet('<fixture>')`` statements, so the driver
compares the Spark engine against this second implementation exactly the
way it compares against DuckDB twins.

Re-run after changing any covered operator's spec:

    PYTHONPATH=. python scripts/export_oracle_fixtures.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from oracle_impl import (
    dedup_clusters_ref,
    embedding_pairs_lsh_ref,
    rollup_quantiles_ref,
    sequence_source_ref,
    fingerprint_ref,
    ivf_ann_topk_ref,
    lsh_ann_topk_ref,
    media_real_row_ref,
    minhash_lsh_pairs_ref,
    sequence_row_ref,
    simhash_pairs_ref,
    simhash_weighted_ref,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "fixtures", "oracle")


def _docs(sf_dir: str) -> list[tuple[int, str]]:
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    return list(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))


def _embeddings(sf_dir: str) -> list[tuple[int, list[float]]]:
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
    return [
        (vid, [float(x) for x in vec])
        for vid, vec in zip(t.column("vec_id").to_pylist(), t.column("embedding").to_pylist())
    ]


def export_dedup_clusters(docs) -> None:
    """Clusters over the same ngram-jaccard pairs the engine query uses
    (threshold 0.5, max_df 100), resolved by plain union-find."""
    from oracle_impl import spark_xxhash64_str, word_ngrams

    gram_sets = {
        doc_id: {spark_xxhash64_str(g) for g in word_ngrams(text, 3)}
        for doc_id, text in docs
    }
    df_count: dict[int, int] = {}
    for s in gram_sets.values():
        for g in s:
            df_count[g] = df_count.get(g, 0) + 1
    pruned = {
        d: {g for g in s if df_count[g] <= 100} for d, s in gram_sets.items()
    }
    ids = sorted(pruned)
    pairs = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(pruned[a] & pruned[b])
            if inter == 0:
                continue
            union = len(pruned[a]) + len(pruned[b]) - inter
            if union and inter / union >= 0.5:
                pairs.append((a, b))
    rows = dedup_clusters_ref(pairs)
    pd.DataFrame(rows, columns=["doc_id", "keep_id"]).astype("int64").to_parquet(
        os.path.join(OUT, "dedup_clusters.parquet"), index=False
    )


def export_minhash(docs) -> None:
    pairs = minhash_lsh_pairs_ref(docs, n=3, num_hashes=16, bands=4, threshold=0.5)
    pd.DataFrame(pairs, columns=["doc_a", "doc_b", "jaccard"]).astype(
        {"doc_a": "int64", "doc_b": "int64", "jaccard": "float64"}
    ).to_parquet(os.path.join(OUT, "minhash_lsh.parquet"), index=False)


def export_simhash(docs) -> None:
    pairs = simhash_pairs_ref(docs, band_bits=16, max_hamming=8)
    pd.DataFrame(pairs, columns=["doc_a", "doc_b", "hamming"]).astype(
        {"doc_a": "int64", "doc_b": "int64", "hamming": "int32"}
    ).to_parquet(os.path.join(OUT, "simhash_pairs.parquet"), index=False)


def export_simhash_weighted(docs) -> None:
    sh = simhash_weighted_ref(docs)
    pd.DataFrame(
        sorted(sh.items()), columns=["doc_id", "sh"]
    ).astype({"doc_id": "int64", "sh": "int64"}).to_parquet(
        os.path.join(OUT, "simhash_weighted_500.parquet"), index=False
    )


def export_fingerprint(docs) -> None:
    rows = [(doc_id, fingerprint_ref(text, window=8)) for doc_id, text in docs]
    pd.DataFrame(rows, columns=["doc_id", "fingerprint"]).astype("int64").to_parquet(
        os.path.join(OUT, "fingerprint.parquet"), index=False
    )


def export_lsh_ann(emb) -> None:
    query = dict(emb)[0]
    top = lsh_ann_topk_ref(emb, query, k=10, n_planes=8, probe_hamming=1)
    pd.DataFrame(top, columns=["vec_id", "cosine"]).astype(
        {"vec_id": "int64", "cosine": "float64"}
    ).to_parquet(os.path.join(OUT, "lsh_ann.parquet"), index=False)


def export_ivf_ann(emb) -> None:
    query = dict(emb)[0]
    top = ivf_ann_topk_ref(emb, query, k=10, n_centroids=16, nprobe=4)
    pd.DataFrame(top, columns=["vec_id", "cosine"]).astype(
        {"vec_id": "int64", "cosine": "float64"}
    ).to_parquet(os.path.join(OUT, "ivf_ann.parquet"), index=False)


def export_embedding_pairs_lsh(emb) -> None:
    pairs = embedding_pairs_lsh_ref(emb, threshold=0.4, n_planes=4)
    pd.DataFrame(pairs, columns=["id_a", "id_b", "cosine"]).astype(
        {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
    ).to_parquet(os.path.join(OUT, "embedding_pairs_lsh.parquet"), index=False)


def export_sequences_and_periodogram(n_rows: int = 300, seed: int = 42) -> None:
    freqs = np.linspace(0.05, 0.45, 9)
    seq_rows, pg_rows = [], []
    for rid in range(n_rows):
        doc_id, n_tok, tokens = sequence_row_ref(rid, seed)
        seq_rows.append((doc_id, n_tok))
        # plain per-doc numpy periodogram (not the segment-vectorized
        # kernel): normalized-power moments + peak frequency
        v = np.asarray(tokens, dtype=np.float64)
        t = np.arange(v.shape[0], dtype=np.float64)
        d = v - v.mean()
        power = np.empty(freqs.shape[0])
        for k, f in enumerate(freqs):
            ph = 2.0 * np.pi * f * t
            c = float(np.sum(d * np.cos(ph)))
            s = float(np.sum(d * np.sin(ph)))
            power[k] = c * c + s * s
        q = power / power.sum()
        qmu, qsd = q.mean(), q.std(ddof=1)
        z = (q - qmu) / qsd if qsd != 0.0 else np.zeros_like(q)
        pg_rows.append(
            (
                doc_id,
                float(qmu),
                float(qsd),
                float(np.mean(z**3)),
                float(np.mean(z**4) - 3.0),
                float(freqs[np.argmax(power)]),
            )
        )
    pd.DataFrame(seq_rows, columns=["doc_id", "n_tok"]).astype(
        {"n_tok": "int32"}
    ).to_parquet(os.path.join(OUT, "sequences_300.parquet"), index=False)
    pd.DataFrame(
        pg_rows,
        columns=["doc_id", "pg_mean", "pg_std", "pg_skew", "pg_kurt", "pg_peak_freq"],
    ).to_parquet(os.path.join(OUT, "periodogram_seq.parquet"), index=False)


def export_rollup_quantiles(n_rows: int = 300, seed: int = 42) -> None:
    rows = []
    for rid in range(n_rows):
        doc_id, _, tokens = sequence_row_ref(rid, seed)
        source = sequence_source_ref(rid, seed)
        for tier, b, med, mad in rollup_quantiles_ref(tokens):
            rows.append((doc_id, source, tier, b, med, mad))
    pd.DataFrame(
        rows,
        columns=["doc_id", "source", "tier", "bucket", "v_median", "v_mad"],
    ).astype({"tier": "int32", "bucket": "int64"}).to_parquet(
        os.path.join(OUT, "rollup_quantiles_300.parquet"), index=False
    )


def export_media_real() -> None:
    """Real-decode features over the committed fixtures/media files,
    computed by the scalar stdlib-only reference decoders."""
    media_dir = os.path.join(REPO, "fixtures", "media")
    rows = []
    for name in sorted(os.listdir(media_dir)):
        with open(os.path.join(media_dir, name), "rb") as f:
            buf = f.read()
        media_id = int(name.split("_")[0])
        kind = name.split("_")[1].split(".")[0]
        rows.append(media_real_row_ref(media_id, kind, buf))
    cols = ["media_id", "kind", "n_bytes"] + [f"f{i}" for i in range(8)]
    pd.DataFrame(rows, columns=cols).astype(
        {"media_id": "int64", "n_bytes": "int64"}
        | {f"f{i}": "float64" for i in range(8)}
    ).to_parquet(os.path.join(OUT, "media_real.parquet"), index=False)


def _lttb_ref(t: np.ndarray, v: np.ndarray, n_out: int):
    """Independent LTTB (Steinarsson 2013): same bucket-edge/centroid
    spec as operators/downsample.lttb, separately coded."""
    n = t.shape[0]
    if n_out >= n or n_out < 3:
        return t, v
    edges = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
    chosen = [0]
    a = 0
    for i in range(n_out - 2):
        lo, hi = int(edges[i]), int(edges[i + 1])
        nlo = int(edges[i + 1])
        nhi = n if i + 1 == n_out - 2 else int(edges[i + 2])
        cx = t[nlo:nhi].mean() if nhi > nlo else t[-1]
        cy = v[nlo:nhi].mean() if nhi > nlo else v[-1]
        best_j, best_area = lo, -1.0
        for j in range(lo, hi):
            area = abs((t[a] - cx) * (v[j] - v[a]) - (t[a] - t[j]) * (cy - v[a]))
            if area > best_area:
                best_j, best_area = j, area
        a = best_j
        chosen.append(a)
    chosen.append(n - 1)
    return t[chosen], v[chosen]


def export_lttb_events(sf_dir: str, n_out: int = 40) -> None:
    tbl = pq.read_table(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts", "value"]
    ).to_pandas()
    # epoch microseconds as double — same series view as _events_series
    tbl["t"] = tbl["ts"].astype("datetime64[us]").astype("int64").astype("float64")
    out = []
    for uid, g in tbl.groupby("user_id"):
        # (t, v) lexsort — mirrors operators/downsample's deterministic
        # duplicate-timestamp tie order
        tv, vv = g["t"].to_numpy(), g["value"].to_numpy()
        order = np.lexsort((vv, tv))
        t = tv[order]
        v = vv[order]
        td, vd = _lttb_ref(t, v, n_out)
        out.append(pd.DataFrame({"user_id": uid, "t": td, "v": vd}))
    pd.concat(out).astype({"user_id": "int64"}).to_parquet(
        os.path.join(OUT, "lttb_events.parquet"), index=False
    )


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    os.makedirs(OUT, exist_ok=True)
    docs = _docs(sf_dir)
    emb = _embeddings(sf_dir)
    export_minhash(docs)
    export_dedup_clusters(docs)
    print("minhash_lsh/clusters done")
    export_simhash(docs)
    export_simhash_weighted(docs)
    print("simhash done")
    export_fingerprint(docs)
    print("fingerprint done")
    export_lsh_ann(emb)
    export_ivf_ann(emb)
    export_embedding_pairs_lsh(emb)
    print("embedding LSH/IVF done")
    export_sequences_and_periodogram()
    export_rollup_quantiles()
    print("sequences/periodogram/quantiles done")
    export_media_real()
    export_lttb_events(sf_dir)
    print("all fixtures written to", OUT)
