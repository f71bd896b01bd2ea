"""Independent pure-Python reference implementations used ONLY to build
oracle fixtures (scripts/export_oracle_fixtures.py) for the queries whose
math DuckDB SQL cannot express (engine hash families, LSH, winnowing,
periodogram moments, media stub features).

Everything here is deliberately naive — per-document loops, scalar
arithmetic — so it shares no code path with the engine's vectorized
numpy / JVM-expression implementations. Agreement between the two is a
genuine cross-check, like the DuckDB twins.

The only shared *specification* is the hash family: Spark's
``xxhash64`` is the public XXH64 algorithm (Collet; public domain spec)
with seed 42 and per-type input encoding:

- long column: the 8-byte value through the single-lane tail (one
  round), i.e. ``xxh64_long``;
- string column: UTF-8 bytes through full XXH64 (``xxh64_bytes``);
- multiple columns / array elements chain: the running hash is the seed
  for the next value.

Both are validated against Spark outputs in tests/test_oracle_impl.py.
"""

from __future__ import annotations

import math

MASK64 = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & MASK64
    h ^= h >> 29
    h = (h * P3) & MASK64
    h ^= h >> 32
    return h


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * P2) & MASK64
    return (_rotl(acc, 31) * P1) & MASK64


def xxh64_bytes(data: bytes, seed: int) -> int:
    """XXH64 over a byte string (full algorithm, spec-faithful)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & MASK64
        v2 = (seed + P2) & MASK64
        v3 = seed & MASK64
        v4 = (seed - P1) & MASK64
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * P1 + P4) & MASK64
    else:
        h = (seed + P5) & MASK64
    h = (h + n) & MASK64
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & MASK64
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * P1) & MASK64
        h = (_rotl(h, 23) * P2 + P3) & MASK64
        i += 4
    while i < n:
        h ^= (data[i] * P5) & MASK64
        h = (_rotl(h, 11) * P1) & MASK64
        i += 1
    return _fmix(h)


def xxh64_long(value: int, seed: int) -> int:
    """XXH64 of one 8-byte little-endian long — Spark's hashLong path."""
    h = (seed + P5 + 8) & MASK64
    h ^= _round(0, value & MASK64)
    h = (_rotl(h, 27) * P1 + P4) & MASK64
    return _fmix(h)


def to_i64(u: int) -> int:
    """Reinterpret an unsigned 64-bit value as Spark's signed long."""
    u &= MASK64
    return u - (1 << 64) if u >= (1 << 63) else u


def spark_xxhash64_str(s: str, seed: int = 42) -> int:
    """F.xxhash64(string_col) — signed result."""
    return to_i64(xxh64_bytes(s.encode("utf-8"), seed))


def spark_xxhash64_longs(values: list[int], seed: int = 42) -> int:
    """F.xxhash64(long_col, long_col, ...) or over an array<long>:
    the running hash seeds the next element."""
    h = seed
    for v in values:
        h = xxh64_long(v & MASK64, h & MASK64)
    return to_i64(h)


# ---------------------------------------------------------------------------
# text / dedup reference computations (naive)
# ---------------------------------------------------------------------------

def norm_text(text: str) -> str:
    """lowercase + collapse whitespace — operators/dedup._norm_text."""
    import re

    return re.sub(r"\s+", " ", (text or "").strip().lower())


def word_ngrams(text: str, n: int = 3) -> list[str]:
    """Distinct word n-grams, first-seen order."""
    words = norm_text(text).split(" ")
    if len(words) < n:
        return []
    seen: dict[str, None] = {}
    for i in range(len(words) - n + 1):
        seen.setdefault(" ".join(words[i : i + n]), None)
    return list(seen)


def token_ngrams_ref(tokens: list[int], n: int = 3) -> set:
    """Token-id n-gram hashes — operators/dedup.token_ngrams spec: the
    rolling chain h_0 = xxhash64(t_0), h_i = xxhash64(h_{i-1}, t_i)
    over every length-n window, distinct."""
    if len(tokens) < n:
        return set()
    out = set()
    for i in range(len(tokens) - n + 1):
        h = spark_xxhash64_longs([tokens[i]])
        for t in tokens[i + 1 : i + n]:
            # F.xxhash64(a, b) folds BOTH args from the static seed 42:
            # xxh(b, xxh(a, 42)) — the running hash is the first ARG,
            # never the seed
            h = spark_xxhash64_longs([h, t])
        out.add(h)
    return out


def minhash_lsh_pairs_ref(
    docs: list[tuple[int, str]],
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    seed: int = 42,
) -> list[tuple[int, int, float]]:
    """Reference MinHash+LSH: same hash-family spec as
    operators/dedup.minhash_lsh_pairs, naive loops throughout."""
    gram_sets = {}
    for doc_id, text in docs:
        grams = {spark_xxhash64_str(g) for g in word_ngrams(text, n)}
        if grams:
            gram_sets[doc_id] = grams
    return minhash_from_gram_sets_ref(
        gram_sets, num_hashes=num_hashes, bands=bands,
        threshold=threshold, seed=seed,
    )


def minhash_lsh_tokens_ref(
    docs: list[tuple[str, list[int]]],
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    seed: int = 42,
) -> list:
    """Tokens-native MinHash+LSH — operators/dedup.minhash_lsh_pairs
    with tokens_col set: identical machinery, token-chain grams."""
    gram_sets = {}
    for doc_id, tokens in docs:
        grams = token_ngrams_ref(tokens, n)
        if grams:
            gram_sets[doc_id] = grams
    return minhash_from_gram_sets_ref(
        gram_sets, num_hashes=num_hashes, bands=bands,
        threshold=threshold, seed=seed,
    )


def minhash_from_gram_sets_ref(
    gram_sets: dict,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    seed: int = 42,
) -> list:
    """Gram-source-agnostic back half of the MinHash+LSH reference."""
    rows_per_band = num_hashes // bands
    sigs: dict = {}
    for doc_id, grams in gram_sets.items():
        sigs[doc_id] = [
            min(spark_xxhash64_longs([g, seed + j]) for g in grams)
            for j in range(num_hashes)
        ]
    buckets: dict = {}
    for doc_id, sig in sigs.items():
        for b in range(bands):
            band_hash = spark_xxhash64_longs(
                sig[b * rows_per_band : (b + 1) * rows_per_band]
            )
            buckets.setdefault((b, band_hash), []).append(doc_id)
    cand = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cand.add((ids[i], ids[j]))
    out = []
    for a, b in sorted(cand):
        inter = len(gram_sets[a] & gram_sets[b])
        jac = inter / (len(gram_sets[a]) + len(gram_sets[b]) - inter)
        if jac >= threshold:
            out.append((a, b, jac))
    return out


def simhash_ref(text: str) -> int:
    """64-bit SimHash — operators/dedup.simhash spec, naive loops."""
    words = norm_text(text).split(" ")
    votes = [0] * 64
    for w in words:
        h = spark_xxhash64_str(w) & MASK64
        for i in range(64):
            votes[i] += 1 if (h >> i) & 1 else -1
    sh = 0
    for i in range(64):
        if votes[i] > 0:
            sh |= 1 << i
    return to_i64(sh)


def simhash_tokens_ref(tokens: list[int]) -> int:
    """Tokens-native 64-bit SimHash — operators/dedup.simhash_kernel
    with tokens_col: votes over xxhash64(token_id as int64)."""
    votes = [0] * 64
    for tkn in tokens:
        h = spark_xxhash64_longs([tkn]) & MASK64
        for i in range(64):
            votes[i] += 1 if (h >> i) & 1 else -1
    sh = 0
    for i in range(64):
        if votes[i] > 0:
            sh |= 1 << i
    return to_i64(sh) if tokens else 0


def simhash_pairs_ref(
    docs: list[tuple[int, str]], band_bits: int = 16, max_hamming: int = 8
) -> list[tuple[int, int, int]]:
    """Banded SimHash near-dup candidates with a final hamming filter —
    operators/dedup.simhash_dedup + the query's hamming <= 8."""
    hashes = {doc_id: simhash_ref(t) & MASK64 for doc_id, t in docs}
    n_bands = 64 // band_bits
    mask = (1 << band_bits) - 1
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, sh in hashes.items():
        for b in range(n_bands):
            buckets.setdefault((b, (sh >> (b * band_bits)) & mask), []).append(doc_id)
    cand = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cand.add((ids[i], ids[j]))
    out = []
    for a, b in sorted(cand):
        ham = bin(hashes[a] ^ hashes[b]).count("1")
        if ham <= max_hamming:
            out.append((a, b, ham))
    return out


def fingerprint_ref(text: str, window: int = 8) -> int:
    """Winnowing-min rolling hash — operators/text.fingerprint_scalar
    re-stated (min in unsigned order, emitted as the bit-equal int64)."""
    data = list((text or "").encode("utf-8", "ignore"))
    if len(data) < window:
        data += [32] * (window - len(data))
    B = 1000003
    best = None
    for i in range(len(data) - window + 1):
        h = 0
        for byte in data[i : i + window]:
            h = (h * B + byte) & MASK64
        if best is None or h < best:
            best = h
    return to_i64(best)


# ---------------------------------------------------------------------------
# embedding LSH reference (naive)
# ---------------------------------------------------------------------------

def splitmix64(x: int) -> int:
    z = (x + 0x9E3779B97F4A7C15) & MASK64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK64
    return z ^ (z >> 31)


def hyperplanes_ref(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """operators/similarity._hyperplanes spec via scalar splitmix64."""
    base = (seed * 0x9E3779B9) & MASK64
    vals = [
        (splitmix64((i + base) & MASK64) >> 11) / float(1 << 53)
        for i in range(dim * n_planes)
    ]
    return [
        [(vals[p * dim + d] - 0.5) * 2.0 for d in range(dim)]
        for p in range(n_planes)
    ]


def _dot_seq(a: list[float], b: list[float]) -> float:
    """Strictly sequential left-to-right sum — Spark's F.aggregate order."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def cosine_ref(a: list[float], b: list[float]) -> float:
    na = math.sqrt(_dot_seq(a, a))
    nb = math.sqrt(_dot_seq(b, b))
    return _dot_seq(a, b) / (na * nb)


def lsh_bucket_ref(vec: list[float], planes: list[list[float]]) -> int:
    bucket = 0
    for i, plane in enumerate(planes):
        if _dot_seq(vec, plane) >= 0:
            bucket |= 1 << i
    return bucket


def lsh_ann_topk_ref(
    embeddings: list[tuple[int, list[float]]],
    query: list[float],
    k: int = 10,
    n_planes: int = 8,
    probe_hamming: int = 1,
    seed: int = 42,
) -> list[tuple[int, float]]:
    """operators/similarity.lsh_ann_topk spec, naive."""
    dim = len(query)
    planes = hyperplanes_ref(dim, n_planes, seed)
    qbucket = lsh_bucket_ref(query, planes)
    probe = {qbucket}
    if probe_hamming >= 1:
        probe |= {qbucket ^ (1 << i) for i in range(n_planes)}
    if probe_hamming >= 2:
        probe |= {
            qbucket ^ (1 << i) ^ (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        }
    scored = [
        (vid, cosine_ref(vec, query))
        for vid, vec in embeddings
        if lsh_bucket_ref(vec, planes) in probe
    ]
    scored.sort(key=lambda r: (-r[1], r[0]))
    return scored[:k]


def embedding_pairs_lsh_ref(
    embeddings: list[tuple[int, list[float]]],
    threshold: float = 0.4,
    n_planes: int = 4,
    seed: int = 42,
) -> list[tuple[int, int, float]]:
    """operators/similarity.embedding_cosine_pairs_lsh spec, naive."""
    dim = len(embeddings[0][1])
    planes = hyperplanes_ref(dim, n_planes, seed)
    buckets: dict[int, list[tuple[int, list[float]]]] = {}
    for vid, vec in embeddings:
        buckets.setdefault(lsh_bucket_ref(vec, planes), []).append((vid, vec))
    out = []
    for members in buckets.values():
        members = sorted(members)
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                (ia, va), (ib, vb) = members[i], members[j]
                cos = cosine_ref(va, vb)
                if cos >= threshold:
                    out.append((ia, ib, cos))
    return sorted(out)


# ---------------------------------------------------------------------------
# synthetic sequences reference (naive scalar re-derivation)
# ---------------------------------------------------------------------------

def sequence_row_ref(row_id: int, seed: int = 42) -> tuple[str, int, list[int]]:
    """(doc_id, n_tok, tokens) for one row — sources/synthetic.row_fields
    spec via scalar splitmix64 (no numpy)."""
    s = seed
    u_len = (splitmix64((row_id * 3 + s) & MASK64) >> 11) / float(1 << 53)
    n_tok = min(16384, max(1, int(72.0 * (1.0 - u_len) ** (-1.0 / 1.2))))
    tokens = []
    hi = (s << 32) & MASK64
    for pos in range(n_tok):
        ctr = (row_id * 0x1000003 + pos + hi) & MASK64
        tokens.append(splitmix64(ctr) % 50257)
    return f"doc{row_id:08d}", n_tok, tokens


def sequence_source_ref(row_id: int, seed: int = 42) -> str:
    """source column for one row — row_fields' skewed categorical."""
    u = (splitmix64((row_id * 3 + 1 + seed) & MASK64) >> 11) / float(1 << 53)
    for name, hi in (("web", 0.70), ("code", 0.85), ("books", 0.95)):
        if u < hi:
            return name
    return "wiki"


def rollup_tiers_ref(
    tokens: list[int], base_width: int = 16, tiers=(1, 10, 100)
) -> list[tuple[int, int, int, float, float, float, float]]:
    """(tier, bucket, n_points, v_sum, v_min, v_max, v_mean) rows for one
    sequence — scalar re-derivation of the tier cascade. Token values are
    integer-valued in f64, so bucket sums are EXACT regardless of
    summation order: the committed golden is bit-comparable against any
    engine evaluation order (the north_star bit-match gate)."""
    out = []
    for tier in tiers:
        width = base_width * tier
        buckets: dict[int, list[float]] = {}
        for pos, tok in enumerate(tokens):
            buckets.setdefault(pos // width, []).append(float(tok))
        for b, vals in sorted(buckets.items()):
            s = 0.0
            for v in vals:
                s += v
            out.append(
                (tier, b, len(vals), s, min(vals), max(vals), s / len(vals))
            )
    return out


def ivf_ann_topk_ref(
    embeddings: list[tuple[int, list[float]]],
    query: list[float],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 5,
    sample_size: int = 512,
) -> list[tuple[int, float]]:
    """operators/similarity.ivf_ann_topk spec, naive loops except the
    centroid means (np.mean over id-ordered members — the spec pins this
    exact reduction so buckets are reproducible)."""
    import numpy as np

    ordered = sorted(embeddings)[:sample_size]
    X = np.array([v for _, v in ordered], dtype=np.float64)
    if len(X) < n_centroids:
        raise ValueError("sample smaller than n_centroids")
    # spec (r3): seed with the first n_centroids DISTINCT sample vectors
    # (first occurrence order) so duplicate leading vectors can't seed
    # identical centroids
    seen: list = []
    for row in X:
        if not any((row == s).all() for s in seen):
            seen.append(row)
    if len(seen) < n_centroids:
        raise ValueError("fewer distinct sample vectors than n_centroids")
    cents = np.stack(seen[:n_centroids]).copy()
    for _ in range(iters):
        groups: dict[int, list[np.ndarray]] = {}
        for row in X:
            best_c, best_d = 0, None
            for c in range(n_centroids):
                d = float(((row - cents[c]) ** 2).sum())
                if best_d is None or d < best_d:
                    best_c, best_d = c, d
            groups.setdefault(best_c, []).append(row)
        for c, members in groups.items():
            cents[c] = np.stack(members).mean(axis=0)
    q = np.asarray(query, dtype=np.float64)
    dq = [float(((cents[c] - q) ** 2).sum()) for c in range(n_centroids)]
    probe = set(sorted(range(n_centroids), key=lambda c: (dq[c], c))[:nprobe])
    scored = []
    for vid, vec in embeddings:
        row = np.asarray(vec, dtype=np.float64)
        # same squared-distance reduction (contiguous last axis) as
        # ivf_assign/train — no BLAS gemm/gemv order dependence
        d2 = ((row[None, :] - cents) ** 2).sum(axis=1)
        if int(np.argmin(d2)) in probe:
            scored.append((vid, cosine_ref(vec, query)))
    scored.sort(key=lambda r: (-r[1], r[0]))
    return scored[:k]


def dedup_clusters_ref(pairs: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """(doc_id, keep_id = cluster min) via plain union-find — the
    independent oracle for operators/dedup.dedup_clusters."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    roots: dict[int, list[int]] = {}
    for x in parent:
        roots.setdefault(find(x), []).append(x)
    out = []
    for members in roots.values():
        keep = min(members)
        out.extend((m, keep) for m in members)
    return sorted(out)


def rollup_quantiles_ref(
    tokens: list[int], base_width: int = 16, tiers=(1, 10, 100)
) -> list[tuple[int, int, float, float]]:
    """(tier, bucket, v_median, v_mad) rows for one sequence — scalar
    re-derivation (sort + mean-of-two-middles). Medians of integer-valued
    f64 are exact halves, so engine output is raw-value comparable."""
    out = []
    for tier in tiers:
        width = base_width * tier
        buckets: dict[int, list[float]] = {}
        for pos, tok in enumerate(tokens):
            buckets.setdefault(pos // width, []).append(float(tok))
        for b, vals in sorted(buckets.items()):
            sv = sorted(vals)
            n = len(sv)
            med = 0.5 * (sv[(n - 1) // 2] + sv[n // 2])
            sa = sorted(abs(v - med) for v in vals)
            mad = 0.5 * (sa[(n - 1) // 2] + sa[n // 2])
            out.append((tier, b, med, mad))
    return out


# periodogram moments are computed inline in export_oracle_fixtures.py
# (plain per-doc numpy over the scalar-generated tokens — normalized
# power q = P/sum(P), sample-std moments, peak frequency).


# ---------------------------------------------------------------------------
# media stub reference
# ---------------------------------------------------------------------------

def media_row_ref(media_id: int, seed: int = 42, feat_dim: int = 8):
    """(media_id, kind, n_bytes, f0) — operators/multimodal synthetic
    payload + fake decoder's first chunk-mean, scalar re-derivation."""
    kinds = ["image", "audio", "video"]
    size = 64 + splitmix64((media_id + seed) & MASK64) % 1024
    n_words = size // 8 + 1
    words = [
        splitmix64((i + media_id * 0x10001 + seed) & MASK64) for i in range(n_words)
    ]
    payload = b"".join(w.to_bytes(8, "little") for w in words)[:size]
    data = list(payload)
    # np.array_split: first (n % k) chunks get one extra element
    base, extra = divmod(len(data), feat_dim)
    first_len = base + (1 if extra else 0)
    chunk = data[:first_len]
    f0 = sum(chunk) / len(chunk) if chunk else 0.0
    return media_id, kinds[media_id % 3], len(data), f0


# ---------------------------------------------------------------------------
# real media decode reference (scalar loops + stdlib only — the
# independent cross-check for kernels/media.py; spec: WAV/PCM 8/16-bit,
# BMP 24bpp uncompressed, PPM P6 maxval<=255, y4m C444/C420)
# ---------------------------------------------------------------------------


def _le_ref(buf: bytes, off: int, n: int, signed: bool = False) -> int:
    return int.from_bytes(buf[off : off + n], "little", signed=signed)


def wav_features_ref(buf: bytes) -> list[float]:
    import math

    assert buf[:4] == b"RIFF" and buf[8:12] == b"WAVE"
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        size = _le_ref(buf, pos + 4, 4)
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks pad to even
    channels = _le_ref(fmt, 2, 2)
    rate = _le_ref(fmt, 4, 4)
    bits = _le_ref(fmt, 14, 2)
    samples: list[int] = []
    if bits == 16:
        usable = len(data) // (2 * channels) * (2 * channels)
        for i in range(0, usable, 2):
            samples.append(_le_ref(data, i, 2, signed=True))
    else:
        for i in range(len(data) // channels * channels):
            samples.append(data[i] - 128)
    n = len(samples)
    frames = n // channels
    if n == 0:
        # mirror kernels/media.py wav_features: valid WAV with an empty data
        # chunk yields the documented zero-filled feature row
        return [float(rate), float(channels), 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    s = ss = 0
    mn, mx = samples[0], samples[0]
    for x in samples:
        s += x
        ss += x * x
        mn = min(mn, x)
        mx = max(mx, x)
    zcr = 0
    prev_neg = samples[0] < 0
    for f in range(1, frames):
        neg = samples[f * channels] < 0
        if neg != prev_neg:
            zcr += 1
        prev_neg = neg
    return [
        float(rate), float(channels), float(frames),
        s / n, math.sqrt(ss / n), float(mn), float(mx), float(zcr),
    ]


def _bmp_pixels_ref(buf: bytes) -> list[list[tuple[int, int, int]]]:
    off = _le_ref(buf, 10, 4)
    w = _le_ref(buf, 18, 4, signed=True)
    h = _le_ref(buf, 22, 4, signed=True)
    assert _le_ref(buf, 28, 2) == 24 and _le_ref(buf, 30, 4) == 0
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    px = []
    for row in range(h):
        src = (h - 1 - row) if bottom_up else row
        line = []
        for x in range(w):
            base = off + src * stride + x * 3
            line.append((buf[base + 2], buf[base + 1], buf[base]))  # BGR->RGB
        px.append(line)
    return px


def _ppm_pixels_ref(buf: bytes) -> list[list[tuple[int, int, int]]]:
    assert buf[:2] == b"P6"
    pos, tokens = 2, []
    while len(tokens) < 3:
        c = buf[pos : pos + 1]
        if c == b"#":
            while buf[pos : pos + 1] != b"\n":
                pos += 1
            pos += 1
        elif c.isspace():
            pos += 1
        else:
            tok = b""
            while not buf[pos : pos + 1].isspace():
                tok += buf[pos : pos + 1]
                pos += 1
            tokens.append(int(tok))
    pos += 1
    w, h, maxval = tokens
    assert maxval <= 255
    px = []
    for row in range(h):
        line = []
        for x in range(w):
            base = pos + (row * w + x) * 3
            line.append((buf[base], buf[base + 1], buf[base + 2]))
        px.append(line)
    return px


def image_features_ref(buf: bytes) -> list[float]:
    import math

    px = _bmp_pixels_ref(buf) if buf[:2] == b"BM" else _ppm_pixels_ref(buf)
    h, w = len(px), len(px[0])
    n = w * h
    sums = [0, 0, 0]
    ss = 0
    mn, mx = 255, 0
    for line in px:
        for r, g, b in line:
            sums[0] += r
            sums[1] += g
            sums[2] += b
            for val in (r, g, b):
                ss += val * val
                mn = min(mn, val)
                mx = max(mx, val)
    all_n = n * 3
    s = sums[0] + sums[1] + sums[2]
    mean = s / all_n
    var = ss / all_n - mean * mean
    return [
        float(w), float(h), sums[0] / n, sums[1] / n, sums[2] / n,
        math.sqrt(var), float(mn), float(mx),
    ]


def y4m_features_ref(buf: bytes) -> list[float]:
    import math

    nl = buf.index(b"\n")
    parts = buf[:nl].decode("ascii").split(" ")
    assert parts[0] == "YUV4MPEG2"
    w = h = None
    fn, fd = 25, 1
    cs = "C420"
    for p in parts[1:]:
        if p.startswith("W"):
            w = int(p[1:])
        elif p.startswith("H"):
            h = int(p[1:])
        elif p.startswith("F"):
            fn, fd = (int(x) for x in p[1:].split(":"))
        elif p.startswith("C"):
            cs = p
    if cs.startswith("C444"):
        uw, uh = w, h
    else:
        assert cs.startswith("C420")
        uw, uh = w // 2, h // 2
    ysz, usz = w * h, uw * uh
    pos = nl + 1
    n_frames = 0
    ys = us = vs = yss = 0
    while pos < len(buf):
        pos = buf.index(b"\n", pos) + 1  # skip FRAME line
        for i in range(ysz):
            b0 = buf[pos + i]
            ys += b0
            yss += b0 * b0
        for i in range(usz):
            us += buf[pos + ysz + i]
            vs += buf[pos + ysz + usz + i]
        pos += ysz + 2 * usz
        n_frames += 1
    ny = n_frames * ysz
    nu = n_frames * usz
    mean_y = ys / ny
    var_y = yss / ny - mean_y * mean_y
    return [
        float(n_frames), float(w), float(h), fn / fd,
        mean_y, us / nu, vs / nu, math.sqrt(var_y),
    ]


def media_real_row_ref(media_id: int, kind: str, buf: bytes):
    feats = {
        "audio": wav_features_ref,
        "image": image_features_ref,
        "video": y4m_features_ref,
    }[kind](buf)
    return (media_id, kind, len(buf), *feats)


def simhash_weighted_ref(docs: list[tuple[int, str]]) -> dict[int, int]:
    """operators/dedup.simhash_weighted_kernel spec, naive loops: each
    word votes with integer weight bit_length(n_docs // df) - 1
    (= floor(log2(n_docs // df)); hot words weight 0), null-text docs
    sh = 0. Exact int sums — no float anywhere."""
    n_docs = len(docs)
    doc_hashes: dict[int, list[int]] = {}
    df: dict[int, int] = {}
    for doc_id, text in docs:
        if text is None:
            doc_hashes[doc_id] = []
            continue
        hs = [spark_xxhash64_str(w) for w in norm_text(text).split(" ")]
        doc_hashes[doc_id] = hs
        for h in set(hs):
            df[h] = df.get(h, 0) + 1
    out: dict[int, int] = {}
    for doc_id, hs in doc_hashes.items():
        votes = [0] * 64
        for h in hs:
            w = (n_docs // df[h]).bit_length() - 1
            hu = h & MASK64
            for i in range(64):
                votes[i] += w if (hu >> i) & 1 else -w
        sh = 0
        for i in range(64):
            if votes[i] > 0:
                sh |= 1 << i
        out[doc_id] = to_i64(sh)
    return out
