"""Text-analysis operators over the documents table (driver mandate):
language-ID, quality scoring, token counting, document fingerprinting.
Everything except the rolling-hash fingerprint is pure built-in
expressions (whole-stage codegen; SQL-checkable in DuckDB). BM25 corpus
ranking (bm25_scores) joins one broadcast single-row stats aggregate
back to the scan — the plan shows a BroadcastNestedLoopJoin with a
1-row build side, which is the standard scalar-broadcast pattern, not a
quadratic join."""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

# tiny built-in stopword lists per language (heuristic lang-id; a real
# deployment swaps in fastText — the PLUMBING is the deliverable here)
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "sich", "auf"],
    "fr": ["le", "la", "les", "et", "est", "une", "pour", "dans", "que", "pas"],
    "es": ["el", "los", "las", "es", "una", "por", "para", "como", "pero", "del"],
}


def _words(text_col: str) -> F.Column:
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def _marker_hits(words: F.Column, markers: list[str]) -> F.Column:
    marker_arr = F.array(*[F.lit(m) for m in markers])
    return F.size(
        F.filter(words, lambda w: F.array_contains(marker_arr, w))
    ).cast("double")


def _lang_score_cols(text_col: str) -> list[F.Column]:
    """Per-language marker-fraction score columns (score_<lang>)."""
    words = _words(text_col)
    n = F.greatest(F.size(words), F.lit(1)).cast("double")
    return [
        (_marker_hits(words, m) / n).alias(f"score_{lang}")
        for lang, m in _LANG_MARKERS.items()
    ]


def _lang_pred_cols() -> tuple[F.Column, F.Column]:
    """(lang_pred, lang_score) argmax expressions over score_<lang>
    columns produced by :func:`_lang_score_cols`."""
    langs = list(_LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.when(best <= 0.0, F.lit("und"))
    for lang in langs:
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return pred.alias("lang_pred"), best.alias("lang_score")


def _parallel_docs(docs: DataFrame, text_col: str) -> DataFrame:
    """Project to (doc_id, text) and guarantee the session's parallelism
    (round 7, guide §2.5 input skew): the per-doc text expressions below
    are pure projections, so on a single-row-group parquet input the
    whole corpus pass would otherwise run as ONE task. No-op when the
    source is already split (the normal case at scale)."""
    from light_curve_spark.plans.salting import ensure_min_splits

    return ensure_min_splits(docs.select("doc_id", text_col))


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID: (doc_id, lang_pred, lang_score).

    Per language: fraction of words that are that language's markers;
    argmax wins, 'und' (undetermined) when no marker hits at all."""
    scored = _parallel_docs(docs, text_col).select(
        "doc_id", *_lang_score_cols(text_col)
    )
    pred, best = _lang_pred_cols()
    return scored.select("doc_id", pred, best)


def _quality_cols(text_col: str) -> list[F.Column]:
    """Quality feature + composite-score columns (aliased)."""
    t = F.col(text_col)
    words = _words(text_col)
    n_chars = F.length(t).cast("double")
    safe_chars = F.greatest(n_chars, F.lit(1.0))
    n_words = F.size(words).cast("double")
    safe_words = F.greatest(n_words, F.lit(1.0))
    punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", "")).cast("double")
    upper = F.length(F.regexp_replace(t, r"[^A-Z]", "")).cast("double")
    stop = _marker_hits(words, _LANG_MARKERS["en"])
    mean_wl = (n_chars - (n_words - 1)) / safe_words
    punct_ratio = punct / safe_chars
    stop_ratio = stop / safe_words
    upper_ratio = upper / safe_chars
    # composite: reward stopword presence & moderate word length,
    # penalize punctuation/caps excess. Clamped to [0, 1].
    quality = F.greatest(
        F.least(
            F.lit(0.5)
            + stop_ratio
            - F.abs(mean_wl - 5.0) / 20.0
            - punct_ratio
            - upper_ratio,
            F.lit(1.0),
        ),
        F.lit(0.0),
    )
    return [
        n_chars.alias("n_chars_m"),
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        upper_ratio.alias("upper_ratio"),
        quality.alias("quality"),
    ]


def _token_cols(text_col: str) -> list[F.Column]:
    """Whitespace + BPE-ish token-count columns (aliased)."""
    t = F.trim(F.col(text_col))
    ws = F.when(F.length(t) == 0, 0).otherwise(F.size(F.split(t, r"\s+")))
    pieces = F.regexp_count(t, F.lit(r"[A-Za-z]+|[0-9]|[^\sA-Za-z0-9]"))
    return [
        ws.cast("long").alias("ws_tokens"),
        pieces.cast("long").alias("bpe_tokens"),
    ]


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + composite score:
    (doc_id, n_chars, n_words, mean_word_len, punct_ratio, stopword_ratio,
    upper_ratio, quality). Pure expressions."""
    return _parallel_docs(docs, text_col).select("doc_id", *_quality_cols(text_col))


def token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Two token counts per document:
    - ws_tokens: whitespace-split count;
    - bpe_tokens: BPE-ish regex pieces (letter runs / digit runs /
      single punctuation), a deterministic proxy for subword tokenizers.
    """
    return _parallel_docs(docs, text_col).select("doc_id", *_token_cols(text_col))


def document_attributes(
    docs: DataFrame, text_col: str = "text", include_input: bool = False
) -> DataFrame:
    """All per-document text attributes — (lang_pred, lang_score,
    quality, ws_tokens, bpe_tokens) — in ONE projection pass.

    The separate :func:`language_id` / :func:`quality_score` /
    :func:`token_count` operators are the oracle-gated contract surface;
    composing them with doc_id joins costs three corpus scans and two
    shuffles for columns that are ALL pure per-row expressions. This
    builder selects the union of the same shared expression builders, so
    a pipeline stage pays one scan and zero shuffles (round-4 fix for
    the document pipeline's filters/finalize stages).

    ``include_input=True`` keeps every input column alongside the
    attributes (the finalize posture: clean corpus + attributes with no
    join at all)."""
    from light_curve_spark.plans.salting import ensure_min_splits

    docs = ensure_min_splits(docs if include_input else docs.select("doc_id", text_col))
    base = [F.col(c) for c in docs.columns] if include_input else [F.col("doc_id")]
    scored = docs.select(
        *base, *_lang_score_cols(text_col), *_quality_cols(text_col),
        *_token_cols(text_col),
    )
    pred, best = _lang_pred_cols()
    keep = [c for c in scored.columns if not c.startswith("score_")]
    return scored.select(
        *[F.col(c) for c in keep[: len(base)]],
        pred,
        best,
        *[F.col(c) for c in keep[len(base):]],
    )


FINGERPRINT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("fingerprint", LongType(), False),
    ]
)


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 relevance of every document to a bag of query terms:
    (doc_id, score), documents with no term hit filtered out. The
    standard retrieval/quality-ranking primitive of a training-data
    pipeline (e.g. scoring a corpus against a topic seed list).

    Spark-first shape — NO explode, NO shuffle of document rows:
    per-term tf is an array-filter expression over the word array
    (codegen), corpus statistics (N, Σdl, per-term df) come from ONE
    global aggregate row that is broadcast-cross-joined back, and the
    score is a pure column expression. Wholly SQL-checkable. idf is
    Lucene's non-negative variant ln(1 + (N - df + 0.5)/(df + 0.5));
    avgdl is derived as Σdl/N in the score expression (not avg()) so
    both engines divide identical exact integers."""
    if not terms:
        raise ValueError("bm25_scores needs at least one query term")
    words = F.split(
        F.regexp_replace(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+", " "),
        " ",
    )
    def _eq(term: str):
        # factory, NOT a default arg: Spark introspects the lambda's
        # parameter count, and a 2-arg lambda means (element, index)
        return lambda w: w == F.lit(term)

    from light_curve_spark.plans.caching import cached
    from light_curve_spark.plans.salting import ensure_min_splits

    # split the text ONCE, in parallel, and persist the (1+T)-long
    # projection (round 7, guide §2.3/§4.1): without this the stats
    # aggregate and the scored side each re-scan the corpus and re-split
    # every document, and the term-hit filter below — pushed under the
    # projection — re-evaluates the split a third time; on a single-row-
    # group parquet input all of it ran in ONE task. ensure_min_splits
    # parallelizes the text pass; the cache makes stats + scoring read
    # 8-byte longs. Tiny: (2 + #terms) longs per doc, released via
    # release_operator_caches().
    base = cached(
        ensure_min_splits(docs.select("doc_id", text_col)).select(
            "doc_id",
            F.size(words).cast("long").alias("dl"),
            *[
                F.size(F.filter(words, _eq(t))).cast("long").alias(f"tf{i}")
                for i, t in enumerate(terms)
            ],
        )
    )
    stats = base.agg(
        F.count("*").alias("n"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl") / F.col("n")
    parts = []
    for i in range(len(terms)):
        tf = F.col(f"tf{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n") - F.col(f"df{i}") + F.lit(0.5))
            / (F.col(f"df{i}") + F.lit(0.5))
        )
        parts.append(
            idf
            * tf
            * F.lit(k1 + 1.0)
            / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl))
        )
    score = parts[0]
    for p in parts[1:]:
        score = score + p
    reduce_or = None
    for i in range(len(terms)):
        c = F.col(f"tf{i}") > 0
        reduce_or = c if reduce_or is None else (reduce_or | c)
    return scored.filter(reduce_or).select("doc_id", score.alias("score"))


def _fingerprint_powers(window: int) -> np.ndarray:
    """B^(w-1-j) mod 2^64 for j = 0..w-1 (uint64 wraparound is the mod)."""
    B = np.uint64(1000003)
    powers = np.empty(window, dtype=np.uint64)
    with np.errstate(over="ignore"):
        powers[window - 1] = np.uint64(1)
        for j in range(window - 2, -1, -1):
            powers[j] = powers[j + 1] * B
    return powers


def fingerprint(docs: DataFrame, text_col: str = "text", window: int = 8) -> DataFrame:
    """Winnowing-style document fingerprint: min rolling polynomial hash
    over byte windows (Schleimer et al. 2003 'winnowing' idea, reduced to
    the min-hash of all windows; min in UNSIGNED order, emitted as the
    bit-equal int64). Fully segment-vectorized ``mapInArrow`` kernel: the
    Arrow StringArray's (offsets, data) buffers give flat UTF-8 bytes +
    per-doc lengths, the rolling hash is ``window`` shifted multiply-adds
    over the whole flat buffer, and one ``np.minimum.reduceat`` takes the
    per-document min — NO per-document Python loop. Docs shorter than
    ``window`` are space-padded (0x20) to one window, same as the scalar
    definition; cross-document windows are masked out before the min."""
    import pyarrow as pa

    powers = _fingerprint_powers(window)

    def _segments(arr: "pa.Array") -> tuple[np.ndarray, np.ndarray]:
        """(flat_bytes_u8, lengths) from a string/large_string array;
        nulls become empty docs."""
        if pa.types.is_string(arr.type):
            arr = arr.cast(pa.large_string())
        bufs = arr.buffers()
        off = np.frombuffer(bufs[1], dtype=np.int64)[
            arr.offset : arr.offset + len(arr) + 1
        ]
        raw = (
            np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None
            else np.empty(0, dtype=np.uint8)
        )
        lengths = np.diff(off)
        if not arr.null_count:
            return raw[off[0] : off[-1]], lengths
        # null slots: zero their lengths AND compact the byte buffer by
        # per-doc gathers — a null slot whose offsets span stale bytes
        # would otherwise desync logical starts from the data
        lengths = np.where(np.asarray(arr.is_valid()), lengths, 0)
        raw_starts = off[:-1]
        starts = np.cumsum(lengths) - lengths
        doc_of = np.repeat(np.arange(lengths.shape[0]), lengths)
        within = np.arange(int(lengths.sum())) - starts[doc_of]
        return raw[raw_starts[doc_of] + within], lengths

    def fn(batches):
        for b in batches:
            if b.num_rows == 0:
                continue
            data, lengths = _segments(b.column(b.schema.get_field_index(text_col)))
            R = lengths.shape[0]
            starts = np.cumsum(lengths) - lengths
            # re-pack into a padded flat buffer: every doc gets at least
            # one full window (pad byte 0x20 = space)
            out_len = np.maximum(lengths, window)
            new_starts = np.cumsum(out_len) - out_len
            npad = int(out_len.sum())
            flat = np.full(npad, 32, dtype=np.uint64)
            doc_of_src = np.repeat(np.arange(R), lengths)
            src_pos = np.arange(data.shape[0]) - starts[doc_of_src]
            flat[new_starts[doc_of_src] + src_pos] = data
            # rolling hash over the padded flat buffer: h_p = sum_j
            # flat[p+j] * B^(w-1-j), one shifted multiply-add per offset
            n_h = npad - window + 1
            h = np.zeros(n_h, dtype=np.uint64)
            with np.errstate(over="ignore"):
                for j in range(window):
                    h += flat[j : n_h + j] * powers[j]
            # mask windows that straddle a document boundary
            doc_of_h = np.repeat(np.arange(R), out_len)[:n_h]
            pos_in_doc = np.arange(n_h) - new_starts[doc_of_h]
            h[pos_in_doc > (out_len[doc_of_h] - window)] = np.uint64(0xFFFFFFFFFFFFFFFF)
            fp = np.minimum.reduceat(h, new_starts).view(np.int64)
            yield pa.RecordBatch.from_arrays(
                [b.column(b.schema.get_field_index("doc_id")), pa.array(fp)],
                ["doc_id", "fingerprint"],
            )

    from light_curve_spark.plans.salting import ensure_min_splits

    return ensure_min_splits(docs.select("doc_id", text_col)).mapInArrow(
        fn, schema=FINGERPRINT_SCHEMA
    )


def fingerprint_scalar(text: str, window: int = 8) -> int:
    """Per-document scalar twin of :func:`fingerprint` (naive byte loop) —
    the definition used by tests and the fixture oracle."""
    data = list((text or "").encode("utf-8", "ignore"))
    if len(data) < window:
        data = data + [32] * (window - len(data))
    B = 1000003
    best = None
    for i in range(len(data) - window + 1):
        h = 0
        for byte in data[i : i + window]:
            h = (h * B + byte) % (1 << 64)
        best = h if best is None or h < best else best
    return best - (1 << 64) if best >= (1 << 63) else best
