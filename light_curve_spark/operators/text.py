"""Text-analysis operators over the documents table (driver mandate):
language-ID, quality scoring, token counting, document fingerprinting.
Everything except the rolling-hash fingerprint is pure built-in
expressions (whole-stage codegen; SQL-checkable in DuckDB)."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
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


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID: (doc_id, lang_pred, lang_score).

    Per language: fraction of words that are that language's markers;
    argmax wins, 'und' (undetermined) when no marker hits at all."""
    words = _words(text_col)
    n = F.greatest(F.size(words), F.lit(1)).cast("double")
    scored = docs.select(
        "doc_id",
        *[
            (_marker_hits(words, m) / n).alias(f"score_{lang}")
            for lang, m in _LANG_MARKERS.items()
        ],
    )
    langs = list(_LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.when(best <= 0.0, F.lit("und"))
    for lang in langs:
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return scored.select(
        "doc_id", pred.alias("lang_pred"), best.alias("lang_score")
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + composite score:
    (doc_id, n_chars, n_words, mean_word_len, punct_ratio, stopword_ratio,
    upper_ratio, quality). Pure expressions."""
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
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars_m"),
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        upper_ratio.alias("upper_ratio"),
        quality.alias("quality"),
    )


def token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Two token counts per document:
    - ws_tokens: whitespace-split count;
    - bpe_tokens: BPE-ish regex pieces (letter runs / digit runs /
      single punctuation), a deterministic proxy for subword tokenizers.
    """
    t = F.trim(F.col(text_col))
    ws = F.when(F.length(t) == 0, 0).otherwise(F.size(F.split(t, r"\s+")))
    pieces = F.regexp_count(t, F.lit(r"[A-Za-z]+|[0-9]|[^\sA-Za-z0-9]"))
    return docs.select(
        "doc_id",
        ws.cast("long").alias("ws_tokens"),
        pieces.cast("long").alias("bpe_tokens"),
    )


FINGERPRINT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("fingerprint", LongType(), False),
    ]
)


def fingerprint(docs: DataFrame, text_col: str = "text", window: int = 8) -> DataFrame:
    """Winnowing-style document fingerprint: min rolling polynomial hash
    over byte windows (Schleimer et al. 2003 'winnowing' idea, reduced to
    the min-hash of all windows). Vectorized numpy rolling hash in a
    mapInPandas kernel — the one text op not expressible relationally."""
    B = np.uint64(1000003)
    # B^(w-1-j) mod 2^64 for j = 0..w-1
    powers = np.empty(window, dtype=np.uint64)
    powers[window - 1] = np.uint64(1)
    for j in range(window - 2, -1, -1):
        powers[j] = powers[j + 1] * B

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fps = []
            for text in pdf[text_col]:
                data = np.frombuffer(
                    (text or "").encode("utf-8", "ignore"), dtype=np.uint8
                ).astype(np.uint64)
                if data.shape[0] < window:
                    data = np.pad(data, (0, window - data.shape[0]), constant_values=32)
                n = data.shape[0]
                # h_i = sum_{j<w} data[i+j] * B^(w-1-j): one shifted
                # vector multiply-add per window offset (w=8), no byte loop
                h = np.zeros(n - window + 1, dtype=np.uint64)
                for j in range(window):
                    h += data[j : n - window + 1 + j] * powers[j]
                fps.append(int(h.min().astype(np.int64)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "fingerprint": fps})

    return docs.select("doc_id", text_col).mapInPandas(fn, schema=FINGERPRINT_SCHEMA)
