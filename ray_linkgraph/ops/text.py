"""Text analysis stages over a documents table (doc_id, text, ...).

All per-batch kernels are Arrow-vectorized (pyarrow.compute regex/string
kernels — RE2, the same regex engine DuckDB uses, so the SQL oracles
match exactly); the language-id stage is a callable class so its
stopword tables build once per actor.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"\w+"
ALPHA_RE = r"[A-Za-z]"
DIGIT_RE = r"[0-9]"
PUNCT_RE = r"[.,;:!?]"

# small deterministic stopword lists for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "as"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "für", "auf"],
    "fr": ["le", "la", "les", "et", "de", "est", "un", "une", "pour", "dans"],
}
LANG_ORDER = ["en", "de", "fr"]  # tie-break order (first wins)


def token_stats(batch: pa.Table, text_col: str = "text",
                id_col: str = "doc_id") -> pa.Table:
    """(doc_id, n_tokens, n_chars): \\w+ token count + character length."""
    t = batch.column(text_col)
    return pa.table({
        id_col: batch.column(id_col),
        "n_tokens": pc.cast(pc.count_substring_regex(t, TOKEN_RE), pa.int64()),
        "n_chars": pc.cast(pc.utf8_length(t), pa.int64()),
    })


def quality_stats(batch: pa.Table, text_col: str = "text",
                  id_col: str = "doc_id") -> pa.Table:
    """Quality-scoring counts + a simple deterministic score in [0, 1]:
    alpha ratio damped by punctuation density (rounded to 10 decimals so
    the DuckDB oracle hashes identically)."""
    t = batch.column(text_col)
    n_chars = pc.cast(pc.utf8_length(t), pa.int64()).to_numpy()
    n_alpha = pc.cast(pc.count_substring_regex(t, ALPHA_RE),
                      pa.int64()).to_numpy()
    n_digit = pc.cast(pc.count_substring_regex(t, DIGIT_RE),
                      pa.int64()).to_numpy()
    n_punct = pc.cast(pc.count_substring_regex(t, PUNCT_RE),
                      pa.int64()).to_numpy()
    denom = np.maximum(n_chars, 1).astype(np.float64)
    score = np.round((n_alpha / denom) * (1.0 - n_punct / denom), 10)
    return pa.table({
        id_col: batch.column(id_col),
        "n_chars": pa.array(n_chars),
        "n_alpha": pa.array(n_alpha),
        "n_digit": pa.array(n_digit),
        "n_punct": pa.array(n_punct),
        "quality": pa.array(score),
    })


class LangId:
    """Stopword-hit language id (actor-pool stage; regexes compiled once).

    Counts whole-word stopword hits per language over lowercased text;
    predicts the max-hit language, ties broken in LANG_ORDER; 'und'
    (undetermined) when no stopword hits at all.
    """

    def __init__(self):
        self.patterns = {
            lang: r"\b(" + "|".join(ws) + r")\b"
            for lang, ws in STOPWORDS.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(batch.column("text"))
        hits = {lang: pc.cast(pc.count_substring_regex(low, pat),
                              pa.int64()).to_numpy()
                for lang, pat in self.patterns.items()}
        n = len(batch)
        best = np.full(n, "und", dtype=object)
        best_hits = np.zeros(n, dtype=np.int64)
        for lang in LANG_ORDER:  # first language wins ties
            h = hits[lang]
            take = h > best_hits
            best[take] = lang
            best_hits[take] = h[take]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "lang_pred": pa.array(best.tolist(), type=pa.string()),
            "stop_hits": pa.array(best_hits),
        })


_FP_M = np.uint64((1 << 31) - 1)   # Mersenne modulus: products stay < 2^40
_FP_B = np.uint64(131)
_FP_POWERS = None


def _fp_powers(n: int) -> np.ndarray:
    global _FP_POWERS
    if _FP_POWERS is None or len(_FP_POWERS) < n:
        size = max(n, 4096)
        p = np.empty(size, dtype=np.uint64)
        p[0] = 1
        for i in range(1, size):  # once per process, amortized
            p[i] = (p[i - 1] * _FP_B) % _FP_M
        _FP_POWERS = p
    return _FP_POWERS


def fingerprint(batch: pa.Table, text_col: str = "text",
                id_col: str = "doc_id") -> pa.Table:
    """Document fingerprint: polynomial rolling hash over the raw utf-8
    bytes mod 2^31-1 — order- and whitespace-sensitive. Vectorized per
    document via precomputed power tables (no per-char Python loop)."""
    texts = batch.column(text_col).to_pylist()
    out = np.empty(len(texts), dtype=np.int64)
    for i, s in enumerate(texts):
        b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
        p = _fp_powers(len(b))
        # hash = sum b[j] * B^(n-1-j) mod M, summed in uint64 chunks
        terms = (b.astype(np.uint64) * p[:len(b)][::-1]) % _FP_M
        out[i] = int(terms.sum() % _FP_M)
    return pa.table({id_col: batch.column(id_col),
                     "fingerprint": pa.array(out)})
