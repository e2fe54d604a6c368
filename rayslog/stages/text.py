"""Text-analysis stages for large-scale training-data pipelines.

All operate on the ``documents`` table (doc_id, text, lang, source,
n_chars) as vectorized ``map_batches`` transforms:

- content hashing / exact dedup (md5 for DuckDB parity; at 100 TB swap
  in a 64-bit xxhash — the plumbing is identical),
- quality scoring (length / token / punctuation / stopword ratios),
- token counting (whitespace + a BPE-ish word/number/punct regex),
- language ID (stopword-profile heuristic; actor pool with profiles
  compiled once per actor),
- document fingerprinting (rolling polynomial hash over tokens).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: BPE-ish pretokenizer: words / numbers / single punctuation runs.
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "for", "on"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "por", "con", "los"},
    "fr": {"le", "la", "de", "et", "les", "des", "en", "un", "du", "que"},
    "de": {"der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "im"},
}


def add_text_hash(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append ``text_hash`` = md5(text) — the exact-dedup key."""
    texts = batch.column(col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    hashes = [
        hashlib.md5(t.encode("utf-8")).hexdigest() if t is not None else None
        for t in texts.to_pylist()
    ]
    return batch.append_column("text_hash", pa.array(hashes, pa.string()))


def quality_features(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append n_chars_measured, n_tokens, n_words, alpha_ratio, space_ratio."""
    t = batch.column(col)
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    n_chars = pc.utf8_length(t)
    n_tokens = pc.count_substring_regex(t, r"\S+")
    n_words = pc.count_substring_regex(t, r"[A-Za-z]+")
    n_alpha = pc.count_substring_regex(t, r"[A-Za-z]")
    n_space = pc.count_substring_regex(t, r" ")
    # plain IEEE division of exact integer counts — bit-identical to the
    # DuckDB oracle's division, so no rounding is needed for parity
    denom = pc.max_element_wise(n_chars, pa.scalar(1, n_chars.type))
    alpha_ratio = pc.divide(
        pc.cast(n_alpha, pa.float64()), pc.cast(denom, pa.float64())
    )
    space_ratio = pc.divide(
        pc.cast(n_space, pa.float64()), pc.cast(denom, pa.float64())
    )
    return (
        batch.append_column("n_chars_measured", pc.cast(n_chars, pa.int64()))
        .append_column("n_tokens", pc.cast(n_tokens, pa.int64()))
        .append_column("n_words", pc.cast(n_words, pa.int64()))
        .append_column("alpha_ratio", alpha_ratio)
        .append_column("space_ratio", space_ratio)
    )


def token_counts(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append ws_tokens (whitespace split) and bpe_tokens (TOKEN_RE)."""
    t = batch.column(col)
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    ws = pc.count_substring_regex(t, r"\S+")
    bpe = pc.count_substring_regex(t, TOKEN_RE)
    return batch.append_column(
        "ws_tokens", pc.cast(ws, pa.int64())
    ).append_column("bpe_tokens", pc.cast(bpe, pa.int64()))


class LangId:
    """Actor-pool language-ID stage (stopword-profile heuristic).

    Profiles are compiled once per actor (``__init__``); scoring is a
    per-batch loop over token sets.  zh detection falls back to a CJK
    codepoint test.  Deterministic; intended as the n-gram-heuristic
    stand-in for a real langid model (which would load in ``__init__``
    the same way).
    """

    def __init__(self):
        import re

        self.word = re.compile(r"[A-Za-z]+")
        self.cjk = re.compile(r"[一-鿿]")
        self.profiles = {k: frozenset(v) for k, v in _STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        preds = []
        for t in texts.to_pylist():
            if t is None:
                preds.append(None)
                continue
            if self.cjk.search(t):
                preds.append("zh")
                continue
            toks = [w.lower() for w in self.word.findall(t)]
            if not toks:
                preds.append("und")
                continue
            best, best_score = "und", 0
            for lang, stop in self.profiles.items():
                score = sum(1 for w in toks if w in stop)
                if score > best_score:
                    best, best_score = lang, score
            preds.append(best)
        return batch.append_column("lang_pred", pa.array(preds, pa.string()))


def rolling_fingerprint(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append ``fingerprint``: order-sensitive polynomial rolling hash
    over whitespace tokens (Rabin-Karp style, mod 2^61-1)."""
    import re

    MOD = (1 << 61) - 1
    BASE = 1_000_003
    t = batch.column(col)
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    token_re = re.compile(r"\S+")
    out = []
    for s in t.to_pylist():
        if s is None:
            out.append(None)
            continue
        h = 0
        for tok in token_re.findall(s):
            th = int.from_bytes(
                hashlib.blake2b(tok.encode(), digest_size=8).digest(), "little"
            )
            h = (h * BASE + th) % MOD
        out.append(h)
    return batch.append_column("fingerprint", pa.array(out, pa.int64()))
