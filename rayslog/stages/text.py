"""Text-analysis stages for large-scale training-data pipelines.

All operate on the ``documents`` table (doc_id, text, lang, source,
n_chars) as vectorized ``map_batches`` transforms:

- content hashing / exact dedup (two-seed 64-bit polynomial hash over
  the Arrow buffers — an effectively-128-bit key; the SQL oracle groups
  by ``text`` itself so no digest parity is needed),
- quality scoring (length / token / punctuation / stopword ratios),
- token counting (whitespace + a BPE-ish word/number/punct regex),
- language ID (stopword-profile heuristic, fully vectorized via
  flat-token membership + segmented counts),
- document fingerprinting (rolling polynomial hash over token hashes).

Every kernel is one numpy pass over the batch's flat token/byte layout
(``rayslog.kernels.texthash``) — no per-row Python on any hot path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rayslog.kernels import texthash as tx

#: BPE-ish pretokenizer: words / numbers / single punctuation runs.
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "for", "on"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "por", "con", "los"},
    "fr": {"le", "la", "de", "et", "les", "des", "en", "un", "du", "que"},
    "de": {"der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "im"},
}


def add_text_hash(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append ``h1``/``h2`` — two seed-initialized 64-bit text hashes
    computed in one C memory pass (the exact-dedup 128-bit key;
    collision odds ~n^2/2^129)."""
    texts = batch.column(col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    h1, h2 = tx.hash_utf8_pair(texts, seed1=0, seed2=1)
    null = pc.is_null(texts).to_numpy(zero_copy_only=False)
    return batch.append_column(
        "h1", pa.array(h1.view(np.int64), pa.int64(), mask=null)
    ).append_column("h2", pa.array(h2.view(np.int64), pa.int64(), mask=null))


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

    Profiles are built once per actor (``__init__``); scoring is fully
    vectorized: one tokenization pass, one ``is_in`` membership per
    language over the flat tokens, segmented per-row counts, then an
    argmax with the first-language-wins tie rule (matching the round-1
    scan order en/es/fr/de).  zh detection is a CJK codepoint regex.
    Deterministic stand-in for a real langid model (which would load in
    ``__init__`` the same way).
    """

    _LANGS = ("en", "es", "fr", "de")

    def __init__(self):
        self.value_sets = {
            lang: pa.array(sorted(_STOPWORDS[lang]), pa.string())
            for lang in self._LANGS
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n = len(texts)
        flat, offs = tx.tokens(texts, lower=True, alpha_only=True)
        scores = np.zeros((len(self._LANGS), n), dtype=np.int64)
        for li, lang in enumerate(self._LANGS):
            member = pc.is_in(flat, value_set=self.value_sets[lang])
            m = pc.fill_null(member, False).to_numpy(zero_copy_only=False)
            scores[li] = tx.segment_sum_u64(m.astype(np.int64), offs).astype(
                np.int64
            )
        best = scores.argmax(axis=0)  # first max wins == scan order
        best_score = scores.max(axis=0)
        preds = np.array(self._LANGS, dtype=object)[best]
        preds[best_score == 0] = "und"
        cjk = pc.fill_null(
            pc.match_substring_regex(texts, r"[一-鿿]"), False
        ).to_numpy(zero_copy_only=False)
        preds[cjk] = "zh"
        null = pc.is_null(texts).to_numpy(zero_copy_only=False)
        preds[null] = None
        return batch.append_column("lang_pred", pa.array(preds, pa.string()))


from functools import lru_cache


@lru_cache(maxsize=1)
def _default_langid() -> "LangId":
    return LangId()


def langid_batch(batch: pa.Table) -> pa.Table:
    """Stateless task wrapper (profiles process-cached): the heuristic's
    init is two tiny dicts, so an actor pool's cold start would dominate
    — the class form above remains for genuinely expensive models."""
    return _default_langid()(batch)


def rolling_fingerprint(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append ``fingerprint``: order-sensitive polynomial rolling hash
    over whitespace-token hashes (Horner, mod 2^64; vectorized)."""
    t = batch.column(col)
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    th, offs = tx.token_hashes(t)
    fp = tx.rolling_fingerprints(th, offs)
    null = pc.is_null(t).to_numpy(zero_copy_only=False)
    return batch.append_column(
        "fingerprint", pa.array(fp.view(np.int64), pa.int64(), mask=null)
    )
