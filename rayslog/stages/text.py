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


def _segmented_distinct_counts(listarr) -> tuple[np.ndarray, np.ndarray]:
    """(total, distinct) element counts per list row, via 128-bit
    element hashes + one lexsort — no per-row Python.  Null rows get
    (0, 0); mask them downstream."""
    if isinstance(listarr, pa.ChunkedArray):
        listarr = listarr.combine_chunks()
    counts = (
        pc.fill_null(pc.list_value_length(listarr), 0)
        .cast(pa.int64())
        .to_numpy(zero_copy_only=False)
    )
    flat = listarr.flatten()
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    if len(flat) == 0:
        return counts, counts.copy()
    h1, h2 = tx.hash_utf8_pair(flat, seed1=0, seed2=1)
    seg = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    order = np.lexsort((h2, h1, seg))
    s, a, b = seg[order], h1[order], h2[order]
    new = np.r_[True, (s[1:] != s[:-1]) | (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
    distinct = np.bincount(s[new], minlength=len(counts)).astype(np.int64)
    return counts, distinct


_BIGRAM_BASE = np.uint64(0x100000001B3)


def repetition_features(batch: pa.Table, col: str = "text") -> pa.Table:
    """Gopher/C4-style repetition metrics, appended per document:

    - ``n_lines`` / ``dup_line_frac``: line count (split on ``\\n``) and
      the fraction of lines that are repeats of an earlier line
      ((n_lines - distinct_lines) / max(n_lines, 1)),
    - ``n_paras`` / ``dup_para_frac``: same over ``\\n\\n`` paragraphs,
    - ``top_bigram_share``: occurrences of the most frequent
      whitespace-token bigram / total bigrams (0.0 when < 2 tokens).

    Everything is vectorized: Arrow split kernels, 128-bit element
    hashes + one lexsort for distinct counts, token-hash pairs + run
    detection for the bigram mode.  IEEE division of exact integer
    counts matches the DuckDB oracle bit-for-bit.
    """
    t = batch.column(col)
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    n = len(t)
    null = pc.is_null(t).to_numpy(zero_copy_only=False)

    n_lines, d_lines = _segmented_distinct_counts(pc.split_pattern(t, "\n"))
    n_paras, d_paras = _segmented_distinct_counts(pc.split_pattern(t, "\n\n"))
    dup_line = (n_lines - d_lines) / np.maximum(n_lines, 1)
    dup_para = (n_paras - d_paras) / np.maximum(n_paras, 1)

    # top-bigram share over case-sensitive whitespace tokens.  The SQL
    # oracle extracts \S+ (ASCII RE2); Arrow splits on Unicode
    # whitespace — identical on ASCII corpora (the generated documents
    # are ASCII; non-ASCII whitespace would need split_pattern_regex)
    th, offs = tx.token_hashes(t, lower=False)
    tok_counts = np.diff(offs)
    nbi = np.maximum(tok_counts - 1, 0)
    top_share = np.zeros(n, dtype=np.float64)
    if nbi.sum() > 0:
        # flat bigram hashes: rows with >= 2 tokens contribute
        # (count-1) consecutive-pair hashes
        rows = np.nonzero(nbi)[0]
        reps = nbi[rows]
        bi_offs = np.zeros(len(rows) + 1, dtype=np.int64)
        np.cumsum(reps, out=bi_offs[1:])
        within = (
            np.arange(int(bi_offs[-1]), dtype=np.int64)
            - np.repeat(bi_offs[:-1], reps)
        )
        base_pos = np.repeat(offs[:-1][rows], reps) + within
        bh = tx.fmix64(
            th[base_pos] * _BIGRAM_BASE + th[base_pos + 1]
        )
        seg = np.repeat(rows, reps)
        order = np.lexsort((bh, seg))
        s, b = seg[order], bh[order]
        new = np.r_[True, (s[1:] != s[:-1]) | (b[1:] != b[:-1])]
        starts = np.nonzero(new)[0]
        run_len = np.diff(np.r_[starts, len(s)])
        np.maximum.at(top_share, s[starts], run_len.astype(np.float64))
        top_share[rows] = top_share[rows] / nbi[rows]

    def col_i64(v):
        return pa.array(v.astype(np.int64), pa.int64(), mask=null)

    def col_f64(v):
        return pa.array(v.astype(np.float64), pa.float64(), mask=null)

    return (
        batch.append_column("n_lines", col_i64(n_lines))
        .append_column("dup_line_frac", col_f64(dup_line))
        .append_column("n_paras", col_i64(n_paras))
        .append_column("dup_para_frac", col_f64(dup_para))
        .append_column("top_bigram_share", col_f64(top_share))
    )


def quality_filter(
    ds,
    min_tokens: int = 30,
    max_tokens: int = 90,
    min_alpha_ratio: float = 0.5,
    max_top_bigram_share: float = 0.10,
    col: str = "text",
):
    """Keep documents passing the standard quality gates (Gopher-style
    length window + alphabetic ratio + repetition cap) — the filter
    every curation pipeline composes from the feature stages.  One
    streaming pass; the features are computed per batch and dropped
    after the predicate (only the surviving input columns flow on)."""

    def fn(t: pa.Table) -> pa.Table:
        feats = repetition_features(quality_features(t, col), col)
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(feats.column("n_tokens"), min_tokens),
                pc.less_equal(feats.column("n_tokens"), max_tokens),
            ),
            pc.and_(
                pc.greater_equal(
                    feats.column("alpha_ratio"), min_alpha_ratio
                ),
                pc.less_equal(
                    feats.column("top_bigram_share"), max_top_bigram_share
                ),
            ),
        )
        return t.filter(pc.fill_null(keep, False))

    return ds.map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=8_192
    )


#: IPv4-looking runs (RE2, shared verbatim with the SQL oracle)
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
#: bracketed-pid process tags like "sshd[12345]"
PID_RE = r"\[\d+\]"


def redact_pii(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append ``redacted``: the text with IPv4s -> ``[ip]`` and
    bracketed pids -> ``[pid]`` (the log-scrubbing stage; swap in real
    PII patterns the same way).  Pure RE2 ``replace_substring_regex``
    — identical semantics to the oracle's ``regexp_replace(..., 'g')``."""
    t = batch.column(col)
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    red = pc.replace_substring_regex(t, IPV4_RE, "[ip]")
    red = pc.replace_substring_regex(red, PID_RE, "[pid]")
    return batch.append_column("redacted", red)


def bigram_counts_partial(t: pa.Table, col: str = "text") -> pa.Table:
    """Exact per-batch bigram counts (ngram, n) — the shared partial
    for the exact top_ngrams plan AND the approximate heavy-hitters
    sketch (stages/sketch.py:approx_heavy_hitters)."""
    return _bigram_partial_impl(t, col)


def _exchange_topk_sum(partials, key_col: str, n_col: str, k: int,
                       parts: int = 64):
    """Shared corpus-statistics final: partial (key, n) rows exchange on
    key-hash parts (complete per-key sums inside a part), each part
    reduces to its local top-k, and the combiner tree merges — no
    string-key sort-shuffle, no full-domain range sort.  Deterministic
    (n desc, key asc) order with rank-free output."""
    from rayslog.stages.aggregate import task_exchange, tree_reduce

    def add_part(t: pa.Table) -> pa.Table:
        keys = t.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        h = tx.hash_utf8(keys, seed=0)
        return t.append_column(
            "kpart", pa.array((h % np.uint64(parts)).astype(np.int32))
        )

    _empty = pa.table(
        {
            key_col: pa.array([], pa.string()),
            n_col: pa.array([], pa.int64()),
        }
    )

    def part_topk(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        g = (
            t.group_by([key_col])
            .aggregate([(n_col, "sum")])
            .rename_columns([key_col, n_col])
        )
        return g.sort_by(
            [(n_col, "descending"), (key_col, "ascending")]
        ).slice(0, k)

    def topk_reduce(t: pa.Table) -> pa.Table:
        return t.sort_by(
            [(n_col, "descending"), (key_col, "ascending")]
        ).slice(0, k)

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(_empty)

    local = task_exchange(
        partials.map_batches(
            add_part, batch_format="pyarrow", zero_copy_batch=True
        ),
        "kpart",
        parts,
        part_topk,
    )
    return tree_reduce(local, topk_reduce, empty_fn=empty_fn)


def top_ngrams(ds, k: int = 20, col: str = "text"):
    """Corpus-wide top-k token bigrams: per-batch partial counts (one
    row per distinct bigram per batch) -> key-hash exchange with
    per-part sums + local top-k -> combiner-tree merge, deterministic
    (count desc, ngram asc).  The exchange moves distinct bigram
    partials per batch, never the corpus; the classic corpus-
    statistics shape (same plan scales to n-grams of any order).  At
    extreme ngram cardinality compose with
    sketch.approx_heavy_hitters(bigram_counts_partial) — O(capacity)
    state per node instead of one exchanged row per distinct ngram."""

    def partial(t: pa.Table) -> pa.Table:
        return _bigram_partial_impl(t, col)

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=8_192,
    )
    return _exchange_topk_sum(partials, "ngram", "n", k)


def _bigram_partial_impl(t: pa.Table, col: str = "text") -> pa.Table:
    txt = t.column(col)
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    flat, offs = tx.tokens(txt, lower=False)
    counts = np.diff(offs)
    nbi = np.maximum(counts - 1, 0)
    if nbi.sum() == 0:
        return pa.table(
            {
                "ngram": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
    rows = np.nonzero(nbi)[0]
    reps = nbi[rows]
    bi_offs = np.zeros(len(rows) + 1, dtype=np.int64)
    np.cumsum(reps, out=bi_offs[1:])
    within = (
        np.arange(int(bi_offs[-1]), dtype=np.int64)
        - np.repeat(bi_offs[:-1], reps)
    )
    pos = np.repeat(offs[:-1][rows], reps) + within
    a = flat.take(pa.array(pos))
    b = flat.take(pa.array(pos + 1))
    joined = pc.binary_join_element_wise(a, b, " ")  # sep is last arg
    g = (
        pa.table({"ngram": joined})
        .group_by(["ngram"])
        .aggregate([([], "count_all")])
    )
    return g.rename_columns(["ngram", "n"])


def doc_freq(ds, k: int = 20, col: str = "text", id_col: str = "doc_id"):
    """Top-k tokens by DOCUMENT frequency (distinct docs containing the
    token — the IDF denominator).  Per-batch: per-row distinct tokens
    (one row per (doc, token)) collapse to per-batch df partials; then
    groupby-sum + deterministic top-k.  Distinctness within a doc is
    resolved inside the batch, so the exchange carries df partials, not
    (doc, token) pairs."""

    def partial(t: pa.Table) -> pa.Table:
        txt = t.column(col)
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        flat, offs = tx.tokens(txt, lower=True)
        n = len(offs) - 1
        if len(flat) == 0:
            return pa.table(
                {
                    "token": pa.array([], pa.string()),
                    "df": pa.array([], pa.int64()),
                }
            )
        h = tx.hash_utf8(flat, seed=0)
        seg = np.repeat(
            np.arange(n, dtype=np.int64), np.diff(offs)
        )
        order = np.lexsort((h, seg))
        s, hh = seg[order], h[order]
        first = np.r_[True, (s[1:] != s[:-1]) | (hh[1:] != hh[:-1])]
        idx = np.asarray(order)[first]
        uniq = flat.take(pa.array(idx))
        g = (
            pa.table({"token": uniq})
            .group_by(["token"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["token", "df"])

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=8_192,
    )
    return _exchange_topk_sum(partials, "token", "df", k)


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


def tf_idf_top_terms(ds, n_docs: int, k: int = 3, dparts: int = 64,
                     join_buckets: int | None = None):
    """Top-k salient terms per document by tf x (N/df) — the linear-idf
    variant (no transcendentals, so the score is one IEEE division and
    the SQL oracle matches bit-for-bit).

    The composition is the scale shape for a LARGE vocabulary:

    1. per-batch explode to (doc_id, token, tf) — per-doc term counts
       resolved inside the batch (lexsort run detection, no Python);
    2. the document-frequency table is a partial-combine + groupby-sum
       (one row per distinct token — never the corpus);
    3. term rows join df via the distributed bucket hash join on the
       64-bit token hash (both sides large; no broadcast);
    4. per-doc top-k inside bounded (doc_id % dparts) groups.

    Returns (doc_id, rank, token, score).
    """
    from rayslog.stages.relational import hash_join

    def explode_tf(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        flat, offs = tx.tokens(txt, lower=True)
        if len(flat) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "token": pa.array([], pa.string()),
                    "tok_h": pa.array([], pa.int64()),
                    "tf": pa.array([], pa.int64()),
                }
            )
        h = tx.hash_utf8(flat, seed=0)
        seg = np.repeat(np.arange(len(ids), dtype=np.int64), np.diff(offs))
        order = np.lexsort((h, seg))
        s, hh = seg[order], h[order]
        first = np.r_[True, (s[1:] != s[:-1]) | (hh[1:] != hh[:-1])]
        starts = np.nonzero(first)[0]
        run_len = np.diff(np.r_[starts, len(s)])
        idx = np.asarray(order)[starts]
        return pa.table(
            {
                "doc_id": pa.array(ids[s[starts]].astype(np.int64)),
                "token": flat.take(pa.array(idx)),
                "tok_h": pa.array(hh[starts].view(np.int64)),
                "tf": pa.array(run_len.astype(np.int64)),
            }
        )

    # ONE corpus scan: the exploded term table materializes once and
    # its blocks feed BOTH the document-frequency exchange and the
    # term⨝df join (the old plan scanned the corpus twice — df pass +
    # join-left pass — and paid Ray's sort-shuffle for the df groupby).
    from rayslog.stages.aggregate import live_block_refs, task_exchange

    terms_mat = ds.map_batches(
        explode_tf, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=8_192,
    ).materialize()
    t_refs = live_block_refs(terms_mat)
    if not t_refs:  # keep one (empty) block so schemas flow through
        t_refs = [
            r
            for b in terms_mat.iter_internal_ref_bundles()
            for r, _m in b.blocks
        ][:1]

    # join/df partitioning scales with the corpus (~term rows per
    # bucket stays bounded); override join_buckets for skewed
    # vocabularies
    buckets = join_buckets or max(32, min(4096, n_docs // 20_000))

    def df_pre(t: pa.Table) -> pa.Table:
        g = (
            t.select(["tok_h"])
            .group_by(["tok_h"])
            .aggregate([([], "count_all")])
            .rename_columns(["tok_h", "df"])
        )
        h = (
            g.column("tok_h")
            .to_numpy(zero_copy_only=False)
            .view(np.uint64)
        )
        return g.append_column(
            "tpart", pa.array((h % np.uint64(buckets)).astype(np.int32))
        )

    def df_sum(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["tok_h"])
            .aggregate([("df", "sum")])
            .rename_columns(["tok_h", "df"])
        )

    df_refs = task_exchange(
        t_refs, "tpart", buckets, df_sum, pre_fn=df_pre, return_refs=True
    )
    joined = hash_join(t_refs, df_refs, key="tok_h", buckets=buckets)

    def score(t: pa.Table) -> pa.Table:
        tf = t.column("tf").to_numpy(zero_copy_only=False).astype(np.int64)
        dfv = t.column("df").to_numpy(zero_copy_only=False).astype(np.int64)
        sc = (tf * n_docs).astype(np.float64) / dfv
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "token": t.column("token"),
                "score": pa.array(sc),
                "dpart": pa.array((d % dparts).astype(np.int32)),
            }
        )

    scored = joined.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )

    def topk(t: pa.Table) -> pa.Table:
        import pandas as pd_

        if not t.num_rows:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                    "token": pa.array([], pa.string()),
                    "score": pa.array([], pa.float64()),
                }
            )
        g = t.to_pandas()
        g = g.sort_values(
            ["doc_id", "score", "token"], ascending=[True, False, True]
        )
        g = g.groupby("doc_id", as_index=False).head(k)
        g["rank"] = g.groupby("doc_id").cumcount() + 1
        out = g[["doc_id", "rank", "token", "score"]].astype(
            {"doc_id": "int64", "rank": "int64"}
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    from rayslog.stages.aggregate import task_exchange

    return task_exchange(scored, "dpart", dparts, topk)


def render_rfc3164(batch: pa.Table) -> pa.Table:
    """Append ``rendered``: the canonical RFC3164 line rebuilt from the
    parsed fields — ``<pri>Mon DD HH:MM:SS host tag: content`` (the
    inverse of the reference's Dump; layout 1's zero-padded day).  The
    log-normalization stage: parse -> transform -> render rewrites a
    corpus into canonical form, and parse(render(x)) reproduces x's
    parsed fields exactly (round-trip test).  Tag-less rows render
    without the ``tag: `` segment.  Pure Arrow kernels; strftime runs
    on second-cast timestamps so %S carries no fraction (3164 has
    none)."""
    pri = pc.cast(batch.column("priority"), pa.string())
    ts = pc.strftime(
        batch.column("ts_parsed").cast(pa.timestamp("s")),
        format="%b %d %H:%M:%S",
    )
    host = batch.column("hostname")
    tag = batch.column("tag")
    content = pc.fill_null(batch.column("content"), "")
    has_tag = pc.and_(
        pc.is_valid(tag), pc.not_equal(pc.fill_null(tag, ""), "")
    )
    tail = pc.if_else(
        has_tag,
        pc.binary_join_element_wise(
            pc.fill_null(tag, ""), ": ", content, ""
        ),
        content,
    )
    rendered = pc.binary_join_element_wise(
        "<", pri, ">", ts, " ", host, " ", tail, ""
    )
    return batch.append_column("rendered", rendered)


def normalize_text(t: pa.Table, col: str = "text") -> pa.Table:
    """Canonical text normalization — Unicode NFC, lowercase,
    whitespace-run collapse, edge trim — the cleanup pass run before
    hashing/dedup so byte-level variants of the same content collide.
    Pure Arrow kernels (utf8proc NFC + RE2 replace), verified equal to
    DuckDB's nfc_normalize/lower/regexp_replace on this corpus."""
    norm = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(
            pc.utf8_lower(pc.utf8_normalize(t.column(col), form="NFC")),
            r"\s+",
            " ",
        )
    )
    return t.append_column("norm_text", norm)
