"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes (each documented with its partitioning assumption):

- **exact**: two-seed 64-bit content hash inside ``map_batches`` →
  ``groupby(h1, h2)`` keep-first.  The shuffle moves 16 bytes + id per
  row, never the payload; the hash is one vectorized numpy pass over
  the Arrow buffers (rayslog/kernels/texthash.py).
- **MinHash+LSH**: per-batch shingle→minhash signatures (flat-token
  Horner combine + segmented min) → explode to (band, band_hash,
  doc_id) rows → ``groupby`` on the band key → candidate pairs from
  multi-doc buckets → exact-Jaccard verification.  The only all-to-all
  exchange carries b x 8-byte band keys per doc.  Verification NEVER
  materializes the corpus: candidate doc_ids (rare by construction) are
  collected, only THOSE texts are fetched via a pushed-down ``is_in``
  filter, and the resulting small dict is broadcast once with
  ``ray.put``.  At 100 TB the same two-pass shape holds (candidate set
  << corpus); if candidates outgrow a broadcast, the fallback is the
  bucket hash-join in relational.py keyed on doc_id.
- **SimHash**: 64-bit signature per doc (vectorized token hashing +
  segmented bit votes); near-dup = signatures within Hamming distance
  k, found by the 4-table pigeonhole split (16-bit keys) + groupby.
- **embedding cosine**: see ann.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Min

from rayslog.kernels import texthash as tx
from rayslog.stages.aggregate import tree_aggregate
from rayslog.stages.text import add_text_hash

_MERSENNE = (1 << 61) - 1


# ---------------------------------------------------------------- exact
def dedup_exact(ds, id_col: str = "doc_id"):
    """Keep the min-id row per distinct text.

    Returns just the surviving ``doc_id`` column (the SQL oracle groups
    by ``text`` directly — results must agree regardless of which hash
    keys the distributed plan shuffles on)."""
    hashed = ds.map_batches(
        lambda t: add_text_hash(t).select(["h1", "h2", id_col]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return (
        hashed.groupby(["h1", "h2"])
        .aggregate(Min(id_col, alias_name=id_col))
        .select_columns([id_col])
    )


def dedup_incremental(new_ds, old_ds, id_col: str = "doc_id",
                      parts: int = 64):
    """Incremental exact dedup: survivors of the NEW batch only.

    The daily-ingest shape (the dedup sibling of
    ``ShardedInvertedIndex.append_shard``): the committed corpus is
    already deduplicated, a new drop arrives, and the job must cost
    O(new + old-keys), never re-deduping the corpus.  A survivor is a
    new row that is (a) first-of-its-text within the batch (min id per
    128-bit content hash, exactly ``dedup_exact``, resolved with the
    keep-first kernel inside a bounded-parts ``task_exchange`` — no
    sort-shuffle) and (b) absent from the committed corpus — a
    distributed ANTI hash join where BOTH sides ship one 8-byte mixed
    key + id per row, never the payload.  The anti join keys on the
    64-bit mix of the two hash seeds (the collision-acceptance class
    of doc_freq: ~n²/2⁶⁵ across old x new); within-drop keep-first
    stays 128-bit.
    """
    from rayslog.stages.aggregate import task_exchange
    from rayslog.stages.relational import hash_join

    def keyed(t: pa.Table) -> pa.Table:
        out = add_text_hash(t)
        h1 = out.column("h1").to_numpy(zero_copy_only=False).view(np.uint64)
        h2 = out.column("h2").to_numpy(zero_copy_only=False).view(np.uint64)
        hk = (h1 * np.uint64(0x9E3779B97F4A7C15)) ^ h2
        return out.select(["h1", "h2", id_col]).append_column(
            "hk", pa.array(hk.view(np.int64))
        )

    def keyed_with_part(t: pa.Table) -> pa.Table:
        out = keyed(t)
        hk = out.column("hk").to_numpy(zero_copy_only=False).view(np.uint64)
        return out.append_column(
            "hpart", pa.array((hk % np.uint64(parts)).astype(np.int32))
        )

    _empty_surv = pa.table(
        {"hk": pa.array([], pa.int64()), id_col: pa.array([], pa.int64())}
    )

    def keep_first(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty_surv
        h1 = t.column("h1").to_numpy(zero_copy_only=False)
        h2 = t.column("h2").to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h2, h1))
        h1s, h2s = h1[order], h2[order]
        first = np.r_[True, (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])]
        sel = np.asarray(order)[first]
        return t.take(pa.array(sel)).select(["hk", id_col])

    new_keyed = new_ds.map_batches(
        keyed_with_part, batch_format="pyarrow", zero_copy_batch=True
    )
    # the keep-first exchange emits refs; the anti join consumes them
    # directly (left side spins no second executor)
    surv_refs = task_exchange(
        new_keyed, "hpart", parts, keep_first, return_refs=True
    )
    old_keys = old_ds.map_batches(
        lambda t: keyed(t).select(["hk"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return hash_join(
        surv_refs, old_keys, key="hk", how="anti"
    ).select_columns([id_col])


def dedup_exact_keep_rows(ds, id_col: str = "doc_id",
                          text_col: str = "text",
                          keep_cols: list[str] | None = None,
                          parts: int = 64):
    """Exact dedup that RETURNS THE SURVIVING ROWS (min id per distinct
    text) with ``keep_cols`` attached — one hash-partitioned exchange
    instead of dedup_exact's aggregate + join-back (half the all-to-all
    cost when downstream needs row attributes).  The exchange carries
    16-byte hash keys + id + keep_cols per row, never the text, and
    runs as the raw-task ``task_exchange`` (no sort-shuffle machinery);
    groups are bounded (h1 % parts) slices with vectorized run
    detection."""
    from rayslog.stages.aggregate import task_exchange

    keep_cols = list(keep_cols or [])

    def hashed(t: pa.Table) -> pa.Table:
        out = add_text_hash(t, col=text_col)
        h1 = out.column("h1").to_numpy(zero_copy_only=False)
        part = (h1.view(np.uint64) % np.uint64(parts)).astype(np.int32)
        return out.select(["h1", "h2", id_col] + keep_cols).append_column(
            "hpart", pa.array(part)
        )

    def keep_first(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return t.select([id_col] + keep_cols)
        h1 = t.column("h1").to_numpy(zero_copy_only=False)
        h2 = t.column("h2").to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h2, h1))
        h1s, h2s = h1[order], h2[order]
        first = np.r_[True, (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])]
        sel = np.asarray(order)[first]
        return t.take(pa.array(sel)).select([id_col] + keep_cols)

    hashed_ds = ds.map_batches(
        hashed, batch_format="pyarrow", zero_copy_batch=True
    )
    return task_exchange(hashed_ds, "hpart", parts, keep_first)


# ------------------------------------------------------------- shingles
def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Sorted unique 64-bit k-token shingle hashes of one text (the
    exact-Jaccard verify kernel; same hash family as the batch path)."""
    arr = pa.array([text], pa.string())
    th, offs = tx.token_hashes(arr)
    sh, _ = tx.shingle_hashes_flat(th, offs, k)
    return np.unique(sh)


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    """Exact k-token-shingle Jaccard similarity (the verify kernel)."""
    sa, sb = _shingle_hashes(a, k), _shingle_hashes(b, k)
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0


# -------------------------------------------------------- MinHash + LSH
class MinHasher:
    """Actor-pool signature stage: permutation params built once; the
    per-batch path is tokenize → shingle → (a*sh+b) mod M → segmented
    min, all numpy over the flat layout (no per-row Python)."""

    def __init__(self, num_hashes: int = 128, k: int = 3, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_hashes, dtype=np.uint64) | 1
        self.b = rng.integers(0, _MERSENNE, num_hashes, dtype=np.uint64)
        self.k = k
        self.num_hashes = num_hashes

    def signature(self, text: str) -> np.ndarray:
        """Single-text helper (tests); same kernels as the batch path."""
        arr = pa.array([text], pa.string())
        th, offs = tx.token_hashes(arr)
        sh, sh_offs = tx.shingle_hashes_flat(th, offs, self.k)
        return tx.minhash_signatures(sh, sh_offs, self.a, self.b)[0]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        th, offs = tx.token_hashes(texts)
        sh, sh_offs = tx.shingle_hashes_flat(th, offs, self.k)
        sigs = tx.minhash_signatures(sh, sh_offs, self.a, self.b)
        n = len(texts)
        flat = pa.array(sigs.reshape(-1), pa.uint64())
        sig_list = pa.LargeListArray.from_arrays(
            np.arange(n + 1, dtype=np.int64) * self.num_hashes, flat
        ).cast(pa.list_(pa.uint64()))
        return batch.append_column("minhash", sig_list)


from functools import lru_cache


@lru_cache(maxsize=4)
def _default_minhasher() -> "MinHasher":
    return MinHasher()


def _minhash_batch(batch: pa.Table) -> pa.Table:
    return _default_minhasher()(batch)


def _band_rows(batch: pa.Table, bands: int, rows_per_band: int) -> pa.Table:
    """Explode signatures to (band, band_hash, doc_id) rows."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    sig_col = batch.column("minhash")
    if isinstance(sig_col, pa.ChunkedArray):
        sig_col = sig_col.combine_chunks()
    n = len(ids)
    if n == 0:
        return pa.table(
            {
                "band": pa.array([], pa.int32()),
                "band_hash": pa.array([], pa.uint64()),
                "doc_id": pa.array([], pa.int64()),
            }
        )
    sigs = np.asarray(sig_col.values.to_numpy(zero_copy_only=False)).reshape(
        n, bands * rows_per_band
    )
    grouped = sigs.reshape(n, bands, rows_per_band)
    # mix the band rows into one 64-bit band key
    bh = np.zeros((n, bands), dtype=np.uint64)
    for r in range(rows_per_band):
        bh ^= grouped[:, :, r] * np.uint64(0x9E3779B97F4A7C15 + 2 * r + 1)
    band_idx = np.tile(np.arange(bands, dtype=np.int32), n)
    return pa.table(
        {
            "band": pa.array(band_idx),
            "band_hash": pa.array(bh.reshape(-1)),
            "doc_id": pa.array(np.repeat(ids, bands).astype(np.int64)),
        }
    )


def minhash_candidates(ds, bands: int = 32, rows_per_band: int = 4,
                       bucket_parts: int = 64, dedupe: bool = True,
                       max_bucket: int = 256, on_oversize: str = "raise"):
    """(doc_a, doc_b) candidate pairs from LSH band buckets.

    ``dedupe=False`` skips the cross-band pair-dedupe shuffle and
    returns raw per-band pairs (each true pair appears <= bands times);
    callers that collect candidates anyway dedupe for free.  The raw
    output then ALSO carries one sentinel row (doc_a=-1,
    doc_b=bucket_size) per skipped oversized bucket — callers must
    handle them (minhash_near_dups raises).

    ``max_bucket`` is the standard LSH stop-bucket cap: a bucket with
    more than this many docs would expand to O(m^2) pairs — on
    template-heavy corpora (near-identical log lines) that is quadratic
    blowup, and such groups are better handled by EXACT dedup first
    (identical texts have identical signatures, so they all land in one
    bucket).  Because pair-completeness is part of this operator's
    CONTRACT (q_dedup_minhash is oracle-checked against exact all-pairs
    Jaccard with no cap), skipping is never silent: with
    ``on_oversize="raise"`` (default) any oversized bucket fails the
    query loudly, naming the count and the fix (compose ``dedup_exact``
    first, or use ``minhash_dedup_survivors`` which needs no pair
    enumeration); ``on_oversize="skip"`` drops them but the dedupe=False
    raw stream still exposes the sentinel rows for callers to count.

    Grouping by the raw (band, band_hash) key would make one map_groups
    call per BUCKET — almost all singletons, each paying ~0.4ms of
    per-group machinery (measured: 59s for 160k buckets at sf0.1).
    Instead band rows exchange on mix(band, band_hash) % bucket_parts
    through the raw-task ``task_exchange`` (no sort-shuffle machinery)
    into bounded parts, each holding MANY buckets, with run detection
    (on the (band, band_hash) pair — parts mix bands) + pair expansion
    vectorized inside the part.  Partitioning assumption: one part ~
    bands x n_docs / bucket_parts rows of 20 bytes — tune bucket_parts
    up at scale.  The cross-band pair dedupe is a distinct through the
    combiner tree (re-applicable), not a second shuffle.
    """
    from rayslog.stages.aggregate import task_exchange, tree_reduce

    # batch cap bounds the (hash_chunk x batch_shingles) temporary in
    # minhash_signatures (whole-block batches of 100k docs would build
    # multi-GB intermediates).  Stateless task (not an actor pool): the
    # permutation params are cheap and process-cached, and long-lived
    # default workers skip the pool's cold start (same reasoning as the
    # enrich stage).
    sigs = ds.map_batches(
        _minhash_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=2_048,
    )

    def banded_with_part(t: pa.Table) -> pa.Table:
        b = _band_rows(t, bands, rows_per_band)
        bh = b.column("band_hash").to_numpy(zero_copy_only=False)
        band = b.column("band").to_numpy(zero_copy_only=False)
        mixed = bh ^ (
            (band.astype(np.uint64) + np.uint64(1))
            * np.uint64(0x9E3779B97F4A7C15)
        )
        part = (mixed % np.uint64(bucket_parts)).astype(np.int32)
        return b.append_column("bpart", pa.array(part))

    banded = sigs.map_batches(
        banded_with_part, batch_format="pyarrow", zero_copy_batch=True
    )

    _empty_pairs = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
        }
    )

    def part_pairs(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty_pairs
        bh = (
            t.column("band_hash")
            .to_numpy(zero_copy_only=False)
            .astype(np.uint64)
        )
        band = t.column("band").to_numpy(zero_copy_only=False)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, bh, band))
        band, bh, ids = band[order], bh[order], ids[order]
        # a bucket is a (band, band_hash) run — parts mix bands, so the
        # run boundary must test BOTH keys
        new = np.r_[True, (bh[1:] != bh[:-1]) | (band[1:] != band[:-1])]
        run_id = np.cumsum(new) - 1
        counts = np.bincount(run_id)
        out_a: list = []
        out_b: list = []
        run_starts = np.r_[0, np.cumsum(counts)[:-1]]
        for r in np.nonzero(counts > 1)[0]:  # multi-doc buckets are rare
            s = run_starts[r]
            u = np.unique(ids[s : s + counts[r]])
            if len(u) < 2:
                continue
            if len(u) > max_bucket:  # stop-bucket cap — NEVER silent
                # sentinel row: doc_a=-1, doc_b=bucket size
                out_a.append(np.array([-1], dtype="int64"))
                out_b.append(np.array([len(u)], dtype="int64"))
                continue
            a, b = np.triu_indices(len(u), k=1)
            out_a.append(u[a])
            out_b.append(u[b])
        if not out_a:
            return _empty_pairs
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(out_a).astype("int64")),
                "doc_b": pa.array(np.concatenate(out_b).astype("int64")),
            }
        )

    pair_refs = task_exchange(
        banded, "bpart", bucket_parts, part_pairs, return_refs=True
    )
    if not dedupe:
        import ray.data as rd

        return rd.from_arrow_refs(pair_refs)  # sentinels (doc_a=-1) included

    def check_sentinels(t: pa.Table) -> pa.Table:
        neg = pc.equal(t.column("doc_a"), -1)
        n_over = pc.sum(pc.cast(neg, pa.int64())).as_py() or 0
        if n_over:
            if on_oversize == "raise":
                raise ValueError(_oversize_msg(n_over, max_bucket))
            import logging

            logging.getLogger("rayslog.dedup").warning(
                _oversize_msg(n_over, max_bucket)
            )
        return t.filter(pc.invert(neg))

    # dedupe pairs found in multiple bands: distinct is re-applicable,
    # so it runs through the REF-LEVEL combiner tree straight over the
    # exchange's output refs (no extra executor; the sentinel check
    # rides the first combine round — idempotent, raises loudly)
    def distinct_pairs(t: pa.Table) -> pa.Table:
        return check_sentinels(t).group_by(["doc_a", "doc_b"]).aggregate([])

    import ray.data as rd

    from rayslog.stages.aggregate import tree_reduce_refs

    if not pair_refs:
        return rd.from_arrow(_empty_pairs)
    return rd.from_arrow(tree_reduce_refs(pair_refs, distinct_pairs))


def _oversize_msg(n_over: int, max_bucket: int) -> str:
    return (
        f"minhash LSH: {n_over} bucket(s) exceeded max_bucket="
        f"{max_bucket}; pair enumeration would be incomplete (and "
        "quadratic).  Compose dedup_exact before LSH (identical texts "
        "collapse to one bucket member) or use minhash_dedup_survivors "
        "(no pair enumeration)."
    )


def minhash_dedup_survivors(ds, bands: int = 32, rows_per_band: int = 4,
                            bucket_parts: int = 64,
                            doc_parts: int | None = None):
    """Near-dup DEDUP (survivor selection) — the scale shape for
    template-heavy corpora where pair ENUMERATION explodes (measured:
    180k short log lines -> 4.6M near-dup pairs; 1M -> O(10^8)).

    One-pass LSH dedup: a doc survives iff it is the MINIMUM doc_id in
    EVERY band bucket it occupies; every dropped doc shares a bucket
    (jaccard-similar w.h.p.) with a smaller surviving-or-dropped doc.
    Everything stays linear: bands x 8-byte rows per doc, two raw-task
    exchanges (min-per-bucket, then min-per-doc inside bounded
    doc_id%parts slices), no pair materialization.  (Not a transitive
    closure — the standard single-pass approximation used for corpus
    dedup.)  Returns the surviving doc_ids.
    """
    sigs = ds.map_batches(
        _minhash_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=2_048,
    )

    def banded_with_part(t: pa.Table) -> pa.Table:
        b = _band_rows(t, bands, rows_per_band)
        bh = b.column("band_hash").to_numpy(zero_copy_only=False)
        part = (bh % np.uint64(bucket_parts)).astype(np.int32)
        return b.append_column("bpart", pa.array(part))

    banded = sigs.map_batches(
        banded_with_part, batch_format="pyarrow", zero_copy_batch=True
    )

    _empty_mins = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "bucket_min": pa.array([], pa.int64()),
        }
    )

    def bucket_mins(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty_mins
        bh = (
            t.column("band_hash")
            .to_numpy(zero_copy_only=False)
            .astype(np.uint64)
        )
        band = t.column("band").to_numpy(zero_copy_only=False)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, bh, band))
        band, bh, ids = band[order], bh[order], ids[order]
        # a bucket is a (band, band_hash) run — parts mix bands
        new = np.r_[True, (bh[1:] != bh[:-1]) | (band[1:] != band[:-1])]
        run_id = np.cumsum(new) - 1
        # per-bucket min id broadcast to every row of the bucket
        mins = np.minimum.reduceat(ids, np.nonzero(new)[0])
        return pa.table(
            {
                "doc_id": pa.array(ids.astype("int64")),
                "bucket_min": pa.array(mins[run_id].astype("int64")),
            }
        )

    from rayslog.stages.aggregate import task_exchange

    # bucket-min exchange emits REFS; the doc-min exchange chains on
    # them with the dpart column fused into its split (one executor)
    per_bucket_refs = task_exchange(
        banded, "bpart", bucket_parts, bucket_mins, return_refs=True
    )

    # per-doc min over bucket_mins.  NOT groupby(doc_id).aggregate(Min):
    # Ray's sort-aggregate at ~10^6 groups is pathological (measured:
    # >9 min for 32M rows / 1M keys, where the same-shape map_groups
    # with salted parts takes ~2s) — so reduce inside bounded
    # (doc_id % parts) groups with a vectorized reduceat.
    dparts = doc_parts if doc_parts is not None else max(bucket_parts, 64)

    def add_dpart(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.append_column(
            "dpart", pa.array((d % dparts).astype(np.int32))
        )

    _empty_parents = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "parent": pa.array([], pa.int64()),
        }
    )

    def part_parents(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty_parents
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        bm = t.column("bucket_min").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, bm = ids[order], bm[order]
        new = np.r_[True, ids[1:] != ids[:-1]]
        starts = np.nonzero(new)[0]
        return pa.table(
            {
                "doc_id": pa.array(ids[starts].astype("int64")),
                "parent": pa.array(
                    np.minimum.reduceat(bm, starts).astype("int64")
                ),
            }
        )

    parents = task_exchange(
        per_bucket_refs, "dpart", dparts, part_parents, pre_fn=add_dpart
    )

    def survivors(t: pa.Table) -> pa.Table:
        keep = pc.equal(t.column("parent"), t.column("doc_id"))
        return t.filter(keep).select(["doc_id"])

    return parents.map_batches(
        survivors, batch_format="pyarrow", zero_copy_batch=True
    )


def fetch_texts_for_ids(ds, ids, id_col: str = "doc_id", text_col: str = "text"):
    """doc_id -> text for a SMALL id set, via a pushed-down ``is_in``
    filter over the streaming dataset — the corpus itself is never
    materialized (only matching rows reach the driver)."""
    id_arr = pa.array(sorted(ids), pa.int64())

    def pick(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column(id_col), value_set=id_arr)).select(
            [id_col, text_col]
        )

    small = ds.map_batches(
        pick, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()  # columnar collection; take_all pays ~1ms/row here
    return dict(zip(small[id_col], small[text_col]))


def tuned_bucket_parts(n_docs: int) -> int:
    """bucket_parts sizing rule: ~50k docs' band rows per (band, part)
    group keeps the vectorized group bodies large while bounding both
    the per-group memory (n_docs/parts x 24 B) and the fixed ~0.4 ms
    map_groups machinery per group (measured; bands x parts groups
    total).  At 5k docs this gives 8 parts (0.65s vs 1.76s with the old
    flat 64); at 10^9 docs, 4096 parts x 32 bands = 131k groups of
    ~250k band rows each."""
    return max(8, min(4096, -(-n_docs // 50_000)))


def minhash_near_dups(ds, threshold: float = 0.7, bands: int = 32,
                      rows_per_band: int = 4, k: int = 3,
                      max_bucket: int = 256, bucket_parts: int = 64):
    """Full near-dup pipeline: LSH candidates → exact-Jaccard verify.

    Two-pass verify (no corpus materialization): (1) raw per-band pairs
    are collected and deduped on the driver (tiny by LSH construction,
    and the collection already implies they fit — skipping the
    cross-band dedupe SHUFFLE saves one of the three all-to-alls);
    (2) only candidate ids' texts are fetched with a filter pushdown,
    their shingle sets computed ONCE per doc, and that dict broadcast
    via ``ray.put`` — the verify stage intersects precomputed sets, it
    never re-shingles per pair.  Any oversized LSH bucket raises (pair
    completeness is this operator's contract; see minhash_candidates).
    Returns a Dataset of (doc_a, doc_b, jaccard).
    """
    import ray
    import ray.data as rd

    # to_pandas, NOT take_all: row-wise collection pays ~1ms/row on
    # this host (per-row dict churn); the columnar pull is instant
    raw = minhash_candidates(
        ds, bands, rows_per_band, bucket_parts=bucket_parts,
        dedupe=False, max_bucket=max_bucket,
    ).to_pandas()
    n_over = int((raw["doc_a"] == -1).sum())
    if n_over:
        raise ValueError(_oversize_msg(n_over, max_bucket))
    dedup_df = raw.drop_duplicates(["doc_a", "doc_b"]).sort_values(
        ["doc_a", "doc_b"]
    )
    pairs = list(zip(dedup_df["doc_a"], dedup_df["doc_b"]))
    cand_ids = set(dedup_df["doc_a"]) | set(dedup_df["doc_b"])
    texts = fetch_texts_for_ids(ds, cand_ids) if cand_ids else {}
    # shingle each candidate doc ONCE (candidates are tiny by LSH
    # construction), broadcast the sets, not the texts
    shingles = {i: _shingle_hashes(t or "", k) for i, t in texts.items()}
    sh_ref = ray.put(shingles)
    cands = rd.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([a for a, _ in pairs], pa.int64()),
                "doc_b": pa.array([b for _, b in pairs], pa.int64()),
            }
        )
    )

    def verify(batch: pa.Table) -> pa.Table:
        sh = ray.get(sh_ref)  # zero-copy plasma read, tiny dict
        aa = batch.column("doc_a").to_pylist()
        bb = batch.column("doc_b").to_pylist()
        jac = []
        for a, b in zip(aa, bb):
            sa, sb = sh[a], sh[b]
            if len(sa) == 0 and len(sb) == 0:
                jac.append(1.0)
                continue
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            jac.append(round(inter / union if union else 0.0, 6))
        out = batch.append_column("jaccard", pa.array(jac, pa.float64()))
        return out.filter(pc.greater_equal(out.column("jaccard"), threshold))

    return cands.map_batches(
        verify, batch_format="pyarrow", zero_copy_batch=True
    )


# -------------------------------------------------------------- SimHash
class SimHasher:
    """64-bit SimHash per document (token-frequency weighted), fully
    vectorized: flat token hashes + segmented bit votes per batch."""

    def simhash(self, text: str) -> int:
        arr = pa.array([text], pa.string())
        th, offs = tx.token_hashes(arr)
        return int(tx.simhash_signatures(th, offs)[0])

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        th, offs = tx.token_hashes(texts)
        sigs = tx.simhash_signatures(th, offs)
        return batch.append_column(
            "simhash", pa.array(sigs.view(np.int64), pa.int64())
        )


def _simhash_batch(batch: pa.Table) -> pa.Table:
    return SimHasher()(batch)


def simhash_dataset(ds):
    # batch cap bounds the (tokens x 64) vote matrix per batch;
    # stateless task (SimHasher holds no state worth an actor pool)
    return ds.map_batches(
        _simhash_batch, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=4_096,
    )


def simhash_near_dups(ds, max_hamming: int = 3, key_parts: int = 64):
    """Pairs of docs whose SimHashes differ in <= max_hamming bits.

    Pigeonhole: split the 64-bit signature into 4 16-bit keys; any pair
    within distance 3 shares at least one key.  The shuffle groups by
    (table, key % key_parts) — bounded group count with many keys per
    group (one group per raw key would pay ~0.4ms of map_groups
    machinery per mostly-singleton bucket) — then key-run detection and
    Hamming verification are vectorized inside the group.  Partitioning
    assumption: per-key bucket sizes stay small (true unless the corpus
    is one template).
    """
    _empty_simhash_pairs = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "hamming": pa.array([], pa.int64()),
        }
    )

    sigs = simhash_dataset(ds).select_columns(["doc_id", "simhash"])

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        s = t.column("simhash").to_numpy(zero_copy_only=False).view(np.uint64)
        parts = []
        for p in range(4):
            key = ((s >> np.uint64(16 * p)) & np.uint64(0xFFFF)).astype(np.int64)
            parts.append(
                pa.table(
                    {
                        # fused (pigeonhole-table, key%parts) exchange id
                        "xpart": pa.array(
                            (p * key_parts + key % key_parts).astype(
                                np.int32
                            )
                        ),
                        "key": pa.array(key),
                        "doc_id": pa.array(ids.astype(np.int64)),
                        "simhash": pa.array(s.view(np.int64)),
                    }
                )
            )
        return pa.concat_tables(parts)

    exploded = sigs.map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )

    def part_verify(g: pa.Table) -> pa.Table:
        key = g.column("key").to_numpy(zero_copy_only=False)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        s = g.column("simhash").to_numpy(zero_copy_only=False).view(
            np.uint64
        )
        if not len(key):
            return _empty_simhash_pairs
        order = np.lexsort((ids, key))
        key, ids, s = key[order], ids[order], s[order]
        new = np.r_[True, key[1:] != key[:-1]]
        run_id = np.cumsum(new) - 1
        counts = np.bincount(run_id)
        run_starts = np.r_[0, np.cumsum(counts)[:-1]]
        out_a: list = []
        out_b: list = []
        out_h: list = []
        for r in np.nonzero(counts > 1)[0]:  # multi-doc keys are rare
            sl = slice(run_starts[r], run_starts[r] + counts[r])
            u, first = np.unique(ids[sl], return_index=True)
            if len(u) < 2:
                continue
            su = s[sl][first]
            a, b = np.triu_indices(len(u), k=1)
            x = su[a] ^ su[b]
            bytes_ = x.view(np.uint8).reshape(len(x), 8)
            ham = np.unpackbits(bytes_, axis=1).sum(axis=1).astype(np.int64)
            keep = ham <= max_hamming
            out_a.append(u[a][keep])
            out_b.append(u[b][keep])
            out_h.append(ham[keep])
        if not out_a:
            return _empty_simhash_pairs
        return pa.table(
            {
                "doc_a": pa.array(
                    np.concatenate(out_a).astype("int64")
                ),
                "doc_b": pa.array(
                    np.concatenate(out_b).astype("int64")
                ),
                "hamming": pa.array(
                    np.concatenate(out_h).astype("int64")
                ),
            }
        )

    from rayslog.stages.aggregate import task_exchange

    # raw-task hash exchange over the fused (table, key%parts) id —
    # same movement as the old sort-shuffle groupby without its ~1s
    # fixed machinery (the last convertible map_groups site, r5)
    pairs = task_exchange(
        exploded, "xpart", 4 * key_parts, part_verify
    )
    # cross-band dedupe: a pair can surface in up to 4 pigeonhole
    # parts; min-hamming per (doc_a, doc_b).  The pair list is a few
    # hundred rows spread over block-sized partials — the raw-task
    # combiner tree replaces a second ~0.5s sort-shuffle (min is
    # re-applicable, so the same tree as conv_counts' sum applies).
    import ray.data as rd

    empty = lambda: rd.from_arrow(  # noqa: E731
        pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "hamming": pa.array([], pa.int64()),
            }
        )
    )
    return tree_aggregate(
        pairs,
        ["doc_a", "doc_b"],
        [("hamming", "min")],
        ["hamming"],
        empty_fn=empty,
        split_keys=["doc_a", "doc_b"],  # pair domain is unbounded (r5)
    )


def ngram_jaccard_pairs(ds, threshold: float = 0.2, k: int = 3,
                        max_docs: int | None = 200):
    """Exact all-pairs k-token-shingle Jaccard above a threshold.

    Quadratic by construction — the BASELINE operator the LSH pipeline
    approximates.  ``max_docs`` caps the candidate universe to the
    SMALLEST doc_ids, and the cap is enforced inside the streaming plan
    (filter on the id threshold found via sort+limit — only ``max_docs``
    rows ever reach the driver, the corpus is never materialized).
    """
    import ray

    base = ds.select_columns(["doc_id", "text"])
    if max_docs is not None:
        # distributed cap: the max_docs smallest ids (sort is the
        # documented wide op; limit() stops the stream after max_docs)
        capped = base.sort("doc_id").limit(max_docs)
    else:
        capped = base
    rows = capped.to_pandas()  # <= max_docs rows by construction
    shingles = {
        int(i): _shingle_hashes(t or "", k)
        for i, t in zip(rows["doc_id"], rows["text"])
    }
    ref = ray.put(shingles)

    class PairJaccard:
        def __init__(self):
            self.sh = ray.get(ref)
            self.ids = sorted(self.sh)

        def __call__(self, batch: pa.Table) -> pa.Table:
            out_a, out_b, out_j = [], [], []
            for a in batch.column("doc_id").to_pylist():
                if a not in self.sh:
                    continue
                sa = self.sh[a]
                for b in self.ids:
                    if b <= a:
                        continue
                    sb = self.sh[b]
                    if len(sa) == 0 and len(sb) == 0:
                        j = 1.0
                    else:
                        inter = len(
                            np.intersect1d(sa, sb, assume_unique=True)
                        )
                        union = len(sa) + len(sb) - inter
                        j = inter / union if union else 0.0
                    if j >= threshold:
                        out_a.append(a)
                        out_b.append(b)
                        out_j.append(round(j, 6))
            return pa.table(
                {
                    "doc_a": pa.array(out_a, pa.int64()),
                    "doc_b": pa.array(out_b, pa.int64()),
                    "jaccard": pa.array(out_j, pa.float64()),
                }
            )

    return base.map_batches(
        PairJaccard, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=(1, 8),
    )
