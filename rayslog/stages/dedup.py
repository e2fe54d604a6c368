"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes (each documented with its partitioning assumption):

- **exact**: content-hash column inside ``map_batches`` →
  ``groupby(text_hash)`` keep-first.  The shuffle moves one short hash +
  id per row, never the payload.
- **MinHash+LSH**: per-batch shingle→minhash signatures (numpy,
  multiply-shift hashing) → explode to (band, band_hash, doc_id) rows →
  ``groupby`` on the band key → candidate pairs from multi-doc buckets →
  exact n-gram-Jaccard verification.  The only all-to-all exchange
  carries b x 8-byte band keys per doc.  Verification joins the two
  texts by hash-bucketed doc_id; in this sandbox the doc side is small
  enough to broadcast (``ray.put``), which is also the 100 TB plan for
  the candidate set (candidates are rare), while the full-corpus join
  path is the bucket join in the guide.
- **SimHash**: 64-bit signature per doc (vectorized token hashing);
  near-dup = signatures within Hamming distance k, found by the 4-table
  pigeonhole split (16-bit keys) + groupby.
- **embedding cosine**: per-batch float64 matmul against a broadcast
  (ray.put) normalized matrix; at 100 TB the broadcast side becomes an
  IVF/LSH-bucketed index (see ann.py).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Min

from rayslog.stages.text import add_text_hash

_MERSENNE = (1 << 61) - 1
_TOKEN_RE = re.compile(r"\S+")


# ---------------------------------------------------------------- exact
def dedup_exact(ds, id_col: str = "doc_id"):
    """Keep the min-id row per distinct text: (text_hash, doc_id)."""
    hashed = ds.map_batches(
        lambda t: add_text_hash(t).select(["text_hash", id_col]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return hashed.groupby("text_hash").aggregate(Min(id_col, alias_name=id_col))


# ------------------------------------------------------------- shingles
def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """64-bit hashes of the k-token shingles of ``text``."""
    toks = _TOKEN_RE.findall(text.lower())
    if len(toks) < k:
        shingles = [" ".join(toks)] if toks else []
    else:
        shingles = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    if not shingles:
        return np.zeros(0, dtype=np.uint64)
    return np.unique(
        np.array(
            [
                int.from_bytes(
                    hashlib.blake2b(s.encode(), digest_size=8).digest(), "little"
                )
                for s in shingles
            ],
            dtype=np.uint64,
        )
    )


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
    """Actor-pool signature stage: permutation params built once."""

    def __init__(self, num_hashes: int = 128, k: int = 3, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_hashes, dtype=np.uint64) | 1
        self.b = rng.integers(0, _MERSENNE, num_hashes, dtype=np.uint64)
        self.k = k
        self.num_hashes = num_hashes

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        if len(sh) == 0:
            return np.zeros(self.num_hashes, dtype=np.uint64)
        # multiply-shift universal hashing, min over shingles
        v = (sh[None, :] * self.a[:, None] + self.b[:, None]) % _MERSENNE
        return v.min(axis=1).astype(np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        sigs = np.stack(
            [self.signature(t or "") for t in texts]
        ) if texts else np.zeros((0, self.num_hashes), np.uint64)
        return batch.append_column(
            "minhash", pa.array(list(sigs), pa.list_(pa.uint64()))
        )


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


def minhash_candidates(ds, bands: int = 16, rows_per_band: int = 8):
    """(doc_a, doc_b) candidate pairs from LSH band buckets."""
    import pandas as pd

    sigs = ds.map_batches(
        MinHasher,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )
    banded = sigs.map_batches(
        lambda t: _band_rows(t, bands, rows_per_band),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype="int64"),
                 "doc_b": pd.Series([], dtype="int64")}
            )
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame(
            {"doc_a": ids[a].astype("int64"), "doc_b": ids[b].astype("int64")}
        )

    pairs = banded.groupby(["band", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    # dedupe pairs found in multiple bands
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Min("doc_a", alias_name="_a")
    ).drop_columns(["_a"])


def minhash_near_dups(ds, threshold: float = 0.7, bands: int = 16,
                      rows_per_band: int = 8, k: int = 3):
    """Full near-dup pipeline: LSH candidates → exact-Jaccard verify.

    The verify side broadcasts doc_id→text once via ``ray.put`` (small
    candidate universe); the verified pairs carry the exact n-gram
    Jaccard.  Returns a Dataset of (doc_a, doc_b, jaccard).
    """
    import ray

    texts = {
        r["doc_id"]: r["text"]
        for r in ds.select_columns(["doc_id", "text"]).take_all()
    }
    texts_ref = ray.put(texts)
    cands = minhash_candidates(ds, bands, rows_per_band)

    class Verify:
        def __init__(self):
            self.texts = ray.get(texts_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            aa = batch.column("doc_a").to_pylist()
            bb = batch.column("doc_b").to_pylist()
            jac = [
                round(ngram_jaccard(self.texts[a], self.texts[b], k), 6)
                for a, b in zip(aa, bb)
            ]
            out = batch.append_column("jaccard", pa.array(jac, pa.float64()))
            return out.filter(
                pc.greater_equal(out.column("jaccard"), threshold)
            )

    return cands.map_batches(
        Verify, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=(1, 4),
    )


# -------------------------------------------------------------- SimHash
class SimHasher:
    """64-bit SimHash per document (token-frequency weighted)."""

    def __init__(self):
        self.token_re = _TOKEN_RE

    def simhash(self, text: str) -> int:
        toks = self.token_re.findall(text.lower())
        if not toks:
            return 0
        hs = np.array(
            [
                int.from_bytes(
                    hashlib.blake2b(t.encode(), digest_size=8).digest(), "little"
                )
                for t in toks
            ],
            dtype=np.uint64,
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1)
        votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        sig = np.uint64(0)
        for i in np.nonzero(votes > 0)[0]:
            sig |= np.uint64(1) << np.uint64(i)
        return int(sig)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.simhash(t or "") for t in batch.column("text").to_pylist()]
        return batch.append_column(
            "simhash",
            pa.array(np.array(sigs, dtype=np.uint64).view(np.int64), pa.int64()),
        )


def simhash_dataset(ds):
    return ds.map_batches(
        SimHasher, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=(1, 8),
    )


def simhash_near_dups(ds, max_hamming: int = 3):
    """Pairs of docs whose SimHashes differ in <= max_hamming bits.

    Pigeonhole: split the 64-bit signature into 4 16-bit keys; any pair
    within distance 3 shares at least one key → groupby each key table,
    verify Hamming inside buckets.  Partitioning assumption: bucket
    sizes stay small (true unless the corpus is one template).
    """
    import pandas as pd

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
                        "part": pa.array(np.full(len(ids), p, dtype=np.int32)),
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

    def bucket_verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype="int64"),
                 "doc_b": pd.Series([], dtype="int64"),
                 "hamming": pd.Series([], dtype="int64")}
            )
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        s = g["simhash"].to_numpy().view(np.uint64)
        a, b = np.triu_indices(len(ids), k=1)
        x = s[a] ^ s[b]
        ham = np.array([bin(int(v)).count("1") for v in x])
        keep = ham <= max_hamming
        return pd.DataFrame(
            {"doc_a": ids[a][keep], "doc_b": ids[b][keep], "hamming": ham[keep]}
        )

    pairs = exploded.groupby(["part", "key"]).map_groups(
        bucket_verify, batch_format="pandas"
    )
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Min("hamming", alias_name="hamming")
    )


def ngram_jaccard_pairs(ds, threshold: float = 0.2, k: int = 3,
                        max_docs: int | None = 200):
    """Exact all-pairs k-token-shingle Jaccard above a threshold.

    Quadratic by construction — the BASELINE operator the LSH pipeline
    approximates.  ``max_docs`` caps the candidate universe (smallest
    doc_ids) so the exact computation stays tractable; one side is
    broadcast, the other streams in batches.
    """
    import ray

    base = ds.select_columns(["doc_id", "text"])
    rows = base.to_pandas()
    rows = rows.sort_values("doc_id")
    if max_docs is not None:
        rows = rows.head(max_docs)
    keep_ids = set(rows["doc_id"].tolist())
    shingles = {
        int(r.doc_id): _shingle_hashes(r.text or "", k)
        for r in rows.itertuples()
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
