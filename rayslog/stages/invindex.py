"""Persisted inverted text index: token -> posting rows, hive-
partitioned by token-hash bucket, with bucket-pruned lookups.

The search-side sibling of :mod:`rayslog.stages.ann`'s IvfIndex — the
same persisted-pruned-index discipline applied to text:

- **Build = ONE streaming pass, no shuffle.**  Each batch emits its
  per-doc DISTINCT (token, doc_id) postings plus
  ``bucket = hash64(token) % n_buckets`` and
  ``write_parquet(partition_cols=["bucket"])`` lays them down as hive
  ``bucket=K/`` directories; multiple files per bucket compose, so
  blocks never co-locate.  Token distinctness within a doc is resolved
  in-batch (docs never span batches), so the index holds exactly one
  posting per (doc, token) — the DF-ready form.
- **Lookup prunes at the FILE LISTING.**  A query for t tokens hashes
  them to their buckets and a hive ``PathPartitionFilter`` drops every
  other ``bucket=K/`` file before a byte is read; I/O scales with
  t/n_buckets of the corpus postings, not the corpus.  Matching is by
  token STRING inside the probed buckets (the hash only routes).
- **Atomic commit**: build into a tmp sibling, ``os.replace`` into
  place (checkpoint.py discipline) — a crashed build can never leave
  partial buckets that a later build would append to.

``n_buckets`` must scale with the corpus (postings per bucket ~
total_postings / n_buckets); size it like dedup.tuned_bucket_parts.
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rayslog.kernels import texthash as tx


#: posting-store schema version — bump when build output changes so
#: stale /tmp caches rebuild instead of serving the old layout
INDEX_VERSION = 3


def _token_buckets(tokens: pa.Array, n_buckets: int) -> np.ndarray:
    return (tx.hash_utf8(tokens, seed=0) % np.uint64(n_buckets)).astype(
        np.int64
    )


def _bucket_pruned_dataset(paths, buckets):
    """Dataset over ONLY the given buckets of a ``bucket=K/`` store —
    non-probed files are pruned from the listing itself (never opened;
    verify via ``input_files()``)."""
    import ray.data as rd
    from ray.data.datasource.partitioning import (
        Partitioning,
        PathPartitionFilter,
    )

    probed = {int(b) for b in buckets}
    return rd.read_parquet(
        paths,
        file_extensions=["parquet"],
        partition_filter=PathPartitionFilter.of(
            # meta files at the index root parse to {} -> excluded
            lambda kv: "bucket" in kv and int(kv["bucket"]) in probed,
            style="hive",
        ),
        partitioning=Partitioning("hive", field_types={"bucket": int}),
    )


class _PostingProbe:
    """Shared bucket-pruned probe surface of the posting stores;
    subclasses provide ``n_buckets`` and :meth:`postings_dataset`."""

    def postings_dataset(self, buckets):
        raise NotImplementedError

    #: field names of a multi-column store; None = single-column store
    fields: list[str] | None = None

    def _probe(self, tokens, columns, field: str | None = None):
        lowered = sorted({t.lower() for t in tokens})
        qt = pa.array(lowered, pa.string())
        buckets = sorted(set(_token_buckets(qt, self.n_buckets).tolist()))
        if field is not None and (
            self.fields is None or field not in self.fields
        ):
            raise ValueError(f"store has no field {field!r}")
        if self.fields is not None and field is None:
            columns = columns + ["field"]

        def probe(t: pa.Table) -> pa.Table:
            keep = pc.is_in(t.column("token"), value_set=qt)
            if field is not None:
                keep = pc.and_(
                    keep, pc.equal(t.column("field"), pa.scalar(field))
                )
            return t.filter(keep).select(columns)

        return self.postings_dataset(buckets).map_batches(
            probe, batch_format="pyarrow", zero_copy_batch=True
        )

    def lookup(self, tokens, field: str | None = None):
        """(token, doc_id) posting rows for the given tokens
        (lowercased), reading only their buckets.  On a multi-column
        store, ``field`` scopes to one field; unscoped lookups carry
        the ``field`` column."""
        return self._probe(tokens, ["token", "doc_id"], field=field)

    def lookup_scored(self, tokens, field: str | None = None):
        """(token, doc_id, tf, dl) posting rows — the term-frequency +
        doc-length denormalization BM25 scoring reads; same bucket
        pruning as :meth:`lookup`."""
        return self._probe(
            tokens, ["token", "doc_id", "tf", "dl"], field=field
        )

    def lookup_positions(self, tokens, field: str | None = None):
        """(token, doc_id, pos) posting rows with within-doc token
        positions — the positional-index form phrase search reads."""
        return self._probe(tokens, ["token", "doc_id", "pos"], field=field)


class InvertedIndex(_PostingProbe):
    """Handle over a one-shot persisted ``bucket=K/`` posting store."""

    def __init__(self, index_dir: str):
        self.index_dir = str(index_dir)
        meta = json.loads(Path(index_dir, "_inv_meta.json").read_text())
        self.n_buckets = int(meta["n_buckets"])
        self.version = int(meta.get("version", 1))

    def postings_dataset(self, buckets):
        return _bucket_pruned_dataset(self.index_dir, buckets)


def _make_explode(col: str, id_col: str, n_buckets: int,
                  field: str | None = None):
    """The build kernel shared by the one-shot and incremental builds:
    batch of docs -> per-doc-distinct posting rows with tf/dl/pos and
    the token-hash bucket.  With ``field`` set, every posting row also
    carries that constant field name (the multi-column store runs one
    explode per field and unions them — tf/dl/pos are all
    field-scoped)."""

    def explode(t: pa.Table) -> pa.Table:
        txt = t.column(col)
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        flat, offs = tx.tokens(txt, lower=True)
        n = len(offs) - 1
        if len(flat) == 0:
            return pa.table(
                {
                    "token": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "tf": pa.array([], pa.int64()),
                    "dl": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.list_(pa.int32())),
                    "bucket": pa.array([], pa.int64()),
                }
            )
        counts = np.diff(offs)
        h = tx.hash_utf8(flat, seed=0)
        seg = np.repeat(np.arange(n, dtype=np.int64), counts)
        order = np.lexsort((h, seg))
        s, hh = seg[order], h[order]
        first = np.r_[True, (s[1:] != s[:-1]) | (hh[1:] != hh[:-1])]
        starts = np.nonzero(first)[0]
        run_offsets = np.r_[starts, len(s)]
        tf = np.diff(run_offsets)
        idx = np.asarray(order)[first]
        docs = seg[idx]
        # within-doc token positions per occurrence: lexsort is stable,
        # so a run's occurrences keep ascending original order
        pos_sorted = (np.asarray(order) - offs[:-1][s]).astype(np.int32)
        pos_lists = pa.ListArray.from_arrays(
            pa.array(run_offsets.astype(np.int32)), pa.array(pos_sorted)
        )
        return pa.table(
            {
                "token": flat.take(pa.array(idx)),
                "doc_id": pa.array(ids[docs].astype(np.int64)),
                "tf": pa.array(tf.astype(np.int64)),
                "dl": pa.array(counts[docs].astype(np.int64)),
                "pos": pos_lists,
                "bucket": pa.array(
                    (hh[first] % np.uint64(n_buckets)).astype(np.int64)
                ),
            }
        )

    if field is None:
        return explode

    def fielded(t: pa.Table) -> pa.Table:
        out = explode(t)
        return out.append_column(
            "field", pa.array([field] * len(out), pa.string())
        )

    return fielded


def build_inverted_index(
    ds,
    index_dir: str,
    n_buckets: int = 64,
    col: str = "text",
    id_col: str = "doc_id",
    batch_size: int = 8_192,
) -> InvertedIndex:
    """One streaming pass -> hive-partitioned posting store.

    Per-doc distinctness is resolved by 64-bit token hash inside the
    batch (collisions would merge two distinct tokens of ONE doc —
    ~n_doc_tokens²/2⁶⁵, the same accepted risk as doc_freq); the
    stored rows carry the token STRING, so lookups are exact.  Each
    posting also carries its term frequency (``tf``) and the doc's
    token count (``dl``) — the standard search-engine denormalization
    that lets BM25 score from the probed buckets alone.
    """
    explode = _make_explode(col, id_col, n_buckets)
    final = Path(index_dir)
    tmp = final.with_name(final.name + f".build.{os.getpid()}")
    if tmp.exists():
        shutil.rmtree(tmp)
    tmp.mkdir(parents=True)
    ds.map_batches(
        explode,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    ).write_parquet(str(tmp), partition_cols=["bucket"])
    if not any(tmp.rglob("*.parquet")):  # postings-free corpus
        import pyarrow.parquet as pq

        fields = [
            pa.field("token", pa.string()),
            pa.field("doc_id", pa.int64()),
            pa.field("tf", pa.int64()),
            pa.field("dl", pa.int64()),
            pa.field("pos", pa.list_(pa.int32())),
        ]
        (tmp / "bucket=0").mkdir()
        pq.write_table(
            pa.Table.from_arrays(
                [pa.nulls(0, f.type) for f in fields],
                schema=pa.schema(fields),
            ),
            tmp / "bucket=0" / "empty.parquet",
        )
    (tmp / "_inv_meta.json").write_text(
        json.dumps({"n_buckets": int(n_buckets), "version": INDEX_VERSION})
    )
    if final.exists():  # stale partial from a crashed build
        shutil.rmtree(final)
    os.replace(tmp, final)
    return InvertedIndex(str(final))


def inverted_lookup(
    ds,
    tokens,
    index_dir: str | None = None,
    n_buckets: int = 64,
    col: str = "text",
    id_col: str = "doc_id",
):
    """Posting lookup over a (possibly cached) persisted index —
    reuses ``index_dir`` when its meta file exists, else builds it
    there (default: a fresh scratch dir, so two corpora never share a
    stale index)."""
    if index_dir is None:
        import tempfile

        index_dir = tempfile.mkdtemp(prefix="rayslog_inv_")
    index = ensure_index(
        ds, index_dir, n_buckets=n_buckets, col=col, id_col=id_col
    )
    return index.lookup(tokens)


class ShardedInvertedIndex(_PostingProbe):
    """Incrementally-appendable posting store: one immutable
    ``shards/<name>/bucket=K/`` tree per ingested batch of documents
    plus a manifest that is the single source of truth.

    The 100-TB ingest shape: new corpus drops (a crawl snapshot, a
    day's logs) index as NEW shard directories — already-committed
    shards are never rewritten, so appending day N costs O(day N), not
    O(corpus).  Every probe unions the committed shards' postings and
    prunes non-probed ``bucket=K/`` files from the FILE LISTING of
    every shard (same discipline as :class:`InvertedIndex`; all shards
    share one ``n_buckets`` so a token lands in the same bucket of
    each).  Corpus stats (n_docs, total token count) accumulate in the
    manifest per shard, so BM25's (N, avgdl) never needs a corpus
    pass.

    Crash safety: a shard builds in a tmp sibling and ``os.replace``\\ s
    into ``shards/``, then the manifest rewrites atomically.  A crash
    between the two leaves an unlisted shard directory, which the next
    ``append_shard`` of the same name clears — readers only ever see
    manifest-listed shards.  Doc-id uniqueness ACROSS shards is the
    caller's contract (re-appending the same docs would double-count
    them, exactly like any log-structured store).
    """

    MANIFEST = "_inv_manifest.json"

    def __init__(self, index_dir: str):
        self.index_dir = str(index_dir)
        m = json.loads(Path(index_dir, self.MANIFEST).read_text())
        self.n_buckets = int(m["n_buckets"])
        self.version = int(m.get("version", 0))
        self.shards = list(m["shards"])
        #: multi-column stores: {field name -> source column}
        self.field_cols: dict[str, str] | None = m.get("fields")
        self.fields = (
            list(self.field_cols) if self.field_cols is not None else None
        )

    # -- creation ------------------------------------------------------
    @classmethod
    def create(cls, index_dir: str, n_buckets: int = 64,
               fields: dict[str, str] | None = None):
        """Open the store at ``index_dir``, creating an empty one (or
        replacing a version/layout-mismatched one) as needed.

        ``fields`` makes it a MULTI-COLUMN store: ``{field name ->
        source column}``; every posting row carries its field, and
        tf/dl/pos are field-scoped.  Note the manifest's token totals
        then sum across ALL fields — BM25 wants a single-column store.
        """
        root = Path(index_dir)
        mf = root / cls.MANIFEST
        if mf.exists():
            idx = cls(index_dir)
            if (
                idx.version == INDEX_VERSION
                and idx.n_buckets == int(n_buckets)
                and idx.field_cols == fields
            ):
                return idx
            shutil.rmtree(root)
        root.mkdir(parents=True, exist_ok=True)
        (root / "shards").mkdir(exist_ok=True)
        cls._write_manifest(root, int(n_buckets), [], fields)
        return cls(index_dir)

    @staticmethod
    def _write_manifest(root: Path, n_buckets: int, shards: list,
                        fields: dict[str, str] | None):
        tmp = root / f".manifest.tmp.{os.getpid()}"
        tmp.write_text(
            json.dumps(
                {
                    "version": INDEX_VERSION,
                    "n_buckets": n_buckets,
                    "shards": shards,
                    "fields": fields,
                }
            )
        )
        os.replace(tmp, root / ShardedInvertedIndex.MANIFEST)

    # -- stats ---------------------------------------------------------
    @property
    def n_docs(self) -> int:
        return sum(int(s["n_docs"]) for s in self.shards)

    @property
    def total_tokens(self) -> int:
        return sum(int(s["total_tokens"]) for s in self.shards)

    @property
    def avgdl(self) -> float:
        return float(self.total_tokens) / float(max(1, self.n_docs))

    def shard_names(self) -> list[str]:
        return [s["name"] for s in self.shards]

    def shard_paths(self) -> list[str]:
        return [
            str(Path(self.index_dir, "shards", s["name"]))
            for s in self.shards
        ]

    def postings_dataset(self, buckets):
        paths = self.shard_paths()
        if not paths:
            raise ValueError("sharded index has no committed shards")
        return _bucket_pruned_dataset(paths, buckets)

    # -- ingest --------------------------------------------------------
    def append_shard(
        self,
        ds,
        name: str,
        col: str = "text",
        id_col: str = "doc_id",
        batch_size: int = 8_192,
    ) -> dict:
        """Index ``ds`` as the new immutable shard ``name`` and commit
        it to the manifest; returns the shard's stats entry.  Cost is
        one streaming pass over ``ds`` plus a single-column (tf)
        read-back of the new shard's postings for the token total —
        committed shards are untouched (their files are not even
        listed)."""
        if name in self.shard_names():
            raise ValueError(f"shard {name!r} already committed")
        root = Path(self.index_dir)
        final = root / "shards" / name
        if final.exists():  # unlisted leftover from a crashed append
            shutil.rmtree(final)
        tmp = root / f".shard.tmp.{name}.{os.getpid()}"
        if tmp.exists():
            shutil.rmtree(tmp)
        tmp.mkdir(parents=True)

        n_docs = ds.count()
        if self.field_cols is None:
            exploded = ds.map_batches(
                _make_explode(col, id_col, self.n_buckets),
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=batch_size,
            )
        else:
            # one explode per field, unioned — each stays a streaming
            # map over the same input blocks (no extra source reads
            # beyond one per field)
            parts = [
                ds.map_batches(
                    _make_explode(
                        src, id_col, self.n_buckets, field=fname
                    ),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                    batch_size=batch_size,
                )
                for fname, src in self.field_cols.items()
            ]
            exploded = parts[0]
            for part in parts[1:]:
                exploded = exploded.union(part)
        exploded.write_parquet(str(tmp), partition_cols=["bucket"])

        # an all-empty drop writes NO parquet files — anchor the shard
        # with a typed zero-row file so read-back and later probes
        # never see a file-less directory
        if not any(tmp.rglob("*.parquet")):
            import pyarrow.parquet as pq

            fields = [
                pa.field("token", pa.string()),
                pa.field("doc_id", pa.int64()),
                pa.field("tf", pa.int64()),
                pa.field("dl", pa.int64()),
                pa.field("pos", pa.list_(pa.int32())),
            ]
            if self.field_cols is not None:
                fields.append(pa.field("field", pa.string()))
            empty = pa.Table.from_arrays(
                [pa.nulls(0, f.type) for f in fields],
                schema=pa.schema(fields),
            )
            (tmp / "bucket=0").mkdir()
            pq.write_table(empty, tmp / "bucket=0" / "empty.parquet")
            total_tokens = 0
        else:
            # token total = sum(tf) over the new shard's postings: a
            # single-column parquet scan of what was just written
            import ray.data as rd
            from ray.data.aggregate import Sum

            agg = rd.read_parquet(
                str(tmp), file_extensions=["parquet"], columns=["tf"]
            ).aggregate(Sum("tf", alias_name="s"))
            total_tokens = int(agg["s"] or 0)

        os.replace(tmp, final)
        entry = {
            "name": name,
            "n_docs": int(n_docs),
            "total_tokens": total_tokens,
        }
        self.shards.append(entry)
        self._write_manifest(root, self.n_buckets, self.shards,
                             self.field_cols)
        return entry

    def compact(self, name: str | None = None) -> dict:
        """Merge every committed shard into ONE new shard — the
        log-structured compaction step that bounds per-probe file
        counts after many appends (each probe opens one file per
        bucket PER SHARD; compaction collapses that to one).

        Posting rows are immutable facts, so compaction is a pure
        bucket-preserving rewrite: read all shards' postings (bucket
        column riding along), write them as a single new shard,
        commit a manifest listing only it, then delete the old shard
        dirs.  Crash-safe in that order — a crash after the manifest
        commit leaves unlisted old dirs that readers never touch (and
        a later compact() clears).  Stats carry over by summing, so
        BM25's (N, avgdl) are unchanged.
        """
        if not self.shards:
            raise ValueError("compact: no committed shards")
        name = name or f"compact-{len(self.shards)}-{self.shards[-1]['name']}"
        if name in self.shard_names():
            raise ValueError(f"shard {name!r} already committed")
        root = Path(self.index_dir)
        old_names = self.shard_names()
        old_stats = {
            "n_docs": self.n_docs,
            "total_tokens": self.total_tokens,
        }
        final = root / "shards" / name
        if final.exists():
            shutil.rmtree(final)
        tmp = root / f".shard.tmp.{name}.{os.getpid()}"
        if tmp.exists():
            shutil.rmtree(tmp)
        tmp.mkdir(parents=True)
        self.postings_dataset(range(self.n_buckets)).write_parquet(
            str(tmp), partition_cols=["bucket"]
        )
        os.replace(tmp, final)
        entry = {"name": name, **old_stats}
        self.shards = [entry]
        self._write_manifest(root, self.n_buckets, self.shards,
                             self.field_cols)
        for old in old_names:
            shutil.rmtree(root / "shards" / old, ignore_errors=True)
        return entry


def ensure_index(ds, index_dir: str, n_buckets: int = 64,
                 col: str = "text", id_col: str = "doc_id") -> InvertedIndex:
    """Reuse the persisted index at ``index_dir`` when its meta exists
    AND matches the current schema version; (re)build otherwise."""
    if Path(index_dir, "_inv_meta.json").exists():
        index = InvertedIndex(index_dir)
        if index.version == INDEX_VERSION:
            return index
    return build_inverted_index(
        ds, index_dir, n_buckets=n_buckets, col=col, id_col=id_col
    )


def bm25_topk(
    index: InvertedIndex,
    tokens,
    n_docs: int,
    avgdl: float,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
):
    """BM25 top-k over the posting store: (doc_id, score, rank).

    Everything scores from the PROBED buckets alone — the denormalized
    (tf, dl) posting rows give term frequency and doc length, and
    df(t) is the posting count of each query token within the result
    itself (exact: the index holds one posting per (doc, token)).  The
    candidate set is bounded by the query's postings, so the final
    scoring collect is O(query postings), never corpus-sized (the
    fetch-only-candidates discipline).  Arithmetic is written
    left-to-right exactly as the SQL oracle spells it, with the 3-term
    sum accumulated in token order, so round-6 scores agree
    bit-for-bit.
    """
    import math

    import ray.data as rd

    df_rows = index.lookup_scored(tokens).to_pandas()
    if not len(df_rows):
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        )
    df_per_token = df_rows.groupby("token")["doc_id"].count().to_dict()
    terms: dict[int, list[tuple[str, float]]] = {}
    for tok, doc, tf, dl in zip(
        df_rows["token"], df_rows["doc_id"], df_rows["tf"], df_rows["dl"]
    ):
        dfx = float(df_per_token[tok])
        idf = math.log(1.0 + (float(n_docs) - dfx + 0.5) / (dfx + 0.5))
        denom = float(tf) + k1 * ((1.0 - b) + (b * float(dl)) / avgdl)
        terms.setdefault(int(doc), []).append(
            (tok, (idf * float(tf)) / denom)
        )
    scored = []
    for doc, parts in terms.items():
        s = 0.0
        for _, v in sorted(parts):  # token-order accumulation
            s += v
        scored.append((doc, round(s, 6)))
    scored.sort(key=lambda x: (-x[1], x[0]))
    top = scored[:k]
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in top], pa.int64()),
                "score": pa.array([s for _, s in top], pa.float64()),
                "rank": pa.array(
                    list(range(1, len(top) + 1)), pa.int64()
                ),
            }
        )
    )


def phrase_search(index: InvertedIndex, phrase):
    """Exact token-phrase search over the positional posting store:
    (doc_id, n_occurrences) for every doc containing the ``phrase``
    tokens ADJACENTLY (``\\S+`` tokenization, lowercased).

    Reads only the phrase tokens' buckets (position lists ride the
    postings); candidates = docs holding ALL tokens, occurrences =
    start positions whose successors line up — per-candidate
    ``np.intersect1d`` chains on the driver, bounded by the query's
    postings (never corpus-sized).
    """
    import ray.data as rd

    toks = [t.lower() for t in phrase]
    if len(toks) < 2:
        raise ValueError("phrase_search wants >= 2 tokens")
    rows = index.lookup_positions(toks).to_pandas()
    empty = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_occurrences": pa.array([], pa.int64()),
            }
        )
    )
    if not len(rows):
        return empty
    per_tok: list[dict[int, np.ndarray]] = []
    for t in toks:
        sub = rows[rows["token"] == t]
        per_tok.append(
            {
                int(d): np.asarray(p, dtype=np.int64)
                for d, p in zip(sub["doc_id"], sub["pos"])
            }
        )
    cands = set(per_tok[0])
    for m in per_tok[1:]:
        cands &= set(m)
    out = []
    for d in sorted(cands):
        startpos = per_tok[0][d]
        for k, m in enumerate(per_tok[1:], start=1):
            startpos = np.intersect1d(
                startpos, m[d] - k, assume_unique=True
            )
            if not len(startpos):
                break
        if len(startpos):
            out.append((d, len(startpos)))
    if not out:
        return empty
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in out], pa.int64()),
                "n_occurrences": pa.array([n for _, n in out], pa.int64()),
            }
        )
    )
