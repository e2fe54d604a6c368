"""Sharded (incrementally-appendable) inverted index: append parity
with the one-shot build, shard immutability, crash-leftover recovery,
manifest stats."""

from __future__ import annotations

import json
import os
from pathlib import Path

import pyarrow as pa
import pytest


DOCS_A = [
    (0, "the fast table scan"),
    (1, "hash join hash probe"),
    (2, "sort merge join"),
]
DOCS_B = [
    (3, "table scan again table"),
    (4, "window agg stream"),
]


def _ds(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def _postings(idx, tokens):
    df = idx.lookup_scored(tokens).to_pandas()
    return sorted(map(tuple, df[["token", "doc_id", "tf", "dl"]].values.tolist()))


def test_sharded_appends_match_oneshot_build(ray_session, tmp_path):
    from rayslog.stages.invindex import (
        ShardedInvertedIndex,
        build_inverted_index,
    )

    one = build_inverted_index(
        _ds(DOCS_A + DOCS_B), str(tmp_path / "one"), n_buckets=8
    )
    sh = ShardedInvertedIndex.create(str(tmp_path / "sh"), n_buckets=8)
    sh.append_shard(_ds(DOCS_A), "a")
    sh.append_shard(_ds(DOCS_B), "b")

    toks = ["table", "hash", "join", "scan"]
    assert _postings(sh, toks) == _postings(one, toks)
    # manifest stats accumulate across shards
    assert sh.n_docs == 5
    assert sh.total_tokens == sum(len(t.split()) for _, t in DOCS_A + DOCS_B)


def test_append_leaves_committed_shards_untouched(ray_session, tmp_path):
    from rayslog.stages.invindex import ShardedInvertedIndex

    sh = ShardedInvertedIndex.create(str(tmp_path / "sh"), n_buckets=8)
    sh.append_shard(_ds(DOCS_A), "a")
    a_dir = Path(sh.index_dir, "shards", "a")
    before = {
        p: os.stat(p).st_mtime_ns
        for p in sorted(str(f) for f in a_dir.rglob("*.parquet"))
    }
    assert before
    sh.append_shard(_ds(DOCS_B), "b")
    after = {
        p: os.stat(p).st_mtime_ns
        for p in sorted(str(f) for f in a_dir.rglob("*.parquet"))
    }
    assert after == before  # append cost is O(new shard), not O(corpus)


def test_duplicate_shard_name_raises(ray_session, tmp_path):
    from rayslog.stages.invindex import ShardedInvertedIndex

    sh = ShardedInvertedIndex.create(str(tmp_path / "sh"), n_buckets=8)
    sh.append_shard(_ds(DOCS_A), "a")
    with pytest.raises(ValueError, match="already committed"):
        sh.append_shard(_ds(DOCS_B), "a")


def test_unlisted_crash_leftover_is_replaced(ray_session, tmp_path):
    from rayslog.stages.invindex import ShardedInvertedIndex

    sh = ShardedInvertedIndex.create(str(tmp_path / "sh"), n_buckets=8)
    # simulate a crash AFTER the shard dir landed but BEFORE the
    # manifest commit: the dir exists, the manifest doesn't list it
    stale = Path(sh.index_dir, "shards", "a")
    stale.mkdir(parents=True)
    (stale / "garbage.parquet").write_bytes(b"not parquet")
    sh.append_shard(_ds(DOCS_A), "a")
    assert not (stale / "garbage.parquet").exists()
    assert _postings(sh, ["hash"]) == [("hash", 1, 2, 4)]


def test_reopen_reads_manifest(ray_session, tmp_path):
    from rayslog.stages.invindex import ShardedInvertedIndex

    sh = ShardedInvertedIndex.create(str(tmp_path / "sh"), n_buckets=8)
    sh.append_shard(_ds(DOCS_A), "a")
    re = ShardedInvertedIndex(str(tmp_path / "sh"))
    assert re.shard_names() == ["a"]
    assert re.n_docs == 3
    # create() on a matching store is a no-op open
    again = ShardedInvertedIndex.create(str(tmp_path / "sh"), n_buckets=8)
    assert again.shard_names() == ["a"]


def test_version_mismatch_rebuilds(ray_session, tmp_path):
    from rayslog.stages.invindex import ShardedInvertedIndex

    sh = ShardedInvertedIndex.create(str(tmp_path / "sh"), n_buckets=8)
    sh.append_shard(_ds(DOCS_A), "a")
    mf = Path(sh.index_dir, ShardedInvertedIndex.MANIFEST)
    m = json.loads(mf.read_text())
    m["version"] = -1
    mf.write_text(json.dumps(m))
    fresh = ShardedInvertedIndex.create(str(tmp_path / "sh"), n_buckets=8)
    assert fresh.shard_names() == []


def test_empty_drop_appends_cleanly(ray_session, tmp_path):
    """A drop whose docs have no tokens writes no postings — the shard
    must still commit (typed zero-row anchor file) and later lookups,
    appends, and compaction must work."""
    from rayslog.stages.invindex import ShardedInvertedIndex

    sh = ShardedInvertedIndex.create(str(tmp_path / "sh"), n_buckets=8)
    entry = sh.append_shard(_ds([(1, ""), (2, "   ")]), "empty")
    assert entry == {"name": "empty", "n_docs": 2, "total_tokens": 0}
    assert sh.lookup(["anything"]).count() == 0
    sh.append_shard(_ds(DOCS_A), "a")
    assert _postings(sh, ["hash"]) == [("hash", 1, 2, 4)]
    sh.compact()
    assert _postings(sh, ["hash"]) == [("hash", 1, 2, 4)]


def test_compact_preserves_lookups_and_stats(ray_session, tmp_path):
    from rayslog.stages.invindex import ShardedInvertedIndex

    sh = ShardedInvertedIndex.create(str(tmp_path / "sh"), n_buckets=8)
    sh.append_shard(_ds(DOCS_A), "a")
    sh.append_shard(_ds(DOCS_B), "b")
    toks = ["table", "hash", "join", "scan", "window"]
    before = _postings(sh, toks)
    stats_before = (sh.n_docs, sh.total_tokens)

    entry = sh.compact()
    assert sh.shard_names() == [entry["name"]]
    assert _postings(sh, toks) == before
    assert (sh.n_docs, sh.total_tokens) == stats_before
    # old shard dirs are gone; reopening sees only the compacted shard
    assert sorted(
        p.name for p in Path(sh.index_dir, "shards").iterdir()
    ) == [entry["name"]]
    re = ShardedInvertedIndex(str(tmp_path / "sh"))
    assert _postings(re, toks) == before
    # appends keep working after compaction
    re.append_shard(_ds([(9, "fresh table")]), "c")
    assert ("table", 9, 1, 2) in _postings(re, ["table"])


def test_cli_index_append_compact_search(ray_session, tmp_path):
    """The `rayslog index` ops surface: append -> stats -> search ->
    compact -> identical search (cmd functions called in-process on
    the session's Ray)."""
    import argparse

    import pyarrow.parquet as pq

    from rayslog.cli import cmd_index

    src = tmp_path / "docs.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in DOCS_A], pa.int64()),
                "text": pa.array([t for _, t in DOCS_A], pa.string()),
            }
        ),
        src,
    )
    store = str(tmp_path / "store")

    def ns(action, **kw):
        base = dict(
            store=store, input=None, name=None, col="text",
            id_col="doc_id", buckets=8, query=None, k=10, num_cpus=None,
        )
        base.update(kw)
        return argparse.Namespace(action=action, **base)

    assert cmd_index(ns("append", input=str(src), name="day0")) == 0
    assert cmd_index(ns("stats")) == 0
    assert cmd_index(ns("search", query="hash join")) == 0
    assert cmd_index(ns("compact")) == 0
    from rayslog.stages.invindex import ShardedInvertedIndex

    re = ShardedInvertedIndex(store)
    assert re.n_docs == 3 and len(re.shard_names()) == 1
    assert cmd_index(ns("search", query="hash join")) == 0
    # missing store errors cleanly
    assert cmd_index(ns("stats", store=str(tmp_path / "nope"))) == 2


def test_fielded_store_scopes_postings_per_field(ray_session, tmp_path):
    import ray.data as rd

    from rayslog.stages.invindex import ShardedInvertedIndex

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": ["alpha beta alpha", "beta gamma"],
                "source": ["web alpha", "news"],
            }
        )
    )
    sh = ShardedInvertedIndex.create(
        str(tmp_path / "f"),
        n_buckets=8,
        fields={"body": "text", "source": "source"},
    )
    sh.append_shard(docs, "a")
    # field-scoped: tf/dl are per field
    body = sh.lookup_scored(["alpha"], field="body").to_pandas()
    assert sorted(map(tuple, body[["doc_id", "tf", "dl"]].values.tolist())) == [
        (1, 2, 3)
    ]
    src = sh.lookup_scored(["alpha"], field="source").to_pandas()
    assert sorted(map(tuple, src[["doc_id", "tf", "dl"]].values.tolist())) == [
        (1, 1, 2)
    ]
    # unscoped lookup carries the field column
    allp = sh.lookup(["alpha"]).to_pandas()
    assert sorted(allp["field"]) == ["body", "source"]
    with pytest.raises(ValueError, match="no field"):
        sh.lookup(["alpha"], field="title")
    # manifest token totals sum across fields
    assert sh.total_tokens == (3 + 2) + (2 + 1)
    # reopening a fielded store with DIFFERENT fields rebuilds empty
    fresh = ShardedInvertedIndex.create(str(tmp_path / "f"), n_buckets=8)
    assert fresh.shard_names() == [] and fresh.fields is None


def test_probe_prunes_nonprobed_buckets_in_every_shard(ray_session, tmp_path):
    from rayslog.stages.invindex import ShardedInvertedIndex

    sh = ShardedInvertedIndex.create(str(tmp_path / "sh"), n_buckets=8)
    sh.append_shard(_ds(DOCS_A), "a")
    sh.append_shard(_ds(DOCS_B), "b")
    from rayslog.stages.invindex import _token_buckets

    probed = set(_token_buckets(pa.array(["table"]), 8).tolist())
    files = sh.postings_dataset(probed).input_files()
    assert files
    # both shards contribute listings, and every listed file sits in a
    # probed bucket dir — one token, one bucket value across all shards
    shards = {f.split("/shards/")[1].split("/")[0] for f in files}
    assert shards == {"a", "b"}
    buckets = {int(f.split("bucket=")[1].split("/")[0]) for f in files}
    assert buckets <= probed
    all_files = sh.postings_dataset(range(8)).input_files()
    assert len(files) < len(all_files)
