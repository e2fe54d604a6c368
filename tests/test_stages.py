"""Behavioral tests for the training-data + state stages: planted
near-duplicates must be found, multimodal plumbing must round-trip,
checkpointed runs must resume without re-processing."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def docs_with_dups(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    base_docs = [
        " ".join(rng.choice(words, size=30)) for _ in range(40)
    ]
    rows = []
    for i, t in enumerate(base_docs):
        rows.append({"doc_id": i, "text": t})
    # planted near-dups: copy doc 0/1/2 with one token changed
    for j, src in enumerate([0, 1, 2]):
        toks = base_docs[src].split()
        toks[5] = "changed"
        rows.append({"doc_id": 100 + j, "text": " ".join(toks)})
    # planted exact dup of doc 3
    rows.append({"doc_id": 200, "text": base_docs[3]})
    return rd.from_items(rows)


def test_exact_dedup_finds_planted_dup(docs_with_dups):
    from rayslog.stages.dedup import dedup_exact

    out = dedup_exact(docs_with_dups).to_pandas()
    # 44 distinct texts (40 base + 3 near-dups are distinct); the exact
    # dup of doc 3 collapses onto doc_id 3
    assert len(out) == 43
    assert 200 not in set(out["doc_id"])
    assert 3 in set(out["doc_id"])


def test_minhash_finds_planted_near_dups(docs_with_dups):
    from rayslog.stages.dedup import minhash_near_dups

    pairs = minhash_near_dups(docs_with_dups, threshold=0.5).to_pandas()
    got = {tuple(sorted((a, b))) for a, b in zip(pairs.doc_a, pairs.doc_b)}
    for j, src in enumerate([0, 1, 2]):
        assert (src, 100 + j) in got, (src, got)
    # exact dup pair found with jaccard 1.0
    assert (3, 200) in got
    row = pairs[(pairs.doc_a == 3) & (pairs.doc_b == 200)]
    assert float(row["jaccard"].iloc[0]) == 1.0


def test_minhash_verify_fetches_only_candidates(docs_with_dups, monkeypatch):
    """Scale invariant (VERDICT r1 #1): the verify stage must touch only
    candidate-pair texts, never the whole corpus."""
    import rayslog.stages.dedup as dd

    fetched_sizes = []
    real_fetch = dd.fetch_texts_for_ids

    def spy(ds, ids, **kw):
        out = real_fetch(ds, ids, **kw)
        fetched_sizes.append(len(out))
        return out

    monkeypatch.setattr(dd, "fetch_texts_for_ids", spy)
    pairs = dd.minhash_near_dups(docs_with_dups, threshold=0.5).to_pandas()
    assert len(pairs) >= 4  # planted dups still found
    n_corpus = docs_with_dups.count()
    assert fetched_sizes and all(s < n_corpus for s in fetched_sizes)
    # candidate universe: ids appearing in some pair, not all 45 docs
    cand_ids = set(pairs.doc_a) | set(pairs.doc_b)
    assert fetched_sizes[0] >= len(cand_ids)


def test_ngram_jaccard_cap_pushed_into_plan(docs_with_dups):
    """max_docs caps the candidate universe to the SMALLEST ids inside
    the streaming plan (VERDICT r1 #6) — pairs never involve ids beyond
    the cap."""
    from rayslog.stages.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(
        docs_with_dups, threshold=0.0, max_docs=10
    ).to_pandas()
    # the 10 smallest doc_ids are 0..9; every pair stays inside them
    assert len(pairs) == 45  # C(10,2) pairs at threshold 0
    assert pairs.doc_a.max() <= 9 and pairs.doc_b.max() <= 9


def test_minhash_survivor_dedup(docs_with_dups):
    """One-pass LSH survivor selection: planted exact/near dups
    collapse onto their smaller-id originals; dissimilar docs survive;
    and survivors + dropped partitions the corpus consistently with the
    pair-based operator's candidate structure."""
    from rayslog.stages.dedup import minhash_dedup_survivors, minhash_near_dups

    surv = set(minhash_dedup_survivors(docs_with_dups).to_pandas()["doc_id"])
    # near-dups of docs 0/1/2 and the exact dup of 3 are dropped
    for d in (100, 101, 102, 200):
        assert d not in surv, d
    for d in (0, 1, 2, 3):
        assert d in surv, d
    # consistency: every dropped doc shares a verified near-dup pair
    # with some smaller doc (on this corpus pairs == exact >=0.5 set)
    pairs = minhash_near_dups(docs_with_dups, threshold=0.5).to_pandas()
    paired = {}
    for a, b in zip(pairs.doc_a, pairs.doc_b):
        paired.setdefault(b, set()).add(a)
        paired.setdefault(a, set()).add(b)
    all_ids = set(docs_with_dups.to_pandas()["doc_id"])
    for d in all_ids - surv:
        assert any(x < d for x in paired.get(d, ())), d


def test_simhash_finds_exact_dup_pair(docs_with_dups):
    from rayslog.stages.dedup import simhash_near_dups

    pairs = simhash_near_dups(docs_with_dups, max_hamming=6).to_pandas()
    got = {tuple(sorted((a, b))) for a, b in zip(pairs.doc_a, pairs.doc_b)}
    assert (3, 200) in got
    row = pairs[(pairs.doc_a == 3) & (pairs.doc_b == 200)]
    assert int(row["hamming"].iloc[0]) == 0


def test_ngram_jaccard_kernel():
    from rayslog.stages.dedup import ngram_jaccard

    assert ngram_jaccard("a b c d e", "a b c d e") == 1.0
    assert ngram_jaccard("a b c d e", "v w x y z") == 0.0
    mid = ngram_jaccard("a b c d e f g h", "a b c d e f g x")
    assert 0.0 < mid < 1.0


def test_ivf_index_prunes_and_recalls(ray_session, tmp_path):
    """The IVF index is REAL (VERDICT r1 #2): a persisted bucket
    partition whose probe reads only probed buckets' files, and whose
    recall@10 on clustered data beats the brute-force bar."""
    import ray.data as rd

    from rayslog.stages.ann import IvfIndex, brute_force_topk, build_ivf_index

    # planted clusters: 8 well-separated centers + small noise
    rng = np.random.default_rng(3)
    dim, n_clusters, per = 16, 8, 150
    centers = rng.normal(size=(n_clusters, dim)) * 10
    rows = []
    for c in range(n_clusters):
        pts = centers[c] + rng.normal(size=(per, dim)) * 0.1
        for i, v in enumerate(pts):
            rows.append(
                {"vec_id": c * per + i, "embedding": v.astype(np.float32).tolist()}
            )
    ds = rd.from_items(rows)
    index = build_ivf_index(
        ds, str(tmp_path / "ivf"), n_centroids=8, sample_rows=1200
    )

    # pruning: probing 2 buckets must read only those buckets' files
    files = index.probe_dataset([0, 1]).input_files()
    assert files
    assert all("/bucket=0/" in f or "/bucket=1/" in f for f in files)
    import glob

    all_files = glob.glob(str(tmp_path / "ivf" / "bucket=*" / "*.parquet"))
    assert len(files) < len(all_files)

    # recall@10 >= 0.9 vs brute force on clustered data
    qv = centers[:4] + rng.normal(size=(4, dim)) * 0.1
    qi = np.arange(4)
    exact = brute_force_topk(ds, qv, qi, k=10).to_pandas()
    approx = index.probe(qv, qi, k=10, nprobe=2).to_pandas()
    recalls = []
    for q in qi:
        t = set(exact[exact.query_id == q].vec_id)
        a = set(approx[approx.query_id == q].vec_id)
        recalls.append(len(t & a) / len(t))
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_cosine_pairs_block_plan_matches_naive(ray_session):
    """Block-pair exact cosine dedup equals the naive all-pairs result,
    including pairs that straddle block boundaries."""
    import ray.data as rd

    from rayslog.stages.ann import cosine_near_dup_pairs

    rng = np.random.default_rng(11)
    base = rng.normal(size=(30, 8))
    vecs = list(base)
    vecs[25] = base[2] + rng.normal(size=8) * 0.01  # planted near-dup
    rows = [
        {"vec_id": i, "embedding": v.astype(np.float32).tolist()}
        for i, v in enumerate(vecs)
    ]
    # several small blocks so cross-block pairs exist
    ds = rd.from_items(rows).repartition(5)
    got = cosine_near_dup_pairs(ds, threshold=0.6).to_pandas()
    got_pairs = {(a, b) for a, b in zip(got.vec_a, got.vec_b)}

    m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    s = np.round(m @ m.T, 6)
    expect = {
        (i, j)
        for i in range(len(vecs))
        for j in range(i + 1, len(vecs))
        if s[i, j] >= 0.6
    }
    assert got_pairs == expect
    assert (2, 25) in got_pairs


def test_sessionize_partitioned_equals_plain(ray_session):
    """Two-phase chunked sessionize == plain sessionize, including
    sessions that cross chunk boundaries and span empty chunks."""
    import ray.data as rd

    from rayslog.stages.events import sessionize, sessionize_partitioned

    rng = np.random.default_rng(21)
    base = 1_700_000_000_000_000  # µs
    CH = 3_600  # 1h chunks to force many boundary crossings
    rows = []
    eid = 0
    for user in range(6):
        t = base + user * 977_000_000
        for _ in range(rng.integers(30, 120)):
            # mixture of small gaps (same session) and > gap jumps,
            # some gaps straddling the 1h chunk edge exactly
            step = int(rng.choice([5, 60, 1_700, 1_801, 3_599, 3_601, 7_200]))
            t += step * 1_000_000
            rows.append({"user_id": user, "ts": t, "event_id": eid})
            eid += 1
    import pandas as pd

    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["ts"], unit="us")
    ds = rd.from_pandas(df).repartition(4)
    plain = (
        sessionize(ds, gap_sec=1_800)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    part = (
        sessionize_partitioned(ds, gap_sec=1_800, chunk_sec=CH)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(plain, part, check_dtype=False)


def test_asof_partitioned_equals_plain(ray_session):
    """Two-phase chunked as-of == plain as-of, including targets whose
    nearest source lives several (possibly empty) chunks earlier."""
    import pandas as pd
    import ray.data as rd

    from rayslog.stages.events import asof_attribution, asof_attribution_partitioned

    rng = np.random.default_rng(33)
    base = 1_700_000_000_000_000
    CH = 3_600  # 1h chunks
    rows = []
    eid = 0
    for user in range(5):
        t = base + user * 313_000_000
        for _ in range(rng.integers(40, 120)):
            step = int(rng.choice([10, 120, 1_700, 3_500, 3_700, 9_000]))
            t += step * 1_000_000
            kind = "purchase" if rng.random() < 0.3 else "view"
            rows.append(
                {"event_id": eid, "user_id": user, "event_type": kind,
                 "ts": t}
            )
            eid += 1
        # a purchase far after the last view (crosses many empty chunks)
        rows.append(
            {"event_id": eid, "user_id": user, "event_type": "purchase",
             "ts": t + 40 * 3_600 * 1_000_000}
        )
        eid += 1
    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["ts"], unit="us")
    ds = rd.from_pandas(df).repartition(4)

    def norm(x):
        out = (
            x.to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)[
                ["event_id", "user_id", "ts", "last_source_ts"]
            ]
        )
        out["event_id"] = out["event_id"].astype("int64")
        out["ts"] = out["ts"].astype("datetime64[us]")
        out["last_source_ts"] = out["last_source_ts"].astype("datetime64[us]")
        return out

    plain = norm(asof_attribution(ds))
    part = norm(asof_attribution_partitioned(ds, chunk_sec=CH))
    pd.testing.assert_frame_equal(plain, part, check_dtype=False)


def test_sessionize_partitioned_string_users(ray_session):
    """The two-phase sessionize runs on STRING user_ids (composite-key
    exchange/join — no int bit-pack) and matches the int-user result."""
    import pandas as pd
    import ray.data as rd

    from rayslog.stages.events import sessionize_partitioned

    rng = np.random.default_rng(57)
    base = 1_700_000_000_000_000
    rows = []
    eid = 0
    for user in range(7):
        t = base + user * 500_000_000
        for _ in range(rng.integers(20, 80)):
            t += int(rng.choice([5, 60, 1_801, 3_601, 7_200])) * 1_000_000
            rows.append({"user_id": user, "ts": t, "event_id": eid})
            eid += 1
    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["ts"], unit="us")
    sdf = df.copy()
    sdf["user_id"] = sdf["user_id"].map(lambda u: f"user-{u:03d}")

    ints = (
        sessionize_partitioned(rd.from_pandas(df).repartition(3),
                               gap_sec=1_800, chunk_sec=3_600)
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    strs = (
        sessionize_partitioned(rd.from_pandas(sdf).repartition(3),
                               gap_sec=1_800, chunk_sec=3_600)
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    assert strs["user_id"].tolist() == [
        f"user-{u:03d}" for u in ints["user_id"]
    ]
    for c in ["n_sessions", "n_events", "longest_session_events"]:
        assert strs[c].tolist() == ints[c].tolist(), c


def test_asof_partitioned_string_users(ray_session):
    """The two-phase as-of runs on STRING user_ids: the carry join goes
    through the composite-key hash_join on (user_id, chunk)."""
    import pandas as pd
    import ray.data as rd

    from rayslog.stages.events import asof_attribution_partitioned

    rng = np.random.default_rng(91)
    base = 1_700_000_000_000_000
    rows = []
    eid = 0
    for user in range(5):
        t = base + user * 313_000_000
        for _ in range(rng.integers(30, 90)):
            t += int(rng.choice([10, 1_700, 3_700, 9_000])) * 1_000_000
            kind = "purchase" if rng.random() < 0.3 else "view"
            rows.append({"event_id": eid, "user_id": user,
                         "event_type": kind, "ts": t})
            eid += 1
        rows.append({"event_id": eid, "user_id": user,
                     "event_type": "purchase",
                     "ts": t + 40 * 3_600 * 1_000_000})
        eid += 1
    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["ts"], unit="us")
    sdf = df.copy()
    sdf["user_id"] = sdf["user_id"].map(lambda u: f"user-{u:03d}")

    def norm(x):
        out = x.to_pandas().sort_values("event_id").reset_index(drop=True)
        out["ts"] = out["ts"].astype("datetime64[us]")
        out["last_source_ts"] = out["last_source_ts"].astype("datetime64[us]")
        return out

    ints = norm(asof_attribution_partitioned(
        rd.from_pandas(df).repartition(3), chunk_sec=3_600))
    strs = norm(asof_attribution_partitioned(
        rd.from_pandas(sdf).repartition(3), chunk_sec=3_600))
    assert strs["user_id"].tolist() == [
        f"user-{u:03d}" for u in ints["user_id"]
    ]
    for c in ["event_id", "ts", "last_source_ts"]:
        assert strs[c].tolist() == ints[c].tolist(), c


def test_cosine_dups_ivf_subset_of_exact(ray_session):
    """The IVF-bucketed near-dup pairs are a subset of the exact
    all-pairs result with IDENTICAL scores (bucket pruning only drops
    border pairs, never alters a kept pair's cosine)."""
    from rayslog import pipeline as p

    sf = "/root/testdata/sf0.001"
    ivf = p.q_cosine_dups_ivf(sf).to_pandas()
    exact = p.q_cosine_dups(sf).to_pandas()
    assert len(ivf) > 0
    ex = {(a, b): s for a, b, s in
          zip(exact["vec_a"], exact["vec_b"], exact["score"])}
    for a, b, s in zip(ivf["vec_a"], ivf["vec_b"], ivf["score"]):
        assert (a, b) in ex and ex[(a, b)] == s, (a, b, s)


def test_cosine_lsh_subset_of_exact_and_finds_planted(ray_session):
    """LSH-bucketed cosine pairs emit TRUE scores and form a subset of
    the exact operator's result; a strongly-similar planted pair is
    found (collision prob ~1 at cosine ~0.999)."""
    import ray.data as rd

    from rayslog.stages.ann import cosine_lsh_pairs, cosine_near_dup_pairs

    rng = np.random.default_rng(5)
    base = rng.normal(size=(40, 12))
    vecs = list(base)
    vecs[30] = base[7] + rng.normal(size=12) * 0.001  # near-identical
    rows = [
        {"vec_id": i, "embedding": v.astype(np.float32).tolist()}
        for i, v in enumerate(vecs)
    ]
    ds = rd.from_items(rows).repartition(4)
    lsh = cosine_lsh_pairs(ds, threshold=0.6).to_pandas()
    exact = cosine_near_dup_pairs(ds, threshold=0.6).to_pandas()
    lsh_pairs = {(a, b): s for a, b, s in zip(lsh.vec_a, lsh.vec_b, lsh.score)}
    exact_pairs = {
        (a, b): s for a, b, s in zip(exact.vec_a, exact.vec_b, exact.score)
    }
    assert set(lsh_pairs) <= set(exact_pairs)
    for k, s in lsh_pairs.items():
        assert s == exact_pairs[k]  # true cosines, not approximations
    assert (7, 30) in lsh_pairs


def test_multimodal_plumbing(ray_session):
    import ray.data as rd

    from rayslog.stages.multimodal import (
        FakeDecoder,
        RealDecoder,
        decode_media,
        synthesize_media_table,
    )

    tbl = synthesize_media_table(100)
    ds = rd.from_arrow(tbl)
    out = decode_media(ds, FakeDecoder).to_pandas()
    assert len(out) == 100
    assert "features" in out.columns and "payload_bytes" in out.columns
    assert all(len(f) == 16 for f in out["features"])
    assert (out["payload_bytes"] > 0).all()
    # determinism
    out2 = decode_media(rd.from_arrow(tbl), FakeDecoder).to_pandas()
    assert out.sort_values("media_id")["features"].map(tuple).tolist() == \
        out2.sort_values("media_id")["features"].map(tuple).tolist()
    with pytest.raises(NotImplementedError):
        RealDecoder()(tbl)


def test_stdlib_media_decode_roundtrip(ray_session):
    """REAL decode: BMP pixels and WAV samples synthesized, encoded,
    decoded back — decoded dims/durations must equal the synthesis
    metadata, and a known sine's RMS must come out right."""
    import ray.data as rd

    from rayslog.stages.multimodal import (
        StdlibDecoder,
        _decode_bmp,
        _decode_wav,
        _encode_bmp,
        _encode_wav,
        decode_media,
        synthesize_real_media_table,
    )

    # byte-level roundtrips
    px = (np.arange(5 * 7 * 3).reshape(5, 7, 3) % 256).astype(np.uint8)
    assert (_decode_bmp(_encode_bmp(px)) == px).all()
    t = np.arange(800) / 8_000.0
    sine = (np.sin(2 * np.pi * 440 * t) * 12_000).astype(np.int16)
    dec, rate = _decode_wav(_encode_wav(sine))
    assert rate == 8_000 and (dec.astype(np.int16) == sine).all()

    # pipeline: decoded metadata equals synthesized metadata
    tbl = synthesize_real_media_table(60)
    out = decode_media(rd.from_arrow(tbl), StdlibDecoder).to_pandas()
    out = out.sort_values("media_id").reset_index(drop=True)
    img = out[out["kind"] == "image"]
    assert (img["decoded_w"] == img["width"]).all()
    assert (img["decoded_h"] == img["height"]).all()
    aud = out[out["kind"] == "audio"]
    assert (aud["decoded_ms"] == aud["duration_ms"]).all()
    # sine RMS ~ 12000/32768/sqrt(2) ~= 0.259 in every segment
    feats = np.stack(aud["features"].map(np.asarray))
    assert np.allclose(feats.mean(), 0.259, atol=0.02)
    assert all(len(f) == 16 for f in out["features"])


def test_checkpoint_resume(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from rayslog.sources.testgen import generate_transcripts
    from rayslog.state.checkpoint import (
        ManifestStore,
        partition_id,
        run_resumable_route,
    )

    # two input files
    t = generate_transcripts(2_000)
    in_a = tmp_path / "in_a.parquet"
    in_b = tmp_path / "in_b.parquet"
    pq.write_table(t.slice(0, 1_000), in_a)
    pq.write_table(t.slice(1_000, 1_000), in_b)
    out = tmp_path / "out"
    part_a, part_b = partition_id(str(in_a)), partition_id(str(in_b))

    done = run_resumable_route([str(in_a), str(in_b)], str(out))
    assert set(done) == {part_a, part_b}
    store = ManifestStore(str(out))
    assert set(store.completed()) == {part_a, part_b}
    m0 = store.load(part_a)
    assert m0["rows"] == 1_000
    assert m0["parsed"] + m0["errors"] == 1_000
    assert sum(m0["metrics"]["severity_rows"].values()) == m0["parsed"]

    # capture bytes, then rerun: nothing reprocessed, outputs untouched
    files_before = {
        str(p): p.stat().st_mtime_ns
        for p in (out / part_a).rglob("*.parquet")
    }
    done2 = run_resumable_route([str(in_a), str(in_b)], str(out))
    assert done2 == []
    files_after = {
        str(p): p.stat().st_mtime_ns
        for p in (out / part_a).rglob("*.parquet")
    }
    assert files_before == files_after

    # adding a NEW file between runs must not remap/skip: only the new
    # file is processed (path-derived ids are listing-order independent)
    in_0 = tmp_path / "in_0_first_in_sort_order.parquet"
    pq.write_table(t.slice(0, 500), in_0)
    done_new = run_resumable_route(
        [str(in_0), str(in_a), str(in_b)], str(out)
    )
    assert done_new == [partition_id(str(in_0))]

    # simulated mid-run kill: snapshot partition 1's sink rows, delete
    # its manifest + dir, rerun — the regenerated sinks must reproduce
    # the identical rows (deterministic, idempotent partitions)
    import pandas as pd
    import pyarrow.dataset as pads

    def sink_rows(part):
        tbl = pads.dataset(str(out / part / "parsed"), partitioning="hive").to_table()
        df = tbl.to_pandas()
        df["severity"] = df["severity"].astype("int64")
        return df.sort_values(
            ["conv_id", "turn_idx"], ignore_index=True
        )[sorted(df.columns)]

    before = sink_rows(part_b)
    (out / "_manifests" / f"{part_b}.json").unlink()
    import shutil

    shutil.rmtree(out / part_b)
    done3 = run_resumable_route([str(in_a), str(in_b)], str(out))
    assert done3 == [part_b]
    m1 = store.load(part_b)
    assert m1["rows"] == 1_000
    after = sink_rows(part_b)
    pd.testing.assert_frame_equal(before, after)


def test_salted_counts_match_plain(ray_session):
    import ray.data as rd

    from rayslog.stages.aggregate import counts_by, salted_counts_by

    rng = np.random.default_rng(3)
    keys = [f"k{int(v)}" for v in rng.zipf(1.5, 5_000) % 17]
    ds = rd.from_arrow(pa.table({"conv_id": keys}))
    plain = counts_by(ds, ["conv_id"]).to_pandas().sort_values("conv_id")
    salted = (
        salted_counts_by(ds, ["conv_id"]).to_pandas().sort_values("conv_id")
    )
    assert plain.reset_index(drop=True).equals(salted.reset_index(drop=True))


def test_hll_accuracy(ray_session):
    import ray.data as rd

    from rayslog.stages.sketch import approx_distinct

    ds = rd.from_items([{"k": f"key-{i % 3171}"} for i in range(20_000)])
    est = approx_distinct(ds, "k", p=12)
    assert abs(est - 3171) / 3171 < 0.05, est


def test_col_hash64_types():
    """The composite-key hash handles int, string and timestamp columns
    (the _uc_key bit pack and its 2^42-user cap are retired)."""
    import pyarrow as pa

    from rayslog.kernels.texthash import col_hash64, combine_hash64

    ints = pa.array([0, 5, 2**62, -1], pa.int64())
    strs = pa.array(["", "a", "user-5", "user-5"])
    ts = pa.array([0, 10**15], pa.timestamp("us"))
    hi, hs, ht = col_hash64(ints), col_hash64(strs), col_hash64(ts)
    assert hi.dtype == np.uint64 and hs.dtype == np.uint64
    assert len(set(hi.tolist())) == 4  # no 2^42 wrap aliasing
    assert hs[2] == hs[3] and hs[1] != hs[2]
    assert len(ht) == 2 and ht[0] != ht[1]
    # combine is order-sensitive (composite (a,b) != (b,a))
    c1 = combine_hash64(hi[:2], hi[2:])
    c2 = combine_hash64(hi[2:], hi[:2])
    assert (c1 != c2).any()
    # chunked arrays take the same path
    ch = pa.chunked_array([strs.slice(0, 2), strs.slice(2)])
    assert (col_hash64(ch) == hs).all()


def test_query_vectors_reads_only_n_rows(tmp_path):
    """_query_vectors pushes the predicate into the parquet read — it
    must never decode the whole embeddings corpus on the driver."""
    import pyarrow.parquet as pq

    from rayslog.pipeline import _query_vectors

    n_corpus, dim = 5_000, 8
    rng = np.random.default_rng(7)
    t = pa.table({
        "vec_id": pa.array(np.arange(n_corpus, dtype=np.int64)),
        "embedding": pa.array(
            rng.normal(size=(n_corpus, dim)).tolist(),
            pa.list_(pa.float32()),
        ),
    })
    # many row groups so row-group pruning has something to prune
    pq.write_table(t, tmp_path / "embeddings.parquet", row_group_size=256)

    import unittest.mock as mock

    real = pq.read_table
    seen = {}

    def spy(*a, **kw):
        out = real(*a, **kw)
        seen["rows"] = out.num_rows
        return out

    with mock.patch.object(pq, "read_table", side_effect=spy):
        mat, ids = _query_vectors(str(tmp_path), n=8)
    assert seen["rows"] <= 8
    assert list(ids) == list(range(8))
    assert mat.shape == (8, dim)


def test_minhash_oversized_bucket_raises(ray_session):
    """A duplicate/template group larger than max_bucket must FAIL the
    pair-enumeration path loudly (pair completeness is its contract),
    while the survivor path handles the same corpus fine."""
    import pytest as _pytest
    import ray.data as rd

    from rayslog.stages.dedup import (
        minhash_dedup_survivors,
        minhash_near_dups,
    )

    rng = np.random.default_rng(11)
    words = [f"w{j}" for j in range(400)]
    texts = ["the same templated log line repeated verbatim"] * 30 + [
        " ".join(rng.choice(words, size=12, replace=False)) for _ in range(10)
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    with _pytest.raises(ValueError, match="max_bucket"):
        minhash_near_dups(ds, threshold=0.5, max_bucket=8).to_pandas()

    # survivor dedup needs no pair enumeration: one survivor for the
    # template group + every unique doc
    surv = minhash_dedup_survivors(ds).to_pandas()
    assert 0 in set(surv["doc_id"])
    assert set(range(30, 40)) <= set(surv["doc_id"])
    assert not (set(range(1, 30)) & set(surv["doc_id"]))


def test_cosine_lsh_shuffle_carries_no_embeddings(ray_session):
    """The LSH all-to-all exchange must carry keys only — shipping the
    embedding column would replicate the corpus n_tables times."""
    import ray
    import ray.data as rd

    from rayslog.stages.ann import lsh_signature_rows

    rng = np.random.default_rng(6)
    rows = [
        {"vec_id": i, "embedding": rng.normal(size=8).astype(np.float32).tolist()}
        for i in range(20)
    ]
    ds = rd.from_items(rows)
    planes_ref = ray.put(rng.normal(size=(3, 8, 6)))
    exploded = lsh_signature_rows(ds, planes_ref, n_bits=6, n_tables=3)
    names = set(exploded.schema().names)
    assert names == {"table_id", "bucket", "bpart", "vec_id"}
    assert exploded.count() == 60  # n_tables x rows, nothing else


def test_tree_counts_match_shuffle_and_driver(ray_session):
    """final='tree' (raw-task combiner tree) == 'shuffle' == 'driver',
    including the empty-input schema contract."""
    import ray.data as rd

    from rayslog.stages.aggregate import counts_by

    rng = np.random.default_rng(9)
    keys = [f"conv-{int(v) % 37}" for v in rng.zipf(1.4, 20_000)]
    ds = rd.from_arrow(pa.table({"conv_id": keys})).repartition(8)

    def norm(d):
        return (
            d.to_pandas()
            .sort_values("conv_id")
            .reset_index(drop=True)
        )

    tree = norm(counts_by(ds, ["conv_id"], final="tree"))
    shuf = norm(counts_by(ds, ["conv_id"], final="shuffle"))
    drv = norm(counts_by(ds, ["conv_id"], final="driver"))
    assert tree.equals(shuf)
    assert tree.equals(drv)

    empty = rd.from_arrow(
        pa.table({"conv_id": pa.array([], pa.string())})
    )
    out = counts_by(empty, ["conv_id"], final="tree")
    sch = out.schema()
    assert sch.names == ["conv_id", "n_turns"]
    assert out.count() == 0


def test_tree_auto_split_high_cardinality(ray_session):
    """The cardinality-adaptive tree (split_keys + tiny threshold) must
    hash-split into multiple sub-trees past the threshold and still
    produce EXACTLY the plain tree / shuffle result — both for
    counts_by-shaped grouped sums (string keys, nulls included) and for
    the customer_order_distribution reduce (int keys)."""
    import ray.data as rd

    from rayslog.stages.aggregate import tree_aggregate, tree_reduce

    rng = np.random.default_rng(11)
    # 5k distinct string keys (every row nearly unique) + null keys:
    # with split_threshold=500 the first round's output sum far exceeds
    # the threshold, forcing the hash-range sub-tree path
    ks = [f"conv-{int(v)}" for v in rng.integers(0, 5_000, 20_000)]
    ks = [None if i % 997 == 0 else k for i, k in enumerate(ks)]
    tbl = pa.table(
        {
            "conv_id": pa.array(ks, pa.string()),
            "n": pa.array(rng.integers(1, 5, 20_000), pa.int64()),
        }
    )
    ds = rd.from_arrow(tbl).repartition(16)

    def norm(d):
        return (
            d.to_pandas()
            .sort_values("conv_id", na_position="first")
            .reset_index(drop=True)
        )

    split = tree_aggregate(
        ds, ["conv_id"], [("n", "sum")], ["total"],
        split_keys=["conv_id"], split_threshold=500,
    )
    # the split plan really engaged: multiple disjoint hash-range blocks
    assert split.materialize().num_blocks() > 1
    plain = tree_aggregate(ds, ["conv_id"], [("n", "sum")], ["total"])
    got, want = norm(split), norm(plain)
    assert got.equals(want), (got.head(), want.head())

    # int-key reduce_fn path (the customer_order_distribution shape)
    def reduce_fn(t):
        return (
            t.group_by(["k"]).aggregate([("v", "sum")])
            .rename_columns(["k", "v"])
        )

    tbl2 = pa.table(
        {
            "k": pa.array(rng.integers(0, 3_000, 10_000), pa.int64()),
            "v": pa.array(rng.integers(0, 10, 10_000), pa.int64()),
        }
    )
    ds2 = rd.from_arrow(tbl2).repartition(8)
    a = tree_reduce(ds2, reduce_fn, split_keys=["k"], split_threshold=300)
    b = tree_reduce(ds2, reduce_fn)
    an = a.to_pandas().sort_values("k").reset_index(drop=True)
    bn = b.to_pandas().sort_values("k").reset_index(drop=True)
    assert an.equals(bn)
    # below-threshold input must NOT split (plain single-block tree)
    small = tree_reduce(
        ds2, reduce_fn, split_keys=["k"], split_threshold=10_000_000
    )
    assert small.materialize().num_blocks() == 1


def test_repetition_features_vs_duckdb_on_multiline_docs(ray_session):
    """Line/paragraph dup fractions and top-bigram share match the SQL
    oracle on a corpus that actually HAS newlines, paragraphs, repeated
    lines and dominant bigrams (the generated documents are
    single-line, so this covers what the sf oracle run cannot)."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from rayslog.stages.text import repetition_features

    texts = [
        "a b c\na b c\nx y z",                      # 1 dup line of 3
        "p q\n\np q\n\nr s",                         # 1 dup para of 3
        "t t t t t t",                               # one bigram dominates
        "one two three four",                        # all bigrams distinct
        "solo",                                      # no bigrams
        "",                                          # empty text
        "tail newline\n",                            # trailing newline
        "a\n\n\nb",                                  # 3x newline run
        "x\nx\nx\nx",                                # all-dup lines
        "mix mix mix two two",                       # competing bigrams
        None,                                        # null text
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    got = (
        rd.from_arrow(tbl)
        .map_batches(
            lambda t: repetition_features(t).drop_columns(["text"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    con = duckdb.connect()
    con.register("documents_arrow", tbl)
    con.sql("CREATE VIEW documents AS SELECT * FROM documents_arrow")
    from rayslog.sqloracle import training_oracle_queries

    sql_df = (
        con.sql(training_oracle_queries()["repetition"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], sql_df[sorted(sql_df.columns)],
        check_dtype=False, check_exact=True,
    )
    # spot-check semantics
    row = got.set_index("doc_id")
    assert row.loc[0, "dup_line_frac"] == pytest.approx(1 / 3)
    assert row.loc[1, "dup_para_frac"] == pytest.approx(1 / 3)
    assert row.loc[2, "top_bigram_share"] == 1.0
    assert row.loc[3, "top_bigram_share"] == pytest.approx(1 / 3)
    assert row.loc[4, "top_bigram_share"] == 0.0
    assert row.loc[8, "dup_line_frac"] == pytest.approx(3 / 4)
    assert pd.isna(row.loc[10, "n_lines"])


def test_stratified_sample_deterministic_and_rate_accurate(ray_session):
    """Two runs produce IDENTICAL samples; per-stratum keep rates land
    near their targets; unknown strata fall to the default rate."""
    import ray.data as rd

    from rayslog.stages.sample import stratified_sample

    n = 40_000
    langs = np.array(["en", "fr", "zh", "xx"])[
        np.arange(n) % 4
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "lang": pa.array(langs, pa.string()),
        }
    )
    ds = rd.from_arrow(tbl).repartition(8)
    rates = {"en": 0.25, "fr": 1.0, "zh": 0.0}
    s1 = (
        stratified_sample(ds, rates=rates, default_rate=0.5, seed=7)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    s2 = (
        stratified_sample(ds, rates=rates, default_rate=0.5, seed=7)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert s1.equals(s2)
    per = s1.groupby("lang").size()
    assert abs(per.get("en", 0) / (n / 4) - 0.25) < 0.02
    assert per.get("fr", 0) == n / 4          # rate 1.0 keeps all
    assert per.get("zh", 0) == 0              # rate 0.0 drops all
    assert abs(per.get("xx", 0) / (n / 4) - 0.5) < 0.02  # default
    # a different seed selects a different (still deterministic) set
    s3 = (
        stratified_sample(ds, rates=rates, default_rate=0.5, seed=8)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert not s1.equals(s3)


def test_mix_rates_quota_math():
    """rate_s = min(1, target_s * fraction * N / N_s); missing target
    strata get 0."""
    from rayslog.stages.sample import mix_rates

    counts = {"en": 600, "fr": 100, "zh": 300}
    rates = mix_rates(counts, {"en": 0.5, "fr": 0.5}, 0.4)
    # N=1000, quota en = 0.5*0.4*1000 = 200 -> 200/600
    assert rates["en"] == pytest.approx(0.5 * 0.4 * 1000 / 600)
    assert rates["fr"] == 1.0          # quota 200 > 100 available
    assert rates["zh"] == 0.0          # not in target


def test_splitmix64_sql_parity():
    """The numpy splitmix64 and its DuckDB expression agree bit-for-bit
    across the key range (the foundation of the sample oracle)."""
    import duckdb

    from rayslog.stages.sample import sample_sql_hash_expr, splitmix64

    ids = np.array(
        [0, 1, 2, 999, 10**6, 2**31, 2**62, 2**63 - 1], dtype=np.uint64
    )
    py = splitmix64(ids, seed=42)
    con = duckdb.connect()
    vals = ", ".join(f"({int(i)})" for i in ids)
    expr = sample_sql_hash_expr("k", 42)
    got = np.array(
        [
            r[0]
            for r in con.sql(
                f"SELECT {expr} FROM (VALUES {vals}) AS t(k) "
            ).fetchall()
        ],
        dtype=np.uint64,
    )
    assert (got == py).all()


def test_dedup_exact_keep_rows_matches_dedup_exact(docs_with_dups):
    """Keep-rows dedup (single shuffle, attributes attached) selects
    exactly dedup_exact's survivor ids."""
    import ray.data as rd

    from rayslog.stages.dedup import dedup_exact, dedup_exact_keep_rows

    ids = set(dedup_exact(docs_with_dups).to_pandas()["doc_id"])
    rows = dedup_exact_keep_rows(docs_with_dups).to_pandas()
    assert set(rows["doc_id"]) == ids
    assert list(rows.columns) == ["doc_id"]
    # with keep_cols, the attributes come from the surviving row
    docs2 = docs_with_dups.map_batches(
        lambda t: t.append_column(
            "mark", pa.array([f"m{int(i)}" for i in t.column("doc_id").to_pylist()])
        ),
        batch_format="pyarrow",
    )
    rows2 = dedup_exact_keep_rows(docs2, keep_cols=["mark"]).to_pandas()
    assert set(rows2["doc_id"]) == ids
    got = dict(zip(rows2["doc_id"], rows2["mark"]))
    assert all(got[i] == f"m{i}" for i in ids)


def test_pack_sequences_global_prefix_sums(ray_session):
    """Distributed packing == the single-machine prefix-sum answer,
    across part boundaries and block splits; bins cover docs in order
    and every bin except possibly the last reaches the budget."""
    import ray.data as rd

    from rayslog.stages.pack import pack_sequences

    rng = np.random.default_rng(13)
    n = 9_000
    texts = [" ".join(["w"] * int(k)) for k in rng.integers(1, 40, n)]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )
    ds = rd.from_arrow(tbl).repartition(7)
    out = (
        pack_sequences(ds, budget=100, chunk=512)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    n_tok = np.array([t.count("w") for t in texts], dtype=np.int64)
    excl = np.cumsum(n_tok) - n_tok
    want = excl // 100
    assert (out["n_tokens"].to_numpy() == n_tok).all()
    assert (out["bin_id"].to_numpy() == want).all()
    # bins are contiguous, start at 0
    bins = out["bin_id"].to_numpy()
    assert bins[0] == 0 and (np.diff(bins) >= 0).all()
    assert set(np.unique(bins)) == set(range(int(bins[-1]) + 1))


def test_approx_heavy_hitters_matches_exact_topk(ray_session):
    """The SpaceSaving-style counter tree returns the EXACT top-k on a
    skewed corpus when capacity >> k, including across many blocks."""
    import ray.data as rd

    from rayslog.stages.sketch import approx_heavy_hitters
    from rayslog.stages.text import bigram_counts_partial, top_ngrams

    rng = np.random.default_rng(17)
    vocab = [f"tok{i}" for i in range(50)]
    # zipf-ish doc mix: heavy bigrams dominate
    texts = [
        " ".join(vocab[int(v) % 50] for v in rng.zipf(1.3, 30))
        for _ in range(4_000)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    ds = rd.from_arrow(tbl).repartition(9)
    exact = top_ngrams(ds, k=10).to_pandas()
    approx = approx_heavy_hitters(
        ds,
        lambda t: bigram_counts_partial(t).rename_columns(["key", "n"]),
        k=10,
        capacity=1_024,
    ).to_pandas()
    assert list(approx["key"]) == list(exact["ngram"])
    assert list(approx["n"]) == list(exact["n"])


def test_resumable_curation(ray_session, tmp_path):
    """Stage A (per-shard filter+hash) resumes: a second run processes
    nothing new; the final curated set equals the single-table
    composition (quality gates -> keep-min dedup -> sample) regardless
    of sharding."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from rayslog.state.checkpoint import run_resumable_curation
    from rayslog.stages.sample import stratified_sample
    from rayslog.stages.dedup import dedup_exact_keep_rows
    from rayslog.stages.text import quality_filter

    rng = np.random.default_rng(23)
    words = [f"w{j}" for j in range(300)]
    n = 900
    texts = []
    for i in range(n):
        if i % 7 == 0 and i > 0:
            texts.append(texts[i - 1])  # planted exact dup
        else:
            texts.append(" ".join(rng.choice(words, size=45, replace=True)))
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en", "fr", "zh"][0:1] * n, pa.string()),
            "source": pa.array([f"s{i%3}" for i in range(n)], pa.string()),
        }
    )
    files = []
    for i in range(3):
        f = tmp_path / f"docs-{i}.parquet"
        pq.write_table(tbl.slice(i * 300, 300), f)
        files.append(str(f))

    gates = {"min_tokens": 10, "max_tokens": 100,
             "min_alpha_ratio": 0.0, "max_top_bigram_share": 1.0}
    rates = {"en": 0.5}
    out = tmp_path / "curated"
    done1, final1 = run_resumable_curation(
        files, str(out), budget_gates=gates, sample_rates=rates, seed=5
    )
    assert len(done1) == 3
    got1 = pq.read_table(final1).to_pandas().sort_values("doc_id")

    # resume: nothing reprocessed, identical final output
    done2, final2 = run_resumable_curation(
        files, str(out), budget_gates=gates, sample_rates=rates, seed=5
    )
    assert done2 == []
    got2 = pq.read_table(final2).to_pandas().sort_values("doc_id")
    assert got1.reset_index(drop=True).equals(got2.reset_index(drop=True))

    # equivalence with the unsharded composition
    ds = rd.from_arrow(tbl)
    want = (
        stratified_sample(
            dedup_exact_keep_rows(
                quality_filter(ds, **gates), keep_cols=["lang", "source"]
            ),
            strata_col="lang", rates=rates, default_rate=0.5, seed=5,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert set(got1["doc_id"]) == set(want["doc_id"])
    # dups were actually dropped before sampling
    n_dups = sum(1 for i in range(n) if i % 7 == 0 and i > 0)
    assert n_dups > 0


def test_render_3164_roundtrip(ray_session):
    """parse(render(x)) reproduces x's parsed fields on every cleanly
    parsed 3164 row of the generated corpus (canonicalization is
    lossy on raw bytes — '[pid]:' tags collapse — but field-exact)."""
    import pandas as pd
    import ray.data as rd

    from rayslog.pipeline import parsed_dataset
    from rayslog.stages.parse import parse_dataset
    from rayslog.stages.text import render_rfc3164
    from rayslog.config import DEFAULT_CONFIG

    import pyarrow.compute as pc

    ds = parsed_dataset("/root/testdata/sf0.001")

    def fn(t):
        t = t.filter(
            pc.and_(
                pc.equal(t.column("rfc"), 1),
                pc.is_null(t.column("parse_error")),
            )
        )
        return render_rfc3164(t)

    rendered = ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
    keep = ["conv_id", "turn_idx", "priority", "facility", "severity",
            "ts_parsed", "hostname", "tag", "content"]
    first = rendered.select_columns(keep + ["rendered"]).to_pandas()
    assert len(first) > 300

    reparsed = (
        parse_dataset(
            rd.from_pandas(
                first[["conv_id", "turn_idx", "rendered"]].rename(
                    columns={"rendered": "text"}
                )
            ),
            DEFAULT_CONFIG,
        )
        .to_pandas()
    )
    assert reparsed["parse_error"].isna().all()
    merged = first.merge(
        reparsed[keep], on=["conv_id", "turn_idx"], suffixes=("", "_rt")
    )
    assert len(merged) == len(first)
    for c in ["priority", "facility", "severity", "hostname", "tag",
              "content", "ts_parsed"]:
        pd.testing.assert_series_equal(
            merged[c], merged[f"{c}_rt"], check_names=False
        )


def test_grouped_top_k_matches_pandas_rank(ray_session):
    """grouped_top_k == row_number() OVER (PARTITION BY g ORDER BY v
    DESC, id) <= k, on skewed data with heavy value ties across many
    partitions (exercises the per-batch top-k + tree combine)."""
    import pandas as pd
    import ray.data as rd

    from rayslog.stages.aggregate import grouped_top_k

    rng = np.random.default_rng(11)
    n = 50_000
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 23, n).astype(str),
            "v": rng.integers(0, 40, n),   # heavy ties
            "id": np.arange(n, dtype=np.int64),
        }
    )
    ds = rd.from_pandas(df).repartition(16)
    got = (
        grouped_top_k(ds, "g", "v", "id", k=7, batch_size=1_024)
        .to_pandas()
        .sort_values(["g", "rank"])
        .reset_index(drop=True)
    )
    exp = df.sort_values(
        ["g", "v", "id"], ascending=[True, False, True]
    ).copy()
    exp["rank"] = exp.groupby("g").cumcount() + 1
    exp = exp[exp["rank"] <= 7].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["g", "v", "id", "rank"]].astype({"rank": "int64"}),
        exp[["g", "v", "id", "rank"]].astype({"rank": "int64"}),
    )

    # k larger than any group: every row comes back, ranked
    tiny = rd.from_arrow(
        pa.table({"g": ["a", "a", "b"], "v": [1, 2, 3],
                  "id": [10, 11, 12]})
    )
    allrows = grouped_top_k(tiny, "g", "v", "id", k=100).to_pandas()
    assert len(allrows) == 3
    assert set(allrows["rank"]) <= {1, 2}

    # empty input keeps the schema contract
    empty = rd.from_arrow(
        pa.table({"g": pa.array([], pa.string()),
                  "v": pa.array([], pa.int64()),
                  "id": pa.array([], pa.int64())})
    )
    out = grouped_top_k(empty, "g", "v", "id", k=3)
    assert out.count() == 0
    assert out.schema().names == ["g", "v", "id", "rank"]


@pytest.mark.parametrize("final", ["tree", "shuffle"])
def test_distinct_count_by_null_semantics(ray_session, final):
    """count(DISTINCT value): null values dropped, null group keys form
    a group (DuckDB GROUP BY semantics); tree and shuffle plans agree."""
    import pandas as pd
    import ray.data as rd

    from rayslog.stages.aggregate import distinct_count_by

    t = pa.table(
        {
            "g": ["a", "a", "a", "b", "b", None, None],
            "v": [1, 1, 2, None, 7, 7, 9],
        }
    )
    ds = rd.from_arrow(t).repartition(3)
    got = (
        distinct_count_by(ds, "g", "v", final=final)
        .to_pandas()
        .sort_values("g", na_position="last")
        .reset_index(drop=True)
    )
    exp = pd.DataFrame(
        {"g": ["a", "b", None], "n_distinct": [2, 1, 2]}
    )
    pd.testing.assert_frame_equal(
        got.astype({"n_distinct": "int64"}), exp.astype({"n_distinct": "int64"})
    )


def test_dup_span_stats_planted(ray_session):
    """Hand-built corpus: a shared 4-gram counts as duplicated for all
    docs carrying it; docs with <4 tokens yield no row; fully-unique
    docs report dup_frac 0."""
    import ray.data as rd

    from rayslog.stages.decontam import dup_span_stats

    rows = [
        # docs 0 and 1 share exactly the span "w x y z" (one 4-gram each
        # amid otherwise-unique grams)
        {"doc_id": 0, "text": "a0 b0 w x y z c0 d0"},
        {"doc_id": 1, "text": "a1 b1 w x y z c1 d1"},
        # doc 2: all grams unique
        {"doc_id": 2, "text": "p q r s t u"},
        # doc 3: too short — no row
        {"doc_id": 3, "text": "one two three"},
        # doc 4: exact copy of doc 2 — every gram duplicated
        {"doc_id": 4, "text": "p q r s t u"},
    ]
    got = (
        dup_span_stats(rd.from_items(rows).repartition(3), n=4, parts=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got["doc_id"]) == [0, 1, 2, 4]
    # docs 0/1: 5 grams, exactly one shared
    assert list(got["n_grams"][:2]) == [5, 5]
    assert list(got["n_dup_grams"][:2]) == [1, 1]
    # docs 2/4: 3 grams each, all duplicated via the exact copy
    assert list(got["n_grams"][2:]) == [3, 3]
    assert list(got["n_dup_grams"][2:]) == [3, 3]
    assert np.allclose(got["dup_frac"], [0.2, 0.2, 1.0, 1.0])


def test_inverted_index_prunes_and_matches(ray_session, tmp_path):
    """The persisted inverted index returns exactly the per-doc
    distinct postings, and a lookup's file listing is pruned to the
    probed tokens' buckets only."""
    import ray.data as rd

    from rayslog.stages.invindex import (
        InvertedIndex,
        _token_buckets,
        build_inverted_index,
    )

    rows = [
        {"doc_id": 0, "text": "Alpha beta beta GAMMA"},
        {"doc_id": 1, "text": "beta delta"},
        {"doc_id": 2, "text": "epsilon zeta alpha alpha"},
        {"doc_id": 3, "text": ""},
    ]
    ds = rd.from_items(rows).repartition(2)
    idx = build_inverted_index(
        ds, str(tmp_path / "inv"), n_buckets=8
    )

    got = (
        idx.lookup(["ALPHA", "beta"])
        .to_pandas()
        .sort_values(["token", "doc_id"])
        .reset_index(drop=True)
    )
    assert list(zip(got["token"], got["doc_id"])) == [
        ("alpha", 0), ("alpha", 2), ("beta", 0), ("beta", 1),
    ]

    # pruning: the probed dataset's files all live in the probe buckets
    import pyarrow as pa_

    probed = set(
        _token_buckets(pa_.array(["alpha", "beta"]), 8).tolist()
    )
    files = idx.postings_dataset(probed).input_files()
    assert files, "probed buckets must have files"
    assert all(f"bucket={b}" in f for f in files
               for b in [int(f.split("bucket=")[1].split("/")[0])])
    assert {int(f.split("bucket=")[1].split("/")[0]) for f in files} <= probed
    all_files = InvertedIndex(str(tmp_path / "inv")).postings_dataset(
        range(8)
    ).input_files()
    assert len(files) < len(all_files)

    # rebuild into the same dir is atomic (no duplicate postings)
    build_inverted_index(ds, str(tmp_path / "inv"), n_buckets=8)
    again = InvertedIndex(str(tmp_path / "inv")).lookup(["beta"]).to_pandas()
    assert sorted(again["doc_id"]) == [0, 1]


def test_funnel_counts_ordering_semantics(ray_session):
    """Stepwise funnel: stages must occur strictly AFTER the first
    completion of the prefix; ties and out-of-order completions don't
    advance."""
    import datetime as dt

    import ray.data as rd

    from rayslog.stages.events import funnel_counts

    t0 = dt.datetime(2025, 1, 1)

    def ev(u, typ, sec):
        return {
            "user_id": u,
            "event_type": typ,
            "ts": t0 + dt.timedelta(seconds=sec),
        }

    rows = [
        # user 1: view -> click -> purchase, in order (counts everywhere)
        ev(1, "view", 0), ev(1, "click", 10), ev(1, "purchase", 20),
        # user 2: click BEFORE view only (view counts, click doesn't)
        ev(2, "click", 0), ev(2, "view", 10),
        # user 3: click at the SAME instant as the first view (strict >)
        ev(3, "view", 0), ev(3, "click", 0),
        # user 4: purchase before the qualifying click
        ev(4, "view", 0), ev(4, "purchase", 5), ev(4, "click", 10),
        # user 5: never views (invisible to the funnel)
        ev(5, "click", 0), ev(5, "purchase", 1),
    ]
    out = (
        funnel_counts(rd.from_items(rows).repartition(3))
        .to_pandas()
        .set_index("stage")["n_users"]
    )
    assert out["view"] == 4       # users 1-4
    assert out["click"] == 2      # users 1 and 4
    assert out["purchase"] == 1   # user 1 only


def test_kll_sketch_rank_error_and_merge(ray_session):
    """The mergeable quantile sketch stays within ~2% rank error of
    the exact quantiles on a skewed distribution, both single-node and
    through the distributed merge tree."""
    import ray.data as rd

    from rayslog.stages.sketch import KllSketch, approx_quantiles

    rng = np.random.default_rng(5)
    vals = rng.lognormal(mean=2.0, sigma=1.2, size=200_000)
    svals = np.sort(vals)
    n = len(vals)

    def true_rank(x):
        return np.searchsorted(svals, x) / n

    # driver-side: one sketch
    sk = KllSketch(k=512)
    sk.add_many(vals)
    for q in (0.5, 0.95, 0.99):
        assert abs(true_rank(sk.quantile(q)) - q) < 0.02, q

    # distributed: sketch-per-batch + combiner tree
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(16)
    out = (
        approx_quantiles(ds, "v", quantiles=(0.5, 0.95, 0.99))
        .to_pandas()
        .set_index("q")["value"]
    )
    for q, lbl in [(0.5, "p50"), (0.95, "p95"), (0.99, "p99")]:
        assert abs(true_rank(out[lbl]) - q) < 0.02, (q, out[lbl])

    # merge is weight-preserving
    a, b = KllSketch(64), KllSketch(64)
    a.add_many(vals[:1000]); b.add_many(vals[1000:2000])
    m = a.merge(b)
    assert m.count == 2000


def test_phrase_search_positions(ray_session, tmp_path):
    """Positional phrase matching: adjacency required in order,
    multi-token phrases chain, occurrence counts are exact."""
    import ray.data as rd

    from rayslog.stages.invindex import build_inverted_index, phrase_search

    rows = [
        # two occurrences of "a b c"
        {"doc_id": 0, "text": "a b c x a b c"},
        # tokens present but never adjacent in order
        {"doc_id": 1, "text": "a x b y c"},
        # reversed order only
        {"doc_id": 2, "text": "c b a"},
        # one occurrence, phrase at the end
        {"doc_id": 3, "text": "z z a b c"},
    ]
    idx = build_inverted_index(
        rd.from_items(rows).repartition(2), str(tmp_path / "pinv"),
        n_buckets=4,
    )
    got = (
        phrase_search(idx, ["a", "b", "c"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(zip(got["doc_id"], got["n_occurrences"])) == [(0, 2), (3, 1)]

    # no match at all -> typed empty result (to_pandas drops schema on
    # 0-row datasets, so assert on the Dataset itself)
    none = phrase_search(idx, ["a", "z"])
    assert none.count() == 0
    assert none.schema().names == ["doc_id", "n_occurrences"]


def test_grouped_kll_tracks_exact_quantiles(ray_session):
    """Per-group KLL sketches stay within ~2.5% rank error of each
    group's exact quantiles."""
    import pandas as pd
    import ray.data as rd

    from rayslog.stages.sketch import grouped_approx_quantiles

    rng = np.random.default_rng(13)
    frames = []
    for gi, (mu, n) in enumerate([(1.0, 60_000), (2.5, 30_000), (0.5, 9_000)]):
        frames.append(pd.DataFrame({
            "g": f"g{gi}",
            "v": rng.lognormal(mean=mu, sigma=1.0, size=n),
        }))
    df = pd.concat(frames, ignore_index=True).sample(frac=1.0, random_state=0)
    ds = rd.from_pandas(df).repartition(12)
    got = (
        grouped_approx_quantiles(ds, "g", "v", quantiles=(0.5, 0.95))
        .to_pandas()
    )
    assert len(got) == 6
    for gi in range(3):
        sv = np.sort(df[df["g"] == f"g{gi}"]["v"].to_numpy())
        for q, lbl in [(0.5, "p50"), (0.95, "p95")]:
            est = float(got[(got["g"] == f"g{gi}") & (got["q"] == lbl)]["value"])
            rank = np.searchsorted(sv, est) / len(sv)
            assert abs(rank - q) < 0.025, (gi, lbl, rank)


def test_resumable_pack_job(ray_session, tmp_path):
    """Stage-A resume + bins identical to the one-shot pack_sequences
    (the global prefix sum is partition-layout independent)."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    from rayslog import pipeline as p
    from rayslog.state.checkpoint import partition_id, run_resumable_pack

    sf = "/root/testdata/sf0.001"
    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"])
    in_a = tmp_path / "in_a.parquet"
    in_b = tmp_path / "in_b.parquet"
    half = docs.num_rows // 2
    pq.write_table(docs.slice(0, half), in_a)
    pq.write_table(docs.slice(half), in_b)
    out = tmp_path / "out"

    done, final = run_resumable_pack([str(in_a), str(in_b)], str(out))
    assert set(done) == {partition_id(str(in_a)), partition_id(str(in_b))}
    bins = (
        rd.read_parquet(f"{final}/")
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    oneshot = (
        p.q_pack_sequences(sf)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        bins[sorted(bins.columns)], oneshot[sorted(oneshot.columns)],
        check_exact=True,
    )

    # rerun: no partition reprocessed, stage B rewritten deterministically
    done2, final2 = run_resumable_pack([str(in_a), str(in_b)], str(out))
    assert done2 == []
    bins2 = (
        rd.read_parquet(f"{final2}/")
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(bins, bins2, check_exact=True)
