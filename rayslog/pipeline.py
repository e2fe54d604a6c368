"""End-to-end pipelines: read → parse → enrich → route → aggregate.

Every query below is a lazy Ray Data pipeline over the transcripts
Parquet; consumption (write/aggregate/to_pandas) drives the streaming
executor.  Columns are pruned at the read; filters/selects are
vectorized Arrow predicates inside ``map_batches``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from rayslog.config import DEFAULT_CONFIG, ParserConfig
from rayslog.sources.testgen import transcripts_path
from rayslog.stages.aggregate import counts_by, parsed_only
from rayslog.stages.enrich import enrich_dataset
from rayslog.stages.parse import parse_dataset

PARSE_3164_COLS = [
    "conv_id", "turn_idx", "priority", "facility", "severity",
    "ts_parsed", "hostname", "tag", "content",
]
PARSE_5424_COLS = [
    "conv_id", "turn_idx", "priority", "facility", "severity", "version",
    "ts_parsed", "tz_offset_minutes", "hostname", "app_name", "proc_id",
    "msg_id", "structured_data", "message",
]


def read_transcripts(sf_dir: str, columns: list[str] | None = None):
    """Read the transcripts cache with row-targeted block sizing.

    Ray's default targets ~200 read output blocks regardless of table
    size, inserting a SplitBlocks that fragments small tables into
    ~9k-row blocks; one block per file (150k rows ≈ 15 MB) measured
    1.5x faster end-to-end at sf0.1 (5.0M vs 3.3M rows/s at 32 CPUs on
    9.6M rows).  Do NOT pass override_num_blocks above n_files to
    smooth stragglers: it splits ReadParquet into its own operator and
    the raw text column then crosses the object store between read and
    parse (measured r5: 8.3s -> 10.4s at sf12.8/16cpu).  Task
    granularity is controlled at the SOURCE instead — the generator
    caps part files at ~400k rows (testgen PART_ROWS_MAX) so big
    tables get more, smaller files and read->parse stays fused 1:1."""
    import glob

    import ray.data as rd

    path = transcripts_path(sf_dir)
    n_files = len(glob.glob(f"{path}/*.parquet"))
    kwargs = {"columns": columns}
    if n_files >= 8:
        kwargs["override_num_blocks"] = n_files
    return rd.read_parquet(path, **kwargs)


def parsed_dataset(
    sf_dir: str,
    columns: tuple[str, ...] = ("conv_id", "turn_idx", "text"),
    cfg: ParserConfig = DEFAULT_CONFIG,
):
    ds = read_transcripts(sf_dir, list(columns))
    return parse_dataset(ds, cfg)


def _filter_select(ds, predicate_fn, columns: list[str]):
    def fn(t: pa.Table) -> pa.Table:
        return t.filter(predicate_fn(t)).select(columns)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def q_parse_3164(sf_dir: str):
    """All cleanly-parsed RFC3164 turns with the reference's 7 Dump fields."""
    ds = parsed_dataset(sf_dir)
    return _filter_select(
        ds,
        lambda t: pc.and_(
            pc.equal(t.column("rfc"), 1), pc.is_null(t.column("parse_error"))
        ),
        PARSE_3164_COLS,
    )


def q_parse_5424(sf_dir: str):
    """All cleanly-parsed RFC5424 turns with the reference's 11 Dump fields."""
    ds = parsed_dataset(sf_dir)
    return _filter_select(
        ds,
        lambda t: pc.and_(
            pc.equal(t.column("rfc"), 2), pc.is_null(t.column("parse_error"))
        ),
        PARSE_5424_COLS,
    )


def q_severity_counts(sf_dir: str):
    """Per-severity turn counts over cleanly-parsed rows (router parity)."""
    ds = parsed_only(parsed_dataset(sf_dir))
    return counts_by(ds, ["severity"], alias="n_turns", final="driver")


def q_conv_counts(sf_dir: str):
    """Per-conversation parsed-turn counts (skew-bearing aggregate).

    Default final is the raw-task combiner tree (distinct convs <<
    turns; zero sort-shuffle machinery); set RAYSLOG_CONV_FINAL=shuffle
    to A/B the plain hash-shuffle aggregate plan."""
    import os

    ds = parsed_only(parsed_dataset(sf_dir))
    final = os.environ.get("RAYSLOG_CONV_FINAL", "tree")
    return counts_by(ds, ["conv_id"], alias="n_turns", final=final)


def q_parse_errors(sf_dir: str):
    """Counts per canonical parse_error string."""
    ds = parsed_dataset(sf_dir, columns=("conv_id", "turn_idx", "text"))
    errs = ds.map_batches(
        lambda t: t.filter(pc.is_valid(t.column("parse_error"))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return counts_by(errs, ["parse_error"], alias="n_turns", final="driver")


def q_route_sinks(sf_dir: str):
    """Routed-row parity: per-(severity, rfc) sink row counts."""
    ds = parsed_only(parsed_dataset(sf_dir))
    return counts_by(ds, ["severity", "rfc"], alias="n_rows", final="driver")


def q_enrich_route(sf_dir: str):
    """Parsed turns enriched with role/tool lookups + routing key."""
    ds = parsed_dataset(
        sf_dir, columns=("conv_id", "turn_idx", "role", "tool", "text")
    )
    ds = enrich_dataset(ds)
    return _filter_select(
        ds,
        lambda t: pc.is_null(t.column("parse_error")),
        [
            "conv_id", "turn_idx", "severity", "rfc",
            "role_code", "role_class", "tool_code", "tool_family",
        ],
    )


def q_hourly_traffic(sf_dir: str):
    """Per-(facility, hour-of-day) parsed-turn counts (window-style agg)."""
    ds = parsed_only(parsed_dataset(sf_dir))

    def add_hour(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("ts_parsed")))
        return t.append_column(
            "hour", pc.cast(pc.hour(t.column("ts_parsed")), pa.int32())
        )

    ds = ds.map_batches(add_hour, batch_format="pyarrow", zero_copy_batch=True)
    return counts_by(ds, ["facility", "hour"], alias="n_turns", final="driver")


def q_conv_assemble(sf_dir: str):
    """Training-sample assembly over the transcripts: one document per
    conversation — turns joined by newline in turn order, plus the
    turn count (stages/pack.py:assemble_conversations; the step before
    pack_sequences/shuffle_shards in a transcript-training run)."""
    from rayslog.sources.testgen import rows_for
    from rayslog.stages.pack import assemble_conversations

    ds = read_transcripts(sf_dir, ["conv_id", "turn_idx", "text"])
    # ~1.2k turns/conv: size parts so one part's text stays ~10s of MB
    n_rows = rows_for(sf_dir)
    return assemble_conversations(
        ds, parts=max(16, min(4096, -(-n_rows // 500_000)))
    )


def q_conv_windows(sf_dir: str):
    """Multi-turn context windows over the transcripts: 8-turn windows
    every 4 turns per conversation, joined by newline — the
    overlapping-context training-sample shape
    (stages/pack.py:conversation_windows)."""
    from rayslog.sources.testgen import rows_for
    from rayslog.stages.pack import conversation_windows

    ds = read_transcripts(sf_dir, ["conv_id", "turn_idx", "text"])
    n_rows = rows_for(sf_dir)
    return conversation_windows(
        ds, k=8, stride=4,
        parts=max(16, min(4096, -(-n_rows // 500_000))),
    )


def q_assistant_spans(sf_dir: str):
    """SFT loss-mask offsets: [start_char, end_char) of every
    assistant turn inside its conversation's assembled document — a
    distributed grouped prefix sum
    (stages/pack.py:assistant_char_spans)."""
    from rayslog.sources.testgen import rows_for
    from rayslog.stages.pack import assistant_char_spans

    ds = read_transcripts(sf_dir, ["conv_id", "turn_idx", "text", "role"])
    n_rows = rows_for(sf_dir)
    return assistant_char_spans(
        ds, parts=max(16, min(4096, -(-n_rows // 500_000)))
    )


def q_traffic_rollup(sf_dir: str):
    """Multi-level aggregate — ``GROUP BY ROLLUP(facility, hour)``:
    leaf (facility, hour) counts plus per-facility subtotals and the
    grand total, with NULL keys marking rolled-up levels (the SQL
    convention).  The leaf aggregation is the distributed combiner
    tree; the rollup levels are derived from the reduced leaf block
    itself (bounded domain: facilities x 24), so no extra pass over
    the corpus."""
    from rayslog.stages.aggregate import counts_by

    ds = parsed_only(parsed_dataset(sf_dir))

    def add_hour(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("ts_parsed")))
        return t.append_column(
            "hour", pc.cast(pc.hour(t.column("ts_parsed")), pa.int32())
        )

    ds = ds.map_batches(add_hour, batch_format="pyarrow", zero_copy_batch=True)
    leaf = counts_by(ds, ["facility", "hour"], alias="n_turns", final="tree")

    def rollup(t: pa.Table) -> pa.Table:
        sub = (
            t.select(["facility", "n_turns"])
            .group_by(["facility"])
            .aggregate([("n_turns", "sum")])
            .rename_columns(["facility", "n_turns"])
        )
        fac_t = t.schema.field("facility").type
        hr_t = t.schema.field("hour").type
        sub = pa.table(
            {
                "facility": sub.column("facility"),
                "hour": pa.nulls(len(sub), hr_t),
                "n_turns": sub.column("n_turns"),
            }
        )
        total = pa.table(
            {
                "facility": pa.nulls(1, fac_t),
                "hour": pa.nulls(1, hr_t),
                "n_turns": pa.array(
                    [pc.sum(t.column("n_turns")).as_py()], pa.int64()
                ),
            }
        )
        return pa.concat_tables(
            [t.select(["facility", "hour", "n_turns"]), sub, total]
        )

    # the reduced leaf is ONE block (tree output): batch_size=None
    # keeps whole-block batches, so the rollup sees every leaf row
    return leaf.map_batches(
        rollup, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )


def q_conv_error_rate(sf_dir: str):
    """Per-conversation parse health: total turns, parse-error turns
    and the error rate — the ops-dashboard rollup of the parse stage.
    One pass, per-batch (conv, sum, count) combiner, tree final; the
    rate is the IEEE division of the two int sums (order-independent,
    matches the SQL oracle bit-for-bit)."""
    from rayslog.stages.aggregate import tree_aggregate

    ds = parsed_dataset(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        err = pc.cast(pc.is_valid(t.column("parse_error")), pa.int64())
        part = (
            pa.table({"conv_id": t.column("conv_id"), "e": err})
            .group_by(["conv_id"])
            .aggregate([("e", "sum"), ([], "count_all")])
        )
        return part.rename_columns(["conv_id", "n_errors", "n_turns"])

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    tot = tree_aggregate(
        parts,
        ["conv_id"],
        [("n_errors", "sum"), ("n_turns", "sum")],
        ["n_errors", "n_turns"],
        split_keys=["conv_id"],  # unbounded key domain (r5 auto-split)
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": t.column("conv_id"),
                "n_turns": pc.cast(t.column("n_turns"), pa.int64()),
                "n_errors": t.column("n_errors"),
                "error_rate": pc.divide(
                    pc.cast(t.column("n_errors"), pa.float64()),
                    pc.cast(t.column("n_turns"), pa.float64()),
                ),
            }
        )

    return tot.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


def flagship(sf_dir: str):
    """The headline parse→enrich→aggregate pipeline (driver smoke check)."""
    return q_severity_counts(sf_dir)


# ---------------------------------------------------------------------------
# training-data-pipeline operators (documents / embeddings / events tables)
# ---------------------------------------------------------------------------

def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def q_dedup_incremental(sf_dir: str):
    """Incremental exact dedup: a synthetic "new drop" arrives against
    the committed even-doc_id half of documents.  The drop = all odd
    docs + a RE-CRAWL of every doc_id%4==0 doc (same text, new id
    +10^6 — must die against the committed corpus) + a RE-SUBMIT of
    every doc_id%8==7 doc (new id +2*10^6 — must die within the batch).
    Survivors = first-of-text within the drop AND absent from the
    committed side (distributed anti hash join on 8-byte content
    keys); the oracle reconstructs the identical drop in SQL."""
    import pyarrow.compute as pc_

    from rayslog.stages.dedup import dedup_incremental

    def _slice(t: pa.Table, mod: int, rem: int, id_shift: int) -> pa.Table:
        keep = pc_.equal(
            pc_.bit_wise_and(t.column("doc_id"),
                             pa.scalar(mod - 1, pa.int64())),
            pa.scalar(rem, pa.int64()),
        )
        t = t.filter(keep)
        return pa.table(
            {
                "doc_id": pc_.add(
                    t.column("doc_id"), pa.scalar(id_shift, pa.int64())
                ),
                "text": t.column("text"),
            }
        )

    # the drop's three slices come from the SAME table — build them
    # per batch in ONE read+map (a 3-way Dataset.union would run three
    # separate read pipelines and triple the fixed executor overhead)
    def drop_fn(t: pa.Table) -> pa.Table:
        return pa.concat_tables(
            [
                _slice(t, 2, 1, 0),
                _slice(t, 4, 0, 1_000_000),
                _slice(t, 8, 7, 2_000_000),
            ]
        )

    new_drop = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        drop_fn, batch_format="pyarrow", zero_copy_batch=True
    )
    committed = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        lambda t: _slice(t, 2, 0, 0),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return dedup_incremental(new_drop, committed)


def q_dedup_exact(sf_dir: str):
    """Exact dedup: keep min doc_id per distinct text.

    Uses the bounded-parts keep-rows plan (hash-partitioned shuffle +
    vectorized run detection) rather than dedup_exact's full (h1, h2)
    sort — same survivors, ~0.4s less sort machinery at sf0.1; both
    forms are proven equal in tests."""
    from rayslog.stages.dedup import dedup_exact_keep_rows, tuned_bucket_parts

    parts = max(32, tuned_bucket_parts(_table_rows(sf_dir, "documents")))
    return dedup_exact_keep_rows(
        _read(sf_dir, "documents", ["doc_id", "text"]), parts=parts
    )


def q_text_quality(sf_dir: str):
    """Per-document quality features."""
    from rayslog.stages.text import quality_features

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda t: quality_features(t).drop_columns(["text"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_normalize_text(sf_dir: str):
    """Canonical normalization pass (NFC + lower + whitespace collapse
    + trim) — one shuffle-free map; oracle-checked against DuckDB's
    nfc_normalize/lower/regexp_replace chain."""
    from rayslog.stages.text import normalize_text

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda t: normalize_text(t).drop_columns(["text"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_token_counts(sf_dir: str):
    """Whitespace + BPE-ish token counts per document."""
    from rayslog.stages.text import token_counts

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda t: token_counts(t).drop_columns(["text"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_lang_id(sf_dir: str):
    """Heuristic language ID (stopword-hit voting); ORACLE-CHECKED —
    the SQL mirrors the same stopword-list scoring."""
    from rayslog.stages.text import langid_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    return ds.map_batches(
        langid_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).select_columns(["doc_id", "lang", "lang_pred"])


def q_render_3164(sf_dir: str):
    """Canonical RFC3164 re-rendering of every cleanly-parsed 3164 turn
    (the normalization stage: parse -> render rewrites logs into
    canonical form; parse(render(x)) == x's fields, tested)."""
    from rayslog.stages.text import render_rfc3164

    ds = parsed_dataset(sf_dir)

    def fn(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.equal(t.column("rfc"), 1),
                pc.is_null(t.column("parse_error")),
            )
        )
        return render_rfc3164(t).select(["conv_id", "turn_idx", "rendered"])

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def q_repetition(sf_dir: str):
    """Gopher/C4-style repetition metrics per document (dup-line /
    dup-paragraph fractions, top-bigram share)."""
    from rayslog.stages.text import repetition_features

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda t: repetition_features(t).drop_columns(["text"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=8_192,  # bounds the O(total-token) bigram temporaries
    )


#: decontamination parameters shared by the Ray query AND its SQL
#: oracle: strict n-token grams, eval set = doc_id % DECON_EVAL_MOD == 0
DECON_N = 4
DECON_EVAL_MOD = 50


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: non-eval docs sharing >= 1 distinct
    4-token-gram with the eval subset, with the distinct-shared-gram
    count per doc.  Eval gram keys broadcast once via ray.put; the
    training pass is shuffle-free (stages/decontam.py docstring)."""
    import ray

    from rayslog.stages.decontam import decontaminate, eval_gram_keys

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    keys = eval_gram_keys(ds, n=DECON_N, eval_mod=DECON_EVAL_MOD)
    flagged = decontaminate(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        ray.put(keys),
        n=DECON_N,
        eval_mod=DECON_EVAL_MOD,
    )
    return flagged.sort("doc_id")


def q_decontam_survivors(sf_dir: str):
    """The clean corpus a decontamination run actually ships: non-eval
    docs with ZERO shared eval grams — the flagged set from
    ``decontaminate`` removed via the partitioned hash ANTI join (the
    large-side complement; no broadcast of the drop set)."""
    import ray

    from rayslog.stages.decontam import decontaminate, eval_gram_keys
    from rayslog.stages.relational import hash_join

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    keys = eval_gram_keys(ds, n=DECON_N, eval_mod=DECON_EVAL_MOD)
    flagged = decontaminate(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        ray.put(keys),
        n=DECON_N,
        eval_mod=DECON_EVAL_MOD,
    ).select_columns(["doc_id"])

    docs = _read(sf_dir, "documents", ["doc_id", "lang"])

    def non_eval(t: pa.Table) -> pa.Table:
        import numpy as np

        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array((ids % DECON_EVAL_MOD) != 0))

    pool = docs.map_batches(
        non_eval, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_join(pool, flagged, key="doc_id", how="anti")


#: training-shard shuffle parameters shared by the Ray query AND its
#: SQL oracle
SHARD_SIZE = 100
SHARD_SEED = 7


def q_shuffle_shards(sf_dir: str):
    """Deterministic global shuffle into fixed-size training shards:
    (doc_id, shard, pos) under the seeded splitmix64 permutation
    (stages/shard.py docstring for the distributed-rank plan)."""
    from rayslog.stages.shard import shuffle_shards

    ds = _read(sf_dir, "documents", ["doc_id"])
    return shuffle_shards(ds, shard_size=SHARD_SIZE, seed=SHARD_SEED).sort(
        "doc_id"
    )


#: stratified-sample rates shared by the Ray query AND its SQL oracle —
#: downsample the dominant language, keep rare ones nearly whole
SAMPLE_RATES = {"en": 0.25, "zh": 0.9}
SAMPLE_DEFAULT_RATE = 0.5
SAMPLE_SEED = 42

# domain-mix rebalance: uniform language target over 60% of the corpus
MIX_TARGET = {"de": 0.2, "en": 0.2, "es": 0.2, "fr": 0.2, "zh": 0.2}
MIX_FRACTION = 0.6
MIX_SEED = 7


def q_domain_mix(sf_dir: str):
    """Rebalance the skewed language mix to a uniform target: one tiny
    counts pass (lang domain is bounded by construction, ISO-639-size
    — the counts_by driver-final rule), derive per-stratum keep rates
    (quota/N_s), then the same deterministic splitmix64-threshold
    sample as stratified_sample — one streaming pass, no shuffle."""
    from rayslog.stages.aggregate import counts_by
    from rayslog.stages.sample import mix_rates, stratified_sample

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "source"])
    cdf = counts_by(ds, ["lang"], alias="n", final="driver").to_pandas()
    counts = dict(zip(cdf["lang"], (int(x) for x in cdf["n"])))
    rates = mix_rates(counts, MIX_TARGET, MIX_FRACTION)
    return stratified_sample(
        ds,
        strata_col="lang",
        rates=rates,
        default_rate=0.0,
        seed=MIX_SEED,
    )


def q_stratified_sample(sf_dir: str):
    """Deterministic per-language sample: keep iff
    splitmix64(doc_id, seed) < rate(lang) * 2^64 — reproducible across
    runs and exactly SQL-checkable."""
    from rayslog.stages.sample import stratified_sample

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "source"])
    return stratified_sample(
        ds,
        strata_col="lang",
        rates=SAMPLE_RATES,
        default_rate=SAMPLE_DEFAULT_RATE,
        seed=SAMPLE_SEED,
    )


#: quality-gate thresholds shared by the Ray query AND its SQL oracle
QUALITY_GATES = {
    "min_tokens": 30,
    "max_tokens": 90,
    "min_alpha_ratio": 0.5,
    "max_top_bigram_share": 0.10,
}


def q_quality_filter(sf_dir: str):
    """Documents passing the composed quality gates (length window +
    alpha ratio + repetition cap); returns surviving doc_ids."""
    from rayslog.stages.text import quality_filter

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return quality_filter(ds, **QUALITY_GATES).select_columns(["doc_id"])


def q_redact_pii(sf_dir: str):
    """Transcript text with IPv4s -> [ip] and bracketed pids -> [pid]
    (log-scrubbing stage over the syslog corpus, which contains both)."""
    from rayslog.stages.text import redact_pii

    ds = read_transcripts(sf_dir, ["conv_id", "turn_idx", "text"])
    return ds.map_batches(
        lambda t: redact_pii(t).drop_columns(["text"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_top_ngrams(sf_dir: str):
    """Corpus-wide top-20 token bigrams with counts."""
    from rayslog.stages.text import top_ngrams

    return top_ngrams(_read(sf_dir, "documents", ["doc_id", "text"]), k=20)


def q_doc_freq(sf_dir: str):
    """Top-20 tokens by document frequency (the IDF denominator)."""
    from rayslog.stages.text import doc_freq

    return doc_freq(_read(sf_dir, "documents", ["doc_id", "text"]), k=20)


def q_approx_quantiles_by_lang(sf_dir: str):
    """Approximate per-language token-count quantiles via one KLL
    sketch per group (sketch.grouped_approx_quantiles) — the
    mergeable-sketch companion to the exact grouped inverse-CDF.

    Oracle-checked since r5 (approx_top_ngrams trick): k=4096 exceeds
    every per-group count at driver scale (sf0.01 documents = 500
    rows), so the sketches never compact and the per-group quantile
    rule is exactly "the rank-ceil(q*n_g) element" — spelled in SQL
    (sqloracle ``approx_quantiles_by_lang``).  Past that corpus size
    compaction engages; accuracy is pinned by the grouped rank-error
    pytest."""
    from rayslog.stages.sketch import grouped_approx_quantiles

    ds = _read(sf_dir, "documents", ["text", "lang"])

    def n_tok(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": t.column("lang"),
                "n_tokens": pc.cast(
                    pc.count_substring_regex(t.column("text"), r"\S+"),
                    pa.float64(),
                ),
            }
        )

    feats = ds.map_batches(n_tok, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_approx_quantiles(
        feats, "lang", "n_tokens", quantiles=(0.5, 0.95), k=4_096
    )


def q_token_quantiles_by_lang(sf_dir: str):
    """Exact p50/p95 of per-doc token counts per language (grouped
    inverse-CDF over the integer token-count domain)."""
    from rayslog.stages.aggregate import grouped_quantiles_int

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def n_tok(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": t.column("lang"),
                "n_tokens": pc.cast(
                    pc.count_substring_regex(t.column("text"), r"\S+"),
                    pa.int64(),
                ),
            }
        )

    feats = ds.map_batches(n_tok, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_quantiles_int(
        feats, "lang", "n_tokens", quantiles=(0.5, 0.95)
    )


def q_tf_idf(sf_dir: str):
    """Top-3 salient terms per doc by tf x (N/df) — large-vocabulary
    shape: exploded term rows join the df table via the distributed
    bucket hash join (no broadcast)."""
    from rayslog.stages.text import tf_idf_top_terms

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return tf_idf_top_terms(ds, n_docs=_table_rows(sf_dir, "documents"), k=3)


def q_approx_top_ngrams(sf_dir: str):
    """Approximate top-20 bigrams via the mergeable SpaceSaving-style
    counter tree — O(capacity) state per node, the 10^9-distinct-ngram
    scale path beside exact top_ngrams.  ORACLE-CHECKED against the
    exact SQL: this corpus's distinct-bigram count (~1k) is below the
    sketch capacity (2048), so truncation never fires and the counters
    are provably lossless here; a pytest additionally proves
    sketch == exact on a skewed synthetic corpus where truncation DOES
    fire."""
    from rayslog.stages.sketch import approx_heavy_hitters
    from rayslog.stages.text import bigram_counts_partial

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = approx_heavy_hitters(
        ds,
        lambda t: bigram_counts_partial(t).rename_columns(["key", "n"]),
        k=20,
    )
    return out.map_batches(
        lambda t: t.rename_columns(["ngram", "n"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_curation(sf_dir: str):
    """The composed curation flagship over documents: quality gates →
    exact dedup (keep min doc_id per text) → deterministic stratified
    sample by language.  Every stage streams; the dedup survivors join
    back to the filtered rows with the distributed bucket hash join
    (no driver-side id set), and the whole composition is exactly
    SQL-expressible — this is the green-oracle end-to-end demo of the
    curation operators."""
    from rayslog.stages.dedup import dedup_exact_keep_rows
    from rayslog.stages.sample import stratified_sample
    from rayslog.stages.text import quality_filter

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang", "source"])
    filtered = quality_filter(ds, **QUALITY_GATES)
    # keep-rows dedup: one hash-partitioned shuffle carrying
    # (h1, h2, doc_id, lang, source) — min doc_id per distinct text
    # with the row attributes attached (no join-back needed)
    survivors = dedup_exact_keep_rows(
        filtered, keep_cols=["lang", "source"]
    )
    return stratified_sample(
        survivors,
        strata_col="lang",
        rates=SAMPLE_RATES,
        default_rate=SAMPLE_DEFAULT_RATE,
        seed=SAMPLE_SEED,
    ).select_columns(["doc_id", "lang", "source"])


def q_pack_sequences(sf_dir: str):
    """Training-shard packing: each doc assigned to the 256-token bin
    its global (doc_id-ordered) token offset falls in — the
    distributed ordered-prefix-sum pattern."""
    from rayslog.stages.pack import pack_sequences

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return pack_sequences(ds, budget=256)


def q_pack_assemble(sf_dir: str):
    """Materialized packed training shards: one row per 256-token bin
    (docs joined in doc_id order + doc/token counts) — the emit step
    after pack_sequences."""
    from rayslog.stages.pack import pack_assemble

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return pack_assemble(ds, budget=256)


def q_doc_fingerprint(sf_dir: str):
    """Rolling-hash document fingerprints; rows-only check."""
    from rayslog.stages.text import rolling_fingerprint

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda t: rolling_fingerprint(t).drop_columns(["text"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=8_192,  # bounds the O(total-token) hash temporaries
    )


def _schema_safe(ds):
    """Ray-quirk guard for queries whose CORRECT result can be 0 rows
    at some SF: a 0-row Dataset's ``to_pandas()`` is COLUMN-LESS (even
    when built via ``from_arrow`` on a typed empty table), which reads
    as a schema mismatch against the oracle's typed empty.  The driver
    contract accepts ``pyarrow.Table``, so hand it the typed Arrow
    empty instead.  Cheap: only consulted on tiny final datasets."""
    sch = ds.schema()
    if sch is not None and ds.count() == 0:
        base = sch.base_schema
        return pa.Table.from_arrays(
            [pa.nulls(0, f.type) for f in base], schema=base
        )
    return ds


def _scaled_parts(n_rows: int) -> int:
    """Exchange part count sized to the input (~500k rows/part,
    clamped) — a fixed 64 under-partitions the 100 TB case and
    over-partitions the driver tables."""
    return max(16, min(4096, -(-int(n_rows) // 500_000)))


def _table_rows(sf_dir: str, table: str) -> int:
    """Row count from parquet FILE METADATA (no data read) — used to
    size shuffle partitioning (bucket_parts) to the corpus."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(f"{sf_dir}/{table}.parquet").metadata.num_rows


def q_dedup_minhash(sf_dir: str):
    """MinHash+LSH near-dup pairs with exact-Jaccard verify."""
    from rayslog.stages.dedup import minhash_near_dups, tuned_bucket_parts

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return minhash_near_dups(
        ds, threshold=0.5,
        bucket_parts=tuned_bucket_parts(_table_rows(sf_dir, "documents")),
    )


#: per-source token budget shared by q_token_budget_sample + its oracle
TOKEN_BUDGET_PER_SOURCE = 800


def q_token_budget_sample(sf_dir: str):
    """Budget-capped deterministic per-domain sample: keep each
    source's docs in seeded-hash order while the source's running
    token total stays within TOKEN_BUDGET_PER_SOURCE (hits a target
    token count per domain instead of a rate)."""
    from rayslog.stages.sample import token_budget_sample

    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])
    return token_budget_sample(ds, budget=TOKEN_BUDGET_PER_SOURCE)


def q_dedup_survivors_best(sf_dir: str):
    """Quality-weighted near-dup dedup: within each connected duplicate
    component keep the LONGEST member (token count; ties to min
    doc_id) instead of the min-id rule — the survivor policy real
    curation runs use when duplicates differ in completeness
    (truncated crawls, partial re-posts).  Non-component docs survive
    untouched.  Composition: minhash pair graph -> connected
    components -> members join token counts via the bucketed
    hash_join -> per-component window rank k=1 through the combiner
    tree -> anti-join for singletons.  Output (doc_id, n_tokens)."""
    from rayslog.stages.aggregate import grouped_top_k
    from rayslog.stages.cluster import connected_components
    from rayslog.stages.dedup import minhash_near_dups, tuned_bucket_parts
    from rayslog.stages.relational import hash_join

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = minhash_near_dups(
        ds, threshold=0.5,
        bucket_parts=tuned_bucket_parts(_table_rows(sf_dir, "documents")),
    )
    comps = connected_components(pairs)

    def n_tok(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": pc.cast(
                    pc.count_substring_regex(t.column("text"), r"\S+"),
                    pa.int64(),
                ),
            }
        )

    feats = ds.map_batches(
        n_tok, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    members = hash_join(feats, comps, key="doc_id")
    best = grouped_top_k(
        members, group_col="cluster_id", value_col="n_tokens",
        id_col="doc_id", k=1,
    ).map_batches(
        lambda t: t.select(["doc_id", "n_tokens"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    singles = hash_join(feats, comps, key="doc_id", how="anti")
    return singles.union(best)


def q_dup_clusters(sf_dir: str):
    """Duplicate groups: connected components (min-label propagation)
    over the MinHash near-dup pair graph — (doc_id, cluster_id) with
    cluster_id = the component's min doc_id (stages/cluster.py)."""
    from rayslog.stages.cluster import connected_components
    from rayslog.stages.dedup import minhash_near_dups, tuned_bucket_parts

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = minhash_near_dups(
        ds, threshold=0.5,
        bucket_parts=tuned_bucket_parts(_table_rows(sf_dir, "documents")),
    )
    return connected_components(pairs).sort("doc_id")


def q_dedup_survivors_cc(sf_dir: str):
    """Transitive-closure near-dup dedup: one representative (min
    doc_id) per MinHash-pair connected component, all singletons kept;
    drop set removed via partitioned hash ANTI join
    (stages/cluster.py:cluster_survivors)."""
    from rayslog.stages.cluster import cluster_survivors
    from rayslog.stages.dedup import minhash_near_dups, tuned_bucket_parts

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = minhash_near_dups(
        ds, threshold=0.5,
        bucket_parts=tuned_bucket_parts(_table_rows(sf_dir, "documents")),
    )
    docs = _read(sf_dir, "documents", ["doc_id", "lang", "source"])
    return cluster_survivors(docs, pairs).sort("doc_id")


def q_dedup_minhash_keep(sf_dir: str):
    """One-pass LSH survivor selection (near-dup dedup without pair
    enumeration — the template-heavy-corpus scale shape).
    Oracle-checked since r5: the (doc_id, band, band_hash) rows export
    as literals and the min-in-every-bucket survivor rule is pure SQL
    (sqloracle._dedup_minhash_keep_sql, frozen-literal contract)."""
    from rayslog.stages.dedup import minhash_dedup_survivors, tuned_bucket_parts

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return minhash_dedup_survivors(
        ds, bucket_parts=tuned_bucket_parts(_table_rows(sf_dir, "documents"))
    )


def q_dedup_simhash(sf_dir: str):
    """SimHash near-dup pairs (Hamming <= 3).  Oracle-checked since
    r5: the corpus signatures export as UBIGINT literals and the SQL
    spells the identical pigeonhole + bit_count(xor) semantics
    (sqloracle._dedup_simhash_sql, the frozen-literal contract)."""
    from rayslog.stages.dedup import simhash_near_dups, tuned_bucket_parts

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return simhash_near_dups(
        ds, max_hamming=3,
        key_parts=tuned_bucket_parts(_table_rows(sf_dir, "documents")),
    )


def _query_vectors(sf_dir: str, n: int = 8):
    """Load the n query vectors ONLY — the predicate is pushed into the
    parquet read (row-group pruning + decode filter), so at 100 TB this
    reads n rows, not the corpus."""
    import pyarrow.parquet as pq
    import numpy as np

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", n)],
    )
    ids = t.column("vec_id").to_numpy()
    mat = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    order = np.argsort(ids)
    return mat[order], ids[order]


def q_lm_score(sf_dir: str):
    """CCNet-style LM quality scoring: per-doc bits/transition under a
    Laplace-smoothed corpus char-bigram LM (stages/lm.py — count pass
    with tree fan-in, broadcast model, vectorized score pass)."""
    from rayslog.stages.lm import score_bigram_lm, train_bigram_lm

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    model = train_bigram_lm(ds)
    return score_bigram_lm(ds, model).sort("doc_id")


def q_embed_kmeans(sf_dir: str):
    """Distributed Lloyd k-means (k=8, 2 iterations, cosine assign)
    over the embeddings corpus: broadcast centroids + per-batch partial
    sums, O(model) driver state (stages/kmeans.py); returns
    (vec_id, cluster, score)."""
    from rayslog.stages.kmeans import kmeans

    init, _ = _query_vectors(sf_dir, n=8)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return kmeans(ds, init, iters=2).sort("vec_id")


#: docs kept per semantic cluster + hash seed (shared with the oracle)
DIVERSE_K = 10
DIVERSE_SEED = 11


def q_diverse_sample_per_cluster(sf_dir: str):
    """Cluster-balanced diverse sampling: keep DIVERSE_K docs per
    semantic k-means cluster, chosen by seeded uniform hash rank (ties
    by vec_id) — the diversity-preserving subset selection curation
    runs over embedding clusters so no semantic mode dominates the
    sample.  Composes kmeans assignment + the sampling hash + the
    distributed window rank; fully deterministic, ORACLE-CHECKED
    against the unrolled-Lloyd CTE + window row_number."""
    import numpy as np

    from rayslog.stages.aggregate import grouped_top_k
    from rayslog.stages.kmeans import kmeans
    from rayslog.stages.sample import splitmix64

    init, _ = _query_vectors(sf_dir, n=8)
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    asg = kmeans(emb, init, iters=2).select_columns(["vec_id", "cluster"])

    def add_rank_key(t: pa.Table) -> pa.Table:
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        k = splitmix64(ids.astype(np.uint64), DIVERSE_SEED)
        # order-preserving uint64 -> int64 shift: Arrow sorts signed,
        # the SQL oracle sorts the UBIGINT hash — same permutation
        rk = (k ^ np.uint64(1 << 63)).view(np.int64)
        return pa.table(
            {
                "vec_id": pc.cast(t.column("vec_id"), pa.int64()),
                "cluster": pc.cast(t.column("cluster"), pa.int64()),
                "rk": pa.array(rk),
            }
        )

    keyed = asg.map_batches(
        add_rank_key, batch_format="pyarrow", zero_copy_batch=True
    )
    top = grouped_top_k(
        keyed, group_col="cluster", value_col="rk", id_col="vec_id",
        k=DIVERSE_K, ascending=True,
    )
    return top.map_batches(
        lambda t: t.select(["vec_id", "cluster", "rank"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_cluster_profile(sf_dir: str):
    """Per-cluster language profile: k-means cluster assignments
    (embeddings table) hash-joined with document metadata on the
    shared id domain, then (cluster, lang) counts via the combiner
    tree — the cross-table composition a curation run does to inspect
    what each semantic cluster holds.  Both large sides go through the
    partitioned bucket join (no broadcast)."""
    from rayslog.stages.aggregate import counts_by
    from rayslog.stages.kmeans import kmeans
    from rayslog.stages.relational import hash_join

    init, _ = _query_vectors(sf_dir, n=8)
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    asg = kmeans(emb, init, iters=2).select_columns(["vec_id", "cluster"])
    docs = _read(sf_dir, "documents", ["doc_id", "lang"]).map_batches(
        lambda t: t.rename_columns(["vec_id", "lang"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    joined = hash_join(asg, docs, key="vec_id")
    out = counts_by(joined, ["cluster", "lang"], alias="n_docs", final="tree")

    def fix_types(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cluster": pc.cast(t.column("cluster"), pa.int64()),
                "lang": t.column("lang"),
                "n_docs": t.column("n_docs"),
            }
        )

    return out.map_batches(
        fix_types, batch_format="pyarrow", zero_copy_batch=True
    )


def q_ann_topk(sf_dir: str):
    """Exact cosine top-10 for queries vec_id<8 (brute-force baseline)."""
    from rayslog.stages.ann import brute_force_topk

    qv, qi = _query_vectors(sf_dir)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return brute_force_topk(ds, qv, qi, k=10)


def _ivf_index_dir(sf_dir: str) -> str:
    import hashlib
    import re as _re

    tag = _re.sub(r"[^A-Za-z0-9._-]", "_", sf_dir.strip("/"))
    h = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
    return f"/tmp/rayslog_data/ivf/{tag}-{h}"


def ensure_ivf_index(sf_dir: str):
    """Build-or-load the persisted IVF index for a corpus.  Shared by
    ``q_ann_ivf`` and the SQL oracle generator — the oracle exports
    this index's FROZEN centroids as literal VALUES, so both sides
    probe the identical store (the embed_kmeans round-6 contract)."""
    from pathlib import Path

    from rayslog.stages.ann import IvfIndex, build_ivf_index

    d = _ivf_index_dir(sf_dir)
    if Path(d, "_ivf_meta.json").exists():
        return IvfIndex(d)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return build_ivf_index(
        ds, d, n_centroids=_ivf_cells(_table_rows(sf_dir, "embeddings"))
    )


#: cosine threshold shared by q_cosine_dups_ivf and its SQL oracle
#: (same operator parameter as q_cosine_dups: the synthetic corpus is
#: near-orthogonal random, planted near-dups sit at ~0.4-0.5)
COSINE_IVF_THRESHOLD = 0.4


def q_cosine_dups_ivf(sf_dir: str):
    """IVF-bucketed embedding near-dup pairs (frozen persisted
    centroids partition the corpus; exact round-6 cosine within each
    bucket).  ORACLE-CHECKED — deterministic unlike the LSH sibling:
    the oracle spells the same bucket-local semantics, so the
    candidate-pruning recall trade (border pairs are skipped BY
    DEFINITION on both sides) never reaches the comparison."""
    from rayslog.stages.ann import cosine_dups_bucketed

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return cosine_dups_bucketed(
        ds, ensure_ivf_index(sf_dir), threshold=COSINE_IVF_THRESHOLD
    )


def q_ann_ivf(sf_dir: str):
    """IVF top-10 over a PERSISTED bucket-partitioned index (built once
    per corpus under /tmp, reused across calls; probing reads only the
    probed buckets' files).  Oracle-checked since r4: frozen centroids
    make assignment+probe deterministic, spelled in SQL by
    ``sqloracle._ann_ivf_sql``."""
    qv, qi = _query_vectors(sf_dir)
    return ensure_ivf_index(sf_dir).probe(qv, qi, k=10, nprobe=4)


def _ivf_cells(n_vecs: int) -> int:
    """Coarse-cell count ~ sqrt(N), clamped: probe cost is the parquet
    read+decode of nprobe/n_centroids of the corpus (measured at 1M
    vectors: 2.6s at 256 cells vs 10.4s at 64), while too many cells
    starves each of vectors."""
    import math

    return max(16, min(4096, int(math.sqrt(max(1, n_vecs)))))


def ensure_sharded_ivf(sf_dir: str):
    """Build-or-load the sharded IVF store (two parity-split appends,
    centroids FROZEN on the first drop).  Shared by ``q_ann_ivf_incr``
    and its SQL oracle — with frozen centroids the shard-union probe
    equals a one-shot assignment (pytest-proven), so the same
    frozen-centroid-literals SQL contract as ``ann_ivf`` applies."""
    import hashlib
    import re as _re

    from rayslog.stages.ann import ShardedIvfIndex

    tag = _re.sub(r"[^A-Za-z0-9._-]", "_", sf_dir.strip("/"))
    h = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
    index = ShardedIvfIndex.create(
        f"/tmp/rayslog_data/ivfshard/{tag}-{h}",
        n_centroids=_ivf_cells(_table_rows(sf_dir, "embeddings")),
    )
    for name, parity in (("even", 0), ("odd", 1)):
        if name in index.shard_names():
            continue
        part = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
            lambda t, p=parity: t.filter(
                pc.equal(
                    pc.bit_wise_and(t.column("vec_id"), pa.scalar(1)),
                    pa.scalar(p, pa.int64()),
                )
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        index.append_shard(part, name)
    return index


def q_ann_ivf_incr(sf_dir: str):
    """IVF top-10 over the INCREMENTALLY-built sharded IVF store: the
    corpus ingests as two parity-split appends against centroids
    FROZEN on the first drop; probing prunes non-probed buckets across
    every shard.  ORACLE-CHECKED since r4: the frozen centroids make
    the shard-union probe deterministic and equal to a one-shot
    assignment, so the ann_ivf SQL contract applies with THIS store's
    centroid matrix."""
    qv, qi = _query_vectors(sf_dir)
    return ensure_sharded_ivf(sf_dir).probe(qv, qi, k=10, nprobe=4)


#: probe tokens shared by the Ray query AND its SQL oracle (common
#: corpus vocabulary words)
INDEX_PROBE_TOKENS = ("data", "query", "spark")


def q_inverted_index(sf_dir: str):
    """Posting lookup over a PERSISTED bucket-partitioned inverted
    index (built once per corpus under /tmp, reused across calls;
    lookups read ONLY the probed tokens' buckets — pruned at the file
    listing, the IvfIndex discipline applied to text)."""
    return _doc_index(sf_dir).lookup(list(INDEX_PROBE_TOKENS))


def q_bm25_search(sf_dir: str):
    """BM25 top-10 for the probe query over the persisted posting
    store: tf/dl ride the postings (search-engine denormalization), df
    comes from the probed rows themselves, and corpus stats (N, avgdl)
    are parquet metadata + one streaming token-count pass — scoring
    touches only the query's buckets."""
    from rayslog.stages.invindex import bm25_topk

    n_docs = _table_rows(sf_dir, "documents")
    index = _doc_index(sf_dir)
    index_dir = index.index_dir

    # corpus token total: computed once and persisted beside the index
    # (a corpus-level stat of the same build; repeat queries skip the
    # streaming pass)
    import json as _json
    from pathlib import Path as _Path

    meta_path = _Path(index_dir, "_inv_meta.json")
    meta = _json.loads(meta_path.read_text())
    if "total_tokens" not in meta:
        def tok_partial(t: pa.Table) -> pa.Table:
            n = pc.count_substring_regex(t.column("text"), r"\S+")
            return pa.table(
                {"s": pa.array([int(pc.sum(n).as_py() or 0)], pa.int64())}
            )

        meta["total_tokens"] = int(
            _read(sf_dir, "documents", ["text"])
            .map_batches(
                tok_partial, batch_format="pyarrow", zero_copy_batch=True
            )
            .to_pandas()["s"]
            .sum()
        )
        meta_path.write_text(_json.dumps(meta))
    avgdl = float(meta["total_tokens"]) / float(n_docs)
    return bm25_topk(
        index, list(INDEX_PROBE_TOKENS), n_docs=n_docs, avgdl=avgdl, k=10
    )


def q_bm25_search_incr(sf_dir: str):
    """BM25 top-10 over the INCREMENTALLY-built sharded posting store:
    the corpus ingests as two shard appends (doc_id parity split — the
    stand-in for two crawl drops), committed shards are immutable, and
    corpus stats (N, total tokens) accumulate in the manifest so
    scoring needs no corpus pass.  Must equal the one-shot
    ``bm25_search`` exactly — same oracle SQL."""
    from rayslog.stages.invindex import bm25_topk

    index = _doc_index_sharded(sf_dir)
    return bm25_topk(
        index,
        list(INDEX_PROBE_TOKENS),
        n_docs=index.n_docs,
        avgdl=index.avgdl,
        k=10,
    )


def _doc_index_sharded(sf_dir: str):
    """The (cached) sharded posting store for the documents table,
    built as two parity-split appends."""
    import hashlib
    import re as _re

    from rayslog.stages.invindex import ShardedInvertedIndex

    tag = _re.sub(r"[^A-Za-z0-9._-]", "_", sf_dir.strip("/"))
    h = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
    n_docs = _table_rows(sf_dir, "documents")
    index = ShardedInvertedIndex.create(
        f"/tmp/rayslog_data/invshard/{tag}-{h}",
        n_buckets=max(16, min(4096, -(-n_docs // 40_000) * 16)),
    )
    for name, parity in (("even", 0), ("odd", 1)):
        if name in index.shard_names():
            continue
        part = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            lambda t, p=parity: t.filter(
                pc.equal(
                    pc.bit_wise_and(t.column("doc_id"), pa.scalar(1)),
                    pa.scalar(p, pa.int64()),
                )
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        index.append_shard(part, name)
    return index


def q_fielded_search(sf_dir: str):
    """Multi-column posting store: docs whose ``source`` FIELD matches
    one token AND whose ``body`` field contains another, returning the
    body term frequency.  Both lookups read only their token's buckets
    (field-scoped postings); the conjunction is the distributed SEMI
    hash join over doc_id."""
    import pyarrow as pa

    from rayslog.stages.relational import hash_join

    index = _doc_index_fielded(sf_dir)
    body = index.lookup_scored(["data"], field="body").map_batches(
        lambda t: pa.table({"doc_id": t.column("doc_id"),
                            "tf": t.column("tf")}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    src = index.lookup(["src3"], field="source").map_batches(
        lambda t: pa.table({"doc_id": t.column("doc_id")}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return hash_join(body, src, key="doc_id", how="semi")


def _doc_index_fielded(sf_dir: str):
    """The (cached) MULTI-COLUMN posting store for the documents table
    (fields body <- text, source <- source), one shard."""
    import hashlib
    import re as _re

    from rayslog.stages.invindex import ShardedInvertedIndex

    tag = _re.sub(r"[^A-Za-z0-9._-]", "_", sf_dir.strip("/"))
    h = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
    n_docs = _table_rows(sf_dir, "documents")
    index = ShardedInvertedIndex.create(
        f"/tmp/rayslog_data/invfield/{tag}-{h}",
        n_buckets=max(16, min(4096, -(-n_docs // 40_000) * 16)),
        fields={"body": "text", "source": "source"},
    )
    if "all" not in index.shard_names():
        index.append_shard(
            _read(sf_dir, "documents", ["doc_id", "text", "source"]), "all"
        )
    return index


#: phrase shared by the Ray query AND its SQL oracle
PHRASE = ("table", "hash")


def _doc_index(sf_dir: str):
    """The (cached) posting store for the documents table — shared by
    inverted_index / bm25_search / phrase_search."""
    import hashlib
    import re as _re

    from rayslog.stages.invindex import ensure_index

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    tag = _re.sub(r"[^A-Za-z0-9._-]", "_", sf_dir.strip("/"))
    h = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
    n_docs = _table_rows(sf_dir, "documents")
    return ensure_index(
        ds,
        f"/tmp/rayslog_data/inv/{tag}-{h}",
        n_buckets=max(16, min(4096, -(-n_docs // 40_000) * 16)),
    )


def q_phrase_search(sf_dir: str):
    """Exact token-phrase search over the POSITIONAL posting store:
    docs containing the probe phrase adjacently, with occurrence
    counts — position lists ride the postings, so matching reads only
    the phrase tokens' buckets (stages/invindex.py:phrase_search)."""
    from rayslog.stages.invindex import phrase_search

    return phrase_search(_doc_index(sf_dir), PHRASE)


def q_cosine_dups(sf_dir: str):
    """Embedding near-dup pairs with cosine >= 0.4 (the corpus is
    near-orthogonal random; the threshold is the operator parameter)."""
    from rayslog.stages.ann import cosine_near_dup_pairs

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return cosine_near_dup_pairs(ds, threshold=0.4)


def q_embed_dedup_cc(sf_dir: str):
    """Semantic near-dup dedup: cosine>=0.4 pair graph -> connected
    components -> one representative (min vec_id) per component via
    hash ANTI join — the same transitive-closure plan as
    dedup_survivors_cc, driven by the embedding pair source."""
    from rayslog.stages.ann import cosine_near_dup_pairs
    from rayslog.stages.cluster import cluster_survivors

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    pairs = cosine_near_dup_pairs(ds, threshold=0.4)
    vecs = _read(sf_dir, "embeddings", ["vec_id", "label"])
    return cluster_survivors(
        vecs,
        pairs.map_batches(
            lambda t: t.select(["vec_a", "vec_b"]).rename_columns(
                ["doc_a", "doc_b"]
            ),
            batch_format="pyarrow",
        ),
        id_col="vec_id",
    ).sort("vec_id")


def q_cosine_dups_lsh(sf_dir: str):
    """Random-hyperplane-LSH cosine near-dups (the bucketed scale path
    of cosine_dups).  Oracle-checked since r5: the seeded hyperplanes
    are deterministic, so sqloracle._cosine_dups_lsh_sql exports them
    as DOUBLE[] literals and spells the identical bucket/pair/verify
    semantics (the cosine_dups_ivf frozen-literal contract)."""
    from rayslog.stages.ann import cosine_lsh_pairs

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return cosine_lsh_pairs(ds, threshold=0.4)


def q_props_stats(sf_dir: str):
    """Semi-structured extraction: pull the integer ``k`` field out of
    the JSON ``props`` column with ONE-capture-group ``extract_regex``
    (multi-group extraction is the documented 50-100x Arrow pitfall),
    then per-type n/sum/mean via the combiner tree.  The mean is the
    IEEE division of the integer sum — plan-order independent, so it
    hash-matches the SQL oracle's CAST(sum AS DOUBLE)/count."""
    from rayslog.stages.aggregate import tree_aggregate

    ds = _read(sf_dir, "events", ["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t.column("props"), r'"k": (?P<k>\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        part = (
            pa.table({"event_type": t.column("event_type"), "k": k})
            .group_by(["event_type"])
            .aggregate([("k", "sum"), ([], "count_all")])
        )
        return part.rename_columns(["event_type", "k_sum", "n_events"])

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    tot = tree_aggregate(
        parts,
        ["event_type"],
        [("k_sum", "sum"), ("n_events", "sum")],
        ["k_sum", "n_events"],
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "n_events": t.column("n_events"),
                "k_sum": t.column("k_sum"),
                "k_mean": pc.divide(
                    pc.cast(t.column("k_sum"), pa.float64()),
                    pc.cast(t.column("n_events"), pa.float64()),
                ),
            }
        )

    return tot.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


#: funnel parameters shared by the Ray query AND its SQL oracle —
#: high-value events only, so the stepwise ordering actually gates
FUNNEL_STAGES = ("view", "click", "purchase")
FUNNEL_MIN_VALUE = 95.0


def q_events_funnel(sf_dir: str):
    """Ordered conversion funnel over high-value events: users who
    viewed, then clicked strictly after their first view, then
    purchased strictly after that first qualifying click — k
    shuffle-free grouped-min passes with broadcast stage gates
    (stages/events.py:funnel_counts)."""
    from rayslog.stages.events import funnel_counts

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts", "value"])

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.greater_equal(t.column("value"), FUNNEL_MIN_VALUE)
        ).select(["user_id", "event_type", "ts"])

    return funnel_counts(
        ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True),
        stages=FUNNEL_STAGES,
    )


def q_events_tumbling(sf_dir: str):
    """5-minute tumbling window counts + value sums per event type."""
    import pyarrow.compute as pc

    from rayslog.stages.events import tumbling_counts

    return tumbling_counts(
        _read(sf_dir, "events", ["ts", "event_type", "value"])
    )


def q_events_sessionize(sf_dir: str):
    """Gap-based session stats per user (30-min gap)."""
    from rayslog.stages.events import sessionize

    return sessionize(_read(sf_dir, "events", ["user_id", "ts", "event_id"]))


def q_events_sessionize_partitioned(sf_dir: str):
    """Two-phase time-partitioned sessionize (the pathological-key scale
    path); must equal plain sessionize — same SQL oracle."""
    from rayslog.stages.events import sessionize_partitioned

    return sessionize_partitioned(
        _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    )


def q_lineitem_pricing(sf_dir: str):
    """TPC-H-Q1-shaped pricing summary (exact integer-cents sums)."""
    from rayslog.stages.relational import lineitem_pricing_summary_cents

    return lineitem_pricing_summary_cents(
        _read(
            sf_dir,
            "lineitem",
            [
                "l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount", "l_tax", "l_shipdate",
            ],
        )
    )


def q_top_customers(sf_dir: str):
    """Top-10 customers by revenue (distributed top-k; names attached
    via a k-key filtered parquet read — no whole-dim driver load)."""
    from rayslog.stages.relational import top_customers_by_revenue

    return top_customers_by_revenue(
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]),
        customer_path=f"{sf_dir}/customer.parquet",
    )


def q_mktsegment_revenue(sf_dir: str):
    """Per-market-segment order count + revenue via the distributed
    bucket hash join (both sides exchanged by key hash, no broadcast)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from rayslog.stages.relational import hash_join

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: pa.table(
            {
                "c_custkey": t.column("o_custkey"),
                "cents": pc.round(
                    pc.multiply(t.column("o_totalprice"), pa.scalar(100.0))
                ).cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    customer = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = hash_join(orders, customer, key="c_custkey")

    # 5-segment domain: per-block partials + the combiner tree beat the
    # sort-shuffle final
    from rayslog.stages.aggregate import tree_aggregate

    def partial(t: pa.Table) -> pa.Table:
        return (
            t.select(["c_mktsegment", "cents"])
            .group_by(["c_mktsegment"])
            .aggregate([("cents", "sum"), ([], "count_all")])
            .rename_columns(["c_mktsegment", "cents", "n_orders"])
        )

    agg = tree_aggregate(
        joined.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["c_mktsegment"],
        [("cents", "sum"), ("n_orders", "sum")],
        ["cents", "n_orders"],
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "c_mktsegment": t.column("c_mktsegment"),
                "n_orders": pc.cast(t.column("n_orders"), pa.int64()),
                "revenue": pc.divide(
                    pc.cast(t.column("cents"), pa.float64()), 100.0
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_regional_revenue(sf_dir: str):
    """TPC-H Q5-shaped multi-way join: per-nation revenue where customer
    and supplier share the nation, one region, one order-date year.
    Customer/supplier legs auto-select: broadcast lookup below
    RAYSLOG_BROADCAST_MAX_ROWS (parquet-metadata row count), the
    distributed hash_join leg above it (the dim never lands on the
    driver).  nation/region are bounded at 25/5 rows — always driver."""
    import os

    import pyarrow.parquet as pq

    from rayslog.stages.relational import regional_revenue_cents

    thresh = int(os.environ.get("RAYSLOG_BROADCAST_MAX_ROWS", 4_000_000))

    def dim(table: str, cols: list[str]):
        if _table_rows(sf_dir, table) <= thresh:
            return pq.read_table(
                f"{sf_dir}/{table}.parquet", columns=cols
            ).to_pandas()
        return _read(sf_dir, table, cols)

    tiny = {
        t: pq.read_table(f"{sf_dir}/{t}.parquet", columns=cols).to_pandas()
        for t, cols in [
            ("nation", ["n_nationkey", "n_name", "n_regionkey"]),
            ("region", ["r_regionkey", "r_name"]),
        ]
    }
    return regional_revenue_cents(
        _read(
            sf_dir,
            "lineitem",
            ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        ),
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]),
        dim("customer", ["c_custkey", "c_nationkey"]),
        dim("supplier", ["s_suppkey", "s_nationkey"]),
        tiny["nation"],
        tiny["region"],
        region_name="ASIA",
    )


def q_order_priority(sf_dir: str):
    """TPC-H Q4-shaped EXISTS aggregate via the distributed SEMI hash
    join (lineitem side shuffles one int64 column)."""
    from rayslog.stages.relational import order_priority_counts

    return order_priority_counts(
        _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_orderdate"]),
        _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]),
    )


def q_cust_order_dist(sf_dir: str):
    """TPC-H Q13-shaped order-count distribution (zero-order customers
    included via the LEFT task-exchange join)."""
    from rayslog.stages.relational import customer_order_distribution

    return customer_order_distribution(
        _read(sf_dir, "customer", ["c_custkey"]),
        _read(sf_dir, "orders", ["o_custkey"]),
    )


def q_host_traffic(sf_dir: str):
    """Top-20 hostnames by parsed-turn count (distinct + global sort +
    limit; ties broken by hostname for determinism)."""
    ds = parsed_only(parsed_dataset(sf_dir))
    # hostname cardinality is fleet-sized in reality: shuffle-final, not
    # driver-final (driver pull would be O(hosts x blocks) rows).
    counts = counts_by(ds, ["hostname"], alias="n_turns", final="shuffle")
    return counts.sort(["n_turns", "hostname"], descending=[True, False]).limit(20)


def q_ngram_jaccard(sf_dir: str):
    """Exact n-gram Jaccard pairs (the LSH baseline); ORACLE-CHECKED
    against the shingle-string all-pairs SQL."""
    from rayslog.stages.dedup import ngram_jaccard_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ngram_jaccard_pairs(ds, threshold=0.05)


def q_events_sliding(sf_dir: str):
    """10-min windows sliding every 5 min, per event type."""
    from rayslog.stages.events import sliding_counts

    return sliding_counts(_read(sf_dir, "events", ["ts", "event_type"]))


def q_media_features(sf_dir: str):
    """Multimodal plumbing end-to-end: deterministic synthetic binary
    payloads -> actor-pool decode (stub) -> fixed-width features.
    Rows-only (no SQL equivalent for the decode kernel)."""
    import ray.data as rd

    from rayslog.sources.testgen import rows_for
    from rayslog.stages.multimodal import (
        FakeDecoder,
        decode_media,
        synthesize_media_table,
    )

    n = max(200, rows_for(sf_dir) // 100)
    ds = rd.from_arrow(synthesize_media_table(n))
    return decode_media(ds, FakeDecoder)


def q_media_decode(sf_dir: str):
    """REAL multimodal decode: BMP + WAV payloads synthesized, decoded
    and feature-extracted with stdlib-only codecs (actor pool).
    Rows-only (binary decode has no SQL equivalent)."""
    import ray.data as rd

    from rayslog.sources.testgen import rows_for
    from rayslog.stages.multimodal import (
        StdlibDecoder,
        decode_media,
        synthesize_real_media_table,
    )

    n = max(100, rows_for(sf_dir) // 200)
    ds = rd.from_arrow(synthesize_real_media_table(n))
    return decode_media(ds, StdlibDecoder)


def q_approx_distinct(sf_dir: str):
    """HyperLogLog approximate distinct counts (mergeable-sketch
    pattern: one serialized sketch per batch, tiny merge).  Rows-only."""
    import pandas as pd

    from rayslog.stages.sketch import approx_distinct

    rows = []
    for col in ("conv_id", "hostname"):
        if col == "conv_id":
            ds = read_transcripts(sf_dir, ["conv_id"])
            est = approx_distinct(ds, "conv_id")
        else:
            ds = parsed_only(parsed_dataset(sf_dir))
            est = approx_distinct(ds.select_columns(["hostname"]), "hostname")
        rows.append({"column": col, "approx_distinct": round(est, 1)})
    return pd.DataFrame(rows)


def q_events_filtered(sf_dir: str):
    """Predicate pushdown at the read: only 'click' rows leave the
    parquet scan (row-group/page pruning via a pyarrow dataset filter),
    then a per-user value aggregate in integer cents."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "value"],
        filter=(pc.field("event_type") == "click"),
    )

    import numpy as np

    from rayslog.stages.aggregate import task_exchange

    parts = 64

    def partial(t: pa.Table) -> pa.Table:
        """Per-batch combiner + user-hash part: the exchange then moves
        one (user, n, cents) row per user per block, and the final sum
        runs vectorized per part — scale-correct for fleet-sized user
        domains (no driver pull, no sort-shuffle)."""
        c = pc.round(pc.multiply(t.column("value"), 100.0)).cast(pa.int64())
        g = (
            pa.table({"user_id": t.column("user_id"), "cents": c})
            .group_by(["user_id"])
            .aggregate([("cents", "sum"), ([], "count_all")])
            .rename_columns(["user_id", "cents", "n_clicks"])
        )
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        return g.append_column(
            "upart",
            pa.array((u.astype(np.uint64) % np.uint64(parts)).astype(np.int32)),
        )

    _empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "n_clicks": pa.array([], pa.int64()),
            "click_value": pa.array([], pa.float64()),
        }
    )

    def finish_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        g = (
            t.group_by(["user_id"])
            .aggregate([("cents", "sum"), ("n_clicks", "sum")])
            .rename_columns(["user_id", "cents", "n_clicks"])
        )
        return pa.table(
            {
                "user_id": g.column("user_id"),
                "n_clicks": pc.cast(g.column("n_clicks"), pa.int64()),
                "click_value": pc.divide(
                    pc.cast(g.column("cents"), pa.float64()), 100.0
                ),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return task_exchange(partials, "upart", parts, finish_part)


def q_asof_attribution(sf_dir: str):
    """As-of join: last 'view' before each 'purchase', per user."""
    from rayslog.stages.events import asof_attribution

    return asof_attribution(
        _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])
    )


def q_asof_attribution_partitioned(sf_dir: str):
    """Two-phase time-partitioned as-of join (pathological-key scale
    path); must equal plain asof_attribution — same SQL oracle."""
    from rayslog.stages.events import asof_attribution_partitioned

    return asof_attribution_partitioned(
        _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])
    )


def q_price_bands(sf_dir: str):
    """Range join: parts bucketed into retail-price bands (broadcast
    interval side), then per-band count + exact-cents price sum."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from rayslog.stages.aggregate import tree_aggregate
    from rayslog.stages.relational import range_join_bands

    ds = _read(sf_dir, "part", ["p_partkey", "p_retailprice"])
    banded = range_join_bands(ds, "p_retailprice")

    def cents_partial(t: pa.Table) -> pa.Table:
        c = pc.round(pc.multiply(t.column("p_retailprice"), 100.0)).cast(pa.int64())
        return (
            pa.table({"band": t.column("band"), "cents": c})
            .group_by(["band"])
            .aggregate([("cents", "sum"), ([], "count_all")])
            .rename_columns(["band", "cents", "n_parts"])
        )

    agg = tree_aggregate(
        banded.map_batches(
            cents_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["band"],
        [("cents", "sum"), ("n_parts", "sum")],
        ["cents", "n_parts"],
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "band": t.column("band"),
                "n_parts": pc.cast(t.column("n_parts"), pa.int64()),
                "price_sum": pc.divide(
                    pc.cast(t.column("cents"), pa.float64()), 100.0
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_approx_quantiles(sf_dir: str):
    """Approximate p50/p95/p99 of events.value via the mergeable
    KLL-style sketch (stages/sketch.py) — the unbounded-float scale
    path beside the exact cents histogram.

    Oracle-checked since r5 via the approx_top_ngrams trick: k=16384
    exceeds the driver corpus (sf0.01 events = 10k rows), so NO
    compaction fires and the sketch's quantile rule is exactly "the
    rank-ceil(q*n) element" — spelled verbatim in SQL
    (sqloracle ``approx_quantiles``).  At bench scale (sf0.1 = 100k
    rows) compaction engages and the result is approximate again;
    accuracy there is pinned by the rank-error pytest."""
    from rayslog.stages.sketch import approx_quantiles

    return approx_quantiles(
        _read(sf_dir, "events", ["value"]), "value",
        quantiles=(0.5, 0.95, 0.99), k=16_384,
    )


def q_value_quantiles(sf_dir: str):
    """Exact p50/p95/p99 of events.value via a distributed cents
    histogram (inverse-CDF rule, mirrored by the SQL oracle)."""
    from rayslog.stages.aggregate import exact_quantiles_cents

    return exact_quantiles_cents(_read(sf_dir, "events", ["value"]), "value")


def q_contamination_report(sf_dir: str):
    """Eval-side contamination report: for each eval doc (doc_id %
    DECON_EVAL_MOD == 0, >=4 tokens), the fraction of its distinct
    4-grams leaking into ANY train doc — the benchmark owner's view
    of the decontaminate relation."""
    from rayslog.stages.decontam import contamination_report

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return contamination_report(ds, eval_mod=DECON_EVAL_MOD, n=DECON_N)


def q_dup_spans(sf_dir: str):
    """Intra-corpus duplicated-span statistic (Lee et al. 2022 exact
    substring dedup, gram granularity): per doc, the fraction of its
    distinct 4-token grams appearing in >= 2 documents."""
    from rayslog.stages.decontam import dup_span_stats

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    # ~40k docs (~2M gram rows, ~60 MB) per resolve group: bounded
    # per-task memory, amortized map_groups machinery (same sizing
    # rationale as dedup.tuned_bucket_parts)
    n_docs = _table_rows(sf_dir, "documents")
    return dup_span_stats(
        ds, n=4, parts=max(8, min(8192, -(-n_docs // 40_000)))
    )


def q_top_docs_by_lang(sf_dir: str):
    """Distributed window rank — row_number() OVER (PARTITION BY lang
    ORDER BY n_chars DESC, doc_id) <= 5 — via the re-applicable
    per-batch top-k + combiner-tree plan (no sort-shuffle)."""
    from rayslog.stages.aggregate import grouped_top_k

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    return grouped_top_k(ds, "lang", "n_chars", "doc_id", k=5)


#: exact-k sample parameters shared by the Ray query AND its SQL oracle
SAMPLE_K = 10
SAMPLE_K_SEED = 9

#: percentile band shared by the Ray query AND its SQL oracle
BAND_QUANTILES = (0.05, 0.95)


def q_length_band_filter(sf_dir: str):
    """Percentile-band length gate: keep docs whose token count lies in
    the per-language [p5, p95] band — the standard length-outlier
    filter with thresholds DERIVED from the corpus itself, not fixed.

    One corpus scan: the small (doc_id, lang, n_tokens) feature table
    materializes once, the exact grouped inverse-CDF quantiles reduce
    through the ref-level combiner tree over its blocks (O(langs x
    distinct counts) histogram rows, result is langs x 2 — bounded
    strata, so the driver collect is O(langs)), and the band filter
    re-reads the same blocks with the thresholds as a closure constant
    (was: two full corpus scans + a sort-shuffle quantile pass)."""
    import numpy as np

    from rayslog.stages.aggregate import (
        grouped_quantiles_int_from_refs,
        live_block_refs,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def n_tok(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "lang": t.column("lang"),
                "n_tokens": pc.cast(
                    pc.count_substring_regex(t.column("text"), r"\S+"),
                    pa.int64(),
                ),
            }
        )

    feats = ds.map_batches(
        n_tok, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    lo_lbl = f"p{int(BAND_QUANTILES[0] * 100)}"
    qdf = grouped_quantiles_int_from_refs(
        live_block_refs(feats),
        "lang",
        "n_tokens",
        quantiles=BAND_QUANTILES,
    )
    lo = {}
    hi = {}
    for r in qdf.itertuples():
        (lo if r.q == lo_lbl else hi)[r.lang] = int(r.value)

    langs = sorted(lo)
    lo_arr = np.array([lo[s] for s in langs], dtype=np.int64)
    hi_arr = np.array([hi[s] for s in langs], dtype=np.int64)
    value_set = pa.array(langs, pa.string())

    def band(t: pa.Table) -> pa.Table:
        n = t.column("n_tokens").to_numpy(zero_copy_only=False)
        ii = (
            pc.index_in(t.column("lang"), value_set=value_set)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        keep = (n >= lo_arr[ii]) & (n <= hi_arr[ii])
        return t.filter(pa.array(keep))

    return feats.map_batches(
        band, batch_format="pyarrow", zero_copy_batch=True
    )


def q_sample_k_per_lang(sf_dir: str):
    """EXACT-k deterministic sample per stratum (rate-based sampling
    only hits k in expectation): rank docs within each language by
    splitmix64(doc_id, seed) — a seeded uniform order — ties by
    doc_id, keep rank <= k.  Composes the sampling hash with the
    distributed window-rank operator: per-batch top-k partials ride
    the combiner tree, no shuffle, and two runs (or a run and the SQL
    oracle) pick identical rows."""
    import numpy as np

    from rayslog.stages.aggregate import grouped_top_k
    from rayslog.stages.sample import splitmix64

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def add_h(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        if len(ids) and ids.min() < 0:
            raise ValueError("sample_k: negative doc_id (SQL parity)")
        h = splitmix64(ids.astype(np.uint64), SAMPLE_K_SEED)
        return t.append_column("__h", pa.array(h))

    withh = ds.map_batches(
        add_h, batch_format="pyarrow", zero_copy_batch=True
    )
    ranked = grouped_top_k(
        withh, "lang", "__h", "doc_id", k=SAMPLE_K, ascending=True
    )
    return ranked.select_columns(["doc_id", "lang", "rank"])


def q_distinct_users_by_type(sf_dir: str):
    """Exact count(DISTINCT user_id) per event_type: per-batch pair
    dedupe (the combiner), ONE pair-dedupe shuffle, tree-combined
    counts."""
    from rayslog.stages.aggregate import distinct_count_by

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    return distinct_count_by(ds, "event_type", "user_id")


def q_promo_revenue(sf_dir: str):
    """TPC-H Q14-shaped promo-revenue ratio (one ship month).  The part
    dim auto-selects broadcast vs the distributed hash_join leg on
    parquet-metadata row count (the regional_revenue pattern)."""
    import os

    import pyarrow.parquet as pq

    from rayslog.stages.relational import promo_revenue_cents

    thresh = int(os.environ.get("RAYSLOG_BROADCAST_MAX_ROWS", 4_000_000))
    if _table_rows(sf_dir, "part") <= thresh:
        part_side = pq.read_table(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
        ).to_pandas()
    else:
        part_side = _read(sf_dir, "part", ["p_partkey", "p_type"])
    return promo_revenue_cents(
        _read(
            sf_dir,
            "lineitem",
            ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
        ),
        part_side,
    )


def q_returned_top_customers(sf_dir: str):
    """TPC-H Q10-shaped: top-20 customers by returned-item revenue in
    one quarter, names via k-key filtered read + 25-row nation const."""
    import pyarrow.parquet as pq

    from rayslog.stages.relational import returned_item_revenue

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    return returned_item_revenue(
        _read(
            sf_dir,
            "lineitem",
            ["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
        ),
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]),
        customer_path=f"{sf_dir}/customer.parquet",
        nation_df=nation,
    )


def q_large_orders(sf_dir: str):
    """TPC-H Q18-shaped: orders with total quantity > 250, top-100 by
    price (HAVING filter inside the orderkey exchange, survivors join
    orders in ref-land)."""
    from rayslog.stages.relational import large_orders

    return large_orders(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]),
        _read(
            sf_dir,
            "orders",
            ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
        ),
    )


def q_brand_supplier_counts(sf_dir: str):
    """TPC-H Q16-shaped: distinct suppliers per (brand, size); part
    attrs broadcast, distinct rides the combiner tree."""
    import pyarrow.parquet as pq

    from rayslog.stages.relational import brand_supplier_counts

    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    ).to_pandas()
    return brand_supplier_counts(
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]), part
    )


def q_idle_customers(sf_dir: str):
    """TPC-H Q22-shaped: above-average-balance customers with no
    orders, per nation (scalar combiner tree + distributed ANTI join)."""
    from rayslog.stages.relational import idle_customer_stats

    return idle_customer_stats(
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"]),
        _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]),
    )


def q_ship_latency(sf_dir: str):
    """Average order→ship latency (days) per order priority — the
    date-math join family (sign-safe day-number subtraction)."""
    from rayslog.stages.relational import ship_latency_by_priority

    return ship_latency_by_priority(
        _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]),
        _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]),
    )


def q_event_gaps(sf_dir: str):
    """Per-event-type inter-arrival gap stats (the LAG window shape):
    one user-hash exchange + vectorized lexsort/diff, exact µs sums."""
    from rayslog.stages.events import event_gap_stats

    return event_gap_stats(
        _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    )


def q_co_purchase_pairs(sf_dir: str):
    """Market-basket co-occurrence: top-50 part pairs by shared-order
    count (order-part dedupe -> vectorized pair expansion -> pair-hash
    count exchange -> top-k tree)."""
    from rayslog.stages.relational import co_purchase_pairs

    return co_purchase_pairs(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    )


def q_lang_quartiles(sf_dir: str):
    """NTILE(4) length quartile of every document within its language
    (the grouped window-function shape)."""
    import pyarrow.compute as pc_

    from rayslog.stages.aggregate import grouped_ntile

    out = grouped_ntile(
        _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"]),
        "lang",
        ["n_chars", "doc_id"],
        n=4,
        out_col="quartile",
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("doc_id"),
                "lang": t.column("lang"),
                "quartile": pc_.cast(t.column("quartile"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_rolling_avg(sf_dir: str):
    """Per-event rolling mean of the user's last 4 values (the
    frame-window ROWS BETWEEN shape) — exact int-cents prefix sums."""
    from rayslog.stages.events import rolling_value_avg

    return rolling_value_avg(
        _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"]),
        window_rows=4,
    )


def q_drop_reconcile(sf_dir: str):
    """FULL OUTER reconciliation of two overlapping document drops
    (even-id vs third-id slices): per-presence-status doc counts and
    char totals.  Exercises hash_join(how="full") — unmatched rows of
    BOTH sides survive with coalesced keys; the classification +
    count rides one partial task per join bucket + the combiner tree."""
    import numpy as np
    import pyarrow.compute as pc_
    import ray
    import ray.data as rd

    from rayslog.stages.aggregate import tree_reduce_refs
    from rayslog.stages.relational import hash_join

    def side(mod: int, out: str):
        def fn(t: pa.Table) -> pa.Table:
            keep = pc_.equal(
                pc_.subtract(
                    t.column("doc_id"),
                    pc_.multiply(
                        pc_.divide(t.column("doc_id"),
                                   pa.scalar(mod, pa.int64())),
                        pa.scalar(mod, pa.int64()),
                    ),
                ),
                pa.scalar(0, pa.int64()),
            )
            t = t.filter(keep)
            return pa.table(
                {"doc_id": t.column("doc_id"), out: t.column("n_chars")}
            )

        return fn

    docs = lambda out, mod: _read(sf_dir, "documents", ["doc_id", "n_chars"]).map_batches(  # noqa: E731
        side(mod, out), batch_format="pyarrow", zero_copy_batch=True
    )
    jrefs = hash_join(
        docs("left_chars", 2), docs("right_chars", 3),
        key="doc_id", how="full", return_refs=True,
    )

    @ray.remote
    def classify(t: pa.Table) -> pa.Table:
        lv = pc_.is_valid(t.column("left_chars"))
        rv = pc_.is_valid(t.column("right_chars"))
        status = pc_.if_else(
            pc_.and_(lv, rv),
            pa.scalar("both"),
            pc_.if_else(lv, pa.scalar("left_only"),
                        pa.scalar("right_only")),
        )
        chars = pc_.coalesce(t.column("left_chars"),
                             t.column("right_chars"))
        return (
            pa.table(
                {
                    "status": status,
                    "total_chars": chars,
                    "n_docs": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                }
            )
            .group_by(["status"])
            .aggregate([("total_chars", "sum"), ("n_docs", "sum")])
            .rename_columns(["status", "total_chars", "n_docs"])
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["status"])
            .aggregate([("total_chars", "sum"), ("n_docs", "sum")])
            .rename_columns(["status", "total_chars", "n_docs"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "status": t.column("status"),
                "n_docs": pc_.cast(t.column("n_docs"), pa.int64()),
                "total_chars": pc_.cast(t.column("total_chars"), pa.int64()),
            }
        )

    return rd.from_arrow(
        tree_reduce_refs(
            [classify.remote(r) for r in jrefs], reduce_fn,
            final_fn=final_fn,
        )
    )


def q_events_cube(sf_dir: str):
    """``GROUP BY CUBE(event_type, hour)`` event counts: leaf cells
    plus BOTH one-dimension subtotals and the grand total, NULL keys
    marking collapsed levels (the SQL convention).  Leaf aggregation is
    the combiner tree; all three subtotal levels derive from the
    reduced leaf block itself (bounded 5x24 domain) — no extra corpus
    pass (the traffic_rollup pattern, extended to the full cube)."""
    from rayslog.stages.aggregate import counts_by

    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def add_hour(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "hour": pc.cast(pc.hour(t.column("ts")), pa.int32()),
            }
        )

    leaf = counts_by(
        ds.map_batches(add_hour, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "hour"],
        alias="n_events",
        final="tree",
    )

    def cube(t: pa.Table) -> pa.Table:
        et_t = t.schema.field("event_type").type
        hr_t = t.schema.field("hour").type

        def collapse(keys: list[str]) -> pa.Table:
            g = (
                t.select([*keys, "n_events"])
                .group_by(keys)
                .aggregate([("n_events", "sum")])
                .rename_columns([*keys, "n_events"])
            )
            n = len(g)
            return pa.table(
                {
                    "event_type": (
                        g.column("event_type")
                        if "event_type" in keys
                        else pa.nulls(n, et_t)
                    ),
                    "hour": (
                        g.column("hour") if "hour" in keys
                        else pa.nulls(n, hr_t)
                    ),
                    "n_events": g.column("n_events"),
                }
            )

        total = pa.table(
            {
                "event_type": pa.nulls(1, et_t),
                "hour": pa.nulls(1, hr_t),
                "n_events": pa.array(
                    [pc.sum(t.column("n_events")).as_py()], pa.int64()
                ),
            }
        )
        return pa.concat_tables(
            [
                t.select(["event_type", "hour", "n_events"]),
                collapse(["event_type"]),
                collapse(["hour"]),
                total,
            ]
        )

    # the reduced leaf is ONE block: batch_size=None keeps it whole
    return leaf.map_batches(
        cube, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


#: the pivot column domain — a PIVOT needs a known, fixed column set
#: (a data-dependent set would make the output schema nondeterministic)
_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_event_pivot(sf_dir: str):
    """Hour-of-day × event-type PIVOT: one row per hour with a count
    column per (fixed, documented) event type.  Same tree-reduced leaf
    as the cube; the pivot is a vectorized index_in/take per type over
    the single reduced block."""
    import numpy as np

    from rayslog.stages.aggregate import counts_by

    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def add_hour(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "hour": pc.cast(pc.hour(t.column("ts")), pa.int32()),
            }
        )

    leaf = counts_by(
        ds.map_batches(add_hour, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "hour"],
        alias="n_events",
        final="tree",
    )

    def pivot(t: pa.Table) -> pa.Table:
        hours = pc.unique(t.column("hour")).sort()
        cols = {"hour": hours}
        for et in _EVENT_TYPES:
            sub = t.filter(pc.equal(t.column("event_type"), pa.scalar(et)))
            idx = pc.index_in(hours, value_set=sub.column("hour"))
            cnt = pc.take(sub.column("n_events"), idx)
            cols[f"n_{et}"] = pc.coalesce(cnt, pa.scalar(0, pa.int64()))
        return pa.table(cols)

    return leaf.map_batches(
        pivot, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def q_above_avg_orders(sf_dir: str):
    """Correlated-subquery shape: orders priced above their CUSTOMER's
    average order value, counted per order priority.

    One custkey-hash exchange resolves the correlation: each part holds
    a customer's orders whole, so the per-customer mean and the filter
    run in the same vectorized pass.  The comparison is exact integer
    arithmetic — price > avg  ⟺  price_c * n > sum_c — so no float
    threshold can drift vs the oracle (which spells the same integer
    inequality via window sums)."""
    import numpy as np

    from rayslog.stages.aggregate import task_exchange, tree_aggregate

    parts = 64

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.round(
            pc.multiply(t.column("o_totalprice"), pa.scalar(100.0))
        ).cast(pa.int64())
        u = t.column("o_custkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "o_orderpriority": t.column("o_orderpriority"),
                "cents": cents,
                "cpart": pa.array(
                    (u.astype(np.uint64) % np.uint64(parts)).astype(np.int32)
                ),
            }
        )

    _empty = pa.table(
        {
            "o_orderpriority": pa.array([], pa.string()),
            "n_above": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        u = t.column("o_custkey").to_numpy(zero_copy_only=False)
        c = t.column("cents").to_numpy(zero_copy_only=False)
        order = np.argsort(u, kind="stable")
        us, cs = u[order], c[order]
        starts = np.r_[0, np.nonzero(us[1:] != us[:-1])[0] + 1]
        lens = np.diff(np.r_[starts, len(us)])
        sums = np.add.reduceat(cs, starts)
        n_r = np.repeat(lens, lens)
        sum_r = np.repeat(sums, lens)
        above = cs * n_r > sum_r  # exact: price_c * n > sum_c
        et = t.column("o_orderpriority")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        pri = et.take(pa.array(order[above]))
        return (
            pa.table(
                {
                    "o_orderpriority": pri,
                    "n_above": pa.array(
                        np.ones(int(above.sum()), dtype=np.int64)
                    ),
                }
            )
            .group_by(["o_orderpriority"])
            .aggregate([("n_above", "sum")])
            .rename_columns(["o_orderpriority", "n_above"])
        )

    partials = task_exchange(
        _read(
            sf_dir, "orders", ["o_custkey", "o_totalprice", "o_orderpriority"]
        ).map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        "cpart",
        parts,
        per_part,
    )
    agg = tree_aggregate(
        partials, ["o_orderpriority"], [("n_above", "sum")], ["n_above"]
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "o_orderpriority": t.column("o_orderpriority"),
                "n_above": pc.cast(t.column("n_above"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_triangle_count(sf_dir: str):
    """Triangles in the part co-purchase graph (graph analytics beyond
    connected components): distinct-edge build -> min-vertex wedge
    expansion -> distributed SEMI join against the edge set."""
    from rayslog.stages.relational import triangle_count

    return triangle_count(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    )


def q_rolling_time(sf_dir: str):
    """RANGE-frame rolling window: per event, count + value sum of the
    user's events in the trailing 300s (timestamp peers in-frame)."""
    from rayslog.stages.events import rolling_time_stats

    return rolling_time_stats(
        _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"]),
        window_sec=300,
    )


def q_value_variance(sf_dir: str):
    """Exact population variance of event value per type, via integer
    (sum, sum-of-squares, n) partials and ONE double evaluation of the
    naive formula at the end — DuckDB's var_pop streams Welford-style
    and differs in final ulps, so the oracle spells the SAME explicit
    expression tree.  int64 bound: sum of squared cents fits 2^63 for
    ~4e9 rows at |value|<=500 — past that, widen to per-block double
    partials and a rows-only check."""
    from rayslog.stages.aggregate import tree_reduce

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        c = pc.round(
            pc.multiply(t.column("value"), pa.scalar(100.0))
        ).cast(pa.int64())
        return (
            pa.table(
                {
                    "event_type": t.column("event_type"),
                    "s": c,
                    "s2": pc.multiply(c, c),
                    "n": pa.array(
                        __import__("numpy").ones(t.num_rows, dtype="int64")
                    ),
                }
            )
            .group_by(["event_type"])
            .aggregate([("s", "sum"), ("s2", "sum"), ("n", "sum")])
            .rename_columns(["event_type", "s", "s2", "n"])
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.select(["event_type", "s", "s2", "n"])
            .group_by(["event_type"])
            .aggregate([("s", "sum"), ("s2", "sum"), ("n", "sum")])
            .rename_columns(["event_type", "s", "s2", "n"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        import numpy as np

        s = t.column("s").to_numpy(zero_copy_only=False).astype(np.float64)
        s2 = t.column("s2").to_numpy(zero_copy_only=False).astype(np.float64)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        var = (s2 - s * s / n) / n / 10_000.0
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "n_events": pc.cast(t.column("n"), pa.int64()),
                "var_value": pa.array(var),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "n_events": pa.array([], pa.int64()),
                    "var_value": pa.array([], pa.float64()),
                }
            )
        )

    return tree_reduce(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        reduce_fn,
        empty_fn=empty_fn,
        final_fn=final_fn,
    )


def q_last_event_per_user(sf_dir: str):
    """Latest event per user (the grouped argmax / LAST_VALUE shape):
    per-block per-user argmax partials ride the combiner tree — argmax
    by (ts, event_id) is re-applicable, so no exchange at all."""
    from rayslog.stages.aggregate import tree_reduce

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def argmax(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("user_id", "ascending"),
                ("ts", "descending"),
                ("event_id", "descending"),
            ],
        )
        s = t.take(idx)
        import numpy as np

        u = s.column("user_id")
        if isinstance(u, pa.ChunkedArray):
            u = u.combine_chunks()
        codes = np.asarray(u.dictionary_encode().indices)
        first = np.r_[True, codes[1:] != codes[:-1]]
        return s.filter(pa.array(first)).select(
            ["user_id", "ts", "event_id", "event_type"]
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "ts": pa.array([], pa.timestamp("us")),
                    "event_id": pa.array([], pa.int64()),
                    "event_type": pa.array([], pa.string()),
                }
            )
        )

    return tree_reduce(
        ds.map_batches(argmax, batch_format="pyarrow", zero_copy_batch=True),
        argmax,
        empty_fn=empty_fn,
    )


def q_dominant_event_type(sf_dir: str):
    """Grouped MODE with a deterministic tie-break: each user's most
    frequent event type (ties broken by event_type asc — DuckDB's
    mode() picks an arbitrary member, so the oracle spells the same
    count/row_number ordering instead).  Per-block (user, type) count
    partials ride one user-hash exchange; the per-user argmax is a
    vectorized lexsort + first-of-run pass per part."""
    import numpy as np

    from rayslog.stages.aggregate import task_exchange

    parts = 64

    def partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(["user_id", "event_type"])
            .group_by(["user_id", "event_type"])
            .aggregate([([], "count_all")])
            .rename_columns(["user_id", "event_type", "n"])
        )
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        return g.append_column(
            "upart",
            pa.array((u.astype(np.uint64) % np.uint64(parts)).astype(np.int32)),
        )

    _empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "event_type": pa.array([], pa.string()),
            "n_events": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        g = (
            t.select(["user_id", "event_type", "n"])
            .group_by(["user_id", "event_type"])
            .aggregate([("n", "sum")])
            .rename_columns(["user_id", "event_type", "n"])
        )
        idx = pc.sort_indices(
            g,
            sort_keys=[
                ("user_id", "ascending"),
                ("n", "descending"),
                ("event_type", "ascending"),
            ],
        )
        s = g.take(idx)
        import numpy as np

        u = s.column("user_id").to_numpy(zero_copy_only=False)
        first = np.r_[True, u[1:] != u[:-1]]
        s = s.filter(pa.array(first))
        return pa.table(
            {
                "user_id": s.column("user_id"),
                "event_type": s.column("event_type"),
                "n_events": pc.cast(s.column("n"), pa.int64()),
            }
        )

    return task_exchange(
        _read(sf_dir, "events", ["user_id", "event_type"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        "upart",
        parts,
        per_part,
    )


def q_value_histogram(sf_dir: str):
    """Fixed-bin histogram of event values (25-unit bins, clipped to
    [0, 19]): per-block bin counts + the combiner tree — the
    one-pass distributed histogram shape."""
    from rayslog.stages.aggregate import counts_by

    ds = _read(sf_dir, "events", ["value"])

    def binit(t: pa.Table) -> pa.Table:
        b = pc.floor(pc.divide(t.column("value"), pa.scalar(25.0)))
        b = pc.min_element_wise(
            pc.max_element_wise(pc.cast(b, pa.int64()),
                                pa.scalar(0, pa.int64())),
            pa.scalar(19, pa.int64()),
        )
        return pa.table({"bin": b})

    return counts_by(
        ds.map_batches(binit, batch_format="pyarrow", zero_copy_batch=True),
        ["bin"],
        alias="n_events",
        final="tree",
    )


def q_nation_trade_volume(sf_dir: str):
    """TPC-H Q7-shaped cross-nation trade matrix: revenue per
    (supp_nation, cust_nation) pair, nations distinct, 1996-1997
    orders.  Customer/supplier legs auto-select broadcast vs
    distributed hash_join exactly like q_regional_revenue."""
    import os

    import pyarrow.parquet as pq

    from rayslog.stages.relational import nation_trade_volume_cents

    thresh = int(os.environ.get("RAYSLOG_BROADCAST_MAX_ROWS", 4_000_000))

    def dim(table: str, cols: list[str]):
        if _table_rows(sf_dir, table) <= thresh:
            return pq.read_table(
                f"{sf_dir}/{table}.parquet", columns=cols
            ).to_pandas()
        return _read(sf_dir, table, cols)

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    return nation_trade_volume_cents(
        _read(
            sf_dir,
            "lineitem",
            ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        ),
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]),
        dim("customer", ["c_custkey", "c_nationkey"]),
        dim("supplier", ["s_suppkey", "s_nationkey"]),
        nation,
    )


def q_user_retention(sf_dir: str):
    """Daily cohort retention: users bucketed by first-activity day,
    counted once per (cohort_day, day_offset) they were active — the
    classic product-analytics retention matrix.  Per-block distinct
    (user, day) partials ride one user-hash exchange (every activity
    day of a user lands in the same part, so the cohort min and the
    offsets are part-local); the final (cohort, offset) count — a
    bounded ~30x30 domain — collapses through the counts combiner
    tree, never a sort-shuffle."""
    import numpy as np

    from rayslog.stages.aggregate import counts_by, task_exchange

    parts = 64

    def partial(t: pa.Table) -> pa.Table:
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        day = ts // 1_000_000 // 86_400
        g = (
            pa.table({"user_id": u, "day": day})
            .group_by(["user_id", "day"])
            .aggregate([])
        )
        uu = g.column("user_id").to_numpy(zero_copy_only=False)
        return g.append_column(
            "upart",
            pa.array((uu.astype(np.uint64) % np.uint64(parts)).astype(
                np.int32
            )),
        )

    _empty = pa.table(
        {
            "cohort_day": pa.array([], pa.int64()),
            "day_offset": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        g = (
            t.select(["user_id", "day"])
            .group_by(["user_id", "day"])
            .aggregate([])
        )
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        d = g.column("day").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, u))
        u, d = u[order], d[order]
        first = np.r_[True, u[1:] != u[:-1]]
        # index of each row's run start (runs are user-contiguous and
        # day-ascending, so the run start holds the user's cohort day)
        run_start = np.maximum.accumulate(
            np.where(first, np.arange(len(u)), 0)
        )
        cohort = d[run_start]
        return pa.table(
            {
                "cohort_day": pa.array(cohort, pa.int64()),
                "day_offset": pa.array(d - cohort, pa.int64()),
            }
        )

    pairs = task_exchange(
        _read(sf_dir, "events", ["user_id", "ts"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        "upart",
        parts,
        per_part,
    )
    return counts_by(
        pairs, ["cohort_day", "day_offset"], alias="n_users", final="tree"
    )


def q_top_open_orders(sf_dir: str):
    """TPC-H Q3-shaped shipping priority: top-10 BUILDING-segment
    orders by revenue still unshipped at the cutoff.  Customer leg
    auto-selects broadcast vs distributed SEMI hash_join."""
    import os

    import pyarrow.parquet as pq

    from rayslog.stages.relational import top_open_orders_cents

    thresh = int(os.environ.get("RAYSLOG_BROADCAST_MAX_ROWS", 4_000_000))
    if _table_rows(sf_dir, "customer") <= thresh:
        cust = pq.read_table(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_mktsegment"],
        ).to_pandas()
    else:
        cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    return top_open_orders_cents(
        _read(
            sf_dir,
            "lineitem",
            ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
        ),
        _read(
            sf_dir,
            "orders",
            ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        ),
        cust,
    )


def q_special_deal_revenue(sf_dir: str):
    """TPC-H Q19-shaped disjunctive-predicate revenue: one scalar row
    summing lineitems matching any (brand, size, quantity-band) deal
    arm.  Part dim auto-selects broadcast vs hash_join."""
    import os

    import pyarrow.parquet as pq

    from rayslog.stages.relational import special_deal_revenue_cents

    thresh = int(os.environ.get("RAYSLOG_BROADCAST_MAX_ROWS", 4_000_000))
    if _table_rows(sf_dir, "part") <= thresh:
        part = pq.read_table(
            f"{sf_dir}/part.parquet",
            columns=["p_partkey", "p_brand", "p_size"],
        ).to_pandas()
    else:
        part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    return special_deal_revenue_cents(
        _read(
            sf_dir,
            "lineitem",
            ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        ),
        part,
    )


def q_user_value_running(sf_dir: str):
    """Cumulative window per user (SUM/COUNT OVER ROWS UNBOUNDED
    PRECEDING ordered by ts, event_id) — the running-total shape that
    completes the window family."""
    from rayslog.stages.events import running_value_sum

    return running_value_sum(
        _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])
    )


def q_distinct_parts_by_supplier(sf_dir: str):
    """Exact count(DISTINCT l_partkey) per supplier — the
    high-group-cardinality regime of distinct_count_by (10k+ suppliers
    vs distinct_users_by_type's 5 event types)."""
    from rayslog.stages.aggregate import distinct_count_by

    return distinct_count_by(
        _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey"]),
        "l_suppkey",
        "l_partkey",
        alias="n_parts",
    )


def q_page_rank(sf_dir: str):
    """Integer fixed-point PageRank (3 rounds, damping 85/100 as exact
    integer floors) over the co-purchase graph — the iterative BSP
    graph shape; oracle is the unrolled 3-iteration CTE."""
    from rayslog.stages.relational import page_rank_copurchase

    return page_rank_copurchase(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    )


def q_min_cost_supplier(sf_dir: str):
    """TPC-H Q2-shaped cheapest supplier per size-15 part (grouped
    argmin with tie-break, dim names attached on the final rows via
    key-filtered reads)."""
    import pyarrow.parquet as pq

    from rayslog.stages.relational import min_cost_supplier

    return min_cost_supplier(
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_suppkey", "l_extendedprice"]),
        part_path=f"{sf_dir}/part.parquet",
        supplier_path=f"{sf_dir}/supplier.parquet",
        nation_df=pq.read_table(
            f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
        ).to_pandas(),
    )


def q_nation_market_share(sf_dir: str):
    """TPC-H Q8-shaped market share: per order year, the revenue
    fraction EUROPE-region customers sourced from nation 3's
    suppliers.  Dim legs auto-select broadcast vs hash_join like
    q_regional_revenue; the share is one exact-int division per year."""
    import os

    import pyarrow.parquet as pq

    from rayslog.stages.relational import nation_market_share_cents

    thresh = int(os.environ.get("RAYSLOG_BROADCAST_MAX_ROWS", 4_000_000))

    def dim(table: str, cols: list[str]):
        if _table_rows(sf_dir, table) <= thresh:
            return pq.read_table(
                f"{sf_dir}/{table}.parquet", columns=cols
            ).to_pandas()
        return _read(sf_dir, table, cols)

    return nation_market_share_cents(
        _read(
            sf_dir,
            "lineitem",
            ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        ),
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]),
        dim("customer", ["c_custkey", "c_nationkey"]),
        dim("supplier", ["s_suppkey", "s_nationkey"]),
        pq.read_table(
            f"{sf_dir}/nation.parquet",
            columns=["n_nationkey", "n_name", "n_regionkey"],
        ).to_pandas(),
        pq.read_table(
            f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
        ).to_pandas(),
    )


def q_important_parts(sf_dir: str):
    """TPC-H Q11-shaped global-threshold share: parts whose revenue
    exceeds 0.075% of total revenue, threshold compared in exact
    integer arithmetic."""
    from rayslog.stages.relational import important_parts

    return _schema_safe(important_parts(
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_extendedprice", "l_discount"])
    ))


def q_quantity_price_corr(sf_dir: str):
    """Grouped Pearson correlation (quantity vs price per brand) from
    exact integer moments; part dim auto-selects broadcast vs
    hash_join."""
    import os

    import pyarrow.parquet as pq

    from rayslog.stages.relational import quantity_price_corr

    thresh = int(os.environ.get("RAYSLOG_BROADCAST_MAX_ROWS", 4_000_000))
    if _table_rows(sf_dir, "part") <= thresh:
        part = pq.read_table(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
        ).to_pandas()
    else:
        part = _read(sf_dir, "part", ["p_partkey", "p_brand"])
    return quantity_price_corr(
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_quantity", "l_extendedprice"]),
        part,
    )


def q_event_transitions(sf_dir: str):
    """Per-user event-type transition counts (LAG over each user's
    timeline) — the Markov next-action matrix."""
    from rayslog.stages.events import event_transitions

    return event_transitions(
        _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    )


def q_co_purchase_degree(sf_dir: str):
    """Degree histogram of the distinct co-purchase graph (shared edge
    build with page_rank/triangle_count)."""
    from rayslog.stages.relational import co_purchase_degree

    return co_purchase_degree(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    )


def q_customer_spend_pctile(sf_dir: str):
    """PERCENT_RANK of customer total spend within nation (distributed
    window percentile; customer dim auto-selects broadcast vs
    hash_join)."""
    import os

    import pyarrow.parquet as pq

    from rayslog.stages.relational import customer_spend_pctile

    thresh = int(os.environ.get("RAYSLOG_BROADCAST_MAX_ROWS", 4_000_000))
    if _table_rows(sf_dir, "customer") <= thresh:
        cust = pq.read_table(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_nationkey"],
        ).to_pandas()
    else:
        cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    return customer_spend_pctile(
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]), cust
    )


def q_product_profit(sf_dir: str):
    """TPC-H Q9-shaped profit by (nation, order year) for parts whose
    name contains 'red' (retail price stands in for supply cost —
    this corpus has no partsupp).  Part/supplier legs auto-select
    broadcast vs hash_join on the row threshold."""
    import os

    import pyarrow.parquet as pq

    from rayslog.stages.relational import product_profit

    thresh = int(os.environ.get("RAYSLOG_BROADCAST_MAX_ROWS", 4_000_000))

    def dim(table: str, cols: list[str]):
        if _table_rows(sf_dir, table) <= thresh:
            return pq.read_table(
                f"{sf_dir}/{table}.parquet", columns=cols
            ).to_pandas()
        return _read(sf_dir, table, cols)

    return product_profit(
        _read(
            sf_dir,
            "lineitem",
            [
                "l_orderkey",
                "l_partkey",
                "l_suppkey",
                "l_quantity",
                "l_extendedprice",
                "l_discount",
            ],
        ),
        _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]),
        dim("part", ["p_partkey", "p_name", "p_retailprice"]),
        dim("supplier", ["s_suppkey", "s_nationkey"]),
        pq.read_table(
            f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
        ).to_pandas(),
    )


def q_top_supplier(sf_dir: str):
    """TPC-H Q15-shaped global-max supplier revenue over 1996Q1
    shipments (tie-aware; names via k-key filtered read)."""
    from rayslog.stages.relational import top_supplier

    return top_supplier(
        _read(
            sf_dir,
            "lineitem",
            ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
        ),
        supplier_path=f"{sf_dir}/supplier.parquet",
    )


def q_action_trigrams(sf_dir: str):
    """Per-user ordered action trigram counts (sequence mining over
    each user's timeline; one user-hash exchange + double shifted
    compare)."""
    from rayslog.stages.events import action_trigrams

    return action_trigrams(
        _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    )


def q_small_qty_revenue(sf_dir: str):
    """TPC-H Q17-shaped correlated filter: revenue from lineitems of
    one brand whose quantity is below 0.2x that part's average
    quantity.  One partkey-hash exchange resolves the correlation;
    the 0.2x-avg compare is exact integer arithmetic
    (``5*qty_c*n < sum_qty_c``) so no float threshold can drift vs
    the oracle."""
    import os

    import numpy as np
    import pyarrow.parquet as pq
    import ray

    from rayslog.stages.aggregate import task_exchange, tree_reduce
    from rayslog.stages.relational import _cached_lookup, hash_join

    brand = "Brand#13"
    parts = 64
    thresh = int(os.environ.get("RAYSLOG_BROADCAST_MAX_ROWS", 4_000_000))

    line = _read(
        sf_dir,
        "lineitem",
        ["l_partkey", "l_quantity", "l_extendedprice"],
    )

    def proj(t: pa.Table) -> pa.Table:
        u = t.column("l_partkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_partkey": pc.cast(t.column("l_partkey"), pa.int64()),
                "qc": pc.round(
                    pc.multiply(t.column("l_quantity"), pa.scalar(100.0))
                ).cast(pa.int64()),
                "rc": pc.round(
                    pc.multiply(t.column("l_extendedprice"), pa.scalar(100.0))
                ).cast(pa.int64()),
                "ppart": pa.array(
                    (u.astype(np.uint64) % np.uint64(parts)).astype(np.int32)
                ),
            }
        )

    if _table_rows(sf_dir, "part") <= thresh:
        pk = pq.read_table(
            f"{sf_dir}/part.parquet",
            columns=["p_partkey", "p_brand"],
            filters=[("p_brand", "=", brand)],
        )
        pk_keys = pk.column("p_partkey").to_numpy()
        pk_ref = ray.put((pk_keys, pk_keys))

        def keep_brand(t: pa.Table) -> pa.Table:
            keys, _ = _cached_lookup(pk_ref)
            return t.filter(pc.is_in(t.column("l_partkey"), value_set=keys))

        kept = line.map_batches(
            proj, batch_format="pyarrow", zero_copy_batch=True
        ).map_batches(
            keep_brand, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        part_keys = _read(sf_dir, "part", ["p_partkey", "p_brand"]).map_batches(
            lambda t: pa.table(
                {
                    "l_partkey": pc.cast(
                        t.filter(
                            pc.equal(t.column("p_brand"), brand)
                        ).column("p_partkey"),
                        pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        kept = hash_join(
            line.map_batches(
                proj, batch_format="pyarrow", zero_copy_batch=True
            ),
            part_keys,
            key="l_partkey",
            how="semi",
        )

    _empty = pa.table(
        {
            "n_small": pa.array([], pa.int64()),
            "rc": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        u = t.column("l_partkey").to_numpy(zero_copy_only=False)
        qc = t.column("qc").to_numpy(zero_copy_only=False)
        rc = t.column("rc").to_numpy(zero_copy_only=False)
        order = np.argsort(u, kind="stable")
        us, qs, rs = u[order], qc[order], rc[order]
        starts = np.r_[0, np.nonzero(us[1:] != us[:-1])[0] + 1]
        lens = np.diff(np.r_[starts, len(us)])
        sums = np.add.reduceat(qs, starts)
        n_r = np.repeat(lens, lens)
        sum_r = np.repeat(sums, lens)
        small = 5 * qs * n_r < sum_r  # exact: qty < 0.2*avg
        return pa.table(
            {
                "n_small": pa.array([int(small.sum())], pa.int64()),
                "rc": pa.array([int(rs[small].sum())], pa.int64()),
            }
        )

    partials = task_exchange(kept, "ppart", parts, per_part)

    def reduce_fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_small": pa.array(
                    [pc.sum(t.column("n_small")).as_py() or 0], pa.int64()
                ),
                "rc": pa.array(
                    [pc.sum(t.column("rc")).as_py() or 0], pa.int64()
                ),
            }
        )

    def final_fn(t: pa.Table) -> pa.Table:
        rev = pc.divide(pc.cast(t.column("rc"), pa.float64()), 100.0)
        return pa.table(
            {
                "n_small": t.column("n_small"),
                "total_revenue": rev,
                "avg_yearly": pc.divide(rev, 7.0),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(final_fn(reduce_fn(_empty)))

    return tree_reduce(
        partials, reduce_fn, empty_fn=empty_fn, final_fn=final_fn
    )


def q_monthly_growth(sf_dir: str):
    """Monthly order revenue with the month-over-month growth ratio
    (LAG over an aggregated series): per-block grouped partials ride
    the combiner tree; the tiny month series sorts and shifts once on
    the final block."""
    import numpy as np

    from rayslog.stages.aggregate import tree_reduce

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.round(
            pc.multiply(t.column("o_totalprice"), pa.scalar(100.0))
        ).cast(pa.int64())
        return (
            pa.table(
                {
                    "month": pc.floor_temporal(
                        t.column("o_orderdate"), unit="month"
                    ),
                    "c": cents,
                }
            )
            .group_by(["month"])
            .aggregate([("c", "sum")])
            .rename_columns(["month", "c"])
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["month"])
            .aggregate([("c", "sum")])
            .rename_columns(["month", "c"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        t = t.sort_by([("month", "ascending")])
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
        ratio = np.full(len(c), np.nan)
        if len(c) > 1:
            # zero-revenue month: DuckDB's x/0 is NULL, not inf/NaN-warn
            prev = c[:-1]
            ratio[1:] = np.where(
                prev == 0, np.nan, c[1:] / np.where(prev == 0, 1.0, prev)
            )
        import pandas as pd

        return pa.table(
            {
                "month": t.column("month"),
                "revenue": pc.divide(pc.cast(t.column("c"), pa.float64()),
                                     100.0),
                "mom_ratio": pa.Array.from_pandas(
                    pd.Series(ratio), type=pa.float64()
                ),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "month": pa.array([], pa.timestamp("us")),
                    "revenue": pa.array([], pa.float64()),
                    "mom_ratio": pa.array([], pa.float64()),
                }
            )
        )

    return tree_reduce(
        _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        reduce_fn,
        empty_fn=empty_fn,
        final_fn=final_fn,
    )


def q_doc_length_zscore(sf_dir: str):
    """Per-document length z-score within its language — the grouped
    standardization shape.  Pass 1 reduces exact integer moments
    (n, sum, sum-of-squares) per language through the combiner tree
    (<= |langs| rows, collected driver-side); pass 2 broadcasts the
    tiny stats dict and computes z per row in one vectorized
    map_batches.  Every float op is the same IEEE sequence the oracle
    spells (double products of the BIGINT moments — never a >2^63
    int-to-double cast, CLAUDE.md invariant #4), so the comparison
    is hash-exact."""
    import math

    import numpy as np

    from rayslog.stages.aggregate import tree_reduce

    def partial(t: pa.Table) -> pa.Table:
        x = t.column("n_chars")
        return (
            pa.table(
                {
                    "lang": t.column("lang"),
                    "n": pa.array(
                        np.ones(t.num_rows, dtype=np.int64)
                    ),
                    "s": pc.cast(x, pa.int64()),
                    "ss": pc.multiply(
                        pc.cast(x, pa.int64()), pc.cast(x, pa.int64())
                    ),
                }
            )
            .group_by(["lang"])
            .aggregate([("n", "sum"), ("s", "sum"), ("ss", "sum")])
            .rename_columns(["lang", "n", "s", "ss"])
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["lang"])
            .aggregate([("n", "sum"), ("s", "sum"), ("ss", "sum")])
            .rename_columns(["lang", "n", "s", "ss"])
        )

    stats = tree_reduce(
        _read(sf_dir, "documents", ["lang", "n_chars"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        reduce_fn,
    ).to_pandas()

    # lang -> (n_f, s_f, denom_f) with the exact-int variance guard
    lut: dict = {}
    for _, row in stats.iterrows():
        n, s, ss = int(row["n"]), int(row["s"]), int(row["ss"])
        if n > 1 and n * ss - s * s > 0:  # exact Python-int compare
            n_f, s_f, ss_f = float(n), float(s), float(ss)
            denom = n_f * math.sqrt(
                (n_f * ss_f - s_f * s_f) / (n_f * (n_f - 1.0))
            )
            lut[row["lang"]] = (n_f, s_f, denom)

    langs = list(lut)
    n_v = np.array([lut[lg][0] for lg in langs] + [np.nan])
    s_v = np.array([lut[lg][1] for lg in langs] + [np.nan])
    d_v = np.array([lut[lg][2] for lg in langs] + [np.nan])
    lang_set = pa.array(langs, pa.string())

    def zscore(t: pa.Table) -> pa.Table:
        # vectorized lang lookup: index_in + take (missing lang -> NaN
        # sentinel slot -> null z)
        idx = (
            pc.fill_null(
                pc.index_in(t.column("lang"), value_set=lang_set),
                len(langs),
            )
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        x = (
            t.column("n_chars")
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        with np.errstate(invalid="ignore"):
            z = (x * n_v[idx] - s_v[idx]) / d_v[idx]
        import pandas as pd

        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "lang": t.column("lang"),
                "z": pa.Array.from_pandas(pd.Series(z), type=pa.float64()),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"]).map_batches(
        zscore, batch_format="pyarrow", zero_copy_batch=True
    )


def q_customers_per_supplier(sf_dir: str):
    """Distinct customers served per supplier (two-hop orderkey join +
    exact distinct count)."""
    from rayslog.stages.relational import customers_per_supplier

    return customers_per_supplier(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"]),
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]),
    )


def q_full_coverage_suppliers(sf_dir: str):
    """Relational division: suppliers reaching customers in ALL
    regions (customer leg auto-selects broadcast vs hash_join)."""
    import os

    import pyarrow.parquet as pq

    from rayslog.stages.relational import full_coverage_suppliers

    thresh = int(os.environ.get("RAYSLOG_BROADCAST_MAX_ROWS", 4_000_000))
    if _table_rows(sf_dir, "customer") <= thresh:
        cust = pq.read_table(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_nationkey"],
        ).to_pandas()
    else:
        cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    ).to_pandas()
    n_regions = _table_rows(sf_dir, "region")
    return full_coverage_suppliers(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"]),
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]),
        cust,
        nation,
        n_regions,
    )


def q_part_skyline(sf_dir: str):
    """Per-brand Pareto frontier on (size, retail price) — the
    multi-criteria dominance filter."""
    from rayslog.stages.relational import part_skyline

    return part_skyline(
        _read(
            sf_dir, "part",
            ["p_partkey", "p_brand", "p_size", "p_retailprice"],
        )
    )


def q_order_value_deciles(sf_dir: str):
    """Global NTILE(10) over orders by total price — the distributed
    global-window rank (shuffle_shards discipline: range bands,
    ref-tree counts, driver offsets, one exchange)."""
    from rayslog.stages.relational import order_value_deciles

    return order_value_deciles(
        _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    )


def q_repeat_order_share(sf_dir: str):
    """Share of orders placed by repeat customers per month: window
    row_number per customer (one custkey-hash exchange resolves the
    partition) regrouped by order month through the combiner tree."""
    import numpy as np

    from rayslog.stages.aggregate import task_exchange, tree_reduce

    parts = 64

    def prep(t: pa.Table) -> pa.Table:
        u = t.column("o_custkey").to_numpy(zero_copy_only=False)
        ts = t.column("o_orderdate")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        return pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "ts_us": pa.array(
                    ts.cast(pa.timestamp("us"))
                    .cast(pa.int64())
                    .to_numpy(zero_copy_only=False)
                ),
                "month": pc.floor_temporal(
                    t.column("o_orderdate"), unit="month"
                ),
                "o_orderkey": t.column("o_orderkey"),
                "cpart": pa.array(
                    (u.astype(np.uint64) % np.uint64(parts)).astype(np.int32)
                ),
            }
        )

    _empty = pa.table(
        {
            "month": pa.array([], pa.timestamp("us")),
            "n_orders": pa.array([], pa.int64()),
            "n_repeat": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        u = t.column("o_custkey").to_numpy(zero_copy_only=False)
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        ok = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        order = np.lexsort((ok, ts, u))
        us = u[order]
        first = np.r_[True, us[1:] != us[:-1]]
        repeat = np.empty(len(us), dtype=np.int64)
        repeat[order] = (~first).astype(np.int64)
        return (
            pa.table(
                {
                    "month": t.column("month"),
                    "n_orders": pa.array(np.ones(len(us), dtype=np.int64)),
                    "n_repeat": pa.array(repeat),
                }
            )
            .group_by(["month"])
            .aggregate([("n_orders", "sum"), ("n_repeat", "sum")])
            .rename_columns(["month", "n_orders", "n_repeat"])
        )

    partials = task_exchange(
        _read(
            sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate"]
        ).map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        "cpart",
        parts,
        per_part,
    )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["month"])
            .aggregate([("n_orders", "sum"), ("n_repeat", "sum")])
            .rename_columns(["month", "n_orders", "n_repeat"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        t = t.sort_by([("month", "ascending")])
        return pa.table(
            {
                "month": t.column("month"),
                "n_orders": pc.cast(t.column("n_orders"), pa.int64()),
                "n_repeat": pc.cast(t.column("n_repeat"), pa.int64()),
                "repeat_share": pc.divide(
                    pc.cast(t.column("n_repeat"), pa.float64()),
                    pc.cast(t.column("n_orders"), pa.float64()),
                ),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(final_fn(_empty))

    return tree_reduce(
        partials, reduce_fn, empty_fn=empty_fn, final_fn=final_fn
    )


def q_value_mad_by_type(sf_dir: str):
    """Grouped median absolute deviation of event value (exact
    quantile_disc semantics in integer cents)."""
    from rayslog.stages.events import value_mad_by_type

    return value_mad_by_type(_read(sf_dir, "events", ["event_type", "value"]))


def q_cohort_revenue(sf_dir: str):
    """First-purchase cohort LTV triangle: revenue and order count by
    (cohort month, order month).  One custkey-hash exchange resolves
    each customer's cohort (min month) and emits grouped partials in
    the same pass; the tiny triangle rides the combiner tree."""
    import numpy as np

    from rayslog.stages.aggregate import task_exchange, tree_reduce

    parts = 64

    def prep(t: pa.Table) -> pa.Table:
        u = t.column("o_custkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "month_us": pc.floor_temporal(
                    t.column("o_orderdate"), unit="month"
                ).cast(pa.int64()),
                "c": pc.round(
                    pc.multiply(t.column("o_totalprice"), pa.scalar(100.0))
                ).cast(pa.int64()),
                "cpart": pa.array(
                    (u.astype(np.uint64) % np.uint64(parts)).astype(np.int32)
                ),
            }
        )

    _empty = pa.table(
        {
            "cohort_us": pa.array([], pa.int64()),
            "month_us": pa.array([], pa.int64()),
            "c": pa.array([], pa.int64()),
            "n_orders": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        u = t.column("o_custkey").to_numpy(zero_copy_only=False)
        m = t.column("month_us").to_numpy(zero_copy_only=False)
        order = np.argsort(u, kind="stable")
        us, ms = u[order], m[order]
        starts = np.r_[0, np.nonzero(us[1:] != us[:-1])[0] + 1]
        lens = np.diff(np.r_[starts, len(us)])
        cohort_per_group = np.minimum.reduceat(ms, starts)
        cohort = np.empty(len(us), dtype=np.int64)
        cohort[order] = np.repeat(cohort_per_group, lens)
        return (
            pa.table(
                {
                    "cohort_us": pa.array(cohort),
                    "month_us": t.column("month_us"),
                    "c": t.column("c"),
                    "n_orders": pa.array(np.ones(len(us), dtype=np.int64)),
                }
            )
            .group_by(["cohort_us", "month_us"])
            .aggregate([("c", "sum"), ("n_orders", "sum")])
            .rename_columns(["cohort_us", "month_us", "c", "n_orders"])
        )

    partials = task_exchange(
        _read(
            sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"]
        ).map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        "cpart",
        parts,
        per_part,
    )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["cohort_us", "month_us"])
            .aggregate([("c", "sum"), ("n_orders", "sum")])
            .rename_columns(["cohort_us", "month_us", "c", "n_orders"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort": pc.cast(t.column("cohort_us"), pa.timestamp("us")),
                "month": pc.cast(t.column("month_us"), pa.timestamp("us")),
                "revenue": pc.divide(
                    pc.cast(t.column("c"), pa.float64()), 100.0
                ),
                "n_orders": pc.cast(t.column("n_orders"), pa.int64()),
            }
        ).sort_by([("cohort", "ascending"), ("month", "ascending")])

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(final_fn(_empty))

    return tree_reduce(
        partials, reduce_fn, empty_fn=empty_fn, final_fn=final_fn
    )


def q_weekday_profile(sf_dir: str):
    """Order count and revenue by day of week (DuckDB dayofweek
    numbering: 0 = Sunday)."""
    import numpy as np

    from rayslog.stages.aggregate import tree_reduce

    def partial(t: pa.Table) -> pa.Table:
        dow = pc.day_of_week(
            t.column("o_orderdate"), count_from_zero=True, week_start=7
        ).cast(pa.int64())
        return (
            pa.table(
                {
                    "dow": dow,
                    "n_orders": pa.array(
                        np.ones(t.num_rows, dtype=np.int64)
                    ),
                    "c": pc.round(
                        pc.multiply(
                            t.column("o_totalprice"), pa.scalar(100.0)
                        )
                    ).cast(pa.int64()),
                }
            )
            .group_by(["dow"])
            .aggregate([("n_orders", "sum"), ("c", "sum")])
            .rename_columns(["dow", "n_orders", "c"])
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["dow"])
            .aggregate([("n_orders", "sum"), ("c", "sum")])
            .rename_columns(["dow", "n_orders", "c"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "dow": pc.cast(t.column("dow"), pa.int64()),
                "n_orders": pc.cast(t.column("n_orders"), pa.int64()),
                "revenue": pc.divide(
                    pc.cast(t.column("c"), pa.float64()), 100.0
                ),
            }
        ).sort_by([("dow", "ascending")])

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "dow": pa.array([], pa.int64()),
                    "n_orders": pa.array([], pa.int64()),
                    "revenue": pa.array([], pa.float64()),
                }
            )
        )

    return tree_reduce(
        _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        reduce_fn,
        empty_fn=empty_fn,
        final_fn=final_fn,
    )


def q_keyword_hits(sf_dir: str):
    """Multi-keyword containment scan: for each keyword of a fixed
    list, the number of documents whose text contains it (substring
    semantics, one vectorized match_substring pass per keyword inside
    a single corpus scan; partial counts ride the combiner tree)."""
    import numpy as np

    from rayslog.stages.aggregate import tree_reduce

    keywords = ["hash join", "window", "stream", "merge part", "spark"]

    def partial(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        hits = [
            int(
                pc.sum(
                    pc.cast(pc.match_substring(txt, kw), pa.int64())
                ).as_py()
                or 0
            )
            for kw in keywords
        ]
        return pa.table(
            {
                "keyword": pa.array(keywords, pa.string()),
                "n_docs": pa.array(hits, pa.int64()),
            }
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["keyword"])
            .aggregate([("n_docs", "sum")])
            .rename_columns(["keyword", "n_docs"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "keyword": t.column("keyword"),
                "n_docs": pc.cast(t.column("n_docs"), pa.int64()),
            }
        ).sort_by([("keyword", "ascending")])

    def empty_fn():
        # empty corpus: match the oracle's LEFT JOIN — one row per
        # keyword with n_docs=0 (Ray skips map fns on empty blocks, so
        # `partial` never emits the keyword spine itself)
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "keyword": pa.array(sorted(keywords), pa.string()),
                    "n_docs": pa.array([0] * len(keywords), pa.int64()),
                }
            )
        )

    return tree_reduce(
        _read(sf_dir, "documents", ["text"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        reduce_fn,
        empty_fn=empty_fn,
        final_fn=final_fn,
    )


def q_user_event_sets(sf_dir: str):
    """Distinct-set algebra over user behavior (the INTERSECT/EXCEPT
    shape): how many users purchased, errored, did both, or only one.
    One user-hash exchange co-locates each user's (deduped) type
    flags; per-part flag counts collapse to a single row through the
    combiner tree."""
    import numpy as np

    from rayslog.stages.aggregate import task_exchange, tree_reduce

    parts = 64
    type_a, type_b = "purchase", "error"

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.is_in(
            t.column("event_type"),
            value_set=pa.array([type_a, type_b]),
        )
        t = t.filter(keep)
        # batch-local distinct (user, type) so only deduped pairs
        # cross the exchange
        g = (
            t.select(["user_id", "event_type"])
            .group_by(["user_id", "event_type"])
            .aggregate([])
        )
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        return g.append_column(
            "upart",
            pa.array((u.astype(np.uint64) % np.uint64(parts)).astype(np.int32)),
        )

    _empty = pa.table(
        {
            "n_purchase_users": pa.array([], pa.int64()),
            "n_error_users": pa.array([], pa.int64()),
            "n_both": pa.array([], pa.int64()),
            "n_purchase_only": pa.array([], pa.int64()),
            "n_error_only": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        g = (
            t.group_by(["user_id", "event_type"]).aggregate([])
        )  # global distinct within the user's home part
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        is_a = pc.equal(g.column("event_type"), type_a).to_numpy(
            zero_copy_only=False
        )
        order = np.argsort(u, kind="stable")
        us, aa = u[order], is_a[order]
        starts = np.r_[0, np.nonzero(us[1:] != us[:-1])[0] + 1]
        has_a = np.logical_or.reduceat(aa, starts)
        has_b = np.logical_or.reduceat(~aa, starts)
        both = int(np.count_nonzero(has_a & has_b))
        na, nb = int(np.count_nonzero(has_a)), int(np.count_nonzero(has_b))
        return pa.table(
            {
                "n_purchase_users": pa.array([na], pa.int64()),
                "n_error_users": pa.array([nb], pa.int64()),
                "n_both": pa.array([both], pa.int64()),
                "n_purchase_only": pa.array([na - both], pa.int64()),
                "n_error_only": pa.array([nb - both], pa.int64()),
            }
        )

    partials = task_exchange(
        _read(sf_dir, "events", ["user_id", "event_type"]).map_batches(
            prep, batch_format="pyarrow", zero_copy_batch=True
        ),
        "upart",
        parts,
        per_part,
    )

    cols = [
        "n_purchase_users",
        "n_error_users",
        "n_both",
        "n_purchase_only",
        "n_error_only",
    ]

    def reduce_fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                c: pa.array(
                    [pc.sum(t.column(c)).as_py() or 0], pa.int64()
                )
                for c in cols
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(reduce_fn(_empty))

    return tree_reduce(partials, reduce_fn, empty_fn=empty_fn)


def q_rolling_dau(sf_dir: str):
    """7-day rolling distinct active users per day (rolling COUNT
    DISTINCT via per-user coverage-interval diffs)."""
    from rayslog.stages.events import rolling_dau

    return rolling_dau(_read(sf_dir, "events", ["user_id", "ts"]))


def q_followed_within(sf_dir: str):
    """Sequence-pattern count: errors followed by a purchase from the
    same user within one hour (A-then-B-within-interval matching via
    band-shifted searchsorted)."""
    from rayslog.stages.events import followed_within

    return followed_within(
        _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    )


def q_hybrid_search(sf_dir: str):
    """Hybrid retrieval: reciprocal-rank fusion (k=60) of the BM25
    top-10 and the cosine top-10 for the probe query — the
    lexical+vector fusion every RAG stack runs.  Both legs are the
    existing oracle-checked distributed queries; fusion happens on
    their tiny (<=10-row) rank lists, so the only driver-side work is
    O(k).  The RRF score is the same two-term double sum the oracle
    spells (coalesce(1/(60+rank), 0) per leg)."""
    import pandas as pd

    b = q_bm25_search(sf_dir).to_pandas()[["doc_id", "rank"]]
    v = q_ann_topk(sf_dir).to_pandas()
    v = v[v["query_id"] == 0][["vec_id", "rank"]].rename(
        columns={"vec_id": "doc_id"}
    )
    f = b.merge(v, on="doc_id", how="outer", suffixes=("_b", "_v"))
    t_b = (1.0 / (60.0 + f["rank_b"])).fillna(0.0)
    t_v = (1.0 / (60.0 + f["rank_v"])).fillna(0.0)
    f["rrf_score"] = t_b + t_v
    f = f.sort_values(
        ["rrf_score", "doc_id"], ascending=[False, True]
    ).head(10)
    f["rank"] = range(1, len(f) + 1)
    out = f[["doc_id", "rrf_score", "rank"]].reset_index(drop=True)
    out["doc_id"] = out["doc_id"].astype("int64")
    out["rank"] = out["rank"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def q_weighted_median_price(sf_dir: str):
    """Quantity-WEIGHTED median lineitem price per brand — the grouped
    weighted-quantile shape (plain medians ignore row mass).  The
    crossing rule is exact integers (`2*cum_qty >= total_qty`, the
    smallest price whose cumulative weight reaches half), which is
    order-independent under price ties, so the oracle's window cumsum
    and the engine's vectorized pass agree bit-for-bit.  Brand dim
    auto-selects broadcast vs hash_join; one brand-hash exchange
    co-locates each brand."""
    import os

    import numpy as np
    import pyarrow.parquet as pq
    import ray

    from rayslog.kernels.texthash import col_hash64
    from rayslog.stages.aggregate import task_exchange
    from rayslog.stages.relational import _cached_lookup, hash_join

    parts = 32
    thresh = int(os.environ.get("RAYSLOG_BROADCAST_MAX_ROWS", 4_000_000))

    line = _read(
        sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"]
    )

    def cents_cols(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": pc.cast(t.column("l_partkey"), pa.int64()),
                "pc_": pc.round(
                    pc.multiply(t.column("l_extendedprice"), pa.scalar(100.0))
                ).cast(pa.int64()),
                "qc": pc.round(
                    pc.multiply(t.column("l_quantity"), pa.scalar(100.0))
                ).cast(pa.int64()),
            }
        )

    if _table_rows(sf_dir, "part") <= thresh:
        pk = pq.read_table(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
        )
        pk_ref = ray.put(
            (
                pk.column("p_partkey").to_numpy(),
                pk.column("p_brand").to_numpy(zero_copy_only=False),
            )
        )

        def attach_brand(t: pa.Table) -> pa.Table:
            keys, brands = _cached_lookup(pk_ref)
            idx = pc.index_in(t.column("l_partkey"), value_set=keys)
            out = pa.table(
                {
                    "p_brand": pc.take(brands, idx),
                    "pc_": t.column("pc_"),
                    "qc": t.column("qc"),
                }
            )
            return out.filter(pc.is_valid(out.column("p_brand")))

        branded = line.map_batches(
            cents_cols, batch_format="pyarrow", zero_copy_batch=True
        ).map_batches(
            attach_brand, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        branded = hash_join(
            line.map_batches(
                cents_cols, batch_format="pyarrow", zero_copy_batch=True
            ),
            _read(sf_dir, "part", ["p_partkey", "p_brand"]).map_batches(
                lambda t: pa.table(
                    {
                        "l_partkey": pc.cast(t.column("p_partkey"),
                                             pa.int64()),
                        "p_brand": t.column("p_brand"),
                    }
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            key="l_partkey",
        ).map_batches(
            lambda t: t.select(["p_brand", "pc_", "qc"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    def add_bpart(t: pa.Table) -> pa.Table:
        b = t.column("p_brand")
        if isinstance(b, pa.ChunkedArray):
            b = b.combine_chunks()
        h = col_hash64(b)
        # per-batch partial: collapse equal (brand, price) rows so only
        # distinct pairs with summed weights cross the exchange
        g = (
            pa.table({"p_brand": b, "pc_": t.column("pc_"),
                      "qc": t.column("qc")})
            .group_by(["p_brand", "pc_"])
            .aggregate([("qc", "sum")])
            .rename_columns(["p_brand", "pc_", "qc"])
        )
        b2 = g.column("p_brand")
        if isinstance(b2, pa.ChunkedArray):
            b2 = b2.combine_chunks()
        h2 = col_hash64(b2)
        return g.append_column(
            "bpart", pa.array((h2 % np.uint64(parts)).astype(np.int32))
        )

    _empty = pa.table(
        {
            "p_brand": pa.array([], pa.string()),
            "w_median_price": pa.array([], pa.float64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        import pandas as pd

        codes, uniques = pd.factorize(t.column("p_brand").to_pandas())
        p_ = t.column("pc_").to_numpy(zero_copy_only=False)
        q_ = t.column("qc").to_numpy(zero_copy_only=False)
        order = np.lexsort((p_, codes))
        g, ps, qs = codes[order], p_[order], q_[order]
        starts = np.r_[0, np.nonzero(g[1:] != g[:-1])[0] + 1]
        lens = np.diff(np.r_[starts, len(g)])
        cum = np.cumsum(qs)
        base = np.repeat(np.r_[0, cum[starts[1:] - 1]], lens)
        cw = cum - base
        tot = np.repeat(np.add.reduceat(qs, starts), lens)
        crossing = 2 * cw >= tot
        # first crossing row per group == min price with cum >= half
        med = np.empty(len(starts), dtype=np.int64)
        for i, s in enumerate(starts):  # O(#brands) tiny loop
            e = s + lens[i]
            med[i] = ps[s:e][crossing[s:e]][0]
        return pa.table(
            {
                "p_brand": pa.array([uniques[g[s]] for s in starts],
                                    pa.string()),
                "w_median_price": pa.array(med.astype(np.float64) / 100.0),
            }
        )

    return task_exchange(
        branded.map_batches(
            add_bpart, batch_format="pyarrow", zero_copy_batch=True
        ),
        "bpart",
        parts,
        per_part,
    )


def q_conversion_delay(sf_dir: str):
    """Exact time-to-conversion stats (error -> next purchase per
    user): count, mean/min/max seconds from integer-µs sums."""
    from rayslog.stages.events import conversion_delay

    return conversion_delay(
        _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    )


def q_lang_confusion(sf_dir: str):
    """Language-ID confusion matrix (true lang x predicted lang doc
    counts) — the model-eval cross-tab over the oracle-checked
    lang_id heuristic."""
    from rayslog.stages.aggregate import tree_reduce

    preds = q_lang_id(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        return (
            t.select(["lang", "lang_pred"])
            .group_by(["lang", "lang_pred"])
            .aggregate([([], "count_all")])
            .rename_columns(["lang", "lang_pred", "n_docs"])
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["lang", "lang_pred"])
            .aggregate([("n_docs", "sum")])
            .rename_columns(["lang", "lang_pred", "n_docs"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": t.column("lang"),
                "lang_pred": t.column("lang_pred"),
                "n_docs": pc.cast(t.column("n_docs"), pa.int64()),
            }
        ).sort_by([("lang", "ascending"), ("lang_pred", "ascending")])

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "lang_pred": pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                }
            )
        )

    return tree_reduce(
        preds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        reduce_fn,
        empty_fn=empty_fn,
        final_fn=final_fn,
    )


def q_order_linecount_hist(sf_dir: str):
    """Count-of-counts: how many orders have k lineitems.  One
    orderkey-hash exchange resolves each order whole (keys only — 8
    bytes/row through the shuffle); per-part bincounts ride the
    combiner tree (output bounded by max lines/order)."""
    import numpy as np

    from rayslog.stages.aggregate import task_exchange, tree_reduce

    parts = 64

    def prep(t: pa.Table) -> pa.Table:
        ok = pc.cast(t.column("l_orderkey"), pa.int64())
        u = ok.to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_orderkey": ok,
                "opart": pa.array(
                    (u.astype(np.uint64) % np.uint64(parts)).astype(np.int32)
                ),
            }
        )

    _empty = pa.table(
        {
            "n_lines": pa.array([], pa.int64()),
            "n_orders": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        u = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        _, counts = np.unique(u, return_counts=True)
        k, n = np.unique(counts, return_counts=True)
        return pa.table(
            {
                "n_lines": pa.array(k.astype(np.int64)),
                "n_orders": pa.array(n.astype(np.int64)),
            }
        )

    partials = task_exchange(
        _read(sf_dir, "lineitem", ["l_orderkey"]).map_batches(
            prep, batch_format="pyarrow", zero_copy_batch=True
        ),
        "opart",
        parts,
        per_part,
    )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["n_lines"])
            .aggregate([("n_orders", "sum")])
            .rename_columns(["n_lines", "n_orders"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_lines": pc.cast(t.column("n_lines"), pa.int64()),
                "n_orders": pc.cast(t.column("n_orders"), pa.int64()),
            }
        ).sort_by([("n_lines", "ascending")])

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(_empty)

    return tree_reduce(
        partials, reduce_fn, empty_fn=empty_fn, final_fn=final_fn
    )


def q_traffic_anomaly_days(sf_dir: str):
    """Traffic-spike days: days whose event count exceeds 2x the mean
    of the prior seven OBSERVED days (rows, not calendar — needs >= 1
    prior day).  Per-block day-count partials ride the tree; the
    tiny ordered day series flags spikes on the final block with the
    EXACT integer compare ``n*cnt_prev > 2*sum_prev`` (no float
    threshold)."""
    import numpy as np

    from rayslog.stages.aggregate import tree_reduce

    def partial(t: pa.Table) -> pa.Table:
        return (
            pa.table(
                {
                    "day": pc.floor_temporal(t.column("ts"), unit="day"),
                    "n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                }
            )
            .group_by(["day"])
            .aggregate([("n", "sum")])
            .rename_columns(["day", "n"])
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["day"])
            .aggregate([("n", "sum")])
            .rename_columns(["day", "n"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        t = t.sort_by([("day", "ascending")])
        n = t.column("n").to_numpy(zero_copy_only=False)
        csum = np.r_[0, np.cumsum(n)]
        idx = np.arange(len(n))
        lo = np.maximum(idx - 7, 0)
        sum_prev = csum[idx] - csum[lo]
        cnt_prev = idx - lo
        spike = (cnt_prev > 0) & (n * cnt_prev > 2 * sum_prev)
        return pa.table(
            {
                "day": t.column("day"),
                "n_events": pa.array(n),
                "is_spike": pa.array(spike),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "day": pa.array([], pa.timestamp("us")),
                    "n_events": pa.array([], pa.int64()),
                    "is_spike": pa.array([], pa.bool_()),
                }
            )
        )

    return tree_reduce(
        _read(sf_dir, "events", ["ts"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        reduce_fn,
        empty_fn=empty_fn,
        final_fn=final_fn,
    )


def q_customer_spend_deciles(sf_dir: str):
    """Revenue-concentration report: NTILE(10) of customers by total
    spend with each decile's revenue share."""
    from rayslog.stages.relational import customer_spend_deciles

    return customer_spend_deciles(
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    )


def q_dup_rate_by_source(sf_dir: str):
    """Per-source exact-duplicate rate: docs, distinct texts, and
    ``1 - distinct/docs`` — the curation health metric.  Per-batch
    distinct (source, h1, h2) triples (the 128-bit C text hash, the
    dedup_exact key contract) ride the combiner tree; raw text never
    crosses the exchange.  Partitioning assumption: the global
    distinct-triple set fits the final tree task (distinct_count_by
    discipline — switch to its shuffle final past ~10^8 distinct)."""
    import numpy as np

    from rayslog.stages.aggregate import tree_reduce
    from rayslog.stages.text import add_text_hash

    def partial(t: pa.Table) -> pa.Table:
        t = add_text_hash(t)
        return (
            t.select(["source", "h1", "h2"])
            .group_by(["source", "h1", "h2"])
            .aggregate([([], "count_all")])
            .rename_columns(["source", "h1", "h2", "n"])
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["source", "h1", "h2"])
            .aggregate([("n", "sum")])
            .rename_columns(["source", "h1", "h2", "n"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "source": t.column("source"),
                    "n_docs": t.column("n"),
                    "one": pa.array(
                        np.ones(t.num_rows, dtype=np.int64)
                    ),
                }
            )
            .group_by(["source"])
            .aggregate([("n_docs", "sum"), ("one", "sum")])
            .rename_columns(["source", "n_docs", "n_distinct"])
        ).sort_by([("source", "ascending")])
        nd = pc.cast(g.column("n_docs"), pa.float64())
        nu = pc.cast(g.column("n_distinct"), pa.float64())
        return pa.table(
            {
                "source": g.column("source"),
                "n_docs": pc.cast(g.column("n_docs"), pa.int64()),
                "n_distinct": pc.cast(g.column("n_distinct"), pa.int64()),
                "dup_rate": pc.subtract(
                    pa.scalar(1.0, pa.float64()), pc.divide(nu, nd)
                ),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                    "n_distinct": pa.array([], pa.int64()),
                    "dup_rate": pa.array([], pa.float64()),
                }
            )
        )

    return tree_reduce(
        _read(sf_dir, "documents", ["source", "text"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        reduce_fn,
        empty_fn=empty_fn,
        final_fn=final_fn,
    )


def q_order_gap_median_hist(sf_dir: str):
    """Aggregate-of-aggregates: each customer's exact MEDIAN gap
    between consecutive orders (quantile_disc semantics over the
    (date, orderkey)-ordered timeline), histogrammed in whole days
    over customers.  One custkey exchange computes gaps AND per-
    customer medians in two vectorized lexsort passes; the bounded
    day-bucket counts ride the combiner tree."""
    import numpy as np

    from rayslog.stages.aggregate import task_exchange, tree_reduce

    parts = 64
    day_us = np.int64(86_400_000_000)

    def prep(t: pa.Table) -> pa.Table:
        ts = t.column("o_orderdate")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        u = t.column("o_custkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "ts_us": pa.array(
                    ts.cast(pa.timestamp("us"))
                    .cast(pa.int64())
                    .to_numpy(zero_copy_only=False)
                ),
                "o_orderkey": t.column("o_orderkey"),
                "cpart": pa.array(
                    (u.astype(np.uint64) % np.uint64(parts)).astype(np.int32)
                ),
            }
        )

    _empty = pa.table(
        {
            "gap_days": pa.array([], pa.int64()),
            "n_customers": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        u = t.column("o_custkey").to_numpy(zero_copy_only=False)
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        ok = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        order = np.lexsort((ok, ts, u))
        us, tt = u[order], ts[order]
        same = us[1:] == us[:-1]
        gap = (tt[1:] - tt[:-1])[same]
        gu = us[1:][same]
        if not len(gap):
            return _empty
        order2 = np.lexsort((gap, gu))
        g_s, v_s = gu[order2], gap[order2]
        starts = np.r_[0, np.nonzero(g_s[1:] != g_s[:-1])[0] + 1]
        lens = np.diff(np.r_[starts, len(g_s)])
        med = v_s[starts + (lens - 1) // 2]
        days = med // day_us
        k, n = np.unique(days, return_counts=True)
        return pa.table(
            {
                "gap_days": pa.array(k.astype(np.int64)),
                "n_customers": pa.array(n.astype(np.int64)),
            }
        )

    partials = task_exchange(
        _read(
            sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate"]
        ).map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        "cpart",
        parts,
        per_part,
    )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["gap_days"])
            .aggregate([("n_customers", "sum")])
            .rename_columns(["gap_days", "n_customers"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "gap_days": pc.cast(t.column("gap_days"), pa.int64()),
                "n_customers": pc.cast(t.column("n_customers"), pa.int64()),
            }
        ).sort_by([("gap_days", "ascending")])

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(_empty)

    return tree_reduce(
        partials, reduce_fn, empty_fn=empty_fn, final_fn=final_fn
    )


def q_session_length_hist(sf_dir: str):
    """Histogram of session sizes (events per 30-minute-gap session)
    — gap sessionization composed with count-of-counts.  One
    user-hash exchange: session breaks, per-session sizes and the
    bincount all resolve vectorized per part; the bounded histogram
    rides the combiner tree."""
    import numpy as np

    from rayslog.stages.aggregate import task_exchange, tree_reduce
    from rayslog.stages.events import _user_codes, _user_hash

    parts = 64
    gap_us = np.int64(30 * 60) * np.int64(1_000_000)

    def prep(t: pa.Table) -> pa.Table:
        ts = t.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        h = _user_hash(t.column("user_id"))
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "ts_us": pa.array(
                    ts.cast(pa.timestamp("us"))
                    .cast(pa.int64())
                    .to_numpy(zero_copy_only=False)
                ),
                "event_id": t.column("event_id"),
                "upart": pa.array((h % np.uint64(parts)).astype(np.int32)),
            }
        )

    _empty = pa.table(
        {
            "session_len": pa.array([], pa.int64()),
            "n_sessions": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        codes = _user_codes(t.column("user_id"))
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        ev = t.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ev, ts, codes))
        u, tt = codes[order], ts[order]
        new_sess = np.r_[
            True, (u[1:] != u[:-1]) | (tt[1:] - tt[:-1] > gap_us)
        ]
        starts = np.nonzero(new_sess)[0]
        lens = np.diff(np.r_[starts, len(u)])
        k, n = np.unique(lens, return_counts=True)
        return pa.table(
            {
                "session_len": pa.array(k.astype(np.int64)),
                "n_sessions": pa.array(n.astype(np.int64)),
            }
        )

    partials = task_exchange(
        _read(sf_dir, "events", ["user_id", "ts", "event_id"]).map_batches(
            prep, batch_format="pyarrow", zero_copy_batch=True
        ),
        "upart",
        parts,
        per_part,
    )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["session_len"])
            .aggregate([("n_sessions", "sum")])
            .rename_columns(["session_len", "n_sessions"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "session_len": pc.cast(t.column("session_len"), pa.int64()),
                "n_sessions": pc.cast(t.column("n_sessions"), pa.int64()),
            }
        ).sort_by([("session_len", "ascending")])

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(_empty)

    return tree_reduce(
        partials, reduce_fn, empty_fn=empty_fn, final_fn=final_fn
    )


def q_session_duration_hist(sf_dir: str):
    """Histogram of session durations in whole minutes (30-minute-gap
    sessions; duration = last event - first event, single-event
    sessions land in bucket 0)."""
    import numpy as np

    from rayslog.stages.aggregate import task_exchange, tree_reduce
    from rayslog.stages.events import _user_codes, _user_hash

    parts = 64
    gap_us = np.int64(30 * 60) * np.int64(1_000_000)
    min_us = np.int64(60) * np.int64(1_000_000)

    def prep(t: pa.Table) -> pa.Table:
        ts = t.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        h = _user_hash(t.column("user_id"))
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "ts_us": pa.array(
                    ts.cast(pa.timestamp("us"))
                    .cast(pa.int64())
                    .to_numpy(zero_copy_only=False)
                ),
                "event_id": t.column("event_id"),
                "upart": pa.array((h % np.uint64(parts)).astype(np.int32)),
            }
        )

    _empty = pa.table(
        {
            "duration_min": pa.array([], pa.int64()),
            "n_sessions": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        codes = _user_codes(t.column("user_id"))
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        ev = t.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ev, ts, codes))
        u, tt = codes[order], ts[order]
        new_sess = np.r_[
            True, (u[1:] != u[:-1]) | (tt[1:] - tt[:-1] > gap_us)
        ]
        starts = np.nonzero(new_sess)[0]
        lens = np.diff(np.r_[starts, len(u)])
        dur = tt[starts + lens - 1] - tt[starts]
        k, n = np.unique(dur // min_us, return_counts=True)
        return pa.table(
            {
                "duration_min": pa.array(k.astype(np.int64)),
                "n_sessions": pa.array(n.astype(np.int64)),
            }
        )

    partials = task_exchange(
        _read(sf_dir, "events", ["user_id", "ts", "event_id"]).map_batches(
            prep, batch_format="pyarrow", zero_copy_batch=True
        ),
        "upart",
        parts,
        per_part,
    )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["duration_min"])
            .aggregate([("n_sessions", "sum")])
            .rename_columns(["duration_min", "n_sessions"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "duration_min": pc.cast(t.column("duration_min"),
                                        pa.int64()),
                "n_sessions": pc.cast(t.column("n_sessions"), pa.int64()),
            }
        ).sort_by([("duration_min", "ascending")])

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(_empty)

    return tree_reduce(
        partials, reduce_fn, empty_fn=empty_fn, final_fn=final_fn
    )


def q_turn_dup_stats(sf_dir: str):
    """Corpus-wide exact-duplicate stats over the TRANSCRIPTS table's
    turn texts (the dedup family applied to the north-rule input):
    turns, distinct texts, dup rate.  Per-batch distinct 128-bit hash
    triples through the combiner tree — raw text never moves.

    Scale-safe since r5: the distinct-hash reduction (whose output is
    O(distinct texts) — unbounded) runs through the cardinality-
    adaptive tree (``split_keys`` hash-range sub-trees past the
    threshold), and the cross-key totals collapse each sub-block to
    ONE (sum, count) row before a second, trivially tiny tree."""
    import numpy as np

    from rayslog.stages.aggregate import tree_aggregate, tree_reduce
    from rayslog.stages.text import add_text_hash

    def partial(t: pa.Table) -> pa.Table:
        t = add_text_hash(t)
        return (
            t.select(["h1", "h2"])
            .group_by(["h1", "h2"])
            .aggregate([([], "count_all")])
            .rename_columns(["h1", "h2", "n"])
        )

    distinct = tree_aggregate(
        read_transcripts(sf_dir, ["text"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["h1", "h2"],
        [("n", "sum")],
        ["n"],
        split_keys=["h1", "h2"],
    )

    def totals(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_turns": pa.array(
                    [int(pc.sum(t.column("n")).as_py() or 0)], pa.int64()
                ),
                "n_distinct": pa.array([t.num_rows], pa.int64()),
            }
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_turns": pa.array(
                    [int(pc.sum(t.column("n_turns")).as_py() or 0)],
                    pa.int64(),
                ),
                "n_distinct": pa.array(
                    [int(pc.sum(t.column("n_distinct")).as_py() or 0)],
                    pa.int64(),
                ),
            }
        )

    def final_fn(t: pa.Table) -> pa.Table:
        n_turns = int(t.column("n_turns")[0].as_py())
        n_distinct = int(t.column("n_distinct")[0].as_py())
        rate = (
            1.0 - float(n_distinct) / float(n_turns) if n_turns else None
        )
        return t.append_column(
            "dup_rate", pa.array([rate], pa.float64())
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "n_turns": pa.array([0], pa.int64()),
                    "n_distinct": pa.array([0], pa.int64()),
                    "dup_rate": pa.array([None], pa.float64()),
                }
            )
        )

    # collapse each distinct-hash block (possibly S disjoint hash-range
    # sub-blocks) to ONE totals row BEFORE the second tree, so no task
    # ever concatenates the O(distinct) rows back together
    tot_partials = distinct.map_batches(
        totals, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )
    return tree_reduce(
        tot_partials, reduce_fn, empty_fn=empty_fn, final_fn=final_fn
    )


def q_severity_runs(sf_dir: str):
    """Gaps-and-islands over the north-rule table: per conversation,
    the number of maximal constant-severity runs across its cleanly
    parsed turns (turn order) and the longest run's length.  One
    conv-hash exchange co-locates each conversation; run boundaries,
    per-conv run counts and max run length all resolve vectorized
    (lexsort + boundary masks + ``np.maximum.reduceat``).  The SQL
    oracle is the classic two-row_number islands construction."""
    import numpy as np

    from rayslog.sources.testgen import rows_for
    from rayslog.stages.aggregate import parsed_only, task_exchange
    from rayslog.stages.events import _user_codes, _user_hash

    n_rows = rows_for(sf_dir)
    parts = max(16, min(4096, -(-n_rows // 500_000)))

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_null(t.column("parse_error")))
        h = _user_hash(t.column("conv_id"))
        return pa.table(
            {
                "conv_id": t.column("conv_id"),
                "turn_idx": t.column("turn_idx"),
                "severity": t.column("severity"),
                "cpart": pa.array((h % np.uint64(parts)).astype(np.int32)),
            }
        )

    _empty = pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "n_runs": pa.array([], pa.int64()),
            "max_run": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        conv = t.column("conv_id")
        if isinstance(conv, pa.ChunkedArray):
            conv = conv.combine_chunks()
        codes = _user_codes(conv)
        ti = t.column("turn_idx").to_numpy(zero_copy_only=False)
        sev = t.column("severity").to_numpy(zero_copy_only=False)
        order = np.lexsort((ti, codes))
        c, s = codes[order], sev[order]
        new_conv = np.r_[True, c[1:] != c[:-1]]
        new_run = new_conv | np.r_[True, s[1:] != s[:-1]]
        run_id = np.cumsum(new_run) - 1
        run_len = np.bincount(run_id)
        run_conv = c[new_run]  # conv code of each run, conv-sorted
        conv_starts = np.r_[
            0, np.nonzero(run_conv[1:] != run_conv[:-1])[0] + 1
        ]
        n_runs = np.diff(np.r_[conv_starts, len(run_conv)])
        max_run = np.maximum.reduceat(run_len, conv_starts)
        first_rows = order[new_run][conv_starts]
        return pa.table(
            {
                "conv_id": conv.take(pa.array(first_rows)),
                "n_runs": pa.array(n_runs.astype(np.int64)),
                "max_run": pa.array(max_run.astype(np.int64)),
            }
        )

    return task_exchange(
        parse_dataset(read_transcripts(sf_dir,
                                       ["conv_id", "turn_idx", "text"])),
        "cpart",
        parts,
        per_part,
        pre_fn=prep,
    )


def q_conv_first_error(sf_dir: str):
    """Per conversation with at least one parsed error-or-worse turn
    (severity <= 3): the first such turn_idx and how many cleanly
    parsed turns preceded it — time-to-first-failure over the
    north-rule table.  Two grouped partials (conditional min +
    conditional count vs a co-located threshold) in ONE conv-hash
    exchange."""
    import numpy as np

    from rayslog.sources.testgen import rows_for
    from rayslog.stages.aggregate import task_exchange
    from rayslog.stages.events import _user_codes, _user_hash

    n_rows = rows_for(sf_dir)
    parts = max(16, min(4096, -(-n_rows // 500_000)))

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_null(t.column("parse_error")))
        h = _user_hash(t.column("conv_id"))
        return pa.table(
            {
                "conv_id": t.column("conv_id"),
                "turn_idx": t.column("turn_idx"),
                "severity": t.column("severity"),
                "cpart": pa.array((h % np.uint64(parts)).astype(np.int32)),
            }
        )

    _empty = pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "first_error_turn": pa.array([], pa.int64()),
            "n_turns_before": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        conv = t.column("conv_id")
        if isinstance(conv, pa.ChunkedArray):
            conv = conv.combine_chunks()
        codes = _user_codes(conv)
        ti = t.column("turn_idx").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        sev = t.column("severity").to_numpy(zero_copy_only=False)
        err = sev <= 3
        n_conv = int(codes.max()) + 1
        first_err = np.full(n_conv, np.iinfo(np.int64).max)
        if err.any():
            np.minimum.at(first_err, codes[err], ti[err])
        has = first_err != np.iinfo(np.int64).max
        # parsed turns strictly before the first error turn
        before = np.bincount(
            codes[ti < first_err[codes]], minlength=n_conv
        ).astype(np.int64)
        keep = np.nonzero(has)[0]
        if not len(keep):
            return _empty
        # one representative row index per kept conv for the id value
        order = np.argsort(codes, kind="stable")
        first_rows = order[
            np.searchsorted(codes[order], keep)
        ]
        return pa.table(
            {
                "conv_id": conv.take(pa.array(first_rows)),
                "first_error_turn": pa.array(first_err[keep]),
                "n_turns_before": pa.array(before[keep]),
            }
        )

    return task_exchange(
        parse_dataset(read_transcripts(sf_dir,
                                       ["conv_id", "turn_idx", "text"])),
        "cpart",
        parts,
        per_part,
        pre_fn=prep,
    )


def q_tag_top_hosts(sf_dir: str):
    """Top-3 hosts per RFC3164 tag by parsed-turn count — the grouped
    window rank applied to the north-rule table (tag/hostname are
    parser outputs).  Pair counts ride the combiner tree, then the
    re-applicable top-k tree ranks per tag; no sort-shuffle."""
    from rayslog.stages.aggregate import counts_by, grouped_top_k

    ds = parsed_dataset(sf_dir)

    def ok3_tags(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(
                pc.equal(t.column("rfc"), 1),
                pc.is_null(t.column("parse_error")),
            ),
            pc.is_valid(t.column("tag")),
        )
        return t.filter(keep).select(["tag", "hostname"])

    pairs = ds.map_batches(
        ok3_tags, batch_format="pyarrow", zero_copy_batch=True
    )
    counts = counts_by(pairs, ["tag", "hostname"], alias="n", final="tree")
    return grouped_top_k(counts, "tag", "n", "hostname", k=3)


def q_daily_new_users(sf_dir: str):
    """User acquisition curve: first-seen day per user -> new users per
    day -> running cumulative total.

    Scale shape (the turn_dup_stats discipline): the per-user grouped
    min — whose reduced output is O(users), unbounded — runs through
    the cardinality-adaptive tree (split_keys), each resulting block
    collapses to bounded per-DAY counts via a whole-block map, and a
    trivially tiny second tree sums the day counts; the cumsum runs
    once on the final day table (bounded by the date range)."""
    import numpy as np

    from rayslog.stages.aggregate import tree_aggregate, tree_reduce

    day_us = np.int64(86_400) * np.int64(1_000_000)

    def partial(t: pa.Table) -> pa.Table:
        ts = t.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        tbl = pa.table(
            {
                "user_id": t.column("user_id"),
                "first_us": ts.cast(pa.timestamp("us")).cast(pa.int64()),
            }
        )
        return (
            tbl.group_by(["user_id"])
            .aggregate([("first_us", "min")])
            .rename_columns(["user_id", "first_us"])
        )

    per_user = tree_aggregate(
        _read(sf_dir, "events", ["user_id", "ts"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["user_id"],
        [("first_us", "min")],
        ["first_us"],
        split_keys=["user_id"],  # unbounded key domain (r5 auto-split)
    )

    def day_counts(t: pa.Table) -> pa.Table:
        f = t.column("first_us").to_numpy(zero_copy_only=False)
        d = f - f % day_us
        days, n_new = np.unique(d, return_counts=True)
        return pa.table(
            {
                "day_us": pa.array(days, pa.int64()),
                "n_new": pa.array(n_new.astype(np.int64)),
            }
        )

    def reduce_days(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["day_us"])
            .aggregate([("n_new", "sum")])
            .rename_columns(["day_us", "n_new"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        t = t.sort_by([("day_us", "ascending")])
        n_new = t.column("n_new").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return pa.table(
            {
                "day": t.column("day_us").cast(pa.timestamp("us")),
                "n_new": pa.array(n_new),
                "cum_users": pa.array(np.cumsum(n_new).astype(np.int64)),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "day": pa.array([], pa.timestamp("us")),
                    "n_new": pa.array([], pa.int64()),
                    "cum_users": pa.array([], pa.int64()),
                }
            )
        )

    return tree_reduce(
        per_user.map_batches(
            day_counts, batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True,
        ),
        reduce_days,
        empty_fn=empty_fn,
        final_fn=final_fn,
    )


def q_sole_late_supplier(sf_dir: str):
    """TPC-H Q21-shaped multi-EXISTS: suppliers who were the ONLY late
    supplier (ship > orderdate + 90 days) on a finished multi-supplier
    order, with the count of such orders.  The lineitem x orders inner
    hash-exchange co-locates each order's lines in one bucket, so the
    per-order distinct-supplier / sole-late analysis is vectorized per
    joined block; per-supplier counts then ride the combiner tree and
    the 100-row supplier dim attaches via broadcast lookup."""
    import numpy as np

    import pyarrow.parquet as pq

    from rayslog.stages.aggregate import tree_aggregate
    from rayslog.stages.relational import hash_join

    late_us = np.int64(90) * np.int64(86_400) * np.int64(1_000_000)

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_shipdate"])

    def orders_f(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("o_orderstatus"), "F"))
        return pa.table(
            {
                "l_orderkey": t.column("o_orderkey"),
                "o_us": pc.cast(
                    pc.cast(t.column("o_orderdate"), pa.timestamp("us")),
                    pa.int64(),
                ),
            }
        )

    ords = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderstatus"]
    ).map_batches(orders_f, batch_format="pyarrow", zero_copy_batch=True)

    joined = hash_join(li, ords, key="l_orderkey")

    _empty = pa.table({"s_suppkey": pa.array([], pa.int64()),
                       "numwait": pa.array([], pa.int64())})

    def per_block(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        sk = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        ship = (
            t.column("l_shipdate")
            .combine_chunks()
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            if isinstance(t.column("l_shipdate"), pa.ChunkedArray)
            else t.column("l_shipdate")
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        odate = t.column("o_us").to_numpy(zero_copy_only=False)
        late = ship > odate + late_us
        # distinct (order, supplier) pairs with any-late flag
        order = np.lexsort((sk, ok))
        ok_s, sk_s, late_s = ok[order], sk[order], late[order]
        new_pair = np.r_[True, (ok_s[1:] != ok_s[:-1])
                         | (sk_s[1:] != sk_s[:-1])]
        pair_id = np.cumsum(new_pair) - 1
        pair_late = np.zeros(pair_id[-1] + 1, dtype=bool)
        np.maximum.at(pair_late, pair_id, late_s)
        p_ok = ok_s[new_pair]
        p_sk = sk_s[new_pair]
        new_ord = np.r_[True, p_ok[1:] != p_ok[:-1]]
        ord_id = np.cumsum(new_ord) - 1
        n_supp = np.bincount(ord_id)
        n_late = np.bincount(ord_id, weights=pair_late).astype(np.int64)
        sole = (n_supp >= 2) & (n_late == 1)
        win = sole[ord_id] & pair_late
        if not win.any():
            return _empty
        return pa.table(
            {
                "s_suppkey": pa.array(p_sk[win].astype(np.int64)),
                "numwait": pa.array(
                    np.ones(int(win.sum()), dtype=np.int64)
                ),
            }
        )

    partials = joined.map_batches(
        per_block, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )
    counts = tree_aggregate(
        partials, ["s_suppkey"], [("numwait", "sum")], ["numwait"],
        split_keys=["s_suppkey"],  # grows with the fleet (r5 auto-split)
    )

    supp_path = f"{sf_dir}/supplier.parquet"

    def attach(t: pa.Table) -> pa.Table:
        # k-key filtered read (top_customers pattern): only the result
        # rows' suppliers leave the dim file, never the whole dim
        keys_l = t.column("s_suppkey").to_pylist()
        if keys_l:
            sub = pq.read_table(
                supp_path,
                columns=["s_suppkey", "s_name"],
                filters=[("s_suppkey", "in", keys_l)],
            )
            sk = pc.cast(sub.column("s_suppkey"), pa.int64())
            nm = sub.column("s_name").combine_chunks()
            if isinstance(nm, pa.ChunkedArray):
                nm = nm.combine_chunks()
        else:
            sk = pa.array([], pa.int64())
            nm = pa.array([], pa.string())
        idx = pc.index_in(
            pc.cast(t.column("s_suppkey"), pa.int64()), value_set=sk
        )
        return pa.table(
            {
                "s_suppkey": pc.cast(t.column("s_suppkey"), pa.int64()),
                "s_name": pc.take(nm, idx),
                "numwait": pc.cast(t.column("numwait"), pa.int64()),
            }
        )

    return counts.map_batches(
        attach, batch_format="pyarrow", zero_copy_batch=True
    )


def q_role_alternation(sf_dir: str):
    """Dialogue-structure health check over the RAW transcripts table:
    per conversation, the number of adjacent turn pairs and how many
    violate role alternation (same role twice in a row).  One conv-hash
    exchange; adjacency is a shifted-compare over the lexsorted
    (conv, turn_idx) arrays.  Oracle: LAG over the same parquet."""
    import numpy as np

    from rayslog.sources.testgen import rows_for
    from rayslog.stages.aggregate import task_exchange
    from rayslog.stages.events import _user_codes, _user_hash

    n_rows = rows_for(sf_dir)
    parts = max(16, min(4096, -(-n_rows // 500_000)))

    def prep(t: pa.Table) -> pa.Table:
        h = _user_hash(t.column("conv_id"))
        return pa.table(
            {
                "conv_id": t.column("conv_id"),
                "turn_idx": t.column("turn_idx"),
                "role": t.column("role"),
                "cpart": pa.array((h % np.uint64(parts)).astype(np.int32)),
            }
        )

    _empty = pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "n_pairs": pa.array([], pa.int64()),
            "n_same_role": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        conv = t.column("conv_id")
        if isinstance(conv, pa.ChunkedArray):
            conv = conv.combine_chunks()
        codes = _user_codes(conv)
        ti = t.column("turn_idx").to_numpy(zero_copy_only=False)
        role = t.column("role")
        if isinstance(role, pa.ChunkedArray):
            role = role.combine_chunks()
        rcodes = np.asarray(role.dictionary_encode().indices)
        order = np.lexsort((ti, codes))
        c, r = codes[order], rcodes[order]
        same_conv = c[1:] == c[:-1]
        same_role = same_conv & (r[1:] == r[:-1])
        n_conv = int(c.max()) + 1
        pairs = np.bincount(c[1:][same_conv], minlength=n_conv)
        viol = np.bincount(c[1:][same_role], minlength=n_conv)
        # representative row per conv for the id value
        starts = np.r_[0, np.nonzero(c[1:] != c[:-1])[0] + 1]
        conv_codes = c[starts]
        first_rows = order[starts]
        return pa.table(
            {
                "conv_id": conv.take(pa.array(first_rows)),
                "n_pairs": pa.array(pairs[conv_codes].astype(np.int64)),
                "n_same_role": pa.array(
                    viol[conv_codes].astype(np.int64)
                ),
            }
        )

    return task_exchange(
        read_transcripts(sf_dir, ["conv_id", "turn_idx", "role"]),
        "cpart",
        parts,
        per_part,
        pre_fn=prep,
    )


#: A-ES weighted-sample parameters shared by the Ray query AND its oracle
AES_K = 20
AES_SEED = 7


def q_weighted_sample(sf_dir: str):
    """Weighted sampling without replacement (Efraimidis-Spirakis
    A-ES): each doc draws u = splitmix64(doc_id, seed) mapped to (0,1)
    and ranks by ln(u)/n_tokens descending — the top-k is a weighted
    sample where P(selection) tracks token count.  Keys round to 6 dp
    before ranking (the BM25 ln-parity discipline) so the DuckDB
    oracle — same splitmix64 SQL, same ln expression — ranks
    identically; ties break by doc_id.  Distributed as a per-batch
    local top-k through the re-applicable combiner tree."""
    import numpy as np

    from rayslog.stages.aggregate import tree_reduce
    from rayslog.stages.sample import splitmix64

    k = AES_K

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        ntok = (
            pc.count_substring_regex(t.column("text"), r"\S+")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        keep = ntok >= 1
        ids, ntok = ids[keep], ntok[keep]
        h = splitmix64(ids.astype(np.uint64), AES_SEED)
        u = (h.astype(np.float64) + 0.5) / 2.0**64
        skey = np.round(np.log(u) / ntok.astype(np.float64), 6)
        tbl = pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64)),
                "n_tokens": pa.array(ntok),
                "skey": pa.array(skey, pa.float64()),
            }
        )
        return _aes_topk(tbl, k)

    def reduce_fn(t: pa.Table) -> pa.Table:
        return _aes_topk(t, k)

    def _aes_topk(t: pa.Table, kk: int) -> pa.Table:
        idx = pc.sort_indices(
            t,
            sort_keys=[("skey", "descending"), ("doc_id", "ascending")],
        )
        return t.take(idx[:kk])

    def final_fn(t: pa.Table) -> pa.Table:
        t = _aes_topk(t, k)
        return t.append_column(
            "rank", pa.array(np.arange(1, t.num_rows + 1), pa.int64())
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "skey": pa.array([], pa.float64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        )

    return tree_reduce(
        _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        reduce_fn,
        empty_fn=empty_fn,
        final_fn=final_fn,
    )


def q_levenshtein_pairs(sf_dir: str):
    """Fuzzy near-dup pairs by exact edit distance: docs sharing a
    16-char prefix bucket are candidates; each candidate pair is
    verified with the classic unit-cost Levenshtein DP (numpy row
    sweep) and kept when distance <= 100.  The prefix bucket is the
    deterministic candidate rule (template dups share openings) — the
    same semantics the DuckDB oracle spells with substr + self-join +
    levenshtein().  Buckets co-locate via one hash exchange; the DP
    runs only on in-bucket pairs (documented candidate-recall trade,
    like cosine_dups_ivf's bucket-local contract)."""
    import numpy as np

    from rayslog.stages.aggregate import task_exchange
    from rayslog.kernels.texthash import hash_utf8

    parts = 32
    max_dist = 100

    def prep(t: pa.Table) -> pa.Table:
        pref = pc.utf8_slice_codeunits(t.column("text"), 0, 16)
        h = hash_utf8(
            pref.combine_chunks()
            if isinstance(pref, pa.ChunkedArray)
            else pref,
            seed=0,
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "text": t.column("text"),
                "pref": pref,
                "bpart": pa.array((h % np.uint64(parts)).astype(np.int32)),
            }
        )

    _empty = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "dist": pa.array([], pa.int64()),
        }
    )

    def _lev(a: str, b: str) -> int:
        # unit-cost Levenshtein, one numpy row sweep per char of `a`;
        # the within-row insertion dependency resolves with the
        # min-accumulate trick: cur[j] = min_k<=j (m[k] + (j-k)) where
        # m[j] = min(substitute, delete) and m[0] = i
        if a == b:
            return 0
        # BYTE-level distance: DuckDB's levenshtein() counts UTF-8
        # bytes, not codepoints ('e-acute' vs 'a' = 2) — match it
        an = np.frombuffer(a.encode("utf-8"), dtype=np.uint8)
        bn = np.frombuffer(b.encode("utf-8"), dtype=np.uint8)
        lb = len(bn)
        j_idx = np.arange(lb + 1, dtype=np.int64)
        prev = j_idx.copy()
        m = np.empty(lb + 1, dtype=np.int64)
        for i in range(1, len(an) + 1):
            m[0] = i
            np.minimum(
                prev[:-1] + (bn != an[i - 1]), prev[1:] + 1, out=m[1:]
            )
            g = m - j_idx
            np.minimum.accumulate(g, out=g)
            prev = g + j_idx
        return int(prev[lb])

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        pref = t.column("pref")
        if isinstance(pref, pa.ChunkedArray):
            pref = pref.combine_chunks()
        codes = np.asarray(pref.dictionary_encode().indices)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, codes))
        c = codes[order]
        starts = np.r_[0, np.nonzero(c[1:] != c[:-1])[0] + 1]
        counts = np.diff(np.r_[starts, len(c)])
        texts = t.column("text")
        out_a, out_b, out_d = [], [], []
        for s, n in zip(starts, counts):
            if n < 2:
                continue
            rows = order[s : s + n]
            docs = [texts[int(r)].as_py() for r in rows]
            dids = ids[rows]
            for x in range(n):
                for y in range(x + 1, n):
                    d = _lev(docs[x], docs[y])
                    if d <= max_dist:
                        out_a.append(int(dids[x]))
                        out_b.append(int(dids[y]))
                        out_d.append(d)
        if not out_a:
            return _empty
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "dist": pa.array(out_d, pa.int64()),
            }
        )

    return task_exchange(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        "bpart",
        parts,
        per_part,
        pre_fn=prep,
    )


def q_supplier_balance_rank(sf_dir: str):
    """DENSE_RANK with shared ties: suppliers ranked by account
    balance within their nation, equal balances sharing a rank with no
    gaps (the tie semantics row_number/grouped_top_k does NOT have).
    One nation-hash exchange; ranks resolve vectorized per part
    (lexsort + boundary cumsum rebased per nation).  Balances compare
    in exact integer cents on both sides."""
    import numpy as np

    from rayslog.stages.aggregate import task_exchange
    from rayslog.stages.events import _user_hash

    parts = 16

    def prep(t: pa.Table) -> pa.Table:
        h = _user_hash(t.column("s_nationkey"))
        return pa.table(
            {
                "s_suppkey": t.column("s_suppkey"),
                "s_nationkey": pc.cast(t.column("s_nationkey"),
                                       pa.int64()),
                "cents": pc.cast(
                    pc.round(pc.multiply(t.column("s_acctbal"), 100.0)),
                    pa.int64(),
                ),
                "npart": pa.array((h % np.uint64(parts)).astype(np.int32)),
            }
        )

    _empty = pa.table(
        {
            "s_suppkey": pa.array([], pa.int64()),
            "s_nationkey": pa.array([], pa.int64()),
            "s_acctbal": pa.array([], pa.float64()),
            "bal_rank": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        nk = t.column("s_nationkey").to_numpy(zero_copy_only=False)
        sk = t.column("s_suppkey").to_numpy(zero_copy_only=False)
        c = t.column("cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((sk, -c, nk))
        nks, cs = nk[order], c[order]
        new_nation = np.r_[True, nks[1:] != nks[:-1]]
        new_rank = new_nation | np.r_[True, cs[1:] != cs[:-1]]
        # dense rank = #rank-starts since the nation started
        g = np.cumsum(new_rank)
        seg_base = np.where(new_nation, g - 1, 0)
        np.maximum.accumulate(seg_base, out=seg_base)
        rank = g - seg_base
        return pa.table(
            {
                "s_suppkey": pa.array(sk[order].astype(np.int64)),
                "s_nationkey": pa.array(nks.astype(np.int64)),
                "s_acctbal": pa.array(cs.astype(np.float64) / 100.0),
                "bal_rank": pa.array(rank.astype(np.int64)),
            }
        )

    return task_exchange(
        _read(sf_dir, "supplier",
              ["s_suppkey", "s_nationkey", "s_acctbal"]),
        "npart",
        parts,
        per_part,
        pre_fn=prep,
    )


def q_value_median_cont(sf_dir: str):
    """PERCENTILE_CONT quantiles of events.value — the INTERPOLATED
    inverse CDF (DuckDB quantile_cont rule: h = q*(n-1), linear
    interpolation between the two straddling order statistics) over
    the exact distributed cents histogram; companion to the discrete
    value_quantiles."""
    from rayslog.stages.aggregate import exact_quantiles_cont_cents

    return exact_quantiles_cont_cents(
        _read(sf_dir, "events", ["value"]), "value",
        quantiles=(0.25, 0.5, 0.75, 0.9),
    )


def q_conv_severity_entropy(sf_dir: str):
    """Per-conversation Shannon entropy (nats) of the parsed severity
    distribution — a dialogue-health signal over the north-rule table
    and a nonlinear grouped aggregate: counts per (conv, severity)
    ride the cardinality-adaptive combiner tree, and the entropy
    -sum(p ln p) resolves per conversation in the final block(s)
    (per-key, so the hash-range auto-split applies; round-6 like every
    ln-bearing oracle)."""
    import numpy as np

    from rayslog.stages.aggregate import parsed_only, tree_reduce

    ds = parsed_only(parsed_dataset(sf_dir))

    def partial(t: pa.Table) -> pa.Table:
        return (
            t.select(["conv_id", "severity"])
            .group_by(["conv_id", "severity"])
            .aggregate([([], "count_all")])
            .rename_columns(["conv_id", "severity", "n"])
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["conv_id", "severity"])
            .aggregate([("n", "sum")])
            .rename_columns(["conv_id", "severity", "n"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        conv = t.column("conv_id")
        if isinstance(conv, pa.ChunkedArray):
            conv = conv.combine_chunks()
        codes = np.asarray(conv.dictionary_encode().indices)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(codes, kind="stable")
        c, ns = codes[order], n[order]
        starts = np.r_[0, np.nonzero(c[1:] != c[:-1])[0] + 1]
        ends = np.r_[starts[1:], len(c)]
        tot = np.add.reduceat(ns, starts)
        rep = np.repeat(tot, ends - starts)
        p = ns.astype(np.float64) / rep.astype(np.float64)
        terms = p * np.log(p)
        ent = np.round(-np.add.reduceat(terms, starts), 6)
        first_rows = order[starts]
        return pa.table(
            {
                "conv_id": conv.take(pa.array(first_rows)),
                "n_turns": pa.array(tot.astype(np.int64)),
                "entropy": pa.array(ent, pa.float64()),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "conv_id": pa.array([], pa.string()),
                    "n_turns": pa.array([], pa.int64()),
                    "entropy": pa.array([], pa.float64()),
                }
            )
        )

    return tree_reduce(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        reduce_fn,
        empty_fn=empty_fn,
        final_fn=final_fn,
        split_keys=["conv_id"],
    )


def q_value_quartiles_by_type(sf_dir: str):
    """Grouped PERCENTILE_CONT: p25/p50/p75 of events.value per
    event_type with DuckDB's interpolated rule ((1-frac)*lo + frac*hi
    over h = q*(n-1)).  Per-(type, cents) histogram partials ride the
    cardinality-adaptive tree; each final block holds complete types
    (split by hash(event_type)), so the per-type interpolation is a
    per-key final."""
    import numpy as np

    from rayslog.stages.aggregate import tree_reduce

    quantiles = (0.25, 0.5, 0.75)

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.round(pc.multiply(t.column("value"), 100.0)).cast(
            pa.int64()
        )
        g = (
            pa.table({"event_type": t.column("event_type"), "v": cents})
            .group_by(["event_type", "v"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["event_type", "v", "n"])

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["event_type", "v"])
            .aggregate([("n", "sum")])
            .rename_columns(["event_type", "v", "n"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        codes = np.asarray(et.dictionary_encode().indices)
        v = t.column("v").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((v, codes))
        c, vs, ns = codes[order], v[order], n[order]
        starts = np.r_[0, np.nonzero(c[1:] != c[:-1])[0] + 1]
        ends = np.r_[starts[1:], len(c)]
        out_t, out_q, out_v = [], [], []
        for s, e in zip(starts, ends):
            cum = np.cumsum(ns[s:e])
            tot = int(cum[-1])
            name = et[int(order[s])].as_py()
            for q in quantiles:
                h = q * (tot - 1)
                lo = int(np.floor(h))
                frac = h - lo
                vlo = float(vs[s + int(np.searchsorted(cum, lo + 1))]) / 100.0
                if frac == 0.0 or lo + 1 >= tot:
                    val = vlo
                else:
                    vhi = (
                        float(vs[s + int(np.searchsorted(cum, lo + 2))])
                        / 100.0
                    )
                    val = (1.0 - frac) * vlo + frac * vhi
                out_t.append(name)
                out_q.append(f"p{int(q * 100)}")
                out_v.append(val)
        return pa.table(
            {
                "event_type": pa.array(out_t, pa.string()),
                "q": pa.array(out_q, pa.string()),
                "value": pa.array(out_v, pa.float64()),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "q": pa.array([], pa.string()),
                    "value": pa.array([], pa.float64()),
                }
            )
        )

    return tree_reduce(
        _read(sf_dir, "events", ["event_type", "value"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        reduce_fn,
        empty_fn=empty_fn,
        final_fn=final_fn,
        split_keys=["event_type"],
    )


def q_event_throttle(sf_dir: str):
    """Telemetry throttle-dedup RETURNING ROWS: keep an event iff it is
    the first of its (user, event_type) stream or arrived more than
    one hour after the previous event of that stream (the LAG-gap
    de-bounce rule every ingestion pipeline runs).  One user-hash
    exchange; the per-stream previous-timestamp resolves as a shifted
    compare over the lexsorted arrays, and survivors are emitted as
    rows (filter-by-window-predicate, not an aggregate).  The 1-hour
    window matches this corpus's stream rate (~6.5 h mean gap; a 5 s
    telemetry window would be vacuous here — 184 of 10k rows drop at
    1 h, sf0.01).  Determinism: (user, type, ts, event_id) gives a
    total LAG order on both sides."""
    import numpy as np

    from rayslog.stages.aggregate import task_exchange
    from rayslog.stages.events import _user_codes, _user_hash

    parts = 64
    gap_us = np.int64(3_600) * np.int64(1_000_000)

    def prep(t: pa.Table) -> pa.Table:
        ts = t.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        h = _user_hash(t.column("user_id"))
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "event_type": t.column("event_type"),
                "ts_us": pa.array(
                    ts.cast(pa.timestamp("us"))
                    .cast(pa.int64())
                    .to_numpy(zero_copy_only=False)
                ),
                "upart": pa.array((h % np.uint64(parts)).astype(np.int32)),
            }
        )

    _empty = pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "user_id": pa.array([], pa.int64()),
            "event_type": pa.array([], pa.string()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        u = _user_codes(t.column("user_id"))
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        e = np.asarray(et.dictionary_encode().indices)
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        ev = t.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ev, ts, e, u))
        us, es, tss = u[order], e[order], ts[order]
        same = np.r_[False, (us[1:] == us[:-1]) & (es[1:] == es[:-1])]
        gap_ok = np.r_[True, (tss[1:] - tss[:-1]) > gap_us]
        keep = ~same | gap_ok
        rows = order[keep]
        return pa.table(
            {
                "event_id": pa.array(ev[rows].astype(np.int64)),
                "user_id": t.column("user_id").take(pa.array(rows)),
                "event_type": et.take(pa.array(rows)),
            }
        )

    return task_exchange(
        _read(sf_dir, "events",
              ["event_id", "ts", "user_id", "event_type"]),
        "upart",
        parts,
        per_part,
        pre_fn=prep,
    )


#: train/val/test thresholds shared by the Ray query AND its oracle
SPLIT_SEED = 13
SPLIT_RATES = (0.05, 0.10)  # test < 5%, val < 10%, train otherwise


def q_dataset_split(sf_dir: str):
    """Deterministic train/val/test assignment — the standard
    training-prep split: ``splitmix64(doc_id, seed)`` against integer
    thresholds (bit-identical in SQL via ``sample_sql_hash_expr``, the
    stratified_sample contract) buckets every doc 90/5/5, and the
    report aggregates (split, lang) -> docs + tokens.  Assignment is a
    pure per-row hash — reshardable, resumable, no shuffle; the tiny
    (3 x langs) report rides the combiner tree."""
    import numpy as np

    from rayslog.stages.aggregate import tree_aggregate
    from rayslog.stages.sample import rate_threshold, splitmix64

    t_test = rate_threshold(SPLIT_RATES[0])
    t_val = rate_threshold(SPLIT_RATES[1])

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        h = splitmix64(ids.astype(np.uint64), SPLIT_SEED)
        split = np.where(
            h < np.uint64(t_test),
            "test",
            np.where(h < np.uint64(t_val), "val", "train"),
        )
        ntok = (
            pc.count_substring_regex(t.column("text"), r"\S+")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        tbl = pa.table(
            {
                "split": pa.array(split.astype(object), pa.string()),
                "lang": t.column("lang"),
                "n_docs": pa.array(np.ones(len(ids), np.int64)),
                "n_tokens": pa.array(ntok),
            }
        )
        return (
            tbl.group_by(["split", "lang"])
            .aggregate([("n_docs", "sum"), ("n_tokens", "sum")])
            .rename_columns(["split", "lang", "n_docs", "n_tokens"])
        )

    return tree_aggregate(
        _read(sf_dir, "documents", ["doc_id", "text", "lang"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["split", "lang"],
        [("n_docs", "sum"), ("n_tokens", "sum")],
        ["n_docs", "n_tokens"],
    )


def q_event_inversions(sf_dir: str):
    """Out-of-order (lateness) audit per user: the number of event
    pairs whose event_id order disagrees with their timestamp order —
    exact per-user inversion counts via the fully-vectorized
    mergesort counter (events.segmented_inversions, O(n log^2 n), no
    per-user Python loop), one user-hash exchange.  Zero-inversion
    users emit rows too (the oracle LEFT-joins the user spine)."""
    import numpy as np

    from rayslog.stages.aggregate import task_exchange
    from rayslog.stages.events import (
        _user_codes,
        _user_hash,
        segmented_inversions,
    )

    parts = 64

    def prep(t: pa.Table) -> pa.Table:
        ts = t.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        h = _user_hash(t.column("user_id"))
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "ts_us": pa.array(
                    ts.cast(pa.timestamp("us"))
                    .cast(pa.int64())
                    .to_numpy(zero_copy_only=False)
                ),
                "upart": pa.array((h % np.uint64(parts)).astype(np.int32)),
            }
        )

    _empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "n_inversions": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        uid = t.column("user_id")
        if isinstance(uid, pa.ChunkedArray):
            uid = uid.combine_chunks()
        codes = _user_codes(uid)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        inv = segmented_inversions(codes, eid, ts)
        n_ev = np.bincount(codes, minlength=len(inv)).astype(np.int64)
        # one representative row index per user code for the id value
        order = np.argsort(codes, kind="stable")
        firsts = order[
            np.searchsorted(codes[order], np.arange(len(inv)))
        ]
        return pa.table(
            {
                "user_id": uid.take(pa.array(firsts)),
                "n_events": pa.array(n_ev),
                "n_inversions": pa.array(inv),
            }
        )

    return task_exchange(
        _read(sf_dir, "events", ["event_id", "ts", "user_id"]),
        "upart",
        parts,
        per_part,
        pre_fn=prep,
    )


def q_forecast_revenue(sf_dir: str):
    """TPC-H Q6-shaped forecast-revenue change: one filter+aggregate
    scan of lineitem (ship year 1995, discount 5-7 cents, quantity
    < 24).  Revenue = sum(extendedprice x discount) carried as exact
    int64 1e-4-dollar units (cents x cents), so the distributed sum is
    order-independent vs the oracle; the discount band compare runs on
    the rounded cent integers, never a float threshold."""
    import numpy as np

    from rayslog.stages.aggregate import tree_reduce

    lo = int(np.datetime64("1995-01-01", "us").astype(np.int64))
    hi = int(np.datetime64("1996-01-01", "us").astype(np.int64))

    def partial(t: pa.Table) -> pa.Table:
        sd = t.column("l_shipdate").cast(pa.int64())
        dc = pc.cast(
            pc.round(pc.multiply(t.column("l_discount"), pa.scalar(100.0))),
            pa.int64(),
        )
        qc = pc.cast(
            pc.round(pc.multiply(t.column("l_quantity"), pa.scalar(100.0))),
            pa.int64(),
        )
        keep = pc.and_(
            pc.and_(
                pc.and_(
                    pc.greater_equal(sd, pa.scalar(lo, pa.int64())),
                    pc.less(sd, pa.scalar(hi, pa.int64())),
                ),
                pc.and_(
                    pc.greater_equal(dc, pa.scalar(5, pa.int64())),
                    pc.less_equal(dc, pa.scalar(7, pa.int64())),
                ),
            ),
            pc.less(qc, pa.scalar(2400, pa.int64())),
        )
        ec = pc.cast(
            pc.round(
                pc.multiply(t.column("l_extendedprice"), pa.scalar(100.0))
            ),
            pa.int64(),
        )
        kept = pc.fill_null(keep, False)
        rev = pc.sum(pc.multiply(ec, dc).filter(kept)).as_py() or 0
        n = int(pc.sum(pc.cast(kept, pa.int64())).as_py() or 0)
        return pa.table(
            {
                "rev": pa.array([int(rev)], pa.int64()),
                "n_items": pa.array([n], pa.int64()),
            }
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "rev": pa.array(
                    [int(pc.sum(t.column("rev")).as_py() or 0)], pa.int64()
                ),
                "n_items": pa.array(
                    [int(pc.sum(t.column("n_items")).as_py() or 0)],
                    pa.int64(),
                ),
            }
        )

    def final_fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "revenue": pc.divide(
                    pc.cast(t.column("rev"), pa.float64()), 10000.0
                ),
                "n_items": t.column("n_items"),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "revenue": pa.array([0.0], pa.float64()),
                    "n_items": pa.array([0], pa.int64()),
                }
            )
        )

    return tree_reduce(
        _read(
            sf_dir,
            "lineitem",
            ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
        ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        reduce_fn,
        empty_fn=empty_fn,
        final_fn=final_fn,
    )


def q_late_shipments(sf_dir: str):
    """TPC-H Q12-adapted (the sandbox lineitem has no shipmode/commit
    columns): per order priority, how many lineitems shipped more than
    90 days after the order date, plus the late share.  Distributed
    orderkey hash_join (both sides scale with SF — never broadcast),
    one partial-counts task per join bucket, 5-key combiner tree; the
    90-day compare is exact integer microseconds on both sides."""
    import numpy as np
    import ray
    import ray.data as rd

    from rayslog.stages.aggregate import tree_reduce_refs
    from rayslog.stages.relational import hash_join

    LATE_US = 90 * 86_400_000_000

    def o_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_orderpriority": t.column("o_orderpriority"),
                "o_us": t.column("o_orderdate").cast(pa.int64()),
            }
        )

    def l_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t.column("l_orderkey"),
                "s_us": t.column("l_shipdate").cast(pa.int64()),
            }
        )

    jrefs = hash_join(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]).map_batches(
            l_prep, batch_format="pyarrow", zero_copy_batch=True
        ),
        _read(
            sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
        ).map_batches(o_prep, batch_format="pyarrow", zero_copy_batch=True),
        key="o_orderkey",
        return_refs=True,
    )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.select(["o_orderpriority", "n_late", "n_total"])
            .group_by(["o_orderpriority"])
            .aggregate([("n_late", "sum"), ("n_total", "sum")])
            .rename_columns(["o_orderpriority", "n_late", "n_total"])
        )

    @ray.remote
    def partial_task(t: pa.Table) -> pa.Table:
        late = pc.cast(
            pc.greater(
                t.column("s_us"),
                pc.add(t.column("o_us"), pa.scalar(LATE_US, pa.int64())),
            ),
            pa.int64(),
        )
        return reduce_fn(
            pa.table(
                {
                    "o_orderpriority": t.column("o_orderpriority"),
                    "n_late": late,
                    "n_total": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                }
            )
        )

    def final_fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": t.column("o_orderpriority"),
                "n_total": pc.cast(t.column("n_total"), pa.int64()),
                "n_late": pc.cast(t.column("n_late"), pa.int64()),
                "late_share": pc.divide(
                    pc.cast(t.column("n_late"), pa.float64()),
                    pc.cast(t.column("n_total"), pa.float64()),
                ),
            }
        )

    return rd.from_arrow(
        tree_reduce_refs(
            [partial_task.remote(r) for r in jrefs],
            reduce_fn,
            final_fn=final_fn,
        )
    )


def q_dominant_suppliers(sf_dir: str):
    """TPC-H Q20-adapted (no partsupp table in the sandbox): suppliers
    holding a dominant share of a part's shipped quantity — per
    supplier, the number of parts where that supplier shipped more
    than 1/8 of the part's total (8*q > total, exact integer cents).

    One partkey-hash exchange resolves both aggregation levels locally
    (every (part, supp) pair and the part total live in the same part
    by construction); per-part dominant-supplier counts then merge
    through the cardinality-adaptive combiner tree — suppliers scale
    with the fleet, so the tree hash-range-splits past the threshold
    instead of funnelling one giant block."""
    import numpy as np

    from rayslog.stages.aggregate import task_exchange, tree_reduce

    parts = 64
    _empty = pa.table(
        {
            "s_suppkey": pa.array([], pa.int64()),
            "n_parts": pa.array([], pa.int64()),
        }
    )

    def prep(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table(
                {
                    "l_partkey": pa.array([], pa.int64()),
                    "l_suppkey": pa.array([], pa.int64()),
                    "qc": pa.array([], pa.int64()),
                    "ppart": pa.array([], pa.int32()),
                }
            )
        u = t.column("l_partkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_partkey": pc.cast(t.column("l_partkey"), pa.int64()),
                "l_suppkey": pc.cast(t.column("l_suppkey"), pa.int64()),
                "qc": pc.cast(
                    pc.round(
                        pc.multiply(t.column("l_quantity"), pa.scalar(100.0))
                    ),
                    pa.int64(),
                ),
                "ppart": pa.array(
                    (u.astype(np.uint64) % np.uint64(parts)).astype(np.int32)
                ),
            }
        )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        ps = (
            t.group_by(["l_partkey", "l_suppkey"])
            .aggregate([("qc", "sum")])
        )
        pk = ps.column("l_partkey").to_numpy(zero_copy_only=False)
        q = ps.column("qc_sum").to_numpy(zero_copy_only=False)
        order = np.argsort(pk, kind="stable")
        uniq, start = np.unique(pk[order], return_index=True)
        tot = np.add.reduceat(q[order], start)
        dom = 8 * q > tot[np.searchsorted(uniq, pk)]
        sk = ps.column("l_suppkey").to_numpy(zero_copy_only=False)[dom]
        if not len(sk):
            return _empty
        u, c = np.unique(sk, return_counts=True)
        return pa.table(
            {
                "s_suppkey": pa.array(u, pa.int64()),
                "n_parts": pa.array(c.astype(np.int64)),
            }
        )

    partials = task_exchange(
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity"]),
        "ppart",
        parts,
        per_part,
        pre_fn=prep,
    )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["s_suppkey"])
            .aggregate([("n_parts", "sum")])
            .rename_columns(["s_suppkey", "n_parts"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "s_suppkey": t.column("s_suppkey"),
                "n_parts": pc.cast(t.column("n_parts"), pa.int64()),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(_empty)

    return tree_reduce(
        partials,
        reduce_fn,
        empty_fn=empty_fn,
        final_fn=final_fn,
        split_keys=["s_suppkey"],
    )


def q_quiet_days(sf_dir: str):
    """Calendar-spine anti-join: days in the order-date range with ZERO
    orders (data-quality / pipeline-gap audit).  Per-block distinct day
    indices ride the combiner tree (bounded by the calendar span, not
    by SF); the final task diffs the observed set against the full
    arange spine — the engine-side equivalent of the oracle's
    generate_series anti-join."""
    import numpy as np

    from rayslog.stages.aggregate import tree_reduce

    DAY_US = np.int64(86_400_000_000)

    def partial(t: pa.Table) -> pa.Table:
        us = t.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        days = np.unique(us // DAY_US)
        return pa.table({"dayi": pa.array(days, pa.int64())})

    def reduce_fn(t: pa.Table) -> pa.Table:
        d = t.column("dayi").to_numpy(zero_copy_only=False)
        return pa.table({"dayi": pa.array(np.unique(d), pa.int64())})

    def final_fn(t: pa.Table) -> pa.Table:
        d = np.sort(t.column("dayi").to_numpy(zero_copy_only=False))
        if not len(d):
            return pa.table({"day": pa.array([], pa.timestamp("us"))})
        spine = np.arange(d[0], d[-1] + 1)
        missing = np.setdiff1d(spine, d, assume_unique=True)
        return pa.table(
            {"day": pa.array(missing * DAY_US).cast(pa.timestamp("us"))}
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table({"day": pa.array([], pa.timestamp("us"))})
        )

    return _schema_safe(tree_reduce(
        _read(sf_dir, "orders", ["o_orderdate"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        reduce_fn,
        empty_fn=empty_fn,
        final_fn=final_fn,
    ))


def q_host_peak_hour(sf_dir: str):
    """Per-host peak traffic hour over the north-rule table: for every
    parsed hostname, the hour-of-day with the most cleanly parsed
    turns (ties -> smallest hour, so the answer is deterministic).
    Per-batch (hostname, hour) partial counts merge through the
    cardinality-adaptive tree (hosts are unbounded in general -> the
    tree hash-range-splits on hostname); the per-key final picks each
    host's argmax row vectorized."""
    import numpy as np

    from rayslog.stages.aggregate import parsed_only, tree_reduce

    ds = parsed_only(parsed_dataset(sf_dir))

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.is_valid(t.column("ts_parsed")),
                pc.is_valid(t.column("hostname")),
            )
        )
        g = (
            pa.table(
                {
                    "hostname": t.column("hostname"),
                    "hour": pc.cast(
                        pc.hour(t.column("ts_parsed")), pa.int64()
                    ),
                }
            )
            .group_by(["hostname", "hour"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["hostname", "hour", "n"])

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["hostname", "hour"])
            .aggregate([("n", "sum")])
            .rename_columns(["hostname", "hour", "n"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        host = t.column("hostname")
        if isinstance(host, pa.ChunkedArray):
            host = host.combine_chunks()
        hour = t.column("hour").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        _, codes = np.unique(
            host.cast(pa.large_string()).to_numpy(zero_copy_only=False),
            return_inverse=True,
        )
        # per host: max n first, then smallest hour among ties
        order = np.lexsort((hour, -n, codes))
        first = np.r_[True, codes[order][1:] != codes[order][:-1]]
        pick = order[first]
        return pa.table(
            {
                "hostname": host.take(pa.array(pick)),
                "peak_hour": pa.array(hour[pick], pa.int64()),
                "n_msgs": pa.array(n[pick], pa.int64()),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "hostname": pa.array([], pa.string()),
                    "peak_hour": pa.array([], pa.int64()),
                    "n_msgs": pa.array([], pa.int64()),
                }
            )
        )

    return tree_reduce(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        reduce_fn,
        empty_fn=empty_fn,
        final_fn=final_fn,
        split_keys=["hostname"],
    )


def q_value_streaks(sf_dir: str):
    """Gaps-and-islands on the events stream: per user, the longest
    run of strictly-increasing values in (ts, event_id) order.  One
    user-hash exchange co-locates each user's events; run boundaries
    and per-user maxima resolve vectorized (lexsort + boundary masks +
    ``np.maximum.reduceat``) — the value compare runs on exact integer
    cents so no float-order subtlety vs the oracle's islands SQL."""
    import numpy as np

    from rayslog.stages.aggregate import task_exchange

    parts = 64

    def prep(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "ts_us": t.column("ts").cast(pa.int64()),
                "vc": pc.cast(
                    pc.round(pc.multiply(t.column("value"), pa.scalar(100.0))),
                    pa.int64(),
                ),
                "upart": pa.array(
                    (u.astype(np.uint64) % np.uint64(parts)).astype(np.int32)
                ),
            }
        )

    _empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "max_streak": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        v = t.column("vc").to_numpy(zero_copy_only=False)
        uniq, codes = np.unique(u, return_inverse=True)
        order = np.lexsort((eid, ts, codes))
        c, vv = codes[order], v[order]
        new_user = np.r_[True, c[1:] != c[:-1]]
        brk = new_user | np.r_[True, ~(vv[1:] > vv[:-1])]
        run_id = np.cumsum(brk) - 1
        run_len = np.bincount(run_id)
        run_user = c[brk]
        user_starts = np.r_[
            0, np.nonzero(run_user[1:] != run_user[:-1])[0] + 1
        ]
        max_streak = np.maximum.reduceat(run_len, user_starts)
        return pa.table(
            {
                "user_id": pa.array(uniq[run_user[user_starts]], pa.int64()),
                "max_streak": pa.array(max_streak.astype(np.int64)),
            }
        )

    return task_exchange(
        _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"]),
        "upart",
        parts,
        per_part,
        pre_fn=prep,
    )


def q_order_totals_check(sf_dir: str):
    """Reconciliation audit (the drop_reconcile family, money edition):
    per order status, how many orders exist, how many have NO
    lineitems, and how many reconcile to within 1% of their lineitem
    revenue sum (extendedprice x (1-discount) x (1+tax), carried as
    exact 1e-6-dollar integers — the tolerance compare is pure int64).

    One orderkey-hash exchange over the UNION of both tables (order
    rows tagged, lineitem rows pre-summed per batch) resolves the
    correlation without join machinery; per-part status counts ride
    the 3-key combiner tree."""
    import numpy as np

    from rayslog.stages.aggregate import task_exchange, tree_reduce

    parts = 64

    def o_prep(t: pa.Table) -> pa.Table:
        u = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        n = t.num_rows
        return pa.table(
            {
                "okey": pc.cast(t.column("o_orderkey"), pa.int64()),
                "st": t.column("o_orderstatus"),
                "tot6": pc.multiply(
                    pc.cast(
                        pc.round(
                            pc.multiply(
                                t.column("o_totalprice"), pa.scalar(100.0)
                            )
                        ),
                        pa.int64(),
                    ),
                    pa.scalar(10_000, pa.int64()),
                ),
                "rev6": pa.array(np.zeros(n, dtype=np.int64)),
                "is_order": pa.array(np.ones(n, dtype=np.int64)),
                "nl": pa.array(np.zeros(n, dtype=np.int64)),
                "opart": pa.array(
                    (u.astype(np.uint64) % np.uint64(parts)).astype(np.int32)
                ),
            }
        )

    def l_prep(t: pa.Table) -> pa.Table:
        ec = pc.cast(
            pc.round(
                pc.multiply(t.column("l_extendedprice"), pa.scalar(100.0))
            ),
            pa.int64(),
        )
        dc = pc.cast(
            pc.round(pc.multiply(t.column("l_discount"), pa.scalar(100.0))),
            pa.int64(),
        )
        tc = pc.cast(
            pc.round(pc.multiply(t.column("l_tax"), pa.scalar(100.0))),
            pa.int64(),
        )
        rev6 = pc.multiply(
            pc.multiply(
                ec, pc.subtract(pa.scalar(100, pa.int64()), dc)
            ),
            pc.add(pa.scalar(100, pa.int64()), tc),
        )
        g = (
            pa.table(
                {
                    "okey": pc.cast(t.column("l_orderkey"), pa.int64()),
                    "rev6": rev6,
                }
            )
            .group_by(["okey"])
            .aggregate([("rev6", "sum"), ([], "count_all")])
            .rename_columns(["okey", "rev6", "nl"])
        )
        u = g.column("okey").to_numpy(zero_copy_only=False)
        n = g.num_rows
        return pa.table(
            {
                "okey": g.column("okey"),
                "st": pa.nulls(n, pa.string()),
                "tot6": pa.array(np.zeros(n, dtype=np.int64)),
                "rev6": pc.cast(g.column("rev6"), pa.int64()),
                "is_order": pa.array(np.zeros(n, dtype=np.int64)),
                "nl": pc.cast(g.column("nl"), pa.int64()),
                "opart": pa.array(
                    (u.astype(np.uint64) % np.uint64(parts)).astype(np.int32)
                ),
            }
        )

    union = (
        _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_totalprice"])
        .map_batches(o_prep, batch_format="pyarrow", zero_copy_batch=True)
        .union(
            _read(
                sf_dir,
                "lineitem",
                ["l_orderkey", "l_extendedprice", "l_discount", "l_tax"],
            ).map_batches(l_prep, batch_format="pyarrow", zero_copy_batch=True)
        )
    )

    _empty = pa.table(
        {
            "o_orderstatus": pa.array([], pa.string()),
            "n_orders": pa.array([], pa.int64()),
            "n_no_lines": pa.array([], pa.int64()),
            "n_within_1pct": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        o = t.filter(pc.equal(t.column("is_order"), 1))
        if not o.num_rows:
            return _empty
        lg = (
            t.filter(pc.equal(t.column("is_order"), 0))
            .group_by(["okey"])
            .aggregate([("rev6", "sum"), ("nl", "sum")])
            .rename_columns(["okey", "rev6", "nl"])
        )
        ok = o.column("okey").to_numpy(zero_copy_only=False)
        tot6 = o.column("tot6").to_numpy(zero_copy_only=False)
        order = np.argsort(ok, kind="stable")
        rev = np.zeros(len(ok), dtype=np.int64)
        nl = np.zeros(len(ok), dtype=np.int64)
        lk = lg.column("okey").to_numpy(zero_copy_only=False)
        if len(lk):
            pos_in_sorted = np.searchsorted(ok[order], lk)
            # lineitems always reference an existing order in this
            # corpus; guard anyway so a dangling key can't crash
            pos_in_sorted = np.minimum(pos_in_sorted, len(ok) - 1)
            hit = ok[order][pos_in_sorted] == lk
            rows = order[pos_in_sorted[hit]]
            rev[rows] = lg.column("rev6").to_numpy(zero_copy_only=False)[hit]
            nl[rows] = lg.column("nl").to_numpy(zero_copy_only=False)[hit]
        within = 100 * np.abs(rev - tot6) <= tot6
        return (
            pa.table(
                {
                    "o_orderstatus": o.column("st"),
                    "n_orders": pa.array(np.ones(len(ok), dtype=np.int64)),
                    "n_no_lines": pa.array((nl == 0).astype(np.int64)),
                    "n_within_1pct": pa.array(within.astype(np.int64)),
                }
            )
            .group_by(["o_orderstatus"])
            .aggregate(
                [
                    ("n_orders", "sum"),
                    ("n_no_lines", "sum"),
                    ("n_within_1pct", "sum"),
                ]
            )
            .rename_columns(
                ["o_orderstatus", "n_orders", "n_no_lines", "n_within_1pct"]
            )
        )

    partials = task_exchange(union, "opart", parts, per_part)

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["o_orderstatus"])
            .aggregate(
                [
                    ("n_orders", "sum"),
                    ("n_no_lines", "sum"),
                    ("n_within_1pct", "sum"),
                ]
            )
            .rename_columns(
                ["o_orderstatus", "n_orders", "n_no_lines", "n_within_1pct"]
            )
        )

    def final_fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderstatus": t.column("o_orderstatus"),
                "n_orders": pc.cast(t.column("n_orders"), pa.int64()),
                "n_no_lines": pc.cast(t.column("n_no_lines"), pa.int64()),
                "n_within_1pct": pc.cast(
                    t.column("n_within_1pct"), pa.int64()
                ),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(_empty)

    return tree_reduce(
        partials, reduce_fn, empty_fn=empty_fn, final_fn=final_fn
    )


def q_vocab_by_lang(sf_dir: str):
    """Heaps-law vocabulary curve input: exact distinct-token count per
    language (lowercased whitespace tokens, the doc_freq tokenizer
    contract).  Token expansion happens per batch; only distinct
    (lang, token) pairs per batch ever leave a task
    (stages/aggregate.distinct_count_by)."""
    import numpy as np

    from rayslog.kernels import texthash as tx
    from rayslog.stages.aggregate import distinct_count_by

    def flat_tokens(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        flat, offs = tx.tokens(txt, lower=True)
        counts = np.diff(offs)
        lang = t.column("lang")
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        rep = np.repeat(np.arange(t.num_rows, dtype=np.int64), counts)
        return pa.table({"lang": lang.take(pa.array(rep)), "token": flat})

    ds = _read(sf_dir, "documents", ["text", "lang"]).map_batches(
        flat_tokens, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=8_192,
    )
    return distinct_count_by(ds, "lang", "token", alias="vocab")


def q_bigram_pmi(sf_dir: str):
    """Collocation extraction: the corpus's top-20 token bigrams by
    count, each with its pointwise mutual information
    ln(p(xy) / (p(x)p(y))) from exact global counts.

    Two scans, both scale-safe: (1) the top_ngrams exchange plan
    (distinct-bigram partials -> key-hash exchange -> top-k tree)
    yields the 20 winners — a bounded driver collect; (2) one more
    corpus pass counts ONLY the winners' <=40 words (broadcast watch
    list) plus the global token/bigram totals, merged through a tiny
    tree.  The float PMI is computed from BIGINT counts in the
    identical double expression on both sides."""
    import numpy as np

    from rayslog.kernels import texthash as tx
    from rayslog.stages.aggregate import tree_reduce
    from rayslog.stages.text import _bigram_partial_impl, _exchange_topk_sum

    docs = _read(sf_dir, "documents", ["text"])
    top = _exchange_topk_sum(
        docs.map_batches(
            lambda t: _bigram_partial_impl(t, "text"),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=8_192,
        ),
        "ngram",
        "n",
        20,
    ).to_pandas()  # bounded: 20 rows
    ngrams = list(top["ngram"])
    n_bi = [int(x) for x in top["n"]]
    words = sorted({w for g in ngrams for w in g.split(" ")})
    watch = pa.array(words, pa.string())

    TB_KEY, TU_KEY = "\t__total_bigrams__", "\t__total_tokens__"

    def partial(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        flat, offs = tx.tokens(txt, lower=False)
        counts = np.diff(offs)
        tb = int(np.maximum(counts - 1, 0).sum())
        tu = int(counts.sum())
        w = flat.filter(pc.is_in(flat, value_set=watch))
        g = (
            pa.table({"key": w})
            .group_by(["key"])
            .aggregate([([], "count_all")])
            .rename_columns(["key", "c"])
        )
        extra = pa.table(
            {
                "key": pa.array([TB_KEY, TU_KEY], pa.string()),
                "c": pa.array([tb, tu], pa.int64()),
            }
        )
        return pa.concat_tables(
            [
                pa.table(
                    {
                        "key": g.column("key"),
                        "c": pc.cast(g.column("c"), pa.int64()),
                    }
                ),
                extra,
            ]
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["key"])
            .aggregate([("c", "sum")])
            .rename_columns(["key", "c"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        keys = t.column("key").to_pylist()
        cs = t.column("c").to_pylist()
        cnt = dict(zip(keys, cs))
        tb = float(cnt.get(TB_KEY, 0))
        tu = float(cnt.get(TU_KEY, 0))
        import math

        pmi = []
        for g, n in zip(ngrams, n_bi):
            w1, w2 = g.split(" ", 1)
            num = float(n) * tu * tu
            den = tb * float(cnt[w1]) * float(cnt[w2])
            # math.log == libm == DuckDB ln; numpy's SIMD log is 1 ULP
            # off on some inputs (ULP trap catalogue, CLAUDE.md #4)
            pmi.append(math.log(num / den))
        return pa.table(
            {
                "ngram": pa.array(ngrams, pa.string()),
                "n": pa.array(n_bi, pa.int64()),
                "pmi": pa.array(pmi, pa.float64()),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "ngram": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "pmi": pa.array([], pa.float64()),
                }
            )
        )

    if not ngrams:
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "ngram": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "pmi": pa.array([], pa.float64()),
                }
            )
        )
    return tree_reduce(
        docs.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=8_192,
        ),
        reduce_fn,
        empty_fn=empty_fn,
        final_fn=final_fn,
    )


def q_turn_latency_hist(sf_dir: str):
    """Inter-turn latency histogram over the north-rule table: deltas
    between consecutive parsed timestamps within each conversation
    (turn order, parse-ok turns only), bucketed in whole minutes
    (negative deltas clamp to bucket 0 — 3164 timestamps carry no year,
    so a conversation crossing the pinned default year can step back).
    One conv-hash exchange + lexsort/diff; bounded per-part bucket
    counts ride the combiner tree."""
    import numpy as np

    from rayslog.sources.testgen import rows_for
    from rayslog.stages.aggregate import parsed_only, task_exchange, tree_reduce
    from rayslog.stages.events import _user_codes, _user_hash

    n_rows = rows_for(sf_dir)
    parts = max(16, min(4096, -(-n_rows // 500_000)))
    MIN_US = np.int64(60_000_000)

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("ts_parsed")))
        h = _user_hash(t.column("conv_id"))
        return pa.table(
            {
                "conv_id": t.column("conv_id"),
                "turn_idx": t.column("turn_idx"),
                "ts_us": t.column("ts_parsed").cast(pa.int64()),
                "cpart": pa.array((h % np.uint64(parts)).astype(np.int32)),
            }
        )

    _empty = pa.table(
        {
            "bucket_min": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        conv = t.column("conv_id")
        if isinstance(conv, pa.ChunkedArray):
            conv = conv.combine_chunks()
        codes = _user_codes(conv)
        ti = t.column("turn_idx").to_numpy(zero_copy_only=False)
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        order = np.lexsort((ti, codes))
        c, s = codes[order], ts[order]
        same = c[1:] == c[:-1]
        if not same.any():
            return _empty
        d = np.maximum(s[1:][same] - s[:-1][same], 0)
        bucket = d // MIN_US
        u, n = np.unique(bucket, return_counts=True)
        return pa.table(
            {
                "bucket_min": pa.array(u, pa.int64()),
                "n": pa.array(n.astype(np.int64)),
            }
        )

    partials = task_exchange(
        parsed_only(parsed_dataset(sf_dir)).select_columns(
            ["conv_id", "turn_idx", "ts_parsed"]
        ),
        "cpart",
        parts,
        per_part,
        pre_fn=prep,
    )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["bucket_min"])
            .aggregate([("n", "sum")])
            .rename_columns(["bucket_min", "n"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bucket_min": t.column("bucket_min"),
                "n": pc.cast(t.column("n"), pa.int64()),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(_empty)

    return tree_reduce(
        partials, reduce_fn, empty_fn=empty_fn, final_fn=final_fn
    )


def q_biggest_order_per_customer(sf_dir: str):
    """Greatest-row-per-group: each customer's single biggest order
    (totalprice desc, orderkey asc on ties), returning the full order
    attributes — the top-1-with-payload window shape.  The per-key
    keep-best reduce is re-applicable, so per-batch winners merge
    through the cardinality-adaptive combiner tree (customers scale
    with the fleet -> hash-range split past the threshold); the money
    compare runs on exact integer cents."""
    import numpy as np

    from rayslog.stages.aggregate import tree_reduce

    def best(t: pa.Table) -> pa.Table:
        ck = t.column("c_custkey").to_numpy(zero_copy_only=False)
        okey = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        cents = t.column("cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((okey, -cents, ck))
        first = np.r_[True, ck[order][1:] != ck[order][:-1]]
        pick = pa.array(order[first])
        return pa.table(
            {
                "c_custkey": t.column("c_custkey").take(pick),
                "o_orderkey": t.column("o_orderkey").take(pick),
                "o_totalprice": t.column("o_totalprice").take(pick),
                "cents": t.column("cents").take(pick),
            }
        )

    def partial(t: pa.Table) -> pa.Table:
        return best(
            pa.table(
                {
                    "c_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
                    "o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
                    "o_totalprice": t.column("o_totalprice"),
                    "cents": pc.cast(
                        pc.round(
                            pc.multiply(
                                t.column("o_totalprice"), pa.scalar(100.0)
                            )
                        ),
                        pa.int64(),
                    ),
                }
            )
        )

    def final_fn(t: pa.Table) -> pa.Table:
        return t.drop_columns(["cents"])

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "c_custkey": pa.array([], pa.int64()),
                    "o_orderkey": pa.array([], pa.int64()),
                    "o_totalprice": pa.array([], pa.float64()),
                }
            )
        )

    return tree_reduce(
        _read(
            sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"]
        ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        best,
        empty_fn=empty_fn,
        final_fn=final_fn,
        split_keys=["c_custkey"],
    )


def q_user_activity_span(sf_dir: str):
    """User profile build: per user, first/last event timestamps, total
    events and distinct active days — the canonical activity-span table
    a training pipeline derives before cohorting.  One user-hash
    exchange resolves all four aggregates vectorized (lexsort +
    reduceat + distinct (user, day) pair counting); output rows are
    complete per part, so nothing re-aggregates downstream."""
    import numpy as np

    from rayslog.stages.aggregate import task_exchange

    parts = 64
    DAY_US = np.int64(86_400_000_000)

    def prep(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "ts_us": t.column("ts").cast(pa.int64()),
                "upart": pa.array(
                    (u.astype(np.uint64) % np.uint64(parts)).astype(np.int32)
                ),
            }
        )

    _empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "first_ts": pa.array([], pa.timestamp("us")),
            "last_ts": pa.array([], pa.timestamp("us")),
            "n_events": pa.array([], pa.int64()),
            "active_days": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        uniq, codes = np.unique(u, return_inverse=True)
        order = np.argsort(codes, kind="stable")
        c, s = codes[order], ts[order]
        starts = np.r_[0, np.nonzero(c[1:] != c[:-1])[0] + 1]
        first = np.minimum.reduceat(s, starts)
        last = np.maximum.reduceat(s, starts)
        n_ev = np.diff(np.r_[starts, len(c)])
        d = ts // DAY_US
        pair_order = np.lexsort((d, codes))
        pc_, pd_ = codes[pair_order], d[pair_order]
        new_pair = np.r_[True, (pc_[1:] != pc_[:-1]) | (pd_[1:] != pd_[:-1])]
        active = np.bincount(pc_[new_pair], minlength=len(uniq))
        return pa.table(
            {
                "user_id": pa.array(uniq, pa.int64()),
                "first_ts": pa.array(first).cast(pa.timestamp("us")),
                "last_ts": pa.array(last).cast(pa.timestamp("us")),
                "n_events": pa.array(n_ev.astype(np.int64)),
                "active_days": pa.array(active.astype(np.int64)),
            }
        )

    return task_exchange(
        _read(sf_dir, "events", ["user_id", "ts"]),
        "upart",
        parts,
        per_part,
        pre_fn=prep,
    )


def q_source_quality_profile(sf_dir: str):
    """Curation health rollup: per document source, exact corpus-level
    quality ratios — alphabetic share (sum of alpha chars over sum of
    chars, NOT a float mean of per-doc ratios, so the distributed sum
    stays order-independent) and average tokens per doc.  Per-batch
    int64 partial sums ride the bounded-strata combiner tree; the two
    ratios are single double divisions in the final task."""
    import numpy as np

    from rayslog.stages.aggregate import tree_reduce

    def partial(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        feats = pa.table(
            {
                "source": t.column("source"),
                "chars": pc.cast(pc.utf8_length(txt), pa.int64()),
                "tokens": pc.cast(
                    pc.count_substring_regex(txt, r"\S+"), pa.int64()
                ),
                "alpha": pc.cast(
                    pc.count_substring_regex(txt, r"[A-Za-z]"), pa.int64()
                ),
            }
        )
        return (
            feats.group_by(["source"])
            .aggregate(
                [
                    ("chars", "sum"),
                    ("tokens", "sum"),
                    ("alpha", "sum"),
                    ([], "count_all"),
                ]
            )
            .rename_columns(["source", "chars", "tokens", "alpha", "n_docs"])
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["source"])
            .aggregate(
                [
                    ("chars", "sum"),
                    ("tokens", "sum"),
                    ("alpha", "sum"),
                    ("n_docs", "sum"),
                ]
            )
            .rename_columns(["source", "chars", "tokens", "alpha", "n_docs"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        # all-null-text sources sum to null: coalesce to 0 like the SQL
        chars = pc.fill_null(t.column("chars"), 0).to_numpy(
            zero_copy_only=False
        )
        tokens = pc.fill_null(t.column("tokens"), 0).to_numpy(
            zero_copy_only=False
        )
        alpha = pc.fill_null(t.column("alpha"), 0).to_numpy(
            zero_copy_only=False
        )
        n = t.column("n_docs").to_numpy(zero_copy_only=False)
        alpha_ratio = [
            (float(a) / float(c)) if c else None
            for a, c in zip(alpha, chars)
        ]
        avg_tokens = [float(tk) / float(nn) for tk, nn in zip(tokens, n)]
        return pa.table(
            {
                "source": t.column("source"),
                "n_docs": pc.cast(t.column("n_docs"), pa.int64()),
                "n_tokens": pa.array(tokens.astype("int64")),
                "alpha_ratio": pa.array(alpha_ratio, pa.float64()),
                "avg_tokens": pa.array(avg_tokens, pa.float64()),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "alpha_ratio": pa.array([], pa.float64()),
                    "avg_tokens": pa.array([], pa.float64()),
                }
            )
        )

    return tree_reduce(
        _read(sf_dir, "documents", ["source", "text"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        reduce_fn,
        empty_fn=empty_fn,
        final_fn=final_fn,
    )


def q_trimmed_mean_value(sf_dir: str):
    """Outlier-robust grouped mean: per event type, the mean of values
    inside the type's own exact [p5, p95] band (thresholds derived from
    the corpus — the length_band_filter discipline applied to money).
    One scan: the (type, cents) projection materializes once, the
    grouped inverse-CDF gates come from the ref-level histogram tree,
    and the conditional sums re-read the SAME blocks with the gates as
    closure constants; exact int64 cents all the way to one final
    double division."""
    import numpy as np
    import ray
    import ray.data as rd

    from rayslog.stages.aggregate import (
        grouped_quantiles_int_from_refs,
        live_block_refs,
        tree_reduce_refs,
    )

    def proj(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "c": pc.cast(
                    pc.round(pc.multiply(t.column("value"), pa.scalar(100.0))),
                    pa.int64(),
                ),
            }
        )

    mat = (
        _read(sf_dir, "events", ["event_type", "value"])
        .map_batches(proj, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )
    refs = live_block_refs(mat)
    qdf = grouped_quantiles_int_from_refs(
        refs, "event_type", "c", quantiles=(0.05, 0.95)
    )
    lo, hi = {}, {}
    for r in qdf.itertuples():
        (lo if r.q == "p5" else hi)[r.event_type] = int(r.value)
    if not lo:
        return rd.from_arrow(
            pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "n_kept": pa.array([], pa.int64()),
                    "trimmed_mean": pa.array([], pa.float64()),
                }
            )
        )
    types = sorted(lo)
    lo_a = np.array([lo[k] for k in types], dtype=np.int64)
    hi_a = np.array([hi[k] for k in types], dtype=np.int64)
    types_arr = pa.array(types, pa.string())

    def cond_reduce(t: pa.Table) -> pa.Table:
        if "s" in t.column_names:  # later rounds: sum partials
            return (
                t.group_by(["event_type"])
                .aggregate([("s", "sum"), ("n_kept", "sum")])
                .rename_columns(["event_type", "s", "n_kept"])
            )
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        code = pc.index_in(et, value_set=types_arr).to_numpy(
            zero_copy_only=False
        )
        c = t.column("c").to_numpy(zero_copy_only=False)
        keep = (c >= lo_a[code]) & (c <= hi_a[code])
        s = np.zeros(len(types), dtype=np.int64)
        n = np.zeros(len(types), dtype=np.int64)
        np.add.at(s, code[keep], c[keep])
        np.add.at(n, code[keep], 1)
        return pa.table(
            {
                "event_type": types_arr,
                "s": pa.array(s),
                "n_kept": pa.array(n),
            }
        )

    def final_fn(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("n_kept"), 0))
        s = t.column("s").to_numpy(zero_copy_only=False)
        n = t.column("n_kept").to_numpy(zero_copy_only=False)
        tm = [float(ss) / 100.0 / float(nn) for ss, nn in zip(s, n)]
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "n_kept": pc.cast(t.column("n_kept"), pa.int64()),
                "trimmed_mean": pa.array(tm, pa.float64()),
            }
        )

    return rd.from_arrow(
        tree_reduce_refs(refs, cond_reduce, final_fn=final_fn)
    )


def q_segment_nation_lift(sf_dir: str):
    """Contingency-lift analysis: for every (nation, market segment)
    cell, the observed customer count and its lift over independence
    (obs * total / (row_total * col_total)) — the feature-correlation
    audit a curation run does before stratifying on two keys.  Counts
    ride the bounded-strata combiner tree (25 nations x 5 segments);
    the per-cell float lift is computed from exact BIGINT counts in
    one final task (no float ever crosses tasks — a global chi-square
    SUM would be order-dependent, per-cell lifts are not)."""
    import numpy as np
    import pyarrow.parquet as pq

    from rayslog.stages.aggregate import tree_reduce

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nk = nation.column("n_nationkey").to_numpy()
    names = nation.column("n_name").to_pylist()
    order = np.argsort(nk)
    nk_sorted = nk[order]
    name_by_pos = [names[i] for i in order]

    def partial(t: pa.Table) -> pa.Table:
        k = t.column("c_nationkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(nk_sorted, k)
        nm = pa.array([name_by_pos[p] for p in pos], pa.string())
        return (
            pa.table(
                {"n_name": nm, "c_mktsegment": t.column("c_mktsegment")}
            )
            .group_by(["n_name", "c_mktsegment"])
            .aggregate([([], "count_all")])
            .rename_columns(["n_name", "c_mktsegment", "n"])
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["n_name", "c_mktsegment"])
            .aggregate([("n", "sum")])
            .rename_columns(["n_name", "c_mktsegment", "n"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        nn = t.column("n_name").to_pylist()
        seg = t.column("c_mktsegment").to_pylist()
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        tot = int(n.sum())
        row = {}
        col = {}
        for a, b, c in zip(nn, seg, n):
            row[a] = row.get(a, 0) + int(c)
            col[b] = col.get(b, 0) + int(c)
        lift = [
            float(c) * float(tot) / (float(row[a]) * float(col[b]))
            for a, b, c in zip(nn, seg, n)
        ]
        return pa.table(
            {
                "n_name": t.column("n_name"),
                "c_mktsegment": t.column("c_mktsegment"),
                "n_customers": pa.array(n),
                "lift": pa.array(lift, pa.float64()),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "n_name": pa.array([], pa.string()),
                    "c_mktsegment": pa.array([], pa.string()),
                    "n_customers": pa.array([], pa.int64()),
                    "lift": pa.array([], pa.float64()),
                }
            )
        )

    return tree_reduce(
        _read(sf_dir, "customer", ["c_nationkey", "c_mktsegment"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        reduce_fn,
        empty_fn=empty_fn,
        final_fn=final_fn,
    )


def q_peak_active_users(sf_dir: str):
    """Interval-sweep max concurrency: gap-sessionize every user's
    events (30-min rule, the events_sessionize contract), then find the
    peak number of simultaneously active sessions and the earliest
    microsecond it is reached.

    Distributed ordered-scan combine: (1) one user-hash exchange emits
    per-part boundary deltas (+1 at session start, -1 just after end,
    pre-summed per distinct timestamp); (2) a tiny tree finds the
    global time range; (3) boundaries re-partition by TIME RANGE (the
    one key this sweep must co-locate on), each range part computes
    (delta_total, max_prefix, argmax_t) sorted locally; (4) the driver
    folds the P range triples in time order — O(P) work, every sort and
    sum on workers.  Partitioning assumption: boundary density is
    roughly uniform over the time span (sessions per range part fit a
    task)."""
    import numpy as np
    import ray
    import ray.data as rd

    from rayslog.stages.aggregate import task_exchange, tree_reduce_refs

    parts = 64
    range_parts = 32
    GAP_US = np.int64(1_800_000_000)

    def prep(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "ts_us": t.column("ts").cast(pa.int64()),
                "upart": pa.array(
                    (u.astype(np.uint64) % np.uint64(parts)).astype(np.int32)
                ),
            }
        )

    _empty_b = pa.table(
        {"t": pa.array([], pa.int64()), "d": pa.array([], pa.int64())}
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty_b
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        _, codes = np.unique(u, return_inverse=True)
        order = np.lexsort((eid, ts, codes))
        c, s = codes[order], ts[order]
        new_s = np.r_[True, (c[1:] != c[:-1]) | (s[1:] - s[:-1] > GAP_US)]
        starts = np.nonzero(new_s)[0]
        ends = np.r_[starts[1:], len(s)] - 1
        b_t = np.r_[s[starts], s[ends] + 1]
        b_d = np.r_[
            np.ones(len(starts), dtype=np.int64),
            -np.ones(len(starts), dtype=np.int64),
        ]
        # pre-sum per distinct boundary timestamp
        ut, inv = np.unique(b_t, return_inverse=True)
        dsum = np.zeros(len(ut), dtype=np.int64)
        np.add.at(dsum, inv, b_d)
        return pa.table({"t": pa.array(ut), "d": pa.array(dsum)})

    brefs = task_exchange(
        _read(sf_dir, "events", ["user_id", "event_id", "ts"]),
        "upart",
        parts,
        per_part,
        pre_fn=prep,
        return_refs=True,
    )

    def minmax(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table(
                {"lo": pa.array([], pa.int64()), "hi": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "lo": pa.array(
                    [int(pc.min(t.column("t")).as_py())], pa.int64()
                ),
                "hi": pa.array(
                    [int(pc.max(t.column("t")).as_py())], pa.int64()
                ),
            }
        )

    def mm_reduce(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return t
        return pa.table(
            {
                "lo": pa.array(
                    [int(pc.min(t.column("lo")).as_py())], pa.int64()
                ),
                "hi": pa.array(
                    [int(pc.max(t.column("hi")).as_py())], pa.int64()
                ),
            }
        )

    @ray.remote
    def _mm(t):
        return minmax(t)

    mm = tree_reduce_refs([_mm.remote(r) for r in brefs], mm_reduce)
    empty_out = pa.table(
        {
            "peak_active": pa.array([], pa.int64()),
            "at_us": pa.array([], pa.int64()),
        }
    )
    if not mm.num_rows:
        return rd.from_arrow(empty_out)
    lo = int(mm.column("lo")[0].as_py())
    hi = int(mm.column("hi")[0].as_py())
    span = max(hi - lo + 1, 1)

    @ray.remote
    def split_ranges(t: pa.Table):
        tt = t.column("t").to_numpy(zero_copy_only=False)
        rp = ((tt - lo) * range_parts // span).astype(np.int64)
        out = []
        for i in range(range_parts):
            m = rp == i
            out.append(
                pa.table(
                    {
                        "t": pa.array(tt[m]),
                        "d": t.column("d").filter(pa.array(m)),
                    }
                )
            )
        return out

    split_refs = [
        split_ranges.options(num_returns=range_parts).remote(r)
        for r in brefs
    ]

    @ray.remote
    def sweep_range(*pieces):
        t = pa.concat_tables(pieces)
        if not t.num_rows:
            return (0, None, None)
        tt = t.column("t").to_numpy(zero_copy_only=False)
        dd = t.column("d").to_numpy(zero_copy_only=False)
        ut, inv = np.unique(tt, return_inverse=True)
        ds = np.zeros(len(ut), dtype=np.int64)
        np.add.at(ds, inv, dd)
        pref = np.cumsum(ds)
        j = int(np.argmax(pref))  # first index of the max
        return (int(pref[-1]), int(pref[j]), int(ut[j]))

    triples = ray.get(
        [
            sweep_range.remote(
                *[split_refs[b][i] for b in range(len(brefs))]
            )
            for i in range(range_parts)
        ]
    )
    carry = 0
    best = None
    best_t = None
    for total, mx, mx_t in triples:
        if mx is not None:
            cand = carry + mx
            if best is None or cand > best:
                best, best_t = cand, mx_t
        carry += total
    if best is None:
        return rd.from_arrow(empty_out)
    return rd.from_arrow(
        pa.table(
            {
                "peak_active": pa.array([best], pa.int64()),
                "at_us": pa.array([best_t], pa.int64()),
            }
        )
    )


def q_value_minmax_scaled(sf_dir: str):
    """Feature scaling: per-row min-max normalized value within its
    event type ((v - min) / (max - min), NULL for constant groups —
    DuckDB's x/0).  One materialized (id, type, cents) projection: the
    per-type gates come from a bounded combiner tree over its blocks,
    then the SAME blocks re-map with the gates as closure constants —
    no second corpus scan, exact int cents into one double division
    per row."""
    import numpy as np
    import ray
    import ray.data as rd

    from rayslog.stages.aggregate import live_block_refs, tree_reduce_refs

    def proj(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
                "c": pc.cast(
                    pc.round(pc.multiply(t.column("value"), pa.scalar(100.0))),
                    pa.int64(),
                ),
            }
        )

    mat = (
        _read(sf_dir, "events", ["event_id", "event_type", "value"])
        .map_batches(proj, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )
    refs = live_block_refs(mat)

    def mm_reduce(t: pa.Table) -> pa.Table:
        cols = (
            ["event_type", "mn", "mx"]
            if "mn" in t.column_names
            else None
        )
        if cols is None:
            g = (
                t.select(["event_type", "c"])
                .group_by(["event_type"])
                .aggregate([("c", "min"), ("c", "max")])
            )
            return g.rename_columns(["event_type", "mn", "mx"])
        return (
            t.group_by(["event_type"])
            .aggregate([("mn", "min"), ("mx", "max")])
            .rename_columns(["event_type", "mn", "mx"])
        )

    gates = tree_reduce_refs(refs, mm_reduce)
    if not gates.num_rows:
        return rd.from_arrow(
            pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "event_type": pa.array([], pa.string()),
                    "scaled": pa.array([], pa.float64()),
                }
            )
        )
    types = gates.column("event_type").to_pylist()
    mn = gates.column("mn").to_numpy(zero_copy_only=False).astype(np.int64)
    mx = gates.column("mx").to_numpy(zero_copy_only=False).astype(np.int64)
    srt = np.argsort(np.asarray(types, dtype=object))
    types_arr = pa.array([types[i] for i in srt], pa.string())
    mn, mx = mn[srt], mx[srt]

    @ray.remote
    def scale(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        code = pc.index_in(et, value_set=types_arr).to_numpy(
            zero_copy_only=False
        )
        c = t.column("c").to_numpy(zero_copy_only=False)
        lo, hi = mn[code], mx[code]
        span = hi - lo
        with np.errstate(divide="ignore", invalid="ignore"):
            s = (c - lo).astype(np.float64) / span.astype(np.float64)
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
                "scaled": pa.array(
                    s, pa.float64(), mask=(span == 0)
                ),
            }
        )

    out = ray.get([scale.remote(r) for r in refs])
    out = [t for t in out if t.num_rows] or out[:1]
    return rd.from_arrow(pa.concat_tables(out))


def q_daily_type_matrix(sf_dir: str):
    """Dense zero-filled time series: events per (day, type) INCLUDING
    empty cells — the calendar-spine x category cross join every
    forecasting pipeline needs before windowing.  Counts ride the
    bounded (days x types) combiner tree; the final task crosses the
    arange day spine with the seen types and fills zeros."""
    import numpy as np

    from rayslog.stages.aggregate import tree_reduce

    DAY_US = np.int64(86_400_000_000)

    def partial(t: pa.Table) -> pa.Table:
        d = (
            t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            // DAY_US
        )
        return (
            pa.table({"dayi": pa.array(d), "event_type": t.column("event_type")})
            .group_by(["dayi", "event_type"])
            .aggregate([([], "count_all")])
            .rename_columns(["dayi", "event_type", "n"])
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["dayi", "event_type"])
            .aggregate([("n", "sum")])
            .rename_columns(["dayi", "event_type", "n"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        d = t.column("dayi").to_numpy(zero_copy_only=False)
        types = sorted(set(t.column("event_type").to_pylist()))
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        spine = np.arange(d.min(), d.max() + 1)
        tix = {ty: i for i, ty in enumerate(types)}
        dense = np.zeros((len(spine), len(types)), dtype=np.int64)
        et = t.column("event_type").to_pylist()
        dense[d - spine[0], [tix[x] for x in et]] = n
        day_col = np.repeat(spine, len(types)) * DAY_US
        return pa.table(
            {
                "day": pa.array(day_col).cast(pa.timestamp("us")),
                "event_type": pa.array(types * len(spine), pa.string()),
                "n": pa.array(dense.reshape(-1)),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "day": pa.array([], pa.timestamp("us")),
                    "event_type": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        )

    return tree_reduce(
        _read(sf_dir, "events", ["ts", "event_type"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        reduce_fn,
        empty_fn=empty_fn,
        final_fn=final_fn,
    )


def q_content_len_by_tag(sf_dir: str):
    """Exact p50/p95 of message content length per RFC3164 tag — the
    grouped inverse-CDF quantile machinery applied to the north-rule
    parse outputs (null contents count as empty, mirroring the Dump
    contract)."""
    from rayslog.stages.aggregate import grouped_quantiles_int, parsed_only

    ds = parsed_only(parsed_dataset(sf_dir))

    def feats(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.equal(t.column("rfc"), 1),
                pc.is_valid(t.column("tag")),
            )
        )
        return pa.table(
            {
                "tag": t.column("tag"),
                "clen": pc.cast(
                    pc.utf8_length(
                        pc.fill_null(t.column("content"), "")
                    ),
                    pa.int64(),
                ),
            }
        )

    return grouped_quantiles_int(
        ds.map_batches(feats, batch_format="pyarrow", zero_copy_batch=True),
        "tag",
        "clen",
        quantiles=(0.5, 0.95),
    )


def q_table_freshness(sf_dir: str):
    """Multi-table freshness audit: row count and latest timestamp per
    fact table in one result — the ops query every scheduled pipeline
    run starts with.  The three reads map to one common (tbl, ts_us)
    schema and UNION into a single streaming pass, so one combiner
    tree (one executor spin, not three) carries three grouped
    (count, max) partials."""
    from rayslog.stages.aggregate import tree_reduce

    def prep(table: str, ts_col: str):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table(
                {
                    "tbl": pa.array([table] * n, pa.string()),
                    "ts_us": t.column(ts_col).cast(pa.int64()),
                }
            )

        return fn

    union = (
        _read(sf_dir, "events", ["ts"])
        .map_batches(
            prep("events", "ts"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .union(
            _read(sf_dir, "lineitem", ["l_shipdate"]).map_batches(
                prep("lineitem", "l_shipdate"),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            _read(sf_dir, "orders", ["o_orderdate"]).map_batches(
                prep("orders", "o_orderdate"),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
        )
    )

    def reduce_fn(t: pa.Table) -> pa.Table:
        if "n_rows" in t.column_names:
            return (
                t.group_by(["tbl"])
                .aggregate([("n_rows", "sum"), ("max_us", "max")])
                .rename_columns(["tbl", "n_rows", "max_us"])
            )
        g = (
            t.group_by(["tbl"])
            .aggregate([([], "count_all"), ("ts_us", "max")])
        )
        return g.rename_columns(["tbl", "n_rows", "max_us"])

    def final_fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "tbl": t.column("tbl"),
                "n_rows": pc.cast(t.column("n_rows"), pa.int64()),
                "max_ts": pc.cast(t.column("max_us"), pa.int64()).cast(
                    pa.timestamp("us")
                ),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "tbl": pa.array([], pa.string()),
                    "n_rows": pa.array([], pa.int64()),
                    "max_ts": pa.array([], pa.timestamp("us")),
                }
            )
        )

    return tree_reduce(union, reduce_fn, empty_fn=empty_fn,
                       final_fn=final_fn)

def q_rolling_max(sf_dir: str):
    """Frame-window maximum: per event, the max of the user's last 5
    values (ROWS 4 PRECEDING..CURRENT) — the sliding-extreme companion
    to rolling_avg's prefix-sum mean.  One user-hash exchange; the
    window max is 4 shifted vectorized maximum passes (no per-row
    loop), user boundaries respected via the within-user position."""
    import numpy as np

    from rayslog.stages.aggregate import task_exchange

    parts = 64
    W = 5

    def prep(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "ts_us": t.column("ts").cast(pa.int64()),
                "c": pc.cast(
                    pc.round(pc.multiply(t.column("value"), pa.scalar(100.0))),
                    pa.int64(),
                ),
                "upart": pa.array(
                    (u.astype(np.uint64) % np.uint64(parts)).astype(np.int32)
                ),
            }
        )

    _empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "event_id": pa.array([], pa.int64()),
            "max5_value": pa.array([], pa.float64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        v = t.column("c").to_numpy(zero_copy_only=False)
        _, codes = np.unique(u, return_inverse=True)
        order = np.lexsort((eid, ts, codes))
        c, vv = codes[order], v[order]
        new_user = np.r_[True, c[1:] != c[:-1]]
        starts = np.nonzero(new_user)[0]
        seg_len = np.diff(np.r_[starts, len(c)])
        pos = np.arange(len(c)) - np.repeat(starts, seg_len)
        m = vv.copy()
        for k in range(1, W):
            valid = pos[k:] >= k
            np.maximum(
                m[k:], np.where(valid, vv[:-k], np.int64(-(2**62))),
                out=m[k:],
            )
        inv = np.empty(len(order), dtype=np.int64)
        inv[order] = np.arange(len(order))
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "max5_value": pa.array(
                    m[inv].astype(np.float64) / 100.0, pa.float64()
                ),
            }
        )

    return task_exchange(
        _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"]),
        "upart",
        parts,
        per_part,
        pre_fn=prep,
    )


def q_first_number(sf_dir: str):
    """Typed extraction: the first integer run in each document's text
    (NULL when absent) — the schema-projection step every log-mining
    pipeline runs before typing a field.  One vectorized RE2
    extract_regex pass per batch; semantics (leftmost match, NULL on
    miss/null) mirror the oracle's nullif(regexp_extract(...))."""

    def fn(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        ext = pc.extract_regex(txt, r"(?P<num>[0-9]+)")
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "num": pc.struct_field(ext, "num"),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def q_length_neighbor(sf_dir: str):
    """Scalar 1-NN by sorted adjacency: each document's nearest
    neighbor by character count within its language (ties prefer the
    sort-order predecessor), the blocking step of scalar-feature entity
    resolution.

    Distributed sorted-adjacency: the nearest value in a total order
    is always one of the two sort-adjacent rows, so (1) rows exchange
    by (lang, n_chars-range-bucket) cells — equal values co-locate by
    construction; (2) each cell resolves its interior rows vectorized
    and emits its two edge rows with their in-cell candidates; (3) the
    driver walks each lang's cells in bucket order and fixes up the
    O(cells) boundary rows against the neighboring non-empty cell's
    edge.  Partitioning assumption: one (lang, bucket) cell fits a
    task — size ``buckets`` to the corpus."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from rayslog.stages.aggregate import task_exchange

    buckets = 32
    parts = 64

    # global n_chars range from parquet stats-level scan (one tiny read)
    stat = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["n_chars"]
    )
    if not stat.num_rows:
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "lang": pa.array([], pa.string()),
                    "neighbor_id": pa.array([], pa.int64()),
                }
            )
        )
    lo = int(pc.min(stat.column("n_chars")).as_py())
    hi = int(pc.max(stat.column("n_chars")).as_py())
    span = max(hi - lo + 1, 1)

    def prep(t: pa.Table) -> pa.Table:
        n = t.column("n_chars").to_numpy(zero_copy_only=False)
        b = (n - lo) * buckets // span
        lang = t.column("lang")
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        from rayslog.kernels import texthash as tx

        h = tx.hash_utf8(lang, seed=3)
        cell = h * np.uint64(buckets) + b.astype(np.uint64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "lang": lang,
                "n_chars": t.column("n_chars"),
                "bkt": pa.array(b.astype(np.int64)),
                "cpart": pa.array(
                    (cell % np.uint64(parts)).astype(np.int32)
                ),
            }
        )

    _empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "lang": pa.array([], pa.string()),
            "neighbor_id": pa.array([], pa.int64()),
            "is_edge": pa.array([], pa.int8()),
            "bkt": pa.array([], pa.int64()),
            "n_chars": pa.array([], pa.int64()),
            "cand_id": pa.array([], pa.int64()),
            "cand_n": pa.array([], pa.int64()),
            "role": pa.array([], pa.int8()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        lang = t.column("lang")
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        ln = np.asarray(lang.to_pylist(), dtype=object)
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        nch = t.column("n_chars").to_numpy(zero_copy_only=False)
        bkt = t.column("bkt").to_numpy(zero_copy_only=False)
        # sort cells: (lang, bucket, n_chars, doc_id)
        order = np.lexsort((did, nch, bkt, ln))
        L, B, N, D = ln[order], bkt[order], nch[order], did[order]
        new_cell = np.r_[True, (L[1:] != L[:-1]) | (B[1:] != B[:-1])]
        starts = np.nonzero(new_cell)[0]
        ends = np.r_[starts[1:], len(L)] - 1
        rows_out = []
        for s, e in zip(starts, ends):
            n_cell = e - s + 1
            if n_cell >= 3:  # interior rows resolve here
                i = np.arange(s + 1, e)
                dprev = N[i] - N[i - 1]
                dnext = N[i + 1] - N[i]
                nb = np.where(dprev <= dnext, D[i - 1], D[i + 1])
                rows_out.append(
                    pa.table(
                        {
                            "doc_id": pa.array(D[i]),
                            "lang": pa.array(L[i], pa.string()),
                            "neighbor_id": pa.array(nb),
                            "is_edge": pa.array(
                                np.zeros(len(i), np.int8)
                            ),
                            "bkt": pa.array(B[i]),
                            "n_chars": pa.array(N[i]),
                            "cand_id": pa.array(
                                np.zeros(len(i), np.int64)
                            ),
                            "cand_n": pa.array(
                                np.zeros(len(i), np.int64)
                            ),
                            "role": pa.array(np.zeros(len(i), np.int8)),
                        }
                    )
                )
            # edge rows: role 0=solo, 1=first, 2=last
            if n_cell == 1:
                edges = [(s, 0, -1, -1)]
            else:
                edges = [
                    (s, 1, int(D[s + 1]), int(N[s + 1])),
                    (e, 2, int(D[e - 1]), int(N[e - 1])),
                ]
            for i, role, cid, cn in edges:
                rows_out.append(
                    pa.table(
                        {
                            "doc_id": pa.array([int(D[i])], pa.int64()),
                            "lang": pa.array([L[i]], pa.string()),
                            "neighbor_id": pa.array([None], pa.int64()),
                            "is_edge": pa.array([1], pa.int8()),
                            "bkt": pa.array([int(B[i])], pa.int64()),
                            "n_chars": pa.array([int(N[i])], pa.int64()),
                            "cand_id": pa.array([cid], pa.int64()),
                            "cand_n": pa.array([cn], pa.int64()),
                            "role": pa.array([role], pa.int8()),
                        }
                    )
                )
        return pa.concat_tables(rows_out) if rows_out else _empty

    out = task_exchange(
        _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"]),
        "cpart",
        parts,
        per_part,
        pre_fn=prep,
    ).materialize()

    core = out.map_batches(
        lambda t: t.filter(pc.equal(t.column("is_edge"), 0)).select(
            ["doc_id", "lang", "neighbor_id"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    edges = out.map_batches(
        lambda t: t.filter(pc.equal(t.column("is_edge"), 1)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_pandas()  # O(cells): <= 2 * langs * buckets rows

    fixed = {"doc_id": [], "lang": [], "neighbor_id": []}
    for lang_v, g in edges.groupby("lang", sort=False):
        g = g.sort_values(["bkt", "n_chars", "doc_id", "role"])
        recs = g.to_dict("records")
        # cell chain in bucket order; prev/next NON-EMPTY cell edges
        for i, r in enumerate(recs):
            # candidates tagged pred(0)/succ(1): the |diff| tie must go
            # to the sort-order PREDECESSOR, exactly the SQL's `<=` on
            # LAG — never a doc_id tiebreak
            cands = []
            if r["cand_id"] != -1 and r["role"] != 0:
                # in-cell adjacent row: successor for a first row,
                # predecessor for a last row
                cands.append(
                    (r["cand_n"], 0 if r["role"] == 2 else 1,
                     r["cand_id"])
                )
            # previous chain row (last row of the nearest smaller
            # bucket) is the global predecessor; roles sort first<last
            # within a cell
            if r["role"] in (0, 1):
                for j in range(i - 1, -1, -1):
                    if recs[j]["bkt"] < r["bkt"]:
                        cands.append(
                            (recs[j]["n_chars"], 0, recs[j]["doc_id"])
                        )
                        break
            if r["role"] in (0, 2):
                for j in range(i + 1, len(recs)):
                    if recs[j]["bkt"] > r["bkt"]:
                        cands.append(
                            (recs[j]["n_chars"], 1, recs[j]["doc_id"])
                        )
                        break
            best = None
            n0 = r["n_chars"]
            for cn, side, cid in cands:
                key = (abs(int(n0) - int(cn)), side)
                if best is None or key < best[0]:
                    best = (key, int(cid))
            fixed["doc_id"].append(int(r["doc_id"]))
            fixed["lang"].append(lang_v)
            fixed["neighbor_id"].append(
                best[1] if best is not None else None
            )
    return core.union(
        rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(fixed["doc_id"], pa.int64()),
                    "lang": pa.array(fixed["lang"], pa.string()),
                    "neighbor_id": pa.array(
                        fixed["neighbor_id"], pa.int64()
                    ),
                }
            )
        )
    )


def q_monthly_active_customers(sf_dir: str):
    """MAU curve on orders: exact distinct ordering customers per
    month (the grouped count-distinct machinery over a month-truncated
    key; only deduped (month, custkey) pairs leave a task)."""
    from rayslog.stages.aggregate import distinct_count_by

    def proj(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "month": pc.floor_temporal(
                    t.column("o_orderdate"), unit="month"
                ),
                "o_custkey": t.column("o_custkey"),
            }
        )

    return distinct_count_by(
        _read(sf_dir, "orders", ["o_orderdate", "o_custkey"]).map_batches(
            proj, batch_format="pyarrow", zero_copy_batch=True
        ),
        "month",
        "o_custkey",
        alias="active_customers",
    )


def q_tool_usage(sf_dir: str):
    """Per-tool health rollup on the north-rule table: total turns,
    parse errors and error rate per transcript `tool` tag (the raw
    column the parse outcome joins back onto).  Bounded-domain counts
    through the combiner tree; the rate is one double division of
    exact int64 counts."""
    from rayslog.stages.aggregate import tree_reduce

    ds = parsed_dataset(
        sf_dir, columns=("conv_id", "turn_idx", "text", "tool")
    )

    def partial(t: pa.Table) -> pa.Table:
        return (
            pa.table(
                {
                    "tool": t.column("tool"),
                    "err": pc.cast(
                        pc.is_valid(t.column("parse_error")), pa.int64()
                    ),
                }
            )
            .group_by(["tool"])
            .aggregate([("err", "sum"), ([], "count_all")])
            .rename_columns(["tool", "n_errors", "n_turns"])
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["tool"])
            .aggregate([("n_errors", "sum"), ("n_turns", "sum")])
            .rename_columns(["tool", "n_errors", "n_turns"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "tool": t.column("tool"),
                "n_turns": pc.cast(t.column("n_turns"), pa.int64()),
                "n_errors": pc.cast(t.column("n_errors"), pa.int64()),
                "error_rate": pc.divide(
                    pc.cast(t.column("n_errors"), pa.float64()),
                    pc.cast(t.column("n_turns"), pa.float64()),
                ),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "tool": pa.array([], pa.string()),
                    "n_turns": pa.array([], pa.int64()),
                    "n_errors": pa.array([], pa.int64()),
                    "error_rate": pa.array([], pa.float64()),
                }
            )
        )

    return tree_reduce(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        reduce_fn,
        empty_fn=empty_fn,
        final_fn=final_fn,
    )


def q_supplier_balance_pctrank(sf_dir: str):
    """PERCENT_RANK within nation: (rank-1)/(n-1) where rank carries
    GAPS on ties (count of strictly smaller + 1 — the third tie
    semantics after row_number and DENSE_RANK in the suite).  One
    nation-hash exchange; ranks resolve vectorized per part
    (searchsorted over the nation's sorted cents); single-supplier
    nations emit 0.0, DuckDB's convention."""
    import numpy as np

    from rayslog.stages.aggregate import task_exchange

    parts = 16

    def prep(t: pa.Table) -> pa.Table:
        k = t.column("s_nationkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "s_suppkey": pc.cast(t.column("s_suppkey"), pa.int64()),
                "s_nationkey": pc.cast(t.column("s_nationkey"), pa.int32()),
                "cents": pc.cast(
                    pc.round(
                        pc.multiply(t.column("s_acctbal"), pa.scalar(100.0))
                    ),
                    pa.int64(),
                ),
                "npart": pa.array(
                    (k.astype(np.uint64) % np.uint64(parts)).astype(np.int32)
                ),
            }
        )

    _empty = pa.table(
        {
            "s_suppkey": pa.array([], pa.int64()),
            "s_nationkey": pa.array([], pa.int32()),
            "pct_rank": pa.array([], pa.float64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        nk = t.column("s_nationkey").to_numpy(zero_copy_only=False)
        c = t.column("cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((c, nk))
        nks, cs = nk[order], c[order]
        starts = np.r_[0, np.nonzero(nks[1:] != nks[:-1])[0] + 1]
        seg_len = np.diff(np.r_[starts, len(nks)])
        seg_of = np.repeat(np.arange(len(starts)), seg_len)
        # rank with gaps = count of strictly smaller within nation + 1
        eq_prev = np.r_[False, (cs[1:] == cs[:-1]) & (nks[1:] == nks[:-1])]
        # each row's rank-with-gaps = first index of its equal-value
        # run, rebased to its nation start
        run_start = np.r_[0, np.nonzero(~eq_prev[1:])[0] + 1]
        run_len = np.diff(np.r_[run_start, len(cs)])
        first_eq = np.repeat(run_start, run_len)
        rank = first_eq - starts[seg_of] + 1
        n = seg_len[seg_of]
        pr = np.where(
            n > 1, (rank - 1) / np.maximum(n - 1, 1), 0.0
        ).astype(np.float64)
        inv = np.empty(len(order), dtype=np.int64)
        inv[order] = np.arange(len(order))
        return pa.table(
            {
                "s_suppkey": t.column("s_suppkey"),
                "s_nationkey": t.column("s_nationkey"),
                "pct_rank": pa.array(pr[inv], pa.float64()),
            }
        )

    return task_exchange(
        _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey", "s_acctbal"]),
        "npart",
        parts,
        per_part,
        pre_fn=prep,
    )


def q_value_ecdf_probes(sf_dir: str):
    """Exact empirical CDF of event values at fixed probe points (the
    calibration-curve op): for each probe, the share of events with
    value <= probe.  Per-batch vectorized compare-counts collapse to
    one bounded row set through the combiner tree; the share is one
    double division of exact int64 counts per probe."""
    import numpy as np

    from rayslog.stages.aggregate import tree_reduce

    probes_c = np.array([1000, 2500, 5000, 10000, 25000], dtype=np.int64)

    def partial(t: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.round(pc.multiply(t.column("value"), pa.scalar(100.0))),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        counts = (c[:, None] <= probes_c[None, :]).sum(axis=0)
        return pa.table(
            {
                "probe": pa.array(probes_c),
                "n_le": pa.array(counts.astype(np.int64)),
                "n_total": pa.array(
                    np.full(len(probes_c), len(c), dtype=np.int64)
                ),
            }
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["probe"])
            .aggregate([("n_le", "sum"), ("n_total", "sum")])
            .rename_columns(["probe", "n_le", "n_total"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "probe_value": pc.divide(
                    pc.cast(t.column("probe"), pa.float64()), 100.0
                ),
                "n_le": pc.cast(t.column("n_le"), pa.int64()),
                "cdf": pc.divide(
                    pc.cast(t.column("n_le"), pa.float64()),
                    pc.cast(t.column("n_total"), pa.float64()),
                ),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "probe_value": pa.array([], pa.float64()),
                    "n_le": pa.array([], pa.int64()),
                    "cdf": pa.array([], pa.float64()),
                }
            )
        )

    return tree_reduce(
        _read(sf_dir, "events", ["value"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        reduce_fn,
        empty_fn=empty_fn,
        final_fn=final_fn,
    )


def q_ship_latency_quantiles(sf_dir: str):
    """Exact p50/p95 of order→ship latency (days) per order priority —
    the distributed-join → grouped inverse-CDF composition (ship_latency
    gives the mean; tail percentiles are what an SLA audit actually
    reads).  Join buckets stay in ref-land: one day-diff task per
    bucket, then the per-(priority, days) histogram rides the ref-level
    combiner tree (O(priorities x distinct day counts) rows — bounded
    by the calendar, not the data)."""
    import ray
    import ray.data as rd

    from rayslog.stages.aggregate import grouped_quantiles_int_from_refs
    from rayslog.stages.relational import hash_join

    DAY_US = 86_400_000_000

    def o_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_orderpriority": t.column("o_orderpriority"),
                "oday": pc.divide(
                    t.column("o_orderdate").cast(pa.int64()),
                    pa.scalar(DAY_US, pa.int64()),
                ),
            }
        )

    def l_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t.column("l_orderkey"),
                "sday": pc.divide(
                    t.column("l_shipdate").cast(pa.int64()),
                    pa.scalar(DAY_US, pa.int64()),
                ),
            }
        )

    jrefs = hash_join(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]).map_batches(
            l_prep, batch_format="pyarrow", zero_copy_batch=True
        ),
        _read(
            sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
        ).map_batches(o_prep, batch_format="pyarrow", zero_copy_batch=True),
        key="o_orderkey",
        return_refs=True,
    )

    @ray.remote
    def to_days(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": t.column("o_orderpriority"),
                "ddays": pc.subtract(t.column("sday"), t.column("oday")),
            }
        )

    df = grouped_quantiles_int_from_refs(
        [to_days.remote(r) for r in jrefs],
        "o_orderpriority",
        "ddays",
        quantiles=(0.5, 0.95),
    )
    if not len(df):
        return rd.from_arrow(
            pa.table(
                {
                    "o_orderpriority": pa.array([], pa.string()),
                    "q": pa.array([], pa.string()),
                    "value": pa.array([], pa.float64()),
                }
            )
        )
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def q_top_value_events_per_type(sf_dir: str):
    """Top-3 events by value per event type, returning the full rows
    (value desc, event_id asc on ties) — the k>1 generalization of the
    keep-best reduce: 'keep each key's top-3' is itself re-applicable,
    so per-batch top-3s merge through the cardinality-adaptive tree
    and no sort-shuffle ever runs."""
    import numpy as np

    from rayslog.stages.aggregate import tree_reduce

    K = 3

    def topk(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        _, codes = np.unique(
            et.cast(pa.large_string()).to_numpy(zero_copy_only=False),
            return_inverse=True,
        )
        c = t.column("vc").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, -c, codes))
        cs = codes[order]
        starts = np.r_[0, np.nonzero(cs[1:] != cs[:-1])[0] + 1]
        seg_len = np.diff(np.r_[starts, len(cs)])
        pos = np.arange(len(cs)) - np.repeat(starts, seg_len)
        pick = pa.array(order[pos < K])
        return pa.table(
            {
                "event_type": et.take(pick),
                "event_id": t.column("event_id").take(pick),
                "value": t.column("value").take(pick),
                "vc": t.column("vc").take(pick),
            }
        )

    def partial(t: pa.Table) -> pa.Table:
        return topk(
            pa.table(
                {
                    "event_type": t.column("event_type"),
                    "event_id": t.column("event_id"),
                    "value": t.column("value"),
                    "vc": pc.cast(
                        pc.round(
                            pc.multiply(t.column("value"), pa.scalar(100.0))
                        ),
                        pa.int64(),
                    ),
                }
            )
        )

    def final_fn(t: pa.Table) -> pa.Table:
        return t.drop_columns(["vc"])

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "event_id": pa.array([], pa.int64()),
                    "value": pa.array([], pa.float64()),
                }
            )
        )

    return tree_reduce(
        _read(sf_dir, "events", ["event_type", "event_id", "value"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        topk,
        empty_fn=empty_fn,
        final_fn=final_fn,
        split_keys=["event_type"],
    )


def q_region_nation_rollup(sf_dir: str):
    """Relational ROLLUP: order revenue per (region, nation) with
    per-region subtotals and a grand total (NULL-filled rollup levels,
    DuckDB's ROLLUP shape).  Customer nation resolves via the 25-row
    broadcast dim; exact-cents leaf counts ride the bounded tree and
    the subtotal rows are derived from the leaves in the final task —
    the rollup never rescans."""
    import numpy as np
    import pyarrow.parquet as pq

    from rayslog.stages.aggregate import tree_reduce

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    region = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    )
    rmap = dict(
        zip(
            region.column("r_regionkey").to_pylist(),
            region.column("r_name").to_pylist(),
        )
    )
    nk = nation.column("n_nationkey").to_numpy()
    order = np.argsort(nk)
    nk_sorted = nk[order]
    nnames = nation.column("n_name").to_pylist()
    nregs = nation.column("n_regionkey").to_pylist()
    nname = np.array([nnames[i] for i in order], dtype=object)
    rname = np.array([rmap[nregs[i]] for i in order], dtype=object)
    cust_nk = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    ck = cust_nk.column("c_custkey").to_numpy()
    cnk = cust_nk.column("c_nationkey").to_numpy()
    corder = np.argsort(ck)
    ck_sorted, cnk_sorted = ck[corder], cnk[corder]

    def partial(t: pa.Table) -> pa.Table:
        cust = t.column("o_custkey").to_numpy(zero_copy_only=False)
        nkk = cnk_sorted[np.searchsorted(ck_sorted, cust)]
        pos = np.searchsorted(nk_sorted, nkk)
        cents = pc.cast(
            pc.round(pc.multiply(t.column("o_totalprice"), pa.scalar(100.0))),
            pa.int64(),
        )
        return (
            pa.table(
                {
                    "r_name": pa.array(rname[pos], pa.string()),
                    "n_name": pa.array(nname[pos], pa.string()),
                    "c": cents,
                }
            )
            .group_by(["r_name", "n_name"])
            .aggregate([("c", "sum")])
            .rename_columns(["r_name", "n_name", "c"])
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["r_name", "n_name"])
            .aggregate([("c", "sum")])
            .rename_columns(["r_name", "n_name", "c"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        rows = [df]
        sub = df.groupby("r_name", as_index=False)["c"].sum()
        sub["n_name"] = None
        rows.append(sub[["r_name", "n_name", "c"]])
        rows.append(
            pd.DataFrame(
                {"r_name": [None], "n_name": [None], "c": [df["c"].sum()]}
            )
        )
        out = pd.concat(rows, ignore_index=True)
        return pa.table(
            {
                "r_name": pa.array(out["r_name"], pa.string()),
                "n_name": pa.array(out["n_name"], pa.string()),
                "revenue": pa.array(
                    [float(x) / 100.0 for x in out["c"]], pa.float64()
                ),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "r_name": pa.array([], pa.string()),
                    "n_name": pa.array([], pa.string()),
                    "revenue": pa.array([], pa.float64()),
                }
            )
        )

    return tree_reduce(
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        reduce_fn,
        empty_fn=empty_fn,
        final_fn=final_fn,
    )


def q_conv_rfc_mix(sf_dir: str):
    """Per-conversation dialect profile on the north-rule table: how
    many turns parsed as RFC3164 vs RFC5424 vs failed, plus the
    dominant parsed dialect (ties -> 3164).  One conv-hash exchange;
    per-conv conditional counts resolve vectorized (bincount over
    fused conv x outcome codes)."""
    import numpy as np

    from rayslog.sources.testgen import rows_for
    from rayslog.stages.aggregate import task_exchange
    from rayslog.stages.events import _user_codes, _user_hash

    n_rows = rows_for(sf_dir)
    parts = max(16, min(4096, -(-n_rows // 500_000)))

    def prep(t: pa.Table) -> pa.Table:
        h = _user_hash(t.column("conv_id"))
        err = pc.is_valid(t.column("parse_error"))
        # outcome code: 0 = 3164-ok, 1 = 5424-ok, 2 = error
        code = pc.if_else(
            err,
            pa.scalar(2, pa.int8()),
            pc.if_else(
                pc.equal(t.column("rfc"), 1),
                pa.scalar(0, pa.int8()),
                pa.scalar(1, pa.int8()),
            ),
        )
        return pa.table(
            {
                "conv_id": t.column("conv_id"),
                "outcome": code,
                "cpart": pa.array((h % np.uint64(parts)).astype(np.int32)),
            }
        )

    _empty = pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "n_3164": pa.array([], pa.int64()),
            "n_5424": pa.array([], pa.int64()),
            "n_errors": pa.array([], pa.int64()),
            "dominant_rfc": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        conv = t.column("conv_id")
        if isinstance(conv, pa.ChunkedArray):
            conv = conv.combine_chunks()
        codes = _user_codes(conv)
        oc = t.column("outcome").to_numpy(zero_copy_only=False)
        n_conv = int(codes.max()) + 1
        counts = np.bincount(
            codes.astype(np.int64) * 3 + oc, minlength=n_conv * 3
        ).reshape(n_conv, 3)
        dom = np.where(counts[:, 0] >= counts[:, 1], 1, 2).astype(np.int64)
        # one representative row per conv code for the id value
        o = np.argsort(codes, kind="stable")
        firsts = o[np.searchsorted(codes[o], np.arange(n_conv))]
        return pa.table(
            {
                "conv_id": conv.take(pa.array(firsts)),
                "n_3164": pa.array(counts[:, 0].astype(np.int64)),
                "n_5424": pa.array(counts[:, 1].astype(np.int64)),
                "n_errors": pa.array(counts[:, 2].astype(np.int64)),
                "dominant_rfc": pa.array(dom),
            }
        )

    return task_exchange(
        parsed_dataset(sf_dir).select_columns(
            ["conv_id", "rfc", "parse_error"]
        ),
        "cpart",
        parts,
        per_part,
        pre_fn=prep,
    )


def q_idle_users(sf_dir: str):
    """Churn audit: users whose LAST event precedes the stream's end by
    more than 24 hours, with their last-seen timestamp.  Two-phase over
    one exchange: per-user max timestamps resolve per part (user-hash
    co-location), the global max rides a scalar tree, and the
    threshold filter is a closure constant on the per-user rows — the
    time-based anti-join every retention pipeline runs."""
    import numpy as np
    import ray
    import ray.data as rd

    from rayslog.stages.aggregate import task_exchange, tree_reduce_refs

    parts = 64
    IDLE_US = np.int64(86_400_000_000)  # 24h: ~p90 of the corpus

    def prep(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "ts_us": t.column("ts").cast(pa.int64()),
                "upart": pa.array(
                    (u.astype(np.uint64) % np.uint64(parts)).astype(np.int32)
                ),
            }
        )

    _empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "last_us": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        g = (
            t.select(["user_id", "ts_us"])
            .group_by(["user_id"])
            .aggregate([("ts_us", "max")])
            .rename_columns(["user_id", "last_us"])
        )
        return g

    refs = task_exchange(
        _read(sf_dir, "events", ["user_id", "ts"]),
        "upart",
        parts,
        per_part,
        pre_fn=prep,
        return_refs=True,
    )

    def mx_reduce(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({"m": pa.array([], pa.int64())})
        col = "last_us" if "last_us" in t.column_names else "m"
        return pa.table(
            {"m": pa.array([int(pc.max(t.column(col)).as_py())], pa.int64())}
        )

    @ray.remote
    def _mx(t):
        return mx_reduce(t)

    mm = tree_reduce_refs([_mx.remote(r) for r in refs], mx_reduce)
    if not mm.num_rows:
        return rd.from_arrow(
            pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "last_ts": pa.array([], pa.timestamp("us")),
                }
            )
        )
    cutoff = int(mm.column("m")[0].as_py()) - int(IDLE_US)

    @ray.remote
    def keep_idle(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t.column("last_us"), cutoff))
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "last_ts": t.column("last_us").cast(pa.timestamp("us")),
            }
        )

    out = ray.get([keep_idle.remote(r) for r in refs])
    non_empty = [t for t in out if t.num_rows] or out[:1]
    return rd.from_arrow(pa.concat_tables(non_empty))


def q_conv_role_balance(sf_dir: str):
    """Per-conversation verbosity balance on the RAW transcript table:
    total text characters by user vs assistant turns and the user
    share (NULL when the conversation has neither).  One conv-hash
    exchange; per-conv role sums resolve via a fused conv x role
    bincount weighted by char counts."""
    import numpy as np

    from rayslog.sources.testgen import rows_for
    from rayslog.stages.aggregate import task_exchange
    from rayslog.stages.events import _user_codes, _user_hash

    n_rows = rows_for(sf_dir)
    parts = max(16, min(4096, -(-n_rows // 500_000)))

    def prep(t: pa.Table) -> pa.Table:
        h = _user_hash(t.column("conv_id"))
        role = t.column("role")
        rc = pc.if_else(
            pc.equal(role, "user"),
            pa.scalar(0, pa.int8()),
            pc.if_else(
                pc.equal(role, "assistant"),
                pa.scalar(1, pa.int8()),
                pa.scalar(2, pa.int8()),
            ),
        )
        return pa.table(
            {
                "conv_id": t.column("conv_id"),
                "rc": rc,
                "chars": pc.cast(
                    pc.fill_null(pc.utf8_length(t.column("text")), 0),
                    pa.int64(),
                ),
                "cpart": pa.array((h % np.uint64(parts)).astype(np.int32)),
            }
        )

    _empty = pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "user_chars": pa.array([], pa.int64()),
            "assistant_chars": pa.array([], pa.int64()),
            "user_share": pa.array([], pa.float64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        conv = t.column("conv_id")
        if isinstance(conv, pa.ChunkedArray):
            conv = conv.combine_chunks()
        codes = _user_codes(conv)
        rc = t.column("rc").to_numpy(zero_copy_only=False).astype(np.int64)
        ch = t.column("chars").to_numpy(zero_copy_only=False)
        n_conv = int(codes.max()) + 1
        sums = np.bincount(
            codes.astype(np.int64) * 3 + rc, weights=ch,
            minlength=n_conv * 3,
        ).reshape(n_conv, 3).astype(np.int64)
        uc, ac = sums[:, 0], sums[:, 1]
        tot = uc + ac
        with np.errstate(divide="ignore", invalid="ignore"):
            share = uc.astype(np.float64) / tot.astype(np.float64)
        o = np.argsort(codes, kind="stable")
        firsts = o[np.searchsorted(codes[o], np.arange(n_conv))]
        return pa.table(
            {
                "conv_id": conv.take(pa.array(firsts)),
                "user_chars": pa.array(uc),
                "assistant_chars": pa.array(ac),
                "user_share": pa.array(
                    share, pa.float64(), mask=(tot == 0)
                ),
            }
        )

    return task_exchange(
        read_transcripts(sf_dir, ["conv_id", "role", "text"]),
        "cpart",
        parts,
        per_part,
        pre_fn=prep,
    )


def q_customer_rfm(sf_dir: str):
    """RFM feature build — the canonical ML feature-engineering query:
    per customer, Recency (days from last order to the stream's end),
    Frequency (order count) and Monetary (exact-cents spend).  One
    custkey-hash exchange resolves all three vectorized; the global
    max date rides a scalar tree and recency is a closure constant
    subtraction, never a second scan."""
    import numpy as np
    import ray
    import ray.data as rd

    from rayslog.stages.aggregate import task_exchange, tree_reduce_refs

    parts = 64
    DAY_US = np.int64(86_400_000_000)

    def prep(t: pa.Table) -> pa.Table:
        u = t.column("o_custkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "c_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
                "ts_us": t.column("o_orderdate").cast(pa.int64()),
                "cents": pc.cast(
                    pc.round(
                        pc.multiply(t.column("o_totalprice"), pa.scalar(100.0))
                    ),
                    pa.int64(),
                ),
                "cpart": pa.array(
                    (u.astype(np.uint64) % np.uint64(parts)).astype(np.int32)
                ),
            }
        )

    _empty = pa.table(
        {
            "c_custkey": pa.array([], pa.int64()),
            "last_us": pa.array([], pa.int64()),
            "frequency": pa.array([], pa.int64()),
            "mc": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        return (
            t.select(["c_custkey", "ts_us", "cents"])
            .group_by(["c_custkey"])
            .aggregate([("ts_us", "max"), ([], "count_all"), ("cents", "sum")])
            .rename_columns(["c_custkey", "last_us", "frequency", "mc"])
        )

    refs = task_exchange(
        _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"]),
        "cpart",
        parts,
        per_part,
        pre_fn=prep,
        return_refs=True,
    )

    def mx_reduce(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({"m": pa.array([], pa.int64())})
        col = "last_us" if "last_us" in t.column_names else "m"
        return pa.table(
            {"m": pa.array([int(pc.max(t.column(col)).as_py())], pa.int64())}
        )

    @ray.remote
    def _mx(t):
        return mx_reduce(t)

    mm = tree_reduce_refs([_mx.remote(r) for r in refs], mx_reduce)
    empty_out = pa.table(
        {
            "c_custkey": pa.array([], pa.int64()),
            "recency_days": pa.array([], pa.int64()),
            "frequency": pa.array([], pa.int64()),
            "monetary": pa.array([], pa.float64()),
        }
    )
    if not mm.num_rows:
        return rd.from_arrow(empty_out)
    end_day = int(mm.column("m")[0].as_py()) // int(DAY_US)

    @ray.remote
    def finish(t: pa.Table) -> pa.Table:
        last = t.column("last_us").to_numpy(zero_copy_only=False)
        rec = end_day - last // DAY_US
        return pa.table(
            {
                "c_custkey": t.column("c_custkey"),
                "recency_days": pa.array(rec.astype(np.int64)),
                "frequency": pc.cast(t.column("frequency"), pa.int64()),
                "monetary": pc.divide(
                    pc.cast(t.column("mc"), pa.float64()), 100.0
                ),
            }
        )

    out = ray.get([finish.remote(r) for r in refs])
    non_empty = [t for t in out if t.num_rows] or out[:1]
    return rd.from_arrow(pa.concat_tables(non_empty))


def q_brand_return_rate(sf_dir: str):
    """Per-brand return rate: share of lineitems with returnflag 'R'.
    The part dim rides the broadcast leg (auto-select threshold, the
    regional_revenue pattern); conditional counts collapse through the
    bounded-brand combiner tree and the rate is one double division of
    exact int64 counts."""
    import numpy as np
    import pyarrow.parquet as pq

    from rayslog.stages.aggregate import tree_reduce

    pk = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    keys = pk.column("p_partkey").to_numpy()
    order = np.argsort(keys)
    keys_sorted = keys[order]
    brands_l = pk.column("p_brand").to_pylist()
    brands = np.array([brands_l[i] for i in order], dtype=object)

    def partial(t: pa.Table) -> pa.Table:
        k = t.column("l_partkey").to_numpy(zero_copy_only=False)
        b = brands[np.searchsorted(keys_sorted, k)]
        ret = pc.cast(
            pc.equal(t.column("l_returnflag"), "R"), pa.int64()
        )
        return (
            pa.table(
                {
                    "p_brand": pa.array(b, pa.string()),
                    "n_returned": ret,
                    "n_items": pa.array(np.ones(t.num_rows, np.int64)),
                }
            )
            .group_by(["p_brand"])
            .aggregate([("n_returned", "sum"), ("n_items", "sum")])
            .rename_columns(["p_brand", "n_returned", "n_items"])
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["p_brand"])
            .aggregate([("n_returned", "sum"), ("n_items", "sum")])
            .rename_columns(["p_brand", "n_returned", "n_items"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_brand": t.column("p_brand"),
                "n_items": pc.cast(t.column("n_items"), pa.int64()),
                "n_returned": pc.cast(t.column("n_returned"), pa.int64()),
                "return_rate": pc.divide(
                    pc.cast(t.column("n_returned"), pa.float64()),
                    pc.cast(t.column("n_items"), pa.float64()),
                ),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "p_brand": pa.array([], pa.string()),
                    "n_items": pa.array([], pa.int64()),
                    "n_returned": pa.array([], pa.int64()),
                    "return_rate": pa.array([], pa.float64()),
                }
            )
        )

    return tree_reduce(
        _read(sf_dir, "lineitem", ["l_partkey", "l_returnflag"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        reduce_fn,
        empty_fn=empty_fn,
        final_fn=final_fn,
    )


def q_conv_severity_drift(sf_dir: str):
    """Escalation audit on the north-rule table: each conversation's
    FIRST and LAST parsed severity (turn order) and whether it
    escalated (last < first — lower severity number is more severe).
    One conv-hash exchange; first/last resolve via lexsort + boundary
    picks."""
    import numpy as np

    from rayslog.sources.testgen import rows_for
    from rayslog.stages.aggregate import parsed_only, task_exchange
    from rayslog.stages.events import _user_codes, _user_hash

    n_rows = rows_for(sf_dir)
    parts = max(16, min(4096, -(-n_rows // 500_000)))

    def prep(t: pa.Table) -> pa.Table:
        h = _user_hash(t.column("conv_id"))
        return pa.table(
            {
                "conv_id": t.column("conv_id"),
                "turn_idx": t.column("turn_idx"),
                "severity": pc.cast(t.column("severity"), pa.int64()),
                "cpart": pa.array((h % np.uint64(parts)).astype(np.int32)),
            }
        )

    _empty = pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "first_severity": pa.array([], pa.int64()),
            "last_severity": pa.array([], pa.int64()),
            "escalated": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        conv = t.column("conv_id")
        if isinstance(conv, pa.ChunkedArray):
            conv = conv.combine_chunks()
        codes = _user_codes(conv)
        ti = t.column("turn_idx").to_numpy(zero_copy_only=False)
        sev = t.column("severity").to_numpy(zero_copy_only=False)
        order = np.lexsort((ti, codes))
        c = codes[order]
        firsts_m = np.r_[True, c[1:] != c[:-1]]
        lasts_m = np.r_[c[1:] != c[:-1], True]
        fs = sev[order][firsts_m]
        ls = sev[order][lasts_m]
        pick = pa.array(order[firsts_m])
        return pa.table(
            {
                "conv_id": conv.take(pick),
                "first_severity": pa.array(fs),
                "last_severity": pa.array(ls),
                "escalated": pa.array((ls < fs).astype(np.int64)),
            }
        )

    return task_exchange(
        parsed_only(parsed_dataset(sf_dir)).select_columns(
            ["conv_id", "turn_idx", "severity"]
        ),
        "cpart",
        parts,
        per_part,
        pre_fn=prep,
    )


def q_embedding_norms(sf_dir: str):
    """Per-vector L2 norm over the embeddings table — the sanity
    feature every ANN/dedup run derives first.  The squared sum
    accumulates SEQUENTIALLY over the 64 dims (vectorized across rows,
    looped over dims) so the float result is bit-identical to DuckDB's
    list_sum left-fold; np.sum's pairwise summation would be ULP-off
    (invariant #4's float-order family)."""
    import numpy as np

    def fn(t: pa.Table) -> pa.Table:
        emb = t.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = emb.values.to_numpy(zero_copy_only=False).astype(np.float64)
        n = t.num_rows
        d = len(flat) // max(n, 1)
        m = flat.reshape(n, d)
        acc = np.zeros(n, dtype=np.float64)
        for j in range(d):  # sequential fold == DuckDB list_sum
            acc = acc + m[:, j] * m[:, j]
        return pa.table(
            {
                "vec_id": t.column("vec_id"),
                "norm": pa.array(np.sqrt(acc), pa.float64()),
            }
        )

    return _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def q_doc_top_token(sf_dir: str):
    """Per-document dominant token (most frequent lowercased
    whitespace token; ties -> lexicographically smallest, DuckDB's
    byte order == UTF-8 codepoint order).  Doc-local, so the whole
    operator is ONE streaming batch pass: flat-token counts group per
    (doc, token) in Arrow, one binary-order sort picks each doc's
    winner; tokenless docs emit NULL like the oracle's LEFT JOIN."""
    import numpy as np

    from rayslog.kernels import texthash as tx

    def fn(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        flat, offs = tx.tokens(txt, lower=True)
        counts = np.diff(offs)
        seg = np.repeat(
            t.column("doc_id").to_numpy(zero_copy_only=False), counts
        )
        g = (
            pa.table({"doc_id": pa.array(seg), "token": flat})
            .group_by(["doc_id", "token"])
            .aggregate([([], "count_all")])
            .rename_columns(["doc_id", "token", "n"])
            .sort_by(
                [
                    ("doc_id", "ascending"),
                    ("n", "descending"),
                    ("token", "ascending"),
                ]
            )
        )
        gd = g.column("doc_id").to_numpy(zero_copy_only=False)
        first = np.r_[True, gd[1:] != gd[:-1]]
        pick = pa.array(np.nonzero(first)[0])
        win = pa.table(
            {
                "doc_id": g.column("doc_id").take(pick),
                "top_token": g.column("token").take(pick),
                "n_occurrences": pc.cast(
                    g.column("n").take(pick), pa.int64()
                ),
            }
        )
        # LEFT-join semantics: docs with no tokens emit NULLs
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        wd = win.column("doc_id").to_numpy(zero_copy_only=False)
        missing = did[~np.isin(did, wd)]
        if len(missing):
            win = pa.concat_tables(
                [
                    win,
                    pa.table(
                        {
                            "doc_id": pa.array(missing, pa.int64()),
                            "top_token": pa.nulls(
                                len(missing), pa.string()
                            ),
                            "n_occurrences": pa.nulls(
                                len(missing), pa.int64()
                            ),
                        }
                    ),
                ]
            )
        return win

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=8_192
    )


def q_prefix_blocking_stats(sf_dir: str):
    """Blocking-quality audit for prefix dedup (the levenshtein_pairs
    blocking scheme, evaluated): group documents by their first-8-token
    lowercased prefix and report group count, multi-doc group count,
    total candidate pairs (sum s*(s-1)/2) and the largest group — the
    numbers that decide whether a blocking key is usable at scale.
    Per-prefix counts ride counts_by's cardinality-adaptive tree
    (prefixes are unbounded); the cross-prefix stats collapse through
    a second scalar tree."""
    import numpy as np

    from rayslog.kernels import texthash as tx
    from rayslog.stages.aggregate import counts_by, tree_reduce

    def prefixes(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        valid = pc.is_valid(txt)
        txt = txt.filter(valid)
        if not len(txt):
            return pa.table({"prefix": pa.array([], pa.string())})
        flat, offs = tx.tokens(txt, lower=True)
        counts = np.diff(offs)
        k = np.minimum(counts, 8)
        pos = np.arange(len(flat)) - np.repeat(offs[:-1], counts)
        keep = pos < 8
        offs8 = np.zeros(len(k) + 1, dtype=np.int64)
        np.cumsum(k, out=offs8[1:])
        lists = pa.ListArray.from_arrays(
            pa.array(offs8.astype(np.int32), pa.int32()),
            flat.filter(pa.array(keep)),
        )
        return pa.table(
            {"prefix": pc.binary_join(lists, pa.scalar(" ")).cast(pa.string())}
        )

    sizes = counts_by(
        _read(sf_dir, "documents", ["text"]).map_batches(
            prefixes, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=8_192,
        ),
        ["prefix"],
        alias="s",
        final="tree",
    )

    def partial(t: pa.Table) -> pa.Table:
        s = t.column("s").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "n_groups": pa.array([len(s)], pa.int64()),
                "n_multi_groups": pa.array(
                    [int((s > 1).sum())], pa.int64()
                ),
                "candidate_pairs": pa.array(
                    [int((s * (s - 1) // 2).sum())], pa.int64()
                ),
                "max_group": pa.array([int(s.max())], pa.int64()),
            }
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_groups": pa.array(
                    [int(pc.sum(t.column("n_groups")).as_py() or 0)],
                    pa.int64(),
                ),
                "n_multi_groups": pa.array(
                    [int(pc.sum(t.column("n_multi_groups")).as_py() or 0)],
                    pa.int64(),
                ),
                "candidate_pairs": pa.array(
                    [int(pc.sum(t.column("candidate_pairs")).as_py() or 0)],
                    pa.int64(),
                ),
                "max_group": pa.array(
                    [int(pc.max(t.column("max_group")).as_py() or 0)],
                    pa.int64(),
                ),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "n_groups": pa.array([0], pa.int64()),
                    "n_multi_groups": pa.array([0], pa.int64()),
                    "candidate_pairs": pa.array([0], pa.int64()),
                    "max_group": pa.array([0], pa.int64()),
                }
            )
        )

    return tree_reduce(
        sizes.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        reduce_fn,
        empty_fn=empty_fn,
    )


def q_conv_max_gap(sf_dir: str):
    """Per-conversation worst inter-turn latency on the north-rule
    table: the max parsed-timestamp gap (whole minutes, negatives
    clamp to 0) and an over-an-hour alert flag; single-ok-turn
    conversations emit NULLs like the oracle's max(NULL).  Same
    conv-hash exchange as turn_latency_hist, finished per conv."""
    import numpy as np

    from rayslog.sources.testgen import rows_for
    from rayslog.stages.aggregate import parsed_only, task_exchange
    from rayslog.stages.events import _user_codes, _user_hash

    n_rows = rows_for(sf_dir)
    parts = max(16, min(4096, -(-n_rows // 500_000)))
    MIN_US = np.int64(60_000_000)
    HOUR_US = np.int64(3_600_000_000)

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("ts_parsed")))
        h = _user_hash(t.column("conv_id"))
        return pa.table(
            {
                "conv_id": t.column("conv_id"),
                "turn_idx": t.column("turn_idx"),
                "ts_us": t.column("ts_parsed").cast(pa.int64()),
                "cpart": pa.array((h % np.uint64(parts)).astype(np.int32)),
            }
        )

    _empty = pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "max_gap_min": pa.array([], pa.int64()),
            "hour_gap": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        conv = t.column("conv_id")
        if isinstance(conv, pa.ChunkedArray):
            conv = conv.combine_chunks()
        codes = _user_codes(conv)
        ti = t.column("turn_idx").to_numpy(zero_copy_only=False)
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        order = np.lexsort((ti, codes))
        c, s = codes[order], ts[order]
        n_conv = int(codes.max()) + 1
        same = c[1:] == c[:-1]
        d = s[1:] - s[:-1]
        # per-conv max gap over within-conv deltas (clamped at 0)
        mx = np.full(n_conv, np.int64(-1))
        if same.any():
            dd = np.maximum(d[same], 0)
            np.maximum.at(mx, c[1:][same], dd)
        has = mx >= 0
        o = np.argsort(codes, kind="stable")
        firsts = o[np.searchsorted(codes[o], np.arange(n_conv))]
        gap_min = np.where(has, mx // MIN_US, 0)
        hour = np.where(has, (mx > HOUR_US).astype(np.int64), 0)
        return pa.table(
            {
                "conv_id": conv.take(pa.array(firsts)),
                "max_gap_min": pa.array(
                    gap_min.astype(np.int64), pa.int64(), mask=~has
                ),
                "hour_gap": pa.array(
                    hour, pa.int64(), mask=~has
                ),
            }
        )

    return task_exchange(
        parsed_only(parsed_dataset(sf_dir)).select_columns(
            ["conv_id", "turn_idx", "ts_parsed"]
        ),
        "cpart",
        parts,
        per_part,
        pre_fn=prep,
    )


def q_log_templates(sf_dir: str):
    """Log template mining over cleanly-parsed RFC3164 content — the
    classic log-analytics reduction (Drain/Spell-style, digit-masked):
    every run of digits becomes ``<N>``, templates count through the
    cardinality-adaptive tree, and the global top-20 (count desc,
    template asc — Arrow binary order == DuckDB VARCHAR order) merges
    through a second, re-applicable keep-top-k tree.  No sort-shuffle:
    raw content never leaves the parse task; only (template, n)
    partials travel."""
    from rayslog.stages.aggregate import counts_by, tree_reduce

    K = 20

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.equal(t.column("rfc"), 1),
            pc.is_null(t.column("parse_error")),
        )
        tpl = pc.replace_substring_regex(
            t.filter(keep).column("content"),
            pattern="[0-9]+",
            replacement="<N>",
        )
        return pa.table({"template": tpl})

    counts = counts_by(
        parsed_dataset(sf_dir).map_batches(
            prep, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["template"],
        alias="n",
        final="tree",
    )

    # top-20 by (n desc, template asc) is re-applicable on FINAL counts
    # (each template appears exactly once across the counts blocks)
    def topk(t: pa.Table) -> pa.Table:
        return (
            t.sort_by(
                [("n", "descending"), ("template", "ascending")]
            ).slice(0, K)
        )

    def final_fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "template": t.column("template"),
                "n": pc.cast(t.column("n"), pa.int64()),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "template": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        )

    return tree_reduce(counts, topk, empty_fn=empty_fn, final_fn=final_fn)


def q_procid_churn(sf_dir: str):
    """Process-restart audit on the north-rule table: per (hostname,
    app_name) over cleanly-parsed RFC5424 turns, the number of distinct
    proc_ids seen, total messages, and a multi-proc (restart) flag.
    Per-batch distinct (host, app, proc) triples with counts ride the
    adaptive tree (split on (host, app) keeps each pair's triples in
    one sub-tree so the per-pair finish is block-local)."""
    from rayslog.stages.aggregate import tree_reduce

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.equal(t.column("rfc"), 2),
            pc.is_null(t.column("parse_error")),
        )
        return (
            t.filter(keep)
            .select(["hostname", "app_name", "proc_id"])
            .group_by(["hostname", "app_name", "proc_id"])
            .aggregate([([], "count_all")])
            .rename_columns(["hostname", "app_name", "proc_id", "n"])
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["hostname", "app_name", "proc_id"])
            .aggregate([("n", "sum")])
            .rename_columns(["hostname", "app_name", "proc_id", "n"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "hostname": t.column("hostname"),
                    "app_name": t.column("app_name"),
                    "p": pc.cast(
                        pc.is_valid(t.column("proc_id")), pa.int64()
                    ),
                    "n": pc.cast(t.column("n"), pa.int64()),
                }
            )
            .group_by(["hostname", "app_name"])
            .aggregate([("p", "sum"), ("n", "sum")])
            .rename_columns(["hostname", "app_name", "n_procs", "n_msgs"])
        )
        return g.append_column(
            "multi_proc",
            pc.cast(pc.greater(g.column("n_procs"), 1), pa.int64()),
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "hostname": pa.array([], pa.string()),
                    "app_name": pa.array([], pa.string()),
                    "n_procs": pa.array([], pa.int64()),
                    "n_msgs": pa.array([], pa.int64()),
                    "multi_proc": pa.array([], pa.int64()),
                }
            )
        )

    return tree_reduce(
        parsed_dataset(sf_dir).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        reduce_fn,
        empty_fn=empty_fn,
        final_fn=final_fn,
        split_keys=["hostname", "app_name"],
    )


def q_conv_ffill_severity(sf_dir: str):
    """LAST_VALUE(... IGNORE NULLS) forward fill within an ordered
    partition: every transcript turn gets the most recent parsed
    severity in its conversation (unparseable turns inherit; turns
    before the first parse stay NULL).  One conv-hash exchange
    co-locates each conversation; the fill is vectorized (global
    maximum.accumulate over valid-row indices + a per-conv start guard
    so carries never cross a conversation boundary)."""
    import numpy as np

    from rayslog.sources.testgen import rows_for
    from rayslog.stages.aggregate import task_exchange
    from rayslog.stages.events import _user_codes, _user_hash, grouped_ffill

    n_rows = rows_for(sf_dir)
    parts = max(16, min(4096, -(-n_rows // 500_000)))

    def prep(t: pa.Table) -> pa.Table:
        h = _user_hash(t.column("conv_id"))
        return pa.table(
            {
                "conv_id": t.column("conv_id"),
                "turn_idx": t.column("turn_idx"),
                "severity": t.column("severity"),
                "cpart": pa.array((h % np.uint64(parts)).astype(np.int32)),
            }
        )

    _empty = pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "turn_idx": pa.array([], pa.int32()),
            "severity_filled": pa.array([], pa.int32()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        conv = t.column("conv_id")
        if isinstance(conv, pa.ChunkedArray):
            conv = conv.combine_chunks()
        codes = _user_codes(conv)
        ti = t.column("turn_idx").to_numpy(zero_copy_only=False)
        sev = t.column("severity")
        if isinstance(sev, pa.ChunkedArray):
            sev = sev.combine_chunks()
        valid = pc.is_valid(sev).to_numpy(zero_copy_only=False)
        svals = sev.fill_null(0).to_numpy(zero_copy_only=False)
        order, out, filled = grouped_ffill(codes, ti, valid, svals)
        pick = pa.array(order)
        return pa.table(
            {
                "conv_id": conv.take(pick),
                "turn_idx": t.column("turn_idx").take(pick),
                "severity_filled": pa.array(
                    out.astype(np.int32), pa.int32(), mask=~filled
                ),
            }
        )

    return task_exchange(
        parsed_dataset(sf_dir).select_columns(
            ["conv_id", "turn_idx", "severity"]
        ),
        "cpart",
        parts,
        per_part,
        pre_fn=prep,
    )


def q_maintenance_windows(sf_dir: str):
    """Range (interval) join against a small window dimension: event
    count and value sum per maintenance window — windows OVERLAP, so an
    event can land in several (a true range join, not a bucketing).
    The window table is a closure constant broadcast into every parse
    task (never re-shipped per batch); per-batch masks produce one
    fixed-spine partial row per window, summed through the combiner
    tree — empty windows keep their zero row like the oracle's LEFT
    JOIN.  Value sums travel in integer cents (order-independent)."""
    import numpy as np

    from rayslog.stages.aggregate import tree_reduce

    # (window_id, start, end) — literal UTC timestamps; w2 overlaps w1,
    # w5 nests inside w4, w6 is empty on the generated corpus
    WINDOWS = [
        (1, "2024-01-03T00:00:00", "2024-01-05T00:00:00"),
        (2, "2024-01-04T12:00:00", "2024-01-07T00:00:00"),
        (3, "2024-01-10T06:00:00", "2024-01-10T18:00:00"),
        (4, "2024-01-15T00:00:00", "2024-01-22T00:00:00"),
        (5, "2024-01-20T00:00:00", "2024-01-21T12:00:00"),
        (6, "2024-02-02T00:00:00", "2024-02-03T00:00:00"),
    ]
    wid = np.array([w[0] for w in WINDOWS], np.int64)
    ws = np.array([w[1] for w in WINDOWS], "datetime64[us]").astype(np.int64)
    we = np.array([w[2] for w in WINDOWS], "datetime64[us]").astype(np.int64)

    def partial(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        ts = ts.to_numpy(zero_copy_only=False)
        cents = (
            pc.cast(
                pc.round(pc.multiply(t.column("value"), pa.scalar(100.0))),
                pa.int64(),
            )
            .fill_null(0)
            .to_numpy(zero_copy_only=False)
        )
        n = np.empty(len(WINDOWS), np.int64)
        c = np.empty(len(WINDOWS), np.int64)
        for i in range(len(WINDOWS)):
            m = (ts >= ws[i]) & (ts < we[i])
            n[i] = int(np.count_nonzero(m))
            c[i] = int(cents[m].sum())
        return pa.table(
            {
                "window_id": pa.array(wid),
                "n_events": pa.array(n),
                "cents": pa.array(c),
            }
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["window_id"])
            .aggregate([("n_events", "sum"), ("cents", "sum")])
            .rename_columns(["window_id", "n_events", "cents"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        t = t.sort_by([("window_id", "ascending")])
        return pa.table(
            {
                "window_id": t.column("window_id"),
                "ts_start": pa.array(
                    ws[t.column("window_id").to_numpy() - 1],
                    pa.timestamp("us"),
                ),
                "ts_end": pa.array(
                    we[t.column("window_id").to_numpy() - 1],
                    pa.timestamp("us"),
                ),
                "n_events": pc.cast(t.column("n_events"), pa.int64()),
                "value_sum": pc.divide(
                    pc.cast(t.column("cents"), pa.float64()), 100.0
                ),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "window_id": pa.array(wid),
                    "ts_start": pa.array(ws, pa.timestamp("us")),
                    "ts_end": pa.array(we, pa.timestamp("us")),
                    "n_events": pa.array(np.zeros(len(wid), np.int64)),
                    "value_sum": pa.array(np.zeros(len(wid), np.float64)),
                }
            )
        )

    return tree_reduce(
        _read(sf_dir, "events", ["ts", "value"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        reduce_fn,
        empty_fn=empty_fn,
        final_fn=final_fn,
    )


def q_daily_autocorr(sf_dir: str):
    """Lag-1 autocorrelation of the daily event-count series — the
    aggregate-of-aggregates stability probe (is today's traffic
    predicted by yesterday's?).  Daily counts reduce through the
    combiner tree (bounded by the date range); the tiny day series
    sorts once on the final block and Pearson r over (c[t-1], c[t])
    pairs follows quantity_price_corr's overflow discipline: exact
    integer moments, every moment cast to double BEFORE the n*sxy
    arithmetic (CLAUDE.md invariant #4b), math.sqrt == DuckDB sqrt."""
    import math

    import numpy as np

    from rayslog.stages.aggregate import tree_reduce

    def partial(t: pa.Table) -> pa.Table:
        return (
            pa.table(
                {
                    "day": pc.floor_temporal(
                        t.column("ts").cast(pa.timestamp("us")), unit="day"
                    )
                }
            )
            .group_by(["day"])
            .aggregate([([], "count_all")])
            .rename_columns(["day", "c"])
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["day"])
            .aggregate([("c", "sum")])
            .rename_columns(["day", "c"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        t = t.sort_by([("day", "ascending")])
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        n_days = len(c)
        r = None
        n_pairs = n_days - 1 if n_days > 1 else 0
        if n_pairs > 0:
            x = [int(v) for v in c[:-1]]
            y = [int(v) for v in c[1:]]
            n = n_pairs
            sx, sy = sum(x), sum(y)
            sxy = sum(a * b for a, b in zip(x, y))
            sxx = sum(a * a for a in x)
            syy = sum(b * b for b in y)
            vx = float(n) * float(sxx) - float(sx) * float(sx)
            vy = float(n) * float(syy) - float(sy) * float(sy)
            if vx > 0 and vy > 0:
                r = (float(n) * float(sxy) - float(sx) * float(sy)) / (
                    math.sqrt(vx * vy)
                )
        return pa.table(
            {
                "n_days": pa.array([n_days], pa.int64()),
                "n_pairs": pa.array([n_pairs], pa.int64()),
                "autocorr_lag1": pa.array([r], pa.float64()),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "n_days": pa.array([0], pa.int64()),
                    "n_pairs": pa.array([0], pa.int64()),
                    "autocorr_lag1": pa.array([None], pa.float64()),
                }
            )
        )

    return tree_reduce(
        _read(sf_dir, "events", ["ts"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        reduce_fn,
        empty_fn=empty_fn,
        final_fn=final_fn,
    )


def q_sd_params(sf_dir: str):
    """RFC5424 STRUCTURED-DATA introspection: typed extraction of the
    corpus's ``[id@ver k="..." n="..."]`` params (RE2, identical
    pattern both sides) aggregated per keyword — message count, sum
    and max of the numeric param.  Extraction runs only on SD-bearing
    clean 5424 rows inside the parse task; (k, moments) partials ride
    the combiner tree (keyword vocab is bounded)."""
    from rayslog.stages.aggregate import tree_aggregate

    RE = (
        r'^\[(?P<sd>[^@ \]]+)@(?P<ver>\d+) k="(?P<k>[^"]*)"'
        r' n="(?P<n>\d+)"\]$'
    )

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(
                pc.equal(t.column("rfc"), 2),
                pc.is_null(t.column("parse_error")),
            ),
            pc.not_equal(t.column("structured_data"), "-"),
        )
        sd = t.filter(keep).column("structured_data")
        if isinstance(sd, pa.ChunkedArray):
            sd = sd.combine_chunks()
        m = pc.extract_regex(sd, RE)
        m = m.filter(pc.is_valid(m))
        k = pc.struct_field(m, "k")
        n = pc.cast(pc.struct_field(m, "n"), pa.int64())
        import numpy as np

        return (
            pa.table(
                {
                    "k": k,
                    "n_msgs": pa.array(np.ones(len(m), np.int64)),
                    "sum_n": n,
                    "max_n": n,
                }
            )
            .group_by(["k"])
            .aggregate([("n_msgs", "sum"), ("sum_n", "sum"), ("max_n", "max")])
            .rename_columns(["k", "n_msgs", "sum_n", "max_n"])
        )

    return tree_aggregate(
        parsed_dataset(sf_dir).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        keys=["k"],
        aggs=[("n_msgs", "sum"), ("sum_n", "sum"), ("max_n", "max")],
        out_names=["n_msgs", "sum_n", "max_n"],
    )


def q_wow_traffic(sf_dir: str):
    """Week-over-week traffic ratio: daily event counts joined to the
    SAME series shifted 7 CALENDAR days (a key-shifted self-join, not a
    row-offset LAG — gaps in the date spine stay honest).  Daily counts
    reduce through the combiner tree; the tiny day series resolves the
    shift with one searchsorted on the final block."""
    import numpy as np

    from rayslog.stages.aggregate import tree_reduce

    WEEK_US = np.int64(7) * np.int64(86_400) * np.int64(1_000_000)

    def partial(t: pa.Table) -> pa.Table:
        return (
            pa.table(
                {
                    "day": pc.floor_temporal(
                        t.column("ts").cast(pa.timestamp("us")), unit="day"
                    )
                }
            )
            .group_by(["day"])
            .aggregate([([], "count_all")])
            .rename_columns(["day", "n"])
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["day"])
            .aggregate([("n", "sum")])
            .rename_columns(["day", "n"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        t = t.sort_by([("day", "ascending")])
        d = t.column("day").cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        target = d - WEEK_US
        pos = np.searchsorted(d, target)
        pos_c = np.minimum(pos, len(d) - 1)
        hit = d[pos_c] == target
        prev = np.where(hit, n[pos_c], 0)
        ratio = np.where(
            hit & (prev > 0), n / np.where(prev > 0, prev, 1), np.nan
        )
        return pa.table(
            {
                "day": t.column("day"),
                "n": pa.array(n, pa.int64()),
                "n_prev_week": pa.array(prev, pa.int64(), mask=~hit),
                "wow_ratio": pa.array(
                    ratio, pa.float64(), mask=~(hit & (prev > 0))
                ),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "day": pa.array([], pa.timestamp("us")),
                    "n": pa.array([], pa.int64()),
                    "n_prev_week": pa.array([], pa.int64()),
                    "wow_ratio": pa.array([], pa.float64()),
                }
            )
        )

    return tree_reduce(
        _read(sf_dir, "events", ["ts"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        reduce_fn,
        empty_fn=empty_fn,
        final_fn=final_fn,
    )


def q_user_type_profile(sf_dir: str):
    """Set aggregation to string — per user, the sorted distinct set of
    high-value event types as ','-joined text (string_agg DISTINCT ...
    ORDER BY): batch-local distinct pairs cross one user-hash exchange,
    each part assembles ListArray offsets + binary_join (the
    conv_assemble machinery).  Arrow binary string order == DuckDB
    VARCHAR order, so the joined set is byte-identical."""
    import numpy as np

    from rayslog.stages.aggregate import task_exchange

    parts = _scaled_parts(_table_rows(sf_dir, "events"))
    MIN_VALUE = 80.0

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("value"), MIN_VALUE))
        g = (
            t.select(["user_id", "event_type"])
            .group_by(["user_id", "event_type"])
            .aggregate([])
        )
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        return g.append_column(
            "upart",
            pa.array((u.astype(np.uint64) % np.uint64(parts)).astype(np.int32)),
        )

    _empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "type_set": pa.array([], pa.string()),
            "n_types": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        t = (
            t.select(["user_id", "event_type"])
            .group_by(["user_id", "event_type"])
            .aggregate([])
            .sort_by(
                [("user_id", "ascending"), ("event_type", "ascending")]
            )
        )
        if not t.num_rows:
            return _empty
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        starts = np.r_[0, np.nonzero(u[1:] != u[:-1])[0] + 1]
        counts = np.diff(np.r_[starts, len(u)])
        offs = np.zeros(len(starts) + 1, dtype=np.int32)
        np.cumsum(counts, out=offs[1:])
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        lists = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), et)
        return pa.table(
            {
                "user_id": t.column("user_id").take(pa.array(starts)),
                "type_set": pc.binary_join(lists, pa.scalar(",")).cast(
                    pa.string()
                ),
                "n_types": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    return task_exchange(
        _read(sf_dir, "events", ["user_id", "event_type", "value"]),
        "upart",
        parts,
        per_part,
        pre_fn=prep,
    )


def q_time_weighted_value(sf_dir: str):
    """Globally-ordered time-weighted average of the event value step
    function (each event's value holds until the next event, whole
    seconds, floor): the ordered-fold-with-boundary-stitching pattern.

    (1) per-block (ts, event_id, cents) partials materialize once;
    (2) a tiny tree finds the global time range; (3) each block splits
    by TIME RANGE (equal timestamps can never straddle a range, so tie
    groups stay whole); (4) each range part sorts locally by
    (ts, event_id) and reduces exact integer (sum cents*dsec, sum dsec)
    plus its first/last boundary row; (5) the driver folds the P
    boundary rows in range order — the inter-part step is
    last_cents_p * dsec(last_p -> first_q).  Weighted sums stay exact:
    sum(cents*dsec) <= max_cents * span_sec regardless of row count.
    Final division in double (invariant #4b discipline)."""
    import numpy as np
    import ray
    import ray.data as rd

    from rayslog.stages.aggregate import live_block_refs, tree_reduce_refs

    range_parts = _scaled_parts(_table_rows(sf_dir, "events"))
    SEC_US = np.int64(1_000_000)

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("value")))
        return pa.table(
            {
                "us": t.column("ts").cast(pa.timestamp("us")).cast(pa.int64()),
                "event_id": t.column("event_id"),
                "cents": pc.cast(
                    pc.round(
                        pc.multiply(t.column("value"), pa.scalar(100.0))
                    ),
                    pa.int64(),
                ),
            }
        )

    mat = (
        _read(sf_dir, "events", ["ts", "event_id", "value"])
        .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )
    brefs = live_block_refs(mat)

    empty_out = pa.table(
        {
            "n_steps": pa.array([0], pa.int64()),
            "total_sec": pa.array([0], pa.int64()),
            "twa_value": pa.array([None], pa.float64()),
        }
    )
    if not brefs:
        return rd.from_arrow(empty_out)

    def minmax(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table(
                {"lo": pa.array([], pa.int64()), "hi": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "lo": pa.array([int(pc.min(t.column("us")).as_py())]),
                "hi": pa.array([int(pc.max(t.column("us")).as_py())]),
            }
        )

    def mm_reduce(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return t
        return pa.table(
            {
                "lo": pa.array([int(pc.min(t.column("lo")).as_py())]),
                "hi": pa.array([int(pc.max(t.column("hi")).as_py())]),
            }
        )

    @ray.remote
    def _mm(t):
        return minmax(t)

    mm = tree_reduce_refs([_mm.remote(r) for r in brefs], mm_reduce)
    if not mm.num_rows:
        return rd.from_arrow(empty_out)
    lo = int(mm.column("lo")[0].as_py())
    hi = int(mm.column("hi")[0].as_py())
    span = max(hi - lo + 1, 1)

    @ray.remote
    def split_ranges(t: pa.Table):
        tt = t.column("us").to_numpy(zero_copy_only=False)
        rp = ((tt - lo) * range_parts // span).astype(np.int64)
        out = []
        for i in range(range_parts):
            m = pa.array(rp == i)
            out.append(t.filter(m))
        return out

    split_refs = [
        split_ranges.options(num_returns=range_parts).remote(r)
        for r in brefs
    ]

    @ray.remote
    def fold_range(*pieces):
        t = pa.concat_tables(pieces)
        if not t.num_rows:
            return None
        us = t.column("us").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        cents = t.column("cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, us))
        s, c = us[order], cents[order]
        dsec = (s[1:] - s[:-1]) // SEC_US
        w_sum = int(np.dot(c[:-1], dsec)) if len(s) > 1 else 0
        d_sum = int(dsec.sum()) if len(s) > 1 else 0
        return (
            int(len(s)),
            w_sum,
            d_sum,
            int(s[0]),
            int(s[-1]),
            int(c[-1]),
        )

    folds = ray.get(
        [
            fold_range.remote(
                *[split_refs[b][i] for b in range(len(brefs))]
            )
            for i in range(range_parts)
        ]
    )
    folds = [f for f in folds if f is not None]
    if not folds:
        return rd.from_arrow(empty_out)
    n_rows = sum(f[0] for f in folds)
    w_sum = sum(f[1] for f in folds)
    d_sum = sum(f[2] for f in folds)
    # stitch consecutive non-empty parts: the step from part p's last
    # event carries its cents until part q's first event
    for p, q in zip(folds[:-1], folds[1:]):
        dsec = (q[3] - p[4]) // int(SEC_US)
        w_sum += p[5] * dsec
        d_sum += dsec
    twa = (float(w_sum) / float(d_sum)) / 100.0 if d_sum > 0 else None
    return rd.from_arrow(
        pa.table(
            {
                "n_steps": pa.array([max(n_rows - 1, 0)], pa.int64()),
                "total_sec": pa.array([d_sum], pa.int64()),
                "twa_value": pa.array([twa], pa.float64()),
            }
        )
    )


def q_value_gini(sf_dir: str):
    """Exact per-type Gini coefficient of the event value — the
    rank-weighted-sum identity G = (sum (2r-1)x - nS) / (nS) computed
    WITHOUT a global sort operator (stages/stats.grouped_gini: value-
    range exchange + local sorted folds + driver rank-offset stitch;
    tie-order invariant, exact int64 moments, oracle-mirrored double
    expression).  Cents scaling keeps the moments integral."""
    from rayslog.stages.stats import grouped_gini

    def prep_cents(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("value")))
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "c": pc.cast(
                    pc.round(
                        pc.multiply(t.column("value"), pa.scalar(100.0))
                    ),
                    pa.int64(),
                ),
            }
        )

    g = grouped_gini(
        _read(sf_dir, "events", ["event_type", "value"]).map_batches(
            prep_cents, batch_format="pyarrow", zero_copy_batch=True
        ),
        "event_type",
        "c",
        parts=_scaled_parts(_table_rows(sf_dir, "events")),
    )

    def finish(t: pa.Table) -> pa.Table:
        import numpy as np

        tot = t.column("total").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "n_events": t.column("n"),
                "sum_value": pa.array(
                    tot.astype(np.float64) / 100.0, pa.float64()
                ),
                "gini": t.column("gini"),
            }
        )

    return g.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def q_host_handoffs(sf_dir: str):
    """North-rule handoff graph: within each conversation, adjacent
    cleanly-parsed turns (turn_idx order) whose syslog hostname CHANGES
    — the Markov transition matrix of event_transitions re-expressed
    over the parser's output.  One conv-hash exchange (a conversation
    resolves whole in one part), a vectorized lexsort + shifted-compare
    pass per part, then a <= |hosts|^2-key combiner tree."""
    import numpy as np

    from rayslog.sources.testgen import rows_for
    from rayslog.stages.aggregate import task_exchange, tree_aggregate
    from rayslog.stages.events import _user_codes, _user_hash

    parts = _scaled_parts(rows_for(sf_dir))

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_null(t.column("parse_error"))).select(
            ["conv_id", "turn_idx", "hostname"]
        )
        h = _user_hash(t.column("conv_id"))
        return t.append_column(
            "cpart", pa.array((h % np.uint64(parts)).astype(np.int32))
        )

    _empty = pa.table(
        {
            "prev_host": pa.array([], pa.string()),
            "hostname": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        codes = _user_codes(t.column("conv_id"))
        ti = t.column("turn_idx").to_numpy(zero_copy_only=False)
        order = np.lexsort((ti, codes))
        c = codes[order]
        same = c[1:] == c[:-1]
        cur = order[1:][same]
        prv = order[:-1][same]
        host = t.column("hostname")
        if isinstance(host, pa.ChunkedArray):
            host = host.combine_chunks()
        pairs = pa.table(
            {
                "prev_host": host.take(pa.array(prv)),
                "hostname": host.take(pa.array(cur)),
            }
        )
        pairs = pairs.filter(
            pc.not_equal(pairs.column("prev_host"), pairs.column("hostname"))
        )
        return (
            pairs.group_by(["prev_host", "hostname"])
            .aggregate([([], "count_all")])
            .rename_columns(["prev_host", "hostname", "n"])
        )

    partials = task_exchange(
        parsed_dataset(sf_dir),
        "cpart",
        parts,
        per_part,
        pre_fn=prep,
    )
    return tree_aggregate(
        partials,
        keys=["prev_host", "hostname"],
        aggs=[("n", "sum")],
        out_names=["n"],
    )


def q_value_trend_by_type(sf_dir: str):
    """Per-type linear trend of DAILY TOTAL value (OLS slope/intercept
    of daily cents totals against days-since-first-day) — the drift
    monitor every metrics pipeline runs.  (type, day) cents totals
    reduce through the combiner tree (bounded by types x calendar);
    the tiny series computes exact integer moments per type on the
    final block, then the slope/intercept arithmetic runs in double
    with every BIGINT moment cast FIRST (invariant #4b), expression-
    for-expression the oracle's."""
    import numpy as np

    from rayslog.stages.aggregate import tree_reduce

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("value")))
        return (
            pa.table(
                {
                    "event_type": t.column("event_type"),
                    "day": pc.floor_temporal(
                        t.column("ts").cast(pa.timestamp("us")), unit="day"
                    ),
                    "cents": pc.cast(
                        pc.round(
                            pc.multiply(t.column("value"), pa.scalar(100.0))
                        ),
                        pa.int64(),
                    ),
                }
            )
            .group_by(["event_type", "day"])
            .aggregate([("cents", "sum")])
            .rename_columns(["event_type", "day", "cents"])
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["event_type", "day"])
            .aggregate([("cents", "sum")])
            .rename_columns(["event_type", "day", "cents"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "n_days": pa.array([], pa.int64()),
                    "slope_per_day": pa.array([], pa.float64()),
                    "intercept": pa.array([], pa.float64()),
                }
            )
        t = t.sort_by(
            [("event_type", "ascending"), ("day", "ascending")]
        )
        day0 = int(
            pc.min(t.column("day").cast(pa.int64())).as_py()
        ) // 86_400_000_000
        days = (
            t.column("day").cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
            - day0
        )
        cents = t.column("cents").to_numpy(zero_copy_only=False)
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        codes = pc.dictionary_encode(et).indices.to_numpy(
            zero_copy_only=False
        )
        change = np.r_[True, codes[1:] != codes[:-1]]
        starts = np.nonzero(change)[0]
        ends = np.r_[starts[1:], len(codes)]
        types, nd, slopes, intercepts = [], [], [], []
        for a, b in zip(starts, ends):
            d = [int(v) for v in days[a:b]]
            y = [int(v) for v in cents[a:b]]
            n = len(d)
            types.append(et[int(a)].as_py())
            nd.append(n)
            sd_, sy = sum(d), sum(y)
            sdy = sum(x * v for x, v in zip(d, y))
            sdd = sum(x * x for x in d)
            den = float(n) * float(sdd) - float(sd_) * float(sd_)
            if n >= 2 and den > 0:
                slope = (
                    float(n) * float(sdy) - float(sd_) * float(sy)
                ) / den
                inter = (float(sy) - slope * float(sd_)) / float(n)
                slopes.append(slope / 100.0)
                intercepts.append(inter / 100.0)
            else:
                slopes.append(None)
                intercepts.append(None)
        return pa.table(
            {
                "event_type": pa.array(types, pa.string()),
                "n_days": pa.array(nd, pa.int64()),
                "slope_per_day": pa.array(slopes, pa.float64()),
                "intercept": pa.array(intercepts, pa.float64()),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "n_days": pa.array([], pa.int64()),
                    "slope_per_day": pa.array([], pa.float64()),
                    "intercept": pa.array([], pa.float64()),
                }
            )
        )

    return tree_reduce(
        _read(sf_dir, "events", ["ts", "event_type", "value"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        reduce_fn,
        empty_fn=empty_fn,
        final_fn=final_fn,
    )


def q_type_dow_independence(sf_dir: str):
    """Independence audit of the event_type x day-of-week contingency
    table: observed counts, expected-under-independence counts and
    Pearson residuals (o - e)/sqrt(e) — the seasonality screen run
    before trusting any per-type daily metric.  Cell counts reduce
    exactly through the combiner tree (bounded |types| x 7 domain);
    marginals and the per-cell double arithmetic run on the final
    block, expression-for-expression the oracle's (hardware sqrt is
    correctly rounded, so np.sqrt == DuckDB sqrt)."""
    import numpy as np

    from rayslog.stages.aggregate import tree_reduce

    def partial(t: pa.Table) -> pa.Table:
        return (
            pa.table(
                {
                    "event_type": t.column("event_type"),
                    "dow": pc.day_of_week(
                        t.column("ts"), count_from_zero=True, week_start=7
                    ).cast(pa.int64()),
                }
            )
            .group_by(["event_type", "dow"])
            .aggregate([([], "count_all")])
            .rename_columns(["event_type", "dow", "n"])
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["event_type", "dow"])
            .aggregate([("n", "sum")])
            .rename_columns(["event_type", "dow", "n"])
        )

    _schema_empty = pa.table(
        {
            "event_type": pa.array([], pa.string()),
            "dow": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "expected": pa.array([], pa.float64()),
            "pearson_resid": pa.array([], pa.float64()),
        }
    )

    def final_fn(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _schema_empty
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = pc.dictionary_encode(et)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        dow = t.column("dow").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        rt = np.zeros(int(codes.max()) + 1, np.int64)
        np.add.at(rt, codes, n)
        ct = np.zeros(7, np.int64)
        np.add.at(ct, dow, n)
        tot = int(n.sum())
        rt_d = rt[codes].astype(np.float64)
        ct_d = ct[dow].astype(np.float64)
        e = rt_d * ct_d / float(tot)
        resid = (n.astype(np.float64) - e) / np.sqrt(e)
        return pa.table(
            {
                "event_type": et,
                "dow": t.column("dow"),
                "n": t.column("n"),
                "expected": pa.array(e, pa.float64()),
                "pearson_resid": pa.array(resid, pa.float64()),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(_schema_empty)

    return tree_reduce(
        _read(sf_dir, "events", ["ts", "event_type"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        reduce_fn,
        empty_fn=empty_fn,
        final_fn=final_fn,
    )


def q_basket_rules(sf_dir: str, minsup: int = 2):
    """Association rules over the order/part basket graph: for every
    unordered part pair co-purchased in >= ``minsup`` orders, its
    support, both direction confidences and the lift vs independence.
    Below the broadcast threshold (the common case — part catalogs are
    small next to facts) the plan is FUSED: the orderkey exchange
    emits pair partials AND per-part item-count partials as sentinel
    rows (part_b = -1) through the SAME pair-hash exchange, a raw
    split round separates them, the small item map broadcasts via
    ray.put and the ratios attach in raw tasks — one lineitem read,
    two exchanges, zero extra executor spins (the unfused plan's
    separate distinct_count_by pass measured 0.9s of its 1.7s).
    Above the threshold the unfused plan runs: distinct_count_by +
    two partitioned hash joins (scale-safe at any catalog size;
    RAYSLOG_BROADCAST_MAX_ROWS=1 A/Bs it).  N = |orders| is parquet
    metadata.  Raise ``minsup`` with corpus size — the rule table,
    not the machinery, is what grows."""
    import os

    import numpy as np
    import ray
    import ray.data as rd

    from rayslog.stages.aggregate import distinct_count_by, task_exchange
    from rayslog.stages.relational import hash_join

    parts = _scaled_parts(_table_rows(sf_dir, "lineitem"))
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    n_orders = _table_rows(sf_dir, "orders")
    thresh = int(os.environ.get("RAYSLOG_BROADCAST_MAX_ROWS", 4_000_000))
    fused = _table_rows(sf_dir, "part") <= thresh

    def li_partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(["l_orderkey", "l_partkey"])
            .group_by(["l_orderkey", "l_partkey"])
            .aggregate([])
        )
        u = g.column("l_orderkey").to_numpy(zero_copy_only=False)
        return g.append_column(
            "opart",
            pa.array(
                (u.astype(np.uint64) % np.uint64(parts)).astype(np.int32)
            ),
        )

    _pair_empty = pa.table(
        {
            "part_a": pa.array([], pa.int64()),
            "part_b": pa.array([], pa.int64()),
            "n_ab": pa.array([], pa.int64()),
            "ppart": pa.array([], pa.int32()),
        }
    )

    def _with_ppart(g2: pa.Table) -> pa.Table:
        a = g2.column("part_a").to_numpy(zero_copy_only=False)
        b = g2.column("part_b").to_numpy(zero_copy_only=False)
        mix = (
            a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            + b.astype(np.uint64)
        )
        return g2.append_column(
            "ppart", pa.array((mix % np.uint64(parts)).astype(np.int32))
        )

    def expand_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _pair_empty
        g = (
            t.select(["l_orderkey", "l_partkey"])
            .group_by(["l_orderkey", "l_partkey"])
            .aggregate([])
        )
        ok = g.column("l_orderkey").to_numpy(zero_copy_only=False)
        pk = g.column("l_partkey").to_numpy(zero_copy_only=False)
        pieces = []
        if fused:
            # item-count partials ride the pair exchange as sentinel
            # rows (part_b = -1; partkeys are non-negative): this
            # part's (ok, pk) pairs are globally distinct because an
            # orderkey lives wholly here
            ig = (
                pa.table({"part_a": g.column("l_partkey")})
                .group_by(["part_a"])
                .aggregate([([], "count_all")])
                .rename_columns(["part_a", "n_ab"])
            )
            pieces.append(
                _with_ppart(
                    ig.add_column(
                        1,
                        "part_b",
                        pa.array(
                            np.full(ig.num_rows, -1, np.int64)
                        ),
                    )
                )
            )
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        starts = np.r_[0, np.nonzero(ok[1:] != ok[:-1])[0] + 1]
        lens = np.diff(np.r_[starts, len(ok)])
        if (lens * (lens - 1) // 2).sum() > 0:
            reps = (
                np.repeat(lens, lens)
                - (np.arange(lens.sum()) - np.repeat(starts, lens))
                - 1
            )
            left_idx = np.repeat(np.arange(len(ok)), reps)
            seq = np.arange(reps.sum())
            right_idx = (
                seq - np.repeat(np.cumsum(reps) - reps, reps)
                + left_idx + 1
            )
            g2 = (
                pa.table(
                    {
                        "part_a": pa.array(pk[left_idx]),
                        "part_b": pa.array(pk[right_idx]),
                    }
                )
                .group_by(["part_a", "part_b"])
                .aggregate([([], "count_all")])
                .rename_columns(["part_a", "part_b", "n_ab"])
            )
            pieces.append(_with_ppart(g2))
        if not pieces:
            return _pair_empty
        return pa.concat_tables(pieces).combine_chunks()

    pair_partial_refs = task_exchange(
        li.map_batches(
            li_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        "opart",
        parts,
        expand_part,
        return_refs=True,
    )

    def count_part(t: pa.Table) -> pa.Table:
        g = (
            t.select(["part_a", "part_b", "n_ab"])
            .group_by(["part_a", "part_b"])
            .aggregate([("n_ab", "sum")])
            .rename_columns(["part_a", "part_b", "n_ab"])
        )
        keep = pc.or_(
            pc.less(g.column("part_b"), 0),
            pc.greater_equal(g.column("n_ab"), minsup),
        )
        return g.filter(keep)

    N_d = float(n_orders)

    def _ratios(t: pa.Table, na_i, nb_i) -> pa.Table:
        nab = t.column("n_ab").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        na = na_i.astype(np.float64)
        nb = nb_i.astype(np.float64)
        return pa.table(
            {
                "part_a": pc.cast(t.column("part_a"), pa.int64()),
                "part_b": pc.cast(t.column("part_b"), pa.int64()),
                "n_ab": pc.cast(t.column("n_ab"), pa.int64()),
                "n_a": pa.array(na_i.astype(np.int64), pa.int64()),
                "n_b": pa.array(nb_i.astype(np.int64), pa.int64()),
                "conf_ab": pa.array(nab / na, pa.float64()),
                "conf_ba": pa.array(nab / nb, pa.float64()),
                "lift": pa.array(
                    (nab * N_d) / (na * nb), pa.float64()
                ),
            }
        )

    _out_empty = pa.table(
        {
            "part_a": pa.array([], pa.int64()),
            "part_b": pa.array([], pa.int64()),
            "n_ab": pa.array([], pa.int64()),
            "n_a": pa.array([], pa.int64()),
            "n_b": pa.array([], pa.int64()),
            "conf_ab": pa.array([], pa.float64()),
            "conf_ba": pa.array([], pa.float64()),
            "lift": pa.array([], pa.float64()),
        }
    )

    if fused:
        mixed_refs = task_exchange(
            pair_partial_refs, "ppart", parts, count_part,
            return_refs=True,
        )

        @ray.remote(num_returns=2)
        def split_mixed(t: pa.Table):
            sen = pc.less(t.column("part_b"), 0)
            return (
                t.filter(pc.invert(sen)),
                t.filter(sen).select(["part_a", "n_ab"]),
            )

        outs = [split_mixed.remote(r) for r in mixed_refs]
        pair_refs = [a for a, _ in outs]
        items = pa.concat_tables(ray.get([b for _, b in outs]))
        if not items.num_rows:
            return rd.from_arrow(_out_empty)
        keys = items.column("part_a").to_numpy(zero_copy_only=False)
        vals = items.column("n_ab").to_numpy(zero_copy_only=False)
        order = np.argsort(keys)
        lookup_ref = ray.put((keys[order], vals[order]))

        @ray.remote
        def fin(t: pa.Table) -> pa.Table:
            if not t.num_rows:
                return _out_empty
            keys_s, vals_s = ray.get(lookup_ref)
            a = t.column("part_a").to_numpy(zero_copy_only=False)
            b = t.column("part_b").to_numpy(zero_copy_only=False)
            return _ratios(
                t,
                vals_s[np.searchsorted(keys_s, a)],
                vals_s[np.searchsorted(keys_s, b)],
            )

        out = ray.get([fin.remote(r) for r in pair_refs])
        non_empty = [t for t in out if t.num_rows] or [_out_empty]
        return rd.from_arrow(pa.concat_tables(non_empty))

    rules = task_exchange(
        pair_partial_refs, "ppart", parts, count_part
    )
    item_counts = distinct_count_by(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]),
        "l_partkey",
        "l_orderkey",
        alias="n_item",
    )

    def as_a(t: pa.Table) -> pa.Table:
        return t.rename_columns(["part_a", "n_a"])

    def as_b(t: pa.Table) -> pa.Table:
        return t.rename_columns(["part_b", "n_b"])

    j1 = hash_join(
        rules,
        item_counts.map_batches(
            as_a, batch_format="pyarrow", zero_copy_batch=True
        ),
        key="part_a",
    )
    j2 = hash_join(
        j1,
        item_counts.map_batches(
            as_b, batch_format="pyarrow", zero_copy_batch=True
        ),
        key="part_b",
    )

    def finish_join(t: pa.Table) -> pa.Table:
        return _ratios(
            t,
            t.column("n_a").to_numpy(zero_copy_only=False),
            t.column("n_b").to_numpy(zero_copy_only=False),
        )

    return j2.map_batches(
        finish_join, batch_format="pyarrow", zero_copy_batch=True
    )


def q_embedding_dim_range(sf_dir: str):
    """Per-dimension range audit of the embedding corpus: min/max/count
    for every vector slot — the feature-drift screen run before any
    quantization or index build.  Each batch reshapes the list column
    to a rectangular (n, d) float32 view and folds column-wise
    min/max (exact and order-free, unlike float sums); the 64-key
    partials ride the combiner tree.  float32 end-to-end — DuckDB
    min(FLOAT) stays FLOAT and a float64 round-trip would reprint."""
    import numpy as np

    from rayslog.stages.aggregate import tree_reduce

    def partial(t: pa.Table) -> pa.Table:
        emb = t.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        emb = emb.filter(pc.is_valid(emb))
        if not len(emb):
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "min_v": pa.array([], pa.float32()),
                    "max_v": pa.array([], pa.float32()),
                    "n": pa.array([], pa.int64()),
                }
            )
        lens = pc.list_value_length(emb).to_numpy(zero_copy_only=False)
        d = int(lens[0])
        if not (lens == d).all():
            raise ValueError("ragged embedding column")
        m = (
            pc.list_flatten(emb)
            .to_numpy(zero_copy_only=False)
            .astype(np.float32, copy=False)
            .reshape(len(emb), d)
        )
        return pa.table(
            {
                "dim": pa.array(np.arange(d, dtype=np.int64)),
                "min_v": pa.array(m.min(axis=0), pa.float32()),
                "max_v": pa.array(m.max(axis=0), pa.float32()),
                "n": pa.array(np.full(d, len(emb), np.int64)),
            }
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["dim"])
            .aggregate([("min_v", "min"), ("max_v", "max"), ("n", "sum")])
            .rename_columns(["dim", "min_v", "max_v", "n"])
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "min_v": pa.array([], pa.float32()),
                    "max_v": pa.array([], pa.float32()),
                    "n": pa.array([], pa.int64()),
                }
            )
        )

    return tree_reduce(
        _read(sf_dir, "embeddings", ["embedding"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        reduce_fn,
        empty_fn=empty_fn,
    )


def q_session_type_pairs(sf_dir: str):
    """Session-level co-occurrence: unordered event-type pairs seen in
    the same gap-session (30-min rule), counted over sessions — the
    basket expansion composed WITH sessionization.  One user-hash
    exchange (a user's timeline resolves whole in a part): vectorized
    lexsort -> gap flags -> running session ids -> distinct (session,
    type) -> the C(n,2) run expansion (n <= |types|) -> local pair
    counts; the <= |types|^2-key partials ride the combiner tree."""
    import numpy as np

    from rayslog.stages.aggregate import task_exchange, tree_aggregate
    from rayslog.stages.events import _user_codes

    parts = _scaled_parts(_table_rows(sf_dir, "events"))
    GAP_US = np.int64(1_800_000_000)

    def prep(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "ts_us": t.column("ts").cast(pa.timestamp("us")).cast(
                    pa.int64()
                ),
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
                "upart": pa.array(
                    (u.astype(np.uint64) % np.uint64(parts)).astype(np.int32)
                ),
            }
        )

    _empty = pa.table(
        {
            "type_a": pa.array([], pa.string()),
            "type_b": pa.array([], pa.string()),
            "n_sessions": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        codes = _user_codes(t.column("user_id"))
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        ev = t.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ev, ts, codes))
        c, s = codes[order], ts[order]
        new_s = np.r_[
            True, (c[1:] != c[:-1]) | (s[1:] - s[:-1] > GAP_US)
        ]
        sid = np.cumsum(new_s)
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        st = (
            pa.table(
                {
                    "sid": pa.array(sid),
                    "event_type": et.take(pa.array(order)),
                }
            )
            .group_by(["sid", "event_type"])
            .aggregate([])
            .sort_by(
                [("sid", "ascending"), ("event_type", "ascending")]
            )
        )
        g = st.column("sid").to_numpy(zero_copy_only=False)
        starts = np.r_[0, np.nonzero(g[1:] != g[:-1])[0] + 1]
        lens = np.diff(np.r_[starts, len(g)])
        if (lens * (lens - 1) // 2).sum() == 0:
            return _empty
        reps = (
            np.repeat(lens, lens)
            - (np.arange(lens.sum()) - np.repeat(starts, lens))
            - 1
        )
        left_idx = np.repeat(np.arange(len(g)), reps)
        seq = np.arange(reps.sum())
        right_idx = (
            seq - np.repeat(np.cumsum(reps) - reps, reps) + left_idx + 1
        )
        ty = st.column("event_type")
        if isinstance(ty, pa.ChunkedArray):
            ty = ty.combine_chunks()
        return (
            pa.table(
                {
                    "type_a": ty.take(pa.array(left_idx)),
                    "type_b": ty.take(pa.array(right_idx)),
                }
            )
            .group_by(["type_a", "type_b"])
            .aggregate([([], "count_all")])
            .rename_columns(["type_a", "type_b", "n_sessions"])
        )

    partials = task_exchange(
        _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"]),
        "upart",
        parts,
        per_part,
        pre_fn=prep,
    )
    return tree_aggregate(
        partials,
        keys=["type_a", "type_b"],
        aggs=[("n_sessions", "sum")],
        out_names=["n_sessions"],
    )


def q_token_gini_by_lang(sf_dir: str):
    """Token-mass inequality per language: exact Gini of per-doc
    whitespace token counts within each lang — the corpus-balance
    audit behind length-stratified sampling (a high Gini means a few
    giant docs own the lang's token budget).  Same sort-free
    grouped_gini machinery as value_gini; token counts are already
    integral so no cents scaling."""
    from rayslog.stages.stats import grouped_gini

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": t.column("lang"),
                "c": pc.cast(
                    pc.count_substring_regex(t.column("text"), r"\S+"),
                    pa.int64(),
                ),
            }
        )

    g = grouped_gini(
        _read(sf_dir, "documents", ["lang", "text"]).map_batches(
            prep, batch_format="pyarrow", zero_copy_batch=True
        ),
        "lang",
        "c",
        parts=_scaled_parts(_table_rows(sf_dir, "documents")),
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": t.column("lang"),
                "n_docs": t.column("n"),
                "sum_tokens": t.column("total"),
                "gini": t.column("gini"),
            }
        )

    return g.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def q_conv_tool_path(sf_dir: str):
    """Per-conversation tool journey: the '>'-joined sequence of
    DISTINCT tools in FIRST-USE order (empty-string rows are non-tool
    turns and drop) — the agent-behavior fingerprint mined before
    clustering trajectories.  One conv-hash exchange; per part the
    (conv, tool) first turns resolve with one Arrow group_by min, and
    each conversation's ordered run assembles via ListArray offsets +
    binary_join (the conv_assemble machinery).  Arrow's stable sort on
    (conv, first_turn) gives the exact string_agg ORDER BY order —
    first turns are unique within a conversation."""
    import numpy as np

    from rayslog.sources.testgen import rows_for
    from rayslog.stages.aggregate import task_exchange
    from rayslog.stages.events import _user_hash

    n_rows = rows_for(sf_dir)
    parts = max(16, min(4096, -(-n_rows // 500_000)))

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("tool"), ""))
        h = _user_hash(t.column("conv_id"))
        return pa.table(
            {
                "conv_id": t.column("conv_id"),
                "turn_idx": t.column("turn_idx"),
                "tool": t.column("tool"),
                "cpart": pa.array(
                    (h % np.uint64(parts)).astype(np.int32)
                ),
            }
        )

    _empty = pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "tool_path": pa.array([], pa.string()),
            "n_tools": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        f = (
            t.select(["conv_id", "tool", "turn_idx"])
            .group_by(["conv_id", "tool"])
            .aggregate([("turn_idx", "min")])
            .rename_columns(["conv_id", "tool", "first_turn"])
            .sort_by(
                [("conv_id", "ascending"), ("first_turn", "ascending")]
            )
        )
        if not f.num_rows:
            return _empty
        cv = f.column("conv_id")
        if isinstance(cv, pa.ChunkedArray):
            cv = cv.combine_chunks()
        codes = pc.dictionary_encode(cv).indices.to_numpy(
            zero_copy_only=False
        )
        starts = np.r_[0, np.nonzero(codes[1:] != codes[:-1])[0] + 1]
        counts = np.diff(np.r_[starts, len(codes)])
        offs = np.zeros(len(starts) + 1, dtype=np.int32)
        np.cumsum(counts, out=offs[1:])
        tool = f.column("tool")
        if isinstance(tool, pa.ChunkedArray):
            tool = tool.combine_chunks()
        lists = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), tool)
        return pa.table(
            {
                "conv_id": cv.take(pa.array(starts)),
                "tool_path": pc.binary_join(lists, pa.scalar(">")).cast(
                    pa.string()
                ),
                "n_tools": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    return task_exchange(
        read_transcripts(sf_dir, ["conv_id", "turn_idx", "tool"]),
        "cpart",
        parts,
        per_part,
        pre_fn=prep,
    )


def q_top_events_with_ties(sf_dir: str, k: int = 3):
    """Per-type top-k events WITH TIES (DENSE_RANK <= k): every row
    whose value is among the group's k largest DISTINCT values — the
    leaderboard semantics grouped_top_k (ROW_NUMBER) cannot express,
    because tie rows must all survive.  The keep rule is re-applicable
    (stages/stats.keep_dense_topk docstring), so qualifying rows ride
    the combiner tree; dense ranks attach once on the final block.
    Values pass through untouched — no float arithmetic to mirror.
    Planted-tie fuzz in tests/test_r5_session9.py (the driver corpus
    happens to be tie-free at the top ranks)."""
    import numpy as np

    from rayslog.stages.aggregate import tree_reduce
    from rayslog.stages.stats import grouped_dense_ranks, keep_dense_topk

    COLS = ["event_id", "event_type", "value"]

    def _keep(t: pa.Table) -> pa.Table:
        return keep_dense_topk(t, "event_type", "value", k, COLS)

    def partial(t: pa.Table) -> pa.Table:
        return _keep(t.filter(pc.is_valid(t.column("value"))))

    def final_fn(t: pa.Table) -> pa.Table:
        t, dr = grouped_dense_ranks(_keep(t), "event_type", "value")
        keep = dr <= k
        t = t.filter(pa.array(keep))
        return t.append_column(
            "rnk", pa.array(dr[keep].astype(np.int64), pa.int64())
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "event_type": pa.array([], pa.string()),
                    "value": pa.array([], pa.float64()),
                    "rnk": pa.array([], pa.int64()),
                }
            )
        )

    return tree_reduce(
        _read(sf_dir, "events", ["event_id", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        _keep,
        empty_fn=empty_fn,
        final_fn=final_fn,
    )


def q_embedding_argmax(sf_dir: str):
    """Per-vector dominant dimension: the FIRST argmax slot and its
    value — the quantization sanity probe (is one dimension eating the
    norm?).  Pure per-batch map over the rectangular (n, d) float32
    view; np.argmax's first-occurrence rule == DuckDB list_indexof on
    the identical float32 bits."""
    import numpy as np

    def fn(t: pa.Table) -> pa.Table:
        emb = t.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        valid = pc.is_valid(emb)
        vid = t.column("vec_id").filter(valid)
        emb = emb.filter(valid)
        if not len(emb):
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "max_v": pa.array([], pa.float32()),
                }
            )
        lens = pc.list_value_length(emb).to_numpy(zero_copy_only=False)
        d = int(lens[0])
        if not (lens == d).all():
            raise ValueError("ragged embedding column")
        m = (
            pc.list_flatten(emb)
            .to_numpy(zero_copy_only=False)
            .astype(np.float32, copy=False)
            .reshape(len(emb), d)
        )
        am = m.argmax(axis=1)
        return pa.table(
            {
                "vec_id": vid,
                "dim": pa.array(am.astype(np.int64), pa.int64()),
                "max_v": pa.array(
                    m[np.arange(len(am)), am], pa.float32()
                ),
            }
        )

    return _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def q_df_split_drift(sf_dir: str):
    """Train/holdout vocabulary-skew audit: per token, document
    frequency inside the deterministic 90% train split vs the 10%
    holdout (dataset_split's splitmix64 rule), plus the rate ratio —
    the leakage/shift screen run before trusting any held-out eval.
    Per batch the per-doc DISTINCT tokens (texthash.tokens + the
    doc_freq within-doc dedupe) explode once with the row's split
    flag; (token, df_train, df_rest) partials ride the
    cardinality-adaptive tree (vocab is an unbounded key —
    split_keys engages past the threshold); the two doc totals ride a
    scalar tree and the ratio attaches as closure constants."""
    import numpy as np

    from rayslog.kernels import texthash as tx
    from rayslog.stages.aggregate import tree_aggregate, tree_reduce
    from rayslog.stages.sample import rate_threshold, splitmix64

    t_val = rate_threshold(SPLIT_RATES[1])

    def _train_mask(ids: np.ndarray) -> np.ndarray:
        return splitmix64(ids.astype(np.uint64), SPLIT_SEED) >= np.uint64(
            t_val
        )

    _tok_empty = pa.table(
        {
            "token": pa.array([], pa.string()),
            "df_train": pa.array([], pa.int64()),
            "df_rest": pa.array([], pa.int64()),
        }
    )

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        train = _train_mask(ids)
        txt = t.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        flat, offs = tx.tokens(txt, lower=True)
        if len(flat) == 0:
            return _tok_empty
        h = tx.hash_utf8(flat, seed=0)
        seg = np.repeat(
            np.arange(len(offs) - 1, dtype=np.int64), np.diff(offs)
        )
        order = np.lexsort((h, seg))
        s, hh = seg[order], h[order]
        first = np.r_[True, (s[1:] != s[:-1]) | (hh[1:] != hh[:-1])]
        idx = np.asarray(order)[first]
        uniq = flat.take(pa.array(idx))
        tr = train[seg[idx]].astype(np.int64)
        return (
            pa.table(
                {
                    "token": uniq,
                    "df_train": pa.array(tr),
                    "df_rest": pa.array(np.int64(1) - tr),
                }
            )
            .group_by(["token"])
            .aggregate([("df_train", "sum"), ("df_rest", "sum")])
            .rename_columns(["token", "df_train", "df_rest"])
        )

    freqs = tree_aggregate(
        _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=8_192,
        ),
        keys=["token"],
        aggs=[("df_train", "sum"), ("df_rest", "sum")],
        out_names=["df_train", "df_rest"],
        split_keys=["token"],
    )

    def count_partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        ntr = int(_train_mask(ids).sum())
        return pa.table(
            {
                "n_train": pa.array([ntr], pa.int64()),
                "n_rest": pa.array([len(ids) - ntr], pa.int64()),
            }
        )

    def count_reduce(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_train": pa.array(
                    [int(pc.sum(t.column("n_train")).as_py() or 0)],
                    pa.int64(),
                ),
                "n_rest": pa.array(
                    [int(pc.sum(t.column("n_rest")).as_py() or 0)],
                    pa.int64(),
                ),
            }
        )

    totals = tree_reduce(
        _read(sf_dir, "documents", ["doc_id"]).map_batches(
            count_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        count_reduce,
    ).to_pandas()
    n_train = int(totals["n_train"].iloc[0]) if len(totals) else 0
    n_rest = int(totals["n_rest"].iloc[0]) if len(totals) else 0

    def finish(t: pa.Table) -> pa.Table:
        dft = t.column("df_train").to_numpy(zero_copy_only=False)
        dfr = t.column("df_rest").to_numpy(zero_copy_only=False)
        ok = (dfr > 0) & (n_train > 0)
        safe_r = np.where(dfr > 0, dfr, 1).astype(np.float64)
        ratio = (dft.astype(np.float64) / float(max(n_train, 1))) / (
            safe_r / float(max(n_rest, 1))
        )
        return pa.table(
            {
                "token": t.column("token"),
                "df_train": t.column("df_train"),
                "df_rest": t.column("df_rest"),
                "rate_ratio": pa.array(ratio, pa.float64(), mask=~ok),
            }
        )

    return freqs.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


def q_value_percent_rank_global(sf_dir: str):
    """GLOBAL PERCENT_RANK for every event — a row-level window over
    the WHOLE table computed without a global sort operator: (1)
    (event_id, value) partials materialize once; (2) rows exchange by
    VALUE RANGE (the monotone map sends equal values to one part, so
    tie groups never straddle a range and min-rank is locally
    decidable); (3) each range part sorts locally and returns its row
    count; (4) the driver prefix-sums counts into range offsets; (5) a
    second task round attaches rank = offset + local min-rank and
    pct = (rank-1)/(n-1) — DuckDB's exact expression (verified: its
    percent_rank is rank()-min-rank based).  The same two-round
    offsets discipline as shuffle_shards' global NTILE, generalized to
    per-row output."""
    import numpy as np
    import ray
    import ray.data as rd

    from rayslog.stages.aggregate import (
        live_block_refs,
        task_exchange,
        tree_reduce_refs,
    )

    R = _scaled_parts(_table_rows(sf_dir, "events"))

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("value")))
        return t.select(["event_id", "value"])

    mat = (
        _read(sf_dir, "events", ["event_id", "value"])
        .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )
    brefs = live_block_refs(mat)
    empty_out = pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "value": pa.array([], pa.float64()),
            "pct_rank": pa.array([], pa.float64()),
        }
    )
    if not brefs:
        return rd.from_arrow(empty_out)

    def minmax(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table(
                {
                    "lo": pa.array([], pa.float64()),
                    "hi": pa.array([], pa.float64()),
                }
            )
        col = "value" if "value" in t.column_names else "lo"
        if col == "value":
            return pa.table(
                {
                    "lo": pa.array(
                        [float(pc.min(t.column("value")).as_py())]
                    ),
                    "hi": pa.array(
                        [float(pc.max(t.column("value")).as_py())]
                    ),
                }
            )
        return pa.table(
            {
                "lo": pa.array([float(pc.min(t.column("lo")).as_py())]),
                "hi": pa.array([float(pc.max(t.column("hi")).as_py())]),
            }
        )

    @ray.remote
    def _mm(t):
        return minmax(t)

    mm = tree_reduce_refs([_mm.remote(r) for r in brefs], minmax)
    if not mm.num_rows:
        return rd.from_arrow(empty_out)
    lo = float(mm.column("lo")[0].as_py())
    hi = float(mm.column("hi")[0].as_py())
    span = max(hi - lo, 0.0)

    def pre(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        if span > 0.0:
            rp = np.clip(
                ((v - lo) * R / span).astype(np.int64), 0, R - 1
            ).astype(np.int32)
        else:
            rp = np.zeros(len(v), np.int32)
        return t.append_column("rpart", pa.array(rp))

    def sort_part(t: pa.Table) -> pa.Table:
        return t.sort_by([("value", "ascending")])

    part_refs = task_exchange(
        brefs, "rpart", R, sort_part, pre_fn=pre, return_refs=True
    )

    @ray.remote
    def _count(t: pa.Table) -> int:
        return t.num_rows

    counts = ray.get([_count.remote(r) for r in part_refs])
    n = int(sum(counts))
    if n == 0:
        return rd.from_arrow(empty_out)
    offs = np.r_[0, np.cumsum(counts)[:-1]]
    denom = float(n - 1) if n > 1 else 1.0

    @ray.remote
    def rank_part(t: pa.Table, off: int) -> pa.Table:
        if not t.num_rows:
            return empty_out
        v = t.column("value").to_numpy(zero_copy_only=False)
        idx = np.arange(len(v), dtype=np.int64)
        new_v = np.r_[True, v[1:] != v[:-1]]
        min_rank_local = np.maximum.accumulate(np.where(new_v, idx, 0))
        rank = min_rank_local + off + 1
        pct = (rank - 1).astype(np.float64) / denom
        if n <= 1:
            pct = np.zeros(len(v), np.float64)
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "value": t.column("value"),
                "pct_rank": pa.array(pct, pa.float64()),
            }
        )

    out = ray.get(
        [
            rank_part.remote(r, int(o))
            for r, o in zip(part_refs, offs)
        ]
    )
    non_empty = [t for t in out if t.num_rows] or out[:1]
    return rd.from_arrow(pa.concat_tables(non_empty))


def q_nation_customer_hhi(sf_dir: str):
    """Revenue concentration per nation: the Herfindahl-Hirschman index
    of customer spend shares plus the single largest share — the
    dependency-risk audit next to the Gini family.  Per-customer
    dollar totals resolve in one custkey exchange; the nationkey
    attaches via a partitioned hash join (scale-safe at any dim size);
    per-nation (n, S, sum d^2, max d) moments ride the bounded tree.
    DOLLAR-rounded spend keeps sum(d^2) under 2^63 at driver scales —
    a cents-squared moment would cross the HUGEINT->DOUBLE 1-ULP trap
    (invariant #4b); past ~1e18 dollar-squared mass, range-split the
    moments."""
    import numpy as np

    import pyarrow.parquet as pq

    from rayslog.stages.aggregate import task_exchange, tree_reduce
    from rayslog.stages.relational import hash_join

    parts = _scaled_parts(_table_rows(sf_dir, "orders"))

    def prep(t: pa.Table) -> pa.Table:
        u = t.column("o_custkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                # DuckDB round() is half-AWAY (Arrow's default is
                # half-to-even, and dollar rounding hits exact .50
                # boundaries — cents never do)
                "d": pc.cast(
                    pc.round(
                        t.column("o_totalprice"),
                        round_mode="half_towards_infinity",
                    ),
                    pa.int64(),
                ),
                "upart": pa.array(
                    (u.astype(np.uint64) % np.uint64(parts)).astype(np.int32)
                ),
            }
        )

    _empty = pa.table(
        {
            "o_custkey": pa.array([], pa.int64()),
            "d": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        return (
            t.select(["o_custkey", "d"])
            .group_by(["o_custkey"])
            .aggregate([("d", "sum")])
            .rename_columns(["o_custkey", "d"])
        )

    cust_spend = task_exchange(
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]),
        "upart",
        parts,
        per_part,
        pre_fn=prep,
    )

    def dim_prep(t: pa.Table) -> pa.Table:
        return t.rename_columns(["o_custkey", "c_nationkey"])

    joined = hash_join(
        cust_spend,
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
            dim_prep, batch_format="pyarrow", zero_copy_batch=True
        ),
        key="o_custkey",
    )

    def moments(t: pa.Table) -> pa.Table:
        d = t.column("d")
        return (
            pa.table(
                {
                    "c_nationkey": t.column("c_nationkey"),
                    "n_customers": pa.array(
                        np.ones(t.num_rows, np.int64)
                    ),
                    "s": d,
                    "ssq": pc.multiply(d, d),
                    "mx": d,
                }
            )
            .group_by(["c_nationkey"])
            .aggregate(
                [
                    ("n_customers", "sum"),
                    ("s", "sum"),
                    ("ssq", "sum"),
                    ("mx", "max"),
                ]
            )
            .rename_columns(
                ["c_nationkey", "n_customers", "s", "ssq", "mx"]
            )
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["c_nationkey"])
            .aggregate(
                [
                    ("n_customers", "sum"),
                    ("s", "sum"),
                    ("ssq", "sum"),
                    ("mx", "max"),
                ]
            )
            .rename_columns(
                ["c_nationkey", "n_customers", "s", "ssq", "mx"]
            )
        )

    names = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    name_of = dict(
        zip(
            names.column("n_nationkey").to_pylist(),
            names.column("n_name").to_pylist(),
        )
    )

    def final_fn(t: pa.Table) -> pa.Table:
        nk = t.column("c_nationkey").to_numpy(zero_copy_only=False)
        s = t.column("s").to_numpy(zero_copy_only=False)
        ssq = t.column("ssq").to_numpy(zero_copy_only=False)
        mx = t.column("mx").to_numpy(zero_copy_only=False)
        ok = s > 0
        s_d = s.astype(np.float64)
        hhi = np.where(ok, ssq.astype(np.float64) / (s_d * s_d), np.nan)
        top = np.where(ok, mx.astype(np.float64) / s_d, np.nan)
        return pa.table(
            {
                "n_name": pa.array(
                    [name_of.get(int(k)) for k in nk], pa.string()
                ),
                "n_customers": t.column("n_customers"),
                "revenue_dollars": t.column("s"),
                "hhi": pa.array(hhi, pa.float64(), mask=~ok),
                "top_share": pa.array(top, pa.float64(), mask=~ok),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "n_name": pa.array([], pa.string()),
                    "n_customers": pa.array([], pa.int64()),
                    "revenue_dollars": pa.array([], pa.int64()),
                    "hhi": pa.array([], pa.float64()),
                    "top_share": pa.array([], pa.float64()),
                }
            )
        )

    return tree_reduce(
        joined.map_batches(
            moments, batch_format="pyarrow", zero_copy_batch=True
        ),
        reduce_fn,
        empty_fn=empty_fn,
        final_fn=final_fn,
    )


def q_type_traffic_similarity(sf_dir: str):
    """Weighted-Jaccard similarity of every event-type PAIR's daily
    traffic profile — sum min(a_d, b_d) / sum max(a_d, b_d) over the
    shared calendar spine (absent days count 0) — the redundancy
    screen run before collapsing near-identical signals.  The bounded
    (type, day) count matrix rides the combiner tree; the pairwise
    min/max sums are exact int64 on the final dense block, the ratio
    mirrors the oracle's double expression."""
    import numpy as np

    from rayslog.stages.aggregate import tree_reduce

    def partial(t: pa.Table) -> pa.Table:
        return (
            pa.table(
                {
                    "event_type": t.column("event_type"),
                    "day": pc.floor_temporal(
                        t.column("ts").cast(pa.timestamp("us")), unit="day"
                    ),
                }
            )
            .group_by(["event_type", "day"])
            .aggregate([([], "count_all")])
            .rename_columns(["event_type", "day", "n"])
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["event_type", "day"])
            .aggregate([("n", "sum")])
            .rename_columns(["event_type", "day", "n"])
        )

    _schema_empty = pa.table(
        {
            "type_a": pa.array([], pa.string()),
            "type_b": pa.array([], pa.string()),
            "sum_min": pa.array([], pa.int64()),
            "sum_max": pa.array([], pa.int64()),
            "sim": pa.array([], pa.float64()),
        }
    )

    def final_fn(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _schema_empty
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        types = sorted(set(et.to_pylist()))
        days = sorted(
            set(t.column("day").cast(pa.int64()).to_pylist())
        )
        ti = {v: i for i, v in enumerate(types)}
        di = {v: i for i, v in enumerate(days)}
        m = np.zeros((len(types), len(days)), np.int64)
        dd = t.column("day").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        nn = t.column("n").to_numpy(zero_copy_only=False)
        for e, d, v in zip(et.to_pylist(), dd, nn):
            m[ti[e], di[int(d)]] = v
        rows_a, rows_b, smin, smax, sims = [], [], [], [], []
        for i in range(len(types)):
            for j in range(i + 1, len(types)):
                mn = int(np.minimum(m[i], m[j]).sum())
                mxs = int(np.maximum(m[i], m[j]).sum())
                rows_a.append(types[i])
                rows_b.append(types[j])
                smin.append(mn)
                smax.append(mxs)
                sims.append(
                    float(mn) / float(mxs) if mxs > 0 else None
                )
        return pa.table(
            {
                "type_a": pa.array(rows_a, pa.string()),
                "type_b": pa.array(rows_b, pa.string()),
                "sum_min": pa.array(smin, pa.int64()),
                "sum_max": pa.array(smax, pa.int64()),
                "sim": pa.array(sims, pa.float64()),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(_schema_empty)

    return tree_reduce(
        _read(sf_dir, "events", ["ts", "event_type"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        reduce_fn,
        empty_fn=empty_fn,
        final_fn=final_fn,
    )


def q_value_drift_ks(sf_dir: str):
    """EXACT two-sample Kolmogorov-Smirnov drift test between the
    first and second time-half of the event stream, over the value
    distribution — the deployment-drift gate, computed distributed
    with NO float CDFs: the sup runs over the integer cross-product
    |F1(v)*n2 - F2(v)*n1| (exact at any prefix), so only the final
    division is double.  Plan: one materialized (us, value) pass
    feeds (a) a scalar tree for the ts midpoint + value range, (b) a
    VALUE-RANGE exchange producing per-part (value, c1, c2) grouped
    counts, (c) per-part (n1_p, n2_p) totals prefix-summed on the
    driver into offsets, (d) a second task round taking each part's
    local sup given its offsets.  Equal values share a range part, so
    every global prefix boundary is visible to exactly one part.
    Integer sup needs f*n < 2^63 — past ~3e9 rows per sample, split
    the cross-product (same discipline as the Gini rsum bound)."""
    import numpy as np
    import ray
    import ray.data as rd

    from rayslog.stages.aggregate import (
        live_block_refs,
        task_exchange,
        tree_reduce_refs,
    )

    R = _scaled_parts(_table_rows(sf_dir, "events"))

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("value")))
        return pa.table(
            {
                "us": t.column("ts").cast(pa.timestamp("us")).cast(
                    pa.int64()
                ),
                "value": t.column("value"),
            }
        )

    mat = (
        _read(sf_dir, "events", ["ts", "value"])
        .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )
    brefs = live_block_refs(mat)
    empty_out = pa.table(
        {
            "n1": pa.array([0], pa.int64()),
            "n2": pa.array([0], pa.int64()),
            "ks": pa.array([None], pa.float64()),
        }
    )
    if not brefs:
        return rd.from_arrow(empty_out)

    def minmax(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table(
                {
                    "tlo": pa.array([], pa.int64()),
                    "thi": pa.array([], pa.int64()),
                    "vlo": pa.array([], pa.float64()),
                    "vhi": pa.array([], pa.float64()),
                }
            )
        if "us" in t.column_names:
            return pa.table(
                {
                    "tlo": pa.array([int(pc.min(t.column("us")).as_py())]),
                    "thi": pa.array([int(pc.max(t.column("us")).as_py())]),
                    "vlo": pa.array(
                        [float(pc.min(t.column("value")).as_py())]
                    ),
                    "vhi": pa.array(
                        [float(pc.max(t.column("value")).as_py())]
                    ),
                }
            )
        return pa.table(
            {
                "tlo": pa.array([int(pc.min(t.column("tlo")).as_py())]),
                "thi": pa.array([int(pc.max(t.column("thi")).as_py())]),
                "vlo": pa.array([float(pc.min(t.column("vlo")).as_py())]),
                "vhi": pa.array([float(pc.max(t.column("vhi")).as_py())]),
            }
        )

    @ray.remote
    def _mm(t):
        return minmax(t)

    mm = tree_reduce_refs([_mm.remote(r) for r in brefs], minmax)
    if not mm.num_rows:
        return rd.from_arrow(empty_out)
    mid = (
        int(mm.column("tlo")[0].as_py()) + int(mm.column("thi")[0].as_py())
    ) // 2
    vlo = float(mm.column("vlo")[0].as_py())
    vhi = float(mm.column("vhi")[0].as_py())
    vspan = max(vhi - vlo, 0.0)

    def pre(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        if vspan > 0.0:
            rp = np.clip(
                ((v - vlo) * R / vspan).astype(np.int64), 0, R - 1
            ).astype(np.int32)
        else:
            rp = np.zeros(len(v), np.int32)
        us = t.column("us").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "value": t.column("value"),
                "s1": pa.array(us <= mid),
                "rpart": pa.array(rp),
            }
        )

    def count_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table(
                {
                    "value": pa.array([], pa.float64()),
                    "c1": pa.array([], pa.int64()),
                    "c2": pa.array([], pa.int64()),
                }
            )
        s1 = t.column("s1").to_numpy(zero_copy_only=False)
        return (
            pa.table(
                {
                    "value": t.column("value"),
                    "c1": pa.array(s1.astype(np.int64)),
                    "c2": pa.array((~s1).astype(np.int64)),
                }
            )
            .group_by(["value"])
            .aggregate([("c1", "sum"), ("c2", "sum")])
            .rename_columns(["value", "c1", "c2"])
            .sort_by([("value", "ascending")])
        )

    part_refs = task_exchange(
        brefs, "rpart", R, count_part, pre_fn=pre, return_refs=True
    )

    @ray.remote(num_returns=2)
    def _totals(t: pa.Table):
        if not t.num_rows:
            return 0, 0
        return (
            int(pc.sum(t.column("c1")).as_py() or 0),
            int(pc.sum(t.column("c2")).as_py() or 0),
        )

    tot_refs = [_totals.remote(r) for r in part_refs]
    c1s = ray.get([a for a, _ in tot_refs])
    c2s = ray.get([b for _, b in tot_refs])
    n1, n2 = int(sum(c1s)), int(sum(c2s))
    if n1 == 0 or n2 == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "n1": pa.array([n1], pa.int64()),
                    "n2": pa.array([n2], pa.int64()),
                    "ks": pa.array([None], pa.float64()),
                }
            )
        )
    off1 = np.r_[0, np.cumsum(c1s)[:-1]]
    off2 = np.r_[0, np.cumsum(c2s)[:-1]]

    @ray.remote
    def sup_part(t: pa.Table, o1: int, o2: int) -> int:
        if not t.num_rows:
            return 0
        f1 = np.cumsum(
            t.column("c1").to_numpy(zero_copy_only=False)
        ) + np.int64(o1)
        f2 = np.cumsum(
            t.column("c2").to_numpy(zero_copy_only=False)
        ) + np.int64(o2)
        return int(np.abs(f1 * np.int64(n2) - f2 * np.int64(n1)).max())

    sups = ray.get(
        [
            sup_part.remote(r, int(a), int(b))
            for r, a, b in zip(part_refs, off1, off2)
        ]
    )
    mx = max(sups) if sups else 0
    ks = float(mx) / (float(n1) * float(n2))
    return rd.from_arrow(
        pa.table(
            {
                "n1": pa.array([n1], pa.int64()),
                "n2": pa.array([n2], pa.int64()),
                "ks": pa.array([ks], pa.float64()),
            }
        )
    )


def q_user_day_streaks(sf_dir: str):
    """Consecutive-activity-day streaks per user (gaps-and-islands on
    the DISTINCT-day calendar): longest streak, streak count, total
    active days — the engagement-loyalty profile.  Batch-local
    distinct (user, day) pairs cross one user-hash exchange; per part
    a single lexsort finds island starts ((user change) | (day gap !=
    1 day)) and np.add.reduceat-style run math yields all three stats
    with no per-user Python."""
    import numpy as np

    from rayslog.stages.aggregate import task_exchange

    parts = _scaled_parts(_table_rows(sf_dir, "events"))
    DAY_US = np.int64(86_400_000_000)

    def prep(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "user_id": t.column("user_id"),
                    "day_us": pc.floor_temporal(
                        t.column("ts").cast(pa.timestamp("us")), unit="day"
                    ).cast(pa.int64()),
                }
            )
            .group_by(["user_id", "day_us"])
            .aggregate([])
        )
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        return g.append_column(
            "upart",
            pa.array((u.astype(np.uint64) % np.uint64(parts)).astype(np.int32)),
        )

    _empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "max_streak_days": pa.array([], pa.int64()),
            "n_streaks": pa.array([], pa.int64()),
            "active_days": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        g = (
            t.select(["user_id", "day_us"])
            .group_by(["user_id", "day_us"])
            .aggregate([])
        )
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        d = g.column("day_us").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, u))
        u, d = u[order], d[order]
        new_streak = np.r_[
            True, (u[1:] != u[:-1]) | (d[1:] - d[:-1] != DAY_US)
        ]
        sid = np.cumsum(new_streak) - 1
        streak_len = np.bincount(sid)
        streak_user = u[new_streak]
        # per-user stats over the (streak_user, streak_len) pairs
        uu, inv = np.unique(streak_user, return_inverse=True)
        mx = np.zeros(len(uu), np.int64)
        np.maximum.at(mx, inv, streak_len)
        cnt = np.bincount(inv, minlength=len(uu)).astype(np.int64)
        tot = np.zeros(len(uu), np.int64)
        np.add.at(tot, inv, streak_len)
        return pa.table(
            {
                "user_id": pa.array(uu),
                "max_streak_days": pa.array(mx),
                "n_streaks": pa.array(cnt),
                "active_days": pa.array(tot),
            }
        )

    return task_exchange(
        _read(sf_dir, "events", ["user_id", "ts"]),
        "upart",
        parts,
        per_part,
        pre_fn=prep,
    )


def q_price_benford(sf_dir: str):
    """Benford first-digit screen on order totals — the fraud/synthetic
    -data smell test.  The leading digit extracts with EXACT integer
    math (vectorized repeated //10 on cents — a float log10 is 1 ULP
    from wrong at powers of ten); digit counts ride the 9-key tree;
    shares and the Benford expectation ln(1+1/d)/ln(10) attach on the
    final block with math.log (== DuckDB ln, CLAUDE invariant ULP
    note c)."""
    import math

    import numpy as np

    from rayslog.stages.aggregate import tree_aggregate

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("o_totalprice"), 0.0))
        c = (
            pc.cast(
                pc.round(
                    pc.multiply(t.column("o_totalprice"), pa.scalar(100.0))
                ),
                pa.int64(),
            )
            .to_numpy(zero_copy_only=False)
            .copy()
        )
        while (c >= 10).any():
            m = c >= 10
            c[m] //= 10
        return (
            pa.table(
                {
                    "digit": pa.array(c),
                    "n_orders": pa.array(np.ones(len(c), np.int64)),
                }
            )
            .group_by(["digit"])
            .aggregate([("n_orders", "sum")])
            .rename_columns(["digit", "n_orders"])
        )

    counts = tree_aggregate(
        _read(sf_dir, "orders", ["o_totalprice"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        keys=["digit"],
        aggs=[("n_orders", "sum")],
        out_names=["n_orders"],
    )

    def finish(t: pa.Table) -> pa.Table:
        d = t.column("digit").to_numpy(zero_copy_only=False)
        n = t.column("n_orders").to_numpy(zero_copy_only=False)
        # the 9-key table is ONE block (bounded domain), so the total
        # is exact here — and it counts the same filtered rows the
        # oracle's denominator does
        share = n.astype(np.float64) / float(int(n.sum()))
        exp = pa.array(
            [
                math.log(1.0 + 1.0 / float(int(x))) / math.log(10.0)
                for x in d
            ],
            pa.float64(),
        )
        return pa.table(
            {
                "digit": t.column("digit"),
                "n_orders": t.column("n_orders"),
                "share": pa.array(share, pa.float64()),
                "expected_share": exp,
            }
        )

    return counts.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


def q_value_collision_stats(sf_dir: str):
    """Exact-value collision audit: distinct values, the number of
    event PAIRS sharing a value (sum C(n,2) — the birthday-collision
    mass a dedup-by-value rule would conflate) and the hottest value's
    count.  Per-value counts flow through the cardinality-adaptive
    tree (values are an unbounded key; under the split the output is S
    disjoint key-range blocks, so the scalars collapse per BLOCK and
    merge through a second scalar tree — the turn_dup_stats
    discipline, never a cross-key final_fn)."""
    import numpy as np

    from rayslog.stages.aggregate import tree_reduce

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("value")))
        return (
            t.select(["value"])
            .group_by(["value"])
            .aggregate([([], "count_all")])
            .rename_columns(["value", "n"])
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["value"])
            .aggregate([("n", "sum")])
            .rename_columns(["value", "n"])
        )

    _scalar_empty = pa.table(
        {
            "n_distinct": pa.array([0], pa.int64()),
            "n_pairs": pa.array([0], pa.int64()),
            "max_count": pa.array([0], pa.int64()),
        }
    )

    def empty_values():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "value": pa.array([], pa.float64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        )

    per_value = tree_reduce(
        _read(sf_dir, "events", ["value"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        reduce_fn,
        empty_fn=empty_values,
        split_keys=["value"],
    )

    def collapse(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        if not len(n):
            return _scalar_empty
        return pa.table(
            {
                "n_distinct": pa.array([len(n)], pa.int64()),
                "n_pairs": pa.array(
                    [int((n * (n - 1) // 2).sum())], pa.int64()
                ),
                "max_count": pa.array([int(n.max())], pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_distinct": pa.array(
                    [int(pc.sum(t.column("n_distinct")).as_py() or 0)],
                    pa.int64(),
                ),
                "n_pairs": pa.array(
                    [int(pc.sum(t.column("n_pairs")).as_py() or 0)],
                    pa.int64(),
                ),
                "max_count": pa.array(
                    [int(pc.max(t.column("max_count")).as_py() or 0)],
                    pa.int64(),
                ),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(_scalar_empty)

    return tree_reduce(
        per_value.map_batches(
            collapse, batch_format="pyarrow", zero_copy_batch=True
        ),
        merge,
        empty_fn=empty_fn,
    )


def q_conv_reply_latency_by_role(sf_dir: str):
    """Reply-latency profile by role handoff: for every adjacent turn
    pair in a conversation, the (prev_role -> role) bucket's pair
    count, exact summed gap, worst gap and mean seconds — the
    assistant-responsiveness metric of an LLM-ops dashboard.  One
    conv-hash exchange; vectorized lexsort + shifted compare; the
    <= |roles|^2-key partials ride the combiner tree; the mean divides
    exact integer microseconds in double on the final block, mirroring
    the oracle expression."""
    import numpy as np

    from rayslog.sources.testgen import rows_for
    from rayslog.stages.aggregate import task_exchange, tree_reduce
    from rayslog.stages.events import _user_codes, _user_hash

    n_rows = rows_for(sf_dir)
    parts = max(16, min(4096, -(-n_rows // 500_000)))

    def prep(t: pa.Table) -> pa.Table:
        h = _user_hash(t.column("conv_id"))
        return pa.table(
            {
                "conv_id": t.column("conv_id"),
                "turn_idx": t.column("turn_idx"),
                "role": t.column("role"),
                "ts_us": t.column("ts").cast(pa.timestamp("us")).cast(
                    pa.int64()
                ),
                "cpart": pa.array(
                    (h % np.uint64(parts)).astype(np.int32)
                ),
            }
        )

    _empty = pa.table(
        {
            "prev_role": pa.array([], pa.string()),
            "role": pa.array([], pa.string()),
            "n_pairs": pa.array([], pa.int64()),
            "sum_gap_us": pa.array([], pa.int64()),
            "max_gap_us": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        codes = _user_codes(t.column("conv_id"))
        ti = t.column("turn_idx").to_numpy(zero_copy_only=False)
        order = np.lexsort((ti, codes))
        c = codes[order]
        us = t.column("ts_us").to_numpy(zero_copy_only=False)[order]
        same = c[1:] == c[:-1]
        gaps = (us[1:] - us[:-1])[same]
        cur = order[1:][same]
        prv = order[:-1][same]
        role = t.column("role")
        if isinstance(role, pa.ChunkedArray):
            role = role.combine_chunks()
        return (
            pa.table(
                {
                    "prev_role": role.take(pa.array(prv)),
                    "role": role.take(pa.array(cur)),
                    "n_pairs": pa.array(np.ones(len(gaps), np.int64)),
                    "sum_gap_us": pa.array(gaps),
                    "max_gap_us": pa.array(gaps),
                }
            )
            .group_by(["prev_role", "role"])
            .aggregate(
                [
                    ("n_pairs", "sum"),
                    ("sum_gap_us", "sum"),
                    ("max_gap_us", "max"),
                ]
            )
            .rename_columns(
                ["prev_role", "role", "n_pairs", "sum_gap_us", "max_gap_us"]
            )
        )

    partials = task_exchange(
        read_transcripts(sf_dir, ["conv_id", "turn_idx", "role", "ts"]),
        "cpart",
        parts,
        per_part,
        pre_fn=prep,
    )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["prev_role", "role"])
            .aggregate(
                [
                    ("n_pairs", "sum"),
                    ("sum_gap_us", "sum"),
                    ("max_gap_us", "max"),
                ]
            )
            .rename_columns(
                ["prev_role", "role", "n_pairs", "sum_gap_us", "max_gap_us"]
            )
        )

    def final_fn(t: pa.Table) -> pa.Table:
        n = t.column("n_pairs").to_numpy(zero_copy_only=False)
        s = t.column("sum_gap_us").to_numpy(zero_copy_only=False)
        mean = s.astype(np.float64) / n.astype(np.float64) / 1e6
        return t.append_column(
            "mean_gap_sec", pa.array(mean, pa.float64())
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            _empty.append_column(
                "mean_gap_sec", pa.array([], pa.float64())
            )
        )

    return tree_reduce(
        partials, reduce_fn, empty_fn=empty_fn, final_fn=final_fn
    )


def q_value_drift_wasserstein(sf_dir: str):
    """Exact Wasserstein-1 (earth-mover) distance between the first
    and second time-half value distributions — KS tells you drift
    EXISTS, W1 tells you how much mass moved how far.  The integral
    sum |F1 - F2| dv runs over the INTEGER product |f1*n2 - f2*n1| *
    (cents gap) — exact at every prefix, only the final division is
    double.  Same plan as value_drift_ks (scalar tree for midpoint +
    cents range, cents-range exchange of grouped counts, driver prefix
    offsets) plus the time_weighted_value boundary stitch: each part
    also reports its first/last cents, and the inter-part segment
    weights the part-end cumulative F across the seam.  num < 2^63
    needs n1*n2*max_cents_gap under ~9e18 — range-split past ~1e9 rows
    per sample."""
    import numpy as np
    import ray
    import ray.data as rd

    from rayslog.stages.aggregate import (
        live_block_refs,
        task_exchange,
        tree_reduce_refs,
    )

    R = _scaled_parts(_table_rows(sf_dir, "events"))

    def prep0(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("value")))
        return pa.table(
            {
                "us": t.column("ts").cast(pa.timestamp("us")).cast(
                    pa.int64()
                ),
                "c": pc.cast(
                    pc.round(
                        pc.multiply(t.column("value"), pa.scalar(100.0))
                    ),
                    pa.int64(),
                ),
            }
        )

    mat = (
        _read(sf_dir, "events", ["ts", "value"])
        .map_batches(prep0, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )
    brefs = live_block_refs(mat)
    empty_out = pa.table(
        {
            "n1": pa.array([0], pa.int64()),
            "n2": pa.array([0], pa.int64()),
            "w1": pa.array([None], pa.float64()),
        }
    )
    if not brefs:
        return rd.from_arrow(empty_out)

    def minmax(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table(
                {
                    "tlo": pa.array([], pa.int64()),
                    "thi": pa.array([], pa.int64()),
                    "clo": pa.array([], pa.int64()),
                    "chi": pa.array([], pa.int64()),
                }
            )
        if "us" in t.column_names:
            return pa.table(
                {
                    "tlo": pa.array([int(pc.min(t.column("us")).as_py())]),
                    "thi": pa.array([int(pc.max(t.column("us")).as_py())]),
                    "clo": pa.array([int(pc.min(t.column("c")).as_py())]),
                    "chi": pa.array([int(pc.max(t.column("c")).as_py())]),
                }
            )
        return pa.table(
            {
                "tlo": pa.array([int(pc.min(t.column("tlo")).as_py())]),
                "thi": pa.array([int(pc.max(t.column("thi")).as_py())]),
                "clo": pa.array([int(pc.min(t.column("clo")).as_py())]),
                "chi": pa.array([int(pc.max(t.column("chi")).as_py())]),
            }
        )

    @ray.remote
    def _mm(t):
        return minmax(t)

    mm = tree_reduce_refs([_mm.remote(r) for r in brefs], minmax)
    if not mm.num_rows:
        return rd.from_arrow(empty_out)
    mid = (
        int(mm.column("tlo")[0].as_py()) + int(mm.column("thi")[0].as_py())
    ) // 2
    clo = int(mm.column("clo")[0].as_py())
    chi = int(mm.column("chi")[0].as_py())
    span = max(chi - clo + 1, 1)

    def pre(t: pa.Table) -> pa.Table:
        c = t.column("c").to_numpy(zero_copy_only=False)
        us = t.column("us").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "c": t.column("c"),
                "s1": pa.array(us <= mid),
                "rpart": pa.array(
                    ((c - clo) * R // span).astype(np.int32)
                ),
            }
        )

    def count_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table(
                {
                    "c": pa.array([], pa.int64()),
                    "c1": pa.array([], pa.int64()),
                    "c2": pa.array([], pa.int64()),
                }
            )
        s1 = t.column("s1").to_numpy(zero_copy_only=False)
        return (
            pa.table(
                {
                    "c": t.column("c"),
                    "c1": pa.array(s1.astype(np.int64)),
                    "c2": pa.array((~s1).astype(np.int64)),
                }
            )
            .group_by(["c"])
            .aggregate([("c1", "sum"), ("c2", "sum")])
            .rename_columns(["c", "c1", "c2"])
            .sort_by([("c", "ascending")])
        )

    part_refs = task_exchange(
        brefs, "rpart", R, count_part, pre_fn=pre, return_refs=True
    )

    @ray.remote
    def _summ(t: pa.Table):
        if not t.num_rows:
            return (0, 0, None, None)
        return (
            int(pc.sum(t.column("c1")).as_py() or 0),
            int(pc.sum(t.column("c2")).as_py() or 0),
            int(t.column("c")[0].as_py()),
            int(t.column("c")[-1].as_py()),
        )

    summaries = ray.get([_summ.remote(r) for r in part_refs])
    n1 = int(sum(s[0] for s in summaries))
    n2 = int(sum(s[1] for s in summaries))
    if n1 == 0 or n2 == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "n1": pa.array([n1], pa.int64()),
                    "n2": pa.array([n2], pa.int64()),
                    "w1": pa.array([None], pa.float64()),
                }
            )
        )

    @ray.remote
    def num_part(t: pa.Table, o1: int, o2: int) -> int:
        if t.num_rows < 2:
            return 0
        c = t.column("c").to_numpy(zero_copy_only=False)
        f1 = np.cumsum(
            t.column("c1").to_numpy(zero_copy_only=False)
        ) + np.int64(o1)
        f2 = np.cumsum(
            t.column("c2").to_numpy(zero_copy_only=False)
        ) + np.int64(o2)
        return int(
            (
                np.abs(f1[:-1] * np.int64(n2) - f2[:-1] * np.int64(n1))
                * (c[1:] - c[:-1])
            ).sum()
        )

    o1 = o2 = 0
    num = 0
    tasks = []
    seams = []
    prev = None  # (end_f1, end_f2, last_c)
    for ref, (p1, p2, first_c, last_c) in zip(part_refs, summaries):
        if first_c is None:
            continue
        if prev is not None:
            ef1, ef2, lc = prev
            seams.append((ef1, ef2, first_c - lc))
        tasks.append(num_part.remote(ref, o1, o2))
        o1 += p1
        o2 += p2
        prev = (o1, o2, last_c)
    num = int(sum(ray.get(tasks))) if tasks else 0
    for ef1, ef2, gap in seams:
        num += abs(ef1 * n2 - ef2 * n1) * gap
    w1 = float(num) / (float(n1) * float(n2)) / 100.0
    return rd.from_arrow(
        pa.table(
            {
                "n1": pa.array([n1], pa.int64()),
                "n2": pa.array([n2], pa.int64()),
                "w1": pa.array([w1], pa.float64()),
            }
        )
    )


def q_value_mode(sf_dir: str):
    """Global exact mode of the value column (most frequent value;
    ties break to the SMALLEST value) plus its count — the
    complement of value_collision_stats' anonymous max_count.
    Per-value counts ride the cardinality-adaptive tree; each output
    block (a disjoint key range under the split) collapses to its
    local best row and the winners merge through a scalar tree with
    the same (count desc, value asc) rule — re-applicable because a
    range's winner can only be beaten by another range's winner."""
    import numpy as np

    from rayslog.stages.aggregate import tree_reduce

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("value")))
        return (
            t.select(["value"])
            .group_by(["value"])
            .aggregate([([], "count_all")])
            .rename_columns(["value", "n"])
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["value"])
            .aggregate([("n", "sum")])
            .rename_columns(["value", "n"])
        )

    def empty_values():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "value": pa.array([], pa.float64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        )

    per_value = tree_reduce(
        _read(sf_dir, "events", ["value"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        reduce_fn,
        empty_fn=empty_values,
        split_keys=["value"],
    )

    _empty = pa.table(
        {
            "mode_value": pa.array([], pa.float64()),
            "n": pa.array([], pa.int64()),
        }
    )

    def best(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        cols = (
            ["mode_value", "n"]
            if "mode_value" in t.column_names
            else ["value", "n"]
        )
        t = t.select(cols).rename_columns(["mode_value", "n"])
        t = t.sort_by(
            [("n", "descending"), ("mode_value", "ascending")]
        )
        return t.slice(0, 1)

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(_empty)

    return tree_reduce(
        per_value.map_batches(
            best, batch_format="pyarrow", zero_copy_batch=True
        ),
        best,
        empty_fn=empty_fn,
    )


_LAKE_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def q_null_profile(sf_dir: str):
    """Whole-lake null audit: for EVERY column of EVERY table, the row
    and null counts — the first query run against an unfamiliar
    warehouse.  Column lists derive from parquet metadata on BOTH
    sides (the oracle generates its UNION ALL from the same files), so
    the audit needs no hand-maintained schema.  Plan: ONE raw Ray task
    per parquet file, all tables in flight together — per file the
    null counts come free from Arrow validity bitmaps, and the
    51-key concat group-sums on the driver.  A Dataset pipeline per
    table costs a ~0.4s executor spin x 10 sequential tables
    (measured 4.3s) and Ray's union() defeats stage fusion (measured
    7.7s); the per-file task shape is also the resumable unit a
    multi-file 100 TB lake needs.  The deliberately unpruned
    full-width read is the point of the query."""
    import glob
    import os

    import numpy as np
    import ray
    import ray.data as rd

    @ray.remote
    def audit_file(tbl: str, path: str) -> pa.Table:
        import pyarrow.parquet as pq

        t = pq.read_table(path)
        names, nulls = [], []
        for c in t.column_names:
            names.append(c)
            nulls.append(int(t.column(c).null_count))
        return pa.table(
            {
                "table_name": pa.array([tbl] * len(names), pa.string()),
                "column_name": pa.array(names, pa.string()),
                "n_rows": pa.array(
                    np.full(len(names), t.num_rows, np.int64)
                ),
                "n_null": pa.array(np.asarray(nulls, np.int64)),
            }
        )

    refs = []
    for tbl in _LAKE_TABLES:
        root = f"{sf_dir}/{tbl}.parquet"
        files = (
            sorted(glob.glob(os.path.join(root, "**", "*.parquet"),
                             recursive=True))
            if os.path.isdir(root)
            else [root]
        )
        refs.extend(audit_file.remote(tbl, f) for f in files)
    merged = (
        pa.concat_tables(ray.get(refs))
        .group_by(["table_name", "column_name"])
        .aggregate([("n_rows", "sum"), ("n_null", "sum")])
        .rename_columns(["table_name", "column_name", "n_rows", "n_null"])
    )
    return rd.from_arrow(merged)
