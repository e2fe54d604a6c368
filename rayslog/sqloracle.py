"""DuckDB oracle SQL for the driver's side-by-side correctness check.

Each SQL string recomputes a pipeline's result independently of the
engine, over the SAME generated transcripts parquet (the generator
guarantees every row is either canonical — parseable by these regexes
with in-range fields — or a catalog edge row the classifier below maps
to its exact reference error string; see sources/testgen.py).

Patterns are the capture-group versions of the engine's fast-path shape
validators (kernels/vectorized.py); DuckDB and Arrow both use RE2, so
the semantics transfer verbatim.
"""

from __future__ import annotations

from rayslog.sources.testgen import EDGE_CATALOG, transcripts_path

_MONTHS = "Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec"

P3 = (
    r"^<(\d{1,3})>( ?)(" + _MONTHS + r") ((?:\d\d)|(?: \d)) "
    r"(\d\d):(\d\d):(\d\d) ([^ ]+) "
    r"([^ \[\]:]{1,32})((?:[\[\]:][^ ]*)?)((?s:.*))$"
)
P3_NAMES = "['pri','lsp','mon','day','hh','mi','ss','host','tag','junk','rest']"

P5 = (
    r"^<(\d{1,3})>(\d) "
    r"(-|(\d{4})-(\d\d)-(\d\d)T(\d\d):(\d\d):(\d\d)(?:\.(\d{1,6}))?(Z|[+-]\d\d:\d\d)) "
    r"([^ ]+) ([^ ]{1,47}) ([^ ]{1,127}) ([^ ]{1,31}) "
    r"(-|\[(?s:.)*?\])(?:\x20((?s:.*)))?$"
)
P5_NAMES = (
    "['pri','ver','ts','yy','mo','dd','hh','mi','ss','frac','tz',"
    "'host','app','proc','msgid','sd','msg']"
)

D3 = r"^[^>]{0,8}>[^0-9]"
D5 = r"^[^>]{0,8}>[0-9]"
DU = r"^[^>]{9}>"
DQ = r"^[^>]{10}"

# cumulative day-of-year offsets for the pinned default_year 2025
# (non-leap) — Feb-29 inputs normalize to Mar 1 exactly like Go
# time.Date (rfc3164.go:331-346 year substitution + normalization).
_CUM_DAYS = [0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334]


def _base_cte(path: str) -> str:
    cum = " ".join(
        f"WHEN {i + 1} THEN {v}" for i, v in enumerate(_CUM_DAYS)
    )
    return f"""
WITH t AS (
  SELECT conv_id, turn_idx, role, tool, text FROM read_parquet('{path}/*.parquet')
),
g3 AS (
  SELECT *, regexp_extract(text, '{P3}', {P3_NAMES}) AS m
  FROM t WHERE regexp_matches(text, '{D3}') AND regexp_matches(text, '{P3}')
),
p3 AS (
  SELECT conv_id, turn_idx, role, tool,
    CAST(m.pri AS INTEGER) AS priority,
    (strpos('JanFebMarAprMayJunJulAugSepOctNovDec', m.mon) + 2) // 3 AS mon_num,
    CAST(trim(m.day) AS INTEGER) AS day_num,
    CAST(m.hh AS INTEGER) AS hh, CAST(m.mi AS INTEGER) AS mi,
    CAST(m.ss AS INTEGER) AS ss,
    m.host AS hostname, m.tag AS tag, trim(m.rest, ' ') AS content,
    length(m.tag) + length(m.junk) AS tagspan
  FROM g3
),
ok3 AS (
  SELECT conv_id, turn_idx, role, tool, priority,
    priority // 8 AS facility, priority % 8 AS severity,
    TIMESTAMP '2025-01-01'
      + to_days(CASE mon_num {cum} END + day_num - 1)
      + to_hours(hh) + to_minutes(mi) + to_seconds(ss) AS ts_parsed,
    hostname, tag, content
  FROM p3
  WHERE day_num >= 1
    AND day_num <= CASE mon_num WHEN 2 THEN 29 WHEN 4 THEN 30 WHEN 6 THEN 30
                                WHEN 9 THEN 30 WHEN 11 THEN 30 ELSE 31 END
    AND hh <= 23 AND mi <= 59 AND ss <= 59 AND tagspan <= 32
),
g5 AS (
  SELECT *, regexp_extract(text, '{P5}', {P5_NAMES}) AS m
  FROM t WHERE regexp_matches(text, '{D5}') AND regexp_matches(text, '{P5}')
),
p5 AS (
  SELECT conv_id, turn_idx, role, tool,
    CAST(m.pri AS INTEGER) AS priority, CAST(m.ver AS INTEGER) AS version,
    m.ts = '-' AS ts_nil,
    TRY_CAST(m.yy AS INTEGER) AS yy, TRY_CAST(m.mo AS INTEGER) AS mo,
    TRY_CAST(m.dd AS INTEGER) AS dd, TRY_CAST(m.hh AS INTEGER) AS hh,
    TRY_CAST(m.mi AS INTEGER) AS mi, TRY_CAST(m.ss AS INTEGER) AS ss,
    CASE WHEN m.frac = '' THEN 0
         ELSE CAST(rpad(m.frac, 6, '0') AS BIGINT) END AS frac_us,
    CASE WHEN m.tz = 'Z' THEN 0
         ELSE (CASE WHEN substr(m.tz, 1, 1) = '+' THEN 1 ELSE -1 END)
              * (TRY_CAST(substr(m.tz, 2, 2) AS INTEGER) * 60
                 + TRY_CAST(substr(m.tz, 5, 2) AS INTEGER)) END AS off_min,
    CASE WHEN m.tz = 'Z' THEN 0 ELSE TRY_CAST(substr(m.tz, 2, 2) AS INTEGER) END AS tzh,
    CASE WHEN m.tz = 'Z' THEN 0 ELSE TRY_CAST(substr(m.tz, 5, 2) AS INTEGER) END AS tzm,
    m.host AS hostname, m.app AS app_name, m.proc AS proc_id,
    m.msgid AS msg_id, m.sd AS structured_data,
    trim(coalesce(m.msg, ''), ' ') AS message
  FROM g5
),
ok5 AS (
  SELECT conv_id, turn_idx, role, tool, priority,
    priority // 8 AS facility, priority % 8 AS severity, version,
    CASE WHEN ts_nil THEN NULL
         ELSE make_timestamp(yy, mo, dd, hh, mi, ss)
              + to_microseconds(frac_us) - to_minutes(off_min) END AS ts_parsed,
    CASE WHEN ts_nil THEN NULL
         ELSE CAST(off_min AS SMALLINT) END AS tz_offset_minutes,
    hostname, app_name, proc_id, msg_id, structured_data, message
  FROM p5
  WHERE ts_nil OR (mo BETWEEN 1 AND 12 AND dd BETWEEN 1 AND 31
                   AND hh <= 23 AND mi <= 59 AND ss <= 59
                   AND tzh <= 23 AND tzm <= 59)
),
allok AS (
  SELECT conv_id, turn_idx, role, tool, priority, facility, severity,
         ts_parsed, hostname, CAST(1 AS TINYINT) AS rfc FROM ok3
  UNION ALL
  SELECT conv_id, turn_idx, role, tool, priority, facility, severity,
         ts_parsed, hostname, CAST(2 AS TINYINT) AS rfc FROM ok5
)
"""


def _literal_error_arms() -> str:
    """CASE arms for catalog rows the pattern classifier cannot reach
    (structural failures past the priority stage)."""
    covered_errors = {
        "Timestamp format unknown",
        "Invalid month in timestamp",
        "Invalid day in timestamp",
        "No start char found for priority",
        "Priority field too short",
        "Priority field too long",
        "Non digit found in priority",
        "Can not find version",
        "index out of range",
    }
    arms = []
    for text, err in EDGE_CATALOG:
        # needed when the error class has no pattern arm (field caps, SD)
        # or when a 'Timestamp format unknown' row fails the structural
        # regex (ns-frac) so the generic 5424 arm cannot reach it; extra
        # arms for pattern-covered rows are unreachable and harmless.
        if err not in covered_errors or err == "Timestamp format unknown":
            esc = text.replace("'", "''")
            arms.append(f"WHEN text = '{esc}' THEN '{err}'")
    return "\n    ".join(arms)


#: TOKEN_RE kept in sync with rayslog.stages.text.TOKEN_RE
_TOKEN_RE_SQL = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
# redact_pii patterns — imported from the stage so engine and oracle
# can never drift (the SQL embeds them verbatim; both are RE2)
from rayslog.stages.text import IPV4_RE as _IPV4_RE_SQL  # noqa: E402
from rayslog.stages.text import PID_RE as _PID_RE_SQL  # noqa: E402


def _jaccard_sql(threshold: float, cap: str) -> str:
    """Exact all-pairs 3-token-shingle Jaccard over ``documents``
    (optionally capped to the smallest doc_ids), mirroring
    dedup.ngram_jaccard's shingle rules."""
    return rf"""
WITH capped AS (SELECT doc_id, text FROM documents {cap}),
tok AS (SELECT doc_id, regexp_extract_all(lower(coalesce(text,'')), '\S+')
          AS toks FROM capped),
sh AS (SELECT doc_id,
    CASE WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[])
         WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
         ELSE list_transform(range(1, len(toks)-1),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
    END AS sh FROM tok),
d AS (SELECT doc_id, list_distinct(sh) AS sh FROM sh),
j AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
    CASE WHEN len(a.sh)=0 AND len(b.sh)=0 THEN 1.0
         ELSE round(CAST(len(list_intersect(a.sh,b.sh)) AS DOUBLE)
              / (len(a.sh)+len(b.sh)-len(list_intersect(a.sh,b.sh))), 6)
    END AS jaccard
  FROM d a JOIN d b ON a.doc_id < b.doc_id)
SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= {threshold}
"""


def _stratified_sample_sql() -> str:
    """Oracle for q_stratified_sample — rates/seed/hash literals shared
    with the Ray query via rayslog.stages.sample + pipeline constants."""
    from rayslog.pipeline import (
        SAMPLE_DEFAULT_RATE,
        SAMPLE_RATES,
        SAMPLE_SEED,
    )
    from rayslog.stages.sample import stratified_sample_sql

    return stratified_sample_sql(
        "documents",
        ["doc_id", "lang", "source"],
        strata_col="lang",
        rates=SAMPLE_RATES,
        default_rate=SAMPLE_DEFAULT_RATE,
        seed=SAMPLE_SEED,
    )


def _sample_k_sql() -> str:
    """Oracle for q_sample_k_per_lang — k/seed literals shared with the
    pipeline; the hash expression is the bit-verified splitmix64 SQL
    form, compared as UBIGINT exactly like the engine's uint64."""
    from rayslog.pipeline import SAMPLE_K, SAMPLE_K_SEED
    from rayslog.stages.sample import sample_sql_hash_expr

    h = sample_sql_hash_expr("doc_id", SAMPLE_K_SEED)
    return f"""
SELECT doc_id, lang, rank FROM (
  SELECT doc_id, lang,
    CAST(row_number() OVER
      (PARTITION BY lang ORDER BY {h} ASC, doc_id) AS BIGINT) AS rank
  FROM documents) WHERE rank <= {SAMPLE_K}
"""


def _domain_mix_sql() -> str:
    """Oracle for q_domain_mix — target/fraction/seed literals shared
    with the pipeline; the SQL recomputes counts and rates itself."""
    from rayslog.pipeline import MIX_FRACTION, MIX_SEED, MIX_TARGET
    from rayslog.stages.sample import domain_mix_sql

    return domain_mix_sql(
        "documents",
        ["doc_id", "lang", "source"],
        strata_col="lang",
        target=MIX_TARGET,
        out_fraction=MIX_FRACTION,
        seed=MIX_SEED,
    )


def _dup_clusters_sql() -> str:
    """Oracle for q_dup_clusters: transitive closure (recursive CTE)
    over the SAME exact-Jaccard >= 0.5 pair set that checks
    dedup_minhash — valid for the same reason (CLAUDE.md invariant #6:
    the 32x4 banding catches every >= 0.5 pair on this corpus), so a
    propagation bug OR a missed pair both surface as a mismatch."""
    pairs = _jaccard_sql(threshold=0.5, cap="")
    return f"""
WITH RECURSIVE p AS (SELECT doc_a, doc_b FROM ({pairs}) jp),
e AS (
  SELECT doc_a AS u, doc_b AS v FROM p
  UNION
  SELECT doc_b, doc_a FROM p
),
reach(v, r) AS (
  SELECT u, u FROM e
  UNION
  SELECT e.v, reach.r FROM e JOIN reach ON e.u = reach.v
)
SELECT v AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
FROM reach GROUP BY v ORDER BY v
"""


def _dedup_survivors_cc_sql() -> str:
    """Oracle for q_dedup_survivors_cc: drop every component member
    that is not its component's min doc_id (same recursive closure as
    _dup_clusters_sql), keep everything else."""
    pairs = _jaccard_sql(threshold=0.5, cap="")
    return f"""
WITH RECURSIVE p AS (SELECT doc_a, doc_b FROM ({pairs}) jp),
e AS (
  SELECT doc_a AS u, doc_b AS v FROM p
  UNION
  SELECT doc_b, doc_a FROM p
),
reach(v, r) AS (
  SELECT u, u FROM e
  UNION
  SELECT e.v, reach.r FROM e JOIN reach ON e.u = reach.v
),
drops AS (SELECT v AS doc_id FROM reach GROUP BY v HAVING min(r) <> v)
SELECT doc_id, lang, source FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM drops)
ORDER BY doc_id
"""


def _dedup_survivors_best_sql() -> str:
    """Oracle for q_dedup_survivors_best: the same recursive closure as
    _dup_clusters_sql, then the per-component window rank keeps the
    longest member (ties to min doc_id); non-members pass through."""
    pairs = _jaccard_sql(threshold=0.5, cap="")
    return f"""
WITH RECURSIVE p AS (SELECT doc_a, doc_b FROM ({pairs}) jp),
e AS (
  SELECT doc_a AS u, doc_b AS v FROM p
  UNION
  SELECT doc_b, doc_a FROM p
),
reach(v, r) AS (
  SELECT u, u FROM e
  UNION
  SELECT e.v, reach.r FROM e JOIN reach ON e.u = reach.v
),
comp AS (SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v),
t AS (
  SELECT doc_id,
    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens
  FROM documents
),
best AS (
  SELECT doc_id, n_tokens FROM (
    SELECT c.doc_id, t.n_tokens,
      row_number() OVER (PARTITION BY c.cluster_id
                         ORDER BY t.n_tokens DESC, c.doc_id) AS rn
    FROM comp c JOIN t USING (doc_id))
  WHERE rn = 1
)
SELECT doc_id, n_tokens FROM best
UNION ALL
SELECT t.doc_id, t.n_tokens FROM t
WHERE t.doc_id NOT IN (SELECT doc_id FROM comp)
"""


def _diverse_sample_sql(k: int = 10, seed: int = 11) -> str:
    """Oracle for q_diverse_sample_per_cluster: the unrolled-Lloyd
    assignment CTE + row_number over the identical splitmix64 order
    (UBIGINT compare == the engine's shifted-int64 order)."""
    from rayslog.stages.sample import sample_sql_hash_expr

    h = sample_sql_hash_expr("vec_id", seed)
    return f"""
WITH asg AS ({_embed_kmeans_sql()}),
r AS (
  SELECT vec_id, cluster,
    row_number() OVER (PARTITION BY cluster
                       ORDER BY {h}, vec_id) AS rank
  FROM asg
)
SELECT CAST(vec_id AS BIGINT) AS vec_id,
  CAST(cluster AS BIGINT) AS cluster,
  CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k}
"""


def _embed_kmeans_sql(k: int = 8, iters: int = 2) -> str:
    """Oracle for q_embed_kmeans — the SAME Lloyd recurrence unrolled
    as chained CTEs: init = round-6 vectors of vec_id<k, each
    iteration assigns by round-6 cosine (ties -> smallest cluster) and
    re-averages coordinates (round-6, empty clusters keep the previous
    centroid), final select assigns against the last centroids.  The
    round-6 contract on scores AND centroids is what makes the
    distributed float64 sums and DuckDB's avg agree exactly
    (stages/kmeans.py docstring)."""
    parts = [
        f"""c0 AS (SELECT vec_id AS cluster,
        list_transform(CAST(embedding AS DOUBLE[]), x -> round(x, 6)) AS ce
      FROM embeddings WHERE vec_id < {k})""",
        """ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings)""",
    ]
    for t in range(iters):
        parts += [
            f"""s{t} AS (SELECT ev.vec_id, c{t}.cluster,
        round(list_cosine_similarity(ev.e, c{t}.ce), 6) AS score
      FROM ev CROSS JOIN c{t})""",
            f"""a{t} AS (SELECT vec_id, cluster FROM
      (SELECT *, row_number() OVER (PARTITION BY vec_id
         ORDER BY score DESC, cluster) AS rn FROM s{t}) WHERE rn = 1)""",
            f"""m{t} AS (SELECT a{t}.cluster,
        unnest(range(1, len(ev.e)+1)) AS i, unnest(ev.e) AS x
      FROM a{t} JOIN ev USING (vec_id))""",
            f"""mm{t} AS (SELECT cluster, i, round(avg(x), 6) AS cx
      FROM m{t} GROUP BY cluster, i)""",
            f"""cl{t} AS (SELECT cluster, list(cx ORDER BY i) AS ce
      FROM mm{t} GROUP BY cluster)""",
            f"""c{t + 1} AS (SELECT c{t}.cluster,
        coalesce(cl{t}.ce, c{t}.ce) AS ce
      FROM c{t} LEFT JOIN cl{t} USING (cluster))""",
        ]
    ctes = ",\n".join(parts)
    return f"""
WITH {ctes}
SELECT vec_id, CAST(cluster AS BIGINT) AS cluster, score FROM
  (SELECT ev.vec_id, c{iters}.cluster,
     round(list_cosine_similarity(ev.e, c{iters}.ce), 6) AS score,
     row_number() OVER (PARTITION BY ev.vec_id
       ORDER BY round(list_cosine_similarity(ev.e, c{iters}.ce), 6) DESC,
                c{iters}.cluster) AS rn
   FROM ev CROSS JOIN c{iters})
WHERE rn = 1 ORDER BY vec_id
"""


def _shuffle_shards_sql() -> str:
    """Oracle for q_shuffle_shards — shard size/seed literals shared
    with the Ray query; the hash expression is the same bit-exact
    splitmix64 the stratified sampler uses."""
    from rayslog.pipeline import SHARD_SEED, SHARD_SIZE
    from rayslog.stages.shard import shuffle_shards_sql

    return (
        shuffle_shards_sql("documents", SHARD_SIZE, SHARD_SEED)
        + " ORDER BY doc_id"
    )


def _quality_filter_sql() -> str:
    """Oracle for q_quality_filter — thresholds shared with the Ray
    query via pipeline.QUALITY_GATES; features recomputed with the same
    IEEE divisions as the engine kernels."""
    from rayslog.pipeline import QUALITY_GATES as G

    return rf"""
WITH t AS (
  SELECT doc_id, text, regexp_extract_all(text, '\S+') AS toks
  FROM documents
),
bg AS (
  SELECT doc_id,
    unnest(list_transform(
      generate_series(1, len(toks) - 1),
      i -> toks[i] || ' ' || toks[i + 1]
    )) AS bi
  FROM t WHERE len(toks) >= 2
),
bgc AS (SELECT doc_id, bi, count(*) AS c FROM bg GROUP BY doc_id, bi),
bgm AS (SELECT doc_id, max(c) AS mc FROM bgc GROUP BY doc_id),
f AS (
  SELECT t.doc_id,
    CAST(len(toks) AS BIGINT) AS n_toks,
    CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
      / greatest(length(text), 1) AS alpha_ratio,
    CASE WHEN len(toks) >= 2
         THEN CAST(bgm.mc AS DOUBLE) / (len(toks) - 1)
         ELSE 0.0 END AS top_share
  FROM t LEFT JOIN bgm ON t.doc_id = bgm.doc_id
)
SELECT doc_id FROM f
WHERE n_toks >= {G["min_tokens"]} AND n_toks <= {G["max_tokens"]}
  AND alpha_ratio >= {G["min_alpha_ratio"]}
  AND top_share <= {G["max_top_bigram_share"]}
"""


def _curation_sql() -> str:
    """Oracle for q_curation — the same composition (quality gates ->
    exact dedup keep-min -> stratified sample) built from the SAME
    shared pieces, so thresholds/rates/hash can never drift."""
    from rayslog.pipeline import (
        SAMPLE_DEFAULT_RATE,
        SAMPLE_RATES,
        SAMPLE_SEED,
    )
    from rayslog.stages.sample import stratified_sample_sql

    qf = _quality_filter_sql()
    inner = f"""(
WITH kept AS (
  SELECT d.doc_id, d.text, d.lang, d.source FROM documents d
  WHERE d.doc_id IN (SELECT doc_id FROM ({qf}) qf)
),
surv AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY text)
SELECT k.doc_id, k.lang, k.source FROM kept k JOIN surv USING (doc_id)
) c"""
    return stratified_sample_sql(
        inner,
        ["doc_id", "lang", "source"],
        strata_col="lang",
        rates=SAMPLE_RATES,
        default_rate=SAMPLE_DEFAULT_RATE,
        seed=SAMPLE_SEED,
    )


def _centroid_values_sql(sf_dir: str, store: str = "plain") -> str:
    """A persisted IVF store's frozen centroids as SQL VALUES rows
    (builds the store on first use — needs an active ray session).
    ``store``: "plain" (ensure_ivf_index) or "sharded"
    (ensure_sharded_ivf, centroids frozen on the first drop)."""
    from rayslog import pipeline as p

    idx = (
        p.ensure_sharded_ivf(sf_dir)
        if store == "sharded"
        else p.ensure_ivf_index(sf_dir)
    )
    cents = idx.centroids
    return ",\n  ".join(
        "(%d, [%s]::DOUBLE[])"
        % (i, ",".join(repr(float(x)) for x in c))
        for i, c in enumerate(cents)
    )


def _cosine_dups_ivf_sql(sf_dir: str) -> str:
    """cosine_dups_ivf oracle: frozen-centroid argmax assignment (ties
    to the lowest cid, matching np.argmax) then exact round-6 cosine
    pairs within each bucket — the same determinism contract as
    ann_ivf, verified row-for-row at sf0.001/sf0.01."""
    from rayslog import pipeline as p

    vals = _centroid_values_sql(sf_dir)
    thr = p.COSINE_IVF_THRESHOLD
    return f"""
WITH cents(cid, c) AS (VALUES
  {vals}),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
a AS (
  SELECT e.vec_id, e.v,
    (SELECT cid FROM cents
     ORDER BY list_cosine_similarity(e.v, cents.c) DESC, cid LIMIT 1)
    AS bucket
  FROM e
)
SELECT a1.vec_id AS vec_a, a2.vec_id AS vec_b,
  round(list_cosine_similarity(a1.v, a2.v), 6) AS score
FROM a a1 JOIN a a2
  ON a1.bucket = a2.bucket AND a1.vec_id < a2.vec_id
WHERE round(list_cosine_similarity(a1.v, a2.v), 6) >= {thr}
"""


def _dedup_simhash_sql(sf_dir: str, max_hamming: int = 3) -> str:
    """dedup_simhash oracle (r5 promotion, the frozen-literal contract
    of ann_ivf / cosine_dups_lsh): the corpus's 64-bit SimHash
    signatures are computed ray-free with the SAME kernel the pipeline
    runs (`SimHasher.__call__` — C/numpy parity enforced by
    test_texthash/test_vectorized) and exported as UBIGINT literals;
    the SQL then spells the full pigeonhole semantics — 4 x 16-bit
    keys, same-key candidate pairs, cross-table dedup, Hamming via
    bit_count(xor) <= {max_hamming}.  What the oracle checks is the
    candidate-generation + verification machinery, not the signature
    arithmetic (which has its own naive-reference pytest)."""
    import numpy as np
    import pyarrow.parquet as pq

    from rayslog.stages.dedup import SimHasher

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out = SimHasher()(t)
    ids = out.column("doc_id").to_pylist()
    sigs = (
        out.column("simhash")
        .to_numpy(zero_copy_only=False)
        .view(np.uint64)
    )
    vals = ",\n  ".join(
        f"({int(i)}, {int(s)}::UBIGINT)" for i, s in zip(ids, sigs)
    )
    return f"""
WITH sig(doc_id, sh) AS (VALUES
  {vals}),
k AS (
  SELECT doc_id, sh, p, (sh >> (16 * p)) & 65535 AS key
  FROM sig, (SELECT unnest([0,1,2,3]) AS p) parts
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
    a.sh AS sa, b.sh AS sb
  FROM k a JOIN k b ON a.p = b.p AND a.key = b.key
    AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
  CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= {max_hamming}
"""


def _dedup_minhash_keep_sql(sf_dir: str, bands: int = 32,
                            rows_per_band: int = 4) -> str:
    """dedup_minhash_keep oracle (r5 promotion, frozen-literal
    contract): the corpus's (doc_id, band, band_hash) LSH rows are
    computed ray-free with the pipeline's own kernels and exported as
    literals; the one-pass survivor rule — a doc survives iff it is
    the MINIMUM doc_id in EVERY band bucket it occupies — is pure SQL
    over them (min(bucket_min) == doc_id, since bucket_min <= doc_id
    always).  Checks the survivor-selection machinery; signature
    arithmetic has its own naive-reference pytest."""
    import numpy as np
    import pyarrow.parquet as pq

    from rayslog.stages.dedup import _band_rows, _minhash_batch

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    b = _band_rows(_minhash_batch(t), bands, rows_per_band)
    ids = b.column("doc_id").to_pylist()
    band = b.column("band").to_pylist()
    bh = (
        b.column("band_hash")
        .to_numpy(zero_copy_only=False)
        .view(np.uint64)
    )
    vals = ",\n  ".join(
        f"({int(i)}, {int(bd)}, {int(h)}::UBIGINT)"
        for i, bd, h in zip(ids, band, bh)
    )
    return f"""
WITH bh(doc_id, band, h) AS (VALUES
  {vals}),
m AS (SELECT band, h, min(doc_id) AS mn FROM bh GROUP BY band, h)
SELECT b.doc_id
FROM bh b JOIN m ON m.band = b.band AND m.h = b.h
GROUP BY b.doc_id
HAVING min(m.mn) = b.doc_id
"""


def _cosine_dups_lsh_sql(sf_dir: str, threshold: float = 0.4,
                         n_bits: int = 12, n_tables: int = 6,
                         seed: int = 42, max_bucket: int = 4_096) -> str:
    """cosine_dups_lsh oracle (r5 promotion off the rows-only tail):
    the random hyperplanes are DETERMINISTIC given (seed, dim, n_bits,
    n_tables) — ``np.random.default_rng(42).normal`` exactly as
    ``ann.cosine_lsh_pairs`` draws them — so they export as literal
    DOUBLE[] VALUES and the full candidate semantics are spelled in
    SQL: per-table sign-bit bucket, same-(table, bucket) pairs with
    bucket size in [2, max_bucket], cross-table dedup, exact round-6
    cosine >= threshold.  Sign parity holds because sign(v . p) is
    scale-invariant (the Ray side projects NORMALIZED rows, the SQL
    the raw vectors — identical in exact arithmetic, and random
    projections never land within float noise of 0).  The max_bucket
    arm is vacuous at driver scale (bucket <= corpus = 500 rows <<
    4096) but kept for semantic fidelity.  No ray session needed —
    only the embedding dim, read off the parquet file."""
    import numpy as np
    import pyarrow.parquet as pq

    tbl = pq.ParquetFile(f"{sf_dir}/embeddings.parquet").read_row_group(
        0, columns=["embedding"]
    )
    dim = len(tbl.column("embedding")[0])
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_tables, dim, n_bits))
    vals = ",\n  ".join(
        "(%d, %d, [%s]::DOUBLE[])"
        % (t, b, ",".join(repr(float(x)) for x in planes[t, :, b]))
        for t in range(n_tables)
        for b in range(n_bits)
    )
    return f"""
WITH planes(tid, bit, p) AS (VALUES
  {vals}),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
sig AS (
  SELECT e.vec_id, pl.tid,
    CAST(SUM(CASE WHEN list_dot_product(e.v, pl.p) >= 0
             THEN CAST(1 AS BIGINT) << pl.bit ELSE 0 END) AS BIGINT)
      AS bucket
  FROM e CROSS JOIN planes pl
  GROUP BY e.vec_id, pl.tid
),
ok AS (
  SELECT tid, bucket FROM sig GROUP BY tid, bucket
  HAVING count(*) BETWEEN 2 AND {max_bucket}
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM sig a
  JOIN sig b ON a.tid = b.tid AND a.bucket = b.bucket
    AND a.vec_id < b.vec_id
  JOIN ok ON ok.tid = a.tid AND ok.bucket = a.bucket
)
SELECT c.vec_a, c.vec_b,
  round(list_cosine_similarity(ea.v, eb.v), 6) AS score
FROM cand c
JOIN e ea ON ea.vec_id = c.vec_a
JOIN e eb ON eb.vec_id = c.vec_b
WHERE round(list_cosine_similarity(ea.v, eb.v), 6)
      >= CAST({threshold} AS DOUBLE)
"""


def _ann_ivf_sql(sf_dir: str, k: int = 10, nprobe: int = 4,
                 n_queries: int = 8, store: str = "plain") -> str:
    """ann_ivf / ann_ivf_incr oracle (embed_kmeans-style round-6
    contract): load the SAME persisted index the query probes, export
    its FROZEN centroids as literal VALUES, and spell argmax
    assignment -> nprobe pruning -> cosine top-k in SQL.  Valid
    because both sides break assignment/probe argmax ties to the
    LOWEST centroid id and round scores to 6 dp before ranking
    (verified row-for-row at sf0.001 and sf0.01).  ``store="sharded"``
    uses the incremental store's first-drop-frozen centroids — the
    shard-union probe equals a one-shot assignment (pytest-proven), so
    the identical SQL applies.  First call per corpus builds the index
    (needs an active ray session — why these entries only exist when a
    ``sf_dir`` is passed to :func:`training_oracle_queries`)."""
    vals = _centroid_values_sql(sf_dir, store=store)
    return f"""
WITH cents(cid, c) AS (VALUES
  {vals}),
q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
      FROM embeddings WHERE vec_id < {n_queries}),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
a AS (
  SELECT e.vec_id,
    (SELECT cid FROM cents
     ORDER BY list_cosine_similarity(e.v, cents.c) DESC, cid LIMIT 1)
    AS bucket
  FROM e
),
pr AS (
  SELECT query_id, cid FROM (
    SELECT q.query_id, cents.cid,
      row_number() OVER (PARTITION BY q.query_id
        ORDER BY list_cosine_similarity(q.qe, cents.c) DESC, cents.cid)
        AS rn
    FROM q CROSS JOIN cents)
  WHERE rn <= {nprobe}
),
s AS (
  SELECT q.query_id, a.vec_id,
    round(list_cosine_similarity(q.qe, e.v), 6) AS score
  FROM q
  JOIN pr ON pr.query_id = q.query_id
  JOIN a ON a.bucket = pr.cid
  JOIN e ON e.vec_id = a.vec_id
)
SELECT query_id, vec_id, score, CAST(rank AS BIGINT) AS rank FROM (
  SELECT query_id, vec_id, score,
    row_number() OVER (PARTITION BY query_id
                       ORDER BY score DESC, vec_id) AS rank
  FROM s)
WHERE rank <= {k}
"""


def training_oracle_queries(sf_dir: str | None = None) -> dict[str, str]:
    """Oracles for the training-data operators — these run on the
    driver's pre-registered views (documents/embeddings/events/
    lineitem/orders/customer), no generated data involved.

    ``sf_dir``: when given, adds the ``ann_ivf`` oracle, whose SQL
    embeds the persisted index's frozen centroids for that corpus (a
    first-time index build needs an active ray session; omit sf_dir in
    ray-free contexts)."""
    cents_p = "CAST(round(l_extendedprice*100) AS BIGINT)"
    cents_d = "CAST(round(l_discount*100) AS BIGINT)"
    cents_t = "CAST(round(l_tax*100) AS BIGINT)"
    q = {
        "dedup_exact": (
            "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text"
        ),
        # exact k=3-token-shingle Jaccard (ngram_jaccard_pairs semantics):
        # rows with <3 tokens contribute ONE shingle of all their tokens;
        # both-empty pairs have jaccard 1.0
        "ngram_jaccard": _jaccard_sql(
            threshold=0.05, cap="ORDER BY doc_id LIMIT 200"
        ),
        # the MinHash+LSH near-dup pipeline verifies candidates with the
        # EXACT shingle Jaccard, and on this deterministic corpus the
        # 32x4 banding catches every pair >= 0.5 (planted near-dups are
        # all >= ~0.9; miss probability ~1e-4 per pair, verified
        # empirically pair-for-pair at sf0.001 and sf0.01) — so the
        # exact all-pairs computation is a valid oracle for the full
        # candidates->verify pipeline
        "dedup_minhash": _jaccard_sql(threshold=0.5, cap=""),
        "lang_id": """
WITH tok AS (
  SELECT doc_id, lang, text,
    regexp_extract_all(
      regexp_replace(lower(text), '[^a-zA-Z]+', ' ', 'g'), '[a-z]+'
    ) AS toks
  FROM documents
),
s AS (
  SELECT doc_id, lang, text,
    len(list_filter(toks, t -> t IN
      ('the','and','of','to','a','in','is','it','for','on'))) AS s_en,
    len(list_filter(toks, t -> t IN
      ('el','la','de','que','y','en','un','por','con','los'))) AS s_es,
    len(list_filter(toks, t -> t IN
      ('le','la','de','et','les','des','en','un','du','que'))) AS s_fr,
    len(list_filter(toks, t -> t IN
      ('der','die','und','das','von','zu','mit','den','ist','im'))) AS s_de
  FROM tok
)
SELECT doc_id, lang,
  CASE
    WHEN text IS NULL THEN NULL
    WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
    WHEN s_en=0 AND s_es=0 AND s_fr=0 AND s_de=0 THEN 'und'
    WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
    WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
    WHEN s_fr >= s_de THEN 'fr'
    ELSE 'de'
  END AS lang_pred
FROM s
""",
        # Gopher/C4 repetition metrics: line/paragraph splits are
        # str_split (same non-overlapping left-to-right rule as Arrow's
        # split_pattern); bigrams via list_zip of adjacent \S+ tokens
        "repetition": r"""
WITH t AS (
  SELECT doc_id,
    regexp_extract_all(text, '\S+') AS toks,
    str_split(text, chr(10)) AS lines,
    str_split(text, chr(10)||chr(10)) AS paras
  FROM documents
),
base AS (
  SELECT doc_id,
    CAST(len(lines) AS BIGINT) AS n_lines,
    CAST(len(list_distinct(lines)) AS BIGINT) AS n_dlines,
    CAST(len(paras) AS BIGINT) AS n_paras,
    CAST(len(list_distinct(paras)) AS BIGINT) AS n_dparas,
    CAST(len(toks) AS BIGINT) AS n_toks,
    toks
  FROM t
),
bg AS (
  SELECT doc_id,
    unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS bi
  FROM base WHERE n_toks >= 2
),
bgc AS (SELECT doc_id, bi, count(*) AS c FROM bg GROUP BY doc_id, bi),
bgm AS (SELECT doc_id, max(c) AS mc FROM bgc GROUP BY doc_id)
SELECT b.doc_id,
  b.n_lines,
  CAST(b.n_lines - b.n_dlines AS DOUBLE) / greatest(b.n_lines, 1)
    AS dup_line_frac,
  b.n_paras,
  CAST(b.n_paras - b.n_dparas AS DOUBLE) / greatest(b.n_paras, 1)
    AS dup_para_frac,
  CASE WHEN b.n_toks IS NULL THEN NULL
       WHEN b.n_toks >= 2
       THEN CAST(bgm.mc AS DOUBLE) / (b.n_toks - 1)
       ELSE 0.0 END AS top_bigram_share
FROM base b LEFT JOIN bgm USING (doc_id)
""",
        "stratified_sample": _stratified_sample_sql(),
        "domain_mix": _domain_mix_sql(),
        "shuffle_shards": _shuffle_shards_sql(),
        "dup_clusters": _dup_clusters_sql(),
        "dedup_survivors_cc": _dedup_survivors_cc_sql(),
        "dedup_survivors_best": _dedup_survivors_best_sql(),
        # eval-side contamination: per eval doc, distinct 4-grams
        # shared with ANY train doc (gram STRINGS — hash collisions on
        # the Ray side would surface as a mismatch)
        "contamination_report": r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents
),
g AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    generate_series(1, len(t) - 3),
    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
  ))) AS gram
  FROM toks WHERE len(t) >= 4
),
tr AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 <> 0)
SELECT g.doc_id,
  CAST(count(*) AS BIGINT) AS n_grams,
  CAST(count(tr.gram) AS BIGINT) AS n_leaked_grams,
  CAST(count(tr.gram) AS DOUBLE) / count(*) AS leak_frac
FROM g LEFT JOIN tr USING (gram)
WHERE g.doc_id % 50 = 0
GROUP BY g.doc_id
""",
        "token_budget_sample": __import__(
            "rayslog.stages.sample", fromlist=["token_budget_sample_sql"]
        ).token_budget_sample_sql(
            "documents",
            budget=__import__(
                "rayslog.pipeline", fromlist=["TOKEN_BUDGET_PER_SOURCE"]
            ).TOKEN_BUDGET_PER_SOURCE,
        ),
        "embed_kmeans": _embed_kmeans_sql(),
        # cluster-balanced diverse sampling: same unrolled-Lloyd
        # assignment CTE + seeded-hash window rank per cluster
        "diverse_sample_per_cluster": _diverse_sample_sql(),
        # cross-table composition: kmeans assignments (same unrolled
        # Lloyd oracle) joined to documents on the shared id domain
        "cluster_profile": f"""
WITH asg AS ({_embed_kmeans_sql()})
SELECT asg.cluster, d.lang, CAST(count(*) AS BIGINT) AS n_docs
FROM asg JOIN documents d ON asg.vec_id = d.doc_id
GROUP BY asg.cluster, d.lang
""",
        # Laplace bigram LM: identical smoothing/ratio-before-log
        # expression as stages/lm.py; V = distinct corpus codepoints
        "lm_score": """
WITH pos AS (SELECT doc_id, text AS s, unnest(range(1, length(text))) AS i
             FROM documents WHERE length(text) >= 2),
bg AS (SELECT doc_id, substring(s, CAST(i AS INT), 2) AS xy,
              substring(s, CAST(i AS INT), 1) AS x FROM pos),
bc AS (SELECT xy, count(*) AS cxy FROM bg GROUP BY xy),
pc AS (SELECT x, count(*) AS cx FROM bg GROUP BY x),
allchars AS (SELECT substring(text, CAST(i AS INT), 1) AS c
             FROM (SELECT text, unnest(range(1, length(text)+1)) AS i
                   FROM documents)),
v AS (SELECT CAST(count(DISTINCT c) AS DOUBLE) AS vv FROM allchars),
scored AS (SELECT bg.doc_id,
    round(-avg(log2((bc.cxy + 1.0) / (pc.cx + v.vv))), 6) AS lm_bits
  FROM bg JOIN bc USING (xy) JOIN pc USING (x) CROSS JOIN v
  GROUP BY bg.doc_id)
SELECT d.doc_id, coalesce(s.lm_bits, 0.0) AS lm_bits
FROM documents d LEFT JOIN scored s USING (doc_id)
ORDER BY d.doc_id
""",
        "embed_dedup_cc": """
WITH RECURSIVE p AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])), 6) >= 0.4
),
e AS (SELECT va AS u, vb AS v FROM p UNION SELECT vb, va FROM p),
reach(v, r) AS (
  SELECT u, u FROM e
  UNION
  SELECT e.v, reach.r FROM e JOIN reach ON e.u = reach.v
),
drops AS (SELECT v AS vec_id FROM reach GROUP BY v HAVING min(r) <> v)
SELECT vec_id, label FROM embeddings
WHERE vec_id NOT IN (SELECT vec_id FROM drops)
ORDER BY vec_id
""",
        "quality_filter": _quality_filter_sql(),
        "curation": _curation_sql(),
        # tf x (N/df) top terms — linear idf (one IEEE division, no
        # transcendentals, so engine and oracle match bit-for-bit)
        "tf_idf": r"""
WITH n AS (SELECT count(*) AS n_docs FROM documents),
tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS token
  FROM documents
),
tf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
  FROM tok GROUP BY 1, 2
),
dfq AS (
  SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM tok GROUP BY 1
),
s AS (
  SELECT tf.doc_id, tf.token,
    CAST(tf.tf * (SELECT n_docs FROM n) AS DOUBLE) / dfq.df AS score
  FROM tf JOIN dfq USING (token)
),
r AS (
  SELECT *, CAST(row_number() OVER
    (PARTITION BY doc_id ORDER BY score DESC, token) AS BIGINT) AS rank
  FROM s
)
SELECT doc_id, rank, token, score FROM r WHERE rank <= 3
""",
        # per-language token-count quantiles: same inverse-CDF rule as
        # value_quantiles (smallest v with cum >= ceil(q*n)), windowed
        # per group
        # approx_quantiles is LOSSLESS at this corpus size (pipeline
        # k=16384 > 10k event rows -> the KLL sketch never compacts;
        # the approx_top_ngrams trick), so its exact rule — the
        # rank-ceil(q*n) element of the sorted values, numpy float64
        # ceil — is spelled verbatim.  The DOUBLE casts mirror numpy's
        # float arithmetic (DuckDB would otherwise use exact DECIMAL
        # and disagree on ceil at integer boundaries).
        "approx_quantiles": r"""
WITH v AS (SELECT value FROM events WHERE value IS NOT NULL),
n AS (SELECT count(*) AS c FROM v),
s AS (SELECT value, row_number() OVER (ORDER BY value) AS rn FROM v)
SELECT qs.q, s.value
FROM (VALUES ('p50', CAST(0.50 AS DOUBLE)),
             ('p95', CAST(0.95 AS DOUBLE)),
             ('p99', CAST(0.99 AS DOUBLE))) qs(q, qf)
JOIN n ON TRUE
JOIN s ON s.rn = greatest(
    1, CAST(ceil(qs.qf * CAST(n.c AS DOUBLE)) AS BIGINT))
""",
        # same lossless-here contract per GROUP (pipeline k=4096 >
        # every per-lang count at sf0.01); value is the float64 token
        # count the Ray side sketches
        "approx_quantiles_by_lang": r"""
WITH t AS (
  SELECT lang,
    CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS v
  FROM documents
),
n AS (SELECT lang, count(*) AS c FROM t GROUP BY lang),
s AS (
  SELECT lang, v,
    row_number() OVER (PARTITION BY lang ORDER BY v) AS rn
  FROM t
)
SELECT s.lang, qs.q, s.v AS value
FROM (VALUES ('p50', CAST(0.50 AS DOUBLE)),
             ('p95', CAST(0.95 AS DOUBLE))) qs(q, qf)
JOIN n ON TRUE
JOIN s ON s.lang = n.lang
      AND s.rn = greatest(
          1, CAST(ceil(qs.qf * CAST(n.c AS DOUBLE)) AS BIGINT))
""",
        "token_quantiles_by_lang": r"""
WITH t AS (
  SELECT lang,
    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS v
  FROM documents
),
c AS (SELECT lang, v, count(*) AS n FROM t GROUP BY 1, 2),
w AS (
  SELECT lang, v,
    sum(n) OVER (PARTITION BY lang ORDER BY v) AS cum,
    sum(n) OVER (PARTITION BY lang) AS tot
  FROM c
)
SELECT lang, 'p50' AS q, CAST(min(v) AS DOUBLE) AS value
FROM w WHERE cum >= ceil(0.5 * tot) GROUP BY lang
UNION ALL
SELECT lang, 'p95', CAST(min(v) AS DOUBLE)
FROM w WHERE cum >= ceil(0.95 * tot) GROUP BY lang
""",
        # sequence packing: bin = exclusive global prefix sum of token
        # counts (doc_id order) // budget — pure integer arithmetic
        "pack_sequences": r"""
WITH t AS (
  SELECT doc_id,
    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT doc_id, n_tokens,
  CAST(coalesce(SUM(n_tokens) OVER
    (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
    0) // 256 AS BIGINT) AS bin_id
FROM t
""",
        # the emit step after pack_sequences: one row per bin with the
        # docs joined in doc_id order (same prefix-sum bin rule)
        "pack_assemble": r"""
WITH t AS (
  SELECT doc_id, text,
    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
  FROM documents
),
b AS (
  SELECT doc_id, text, n_tokens,
    CAST(coalesce(SUM(n_tokens) OVER
      (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      0) // 256 AS BIGINT) AS bin_id
  FROM t
)
SELECT bin_id, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
  string_agg(text, chr(10) ORDER BY doc_id) AS sample
FROM b GROUP BY bin_id
""",
        # benchmark decontamination: non-eval docs sharing >= 1
        # distinct 4-token-gram with the eval subset (doc_id % 50 = 0),
        # n_shared = the doc's distinct shared grams.  The Ray side
        # compares 128-bit dual-seed gram hashes; this joins the gram
        # STRINGS, so any hash collision would surface as a mismatch.
        # Constants mirror pipeline.DECON_N / DECON_EVAL_MOD.
        "decontaminate": r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents
),
g AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    generate_series(1, len(t) - 3),
    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
  ))) AS gram
  FROM toks WHERE len(t) >= 4
),
e AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0)
SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_shared
FROM g JOIN e USING (gram)
WHERE g.doc_id % 50 <> 0
GROUP BY g.doc_id
ORDER BY g.doc_id
""",
        # the decontaminated corpus: non-eval docs with no shared gram
        "decontam_survivors": r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents
),
g AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    generate_series(1, len(t) - 3),
    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
  ))) AS gram
  FROM toks WHERE len(t) >= 4
),
e AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
bad AS (SELECT DISTINCT g.doc_id FROM g JOIN e USING (gram)
        WHERE g.doc_id % 50 <> 0)
SELECT d.doc_id, d.lang FROM documents d
WHERE d.doc_id % 50 <> 0 AND d.doc_id NOT IN (SELECT doc_id FROM bad)
""",
        # exact adjacent-token phrase match (pipeline.PHRASE): the
        # engine intersects positional postings; this checks bigram
        # membership over the same \S+ lowercased tokenization
        "phrase_search": r"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks
  FROM documents
),
bg AS (
  SELECT doc_id, list_transform(
    generate_series(1, len(toks) - 1),
    i -> toks[i] || ' ' || toks[i+1]
  ) AS bgs
  FROM t WHERE len(toks) >= 2
)
SELECT doc_id,
  CAST(len(list_filter(bgs, b -> b = 'table hash')) AS BIGINT)
    AS n_occurrences
FROM bg WHERE len(list_filter(bgs, b -> b = 'table hash')) > 0
""",
        # BM25 top-10 for the probe tokens (k1=1.2, b=0.75): arithmetic
        # spelled left-to-right exactly as invindex.bm25_topk computes
        # it; the per-doc sum is list_sum over token-ordered terms
        # (deterministic order on both sides), scores round-6
        "bm25_search": r"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks
  FROM documents
),
st AS (SELECT CAST(count(*) AS DOUBLE) AS nd,
              CAST(sum(len(toks)) AS DOUBLE) / count(*) AS avgdl FROM t),
u AS (SELECT doc_id, unnest(toks) AS token FROM t),
tf AS (SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf FROM u
       WHERE token IN ('data', 'query', 'spark') GROUP BY doc_id, token),
df AS (SELECT token, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY token),
dl AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl FROM t),
terms AS (
  SELECT tf.doc_id, tf.token,
    ln(1 + (st.nd - df.df + 0.5) / (df.df + 0.5)) * tf.tf
      / (tf.tf + 1.2 * ((1 - 0.75) + (0.75 * dl.dl) / st.avgdl)) AS term
  FROM tf JOIN df USING (token) JOIN dl USING (doc_id) CROSS JOIN st
),
s AS (SELECT doc_id, round(list_sum(list(term ORDER BY token)), 6) AS score
      FROM terms GROUP BY doc_id)
SELECT doc_id, score, rank FROM (
  SELECT doc_id, score,
    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
  FROM s) WHERE rank <= 10
""",
        # corpus-wide top-20 token bigrams, deterministic tie-break
        "top_ngrams": r"""
WITH t AS (SELECT regexp_extract_all(text, '\S+') AS toks FROM documents),
bg AS (
  SELECT unnest(list_transform(
    generate_series(1, len(toks) - 1),
    i -> toks[i] || ' ' || toks[i + 1]
  )) AS ngram
  FROM t WHERE len(toks) >= 2
)
SELECT ngram, CAST(count(*) AS BIGINT) AS n
FROM bg GROUP BY ngram
ORDER BY n DESC, ngram LIMIT 20
""",
        # the sketch is lossless on this corpus (distinct bigrams <
        # capacity, see q_approx_top_ngrams docstring), so the exact
        # top-20 is its oracle
        "approx_top_ngrams": r"""
WITH t AS (SELECT regexp_extract_all(text, '\S+') AS toks FROM documents),
bg AS (
  SELECT unnest(list_transform(
    generate_series(1, len(toks) - 1),
    i -> toks[i] || ' ' || toks[i + 1]
  )) AS ngram
  FROM t WHERE len(toks) >= 2
)
SELECT ngram, CAST(count(*) AS BIGINT) AS n
FROM bg GROUP BY ngram
ORDER BY n DESC, ngram LIMIT 20
""",
        # top-20 tokens by document frequency (lowercased)
        "doc_freq": r"""
WITH t AS (
  SELECT doc_id,
    list_distinct(regexp_extract_all(lower(text), '\S+')) AS toks
  FROM documents
),
d AS (SELECT doc_id, unnest(toks) AS token FROM t)
SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
FROM d GROUP BY token
ORDER BY df DESC, token LIMIT 20
""",
        "normalize_text": r"""
SELECT doc_id,
  trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g'))
    AS norm_text
FROM documents
""",
        "text_quality": rf"""
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars_measured,
  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
  CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS n_words,
  CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
    / greatest(length(text), 1) AS alpha_ratio,
  CAST(len(regexp_extract_all(text, ' ')) AS DOUBLE)
    / greatest(length(text), 1) AS space_ratio
FROM documents
""",
        "token_counts": rf"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS ws_tokens,
  CAST(len(regexp_extract_all(text, '{_TOKEN_RE_SQL}')) AS BIGINT) AS bpe_tokens
FROM documents
""",
        # intra-corpus duplicated-span statistic: per doc, distinct
        # 4-token grams + how many appear in >= 2 docs.  The Ray side
        # compares 128-bit dual-seed gram hashes; this joins the gram
        # STRINGS, so any hash collision would surface as a mismatch.
        "dup_spans": r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents
),
g AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    generate_series(1, len(t) - 3),
    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
  ))) AS gram
  FROM toks WHERE len(t) >= 4
),
df AS (SELECT gram, count(DISTINCT doc_id) AS df FROM g GROUP BY gram)
SELECT g.doc_id,
  CAST(count(*) AS BIGINT) AS n_grams,
  CAST(sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_dup_grams,
  CAST(sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
    AS dup_frac
FROM g JOIN df USING (gram) GROUP BY g.doc_id
""",
        # distributed window rank (ties broken by doc_id asc)
        "top_docs_by_lang": """
SELECT doc_id, lang, n_chars, rank FROM (
  SELECT doc_id, lang, n_chars,
    CAST(row_number() OVER
      (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank
  FROM documents) WHERE rank <= 5
""",
        "distinct_users_by_type": """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
FROM events GROUP BY event_type
""",
        "sample_k_per_lang": _sample_k_sql(),
        # inverted-index lookup: per-doc distinct lowercased tokens,
        # posting rows for the probe set (pipeline.INDEX_PROBE_TOKENS)
        "inverted_index": r"""
WITH t AS (
  SELECT doc_id,
    list_distinct(regexp_extract_all(lower(text), '\S+')) AS toks
  FROM documents
),
d AS (SELECT doc_id, unnest(toks) AS token FROM t)
SELECT token, doc_id FROM d WHERE token IN ('data', 'query', 'spark')
""",
        # percentile-band length gate: thresholds are the same
        # inverse-CDF rule as token_quantiles_by_lang (smallest v with
        # cum >= ceil(q * tot)), derived per language then applied
        # inclusively.  Quantile literals mirror pipeline.BAND_QUANTILES.
        "length_band_filter": r"""
WITH t AS (
  SELECT doc_id, lang,
    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (SELECT lang, n_tokens AS v, count(*) AS n FROM t GROUP BY 1, 2),
w AS (
  SELECT lang, v,
    sum(n) OVER (PARTITION BY lang ORDER BY v) AS cum,
    sum(n) OVER (PARTITION BY lang) AS tot
  FROM c
),
b AS (
  SELECT lang,
    min(CASE WHEN cum >= ceil(0.05 * tot) THEN v END) AS lo,
    min(CASE WHEN cum >= ceil(0.95 * tot) THEN v END) AS hi
  FROM w GROUP BY lang
)
SELECT t.doc_id, t.lang, t.n_tokens
FROM t JOIN b USING (lang)
WHERE t.n_tokens >= b.lo AND t.n_tokens <= b.hi
""",
        "ann_topk": """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings WHERE vec_id < 8),
s AS (SELECT q.query_id, e.vec_id,
        round(list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])), 6)
          AS score
      FROM q CROSS JOIN embeddings e),
r AS (SELECT *, CAST(row_number() OVER
        (PARTITION BY query_id ORDER BY score DESC, vec_id) AS BIGINT) AS rank
      FROM s)
SELECT query_id, vec_id, score, rank FROM r WHERE rank <= 10
""",
        "cosine_dups": """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])), 6) AS score
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])), 6) >= 0.4
""",
        # ordered conversion funnel: stage i strictly after the user's
        # first completion of the prefix; constants mirror
        # pipeline.FUNNEL_STAGES / FUNNEL_MIN_VALUE
        # semi-structured extraction: the engine regex-extracts the
        # same integer the JSON reader sees; the mean is the IEEE
        # division of the int sum on both sides
        "props_stats": """
WITH x AS (
  SELECT event_type,
    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(sum(k) AS BIGINT) AS k_sum,
  CAST(sum(k) AS DOUBLE) / count(*) AS k_mean
FROM x GROUP BY event_type
""",
        "events_funnel": """
WITH e2 AS (SELECT user_id, event_type, ts FROM events WHERE value >= 95.0),
v AS (SELECT user_id, min(ts) AS t1 FROM e2
      WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS t2 FROM e2 e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS t3 FROM e2 e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
SELECT 'view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM v
UNION ALL SELECT 'click', CAST(count(*) AS BIGINT) FROM c
UNION ALL SELECT 'purchase', CAST(count(*) AS BIGINT) FROM p
""",
        "events_tumbling": """
SELECT event_type,
  make_timestamp((epoch_us(ts) // 300000000) * 300000000) AS window_start,
  count(*) AS n_events,
  CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100 AS value_sum
FROM events GROUP BY 1, 2
""",
        "events_sliding": """
SELECT event_type, window_start, count(*) AS n_events FROM (
  SELECT event_type,
    make_timestamp((epoch_us(ts) // 300000000) * 300000000) AS window_start
  FROM events
  UNION ALL
  SELECT event_type,
    make_timestamp(((epoch_us(ts) - 300000000) // 300000000) * 300000000)
      AS window_start
  FROM events
) GROUP BY event_type, window_start
""",
        "value_quantiles": """
WITH c AS (SELECT CAST(round(value*100) AS BIGINT) AS v, count(*) AS n
           FROM events GROUP BY 1),
w AS (SELECT v, sum(n) OVER (ORDER BY v) AS cum, sum(n) OVER () AS tot
      FROM c)
SELECT 'p50' AS q, min(v)/100.0 AS value FROM w WHERE cum >= ceil(0.5*tot)
UNION ALL
SELECT 'p95', min(v)/100.0 FROM w WHERE cum >= ceil(0.95*tot)
UNION ALL
SELECT 'p99', min(v)/100.0 FROM w WHERE cum >= ceil(0.99*tot)
""",
        "price_bands": """
WITH bands(lo, hi, band) AS (VALUES
  (0.0, 925.0, 'budget'), (925.0, 950.0, 'mid'),
  (950.0, 975.0, 'premium'), (975.0, 1e18, 'luxury'))
SELECT b.band, count(*) AS n_parts,
  CAST(sum(CAST(round(p.p_retailprice*100) AS BIGINT)) AS DOUBLE)/100
    AS price_sum
FROM part p JOIN bands b
  ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
GROUP BY b.band
""",
        "asof_attribution": """
SELECT p.event_id, p.user_id, p.ts, v.ts AS last_source_ts
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts >= v.ts
""",
        "events_filtered": """
SELECT user_id, count(*) AS n_clicks,
  CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100 AS click_value
FROM events WHERE event_type = 'click' GROUP BY user_id
""",
        "events_sessionize": """
WITH x AS (
  SELECT user_id, ts, event_id,
    CASE WHEN lag(ts) OVER w IS NULL
           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
         THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
y AS (SELECT user_id, sum(new_s) OVER
        (PARTITION BY user_id ORDER BY ts, event_id
         ROWS UNBOUNDED PRECEDING) AS sid FROM x),
z AS (SELECT user_id, sid, count(*) AS cnt FROM y GROUP BY 1, 2)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
  CAST(sum(cnt) AS BIGINT) AS n_events,
  CAST(max(cnt) AS BIGINT) AS longest_session_events
FROM z GROUP BY user_id
""",
        "lineitem_pricing": f"""
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(sum({cents_p}) AS DOUBLE) / 100 AS sum_base_price,
  CAST(sum({cents_p} * (100 - {cents_d})) AS DOUBLE) / 10000
    AS sum_disc_price,
  CAST(sum({cents_p} * (100 - {cents_d}) * (100 + {cents_t})) AS DOUBLE)
    / 1000000 AS sum_charge,
  count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
        "mktsegment_revenue": """
SELECT c.c_mktsegment, count(*) AS n_orders,
  CAST(sum(CAST(round(o.o_totalprice*100) AS BIGINT)) AS DOUBLE)/100
    AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
        "regional_revenue": """
SELECT n.n_name,
  CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
           * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS DOUBLE)
    / 10000 AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
              AND s.s_nationkey = c.c_nationkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
""",
        "cust_order_dist": """
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust GROUP BY c_count
""",
        "order_priority": """
SELECT o.o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 48)
GROUP BY o.o_orderpriority
""",
        "top_customers": """
WITH r AS (SELECT o_custkey AS c_custkey,
             CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100
               AS revenue
           FROM orders GROUP BY 1)
SELECT r.c_custkey, r.revenue, c.c_name, c.c_mktsegment
FROM r JOIN customer c USING (c_custkey)
ORDER BY revenue DESC, c_custkey LIMIT 10
""",
    }
    # the time-partitioned sessionize/as-of are EQUIVALENT to their
    # plain per-key forms (two-phase chunk + stitch); same oracles
    q["events_sessionize_partitioned"] = q["events_sessionize"]
    q["asof_attribution_partitioned"] = q["asof_attribution"]
    # the incrementally-built sharded store must score IDENTICALLY to
    # the one-shot index — same BM25 oracle
    q["bm25_search_incr"] = q["bm25_search"]
    # multi-column posting store: source-field token AND body-field
    # token, with the body term frequency
    # incremental dedup: synthetic new drop (odd docs + re-crawled
    # %4==0 copies + re-submitted %8==7 copies) vs committed even half
    q["dedup_incremental"] = """
WITH newb AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 4 = 0
  UNION ALL
  SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 8 = 7
),
w AS (
  SELECT doc_id, text,
    row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM newb
)
SELECT w.doc_id FROM w
WHERE rn = 1
  AND NOT EXISTS (SELECT 1 FROM documents o
                  WHERE o.doc_id % 2 = 0 AND o.text = w.text)
"""
    q["fielded_search"] = r"""
SELECT doc_id,
  CAST(len(list_filter(regexp_extract_all(lower(text), '\S+'),
                       t -> t = 'data')) AS BIGINT) AS tf
FROM documents
WHERE lower(source) = 'src3'
  AND list_contains(regexp_extract_all(lower(text), '\S+'), 'data')
"""
    # --- round-4 TPC-H-shaped join/aggregate families -----------------
    # rev-in-cents^2 shorthand: price_c * (100 - disc_c), exact BIGINT
    rc2 = ("CAST(round(l_extendedprice*100) AS BIGINT)"
           " * (100 - CAST(round(l_discount*100) AS BIGINT))")
    q["promo_revenue"] = f"""
WITH j AS (
  SELECT {rc2} AS rc2, p.p_type
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
    AND l.l_shipdate < TIMESTAMP '1996-10-01'
)
SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN rc2 ELSE 0 END) AS DOUBLE)
         / 10000 AS promo_revenue,
       CAST(sum(rc2) AS DOUBLE) / 10000 AS total_revenue,
       100.0 * (CAST(sum(CASE WHEN p_type = 'PROMO' THEN rc2 ELSE 0 END)
                     AS DOUBLE)
                / CAST(sum(rc2) AS DOUBLE)) AS promo_pct
FROM j
"""
    q["returned_top_customers"] = f"""
WITH r AS (
  SELECT o.o_custkey, CAST(sum({rc2}) AS BIGINT) AS rc2sum
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'R'
    AND o.o_orderdate >= TIMESTAMP '1996-07-01'
    AND o.o_orderdate < TIMESTAMP '1996-10-01'
  GROUP BY o.o_custkey
)
SELECT r.o_custkey AS c_custkey,
  CAST(r.rc2sum AS DOUBLE) / 10000 AS revenue, c.c_name, n.n_name
FROM r JOIN customer c ON r.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
ORDER BY r.rc2sum DESC, r.o_custkey LIMIT 20
"""
    q["large_orders"] = """
WITH big AS (
  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
           AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS BIGINT)) > 250
)
SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, o.o_totalprice,
       b.total_qty
FROM big b JOIN orders o ON b.l_orderkey = o.o_orderkey
ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100
"""
    q["brand_supplier_counts"] = """
SELECT p.p_brand, CAST(p.p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand, p.p_size
"""
    q["idle_customers"] = """
WITH t AS (
  SELECT CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS DOUBLE)
           / count(*) AS thresh
  FROM customer WHERE CAST(round(c_acctbal*100) AS BIGINT) > 0
)
SELECT CAST(c.c_nationkey AS BIGINT) AS c_nationkey,
       CAST(count(*) AS BIGINT) AS n_cust,
       CAST(sum(CAST(round(c.c_acctbal*100) AS BIGINT)) AS DOUBLE) / 100
         AS total_acctbal
FROM customer c, t
WHERE CAST(CAST(round(c.c_acctbal*100) AS BIGINT) AS DOUBLE) > t.thresh
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c.c_nationkey
"""
    q["ship_latency"] = """
SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(date_diff('day', CAST(o.o_orderdate AS DATE),
                          CAST(l.l_shipdate AS DATE))) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS avg_latency_days
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""
    q["value_variance"] = """
WITH a AS (
  SELECT event_type,
    CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS s,
    CAST(sum(CAST(round(value*100) AS BIGINT)
             * CAST(round(value*100) AS BIGINT)) AS BIGINT) AS s2,
    count(*) AS n
  FROM events GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n_events,
  (CAST(s2 AS DOUBLE)
   - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
  / CAST(n AS DOUBLE) / 10000.0 AS var_value
FROM a
"""
    q["last_event_per_user"] = """
SELECT user_id, ts, event_id, event_type
FROM (
  SELECT user_id, ts, event_id, event_type,
    row_number() OVER (PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""
    q["rolling_time"] = """
WITH w AS (
  SELECT user_id, event_id, ts,
    CAST(round(value*100) AS BIGINT) AS c
  FROM events
)
SELECT user_id, event_id,
  CAST(count(*) OVER f AS BIGINT) AS n_win,
  CAST(sum(c) OVER f AS DOUBLE) / 100.0 AS sum_win
FROM w WINDOW f AS (PARTITION BY user_id ORDER BY ts
                    RANGE BETWEEN INTERVAL 300 SECONDS PRECEDING
                          AND CURRENT ROW)
"""
    q["triangle_count"] = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y
  FROM d a JOIN d b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM e e1
JOIN e e2 ON e1.x = e2.x AND e1.y < e2.y
JOIN e e3 ON e3.x = e1.y AND e3.y = e2.y
"""
    q["above_avg_orders"] = """
WITH w AS (
  SELECT o_orderpriority,
    CAST(round(o_totalprice*100) AS BIGINT) AS c,
    count(*) OVER (PARTITION BY o_custkey) AS n,
    sum(CAST(round(o_totalprice*100) AS BIGINT))
      OVER (PARTITION BY o_custkey) AS s
  FROM orders
)
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_above
FROM w WHERE c * n > s GROUP BY o_orderpriority
"""
    q["events_cube"] = """
SELECT event_type, CAST(date_part('hour', ts) AS INTEGER) AS hour,
       count(*) AS n_events
FROM events GROUP BY CUBE(event_type, hour)
"""
    q["event_pivot"] = """
SELECT CAST(date_part('hour', ts) AS INTEGER) AS hour,
  CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
  CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_error,
  CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
  CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
  CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_view
FROM events GROUP BY 1
"""
    q["drop_reconcile"] = """
WITH l AS (SELECT doc_id, n_chars FROM documents WHERE doc_id % 2 = 0),
r AS (SELECT doc_id, n_chars FROM documents WHERE doc_id % 3 = 0),
j AS (
  SELECT CASE WHEN l.doc_id IS NOT NULL AND r.doc_id IS NOT NULL
                THEN 'both'
              WHEN l.doc_id IS NOT NULL THEN 'left_only'
              ELSE 'right_only' END AS status,
         coalesce(l.n_chars, r.n_chars) AS chars
  FROM l FULL JOIN r ON l.doc_id = r.doc_id
)
SELECT status, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(chars) AS BIGINT) AS total_chars
FROM j GROUP BY status
"""
    q["rolling_avg"] = """
WITH w AS (
  SELECT user_id, event_id, ts,
    CAST(round(value*100) AS BIGINT) AS c
  FROM events
)
SELECT user_id, event_id,
  CAST(sum(c) OVER f AS DOUBLE) / (count(c) OVER f) / 100.0 AS ma_value
FROM w WINDOW f AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
"""
    q["co_purchase_pairs"] = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n
  FROM d a JOIN d b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT part_a, part_b, CAST(n AS BIGINT) AS n_orders
FROM p ORDER BY n DESC, part_a, part_b LIMIT 50
"""
    q["lang_quartiles"] = """
SELECT doc_id, lang,
  CAST(ntile(4) OVER (PARTITION BY lang ORDER BY n_chars, doc_id)
       AS BIGINT) AS quartile
FROM documents
"""
    q["event_gaps"] = """
WITH g AS (
  SELECT event_type,
    epoch_us(ts) - lag(epoch_us(ts)) OVER
      (PARTITION BY user_id ORDER BY ts, event_id) AS d
  FROM events
)
SELECT event_type, CAST(count(d) AS BIGINT) AS n_gaps,
       CAST(sum(d) AS DOUBLE) / CAST(count(d) AS DOUBLE) / 1000000.0
         AS avg_gap_sec,
       CAST(max(d) AS DOUBLE) / 1000000.0 AS max_gap_sec
FROM g WHERE d IS NOT NULL GROUP BY event_type
"""
    q["dominant_event_type"] = """
SELECT user_id, event_type, n_events FROM (
  SELECT user_id, event_type,
    CAST(count(*) AS BIGINT) AS n_events,
    row_number() OVER (PARTITION BY user_id
                       ORDER BY count(*) DESC, event_type ASC) AS rn
  FROM events GROUP BY user_id, event_type
) WHERE rn = 1
"""
    q["value_histogram"] = """
SELECT least(greatest(CAST(floor(value/25.0) AS BIGINT), 0), 19) AS bin,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY 1
"""
    q["nation_trade_volume"] = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
  CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
           * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS DOUBLE)
    / 10000.0 AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND s.s_nationkey <> c.c_nationkey
GROUP BY 1, 2
"""
    q["user_retention"] = """
WITH w AS (
  SELECT DISTINCT user_id,
    (epoch_us(ts)//1000000)//86400 AS day
  FROM events
), c AS (
  SELECT user_id, min(day) AS cohort FROM w GROUP BY user_id
)
SELECT CAST(c.cohort AS BIGINT) AS cohort_day,
       CAST(w.day - c.cohort AS BIGINT) AS day_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM w JOIN c ON w.user_id = c.user_id
GROUP BY 1, 2
"""
    q["top_open_orders"] = """
SELECT l.l_orderkey,
  CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
           * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS DOUBLE)
    / 10000.0 AS revenue,
  o.o_orderdate, o.o_orderpriority
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1997-07-01'
  AND l.l_shipdate > TIMESTAMP '1997-07-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
             * (100 - CAST(round(l.l_discount*100) AS BIGINT))) DESC,
         l.l_orderkey ASC
LIMIT 10
"""
    q["special_deal_revenue"] = """
SELECT CAST(coalesce(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
           * (100 - CAST(round(l.l_discount*100) AS BIGINT))), 0)
           AS DOUBLE) / 10000.0 AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size <= 10
       AND l.l_quantity BETWEEN 1 AND 15)
   OR (p.p_brand = 'Brand#12' AND p.p_size <= 20
       AND l.l_quantity BETWEEN 10 AND 25)
   OR (p.p_brand = 'Brand#17' AND p.p_size <= 30
       AND l.l_quantity BETWEEN 25 AND 50)
"""
    q["user_value_running"] = """
WITH w AS (
  SELECT user_id, event_id, ts,
    CAST(round(value*100) AS BIGINT) AS c
  FROM events
)
SELECT user_id, event_id,
  CAST(sum(c) OVER f AS DOUBLE) / 100.0 AS run_value,
  CAST(count(*) OVER f AS BIGINT) AS run_n
FROM w WINDOW f AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING)
"""
    q["distinct_parts_by_supplier"] = """
SELECT l_suppkey, CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts
FROM lineitem GROUP BY l_suppkey
"""
    q["customer_spend_pctile"] = """
WITH s AS (
  SELECT o_custkey AS c_custkey,
    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
)
SELECT s.c_custkey, CAST(c.c_nationkey AS BIGINT) AS c_nationkey,
  CAST(s.cents AS DOUBLE)/100.0 AS spend,
  percent_rank() OVER (PARTITION BY c.c_nationkey
                       ORDER BY s.cents) AS pctile
FROM s JOIN customer c ON s.c_custkey = c.c_custkey
"""
    q["co_purchase_degree"] = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e0 AS (SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y
       FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                        AND a.l_partkey < b.l_partkey),
e AS (SELECT x AS v FROM e0 UNION ALL SELECT y AS v FROM e0),
deg AS (SELECT v, CAST(count(*) AS BIGINT) AS dg FROM e GROUP BY v)
SELECT dg AS degree, CAST(count(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY dg
"""
    q["event_transitions"] = """
WITH w AS (
  SELECT event_type,
    lag(event_type) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n
FROM w WHERE prev_type IS NOT NULL GROUP BY 1, 2
"""
    # corr from exact shifted-integer moments: every moment sum is
    # HUGEINT-exact in DuckDB / Python-int-exact in the engine, and the
    # final float64 ops (CAST, *, sqrt, /) are the identical sequence on
    # both sides, so the comparison is hash-exact (embed_kmeans-style
    # contract).
    q["quantity_price_corr"] = """
WITH m AS (
  SELECT p.p_brand,
    CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(round(l.l_quantity) AS BIGINT) - 25) AS BIGINT) AS sx,
    CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT) - 5000000)
         AS BIGINT) AS sy,
    CAST(sum((CAST(round(l.l_quantity) AS BIGINT) - 25)
        * (CAST(round(l.l_extendedprice*100) AS BIGINT) - 5000000))
         AS BIGINT) AS sxy,
    CAST(sum((CAST(round(l.l_quantity) AS BIGINT) - 25)
        * (CAST(round(l.l_quantity) AS BIGINT) - 25)) AS BIGINT) AS sxx,
    CAST(sum((CAST(round(l.l_extendedprice*100) AS BIGINT) - 5000000)
        * (CAST(round(l.l_extendedprice*100) AS BIGINT) - 5000000))
         AS BIGINT) AS syy
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand)
SELECT p_brand, n,
  CASE WHEN CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE) > 0
        AND CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
              - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE) > 0 THEN
    (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
       - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
      / sqrt((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
             * (CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
                  - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)))
  ELSE NULL END AS corr_qty_price
FROM m
"""
    q["important_parts"] = """
WITH s AS (
  SELECT l_partkey, sum(CAST(round(l_extendedprice*100) AS BIGINT)
        * (100 - CAST(round(l_discount*100) AS BIGINT))) AS c2
  FROM lineitem GROUP BY l_partkey
), tot AS (SELECT sum(c2) AS t FROM s)
SELECT s.l_partkey AS p_partkey,
  CAST(s.c2 AS DOUBLE)/10000.0 AS part_revenue,
  CAST(s.c2 AS DOUBLE) / CAST(tot.t AS DOUBLE) AS rev_share
FROM s, tot WHERE s.c2 > (3 * tot.t) // 4000
"""
    q["nation_market_share"] = """
WITH j AS (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
    CAST(round(l.l_extendedprice*100) AS BIGINT)
      * (100 - CAST(round(l.l_discount*100) AS BIGINT)) AS c2,
    (s.s_nationkey = 3) AS is_t
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE r.r_name = 'EUROPE'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate < TIMESTAMP '1998-01-01'
)
SELECT o_year,
  CAST(sum(CASE WHEN is_t THEN c2 ELSE 0 END) AS DOUBLE)/10000.0
    AS nation_revenue,
  CAST(sum(c2) AS DOUBLE)/10000.0 AS total_revenue,
  CAST(sum(CASE WHEN is_t THEN c2 ELSE 0 END) AS DOUBLE)
    / CAST(sum(c2) AS DOUBLE) AS mkt_share
FROM j GROUP BY o_year
"""
    q["min_cost_supplier"] = """
WITH qp AS (SELECT p_partkey, p_name FROM part WHERE p_size = 15),
c AS (SELECT l.l_partkey, l.l_suppkey,
        CAST(round(l.l_extendedprice*100) AS BIGINT) AS cents
      FROM lineitem l JOIN qp ON l.l_partkey = qp.p_partkey),
m AS (SELECT l_partkey, l_suppkey, cents,
        row_number() OVER (PARTITION BY l_partkey
                           ORDER BY cents, l_suppkey) AS rn
      FROM c)
SELECT m.l_partkey AS p_partkey, qp.p_name,
  CAST(m.cents AS DOUBLE)/100.0 AS min_cost,
  m.l_suppkey AS s_suppkey, s.s_name, n.n_name
FROM m JOIN qp ON m.l_partkey = qp.p_partkey
JOIN supplier s ON m.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE rn = 1
"""
    # Integer fixed-point PageRank, 3 iterations unrolled — the engine's
    # page_rank_copurchase spells the identical integer spec
    # (pr0 = scale//N; pr' = (15*base)//100 + (85*Σ pr//deg)//100), so
    # the comparison is hash-exact despite the iterative float-free
    # algorithm (same contract style as the embed_kmeans oracle).
    q["page_rank"] = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e0 AS (SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y
       FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                        AND a.l_partkey < b.l_partkey),
e AS (SELECT x, y FROM e0 UNION ALL SELECT y AS x, x AS y FROM e0),
deg AS (SELECT x AS v, CAST(count(*) AS BIGINT) AS dg FROM e GROUP BY x),
base AS (SELECT CAST(1000000000000 // count(*) AS BIGINT) AS b FROM deg),
pr0 AS (SELECT v, (SELECT b FROM base) AS pr FROM deg),
s1 AS (SELECT e.y AS v, sum(p.pr // g.dg) AS s
       FROM e JOIN pr0 p ON e.x = p.v JOIN deg g ON e.x = g.v
       GROUP BY e.y),
pr1 AS (SELECT g.v, CAST((15 * (SELECT b FROM base)) // 100
          + (85 * coalesce(s1.s, 0)) // 100 AS BIGINT) AS pr
        FROM deg g LEFT JOIN s1 ON g.v = s1.v),
s2 AS (SELECT e.y AS v, sum(p.pr // g.dg) AS s
       FROM e JOIN pr1 p ON e.x = p.v JOIN deg g ON e.x = g.v
       GROUP BY e.y),
pr2 AS (SELECT g.v, CAST((15 * (SELECT b FROM base)) // 100
          + (85 * coalesce(s2.s, 0)) // 100 AS BIGINT) AS pr
        FROM deg g LEFT JOIN s2 ON g.v = s2.v),
s3 AS (SELECT e.y AS v, sum(p.pr // g.dg) AS s
       FROM e JOIN pr2 p ON e.x = p.v JOIN deg g ON e.x = g.v
       GROUP BY e.y),
pr3 AS (SELECT g.v, CAST((15 * (SELECT b FROM base)) // 100
          + (85 * coalesce(s3.s, 0)) // 100 AS BIGINT) AS pr
        FROM deg g LEFT JOIN s3 ON g.v = s3.v)
SELECT v AS part_id, pr AS pr_score FROM pr3
"""
    # Q9-shaped profit: retail price stands in for supply cost (no
    # partsupp table in this corpus).  Profit per row is an exact
    # 1e-4-dollar integer; the sum is CAST to BIGINT before the one
    # float division (HUGEINT trap, CLAUDE.md invariant #4).
    q["product_profit"] = """
WITH pf AS (
  SELECT s.s_nationkey, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
    CAST(round(l.l_extendedprice*100) AS BIGINT)
      * (100 - CAST(round(l.l_discount*100) AS BIGINT))
    - CAST(round(p.p_retailprice*100) AS BIGINT)
      * CAST(round(l.l_quantity*100) AS BIGINT) AS profit_c4
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE p.p_name LIKE '%red%'
)
SELECT n.n_name AS nation, pf.o_year,
  CAST(CAST(sum(pf.profit_c4) AS BIGINT) AS DOUBLE)/10000.0 AS profit
FROM pf JOIN nation n ON pf.s_nationkey = n.n_nationkey
GROUP BY n.n_name, pf.o_year
"""
    q["action_trigrams"] = """
WITH w AS (
  SELECT event_type,
    lag(event_type, 1) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS p1,
    lag(event_type, 2) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS p2
  FROM events
)
SELECT p2 AS t0, p1 AS t1, event_type AS t2,
  CAST(count(*) AS BIGINT) AS n
FROM w WHERE p2 IS NOT NULL GROUP BY 1, 2, 3
"""
    # Q17-shaped correlated filter: the 0.2x-avg compare is the exact
    # integer inequality 5*qty_c*n < sum_qty_c on both sides.
    q["small_qty_revenue"] = """
WITH pk AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#13'),
l AS (SELECT l_partkey,
        CAST(round(l_quantity*100) AS BIGINT) AS qc,
        CAST(round(l_extendedprice*100) AS BIGINT) AS rc
      FROM lineitem JOIN pk ON l_partkey = pk.p_partkey),
st AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(qc) AS BIGINT) AS sq FROM l GROUP BY l_partkey)
SELECT CAST(count(*) AS BIGINT) AS n_small,
  CAST(CAST(coalesce(sum(l.rc), 0) AS BIGINT) AS DOUBLE)/100.0
    AS total_revenue,
  CAST(CAST(coalesce(sum(l.rc), 0) AS BIGINT) AS DOUBLE)/100.0/7.0
    AS avg_yearly
FROM l JOIN st ON l.l_partkey = st.l_partkey
WHERE 5 * l.qc * st.n < st.sq
"""
    q["monthly_growth"] = """
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS month,
    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS c
  FROM orders GROUP BY 1
)
SELECT CAST(month AS TIMESTAMP) AS month,
  CAST(c AS DOUBLE)/100.0 AS revenue,
  CAST(c AS DOUBLE) / CAST(lag(c) OVER (ORDER BY month) AS DOUBLE)
    AS mom_ratio
FROM m
"""
    # Per-lang z-score from exact BIGINT moments; the variance guard is
    # an exact HUGEINT compare, and every float op is a double product
    # of the BIGINT moments (never a >2^63 int->double cast) in the
    # identical sequence the engine runs — hash-exact.
    q["doc_length_zscore"] = """
WITH st AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS s,
    CAST(sum(CAST(n_chars AS BIGINT)*CAST(n_chars AS BIGINT)) AS BIGINT)
      AS ss
  FROM documents GROUP BY lang
)
SELECT d.doc_id, d.lang,
  CASE WHEN st.n > 1
        AND CAST(st.n AS HUGEINT)*st.ss - CAST(st.s AS HUGEINT)*st.s > 0
  THEN (CAST(d.n_chars AS DOUBLE)*CAST(st.n AS DOUBLE)
          - CAST(st.s AS DOUBLE))
       / (CAST(st.n AS DOUBLE)
          * sqrt((CAST(st.n AS DOUBLE)*CAST(st.ss AS DOUBLE)
                    - CAST(st.s AS DOUBLE)*CAST(st.s AS DOUBLE))
                 / (CAST(st.n AS DOUBLE)*(CAST(st.n AS DOUBLE)-1.0))))
  ELSE NULL END AS z
FROM documents d JOIN st ON d.lang = st.lang
"""
    # Grouped MAD with DuckDB quantile_disc (element at
    # floor((n-1)/2)) in exact integer cents on both sides.
    q["value_mad_by_type"] = """
WITH c AS (
  SELECT event_type, CAST(round(value*100) AS BIGINT) AS c
  FROM events
),
m AS (
  SELECT event_type, c,
    quantile_disc(c, 0.5) OVER (PARTITION BY event_type) AS med
  FROM c
)
SELECT event_type,
  CAST(quantile_disc(c, 0.5) AS DOUBLE)/100.0 AS median_value,
  CAST(quantile_disc(abs(c - med), 0.5) AS DOUBLE)/100.0 AS mad_value
FROM m GROUP BY event_type
"""
    q["cohort_revenue"] = """
WITH w AS (
  SELECT date_trunc('month', o_orderdate) AS month,
    CAST(round(o_totalprice*100) AS BIGINT) AS c,
    min(date_trunc('month', o_orderdate))
      OVER (PARTITION BY o_custkey) AS cohort
  FROM orders
)
SELECT CAST(cohort AS TIMESTAMP) AS cohort,
  CAST(month AS TIMESTAMP) AS month,
  CAST(CAST(sum(c) AS BIGINT) AS DOUBLE)/100.0 AS revenue,
  CAST(count(*) AS BIGINT) AS n_orders
FROM w GROUP BY cohort, month
"""
    # Reciprocal-rank fusion of the two oracle-checked retrieval legs,
    # nested verbatim so any leg fix propagates; the RRF score is the
    # same two-term double sum the engine computes.
    q["hybrid_search"] = f"""
WITH b AS (SELECT doc_id, rank FROM ({q["bm25_search"]})),
v AS (SELECT vec_id AS doc_id, rank FROM ({q["ann_topk"]})
      WHERE query_id = 0),
f AS (
  SELECT coalesce(b.doc_id, v.doc_id) AS doc_id,
    coalesce(1.0/(60 + b.rank), 0.0)
      + coalesce(1.0/(60 + v.rank), 0.0) AS rrf_score
  FROM b FULL JOIN v ON b.doc_id = v.doc_id
),
r AS (SELECT doc_id, rrf_score,
        CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id)
             AS BIGINT) AS rank
      FROM f)
SELECT doc_id, rrf_score, rank FROM r WHERE rank <= 10
"""
    # Weighted median: crossing rule 2*cum >= total in exact integers;
    # order-independent under price ties (see q_weighted_median_price).
    q["weighted_median_price"] = """
WITH l AS (
  SELECT p.p_brand,
    CAST(round(l.l_extendedprice*100) AS BIGINT) AS pc_,
    CAST(round(l.l_quantity*100) AS BIGINT) AS qc
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
w AS (
  SELECT p_brand, pc_,
    sum(qc) OVER (PARTITION BY p_brand ORDER BY pc_
                  ROWS UNBOUNDED PRECEDING) AS cw,
    sum(qc) OVER (PARTITION BY p_brand) AS tw
  FROM l
)
SELECT p_brand,
  CAST(min(pc_) AS DOUBLE)/100.0 AS w_median_price
FROM w WHERE 2*cw >= tw GROUP BY p_brand
"""
    q["lang_confusion"] = (
        "SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n_docs "
        "FROM (" + q["lang_id"] + ") GROUP BY lang, lang_pred"
    )
    # gap sessionization (30 min) composed with count-of-counts; the
    # session id is the window cumsum of gap-break flags, ordered by
    # (ts, event_id) exactly as the engine's per-part lexsort.
    q["session_duration_hist"] = """
WITH w AS (
  SELECT user_id,
    CASE WHEN epoch_us(ts) - epoch_us(
      lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
      > 1800000000 OR lag(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) IS NULL
    THEN 1 ELSE 0 END AS brk,
    ts, event_id
  FROM events
),
s AS (
  SELECT user_id, epoch_us(ts) AS tus,
    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS sess
  FROM w
),
c AS (
  SELECT CAST((max(tus) - min(tus)) // 60000000 AS BIGINT)
    AS duration_min
  FROM s GROUP BY user_id, sess
)
SELECT duration_min, CAST(count(*) AS BIGINT) AS n_sessions
FROM c GROUP BY duration_min
"""
    q["session_length_hist"] = """
WITH w AS (
  SELECT user_id,
    CASE WHEN epoch_us(ts) - epoch_us(
      lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
      > 1800000000 OR lag(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) IS NULL
    THEN 1 ELSE 0 END AS brk,
    ts, event_id
  FROM events
),
s AS (
  SELECT user_id,
    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS sess
  FROM w
),
c AS (
  SELECT user_id, sess, CAST(count(*) AS BIGINT) AS session_len
  FROM s GROUP BY user_id, sess
)
SELECT session_len, CAST(count(*) AS BIGINT) AS n_sessions
FROM c GROUP BY session_len
"""
    q["order_gap_median_hist"] = """
WITH w AS (
  SELECT o_custkey,
    epoch_us(o_orderdate) - epoch_us(
      lag(o_orderdate) OVER (PARTITION BY o_custkey
                             ORDER BY o_orderdate, o_orderkey)) AS gap
  FROM orders
),
m AS (
  SELECT o_custkey, quantile_disc(gap, 0.5) AS med
  FROM w WHERE gap IS NOT NULL GROUP BY o_custkey
)
SELECT CAST(med // 86400000000 AS BIGINT) AS gap_days,
  CAST(count(*) AS BIGINT) AS n_customers
FROM m GROUP BY 1
"""
    q["dup_rate_by_source"] = """
WITH g AS (
  SELECT source, text, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY source, text
)
SELECT source, CAST(sum(n) AS BIGINT) AS n_docs,
  CAST(count(*) AS BIGINT) AS n_distinct,
  1.0 - CAST(count(*) AS BIGINT) / CAST(CAST(sum(n) AS BIGINT)
                                        AS DOUBLE) AS dup_rate
FROM g GROUP BY source
"""
    q["customer_spend_deciles"] = """
WITH s AS (
  SELECT o_custkey AS c_custkey,
    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS c
  FROM orders GROUP BY o_custkey
),
w AS (
  SELECT c, ntile(10) OVER (ORDER BY c, c_custkey) AS tile FROM s
),
t AS (SELECT CAST(sum(c) AS BIGINT) AS tot FROM s)
SELECT CAST(tile AS BIGINT) AS decile,
  CAST(count(*) AS BIGINT) AS n_customers,
  CAST(CAST(sum(w.c) AS BIGINT) AS DOUBLE)/100.0 AS revenue,
  CAST(CAST(sum(w.c) AS BIGINT) AS DOUBLE) / CAST(t.tot AS DOUBLE)
    AS rev_share
FROM w, t GROUP BY tile, t.tot
"""
    q["order_linecount_hist"] = """
WITH c AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines
  FROM lineitem GROUP BY l_orderkey
)
SELECT n_lines, CAST(count(*) AS BIGINT) AS n_orders
FROM c GROUP BY n_lines
"""
    # spike rule in exact integers: n * cnt_prev > 2 * sum_prev over
    # the prior seven OBSERVED days (rows, not calendar)
    q["traffic_anomaly_days"] = """
WITH d AS (
  SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
w AS (
  SELECT day, n,
    CAST(coalesce(sum(n) OVER (ORDER BY day
      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS sp,
    CAST(count(n) OVER (ORDER BY day
      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) AS cp
  FROM d
)
SELECT CAST(day AS TIMESTAMP) AS day, n AS n_events,
  (cp > 0 AND n * cp > 2 * sp) AS is_spike
FROM w
"""
    q["conversion_delay"] = """
WITH a AS (SELECT user_id, ts FROM events WHERE event_type = 'error'),
b AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
d AS (
  SELECT (SELECT min(b.ts) FROM b
          WHERE b.user_id = a.user_id AND b.ts > a.ts) AS nts, a.ts
  FROM a
),
e AS (SELECT CAST(epoch_us(nts) - epoch_us(ts) AS BIGINT) AS du
      FROM d WHERE nts IS NOT NULL)
SELECT CAST(count(*) AS BIGINT) AS n_conversions,
  CAST(CAST(sum(du) AS BIGINT) AS DOUBLE)
    / CAST(count(*) AS DOUBLE) / 1000000.0 AS mean_delay_sec,
  CAST(min(du) AS DOUBLE)/1000000.0 AS min_delay_sec,
  CAST(max(du) AS DOUBLE)/1000000.0 AS max_delay_sec
FROM e
"""
    q["followed_within"] = """
WITH a AS (SELECT user_id, ts FROM events WHERE event_type = 'error'),
b AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
m AS (
  SELECT a.user_id,
    EXISTS (SELECT 1 FROM b WHERE b.user_id = a.user_id
            AND b.ts > a.ts
            AND b.ts <= a.ts + INTERVAL 1 HOUR) AS hit
  FROM a
)
SELECT CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
         AS n_matched_events,
  CAST(count(DISTINCT CASE WHEN hit THEN user_id END) AS BIGINT)
         AS n_matched_users
FROM m
"""
    q["rolling_dau"] = """
WITH pairs AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
),
days AS (SELECT DISTINCT d FROM pairs)
SELECT CAST(days.d AS TIMESTAMP) AS day,
  CAST(count(DISTINCT p.user_id) AS BIGINT) AS active_users
FROM days JOIN pairs p
  ON p.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
GROUP BY days.d
"""
    q["user_event_sets"] = """
WITH a AS (SELECT DISTINCT user_id FROM events
           WHERE event_type = 'purchase'),
b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error'),
i AS (SELECT user_id FROM a INTERSECT SELECT user_id FROM b),
ea AS (SELECT user_id FROM a EXCEPT SELECT user_id FROM b),
eb AS (SELECT user_id FROM b EXCEPT SELECT user_id FROM a)
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM a) AS n_purchase_users,
  (SELECT CAST(count(*) AS BIGINT) FROM b) AS n_error_users,
  (SELECT CAST(count(*) AS BIGINT) FROM i) AS n_both,
  (SELECT CAST(count(*) AS BIGINT) FROM ea) AS n_purchase_only,
  (SELECT CAST(count(*) AS BIGINT) FROM eb) AS n_error_only
"""
    q["keyword_hits"] = """
WITH kw AS (
  SELECT unnest(['hash join', 'window', 'stream', 'merge part',
                 'spark']) AS keyword
)
SELECT kw.keyword,
  CAST(coalesce(sum(CASE WHEN contains(d.text, kw.keyword)
                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_docs
FROM kw LEFT JOIN documents d ON TRUE
GROUP BY kw.keyword
"""
    q["weekday_profile"] = """
SELECT CAST(dayofweek(o_orderdate) AS BIGINT) AS dow,
  CAST(count(*) AS BIGINT) AS n_orders,
  CAST(CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
       AS DOUBLE)/100.0 AS revenue
FROM orders GROUP BY dow
"""
    q["customers_per_supplier"] = """
SELECT l.l_suppkey AS s_suppkey,
  CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_customers
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY l.l_suppkey
"""
    q["full_coverage_suppliers"] = """
WITH sr AS (
  SELECT DISTINCT l.l_suppkey, n.n_regionkey
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
)
SELECT l_suppkey AS s_suppkey, CAST(count(*) AS BIGINT) AS n_regions
FROM sr GROUP BY l_suppkey
HAVING count(*) = (SELECT count(*) FROM region)
"""
    # Pareto dominance: B dominates A when both criteria <= and one
    # strict; price compares in exact integer cents on both sides.
    q["part_skyline"] = """
SELECT a.p_partkey, a.p_brand, CAST(a.p_size AS BIGINT) AS p_size,
  CAST(CAST(round(a.p_retailprice*100) AS BIGINT) AS DOUBLE)/100.0
    AS p_retailprice
FROM part a
WHERE NOT EXISTS (
  SELECT 1 FROM part b
  WHERE b.p_brand = a.p_brand AND b.p_partkey <> a.p_partkey
    AND b.p_size <= a.p_size
    AND CAST(round(b.p_retailprice*100) AS BIGINT)
          <= CAST(round(a.p_retailprice*100) AS BIGINT)
    AND (b.p_size < a.p_size
         OR CAST(round(b.p_retailprice*100) AS BIGINT)
              < CAST(round(a.p_retailprice*100) AS BIGINT))
)
"""
    q["order_value_deciles"] = """
WITH w AS (
  SELECT CAST(round(o_totalprice*100) AS BIGINT) AS c,
    ntile(10) OVER (ORDER BY CAST(round(o_totalprice*100) AS BIGINT),
                    o_orderkey) AS tile
  FROM orders
)
SELECT CAST(tile AS BIGINT) AS decile,
  CAST(count(*) AS BIGINT) AS n_orders,
  CAST(CAST(sum(c) AS BIGINT) AS DOUBLE)/100.0 AS revenue
FROM w GROUP BY tile
"""
    q["repeat_order_share"] = """
WITH w AS (
  SELECT date_trunc('month', o_orderdate) AS month,
    row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
)
SELECT CAST(month AS TIMESTAMP) AS month,
  CAST(count(*) AS BIGINT) AS n_orders,
  CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeat,
  CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(count(*) AS DOUBLE) AS repeat_share
FROM w GROUP BY month
"""
    # Q15-shaped global-max supplier; the tie filter compares exact
    # integer revenue (c2 CAST to BIGINT before anything floats).
    q["top_supplier"] = """
WITH r AS (
  SELECT l_suppkey AS s_suppkey,
    CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
      * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS c2
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT r.s_suppkey, s.s_name,
  CAST(r.c2 AS DOUBLE)/10000.0 AS total_revenue
FROM r JOIN supplier s ON r.s_suppkey = s.s_suppkey
WHERE r.c2 = (SELECT max(c2) FROM r)
"""
    # A-ES weighted sample (r5): identical splitmix64 + u mapping +
    # ln-key, keys rounded to 6 dp before ranking (BM25 ln discipline)
    from rayslog.pipeline import AES_K, AES_SEED
    from rayslog.stages.sample import sample_sql_hash_expr

    _aes_h = sample_sql_hash_expr("doc_id", AES_SEED)
    q["weighted_sample"] = f"""
WITH t AS (
  SELECT doc_id,
    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
    {_aes_h} AS h
  FROM documents
),
w AS (
  SELECT doc_id, n_tokens,
    round(ln((CAST(h AS DOUBLE) + 0.5) / 18446744073709551616.0)
          / CAST(n_tokens AS DOUBLE), 6) AS skey
  FROM t WHERE n_tokens >= 1
)
SELECT doc_id, n_tokens, skey, CAST(rank AS BIGINT) AS rank FROM (
  SELECT doc_id, n_tokens, skey,
    row_number() OVER (ORDER BY skey DESC, doc_id) AS rank
  FROM w)
WHERE rank <= {AES_K}
"""
    # prefix-bucket fuzzy dedup by exact edit distance (r5): the
    # bucket-local candidate rule is part of the contract (like
    # cosine_dups_ivf), levenshtein() verifies exactly on both sides
    q["levenshtein_pairs"] = """
WITH d AS (
  SELECT doc_id, text, substr(text, 1, 16) AS p FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
FROM d a JOIN d b ON a.p = b.p AND a.doc_id < b.doc_id
WHERE levenshtein(a.text, b.text) <= 100
"""
    # DENSE_RANK with shared ties (r5): balances compare in exact
    # integer cents; the double output is cents/100.0 on both sides
    q["supplier_balance_rank"] = """
WITH s AS (
  SELECT s_suppkey, CAST(s_nationkey AS BIGINT) AS s_nationkey,
    CAST(round(s_acctbal * 100) AS BIGINT) AS cents
  FROM supplier
)
SELECT s_suppkey, s_nationkey,
  CAST(cents AS DOUBLE) / 100.0 AS s_acctbal,
  CAST(dense_rank() OVER
    (PARTITION BY s_nationkey ORDER BY cents DESC) AS BIGINT)
    AS bal_rank
FROM s
"""
    # PERCENTILE_CONT (r5): DuckDB quantile_cont over the same values;
    # the engine mirrors the h = q*(n-1) interpolation in float64
    q["value_median_cont"] = """
SELECT 'p25' AS q, quantile_cont(value, 0.25) AS value FROM events
UNION ALL
SELECT 'p50', quantile_cont(value, 0.50) FROM events
UNION ALL
SELECT 'p75', quantile_cont(value, 0.75) FROM events
UNION ALL
SELECT 'p90', quantile_cont(value, 0.90) FROM events
"""
    # train/val/test hash split report (r5): the same splitmix64 SQL +
    # integer thresholds as the stratified sampler
    from rayslog.pipeline import SPLIT_RATES, SPLIT_SEED
    from rayslog.stages.sample import rate_threshold as _rt

    _split_h = sample_sql_hash_expr("doc_id", SPLIT_SEED)
    q["dataset_split"] = f"""
WITH a AS (
  SELECT
    CASE WHEN {_split_h} < {_rt(SPLIT_RATES[0])} THEN 'test'
         WHEN {_split_h} < {_rt(SPLIT_RATES[1])} THEN 'val'
         ELSE 'train' END AS split,
    lang,
    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT split, lang, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS n_tokens
FROM a GROUP BY split, lang
"""
    # train/holdout vocabulary-skew audit (r5 session 9): per-token doc
    # frequency inside the splitmix64 90% train split vs the holdout,
    # rate ratio in the engine's exact double expression
    q["df_split_drift"] = f"""
WITH s AS (
  SELECT {_split_h} >= {_rt(SPLIT_RATES[1])} AS is_train,
    list_distinct(regexp_extract_all(lower(text), '\\S+')) AS toks
  FROM documents),
tot AS (
  SELECT
    CAST(sum(CASE WHEN is_train THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
    CAST(sum(CASE WHEN is_train THEN 0 ELSE 1 END) AS BIGINT) AS n_rest
  FROM s),
d AS (SELECT is_train, unnest(toks) AS token FROM s),
f AS (
  SELECT token,
    CAST(sum(CASE WHEN is_train THEN 1 ELSE 0 END) AS BIGINT) AS df_train,
    CAST(sum(CASE WHEN is_train THEN 0 ELSE 1 END) AS BIGINT) AS df_rest
  FROM d GROUP BY token)
SELECT f.token, f.df_train, f.df_rest,
  CASE WHEN f.df_rest > 0 AND t.n_train > 0 THEN
    (CAST(f.df_train AS DOUBLE)/CAST(t.n_train AS DOUBLE))
      / (CAST(f.df_rest AS DOUBLE)/CAST(t.n_rest AS DOUBLE))
  ELSE NULL END AS rate_ratio
FROM f, tot t
"""
    # per-user out-of-order audit (r5): exact inversion counts — the
    # strict self-join pair count the mergesort kernel computes
    q["event_inversions"] = """
WITH inv AS (
  SELECT a.user_id, CAST(count(*) AS BIGINT) AS n_inversions
  FROM events a JOIN events b
    ON a.user_id = b.user_id AND a.event_id < b.event_id
   AND a.ts > b.ts
  GROUP BY a.user_id
),
u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY user_id)
SELECT u.user_id, u.n_events,
  COALESCE(inv.n_inversions, 0) AS n_inversions
FROM u LEFT JOIN inv USING (user_id)
"""
    # LAG-gap throttle dedup returning rows (r5): keep first-of-stream
    # or gap > 1h; (user, type, ts, event_id) order is total
    q["event_throttle"] = """
WITH l AS (
  SELECT event_id, user_id, event_type,
    ts - lag(ts) OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS gap
  FROM events
)
SELECT event_id, user_id, event_type FROM l
WHERE gap IS NULL OR gap > INTERVAL 1 HOUR
"""
    # grouped PERCENTILE_CONT (r5): same interpolation expression as
    # value_median_cont, per event_type
    q["value_quartiles_by_type"] = """
SELECT event_type, 'p25' AS q, quantile_cont(value, 0.25) AS value
FROM events GROUP BY event_type
UNION ALL
SELECT event_type, 'p50', quantile_cont(value, 0.50)
FROM events GROUP BY event_type
UNION ALL
SELECT event_type, 'p75', quantile_cont(value, 0.75)
FROM events GROUP BY event_type
"""
    # user acquisition curve: first-seen day -> new users -> running
    # cumulative (r5)
    q["daily_new_users"] = """
WITH f AS (SELECT user_id, min(ts) AS first_ts FROM events
           GROUP BY user_id),
d AS (
  SELECT CAST(date_trunc('day', first_ts) AS TIMESTAMP) AS day,
         CAST(count(*) AS BIGINT) AS n_new
  FROM f GROUP BY 1
)
SELECT day, n_new,
  CAST(sum(n_new) OVER (ORDER BY day) AS BIGINT) AS cum_users
FROM d
"""
    # Q21-shaped sole-late-supplier (r5): late = ship > orderdate+90d,
    # finished multi-supplier orders with exactly one late supplier
    q["sole_late_supplier"] = """
WITH f AS (SELECT o_orderkey, o_orderdate FROM orders
           WHERE o_orderstatus = 'F'),
j AS (
  SELECT l.l_orderkey, l.l_suppkey,
    CAST(l.l_shipdate > f.o_orderdate + INTERVAL 90 DAY AS INT) AS late
  FROM lineitem l JOIN f ON l.l_orderkey = f.o_orderkey
),
p AS (SELECT l_orderkey, l_suppkey, max(late) AS late
      FROM j GROUP BY l_orderkey, l_suppkey),
o AS (SELECT l_orderkey, count(*) AS n_supp, sum(late) AS n_late
      FROM p GROUP BY l_orderkey),
w AS (
  SELECT p.l_suppkey
  FROM p JOIN o USING (l_orderkey)
  WHERE p.late = 1 AND o.n_supp >= 2 AND o.n_late = 1
)
SELECT s.s_suppkey, s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM w JOIN supplier s ON s.s_suppkey = w.l_suppkey
GROUP BY s.s_suppkey, s.s_name
"""
    # Q6-shaped filter-aggregate: revenue as exact 1e-4-dollar integer
    # (cents x cents) on both sides; the discount band compares rounded
    # cent integers, never a float threshold
    q["forecast_revenue"] = """
SELECT
  CAST(CAST(coalesce(sum(
      CAST(round(l_extendedprice*100) AS BIGINT)
      * CAST(round(l_discount*100) AS BIGINT)), 0) AS BIGINT)
    AS DOUBLE)/10000.0 AS revenue,
  CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate < TIMESTAMP '1996-01-01'
  AND CAST(round(l_discount*100) AS BIGINT) BETWEEN 5 AND 7
  AND CAST(round(l_quantity*100) AS BIGINT) < 2400
"""
    # Q12-adapted: late (>90 days after order date) lineitem share per
    # order priority; the compare is exact integer microseconds
    q["late_shipments"] = """
WITH j AS (
  SELECT o_orderpriority,
    CAST(l_shipdate > o_orderdate + INTERVAL 90 DAY AS BIGINT) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT o_orderpriority,
  CAST(count(*) AS BIGINT) AS n_total,
  CAST(sum(late) AS BIGINT) AS n_late,
  CAST(CAST(sum(late) AS BIGINT) AS DOUBLE)
    / CAST(count(*) AS DOUBLE) AS late_share
FROM j GROUP BY o_orderpriority
"""
    # blocking-quality audit for the 8-token-prefix dedup key
    q["prefix_blocking_stats"] = r"""
WITH p AS (
  SELECT array_to_string(
    array_slice(regexp_extract_all(lower(text), '\S+'), 1, 8), ' ')
    AS prefix
  FROM documents WHERE text IS NOT NULL
),
g AS (SELECT prefix, CAST(count(*) AS BIGINT) AS s FROM p GROUP BY prefix)
SELECT CAST(count(*) AS BIGINT) AS n_groups,
  CAST(coalesce(sum(CASE WHEN s > 1 THEN 1 ELSE 0 END), 0) AS BIGINT)
    AS n_multi_groups,
  CAST(coalesce(sum(s*(s-1)//2), 0) AS BIGINT) AS candidate_pairs,
  CAST(coalesce(max(s), 0) AS BIGINT) AS max_group
FROM g
"""
    # per-vector L2 norm; list_sum's left-fold float order mirrored
    q["embedding_norms"] = """
SELECT vec_id,
  sqrt(list_sum(list_transform(embedding,
    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
FROM embeddings
"""
    # per-doc dominant token (ties -> lexicographically smallest)
    q["doc_top_token"] = r"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS token
  FROM documents
),
c AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS n FROM tok
      GROUP BY doc_id, token),
r AS (SELECT doc_id, token, n,
        row_number() OVER (PARTITION BY doc_id
          ORDER BY n DESC, token) AS rn
      FROM c)
SELECT d.doc_id, r.token AS top_token, r.n AS n_occurrences
FROM documents d LEFT JOIN r ON d.doc_id = r.doc_id AND r.rn = 1
"""
    # RFM features: recency (days to stream end), frequency, monetary
    q["customer_rfm"] = """
WITH m AS (SELECT epoch_us(max(o_orderdate))//86400000000 AS end_day
           FROM orders),
u AS (
  SELECT o_custkey AS c_custkey,
    epoch_us(max(o_orderdate))//86400000000 AS last_day,
    CAST(count(*) AS BIGINT) AS frequency,
    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS mc
  FROM orders GROUP BY o_custkey
)
SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
  CAST(end_day - last_day AS BIGINT) AS recency_days,
  frequency,
  CAST(mc AS DOUBLE)/100.0 AS monetary
FROM u CROSS JOIN m
"""
    # per-brand return rate (broadcast part dim, conditional counts)
    q["brand_return_rate"] = """
WITH j AS (
  SELECT p_brand, CAST(l_returnflag = 'R' AS BIGINT) AS r
  FROM lineitem JOIN part ON l_partkey = p_partkey
)
SELECT p_brand, CAST(count(*) AS BIGINT) AS n_items,
  CAST(sum(r) AS BIGINT) AS n_returned,
  CAST(CAST(sum(r) AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE)
    AS return_rate
FROM j GROUP BY p_brand
"""
    # churn audit: users idle for > 24h before the stream's end
    q["idle_users"] = """
WITH m AS (SELECT max(ts) AS mx FROM events),
u AS (SELECT user_id, max(ts) AS last_ts FROM events GROUP BY user_id)
SELECT user_id, last_ts FROM u CROSS JOIN m
WHERE epoch_us(last_ts) < epoch_us(mx) - 86400000000
"""
    # top-3 rows per type by value (row_number, cents-exact ordering)
    q["top_value_events_per_type"] = """
WITH r AS (
  SELECT event_type, event_id, value,
    row_number() OVER (PARTITION BY event_type
      ORDER BY CAST(round(value*100) AS BIGINT) DESC, event_id) AS rn
  FROM events
)
SELECT event_type, event_id, value FROM r WHERE rn <= 3
"""
    # hierarchical ROLLUP: (region, nation) revenue + subtotals
    q["region_nation_rollup"] = """
WITH j AS (
  SELECT r_name, n_name, CAST(round(o_totalprice*100) AS BIGINT) AS c
  FROM orders JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
)
SELECT r_name, n_name,
  CAST(CAST(sum(c) AS BIGINT) AS DOUBLE)/100.0 AS revenue
FROM j GROUP BY ROLLUP (r_name, n_name)
"""
    # join -> grouped inverse-CDF: p50/p95 ship latency per priority
    q["ship_latency_quantiles"] = """
WITH j AS (
  SELECT o_orderpriority,
    epoch_us(l_shipdate)//86400000000
      - epoch_us(o_orderdate)//86400000000 AS v
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
c AS (SELECT o_orderpriority, v, count(*) AS n FROM j GROUP BY 1, 2),
w AS (
  SELECT o_orderpriority, v,
    sum(n) OVER (PARTITION BY o_orderpriority ORDER BY v) AS cum,
    sum(n) OVER (PARTITION BY o_orderpriority) AS tot
  FROM c
)
SELECT o_orderpriority, 'p50' AS q, CAST(min(v) AS DOUBLE) AS value
FROM w WHERE cum >= ceil(0.5 * tot) GROUP BY o_orderpriority
UNION ALL
SELECT o_orderpriority, 'p95', CAST(min(v) AS DOUBLE)
FROM w WHERE cum >= ceil(0.95 * tot) GROUP BY o_orderpriority
"""
    # exact empirical CDF at fixed probes (calibration curve)
    q["value_ecdf_probes"] = """
WITH c AS (SELECT CAST(round(value*100) AS BIGINT) AS c FROM events),
p AS (SELECT unnest([1000, 2500, 5000, 10000, 25000]) AS probe),
s AS (
  SELECT p.probe,
    CAST(count(*) FILTER (WHERE c.c <= p.probe) AS BIGINT) AS n_le,
    CAST(count(*) AS BIGINT) AS n_total
  FROM p CROSS JOIN c GROUP BY p.probe
)
SELECT CAST(probe AS DOUBLE)/100.0 AS probe_value, n_le,
  CAST(n_le AS DOUBLE) / CAST(n_total AS DOUBLE) AS cdf
FROM s
"""
    # MAU: exact distinct ordering customers per month
    q["monthly_active_customers"] = """
SELECT date_trunc('month', o_orderdate) AS month,
  CAST(count(DISTINCT o_custkey) AS BIGINT) AS active_customers
FROM orders GROUP BY 1
"""
    # PERCENT_RANK (rank-with-gaps) of supplier balance within nation
    q["supplier_balance_pctrank"] = """
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_nationkey,
  percent_rank() OVER (PARTITION BY s_nationkey
    ORDER BY CAST(round(s_acctbal*100) AS BIGINT)) AS pct_rank
FROM supplier
"""
    # scalar 1-NN by sorted adjacency: nearest doc by n_chars within
    # lang; |diff| ties go to the sort-order predecessor
    q["length_neighbor"] = """
WITH w AS (
  SELECT doc_id, lang, n_chars,
    lag(doc_id)  OVER o AS pid, lag(n_chars)  OVER o AS pn,
    lead(doc_id) OVER o AS nid, lead(n_chars) OVER o AS nn
  FROM documents
  WINDOW o AS (PARTITION BY lang ORDER BY n_chars, doc_id)
)
SELECT doc_id, lang,
  CASE WHEN pid IS NULL AND nid IS NULL THEN NULL
       WHEN pid IS NULL THEN nid
       WHEN nid IS NULL THEN pid
       WHEN abs(n_chars - pn) <= abs(n_chars - nn) THEN pid
       ELSE nid END AS neighbor_id
FROM w
"""
    # frame-window max: last-5-values rolling maximum per user
    q["rolling_max"] = """
WITH w AS (
  SELECT user_id, event_id, ts,
    CAST(round(value*100) AS BIGINT) AS c
  FROM events
)
SELECT user_id, event_id,
  CAST(max(c) OVER f AS DOUBLE) / 100.0 AS max5_value
FROM w WINDOW f AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
"""
    # typed extraction: first integer run per doc, NULL on miss
    q["first_number"] = """
SELECT doc_id,
  CASE WHEN text IS NULL THEN NULL
       ELSE nullif(regexp_extract(text, '[0-9]+'), '') END AS num
FROM documents
"""
    # multi-table freshness audit (row counts + latest stamps)
    q["table_freshness"] = """
SELECT 'events' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
  max(ts) AS max_ts FROM events
UNION ALL
SELECT 'lineitem', CAST(count(*) AS BIGINT), max(l_shipdate) FROM lineitem
UNION ALL
SELECT 'orders', CAST(count(*) AS BIGINT), max(o_orderdate) FROM orders
"""
    # per-row min-max feature scaling within event type (NULL for
    # constant groups, DuckDB's x/0)
    q["value_minmax_scaled"] = """
WITH c AS (
  SELECT event_id, event_type, CAST(round(value*100) AS BIGINT) AS c
  FROM events
),
m AS (SELECT event_type, min(c) AS mn, max(c) AS mx FROM c
      GROUP BY event_type)
SELECT c.event_id, c.event_type,
  CASE WHEN m.mx = m.mn THEN NULL
       ELSE CAST(c.c - m.mn AS DOUBLE) / CAST(m.mx - m.mn AS DOUBLE) END
    AS scaled
FROM c JOIN m USING (event_type)
"""
    # dense zero-filled (day x type) count matrix via calendar spine
    q["daily_type_matrix"] = """
WITH e AS (SELECT date_trunc('day', ts) AS day, event_type FROM events),
b AS (SELECT min(day) AS lo, max(day) AS hi FROM e),
spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
          FROM b),
ty AS (SELECT DISTINCT event_type FROM e),
c AS (SELECT day, event_type, CAST(count(*) AS BIGINT) AS n FROM e
      GROUP BY day, event_type)
SELECT CAST(s.day AS TIMESTAMP) AS day, ty.event_type,
  coalesce(c.n, 0) AS n
FROM spine s CROSS JOIN ty
LEFT JOIN c ON c.day = s.day AND c.event_type = ty.event_type
"""
    # contingency lift per (nation, segment) cell from exact counts
    q["segment_nation_lift"] = """
WITH c AS (
  SELECT n_name, c_mktsegment, CAST(count(*) AS BIGINT) AS n
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name, c_mktsegment
),
r AS (SELECT n_name, CAST(sum(n) AS BIGINT) AS rn FROM c GROUP BY n_name),
s AS (SELECT c_mktsegment, CAST(sum(n) AS BIGINT) AS sn FROM c
      GROUP BY c_mktsegment),
t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c)
SELECT c.n_name, c.c_mktsegment, c.n AS n_customers,
  CAST(c.n AS DOUBLE) * CAST(t.tot AS DOUBLE)
    / (CAST(r.rn AS DOUBLE) * CAST(s.sn AS DOUBLE)) AS lift
FROM c JOIN r USING (n_name) JOIN s USING (c_mktsegment) CROSS JOIN t
"""
    # interval-sweep max concurrency over gap sessions (+1/-1 deltas,
    # half-open end+1us, running-sum max with earliest-instant tie)
    q["peak_active_users"] = """
WITH x AS (
  SELECT user_id, ts, event_id,
    CASE WHEN lag(ts) OVER w IS NULL
           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
         THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
y AS (SELECT user_id, ts, sum(new_s) OVER
        (PARTITION BY user_id ORDER BY ts, event_id
         ROWS UNBOUNDED PRECEDING) AS sid FROM x),
s AS (SELECT user_id, sid, epoch_us(min(ts)) AS s_us,
             epoch_us(max(ts)) AS e_us
      FROM y GROUP BY user_id, sid),
b AS (SELECT s_us AS t, CAST(1 AS BIGINT) AS d FROM s
      UNION ALL SELECT e_us + 1, CAST(-1 AS BIGINT) FROM s),
r AS (SELECT t, CAST(sum(d) AS BIGINT) AS ds FROM b GROUP BY t),
c AS (SELECT t, sum(ds) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
        AS active FROM r),
m AS (SELECT max(active) AS mx FROM c)
SELECT CAST(m.mx AS BIGINT) AS peak_active,
  CAST(min(c.t) AS BIGINT) AS at_us
FROM c CROSS JOIN m WHERE c.active = m.mx GROUP BY m.mx
"""
    # per-user activity span: first/last seen, counts, distinct days
    q["user_activity_span"] = """
SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(count(DISTINCT date_trunc('day', ts)) AS BIGINT) AS active_days
FROM events GROUP BY user_id
"""
    # per-source corpus quality rollup: ratios of exact integer sums
    # (never a float mean of per-doc ratios)
    q["source_quality_profile"] = r"""
SELECT source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(coalesce(sum(len(regexp_extract_all(text, '\S+'))), 0) AS BIGINT)
    AS n_tokens,
  CASE WHEN coalesce(sum(length(text)), 0) = 0 THEN NULL
       ELSE CAST(coalesce(sum(len(regexp_extract_all(text, '[A-Za-z]'))),
                          0) AS DOUBLE)
            / CAST(coalesce(sum(length(text)), 0) AS DOUBLE) END
    AS alpha_ratio,
  CAST(coalesce(sum(len(regexp_extract_all(text, '\S+'))), 0) AS DOUBLE)
    / CAST(count(*) AS DOUBLE) AS avg_tokens
FROM documents GROUP BY source
"""
    # grouped trimmed mean: per type, mean of values inside the type's
    # exact [p5, p95] band (length_band inverse-CDF window rule)
    q["trimmed_mean_value"] = """
WITH c AS (
  SELECT event_type, CAST(round(value*100) AS BIGINT) AS c FROM events
),
h AS (SELECT event_type, c AS v, count(*) AS n FROM c GROUP BY 1, 2),
w AS (
  SELECT event_type, v,
    sum(n) OVER (PARTITION BY event_type ORDER BY v) AS cum,
    sum(n) OVER (PARTITION BY event_type) AS tot
  FROM h
),
b AS (
  SELECT event_type,
    min(CASE WHEN cum >= ceil(0.05 * tot) THEN v END) AS lo,
    min(CASE WHEN cum >= ceil(0.95 * tot) THEN v END) AS hi
  FROM w GROUP BY event_type
)
SELECT c.event_type, CAST(count(*) AS BIGINT) AS n_kept,
  CAST(CAST(sum(c.c) AS BIGINT) AS DOUBLE)/100.0
    / CAST(count(*) AS DOUBLE) AS trimmed_mean
FROM c JOIN b USING (event_type)
WHERE c.c >= b.lo AND c.c <= b.hi
GROUP BY c.event_type
"""
    # greatest-row-per-group: each customer's biggest order with
    # attributes (cents-exact money compare, orderkey tiebreak)
    q["biggest_order_per_customer"] = """
WITH r AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
    row_number() OVER (PARTITION BY o_custkey
      ORDER BY CAST(round(o_totalprice*100) AS BIGINT) DESC,
               o_orderkey) AS rn
  FROM orders
)
SELECT CAST(o_custkey AS BIGINT) AS c_custkey,
  CAST(o_orderkey AS BIGINT) AS o_orderkey, o_totalprice
FROM r WHERE rn = 1
"""
    # money reconciliation: per status, orders with no lineitems and
    # orders whose lineitem revenue (1e-6-dollar ints) is within 1% of
    # o_totalprice — the tolerance compare is exact int64 on both sides
    q["order_totals_check"] = """
WITH l AS (
  SELECT l_orderkey, CAST(sum(
      CAST(round(l_extendedprice*100) AS BIGINT)
      * (100 - CAST(round(l_discount*100) AS BIGINT))
      * (100 + CAST(round(l_tax*100) AS BIGINT))) AS BIGINT) AS rev6,
    CAST(count(*) AS BIGINT) AS nl
  FROM lineitem GROUP BY l_orderkey
),
o AS (
  SELECT o_orderstatus,
    CAST(round(o_totalprice*100) AS BIGINT) * 10000 AS tot6,
    coalesce(l.rev6, 0) AS rev6, coalesce(l.nl, 0) AS nl
  FROM orders LEFT JOIN l ON o_orderkey = l.l_orderkey
)
SELECT o_orderstatus,
  CAST(count(*) AS BIGINT) AS n_orders,
  CAST(sum(CASE WHEN nl = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_no_lines,
  CAST(sum(CASE WHEN 100*abs(rev6 - tot6) <= tot6 THEN 1 ELSE 0 END)
    AS BIGINT) AS n_within_1pct
FROM o GROUP BY o_orderstatus
"""
    # exact per-language vocabulary size (doc_freq tokenizer contract:
    # lowercased whitespace tokens)
    q["vocab_by_lang"] = r"""
WITH t AS (
  SELECT lang, unnest(regexp_extract_all(lower(text), '\S+')) AS token
  FROM documents
)
SELECT lang, CAST(count(DISTINCT token) AS BIGINT) AS vocab
FROM t GROUP BY lang
"""
    # top-20 bigram collocations with exact-count PMI; the double
    # expression mirrors the engine's multiplication order exactly
    q["bigram_pmi"] = r"""
WITH t AS (SELECT regexp_extract_all(text, '\S+') AS toks FROM documents),
bg AS (
  SELECT unnest(list_transform(
    generate_series(1, len(toks) - 1),
    i -> toks[i] || ' ' || toks[i + 1]
  )) AS ngram
  FROM t WHERE len(toks) >= 2
),
bc AS (SELECT ngram, CAST(count(*) AS BIGINT) AS n FROM bg GROUP BY ngram),
top AS (SELECT ngram, n FROM bc ORDER BY n DESC, ngram LIMIT 20),
tot AS (SELECT
  CAST(sum(greatest(coalesce(len(toks), 0) - 1, 0)) AS BIGINT) AS tb,
  CAST(sum(coalesce(len(toks), 0)) AS BIGINT) AS tu FROM t),
ug AS (SELECT unnest(toks) AS tok FROM t),
uc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM ug GROUP BY tok)
SELECT top.ngram, top.n,
  ln((CAST(top.n AS DOUBLE) * CAST(tot.tu AS DOUBLE)
        * CAST(tot.tu AS DOUBLE))
     / (CAST(tot.tb AS DOUBLE) * CAST(u1.c AS DOUBLE)
        * CAST(u2.c AS DOUBLE))) AS pmi
FROM top CROSS JOIN tot
JOIN uc u1 ON u1.tok = split_part(top.ngram, ' ', 1)
JOIN uc u2 ON u2.tok = split_part(top.ngram, ' ', 2)
"""
    # calendar-spine anti-join: days in the order-date range with no
    # orders (the engine diffs an arange spine against the distinct set)
    q["quiet_days"] = """
WITH b AS (SELECT date_trunc('day', min(o_orderdate)) AS lo,
                  date_trunc('day', max(o_orderdate)) AS hi FROM orders),
spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
          FROM b),
od AS (SELECT DISTINCT date_trunc('day', o_orderdate) AS day FROM orders)
SELECT CAST(day AS TIMESTAMP) AS day FROM spine
WHERE day NOT IN (SELECT day FROM od)
"""
    # gaps-and-islands: longest strictly-increasing value run per user
    # in (ts, event_id) order; compares run on exact integer cents
    q["value_streaks"] = """
WITH s AS (
  SELECT user_id,
    row_number() OVER w AS rn,
    CASE WHEN CAST(round(value*100) AS BIGINT) >
              lag(CAST(round(value*100) AS BIGINT)) OVER w
         THEN 0 ELSE 1 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
g AS (SELECT user_id, rn,
        sum(brk) OVER (PARTITION BY user_id ORDER BY rn) AS grp
      FROM s),
r AS (SELECT user_id, count(*) AS len FROM g GROUP BY user_id, grp)
SELECT user_id, CAST(max(len) AS BIGINT) AS max_streak
FROM r GROUP BY user_id
"""
    # Q20-adapted dominant-share suppliers: 8*q > part total, exact
    # integer quantity cents at both aggregation levels
    q["dominant_suppliers"] = """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
    CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS q
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
pt AS (SELECT l_partkey, CAST(sum(q) AS BIGINT) AS tq FROM ps
       GROUP BY l_partkey)
SELECT CAST(ps.l_suppkey AS BIGINT) AS s_suppkey,
  CAST(count(*) AS BIGINT) AS n_parts
FROM ps JOIN pt USING (l_partkey)
WHERE 8*ps.q > pt.tq
GROUP BY ps.l_suppkey
"""
    # range (interval) join vs a literal window dim (r5 session 8):
    # overlapping windows — LEFT JOIN keeps empty windows at zero;
    # value sums in integer cents (invariant #3)
    q["maintenance_windows"] = """
WITH w(window_id, ts_start, ts_end) AS (VALUES
  (1, TIMESTAMP '2024-01-03 00:00:00', TIMESTAMP '2024-01-05 00:00:00'),
  (2, TIMESTAMP '2024-01-04 12:00:00', TIMESTAMP '2024-01-07 00:00:00'),
  (3, TIMESTAMP '2024-01-10 06:00:00', TIMESTAMP '2024-01-10 18:00:00'),
  (4, TIMESTAMP '2024-01-15 00:00:00', TIMESTAMP '2024-01-22 00:00:00'),
  (5, TIMESTAMP '2024-01-20 00:00:00', TIMESTAMP '2024-01-21 12:00:00'),
  (6, TIMESTAMP '2024-02-02 00:00:00', TIMESTAMP '2024-02-03 00:00:00')),
j AS (
  SELECT w.window_id, w.ts_start, w.ts_end,
    CAST(count(e.ts) AS BIGINT) AS n_events,
    coalesce(sum(CAST(round(e.value*100) AS BIGINT)), 0) AS cents
  FROM w LEFT JOIN events e ON e.ts >= w.ts_start AND e.ts < w.ts_end
  GROUP BY 1, 2, 3)
SELECT CAST(window_id AS BIGINT) AS window_id, ts_start, ts_end,
  n_events, CAST(cents AS DOUBLE)/100 AS value_sum
FROM j
"""
    # week-over-week traffic ratio (r5 session 9): a key-shifted
    # self-join on the CALENDAR day (not a row-offset LAG — spine gaps
    # stay honest); ratio in double/double on both sides
    q["wow_traffic"] = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1)
SELECT d.day, d.n, p.n AS n_prev_week,
  CASE WHEN p.n > 0 THEN CAST(d.n AS DOUBLE) / CAST(p.n AS DOUBLE)
       ELSE NULL END AS wow_ratio
FROM daily d LEFT JOIN daily p ON p.day = d.day - INTERVAL 7 DAY
"""
    # set-aggregation-to-string (r5 session 9): per user the sorted
    # distinct high-value event types ','-joined; Arrow binary string
    # order == DuckDB VARCHAR order so the joined set is byte-identical
    q["user_type_profile"] = """
SELECT user_id,
  string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS type_set,
  CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
FROM events WHERE value >= 80.0
GROUP BY user_id
"""
    # time-weighted average of the event value step function (r5
    # session 9): each value holds until the next event (global
    # (ts, event_id) order), whole-second floor weights, exact integer
    # cents*sec moments, final division in double (invariant #4b)
    q["time_weighted_value"] = """
WITH e AS (
  SELECT epoch_us(ts) AS us, event_id,
    CAST(round(value*100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL),
s AS (
  SELECT cents, us AS cur,
    lead(us) OVER (ORDER BY us, event_id) AS nxt
  FROM e),
p AS (
  SELECT CAST(count(*) AS BIGINT) AS n_steps,
    CAST(sum((nxt - cur) // 1000000) AS BIGINT) AS total_sec,
    CAST(sum(cents * ((nxt - cur) // 1000000)) AS BIGINT) AS w_sum
  FROM s WHERE nxt IS NOT NULL)
SELECT n_steps, coalesce(total_sec, 0) AS total_sec,
  CASE WHEN total_sec > 0
       THEN (CAST(w_sum AS DOUBLE) / CAST(total_sec AS DOUBLE)) / 100.0
       ELSE NULL END AS twa_value
FROM p
"""
    # exact per-type Gini (r5 session 9): rank-weighted-sum identity
    # G = (sum (2r-1)c - nS)/(nS); tie order is irrelevant to the sum,
    # BIGINT moments, final arithmetic in double on both sides
    q["value_gini"] = """
WITH e AS (
  SELECT event_type, CAST(round(value*100) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL),
r AS (
  SELECT event_type, c,
    row_number() OVER (PARTITION BY event_type ORDER BY c) AS rn
  FROM e),
a AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
    CAST(sum(c) AS BIGINT) AS sc,
    CAST(sum((2*rn - 1) * c) AS BIGINT) AS rsum
  FROM r GROUP BY event_type)
SELECT event_type, n_events,
  CAST(sc AS DOUBLE)/100 AS sum_value,
  CASE WHEN sc > 0 THEN
    (CAST(rsum AS DOUBLE) - CAST(n_events AS DOUBLE)*CAST(sc AS DOUBLE))
      / (CAST(n_events AS DOUBLE)*CAST(sc AS DOUBLE))
  ELSE NULL END AS gini
FROM a
"""
    # per-type OLS trend of daily totals (r5 session 9): exact BIGINT
    # moments over the bounded (type, day) series, slope/intercept in
    # double with every moment cast FIRST (invariant #4b)
    q["value_trend_by_type"] = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
    CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
d0 AS (SELECT min(day) AS day0 FROM daily),
rel AS (
  SELECT event_type,
    CAST(date_diff('day', d0.day0, day) AS BIGINT) AS d, cents
  FROM daily, d0),
m AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
    CAST(sum(d) AS BIGINT) AS sd, CAST(sum(cents) AS BIGINT) AS sy,
    CAST(sum(d*cents) AS BIGINT) AS sdy, CAST(sum(d*d) AS BIGINT) AS sdd
  FROM rel GROUP BY event_type),
s AS (
  SELECT event_type, n_days, sd, sy,
    CASE WHEN n_days >= 2 AND CAST(n_days AS DOUBLE)*CAST(sdd AS DOUBLE)
           - CAST(sd AS DOUBLE)*CAST(sd AS DOUBLE) > 0
      THEN (CAST(n_days AS DOUBLE)*CAST(sdy AS DOUBLE)
             - CAST(sd AS DOUBLE)*CAST(sy AS DOUBLE))
           / (CAST(n_days AS DOUBLE)*CAST(sdd AS DOUBLE)
             - CAST(sd AS DOUBLE)*CAST(sd AS DOUBLE))
      ELSE NULL END AS slope
  FROM m)
SELECT event_type, n_days,
  slope/100 AS slope_per_day,
  CASE WHEN slope IS NOT NULL THEN
    ((CAST(sy AS DOUBLE) - slope*CAST(sd AS DOUBLE))
       / CAST(n_days AS DOUBLE)) / 100
  ELSE NULL END AS intercept
FROM s
"""
    # Benford first-digit screen (r5 session 9): exact integer leading
    # digit (a float log10 is 1 ULP from wrong at powers of ten);
    # expectation via ln == math.log (ULP note c)
    q["price_benford"] = """
WITH c AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice*100) AS BIGINT)
    AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders WHERE o_totalprice > 0),
t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
d AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_orders
      FROM c GROUP BY 1)
SELECT d.digit, d.n_orders,
  CAST(d.n_orders AS DOUBLE)/CAST(t.n AS DOUBLE) AS share,
  ln(1.0 + 1.0/CAST(d.digit AS DOUBLE))/ln(10.0) AS expected_share
FROM d, t
"""
    # global exact mode (r5 session 9): ties break to smallest value
    q["value_mode"] = """
SELECT value AS mode_value, CAST(count(*) AS BIGINT) AS n
FROM events WHERE value IS NOT NULL
GROUP BY value ORDER BY n DESC, mode_value LIMIT 1
"""
    # exact-value collision audit (r5 session 9): birthday-pair mass
    q["value_collision_stats"] = """
WITH c AS (SELECT value, CAST(count(*) AS BIGINT) AS n
           FROM events WHERE value IS NOT NULL GROUP BY value)
SELECT CAST(count(*) AS BIGINT) AS n_distinct,
  CAST(sum(n*(n-1)//2) AS BIGINT) AS n_pairs,
  CAST(max(n) AS BIGINT) AS max_count
FROM c
"""
    # exact Wasserstein-1 drift (r5 session 9): the integral twin of
    # value_drift_ks — integer |f1*n2 - f2*n1| * cents-gap products
    q["value_drift_wasserstein"] = """
WITH b AS (
  SELECT CAST((min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS BIGINT)
    AS mid FROM events),
e AS (
  SELECT CAST(round(value*100) AS BIGINT) AS c,
         epoch_us(ts) <= b.mid AS s1
  FROM events, b WHERE value IS NOT NULL),
t AS (
  SELECT CAST(sum(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN s1 THEN 0 ELSE 1 END) AS BIGINT) AS n2
  FROM e),
d AS (
  SELECT c,
    CAST(sum(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
    CAST(sum(CASE WHEN s1 THEN 0 ELSE 1 END) AS BIGINT) AS c2
  FROM e GROUP BY c),
x AS (
  SELECT c, lead(c) OVER (ORDER BY c) AS cn,
    CAST(sum(c1) OVER (ORDER BY c) AS BIGINT) AS f1,
    CAST(sum(c2) OVER (ORDER BY c) AS BIGINT) AS f2
  FROM d),
m AS (SELECT CAST(sum(abs(f1*t.n2 - f2*t.n1) * (cn - c)) AS BIGINT)
        AS num FROM x, t WHERE cn IS NOT NULL)
SELECT t.n1, t.n2,
  CASE WHEN t.n1 > 0 AND t.n2 > 0 THEN
    CAST(m.num AS DOUBLE)
      /(CAST(t.n1 AS DOUBLE)*CAST(t.n2 AS DOUBLE))/100.0
  ELSE NULL END AS w1
FROM t, m
"""
    # consecutive-activity-day streaks (r5 session 9): gaps-and-islands
    # on the distinct-day calendar per user
    q["user_day_streaks"] = """
WITH d AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
r AS (
  SELECT user_id, day,
    row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
  FROM d),
g AS (SELECT user_id, day - to_days(CAST(rn AS INTEGER)) AS grp FROM r),
s AS (SELECT user_id, CAST(count(*) AS BIGINT) AS len
      FROM g GROUP BY user_id, grp)
SELECT user_id, CAST(max(len) AS BIGINT) AS max_streak_days,
  CAST(count(*) AS BIGINT) AS n_streaks,
  CAST(sum(len) AS BIGINT) AS active_days
FROM s GROUP BY user_id
"""
    # exact two-sample KS drift (r5 session 9): sup over the INTEGER
    # cross-product |F1*n2 - F2*n1| — only the final division is double
    q["value_drift_ks"] = """
WITH b AS (
  SELECT CAST((min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS BIGINT)
    AS mid FROM events),
e AS (
  SELECT value, epoch_us(ts) <= b.mid AS s1
  FROM events, b WHERE value IS NOT NULL),
t AS (
  SELECT CAST(sum(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN s1 THEN 0 ELSE 1 END) AS BIGINT) AS n2
  FROM e),
d AS (
  SELECT value,
    CAST(sum(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
    CAST(sum(CASE WHEN s1 THEN 0 ELSE 1 END) AS BIGINT) AS c2
  FROM e GROUP BY value),
c AS (
  SELECT CAST(sum(c1) OVER (ORDER BY value) AS BIGINT) AS f1,
         CAST(sum(c2) OVER (ORDER BY value) AS BIGINT) AS f2
  FROM d),
m AS (SELECT CAST(max(abs(f1*t.n2 - f2*t.n1)) AS BIGINT) AS mx
      FROM c, t)
SELECT t.n1, t.n2,
  CASE WHEN t.n1 > 0 AND t.n2 > 0 THEN
    CAST(m.mx AS DOUBLE)/(CAST(t.n1 AS DOUBLE)*CAST(t.n2 AS DOUBLE))
  ELSE NULL END AS ks
FROM t, m
"""
    # revenue concentration per nation (r5 session 9): HHI of customer
    # spend shares + max share; DOLLAR-rounded spend keeps sum(d^2)
    # inside BIGINT (a cents moment would cross the HUGEINT->DOUBLE
    # 1-ULP trap, invariant #4b)
    q["nation_customer_hhi"] = """
WITH cs AS (
  SELECT o_custkey,
    CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS d
  FROM orders GROUP BY 1),
j AS (
  SELECT c.c_nationkey, cs.d
  FROM cs JOIN customer c ON cs.o_custkey = c.c_custkey),
a AS (
  SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_customers,
    CAST(sum(d) AS BIGINT) AS s, CAST(sum(d*d) AS BIGINT) AS ssq,
    CAST(max(d) AS BIGINT) AS mx
  FROM j GROUP BY 1)
SELECT n.n_name, a.n_customers, a.s AS revenue_dollars,
  CASE WHEN a.s > 0 THEN
    CAST(a.ssq AS DOUBLE)/(CAST(a.s AS DOUBLE)*CAST(a.s AS DOUBLE))
  ELSE NULL END AS hhi,
  CASE WHEN a.s > 0 THEN CAST(a.mx AS DOUBLE)/CAST(a.s AS DOUBLE)
  ELSE NULL END AS top_share
FROM a JOIN nation n ON a.c_nationkey = n.n_nationkey
"""
    # pairwise weighted-Jaccard of daily traffic profiles (r5 session
    # 9): absent days count 0 via the dense type x day grid
    q["type_traffic_similarity"] = """
WITH d AS (
  SELECT event_type, date_trunc('day', ts) AS day,
    CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
days AS (SELECT DISTINCT day FROM d),
types AS (SELECT DISTINCT event_type FROM d),
grid AS (
  SELECT t.event_type, dy.day, coalesce(d.n, 0) AS n
  FROM types t CROSS JOIN days dy
  LEFT JOIN d ON d.event_type = t.event_type AND d.day = dy.day),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
    CAST(sum(least(a.n, b.n)) AS BIGINT) AS sum_min,
    CAST(sum(greatest(a.n, b.n)) AS BIGINT) AS sum_max
  FROM grid a JOIN grid b
    ON a.day = b.day AND a.event_type < b.event_type
  GROUP BY 1, 2)
SELECT type_a, type_b, sum_min, sum_max,
  CASE WHEN sum_max > 0 THEN
    CAST(sum_min AS DOUBLE)/CAST(sum_max AS DOUBLE)
  ELSE NULL END AS sim
FROM pairs
"""
    # global per-row PERCENT_RANK (r5 session 9): the whole-table
    # window computed range-partitioned; ties share the min rank
    q["value_percent_rank_global"] = """
SELECT event_id, value,
  percent_rank() OVER (ORDER BY value) AS pct_rank
FROM events WHERE value IS NOT NULL
"""
    # leaderboard WITH TIES (r5 session 9): DENSE_RANK <= 3 — every
    # row carrying one of the group's 3 largest distinct values
    q["top_events_with_ties"] = """
WITH r AS (
  SELECT event_id, event_type, value,
    dense_rank() OVER (PARTITION BY event_type ORDER BY value DESC)
      AS rnk
  FROM events WHERE value IS NOT NULL)
SELECT event_id, event_type, value, CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 3
"""
    # per-vector dominant dimension (r5 session 9): first argmax slot;
    # np.argmax first-occurrence == list_indexof on identical float32
    q["embedding_argmax"] = """
SELECT vec_id,
  CAST(list_indexof(embedding, list_aggregate(embedding, 'max')) - 1
       AS BIGINT) AS dim,
  list_aggregate(embedding, 'max') AS max_v
FROM embeddings WHERE embedding IS NOT NULL
"""
    # token-mass inequality per lang (r5 session 9): grouped_gini over
    # per-doc whitespace token counts; same identity as value_gini
    q["token_gini_by_lang"] = r"""
WITH e AS (
  SELECT lang, CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS c
  FROM documents),
r AS (
  SELECT lang, c,
    row_number() OVER (PARTITION BY lang ORDER BY c) AS rn
  FROM e),
a AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(c) AS BIGINT) AS sc,
    CAST(sum((2*rn - 1) * c) AS BIGINT) AS rsum
  FROM r GROUP BY lang)
SELECT lang, n_docs, sc AS sum_tokens,
  CASE WHEN sc > 0 THEN
    (CAST(rsum AS DOUBLE) - CAST(n_docs AS DOUBLE)*CAST(sc AS DOUBLE))
      / (CAST(n_docs AS DOUBLE)*CAST(sc AS DOUBLE))
  ELSE NULL END AS gini
FROM a
"""
    # per-dimension embedding range audit (r5 session 9): min/max are
    # order-free exact on floats (unlike sums); float32 end-to-end
    q["embedding_dim_range"] = """
SELECT CAST(i AS BIGINT) AS dim, min(v) AS min_v, max(v) AS max_v,
  CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest(embedding) AS v,
             unnest(generate_series(0, len(embedding)-1)) AS i
      FROM embeddings WHERE embedding IS NOT NULL)
GROUP BY i
"""
    # session-level type co-occurrence (r5 session 9): the 30-min gap
    # sessionization composed with the basket C(n,2) expansion
    q["session_type_pairs"] = """
WITH x AS (
  SELECT user_id, ts, event_id, event_type,
    CASE WHEN lag(ts) OVER w IS NULL
           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
         THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
y AS (SELECT user_id, event_type, sum(new_s) OVER
        (PARTITION BY user_id ORDER BY ts, event_id
         ROWS UNBOUNDED PRECEDING) AS sid FROM x),
st AS (SELECT DISTINCT user_id, sid, event_type FROM y)
SELECT a.event_type AS type_a, b.event_type AS type_b,
  CAST(count(*) AS BIGINT) AS n_sessions
FROM st a JOIN st b ON a.user_id = b.user_id AND a.sid = b.sid
  AND a.event_type < b.event_type
GROUP BY 1, 2
"""
    # association rules (r5 session 9): support >= 2 part pairs with
    # both confidences and lift; N = |orders| (the basket universe) on
    # both sides, all ratios double-for-double the engine expression
    q["basket_rules"] = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
ic AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_item
  FROM op GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_orders FROM orders),
pr AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
    CAST(count(*) AS BIGINT) AS n_ab
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2)
SELECT p.part_a, p.part_b, p.n_ab,
  ia.n_item AS n_a, ib.n_item AS n_b,
  CAST(p.n_ab AS DOUBLE)/CAST(ia.n_item AS DOUBLE) AS conf_ab,
  CAST(p.n_ab AS DOUBLE)/CAST(ib.n_item AS DOUBLE) AS conf_ba,
  (CAST(p.n_ab AS DOUBLE)*CAST(t.n_orders AS DOUBLE))
    /(CAST(ia.n_item AS DOUBLE)*CAST(ib.n_item AS DOUBLE)) AS lift
FROM pr p
JOIN ic ia ON p.part_a = ia.l_partkey
JOIN ic ib ON p.part_b = ib.l_partkey, tot t
"""
    # type x day-of-week independence audit (r5 session 9): exact cell
    # counts + window-sum marginals, expected/residual in double with
    # identical expression trees (hardware sqrt == DuckDB sqrt)
    q["type_dow_independence"] = """
WITH c AS (
  SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS dow,
    CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
m AS (
  SELECT event_type, dow, n,
    CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS rt,
    CAST(sum(n) OVER (PARTITION BY dow) AS BIGINT) AS ct,
    CAST(sum(n) OVER () AS BIGINT) AS tot
  FROM c)
SELECT event_type, dow, n,
  CAST(rt AS DOUBLE)*CAST(ct AS DOUBLE)/CAST(tot AS DOUBLE) AS expected,
  (CAST(n AS DOUBLE)
     - CAST(rt AS DOUBLE)*CAST(ct AS DOUBLE)/CAST(tot AS DOUBLE))
    / sqrt(CAST(rt AS DOUBLE)*CAST(ct AS DOUBLE)/CAST(tot AS DOUBLE))
    AS pearson_resid
FROM m
"""
    # lag-1 autocorrelation of daily event counts (r5 session 8):
    # quantity_price_corr's overflow discipline — BIGINT moments, all
    # arithmetic past the moments in DOUBLE on both sides
    q["daily_autocorr"] = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1),
l AS (SELECT c AS y, lag(c) OVER (ORDER BY day) AS x FROM daily),
p AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
    CAST(sum(x*y) AS BIGINT) AS sxy, CAST(sum(x*x) AS BIGINT) AS sxx,
    CAST(sum(y*y) AS BIGINT) AS syy
  FROM l WHERE x IS NOT NULL),
d AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily)
SELECT d.n_days, p.n AS n_pairs,
  CASE WHEN CAST(p.n AS DOUBLE)*CAST(p.sxx AS DOUBLE)
              - CAST(p.sx AS DOUBLE)*CAST(p.sx AS DOUBLE) > 0
        AND CAST(p.n AS DOUBLE)*CAST(p.syy AS DOUBLE)
              - CAST(p.sy AS DOUBLE)*CAST(p.sy AS DOUBLE) > 0 THEN
    (CAST(p.n AS DOUBLE)*CAST(p.sxy AS DOUBLE)
       - CAST(p.sx AS DOUBLE)*CAST(p.sy AS DOUBLE))
      / sqrt((CAST(p.n AS DOUBLE)*CAST(p.sxx AS DOUBLE)
                - CAST(p.sx AS DOUBLE)*CAST(p.sx AS DOUBLE))
             * (CAST(p.n AS DOUBLE)*CAST(p.syy AS DOUBLE)
                  - CAST(p.sy AS DOUBLE)*CAST(p.sy AS DOUBLE)))
  ELSE NULL END AS autocorr_lag1
FROM d, p
"""
    if sf_dir is not None:
        # whole-lake null audit (r5 session 9): the UNION ALL generates
        # from the SAME parquet schemas the engine reads — no
        # hand-maintained column lists on either side
        import pyarrow.parquet as _pq

        _legs = []
        for _tbl in (
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        ):
            for _c in _pq.read_schema(f"{sf_dir}/{_tbl}.parquet").names:
                _legs.append(
                    f"SELECT '{_tbl}' AS table_name, "
                    f"'{_c}' AS column_name, "
                    "CAST(count(*) AS BIGINT) AS n_rows, "
                    f'CAST(sum(CASE WHEN "{_c}" IS NULL THEN 1 ELSE 0 '
                    f"END) AS BIGINT) AS n_null FROM {_tbl}"
                )
        q["null_profile"] = " UNION ALL ".join(_legs)
        q["ann_ivf"] = _ann_ivf_sql(sf_dir)
        q["ann_ivf_incr"] = _ann_ivf_sql(sf_dir, store="sharded")
        q["cosine_dups_ivf"] = _cosine_dups_ivf_sql(sf_dir)
        q["cosine_dups_lsh"] = _cosine_dups_lsh_sql(sf_dir)
        q["dedup_simhash"] = _dedup_simhash_sql(sf_dir)
        q["dedup_minhash_keep"] = _dedup_minhash_keep_sql(sf_dir)
    return q


def oracle_queries(sf_dir: str) -> dict[str, str]:
    path = transcripts_path(sf_dir)
    base = _base_cte(path)
    lits = _literal_error_arms()
    return {
        "parse_3164": base
        + "SELECT conv_id, turn_idx, priority, facility, severity, ts_parsed,"
        " hostname, tag, content FROM ok3",
        "parse_5424": base
        + "SELECT conv_id, turn_idx, priority, facility, severity, version,"
        " ts_parsed, tz_offset_minutes, hostname, app_name, proc_id, msg_id,"
        " structured_data, message FROM ok5",
        "severity_counts": base
        + "SELECT severity, count(*) AS n_turns FROM allok GROUP BY severity",
        "conv_counts": base
        + "SELECT conv_id, count(*) AS n_turns FROM allok GROUP BY conv_id",
        # training-sample assembly: turns joined newline-wise in turn
        # order (transcripts text is never null by the generator
        # contract, so string_agg's null-skip never diverges from
        # binary_join)
        "turn_dup_stats": f"""
WITH g AS (
  SELECT text, CAST(count(*) AS BIGINT) AS n
  FROM read_parquet('{path}/*.parquet') GROUP BY text
)
SELECT CAST(sum(n) AS BIGINT) AS n_turns,
  CAST(count(*) AS BIGINT) AS n_distinct,
  1.0 - CAST(count(*) AS BIGINT)
    / CAST(CAST(sum(n) AS BIGINT) AS DOUBLE) AS dup_rate
FROM g
""",
        "conv_assemble": f"""
SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
  string_agg(text, chr(10) ORDER BY turn_idx) AS doc
FROM read_parquet('{path}/*.parquet') GROUP BY conv_id
""",
        # gaps-and-islands: two-row_number islands over the parsed
        # stream, per conversation (r5)
        "severity_runs": base + """
, isl AS (
  SELECT conv_id, severity,
    row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx)
    - row_number() OVER (PARTITION BY conv_id, severity
                         ORDER BY turn_idx) AS grp
  FROM allok
),
runs AS (
  SELECT conv_id, count(*) AS run_len
  FROM isl GROUP BY conv_id, severity, grp
)
SELECT conv_id, CAST(count(*) AS BIGINT) AS n_runs,
       CAST(max(run_len) AS BIGINT) AS max_run
FROM runs GROUP BY conv_id
""",
        # time-to-first-failure per conversation (r5)
        "conv_first_error": base + """
, fe AS (
  SELECT conv_id, CAST(min(turn_idx) AS BIGINT) AS first_error_turn
  FROM allok WHERE severity <= 3 GROUP BY conv_id
)
SELECT a.conv_id, fe.first_error_turn,
  CAST(count(*) FILTER (WHERE a.turn_idx < fe.first_error_turn)
       AS BIGINT) AS n_turns_before
FROM allok a JOIN fe ON fe.conv_id = a.conv_id
GROUP BY a.conv_id, fe.first_error_turn
""",
        # adjacent-pair role-alternation violations over the RAW
        # transcripts (r5) — LAG mirror of the shifted-compare
        "role_alternation": f"""
WITH l AS (
  SELECT conv_id, role,
    lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
  FROM read_parquet('{path}/*.parquet')
)
SELECT conv_id,
  CAST(count(prev) AS BIGINT) AS n_pairs,
  CAST(count(*) FILTER (WHERE role = prev) AS BIGINT) AS n_same_role
FROM l GROUP BY conv_id
""",
        # per-conversation severity entropy (r5): nonlinear grouped
        # aggregate; round-6 like every ln-bearing oracle
        "conv_severity_entropy": base + """
, sc AS (
  SELECT conv_id, severity, CAST(count(*) AS BIGINT) AS n
  FROM allok GROUP BY conv_id, severity
),
st AS (SELECT conv_id, CAST(sum(n) AS BIGINT) AS tot FROM sc
       GROUP BY conv_id)
SELECT sc.conv_id, st.tot AS n_turns,
  round(-sum((CAST(n AS DOUBLE) / CAST(tot AS DOUBLE))
             * ln(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE))), 6)
    AS entropy
FROM sc JOIN st USING (conv_id)
GROUP BY sc.conv_id, st.tot
""",
        # grouped window rank over parser outputs (r5)
        "tag_top_hosts": base + """
, c AS (
  SELECT tag, hostname, CAST(count(*) AS BIGINT) AS n
  FROM ok3 WHERE tag IS NOT NULL GROUP BY tag, hostname
)
SELECT tag, hostname, n, rank FROM (
  SELECT tag, hostname, n,
    CAST(row_number() OVER
      (PARTITION BY tag ORDER BY n DESC, hostname) AS BIGINT) AS rank
  FROM c) WHERE rank <= 3
""",
        "assistant_spans": f"""
WITH o AS (
  SELECT conv_id, turn_idx, role,
    COALESCE(sum(len(text) + 1) OVER (
      PARTITION BY conv_id ORDER BY turn_idx
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_char,
    len(text) AS l
  FROM read_parquet('{path}/*.parquet')
)
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
  CAST(start_char AS BIGINT) AS start_char,
  CAST(start_char + l AS BIGINT) AS end_char
FROM o WHERE role = 'assistant'
""",
        "conv_windows": f"""
WITH t AS (
  SELECT conv_id, list(text ORDER BY turn_idx) AS ts
  FROM read_parquet('{path}/*.parquet') GROUP BY conv_id
),
w AS (
  SELECT conv_id, ts,
    unnest(generate_series(0, len(ts) - 8, 4)) AS st
  FROM t WHERE len(ts) >= 8
)
SELECT conv_id, CAST(st // 4 AS BIGINT) AS window_idx,
  array_to_string(ts[st + 1 : st + 8], chr(10)) AS text
FROM w
""",
        "traffic_rollup": base
        + "SELECT facility, CAST(date_part('hour', ts_parsed) AS INTEGER)"
        " AS hour, count(*) AS n_turns FROM allok"
        " WHERE ts_parsed IS NOT NULL GROUP BY ROLLUP(facility, hour)",
        "conv_error_rate": base
        + """
, okc AS (SELECT conv_id, count(*) AS n_ok FROM allok GROUP BY conv_id),
alln AS (SELECT conv_id, count(*) AS n_turns FROM t GROUP BY conv_id)
SELECT a.conv_id, a.n_turns,
  a.n_turns - coalesce(okc.n_ok, 0) AS n_errors,
  CAST(a.n_turns - coalesce(okc.n_ok, 0) AS DOUBLE) / a.n_turns
    AS error_rate
FROM alln a LEFT JOIN okc USING (conv_id)
""",
        "route_sinks": base
        + "SELECT severity, rfc, count(*) AS n_rows FROM allok"
        " GROUP BY severity, rfc",
        # per-tool turn counts + parse-error rate (tool is a raw
        # passthrough column; errors = rows absent from allok)
        "tool_usage": base
        + """
, okt AS (SELECT tool, count(*) AS n_ok FROM allok GROUP BY tool),
alln AS (SELECT tool, count(*) AS n_turns FROM t GROUP BY tool)
SELECT a.tool, CAST(a.n_turns AS BIGINT) AS n_turns,
  CAST(a.n_turns - coalesce(okt.n_ok, 0) AS BIGINT) AS n_errors,
  CAST(a.n_turns - coalesce(okt.n_ok, 0) AS DOUBLE)
    / CAST(a.n_turns AS DOUBLE) AS error_rate
FROM alln a LEFT JOIN okt USING (tool)
""",
        "enrich_route": base
        + """
SELECT o.conv_id, o.turn_idx, o.severity, o.rfc,
       r.role_code, r.role_class, tl.tool_code, tl.tool_family
FROM allok o
JOIN (VALUES ('user', CAST(1 AS TINYINT), 'human'),
             ('assistant', 2, 'model'),
             ('system', 3, 'control'),
             ('tool', 4, 'machine')) r(role, role_code, role_class)
  ON o.role = r.role
JOIN (VALUES ('', CAST(0 AS SMALLINT), 'none'),
             ('bash', 1, 'shell'),
             ('search', 2, 'retrieval'),
             ('editor', 3, 'workspace'),
             ('browser', 4, 'web')) tl(tool, tool_code, tool_family)
  ON o.tool = tl.tool
""",
        "hourly_traffic": base
        + "SELECT facility, CAST(date_part('hour', ts_parsed) AS INTEGER)"
        " AS hour, count(*) AS n_turns FROM allok"
        " WHERE ts_parsed IS NOT NULL GROUP BY 1, 2",
        "host_traffic": base
+ "SELECT hostname, count(*) AS n_turns FROM allok GROUP BY hostname"
" ORDER BY n_turns DESC, hostname LIMIT 20",
        # inter-turn latency histogram: LAG deltas within conversation
        # (minute buckets, negatives clamp to 0 — no-year 3164 stamps)
        "turn_latency_hist": base
        + """
, lagd AS (
  SELECT epoch_us(ts_parsed)
    - lag(epoch_us(ts_parsed))
      OVER (PARTITION BY conv_id ORDER BY turn_idx) AS d
  FROM allok WHERE ts_parsed IS NOT NULL
)
SELECT CAST(greatest(d, 0) // 60000000 AS BIGINT) AS bucket_min,
  CAST(count(*) AS BIGINT) AS n
FROM lagd WHERE d IS NOT NULL GROUP BY 1
""",
        # per-conv worst inter-turn gap (minutes, clamped); NULL for
        # single-ok-turn conversations (max over an empty delta set)
        "conv_max_gap": base
        + """
, lagd AS (
  SELECT conv_id,
    epoch_us(ts_parsed) - lag(epoch_us(ts_parsed))
      OVER (PARTITION BY conv_id ORDER BY turn_idx) AS d
  FROM allok WHERE ts_parsed IS NOT NULL
),
g AS (SELECT conv_id,
        max(CASE WHEN d IS NULL THEN NULL ELSE greatest(d, 0) END) AS mx
      FROM lagd GROUP BY conv_id)
SELECT conv_id,
  CAST(mx // 60000000 AS BIGINT) AS max_gap_min,
  CAST(CASE WHEN mx IS NULL THEN NULL
            WHEN mx > 3600000000 THEN 1 ELSE 0 END AS BIGINT) AS hour_gap
FROM g
""",
        # escalation audit: first vs last parsed severity per conv
        # (lower number = more severe, so escalated = last < first)
        "conv_severity_drift": base
        + """
, o AS (
  SELECT conv_id, severity,
    row_number() OVER w AS rn,
    count(*) OVER (PARTITION BY conv_id) AS n
  FROM allok WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
)
SELECT f.conv_id,
  CAST(f.severity AS BIGINT) AS first_severity,
  CAST(l.severity AS BIGINT) AS last_severity,
  CAST(l.severity < f.severity AS BIGINT) AS escalated
FROM o f JOIN o l ON f.conv_id = l.conv_id AND f.rn = 1 AND l.rn = l.n
""",
        # per-conversation dialect mix; dominant parsed rfc, ties -> 3164
        "conv_rfc_mix": base
        + """
, okc AS (
  SELECT conv_id,
    CAST(sum(CASE WHEN rfc = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_3164,
    CAST(sum(CASE WHEN rfc = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_5424
  FROM allok GROUP BY conv_id
),
alln AS (SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns FROM t
         GROUP BY conv_id)
SELECT a.conv_id,
  coalesce(okc.n_3164, 0) AS n_3164,
  coalesce(okc.n_5424, 0) AS n_5424,
  a.n_turns - coalesce(okc.n_3164, 0) - coalesce(okc.n_5424, 0)
    AS n_errors,
  CAST(CASE WHEN coalesce(okc.n_3164, 0) >= coalesce(okc.n_5424, 0)
       THEN 1 ELSE 2 END AS BIGINT) AS dominant_rfc
FROM alln a LEFT JOIN okc USING (conv_id)
""",
        # grouped inverse-CDF p50/p95 of content length per 3164 tag
        # (null content counts as empty, the Dump contract)
        "content_len_by_tag": base
        + """
, clentab AS (
  SELECT tag, CAST(length(coalesce(content, '')) AS BIGINT) AS v
  FROM ok3 WHERE tag IS NOT NULL
),
clcnt AS (SELECT tag, v, count(*) AS n FROM clentab GROUP BY 1, 2),
w AS (
  SELECT tag, v,
    sum(n) OVER (PARTITION BY tag ORDER BY v) AS cum,
    sum(n) OVER (PARTITION BY tag) AS tot
  FROM clcnt
)
SELECT tag, 'p50' AS q, CAST(min(v) AS DOUBLE) AS value
FROM w WHERE cum >= ceil(0.5 * tot) GROUP BY tag
UNION ALL
SELECT tag, 'p95', CAST(min(v) AS DOUBLE)
FROM w WHERE cum >= ceil(0.95 * tot) GROUP BY tag
""",
        # per-host peak hour: argmax with ties -> smallest hour (the
        # classic max-join-min construction, deterministic both sides)
        "host_peak_hour": base
        + """
, c AS (
  SELECT hostname, CAST(date_part('hour', ts_parsed) AS BIGINT) AS hour,
    CAST(count(*) AS BIGINT) AS n
  FROM allok
  WHERE ts_parsed IS NOT NULL AND hostname IS NOT NULL
  GROUP BY 1, 2
),
m AS (SELECT hostname, max(n) AS mx FROM c GROUP BY hostname)
SELECT c.hostname, CAST(min(c.hour) AS BIGINT) AS peak_hour,
  CAST(m.mx AS BIGINT) AS n_msgs
FROM c JOIN m ON c.hostname = m.hostname AND c.n = m.mx
GROUP BY c.hostname, m.mx
""",
        # canonical 3164 re-render from parsed fields (inverse of Dump)
        "render_3164": base
        + """
SELECT conv_id, turn_idx,
  '<' || priority || '>' || strftime(ts_parsed, '%b %d %H:%M:%S')
  || ' ' || hostname || ' '
  || CASE WHEN tag IS NOT NULL AND tag <> ''
          THEN tag || ': ' || coalesce(content, '')
          ELSE coalesce(content, '') END AS rendered
FROM ok3
""",
        # per-conv verbosity balance on the RAW table (user vs
        # assistant char totals; NULL share when neither role appears)
        "conv_role_balance": f"""
WITH rb AS (
  SELECT conv_id,
    CAST(coalesce(sum(CASE WHEN role = 'user' THEN length(text) END),
                  0) AS BIGINT) AS user_chars,
    CAST(coalesce(sum(CASE WHEN role = 'assistant' THEN length(text)
                       END), 0) AS BIGINT) AS assistant_chars
  FROM read_parquet('{path}/*.parquet') GROUP BY conv_id
)
SELECT conv_id, user_chars, assistant_chars,
  CASE WHEN user_chars + assistant_chars = 0 THEN NULL
       ELSE CAST(user_chars AS DOUBLE)
            / CAST(user_chars + assistant_chars AS DOUBLE) END
    AS user_share
FROM rb
""",
        # PII/log scrubbing: same RE2 patterns as stages/text.py
        # (IPV4_RE / PID_RE), global replacement on both sides
        "redact_pii": f"""
SELECT conv_id, turn_idx,
  regexp_replace(
    regexp_replace(text, '{_IPV4_RE_SQL}', '[ip]', 'g'),
    '{_PID_RE_SQL}', '[pid]', 'g'
  ) AS redacted
FROM read_parquet('{path}/*.parquet')
""",
        "parse_errors": base
        + f"""
, okk AS (
  SELECT conv_id, turn_idx FROM ok3
  UNION ALL SELECT conv_id, turn_idx FROM ok5
),
err_rows AS (
  SELECT t.text FROM t LEFT JOIN okk
    ON t.conv_id = okk.conv_id AND t.turn_idx = okk.turn_idx
  WHERE okk.conv_id IS NULL
)
SELECT err AS parse_error, count(*) AS n_turns FROM (
  SELECT CASE
    WHEN regexp_matches(text, '{D3}') AND regexp_matches(text, '{P3}')
      THEN 'Timestamp format unknown'
    WHEN regexp_matches(text, '{D5}') AND regexp_matches(text, '{P5}') THEN
      CASE
        WHEN TRY_CAST(regexp_extract(text, '{P5}', {P5_NAMES}).mo AS INTEGER)
             NOT BETWEEN 1 AND 12 THEN 'Invalid month in timestamp'
        WHEN TRY_CAST(regexp_extract(text, '{P5}', {P5_NAMES}).dd AS INTEGER)
             NOT BETWEEN 1 AND 31 THEN 'Invalid day in timestamp'
        ELSE 'Timestamp format unknown'
      END
    {lits}
    WHEN regexp_matches(text, '{DU}') THEN 'Can not find version'
    WHEN (regexp_matches(text, '{D3}') OR regexp_matches(text, '{D5}')
          OR regexp_matches(text, '{DQ}'))
         AND regexp_matches(text, '^[^<]')
      THEN 'No start char found for priority'
    WHEN regexp_matches(text, '^<>') THEN 'Priority field too short'
    WHEN regexp_matches(text, '^<\\d{{4}}') THEN 'Priority field too long'
    WHEN regexp_matches(text, '^<\\d{{0,3}}[^0-9>]')
      THEN 'Non digit found in priority'
    WHEN NOT (regexp_matches(text, '{D3}') OR regexp_matches(text, '{D5}')
              OR regexp_matches(text, '{DU}') OR regexp_matches(text, '{DQ}'))
      THEN 'index out of range'
  END AS err FROM err_rows
) WHERE err IS NOT NULL GROUP BY 1
""",
        # log template mining (r5 session 8): digit runs -> <N>, global
        # top-20 (count desc, template asc); RE2 '[0-9]+' global on
        # both sides, Arrow binary sort == DuckDB VARCHAR order
        "log_templates": base + """
, tpl AS (
  SELECT regexp_replace(content, '[0-9]+', '<N>', 'g') AS template,
         CAST(count(*) AS BIGINT) AS n
  FROM ok3 GROUP BY 1
)
SELECT template, n FROM tpl ORDER BY n DESC, template LIMIT 20
""",
        # process-restart audit (r5 session 8): distinct proc_ids per
        # (host, app) over clean RFC5424 parses
        "procid_churn": base + """
SELECT hostname, app_name,
  CAST(count(DISTINCT proc_id) AS BIGINT) AS n_procs,
  CAST(count(*) AS BIGINT) AS n_msgs,
  CAST(count(DISTINCT proc_id) > 1 AS BIGINT) AS multi_proc
FROM ok5 GROUP BY hostname, app_name
""",
        # LAST_VALUE IGNORE NULLS forward fill (r5 session 8): every
        # turn inherits the latest parsed severity in its conversation
        "conv_ffill_severity": base + """
SELECT t.conv_id, t.turn_idx,
  CAST(last_value(a.severity IGNORE NULLS) OVER (
    PARTITION BY t.conv_id ORDER BY t.turn_idx
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INTEGER)
    AS severity_filled
FROM t LEFT JOIN allok a
  ON t.conv_id = a.conv_id AND t.turn_idx = a.turn_idx
""",
        # STRUCTURED-DATA param introspection (r5 session 9): typed
        # extraction of [id@ver k="..." n="..."] params on SD-bearing
        # clean 5424 rows, per-keyword moments; the RE2 pattern is
        # byte-identical on both sides (Arrow extract_regex == DuckDB)
        "sd_params": base + """
, sdm AS (
  SELECT regexp_extract(structured_data,
    '^\\[([^@ \\]]+)@(\\d+) k="([^"]*)" n="(\\d+)"\\]$',
    ['sd','ver','k','n']) AS m
  FROM ok5
  WHERE structured_data <> '-' AND regexp_matches(structured_data,
    '^\\[([^@ \\]]+)@(\\d+) k="([^"]*)" n="(\\d+)"\\]$')
)
SELECT m.k AS k, CAST(count(*) AS BIGINT) AS n_msgs,
  CAST(sum(CAST(m.n AS BIGINT)) AS BIGINT) AS sum_n,
  CAST(max(CAST(m.n AS BIGINT)) AS BIGINT) AS max_n
FROM sdm GROUP BY m.k
""",
        # tool journey (r5 session 9): distinct tools per conversation
        # joined in FIRST-USE order ('' rows are non-tool turns); min
        # first_turn is unique per (conv, tool) so the agg order is total
        "conv_tool_path": f"""
WITH f AS (
  SELECT conv_id, tool, min(turn_idx) AS first_turn
  FROM read_parquet('{path}/*.parquet') WHERE tool <> ''
  GROUP BY 1, 2)
SELECT conv_id,
  string_agg(tool, '>' ORDER BY first_turn) AS tool_path,
  CAST(count(*) AS BIGINT) AS n_tools
FROM f GROUP BY conv_id
""",
        # reply-latency by role handoff (r5 session 9): adjacent-turn
        # gap stats per (prev_role, role); mean divides exact integer
        # microseconds in double
        "conv_reply_latency_by_role": f"""
WITH x AS (
  SELECT role, epoch_us(ts) AS us,
    lag(role) OVER w AS prev_role,
    lag(epoch_us(ts)) OVER w AS prev_us
  FROM read_parquet('{path}/*.parquet')
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)),
p AS (
  SELECT prev_role, role, us - prev_us AS gap
  FROM x WHERE prev_role IS NOT NULL),
a AS (
  SELECT prev_role, role, CAST(count(*) AS BIGINT) AS n_pairs,
    CAST(sum(gap) AS BIGINT) AS sum_gap_us,
    CAST(max(gap) AS BIGINT) AS max_gap_us
  FROM p GROUP BY 1, 2)
SELECT prev_role, role, n_pairs, sum_gap_us, max_gap_us,
  CAST(sum_gap_us AS DOUBLE)/CAST(n_pairs AS DOUBLE)/1e6
    AS mean_gap_sec
FROM a
""",
        # handoff graph (r5 session 9): adjacent cleanly-parsed turns in
        # a conversation whose hostname changes — LAG over (conv,
        # turn_idx) restricted to parsed rows on both sides
        "host_handoffs": base + """
, hh AS (
  SELECT hostname,
    lag(hostname) OVER (PARTITION BY conv_id ORDER BY turn_idx)
      AS prev_host
  FROM allok)
SELECT prev_host, hostname, CAST(count(*) AS BIGINT) AS n
FROM hh WHERE prev_host IS NOT NULL AND prev_host <> hostname
GROUP BY prev_host, hostname
""",
    }
