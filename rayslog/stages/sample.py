"""Deterministic stratified sampling.

Every curation pipeline ends in a sample step; a seeded hash-threshold
rule makes it exactly reproducible (and exactly SQL-checkable): keep a
row iff ``splitmix64(key * GOLDEN + seed) < rate(stratum) * 2^64``.
Properties that matter at 100 TB:

- **stateless + embarrassingly parallel**: the keep decision is a pure
  function of (key, seed, stratum) — no shuffle, no coordination, no
  RNG state; any re-run / retry / resume selects the identical rows.
- **stratified**: each stratum (e.g. language or source) gets its own
  rate, so the sample rebalances a skewed corpus in one streaming pass.
- **oracle-exact**: the same splitmix64 is expressed in portable SQL
  (128-bit split multiply; see ``sample_sql_hash_expr``) — engine and
  DuckDB agree bit-for-bit, verified in tests and the driver's
  correctness gate.

Keys must be non-negative int64 (the SQL side casts BIGINT -> UBIGINT,
which rejects negatives; the engine raises to match).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_GOLDEN = 0x9E3779B97F4A7C15
_C1 = 0xBF58476D1CE4E5B9
_C2 = 0x94D049BB133111EB
_M64 = 1 << 64
_M32 = 1 << 32


def splitmix64(x: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 keys (wraparound
    arithmetic; mirrored exactly by ``sample_sql_hash_expr``)."""
    h = x.astype(np.uint64) * np.uint64(_GOLDEN) + np.uint64(seed)
    h ^= h >> np.uint64(30)
    h = h * np.uint64(_C1)
    h ^= h >> np.uint64(27)
    h = h * np.uint64(_C2)
    h ^= h >> np.uint64(31)
    return h


def rate_threshold(rate: float) -> int:
    """The integer threshold for ``hash < rate * 2^64`` — computed ONCE
    here and embedded as a literal on both the engine and SQL sides so
    the comparison is identical."""
    if rate >= 1.0:
        return _M64  # keep-all sentinel (engine: all-true mask)
    if rate <= 0.0:
        return 0
    return int(rate * _M64)


def _sql_mul64(xcol: str, c: int) -> str:
    """64-bit wraparound multiply in DuckDB without INT128 overflow:
    split the multiplicand into 32-bit halves."""
    return (
        f"CAST(((CAST(({xcol} >> 32) AS HUGEINT) * {c} % {_M32}) * {_M32} "
        f"+ CAST(({xcol} % {_M32}) AS HUGEINT) * {c}) % {_M64} AS UBIGINT)"
    )


def sample_sql_hash_expr(key_col: str, seed: int) -> str:
    """A DuckDB scalar expression computing ``splitmix64(key, seed)``
    as UBIGINT — verified bit-identical to the numpy kernel."""
    x0 = (
        f"CAST(({_sql_mul64(f'CAST({key_col} AS UBIGINT)', _GOLDEN)}"
        f" + {seed}) % {_M64} AS UBIGINT)"
    )
    x1 = f"xor({x0}, ({x0}) >> 30)"
    x2 = _sql_mul64(f"({x1})", _C1)
    x3 = f"xor({x2}, ({x2}) >> 27)"
    x4 = _sql_mul64(f"({x3})", _C2)
    return f"xor({x4}, ({x4}) >> 31)"


def stratified_sample(
    ds,
    strata_col: str = "lang",
    rates: dict[str, float] | None = None,
    default_rate: float = 0.5,
    key_col: str = "doc_id",
    seed: int = 42,
):
    """Keep each row iff splitmix64(key, seed) < rate(stratum) * 2^64.

    One streaming ``map_batches`` pass; the stratum->threshold map is a
    tiny closure constant (no broadcast needed).  Deterministic: two
    runs — or a run and its SQL oracle — select identical rows.
    """
    rates = dict(rates or {})
    strata = sorted(rates)
    thresholds = np.array(
        [min(rate_threshold(rates[s]), _M64 - 1) for s in strata],
        dtype=np.uint64,
    )
    keep_all = np.array(
        [rate_threshold(rates[s]) >= _M64 for s in strata], dtype=bool
    )
    def_th = np.uint64(min(rate_threshold(default_rate), _M64 - 1))
    def_keep_all = rate_threshold(default_rate) >= _M64
    value_set = pa.array(strata, pa.string())

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column(key_col).to_numpy(zero_copy_only=False)
        if len(ids) and ids.min() < 0:
            raise ValueError(
                f"stratified_sample: negative {key_col} (SQL parity "
                "requires non-negative keys)"
            )
        h = splitmix64(ids.astype(np.uint64), seed)
        idx = pc.fill_null(
            pc.index_in(t.column(strata_col), value_set=value_set), -1
        )
        ii = idx.to_numpy(zero_copy_only=False).astype(np.int64)
        known = ii >= 0
        ii = np.where(known, ii, 0)
        if len(strata):
            thr = np.where(known, thresholds[ii], def_th)
            ka = np.where(known, keep_all[ii], def_keep_all)
        else:
            thr = np.full(len(ids), def_th, dtype=np.uint64)
            ka = np.full(len(ids), def_keep_all, dtype=bool)
        keep = ka | (h < thr)
        return t.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def mix_rates(
    counts: dict[str, int],
    target: dict[str, float],
    out_fraction: float,
) -> dict[str, float]:
    """Per-stratum keep rates that rebalance a skewed corpus to a
    target mix: quota_s = target_share_s x out_fraction x N_total,
    rate_s = min(1, quota_s / N_s).  The float expression is evaluated
    left-to-right exactly as ``domain_mix_sql`` writes it, so the
    derived thresholds are bit-identical on both sides."""
    n_total = float(sum(counts.values()))
    return {
        s: min(1.0, target.get(s, 0.0) * out_fraction * n_total / float(n))
        for s, n in counts.items()
    }


def domain_mix_sql(
    table_sql: str,
    columns: list[str],
    strata_col: str,
    target: dict[str, float],
    out_fraction: float,
    key_col: str = "doc_id",
    seed: int = 42,
) -> str:
    """DuckDB oracle for the domain-mix sample: recomputes the SAME
    rates from its own counts (same float literals, same left-to-right
    expression as :func:`mix_rates`), then applies the same
    splitmix64-threshold rule (`floor(rate * 2^64)` == Python
    ``int(rate * 2**64)`` for rate in [0,1))."""
    h = sample_sql_hash_expr(key_col, seed)
    case = (
        "CASE "
        + " ".join(
            f"WHEN s = '{k}' THEN {v!r}" for k, v in sorted(target.items())
        )
        + " ELSE 0.0 END"
    )
    cols = ", ".join(f"t.{c}" for c in columns)
    return f"""
WITH c AS (SELECT {strata_col} AS s, CAST(count(*) AS DOUBLE) AS ns
           FROM {table_sql} GROUP BY {strata_col}),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM {table_sql}),
r AS (SELECT s, LEAST(1.0, ({case}) * {out_fraction!r} * tot.n / ns)
        AS rate FROM c CROSS JOIN tot)
SELECT {cols} FROM {table_sql} t JOIN r ON t.{strata_col} = r.s
WHERE CASE WHEN r.rate >= 1.0 THEN TRUE
      ELSE {h} < CAST(floor(r.rate * 18446744073709551616.0) AS UBIGINT)
      END
"""


def stratified_sample_sql(
    table_sql: str,
    columns: list[str],
    strata_col: str = "lang",
    rates: dict[str, float] | None = None,
    default_rate: float = 0.5,
    key_col: str = "doc_id",
    seed: int = 42,
) -> str:
    """The DuckDB oracle for :func:`stratified_sample` — same strata,
    same thresholds (shared ``rate_threshold`` literals), same hash."""
    rates = dict(rates or {})
    h = sample_sql_hash_expr(key_col, seed)
    # per-stratum predicate: keep-all strata compare TRUE, others
    # compare hash < literal threshold
    preds = []
    for s, r in sorted(rates.items()):
        t = rate_threshold(r)
        if t >= _M64:
            preds.append(f"WHEN {strata_col} = '{s}' THEN TRUE")
        else:
            preds.append(f"WHEN {strata_col} = '{s}' THEN {h} < {t}")
    dt = rate_threshold(default_rate)
    default_pred = "TRUE" if dt >= _M64 else f"{h} < {dt}"
    case = "CASE " + " ".join(preds) + f" ELSE {default_pred} END"
    cols = ", ".join(columns)
    return f"SELECT {cols} FROM {table_sql} WHERE {case}"


def token_budget_sample(ds, budget: int, seed: int = 7,
                        group_col: str = "source",
                        id_col: str = "doc_id", text_col: str = "text",
                        parts: int = 16):
    """Deterministic token-budget-capped per-domain sample: walk each
    domain's docs in seeded splitmix64(id) order (ties by id) and keep
    docs while the domain's INCLUSIVE running token total stays within
    ``budget`` — the mixture-building step that hits a target token
    count per domain instead of a rate (rates over-/under-shoot when
    doc lengths vary; budgets are what a data card specifies).

    Plan: one streaming featurize (id, group, n_tokens, key) — the
    payload text never leaves the scan — then ONE group-hash
    ``task_exchange``; inside a part everything is vectorized (group
    run detection via dictionary codes, lexsort by (group, key, id),
    cumulative sum with per-run reset).  Bounded strata assumption:
    the per-group ordered walk lives inside one part, so one group's
    (id, n_tokens) rows must fit a task — domains/sources are
    enumerable; for corpus-sized group keys use rate-based
    ``stratified_sample`` instead.  The SQL oracle is the equivalent
    window sum (same hash expression, bit-identical order).
    """
    import pyarrow.compute as pc

    from rayslog.kernels.texthash import col_hash64
    from rayslog.stages.aggregate import task_exchange

    def featurize(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        if len(ids) and ids.min() < 0:
            raise ValueError("token_budget_sample requires non-negative ids")
        k = splitmix64(ids.astype(np.uint64), seed)
        gh = col_hash64(t.column(group_col))
        return pa.table(
            {
                id_col: t.column(id_col),
                group_col: t.column(group_col),
                "n_tokens": pc.cast(
                    pc.fill_null(
                        pc.count_substring_regex(t.column(text_col), r"\S+"),
                        0,
                    ),
                    pa.int64(),
                ),
                "k": pa.array(k.view(np.int64)),
                "gpart": pa.array(
                    (gh % np.uint64(parts)).astype(np.int32)
                ),
            }
        )

    def per_part(t: pa.Table) -> pa.Table:
        gtype = t.schema.field(group_col).type
        if not t.num_rows:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    group_col: pa.array([], gtype),
                    "n_tokens": pa.array([], pa.int64()),
                }
            )
        garr = t.column(group_col)
        if isinstance(garr, pa.ChunkedArray):
            garr = garr.combine_chunks()
        codes = np.asarray(garr.dictionary_encode().indices)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        n = t.column("n_tokens").to_numpy(zero_copy_only=False)
        k = t.column("k").to_numpy(zero_copy_only=False).view(np.uint64)
        order = np.lexsort((ids, k, codes))
        c, nn = codes[order], n[order]
        cum = np.cumsum(nn)
        first = np.r_[True, c[1:] != c[:-1]]
        starts = np.nonzero(first)[0]
        runs = np.diff(np.r_[starts, len(c)])
        # reset the running sum at each group's start (exclusive base)
        base = np.repeat(cum[starts] - nn[starts], runs)
        keep = (cum - base) <= budget
        sel = np.asarray(order)[keep]
        return pa.table(
            {
                id_col: pa.array(ids[sel].astype("int64")),
                group_col: garr.take(pa.array(sel.astype(np.int64))),
                "n_tokens": pa.array(n[sel].astype("int64")),
            }
        )

    return task_exchange(
        ds, "gpart", parts, per_part, pre_fn=featurize
    )


def token_budget_sample_sql(table: str, budget: int, seed: int = 7,
                            group_col: str = "source",
                            id_col: str = "doc_id",
                            text_col: str = "text") -> str:
    """DuckDB oracle: the identical splitmix64 order + window sum."""
    h = sample_sql_hash_expr(id_col, seed)
    return f"""
WITH t AS (
  SELECT {id_col}, {group_col},
    CAST(len(regexp_extract_all({text_col}, '\\S+')) AS BIGINT)
      AS n_tokens,
    {h} AS k
  FROM {table}
),
w AS (
  SELECT {id_col}, {group_col}, n_tokens,
    SUM(n_tokens) OVER (PARTITION BY {group_col}
                        ORDER BY k, {id_col}
                        ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT {id_col}, {group_col}, n_tokens FROM w WHERE cum <= {budget}
"""
