"""Deterministic synthetic transcripts (the BASELINE.json ``input_hint``
table), generated at a scale matched to each ``/root/testdata/sf*`` dir.

Schema: (conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp[us]).  The ``text`` column carries
syslog-formatted lines: ~45% RFC3164-shaped, ~45% RFC5424-shaped, ~10%
edge rows drawn from a fixed catalog of malformed shapes so the
``parse_error`` paths are exercised.  One conv_id receives ~20% of all
rows (the skew fixture for salted aggregation).  Seeded (42) and
vectorized; results are cached as Parquet under /tmp/rayslog_data/<sf>/
with atomic rename so the Ray queries and the DuckDB oracle read the
same bytes.

IMPORTANT invariant for the DuckDB correctness oracle: every generated
row is either (a) canonical — it matches the vectorized fast-path shape
validators with in-range field values, so a plain SQL regexp can parse it
identically — or (b) a catalog edge row whose parse_error the oracle SQL
can classify.  "Weird but parseable" shapes (multi-space separators,
tag-window overruns, non-ASCII) are exercised in the pytest conformance
suites instead, where parity is checked against the reference semantics
directly.
"""

from __future__ import annotations

import os
import re
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
DATA_ROOT = Path(os.environ.get("RAYSLOG_DATA_DIR", "/tmp/rayslog_data"))

_ROWS_BY_SF = {"sf0.001": 2_000, "sf0.01": 60_000, "sf0.1": 600_000}

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["", "bash", "search", "editor", "browser"]
HOSTS = [f"host-{i:03d}" for i in range(40)] + [
    "mymachine.example.com",
    "192.0.2.1",
    "localhost",
]
APPS = ["su", "sshd", "chronyd", "nginx", "postfix", "evntslog", "cron", "kernel"]
WORDS = (
    "connection accepted from closed session for user root failed auth "
    "packet dropped retry limit reached disk queue flushed cache miss "
    "ratio upstream timeout while reading response header service unit "
    "entered running state deferred mail delivery to relay scheduled job"
).split()
MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
          "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
# valid day ranges per month that avoid Feb-29 (normalization edge kept
# for pytest, out of the SQL-parity corpus)
_DAY_MAX = [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]

#: Fixed edge catalog: (text, reference parse_error).  Every entry is
#: classifiable by the oracle SQL (pattern classes or literal arms).
EDGE_CATALOG = [
    ("plain text message here", "No start char found for priority"),
    ("<12345678>1 rest here", "Can not find version"),
    ("short", "index out of range"),
    ("", "index out of range"),
    ("<>Oct 11 22:14:15 mymachine su: pri too short", "Priority field too short"),
    ("<1233>Oct 11 22:14:15 mymachine su: pri too long", "Priority field too long"),
    ("<7a8>Oct 11 22:14:15 mymachine su: pri non digit", "Non digit found in priority"),
    ("7>Oct 11 22:14:15 mymachine su: no start char", "No start char found for priority"),
    ("<34>Oct 34 32:72:82 mymachine su: bad clock", "Timestamp format unknown"),
    ("<34>Nov 31 11:11:11 mymachine su: bad day", "Timestamp format unknown"),
    ("<165>1 2023-13-11T22:14:15.003Z host su 123 ID47 - bad month", "Invalid month in timestamp"),
    ("<165>1 2023-10-34T22:14:15.003Z host su 123 ID47 - bad day", "Invalid day in timestamp"),
    ("<165>1 2023-10-11T25:14:15.003Z host su 123 ID47 - bad hour", "Timestamp format unknown"),
    ("<165>1 2023-10-11T22:74:15.003Z host su 123 ID47 - bad minute", "Timestamp format unknown"),
    ("<165>1 2023-10-11T22:14:15.000000003Z host su 123 ID47 - ns frac", "Timestamp format unknown"),
    ("<165>1 2023-10-11T22:14:15+25:00 host su 123 ID47 - bad offset", "Timestamp format unknown"),
    ("<165>1 2023-10-11T22:14:15.003Z host " + "a" * 49 + " 123 ID47 - app cap", "Invalid app name"),
    ("<165>1 2023-10-11T22:14:15.003Z host su " + "p" * 129 + " ID47 - proc cap", "Invalid proc ID"),
    ("<165>1 2023-10-11T22:14:15.003Z host su 123 " + "m" * 33 + " - msgid cap", "Invalid msg ID"),
    ("<165>1 2023-10-11T22:14:15.003Z host su 123 ID47 [unterminated sd", "No structured data"),
]


def sf_key(sf_dir: str) -> str:
    base = Path(sf_dir).name
    if base in _ROWS_BY_SF:
        return base
    return base or "sf0.01"


def rows_for(sf_dir: str) -> int:
    base = sf_key(sf_dir)
    if base in _ROWS_BY_SF:
        return _ROWS_BY_SF[base]
    m = re.match(r"sf([0-9.]+)$", base)
    if m:
        return max(2_000, int(6_000_000 * float(m.group(1))))
    return 60_000


#: rows at/above which generation fans out over Ray (when a session is
#: already up — the library never calls ray.init itself)
PARALLEL_MIN_ROWS = 4_000_000
_CHUNK_ROWS = 1_200_000
#: max rows per written part file (read task granularity; see phase2)
PART_ROWS_MAX = 400_000


def transcripts_path(sf_dir: str) -> str:
    """Generate (once, cached) and return the transcripts parquet DIR.

    The cache is a directory of part files (one read task per file in
    Ray Data — a single file would serialize the read into one task and
    bottleneck the whole pipeline) written atomically via tmp-dir +
    rename so concurrent generators converge.

    Tables >= PARALLEL_MIN_ROWS generate over Ray when a session is
    initialized (chunked two-phase plan, part files written inside the
    tasks — the driver never materializes the table); smaller tables
    use the byte-stable single-process path.
    """
    base = sf_key(sf_dir)
    out = DATA_ROOT / base / "transcripts.parquet"
    if not out.exists():
        out.parent.mkdir(parents=True, exist_ok=True)
        tmp = DATA_ROOT / base / f".tmp.transcripts.{os.getpid()}"
        tmp.mkdir(parents=True, exist_ok=True)
        n = rows_for(sf_dir)
        parallel = False
        if n >= PARALLEL_MIN_ROWS:
            try:
                import ray

                parallel = ray.is_initialized()
            except ImportError:  # pragma: no cover
                parallel = False
        if parallel:
            _parallel_generate_to(tmp, n, seed=SEED)
        else:
            tbl = generate_transcripts(n, seed=SEED)
            n_parts = min(256, max(1, n // 37_500))
            per = (n + n_parts - 1) // n_parts
            for i in range(n_parts):
                part = tbl.slice(i * per, per)
                if len(part):
                    pq.write_table(
                        part, tmp / f"part-{i:05d}.parquet",
                        row_group_size=32_768,
                    )
        try:
            os.replace(tmp, out)
        except OSError:  # a concurrent generator won the race
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    return str(out)


def _conv_weights(n_convs: int) -> np.ndarray:
    """conv 0 is the hot key (~20% of rows); the rest follow a 1/k
    Zipf tail."""
    w = 1.0 / np.arange(1, n_convs + 1)
    w[0] = 0.0
    w = w / w.sum() * 0.8
    w[0] = 0.2
    return w


def _dense_turns(conv: np.ndarray) -> np.ndarray:
    """Dense per-conv rank in row order (0..count-1 per conv)."""
    n = len(conv)
    order = np.argsort(conv, kind="stable")
    sorted_conv = conv[order]
    run_start = np.flatnonzero(
        np.r_[True, sorted_conv[1:] != sorted_conv[:-1]]
    )
    counts = np.diff(np.r_[run_start, n])
    turn_sorted = np.arange(n) - np.repeat(run_start, counts)
    turn_idx = np.empty(n, dtype=np.int64)
    turn_idx[order] = turn_sorted
    return turn_idx


def generate_transcripts(n_rows: int, seed: int = SEED) -> pa.Table:
    """Single-process generation (byte-stable: draw order unchanged
    since round 1; the parallel path reuses _assemble per chunk)."""
    rng = np.random.default_rng(seed)
    n_convs = max(20, n_rows // 120)
    conv = rng.choice(n_convs, size=n_rows, p=_conv_weights(n_convs))
    turn_idx = _dense_turns(conv)
    return _assemble(rng, conv, turn_idx, n_convs, row_start=0)


def _parallel_generate_to(tmp, n_rows: int, seed: int = SEED) -> None:
    """Chunked two-phase generation over Ray tasks; part files are
    written INSIDE the tasks (the driver never holds the table).

    Invariants preserved vs the single-process path (same distributions,
    not the same bytes — per-chunk rng streams differ):

    - hot-conv share: every chunk draws convs from the same weight
      vector, so conv 0 still carries ~20% overall;
    - turn_idx density: phase 1 counts per-(chunk, conv) occupancy;
      the driver computes exclusive per-conv prefix offsets across
      chunks; phase 2 adds them to the chunk-local dense ranks — the
      result is 0..count-1 per conv over the WHOLE table, exactly like
      _dense_turns on the full array;
    - canonical/edge text contract: _assemble is the same code.
    """
    import ray

    n_convs = max(20, n_rows // 120)
    chunks = []
    start = 0
    while start < n_rows:
        n = min(_CHUNK_ROWS, n_rows - start)
        chunks.append((len(chunks), start, n))
        start += n
    w_ref = ray.put(_conv_weights(n_convs))

    @ray.remote
    def phase1(i: int, n: int):
        rng = np.random.default_rng([seed, i])
        conv = rng.choice(n_convs, size=n, p=ray.get(w_ref))
        return np.bincount(conv, minlength=n_convs).astype(np.int64)

    counts = ray.get([phase1.remote(i, n) for i, _, n in chunks])
    # exclusive prefix across chunks, per conv
    offsets = [np.zeros(n_convs, dtype=np.int64)]
    for c in counts[:-1]:
        offsets.append(offsets[-1] + c)

    tmp = str(tmp)

    @ray.remote
    def phase2(i: int, row_start: int, n: int, off_vec: np.ndarray):
        rng = np.random.default_rng([seed, i])
        conv = rng.choice(n_convs, size=n, p=ray.get(w_ref))
        turn_idx = _dense_turns(conv) + off_vec[conv]
        tbl = _assemble(rng, conv, turn_idx, n_convs, row_start=row_start)
        # write each chunk as ~PART_ROWS_MAX-row part files: table
        # CONTENT is untouched (same rows, same order — rng streams
        # stay per-chunk), but read->parse tasks get ~0.6s granularity
        # instead of ~2s, shrinking the straggler tail on scaling legs
        # (64 x 1.2M-row tasks over 16 slots measured ~0.7s of tail)
        n_sub = max(1, -(-len(tbl) // PART_ROWS_MAX))
        per = -(-len(tbl) // n_sub)
        for j in range(n_sub):
            part = tbl.slice(j * per, per)
            if len(part):
                pq.write_table(
                    part, f"{tmp}/part-{i:05d}-{j}.parquet",
                    row_group_size=32_768,
                )
        return n

    done = ray.get(
        [
            phase2.remote(i, s, n, offsets[i])
            for i, s, n in chunks
        ]
    )
    assert sum(done) == n_rows


def _assemble(
    rng: np.random.Generator,
    conv: np.ndarray,
    turn_idx: np.ndarray,
    n_convs: int,
    row_start: int,
) -> pa.Table:
    """Everything after conv/turn assignment: the remaining draws (in
    the round-1 stream order) + vectorized Arrow text assembly.
    ``row_start`` anchors global-row-derived values (ts base, the
    odd-row day padding) so chunked generation matches the full-table
    shapes."""
    n_rows = len(conv)
    global_idx = row_start + np.arange(n_rows, dtype=np.int64)
    role = rng.choice(len(ROLES), size=n_rows)
    tool = rng.choice(len(TOOLS), size=n_rows, p=[0.6, 0.1, 0.1, 0.1, 0.1])
    ts_us = (
        np.int64(1_748_736_000_000_000)  # 2025-06-01T00:00:00Z
        + global_idx * 1_000_000
        + rng.integers(0, 1_000_000, n_rows)
    )

    # message shaping — all randomness drawn up front (array draws keep
    # the rng stream identical to the original per-row implementation),
    # then the text column is assembled with vectorized Arrow kernels
    # (binary_join_element_wise + if_else; byte-identical to the f-string
    # builder it replaced, ~2x faster).
    shape = rng.random(n_rows)
    pri = rng.integers(0, 192, n_rows)
    mon = rng.integers(0, 12, n_rows)
    day = 1 + rng.integers(0, np.array(_DAY_MAX)[mon])
    hh = rng.integers(0, 24, n_rows)
    mi = rng.integers(0, 60, n_rows)
    ss = rng.integers(0, 60, n_rows)
    host_i = rng.integers(0, len(HOSTS), n_rows)
    app_i = rng.integers(0, len(APPS), n_rows)
    pid = rng.integers(1, 99_999, n_rows)
    w1 = rng.integers(0, len(WORDS), n_rows)
    w2 = rng.integers(0, len(WORDS), n_rows)
    w3 = rng.integers(0, len(WORDS), n_rows)  # kept for rng-stream parity
    nwords = rng.integers(2, 9, n_rows)
    frac_kind = rng.integers(0, 3, n_rows)      # none / .003 / .000003-style
    off_kind = rng.integers(0, 4, n_rows)       # Z, Z, +02:00, -07:00
    nil_kind = rng.integers(0, 12, n_rows)      # occasional NILVALUEs
    sd_kind = rng.integers(0, 4, n_rows)        # one SD element vs '-'
    tag_kind = rng.integers(0, 3, n_rows)       # app[pid]: / app: / bare
    day5 = 1 + rng.integers(0, 28, n_rows)
    edge_pick = rng.integers(0, len(EDGE_CATALOG), n_rows)

    import pyarrow.compute as pc

    # assembly runs in large_string: 32-bit utf8 offsets overflow past
    # ~2 GB of total text (76.8M-row scaling tables); small tables cast
    # back to string at the end
    L = len(WORDS)
    body_table = np.empty((L, 9), dtype=object)
    for w in range(L):
        for k in range(2, 9):
            body_table[w, k] = " ".join(WORDS[(w + j) % L] for j in range(k))
    body_flat = pa.array(
        [body_table[w, k] or "" for w in range(L) for k in range(9)],
        pa.large_string(),
    )
    body = pc.take(body_flat, pa.array(w1 * 9 + nwords))

    def s_(x):
        return pc.cast(pa.array(x), pa.large_string())

    def pad(x, width, ch="0"):
        return pc.utf8_lpad(s_(x), width, ch)

    def J(*a):
        return pc.binary_join_element_wise(
            *a, pa.scalar("", pa.large_string())
        )

    def const(c):
        # scalars broadcast through Arrow kernels — never materialize
        # n_rows copies of a literal
        return pa.scalar(c, pa.large_string())

    months_a = pc.take(pa.array(MONTHS, pa.large_string()), pa.array(mon))
    hosts_a = pc.take(pa.array(HOSTS, pa.large_string()), pa.array(host_i))
    apps_a = pc.take(pa.array(APPS, pa.large_string()), pa.array(app_i))
    pri_s, pid_s = s_(pri), s_(pid)
    odd = pa.array((global_idx & 1).astype(bool))
    dayf = pc.if_else(odd, pad(day, 2, " "), pad(day, 2))
    head3 = J(const("<"), pri_s, const(">"), months_a, const(" "), dayf,
              const(" "), pad(hh, 2), const(":"), pad(mi, 2), const(":"),
              pad(ss, 2), const(" "), hosts_a, const(" "))
    tk = pa.array(tag_kind)
    tagpart = pc.if_else(
        pc.equal(tk, 0), J(apps_a, const("["), pid_s, const("]: "), body),
        pc.if_else(pc.equal(tk, 1), J(apps_a, const(": "), body),
                   J(apps_a, const(" "), body)),
    )
    t3164 = J(head3, tagpart)

    tsf = J(const("2023-"), pad(mon + 1, 2), const("-"), pad(day5, 2),
            const("T"), pad(hh, 2), const(":"), pad(mi, 2), const(":"),
            pad(ss, 2))
    fk = pa.array(frac_kind)
    frac = pc.if_else(
        pc.equal(fk, 1), J(const("."), pad(pid % 1000, 3)),
        pc.if_else(pc.equal(fk, 2), J(const("."), pad(pid % 1000000, 6)),
                   const("")),
    )
    offs = pc.take(
        pa.array(["Z", "Z", "+02:00", "-07:00"], pa.large_string()),
        pa.array(off_kind),
    )
    nk = pa.array(nil_kind)
    tsf = pc.if_else(pc.equal(nk, 0), const("-"), J(tsf, frac, offs))
    hostp = pc.if_else(pc.equal(nk, 1), const("-"), hosts_a)
    appp = pc.if_else(pc.equal(nk, 2), const("-"), apps_a)
    procp = pc.if_else(pc.equal(nk, 3), const("-"), pid_s)
    msgidp = pc.if_else(pc.equal(nk, 4), const("-"),
                        J(const("ID"), s_(pid % 100)))
    w2words = pc.take(pa.array(WORDS, pa.large_string()), pa.array(w2))
    sd = pc.if_else(
        pc.equal(pa.array(sd_kind), 0),
        J(const("[meta@"), s_(pid % 100), const(' k="'), w2words,
          const('" n="'), pid_s, const('"]')),
        const("-"),
    )
    line5 = J(const("<"), pri_s, const(">1 "), tsf, const(" "), hostp,
              const(" "), appp, const(" "), procp, const(" "), msgidp,
              const(" "), sd)
    line5 = pc.if_else(pc.equal(nk, 5), line5, J(line5, const(" "), body))

    catalog_a = pc.take(
        pa.array([t for t, _ in EDGE_CATALOG], pa.large_string()),
        pa.array(edge_pick),
    )
    sh = pa.array(shape)
    texts_arr = pc.if_else(
        pc.less(sh, 0.45), t3164,
        pc.if_else(pc.less(sh, 0.90), line5, catalog_a),
    )
    if n_rows < 20_000_000:  # fits 32-bit offsets comfortably
        texts_arr = texts_arr.cast(pa.string())

    conv_ids = pa.array(
        [f"conv-{c:06d}" for c in range(n_convs)], pa.string()
    )
    return pa.table(
        {
            "conv_id": pc.take(conv_ids, pa.array(conv)),
            "turn_idx": pa.array(turn_idx.astype(np.int32), pa.int32()),
            "role": pc.take(pa.array(ROLES, pa.string()), pa.array(role)),
            "text": texts_arr,
            "tool": pc.take(pa.array(TOOLS, pa.string()), pa.array(tool)),
            "ts": pa.array(ts_us, pa.timestamp("us")),
        }
    )
