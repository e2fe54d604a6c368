"""Driver-contract invariants (CLAUDE.md #5): the library and
__ray_entry__ never own a Ray session, and queries()/oracle_sql() keys
line up."""

from __future__ import annotations

import pathlib

ROOT = pathlib.Path(__file__).resolve().parents[1]


def test_library_never_calls_ray_init():
    """Only bench.py, the CLI and the test fixture may init/shutdown
    Ray; library modules and __ray_entry__ must not."""
    import ast

    allowed = {ROOT / "bench.py", ROOT / "rayslog" / "cli.py"}
    offenders = []
    for p in [ROOT / "__ray_entry__.py", *sorted((ROOT / "rayslog").rglob("*.py"))]:
        if p in allowed:
            continue
        tree = ast.parse(p.read_text())
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr in ("init", "shutdown")
                and isinstance(node.func.value, ast.Name)
                and node.func.value.id == "ray"
            ):
                offenders.append(f"{p}:{node.lineno}")
    assert not offenders, offenders


def test_queries_and_oracles_line_up(ray_session):
    # ray_session: oracle_sql() may build the sf0.01 IVF index on a
    # cold /tmp (the ann_ivf oracle embeds its frozen centroids)
    import __ray_entry__ as em

    q = em.queries()
    o = em.oracle_sql()
    # every oracle key has a query; rows-only set is the documented one
    assert set(o) <= set(q), set(o) - set(q)
    rows_only = set(q) - set(o)
    assert rows_only == {
        "doc_fingerprint",
        "media_features", "media_decode", "approx_distinct",
    }, rows_only
    assert len(q) == 241 and len(o) == 237
    # the driver oracle-checks only the FIRST 50 entries: every window
    # slot must be oracle-backed (rows-only entries go to the tail)
    assert all(name in o for name in list(q)[:50])
