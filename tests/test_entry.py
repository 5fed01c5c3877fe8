"""Driver-contract smoke tests for __ray_entry__."""

import sys

sys.path.insert(0, "/root/repo")

import __ray_entry__ as entrymod  # noqa: E402


def test_queries_oracle_key_consistency():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q), "every oracle key must have a query"
    assert len(q) >= 20


def test_entry_runs(ray_session):
    out = entrymod.entry()
    assert len(out) >= 0
    assert {"repo", "path", "commit", "lang", "content"} <= set(out.columns)
