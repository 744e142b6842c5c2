"""Pins the __spark_entry__ driver contract: entry() runs and yields a
stable schema, and every queries() entry has its oracle_sql() twin
(the driver's correctness gate hashes Spark vs DuckDB per key)."""

from __future__ import annotations

import __spark_entry__ as entrymod  # repo root on sys.path via conftest


def test_queries_and_oracles_agree():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(q) == set(o), (
        f"missing oracles: {sorted(set(q) - set(o))}; "
        f"orphan oracles: {sorted(set(o) - set(q))}"
    )
    assert len(q) == 50


def test_entry_runs_with_stable_schema(spark):
    df = entrymod.entry(spark)
    cols = df.columns
    # the flagship per-doc output: id + metadata projection
    assert cols[0] == "doc_id"
    assert "title" in cols and "content_type" in cols
    rows = df.limit(5).collect()
    assert len(rows) >= 1
    # re-derivation yields the same schema (driver smoke-checks this)
    assert entrymod.entry(spark).schema == df.schema
