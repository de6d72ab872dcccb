"""Runs every __spark_entry__ queries() entry against its oracle_sql()
via DuckDB at sf0.001 — the local replica of the driver's gate."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_compare import compare, duckdb_con


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["doc_id", "score"]


def _query_names():
    return sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_vs_oracle(spark, sf_dir, con, name):
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    df = queries[name](spark, sf_dir)
    if name not in oracles:
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    compare(df, con, oracles[name], name)
