"""Pre-driver gate: every queries() entry matches its oracle_sql() on DuckDB
at sf=0.01 (row count + column names + order-insensitive canonical values),
mirroring the driver's CORRECTNESS check."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry_mod
from tests.parity import compare, duck_conn

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.01")

_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()


def test_every_query_has_an_oracle_or_is_flagged():
    missing = set(_QUERIES) - set(_ORACLES)
    assert missing == set(), f"queries without oracle SQL (rows-only fallback): {missing}"


@pytest.fixture(scope="module")
def con():
    c = duck_conn(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, con, name):
    df = _QUERIES[name](spark, SF_DIR)
    if name not in _ORACLES:
        assert df.count() >= 0
        return
    ok, msg = compare(df, con, _ORACLES[name])
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert [f.name for f in df.schema.fields] == [
        "doc_id",
        "kind",
        "text",
        "media_ref",
        "offset",
    ]
