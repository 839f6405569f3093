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


def test_registry_fits_driver_window():
    """The driver's correctness harness scores only the first
    ``DRIVER_QUERY_CAP`` registered queries — a query added past the cap
    silently evicts an attested row (this cost x_table_parse_service its
    round-3 row).  Guard both the cap and the flagship ordering."""
    from engine.relational import DRIVER_QUERY_CAP, PRIORITY_FLAGSHIP, registry

    names = list(_QUERIES)
    assert len(names) <= DRIVER_QUERY_CAP, (
        f"{len(names)} queries registered — retire/consolidate to fit the "
        f"driver's {DRIVER_QUERY_CAP}-row correctness window"
    )
    flagships = [q.name for q in registry() if q.priority <= PRIORITY_FLAGSHIP]
    assert set(flagships) <= set(names[:DRIVER_QUERY_CAP])
    for must in (
        "train_corpus_filtered",
        "x_curate_interleaved_spans",
        "x_table_parse_service",
        "x_media_route_counts",
        "x_qr_rotation_hist",
        "x_documents_by_mode",
        "x_audit_documents",
        "x_audit_media_pixels",
        "text_repetition",
        "text_dsir_select",
        "train_corpus_ccnet",
    ):
        assert must in names[:DRIVER_QUERY_CAP], f"{must} evicted from driver window"


def test_bench_headline_names_are_registered():
    """bench.py times queries by registry name; a retired/renamed query left
    in HEADLINE crashes the driver's bench run (text_tokens did in round 4)."""
    import bench

    missing = set(bench.HEADLINE) - set(_QUERIES)
    assert missing == set(), f"bench.HEADLINE names not in registry: {missing}"


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


# --- queries retired from the driver window (COVERAGE.md §window budget) ---
# Retirement never means untested: every unregistered-but-oracle'd function
# lives in engine.relational.local_registry() and runs through the SAME
# driver-identical compare here.  Adding a future retiree = move its @_q to
# @_local_q; this test picks it up automatically.

from engine.relational import local_registry  # noqa: E402

_LOCAL = {q.name: q for q in local_registry()}


def test_local_registry_disjoint_from_driver_window():
    overlap = set(_LOCAL) & set(_QUERIES)
    assert overlap == set(), f"registered in BOTH windows: {overlap}"


@pytest.mark.parametrize("name", sorted(_LOCAL))
def test_local_query_matches_oracle(spark, con, name):
    q = _LOCAL[name]
    ok, msg = compare(q.build(spark, SF_DIR), con, q.sql)
    assert ok, f"{name}: {msg}"


def test_topk_plan_is_take_ordered(spark):
    """T1's scale property — global top-k with NO full sort/exchange — is a
    plan shape, not a value: pin it here since the value check moved to the
    local registry."""
    plan = (
        _LOCAL["t1_topk_orders"]
        .build(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


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
