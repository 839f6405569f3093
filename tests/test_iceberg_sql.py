"""Jar-less dry-run gate for the Iceberg mapping (ICEBERG.md): every DDL/DML
statement the deployment path would execute must PARSE on Spark's own SQL
parser, and the flat-table DDL must match the live output schemas so the
document cannot drift from the code.

The runtime jar is absent in this sandbox (ICEBERG.md §1), so execution is
exercised only on a real deployment — this test pins down everything short
of that: syntax, column lists, and the one statement (CALL expire_snapshots)
that genuinely needs the Iceberg parser extension."""

from __future__ import annotations

import re

import pytest

from engine import iceberg


def _parse(spark, sql: str):
    return spark._jsparkSession.sessionState().sqlParser().parsePlan(sql)


def test_all_statements_parse_without_iceberg_jar(spark):
    stmts = iceberg.parse_checked_statements("r1")
    assert len(stmts) >= 12
    for sql in stmts:
        _parse(spark, sql)  # raises ParseException on bad syntax


def test_expire_snapshots_call_parses_as_procedure(spark):
    """Spark 4 parses CALL natively (SQL stored procedures) — the plan is an
    unresolved procedure invocation; execution needs Iceberg's procedure
    catalog, which is the deployment-only part."""
    plan = str(_parse(spark, iceberg.expire_snapshots_call()))
    assert "expire_snapshots" in plan


def _ddl_columns(ddl: str) -> dict[str, str]:
    """column -> type from the parenthesized column list of a CREATE TABLE."""
    body = ddl[ddl.index("(") + 1 : ddl.index(") USING")]
    cols = {}
    for part in re.split(r",(?![^<]*>)", body):  # don't split inside ARRAY<...>
        name, typ = part.strip().split(None, 1)
        cols[name] = re.sub(r"\s+", " ", typ.strip().upper())
    return cols


def test_output_ddl_matches_live_schemas(spark):
    """The flat output tables' DDL mirrors engine/metrics.py exactly — drift
    between the Iceberg mapping and the real frames fails here."""
    from pyspark.sql import functions as F

    from engine.io import derive_outputs

    spine = spark.createDataFrame(
        [
            ("d1", 0, "text", None, "hello", "kept", None, None, None, None),
            ("d1", 1, "media", "m1", "world", "kept", None, 0.9, "massara", 0),
        ],
        "doc_id string, offset int, kind string, media_ref string, "
        "out_text string, status string, reason string, conf double, "
        "mode string, qr_rotation int",
    )
    outs = derive_outputs(spine, "r1")
    ddls = {d.split(".extract.")[1].split("(")[0].strip(): d for d in iceberg.output_ddl()}
    type_map = {"string": "STRING", "int": "INT", "bigint": "BIGINT", "double": "DOUBLE"}
    for name in ("lineage", "metrics", "conf_hist", "run_totals"):
        df = outs[name]
        # DDL column lists lead with run_id; the frames carry run_id too
        want = {
            f.name: type_map[f.dataType.simpleString()] for f in df.schema.fields
        }
        got = _ddl_columns(ddls[name])
        assert got == want, f"{name}: DDL {got} != live schema {want}"
    # spine DDL covers exactly the spine columns + run_id
    got = _ddl_columns(ddls["spine"])
    want = {
        f.name: type_map[f.dataType.simpleString()] for f in spine.schema.fields
    }
    want["run_id"] = "STRING"
    assert got == want


def test_spine_ddl_matches_build_spine_schema(spark):
    """SPINE_DDL (the single source for Iceberg DDL and io.py's
    schema-explicit resume/heal reads) must equal build_spine's LIVE output
    schema: an explicit-schema parquet read silently drops a column the
    DDL doesn't know about, so drift here would make healed derived
    outputs diverge from fresh ones without an error."""
    from pyspark.sql.types import StructType

    from engine.fixtures import corpus_rows
    from engine.pipeline import build_spine
    from engine.schema import MEDIA_BLOBS_SCHEMA, SPANS_SCHEMA, SPINE_DDL

    spans_rows, blob_rows = corpus_rows(4, seed=3)
    live = build_spine(
        spark,
        spark.createDataFrame(spans_rows, SPANS_SCHEMA),
        spark.createDataFrame(blob_rows, MEDIA_BLOBS_SCHEMA),
    ).schema
    pinned = StructType.fromDDL(SPINE_DDL)
    assert [(f.name, f.dataType) for f in live.fields] == [
        (f.name, f.dataType) for f in pinned.fields
    ]


def test_media_groups_ddl_matches_live_schema(spark):
    """media_groups DDL is pinned to media_dedup_exact's LIVE output schema
    (media_dedup_features shares the same _dedup_refs_by_fp tail, so one
    pin covers both fronts)."""
    from pyspark.sql.types import BinaryType, StringType, StructField, StructType

    from engine.trainops import media_dedup_exact

    blobs = spark.createDataFrame(
        [("r1", b"\x01"), ("r2", b"\x01")],
        StructType(
            [
                StructField("media_ref", StringType()),
                StructField("payload", BinaryType()),
            ]
        ),
    )
    live = media_dedup_exact(blobs).schema
    type_map = {"string": "STRING", "bigint": "BIGINT", "boolean": "BOOLEAN"}
    want = {f.name: type_map[f.dataType.simpleString()] for f in live.fields}
    got = _ddl_columns(iceberg.media_groups_ddl())
    assert got == want, f"DDL {got} != live schema {want}"


def test_semantic_cells_ddl_matches_live_schema(spark):
    """semantic_cells DDL is pinned to kmeans_assign's LIVE assignment
    schema (the frame sample_cluster_balanced and dedup_semdedup consume)."""
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        LongType,
        StructField,
        StructType,
    )

    from engine.iceberg import semantic_cells_ddl
    from engine.trainops import kmeans_assign

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0])],
        StructType(
            [
                StructField("vec_id", LongType()),
                StructField("embedding", ArrayType(FloatType())),
            ]
        ),
    )
    live = kmeans_assign(emb, k=2, iters=2).select("vec_id", "cluster").schema
    ddl = semantic_cells_ddl()
    cols = ddl.split("(", 1)[1].split(")")[0]
    pinned = [c.strip().split() for c in cols.split(",")]
    spark_names = {"BIGINT": "LongType()", "INT": "IntegerType()"}
    assert [(f.name, str(f.dataType)) for f in live.fields] == [
        (name, spark_names[typ]) for name, typ in pinned
    ]


def test_pq_codes_ddl_matches_live_schema(spark):
    """pq_codes DDL is pinned to pq_encode_fused's LIVE code schema (plus
    the coarse cell column sim_ivfpq_topk prunes on, typed like the
    embeddings table's label)."""
    from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

    from engine import iceberg
    from engine.trainops import pq_encode, pq_encode_fused

    emb = spark.createDataFrame(
        [(i, [float(i % 4)] * 64) for i in range(8)],
        StructType(
            [
                StructField("vec_id", LongType()),
                StructField("embedding", ArrayType(FloatType())),
            ]
        ),
    )
    _, cents = pq_encode(emb)
    live = pq_encode_fused(emb, cents).schema
    type_map = {"bigint": "BIGINT", "int": "INT"}
    want = {f.name: type_map[f.dataType.simpleString()] for f in live.fields}
    got = _ddl_columns(iceberg.pq_codes_ddl())
    coarse = got.pop("coarse")
    assert coarse == "INT"  # embeddings.label is INT (TESTDATA schema)
    assert got == want, f"DDL {got} != live schema {want}"
