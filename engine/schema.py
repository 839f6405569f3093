"""Fixed StructType constants — the engine's data model.

The reference keeps schema implicit (Python dicts; /root/reference/app/models/
schemas.py:10-42 is the only typed surface).  Here every stage boundary has a
rigid schema so Catalyst can prune/push down and so the driver's span-sequence
invariant is checkable by value.

Input contract (BASELINE.json input_hint):
    documents_spans(doc_id string,
                    spans array<struct<kind:string,text:string,media_ref:string,offset:int>>)
    media_blobs(media_ref string, payload binary)

Output contract (FIXTURES.md §4):
    spans_out(doc_id string,
              spans_out array<struct<kind:string,text:string,media_ref:string,offset:int>>)
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# One interleaved span (text or media) — FIXTURES.md §1.
SPAN_STRUCT = StructType(
    [
        StructField("kind", StringType(), False),
        StructField("text", StringType(), True),  # null for media spans
        StructField("media_ref", StringType(), True),  # null for text spans
        StructField("offset", IntegerType(), False),
    ]
)

SPANS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans", ArrayType(SPAN_STRUCT), False),
    ]
)

MEDIA_BLOBS_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("payload", BinaryType(), False),
    ]
)

SPANS_OUT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans_out", ArrayType(SPAN_STRUCT), False),
    ]
)

# Layout region — mirrors the reference detector output
# (/root/reference/app/core/layout/detector.py:74-79): {label, score, bbox[x1,y1,x2,y2]}.
LAYOUT_REGION_STRUCT = StructType(
    [
        StructField("label", StringType(), False),
        StructField("score", StringType(), True),
        StructField("bbox", ArrayType(IntegerType()), True),
    ]
)

# Decoded media-page features produced by the fused media UDF (engine.layout).
# One row per media span; everything the routers (engine.routing) need.  The UDF
# does ONLY the decode (the part Catalyst can't express); routing, stripping and
# reassembly stay native Column expressions over these fields.
PAGE_FEATURES_STRUCT = StructType(
    [
        StructField("page_kind", StringType(), True),
        StructField("labels", ArrayType(StringType()), True),
        StructField("title_text", StringType(), True),
        StructField("body_lines", ArrayType(StringType()), True),
        StructField("has_qr", BooleanType(), True),
        StructField("qr_rotated", BooleanType(), True),
        # detected page rotation in degrees (0/90/180/270) — null when no QR
        StructField("qr_rotation", IntegerType(), True),
        StructField("boilerplate", ArrayType(StringType()), True),
        StructField("conf", DoubleType(), True),  # synthetic OCR confidence (A6 histogram)
        StructField("decode_error", StringType(), True),
    ]
)

# The spine (engine/pipeline.build_spine's output) as a DDL string — the
# single source for the Iceberg spine DDL (engine/iceberg.py) and for
# schema-explicit spine reads (engine/io._read_spine: a committed EMPTY
# bucketed run writes _SUCCESS but no schema-bearing part file, so
# inference-based reads would fail on it).
SPINE_DDL = (
    "doc_id STRING, offset INT, kind STRING, media_ref STRING, "
    "out_text STRING, status STRING, reason STRING, conf DOUBLE, mode STRING, "
    "qr_rotation INT"
)

# Lineage: one row per input span per run — FIXTURES.md §5.
LINEAGE_SCHEMA = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("doc_id", StringType(), False),
        StructField("offset", IntegerType(), False),
        StructField("status", StringType(), False),
        StructField("reason", StringType(), True),
    ]
)

# Additive per-partition counters (docs_processed is distinct-per-partition).
METRICS_SCHEMA = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("docs_processed", LongType(), False),
        StructField("spans_kept", LongType(), False),
        StructField("spans_dropped", LongType(), False),
        StructField("errors", LongType(), False),
    ]
)

# A6 confidence histogram — separate table so the counters above stay
# additive (a doc with spans in several conf buckets must not be re-counted
# per bucket row).
CONF_HIST_SCHEMA = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("conf_bucket", IntegerType(), False),
        StructField("conf_count", LongType(), False),
    ]
)

# Canonical extracted-document struct (subset round 1) — mirrors the JSON template
# at /root/reference/app/core/document/pdf_processor.py:219-271 (massara) and
# :459-514 (janzour): header / patient_identity / sections[items] / footer.
ITEM_STRUCT = StructType(
    [
        StructField("service_description_en", StringType(), True),
        StructField("service_description_ar", StringType(), True),
        StructField("code", StringType(), True),
        StructField("date", StringType(), True),
        StructField("time", StringType(), True),
        StructField("unit_price", StringType(), True),
        StructField("company_price", StringType(), True),
        StructField("patient_price", StringType(), True),
        StructField("net_price", StringType(), True),
        StructField("quantity", StringType(), True),
        StructField("amount", StringType(), True),
    ]
)

SECTION_STRUCT = StructType(
    [
        StructField("section_name", StringType(), True),
        StructField("section_subtotal", StringType(), True),
        StructField("items", ArrayType(ITEM_STRUCT), True),
    ]
)

FOOTER_STRUCT = StructType(
    [
        StructField("net_total_amount", StringType(), True),
        StructField("paid", StringType(), True),
        StructField("amount_due", StringType(), True),
    ]
)
