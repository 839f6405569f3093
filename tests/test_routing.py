"""Routing-table tests: one fixture page per P3-P8 branch incl. all skip
reasons, asserting mode/skip_reason columns (SURVEY.md §5.2 item 3)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from engine.codec import encode_page
from engine.layout import decode_media
from engine.routing import route


def _route_one(spark, page: dict) -> tuple[str | None, str | None]:
    df = spark.createDataFrame([(encode_page(page),)], "payload: binary")
    feats = df.select(decode_media(F.col("payload")).alias("feats"))
    mode, skip = route(F.col("feats"))
    row = feats.select(mode.alias("m"), skip.alias("s")).collect()[0]
    return row["m"], row["s"]


def _page(labels, title="", has_qr=False, body="line"):
    return {
        "page_kind": "t",
        "regions": [{"label": l, "bbox": [0, 0, 1, 1]} for l in labels],
        "title_text": title,
        "body_text": body,
        "has_qr": has_qr,
        "qr_rotated": False,
        "boilerplate": [],
        "conf": 0.9,
    }


CASES = [
    # P3a/P4: doc_title ∧ table → janzour; receipt keywords keep whole page
    (_page(["doc_title", "table"], title="كشف تفاصيل الخدمات"), ("janzour", None)),
    (_page(["doc_title", "table"], title="إيصال رقم 123"), ("janzour_receipt", None)),
    # P6: medicine boilerplate title → skip (pdf_processor.py:981-989)
    (
        _page(["doc_title", "table"], title="أدوية ومستلزمات من الايواء"),
        (None, "medicine_title"),
    ),
    # P7: discharge paper → skip (massara_processor.py:99-101)
    (_page(["doc_title", "table"], title="ورقة خروج"), (None, "discharge")),
    (_page(["doc_title", "table"], title="Discharge Paper"), (None, "discharge")),
    # P3b/P8: ¬(header∧table) → idcard if QR else skip
    (_page(["image"], has_qr=True), ("idcard", None)),
    (_page([], has_qr=False), (None, "no_content")),
    (_page(["header"], has_qr=False), (None, "no_content")),
    # P3c: header∧table, no doc_title, no paragraph_title → massara
    (_page(["header", "table"]), ("massara", None)),
    # P3d: paragraph_title present → massara_medicine
    (_page(["header", "table", "paragraph_title"]), ("massara_medicine", None)),
]


@pytest.mark.parametrize("page,want", CASES)
def test_router_branch(spark, page, want):
    assert _route_one(spark, page) == want


def test_decode_error_routes_to_error(spark):
    df = spark.createDataFrame([(b"JUNKJUNKJUNKJUNK",)], "payload: binary")
    feats = df.select(decode_media(F.col("payload")).alias("feats"))
    mode, skip = route(F.col("feats"))
    row = feats.select(mode.alias("m"), skip.alias("s")).collect()[0]
    assert row["m"] is None and row["s"] == "decode_error"
