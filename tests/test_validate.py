"""Validation-audit tests (E3 analogue): recompute-and-compare invariants."""

from __future__ import annotations

from engine.validate import audit_documents

SCHEMA = (
    "doc_id string, "
    "sections array<struct<section_name:string, section_subtotal:string, "
    "items:array<struct<service_description_en:string,service_description_ar:string,"
    "code:string,date:string,time:string,unit_price:string,company_price:string,"
    "patient_price:string,net_price:string,quantity:string,amount:string>>>>, "
    "footer struct<net_total_amount:string, paid:string, amount_due:string>"
)


def _item(code="C1", unit="10.0", qty="2", amount="20.0"):
    return {
        "service_description_en": None,
        "service_description_ar": "خدمة",
        "code": code,
        "date": None,
        "time": None,
        "unit_price": unit,
        "company_price": None,
        "patient_price": None,
        "net_price": None,
        "quantity": qty,
        "amount": amount,
    }


def _doc(doc_id, sections, total):
    return {
        "doc_id": doc_id,
        "sections": sections,
        "footer": {"net_total_amount": total, "paid": None, "amount_due": None},
    }


def test_audit_scores(spark):
    rows = [
        # clean doc: all four checks pass
        _doc("ok", [{"section_name": "قسم", "section_subtotal": "20.0", "items": [_item()]}], "20.0"),
        # footer total disagrees with subtotals
        _doc("bad_total", [{"section_name": "قسم", "section_subtotal": "20.0", "items": [_item()]}], "99.0"),
        # item amount != unit*qty and empty code
        _doc(
            "bad_items",
            [{"section_name": "قسم", "section_subtotal": "30.0",
              "items": [_item(code="", amount="999.0")]}],
            "30.0",
        ),
        # nothing extracted → vacuous 100 (reference bypass semantics)
        _doc("empty", None, None),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r["doc_id"]: r for r in audit_documents(df).collect()}
    assert got["ok"]["score"] == 100.0 and got["ok"]["mistakes"] == []
    assert "footer_total_mismatch" in got["bad_total"]["mistakes"]
    assert set(got["bad_items"]["mistakes"]) == {
        "empty_item_code",
        "amount_neq_price_times_qty",
    }
    assert got["bad_items"]["score"] == 50.0
    assert got["empty"]["score"] == 100.0


def test_pixel_audit_over_bitmap_corpus(spark):
    """Image-grounded E3 (validator.py:24-108 analogue): a clean extraction
    over the SPB1 flagship corpus audits to 100 everywhere; tampering with
    the spine's claims is caught by re-deriving the verdict from pixels."""
    import pyspark.sql.functions as F

    from engine.entry import interleaved_corpus
    from engine.pipeline import run_extraction
    from engine.validate import audit_media_vs_pixels

    spans, blobs = interleaved_corpus(spark, "/root/testdata/sf0.001")
    spans = spans.limit(40)
    res = run_extraction(spark, spans, blobs, run_id="px-audit")
    spine = res.spine.localCheckpoint(eager=True)  # freeze claims under audit

    clean = audit_media_vs_pixels(spine, blobs).collect()
    assert clean and all(r["score"] == 100.0 and r["mistakes"] == [] for r in clean)

    # tamper 1: flip the claimed mode on one doc's media span
    # tamper 2: claim a skipped span was kept
    media_docs = sorted(
        r["doc_id"]
        for r in spine.filter(
            (F.col("kind") == "media") & (F.col("status") == "kept")
        ).select("doc_id").collect()
    )
    victim = media_docs[0]
    skipped = spine.filter(
        (F.col("kind") == "media") & (F.col("status") == "skipped")
    ).select("doc_id").limit(1).collect()[0]["doc_id"]
    is_media = F.col("kind") == "media"
    tampered = spine.withColumn(
        "mode",
        F.when(is_media & (F.col("doc_id") == victim), F.lit("massara")).otherwise(
            F.col("mode")
        ),
    ).withColumn(
        "status",
        F.when(is_media & (F.col("doc_id") == skipped), F.lit("kept")).otherwise(
            F.col("status")
        ),
    )
    flagged = {r["doc_id"]: r for r in audit_media_vs_pixels(tampered, blobs).collect()}
    assert "mode_mismatch" in flagged[victim]["mistakes"]
    assert flagged[victim]["score"] < 100.0
    assert "kept_but_skippable" in flagged[skipped]["mistakes"]
