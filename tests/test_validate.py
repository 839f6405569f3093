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
