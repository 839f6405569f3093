"""Page routing — P2-P8 as pure Column expressions (SURVEY.md §2.2).

The reference routes each page through a hand-written if/elif cascade
(/root/reference/app/core/document/pdf_processor.py:962-1076 default router;
janzour variant janzour_processor.py:61-206; massara variant
massara_processor.py:63-147).  Here the cascade is ONE ``F.when`` chain over
layout-feature columns — evaluated by Catalyst inside codegen, branch order
preserved so the semantics match the reference's first-match-wins behavior.

Routing vocabulary:
  mode         'janzour' | 'janzour_receipt' | 'massara' | 'massara_medicine'
               | 'idcard' | 'default' | null (when skipped/errored)
  skip_reason  'medicine_title' | 'discharge' | 'no_content' | 'decode_error'
               | null (when processed)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# P6 — boilerplate-title skip literal (pdf_processor.py:981-989,1055-1065)
MEDICINE_TITLE_LIT = "أدوية ومستلزمات من الايواء"
# P7 — discharge-paper skip literals (massara_processor.py:99-101)
DISCHARGE_LITS = ("ورقة خروج", "Discharge Paper")
# P4 — janzour receipt-title keywords (janzour_processor.py:61-206)
RECEIPT_KEYWORDS = ("إيصال", "رقم")
SERVICES_TITLE_LIT = "كشف تفاصيل الخدمات"


def has_label(labels: Column, label: str) -> Column:
    """P2 — layout-feature predicate (pdf_processor.py:948-955):
    `F.exists` over the regions array, pure Catalyst."""
    return F.array_contains(labels, label)


def route(feats: Column) -> tuple[Column, Column]:
    """(mode, skip_reason) from a PAGE_FEATURES struct column.

    Order of evaluation (first match wins), mirroring the reference cascade:
      0. decode error → error (X3)
      1. title contains medicine literal → skip (P6)
      2. title contains discharge literal → skip (P7)
      3. doc_title ∧ table → janzour; receipt-keyword titles keep the whole
         page (janzour_receipt) vs services pages crop below title (P3a/P4)
      4. ¬(header ∧ table) → idcard if QR else skip no_content (P3b/P8)
      5. no doc_title ∧ no paragraph_title → massara (P3c)
      6. no doc_title ∧ paragraph_title → massara_medicine (P3d)
      7. else → default (P3e)
    """
    labels = feats["labels"]
    title = F.coalesce(feats["title_text"], F.lit(""))
    doc_title = has_label(labels, "doc_title")
    table = has_label(labels, "table")
    header = has_label(labels, "header")
    paragraph_title = has_label(labels, "paragraph_title")
    has_qr = F.coalesce(feats["has_qr"], F.lit(False))
    err = feats["decode_error"].isNotNull()

    is_medicine = title.contains(MEDICINE_TITLE_LIT)
    is_discharge = F.lit(False)
    for lit in DISCHARGE_LITS:
        is_discharge = is_discharge | title.contains(lit)
    is_receipt_title = title.contains(RECEIPT_KEYWORDS[0]) & title.contains(
        RECEIPT_KEYWORDS[1]
    )

    skip_reason = (
        F.when(err, F.lit("decode_error"))
        .when(is_medicine, F.lit("medicine_title"))
        .when(is_discharge, F.lit("discharge"))
        .when(~(doc_title & table) & ~(header & table) & ~has_qr, F.lit("no_content"))
        .otherwise(F.lit(None).cast("string"))
    )

    mode = (
        F.when(skip_reason.isNotNull(), F.lit(None).cast("string"))
        .when(doc_title & table & is_receipt_title, F.lit("janzour_receipt"))
        .when(doc_title & table, F.lit("janzour"))
        .when(~(header & table), F.lit("idcard"))  # has_qr is implied (else skipped above)
        .when(~doc_title & ~paragraph_title, F.lit("massara"))
        .when(~doc_title & paragraph_title, F.lit("massara_medicine"))
        .otherwise(F.lit("default"))
    )
    return mode, skip_reason
