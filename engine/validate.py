"""Deterministic validation audit (E3 analogue — SURVEY.md §2.10).

The reference validates extractions with a GPT judge returning a ``mistakes``
list and a 0-100 ``score`` (/root/reference/app/core/document/validator.py:
24-108) — and then bypasses it for all known templates (app/tasks.py:250-257).
Here validation is recompute-and-compare: invariants the extraction must
satisfy are rechecked from the extracted struct itself, producing the same
(mistakes, score) contract without a model.

Checks (each failed check appends a mistake string):
  V1  footer.net_total_amount equals the sum of section subtotals (A5 rule)
  V2  every item's code is non-empty (table_parser.py:247 drop rule held)
  V3  every section with items has a section_name
  V4  item amount ≈ unit_price × quantity where all three parse (soft check)
Score = 100 × (passed checks / applicable checks); docs with nothing to
check score 100 (vacuous pass, like the reference's bypass).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from engine.textops import coerce_price, coerce_qty


def _check(name: str, applicable: Column, ok: Column) -> Column:
    """→ struct(applicable int, passed int, mistake string|null)."""
    return F.struct(
        F.when(applicable, 1).otherwise(0).alias("applicable"),
        F.when(applicable & ok, 1).otherwise(0).alias("passed"),
        F.when(applicable & ~ok, F.lit(name)).alias("mistake"),
    )


def audit_documents(docs: DataFrame) -> DataFrame:
    """(doc_id, sections, footer, …) → (doc_id, mistakes array<string>, score)."""
    items = F.flatten(
        F.transform(F.coalesce(F.col("sections"), F.array()), lambda s: s["items"])
    )
    subtotal_sum = F.aggregate(
        F.coalesce(F.col("sections"), F.array()),
        F.lit(0.0),
        lambda acc, s: acc + F.coalesce(coerce_price(s["section_subtotal"]), F.lit(0.0)),
    )
    footer_total = coerce_price(F.col("footer.net_total_amount"))

    v1 = _check(
        "footer_total_mismatch",
        footer_total.isNotNull() & (subtotal_sum > 0),
        F.abs(footer_total - subtotal_sum) < 0.005,
    )
    v2 = _check(
        "empty_item_code",
        F.size(items) > 0,
        ~F.exists(items, lambda i: F.coalesce(i["code"], F.lit("")) == ""),
    )
    v3 = _check(
        "unnamed_section",
        F.size(F.coalesce(F.col("sections"), F.array())) > 0,
        ~F.exists(
            F.coalesce(F.col("sections"), F.array()),
            lambda s: s["section_name"].isNull() & (F.size(s["items"]) > 0),
        ),
    )
    amount_bad = F.exists(
        items,
        lambda i: coerce_price(i["amount"]).isNotNull()
        & coerce_price(i["unit_price"]).isNotNull()
        & (coerce_qty(i["quantity"]) > 0)
        & (
            F.abs(
                coerce_price(i["amount"])
                - coerce_price(i["unit_price"]) * coerce_qty(i["quantity"])
            )
            >= 0.005
        ),
    )
    v4 = _check("amount_neq_price_times_qty", F.size(items) > 0, ~amount_bad)

    checks = F.array(v1, v2, v3, v4)
    applicable = F.aggregate(checks, F.lit(0), lambda a, c: a + c["applicable"])
    passed = F.aggregate(checks, F.lit(0), lambda a, c: a + c["passed"])
    mistakes = F.filter(
        F.transform(checks, lambda c: c["mistake"]), lambda m: m.isNotNull()
    )
    score = F.when(applicable == 0, F.lit(100.0)).otherwise(
        F.round(passed * 100.0 / applicable, 1)
    )
    return docs.select(
        "doc_id", mistakes.alias("mistakes"), score.alias("score")
    )
