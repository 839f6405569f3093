"""Operator unit tests for §2.8 scalar functions — edge cases taken from the
reference's observable rules (SURVEY.md §5.2 item 2)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from engine import textops


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def _apply(spark, fn, value):
    df = spark.createDataFrame([(value,)], "s: string")
    return df.select(fn(F.col("s")).alias("v")).collect()[0]["v"]


class TestCleanField:
    # reference: text_utils.py:8-14 — strip leading/trailing '*' runs + ws
    @pytest.mark.parametrize(
        "raw,want",
        [
            ("**الاجمالي:** 25,985", "الاجمالي:** 25,985"),  # only edge runs stripped
            ("*** value ***", "value"),
            ("  plain  ", "plain"),
            ("*", ""),
        ],
    )
    def test_cases(self, spark, raw, want):
        assert _apply(spark, textops.clean_field, raw) == want


class TestDates:
    def test_extract_date_default(self, spark):
        # dd.MM.yyyy → yyyy-MM-dd (text_utils.py:29-38)
        assert _apply(spark, textops.extract_date_default, "12.04.2025") == "2025-04-12"

    def test_extract_date_passthrough_on_failure(self, spark):
        # reference keeps the raw string when parsing fails (text_utils.py:35-37)
        assert _apply(spark, textops.extract_date_default, "not-a-date") == "not-a-date"

    def test_normalize_jz_date_formats(self, spark):
        assert _apply(spark, textops.normalize_jz_date, "4/24/25 6:48PM") == "24/04/2025 18:48"
        assert _apply(spark, textops.normalize_jz_date, "24/04/2025 18:48") == "24/04/2025 18:48"
        assert _apply(spark, textops.normalize_jz_date, "garbage") == "garbage"


class TestCoercions:
    def test_price_strips_separators(self, spark):
        # table_parser.py:130-135,228-234: ','/' '/'/' removed then float.
        # NOTE the reference is deliberately lossy: a European decimal comma
        # is stripped, so '1 234,5/' becomes 12345.0 — quirk preserved.
        assert _apply(spark, textops.coerce_price, "10,762.500") == pytest.approx(10762.5)
        assert _apply(spark, textops.coerce_price, "1 234,5/") == pytest.approx(12345.0)

    def test_price_null_on_failure(self, spark):
        assert _apply(spark, textops.coerce_price, "abc") is None

    def test_qty_zero_on_failure(self, spark):
        # table_parser.py:236-241: int(val) else 0
        assert _apply(spark, textops.coerce_qty, "7") == 7
        assert _apply(spark, textops.coerce_qty, "") == 0
        assert _apply(spark, textops.coerce_qty, "x") == 0


class TestIdPattern:
    def test_zeros_preserved(self, spark):
        # pdf_processor.py:634-639: ACA-0000-00080-… middle zeros kept verbatim
        got = _apply(
            spark, textops.extract_id_number, "id: ACA-0000-00080-X1Z trailing"
        )
        assert got == "ACA-0000-00080-X1Z"

    def test_no_match_empty(self, spark):
        assert _apply(spark, textops.extract_id_number, "ACA-12-99") == ""


class TestNormalization:
    def test_bidi_strip(self, spark):
        raw = "‏رقم‎ ‪الفاتورة‬"
        got = _apply(spark, textops.normalize_bidi, raw)
        assert "‎" not in got and "‏" not in got and "‪" not in got

    def test_word_dedup(self, spark):
        assert (
            _apply(spark, textops.dedup_consecutive_words, "net net net total total x")
            == "net total x"
        )

    def test_word_dedup_not_substring(self, spark):
        # 'the theory' must NOT collapse — boundary anchors required
        assert (
            _apply(spark, textops.dedup_consecutive_words, "the theory") == "the theory"
        )

    def test_line_dedup_and_empty_drop(self, spark):
        got = _apply(
            spark,
            textops.normalize_span_text,
            "a\na\n\nb   \nb\nc",
        )
        assert got == "a\nb\nc"

    def test_arabic_detection(self, spark):
        df = spark.createDataFrame([("إيصال",), ("receipt",)], "s: string")
        got = [r["v"] for r in df.select(textops.is_arabic(F.col("s")).alias("v")).collect()]
        assert got == [True, False]


class TestBoilerplate:
    @pytest.mark.parametrize(
        "text,want",
        [
            ("© 2025 Example Hospital. All rights reserved.", True),
            ("Terms of Service | Privacy Policy", True),
            ("Home | Services » Billing", True),
            ("جميع الحقوق محفوظة لمستشفى المثال", True),
            ("Advertisement", True),
            ("a | b", True),  # short nav crumb
            ("Patient follow-up scheduled for next visit.", False),
            ("رقم الفاتورة: INV-00042", False),
            ("this long sentence has a | pipe but is not a crumb at all", False),
        ],
    )
    def test_classifier(self, spark, text, want):
        df = spark.createDataFrame([(text,)], "s: string")
        got = df.select(textops.is_boilerplate(F.col("s")).alias("v")).collect()[0]["v"]
        assert got == want


class TestHeaderCoreFields:
    def test_missing_and_present(self, spark):
        # text_utils.py:73-76 — none of the 3 required Arabic labels present
        df = spark.createDataFrame(
            [("رقم الفاتورة: 5",), ("random text",)], "s: string"
        )
        import pyspark.sql.functions as FF
        from engine.textops import header_missing_core_fields

        got = [
            r["v"]
            for r in df.select(header_missing_core_fields(FF.col("s")).alias("v")).collect()
        ]
        assert got == [False, True]


def test_header_missing_core_fields(spark):
    # F7 (text_utils.py:73-76): missing iff NONE of the 3 core labels appear
    rows = [
        ("رقم الفاتورة: 12", False),
        ("اسم المريض فقط", False),
        ("رقم الملف F-1", False),
        ("نص بلا حقول أساسية", True),
        ("", True),
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], "t: string")
    from engine.textops import header_missing_core_fields

    got = [r["m"] for r in df.select(header_missing_core_fields(F.col("t")).alias("m")).collect()]
    assert got == [want for _, want in rows]
