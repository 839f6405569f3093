"""Independent pure-Python reference implementation (FIXTURES.md §2).

Computes the golden ``spans_out`` + lineage for a corpus WITHOUT Spark and
WITHOUT importing any pipeline module — only the payload codec is shared
(engine.codec), exactly as FIXTURES.md specifies: "goldens are computed from
the same codec by an independent reference implementation ... so the pipeline
and the oracle can only agree if the routing/strip/ordering logic is right."

The rules below restate the engine's behavioral spec (SURVEY.md §2) in plain
Python; constants are duplicated on purpose — a drift between the two is a bug
one of the two sides must fix, which is the point of an oracle.
"""

from __future__ import annotations

import re
from typing import Any

from engine.codec import decode_page

BIDI_RE = re.compile("[‎‏‪-‮]")
DUP_WORD_RE = re.compile(r"(?<!\S)(\S+)(?:[ \t]+\1)+(?!\S)")

BOILERPLATE_RES = [
    re.compile(p)
    for p in [
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
]

MEDICINE_TITLE = "أدوية ومستلزمات من الايواء"
DISCHARGE_LITS = ("ورقة خروج", "Discharge Paper")
RECEIPT_KEYWORDS = ("إيصال", "رقم")


def normalize_lines(lines: list[str]) -> list[str]:
    """bidi strip → rstrip → consecutive-word dedup → consecutive-line dedup
    → drop empties (the shared normalization spec)."""
    lines = [BIDI_RE.sub("", l) for l in lines]
    lines = [re.sub(r"\s+$", "", l) for l in lines]
    lines = [DUP_WORD_RE.sub(r"\1", l) for l in lines]
    deduped = [l for i, l in enumerate(lines) if i == 0 or l != lines[i - 1]]
    return [l for l in deduped if l != ""]


def normalize_text(text: str) -> str:
    return "\n".join(normalize_lines(text.split("\n")))


def is_boilerplate(text: str) -> bool:
    if any(p.search(text) for p in BOILERPLATE_RES):
        return True
    tokens = re.split(r"\s+", text.strip())
    return len(tokens) <= 3 and ("|" in text or "»" in text)


def route_page(page: dict[str, Any]) -> tuple[str | None, str | None]:
    """(mode, skip_reason) — mirrors the P3-P8 cascade."""
    labels = {r["label"] for r in page.get("regions") or []}
    title = page.get("title_text") or ""
    has_qr = bool(page.get("has_qr"))
    doc_title = "doc_title" in labels
    table = "table" in labels
    header = "header" in labels
    paragraph_title = "paragraph_title" in labels

    if MEDICINE_TITLE in title:
        return None, "medicine_title"
    if any(lit in title for lit in DISCHARGE_LITS):
        return None, "discharge"
    if doc_title and table:
        if all(k in title for k in RECEIPT_KEYWORDS):
            return "janzour_receipt", None
        return "janzour", None
    if not (header and table):
        if has_qr:
            return "idcard", None
        return None, "no_content"
    if not doc_title and not paragraph_title:
        return "massara", None
    if not doc_title and paragraph_title:
        return "massara_medicine", None
    return "default", None


def extract_media_text(page: dict[str, Any], mode: str) -> str:
    body = page.get("body_text") or ""
    lines = body.split("\n") if body else []
    if mode == "janzour_receipt":
        lines = [page.get("title_text") or ""] + lines
    bp = set(page.get("boilerplate") or [])
    lines = [l for l in lines if l not in bp]
    return "\n".join(normalize_lines(lines))


def process_doc(
    spans: list[dict[str, Any]], blobs: dict[str, bytes]
) -> tuple[list[tuple[str, str | None, str | None, int]], dict[int, str]]:
    """→ (spans_out tuples (kind,text,media_ref,offset) offset-sorted,
         lineage {offset: status})."""
    out: list[tuple[str, str | None, str | None, int]] = []
    lineage: dict[int, str] = {}
    for span in spans:
        off = span["offset"]
        kind = span["kind"]
        if kind == "text":
            text = normalize_text(span.get("text") or "")
            if text == "":
                lineage[off] = "skipped_empty"
            elif is_boilerplate(text):
                lineage[off] = "dropped_boilerplate"
            else:
                lineage[off] = "kept"
                out.append(("text", text, None, off))
        elif kind == "media":
            try:
                page = decode_page(blobs.get(span["media_ref"]))
            except ValueError:
                lineage[off] = "error"
                continue
            mode, skip = route_page(page)
            if skip is not None:
                lineage[off] = f"skipped_{skip}"
                continue
            text = extract_media_text(page, mode)
            if text == "":
                lineage[off] = "skipped_empty"
            else:
                lineage[off] = "kept"
                out.append(("media", text, span["media_ref"], off))
        else:
            lineage[off] = "error"
    out.sort(key=lambda t: t[3])
    return out, lineage


def golden_for_corpus(
    spans_rows: list[dict[str, Any]], blob_rows: list[dict[str, Any]]
) -> dict[str, list[tuple[str, str | None, str | None, int]]]:
    blobs = {b["media_ref"]: b["payload"] for b in blob_rows}
    return {
        row["doc_id"]: process_doc(row["spans"], blobs)[0] for row in spans_rows
    }
