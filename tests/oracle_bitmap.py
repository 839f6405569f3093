"""Spec-driven oracle for the bitmap (SPB1) corpus.

Predicts expected pipeline output from the page SPECS the renderer consumed
— i.e. from *intent* — without running any detector, renderer or pipeline
code.  The pipeline reaches its answer through pixels (render → QR scan →
barcode whiten → projection-profile layout → route → crop → strip); the two
can only agree if that whole chain reproduces the spec's intent.  Routing /
normalization rules are restated via tests.oracle (itself independent of
pipeline code).
"""

from __future__ import annotations

from typing import Any

from tests import oracle

# page_kind → (expected mode, expected skip reason)
KIND_EXPECT: dict[str, tuple[str | None, str | None]] = {
    "janzour": ("janzour", None),
    "janzour_receipt": ("janzour_receipt", None),
    "massara": ("massara", None),
    "massara_medicine": ("massara_medicine", None),
    "idcard": ("idcard", None),
    "skip_medicine_title": (None, "medicine_title"),
    "skip_discharge": (None, "discharge"),
    "blank": (None, "no_content"),
}


def media_text(spec: dict[str, Any]) -> str:
    """Expected kept text for a processed media span: spec body lines (the
    renderer's boiler/noise texts are removed by M6 whiten / M10 crop),
    title prepended only for janzour_receipt, then shared normalization."""
    lines = list(spec.get("body_lines") or [])
    if spec["page_kind"] == "janzour_receipt":
        lines = [spec.get("title_text") or ""] + lines
    return "\n".join(oracle.normalize_lines(lines))


def process_doc(
    spans: list[dict[str, Any]], specs: dict[str, dict[str, Any] | None]
) -> tuple[list[tuple[str, str | None, str | None, int]], dict[int, str]]:
    out: list[tuple[str, str | None, str | None, int]] = []
    lineage: dict[int, str] = {}
    for span in spans:
        off = span["offset"]
        if span["kind"] == "text":
            text = oracle.normalize_text(span.get("text") or "")
            if text == "":
                lineage[off] = "skipped_empty"
            elif oracle.is_boilerplate(text):
                lineage[off] = "dropped_boilerplate"
            else:
                lineage[off] = "kept"
                out.append(("text", text, None, off))
        else:
            spec = specs.get(span["media_ref"])
            if spec is None:
                lineage[off] = "error"
                continue
            mode, skip = KIND_EXPECT[spec["page_kind"]]
            if skip is not None:
                lineage[off] = f"skipped_{skip}"
                continue
            text = media_text(spec)
            if text == "":
                lineage[off] = "skipped_empty"
            else:
                lineage[off] = "kept"
                out.append(("media", text, span["media_ref"], off))
    out.sort(key=lambda t: t[3])
    return out, lineage
