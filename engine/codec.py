"""Deterministic synthetic media-payload codec (FIXTURES.md §2).

The reference's media branch is: render page → layout detect → mode route →
region strip → OCR (/root/reference/app/core/document/pdf_processor.py:930-1093).
Models make that untestable; this codec replaces the *bitmap* with a
self-describing payload carrying the same information the models would have
produced (regions, title text, ground-truth body text, QR flags, boilerplate),
so the routing / strip / ordering logic is exercised for real and goldens are
exact.  The pipeline UDF (engine.layout) and the pure-Python test oracle
(tests/oracle.py) share this module — they can only agree if the dataflow is
right, not because they share pipeline code.

Wire format:  b"SPG1" + uint32_be(json_len) + utf8 json + zero padding.
Padding makes payload size a free variable → oversized-span skew is testable
without changing semantics.
"""

from __future__ import annotations

import json
import struct
from typing import Any

MAGIC = b"SPG1"
_HEADER = struct.Struct(">4sI")

# Region labels observed in the reference router
# (/root/reference/app/core/document/pdf_processor.py:948-955).
REGION_LABELS = (
    "doc_title",
    "paragraph_title",
    "figure_title",
    "header",
    "header_image",
    "footer",
    "table",
    "image",
)

PAGE_KINDS = (
    "janzour",
    "janzour_receipt",
    "massara",
    "massara_medicine",
    "idcard",
    "skip_medicine_title",
    "skip_discharge",
    "blank",
)


def encode_page(page: dict[str, Any], pad_to: int = 0) -> bytes:
    """Serialize a synthetic page dict into a payload blob.

    ``pad_to`` inflates the blob with zeros (skew fixture); decode ignores it.
    """
    body = json.dumps(page, ensure_ascii=False, sort_keys=True).encode("utf-8")
    blob = _HEADER.pack(MAGIC, len(body)) + body
    if pad_to > len(blob):
        blob += b"\x00" * (pad_to - len(blob))
    return blob


def decode_page(blob: bytes | bytearray | memoryview | None) -> dict[str, Any]:
    """Parse a payload blob back into the page dict.

    Raises ValueError on malformed input — callers convert that into an
    ``error`` lineage row (failure isolation, reference analogue
    /root/reference/app/core/document/pdf_processor.py:1160-1183).
    """
    if blob is None:
        raise ValueError("null payload")
    raw = bytes(blob)
    if len(raw) < _HEADER.size:
        raise ValueError("payload shorter than header")
    magic, length = _HEADER.unpack_from(raw)
    if magic != MAGIC:
        raise ValueError(f"bad magic {magic!r}")
    if len(raw) < _HEADER.size + length:
        raise ValueError("truncated payload")
    return json.loads(raw[_HEADER.size : _HEADER.size + length].decode("utf-8"))
