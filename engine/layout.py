"""Media-branch decode: the single pandas (Arrow) UDF in the pipeline.

Reference analogue: the fused image work — render, layout detect, barcode/QR
scan, crops — all happens inside one worker process before the OCR hop
(/root/reference/app/core/document/pdf_processor.py:930-1093, detector.py:11-80,
barcode.py:10-179).  Here the bitmap is replaced by the deterministic payload
codec (engine.codec, FIXTURES.md §2); the UDF decodes one Arrow batch of
payloads into the PAGE_FEATURES struct.  Everything downstream — routing,
region strip, dedup, reassembly — is pure Catalyst over these columns
(SURVEY.md §2.11: one fused UDF per media batch; never per-row Python).

Two payload modes, dispatched on the 4-byte magic:
- ``SPG1`` (engine.codec): self-describing JSON payload — labels, flags and
  text come straight from the payload (fixture-exact goldens);
- ``SPB1`` (engine.bitmap): a REAL raster — region labels, QR flags,
  rotation, barcode boilerplate and the id-card crop are all DERIVED from
  pixels by the P1 projection-profile detector and the M6-M10 operators.
Both produce the same PAGE_FEATURES struct; routing/strip/reassembly
downstream are identical Catalyst plans either way.

Failure isolation (X3, pdf_processor.py:1160-1183): a malformed payload yields
``decode_error`` instead of failing the task; the router turns that into an
``error`` lineage row.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from engine import bitmap, codec
from engine.schema import PAGE_FEATURES_STRUCT


def _decode_batch(payloads: pd.Series) -> pd.DataFrame:
    """Series[bytes] → DataFrame matching PAGE_FEATURES_STRUCT.

    Plain-Python loop over the Arrow batch: the payload is variable-length
    (JSON or raster), so there is no numpy vectorization across ITEMS to be
    had — the win over row-at-a-time UDFs is the Arrow batch transfer and
    one Python call per ~2048 rows (the bitmap detectors are numpy-vectorized
    WITHIN each page).
    """
    rows = [_decode_one(blob) for blob in payloads]
    return pd.DataFrame(rows, columns=[name for name, _ in _FEATS_FIELDS])


decode_media = F.pandas_udf(_decode_batch, returnType=PAGE_FEATURES_STRUCT)


# ---------------------------------------------------------------------------
# mapInArrow variant — the pipeline's hot path.  Skips the Arrow→pandas→Arrow
# round-trip (which materializes every payload as a python bytes object twice)
# by reading buffers straight off the RecordBatch and letting pyarrow build
# the output struct in C++.  Same decode semantics as _decode_batch.
# ---------------------------------------------------------------------------

_FEATS_FIELDS = [
    ("page_kind", "string"),
    ("labels", "list<string>"),
    ("title_text", "string"),
    ("body_lines", "list<string>"),
    ("has_qr", "bool"),
    ("qr_rotated", "bool"),
    ("qr_rotation", "int32"),
    ("boilerplate", "list<string>"),
    ("conf", "double"),
    ("decode_error", "string"),
]


def _decode_one(raw: bytes | None) -> dict:
    try:
        if raw is not None and bytes(raw[:4]) == bitmap.MAGIC:
            # SPB1: the real detectors run here — P1 layout, M6 barcode
            # whiten, M7-M9 QR orient, M10 idcard crop (engine.bitmap).
            return bitmap.extract_features(bytes(raw))
        page = codec.decode_page(raw)
        body = page.get("body_text") or ""
        has_qr = bool(page.get("has_qr"))
        rotated = bool(page.get("qr_rotated"))
        # SPG1 payloads carry only the rotated BOOL; when the angle is absent
        # (or explicitly null — must not crash a valid page into an error
        # row) use 90° as the canonical "rotated" representative.  SPB1
        # payloads measure the true angle from pixels.
        rot = page.get("qr_rotation")
        return {
            "page_kind": page.get("page_kind"),
            "labels": [r["label"] for r in (page.get("regions") or [])],
            "title_text": page.get("title_text"),
            "body_lines": body.split("\n") if body else [],
            "has_qr": has_qr,
            "qr_rotated": rotated,
            "qr_rotation": (int(rot) if rot is not None else (90 if rotated else 0))
            if has_qr
            else None,
            "boilerplate": page.get("boilerplate") or [],
            "conf": float(page.get("conf", 1.0)),
            "decode_error": None,
        }
    except Exception as exc:  # noqa: BLE001 — X3 failure isolation
        return {
            "page_kind": None,
            "labels": None,
            "title_text": None,
            "body_lines": None,
            "has_qr": None,
            "qr_rotated": None,
            "qr_rotation": None,
            "boilerplate": None,
            "conf": None,
            "decode_error": f"{type(exc).__name__}: {exc}",
        }


def decode_blobs(blobs, carry: tuple[str, ...] = ()):
    """blobs(media_ref, payload) → (media_ref, feats PAGE_FEATURES) via
    mapInArrow: one python hop per batch, no pandas materialization.
    ``carry`` columns ride the Arrow batch through unchanged (zero-copy
    column references, no join needed to reattach them)."""
    import pyarrow as pa

    feats_type = pa.struct(
        [
            pa.field("page_kind", pa.string()),
            pa.field("labels", pa.list_(pa.string())),
            pa.field("title_text", pa.string()),
            pa.field("body_lines", pa.list_(pa.string())),
            pa.field("has_qr", pa.bool_()),
            pa.field("qr_rotated", pa.bool_()),
            pa.field("qr_rotation", pa.int32()),
            pa.field("boilerplate", pa.list_(pa.string())),
            pa.field("conf", pa.float64()),
            pa.field("decode_error", pa.string()),
        ]
    )
    def gen(batches):
        for batch in batches:
            refs = batch.column(batch.schema.get_field_index("media_ref"))
            payloads = batch.column(batch.schema.get_field_index("payload"))
            carried = [batch.column(batch.schema.get_field_index(c)) for c in carry]
            out_schema = pa.schema(
                [pa.field("media_ref", refs.type), pa.field("feats", feats_type)]
                + [batch.schema.field(c) for c in carry]
            )
            rows = [_decode_one(payloads[i].as_py()) for i in range(len(payloads))]
            yield pa.RecordBatch.from_arrays(
                [refs, pa.array(rows, type=feats_type), *carried], schema=out_schema
            )

    from pyspark.sql.types import StructField, StructType

    from engine.schema import PAGE_FEATURES_STRUCT as _PF

    spark_schema = StructType(
        [StructField("media_ref", blobs.schema["media_ref"].dataType), StructField("feats", _PF)]
        + [blobs.schema[c] for c in carry]
    )
    return blobs.select("media_ref", "payload", *carry).mapInArrow(gen, spark_schema)


def decode_blobs_distinct(blobs):
    """``decode_blobs`` variant that decodes each DISTINCT payload once.

    Receipt corpora repeat media content corpus-wide (the same logo/stamp/
    blank sheet behind thousands of refs — the signal media_dedup_exact
    measures), and the default path decodes every blob ROW: at duplication
    factor d that is d× the dominant cost.  Here payloads are md5'd at the
    scan, one surviving copy per fingerprint is decoded, and the features
    fan back out to refs through a (ref, fp) × (fp, feats) equi-join —
    both sides payload-free and feature-rows tiny.

    This is the one deliberate exception to the repo's payload-never-
    shuffles invariant.  Decode work always drops by the full duplication
    factor d (the post-shuffle merge leaves one payload per fingerprint);
    what the map-side partial ``first`` floors is the EXCHANGE: one payload
    copy per (fingerprint, input partition), so shuffle bytes only shrink
    once d exceeds the partition count.  Measured (interleaved A/B,
    BENCH/ab_decode_r5.json; 24k refs × ~120 KB pages, 32 partitions):
    **1.83× at d=400** (the corpus-wide-logo regime the op exists for),
    1.20× at d=10 (decode savings already beat a nearly-full-corpus
    shuffle at this page weight), **0.70× at d=1** (pure overhead — use
    the row path).  At 10^12 docs recurring boilerplate media exceeds any
    cluster's task count by orders of magnitude, i.e. deep in the win
    regime; keep the default ``decode_blobs`` for unduplicated or
    already-canonicalized refs (strip_media_boilerplate output).  Which payload copy survives ``first``
    is arbitrary but the copies are byte-identical by construction (md5
    grouping), so the result is deterministic modulo md5 collision.  Decode
    failures are per-payload, so error features fan out to every ref of the
    corrupt content — same X3 isolation as the row path.

    Shape (one scan, one shuffle, no join — the first cut scanned and
    hashed the corpus twice and joined features back, and the interleaved
    A/B read it SLOWER than the row path even at 10× duplication): the
    groupBy carries the refs as a collect_list riding the same partial
    aggregation, the grouped frame is decoded with ``refs`` passed through
    the Arrow batch, and one explode fans features back out."""
    from pyspark.sql import functions as F

    grouped = (
        blobs.groupBy(F.md5(F.col("payload")).alias("fp"))
        .agg(
            F.first("payload").alias("payload"),
            F.collect_list("media_ref").alias("refs"),
        )
        .select(F.col("fp").alias("media_ref"), "payload", "refs")
    )
    return decode_blobs(grouped, carry=("refs",)).select(
        F.explode("refs").alias("media_ref"), "feats"
    )
