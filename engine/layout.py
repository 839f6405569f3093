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


def decode_blobs(blobs):
    """blobs(media_ref, payload) → (media_ref, feats PAGE_FEATURES) via
    mapInArrow: one python hop per batch, no pandas materialization."""
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
    out_schema = pa.schema([pa.field("media_ref", pa.string()), pa.field("feats", feats_type)])

    def gen(batches):
        for batch in batches:
            refs = batch.column(batch.schema.get_field_index("media_ref"))
            payloads = batch.column(batch.schema.get_field_index("payload"))
            rows = [_decode_one(payloads[i].as_py()) for i in range(len(payloads))]
            yield pa.RecordBatch.from_arrays(
                [refs, pa.array(rows, type=feats_type)], schema=out_schema
            )

    from pyspark.sql.types import StructField, StructType

    from engine.schema import PAGE_FEATURES_STRUCT as _PF

    spark_schema = StructType(
        [StructField("media_ref", blobs.schema["media_ref"].dataType), StructField("feats", _PF)]
    )
    return blobs.select("media_ref", "payload").mapInArrow(gen, spark_schema)


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
    shuffles invariant: the groupBy's map-side partial ``first`` emits at
    most ONE payload copy per (fingerprint, input partition), so the
    exchange carries ~distinct-payload bytes instead of corpus bytes —
    decode work saved is d×, payload movement added is ~1/d of the corpus.
    Use the default ``decode_blobs`` when duplication is known to be ~1
    (e.g. already-canonicalized refs via strip_media_boilerplate); use this
    when refs point at raw ingest.  Which payload copy survives ``first``
    is arbitrary but the copies are byte-identical by construction (md5
    grouping), so the result is deterministic modulo md5 collision.  Decode
    failures are per-payload, so error features fan out to every ref of the
    corrupt content — same X3 isolation as the row path."""
    from pyspark.sql import functions as F

    fps = blobs.select("media_ref", F.md5(F.col("payload")).alias("fp"))
    survivors = (
        blobs.select(F.md5(F.col("payload")).alias("fp"), "payload")
        .groupBy("fp")
        .agg(F.first("payload").alias("payload"))
    )
    feats = decode_blobs(survivors.withColumnRenamed("fp", "media_ref")).select(
        F.col("media_ref").alias("fp"), "feats"
    )
    return fps.join(feats, "fp").select("media_ref", "feats")
