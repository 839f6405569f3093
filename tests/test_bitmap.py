"""P1 bitmap layout detector + M6-M10 on rasters: unit tests per operator and
the end-to-end golden over a bitmap corpus (labels from PIXELS, not payload).
"""

from __future__ import annotations

import numpy as np
import pytest

from engine import bitmap, qr
from engine.fixtures import bitmap_corpus_rows
from tests import oracle_bitmap


def _labels(spec):
    return sorted(set(bitmap.extract_features(bitmap.encode_bitmap_page(spec))["labels"]))


def test_detected_labels_per_kind():
    assert _labels({"page_kind": "janzour", "title_text": "t", "body_lines": ["a"]}) == [
        "doc_title",
        "footer",
        "header",
        "table",
    ]
    assert _labels({"page_kind": "massara", "body_lines": ["a"]}) == [
        "footer",
        "header",
        "table",
    ]
    assert _labels({"page_kind": "massara_medicine", "title_text": "t"}) == [
        "footer",
        "header",
        "paragraph_title",
        "table",
    ]
    assert _labels({"page_kind": "idcard", "body_lines": ["x"]}) == ["image"]
    assert _labels({"page_kind": "blank"}) == []


@pytest.mark.parametrize("rot", [0, 90, 180, 270])
def test_qr_rotation_detected_and_unrotated(rot):
    f = bitmap.extract_features(
        bitmap.encode_bitmap_page(
            {"page_kind": "idcard", "body_lines": ["hello"], "rotation": rot}
        )
    )
    assert f["has_qr"] is True
    assert f["qr_rotation"] == rot
    assert f["qr_rotated"] is (rot != 0)
    # M10 crop + sidecar coords are upright — text survives any rotation
    assert f["body_lines"] == ["hello"]


def test_barcode_whiten_marks_boilerplate():
    f = bitmap.extract_features(
        bitmap.encode_bitmap_page(
            {
                "page_kind": "janzour",
                "title_text": "كشف تفاصيل الخدمات",
                "body_lines": ["keep me"],
                "barcode": True,
                "boiler_lines": ["[BARCODE *1*]"],
            }
        )
    )
    assert f["boilerplate"] == ["[BARCODE *1*]"]
    assert "[BARCODE *1*]" in f["body_lines"]  # strip happens downstream (J5)
    assert "keep me" in f["body_lines"]


def test_idcard_crop_drops_out_of_crop_text():
    f = bitmap.extract_features(
        bitmap.encode_bitmap_page(
            {
                "page_kind": "idcard",
                "body_lines": ["inside the card"],
                "noise_text": "below the crop",
            }
        )
    )
    assert f["body_lines"] == ["inside the card"]


def test_two_track_bbox_rescale():
    """Detection runs on the decimated track; returned bboxes must be at FULL
    resolution, matching the render geometry within the decimation quantum."""
    img, _ = bitmap.render_page(
        {"page_kind": "janzour", "title_text": "t", "body_lines": []}
    )
    regions = {r["label"]: r["bbox"] for r in bitmap.detect_layout(img)}
    x1, y1, x2, y2 = regions["doc_title"]
    tx1, ty1, tx2, ty2 = bitmap.TITLE_BAND
    tol = 2 * bitmap._DECIMATE
    assert abs(x1 - tx1) <= tol and abs(y1 - ty1) <= tol
    assert abs(x2 - tx2) <= tol and abs(y2 - ty2) <= tol + 8  # stripe tail


def test_detector_not_fooled_by_barcode_as_qr():
    img = np.full((200, 300), 255, dtype=np.uint8)
    qr.render_barcode(img, 100, 50)
    assert qr.detect_finder_centers(img, stride=2) == []
    assert len(qr.detect_barcodes(img)) == 1


def test_truncated_raster_is_decode_error():
    blob = bitmap.encode_bitmap_page({"page_kind": "massara", "body_lines": ["x"]})
    with pytest.raises(ValueError):
        bitmap.decode_bitmap(blob[: len(blob) // 2])


# ---------------------------------------------------------------------------
# End-to-end golden: bitmap corpus through the real pipeline vs the
# spec-driven oracle (labels/QR/boilerplate all derived from pixels).
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def bitmap_corpus():
    return bitmap_corpus_rows(40, seed=13)


def test_bitmap_golden_pipeline(spark, bitmap_corpus):
    from engine.pipeline import run_extraction
    from engine.schema import MEDIA_BLOBS_SCHEMA, SPANS_SCHEMA

    spans_rows, blob_rows, specs = bitmap_corpus
    spans = spark.createDataFrame(spans_rows, SPANS_SCHEMA)
    blobs = spark.createDataFrame(blob_rows, MEDIA_BLOBS_SCHEMA)
    result = run_extraction(spark, spans, blobs, run_id="t-bitmap")

    got = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans_out"]
        ]
        for r in result.spans_out.collect()
    }
    want_out, want_lin = {}, {}
    for row in spans_rows:
        o, l = oracle_bitmap.process_doc(row["spans"], specs)
        want_out[row["doc_id"]] = o
        for off, status in l.items():
            want_lin[(row["doc_id"], off)] = status

    assert set(got) == set(want_out)
    mismatches = {d: (got[d], want_out[d]) for d in want_out if got[d] != want_out[d]}
    assert not mismatches, f"{len(mismatches)} docs mismatch; first: " + str(
        next(iter(mismatches.items()))
    )

    got_lin = {
        (r["doc_id"], r["offset"]): r["status"] for r in result.lineage.collect()
    }
    assert got_lin == want_lin


def test_crop_ops_m1_to_m5():
    """M1-M5 (image_utils.py:9-138): exact slice semantics incl. clamping."""
    img = np.arange(100 * 60, dtype=np.int32).reshape(100, 60).astype(np.uint8)
    bbox = [10, 20, 50, 40]
    assert bitmap.crop_region(img, bbox).shape == (20, 40)
    assert np.array_equal(bitmap.crop_region(img, bbox), img[20:40, 10:50])
    # M2: keep from bbox TOP to bottom (strip above the title)
    assert np.array_equal(bitmap.crop_below_bbox(img, bbox), img[20:, :])
    # M3: keep below bbox bottom + 50 (40+50=90)
    assert np.array_equal(bitmap.crop_from_lower(img, bbox), img[90:, :])
    assert bitmap.crop_from_lower(img, [0, 0, 10, 80]).shape[0] == 0  # clamp past end
    # M4: keep above bbox top − 50, clamped at 0
    assert bitmap.crop_from_upper(img, bbox).shape[0] == 0  # 20-50 → 0
    assert np.array_equal(bitmap.crop_from_upper(img, [0, 70, 10, 80]), img[:20, :])
    # M5: signed gap, 0.0 on malformed input
    assert bitmap.vertical_distance([0, 0, 10, 30], [0, 45, 10, 60]) == 15.0
    assert bitmap.vertical_distance([0, 0, 10, 50], [0, 45, 10, 60]) == -5.0
    assert bitmap.vertical_distance([0], [1, 2]) == 0.0


@pytest.mark.parametrize("rot", [0, 90])
def test_detector_robust_to_speckle_noise(rot):
    """Salt-and-pepper speckle (300 px ≈ 0.25% of the page) must not bridge
    band gaps, spawn phantom regions, or break QR orientation — the profile
    threshold is the defense."""
    f = bitmap.extract_features(
        bitmap.encode_bitmap_page(
            {
                "page_kind": "idcard",
                "body_lines": ["hello"],
                "rotation": rot,
                "noise_px": 300,
                "noise_seed": 7,
            }
        )
    )
    assert f["has_qr"] is True and f["qr_rotation"] == rot
    assert f["body_lines"] == ["hello"]

    g = bitmap.extract_features(
        bitmap.encode_bitmap_page(
            {
                "page_kind": "janzour",
                "title_text": "كشف تفاصيل الخدمات",
                "body_lines": ["keep"],
                "barcode": True,
                "boiler_lines": ["[B]"],
                "noise_px": 300,
                "noise_seed": 11,
            }
        )
    )
    assert sorted(set(g["labels"])) == ["doc_title", "footer", "header", "table"]
    assert g["boilerplate"] == ["[B]"]

    blank = bitmap.extract_features(
        bitmap.encode_bitmap_page({"page_kind": "blank", "noise_px": 300, "noise_seed": 3})
    )
    assert blank["labels"] == [] and blank["has_qr"] is False
