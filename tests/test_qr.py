"""QR finder-pattern / orientation tests (M7-M9): the classical 1:1:3:1:1
ratio scan + L-shape orientation, pure numpy inside mapInPandas."""

from __future__ import annotations

import numpy as np
import pytest

from engine.qr import (
    detect_finder_centers,
    detect_qr,
    orientation_from_centers,
    render_qr_page,
)


@pytest.mark.parametrize("rot", [0, 90, 180, 270])
def test_orientation_roundtrip(rot):
    img = render_qr_page(rot)
    centers = detect_finder_centers(img)
    assert len(centers) == 3
    assert orientation_from_centers(centers) == rot


def test_blank_page_no_finders():
    img = np.full((100, 100), 255, dtype=np.uint8)
    assert detect_finder_centers(img) == []
    assert orientation_from_centers([]) is None


def test_detect_qr_batch(spark):
    rows = []
    for rot in (0, 90, 180, 270):
        img = render_qr_page(rot)
        rows.append((f"q{rot}", bytearray(img.tobytes()), img.shape[1]))
    rows.append(("bad", bytearray(b"\x00" * 7), 3))  # non-rectangular → error
    df = spark.createDataFrame(rows, "asset_id: string, payload: binary, width: int")
    got = {r["asset_id"]: r for r in detect_qr(df).collect()}
    for rot in (0, 90, 180, 270):
        r = got[f"q{rot}"]
        assert (r["n_finders"], r["rotation"]) == (3, rot)
    assert got["bad"]["error"] is not None and got["bad"]["rotation"] is None


class TestBarcode:
    def test_detect_and_whiten(self):
        from engine.qr import detect_barcodes, render_barcode, whiten_barcodes

        img = np.full((200, 300), 255, dtype=np.uint8)
        render_barcode(img, top=50, left=40)
        # a text-like sparse row must not trigger
        img[120, 50:60] = 0
        boxes = detect_barcodes(img)
        assert len(boxes) == 1
        x1, y1, x2, y2 = boxes[0]
        assert 35 <= x1 <= 45 and 45 <= y1 <= 55
        cleaned, n = whiten_barcodes(img)
        assert n == 1
        # barcode zone is white now; the text blob survives
        assert (cleaned[50:74, 40:160] == 255).all()
        assert (cleaned[120, 50:60] == 0).all()

    def test_blank_no_barcode(self):
        from engine.qr import detect_barcodes

        assert detect_barcodes(np.full((50, 50), 255, dtype=np.uint8)) == []


class TestIdcardCrop:
    def test_rotate_then_crop(self):
        from engine.qr import (
            detect_finder_centers,
            idcard_crop,
            orientation_from_centers,
            render_qr_page,
            rotate_upright,
        )

        img = render_qr_page(90)
        rot = orientation_from_centers(detect_finder_centers(img))
        upright = rotate_upright(img, rot)
        # upright page must now read as rotation 0
        assert orientation_from_centers(detect_finder_centers(upright)) == 0

        # crop geometry: QR box 20x20 at (10, 100) → card spans up x4, right x5.8
        page = np.full((200, 300), 255, dtype=np.uint8)
        card = idcard_crop(page, (10, 100, 30, 120))
        assert card.shape == (80, 116)  # (y2 - (y2-4*20)) x (5.8*20)


class TestScanRowsDifferential:
    """The batched row scanner must reproduce the per-line scanner exactly —
    same hits, same row-major order (candidate dedup depends on order)."""

    def test_matches_per_line_scan_on_random_and_structured_pages(self):
        from engine.qr import _despeckle_rows, _scan_line, _scan_rows, render_qr_page

        rng = np.random.default_rng(7)
        for trial in range(60):
            kind = trial % 4
            R, W = int(rng.integers(1, 40)), int(rng.integers(1, 200))
            if kind == 0:
                img = rng.integers(0, 256, (R, W)).astype(np.uint8)
            elif kind == 1:
                img = np.full((R, W), 255, np.uint8)
                for _ in range(int(rng.integers(0, 8))):
                    r0, c0 = int(rng.integers(0, R)), int(rng.integers(0, W))
                    img[r0, c0 : c0 + int(rng.integers(1, 30))] = 0
            elif kind == 2:
                img = render_qr_page(rotation=int(rng.choice([0, 90, 180, 270])))
            else:
                img = np.zeros((R, W), np.uint8)
            sub = _despeckle_rows(img < 128)
            want = [
                (rr, cx)
                for rr in range(sub.shape[0])
                for cx, _w in _scan_line(sub[rr])
            ]
            rrs, cxs = _scan_rows(sub)
            assert list(zip(rrs.tolist(), cxs.tolist())) == want
