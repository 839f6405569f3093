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
