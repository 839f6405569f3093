"""Bitmap payload mode: deterministic page renderer + the REAL P1 layout
detector (connected-components / projection-profile), M6 barcode whiten,
M7-M9 QR detect/orient and the M10 id-card crop — all running on raster
pixels inside the fused media decode UDF.

Reference analogues:
- layout detection with two-track resolution (detect on a decimated bitmap,
  rescale bboxes to full resolution): /root/reference/app/core/layout/
  detector.py:11-80 (downscale :30-48, rescale :69-72).  The PaddleOCR model
  is replaced by recursive XY-cut projection-profile segmentation plus
  position/shape classification — the classical deterministic method the
  model approximates.
- barcode strip: preprocessing.py:11-67 (expand w×0.1 / h×0.4, paint white).
- QR finder/orientation/idcard crop: barcode.py:10-179, pdf_processor.py:
  745-925 (via engine.qr — the 1:1:3:1:1 run-length scan).
- fused per-page image work in one worker before the OCR hop:
  pdf_processor.py:930-1093.

Wire format (``SPB1``):
    b"SPB1" + uint32_be(json_len) + sidecar json + raster bytes (h×w uint8)
The sidecar carries raster dims, a confidence, and OCR ground truth as
``texts: [[x1,y1,x2,y2,"text"], ...]`` in UPRIGHT page coordinates.  It
deliberately carries NO region labels, NO QR flag, NO boilerplate set —
every one of those is derived from the pixels by the detectors below, which
is what makes this payload mode the "real P1" (the SPG1 codec mode keeps
labels in the payload for fixture-exactness; both decode to the same
PAGE_FEATURES struct).

Geometry contract (the renderer's side of the bargain, all on a 304×400
upright canvas; the detector classifies by position/shape fractions only —
inter-band gaps are ≥ 12 px so speckle noise cannot plausibly bridge them):
    doc_title        y [8,24)    x [60,240)   centered, 60% width
    header           y [40,56)   x [8,296)    full width
    paragraph_title  y [68,84)   x [8,112)    left, <45% width
    table            y [100,300) grid: h-lines every 20 rows, v-lines ×3
    barcode          y [320,344) x [180,300)  alternating 2-3 px stripes
    footer           y [368,384) x [8,296)    full width
    QR (idcard)      116 px box at (20,240)   3 finder patterns
"""

from __future__ import annotations

import json
import struct
from typing import Any

import numpy as np

from engine import qr

MAGIC = b"SPB1"
_HEADER = struct.Struct(">4sI")

PAGE_W, PAGE_H = 304, 400

TITLE_BAND = (60, 8, 240, 24)  # x1, y1, x2, y2
HEADER_BAND = (8, 40, 296, 56)
PTITLE_BAND = (8, 68, 112, 84)
TABLE_BAND = (8, 100, 296, 300)
FOOTER_BAND = (8, 368, 296, 384)
BARCODE_TOP, BARCODE_LEFT = 320, 180
QR_TOP, QR_LEFT = 240, 20
QR_SIZE = 29 * qr.MODULE  # 116

# sidecar text slots (upright coords)
BODY_SLOT = lambda i: (12, 104 + (i % 9) * 20, 146, 116 + (i % 9) * 20)  # noqa: E731
BOILER_SLOT = (200, 316, 260, 350)  # straddles the expanded barcode box
IDCARD_SLOT = lambda i: (170, 260 + (i % 4) * 20, 290, 272 + (i % 4) * 20)  # noqa: E731
IDCARD_NOISE_SLOT = (160, 360, 280, 380)  # below the M10 crop → must drop


# ---------------------------------------------------------------------------
# Renderer
# ---------------------------------------------------------------------------


def _stripes(img: np.ndarray, band: tuple[int, int, int, int]) -> None:
    """Text-line stripes: 5 dark rows / 3 blank rows within the band."""
    x1, y1, x2, y2 = band
    for y in range(y1, y2):
        if (y - y1) % 8 < 5:
            img[y, x1:x2] = 0


def _table(img: np.ndarray, band: tuple[int, int, int, int]) -> None:
    x1, y1, x2, y2 = band
    for y in range(y1, y2 + 1, 20):
        img[y : y + 2, x1:x2] = 0
    # 3 px rules: each vertical line spans ≥ 2 decimated columns, so a cell
    # row clears the detector's speckle threshold on the decimated track
    for x in (x1, (x1 + x2) // 2, x2 - 3):
        img[y1:y2, x : x + 3] = 0


_KIND_BANDS: dict[str, list[tuple[int, int, int, int]]] = {
    "janzour": [TITLE_BAND, HEADER_BAND, TABLE_BAND, FOOTER_BAND],
    "janzour_receipt": [TITLE_BAND, HEADER_BAND, TABLE_BAND, FOOTER_BAND],
    "skip_medicine_title": [TITLE_BAND, HEADER_BAND, TABLE_BAND, FOOTER_BAND],
    "skip_discharge": [TITLE_BAND, HEADER_BAND, TABLE_BAND, FOOTER_BAND],
    "massara": [HEADER_BAND, TABLE_BAND, FOOTER_BAND],
    "massara_medicine": [PTITLE_BAND, HEADER_BAND, TABLE_BAND, FOOTER_BAND],
    "idcard": [],
    "blank": [],
}


def render_page(spec: dict[str, Any]) -> tuple[np.ndarray, list[list]]:
    """Spec → (raster, sidecar texts).  Spec fields:
    page_kind, title_text, body_lines, boiler_lines, barcode(bool),
    rotation(0/90/180/270 — idcard only), conf.
    Texts are positioned by the geometry contract; the raster is rotated
    CLOCKWISE by ``rotation`` at the end (sidecar stays upright)."""
    kind = spec.get("page_kind", "blank")
    img = np.full((PAGE_H, PAGE_W), 255, dtype=np.uint8)
    texts: list[list] = []

    bands = _KIND_BANDS.get(kind, [])
    for band in bands:
        if band is TABLE_BAND:
            _table(img, band)
        else:
            _stripes(img, band)

    title = spec.get("title_text")
    if title:
        tb = PTITLE_BAND if kind == "massara_medicine" else TITLE_BAND
        if tb in bands:
            texts.append([*tb, title])

    if kind == "idcard":
        top, left = QR_TOP, QR_LEFT
        far = QR_SIZE - 7 * qr.MODULE
        corners = {"tl": (0, 0), "tr": (0, far), "bl": (far, 0), "br": (far, far)}
        for name, (dy, dx) in corners.items():
            if name != "br":  # upright = missing bottom-right
                qr.render_finder(img, top + dy, left + dx)
        for i, line in enumerate(spec.get("body_lines") or []):
            texts.append([*IDCARD_SLOT(i), line])
        if spec.get("noise_text"):
            texts.append([*IDCARD_NOISE_SLOT, spec["noise_text"]])
    else:
        for i, line in enumerate(spec.get("body_lines") or []):
            texts.append([*BODY_SLOT(i), line])

    if spec.get("barcode"):
        qr.render_barcode(img, BARCODE_TOP, BARCODE_LEFT)
        for line in spec.get("boiler_lines") or []:
            texts.append([*BOILER_SLOT, line])

    noise_px = int(spec.get("noise_px", 0) or 0)
    if noise_px:
        # deterministic salt-and-pepper speckle (scanner noise analogue)
        import random as _random

        rng = _random.Random(int(spec.get("noise_seed", 0)))
        for _ in range(noise_px):
            img[rng.randrange(PAGE_H), rng.randrange(PAGE_W)] = 0

    rotation = int(spec.get("rotation", 0) or 0)
    if rotation:
        img = np.rot90(img, k=(4 - rotation // 90) % 4).copy()
    return img, texts


def encode_bitmap_page(spec: dict[str, Any], pad_to: int = 0) -> bytes:
    img, texts = render_page(spec)
    sidecar = {
        "w": int(img.shape[1]),
        "h": int(img.shape[0]),
        "conf": float(spec.get("conf", 1.0)),
        "texts": texts,
    }
    body = json.dumps(sidecar, ensure_ascii=False, sort_keys=True).encode("utf-8")
    blob = _HEADER.pack(MAGIC, len(body)) + body + img.tobytes()
    if pad_to > len(blob):
        blob += b"\x00" * (pad_to - len(blob))
    return blob


def decode_bitmap(blob: bytes) -> tuple[np.ndarray, dict[str, Any]]:
    raw = bytes(blob)
    if len(raw) < _HEADER.size:
        raise ValueError("payload shorter than header")
    magic, length = _HEADER.unpack_from(raw)
    if magic != MAGIC:
        raise ValueError(f"bad magic {magic!r}")
    sidecar = json.loads(raw[_HEADER.size : _HEADER.size + length].decode("utf-8"))
    w, h = int(sidecar["w"]), int(sidecar["h"])
    start = _HEADER.size + length
    if len(raw) < start + w * h:
        raise ValueError("truncated raster")
    img = np.frombuffer(raw, dtype=np.uint8, count=w * h, offset=start).reshape(h, w)
    return img, sidecar


# ---------------------------------------------------------------------------
# M1-M5 — standalone crop/geometry ops (image_utils.py:9-138).  ndarray
# slices on the decoded raster; the fused decode path composes the same
# arithmetic (title-strip, idcard crop), these are the reusable primitives.
# ---------------------------------------------------------------------------


def crop_region(img: np.ndarray, bbox) -> np.ndarray:
    """M1 (image_utils.py:9-28): crop bbox [x1,y1,x2,y2]."""
    x1, y1, x2, y2 = (int(v) for v in bbox)
    return img[max(0, y1) : y2, max(0, x1) : x2]


def crop_below_bbox(img: np.ndarray, bbox) -> np.ndarray:
    """M2 (image_utils.py:31-56): keep from bbox TOP (y1) to page bottom —
    strips everything above the title."""
    return img[max(0, int(bbox[1])) :, :]


def crop_from_lower(img: np.ndarray, bbox, offset: int = 50) -> np.ndarray:
    """M3 (image_utils.py:58-85): keep below bbox bottom + offset (header strip)."""
    return img[max(0, int(bbox[3]) + offset) :, :]


def crop_from_upper(img: np.ndarray, bbox, offset: int = 50) -> np.ndarray:
    """M4 (image_utils.py:88-117): keep above bbox top − offset (footer strip);
    clamped at 0 like the reference."""
    return img[: max(0, int(bbox[1]) - offset), :]


def vertical_distance(b1, b2) -> float:
    """M5 (image_utils.py:120-138): b2.y1 − b1.y2 (signed); 0.0 on bad input."""
    try:
        return float(b2[1]) - float(b1[3])
    except (IndexError, TypeError, ValueError):
        return 0.0


# ---------------------------------------------------------------------------
# P1 — projection-profile layout detection (two-track resolution)
# ---------------------------------------------------------------------------

_DECIMATE = 2  # detect on every-2nd-pixel track, rescale bboxes ×2
_ROW_GAP = 2  # blank decimated rows that split bands (4 full-res rows)
_COL_GAP = 4  # blank decimated cols that split regions (8 full-res cols)
# A profile entry needs ≥ this many dark pixels to count as content: real
# scans carry salt-and-pepper speckle (fixtures sprinkle up to 200 px ≈
# λ≈1 noise pixel per decimated profile row), and stray pixels must not
# bridge a band gap or spawn a phantom region.  Every legitimate structure
# the renderer draws puts ≥ 4 dark pixels in each of its profile entries
# even on the decimated track; P(Poisson(1) ≥ 4) ≈ 2%.
_MIN_PROFILE = 4


def _segments(
    profile: np.ndarray, min_gap: int, opening: bool = False
) -> list[tuple[int, int]]:
    """Content [start, end) runs of a projection profile (entries below the
    speckle threshold are blank), merging runs separated by fewer than
    min_gap blank entries.

    ``opening`` additionally drops ISOLATED content entries (no content
    neighbor on either side) — morphological opening.  Used on the row
    profile: every legitimate band is ≥ 2 consecutive content rows, while a
    noise row that cleared the threshold is almost surely alone, and one
    such row sitting inside an inter-band gap would otherwise chain two
    bands together."""
    content = profile >= _MIN_PROFILE
    if opening and len(content) >= 2:
        left = np.concatenate(([False], content[:-1]))
        right = np.concatenate((content[1:], [False]))
        content = content & (left | right)
    nz = np.flatnonzero(content)
    if len(nz) == 0:
        return []
    out = []
    start = prev = int(nz[0])
    for v in nz[1:]:
        v = int(v)
        if v - prev > min_gap:
            out.append((start, prev + 1))
            start = v
        prev = v
    out.append((start, prev + 1))
    return out


def _classify(bbox: tuple[int, int, int, int], shape: tuple[int, int], crop: np.ndarray) -> str:
    x1, y1, x2, y2 = bbox
    h_img, w_img = shape
    yc = (y1 + y2) / 2.0 / h_img
    hh, ww = (y2 - y1) / h_img, (x2 - x1) / w_img
    if hh >= 0.25:
        # grid check: several full-width dark rule lines → table
        dark_rows = ((crop < 128).mean(axis=1) > 0.5).sum()
        return "table" if dark_rows >= 3 else "image"
    if yc < 0.075:
        return "doc_title"
    if yc < 0.14:
        return "header"
    if yc < 0.20 and ww < 0.45:
        return "paragraph_title"
    if yc > 0.85:
        return "footer"
    return "text"


def detect_layout(img: np.ndarray) -> list[dict[str, Any]]:
    """XY-cut over the decimated dark-pixel projection profiles →
    [{label, score, bbox[x1,y1,x2,y2]}] at FULL resolution (two-track:
    detector.py:30-48 downscales for the model and rescales the boxes)."""
    small = img[::_DECIMATE, ::_DECIMATE] < 128
    regions = []
    row_profile = small.sum(axis=1)
    for ry1, ry2 in _segments(row_profile, _ROW_GAP, opening=True):
        band = small[ry1:ry2]
        col_profile = band.sum(axis=0)
        for cx1, cx2 in _segments(col_profile, _COL_GAP):
            bbox = (
                cx1 * _DECIMATE,
                ry1 * _DECIMATE,
                cx2 * _DECIMATE,
                ry2 * _DECIMATE,
            )
            crop = img[bbox[1] : bbox[3], bbox[0] : bbox[2]]
            label = _classify(bbox, img.shape, crop)
            regions.append({"label": label, "score": 1.0, "bbox": list(bbox)})
    return regions


# ---------------------------------------------------------------------------
# Fused feature extraction: QR → upright → barcode whiten → layout → texts
# ---------------------------------------------------------------------------


def _overlap(a: list[int] | tuple, b: list[int] | tuple) -> int:
    """Pixel overlap area of two [x1,y1,x2,y2] boxes."""
    w = min(a[2], b[2]) - max(a[0], b[0])
    h = min(a[3], b[3]) - max(a[1], b[1])
    return max(0, w) * max(0, h)


def _qr_bbox(centers: list[tuple[int, int]]) -> tuple[int, int, int, int]:
    pad = 7 * qr.MODULE // 2 + qr.MODULE
    xs = [c[0] for c in centers]
    ys = [c[1] for c in centers]
    return (min(xs) - pad, min(ys) - pad, max(xs) + pad, max(ys) + pad)


def extract_features(blob: bytes) -> dict[str, Any]:
    """SPB1 payload → the PAGE_FEATURES dict (same shape the SPG1 codec path
    produces) with every flag derived from pixels:

    1. M7-M9: QR finder scan (1:1:3:1:1 run-length, stride 4) → has_qr +
       rotation; rotate the raster upright when rotated (sidecar text boxes
       are already upright).
    2. M6: barcode stripe detection → expanded boxes whitened; sidecar texts
       overlapping an expanded box become the boilerplate set.
    3. P1: projection-profile layout over the cleaned raster → region labels.
    4. M10: pages that look like id-cards (QR present, no header+table and no
       doc_title+table) keep only texts inside the QR-expanded crop box
       (up ×4.0, right ×5.8 — barcode.py:75-179 constants).
    5. Texts overlapping a detected title region become title_text; the rest
       (ordered by y,x) are body_lines.
    """
    img, sidecar = decode_bitmap(blob)

    centers = qr.detect_finder_centers(img, stride=4)
    rotation = qr.orientation_from_centers(centers) if len(centers) == 3 else None
    if rotation:
        img = qr.rotate_upright(img, rotation)
        centers = qr.detect_finder_centers(img, stride=4)
    has_qr = len(centers) == 3

    work = img.copy()
    qr_box = None
    if has_qr:
        qr_box = _qr_bbox(centers)
        work[
            max(0, qr_box[1]) : qr_box[3], max(0, qr_box[0]) : qr_box[2]
        ] = 255

    barcode_boxes = qr.detect_barcodes(work)
    expanded = []
    h_img, w_img = work.shape
    for box in barcode_boxes:
        ex = qr.expand_barcode_box(box, work.shape)
        expanded.append(ex)
        work[ex[1] : ex[3], ex[0] : ex[2]] = 255

    regions = detect_layout(work)
    labels = [r["label"] for r in regions]
    if qr_box is not None:
        regions.append({"label": "image", "score": 1.0, "bbox": list(qr_box)})
        labels.append("image")

    texts = [([int(v) for v in t[:4]], str(t[4])) for t in sidecar.get("texts", [])]

    # M10 id-card crop: keep only texts whose center lies inside the crop
    lbl = set(labels)
    idcard_like = (
        has_qr
        and not ({"header", "table"} <= lbl)
        and not ({"doc_title", "table"} <= lbl)
    )
    if idcard_like and qr_box is not None:
        crop = qr.idcard_crop_box(work.shape, qr_box)
        texts = [
            (bb, tx)
            for bb, tx in texts
            if crop[0] <= (bb[0] + bb[2]) / 2 < crop[2]
            and crop[1] <= (bb[1] + bb[3]) / 2 < crop[3]
        ]

    title_regions = [
        r["bbox"] for r in regions if r["label"] in ("doc_title", "paragraph_title")
    ]
    title_parts, body, boiler = [], [], []
    for bb, tx in sorted(texts, key=lambda t: (t[0][1], t[0][0])):
        if any(_overlap(bb, tr) > 0 for tr in title_regions):
            title_parts.append(tx)
        else:
            body.append(tx)
            if any(_overlap(bb, ex) > 0 for ex in expanded):
                boiler.append(tx)

    return {
        "page_kind": None,  # unknown by construction — the detector decides
        "labels": labels,
        "title_text": " ".join(title_parts) if title_parts else None,
        "body_lines": body,
        "has_qr": has_qr,
        "qr_rotated": bool(rotation),
        "qr_rotation": int(rotation) if rotation is not None else (0 if has_qr else None),
        "boilerplate": boiler,
        "conf": float(sidecar.get("conf", 1.0)),
        "decode_error": None,
    }
