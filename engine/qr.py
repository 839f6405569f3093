"""QR finder-pattern detection & orientation (M7-M9 — SURVEY.md §2.3).

The reference finds QR codes two ways — approx-poly contours
(/root/reference/app/core/document/barcode.py:10-39) and contour-hierarchy
nesting depth (pdf_processor.py:745-780) — then infers page rotation from the
L-shape of the three finder centers (barcode.py:42-57 two-state;
pdf_processor.py:782-822 four-state).  This module re-implements the
*classical deterministic* algorithm those models approximate:

- finder pattern = the 1:1:3:1:1 dark/light run-length ratio, scanned along
  rows and cross-checked along the column through each candidate center
  (the actual QR spec detection method — no ML, fully vectorizable);
- center dedup by distance (pdf_processor.py:774-780: > 10 px apart);
- orientation: the corner vertex of the L (the center whose vectors to the
  other two are ~perpendicular) names the quadrant → 0/90/180/270.

Bitmaps are numpy uint8 (0=dark, 255=light); batch entry is mapInPandas.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

MODULE = 4  # synthetic pixels per QR module
_RATIO = (1, 1, 3, 1, 1)


def render_finder(img: np.ndarray, top: int, left: int, module: int = MODULE) -> None:
    """Draw a 7x7-module finder pattern (dark ring, light ring, dark 3x3)."""
    m = module
    img[top : top + 7 * m, left : left + 7 * m] = 0
    img[top + m : top + 6 * m, left + m : left + 6 * m] = 255
    img[top + 2 * m : top + 5 * m, left + 2 * m : left + 5 * m] = 0


def render_qr_page(rotation: int = 0, size: int = 29 * MODULE) -> np.ndarray:
    """Synthetic page with three finder patterns whose missing corner encodes
    ``rotation`` ∈ {0, 90, 180, 270} (0 = missing bottom-right, as upright)."""
    img = np.full((size, size), 255, dtype=np.uint8)
    margin = 0
    far = size - 7 * MODULE - margin
    corners = {
        "tl": (margin, margin),
        "tr": (margin, far),
        "bl": (far, margin),
        "br": (far, far),
    }
    missing = {0: "br", 90: "bl", 180: "tl", 270: "tr"}[rotation]
    for name, (top, left) in corners.items():
        if name != missing:
            render_finder(img, top, left)
    return img


# 1:1:3:1:1 with tolerance 0.6·unit (unit = window/7) — the QR spec ratios
_RATIO_WANT = np.array([1.0, 1.0, 3.0, 1.0, 1.0])


def _despeckle_1d(dark: np.ndarray) -> np.ndarray:
    if len(dark) < 3:
        return dark
    d = dark.astype(np.int8)
    sm = dark.copy()
    sm[1:-1] = (d[:-2] + d[1:-1] + d[2:]) >= 2
    return sm


def _despeckle_rows(dark: np.ndarray) -> np.ndarray:
    """Whole-matrix 3-tap majority along rows — one vectorized pass instead
    of one per scanned row (same output as _despeckle_1d per row)."""
    if dark.shape[1] < 3:
        return dark
    d = dark.astype(np.int8)
    sm = dark.copy()
    sm[:, 1:-1] = (d[:, :-2] + d[:, 1:-1] + d[:, 2:]) >= 2
    return sm


def _scan_line(line: np.ndarray) -> list[tuple[int, int]]:
    """→ [(center_idx, pattern_width)] of 1:1:3:1:1 matches along one line.
    Accepts grayscale uint8 or a precomputed boolean dark mask.

    3-tap majority despeckle first: a single flipped pixel (scanner salt /
    pepper) splits a run and kills the ratio test, while every legitimate
    QR structure is ≥ MODULE (4 px) wide — so the filter removes noise and
    cannot remove signal.  The 5-run sliding ratio test is fully numpy —
    busy rows (a barcode band has ~100 runs) cost microseconds, which is
    what lets the row prefilter keep NO upper transition bound."""
    # bool input = caller already despeckled (detect_finder_centers batches
    # the filter over the whole matrix); grayscale input = despeckle here
    dark = _despeckle_1d(line < 128) if line.dtype != np.bool_ else line
    changes = np.flatnonzero(np.diff(dark.astype(np.int8))) + 1
    bounds = np.concatenate(([0], changes, [len(dark)]))
    widths = np.diff(bounds)
    n = len(widths)
    if n < 5:
        return []
    win = np.lib.stride_tricks.sliding_window_view(widths, 5)
    unit = win.sum(axis=1) / 7.0
    ok = (np.abs(win - unit[:, None] * _RATIO_WANT) <= (unit * 0.6)[:, None]).all(axis=1)
    # window must START on a dark run (runs alternate from dark[0])
    idx = np.arange(n - 4)
    dark_start = (idx % 2 == 0) if bool(dark[0]) else (idx % 2 == 1)
    ok &= dark_start
    out = []
    for i in np.flatnonzero(ok):
        start = int(bounds[i])
        width = int(win[i].sum())
        out.append((start + width // 2, width))
    return out


def _scan_rows(sub: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized _scan_line over EVERY row of a despeckled dark matrix in
    one flat pass: run-length-encode all rows with row-offset-separated
    bounds, slide the 5-run 1:1:3:1:1 ratio window over the concatenated
    widths, and mask windows that cross a row boundary.  Returns
    (row_index, center_x) arrays in row-major window order — the exact
    candidate order the per-row loop produced (dedup depends on it).
    Replaces ~40 per-row numpy calls/page (~70 µs call overhead each) with
    one O(total runs) pass."""
    R, W = sub.shape
    if R == 0 or W == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    d8 = sub.astype(np.int8)
    rows_idx, cols_idx = np.nonzero(d8[:, 1:] != d8[:, :-1])
    counts = np.bincount(rows_idx, minlength=R)  # transitions per row
    nb = counts + 2  # bounds per row: [0, changes+1..., W]
    off = np.concatenate(([0], np.cumsum(nb)))
    flat = np.empty(off[-1], dtype=np.int64)
    flat[off[:-1]] = 0
    flat[off[1:] - 1] = W
    row_start = np.concatenate(([0], np.cumsum(counts)))[:-1]
    rank = np.arange(len(rows_idx)) - np.repeat(row_start, counts)
    flat[off[rows_idx] + 1 + rank] = cols_idx + 1
    widths_all = np.diff(flat)  # row r's widths: indices off[r] .. off[r]+nb[r]-2
    # valid 5-run window starts per row: off[r] .. off[r]+nb[r]-6
    wcounts = np.maximum(nb - 5, 0)
    if int(wcounts.sum()) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    row_of_win = np.repeat(np.arange(R), wcounts)
    wstart = np.concatenate(([0], np.cumsum(wcounts)))[:-1]
    j = off[row_of_win] + (np.arange(len(row_of_win)) - np.repeat(wstart, wcounts))
    win = np.lib.stride_tricks.sliding_window_view(widths_all, 5)[j]
    unit = win.sum(axis=1) / 7.0
    ok = (np.abs(win - unit[:, None] * _RATIO_WANT) <= (unit * 0.6)[:, None]).all(axis=1)
    # window must start on a dark run (runs alternate from the row's first pixel)
    i = j - off[row_of_win]
    ok &= (i % 2 == 0) == sub[row_of_win, 0]
    hit = np.flatnonzero(ok)
    jj = j[hit]
    cx = flat[jj] + win[hit].sum(axis=1) // 2
    return row_of_win[hit], cx


def detect_finder_centers(img: np.ndarray, stride: int = 1) -> list[tuple[int, int]]:
    """Scan rows (every ``stride``-th — the finder's middle band is 3 modules
    = 12 px tall, so stride ≤ 4 cannot miss it) for the ratio, cross-check
    the column through each candidate, dedup centers closer than 10 px
    (pdf_processor.py:774-780).

    Row scanning is fully batched (_scan_rows): every row's run-length
    ratio test happens in one flat numpy pass, so there is no per-row python
    cost and deliberately NO upper transition bound — a finder sharing rows
    with busy content (dashes, a barcode, dense text) is still scanned and
    the ratio test rejects the non-QR windows.  Only the rare column
    cross-checks use the per-line scan."""
    # threshold only the scanned rows (stride 4 → ¼ of the image's bytes);
    # a full-image dark mask would be pure wasted memory bandwidth — at 8+
    # concurrent decoders per host the VM's memory bus, not CPU, caps decode
    # throughput (BENCH/decode-ceiling.json)
    sub = _despeckle_rows(img[::stride] < 128)  # batch the 3-tap filter
    # column scans are rare (only through row-pattern candidates) —
    # threshold + despeckle those columns lazily
    col_cache: dict[int, np.ndarray] = {}

    def col(cx: int) -> np.ndarray:
        if cx not in col_cache:
            col_cache[cx] = _despeckle_1d(img[:, cx] < 128)
        return col_cache[cx]

    candidates: list[tuple[int, int]] = []
    for rr, cx in zip(*(a.tolist() for a in _scan_rows(sub))):
        y = rr * stride
        col_hits = _scan_line(col(cx))
        for cy, _h in col_hits:
            if abs(cy - y) <= _h:  # the row we scanned crosses this pattern
                candidates.append((cx, cy))
    centers: list[tuple[int, int]] = []
    for cx, cy in candidates:
        if all(math.hypot(cx - x, cy - y) > 10 for x, y in centers):
            centers.append((cx, cy))
    return centers


def orientation_from_centers(centers: list[tuple[int, int]]) -> int | None:
    """Rotation 0/90/180/270 from the L-shape corner vertex
    (pdf_processor.py:782-822 four-state variant)."""
    if len(centers) != 3:
        return None
    # corner vertex = the center whose vectors to the others are ~perpendicular
    best, best_dot = None, None
    for i in range(3):
        a = np.array(centers[(i + 1) % 3]) - np.array(centers[i])
        b = np.array(centers[(i + 2) % 3]) - np.array(centers[i])
        dot = abs(float(np.dot(a, b)) / (np.linalg.norm(a) * np.linalg.norm(b)))
        if best_dot is None or dot < best_dot:
            best, best_dot = i, dot
    cx = sum(c[0] for c in centers) / 3
    cy = sum(c[1] for c in centers) / 3
    vx, vy = centers[best][0] - cx, centers[best][1] - cy
    # corner vertex quadrant relative to centroid → rotation
    if vx < 0 and vy < 0:
        return 0  # corner at top-left → upright
    if vx >= 0 and vy < 0:
        return 90  # corner at top-right
    if vx >= 0 and vy >= 0:
        return 180
    return 270  # corner at bottom-left


# ---------------------------------------------------------------------------
# M6 — barcode detection + whiten (preprocessing.py:11-67): a 1-D barcode is a
# horizontal band of many short alternating vertical stripes.  Deterministic
# heuristic: per row, count dark/light transitions; barcode rows have far more
# transitions than text; group consecutive high-transition rows into a band,
# take the dark-pixel column extent, expand the box (w×0.1, h×0.4 — the
# reference's expansion factors) and paint it white.
# ---------------------------------------------------------------------------

BARCODE_MIN_TRANSITIONS = 20
BARCODE_MIN_ROWS = 4


def render_barcode(img: np.ndarray, top: int, left: int, width: int = 120, height: int = 24) -> None:
    """Synthetic 1-D barcode: alternating 2-3 px vertical stripes."""
    x = left
    dark = True
    i = 0
    while x < left + width:
        w = 2 + (i % 2)
        if dark:
            img[top : top + height, x : min(x + w, left + width)] = 0
        x += w
        dark = not dark
        i += 1


def detect_barcodes(img: np.ndarray) -> list[tuple[int, int, int, int]]:
    """→ [(x1, y1, x2, y2)] barcode boxes via the transition-count heuristic."""
    dark = img < 128
    transitions = np.abs(np.diff(dark.astype(np.int8), axis=1)).sum(axis=1)
    hot = transitions >= BARCODE_MIN_TRANSITIONS
    boxes = []
    y = 0
    while y < len(hot):
        if hot[y]:
            y0 = y
            while y < len(hot) and hot[y]:
                y += 1
            if y - y0 >= BARCODE_MIN_ROWS:
                band = dark[y0:y, :]
                cols = np.flatnonzero(band.any(axis=0))
                if len(cols):
                    boxes.append((int(cols[0]), y0, int(cols[-1]) + 1, y))
        y += 1
    return boxes


BARCODE_EXPAND_W, BARCODE_EXPAND_H = 0.1, 0.4  # preprocessing.py:11-67 factors


def expand_barcode_box(
    box: tuple[int, int, int, int], shape: tuple[int, int]
) -> tuple[int, int, int, int]:
    """The reference's (w×0.1, h×0.4) barcode-box expansion, clamped to the
    image — the ONE home of these constants (whiten + the fused bitmap path
    both use it; keeping two copies is how they desynchronize)."""
    x1, y1, x2, y2 = box
    h_img, w_img = shape
    dx = int((x2 - x1) * BARCODE_EXPAND_W)
    dy = int((y2 - y1) * BARCODE_EXPAND_H)
    return (max(0, x1 - dx), max(0, y1 - dy), min(w_img, x2 + dx), min(h_img, y2 + dy))


def whiten_barcodes(img: np.ndarray) -> tuple[np.ndarray, int]:
    """Expand each detected box by (w×0.1, h×0.4) and paint white
    (preprocessing.py:11-67 semantics).  Returns (cleaned copy, n_boxes)."""
    out = img.copy()
    boxes = detect_barcodes(img)
    for box in boxes:
        x1, y1, x2, y2 = expand_barcode_box(box, img.shape)
        out[y1:y2, x1:x2] = 255
    return out, len(boxes)


# ---------------------------------------------------------------------------
# M10 — id-card crop (barcode.py:75-179): rotate the page upright using the
# QR orientation, then crop the id-card region by expanding the QR bbox
# upward ×4.0 and rightward ×5.8 (the reference's constants).
# ---------------------------------------------------------------------------

IDCARD_UP_FACTOR = 4.0
IDCARD_RIGHT_FACTOR = 5.8


def rotate_upright(img: np.ndarray, rotation: int) -> np.ndarray:
    """Undo a detected clockwise page rotation with exact k×90° array rots."""
    k = {0: 0, 90: 1, 180: 2, 270: 3}[rotation]
    return np.rot90(img, k=k)


def idcard_crop_box(
    shape: tuple[int, int], qr_box: tuple[int, int, int, int]
) -> tuple[int, int, int, int]:
    """Id-card crop rectangle [x1,y1,x2,y2] from the QR bbox: the card
    extends up ×4.0 and right ×5.8 of the QR size (barcode.py:75-179
    constants).  Shared by idcard_crop and the fused bitmap path."""
    x1, y1, x2, y2 = qr_box
    w, h = x2 - x1, y2 - y1
    top = max(0, int(y2 - h * IDCARD_UP_FACTOR))
    right = min(shape[1], int(x1 + w * IDCARD_RIGHT_FACTOR))
    return (max(0, x1), top, right, y2)


def idcard_crop(img: np.ndarray, qr_box: tuple[int, int, int, int]) -> np.ndarray:
    """Crop the id-card region from the (upright) page given the QR bbox."""
    x1, y1, x2, y2 = idcard_crop_box(img.shape, qr_box)
    return img[y1:y2, x1:x2]


QR_RESULT_SCHEMA = StructType(
    [
        StructField("asset_id", StringType(), False),
        StructField("n_finders", IntegerType(), False),
        StructField("rotation", IntegerType(), True),
        StructField("error", StringType(), True),
    ]
)


def detect_qr(assets: DataFrame, width_col: str = "width") -> DataFrame:
    """mapInPandas over (asset_id, payload=raw grayscale bytes, width):
    decode bitmap → finder scan → orientation; per-item failure isolation."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "n_finders": [], "rotation": [], "error": []}
            for aid, payload, width in zip(pdf["asset_id"], pdf["payload"], pdf[width_col]):
                out["asset_id"].append(aid)
                try:
                    raw = np.frombuffer(bytes(payload), dtype=np.uint8)
                    img = raw.reshape(-1, int(width))
                    centers = detect_finder_centers(img)
                    out["n_finders"].append(len(centers))
                    out["rotation"].append(orientation_from_centers(centers))
                    out["error"].append(None)
                except Exception as exc:  # noqa: BLE001
                    out["n_finders"].append(0)
                    out["rotation"].append(None)
                    out["error"].append(f"{type(exc).__name__}: {exc}")
            yield pd.DataFrame(out)

    return assets.mapInPandas(gen, QR_RESULT_SCHEMA)
