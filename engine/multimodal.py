"""Multimodal column operators: image/audio/video as opaque binary + typed
metadata, processed in Arrow-batched ``mapInPandas`` stages.

The Spark-side plumbing — schemas, batch iteration, partitioning contract —
is real and tested; the pixel/sample decoding itself is stubbed behind
``try-import`` gates (PIL / soundfile / av are not in this container) with a
deterministic fake driven by the payload header, so tests are exact and the
swap-in point for real codecs is a single function per modality.

Schema contract (media_assets table):
    asset_id  string
    modality  string        -- 'image' | 'audio' | 'video'
    payload   binary        -- container bytes; here: b'IMG1'/b'AUD1'/b'VID1'
                            -- + uint32 width/height | sample-rate/frames | n_frames
    meta      map<string,string>

Fake container layout (deterministic, versioned like engine.codec):
    image: b'IMG1' + >II (width, height)      + pixel bytes
    audio: b'AUD1' + >II (rate, n_samples)    + sample bytes
    video: b'VID1' + >I  (n_frames)           + frames, each b'IMG1…'-framed
"""

from __future__ import annotations

import struct
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

try:  # real decoders, absent in this container — stub-gated by design
    import PIL.Image as _PIL  # noqa: N814
except ImportError:
    _PIL = None

IMAGE_META_SCHEMA = StructType(
    [
        StructField("asset_id", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_bytes", IntegerType(), True),
        StructField("error", StringType(), True),
    ]
)

RESIZE_SCHEMA = StructType(
    [
        StructField("asset_id", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", StringType(), False),
        StructField("frame_index", IntegerType(), False),
        StructField("payload", BinaryType(), True),
    ]
)


def encode_image(width: int, height: int, seed: int = 0) -> bytes:
    body = bytes((seed + i) % 251 for i in range(min(width * height, 4096)))
    return b"IMG1" + struct.pack(">II", width, height) + body


def encode_video(frames: list[bytes]) -> bytes:
    out = b"VID1" + struct.pack(">I", len(frames))
    for f in frames:
        out += struct.pack(">I", len(f)) + f
    return out


def _parse_image(payload: bytes) -> tuple[int, int]:
    if _PIL is not None:  # pragma: no cover — real path, not in container
        raise NotImplementedError("real PIL decode not wired in this sandbox")
    if payload is None or payload[:4] != b"IMG1":
        raise ValueError("not an IMG1 payload")
    w, h = struct.unpack_from(">II", payload, 4)
    return w, h


def image_metadata(assets: DataFrame) -> DataFrame:
    """mapInPandas: (asset_id, payload) → typed image metadata, per-item
    failure isolation (error column, never a failed task)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list[Any]] = {
                "asset_id": [], "width": [], "height": [], "n_bytes": [], "error": []
            }
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                out["asset_id"].append(aid)
                try:
                    w, h = _parse_image(bytes(payload) if payload is not None else None)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["n_bytes"].append(len(payload))
                    out["error"].append(None)
                except Exception as exc:  # noqa: BLE001
                    out["width"].append(None)
                    out["height"].append(None)
                    out["n_bytes"].append(None)
                    out["error"].append(f"{type(exc).__name__}: {exc}")
            yield pd.DataFrame(out)

    return assets.select("asset_id", "payload").mapInPandas(gen, IMAGE_META_SCHEMA)


def resize_images(assets: DataFrame, max_side: int) -> DataFrame:
    """Deterministic 'resize': clamp dimensions preserving aspect (the exact
    two-track-resolution arithmetic the reference uses, detector.py:30-48);
    payload re-encoded through the fake codec.  Real impl swaps _parse_image
    + a PIL resize in one place."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"asset_id": [], "width": [], "height": [], "payload": []}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    w, h = _parse_image(bytes(payload))
                    scale = min(1.0, max_side / max(w, h))
                    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                    rows["payload"].append(encode_image(nw, nh))
                except Exception:  # noqa: BLE001
                    nw = nh = None
                    rows["payload"].append(None)
                rows["asset_id"].append(aid)
                rows["width"].append(nw)
                rows["height"].append(nh)
            yield pd.DataFrame(rows)

    return assets.select("asset_id", "payload").mapInPandas(gen, RESIZE_SCHEMA)


def sample_frames(assets: DataFrame, every: int = 2) -> DataFrame:
    """Video frame sampling: explode every `every`-th frame as its own row —
    the fan-out shape (one asset → many frames) a real pipeline needs; the
    frame decode is the same stub-gated seam."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"asset_id": [], "frame_index": [], "payload": []}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    raw = bytes(payload)
                    if raw[:4] != b"VID1":
                        raise ValueError("not a VID1 payload")
                    (n,) = struct.unpack_from(">I", raw, 4)
                    off = 8
                    for i in range(n):
                        (ln,) = struct.unpack_from(">I", raw, off)
                        off += 4
                        frame = raw[off : off + ln]
                        off += ln
                        if i % every == 0:
                            rows["asset_id"].append(aid)
                            rows["frame_index"].append(i)
                            rows["payload"].append(frame)
                except Exception:  # noqa: BLE001
                    rows["asset_id"].append(aid)
                    rows["frame_index"].append(-1)
                    rows["payload"].append(None)
            yield pd.DataFrame(rows)

    return assets.select("asset_id", "payload").mapInPandas(gen, FRAME_SCHEMA)
