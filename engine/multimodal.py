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


# ---------------------------------------------------------------------------
# Driver-checked queries: the multimodal plumbing (metadata extraction,
# resize arithmetic, frame-sample fan-out, per-item failure isolation) is
# value-checked against DuckDB restatements of the deterministic synthesis —
# the UDFs run for real; the oracle re-derives their expected output from
# vec_id arithmetic alone.
# ---------------------------------------------------------------------------

from pyspark.sql import functions as F  # noqa: E402

from engine.relational import _q, load  # noqa: E402

_CORRUPT_EVERY = 97  # vec_id % 97 == 0 → junk payload → error-isolation path


@F.pandas_udf(BinaryType())
def _image_asset_payload(vec_id: pd.Series) -> pd.Series:
    def mk(i: int) -> bytes:
        i = int(i)
        if i % _CORRUPT_EVERY == 0:
            return b"JUNK"
        return encode_image(100 + i % 200, 50 + i % 100, seed=i)

    return vec_id.map(mk)


@F.pandas_udf(BinaryType())
def _video_asset_payload(vec_id: pd.Series) -> pd.Series:
    def mk(i: int) -> bytes:
        i = int(i)
        if i % _CORRUPT_EVERY == 0:
            return b"JUNK"
        return encode_video([encode_image(8, 8, seed=j) for j in range(1 + i % 5)])

    return vec_id.map(mk)


def _image_assets(spark, sf_dir):
    # _spread: the embeddings parquet is one input split at test scale, so
    # without it the payload-synthesis UDF + mapInPandas chain runs on a
    # single task (same fix as the entry.py media corpus builders)
    from engine.entry import _spread

    return _spread(load(spark, sf_dir, "embeddings").select("vec_id")).select(
        F.concat(F.lit("img-"), F.col("vec_id")).alias("asset_id"),
        _image_asset_payload(F.col("vec_id")).alias("payload"),
    )


@_q(
    "x_multimodal_image_meta",
    "multimodal — image metadata extraction over binary assets (mapInPandas, "
    "per-item failure isolation): width/height/n_bytes parsed from the "
    "container header; corrupt payloads yield an error column, never a "
    "failed task (X3)",
    f"""
    SELECT 'img-' || CAST(vec_id AS VARCHAR) AS asset_id,
           CASE WHEN vec_id % {_CORRUPT_EVERY} = 0 THEN NULL
                ELSE CAST(100 + vec_id % 200 AS INTEGER) END AS width,
           CASE WHEN vec_id % {_CORRUPT_EVERY} = 0 THEN NULL
                ELSE CAST(50 + vec_id % 100 AS INTEGER) END AS height,
           CASE WHEN vec_id % {_CORRUPT_EVERY} = 0 THEN NULL
                ELSE 4108 END AS n_bytes,
           CASE WHEN vec_id % {_CORRUPT_EVERY} = 0
                THEN 'ValueError: not an IMG1 payload' END AS error
    FROM embeddings
    """,
)
def x_multimodal_image_meta(spark, sf_dir):
    return image_metadata(_image_assets(spark, sf_dir))


@_q(
    "x_multimodal_resize",
    "multimodal — deterministic resize (clamp to max side 128 preserving "
    "aspect — the same two-track arithmetic as the layout detector); "
    "dimensions value-checked, payload re-encoded through the codec",
    f"""
    WITH src AS (
      SELECT vec_id,
             CAST(100 + vec_id % 200 AS DOUBLE) AS w,
             CAST(50 + vec_id % 100 AS DOUBLE) AS h
      FROM embeddings
    )
    SELECT 'img-' || CAST(vec_id AS VARCHAR) AS asset_id,
           CASE WHEN vec_id % {_CORRUPT_EVERY} = 0 THEN NULL
                ELSE greatest(1, CAST(floor(w * least(1.0, 128.0 / greatest(w, h))) AS INTEGER))
           END AS width,
           CASE WHEN vec_id % {_CORRUPT_EVERY} = 0 THEN NULL
                ELSE greatest(1, CAST(floor(h * least(1.0, 128.0 / greatest(w, h))) AS INTEGER))
           END AS height
    FROM src
    """,
)
def x_multimodal_resize(spark, sf_dir):
    return resize_images(_image_assets(spark, sf_dir), max_side=128).select(
        "asset_id", "width", "height"
    )


@_q(
    "x_multimodal_frames",
    "multimodal — video frame sampling fan-out (one asset → every 2nd frame "
    "as its own row); corrupt containers isolate to a frame_index = -1 row",
    f"""
    SELECT 'vid-' || CAST(vec_id AS VARCHAR) AS asset_id,
           CAST(u.i AS INTEGER) AS frame_index
    FROM embeddings, UNNEST(generate_series(0, vec_id % 5, 2)) AS u(i)
    WHERE vec_id % {_CORRUPT_EVERY} <> 0
    UNION ALL
    SELECT 'vid-' || CAST(vec_id AS VARCHAR), -1
    FROM embeddings WHERE vec_id % {_CORRUPT_EVERY} = 0
    """,
)
def x_multimodal_frames(spark, sf_dir):
    from engine.entry import _spread

    assets = _spread(load(spark, sf_dir, "embeddings").select("vec_id")).select(
        F.concat(F.lit("vid-"), F.col("vec_id")).alias("asset_id"),
        _video_asset_payload(F.col("vec_id")).alias("payload"),
    )
    return sample_frames(assets, every=2).select("asset_id", "frame_index")
