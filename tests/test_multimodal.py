"""Multimodal operator tests: schemas, batch shapes, fan-out, failure isolation."""

from __future__ import annotations

from engine import multimodal as mm


def _assets(spark, rows):
    return spark.createDataFrame(rows, "asset_id: string, payload: binary")


def test_image_metadata_and_errors(spark):
    df = _assets(
        spark,
        [
            ("a1", mm.encode_image(1920, 1080)),
            ("a2", mm.encode_image(300, 500)),
            ("bad", b"NOTANIMAGE"),
        ],
    )
    got = {r["asset_id"]: r for r in mm.image_metadata(df).collect()}
    assert (got["a1"]["width"], got["a1"]["height"]) == (1920, 1080)
    assert got["a2"]["n_bytes"] == len(mm.encode_image(300, 500))
    assert got["bad"]["error"] is not None and got["bad"]["width"] is None


def test_resize_two_track_resolution(spark):
    # the reference clamps max side to 1000 keeping aspect (detector.py:30-48)
    df = _assets(spark, [("a1", mm.encode_image(2000, 1000))])
    [r] = mm.resize_images(df, max_side=1000).collect()
    assert (r["width"], r["height"]) == (1000, 500)
    assert bytes(r["payload"])[:4] == b"IMG1"


def test_frame_sampling_fanout(spark):
    frames = [mm.encode_image(8, 8, seed=i) for i in range(6)]
    df = _assets(spark, [("v1", mm.encode_video(frames))])
    rows = mm.sample_frames(df, every=2).collect()
    assert [r["frame_index"] for r in rows] == [0, 2, 4]
    assert bytes(rows[1]["payload"]) == frames[2]
