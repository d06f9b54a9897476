"""Multimodal binary-column plumbing: decode metadata, feature
extraction, frame sampling, resize math (codec stubbed per task; Spark
shapes real)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from caterpillar_spark.ops import (
    decode_media,
    encode_fake_media,
    media_features,
    resize_metadata,
    sample_video_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", encode_fake_media(640, 480), None),
        (2, "image", encode_fake_media(100, 2000), None),
        (3, "video", encode_fake_media(320, 240, n_frames=25,
                                       body=bytes(range(256)) * 7), None),
        (4, "image", b"\x00garbage", None),
        (5, "image", None, None),
    ]
    return spark.createDataFrame(
        rows,
        "media_id long, media_type string, payload binary, meta string",
    )


def test_decode_media(media):
    out = {r["media_id"]: r for r in decode_media(media).collect()}
    assert out[1]["decoded"]["width"] == 640
    assert out[1]["decode_error"] is None
    assert out[3]["decoded"]["n_frames"] == 25
    assert out[4]["decoded"] is None and "undecodable" in out[4]["decode_error"]
    assert out[5]["decode_error"] == "null payload"
    # poisoned rows do NOT fail the job — all 5 rows survive
    assert len(out) == 5


def test_media_features_deterministic_fixed_dim(media):
    a = {r["media_id"]: r["features"] for r in media_features(media, dim=16).collect()}
    b = {r["media_id"]: r["features"] for r in media_features(media, dim=16).collect()}
    assert a == b
    assert len(a[1]) == 16
    assert abs(float(np.linalg.norm(a[1])) - 1.0) < 1e-5
    assert a[1] != a[2]
    assert a[5] is None


def test_sample_video_frames(media):
    frames = sample_video_frames(media, every_n=10, frame_bytes=64).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    # 25 frames sampled every 10 -> frames 0, 10, 20
    assert [r["frame_no"] for r in sorted(by_id[3], key=lambda r: r["frame_no"])] == [0, 10, 20]
    assert all(len(r["frame_payload"]) == 64 for r in by_id[3])
    # single-frame images sample exactly one frame row
    assert len(by_id[1]) == 1


def test_resize_metadata(media):
    out = {r["media_id"]: r["resize_to"]
           for r in resize_metadata(decode_media(media), max_side=512).collect()}
    assert out[1].asDict() == {"width": 512, "height": 384}
    assert out[2].asDict() == {"width": 26, "height": 512}
    assert out[4] is None or out[4]["width"] is None
