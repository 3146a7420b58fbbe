"""Multimodal operator plumbing tests (decode layer stubbed with the
deterministic fake formats; schemas/batching/fan-out real)."""

from __future__ import annotations

import numpy as np
import pytest

from data_ingestors_spark.operators.multimodal import (
    audio_features,
    image_features,
    image_metadata,
    video_frame_sample,
)


def _img(w, h, fill=128):
    return b"FAKEIMG:%dx%d:" % (w, h) + bytes([fill]) * (w * h)


def _aud(sr, samples):
    return b"FAKEAUD:%d:" % sr + np.asarray(samples, dtype="<i2").tobytes()


def _vid(w, h, frames):
    return b"FAKEVID:%dx%dx%d:" % (w, h, len(frames)) + b"".join(
        bytes([f]) * (w * h) for f in frames
    )


def test_image_metadata(spark):
    df = spark.createDataFrame(
        [(1, _img(16, 8)), (2, _img(4, 4)), (3, b"\x89PNGnotreally")],
        ["id", "img"],
    )
    out = {r.id: r for r in image_metadata(df, "id", "img").collect()}
    assert (out[1].width, out[1].height) == (16, 8)
    assert (out[2].width, out[2].height) == (4, 4)
    assert out[3].error is not None and out[3].width is None
    assert out[1].sha1 is not None and out[1].n_bytes == len(_img(16, 8))


def test_image_features_resize(spark):
    df = spark.createDataFrame([(1, _img(32, 32, fill=255))], ["id", "img"])
    row = image_features(df, "id", "img", resize_to=4).collect()[0]
    assert len(row.features) == 16
    assert all(abs(v - 1.0) < 1e-9 for v in row.features)
    assert row.mean_intensity == 255.0 and row.std_intensity == 0.0


def test_audio_features(spark):
    df = spark.createDataFrame(
        [(1, _aud(8000, [16384, -16384] * 200)), (2, b"garbage")],
        ["id", "aud"],
    )
    out = {r.id: r for r in audio_features(df, "id", "aud").collect()}
    assert out[1].sample_rate == 8000 and out[1].n_samples == 400
    assert out[1].duration_s == pytest.approx(0.05)
    assert out[1].zcr > 0.4  # alternating signal
    assert out[2].error is not None


def test_video_frame_sample(spark):
    df = spark.createDataFrame([(7, _vid(4, 4, [10, 20, 30, 40, 50]))], ["id", "vid"])
    rows = sorted(video_frame_sample(df, "id", "vid", every_nth=2).collect(),
                  key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in rows] == [0, 2, 4]
    assert [r.mean_intensity for r in rows] == [10.0, 30.0, 50.0]
    assert all(r.width == 4 and r.height == 4 for r in rows)
