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


def test_real_wav_pcm_decode(spark):
    """WAV/PCM decodes for REAL (stdlib wave + numpy): a synthesized
    16-bit stereo sine must yield correct sample rate, duration, and
    nonzero energy through the distributed audio_features path."""
    import io
    import math
    import wave

    import numpy as np

    from data_ingestors_spark.operators.multimodal import _decode_audio, audio_features

    sr, seconds, freq = 8000, 0.25, 440.0
    n = int(sr * seconds)
    mono = np.array(
        [int(20000 * math.sin(2 * math.pi * freq * i / sr)) for i in range(n)],
        dtype="<i2",
    )
    stereo = np.column_stack([mono, mono]).ravel()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(stereo.tobytes())
    wav_bytes = buf.getvalue()

    got_sr, x = _decode_audio(wav_bytes)
    assert got_sr == sr and len(x) == n
    assert abs(float(np.sqrt((x**2).mean())) - 20000 / 32768 / math.sqrt(2)) < 0.01

    df = spark.createDataFrame([(1, bytearray(wav_bytes))], "id long, aud binary")
    row = audio_features(df, "id", "aud").collect()[0]
    assert row.sample_rate == sr
    assert abs(row.duration_s - seconds) < 1e-6
    assert row.rms > 0.3 and row.error is None


def test_real_bmp_decode(spark):
    """Uncompressed 24-bit BMP decodes for REAL (pure numpy): a 2x2
    bottom-up image must come back with correct dims and pixel values
    through image_metadata."""
    import numpy as np

    from data_ingestors_spark.operators.multimodal import _decode_bmp, image_metadata

    w, h = 2, 2
    row_len = ((w * 3 + 3) // 4) * 4
    header = (
        b"BM" + (54 + row_len * h).to_bytes(4, "little") + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little") + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True) + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little") + (0).to_bytes(4, "little")
        + b"\x00" * 20
    )
    # bottom-up rows: file row 0 is the BOTTOM image row
    bottom = bytes([0, 0, 0, 255, 255, 255]) + b"\x00\x00"   # black, white
    top = bytes([10, 10, 10, 200, 200, 200]) + b"\x00\x00"   # dark, light
    bmp = header + bottom + top

    gw, gh, arr = _decode_bmp(bmp)
    assert (gw, gh) == (2, 2)
    assert arr[0].tolist() == [10, 200]    # top row after flip
    assert arr[1].tolist() == [0, 255]

    df = spark.createDataFrame([(1, bytearray(bmp))], "id long, img binary")
    row = image_metadata(df, "id", "img").collect()[0]
    assert (row.width, row.height, row.error) == (2, 2, None)


def test_decode_error_summary_loud_partial(spark):
    """A corpus mixing decodable (FAKEIMG/BMP) and codec-less payloads
    must show the split in one summary frame — the PIL-less JPEG run
    is loudly partial, never silently skewed."""
    from data_ingestors_spark.operators.multimodal import (
        decode_error_summary,
        image_features,
    )

    rows = [
        (1, bytearray(b"FAKEIMG:4x4:" + bytes(range(16)))),
        (2, bytearray(b"FAKEIMG:4x4:" + bytes(range(16)))),
        (3, bytearray(b"\xff\xd8\xff\xe0 not decodable without a codec")),
    ]
    df = spark.createDataFrame(rows, "id long, content binary")
    feats = image_features(df, "id", "content")
    summary = {r.outcome: r.n_rows for r in decode_error_summary(feats).collect()}
    assert summary.get("ok") == 2
    bad = {k: v for k, v in summary.items() if k != "ok"}
    # without PIL this is the codec-stub NotImplementedError; with PIL
    # installed the payload is junk and fails its decoder instead —
    # either way the non-ok outcome is visible, which is the contract
    assert sum(bad.values()) == 1
