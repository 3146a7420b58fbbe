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


def test_audio_spectral_features(spark):
    """A pure 1 kHz sine must put both the dominant frequency and the
    spectral centroid at ~1 kHz (1 Hz bin resolution at 1 s / 8 kHz)."""
    import io
    import math
    import wave

    import numpy as np

    from data_ingestors_spark.operators.multimodal import audio_features

    sr, freq = 8000, 1000
    x = (20000 * np.sin(2 * math.pi * freq * np.arange(sr) / sr)).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(x.tobytes())
    df = spark.createDataFrame([(1, bytearray(buf.getvalue()))], "id long, aud binary")
    row = audio_features(df, "id", "aud").collect()[0]
    assert row.error is None
    assert abs(row.dominant_freq - freq) <= 1.0
    assert abs(row.spectral_centroid - freq) <= 25.0  # leakage skews slightly


def test_video_motion_column(spark):
    """Frame-to-frame motion: first sampled frame None, then the mean
    absolute difference vs the previous sampled frame."""
    from data_ingestors_spark.operators.multimodal import video_frame_sample

    w = h = 2
    frames = bytes([0] * 4) + bytes([10] * 4) + bytes([10] * 4)
    vid = b"FAKEVID:%dx%dx3:" % (w, h) + frames
    df = spark.createDataFrame([(1, bytearray(vid))], "id long, vid binary")
    rows = sorted(
        video_frame_sample(df, "id", "vid", every_nth=1).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [r.motion for r in rows] == [None, 10.0, 0.0]


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


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)


_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _encode_png(arr, color_type, filters, palette=None, interlace=False, depth=8):
    """Reference PNG encoder for the decoder tests: 8- or 16-bit,
    sequential or Adam7-interlaced, one chosen filter type per row
    (forward transform of RFC 2083 §6), so every unfilter branch and
    both storage layouts are exercised. 16-bit samples are value<<8
    so the decoder's high-byte scale-down returns the original."""
    import struct
    import zlib

    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        h, w = a.shape
        ch = 1
    else:
        h, w, ch = a.shape
    bps = depth // 8
    bppb = max(1, ch * bps)  # spec: filters reference whole bytes

    def filter_pass(sub):
        s = sub.reshape(sub.shape[0], -1).astype(int)  # (ph, pw*ch)
        if depth < 8:  # pack sub-byte samples MSB-first, pad rows
            bits = ((s[:, :, None] >> np.arange(depth - 1, -1, -1)) & 1).reshape(
                s.shape[0], -1
            )
            pad = (-bits.shape[1]) % 8
            if pad:
                bits = np.concatenate(
                    [bits, np.zeros((s.shape[0], pad), dtype=int)], axis=1
                )
            s = np.packbits(bits.astype(np.uint8), axis=1).astype(int)
        elif bps == 2:
            wide = np.zeros((s.shape[0], s.shape[1] * 2), dtype=int)
            wide[:, 0::2] = s  # big-endian high byte carries the value
            s = wide
        raw = bytearray()
        prev = np.zeros(s.shape[1], dtype=int)
        for y in range(s.shape[0]):
            ft = filters[y % len(filters)]
            line = s[y]
            out = np.empty_like(line)
            for i in range(len(line)):
                left = line[i - bppb] if i >= bppb else 0
                up = prev[i]
                upleft = prev[i - bppb] if i >= bppb else 0
                if ft == 0:
                    out[i] = line[i]
                elif ft == 1:
                    out[i] = line[i] - left
                elif ft == 2:
                    out[i] = line[i] - up
                elif ft == 3:
                    out[i] = line[i] - (left + up) // 2
                else:
                    out[i] = line[i] - _paeth(left, up, upleft)
            raw.append(ft)
            raw.extend((out % 256).astype(np.uint8).tobytes())
            prev = line
        return raw

    raw = bytearray()
    if interlace:
        for xs, ys, xst, yst in _ADAM7:
            sub = a[ys::yst, xs::xst]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            raw += filter_pass(sub)
    else:
        raw = filter_pass(a)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 1 if interlace else 0)
    png = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        png += chunk(b"PLTE", bytes(palette))
    png += chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    return png


def test_real_png_decode_all_filters(spark):
    """8-bit non-interlaced PNG decodes for REAL (stdlib zlib + numpy)
    across every scanline filter type; grayscale must round-trip
    exactly and RGB reduce by channel mean like BMP."""
    import numpy as np

    from data_ingestors_spark.operators.multimodal import (
        _HAVE_PIL,
        _decode_png,
        image_metadata,
    )

    rng = np.random.RandomState(3)
    gray = rng.randint(0, 256, size=(7, 5), dtype=np.uint8)
    png = _encode_png(gray, 0, filters=[0, 1, 2, 3, 4])
    gw, gh, arr = _decode_png(png)
    assert (gw, gh) == (5, 7)
    assert np.array_equal(arr, gray)

    rgb = rng.randint(0, 256, size=(6, 4, 3), dtype=np.uint8)
    png = _encode_png(rgb, 2, filters=[4])  # all-Paeth
    gw, gh, arr = _decode_png(png)
    assert (gw, gh) == (4, 6)
    assert np.array_equal(arr, rgb.mean(axis=2).astype(np.uint8))

    rgba = rng.randint(0, 256, size=(3, 3, 4), dtype=np.uint8)
    png = _encode_png(rgba, 6, filters=[1, 3])
    _, _, arr = _decode_png(png)
    assert np.array_equal(arr, rgba[:, :, :3].mean(axis=2).astype(np.uint8))

    # palette: indices resolve through PLTE then gray by mean
    pal = [0, 0, 0, 255, 0, 0, 0, 255, 0, 255, 255, 255]
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    png = _encode_png(idx, 3, filters=[0], palette=pal)
    _, _, arr = _decode_png(png)
    assert arr.tolist() == [[0, 85], [85, 255]]

    # the Spark path accepts the real PNG end-to-end
    df = spark.createDataFrame(
        [(1, bytearray(_encode_png(gray, 0, filters=[2])))], "id long, img binary"
    )
    row = image_metadata(df, "id", "img").collect()[0]
    assert (row.width, row.height, row.error) == (5, 7, None)


def test_png_interlaced_and_16bit_roundtrip():
    """Adam7 interlaced and 16-bit PNGs decode losslessly (16-bit
    scaled by the high byte); interlaced 16-bit RGB combines both."""
    import numpy as np

    from data_ingestors_spark.operators.multimodal import _decode_png

    rng = np.random.RandomState(21)
    for hh, ww in ((1, 1), (3, 9), (13, 11), (16, 16)):
        img = rng.randint(0, 256, size=(hh, ww), dtype=np.uint8)
        _, _, arr = _decode_png(_encode_png(img, 0, filters=[0, 1, 2, 3, 4], interlace=True))
        assert np.array_equal(arr, img), (hh, ww)

    img = rng.randint(0, 256, size=(7, 6), dtype=np.uint8)
    _, _, arr = _decode_png(_encode_png(img, 0, filters=[4, 2], depth=16))
    assert np.array_equal(arr, img)

    # sub-byte grays: 2-bit values scale to the full 0..255 range
    g2 = rng.randint(0, 4, size=(5, 9), dtype=np.uint8)
    _, _, arr = _decode_png(_encode_png(g2, 0, filters=[0, 1, 2], depth=2))
    assert np.array_equal(arr, (g2.astype(np.float64) * 85).astype(np.uint8))
    g1 = rng.randint(0, 2, size=(4, 11), dtype=np.uint8)
    _, _, arr = _decode_png(_encode_png(g1, 0, filters=[2], depth=1, interlace=True))
    assert np.array_equal(arr, g1 * 255)

    # 4-bit palette
    pal = [int(x) for x in rng.randint(0, 256, size=3 * 16)]
    p4 = rng.randint(0, 16, size=(6, 7), dtype=np.uint8)
    _, _, arr = _decode_png(_encode_png(p4, 3, filters=[0, 4], depth=4, palette=pal))
    pal_np = np.array(pal, dtype=np.uint8).reshape(-1, 3)
    assert np.array_equal(arr, pal_np[p4].mean(axis=2).astype(np.uint8))

    rgb = rng.randint(0, 256, size=(9, 5, 3), dtype=np.uint8)
    _, _, arr = _decode_png(
        _encode_png(rgb, 2, filters=[1, 3, 0], depth=16, interlace=True)
    )
    assert np.array_equal(arr, rgb.mean(axis=2).astype(np.uint8))


def test_png_unsupported_stays_fail_loud():
    """Combinations outside the spec-supported set (sub-byte color,
    16-bit palette, invalid depth) stay behind the documented
    NotImplementedError boundary."""
    import struct
    import zlib

    import pytest as _pytest

    from data_ingestors_spark.operators.multimodal import _decode_png

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    for depth, ct in ((4, 2), (2, 6), (16, 3), (3, 0)):
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, ct, 0, 0, 0)
        png = (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 10)) + chunk(b"IEND", b"")
        )
        with _pytest.raises(NotImplementedError):
            _decode_png(png)


def _gif_lzw_encode(indices, mcs):
    """Reference GIF-LZW compressor (real dictionary growth, the
    late width-bump rule `next_code == 2^width + 1` that keeps the
    encoder in sync with the decoder's post-add bump)."""
    clear = 1 << mcs
    end = clear + 1
    emitted = []  # (code, width)
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = mcs + 1
    emitted.append((clear, width))
    s = b""
    for px in indices:
        c = s + bytes([px])
        if c in table:
            s = c
            continue
        emitted.append((table[s], width))
        if next_code < 4096:
            table[c] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        s = bytes([px])
    if s:
        emitted.append((table[s], width))
    emitted.append((end, width))
    acc = nbits = 0
    out = bytearray()
    for code, w in emitted:
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _encode_gif(idx, palette, mcs, interlace=False):
    import numpy as np

    a = np.asarray(idx, dtype=np.uint8)
    h, w = a.shape
    if interlace:
        order = [y for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
                 for y in range(start, h, step)]
        a = a[order]
    stream = _gif_lzw_encode(a.reshape(-1).tolist(), mcs)
    n = len(palette) // 3
    gct_bits = max(1, (n - 1).bit_length()) - 1
    head = (
        b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + bytes([0x80 | gct_bits, 0, 0]) + bytes(palette)
        + bytes(3 * ((1 << (gct_bits + 1)) - n))  # pad table to 2^(b+1)
    )
    desc = (
        b"\x2c" + b"\x00\x00\x00\x00" + w.to_bytes(2, "little")
        + h.to_bytes(2, "little") + bytes([0x40 if interlace else 0])
    )
    body = bytes([mcs])
    for i in range(0, len(stream), 255):
        part = stream[i : i + 255]
        body += bytes([len(part)]) + part
    return head + desc + body + b"\x00" + b"\x3b"


def test_real_gif_decode(spark):
    """First-frame GIF decodes for REAL (pure-python LZW + numpy):
    plain and interlaced frames round-trip through a reference LZW
    compressor with true dictionary growth; grayscale is the palette
    channel mean; sub-frames stay fail-loud."""
    import numpy as np
    import pytest as _pytest

    from data_ingestors_spark.operators.multimodal import _decode_gif, image_metadata

    pal = [0, 0, 0, 255, 0, 0, 0, 255, 0, 255, 255, 255]
    idx = np.array([[0, 1, 2, 3]] * 3, dtype=np.uint8)
    gif = _encode_gif(idx, pal, mcs=2)
    w, h, arr = _decode_gif(gif)
    assert (w, h) == (4, 3)
    assert arr.tolist() == [[0, 85, 85, 255]] * 3

    # dictionary growth across width bumps: 16x16 random 4-color
    rng = np.random.RandomState(11)
    big = rng.randint(0, 4, size=(16, 16), dtype=np.uint8)
    _, _, arr = _decode_gif(_encode_gif(big, pal, mcs=2))
    pal_np = np.array(pal, dtype=np.uint8).reshape(-1, 3)
    assert np.array_equal(arr, pal_np[big].mean(axis=2).astype(np.uint8))

    # interlaced storage must deinterlace back to the original
    inter = rng.randint(0, 4, size=(13, 5), dtype=np.uint8)
    _, _, arr = _decode_gif(_encode_gif(inter, pal, mcs=2, interlace=True))
    assert np.array_equal(arr, pal_np[inter].mean(axis=2).astype(np.uint8))

    # Spark path end-to-end
    df = spark.createDataFrame([(1, bytearray(gif))], "id long, img binary")
    row = image_metadata(df, "id", "img").collect()[0]
    assert (row.width, row.height, row.error) == (4, 3, None)

    # first-frame sub-frame composites onto a background-color canvas
    sub = bytearray(_encode_gif(idx, pal, mcs=2))
    sub[6:8] = (8).to_bytes(2, "little")  # screen wider than the frame
    w2, h2, arr2 = _decode_gif(bytes(sub))
    assert (w2, h2) == (8, 3)
    assert arr2[:, :4].tolist() == [[0, 85, 85, 255]] * 3   # the frame
    assert arr2[:, 4:].tolist() == [[0, 0, 0, 0]] * 3       # bg index 0 -> black


# --- reference baseline-JPEG encoder for the decoder tests ------------

_JPEG_DC_COUNTS = bytes([0, 0, 0, 12] + [0] * 12)         # 12 syms @ len 4
_JPEG_DC_SYMBOLS = bytes(range(12))
_JPEG_AC_SYMBOLS = bytes(
    [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_JPEG_AC_COUNTS = bytes([0] * 7 + [len(_JPEG_AC_SYMBOLS)] + [0] * 8)  # @ len 8


class _JpegWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, width):
        for i in range(width - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def align(self):
        while self.n:
            self.put(1, 1)


def _jpeg_canonical(counts, symbols):
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return codes


def _encode_jpeg_420(gray, chroma):
    """4:2:0 variant: Y at 2x2 sampling (4 blocks per MCU), chroma
    decimated 2x and one block each per MCU — the common real-world
    JPEG layout, exercising the decoder's multi-block-per-component
    path and Y-plane MCU placement."""
    import struct

    import numpy as np

    from data_ingestors_spark.operators.multimodal import (
        JPEG_ZIGZAG,
        _jpeg_idct_matrix,
    )

    A = _jpeg_idct_matrix()
    dc = _jpeg_canonical(_JPEG_DC_COUNTS, _JPEG_DC_SYMBOLS)
    ac = _jpeg_canonical(_JPEG_AC_COUNTS, _JPEG_AC_SYMBOLS)
    h, w = gray.shape
    H, W = -(-h // 16) * 16, -(-w // 16) * 16
    y_p = np.pad(gray.astype(np.float64) - 128, ((0, H - h), (0, W - w)), mode="edge")
    c_small = chroma[::2, ::2]
    ch, cw = c_small.shape
    c_p = np.pad(
        c_small.astype(np.float64) - 128,
        ((0, H // 2 - ch), (0, W // 2 - cw)),
        mode="edge",
    )

    def cat(v):
        return 0 if v == 0 else int(abs(v)).bit_length()

    def valbits(v, s):
        return v if v >= 0 else v + (1 << s) - 1

    wr = _JpegWriter()
    preds = [0, 0, 0]

    def put_block(plane, r0, c0, ci):
        block = plane[r0 : r0 + 8, c0 : c0 + 8]
        F = np.rint(A @ block @ A.T).astype(int)
        zz = [F[r, c] for (r, c) in JPEG_ZIGZAG]
        diff = zz[0] - preds[ci]
        preds[ci] = zz[0]
        s = cat(diff)
        code, width = dc[s]
        wr.put(code, width)
        if s:
            wr.put(valbits(diff, s), s)
        run = 0
        for v in zz[1:]:
            if v == 0:
                run += 1
                continue
            while run >= 16:
                code, width = ac[0xF0]
                wr.put(code, width)
                run -= 16
            s = cat(v)
            code, width = ac[(run << 4) | s]
            wr.put(code, width)
            wr.put(valbits(v, s), s)
            run = 0
        if run:
            code, width = ac[0x00]
            wr.put(code, width)

    for my in range(H // 16):
        for mx in range(W // 16):
            for by in range(2):
                for bx in range(2):
                    put_block(y_p, my * 16 + by * 8, mx * 16 + bx * 8, 0)
            put_block(c_p, my * 8, mx * 8, 1)
            put_block(c_p, my * 8, mx * 8, 2)
    wr.align()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    qtab = bytes([0]) + bytes([1] * 64)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    sof += bytes([1, 0x22, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
    dht = (
        bytes([0x00]) + _JPEG_DC_COUNTS + _JPEG_DC_SYMBOLS
        + bytes([0x10]) + _JPEG_AC_COUNTS + _JPEG_AC_SYMBOLS
    )
    sos = bytes([3]) + b"".join(bytes([ci + 1, 0x00]) for ci in range(3)) + bytes([0, 63, 0])
    return (
        b"\xff\xd8" + seg(0xDB, qtab) + seg(0xC0, sof) + seg(0xC4, dht)
        + seg(0xDA, sos) + bytes(wr.out) + b"\xff\xd9"
    )


def _encode_jpeg(gray, *, restart=0, chroma=None, prec=8, qval=1):
    """Reference sequential JPEG encoder: flat quant table (all
    ``qval``; 16-bit DQT when qval > 255), single-length Huffman
    tables, 1 component (or 3 at 4:4:4 when ``chroma`` is given),
    optional restart interval. ``prec`` 12 emits SOF1 (extended
    sequential) with the 2^11 level shift."""
    import struct

    import numpy as np

    from data_ingestors_spark.operators.multimodal import (
        JPEG_ZIGZAG,
        _jpeg_idct_matrix,
    )

    A = _jpeg_idct_matrix()
    dc = _jpeg_canonical(_JPEG_DC_COUNTS, _JPEG_DC_SYMBOLS)
    ac = _jpeg_canonical(_JPEG_AC_COUNTS, _JPEG_AC_SYMBOLS)
    h, w = gray.shape
    H, W = -(-h // 8) * 8, -(-w // 8) * 8
    shift = float(1 << (prec - 1))
    planes = [gray] if chroma is None else [gray, chroma, chroma]
    padded = [
        np.pad(p.astype(np.float64) - shift, ((0, H - h), (0, W - w)), mode="edge")
        for p in planes
    ]

    def cat(v):
        return 0 if v == 0 else int(abs(v)).bit_length()

    def valbits(v, s):
        return v if v >= 0 else v + (1 << s) - 1

    wr = _JpegWriter()
    preds = [0] * len(planes)
    mcus = [(y, x) for y in range(H // 8) for x in range(W // 8)]
    rst = 0
    for k, (my, mx) in enumerate(mcus):
        if restart and k and k % restart == 0:
            wr.align()
            wr.out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            preds = [0] * len(planes)
        for ci, plane in enumerate(padded):
            block = plane[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
            F = np.rint(np.rint(A @ block @ A.T) / qval).astype(int)
            zz = [F[r, c] for (r, c) in JPEG_ZIGZAG]
            diff = zz[0] - preds[ci]
            preds[ci] = zz[0]
            s = cat(diff)
            code, width = dc[s]
            wr.put(code, width)
            if s:
                wr.put(valbits(diff, s), s)
            run = 0
            for v in zz[1:]:
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    code, width = ac[0xF0]
                    wr.put(code, width)
                    run -= 16
                s = cat(v)
                code, width = ac[(run << 4) | s]
                wr.put(code, width)
                wr.put(valbits(v, s), s)
                run = 0
            if run:
                code, width = ac[0x00]
                wr.put(code, width)
    wr.align()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    if qval > 255:
        qtab = bytes([0x10]) + b"".join(
            int(qval).to_bytes(2, "big") for _ in range(64)
        )
    else:
        qtab = bytes([0]) + bytes([qval] * 64)
    nc = len(planes)
    sof = bytes([prec]) + struct.pack(">HH", h, w) + bytes([nc])
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])
    dht = (
        bytes([0x00]) + _JPEG_DC_COUNTS + _JPEG_DC_SYMBOLS
        + bytes([0x10]) + _JPEG_AC_COUNTS + _JPEG_AC_SYMBOLS
    )
    sos = bytes([nc]) + b"".join(bytes([ci + 1, 0x00]) for ci in range(nc)) + bytes([0, 63, 0])
    sof_marker = 0xC0 if prec == 8 else 0xC1
    out = b"\xff\xd8" + seg(0xDB, qtab) + seg(sof_marker, sof) + seg(0xC4, dht)
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    out += seg(0xDA, sos) + bytes(wr.out) + b"\xff\xd9"
    return out


def _jpeg_blocks(plane, A, zigzag):
    """Quantized (quant=1) zigzag coefficient blocks, raster order."""
    import numpy as np

    h, w = plane.shape
    H, W = -(-h // 8) * 8, -(-w // 8) * 8
    p = np.pad(plane.astype(np.float64) - 128, ((0, H - h), (0, W - w)), mode="edge")
    out = []
    for my in range(H // 8):
        for mx in range(W // 8):
            F = np.rint(A @ p[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] @ A.T).astype(int)
            out.append([int(F[r, c]) for (r, c) in zigzag])
    return out, W // 8, H // 8


def _encode_jpeg_progressive(gray, chroma=None):
    """Reference PROGRESSIVE (SOF2) encoder: DC first at Al=1
    (interleaved when 3 components), DC refinement, per-component AC
    spectral-selection scans at Al=1 split into two bands, and a final
    AC successive-approximation refinement scan (the jcphuff buffered-
    correction-bit algorithm) — exercising every progressive decode
    path."""
    import struct

    import numpy as np

    from data_ingestors_spark.operators.multimodal import (
        JPEG_ZIGZAG,
        _jpeg_idct_matrix,
    )

    A = _jpeg_idct_matrix()
    dc = _jpeg_canonical(_JPEG_DC_COUNTS, _JPEG_DC_SYMBOLS)
    ac = _jpeg_canonical(_JPEG_AC_COUNTS, _JPEG_AC_SYMBOLS)
    h, w = gray.shape
    planes = [gray] if chroma is None else [gray, chroma, chroma]
    comp_blocks = [_jpeg_blocks(p, A, JPEG_ZIGZAG)[0] for p in planes]
    nc = len(planes)

    def cat(v):
        return 0 if v == 0 else int(abs(v)).bit_length()

    def valbits(v, s):
        return v if v >= 0 else v + (1 << s) - 1

    def sos_header(comps_spec, ss, se, ah, al):
        payload = bytes([len(comps_spec)])
        for cid in comps_spec:
            payload += bytes([cid, 0x00])
        payload += bytes([ss, se, (ah << 4) | al])
        return (
            bytes([0xFF, 0xDA])
            + struct.pack(">H", len(payload) + 2)
            + payload
        )

    scans = b""

    # scan 1: DC first, Al=1, all components (interleaved when nc>1)
    wr = _JpegWriter()
    preds = [0] * nc
    for bi in range(len(comp_blocks[0])):
        for ci in range(nc):
            v = comp_blocks[ci][bi][0] >> 1  # arithmetic shift (floor)
            diff = v - preds[ci]
            preds[ci] = v
            s = cat(diff)
            code, width = dc[s]
            wr.put(code, width)
            if s:
                wr.put(valbits(diff, s), s)
    wr.align()
    scans += sos_header(list(range(1, nc + 1)), 0, 0, 0, 1) + bytes(wr.out)

    # scan 2: DC refinement (Ah=1, Al=0), same component order
    wr = _JpegWriter()
    for bi in range(len(comp_blocks[0])):
        for ci in range(nc):
            wr.put(comp_blocks[ci][bi][0] & 1, 1)
    wr.align()
    scans += sos_header(list(range(1, nc + 1)), 0, 0, 1, 0) + bytes(wr.out)

    # per-component AC scans
    for ci in range(nc):
        for ss, se in ((1, 5), (6, 63)):
            wr = _JpegWriter()
            for blk in comp_blocks[ci]:
                r = 0
                for k in range(ss, se + 1):
                    c = blk[k]
                    t = (abs(c) >> 1) * (1 if c >= 0 else -1)
                    if t == 0:
                        r += 1
                        continue
                    while r >= 16:
                        code, width = ac[0xF0]
                        wr.put(code, width)
                        r -= 16
                    s = cat(t)
                    code, width = ac[(r << 4) | s]
                    wr.put(code, width)
                    wr.put(valbits(t, s), s)
                    r = 0
                if r > 0:
                    code, width = ac[0x00]  # EOB, run length 1
                    wr.put(code, width)
            wr.align()
            scans += sos_header([ci + 1], ss, se, 0, 1) + bytes(wr.out)

        # AC refinement scan Ss=1..63 (Ah=1, Al=0) — jcphuff algorithm
        wr = _JpegWriter()
        for blk in comp_blocks[ci]:
            band = list(range(1, 64))
            absv = [abs(blk[k]) for k in band]
            eob = -1
            for i, k in enumerate(band):
                if absv[i] == 1:
                    eob = i
            r = 0
            BR = []
            for i, k in enumerate(band):
                temp = absv[i]
                if temp == 0:
                    r += 1
                    continue
                while r > 15 and i <= eob:
                    code, width = ac[0xF0]
                    wr.put(code, width)
                    for b in BR:
                        wr.put(b, 1)
                    BR = []
                    r -= 16
                if temp > 1:
                    BR.append(temp & 1)
                    continue
                code, width = ac[(r << 4) | 1]
                wr.put(code, width)
                wr.put(1 if blk[k] > 0 else 0, 1)
                for b in BR:
                    wr.put(b, 1)
                BR = []
                r = 0
            if r > 0 or BR:
                code, width = ac[0x00]
                wr.put(code, width)
                for b in BR:
                    wr.put(b, 1)
        wr.align()
        scans += sos_header([ci + 1], 1, 63, 1, 0) + bytes(wr.out)

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    qtab = bytes([0]) + bytes([1] * 64)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])
    dht = (
        bytes([0x00]) + _JPEG_DC_COUNTS + _JPEG_DC_SYMBOLS
        + bytes([0x10]) + _JPEG_AC_COUNTS + _JPEG_AC_SYMBOLS
    )
    return (
        b"\xff\xd8" + seg(0xDB, qtab) + seg(0xC2, sof) + seg(0xC4, dht)
        + scans + b"\xff\xd9"
    )


def test_real_jpeg_decode(spark):
    """Baseline JPEG decodes for REAL (pure-python Huffman + numpy
    IDCT): with a flat quant table the only loss is coefficient
    rounding, analytically bounded below 3 gray levels. Covers
    grayscale, 4:4:4 color (luma extracted, chroma consumed and
    discarded), restart markers, and the progressive fail-loud path."""
    import numpy as np
    import pytest as _pytest

    from data_ingestors_spark.operators.multimodal import _decode_jpeg, image_metadata

    rng = np.random.RandomState(5)
    # smooth-ish image: random low-frequency mix, exercises many ACs
    yy, xx = np.mgrid[0:17, 0:24]
    gray = (
        128 + 60 * np.sin(xx / 3.0) * np.cos(yy / 2.0) + rng.randint(-20, 20, (17, 24))
    ).clip(0, 255).astype(np.uint8)

    w, h, arr = _decode_jpeg(_encode_jpeg(gray))
    assert (w, h) == (24, 17)
    assert arr.shape == (17, 24)
    assert np.abs(arr.astype(int) - gray.astype(int)).max() <= 3

    # restart markers: same pixels, segmented entropy stream
    _, _, arr_rst = _decode_jpeg(_encode_jpeg(gray, restart=2))
    assert np.array_equal(arr_rst, arr)

    # 4:4:4 color: returned grayscale is the LUMA, not the chroma
    chroma = rng.randint(0, 256, size=gray.shape).astype(np.uint8)
    _, _, arr_color = _decode_jpeg(_encode_jpeg(gray, chroma=chroma))
    assert np.abs(arr_color.astype(int) - gray.astype(int)).max() <= 3

    # 4:2:0 — the common camera layout: 4 Y blocks + 2 chroma per MCU
    _, _, arr_420 = _decode_jpeg(_encode_jpeg_420(gray, chroma))
    assert arr_420.shape == (17, 24)
    assert np.abs(arr_420.astype(int) - gray.astype(int)).max() <= 3

    # Spark path end-to-end
    df = spark.createDataFrame(
        [(1, bytearray(_encode_jpeg(gray)))], "id long, img binary"
    )
    row = image_metadata(df, "id", "img").collect()[0]
    assert (row.width, row.height, row.error) == (24, 17, None)

    # SOF3 decodes for real now — a baseline stream RELABELED lossless
    # is structurally invalid (its scan header's ss=0 is not a legal
    # predictor) and must still fail loud, not mis-decode
    lossless = bytearray(_encode_jpeg(gray))
    i = lossless.index(b"\xff\xc0")
    lossless[i + 1] = 0xC3
    with _pytest.raises(ValueError):
        _decode_jpeg(bytes(lossless))


def test_progressive_jpeg_decodes_identical_to_baseline(spark):
    """PROGRESSIVE JPEG (SOF2): DC-first + DC-refinement + split-band
    AC spectral selection + AC successive-approximation refinement
    must reconstruct EXACTLY the coefficients the baseline encoding of
    the same image carries — decoded pixels bit-identical, gray and
    3-component (interleaved DC scan) alike."""
    import numpy as np

    from data_ingestors_spark.operators.multimodal import _decode_jpeg, image_metadata

    rng = np.random.RandomState(5)
    yy, xx = np.mgrid[0:17, 0:24]
    gray = (
        128 + 60 * np.sin(xx / 3.0) * np.cos(yy / 2.0) + rng.randint(-20, 20, (17, 24))
    ).clip(0, 255).astype(np.uint8)
    chroma = rng.randint(0, 256, size=gray.shape).astype(np.uint8)

    base = _decode_jpeg(_encode_jpeg(gray))[2]
    prog = _decode_jpeg(_encode_jpeg_progressive(gray))[2]
    assert np.array_equal(prog, base)

    base3 = _decode_jpeg(_encode_jpeg(gray, chroma=chroma))[2]
    prog3 = _decode_jpeg(_encode_jpeg_progressive(gray, chroma=chroma))[2]
    assert np.array_equal(prog3, base3)

    big = rng.randint(0, 256, size=(40, 56)).astype(np.uint8)
    assert np.array_equal(
        _decode_jpeg(_encode_jpeg_progressive(big))[2],
        _decode_jpeg(_encode_jpeg(big))[2],
    )

    # Spark path accepts progressive payloads end-to-end
    df = spark.createDataFrame(
        [(1, bytearray(_encode_jpeg_progressive(gray)))], "id long, img binary"
    )
    row = image_metadata(df, "id", "img").collect()[0]
    assert (row.width, row.height, row.error) == (24, 17, None)


_JPEG_LL_DC_COUNTS = bytes([0, 0, 0, 0, 17] + [0] * 11)  # 17 syms @ len 5
_JPEG_LL_DC_SYMBOLS = bytes(range(17))


def _encode_jpeg_lossless(planes, prec=8, sel=1, pt=0, *, restart=0,
                          interleaved=True):
    """Reference LOSSLESS JPEG (SOF3, T.81 Annex H) encoder: Huffman-
    coded prediction residuals mod 2^16, predictors 1-7, point
    transform Pt, optional restart interval (in MCUs), interleaved
    (one sample per component per MCU) or one scan per component.
    ``planes`` is a list of equal-shape 2-D integer arrays already in
    [0, 2^prec); the encoder codes ``x >> pt`` per Annex H."""
    import struct

    dc = _jpeg_canonical(_JPEG_LL_DC_COUNTS, _JPEG_LL_DC_SYMBOLS)
    h, w = planes[0].shape
    shifted = [(p.astype(int) >> pt) for p in planes]
    default = 1 << (prec - pt - 1)

    def put_diff(wr, sample, pred):
        v = (sample - pred) & 0xFFFF
        if v == 32768:
            code, width = dc[16]
            wr.put(code, width)
            return
        signed = v - 65536 if v > 32768 else v
        s = 0 if signed == 0 else abs(signed).bit_length()
        code, width = dc[s]
        wr.put(code, width)
        if s:
            wr.put(signed if signed >= 0 else signed + (1 << s) - 1, s)

    def pred_at(p, r, c, fresh):
        if fresh:
            return default
        if r == 0:
            return int(p[r, c - 1])
        if c == 0:
            return int(p[r - 1, c])
        ra, rb, rc = int(p[r, c - 1]), int(p[r - 1, c]), int(p[r - 1, c - 1])
        return (ra, rb, rc, ra + rb - rc, ra + ((rb - rc) >> 1),
                rb + ((ra - rc) >> 1), (ra + rb) >> 1)[sel - 1]

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    nc = len(planes)
    sof = bytes([prec]) + struct.pack(">HH", h, w) + bytes([nc])
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])
    dht = bytes([0x00]) + _JPEG_LL_DC_COUNTS + _JPEG_LL_DC_SYMBOLS
    out = b"\xff\xd8" + seg(0xC3, sof) + seg(0xC4, dht)
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))

    def scan_bytes(comp_ids):
        wr = _JpegWriter()
        rst = 0
        fresh = dict.fromkeys(comp_ids, True)
        for unit in range(h * w):
            if restart and unit and unit % restart == 0:
                wr.align()
                wr.out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                fresh = dict.fromkeys(comp_ids, True)
            r, c = divmod(unit, w)
            for ci in comp_ids:
                p = shifted[ci]
                put_diff(wr, int(p[r, c]), pred_at(p, r, c, fresh[ci]))
                fresh[ci] = False
        wr.align()
        sos = bytes([len(comp_ids)])
        sos += b"".join(bytes([ci + 1, 0x00]) for ci in comp_ids)
        sos += bytes([sel, 0, pt])
        return seg(0xDA, sos) + bytes(wr.out)

    if interleaved or nc == 1:
        out += scan_bytes(list(range(nc)))
    else:
        for ci in range(nc):
            out += scan_bytes([ci])
    return out + b"\xff\xd9"


def test_lossless_jpeg_roundtrip_all_predictors():
    """LOSSLESS JPEG (SOF3): decode is BIT-EXACT for every predictor
    1-7 — with a lossless codec the test oracle is equality with the
    source pixels, no tolerance band."""
    import numpy as np

    from data_ingestors_spark.operators.multimodal import _decode_jpeg

    rng = np.random.RandomState(11)
    gray = rng.randint(0, 256, size=(13, 19)).astype(np.uint8)
    for sel in range(1, 8):
        w, h, arr = _decode_jpeg(_encode_jpeg_lossless([gray], sel=sel))
        assert (w, h) == (19, 13)
        assert np.array_equal(arr, gray), f"predictor {sel}"


def test_lossless_jpeg_precision_pt_restart_multicomp(spark):
    """SOF3 variants: 12/16-bit precision (gray8 = plane >> (P-8)),
    point transform Pt (low bits zeroed), restart markers, interleaved
    3-component and one-scan-per-component layouts, and the Spark
    image_metadata path end-to-end."""
    import numpy as np

    from data_ingestors_spark.operators.multimodal import (
        _decode_jpeg,
        image_metadata,
    )

    rng = np.random.RandomState(12)
    gray = rng.randint(0, 256, size=(9, 14)).astype(np.uint8)

    # 12- and 16-bit precision: decoded gray8 is the top 8 bits
    for prec in (12, 16):
        hi = rng.randint(0, 1 << prec, size=(9, 14)).astype(np.int64)
        _, _, arr = _decode_jpeg(_encode_jpeg_lossless([hi], prec=prec, sel=4))
        assert np.array_equal(arr, (hi >> (prec - 8)).astype(np.uint8)), prec

    # point transform: low Pt bits are zeroed, the rest exact
    _, _, arr_pt = _decode_jpeg(_encode_jpeg_lossless([gray], pt=2, sel=7))
    assert np.array_equal(arr_pt, (gray >> 2) << 2)

    # restart markers: same pixels, segmented entropy stream
    _, _, arr_rst = _decode_jpeg(_encode_jpeg_lossless([gray], sel=5, restart=7))
    assert np.array_equal(arr_rst, gray)

    # interleaved 3-component: the returned plane is the LUMA
    c1 = rng.randint(0, 256, size=gray.shape).astype(np.uint8)
    c2 = rng.randint(0, 256, size=gray.shape).astype(np.uint8)
    _, _, arr3 = _decode_jpeg(_encode_jpeg_lossless([gray, c1, c2], sel=6))
    assert np.array_equal(arr3, gray)

    # one scan per component
    _, _, arr3s = _decode_jpeg(
        _encode_jpeg_lossless([gray, c1, c2], sel=2, interleaved=False)
    )
    assert np.array_equal(arr3s, gray)

    # Spark path end-to-end
    df = spark.createDataFrame(
        [(1, bytearray(_encode_jpeg_lossless([gray], sel=4)))],
        "id long, img binary",
    )
    row = image_metadata(df, "id", "img").collect()[0]
    assert (row.width, row.height, row.error) == (14, 9, None)


def _expand2(p, eh=1, ev=1):
    """Independent Annex J.1.1.2 expansion reference (plain loops, not
    the module's vectorized form): x'[2i] = x[i],
    x'[2i+1] = (x[i] + x[i+1] + 1) >> 1, edge replicated."""
    import numpy as np

    p = np.asarray(p, dtype=np.int64)
    if eh:
        h, w = p.shape
        out = np.zeros((h, 2 * w), dtype=np.int64)
        for r in range(h):
            for c in range(w):
                out[r, 2 * c] = p[r, c]
                nxt = p[r, c + 1] if c + 1 < w else p[r, c]
                out[r, 2 * c + 1] = (p[r, c] + nxt + 1) >> 1
        p = out
    if ev:
        h, w = p.shape
        out = np.zeros((2 * h, w), dtype=np.int64)
        for c in range(w):
            for r in range(h):
                out[2 * r, c] = p[r, c]
                nxt = p[r + 1, c] if r + 1 < h else p[r, c]
                out[2 * r + 1, c] = (p[r, c] + nxt + 1) >> 1
        p = out
    return p


def _encode_jpeg_hier_diff_frame(diff, *, seg):
    """Differential LOSSLESS frame (SOF7 + one scan, Ss=0, Pt=0):
    each sample codes DIFF = diff[r, c] (already mod 2^16) with the
    category-5 flat Huffman table written as table 0 just before."""
    import struct

    dc = _jpeg_canonical(_JPEG_LL_DC_COUNTS, _JPEG_LL_DC_SYMBOLS)
    h, w = diff.shape
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
    dht = bytes([0x00]) + _JPEG_LL_DC_COUNTS + _JPEG_LL_DC_SYMBOLS
    wr = _JpegWriter()
    for r in range(h):
        for c in range(w):
            v = int(diff[r, c]) & 0xFFFF
            if v == 32768:
                code, width = dc[16]
                wr.put(code, width)
                continue
            signed = v - 65536 if v > 32768 else v
            s = 0 if signed == 0 else abs(signed).bit_length()
            code, width = dc[s]
            wr.put(code, width)
            if s:
                wr.put(signed if signed >= 0 else signed + (1 << s) - 1, s)
    wr.align()
    sos = bytes([1, 1, 0x00, 0, 0, 0])  # 1 comp, tables 0/0, Ss=0 Se=0 Pt=0
    return seg(0xC7, sof) + seg(0xC4, dht) + seg(0xDA, sos) + bytes(wr.out)


def _encode_jpeg_hierarchical(gray, *, first="lossless"):
    """Reference HIERARCHICAL JPEG (T.81 Annex J) encoder: DHP at full
    resolution, a half-resolution non-differential first frame
    (lossless SOF3, or baseline SOF0 at quant 1 when first='dct'),
    then EXP(1,1) + one differential lossless frame (SOF7) coding
    (source - expanded reference) mod 2^16 — so decode must be
    BIT-EXACT regardless of the first frame's type."""
    import struct

    import numpy as np

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    h, w = gray.shape
    down = gray[::2, ::2]
    if first == "lossless":
        frame1 = _encode_jpeg_lossless([down], sel=1)[2:-2]  # strip SOI/EOI
        ref = down.astype(np.int64)
    else:
        frame1 = _encode_jpeg(down, qval=1)[2:-2]
        # the composer's reference = rint(IDCT + 128) of the coded
        # coefficients (NOT the truncating gray8 display path) —
        # mirror that DCT roundtrip independently in numpy
        from data_ingestors_spark.operators.multimodal import (
            JPEG_ZIGZAG,
            _jpeg_idct_matrix,
        )

        A = _jpeg_idct_matrix()
        blocks, bw, bh = _jpeg_blocks(down, A, JPEG_ZIGZAG)
        ref = np.zeros((bh * 8, bw * 8), dtype=np.int64)
        for n, zz in enumerate(blocks):
            Fq = np.zeros((8, 8))
            for z, (r, c) in enumerate(JPEG_ZIGZAG):
                Fq[r, c] = zz[z]
            by, bx = divmod(n, bw)
            ref[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.rint(
                A.T @ Fq @ A + 128.0
            ).astype(np.int64)
        ref = ref[: down.shape[0], : down.shape[1]]
    up = _expand2(ref, 1, 1)[:h, :w]
    diff = (gray.astype(np.int64) - up) & 0xFFFF
    dhp = bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
    exp = bytes([0x11])  # Eh=1, Ev=1
    return (
        b"\xff\xd8"
        + seg(0xDE, dhp)
        + frame1
        + seg(0xDF, exp)
        + _encode_jpeg_hier_diff_frame(diff, seg=seg)
        + b"\xff\xd9"
    )


def test_hierarchical_jpeg_lossless_pyramid_bit_exact():
    """HIERARCHICAL JPEG (Annex J): SOF3 half-res first frame +
    EXP(1,1) + SOF7 differential lossless frame reconstructs the
    source BIT-EXACTLY — including odd dimensions, where the expanded
    reference overshoots by one row/column and must be cropped."""
    import numpy as np

    from data_ingestors_spark.operators.multimodal import _decode_jpeg

    rng = np.random.RandomState(21)
    for shape in ((12, 16), (13, 19)):
        gray = rng.randint(0, 256, size=shape).astype(np.uint8)
        w, h, arr = _decode_jpeg(_encode_jpeg_hierarchical(gray))
        assert (w, h) == (shape[1], shape[0])
        assert np.array_equal(arr, gray), shape


def test_hierarchical_jpeg_dct_first_frame_bit_exact():
    """Annex J with a DCT first frame: baseline SOF0 reference at
    half resolution, then the differential lossless frame corrects it
    to the source exactly (the correction absorbs DCT rounding, so
    the oracle is still strict equality). Smooth source keeps the
    intermediate reference inside [0, 255]."""
    import numpy as np

    from data_ingestors_spark.operators.multimodal import _decode_jpeg

    y, x = np.mgrid[0:14, 0:18]
    gray = (96 + 24 * np.sin(x / 3.0) + 18 * np.cos(y / 2.0)).astype(np.uint8)
    w, h, arr = _decode_jpeg(_encode_jpeg_hierarchical(gray, first="dct"))
    assert (w, h) == (18, 14)
    assert np.array_equal(arr, gray)


def test_hierarchical_jpeg_differential_sequential_sof5():
    """Annex J with a DIFFERENTIAL SEQUENTIAL (SOF5) correction frame:
    the decoder must entropy-decode the correction coefficients, IDCT
    them WITHOUT the 2^(P-1) level shift, and ADD the result to the
    full-resolution reference. Oracle: an independent numpy
    reconstruction from the same quantized coefficients (DCT rounding
    makes source-equality the wrong oracle here — the 12-bit DQT test
    uses the same device)."""
    import struct

    import numpy as np

    from data_ingestors_spark.operators.multimodal import (
        JPEG_ZIGZAG,
        _decode_jpeg,
        _jpeg_idct_matrix,
    )

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    rng = np.random.RandomState(31)
    ref = rng.randint(60, 190, size=(16, 16)).astype(np.uint8)
    diff = rng.randint(-12, 13, size=(16, 16)).astype(np.int64)

    # frame 1: full-resolution lossless reference
    frame1 = _encode_jpeg_lossless([ref], sel=1)[2:-2]

    # frame 2: SOF5 — DCT of the correction, quant 1, NO level shift
    A = _jpeg_idct_matrix()
    dc = _jpeg_canonical(_JPEG_DC_COUNTS, _JPEG_DC_SYMBOLS)
    ac = _jpeg_canonical(_JPEG_AC_COUNTS, _JPEG_AC_SYMBOLS)
    wr = _JpegWriter()
    pred = 0
    expected = np.zeros((16, 16), dtype=np.int64)
    for my in range(2):
        for mx in range(2):
            block = diff[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8].astype(np.float64)
            Fq = np.rint(A @ block @ A.T).astype(int)
            expected[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = np.rint(
                A.T @ Fq.astype(np.float64) @ A
            ).astype(np.int64)
            zz = [int(Fq[r, c]) for (r, c) in JPEG_ZIGZAG]
            d = zz[0] - pred
            pred = zz[0]
            s = 0 if d == 0 else abs(d).bit_length()
            code, width = dc[s]
            wr.put(code, width)
            if s:
                wr.put(d if d >= 0 else d + (1 << s) - 1, s)
            run = 0
            for v in zz[1:]:
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    code, width = ac[0xF0]
                    wr.put(code, width)
                    run -= 16
                s = abs(v).bit_length()
                code, width = ac[(run << 4) | s]
                wr.put(code, width)
                wr.put(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if run:
                code, width = ac[0x00]
                wr.put(code, width)
    wr.align()
    qtab = bytes([0]) + bytes([1] * 64)
    sof5 = bytes([8]) + struct.pack(">HH", 16, 16) + bytes([1, 1, 0x11, 0])
    dht = (
        bytes([0x00]) + _JPEG_DC_COUNTS + _JPEG_DC_SYMBOLS
        + bytes([0x10]) + _JPEG_AC_COUNTS + _JPEG_AC_SYMBOLS
    )
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    dhp = bytes([8]) + struct.pack(">HH", 16, 16) + bytes([1, 1, 0x11, 0])
    payload = (
        b"\xff\xd8"
        + seg(0xDE, dhp)
        + frame1
        + seg(0xDB, qtab)
        + seg(0xC5, sof5)
        + seg(0xC4, dht)
        + seg(0xDA, sos)
        + bytes(wr.out)
        + b"\xff\xd9"
    )
    w, h, arr = _decode_jpeg(payload)
    want = np.clip(ref.astype(np.int64) + expected, 0, 255).astype(np.uint8)
    assert (w, h) == (16, 16)
    assert np.array_equal(arr, want)


class _QmRefEncoder:
    """Reference QM arithmetic encoder over an UNBOUNDED-integer
    interval base — an independent realization of T.81 Annex D's
    interval arithmetic (no byte/carry registers at all: the base is
    a python bignum, renormalizations are plain doublings, and the
    final codeword is the exact base emitted MSB-first). Shares only
    the spec's probability-estimation state table with the decoder,
    like the Huffman encoders share JPEG_ZIGZAG."""

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.shifts = 0

    def encode(self, bin_, d):
        from data_ingestors_spark.operators.multimodal import _QM_STATES

        qe, nlps, nmps, switch = _QM_STATES[bin_.i]
        an = self.a - qe
        if d == bin_.mps:
            if an >= 0x8000:
                self.a = an
                return
            if an < qe:  # conditional exchange: MPS takes the top
                self.c += an
                self.a = qe
            else:
                self.a = an
            bin_.i = nmps
        else:
            if an < qe:  # conditional exchange: LPS takes the bottom
                self.a = an
            else:
                self.c += an
                self.a = qe
            if switch:
                bin_.mps ^= 1
            bin_.i = nlps
        while self.a < 0x8000:
            self.a <<= 1
            self.c <<= 1
            self.shifts += 1

    def flush(self) -> bytes:
        total_bits = 16 + self.shifts
        pad = (-total_bits) % 8
        w = self.c << pad
        return w.to_bytes((total_bits + pad) // 8, "big")


def _qm_encode_dc(enc, dcs, ci, dc_ctx, last_dc, L, U, dc_val):
    diff = dc_val - last_dc[ci]
    last_dc[ci] = dc_val
    base = dc_ctx[ci]
    if diff == 0:
        enc.encode(dcs[base], 0)
        dc_ctx[ci] = 0
        return
    enc.encode(dcs[base], 1)
    sign = 1 if diff < 0 else 0
    enc.encode(dcs[base + 1], sign)
    t = abs(diff) - 1
    if t == 0:
        enc.encode(dcs[base + 2 + sign], 0)
        m, pos = 0, base + 2 + sign
    else:
        enc.encode(dcs[base + 2 + sign], 1)
        m, pos = 1, 20
        while (m << 1) <= t:
            enc.encode(dcs[pos], 1)
            m <<= 1
            pos += 1
        enc.encode(dcs[pos], 0)
    if m < (1 << L) >> 1:
        dc_ctx[ci] = 0
    elif m > (1 << U) >> 1:
        dc_ctx[ci] = 12 + sign * 4
    else:
        dc_ctx[ci] = 4 + sign * 4
    pos += 14
    mm = m
    while mm > 1:
        mm >>= 1
        enc.encode(dcs[pos], 1 if t & mm else 0)


def _qm_encode_ac(enc, acs, fixed, blk, Kx, se=63):
    kend = max((k for k in range(1, se + 1) if blk[k]), default=0)
    k = 1
    while k <= kend:
        base = 3 * (k - 1)
        enc.encode(acs[base], 0)  # not EOB yet
        while blk[k] == 0:
            enc.encode(acs[base + 1], 0)
            k += 1
            base = 3 * (k - 1)
        enc.encode(acs[base + 1], 1)
        val = blk[k]
        sign = 1 if val < 0 else 0
        enc.encode(fixed, sign)
        t = abs(val) - 1
        if t == 0:
            enc.encode(acs[base + 2], 0)
            m, pos = 0, base + 2
        elif t == 1:
            enc.encode(acs[base + 2], 1)
            enc.encode(acs[base + 2], 0)
            m, pos = 1, base + 2
        else:
            enc.encode(acs[base + 2], 1)
            enc.encode(acs[base + 2], 1)
            m, pos = 2, (189 if k <= Kx else 217)
            while (m << 1) <= t:
                enc.encode(acs[pos], 1)
                m <<= 1
                pos += 1
            enc.encode(acs[pos], 0)
        pos += 14
        mm = m
        while mm > 1:
            mm >>= 1
            enc.encode(acs[pos], 1 if t & mm else 0)
        k += 1
    if kend < se:
        enc.encode(acs[3 * kend], 1)  # EOB at k = kend + 1


def _encode_jpeg_arith(gray, *, chroma=None, qval=1, restart=0, dac=None,
                       prec=8):
    """Reference ARITHMETIC sequential JPEG (SOF9) encoder: the T.81
    Annex F statistical model driving the bignum QM encoder above.
    1 component (or 3 at 4:4:4 when ``chroma`` is given), optional
    restart interval (statistics + DC contexts + predictors reset per
    segment), optional DAC conditioning (dc (L, U), ac Kx), 8- or
    12-bit sample precision (level shift 2^(prec-1))."""
    import struct

    import numpy as np

    from data_ingestors_spark.operators.multimodal import (
        JPEG_ZIGZAG,
        _QmBin,
        _jpeg_idct_matrix,
    )

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    def stuff(b: bytes) -> bytes:
        return b.replace(b"\xff", b"\xff\x00")

    A = _jpeg_idct_matrix()
    h, w = gray.shape
    H, W = -(-h // 8) * 8, -(-w // 8) * 8
    planes = [gray] if chroma is None else [gray, chroma, chroma]
    padded = [
        np.pad(p.astype(np.float64) - float(1 << (prec - 1)),
               ((0, H - h), (0, W - w)), mode="edge")
        for p in planes
    ]
    L, U = (dac or {}).get("dc", (0, 1))
    Kx = (dac or {}).get("ac", 5)

    def coeffs_at(plane, my, mx):
        block = plane[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
        Fq = np.rint(np.rint(A @ block @ A.T) / qval).astype(int)
        return [int(Fq[r, c]) for (r, c) in JPEG_ZIGZAG]

    mcus = [(y, x) for y in range(H // 8) for x in range(W // 8)]
    body = bytearray()
    i = 0
    rst = 0
    while i < len(mcus):
        seg_mcus = mcus[i : i + restart] if restart else mcus
        if restart and i:
            body += bytes([0xFF, 0xD0 + ((rst - 1) % 8)])
        enc = _QmRefEncoder()
        dcs = [_QmBin() for _ in range(64)]
        acs = [_QmBin() for _ in range(256)]
        fixed = _QmBin()
        fixed.i = 113
        dc_ctx = [0] * len(planes)
        last_dc = [0] * len(planes)
        for my, mx in seg_mcus:
            for ci, plane in enumerate(padded):
                zz = coeffs_at(plane, my, mx)
                _qm_encode_dc(enc, dcs, ci, dc_ctx, last_dc, L, U, zz[0])
                _qm_encode_ac(enc, acs, fixed, zz, Kx)
        body += stuff(enc.flush())
        i += len(seg_mcus)
        rst += 1

    nc = len(planes)
    qtab = bytes([0]) + bytes([qval] * 64)
    sof = bytes([prec]) + struct.pack(">HH", h, w) + bytes([nc])
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])
    out = b"\xff\xd8" + seg(0xDB, qtab) + seg(0xC9, sof)
    if dac:
        payload = b""
        if "dc" in dac:
            dl, du = dac["dc"]
            payload += bytes([0x00, (du << 4) | dl])
        if "ac" in dac:
            payload += bytes([0x10, dac["ac"]])
        out += seg(0xCC, payload)
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    sos = bytes([nc]) + b"".join(bytes([ci + 1, 0x00]) for ci in range(nc)) + bytes([0, 63, 0])
    return out + seg(0xDA, sos) + bytes(body) + b"\xff\xd9"


def _qm_encode_ac_first(enc, acs, fixed, vals, Kx, ss, se):
    """Encode one block's AC band [ss, se] initial-stage values
    (mirror of the SOF9/SOF10 AC-first decision tree)."""
    kend = max((k for k in range(ss, se + 1) if vals[k]), default=ss - 1)
    k = ss
    while k <= kend:
        base = 3 * (k - 1)
        enc.encode(acs[base], 0)  # not EOB yet
        while vals[k] == 0:
            enc.encode(acs[base + 1], 0)
            k += 1
            base = 3 * (k - 1)
        enc.encode(acs[base + 1], 1)
        val = vals[k]
        sign = 1 if val < 0 else 0
        enc.encode(fixed, sign)
        t = abs(val) - 1
        if t == 0:
            enc.encode(acs[base + 2], 0)
            m, pos = 0, base + 2
        elif t == 1:
            enc.encode(acs[base + 2], 1)
            enc.encode(acs[base + 2], 0)
            m, pos = 1, base + 2
        else:
            enc.encode(acs[base + 2], 1)
            enc.encode(acs[base + 2], 1)
            m, pos = 2, (189 if k <= Kx else 217)
            while (m << 1) <= t:
                enc.encode(acs[pos], 1)
                m <<= 1
                pos += 1
            enc.encode(acs[pos], 0)
        pos += 14
        mm = m
        while mm > 1:
            mm >>= 1
            enc.encode(acs[pos], 1 if t & mm else 0)
        k += 1
    if kend < se:  # EOB decision at k = kend+1 (or ss when band is empty)
        enc.encode(acs[3 * (max(kend + 1, ss) - 1)], 1)


def _qm_encode_ac_refine(enc, acs, fixed, prev, final, ss, se):
    """Encode one block's AC refinement scan (Ah=1, Al=0 mirror of
    the SOF10 refinement decision tree): ``prev`` holds the
    previous-stage coefficient values, ``final`` the targets."""
    kex = 0
    for kk in range(se, 0, -1):
        if prev[kk]:
            kex = kk
            break
    k = ss
    while k <= se:
        base = 3 * (k - 1)
        if k > kex:
            if not any(prev[j] == 0 and final[j] for j in range(k, se + 1)):
                enc.encode(acs[base], 1)  # EOB
                break
            enc.encode(acs[base], 0)
        while True:
            if prev[k]:
                enc.encode(acs[base + 2], abs(final[k]) & 1)
                break
            if final[k]:
                enc.encode(acs[base + 1], 1)
                enc.encode(fixed, 1 if final[k] < 0 else 0)
                break
            enc.encode(acs[base + 1], 0)
            k += 1
            base = 3 * (k - 1)
        k += 1


def _encode_jpeg_arith_progressive(gray, chroma=None):
    """Reference PROGRESSIVE ARITHMETIC JPEG (SOF10) encoder, same
    scan script as the Huffman progressive reference: DC first at
    Al=1 (interleaved when 3 components), fixed-bin DC refinement,
    per-component AC spectral-selection scans at Al=1, and a final
    per-component AC refinement scan. Statistics reset per scan."""
    import struct

    import numpy as np

    from data_ingestors_spark.operators.multimodal import (
        JPEG_ZIGZAG,
        _QmBin,
        _jpeg_idct_matrix,
    )

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    def stuff(b: bytes) -> bytes:
        return b.replace(b"\xff", b"\xff\x00")

    def sos(comps_spec, ss, se, ah, al):
        payload = bytes([len(comps_spec)])
        for cid in comps_spec:
            payload += bytes([cid, 0x00])
        payload += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, payload)

    A = _jpeg_idct_matrix()
    h, w = gray.shape
    planes = [gray] if chroma is None else [gray, chroma, chroma]
    comp_blocks = [_jpeg_blocks(p, A, JPEG_ZIGZAG)[0] for p in planes]
    nc = len(planes)
    Kx = 5

    def halved(c):
        return (abs(c) >> 1) * (1 if c >= 0 else -1)

    out = b""
    # scan 1: DC first, Al=1, interleaved
    enc = _QmRefEncoder()
    dcs = [_QmBin() for _ in range(64)]
    dc_ctx = [0] * nc
    last_dc = [0] * nc
    for bi in range(len(comp_blocks[0])):
        for ci in range(nc):
            _qm_encode_dc(
                enc, dcs, ci, dc_ctx, last_dc, 0, 1, comp_blocks[ci][bi][0] >> 1
            )
    out += sos(list(range(1, nc + 1)), 0, 0, 0, 1) + stuff(enc.flush())

    # scan 2: DC refinement (fixed equiprobable bin)
    enc = _QmRefEncoder()
    fixed = _QmBin()
    fixed.i = 113
    for bi in range(len(comp_blocks[0])):
        for ci in range(nc):
            enc.encode(fixed, comp_blocks[ci][bi][0] & 1)
    out += sos(list(range(1, nc + 1)), 0, 0, 1, 0) + stuff(enc.flush())

    for ci in range(nc):
        # AC first scans at Al=1, two bands
        for ss, se in ((1, 5), (6, 63)):
            enc = _QmRefEncoder()
            acs = [_QmBin() for _ in range(256)]
            fixed = _QmBin()
            fixed.i = 113
            for blk in comp_blocks[ci]:
                vals = [0] * 64
                for k in range(ss, se + 1):
                    vals[k] = halved(blk[k])
                _qm_encode_ac_first(enc, acs, fixed, vals, Kx, ss, se)
            out += sos([ci + 1], ss, se, 0, 1) + stuff(enc.flush())

        # AC refinement scan 1..63 (Ah=1, Al=0)
        enc = _QmRefEncoder()
        acs = [_QmBin() for _ in range(256)]
        fixed = _QmBin()
        fixed.i = 113
        for blk in comp_blocks[ci]:
            prev = [0] * 64
            for k in range(1, 64):
                prev[k] = halved(blk[k]) << 1
            _qm_encode_ac_refine(enc, acs, fixed, prev, blk, 1, 63)
        out += sos([ci + 1], 1, 63, 1, 0) + stuff(enc.flush())

    qtab = bytes([0]) + bytes([1] * 64)
    sofp = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for ci in range(nc):
        sofp += bytes([ci + 1, 0x11, 0])
    return b"\xff\xd8" + seg(0xDB, qtab) + seg(0xCA, sofp) + out + b"\xff\xd9"


def test_progressive_arithmetic_jpeg_matches_huffman():
    """SOF10 progressive arithmetic: the same staged coefficients as
    the Huffman progressive reference, decoded through the arithmetic
    entropy layer, must reproduce the Huffman progressive decode
    byte-identically (gray and interleaved 3-component)."""
    import numpy as np

    from data_ingestors_spark.operators.multimodal import _decode_jpeg

    rng = np.random.RandomState(43)
    gray = rng.randint(0, 256, size=(19, 22)).astype(np.uint8)
    ref = _decode_jpeg(_encode_jpeg_progressive(gray))[2]
    got = _decode_jpeg(_encode_jpeg_arith_progressive(gray))[2]
    assert np.array_equal(got, ref)

    chroma = rng.randint(0, 256, size=gray.shape).astype(np.uint8)
    ref3 = _decode_jpeg(_encode_jpeg_progressive(gray, chroma))[2]
    got3 = _decode_jpeg(_encode_jpeg_arith_progressive(gray, chroma))[2]
    assert np.array_equal(got3, ref3)


def test_arithmetic_jpeg_matches_huffman_decode():
    """SOF9 arithmetic sequential JPEG: swapping the entropy layer
    must be invisible — the arithmetic stream codes EXACTLY the same
    quantized coefficients as the Huffman stream, so the decoded
    gray8 planes must be byte-identical (the Huffman decoder is the
    independently-validated oracle)."""
    import numpy as np

    from data_ingestors_spark.operators.multimodal import _decode_jpeg

    rng = np.random.RandomState(41)
    gray = rng.randint(0, 256, size=(21, 17)).astype(np.uint8)
    ref = _decode_jpeg(_encode_jpeg(gray, qval=1))[2]
    got = _decode_jpeg(_encode_jpeg_arith(gray, qval=1))[2]
    assert np.array_equal(got, ref)

    # coarser quant exercises long zero runs + EOB decisions
    ref_q = _decode_jpeg(_encode_jpeg(gray, qval=8))[2]
    got_q = _decode_jpeg(_encode_jpeg_arith(gray, qval=8))[2]
    assert np.array_equal(got_q, ref_q)


def test_arithmetic_jpeg_restart_multicomp_dac():
    """SOF9 variants: restart intervals (statistics reset per
    segment), interleaved 3-component 4:4:4, and non-default DAC
    conditioning (L, U, Kx change CONTEXT SELECTION only — decoded
    values must not move)."""
    import numpy as np

    from data_ingestors_spark.operators.multimodal import _decode_jpeg

    rng = np.random.RandomState(42)
    gray = rng.randint(0, 256, size=(16, 24)).astype(np.uint8)
    ref = _decode_jpeg(_encode_jpeg(gray, qval=2))[2]

    got_rst = _decode_jpeg(_encode_jpeg_arith(gray, qval=2, restart=3))[2]
    assert np.array_equal(got_rst, ref)

    chroma = rng.randint(0, 256, size=gray.shape).astype(np.uint8)
    got_3c = _decode_jpeg(_encode_jpeg_arith(gray, qval=2, chroma=chroma))[2]
    assert np.array_equal(got_3c, ref)

    got_dac = _decode_jpeg(
        _encode_jpeg_arith(gray, qval=2, dac={"dc": (2, 3), "ac": 12})
    )[2]
    assert np.array_equal(got_dac, ref)


def test_hierarchical_jpeg_fail_loud_boundaries():
    """Structural guards stay fail-loud now that every SOF decodes:
    a differential frame with no DHP, an EXP with no reference frame,
    and a SOF with no scan."""
    import struct

    import pytest

    from data_ingestors_spark.operators.multimodal import _decode_jpeg

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    sof = bytes([8]) + struct.pack(">HH", 4, 4) + bytes([1, 1, 0x11, 0])
    no_dhp = b"\xff\xd8" + seg(0xC7, sof)
    with pytest.raises(ValueError, match="without DHP"):
        _decode_jpeg(no_dhp)

    # SOF (any type, here SOF11) without a scan is structurally invalid
    with pytest.raises(ValueError, match="missing SOF/SOS"):
        _decode_jpeg(b"\xff\xd8" + seg(0xCB, sof) + b"\xff\xd9")

    # EXP before any reference frame
    dhp = bytes([8]) + struct.pack(">HH", 4, 4) + bytes([1, 1, 0x11, 0])
    import numpy as np

    frame2 = _encode_jpeg_lossless_arith(
        [np.zeros((4, 4), dtype=np.int64)], differential=True
    )[2:-2]
    bad = (
        b"\xff\xd8" + seg(0xDE, dhp) + seg(0xDF, bytes([0x11]))
        + frame2 + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="EXP before any reference"):
        _decode_jpeg(bad)


def test_12bit_sequential_jpeg_with_16bit_dqt():
    """12-bit extended-sequential JPEG (SOF1) with a 16-bit quant
    table (DQT pq=1): the decoder must dequantize with the 16-bit
    values, level-shift by 2^11, clip to [0, 4095], and render gray8
    as the top 8 bits — asserted BIT-EXACT against an independent
    numpy reconstruction from the same quantized coefficients."""
    import numpy as np

    from data_ingestors_spark.operators.multimodal import (
        JPEG_ZIGZAG,
        _decode_jpeg,
        _jpeg_idct_matrix,
    )

    rng = np.random.RandomState(13)
    yy, xx = np.mgrid[0:11, 0:18]
    img12 = (
        2048 + 900 * np.sin(xx / 3.0) * np.cos(yy / 2.0)
        + rng.randint(-300, 300, (11, 18))
    ).clip(0, 4095).astype(np.int64)
    qval = 300  # > 255 forces the 16-bit DQT form

    w, h, arr = _decode_jpeg(_encode_jpeg(img12, prec=12, qval=qval))
    assert (w, h) == (18, 11)

    # expected: replicate encoder quantization + decoder IDCT exactly
    A = _jpeg_idct_matrix()
    H, W = 16, 24
    p = np.pad(img12.astype(np.float64) - 2048, ((0, H - 11), (0, W - 18)),
               mode="edge")
    zz_rows = [r for r, _ in JPEG_ZIGZAG]
    zz_cols = [c for _, c in JPEG_ZIGZAG]
    coeffs = np.zeros((6, 8, 8))
    for my in range(2):
        for mx in range(3):
            blk = p[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
            F = np.rint(np.rint(A @ blk @ A.T) / qval)
            q = np.zeros((8, 8))
            q[zz_rows, zz_cols] = F[zz_rows, zz_cols]
            coeffs[my * 3 + mx] = q
    blocks = np.einsum("ij,njk,kl->nil", A.T, coeffs * qval, A) + 2048.0
    Y = blocks.reshape(2, 3, 8, 8).transpose(0, 2, 1, 3).reshape(16, 24)
    expected = (np.clip(Y[:11, :18], 0, 4095).astype(np.int64) >> 4).astype(
        np.uint8
    )
    assert np.array_equal(arr, expected)


def _make_wav(fmt_code, payload, sr=8000, nch=1, bits=8, block_align=None,
              fact=None):
    """Minimal RIFF/WAVE builder for non-PCM fixtures (stdlib wave
    refuses to write them)."""
    ba = block_align if block_align is not None else nch * max(bits // 8, 1)
    fmt = (
        fmt_code.to_bytes(2, "little") + nch.to_bytes(2, "little")
        + sr.to_bytes(4, "little") + (sr * ba).to_bytes(4, "little")
        + ba.to_bytes(2, "little") + bits.to_bytes(2, "little")
    )
    body = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    if fact is not None:
        body += b"fact" + (4).to_bytes(4, "little") + fact.to_bytes(4, "little")
    body += b"data" + len(payload).to_bytes(4, "little") + payload
    if len(payload) & 1:
        body += b"\x00"
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_wav_pcm24_decode():
    """24-bit PCM: stdlib wave reads sampwidth-3 frames, the decoder
    assembles the 3-byte little-endian values manually. Pinned to the
    exact int24 extremes and a stereo mean."""
    import io
    import wave

    from data_ingestors_spark.operators.multimodal import _decode_audio

    vals = [-(1 << 23), (1 << 23) - 1, 1, -1, 0]
    raw = b"".join(v.to_bytes(3, "little", signed=True) for v in vals)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1); wf.setsampwidth(3); wf.setframerate(16000)
        wf.writeframes(raw)
    sr, x = _decode_audio(buf.getvalue())
    assert sr == 16000
    assert [round(v * 8388608) for v in x] == vals

    # stereo: channels average to mono
    pairs = [(-(1 << 23), (1 << 23) - 2), (100, -100)]
    raw = b"".join(
        a.to_bytes(3, "little", signed=True) + b.to_bytes(3, "little", signed=True)
        for a, b in pairs
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2); wf.setsampwidth(3); wf.setframerate(8000)
        wf.writeframes(raw)
    _, x = _decode_audio(buf.getvalue())
    assert [round(v * 8388608 * 2) for v in x] == [sum(p) for p in pairs]


def test_wav_ieee_float_decode():
    """IEEE-float WAV (fmt 3): float32 and float64 payloads pass
    through bit-exactly; stereo averages to mono; a 16-bit float
    claim stays fail-loud."""
    import numpy as np
    import pytest

    from data_ingestors_spark.operators.multimodal import _decode_audio

    mono = np.array([0.0, 0.5, -0.25, 0.999, -1.0], dtype="<f4")
    sr, x = _decode_audio(_make_wav(3, mono.tobytes(), bits=32))
    assert sr == 8000
    np.testing.assert_array_equal(x, mono.astype(np.float64))

    mono64 = np.array([0.1, -0.2, 0.3], dtype="<f8")
    _, x = _decode_audio(_make_wav(3, mono64.tobytes(), bits=64))
    np.testing.assert_array_equal(x, mono64)

    st = np.array([0.5, -0.5, 1.0, 0.0], dtype="<f4")  # L R L R
    _, x = _decode_audio(_make_wav(3, st.tobytes(), nch=2, bits=32))
    np.testing.assert_allclose(x, [0.0, 0.5])

    with pytest.raises(NotImplementedError):
        _decode_audio(_make_wav(3, b"\x00\x00", bits=16))


def _ima_ref_decode(block, nch):
    """Independent SCALAR reference IMA-ADPCM block decoder (straight
    off the IMA recommended-practices pseudocode) — the production
    path is vectorized across blocks, so agreement between the two is
    a real two-implementation check."""
    steps = [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
        37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
        157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
        544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
        1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
        4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
        12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
        29794, 32767,
    ]
    adj = [-1, -1, -1, -1, 2, 4, 6, 8]
    chans = [[] for _ in range(nch)]
    pred, idx = [], []
    for c in range(nch):
        p = int.from_bytes(block[4 * c : 4 * c + 2], "little", signed=True)
        pred.append(p)
        idx.append(min(max(block[4 * c + 2], 0), 88))
        chans[c].append(p)
    body = block[4 * nch :]
    ngroups = len(body) // (4 * nch)
    for g in range(ngroups):
        for c in range(nch):
            four = body[(g * nch + c) * 4 : (g * nch + c) * 4 + 4]
            for byte in four:
                for n in (byte & 0x0F, byte >> 4):
                    step = steps[idx[c]]
                    diff = step >> 3
                    if n & 1:
                        diff += step >> 2
                    if n & 2:
                        diff += step >> 1
                    if n & 4:
                        diff += step
                    p = pred[c] - diff if n & 8 else pred[c] + diff
                    pred[c] = min(max(p, -32768), 32767)
                    idx[c] = min(max(idx[c] + adj[n & 7], 0), 88)
                    chans[c].append(pred[c])
    n_samp = len(chans[0])
    return [sum(ch[i] for ch in chans) / nch for i in range(n_samp)]


def test_wav_ima_adpcm_decode():
    """IMA ADPCM (fmt 0x11): the vectorized production decoder must
    agree sample-exactly with an independent scalar reference on
    random nibble streams — mono multi-block, stereo interleave, a
    trailing short block, and fact-chunk trimming."""
    import numpy as np

    from data_ingestors_spark.operators.multimodal import _decode_audio

    rng = np.random.RandomState(17)

    def header(pred, idx):
        return pred.to_bytes(2, "little", signed=True) + bytes([idx, 0])

    # mono: 3 full blocks of block_align=12 (4 hdr + 8 data = 17
    # samples/block), random nibbles, extreme predictors/indices
    blocks = []
    for pred, idx in [(-32768, 0), (32767, 88), (1234, 44)]:
        blocks.append(header(pred, idx) + bytes(rng.randint(0, 256, 8, dtype=np.uint8)))
    wav = _make_wav(0x11, b"".join(blocks), bits=4, block_align=12)
    sr, x = _decode_audio(wav)
    ref = [s for b in blocks for s in _ima_ref_decode(b, 1)]
    assert sr == 8000
    np.testing.assert_array_equal(x * 32768.0, ref)

    # trailing short block (header + one 4-byte group) decodes too
    tail = header(-5000, 30) + bytes(rng.randint(0, 256, 4, dtype=np.uint8))
    _, x = _decode_audio(_make_wav(0x11, b"".join(blocks) + tail, bits=4,
                                   block_align=12))
    np.testing.assert_array_equal(
        x * 32768.0, ref + _ima_ref_decode(tail, 1))

    # fact chunk trims encoder padding to the true sample count
    _, x = _decode_audio(_make_wav(0x11, b"".join(blocks), bits=4,
                                   block_align=12, fact=40))
    np.testing.assert_array_equal(x * 32768.0, ref[:40])

    # stereo: per-channel headers then round-robin 4-byte groups;
    # production averages to mono — so must the reference
    blk = (header(100, 10) + header(-200, 50)
           + bytes(rng.randint(0, 256, 16, dtype=np.uint8)))
    _, x = _decode_audio(_make_wav(0x11, blk, nch=2, bits=4, block_align=24))
    np.testing.assert_array_equal(x * 32768.0, _ima_ref_decode(blk, 2))


def test_g711_wav_decode():
    """mu-law / A-law WAV expand through the G.711 tables (stdlib wave
    refuses non-PCM, so the RIFF walk is manual). Spot values pinned to
    the ITU tables: mu-law 0x00 -> -32124, 0xFF -> 0; A-law 0xD5 -> +8,
    0x2A -> -32256."""
    import numpy as np

    from data_ingestors_spark.operators.multimodal import _decode_audio

    def wav(fmt_code, payload, sr=8000):
        fmt = (
            fmt_code.to_bytes(2, "little") + (1).to_bytes(2, "little")
            + sr.to_bytes(4, "little") + sr.to_bytes(4, "little")
            + (1).to_bytes(2, "little") + (8).to_bytes(2, "little")
        )
        body = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        body += b"data" + len(payload).to_bytes(4, "little") + payload
        return b"RIFF" + len(body).to_bytes(4, "little") + body

    sr, x = _decode_audio(wav(7, bytes([0x00, 0xFF, 0x80])))
    assert sr == 8000
    assert [round(v * 32768) for v in x] == [-32124, 0, 32124]

    sr, x = _decode_audio(wav(6, bytes([0xD5, 0x55, 0x2A, 0xAA])))
    assert [round(v * 32768) for v in x] == [8, -8, -32256, 32256]


def test_real_mjpeg_avi_decode(spark):
    """Motion-JPEG AVI: frames are plain JPEGs in '..dc' RIFF chunks —
    the decoder must walk the chunk tree, decode each frame via the
    baseline JPEG path, and agree with decoding the JPEGs directly."""
    import numpy as np

    from data_ingestors_spark.operators.multimodal import (
        _decode_jpeg,
        _decode_video,
        video_frame_sample,
    )

    rng = np.random.RandomState(9)
    yy, xx = np.mgrid[0:16, 0:16]
    f1 = (128 + 50 * np.sin(xx / 2.0)).clip(0, 255).astype(np.uint8)
    f2 = (128 + 50 * np.cos(yy / 2.0)).clip(0, 255).astype(np.uint8)
    j1, j2 = _encode_jpeg(f1), _encode_jpeg(f2)

    def chunk(cid, body):
        pad = b"\x00" if len(body) & 1 else b""
        return cid + len(body).to_bytes(4, "little") + body + pad

    movi = b"movi" + chunk(b"00dc", j1) + chunk(b"00dc", j2)
    avi = chunk(b"RIFF", b"AVI " + chunk(b"LIST", movi))

    w, h, n, frames = _decode_video(avi)
    assert (w, h, n) == (16, 16, 2)
    assert np.array_equal(frames[0], _decode_jpeg(j1)[2])
    assert np.array_equal(frames[1], _decode_jpeg(j2)[2])

    df = spark.createDataFrame([(1, bytearray(avi))], "id long, vid binary")
    rows = video_frame_sample(df, "id", "vid", every_nth=1).collect()
    assert [(r.frame_idx, r.width, r.height, r.error) for r in rows] == [
        (0, 16, 16, None),
        (1, 16, 16, None),
    ]


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYPOTHESIS = True
except Exception:  # pragma: no cover
    _HAVE_HYPOTHESIS = False

if _HAVE_HYPOTHESIS:

    @given(
        w=st.integers(1, 20),
        h=st.integers(1, 20),
        ct=st.sampled_from([0, 2, 4, 6]),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=30, deadline=None)
    def test_png_roundtrip_property(w, h, ct, seed):
        """Any 8-bit image, any per-row filter mix, any color type:
        encode with the reference filter-forward encoder, decode, and
        the grayscale must equal the channel-mean ground truth
        EXACTLY (PNG is lossless)."""
        import numpy as np

        from data_ingestors_spark.operators.multimodal import _decode_png

        rng = np.random.RandomState(seed)
        ch = {0: 1, 2: 3, 4: 2, 6: 4}[ct]
        shape = (h, w) if ch == 1 else (h, w, ch)
        img = rng.randint(0, 256, size=shape, dtype=np.uint8)
        filters = [int(rng.randint(0, 5)) for _ in range(h)]
        gw, gh, arr = _decode_png(_encode_png(img, ct, filters=filters))
        assert (gw, gh) == (w, h)
        if ch == 1:
            want = img
        elif ct == 4:
            want = img[:, :, 0]
        else:
            want = img[:, :, :3].mean(axis=2).astype(np.uint8)
        assert np.array_equal(arr, want)

    @given(
        w=st.integers(1, 16),
        h=st.integers(1, 16),
        n_colors=st.integers(2, 8),
        interlace=st.booleans(),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=30, deadline=None)
    def test_gif_roundtrip_property(w, h, n_colors, interlace, seed):
        """Any palette size, any dims, interlaced or not: the LZW
        round-trip through the reference compressor is lossless."""
        import numpy as np

        from data_ingestors_spark.operators.multimodal import _decode_gif

        rng = np.random.RandomState(seed)
        pal = [int(x) for x in rng.randint(0, 256, size=3 * n_colors)]
        idx = rng.randint(0, n_colors, size=(h, w), dtype=np.uint8)
        mcs = max(2, (n_colors - 1).bit_length())
        gw, gh, arr = _decode_gif(_encode_gif(idx, pal, mcs=mcs, interlace=interlace))
        assert (gw, gh) == (w, h)
        pal_np = np.array(pal, dtype=np.uint8).reshape(-1, 3)
        assert np.array_equal(arr, pal_np[idx].mean(axis=2).astype(np.uint8))


if _HAVE_HYPOTHESIS:

    @given(seed=st.integers(0, 2**31 - 1), n=st.integers(0, 400))
    @settings(max_examples=60, deadline=None)
    def test_codec_fuzz_always_raises_never_hangs(seed, n):
        """Adversarial bytes (random, and random prefixed with each
        magic) must make every decoder RAISE promptly — never hang,
        never return garbage silently. The per-row feature operators
        catch any exception, so the only contract is bounded failure."""
        import numpy as np

        from data_ingestors_spark.operators.multimodal import (
            _decode_audio,
            _decode_image,
            _decode_video,
        )

        rng = np.random.RandomState(seed)
        junk = rng.bytes(n)
        prefixes = [
            b"", b"BM", b"\x89PNG\r\n\x1a\n", b"GIF89a", b"\xff\xd8",
            b"RIFF" + junk[:4] + b"WAVE", b"RIFF" + junk[:4] + b"AVI ",
        ]
        for p in prefixes:
            payload = p + junk
            for dec in (_decode_image, _decode_audio, _decode_video):
                try:
                    dec(payload)
                except Exception:
                    pass  # any prompt exception is acceptable


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


def test_image_phash_stable_and_noise_tolerant(spark):
    """pHash must be identical for identical images, within a few bits
    under light noise, and far apart for structurally different
    images."""
    import numpy as np

    from data_ingestors_spark.operators.multimodal import image_phash

    rng = np.random.default_rng(7)
    w = h = 48
    base = (
        np.clip(
            np.add.outer(np.linspace(0, 200, h), np.linspace(0, 55, w))
            + 40 * np.sin(np.arange(w) / 3.0),
            0, 255,
        )
        .astype(np.uint8)
    )
    noisy = np.clip(base.astype(int) + rng.integers(-6, 7, base.shape), 0, 255).astype(np.uint8)
    other = np.flipud(base).T.copy()  # structurally different

    def fake(arr):
        return bytearray(b"FAKEIMG:%dx%d:" % (arr.shape[1], arr.shape[0]) + arr.tobytes())

    df = spark.createDataFrame(
        [(1, fake(base)), (2, fake(base)), (3, fake(noisy)), (4, fake(other))],
        "id long, img binary",
    )
    ph = {r.id: r.phash for r in image_phash(df, "id", "img").collect()}
    assert ph[1] == ph[2]
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(ph[1], ph[3]) <= 6
    assert ham(ph[1], ph[4]) > 10


def test_image_neardup_pairs_band_join(spark):
    """The banded join must find exactly the close pairs (and a decode
    failure must drop out silently, surfacing only via image_phash's
    error column)."""
    import numpy as np

    from data_ingestors_spark.operators.multimodal import image_neardup_pairs

    rng = np.random.default_rng(11)
    w = h = 40
    a = rng.integers(0, 256, (h, w)).astype(np.uint8)
    a_noise = np.clip(a.astype(int) + rng.integers(-4, 5, a.shape), 0, 255).astype(np.uint8)
    b = rng.integers(0, 256, (h, w)).astype(np.uint8)

    def fake(arr):
        return bytearray(b"FAKEIMG:%dx%d:" % (arr.shape[1], arr.shape[0]) + arr.tobytes())

    df = spark.createDataFrame(
        [(1, fake(a)), (2, fake(a_noise)), (3, fake(b)), (4, bytearray(b"not an image"))],
        "id long, img binary",
    )
    pairs = {(r.id_a, r.id_b): r.hamming for r in image_neardup_pairs(df, "id", "img").collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 6
    assert all(k == (1, 2) for k in pairs)


def test_audio_fingerprint_stable_and_noise_tolerant(spark):
    """Spectral fingerprint: identical clips hash identically, light
    noise stays within a few bits, a different tone mix lands far."""
    import numpy as np

    from data_ingestors_spark.operators.multimodal import audio_phash

    sr = 8000
    t = np.arange(sr * 2) / sr
    rng = np.random.default_rng(3)
    a = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.3 * np.sin(2 * np.pi * 1200 * t * (1 + 0.1 * np.sin(t)))
    a_noise = a + 0.02 * rng.standard_normal(len(t))
    b = 0.5 * np.sin(2 * np.pi * 180 * t) + 0.4 * np.sin(2 * np.pi * 3000 * t) * np.sin(0.5 * t)

    def fake(x):
        pcm = (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
        return bytearray(b"FAKEAUD:%d:" % sr + pcm)

    df = spark.createDataFrame(
        [(1, fake(a)), (2, fake(a)), (3, fake(a_noise)), (4, fake(b))],
        "id long, aud binary",
    )
    ph = {r.id: r.phash for r in audio_phash(df, "id", "aud").collect()}
    ham = lambda x, y: bin(x ^ y).count("1")
    assert ph[1] == ph[2]
    assert ham(ph[1], ph[3]) <= 6
    assert ham(ph[1], ph[4]) > 10


def test_audio_neardup_pairs_band_join(spark):
    """The shared banded join must find exactly the near pair and skip
    undecodable payloads."""
    import numpy as np

    from data_ingestors_spark.operators.multimodal import audio_neardup_pairs

    sr = 8000
    t = np.arange(sr) / sr
    rng = np.random.default_rng(9)
    a = 0.6 * np.sin(2 * np.pi * 520 * t) + 0.2 * np.sin(2 * np.pi * 2000 * t)
    a2 = a + 0.015 * rng.standard_normal(len(t))
    c = 0.7 * np.sin(2 * np.pi * 90 * t) * np.sin(3 * t)

    def fake(x):
        pcm = (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
        return bytearray(b"FAKEAUD:%d:" % sr + pcm)

    df = spark.createDataFrame(
        [(1, fake(a)), (2, fake(a2)), (3, fake(c)), (4, bytearray(b"junk"))],
        "id long, aud binary",
    )
    pairs = {(r.id_a, r.id_b): r.hamming for r in audio_neardup_pairs(df, "id", "aud").collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 6
    assert all(k == (1, 2) for k in pairs)


def test_video_phash_and_neardup(spark):
    """Per-frame hash sequences align positionally; a noisy copy
    agrees on >= 80% of frames, a different video does not, and junk
    payloads drop out of the pair set."""
    import numpy as np

    from data_ingestors_spark.operators.multimodal import (
        video_neardup_pairs,
        video_phash,
    )

    rng = np.random.default_rng(21)
    w = h = 32
    n = 6
    base = rng.integers(0, 256, (n, h, w)).astype(np.uint8)
    noisy = np.clip(base.astype(int) + rng.integers(-4, 5, base.shape), 0, 255).astype(np.uint8)
    other = rng.integers(0, 256, (n, h, w)).astype(np.uint8)

    def fake(frames):
        nf, fh, fw = frames.shape
        return bytearray(b"FAKEVID:%dx%dx%d:" % (fw, fh, nf) + frames.tobytes())

    df = spark.createDataFrame(
        [(1, fake(base)), (2, fake(noisy)), (3, fake(other)), (4, bytearray(b"nope"))],
        "id long, vid binary",
    )
    hashes = video_phash(df, "id", "vid").filter("phash is not null").collect()
    assert {(r.id) for r in hashes} == {1, 2, 3}
    assert sum(1 for r in hashes if r.id == 1) == n

    pairs = {(r.id_a, r.id_b): r.agreement for r in video_neardup_pairs(df, "id", "vid").collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 0.8
    assert all(k == (1, 2) for k in pairs)


def _encode_animated_gif(w, h, palette, frames, bg=0):
    """Multi-frame GIF89a with per-frame Graphic Control Extensions:
    ``frames`` is a list of (idx_2d, left, top, disposal,
    transparent_or_None). One global color table, no local tables."""
    import numpy as np

    n = len(palette) // 3
    gct_bits = max(1, (n - 1).bit_length()) - 1
    out = bytearray(
        b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + bytes([0x80 | gct_bits, bg, 0]) + bytes(palette)
        + bytes(3 * ((1 << (gct_bits + 1)) - n))
    )
    for idx, left, top, disposal, transparent in frames:
        a = np.asarray(idx, dtype=np.uint8)
        ih, iw = a.shape
        flags = (disposal & 0x7) << 2 | (1 if transparent is not None else 0)
        out += bytes([0x21, 0xF9, 4, flags, 0, 0, transparent or 0, 0])
        out += (
            b"\x2c" + left.to_bytes(2, "little") + top.to_bytes(2, "little")
            + iw.to_bytes(2, "little") + ih.to_bytes(2, "little") + b"\x00"
        )
        mcs = max(2, gct_bits + 1)
        stream = _gif_lzw_encode(a.reshape(-1).tolist(), mcs)
        out += bytes([mcs])
        for i in range(0, len(stream), 255):
            part = stream[i : i + 255]
            out += bytes([len(part)]) + part
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def test_gif_metadata_walk_matches_decoder_without_decoding(monkeypatch):
    """video_metadata's GIF branch reads dims/frame-count from the
    logical screen descriptor + a block walk (ADVICE r12 #5): the
    result must match the full decoder's, while the LZW decode stage
    is provably never invoked (patched to raise)."""
    import numpy as np

    from data_ingestors_spark.operators.codecs import raster
    from data_ingestors_spark.operators.codecs.raster import (
        _decode_gif_frames,
        _gif_metadata,
    )

    w, h = 6, 4
    pal = bytes(b for i in range(4) for b in (40 * i, 40 * i, 40 * i))
    f0 = np.full((h, w), 1, np.uint8)
    f1 = np.full((2, 3), 2, np.uint8)
    gif = _encode_animated_gif(
        w, h, pal,
        [(f0, 0, 0, 1, None), (f1, 1, 1, 2, 3), (f0, 0, 0, 1, None)],
        bg=0,
    )
    gw, gh, n, _ = _decode_gif_frames(gif)
    assert _gif_metadata(gif) == (gw, gh, n) == (w, h, 3)

    def boom(*a, **k):  # the walk must not decode pixel data
        raise AssertionError("LZW decode invoked by metadata walk")

    monkeypatch.setattr(raster, "_gif_lzw_decode", boom)
    assert _gif_metadata(gif) == (w, h, 3)

    # truncation stays fail-loud: a cut block stream must not report
    # a frame count the decoder would not reproduce
    import pytest

    with pytest.raises(ValueError):
        _gif_metadata(gif[: len(gif) // 2])


def test_animated_gif_disposal_and_transparency(spark):
    """Animated-GIF continuation frames (the r8 verdict's stretch):
    disposal 1 (leave), 2 (restore background), 3 (restore previous)
    and GCE transparency all composite exactly; the Spark video
    sampler sees every frame."""
    import numpy as np

    from data_ingestors_spark.operators.multimodal import (
        _decode_gif,
        _decode_gif_frames,
        video_frame_sample,
    )

    w, h = 6, 4
    # palette grays: index i -> rgb (40i, 40i, 40i) => grayscale 40i
    pal = bytes(b for i in range(4) for b in (40 * i, 40 * i, 40 * i))
    f0 = np.full((h, w), 1, np.uint8)          # full screen, gray 40
    f1 = np.full((2, 3), 2, np.uint8)          # sub-rect at (1,1), gray 80
    f1[0, 0] = 3                               # transparent pixel (idx 3)
    f2 = np.full((1, 2), 3, np.uint8)          # gray 120 at (0, 0)
    gif = _encode_animated_gif(
        w, h, pal,
        [
            (f0, 0, 0, 1, None),   # leave in place
            (f1, 1, 1, 2, 3),      # transparent idx 3; then restore bg
            (f2, 0, 0, 3, None),   # then restore previous
            (f0, 0, 0, 1, None),
        ],
        bg=0,
    )
    gw, gh, n, frames = _decode_gif_frames(gif)
    assert (gw, gh, n) == (w, h, 4)

    # frame 0: all 40; identical to the single-frame decoder
    assert frames[0].tolist() == np.full((h, w), 40).tolist()
    assert _decode_gif(gif)[2].tolist() == frames[0].tolist()
    # frame 1: 80 in the (1,1)+(2x3) rect EXCEPT the transparent texel
    # which shows frame 0's 40 through
    want1 = np.full((h, w), 40)
    want1[1:3, 1:4] = 80
    want1[1, 1] = 40
    assert frames[1].tolist() == want1.tolist()
    # frame 2: disposal 2 restored f1's rect to BACKGROUND (gray 0),
    # then f2 paints 120 over (0,0)-(0,1)
    want2 = np.full((h, w), 40)
    want2[1:3, 1:4] = 0
    want2[0, 0:2] = 120
    assert frames[2].tolist() == want2.tolist()
    # frame 3: disposal 3 restored the pre-f2 canvas, then f0 repaints
    # everything to 40
    assert frames[3].tolist() == np.full((h, w), 40).tolist()

    # Spark plumbing: the video sampler fans out one row per frame
    df = spark.createDataFrame([(7, bytearray(gif))], "id long, vid binary")
    rows = video_frame_sample(df, "id", "vid", every_nth=1).collect()
    assert [r.frame_idx for r in rows] == [0, 1, 2, 3]
    assert all(r.error is None for r in rows)
    assert rows[0].width == w and rows[0].height == h
    assert abs(rows[0].mean_intensity - 40.0) < 1e-9


# --- FLAC: reference encoder (test-side) + decoder round-trips ----------
#
# The container ships no FLAC tooling, so — same pattern as the
# lossless-JPEG tests — the tests carry an independent ENCODER written
# straight from RFC 9639 and assert the decoder reproduces the source
# PCM bit-exactly across every subframe type, channel assignment,
# residual mode, and sample depth.


class _FlacBW:
    """MSB-first bit writer."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def w(self, val, bits):
        val &= (1 << bits) - 1
        self.acc = (self.acc << bits) | val
        self.n += bits
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def align(self):
        if self.n:
            self.w(0, 8 - self.n)

    def bytes(self):
        assert self.n == 0
        return bytes(self.out)


def _flac_utf8(n):
    if n < 0x80:
        return bytes([n])
    parts = []
    nbytes = 1
    while n >= (1 << (6 - nbytes)) << (6 * nbytes):
        nbytes += 1
    lead = ((0xFF00 >> (nbytes + 1)) & 0xFF) | (n >> (6 * nbytes))
    parts.append(lead)
    for i in range(nbytes - 1, -1, -1):
        parts.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(parts)


def _rice_write(bw, vals, param, rice2=False, escape=False):
    pbits = 5 if rice2 else 4
    if escape:
        bw.w((1 << pbits) - 1, pbits)
        raw = max((int(v).bit_length() + 1 for v in vals), default=0)
        bw.w(raw, 5)
        for v in vals:
            if raw:
                bw.w(int(v), raw)
        return
    bw.w(param, pbits)
    for v in vals:
        v = int(v)
        u = (v << 1) if v >= 0 else ((-v << 1) - 1)
        q = u >> param
        for _ in range(q):
            bw.w(0, 1)
        bw.w(1, 1)
        bw.w(u, param)


def _flac_subframe_write(bw, s, bps, kind, porder=0, rice2=False,
                         escape=False, wasted=0):
    s = [int(v) for v in s]
    bw.w(0, 1)  # padding
    blocksize = len(s)
    if kind == "constant":
        bw.w(0, 6)
    elif kind == "verbatim":
        bw.w(1, 6)
    elif kind.startswith("fixed"):
        order = int(kind.split(":")[1])
        bw.w(8 + order, 6)
    elif kind == "lpc":
        order = 2
        bw.w(32 + order - 1, 6)
    else:
        raise AssertionError(kind)
    if wasted:
        bw.w(1, 1)
        for _ in range(wasted - 1):
            bw.w(0, 1)
        bw.w(1, 1)
        s = [v >> wasted for v in s]
    else:
        bw.w(0, 1)
    eff = bps - wasted
    if kind == "constant":
        assert len(set(s)) == 1
        bw.w(s[0], eff)
        return
    if kind == "verbatim":
        for v in s:
            bw.w(v, eff)
        return
    if kind == "lpc":
        coefs, shift, prec = [3, -1], 1, 4
        for v in s[:order]:
            bw.w(v, eff)
        bw.w(prec - 1, 4)
        bw.w(shift, 5)
        for c in coefs:
            bw.w(c, prec)
        res = [s[i] - ((coefs[0] * s[i - 1] + coefs[1] * s[i - 2]) >> shift)
               for i in range(order, blocksize)]
    else:
        for v in s[:order]:
            bw.w(v, eff)
        res = list(np.diff(np.asarray(s, dtype=np.int64), order)) if order else s
    bw.w(1 if rice2 else 0, 2)  # residual method
    bw.w(porder, 4)
    nparts = 1 << porder
    at = 0
    for p in range(nparts):
        n = (blocksize >> porder) - (order if p == 0 else 0)
        part = res[at : at + n]
        at += n
        absmax = max((abs(int(v)) for v in part), default=0)
        param = max(0, (2 * absmax + 1).bit_length() - 4)
        param = min(param, 30 if rice2 else 14)
        _rice_write(bw, part, param, rice2=rice2, escape=escape)


def _flac_encode(channels, sr, bps, blocksize, kind="verbatim",
                 chmode="indep", porder=0, rice2=False, escape=False,
                 wasted=0, sr_code=0, extra_metadata=False):
    """RFC 9639 encoder covering the surface the decoder claims."""
    from data_ingestors_spark.operators.multimodal import (
        _flac_crc8,
        _flac_crc16,
    )

    channels = [np.asarray(c, dtype=np.int64) for c in channels]
    nch = len(channels)
    total = len(channels[0])
    si = _FlacBW()
    si.w(blocksize, 16), si.w(blocksize, 16)
    si.w(0, 24), si.w(0, 24)
    si.w(sr, 20), si.w(nch - 1, 3), si.w(bps - 1, 5)
    si.w(total, 36)
    for _ in range(16):
        si.w(0, 8)
    body = si.bytes()
    out = bytearray(b"fLaC")
    last = 0x00 if extra_metadata else 0x80
    out += bytes([last | 0]) + len(body).to_bytes(3, "big") + body
    if extra_metadata:
        pad = b"\x00" * 5
        out += bytes([0x01]) + len(pad).to_bytes(3, "big") + pad
        vc = b"\x07\x00\x00\x00tests/0\x00\x00\x00\x00"
        out += bytes([0x84]) + len(vc).to_bytes(3, "big") + vc

    frameno = 0
    for start in range(0, total, blocksize):
        frames = [c[start : start + blocksize] for c in channels]
        bs = len(frames[0])
        bw = _FlacBW()
        bw.w(0x3FFE, 14), bw.w(0, 1), bw.w(0, 1)
        bw.w(7, 4)  # blocksize: 16-bit field at header end
        bw.w(sr_code, 4)
        if chmode == "indep":
            bw.w(nch - 1, 4)
        else:
            bw.w({"LS": 8, "RS": 9, "MS": 10}[chmode], 4)
        bps_codes = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}
        bw.w(bps_codes.get(bps, 0), 3)
        bw.w(0, 1)
        for b in _flac_utf8(frameno):
            bw.w(b, 8)
        bw.w(bs - 1, 16)
        if sr_code == 13:
            bw.w(sr, 16)
        hdr = bw.bytes()
        bw2 = _FlacBW()
        for b in hdr:
            bw2.w(b, 8)
        bw2.w(_flac_crc8(hdr), 8)
        if chmode == "indep":
            subs = [(f, bps) for f in frames]
        else:
            left, right = frames
            side = left - right
            if chmode == "LS":
                subs = [(left, bps), (side, bps + 1)]
            elif chmode == "RS":
                subs = [(side, bps + 1), (right, bps)]
            else:
                mid = (left + right) >> 1
                subs = [(mid, bps), (side, bps + 1)]
        for s, sbps in subs:
            _flac_subframe_write(bw2, s, sbps, kind, porder=porder,
                                 rice2=rice2, escape=escape, wasted=wasted)
        bw2.align()
        fbody = bw2.bytes()
        bw2.w(_flac_crc16(fbody), 16)
        out += bw2.bytes()
        frameno += 1
    return bytes(out)


def _flac_decode(data):
    from data_ingestors_spark.operators.multimodal import _decode_flac

    return _decode_flac(data)


def test_flac_verbatim_roundtrip():
    rng = np.random.default_rng(7)
    pcm = rng.integers(-32768, 32768, size=700)  # 2 full + 1 short frame
    flac = _flac_encode([pcm], sr=44100, bps=16, blocksize=256)
    sr, x = _flac_decode(flac)
    assert sr == 44100 and len(x) == 700
    assert np.array_equal(np.round(x * 32768).astype(np.int64), pcm)


def test_flac_fixed_orders_exact():
    rng = np.random.default_rng(11)
    n = 512
    base = (np.cumsum(np.cumsum(rng.integers(-40, 40, size=n)))
            + rng.integers(-3, 4, size=n))
    base = np.clip(base, -30000, 30000)
    for order in range(5):
        flac = _flac_encode([base], sr=8000, bps=16, blocksize=128,
                            kind=f"fixed:{order}")
        sr, x = _flac_decode(flac)
        assert np.array_equal(np.round(x * 32768).astype(np.int64), base), order


def test_flac_lpc_exact():
    rng = np.random.default_rng(13)
    pcm = np.clip(np.cumsum(rng.integers(-50, 51, size=400)), -20000, 20000)
    flac = _flac_encode([pcm], sr=16000, bps=16, blocksize=100, kind="lpc")
    sr, x = _flac_decode(flac)
    assert sr == 16000
    assert np.array_equal(np.round(x * 32768).astype(np.int64), pcm)


def test_flac_constant_and_metadata_skip():
    pcm = np.full(300, -513)
    flac = _flac_encode([pcm], sr=22050, bps=16, blocksize=150,
                        kind="constant", extra_metadata=True)
    sr, x = _flac_decode(flac)
    assert sr == 22050
    assert np.array_equal(np.round(x * 32768).astype(np.int64), pcm)


def test_flac_stereo_modes_mono_mix():
    rng = np.random.default_rng(17)
    left = rng.integers(-30000, 30000, size=256)
    right = rng.integers(-30000, 30000, size=256)
    want = (left + right) / 2.0 / 32768.0
    for mode in ("indep", "LS", "RS", "MS"):
        flac = _flac_encode([left, right], sr=48000, bps=16, blocksize=128,
                            chmode=mode)
        sr, x = _flac_decode(flac)
        assert sr == 48000, mode
        assert np.allclose(x, want, atol=0), mode


def test_flac_rice_partitions_escape_and_rice2():
    rng = np.random.default_rng(19)
    pcm = np.clip(np.cumsum(rng.integers(-100, 101, size=512)), -25000, 25000)
    for kw in ({"porder": 2}, {"escape": True}, {"rice2": True, "porder": 1}):
        flac = _flac_encode([pcm], sr=8000, bps=16, blocksize=256,
                            kind="fixed:2", **kw)
        _, x = _flac_decode(flac)
        assert np.array_equal(np.round(x * 32768).astype(np.int64), pcm), kw


def test_flac_wasted_bits():
    rng = np.random.default_rng(23)
    pcm = rng.integers(-2048, 2048, size=200) << 3  # 3 wasted bits
    flac = _flac_encode([pcm], sr=8000, bps=16, blocksize=100, wasted=3)
    _, x = _flac_decode(flac)
    assert np.array_equal(np.round(x * 32768).astype(np.int64), pcm)


def test_flac_depths_8_and_24():
    rng = np.random.default_rng(29)
    pcm8 = rng.integers(-128, 128, size=120)
    _, x = _flac_decode(_flac_encode([pcm8], sr=8000, bps=8, blocksize=60))
    assert np.array_equal(np.round(x * 128).astype(np.int64), pcm8)
    pcm24 = rng.integers(-(1 << 23), 1 << 23, size=120)
    _, x = _flac_decode(_flac_encode([pcm24], sr=96000, bps=24, blocksize=60))
    assert np.array_equal(np.round(x * (1 << 23)).astype(np.int64), pcm24)


def test_flac_inline_sample_rate_field():
    pcm = np.arange(-50, 50)
    flac = _flac_encode([pcm], sr=12345, bps=16, blocksize=50, sr_code=13)
    sr, _ = _flac_decode(flac)
    assert sr == 12345


def test_flac_crc_fail_loud():
    pcm = np.arange(256) - 128
    flac = bytearray(_flac_encode([pcm], sr=8000, bps=16, blocksize=256))
    flac[-20] ^= 0x40  # corrupt entropy data -> CRC-16 mismatch
    with pytest.raises(ValueError, match="CRC"):
        _flac_decode(bytes(flac))


def test_flac_spark_audio_features(spark):
    rng = np.random.default_rng(31)
    pcm = rng.integers(-16000, 16000, size=800)
    flac = _flac_encode([pcm], sr=8000, bps=16, blocksize=400)
    df = spark.createDataFrame(
        [(1, bytearray(flac)), (2, bytearray(b"fLaCbroken"))],
        "id long, aud binary",
    )
    out = {r.id: r for r in audio_features(df, "id", "aud").collect()}
    assert out[1].error is None
    assert out[1].sample_rate == 8000 and out[1].n_samples == 800
    assert out[1].duration_s == pytest.approx(0.1)
    assert out[2].error is not None


def test_qm_coder_roundtrip_property():
    """Property: ANY decision sequence over ANY context assignment
    round-trips through the QM encoder/decoder pair — including long
    MPS runs (fast-path, no renorm), adversarial LPS streaks (state
    switching), and the non-adaptive fixed bin. Catches interval-
    logic and state-machine edge cases the JPEG-level tests reach
    only statistically."""
    import random

    from data_ingestors_spark.operators.multimodal import _QmBin, _QmDecoder

    rng = random.Random(97)
    for trial in range(40):
        n_bins = rng.randint(1, 6)
        seq = []
        for _ in range(rng.randint(1, 400)):
            b = rng.randrange(n_bins + 1)  # n_bins adaptive + 1 fixed
            # biased decisions exercise both long MPS runs and LPS streaks
            d = 1 if rng.random() < rng.choice((0.02, 0.5, 0.98)) else 0
            seq.append((b, d))

        def fresh_bins():
            bins = [_QmBin() for _ in range(n_bins + 1)]
            bins[n_bins].i = 113  # fixed equiprobable bin
            return bins

        enc = _QmRefEncoder()
        ebins = fresh_bins()
        for b, d in seq:
            enc.encode(ebins[b], d)
        data = enc.flush()

        dec = _QmDecoder(data)
        dbins = fresh_bins()
        got = [(b, dec.decode(dbins[b])) for b, _ in seq]
        assert got == seq, f"trial {trial}: decision stream diverged"
        # adaptive state must also track identically (same estimation)
        assert [(x.i, x.mps) for x in ebins] == [(x.i, x.mps) for x in dbins]


def test_jpeg_expand_ref_matches_loop_reference():
    """The module's vectorized Annex J.1.1.2 expansion equals the
    independent loop reference for every (eh, ev) combination and for
    odd/even dims."""
    import numpy as np

    from data_ingestors_spark.operators.multimodal import _jpeg_expand_ref

    rng = np.random.RandomState(53)
    for shape in ((1, 1), (3, 5), (4, 4), (7, 2)):
        p = rng.randint(0, 1 << 16, size=shape).astype(np.int64)
        for eh in (0, 1):
            for ev in (0, 1):
                assert np.array_equal(
                    _jpeg_expand_ref(p, eh, ev), _expand2(p, eh, ev)
                ), (shape, eh, ev)


# --- r11: closing the T.81 SOF matrix (SOF6 / SOF11 / SOF13-15) ---------


def _qm_encode_diff(enc, st, ca, cb, L, U, diff):
    """Mirror of the decoder's lossless-mode DIFF tree
    (_jpeg_arith_decode_diff): 25 two-neighbour contexts x 4 bins +
    two 30-bin magnitude areas selected by Db's class."""
    base = 4 * (5 * ca + cb)
    if diff == 0:
        enc.encode(st[base], 0)
        return
    enc.encode(st[base], 1)
    sign = 1 if diff < 0 else 0
    enc.encode(st[base + 1], sign)
    t = abs(diff) - 1
    if t == 0:
        enc.encode(st[base + 2 + sign], 0)
        m, pos = 0, base + 2 + sign
    else:
        enc.encode(st[base + 2 + sign], 1)
        m, pos = 1, 100 + (30 if cb >= 3 else 0)
        while (m << 1) <= t:
            enc.encode(st[pos], 1)
            m <<= 1
            pos += 1
        enc.encode(st[pos], 0)
    pos += 15
    mm = m
    while mm > 1:
        mm >>= 1
        enc.encode(st[pos], 1 if t & mm else 0)


def _encode_jpeg_lossless_arith(planes, prec=8, sel=1, pt=0, *,
                                differential=False, restart=0):
    """Reference ARITHMETIC lossless JPEG encoder — SOF11, or SOF15
    (``differential``: each sample codes the mod-2^16 correction with
    predictor 0) — driving the bignum QM encoder with the same
    two-neighbour conditioning the decoder rebuilds. Statistics, the
    coder, and the prediction chain reset per restart segment; the
    data-derived class planes persist (both sides recompute them)."""
    import struct

    import numpy as np

    from data_ingestors_spark.operators.multimodal import (
        _jpeg_diff_class,
        _QmBin,
    )

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    def stuff(b: bytes) -> bytes:
        return b.replace(b"\xff", b"\xff\x00")

    L, U = 0, 1
    h, w = planes[0].shape
    nc = len(planes)
    shifted = [(np.asarray(p).astype(np.int64) >> pt) for p in planes]
    default = 1 << (prec - pt - 1)
    cls = [np.zeros((h, w), dtype=np.int8) for _ in range(nc)]

    def pred_at(p, r, c, fresh):
        if differential:
            return 0
        if fresh:
            return default
        if r == 0:
            return int(p[r, c - 1])
        if c == 0:
            return int(p[r - 1, c])
        ra, rb, rc = int(p[r, c - 1]), int(p[r - 1, c]), int(p[r - 1, c - 1])
        return (ra, rb, rc, ra + rb - rc, ra + ((rb - rc) >> 1),
                rb + ((ra - rc) >> 1), (ra + rb) >> 1)[sel - 1]

    body = bytearray()
    i = 0
    rst = 0
    units = h * w
    while i < units:
        n_seg = min(restart, units - i) if restart else units
        if restart and i:
            body += bytes([0xFF, 0xD0 + ((rst - 1) % 8)])
        enc = _QmRefEncoder()
        # ONE stats area: every component's SOS entry carries table id
        # 0, and T.81 statistics are per table destination, not per
        # component — the decoder shares accordingly. Conditioning
        # classes stay per component.
        st = [_QmBin() for _ in range(160)]
        fresh = [True] * nc
        for unit in range(i, i + n_seg):
            r, c = divmod(unit, w)
            for ci in range(nc):
                p = shifted[ci]
                pred = pred_at(p, r, c, fresh[ci])
                fresh[ci] = False
                v = (int(p[r, c]) - pred) & 0xFFFF
                signed = v - 65536 if v > 32768 else v
                ca = int(cls[ci][r, c - 1]) if c > 0 else 0
                cb = int(cls[ci][r - 1, c]) if r > 0 else 0
                _qm_encode_diff(enc, st, ca, cb, L, U, signed)
                cls[ci][r, c] = _jpeg_diff_class(signed, L, U)
        body += stuff(enc.flush())
        i += n_seg
        rst += 1

    sof = bytes([prec]) + struct.pack(">HH", h, w) + bytes([nc])
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])
    out = b"\xff\xd8" + seg(0xCF if differential else 0xCB, sof)
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    sos = bytes([nc]) + b"".join(bytes([ci + 1, 0x00]) for ci in range(nc))
    sos += bytes([0 if differential else sel, 0, pt])
    return out + seg(0xDA, sos) + bytes(body) + b"\xff\xd9"


def test_lossless_arith_jpeg_sof11_roundtrip_all_predictors():
    """ARITHMETIC lossless JPEG (SOF11): bit-exact for every Annex H
    predictor 1-7 on random 8-bit data."""
    import numpy as np

    from data_ingestors_spark.operators.multimodal import _decode_jpeg

    rng = np.random.RandomState(41)
    gray = rng.randint(0, 256, size=(11, 17)).astype(np.uint8)
    for sel in range(1, 8):
        w, h, arr = _decode_jpeg(_encode_jpeg_lossless_arith([gray], sel=sel))
        assert (w, h) == (17, 11)
        assert np.array_equal(arr, gray), f"predictor {sel}"


def test_lossless_arith_jpeg_sof11_restart_and_pt():
    """SOF11 with a restart interval (stats/coder/prediction reset per
    segment, conditioning classes persist) and a point transform."""
    import numpy as np

    from data_ingestors_spark.operators.multimodal import _decode_jpeg

    rng = np.random.RandomState(43)
    gray = rng.randint(0, 256, size=(9, 13)).astype(np.uint8)
    w, h, arr = _decode_jpeg(
        _encode_jpeg_lossless_arith([gray], restart=29)
    )
    assert (w, h) == (13, 9) and np.array_equal(arr, gray)
    pt = 2
    w, h, arr = _decode_jpeg(_encode_jpeg_lossless_arith([gray], pt=pt))
    # decoder renders (x >> pt) << pt
    assert np.array_equal(arr, (gray >> pt) << pt)


def test_lossless_arith_jpeg_sof11_16bit_precision():
    """SOF11 at 16-bit precision: wide DIFF magnitudes walk deep into
    the X chain; still bit-exact (rendered through the gray8 shift)."""
    import numpy as np

    from data_ingestors_spark.operators.multimodal import _decode_jpeg

    rng = np.random.RandomState(47)
    plane = rng.randint(0, 1 << 16, size=(7, 9)).astype(np.int64)
    w, h, arr = _decode_jpeg(_encode_jpeg_lossless_arith([plane], prec=16))
    assert (w, h) == (9, 7)
    assert np.array_equal(arr, (plane >> 8).astype(np.uint8))


def _hier_parts(ref):
    """SOI + DHP + full-resolution lossless first frame coding ``ref``,
    for composing single-correction hierarchical fixtures."""
    import struct

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    h, w = ref.shape
    dhp = bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
    frame1 = _encode_jpeg_lossless([ref], sel=1)[2:-2]
    return b"\xff\xd8" + seg(0xDE, dhp) + frame1, seg


def _dct_diff_expected(ref, diff):
    """Independent numpy oracle: quantized (qval=1) DCT of the
    correction, dequantize+IDCT, add to ref, clip — plus the zigzag
    coefficient blocks the encoders code."""
    import numpy as np

    from data_ingestors_spark.operators.multimodal import (
        JPEG_ZIGZAG,
        _jpeg_idct_matrix,
    )

    A = _jpeg_idct_matrix()
    h, w = diff.shape
    expected = np.zeros((h, w), dtype=np.int64)
    blocks = []
    for my in range(h // 8):
        for mx in range(w // 8):
            block = diff[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8].astype(np.float64)
            Fq = np.rint(A @ block @ A.T).astype(int)
            expected[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = np.rint(
                A.T @ Fq.astype(np.float64) @ A
            ).astype(np.int64)
            blocks.append([int(Fq[r, c]) for (r, c) in JPEG_ZIGZAG])
    want = np.clip(ref.astype(np.int64) + expected, 0, 255).astype(np.uint8)
    return blocks, want


def test_hierarchical_jpeg_differential_progressive_sof6():
    """Annex J with a DIFFERENTIAL PROGRESSIVE (SOF6) correction
    frame: a DC scan then an AC spectral-selection scan accumulate
    into the same coefficient grids; IDCT without level shift adds to
    the reference. Oracle: independent numpy reconstruction."""
    import struct

    import numpy as np

    from data_ingestors_spark.operators.multimodal import _decode_jpeg

    rng = np.random.RandomState(53)
    ref = rng.randint(60, 190, size=(16, 16)).astype(np.uint8)
    diff = rng.randint(-12, 13, size=(16, 16)).astype(np.int64)
    head, seg = _hier_parts(ref)
    blocks, want = _dct_diff_expected(ref, diff)

    dc = _jpeg_canonical(_JPEG_DC_COUNTS, _JPEG_DC_SYMBOLS)
    ac = _jpeg_canonical(_JPEG_AC_COUNTS, _JPEG_AC_SYMBOLS)

    # DC scan (Ss=0 Se=0 Ah=0 Al=0), prediction across blocks
    wr_dc = _JpegWriter()
    pred = 0
    for zz in blocks:
        d = zz[0] - pred
        pred = zz[0]
        s = 0 if d == 0 else abs(d).bit_length()
        code, width = dc[s]
        wr_dc.put(code, width)
        if s:
            wr_dc.put(d if d >= 0 else d + (1 << s) - 1, s)
    wr_dc.align()

    # AC scan (Ss=1 Se=63 Ah=0 Al=0), EOB = 0x00 run
    wr_ac = _JpegWriter()
    for zz in blocks:
        run = 0
        kend = max((k for k in range(1, 64) if zz[k]), default=0)
        for k in range(1, kend + 1):
            v = zz[k]
            if v == 0:
                run += 1
                continue
            while run >= 16:
                code, width = ac[0xF0]
                wr_ac.put(code, width)
                run -= 16
            s = abs(v).bit_length()
            code, width = ac[(run << 4) | s]
            wr_ac.put(code, width)
            wr_ac.put(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if kend < 63:
            code, width = ac[0x00]
            wr_ac.put(code, width)
    wr_ac.align()

    qtab = bytes([0]) + bytes([1] * 64)
    sof6 = bytes([8]) + struct.pack(">HH", 16, 16) + bytes([1, 1, 0x11, 0])
    dht = (
        bytes([0x00]) + _JPEG_DC_COUNTS + _JPEG_DC_SYMBOLS
        + bytes([0x10]) + _JPEG_AC_COUNTS + _JPEG_AC_SYMBOLS
    )
    payload = (
        head
        + seg(0xDB, qtab)
        + seg(0xC6, sof6)
        + seg(0xC4, dht)
        + seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0])) + bytes(wr_dc.out)
        + seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0])) + bytes(wr_ac.out)
        + b"\xff\xd9"
    )
    w, h, arr = _decode_jpeg(payload)
    assert (w, h) == (16, 16)
    assert np.array_equal(arr, want)


def test_hierarchical_jpeg_arith_differential_sequential_sof13():
    """Annex J with an ARITHMETIC differential sequential (SOF13)
    correction frame: QM-coded full-band blocks, IDCT without level
    shift, added to the reference."""
    import struct

    import numpy as np

    from data_ingestors_spark.operators.multimodal import _decode_jpeg, _QmBin

    rng = np.random.RandomState(59)
    ref = rng.randint(60, 190, size=(16, 16)).astype(np.uint8)
    diff = rng.randint(-12, 13, size=(16, 16)).astype(np.int64)
    head, seg = _hier_parts(ref)
    blocks, want = _dct_diff_expected(ref, diff)

    enc = _QmRefEncoder()
    dcs = [_QmBin() for _ in range(64)]
    acs = [_QmBin() for _ in range(256)]
    fixed = _QmBin()
    fixed.i = 113
    dc_ctx, last_dc = [0], [0]
    for zz in blocks:
        _qm_encode_dc(enc, dcs, 0, dc_ctx, last_dc, 0, 1, zz[0])
        _qm_encode_ac(enc, acs, fixed, zz, 5)
    body = enc.flush().replace(b"\xff", b"\xff\x00")

    qtab = bytes([0]) + bytes([1] * 64)
    sof13 = bytes([8]) + struct.pack(">HH", 16, 16) + bytes([1, 1, 0x11, 0])
    payload = (
        head
        + seg(0xDB, qtab)
        + seg(0xCD, sof13)
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0])) + body
        + b"\xff\xd9"
    )
    w, h, arr = _decode_jpeg(payload)
    assert (w, h) == (16, 16)
    assert np.array_equal(arr, want)


def test_hierarchical_jpeg_arith_differential_progressive_sof14():
    """Annex J with an ARITHMETIC differential progressive (SOF14)
    correction frame: QM DC scan + QM AC spectral-selection scan
    (statistics fresh per scan segment, like SOF10)."""
    import struct

    import numpy as np

    from data_ingestors_spark.operators.multimodal import _decode_jpeg, _QmBin

    rng = np.random.RandomState(61)
    ref = rng.randint(60, 190, size=(16, 16)).astype(np.uint8)
    diff = rng.randint(-12, 13, size=(16, 16)).astype(np.int64)
    head, seg = _hier_parts(ref)
    blocks, want = _dct_diff_expected(ref, diff)

    enc1 = _QmRefEncoder()
    dcs = [_QmBin() for _ in range(64)]
    dc_ctx, last_dc = [0], [0]
    for zz in blocks:
        _qm_encode_dc(enc1, dcs, 0, dc_ctx, last_dc, 0, 1, zz[0])
    dc_body = enc1.flush().replace(b"\xff", b"\xff\x00")

    enc2 = _QmRefEncoder()
    acs = [_QmBin() for _ in range(256)]
    fixed = _QmBin()
    fixed.i = 113
    for zz in blocks:
        _qm_encode_ac_first(enc2, acs, fixed, zz, 5, 1, 63)
    ac_body = enc2.flush().replace(b"\xff", b"\xff\x00")

    qtab = bytes([0]) + bytes([1] * 64)
    sof14 = bytes([8]) + struct.pack(">HH", 16, 16) + bytes([1, 1, 0x11, 0])
    payload = (
        head
        + seg(0xDB, qtab)
        + seg(0xCE, sof14)
        + seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0])) + dc_body
        + seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0])) + ac_body
        + b"\xff\xd9"
    )
    w, h, arr = _decode_jpeg(payload)
    assert (w, h) == (16, 16)
    assert np.array_equal(arr, want)


def test_hierarchical_jpeg_arith_differential_lossless_sof15():
    """Full Annex J pyramid with an ARITHMETIC differential lossless
    (SOF15) correction frame: half-res SOF3 reference + EXP(1,1) +
    SOF15 coding (source - expanded ref) mod 2^16 — reconstruction is
    BIT-EXACT, including odd dims."""
    import struct

    import numpy as np

    from data_ingestors_spark.operators.multimodal import _decode_jpeg

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    rng = np.random.RandomState(67)
    for shape in ((12, 16), (13, 19)):
        gray = rng.randint(0, 256, size=shape).astype(np.uint8)
        h, w = shape
        down = gray[::2, ::2]
        frame1 = _encode_jpeg_lossless([down], sel=1)[2:-2]
        up = _expand2(down.astype(np.int64), 1, 1)[:h, :w]
        diff = (gray.astype(np.int64) - up) & 0xFFFF
        frame2 = _encode_jpeg_lossless_arith(
            [diff], differential=True
        )[2:-2]
        dhp = bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
        payload = (
            b"\xff\xd8" + seg(0xDE, dhp) + frame1
            + seg(0xDF, bytes([0x11])) + frame2 + b"\xff\xd9"
        )
        ww, hh, arr = _decode_jpeg(payload)
        assert (ww, hh) == (w, h)
        assert np.array_equal(arr, gray), shape


# --- r11: MS Video 1 (MS-CRAM) — real inter-frame video decode ----------


def _msvc_encode_frame(frame, prev, bw, bh):
    """Encode one padded frame vs the previous padded frame as MS
    Video 1 block opcodes (skip runs / 1-color / 2-color / 8-color),
    choosing color order so the byte_b mode ranges hold."""
    data = bytearray()
    skip = 0

    def flush_skip():
        nonlocal skip
        while skip:
            run = min(skip, 0x3FF)
            word = 0x8400 + run
            data.append(word & 0xFF)
            data.append(word >> 8)
            skip -= run

    for blk in range(bw * bh):
        by, bx = divmod(blk, bw)
        y0 = (bh - 1 - by) * 4
        x0 = bx * 4
        cur = frame[y0:y0 + 4, x0:x0 + 4]
        if (cur == prev[y0:y0 + 4, x0:x0 + 4]).all():
            skip += 1
            continue
        flush_skip()
        # decode-order pixel list: rows bottom-up, x left->right
        seq = [int(cur[3 - ry, rx]) for ry in range(4) for rx in range(4)]
        uniq = sorted(set(seq))
        if len(uniq) == 1:
            data.append(uniq[0])
            data.append(0x80)
            continue
        if len(uniq) == 2:
            # flag bit 1 selects the FIRST color; force the last
            # decode-order pixel's bit to 0 so byte_b < 0x80
            c1 = seq[15]
            c0 = uniq[0] if uniq[1] == c1 else uniq[1]
            flags = 0
            for i, v in enumerate(seq):
                if v == c0:
                    flags |= 1 << i
            assert flags < 0x8000
            data += bytes([flags & 0xFF, flags >> 8, c0, c1])
            continue
        # 8-color: a color pair per 2x2 quadrant (bottom-left,
        # bottom-right, top-left, top-right in decode order)
        pairs = []
        for q in range(4):
            qpix = [seq[i] for i in range(16)
                    if 2 * ((i // 4) // 2) + (i % 4) // 2 == q]
            qu = sorted(set(qpix))
            assert len(qu) <= 2, "fixture block must be <=2 colors per quadrant"
            pairs.append([qu[0], qu[-1]])
        # force byte_b >= 0x90: bit15 (pixel ry=3,rx=3, q3) = 1, and
        # bit12 (ry=3, rx=0, q2) = 1
        if pairs[3][0] != seq[15]:
            pairs[3] = [pairs[3][1], pairs[3][0]]
        if pairs[2][0] != seq[12]:
            pairs[2] = [pairs[2][1], pairs[2][0]]
        flags = 0
        for i, v in enumerate(seq):
            q = 2 * ((i // 4) // 2) + (i % 4) // 2
            if v == pairs[q][0]:
                flags |= 1 << i
        assert (flags >> 8) >= 0x90, hex(flags)
        data += bytes([flags & 0xFF, flags >> 8])
        for p in pairs:
            data += bytes(p)
    # trailing skips: end-of-frame is implicit (decoder keeps prev)
    return bytes(data)


def _encode_msvideo1_avi(frames, palette=None):
    """Reference MS Video 1 AVI: minimal RIFF with an avih/strl
    header (fccHandler CRAM, strf BITMAPINFOHEADER + optional
    RGBQUAD palette) and one 00dc chunk per frame."""
    import struct

    import numpy as np

    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w = frames.shape
    bw, bh = -(-w // 4), -(-h // 4)
    padded = np.zeros((n, bh * 4, bw * 4), dtype=np.uint8)
    padded[:, :h, :w] = frames
    prev = np.zeros((bh * 4, bw * 4), dtype=np.uint8)
    chunks = []
    for f in padded:
        chunks.append(_msvc_encode_frame(f, prev, bw, bh))
        prev = f

    def chunk(cid, payload):
        return cid + struct.pack("<I", len(payload)) + payload + (
            b"\x00" if len(payload) & 1 else b""
        )

    def lst(kind, payload):
        return chunk(b"LIST", kind + payload)

    pal = b""
    n_colors = 0
    if palette is not None:
        n_colors = len(palette)
        pal = b"".join(bytes([b_, g, r, 0]) for r, g, b_ in palette)
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 8, b"CRAM", 0, 0, 0, n_colors, 0
    ) + pal
    strh = (
        b"vids" + b"CRAM" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, 10,
                                        0, n, 0, 0, 0, 0)
    )
    avih = struct.pack("<IIIIIIIIIIIIII", 100000, 0, 0, 0, n, 0, 1, 0, w, h,
                       0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", c) for c in chunks))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_msvideo1_interframe_bit_exact():
    """MS Video 1 (CRAM): multi-frame reconstruction is BIT-EXACT,
    and the inter-frame skip path is actually exercised (frame 2
    changes only a sprite region, so its chunk is dominated by skip
    opcodes and is far smaller than a keyframe)."""
    import numpy as np

    from data_ingestors_spark.operators.multimodal import _decode_video

    rng = np.random.RandomState(71)
    h, w = 13, 18  # non-multiples of 4: exercise pad + crop
    f0 = np.zeros((h, w), dtype=np.uint8)
    # 2-color texture + a solid band
    f0[:6] = np.where(rng.rand(6, w) < 0.5, 40, 200).astype(np.uint8)
    f0[6:] = 90
    f1 = f0.copy()
    f1[8:12, 3:9] = 250          # moving sprite: small change only
    f2 = f1.copy()
    f2[8:12, 3:9] = 90           # sprite leaves
    f2[8:12, 9:15] = 250
    payload = _encode_msvideo1_avi([f0, f1, f2])
    ww, hh, nn, frames = _decode_video(payload)
    assert (ww, hh, nn) == (w, h, 3)
    assert np.array_equal(frames, np.stack([f0, f1, f2]))
    # the delta frames must be much smaller than the keyframe
    import struct as _s

    sizes = []
    pos = payload.find(b"00dc")
    while pos != -1:
        sizes.append(_s.unpack("<I", payload[pos + 4:pos + 8])[0])
        pos = payload.find(b"00dc", pos + 8)
    assert len(sizes) == 3
    assert sizes[1] < sizes[0] / 2 and sizes[2] < sizes[0] / 2, sizes


def test_msvideo1_eight_color_quadrants():
    """8-color blocks (a color pair per 2x2 quadrant) decode exactly."""
    import numpy as np

    from data_ingestors_spark.operators.multimodal import _decode_video

    rng = np.random.RandomState(73)
    h = w = 8
    f = np.zeros((h, w), dtype=np.uint8)
    # per 2x2 quadrant of each 4x4 block: two colors, random pattern
    for by in range(2):
        for bx in range(2):
            for qy in range(2):
                for qx in range(2):
                    c = rng.randint(0, 256, size=2)
                    patch = np.where(rng.rand(2, 2) < 0.5, c[0], c[1])
                    f[by * 4 + qy * 2: by * 4 + qy * 2 + 2,
                      bx * 4 + qx * 2: bx * 4 + qx * 2 + 2] = patch
    ww, hh, nn, frames = _decode_video(_encode_msvideo1_avi([f]))
    assert (ww, hh, nn) == (8, 8, 1)
    assert np.array_equal(frames[0], f)


def test_msvideo1_palette_maps_indices():
    """A non-identity strf palette maps indices through BT.601 luma;
    a grayscale-identity palette is a no-op."""
    import numpy as np

    from data_ingestors_spark.operators.multimodal import _decode_video

    f = np.array([[0, 1, 2, 3]] * 4, dtype=np.uint8)
    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)]
    _, _, _, frames = _decode_video(_encode_msvideo1_avi([f], palette=pal))
    want = np.array(
        [(77 * r + 150 * g + 29 * b + 128) >> 8 for r, g, b in pal],
        dtype=np.uint8,
    )[f]
    assert np.array_equal(frames[0], want)
    ident = [(i, i, i) for i in range(4)]
    _, _, _, frames2 = _decode_video(_encode_msvideo1_avi([f], palette=ident))
    assert np.array_equal(frames2[0], f)


def test_msvideo1_unknown_codec_fail_loud():
    """An AVI whose strf fourcc is a modern codec stays fail-loud."""
    import numpy as np
    import pytest

    from data_ingestors_spark.operators.multimodal import _decode_video

    payload = _encode_msvideo1_avi([np.zeros((4, 4), dtype=np.uint8)])
    h264 = payload.replace(b"CRAM", b"H264")
    with pytest.raises(NotImplementedError, match="H264"):
        _decode_video(h264)


def test_msvideo1_zero_word_is_end_of_frame():
    """The de-facto CRAM end-of-frame marker: a (0,0) byte pair
    outside a skip run ends the frame; remaining blocks keep the
    previous frame's content (FFmpeg msvideo1 semantics — the in-repo
    encoder never emits it, so this is hand-crafted; ADVICE r12 #3).
    Contrast case: inside a 2-color block, 00 00 COLOR bytes are
    legal data and must NOT terminate."""
    import numpy as np

    from data_ingestors_spark.operators.codecs.video import _msvideo1_frame

    prev = np.full((8, 8), 9, dtype=np.uint8)
    # block 0 painted solid 77 (1-color op), then explicit (0,0) EOF
    # with three blocks remaining
    data = bytes([77, 0x80, 0x00, 0x00, 55, 0x80])
    out = _msvideo1_frame(data, prev, blocks_w=2, blocks_h=2)
    want = prev.copy()
    want[4:8, 0:4] = 77  # block 0 is the bottom-left 4x4
    assert np.array_equal(out, want)  # trailing 55-block never decoded

    # a 2-color block whose COLOR bytes are (0,0) is not an EOF: the
    # flags word selects only color[1] (=0), so the block goes black
    # and decoding continues into the next block
    data2 = bytes([0x00, 0x40, 0x00, 0x00, 66, 0x80])
    out2 = _msvideo1_frame(data2, prev, blocks_w=2, blocks_h=2)
    want2 = prev.copy()
    want2[4:8, 0:4] = 0   # 2-color block, both colors 0
    want2[4:8, 4:8] = 66  # next block decoded: no false EOF
    assert np.array_equal(out2, want2)


# --- r11: MS ADPCM (WAV fmt 0x0002) --------------------------------------


def _make_msadpcm_wav(blocks, nch, sr=8000, block_align=None, fact=None):
    """Minimal RIFF/WAVE wrapper around raw MS ADPCM block bytes."""
    import struct

    data = b"".join(blocks)
    block_align = block_align or (len(blocks[0]) if blocks else 7 * nch)
    fmt = struct.pack("<HHIIHH", 0x0002, nch, sr, sr, block_align, 4)
    out = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if fact is not None:
        out += b"fact" + struct.pack("<II", 4, fact)
    out += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(out) + 4) + b"WAVE" + out


def _msadpcm_ref_decode(block, nch):
    """Independent per-sample reference decode of ONE MS ADPCM block
    (plain Python loop, no vectorization) → per-channel lists."""
    coef1 = [256, 512, 0, 192, 240, 460, 392]
    coef2 = [0, -256, 0, 64, 0, -208, -232]
    adapt = [230, 230, 230, 230, 307, 409, 512, 614,
             768, 614, 512, 409, 307, 230, 230, 230]

    def i16(b, pos):
        v = b[pos] | (b[pos + 1] << 8)
        return v - 65536 if v >= 32768 else v

    pidx = [min(block[c], 6) for c in range(nch)]
    off = nch
    delta = [i16(block, off + 2 * c) for c in range(nch)]
    s1 = [i16(block, off + 2 * nch + 2 * c) for c in range(nch)]
    s2 = [i16(block, off + 4 * nch + 2 * c) for c in range(nch)]
    chans = [[s2[c], s1[c]] for c in range(nch)]
    nibs = []
    for byte in block[7 * nch:]:
        nibs.append(byte >> 4)
        nibs.append(byte & 0xF)
    nibs = nibs[: (len(nibs) // nch) * nch]
    for i, n in enumerate(nibs):
        c = i % nch
        signed = n - 16 if n >= 8 else n
        pred = (s1[c] * coef1[pidx[c]] + s2[c] * coef2[pidx[c]]) >> 8
        new = max(-32768, min(32767, pred + delta[c] * signed))
        s2[c], s1[c] = s1[c], new
        delta[c] = max(16, (adapt[n] * delta[c]) >> 8)
        chans[c].append(new)
    return chans


def test_ms_adpcm_matches_reference_loop():
    """The vectorized MS ADPCM decode equals an independent scalar
    reference over random blocks — mono and stereo, multi-block."""
    import numpy as np

    from data_ingestors_spark.operators.multimodal import _decode_audio

    rng = np.random.RandomState(79)
    for nch in (1, 2):
        blocks = []
        want = []
        for _ in range(3):
            hdr = bytes([rng.randint(0, 7) for _ in range(nch)])
            hdr += bytes(rng.randint(0, 256, size=6 * nch).tolist())
            body = bytes(rng.randint(0, 256, size=16 * nch).tolist())
            block = hdr + body
            blocks.append(block)
            chans = _msadpcm_ref_decode(block, nch)
            want.extend(
                sum(chans[c][k] for c in range(nch)) / nch
                for k in range(len(chans[0]))
            )
        sr, x = _decode_audio(_make_msadpcm_wav(blocks, nch))
        assert sr == 8000
        np.testing.assert_allclose(x * 32768.0, np.array(want), atol=1e-9)


def test_ms_adpcm_fact_trim_and_audio_quality():
    """A greedily-encoded sine wave survives the lossy round-trip with
    small error, and the fact chunk trims to the true sample count."""
    import numpy as np

    from data_ingestors_spark.operators.multimodal import _decode_audio

    n = 130
    t = np.arange(n)
    sig = (12000 * np.sin(2 * np.pi * t / 37.0)).astype(np.int64)

    # greedy reference ENCODER: predictor 1 (coef 512,-256 — linear
    # extrapolation, right for a smooth sine), initial delta sized to
    # the signal's per-sample slope; track the decoder's
    # reconstruction so drift can't accumulate
    coef1, coef2 = 512, -256
    adapt = [230, 230, 230, 230, 307, 409, 512, 614,
             768, 614, 512, 409, 307, 230, 230, 230]
    s2, s1, delta = int(sig[0]), int(sig[1]), 256
    hdr = bytes([1])
    hdr += bytes([delta & 0xFF, delta >> 8])
    hdr += bytes([s1 & 0xFF, (s1 >> 8) & 0xFF])
    hdr += bytes([s2 & 0xFF, (s2 >> 8) & 0xFF])
    nibs = []
    for v in sig[2:]:
        pred = (s1 * coef1 + s2 * coef2) >> 8
        q = max(-8, min(7, int(round((int(v) - pred) / delta))))
        new = max(-32768, min(32767, pred + delta * q))
        nibs.append(q & 0xF)
        s2, s1 = s1, new
        delta = max(16, (adapt[q & 0xF] * delta) >> 8)
    if len(nibs) % 2:
        nibs.append(0)  # pad nibble; fact trims it
    body = bytes((nibs[i] << 4) | nibs[i + 1] for i in range(0, len(nibs), 2))
    wav = _make_msadpcm_wav([hdr + body], 1, fact=n)
    sr, x = _decode_audio(wav)
    assert len(x) == n
    err = np.abs(x * 32768.0 - sig)
    assert err.max() < 900, err.max()  # lossy but close (< 3% of amplitude)


def test_lossless_arith_jpeg_sof11_interleaved_components():
    """SOF11 with THREE interleaved components sharing one stats
    table (all SOS entries carry table 0; T.81 statistics are per
    table destination while conditioning classes are per component):
    the rendered luma plane — component of the first scan entry —
    round-trips bit-exactly."""
    import numpy as np

    from data_ingestors_spark.operators.multimodal import _decode_jpeg

    rng = np.random.RandomState(83)
    planes = [rng.randint(0, 256, size=(6, 11)).astype(np.uint8) for _ in range(3)]
    w, h, arr = _decode_jpeg(_encode_jpeg_lossless_arith(planes, sel=4))
    assert (w, h) == (11, 6)
    assert np.array_equal(arr, planes[0])


# --- r11: MS-RLE8 (BI_RLE8 in AVI) ---------------------------------------


def _encode_msrle8_avi(frames, palette=None):
    """Reference BI_RLE8 AVI: unchanged rows are skipped with bare
    end-of-line opcodes (inter-frame: the decoder keeps the previous
    frame's pixels), changed rows use RLE runs and absolute literals."""
    import struct

    import numpy as np

    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w = frames.shape
    prev = np.zeros((h, w), dtype=np.uint8)
    chunks = []
    for f in frames:
        data = bytearray()
        for row in range(h):  # bottom-up
            y = h - 1 - row
            line = f[y]
            if (line == prev[y]).all():
                data += b"\x00\x00"  # EOL: whole row keeps prev content
                continue
            x = 0
            while x < w:
                run = 1
                while x + run < w and line[x + run] == line[x] and run < 255:
                    run += 1
                if run >= 3 or run == w - x:
                    data += bytes([run, line[x]])
                    x += run
                else:
                    lit = x + 1
                    best = 1
                    while lit < w and best < 255:
                        r2 = 1
                        while lit + r2 < w and line[lit + r2] == line[lit] and r2 < 3:
                            r2 += 1
                        if r2 >= 3:
                            break
                        lit += 1
                        best = lit - x
                    nlit = lit - x
                    if nlit >= 3:
                        data += bytes([0, nlit]) + bytes(line[x:lit].tolist())
                        if nlit & 1:
                            data += b"\x00"
                        x = lit
                    else:
                        data += bytes([1, line[x]])
                        x += 1
            data += b"\x00\x00"  # EOL
        data += b"\x00\x01"  # end of bitmap
        chunks.append(bytes(data))
        prev = f

    def chunk(cid, payload):
        return cid + struct.pack("<I", len(payload)) + payload + (
            b"\x00" if len(payload) & 1 else b""
        )

    def lst(kind, payload):
        return chunk(b"LIST", kind + payload)

    pal = b""
    n_colors = 0
    if palette is not None:
        n_colors = len(palette)
        pal = b"".join(bytes([b_, g, r, 0]) for r, g, b_ in palette)
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 1, 0, 0, 0, n_colors, 0) + pal
    strh = b"vids" + b"MRLE" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, 10,
                                           0, n, 0, 0, 0, 0)
    avih = struct.pack("<IIIIIIIIIIIIII", 100000, 0, 0, 0, n, 0, 1, 0, w, h,
                       0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", c) for c in chunks))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_msrle8_interframe_bit_exact():
    """BI_RLE8 AVI: runs, absolute literals, and skipped-row
    inter-frame reconstruction are all bit-exact; delta frames are
    smaller than the keyframe."""
    import struct as _s

    import numpy as np

    from data_ingestors_spark.operators.multimodal import _decode_video

    rng = np.random.RandomState(89)
    h, w = 11, 23
    f0 = np.zeros((h, w), dtype=np.uint8)
    f0[:4] = rng.randint(0, 255, size=(4, w))      # literal-heavy rows
    f0[4:8] = 77                                    # run-heavy rows
    f0[8:] = np.repeat(rng.randint(0, 255, size=(3, 5)), 5, axis=1)[:, :w]
    f1 = f0.copy()
    f1[5:7, 4:19] = 200                             # small change
    payload = _encode_msrle8_avi([f0, f1])
    ww, hh, nn, frames = _decode_video(payload)
    assert (ww, hh, nn) == (w, h, 2)
    assert np.array_equal(frames, np.stack([f0, f1]))
    sizes = []
    pos = payload.find(b"00dc")
    while pos != -1:
        sizes.append(_s.unpack("<I", payload[pos + 4:pos + 8])[0])
        pos = payload.find(b"00dc", pos + 8)
    assert sizes[1] < sizes[0] / 2, sizes


def test_msrle8_delta_opcode_skips_pixels():
    """The 00 02 (dx, dy) delta opcode jumps the write position; the
    jumped-over pixels keep the previous frame's content."""
    import struct

    import numpy as np

    from data_ingestors_spark.operators.multimodal import _decode_video

    # hand-build: frame 1 fills 8x8 with 50 (8 runs + EOLs); frame 2:
    # one run of 2 at the bottom-left, delta right 3 / up 2, a run of
    # 2 of value 9, then EOB — everything else keeps frame 1.
    f1_rows = (bytes([8, 50]) + b"\x00\x00") * 8 + b"\x00\x01"
    f2 = bytes([2, 7]) + b"\x00\x02" + bytes([3, 2]) + bytes([2, 9]) + b"\x00\x01"
    base = _encode_msrle8_avi([np.zeros((8, 8), dtype=np.uint8)])
    # replace the single generated chunk with our two hand-built ones
    head, movi_kw, _rest = base.partition(b"LIST")
    def chunk(cid, payload):
        return cid + struct.pack("<I", len(payload)) + payload + (
            b"\x00" if len(payload) & 1 else b"")
    movi = chunk(b"LIST", b"movi" + chunk(b"00dc", f1_rows) + chunk(b"00dc", f2))
    # head still contains the hdrl LIST; base layout: RIFF(AVI hdrl movi)
    hdrl_end = base.find(b"LIST", base.find(b"hdrl"))
    hdrl_end = base.find(b"movi") - 8
    payload = base[:hdrl_end] + movi
    payload = payload[:4] + struct.pack("<I", len(payload) - 8) + payload[8:]
    ww, hh, nn, frames = _decode_video(payload)
    assert (ww, hh, nn) == (8, 8, 2)
    want1 = np.full((8, 8), 50, dtype=np.uint8)
    assert np.array_equal(frames[0], want1)
    want2 = want1.copy()
    want2[7, 0:2] = 7            # bottom row, first run
    want2[5, 5:7] = 9            # after delta dx=3 dy=2: x=5, row=2 -> y=5
    assert np.array_equal(frames[1], want2)


# --- r11: mp3 / Ogg-Vorbis METADATA (header walk; decode stays stubbed) --


def _mp3_frame(kbps=128, sr=44100, mono=False, fill=0xAA):
    """One well-formed MPEG1 Layer III frame (header + payload)."""
    br_table = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
    sr_table = [44100, 48000, 32000]
    b0 = 0xFF
    b1 = 0xE0 | (3 << 3) | (1 << 1) | 1  # MPEG1, layer III, no CRC
    b2 = (br_table.index(kbps) << 4) | (sr_table.index(sr) << 2)
    b3 = 0xC0 if mono else 0x00
    size = 144 * kbps * 1000 // sr
    return bytes([b0, b1, b2, b3]) + bytes([fill]) * (size - 4)


def test_mp3_metadata_cbr_and_id3():
    """CBR mp3 behind an ID3v2 tag: frame count, sample rate,
    channels, duration, and average bitrate from the header walk."""
    from data_ingestors_spark.operators.multimodal import _mp3_metadata

    frames = b"".join(_mp3_frame() for _ in range(10))
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 20]) + bytes(20)
    m = _mp3_metadata(id3 + frames)
    assert m["codec"] == "mp3" and m["sample_rate"] == 44100
    assert m["channels"] == 2 and m["n_frames"] == 10
    assert m["avg_kbps"] == 128.0
    assert abs(m["duration_s"] - 10 * 1152 / 44100) < 1e-6


def test_mp3_metadata_xing_vbr_frame_count():
    """A Xing header in the first frame overrides the counted frames
    (the VBR duration convention)."""
    from data_ingestors_spark.operators.multimodal import _mp3_metadata

    f0 = bytearray(_mp3_frame(mono=False))
    f0[36:40] = b"Xing"
    f0[40:44] = (1).to_bytes(4, "big")       # flags: FRAMES
    f0[44:48] = (500).to_bytes(4, "big")     # total frames
    m = _mp3_metadata(bytes(f0) + _mp3_frame())
    assert m["n_frames"] == 500
    assert abs(m["duration_s"] - 500 * 1152 / 44100) < 1e-6


def _ogg_page(granule, segments, first=False, serial=1, seq=0):
    import struct

    body = b"".join(segments)
    seg_table = bytes(len(s) for s in segments)  # each segment < 255
    hdr = (
        b"OggS" + bytes([0, 2 if first else 0])
        + struct.pack("<q", granule) + struct.pack("<I", serial)
        + struct.pack("<I", seq) + b"\x00\x00\x00\x00"
        + bytes([len(segments)]) + seg_table
    )
    return hdr + body


def test_ogg_vorbis_metadata():
    """Ogg/Vorbis: channels + rate from the id header, duration from
    the last page's granule position."""
    import struct

    from data_ingestors_spark.operators.multimodal import _ogg_vorbis_metadata

    ident = (
        b"\x01vorbis" + struct.pack("<I", 0) + bytes([2])
        + struct.pack("<I", 48000) + bytes(16)
    )
    pages = (
        _ogg_page(0, [ident], first=True)
        + _ogg_page(24000, [b"\x05" * 100], seq=1)
        + _ogg_page(96000, [b"\x05" * 50], seq=2)
    )
    m = _ogg_vorbis_metadata(pages)
    assert m["codec"] == "vorbis" and m["sample_rate"] == 48000
    assert m["channels"] == 2 and m["n_pages"] == 3
    assert abs(m["duration_s"] - 2.0) < 1e-9


def test_audio_metadata_operator_mixed_payloads(spark):
    """audio_metadata over mixed clips: FAKEAUD and WAV through the
    real decoders, mp3 and Ogg through the header walk, junk rows
    carry an error — one typed struct row per clip."""
    from data_ingestors_spark.operators.multimodal import audio_metadata

    import struct

    wav = (
        b"RIFF" + struct.pack("<I", 36 + 16) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", 16) + bytes(16)
    )
    ident = (
        b"\x01vorbis" + struct.pack("<I", 0) + bytes([1])
        + struct.pack("<I", 16000) + bytes(16)
    )
    rows = [
        (1, bytearray(b"FAKEAUD:8000:" + bytes(32))),
        (2, bytearray(wav)),
        (3, bytearray(b"".join(_mp3_frame(mono=True) for _ in range(4)))),
        (4, bytearray(_ogg_page(0, [ident], first=True) + _ogg_page(8000, [b"x"], seq=1))),
        (5, bytearray(b"not audio at all")),
    ]
    df = spark.createDataFrame(rows, "id long, clip binary")
    got = {r["id"]: r.asDict() for r in audio_metadata(df, "id", "clip").collect()}
    assert got[1]["codec"] == "fake" and got[1]["sample_rate"] == 8000
    assert got[2]["codec"] == "wav" and got[2]["duration_s"] == 0.001
    assert got[3]["codec"] == "mp3" and got[3]["channels"] == 1
    assert got[4]["codec"] == "vorbis" and got[4]["duration_s"] == 0.5
    assert got[5]["codec"] is None and got[5]["error"]
    assert all(got[i]["n_bytes"] > 0 for i in got)


def test_video_metadata_operator(spark):
    """video_metadata over mixed clips: MS Video 1 AVI reports codec/
    dims/frames/fps from container headers (no frame decode), FAKEVID
    and GIF parse cheaply, junk rows carry an error."""
    import numpy as np

    from data_ingestors_spark.operators.multimodal import video_metadata

    avi = _encode_msvideo1_avi([np.zeros((6, 8), dtype=np.uint8)] * 3)
    rows = [
        (1, bytearray(b"FAKEVID:4x2x5:" + bytes(4 * 2 * 5))),
        (2, bytearray(avi)),
        (3, bytearray(b"definitely not a video")),
    ]
    df = spark.createDataFrame(rows, "id long, clip binary")
    got = {r["id"]: r.asDict() for r in video_metadata(df, "id", "clip").collect()}
    assert got[1]["codec"] == "fake" and (got[1]["width"], got[1]["height"]) == (4, 2)
    assert got[1]["n_frames"] == 5
    assert got[2]["codec"] == "cram" and (got[2]["width"], got[2]["height"]) == (8, 6)
    assert got[2]["n_frames"] == 3 and got[2]["fps"] == 10.0  # strh rate/scale = 10/1
    assert got[3]["codec"] is None and got[3]["error"]


def test_arith_jpeg_sof9_12bit_precision():
    """12-bit ARITHMETIC sequential JPEG (SOF9, prec=12): DC DIFF and
    AC magnitudes walk deep X chains; rendered gray8 matches an
    independent numpy reconstruction of the same quantized
    coefficients (the same oracle device as the 12-bit Huffman
    test)."""
    import numpy as np

    from data_ingestors_spark.operators.multimodal import (
        JPEG_ZIGZAG,
        _decode_jpeg,
        _jpeg_idct_matrix,
    )

    y, x = np.mgrid[0:16, 0:16]
    plane = (
        2048 + 1500 * np.sin(x / 2.5) + 400 * np.cos(y / 1.5)
    ).astype(np.int64).clip(0, 4095)
    payload = _encode_jpeg_arith(plane, prec=12)
    w, h, arr = _decode_jpeg(payload)
    assert (w, h) == (16, 16)
    # independent recon: quantized DCT coeffs -> IDCT -> +2048 -> top 8 bits
    A = _jpeg_idct_matrix()
    want = np.zeros((16, 16))
    for my in range(2):
        for mx in range(2):
            block = plane[my*8:my*8+8, mx*8:mx*8+8].astype(np.float64) - 2048.0
            Fq = np.rint(A @ block @ A.T)
            want[my*8:my*8+8, mx*8:mx*8+8] = A.T @ Fq @ A + 2048.0
    # the decoder renders clip(float)->int64 (truncation), then >>4
    want8 = (np.clip(want, 0, 4095).astype(np.int64) >> 4).astype(np.uint8)
    assert np.array_equal(arr, want8)


# --- r11: baseline TIFF (strips; none/LZW/PackBits) ----------------------


def _encode_tiff(plane, *, byteorder="<", photo=1, bps=8, spp=1,
                 compression=1, predictor=1, rows_per_strip=None,
                 colormap=None, rgb=None):
    """Reference baseline-TIFF writer: header + one IFD + strip data.
    ``plane`` is (h, w) indices/gray; ``rgb`` (h, w, 3) overrides it
    for photometric 2. TIFF-LZW packs MSB-first with early change."""
    import struct

    import numpy as np

    if rgb is not None:
        h, w = rgb.shape[:2]
        spp = 3
        sample_rows = [bytes(rgb[r].astype(np.uint8).tobytes()) for r in range(h)]
    else:
        h, w = plane.shape
        if bps == 1:
            sample_rows = [
                bytes(np.packbits(plane[r].astype(np.uint8) // 255).tobytes())
                for r in range(h)
            ]
        elif bps == 16:
            dt = "<u2" if byteorder == "<" else ">u2"
            sample_rows = [plane[r].astype(dt).tobytes() for r in range(h)]
        else:
            sample_rows = [plane[r].astype(np.uint8).tobytes() for r in range(h)]

    rps = rows_per_strip or h
    strips = []
    for s0 in range(0, h, rps):
        rows = sample_rows[s0 : s0 + rps]
        if predictor == 2:
            # horizontal differencing per row before compression
            def diff_row(row):
                a = np.frombuffer(row, np.uint8 if bps == 8 else
                                  ("<u2" if byteorder == "<" else ">u2")).astype(np.int64)
                if spp > 1:
                    a = a.reshape(-1, spp)
                    d = np.concatenate([a[:1], (a[1:] - a[:-1])], axis=0) & (
                        (1 << bps) - 1)
                    d = d.ravel()
                else:
                    d = np.concatenate([a[:1], (a[1:] - a[:-1])]) & ((1 << bps) - 1)
                if bps == 8:
                    return d.astype(np.uint8).tobytes()
                return d.astype("<u2" if byteorder == "<" else ">u2").tobytes()
            rows = [diff_row(r) for r in rows]
        raw = b"".join(rows)
        if compression == 1:
            strips.append(raw)
        elif compression == 32773:
            out = bytearray()
            i = 0
            while i < len(raw):
                run = 1
                while i + run < len(raw) and raw[i + run] == raw[i] and run < 128:
                    run += 1
                if run >= 2:
                    out += bytes([257 - run, raw[i]])
                    i += run
                else:
                    lit = i + 1
                    while (lit < len(raw) and lit - i < 128
                           and not (lit + 1 < len(raw) and raw[lit] == raw[lit + 1])):
                        lit += 1
                    out += bytes([lit - i - 1]) + raw[i:lit]
                    i = lit
            strips.append(bytes(out))
        elif compression == 8:
            import zlib as _z

            strips.append(_z.compress(raw))
        elif compression == 5:
            # TIFF-LZW encoder: MSB-first, early change
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
            bits = []
            def put(code):
                bits.append((code, width))
            put(256)
            prev = b""
            for byte in raw:
                cur = prev + bytes([byte])
                if cur in table:
                    prev = cur
                    continue
                put(table[prev])
                table[cur] = next_code
                next_code += 1
                if next_code + 1 >= (1 << width) and width < 12:
                    width += 1
                prev = bytes([byte])
            if prev:
                put(table[prev])
            put(257)
            acc = nb = 0
            out = bytearray()
            for code, wd in bits:
                acc = (acc << wd) | code
                nb += wd
                while nb >= 8:
                    out.append((acc >> (nb - 8)) & 0xFF)
                    nb -= 8
            if nb:
                out.append((acc << (8 - nb)) & 0xFF)
            strips.append(bytes(out))
        else:
            raise AssertionError(compression)

    e = "<" if byteorder == "<" else ">"
    entries = []

    def entry(tag, typ, cnt, val):
        entries.append((tag, typ, cnt, val))

    # layout: 8-byte header, IFD, then value areas, then strips
    entry(256, 3, 1, w)
    entry(257, 3, 1, h)
    entry(258, 3, 1, bps)
    entry(259, 3, 1, compression)
    entry(262, 3, 1, photo)
    entry(277, 3, 1, spp)
    entry(278, 3, 1, rps)
    if predictor != 1:
        entry(317, 3, 1, predictor)
    n_strips = len(strips)
    # compute sizes: IFD then offset arrays then colormap then strips
    ifd_off = 8
    extra = []  # (bytes) appended after IFD; entries referencing them patched later
    n_entries = len(entries) + 2 + (1 if colormap is not None else 0)
    ifd_size = 2 + 12 * n_entries + 4
    data_off = ifd_off + ifd_size

    strip_offsets_pos = None
    cmap_bytes = b""
    if colormap is not None:
        cmap_vals = [v for ch in colormap for v in ch]  # 3*2^bps u16
        cmap_bytes = b"".join(struct.pack(e + "H", v) for v in cmap_vals)

    off_array = b""
    cnt_array = b""
    # reserve space: offsets array (u32*n), counts array (u32*n), colormap
    off_array_pos = data_off
    cnt_array_pos = off_array_pos + 4 * n_strips
    cmap_pos = cnt_array_pos + 4 * n_strips
    strip0 = cmap_pos + len(cmap_bytes)
    cur = strip0
    soffs = []
    for st in strips:
        soffs.append(cur)
        cur += len(st)
    off_array = b"".join(struct.pack(e + "I", o) for o in soffs)
    cnt_array = b"".join(struct.pack(e + "I", len(st)) for st in strips)

    if n_strips == 1:
        entry(273, 4, 1, soffs[0])
        entry(279, 4, 1, len(strips[0]))
    else:
        entry(273, 4, n_strips, off_array_pos)
        entry(279, 4, n_strips, cnt_array_pos)
    if colormap is not None:
        entry(320, 3, len(cmap_vals), cmap_pos)
    entries.sort()

    out = bytearray()
    out += (b"II*\x00" if e == "<" else b"MM\x00*")
    out += struct.pack(e + "I", ifd_off)
    out += struct.pack(e + "H", len(entries))
    for tag, typ, cnt, val in entries:
        out += struct.pack(e + "HHI", tag, typ, cnt)
        if typ == 3 and cnt == 1:
            out += struct.pack(e + "HH", val, 0)
        else:
            out += struct.pack(e + "I", val)
    out += struct.pack(e + "I", 0)  # next IFD
    out += off_array + cnt_array + cmap_bytes
    for st in strips:
        out += st
    return bytes(out)


def test_tiff_gray8_both_orders_and_strips():
    import numpy as np

    from data_ingestors_spark.operators.multimodal import _decode_tiff

    rng = np.random.RandomState(101)
    g = rng.randint(0, 256, size=(9, 14)).astype(np.uint8)
    for bo in ("<", ">"):
        for rps in (None, 3):
            w, h, arr = _decode_tiff(_encode_tiff(g, byteorder=bo, rows_per_strip=rps))
            assert (w, h) == (14, 9)
            assert np.array_equal(arr, g), (bo, rps)


def test_tiff_packbits_lzw_and_predictor():
    import numpy as np

    from data_ingestors_spark.operators.multimodal import _decode_tiff

    rng = np.random.RandomState(103)
    g = np.repeat(rng.randint(0, 256, size=(7, 4)), 4, axis=1).astype(np.uint8)[:, :13]
    for comp, pred in ((32773, 1), (5, 1), (5, 2), (8, 1), (8, 2)):
        w, h, arr = _decode_tiff(
            _encode_tiff(g, compression=comp, predictor=pred, rows_per_strip=2)
        )
        assert (w, h) == (13, 7)
        assert np.array_equal(arr, g), (comp, pred)


def test_tiff_bilevel_gray16_rgb_palette_whiteiszero():
    import numpy as np

    from data_ingestors_spark.operators.multimodal import _decode_tiff

    rng = np.random.RandomState(107)
    # 1-bit
    bw = (rng.rand(6, 11) < 0.5).astype(np.uint8) * 255
    w, h, arr = _decode_tiff(_encode_tiff(bw, bps=1))
    assert np.array_equal(arr, bw)
    # WhiteIsZero inverts
    w, h, arr = _decode_tiff(_encode_tiff(bw, bps=1, photo=0))
    assert np.array_equal(arr, 255 - bw)
    # 16-bit renders the top byte
    g16 = rng.randint(0, 1 << 16, size=(5, 7)).astype(np.int64)
    w, h, arr = _decode_tiff(_encode_tiff(g16, bps=16, byteorder=">"))
    assert np.array_equal(arr, (g16 >> 8).astype(np.uint8))
    # RGB -> BT.601 luma
    rgb = rng.randint(0, 256, size=(4, 6, 3)).astype(np.int64)
    w, h, arr = _decode_tiff(_encode_tiff(None, photo=2, rgb=rgb))
    want = ((77 * rgb[..., 0] + 150 * rgb[..., 1] + 29 * rgb[..., 2] + 128) >> 8)
    assert np.array_equal(arr, want.astype(np.uint8))
    # palette via ColorMap (u16 channels, high byte significant)
    idx = rng.randint(0, 4, size=(5, 5)).astype(np.uint8)
    cmap = [[((v * 17) & 0xFF) << 8 for v in range(256)] for _ in range(3)]  # gray ramp
    w, h, arr = _decode_tiff(_encode_tiff(idx, photo=3, colormap=cmap))
    lut = (np.arange(256) * 17) & 0xFF
    assert np.array_equal(arr, lut[idx].astype(np.uint8))


def test_tiff_fail_loud_boundaries_and_validator_dims():
    import numpy as np
    import pytest

    from data_ingestors_spark.operators.multimodal import _decode_tiff
    from data_ingestors_spark.validators.files import _header_dims

    g = np.zeros((4, 4), dtype=np.uint8)
    t = _encode_tiff(g)
    assert _header_dims(t) == (4, 4)
    mm = _encode_tiff(g, byteorder=">")
    assert _header_dims(mm) == (4, 4)
    # unsupported compression fails loud
    bad = bytearray(t)
    # compression tag value: find tag 259 entry and set value 6 (JPEG)
    import struct
    n = struct.unpack("<H", bad[8:10])[0]
    for k in range(n):
        e = 10 + 12 * k
        if struct.unpack("<H", bad[e:e+2])[0] == 259:
            bad[e+8:e+10] = struct.pack("<H", 6)
    with pytest.raises(NotImplementedError, match="compression 6"):
        _decode_tiff(bytes(bad))


def test_pnm_all_six_forms():
    """Netpbm P1-P6: ASCII and binary, bilevel inversion, maxval
    scaling, 16-bit binary gray, comments in headers."""
    import numpy as np

    from data_ingestors_spark.operators.multimodal import _decode_image

    rng = np.random.RandomState(109)
    bits = (rng.rand(3, 10) < 0.5).astype(np.uint8)
    # P1 ASCII bitmap with a comment; 1 = black
    p1 = b"P1\n# comment\n10 3\n" + b"\n".join(
        b" ".join(b"%d" % v for v in row) for row in bits
    )
    w, h, arr = _decode_image(p1)
    assert (w, h) == (10, 3) and np.array_equal(arr, (1 - bits) * 255)
    # P4 binary bitmap
    p4 = b"P4\n10 3\n" + np.packbits(bits, axis=1).tobytes()
    assert np.array_equal(_decode_image(p4)[2], (1 - bits) * 255)
    # P2 ASCII gray, maxval 31 -> rounded scale
    g = rng.randint(0, 32, size=(4, 5))
    p2 = b"P2\n5 4\n31\n" + b" ".join(b"%d" % v for v in g.ravel())
    want = ((g * 255 + 15) // 31).astype(np.uint8)
    assert np.array_equal(_decode_image(p2)[2], want)
    # P5 binary gray 16-bit big-endian
    g16 = rng.randint(0, 65535, size=(3, 4))
    p5 = b"P5\n4 3\n65535\n" + g16.astype(">u2").tobytes()
    want = ((g16 * 255 + 32767) // 65535).astype(np.uint8)
    assert np.array_equal(_decode_image(p5)[2], want)
    # P3/P6 RGB -> BT.601
    rgbv = rng.randint(0, 256, size=(2, 3, 3))
    lum = ((77 * rgbv[..., 0] + 150 * rgbv[..., 1] + 29 * rgbv[..., 2] + 128) >> 8)
    p3 = b"P3\n3 2\n255\n" + b" ".join(b"%d" % v for v in rgbv.ravel())
    assert np.array_equal(_decode_image(p3)[2], lum.astype(np.uint8))
    p6 = b"P6\n3 2\n255\n" + rgbv.astype(np.uint8).tobytes()
    assert np.array_equal(_decode_image(p6)[2], lum.astype(np.uint8))
