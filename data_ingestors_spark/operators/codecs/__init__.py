"""Pure-python media codec layer (split from operators/multimodal.py
in r11). Each module decodes one family; this package holds the
cross-family image dispatcher and the PIL availability probe. The
multimodal facade re-exports everything, so both import paths work
and registry/test names are stable.
"""

from __future__ import annotations

import numpy as np

try:
    from PIL import Image  # type: ignore  # noqa: F401

    _HAVE_PIL = True
except Exception:
    _HAVE_PIL = False

IMG_MAGIC, AUD_MAGIC, VID_MAGIC = b"FAKEIMG:", b"FAKEAUD:", b"FAKEVID:"

from .raster import (  # noqa: E402
    PNG_SIG,
    TIFF_SIGS,
    _decode_bmp,
    _decode_gif,
    _decode_gif_frames,
    _decode_png,
    _decode_pnm,
    _decode_tiff,
    _gif_metadata,
)
from .jpeg import _decode_jpeg  # noqa: E402

def _decode_image(content: bytes) -> tuple[int, int, np.ndarray]:
    """(width, height, grayscale ndarray). BMP, PNG (all depths +
    Adam7), GIF, the full T.81 JPEG SOF matrix, TIFF, and Netpbm are
    decoded for REAL (pure numpy/zlib/LZW/Huffman+IDCT; see
    codecs/raster.py and codecs/jpeg.py). PIL, when installed, is
    tried FIRST (faster, wider color handling) but only EXTENDS the
    matrix: on any PIL failure we fall through to the pure decoders,
    so payloads PIL cannot open (arithmetic SOF9-11, lossless SOF3,
    hierarchical/differential JPEG) decode identically with or
    without PIL installed — results must not be environment-dependent
    (ADVICE r12 #2)."""
    if content.startswith(IMG_MAGIC):
        head, pixels = content[len(IMG_MAGIC):].split(b":", 1)
        w, h = (int(x) for x in head.decode().split("x"))
        arr = np.frombuffer(pixels[: w * h], dtype=np.uint8).reshape(h, w)
        return w, h, arr
    if _HAVE_PIL:
        import io

        try:
            with Image.open(io.BytesIO(content)) as im:
                g = im.convert("L")
                return im.width, im.height, np.asarray(g)
        except Exception:
            pass  # fall through: the pure decoders cover more JPEG SOFs
    if content.startswith(b"BM"):
        return _decode_bmp(content)
    if content.startswith(PNG_SIG):
        return _decode_png(content)
    if content[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(content)
    if content[:2] == b"\xff\xd8":
        return _decode_jpeg(content)
    if content[:4] in TIFF_SIGS:
        return _decode_tiff(content)
    if content[:1] == b"P" and len(content) > 1 and content[1:2] in b"123456":
        return _decode_pnm(content)
    raise NotImplementedError("no image codec available for this payload")


