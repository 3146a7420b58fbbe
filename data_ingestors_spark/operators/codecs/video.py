"""Video codecs: MJPEG-in-AVI (RIFF parse + per-frame JPEG decode)
plus the deterministic FAKEVID test format. Inter-frame codecs
(H.26x/VP/AV1) are an honest fail-loud NotImplementedError — no
codec libs in-container. Split out of operators/multimodal.py in
r11; semantics unchanged.
"""

from __future__ import annotations

import numpy as np

from .jpeg import _decode_jpeg  # noqa: E402
from .raster import _decode_gif_frames  # noqa: E402

VID_MAGIC = b"FAKEVID:"

def _decode_mjpeg_avi(content: bytes) -> tuple[int, int, int, np.ndarray]:
    """REAL frame decode for Motion-JPEG AVI: walk the RIFF chunk
    tree (no index needed), decode every video chunk (``..dc`` /
    ``..db``) whose payload starts with a JPEG SOI through
    :func:`_decode_jpeg`. All frames must agree on dimensions.
    Inter-frame codecs (h264 etc.) keep the fail-loud boundary —
    MJPEG is the one container format whose frames are just JPEGs."""
    payloads: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            cid = content[pos : pos + 4]
            sz = int.from_bytes(content[pos + 4 : pos + 8], "little")
            body = pos + 8
            if cid in (b"RIFF", b"LIST"):
                walk(body + 4, min(body + sz, end))
            elif cid[2:4] in (b"dc", b"db") and content[body : body + 2] == b"\xff\xd8":
                payloads.append(content[body : body + sz])
            pos = body + sz + (sz & 1)

    walk(0, len(content))
    if not payloads:
        raise NotImplementedError(
            "AVI contains no MJPEG frames — inter-frame codecs need a real decoder"
        )
    frames = [_decode_jpeg(p) for p in payloads]
    w, h = frames[0][0], frames[0][1]
    if any((f[0], f[1]) != (w, h) for f in frames):
        raise ValueError("MJPEG frames disagree on dimensions")
    return w, h, len(frames), np.stack([f[2] for f in frames])


def _decode_video(content: bytes) -> tuple[int, int, int, np.ndarray]:
    """(width, height, n_frames, frames[n,h,w]). Stub boundary — but
    Motion-JPEG AVI decodes for REAL via the baseline-JPEG decoder
    (see _decode_mjpeg_avi); inter-frame codecs stay stubbed."""
    if content.startswith(VID_MAGIC):
        head, payload = content[len(VID_MAGIC):].split(b":", 1)
        w, h, n = (int(x) for x in head.decode().split("x"))
        arr = np.frombuffer(payload[: w * h * n], dtype=np.uint8).reshape(n, h, w)
        return w, h, n, arr
    if content[:4] == b"RIFF" and content[8:12] == b"AVI ":
        return _decode_mjpeg_avi(content)
    if content[:6] in (b"GIF87a", b"GIF89a"):
        # animated GIF is a video for sampling purposes: all frames,
        # real disposal/transparency compositing (r9)
        return _decode_gif_frames(content)
    raise NotImplementedError("no video codec available for this payload")


