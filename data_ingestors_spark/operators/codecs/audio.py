"""Audio codecs: WAV (PCM 8/16/24/32, IEEE float, G.711 mu/A-law,
IMA ADPCM, MS ADPCM) and FLAC per RFC 9639 (all subframe types, Rice
residuals, CRC-8/16 verified) — pure stdlib+numpy. The honest
fail-loud boundary: perceptual codecs (mp3/ogg) raise
NotImplementedError (no codec libs in-container). Split out of
operators/multimodal.py in r11; semantics unchanged.
"""

from __future__ import annotations

import numpy as np

AUD_MAGIC = b"FAKEAUD:"

class _FlacBits:
    """MSB-first bit reader over a bytes buffer (no byte stuffing —
    FLAC entropy data is raw, unlike JPEG's 0xFF00-stuffed stream)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.bytepos = pos
        self.bitpos = 0  # bits consumed within data[bytepos]

    def bits(self, n: int) -> int:
        out = 0
        while n > 0:
            if self.bytepos >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            avail = 8 - self.bitpos
            take = min(n, avail)
            cur = self.data[self.bytepos]
            out = (out << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bitpos += take
            n -= take
            if self.bitpos == 8:
                self.bitpos = 0
                self.bytepos += 1
        return out

    def sbits(self, n: int) -> int:
        v = self.bits(n)
        return v - (1 << n) if v >= 1 << (n - 1) else v

    def unary(self) -> int:
        """RFC 9639 unary: n zero bits terminated by a one bit."""
        n = 0
        while self.bits(1) == 0:
            n += 1
        return n

    def align(self) -> None:
        if self.bitpos:
            self.bitpos = 0
            self.bytepos += 1


def _flac_crc8(data: bytes) -> int:
    """CRC-8, polynomial x^8+x^2+x^1+1 (0x07), init 0 (RFC 9639 §9.2)."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _flac_crc16(data: bytes) -> int:
    """CRC-16, polynomial x^16+x^15+x^2+1 (0x8005), init 0 (RFC 9639 §9.3)."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _flac_utf8_number(bits: _FlacBits) -> int:
    """Frame/sample number: UTF-8-style coding extended to 36-bit
    values (RFC 9639 §9.1.5 — up to 0xFE lead byte, 6 continuations)."""
    lead = bits.bits(8)
    if lead < 0x80:
        return lead
    n = 0
    probe = lead
    while probe & 0x40:
        n += 1
        probe <<= 1
    if n < 1 or n > 6:
        raise ValueError("invalid FLAC UTF-8 coded number")
    val = lead & (0x3F >> n)
    for _ in range(n):
        cont = bits.bits(8)
        if cont & 0xC0 != 0x80:
            raise ValueError("invalid FLAC UTF-8 continuation byte")
        val = (val << 6) | (cont & 0x3F)
    return val


# frame-header lookup tables (RFC 9639 §9.1.1-9.1.4); None = coded in
# a trailing field, 0 = taken from STREAMINFO, -1 = reserved
_FLAC_BLOCKSIZES = [None, 192, 576, 1152, 2304, 4608, None, None,
                    256, 512, 1024, 2048, 4096, 8192, 16384, 32768]
_FLAC_RATES = [0, 88200, 176400, 192000, 8000, 16000, 22050, 24000,
               32000, 44100, 48000, 96000, None, None, None, -1]
_FLAC_BPS = [0, 8, 12, -1, 16, 20, 24, 32]


def _flac_residual(bits: _FlacBits, blocksize: int, order: int) -> np.ndarray:
    """Rice-coded residual (RFC 9639 §9.2.7): 2-bit method (4- or
    5-bit params), partition order, escape-coded raw partitions."""
    method = bits.bits(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual coding method {method}")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    porder = bits.bits(4)
    nparts = 1 << porder
    if blocksize % nparts or (blocksize >> porder) <= order:
        raise ValueError("invalid FLAC rice partition order")
    out = np.empty(blocksize - order, dtype=np.int64)
    at = 0
    for p in range(nparts):
        n = (blocksize >> porder) - (order if p == 0 else 0)
        param = bits.bits(pbits)
        if param == escape:
            raw = bits.bits(5)
            for i in range(n):
                out[at + i] = bits.sbits(raw) if raw else 0
        else:
            for i in range(n):
                u = (bits.unary() << param) | bits.bits(param)
                out[at + i] = -((u >> 1) + 1) if u & 1 else u >> 1
        at += n
    return out


def _flac_subframe(bits: _FlacBits, blocksize: int, bps: int) -> np.ndarray:
    """One subframe (RFC 9639 §9.2): CONSTANT / VERBATIM / FIXED 0-4 /
    LPC, with the wasted-bits shift. Fixed-order reconstruction is the
    vectorized inverse-difference (k cumsums seeded from the warmup
    diffs); LPC is the direct IIR recursion in exact Python ints."""
    if bits.bits(1):
        raise ValueError("FLAC subframe padding bit set")
    ftype = bits.bits(6)
    wasted = 0
    if bits.bits(1):
        wasted = bits.unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("FLAC wasted bits exceed sample size")
    if ftype == 0:  # CONSTANT
        v = bits.sbits(eff)
        s = np.full(blocksize, v, dtype=np.int64)
    elif ftype == 1:  # VERBATIM
        s = np.array([bits.sbits(eff) for _ in range(blocksize)], dtype=np.int64)
    elif 8 <= ftype <= 12:  # FIXED, order = ftype - 8
        order = ftype - 8
        warm = [bits.sbits(eff) for _ in range(order)]
        res = _flac_residual(bits, blocksize, order)
        s = np.empty(blocksize, dtype=np.int64)
        s[:order] = warm
        cur = res
        w = np.asarray(warm, dtype=np.int64)
        for k in range(order, 0, -1):
            init = np.diff(w, k - 1)[-1] if k > 1 else (w[-1] if order else 0)
            cur = init + np.cumsum(cur)
        s[order:] = cur
    elif ftype >= 32:  # LPC, order = (ftype & 31) + 1
        order = (ftype & 31) + 1
        warm = [bits.sbits(eff) for _ in range(order)]
        prec = bits.bits(4) + 1
        if prec == 16:
            raise ValueError("invalid FLAC LPC precision code 1111")
        shift = bits.sbits(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [bits.sbits(prec) for _ in range(order)]
        res = _flac_residual(bits, blocksize, order)
        hist = list(warm)
        out = hist + [0] * (blocksize - order)
        for i in range(order, blocksize):
            acc = 0
            for j, c in enumerate(coefs):
                acc += c * out[i - 1 - j]
            out[i] = int(res[i - order]) + (acc >> shift)
        s = np.asarray(out, dtype=np.int64)
    else:
        raise ValueError(f"reserved FLAC subframe type {ftype:06b}")
    return s << wasted if wasted else s


def _decode_flac(content: bytes) -> tuple[int, np.ndarray]:
    """Real FLAC decode (RFC 9639 / xiph spec) — stdlib + numpy only.

    Full subframe surface: CONSTANT, VERBATIM, FIXED orders 0-4, LPC
    to order 32; rice/rice2 residuals incl. escape-coded partitions;
    wasted bits; all four channel assignments (independent, left/side,
    right/side, mid/side); 4-32 bit samples; frame-header CRC-8 and
    whole-frame CRC-16 verified fail-loud. Multi-channel is averaged
    to mono like every other audio path here. Reference parity:
    audio metadata/feature checks (tracebloc_ingestor
    image_validator.py-style per-file probes) over FLAC payloads."""
    if content[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    info: dict | None = None
    while True:  # metadata blocks
        if pos + 4 > len(content):
            raise ValueError("FLAC metadata truncated")
        last, btype = content[pos] & 0x80, content[pos] & 0x7F
        blen = int.from_bytes(content[pos + 1 : pos + 4], "big")
        body = content[pos + 4 : pos + 4 + blen]
        pos += 4 + blen
        if btype == 0:  # STREAMINFO
            b = _FlacBits(body)
            b.bits(16), b.bits(16), b.bits(24), b.bits(24)
            info = {
                "sr": b.bits(20),
                "nch": b.bits(3) + 1,
                "bps": b.bits(5) + 1,
                "total": b.bits(36),
            }
        if last:
            break
    if info is None:
        raise ValueError("FLAC missing STREAMINFO")

    chans: list[np.ndarray] = [np.empty(0, dtype=np.int64) for _ in range(info["nch"])]
    while pos < len(content):
        frame_start = pos
        bits = _FlacBits(content, pos)
        sync = bits.bits(14)
        if sync != 0x3FFE:
            raise ValueError("bad FLAC frame sync")
        bits.bits(1)  # reserved
        bits.bits(1)  # blocking strategy
        bs_code = bits.bits(4)
        sr_code = bits.bits(4)
        ch_code = bits.bits(4)
        bps_code = bits.bits(3)
        bits.bits(1)  # reserved
        _flac_utf8_number(bits)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code 0")
        blocksize = _FLAC_BLOCKSIZES[bs_code]
        if blocksize is None:
            blocksize = bits.bits(8 if bs_code == 6 else 16) + 1
        sr = _FLAC_RATES[sr_code]
        if sr == -1:
            raise ValueError("invalid FLAC sample rate code 1111")
        if sr is None:
            raw = bits.bits(8 if sr_code == 12 else 16)
            sr = raw * 1000 if sr_code == 12 else (raw if sr_code == 13 else raw * 10)
        if sr == 0:
            sr = info["sr"]
        bps = _FLAC_BPS[bps_code]
        if bps == -1:
            raise ValueError("reserved FLAC sample size code")
        if bps == 0:
            bps = info["bps"]
        header_end = bits.bytepos  # header is byte-aligned here
        if _flac_crc8(content[frame_start:header_end]) != bits.bits(8):
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if ch_code <= 7:
            nch = ch_code + 1
            subs = [_flac_subframe(bits, blocksize, bps) for _ in range(nch)]
        elif ch_code in (8, 9, 10):
            nch = 2
            b0 = bps + (1 if ch_code == 9 else 0)  # right/side: side first
            b1 = bps + (1 if ch_code in (8, 10) else 0)
            c0 = _flac_subframe(bits, blocksize, b0)
            c1 = _flac_subframe(bits, blocksize, b1)
            if ch_code == 8:  # left/side: right = left - side
                subs = [c0, c0 - c1]
            elif ch_code == 9:  # right/side: left = right + side
                subs = [c1 + c0, c1]
            else:  # mid/side
                m2 = (c0 << 1) | (c1 & 1)
                subs = [(m2 + c1) >> 1, (m2 - c1) >> 1]
        else:
            raise ValueError(f"reserved FLAC channel assignment {ch_code}")
        if nch != info["nch"]:
            raise ValueError("FLAC frame channel count != STREAMINFO")
        bits.align()
        body_end = bits.bytepos
        crc16 = bits.bits(16)
        if _flac_crc16(content[frame_start:body_end]) != crc16:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = bits.bytepos
        for i in range(nch):
            chans[i] = np.concatenate([chans[i], subs[i]])

    total = info["total"]
    if total:
        chans = [c[:total] for c in chans]
    x = np.mean(np.stack(chans, axis=1), axis=1) if info["nch"] > 1 else chans[0].astype(np.float64)
    return info["sr"], x / float(1 << (info["bps"] - 1))


def _decode_audio(content: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, float samples in [-1, 1)). WAV is decoded for
    REAL — stdlib ``wave`` + numpy, no external codec needed:
    8/16/24/32-bit PCM, IEEE float32/64 (fmt 3), G.711 A-law/mu-law
    (fmt 6/7), IMA ADPCM (fmt 0x11) and MS ADPCM (fmt 0x02);
    multi-channel averaged to
    mono. FLAC is decoded for REAL too (``_decode_flac`` — full
    subframe/stereo-decorrelation surface, CRC-verified). The FAKEAUD
    fixture format remains for deterministic tests. Perceptual codecs
    (mp3/ogg) stay behind the honest stub boundary."""
    if content[:4] == b"fLaC":
        return _decode_flac(content)
    if content.startswith(AUD_MAGIC):
        head, payload = content[len(AUD_MAGIC):].split(b":", 1)
        sr = int(head.decode())
        samples = np.frombuffer(payload, dtype="<i2").astype(np.float64) / 32768.0
        return sr, samples
    if content.startswith(b"RIFF") and content[8:12] == b"WAVE":
        import io
        import wave

        wv = _wav_chunks(content)
        fmt_code, sr_, nch_, data = wv["fmt"], wv["sr"], wv["nch"], wv["data"]
        if fmt_code in (6, 7):  # G.711 A-law / mu-law — stdlib wave
            # refuses non-PCM, but the expansion is a 256-entry table
            table = _alaw_table() if fmt_code == 6 else _mulaw_table()
            x = table[np.frombuffer(data, dtype=np.uint8)] / 32768.0
            if nch_ > 1:
                x = x.reshape(-1, nch_).mean(axis=1)
            return sr_, x
        if fmt_code == 3:  # IEEE float — already in [-1, 1)
            if wv["bits"] not in (32, 64):
                raise NotImplementedError(
                    f"IEEE-float WAV with {wv['bits']} bits"
                )
            dt = np.dtype("<f4" if wv["bits"] == 32 else "<f8")
            n = len(data) // dt.itemsize
            x = np.frombuffer(data[: n * dt.itemsize], dtype=dt).astype(np.float64)
            if nch_ > 1:
                x = x[: n - n % nch_].reshape(-1, nch_).mean(axis=1)
            return sr_, x
        if fmt_code == 0x11:  # IMA / DVI ADPCM
            x = _ima_adpcm_decode(data, nch_, wv["block_align"], wv["fact"])
            return sr_, x / 32768.0
        if fmt_code == 0x02:  # MS ADPCM
            x = _ms_adpcm_decode(data, nch_, wv["block_align"], wv["fact"])
            return sr_, x / 32768.0
        with wave.open(io.BytesIO(content)) as wf:
            sr = wf.getframerate()
            sw = wf.getsampwidth()
            nch = wf.getnchannels()
            raw = wf.readframes(wf.getnframes())
        if sw == 1:  # 8-bit PCM is unsigned
            x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
            x = (x - 128.0) / 128.0
        elif sw == 2:
            x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
        elif sw == 3:  # 24-bit PCM: manual little-endian assembly
            b = np.frombuffer(raw, dtype=np.uint8)
            b = b[: len(b) - len(b) % 3].reshape(-1, 3).astype(np.int64)
            v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            x = v.astype(np.float64) / 8388608.0
        elif sw == 4:
            x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
        else:
            raise NotImplementedError(f"unsupported WAV sample width: {sw}")
        if nch > 1:
            x = x.reshape(-1, nch).mean(axis=1)
        return sr, x
    raise NotImplementedError("no audio codec available for this payload")


# IMA ADPCM step-size table (89 entries) and index-adjust table — the
# standard DVI/IMA constants (IMA Digital Audio Focus/Technical Working
# Groups, "Recommended Practices for Enhancing Digital Audio
# Compatibility", rev 3.00, 1992).
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int64)
_IMA_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def _ima_adpcm_decode(
    data: bytes, nch: int, block_align: int, fact: int | None
) -> np.ndarray:
    """IMA ADPCM (WAV fmt 0x11) → mono float64 in int16 range.

    Block layout per the IMA WAV mapping: each ``block_align``-byte
    block opens with a 4-byte header PER CHANNEL (int16 predictor,
    uint8 step index, reserved), then 4-byte nibble groups interleaved
    round-robin across channels (8 samples per group, low nibble
    first). Blocks are independent, so the sequential nibble recursion
    is vectorized ACROSS blocks (and channels) — the Python-level loop
    is only samples-per-block long, not total-samples long. A trailing
    short block decodes through the same path; ``fact`` (total samples
    per channel) trims encoder padding."""
    hdr = 4 * nch
    if block_align is None or block_align <= hdr:
        raise ValueError(f"IMA ADPCM block_align {block_align} too small")

    def blockset(arr: np.ndarray) -> np.ndarray:
        # arr: (nblk, nbytes) uint8 → (nblk, samples_per_block) mono
        nblk, nbytes = arr.shape
        head = arr[:, :hdr].reshape(nblk, nch, 4).astype(np.int64)
        pred = head[:, :, 0] | (head[:, :, 1] << 8)
        pred = np.where(pred >= 32768, pred - 65536, pred)
        idx = np.clip(head[:, :, 2], 0, 88)
        ngroups = (nbytes - hdr) // (4 * nch)
        body = arr[:, hdr : hdr + ngroups * 4 * nch].astype(np.int64)
        body = body.reshape(nblk, ngroups, nch, 4)
        nib = np.empty((nblk, ngroups, nch, 8), dtype=np.int64)
        nib[..., 0::2] = body & 0x0F
        nib[..., 1::2] = body >> 4
        out = np.empty((nblk, ngroups * 8 + 1, nch), dtype=np.float64)
        out[:, 0] = pred
        for g in range(ngroups):
            for k in range(8):
                n = nib[:, g, :, k]
                step = _IMA_STEPS[idx]
                diff = (
                    (step >> 3)
                    + np.where(n & 1, step >> 2, 0)
                    + np.where(n & 2, step >> 1, 0)
                    + np.where(n & 4, step, 0)
                )
                pred = np.clip(
                    np.where(n & 8, pred - diff, pred + diff), -32768, 32767
                )
                idx = np.clip(idx + _IMA_INDEX_ADJ[n & 7], 0, 88)
                out[:, g * 8 + k + 1] = pred
        return out.mean(axis=2).reshape(nblk, -1)

    buf = np.frombuffer(data, dtype=np.uint8)
    nfull = len(buf) // block_align
    parts = []
    if nfull:
        parts.append(blockset(buf[: nfull * block_align].reshape(nfull, block_align)).ravel())
    tail = buf[nfull * block_align :]
    if len(tail) > hdr:
        parts.append(blockset(tail.reshape(1, -1)).ravel())
    if not parts:
        raise ValueError("IMA ADPCM payload shorter than one block header")
    x = np.concatenate(parts)
    if fact is not None:
        x = x[:fact]
    return x


def _wav_chunks(content: bytes) -> dict:
    """Raw RIFF/WAVE walk — needed because stdlib ``wave`` rejects
    non-PCM formats before we can see the payload. Returns ``fmt``
    (format code), ``nch``, ``sr``, ``bits`` (bits per sample),
    ``block_align``, ``data`` (payload bytes) and ``fact`` (total
    samples per channel from the fact chunk, or None) — the last three
    are what the float / ADPCM branches need."""
    pos = 12
    fmt_code = sr = nch = bits = block_align = fact = None
    data = b""
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        sz = int.from_bytes(content[pos + 4 : pos + 8], "little")
        body = content[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt_code = int.from_bytes(body[0:2], "little")
            nch = int.from_bytes(body[2:4], "little")
            sr = int.from_bytes(body[4:8], "little")
            block_align = int.from_bytes(body[12:14], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"fact" and sz >= 4:
            fact = int.from_bytes(body[0:4], "little")
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)
    if fmt_code is None:
        raise ValueError("WAV missing fmt chunk")
    return {
        "fmt": fmt_code, "nch": nch, "sr": sr, "bits": bits,
        "block_align": block_align, "data": data, "fact": fact,
    }


def _mulaw_table() -> np.ndarray:
    """G.711 mu-law byte -> linear int16 expansion table."""
    u = np.arange(256)
    u = ~u & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = ((mant << 3) + 0x84 << exp) - 0x84
    return np.where(sign, -mag, mag).astype(np.float64)


def _alaw_table() -> np.ndarray:
    """G.711 A-law byte -> linear int16 expansion table."""
    a = np.arange(256) ^ 0x55
    sign = a & 0x80  # NB: in A-law the set sign bit means POSITIVE
    exp = (a >> 4) & 0x07
    mant = a & 0x0F
    mag = np.where(exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << (exp - 1))
    return np.where(sign, mag, -mag).astype(np.float64)




# MS ADPCM (WAV fmt 0x0002) constants — the 7 default coefficient
# pairs and the 16-entry delta adaptation table from the Microsoft
# multimedia standards ("Microsoft ADPCM" WAVEFORMAT documentation).
_MS_ADPCM_COEF1 = np.array([256, 512, 0, 192, 240, 460, 392], dtype=np.int64)
_MS_ADPCM_COEF2 = np.array([0, -256, 0, 64, 0, -208, -232], dtype=np.int64)
_MS_ADPCM_ADAPT = np.array(
    [230, 230, 230, 230, 307, 409, 512, 614,
     768, 614, 512, 409, 307, 230, 230, 230], dtype=np.int64)


def _ms_adpcm_decode(
    data: bytes, nch: int, block_align: int, fact: int | None
) -> np.ndarray:
    """MS ADPCM (WAV fmt 0x0002) → mono float64 in int16 range.

    Block layout per the Microsoft spec: per channel a 1-byte
    predictor index (selects a coefficient pair), then per channel
    int16 ``delta``, ``sample1``, ``sample2`` (7 bytes/channel of
    header); the first two output samples per channel are sample2
    then sample1; each following 4-bit nibble (HIGH nibble first,
    channels round-robin) codes

        pred  = (sample1*coef1 + sample2*coef2) >> 8
        new   = clamp16(pred + delta * signed4(nibble))
        delta = max(16, (Adapt[nibble] * delta) >> 8)

    Blocks are independent, so the recursion vectorizes ACROSS blocks
    and channels — the Python loop is samples-per-block long (same
    design as `_ima_adpcm_decode`). ``fact`` trims encoder padding
    after the mono average."""
    hdr = 7 * nch
    if block_align is None or block_align <= hdr:
        raise ValueError(f"MS ADPCM block_align {block_align} too small")

    def i16(a: np.ndarray, pos: int) -> np.ndarray:
        lo = a[:, pos : pos + 2 * nch : 2]
        hi = a[:, pos + 1 : pos + 2 * nch : 2]
        v = lo | (hi << 8)
        return np.where(v >= 32768, v - 65536, v)

    def blockset(arr: np.ndarray) -> np.ndarray:
        nblk, nbytes = arr.shape
        a = arr.astype(np.int64)
        pidx = np.clip(a[:, :nch], 0, 6)
        c1 = _MS_ADPCM_COEF1[pidx]
        c2 = _MS_ADPCM_COEF2[pidx]
        delta = i16(a, nch)
        s1 = i16(a, 3 * nch)
        s2 = i16(a, 5 * nch)
        body = a[:, hdr:]
        nnib = body.shape[1] * 2
        nib = np.empty((nblk, nnib), dtype=np.int64)
        nib[:, 0::2] = body >> 4
        nib[:, 1::2] = body & 0x0F
        per_ch = nnib // nch
        nib = nib[:, : per_ch * nch].reshape(nblk, per_ch, nch)
        out = np.empty((nblk, per_ch + 2, nch), dtype=np.float64)
        out[:, 0] = s2
        out[:, 1] = s1
        for k in range(per_ch):
            n = nib[:, k]
            signed = np.where(n >= 8, n - 16, n)
            pred = (s1 * c1 + s2 * c2) >> 8
            new = np.clip(pred + delta * signed, -32768, 32767)
            s2, s1 = s1, new
            delta = np.maximum(16, (_MS_ADPCM_ADAPT[n] * delta) >> 8)
            out[:, k + 2] = new
        return out.mean(axis=2).reshape(nblk, -1)

    buf = np.frombuffer(data, dtype=np.uint8)
    nfull = len(buf) // block_align
    parts = []
    if nfull:
        parts.append(
            blockset(buf[: nfull * block_align].reshape(nfull, block_align)).ravel()
        )
    tail = buf[nfull * block_align :]
    if len(tail) > hdr:
        parts.append(blockset(tail.reshape(1, -1)).ravel())
    if not parts:
        raise ValueError("MS ADPCM payload shorter than one block header")
    x = np.concatenate(parts)
    if fact is not None:
        x = x[:fact]
    return x


# --- perceptual-codec METADATA (header walk only; decode stays stubbed) --

# MPEG audio bitrate table [version_group][layer][index] in kbit/s
# (index 0 = free, 15 = bad) and sample-rate table [version][index],
# per the public MPEG-1/2 audio frame-header layout (ISO 11172-3 /
# 13818-3 framing — the same constants every tag reader ships).
_MP3_BITRATES = {
    (1, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (2, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_MP3_RATES = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000],
              0: [11025, 12000, 8000]}  # version bits: 3=MPEG1, 2=MPEG2, 0=MPEG2.5


def _mp3_metadata(content: bytes) -> dict:
    """MP3/MPEG-audio METADATA from a frame-header walk — no sample
    decode (the perceptual synthesis stays behind the honest stub):
    sample rate, channels, average bitrate, frame count, and duration
    (Xing/Info VBR frame count when present, else counted frames).
    Raises ValueError when no MPEG frame sync is found."""
    pos = 0
    # skip an ID3v2 tag: 10-byte header, syncsafe length
    if content[:3] == b"ID3" and len(content) >= 10:
        ln = 0
        for b in content[6:10]:
            ln = (ln << 7) | (b & 0x7F)
        pos = 10 + ln
    n_frames = 0
    sr = channels = None
    samples_per_frame = 0
    kbps_sum = 0
    xing_frames = None
    while pos + 4 <= len(content):
        b0, b1, b2, b3 = content[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            if n_frames:
                break  # trailing junk / tag after the last frame
            pos += 1
            continue
        version = (b1 >> 3) & 0x3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
        layer = 4 - ((b1 >> 1) & 0x3)  # 1..3; (b1>>1)&3 == 0 reserved
        if version == 1 or ((b1 >> 1) & 0x3) == 0:
            pos += 1
            continue
        br_idx = (b2 >> 4) & 0xF
        sr_idx = (b2 >> 2) & 0x3
        if br_idx in (0, 15) or sr_idx == 3:
            pos += 1
            continue
        vgroup = 1 if version == 3 else 2
        kbps = _MP3_BITRATES[(vgroup, layer)][br_idx]
        rate = _MP3_RATES[version][sr_idx]
        padding = (b2 >> 1) & 0x1
        if layer == 1:
            spf = 384
            size = (12 * kbps * 1000 // rate + padding) * 4
        else:
            spf = 1152 if (layer == 3 and version == 3) or layer == 2 else 576
            size = spf // 8 * kbps * 1000 // rate + padding
        if size <= 4:
            pos += 1
            continue
        if n_frames == 0:
            sr = rate
            channels = 1 if ((b3 >> 6) & 0x3) == 3 else 2
            samples_per_frame = spf
            # Xing/Info header (VBR): frame count field
            for off in (pos + 36, pos + 21, pos + 13):  # stereo/mono MPEG1/2
                tag = content[off : off + 4]
                if tag in (b"Xing", b"Info") and content[off + 7 : off + 8]:
                    flags = int.from_bytes(content[off + 4 : off + 8], "big")
                    if flags & 1:
                        xing_frames = int.from_bytes(
                            content[off + 8 : off + 12], "big"
                        )
                    break
        n_frames += 1
        kbps_sum += kbps
        pos += size
    if not n_frames or sr is None:
        raise ValueError("no MPEG audio frame sync found")
    frames = xing_frames if xing_frames else n_frames
    return {
        "codec": "mp3",
        "sample_rate": sr,
        "channels": channels,
        "duration_s": round(frames * samples_per_frame / sr, 6),
        "n_frames": frames,
        "avg_kbps": round(kbps_sum / n_frames, 1),
    }


def _ogg_vorbis_metadata(content: bytes) -> dict:
    """Ogg/Vorbis METADATA from the container walk — no sample decode:
    channels + sample rate from the Vorbis identification header
    (first packet of the first page), duration from the LAST page's
    granule position (total PCM samples per the Ogg/Vorbis mapping).
    Raises ValueError on a non-Vorbis or truncated stream."""
    if content[:4] != b"OggS":
        raise ValueError("not an Ogg stream")
    # identification header: first page's first packet
    seg_n = content[26]
    body = 27 + seg_n
    if content[body : body + 7] != b"\x01vorbis":
        raise ValueError("first Ogg packet is not a Vorbis id header")
    channels = content[body + 11]
    sr = int.from_bytes(content[body + 12 : body + 16], "little")
    if not sr:
        raise ValueError("Vorbis id header carries zero sample rate")
    # walk pages for the last granulepos
    pos = 0
    last_granule = 0
    n_pages = 0
    while pos + 27 <= len(content) and content[pos : pos + 4] == b"OggS":
        gran = int.from_bytes(content[pos + 6 : pos + 14], "little", signed=True)
        if gran > 0:
            last_granule = gran
        nseg = content[pos + 26]
        seg_table = content[pos + 27 : pos + 27 + nseg]
        pos += 27 + nseg + sum(seg_table)
        n_pages += 1
    return {
        "codec": "vorbis",
        "sample_rate": sr,
        "channels": channels,
        "duration_s": round(last_granule / sr, 6),
        "n_pages": n_pages,
    }
