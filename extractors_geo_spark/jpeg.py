"""Pure-Python JPEG codec (JFIF; baseline SOF0/SOF1 AND progressive SOF2)
— no libjpeg/PIL.

Closes the jpeg leg of the multimodal decode path (the reference treats
image mimetypes via `file -b --mime-type` routing; this engine decodes
them). Implemented from the public ITU-T T.81 spec:

  encode(arr, quality): grayscale (h, w) or RGB (h, w, 3) uint8 ->
      baseline JFIF bytes. 4:4:4 sampling, Annex-K standard quantization
      (quality-scaled, IJG convention) and huffman tables, byte stuffing.
  encode_progressive(arr, quality): progressive (SOF2) JFIF with the
      standard multi-scan script (spectral selection + successive
      approximation, T.81 G.1.2) — used to build fixtures in-sandbox and
      as a real encoder in its own right.
  decode(data): baseline SOF0/SOF1 OR progressive SOF2 JFIF -> uint8
      array, grayscale (h, w) or RGB (h, w, 3). Supports 4:4:4 / 4:2:0 /
      4:2:2 sampling (nearest upsample), restart markers, 8-bit
      precision; progressive DC/AC first + refinement scans with EOB
      runs (T.81 G.2).

DCT is the exact orthonormal matrix form (D @ block @ D.T) in numpy —
bit-for-bit symmetric between encode and decode, so round-trip fidelity
is bounded by quantization alone (PSNR asserted in tests, north-rule
threshold 40 dB for lossy formats).

Entropy coding is bit-level pure Python: correct first, fast enough for
thumbnails. At 100 TB swap this module for libjpeg-turbo behind the same
two functions; every caller schema stays identical.
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K base quantization tables (luminance, chrominance)
_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32).reshape(8, 8)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32).reshape(8, 8)

_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])
_UNZZ = np.argsort(_ZZ)

# Annex K standard huffman specs: (bits[1..16], values)
_HT_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_HT_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_HT_AC_L = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_HT_AC_C = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# orthonormal DCT-II matrix: forward JPEG DCT of block B = (D @ B @ D.T) * 4
# with the standard scale folded in; inverse is exactly the transpose pair.
_D = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _D[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8))


def _dct2(b: np.ndarray) -> np.ndarray:
    return _D @ b @ _D.T


def _idct2(c: np.ndarray) -> np.ndarray:
    return _D.T @ c @ _D


def _quality_scale(q_table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(quality, 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = np.clip((q_table * s + 50) // 100, 1, 255)
    return t.astype(np.int32)


def _huff_encode_table(bits, values):
    """spec code assignment -> {value: (code, length)}."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1s


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude category + offset bits for a signed value."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(w: _BitWriter, zz: np.ndarray, dc_prev: int,
                  dc_tab: dict, ac_tab: dict) -> int:
    dc = int(zz[0])
    size, bits = _magnitude(dc - dc_prev)
    c, L = dc_tab[size]
    w.write(c, L)
    if size:
        w.write(bits, size)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if zz[i] != 0:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, L = ac_tab[0xF0]  # ZRL
            w.write(c, L)
            run -= 16
        size, bits = _magnitude(v)
        c, L = ac_tab[(run << 4) | size]
        w.write(c, L)
        w.write(bits, size)
        run = 0
    if last_nz < 63:
        c, L = ac_tab[0x00]  # EOB
        w.write(c, L)
    return dc


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0].astype(np.float64), rgb[..., 1].astype(np.float64), rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y, cb, cr) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _marker(tag: int, payload: bytes) -> bytes:
    return struct.pack(">HH", tag, len(payload) + 2) + payload


def _dht_payload(cls: int, tid: int, bits, values) -> bytes:
    return bytes([cls << 4 | tid]) + bytes(bits) + bytes(values)


def encode(arr: np.ndarray, quality: int = 85, subsampling: str = "444",
           restart_interval: int = 0) -> bytes:
    """Grayscale (h, w) or RGB (h, w, 3) uint8 -> baseline JFIF.
    subsampling '444' or '420' (color only); restart_interval in MCUs
    (0 = no restart markers)."""
    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError("expected (h,w) or (h,w,3) uint8")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    sub = 2 if (subsampling == "420" and not gray) else 1
    h, w = a.shape[:2]
    ql = _quality_scale(_QL, quality)
    qc = _quality_scale(_QC, quality)

    if gray:
        comps = [a.astype(np.float64)]
        qts = [ql]
        samps = [(1, 1)]
    else:
        ycc = _rgb_to_ycbcr(a)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if sub == 2:
            # 2x2 mean subsample (pad odd dims by edge replication first)
            ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            cb = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
            cr = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        comps = [y, cb, cr]
        qts = [ql, qc, qc]
        samps = [(sub, sub), (1, 1), (1, 1)]

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += _marker(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _marker(0xFFDB, bytes([0]) + bytes(ql.flat[_ZZ].astype(np.uint8)))
    if not gray:
        out += _marker(0xFFDB, bytes([1]) + bytes(qc.flat[_ZZ].astype(np.uint8)))
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        hs, vs = samps[ci]
        sof += bytes([ci + 1, hs << 4 | vs, 0 if ci == 0 else 1])
    out += _marker(0xFFC0, sof)
    out += _marker(0xFFC4, _dht_payload(0, 0, *_HT_DC_L))
    out += _marker(0xFFC4, _dht_payload(1, 0, *_HT_AC_L))
    if not gray:
        out += _marker(0xFFC4, _dht_payload(0, 1, *_HT_DC_C))
        out += _marker(0xFFC4, _dht_payload(1, 1, *_HT_AC_C))
    if restart_interval:
        out += _marker(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += _marker(0xFFDA, sos)

    dc_l = _huff_encode_table(*_HT_DC_L)
    ac_l = _huff_encode_table(*_HT_AC_L)
    dc_c = _huff_encode_table(*_HT_DC_C)
    ac_c = _huff_encode_table(*_HT_AC_C)
    tabs = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (nc - 1)

    # MCU geometry: hmax=vmax=sub for the Y plane, 1 for chroma
    mcux = (w + 8 * sub - 1) // (8 * sub)
    mcuy = (h + 8 * sub - 1) // (8 * sub)
    padded = []
    for ci, c in enumerate(comps):
        hs, vs = samps[ci]
        tw, th = mcux * 8 * hs, mcuy * 8 * vs
        padded.append(np.pad(c, ((0, th - c.shape[0]), (0, tw - c.shape[1])), mode="edge"))

    bw = _BitWriter()
    dc_prev = [0] * nc
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.buf += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                dc_prev = [0] * nc
            mcu_count += 1
            for ci in range(nc):
                hs, vs = samps[ci]
                for vy in range(vs):
                    for vx in range(hs):
                        y0 = (my * vs + vy) * 8
                        x0 = (mx * hs + vx) * 8
                        blk = padded[ci][y0:y0 + 8, x0:x0 + 8] - 128.0
                        coef = np.round(_dct2(blk) / qts[ci]).astype(np.int32)
                        zz = coef.flat[_ZZ]
                        dc_prev[ci] = _encode_block(bw, zz, dc_prev[ci], *tabs[ci])
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------- progressive encoder


def _mag_shift(v: int, al: int) -> int:
    """T.81 point transform for AC: magnitude shift, sign preserved."""
    return -((-v) >> al) if v < 0 else v >> al


def _emit_ac_first_block(bw_out: _BitWriter, blk_zz, ss: int, se: int, al: int,
                         ac_tab: dict) -> None:
    t = [_mag_shift(int(blk_zz[k]), al) for k in range(ss, se + 1)]
    last_nz = -1
    for i in range(len(t) - 1, -1, -1):
        if t[i] != 0:
            last_nz = i
            break
    run = 0
    for i in range(last_nz + 1):
        v = t[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, L = ac_tab[0xF0]
            bw_out.write(c, L)
            run -= 16
        size, bits = _magnitude(v)
        c, L = ac_tab[(run << 4) | size]
        bw_out.write(c, L)
        bw_out.write(bits, size)
        run = 0
    if last_nz < len(t) - 1:
        c, L = ac_tab[0x00]  # EOB0 (no EOB-run accumulation: valid, larger)
        bw_out.write(c, L)


def _emit_ac_refine_block(bw_out: _BitWriter, blk_zz, ss: int, se: int,
                          ah: int, al: int, ac_tab: dict) -> None:
    """Mirror of _ac_refine's read order: RS(run,1) + sign for each newly
    significant coefficient, correction bits for nonzero-history
    coefficients exactly where the decoder consumes them."""

    def hist(v: int) -> bool:
        return (abs(v) >> ah) != 0

    def newly(v: int) -> bool:
        return (abs(v) >> al) == 1 and not hist(v)

    def corr_bit(v: int) -> int:
        return (abs(v) >> al) & 1

    vals = [int(blk_zz[k]) for k in range(ss, se + 1)]
    targets = [i for i, v in enumerate(vals) if newly(v)]
    k = 0
    for t in targets:
        run = 0
        pending: list[int] = []
        pos = k
        while pos < t:
            v = vals[pos]
            if hist(v):
                pending.append(corr_bit(v))
            else:
                run += 1
                if run == 16:
                    c, L = ac_tab[0xF0]  # ZRL: decoder skips 16 zero-history
                    bw_out.write(c, L)
                    for b in pending:
                        bw_out.write(b, 1)
                    pending = []
                    run = 0
            pos += 1
        c, L = ac_tab[(run << 4) | 1]
        bw_out.write(c, L)
        bw_out.write(1 if vals[t] > 0 else 0, 1)
        for b in pending:
            bw_out.write(b, 1)
        k = t + 1
    if k <= se - ss:
        c, L = ac_tab[0x00]  # EOB, then corrections for the rest of the band
        bw_out.write(c, L)
        for i in range(k, se - ss + 1):
            if hist(vals[i]):
                bw_out.write(corr_bit(vals[i]), 1)


def encode_progressive(arr: np.ndarray, quality: int = 85,
                       subsampling: str = "444") -> bytes:
    """Grayscale (h, w) or RGB (h, w, 3) uint8 -> progressive (SOF2) JFIF
    using the standard spectral-selection + successive-approximation scan
    script (T.81 G.1.2; the same shape libjpeg emits by default).
    Transmits the identical quantized coefficients as encode(), so
    decode(encode_progressive(x)) == decode(encode(x)) bit for bit."""
    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError("expected (h,w) or (h,w,3) uint8")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    sub = 2 if (subsampling == "420" and not gray) else 1
    h, w = a.shape[:2]
    ql = _quality_scale(_QL, quality)
    qc = _quality_scale(_QC, quality)
    if gray:
        comps = [a.astype(np.float64)]
        qts = [ql]
        samps = [(1, 1)]
    else:
        ycc = _rgb_to_ycbcr(a)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if sub == 2:
            ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            cb = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
            cr = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        comps = [y, cb, cr]
        qts = [ql, qc, qc]
        samps = [(sub, sub), (1, 1), (1, 1)]
    nc = len(comps)
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # quantized coefficient grids, zigzag order, padded MCU geometry
    grids = []
    for ci, c in enumerate(comps):
        hs, vs = samps[ci]
        tw, th = mcux * 8 * hs, mcuy * 8 * vs
        p = np.pad(c, ((0, th - c.shape[0]), (0, tw - c.shape[1])), mode="edge") - 128.0
        bh_, bw_ = th // 8, tw // 8
        blocks = p.reshape(bh_, 8, bw_, 8).transpose(0, 2, 1, 3)
        coef = _D @ blocks @ _D.T  # matmul matches _dct2's FP association
        q = np.round(coef / qts[ci]).astype(np.int32).reshape(bh_, bw_, 64)
        grids.append(q[:, :, _ZZ])

    out = bytearray()
    out += b"\xff\xd8"
    out += _marker(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _marker(0xFFDB, bytes([0]) + bytes(ql.flat[_ZZ].astype(np.uint8)))
    if not gray:
        out += _marker(0xFFDB, bytes([1]) + bytes(qc.flat[_ZZ].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        hs, vs = samps[ci]
        sof += bytes([ci + 1, hs << 4 | vs, 0 if ci == 0 else 1])
    out += _marker(0xFFC2, sof)  # SOF2: progressive
    out += _marker(0xFFC4, _dht_payload(0, 0, *_HT_DC_L))
    out += _marker(0xFFC4, _dht_payload(1, 0, *_HT_AC_L))
    if not gray:
        out += _marker(0xFFC4, _dht_payload(0, 1, *_HT_DC_C))
        out += _marker(0xFFC4, _dht_payload(1, 1, *_HT_AC_C))

    dc_enc = [_huff_encode_table(*_HT_DC_L)] + [_huff_encode_table(*_HT_DC_C)] * (nc - 1)
    ac_enc = [_huff_encode_table(*_HT_AC_L)] + [_huff_encode_table(*_HT_AC_C)] * (nc - 1)

    if gray:
        script = [([0], 0, 0, 0, 1), ([0], 1, 5, 0, 2), ([0], 6, 63, 0, 2),
                  ([0], 1, 63, 2, 1), ([0], 0, 0, 1, 0), ([0], 1, 63, 1, 0)]
    else:
        script = [([0, 1, 2], 0, 0, 0, 1), ([0], 1, 5, 0, 2),
                  ([2], 1, 63, 0, 1), ([1], 1, 63, 0, 1), ([0], 6, 63, 0, 2),
                  ([0], 1, 63, 2, 1), ([0, 1, 2], 0, 0, 1, 0),
                  ([2], 1, 63, 1, 0), ([1], 1, 63, 1, 0), ([0], 1, 63, 1, 0)]

    for scomps, ss, se, ah, al in script:
        sos = bytes([len(scomps)])
        for ci in scomps:
            dct = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (dct << 4) | dct])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _marker(0xFFDA, sos)
        bw_out = _BitWriter()
        if ss == 0:  # DC scan
            if len(scomps) == 1:
                ci = scomps[0]
                hs, vs = samps[ci]
                cw = (w * hs + hmax - 1) // hmax
                ch = (h * vs + vmax - 1) // vmax
                bw_, bh_ = (cw + 7) // 8, (ch + 7) // 8
                dc_prev = 0
                for by in range(bh_):
                    for bx in range(bw_):
                        v = int(grids[ci][by, bx, 0]) >> al
                        if ah == 0:
                            size, bits = _magnitude(v - dc_prev)
                            c, L = dc_enc[ci][size]
                            bw_out.write(c, L)
                            if size:
                                bw_out.write(bits, size)
                            dc_prev = v
                        else:
                            bw_out.write(v & 1, 1)
            else:
                dc_prev = [0] * len(scomps)
                for my in range(mcuy):
                    for mx in range(mcux):
                        for si, ci in enumerate(scomps):
                            hs, vs = samps[ci]
                            for vy in range(vs):
                                for vx in range(hs):
                                    v = int(grids[ci][my * vs + vy, mx * hs + vx, 0]) >> al
                                    if ah == 0:
                                        size, bits = _magnitude(v - dc_prev[si])
                                        c, L = dc_enc[ci][size]
                                        bw_out.write(c, L)
                                        if size:
                                            bw_out.write(bits, size)
                                        dc_prev[si] = v
                                    else:
                                        bw_out.write(v & 1, 1)
        else:  # AC scan: single component, unpadded grid
            ci = scomps[0]
            hs, vs = samps[ci]
            cw = (w * hs + hmax - 1) // hmax
            ch = (h * vs + vmax - 1) // vmax
            bw_, bh_ = (cw + 7) // 8, (ch + 7) // 8
            for by in range(bh_):
                for bx in range(bw_):
                    blk = grids[ci][by, bx]
                    if ah == 0:
                        _emit_ac_first_block(bw_out, blk, ss, se, al, ac_enc[ci])
                    else:
                        _emit_ac_refine_block(bw_out, blk, ss, se, ah, al, ac_enc[ci])
        bw_out.flush()
        out += bw_out.buf
    out += b"\xff\xd9"
    return bytes(out)


# ------------------------------------------------------------------ decoder


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.p = pos
        self.acc = 0
        self.n = 0

    def _fill(self):
        while self.n <= 24:
            if self.p >= len(self.d):
                self.acc = (self.acc << 8) | 0xFF  # pad past EOI
                self.n += 8
                continue
            b = self.d[self.p]
            if b == 0xFF:
                nxt = self.d[self.p + 1] if self.p + 1 < len(self.d) else 0xD9
                if nxt == 0x00:
                    self.p += 2
                elif 0xD0 <= nxt <= 0xD7:
                    break  # restart marker: consumed by the MCU loop
                else:
                    break  # EOI / next segment
            else:
                self.p += 1
            self.acc = (self.acc << 8) | b
            self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
            if self.n == 0:
                return 1
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self):
        """Consume an RSTn marker at a restart interval boundary."""
        self.acc = 0
        self.n = 0
        while self.p + 1 < len(self.d):
            if self.d[self.p] == 0xFF and 0xD0 <= self.d[self.p + 1] <= 0xD7:
                self.p += 2
                return
            self.p += 1


def _huff_decode_table(bits, values):
    """{(length, code): value} plus max length for linear scan decode."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_huff(r: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("bad huffman code")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _next_marker(data: bytes, pos: int) -> int:
    """First position >= pos of a non-stuffing, non-RST marker.

    T.81 B.1.1.2 allows any number of 0xFF fill bytes before a marker code;
    returning the FIRST 0xFF of such a run would read m=0xFF and a bogus
    segment length, so skip to the last 0xFF of the run (ADVICE r03)."""
    n = len(data)
    while pos + 1 < n:
        if data[pos] == 0xFF and data[pos + 1] == 0xFF:
            pos += 1  # fill byte: the marker (if any) starts at the LAST 0xFF
            continue
        if data[pos] == 0xFF and data[pos + 1] != 0x00 and not (0xD0 <= data[pos + 1] <= 0xD7):
            return pos
        pos += 1
    return n


def decode(data: bytes) -> np.ndarray:
    """Baseline (SOF0/SOF1) or progressive (SOF2) JFIF -> uint8 (h, w) or
    (h, w, 3)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = None
    h = w = 0
    restart_interval = 0
    progressive = False
    coeffs: list[np.ndarray] | None = None  # per-comp (bh, bw, 64) zigzag
    hmax = vmax = 1
    mcux = mcuy = 0
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        m = data[pos + 1]
        if m == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if m == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                t = np.zeros(64, dtype=np.int32)
                t[_ZZ] = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8)
                qt[tq] = t.reshape(8, 8)
                i += 65
        elif m == 0xC4:
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                cnt = sum(bits)
                values = list(body[i + 17 : i + 17 + cnt])
                huff[(cls, tid)] = _huff_decode_table(bits, values)
                i += 17 + cnt
        elif m in (0xC0, 0xC1, 0xC2):
            progressive = m == 0xC2
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision")
            comps = []
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "hs": samp >> 4, "vs": samp & 0xF, "tq": tq})
            hmax = max(c["hs"] for c in comps)
            vmax = max(c["vs"] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            if progressive:
                # coefficients accumulate across scans on the padded
                # (interleaved-MCU) block grid, in ZIGZAG order
                coeffs = [
                    np.zeros((mcuy * c["vs"], mcux * c["hs"], 64), np.int32)
                    for c in comps
                ]
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline or progressive huffman JPEG supported")
        elif m == 0xDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif m == 0xDA and progressive:
            pos = _decode_prog_scan(
                data, pos, body, comps, huff, coeffs, hmax, vmax, w, h,
                mcux, mcuy, restart_interval,
            )
        elif m == 0xDA:
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si], body[2 + 2 * si]
                comp = next(c for c in comps if c["id"] == cs)
                scan.append({**comp, "dc": tt >> 4, "ac": tt & 0xF})
            r = _BitReader(data, pos)
            hmax = max(c["hs"] for c in scan)
            vmax = max(c["vs"] for c in scan)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            planes = []
            for c in scan:
                pw, ph = mcux * 8 * c["hs"], mcuy * 8 * c["vs"]
                planes.append(np.zeros((ph, pw)))
            dc_prev = [0] * ns
            mcu_count = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                        r.sync_restart()
                        dc_prev = [0] * ns
                    mcu_count += 1
                    for si, c in enumerate(scan):
                        for vy in range(c["vs"]):
                            for vx in range(c["hs"]):
                                zz = np.zeros(64, dtype=np.int32)
                                s = _read_huff(r, huff[(0, c["dc"])])
                                diff = _extend(r.read_bits(s), s)
                                dc_prev[si] += diff
                                zz[0] = dc_prev[si]
                                k = 1
                                while k < 64:
                                    rs = _read_huff(r, huff[(1, c["ac"])])
                                    rr, ss = rs >> 4, rs & 0xF
                                    if ss == 0:
                                        if rr == 15:
                                            k += 16
                                            continue
                                        break  # EOB
                                    k += rr
                                    if k > 63:
                                        raise ValueError("AC index out of range")
                                    zz[k] = _extend(r.read_bits(ss), ss)
                                    k += 1
                                coef = np.zeros(64, dtype=np.float64)
                                coef[_ZZ] = zz
                                blk = _idct2(coef.reshape(8, 8) * qt[c["tq"]]) + 128.0
                                y0 = (my * c["vs"] + vy) * 8
                                x0 = (mx * c["hs"] + vx) * 8
                                planes[si][y0 : y0 + 8, x0 : x0 + 8] = blk
            # upsample to full res and crop
            full = []
            for si, c in enumerate(scan):
                p = planes[si]
                ry, rx = vmax // c["vs"], hmax // c["hs"]
                if ry > 1 or rx > 1:
                    p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
                full.append(p[:h, :w])
            if ns == 1:
                return np.clip(full[0], 0, 255).astype(np.uint8)
            return _ycbcr_to_rgb(full[0], full[1], full[2])
        # other segments (APPn, COM): skipped by the generic length logic
    if progressive and coeffs is not None:
        return _reconstruct(coeffs, comps, qt, w, h, hmax, vmax)
    raise ValueError("no scan found")


def _decode_prog_scan(data, pos, body, comps, huff, coeffs, hmax, vmax,
                      w, h, mcux, mcuy, restart_interval) -> int:
    """One progressive SOS: accumulate into the zigzag coefficient grids
    (T.81 G.2). Returns the stream position of the next marker."""
    ns = body[0]
    scan = []
    for si in range(ns):
        cs, tt = body[1 + 2 * si], body[2 + 2 * si]
        ci = next(i for i, c in enumerate(comps) if c["id"] == cs)
        scan.append({"ci": ci, **comps[ci], "dc": tt >> 4, "ac": tt & 0xF})
    ss, se, ahal = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
    ah, al = ahal >> 4, ahal & 0xF
    r = _BitReader(data, pos)
    eobrun = 0
    if ns == 1:
        # non-interleaved scan (T.81: any single-component scan):
        # MCU = one block over the UNPADDED comp grid
        c = scan[0]
        cw = (w * c["hs"] + hmax - 1) // hmax
        ch = (h * c["vs"] + vmax - 1) // vmax
        bw_, bh_ = (cw + 7) // 8, (ch + 7) // 8
        grid = coeffs[c["ci"]]
        dc_prev = 0
        count = 0
        for by in range(bh_):
            for bx in range(bw_):
                if restart_interval and count and count % restart_interval == 0:
                    r.sync_restart()
                    dc_prev = 0
                    eobrun = 0
                count += 1
                blk = grid[by, bx]
                if ss == 0:
                    if ah == 0:
                        s = _read_huff(r, huff[(0, c["dc"])])
                        dc_prev += _extend(r.read_bits(s), s)
                        blk[0] = dc_prev << al
                    else:
                        if r.read_bit():
                            blk[0] |= 1 << al
                elif ah == 0:
                    eobrun = _ac_first(r, blk, ss, se, al, huff[(1, c["ac"])], eobrun)
                else:
                    eobrun = _ac_refine(r, blk, ss, se, al, huff[(1, c["ac"])], eobrun)
    else:
        # interleaved scan (progressive: DC only, T.81 B.2.3)
        if ss != 0:
            raise ValueError("interleaved progressive AC scan is not valid")
        dc_prev = [0] * ns
        count = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and count and count % restart_interval == 0:
                    r.sync_restart()
                    dc_prev = [0] * ns
                count += 1
                for si, c in enumerate(scan):
                    for vy in range(c["vs"]):
                        for vx in range(c["hs"]):
                            blk = coeffs[c["ci"]][my * c["vs"] + vy, mx * c["hs"] + vx]
                            if ah == 0:
                                s = _read_huff(r, huff[(0, c["dc"])])
                                dc_prev[si] += _extend(r.read_bits(s), s)
                                blk[0] = dc_prev[si] << al
                            else:
                                if r.read_bit():
                                    blk[0] |= 1 << al
    return _next_marker(data, r.p)


def _ac_first(r: _BitReader, blk: np.ndarray, ss: int, se: int, al: int,
              ac_table: dict, eobrun: int) -> int:
    """AC first scan (Ah=0) for one block; returns the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _read_huff(r, ac_table)
        run, s = rs >> 4, rs & 0xF
        if s == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            eobrun = 1 << run
            if run:
                eobrun += r.read_bits(run)
            return eobrun - 1  # current block is the first of the run
        k += run
        if k > se:
            raise ValueError("AC index out of band")
        blk[k] = _extend(r.read_bits(s), s) << al
        k += 1
    return 0


def _ac_refine(r: _BitReader, blk: np.ndarray, ss: int, se: int, al: int,
               ac_table: dict, eobrun: int) -> int:
    """AC refinement scan (Ah=Al+1) for one block (T.81 G.1.2.3 decoder
    mirror): newly-significant coefficients arrive as run/1 symbols with a
    sign bit; every nonzero-history coefficient passed (or remaining after
    EOB) consumes one correction bit."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _read_huff(r, ac_table)
            run, s = rs >> 4, rs & 0xF
            val = 0
            if s == 0:
                if run < 15:
                    eobrun = 1 << run
                    if run:
                        eobrun += r.read_bits(run)
                    break
                # run == 15 (ZRL): skip 16 zero-history positions
            else:
                val = p1 if r.read_bit() else -p1
            while k <= se:
                v = int(blk[k])
                if v != 0:
                    if r.read_bit() and (v & p1) == 0:
                        blk[k] = v + (p1 if v > 0 else -p1)
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if val != 0 and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            v = int(blk[k])
            if v != 0 and r.read_bit() and (v & p1) == 0:
                blk[k] = v + (p1 if v > 0 else -p1)
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct(coeffs, comps, qt, w, h, hmax, vmax) -> np.ndarray:
    """Dequantize + IDCT the accumulated coefficient grids (vectorized:
    one einsum per component, no per-block Python loop)."""
    planes = []
    for ci, c in enumerate(comps):
        cz = coeffs[ci]
        bh_, bw_ = cz.shape[:2]
        nat = np.zeros_like(cz)
        nat[..., _ZZ] = cz
        blocks = nat.reshape(bh_, bw_, 8, 8).astype(np.float64) * qt[c["tq"]]
        # broadcast matmul, NOT einsum: identical FP association to the
        # per-block baseline _idct2, so baseline and progressive decodes
        # of the same coefficients are bit-identical
        out = _D.T @ blocks @ _D + 128.0
        p = out.transpose(0, 2, 1, 3).reshape(bh_ * 8, bw_ * 8)
        ry, rx = vmax // c["vs"], hmax // c["hs"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        planes.append(p[:h, :w])
    if len(planes) == 1:
        return np.clip(planes[0], 0, 255).astype(np.uint8)
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])
