"""Pure-stdlib ISO-BMFF (MP4) sample extraction for JPEG-codec video
tracks — the second fully-real video path next to MJPEG-in-AVI.

Public-spec implementation (ISO/IEC 14496-12): walks moov/trak/mdia/
minf/stbl, reads the sample tables (stsd sample-description fourcc,
stsz sizes, stco/co64 chunk offsets, stsc sample-to-chunk runs, stts
time deltas, mdhd timescale) and materializes per-sample byte ranges.
Tracks whose sample description is 'jpeg'/'mjpa'/'AVDJ' decode with the
in-repo T.81 codec; uncompressed 'raw '/'Y800' tracks carry their pixels
directly in the samples (VERDICT r03 #7); any other codec stays on the
documented fake path.

  write_mjpeg_mp4(frames, fps): uint8 arrays -> MP4 bytes (one video
      track, codec 'jpeg', one chunk; used for fixtures AND as a real
      encoder).
  read_mjpeg_mp4(data): MP4 bytes -> {width, height, timescale,
      timestamps_ms, frames: [jpeg bytes...]}. Raises ValueError when no
      JPEG-codec video track exists.
"""

from __future__ import annotations

import struct

import numpy as np

from . import jpeg as _jpeg

_JPEG_FOURCC = (b"jpeg", b"mjpa", b"AVDJ", b"MJPG")
# uncompressed tracks (QuickTime 'raw ' RGB/gray, 'Y800' 8-bit gray):
# sample bytes ARE the pixels — the cheap real non-JPEG path (VERDICT r03 #7)
_RAW_FOURCC = (b"raw ", b"Y800")
# H.264: real NAL/avcC plumbing; PIXELS decode for the in-repo profile
# (I_PCM bit-exact, CAVLC/CABAC intra + P incl. 16x8/8x16 partitions,
# CAVLC B slices with ctts reordering) — out-of-profile samples raise
# downstream
_AVC_FOURCC = (b"avc1", b"avc3")
_SUPPORTED_FOURCC = _JPEG_FOURCC + _RAW_FOURCC + _AVC_FOURCC


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + typ + payload


def _full(typ: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(typ, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + payload)


def write_mjpeg_mp4(frames: list[np.ndarray], fps: int = 10, quality: int = 90) -> bytes:
    """JPEG-encode frames into a minimal single-track 'jpeg'-codec MP4."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    samples = [_jpeg.encode(np.asarray(f, np.uint8), quality=quality) for f in frames]
    return _assemble_mp4(samples, w, h, fps, fourcc=b"jpeg", depth=24)


_MATRIX = struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)


def _walk(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError("malformed MP4 box")
        yield typ, pos + hdr, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, typ: bytes):
    for t, b0, b1 in _walk(data, start, end):
        if t == typ:
            return b0, b1
    return None


def write_raw_mp4(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """Uncompressed grayscale frames -> minimal 'raw '-codec MP4 (depth 8,
    one sample per frame, sample bytes = row-major pixels). The rawvideo
    analog of write_mjpeg_mp4; exercises the non-JPEG real-pixel path."""
    if not frames:
        raise ValueError("no frames")
    arrs = [np.ascontiguousarray(np.asarray(f, np.uint8)) for f in frames]
    h, w = arrs[0].shape[:2]
    if any(a.shape != arrs[0].shape or a.ndim != 2 for a in arrs):
        raise ValueError("write_raw_mp4 wants same-shape 2-D gray frames")
    samples = [a.tobytes() for a in arrs]
    return _assemble_mp4(samples, w, h, fps, fourcc=b"raw ", depth=8)


def _assemble_mp4(samples: list[bytes], w: int, h: int, fps: int,
                  fourcc: bytes, depth: int, entry_extra: bytes = b"",
                  ctts_offsets: list[int] | None = None) -> bytes:
    n = len(samples)
    timescale = 90000
    delta = timescale // fps
    duration = n * delta
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat_payload = b"".join(samples)
    chunk_offset = len(ftyp) + 8
    mvhd = _full(b"mvhd", 0, 0,
                 struct.pack(">IIII", 0, 0, timescale, duration)
                 + struct.pack(">iH H 8x 36s 24x", 0x00010000, 0x0100, 0,
                               _MATRIX) + struct.pack(">I", 2))
    tkhd = _full(b"tkhd", 0, 7,
                 struct.pack(">IIII", 0, 0, 1, 0) + struct.pack(">I", duration)
                 + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0, 0)
                 + _MATRIX + struct.pack(">II", w << 16, h << 16))
    mdhd = _full(b"mdhd", 0, 0,
                 struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"video\x00")
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    vse = (b"\x00" * 6 + struct.pack(">H", 1)
           + b"\x00" * 16
           + struct.pack(">HH", w, h)
           + struct.pack(">II", 0x00480000, 0x00480000)
           + b"\x00" * 4 + struct.pack(">H", 1)
           + b"\x00" * 32
           + struct.pack(">Hh", depth, -1))
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + _box(fourcc, vse + entry_extra))
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    ctts = b""
    if ctts_offsets is not None:
        assert len(ctts_offsets) == n
        ctts = _full(b"ctts", 0, 0, struct.pack(">I", n) + b"".join(
            struct.pack(">Ii", 1, o) for o in ctts_offsets))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n)
                 + b"".join(struct.pack(">I", len(s)) for s in samples))
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset))
    stbl = _box(b"stbl", stsd + stts + ctts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_payload) + moov


def write_fragmented_mp4(frames: list[np.ndarray], fps: int = 10,
                         quality: int = 90, frames_per_fragment: int = 4,
                         codec: bytes = b"jpeg") -> bytes:
    """DASH-style fragmented MP4: moov carries only the track header +
    mvex/trex defaults; samples live in moof/traf/trun + mdat pairs.
    Real encoder for 'jpeg' (T.81) and 'raw ' (gray pixels) tracks, and
    the fixture generator for the fragmented read path."""
    if not frames:
        raise ValueError("no frames")
    arrs = [np.ascontiguousarray(np.asarray(f, np.uint8)) for f in frames]
    h, w = arrs[0].shape[:2]
    if codec == b"jpeg":
        samples = [_jpeg.encode(a, quality=quality) for a in arrs]
        depth = 24
    elif codec == b"raw ":
        samples = [a.tobytes() for a in arrs]
        depth = 8
    else:
        raise ValueError("codec must be b'jpeg' or b'raw '")
    timescale = 90000
    delta = timescale // fps

    ftyp = _box(b"ftyp", b"iso5" + struct.pack(">I", 512) + b"iso5iso6mp41")
    mvhd = _full(b"mvhd", 0, 0,
                 struct.pack(">IIII", 0, 0, timescale, 0)  # duration 0: fragmented
                 + struct.pack(">iH H 8x 36s 24x", 0x00010000, 0x0100, 0,
                               _MATRIX) + struct.pack(">I", 2))
    tkhd = _full(b"tkhd", 0, 7,
                 struct.pack(">IIII", 0, 0, 1, 0) + struct.pack(">I", 0)
                 + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0, 0)
                 + _MATRIX + struct.pack(">II", w << 16, h << 16))
    mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, timescale, 0, 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"video\x00")
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dinf = _box(b"dinf", _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b"")))
    vse = (b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
           + struct.pack(">HH", w, h) + struct.pack(">II", 0x00480000, 0x00480000)
           + b"\x00" * 4 + struct.pack(">H", 1) + b"\x00" * 32
           + struct.pack(">Hh", depth, -1))
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + _box(codec, vse))
    # empty sample tables: all samples arrive in fragments
    stbl = _box(b"stbl", stsd + _full(b"stts", 0, 0, struct.pack(">I", 0))
                + _full(b"stsc", 0, 0, struct.pack(">I", 0))
                + _full(b"stsz", 0, 0, struct.pack(">II", 0, 0))
                + _full(b"stco", 0, 0, struct.pack(">I", 0)))
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    trex = _full(b"trex", 0, 0, struct.pack(">IIIII", 1, 1, delta, 0, 0))
    mvex = _box(b"mvex", trex)
    moov = _box(b"moov", mvhd + mvex + trak)

    out = ftyp + moov
    t_acc = 0
    for fi, start in enumerate(range(0, len(samples), frames_per_fragment)):
        chunk = samples[start : start + frames_per_fragment]
        mfhd = _full(b"mfhd", 0, 0, struct.pack(">I", fi + 1))
        # tfhd: default-base-is-moof (0x020000); trun: data-offset (0x1)
        # + sample-size-present (0x200); durations come from trex
        tfhd = _full(b"tfhd", 0, 0x020000, struct.pack(">I", 1))
        tfdt = _full(b"tfdt", 1, 0, struct.pack(">Q", t_acc))
        trun_payload = struct.pack(">I", len(chunk))
        trun_payload += struct.pack(">i", 0)  # data_offset patched below
        trun_payload += b"".join(struct.pack(">I", len(s)) for s in chunk)
        trun = _full(b"trun", 0, 0x000201, trun_payload)
        traf = _box(b"traf", tfhd + tfdt + trun)
        moof = _box(b"moof", mfhd + traf)
        # patch data_offset: first sample byte relative to moof start
        data_offset = len(moof) + 8  # moof + mdat header
        # trun payload sits at: moof hdr(8) + mfhd + traf hdr(8) + tfhd + tfdt + trun hdr(8+4) + count(4)
        off_pos = 8 + len(mfhd) + 8 + len(tfhd) + len(tfdt) + 12 + 4
        moof = moof[:off_pos] + struct.pack(">i", data_offset) + moof[off_pos + 4:]
        out += moof + _box(b"mdat", b"".join(chunk))
        t_acc += len(chunk) * delta
    return out


def _read_fragments(data: bytes, track_id: int, trex: dict, timescale: int):
    """Collect (frames, timestamps_ms, duration_ms) from moof/traf/trun."""
    frames: list[bytes] = []
    ts_ms: list[int] = []
    t_acc = 0
    for typ, b0, b1 in _walk(data, 0, len(data)):
        if typ != b"moof":
            continue
        moof_start = b0 - 8
        for t2, c0, c1 in _walk(data, b0, b1):
            if t2 != b"traf":
                continue
            tfhd = _find(data, c0, c1, b"tfhd")
            if tfhd is None:
                continue
            fl = int.from_bytes(data[tfhd[0] + 1 : tfhd[0] + 4], "big")
            p = tfhd[0] + 4
            (tid,) = struct.unpack(">I", data[p : p + 4])
            p += 4
            if tid != track_id:
                continue
            base = moof_start if fl & 0x020000 else 0
            if fl & 0x000001:  # base_data_offset present
                (base,) = struct.unpack(">Q", data[p : p + 8])
                p += 8
            if fl & 0x000002:
                p += 4  # sample_description_index
            def_dur = trex.get("duration", 0)
            if fl & 0x000008:
                (def_dur,) = struct.unpack(">I", data[p : p + 4])
                p += 4
            def_size = trex.get("size", 0)
            if fl & 0x000010:
                (def_size,) = struct.unpack(">I", data[p : p + 4])
                p += 4
            tfdt = _find(data, c0, c1, b"tfdt")
            if tfdt is not None:
                ver = data[tfdt[0]]
                t_acc = (struct.unpack(">Q", data[tfdt[0] + 4 : tfdt[0] + 12])[0]
                         if ver == 1 else
                         struct.unpack(">I", data[tfdt[0] + 4 : tfdt[0] + 8])[0])
            for t3, d0, d1 in _walk(data, c0, c1):
                if t3 != b"trun":
                    continue
                tr_fl = int.from_bytes(data[d0 + 1 : d0 + 4], "big")
                p2 = d0 + 4
                (cnt,) = struct.unpack(">I", data[p2 : p2 + 4])
                p2 += 4
                pos = base
                if tr_fl & 0x000001:
                    (doff,) = struct.unpack(">i", data[p2 : p2 + 4])
                    p2 += 4
                    pos = base + doff
                if tr_fl & 0x000004:
                    p2 += 4  # first_sample_flags
                for _ in range(cnt):
                    dur = def_dur
                    size = def_size
                    if tr_fl & 0x000100:
                        (dur,) = struct.unpack(">I", data[p2 : p2 + 4])
                        p2 += 4
                    if tr_fl & 0x000200:
                        (size,) = struct.unpack(">I", data[p2 : p2 + 4])
                        p2 += 4
                    if tr_fl & 0x000400:
                        p2 += 4  # sample_flags
                    if tr_fl & 0x000800:
                        p2 += 4  # composition offset
                    frames.append(data[pos : pos + size])
                    ts_ms.append(int(t_acc * 1000 / timescale))
                    pos += size
                    t_acc += dur
    return frames, ts_ms, int(t_acc * 1000 / timescale)


def _stbl_samples(data: bytes, stbl, timescale: int):
    """Expand one track's sample tables (stsz/stco|co64/stsc/stts) into
    (sample bytes list, timestamps_ms, end_time_in_timescale)."""

    def full_payload(span):
        return span[0] + 4  # skip version/flags

    sz = _find(data, *stbl, b"stsz")
    p = full_payload(sz)
    fixed, cnt = struct.unpack(">II", data[p : p + 8])
    sizes = ([fixed] * cnt if fixed else
             list(struct.unpack(f">{cnt}I", data[p + 8 : p + 8 + 4 * cnt])))
    co = _find(data, *stbl, b"stco")
    if co is not None:
        p = full_payload(co)
        (nch,) = struct.unpack(">I", data[p : p + 4])
        offsets = list(struct.unpack(f">{nch}I", data[p + 4 : p + 4 + 4 * nch]))
    else:
        co = _find(data, *stbl, b"co64")
        p = full_payload(co)
        (nch,) = struct.unpack(">I", data[p : p + 4])
        offsets = list(struct.unpack(f">{nch}Q", data[p + 4 : p + 4 + 8 * nch]))
    sc = _find(data, *stbl, b"stsc")
    p = full_payload(sc)
    (nsc,) = struct.unpack(">I", data[p : p + 4])
    sc_rows = [struct.unpack(">III", data[p + 4 + 12 * i : p + 16 + 12 * i])
               for i in range(nsc)]
    tt = _find(data, *stbl, b"stts")
    p = full_payload(tt)
    (ntt,) = struct.unpack(">I", data[p : p + 4])
    tt_rows = [struct.unpack(">II", data[p + 4 + 8 * i : p + 12 + 8 * i])
               for i in range(ntt)]

    samples: list[bytes] = []
    si = 0
    for ci, off in enumerate(offsets):
        spc = 1
        for first, per, _sdi in sc_rows:
            if ci + 1 >= first:
                spc = per
        pos = off
        for _ in range(spc):
            if si >= len(sizes):
                break
            samples.append(data[pos : pos + sizes[si]])
            pos += sizes[si]
            si += 1
    dts = []
    t_acc = 0
    for cnt2, delta in tt_rows:
        for _ in range(cnt2):
            dts.append(t_acc)
            t_acc += delta
    # ctts (composition offsets, B-frame reordering): presentation time =
    # dts + offset, normalized so the earliest presentation is 0
    ct = _find(data, *stbl, b"ctts")
    if ct is not None:
        p = full_payload(ct)
        (nct,) = struct.unpack(">I", data[p : p + 4])
        offs = []
        for i in range(nct):
            cnt3, off = struct.unpack(">Ii", data[p + 4 + 8 * i : p + 12 + 8 * i])
            offs.extend([off] * cnt3)
        cts = [d + (offs[i] if i < len(offs) else 0)
               for i, d in enumerate(dts)]
        base = min(cts) if cts else 0
        cts = [c - base for c in cts]
    else:
        cts = dts
    ts = [int(c * 1000 / timescale) for c in cts]
    return samples, ts, t_acc


_TEXT_FOURCC = (b"tx3g", b"text")


def read_caption_track(data: bytes) -> list[tuple[int, str]]:
    """Extract a tx3g/text caption track: [(start_ms, text), ...] —
    the caption half of the image+caption north star when the source is
    a video container. Raises ValueError when no caption track exists."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an MP4")
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("no moov")
    for t, b0, b1 in _walk(data, *moov):
        if t != b"trak":
            continue
        mdia = _find(data, b0, b1, b"mdia")
        if mdia is None:
            continue
        mdhd = _find(data, *mdia, b"mdhd")
        minf = _find(data, *mdia, b"minf")
        if minf is None or mdhd is None:
            continue
        stbl = _find(data, *minf, b"stbl")
        if stbl is None:
            continue
        stsd = _find(data, *stbl, b"stsd")
        if stsd is None or data[stsd[0] + 12 : stsd[0] + 16] not in _TEXT_FOURCC:
            continue
        ver = data[mdhd[0]]
        ts_off = mdhd[0] + (20 if ver == 1 else 12)
        (timescale,) = struct.unpack(">I", data[ts_off : ts_off + 4])
        samples, ts, _end = _stbl_samples(data, stbl, timescale)
        out = []
        for s, t_ms in zip(samples, ts):
            if len(s) < 2:
                continue
            (ln,) = struct.unpack(">H", s[:2])
            out.append((t_ms, s[2 : 2 + ln].decode("utf-8", "replace")))
        return out
    raise ValueError("no caption track")


def write_mp4_with_captions(frames: list, fps: int, captions: list[str],
                            caption_ms: int = 1000, quality: int = 90) -> bytes:
    """Two-track MP4: a 'jpeg' video track plus a 'tx3g' caption track
    (one caption per `caption_ms`). Fixture generator AND a real encoder
    for caption-bearing clips."""
    import numpy as np

    if not frames or not captions:
        raise ValueError("need frames and captions")
    arrs = [np.ascontiguousarray(np.asarray(f, np.uint8)) for f in frames]
    h, w = arrs[0].shape[:2]
    vsamples = [_jpeg.encode(a, quality=quality) for a in arrs]
    csamples = [struct.pack(">H", len(c.encode())) + c.encode() for c in captions]
    timescale = 90000
    vdelta = timescale // fps
    vdur = len(vsamples) * vdelta
    cdelta = caption_ms * timescale // 1000
    cdur = len(csamples) * cdelta
    dur = max(vdur, cdur)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat_payload = b"".join(vsamples) + b"".join(csamples)
    v_off = len(ftyp) + 8
    c_off = v_off + sum(len(s) for s in vsamples)

    mvhd = _full(b"mvhd", 0, 0,
                 struct.pack(">IIII", 0, 0, timescale, dur)
                 + struct.pack(">iH H 8x 36s 24x", 0x00010000, 0x0100, 0,
                               _MATRIX) + struct.pack(">I", 3))

    def track(track_id, handler, stsd_entry, n, delta, sizes, chunk_off, tw, th):
        tkhd = _full(b"tkhd", 0, 7,
                     struct.pack(">IIII", 0, 0, track_id, 0) + struct.pack(">I", dur)
                     + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0, 0)
                     + _MATRIX + struct.pack(">II", tw << 16, th << 16))
        mdhd = _full(b"mdhd", 0, 0,
                     struct.pack(">IIIIHH", 0, 0, timescale, n * delta, 0x55C4, 0))
        hdlr = _full(b"hdlr", 0, 0, b"\x00" * 4 + handler + b"\x00" * 12 + b"trk\x00")
        mhd = (_full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
               if handler == b"vide" else _full(b"nmhd", 0, 0, b""))
        dinf = _box(b"dinf", _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b"")))
        stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + stsd_entry)
        stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
        stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
        stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n)
                     + b"".join(struct.pack(">I", s) for s in sizes))
        stco = _full(b"stco", 0, 0, struct.pack(">II", 1, chunk_off))
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = _box(b"minf", mhd + dinf + stbl)
        return _box(b"trak", tkhd + _box(b"mdia", mdhd + hdlr + minf))

    vse = (b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
           + struct.pack(">HH", w, h) + struct.pack(">II", 0x00480000, 0x00480000)
           + b"\x00" * 4 + struct.pack(">H", 1) + b"\x00" * 32
           + struct.pack(">Hh", 24, -1))
    tse = (b"\x00" * 6 + struct.pack(">H", 1)      # reserved + data_ref_index
           + struct.pack(">I", 0)                   # displayFlags
           + struct.pack(">bb", 1, -1)              # justification
           + b"\x00" * 4                            # bg color
           + struct.pack(">hhhh", 0, 0, h, w)       # default text box
           + struct.pack(">HHHBB", 0, 0, 0, 12, 0)  # style record head
           + b"\x00" * 4)                           # style color
    vtrak = track(1, b"vide", _box(b"jpeg", vse), len(vsamples), vdelta,
                  [len(s) for s in vsamples], v_off, w, h)
    ctrak = track(2, b"text", _box(b"tx3g", tse), len(csamples), cdelta,
                  [len(s) for s in csamples], c_off, 0, 0)
    moov = _box(b"moov", mvhd + vtrak + ctrak)
    # chunk offsets were computed for layout ftyp|mdat|moov
    return ftyp + _box(b"mdat", mdat_payload) + moov


def write_h264_mp4(frames: list, fps: int = 10, qp: int | None = None,
                   gop: int | None = None, entropy: str = "cavlc",
                   bframes: int = 0, chromas: list | None = None,
                   direct: str = "spatial", nrefs: int = 1,
                   wp: bool = False, implicit_wb: bool = False,
                   slice_rows: int | None = None,
                   t8x8: bool = False) -> bytes:
    """Gray frames -> single-track 'avc1' MP4 whose samples are REAL
    H.264 (..h264.encode_frames): bit-exact I_PCM when qp is None,
    CAVLC or CABAC (entropy=) at the given qp otherwise; gop=N emits a
    real IDR+P group-of-pictures structure (motion-compensated P
    slices). bframes=N (CAVLC, requires qp+gop) emits IBBP GOPs:
    samples land in DECODE order with ctts composition offsets carrying
    the display reordering (r6). chromas= (one (2, h/2, w/2) pair per
    frame) codes REAL 4:2:0 chroma residuals (r7, CAVLC/I_PCM).
    direct="temporal" switches B direct/skip modes to the 8.4.1.2.3
    POC-scaled derivation (r7). nrefs=N (P GOPs, r7) encodes with a
    sliding window of up to N L0 references and per-partition
    ref_idx_l0. wp=True (P GOPs, r7) enables explicit weighted
    prediction: per-slice least-squares gain/offset vs each reference,
    so fades collapse to skip runs. implicit_wb=True (B GOPs, r7)
    codes weighted_bipred_idc=2: B bi-predictions blend with the
    POC-derived implicit weights (8.4.2.3.1, the x264 default).
    slice_rows=N (r7, I/P GOPs) emits MULTI-SLICE pictures: one slice
    NAL per N macroblock rows, the hardware-encoder/error-resilience
    shape — samples then carry several length-prefixed NALs."""
    from . import h264 as _h264

    h, w = np.asarray(frames[0]).shape[:2]
    if bframes:
        if qp is None or gop is None:
            raise ValueError("bframes needs qp and gop")
        avcc, samples, disp = _h264.encode_frames_bgop(
            frames, qp=qp, gop=gop, bframes=bframes, entropy=entropy,
            chromas=chromas, direct=direct, implicit_wb=implicit_wb,
            slice_rows=slice_rows, t8x8=t8x8)
        timescale = 90000
        delta = timescale // fps
        shift = max((i - d) * delta for i, d in enumerate(disp))
        offsets = [(d - i) * delta + shift for i, d in enumerate(disp)]
        return _assemble_mp4(samples, w, h, fps, fourcc=b"avc1", depth=24,
                             entry_extra=_box(b"avcC", avcc),
                             ctts_offsets=offsets)
    avcc, samples = _h264.encode_frames(frames, qp=qp, gop=gop,
                                        entropy=entropy, chromas=chromas,
                                        nrefs=nrefs, wp=wp,
                                        slice_rows=slice_rows, t8x8=t8x8)
    return _assemble_mp4(samples, w, h, fps, fourcc=b"avc1", depth=24,
                         entry_extra=_box(b"avcC", avcc))


_PCM_AUDIO_FOURCC = (b"sowt", b"twos")  # LE / BE 16-bit PCM


def write_pcm_mp4(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Mono int16 PCM -> single-track 'sowt' MP4 (one chunk). The audio
    sibling of write_raw_mp4: container-real, entropy-free."""
    pcm = np.asarray(samples, "<i2").tobytes()
    n = len(samples)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    chunk_offset = len(ftyp) + 8
    timescale = rate
    mvhd = _full(b"mvhd", 0, 0,
                 struct.pack(">IIII", 0, 0, timescale, n)
                 + struct.pack(">iH H 8x 36s 24x", 0x00010000, 0x0100, 0,
                               _MATRIX) + struct.pack(">I", 2))
    tkhd = _full(b"tkhd", 0, 7,
                 struct.pack(">IIII", 0, 0, 1, 0) + struct.pack(">I", n)
                 + b"\x00" * 8 + struct.pack(">hhhh", 0, 0x0100, 0, 0)
                 + _MATRIX + struct.pack(">II", 0, 0))
    mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, timescale, n, 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, 0, b"\x00" * 4 + b"soun" + b"\x00" * 12 + b"aud\x00")
    smhd = _full(b"smhd", 0, 0, struct.pack(">HH", 0, 0))
    dinf = _box(b"dinf", _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b"")))
    ase = (b"\x00" * 6 + struct.pack(">H", 1)          # reserved + dref idx
           + b"\x00" * 8                                # version/revision/vendor
           + struct.pack(">HHHH", 1, 16, 0, 0)          # channels, bits, predef, reserved
           + struct.pack(">I", rate << 16))             # 16.16 sample rate
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + _box(b"sowt", ase))
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 2, n))  # fixed 2-byte samples
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", smhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", pcm) + moov


def _mp4_descriptor(tag: int, payload: bytes) -> bytes:
    """MPEG-4 BaseDescriptor with 4-byte expandable length (the
    0x80-continued form every real muxer emits).  All four 7-bit groups
    are encoded so payloads over 127 bytes stay well-formed (ADVICE r5)."""
    ln = len(payload)
    if ln >= 1 << 28:
        raise ValueError(f"descriptor payload too large: {ln}")
    return bytes([tag,
                  0x80 | ((ln >> 21) & 0x7F), 0x80 | ((ln >> 14) & 0x7F),
                  0x80 | ((ln >> 7) & 0x7F), ln & 0x7F]) + payload


def write_aac_mp4(pcm, rate: int = 48000, short: bool = False,
                  ms: bool = False, intensity: bool = False,
                  pns: bool = False, tns: bool = False,
                  pulse: bool = False, pce: bool = False) -> bytes:
    """Float64 PCM — (n,) mono SCE, (n, 2) stereo CPE, or (n, ch) for
    ch in 3..6 multichannel element layouts incl. 5.1 with an LFE (r7,
    4.5.1.1) — -> single-track 'mp4a' MP4 whose samples are AAC-LC
    access units (..aac.encode; short=True codes EIGHT_SHORT windows,
    ms=True per-band MID/SIDE per channel pair, pns=True noise
    substitution, tns=True temporal noise shaping, r7) and whose esds
    box carries the real AudioSpecificConfig. In-repo canonical
    Huffman (see ..aac docstring): round trips through
    read_audio_track, not ffmpeg."""
    from . import aac as _aac

    arr = np.asarray(pcm)
    channels = 1 if arr.ndim == 1 else arr.shape[1]
    asc, aus = _aac.encode(pcm, rate, short=short, ms=ms,
                           intensity=intensity, pns=pns, tns=tns,
                           pulse=pulse, pce=pce)  # pce: config-0 ASC
    #                        (PCE-defined layout rides the esds, late r7)
    n_aus = len(aus)
    payload = b"".join(aus)
    dur = n_aus * _aac.FRAME
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    chunk_offset = len(ftyp) + 8
    timescale = rate
    mvhd = _full(b"mvhd", 0, 0,
                 struct.pack(">IIII", 0, 0, timescale, dur)
                 + struct.pack(">iH H 8x 36s 24x", 0x00010000, 0x0100, 0,
                               _MATRIX) + struct.pack(">I", 2))
    tkhd = _full(b"tkhd", 0, 7,
                 struct.pack(">IIII", 0, 0, 1, 0) + struct.pack(">I", dur)
                 + b"\x00" * 8 + struct.pack(">hhhh", 0, 0x0100, 0, 0)
                 + _MATRIX + struct.pack(">II", 0, 0))
    mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, timescale, dur, 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, 0, b"\x00" * 4 + b"soun" + b"\x00" * 12 + b"aud\x00")
    smhd = _full(b"smhd", 0, 0, struct.pack(">HH", 0, 0))
    dinf = _box(b"dinf", _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b"")))
    # ES_Descriptor(3) { ES_ID, flags; DecoderConfig(4) { OTI 0x40 =
    # MPEG-4 Audio, streamType audio; DecoderSpecificInfo(5) = ASC };
    # SLConfig(6) = 2 }
    dsi = _mp4_descriptor(0x05, asc)
    dcd = _mp4_descriptor(
        0x04, bytes([0x40, 0x15]) + b"\x00\x00\x00"
        + struct.pack(">II", 128000, 128000) + dsi)
    es = _mp4_descriptor(0x03, struct.pack(">HB", 1, 0) + dcd
                         + _mp4_descriptor(0x06, b"\x02"))
    esds = _full(b"esds", 0, 0, es)
    ase = (b"\x00" * 6 + struct.pack(">H", 1)
           + b"\x00" * 8
           + struct.pack(">HHHH", channels, 16, 0, 0)
           + struct.pack(">I", rate << 16))
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + _box(b"mp4a", ase + esds))
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n_aus, _aac.FRAME))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n_aus, 1))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n_aus)
                 + b"".join(struct.pack(">I", len(a)) for a in aus))
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", smhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", payload) + moov


def _parse_esds_asc(data: bytes, lo: int, hi: int) -> bytes | None:
    """AudioSpecificConfig bytes from the esds inside [lo, hi), or None."""
    i = data.find(b"esds", lo, hi)
    if i < 0:
        return None
    p = i + 4 + 4  # tag + version/flags
    def _rd_desc(p):
        tag = data[p]
        p += 1
        ln = 0
        for _ in range(4):
            b = data[p]
            p += 1
            ln = (ln << 7) | (b & 0x7F)
            if not b & 0x80:
                break
        return tag, ln, p
    tag, ln, p = _rd_desc(p)
    if tag != 0x03:
        return None
    p += 3  # ES_ID + flags
    tag, ln, p = _rd_desc(p)
    if tag != 0x04:
        return None
    p += 13  # OTI, streamType, buffer, bitrates
    tag, ln, p = _rd_desc(p)
    if tag != 0x05:
        return None
    return data[p:p + ln]


def read_audio_track(data: bytes) -> dict:
    """First audio track -> {codec, rate, channels, pcm (float64 mono),
    duration_s}. 'sowt'/'twos' PCM decodes for real; 'mp4a' AAC-LC
    streams inside the in-repo codec profile (..aac) decode for real
    too; out-of-profile AAC returns metadata with pcm=None — the caller
    decides whether that is the well-formed-unsupported stub."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an MP4")
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("no moov")
    for t, b0, b1 in _walk(data, *moov):
        if t != b"trak":
            continue
        mdia = _find(data, b0, b1, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(data, *mdia, b"hdlr")
        if hdlr is None or data[hdlr[0] + 8 : hdlr[0] + 12] != b"soun":
            continue
        mdhd = _find(data, *mdia, b"mdhd")
        minf = _find(data, *mdia, b"minf")
        stbl = _find(data, *minf, b"stbl") if minf else None
        stsd = _find(data, *stbl, b"stsd") if stbl else None
        if stsd is None or mdhd is None:
            continue
        fourcc = data[stsd[0] + 12 : stsd[0] + 16]
        ase = stsd[0] + 16
        channels, bits = struct.unpack(">HH", data[ase + 16 : ase + 20])
        (rate_fx,) = struct.unpack(">I", data[ase + 24 : ase + 28])
        rate = rate_fx >> 16
        ver = data[mdhd[0]]
        ts_off = mdhd[0] + (20 if ver == 1 else 12)
        timescale, dur = struct.unpack(">II", data[ts_off : ts_off + 8])
        out = {"codec": fourcc.decode("ascii", "replace").strip(),
               "rate": rate or timescale, "channels": channels,
               "duration_s": dur / timescale if timescale else None, "pcm": None}
        if fourcc in _PCM_AUDIO_FOURCC and bits == 16:
            samples, _ts, _end = _stbl_samples(data, stbl, timescale)
            raw = b"".join(samples)
            dt = "<i2" if fourcc == b"sowt" else ">i2"
            a = np.frombuffer(raw, dtype=dt).astype(np.float64) / 32768.0
            if channels > 1:
                a = a[: (a.size // channels) * channels].reshape(-1, channels).mean(axis=1)
            out["pcm"] = a
        elif fourcc == b"mp4a":
            # real AAC-LC decode for in-profile streams; anything the
            # in-repo codec can't entropy-decode (real-world Huffman,
            # short windows, stereo) leaves pcm=None for the caller's
            # well-formed-unsupported contract
            asc = _parse_esds_asc(data, stsd[0], stsd[1])
            if asc is not None:
                try:
                    from . import aac as _aac

                    aus, _ts, _end = _stbl_samples(data, stbl, timescale)
                    pcm, arate = _aac.decode(list(aus), asc)
                    out["pcm"] = pcm
                    out["rate"] = arate
                except ValueError:
                    pass
        return out
    raise ValueError("no audio track")


def _codec_of(fourcc: bytes) -> str:
    if fourcc in _RAW_FOURCC:
        return "raw"
    if fourcc in _AVC_FOURCC:
        return "h264"
    return "jpeg"


def read_mjpeg_mp4(data: bytes, fourccs: tuple = _SUPPORTED_FOURCC) -> dict:
    """Extract the first supported video track's samples + timestamps.
    The result carries `codec` ('jpeg' for the T.81 family, 'raw' for
    uncompressed, 'h264' with the track's `avcc` record) — callers
    decode accordingly."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an MP4")
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("no moov")
    for t, b0, b1 in _walk(data, *moov):
        if t != b"trak":
            continue
        tkhd = _find(data, b0, b1, b"tkhd")
        mdia = _find(data, b0, b1, b"mdia")
        if mdia is None:
            continue
        mdhd = _find(data, *mdia, b"mdhd")
        minf = _find(data, *mdia, b"minf")
        if minf is None or mdhd is None:
            continue
        stbl = _find(data, *minf, b"stbl")
        if stbl is None:
            continue
        stsd = _find(data, *stbl, b"stsd")
        if stsd is None:
            continue
        # stsd: version/flags(4) count(4) then entries (size4 fourcc4 ...)
        fourcc = data[stsd[0] + 12 : stsd[0] + 16]
        if fourcc not in fourccs:
            continue
        # dimensions from the sample entry (offset 24/26 into the VSE tail)
        vse = stsd[0] + 16
        width, height = struct.unpack(">HH", data[vse + 24 : vse + 28])
        avcc = None
        if fourcc in _AVC_FOURCC:
            # child boxes follow the 78-byte VisualSampleEntry core
            (entry_size,) = struct.unpack(">I", data[stsd[0] + 8 : stsd[0] + 12])
            child = _find(data, vse + 78, stsd[0] + 8 + entry_size, b"avcC")
            if child is not None:
                avcc = data[child[0] : child[1]]
        ver = data[mdhd[0]]
        timescale_off = mdhd[0] + (20 if ver == 1 else 12)
        (timescale,) = struct.unpack(">I", data[timescale_off : timescale_off + 4])

        frames, ts, t_acc = _stbl_samples(data, stbl, timescale)
        if not frames:
            # fragmented (DASH) layout: empty stbl, samples in moof/trun
            tid = 1
            if tkhd is not None:
                (tid,) = struct.unpack(">I", data[tkhd[0] + 12 : tkhd[0] + 16])
            trex_defaults: dict = {}
            mvex = _find(data, *moov, b"mvex")
            if mvex is not None:
                trex = _find(data, *mvex, b"trex")
                if trex is not None:
                    t_tid, _sdi, t_dur, t_size, _fl = struct.unpack(
                        ">IIIII", data[trex[0] + 4 : trex[0] + 24])
                    if t_tid == tid:
                        trex_defaults = {"duration": t_dur, "size": t_size}
            frames, ts, dur_ms = _read_fragments(data, tid, trex_defaults, timescale)
            if not frames:
                continue
            return {"width": width, "height": height, "timescale": timescale,
                    "timestamps_ms": ts, "frames": frames,
                    "duration_ms": dur_ms, "avcc": avcc,
                    "codec": _codec_of(fourcc)}
        return {"width": width, "height": height, "timescale": timescale,
                "timestamps_ms": ts[: len(frames)], "frames": frames,
                "duration_ms": int(t_acc * 1000 / timescale), "avcc": avcc,
                "codec": _codec_of(fourcc)}
    raise ValueError("no supported-codec video track")
