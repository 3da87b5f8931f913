"""Minimal pure-stdlib 7z container codec — the S4/P3 7z ingestion path.

The reference triggers on application/x-7z-compressed
(preview.geoshp/extractor_info.json:28, pycsw.extractor/ncsa.geo.pycsw.py:77)
and shells the `7z` binary for extraction (preview.geoshp/
zipshputils.py:15-17,50). This sandbox has no 7z binary or py7zr, so the
container format (public spec: 7zFormat.txt in the LZMA SDK) is parsed
here directly and streams are decoded with stdlib lzma:

  supported: single- and multi-folder archives, coders Copy(00),
             LZMA1(030101), LZMA2(21); encoded (kEncodedHeader) headers;
             solid streams (many files per folder); empty files.
  rejected (explicit error, never silent): BCJ/delta/crypto coder chains,
             multi-input coders.

read_7z(data) -> {name: bytes}. write_7z({name: bytes}) emits a solid
single-folder LZMA2 archive with an unencoded header (used for fixtures
and the re-zip normalization path).
"""

from __future__ import annotations

import lzma
import struct
import zlib

SIGNATURE = b"7z\xbc\xaf\x27\x1c"

_K_END = 0x00
_K_HEADER = 0x01
_K_MAIN_STREAMS = 0x04
_K_FILES_INFO = 0x05
_K_PACK_INFO = 0x06
_K_UNPACK_INFO = 0x07
_K_SUBSTREAMS = 0x08
_K_SIZE = 0x09
_K_CRC = 0x0A
_K_FOLDER = 0x0B
_K_CODERS_UNPACK_SIZE = 0x0C
_K_NUM_UNPACK_STREAM = 0x0D
_K_EMPTY_STREAM = 0x0E
_K_EMPTY_FILE = 0x0F
_K_NAME = 0x11
_K_ENCODED_HEADER = 0x17
_K_DUMMY = 0x19

_CODER_COPY = b"\x00"
_CODER_LZMA1 = b"\x03\x01\x01"
_CODER_LZMA2 = b"\x21"


class SevenZipError(ValueError):
    pass


class _Reader:
    def __init__(self, data: bytes):
        self.d = data
        self.p = 0

    def byte(self) -> int:
        b = self.d[self.p]
        self.p += 1
        return b

    def bytes_(self, n: int) -> bytes:
        b = self.d[self.p : self.p + n]
        self.p += n
        return b

    def number(self) -> int:
        """7z variable-length number (7zFormat.txt ReadNumber)."""
        first = self.byte()
        mask = 0x80
        value = 0
        for i in range(8):
            if not (first & mask):
                value |= (first & (mask - 1)) << (8 * i)
                return value
            value |= self.byte() << (8 * i)
            mask >>= 1
        return value

    def bitvector(self, n: int) -> list[bool]:
        out = []
        b = 0
        mask = 0
        for _ in range(n):
            if mask == 0:
                b = self.byte()
                mask = 0x80
            out.append(bool(b & mask))
            mask >>= 1
        return out

    def bitvector_or_all(self, n: int) -> list[bool]:
        all_defined = self.byte()
        return [True] * n if all_defined else self.bitvector(n)


def _decode_folder(coders: list[dict], packed: list[bytes], unpack_sizes: list[int]) -> bytes:
    """Decode one folder. Single-coder chains only (Copy/LZMA1/LZMA2) —
    matches what `7z a` produces for data archives without BCJ."""
    if len(coders) != 1:
        raise SevenZipError("UNSUPPORTED_CODER_CHAIN")
    c = coders[0]
    cid, props = c["id"], c["props"]
    raw = packed[0]
    out_size = unpack_sizes[-1]
    if cid == _CODER_COPY:
        return raw[:out_size]
    if cid == _CODER_LZMA1:
        filt = lzma._decode_filter_properties(lzma.FILTER_LZMA1, props)
        dec = lzma.LZMADecompressor(format=lzma.FORMAT_RAW, filters=[filt])
        return dec.decompress(raw, max_length=out_size)
    if cid == _CODER_LZMA2:
        filt = lzma._decode_filter_properties(lzma.FILTER_LZMA2, props)
        dec = lzma.LZMADecompressor(format=lzma.FORMAT_RAW, filters=[filt])
        return dec.decompress(raw, max_length=out_size)
    raise SevenZipError(f"UNSUPPORTED_CODER {cid.hex()}")


def _parse_folder(r: _Reader) -> dict:
    n_coders = r.number()
    coders = []
    total_in = total_out = 0
    for _ in range(n_coders):
        flags = r.byte()
        id_size = flags & 0x0F
        cid = r.bytes_(id_size)
        n_in = n_out = 1
        if flags & 0x10:
            n_in, n_out = r.number(), r.number()
        props = b""
        if flags & 0x20:
            props = r.bytes_(r.number())
        coders.append({"id": cid, "n_in": n_in, "n_out": n_out, "props": props})
        total_in += n_in
        total_out += n_out
    n_bind = total_out - 1
    bind_pairs = [(r.number(), r.number()) for _ in range(n_bind)]
    n_packed = total_in - n_bind
    packed_idx = [r.number() for _ in range(n_packed)] if n_packed > 1 else [0]
    return {"coders": coders, "bind_pairs": bind_pairs, "packed_idx": packed_idx,
            "total_out": total_out}


def _parse_streams_info(r: _Reader) -> dict:
    info: dict = {"pack_pos": 0, "pack_sizes": [], "folders": [],
                  "num_unpack_streams": None, "sub_sizes": None}
    while True:
        t = r.number()
        if t == _K_END:
            break
        if t == _K_PACK_INFO:
            info["pack_pos"] = r.number()
            n = r.number()
            while True:
                t2 = r.number()
                if t2 == _K_END:
                    break
                if t2 == _K_SIZE:
                    info["pack_sizes"] = [r.number() for _ in range(n)]
                elif t2 == _K_CRC:
                    defined = r.bitvector_or_all(n)
                    r.bytes_(4 * sum(defined))
                else:
                    raise SevenZipError(f"bad packinfo prop {t2}")
        elif t == _K_UNPACK_INFO:
            if r.number() != _K_FOLDER:
                raise SevenZipError("expected kFolder")
            n_folders = r.number()
            if r.byte() != 0:
                raise SevenZipError("external folders unsupported")
            folders = [_parse_folder(r) for _ in range(n_folders)]
            if r.number() != _K_CODERS_UNPACK_SIZE:
                raise SevenZipError("expected kCodersUnpackSize")
            for f in folders:
                f["unpack_sizes"] = [r.number() for _ in range(f["total_out"])]
            while True:
                t2 = r.number()
                if t2 == _K_END:
                    break
                if t2 == _K_CRC:
                    defined = r.bitvector_or_all(n_folders)
                    r.bytes_(4 * sum(defined))
                else:
                    raise SevenZipError(f"bad unpackinfo prop {t2}")
            info["folders"] = folders
        elif t == _K_SUBSTREAMS:
            folders = info["folders"]
            nums = [1] * len(folders)
            sizes_given = False
            sub_sizes: list[int] = []
            while True:
                t2 = r.number()
                if t2 == _K_END:
                    break
                if t2 == _K_NUM_UNPACK_STREAM:
                    nums = [r.number() for _ in folders]
                elif t2 == _K_SIZE:
                    sizes_given = True
                    for fi, f in enumerate(folders):
                        if nums[fi] == 0:
                            continue
                        got = [r.number() for _ in range(nums[fi] - 1)]
                        got.append(f["unpack_sizes"][-1] - sum(got))
                        sub_sizes.extend(got)
                elif t2 == _K_CRC:
                    n_digests = sum(1 for fi, f in enumerate(folders) for _ in range(nums[fi]))
                    defined = r.bitvector_or_all(n_digests)
                    r.bytes_(4 * sum(defined))
                else:
                    raise SevenZipError(f"bad substreams prop {t2}")
            if not sizes_given:
                sub_sizes = [f["unpack_sizes"][-1] for fi, f in enumerate(folders)
                             for _ in range(nums[fi]) if nums[fi] == 1]
            info["num_unpack_streams"] = nums
            info["sub_sizes"] = sub_sizes
        else:
            raise SevenZipError(f"unexpected streams prop {t}")
    if info["num_unpack_streams"] is None:
        info["num_unpack_streams"] = [1] * len(info["folders"])
        info["sub_sizes"] = [f["unpack_sizes"][-1] for f in info["folders"]]
    return info


def _unpack_folders(data: bytes, info: dict, base: int) -> bytes:
    pos = base + info["pack_pos"]
    packs = []
    for sz in info["pack_sizes"]:
        packs.append(data[pos : pos + sz])
        pos += sz
    out = b""
    pi = 0
    for f in info["folders"]:
        n_packed = len(f["packed_idx"])
        out += _decode_folder(f["coders"], packs[pi : pi + n_packed], f["unpack_sizes"])
        pi += n_packed
    return out


def read_7z(data: bytes) -> dict[str, bytes]:
    """Parse a 7z archive -> {member name: content}. Raises SevenZipError
    on malformed input or unsupported coders (callers surface it as an
    error column, never silently)."""
    if len(data) < 32 or data[:6] != SIGNATURE:
        raise SevenZipError("NOT_7Z")
    nh_off, nh_size = struct.unpack("<QQ", data[12:28])
    base = 32
    hdr = data[base + nh_off : base + nh_off + nh_size]
    if not hdr:
        raise SevenZipError("EMPTY_HEADER")
    r = _Reader(hdr)
    t = r.number()
    if t == _K_ENCODED_HEADER:
        info = _parse_streams_info(r)
        hdr = _unpack_folders(data, info, base)
        r = _Reader(hdr)
        t = r.number()
    if t != _K_HEADER:
        raise SevenZipError(f"unexpected header id {t}")

    streams = None
    names: list[str] = []
    empty_stream: list[bool] = []
    empty_file: list[bool] = []
    n_files = 0
    while True:
        t = r.number()
        if t == _K_END:
            break
        if t == _K_MAIN_STREAMS:
            streams = _parse_streams_info(r)
        elif t == _K_FILES_INFO:
            n_files = r.number()
            empty_stream = [False] * n_files
            while True:
                pt = r.number()
                if pt == _K_END:
                    break
                size = r.number()
                end = r.p + size
                if pt == _K_EMPTY_STREAM:
                    empty_stream = r.bitvector(n_files)
                elif pt == _K_EMPTY_FILE:
                    empty_file = r.bitvector(sum(empty_stream))
                elif pt == _K_NAME:
                    if r.byte() != 0:
                        raise SevenZipError("external names unsupported")
                    blob = r.bytes_(end - r.p)
                    names = [n for n in blob.decode("utf-16-le").split("\x00") if n != ""]
                else:
                    r.p = end  # times/attributes/padding: skip
                r.p = end
        else:
            raise SevenZipError(f"unexpected header prop {t}")

    if streams is None:
        # archive of empty files only
        return {n: b"" for n in names}
    payload = _unpack_folders(data, streams, base)
    sizes = streams["sub_sizes"]
    out: dict[str, bytes] = {}
    si = 0
    pos = 0
    for i in range(n_files or len(names)):
        name = names[i] if i < len(names) else f"member{i}"
        if empty_stream and empty_stream[i]:
            out[name] = b""
            continue
        sz = sizes[si]
        out[name] = payload[pos : pos + sz]
        pos += sz
        si += 1
    return out


# ------------------------------------------------------------------ writer


def _w_number(v: int) -> bytes:
    """Inverse of _Reader.number: i leading 1-bits in the first byte mean i
    extra LE bytes; the first byte's low (7-i) bits carry the high part."""
    for i in range(8):
        if v < (1 << (8 * i + (7 - i))):
            first = ((0xFF << (8 - i)) & 0xFF) | (v >> (8 * i))
            return bytes([first]) + (v & ((1 << (8 * i)) - 1)).to_bytes(i, "little")
    return bytes([0xFF]) + v.to_bytes(8, "little")


def write_7z(members: dict[str, bytes], codec: str = "lzma2") -> bytes:
    """Solid single-folder archive with an unencoded header. Fixture/
    normalization writer for the reader above."""
    names = list(members)
    payload = b"".join(members[n] for n in names)
    sizes = [len(members[n]) for n in names]
    if codec == "copy":
        cid, props, packed = _CODER_COPY, b"", payload
    else:
        filt = {"id": lzma.FILTER_LZMA2, "preset": 6}
        props = lzma._encode_filter_properties(filt)
        comp = lzma.LZMACompressor(format=lzma.FORMAT_RAW, filters=[filt])
        packed = comp.compress(payload) + comp.flush()
        cid = _CODER_LZMA2

    h = bytearray()
    h += _w_number(_K_HEADER)
    h += _w_number(_K_MAIN_STREAMS)
    #   pack info
    h += _w_number(_K_PACK_INFO)
    h += _w_number(0)  # pack pos
    h += _w_number(1)  # num pack streams
    h += _w_number(_K_SIZE)
    h += _w_number(len(packed))
    h += _w_number(_K_END)
    #   unpack info
    h += _w_number(_K_UNPACK_INFO)
    h += _w_number(_K_FOLDER)
    h += _w_number(1)  # one folder
    h += bytes([0])  # not external
    h += _w_number(1)  # NumCoders in this folder
    flags = len(cid) | (0x20 if props else 0)
    h += bytes([flags]) + cid
    if props:
        h += _w_number(len(props)) + props
    h += _w_number(_K_CODERS_UNPACK_SIZE)
    h += _w_number(len(payload))
    h += _w_number(_K_END)
    #   substreams
    h += _w_number(_K_SUBSTREAMS)
    h += _w_number(_K_NUM_UNPACK_STREAM)
    h += _w_number(len(names))
    h += _w_number(_K_SIZE)
    for s in sizes[:-1]:
        h += _w_number(s)
    h += _w_number(_K_END)
    h += _w_number(_K_END)  # end MainStreamsInfo
    #   files info
    h += _w_number(_K_FILES_INFO)
    h += _w_number(len(names))
    # leading byte 0 = not external; names UTF-16LE NUL-terminated
    nameblob = b"\x00" + b"".join(n.encode("utf-16-le") + b"\x00\x00" for n in names)
    h += _w_number(_K_NAME)
    h += _w_number(len(nameblob))
    h += nameblob
    h += _w_number(_K_END)
    h += _w_number(_K_END)  # end header

    header = bytes(h)
    nh_off = len(packed)
    start = struct.pack("<QQI", nh_off, len(header), zlib.crc32(header))
    out = SIGNATURE + b"\x00\x04" + struct.pack("<I", zlib.crc32(start)) + start
    assert len(out) == 32
    return out + packed + header
