"""H.264 I_PCM baseline subset: real NAL/SPS/PPS/slice structure with
Exp-Golomb + emulation prevention; pixels bit-exact for I_PCM streams,
clear ValueError for transform-coded ones (the documented stub path)."""

import numpy as np
import pytest

from extractors_geo_spark import h264, mp4


def test_roundtrip_bit_exact_with_cropping_and_ep():
    rng = np.random.default_rng(3)
    for h, w in ((16, 16), (48, 64), (30, 50), (18, 34)):
        frames = [rng.integers(0, 256, (h, w), dtype=np.uint8) for _ in range(3)]
        frames[0][:2, :6] = 0  # force 00 00 0x emulation-prevention patterns
        avcc, samples = h264.encode_frames(frames)
        for f, s in zip(frames, samples):
            np.testing.assert_array_equal(h264.decode_sample(s, avcc), f)
    with pytest.raises(ValueError, match="even"):
        h264.encode_frames([np.zeros((17, 33), np.uint8)])


def test_emulation_prevention_inverse():
    for payload in (b"\x00\x00\x00", b"\x00\x00\x01\x00\x00\x02",
                    b"\x00\x00\x03", b"ab\x00\x00\x00\x00c", bytes(range(256))):
        assert h264._ep_remove(h264._ep_insert(payload)) == payload
    # inserted stream never contains a raw start-code prefix
    assert b"\x00\x00\x01" not in h264._ep_insert(b"\x00\x00\x01\x00\x00\x01")


def test_transform_coded_out_of_scope():
    """An I-slice whose first mb_type is NOT I_PCM (here I_4x4, which
    needs entropy decode) raises a clear error instead of garbling."""
    import struct

    avcc = h264.build_avcc(16, 16)
    bw = h264._BitWriter()
    bw.ue(0)   # first_mb_in_slice
    bw.ue(7)   # slice_type I
    bw.ue(0)   # pps_id
    bw.u(0, 4)  # frame_num
    bw.ue(0)   # idr_pic_id
    bw.u(0, 1)
    bw.u(0, 1)
    bw.se(0)   # slice_qp_delta
    bw.ue(0)   # mb_type 0 = I_4x4 -> entropy-coded residuals follow
    bw.rbsp_trailing()
    nal = bytes([0x65]) + h264._ep_insert(bytes(bw.buf))
    sample = struct.pack(">I", len(nal)) + nal
    with pytest.raises(ValueError, match="I_PCM"):
        h264.decode_sample(sample, avcc)


def test_sample_frames_ipcm_h264_end_to_end(spark):
    from extractors_geo_spark.operators import multimodal as M

    yy, xx = np.mgrid[0:16, 0:32]
    src = [((xx * 5 + yy * 3 + 13 * f) % 251).astype(np.uint8) for f in range(4)]
    data = mp4.write_h264_mp4(src, fps=2)  # 2 s clip
    df = spark.createDataFrame([("h1", bytearray(data))], "video_id string, bytes binary")
    rows = sorted(M.sample_frames(df, every_ms=1000, fake=False).collect(),
                  key=lambda r: r["frame_idx"])
    assert [r["ts_ms"] for r in rows] == [0, 1000]
    for r in rows:
        got = np.frombuffer(bytes(r["frame"]), np.uint8).reshape(16, 32)
        np.testing.assert_array_equal(got, src[int(r["ts_ms"] * 2 / 1000)])
