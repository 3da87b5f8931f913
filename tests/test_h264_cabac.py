"""H.264 CABAC entropy coding (h264_cabac) — engine round trip, table
sanity, decode == encoder-recon bit-exactness for I and P slices, GOP
streams through the container path, and fuzz hardening."""

import struct

import numpy as np
import pytest

from extractors_geo_spark import h264, h264_cabac as C, mp4


def _sample(rbsp, idr=True):
    nal = bytes([0x65 if idr else 0x41]) + h264._ep_insert(rbsp)
    return struct.pack(">I", len(nal)) + nal


def _decode(rbsp, w, h, idr=True, ref=None):
    avcc = h264.build_avcc(w, h, deblock_ctrl=True, cabac=True)
    return h264.decode_sample(_sample(rbsp, idr), avcc, ref=ref,
                              full_plane=True)


# ------------------------------------------------------------ engine
def test_engine_random_roundtrip():
    """Arbitrary interleavings of decision/bypass/terminate(0) bins
    round-trip bit-exactly through the arithmetic coder."""
    rng = np.random.default_rng(7)
    for trial in range(5):
        ops = []
        for _ in range(1500):
            t = int(rng.integers(0, 10))
            if t < 6:
                ops.append(("d", int(rng.integers(0, C._NCTX)),
                            int(rng.integers(0, 2))))
            elif t < 9:
                ops.append(("b", None, int(rng.integers(0, 2))))
            else:
                ops.append(("t", None, 0))
        ops.append(("t", None, 1))
        enc, ctx = C._Enc(), C._Ctx()
        for kind, idx, b in ops:
            if kind == "d":
                enc.decision(ctx, idx, b)
            elif kind == "b":
                enc.bypass(b)
            else:
                enc.terminate(b)
        dec = C._Dec(h264._BitReader(enc.to_bytes()))
        ctx2 = C._Ctx()
        for i, (kind, idx, b) in enumerate(ops):
            got = (dec.decision(ctx2, idx) if kind == "d"
                   else dec.bypass() if kind == "b" else dec.terminate())
            assert got == b, f"trial {trial} op {i}"


def test_range_tables_sane():
    """Machine checks on the Table 9-44/9-45 transcription: shape, value
    range, monotonicity (LPS ranges shrink as the state grows more
    confident and grow with the range quartile), and transition bounds."""
    assert len(C._RANGE_LPS) == 64 and all(len(r) == 4 for r in C._RANGE_LPS)
    for st in range(63):  # row 63 is the terminate state (2,2,2,2)
        row = C._RANGE_LPS[st]
        assert all(row[i] <= row[i + 1] for i in range(3))
        if st < 62:
            nxt = C._RANGE_LPS[st + 1]
            assert all(nxt[i] <= row[i] for i in range(4))
        assert all(2 <= v <= 240 for v in row)
    assert len(C._TRANS_LPS) == 64
    assert all(C._TRANS_LPS[i] <= max(i, 0) + 1 or C._TRANS_LPS[i] == 63
               for i in range(64))
    assert all(C._TRANS_LPS[i] <= C._TRANS_LPS[i + 1]
               for i in range(62))


def test_ueg_binarization_roundtrip():
    """UEG suffix (order-k Exp-Golomb over bypass bins) inverts for the
    orders CABAC uses (k=0 levels, k=3 mvd) over a wide value range."""
    for k in (0, 3):
        vals = list(range(0, 40)) + [100, 255, 1000, 4095]
        enc = C._Enc()
        for v in vals:
            C._enc_egk(enc, v, k)
        enc.terminate(1)
        dec = C._Dec(h264._BitReader(enc.to_bytes()))
        for v in vals:
            assert C._dec_egk(dec, k) == v


# ------------------------------------------------------------ I slices
def _contents(rng, w, h):
    yy, xx = np.mgrid[0:h, 0:w]
    return {
        "flat": np.full((h, w), 77, np.uint8),
        "gradient": ((xx * 5 + yy * 3) % 256).astype(np.uint8),
        "waves": np.clip(128 + 80 * np.sin(xx / 7) + 40 * np.cos(yy / 5),
                         0, 255).astype(np.uint8),
        "noise": rng.integers(0, 256, (h, w), np.uint8),
    }


def test_idr_decode_equals_recon_bit_exact():
    rng = np.random.default_rng(3)
    for w, h in ((16, 16), (64, 48), (36, 20)):
        for name, img in _contents(rng, w, h).items():
            for qp in (6, 14, 26, 34):
                rbsp, recon = C.encode_idr_cabac(img, qp=qp, full_recon=True)
                dec = _decode(rbsp, w, h)
                assert np.array_equal(dec, recon), (name, w, h, qp)


def test_idr_deblocking_bit_exact_and_active():
    rng = np.random.default_rng(4)
    img = _contents(rng, 64, 48)["waves"]
    rbsp, recon = C.encode_idr_cabac(img, qp=30, deblock=True,
                                     full_recon=True)
    rbsp0, recon0 = C.encode_idr_cabac(img, qp=30, deblock=False,
                                       full_recon=True)
    assert np.array_equal(_decode(rbsp, 64, 48), recon)
    assert not np.array_equal(recon, recon0)  # the loop filter did work


def test_idr_low_qp_psnr_over_40():
    rng = np.random.default_rng(5)
    for img in _contents(rng, 64, 48).values():
        rbsp, _ = C.encode_idr_cabac(img, qp=8)
        dec = _decode(rbsp, 64, 48)[:48, :64]
        mse = float(np.mean((dec.astype(np.float64) - img) ** 2))
        assert mse == 0 or 10 * np.log10(255 ** 2 / mse) >= 40


def test_cabac_not_larger_than_cavlc():
    """CABAC should compress at least comparably to CAVLC on smooth
    content (the point of arithmetic coding); allow slack for the
    uniform in-repo context init."""
    rng = np.random.default_rng(6)
    img = _contents(rng, 64, 48)["waves"]
    cab, _ = C.encode_idr_cabac(img, qp=14)
    cav, _ = h264.encode_idr_cavlc(img, qp=14)
    assert len(cab) <= int(len(cav) * 1.15)


# ------------------------------------------------------------ P slices
def test_gop_idr_p_roundtrip_bit_exact():
    """IDR + P chain: every decoded frame equals the encoder's recon,
    P frames predict from the previous FULL plane."""
    yy, xx = np.mgrid[0:48, 0:64]
    frames = [np.clip(128 + 100 * np.sin((xx + 3 * f) / 5) + yy / 3,
                      0, 255).astype(np.uint8) for f in range(5)]
    rbsp, ref = C.encode_idr_cabac(frames[0], qp=12, full_recon=True)
    assert np.array_equal(_decode(rbsp, 64, 48), ref)
    dec_ref = ref
    for fn, f in enumerate(frames[1:], start=1):
        rbsp, recon = C.encode_p_cabac(f, ref, qp=12, frame_num=fn)
        dec = _decode(rbsp, 64, 48, idr=False, ref=dec_ref)
        assert np.array_equal(dec, recon), f"P frame {fn}"
        ref, dec_ref = recon, dec


def test_gop_static_scene_all_skip_is_tiny():
    img = ((np.mgrid[0:32, 0:32][1] * 9) % 256).astype(np.uint8)
    rbsp, ref = C.encode_idr_cabac(img, qp=12, full_recon=True)
    prbsp, recon = C.encode_p_cabac(img, ref, qp=12)
    assert np.array_equal(recon, ref)
    assert np.array_equal(_decode(prbsp, 32, 32, idr=False, ref=ref), recon)
    assert len(prbsp) < 16  # all mb_skip_flag=1: a handful of bytes


def test_p_intra_fallback_scene_cut():
    rng = np.random.default_rng(8)
    a = _contents(rng, 64, 48)["waves"]
    b = rng.integers(0, 256, (48, 64), np.uint8)  # unrelated: SAD gate
    rbsp, ref = C.encode_idr_cabac(a, qp=12, full_recon=True)
    prbsp, recon = C.encode_p_cabac(b, ref, qp=12)
    dec = _decode(prbsp, 64, 48, idr=False, ref=ref)
    assert np.array_equal(dec, recon)
    mse = float(np.mean((dec[:48, :64].astype(np.float64) - b) ** 2))
    assert 10 * np.log10(255 ** 2 / max(mse, 1e-9)) >= 30  # intra coded it


def test_p_deblocking_bit_exact():
    yy, xx = np.mgrid[0:48, 0:64]
    a = np.clip(128 + 90 * np.sin(xx / 4), 0, 255).astype(np.uint8)
    b = np.clip(128 + 90 * np.sin((xx + 5) / 4) + yy / 9, 0, 255).astype(np.uint8)
    rbsp, ref = C.encode_idr_cabac(a, qp=30, deblock=True, full_recon=True)
    prbsp, recon = C.encode_p_cabac(b, ref, qp=30, deblock=True)
    assert np.array_equal(_decode(prbsp, 64, 48, idr=False, ref=ref), recon)


# ------------------------------------------------------------ container
def test_encode_frames_cabac_through_mp4_and_sample_frames(spark):
    from extractors_geo_spark.operators import multimodal as M

    yy, xx = np.mgrid[0:32, 0:32]
    frames = [np.clip(128 + 100 * np.sin((xx + 3 * f) / 5), 0, 255)
              .astype(np.uint8) for f in range(4)]
    data = mp4.write_h264_mp4(frames, fps=2, qp=10, gop=2, entropy="cabac")
    df = spark.createDataFrame([("v0", bytearray(data))],
                               "video_id string, bytes binary")
    out = M.sample_frames(df, every_ms=500, fake=False).collect()
    assert len(out) == 4
    for r in sorted(out, key=lambda r: r["frame_idx"]):
        arr = np.frombuffer(r["frame"], np.uint8).reshape(r["fh"], r["fw"])
        src = frames[r["frame_idx"]]
        mse = float(np.mean((arr.astype(np.float64) - src) ** 2))
        assert 10 * np.log10(255 ** 2 / max(mse, 1e-9)) >= 40


def test_decode_samples_gop_cabac():
    yy, xx = np.mgrid[0:48, 0:64]
    frames = [np.clip(128 + 100 * np.sin((xx + 2 * f) / 6) + yy / 4, 0, 255)
              .astype(np.uint8) for f in range(6)]
    avcc, samples = h264.encode_frames(frames, qp=10, gop=3,
                                       entropy="cabac", deblock=True)
    decs = h264.decode_samples(samples, avcc)
    assert len(decs) == 6
    for f, d in zip(frames, decs):
        mse = float(np.mean((d.astype(np.float64) - f) ** 2))
        assert 10 * np.log10(255 ** 2 / max(mse, 1e-9)) >= 40


# ------------------------------------------------------------ fuzz
def test_fuzzed_cabac_samples_never_escape_valueerror():
    """Corrupting any byte of the slice payload must either decode to
    SOME frame or raise ValueError — never IndexError/TypeError/etc."""
    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:32, 0:32]
    img = np.clip(128 + 70 * np.sin(xx / 3) + 30 * np.cos(yy / 7),
                  0, 255).astype(np.uint8)
    rbsp, _ = C.encode_idr_cabac(img, qp=10)
    avcc = h264.build_avcc(32, 32, deblock_ctrl=True, cabac=True)
    sample = bytearray(_sample(rbsp))
    for _ in range(200):
        mut = bytearray(sample)
        pos = int(rng.integers(5, len(mut)))
        mut[pos] ^= 1 << int(rng.integers(0, 8))
        try:
            out = h264.decode_sample(bytes(mut), avcc)
            assert out.shape == (32, 32)
        except ValueError:
            pass


def test_out_of_profile_streams_raise():
    # P sub-partitioned mb_type: craft via encoder monkeypatch is fragile;
    # instead check the engine-level guards directly
    img = np.full((16, 16), 9, np.uint8)
    rbsp, ref = C.encode_idr_cabac(img, qp=10, full_recon=True)
    # P slice without reference
    prbsp, _ = C.encode_p_cabac(img, ref, qp=10)
    avcc = h264.build_avcc(16, 16, deblock_ctrl=True, cabac=True)
    with pytest.raises(ValueError):
        h264.decode_sample(_sample(prbsp, idr=False), avcc, ref=None)


def test_cabac_p_partitions_roundtrip_bit_exact():
    """r6: 16x8 / 8x16 partitions through the CABAC mb_type tree
    ("011"/"010"), mvds per partition, decode == recon bit-exact; the
    partitioned CABAC decode path is actually exercised."""
    yy, xx = np.mgrid[0:48, 0:64]

    def fr(f):
        a = np.clip(128 + 90 * np.sin((xx + 4 * f) / 5), 0, 255)
        b = np.clip(128 + 90 * np.sin((xx - 4 * f) / 5 + 1), 0, 255)
        return np.where(yy < 24, a, b).astype(np.uint8)

    frames = [fr(f) for f in range(4)]
    hits = []
    orig = C._dec_mb_p_part

    def spy(*a, **k):
        # ptype precedes the chroma state and nrefs (r7 signature)
        hits.append(a[11])
        return orig(*a, **k)

    C._dec_mb_p_part = spy
    try:
        rbsp, ref = C.encode_idr_cabac(frames[0], qp=12, full_recon=True)
        assert np.array_equal(_decode(rbsp, 64, 48), ref)
        for fn, f in enumerate(frames[1:], 1):
            prbsp, recon = C.encode_p_cabac(f, ref, qp=12, frame_num=fn)
            assert np.array_equal(_decode(prbsp, 64, 48, idr=False, ref=ref),
                                  recon), fn
            ref = recon
    finally:
        C._dec_mb_p_part = orig
    assert hits and set(hits) <= {"16x8", "8x16"}


def test_cabac_b_slices_bit_exact_and_gop():
    """r6: the CABAC entropy x slice-type matrix is complete — B_L0/
    B_L1/B_Bi decode == recon bit-exactly and a full CABAC IBBP GOP
    round-trips in display order."""
    yy, xx = np.mgrid[0:48, 0:64]
    frames = [np.clip(128 + 100 * np.sin((xx + 3 * f) / 5) + yy / 4, 0, 255)
              .astype(np.uint8) for f in range(10)]
    avcc = h264.build_avcc(64, 48, deblock_ctrl=True, cabac=True, bpoc=True)

    def dec(rbsp, typ, ref_idc, ref=None, ref2=None):
        nal = bytes([(ref_idc << 5) | typ]) + h264._ep_insert(rbsp)
        return h264.decode_sample(struct.pack(">I", len(nal)) + nal, avcc,
                                  ref=ref, ref2=ref2, full_plane=True)

    rb0, r0 = C.encode_idr_cabac(frames[0], qp=12, full_recon=True, poc_lsb=0)
    rb3, r3 = C.encode_p_cabac(frames[3], r0, qp=12, frame_num=1, poc_lsb=6)
    assert np.array_equal(dec(rb0, 5, 3), r0)
    assert np.array_equal(dec(rb3, 1, 2, ref=r0), r3)
    for b in (1, 2):
        rb, rec = C.encode_b_cabac(frames[b], r0, r3, qp=12, poc_lsb=2 * b)
        assert np.array_equal(dec(rb, 1, 0, ref=r0, ref2=r3), rec), b
    with pytest.raises(ValueError, match="reference"):
        dec(rb, 1, 0, ref=r0)
    avcc2, samples, disp = h264.encode_frames_bgop(frames, qp=12, gop=8,
                                                   bframes=2, entropy="cabac")
    assert sorted(disp) == list(range(10)) and disp != list(range(10))
    decs = h264.decode_samples(samples, avcc2)
    for i, (f, d) in enumerate(zip(frames, decs)):
        mse = float(np.mean((d.astype(np.float64) - f) ** 2))
        assert 10 * np.log10(255 ** 2 / max(mse, 1e-9)) >= 40, i


def test_cabac_b_mb_type_tree_roundtrip():
    """The Table 9-37 B tree subset inverts for every emitted symbol."""
    enc, ctx = C._Enc(), C._Ctx()
    seq = [1, 2, 3, "intra", 3, 1, "intra", 2]
    for s in seq:
        C._enc_b_mb_type(enc, ctx, s)
    enc.terminate(1)
    dec = C._Dec(h264._BitReader(enc.to_bytes()))
    ctx2 = C._Ctx()
    for s in seq:
        assert C._dec_b_mb_type(dec, ctx2) == s


# ------------------------------------------------------ r7: I_PCM
def test_ipcm_cabac_all_pcm_bit_exact():
    """encode_idr_ipcm_cabac: every macroblock is raw samples between
    engine flush/re-init pairs; luma + chroma decode bit-exactly,
    including emulation-prevention-heavy content (0x00 runs)."""
    rng = np.random.default_rng(41)
    img = rng.integers(0, 256, (48, 64)).astype(np.uint8)
    img[8:24, 8:40] = 0  # 0x00 runs force ep_insert activity
    chroma = np.stack([rng.integers(0, 256, (24, 32)),
                       rng.integers(0, 256, (24, 32))]).astype(np.uint8)
    chroma[0, :4] = 0
    rbsp = C.encode_idr_ipcm_cabac(img, chroma=chroma)
    avcc = h264.build_avcc(64, 48, deblock_ctrl=True, cabac=True)
    y, c = h264.decode_sample(_sample(rbsp), avcc, with_chroma=True)
    assert np.array_equal(y, img) and np.array_equal(c, chroma)
    # gray default writes flat-128 chroma, mirroring encode_idr_ipcm
    y2, c2 = h264.decode_sample(_sample(C.encode_idr_ipcm_cabac(img)),
                                avcc, with_chroma=True)
    assert np.array_equal(y2, img) and (c2 == 128).all()


def test_ipcm_cabac_mixed_slice_decode_equals_recon():
    """pcm_mask mixes I_PCM with coded I_4x4/I_16x16 macroblocks in one
    CABAC slice: the engine re-initialises mid-slice (contexts persist)
    and decode == recon bit-exactly; PCM MBs equal the source."""
    rng = np.random.default_rng(42)
    img = rng.integers(20, 236, (48, 64)).astype(np.uint8)
    img[16:32, :16] = 77  # a flat MB so the I_16x16 path participates
    chroma = np.stack([rng.integers(0, 256, (24, 32)),
                       rng.integers(0, 256, (24, 32))]).astype(np.uint8)
    mask = np.zeros((3, 4), bool)
    mask[0, 0] = mask[0, 2] = mask[1, 1] = mask[2, 3] = True
    rbsp, (ry, rc) = C.encode_idr_cabac(img, qp=10, chroma=chroma,
                                        pcm_mask=mask, full_recon=True)
    avcc = h264.build_avcc(64, 48, deblock_ctrl=True, cabac=True)
    y, c = h264.decode_sample(_sample(rbsp), avcc, with_chroma=True,
                              full_plane=True)
    assert np.array_equal(y, ry) and np.array_equal(c, rc)
    for my in range(3):
        for mx in range(4):
            blk = y[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16]
            sblk = img[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16]
            if mask[my, mx]:
                assert np.array_equal(blk, sblk), (my, mx)
    # PCM + deblock is rejected (PCM filters at qp 0; unsupported mix)
    with pytest.raises(ValueError, match="deblock"):
        C.encode_idr_cabac(img, qp=20, pcm_mask=mask, deblock=True)


def test_ipcm_cabac_mp4_end_to_end_and_gop_mix():
    """write_h264_mp4(qp=None, entropy='cabac') produces bit-exact
    CABAC I_PCM clips through sample_frames' real decode path; a coded
    CABAC GOP whose IDR uses pcm_mask still P-predicts off the raw
    reference correctly."""
    rng = np.random.default_rng(43)
    frames = [rng.integers(0, 256, (32, 48)).astype(np.uint8)
              for _ in range(3)]
    chromas = [rng.integers(0, 256, (2, 16, 24)).astype(np.uint8)
               for _ in range(3)]
    data = mp4.write_h264_mp4(frames, fps=2, entropy="cabac",
                              chromas=chromas)
    parsed = mp4.read_mjpeg_mp4(data)
    assert parsed["codec"] == "h264"
    decs = h264.decode_samples(list(parsed["frames"]), parsed["avcc"],
                               with_chroma=True)
    for (y, c), f, ch in zip(decs, frames, chromas):
        assert np.array_equal(y, f) and np.array_equal(c, ch)
    # mixed GOP: PCM IDR anchors a coded P slice
    mask = np.ones((2, 3), bool)
    rb0, r0 = C.encode_idr_cabac(frames[0], qp=10, pcm_mask=mask,
                                 full_recon=True)
    assert np.array_equal(r0, frames[0])
    rb1, r1 = C.encode_p_cabac(frames[1], r0, qp=10, frame_num=1)
    avcc2 = h264.build_avcc(48, 32, deblock_ctrl=True, cabac=True)
    d0 = h264.decode_sample(_sample(rb0), avcc2, full_plane=True)
    d1 = h264.decode_sample(_sample(rb1, idr=False), avcc2, ref=d0,
                            full_plane=True)
    assert np.array_equal(d0, r0) and np.array_equal(d1, r1)


def test_ipcm_cabac_fuzz_never_escapes_valueerror():
    """Corrupted CABAC I_PCM samples decode or raise ValueError."""
    import random

    rng = np.random.default_rng(44)
    img = rng.integers(0, 256, (32, 48)).astype(np.uint8)
    rbsp = C.encode_idr_ipcm_cabac(img)
    avcc = h264.build_avcc(48, 32, deblock_ctrl=True, cabac=True)
    good = _sample(rbsp)
    random.seed(7)
    for _ in range(50):
        s = bytearray(good)
        for _j in range(random.randint(1, 3)):
            s[random.randrange(6, len(s))] = random.randrange(256)
        try:
            h264.decode_sample(bytes(s), avcc, with_chroma=True)
        except ValueError:
            pass
