"""H.264 CABAC entropy coding (Rec. ITU-T H.264 clause 9.3) for I and P
slices — the round-6 extension of the in-repo CAVLC codec (h264.py).

What is REAL spec structure here:
- the binary arithmetic coding engine (9.3.3.2 decode / 9.3.4 encode):
  9-bit range/offset state, rangeTabLPS-driven interval subdivision,
  LPS/MPS state transitions, renormalization with outstanding-bit
  resolution, bypass coding, and the terminate/flush path (end_of_slice);
- the binarizations (9.3.2): TU, UEG0 (coeff levels, uCoff 14), UEG3
  (mvd, uCoff 9), the Table 9-36/9-37 mb_type trees, mapped mb_qp_delta;
- the context MODELING (9.3.3.1): per-syntax-element adaptive contexts
  with neighbor-conditioned ctxIdxInc — mb_type/mb_skip from left+above
  macroblock state, cbp bits from neighbor 8x8 cbp, coded_block_flag
  from neighbor-block cbf, mvd bin0 from neighbor |mvd| sums, residual
  significance maps indexed by scan position, and level contexts driven
  by (numDecodAbsLevelEq1, numDecodAbsLevelGt1);
- the slice-data layout: cabac_alignment_one_bit, per-MB syntax,
  end_of_slice_flag after every macroblock (incl. skipped).

Honesty contract (same as the CAVLC/mp3/AAC codecs, SURVEY §12): the
rangeTabLPS / transIdxLPS tables are a transcription of Tables 9-44/9-45
machine-checked for shape+monotonicity, and context INITIALIZATION is
in-repo (every context starts at the uniform state (pStateIdx 0, valMPS
0) instead of the ~1000-entry (m,n) init tables; cabac_init_idc is
ignored). Encoder and decoder share one table copy, so in-profile round
trips are bit-exact by construction — decode == encoder recon is the
machine-checked gate (tests/test_h264_cabac.py) — but bit-exact ISO
cross-decode of foreign encoders' streams is NOT claimed. The
in-profile macroblock surface is now COMPLETE for single-reference
baseline/main-shape streams; what remains out of profile is shared
with the CAVLC decoder (high-profile tools — see h264.decode_sample;
multi-reference P and row-aligned multi-slice pictures ARE in profile
since r7, with per-slice engine init + fresh neighbour state). IN
profile since r6: 16x8 / 8x16 / 8x8 P partitions (Table 9-37 tree +
sub_mb_type, per-partition mvds; since r7 ALL P sub_mb_type shapes
8x8/8x4/4x8/4x4 via the Table 9-38 tree; partitioned-B 16x8/8x16
types 4..21 with per-partition L0/L1/Bi since r7; B_8x8 mb_type 22
with the full Table 7-18 sub_mb_type set — B_Direct_8x8 or
{8x8,8x4,4x8,4x4} x {L0,L1,Bi} per 8x8, per-list grouped mvds via the
shared h264._b8x8_list_pass — since r7) and B slices — B_SKIP + spatial B_Direct_16x16 (simplified
8.4.1.2.2 derivation, see h264._b_direct_mvs) and B_L0/B_L1/B_Bi
16x16 via the Table 9-37 B tree with the '111101' intra escape, two
mvd lists, bi-prediction. IN profile since r7: 4:2:0 chroma residuals
(cbp_chroma bins, ChromaDC cat-3 2x2 Hadamard + ChromaAC cat-4 blocks,
intra_chroma_pred_mode TU with full DC/H/V/plane prediction and a
per-MB encoder mode search); TEMPORAL direct B prediction
(direct_spatial_mv_pred_flag 0 — 8.4.1.2.3 POC-distance scaling of the
colocated anchor's per-4x4 motion field, threaded by
h264.decode_samples; shared derivation h264._temporal_fields); I_PCM
(mb_type 25 via the ctx-276 terminate bin — raw samples between an
EncodeFlush and an engine re-init per 9.3.1.2, contexts persisting;
encode_idr_ipcm_cabac or pcm_mask= on encode_idr_cabac); High-profile
8x8 transform on inter MBs AND I_8x8 intra prediction (8.3.2.2, all
nine modes; pred modes on the prev_i4/rem_i4 contexts, residuals as
cat-5 blocks, neighbor-conditioned transform_size_8x8_flag bin).

Reference parity note: the reference (preview.geotiff/*) does no video at
all — this is north-star surface (crawl-scale MP4 sampling), not
reference parity.
"""

from __future__ import annotations

import numpy as np

from . import h264 as H

# ------------------------------------------------------ engine tables
# Table 9-44 rangeTabLPS[pStateIdx][qCodIRangeIdx] (transcription; see
# module docstring for the honesty contract).
_RANGE_LPS = (
    (128, 176, 208, 240), (128, 167, 197, 227), (128, 158, 187, 216),
    (123, 150, 178, 205), (116, 142, 169, 195), (111, 135, 160, 185),
    (105, 128, 152, 175), (100, 122, 144, 166), (95, 116, 137, 158),
    (90, 110, 130, 150), (85, 104, 123, 142), (81, 99, 117, 135),
    (77, 94, 111, 128), (73, 89, 105, 122), (69, 85, 100, 116),
    (66, 80, 95, 110), (62, 76, 90, 104), (59, 72, 86, 99),
    (56, 69, 81, 94), (53, 65, 77, 89), (51, 62, 73, 85),
    (48, 59, 69, 80), (46, 56, 66, 76), (43, 53, 63, 72),
    (41, 50, 59, 69), (39, 48, 56, 65), (37, 45, 54, 62),
    (35, 43, 51, 59), (33, 41, 48, 56), (32, 39, 46, 53),
    (30, 37, 43, 50), (29, 35, 41, 48), (27, 33, 39, 45),
    (26, 31, 37, 43), (24, 30, 35, 41), (23, 28, 33, 39),
    (22, 27, 32, 37), (21, 26, 30, 35), (20, 24, 29, 33),
    (19, 23, 27, 31), (18, 22, 26, 30), (17, 21, 25, 28),
    (16, 20, 23, 27), (15, 19, 22, 25), (14, 18, 21, 24),
    (14, 17, 20, 23), (13, 16, 19, 22), (12, 15, 18, 21),
    (12, 14, 17, 20), (11, 14, 16, 19), (11, 13, 15, 18),
    (10, 12, 15, 17), (10, 12, 14, 16), (9, 11, 13, 15),
    (9, 11, 12, 14), (8, 10, 12, 14), (8, 9, 11, 13),
    (7, 9, 11, 12), (7, 9, 10, 12), (7, 8, 10, 11),
    (6, 8, 9, 11), (6, 7, 9, 10), (6, 7, 8, 9), (2, 2, 2, 2),
)
# Table 9-45 transIdxLPS; transIdxMPS is min(state+1, 62).
_TRANS_LPS = (
    0, 0, 1, 2, 2, 4, 4, 5, 6, 7, 8, 9, 9, 11, 11, 12, 13, 13, 15, 15,
    16, 16, 18, 18, 19, 19, 21, 21, 23, 23, 24, 24, 25, 26, 26, 27, 27,
    28, 29, 29, 30, 30, 30, 31, 32, 32, 33, 33, 33, 34, 34, 35, 35, 35,
    36, 36, 36, 37, 37, 37, 38, 38, 63, 63,
)


# ------------------------------------------------------ context layout
# Contiguous context pool; every context initializes to the uniform state
# (pStateIdx 0, valMPS 0) — in-repo init, see the module docstring.
def _alloc():
    ofs = {}
    n = 0
    for name, cnt in (
        ("mbt_i", 8),        # I mb_type: bin0 inc 0..2 + 5 suffix bins
        ("mbt_p_suf", 8),    # intra-in-P suffix (own block, 9.3.3.1 ctx 17+)
        ("mb_skip", 3),      # bin0 inc 0..2 from neighbor skip state
        ("mbt_p", 3),        # P mb_type prefix bins b0 b1 b2
        ("mb_skip_b", 3),    # B mb_skip_flag (own block, ctx 24..26)
        ("sub_mbt_p", 3),    # P sub_mb_type tree bins (Table 9-38)
        ("mbt_b", 6),        # B mb_type tree bins (Table 9-37)
        ("mbt_b_suf", 1),    # partitioned-B 5-bit FL suffix (r7)
        ("sub_mbt_b", 2),    # B sub_mb_type: direct flag + FL suffix (r7)
        ("mvd_x", 7),        # bin0 inc 0..2 + TU bins 3..6
        ("mvd_y", 7),
        ("ref_idx", 6),      # bin0 inc 0..3 from neighbor ref>0 + 2 tail

        ("prev_i4", 1),      # prev_intra4x4_pred_mode_flag
        ("rem_i4", 1),       # rem_intra4x4_pred_mode (3 FL bins, one ctx)
        ("chroma_mode", 4),  # bin0 inc 0..2 + shared bin ctx
        ("cbp_luma", 4),     # inc 0..3 from neighbor 8x8 cbp bits
        ("cbp_chroma", 4),
        ("qp_delta", 4),
        # 6 block cats: 0 I16DC, 1 I16AC, 2 Luma4x4, 3 ChromaDC,
        # 4 ChromaAC (r7 chroma residuals), 5 Luma8x8 (r7 High-profile
        # 8x8 transform; sig/last positions fold at 14 — in-repo
        # context assignment, same honesty note as the uniform init)
        ("cbf", 24),         # 6 cats x inc 0..3
        ("sig", 90),         # 6 cats x scan positions 0..14 (folded)
        ("last", 90),
        ("lvl", 60),         # 6 cats x (bin0 inc 0..4, bins1+ inc 5..9)
        ("t8flag", 3),       # transform_size_8x8_flag, neighbor inc
    ):
        ofs[name] = n
        n += cnt
    return ofs, n


_OFS, _NCTX = _alloc()


class _Ctx:
    def __init__(self):
        self.s = [0] * _NCTX   # pStateIdx
        self.m = [0] * _NCTX   # valMPS


# ------------------------------------------------------ arithmetic coder
class _Enc:
    """9.3.4 encoder: 10-bit low / 9-bit range, JM-style first-bit
    suppression and outstanding-bit resolution."""

    def __init__(self):
        self.low = 0
        self.range = 510
        self.bits: list[int] = []
        self.outstanding = 0
        self.first = True

    def _put(self, b: int) -> None:
        if self.first:
            self.first = False
        else:
            self.bits.append(b)
        while self.outstanding:
            self.bits.append(1 - b)
            self.outstanding -= 1

    def _renorm(self) -> None:
        while self.range < 256:
            if self.low >= 512:
                self._put(1)
                self.low -= 512
            elif self.low < 256:
                self._put(0)
            else:
                self.outstanding += 1
                self.low -= 256
            self.range <<= 1
            self.low <<= 1

    def decision(self, ctx: _Ctx, idx: int, b: int) -> None:
        st = ctx.s[idx]
        lps = _RANGE_LPS[st][(self.range >> 6) & 3]
        self.range -= lps
        if b != ctx.m[idx]:
            self.low += self.range
            self.range = lps
            if st == 0:
                ctx.m[idx] = 1 - ctx.m[idx]
            ctx.s[idx] = _TRANS_LPS[st]
        else:
            ctx.s[idx] = min(st + 1, 62)
        self._renorm()

    def bypass(self, b: int) -> None:
        self.low <<= 1
        if b:
            self.low += self.range
        if self.low >= 1024:
            self._put(1)
            self.low -= 1024
        elif self.low < 512:
            self._put(0)
        else:
            self.outstanding += 1
            self.low -= 512

    def terminate(self, b: int) -> None:
        self.range -= 2
        if b:
            self.low += self.range
            self._flush()
        else:
            self._renorm()

    def _flush(self) -> None:
        self.range = 2
        self._renorm()
        self._put((self.low >> 9) & 1)
        self._put((self.low >> 8) & 1)
        self._put(1)  # rbsp-stop-style final one (9.3.4.5)

    def pcm_payload(self, data: bytes) -> None:
        """I_PCM raw-sample insertion (7.3.5 + 9.3.1.2). Must follow a
        terminate(1) flush: at that point the emitted bit count equals
        the decoder's consumed count (each range-renorm shift is one
        emitted == one read bit, the 10 flush puts mirror the decoder's
        9 init reads + suppressed first bit), so both sides agree on
        the byte boundary. Pads with pcm_alignment_zero_bits, appends
        the raw bytes, and re-initialises the arithmetic encoder (the
        context states deliberately persist, matching the spec)."""
        assert self.outstanding == 0, "pcm_payload without a flush"
        while len(self.bits) % 8:
            self.bits.append(0)
        for byte in data:
            for k in range(7, -1, -1):
                self.bits.append((byte >> k) & 1)
        self.low = 0
        self.range = 510
        self.first = True

    def to_bytes(self) -> bytes:
        bits = self.bits
        out = bytearray()
        acc = 0
        for i, b in enumerate(bits):
            acc = (acc << 1) | b
            if i % 8 == 7:
                out.append(acc)
                acc = 0
        rem = len(bits) % 8
        if rem:
            out.append(acc << (8 - rem))
        return bytes(out)


class _Dec:
    """9.3.3.2 decoder over an h264._BitReader positioned at the aligned
    start of CABAC slice data. Reads past end-of-stream resolve to 0 bits
    (bounded; a desynced stream raises ValueError)."""

    def __init__(self, r):
        self.r = r
        self.nbits = len(r.data) * 8
        self.over = 0
        self.range = 510
        self.offset = 0
        for _ in range(9):
            self.offset = (self.offset << 1) | self._bit()
        if self.offset >= 510:
            raise ValueError("illegal CABAC initial offset")

    def _bit(self) -> int:
        if self.r.pos >= self.nbits:
            self.over += 1
            if self.over > 64:
                raise ValueError("CABAC decode ran past end of slice data")
            return 0
        return self.r.u(1)

    def decision(self, ctx: _Ctx, idx: int) -> int:
        st = ctx.s[idx]
        lps = _RANGE_LPS[st][(self.range >> 6) & 3]
        self.range -= lps
        if self.offset >= self.range:
            b = 1 - ctx.m[idx]
            self.offset -= self.range
            self.range = lps
            if st == 0:
                ctx.m[idx] = 1 - ctx.m[idx]
            ctx.s[idx] = _TRANS_LPS[st]
        else:
            b = ctx.m[idx]
            ctx.s[idx] = min(st + 1, 62)
        while self.range < 256:
            self.range <<= 1
            self.offset = (self.offset << 1) | self._bit()
        return b

    def bypass(self) -> int:
        self.offset = (self.offset << 1) | self._bit()
        if self.offset >= self.range:
            self.offset -= self.range
            return 1
        return 0

    def terminate(self) -> int:
        self.range -= 2
        if self.offset >= self.range:
            return 1
        while self.range < 256:
            self.range <<= 1
            self.offset = (self.offset << 1) | self._bit()
        return 0

    def reinit(self) -> None:
        """9.3.1.2: re-initialise the decoding engine after I_PCM raw
        samples (the underlying reader sits at the byte-aligned position
        right past them; context states persist)."""
        self.range = 510
        self.offset = 0
        for _ in range(9):
            self.offset = (self.offset << 1) | self._bit()
        if self.offset >= 510:
            raise ValueError("illegal CABAC initial offset")


# ------------------------------------------------------ binarizations
def _enc_tu(enc, ctx, base, incs, v, cmax):
    """Truncated unary: v ones then a zero (omitted at cmax); bin i uses
    context base + incs[min(i, len(incs)-1)]."""
    for i in range(v):
        enc.decision(ctx, base + incs[min(i, len(incs) - 1)], 1)
    if v < cmax:
        enc.decision(ctx, base + incs[min(v, len(incs) - 1)], 0)


def _dec_tu(dec, ctx, base, incs, cmax):
    v = 0
    while v < cmax and dec.decision(ctx, base + incs[min(v, len(incs) - 1)]):
        v += 1
    return v


def _enc_egk(enc, v, k):
    """Order-k Exp-Golomb suffix, all bypass bins (9.3.2.3)."""
    while v >= (1 << k):
        enc.bypass(1)
        v -= 1 << k
        k += 1
    enc.bypass(0)
    for i in range(k - 1, -1, -1):
        enc.bypass((v >> i) & 1)


def _dec_egk(dec, k):
    base = 0
    while dec.bypass():
        base += 1 << k
        k += 1
        if k > 32:
            raise ValueError("bad CABAC Exp-Golomb suffix")
    v = 0
    for _ in range(k):
        v = (v << 1) | dec.bypass()
    return base + v


# residual block categories: 0 Intra16x16DCLevel, 1 Intra16x16ACLevel,
# 2 LumaLevel4x4, 3 ChromaDCLevel, 4 ChromaACLevel (r7)
def _enc_residual(enc, ctx, cat, scan, cbf_inc):
    nz = any(scan)
    enc.decision(ctx, _OFS["cbf"] + cat * 4 + cbf_inc, 1 if nz else 0)
    if not nz:
        return
    n = len(scan)
    last_idx = max(i for i, v in enumerate(scan) if v)
    sig_base = _OFS["sig"] + cat * 15
    last_base = _OFS["last"] + cat * 15
    for i in range(n - 1):
        sig = scan[i] != 0
        enc.decision(ctx, sig_base + min(i, 14), 1 if sig else 0)
        if sig:
            is_last = i == last_idx
            enc.decision(ctx, last_base + min(i, 14), 1 if is_last else 0)
            if is_last:
                break
    # position n-1 significant-by-implication when the loop completes
    num_eq1 = num_gt1 = 0
    lvl_base = _OFS["lvl"] + cat * 10
    for i in range(last_idx, -1, -1):
        v = scan[i]
        if not v:
            continue
        a = abs(v) - 1
        inc0 = 0 if num_gt1 else min(4, 1 + num_eq1)
        incs = (inc0,) + (5 + min(4, num_gt1),)
        _enc_tu(enc, ctx, lvl_base, incs, min(a, 14), 14)
        if a >= 14:
            _enc_egk(enc, a - 14, 0)
        enc.bypass(1 if v < 0 else 0)
        if abs(v) > 1:
            num_gt1 += 1
        else:
            num_eq1 += 1


def _dec_residual(dec, ctx, cat, n, cbf_inc):
    if not dec.decision(ctx, _OFS["cbf"] + cat * 4 + cbf_inc):
        return [0] * n
    sig = [False] * n
    sig_base = _OFS["sig"] + cat * 15
    last_base = _OFS["last"] + cat * 15
    last_idx = -1
    for i in range(n - 1):
        if dec.decision(dec_ctx := ctx, sig_base + min(i, 14)):
            sig[i] = True
            if dec.decision(dec_ctx, last_base + min(i, 14)):
                last_idx = i
                break
    if last_idx < 0:
        sig[n - 1] = True
        last_idx = n - 1
    out = [0] * n
    num_eq1 = num_gt1 = 0
    lvl_base = _OFS["lvl"] + cat * 10
    for i in range(last_idx, -1, -1):
        if not sig[i]:
            continue
        inc0 = 0 if num_gt1 else min(4, 1 + num_eq1)
        incs = (inc0,) + (5 + min(4, num_gt1),)
        a = _dec_tu(dec, ctx, lvl_base, incs, 14)
        if a == 14:
            a += _dec_egk(dec, 0)
        mag = a + 1
        out[i] = -mag if dec.bypass() else mag
        if mag > 1:
            num_gt1 += 1
        else:
            num_eq1 += 1
    return out


def _enc_mvd(enc, ctx, base, nsum, v):
    """UEG3 (uCoff 9): TU prefix context-coded, EG3 suffix + sign bypass."""
    a = abs(v)
    inc0 = 0 if nsum < 3 else (1 if nsum <= 32 else 2)
    incs = (inc0, 3, 4, 5, 6, 6, 6, 6, 6)
    _enc_tu(enc, ctx, base, incs, min(a, 9), 9)
    if a >= 9:
        _enc_egk(enc, a - 9, 3)
    if a:
        enc.bypass(1 if v < 0 else 0)


def _dec_mvd(dec, ctx, base, nsum):
    inc0 = 0 if nsum < 3 else (1 if nsum <= 32 else 2)
    incs = (inc0, 3, 4, 5, 6, 6, 6, 6, 6)
    a = _dec_tu(dec, ctx, base, incs, 9)
    if a == 9:
        a += _dec_egk(dec, 3)
    if a and dec.bypass():
        return -a
    return a


def _ref_inc(mvs, bx, by):
    """ctxIdxInc for ref_idx_l0 bin0 (9.3.3.1.1.6 shape): left/above
    4x4 neighbours of the partition anchor with ref > 0 contribute
    1/2; unavailable, intra, or uncommitted (this slice) count 0.
    Computed BEFORE any of the MB's motion commits — shared enc/dec."""
    a = 1 if bx > 0 and mvs.ref[by, bx - 1] > 0 else 0
    b = 1 if by > H._SLICE_TOP * 4 and mvs.ref[by - 1, bx] > 0 else 0
    return a + 2 * b


def _enc_ref_idx(enc, ctx, mvs, bx, by, ridx):
    """ref_idx_l0, unary binarization: bin0 neighbor-conditioned, bin1
    and bins 2+ on their own contexts (9.3.2.x U + Table 9-34 shape)."""
    base = _OFS["ref_idx"]
    idx0 = base + _ref_inc(mvs, bx, by)
    for k in range(ridx):
        enc.decision(ctx, idx0 if k == 0 else base + 4 if k == 1
                     else base + 5, 1)
    enc.decision(ctx, idx0 if ridx == 0 else base + 4 if ridx == 1
                 else base + 5, 0)


def _dec_ref_idx(dec, ctx, mvs, bx, by, nrefs):
    base = _OFS["ref_idx"]
    idx0 = base + _ref_inc(mvs, bx, by)
    k = 0
    while dec.decision(ctx, idx0 if k == 0 else base + 4 if k == 1
                       else base + 5):
        k += 1
        if k >= nrefs:
            raise ValueError("ref_idx_l0 out of range")
    return k


def _enc_qp_delta(enc, ctx, prev_nz, d):
    mapped = -2 * d if d <= 0 else 2 * d - 1
    incs = (1 if prev_nz else 0, 2, 3)
    _enc_tu(enc, ctx, _OFS["qp_delta"], incs, mapped, 52)


def _dec_qp_delta(dec, ctx, prev_nz):
    incs = (1 if prev_nz else 0, 2, 3)
    mapped = _dec_tu(dec, ctx, _OFS["qp_delta"], incs, 52)
    return (mapped + 1) // 2 if mapped % 2 else -(mapped // 2)


def _enc_cbp_chroma(enc, ctx, cbpc):
    """cbp_chroma: bin0 = any chroma residual, bin1 = AC too (in-repo
    ctx layout: two dedicated contexts, inc 0)."""
    enc.decision(ctx, _OFS["cbp_chroma"], 1 if cbpc else 0)
    if cbpc:
        enc.decision(ctx, _OFS["cbp_chroma"] + 1, cbpc - 1)


def _dec_cbp_chroma(dec, ctx):
    if not dec.decision(ctx, _OFS["cbp_chroma"]):
        return 0
    return 1 + dec.decision(ctx, _OFS["cbp_chroma"] + 1)


def _enc_chroma_residual(enc, ctx, cbpc, comps):
    """CABAC chroma residual: DC (cat 3) both components, then the 8 AC
    blocks (cat 4) when cbpc == 2 — the mirror of _dec_chroma_residual;
    per-block emptiness rides in each block's coded_block_flag."""
    if cbpc == 0:
        return
    for ci in range(2):
        _enc_residual(enc, ctx, 3, H._scan_cdc(comps[ci]["dc"]), 0)
    if cbpc == 2:
        for ci in range(2):
            for blk in range(4):
                _enc_residual(enc, ctx, 4,
                              H._scan15(comps[ci]["ac"][blk]), 0)


def _dec_chroma_residual(dec, ctx, cbpc, qp):
    """Returns the (2, 8, 8) int32 chroma RESIDUAL planes (inverse-
    transformed, ready to add onto the prediction)."""
    out = np.zeros((2, 8, 8), np.int32)
    if cbpc == 0:
        return out
    qc = H._qpc(qp)
    dcvs = []
    for _ci in range(2):
        lv = H._unscan_cdc(_dec_residual(dec, ctx, 3, 4, 0))
        dcvs.append(H._dequant_dc2(lv, qc))
    for ci in range(2):
        for blk in range(4):
            ox, oy = (blk % 2) * 4, (blk // 2) * 4
            if cbpc == 2:
                lv = H._unscan15(_dec_residual(dec, ctx, 4, 15, 0))
                d = H._dequant4(lv, qc)
            else:
                d = np.zeros((4, 4), np.int64)
            d[0, 0] = dcvs[ci][blk // 2, blk % 2]
            out[ci, oy:oy + 4, ox:ox + 4] = H._inv4(d)
    return out


def _enc_mb_type_i(enc, ctx, base, inc0, mbt):
    """Table 9-36 I-slice mb_type tree (0 = I_NxN, 1..24 = I_16x16;
    I_PCM never emitted)."""
    if mbt == 0:
        enc.decision(ctx, base + inc0, 0)
        return
    enc.decision(ctx, base + inc0, 1)
    enc.terminate(0)  # the I_PCM bin (ctx 276 decodeTerminate)
    t = mbt - 1
    cbpl = 1 if t >= 12 else 0
    cbpc = (t // 4) % 3
    pm = t % 4
    enc.decision(ctx, base + 3, cbpl)
    enc.decision(ctx, base + 4, 1 if cbpc > 0 else 0)
    if cbpc:
        enc.decision(ctx, base + 5, cbpc - 1)
    enc.decision(ctx, base + 6, (pm >> 1) & 1)
    enc.decision(ctx, base + 7, pm & 1)


def _dec_mb_type_i(dec, ctx, base, inc0):
    if not dec.decision(ctx, base + inc0):
        return 0
    if dec.terminate():
        return 25  # I_PCM (the ctx-276 terminate bin; caller handles)
    cbpl = dec.decision(ctx, base + 3)
    cbpc = 0
    if dec.decision(ctx, base + 4):
        cbpc = 1 + dec.decision(ctx, base + 5)
    pm = (dec.decision(ctx, base + 6) << 1) | dec.decision(ctx, base + 7)
    return 1 + pm + 4 * cbpc + 12 * cbpl


# ------------------------------------------------------ per-MB state
class _MbState:
    """Neighbor-context state shared by encoder and decoder so both sides
    derive identical ctxIdxInc values."""

    def __init__(self, mbw, mbh):
        self.mbw, self.mbh = mbw, mbh
        self.not_i4 = np.zeros((mbh, mbw), np.int32)   # mb_type != I_NxN
        self.skip = np.zeros((mbh, mbw), np.int32)
        self.cbp = np.zeros((mbh, mbw), np.int32)      # luma 4-bit cbp
        self.mvd = np.zeros((mbh, mbw, 2), np.int32)   # |mvd| per MB
        self.cbf = np.zeros((mbh * 4, mbw * 4), np.int32)   # 4x4 luma cbf
        self.cbf_dc = np.zeros((mbh, mbw), np.int32)   # I16 DC cbf
        self.t8 = np.zeros((mbh, mbw), np.int32)  # transform_size_8x8
        self.prev_qp_nz = False

    def mbt_inc(self, mx, my):
        a = self.not_i4[my, mx - 1] if mx > 0 else 0
        b = self.not_i4[my - 1, mx] if my > H._SLICE_TOP else 0
        return int(a) + int(b)

    def skip_inc(self, mx, my):
        # condTermN = !mb_skip_flag(N); unavailable -> 0
        a = 1 if mx > 0 and not self.skip[my, mx - 1] else 0
        b = 1 if my > H._SLICE_TOP and not self.skip[my - 1, mx] else 0
        return a + b

    def cbp_inc(self, mx, my, blk8, cur_bits):
        # 9.3.3.1.1.4: condTermN = 1 when the neighbouring 8x8 bit is 0
        bx, by = blk8 & 1, blk8 >> 1
        if bx:  # left neighbour inside this MB
            a = 0 if (cur_bits >> (by * 2)) & 1 else 1
        else:
            a = (0 if (self.cbp[my, mx - 1] >> (by * 2 + 1)) & 1 else 1) \
                if mx > 0 else 0
        if by:
            b = 0 if (cur_bits >> bx) & 1 else 1
        else:
            b = (0 if (self.cbp[my - 1, mx] >> (2 + bx)) & 1 else 1) \
                if my > H._SLICE_TOP else 0
        return a + 2 * b

    def mvd_inc_sum(self, mx, my, comp):
        a = self.mvd[my, mx - 1, comp] if mx > 0 else 0
        b = self.mvd[my - 1, mx, comp] if my > H._SLICE_TOP else 0
        return int(a) + int(b)

    def cbf_inc(self, bx, by):
        a = int(self.cbf[by, bx - 1]) if bx > 0 else 0
        b = int(self.cbf[by - 1, bx]) if by > H._SLICE_TOP * 4 else 0
        return a + 2 * b

    def cbf_dc_inc(self, mx, my):
        a = int(self.cbf_dc[my, mx - 1]) if mx > 0 else 0
        b = int(self.cbf_dc[my - 1, mx]) if my > H._SLICE_TOP else 0
        return a + 2 * b

    def t8_inc(self, mx, my):
        # 9.3.3.1.1.10 shape: left + above transform_size_8x8_flag
        a = int(self.t8[my, mx - 1]) if mx > 0 else 0
        b = int(self.t8[my - 1, mx]) if my > H._SLICE_TOP else 0
        return a + b


def _slice_header(bw, slice_type, qp, frame_num, deblock, idr,
                  poc_lsb=None, direct_spatial=True, nrefs=1, wp=None,
                  first_mb=0):
    bw.ue(first_mb)             # first_mb_in_slice (multi-slice r7)
    bw.ue(slice_type)           # 7 = I, 5 = P, 6 = B (all slices)
    bw.ue(0)                    # pps_id
    bw.u(frame_num & 0xF, 4)
    if idr:
        bw.ue(0)                # idr_pic_id
    if poc_lsb is not None:     # poc_type-0 SPS (B-enabled streams)
        bw.u(poc_lsb & 0xFFFF, 16)
    if slice_type == 6:
        bw.u(1 if direct_spatial else 0, 1)  # direct_spatial_mv_pred_flag
    if not idr:
        if nrefs > 1:           # multi-reference L0 (r7, P slices)
            bw.u(1, 1)          # num_ref_idx_active_override_flag
            bw.ue(nrefs - 1)
        else:
            bw.u(0, 1)          # num_ref_idx_active_override_flag
        bw.u(0, 1)              # ref_pic_list_modification_flag_l0
        if slice_type == 6:
            bw.u(0, 1)          # ref_pic_list_modification_flag_l1
        if wp is not None and slice_type == 5:
            H._write_pred_weight_table(bw, wp, nrefs)  # explicit WP (r7)
    if idr:
        bw.u(0, 1)              # no_output_of_prior_pics
        bw.u(0, 1)              # long_term_reference
    elif slice_type != 6:       # B pictures here are non-reference
        bw.u(0, 1)              # adaptive_ref_pic_marking_mode_flag
    # cabac_init_idc (P/B slices; value ignored by the in-repo init)
    if slice_type in (5, 6):
        bw.ue(0)
    bw.se(qp - 26)              # slice_qp_delta
    bw.ue(0 if deblock else 1)  # disable_deblocking_filter_idc
    if deblock:
        bw.se(0)
        bw.se(0)
    # cabac_alignment_one_bit(s)
    while bw.n:
        bw.u(1, 1)


# ------------------------------------------------------ encoder
def encode_idr_cabac(gray: np.ndarray, qp: int = 10, max_coeffs: int = 16,
                     deblock: bool = False, full_recon: bool = False,
                     poc_lsb: int | None = None,
                     chroma: np.ndarray | None = None,
                     pcm_mask: np.ndarray | None = None,
                     slice_rows: int | None = None,
                     t8x8: bool = False):
    """One frame -> (IDR slice RBSP, reconstructed plane), CABAC
    entropy coding. Mode decisions, transforms, and reconstruction are
    identical to encode_idr_cavlc (h264.py) — only the entropy layer
    differs. `chroma` (2, h/2, w/2) codes REAL 4:2:0 residuals (r7,
    cats 3/4); None keeps the gray contract. decode == recon bit-exact
    (the codec gate). `pcm_mask` ((mbh, mbw) bool) forces the marked
    macroblocks to I_PCM (r7): raw samples after the ctx-276 terminate
    bin, arithmetic engine flushed + re-initialised around the payload
    (9.3.1.2) — bit-exact for those MBs by construction."""
    if pcm_mask is not None and deblock:
        raise ValueError("I_PCM (qp 0) + deblock not supported together")
    a = np.asarray(gray, np.uint8)
    h, w = a.shape
    mbw = -(-w // 16)
    mbh = -(-h // 16)
    src = np.pad(a, ((0, mbh * 16 - h), (0, mbw * 16 - w)), mode="edge")
    plane = np.zeros((mbh * 16, mbw * 16), np.uint8)
    plane_w = mbw * 16
    nnz = np.zeros((mbh * 4, mbw * 4), np.int32)
    modes = np.full((mbh * 4, mbw * 4), -1, np.int32)
    csrc = H._pad_chroma(chroma, mbw, mbh, h, w)
    crec = np.full((2, mbh * 8, mbw * 8), 128, np.uint8)
    ch = (csrc, crec)

    H._set_t8(t8x8)  # High-profile PPS: I_NxN MBs carry the 8x8 flag
    t8m = np.zeros((mbh, mbw), np.int32) if t8x8 else None
    H._set_t8map(t8m)  # per-MB flags feed the 8.7 edge derivation
    rbsps = []
    for r0, r1 in H._slice_ranges(mbh, slice_rows):
        H._set_slice_top(r0)
        st = _MbState(mbw, mbh)  # per-slice CABAC neighbour state
        bw = H._BitWriter()
        _slice_header(bw, 7, qp, 0, deblock, idr=True, poc_lsb=poc_lsb,
                      first_mb=r0 * mbw)
        enc = _Enc()
        ctx = _Ctx()
        for my in range(r0, r1):
            for mx in range(mbw):
                smb = src[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16]
                if pcm_mask is not None and pcm_mask[my, mx]:
                    _enc_mb_ipcm(enc, ctx, st, smb, csrc, plane, crec,
                                 mx, my, nnz, modes, _OFS["mbt_i"])
                else:
                    done = False
                    if int(smb.max()) - int(smb.min()) <= 8:
                        done = _enc_mb_i16(enc, ctx, st, smb, plane, mx, my,
                                           qp, nnz, modes, max_coeffs,
                                           _OFS["mbt_i"], ch)
                    if not done:
                        _enc_mb_i4(enc, ctx, st, smb, plane, mx, my, qp, nnz,
                                   modes, max_coeffs, plane_w, _OFS["mbt_i"],
                                   ch)
                last = my == r1 - 1 and mx == mbw - 1
                enc.terminate(1 if last else 0)
        bw.raw(enc.to_bytes())
        rbsps.append(bytes(bw.buf))
    H._set_slice_top(0)
    H._set_t8(False)
    H._set_t8map(None)
    out = plane
    if deblock and qp >= 16:
        out = H._deblock_luma(plane, np.full((mbh, mbw), qp, np.int32),
                              t8=t8m)
        crec = H._deblock_chroma(crec, np.full((mbh, mbw), qp, np.int32))
    y = out if full_recon else out[:h, :w].copy()
    rb = rbsps[0] if slice_rows is None else rbsps
    if chroma is None:
        return rb, y
    crop = crec if full_recon else crec[:, :(h + 1) // 2, :(w + 1) // 2].copy()
    return rb, (y, crop)


def encode_idr_ipcm_cabac(gray: np.ndarray,
                          chroma: np.ndarray | None = None) -> bytes:
    """One frame -> IDR slice RBSP, all macroblocks I_PCM, CABAC slice
    syntax (r7) — the CABAC twin of h264.encode_idr_ipcm. Bit-exact:
    raw samples ride between engine flush/re-init pairs. `chroma`
    (2, h/2, w/2) writes real Cb/Cr samples, None writes flat 128."""
    a = np.asarray(gray, np.uint8)
    mbw, mbh = -(-a.shape[1] // 16), -(-a.shape[0] // 16)
    rbsp, _ = encode_idr_cabac(gray, qp=26, chroma=chroma,
                               pcm_mask=np.ones((mbh, mbw), bool))
    return rbsp


def _enc_mb_ipcm(enc, ctx, st, smb, csrc, plane, crec, mx, my, nnz,
                 modes, mbt_base):
    """I_PCM macroblock (mb_type 25) in CABAC: mb_type prefix bin 1,
    the ctx-276 terminate bin set (flushing the arithmetic encoder),
    pcm_alignment_zero_bits, then 256 raw luma + 2x64 raw chroma
    samples; the engine re-initialises after the payload with context
    states persisting (9.3.1.2). Neighbor state follows the spec's
    I_PCM conventions: nnz 16, cbp/cbf treated as all-coded."""
    enc.decision(ctx, mbt_base + st.mbt_inc(mx, my), 1)
    enc.terminate(1)  # I_PCM bin -> EncodeFlush
    cb = csrc[0, my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
    cr = csrc[1, my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
    enc.pcm_payload(smb.tobytes() + cb.tobytes() + cr.tobytes())
    plane[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16] = smb
    crec[0, my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = cb
    crec[1, my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = cr
    nnz[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = 16
    modes[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = -1
    st.not_i4[my, mx] = 1
    st.cbp[my, mx] = 15
    st.cbf[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = 1
    st.cbf_dc[my, mx] = 1


def _enc_mb_i16(enc, ctx, st, smb, plane, mx, my, qp, nnz, modes,
                max_coeffs, mbt_base, ch):
    """I_16x16 DC attempt — same commit rule + recon as h264._encode_mb_i16,
    CABAC serialization."""
    pred = H._pred16(plane, mx, my, 2, mx > 0, my > H._SLICE_TOP)
    resid = smb.astype(np.int32) - pred
    dcs = np.empty((4, 4), np.int64)
    for by in range(4):
        for bx in range(4):
            wblk = H._fwd4(resid[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4])
            if np.any(H._quant4(wblk * 1, qp)[H._AC_MASK]):
                return False
            dcs[by, bx] = wblk[0, 0]
    had = H._H4 @ dcs @ H._H4
    shift = 15 + qp // 6
    f2 = 2 * ((1 << shift) // 3)
    mf00 = H._MF[qp % 6][0]
    dc_lv = (np.sign(had) * (((np.abs(had) >> 1) * mf00 + f2) >> (shift + 1))
             ).astype(np.int32)
    if np.count_nonzero(dc_lv) > max_coeffs:
        return False
    # chroma (r7): best-mode intra prediction + residual; cbpc rides in
    # mb_type, the mode in the TU-binarized intra_chroma_pred_mode
    csrc, crec = ch
    csrc_mb = csrc[:, my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
    icp, cpred = H._pick_chroma_mode(crec, csrc_mb, mx, my,
                                     mx > 0, my > H._SLICE_TOP)
    cbpc, comps = H._encode_chroma_mb(csrc_mb, cpred, qp, intra=True)
    _enc_mb_type_i(enc, ctx, mbt_base, st.mbt_inc(mx, my), 1 + 2 + 4 * cbpc)
    _enc_tu(enc, ctx, _OFS["chroma_mode"], (0, 3, 3), icp, 3)
    _enc_qp_delta(enc, ctx, st.prev_qp_nz, 0)
    st.prev_qp_nz = False
    scan = H._scan16(dc_lv)
    _enc_residual(enc, ctx, 0, scan, st.cbf_dc_inc(mx, my))
    st.cbf_dc[my, mx] = 1 if any(scan) else 0
    # cbp_luma == 0: no AC residuals; Intra16x16AC cbf grid stays 0
    _enc_chroma_residual(enc, ctx, cbpc, comps)
    dcv = H._i16_dc_dequant(dc_lv, qp)
    out = pred.copy()
    for by in range(4):
        for bx in range(4):
            d = np.zeros((4, 4), np.int64)
            d[0, 0] = dcv[by, bx]
            out[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] += H._inv4(d).astype(np.int32)
    np.clip(out, 0, 255, out)
    plane[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16] = out.astype(np.uint8)
    for ci in range(2):
        crec[ci, my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = comps[ci]["recon"]
    nnz[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = 0
    modes[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = -1
    st.not_i4[my, mx] = 1
    st.cbf[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = 0
    st.cbp[my, mx] = 0
    return True


def _enc_mb_i4(enc, ctx, st, smb, plane, mx, my, qp, nnz, modes,
               max_coeffs, plane_w, mbt_base, ch, in_p=False):
    """I_NxN macroblock, CABAC serialization; decisions/recon identical
    to h264._encode_mb_i4 — including the High-profile I_8x8 candidate
    race on coefficient count (r7). 8x8 residuals go out as one cat-5
    block; pred modes reuse the prev_i4/rem_i4 contexts (9.3.3.1)."""
    ys, xs = my * 16, mx * 16
    if H._T8:  # pre-state, to replay for the I_8x8 candidate
        plane0 = plane[ys:ys + 16, xs:xs + 16].copy()
        nnz0 = nnz[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4].copy()
        modes0 = modes[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4].copy()
    blocks = []
    cbp = 0
    smb = smb.astype(np.uint8)
    for blk in range(16):
        ox, oy = H._BLK_XY[blk]
        px, py = mx * 16 + ox, my * 16 + oy
        bx, by = px // 4, py // 4
        al, aa, aar, aal = H._mb_avail(blk, px, py, plane_w)
        sblk = smb[oy:oy + 4, ox:ox + 4].astype(np.int32)
        best = None
        for mode in (2, 0, 1):
            if mode == 0 and not aa:
                continue
            if mode == 1 and not al:
                continue
            p = H._pred4(plane, px, py, mode, al, aa, aar, aal)
            ssd = int(((sblk - p) ** 2).sum())
            if best is None or ssd < best[0]:
                best = (ssd, mode, p)
        _, mode, pred = best
        lv = H._thin(H._quant4(H._fwd4(sblk - pred), qp), max_coeffs)
        scan = H._scan16(lv)
        tc = int(np.count_nonzero(lv))
        if tc:
            cbp |= 1 << (blk >> 2)
        blocks.append((mode, scan, tc))
        nnz[by, bx] = tc
        modes[by, bx] = mode
        rec = pred + H._inv4(H._dequant4(lv, qp)).astype(np.int32)
        np.clip(rec, 0, 255, rec)
        plane[py:py + 4, px:px + 4] = rec.astype(np.uint8)
    use8 = False
    if H._T8:  # race the I_8x8 candidate on the same pre-state
        plane4 = plane[ys:ys + 16, xs:xs + 16].copy()
        nnz4 = nnz[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4].copy()
        modes4 = modes[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4].copy()
        plane[ys:ys + 16, xs:xs + 16] = plane0
        nnz[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = nnz0
        modes[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = modes0
        n8, blocks8, cbp8 = H._eval_mb_i8(plane, smb, mx, my, qp, plane_w)
        use8 = n8 <= sum(b[2] for b in blocks)
        if not use8:
            plane[ys:ys + 16, xs:xs + 16] = plane4
            nnz[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = nnz4
            modes[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = modes4
        else:
            cbp = cbp8
            H._mark_t8(mx, my)
    # serialize
    if in_p:
        # P mb_type: b0=1 (intra) then the intra suffix tree
        enc.decision(ctx, _OFS["mbt_p"], 1)
        _enc_mb_type_i(enc, ctx, _OFS["mbt_p_suf"], 0, 0)
    else:
        _enc_mb_type_i(enc, ctx, mbt_base, st.mbt_inc(mx, my), 0)
    if H._T8:  # High-profile PPS: I_NxN carries transform_size_8x8_flag
        enc.decision(ctx, _OFS["t8flag"] + st.t8_inc(mx, my),
                     1 if use8 else 0)
        st.t8[my, mx] = 1 if use8 else 0
    if use8:
        for b8, (mode8, _q8) in enumerate(blocks8):
            bx, by = mx * 4 + (b8 & 1) * 2, my * 4 + (b8 >> 1) * 2
            pm = H._pred_mode_for(modes, bx, by)
            if mode8 == pm:
                enc.decision(ctx, _OFS["prev_i4"], 1)
            else:
                enc.decision(ctx, _OFS["prev_i4"], 0)
                rem = mode8 - (1 if mode8 > pm else 0)
                for i in range(3):  # 3 FL bins, LSB first (9.3.2)
                    enc.decision(ctx, _OFS["rem_i4"], (rem >> i) & 1)
            # replicate into the 4x4 grid so later pred-mode derivations
            # see the 8x8 mode (decoder does the same)
            modes[by:by + 2, bx:bx + 2] = mode8
    else:
        for blk in range(16):
            ox, oy = H._BLK_XY[blk]
            bx, by = (mx * 16 + ox) // 4, (my * 16 + oy) // 4
            mode = blocks[blk][0]
            pm = H._pred_mode_for(modes, bx, by)
            if mode == pm:
                enc.decision(ctx, _OFS["prev_i4"], 1)
            else:
                enc.decision(ctx, _OFS["prev_i4"], 0)
                rem = mode - (1 if mode > pm else 0)
                for i in range(3):  # 3 FL bins, LSB first (9.3.2)
                    enc.decision(ctx, _OFS["rem_i4"], (rem >> i) & 1)
    # chroma residual (r7): best-mode pred, computed before cbp so
    # cbp_chroma is known; TU-binarized intra_chroma_pred_mode
    csrc, crec = ch
    csrc_mb = csrc[:, my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
    icp, cpred = H._pick_chroma_mode(crec, csrc_mb, mx, my,
                                     mx > 0, my > H._SLICE_TOP)
    _enc_tu(enc, ctx, _OFS["chroma_mode"], (0, 3, 3), icp, 3)
    cbpc, comps = H._encode_chroma_mb(csrc_mb, cpred, qp, intra=True)
    # coded_block_pattern: 4 luma bins (8x8 raster) + chroma bins
    for blk8 in range(4):
        bit = (cbp >> blk8) & 1
        enc.decision(ctx, _OFS["cbp_luma"] + st.cbp_inc(mx, my, blk8, cbp),
                     bit)
    _enc_cbp_chroma(enc, ctx, cbpc)
    if cbp | cbpc:
        _enc_qp_delta(enc, ctx, st.prev_qp_nz, 0)
        st.prev_qp_nz = False
    if use8:  # cat-5 8x8 residual blocks over the 8x8 zigzag (r7)
        for b8 in range(4):
            cells = [(my * 4 + (b8 >> 1) * 2 + (k >> 1),
                      mx * 4 + (b8 & 1) * 2 + (k & 1)) for k in range(4)]
            if cbp & (1 << b8):
                q8 = blocks8[b8][1]
                flat = q8.reshape(-1)[H._ZZ8]
                _enc_residual(enc, ctx, 5, [int(v) for v in flat],
                              st.cbf_inc(cells[0][1], cells[0][0]))
                nzb = 1 if np.any(q8) else 0
                tcb = min(int(np.count_nonzero(q8)), 16)
            else:
                nzb = tcb = 0
            for by, bx in cells:
                st.cbf[by, bx] = nzb
                nnz[by, bx] = tcb
    else:
        for blk in range(16):
            ox, oy = H._BLK_XY[blk]
            bx, by = (mx * 16 + ox) // 4, (my * 16 + oy) // 4
            if cbp & (1 << (blk >> 2)):
                _, scan, tc = blocks[blk]
                _enc_residual(enc, ctx, 2, scan, st.cbf_inc(bx, by))
                st.cbf[by, bx] = 1 if tc else 0
            else:
                st.cbf[by, bx] = 0
    _enc_chroma_residual(enc, ctx, cbpc, comps)
    for ci in range(2):
        crec[ci, my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = comps[ci]["recon"]
    st.not_i4[my, mx] = 0
    st.cbp[my, mx] = cbp
    st.cbf_dc[my, mx] = 0
    st.mvd[my, mx] = 0


def encode_p_cabac(gray: np.ndarray, ref_full: np.ndarray, qp: int = 10,
                   max_coeffs: int = 16, frame_num: int = 1,
                   search: int = 8, deblock: bool = False,
                   poc_lsb: int | None = None,
                   chroma: np.ndarray | None = None,
                   cref: np.ndarray | None = None,
                   motion_out: list | None = None,
                   wp: dict | None = None,
                   slice_rows: int | None = None,
                   t8x8: bool = False):
    """One gray frame -> (P-slice RBSP, FULL recon plane), CABAC entropy.
    Same decisions as encode_p_cavlc: P_SKIP (mb_skip_flag=1) / motion-
    compensated P_L0_16x16 / intra (I_4x4) fallback on SAD failure.
    `ref_full` may be a most-recent-first LIST of recon planes (r7
    multi-reference L0): every inter partition then carries a
    neighbor-conditioned unary ref_idx_l0; same encoder policy as the
    CAVLC twin (best penalized 16x16 SAD picks the MB's reference)."""
    a = np.asarray(gray, np.uint8)
    h, w = a.shape
    mbw = -(-w // 16)
    mbh = -(-h // 16)
    refs = H._ref_list(ref_full)
    nrefs = len(refs)
    for rp in refs:
        assert rp.shape == (mbh * 16, mbw * 16), "reference plane mismatch"
    src = np.pad(a, ((0, mbh * 16 - h), (0, mbw * 16 - w)), mode="edge")
    plane = np.zeros((mbh * 16, mbw * 16), np.uint8)
    plane_w = mbw * 16
    nnz = np.zeros((mbh * 4, mbw * 4), np.int32)
    modes = np.full((mbh * 4, mbw * 4), -1, np.int32)
    mvs = H._MvState(mbw, mbh)
    qp_map = np.full((mbh, mbw), qp, np.int32)
    csrc = H._pad_chroma(chroma, mbw, mbh, h, w)
    crefs = H._ref_list(cref) if cref is not None else []
    while len(crefs) < nrefs:  # gray-stream references: flat chroma
        crefs.append(np.full((2, mbh * 8, mbw * 8), 128, np.uint8))
    cref = crefs[0]
    crec = np.full((2, mbh * 8, mbw * 8), 128, np.uint8)
    ch = (csrc, crec)
    # explicit WP (r7): same policy as the CAVLC twin — pre-weighted
    # luma search planes (bit-exact at integer-pel MVs), chroma weights
    # applied after interpolation exactly like the decoder
    wl = wc = None
    srefs = refs
    if wp is not None:
        wl, wc = H._resolve_wp(wp, nrefs)
        srefs = [rp if wl[ri] is None else
                 H._wp_apply(rp.astype(np.int32), wl[ri]).astype(np.uint8)
                 for ri, rp in enumerate(refs)]

    def _wpck(ridx, ci):
        return wc[ridx][ci] if wc is not None and wc[ridx] else None

    H._set_t8(t8x8)
    t8m = np.zeros((mbh, mbw), np.int32) if t8x8 else None
    H._set_t8map(t8m)  # per-MB flags feed the 8.7 edge derivation
    starts = dict(H._slice_ranges(mbh, slice_rows))
    rbsps = []
    bw = enc = ctx = st = None
    r1 = mbh
    for my in range(mbh):
        if my in starts:  # new slice at this MB row (multi-slice, r7)
            if bw is not None:
                bw.raw(enc.to_bytes())
                rbsps.append(bytes(bw.buf))
            H._set_slice_top(my)
            r1 = starts[my]
            st = _MbState(mbw, mbh)  # per-slice CABAC neighbour state
            bw = H._BitWriter()
            _slice_header(bw, 5, qp, frame_num, deblock, idr=False,
                          poc_lsb=poc_lsb, nrefs=nrefs, wp=wp,
                          first_mb=my * mbw)
            enc = _Enc()
            ctx = _Ctx()
        for mx in range(mbw):
            smb = src[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16].astype(np.int32)
            last = my == r1 - 1 and mx == mbw - 1
            # --- P_SKIP candidate
            smv = mvs.skip_mv(mx, my)
            pred = H._interp_luma(srefs[0], mx * 16, my * 16, *smv)
            cpred_skip = np.stack([
                H._interp_chroma(cref[ci], mx * 8, my * 8, *smv,
                                 wp=_wpck(0, ci))
                for ci in range(2)])
            csrc_mb = csrc[:, my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
            if H._all_zero_quant(smb - pred, qp) and \
                    H._chroma_zero(csrc_mb, cpred_skip, qp):
                enc.decision(ctx, _OFS["mb_skip"] + st.skip_inc(mx, my), 1)
                plane[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16] = \
                    np.clip(pred, 0, 255).astype(np.uint8)
                for ci in range(2):
                    crec[ci, my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = \
                        np.clip(cpred_skip[ci], 0, 255).astype(np.uint8)
                nnz[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = 0
                mvs.set_mb(mx, my, smv, 0)
                modes[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = -1
                st.skip[my, mx] = 1
                st.mvd[my, mx] = 0
                st.cbf[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = 0
                st.cbp[my, mx] = 0
                st.not_i4[my, mx] = 1
                enc.terminate(1 if last else 0)
                continue
            enc.decision(ctx, _OFS["mb_skip"] + st.skip_inc(mx, my), 0)
            # --- integer-pel search around the median predictor; with
            # multiple references every one is probed (penalized SAD)
            mvp = mvs.mvp_16x16(mx, my)
            sad, mv, pred = H._search_block(srefs[0], smb, mx * 16, my * 16,
                                            mvp, search)
            ridx = 0
            for ri in range(1, nrefs):
                sad_i, mv_i, pred_i = H._search_block(
                    srefs[ri], smb, mx * 16, my * 16, mvp, search)
                if sad_i + 48 * ri < sad + 48 * ridx:
                    sad, mv, pred, ridx = sad_i, mv_i, pred_i, ri
            if sad > 28 * 256:  # scene cut: intra fallback
                _enc_mb_i4(enc, ctx, st, smb.astype(np.uint8), plane, mx, my,
                           qp, nnz, modes, max_coeffs, plane_w,
                           _OFS["mbt_i"], ch, in_p=True)
                mvs.set_mb(mx, my, (0, 0), -1)
                st.skip[my, mx] = 0
                enc.terminate(1 if last else 0)
                continue
            # --- partition decision (same gates as the CAVLC encoder)
            chosen = None
            chosen8 = None
            if sad > 6 * 256:
                tot, ptype, parts = H._eval_partitions(mvs, srefs[ridx],
                                                       smb, mx, my, search)
                tot8, parts8 = H._eval_p8x8(mvs, srefs[ridx], smb, mx, my,
                                            search)
                if tot8 < 0.85 * min(sad, tot):
                    chosen8 = parts8
                elif tot < sad * 0.92:
                    chosen = (ptype, parts)
            def _cpart(ox, oy, pw, ph, pmv):
                for ci in range(2):
                    cpred[ci, oy // 2:(oy + ph) // 2,
                          ox // 2:(ox + pw) // 2] = H._interp_chroma(
                        crefs[ridx][ci], mx * 8 + ox // 2, my * 8 + oy // 2,
                        pmv[0], pmv[1], pw // 2, ph // 2,
                        wp=_wpck(ridx, ci))

            cpred = np.zeros((2, 8, 8), np.int32)
            if chosen8:
                pred = np.zeros((16, 16), np.int32)
                mvds = []
                for (ox8, oy8), (st8, sparts) in zip(H._P8_GEOM, chosen8):
                    for (ox, oy, w_, h_), (mvp_i, mv_i, pred_i) in zip(
                            H._P_SUB_GEOM[st8], sparts):
                        gx, gy = ox8 + ox, oy8 + oy
                        pred[gy:gy + h_, gx:gx + w_] = pred_i
                        mvds.append((mv_i[0] - mvp_i[0],
                                     mv_i[1] - mvp_i[1]))
                        _cpart(gx, gy, w_, h_, mv_i)
            elif chosen:
                ptype, parts = chosen
                pred = np.zeros((16, 16), np.int32)
                mvds = []
                for (ox, oy, w, h), (mvp_i, mv_i, pred_i) in zip(
                        H._PART_GEOM[ptype], parts):
                    pred[oy:oy + h, ox:ox + w] = pred_i
                    mvds.append((mv_i[0] - mvp_i[0], mv_i[1] - mvp_i[1]))
                    _cpart(ox, oy, w, h, mv_i)
            else:
                mvds = [(mv[0] - mvp[0], mv[1] - mvp[1])]
                _cpart(0, 0, 16, 16, mv)
            blocks = []
            cbp4 = 0
            out4 = pred.copy()
            for blk in range(16):
                ox, oy = H._BLK_XY[blk]
                lv = H._thin(H._quant4(H._fwd4(smb[oy:oy + 4, ox:ox + 4]
                                               - pred[oy:oy + 4, ox:ox + 4]),
                                       qp, intra=False), max_coeffs)
                tc = int(np.count_nonzero(lv))
                if tc:
                    cbp4 |= 1 << (blk >> 2)
                blocks.append((lv, tc))
                out4[oy:oy + 4, ox:ox + 4] += H._inv4(H._dequant4(lv, qp)).astype(np.int32)
            use8 = False
            if t8x8 and not chosen and not chosen8:
                # per-MB transform selection (r7): same coefficient-count
                # gate as the CAVLC twin
                blocks8 = []
                cbp8 = 0
                out8 = pred.copy()
                for b8 in range(4):
                    oy8, ox8 = (b8 >> 1) * 8, (b8 & 1) * 8
                    q8 = H._quant8(H._fwd8(smb[oy8:oy8 + 8, ox8:ox8 + 8]
                                           - pred[oy8:oy8 + 8,
                                                  ox8:ox8 + 8]), qp)
                    if np.any(q8):
                        cbp8 |= 1 << b8
                        out8[oy8:oy8 + 8, ox8:ox8 + 8] += \
                            H._inv8(H._dequant8(q8, qp)).astype(np.int64)
                    blocks8.append(q8)
                n8 = sum(int(np.count_nonzero(q)) for q in blocks8)
                use8 = n8 <= sum(tc for _lv, tc in blocks)
            if use8:
                cbp, out = cbp8, out8
                H._mark_t8(mx, my)
            else:
                cbp, out = cbp4, out4
            # mb_type (Table 9-37): "000" 16x16, "011" 16x8, "010" 8x16,
            # "001" P_8x8 (+ sub_mb_type '1' x4 = P_L0_8x8)
            enc.decision(ctx, _OFS["mbt_p"], 0)      # b0: inter
            if chosen8:
                enc.decision(ctx, _OFS["mbt_p"] + 1, 0)
                enc.decision(ctx, _OFS["mbt_p"] + 2, 1)
                for st8, _sp in chosen8:
                    _enc_p_sub_type(enc, ctx, st8)
            elif chosen:
                enc.decision(ctx, _OFS["mbt_p"] + 1, 1)
                enc.decision(ctx, _OFS["mbt_p"] + 2, 1 if ptype == "16x8" else 0)
            else:
                enc.decision(ctx, _OFS["mbt_p"] + 1, 0)
                enc.decision(ctx, _OFS["mbt_p"] + 2, 0)
            if nrefs > 1:  # ref_idx_l0 per partition, before mvds (r7)
                if chosen8:
                    anchors = [(mx * 4 + gx8 // 4, my * 4 + gy8 // 4)
                               for gx8, gy8 in H._P8_GEOM]
                elif chosen:
                    anchors = [(mx * 4 + ox // 4, my * 4 + oy // 4)
                               for ox, oy, _w, _h in H._PART_GEOM[ptype]]
                else:
                    anchors = [(mx * 4, my * 4)]
                for abx, aby in anchors:
                    _enc_ref_idx(enc, ctx, mvs, abx, aby, ridx)
            # mvd contexts use the MB-level neighbor |mvd| sums for every
            # partition (in-repo granularity, shared enc/dec)
            for dx_, dy_ in mvds:
                _enc_mvd(enc, ctx, _OFS["mvd_x"], st.mvd_inc_sum(mx, my, 0), dx_)
                _enc_mvd(enc, ctx, _OFS["mvd_y"], st.mvd_inc_sum(mx, my, 1), dy_)
            st.mvd[my, mx] = (sum(abs(d[0]) for d in mvds),
                              sum(abs(d[1]) for d in mvds))
            cbpc, comps = H._encode_chroma_mb(csrc_mb, cpred, qp,
                                              intra=False)
            for blk8 in range(4):
                enc.decision(ctx, _OFS["cbp_luma"]
                             + st.cbp_inc(mx, my, blk8, cbp), (cbp >> blk8) & 1)
            _enc_cbp_chroma(enc, ctx, cbpc)
            if t8x8 and (cbp & 15) and (
                    not chosen8 or all(st8 == 0 for st8, _ in chosen8)):
                # transform_size_8x8_flag (7.3.5): neighbor-conditioned
                # CABAC bin after cbp, before mb_qp_delta
                enc.decision(ctx, _OFS["t8flag"] + st.t8_inc(mx, my),
                             1 if use8 else 0)
                st.t8[my, mx] = 1 if use8 else 0
            if cbp | cbpc:
                _enc_qp_delta(enc, ctx, st.prev_qp_nz, 0)
                st.prev_qp_nz = False
            if use8:
                for b8 in range(4):
                    cells = [(my * 4 + (b8 >> 1) * 2 + (k >> 1),
                              mx * 4 + (b8 & 1) * 2 + (k & 1))
                             for k in range(4)]
                    if cbp & (1 << b8):
                        flat = blocks8[b8].reshape(-1)[H._ZZ8]
                        _enc_residual(enc, ctx, 5,
                                      [int(v) for v in flat],
                                      st.cbf_inc(cells[0][1], cells[0][0]))
                        nzb = 1 if np.any(blocks8[b8]) else 0
                        tcb = int(np.count_nonzero(blocks8[b8]))
                    else:
                        nzb = tcb = 0
                    for by, bx in cells:
                        st.cbf[by, bx] = nzb
                        nnz[by, bx] = min(tcb, 16)
            else:
                for blk in range(16):
                    ox, oy = H._BLK_XY[blk]
                    bx, by = mx * 4 + ox // 4, my * 4 + oy // 4
                    lv, tc = blocks[blk]
                    if cbp & (1 << (blk >> 2)):
                        _enc_residual(enc, ctx, 2, H._scan16(lv), st.cbf_inc(bx, by))
                    st.cbf[by, bx] = 1 if (cbp & (1 << (blk >> 2))) and tc else 0
                    nnz[by, bx] = tc
            _enc_chroma_residual(enc, ctx, cbpc, comps)
            for ci in range(2):
                crec[ci, my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = \
                    comps[ci]["recon"]
            np.clip(out, 0, 255, out)
            plane[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16] = out.astype(np.uint8)
            if chosen8:
                for (ox8, oy8), (st8, sparts) in zip(H._P8_GEOM, chosen8):
                    for (ox, oy, w_, h_), (_mvp_i, mv_i, _p) in zip(
                            H._P_SUB_GEOM[st8], sparts):
                        mvs.set_rect(mx * 4 + (ox8 + ox) // 4,
                                     my * 4 + (oy8 + oy) // 4,
                                     w_ // 4, h_ // 4, mv_i, ridx)
            elif chosen:
                for (ox, oy, w, h), (_mvp_i, mv_i, _p) in zip(
                        H._PART_GEOM[ptype], parts):
                    mvs.set_rect(mx * 4 + ox // 4, my * 4 + oy // 4,
                                 w // 4, h // 4, mv_i, ridx)
            else:
                mvs.set_mb(mx, my, mv, ridx)
            modes[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = -1
            st.skip[my, mx] = 0
            st.not_i4[my, mx] = 1
            st.cbp[my, mx] = cbp
            enc.terminate(1 if last else 0)
    bw.raw(enc.to_bytes())
    rbsps.append(bytes(bw.buf))
    H._set_slice_top(0)
    H._set_t8(False)
    H._set_t8map(None)
    rb = rbsps[0] if slice_rows is None else rbsps
    out_plane = plane
    if deblock and qp >= 16:
        out_plane = H._deblock_luma_inter(plane, qp_map, nnz, mvs, t8=t8m)
        crec = H._deblock_chroma(crec, qp_map, nnz=nnz, mvs=mvs, t8=t8m)
    if motion_out is not None:
        motion_out.append((mvs.mv.copy(), mvs.ref.copy()))
    if chroma is None:
        return rb, out_plane
    return rb, (out_plane, crec)


def _enc_b_mb_type(enc, ctx, mbt):
    """In-repo Table 9-37-shaped B mb_type tree: '0' B_Direct_16x16,
    '100' B_L0, '101' B_L1, '110000' B_Bi, '11' + (0,0,0,1) + 5-bit FL
    suffix for the partitioned types 4..21 (r7), '111100' B_8x8 (r7),
    '111101' + intra suffix."""
    base = _OFS["mbt_b"]
    if mbt == 0:    # B_Direct_16x16
        enc.decision(ctx, base, 0)
        return
    enc.decision(ctx, base, 1)
    if mbt == 1:    # B_L0_16x16
        enc.decision(ctx, base + 1, 0)
        enc.decision(ctx, base + 2, 0)
    elif mbt == 2:  # B_L1_16x16
        enc.decision(ctx, base + 1, 0)
        enc.decision(ctx, base + 2, 1)
    elif mbt == 3:  # B_Bi_16x16: '110000'
        enc.decision(ctx, base + 1, 1)
        for i, b in enumerate((0, 0, 0, 0)):
            enc.decision(ctx, base + 2 + min(i, 3), b)
    elif isinstance(mbt, int) and 4 <= mbt <= 21:  # partitioned (r7)
        enc.decision(ctx, base + 1, 1)
        for i, b in enumerate((0, 0, 0, 1)):
            enc.decision(ctx, base + 2 + min(i, 3), b)
        idx = mbt - 4
        for i in range(4, -1, -1):  # 5-bit FL suffix, MSB first
            enc.decision(ctx, _OFS["mbt_b_suf"], (idx >> i) & 1)
    elif mbt == 22:  # B_8x8 '111100' (r7)
        enc.decision(ctx, base + 1, 1)
        for i, b in enumerate((1, 1, 0, 0)):
            enc.decision(ctx, base + 2 + min(i, 3), b)
    else:           # intra escape '111101'
        enc.decision(ctx, base + 1, 1)
        for i, b in enumerate((1, 1, 0, 1)):
            enc.decision(ctx, base + 2 + min(i, 3), b)


def _dec_b_mb_type(dec, ctx):
    """Returns 0..3 for the 16x16 inter types (0 = spatial direct),
    4..21 for the partitioned 16x8/8x16 types (r7), 22 for B_8x8 (r7),
    'intra' for the escape; raises for unknown suffixes."""
    base = _OFS["mbt_b"]
    if not dec.decision(ctx, base):
        return 0  # B_Direct_16x16
    if not dec.decision(ctx, base + 1):
        return 2 if dec.decision(ctx, base + 2) else 1
    bits = tuple(dec.decision(ctx, base + 2 + min(i, 3)) for i in range(4))
    if bits == (0, 0, 0, 0):
        return 3
    if bits == (0, 0, 0, 1):  # partitioned-B marker (r7)
        idx = 0
        for _ in range(5):
            idx = (idx << 1) | dec.decision(ctx, _OFS["mbt_b_suf"])
        if idx > 17:
            raise ValueError("bad partitioned-B suffix")
        return 4 + idx
    if bits == (1, 1, 0, 0):  # B_8x8 (r7)
        return 22
    if bits == (1, 1, 0, 1):
        return "intra"
    raise ValueError("unknown B mb_type bins")


def _enc_p_sub_type(enc, ctx, st):
    """Table 9-38 P sub_mb_type: '1' 8x8, '00' 8x4, '011' 4x8,
    '010' 4x4."""
    base = _OFS["sub_mbt_p"]
    if st == 0:
        enc.decision(ctx, base, 1)
        return
    enc.decision(ctx, base, 0)
    if st == 1:
        enc.decision(ctx, base + 1, 0)
        return
    enc.decision(ctx, base + 1, 1)
    enc.decision(ctx, base + 2, 1 if st == 2 else 0)


def _dec_p_sub_type(dec, ctx):
    base = _OFS["sub_mbt_p"]
    if dec.decision(ctx, base):
        return 0
    if not dec.decision(ctx, base + 1):
        return 1
    return 2 if dec.decision(ctx, base + 2) else 3


def _enc_b_sub_type(enc, ctx, st):
    """In-repo Table 9-38-shaped B sub_mb_type: '1' B_Direct_8x8
    (st 0), '0' + 4-bit FL (st - 1, MSB first) for the twelve
    {8x8, 8x4, 4x8, 4x4} x {L0, L1, Bi} types (Table 7-18)."""
    base = _OFS["sub_mbt_b"]
    if st == 0:
        enc.decision(ctx, base, 1)
        return
    enc.decision(ctx, base, 0)
    idx = st - 1
    for i in range(3, -1, -1):
        enc.decision(ctx, base + 1, (idx >> i) & 1)


def _dec_b_sub_type(dec, ctx):
    base = _OFS["sub_mbt_b"]
    if dec.decision(ctx, base):
        return 0
    idx = 0
    for _ in range(4):
        idx = (idx << 1) | dec.decision(ctx, base + 1)
    if idx > 11:
        raise ValueError("bad B sub_mb_type")
    return idx + 1


def encode_b_cabac(gray: np.ndarray, ref0_full: np.ndarray,
                   ref1_full: np.ndarray, qp: int = 10,
                   max_coeffs: int = 16, frame_num: int = 1,
                   search: int = 8, poc_lsb: int = 0,
                   chroma: np.ndarray | None = None,
                   cref0: np.ndarray | None = None,
                   cref1: np.ndarray | None = None,
                   col_motion=None, pocs=None, implicit_wb=False,
                   slice_rows=None, t8x8: bool = False):
    """One gray frame -> (CABAC B-slice RBSP, FULL recon plane). Same
    decisions as h264.encode_b_cavlc (B_L0/L1/Bi 16x16, I_4x4 fallback,
    non-reference, in-loop filter off) with CABAC serialization.
    col_motion + pocs switch direct/skip to TEMPORAL direct
    (8.4.1.2.3); implicit_wb=True blends bi-predictions with the
    POC-derived implicit weights (8.4.2.3.1) — same contracts as
    encode_b_cavlc, including the t8x8 B-shape eligibility (late r7:
    non-direct shapes with no sub-8x8 partitioning; cat-5 residuals,
    neighbor-conditioned flag bin after cbp)."""
    if implicit_wb:
        if pocs is None:
            raise ValueError("implicit_wb needs pocs=(cur, poc0, poc1)")
        H._set_bipred(H._implicit_bipred_weights(*pocs))
    else:
        H._set_bipred(None)
    a = np.asarray(gray, np.uint8)
    h, w = a.shape
    mbw = -(-w // 16)
    mbh = -(-h // 16)
    assert ref0_full.shape == ref1_full.shape == (mbh * 16, mbw * 16)
    src = np.pad(a, ((0, mbh * 16 - h), (0, mbw * 16 - w)), mode="edge")
    plane = np.zeros((mbh * 16, mbw * 16), np.uint8)
    plane_w = mbw * 16
    nnz = np.zeros((mbh * 4, mbw * 4), np.int32)
    modes = np.full((mbh * 4, mbw * 4), -1, np.int32)
    mvs0 = H._MvState(mbw, mbh)
    mvs1 = H._MvState(mbw, mbh)
    csrc = H._pad_chroma(chroma, mbw, mbh, h, w)
    if cref0 is None:
        cref0 = np.full((2, mbh * 8, mbw * 8), 128, np.uint8)
    if cref1 is None:
        cref1 = np.full((2, mbh * 8, mbw * 8), 128, np.uint8)
    crec = np.full((2, mbh * 8, mbw * 8), 128, np.uint8)
    ch = (csrc, crec)

    def cmc1(cr, mv):
        return np.stack([H._interp_chroma(cr[ci], mx * 8, my * 8, *mv)
                         for ci in range(2)])

    tf = None
    if col_motion is not None:
        tf = H._temporal_fields(col_motion[0], col_motion[1], *pocs)
    H._set_t8(t8x8)  # High-profile PPS (late r7): B MBs carry the flag
    starts = dict(H._slice_ranges(mbh, slice_rows))
    rbsps = []
    bw = enc = ctx = st = None
    r1 = mbh
    for my in range(mbh):
        if my in starts:  # new slice at this MB row (multi-slice, r7)
            if bw is not None:
                bw.raw(enc.to_bytes())
                rbsps.append(bytes(bw.buf))
            H._set_slice_top(my)
            r1 = starts[my]
            st = _MbState(mbw, mbh)  # per-slice CABAC neighbour state
            bw = H._BitWriter()
            _slice_header(bw, 6, qp, frame_num, False, idr=False,
                          poc_lsb=poc_lsb, direct_spatial=tf is None,
                          first_mb=my * mbw)
            enc = _Enc()
            ctx = _Ctx()
        for mx in range(mbw):
            smb = src[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16].astype(np.int32)
            last = my == r1 - 1 and mx == mbw - 1
            # --- direct first: B_SKIP when its residual is zero
            dmv0, dmv1 = H._b_direct_mvs(mvs0, mvs1, mx, my, tf)
            dpred = H._b_direct_pred(ref0_full, ref1_full, mx, my, dmv0, dmv1)
            dcpred = H._b_chroma_direct_enc(cref0, cref1, mx, my, dmv0, dmv1)
            csrc_mb = csrc[:, my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
            if H._all_zero_quant(smb - dpred, qp) and \
                    H._chroma_zero(csrc_mb, dcpred, qp):
                enc.decision(ctx, _OFS["mb_skip_b"] + st.skip_inc(mx, my), 1)
                plane[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16] = \
                    np.clip(dpred, 0, 255).astype(np.uint8)
                for ci in range(2):
                    crec[ci, my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = \
                        np.clip(dcpred[ci], 0, 255).astype(np.uint8)
                nnz[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = 0
                H._b_commit_direct(mvs0, mvs1, mx, my, dmv0, dmv1)
                modes[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = -1
                st.skip[my, mx] = 1
                st.mvd[my, mx] = 0
                st.cbf[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = 0
                st.cbp[my, mx] = 0
                st.not_i4[my, mx] = 1
                enc.terminate(1 if last else 0)
                continue
            enc.decision(ctx, _OFS["mb_skip_b"] + st.skip_inc(mx, my), 0)
            st.skip[my, mx] = 0
            sad_d = int(np.abs(smb - dpred).sum())
            mvp0 = mvs0.mvp_16x16(mx, my)
            sad0, mv0, pred0 = H._search_block(ref0_full, smb, mx * 16,
                                               my * 16, mvp0, search)
            mvp1 = mvs1.mvp_16x16(mx, my)
            sad1, mv1, pred1 = H._search_block(ref1_full, smb, mx * 16,
                                               my * 16, mvp1, search)
            bi = H._biblend(pred0, pred1)
            sad_bi = int(np.abs(smb - bi).sum())
            cand = min(((sad_d, 0), (sad0, 1), (sad1, 2), (sad_bi, 3)))
            if cand[0] > 28 * 256:  # intra fallback
                _enc_b_mb_type(enc, ctx, "intra")
                _enc_mb_i4(enc, ctx, st, smb.astype(np.uint8), plane, mx, my,
                           qp, nnz, modes, max_coeffs, plane_w,
                           _OFS["mbt_p_suf"], ch, in_p=False)
                mvs0.set_mb(mx, my, (0, 0), -1)
                mvs1.set_mb(mx, my, (0, 0), -1)
                enc.terminate(1 if last else 0)
                continue
            mb_type = cand[1]
            bpart = None
            b8 = None
            if cand[0] > 6 * 256:  # partitions must clearly win (bits)
                tot_p, pinfo = H._eval_b_partitions(
                    mvs0, mvs1, ref0_full, ref1_full, smb, mx, my, search)
                if tot_p < 0.92 * cand[0]:
                    bpart = pinfo
                # B_8x8 carries the most side bits (4 sub types + up to
                # 16 mvd pairs per list): it must clearly beat both
                tot_8, subs_8 = H._eval_b8x8(
                    mvs0, mvs1, ref0_full, ref1_full, smb, mx, my,
                    search, dmv0, dmv1, dpred)
                if tot_8 < 0.80 * min(cand[0], tot_p):
                    b8, bpart = subs_8, None
            if b8:
                # prediction needs only the chosen MVs (parts are filled
                # by _eval_b8x8); state commits happen at serialization
                pred, cpred = H._b8x8_pred(b8, ref0_full, ref1_full,
                                           cref0, cref1, mx, my,
                                           dmv0, dmv1)
            elif bpart:
                geom = H._PART_GEOM[bpart["ptype"]]
                pred = np.zeros((16, 16), np.int32)
                cpred = np.zeros((2, 8, 8), np.int32)
                for idx, (ox, oy, w_, h_) in enumerate(geom):
                    pred[oy:oy + h_, ox:ox + w_] = bpart["preds"][idx]
                    cps = []
                    for mv_i, cref in ((bpart["mv0"][idx], cref0),
                                       (bpart["mv1"][idx], cref1)):
                        if mv_i is None:
                            continue
                        cps.append(np.stack([
                            H._interp_chroma(cref[ci], mx * 8 + ox // 2,
                                             my * 8 + oy // 2, mv_i[0],
                                             mv_i[1], w_ // 2, h_ // 2)
                            for ci in range(2)]))
                    cp = cps[0] if len(cps) == 1 else \
                        H._biblend(cps[0], cps[1])
                    cpred[:, oy // 2:(oy + h_) // 2,
                          ox // 2:(ox + w_) // 2] = cp
            else:
                pred = (dpred, pred0, pred1, bi)[mb_type]
                if mb_type == 0:
                    cpred = dcpred
                elif mb_type == 1:
                    cpred = cmc1(cref0, mv0)
                elif mb_type == 2:
                    cpred = cmc1(cref1, mv1)
                else:
                    cpred = H._biblend(cmc1(cref0, mv0), cmc1(cref1, mv1))
            blocks = []
            cbp = 0
            out = pred.copy()
            for blk in range(16):
                ox, oy = H._BLK_XY[blk]
                lv = H._thin(H._quant4(H._fwd4(smb[oy:oy + 4, ox:ox + 4]
                                               - pred[oy:oy + 4, ox:ox + 4]),
                                       qp, intra=False), max_coeffs)
                tc = int(np.count_nonzero(lv))
                if tc:
                    cbp |= 1 << (blk >> 2)
                blocks.append((lv, tc))
                out[oy:oy + 4, ox:ox + 4] += H._inv4(H._dequant4(lv, qp)).astype(np.int32)
            # 8x8-transform eligibility (7.3.5, direct_8x8_inference 0):
            # every non-direct shape with no sub-8x8 partitioning
            t8_shape = t8x8 and (
                all(st8 in (1, 2, 3) for st8, _ in b8) if b8
                else True if bpart else mb_type != 0)
            use8 = False
            if t8_shape:
                # same coefficient-count race as the P/I twins
                blocks8 = []
                cbp8 = 0
                out8 = pred.copy()
                for k8 in range(4):
                    oy8, ox8 = (k8 >> 1) * 8, (k8 & 1) * 8
                    q8 = H._quant8(H._fwd8(smb[oy8:oy8 + 8, ox8:ox8 + 8]
                                           - pred[oy8:oy8 + 8,
                                                  ox8:ox8 + 8]), qp)
                    if np.any(q8):
                        cbp8 |= 1 << k8
                        out8[oy8:oy8 + 8, ox8:ox8 + 8] += \
                            H._inv8(H._dequant8(q8, qp)).astype(np.int64)
                    blocks8.append(q8)
                n8 = sum(int(np.count_nonzero(q)) for q in blocks8)
                use8 = n8 <= sum(tc for _lv, tc in blocks)
            if use8:
                cbp, out = cbp8, out8
                H._mark_t8(mx, my)
            asum = [0, 0]
            if b8:
                _enc_b_mb_type(enc, ctx, 22)
                for st8, _parts in b8:
                    _enc_b_sub_type(enc, ctx, st8)

                def mvd_io(_li, mv_i, mvp_i):
                    d = (mv_i[0] - mvp_i[0], mv_i[1] - mvp_i[1])
                    _enc_mvd(enc, ctx, _OFS["mvd_x"],
                             st.mvd_inc_sum(mx, my, 0), d[0])
                    _enc_mvd(enc, ctx, _OFS["mvd_y"],
                             st.mvd_inc_sum(mx, my, 1), d[1])
                    asum[0] += abs(d[0])
                    asum[1] += abs(d[1])
                    return mv_i

                H._b8x8_list_pass(b8, mvs0, mvs1, mx, my, dmv0, dmv1,
                                  mvd_io)
            elif bpart:
                _enc_b_mb_type(enc, ctx, bpart["mb_type"])
                geom = H._PART_GEOM[bpart["ptype"]]
                for li, (mvsx, mvlist) in enumerate(
                        ((mvs0, bpart["mv0"]), (mvs1, bpart["mv1"]))):
                    for idx, (ox, oy, w_, h_) in enumerate(geom):
                        mv_i = mvlist[idx]
                        if mv_i is None:
                            continue
                        mvp_i = mvsx.mvp_part(mx, my, bpart["ptype"], idx)
                        d = (mv_i[0] - mvp_i[0], mv_i[1] - mvp_i[1])
                        _enc_mvd(enc, ctx, _OFS["mvd_x"],
                                 st.mvd_inc_sum(mx, my, 0), d[0])
                        _enc_mvd(enc, ctx, _OFS["mvd_y"],
                                 st.mvd_inc_sum(mx, my, 1), d[1])
                        asum = [asum[0] + abs(d[0]), asum[1] + abs(d[1])]
                        mvsx.set_rect(mx * 4 + ox // 4, my * 4 + oy // 4,
                                      w_ // 4, h_ // 4, mv_i, 0)
                    for idx, (ox, oy, w_, h_) in enumerate(geom):
                        if mvlist[idx] is None:
                            mvsx.set_rect(mx * 4 + ox // 4,
                                          my * 4 + oy // 4,
                                          w_ // 4, h_ // 4, (0, 0), -1)
            else:
                _enc_b_mb_type(enc, ctx, mb_type)
                if mb_type in (1, 3):
                    d = (mv0[0] - mvp0[0], mv0[1] - mvp0[1])
                    _enc_mvd(enc, ctx, _OFS["mvd_x"], st.mvd_inc_sum(mx, my, 0), d[0])
                    _enc_mvd(enc, ctx, _OFS["mvd_y"], st.mvd_inc_sum(mx, my, 1), d[1])
                    asum = [asum[0] + abs(d[0]), asum[1] + abs(d[1])]
                if mb_type in (2, 3):
                    d = (mv1[0] - mvp1[0], mv1[1] - mvp1[1])
                    _enc_mvd(enc, ctx, _OFS["mvd_x"], st.mvd_inc_sum(mx, my, 0), d[0])
                    _enc_mvd(enc, ctx, _OFS["mvd_y"], st.mvd_inc_sum(mx, my, 1), d[1])
                    asum = [asum[0] + abs(d[0]), asum[1] + abs(d[1])]
            st.mvd[my, mx] = tuple(asum)
            cbpc, comps = H._encode_chroma_mb(csrc_mb, cpred, qp,
                                              intra=False)
            for blk8 in range(4):
                enc.decision(ctx, _OFS["cbp_luma"]
                             + st.cbp_inc(mx, my, blk8, cbp), (cbp >> blk8) & 1)
            _enc_cbp_chroma(enc, ctx, cbpc)
            if t8_shape and (cbp & 15):
                # transform_size_8x8_flag: neighbor-conditioned bin
                # after cbp, before mb_qp_delta (7.3.5)
                enc.decision(ctx, _OFS["t8flag"] + st.t8_inc(mx, my),
                             1 if use8 else 0)
                st.t8[my, mx] = 1 if use8 else 0
            if cbp | cbpc:
                _enc_qp_delta(enc, ctx, st.prev_qp_nz, 0)
                st.prev_qp_nz = False
            if use8:  # cat-5 8x8 residual blocks over the 8x8 zigzag
                for k8 in range(4):
                    cells = [(my * 4 + (k8 >> 1) * 2 + (k >> 1),
                              mx * 4 + (k8 & 1) * 2 + (k & 1))
                             for k in range(4)]
                    if cbp & (1 << k8):
                        flat = blocks8[k8].reshape(-1)[H._ZZ8]
                        _enc_residual(enc, ctx, 5,
                                      [int(v) for v in flat],
                                      st.cbf_inc(cells[0][1], cells[0][0]))
                        nzb = 1 if np.any(blocks8[k8]) else 0
                        tcb = min(int(np.count_nonzero(blocks8[k8])), 16)
                    else:
                        nzb = tcb = 0
                    for by, bx in cells:
                        st.cbf[by, bx] = nzb
                        nnz[by, bx] = tcb
            else:
                for blk in range(16):
                    ox, oy = H._BLK_XY[blk]
                    bx, by = mx * 4 + ox // 4, my * 4 + oy // 4
                    lv, tc = blocks[blk]
                    if cbp & (1 << (blk >> 2)):
                        _enc_residual(enc, ctx, 2, H._scan16(lv), st.cbf_inc(bx, by))
                    st.cbf[by, bx] = 1 if (cbp & (1 << (blk >> 2))) and tc else 0
                    nnz[by, bx] = tc
            _enc_chroma_residual(enc, ctx, cbpc, comps)
            for ci in range(2):
                crec[ci, my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = \
                    comps[ci]["recon"]
            np.clip(out, 0, 255, out)
            plane[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16] = out.astype(np.uint8)
            if b8 or bpart:
                pass  # committed per list during mvd serialization
            elif mb_type == 0:
                H._b_commit_direct(mvs0, mvs1, mx, my, dmv0, dmv1)
            else:
                mvs0.set_mb(mx, my, mv0 if mb_type in (1, 3) else (0, 0),
                            0 if mb_type in (1, 3) else -1)
                mvs1.set_mb(mx, my, mv1 if mb_type in (2, 3) else (0, 0),
                            0 if mb_type in (2, 3) else -1)
            modes[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = -1
            st.not_i4[my, mx] = 1
            st.cbp[my, mx] = cbp
            enc.terminate(1 if last else 0)
    bw.raw(enc.to_bytes())
    rbsps.append(bytes(bw.buf))
    H._set_slice_top(0)
    H._set_t8(False)
    rb = rbsps[0] if slice_rows is None else rbsps
    if chroma is None:
        return rb, plane
    return rb, (plane, crec)


# ------------------------------------------------------ decoder
def decode_slice(r, sps, pps, hdr, ref, is_p, ref2=None,
                 cref=None, cref2=None,
                 col_motion=None, pocs=None, motion_out=None,
                 rows=None, pic=None):
    """CABAC slice-data decode; `r` is positioned right after the parsed
    slice header (h264._parse_slice_header). Returns (FULL luma plane,
    FULL (2, H/2, W/2) chroma planes). B slices (hdr['is_b']) take both
    reference planes (ref = L0 past, ref2 = L1 future; cref/cref2 the
    matching chroma). col_motion/pocs feed temporal-direct B slices
    (hdr['direct_spatial'] False); motion_out, when a list, receives
    this picture's (mv, ref) 4x4 motion field."""
    is_b = hdr.get("is_b", False)
    H._set_t8(pps.get("t8x8", False))
    tf = None
    if is_b and not hdr.get("direct_spatial", True):
        if col_motion is None or pocs is None:
            raise ValueError(
                "temporal direct B slice needs the colocated anchor's "
                "motion field (decode via decode_samples)")
        tf = H._temporal_fields(col_motion[0], col_motion[1], *pocs)
    if is_b:  # implicit weighted bi-prediction (8.4.2.3.1, r7)
        if pps.get("weighted_bipred_idc", 0) == 2:
            if pocs is None:
                raise ValueError(
                    "implicit weighted bi-prediction needs reference "
                    "POCs (decode via decode_samples)")
            H._set_bipred(H._implicit_bipred_weights(*pocs))
        else:
            H._set_bipred(None)
    # cabac_alignment_one_bit(s)
    while r.pos & 7:
        if r.u(1) != 1:
            raise ValueError("bad cabac_alignment_one_bit")
    dec = _Dec(r)
    ctx = _Ctx()
    mbw, mbh = sps["mbw"], sps["mbh"]
    qp = hdr["qp"]
    r0, r1 = rows if rows is not None else (0, mbh)
    H._set_slice_top(r0)
    plane_w = mbw * 16
    if pic:  # shared picture state across this picture's slices (r7)
        plane, nnz = pic["plane"], pic["nnz"]
        modes, qp_map = pic["modes"], pic["qp_map"]
        mvs, mvs1 = pic["mvs"], pic["mvs1"]
        t8m = pic["t8m"]
    else:
        plane = np.zeros((mbh * 16, mbw * 16), np.uint8)
        nnz = np.zeros((mbh * 4, mbw * 4), np.int32)
        modes = np.full((mbh * 4, mbw * 4), -1, np.int32)
        qp_map = np.zeros((mbh, mbw), np.int32)
        mvs = H._MvState(mbw, mbh) if (is_p or is_b) else None
        mvs1 = H._MvState(mbw, mbh) if is_b else None
        t8m = np.zeros((mbh, mbw), np.int32) \
            if pps.get("t8x8") else None
    # L0 reference list (multi-reference P slices, r7); B stays 1+1
    refs = H._ref_list(ref) if ref is not None else None
    nrefs = hdr.get("nrefs", 1)
    if is_p and hdr.get("wp") is not None:  # explicit WP (r7)
        mvs.wp = H._resolve_wp(hdr["wp"], nrefs)
    if is_p and nrefs > len(refs):
        raise ValueError(
            f"slice needs {nrefs} reference frames, got {len(refs)}")
    if is_b and refs is not None:
        ref = refs[0]
    crefs = None
    if is_p or is_b:
        crefs = H._ref_list(cref) if cref is not None else []
        while len(crefs) < (nrefs if is_p else 1):
            crefs.append(np.full((2, mbh * 8, mbw * 8), 128, np.uint8))
    if is_b and cref2 is None:
        cref2 = np.full((2, mbh * 8, mbw * 8), 128, np.uint8)
    if pic:
        cc = pic["cc"]
    else:
        cc = H._ChromaState(mbw, mbh, ref=crefs, ref2=cref2)
        if pic is not None:
            pic.update(plane=plane, nnz=nnz, modes=modes, qp_map=qp_map,
                       mvs=mvs, mvs1=mvs1, cc=cc, t8m=t8m)
    H._set_t8map(t8m)  # per-MB flags feed the 8.7 edge derivation
    st = _MbState(mbw, mbh)  # per-slice CABAC neighbour state (gated)
    for my in range(r0, r1):
        for mx in range(mbw):
            if is_b:
                if dec.decision(ctx, _OFS["mb_skip_b"] + st.skip_inc(mx, my)):
                    dmv0, dmv1 = H._b_direct_mvs(mvs, mvs1, mx, my, tf)
                    dpred = H._b_direct_pred(ref, ref2, mx, my, dmv0, dmv1)
                    plane[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16] = \
                        np.clip(dpred, 0, 255).astype(np.uint8)
                    dcp = H._b_chroma_bi(cc, mx, my, dmv0, dmv1)
                    for ci in range(2):
                        cc.store(ci, mx, my, dcp[ci])
                    cc.nnz[:, my * 2:my * 2 + 2, mx * 2:mx * 2 + 2] = 0
                    nnz[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = 0
                    H._b_commit_direct(mvs, mvs1, mx, my, dmv0, dmv1)
                    modes[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = -1
                    st.skip[my, mx] = 1
                    st.mvd[my, mx] = 0
                    st.cbf[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = 0
                    st.cbp[my, mx] = 0
                    st.not_i4[my, mx] = 1
                    qp_map[my, mx] = qp
                    eos = dec.terminate()
                    last = my == r1 - 1 and mx == mbw - 1
                    if eos != (1 if last else 0):
                        raise ValueError("end_of_slice_flag desync")
                    continue
                st.skip[my, mx] = 0
                mbt = _dec_b_mb_type(dec, ctx)
                if mbt == "intra":
                    imbt = _dec_mb_type_i(dec, ctx, _OFS["mbt_p_suf"],
                                          st.mbt_inc(mx, my))
                    if imbt != 0:
                        raise ValueError(
                            "I_16x16-in-B CABAC: out of decode profile")
                    qp = _dec_mb_i4(dec, ctx, st, plane, mx, my, qp, nnz,
                                    modes, plane_w, cc)
                    mvs.set_mb(mx, my, (0, 0), -1)
                    mvs1.set_mb(mx, my, (0, 0), -1)
                elif mbt == 22:  # B_8x8 (r7)
                    qp = _dec_mb_b8x8(dec, ctx, st, plane, ref, ref2,
                                      mx, my, qp, nnz, modes, mvs,
                                      mvs1, cc, tf)
                elif isinstance(mbt, int) and mbt >= 4:
                    qp = _dec_mb_b_part(dec, ctx, st, plane, ref, ref2,
                                        mx, my, qp, nnz, modes, mvs,
                                        mvs1, mbt, cc)
                else:
                    qp = _dec_mb_b16(dec, ctx, st, plane, ref, ref2, mx, my,
                                     qp, nnz, modes, mvs, mvs1, mbt, cc,
                                     tf)
                qp_map[my, mx] = qp
                eos = dec.terminate()
                last = my == r1 - 1 and mx == mbw - 1
                if eos != (1 if last else 0):
                    raise ValueError("end_of_slice_flag desync")
                continue
            if is_p:
                if dec.decision(ctx, _OFS["mb_skip"] + st.skip_inc(mx, my)):
                    mv = mvs.skip_mv(mx, my)
                    pred = H._interp_luma(refs[0], mx * 16, my * 16, *mv,
                                          wp=H._wpl(mvs, 0))
                    plane[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16] = \
                        np.clip(pred, 0, 255).astype(np.uint8)
                    for ci in range(2):
                        cc.store(ci, mx, my,
                                 cc.mc(ci, mx, my, mv, wp=H._wpc(mvs, 0, ci)))
                    cc.nnz[:, my * 2:my * 2 + 2, mx * 2:mx * 2 + 2] = 0
                    nnz[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = 0
                    modes[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = -1
                    mvs.set_mb(mx, my, mv, 0)
                    st.skip[my, mx] = 1
                    st.mvd[my, mx] = 0
                    st.cbf[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = 0
                    st.cbp[my, mx] = 0
                    st.not_i4[my, mx] = 1
                    qp_map[my, mx] = qp
                    if dec.terminate():
                        if not (my == r1 - 1 and mx == mbw - 1):
                            raise ValueError("early end_of_slice_flag")
                    continue
                st.skip[my, mx] = 0
                if dec.decision(ctx, _OFS["mbt_p"]):
                    mbt = _dec_mb_type_i(dec, ctx, _OFS["mbt_p_suf"], 0)
                    if mbt != 0:
                        raise ValueError(
                            "I_16x16-in-P CABAC: out of decode profile")
                    qp = _dec_mb_i4(dec, ctx, st, plane, mx, my, qp, nnz,
                                    modes, plane_w, cc, in_p=True)
                    mvs.set_mb(mx, my, (0, 0), -1)
                else:
                    b1 = dec.decision(ctx, _OFS["mbt_p"] + 1)
                    b2 = dec.decision(ctx, _OFS["mbt_p"] + 2)
                    if b1:  # "011" = 16x8, "010" = 8x16 (Table 9-37)
                        qp = _dec_mb_p_part(dec, ctx, st, plane, refs,
                                            mx, my, qp, nnz, modes, mvs,
                                            "16x8" if b2 else "8x16", cc,
                                            nrefs)
                    elif b2:  # "001" = P_8x8 (r6)
                        qp = _dec_mb_p8x8(dec, ctx, st, plane, refs, mx, my,
                                          qp, nnz, modes, mvs, cc, nrefs)
                    else:
                        qp = _dec_mb_p16(dec, ctx, st, plane, refs, mx, my,
                                         qp, nnz, modes, mvs, cc, nrefs)
            else:
                mbt = _dec_mb_type_i(dec, ctx, _OFS["mbt_i"],
                                     st.mbt_inc(mx, my))
                if mbt == 25:  # I_PCM (r7): raw samples, engine re-init
                    r.align()  # pcm_alignment_zero_bit(s)
                    plane[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16] = \
                        np.frombuffer(r.raw(256), np.uint8).reshape(16, 16)
                    for ci in range(2):  # raw Cb then Cr samples
                        cc.store(ci, mx, my,
                                 np.frombuffer(r.raw(64), np.uint8)
                                   .reshape(8, 8).astype(np.int32))
                    dec.reinit()
                    nnz[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = 16
                    cc.nnz[:, my * 2:my * 2 + 2, mx * 2:mx * 2 + 2] = 16
                    modes[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = -1
                    st.not_i4[my, mx] = 1
                    st.cbp[my, mx] = 15
                    st.cbf[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = 1
                    st.cbf_dc[my, mx] = 1
                    qp_map[my, mx] = 0  # 8.7: I_PCM filters with QP 0
                    eos = dec.terminate()
                    if eos != (1 if my == r1 - 1 and mx == mbw - 1 else 0):
                        raise ValueError("end_of_slice_flag desync")
                    continue
                if mbt == 0:
                    qp = _dec_mb_i4(dec, ctx, st, plane, mx, my, qp, nnz,
                                    modes, plane_w, cc)
                else:
                    qp = _dec_mb_i16(dec, ctx, st, mbt, plane, mx, my, qp,
                                     nnz, modes, cc)
            qp_map[my, mx] = qp
            eos = dec.terminate()
            last = my == r1 - 1 and mx == mbw - 1
            if eos != (1 if last else 0):
                raise ValueError("end_of_slice_flag desync")
    H._set_slice_top(0)
    if r1 < mbh:
        return None  # more slices of this picture follow (r7)
    H._set_t8map(None)
    if hdr["do_filter"] and int(qp_map.max()) + max(hdr["off_a"], hdr["off_b"], 0) >= 16:
        if is_p or is_b:
            # B pictures route through the inter filter with the L0 motion
            # state — same approximation as the CAVLC decoder (h264.py
            # decode path); the in-repo encoder disables the filter for B,
            # so decode == recon regardless, but foreign filtered-B streams
            # get the inter bS rules, not the intra ones (ADVICE r6)
            plane = H._deblock_luma_inter(plane, qp_map, nnz, mvs,
                                          hdr["off_a"], hdr["off_b"],
                                          t8=t8m)
            cc.planes = H._deblock_chroma(cc.planes, qp_map, hdr["off_a"],
                                          hdr["off_b"], nnz=nnz, mvs=mvs,
                                          t8=t8m)
        else:
            plane = H._deblock_luma(plane, qp_map, hdr["off_a"],
                                    hdr["off_b"], t8=t8m)
            cc.planes = H._deblock_chroma(cc.planes, qp_map, hdr["off_a"],
                                          hdr["off_b"])
    if motion_out is not None:
        if mvs is not None:
            motion_out.append((mvs.mv.copy(), mvs.ref.copy()))
        else:  # I slice: all-intra colocated field (mvCol = 0)
            motion_out.append(
                (np.zeros((mbh * 4, mbw * 4, 2), np.int32),
                 np.full((mbh * 4, mbw * 4), -1, np.int32)))
    return plane, cc.planes


def _dec_cbp(dec, ctx, st, mx, my):
    cbp = 0
    for blk8 in range(4):
        if dec.decision(ctx, _OFS["cbp_luma"] + st.cbp_inc(mx, my, blk8, cbp)):
            cbp |= 1 << blk8
    return cbp, _dec_cbp_chroma(dec, ctx)


def _dec_mb_i4(dec, ctx, st, plane, mx, my, qp, nnz, modes, plane_w, cc,
               in_p=False):
    if H._T8:
        use8 = dec.decision(ctx, _OFS["t8flag"] + st.t8_inc(mx, my))
        st.t8[my, mx] = 1 if use8 else 0
        if use8:
            return _dec_mb_i8(dec, ctx, st, plane, mx, my, qp, nnz,
                              modes, plane_w, cc)
    prev = []
    for _blk in range(16):
        if dec.decision(ctx, _OFS["prev_i4"]):
            prev.append(None)
        else:
            rem = 0
            for i in range(3):
                rem |= dec.decision(ctx, _OFS["rem_i4"]) << i
            prev.append(rem)
    icp = _dec_tu(dec, ctx, _OFS["chroma_mode"], (0, 3, 3), 3)
    cbp, cbpc = _dec_cbp(dec, ctx, st, mx, my)
    if cbp | cbpc:
        d = _dec_qp_delta(dec, ctx, st.prev_qp_nz)
        st.prev_qp_nz = d != 0
        qp = (qp + d + 52) % 52
    for blk in range(16):
        ox, oy = H._BLK_XY[blk]
        px, py = mx * 16 + ox, my * 16 + oy
        bx, by = px // 4, py // 4
        pm = H._pred_mode_for(modes, bx, by)
        rem = prev[blk]
        mode = pm if rem is None else rem + (1 if rem >= pm else 0)
        if mode > 8:
            raise ValueError("bad intra 4x4 pred mode")
        modes[by, bx] = mode
        al, aa, aar, aal = H._mb_avail(blk, px, py, plane_w)
        pred = H._pred4(plane, px, py, mode, al, aa, aar, aal)
        if cbp & (1 << (blk >> 2)):
            scan = _dec_residual(dec, ctx, 2, 16, st.cbf_inc(bx, by))
            lv = H._unscan16(scan)
            tc = int(np.count_nonzero(lv))
            st.cbf[by, bx] = 1 if tc else 0
            rec = pred + H._inv4(H._dequant4(lv, qp)).astype(np.int32)
        else:
            tc = 0
            st.cbf[by, bx] = 0
            rec = pred.copy()
        nnz[by, bx] = tc
        np.clip(rec, 0, 255, rec)
        plane[py:py + 4, px:px + 4] = rec.astype(np.uint8)
    cres = _dec_chroma_residual(dec, ctx, cbpc, qp)
    for ci in range(2):
        cpred = H._pred_chroma8(cc.planes[ci], mx, my, icp, mx > 0, my > H._SLICE_TOP)
        cc.store(ci, mx, my, cpred + cres[ci])
    st.not_i4[my, mx] = 0
    st.cbp[my, mx] = cbp
    st.cbf_dc[my, mx] = 0
    st.mvd[my, mx] = 0
    return qp


def _dec_mb_i8(dec, ctx, st, plane, mx, my, qp, nnz, modes, plane_w, cc):
    """I_8x8 intra MB (8.3.2.2, r7): four prev/rem pred modes on the
    prev_i4/rem_i4 contexts, cbp, cat-5 residual per coded 8x8 block.
    The transform_size_8x8_flag was already consumed by the caller."""
    H._mark_t8(mx, my)
    mode8s = []
    for b8 in range(4):
        bx, by = mx * 4 + (b8 & 1) * 2, my * 4 + (b8 >> 1) * 2
        pm = H._pred_mode_for(modes, bx, by)
        if dec.decision(ctx, _OFS["prev_i4"]):
            mode = pm
        else:
            rem = 0
            for i in range(3):
                rem |= dec.decision(ctx, _OFS["rem_i4"]) << i
            mode = rem + (1 if rem >= pm else 0)
        if mode > 8:
            raise ValueError("bad intra 8x8 pred mode")
        modes[by:by + 2, bx:bx + 2] = mode
        mode8s.append(mode)
    icp = _dec_tu(dec, ctx, _OFS["chroma_mode"], (0, 3, 3), 3)
    cbp, cbpc = _dec_cbp(dec, ctx, st, mx, my)
    if cbp | cbpc:
        d = _dec_qp_delta(dec, ctx, st.prev_qp_nz)
        st.prev_qp_nz = d != 0
        qp = (qp + d + 52) % 52
    for b8 in range(4):
        ox8, oy8 = (b8 & 1) * 8, (b8 >> 1) * 8
        px, py = mx * 16 + ox8, my * 16 + oy8
        al, aa, aar, aal = H._mb_avail8(b8, px, py, plane_w)
        pred = H._pred8(plane, px, py, mode8s[b8], al, aa, aar, aal)
        cells = [(my * 4 + (b8 >> 1) * 2 + (k >> 1),
                  mx * 4 + (b8 & 1) * 2 + (k & 1)) for k in range(4)]
        if cbp & (1 << b8):
            scan = _dec_residual(dec, ctx, 5, 64,
                                 st.cbf_inc(cells[0][1], cells[0][0]))
            flat = np.zeros(64, np.int64)
            flat[H._ZZ8] = scan
            q8 = flat.reshape(8, 8)
            rec = pred + H._inv8(H._dequant8(q8, qp))
            nzb = 1 if np.any(q8) else 0
            tcb = min(int(np.count_nonzero(q8)), 16)
        else:
            rec = pred
            nzb = tcb = 0
        for by, bx in cells:
            st.cbf[by, bx] = nzb
            nnz[by, bx] = tcb
        np.clip(rec, 0, 255, rec)
        plane[py:py + 8, px:px + 8] = rec.astype(np.uint8)
    cres = _dec_chroma_residual(dec, ctx, cbpc, qp)
    for ci in range(2):
        cpred = H._pred_chroma8(cc.planes[ci], mx, my, icp, mx > 0,
                                my > H._SLICE_TOP)
        cc.store(ci, mx, my, cpred + cres[ci])
    st.not_i4[my, mx] = 0
    st.cbp[my, mx] = cbp
    st.cbf_dc[my, mx] = 0
    st.mvd[my, mx] = 0
    return qp


def _dec_mb_i16(dec, ctx, st, mbt, plane, mx, my, qp, nnz, modes, cc):
    t = mbt - 1
    pm16 = t % 4
    cbpc = (t // 4) % 3
    cbpl = 15 if t >= 12 else 0
    icp = _dec_tu(dec, ctx, _OFS["chroma_mode"], (0, 3, 3), 3)
    d = _dec_qp_delta(dec, ctx, st.prev_qp_nz)
    st.prev_qp_nz = d != 0
    qp = (qp + d + 52) % 52
    scan = _dec_residual(dec, ctx, 0, 16, st.cbf_dc_inc(mx, my))
    st.cbf_dc[my, mx] = 1 if any(scan) else 0
    dc_lv = H._unscan16(scan)
    dcv = H._i16_dc_dequant(dc_lv, qp)
    pred = H._pred16(plane, mx, my, pm16, mx > 0, my > H._SLICE_TOP)
    out = pred.copy()
    for blk in range(16):
        ox, oy = H._BLK_XY[blk]
        bx, by = mx * 4 + ox // 4, my * 4 + oy // 4
        if cbpl:
            ac = _dec_residual(dec, ctx, 1, 15, st.cbf_inc(bx, by))
            lv = H._unscan15(ac)
            tc = int(np.count_nonzero(lv))
            st.cbf[by, bx] = 1 if tc else 0
            d4 = H._dequant4(lv, qp)
        else:
            tc = 0
            st.cbf[by, bx] = 0
            d4 = np.zeros((4, 4), np.int64)
        d4[0, 0] = dcv[oy // 4, ox // 4]
        nnz[by, bx] = tc
        modes[by, bx] = -1
        out[oy:oy + 4, ox:ox + 4] += H._inv4(d4).astype(np.int32)
    np.clip(out, 0, 255, out)
    plane[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16] = out.astype(np.uint8)
    cres = _dec_chroma_residual(dec, ctx, cbpc, qp)
    for ci in range(2):
        cpred = H._pred_chroma8(cc.planes[ci], mx, my, icp, mx > 0, my > H._SLICE_TOP)
        cc.store(ci, mx, my, cpred + cres[ci])
    st.not_i4[my, mx] = 1
    st.cbp[my, mx] = 0xF if cbpl else 0
    st.mvd[my, mx] = 0
    return qp


def _dec_p_tail(dec, ctx, st, pred, plane, mx, my, qp, nnz, modes, cc,
                cpred, t8_shape=False):
    """Shared inter-MB tail: cbp + qp_delta + residuals + recon; `cpred`
    is the (2, 8, 8) chroma MC prediction. t8_shape: the MB shape may
    carry transform_size_8x8_flag when the PPS enables the 8x8
    transform (High profile, r7)."""
    cbp, cbpc = _dec_cbp(dec, ctx, st, mx, my)
    use8 = False
    if H._T8 and (cbp & 15) and t8_shape:
        use8 = bool(dec.decision(ctx, _OFS["t8flag"] + st.t8_inc(mx, my)))
        st.t8[my, mx] = 1 if use8 else 0
        if use8:
            H._mark_t8(mx, my)
    if cbp | cbpc:
        d = _dec_qp_delta(dec, ctx, st.prev_qp_nz)
        st.prev_qp_nz = d != 0
        qp = (qp + d + 52) % 52
    out = pred.copy()
    if use8:  # cat-5 8x8 residual blocks over the 8x8 zigzag (r7)
        for b8 in range(4):
            cells = [(my * 4 + (b8 >> 1) * 2 + (k >> 1),
                      mx * 4 + (b8 & 1) * 2 + (k & 1)) for k in range(4)]
            oy8, ox8 = (b8 >> 1) * 8, (b8 & 1) * 8
            if cbp & (1 << b8):
                scan = _dec_residual(dec, ctx, 5, 64,
                                     st.cbf_inc(cells[0][1], cells[0][0]))
                flat = np.zeros(64, np.int64)
                flat[H._ZZ8] = scan
                q8 = flat.reshape(8, 8)
                out[oy8:oy8 + 8, ox8:ox8 + 8] += \
                    H._inv8(H._dequant8(q8, qp)).astype(np.int64)
                nzb = 1 if np.any(q8) else 0
                tcb = min(int(np.count_nonzero(q8)), 16)
            else:
                nzb = tcb = 0
            for by, bx in cells:
                st.cbf[by, bx] = nzb
                nnz[by, bx] = tcb
                modes[by, bx] = -1
    else:
        for blk in range(16):
            ox, oy = H._BLK_XY[blk]
            bx, by = mx * 4 + ox // 4, my * 4 + oy // 4
            if cbp & (1 << (blk >> 2)):
                scan = _dec_residual(dec, ctx, 2, 16, st.cbf_inc(bx, by))
                lv = H._unscan16(scan)
                tc = int(np.count_nonzero(lv))
                st.cbf[by, bx] = 1 if tc else 0
                out[oy:oy + 4, ox:ox + 4] += H._inv4(H._dequant4(lv, qp)).astype(np.int32)
            else:
                tc = 0
                st.cbf[by, bx] = 0
            nnz[by, bx] = tc
            modes[by, bx] = -1
    np.clip(out, 0, 255, out)
    plane[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16] = out.astype(np.uint8)
    cres = _dec_chroma_residual(dec, ctx, cbpc, qp)
    for ci in range(2):
        cc.store(ci, mx, my, cpred[ci] + cres[ci])
    st.not_i4[my, mx] = 1
    st.cbp[my, mx] = cbp
    return qp


def _dec_mb_p16(dec, ctx, st, plane, refs, mx, my, qp, nnz, modes, mvs,
                cc, nrefs=1):
    ridx = (_dec_ref_idx(dec, ctx, mvs, mx * 4, my * 4, nrefs)
            if nrefs > 1 else 0)
    mvp = mvs.mvp_16x16(mx, my)
    mvd = (_dec_mvd(dec, ctx, _OFS["mvd_x"], st.mvd_inc_sum(mx, my, 0)),
           _dec_mvd(dec, ctx, _OFS["mvd_y"], st.mvd_inc_sum(mx, my, 1)))
    st.mvd[my, mx] = (abs(mvd[0]), abs(mvd[1]))
    mv = (mvp[0] + mvd[0], mvp[1] + mvd[1])
    pred = H._interp_luma(refs[ridx], mx * 16, my * 16, mv[0], mv[1],
                          wp=H._wpl(mvs, ridx))
    cpred = np.stack([cc.mc(ci, mx, my, mv, ridx=ridx,
                            wp=H._wpc(mvs, ridx, ci)) for ci in range(2)])
    mvs.set_mb(mx, my, mv, ridx)
    return _dec_p_tail(dec, ctx, st, pred, plane, mx, my, qp, nnz, modes,
                       cc, cpred, t8_shape=True)


def _dec_mb_b16(dec, ctx, st, plane, ref0, ref1, mx, my, qp, nnz, modes,
                mvs0, mvs1, mbt, cc, tf=None):
    """B_Direct/B_L0/B_L1/B_Bi 16x16 (CABAC): direct derives the
    spatial or temporal (tf) MV field (no mvd); the explicit types read
    one mvd per used list; bi-prediction averages the MC blocks."""
    if mbt == 0:
        dmv0, dmv1 = H._b_direct_mvs(mvs0, mvs1, mx, my, tf)
        pred = H._b_direct_pred(ref0, ref1, mx, my, dmv0, dmv1)
        cpred = H._b_chroma_bi(cc, mx, my, dmv0, dmv1)
        H._b_commit_direct(mvs0, mvs1, mx, my, dmv0, dmv1)
        st.mvd[my, mx] = 0
        return _dec_p_tail(dec, ctx, st, pred, plane, mx, my, qp, nnz,
                           modes, cc, cpred)
    use = (mbt in (1, 3), mbt in (2, 3))
    preds = []
    cpreds = []
    asum = [0, 0]
    for li, (u, mvsx, refx) in enumerate(zip(use, (mvs0, mvs1),
                                             (ref0, ref1))):
        if not u:
            mvsx.set_mb(mx, my, (0, 0), -1)
            continue
        mvp = mvsx.mvp_16x16(mx, my)
        mvd = (_dec_mvd(dec, ctx, _OFS["mvd_x"], st.mvd_inc_sum(mx, my, 0)),
               _dec_mvd(dec, ctx, _OFS["mvd_y"], st.mvd_inc_sum(mx, my, 1)))
        asum[0] += abs(mvd[0])
        asum[1] += abs(mvd[1])
        mv = (mvp[0] + mvd[0], mvp[1] + mvd[1])
        preds.append(H._interp_luma(refx, mx * 16, my * 16, mv[0], mv[1]))
        cpreds.append(np.stack([cc.mc(ci, mx, my, mv, li)
                                for ci in range(2)]))
        mvsx.set_mb(mx, my, mv, 0)
    st.mvd[my, mx] = tuple(asum)
    pred = preds[0] if len(preds) == 1 else H._biblend(preds[0], preds[1])
    cpred = cpreds[0] if len(cpreds) == 1 else \
        H._biblend(cpreds[0], cpreds[1])
    return _dec_p_tail(dec, ctx, st, pred, plane, mx, my, qp, nnz, modes,
                       cc, cpred, t8_shape=True)


def _dec_mb_b_part(dec, ctx, st, plane, ref0, ref1, mx, my, qp, nnz,
                   modes, mvs0, mvs1, mbt, cc):
    """Partitioned B (CABAC, r7): mirror of h264._decode_mb_b_part with
    CABAC mvds — per-list grouped mvds, per-list progressive commits."""
    ptype, m0, m1 = H._B_PART_TYPES[mbt]
    geom = H._PART_GEOM[ptype]
    pmodes = (m0, m1)
    mvs_of = (mvs0, mvs1)
    mv_sel = [[None, None], [None, None]]
    asum = [0, 0]
    for li in range(2):
        for idx in range(2):
            if not (pmodes[idx] == li or pmodes[idx] == 2):
                continue
            mvp = mvs_of[li].mvp_part(mx, my, ptype, idx)
            mvd = (_dec_mvd(dec, ctx, _OFS["mvd_x"],
                            st.mvd_inc_sum(mx, my, 0)),
                   _dec_mvd(dec, ctx, _OFS["mvd_y"],
                            st.mvd_inc_sum(mx, my, 1)))
            asum[0] += abs(mvd[0])
            asum[1] += abs(mvd[1])
            mv = (mvp[0] + mvd[0], mvp[1] + mvd[1])
            mv_sel[li][idx] = mv
            ox, oy, w, h = geom[idx]
            mvs_of[li].set_rect(mx * 4 + ox // 4, my * 4 + oy // 4,
                                w // 4, h // 4, mv, 0)
        for idx in range(2):
            if mv_sel[li][idx] is None:
                ox, oy, w, h = geom[idx]
                mvs_of[li].set_rect(mx * 4 + ox // 4, my * 4 + oy // 4,
                                    w // 4, h // 4, (0, 0), -1)
    st.mvd[my, mx] = tuple(asum)
    pred = np.zeros((16, 16), np.int32)
    cpred = np.zeros((2, 8, 8), np.int32)
    for idx, (ox, oy, w, h) in enumerate(geom):
        preds = []
        cpreds = []
        for li, refx in ((0, ref0), (1, ref1)):
            mv = mv_sel[li][idx]
            if mv is None:
                continue
            preds.append(H._interp_luma(refx, mx * 16 + ox, my * 16 + oy,
                                        mv[0], mv[1], w, h))
            cref = cc.ref if li == 0 else cc.ref2
            cpreds.append(np.stack([
                H._interp_chroma(cref[ci], mx * 8 + ox // 2,
                                 my * 8 + oy // 2, mv[0], mv[1],
                                 w // 2, h // 2) for ci in range(2)]))
        lp = preds[0] if len(preds) == 1 else H._biblend(preds[0], preds[1])
        cp = cpreds[0] if len(cpreds) == 1 else \
            H._biblend(cpreds[0], cpreds[1])
        pred[oy:oy + h, ox:ox + w] = lp
        cpred[:, oy // 2:(oy + h) // 2, ox // 2:(ox + w) // 2] = cp
    return _dec_p_tail(dec, ctx, st, pred, plane, mx, my, qp, nnz, modes,
                       cc, cpred, t8_shape=True)


def _dec_mb_b8x8(dec, ctx, st, plane, ref0, ref1, mx, my, qp, nnz,
                 modes, mvs0, mvs1, cc, tf=None):
    """B_8x8 (mb_type 22, CABAC r7): four sub_mb_type fields (Table
    7-18 — B_Direct_8x8 or {8x8, 8x4, 4x8, 4x4} x {L0, L1, Bi}), mvds
    grouped BY LIST (7.3.5.1) with per-list progressive predictor
    commits via the shared h264._b8x8_list_pass traversal."""
    sts = [_dec_b_sub_type(dec, ctx) for _ in range(4)]
    subs = [(st8, [] if st8 == 0 else
             [[None, None]
              for _ in H._P_SUB_GEOM[H._B_SUB_INFO[st8][0]]])
            for st8 in sts]
    dmv0, dmv1 = H._b_direct_mvs(mvs0, mvs1, mx, my, tf)
    asum = [0, 0]

    def mvd_io(_li, _mv, mvp):
        mvd = (_dec_mvd(dec, ctx, _OFS["mvd_x"],
                        st.mvd_inc_sum(mx, my, 0)),
               _dec_mvd(dec, ctx, _OFS["mvd_y"],
                        st.mvd_inc_sum(mx, my, 1)))
        asum[0] += abs(mvd[0])
        asum[1] += abs(mvd[1])
        return (mvp[0] + mvd[0], mvp[1] + mvd[1])

    H._b8x8_list_pass(subs, mvs0, mvs1, mx, my, dmv0, dmv1, mvd_io)
    st.mvd[my, mx] = tuple(asum)
    pred, cpred = H._b8x8_pred(subs, ref0, ref1, cc.ref, cc.ref2, mx,
                               my, dmv0, dmv1)
    return _dec_p_tail(dec, ctx, st, pred, plane, mx, my, qp, nnz,
                       modes, cc, cpred,
                       t8_shape=all(s in (1, 2, 3) for s in sts))


def _dec_mb_p8x8(dec, ctx, st, plane, refs, mx, my, qp, nnz, modes, mvs,
                 cc, nrefs=1):
    """P_8x8 (CABAC): per 8x8 any sub_mb_type shape 8x8 / 8x4 / 4x8 /
    4x4 (r7), one mvd per sub-partition; with multiple references one
    ref_idx_l0 per 8x8 rides between the sub_mb_type and mvd runs."""
    sts = [_dec_p_sub_type(dec, ctx) for _ in range(4)]
    ridxs = ([_dec_ref_idx(dec, ctx, mvs, mx * 4 + gx8 // 4,
                           my * 4 + gy8 // 4, nrefs)
              for gx8, gy8 in H._P8_GEOM]
             if nrefs > 1 else [0] * 4)
    pred = np.zeros((16, 16), np.int32)
    cpred = np.zeros((2, 8, 8), np.int32)
    asum = [0, 0]
    for (ox8, oy8), st8, ridx in zip(H._P8_GEOM, sts, ridxs):
        for (ox, oy, w, h) in H._P_SUB_GEOM[st8]:
            gx, gy = ox8 + ox, oy8 + oy
            mvp = mvs.mvp_sub(mx * 4 + gx // 4, my * 4 + gy // 4, w // 4)
            mvd = (_dec_mvd(dec, ctx, _OFS["mvd_x"],
                            st.mvd_inc_sum(mx, my, 0)),
                   _dec_mvd(dec, ctx, _OFS["mvd_y"],
                            st.mvd_inc_sum(mx, my, 1)))
            asum[0] += abs(mvd[0])
            asum[1] += abs(mvd[1])
            mv = (mvp[0] + mvd[0], mvp[1] + mvd[1])
            pred[gy:gy + h, gx:gx + w] = H._interp_luma(
                refs[ridx], mx * 16 + gx, my * 16 + gy, mv[0], mv[1], w, h,
                wp=H._wpl(mvs, ridx))
            for ci in range(2):
                cpred[ci, gy // 2:(gy + h) // 2, gx // 2:(gx + w) // 2] = \
                    H._interp_chroma(cc.refl[ridx][ci], mx * 8 + gx // 2,
                                     my * 8 + gy // 2, mv[0], mv[1],
                                     w // 2, h // 2,
                                     wp=H._wpc(mvs, ridx, ci))
            mvs.set_rect(mx * 4 + gx // 4, my * 4 + gy // 4,
                         w // 4, h // 4, mv, ridx)
    st.mvd[my, mx] = tuple(asum)
    return _dec_p_tail(dec, ctx, st, pred, plane, mx, my, qp, nnz, modes,
                       cc, cpred, t8_shape=all(t == 0 for t in sts))


def _dec_mb_p_part(dec, ctx, st, plane, refs, mx, my, qp, nnz, modes,
                   mvs, ptype, cc, nrefs=1):
    """P_L0_L0_16x8 / 8x16: per-partition ref_idx_l0 fields first
    (7.3.5.2 order), then one mvd per partition; the mvd contexts use
    MB-level neighbor sums (matches the encoder's in-repo granularity)."""
    ridxs = ([_dec_ref_idx(dec, ctx, mvs, mx * 4 + ox // 4,
                           my * 4 + oy // 4, nrefs)
              for ox, oy, _w, _h in H._PART_GEOM[ptype]]
             if nrefs > 1 else [0, 0])
    pred = np.zeros((16, 16), np.int32)
    cpred = np.zeros((2, 8, 8), np.int32)
    abs_sum = [0, 0]
    for idx, (ox, oy, w, h) in enumerate(H._PART_GEOM[ptype]):
        ridx = ridxs[idx]
        mvp = mvs.mvp_part(mx, my, ptype, idx)
        mvd = (_dec_mvd(dec, ctx, _OFS["mvd_x"], st.mvd_inc_sum(mx, my, 0)),
               _dec_mvd(dec, ctx, _OFS["mvd_y"], st.mvd_inc_sum(mx, my, 1)))
        abs_sum[0] += abs(mvd[0])
        abs_sum[1] += abs(mvd[1])
        mv = (mvp[0] + mvd[0], mvp[1] + mvd[1])
        pred[oy:oy + h, ox:ox + w] = H._interp_luma(
            refs[ridx], mx * 16 + ox, my * 16 + oy, mv[0], mv[1], w, h,
            wp=H._wpl(mvs, ridx))
        for ci in range(2):
            cpred[ci, oy // 2:(oy + h) // 2, ox // 2:(ox + w) // 2] = \
                H._interp_chroma(cc.refl[ridx][ci], mx * 8 + ox // 2,
                                 my * 8 + oy // 2, mv[0], mv[1],
                                 w // 2, h // 2, wp=H._wpc(mvs, ridx, ci))
        mvs.set_rect(mx * 4 + ox // 4, my * 4 + oy // 4, w // 4, h // 4,
                     mv, ridx)
    st.mvd[my, mx] = tuple(abs_sum)
    return _dec_p_tail(dec, ctx, st, pred, plane, mx, my, qp, nnz, modes,
                       cc, cpred, t8_shape=True)
