"""Pure-Python H.264/AVC (ISO/IEC 14496-10) — CAVLC engine + shared
machinery for the CABAC engine in `h264_cabac`.

The coding surface, all through real AVC machinery (NAL units with
emulation prevention, Exp-Golomb headers, SPS/PPS, IDR/non-IDR slice
headers, avcC records for MP4 'avc1' tracks), in both entropy modes
({CAVLC here, CABAC in h264_cabac} x {I, P, B}):

1. **I_PCM** (mb_type 25): raw samples in the bitstream, bit-exact
   round trip — the entropy-free floor, kept for fixtures (in CABAC
   slices too, with the r7 engine flush/re-init around raw samples).
2. **Intra** (r4): I_4x4 and I_16x16 macroblocks with spec intra
   prediction (9 + 4 modes), the 4x4 integer transform + Hadamard DC
   transforms, spec quantization, and full CAVLC residual coding
   (coeff_token / level / total_zeros / run_before, §9.2). The encoder
   reconstructs exactly like the decoder, so decode(encode(x)) equals
   the encoder's reconstruction BIT-EXACTLY (asserted in tests), and
   at low QP PSNR vs the source exceeds 40 dB.
3. **P slices** (r5-r7): IDR+P GOPs — P_SKIP with skip-run coding,
   motion-compensated quarter-pel 6-tap interpolation (8.4.2.2),
   median MV prediction + MVD coding, partitions 16x16/16x8/8x16/P_8x8
   with sub-8x8 shapes (8x4/4x8/4x4), multi-reference L0 with
   per-partition ref_idx_l0 (sliding-window DPB, nrefs<=16), inter CBP
   mapping, dead-zone quantization, intra-in-P fallback, inter bS
   deblocking. Static scenes collapse to ~10-byte all-skip frames.
4. **B slices** (r6-r7): IBBP GOPs with bi-prediction (2-deep DPB),
   B_SKIP + B_Direct_16x16 in spatial AND temporal (8.4.1.2.3
   POC-scaled) direct modes, partitioned B (mb_type 4..21) and B_8x8
   sub-macroblocks, ctts display reordering in the MP4 layer, POC-lsb
   wrap handling.
5. **4:2:0 chroma** (r7): real chroma residuals (2x2 DC Hadamard + AC),
   chroma intra prediction incl. plane mode, cbp_chroma in both
   entropy modes, chroma deblocking. Gray clips stay bit-identical
   (flat-128 default source, cbpc=0 everywhere).

6. **Weighted prediction** (r7): EXPLICIT for P slices —
   pred_weight_table in the slice header, per-reference luma/chroma
   gain+offset applied after interpolation (8.4.2.3.2) incl. P_SKIP,
   least-squares weight estimation so fades collapse to skip runs —
   and IMPLICIT for B slices (weighted_bipred_idc 2): POC-derived
   (w0, w1) bi-prediction blending (8.4.2.3.1), pure prediction math
   with no extra syntax, composable with spatial/temporal direct and
   both entropy coders.

7. **High-profile 8x8 transform** (r7, both entropy modes): profile_idc 100 SPS
   (4:2:0, 8-bit, flat scaling), PPS transform_8x8_mode_flag, per-MB
   transform_size_8x8_flag on 16x16/16x8/8x16 (and all-8x8-sub P_8x8)
   inter macroblocks with a coefficient-count selection gate, the 8x8
   integer transform as the EXACT basis-matrix product (the truncating
   fast butterflies are not reproduced — in-repo convention, shared
   both sides) with quant/dequant tables DERIVED numerically from the
   basis norms (they reproduce the ISO LevelScale8x8 row
   [20,18,32,19,25,24]), and CAVLC 8x8 residuals as the spec's four
   interleaved 4x4 runs over the 8x8 zigzag; CABAC slices code the
   same blocks as cat-5 residuals (63-position significance folded at
   14 — in-repo context assignment, same honesty note as the uniform
   init) with a neighbor-conditioned transform_size_8x8_flag bin.
   I_NxN macroblocks race an I_8x8 candidate (8.3.2.2: all nine
   prediction modes over low-pass-filtered reference samples,
   8.3.2.2.1) against I_4x4 on the same coefficient-count gate; pred
   modes serialize as prev/rem pairs per 8x8 (CABAC reuses the
   prev_i4/rem_i4 contexts). B slices carry the flag too (late r7) on
   every non-direct shape with no sub-8x8 partitioning — direct stays
   4x4 because the SPS writes direct_8x8_inference_flag 0 (the 7.3.5
   flag condition). In-loop deblocking composes with the 8x8 transform
   (late r7, 8.7.2): a per-picture transform-size map skips the
   internal 4x4 edges (offsets 4/12) of 8x8-transformed MBs and tests
   bS-2 "coded" status per 8x8 block. The 8x8 profile is COMPLETE.

8. **Multi-slice pictures** (r7): slices covering whole MB rows
   (first_mb_in_slice = row * PicWidthInMbs), the hardware-encoder /
   error-resilience shape — one NAL per slice in the sample, neighbour
   availability (intra prediction, nC contexts, MV prediction, CABAC
   ctxIdxInc, skip runs / per-slice engine init) cut at each slice
   top, for I, P AND B pictures in both entropy modes
   (encode_*(slice_rows=N)). Deblocking filters across slice
   boundaries (disable_deblocking_filter_idc 0 semantics).

Decode scope and honesty notes:
- Remaining out-of-scope shapes raise a clear ValueError: high-profile
  tools beyond the 8x8 transform + I_8x8 intra above (scaling matrices,
  >8-bit, 4:2:2/4:4:4), FMO, slices at non-row-aligned first_mb
  offsets, SP/SI slices, EXPLICIT weighted bi-prediction
  (weighted_bipred_idc 1; implicit idc 2 — the x264 default — and
  single-list P weighting ARE in scope), ref-pic-list modification,
  MMCO adaptive marking, >1 L1 reference.
  `operators/multimodal.sample_frames` maps that to its documented
  well-formed-unsupported-codec stub.
- Foreign-stream CABAC cross-decode is adjudicated permanently out of
  scope (SURVEY §15.2): context INIT is in-repo uniform
  (cabac_init_idc accepted but ignored), so the engine round-trips its
  own conformant bitstreams; everything else (arithmetic engine,
  binarizations, context increments) follows the spec.
- The in-loop deblocking filter (8.7) IS applied for streams that
  request it (luma, all-intra bS 4/3, strong+normal filters, alpha/
  beta/tc0 threshold tables, per-MB QP averaging, I_PCM-as-QP-0);
  encode_idr_cavlc(deblock=True) produces such streams and returns the
  filtered recon, so decode == recon stays bit-exact in both modes.
- VLC tables are transcribed from the spec; encoder and decoder share
  one copy and every table is machine-checked prefix-free, so
  round-trip self-consistency holds for ANY coefficient density
  (property-tested with dense blocks). The rarely-hit tail entries
  (TotalCoeff >= 13 with TrailingOnes = 3 in the 2<=nC<4 context) are
  best-effort transcriptions; a mismatch there would only affect
  interop with external decoders, never this encoder/decoder pair.
"""

from __future__ import annotations

import struct

import numpy as np


# ------------------------------------------------------------- bit plumbing
class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def u(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def ue(self, v: int) -> None:  # unsigned Exp-Golomb
        code = v + 1
        nbits = code.bit_length()
        self.u(0, nbits - 1)
        self.u(code, nbits)

    def se(self, v: int) -> None:  # signed Exp-Golomb
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def align(self) -> None:
        if self.n:
            self.u(0, 8 - self.n)

    def raw(self, data: bytes) -> None:
        assert self.n == 0
        self.buf += data

    def rbsp_trailing(self) -> None:
        self.u(1, 1)
        self.align()


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def u(self, bits: int) -> int:
        v = 0
        for _ in range(bits):
            v = (v << 1) | ((self.data[self.pos >> 3] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 32:
                raise ValueError("bad Exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def raw(self, n: int) -> bytes:
        assert self.pos % 8 == 0
        b = self.data[self.pos >> 3 : (self.pos >> 3) + n]
        self.pos += 8 * n
        return b

    def more_data(self) -> bool:
        """more_rbsp_data(): true while bits remain BEFORE the final '1'
        (the rbsp_stop_bit)."""
        last_one = -1
        for i in range(len(self.data) - 1, -1, -1):
            if self.data[i]:
                byte = self.data[i]
                low = 0
                while not (byte >> low) & 1:
                    low += 1
                last_one = 8 * i + (7 - low)
                break
        return self.pos < last_one


def _ep_insert(rbsp: bytes) -> bytes:
    """Emulation prevention: 00 00 0x -> 00 00 03 0x for x <= 3."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _ep_remove(nal: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    i = 0
    while i < len(nal):
        b = nal[i]
        if zeros >= 2 and b == 3 and i + 1 < len(nal) and nal[i + 1] <= 3:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


# ============================================================ CAVLC tables
# Transcribed from Rec. ITU-T H.264 (public spec) §9.2 tables. Encoder and
# decoder share these; tests assert every table is prefix-free.

# Table 9-5 coeff_token: ctx 0 (0<=nC<2), 1 (2<=nC<4), 2 (4<=nC<8),
# -1 (chroma DC, 4:2:0). Entries: (TotalCoeff, TrailingOnes) -> (len, bits).
_CT_TABLES: dict[int, dict[tuple[int, int], tuple[int, int]]] = {
    0: {
        (0, 0): (1, 1),
        (1, 0): (6, 5), (1, 1): (2, 1),
        (2, 0): (8, 7), (2, 1): (6, 4), (2, 2): (3, 1),
        (3, 0): (9, 7), (3, 1): (8, 6), (3, 2): (7, 5), (3, 3): (5, 3),
        (4, 0): (10, 7), (4, 1): (9, 6), (4, 2): (8, 5), (4, 3): (6, 3),
        (5, 0): (11, 7), (5, 1): (10, 6), (5, 2): (9, 5), (5, 3): (7, 4),
        (6, 0): (13, 15), (6, 1): (11, 6), (6, 2): (10, 5), (6, 3): (8, 4),
        (7, 0): (13, 11), (7, 1): (13, 14), (7, 2): (11, 5), (7, 3): (9, 4),
        (8, 0): (13, 8), (8, 1): (13, 10), (8, 2): (13, 13), (8, 3): (10, 4),
        (9, 0): (14, 15), (9, 1): (14, 14), (9, 2): (13, 9), (9, 3): (11, 4),
        (10, 0): (14, 11), (10, 1): (14, 10), (10, 2): (14, 13),
        (10, 3): (13, 12),
        (11, 0): (15, 15), (11, 1): (15, 14), (11, 2): (14, 9),
        (11, 3): (14, 8),
        (12, 0): (15, 11), (12, 1): (15, 10), (12, 2): (15, 13),
        (12, 3): (14, 12),
        (13, 0): (16, 15), (13, 1): (15, 1), (13, 2): (15, 9),
        (13, 3): (15, 12),
        (14, 0): (16, 11), (14, 1): (16, 14), (14, 2): (16, 13),
        (14, 3): (15, 8),
        (15, 0): (16, 7), (15, 1): (16, 10), (15, 2): (16, 9),
        (15, 3): (16, 12),
        (16, 0): (16, 4), (16, 1): (16, 6), (16, 2): (16, 5),
        (16, 3): (16, 8),
    },
    1: {
        (0, 0): (2, 0b11),
        (1, 0): (6, 0b001011), (1, 1): (2, 0b10),
        (2, 0): (6, 0b000111), (2, 1): (5, 0b00111), (2, 2): (3, 0b011),
        (3, 0): (7, 0b0000111), (3, 1): (6, 0b001010),
        (3, 2): (6, 0b001001), (3, 3): (4, 0b0101),
        (4, 0): (8, 0b00000111), (4, 1): (6, 0b000110),
        (4, 2): (6, 0b000101), (4, 3): (4, 0b0100),
        (5, 0): (8, 0b00000100), (5, 1): (7, 0b0000110),
        (5, 2): (7, 0b0000101), (5, 3): (5, 0b00110),
        (6, 0): (9, 0b000000111), (6, 1): (8, 0b00000110),
        (6, 2): (8, 0b00000101), (6, 3): (6, 0b001000),
        (7, 0): (11, 0b00000001111), (7, 1): (9, 0b000000110),
        (7, 2): (9, 0b000000101), (7, 3): (6, 0b000100),
        (8, 0): (11, 0b00000001011), (8, 1): (11, 0b00000001110),
        (8, 2): (11, 0b00000001101), (8, 3): (7, 0b0000100),
        (9, 0): (12, 0b000000001111), (9, 1): (11, 0b00000001010),
        (9, 2): (11, 0b00000001001), (9, 3): (9, 0b000000100),
        (10, 0): (12, 0b000000001011), (10, 1): (12, 0b000000001110),
        (10, 2): (12, 0b000000001101), (10, 3): (11, 0b00000001100),
        (11, 0): (12, 0b000000001000), (11, 1): (12, 0b000000001010),
        (11, 2): (12, 0b000000001001), (11, 3): (11, 0b00000001000),
        (12, 0): (13, 15), (12, 1): (13, 14), (12, 2): (13, 13),
        (12, 3): (12, 12),
        (13, 0): (13, 11), (13, 1): (13, 10), (13, 2): (13, 9),
        (13, 3): (13, 8),
        (14, 0): (13, 7), (14, 1): (14, 11), (14, 2): (13, 6),
        (14, 3): (13, 1),
        (15, 0): (14, 9), (15, 1): (14, 8), (15, 2): (14, 10),
        (15, 3): (14, 4),
        (16, 0): (14, 7), (16, 1): (14, 6), (16, 2): (14, 5),
        (16, 3): (14, 0),
    },
    2: {
        (0, 0): (4, 15),
        (1, 0): (6, 15), (1, 1): (4, 14),
        (2, 0): (6, 11), (2, 1): (5, 15), (2, 2): (4, 13),
        (3, 0): (6, 8), (3, 1): (5, 12), (3, 2): (5, 14), (3, 3): (4, 12),
        (4, 0): (7, 15), (4, 1): (5, 10), (4, 2): (5, 11), (4, 3): (4, 11),
        (5, 0): (7, 11), (5, 1): (5, 8), (5, 2): (5, 9), (5, 3): (4, 10),
        (6, 0): (7, 9), (6, 1): (6, 14), (6, 2): (6, 13), (6, 3): (4, 9),
        (7, 0): (7, 8), (7, 1): (6, 10), (7, 2): (6, 9), (7, 3): (4, 8),
        (8, 0): (8, 15), (8, 1): (7, 14), (8, 2): (7, 13), (8, 3): (5, 13),
        (9, 0): (8, 11), (9, 1): (8, 14), (9, 2): (7, 10), (9, 3): (6, 12),
        (10, 0): (9, 15), (10, 1): (8, 10), (10, 2): (8, 13),
        (10, 3): (7, 12),
        (11, 0): (9, 11), (11, 1): (9, 14), (11, 2): (8, 9),
        (11, 3): (8, 12),
        (12, 0): (9, 8), (12, 1): (9, 10), (12, 2): (9, 13),
        (12, 3): (8, 8),
        (13, 0): (10, 13), (13, 1): (9, 7), (13, 2): (9, 9),
        (13, 3): (9, 12),
        (14, 0): (10, 12), (14, 1): (10, 11), (14, 2): (10, 10),
        (14, 3): (10, 8),
        (15, 0): (10, 5), (15, 1): (10, 4), (15, 2): (10, 3),
        (15, 3): (10, 6),
        (16, 0): (10, 1), (16, 1): (10, 2), (16, 2): (10, 7),
        (16, 3): (10, 0),
    },
    -1: {  # chroma DC (4:2:0), maxNumCoeff 4
        (0, 0): (2, 0b01),
        (1, 0): (6, 0b000111), (1, 1): (1, 0b1),
        (2, 0): (6, 0b000100), (2, 1): (6, 0b000110), (2, 2): (3, 0b001),
        (3, 0): (6, 0b000011), (3, 1): (7, 0b0000011),
        (3, 2): (7, 0b0000010), (3, 3): (6, 0b000101),
        (4, 0): (6, 0b000010), (4, 1): (8, 0b00000011),
        (4, 2): (8, 0b00000010), (4, 3): (7, 0b0000000),
    },
}

# Table 9-7/9-8 total_zeros for 4x4 blocks, by TotalCoeff 1..15:
# list index = total_zeros -> (len, bits)
_TZ_TABLES: dict[int, list[tuple[int, int]]] = {
    1: [(1, 0b1), (3, 0b011), (3, 0b010), (4, 0b0011), (4, 0b0010),
        (5, 0b00011), (5, 0b00010), (6, 0b000011), (6, 0b000010),
        (7, 0b0000011), (7, 0b0000010), (8, 0b00000011), (8, 0b00000010),
        (9, 0b000000011), (9, 0b000000010), (9, 0b000000001)],
    2: [(3, 0b111), (3, 0b110), (3, 0b101), (3, 0b100), (3, 0b011),
        (4, 0b0101), (4, 0b0100), (4, 0b0011), (4, 0b0010), (5, 0b00011),
        (5, 0b00010), (6, 0b000011), (6, 0b000010), (6, 0b000001),
        (6, 0b000000)],
    3: [(4, 0b0101), (3, 0b111), (3, 0b110), (3, 0b101), (4, 0b0100),
        (4, 0b0011), (3, 0b100), (3, 0b011), (4, 0b0010), (5, 0b00011),
        (5, 0b00010), (6, 0b000001), (5, 0b00001), (6, 0b000000)],
    4: [(5, 0b00011), (3, 0b111), (4, 0b0101), (4, 0b0100), (3, 0b110),
        (3, 0b101), (3, 0b100), (4, 0b0011), (3, 0b011), (4, 0b0010),
        (5, 0b00010), (5, 0b00001), (5, 0b00000)],
    5: [(4, 0b0101), (4, 0b0100), (4, 0b0011), (3, 0b111), (3, 0b110),
        (3, 0b101), (3, 0b100), (3, 0b011), (4, 0b0010), (5, 0b00001),
        (4, 0b0001), (5, 0b00000)],
    6: [(6, 0b000001), (5, 0b00001), (3, 0b111), (3, 0b110), (3, 0b101),
        (3, 0b100), (3, 0b011), (3, 0b010), (4, 0b0001), (3, 0b001),
        (6, 0b000000)],
    7: [(6, 0b000001), (5, 0b00001), (3, 0b101), (3, 0b100), (3, 0b011),
        (2, 0b11), (3, 0b010), (4, 0b0001), (3, 0b001), (6, 0b000000)],
    8: [(6, 0b000001), (4, 0b0001), (5, 0b00001), (3, 0b011), (2, 0b11),
        (2, 0b10), (3, 0b010), (3, 0b001), (6, 0b000000)],
    9: [(6, 0b000001), (6, 0b000000), (4, 0b0001), (2, 0b11), (2, 0b10),
        (3, 0b001), (2, 0b01), (5, 0b00001)],
    10: [(5, 0b00001), (5, 0b00000), (3, 0b001), (2, 0b11), (2, 0b10),
         (2, 0b01), (4, 0b0001)],
    11: [(4, 0b0000), (4, 0b0001), (3, 0b001), (3, 0b010), (1, 0b1),
         (3, 0b011)],
    12: [(4, 0b0000), (4, 0b0001), (2, 0b01), (1, 0b1), (3, 0b001)],
    13: [(3, 0b000), (3, 0b001), (1, 0b1), (2, 0b01)],
    14: [(2, 0b00), (2, 0b01), (1, 0b1)],
    15: [(1, 0b0), (1, 0b1)],
}

# Table 9-9(a) total_zeros for chroma DC (4:2:0), TotalCoeff 1..3
_TZ_CDC_TABLES: dict[int, list[tuple[int, int]]] = {
    1: [(1, 0b1), (2, 0b01), (3, 0b001), (3, 0b000)],
    2: [(1, 0b1), (2, 0b01), (2, 0b00)],
    3: [(1, 0b1), (1, 0b0)],
}

# Table 9-10 run_before, by min(zerosLeft, 7): list index = run -> (len, bits)
_RB_TABLES: dict[int, list[tuple[int, int]]] = {
    1: [(1, 0b1), (1, 0b0)],
    2: [(1, 0b1), (2, 0b01), (2, 0b00)],
    3: [(2, 0b11), (2, 0b10), (2, 0b01), (2, 0b00)],
    4: [(2, 0b11), (2, 0b10), (2, 0b01), (3, 0b001), (3, 0b000)],
    5: [(2, 0b11), (2, 0b10), (3, 0b011), (3, 0b010), (3, 0b001),
        (3, 0b000)],
    6: [(2, 0b11), (3, 0b000), (3, 0b001), (3, 0b011), (3, 0b010),
        (3, 0b101), (3, 0b100)],
    7: [(3, 0b111), (3, 0b110), (3, 0b101), (3, 0b100), (3, 0b011),
        (3, 0b010), (3, 0b001), (4, 0b0001), (5, 0b00001), (6, 0b000001),
        (7, 0b0000001), (8, 0b00000001), (9, 0b000000001),
        (10, 0b0000000001), (11, 0b00000000001)],
}

# 4x4 zigzag: scan position -> raster index
_ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

# Dequant V (LevelScale) and quant MF by qp%6 and coefficient class
# (class 0: (0,0),(0,2),(2,0),(2,2); class 1: (1,1),(1,3),(3,1),(3,3);
# class 2: the rest)
_V = ((10, 16, 13), (11, 18, 14), (13, 20, 16),
      (14, 23, 18), (16, 25, 20), (18, 29, 23))
_MF = ((13107, 5243, 8066), (11916, 4660, 7490), (10082, 4194, 6554),
       (9362, 3647, 5825), (8192, 3355, 5243), (7282, 2893, 4559))
_POS_CLASS = (0, 2, 0, 2, 2, 1, 2, 1, 0, 2, 0, 2, 2, 1, 2, 1)  # raster idx


def _vlc_decoders():
    """(len, bits) tables -> incremental decoders {(len, bits): symbol}."""
    out = {}
    for key, tbl in _CT_TABLES.items():
        out[("ct", key)] = {v: k for k, v in tbl.items()}
    for tc, tbl in _TZ_TABLES.items():
        out[("tz", tc)] = {v: i for i, v in enumerate(tbl)}
    for tc, tbl in _TZ_CDC_TABLES.items():
        out[("tzc", tc)] = {v: i for i, v in enumerate(tbl)}
    for zl, tbl in _RB_TABLES.items():
        out[("rb", zl)] = {v: i for i, v in enumerate(tbl)}
    return out


_VLC_DEC = _vlc_decoders()


def _read_vlc(r: "_BitReader", dec: dict):
    length, bits = 0, 0
    while length < 20:
        bits = (bits << 1) | r.u(1)
        length += 1
        sym = dec.get((length, bits))
        if sym is not None:
            return sym
    raise ValueError("bad CAVLC code")


# ------------------------------------------------------------------ encoder
def _sps(w: int, h: int, profile: int = 66, bpoc: bool = False,
         nrefs: int = 1) -> bytes:
    mbw = -(-w // 16)
    mbh = -(-h // 16)
    bw = _BitWriter()
    bw.u(profile, 8)   # profile_idc: 66 Baseline / 77 Main / 100 High (r7)
    bw.u(0, 8)    # constraint flags + reserved
    bw.u(20, 8)   # level_idc 2.0
    bw.ue(0)      # sps_id
    if profile == 100:  # High-profile SPS extras (7.3.2.1.1, r7)
        bw.ue(1)  # chroma_format_idc: 4:2:0
        bw.ue(0)  # bit_depth_luma_minus8
        bw.ue(0)  # bit_depth_chroma_minus8
        bw.u(0, 1)  # qpprime_y_zero_transform_bypass
        bw.u(0, 1)  # seq_scaling_matrix_present (flat 16 scaling)
    bw.ue(0)      # log2_max_frame_num_minus4 -> frame_num is u(4)
    if bpoc:
        # B-enabled streams carry explicit picture order (display can
        # differ from decode order): poc_type 0, 16-bit poc_lsb
        bw.ue(0)
        bw.ue(12)  # log2_max_pic_order_cnt_lsb_minus4 -> u(16)
    else:
        bw.ue(2)  # pic_order_cnt_type 2 (order = decode order)
    # max_num_ref_frames: 2-deep DPB for B streams, nrefs-deep for
    # multi-reference P streams (r7), 0 for the 1-ref/I-only default
    bw.ue(max(2 if bpoc else 0, nrefs if nrefs > 1 else 0))
    bw.u(0, 1)    # gaps_in_frame_num_value_allowed
    bw.ue(mbw - 1)
    bw.ue(mbh - 1)
    bw.u(1, 1)    # frame_mbs_only
    bw.u(0, 1)    # direct_8x8_inference
    crop_r = mbw * 16 - w
    crop_b = mbh * 16 - h
    if crop_r or crop_b:
        bw.u(1, 1)
        bw.ue(0)
        bw.ue(crop_r // 2)  # 4:2:0: crop unit = 2 px
        bw.ue(0)
        bw.ue(crop_b // 2)
    else:
        bw.u(0, 1)
    bw.u(0, 1)    # vui_parameters_present
    bw.rbsp_trailing()
    return bytes(bw.buf)


def _pps(deblock_ctrl: bool = False, cabac: bool = False,
         wp: bool = False, wbidc: int = 0, t8x8: bool = False) -> bytes:
    bw = _BitWriter()
    bw.ue(0)      # pps_id
    bw.ue(0)      # sps_id
    bw.u(1 if cabac else 0, 1)  # entropy_coding_mode: CAVLC / CABAC
    bw.u(0, 1)    # pic_order_present
    bw.ue(0)      # num_slice_groups_minus1
    bw.ue(0)      # num_ref_idx_l0_active_minus1
    bw.ue(0)      # num_ref_idx_l1_active_minus1
    bw.u(1 if wp else 0, 1)  # weighted_pred (P slices, explicit, r7)
    bw.u(wbidc, 2)  # weighted_bipred_idc (2 = implicit B weights, r7)
    bw.se(0)      # pic_init_qp_minus26
    bw.se(0)      # pic_init_qs_minus26
    bw.se(0)      # chroma_qp_index_offset
    bw.u(1 if deblock_ctrl else 0, 1)  # deblocking_filter_control_present
    bw.u(0, 1)    # constrained_intra_pred
    bw.u(0, 1)    # redundant_pic_cnt_present
    if t8x8:  # PPS extension (7.3.2.2 tail, High profile, r7)
        bw.u(1, 1)   # transform_8x8_mode_flag
        bw.u(0, 1)   # pic_scaling_matrix_present
        bw.se(0)     # second_chroma_qp_index_offset
    bw.rbsp_trailing()
    return bytes(bw.buf)


# ---------------------------------------------- transforms & quantization
_H4 = np.array([[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, -1, 1], [1, -1, 1, -1]],
               np.int32)  # Hadamard (DC transforms, 8.5.10)
_CF = np.array([[1, 1, 1, 1], [2, 1, -1, -2], [1, -1, -1, 1], [1, -2, 2, -1]],
               np.int32)  # forward core transform (encoder side)

# Raster 4x4 of V / MF by coefficient class
_V4 = [np.array([_V[m][c] for c in _POS_CLASS], np.int32).reshape(4, 4)
       for m in range(6)]


# ----------------------------------------- 8x8 transform (High profile, r7)
# The spec 8x8 basis (8.5.13's butterflies compute exactly these rows in
# full precision; the in-repo convention uses the EXACT integer matrix
# product instead of the truncating fast butterflies — shared by encoder
# and decoder, and bit-exact ISO cross-decode is not claimed anyway, see
# the module honesty notes).
_C8 = np.array([
    [8, 8, 8, 8, 8, 8, 8, 8],
    [12, 10, 6, 3, -3, -6, -10, -12],
    [8, 4, -4, -8, -8, -4, 4, 8],
    [10, -3, -12, -6, 6, 12, 3, -10],
    [8, -8, -8, 8, 8, -8, -8, 8],
    [6, -12, 3, 10, -10, -3, 12, -6],
    [4, -8, 8, -4, -4, 8, -8, 4],
    [3, -6, 10, -12, 12, -10, 6, -3]], np.int64)
# basis norms are {512, 578, 320}; the quant/dequant tables divide by
# sqrt(n_i * n_j) so quantization is uniform in the orthonormal domain —
# derived NUMERICALLY from the matrix rather than transcribed (the
# derivation reproduces the ISO LevelScale8x8 row [20,18,32,19,25,24]
# where rounding agrees; closure is asserted in tests/test_h264.py)
_N8 = np.sqrt(np.outer(np.diag(_C8 @ _C8.T), np.diag(_C8 @ _C8.T)))
_MF8 = [np.round((1 << 22) / (0.625 * 2 ** (m / 6) * _N8)).astype(np.int64)
        for m in range(6)]
_V8 = [np.round(0.625 * 2 ** (m / 6) * (1 << 14) / _N8).astype(np.int64)
       for m in range(6)]


def _zigzag8() -> list:
    order, i, j = [], 0, 0
    for _ in range(64):
        order.append(i * 8 + j)
        if (i + j) % 2 == 0:
            if j == 7:
                i += 1
            elif i == 0:
                j += 1
            else:
                i, j = i - 1, j + 1
        else:
            if i == 7:
                j += 1
            elif j == 0:
                i += 1
            else:
                i, j = i + 1, j - 1
    return order


_ZZ8 = np.array(_zigzag8())


def _fwd8(resid: np.ndarray) -> np.ndarray:
    return _C8 @ resid.astype(np.int64) @ _C8.T


def _quant8(w: np.ndarray, qp: int, intra: bool = False) -> np.ndarray:
    qbits = 22 + qp // 6
    f = (1 << qbits) // (3 if intra else 6)  # spec dead-zone rounding
    return (np.sign(w) * ((np.abs(w) * _MF8[qp % 6] + f) >> qbits)
            ).astype(np.int64)


def _dequant8(q: np.ndarray, qp: int) -> np.ndarray:
    return (q.astype(np.int64) * _V8[qp % 6]) << (qp // 6)


def _inv8(wd: np.ndarray) -> np.ndarray:
    return (_C8.T @ wd @ _C8 + (1 << 13)) >> 14


def _scan8_sub(q8: np.ndarray) -> list:
    """8x8 quantized block -> four 16-coeff interleaved runs (8.5.6
    shape: CAVLC codes an 8x8 block as 4 interleaved 4x4 residuals over
    the 8x8 zigzag scan: run k takes scan positions 4*n + k)."""
    flat = q8.reshape(-1)[_ZZ8]
    return [flat[k::4] for k in range(4)]


def _unscan8_sub(runs: list) -> np.ndarray:
    flat = np.zeros(64, np.int64)
    for k, run in enumerate(runs):
        flat[k::4] = run
    out = np.zeros(64, np.int64)
    out[_ZZ8] = flat
    return out.reshape(8, 8)


# Active PPS transform_8x8_mode_flag (multi-site, same single-threaded
# module-global convention as _SLICE_TOP/_BIPRED: every slice entry sets
# it, encoder and decoder alike).
_T8 = False


def _set_t8(v: bool) -> None:
    global _T8
    _T8 = bool(v)


# Per-picture transform_size_8x8_flag map (mbh x mbw), for the 8.7
# deblocking edge derivation: inside an 8x8-transformed MB the internal
# 4x4 edges (offsets 4 and 12) are NOT filtered, and "coded" status for
# bS 2 is per 8x8 block. Same module-global convention as _T8; None when
# the picture doesn't filter or the PPS has no 8x8 mode.
_T8MAP = None


def _set_t8map(m) -> None:
    global _T8MAP
    _T8MAP = m


def _mark_t8(mx: int, my: int) -> None:
    if _T8MAP is not None:
        _T8MAP[my, mx] = 1
_MF4 = [np.array([_MF[m][c] for c in _POS_CLASS], np.int32).reshape(4, 4)
        for m in range(6)]

# Table 9-4 (me mapping) coded_block_pattern for intra: codeNum -> cbp
_CBP_INTRA = (47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
              16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4, 8,
              17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41)
_CBP_INTRA_INV = {v: i for i, v in enumerate(_CBP_INTRA)}

# luma 4x4 blkIdx -> (x, y) offset within the macroblock
_BLK_XY = ((0, 0), (4, 0), (0, 4), (4, 4), (8, 0), (12, 0), (8, 4), (12, 4),
           (0, 8), (4, 8), (0, 12), (4, 12), (8, 8), (12, 8), (8, 12),
           (12, 12))
# blkIdx whose above-right 4x4 neighbour inside the same MB is already
# decoded (see 8.3.1: raster-in-8x8 Z order)
_AR_OK_IN_MB = frozenset((2, 6, 8, 9, 10, 12, 14))


def _fwd4(x: np.ndarray) -> np.ndarray:
    return _CF @ x.astype(np.int32) @ _CF.T


def _inv4(d: np.ndarray) -> np.ndarray:
    """Scaled coefficients -> residual (8.5.12.2), incl. (x+32)>>6."""
    d = d.astype(np.int64)
    e0 = d[0] + d[2]
    e1 = d[0] - d[2]
    e2 = (d[1] >> 1) - d[3]
    e3 = d[1] + (d[3] >> 1)
    g = np.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3])
    d = g.T
    e0 = d[0] + d[2]
    e1 = d[0] - d[2]
    e2 = (d[1] >> 1) - d[3]
    e3 = d[1] + (d[3] >> 1)
    h = np.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3])
    return (h.T + 32) >> 6


def _quant4(w: np.ndarray, qp: int, intra: bool = True) -> np.ndarray:
    shift = 15 + qp // 6
    f = (1 << shift) // (3 if intra else 6)  # spec dead-zone rounding
    a = np.abs(w).astype(np.int64) * _MF4[qp % 6] + f
    return (np.sign(w) * (a >> shift)).astype(np.int32)


def _dequant4(levels: np.ndarray, qp: int) -> np.ndarray:
    return (levels.astype(np.int64) * _V4[qp % 6]) << (qp // 6)


def _thin(levels: np.ndarray, max_coeffs: int) -> np.ndarray:
    """Encoder-side coefficient thinning: keep the max_coeffs
    largest-|level| coefficients (ties -> lower scan index). A legal
    encoder decision that keeps every block within the VLC-table region
    the round-trip tests exercise."""
    flat = levels.ravel()
    nz = np.nonzero(flat)[0]
    if len(nz) <= max_coeffs:
        return levels
    order = sorted(nz, key=lambda i: (-abs(int(flat[i])), i))
    out = np.zeros_like(flat)
    for i in order[:max_coeffs]:
        out[i] = flat[i]
    return out.reshape(levels.shape)


# ------------------------------------------------ chroma (4:2:0) coding
# Table 8-15: QPc from qPI (chroma_qp_index_offset is 0 in the in-repo
# PPS, so qPI == the luma QP)
_QPC_TAB = tuple(range(30)) + (29, 30, 31, 32, 32, 33, 34, 34, 35, 35,
                               36, 36, 37, 37, 37, 38, 38, 38, 39, 39,
                               39, 39)


def _qpc(qp_y: int) -> int:
    return _QPC_TAB[min(51, max(0, qp_y))]


_H2 = np.array([[1, 1], [1, -1]], np.int32)  # 2x2 chroma DC Hadamard


def _quant_dc2(f: np.ndarray, qp: int, intra: bool = True) -> np.ndarray:
    """Encoder chroma-DC quant (mirror of 8.5.11: the forward Hadamard
    carries a 4x gain closed by the inverse's >>1 scaling, hence the
    doubled dead-zone and the +1 shift)."""
    shift = 15 + qp // 6
    fdz = 2 * ((1 << shift) // (3 if intra else 6))
    a = np.abs(f).astype(np.int64) * _MF[qp % 6][0] + fdz
    return (np.sign(f) * (a >> (shift + 1))).astype(np.int32)


def _dequant_dc2(lv: np.ndarray, qp: int) -> np.ndarray:
    """8.5.11.2 (4:2:0): inverse 2x2 Hadamard, then dcC = (f*LS << qp/6)
    >> 5 with LevelScale = 16*V — in this file's convention (V tables
    without the x16 weightScale) that is (f*V << qp/6) >> 1."""
    f = _H2.astype(np.int64) @ lv.astype(np.int64) @ _H2
    return (f * _V[qp % 6][0] << (qp // 6)) >> 1


# chroma DC 2x2 coding order: raster c00 c01 c10 c11 (9.2, 4:2:0)
def _scan_cdc(blk: np.ndarray) -> list[int]:
    return [int(v) for v in blk.ravel()]


def _unscan_cdc(scan: list[int]) -> np.ndarray:
    return np.array(scan, np.int32).reshape(2, 2)


def _pred_chroma8(cp: np.ndarray, cmx: int, cmy: int, mode: int,
                  al: bool, aa: bool) -> np.ndarray:
    """8.3.4: 8x8 chroma intra prediction on a half-res component plane.
    Modes: 0 DC (per-4x4-quadrant neighbour rules), 1 horizontal,
    2 vertical, 3 plane (8.3.4.4, r7 — needs both neighbours)."""
    px, py = cmx * 8, cmy * 8
    L = cp[py:py + 8, px - 1].astype(np.int32) if al else None
    A = cp[py - 1, px:px + 8].astype(np.int32) if aa else None
    p = np.empty((8, 8), np.int32)
    if mode == 0:
        for qy in (0, 4):
            for qx in (0, 4):
                lsum = int(L[qy:qy + 4].sum()) if al else None
                asum = int(A[qx:qx + 4].sum()) if aa else None
                if qx == qy:  # corner blocks prefer both neighbours
                    if al and aa:
                        v = (lsum + asum + 4) >> 3
                    elif aa:
                        v = (asum + 2) >> 2
                    elif al:
                        v = (lsum + 2) >> 2
                    else:
                        v = 128
                elif qx > qy:  # top-right: prefer above
                    v = (asum + 2) >> 2 if aa else (
                        (lsum + 2) >> 2 if al else 128)
                else:  # bottom-left: prefer left
                    v = (lsum + 2) >> 2 if al else (
                        (asum + 2) >> 2 if aa else 128)
                p[qy:qy + 4, qx:qx + 4] = v
    elif mode == 1:
        if not al:
            raise ValueError("chroma H pred without left neighbour")
        p[:] = L[:, None]
    elif mode == 2:
        if not aa:
            raise ValueError("chroma V pred without above neighbour")
        p[:] = A
    elif mode == 3:
        if not (al and aa):
            raise ValueError("chroma plane pred without both neighbours")
        X = int(cp[py - 1, px - 1])
        hh = sum((x + 1) * (int(A[4 + x])
                            - (int(A[2 - x]) if 2 - x >= 0 else X))
                 for x in range(4))
        vv = sum((y + 1) * (int(L[4 + y])
                            - (int(L[2 - y]) if 2 - y >= 0 else X))
                 for y in range(4))
        a = 16 * (int(L[7]) + int(A[7]))
        b = (17 * hh + 16) >> 5
        c = (17 * vv + 16) >> 5
        yy, xx = np.mgrid[0:8, 0:8]
        p[:] = np.clip((a + b * (xx - 3) + c * (yy - 3) + 16) >> 5, 0, 255)
    else:
        raise ValueError(f"bad chroma pred mode {mode}")
    return p


def _pick_chroma_mode(crec, csrc_mb, cmx, cmy, al, aa):
    """Encoder chroma-mode decision (r7): best SSD over the available
    modes {DC, H, V, plane}, DC-first tie-break so flat (gray) sources
    keep emitting mode 0 and reproduce the earlier bitstreams."""
    best = None
    for mode in (0, 1, 2, 3):
        if mode == 1 and not al:
            continue
        if mode == 2 and not aa:
            continue
        if mode == 3 and not (al and aa):
            continue
        pred = np.stack([_pred_chroma8(crec[ci], cmx, cmy, mode, al, aa)
                         for ci in range(2)])
        ssd = int(((csrc_mb.astype(np.int32) - pred) ** 2).sum())
        if best is None or ssd < best[0]:
            best = (ssd, mode, pred)
    return best[1], best[2]


def _interp_chroma(cref: np.ndarray, px: int, py: int, mvx: int, mvy: int,
                   w: int = 8, h: int = 8, wp=None) -> np.ndarray:
    """8.4.2.2.2: w x h chroma MC block on the half-res plane. The luma
    quarter-pel MV is an eighth-pel chroma MV; bilinear weights with
    (+32)>>6 rounding, edge-clamped. `wp` = (w, o, logWD) applies the
    explicit weighted-prediction transform AFTER interpolation
    (8.4.2.3.2 — the two do not commute on fractional positions)."""
    H, W = cref.shape
    ix, fx = mvx >> 3, mvx & 7
    iy, fy = mvy >> 3, mvy & 7
    x0, y0 = px + ix, py + iy
    xs = np.clip(np.arange(x0, x0 + w + 1), 0, W - 1)
    ys = np.clip(np.arange(y0, y0 + h + 1), 0, H - 1)
    win = cref[np.ix_(ys, xs)].astype(np.int32)
    A = win[:h, :w]
    B = win[:h, 1:]
    C = win[1:, :w]
    D = win[1:, 1:]
    out = ((8 - fx) * (8 - fy) * A + fx * (8 - fy) * B
           + (8 - fx) * fy * C + fx * fy * D + 32) >> 6
    return _wp_apply(out, wp)


def _encode_chroma_mb(csrc, cpred, qp_y, intra, max_coeffs=15):
    """Quantize one MB's chroma residual (both components).

    csrc/cpred: (2, 8, 8) source and prediction.
    Returns (cbpc, per-component dict) where each component carries the
    2x2 DC levels, the 4 AC level blocks, and the RECONSTRUCTED 8x8 —
    built with the decoder's exact dequant path, so decode == recon."""
    qc = _qpc(qp_y)
    comps = []
    any_dc = any_ac = False
    for ci in range(2):
        resid = csrc[ci].astype(np.int32) - cpred[ci]
        dcs = np.empty((2, 2), np.int64)
        acs = []
        for blk in range(4):
            ox, oy = (blk % 2) * 4, (blk // 2) * 4
            wblk = _fwd4(resid[oy:oy + 4, ox:ox + 4])
            dcs[blk // 2, blk % 2] = wblk[0, 0]
            lv = wblk.copy()
            lv[0, 0] = 0
            lv = _thin(_quant4(lv, qc, intra=intra), max_coeffs)
            lv[0, 0] = 0  # DC rides in the 2x2 Hadamard block
            acs.append(lv)
        dc_lv = _quant_dc2(_H2.astype(np.int64) @ dcs @ _H2, qc,
                           intra=intra)
        any_dc |= bool(np.any(dc_lv))
        any_ac |= any(np.any(a) for a in acs)
        comps.append({"dc": dc_lv, "ac": acs})
    cbpc = 2 if any_ac else (1 if any_dc else 0)
    # reconstruct exactly like the decoder, honouring cbpc semantics
    for ci in range(2):
        c = comps[ci]
        dcv = (_dequant_dc2(c["dc"], qc) if cbpc >= 1
               else np.zeros((2, 2), np.int64))
        rec = cpred[ci].copy()
        nnz_blk = []
        for blk in range(4):
            ox, oy = (blk % 2) * 4, (blk // 2) * 4
            if cbpc == 2:
                d = _dequant4(c["ac"][blk], qc)
                nnz_blk.append(int(np.count_nonzero(c["ac"][blk])))
            else:
                d = np.zeros((4, 4), np.int64)
                nnz_blk.append(0)
            d[0, 0] = dcv[blk // 2, blk % 2]
            rec[oy:oy + 4, ox:ox + 4] += _inv4(d).astype(np.int32)
        np.clip(rec, 0, 255, rec)
        c["recon"] = rec.astype(np.uint8)
        c["nnz"] = nnz_blk
    return cbpc, comps


def _write_chroma_residual(bw, cbpc, comps, nnz_c, mx, my):
    """CAVLC chroma residual serialization (DC both components, then AC
    both components) + TotalCoeff context upkeep — the exact mirror of
    _decode_chroma_residual / _parse_chroma_residual."""
    if cbpc == 0:
        nnz_c[:, my * 2:my * 2 + 2, mx * 2:mx * 2 + 2] = 0
        return
    for ci in range(2):
        _encode_residual(bw, _scan_cdc(comps[ci]["dc"]), -1)
    if cbpc == 2:
        for ci in range(2):
            for blk in range(4):
                bx, by = mx * 2 + blk % 2, my * 2 + blk // 2
                nc = _nc_chroma(nnz_c[ci], bx, by)
                _encode_residual(bw, _scan15(comps[ci]["ac"][blk]), nc)
                nnz_c[ci, by, bx] = comps[ci]["nnz"][blk]
    else:
        nnz_c[:, my * 2:my * 2 + 2, mx * 2:mx * 2 + 2] = 0


def _decode_chroma_residual(r, cbpc, nnz_c, mx, my, qp_y):
    """Parse one MB's chroma residual and return the (2, 8, 8) int32
    RESIDUAL planes (inverse-transformed, ready to add to the chroma
    prediction). Replaces the parse-only path now that chroma pixels
    reconstruct for real (r7)."""
    out = np.zeros((2, 8, 8), np.int32)
    if cbpc == 0:
        nnz_c[:, my * 2:my * 2 + 2, mx * 2:mx * 2 + 2] = 0
        return out
    qc = _qpc(qp_y)
    dcvs = []
    for _ci in range(2):
        dc_lv = _unscan_cdc(_decode_residual(r, -1, 4))
        dcvs.append(_dequant_dc2(dc_lv, qc))
    for ci in range(2):
        for blk in range(4):
            ox, oy = (blk % 2) * 4, (blk // 2) * 4
            bx, by = mx * 2 + blk % 2, my * 2 + blk // 2
            if cbpc == 2:
                nc = _nc_chroma(nnz_c[ci], bx, by)
                lv = _unscan15(_decode_residual(r, nc, 15))
                nnz_c[ci, by, bx] = int(np.count_nonzero(lv))
                d = _dequant4(lv, qc)
            else:
                nnz_c[ci, by, bx] = 0
                d = np.zeros((4, 4), np.int64)
            d[0, 0] = dcvs[ci][blk // 2, blk % 2]
            out[ci, oy:oy + 4, ox:ox + 4] = _inv4(d)
    return out


def _ref_list(ref):
    """Normalize a reference argument: a single FULL plane (or chroma
    pair) or an L0 list ordered most-recent-first (RefPicList0 for the
    in-repo sliding-window streams) -> list."""
    return list(ref) if isinstance(ref, (list, tuple)) else [ref]


# ------------------------------------------ weighted prediction (8.4.2.3.2)
def _wp_apply(pred, wp):
    """Explicit single-list weighted sample prediction on an
    interpolated block: Clip1(((pred * w + 2^(logWD-1)) >> logWD) + o)
    for logWD >= 1, Clip1(pred * w + o) otherwise. numpy's >> is an
    arithmetic shift, matching the spec's on negative products."""
    if wp is None:
        return pred
    w_, o_, d_ = wp
    if d_ >= 1:
        out = ((pred * w_ + (1 << (d_ - 1))) >> d_) + o_
    else:
        out = pred * w_ + o_
    return np.clip(out, 0, 255)


def _resolve_wp(tab, nrefs):
    """pred_weight_table dict -> (wl, wc): per-L0-ref luma (w, o, logWD)
    and per-component chroma weight tuples; None entries mean the
    flag-0 default = exact identity, so weighting is skipped there."""
    if tab is None:
        return None
    ld, cd = tab["ld"], tab["cd"]
    wl = [None if e is None else (e[0], e[1], ld) for e in tab["luma"]]
    wc = [None if e is None else tuple((cw, co, cd) for cw, co in e)
          for e in tab["chroma"]]
    wl += [None] * (nrefs - len(wl))
    wc += [None] * (nrefs - len(wc))
    return wl, wc


def _wpl(mvs, ridx):
    """Luma weight tuple for reference `ridx` (None = unweighted)."""
    return mvs.wp[0][ridx] if mvs.wp is not None else None


def _wpc(mvs, ridx, ci):
    """Chroma weight tuple for reference `ridx`, component `ci`."""
    if mvs.wp is None or mvs.wp[1][ridx] is None:
        return None
    return mvs.wp[1][ridx][ci]


def _write_pred_weight_table(bw, tab, nrefs):
    """pred_weight_table (7.3.3.2) for a P slice with nrefs active L0
    references; None entries write flag 0 (default weights)."""
    bw.ue(tab["ld"])
    bw.ue(tab["cd"])
    for ri in range(nrefs):
        lu = tab["luma"][ri] if ri < len(tab["luma"]) else None
        bw.u(1 if lu is not None else 0, 1)
        if lu is not None:
            bw.se(lu[0])
            bw.se(lu[1])
        chp = tab["chroma"][ri] if ri < len(tab["chroma"]) else None
        bw.u(1 if chp is not None else 0, 1)
        if chp is not None:
            for cw, co in chp:
                bw.se(cw)
                bw.se(co)


def _parse_pred_weight_table(r, nrefs):
    ld = r.ue()
    cd = r.ue()
    if ld > 7 or cd > 7:
        raise ValueError("bad pred_weight_table denom")
    luma, chroma = [], []
    for _ in range(nrefs):
        if r.u(1):
            w_, o_ = r.se(), r.se()
            if not (-128 <= w_ <= 127 and -128 <= o_ <= 127):
                raise ValueError("luma weight/offset out of range")
            luma.append((w_, o_))
        else:
            luma.append(None)
        if r.u(1):
            pair = []
            for _ci in range(2):
                cw, co = r.se(), r.se()
                if not (-128 <= cw <= 127 and -128 <= co <= 127):
                    raise ValueError("chroma weight/offset out of range")
                pair.append((cw, co))
            chroma.append(tuple(pair))
        else:
            chroma.append(None)
    return {"ld": ld, "cd": cd, "luma": luma, "chroma": chroma}


def _estimate_wp(src, refs, chroma=None, crefs=None, d=6):
    """Per-reference least-squares gain/offset (fade detection): the
    slice-level (w, o) minimizing |src - (w*ref/2^d + o)|^2, kept only
    when it beats the unweighted zero-motion error by >= 2%. Returns a
    pred_weight_table dict (entries None where identity wins)."""
    a = np.asarray(src, np.float64)
    out_l, out_c = [], []
    for ri, rp in enumerate(refs):
        rwin = rp[:a.shape[0], :a.shape[1]].astype(np.float64)
        var = float(rwin.var())
        gain = (float(((a - a.mean()) * (rwin - rwin.mean())).mean()) / var
                if var > 1.0 else 1.0)
        w_ = max(-128, min(127, int(round(gain * (1 << d)))))
        o_ = max(-128, min(127, int(round(float(a.mean())
                                          - w_ * float(rwin.mean())
                                          / (1 << d)))))
        ent = None
        if (w_, o_) != (1 << d, 0):
            ri32 = rp[:a.shape[0], :a.shape[1]].astype(np.int32)
            base = float(np.abs(a - ri32).mean())
            wmae = float(np.abs(a - _wp_apply(ri32, (w_, o_, d))).mean())
            if wmae < 0.98 * base:
                ent = (w_, o_)
        out_l.append(ent)
        cent = None
        if chroma is not None and crefs is not None and ri < len(crefs):
            pair = []
            for ci in range(2):
                cs = np.asarray(chroma[ci], np.float64)
                cr = crefs[ri][ci][:cs.shape[0], :cs.shape[1]]
                crf = cr.astype(np.float64)
                cvar = float(crf.var())
                cgain = (float(((cs - cs.mean()) * (crf - crf.mean())).mean())
                         / cvar if cvar > 1.0 else 1.0)
                cw = max(-128, min(127, int(round(cgain * (1 << d)))))
                co = max(-128, min(127, int(round(float(cs.mean())
                                                  - cw * float(crf.mean())
                                                  / (1 << d)))))
                pair.append((cw, co))
            if any(p != (1 << d, 0) for p in pair):
                cent = tuple(pair)
        out_c.append(cent)
    return {"ld": d, "cd": d, "luma": out_l, "chroma": out_c}


# --------------------------------- implicit weighted bi-prediction (8.4.2.3.1)
# Active B-slice bi-pred weights, constant per slice (one L0 + one L1
# reference in this profile, so (w0, w1) is a slice-level pair). A
# module global rather than a threaded parameter: the blend has ~15
# call sites across both entropy modes' encoders AND decoders, and
# every B entry point installs it unconditionally (never relies on a
# previous slice's value), so there is no leak path. Codec calls are
# single-threaded within a Python worker process.
_BIPRED: tuple | None = None


def _set_bipred(w) -> None:
    global _BIPRED
    _BIPRED = w


# --------------------------------------- multi-slice pictures (r7, 7.3.3/7.4.3)
# Active slice's first macroblock ROW. Neighbour availability (intra
# prediction, nC contexts, MV prediction, CABAC ctxIdxInc) treats
# macroblocks above this row as unavailable — the 8.x "neighbouring
# macroblock in a different slice" rule, specialized to the in-repo
# restriction that slices cover whole MB rows (first_mb_in_slice is a
# multiple of PicWidthInMbs; arbitrary offsets raise a ValueError at
# parse). Module global by the same single-threaded-worker argument as
# _BIPRED: every slice entry point (encoders AND decoders, both entropy
# modes) sets it unconditionally, so no value leaks between slices.
_SLICE_TOP = 0


def _set_slice_top(row: int) -> None:
    global _SLICE_TOP
    _SLICE_TOP = row


def _implicit_bipred_weights(cur_poc: int, poc0: int, poc1: int) -> tuple:
    """8.4.2.3.1 implicit mode: (w0, w1) with logWD = 5 derived from POC
    distances — the same tb/td/DistScaleFactor math temporal direct
    uses (8.4.1.2.3). Degenerate geometry (references sharing a POC, or
    w1 outside [-64, 128]) falls back to the (32, 32) default exactly
    as the spec directs; long-term references don't exist in this
    profile so that guard is vacuous."""
    td = min(127, max(-128, poc1 - poc0))
    if td == 0:
        return (32, 32)
    tb = min(127, max(-128, cur_poc - poc0))
    tx = _div_trunc(16384 + abs(td) // 2, td)
    dsf = min(1023, max(-1024, (tb * tx + 32) >> 6))
    w1 = dsf >> 2
    if w1 < -64 or w1 > 128:
        return (32, 32)
    return (64 - w1, w1)


def _biblend(a, b):
    """Bi-predictive sample blend under the active slice weights
    (8.4.2.3.2): default = (a + b + 1) >> 1; implicit (w0, w1) = the
    logWD-5 weighted average. Offsets are 0 and w0 + w1 == 64 in
    implicit mode, so the default IS the w0 = w1 = 32 special case
    bit-exactly. Inputs are interpolator outputs, already clipped to
    [0, 255]; negative implicit weights can overshoot, hence Clip1."""
    if _BIPRED is None:
        return (a + b + 1) >> 1
    w0, w1 = _BIPRED
    return np.clip((a * w0 + b * w1 + 32) >> 6, 0, 255)


class _ChromaState:
    """Per-slice chroma decode state: recon planes (start at mid-grey,
    as intra DC prediction with no neighbours yields), per-component AC
    TotalCoeff grid for CAVLC nC, and the reference chroma planes for
    inter slices."""

    def __init__(self, mbw, mbh, ref=None, ref2=None):
        self.planes = np.full((2, mbh * 8, mbw * 8), 128, np.uint8)
        self.nnz = np.zeros((2, mbh * 2, mbw * 2), np.int32)
        # `ref` may be one (2, h/2, w/2) plane pair or an L0 LIST of
        # them (multi-reference P slices, r7); refl is the list view
        self.refl = _ref_list(ref) if ref is not None else None
        self.ref = self.refl[0] if self.refl else None
        self.ref2 = ref2

    def mc(self, ci, mx, my, mv, which=0, ridx=0, wp=None):
        ref = self.ref2 if which == 1 else self.refl[ridx]
        return _interp_chroma(ref[ci], mx * 8, my * 8, mv[0], mv[1], wp=wp)

    def store(self, ci, mx, my, block):
        self.planes[ci, my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = \
            np.clip(block, 0, 255).astype(np.uint8)


# --------------------------------------------------------- CAVLC residual
def _write_vlc(bw: _BitWriter, entry: tuple[int, int]) -> None:
    bw.u(entry[1], entry[0])


def _ct_key(nC: int) -> int:
    if nC < 0:
        return -1
    if nC < 2:
        return 0
    if nC < 4:
        return 1
    if nC < 8:
        return 2
    return 8  # FLC


def _write_coeff_token(bw: _BitWriter, nC: int, tc: int, t1: int) -> None:
    k = _ct_key(nC)
    if k == 8:
        # 6-bit FLC: (TotalCoeff-1)<<2 | TrailingOnes, except TC=0 -> 3
        bw.u(3 if tc == 0 else ((tc - 1) << 2) | t1, 6)
    else:
        _write_vlc(bw, _CT_TABLES[k][(tc, t1)])


def _read_coeff_token(r: _BitReader, nC: int) -> tuple[int, int]:
    k = _ct_key(nC)
    if k == 8:
        v = r.u(6)
        if v == 3:
            return 0, 0
        return (v >> 2) + 1, v & 3
    return _read_vlc(r, _VLC_DEC[("ct", k)])


def _encode_residual(bw: _BitWriter, scan: list[int], nC: int) -> int:
    """Coefficients in scan order -> CAVLC bits. Returns TotalCoeff."""
    n = len(scan)
    nz = [i for i, v in enumerate(scan) if v]
    tc = len(nz)
    t1 = 0
    while t1 < min(3, tc) and abs(scan[nz[tc - 1 - t1]]) == 1:
        t1 += 1
    _write_coeff_token(bw, nC, tc, t1)
    if tc == 0:
        return 0
    for i in range(t1):  # trailing-one signs, high freq first
        bw.u(1 if scan[nz[tc - 1 - i]] < 0 else 0, 1)
    sl = 1 if tc > 10 and t1 < 3 else 0
    rest = [scan[j] for j in reversed(nz[: tc - t1])]
    for i, v in enumerate(rest):
        lc = 2 * v - 2 if v > 0 else -2 * v - 1
        if i == 0 and t1 < 3:
            lc -= 2
        if sl == 0 and lc < 14:
            bw.u(0, lc)
            bw.u(1, 1)
        elif sl == 0 and lc < 30:
            bw.u(0, 14)
            bw.u(1, 1)
            bw.u(lc - 14, 4)
        elif sl > 0 and lc < (15 << sl):
            bw.u(0, lc >> sl)
            bw.u(1, 1)
            bw.u(lc & ((1 << sl) - 1), sl)
        else:
            # escape: prefix 15 carries a 12-bit suffix; larger levels use
            # the level_prefix >= 16 extension (suffix width prefix-3,
            # offset (1<<(prefix-3)) - 4096) — mirrors the decoder exactly
            rem = lc - 30 if sl == 0 else lc - (15 << sl)
            if rem < 4096:
                bw.u(0, 15)
                bw.u(1, 1)
                bw.u(rem, 12)
            else:
                p = (rem + 4096).bit_length() + 2
                bw.u(0, p)
                bw.u(1, 1)
                bw.u(rem + 4096 - (1 << (p - 3)), p - 3)
        if sl == 0:
            sl = 1
        if abs(v) > (3 << (sl - 1)) and sl < 6:
            sl += 1
    tz = nz[-1] + 1 - tc  # zeros before the last nonzero
    if tc < n:
        if nC < 0:
            _write_vlc(bw, _TZ_CDC_TABLES[tc][tz])
        else:
            _write_vlc(bw, _TZ_TABLES[tc][tz])
    zeros_left = tz
    for j in range(tc - 1, 0, -1):  # runs, high freq first
        if zeros_left <= 0:
            break
        run = nz[j] - nz[j - 1] - 1
        _write_vlc(bw, _RB_TABLES[min(zeros_left, 7)][run])
        zeros_left -= run
    return tc


def _decode_residual(r: _BitReader, nC: int, n: int) -> list[int]:
    """CAVLC bits -> coefficients in scan order (length n)."""
    tc, t1 = _read_coeff_token(r, nC)
    out = [0] * n
    if tc == 0:
        return out
    if tc > n:
        raise ValueError("corrupt CAVLC: TotalCoeff > maxNumCoeff")
    levels = []
    for _ in range(t1):
        levels.append(-1 if r.u(1) else 1)
    sl = 1 if tc > 10 and t1 < 3 else 0
    for i in range(tc - t1):
        prefix = 0
        while r.u(1) == 0:
            prefix += 1
            if prefix > 31:
                raise ValueError("corrupt CAVLC level prefix")
        size = sl
        if prefix == 14 and sl == 0:
            size = 4
        elif prefix >= 15:
            size = prefix - 3
        lc = min(15, prefix) << sl
        if size:
            lc += r.u(size)
        if prefix >= 15 and sl == 0:
            lc += 15
        if prefix >= 16:
            lc += (1 << (prefix - 3)) - 4096
        if i == 0 and t1 < 3:
            lc += 2
        v = (lc + 2) >> 1 if lc % 2 == 0 else (-lc - 1) >> 1
        levels.append(v)
        if sl == 0:
            sl = 1
        if abs(v) > (3 << (sl - 1)) and sl < 6:
            sl += 1
    if tc < n:
        if nC < 0:
            tz = _read_vlc(r, _VLC_DEC[("tzc", tc)])
        else:
            tz = _read_vlc(r, _VLC_DEC[("tz", tc)])
    else:
        tz = 0
    zeros_left = tz
    runs = []
    for i in range(tc - 1):
        if zeros_left > 0:
            run = _read_vlc(r, _VLC_DEC[("rb", min(zeros_left, 7))])
        else:
            run = 0
        runs.append(run)
        zeros_left -= run
    runs.append(zeros_left)
    idx = tc + tz - 1
    for i, v in enumerate(levels):
        if idx < 0 or idx >= n:
            raise ValueError("corrupt CAVLC run/zeros")
        out[idx] = v
        idx -= 1 + runs[i]
    return out


def _scan16(block: np.ndarray) -> list[int]:
    flat = block.ravel()
    return [int(flat[z]) for z in _ZIGZAG]


def _unscan16(scan: list[int]) -> np.ndarray:
    out = np.zeros(16, np.int32)
    for s, z in enumerate(_ZIGZAG):
        out[z] = scan[s]
    return out.reshape(4, 4)


def _scan15(block: np.ndarray) -> list[int]:
    flat = block.ravel()
    return [int(flat[z]) for z in _ZIGZAG[1:]]


def _unscan15(scan: list[int]) -> np.ndarray:
    out = np.zeros(16, np.int32)
    for s, z in enumerate(_ZIGZAG[1:]):
        out[z] = scan[s]
    return out.reshape(4, 4)


# --------------------------------------------------------- intra prediction
def _pred4(plane, px, py, mode, al, aa, aar, aal):
    """8.3.1.2: one 4x4 luma intra prediction (int32 4x4)."""
    L = plane[py:py + 4, px - 1].astype(np.int32) if al else None
    A = plane[py - 1, px:px + 4].astype(np.int32) if aa else None
    X = int(plane[py - 1, px - 1]) if aal else 0
    if aa:
        if aar:
            AR = plane[py - 1, px + 4:px + 8].astype(np.int32)
        else:
            AR = np.full(4, int(A[3]), np.int32)
        A8 = np.concatenate([A, AR])
    # corrupt streams can request a directional mode whose neighbours are
    # unavailable (conformant ones never do, 8.3.1.2.1) — errors-as-data
    if mode in (3, 7) and not aa:
        raise ValueError(f"intra mode {mode} without above neighbour")
    if mode in (4, 5, 6) and not (aa and al):
        raise ValueError(f"intra mode {mode} without both neighbours")
    if mode == 8 and not al:
        raise ValueError("intra mode 8 without left neighbour")
    p = np.empty((4, 4), np.int32)
    if mode == 0:  # vertical
        if not aa:
            raise ValueError("intra mode 0 without above neighbour")
        p[:] = A
    elif mode == 1:  # horizontal
        if not al:
            raise ValueError("intra mode 1 without left neighbour")
        p[:] = L[:, None]
    elif mode == 2:  # DC
        if aa and al:
            p[:] = (int(A.sum()) + int(L.sum()) + 4) >> 3
        elif aa:
            p[:] = (int(A.sum()) + 2) >> 2
        elif al:
            p[:] = (int(L.sum()) + 2) >> 2
        else:
            p[:] = 128
    elif mode == 3:  # diagonal down-left
        for y in range(4):
            for x in range(4):
                if x == 3 and y == 3:
                    p[y, x] = (A8[6] + 3 * A8[7] + 2) >> 2
                else:
                    p[y, x] = (A8[x + y] + 2 * A8[x + y + 1]
                               + A8[x + y + 2] + 2) >> 2
    elif mode == 4:  # diagonal down-right
        for y in range(4):
            for x in range(4):
                if x > y:
                    p[y, x] = (A8[x - y - 2] + 2 * A8[x - y - 1]
                               + A8[x - y] + 2) >> 2
                elif x < y:
                    p[y, x] = (L[y - x - 2] + 2 * L[y - x - 1]
                               + L[y - x] + 2) >> 2
                else:
                    p[y, x] = (A8[0] + 2 * X + L[0] + 2) >> 2
    elif mode == 5:  # vertical-right
        for y in range(4):
            for x in range(4):
                z = 2 * x - y
                if z >= 0 and z % 2 == 0:
                    p[y, x] = (A8[x - (y >> 1) - 1] + A8[x - (y >> 1)] + 1) >> 1
                elif z >= 0:
                    p[y, x] = (A8[x - (y >> 1) - 2] + 2 * A8[x - (y >> 1) - 1]
                               + A8[x - (y >> 1)] + 2) >> 2
                elif z == -1:
                    p[y, x] = (L[0] + 2 * X + A8[0] + 2) >> 2
                else:
                    p[y, x] = (L[y - 1] + 2 * L[y - 2] + L[y - 3] + 2) >> 2
    elif mode == 6:  # horizontal-down
        for y in range(4):
            for x in range(4):
                z = 2 * y - x
                if z >= 0 and z % 2 == 0:
                    p[y, x] = (L[y - (x >> 1) - 1] + L[y - (x >> 1)] + 1) >> 1
                elif z >= 0:
                    p[y, x] = (L[y - (x >> 1) - 2] + 2 * L[y - (x >> 1) - 1]
                               + L[y - (x >> 1)] + 2) >> 2
                elif z == -1:
                    p[y, x] = (A8[0] + 2 * X + L[0] + 2) >> 2
                else:
                    p[y, x] = (A8[x - 1] + 2 * A8[x - 2] + A8[x - 3] + 2) >> 2
    elif mode == 7:  # vertical-left
        for y in range(4):
            for x in range(4):
                if y % 2 == 0:
                    p[y, x] = (A8[x + (y >> 1)] + A8[x + (y >> 1) + 1] + 1) >> 1
                else:
                    p[y, x] = (A8[x + (y >> 1)] + 2 * A8[x + (y >> 1) + 1]
                               + A8[x + (y >> 1) + 2] + 2) >> 2
    elif mode == 8:  # horizontal-up
        for y in range(4):
            for x in range(4):
                z = x + 2 * y
                if z < 13 and z % 2 == 0:
                    p[y, x] = (L[y + (x >> 1)] + L[y + (x >> 1) + 1] + 1) >> 1
                elif z < 13:
                    p[y, x] = (L[y + (x >> 1)] + 2 * L[y + (x >> 1) + 1]
                               + L[y + (x >> 1) + 2] + 2) >> 2
                elif z == 13:
                    p[y, x] = (L[2] + 3 * L[3] + 2) >> 2
                else:
                    p[y, x] = L[3]
    else:
        raise ValueError(f"bad intra 4x4 mode {mode}")
    return p


def _pred16(plane, mx, my, mode, al, aa):
    """8.3.3: 16x16 luma intra prediction (int32 16x16)."""
    px, py = mx * 16, my * 16
    L = plane[py:py + 16, px - 1].astype(np.int32) if al else None
    A = plane[py - 1, px:px + 16].astype(np.int32) if aa else None
    p = np.empty((16, 16), np.int32)
    if mode == 0:
        if not aa:
            raise ValueError("I16 mode 0 without above neighbour")
        p[:] = A
    elif mode == 1:
        if not al:
            raise ValueError("I16 mode 1 without left neighbour")
        p[:] = L[:, None]
    elif mode == 2:
        if aa and al:
            p[:] = (int(A.sum()) + int(L.sum()) + 16) >> 5
        elif aa:
            p[:] = (int(A.sum()) + 8) >> 4
        elif al:
            p[:] = (int(L.sum()) + 8) >> 4
        else:
            p[:] = 128
    elif mode == 3:
        if not (aa and al):
            raise ValueError("I16 plane mode without neighbours")
        X = int(plane[py - 1, px - 1])
        hh = sum((x + 1) * (int(A[8 + x]) - (int(A[6 - x]) if 6 - x >= 0 else X))
                 for x in range(8))
        vv = sum((y + 1) * (int(L[8 + y]) - (int(L[6 - y]) if 6 - y >= 0 else X))
                 for y in range(8))
        a = 16 * (int(L[15]) + int(A[15]))
        b = (5 * hh + 32) >> 6
        c = (5 * vv + 32) >> 6
        for y in range(16):
            for x in range(16):
                p[y, x] = min(255, max(0, (a + b * (x - 7) + c * (y - 7)
                                           + 16) >> 5))
    else:
        raise ValueError(f"bad I16 pred mode {mode}")
    return p


def encode_idr_ipcm(gray: np.ndarray,
                    chroma: np.ndarray | None = None) -> bytes:
    """One frame -> IDR slice RBSP, all macroblocks I_PCM (bit-exact;
    `chroma` (2, h/2, w/2) writes real Cb/Cr samples, None writes
    constant 128)."""
    a = np.asarray(gray, np.uint8)
    h, w = a.shape
    mbw = -(-w // 16)
    mbh = -(-h // 16)
    pad = np.pad(a, ((0, mbh * 16 - h), (0, mbw * 16 - w)), mode="edge")
    cpad = _pad_chroma(chroma, mbw, mbh, h, w)
    bw = _BitWriter()
    bw.ue(0)      # first_mb_in_slice
    bw.ue(7)      # slice_type: I (all slices in picture)
    bw.ue(0)      # pps_id
    bw.u(0, 4)    # frame_num
    bw.ue(0)      # idr_pic_id
    # pic_order_cnt_type 2: nothing; dec_ref_pic_marking (IDR):
    bw.u(0, 1)    # no_output_of_prior_pics
    bw.u(0, 1)    # long_term_reference
    bw.se(0)      # slice_qp_delta
    for my in range(mbh):
        for mx in range(mbw):
            bw.ue(25)  # mb_type I_PCM
            bw.align()  # pcm_alignment_zero_bit(s)
            mb = pad[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16]
            bw.raw(mb.tobytes())
            for ci in range(2):  # Cb then Cr samples
                bw.raw(cpad[ci, my * 8:my * 8 + 8,
                            mx * 8:mx * 8 + 8].tobytes())
    bw.rbsp_trailing()
    return bytes(bw.buf)


def _mb_avail(blk, px, py, plane_w):
    """(left, above, above-right, above-left) availability for the 4x4
    luma block `blk` whose top-left sample is (px, py). Neighbours
    above the current slice's first MB row are unavailable (multi-
    slice pictures, r7: _SLICE_TOP is the active slice's top row)."""
    top = _SLICE_TOP * 16
    al = px > 0
    aa = py > top
    aal = al and aa
    if blk in _AR_OK_IN_MB:
        aar = True
    elif blk in (3, 7, 11, 13, 15):
        aar = False
    else:  # top row of the MB: needs the above MB row, within the plane
        aar = py > top and px + 8 <= plane_w
    return al, aa, aar, aal


def _mb_avail8(b8, px, py, plane_w):
    """(left, above, above-right, above-left) availability for the 8x8
    luma block `b8` (Z order) whose top-left sample is (px, py) — the
    8x8 analog of _mb_avail (8.3.2.2 neighbour derivation). b8 2's
    above-right lies in this MB's already-decoded top-right 8x8; b8 3's
    is the not-yet-decoded MB to the right."""
    top = _SLICE_TOP * 16
    al = px > 0
    aa = py > top
    aal = al and aa
    if b8 == 2:
        aar = True
    elif b8 == 3:
        aar = False
    else:  # top row of the MB: needs the above MB row, within the plane
        aar = aa and px + 16 <= plane_w
    return al, aa, aar, aal


def _pred8(plane, px, py, mode, al, aa, aar, aal):
    """8.3.2.2: one 8x8 luma intra prediction (int64 8x8). Reference
    samples are low-pass filtered FIRST (8.3.2.2.1, from the original
    unfiltered neighbours), then the nine mode formulas (8.3.2.2.2-.10)
    read only the filtered arrays. Unavailable above-right samples are
    substituted with p[7,-1] before filtering, like the 4x4 path."""
    if mode in (0, 3, 7) and not aa:
        raise ValueError(f"intra 8x8 mode {mode} without above neighbour")
    if mode in (1, 8) and not al:
        raise ValueError(f"intra 8x8 mode {mode} without left neighbour")
    if mode in (4, 5, 6) and not (aa and al):
        raise ValueError(f"intra 8x8 mode {mode} without both neighbours")
    L = plane[py:py + 8, px - 1].astype(np.int64) if al else None
    X = int(plane[py - 1, px - 1]) if aal else 0
    Af = Lf = None
    Xf = 0
    if aa:
        A = plane[py - 1, px:px + 8].astype(np.int64)
        if aar:
            AR = plane[py - 1, px + 8:px + 16].astype(np.int64)
        else:
            AR = np.full(8, int(A[7]), np.int64)
        A16 = np.concatenate([A, AR])
        Af = np.empty(16, np.int64)
        first = X if aal else int(A16[0])
        Af[0] = (first + 2 * A16[0] + A16[1] + 2) >> 2
        Af[1:15] = (A16[0:14] + 2 * A16[1:15] + A16[2:16] + 2) >> 2
        Af[15] = (A16[14] + 3 * A16[15] + 2) >> 2
    if al:
        Lf = np.empty(8, np.int64)
        first = X if aal else int(L[0])
        Lf[0] = (first + 2 * L[0] + L[1] + 2) >> 2
        Lf[1:7] = (L[0:6] + 2 * L[1:7] + L[2:8] + 2) >> 2
        Lf[7] = (L[6] + 3 * L[7] + 2) >> 2
    if aal:  # in this geometry aal implies aa and al (kept spec-shaped)
        if aa and al:
            Xf = (int(A16[0]) + 2 * X + int(L[0]) + 2) >> 2
        elif aa:
            Xf = (3 * X + int(A16[0]) + 2) >> 2
        elif al:
            Xf = (3 * X + int(L[0]) + 2) >> 2
        else:
            Xf = X
    p = np.empty((8, 8), np.int64)
    if mode == 0:  # vertical
        p[:] = Af[:8]
    elif mode == 1:  # horizontal
        p[:] = Lf[:, None]
    elif mode == 2:  # DC (8.3.2.2.4)
        if aa and al:
            p[:] = (int(Af[:8].sum()) + int(Lf.sum()) + 8) >> 4
        elif aa:
            p[:] = (int(Af[:8].sum()) + 4) >> 3
        elif al:
            p[:] = (int(Lf.sum()) + 4) >> 3
        else:
            p[:] = 128
    elif mode == 3:  # diagonal down-left (8.3.2.2.5)
        for y in range(8):
            for x in range(8):
                if x == 7 and y == 7:
                    p[y, x] = (Af[14] + 3 * Af[15] + 2) >> 2
                else:
                    p[y, x] = (Af[x + y] + 2 * Af[x + y + 1]
                               + Af[x + y + 2] + 2) >> 2
    elif mode == 4:  # diagonal down-right (8.3.2.2.6)
        for y in range(8):
            for x in range(8):
                if x > y:
                    p[y, x] = (Af[x - y - 2] + 2 * Af[x - y - 1]
                               + Af[x - y] + 2) >> 2
                elif x < y:
                    p[y, x] = (Lf[y - x - 2] + 2 * Lf[y - x - 1]
                               + Lf[y - x] + 2) >> 2
                else:
                    p[y, x] = (Af[0] + 2 * Xf + Lf[0] + 2) >> 2
    elif mode == 5:  # vertical-right (8.3.2.2.7); Lx carries the
        # filtered corner at index 0 so z < -1 indexes stay in range
        Lx = np.concatenate([[Xf], Lf])
        for y in range(8):
            for x in range(8):
                z = 2 * x - y
                if z >= 0 and z % 2 == 0:
                    p[y, x] = (Af[x - (y >> 1) - 1] + Af[x - (y >> 1)]
                               + 1) >> 1
                elif z >= 0:
                    p[y, x] = (Af[x - (y >> 1) - 2]
                               + 2 * Af[x - (y >> 1) - 1]
                               + Af[x - (y >> 1)] + 2) >> 2
                elif z == -1:
                    p[y, x] = (Lf[0] + 2 * Xf + Af[0] + 2) >> 2
                else:
                    # z < -1: left-column taps at rows y-2x-1, y-2x-2,
                    # y-2x-3 (row -1 = the filtered corner, Lx[0])
                    k = y - 2 * x
                    p[y, x] = (Lx[k] + 2 * Lx[k - 1] + Lx[k - 2] + 2) >> 2
    elif mode == 6:  # horizontal-down (8.3.2.2.8, mirror of mode 5)
        T = np.concatenate([[Xf], Af])
        for y in range(8):
            for x in range(8):
                z = 2 * y - x
                if z >= 0 and z % 2 == 0:
                    p[y, x] = (Lf[y - (x >> 1) - 1] + Lf[y - (x >> 1)]
                               + 1) >> 1
                elif z >= 0:
                    p[y, x] = (Lf[y - (x >> 1) - 2]
                               + 2 * Lf[y - (x >> 1) - 1]
                               + Lf[y - (x >> 1)] + 2) >> 2
                elif z == -1:
                    p[y, x] = (Af[0] + 2 * Xf + Lf[0] + 2) >> 2
                else:
                    # z < -1: above-row taps at cols x-2y-1, x-2y-2,
                    # x-2y-3 (col -1 = the filtered corner, T[0])
                    k = x - 2 * y
                    p[y, x] = (T[k] + 2 * T[k - 1] + T[k - 2] + 2) >> 2
    elif mode == 7:  # vertical-left (8.3.2.2.9)
        for y in range(8):
            for x in range(8):
                if y % 2 == 0:
                    p[y, x] = (Af[x + (y >> 1)] + Af[x + (y >> 1) + 1]
                               + 1) >> 1
                else:
                    p[y, x] = (Af[x + (y >> 1)] + 2 * Af[x + (y >> 1) + 1]
                               + Af[x + (y >> 1) + 2] + 2) >> 2
    elif mode == 8:  # horizontal-up (8.3.2.2.10)
        for y in range(8):
            for x in range(8):
                z = x + 2 * y
                if z < 13 and z % 2 == 0:
                    p[y, x] = (Lf[y + (x >> 1)] + Lf[y + (x >> 1) + 1]
                               + 1) >> 1
                elif z < 13:
                    p[y, x] = (Lf[y + (x >> 1)] + 2 * Lf[y + (x >> 1) + 1]
                               + Lf[y + (x >> 1) + 2] + 2) >> 2
                elif z == 13:
                    p[y, x] = (Lf[6] + 3 * Lf[7] + 2) >> 2
                else:
                    p[y, x] = Lf[7]
    else:
        raise ValueError(f"bad intra 8x8 mode {mode}")
    return p


def _eval_mb_i8(plane, smb, mx, my, qp, plane_w):
    """Evaluate the I_8x8 candidate for an I_NxN macroblock (8.3.2.2):
    per-8x8 best-SSD mode over ALL available prediction modes (DC-first
    iteration with strict < keeps flat sources on DC — the gray-fixture
    bit-identity convention), intra-dead-zone 8x8 quantization,
    progressive in-MB reconstruction. Writes recon into `plane` (the
    caller restores the MB region if the 4x4 candidate wins) and
    returns (total_coeffs, [(mode, q8)] in 8x8 Z order, cbp8).
    Shared by the CAVLC and CABAC encoders."""
    blocks8, cbp8, n8 = [], 0, 0
    for b8 in range(4):
        ox8, oy8 = (b8 & 1) * 8, (b8 >> 1) * 8
        px, py = mx * 16 + ox8, my * 16 + oy8
        al, aa, aar, aal = _mb_avail8(b8, px, py, plane_w)
        sblk = smb[oy8:oy8 + 8, ox8:ox8 + 8].astype(np.int64)
        best = None
        for mode in (2, 0, 1, 3, 4, 5, 6, 7, 8):
            if mode in (0, 3, 7) and not aa:
                continue
            if mode in (1, 8) and not al:
                continue
            if mode in (4, 5, 6) and not (aa and al):
                continue
            pr = _pred8(plane, px, py, mode, al, aa, aar, aal)
            ssd = int(((sblk - pr) ** 2).sum())
            if best is None or ssd < best[0]:
                best = (ssd, mode, pr)
        _, mode, pred = best
        q8 = _quant8(_fwd8(sblk - pred), qp, intra=True)
        n8 += int(np.count_nonzero(q8))
        if np.any(q8):
            cbp8 |= 1 << b8
            rec = pred + _inv8(_dequant8(q8, qp))
        else:
            rec = pred
        np.clip(rec, 0, 255, rec)
        plane[py:py + 8, px:px + 8] = rec.astype(np.uint8)
        blocks8.append((mode, q8))
    return n8, blocks8, cbp8


def _pred_mode_for(modes, bx, by):
    """Predicted intra-4x4 mode (8.3.1.1): min(left, above); any
    unavailable or non-I4x4 neighbour counts as DC (2)."""
    ma = modes[by, bx - 1] if bx > 0 else -1
    mb = modes[by - 1, bx] if by > _SLICE_TOP * 4 else -1
    ma = 2 if ma < 0 else ma
    mb = 2 if mb < 0 else mb
    return min(ma, mb)


def _nc_luma(nnz, bx, by):
    a = int(nnz[by, bx - 1]) if bx > 0 else None
    b = int(nnz[by - 1, bx]) if by > _SLICE_TOP * 4 else None
    if a is not None and b is not None:
        return (a + b + 1) >> 1
    if a is not None:
        return a
    if b is not None:
        return b
    return 0


def _pad_chroma(chroma, mbw, mbh, h, w):
    """(2, ceil(h/2), ceil(w/2)) chroma source -> MB-grid-padded planes;
    None -> flat mid-grey (the gray-stream default, which quantizes to
    cbp_chroma 0 everywhere and reproduces the pre-r7 bitstreams)."""
    if chroma is None:
        return np.full((2, mbh * 8, mbw * 8), 128, np.uint8)
    c = np.asarray(chroma, np.uint8)
    h2, w2 = (h + 1) // 2, (w + 1) // 2
    assert c.shape == (2, h2, w2), f"chroma must be (2, {h2}, {w2})"
    return np.stack([np.pad(c[ci], ((0, mbh * 8 - h2), (0, mbw * 8 - w2)),
                            mode="edge") for ci in range(2)])


def _slice_ranges(mbh: int, slice_rows: int | None) -> list:
    """MB-row ranges for multi-slice encoding (r7): None = one slice
    covering the picture (the pre-r7 shape, bit-identical), N = one
    slice per N MB rows."""
    if slice_rows is None:
        return [(0, mbh)]
    if slice_rows < 1:
        raise ValueError("slice_rows must be >= 1")
    return [(r, min(r + slice_rows, mbh))
            for r in range(0, mbh, slice_rows)]


def encode_idr_cavlc(gray: np.ndarray, qp: int = 10, max_coeffs: int = 16,
                     deblock: bool = False, full_recon: bool = False,
                     poc_lsb: int | None = None,
                     chroma: np.ndarray | None = None,
                     slice_rows: int | None = None,
                     t8x8: bool = False):
    """One frame -> (IDR slice RBSP, reconstructed plane).

    CAVLC intra encoding: near-flat macroblocks go I_16x16 (DC pred,
    Hadamard-coded DC, zero AC); everything else I_4x4 with per-block
    best-of V/H/DC prediction and full CAVLC residuals. `chroma`
    (2, h/2, w/2) codes REAL 4:2:0 residuals (r7): chroma DC intra
    prediction, 2x2 Hadamard DC + AC levels, cbp_chroma in mb_type/cbp;
    None keeps the pre-r7 gray contract (cbp_chroma 0 throughout).
    Returns recon as luma, or (luma, chroma) when chroma was given.
    The returned recon is what ANY conformant decoder must produce —
    deblock=False writes disable_deblocking_filter_idc=1; deblock=True
    enables the in-loop filter (8.7) and returns the FILTERED plane
    (intra prediction still references unfiltered samples) — so
    decode == recon bit-exactly either way."""
    a = np.asarray(gray, np.uint8)
    h, w = a.shape
    mbw = -(-w // 16)
    mbh = -(-h // 16)
    src = np.pad(a, ((0, mbh * 16 - h), (0, mbw * 16 - w)), mode="edge")
    plane = np.zeros((mbh * 16, mbw * 16), np.uint8)
    plane_w = mbw * 16
    nnz = np.zeros((mbh * 4, mbw * 4), np.int32)
    modes = np.full((mbh * 4, mbw * 4), -1, np.int32)
    csrc = _pad_chroma(chroma, mbw, mbh, h, w)
    crec = np.full((2, mbh * 8, mbw * 8), 128, np.uint8)
    nnz_c = np.zeros((2, mbh * 2, mbw * 2), np.int32)
    ch = (csrc, crec, nnz_c)

    _set_t8(t8x8)  # High-profile PPS: I_NxN MBs carry the 8x8 flag (r7)
    t8m = np.zeros((mbh, mbw), np.int32) if t8x8 else None
    _set_t8map(t8m)  # per-MB flags feed the 8.7 edge derivation
    rbsps = []
    for r0, r1 in _slice_ranges(mbh, slice_rows):
        _set_slice_top(r0)
        bw = _BitWriter()
        bw.ue(r0 * mbw)  # first_mb_in_slice (multi-slice pictures, r7)
        bw.ue(7)      # slice_type: I (all slices in picture)
        bw.ue(0)      # pps_id
        bw.u(0, 4)    # frame_num
        bw.ue(0)      # idr_pic_id
        if poc_lsb is not None:  # poc_type-0 SPS (B-enabled streams)
            bw.u(poc_lsb & 0xFFFF, 16)
        bw.u(0, 1)    # no_output_of_prior_pics
        bw.u(0, 1)    # long_term_reference
        bw.se(qp - 26)  # slice_qp_delta (pic_init_qp is 26)
        # disable_deblocking_filter_idc (PPS carries the control flag)
        bw.ue(0 if deblock else 1)
        if deblock:
            bw.se(0)  # slice_alpha_c0_offset_div2
            bw.se(0)  # slice_beta_offset_div2

        for my in range(r0, r1):
            for mx in range(mbw):
                smb = src[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16]
                done = False
                if int(smb.max()) - int(smb.min()) <= 8:
                    done = _encode_mb_i16(bw, smb, plane, mx, my, qp, nnz,
                                          modes, max_coeffs, ch)
                if not done:
                    _encode_mb_i4(bw, smb, plane, mx, my, qp, nnz, modes,
                                  max_coeffs, plane_w, ch)
        bw.rbsp_trailing()
        rbsps.append(bytes(bw.buf))
    _set_slice_top(0)
    _set_t8(False)
    _set_t8map(None)
    out = plane
    if deblock and qp >= 16:
        out = _deblock_luma(plane, np.full((mbh, mbw), qp, np.int32),
                            t8=t8m)
        crec = _deblock_chroma(crec, np.full((mbh, mbw), qp, np.int32))
    y = out if full_recon else out[:h, :w].copy()
    rb = rbsps[0] if slice_rows is None else rbsps
    if chroma is None:
        return rb, y
    crop = crec if full_recon else crec[:, :(h + 1) // 2, :(w + 1) // 2].copy()
    return rb, (y, crop)


def _encode_mb_i16(bw, smb, plane, mx, my, qp, nnz, modes, max_coeffs, ch):
    """Try I_16x16 DC: commit only when all AC quantize to zero and the
    DC block stays inside the thinning budget. Returns True on commit."""
    al = mx > 0
    aa = my > _SLICE_TOP
    pred = _pred16(plane, mx, my, 2, al, aa)
    resid = smb.astype(np.int32) - pred
    dcs = np.empty((4, 4), np.int64)
    for by in range(4):
        for bx in range(4):
            wblk = _fwd4(resid[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4])
            if np.any(_quant4(wblk * 1, qp)[_AC_MASK]):
                return False  # AC energy: let I_4x4 handle it
            dcs[by, bx] = wblk[0, 0]
    # DC Hadamard + quant: halve the Hadamard output, then quantize with
    # doubled rounding and a +1 shift (encoder mirror of 8.5.10, whose
    # inverse carries a 1/64 DC normalization on top of the per-block 1/64)
    had = _H4 @ dcs @ _H4
    shift = 15 + qp // 6
    f2 = 2 * ((1 << shift) // 3)
    mf00 = _MF[qp % 6][0]
    dc_lv = (np.sign(had) * (((np.abs(had) >> 1) * mf00 + f2) >> (shift + 1))
             ).astype(np.int32)
    # (total forward divisor 2^(qbits+2); the inverse's V<<(qp/6) >> 2 and
    # the per-block 1/64 close the 256x Hadamard round-trip gain exactly)
    if np.count_nonzero(dc_lv) > max_coeffs:
        return False
    # chroma: best-mode intra prediction + residual (r7); flat-128
    # sources pick DC with zero residual and reproduce the pre-r7 bits
    csrc, crec, nnz_c = ch
    csrc_mb = csrc[:, my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
    icp, cpred = _pick_chroma_mode(crec, csrc_mb, mx, my, al, aa)
    cbpc, comps = _encode_chroma_mb(csrc_mb, cpred, qp, intra=True)
    # mb_type: 1 + pred(2) + 4*cbp_chroma + 12*(cbp_luma != 0 -> 0)
    bw.ue(1 + 2 + 4 * cbpc)
    bw.ue(icp)  # intra_chroma_pred_mode
    bw.se(0)   # mb_qp_delta (always present for I_16x16)
    nc = _nc_luma(nnz, mx * 4, my * 4)
    _encode_residual(bw, _scan16(dc_lv), nc)
    # reconstruct exactly like the decoder
    dcv = _i16_dc_dequant(dc_lv, qp)
    out = pred.copy()
    for by in range(4):
        for bx in range(4):
            d = np.zeros((4, 4), np.int64)
            d[0, 0] = dcv[by, bx]
            out[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] += _inv4(d).astype(np.int32)
    np.clip(out, 0, 255, out)
    plane[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16] = out.astype(np.uint8)
    _write_chroma_residual(bw, cbpc, comps, nnz_c, mx, my)
    for ci in range(2):
        crec[ci, my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = comps[ci]["recon"]
    nnz[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = 0  # AC TotalCoeff per block
    modes[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = -1  # not I4x4 -> DC for pred
    return True


_AC_MASK = np.ones((4, 4), bool)
_AC_MASK[0, 0] = False


def _i16_dc_dequant(dc_lv, qp):
    """8.5.10: inverse Hadamard + DC scaling (net V*2^(qp/6)/4)."""
    f = _H4 @ dc_lv.astype(np.int64) @ _H4
    v00 = _V[qp % 6][0]
    if qp >= 12:
        return (f * v00) << (qp // 6 - 2)
    return (f * v00 + (1 << (1 - qp // 6))) >> (2 - qp // 6)


def _encode_mb_i4(bw, smb, plane, mx, my, qp, nnz, modes, max_coeffs,
                  plane_w, ch, mb_type_code=0):
    """I_NxN macroblock: I_4x4 best-of-V/H/DC per block; under a High-
    profile PPS (r7) an I_8x8 candidate (8.3.2.2, all nine modes)
    competes on coefficient count — the same CAVLC bit-cost proxy the
    inter transform selection uses. Residuals are CAVLC (8x8 blocks as
    four interleaved 4x4 runs, 8.5.6); recon is decoder-identical."""
    ys, xs = my * 16, mx * 16
    if _T8:  # pre-state, to replay for the I_8x8 candidate
        plane0 = plane[ys:ys + 16, xs:xs + 16].copy()
        nnz0 = nnz[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4].copy()
        modes0 = modes[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4].copy()
    blocks = []  # (chosen_mode, scan, nC) in blkIdx order
    cbp = 0
    for blk in range(16):
        ox, oy = _BLK_XY[blk]
        px, py = mx * 16 + ox, my * 16 + oy
        bx, by = px // 4, py // 4
        al, aa, aar, aal = _mb_avail(blk, px, py, plane_w)
        sblk = smb[oy:oy + 4, ox:ox + 4].astype(np.int32)
        best = None
        for mode in (2, 0, 1):
            if mode == 0 and not aa:
                continue
            if mode == 1 and not al:
                continue
            p = _pred4(plane, px, py, mode, al, aa, aar, aal)
            ssd = int(((sblk - p) ** 2).sum())
            if best is None or ssd < best[0]:
                best = (ssd, mode, p)
        _, mode, pred = best
        lv = _thin(_quant4(_fwd4(sblk - pred), qp), max_coeffs)
        nc = _nc_luma(nnz, bx, by)
        scan = _scan16(lv)
        tc = int(np.count_nonzero(lv))
        if tc:
            cbp |= 1 << (blk >> 2)
        blocks.append((mode, scan, nc, tc))
        nnz[by, bx] = tc
        modes[by, bx] = mode
        rec = pred + _inv4(_dequant4(lv, qp)).astype(np.int32)
        np.clip(rec, 0, 255, rec)
        plane[py:py + 4, px:px + 4] = rec.astype(np.uint8)
    use8 = False
    if _T8:  # race the I_8x8 candidate on the same pre-state
        plane4 = plane[ys:ys + 16, xs:xs + 16].copy()
        nnz4 = nnz[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4].copy()
        modes4 = modes[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4].copy()
        plane[ys:ys + 16, xs:xs + 16] = plane0
        nnz[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = nnz0
        modes[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = modes0
        n8, blocks8, cbp8 = _eval_mb_i8(plane, smb, mx, my, qp, plane_w)
        use8 = n8 <= sum(b[3] for b in blocks)
        if use8:
            _mark_t8(mx, my)
        else:
            plane[ys:ys + 16, xs:xs + 16] = plane4
            nnz[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = nnz4
            modes[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = modes4
    # chroma residual (r7): best-mode prediction from the recon plane,
    # independent of the luma transform choice; a flat source picks
    # DC / cbpc 0, reproducing the pre-r7 bitstream
    csrc, crec, nnz_c = ch
    csrc_mb = csrc[:, my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
    icp, cpred = _pick_chroma_mode(crec, csrc_mb, mx, my, mx > 0,
                                   my > _SLICE_TOP)
    cbpc, comps = _encode_chroma_mb(csrc_mb, cpred, qp, intra=True)
    # serialize: mb_type, [t8 flag,] pred modes, chroma mode, cbp,
    # qp_delta, residuals
    bw.ue(mb_type_code)  # I_NxN (5 when inside a P slice)
    if _T8:  # High-profile PPS: I_NxN carries transform_size_8x8_flag
        bw.u(1 if use8 else 0, 1)
    if use8:
        for b8, (mode8, _q8) in enumerate(blocks8):
            bx, by = mx * 4 + (b8 & 1) * 2, my * 4 + (b8 >> 1) * 2
            pm = _pred_mode_for(modes, bx, by)
            if mode8 == pm:
                bw.u(1, 1)  # prev_intra8x8_pred_mode_flag
            else:
                bw.u(0, 1)
                bw.u(mode8 - (1 if mode8 > pm else 0), 3)
            # replicate into the 4x4 grid so later pred-mode and nC
            # derivations see the 8x8 mode (decoder does the same)
            modes[by:by + 2, bx:bx + 2] = mode8
        cbp = cbp8
    else:
        for blk in range(16):
            ox, oy = _BLK_XY[blk]
            bx, by = (mx * 16 + ox) // 4, (my * 16 + oy) // 4
            mode = blocks[blk][0]
            # predicted mode must use the FINAL modes grid state as the
            # decoder sees it: left/up blocks all precede in blkIdx
            # order, already set
            pm = _pred_mode_for_encoded(modes, bx, by, blk, mx, my)
            if mode == pm:
                bw.u(1, 1)
            else:
                bw.u(0, 1)
                bw.u(mode - (1 if mode > pm else 0), 3)
    bw.ue(icp)  # intra_chroma_pred_mode
    bw.ue(_CBP_INTRA_INV[cbp | (cbpc << 4)])
    if cbp | cbpc:
        bw.se(0)  # mb_qp_delta
    if use8:  # four 8x8 blocks, CAVLC-interleaved 4x4 runs (8.5.6)
        for b8 in range(4):
            cells = [(my * 4 + (b8 >> 1) * 2 + (k >> 1),
                      mx * 4 + (b8 & 1) * 2 + (k & 1)) for k in range(4)]
            if cbp & (1 << b8):
                runs = _scan8_sub(blocks8[b8][1])
                for k, (by, bx) in enumerate(cells):
                    nc = _nc_luma(nnz, bx, by)
                    _encode_residual(bw, [int(v) for v in runs[k]], nc)
                    nnz[by, bx] = int(np.count_nonzero(runs[k]))
            else:
                for by, bx in cells:
                    nnz[by, bx] = 0
    else:
        for blk in range(16):
            if cbp & (1 << (blk >> 2)):
                _, scan, nc, _tc = blocks[blk]
                _encode_residual(bw, scan, nc)
    _write_chroma_residual(bw, cbpc, comps, nnz_c, mx, my)
    for ci in range(2):
        crec[ci, my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = comps[ci]["recon"]


def _pred_mode_for_encoded(modes, bx, by, blk, mx, my):
    """Same as _pred_mode_for, but a left/up neighbour INSIDE this MB that
    comes later in blkIdx order never happens (Z order guarantees it), so
    the grid state is exactly what the decoder has when parsing."""
    return _pred_mode_for(modes, bx, by)


def encode_p_cavlc(gray: np.ndarray, ref_full: np.ndarray, qp: int = 10,
                   max_coeffs: int = 16, frame_num: int = 1,
                   search: int = 8, deblock: bool = False,
                   poc_lsb: int | None = None,
                   chroma: np.ndarray | None = None,
                   cref: np.ndarray | None = None,
                   motion_out: list | None = None,
                   wp: dict | None = None,
                   slice_rows: int | None = None,
                   t8x8: bool = False):
    """One gray frame -> (P-slice RBSP, FULL reconstructed plane).

    Per macroblock: P_SKIP when the residual at the skip-predicted MV
    quantizes to all-zero; else P_L0_16x16 with an integer-pel full
    search (+/- `search` around the median predictor) and CAVLC inter
    residuals; intra (I_4x4-in-P) fallback when motion fails (SAD gate).
    `ref_full` is the previous frame's FULL (mb-aligned) recon plane —
    or a most-recent-first LIST of recon planes (multi-reference L0,
    r7): the slice header then carries num_ref_idx_l0_active and every
    inter partition a te(v) ref_idx_l0; the encoder picks the best
    reference per MB by penalized SAD (all partitions of one MB share
    it), P_SKIP stays refIdx 0 per 8.4.1.1.
    `wp` (r7, explicit weighted prediction — the PPS must advertise
    weighted_pred, see build_avcc(wp=True)) is a pred_weight_table
    dict; the luma search runs on pre-weighted planes (bit-exact at
    the encoder's integer-pel MVs) while chroma weights apply after
    interpolation, exactly as the decoder does (8.4.2.3.2).
    decode == recon bit-exact, same contract as the intra encoder."""
    a = np.asarray(gray, np.uint8)
    h, w = a.shape
    mbw = -(-w // 16)
    mbh = -(-h // 16)
    refs = _ref_list(ref_full)
    nrefs = len(refs)
    for rp in refs:
        assert rp.shape == (mbh * 16, mbw * 16), "reference plane mismatch"
    src = np.pad(a, ((0, mbh * 16 - h), (0, mbw * 16 - w)), mode="edge")
    plane = np.zeros((mbh * 16, mbw * 16), np.uint8)
    plane_w = mbw * 16
    nnz = np.zeros((mbh * 4, mbw * 4), np.int32)
    modes = np.full((mbh * 4, mbw * 4), -1, np.int32)
    mvs = _MvState(mbw, mbh)
    qp_map = np.full((mbh, mbw), qp, np.int32)
    csrc = _pad_chroma(chroma, mbw, mbh, h, w)
    crefs = _ref_list(cref) if cref is not None else []
    while len(crefs) < nrefs:  # gray-stream references: flat chroma
        crefs.append(np.full((2, mbh * 8, mbw * 8), 128, np.uint8))
    cref = crefs[0]
    crec = np.full((2, mbh * 8, mbw * 8), 128, np.uint8)
    nnz_c = np.zeros((2, mbh * 2, mbw * 2), np.int32)
    ch = (csrc, crec, nnz_c)
    # explicit WP (r7): luma search planes are pre-weighted — identical
    # to interp-then-weight at the encoder's integer-pel MVs — while
    # chroma (fractional MVs) weights after interpolation like decode
    wl = wc = None
    srefs = refs
    if wp is not None:
        wl, wc = _resolve_wp(wp, nrefs)
        srefs = [rp if wl[ri] is None else
                 _wp_apply(rp.astype(np.int32), wl[ri]).astype(np.uint8)
                 for ri, rp in enumerate(refs)]

    def cmc(mv, parts=None, ridx=0):
        """(2, 8, 8) chroma MC prediction for one MB; `parts` is a list
        of (ox, oy, w, h, mv) luma-geometry partitions."""
        out = np.empty((2, 8, 8), np.int32)
        cref = crefs[ridx]
        for ci in range(2):
            wpck = wc[ridx][ci] if wc is not None and wc[ridx] else None
            if parts is None:
                out[ci] = _interp_chroma(cref[ci], mx * 8, my * 8, *mv,
                                         wp=wpck)
            else:
                for (ox, oy, pw, ph, pmv) in parts:
                    out[ci, oy // 2:(oy + ph) // 2,
                        ox // 2:(ox + pw) // 2] = _interp_chroma(
                            cref[ci], mx * 8 + ox // 2, my * 8 + oy // 2,
                            pmv[0], pmv[1], pw // 2, ph // 2, wp=wpck)
        return out

    def _slice_bw(first_row):
        bw = _BitWriter()
        bw.ue(first_row * mbw)  # first_mb_in_slice (multi-slice, r7)
        bw.ue(5)      # slice_type: P (all slices in picture)
        bw.ue(0)      # pps_id
        bw.u(frame_num & 0xF, 4)
        if poc_lsb is not None:  # poc_type-0 SPS (B-enabled streams)
            bw.u(poc_lsb & 0xFFFF, 16)
        if nrefs > 1:  # multi-reference L0 (r7)
            bw.u(1, 1)  # num_ref_idx_active_override_flag
            bw.ue(nrefs - 1)
        else:
            bw.u(0, 1)  # num_ref_idx_active_override_flag
        bw.u(0, 1)    # ref_pic_list_modification_flag_l0
        if wp is not None:  # pred_weight_table (7.3.3.2, r7)
            _write_pred_weight_table(bw, wp, nrefs)
        bw.u(0, 1)    # adaptive_ref_pic_marking_mode_flag (sliding window)
        bw.se(qp - 26)
        bw.ue(0 if deblock else 1)  # disable_deblocking_filter_idc
        if deblock:
            bw.se(0)
            bw.se(0)
        return bw

    _set_t8(t8x8)
    t8m = np.zeros((mbh, mbw), np.int32) if t8x8 else None
    _set_t8map(t8m)  # per-MB flags feed the 8.7 edge derivation
    starts = dict(_slice_ranges(mbh, slice_rows))
    rbsps = []
    bw = None
    pending_skips = 0
    for my in range(mbh):
        if my in starts:  # new slice at this MB row (multi-slice, r7)
            if bw is not None:
                if pending_skips:
                    bw.ue(pending_skips)  # trailing skip run
                    pending_skips = 0
                bw.rbsp_trailing()
                rbsps.append(bytes(bw.buf))
            _set_slice_top(my)
            bw = _slice_bw(my)
        for mx in range(mbw):
            smb = src[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16].astype(np.int32)
            # --- P_SKIP candidate
            smv = mvs.skip_mv(mx, my)
            pred = _interp_luma(srefs[0], mx * 16, my * 16, *smv)
            cpred_skip = cmc(smv)
            csrc_mb = csrc[:, my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
            if _all_zero_quant(smb - pred, qp) and \
                    _chroma_zero(csrc_mb, cpred_skip, qp):
                pending_skips += 1
                plane[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16] = \
                    np.clip(pred, 0, 255).astype(np.uint8)
                for ci in range(2):
                    crec[ci, my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = \
                        np.clip(cpred_skip[ci], 0, 255).astype(np.uint8)
                nnz[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = 0
                nnz_c[:, my * 2:my * 2 + 2, mx * 2:mx * 2 + 2] = 0
                mvs.set_mb(mx, my, smv, 0)
                modes[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = -1
                continue
            # --- integer-pel full search around the median predictor;
            # with multiple references (r7) every reference is probed
            # and the best penalized SAD wins (the penalty is the
            # deterministic stand-in for the extra ref_idx bits)
            mvp = mvs.mvp_16x16(mx, my)
            sad, mv, pred = _search_block(srefs[0], smb, mx * 16, my * 16,
                                          mvp, search)
            ridx = 0
            for ri in range(1, nrefs):
                sad_i, mv_i, pred_i = _search_block(
                    srefs[ri], smb, mx * 16, my * 16, mvp, search)
                if sad_i + 48 * ri < sad + 48 * ridx:
                    sad, mv, pred, ridx = sad_i, mv_i, pred_i, ri
            if sad > 28 * 256:  # motion failed (scene cut): intra fallback
                bw.ue(pending_skips)
                pending_skips = 0
                _encode_mb_i4(bw, smb.astype(np.uint8), plane, mx, my, qp,
                              nnz, modes, max_coeffs, plane_w, ch,
                              mb_type_code=5)
                mvs.set_mb(mx, my, (0, 0), -1)
                continue
            # --- partition decision: 16x8 / 8x16 / 8x8 when they clearly
            # beat the 16x16 block (deterministic gates; finer partitions
            # carry more mvd bits, so they must win by a larger margin).
            # All partitions of one MB share the chosen reference.
            chosen = None    # 2-way: (ptype, parts)
            chosen8 = None   # 4-way 8x8: parts
            if sad > 6 * 256:
                tot, ptype, parts = _eval_partitions(mvs, srefs[ridx], smb,
                                                     mx, my, search)
                tot8, parts8 = _eval_p8x8(mvs, srefs[ridx], smb, mx, my,
                                          search)
                if tot8 < 0.85 * min(sad, tot):
                    chosen8 = parts8
                elif tot < sad * 0.92:
                    chosen = (ptype, parts)
            if chosen8:
                mb_type_code = 3  # P_8x8
                pred = np.zeros((16, 16), np.int32)
                mvds = []
                cparts = []
                for (ox8, oy8), (st8, sparts) in zip(_P8_GEOM, chosen8):
                    for (ox, oy, w_, h_), (mvp_i, mv_i, pred_i) in zip(
                            _P_SUB_GEOM[st8], sparts):
                        gx, gy = ox8 + ox, oy8 + oy
                        pred[gy:gy + h_, gx:gx + w_] = pred_i
                        mvds.append((mv_i[0] - mvp_i[0],
                                     mv_i[1] - mvp_i[1]))
                        cparts.append((gx, gy, w_, h_, mv_i))
                cpred = cmc(None, cparts, ridx)
            elif chosen:
                ptype, parts = chosen
                mb_type_code = 1 if ptype == "16x8" else 2
                pred = np.zeros((16, 16), np.int32)
                mvds = []
                cparts = []
                for (ox, oy, w_, h_), (mvp_i, mv_i, pred_i) in zip(
                        _PART_GEOM[ptype], parts):
                    pred[oy:oy + h_, ox:ox + w_] = pred_i
                    mvds.append((mv_i[0] - mvp_i[0], mv_i[1] - mvp_i[1]))
                    cparts.append((ox, oy, w_, h_, mv_i))
                cpred = cmc(None, cparts, ridx)
            else:
                mb_type_code = 0
                mvds = [(mv[0] - mvp[0], mv[1] - mvp[1])]
                cpred = cmc(mv, ridx=ridx)
            blocks = []
            cbp4 = 0
            out4 = pred.copy()
            for blk in range(16):
                ox, oy = _BLK_XY[blk]
                lv = _thin(_quant4(_fwd4(smb[oy:oy + 4, ox:ox + 4]
                                         - pred[oy:oy + 4, ox:ox + 4]),
                                   qp, intra=False), max_coeffs)
                tc = int(np.count_nonzero(lv))
                if tc:
                    cbp4 |= 1 << (blk >> 2)
                blocks.append((lv, tc))
                out4[oy:oy + 4, ox:ox + 4] += _inv4(_dequant4(lv, qp)).astype(np.int32)
            use8 = False
            if t8x8 and mb_type_code == 0:
                # per-MB transform selection (r7): take the 8x8
                # transform when it codes no more coefficients than the
                # 4x4 one (coefficient count proxies the CAVLC bit cost)
                blocks8 = []
                cbp8 = 0
                out8 = pred.copy()
                for b8 in range(4):
                    oy8, ox8 = (b8 >> 1) * 8, (b8 & 1) * 8
                    q8 = _quant8(_fwd8(smb[oy8:oy8 + 8, ox8:ox8 + 8]
                                       - pred[oy8:oy8 + 8, ox8:ox8 + 8]),
                                 qp)
                    if np.any(q8):
                        cbp8 |= 1 << b8
                        out8[oy8:oy8 + 8, ox8:ox8 + 8] += \
                            _inv8(_dequant8(q8, qp)).astype(np.int64)
                    blocks8.append(q8)
                n8 = sum(int(np.count_nonzero(q8)) for q8 in blocks8)
                n4 = sum(tc for _lv, tc in blocks)
                use8 = n8 <= n4
            if use8:
                cbp, out = cbp8, out8
                _mark_t8(mx, my)
            else:
                cbp, out = cbp4, out4
            cbpc, comps = _encode_chroma_mb(csrc_mb, cpred, qp, intra=False)
            bw.ue(pending_skips)
            pending_skips = 0
            bw.ue(mb_type_code)
            if chosen8:
                for st8, _sp in chosen8:
                    bw.ue(st8)  # sub_mb_type per 8x8 (7.4.5.2)
            if nrefs > 1:  # ref_idx_l0 per partition, before mvds (r7)
                for _ in range(4 if chosen8 else 2 if chosen else 1):
                    _write_ref_idx(bw, nrefs, ridx)
            for dx_, dy_ in mvds:
                bw.se(dx_)
                bw.se(dy_)
            bw.ue(_CBP_INTER_INV[cbp | (cbpc << 4)])
            if t8x8 and (cbp & 15) and (
                    mb_type_code in (0, 1, 2)
                    or (chosen8 and all(st8 == 0 for st8, _ in chosen8))):
                # transform_size_8x8_flag (7.3.5): present for 16x16 /
                # 16x8 / 8x16 and all-8x8-sub P_8x8 shapes
                bw.u(1 if use8 else 0, 1)
            if cbp | cbpc:
                bw.se(0)  # mb_qp_delta
            if use8:
                for b8 in range(4):
                    cells = [(my * 4 + (b8 >> 1) * 2 + (k >> 1),
                              mx * 4 + (b8 & 1) * 2 + (k & 1))
                             for k in range(4)]
                    if cbp & (1 << b8):
                        runs = _scan8_sub(blocks8[b8])
                        for k, (by, bx) in enumerate(cells):
                            nc = _nc_luma(nnz, bx, by)
                            _encode_residual(bw, [int(v) for v in runs[k]],
                                             nc)
                            nnz[by, bx] = int(np.count_nonzero(runs[k]))
                    else:
                        for by, bx in cells:
                            nnz[by, bx] = 0
            else:
                for blk in range(16):
                    ox, oy = _BLK_XY[blk]
                    bx, by = mx * 4 + ox // 4, my * 4 + oy // 4
                    lv, tc = blocks[blk]
                    if cbp & (1 << (blk >> 2)):
                        nc = _nc_luma(nnz, bx, by)
                        _encode_residual(bw, _scan16(lv), nc)
                    nnz[by, bx] = tc
            _write_chroma_residual(bw, cbpc, comps, nnz_c, mx, my)
            for ci in range(2):
                crec[ci, my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = \
                    comps[ci]["recon"]
            np.clip(out, 0, 255, out)
            plane[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16] = out.astype(np.uint8)
            if chosen8:
                for (ox8, oy8), (st8, sparts) in zip(_P8_GEOM, chosen8):
                    for (ox, oy, w_, h_), (_mvp_i, mv_i, _p) in zip(
                            _P_SUB_GEOM[st8], sparts):
                        mvs.set_rect(mx * 4 + (ox8 + ox) // 4,
                                     my * 4 + (oy8 + oy) // 4,
                                     w_ // 4, h_ // 4, mv_i, ridx)
            elif chosen:
                ptype, parts = chosen
                for (ox, oy, w, h), (_mvp_i, mv_i, _p) in zip(
                        _PART_GEOM[ptype], parts):
                    mvs.set_rect(mx * 4 + ox // 4, my * 4 + oy // 4,
                                 w // 4, h // 4, mv_i, ridx)
            else:
                mvs.set_mb(mx, my, mv, ridx)
            modes[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = -1
    if pending_skips:
        bw.ue(pending_skips)  # trailing skip run
    bw.rbsp_trailing()
    rbsps.append(bytes(bw.buf))
    _set_slice_top(0)
    _set_t8(False)
    _set_t8map(None)
    rb = rbsps[0] if slice_rows is None else rbsps
    out_plane = plane
    if deblock and qp >= 16:
        out_plane = _deblock_luma_inter(plane, qp_map, nnz, mvs, t8=t8m)
        crec = _deblock_chroma(crec, qp_map, nnz=nnz, mvs=mvs, t8=t8m)
    if motion_out is not None:
        motion_out.append((mvs.mv.copy(), mvs.ref.copy()))
    if chroma is None:
        return rb, out_plane
    return rb, (out_plane, crec)


def _eval_b_partitions(mvs0, mvs1, ref0_full, ref1_full, smb, mx, my,
                       search):
    """Pick the best partitioned-B shape: for 16x8 and 8x16, each
    partition independently takes the cheapest of L0 / L1 / Bi (decision
    phase only — no state commits; the serializer re-derives predictors
    in the per-list bitstream order). Returns (total_sad, info) with
    info = {ptype, modes (m0, m1), mv0 [per part], mv1 [per part],
    preds [per part 2D]}."""
    best = None
    for ptype, geom in _PART_GEOM.items():
        tot = 0
        modes_p = []
        mv0s, mv1s, preds = [], [], []
        for idx, (ox, oy, w, h) in enumerate(geom):
            tgt = smb[oy:oy + h, ox:ox + w]
            mvp0 = mvs0.mvp_part(mx, my, ptype, idx)
            s0, mv_0, p0 = _search_block(ref0_full, tgt, mx * 16 + ox,
                                         my * 16 + oy, mvp0, search)
            mvp1 = mvs1.mvp_part(mx, my, ptype, idx)
            s1, mv_1, p1 = _search_block(ref1_full, tgt, mx * 16 + ox,
                                         my * 16 + oy, mvp1, search)
            bi = _biblend(p0, p1)
            sbi = int(np.abs(tgt - bi).sum())
            mode = min(((s0, 0), (s1, 1), (sbi, 2)))[1]
            modes_p.append(mode)
            mv0s.append(mv_0 if mode in (0, 2) else None)
            mv1s.append(mv_1 if mode in (1, 2) else None)
            preds.append((p0, p1, bi)[mode])
            tot += (s0, s1, sbi)[mode]
        # Table 7-14: mb_type from (m0, m1, geometry)
        order = ((0, 0), (1, 1), (0, 1), (1, 0), (0, 2), (1, 2), (2, 0),
                 (2, 1), (2, 2))
        base = 4 + 2 * order.index((modes_p[0], modes_p[1]))
        mbt = base + (1 if ptype == "8x16" else 0)
        info = {"ptype": ptype, "modes": tuple(modes_p), "mb_type": mbt,
                "mv0": mv0s, "mv1": mv1s, "preds": preds}
        if best is None or tot < best[0]:
            best = (tot, info)
    return best


def encode_b_cavlc(gray: np.ndarray, ref0_full: np.ndarray,
                   ref1_full: np.ndarray, qp: int = 10,
                   max_coeffs: int = 16, frame_num: int = 1,
                   search: int = 8, poc_lsb: int = 0,
                   chroma: np.ndarray | None = None,
                   cref0: np.ndarray | None = None,
                   cref1: np.ndarray | None = None,
                   col_motion=None, pocs=None, implicit_wb=False,
                   slice_rows=None, t8x8: bool = False):
    """One gray frame -> (B-slice RBSP, FULL recon plane). Per MB the
    encoder picks the cheapest of B_L0_16x16 / B_L1_16x16 / B_Bi_16x16
    (bi-prediction averages the two MC blocks) with an I_4x4 fallback on
    SAD failure; no B_SKIP/direct modes are emitted. B pictures are
    NON-REFERENCE (nal_ref_idc 0) and always disable the in-loop filter
    in-slice, so decode == recon holds without two-list bS rules.
    col_motion = the L1 anchor's (mv, ref) 4x4 motion field plus pocs =
    (cur, poc0, poc1) switches direct/skip modes to TEMPORAL direct
    (8.4.1.2.3, direct_spatial_mv_pred_flag = 0). implicit_wb=True
    (PPS weighted_bipred_idc 2, r7) blends every bi-prediction with the
    POC-derived implicit weights instead of the plain average — no new
    syntax, only the 8.4.2.3.1 prediction math — which makes temporally
    asymmetric B pictures (and linear fades) predict far better.
    t8x8=True (High-profile PPS, late r7): per-MB adaptive 8x8
    transform on B_L0/L1/Bi 16x16, partitioned 16x8/8x16, and B_8x8
    with all-8x8 non-direct subs — direct shapes stay 4x4 because the
    SPS writes direct_8x8_inference_flag 0 (7.3.5 flag condition);
    the I_NxN fallback races I_8x8 like any intra MB."""
    if implicit_wb:
        if pocs is None:
            raise ValueError("implicit_wb needs pocs=(cur, poc0, poc1)")
        _set_bipred(_implicit_bipred_weights(*pocs))
    else:
        _set_bipred(None)
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
    mvs0 = _MvState(mbw, mbh)
    mvs1 = _MvState(mbw, mbh)
    csrc = _pad_chroma(chroma, mbw, mbh, h, w)
    if cref0 is None:
        cref0 = np.full((2, mbh * 8, mbw * 8), 128, np.uint8)
    if cref1 is None:
        cref1 = np.full((2, mbh * 8, mbw * 8), 128, np.uint8)
    crec = np.full((2, mbh * 8, mbw * 8), 128, np.uint8)
    nnz_c = np.zeros((2, mbh * 2, mbw * 2), np.int32)
    ch = (csrc, crec, nnz_c)

    def cmc1(cref, mv):
        return np.stack([_interp_chroma(cref[ci], mx * 8, my * 8, *mv)
                         for ci in range(2)])

    tf = None
    if col_motion is not None:
        tf = _temporal_fields(col_motion[0], col_motion[1], *pocs)

    def _slice_bw(first_row):
        bw = _BitWriter()
        bw.ue(first_row * mbw)  # first_mb_in_slice (multi-slice, r7)
        bw.ue(6)      # slice_type: B (all slices in picture)
        bw.ue(0)      # pps_id
        bw.u(frame_num & 0xF, 4)
        bw.u(poc_lsb & 0xFFFF, 16)  # pic_order_cnt_lsb (poc_type 0 SPS)
        bw.u(0 if tf is not None else 1, 1)  # direct_spatial_mv_pred_flag
        bw.u(0, 1)    # num_ref_idx_active_override_flag
        bw.u(0, 1)    # ref_pic_list_modification_flag_l0
        bw.u(0, 1)    # ref_pic_list_modification_flag_l1
        # nal_ref_idc = 0: no dec_ref_pic_marking
        bw.se(qp - 26)
        bw.ue(1)      # disable_deblocking_filter_idc (always off for B)
        return bw

    _set_t8(t8x8)  # High-profile PPS (late r7): B MBs carry the flag too
    starts = dict(_slice_ranges(mbh, slice_rows))
    rbsps = []
    bw = None
    pending_skips = 0
    for my in range(mbh):
        if my in starts:  # new slice at this MB row (multi-slice, r7)
            if bw is not None:
                if pending_skips:
                    bw.ue(pending_skips)  # trailing skip run
                    pending_skips = 0
                bw.rbsp_trailing()
                rbsps.append(bytes(bw.buf))
            _set_slice_top(my)
            bw = _slice_bw(my)
        for mx in range(mbw):
            smb = src[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16].astype(np.int32)
            # --- direct first: B_SKIP when its residual is zero
            dmv0, dmv1 = _b_direct_mvs(mvs0, mvs1, mx, my, tf)
            dpred = _b_direct_pred(ref0_full, ref1_full, mx, my, dmv0, dmv1)
            dcpred = _b_chroma_direct_enc(cref0, cref1, mx, my, dmv0, dmv1)
            csrc_mb = csrc[:, my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
            if _all_zero_quant(smb - dpred, qp) and \
                    _chroma_zero(csrc_mb, dcpred, qp):
                pending_skips += 1
                plane[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16] = \
                    np.clip(dpred, 0, 255).astype(np.uint8)
                for ci in range(2):
                    crec[ci, my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = \
                        np.clip(dcpred[ci], 0, 255).astype(np.uint8)
                nnz[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = 0
                nnz_c[:, my * 2:my * 2 + 2, mx * 2:mx * 2 + 2] = 0
                _b_commit_direct(mvs0, mvs1, mx, my, dmv0, dmv1)
                modes[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = -1
                continue
            sad_d = int(np.abs(smb - dpred).sum())
            mvp0 = mvs0.mvp_16x16(mx, my)
            sad0, mv0, pred0 = _search_block(ref0_full, smb, mx * 16, my * 16,
                                             mvp0, search)
            mvp1 = mvs1.mvp_16x16(mx, my)
            sad1, mv1, pred1 = _search_block(ref1_full, smb, mx * 16, my * 16,
                                             mvp1, search)
            bi = _biblend(pred0, pred1)
            sad_bi = int(np.abs(smb - bi).sum())
            # direct wins ties: it costs no mvd bits
            cand = min(((sad_d, 0), (sad0, 1), (sad1, 2), (sad_bi, 3)))
            if cand[0] > 28 * 256:  # nothing predicts it: intra fallback
                bw.ue(pending_skips)
                pending_skips = 0
                _encode_mb_i4(bw, smb.astype(np.uint8), plane, mx, my, qp,
                              nnz, modes, max_coeffs, plane_w, ch,
                              mb_type_code=23)
                mvs0.set_mb(mx, my, (0, 0), -1)
                mvs1.set_mb(mx, my, (0, 0), -1)
                continue
            mb_type = cand[1]
            bpart = None
            b8 = None
            if cand[0] > 6 * 256:  # partitions must clearly win (bits)
                tot_p, pinfo = _eval_b_partitions(
                    mvs0, mvs1, ref0_full, ref1_full, smb, mx, my, search)
                if tot_p < 0.92 * cand[0]:
                    bpart = pinfo
                # B_8x8 carries the most side bits (4 sub types + up to
                # 16 mvd pairs per list): it must clearly beat both
                tot_8, subs_8 = _eval_b8x8(
                    mvs0, mvs1, ref0_full, ref1_full, smb, mx, my,
                    search, dmv0, dmv1, dpred)
                if tot_8 < 0.80 * min(cand[0], tot_p):
                    b8, bpart = subs_8, None
            if b8:
                # prediction needs only the chosen MVs (parts are filled
                # by _eval_b8x8); state commits happen at serialization
                pred, cpred = _b8x8_pred(b8, ref0_full, ref1_full, cref0,
                                         cref1, mx, my, dmv0, dmv1)
            elif bpart:
                geom = _PART_GEOM[bpart["ptype"]]
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
                            _interp_chroma(cref[ci], mx * 8 + ox // 2,
                                           my * 8 + oy // 2, mv_i[0],
                                           mv_i[1], w_ // 2, h_ // 2)
                            for ci in range(2)]))
                    cp = cps[0] if len(cps) == 1 else \
                        _biblend(cps[0], cps[1])
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
                    cpred = _biblend(cmc1(cref0, mv0), cmc1(cref1, mv1))
            blocks = []
            cbp = 0
            out = pred.copy()
            for blk in range(16):
                ox, oy = _BLK_XY[blk]
                lv = _thin(_quant4(_fwd4(smb[oy:oy + 4, ox:ox + 4]
                                         - pred[oy:oy + 4, ox:ox + 4]),
                                   qp, intra=False), max_coeffs)
                tc = int(np.count_nonzero(lv))
                if tc:
                    cbp |= 1 << (blk >> 2)
                blocks.append((lv, tc))
                out[oy:oy + 4, ox:ox + 4] += _inv4(_dequant4(lv, qp)).astype(np.int32)
            # 8x8-transform eligibility (7.3.5 with the SPS's
            # direct_8x8_inference_flag 0): every non-direct shape with
            # no sub-8x8 partitioning
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
                    q8 = _quant8(_fwd8(smb[oy8:oy8 + 8, ox8:ox8 + 8]
                                       - pred[oy8:oy8 + 8, ox8:ox8 + 8]),
                                 qp)
                    if np.any(q8):
                        cbp8 |= 1 << k8
                        out8[oy8:oy8 + 8, ox8:ox8 + 8] += \
                            _inv8(_dequant8(q8, qp)).astype(np.int64)
                    blocks8.append(q8)
                n8 = sum(int(np.count_nonzero(q)) for q in blocks8)
                use8 = n8 <= sum(tc for _lv, tc in blocks)
            if use8:
                cbp, out = cbp8, out8
                _mark_t8(mx, my)
            cbpc, comps = _encode_chroma_mb(csrc_mb, cpred, qp, intra=False)
            bw.ue(pending_skips)
            pending_skips = 0
            if b8:
                bw.ue(22)  # B_8x8 (7.3.5: sub_mb_pred follows)
                for st8, _parts in b8:
                    bw.ue(st8)

                def mvd_io(_li, mv_i, mvp_i):
                    bw.se(mv_i[0] - mvp_i[0])
                    bw.se(mv_i[1] - mvp_i[1])
                    return mv_i

                _b8x8_list_pass(b8, mvs0, mvs1, mx, my, dmv0, dmv1, mvd_io)
            elif bpart:
                # mvds grouped BY LIST (7.3.5.1) with per-list progressive
                # commits — the decoder's exact predictor order
                bw.ue(bpart["mb_type"])
                geom = _PART_GEOM[bpart["ptype"]]
                for li, (mvsx, mvlist) in enumerate(
                        ((mvs0, bpart["mv0"]), (mvs1, bpart["mv1"]))):
                    for idx, (ox, oy, w_, h_) in enumerate(geom):
                        mv_i = mvlist[idx]
                        if mv_i is None:
                            continue
                        mvp_i = mvsx.mvp_part(mx, my, bpart["ptype"], idx)
                        bw.se(mv_i[0] - mvp_i[0])
                        bw.se(mv_i[1] - mvp_i[1])
                        mvsx.set_rect(mx * 4 + ox // 4, my * 4 + oy // 4,
                                      w_ // 4, h_ // 4, mv_i, 0)
                    for idx, (ox, oy, w_, h_) in enumerate(geom):
                        if mvlist[idx] is None:
                            mvsx.set_rect(mx * 4 + ox // 4,
                                          my * 4 + oy // 4,
                                          w_ // 4, h_ // 4, (0, 0), -1)
            else:
                bw.ue(mb_type)
                if mb_type in (1, 3):
                    bw.se(mv0[0] - mvp0[0])
                    bw.se(mv0[1] - mvp0[1])
                if mb_type in (2, 3):
                    bw.se(mv1[0] - mvp1[0])
                    bw.se(mv1[1] - mvp1[1])
            bw.ue(_CBP_INTER_INV[cbp | (cbpc << 4)])
            if t8_shape and (cbp & 15):
                bw.u(1 if use8 else 0, 1)  # transform_size_8x8_flag
            if cbp | cbpc:
                bw.se(0)  # mb_qp_delta
            if use8:  # four 8x8 blocks, CAVLC-interleaved 4x4 runs
                for k8 in range(4):
                    cells = [(my * 4 + (k8 >> 1) * 2 + (k >> 1),
                              mx * 4 + (k8 & 1) * 2 + (k & 1))
                             for k in range(4)]
                    if cbp & (1 << k8):
                        runs = _scan8_sub(blocks8[k8])
                        for k, (by, bx) in enumerate(cells):
                            nc = _nc_luma(nnz, bx, by)
                            _encode_residual(bw, [int(v) for v in runs[k]],
                                             nc)
                            nnz[by, bx] = int(np.count_nonzero(runs[k]))
                    else:
                        for by, bx in cells:
                            nnz[by, bx] = 0
            else:
                for blk in range(16):
                    ox, oy = _BLK_XY[blk]
                    bx, by = mx * 4 + ox // 4, my * 4 + oy // 4
                    lv, tc = blocks[blk]
                    if cbp & (1 << (blk >> 2)):
                        nc = _nc_luma(nnz, bx, by)
                        _encode_residual(bw, _scan16(lv), nc)
                    nnz[by, bx] = tc
            _write_chroma_residual(bw, cbpc, comps, nnz_c, mx, my)
            for ci in range(2):
                crec[ci, my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = \
                    comps[ci]["recon"]
            np.clip(out, 0, 255, out)
            plane[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16] = out.astype(np.uint8)
            if bpart or b8:
                pass  # committed per list during mvd serialization
            elif mb_type == 0:
                _b_commit_direct(mvs0, mvs1, mx, my, dmv0, dmv1)
            else:
                mvs0.set_mb(mx, my, mv0 if mb_type in (1, 3) else (0, 0),
                            0 if mb_type in (1, 3) else -1)
                mvs1.set_mb(mx, my, mv1 if mb_type in (2, 3) else (0, 0),
                            0 if mb_type in (2, 3) else -1)
            modes[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = -1
    if pending_skips:
        bw.ue(pending_skips)  # trailing skip run
    bw.rbsp_trailing()
    rbsps.append(bytes(bw.buf))
    _set_slice_top(0)
    _set_t8(False)
    rb = rbsps[0] if slice_rows is None else rbsps
    if chroma is None:
        return rb, plane
    return rb, (plane, crec)


def encode_frames_bgop(frames: list[np.ndarray], qp: int = 10,
                       gop: int = 8, bframes: int = 1,
                       deblock: bool = False, entropy: str = "cavlc",
                       chromas: list | None = None,
                       direct: str = "spatial",
                       implicit_wb: bool = False,
                       slice_rows: int | None = None,
                       t8x8: bool = False
                       ) -> tuple[bytes, list[bytes], list[int]]:
    """Gray frames -> (avcC, DECODE-ORDER length-prefixed samples,
    display index per sample). Real IBBP-style GOPs: reference frames
    (IDR every `gop` display frames, P in between) are coded first, the
    `bframes` B pictures between each reference pair follow, predicting
    from BOTH surrounding references (L0 past / L1 future). Feed the
    display indices to the MP4 muxer as composition offsets (ctts);
    decode with decode_samples (returns display order). direct
    selects the B-slice direct/skip derivation: "spatial" (8.4.1.2.2
    shape, default) or "temporal" (8.4.1.2.3: the future anchor's
    motion scaled by POC distances, direct_spatial_mv_pred_flag=0).
    implicit_wb=True codes weighted_bipred_idc=2 in the PPS: B-slice
    bi-predictions use the POC-derived implicit weights (8.4.2.3.1) —
    a pure prediction-math change, composable with either direct
    mode and either entropy coder."""
    h, w = np.asarray(frames[0]).shape
    if w % 2 or h % 2:
        raise ValueError("4:2:0 H.264 needs even dimensions (crop unit is 2 px)")
    if bframes < 1:
        raise ValueError("bframes >= 1 (use encode_frames for P-only GOPs)")
    if direct not in ("spatial", "temporal"):
        raise ValueError(f"unknown direct mode {direct!r}")
    if entropy not in ("cavlc", "cabac"):
        raise ValueError(f"unknown entropy mode {entropy!r}")
    if entropy == "cabac":
        from . import h264_cabac as _C

        enc_idr, enc_p, enc_b = (_C.encode_idr_cabac, _C.encode_p_cabac,
                                 _C.encode_b_cabac)
    else:
        enc_idr, enc_p, enc_b = (encode_idr_cavlc, encode_p_cavlc,
                                 encode_b_cavlc)
    if chromas is not None:
        assert len(chromas) == len(frames), "one chroma pair per frame"
    avcc = build_avcc(w, h, deblock_ctrl=True, bpoc=True,
                      cabac=entropy == "cabac",
                      wbidc=2 if implicit_wb else 0, t8x8=t8x8)
    t8kw = {"t8x8": True} if t8x8 else {}
    samples: list[bytes] = []
    display: list[int] = []
    recons: dict[int, object] = {}  # display idx -> FULL recon (refs)
    crecons: dict[int, np.ndarray] = {}  # display idx -> chroma recon
    motions: dict[int, tuple] = {}  # display idx -> anchor 4x4 motion
    temporal = direct == "temporal"
    mbw, mbh = -(-w // 16), -(-h // 16)
    intra_motion = (np.zeros((mbh * 4, mbw * 4, 2), np.int32),
                    np.full((mbh * 4, mbw * 4), -1, np.int32))
    frame_num = 0

    def emit(rbsp, idr, ref_pic, disp):
        nal_ref_idc = (3 if idr else 2) if ref_pic else 0
        typ = 5 if idr else 1
        samples.append(_pack_sample(rbsp, (nal_ref_idc << 5) | typ))
        display.append(disp)

    n = len(frames)
    prev_ref_disp = None
    i = 0
    while i < n:
        if i % gop == 0:  # closed-GOP IDR; B frames never cross it
            if chromas is None:
                rbsp, recon = enc_idr(frames[i], qp=qp, deblock=deblock,
                                      full_recon=True, poc_lsb=2 * i,
                                      slice_rows=slice_rows, **t8kw)
            else:
                rbsp, (recon, crec) = enc_idr(
                    frames[i], qp=qp, deblock=deblock, full_recon=True,
                    poc_lsb=2 * i, chroma=chromas[i],
                    slice_rows=slice_rows, **t8kw)
                crecons[i] = crec
            frame_num = 1
            emit(rbsp, True, True, i)
            recons[i] = recon
            motions[i] = intra_motion
            prev_ref_disp = i
            i += 1
            continue
        # last display position of the current GOP is always a reference,
        # so B pictures stay strictly inside the GOP
        gop_last = min(n - 1, (prev_ref_disp // gop) * gop + gop - 1)
        nxt = min(prev_ref_disp + bframes + 1, gop_last)
        mo: list = []
        if chromas is None:
            rbsp, recon = enc_p(frames[nxt], recons[prev_ref_disp],
                                qp=qp, frame_num=frame_num,
                                deblock=deblock, poc_lsb=2 * nxt,
                                motion_out=mo, slice_rows=slice_rows,
                                **t8kw)
        else:
            rbsp, (recon, crec) = enc_p(
                frames[nxt], recons[prev_ref_disp], qp=qp,
                frame_num=frame_num, deblock=deblock, poc_lsb=2 * nxt,
                chroma=chromas[nxt], cref=crecons[prev_ref_disp],
                motion_out=mo, slice_rows=slice_rows, **t8kw)
            crecons[nxt] = crec
        motions[nxt] = mo[0]
        frame_num = (frame_num + 1) & 0xF
        emit(rbsp, False, True, nxt)
        recons[nxt] = recon
        # B pictures between the two references (display order)
        for b in range(prev_ref_disp + 1, nxt):
            tkw = {}
            if temporal:
                tkw["col_motion"] = motions[nxt]
            if temporal or implicit_wb:
                tkw["pocs"] = (2 * b, 2 * prev_ref_disp, 2 * nxt)
            if implicit_wb:
                tkw["implicit_wb"] = True
            tkw["slice_rows"] = slice_rows
            tkw.update(t8kw)
            if chromas is None:
                rbsp, _brec = enc_b(frames[b], recons[prev_ref_disp],
                                    recons[nxt], qp=qp,
                                    frame_num=frame_num, poc_lsb=2 * b,
                                    **tkw)
            else:
                rbsp, _brec = enc_b(
                    frames[b], recons[prev_ref_disp], recons[nxt], qp=qp,
                    frame_num=frame_num, poc_lsb=2 * b, chroma=chromas[b],
                    cref0=crecons[prev_ref_disp], cref1=crecons[nxt],
                    **tkw)
            emit(rbsp, False, False, b)
        prev_ref_disp = nxt
        i = nxt + 1
    return avcc, samples, display


def _chroma_zero(csrc_mb, cpred, qp) -> bool:
    """True iff the MB's chroma residual quantizes to nothing (cbpc 0) —
    the extra gate P_SKIP/B_SKIP need now that chroma codes for real."""
    cbpc, _ = _encode_chroma_mb(csrc_mb, cpred, qp, intra=False)
    return cbpc == 0


def _all_zero_quant(resid: np.ndarray, qp: int) -> bool:
    for oy in range(0, 16, 4):
        for ox in range(0, 16, 4):
            if np.any(_quant4(_fwd4(resid[oy:oy + 4, ox:ox + 4]), qp,
                              intra=False)):
                return False
    return True


def build_avcc(w: int, h: int, deblock_ctrl: bool = False,
               cabac: bool = False, bpoc: bool = False,
               nrefs: int = 1, wp: bool = False, wbidc: int = 0,
               t8x8: bool = False) -> bytes:
    """avcC (AVCDecoderConfigurationRecord) for the MP4 sample entry."""
    # Main profile: CABAC / B pictures / weighted prediction;
    # High profile (100): the 8x8 transform (r7)
    profile = 100 if t8x8 else \
        77 if (cabac or bpoc or wp or wbidc) else 66
    sps = _ep_insert(_sps(w, h, profile=profile, bpoc=bpoc, nrefs=nrefs))
    pps = _ep_insert(_pps(deblock_ctrl, cabac=cabac, wp=wp, wbidc=wbidc,
                          t8x8=t8x8))
    return (bytes([1, profile, 0, 20, 0xFF, 0xE1])
            + struct.pack(">H", len(sps) + 1) + bytes([0x67]) + sps
            + bytes([1]) + struct.pack(">H", len(pps) + 1) + bytes([0x68]) + pps)


def _pack_sample(rbsp, nal_byte: int) -> bytes:
    """RBSP (or the per-slice list a slice_rows encode returns) -> one
    length-prefixed MP4 sample; multi-slice pictures pack one NAL per
    slice (r7)."""
    rbs = rbsp if isinstance(rbsp, list) else [rbsp]
    nals = [bytes([nal_byte]) + _ep_insert(rb) for rb in rbs]
    return b"".join(struct.pack(">I", len(n)) + n for n in nals)


def encode_frames(frames: list[np.ndarray], qp: int | None = None,
                  deblock: bool = False, gop: int | None = None,
                  entropy: str = "cavlc",
                  chromas: list | None = None,
                  nrefs: int = 1,
                  wp: bool = False,
                  slice_rows: int | None = None,
                  t8x8: bool = False) -> tuple[bytes, list[bytes]]:
    """Gray frames -> (avcC record, per-frame length-prefixed NAL samples
    ready for an 'avc1' MP4 track). qp=None keeps the bit-exact I_PCM
    path; an integer qp (0..51) switches to transform coding with
    entropy="cavlc" or "cabac" (h264_cabac, r6). gop=N emits a real
    IDR+P group-of-pictures structure: every Nth frame is an IDR, the
    rest are P slices (P_SKIP / P_L0_16x16 motion compensation / intra
    fallback) predicting from the previous frame — decode with
    decode_samples. nrefs=N (r7) keeps a sliding window of up to N
    reference recons per GOP: every P slice declares its true active
    count and each inter partition carries a te(v)/unary ref_idx_l0.
    wp=True (r7) enables explicit weighted prediction: the PPS
    advertises weighted_pred, every P slice carries a pred_weight_table
    with per-reference least-squares gain/offset estimates (identity
    collapses to flag-0 defaults), and fades collapse to P_SKIP runs.
    Dimensions must be even: 4:2:0 frame cropping works
    in 2-sample units, so odd sizes are unrepresentable in this chroma
    format (spec constraint, not an implementation one)."""
    h, w = np.asarray(frames[0]).shape
    if w % 2 or h % 2:
        raise ValueError("4:2:0 H.264 needs even dimensions (crop unit is 2 px)")
    if entropy not in ("cavlc", "cabac"):
        raise ValueError(f"unknown entropy mode {entropy!r}")
    use_cabac = entropy == "cabac"
    if use_cabac:
        from . import h264_cabac as C
        enc_idr, enc_p = C.encode_idr_cabac, C.encode_p_cabac
        enc_ipcm = C.encode_idr_ipcm_cabac
    else:
        enc_idr, enc_p = encode_idr_cavlc, encode_p_cavlc
        enc_ipcm = encode_idr_ipcm
    if chromas is not None:
        assert len(chromas) == len(frames), "one chroma pair per frame"
    # CABAC slice headers always carry disable_deblocking_filter_idc
    # (h264_cabac._slice_header), so the PPS must advertise it even on
    # the qp=None all-I_PCM path
    avcc = build_avcc(w, h, deblock_ctrl=qp is not None or use_cabac,
                      cabac=use_cabac, nrefs=nrefs, wp=wp, t8x8=t8x8)
    samples = []
    ref_full = None
    cref_full = None
    frame_num = 0
    for i, f in enumerate(frames):
        cf = chromas[i] if chromas is not None else None
        if qp is None:
            rbsp = enc_ipcm(f, chroma=cf)
            sample = _pack_sample(rbsp, 0x65)  # ref_idc 3, IDR
        elif gop is None or i % gop == 0:
            if chromas is None:
                rbsp, ref_full = enc_idr(f, qp=qp, deblock=deblock,
                                         full_recon=True,
                                         slice_rows=slice_rows,
                                         **({"t8x8": True} if t8x8 else {}))
            else:
                rbsp, (ref_full, cref_full) = enc_idr(
                    f, qp=qp, deblock=deblock, full_recon=True, chroma=cf,
                    slice_rows=slice_rows,
                    **({"t8x8": True} if t8x8 else {}))
            frame_num = 1
            sample = _pack_sample(rbsp, 0x65)
            dpb = [ref_full]  # IDR: closed GOP, new reference window
            cdpb = [cref_full]
        else:
            # most-recent-first L0 window, bounded by the frames coded
            # since the IDR (the header declares the true active count)
            refs = dpb[-nrefs:][::-1]
            crefs = cdpb[-nrefs:][::-1]
            # the PPS advertises weighted_pred, so EVERY P slice must
            # carry a table — identity refs write flag-0 defaults
            wp_tab = (_estimate_wp(f, refs, chroma=cf, crefs=crefs)
                      if wp else None)
            if chromas is None:
                rbsp, ref_full = enc_p(f, refs, qp=qp,
                                       frame_num=frame_num,
                                       deblock=deblock, wp=wp_tab,
                                       slice_rows=slice_rows,
                                       **({"t8x8": True} if t8x8 else {}))
            else:
                rbsp, (ref_full, cref_full) = enc_p(
                    f, refs, qp=qp, frame_num=frame_num,
                    deblock=deblock, chroma=cf, cref=crefs, wp=wp_tab,
                    slice_rows=slice_rows,
                    **({"t8x8": True} if t8x8 else {}))
            frame_num = (frame_num + 1) & 0xF
            sample = _pack_sample(rbsp, 0x41)  # ref_idc 2, non-IDR
            dpb = (dpb + [ref_full])[-max(1, nrefs):]
            cdpb = (cdpb + [cref_full])[-max(1, nrefs):]
        samples.append(sample)
    return avcc, samples


# ------------------------------------------------- inter prediction (P)
# P macroblock partition geometries (x, y, w, h) for mb_type 1 / 2
_PART_GEOM = {"16x8": ((0, 0, 16, 8), (0, 8, 16, 8)),
              "8x16": ((0, 0, 8, 16), (8, 0, 8, 16))}


def _search_block(ref_full, tgt, px, py, mvp, search):
    """Integer-pel full search of `tgt` around the median predictor.
    Returns (sad, mv, prediction)."""
    cx, cy = mvp[0] >> 2, mvp[1] >> 2
    h, w = tgt.shape
    best = None
    for dy in range(-search, search + 1):
        for dx in range(-search, search + 1):
            cand = _interp_luma(ref_full, px, py, (cx + dx) << 2,
                                (cy + dy) << 2, w, h)
            sad = int(np.abs(tgt - cand).sum())
            key = (sad, abs(dx) + abs(dy))
            if best is None or key < best[0]:
                best = (key, ((cx + dx) << 2, (cy + dy) << 2), cand)
    (sad, _), mv, pred = best
    return sad, mv, pred


def _eval_partitions(mvs, ref_full, smb, mx, my, search):
    """Try 16x8 and 8x16 (progressively committing partition MVs so the
    second partition's predictor matches what the decoder will compute,
    then restoring state). Returns (total_sad, ptype, parts) for the
    better of the two; parts = [(mvp, mv, pred), ...]."""
    best = None
    for ptype, geom in _PART_GEOM.items():
        save_mv = mvs.mv[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4].copy()
        save_ref = mvs.ref[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4].copy()
        tot, parts = 0, []
        for idx, (ox, oy, w, h) in enumerate(geom):
            mvp_i = mvs.mvp_part(mx, my, ptype, idx)
            sad_i, mv_i, pred_i = _search_block(
                ref_full, smb[oy:oy + h, ox:ox + w],
                mx * 16 + ox, my * 16 + oy, mvp_i, search)
            parts.append((mvp_i, mv_i, pred_i))
            tot += sad_i
            mvs.set_rect(mx * 4 + ox // 4, my * 4 + oy // 4,
                         w // 4, h // 4, mv_i, 0)
        mvs.mv[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = save_mv
        mvs.ref[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = save_ref
        if best is None or tot < best[0]:
            best = (tot, ptype, parts)
    return best


# 8x8 sub-partition origins (x, y) in raster order for P_8x8
_P8_GEOM = ((0, 0), (8, 0), (0, 8), (8, 8))

# sub_mb_type -> sub-partition rects (x, y, w, h) inside the 8x8 (7.4.5.2:
# 0 = P_L0_8x8, 1 = P_L0_8x4, 2 = P_L0_4x8, 3 = P_L0_4x4)
_P_SUB_GEOM = {
    0: ((0, 0, 8, 8),),
    1: ((0, 0, 8, 4), (0, 4, 8, 4)),
    2: ((0, 0, 4, 8), (4, 0, 4, 8)),
    3: ((0, 0, 4, 4), (4, 0, 4, 4), (0, 4, 4, 4), (4, 4, 4, 4)),
}
# finer shapes carry more mvd bits: they must beat 8x8 by these margins
_P_SUB_GATE = {1: 0.85, 2: 0.85, 3: 0.70}

# Table 7-18 B sub_mb_type: value -> (shape key into _P_SUB_GEOM, mode)
# with mode 0 = L0, 1 = L1, 2 = Bi; value 0 = B_Direct_8x8 (spatial).
_B_SUB_INFO = {1: (0, 0), 2: (0, 1), 3: (0, 2), 4: (1, 0), 5: (2, 0),
               6: (1, 1), 7: (2, 1), 8: (1, 2), 9: (2, 2), 10: (3, 0),
               11: (3, 1), 12: (3, 2)}
_B_SUB_OF = {v: k for k, v in _B_SUB_INFO.items()}
# per-shape SAD gates for B sub-partitions (finer shapes and Bi carry
# more mvd bits than 8x8 single-list, so they must win by a margin)
_B8_SHAPE_GATE = {0: 0.95, 1: 0.80, 2: 0.80, 3: 0.65}


def _eval_p8x8(mvs, ref_full, smb, mx, my, search):
    """Try P_8x8 picking, per 8x8 sub-macroblock, the best of
    {8x8, 8x4, 4x8, 4x4} (r7: real sub-partitions) with progressive
    commits so every predictor matches the decoder's state. Returns
    (total_sad, parts); parts = [(sub_mb_type, [(mvp, mv, pred), ...])
    per 8x8 in raster order]."""
    save_mv = mvs.mv[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4].copy()
    save_ref = mvs.ref[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4].copy()
    tot, parts = 0, []
    for (ox8, oy8) in _P8_GEOM:
        cand = {}
        for st, rects in _P_SUB_GEOM.items():
            in_mv = mvs.mv[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4].copy()
            in_ref = mvs.ref[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4].copy()
            stot, sparts = 0, []
            for (ox, oy, w, h) in rects:
                gx, gy = ox8 + ox, oy8 + oy
                mvp_i = mvs.mvp_sub(mx * 4 + gx // 4, my * 4 + gy // 4,
                                    w // 4)
                sad_i, mv_i, pred_i = _search_block(
                    ref_full, smb[gy:gy + h, gx:gx + w],
                    mx * 16 + gx, my * 16 + gy, mvp_i, search)
                sparts.append((mvp_i, mv_i, pred_i))
                stot += sad_i
                mvs.set_rect(mx * 4 + gx // 4, my * 4 + gy // 4,
                             w // 4, h // 4, mv_i, 0)
            cand[st] = (stot, sparts)
            mvs.mv[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = in_mv
            mvs.ref[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = in_ref
        base = cand[0][0]
        best_st = 0
        for st in (1, 2, 3):
            if cand[st][0] < _P_SUB_GATE[st] * base and                     cand[st][0] < cand[best_st][0]:
                best_st = st
        stot, sparts = cand[best_st]
        # commit the chosen shape so the NEXT 8x8's predictors see it
        for (ox, oy, w, h), (_mvp_i, mv_i, _p) in zip(
                _P_SUB_GEOM[best_st], sparts):
            mvs.set_rect(mx * 4 + (ox8 + ox) // 4,
                         my * 4 + (oy8 + oy) // 4, w // 4, h // 4, mv_i, 0)
        parts.append((best_st, sparts))
        tot += stot
    mvs.mv[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = save_mv
    mvs.ref[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = save_ref
    return tot, parts


def _eval_b8x8(mvs0, mvs1, ref0_full, ref1_full, smb, mx, my, search,
               dmv0, dmv1, dpred):
    """Decision phase for B_8x8 (mb_type 22): per 8x8 sub-macroblock
    the cheapest of B_Direct_8x8 / {8x8, 8x4, 4x8, 4x4} x {L0, L1, Bi}
    (Table 7-18). Probes commit progressively into BOTH lists and are
    rolled back; the serializer then re-derives every predictor in the
    per-list bitstream order (mv fixed, mvd adapts — same contract as
    the partitioned-B encoder). Returns (total_sad, subs) with subs[j]
    = (sub_mb_type, parts) and parts[k] = [mv0, mv1] (None = list
    unused; direct sub-MBs carry parts = [])."""
    sl = (slice(my * 4, my * 4 + 4), slice(mx * 4, mx * 4 + 4))
    saves = [(m.mv[sl].copy(), m.ref[sl].copy()) for m in (mvs0, mvs1)]
    tot, subs = 0, []
    for (ox8, oy8) in _P8_GEOM:
        tgt8 = smb[oy8:oy8 + 8, ox8:ox8 + 8]
        sad_dir = int(np.abs(tgt8 - dpred[oy8:oy8 + 8, ox8:ox8 + 8]).sum())
        best = (sad_dir, 0, [])  # direct wins ties: no mvd bits
        for shape, rects in _P_SUB_GEOM.items():
            snaps = [(m.mv[sl].copy(), m.ref[sl].copy())
                     for m in (mvs0, mvs1)]
            stot = [0, 0, 0]  # L0 / L1 / Bi totals over the shape
            rinfo = []
            for (ox, oy, w, h) in rects:
                gx, gy = ox8 + ox, oy8 + oy
                tgt = smb[gy:gy + h, gx:gx + w]
                mvp0 = mvs0.mvp_sub(mx * 4 + gx // 4, my * 4 + gy // 4,
                                    w // 4)
                s0, mv_0, p0 = _search_block(ref0_full, tgt, mx * 16 + gx,
                                             my * 16 + gy, mvp0, search)
                mvp1 = mvs1.mvp_sub(mx * 4 + gx // 4, my * 4 + gy // 4,
                                    w // 4)
                s1, mv_1, p1 = _search_block(ref1_full, tgt, mx * 16 + gx,
                                             my * 16 + gy, mvp1, search)
                sbi = int(np.abs(tgt - _biblend(p0, p1)).sum())
                stot[0] += s0
                stot[1] += s1
                stot[2] += sbi
                rinfo.append((mv_0, mv_1))
                # probe commits see both lists (the serializer re-derives
                # true per-list predictors later; mv stays fixed)
                mvs0.set_rect(mx * 4 + gx // 4, my * 4 + gy // 4,
                              w // 4, h // 4, mv_0, 0)
                mvs1.set_rect(mx * 4 + gx // 4, my * 4 + gy // 4,
                              w // 4, h // 4, mv_1, 0)
            for m, (smv, sref) in zip((mvs0, mvs1), snaps):
                m.mv[sl] = smv
                m.ref[sl] = sref
            for mode in range(3):
                gate = _B8_SHAPE_GATE[shape] * (0.92 if mode == 2 else 1.0)
                if stot[mode] < gate * best[0]:
                    parts = [[mv_0 if mode in (0, 2) else None,
                              mv_1 if mode in (1, 2) else None]
                             for (mv_0, mv_1) in rinfo]
                    best = (stot[mode], _B_SUB_OF[(shape, mode)], parts)
        st8, parts = best[1], best[2]
        # commit the chosen sub-MB so the NEXT 8x8's probes see it
        if st8 == 0:
            by, bx = my * 4 + oy8 // 4, mx * 4 + ox8 // 4
            for m, dmf in ((mvs0, dmv0), (mvs1, dmv1)):
                m.mv[by:by + 2, bx:bx + 2] = \
                    dmf[oy8 // 4:oy8 // 4 + 2, ox8 // 4:ox8 // 4 + 2]
                m.ref[by:by + 2, bx:bx + 2] = 0
        else:
            shape, _mode = _B_SUB_INFO[st8]
            for (ox, oy, w, h), (mv_0, mv_1) in zip(_P_SUB_GEOM[shape],
                                                    parts):
                gx, gy = ox8 + ox, oy8 + oy
                for m, mv_i in ((mvs0, mv_0), (mvs1, mv_1)):
                    m.set_rect(mx * 4 + gx // 4, my * 4 + gy // 4,
                               w // 4, h // 4,
                               mv_i if mv_i is not None else (0, 0),
                               0 if mv_i is not None else -1)
        subs.append((st8, parts))
        tot += best[0]
    for m, (smv, sref) in zip((mvs0, mvs1), saves):
        m.mv[sl] = smv
        m.ref[sl] = sref
    return tot, subs


def _b8x8_list_pass(subs, mvs0, mvs1, mx, my, dmv0, dmv1, mvd_io):
    """Walk the per-list serialization order of a B_8x8 MB (7.3.5.1:
    all mvd_l0 in sub-MB/rect order, then all mvd_l1), committing MV
    state exactly as the bitstream does — shared by all four codec
    paths (CAVLC/CABAC x enc/dec). subs[j] = (sub_mb_type, parts);
    mvd_io(li, mvp) either writes the mvd for the already-chosen mv and
    returns that mv (encoder) or reads the mvd and returns mvp + mvd
    (decoder); the result lands in parts[k][li]. Direct sub-MBs commit
    the per-4x4 direct field in both lists; sub-MBs not using a list
    get ref -1 AFTER the list's mvd loop (matches _decode_mb_b_part)."""
    for li, (mvsx, dmf) in enumerate(((mvs0, dmv0), (mvs1, dmv1))):
        for (ox8, oy8), (st8, parts) in zip(_P8_GEOM, subs):
            if st8 == 0:
                by, bx = my * 4 + oy8 // 4, mx * 4 + ox8 // 4
                mvsx.mv[by:by + 2, bx:bx + 2] = \
                    dmf[oy8 // 4:oy8 // 4 + 2, ox8 // 4:ox8 // 4 + 2]
                mvsx.ref[by:by + 2, bx:bx + 2] = 0
                continue
            shape, mode = _B_SUB_INFO[st8]
            if mode != li and mode != 2:
                continue
            for k, (ox, oy, w, h) in enumerate(_P_SUB_GEOM[shape]):
                gx, gy = ox8 + ox, oy8 + oy
                mvp = mvsx.mvp_sub(mx * 4 + gx // 4, my * 4 + gy // 4,
                                   w // 4)
                mv = mvd_io(li, parts[k][li], mvp)
                parts[k][li] = mv
                mvsx.set_rect(mx * 4 + gx // 4, my * 4 + gy // 4,
                              w // 4, h // 4, mv, 0)
        for (ox8, oy8), (st8, _parts) in zip(_P8_GEOM, subs):
            if st8 != 0:
                _shape, mode = _B_SUB_INFO[st8]
                if mode != li and mode != 2:
                    mvsx.set_rect(mx * 4 + ox8 // 4, my * 4 + oy8 // 4,
                                  2, 2, (0, 0), -1)


def _b8x8_pred(subs, ref0, ref1, cref0, cref1, mx, my, dmv0, dmv1):
    """(luma pred 16x16, chroma pred (2, 8, 8)) for a B_8x8 MB whose MV
    state was committed by _b8x8_list_pass — recomputed identically on
    both sides of the codec so decode == recon needs no shared arrays."""
    pred = np.zeros((16, 16), np.int32)
    cpred = np.zeros((2, 8, 8), np.int32)
    for (ox8, oy8), (st8, parts) in zip(_P8_GEOM, subs):
        if st8 == 0:  # B_Direct_8x8: field-driven bi-pred over the 8x8
            pred[oy8:oy8 + 8, ox8:ox8 + 8] = _b_direct_pred(
                ref0, ref1, mx, my, dmv0, dmv1, ox8, oy8, 8, 8)
            for ci in range(2):
                cpred[ci, oy8 // 2:oy8 // 2 + 4, ox8 // 2:ox8 // 2 + 4] = \
                    _biblend(
                        _direct_chroma_one(cref0[ci], mx, my, dmv0,
                                           ox8 // 2, oy8 // 2, 4, 4),
                        _direct_chroma_one(cref1[ci], mx, my, dmv1,
                                           ox8 // 2, oy8 // 2, 4, 4))
            continue
        else:
            shape, _mode = _B_SUB_INFO[st8]
            rects = _P_SUB_GEOM[shape]
            mvsel = parts
        for (ox, oy, w, h), mvp in zip(rects, mvsel):
            gx, gy = ox8 + ox, oy8 + oy
            ps, cps = [], []
            for mv, refx, crefx in ((mvp[0], ref0, cref0),
                                    (mvp[1], ref1, cref1)):
                if mv is None:
                    continue
                ps.append(_interp_luma(refx, mx * 16 + gx, my * 16 + gy,
                                       mv[0], mv[1], w, h))
                cps.append(np.stack([
                    _interp_chroma(crefx[ci], mx * 8 + gx // 2,
                                   my * 8 + gy // 2, mv[0], mv[1],
                                   w // 2, h // 2) for ci in range(2)]))
            pred[gy:gy + h, gx:gx + w] = \
                ps[0] if len(ps) == 1 else _biblend(ps[0], ps[1])
            cp = cps[0] if len(cps) == 1 else _biblend(cps[0], cps[1])
            cpred[:, gy // 2:(gy + h) // 2, gx // 2:(gx + w) // 2] = cp
    return pred, cpred


# Table 9-4 (me mapping) coded_block_pattern for INTER: codeNum -> cbp
_CBP_INTER = (0, 16, 1, 2, 4, 8, 32, 3, 5, 10, 12, 15, 47, 7, 11, 13, 14,
              6, 9, 31, 35, 37, 42, 44, 33, 34, 36, 40, 39, 43, 45, 46, 17,
              18, 20, 24, 19, 21, 26, 28, 23, 27, 29, 30, 22, 25, 38, 41)
_CBP_INTER_INV = {v: i for i, v in enumerate(_CBP_INTER)}


def _interp_luma(ref: np.ndarray, px: int, py: int, mvx: int, mvy: int,
                 w: int = 16, h: int = 16, wp=None) -> np.ndarray:
    """Motion-compensated w x h luma block at quarter-pel MV (8.4.2.2.1):
    6-tap (1,-5,20,20,-5,1) half-pel filter + quarter-pel averaging.
    Integer MVs take the fast path (plain shifted copy with edge clamp).
    `wp` = (w, o, logWD) applies explicit weighted prediction AFTER
    interpolation (8.4.2.3.2)."""
    H, W = ref.shape
    ix, fx = mvx >> 2, mvx & 3
    iy, fy = mvy >> 2, mvy & 3
    x0, y0 = px + ix, py + iy
    if fx == 0 and fy == 0:
        xs = np.clip(np.arange(x0, x0 + w), 0, W - 1)
        ys = np.clip(np.arange(y0, y0 + h), 0, H - 1)
        return _wp_apply(ref[np.ix_(ys, xs)].astype(np.int32), wp)
    # padded integer window large enough for the 6-tap support
    xs = np.clip(np.arange(x0 - 2, x0 + w + 3), 0, W - 1)
    ys = np.clip(np.arange(y0 - 2, y0 + h + 3), 0, H - 1)
    win = ref[np.ix_(ys, xs)].astype(np.int32)  # (h+5, w+5)

    def tap6(a, axis):
        s = [a.take(range(i, a.shape[axis] - 5 + i), axis=axis) for i in range(6)]
        return s[0] - 5 * s[1] + 20 * s[2] + 20 * s[3] - 5 * s[4] + s[5]

    # integer grid G at (2.., 2..); half-pel planes per 8.4.2.2.1
    G = win[2:2 + h + 1, 2:2 + w + 1]               # (h+1, w+1) incl. +1 px
    b_full = tap6(win[2:2 + h + 1], 1)              # horizontal halves, rows int
    b = np.clip((b_full + 16) >> 5, 0, 255)         # (h+1, w)
    h_full = tap6(win[:, 2:2 + w + 1], 0)           # vertical halves, cols int
    hh = np.clip((h_full + 16) >> 5, 0, 255)        # (h, w+1)
    # center half-half j: 6-tap vertically over b_full (unclipped)
    j_full = tap6(tap6(win, 1), 0)                  # (h+1, w)
    j = np.clip((j_full + 512) >> 10, 0, 255)       # (h+1, w)

    def avg(a, bb):
        return (a + bb + 1) >> 1

    # sample positions per fractional offset (Figure 8-4 naming)
    Gm = G[:h, :w]
    bm = b[:h, :]
    hm = hh[:, :w]
    jm = j[:h, :]
    if fy == 0:
        out = {1: avg(Gm, bm), 2: bm, 3: avg(b[:h], G[:h, 1:])}[fx]
    elif fx == 0:
        out = {1: avg(Gm, hm), 2: hm, 3: avg(hm, G[1:, :w])}[fy]
    elif fx == 2 and fy == 2:
        out = jm
    elif fx == 2:
        out = {1: avg(bm, jm), 3: avg(j[:h], b[1:, :])}[fy]
    elif fy == 2:
        out = {1: avg(hm, jm), 3: avg(jm, hh[:, 1:])}[fx]
    else:  # quarter diagonals: average of nearest half-pel b and h
        bb = bm if fy == 1 else b[1:, :]
        hx = hm if fx == 1 else hh[:, 1:]
        out = avg(bb, hx)
    return _wp_apply(out.astype(np.int32), wp)


def _median_mv(cands: list[tuple[int, int] | None]) -> tuple[int, int]:
    """Component-wise median over A, B, C (None -> (0,0) per 8.4.1.3.1
    after the availability special cases handled by the caller)."""
    xs = [c[0] if c else 0 for c in cands]
    ys = [c[1] if c else 0 for c in cands]
    med = lambda v: sorted(v)[1]
    return med(xs), med(ys)


class _MvState:
    """Per-4x4-block motion state for MV prediction + deblocking:
    ref = -1 for intra/unavailable, 0 for the single L0 reference."""

    def __init__(self, mbw: int, mbh: int):
        self.mv = np.zeros((mbh * 4, mbw * 4, 2), np.int32)
        self.ref = np.full((mbh * 4, mbw * 4), -1, np.int32)
        self.wp = None  # resolved (wl, wc) weight tables (P slices, r7)

    def at(self, bx: int, by: int):
        if bx < 0 or by < _SLICE_TOP * 4 or by >= self.ref.shape[0] \
                or bx >= self.ref.shape[1]:
            return None  # unavailable (incl. above the slice top, r7)
        if self.ref[by, bx] < 0:
            return None  # intra: treated as unavailable for prediction
        return (int(self.mv[by, bx, 0]), int(self.mv[by, bx, 1]))

    def neighbors_16x16(self, mbx: int, mby: int):
        """A (left), B (above), C (above-right; D above-left fallback)."""
        bx, by = mbx * 4, mby * 4
        a = self.at(bx - 1, by)
        b = self.at(bx, by - 1)
        c = self.at(bx + 4, by - 1)
        if c is None and (by - 1 < _SLICE_TOP * 4
                          or bx + 4 >= self.ref.shape[1]):
            c = self.at(bx - 1, by - 1)  # D fallback
        return a, b, c

    def mvp_16x16(self, mbx: int, mby: int) -> tuple[int, int]:
        a, b, c = self.neighbors_16x16(mbx, mby)
        # 8.4.1.3.1: if B and C unavailable and A available -> A
        if b is None and c is None and a is not None:
            return a
        # exactly one neighbor references the target picture -> that one
        present = [m for m in (a, b, c) if m is not None]
        if len(present) == 1:
            return present[0]
        return _median_mv([a, b, c])

    def mvp_part(self, mbx: int, mby: int, ptype: str, idx: int) -> tuple[int, int]:
        """MV predictor for a 16x8 / 8x16 partition (8.4.1.3: the
        partition adjacent to its designated neighbour uses that
        neighbour directly when available; else the median over the
        partition's own A/B/C). Call AFTER the earlier partition of the
        same MB has been committed via set_rect (the decoder sees its MVs
        when predicting the second partition)."""
        bx, by = mbx * 4, mby * 4
        if ptype == "16x8":
            if idx == 0:
                ox, oy, w4, special = 0, 0, 4, "b"
            else:
                ox, oy, w4, special = 0, 2, 4, "a"
        else:  # 8x16
            if idx == 0:
                ox, oy, w4, special = 0, 0, 2, "a"
            else:
                ox, oy, w4, special = 2, 0, 2, "c"
        px, py = bx + ox, by + oy
        a = self.at(px - 1, py)
        b = self.at(px, py - 1)
        c = self.at(px + w4, py - 1)
        if c is None:
            c = self.at(px - 1, py - 1)  # D fallback
        if special == "b" and b is not None:
            return b
        if special == "a" and a is not None:
            return a
        if special == "c" and c is not None:
            return c
        if b is None and c is None and a is not None:
            return a
        present = [m for m in (a, b, c) if m is not None]
        if len(present) == 1:
            return present[0]
        return _median_mv([a, b, c])

    def mvp_sub(self, px: int, py: int, w4: int) -> tuple[int, int]:
        """Median predictor for a partition whose top-left 4x4 block is
        (px, py) with width w4 blocks (8.4.1.3: no directional special
        case below the MB-partition level — covers 8x8 and the r7
        sub-8x8 shapes). Call in sub-partition scan order: earlier
        sub-partitions are already committed, so the predictor matches
        the decoder's state exactly."""
        a = self.at(px - 1, py)
        b = self.at(px, py - 1)
        c = self.at(px + w4, py - 1)
        if c is None:
            c = self.at(px - 1, py - 1)  # D fallback
        if b is None and c is None and a is not None:
            return a
        present = [m for m in (a, b, c) if m is not None]
        if len(present) == 1:
            return present[0]
        return _median_mv([a, b, c])

    def mvp_8x8(self, mbx: int, mby: int, idx: int) -> tuple[int, int]:
        return self.mvp_sub(mbx * 4 + (idx % 2) * 2,
                            mby * 4 + (idx // 2) * 2, 2)

    def set_rect(self, bx: int, by: int, w4: int, h4: int, mv, ref: int):
        """Commit MVs for a sub-MB rectangle (4x4-block units)."""
        self.mv[by:by + h4, bx:bx + w4] = mv
        self.ref[by:by + h4, bx:bx + w4] = ref

    def skip_mv(self, mbx: int, mby: int) -> tuple[int, int]:
        """P_SKIP MV (8.4.1.1): zero when a left/above neighbour is
        missing or is a zero-MV ref-0 block; else the 16x16 predictor."""
        bx, by = mbx * 4, mby * 4
        a_out = bx - 1 < 0
        b_out = by - 1 < _SLICE_TOP * 4
        a = self.at(bx - 1, by)
        b = self.at(bx, by - 1)
        if a_out or b_out:
            return (0, 0)
        if a == (0, 0) or b == (0, 0):
            return (0, 0)
        return self.mvp_16x16(mbx, mby)

    def set_mb(self, mbx: int, mby: int, mv, ref: int):
        bx, by = mbx * 4, mby * 4
        self.mv[by:by + 4, bx:bx + 4] = mv
        self.ref[by:by + 4, bx:bx + 4] = ref


# ------------------------------------------------------- deblocking filter
# Table 8-16 alpha/beta thresholds indexed by clipped qp average
_DB_ALPHA = (0,) * 16 + (4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22,
                         25, 28, 32, 36, 40, 45, 50, 56, 63, 71, 80, 90,
                         101, 113, 127, 144, 162, 182, 203, 226, 255, 255)
_DB_BETA = (0,) * 16 + (2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8, 9,
                        9, 10, 10, 11, 11, 12, 12, 13, 13, 14, 14, 15, 15,
                        16, 16, 17, 17, 18, 18)
# Table 8-17 tc0 for bS 1..3 (best-effort spec transcription; shared by
# encoder recon and decoder, so in-profile round trips stay bit-exact)
_DB_TC0 = ((0,) * 16 + (0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
                        2, 2, 2, 2, 3, 3, 3, 4, 4, 5, 6, 6, 7, 8, 9, 10,
                        11, 13, 14),
           (0,) * 16 + (0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2,
                        2, 2, 3, 3, 3, 3, 4, 5, 6, 6, 7, 8, 9, 10, 12, 13,
                        15, 17, 19),
           (0,) * 16 + (0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3,
                        3, 4, 4, 4, 5, 6, 6, 7, 8, 9, 10, 11, 13, 14, 16,
                        18, 20, 23, 25))


def _db_filter_line(p3, p2, p1, p0, q0, q1, q2, q3, bs, alpha, beta, tc0):
    """One 8-sample line across an edge (numpy vectors over the edge
    length). Returns filtered (p2', p1', p0', q0', q1', q2')."""
    p0f, p1f, p2f = p0.copy(), p1.copy(), p2.copy()
    q0f, q1f, q2f = q0.copy(), q1.copy(), q2.copy()
    act = (np.abs(p0 - q0) < alpha) & (np.abs(p1 - p0) < beta) \
        & (np.abs(q1 - q0) < beta)
    ap = np.abs(p2 - p0) < beta
    aq = np.abs(q2 - q0) < beta
    if bs == 4:
        strong = np.abs(p0 - q0) < ((alpha >> 2) + 2)
        sp = act & strong & ap
        p0f[sp] = (p2[sp] + 2 * p1[sp] + 2 * p0[sp] + 2 * q0[sp] + q1[sp] + 4) >> 3
        p1f[sp] = (p2[sp] + p1[sp] + p0[sp] + q0[sp] + 2) >> 2
        p2f[sp] = (2 * p3[sp] + 3 * p2[sp] + p1[sp] + p0[sp] + q0[sp] + 4) >> 3
        wp = act & ~(strong & ap)
        p0f[wp] = (2 * p1[wp] + p0[wp] + q1[wp] + 2) >> 2
        sq = act & strong & aq
        q0f[sq] = (q2[sq] + 2 * q1[sq] + 2 * q0[sq] + 2 * p0[sq] + p1[sq] + 4) >> 3
        q1f[sq] = (q2[sq] + q1[sq] + q0[sq] + p0[sq] + 2) >> 2
        q2f[sq] = (2 * q3[sq] + 3 * q2[sq] + q1[sq] + q0[sq] + p0[sq] + 4) >> 3
        wq = act & ~(strong & aq)
        q0f[wq] = (2 * q1[wq] + q0[wq] + p1[wq] + 2) >> 2
    else:
        tc = tc0 + ap.astype(np.int32) + aq.astype(np.int32)
        delta = np.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
        p0f[act] = np.clip(p0 + delta, 0, 255)[act]
        q0f[act] = np.clip(q0 - delta, 0, 255)[act]
        dp = np.clip((p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1, -tc0, tc0)
        m = act & ap
        p1f[m] = (p1 + dp)[m]
        dq = np.clip((q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1, -tc0, tc0)
        m = act & aq
        q1f[m] = (q1 + dq)[m]
    return p2f, p1f, p0f, q0f, q1f, q2f


def _deblock_luma(plane: np.ndarray, qp_map: np.ndarray,
                  off_a: int = 0, off_b: int = 0,
                  t8: np.ndarray | None = None) -> np.ndarray:
    """In-loop deblocking (8.7) for an all-intra picture, luma only.
    bS = 4 on macroblock edges, 3 on internal 4x4 edges. Operates on a
    copy; intra prediction must keep using the UNFILTERED plane.
    t8 (mbh x mbw, late r7): inside an 8x8-transformed MB the internal
    4x4 edges (offsets 4 and 12) are not filtered (8.7.2)."""
    out = plane.astype(np.int32)
    mbh, mbw = qp_map.shape

    def thresholds(qp_p, qp_q):
        qpav = (int(qp_p) + int(qp_q) + 1) >> 1
        ia = min(max(qpav + off_a, 0), 51)
        ib = min(max(qpav + off_b, 0), 51)
        return _DB_ALPHA[ia], _DB_BETA[ib], ia

    for my in range(mbh):
        for mx in range(mbw):
            qp_q = qp_map[my, mx]
            in_t8 = t8 is not None and t8[my, mx]
            # vertical edges (filter columns), left to right
            for ex in range(4):
                if in_t8 and ex in (1, 3):
                    continue  # no 4x4 edges inside an 8x8 transform
                x = mx * 16 + ex * 4
                if x == 0:
                    continue
                bs = 4 if ex == 0 else 3
                qp_p = qp_map[my, mx - 1] if ex == 0 else qp_q
                alpha, beta, ia = thresholds(qp_p, qp_q)
                if alpha == 0:
                    continue
                ys = slice(my * 16, my * 16 + 16)
                cols = [out[ys, x - 4 + i] for i in range(8)]
                tc0 = _DB_TC0[bs - 1][ia] if bs < 4 else 0
                f = _db_filter_line(*cols, bs, alpha, beta, tc0)
                for i, v in enumerate(f):
                    out[ys, x - 3 + i] = np.clip(v, 0, 255)
            # horizontal edges (filter rows), top to bottom
            for ey in range(4):
                if in_t8 and ey in (1, 3):
                    continue
                y = my * 16 + ey * 4
                if y == 0:
                    continue
                bs = 4 if ey == 0 else 3
                qp_p = qp_map[my - 1, mx] if ey == 0 else qp_q
                alpha, beta, ia = thresholds(qp_p, qp_q)
                if alpha == 0:
                    continue
                xs = slice(mx * 16, mx * 16 + 16)
                rows = [out[y - 4 + i, xs] for i in range(8)]
                tc0 = _DB_TC0[bs - 1][ia] if bs < 4 else 0
                f = _db_filter_line(*rows, bs, alpha, beta, tc0)
                for i, v in enumerate(f):
                    out[y - 3 + i, xs] = np.clip(v, 0, 255)
    return np.clip(out, 0, 255).astype(np.uint8)


def _deblock_luma_inter(plane, qp_map, nnz, mvs, off_a=0, off_b=0,
                        t8=None):
    """8.7 for P pictures: per-4x4-segment bS — 4/3 when a side is intra
    (MB edge / internal), 2 when a side has coded residual, 1 on a
    >= 1-integer-pel MV difference, else unfiltered. t8 (mbh x mbw,
    late r7): 8x8-transformed MBs skip their internal 4x4 edges
    (8.7.2) and test "coded" per 8x8 block for bS 2."""
    out = plane.astype(np.int32)
    mbh, mbw = qp_map.shape

    def coded(bx, by):
        # 8x8 transform: the whole 8x8 block is the coded unit
        if t8 is not None and t8[by // 4, bx // 4]:
            b0x, b0y = (bx >> 1) << 1, (by >> 1) << 1
            return bool(nnz[b0y:b0y + 2, b0x:b0x + 2].any())
        return bool(nnz[by, bx])

    def seg_bs(bxp, byp, bxq, byq, mb_edge):
        if mvs.ref[byp, bxp] < 0 or mvs.ref[byq, bxq] < 0:
            return 4 if mb_edge else 3
        if coded(bxp, byp) or coded(bxq, byq):
            return 2
        dv = np.abs(mvs.mv[byp, bxp] - mvs.mv[byq, bxq])
        return 1 if int(dv.max()) >= 4 else 0

    for my in range(mbh):
        for mx in range(mbw):
            qp_q = qp_map[my, mx]
            in_t8 = t8 is not None and t8[my, mx]
            for vert in (True, False):
                for e in range(4):
                    if in_t8 and e in (1, 3):
                        continue  # no 4x4 edges inside an 8x8 transform
                    x = mx * 16 + e * 4 if vert else mx * 16
                    y = my * 16 if vert else my * 16 + e * 4
                    if (vert and x == 0) or (not vert and y == 0):
                        continue
                    mb_edge = e == 0
                    qp_p = (qp_map[my, mx - 1] if vert else qp_map[my - 1, mx]) \
                        if mb_edge else qp_q
                    qpav = (int(qp_p) + int(qp_q) + 1) >> 1
                    ia = min(max(qpav + off_a, 0), 51)
                    ib = min(max(qpav + off_b, 0), 51)
                    alpha, beta = _DB_ALPHA[ia], _DB_BETA[ib]
                    if alpha == 0:
                        continue
                    for seg in range(4):  # 4-sample segments along the edge
                        if vert:
                            ys = slice(my * 16 + seg * 4, my * 16 + seg * 4 + 4)
                            bxq_, byq_ = x // 4, (my * 16 + seg * 4) // 4
                            bxp_, byp_ = bxq_ - 1, byq_
                        else:
                            xs = slice(mx * 16 + seg * 4, mx * 16 + seg * 4 + 4)
                            bxq_, byq_ = (mx * 16 + seg * 4) // 4, y // 4
                            bxp_, byp_ = bxq_, byq_ - 1
                        bs = seg_bs(bxp_, byp_, bxq_, byq_, mb_edge)
                        if bs == 0:
                            continue
                        tc0 = _DB_TC0[bs - 1][ia] if bs < 4 else 0
                        if vert:
                            lines = [out[ys, x - 4 + i] for i in range(8)]
                        else:
                            lines = [out[y - 4 + i, xs] for i in range(8)]
                        f = _db_filter_line(*lines, bs, alpha, beta, tc0)
                        for i, v in enumerate(f):
                            if vert:
                                out[ys, x - 3 + i] = np.clip(v, 0, 255)
                            else:
                                out[y - 3 + i, xs] = np.clip(v, 0, 255)
    return np.clip(out, 0, 255).astype(np.uint8)


def _db_chroma_line(p1, p0, q0, q1, bs, alpha, beta, tc0):
    """8.7 chroma filter: only p0/q0 move. bs<4: +-tc clipped delta with
    tc = tc0 + 1; bs==4: 2-tap strong replacement."""
    mask = ((np.abs(p0 - q0) < alpha) & (np.abs(p1 - p0) < beta)
            & (np.abs(q1 - q0) < beta))
    if bs == 4:
        np0 = (2 * p1 + p0 + q1 + 2) >> 2
        nq0 = (2 * q1 + q0 + p1 + 2) >> 2
    else:
        tc = tc0 + 1
        delta = np.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
        np0 = p0 + delta
        nq0 = q0 - delta
    return np.where(mask, np0, p0), np.where(mask, nq0, q0)


def _deblock_chroma(cplanes, qp_map, off_a=0, off_b=0, nnz=None, mvs=None,
                    t8=None):
    """8.7 chroma deblocking (4:2:0, r7): chroma edges exist only where
    luma edges 0 / 8 sit (chroma x|y 0 and 4 per MB). bS comes from the
    LUMA edge rules at the co-sited luma blocks — static 4 (MB edge) / 3
    (internal) for all-intra pictures, the _deblock_luma_inter seg rules
    (intra side / coded residual / >=1-pel MV delta) when nnz+mvs are
    given. alpha/beta/tc0 index with QPc (Table 8-15), and only p0/q0
    change (chroma has no strong 3-tap path)."""
    out = cplanes.astype(np.int32)
    mbh, mbw = qp_map.shape

    def coded(bx, by):
        # 8x8 luma transform: coded per 8x8 block (late r7)
        if t8 is not None and t8[by // 4, bx // 4]:
            b0x, b0y = (bx >> 1) << 1, (by >> 1) << 1
            return bool(nnz[b0y:b0y + 2, b0x:b0x + 2].any())
        return bool(nnz[by, bx])

    def seg_bs(bxp, byp, bxq, byq, mb_edge):
        if mvs is None:
            return 4 if mb_edge else 3
        if mvs.ref[byp, bxp] < 0 or mvs.ref[byq, bxq] < 0:
            return 4 if mb_edge else 3
        if coded(bxp, byp) or coded(bxq, byq):
            return 2
        dv = np.abs(mvs.mv[byp, bxp] - mvs.mv[byq, bxq])
        return 1 if int(dv.max()) >= 4 else 0

    for my in range(mbh):
        for mx in range(mbw):
            qc_q = _qpc(int(qp_map[my, mx]))
            for vert in (True, False):
                for e in range(2):  # chroma edges at 0 and 4
                    xc = mx * 8 + e * 4 if vert else mx * 8
                    yc = my * 8 if vert else my * 8 + e * 4
                    if (vert and xc == 0) or (not vert and yc == 0):
                        continue
                    mb_edge = e == 0
                    qp_p = (qp_map[my, mx - 1] if vert
                            else qp_map[my - 1, mx]) if mb_edge                         else qp_map[my, mx]
                    qpav = (_qpc(int(qp_p)) + qc_q + 1) >> 1
                    ia = min(max(qpav + off_a, 0), 51)
                    ib = min(max(qpav + off_b, 0), 51)
                    alpha, beta = _DB_ALPHA[ia], _DB_BETA[ib]
                    if alpha == 0:
                        continue
                    for seg in range(4):  # 2 chroma samples per segment
                        # co-sited luma block pair for this segment
                        if vert:
                            xl = 2 * xc
                            yl = my * 16 + seg * 4
                            bxq_, byq_ = xl // 4, yl // 4
                            bxp_, byp_ = bxq_ - 1, byq_
                        else:
                            yl = 2 * yc
                            xl = mx * 16 + seg * 4
                            bxq_, byq_ = xl // 4, yl // 4
                            bxp_, byp_ = bxq_, byq_ - 1
                        bs = seg_bs(bxp_, byp_, bxq_, byq_, mb_edge)
                        if bs == 0:
                            continue
                        tc0 = _DB_TC0[bs - 1][ia] if bs < 4 else 0
                        for ci in range(2):
                            if vert:
                                ys = slice(my * 8 + seg * 2,
                                           my * 8 + seg * 2 + 2)
                                p1 = out[ci, ys, xc - 2]
                                p0 = out[ci, ys, xc - 1]
                                q0 = out[ci, ys, xc]
                                q1 = out[ci, ys, xc + 1]
                                np0, nq0 = _db_chroma_line(
                                    p1, p0, q0, q1, bs, alpha, beta, tc0)
                                out[ci, ys, xc - 1] = np.clip(np0, 0, 255)
                                out[ci, ys, xc] = np.clip(nq0, 0, 255)
                            else:
                                xs = slice(mx * 8 + seg * 2,
                                           mx * 8 + seg * 2 + 2)
                                p1 = out[ci, yc - 2, xs]
                                p0 = out[ci, yc - 1, xs]
                                q0 = out[ci, yc, xs]
                                q1 = out[ci, yc + 1, xs]
                                np0, nq0 = _db_chroma_line(
                                    p1, p0, q0, q1, bs, alpha, beta, tc0)
                                out[ci, yc - 1, xs] = np.clip(np0, 0, 255)
                                out[ci, yc, xs] = np.clip(nq0, 0, 255)
    return np.clip(out, 0, 255).astype(np.uint8)


# ------------------------------------------------------------------ decoder
def _parse_sps(rbsp: bytes) -> dict:
    r = _BitReader(rbsp)
    profile = r.u(8)
    r.u(8)
    level = r.u(8)
    r.ue()  # sps_id
    if profile in (110, 122, 244, 44, 83, 86, 118, 128):
        raise ValueError("high-profile SPS: out of decode scope")
    if profile == 100:  # High (r7): only the 8-bit 4:2:0 flat-scaling shape
        if r.ue() != 1:
            raise ValueError("chroma_format_idc != 4:2:0: out of scope")
        if r.ue() or r.ue():
            raise ValueError(">8-bit depth: out of decode scope")
        if r.u(1):
            raise ValueError("transform bypass: out of decode scope")
        if r.u(1):
            raise ValueError("scaling matrices: out of decode scope")
    log2_mfn = r.ue() + 4
    poc_type = r.ue()
    log2_poc = 0
    delta_always_zero = True
    if poc_type == 0:
        log2_poc = r.ue() + 4
    elif poc_type == 1:
        delta_always_zero = bool(r.u(1))
        r.se()
        r.se()
        for _ in range(r.ue()):
            r.se()
    max_refs = r.ue()  # max_num_ref_frames (DPB window for P multi-ref)
    r.u(1)
    mbw = r.ue() + 1
    mbh = r.ue() + 1
    fmo = r.u(1)  # frame_mbs_only
    if not fmo:
        r.u(1)
    r.u(1)  # direct_8x8
    crop = (0, 0, 0, 0)
    if r.u(1):
        crop = (r.ue(), r.ue(), r.ue(), r.ue())
    w = mbw * 16 - 2 * (crop[0] + crop[1])
    h = mbh * 16 - 2 * (crop[2] + crop[3])
    return {"profile": profile, "level": level, "mbw": mbw, "mbh": mbh,
            "w": w, "h": h, "log2_mfn": log2_mfn, "poc_type": poc_type,
            "log2_poc": log2_poc, "delta_always_zero": delta_always_zero,
            "max_refs": max_refs}


def _more_rbsp(r: "_BitReader") -> bool:
    """more_rbsp_data() (7.2): true while bits remain before the final
    rbsp_stop_one_bit (the last set bit of the RBSP)."""
    last_one = -1
    for i, byte in enumerate(r.data):
        if byte:
            # lowest set bit of the byte = the byte's LAST bit in
            # stream order (MSB-first)
            last_one = i * 8 + 7 - (byte & -byte).bit_length() + 1
    return r.pos < last_one


def _parse_pps(rbsp: bytes) -> dict:
    r = _BitReader(rbsp)
    r.ue()  # pps_id
    r.ue()  # sps_id
    cabac = r.u(1)
    pic_order_present = r.u(1)
    if r.ue() != 0:  # num_slice_groups_minus1
        raise ValueError("FMO slice groups unsupported")
    r.ue()
    r.ue()
    weighted_pred = r.u(1)   # explicit WP in P slices (r7)
    weighted_bipred = r.u(2)
    pic_init_qp = 26 + r.se()
    r.se()  # pic_init_qs
    r.se()  # chroma_qp_index_offset (in-repo streams write 0)
    deblock_ctrl = r.u(1)
    r.u(1)  # constrained_intra_pred (all-intra: no effect here)
    redundant = r.u(1)
    t8x8 = False
    if _more_rbsp(r):  # PPS extension tail (High profile, r7)
        t8x8 = bool(r.u(1))  # transform_8x8_mode_flag
        if r.u(1):
            raise ValueError("pic scaling matrices: out of decode scope")
        r.se()  # second_chroma_qp_index_offset (in-repo streams write 0)
    return {"cabac": bool(cabac), "pic_order_present": bool(pic_order_present),
            "pic_init_qp": pic_init_qp, "deblock_ctrl": bool(deblock_ctrl),
            "redundant": bool(redundant),
            "weighted_pred": bool(weighted_pred),
            "weighted_bipred_idc": weighted_bipred,
            "t8x8": t8x8}


def _avcc_param_sets(avcc: bytes) -> tuple[dict, dict]:
    """avcC record -> (parsed SPS, parsed PPS). Missing PPS (legacy
    records) falls back to this module's default PPS shape."""
    (sps_len,) = struct.unpack(">H", avcc[6:8])
    sps = _parse_sps(_ep_remove(avcc[8 + 1: 8 + sps_len]))
    pos = 8 + sps_len
    # skip any further SPS entries
    n_sps = avcc[5] & 0x1F
    for _ in range(n_sps - 1):
        (ln,) = struct.unpack(">H", avcc[pos:pos + 2])
        pos += 2 + ln
    pps = None
    if pos < len(avcc):
        n_pps = avcc[pos]
        pos += 1
        if n_pps and pos + 2 <= len(avcc):
            (ln,) = struct.unpack(">H", avcc[pos:pos + 2])
            pps = _parse_pps(_ep_remove(avcc[pos + 2 + 1: pos + 2 + ln]))
    if pps is None:
        pps = _parse_pps(_pps())
    return sps, pps


def _nc_chroma(nnz_comp, bx, by):
    a = int(nnz_comp[by, bx - 1]) if bx > 0 else None
    b = int(nnz_comp[by - 1, bx]) if by > _SLICE_TOP * 2 else None
    if a is not None and b is not None:
        return (a + b + 1) >> 1
    if a is not None:
        return a
    if b is not None:
        return b
    return 0


def _parse_chroma_residual(r, cbpc, nnz_c, mx, my):
    """Parse (advance past) chroma residuals, tracking TotalCoeff for
    nC contexts. Chroma samples are not reconstructed: callers only
    consume luma (sample_frames converts to grey anyway)."""
    if cbpc == 0:
        nnz_c[:, my * 2:my * 2 + 2, mx * 2:mx * 2 + 2] = 0
        return
    for _comp in range(2):  # ChromaDCLevel, nC = -1 for 4:2:0
        _decode_residual(r, -1, 4)
    if cbpc == 2:
        for comp in range(2):
            for blk in range(4):
                bx, by = mx * 2 + blk % 2, my * 2 + blk // 2
                nc = _nc_chroma(nnz_c[comp], bx, by)
                scan = _decode_residual(r, nc, 15)
                nnz_c[comp, by, bx] = sum(1 for v in scan if v)
    else:
        nnz_c[:, my * 2:my * 2 + 2, mx * 2:mx * 2 + 2] = 0


def _decode_mb_i4x4(r, plane, mx, my, qp, nnz, cc, modes, plane_w):
    if _T8 and r.u(1):  # I_NxN transform_size_8x8_flag (7.3.5, r7)
        return _decode_mb_i8x8(r, plane, mx, my, qp, nnz, cc, modes,
                               plane_w)
    prev_flags = []
    for _blk in range(16):
        if r.u(1):
            prev_flags.append(None)  # use predicted mode
        else:
            prev_flags.append(r.u(3))
    icp = r.ue()
    if icp > 3:
        raise ValueError("bad intra_chroma_pred_mode")
    cn = r.ue()
    if cn > 47:
        raise ValueError("bad coded_block_pattern")
    cbp = _CBP_INTRA[cn]
    if cbp:
        qp = (qp + r.se() + 52) % 52
    for blk in range(16):
        ox, oy = _BLK_XY[blk]
        px, py = mx * 16 + ox, my * 16 + oy
        bx, by = px // 4, py // 4
        pm = _pred_mode_for(modes, bx, by)
        rem = prev_flags[blk]
        mode = pm if rem is None else rem + (1 if rem >= pm else 0)
        modes[by, bx] = mode
        al, aa, aar, aal = _mb_avail(blk, px, py, plane_w)
        pred = _pred4(plane, px, py, mode, al, aa, aar, aal)
        if cbp & (1 << (blk >> 2)):
            nc = _nc_luma(nnz, bx, by)
            lv = _unscan16(_decode_residual(r, nc, 16))
            tc = int(np.count_nonzero(lv))
            rec = pred + _inv4(_dequant4(lv, qp)).astype(np.int32)
        else:
            tc = 0
            rec = pred.copy()
        nnz[by, bx] = tc
        np.clip(rec, 0, 255, rec)
        plane[py:py + 4, px:px + 4] = rec.astype(np.uint8)
    cres = _decode_chroma_residual(r, cbp >> 4, cc.nnz, mx, my, qp)
    for ci in range(2):
        cpred = _pred_chroma8(cc.planes[ci], mx, my, icp, mx > 0,
                              my > _SLICE_TOP)
        cc.store(ci, mx, my, cpred + cres[ci])
    return qp


def _decode_mb_i8x8(r, plane, mx, my, qp, nnz, cc, modes, plane_w):
    """I_8x8 intra MB (8.3.2.2, r7): four prev/rem pred modes, cbp over
    8x8 blocks, residuals as CAVLC-interleaved 4x4 runs (8.5.6). The
    transform_size_8x8_flag was already consumed by the caller."""
    _mark_t8(mx, my)
    prev_flags = []
    for _b8 in range(4):
        if r.u(1):
            prev_flags.append(None)  # use predicted mode
        else:
            prev_flags.append(r.u(3))
    icp = r.ue()
    if icp > 3:
        raise ValueError("bad intra_chroma_pred_mode")
    cn = r.ue()
    if cn > 47:
        raise ValueError("bad coded_block_pattern")
    cbp = _CBP_INTRA[cn]
    if cbp:
        qp = (qp + r.se() + 52) % 52
    mode8s = []
    for b8 in range(4):  # pred modes resolve against the 4x4 grid the
        bx, by = mx * 4 + (b8 & 1) * 2, my * 4 + (b8 >> 1) * 2
        pm = _pred_mode_for(modes, bx, by)  # encoder replicated into
        rem = prev_flags[b8]
        mode = pm if rem is None else rem + (1 if rem >= pm else 0)
        if mode > 8:
            raise ValueError("bad intra 8x8 pred mode")
        modes[by:by + 2, bx:bx + 2] = mode
        mode8s.append(mode)
    for b8 in range(4):
        ox8, oy8 = (b8 & 1) * 8, (b8 >> 1) * 8
        px, py = mx * 16 + ox8, my * 16 + oy8
        al, aa, aar, aal = _mb_avail8(b8, px, py, plane_w)
        pred = _pred8(plane, px, py, mode8s[b8], al, aa, aar, aal)
        cells = [(my * 4 + (b8 >> 1) * 2 + (k >> 1),
                  mx * 4 + (b8 & 1) * 2 + (k & 1)) for k in range(4)]
        if cbp & (1 << b8):
            runs = []
            for k, (by, bx) in enumerate(cells):
                nc = _nc_luma(nnz, bx, by)
                run = _decode_residual(r, nc, 16)
                nnz[by, bx] = int(np.count_nonzero(run))
                runs.append(run)
            q8 = _unscan8_sub(runs)
            rec = pred + _inv8(_dequant8(q8, qp))
        else:
            for by, bx in cells:
                nnz[by, bx] = 0
            rec = pred
        np.clip(rec, 0, 255, rec)
        plane[py:py + 8, px:px + 8] = rec.astype(np.uint8)
    cres = _decode_chroma_residual(r, cbp >> 4, cc.nnz, mx, my, qp)
    for ci in range(2):
        cpred = _pred_chroma8(cc.planes[ci], mx, my, icp, mx > 0,
                              my > _SLICE_TOP)
        cc.store(ci, mx, my, cpred + cres[ci])
    return qp


def _decode_mb_i16(r, mb_type, plane, mx, my, qp, nnz, cc, modes):
    t = mb_type - 1
    pm16 = t % 4
    cbpc = (t // 4) % 3
    cbpl = 15 if t >= 12 else 0
    icp = r.ue()
    if icp > 3:
        raise ValueError("bad intra_chroma_pred_mode")
    qp = (qp + r.se() + 52) % 52  # mb_qp_delta always present for I_16x16
    nc = _nc_luma(nnz, mx * 4, my * 4)  # Intra16x16DCLevel uses blk 0 ctx
    dc_lv = _unscan16(_decode_residual(r, nc, 16))
    dcv = _i16_dc_dequant(dc_lv, qp)
    pred = _pred16(plane, mx, my, pm16, mx > 0, my > _SLICE_TOP)
    out = pred.copy()
    for blk in range(16):
        ox, oy = _BLK_XY[blk]
        bx, by = mx * 4 + ox // 4, my * 4 + oy // 4
        if cbpl:
            nc = _nc_luma(nnz, bx, by)
            lv = _unscan15(_decode_residual(r, nc, 15))
            tc = int(np.count_nonzero(lv))
            d = _dequant4(lv, qp)
        else:
            tc = 0
            d = np.zeros((4, 4), np.int64)
        d[0, 0] = dcv[oy // 4, ox // 4]
        nnz[by, bx] = tc
        modes[by, bx] = -1
        out[oy:oy + 4, ox:ox + 4] += _inv4(d).astype(np.int32)
    np.clip(out, 0, 255, out)
    plane[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16] = out.astype(np.uint8)
    cres = _decode_chroma_residual(r, cbpc, cc.nnz, mx, my, qp)
    for ci in range(2):
        cpred = _pred_chroma8(cc.planes[ci], mx, my, icp, mx > 0,
                              my > _SLICE_TOP)
        cc.store(ci, mx, my, cpred + cres[ci])
    return qp


def _p_recon_tail(r, pred, plane, mx, my, qp, nnz, cc, modes, cpred,
                  t8_shape=False):
    """Shared inter-MB tail: cbp + mb_qp_delta + luma residuals over an
    already-built MC prediction, then reconstruction; `cpred` is the
    (2, 8, 8) chroma MC prediction the chroma residual adds onto.
    t8_shape: this MB shape may carry transform_size_8x8_flag when the
    PPS enables the 8x8 transform (High profile, r7) — 16x16/16x8/8x16
    partitions, and P_8x8 with all-8x8 sub-partitions."""
    cn = r.ue()
    if cn > 47:
        raise ValueError("bad coded_block_pattern")
    cbp = _CBP_INTER[cn]
    use8 = False
    if _T8 and (cbp & 15) and t8_shape:
        use8 = bool(r.u(1))  # transform_size_8x8_flag (7.3.5)
        if use8:
            _mark_t8(mx, my)
    if cbp:
        qp = (qp + r.se() + 52) % 52
    out = pred.copy()
    if use8:  # four 8x8 blocks, CAVLC-interleaved 4x4 runs (8.5.6)
        for b8 in range(4):
            oy8, ox8 = (b8 >> 1) * 8, (b8 & 1) * 8
            cells = [(my * 4 + (b8 >> 1) * 2 + (k >> 1),
                      mx * 4 + (b8 & 1) * 2 + (k & 1)) for k in range(4)]
            if cbp & (1 << b8):
                runs = []
                for k, (by, bx) in enumerate(cells):
                    nc = _nc_luma(nnz, bx, by)
                    run = _decode_residual(r, nc, 16)
                    nnz[by, bx] = int(np.count_nonzero(run))
                    runs.append(run)
                q8 = _unscan8_sub(runs)
                out[oy8:oy8 + 8, ox8:ox8 + 8] += \
                    _inv8(_dequant8(q8, qp)).astype(np.int64)
            else:
                for by, bx in cells:
                    nnz[by, bx] = 0
            for by, bx in cells:
                modes[by, bx] = -1
    else:
        for blk in range(16):
            ox, oy = _BLK_XY[blk]
            bx, by = mx * 4 + ox // 4, my * 4 + oy // 4
            if cbp & (1 << (blk >> 2)):
                nc = _nc_luma(nnz, bx, by)
                lv = _unscan16(_decode_residual(r, nc, 16))
                tc = int(np.count_nonzero(lv))
                out[oy:oy + 4, ox:ox + 4] += _inv4(_dequant4(lv, qp)).astype(np.int32)
            else:
                tc = 0
            nnz[by, bx] = tc
            modes[by, bx] = -1
    np.clip(out, 0, 255, out)
    plane[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16] = out.astype(np.uint8)
    cres = _decode_chroma_residual(r, cbp >> 4, cc.nnz, mx, my, qp)
    for ci in range(2):
        cc.store(ci, mx, my, cpred[ci] + cres[ci])
    return qp


def _read_ref_idx(r, nrefs):
    """ref_idx_l0, te(v) (9.1): one INVERTED bit when exactly two
    references are active, ue(v) otherwise."""
    ridx = (1 - r.u(1)) if nrefs == 2 else r.ue()
    if ridx >= nrefs:
        raise ValueError("ref_idx_l0 out of range")
    return ridx


def _write_ref_idx(bw, nrefs, ridx):
    if nrefs == 2:
        bw.u(1 - ridx, 1)
    else:
        bw.ue(ridx)


def _decode_mb_p16(r, plane, refs, mx, my, qp, nnz, cc, modes, mvs,
                   nrefs=1):
    """P_L0_16x16: ref_idx_l0 (te(v), only when >1 reference is active,
    r7) + mvd + optional residual over the MC prediction."""
    ridx = _read_ref_idx(r, nrefs) if nrefs > 1 else 0
    mvp = mvs.mvp_16x16(mx, my)
    mvd = (r.se(), r.se())
    mv = (mvp[0] + mvd[0], mvp[1] + mvd[1])
    pred = _interp_luma(refs[ridx], mx * 16, my * 16, mv[0], mv[1],
                        wp=_wpl(mvs, ridx))
    cpred = np.stack([cc.mc(ci, mx, my, mv, ridx=ridx,
                            wp=_wpc(mvs, ridx, ci)) for ci in range(2)])
    mvs.set_mb(mx, my, mv, ridx)
    return _p_recon_tail(r, pred, plane, mx, my, qp, nnz, cc, modes, cpred,
                         t8_shape=True)


def _decode_mb_p_part(r, mb_type, plane, refs, mx, my, qp, nnz, cc,
                      modes, mvs, nrefs=1):
    """P_L0_L0_16x8 / P_L0_L0_8x16 (mb_type 1 / 2): per-partition
    ref_idx_l0 fields first (7.3.5.2 order, r7), then one mvd per
    partition; the second partition's predictor sees the first's
    committed MVs (8.4.1.3)."""
    ptype = "16x8" if mb_type == 1 else "8x16"
    ridxs = ([_read_ref_idx(r, nrefs) for _ in range(2)]
             if nrefs > 1 else [0, 0])
    pred = np.zeros((16, 16), np.int32)
    cpred = np.zeros((2, 8, 8), np.int32)
    for idx, (ox, oy, w, h) in enumerate(_PART_GEOM[ptype]):
        ridx = ridxs[idx]
        mvp = mvs.mvp_part(mx, my, ptype, idx)
        mvd = (r.se(), r.se())
        mv = (mvp[0] + mvd[0], mvp[1] + mvd[1])
        pred[oy:oy + h, ox:ox + w] = _interp_luma(
            refs[ridx], mx * 16 + ox, my * 16 + oy, mv[0], mv[1], w, h,
            wp=_wpl(mvs, ridx))
        for ci in range(2):
            cpred[ci, oy // 2:(oy + h) // 2, ox // 2:(ox + w) // 2] = \
                _interp_chroma(cc.refl[ridx][ci], mx * 8 + ox // 2,
                               my * 8 + oy // 2, mv[0], mv[1],
                               w // 2, h // 2, wp=_wpc(mvs, ridx, ci))
        mvs.set_rect(mx * 4 + ox // 4, my * 4 + oy // 4, w // 4, h // 4,
                     mv, ridx)
    return _p_recon_tail(r, pred, plane, mx, my, qp, nnz, cc, modes, cpred,
                         t8_shape=True)


def _decode_mb_p8x8(r, plane, refs, mx, my, qp, nnz, cc, modes, mvs,
                    nrefs=1, mb_type=3):
    """P_8x8 / P_8x8ref0 (mb_type 3 / 4): per 8x8 sub-macroblock any of
    the sub_mb_type shapes 8x8 / 8x4 / 4x8 / 4x4 (r7 — one mvd per
    sub-partition, median predictors at sub-block granularity).
    With multiple active references (r7), one ref_idx_l0 per 8x8 rides
    between the sub_mb_type and mvd loops (7.3.5.2); P_8x8ref0 (4)
    infers every ref_idx as 0."""
    sts = []
    for _ in range(4):
        st = r.ue()
        if st > 3:
            raise ValueError("bad P sub_mb_type")
        sts.append(st)
    ridxs = ([_read_ref_idx(r, nrefs) for _ in range(4)]
             if nrefs > 1 and mb_type == 3 else [0] * 4)
    pred = np.zeros((16, 16), np.int32)
    cpred = np.zeros((2, 8, 8), np.int32)
    for (ox8, oy8), st, ridx in zip(_P8_GEOM, sts, ridxs):
        for (ox, oy, w, h) in _P_SUB_GEOM[st]:
            gx, gy = ox8 + ox, oy8 + oy
            mvp = mvs.mvp_sub(mx * 4 + gx // 4, my * 4 + gy // 4, w // 4)
            mvd = (r.se(), r.se())
            mv = (mvp[0] + mvd[0], mvp[1] + mvd[1])
            pred[gy:gy + h, gx:gx + w] = _interp_luma(
                refs[ridx], mx * 16 + gx, my * 16 + gy, mv[0], mv[1], w, h,
                wp=_wpl(mvs, ridx))
            for ci in range(2):
                cpred[ci, gy // 2:(gy + h) // 2, gx // 2:(gx + w) // 2] = \
                    _interp_chroma(cc.refl[ridx][ci], mx * 8 + gx // 2,
                                   my * 8 + gy // 2, mv[0], mv[1],
                                   w // 2, h // 2, wp=_wpc(mvs, ridx, ci))
            mvs.set_rect(mx * 4 + gx // 4, my * 4 + gy // 4,
                         w // 4, h // 4, mv, ridx)
    return _p_recon_tail(r, pred, plane, mx, my, qp, nnz, cc, modes, cpred,
                         t8_shape=all(st == 0 for st in sts))


def _div_trunc(a: int, b: int) -> int:
    """Integer division truncating toward zero — the spec's '/' on
    possibly-negative operands (Python // floors instead)."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def _temporal_fields(col_mv, col_ref, cur_poc, poc0, poc1):
    """8.4.1.2.3 temporal direct motion: whole-frame per-4x4 mvL0/mvL1
    fields derived from the COLOCATED picture's (RefPicList1[0])
    motion field, scaled by POC distances. Intra colocated blocks
    (ref < 0) contribute mvCol = 0 with refIdxCol treated as 0.

        td = Clip3(-128, 127, poc1 - poc0)
        tb = Clip3(-128, 127, cur_poc - poc0)
        tx = (16384 + Abs(td / 2)) / td          (truncating ops)
        DistScaleFactor = Clip3(-1024, 1023, (tb * tx + 32) >> 6)
        mvL0 = (DistScaleFactor * mvCol + 128) >> 8
        mvL1 = mvL0 - mvCol

    With one reference per list, refIdxL0 = refIdxCol = 0 always, so
    only the MV scaling remains. Shared by encoder and decoder —
    decode == recon is exact by construction, and the math IS the ISO
    derivation (SPS codes direct_8x8_inference_flag = 0, so per-4x4
    granularity is the spec-conformant shape). Returns (tf0, tf1),
    each (H/4, W/4, 2) int32."""
    mvcol = np.where((col_ref < 0)[:, :, None], 0, col_mv).astype(np.int64)
    td = min(127, max(-128, poc1 - poc0))
    tb = min(127, max(-128, cur_poc - poc0))
    if td == 0:
        return mvcol.astype(np.int32), np.zeros_like(mvcol, np.int32)
    tx = _div_trunc(16384 + abs(td) // 2, td)
    dsf = min(1023, max(-1024, (tb * tx + 32) >> 6))
    tf0 = (dsf * mvcol + 128) >> 8  # arithmetic shift == spec '>>'
    tf1 = tf0 - mvcol
    return tf0.astype(np.int32), tf1.astype(np.int32)


def _b_direct_mvs(mvs0, mvs1, mx, my, tf=None):
    """Direct motion for one MB as a pair of (4, 4, 2) int32 fields.
    tf=None — simplified SPATIAL direct (8.4.1.2.2 shape): per list,
    the median predictor over the MB's neighbors (all-unavailable ->
    zero), always bi-predictive, one MV for the whole MB (broadcast).
    tf=(tf0, tf1) — TEMPORAL direct (8.4.1.2.3): the MB's slice of the
    precomputed whole-frame fields, per-4x4 MVs. Both shapes are shared
    by encoder and decoder, so round trips stay bit-exact."""
    if tf is not None:
        by, bx = my * 4, mx * 4
        return (tf[0][by:by + 4, bx:bx + 4],
                tf[1][by:by + 4, bx:bx + 4])
    f0 = np.empty((4, 4, 2), np.int32)
    f0[:] = mvs0.mvp_16x16(mx, my)
    f1 = np.empty((4, 4, 2), np.int32)
    f1[:] = mvs1.mvp_16x16(mx, my)
    return f0, f1


def _field_uniform(f):
    """The single (x, y) MV if every 4x4 block of the field agrees,
    else None. Spatial direct fields are always uniform — keeping the
    one-call 16x16 MC fast path (bit-identical: the 6-tap filter is
    position-invariant, so per-4x4 MC with equal MVs matches)."""
    if (f == f[0, 0]).all():
        return int(f[0, 0, 0]), int(f[0, 0, 1])
    return None


def _b_direct_pred(ref0, ref1, mx, my, f0, f1, ox=0, oy=0, w=16, h=16):
    """Bi-predictive direct luma MC over a w x h region of the MB
    (block-aligned): one MC call per list when the field is uniform,
    per-4x4 otherwise."""
    px, py = mx * 16 + ox, my * 16 + oy
    preds = []
    for f, ref in ((f0, ref0), (f1, ref1)):
        sub = f[oy // 4:(oy + h) // 4, ox // 4:(ox + w) // 4]
        mv = _field_uniform(sub)
        if mv is not None:
            preds.append(_interp_luma(ref, px, py, mv[0], mv[1], w, h))
            continue
        p = np.empty((h, w), np.int64)
        for r_ in range(h // 4):
            for c_ in range(w // 4):
                mvb = sub[r_, c_]
                p[r_ * 4:r_ * 4 + 4, c_ * 4:c_ * 4 + 4] = _interp_luma(
                    ref, px + c_ * 4, py + r_ * 4,
                    int(mvb[0]), int(mvb[1]), 4, 4)
        preds.append(p)
    return _biblend(preds[0], preds[1])


def _b_commit_direct(mvs0, mvs1, mx, my, f0, f1):
    by, bx = my * 4, mx * 4
    for mvsx, f in ((mvs0, f0), (mvs1, f1)):
        mvsx.mv[by:by + 4, bx:bx + 4] = f
        mvsx.ref[by:by + 4, bx:bx + 4] = 0


def _direct_chroma_one(cref, mx, my, f, ox=0, oy=0, w=8, h=8):
    """One-list direct chroma MC over a w x h chroma region (half-res;
    per-2x2 when the field varies — each 4x4 luma block owns a 2x2
    chroma block)."""
    px, py = mx * 8 + ox, my * 8 + oy
    sub = f[oy // 2:(oy + h) // 2, ox // 2:(ox + w) // 2]
    mv = _field_uniform(sub)
    if mv is not None:
        return _interp_chroma(cref, px, py, mv[0], mv[1], w, h)
    p = np.empty((h, w), np.int64)
    for r_ in range(h // 2):
        for c_ in range(w // 2):
            mvb = sub[r_, c_]
            p[r_ * 2:r_ * 2 + 2, c_ * 2:c_ * 2 + 2] = _interp_chroma(
                cref, px + c_ * 2, py + r_ * 2,
                int(mvb[0]), int(mvb[1]), 2, 2)
    return p


def _b_chroma_bi(cc, mx, my, f0, f1):
    """Decoder-side bi-predictive direct chroma for the whole MB."""
    return np.stack([
        _biblend(_direct_chroma_one(cc.ref[ci], mx, my, f0),
                 _direct_chroma_one(cc.ref2[ci], mx, my, f1))
        for ci in range(2)])


def _b_chroma_direct_enc(cref0, cref1, mx, my, f0, f1):
    """Encoder-side twin of _b_chroma_bi (references passed directly)."""
    return np.stack([
        _biblend(_direct_chroma_one(cref0[ci], mx, my, f0),
                 _direct_chroma_one(cref1[ci], mx, my, f1))
        for ci in range(2)])


def _skip_mb_b(plane, ref0, ref1, mx, my, nnz, cc, modes, mvs0, mvs1,
               tf=None):
    """B_SKIP: direct bi-prediction (spatial, or temporal when tf is
    the precomputed field pair), zero residual."""
    mv0, mv1 = _b_direct_mvs(mvs0, mvs1, mx, my, tf)
    pred = _b_direct_pred(ref0, ref1, mx, my, mv0, mv1)
    plane[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16] = \
        np.clip(pred, 0, 255).astype(np.uint8)
    cpred = _b_chroma_bi(cc, mx, my, mv0, mv1)
    for ci in range(2):
        cc.store(ci, mx, my, cpred[ci])
    nnz[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = 0
    cc.nnz[:, my * 2:my * 2 + 2, mx * 2:mx * 2 + 2] = 0
    modes[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = -1
    _b_commit_direct(mvs0, mvs1, mx, my, mv0, mv1)


def _decode_mb_b16(r, mb_type, plane, ref0, ref1, mx, my, qp, nnz, cc,
                   modes, mvs0, mvs1, tf=None):
    """B_Direct_16x16 (0: spatial direct + residual) / B_L0_16x16 /
    B_L1_16x16 / B_Bi_16x16 (1/2/3: one mvd per used list, per-list
    median MV prediction); bi-prediction averages the two MC blocks
    ((a + b + 1) >> 1, default weights)."""
    if mb_type == 0:
        mv0, mv1 = _b_direct_mvs(mvs0, mvs1, mx, my, tf)
        pred = _b_direct_pred(ref0, ref1, mx, my, mv0, mv1)
        cpred = _b_chroma_bi(cc, mx, my, mv0, mv1)
        _b_commit_direct(mvs0, mvs1, mx, my, mv0, mv1)
        return _p_recon_tail(r, pred, plane, mx, my, qp, nnz, cc, modes,
                             cpred)
    use = (mb_type in (1, 3), mb_type in (2, 3))  # (L0, L1)
    preds = []
    cpreds = []
    for li, (u, mvsx, refx) in enumerate(zip(use, (mvs0, mvs1),
                                             (ref0, ref1))):
        if not u:
            mvsx.set_mb(mx, my, (0, 0), -1)
            continue
        mvp = mvsx.mvp_16x16(mx, my)
        mvd = (r.se(), r.se())
        mv = (mvp[0] + mvd[0], mvp[1] + mvd[1])
        preds.append(_interp_luma(refx, mx * 16, my * 16, mv[0], mv[1]))
        cpreds.append(np.stack([cc.mc(ci, mx, my, mv, li)
                                for ci in range(2)]))
        mvsx.set_mb(mx, my, mv, 0)
    pred = preds[0] if len(preds) == 1 else _biblend(preds[0], preds[1])
    cpred = cpreds[0] if len(cpreds) == 1 else \
        _biblend(cpreds[0], cpreds[1])
    return _p_recon_tail(r, pred, plane, mx, my, qp, nnz, cc, modes, cpred,
                         t8_shape=True)


# Table 7-14 partitioned B mb_types 4..21: (geometry, part0 mode,
# part1 mode) with modes 0 = L0, 1 = L1, 2 = Bi
_B_PART_TYPES = {}
for _i, (_m0, _m1) in enumerate(
        ((0, 0), (1, 1), (0, 1), (1, 0), (0, 2), (1, 2), (2, 0), (2, 1),
         (2, 2))):
    _B_PART_TYPES[4 + 2 * _i] = ("16x8", _m0, _m1)
    _B_PART_TYPES[5 + 2 * _i] = ("8x16", _m0, _m1)


def _decode_mb_b_part(r, mb_type, plane, ref0, ref1, mx, my, qp, nnz, cc,
                      modes, mvs0, mvs1):
    """Partitioned B macroblocks (r7): two 16x8 / 8x16 partitions, each
    predicting from L0, L1, or Bi. mvds are grouped BY LIST in the
    bitstream (7.3.5.1: all mvd_l0 then all mvd_l1), so MV prediction
    commits progressively per list — decoder state mirrors the
    encoder's serialization order exactly."""
    ptype, m0, m1 = _B_PART_TYPES[mb_type]
    geom = _PART_GEOM[ptype]
    pmodes = (m0, m1)
    mvs_of = (mvs0, mvs1)
    mv_sel: list[list] = [[None, None], [None, None]]  # [list][part]
    for li in range(2):
        for idx in range(2):
            uses = pmodes[idx] == li or pmodes[idx] == 2
            if not uses:
                continue
            mvp = mvs_of[li].mvp_part(mx, my, ptype, idx)
            mvd = (r.se(), r.se())
            mv = (mvp[0] + mvd[0], mvp[1] + mvd[1])
            mv_sel[li][idx] = mv
            ox, oy, w, h = geom[idx]
            mvs_of[li].set_rect(mx * 4 + ox // 4, my * 4 + oy // 4,
                                w // 4, h // 4, mv, 0)
        # partitions not using this list are unavailable for prediction
        for idx in range(2):
            if mv_sel[li][idx] is None:
                ox, oy, w, h = geom[idx]
                mvs_of[li].set_rect(mx * 4 + ox // 4, my * 4 + oy // 4,
                                    w // 4, h // 4, (0, 0), -1)
    pred = np.zeros((16, 16), np.int32)
    cpred = np.zeros((2, 8, 8), np.int32)
    for idx, (ox, oy, w, h) in enumerate(geom):
        preds = []
        cpreds = []
        for li, refx in ((0, ref0), (1, ref1)):
            mv = mv_sel[li][idx]
            if mv is None:
                continue
            preds.append(_interp_luma(refx, mx * 16 + ox, my * 16 + oy,
                                      mv[0], mv[1], w, h))
            cref = cc.ref if li == 0 else cc.ref2
            cpreds.append(np.stack([
                _interp_chroma(cref[ci], mx * 8 + ox // 2,
                               my * 8 + oy // 2, mv[0], mv[1],
                               w // 2, h // 2) for ci in range(2)]))
        lp = preds[0] if len(preds) == 1 else _biblend(preds[0], preds[1])
        cp = cpreds[0] if len(cpreds) == 1 else \
            _biblend(cpreds[0], cpreds[1])
        pred[oy:oy + h, ox:ox + w] = lp
        cpred[:, oy // 2:(oy + h) // 2, ox // 2:(ox + w) // 2] = cp
    return _p_recon_tail(r, pred, plane, mx, my, qp, nnz, cc, modes, cpred,
                         t8_shape=True)


def _decode_mb_b8x8(r, plane, ref0, ref1, mx, my, qp, nnz, cc, modes,
                    mvs0, mvs1, tf=None):
    """B_8x8 (mb_type 22): four sub_mb_type fields (Table 7-18 —
    B_Direct_8x8 or {8x8, 8x4, 4x8, 4x4} x {L0, L1, Bi}), mvds grouped
    BY LIST (7.3.5.1) with per-list progressive predictor commits via
    the shared _b8x8_list_pass traversal."""
    sts = []
    for _ in range(4):
        st = r.ue()
        if st > 12:
            raise ValueError("bad B sub_mb_type")
        sts.append(st)
    subs = [(st, [] if st == 0 else
             [[None, None] for _ in _P_SUB_GEOM[_B_SUB_INFO[st][0]]])
            for st in sts]
    dmv0, dmv1 = _b_direct_mvs(mvs0, mvs1, mx, my, tf)

    def mvd_io(_li, _mv, mvp):
        mvd = (r.se(), r.se())
        return (mvp[0] + mvd[0], mvp[1] + mvd[1])

    _b8x8_list_pass(subs, mvs0, mvs1, mx, my, dmv0, dmv1, mvd_io)
    pred, cpred = _b8x8_pred(subs, ref0, ref1, cc.ref, cc.ref2, mx, my,
                             dmv0, dmv1)
    return _p_recon_tail(r, pred, plane, mx, my, qp, nnz, cc, modes, cpred,
                         t8_shape=all(s in (1, 2, 3) for s in sts))


def _skip_mb(plane, ref, mx, my, nnz, cc, modes, mvs):
    mv = mvs.skip_mv(mx, my)
    pred = _interp_luma(ref, mx * 16, my * 16, mv[0], mv[1],
                        wp=_wpl(mvs, 0))  # P_SKIP is refIdx 0
    plane[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16] = \
        np.clip(pred, 0, 255).astype(np.uint8)
    for ci in range(2):
        cc.store(ci, mx, my, cc.mc(ci, mx, my, mv, wp=_wpc(mvs, 0, ci)))
    nnz[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = 0
    cc.nnz[:, my * 2:my * 2 + 2, mx * 2:mx * 2 + 2] = 0
    modes[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = -1
    mvs.set_mb(mx, my, mv, 0)


def _parse_slice_header(r, sps, pps, nal_type, nal_ref_idc: int = 3) -> dict:
    """Slice header (7.3.3) — shared by the CAVLC and CABAC (h264_cabac)
    slice decoders; the header itself is never CABAC-coded. first_mb
    lands in the returned dict (multi-slice pictures, r7); decode_sample
    validates row alignment and ordering across a picture's slices."""
    first_mb = r.ue()
    stype = r.ue()
    is_p = stype % 5 == 0
    is_b = stype % 5 == 1
    if not is_p and not is_b and stype % 5 != 2:
        raise ValueError("SP/SI slice: out of decode scope")
    r.ue()  # pps_id
    r.u(sps["log2_mfn"])  # frame_num
    if nal_type == 5:
        r.ue()  # idr_pic_id
    poc = None
    if sps["poc_type"] == 0:
        poc = r.u(sps["log2_poc"])  # pic_order_cnt_lsb
        if pps["pic_order_present"]:
            r.se()  # delta_pic_order_cnt_bottom
    elif sps["poc_type"] == 1 and not sps["delta_always_zero"]:
        r.se()
        if pps["pic_order_present"]:
            r.se()
    if pps["redundant"]:
        r.ue()
    direct_spatial = True
    if is_b:
        direct_spatial = bool(r.u(1))  # 0 = temporal direct (8.4.1.2.3)
    nrefs = 1
    if is_p or is_b:
        if r.u(1):  # num_ref_idx_active_override_flag
            nrefs = r.ue() + 1  # num_ref_idx_l0_active_minus1
            if nrefs > 16:
                raise ValueError("bad num_ref_idx_l0_active")
            if is_b:
                if nrefs != 1:  # multi-ref stays P-only in this profile
                    raise ValueError(
                        "multiple L0 references in a B slice unsupported")
                if r.ue() != 0:  # num_ref_idx_l1_active_minus1
                    raise ValueError("multiple L1 references unsupported")
        if r.u(1):  # ref_pic_list_modification_flag_l0
            raise ValueError("ref pic list modification unsupported")
        if is_b and r.u(1):  # ref_pic_list_modification_flag_l1
            raise ValueError("ref pic list modification unsupported")
    wp_tab = None
    if is_p and pps.get("weighted_pred"):
        wp_tab = _parse_pred_weight_table(r, nrefs)  # explicit WP (r7)
    if is_b and pps.get("weighted_bipred_idc", 0) not in (0, 2):
        # idc 2 (implicit, POC-derived weights) decodes since r7; idc 1
        # (explicit B tables) stays out of profile, idc 3 is reserved
        raise ValueError("explicit weighted bi-prediction unsupported")
    if nal_type == 5:
        r.u(1)  # no_output_of_prior_pics
        r.u(1)  # long_term_reference
    elif nal_ref_idc:  # dec_ref_pic_marking only for reference pictures
        if r.u(1):
            raise ValueError("adaptive ref pic marking unsupported")
    if pps["cabac"] and (is_p or is_b):
        if r.ue() > 2:  # cabac_init_idc (the in-repo uniform init ignores it)
            raise ValueError("bad cabac_init_idc")
    qp = pps["pic_init_qp"] + r.se()
    do_filter, off_a, off_b = True, 0, 0
    if pps["deblock_ctrl"]:
        idc = r.ue()
        if idc == 1:
            do_filter = False
        elif idc != 2:  # idc 2 (no slice-crossing) == full filter here:
            off_a = 2 * r.se()  # single-slice pictures have no such edges
            off_b = 2 * r.se()
    return {"is_p": is_p, "is_b": is_b, "qp": qp, "do_filter": do_filter,
            "off_a": off_a, "off_b": off_b, "poc": poc,
            "direct_spatial": direct_spatial, "nrefs": nrefs,
            "wp": wp_tab, "first_mb": first_mb}


def _decode_islice(r, sps, pps, nal_type, ref: np.ndarray | None = None,
                   nal_ref_idc: int = 3,
                   ref2: np.ndarray | None = None,
                   cref: np.ndarray | None = None,
                   cref2: np.ndarray | None = None,
                   col_motion=None, pocs=None, motion_out=None,
                   hdr=None, rows=None, pic=None):
    """Returns (luma FULL plane, chroma (2, H/2, W/2) FULL planes).
    col_motion/pocs feed temporal-direct B slices (decode_samples
    threads the L1 anchor's motion field + POCs); motion_out, when a
    list, receives this picture's (mv, ref) 4x4 motion field so the
    caller can keep it for later temporal-direct derivation.
    Multi-slice pictures (r7): decode_sample calls once per slice NAL
    with the pre-parsed `hdr`, the slice's MB-row range `rows`, and a
    shared `pic` state dict; non-final slices return None."""
    if hdr is None:
        hdr = _parse_slice_header(r, sps, pps, nal_type, nal_ref_idc)
    is_p, is_b = hdr["is_p"], hdr["is_b"]
    if is_p and ref is None:
        raise ValueError("P slice without a decoded reference frame")
    if is_b and (ref is None or ref2 is None):
        raise ValueError("B slice without both reference frames")
    tf = None
    if is_b and not hdr["direct_spatial"]:
        if col_motion is None or pocs is None:
            raise ValueError(
                "temporal direct B slice needs the colocated anchor's "
                "motion field (decode via decode_samples)")
        tf = _temporal_fields(col_motion[0], col_motion[1], *pocs)
    if is_b:  # implicit weighted bi-prediction (8.4.2.3.1, r7)
        if pps.get("weighted_bipred_idc", 0) == 2:
            if pocs is None:
                raise ValueError(
                    "implicit weighted bi-prediction needs reference "
                    "POCs (decode via decode_samples)")
            _set_bipred(_implicit_bipred_weights(*pocs))
        else:
            _set_bipred(None)
    qp = hdr["qp"]
    do_filter, off_a, off_b = hdr["do_filter"], hdr["off_a"], hdr["off_b"]
    _set_t8(pps.get("t8x8", False))
    mbw, mbh = sps["mbw"], sps["mbh"]
    # L0 reference list: `ref` is one FULL plane or a most-recent-first
    # list (multi-reference P slices, r7); B slices stay 1+1 (L0/L1)
    refs = _ref_list(ref) if ref is not None else None
    nrefs = hdr["nrefs"]
    if is_p and nrefs > len(refs):
        raise ValueError(
            f"slice needs {nrefs} reference frames, got {len(refs)}")
    if is_b:
        ref = refs[0]
    plane = np.zeros((mbh * 16, mbw * 16), np.uint8)
    plane_w = mbw * 16
    nnz = np.zeros((mbh * 4, mbw * 4), np.int32)
    # pre-chroma (gray) reference pictures: mid-grey chroma, matching
    # what their own decode produced
    crefs = None
    if is_p or is_b:
        crefs = _ref_list(cref) if cref is not None else []
        while len(crefs) < (nrefs if is_p else 1):
            crefs.append(np.full((2, mbh * 8, mbw * 8), 128, np.uint8))
    if is_b and cref2 is None:
        cref2 = np.full((2, mbh * 8, mbw * 8), 128, np.uint8)
    r0, r1 = rows if rows is not None else (0, mbh)
    _set_slice_top(r0)
    if pic:  # shared picture state across this picture's slices (r7)
        plane, nnz = pic["plane"], pic["nnz"]
        cc, modes, qp_map = pic["cc"], pic["modes"], pic["qp_map"]
        mvs, mvs1 = pic["mvs"], pic["mvs1"]
        t8m = pic["t8m"]
    else:
        cc = _ChromaState(mbw, mbh, ref=crefs, ref2=cref2)
        modes = np.full((mbh * 4, mbw * 4), -1, np.int32)
        qp_map = np.zeros((mbh, mbw), np.int32)
        mvs = _MvState(mbw, mbh) if (is_p or is_b) else None
        mvs1 = _MvState(mbw, mbh) if is_b else None  # L1 motion state
        t8m = np.zeros((mbh, mbw), np.int32) \
            if pps.get("t8x8") else None
        if pic is not None:
            pic.update(plane=plane, nnz=nnz, cc=cc, modes=modes,
                       qp_map=qp_map, mvs=mvs, mvs1=mvs1, t8m=t8m)
    _set_t8map(t8m)  # per-MB flags feed the 8.7 edge derivation
    if is_p and hdr.get("wp") is not None:  # explicit WP (r7)
        mvs.wp = _resolve_wp(hdr["wp"], nrefs)
    run_pending = None  # skip run not yet read for the next coded MB
    for my in range(r0, r1):
        for mx in range(mbw):
            if is_b:
                if run_pending is None:
                    run_pending = r.ue()  # mb_skip_run (B_SKIP = direct)
                if run_pending > 0:
                    run_pending -= 1
                    _skip_mb_b(plane, ref, ref2, mx, my, nnz, cc, modes,
                               mvs, mvs1, tf)
                    qp_map[my, mx] = qp
                    continue
                run_pending = None  # this position is the coded MB
                mb_type = r.ue()
                if 0 <= mb_type <= 3:  # B_Direct / B_L0 / B_L1 / B_Bi 16x16
                    qp = _decode_mb_b16(r, mb_type, plane, ref, ref2, mx, my,
                                        qp, nnz, cc, modes, mvs, mvs1, tf)
                    qp_map[my, mx] = qp
                    continue
                if mb_type < 22:  # partitioned 16x8 / 8x16 B types (r7)
                    qp = _decode_mb_b_part(r, mb_type, plane, ref, ref2,
                                           mx, my, qp, nnz, cc, modes,
                                           mvs, mvs1)
                    qp_map[my, mx] = qp
                    continue
                if mb_type == 22:  # B_8x8 (r7)
                    qp = _decode_mb_b8x8(r, plane, ref, ref2, mx, my, qp,
                                         nnz, cc, modes, mvs, mvs1, tf)
                    qp_map[my, mx] = qp
                    continue
                mb_type -= 23  # intra in a B slice
            elif is_p:
                if run_pending is None:
                    run_pending = r.ue()  # mb_skip_run
                if run_pending > 0:
                    run_pending -= 1
                    _skip_mb(plane, refs[0], mx, my, nnz, cc, modes, mvs)
                    qp_map[my, mx] = qp
                    continue
                run_pending = None  # this position is the coded MB
            if not is_b:
                mb_type = r.ue()
            if is_p:
                if mb_type == 0:  # P_L0_16x16
                    qp = _decode_mb_p16(r, plane, refs, mx, my, qp, nnz,
                                        cc, modes, mvs, nrefs)
                    qp_map[my, mx] = qp
                    continue
                if mb_type in (1, 2):  # P_L0_L0_16x8 / P_L0_L0_8x16 (r6)
                    qp = _decode_mb_p_part(r, mb_type, plane, refs, mx, my,
                                           qp, nnz, cc, modes, mvs, nrefs)
                    qp_map[my, mx] = qp
                    continue
                if mb_type in (3, 4):  # P_8x8 / P_8x8ref0 (r6)
                    qp = _decode_mb_p8x8(r, plane, refs, mx, my, qp, nnz,
                                         cc, modes, mvs, nrefs, mb_type)
                    qp_map[my, mx] = qp
                    continue
                mb_type -= 5  # intra in a P slice
            if mb_type == 25:  # I_PCM
                r.align()
                luma = np.frombuffer(r.raw(256), np.uint8).reshape(16, 16)
                for ci in range(2):  # raw Cb then Cr samples (r7)
                    cc.store(ci, mx, my,
                             np.frombuffer(r.raw(64), np.uint8)
                               .reshape(8, 8).astype(np.int32))
                plane[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16] = luma
                # 9.2.1: I_PCM neighbours count as TotalCoeff 16
                nnz[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = 16
                cc.nnz[:, my * 2:my * 2 + 2, mx * 2:mx * 2 + 2] = 16
                modes[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = -1
                qp_map[my, mx] = 0  # 8.7: I_PCM filters with QP 0
            elif mb_type == 0:
                qp = _decode_mb_i4x4(r, plane, mx, my, qp, nnz, cc,
                                     modes, plane_w)
                qp_map[my, mx] = qp
            elif 1 <= mb_type <= 24:
                qp = _decode_mb_i16(r, mb_type, plane, mx, my, qp, nnz,
                                    cc, modes)
                qp_map[my, mx] = qp
            else:
                raise ValueError(f"bad mb_type {mb_type}")
            if is_p or is_b:
                mvs.set_mb(mx, my, (0, 0), -1)  # intra: no motion
                if is_b:
                    mvs1.set_mb(mx, my, (0, 0), -1)
    _set_slice_top(0)
    if r1 < mbh:
        return None  # more slices of this picture follow (r7)
    _set_t8map(None)
    if do_filter and int(qp_map.max()) + max(off_a, off_b, 0) >= 16:
        # intra/inter prediction consumed the unfiltered plane above; the
        # OUTPUT picture is the filtered one (8.7). Below qp 16 every
        # alpha threshold is 0 (I_PCM pictures: qp 0), so skip.
        if is_p or is_b:
            # B pictures filter with the L0 motion state (in-repo
            # approximation of the two-list bS rules; the in-repo encoder
            # always disables the filter for B slices, so decode == recon)
            plane = _deblock_luma_inter(plane, qp_map, nnz, mvs, off_a,
                                        off_b, t8=t8m)
            cc.planes = _deblock_chroma(cc.planes, qp_map, off_a, off_b,
                                        nnz=nnz, mvs=mvs, t8=t8m)
        else:
            plane = _deblock_luma(plane, qp_map, off_a, off_b, t8=t8m)
            cc.planes = _deblock_chroma(cc.planes, qp_map, off_a, off_b)
    if motion_out is not None:
        if mvs is not None:
            motion_out.append((mvs.mv.copy(), mvs.ref.copy()))
        else:  # I slice: all-intra colocated field (mvCol = 0)
            motion_out.append((np.zeros((mbh * 4, mbw * 4, 2), np.int32),
                               np.full((mbh * 4, mbw * 4), -1, np.int32)))
    # FULL (uncropped) planes: the DPB reference for motion compensation
    # is the decoded mb-aligned picture; cropping is display-only
    return plane, cc.planes


def _peek_slice(sample: bytes, avcc: bytes, sps: dict, pps: dict):
    """(nal_type, nal_ref_idc, parsed header) of the first slice NAL —
    non-consuming: decode_sample re-parses."""
    length_size = (avcc[4] & 3) + 1
    pos = 0
    while pos + length_size <= len(sample):
        ln = int.from_bytes(sample[pos: pos + length_size], "big")
        nal = sample[pos + length_size: pos + length_size + ln]
        pos += length_size + ln
        if not nal:
            continue
        typ = nal[0] & 0x1F
        if typ not in (1, 5):
            continue
        r = _BitReader(_ep_remove(nal[1:]))
        try:
            hdr = _parse_slice_header(r, sps, pps, typ, (nal[0] >> 5) & 3)
        except (IndexError, TypeError, KeyError, struct.error) as e:
            raise ValueError(f"corrupt H.264 sample ({type(e).__name__})")
        return typ, (nal[0] >> 5) & 3, hdr
    raise ValueError("no slice NAL in sample")


def _poc_msb(lsb: int, prev_msb: int, prev_lsb: int, max_lsb: int) -> int:
    """PicOrderCntMsb derivation (8.2.1.1) for poc_type 0: a big backward
    jump of the lsb means it wrapped forward (+max_lsb), a big forward
    jump means the reference was past a wrap (−max_lsb)."""
    if lsb < prev_lsb and prev_lsb - lsb >= max_lsb // 2:
        return prev_msb + max_lsb
    if lsb > prev_lsb and lsb - prev_lsb > max_lsb // 2:
        return prev_msb - max_lsb
    return prev_msb


def decode_samples(samples: list[bytes], avcc: bytes,
                   with_chroma: bool = False) -> list:
    """Sequential GOP decode. poc_type-2 streams (I/P only): 1-deep DPB,
    decode order == display order. poc_type-0 streams (B-enabled, r6):
    a 2-deep reference DPB; each B picture predicts from the nearest
    reference before (L0) and after (L1) its POC, IDRs reset the DPB
    (closed GOPs), and the output is reordered to DISPLAY order by POC.
    Returns cropped gray frames, or (gray, (2, h/2, w/2) chroma) pairs
    when with_chroma=True (r7: chroma reconstructs for real)."""
    sps, pps = _avcc_param_sets(avcc)
    h2, w2 = (sps["h"] + 1) // 2, (sps["w"] + 1) // 2

    def crop(yc):
        y, c = yc
        return ((y[:sps["h"], :sps["w"]], c[:, :h2, :w2]) if with_chroma
                else y[:sps["h"], :sps["w"]])

    if sps["poc_type"] != 0:
        # I/P-only streams: sliding-window DPB, most-recent-first L0
        # (multi-reference P slices read as many entries as their
        # header's num_ref_idx_l0_active, r7); IDRs reset the window
        window = max(1, sps["max_refs"])
        out = []
        dpb0: list = []  # (luma FULL, chroma FULL), newest last
        for s in samples:
            typ, _ref_idc, _hdr = _peek_slice(s, avcc, sps, pps)
            if typ == 5:
                dpb0 = []  # IDR: closed GOP
            refs = [e[0] for e in reversed(dpb0)] or None
            crefs = [e[1] for e in reversed(dpb0)] or None
            full = decode_sample(s, avcc, ref=refs, cref=crefs,
                                 full_plane=True, with_chroma=True)
            dpb0 = (dpb0 + [full])[-window:]
            out.append(crop(full))
        return out
    dpb: list[tuple[int, tuple, tuple]] = []  # (poc, FULL (y, c), motion)
    outputs: list[tuple[int, int, object]] = []  # (poc, seq, cropped)
    # poc_type-0 PicOrderCntMsb derivation (8.2.1.1): the lsb wraps at
    # MaxPicOrderCntLsb, so streams longer than MaxPicOrderCntLsb/2
    # display frames would interleave GOPs if sorted by raw lsb;
    # prev_{msb,lsb} track the previous REFERENCE picture in decode order
    max_lsb = 1 << sps["log2_poc"]
    prev_msb = prev_lsb = 0
    for seq, s in enumerate(samples):
        typ, ref_idc, hdr = _peek_slice(s, avcc, sps, pps)
        if typ == 5:
            dpb = []  # IDR: closed GOP, reset references
            prev_msb = prev_lsb = 0  # POC restarts at an IDR
        if hdr["poc"] is not None:
            msb = _poc_msb(hdr["poc"], prev_msb, prev_lsb, max_lsb)
            poc = msb + hdr["poc"]
            if ref_idc:
                prev_msb, prev_lsb = msb, hdr["poc"]
        else:
            poc = 2 * seq
        mo: list = []
        if hdr["is_b"]:
            before = [e for e in dpb if e[0] < poc]
            after = [e for e in dpb if e[0] > poc]
            if not before or not after:
                raise ValueError("B picture without surrounding references")
            l0e = max(before, key=lambda e: e[0])
            l1e = min(after, key=lambda e: e[0])
            l0, l1 = l0e[1], l1e[1]
            # temporal-direct slices scale the L1 anchor's (colocated)
            # motion by POC distances; spatial slices ignore these
            full = decode_sample(s, avcc, ref=l0[0], ref2=l1[0],
                                 cref=l0[1], cref2=l1[1],
                                 full_plane=True, with_chroma=True,
                                 col_motion=l1e[2],
                                 pocs=(poc, l0e[0], l1e[0]))
        else:
            ref = dpb[-1][1] if dpb else None
            full = decode_sample(s, avcc, ref=ref[0] if ref else None,
                                 cref=ref[1] if ref else None,
                                 full_plane=True, with_chroma=True,
                                 motion_out=mo)
        if ref_idc:
            dpb.append((poc, full, mo[0] if mo else None))
            dpb = dpb[-2:]  # sliding window, 2-deep
        outputs.append((poc, seq, crop(full)))
    outputs.sort(key=lambda e: (e[0], e[1]))
    return [p for _poc, _seq, p in outputs]


def decode_sample(sample: bytes, avcc: bytes, ref: np.ndarray | None = None,
                  full_plane: bool = False,
                  ref2: np.ndarray | None = None,
                  cref: np.ndarray | None = None,
                  cref2: np.ndarray | None = None,
                  with_chroma: bool = False,
                  col_motion=None, pocs=None, motion_out=None):
    """Length-prefixed NAL sample + avcC -> gray frame (or (gray,
    chroma) when with_chroma=True). Decodes I_PCM, CAVLC intra
    (I_4x4 / I_16x16), and CAVLC P slices (P_SKIP +
    P_L0_16x16 + 16x8/8x16 partitions, quarter-pel MC, `ref` =
    previous FULL decoded plane, `cref` its chroma —
    use decode_samples for GOP streams; B slices additionally take
    `ref2`/`cref2` = the future reference). 4:2:0 chroma reconstructs
    for real since r7 (intra DC/H/V prediction, 2x2 Hadamard DC + AC
    residual, eighth-pel bilinear MC). CABAC slice data decodes via
    h264_cabac (in-repo-profile streams, r6). P_8x8 decodes every
    sub_mb_type shape (8x8/8x4/4x8/4x4, r7); partitioned B
    macroblocks decode every 16x8/8x16 type 4..21 (r7); B_8x8
    (mb_type 22, full Table 7-18) and TEMPORAL direct
    (direct_spatial_mv_pred_flag 0, 8.4.1.2.3 POC scaling — needs
    col_motion/pocs, threaded by decode_samples) decode since r7.
    Out-of-profile features (high-profile tools, multiple reference
    frames) raise ValueError — the documented well-formed-unsupported
    stub path in sample_frames."""
    sps, pps = _avcc_param_sets(avcc)
    length_size = (avcc[4] & 3) + 1
    mbw, mbh = sps["mbw"], sps["mbh"]
    # collect the picture's slice NALs first (multi-slice pictures, r7)
    slices = []  # (nal_type, nal_ref_idc, hdr, positioned reader)
    pos = 0
    while pos + length_size <= len(sample):
        ln = int.from_bytes(sample[pos: pos + length_size], "big")
        nal = sample[pos + length_size: pos + length_size + ln]
        pos += length_size + ln
        if not nal:
            continue
        typ = nal[0] & 0x1F
        if typ not in (1, 5):
            continue  # SPS/PPS/SEI in-band: skip
        r = _BitReader(_ep_remove(nal[1:]))
        try:
            hdr = _parse_slice_header(r, sps, pps, typ, (nal[0] >> 5) & 3)
        except (IndexError, TypeError, KeyError, struct.error) as e:
            raise ValueError(f"corrupt H.264 sample ({type(e).__name__})")
        slices.append((typ, (nal[0] >> 5) & 3, hdr, r))
    if not slices:
        raise ValueError("no slice NAL in sample")
    firsts = [s[2]["first_mb"] for s in slices]
    if (firsts[0] != 0 or any(f % mbw for f in firsts)
            or any(b <= a for a, b in zip(firsts, firsts[1:]))
            or any(f >= mbw * mbh for f in firsts)):
        raise ValueError(
            "unsupported slice layout: slices must start at MB-row "
            "boundaries, in raster order, starting at 0")
    if any(s[2]["is_p"] != slices[0][2]["is_p"]
           or s[2]["is_b"] != slices[0][2]["is_b"] for s in slices):
        raise ValueError("mixed slice types within a picture")
    ranges = [(firsts[i] // mbw,
               firsts[i + 1] // mbw if i + 1 < len(slices) else mbh)
              for i in range(len(slices))]
    pic: dict = {}
    full = None
    for (typ, ref_idc, hdr, r), rows in zip(slices, ranges):
        try:
            if pps["cabac"]:
                from . import h264_cabac

                if hdr["is_p"] and ref is None:
                    raise ValueError("P slice without a decoded reference frame")
                if hdr["is_b"] and (ref is None or ref2 is None):
                    raise ValueError("B slice without both reference frames")
                full = h264_cabac.decode_slice(r, sps, pps, hdr, ref,
                                               hdr["is_p"], ref2=ref2,
                                               cref=cref, cref2=cref2,
                                               col_motion=col_motion,
                                               pocs=pocs,
                                               motion_out=motion_out,
                                               rows=rows, pic=pic)
            else:
                full = _decode_islice(r, sps, pps, typ, ref=ref,
                                      nal_ref_idc=ref_idc,
                                      ref2=ref2, cref=cref, cref2=cref2,
                                      col_motion=col_motion, pocs=pocs,
                                      motion_out=motion_out,
                                      hdr=hdr, rows=rows, pic=pic)
        except (IndexError, TypeError, KeyError, struct.error) as e:
            # corrupted entropy payload desynced the parser: normalize to
            # the ValueError contract callers map to errors-as-data
            raise ValueError(f"corrupt H.264 sample ({type(e).__name__})")
    if full is None:  # last slice did not reach the bottom MB row
        raise ValueError("picture's slices do not cover the frame")
    y, c = full
    if not with_chroma:
        return y if full_plane else y[:sps["h"], :sps["w"]]
    if full_plane:
        return y, c
    h2, w2 = (sps["h"] + 1) // 2, (sps["w"] + 1) // 2
    return y[:sps["h"], :sps["w"]], c[:, :h2, :w2]
