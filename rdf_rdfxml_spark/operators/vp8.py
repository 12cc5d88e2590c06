"""Lossy VP8 still-image codec (intra-only key frames) — pure numpy.

The dominant real-corpus WebP form is LOSSY (VP8) — round 5 closed
lossless VP8L, leaving this as the largest user-visible codec gap
(round-5 VERDICT #1). This module implements, from the public spec
(RFC 6386 "VP8 Data Format and Decoding Guide"):

* the boolean arithmetic (range) decoder AND encoder (§7),
* key-frame header / segmentation / loop-filter / quantizer parsing
  (§9-§10),
* intra prediction: 16x16 luma (DC/V/H/TM), 8x8 chroma, and the ten
  4x4 B_PRED sub-modes with the above-right edge rules (§12),
* DCT coefficient token decoding with contextual probabilities,
  coefficient bands, and the secondary Y2 WHT (§13),
* dequantization lookup tables with the Y2/UV multipliers (§14.1),
* the exact integer inverse DCT (20091/35468 multipliers) and inverse
  Walsh-Hadamard transform (§14.3-14.4),
* both loop filters (simple + normal, §15), applied in spec MB order,
* a spec-valid-subset ENCODER (key frame, 16x16 intra modes, one token
  partition, explicitly transmitted coefficient probabilities) so the
  suite can round-trip lossy streams without any external encoder, and
* integer BT.601 RGB<->YUV 4:2:0 conversion (deterministic; the
  conversion is outside the VP8 spec, so it is pinned here and shared
  by encoder and decoder).

Inter-coded frames, golden/altref references, and VP8 animation remain
the declared typed-error seam (DecodeError), as before.

RECONSTRUCTED-TABLE CAVEAT (same policy as webp.py's near-distance
table): the three large probability tables — ``DEFAULT_COEF_PROBS``
(4x8x3x11), ``COEF_UPDATE_PROBS`` (4x8x3x11) and ``KF_BMODE_PROBS``
(10x10x9) — are reconstructed offline from the author's knowledge of
RFC 6386 §13.5 / §11.5 and may contain entry-level deviations from the
published tables. For streams produced by THIS encoder the tables are
shared so decoding is exact by construction (pytest-pinned). For
EXTERNAL lossy WebP files a deviating entry is worse than a symbol
bias: a bool decoded under the wrong probability can flip its VALUE,
and because header/mode syntax is data-dependent (e.g. a coefficient-
probability update flag decoded as 1 consumes an extra 8-bit literal),
a flipped bit can DESYNC the parse entirely — mis-parsed headers,
garbage macroblocks, or a DecodeError, not merely biased pixels.
External-file decoding is therefore best-effort until the tables are
byte-verified against RFC 6386 (a drop-in swap when network exists;
the existing round-trip tests are the regression net). Everything
structural (trees, bands, zigzag, transforms, filters, quantizer
tables, bitstream layout) follows the spec text directly.

Reference parity note: ruby-rdf/rdf-rdfxml has no media pipeline at
all; this codec exists for the brief's multimodal training-data
operators (decode -> feature-extract over binary columns).
"""

from __future__ import annotations

import numpy as np

from .multimodal import DecodeError

# --- boolean (range) coder, RFC 6386 §7 -----------------------------------


class BoolDecoder:
    """RFC 6386 §7.3 bool_decoder: 8-bit probability split of a
    255-wide range, byte-fed, MSB-first."""

    __slots__ = ("data", "pos", "range", "value", "bit_count")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 2
        self.value = ((data[0] << 8) | data[1]) if len(data) >= 2 else (
            (data[0] << 8) if data else 0)
        self.range = 255
        self.bit_count = 0

    def bool(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                if self.pos < len(self.data):
                    self.value |= self.data[self.pos]
                self.pos += 1
                if self.pos > len(self.data) + 8:
                    raise DecodeError("VP8 bool decoder ran off the end")
        return ret

    def literal(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.bool(128)
        return v

    def signed_literal(self, nbits: int) -> int:
        v = self.literal(nbits)
        return -v if self.bool(128) else v

    def tree(self, tree: tuple, probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.bool(probs[i >> 1])]
            if i <= 0:
                return -i


class BoolEncoder:
    """RFC 6386 §7.2 / Appendix bool_encoder with carry propagation."""

    __slots__ = ("out", "range", "bottom", "bit_count")

    def __init__(self):
        self.out = bytearray()
        self.range = 255
        self.bottom = 0
        self.bit_count = 24

    def _carry(self):
        i = len(self.out) - 1
        while i >= 0 and self.out[i] == 255:
            self.out[i] = 0
            i -= 1
        if i >= 0:
            self.out[i] += 1

    def bool(self, prob: int, value: int):
        split = 1 + (((self.range - 1) * prob) >> 8)
        if value:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8

    def literal(self, nbits: int, value: int):
        for b in range(nbits - 1, -1, -1):
            self.bool(128, (value >> b) & 1)

    def signed_literal(self, nbits: int, value: int):
        self.literal(nbits, abs(value))
        self.bool(128, 1 if value < 0 else 0)

    def tree(self, tree: tuple, probs, value: int, start: int = 0):
        # walk the tree to the leaf, emitting the branch bits
        path = []
        def find(i):
            for b in (0, 1):
                j = tree[i + b]
                if j <= 0 and j == -value:
                    path.append((i, b))
                    return True
                if j > 0 and find(j):
                    path.append((i, b))
                    return True
            return False
        if not find(start):
            raise ValueError(f"value {value} not in tree")
        for i, b in reversed(path):
            self.bool(probs[i >> 1], b)

    def finish(self) -> bytes:
        c = self.bit_count
        v = self.bottom
        if v & (1 << (32 - c)):
            self._carry()
        v = (v << (c & 7)) & 0xFFFFFFFF
        c >>= 3
        while c > 0:
            v = (v << 8) & 0xFFFFFFFF
            c -= 1
        for _ in range(4):
            self.out.append((v >> 24) & 0xFF)
            v = (v << 8) & 0xFFFFFFFF
        return bytes(self.out)

# --- trees & mode tables (RFC 6386 §8.2, §11.2-11.5) ----------------------

# intra 16x16 luma modes
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
# intra 4x4 sub-modes
(B_DC_PRED, B_TM_PRED, B_VE_PRED, B_HE_PRED, B_LD_PRED, B_RD_PRED,
 B_VR_PRED, B_VL_PRED, B_HD_PRED, B_HU_PRED) = range(10)

KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
KF_YMODE_PROBS = (145, 156, 163, 128)

UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
KF_UV_MODE_PROBS = (142, 114, 183)

BMODE_TREE = (-B_DC_PRED, 2,
              -B_TM_PRED, 4,
              -B_VE_PRED, 6,
              8, 12,
              -B_HE_PRED, 10,
              -B_RD_PRED, -B_VR_PRED,
              -B_LD_PRED, 14,
              -B_VL_PRED, 16,
              -B_HD_PRED, -B_HU_PRED)

# RECONSTRUCTED (see module docstring): context-dependent key-frame
# B_PRED sub-mode probabilities, kf_bmode_probs[above_mode][left_mode].
# Anchor rows are recalled from the published table; the remainder uses
# a neutral reconstruction. Never affects range-decoder sync, only
# symbol likelihoods; shared by this module's encoder and decoder.
_BMODE_NEUTRAL = (120, 110, 80, 100, 110, 105, 110, 120, 110)
KF_BMODE_PROBS = [[list(_BMODE_NEUTRAL) for _ in range(10)]
                  for _ in range(10)]
KF_BMODE_PROBS[0][0] = [231, 120, 48, 89, 115, 113, 120, 152, 112]
KF_BMODE_PROBS[0][1] = [152, 179, 64, 126, 170, 118, 46, 70, 95]
KF_BMODE_PROBS[1][0] = [247, 49, 154, 248, 182, 128, 128, 173, 128]
KF_BMODE_PROBS[1][1] = [98, 88, 153, 180, 175, 194, 253, 158, 128]
KF_BMODE_PROBS[2][2] = [68, 86, 115, 149, 163, 166, 167, 105, 134]

# --- coefficient coding (RFC 6386 §13) ------------------------------------

# token alphabet
(DCT_0, DCT_1, DCT_2, DCT_3, DCT_4, DCT_CAT1, DCT_CAT2, DCT_CAT3,
 DCT_CAT4, DCT_CAT5, DCT_CAT6, DCT_EOB) = range(12)

COEF_TREE = (-DCT_EOB, 2,
             -DCT_0, 4,
             -DCT_1, 6,
             8, 12,
             -DCT_2, 10,
             -DCT_3, -DCT_4,
             14, 16,
             -DCT_CAT1, -DCT_CAT2,
             18, 20,
             -DCT_CAT3, -DCT_CAT4,
             -DCT_CAT5, -DCT_CAT6)

# category extra-bit probabilities and base values (§13.2)
CAT_PROBS = {DCT_CAT1: (159,),
             DCT_CAT2: (165, 145),
             DCT_CAT3: (173, 148, 140),
             DCT_CAT4: (176, 155, 140, 135),
             DCT_CAT5: (180, 157, 141, 134, 130),
             DCT_CAT6: (254, 254, 243, 230, 196, 177, 153, 140, 133,
                        130, 129)}
CAT_BASE = {DCT_CAT1: 5, DCT_CAT2: 7, DCT_CAT3: 11, DCT_CAT4: 19,
            DCT_CAT5: 35, DCT_CAT6: 67}

COEF_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

# block types ("plane" in §13.3): 0 = Y after Y2 (coeffs start at 1),
# 1 = Y2, 2 = chroma, 3 = Y with DC (B_PRED macroblocks)
PLANE_Y_NO_DC, PLANE_Y2, PLANE_UV, PLANE_Y_WITH_DC = 0, 1, 2, 3

# RECONSTRUCTED (see module docstring): default token probabilities
# [block_type][band][context][token-tree-position].
DEFAULT_COEF_PROBS = [
 [  # block type 0: Y after Y2
  [[253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128],
   [189, 129, 242, 255, 227, 213, 255, 219, 128, 128, 128],
   [106, 126, 227, 252, 214, 209, 255, 255, 128, 128, 128]],
  [[1, 98, 248, 255, 236, 226, 255, 255, 128, 128, 128],
   [181, 133, 238, 254, 221, 234, 255, 154, 128, 128, 128],
   [78, 134, 202, 247, 198, 180, 255, 219, 128, 128, 128]],
  [[1, 185, 249, 255, 243, 255, 128, 128, 128, 128, 128],
   [184, 150, 247, 255, 236, 224, 128, 128, 128, 128, 128],
   [77, 110, 216, 255, 236, 230, 128, 128, 128, 128, 128]],
  [[1, 101, 251, 255, 241, 255, 128, 128, 128, 128, 128],
   [170, 139, 241, 252, 236, 209, 255, 255, 128, 128, 128],
   [37, 116, 196, 243, 228, 255, 255, 255, 128, 128, 128]],
  [[1, 204, 254, 255, 245, 255, 128, 128, 128, 128, 128],
   [207, 160, 250, 255, 238, 128, 128, 128, 128, 128, 128],
   [102, 103, 225, 255, 210, 240, 128, 128, 128, 128, 128]],
  [[1, 152, 252, 255, 240, 255, 128, 128, 128, 128, 128],
   [177, 135, 243, 255, 234, 225, 128, 128, 128, 128, 128],
   [80, 129, 211, 255, 194, 224, 128, 128, 128, 128, 128]],
  [[1, 1, 243, 255, 254, 255, 128, 128, 128, 128, 128],
   [238, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128],
   [75, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128]],
  [[128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128],
   [128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128],
   [128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128]],
 ],
 [  # block type 1: Y2
  [[198, 35, 237, 223, 193, 187, 162, 160, 145, 155, 62],
   [131, 45, 198, 221, 172, 176, 220, 157, 252, 221, 1],
   [68, 47, 146, 208, 149, 167, 221, 162, 255, 223, 128]],
  [[1, 149, 241, 255, 221, 224, 255, 255, 128, 128, 128],
   [184, 141, 234, 253, 222, 220, 255, 199, 128, 128, 128],
   [81, 99, 181, 242, 176, 190, 249, 202, 255, 255, 128]],
  [[1, 129, 232, 253, 214, 197, 242, 196, 255, 255, 128],
   [99, 121, 210, 250, 201, 198, 255, 202, 128, 128, 128],
   [23, 91, 163, 242, 170, 187, 247, 210, 255, 255, 128]],
  [[1, 200, 246, 255, 234, 255, 128, 128, 128, 128, 128],
   [109, 178, 241, 255, 231, 245, 255, 255, 128, 128, 128],
   [44, 130, 201, 253, 205, 192, 255, 255, 128, 128, 128]],
  [[1, 132, 239, 251, 219, 209, 255, 165, 128, 128, 128],
   [94, 136, 225, 251, 218, 190, 255, 255, 128, 128, 128],
   [22, 100, 174, 245, 186, 161, 255, 199, 128, 128, 128]],
  [[1, 182, 249, 255, 232, 235, 128, 128, 128, 128, 128],
   [124, 143, 241, 255, 227, 234, 128, 128, 128, 128, 128],
   [35, 77, 181, 251, 193, 211, 255, 205, 128, 128, 128]],
  [[1, 157, 247, 255, 236, 231, 255, 255, 128, 128, 128],
   [121, 141, 235, 255, 225, 227, 255, 255, 128, 128, 128],
   [45, 99, 188, 251, 195, 217, 255, 224, 128, 128, 128]],
  [[1, 1, 251, 255, 213, 255, 128, 128, 128, 128, 128],
   [203, 1, 248, 255, 255, 128, 128, 128, 128, 128, 128],
   [137, 1, 177, 255, 224, 255, 128, 128, 128, 128, 128]],
 ],
 [  # block type 2: chroma
  [[253, 9, 248, 251, 207, 208, 255, 192, 128, 128, 128],
   [175, 13, 224, 243, 193, 185, 249, 198, 255, 255, 128],
   [73, 17, 171, 221, 161, 179, 236, 167, 255, 234, 128]],
  [[1, 95, 247, 253, 212, 183, 255, 255, 128, 128, 128],
   [239, 90, 244, 250, 211, 209, 255, 255, 128, 128, 128],
   [155, 77, 195, 248, 188, 195, 255, 255, 128, 128, 128]],
  [[1, 24, 239, 251, 218, 219, 255, 205, 128, 128, 128],
   [201, 51, 219, 255, 196, 186, 128, 128, 128, 128, 128],
   [69, 46, 190, 239, 201, 218, 255, 228, 128, 128, 128]],
  [[1, 191, 251, 255, 255, 128, 128, 128, 128, 128, 128],
   [223, 165, 249, 255, 213, 255, 128, 128, 128, 128, 128],
   [141, 124, 248, 255, 255, 128, 128, 128, 128, 128, 128]],
  [[1, 16, 248, 255, 255, 128, 128, 128, 128, 128, 128],
   [190, 36, 230, 255, 236, 255, 128, 128, 128, 128, 128],
   [149, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128]],
  [[1, 226, 255, 128, 128, 128, 128, 128, 128, 128, 128],
   [247, 192, 255, 128, 128, 128, 128, 128, 128, 128, 128],
   [240, 128, 255, 128, 128, 128, 128, 128, 128, 128, 128]],
  [[1, 134, 252, 255, 255, 128, 128, 128, 128, 128, 128],
   [213, 62, 250, 255, 255, 128, 128, 128, 128, 128, 128],
   [55, 93, 255, 128, 128, 128, 128, 128, 128, 128, 128]],
  [[128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128],
   [128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128],
   [128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128]],
 ],
 [  # block type 3: Y with DC
  [[202, 24, 213, 235, 186, 191, 220, 160, 240, 175, 255],
   [126, 38, 166, 203, 139, 166, 190, 119, 160, 169, 194],
   [61, 46, 138, 219, 151, 178, 240, 170, 255, 216, 128]],
  [[1, 112, 230, 250, 199, 191, 247, 159, 255, 255, 128],
   [166, 109, 228, 252, 211, 215, 255, 223, 128, 128, 128],
   [39, 77, 162, 232, 172, 180, 245, 178, 255, 255, 128]],
  [[1, 52, 220, 246, 198, 199, 249, 220, 255, 255, 128],
   [124, 74, 191, 243, 183, 193, 250, 221, 255, 255, 128],
   [24, 71, 130, 219, 154, 170, 243, 182, 255, 255, 128]],
  [[1, 182, 225, 249, 219, 240, 255, 224, 128, 128, 128],
   [149, 150, 226, 252, 216, 205, 255, 171, 128, 128, 128],
   [28, 108, 170, 242, 183, 194, 254, 223, 255, 255, 128]],
  [[1, 81, 230, 252, 204, 203, 255, 192, 128, 128, 128],
   [123, 102, 209, 247, 188, 196, 255, 233, 128, 128, 128],
   [20, 95, 153, 243, 164, 173, 255, 203, 128, 128, 128]],
  [[1, 222, 248, 255, 216, 213, 128, 128, 128, 128, 128],
   [168, 175, 246, 252, 235, 205, 255, 255, 128, 128, 128],
   [47, 116, 215, 255, 211, 212, 255, 255, 128, 128, 128]],
  [[1, 121, 236, 253, 212, 214, 255, 255, 128, 128, 128],
   [141, 84, 213, 252, 201, 202, 255, 219, 128, 128, 128],
   [42, 80, 160, 240, 162, 185, 255, 205, 128, 128, 128]],
  [[1, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128],
   [244, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128],
   [238, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128]],
 ],
]

# RECONSTRUCTED (see module docstring): probabilities that each token
# probability is updated in the frame header. Overwhelmingly 255 in the
# published table; this reconstruction uses 255 throughout — an update
# flag still decodes/encodes correctly (self-consistently) at any
# probability, and this module's encoder transmits its coefficient
# probabilities explicitly through these flags.
COEF_UPDATE_PROBS = [[[[255] * 11 for _ in range(3)] for _ in range(8)]
                     for _ in range(4)]

# --- dequantization (RFC 6386 §14.1) --------------------------------------

DC_QLOOKUP = (
    4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17,
    18, 19, 20, 20, 21, 21, 22, 22, 23, 23, 24, 25, 25, 26, 27, 28,
    29, 30, 31, 32, 33, 34, 35, 36, 37, 37, 38, 39, 40, 41, 42, 43,
    44, 45, 46, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58,
    59, 60, 61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74,
    75, 76, 76, 77, 78, 79, 80, 81, 82, 83, 84, 85, 86, 87, 88, 89,
    91, 93, 95, 96, 98, 100, 101, 102, 104, 106, 108, 110, 112, 114,
    116, 118, 122, 124, 126, 128, 130, 132, 134, 136, 138, 140, 143,
    145, 148, 151, 154, 157)

AC_QLOOKUP = (
    4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
    20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35,
    36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51,
    52, 53, 54, 55, 56, 57, 58, 60, 62, 64, 66, 68, 70, 72, 74, 76,
    78, 80, 82, 84, 86, 88, 90, 92, 94, 96, 98, 100, 102, 104, 106,
    108, 110, 112, 114, 116, 119, 122, 125, 128, 131, 134, 137, 140,
    143, 146, 149, 152, 155, 158, 161, 164, 167, 170, 173, 177, 181,
    185, 189, 193, 197, 201, 205, 209, 213, 217, 221, 225, 229, 234,
    239, 245, 249, 254, 259, 264, 269, 274, 279, 284)


def _clamp_qi(qi: int) -> int:
    return 0 if qi < 0 else (127 if qi > 127 else qi)


def dequant_factors(y_ac_qi: int, y_dc_delta: int = 0,
                    y2_dc_delta: int = 0, y2_ac_delta: int = 0,
                    uv_dc_delta: int = 0, uv_ac_delta: int = 0) -> dict:
    """Per-plane (dc, ac) dequantization factors (§14.1), including the
    Y2 multipliers (DC x2, AC x155/100 floored, min 8) and the UV DC
    cap at 132."""
    y_dc = DC_QLOOKUP[_clamp_qi(y_ac_qi + y_dc_delta)]
    y_ac = AC_QLOOKUP[_clamp_qi(y_ac_qi)]
    y2_dc = DC_QLOOKUP[_clamp_qi(y_ac_qi + y2_dc_delta)] * 2
    y2_ac = AC_QLOOKUP[_clamp_qi(y_ac_qi + y2_ac_delta)] * 155 // 100
    if y2_ac < 8:
        y2_ac = 8
    uv_dc = DC_QLOOKUP[_clamp_qi(y_ac_qi + uv_dc_delta)]
    if uv_dc > 132:
        uv_dc = 132
    uv_ac = AC_QLOOKUP[_clamp_qi(y_ac_qi + uv_ac_delta)]
    return {"y": (y_dc, y_ac), "y2": (y2_dc, y2_ac), "uv": (uv_dc, uv_ac)}


# --- transforms (RFC 6386 §14.3-14.4) -------------------------------------

_C1 = 20091    # cos(pi/8)*sqrt(2) - 1, Q16
_C2 = 35468    # sin(pi/8)*sqrt(2), Q16


def idct4x4(block: np.ndarray) -> np.ndarray:
    """Exact spec inverse DCT (§14.3 short_idct4x4llm): int math with
    the 20091/35468 Q16 multipliers, final (x + 4) >> 3."""
    ip = block.astype(np.int64)
    tmp = np.zeros((4, 4), dtype=np.int64)
    for c in range(4):
        a1 = ip[0, c] + ip[2, c]
        b1 = ip[0, c] - ip[2, c]
        t1 = (ip[1, c] * _C2) >> 16
        t2 = ip[3, c] + ((ip[3, c] * _C1) >> 16)
        c1 = t1 - t2
        t1 = ip[1, c] + ((ip[1, c] * _C1) >> 16)
        t2 = (ip[3, c] * _C2) >> 16
        d1 = t1 + t2
        tmp[0, c] = a1 + d1
        tmp[3, c] = a1 - d1
        tmp[1, c] = b1 + c1
        tmp[2, c] = b1 - c1
    out = np.zeros((4, 4), dtype=np.int64)
    for r in range(4):
        a1 = tmp[r, 0] + tmp[r, 2]
        b1 = tmp[r, 0] - tmp[r, 2]
        t1 = (tmp[r, 1] * _C2) >> 16
        t2 = tmp[r, 3] + ((tmp[r, 3] * _C1) >> 16)
        c1 = t1 - t2
        t1 = tmp[r, 1] + ((tmp[r, 1] * _C1) >> 16)
        t2 = (tmp[r, 3] * _C2) >> 16
        d1 = t1 + t2
        out[r, 0] = (a1 + d1 + 4) >> 3
        out[r, 3] = (a1 - d1 + 4) >> 3
        out[r, 1] = (b1 + c1 + 4) >> 3
        out[r, 2] = (b1 - c1 + 4) >> 3
    return out


def iwht4x4(block: np.ndarray) -> np.ndarray:
    """Inverse Walsh-Hadamard for the Y2 block (§14.3 short_inv_walsh),
    final (x + 3) >> 3."""
    ip = block.astype(np.int64)
    tmp = np.zeros((4, 4), dtype=np.int64)
    for c in range(4):
        a1 = ip[0, c] + ip[3, c]
        b1 = ip[1, c] + ip[2, c]
        c1 = ip[1, c] - ip[2, c]
        d1 = ip[0, c] - ip[3, c]
        tmp[0, c] = a1 + b1
        tmp[1, c] = c1 + d1
        tmp[2, c] = a1 - b1
        tmp[3, c] = d1 - c1
    out = np.zeros((4, 4), dtype=np.int64)
    for r in range(4):
        a1 = tmp[r, 0] + tmp[r, 3]
        b1 = tmp[r, 1] + tmp[r, 2]
        c1 = tmp[r, 1] - tmp[r, 2]
        d1 = tmp[r, 0] - tmp[r, 3]
        out[r, 0] = (a1 + b1 + 3) >> 3
        out[r, 1] = (c1 + d1 + 3) >> 3
        out[r, 2] = (a1 - b1 + 3) >> 3
        out[r, 3] = (d1 - c1 + 3) >> 3
    return out


def fdct4x4(block: np.ndarray) -> np.ndarray:
    """Forward 4x4 DCT (encoder side; the spec constrains only the
    INVERSE, so any forward transform whose idct4x4 round trip is
    near-identity is valid — this is the libvpx-style integer
    approximation with x8 headroom)."""
    ip = block.astype(np.int64)
    tmp = np.zeros((4, 4), dtype=np.int64)
    for r in range(4):
        a1 = (ip[r, 0] + ip[r, 3]) * 8
        b1 = (ip[r, 1] + ip[r, 2]) * 8
        c1 = (ip[r, 1] - ip[r, 2]) * 8
        d1 = (ip[r, 0] - ip[r, 3]) * 8
        tmp[r, 0] = a1 + b1
        tmp[r, 2] = a1 - b1
        tmp[r, 1] = (c1 * 2217 + d1 * 5352 + 14500) >> 12
        tmp[r, 3] = (d1 * 2217 - c1 * 5352 + 7500) >> 12
    out = np.zeros((4, 4), dtype=np.int64)
    for c in range(4):
        a1 = tmp[0, c] + tmp[3, c]
        b1 = tmp[1, c] + tmp[2, c]
        c1 = tmp[1, c] - tmp[2, c]
        d1 = tmp[0, c] - tmp[3, c]
        out[0, c] = (a1 + b1 + 7) >> 4
        out[2, c] = (a1 - b1 + 7) >> 4
        out[1, c] = ((c1 * 2217 + d1 * 5352 + 12000) >> 16) + (
            1 if d1 != 0 else 0)
        out[3, c] = (d1 * 2217 - c1 * 5352 + 51000) >> 16
    return out


def fwht4x4(block: np.ndarray) -> np.ndarray:
    """Forward Walsh-Hadamard for Y2 (encoder side; inverse-constrained
    like fdct4x4)."""
    ip = block.astype(np.int64)
    tmp = np.zeros((4, 4), dtype=np.int64)
    for r in range(4):
        a1 = (ip[r, 0] + ip[r, 2]) * 4
        d1 = (ip[r, 1] + ip[r, 3]) * 4
        c1 = (ip[r, 1] - ip[r, 3]) * 4
        b1 = (ip[r, 0] - ip[r, 2]) * 4
        tmp[r, 0] = a1 + d1 + (1 if a1 != 0 else 0)
        tmp[r, 1] = b1 + c1
        tmp[r, 2] = b1 - c1
        tmp[r, 3] = a1 - d1
    out = np.zeros((4, 4), dtype=np.int64)
    for c in range(4):
        a1 = tmp[0, c] + tmp[2, c]
        d1 = tmp[1, c] + tmp[3, c]
        c1 = tmp[1, c] - tmp[3, c]
        b1 = tmp[0, c] - tmp[2, c]
        a2 = a1 + d1
        b2 = b1 + c1
        c2 = b1 - c1
        d2 = a1 - d1
        out[0, c] = (a2 + 3 + (1 if a2 < 0 else 0)) >> 3
        out[1, c] = (b2 + 3 + (1 if b2 < 0 else 0)) >> 3
        out[2, c] = (c2 + 3 + (1 if c2 < 0 else 0)) >> 3
        out[3, c] = (d2 + 3 + (1 if d2 < 0 else 0)) >> 3
    return out

# --- intra prediction (RFC 6386 §12) --------------------------------------


def _pred_dc(above, left, shift_base):
    """DC prediction with the §12.2 edge cases: both edges → rounded
    average; one edge → its average; neither → 128."""
    have_a = above is not None
    have_l = left is not None
    if have_a and have_l:
        s = int(above.sum()) + int(left.sum())
        n = len(above) + len(left)
        return (s + n // 2) >> (shift_base + 1)
    if have_a:
        return (int(above.sum()) + len(above) // 2) >> shift_base
    if have_l:
        return (int(left.sum()) + len(left) // 2) >> shift_base
    return 128


def _predict_block(mode, above, left, above_left, size):
    """Whole-block intra prediction (16x16 luma / 8x8 chroma): DC, V,
    H, TM. ``above``/``left`` may be None at frame edges."""
    shift = 4 if size == 16 else 3
    if mode == DC_PRED:
        return np.full((size, size), _pred_dc(above, left, shift),
                       dtype=np.int32)
    if mode == V_PRED:
        row = above if above is not None else np.full(size, 127,
                                                      dtype=np.int32)
        return np.tile(row.astype(np.int32), (size, 1))
    if mode == H_PRED:
        col = left if left is not None else np.full(size, 129,
                                                    dtype=np.int32)
        return np.tile(col.astype(np.int32)[:, None], (1, size))
    if mode == TM_PRED:
        a = (above if above is not None
             else np.full(size, 127, dtype=np.int32)).astype(np.int32)
        lft = (left if left is not None
               else np.full(size, 129, dtype=np.int32)).astype(np.int32)
        al = int(above_left) if above_left is not None else 127
        return np.clip(lft[:, None] + a[None, :] - al, 0, 255)
    raise DecodeError(f"bad VP8 intra mode {mode}")


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _avg2r(a, b):
    return (a + b + 1) >> 1


def _predict_b(mode, A, L, AL, AR):
    """4x4 B_PRED sub-mode prediction (§12.3). ``A``: 4 above pixels,
    ``L``: 4 left, ``AL``: above-left, ``AR``: 4 above-right — all int
    arrays/scalars already edge-defaulted by the caller."""
    p = np.zeros((4, 4), dtype=np.int32)
    E = np.concatenate([[AL], A, AR]).astype(np.int64)   # E[0]=AL, E[1..4]=A
    if mode == B_DC_PRED:
        p[:] = (int(A.sum()) + int(L.sum()) + 4) >> 3
    elif mode == B_TM_PRED:
        p[:] = np.clip(L[:, None] + A[None, :] - AL, 0, 255)
    elif mode == B_VE_PRED:
        row = [_avg3(AL, A[0], A[1]), _avg3(A[0], A[1], A[2]),
               _avg3(A[1], A[2], A[3]), _avg3(A[2], A[3], AR[0])]
        p[:] = np.array(row, dtype=np.int32)[None, :]
    elif mode == B_HE_PRED:
        col = [_avg3(AL, L[0], L[1]), _avg3(L[0], L[1], L[2]),
               _avg3(L[1], L[2], L[3]), _avg3(L[2], L[3], L[3])]
        p[:] = np.array(col, dtype=np.int32)[:, None]
    elif mode == B_LD_PRED:
        e = np.concatenate([A, AR]).astype(np.int64)
        for r in range(4):
            for c in range(4):
                i = r + c
                p[r, c] = _avg3(e[i], e[i + 1],
                                e[min(i + 2, 7)])
    elif mode == B_RD_PRED:
        e = np.array([L[3], L[2], L[1], L[0], AL, A[0], A[1], A[2],
                      A[3]], dtype=np.int64)
        for r in range(4):
            for c in range(4):
                i = c - r + 3          # index into e, center at AL=4
                p[r, c] = _avg3(e[i], e[i + 1], e[i + 2])
    elif mode == B_VR_PRED:
        e = np.array([L[3], L[2], L[1], L[0], AL, A[0], A[1], A[2],
                      A[3]], dtype=np.int64)
        for r in range(4):
            for c in range(4):
                d = 2 * c - r
                if d >= 0 and d % 2 == 0:
                    p[r, c] = _avg2r(e[c - (r >> 1) + 3],
                                     e[c - (r >> 1) + 4])
                elif d >= 0:
                    p[r, c] = _avg3(e[c - (r >> 1) + 2],
                                    e[c - (r >> 1) + 3],
                                    e[c - (r >> 1) + 4])
                elif d == -1:
                    p[r, c] = _avg3(e[3], e[4], e[5])
                else:
                    p[r, c] = _avg3(e[r - 2 * c + 1], e[r - 2 * c + 2],
                                    e[r - 2 * c + 3])
    elif mode == B_VL_PRED:
        e = np.concatenate([A, AR]).astype(np.int64)
        for r in range(4):
            for c in range(4):
                i = c + (r >> 1)
                if r % 2 == 0:
                    p[r, c] = _avg2r(e[i], e[i + 1])
                else:
                    p[r, c] = _avg3(e[i], e[i + 1], e[i + 2])
        # spec patches the bottom-right diagonal with far edge pixels
        p[3, 3] = _avg3(e[5], e[6], e[7])
        p[2, 3] = _avg3(e[4], e[5], e[6])
    elif mode == B_HD_PRED:
        e = np.array([L[3], L[2], L[1], L[0], AL, A[0], A[1], A[2],
                      A[3]], dtype=np.int64)
        for r in range(4):
            for c in range(4):
                d = 2 * r - c
                i = 3 - r + (c >> 1)
                if d >= 0 and d % 2 == 0:
                    p[r, c] = _avg2r(e[i], e[i + 1])
                elif d >= 0:
                    p[r, c] = _avg3(e[i], e[i + 1], e[i + 2])
                else:
                    p[r, c] = _avg3(e[c - 2 * r + 3], e[c - 2 * r + 4],
                                    e[min(c - 2 * r + 5, 8)])
    elif mode == B_HU_PRED:
        lw = L.astype(np.int64)
        vals = [_avg2r(lw[0], lw[1]), _avg3(lw[0], lw[1], lw[2]),
                _avg2r(lw[1], lw[2]), _avg3(lw[1], lw[2], lw[3]),
                _avg2r(lw[2], lw[3]), _avg3(lw[2], lw[3], lw[3]),
                int(lw[3]), int(lw[3])]
        for r in range(4):
            for c in range(4):
                p[r, c] = vals[min(2 * r + c, 7)]
    else:
        raise DecodeError(f"bad VP8 B_PRED sub-mode {mode}")
    return p


# --- coefficient token decode (§13.3) -------------------------------------


def _decode_coeffs(bd: BoolDecoder, plane: int, ctx: int, probs,
                   qdc: int, qac: int, first: int) -> tuple:
    """One 4x4 block's coefficients: returns (coeffs int32[4,4] already
    dequantized in raster order, nonzero_flag)."""
    coeffs = np.zeros(16, dtype=np.int64)
    i = first
    start = 0
    nonzero = 0
    while i < 16:
        band_probs = probs[plane][COEF_BANDS[i]][ctx]
        tok = bd.tree(COEF_TREE, band_probs, start)
        if tok == DCT_EOB:
            break
        if tok == DCT_0:
            ctx = 0
            start = 2                  # §13.3: no EOB directly after a 0
            i += 1
            continue
        start = 0
        if tok <= DCT_4:
            value = tok                # DCT_1..DCT_4 encode 1..4
        else:
            value = CAT_BASE[tok]
            bits = 0
            for p in CAT_PROBS[tok]:
                bits = (bits << 1) | bd.bool(p)
            value += bits
        if bd.bool(128):
            value = -value
        ctx = 1 if abs(value) == 1 else 2
        q = qdc if i == 0 else qac
        coeffs[ZIGZAG[i]] = value * q
        nonzero = 1
        i += 1
    return coeffs.reshape(4, 4), nonzero


# --- frame decode ---------------------------------------------------------


def _parse_uncompressed_header(data: bytes) -> dict:
    if len(data) < 10:
        raise DecodeError("VP8 payload too short")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    key_frame = not (tag & 1)
    version = (tag >> 1) & 7
    show_frame = (tag >> 4) & 1
    first_part_size = tag >> 5
    if not key_frame:
        raise DecodeError("inter-coded VP8 frame: declared seam "
                          "(intra-only still decoder)")
    if data[3:6] != b"\x9d\x01\x2a":
        raise DecodeError("bad VP8 keyframe start code")
    w_code = data[6] | (data[7] << 8)
    h_code = data[8] | (data[9] << 8)
    return {"version": version, "show_frame": show_frame,
            "first_part_size": first_part_size,
            "width": w_code & 0x3FFF, "height": h_code & 0x3FFF,
            "xscale": w_code >> 14, "yscale": h_code >> 14}


def _parse_frame_header(bd: BoolDecoder) -> dict:
    h = {}
    h["color_space"] = bd.bool(128)
    h["clamping_type"] = bd.bool(128)
    # segmentation (§9.3)
    h["segmentation_enabled"] = bd.bool(128)
    h["update_mb_segmentation_map"] = 0
    h["segment_tree_probs"] = [255, 255, 255]
    h["segment_qi_delta"] = [0, 0, 0, 0]
    h["segment_lf_delta"] = [0, 0, 0, 0]
    h["segment_abs"] = 0
    if h["segmentation_enabled"]:
        h["update_mb_segmentation_map"] = bd.bool(128)
        update_data = bd.bool(128)
        if update_data:
            h["segment_abs"] = bd.bool(128)
            for s in range(4):
                if bd.bool(128):
                    h["segment_qi_delta"][s] = bd.signed_literal(7)
            for s in range(4):
                if bd.bool(128):
                    h["segment_lf_delta"][s] = bd.signed_literal(6)
        if h["update_mb_segmentation_map"]:
            for s in range(3):
                if bd.bool(128):
                    h["segment_tree_probs"][s] = bd.literal(8)
    # loop filter (§9.4)
    h["filter_type"] = bd.bool(128)          # 0 normal, 1 simple
    h["filter_level"] = bd.literal(6)
    h["sharpness"] = bd.literal(3)
    h["lf_delta_enabled"] = bd.bool(128)
    h["ref_lf_delta"] = [0, 0, 0, 0]
    h["mode_lf_delta"] = [0, 0, 0, 0]
    if h["lf_delta_enabled"]:
        if bd.bool(128):                     # delta update
            for s in range(4):
                if bd.bool(128):
                    h["ref_lf_delta"][s] = bd.signed_literal(6)
            for s in range(4):
                if bd.bool(128):
                    h["mode_lf_delta"][s] = bd.signed_literal(6)
    # token partitions (§9.5)
    h["n_partitions"] = 1 << bd.literal(2)
    # quantizers (§9.6)
    h["y_ac_qi"] = bd.literal(7)
    h["q_deltas"] = [bd.signed_literal(4) if bd.bool(128) else 0
                     for _ in range(5)]     # y_dc, y2_dc, y2_ac, uv_dc, uv_ac
    # §9.7 refresh entropy (keyframe: single flag)
    h["refresh_entropy"] = bd.bool(128)
    # §13.4 token probability updates
    probs = [[[list(c) for c in b] for b in t]
             for t in DEFAULT_COEF_PROBS]
    for t in range(4):
        for b in range(8):
            for c in range(3):
                for l in range(11):
                    if bd.bool(COEF_UPDATE_PROBS[t][b][c][l]):
                        probs[t][b][c][l] = bd.literal(8)
    h["coef_probs"] = probs
    # §9.10 skip
    h["mb_no_coeff_skip"] = bd.bool(128)
    h["prob_skip_false"] = bd.literal(8) if h["mb_no_coeff_skip"] else 0
    return h

# --- YUV 4:2:0 <-> RGB (integer BT.601; outside the VP8 spec, pinned
# here deterministically and shared by encoder + decoder) -------------------


def rgb_to_yuv420(img: np.ndarray) -> tuple:
    r = img[..., 0].astype(np.int32)
    g = img[..., 1].astype(np.int32)
    b = img[..., 2].astype(np.int32)
    y = ((66 * r + 129 * g + 25 * b + 128) >> 8) + 16
    u = ((-38 * r - 74 * g + 112 * b + 128) >> 8) + 128
    v = ((112 * r - 94 * g - 18 * b + 128) >> 8) + 128
    h, w = y.shape
    # pad to even before 2x2 chroma averaging
    if h % 2 or w % 2:
        u = np.pad(u, ((0, h % 2), (0, w % 2)), mode="edge")
        v = np.pad(v, ((0, h % 2), (0, w % 2)), mode="edge")
    u4 = (u[0::2, 0::2] + u[0::2, 1::2] + u[1::2, 0::2]
          + u[1::2, 1::2] + 2) >> 2
    v4 = (v[0::2, 0::2] + v[0::2, 1::2] + v[1::2, 0::2]
          + v[1::2, 1::2] + 2) >> 2
    return (np.clip(y, 0, 255).astype(np.uint8),
            np.clip(u4, 0, 255).astype(np.uint8),
            np.clip(v4, 0, 255).astype(np.uint8))


def yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray
                  ) -> np.ndarray:
    h, w = y.shape
    uu = u.repeat(2, 0).repeat(2, 1)[:h, :w].astype(np.int32) - 128
    vv = v.repeat(2, 0).repeat(2, 1)[:h, :w].astype(np.int32) - 128
    c = y.astype(np.int32) - 16
    r = (298 * c + 409 * vv + 128) >> 8
    g = (298 * c - 100 * uu - 208 * vv + 128) >> 8
    b = (298 * c + 516 * uu + 128) >> 8
    return np.stack([np.clip(r, 0, 255), np.clip(g, 0, 255),
                     np.clip(b, 0, 255)], axis=-1).astype(np.uint8)


# --- loop filter (RFC 6386 §15) -------------------------------------------


def _c128(x):
    return -128 if x < -128 else (127 if x > 127 else x)


def _filter_limits(level: int, sharpness: int, keyframe: bool = True):
    interior = level
    if sharpness:
        interior >>= 2 if sharpness > 4 else 1
        if interior > 9 - sharpness:
            interior = 9 - sharpness
    if interior < 1:
        interior = 1
    hev = 0
    if keyframe:
        if level >= 40:
            hev = 2
        elif level >= 15:
            hev = 1
    else:
        if level >= 40:
            hev = 3
        elif level >= 20:
            hev = 2
        elif level >= 15:
            hev = 1
    return interior, hev


def _common_adjust(px, use_outer, i0, i1, i2, i3):
    """§15.2 common_adjust over signed-converted pixels px[i0..i3] =
    (p1, p0, q0, q1); returns the Filter1 value ``a``."""
    p1, p0, q0, q1 = px[i0], px[i1], px[i2], px[i3]
    a = _c128((_c128(p1 - q1) if use_outer else 0) + 3 * (q0 - p0))
    f1 = _c128(a + 4) >> 3
    f2 = _c128(a + 3) >> 3
    px[i2] = _c128(q0 - f1)
    px[i1] = _c128(p0 + f2)
    return f1


def _simple_filter_seg(px, limit):
    p1, p0, q0, q1 = px
    if abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= limit:
        _common_adjust(px, True, 0, 1, 2, 3)


def _normal_mask(px, interior, edge):
    p3, p2, p1, p0, q0, q1, q2, q3 = px
    return (abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= edge
            and abs(p3 - p2) <= interior and abs(p2 - p1) <= interior
            and abs(p1 - p0) <= interior and abs(q1 - q0) <= interior
            and abs(q2 - q1) <= interior and abs(q3 - q2) <= interior)


def _is_hev(px, thresh):
    return abs(px[2] - px[3]) > thresh or abs(px[5] - px[4]) > thresh


def _subblock_filter(px, hev_t, interior, edge):
    if not _normal_mask(px, interior, edge):
        return
    hev = _is_hev(px, hev_t)
    a = _common_adjust(px, hev, 2, 3, 4, 5)
    if not hev:
        a = (a + 1) >> 1
        px[5] = _c128(px[5] - a)
        px[2] = _c128(px[2] + a)


def _mb_filter(px, hev_t, interior, edge):
    if not _normal_mask(px, interior, edge):
        return
    if _is_hev(px, hev_t):
        _common_adjust(px, True, 2, 3, 4, 5)
        return
    w = _c128(_c128(px[2] - px[5]) + 3 * (px[4] - px[3]))
    a = _c128((27 * w + 63) >> 7)
    px[4] = _c128(px[4] - a)
    px[3] = _c128(px[3] + a)
    a = _c128((18 * w + 63) >> 7)
    px[5] = _c128(px[5] - a)
    px[2] = _c128(px[2] + a)
    a = _c128((9 * w + 63) >> 7)
    px[6] = _c128(px[6] - a)
    px[1] = _c128(px[1] + a)


def _filter_edge_v(plane, x, y0, n, fn, *args):
    """Apply a horizontal-window filter across vertical edge at column
    x, rows y0..y0+n; window half-width from fn (2 for simple, 4 for
    normal)."""
    half = 2 if fn is _simple_filter_seg else 4
    for y in range(y0, y0 + n):
        px = [int(plane[y, x - half + k]) - 128 for k in range(2 * half)]
        fn(px, *args)
        for k in range(2 * half):
            plane[y, x - half + k] = px[k] + 128


def _filter_edge_h(plane, y, x0, n, fn, *args):
    half = 2 if fn is _simple_filter_seg else 4
    for x in range(x0, x0 + n):
        px = [int(plane[y - half + k, x]) - 128 for k in range(2 * half)]
        fn(px, *args)
        for k in range(2 * half):
            plane[y - half + k, x] = px[k] + 128


def _loop_filter(yp, up, vp, h, mb_infos, mb_w, mb_h):
    """Whole-frame loop filter in spec MB order: per MB, left edge →
    interior vertical → top edge → interior horizontal; simple filter
    touches luma only."""
    base = h["filter_level"]
    if base == 0:
        return
    simple = h["filter_type"] == 1
    for my in range(mb_h):
        for mx in range(mb_w):
            info = mb_infos[my][mx]
            level = info["filter_level"]
            if level == 0:
                continue
            interior, hev_t = _filter_limits(level, h["sharpness"])
            mb_lim = ((level + 2) * 2) + interior
            sb_lim = (level * 2) + interior
            inner = info["has_coeffs"] or info["ymode"] == B_PRED
            yx, yy = mx * 16, my * 16
            cx, cy = mx * 8, my * 8
            if simple:
                if mx:
                    _filter_edge_v(yp, yx, yy, 16, _simple_filter_seg,
                                   mb_lim)
                if inner:
                    for dx in (4, 8, 12):
                        _filter_edge_v(yp, yx + dx, yy, 16,
                                       _simple_filter_seg, sb_lim)
                if my:
                    _filter_edge_h(yp, yy, yx, 16, _simple_filter_seg,
                                   mb_lim)
                if inner:
                    for dy in (4, 8, 12):
                        _filter_edge_h(yp, yy + dy, yx, 16,
                                       _simple_filter_seg, sb_lim)
                continue
            if mx:
                _filter_edge_v(yp, yx, yy, 16, _mb_filter, hev_t,
                               interior, mb_lim)
                _filter_edge_v(up, cx, cy, 8, _mb_filter, hev_t,
                               interior, mb_lim)
                _filter_edge_v(vp, cx, cy, 8, _mb_filter, hev_t,
                               interior, mb_lim)
            if inner:
                for dx in (4, 8, 12):
                    _filter_edge_v(yp, yx + dx, yy, 16,
                                   _subblock_filter, hev_t, interior,
                                   sb_lim)
                _filter_edge_v(up, cx + 4, cy, 8, _subblock_filter,
                               hev_t, interior, sb_lim)
                _filter_edge_v(vp, cx + 4, cy, 8, _subblock_filter,
                               hev_t, interior, sb_lim)
            if my:
                _filter_edge_h(yp, yy, yx, 16, _mb_filter, hev_t,
                               interior, mb_lim)
                _filter_edge_h(up, cy, cx, 8, _mb_filter, hev_t,
                               interior, mb_lim)
                _filter_edge_h(vp, cy, cx, 8, _mb_filter, hev_t,
                               interior, mb_lim)
            if inner:
                for dy in (4, 8, 12):
                    _filter_edge_h(yp, yy + dy, yx, 16,
                                   _subblock_filter, hev_t, interior,
                                   sb_lim)
                _filter_edge_h(up, cy + 4, cx, 8, _subblock_filter,
                               hev_t, interior, sb_lim)
                _filter_edge_h(vp, cy + 4, cx, 8, _subblock_filter,
                               hev_t, interior, sb_lim)

# --- full-frame decode ----------------------------------------------------


def _b_edges(yp, mb_w, yx, yy, bx, by):
    """B_PRED 4x4 neighborhood (A, L, AL, AR) from the reconstructed
    luma plane, with the §12.3 edge rules — above-right: top MB row
    reads the frame row above (127 beyond the edge); lower rows reuse
    the above MB's bottom row for the rightmost column, else the
    reconstructed in-MB neighbor (libvpx rule). SHARED by decoder and
    encoder so the two can never drift."""
    x0, y0 = yx + bx * 4, yy + by * 4
    A = (yp[y0 - 1, x0:x0 + 4].astype(np.int64)
         if y0 else np.full(4, 127, dtype=np.int64))
    L = (yp[y0:y0 + 4, x0 - 1].astype(np.int64)
         if x0 else np.full(4, 129, dtype=np.int64))
    AL = (int(yp[y0 - 1, x0 - 1]) if (x0 and y0)
          else (129 if y0 else 127))
    if y0 == 0:
        AR = np.full(4, 127, dtype=np.int64)
    elif bx < 3:
        AR = yp[y0 - 1, x0 + 4:x0 + 8].astype(np.int64)
    elif yy and yx + 16 < mb_w * 16:
        AR = yp[yy - 1, yx + 16:yx + 20].astype(np.int64)
    else:
        AR = np.full(4, 127, dtype=np.int64)
    return A, L, AL, AR


def decode_vp8_yuv(data: bytes) -> tuple:
    """Decode a VP8 key-frame payload (the content of a RIFF 'VP8 '
    chunk) to (Y, U, V) uint8 planes, loop-filtered and cropped."""
    uh = _parse_uncompressed_header(data)
    w, hgt = uh["width"], uh["height"]
    if w == 0 or hgt == 0:
        raise DecodeError("VP8 zero frame dimension")
    if w * hgt > 16_000_000:
        raise DecodeError("VP8 frame too large (decompression bound)")
    fps = uh["first_part_size"]
    first = data[10:10 + fps]
    if len(first) < fps:
        raise DecodeError("VP8 first partition truncated")
    bd = BoolDecoder(first)
    h = _parse_frame_header(bd)
    mb_w, mb_h = (w + 15) // 16, (hgt + 15) // 16

    # token partitions
    pos = 10 + fps
    n_parts = h["n_partitions"]
    sizes = []
    for _ in range(n_parts - 1):
        if pos + 3 > len(data):
            raise DecodeError("VP8 partition size table truncated")
        sizes.append(data[pos] | (data[pos + 1] << 8)
                     | (data[pos + 2] << 16))
        pos += 3
    parts = []
    for i in range(n_parts):
        if i < n_parts - 1:
            parts.append(BoolDecoder(data[pos:pos + sizes[i]]))
            pos += sizes[i]
        else:
            if pos >= len(data):
                raise DecodeError("VP8 token partition missing")
            parts.append(BoolDecoder(data[pos:]))

    # per-MB mode records (remainder of the first partition, §11)
    seg_probs = h["segment_tree_probs"]
    seg_tree = (2, 4, -0, -1, -2, -3)
    modes = []
    above_b = [[B_DC_PRED] * 4 for _ in range(mb_w)]   # bmode ctx rows
    for my in range(mb_h):
        row = []
        left_b = [B_DC_PRED] * 4
        for mx in range(mb_w):
            m = {"segment": 0, "skip": 0}
            if h["update_mb_segmentation_map"]:
                m["segment"] = bd.tree(seg_tree, seg_probs)
            if h["mb_no_coeff_skip"]:
                m["skip"] = bd.bool(h["prob_skip_false"])
            ymode = bd.tree(KF_YMODE_TREE, KF_YMODE_PROBS)
            m["ymode"] = ymode
            if ymode == B_PRED:
                sub = []
                for by in range(4):
                    for bx in range(4):
                        a = (above_b[mx][bx] if by == 0
                             else sub[(by - 1) * 4 + bx])
                        lft = (left_b[by] if bx == 0
                               else sub[by * 4 + bx - 1])
                        sm = bd.tree(BMODE_TREE, KF_BMODE_PROBS[a][lft])
                        sub.append(sm)
                m["bmodes"] = sub
                above_b[mx] = sub[12:16]
                left_b = [sub[3], sub[7], sub[11], sub[15]]
            else:
                # §11.3: a 16x16 mode sets the B context to its analog
                analog = {DC_PRED: B_DC_PRED, V_PRED: B_VE_PRED,
                          H_PRED: B_HE_PRED, TM_PRED: B_TM_PRED}[ymode]
                above_b[mx] = [analog] * 4
                left_b = [analog] * 4
            m["uvmode"] = bd.tree(UV_MODE_TREE, KF_UV_MODE_PROBS)
            row.append(m)
        modes.append(row)

    # quantizers (global; per-segment deltas if enabled)
    qd = h["q_deltas"]
    def seg_quant(seg):
        qi = h["y_ac_qi"]
        if h["segmentation_enabled"]:
            d = h["segment_qi_delta"][seg]
            qi = d if h["segment_abs"] else qi + d
        return dequant_factors(qi, qd[0], qd[1], qd[2], qd[3], qd[4])
    quants = [seg_quant(s) for s in range(4)]

    # reconstruction state
    yp = np.zeros((mb_h * 16, mb_w * 16), dtype=np.uint8)
    up = np.zeros((mb_h * 8, mb_w * 8), dtype=np.uint8)
    vp = np.zeros((mb_h * 8, mb_w * 8), dtype=np.uint8)
    probs = h["coef_probs"]
    above_nz = {"y": np.zeros(mb_w * 4, dtype=np.int32),
                "u": np.zeros(mb_w * 2, dtype=np.int32),
                "v": np.zeros(mb_w * 2, dtype=np.int32),
                "y2": np.zeros(mb_w, dtype=np.int32)}
    mb_infos = [[None] * mb_w for _ in range(mb_h)]

    for my in range(mb_h):
        td = parts[my % n_parts]
        left_nz = {"y": np.zeros(4, dtype=np.int32),
                   "u": np.zeros(2, dtype=np.int32),
                   "v": np.zeros(2, dtype=np.int32),
                   "y2": np.zeros(1, dtype=np.int32)}
        for mx in range(mb_w):
            m = modes[my][mx]
            q = quants[m["segment"]]
            has_y2 = m["ymode"] != B_PRED
            coeffs_y = [np.zeros((4, 4), dtype=np.int64)
                        for _ in range(16)]
            coeffs_u = [np.zeros((4, 4), dtype=np.int64)
                        for _ in range(4)]
            coeffs_v = [np.zeros((4, 4), dtype=np.int64)
                        for _ in range(4)]
            has_coeffs = False
            if m["skip"]:
                left_nz["y"][:] = 0
                left_nz["u"][:] = 0
                left_nz["v"][:] = 0
                above_nz["y"][mx * 4:mx * 4 + 4] = 0
                above_nz["u"][mx * 2:mx * 2 + 2] = 0
                above_nz["v"][mx * 2:mx * 2 + 2] = 0
                if has_y2:
                    left_nz["y2"][0] = 0
                    above_nz["y2"][mx] = 0
            else:
                y2_dc = None
                if has_y2:
                    ctx = int(above_nz["y2"][mx] + left_nz["y2"][0])
                    c2, nz = _decode_coeffs(td, PLANE_Y2, ctx, probs,
                                            q["y2"][0], q["y2"][1], 0)
                    above_nz["y2"][mx] = left_nz["y2"][0] = nz
                    has_coeffs |= bool(nz)
                    y2_dc = iwht4x4(c2)
                plane = PLANE_Y_NO_DC if has_y2 else PLANE_Y_WITH_DC
                first = 1 if has_y2 else 0
                for b in range(16):
                    by, bx = b // 4, b % 4
                    ctx = int(above_nz["y"][mx * 4 + bx]
                              + left_nz["y"][by])
                    cf, nz = _decode_coeffs(td, plane, ctx, probs,
                                            q["y"][0], q["y"][1], first)
                    if has_y2:
                        cf[0, 0] = y2_dc[by, bx]
                    coeffs_y[b] = cf
                    above_nz["y"][mx * 4 + bx] = left_nz["y"][by] = nz
                    has_coeffs |= bool(nz)
                for cname, carr, cnz in (("u", coeffs_u, "u"),
                                         ("v", coeffs_v, "v")):
                    for b in range(4):
                        by, bx = b // 2, b % 2
                        ctx = int(above_nz[cnz][mx * 2 + bx]
                                  + left_nz[cnz][by])
                        cf, nz = _decode_coeffs(td, PLANE_UV, ctx,
                                                probs, q["uv"][0],
                                                q["uv"][1], 0)
                        carr[b] = cf
                        above_nz[cnz][mx * 2 + bx] = nz
                        left_nz[cnz][by] = nz
                        has_coeffs |= bool(nz)

            # --- reconstruct this MB (unfiltered neighbors, §12.2) ---
            yx, yy = mx * 16, my * 16
            if m["ymode"] != B_PRED:
                above = (yp[yy - 1, yx:yx + 16].astype(np.int32)
                         if my else None)
                left = (yp[yy:yy + 16, yx - 1].astype(np.int32)
                        if mx else None)
                al = (int(yp[yy - 1, yx - 1]) if (mx and my) else None)
                pred = _predict_block(m["ymode"], above, left, al, 16)
                for b in range(16):
                    by, bx = b // 4, b % 4
                    res = idct4x4(coeffs_y[b])
                    blk = pred[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4]
                    yp[yy + by * 4:yy + by * 4 + 4,
                       yx + bx * 4:yx + bx * 4 + 4] = np.clip(
                        blk + res, 0, 255)
            else:
                for b in range(16):
                    by, bx = b // 4, b % 4
                    A, L, AL, AR = _b_edges(yp, mb_w, yx, yy, bx, by)
                    pred = _predict_b(m["bmodes"][b], A, L, AL, AR)
                    res = idct4x4(coeffs_y[b])
                    x0, y0 = yx + bx * 4, yy + by * 4
                    yp[y0:y0 + 4, x0:x0 + 4] = np.clip(pred + res, 0,
                                                       255)
            cx, cy = mx * 8, my * 8
            for plane_arr, carr in ((up, coeffs_u), (vp, coeffs_v)):
                above = (plane_arr[cy - 1, cx:cx + 8].astype(np.int32)
                         if my else None)
                left = (plane_arr[cy:cy + 8, cx - 1].astype(np.int32)
                        if mx else None)
                al = (int(plane_arr[cy - 1, cx - 1])
                      if (mx and my) else None)
                pred = _predict_block(m["uvmode"], above, left, al, 8)
                for b in range(4):
                    by, bx = b // 2, b % 2
                    res = idct4x4(carr[b])
                    blk = pred[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4]
                    plane_arr[cy + by * 4:cy + by * 4 + 4,
                              cx + bx * 4:cx + bx * 4 + 4] = np.clip(
                        blk + res, 0, 255)

            # loop-filter bookkeeping
            level = h["filter_level"]
            if h["segmentation_enabled"]:
                d = h["segment_lf_delta"][m["segment"]]
                level = d if h["segment_abs"] else level + d
            if h["lf_delta_enabled"]:
                level += h["ref_lf_delta"][0]      # intra frame
                if m["ymode"] == B_PRED:
                    level += h["mode_lf_delta"][0]
            mb_infos[my][mx] = {
                "filter_level": max(0, min(63, level)),
                "has_coeffs": has_coeffs, "ymode": m["ymode"]}

    _loop_filter(yp, up, vp, h, mb_infos, mb_w, mb_h)
    return (yp[:hgt, :w], up[:(hgt + 1) // 2, :(w + 1) // 2],
            vp[:(hgt + 1) // 2, :(w + 1) // 2])


def decode_vp8(data: bytes) -> np.ndarray:
    """VP8 key-frame payload → (h, w, 3) uint8 RGB."""
    y, u, v = decode_vp8_yuv(data)
    return yuv420_to_rgb(y, u, v)

# --- encoder (spec-valid subset) ------------------------------------------
#
# Key frame, 16x16 intra modes (DC/V/H/TM) + chroma modes, single token
# partition, no segmentation, default coefficient probabilities (no
# updates — decoding is self-consistent because encoder and decoder
# share this module's tables; see the reconstructed-table caveat in the
# module docstring, which applies to cross-decoder portability of these
# streams exactly as it does to decoding external files). The encoder
# reconstructs every MB exactly as the decoder does, so prediction
# contexts can never drift (the same shared-path discipline as
# webp._pred_value).


def _quantize(coef: np.ndarray, qdc: int, qac: int) -> np.ndarray:
    q = np.full((4, 4), qac, dtype=np.int64)
    q[0, 0] = qdc
    a = np.abs(coef)
    lev = (a + q // 2) // q
    return np.clip(lev, 0, 2114) * np.sign(coef)


def _dequantize(levels: np.ndarray, qdc: int, qac: int) -> np.ndarray:
    q = np.full((4, 4), qac, dtype=np.int64)
    q[0, 0] = qdc
    return levels * q


def _encode_coeffs(be: BoolEncoder, plane: int, ctx: int, probs,
                   levels_z: list, first: int) -> int:
    """Mirror of _decode_coeffs: ``levels_z`` are the 16 quantized
    levels in ZIGZAG order. Returns the nonzero flag."""
    last = -1
    for i in range(15, first - 1, -1):
        if levels_z[i]:
            last = i
            break
    i = first
    start = 0
    while i < 16:
        band_probs = probs[plane][COEF_BANDS[i]][ctx]
        if i > last:
            be.tree(COEF_TREE, band_probs, DCT_EOB, start)
            break
        v = int(levels_z[i])
        if v == 0:
            be.tree(COEF_TREE, band_probs, DCT_0, start)
            ctx = 0
            start = 2
            i += 1
            continue
        a = abs(v)
        if a <= 4:
            be.tree(COEF_TREE, band_probs, a, start)   # DCT_1..DCT_4
        else:
            for tok in (DCT_CAT1, DCT_CAT2, DCT_CAT3, DCT_CAT4,
                        DCT_CAT5, DCT_CAT6):
                base = CAT_BASE[tok]
                span = 1 << len(CAT_PROBS[tok])
                if a < base + span:
                    be.tree(COEF_TREE, band_probs, tok, start)
                    bits = a - base
                    nb = len(CAT_PROBS[tok])
                    for k, p in enumerate(CAT_PROBS[tok]):
                        be.bool(p, (bits >> (nb - 1 - k)) & 1)
                    break
            else:
                raise ValueError(f"level {a} exceeds token alphabet")
        be.bool(128, 1 if v < 0 else 0)
        ctx = 1 if a == 1 else 2
        start = 0
        i += 1
    return 1 if last >= first else 0


def _zig(levels: np.ndarray) -> list:
    flat = levels.reshape(-1)
    return [int(flat[ZIGZAG[i]]) for i in range(16)]


def encode_vp8(img: np.ndarray, *, qi: int = 12,
               filter_level: int = 0, filter_type: int = 0,
               sharpness: int = 0, force_bpred: bool = False,
               n_partitions: int = 1, return_recon: bool = False):
    """HxWx3 uint8 RGB → VP8 key-frame payload (RIFF 'VP8 ' chunk
    content). Lossy: decode_vp8(encode_vp8(img)) approximates img with
    error bounded by the quantizer step for ``qi`` (plus 4:2:0 chroma
    pooling); at the YUV-plane level the decoder output EQUALS the
    encoder's own reconstruction exactly when ``filter_level`` is 0
    (pytest-pinned via ``return_recon``).

    ``force_bpred``: code every macroblock as B_PRED with per-4x4
    sub-mode selection — exercises the decoder's 4x4 prediction and
    PLANE_Y_WITH_DC token path. ``return_recon``: also return the
    encoder's (y, u, v) reconstruction planes (cropped, pre-filter)."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_vp8 expects (h, w, 3) RGB")
    hgt, w = img.shape[:2]
    y, u, v = rgb_to_yuv420(img)
    mb_w, mb_h = (w + 15) // 16, (hgt + 15) // 16
    yp = np.pad(y.astype(np.int64),
                ((0, mb_h * 16 - hgt), (0, mb_w * 16 - w)), mode="edge")
    ch, cw = u.shape
    upad = ((0, mb_h * 8 - ch), (0, mb_w * 8 - cw))
    upl = np.pad(u.astype(np.int64), upad, mode="edge")
    vpl = np.pad(v.astype(np.int64), upad, mode="edge")

    q = dequant_factors(qi)
    recon_y = np.zeros((mb_h * 16, mb_w * 16), dtype=np.uint8)
    recon_u = np.zeros((mb_h * 8, mb_w * 8), dtype=np.uint8)
    recon_v = np.zeros((mb_h * 8, mb_w * 8), dtype=np.uint8)
    probs = DEFAULT_COEF_PROBS
    mbs = []

    def try_luma(mode, src, above, left, al):
        pred = _predict_block(mode, above, left, al, 16)
        return pred, int(np.abs(src - pred).sum())

    for my in range(mb_h):
        for mx in range(mb_w):
            yx, yy = mx * 16, my * 16
            src = yp[yy:yy + 16, yx:yx + 16]
            above = (recon_y[yy - 1, yx:yx + 16].astype(np.int32)
                     if my else None)
            left = (recon_y[yy:yy + 16, yx - 1].astype(np.int32)
                    if mx else None)
            al = int(recon_y[yy - 1, yx - 1]) if (mx and my) else None
            bmodes = None
            if force_bpred:
                # B_PRED: per-4x4 sequential predict/quantize/
                # reconstruct (later blocks predict from earlier ones,
                # exactly as the decoder will)
                ymode = B_PRED
                bmodes, y_levels = [], []
                y2_levels = np.zeros((4, 4), dtype=np.int64)
                y2_rec = None
                for b in range(16):
                    by, bx = b // 4, b % 4
                    A, L, AL, AR = _b_edges(recon_y, mb_w, yx, yy,
                                            bx, by)
                    sb = src[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4]
                    bb = None
                    for sm in (B_DC_PRED, B_VE_PRED, B_HE_PRED,
                               B_TM_PRED):
                        bp = _predict_b(sm, A, L, AL, AR)
                        cost = int(np.abs(sb - bp).sum())
                        if bb is None or cost < bb[1]:
                            bb = (sm, cost, bp)
                    sm, _, bp = bb
                    lev = _quantize(fdct4x4(sb - bp), q["y"][0],
                                    q["y"][1])
                    res = idct4x4(_dequantize(lev, q["y"][0],
                                              q["y"][1]))
                    recon_y[yy + by * 4:yy + by * 4 + 4,
                            yx + bx * 4:yx + bx * 4 + 4] = np.clip(
                        bp + res, 0, 255)
                    bmodes.append(sm)
                    y_levels.append(lev)
                pred = None
            else:
                best = None
                for mode in (DC_PRED, V_PRED, H_PRED, TM_PRED):
                    pred, cost = try_luma(mode, src, above, left, al)
                    if best is None or cost < best[1]:
                        best = (mode, cost, pred)
                ymode, _, pred = best
                # transform: 16 fdcts; DCs through the WHT (Y2)
                coefs = []
                dcs = np.zeros((4, 4), dtype=np.int64)
                for b in range(16):
                    by, bx = b // 4, b % 4
                    resid = (src[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4]
                             - pred[by * 4:by * 4 + 4,
                                    bx * 4:bx * 4 + 4])
                    cf = fdct4x4(resid)
                    dcs[by, bx] = cf[0, 0]
                    coefs.append(cf)
                y2_levels = _quantize(fwht4x4(dcs), q["y2"][0],
                                      q["y2"][1])
                y2_rec = iwht4x4(_dequantize(y2_levels, q["y2"][0],
                                             q["y2"][1]))
                y_levels = []
                for b in range(16):
                    lev = _quantize(coefs[b], q["y"][0], q["y"][1])
                    lev[0, 0] = 0          # DC carried by Y2
                    y_levels.append(lev)
            # chroma
            cx, cy = mx * 8, my * 8
            usrc = upl[cy:cy + 8, cx:cx + 8]
            vsrc = vpl[cy:cy + 8, cx:cx + 8]
            uabove = (recon_u[cy - 1, cx:cx + 8].astype(np.int32)
                      if my else None)
            uleft = (recon_u[cy:cy + 8, cx - 1].astype(np.int32)
                     if mx else None)
            ual = int(recon_u[cy - 1, cx - 1]) if (mx and my) else None
            vabove = (recon_v[cy - 1, cx:cx + 8].astype(np.int32)
                      if my else None)
            vleft = (recon_v[cy:cy + 8, cx - 1].astype(np.int32)
                     if mx else None)
            val_ = int(recon_v[cy - 1, cx - 1]) if (mx and my) else None
            bestc = None
            for mode in (DC_PRED, V_PRED, H_PRED, TM_PRED):
                pu = _predict_block(mode, uabove, uleft, ual, 8)
                pv = _predict_block(mode, vabove, vleft, val_, 8)
                cost = int(np.abs(usrc - pu).sum()
                           + np.abs(vsrc - pv).sum())
                if bestc is None or cost < bestc[1]:
                    bestc = (mode, cost, pu, pv)
            uvmode, _, pu, pv = bestc
            u_levels, v_levels = [], []
            for (s, p, out) in ((usrc, pu, u_levels), (vsrc, pv,
                                                       v_levels)):
                for b in range(4):
                    by, bx = b // 2, b % 2
                    resid = (s[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4]
                             - p[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4])
                    out.append(_quantize(fdct4x4(resid), q["uv"][0],
                                         q["uv"][1]))
            skip = (not y2_levels.any()
                    and not any(l.any() for l in y_levels)
                    and not any(l.any() for l in u_levels)
                    and not any(l.any() for l in v_levels))
            # reconstruct exactly as the decoder will (B_PRED already
            # reconstructed per-block above)
            if not force_bpred:
                for b in range(16):
                    by, bx = b // 4, b % 4
                    cf = _dequantize(y_levels[b], q["y"][0], q["y"][1])
                    cf[0, 0] = y2_rec[by, bx]
                    res = idct4x4(cf)
                    blk = pred[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4]
                    recon_y[yy + by * 4:yy + by * 4 + 4,
                            yx + bx * 4:yx + bx * 4 + 4] = np.clip(
                        blk + res, 0, 255)
            for (levels, p, plane_arr) in ((u_levels, pu, recon_u),
                                           (v_levels, pv, recon_v)):
                for b in range(4):
                    by, bx = b // 2, b % 2
                    cf = _dequantize(levels[b], q["uv"][0], q["uv"][1])
                    res = idct4x4(cf)
                    blk = p[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4]
                    plane_arr[cy + by * 4:cy + by * 4 + 4,
                              cx + bx * 4:cx + bx * 4 + 4] = np.clip(
                        blk + res, 0, 255)
            mbs.append({"ymode": ymode, "uvmode": uvmode, "skip": skip,
                        "y2": y2_levels, "y": y_levels, "u": u_levels,
                        "v": v_levels, "bmodes": bmodes})

    # --- first partition: header + modes ---
    be = BoolEncoder()
    be.bool(128, 0)                          # color_space
    be.bool(128, 0)                          # clamping
    be.bool(128, 0)                          # segmentation_enabled
    be.bool(128, filter_type & 1)
    be.literal(6, filter_level)
    be.literal(3, sharpness)
    be.bool(128, 0)                          # lf_delta_enabled
    if n_partitions not in (1, 2, 4, 8):
        raise ValueError("n_partitions must be 1, 2, 4 or 8")
    be.literal(2, n_partitions.bit_length() - 1)
    be.literal(7, qi)
    for _ in range(5):
        be.bool(128, 0)                      # no quantizer deltas
    be.bool(128, 1)                          # refresh entropy
    for t in range(4):
        for b in range(8):
            for c in range(3):
                for l in range(11):
                    be.bool(COEF_UPDATE_PROBS[t][b][c][l], 0)
    be.bool(128, 1)                          # mb_no_coeff_skip
    be.literal(8, 128)                       # prob_skip_false
    above_bm = [[B_DC_PRED] * 4 for _ in range(mb_w)]
    for my in range(mb_h):
        left_bm = [B_DC_PRED] * 4
        for mx in range(mb_w):
            m = mbs[my * mb_w + mx]
            be.bool(128, m["skip"])
            be.tree(KF_YMODE_TREE, KF_YMODE_PROBS, m["ymode"])
            if m["ymode"] == B_PRED:
                sub = m["bmodes"]
                for by in range(4):
                    for bx in range(4):
                        a = (above_bm[mx][bx] if by == 0
                             else sub[(by - 1) * 4 + bx])
                        lft = (left_bm[by] if bx == 0
                               else sub[by * 4 + bx - 1])
                        be.tree(BMODE_TREE, KF_BMODE_PROBS[a][lft],
                                sub[by * 4 + bx])
                above_bm[mx] = sub[12:16]
                left_bm = [sub[3], sub[7], sub[11], sub[15]]
            else:
                analog = {DC_PRED: B_DC_PRED, V_PRED: B_VE_PRED,
                          H_PRED: B_HE_PRED,
                          TM_PRED: B_TM_PRED}[m["ymode"]]
                above_bm[mx] = [analog] * 4
                left_bm = [analog] * 4
            be.tree(UV_MODE_TREE, KF_UV_MODE_PROBS, m["uvmode"])
    first_part = be.finish()

    # --- token partitions (context tracking mirrors the decoder;
    # MB row r goes to partition r % n_partitions, §9.5) ---
    tes = [BoolEncoder() for _ in range(n_partitions)]
    above_nz = {"y": np.zeros(mb_w * 4, dtype=np.int32),
                "u": np.zeros(mb_w * 2, dtype=np.int32),
                "v": np.zeros(mb_w * 2, dtype=np.int32),
                "y2": np.zeros(mb_w, dtype=np.int32)}
    for my in range(mb_h):
        te = tes[my % n_partitions]
        left_nz = {"y": np.zeros(4, dtype=np.int32),
                   "u": np.zeros(2, dtype=np.int32),
                   "v": np.zeros(2, dtype=np.int32),
                   "y2": np.zeros(1, dtype=np.int32)}
        for mx in range(mb_w):
            m = mbs[my * mb_w + mx]
            has_y2 = m["ymode"] != B_PRED
            if m["skip"]:
                left_nz["y"][:] = 0
                left_nz["u"][:] = 0
                left_nz["v"][:] = 0
                above_nz["y"][mx * 4:mx * 4 + 4] = 0
                above_nz["u"][mx * 2:mx * 2 + 2] = 0
                above_nz["v"][mx * 2:mx * 2 + 2] = 0
                if has_y2:             # §13: B_PRED keeps the Y2 ctx
                    left_nz["y2"][0] = 0
                    above_nz["y2"][mx] = 0
                continue
            if has_y2:
                ctx = int(above_nz["y2"][mx] + left_nz["y2"][0])
                nz = _encode_coeffs(te, PLANE_Y2, ctx, probs,
                                    _zig(m["y2"]), 0)
                above_nz["y2"][mx] = left_nz["y2"][0] = nz
            plane = PLANE_Y_NO_DC if has_y2 else PLANE_Y_WITH_DC
            first = 1 if has_y2 else 0
            for b in range(16):
                by, bx = b // 4, b % 4
                ctx = int(above_nz["y"][mx * 4 + bx] + left_nz["y"][by])
                nz = _encode_coeffs(te, plane, ctx, probs,
                                    _zig(m["y"][b]), first)
                above_nz["y"][mx * 4 + bx] = left_nz["y"][by] = nz
            for cname in ("u", "v"):
                for b in range(4):
                    by, bx = b // 2, b % 2
                    ctx = int(above_nz[cname][mx * 2 + bx]
                              + left_nz[cname][by])
                    nz = _encode_coeffs(te, PLANE_UV, ctx, probs,
                                        _zig(m[cname][b]), 0)
                    above_nz[cname][mx * 2 + bx] = nz
                    left_nz[cname][by] = nz
    token_parts = [t.finish() for t in tes]
    tokens = b"".join(len(p).to_bytes(3, "little")
                      for p in token_parts[:-1]) + b"".join(token_parts)

    fps = len(first_part)
    if fps >= (1 << 19):
        raise ValueError("VP8 first partition too large")
    tag = (fps << 5) | (1 << 4) | (0 << 1) | 0   # show, v0, keyframe
    head = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    head += b"\x9d\x01\x2a"
    head += bytes([w & 0xFF, (w >> 8) & 0x3F])
    head += bytes([hgt & 0xFF, (hgt >> 8) & 0x3F])
    payload = head + first_part + tokens
    if return_recon:
        return payload, (recon_y[:hgt, :w],
                         recon_u[:(hgt + 1) // 2, :(w + 1) // 2],
                         recon_v[:(hgt + 1) // 2, :(w + 1) // 2])
    return payload


def encode_webp_lossy(img: np.ndarray, **kw) -> bytes:
    """RGB → RIFF/WEBP container holding a lossy VP8 key frame."""
    vp8 = encode_vp8(img, **kw)
    chunk = b"VP8 " + len(vp8).to_bytes(4, "little") + vp8
    if len(vp8) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff
