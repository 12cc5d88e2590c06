"""WebP lossless (VP8L) codec tests — round trips through the encoder's
spec-valid subset, plus HAND-BUILT streams for the decoder paths the
encoder never emits (color cache, meta-Huffman groups, cross-color
transform, the max_symbol shortcut and 16/17/18 code-length repeats),
mirroring the FLAC suite's hand-built-frame strategy. Fast, no Spark."""

import numpy as np
import pytest

import rdf_rdfxml_spark.operators.webp as W
from rdf_rdfxml_spark.operators.multimodal import (
    DecodeError, decode_image,
)


def _vp8l_stream(bits_builder, w, h):
    """Wrap a bit-writing callback into a full RIFF/WEBP payload."""
    bw = W._LBitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bits_builder(bw)
    vp8l = bytes([0x2F]) + bw.finish()
    chunk = b"VP8L" + len(vp8l).to_bytes(4, "little") + vp8l
    if len(vp8l) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


def _write_single(bw, sym, alphabet):
    lengths = [0] * alphabet
    lengths[sym] = 1
    W._write_huffman_code(bw, lengths)


def test_webp_roundtrip_matrix():
    """Every encoder configuration round-trips exactly: plain,
    subtract-green, all 14 predictor modes, LZ77 runs on/off, palettes
    packed and unpacked, degenerate shapes."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(13, 17, 3), dtype=np.uint8)
    cfgs = [dict(), dict(subtract_green=False), dict(use_lz77=False)]
    cfgs += [dict(predictor_mode=m) for m in range(14)]
    for kw in cfgs:
        p = W.encode_webp_lossless(img, **kw)
        assert (W.decode_webp(p) == img).all(), kw
        assert (decode_image(p) == img).all(), kw      # dispatch
    runs = np.zeros((20, 30, 3), dtype=np.uint8)
    runs[5:15, 5:25] = [10, 200, 30]
    assert (W.decode_webp(W.encode_webp_lossless(runs)) == runs).all()
    pal3 = (np.arange(9 * 31).reshape(9, 31) % 3
            ).astype(np.uint8)[..., None].repeat(3, 2) * 40
    assert (W.decode_webp(
        W.encode_webp_lossless(pal3, palette=True)) == pal3).all()
    pal36 = rng.integers(0, 256, size=(6, 6, 3), dtype=np.uint8)
    assert (W.decode_webp(
        W.encode_webp_lossless(pal36, palette=True)) == pal36).all()
    for shape in ((1, 1, 3), (1, 64, 3), (64, 1, 3)):
        t = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert (W.decode_webp(W.encode_webp_lossless(t)) == t).all()


def test_webp_color_cache_stream():
    """Hand-built stream with a 4-entry color cache: two literals, then
    both re-emitted as cache symbols — the decoder must return them
    from the cache, not the trees."""
    pa = 0xFF102030
    pb = 0xFF405060
    cache_bits = 2
    ia = (0x1E35A7BD * pa & 0xFFFFFFFF) >> (32 - cache_bits)
    ib = (0x1E35A7BD * pb & 0xFFFFFFFF) >> (32 - cache_bits)
    assert ia != ib  # distinct slots, so both stay cached

    def build(bw):
        bw.write(0, 1)                       # no transforms
        bw.write(1, 1)                       # cache present
        bw.write(cache_bits, 4)
        bw.write(0, 1)                       # no meta
        galpha = 256 + 24 + (1 << cache_bits)
        gsyms = [(pa >> 8) & 0xFF, (pb >> 8) & 0xFF,
                 256 + 24 + ia, 256 + 24 + ib]
        glen = [0] * galpha
        for s in gsyms:
            glen[s] = 2
        W._write_huffman_code(bw, glen)
        gcodes = W._canonical_codes(glen)
        rlen = [0] * 256
        rlen[(pa >> 16) & 0xFF] = rlen[(pb >> 16) & 0xFF] = 1
        W._write_huffman_code(bw, rlen)
        rcodes = W._canonical_codes(rlen)
        blen = [0] * 256
        blen[pa & 0xFF] = blen[pb & 0xFF] = 1
        W._write_huffman_code(bw, blen)
        bcodes = W._canonical_codes(blen)
        _write_single(bw, 0xFF, 256)         # alpha constant
        _write_single(bw, 0, 40)             # distance unused
        for px in (pa, pb):
            c, n = gcodes[(px >> 8) & 0xFF]
            bw.write(c, n)
            c, n = rcodes[(px >> 16) & 0xFF]
            bw.write(c, n)
            c, n = bcodes[px & 0xFF]
            bw.write(c, n)
        for idx in (ia, ib):                 # cache hits
            c, n = gcodes[256 + 24 + idx]
            bw.write(c, n)

    rgb = W.decode_webp(_vp8l_stream(build, 4, 1))
    expect = np.array([[(0x10, 0x20, 0x30), (0x40, 0x50, 0x60),
                        (0x10, 0x20, 0x30), (0x40, 0x50, 0x60)]],
                      dtype=np.uint8)
    assert (rgb == expect).all()


def test_webp_meta_huffman_groups():
    """Hand-built stream with two meta-Huffman groups (block size 4 on
    an 8x1 image): each group's trees are 1-symbol, so the pixel value
    proves which group decoded it."""
    def build(bw):
        bw.write(0, 1)                       # no transforms
        bw.write(0, 1)                       # no cache
        bw.write(1, 1)                       # meta present
        bw.write(0, 3)                       # meta_bits = 2 → blocks of 4
        # meta image 2x1: green channel = group id (r=0)
        bw.write(0, 1)                       # (meta img) no cache
        glen = [0] * (256 + 24)
        glen[0] = glen[1] = 1
        W._write_huffman_code(bw, glen)
        gcodes = W._canonical_codes(glen)
        _write_single(bw, 0, 256)            # red
        _write_single(bw, 0, 256)            # blue
        _write_single(bw, 0xFF, 256)         # alpha
        _write_single(bw, 0, 40)             # distance
        for gid in (0, 1):
            c, n = gcodes[gid]
            bw.write(c, n)
        # two groups, all trees single-symbol (zero bits per pixel)
        for green_val in (0x20, 0x80):
            _write_single(bw, green_val, 256 + 24)
            _write_single(bw, 0x11, 256)     # red
            _write_single(bw, 0x22, 256)     # blue
            _write_single(bw, 0xFF, 256)     # alpha
            _write_single(bw, 0, 40)
        # 8 pixels: zero bits each

    rgb = W.decode_webp(_vp8l_stream(build, 8, 1))
    assert (rgb[0, :4] == (0x11, 0x20, 0x22)).all()
    assert (rgb[0, 4:] == (0x11, 0x80, 0x22)).all()


def test_webp_cross_color_transform():
    """Hand-built COLOR (cross-color) transform: one block whose
    element holds green_to_red / green_to_blue / red_to_blue deltas;
    the decoder must apply the signed (t*c)>>5 adjustments in spec
    order (blue sees the ALREADY-adjusted red)."""
    g2r, g2b, r2b = 32, 64, 16              # +1.0, +2.0, +0.5 in Q5
    g, r, b = 40, 10, 20

    def build(bw):
        bw.write(1, 1)
        bw.write(1, 2)                       # COLOR transform
        bw.write(0, 3)                       # bits = 2
        # element image 1x1: red=r2b, green=g2b, blue=g2r
        bw.write(0, 1)                       # no cache
        _write_single(bw, g2b, 256 + 24)     # green channel
        _write_single(bw, r2b, 256)          # red channel
        _write_single(bw, g2r, 256)          # blue channel
        _write_single(bw, 0xFF, 256)
        _write_single(bw, 0, 40)
        bw.write(0, 1)                       # end of transforms
        bw.write(0, 1)                       # (main) no cache
        bw.write(0, 1)                       # no meta
        _write_single(bw, g, 256 + 24)
        _write_single(bw, r, 256)
        _write_single(bw, b, 256)
        _write_single(bw, 0xFF, 256)
        _write_single(bw, 0, 40)

    rgb = W.decode_webp(_vp8l_stream(build, 1, 1))
    exp_r = (r + ((g2r * g) >> 5)) & 0xFF
    exp_b = (b + ((g2b * g) >> 5) + ((r2b * exp_r) >> 5)) & 0xFF
    assert tuple(rgb[0, 0]) == (exp_r, g, exp_b)


def test_webp_code_length_repeats_and_max_symbol():
    """Hand-built green tree using the 16 (repeat previous), 17/18
    (zero runs) code-length symbols AND the max_symbol shortcut — the
    tree-coding machinery the balanced encoder never exercises."""
    def build(bw):
        bw.write(0, 1)                       # no transforms
        bw.write(0, 1)                       # no cache
        bw.write(0, 1)                       # no meta
        # green tree: symbols 0..7 length 3 via one '3' + repeat 16s,
        # then zeros to the end via 18s, written with max_symbol.
        bw.write(0, 1)                       # not simple
        bw.write(15, 4)                      # 19 code-length codes
        cl_lengths = [0] * 19
        cl_lengths[3] = 1                    # '3' appears often
        cl_lengths[16] = 2                   # repeat
        cl_lengths[18] = 2                   # big zero run (unused here)
        for slot in W._CODE_LENGTH_ORDER:
            bw.write(cl_lengths[slot], 3)
        cl = W._canonical_codes(cl_lengths)
        bw.write(1, 1)                       # use max_symbol
        bw.write(1, 3)                       # length_nbits = 4
        bw.write(8, 4)                       # max_symbol = 10 entries
        c, n = cl[3]                         # sym0 := len 3
        bw.write(c, n)
        for _ in range(2):                   # two 16-repeats: 3+ReadBits(2)
            c, n = cl[16]
            bw.write(c, n)
            bw.write(0, 2)                   # +3 → covers syms 1..6
        c, n = cl[3]                         # sym7 := len 3
        bw.write(c, n)
        # 8 symbols of length 3: complete code; remaining entries 0 via
        # the max_symbol cutoff (10 reads total: 1 + 2 + 1 = 4 used...)
        # pad reads to hit the cutoff exactly with 18-runs
        # (not needed: loop also stops when max_symbol hits 0, and we
        # consumed 4 of 10 — emit one 18-run to land sym at 280)
        c, n = cl[18]
        bw.write(c, n)
        bw.write(127, 7)                     # 11+127 zeros
        c, n = cl[18]
        bw.write(c, n)
        bw.write(123, 7)                     # 11+123 zeros → 280 total
        gcodes = W._canonical_codes(
            [3] * 8 + [0] * (256 + 24 - 8))
        _write_single(bw, 9, 256)            # red
        _write_single(bw, 8, 256)            # blue
        _write_single(bw, 0xFF, 256)         # alpha
        _write_single(bw, 0, 40)
        for gsym in (5, 2, 7, 0):
            c, n = gcodes[gsym]
            bw.write(c, n)

    rgb = W.decode_webp(_vp8l_stream(build, 4, 1))
    assert [int(px[1]) for px in rgb[0]] == [5, 2, 7, 0]
    assert (rgb[..., 0] == 9).all() and (rgb[..., 2] == 8).all()


def test_webp_typed_errors_and_fuzz():
    """Typed-error contract: malformed RIFF/VP8L payloads and random
    bit flips never raise anything but DecodeError; VP8 (lossy) is the
    declared seam."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(9, 9, 3), dtype=np.uint8)
    good = W.encode_webp_lossless(img)
    for garbage in (
            b"RIFF",
            b"RIFF\x08\x00\x00\x00WEBP",
            b"RIFF\x14\x00\x00\x00WEBPVP8 \x04\x00\x00\x00abcd",
            b"RIFF\x14\x00\x00\x00WEBPVP8L\x02\x00\x00\x00\x00\x00",
            good[:30]):
        with pytest.raises(DecodeError):
            W.decode_webp(garbage)
    flips = 0
    for _ in range(120):
        bad = bytearray(good)
        i = int(rng.integers(20, len(bad)))
        bad[i] ^= 1 << int(rng.integers(0, 8))
        try:
            W.decode_webp(bytes(bad))
        except DecodeError:
            flips += 1
        # any non-DecodeError exception fails the test by propagating
    assert flips > 0


def test_webp_compresses_structured_input():
    """The palette+LZ77 paths actually compress: a 2-color 64x64 image
    must come out far below raw 3 bytes/px (codec, not container)."""
    img = np.zeros((64, 64, 3), dtype=np.uint8)
    img[::2] = 255
    p = W.encode_webp_lossless(img, palette=True)
    assert len(p) < 64 * 64 * 3 * 0.05
    assert (W.decode_webp(p) == img).all()


from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(1, 24), st.integers(1, 24),
       st.sampled_from([None, 0, 1, 2, 7, 11, 12, 13]),
       st.booleans(), st.booleans())
def test_webp_roundtrip_property(seed, w, h, pred, sub_green, lz77):
    """Property: ANY image round-trips exactly through ANY encoder
    configuration (predictor mode × subtract-green × LZ77)."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    p = W.encode_webp_lossless(img, subtract_green=sub_green,
                               predictor_mode=pred, use_lz77=lz77)
    assert (W.decode_webp(p) == img).all()


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(1, 30), st.integers(1, 30),
       st.integers(2, 17))
def test_webp_palette_roundtrip_property(seed, w, h, n_colors):
    """Property: palettized images of any color count (2..17 spans all
    three packing widths plus the unpacked case) round-trip exactly."""
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, size=(h, w))
    img = pal[idx]
    p = W.encode_webp_lossless(img, palette=True)
    assert (W.decode_webp(p) == img).all()


def test_webp_near_distance_2d_copy():
    """Hand-built stream using a NEAR distance code (code 1 = offset
    (0, 1) in the reconstructed table → distance = image width): one
    literal row, then an LZ77 copy of length w with that code must
    duplicate the row above — the 2-D distance-mapping path the
    direct-distance encoder never emits."""
    pxs = [0xFF102030, 0xFF405060, 0xFF708090]
    w = len(pxs)

    def build(bw):
        bw.write(0, 1)                       # no transforms
        bw.write(0, 1)                       # no cache
        bw.write(0, 1)                       # no meta
        galpha = 256 + 24
        gsyms = sorted({(p >> 8) & 0xFF for p in pxs} | {256 + 2})
        glen = [0] * galpha
        for s in gsyms:
            glen[s] = 2
        W._write_huffman_code(bw, glen)
        gcodes = W._canonical_codes(glen)

        def chan_tree(vals):
            lens = [0] * 256
            for v in vals:
                lens[v] = 2
            # pad to a complete 4-leaf code with unused symbols
            pad = [s for s in range(256) if lens[s] == 0][:4 - len(vals)]
            for s in pad:
                lens[s] = 2
            W._write_huffman_code(bw, lens)
            return W._canonical_codes(lens)

        rcodes = chan_tree(sorted({(p >> 16) & 0xFF for p in pxs}))
        bcodes = chan_tree(sorted({p & 0xFF for p in pxs}))
        _write_single(bw, 0xFF, 256)         # alpha
        _write_single(bw, 0, 40)             # distance: code 0 → 1 → (0,1)
        for px in pxs:                       # row 0: literals
            c, n = gcodes[(px >> 8) & 0xFF]
            bw.write(c, n)
            c, n = rcodes[(px >> 16) & 0xFF]
            bw.write(c, n)
            c, n = bcodes[px & 0xFF]
            bw.write(c, n)
        # row 1: copy length 3 (green sym 256+2), dist via single tree
        c, n = gcodes[256 + 2]
        bw.write(c, n)

    rgb = W.decode_webp(_vp8l_stream(build, w, 2))
    assert (rgb[1] == rgb[0]).all()
    assert tuple(rgb[0, 0]) == (0x10, 0x20, 0x30)
    assert tuple(rgb[0, 2]) == (0x70, 0x80, 0x90)


def test_webp_near_distance_table_structure():
    """Structural invariants of the reconstructed near-distance table:
    120 unique in-range offsets, non-decreasing squared distance, the
    spec's visible tie pattern (positive dx immediately before its
    negative twin), and the known leading entries."""
    t = W._NEAR_DIST
    assert len(t) == 120 and len(set(t)) == 120
    assert all(-8 <= dx <= 8 and 0 <= dy <= 7 for dx, dy in t)
    d2 = [dx * dx + dy * dy for dx, dy in t]
    assert d2 == sorted(d2)
    for i, (dx, dy) in enumerate(t):
        if dx > 0 and (-dx, dy) in t:
            assert t.index((-dx, dy)) == i + 1, (dx, dy)
    assert t[:6] == [(0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0)]


def test_webp_encoder_color_transform_roundtrip():
    """Encoder-emitted cross-color transform (round 5 completes the
    emit-side transform matrix): forward-subtracted deltas must invert
    exactly through the decoder, alone and stacked with subtract-green
    and a predictor."""
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, size=(11, 14, 3), dtype=np.uint8)
    for kw in (dict(subtract_green=False, color_transform=(32, 64, 16)),
               dict(color_transform=(255, 1, 200)),    # negative int8s
               dict(color_transform=(7, 130, 0), predictor_mode=7)):
        p = W.encode_webp_lossless(img, **kw)
        assert (W.decode_webp(p) == img).all(), kw


def test_webp_vp8x_extended_still():
    """A VP8X (extended-container) STILL whose image data is a VP8L
    chunk decodes — the RIFF walk skips the VP8X header and metadata
    chunks (EXIF here) instead of rejecting them; lossy VP8 and
    animation chunks still raise the declared typed error."""
    rng = np.random.default_rng(29)
    img = rng.integers(0, 256, size=(7, 9, 3), dtype=np.uint8)
    plain = W.encode_webp_lossless(img)
    vp8l_chunk = plain[12:]                  # the VP8L chunk bytes
    h, w = img.shape[:2]
    vp8x = (b"VP8X" + (10).to_bytes(4, "little")
            + bytes([0x08, 0, 0, 0])         # EXIF flag set
            + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little"))
    exif = b"EXIF" + (5).to_bytes(4, "little") + b"fake!" + b"\x00"
    body = b"WEBP" + vp8x + exif + vp8l_chunk
    payload = b"RIFF" + len(body).to_bytes(4, "little") + body
    assert (W.decode_webp(payload) == img).all()
    # a MALFORMED animation chunk (too short for the 16-byte ANMF
    # header) is a typed error, not a crash (round 6: well-formed
    # animations decode — see test_webp_animation_*)
    anim = b"ANMF" + (4).to_bytes(4, "little") + b"\x00" * 4
    body2 = b"WEBP" + vp8x + anim + vp8l_chunk
    with pytest.raises(DecodeError):
        W.decode_webp(b"RIFF" + len(body2).to_bytes(4, "little") + body2)


def test_webp_predictor13_truncating_division():
    """ClampAddSubtractHalf uses C division (truncate toward zero):
    for avg < TL with an odd delta, floor division is off by one.
    avg2(L=10, T=10) = 10, TL = 13 -> d = -3; C gives 10 + (-1) = 9,
    Python floor would give 10 + (-2) = 8."""
    ch = np.zeros((2, 2, 4), dtype=np.uint8)
    ch[1, 0] = [10, 10, 10, 10]              # left
    ch[0, 1] = [10, 10, 10, 10]              # top
    ch[0, 0] = [13, 13, 13, 13]              # top-left
    pred = W._pred_value(ch, 1, 1, 13, 2)
    assert (pred == 9).all()
    # positive delta sanity: avg=13, TL=10 -> d=3 -> 13 + 1 = 14
    ch[1, 0] = ch[0, 1] = [13, 13, 13, 13]
    ch[0, 0] = [10, 10, 10, 10]
    assert (W._pred_value(ch, 1, 1, 13, 2) == 14).all()


def test_webp_predictor11_tie_returns_top():
    """Select (mode 11): spec is `if (pL < pT) return L else return T`
    — an exact Manhattan-distance tie must return TOP."""
    ch = np.zeros((2, 2, 4), dtype=np.uint8)
    ch[0, 0] = [255, 10, 10, 10]             # TL
    ch[1, 0] = [255, 20, 10, 10]             # L: |L-TL| = 10
    ch[0, 1] = [255, 10, 20, 10]             # T: |T-TL| = 10  (tie)
    pred = W._pred_value(ch, 1, 1, 11, 2)
    assert (pred == ch[0, 1]).all()          # tie -> TOP
    # non-tie sanity: pl = |T-TL|, pt = |L-TL|; moving L far from TL
    # makes pt large -> pl < pt -> LEFT wins
    ch[1, 0] = [255, 200, 10, 10]
    assert (W._pred_value(ch, 1, 1, 11, 2) == ch[1, 0]).all()


def test_webp_encode_full_alphabet_channel():
    """A channel using its entire 256-value alphabet produces a
    balanced code where EVERY symbol has length 8 (n=256, D=0) — the
    code-length set is a singleton and must be written as a 1-symbol
    code-length code (zero bits per length), not crash."""
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[..., 0] = np.arange(256, dtype=np.uint8).reshape(16, 16)  # R full
    img[..., 1] = 7
    img[..., 2] = np.arange(256, dtype=np.uint8).reshape(16, 16)[::-1]
    p = W.encode_webp_lossless(img, subtract_green=False, use_lz77=False)
    assert (W.decode_webp(p) == img).all()
    # and with defaults (subtract-green shifts the alphabet, coverage
    # stays full because green is constant)
    p2 = W.encode_webp_lossless(img)
    assert (W.decode_webp(p2) == img).all()


def test_webp_near_distance_encoder_ab():
    """Round-6 VERDICT #7 decoder A/B: the encoder EMITS near-distance
    codes ((0,1) row-above and (1,1) diagonal copies) and the decoder
    maps them back through the same reconstructed table — pinning the
    table's self-consistency in both directions. The stream must
    actually carry near codes (checked by re-encoding without them and
    confirming the direct-distance stream differs in the dist tree)."""
    # vertical stripes: every row equals the row above -> (0,1) copies
    img = np.zeros((12, 20, 3), dtype=np.uint8)
    img[:, :, 0] = (np.arange(20) * 13 % 256)[None, :]
    img[:, :, 1] = (np.arange(20) * 29 % 256)[None, :]
    img[:, :, 2] = 40
    p_near = W.encode_webp_lossless(img, subtract_green=False,
                                    near_distances=True)
    assert (W.decode_webp(p_near) == img).all()
    # diagonal self-similar pattern -> (1,1) copies
    diag = np.zeros((16, 16, 3), dtype=np.uint8)
    for y in range(16):
        for x in range(16):
            diag[y, x] = ((x - y) * 37 % 256, (x - y) * 11 % 256, 7)
    p_diag = W.encode_webp_lossless(diag, subtract_green=False,
                                    near_distances=True)
    assert (W.decode_webp(p_diag) == diag).all()
    # the near stream must be smaller than the literal-only stream
    # (the copies fired) and differ from the direct-distance encoding
    p_plain = W.encode_webp_lossless(img, subtract_green=False,
                                     near_distances=False)
    assert len(p_near) < len(p_plain)
    assert p_near != p_plain


def test_webp_animation_compositing():
    """ANMF round trip: encoder frames with offsets + dispose decode to
    the exactly-composited canvases; decode_webp returns the first
    composited frame; dispatch through decode_image works; lossy VP8
    frames are accepted too."""
    rng = np.random.default_rng(41)
    f0 = rng.integers(0, 256, size=(10, 14, 3), dtype=np.uint8)
    f1 = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    f2 = rng.integers(0, 256, size=(6, 4, 3), dtype=np.uint8)
    p = W.encode_webp_anim([f0, f1, f2],
                           offsets=[(0, 0), (4, 2), (8, 4)],
                           dispose=[0, 1, 0], bg=(10, 20, 30))
    frames = W.decode_webp_anim(p)
    c = np.zeros((10, 14, 3), np.uint8)
    c[:] = (10, 20, 30)
    c[0:10, 0:14] = f0
    e0 = c.copy()
    c[2:6, 4:10] = f1
    e1 = c.copy()
    c[2:6, 4:10] = (10, 20, 30)              # dispose after frame 1
    c[4:10, 8:12] = f2
    e2 = c.copy()
    assert len(frames) == 3
    assert (frames[0] == e0).all() and (frames[1] == e1).all() \
        and (frames[2] == e2).all()
    assert (W.decode_webp(p) == e0).all()
    assert (decode_image(p) == e0).all()
    # lossy VP8 frames inside ANMF decode as well
    pl = W.encode_webp_anim([f0], lossy=True)
    assert W.decode_webp_anim(pl)[0].shape == (10, 14, 3)


def test_webp_animation_bounds_and_errors():
    """Typed errors: ANMF before VP8X, frame exceeding canvas, frame
    count bound, no-image frame."""
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    good = W.encode_webp_anim([img, img])
    # strip the VP8X chunk: ANMF with no canvas
    chunks = list(W._riff_chunks(good))
    body = b"WEBP" + b"".join(
        cc + len(b).to_bytes(4, "little") + b + (b"\x00" if len(b) & 1
                                                 else b"")
        for cc, b in chunks if cc != b"VP8X")
    with pytest.raises(DecodeError, match="before VP8X"):
        W.decode_webp_anim(b"RIFF" + len(body).to_bytes(4, "little")
                           + body)
    with pytest.raises(DecodeError, match="exceeds canvas"):
        W.decode_webp_anim(W.encode_webp_anim(
            [img], offsets=[(6, 6)], canvas=(8, 8)))
    with pytest.raises(DecodeError, match="too many"):
        W.decode_webp_anim(W.encode_webp_anim([img] * 5), max_frames=4)


def test_webp_animation_frame_sampling():
    """split_video_frames dispatches RIFF/WEBP to the ANMF decoder and
    emits standalone PPM frames equal to the composited canvases."""
    from rdf_rdfxml_spark.operators.multimodal import (
        decode_ppm, split_video_frames,
    )
    rng = np.random.default_rng(43)
    frames = [rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
              for _ in range(5)]
    p = W.encode_webp_anim(frames)
    out = split_video_frames(p)
    assert len(out) == 5
    want = W.decode_webp_anim(p)
    for enc, w_ in zip(out, want):
        assert (decode_ppm(enc) == w_).all()


def test_webp_alph_roundtrip_all_filters():
    """ALPH plane round trips through raw compression with every
    filter (none/horizontal/vertical/gradient), and the HEADERLESS
    VP8L-compressed mode (alpha in the green channel) decodes."""
    rng = np.random.default_rng(47)
    a = rng.integers(0, 256, size=(9, 13), dtype=np.uint8)
    for filt in range(4):
        assert (W.decode_alph(W.encode_alph(a, filt=filt), 13, 9)
                == a).all(), filt
    bw = W._LBitWriter()
    bw.write(0, 1)                           # end of transforms
    W._write_entropy_image(
        bw, (np.uint32(255) << 24) | (a.astype(np.uint32) << 8),
        level0=True)
    assert (W.decode_alph(bytes([0x01]) + bw.finish(), 13, 9) == a).all()
    with pytest.raises(DecodeError, match="reserved ALPH"):
        W.decode_alph(bytes([0x03]) + b"\x00" * 117, 13, 9)
    with pytest.raises(DecodeError, match="truncated"):
        W.decode_alph(bytes([0x00]) + b"\x00" * 10, 13, 9)


def test_webp_alph_filter_edge_rules_spec_vectors():
    """Container-spec edge rules for ALPH filters 1/2 (round-7 ADVICE
    fix): only (0,0) predicts from 0 — the horizontal filter predicts
    each row-start (0, y>0) from the pixel ABOVE and the vertical
    filter predicts the top row (x>0, 0) from the pixel to the LEFT.
    Hand-computed 3x3 reconstructions (external-file semantics, not
    just an encode/decode mirror)."""
    res = np.arange(1, 10, dtype=np.uint8).reshape(3, 3)  # residuals
    # horizontal: out[y][0] = res + out[y-1][0]; out[y][x] = res + left
    hdr1 = bytes([0x01 << 2])                # filt=1, raw compression
    out1 = W.decode_alph(hdr1 + res.tobytes(), 3, 3).astype(int)
    want1 = np.zeros((3, 3), dtype=int)
    for y in range(3):
        for x in range(3):
            pred = (0 if (x == 0 and y == 0)
                    else want1[y - 1, 0] if x == 0
                    else want1[y, x - 1])
            want1[y, x] = (int(res[y, x]) + pred) & 0xFF
    assert (out1 == want1).all()
    # vertical: out[0][x] = res + out[0][x-1]; out[y][x] = res + above
    hdr2 = bytes([0x02 << 2])
    out2 = W.decode_alph(hdr2 + res.tobytes(), 3, 3).astype(int)
    want2 = np.zeros((3, 3), dtype=int)
    for y in range(3):
        for x in range(3):
            pred = (0 if (x == 0 and y == 0)
                    else want2[0, x - 1] if y == 0
                    else want2[y - 1, x])
            want2[y, x] = (int(res[y, x]) + pred) & 0xFF
    assert (out2 == want2).all()


def test_webp_anim_alpha_blend():
    """ANMF blending is real (round 6): a lossy frame with a
    half-transparent ALPH plane blends onto the canvas with the
    integer (a*src + (255-a)*dst + 127)/255 rule; an opaque frame
    still overwrites."""
    base = np.full((8, 8, 3), 200, dtype=np.uint8)
    over = np.full((8, 8, 3), 40, dtype=np.uint8)
    al = np.full((8, 8), 128, dtype=np.uint8)
    p = W.encode_webp_anim([base, over], alphas=[None, al], lossy=True,
                           bg=(0, 0, 0))
    f = W.decode_webp_anim(p)
    # lossy frames: the blend result sits midway between the decoded
    # base and overlay (both near-flat, so means suffice)
    assert abs(float(f[1].mean())
               - (0.5 * float(f[0].mean()) + 0.5 * 40)) < 8
    # alpha planes require lossy frames (spec ties ALPH to lossy)
    with pytest.raises(ValueError, match="lossy"):
        W.encode_webp_anim([base], alphas=[al])


def test_webp_anim_vp8l_internal_alpha():
    """A VP8L frame's OWN alpha channel drives blending: hand-build a
    1-frame ANMF whose VP8L pixels carry A=100 over a known canvas."""
    # VP8L chunk: 4x2, constant ARGB (A=100, R=10, G=250, B=30)
    bw = W._LBitWriter()
    bw.write(3, 14)                          # w-1
    bw.write(1, 14)                          # h-1
    bw.write(1, 1)                           # alpha hint
    bw.write(0, 3)                           # version
    bw.write(0, 1)                           # end of transforms
    W._write_entropy_image(
        bw, np.full((2, 4), (100 << 24) | (10 << 16) | (250 << 8) | 30,
                    dtype=np.uint32), level0=True)
    vp8l = bytes([0x2F]) + bw.finish()
    chunk = b"VP8L" + len(vp8l).to_bytes(4, "little") + vp8l
    if len(vp8l) & 1:
        chunk += b"\x00"
    vp8x = (b"VP8X" + (10).to_bytes(4, "little") + bytes([0x02, 0, 0, 0])
            + (3).to_bytes(3, "little") + (1).to_bytes(3, "little"))
    anim = (b"ANIM" + (6).to_bytes(4, "little")
            + bytes([200, 150, 100, 255]) + (0).to_bytes(2, "little"))
    anmf_hdr = ((0).to_bytes(3, "little") + (0).to_bytes(3, "little")
                + (3).to_bytes(3, "little") + (1).to_bytes(3, "little")
                + (40).to_bytes(3, "little") + bytes([0]))  # blend on
    anmf_body = anmf_hdr + chunk
    anmf = b"ANMF" + len(anmf_body).to_bytes(4, "little") + anmf_body
    if len(anmf_body) & 1:
        anmf += b"\x00"
    body = b"WEBP" + vp8x + anim + anmf
    p = b"RIFF" + len(body).to_bytes(4, "little") + body
    f = W.decode_webp_anim(p)[0]
    # canvas bg (BGRA 200,150,100 -> RGB 100,150,200), blended at A=100
    bg = np.array([100, 150, 200], dtype=np.uint32)
    src = np.array([10, 250, 30], dtype=np.uint32)
    want = ((100 * src + 155 * bg + 127) // 255).astype(np.uint8)
    assert (f == want).all()
