"""Lossy VP8 (WebP still) codec tests — round trips through the
spec-valid-subset encoder with EXACT encoder/decoder reconstruction
sync (the codec's correctness gate: loss lives entirely in the
quantizer + 4:2:0 pooling, never in the bitstream), hand-computed loop
filter vectors, typed-error/fuzz isolation, and container dispatch.
Fast, no Spark."""

import numpy as np
import pytest

import rdf_rdfxml_spark.operators.vp8 as V
from rdf_rdfxml_spark.operators.multimodal import DecodeError, decode_image


def _sync(img, **kw):
    p, (ry, ru, rv) = V.encode_vp8(img, return_recon=True, **kw)
    dy, du, dv = V.decode_vp8_yuv(p)
    assert (dy == ry).all() and (du == ru).all() and (dv == rv).all(), kw
    return p


def test_bool_coder_round_trip():
    rng = np.random.default_rng(1)
    probs = rng.integers(1, 256, size=3000).tolist()
    vals = rng.integers(0, 2, size=3000).tolist()
    enc = V.BoolEncoder()
    for p, b in zip(probs, vals):
        enc.bool(p, b)
    enc.literal(8, 171)
    enc.signed_literal(4, -7)
    data = enc.finish()
    dec = V.BoolDecoder(data)
    assert [dec.bool(p) for p in probs] == vals
    assert dec.literal(8) == 171
    assert dec.signed_literal(4) == -7


def test_transform_round_trips():
    """fdct->idct and fwht->iwht are near-identity (|err| <= 1) over
    the full residual range — the encoder-side forward transforms only
    need the spec INVERSE to undo them."""
    rng = np.random.default_rng(3)
    for _ in range(100):
        b = rng.integers(-255, 256, size=(4, 4))
        assert np.abs(V.idct4x4(V.fdct4x4(b)) - b).max() <= 1
        b2 = rng.integers(-2000, 2001, size=(4, 4))
        assert np.abs(V.iwht4x4(V.fwht4x4(b2)) - b2).max() <= 1


def test_dequant_factors():
    """§14.1: Y2 DC x2, Y2 AC x155/100 min 8, UV DC capped at 132."""
    q = V.dequant_factors(0)
    assert q["y"] == (4, 4) and q["y2"] == (8, 8) and q["uv"] == (4, 4)
    q = V.dequant_factors(127)
    assert q["y2"][0] == 157 * 2
    assert q["uv"][0] == 132          # cap (dc lookup gives 157)
    assert q["y2"][1] == 284 * 155 // 100


def test_loop_filter_hand_vectors():
    """§15.2 hand-computed: the simple-filter segment and the
    hev-false normal MB filter on constructed edges."""
    # simple: p1,p0,q0,q1 = 10,20,40,30 (unsigned), limit 60
    px = [10 - 128, 20 - 128, 40 - 128, 30 - 128]
    V._simple_filter_seg(px, 60)
    # a = clamp(p1-q1) + 3*(q0-p0) = -20 + 60 = 40; F1=F2=5
    assert [x + 128 for x in px] == [10, 25, 35, 30]
    # normal MB filter, hev false: p3..q3 = 30,30,30,32,36,38,38,38
    px = [x - 128 for x in (30, 30, 30, 32, 36, 38, 38, 38)]
    V._mb_filter(px, 2, 4, 20)
    # w=6; a27=1, a18=1, a9=0
    assert [x + 128 for x in px] == [30, 30, 31, 33, 35, 37, 38, 38]
    # mask fails on a sharp edge: untouched
    px = [x - 128 for x in (30, 30, 30, 30, 200, 200, 200, 200)]
    before = list(px)
    V._mb_filter(px, 2, 4, 20)
    assert px == before


def test_flat_image_exact():
    img = np.full((24, 40, 3), 130, dtype=np.uint8)
    p = V.encode_vp8(img, qi=0)
    assert (V.decode_vp8(p) == img).all()
    # flat content is invariant under the loop filter too
    p2 = V.encode_vp8(img, qi=40, filter_level=30)
    assert (V.decode_vp8(p2) == img).all()


def test_encoder_decoder_sync_exact():
    """The decoder's output EQUALS the encoder's own reconstruction,
    plane for plane, across content / quantizers / modes / partition
    counts — the bitstream is an exact carrier of the quantized
    levels."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(33, 50, 3), dtype=np.uint8)
    grad = np.zeros((40, 56, 3), dtype=np.uint8)
    grad[...] = (np.arange(56)[None, :, None] * 4
                 + np.arange(40)[:, None, None] * 2) % 256
    _sync(img, qi=8)
    _sync(img, qi=60)
    _sync(img, qi=127)
    _sync(grad, qi=20)
    _sync(img, qi=10, force_bpred=True)       # 4x4 sub-mode path
    _sync(grad, qi=40, force_bpred=True)
    _sync(img, qi=20, n_partitions=2)         # multi-partition path
    _sync(grad, qi=20, n_partitions=4)
    _sync(rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8), qi=30)
    _sync(rng.integers(0, 256, size=(5, 9, 3), dtype=np.uint8), qi=15)


def test_quantizer_error_bound():
    """Luma plane error of decode(encode(img)) vs the SOURCE is
    bounded by ~the AC quant step (plus transform rounding)."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(32, 48, 3), dtype=np.uint8)
    y_src, _, _ = V.rgb_to_yuv420(img)
    for qi in (0, 8, 40):
        dy, _, _ = V.decode_vp8_yuv(V.encode_vp8(img, qi=qi))
        step = V.dequant_factors(qi)["y"][1]
        assert np.abs(dy.astype(int) - y_src.astype(int)).max() <= step + 4


def test_loop_filter_changes_bounded():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(48, 48, 3), dtype=np.uint8)
    for ft in (0, 1):                        # normal, simple
        p, (ry, _, _) = V.encode_vp8(img, qi=40, filter_level=25,
                                     filter_type=ft, return_recon=True)
        dy, _, _ = V.decode_vp8_yuv(p)
        d = np.abs(dy.astype(int) - ry.astype(int))
        assert d.max() <= 40                  # smoothing, not corruption


def test_typed_errors_and_fuzz():
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(20, 28, 3), dtype=np.uint8)
    good = V.encode_vp8(img, qi=20)
    # inter frame flag -> declared seam
    bad = bytearray(good)
    bad[0] |= 1
    with pytest.raises(DecodeError, match="inter-coded"):
        V.decode_vp8(bytes(bad))
    # broken start code
    bad = bytearray(good)
    bad[3] = 0
    with pytest.raises(DecodeError):
        V.decode_vp8(bytes(bad))
    # truncation at every eighth byte: typed error or valid decode
    for cut in range(0, len(good), 8):
        try:
            V.decode_vp8(good[:cut])
        except DecodeError:
            pass
    # random bit flips: never a non-DecodeError escape
    for _ in range(40):
        b = bytearray(good)
        for _ in range(3):
            i = rng.integers(0, len(b))
            b[i] ^= 1 << rng.integers(0, 8)
        try:
            V.decode_vp8(bytes(b))
        except DecodeError:
            pass


def test_webp_container_dispatch():
    """RIFF/WEBP with a 'VP8 ' chunk decodes through decode_image and
    webp.decode_webp; VP8X-wrapped lossy stills decode too."""
    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, size=(18, 26, 3), dtype=np.uint8)
    payload = V.encode_webp_lossy(img, qi=12)
    _, (ry, ru, rv) = V.encode_vp8(img, qi=12, return_recon=True)
    want = V.yuv420_to_rgb(ry, ru, rv)
    assert (decode_image(payload) == want).all()
    from rdf_rdfxml_spark.operators.webp import decode_webp
    assert (decode_webp(payload) == want).all()
    # VP8X extended container around the lossy chunk
    h, w = img.shape[:2]
    vp8_chunk = payload[12:]
    vp8x = (b"VP8X" + (10).to_bytes(4, "little") + bytes([0, 0, 0, 0])
            + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little"))
    body = b"WEBP" + vp8x + vp8_chunk
    riff = b"RIFF" + len(body).to_bytes(4, "little") + body
    assert (decode_webp(riff) == want).all()


def test_decode_bound():
    """Decompression bound: an absurd frame size raises before any
    allocation loop."""
    # hand-build a header claiming 16000x16000
    head = bytearray(V.encode_vp8(
        np.zeros((16, 16, 3), dtype=np.uint8), qi=0))
    head[6:8] = (16000).to_bytes(2, "little")
    head[8:10] = (16000).to_bytes(2, "little")
    with pytest.raises(DecodeError, match="too large"):
        V.decode_vp8(bytes(head))
