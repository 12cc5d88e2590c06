"""Baseline JPEG codec (operators/jpeg.py): roundtrip accuracy within
quantization bounds, marker structure, declared-envelope rejections.
No Spark session needed — pure numpy."""

from __future__ import annotations

import numpy as np
import pytest

from rdf_rdfxml_spark.operators.jpeg import decode_jpeg, encode_jpeg
from rdf_rdfxml_spark.operators.multimodal import DecodeError, decode_image


def test_constant_image_exact():
    img = np.full((10, 14, 3), 77, dtype=np.uint8)
    assert (decode_jpeg(encode_jpeg(img)) == img).all()


def test_gradient_near_exact_high_quality():
    x = np.linspace(0, 255, 32)
    img = np.stack([np.tile(x, (24, 1)), np.tile(x[::-1], (24, 1)),
                    np.full((24, 32), 128.0)], axis=-1).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_noise_bounded_error_q100():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=100))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 3


def test_quality_monotone():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    errs = []
    for q in (20, 60, 95):
        dec = decode_jpeg(encode_jpeg(img, quality=q))
        errs.append(float(np.abs(dec.astype(int) - img.astype(int)).mean()))
    assert errs[0] > errs[1] > errs[2]  # lower quality → more error
    # lower quality also compresses smaller
    assert len(encode_jpeg(img, quality=20)) < len(encode_jpeg(img,
                                                               quality=95))


def test_non_multiple_of_8_dimensions():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(13, 11, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=100))
    assert dec.shape == (13, 11, 3)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 3


def test_marker_structure_and_dispatch():
    img = np.full((8, 8, 3), 42, dtype=np.uint8)
    payload = encode_jpeg(img)
    assert payload[:3] == b"\xff\xd8\xff"        # SOI + first marker
    assert payload[-2:] == b"\xff\xd9"           # EOI
    assert b"JFIF\x00" in payload
    assert b"\xff\xc0" in payload                # SOF0 (baseline)
    assert b"\xff\xc4" in payload                # DHT
    assert b"\xff\xdb" in payload                # DQT
    assert (decode_image(payload) == img).all()  # multimodal dispatch


def test_declared_envelope_rejections():
    img = np.full((8, 8, 3), 9, dtype=np.uint8)
    good = encode_jpeg(img)
    pytest.raises(DecodeError, decode_jpeg, b"not a jpeg")
    pytest.raises(DecodeError, decode_jpeg, good[:40])     # truncated
    # progressive (SOF2) is out of the declared envelope
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    pytest.raises(DecodeError, decode_jpeg, prog)
    # chroma subsampling (sampling factor 0x22) rejected loudly
    sof_at = good.find(b"\xff\xc0")
    body = bytearray(good)
    body[sof_at + 11] = 0x22  # Y component sampling byte
    pytest.raises(DecodeError, decode_jpeg, bytes(body))
    # missing EOI
    pytest.raises(DecodeError, decode_jpeg, good[:-2])


def test_determinism():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(12, 12, 3), dtype=np.uint8)
    assert encode_jpeg(img) == encode_jpeg(img)
    assert (decode_jpeg(encode_jpeg(img))
            == decode_jpeg(encode_jpeg(img))).all()


def test_progressive_matches_baseline_exactly():
    """Entropy coding is lossless over the same quantized coefficients,
    so a progressive (SOF2: DC/AC successive approximation + spectral
    selection) and a baseline encode of one image MUST decode to
    byte-identical pixels — a cross-check that keeps a matched
    encoder/decoder bug in the progressive path from hiding."""
    import numpy as np

    from rdf_rdfxml_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg, encode_jpeg_progressive,
    )
    rng = np.random.default_rng(11)
    for shape in [(8, 8), (9, 13), (17, 23), (7, 3), (1, 1), (32, 24)]:
        img = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
        for sampling in ("444", "422", "420"):
            base = decode_jpeg(encode_jpeg(img, quality=85,
                                           sampling=sampling))
            prog = decode_jpeg(encode_jpeg_progressive(
                img, quality=85, sampling=sampling))
            assert base.shape == img.shape
            assert (prog == base).all(), (shape, sampling)


def test_subsampled_smooth_image_near_exact():
    """4:2:0 / 4:2:2 on a smooth gradient must be nearly lossless (box
    down + replication up round-trips smooth chroma); errors in the
    sampling-factor geometry would show up as gross block artifacts."""
    import numpy as np

    from rdf_rdfxml_spark.operators.jpeg import decode_jpeg, encode_jpeg
    y, x = np.mgrid[0:32, 0:48]
    img = (np.stack([(x * 3) % 256, (y * 4) % 256, ((x + y) * 2) % 256],
                    axis=-1) // 4 + 100).astype(np.uint8)
    for s in ("422", "420"):
        dec = decode_jpeg(encode_jpeg(img, quality=95, sampling=s))
        err = np.abs(dec.astype(int) - img.astype(int)).mean()
        assert err < 1.5, (s, err)


def test_ac_refine_property_roundtrip():
    """Coefficient-level property test of the successive-approximation
    entropy paths: AC-first (Al=1) then AC-refine (Ah=1, Al=0) over
    random sparse blocks must reconstruct every coefficient exactly
    (EOB runs, ZRL windows, buffered correction bits)."""
    import numpy as np

    import rdf_rdfxml_spark.operators.jpeg as J

    def run(coefs):
        nb = coefs.shape[1]
        comp = {"coef": coefs, "nbw": nb, "nbh": 1,
                "hi": 1, "vi": 1, "tq": 0}
        info = {"w": nb * 8, "h": 8, "hmax": 1, "vmax": 1,
                "comps": [{"cid": 1, "hi": 1, "vi": 1, "tq": 0}]}
        got = np.zeros_like(coefs)
        for ss, se, ah, al, emit in [
            (1, 63, 0, 1,
             lambda o: J._emit_ac_first(o, comp, ("ac", 0), 1, 63, 1)),
            (1, 63, 1, 0,
             lambda o: J._emit_ac_refine(o, comp, ("ac", 0), 1, 63, 0)),
        ]:
            ops = J._OpStream()
            emit(ops)
            tables = ops.tables()
            bw = J._BitWriter()
            ops.emit(bw, tables)
            bw.flush()
            dht = {}
            for _, (bits, vals, _) in tables.items():
                dht[(1, 0)] = J._build_decode_table(bits, vals)
            scan = {"specs": [(1, 0, 0)], "ss": ss, "se": se,
                    "ah": ah, "al": al, "huff": dht,
                    "data": bytes(bw.out)}
            J._decode_scan(scan, info, [got], baseline=False)
        truth = np.array([[[0] + [J._pt_ac(v, 0) for v in coefs[0, b, 1:]]
                           for b in range(nb)]])
        assert (got == truth).all()

    rng = np.random.default_rng(2)
    for _ in range(120):
        nb = int(rng.integers(1, 6))
        coefs = np.zeros((1, nb, 64), dtype=np.int64)
        density = rng.choice([0.03, 0.2, 0.6])
        mask = rng.random((1, nb, 64)) < density
        vals = rng.integers(-40, 41, size=(1, nb, 64))
        coefs[mask] = vals[mask]
        run(coefs)


def test_progressive_typed_error_fuzz():
    """Hostile progressive streams must raise DecodeError, never escape
    the typed-error contract: truncated scans, chopped DHT, flipped
    bytes anywhere in the payload."""
    import numpy as np
    import pytest

    from rdf_rdfxml_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg_progressive,
    )
    from rdf_rdfxml_spark.operators.multimodal import DecodeError
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(9, 13, 3), dtype=np.uint8)
    payload = encode_jpeg_progressive(img)
    for cut in (10, len(payload) // 3, len(payload) - 3):
        with pytest.raises(DecodeError):
            decode_jpeg(payload[:cut])
    hits = 0
    for _ in range(200):
        b = bytearray(payload)
        j = int(rng.integers(2, len(b) - 2))
        b[j] ^= 1 << int(rng.integers(0, 8))
        try:
            decode_jpeg(bytes(b))
        except DecodeError:
            hits += 1
        except Exception as e:  # noqa: BLE001
            raise AssertionError(
                f"untyped escape at byte {j}: {type(e).__name__}: {e}")
    assert hits > 0  # most flips break the stream; all must stay typed


def test_mjpeg_splits_progressive_frames():
    """The marker-walking MJPEG splitter must handle multi-SOS
    (progressive) frames — a find(FFD9) scanner or single-SOS walker
    would mis-split them."""
    import numpy as np

    from rdf_rdfxml_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg, encode_jpeg_progressive,
    )
    from rdf_rdfxml_spark.operators.multimodal import split_mjpeg_frames
    rng = np.random.default_rng(4)
    imgs = [rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
            for _ in range(4)]
    payload = b"".join(
        (encode_jpeg_progressive(im) if i % 2 else encode_jpeg(im))
        for i, im in enumerate(imgs))
    fs = split_mjpeg_frames(payload)
    assert len(fs) == 4
    for f, im in zip(fs, imgs):
        dec = decode_jpeg(f)
        assert dec.shape == (6, 8, 3)
        assert np.abs(dec.astype(int) - im.astype(int)).mean() < 60


def test_restart_markers_roundtrip():
    """DRI restart intervals in BOTH modes: encoded streams carry real
    RSTn markers (sequence-cycled, byte-aligned), decode resets DC/EOB
    state correctly, and restart-interval encodes decode to EXACTLY the
    same pixels as marker-free encodes (entropy framing must not change
    the coefficients)."""
    import numpy as np

    from rdf_rdfxml_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg, encode_jpeg_progressive,
    )
    from rdf_rdfxml_spark.operators.multimodal import DecodeError
    rng = np.random.default_rng(13)
    for shape, sampling in [((17, 23), "444"), ((16, 16), "420"),
                            ((9, 13), "422")]:
        img = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
        plain = decode_jpeg(encode_jpeg(img, quality=85,
                                        sampling=sampling))
        for ri in (1, 2, 5):
            b = encode_jpeg(img, quality=85, sampling=sampling,
                            restart_interval=ri)
            p = encode_jpeg_progressive(img, quality=85,
                                        sampling=sampling,
                                        restart_interval=ri)
            assert b"\xff\xdd" in b  # DRI segment present
            hmax = 2 if sampling != "444" else 1
            vmax = 2 if sampling == "420" else 1
            n_mcus = -(-shape[1] // (8 * hmax)) * -(-shape[0] // (8 * vmax))
            if n_mcus > ri:  # restarts only exist between MCU groups
                assert b"\xff\xd0" in b, (shape, sampling, ri)
            assert (decode_jpeg(b) == plain).all(), (shape, sampling, ri)
            assert (decode_jpeg(p) == plain).all(), (shape, sampling, ri)

    # out-of-sequence restart marker must be a typed error
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    b = bytearray(encode_jpeg(img, restart_interval=1))
    i = b.find(b"\xff\xd0")
    assert i > 0
    b[i + 1] = 0xD3  # RST0 → RST3
    import pytest
    with pytest.raises(DecodeError, match="out of sequence"):
        decode_jpeg(bytes(b))


def test_restart_fuzz_stays_typed():
    """Bit flips over a restart-interval progressive stream stay inside
    the DecodeError contract (markers add new parser states)."""
    import numpy as np
    import pytest  # noqa: F401

    from rdf_rdfxml_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg_progressive,
    )
    from rdf_rdfxml_spark.operators.multimodal import DecodeError
    rng = np.random.default_rng(14)
    img = rng.integers(0, 256, size=(10, 14, 3), dtype=np.uint8)
    payload = encode_jpeg_progressive(img, restart_interval=2)
    for _ in range(300):
        b = bytearray(payload)
        j = int(rng.integers(2, len(b) - 2))
        b[j] ^= 1 << int(rng.integers(0, 8))
        try:
            decode_jpeg(bytes(b))
        except DecodeError:
            pass
        except Exception as e:  # noqa: BLE001
            raise AssertionError(
                f"untyped escape at byte {j}: {type(e).__name__}: {e}")
