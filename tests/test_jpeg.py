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
