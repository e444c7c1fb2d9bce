"""Baseline JPEG codec (operators/jpeg.py): spec-level unit checks with
INDEPENDENT reference math (the decoder must not be validated only against
its own encoder), round-trips across sampling modes, and the mapInPandas
decode path (SURVEY §2.5 multimodal columns)."""

from __future__ import annotations

import numpy as np
import pytest

from bullet_spark_spark.operators import multimodal as mm
from bullet_spark_spark.operators.jpeg import (
    _A,
    _canonical_codes,
    _DC_LUM,
    _ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)


def _rt(img, quality=95, subsampling=(1, 1)):
    h, w, c, px = decode_jpeg(encode_jpeg(img, quality, subsampling=subsampling))
    out = np.frombuffer(px, dtype=np.uint8).reshape(h, w, c)
    return out


def test_idct_basis_matches_spec_formula():
    """The matrix basis must equal T.81 A.3.3 computed longhand: the
    decoder's IDCT is checked against a direct double-sum, not against the
    encoder's FDCT (which would share a basis bug)."""
    rng = np.random.default_rng(5)
    F = rng.normal(0, 50, (8, 8))
    spatial = _A.T @ F @ _A
    ref = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu
                        * cv
                        * F[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            ref[x, y] = s / 4.0
    assert np.allclose(spatial, ref, atol=1e-9)


def test_zigzag_is_the_standard_order():
    """Spot-check the zigzag table against the T.81 figure 5 walk."""
    assert list(_ZIGZAG[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert _ZIGZAG[63] == 63
    assert sorted(_ZIGZAG) == list(range(64))


def test_canonical_huffman_codes():
    """Canonical construction (Annex C): codes are assigned in huffval
    order, incrementing within a length, doubling across lengths. The DC
    luminance table's first codes are pinned by the spec."""
    codes = _canonical_codes(*_DC_LUM)
    assert codes[0] == (0b00, 2)
    assert codes[1] == (0b010, 3)
    assert codes[2] == (0b011, 3)
    assert codes[11] == (0b111111110, 9)


def test_roundtrip_flat_and_gradient():
    flat = np.full((16, 24, 3), 130, dtype=np.uint8)
    assert np.abs(_rt(flat).astype(int) - 130).max() <= 1

    yy, xx = np.mgrid[0:32, 0:48]
    grad = np.stack(
        [(yy * 4) % 250, (xx * 3) % 250, ((yy + xx) * 2) % 250], axis=-1
    ).astype(np.uint8)
    err = np.abs(_rt(grad).astype(int) - grad.astype(int))
    assert err.max() <= 4 and err.mean() < 1.5


def test_roundtrip_grayscale():
    yy = np.mgrid[0:24, 0:40][0]
    g = ((yy * 5) % 250).astype(np.uint8)
    out = _rt(g)
    assert out.shape == (24, 40, 1)
    assert np.abs(out[..., 0].astype(int) - g.astype(int)).max() <= 2


@pytest.mark.parametrize("ss", [(2, 2), (2, 1), (1, 2)])
def test_roundtrip_subsampled(ss):
    """4:2:0 / 4:2:2 / 4:4:0: MCU interleave + chroma upsampling in the
    decoder, including partial MCUs from odd dimensions."""
    yy, xx = np.mgrid[0:37, 0:51]
    img = np.stack(
        [(yy * 4) % 250, (xx * 3) % 250, ((yy + xx) * 2) % 250], axis=-1
    ).astype(np.uint8)
    out = _rt(img, quality=95, subsampling=ss)
    err = np.abs(out.astype(int) - img.astype(int))
    assert out.shape == img.shape
    # chroma is block-averaged then nearest-upsampled: small bounded error
    assert err.max() <= 12 and err.mean() < 2.5


def test_noise_bounded_at_high_quality():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    err = np.abs(_rt(img, 95).astype(int) - img.astype(int))
    assert err.max() <= 32  # worst-case content, quantization-bounded


def test_rejects_progressive_and_truncated():
    with pytest.raises(ValueError, match="baseline"):
        # minimal stream with a progressive SOF2 marker
        decode_jpeg(
            b"\xff\xd8" + b"\xff\xc2" + b"\x00\x0b" + bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0])
        )
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0fakejpeg")
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")


def test_decode_image_dispatches_jpeg_through_mapinpandas(spark):
    """JPEG rides the same decode stage as PNG/PPM: binary column in,
    IMAGE_SCHEMA out, composing with resize/stats."""
    yy, xx = np.mgrid[0:16, 0:16]
    imgs = {
        1: np.stack([(yy * 9) % 250, (xx * 9) % 250, ((yy + xx) * 5) % 250], axis=-1).astype(np.uint8),
        2: np.full((8, 8, 3), 200, dtype=np.uint8),
    }
    rows = [
        (mid, "image/jpeg", bytearray(encode_jpeg(arr, 95)), {})
        for mid, arr in imgs.items()
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in mm.decode_image(media).collect()}
    for mid, arr in imgs.items():
        r = got[mid]
        assert (r["height"], r["width"], r["channels"]) == arr.shape
        out = np.frombuffer(bytes(r["pixels"]), dtype=np.uint8).reshape(arr.shape)
        assert np.abs(out.astype(int) - arr.astype(int)).max() <= 4

    stats = {r["media_id"]: r for r in mm.image_stats(mm.decode_image(media)).collect()}
    means = imgs[2].reshape(-1, 3).mean(axis=0)
    assert abs(stats[2]["mean_r"] - means[0]) < 2.0
