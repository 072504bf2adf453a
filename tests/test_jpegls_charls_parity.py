# -*- coding: utf-8 -*-
"""Cross-validation of tpukit's clean-room ITU-T T.87 JPEG-LS codec
(native/src/jpegls.cpp) against the system CharLS — the engine the
reference actually runs (via imagecodecs, reference
tools/codecs/jpegls/encode_one_band.py:56, decode_one_band.py:30).

Interchange parity, both directions and fuzzed: CharLS must decode every
tpukit stream sample-exactly, and tpukit must decode every CharLS stream
sample-exactly, across bit depths, NEAR values, shapes, and content
classes (noise, smooth gradients, runs/flat areas that exercise run
mode)."""

import numpy as np
import pytest

from tpukit.codecs.jpegls_codec import jls_decode, jls_encode
from tpukit.native import charls_oracle as co

pytestmark = pytest.mark.skipif(not co.available(),
                                reason="CharLS oracle absent")


def _images(rng):
    """Content classes covering regular + run mode, both bit depths."""
    out = []
    for bits in (8, 12, 16):
        hi = (1 << bits) - 1
        dt = np.uint8 if bits <= 8 else np.uint16
        noise = rng.integers(0, hi + 1, (33, 47)).astype(dt)
        gy, gx = np.mgrid[0:40, 0:56]
        smooth = ((gy * 3 + gx * 2) % (hi + 1)).astype(dt)
        flat = np.full((24, 64), hi // 3, dt)
        flat[10:14, 20:40] = hi // 2          # interrupts runs
        mixed = smooth.copy()
        mixed[::4] = hi // 5                  # run rows between gradients
        for img in (noise, smooth, flat, mixed):
            out.append((img, bits))
    return out


@pytest.mark.parametrize("near", [0, 1, 3, 7])
def test_charls_decodes_tpukit_streams(rng, near):
    for img, bits in _images(rng):
        bs = jls_encode(img.astype(np.uint16), near, bits)
        dec, near_hdr = co.decode(bs)
        assert near_hdr == near
        assert dec.shape == img.shape
        err = np.abs(dec.astype(np.int32) - img.astype(np.int32))
        assert err.max() <= near, (bits, near, err.max())
        if near == 0:
            assert np.array_equal(dec.astype(np.uint16),
                                  img.astype(np.uint16))


@pytest.mark.parametrize("near", [0, 2, 5])
def test_tpukit_decodes_charls_streams(rng, near):
    for img, bits in _images(rng):
        src = img.astype(np.uint8 if bits <= 8 else np.uint16)
        bs = co.encode(src, near=near, bits=bits)
        ref, _ = co.decode(bs)              # CharLS's own reconstruction
        H, W = img.shape
        dec = jls_decode(bs, W, H)
        assert np.array_equal(dec, ref.astype(np.uint16)), (bits, near)


def test_full_stream_byte_equal_charls(rng):
    """tpukit's WHOLE stream is BYTE-IDENTICAL to CharLS's for the same
    (image, NEAR, bits) — same headers (incl. the LSE preset marker CharLS
    emits at precision > 12), predictor, context model, Golomb coding, run
    mode, default presets, bit order. The reference's `bitstream_bytes`
    therefore reproduces exactly (encode_one_band.py:56)."""
    for img, bits in _images(rng):
        for near in (0, 2):
            src = img.astype(np.uint8 if bits <= 8 else np.uint16)
            bs_t = jls_encode(img.astype(np.uint16), near, bits)
            bs_c = co.encode(src, near=near, bits=bits)
            assert bs_t == bs_c, (bits, near)


def test_fuzz_cross_parity(rng):
    """Random shapes/depths/NEARs: whole-stream byte-equality with CharLS
    plus both cross-decode directions in one pass."""
    for _ in range(60):
        bits = int(rng.integers(2, 17))
        hi = (1 << bits) - 1
        H = int(rng.integers(1, 70))
        W = int(rng.integers(1, 70))
        near = min(int(rng.integers(0, 6)), hi // 2)
        img = rng.integers(0, hi + 1, (H, W)).astype(np.uint16)
        if rng.random() < 0.4:              # inject runs
            img[rng.integers(0, H):] = int(rng.integers(0, hi + 1))
        bs_t = jls_encode(img, near, bits)
        dec_c, _ = co.decode(bs_t)
        err = np.abs(dec_c.astype(np.int64) - img.astype(np.int64))
        assert err.max() <= near, (bits, H, W, near)
        src = img.astype(np.uint8 if bits <= 8 else np.uint16)
        bs_c = co.encode(src, near=near, bits=bits)
        assert bs_t == bs_c, (bits, H, W, near)
        ref_c, _ = co.decode(bs_c)
        assert np.array_equal(jls_decode(bs_c, W, H),
                              ref_c.astype(np.uint16)), (bits, H, W, near)


def test_decode_nonstandard_lse_presets(rng):
    """tpukit's decoder honors an LSE segment with NON-default presets
    (T.87 C.2.4.1.1): custom MAXVAL / thresholds / RESET."""
    img = rng.integers(0, 3000, (40, 52)).astype(np.uint16)
    # field 0 == keep default (CharLS debug builds assert on custom MAXVAL)
    for presets in ((0, 40, 120, 500, 32), (0, 0, 0, 0, 32)):
        for near in (0, 3):
            bs = co.encode(img, near=near, bits=12, presets=presets)
            ref, _ = co.decode(bs)
            assert np.array_equal(jls_decode(bs, 52, 40),
                                  ref.astype(np.uint16)), (presets, near)
