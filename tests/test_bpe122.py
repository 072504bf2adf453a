# -*- coding: utf-8 -*-
"""CCSDS 122.0-B segment-structured BPE (native/src/bpe122.cpp +
codecs/bpe122.py): round-trip, truncation, segmentation, and header
tests. The reference's 122 path is a user-supplied external binary
(reference tools/codecs/ccsds122/ccsds122_wrap.py:110-133); tpukit's
coder is validated by its own independent decoder plus the device size
model (test_bpe122_model.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpukit.codecs import bpe122
from tpukit.kernels import dwt as dwtk


def _dwt_plane(img):
    return np.asarray(dwtk.dwt2(jnp.asarray(img.astype(np.int32)),
                                "97m", 3))


def _smooth(rng, H, W, amp=2000):
    gy, gx = np.mgrid[0:H, 0:W]
    return (amp * np.sin(gy / 9.0) * np.cos(gx / 13.0) + 2 * amp +
            rng.normal(0, amp / 30.0, (H, W))).astype(np.int32)


def test_block_indices_are_a_permutation():
    g, s = bpe122.block_indices(64, 48)
    assert g.shape == (48, 64)
    flat = g.reshape(-1)
    assert np.array_equal(np.sort(flat), np.arange(64 * 48))
    # scatter inverts gather
    x = np.arange(64 * 48, dtype=np.int32)
    assert np.array_equal(x[g.reshape(-1)][s], x)


def test_block_family_structure():
    """DC comes from LL3; each family's parent from its level-3 subband."""
    Hp = Wp = 32
    g, _ = bpe122.block_indices(Hp, Wp)
    r, c = 2, 3                                  # block (r, c)
    blk = g[r * (Wp // 8) + c]
    assert blk[0] == r * Wp + c                  # DC: LL3[r, c]
    assert blk[1] == r * Wp + (Wp // 8 + c)      # HL3 parent
    assert blk[1 + 21] == (Hp // 8 + r) * Wp + c # LH3 parent
    # first HL child: HL2[2r, Wp//4 + 2c]
    assert blk[2] == (2 * r) * Wp + (Wp // 4 + 2 * c)
    # first HL grandchild: HL1[4r, Wp//2 + 4c]
    assert blk[6] == (4 * r) * Wp + (Wp // 2 + 4 * c)


def test_lossless_roundtrip_random(rng):
    for _ in range(8):
        Hp = int(rng.choice([8, 16, 24, 40, 64]))
        Wp = int(rng.choice([8, 16, 32, 56]))
        mag = int(rng.choice([1, 3, 300, 40000]))
        c = rng.integers(-mag, mag + 1, (Hp, Wp)).astype(np.int32)
        bs = bpe122.encode_plane(c)
        assert np.array_equal(bpe122.decode_plane(bs, Hp, Wp), c)


def test_lossless_roundtrip_dwt(rng):
    img = _smooth(rng, 128, 64)
    coefs = _dwt_plane(img)
    bs = bpe122.encode_plane(coefs)
    rec = bpe122.decode_plane(bs, 128, 64)
    assert np.array_equal(rec, coefs)
    # and through the inverse DWT the image itself round-trips
    out = np.asarray(dwtk.idwt2(jnp.asarray(rec), "97m", 3))
    assert np.array_equal(out, img)


def test_all_zero_and_dc_only_planes():
    z = np.zeros((16, 16), np.int32)
    bs = bpe122.encode_plane(z)
    assert np.array_equal(bpe122.decode_plane(bs, 16, 16), z)
    d = np.zeros((16, 16), np.int32)
    d[:2, :2] = [[100, -3], [7, 2]]              # LL3-only content
    bs = bpe122.encode_plane(d)
    assert np.array_equal(bpe122.decode_plane(bs, 16, 16), d)


def test_truncation_exact_bytes_and_monotone_quality(rng):
    img = _smooth(rng, 128, 128)
    coefs = _dwt_plane(img)
    full = len(bpe122.encode_plane(coefs))
    prev_psnr = -1.0
    for budget in (64, 300, 1200, 5000, 15000, 1 << 20):
        bs = bpe122.encode_plane(coefs, seg_byte_limit=budget)
        assert len(bs) == min(budget, full)
        rec = bpe122.decode_plane(bs, 128, 128)
        out = np.asarray(dwtk.idwt2(jnp.asarray(rec), "97m", 3))
        mse = float(np.mean((out.astype(np.float64) - img) ** 2))
        psnr = 10 * np.log10(65535.0 ** 2 / max(mse, 1e-12))
        assert psnr >= prev_psnr - 0.6, (budget, psnr, prev_psnr)
        prev_psnr = psnr
    assert prev_psnr > 200                       # unbounded => exact


def test_multisegment_lossless_and_truncated(rng):
    img = _smooth(rng, 64, 128)
    coefs = _dwt_plane(img)
    bs = bpe122.encode_plane(coefs, seg_size=17)  # ragged final segment
    assert np.array_equal(bpe122.decode_plane(bs, 64, 128), coefs)
    # per-segment byte limits: decode succeeds, energy bounded
    bs = bpe122.encode_plane(coefs, seg_byte_limit=80, seg_size=17)
    rec = bpe122.decode_plane(bs, 64, 128)
    out = np.asarray(dwtk.idwt2(jnp.asarray(rec), "97m", 3))
    assert np.abs(out - img).mean() < np.abs(img).mean()


def test_segment_header_fields(rng):
    c = rng.integers(-500, 500, (32, 32)).astype(np.int32)
    bs = bpe122.encode_plane(c, img_width=29, pad_rows=3)
    b = np.frombuffer(bs, np.uint8)
    # Part 1A: StartImgFlag=1, EndImgFlag=1 (single segment), count=0
    assert (b[0] >> 7) == 1 and ((b[0] >> 6) & 1) == 1
    assert ((b[0] & 0x3F) << 2 | (b[1] >> 6)) == 0        # SegmentCount
    # last byte of Part 1A carries the three part flags (all set)
    assert (b[2] & 0x07) == 0x07
    # Part 3 S field = number of blocks = 16 (starts at byte 9 after
    # Part1A(3) + Part1B(1) + Part2(5))
    S = (int(b[9]) << 12) | (int(b[10]) << 4) | (int(b[11]) >> 4)
    assert S == 16


def test_fuzz_roundtrip_and_truncation_safety(rng):
    for _ in range(40):
        Hp = int(rng.choice([8, 16, 24, 48]))
        Wp = int(rng.choice([8, 16, 40]))
        mag = int(rng.choice([1, 2, 60, 3000, 200000]))
        c = rng.integers(-mag, mag + 1, (Hp, Wp)).astype(np.int32)
        if rng.random() < 0.3:                    # sparse planes
            c[rng.random((Hp, Wp)) < 0.9] = 0
        if rng.random() < 0.2:
            c[:] = 0
        bs = bpe122.encode_plane(c)
        assert np.array_equal(bpe122.decode_plane(bs, Hp, Wp), c)
        budget = int(rng.integers(25, max(len(bs), 26) + 4))
        bst = bpe122.encode_plane(c, seg_byte_limit=budget)
        assert len(bst) <= max(budget, len(bs))
        bpe122.decode_plane(bst, Hp, Wp)          # must never crash


def test_decoder_rejects_garbage():
    with pytest.raises(RuntimeError):
        bpe122.bpe_decode_blocks(b"\x00" * 4, 4)
