# -*- coding: utf-8 -*-
"""Tier-1 encoder <-> decoder exactness.

The encoder (native/src/j2k_t1enc.cpp) must round-trip bit-exactly
through the tier-1 decoder that already passes sample-exact parity vs
OpenJPEG on real codestreams (tests/test_jp2.py), for the FULL stream
and for EVERY per-pass truncation point, and its per-pass distortion
bookkeeping must equal the decoder's actual midpoint-reconstruction
squared error — that is what makes PCRD-opt truncation trustworthy.
"""

import numpy as np
import pytest

from tpukit.io.j2c_enc import t1_encode_block
from tpukit.io.jp2 import t1_decode_block


def _cases(seed, n):
    rng = np.random.default_rng(seed)
    for _ in range(n):
        w = int(rng.integers(1, 65))
        h = int(rng.integers(1, 65))
        orient = int(rng.integers(0, 4))
        style = 32 if rng.random() < 0.3 else 0
        mode = int(rng.integers(0, 4))
        if mode == 0:
            lo = 2 ** int(rng.integers(1, 16))
            coefs = rng.integers(-lo, lo, (h, w))
        elif mode == 1:
            coefs = np.zeros((h, w), np.int64)
            nz = rng.random((h, w)) < 0.05
            coefs[nz] = rng.integers(-5000, 5000, int(nz.sum()))
        elif mode == 2:
            coefs = rng.laplace(0, 30, (h, w)).astype(np.int64)
        else:
            coefs = np.zeros((h, w), np.int64)
        yield coefs, orient, style


def test_roundtrip_full_and_truncated():
    for coefs, orient, style in _cases(0, 120):
        h, w = coefs.shape
        b = t1_encode_block(coefs, orient, style)
        if b.numbps == 0:
            assert not np.any(coefs)
            continue
        dec = t1_decode_block(b.stream, b.npasses, b.numbps, orient, style,
                              w, h)
        np.testing.assert_array_equal(dec, coefs.astype(np.int32))
        for p in range(b.npasses):
            t = b.truncate(p)
            assert len(t) == b.pass_len[p]
            d_trunc = t1_decode_block(t, p + 1, b.numbps, orient, style, w, h)
            d_full = t1_decode_block(b.stream, p + 1, b.numbps, orient,
                                     style, w, h)
            np.testing.assert_array_equal(d_trunc, d_full)


def test_pass_distortion_matches_decode():
    rng = np.random.default_rng(7)
    for _ in range(40):
        w = int(rng.integers(1, 65))
        h = int(rng.integers(1, 65))
        orient = int(rng.integers(0, 4))
        coefs = rng.laplace(0, 200, (h, w)).astype(np.int64)
        b = t1_encode_block(coefs, orient)
        if b.numbps == 0:
            continue
        err0 = float((coefs.astype(np.float64) ** 2).sum())
        for pi in range(b.npasses):
            if pi == 0:
                plane, kind = b.numbps - 1, 2
            else:
                q, r = divmod(pi - 1, 3)
                plane, kind = b.numbps - 2 - q, r
            if kind != 2:  # cleanup boundaries: all sig coefs known to plane
                continue
            dec = t1_decode_block(b.stream, pi + 1, b.numbps, orient, 0,
                                  w, h).astype(np.float64)
            half = 0.5 * (1 << plane)
            recon = np.where(dec != 0, np.abs(dec) + half, 0.0)
            se = float(((np.abs(coefs) - recon) ** 2)[dec != 0].sum()
                       + (coefs.astype(np.float64) ** 2)[dec == 0].sum())
            assert abs(se - (err0 - b.pass_dist[pi])) <= 1e-6 * max(se, 1.0)


def test_pass_schedule_and_monotonicity():
    rng = np.random.default_rng(11)
    coefs = rng.laplace(0, 500, (32, 32)).astype(np.int64)
    b = t1_encode_block(coefs, 3)
    assert b.npasses == 1 + 3 * (b.numbps - 1)
    assert np.all(np.diff(b.pass_len) >= 0)
    assert np.all(np.diff(b.pass_dist) >= 0)
    # last truncation point equals the full stream
    assert b.truncate(b.npasses - 1) == b.stream


def test_degenerate_blocks():
    z = t1_encode_block(np.zeros((4, 7), np.int32), 0)
    assert z.numbps == 0 and z.npasses == 0 and z.stream == b""
    one = np.zeros((1, 1), np.int32)
    one[0, 0] = -3
    b = t1_encode_block(one, 2)
    dec = t1_decode_block(b.stream, b.npasses, b.numbps, 2, 0, 1, 1)
    assert dec[0, 0] == -3
