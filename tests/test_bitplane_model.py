# -*- coding: utf-8 -*-
"""Device bit-plane size model: byte-exact agreement with the native coder."""

import numpy as np
import pytest

from tpukit.codecs import wavelet_common as wc
from tpukit.codecs.bitplane_model import bpc_size_bytes_host


def _check(arr: np.ndarray):
    expect = len(wc.bpc_encode(arr))
    got = int(bpc_size_bytes_host(arr.astype(np.int32)))
    assert got == expect, f"model {got} != coder {expect} (n={arr.size})"


def test_model_matches_coder_fuzz(rng):
    for n in (1, 5, 16, 17, 160, 1000, 4096):
        for scale in (1, 7, 300, 30000):
            arr = (rng.integers(-scale, scale + 1, n)).astype(np.int32)
            _check(arr)


def test_model_edge_cases(rng):
    _check(np.zeros(100, np.int32))                      # header only
    _check(np.array([0] * 99 + [1], np.int32))           # one coef, last group
    _check(np.full(64, -(2**30), np.int32))              # deep planes
    sparse = np.zeros(5000, np.int32)
    sparse[rng.integers(0, 5000, 20)] = rng.integers(-9, 9, 20)
    _check(sparse)


def test_model_batched_matches_per_band(rng):
    bands = rng.integers(-2000, 2000, (6, 777)).astype(np.int32)
    got = bpc_size_bytes_host(bands)
    for b in range(6):
        assert int(got[b]) == len(wc.bpc_encode(bands[b]))


def test_model_on_real_dwt_coefficients(rng):
    """End-to-end: the model prices an actual quantized 9/7 DWT ladder."""
    import jax.numpy as jnp
    from tpukit.kernels import dwt as dwtk

    cube = rng.integers(0, 4096, (2, 64, 64)).astype(np.int32)
    coefs = np.asarray(dwtk.dwt2(jnp.asarray(cube.astype(np.float32)),
                                 "97", 3))
    order = wc.scan_order(64, 64, 3)
    for step in (1.0, 8.0, 64.0):
        qc = np.trunc(coefs / step).astype(np.int32).reshape(2, -1)[:, order]
        got = bpc_size_bytes_host(qc)
        for b in range(2):
            assert int(got[b]) == len(wc.bpc_encode(qc[b]))


# ---------------------------------------------------------------------------
# truncated-decode model: exact agreement with the native encode->decode
# round trip at arbitrary byte budgets (the CCSDS-122 `-r {bpp}` surface)
# ---------------------------------------------------------------------------

def _check_trunc(c: np.ndarray, budget: int, f):
    import jax.numpy as jnp
    bs = wc.bpc_encode(c, budget)
    want = wc.bpc_decode(bs, c.size)
    got, nb = f(jnp.asarray(c), jnp.int32(budget))
    assert int(nb) == len(bs), (c.size, budget, int(nb), len(bs))
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.fixture(scope="module")
def trunc_fn():
    import jax
    from tpukit.codecs.bitplane_model import bpc_truncated_decode
    return jax.jit(bpc_truncated_decode)


def test_truncated_decode_fuzz(rng, trunc_fn):
    for t in range(24):
        n = int(rng.choice([16, 48, 256, 1000, 4096]))
        kind = t % 4
        if kind == 0:
            c = rng.integers(-50, 50, n)
        elif kind == 1:
            c = (rng.normal(0, 1000, n) * (rng.random(n) < 0.2)).astype(int)
        elif kind == 2:
            c = np.zeros(n, int)
            k = max(1, n // 50)
            c[rng.integers(0, n, k)] = rng.integers(-2**20, 2**20, k)
        else:
            c = rng.integers(-2**28, 2**28, n)
        c = c.astype(np.int32)
        full = len(wc.bpc_encode(c, 0))
        for b in {0, 1, 2, 3, full // 3 + 2, full // 2 + 2, full - 1,
                  full, full + 10, int(rng.integers(2, max(3, full)))}:
            _check_trunc(c, b, trunc_fn)


def test_truncated_decode_edges(trunc_fn):
    _check_trunc(np.zeros(128, np.int32), 0, trunc_fn)     # header only
    _check_trunc(np.zeros(128, np.int32), 5, trunc_fn)
    one = np.zeros(100, np.int32)
    one[-1] = -7
    for b in (0, 2, 3, 4, 20):
        _check_trunc(one, b, trunc_fn)
    deep = np.full(64, 2**30, np.int32)                    # 31 planes
    for b in (0, 2, 17, 64, 200):
        _check_trunc(deep, b, trunc_fn)


def test_truncated_decode_on_dwt_coefficients(rng, trunc_fn):
    """Budget cuts across real 9/7M coefficients in embedded scan order."""
    from tpukit.kernels import dwt as dwtk
    import jax.numpy as jnp
    img = (rng.integers(0, 3000, (48, 48)) +
           np.cumsum(rng.normal(0, 10, (48, 48)), 1)).astype(np.int32)
    coefs = np.asarray(dwtk.dwt2(jnp.asarray(img[None]), "97m", 3))[0]
    order = wc.scan_order(48, 48, 3)
    c = coefs.ravel()[order].astype(np.int32)
    full = len(wc.bpc_encode(c, 0))
    for b in (0, full // 8, full // 4, full // 2, 3 * full // 4, full - 3):
        _check_trunc(c, max(b, 2), trunc_fn)
