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
