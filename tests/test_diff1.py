# -*- coding: utf-8 -*-
"""Unit tests for the spectral first-difference kernels (kernels/diff1.py):
numpy fallbacks vs the device associative-scan versions, and exact
round-trips through the wraparound arithmetic (reference
ccsds121_wrap.py:67-85 semantics)."""

import numpy as np
import pytest

from tpukit.kernels.diff1 import (diff1_forward, diff1_forward_np,
                                  diff1_inverse, diff1_inverse_np)


@pytest.mark.parametrize("dtype", [np.uint16, np.int16, np.uint8])
def test_np_roundtrip_exact(rng, dtype):
    info = np.iinfo(dtype)
    x = rng.integers(info.min, info.max + 1, (7, 9, 11)).astype(dtype)
    r = diff1_forward_np(x)
    assert r.dtype == x.dtype
    y = diff1_inverse_np(r)
    assert y.dtype == x.dtype
    np.testing.assert_array_equal(y, x)


@pytest.mark.parametrize("dtype", [np.uint16, np.int16])
def test_np_matches_device(rng, dtype):
    info = np.iinfo(dtype)
    x = rng.integers(info.min, info.max + 1, (6, 8, 5)).astype(dtype)
    np.testing.assert_array_equal(diff1_forward_np(x),
                                  np.asarray(diff1_forward(x)))
    r = diff1_forward_np(x)
    np.testing.assert_array_equal(diff1_inverse_np(r),
                                  np.asarray(diff1_inverse(r)))


def test_forward_first_band_is_identity(rng):
    x = rng.integers(0, 1 << 16, (4, 3, 3)).astype(np.uint16)
    r = diff1_forward_np(x)
    np.testing.assert_array_equal(r[0], x[0])
    # the modular difference wraps exactly like the reference's
    # int32-subtract-then-mod path
    expect = ((x[1:].astype(np.int64) - x[:-1].astype(np.int64))
              % (1 << 16)).astype(np.uint16)
    np.testing.assert_array_equal(r[1:], expect)
