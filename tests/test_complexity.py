# -*- coding: utf-8 -*-
"""Tile complexity metrics vs the documented reference semantics."""

import numpy as np
import pytest

from tpukit.analysis.complexity import compute_all_arrays


def test_hc_vs_lc_ordering(rng):
    """High-frequency tile must score higher on every complexity axis."""
    gy, gx = np.mgrid[0:64, 0:64]
    lc = (1000.0 + 3.0 * gy + 2.0 * gx)[None] * np.ones((3, 1, 1))  # smooth ramp
    hc = rng.integers(0, 4096, (3, 64, 64)).astype(float)
    mlc = compute_all_arrays(lc)
    mhc = compute_all_arrays(hc)
    assert mhc["grad_mean"] > mlc["grad_mean"]
    assert mhc["hf_ratio"] > mlc["hf_ratio"]
    assert mhc["delentropy_bits"] > mlc["delentropy_bits"]


def test_flat_tile_degenerate():
    flat = np.full((2, 32, 32), 500.0)
    m = compute_all_arrays(flat)
    assert m["grad_mean"] == 0.0
    assert m["hf_ratio"] == 0.0  # zero power -> zeroed metrics
    assert m["alpha"] == 0.0


def test_alpha_negative_slope(rng):
    """1/f-like image -> positive alpha (power decays with frequency)."""
    H = W = 64
    fy = np.fft.fftfreq(H)[:, None]
    fx = np.fft.fftfreq(W)[None, :]
    r = np.sqrt(fy * fy + fx * fx)
    r[0, 0] = 1.0
    spec = (rng.normal(size=(H, W)) + 1j * rng.normal(size=(H, W))) / r
    img = np.real(np.fft.ifft2(spec))
    img = (img - img.min()) / (img.max() - img.min()) * 4000
    m = compute_all_arrays(img[None].astype(np.float32))
    assert m["alpha"] > 0.5


def test_gradient_matches_numpy(rng):
    from tests.reference_impl import sobel_mag  # noqa: F401 (import check)
    arr = rng.integers(0, 100, (2, 16, 16)).astype(np.float32)
    m = compute_all_arrays(arr)
    # independent numpy computation of grad_mean
    def fd(img):
        gx = np.empty_like(img); gy = np.empty_like(img)
        gx[:, 1:-1] = (img[:, 2:] - img[:, :-2]) * 0.5
        gx[:, 0] = img[:, 1] - img[:, 0]
        gx[:, -1] = img[:, -1] - img[:, -2]
        gy[1:-1] = (img[2:] - img[:-2]) * 0.5
        gy[0] = img[1] - img[0]
        gy[-1] = img[-1] - img[-2]
        return np.hypot(gx, gy)
    mags = np.stack([fd(arr[b]) for b in range(2)])
    expect = np.max(mags, axis=0).mean()
    assert m["grad_mean"] == pytest.approx(expect, rel=1e-5)


def test_nodata_ignored(rng):
    arr = rng.integers(1, 100, (2, 32, 32)).astype(np.float32)
    arr2 = arr.copy()
    arr2[:, :8, :] = 0  # nodata region
    m_masked = compute_all_arrays(arr2, nodata=0)
    m_plain = compute_all_arrays(arr)
    # masked stats should be in a sane range, not dominated by the hole
    assert 0 < m_masked["grad_mean"] < 3 * m_plain["grad_mean"]


def test_nodata_border_has_no_gradient():
    """Gradients touching nodata are excluded (regression: a flat tile with
    a nodata border ranked as high-complexity)."""
    from tpukit.analysis.complexity import compute_all_arrays
    flat = np.full((1, 64, 64), 1000.0, np.float32)
    bordered = flat.copy()
    bordered[:, :, :4] = -9999.0
    m_plain = compute_all_arrays(flat)
    m_border = compute_all_arrays(bordered, nodata=-9999.0)
    assert m_plain["grad_mean"] == 0.0
    assert m_border["grad_mean"] == 0.0
