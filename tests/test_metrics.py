# -*- coding: utf-8 -*-
"""Device metrics vs float64 numpy oracles."""

import numpy as np
import pytest

from tpukit.metrics import compute_metrics, compute_sam_sid_lmse
from tpukit.io.bitdepth import effective_data_range

from tests.reference_impl import compute_metrics_oracle, sam_sid_lmse_oracle


def _noisy(rng, ref, amp):
    noise = rng.integers(-amp, amp + 1, size=ref.shape)
    out = ref.astype(np.int32) + noise
    info = np.iinfo(ref.dtype)
    return np.clip(out, info.min, info.max).astype(ref.dtype)


def test_quality_caseA_like(rng, tile_caseA):
    ref = tile_caseA
    tst = _noisy(rng, ref, 25)
    got = compute_metrics(ref, tst)
    drange = effective_data_range(ref, "uint16")
    assert drange == 4095
    exp = compute_metrics_oracle(ref, tst, drange)
    for k in ("psnr_band_avg", "ssim_band_avg", "psnr_global", "ssim_global"):
        assert got[k] == pytest.approx(exp[k], rel=1e-5), k
    assert got["max_abs_err"] == exp["max_abs_err"]
    assert got["lossless"] == 0
    for i in range(1, 5):
        assert got[f"psnr_b{i}"] == pytest.approx(exp[f"psnr_b{i}"], rel=1e-5)
        assert got[f"ssim_b{i}"] == pytest.approx(exp[f"ssim_b{i}"], rel=1e-5)
        assert got[f"maxerr_b{i}"] == exp[f"maxerr_b{i}"]


def test_quality_lossless(tile_caseB):
    got = compute_metrics(tile_caseB, tile_caseB.copy())
    assert got["lossless"] == 1
    assert got["max_abs_err"] == 0
    assert np.isinf(got["psnr_global"])
    assert got["ssim_global"] == pytest.approx(1.0)


def test_quality_masked(rng, tile_caseB):
    ref = tile_caseB
    tst = _noisy(rng, ref, 9)
    vm = rng.random(ref.shape[1:]) > 0.35
    got = compute_metrics(ref, tst, valid=vm)
    drange = effective_data_range(ref, "int16")
    exp = compute_metrics_oracle(ref, tst, drange, vm)
    for k in ("psnr_band_avg", "ssim_band_avg", "psnr_global", "ssim_global"):
        assert got[k] == pytest.approx(exp[k], rel=1e-5), k
    assert got["max_abs_err"] == exp["max_abs_err"]


def test_quality_empty_mask_falls_back(rng, tile_caseA):
    # reference run_codec.py:264: use_mask = np.any(vm) — empty mask -> all px
    ref = tile_caseA
    tst = _noisy(rng, ref, 5)
    vm = np.zeros(ref.shape[1:], bool)
    got = compute_metrics(ref, tst, valid=vm)
    exp = compute_metrics_oracle(ref, tst, effective_data_range(ref, "uint16"), None)
    assert got["psnr_global"] == pytest.approx(exp["psnr_global"], rel=1e-5)


def test_nodata_excluded(rng):
    ref = rng.integers(1, 4000, size=(2, 24, 24), dtype=np.uint16)
    tst = _noisy(rng, ref, 3)
    ref[:, :4, :] = 0
    tst[:, :4, :] = 0
    got = compute_metrics(ref, tst, nodata=0)
    vm = np.ones((24, 24), bool); vm[:4] = False
    exp = compute_metrics_oracle(ref, tst, effective_data_range(ref, "uint16"), vm)
    assert got["psnr_global"] == pytest.approx(exp["psnr_global"], rel=1e-5)


def test_sam_sid_lmse(rng, tile_caseB):
    ref = np.abs(tile_caseB.astype(np.int32)).astype(np.int16) + 4
    tst = _noisy(rng, ref, 6)
    vm = rng.random(ref.shape[1:]) > 0.2
    got = compute_sam_sid_lmse(ref, tst, vm)
    exp = sam_sid_lmse_oracle(ref, tst, vm)
    assert got["sam_deg"] == pytest.approx(exp["sam_deg"], rel=1e-3, abs=1e-4)
    assert got["sid"] == pytest.approx(exp["sid"], rel=5e-2, abs=1e-5)
    assert got["lmse"] == pytest.approx(exp["lmse"], rel=1e-3)


def test_sam_identical_is_zero(tile_caseB):
    ref = np.abs(tile_caseB.astype(np.int32)).astype(np.int16) + 4
    got = compute_sam_sid_lmse(ref, ref.copy())
    assert got["sam_deg"] == pytest.approx(0.0, abs=0.2)  # arccos f32 noise near 1
    assert got["sid"] == pytest.approx(0.0, abs=1e-5)
    assert got["lmse"] == pytest.approx(0.0, abs=1e-6)


def test_empty_mask_spectral(tile_caseB):
    vm = np.zeros(tile_caseB.shape[1:], bool)
    got = compute_sam_sid_lmse(tile_caseB, tile_caseB, vm)
    assert np.isnan(got["sam_deg"]) and np.isnan(got["sid"])


def test_float_cubes_not_truncated():
    """Float rasters must difference in float (regression: int32 cast made
    sub-1.0 errors vanish and could report false lossless)."""
    from tpukit.metrics.quality import compute_metrics
    ref = np.full((1, 16, 16), 10.4, np.float32)
    tst = np.full((1, 16, 16), 11.1, np.float32)
    met = compute_metrics(ref, tst, "float32", data_range=100.0)
    assert abs(met["max_abs_err"] - 0.7) < 1e-5
    assert met["lossless"] == 0
    tst2 = ref + np.float32(0.4)
    met2 = compute_metrics(ref, tst2, "float32", data_range=100.0)
    assert met2["lossless"] == 0 and met2["max_abs_err"] > 0.3
