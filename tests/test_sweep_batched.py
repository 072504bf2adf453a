# -*- coding: utf-8 -*-
"""Batched sweep machinery: sweep_rates equivalence to per-point run(),
per-lane nodata masking in the metric ladder, and enc/dec memory phases."""

import numpy as np
import pytest

from tpukit.codecs.base import RateSpec
from tpukit.codecs.registry import create
from tpukit.io import tiff, write_manifest
from tpukit.sweep.runner import SweepConfig, run_sweep


@pytest.fixture
def casea_cube(rng):
    base = rng.integers(300, 3500, (64, 64)).astype(np.int32)
    cube = np.clip(base[None] + rng.integers(-150, 150, (4, 64, 64)),
                   0, 4095).astype(np.uint16) << 4
    return cube.astype(np.uint16)


def test_j2k_sweep_rates_matches_run(casea_cube):
    """The amortized ladder is point-for-point identical to per-rate run()
    in stream size and reconstruction (reference loop run_codec.py:472-495
    semantics preserved)."""
    codec = create("j2k", entropy="device")
    specs = [RateSpec.of("quality", q) for q in (10, 35, 80)]
    swept = codec.sweep_rates(casea_cube, "uint16", specs,
                              keep_bitstream=True)
    for spec, res in zip(specs, swept):
        single = codec.run(casea_cube, "uint16", spec, keep_bitstream=True)
        assert res.bitstream_bytes == single.bitstream_bytes
        np.testing.assert_array_equal(np.asarray(res.recon), single.recon)
        assert res.bitstreams.keys() == single.bitstreams.keys()
        for k in res.bitstreams:
            assert res.bitstreams[k] == single.bitstreams[k]
        assert res.extras["quality_used"] == single.extras["quality_used"]


def test_j2k_sweep_rates_mixed_lossless(casea_cube):
    codec = create("j2k", entropy="device")
    specs = [RateSpec.none(), RateSpec.of("quality", 30)]
    swept = codec.sweep_rates(casea_cube, "uint16", specs)
    np.testing.assert_array_equal(np.asarray(swept[0].recon), casea_cube)
    assert swept[0].extras["quality_used"] is None
    assert swept[1].extras["quality_used"] == 30


def test_ccsds122_sweep_rates_matches_run(casea_cube):
    """The embedded stream's prefix property makes the amortized ladder
    byte-identical to budgeted per-point encoding."""
    codec = create("ccsds122")
    specs = [RateSpec.of("bpp", v) for v in (0.5, 2.0, 16.0)]
    swept = codec.sweep_rates(casea_cube, "uint16", specs,
                              keep_bitstream=True)
    for spec, res in zip(specs, swept):
        single = codec.run(casea_cube, "uint16", spec, keep_bitstream=True)
        assert res.bitstream_bytes == single.bitstream_bytes
        for k in res.bitstreams:
            assert res.bitstreams[k] == single.bitstreams[k]
        np.testing.assert_array_equal(np.asarray(res.recon), single.recon)
    # the 16 bpp point is effectively lossless (budget drop,
    # ccsds122_wrap.py:107)
    np.testing.assert_array_equal(np.asarray(swept[2].recon), casea_cube)


def test_sweep_ladder_rows_match_per_point_metrics(tmp_path, rng):
    """run_sweep's batched metric lanes reproduce compute_metrics per row,
    including the recon-side nodata exclusion (run_codec.py:249-263)."""
    from tpukit.metrics import compute_metrics

    base = rng.integers(500, 3000, (48, 48)).astype(np.int32)
    cube = np.clip(base[None] + rng.integers(-200, 200, (4, 48, 48)),
                   1, 4095).astype(np.uint16)
    cube[:, :6, :] = 0  # nodata stripe
    p = tmp_path / "caseA_tile_X.tif"
    tiff.write_geotiff(p, cube, nodata=0.0)
    idx = tmp_path / "index.json"
    write_manifest(idx, "caseA", "tile", [{"tile_id": "X", "path": p}])

    cfg = SweepConfig(
        indices=idx, codec=create("j2k", entropy="device"), codec_label="j2k",
        outdir=tmp_path / "runs", rate_key="quality",
        rates=[20, 60], reps=2)
    rows = run_sweep(cfg)["rows"]
    assert len(rows) == 4
    # reps of the same rate share metric values (deterministic codec)
    for i in (0, 2):
        for key in ("psnr_global", "ssim_global", "max_abs_err", "bpp"):
            assert rows[i][key] == rows[i + 1][key]
    # per-row parity with the single-pair metric path
    with tiff.open(p) as ds:
        src_mask = ds.dataset_mask()
    for row, rate in ((rows[0], 20), (rows[2], 60)):
        with tiff.open(tmp_path / "runs" / "X" / f"quality_{rate}" /
                       "rep_01" / "recon.tif") as rds:
            recon = rds.read()
        met = compute_metrics(cube, recon, dtype_name="uint16",
                              nodata=0.0, ref_mask=src_mask)
        for k in ("psnr_global", "ssim_global", "psnr_band_avg",
                  "max_abs_err", "lossless"):
            assert row[k] == pytest.approx(met[k], rel=1e-6, abs=1e-9), k


def test_mem_phases_separate():
    """MemorySampler attributes peaks to comp/dec phases; the runner fills
    mem_comp/mem_dec from them (reference measures each direction as its
    own subprocess, proc_metrics.py:8-44 callers)."""
    from tpukit.sweep.proc import MemorySampler, mem_phase

    with MemorySampler(interval_s=0.002) as ms:
        with mem_phase("comp"):
            big = np.ones((64, 1 << 19), np.float64)  # ~256 MB
            s = float(big.sum())
        del big
        with mem_phase("dec"):
            small = np.ones(1024, np.float64)
            s += float(small.sum())
    assert ms.phase_peak_bytes("comp") is not None
    assert ms.phase_peak_bytes("dec") is not None
    assert ms.peak_bytes >= ms.phase_peak_bytes("comp") > 0
    assert s > 0


def test_sweep_rows_have_distinct_mem_columns(tmp_path, rng):
    cube = rng.integers(0, 4096, (4, 32, 32)).astype(np.uint16)
    p = tmp_path / "t.tif"
    tiff.write_geotiff(p, cube)
    idx = tmp_path / "index.json"
    write_manifest(idx, "caseA", "tile", [{"tile_id": "T", "path": p}])
    cfg = SweepConfig(
        indices=idx, codec=create("ccsds121", tile=32, preproc="none"),
        codec_label="ccsds121_ext", outdir=tmp_path / "runs",
        write_artifacts=False, quicklooks=False)
    rows = run_sweep(cfg)["rows"]
    assert rows[0]["mem_comp_peak_bytes"] > 0
    assert rows[0]["mem_dec_peak_bytes"] > 0
