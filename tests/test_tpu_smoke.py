# -*- coding: utf-8 -*-
"""Opt-in REAL-TPU smoke tier (round-3 VERDICT weak #5).

The suite pins itself to CPU (tests/conftest.py) because the TPU tunnel
is single-owner and its first fetch can stall minutes — so every
device-model parity claim is ordinarily CPU-validated and real-TPU
behavior is covered only by bench.py. This tier closes that gap on
demand:

    TPUKIT_TPU_SMOKE=1 python -m pytest tests/test_tpu_smoke.py -q

It runs one J2K quality ladder, one CCSDS-122 budget ladder, the
CCSDS-121 device coder and one metric pass on the REAL accelerator and
compares against the CPU platform in the same process:

  * integer paths (ccsds121 stream bytes, 122's integer 9/7M model byte
    counts + reconstructions) must be EXACTLY equal across platforms;
  * f32 paths (J2K's multiply-quantizer, the metric reductions) match
    within tight tolerances — f32 contraction order may differ by
    backend, so bit-equality is not claimed there (sizes do match
    exactly in practice; the assertion allows last-ULP quantizer flips).

Skipped by default; green on the bench host (takes ~1-3 min warm, plus
the tunnel's first-fetch stall cold).
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("TPUKIT_TPU_SMOKE") != "1",
    reason="opt-in real-TPU tier: set TPUKIT_TPU_SMOKE=1")

import jax  # noqa: E402

from tpukit.codecs.base import RateSpec  # noqa: E402
from tpukit.codecs.registry import create  # noqa: E402


def _accel():
    for plat in (os.environ.get("TPUKIT_TPU_SMOKE_PLATFORM", "axon"),
                 "tpu"):
        try:
            return jax.devices(plat)[0]
        except Exception:
            continue
    pytest.skip("no accelerator platform reachable")


@pytest.fixture(scope="module")
def dev():
    return _accel()


@pytest.fixture(scope="module")
def cube16():
    rng = np.random.default_rng(99)
    base = (600 + 3 * np.arange(256)[:, None]
            + rng.integers(0, 700, (4, 256, 256))).astype(np.int32)
    return (np.clip(base, 0, 4095).astype(np.uint16) << 4)


def _run(codec, cube, specs, device, **kw):
    with jax.default_device(device):
        return codec.sweep_rates(cube, "uint16", specs, **kw)


def test_smoke_ccsds121_byte_equal(dev, cube16):
    """The device CCSDS-121 coder emits byte-identical streams on CPU
    and TPU (pure integer program)."""
    specs = [RateSpec.none()]
    r_cpu = _run(create("ccsds121", preproc="diff1"), cube16, specs,
                 jax.devices("cpu")[0], keep_bitstream=True)[0]
    r_tpu = _run(create("ccsds121", preproc="diff1"), cube16, specs,
                 dev, keep_bitstream=True)[0]
    assert r_cpu.bitstream_bytes == r_tpu.bitstream_bytes
    assert r_cpu.bitstreams.keys() == r_tpu.bitstreams.keys()
    for k in r_cpu.bitstreams:
        assert r_cpu.bitstreams[k] == r_tpu.bitstreams[k], k
    assert np.array_equal(np.asarray(r_cpu.recon), np.asarray(r_tpu.recon))


def test_smoke_ccsds122_ladder_integer_equal(dev, cube16):
    """The CCSDS-122 BPE budget ladder (integer 9/7M DWT + integer
    stream-layout model) produces identical byte counts and identical
    integer reconstructions on CPU and TPU."""
    specs = [RateSpec.of("bpp", 1.0), RateSpec.of("bpp", 4.0)]
    rs_cpu = _run(create("ccsds122"), cube16, specs, jax.devices("cpu")[0],
                  keep_bitstream=True)
    rs_tpu = _run(create("ccsds122"), cube16, specs, dev,
                  keep_bitstream=True)
    for rc, rt in zip(rs_cpu, rs_tpu):
        assert rc.bitstream_bytes == rt.bitstream_bytes
        for k in rc.bitstreams:
            assert rc.bitstreams[k] == rt.bitstreams[k], k
        assert np.array_equal(np.asarray(rc.recon), np.asarray(rt.recon))


def test_smoke_j2k_quality_ladder(dev, cube16):
    """One J2K device-backend quality ladder on the real chip vs CPU:
    stream sizes within 0.5% (f32 quantizer — last-ULP flips move a few
    coefficients across quantization bins) and recon MSE within 1%."""
    specs = [RateSpec.of("quality", 20), RateSpec.of("quality", 60)]
    rs_cpu = _run(create("j2k", entropy="device"), cube16, specs,
                  jax.devices("cpu")[0])
    rs_tpu = _run(create("j2k", entropy="device"), cube16, specs, dev)
    for rc, rt in zip(rs_cpu, rs_tpu):
        assert rt.bitstream_bytes == pytest.approx(rc.bitstream_bytes,
                                                   rel=5e-3)
        mse_c = float(np.mean((np.asarray(rc.recon).astype(np.float64)
                               - cube16) ** 2))
        mse_t = float(np.mean((np.asarray(rt.recon).astype(np.float64)
                               - cube16) ** 2))
        assert mse_t == pytest.approx(mse_c, rel=1e-2)


def test_smoke_metric_pass(dev, cube16):
    """One fused quality-stats pass on the real chip vs CPU: PSNR/SSIM
    agree to 1e-4 relative (f32 reduction order differs by backend)."""
    from tpukit.metrics.quality import (assemble_quality,
                                        merge_quality_stats,
                                        quality_stats_dual)
    rng = np.random.default_rng(3)
    recon = (cube16.astype(np.int32)
             + rng.integers(-48, 48, cube16.shape)).clip(0, 65535) \
        .astype(np.uint16)
    vm = np.ones(cube16.shape[1:], bool)

    def stats(device):
        import jax.numpy as jnp
        ref_d = jax.device_put(cube16, device)
        rec_d = jax.device_put(recon, device)
        vm_d = jax.device_put(vm, device)
        qm, _ = quality_stats_dual(ref_d, rec_d, vm_d)
        met = assemble_quality(
            merge_quality_stats([{k: np.asarray(v)
                                  for k, v in qm.items()}]), 65535.0)
        return met

    m_cpu = stats(jax.devices("cpu")[0])
    m_tpu = stats(dev)
    for k in ("psnr_global", "ssim_global", "psnr_band_avg",
              "ssim_band_avg"):
        assert m_tpu[k] == pytest.approx(m_cpu[k], rel=1e-4), k
    assert m_tpu["max_abs_err"] == m_cpu["max_abs_err"]


def test_smoke_j2k_ebcot_pricing(dev, cube16):
    """The ebcot quality->byte-target pricing program (light size model:
    device DWT + ladder sizes) runs on the real chip and agrees with the
    CPU platform within f32-quantizer tolerance. (The canonical sweep
    deliberately prices on the LOCAL CPU for topology-invariant budgets;
    this pins that the program itself is healthy on the accelerator.)"""
    import jax.numpy as jnp
    from tpukit.codecs import j2k_codec as jc
    from tpukit.kernels import dwt as dwtk
    from tpukit.codecs import wavelet_common as wc

    B, H, W = cube16.shape
    m = 1 << jc.LEVELS
    Hp, Wp = H + (-H) % m, W + (-W) % m
    order = wc.scan_order(Hp, Wp, jc.LEVELS)
    segb = wc.subband_seg_bounds(Hp, Wp, jc.LEVELS)
    peak = float(np.abs(cube16.astype(np.float64)).max())
    scale_host = jc._subband_steps(Hp, Wp, 1.0)
    inv_perm = (np.float32(1.0) / scale_host).ravel()[np.asarray(order)]
    bases = np.array([jc.base_step_for_quality(q, peak)
                      for q in (10, 40, 80)], np.float32)

    def price(device):
        with jax.default_device(device):
            wf = jax.device_put(
                np.pad(cube16.astype(np.float32),
                       ((0, 0), (0, Hp - H), (0, Wp - W)), mode="edge"),
                device)
            coefs = dwtk.dwt2(wf, "97", jc.LEVELS)
            return np.asarray(jc._device_ladder_sizes(
                coefs, jnp.asarray(order), jnp.asarray(inv_perm),
                jnp.asarray(np.float32(1.0) / bases), segbounds=segb,
                light=True))

    s_cpu = price(jax.devices("cpu")[0])
    s_tpu = price(dev)
    assert s_cpu.shape == s_tpu.shape
    np.testing.assert_allclose(s_tpu.sum(axis=-1), s_cpu.sum(axis=-1),
                               rtol=5e-3)


def test_smoke_jpegls_band(dev, cube16):
    """One JPEG-LS run under the accelerator default device: the coder is
    host C++ (CharLS byte-compatible), so streams and recon must be
    EXACTLY equal to the CPU-platform run — pins that an
    accelerator-attached process drives the jpegls path unperturbed."""
    specs = [RateSpec.none()]
    r_cpu = _run(create("jpegls"), cube16[:1], specs,
                 jax.devices("cpu")[0], keep_bitstream=True)[0]
    r_tpu = _run(create("jpegls"), cube16[:1], specs, dev,
                 keep_bitstream=True)[0]
    assert r_cpu.bitstream_bytes == r_tpu.bitstream_bytes
    for k in r_cpu.bitstreams:
        assert r_cpu.bitstreams[k] == r_tpu.bitstreams[k], k
    np.testing.assert_array_equal(np.asarray(r_cpu.recon),
                                  np.asarray(r_tpu.recon))


def test_smoke_ccsds123_tile(dev):
    """CCSDS-123 on a small hyperspectral tile, both predictors. The
    standard predictor is host C++: byte-identical streams under either
    attached backend. The ls predictor FITS its transmitted 4.12 weights
    with f32 normal equations on device — a last-ULP platform difference
    can flip a quantized weight, so cross-platform streams are valid but
    not byte-pinned; each platform's stream must round-trip losslessly
    and the sizes must agree within 2%."""
    rng = np.random.default_rng(5)
    base = rng.integers(300, 1500, (40, 40)).astype(np.int32)
    cube = (base[None] + rng.integers(-20, 20, (20, 40, 40))) \
        .astype(np.int16)
    cube = ((cube.view(np.uint16) >> 2) << 2).view(np.int16)
    for pred in ("ls", "standard"):
        codec_args = {"predictor": pred}
        r_cpu = None
        for device, acc in ((jax.devices("cpu")[0], "cpu"), (dev, "tpu")):
            with jax.default_device(device):
                r = create("ccsds123", **codec_args).run(
                    cube, "int16", RateSpec.none(), keep_bitstream=True)
            # lossless round-trip on EVERY platform
            np.testing.assert_array_equal(np.asarray(r.recon), cube,
                                          err_msg=f"{pred}/{acc}")
            if r_cpu is None:
                r_cpu = r
                continue
            if pred == "standard":
                assert r.bitstream_bytes == r_cpu.bitstream_bytes, pred
                for k in r_cpu.bitstreams:
                    assert r.bitstreams[k] == r_cpu.bitstreams[k], (pred, k)
            else:
                assert r.bitstream_bytes == pytest.approx(
                    r_cpu.bitstream_bytes, rel=0.02), pred


def test_smoke_mesh_metric_ladder(dev, cube16, tmp_path):
    """One canonical run-codec sweep with --mesh 1 on the real chip: the
    mesh metric-ladder dispatch must produce the same metric rows as the
    CPU run (integer codec; f32 metrics within tolerance)."""
    from tpukit.cli.main import run_codec_main
    from tpukit.io import tiff, write_manifest
    from tpukit.sweep import csvio

    p = tmp_path / "t.tif"
    tiff.write_geotiff(p, cube16, blockxsize=128, blockysize=128)
    idx = tmp_path / "i.json"
    write_manifest(idx, "caseA", "tile_256",
                   [{"tile_id": "T", "path": p}])

    outs = {}
    for tag, device in (("cpu", jax.devices("cpu")[0]), ("tpu", dev)):
        with jax.default_device(device):
            run_codec_main([
                "--indices", str(idx), "--codec", "ccsds121",
                "--rate-key", "none", "--reps", "1", "--preproc", "none",
                "--nbit", "16", "--mesh", "1",
                "--outdir", str(tmp_path / f"o_{tag}")])
        outs[tag] = csvio.read_csv_smart(tmp_path / f"o_{tag}"
                                         / "metrics.csv")
    a, b = outs["cpu"], outs["tpu"]
    assert int(a["bitstream_bytes"][0]) == int(b["bitstream_bytes"][0])
    assert int(a["lossless"][0]) == int(b["lossless"][0]) == 1
    assert float(a["max_abs_err"][0]) == float(b["max_abs_err"][0]) == 0


def test_smoke_pallas_dwt_bit_exact(dev):
    """The fused Pallas 9/7 DWT is bit-exact vs the jnp transform ON THE
    REAL CHIP (measured diff 0.0 — both forms express the identical
    per-element lifting arithmetic and Mosaic does not re-contract it)."""
    import jax.numpy as jnp
    from tpukit.kernels import dwt as dwtk
    from tpukit.kernels.dwt_pallas import dwt2_pallas

    rng = np.random.default_rng(11)
    x = rng.normal(0, 1000, (2, 256, 256)).astype(np.float32)
    with jax.default_device(dev):
        a = np.asarray(dwtk.dwt2(jnp.asarray(x), "97", 3))
        b = np.asarray(dwt2_pallas(jnp.asarray(x), levels=3))
    np.testing.assert_array_equal(a, b)
