# -*- coding: utf-8 -*-
"""J2K codec with the standard-codestream EBCOT backend.

`create("j2k", entropy="ebcot")` must behave like any other tpukit codec
(run / sweep_rates / keep_bitstream) while emitting per-band .j2c
artifacts that third-party decoders read — the interop mode the
reference gets from gdal_translate/OpenJPEG (j2k_wrap.py:79-105), here
with the whole rate ladder PCRD-truncated from one tier-1 analysis."""

import io

import numpy as np
import pytest

from tpukit.codecs.base import RateSpec
from tpukit.codecs.registry import create


@pytest.fixture
def cube(rng):
    gy, gx = np.mgrid[0:96, 0:96]
    base = 900 + 3.0 * gy + 2.0 * gx
    tex = 500 * np.sin(gy / 7) * np.cos(gx / 11)
    c = np.stack([np.clip(base + k * tex + rng.normal(0, 40, (96, 96)),
                          0, 4095) for k in (0.2, 1.0, 2.0)])
    return c.astype(np.uint16)


def test_lossless_roundtrip(cube):
    codec = create("j2k", entropy="ebcot")
    res = codec.run(cube, "uint16", RateSpec.none(), keep_bitstream=True)
    np.testing.assert_array_equal(np.asarray(res.recon), cube)
    assert res.bitstream_bytes > 0
    assert set(res.bitstreams) == {"b01.j2c", "b02.j2c", "b03.j2c"}
    # artifacts are standard codestreams: SOC..EOC and third-party decode
    for name, data in res.bitstreams.items():
        assert data[:2] == b"\xff\x4f" and data[-2:] == b"\xff\xd9"
    try:
        from PIL import Image
        b0 = np.asarray(Image.open(io.BytesIO(res.bitstreams["b01.j2c"])))
    except Exception:
        return   # Pillow without J2K support
    assert np.array_equal(b0, cube[0])   # depth 16 signalled: no rescale


def test_bpp_target_met_and_monotone(cube):
    codec = create("j2k", entropy="ebcot")
    prev = None
    for bpp in (0.5, 1.0, 2.0):
        res = codec.run(cube, "uint16", RateSpec.of("bpp", bpp))
        assert res.bitstream_bytes * 8 / cube.size <= bpp * 1.001
        mse = ((np.asarray(res.recon).astype(np.float64) - cube) ** 2).mean()
        if prev is not None:
            assert mse < prev
        prev = mse
    assert res.extras["entropy"] == "ebcot"


def test_sweep_amortizes_and_matches_run(cube):
    codec = create("j2k", entropy="ebcot")
    specs = [RateSpec.of("bpp", 0.75), RateSpec.of("bpp", 1.5),
             RateSpec.none()]
    sw = codec.sweep_rates(cube, "uint16", specs)
    assert len(sw) == 3
    for s, r in zip(specs, sw):
        single = codec.run(cube, "uint16", s)
        assert r.bitstream_bytes == single.bitstream_bytes
        np.testing.assert_array_equal(np.asarray(r.recon),
                                      np.asarray(single.recon))


def test_quality_key(cube):
    codec = create("j2k", entropy="ebcot")
    r_hi = codec.run(cube, "uint16", RateSpec.of("quality", 80))
    r_lo = codec.run(cube, "uint16", RateSpec.of("quality", 20))
    assert r_lo.bitstream_bytes < r_hi.bitstream_bytes
    e_hi = ((np.asarray(r_hi.recon).astype(np.float64) - cube) ** 2).mean()
    e_lo = ((np.asarray(r_lo.recon).astype(np.float64) - cube) ** 2).mean()
    assert e_hi < e_lo


def test_quality_ladder_amortized_device_targets(cube):
    """Quality ladders run from ONE tier-1 analysis: each point PCRD-
    truncates to the byte budget the device LIGHT size model (embedded +
    run-length candidates, j2k_codec.wenc_size_bytes_light) spends at
    that quality's step. Sizes track the device backend within the
    light-vs-quadruple model gap (a few percent), MSE is monotone in
    quality, every stream stays ISO-decodable, and the plan set is
    shared across reps through the harness cache."""
    from tpukit.io.jp2 import JP2Decoder

    codec = create("j2k", entropy="ebcot")
    dev = create("j2k", entropy="device")   # device backend: the quality->size reference
    qs = [10, 35, 80]
    specs = [RateSpec.of("quality", q) for q in qs]
    cache = {}
    sw = codec.sweep_rates(cube, "uint16", specs,
                           keep_bitstream=True, device_plan_cache=cache)
    dv = dev.sweep_rates(cube, "uint16", specs)
    assert any(k[0] == "j2c_plans" for k in cache)
    prev_mse = None
    for q, r, d in zip(qs, sw, dv):
        assert r.extras["quality_used"] == q
        # PCRD meets the light-model budget; the light anchor sits at
        # most a few percent above the device backend's quadruple min
        assert r.bitstream_bytes <= int(d.bitstream_bytes * 1.10)
        assert r.bitstream_bytes >= int(d.bitstream_bytes * 0.75)
        for name, cs in r.bitstreams.items():
            dec = JP2Decoder(cs).decode_component(0, 0, 0)
            assert dec.shape == cube.shape[1:]
        mse = ((np.asarray(r.recon).astype(np.float64) - cube) ** 2).mean()
        if prev_mse is not None:
            assert mse < prev_mse
        prev_mse = mse
    # cached plans: a second rep's sweep reuses them and agrees exactly
    sw2 = codec.sweep_rates(cube, "uint16", specs,
                            device_plan_cache=cache)
    for a, b in zip(sw, sw2):
        assert a.bitstream_bytes == b.bitstream_bytes
        np.testing.assert_array_equal(np.asarray(a.recon),
                                      np.asarray(b.recon))


def test_single_point_synthesis_matches_real_decode(cube):
    """run() reconstructs via the truncated-decode model (sig-plan
    replay + native synthesis) instead of a full tier-1 MQ decode; the
    result must equal JP2Decoder on the emitted streams for every rate
    class — the codec-level face of the pinned model==decoder equality
    (test_j2c_enc.test_truncated_recon_model_matches_decoder)."""
    from tpukit.io.jp2 import JP2Decoder

    codec = create("j2k", entropy="ebcot")
    for spec in (RateSpec.none(), RateSpec.of("quality", 40),
                 RateSpec.of("bpp", 1.0)):
        res = codec.run(cube, "uint16", spec, keep_bitstream=True)
        info = np.iinfo(cube.dtype)
        for b in range(cube.shape[0]):
            dec = JP2Decoder(res.bitstreams[f"b{b+1:02d}.j2c"]) \
                .decode_component(0, 0, 0)
            np.testing.assert_array_equal(
                np.asarray(res.recon)[b],
                np.clip(dec, info.min, info.max).astype(cube.dtype),
                err_msg=f"spec={spec} band={b}")


def test_single_point_rep_cache(cube):
    """Rep semantics of the _run_ebcot fall-through: point-level reuse
    (streams + recon + re-reported timings) happens only under the
    opt-in dedupe_reps; honest reps (default) reuse the tier-1 ANALYSIS
    but re-execute selection/assembly/synthesis per call, byte-equal."""
    codec = create("j2k", entropy="ebcot")
    cache = {}
    a = codec.run(cube, "uint16", RateSpec.none(), keep_bitstream=True,
                  device_plan_cache=cache, dedupe_reps=True)
    assert any(k[0] == "j2c_single" for k in cache)
    b = codec.run(cube, "uint16", RateSpec.none(), keep_bitstream=True,
                  device_plan_cache=cache, dedupe_reps=True)
    assert b.t_comp_s == a.t_comp_s and b.t_dec_s == a.t_dec_s
    assert b.bitstreams == a.bitstreams
    np.testing.assert_array_equal(np.asarray(a.recon), np.asarray(b.recon))
    # sweep_rates' lossless fall-through shares the same cache entries
    sw = codec.sweep_rates(cube, "uint16", [RateSpec.none()],
                           keep_bitstream=True, device_plan_cache=cache,
                           dedupe_reps=True)
    assert sw[0].bitstream_bytes == a.bitstream_bytes


def test_single_point_honest_reps_reexecute(cube):
    """Honest (default) reps: the cached analysis is reused but each call
    re-runs selection/assembly/synthesis — no finished-point cache entry,
    fresh t_dec measurement, identical bytes and recon."""
    codec = create("j2k", entropy="ebcot")
    cache = {}
    a = codec.run(cube, "uint16", RateSpec.none(), keep_bitstream=True,
                  device_plan_cache=cache)
    assert not any(k[0] == "j2c_single" for k in cache)
    assert any(k[0] == "j2c_single_plans" for k in cache)
    b = codec.run(cube, "uint16", RateSpec.none(), keep_bitstream=True,
                  device_plan_cache=cache)
    assert b.bitstreams == a.bitstreams
    np.testing.assert_array_equal(np.asarray(a.recon), np.asarray(b.recon))
    # the re-reported analysis time is shared; the synthesis span is a
    # fresh measurement (can't assert inequality on wall times robustly,
    # but the cache must hold no finished point)
    assert not any(k[0] == "j2c_single" for k in cache)


def test_ladder_t_dec_is_real_decode_and_model_matches(cube):
    """Directive: canonical t_dec_s comes from ONE real stream decode per
    (tile, rate) (reference j2k_wrap.py:102-105); re-executions
    reconstruct via the truncated-decode model. Pin that (a) the first
    execution's recon IS the decoded stream, (b) a re-execution's
    model recon equals it bit-for-bit, and (c) the re-execution
    re-reports the real-decode wall with its model wall in extras."""
    from tpukit.io.jp2 import JP2Decoder

    codec = create("j2k", entropy="ebcot")
    cache = {}
    specs = [RateSpec.of("quality", 10), RateSpec.of("quality", 40)]
    first = codec.sweep_rates(cube, "uint16", specs, keep_bitstream=True,
                              device_plan_cache=cache)
    again = codec.sweep_rates(cube, "uint16", specs, keep_bitstream=True,
                              device_plan_cache=cache)
    info = np.iinfo(cube.dtype)
    for a, b in zip(first, again):
        # (a) first recon == decode of the emitted streams
        for bi in range(cube.shape[0]):
            dec = JP2Decoder(a.bitstreams[f"b{bi+1:02d}.j2c"]) \
                .decode_component(0, 0, 0)
            np.testing.assert_array_equal(
                np.asarray(a.recon)[bi],
                np.clip(dec, info.min, info.max).astype(cube.dtype))
        # (b) model recon (second execution) == decoded recon
        np.testing.assert_array_equal(np.asarray(a.recon),
                                      np.asarray(b.recon))
        # (c) decode-wall re-reported; model wall carried alongside
        assert b.t_dec_s == a.t_dec_s
        assert "t_dec_model_s" not in a.extras
        assert b.extras.get("t_dec_model_s", 0) > 0
        assert a.bitstreams == b.bitstreams


def test_plan_cache_rejects_different_cube_content(cube, rng):
    """The plan-cache keys carry a content token: reusing one
    device_plan_cache dict across different same-shape cubes must not
    serve the first cube's streams (advisor r4)."""
    codec = create("j2k", entropy="ebcot")
    cache = {}
    a = codec.run(cube, "uint16", RateSpec.of("quality", 40),
                  keep_bitstream=True, device_plan_cache=cache)
    other = np.ascontiguousarray(cube[:, ::-1, ::-1])
    b = codec.run(other, "uint16", RateSpec.of("quality", 40),
                  keep_bitstream=True, device_plan_cache=cache)
    assert a.bitstreams != b.bitstreams
    from tpukit.io.jp2 import JP2Decoder
    info = np.iinfo(other.dtype)
    dec = JP2Decoder(b.bitstreams["b01.j2c"]).decode_component(0, 0, 0)
    np.testing.assert_array_equal(
        np.asarray(b.recon)[0],
        np.clip(dec, info.min, info.max).astype(other.dtype))


def test_plan_cache_token_covers_full_content(cube, rng):
    """The cache token hashes the FULL cube: a single-sample change
    anywhere (including off any stride grid) must miss the cache
    (round-5 review reproduced a sparse-stride token serving the first
    cube's streams for an off-grid edit)."""
    codec = create("j2k", entropy="ebcot")
    cache = {}
    a = codec.run(cube, "uint16", RateSpec.of("quality", 40),
                  keep_bitstream=True, device_plan_cache=cache,
                  dedupe_reps=True)
    other = cube.copy()
    other[0, 1, 1] += 496        # off every coarse stride grid
    b = codec.run(other, "uint16", RateSpec.of("quality", 40),
                  keep_bitstream=True, device_plan_cache=cache,
                  dedupe_reps=True)
    fresh = codec.run(other, "uint16", RateSpec.of("quality", 40),
                      keep_bitstream=True)
    assert b.bitstreams == fresh.bitstreams
    np.testing.assert_array_equal(np.asarray(b.recon),
                                  np.asarray(fresh.recon))
