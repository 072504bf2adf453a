# -*- coding: utf-8 -*-
"""Full .j2c codestream encoder conformance.

encode_j2c must produce ISO/IEC 15444-1 codestreams that (a) round-trip
bit-exactly through tpukit's own JP2Decoder, (b) decode identically in a
THIRD-PARTY decoder (OpenJPEG via Pillow) — the same oracle discipline
as the CharLS/libaec parity suites — and (c) hit rate targets from a
single tier-1 encode via PCRD-opt truncation.  The reference re-runs
gdal_translate/OpenJPEG once per rate point (reference
tools/codecs/j2k/j2k_wrap.py:79-105); here the whole ladder comes from
one analysis pass.
"""

import io

import numpy as np
import pytest

from tpukit.io.j2c_enc import J2CPlan, encode_j2c, fdwt2d_53, _band_norm_53
from tpukit.io.jp2 import JP2Decoder


def _decode_own(cs: bytes) -> np.ndarray:
    return JP2Decoder(cs).decode_component(0, 0, 0)


def _decode_openjpeg(cs: bytes):
    try:
        from PIL import Image
        return np.asarray(Image.open(io.BytesIO(cs)))
    except Exception:  # pragma: no cover - Pillow without J2K support
        return None


def _images():
    rng = np.random.default_rng(42)
    x = np.linspace(0, 6, 97)
    y = np.linspace(0, 5, 123)
    smooth = (120 + 90 * np.sin(y[:, None]) * np.cos(x[None, :])
              + rng.normal(0, 6, (123, 97))).clip(0, 255).astype(np.uint8)
    yield "smooth97x123", smooth, 8, False
    yield "noise16", rng.integers(0, 1 << 12, (64, 64)).astype(np.uint16), \
        12, False
    yield "tiny", rng.integers(0, 256, (5, 3)).astype(np.uint8), 8, False
    yield "row", rng.integers(0, 256, (1, 200)).astype(np.uint8), 8, False
    yield "col", rng.integers(0, 256, (200, 1)).astype(np.uint8), 8, False
    yield "signed", rng.integers(-2000, 2000, (40, 57)).astype(np.int16), \
        12, True
    yield "flat", np.full((33, 47), 77, np.uint8), 8, False


def test_lossless_roundtrip_own_decoder():
    for name, img, depth, signed in _images():
        cs = encode_j2c(img, depth=depth, signed=signed)
        dec = _decode_own(cs)
        np.testing.assert_array_equal(dec, img.astype(np.int64), err_msg=name)


def test_lossless_roundtrip_openjpeg():
    for name, img, depth, signed in _images():
        if signed or depth > 8:
            continue  # Pillow's J2K binding returns uint8 surfaces only
        cs = encode_j2c(img, depth=depth, signed=signed)
        dec = _decode_openjpeg(cs)
        if dec is None:
            pytest.skip("Pillow lacks JPEG 2000 support")
        np.testing.assert_array_equal(dec, img, err_msg=name)


def test_levels_sweep_lossless():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (37, 61)).astype(np.uint8)
    for levels in (0, 1, 2, 3, 6):
        cs = encode_j2c(img, levels=levels)
        np.testing.assert_array_equal(_decode_own(cs), img.astype(np.int64))


def test_rate_targets_meet_budget_and_are_monotone():
    rng = np.random.default_rng(9)
    x = np.linspace(0, 9, 128)
    img = (128 + 100 * np.outer(np.sin(x), np.cos(x))
           + rng.normal(0, 5, (128, 128))).clip(0, 255).astype(np.uint8)
    plan = J2CPlan(img, 8, False, levels=5)
    full = plan.lossless()
    prev_psnr = -1.0
    for frac in (0.08, 0.15, 0.3, 0.6):
        tgt = int(len(full) * frac)
        cs = plan.at_size(tgt)
        assert len(cs) <= tgt
        d = _decode_own(cs).astype(np.float64)
        mse = ((d - img) ** 2).mean()
        psnr = 99.0 if mse == 0 else 10 * np.log10(255 ** 2 / mse)
        assert psnr > prev_psnr
        prev_psnr = psnr
        oj = _decode_openjpeg(cs)
        if oj is not None:
            omse = ((oj.astype(np.float64) - img) ** 2).mean()
            # third-party decode of the truncated stream stays sane
            assert abs(10 * np.log10(255 ** 2 / max(omse, 1e-9)) - psnr) < 1.5
    # generous budget returns the lossless stream itself
    assert plan.at_size(len(full) + 10) == full


def test_fdwt_inverts_synthesis_exactly():
    from tpukit.io.jp2 import sr2d_53
    rng = np.random.default_rng(1)
    for (h, w, tx0, ty0) in ((50, 70, 0, 0), (33, 17, 3, 5), (8, 8, 1, 0),
                             (1, 40, 0, 1), (40, 1, 7, 0)):
        tc = rng.integers(-4000, 4000, (h, w)).astype(np.int64)
        bands = fdwt2d_53(tc, tx0, ty0, tx0 + w, ty0 + h, 3)
        # run the decoder's synthesis back up
        ll = bands[(0, 0)]
        for r in range(1, 4):
            d = 1 << (3 - r)
            u0, v0 = -(-tx0 // d), -(-ty0 // d)
            u1, v1 = -(-(tx0 + w) // d), -(-(ty0 + h) // d)
            ll = sr2d_53(ll, bands[(r, 1)], bands[(r, 2)], bands[(r, 3)],
                         u0, v0, u1, v1)
        np.testing.assert_array_equal(ll, tc)


def test_fdwt97_inverts_synthesis():
    from tpukit.io.j2c_enc import fdwt2d_97
    from tpukit.io.jp2 import sr2d_97
    rng = np.random.default_rng(2)
    for (h, w, tx0, ty0) in ((50, 70, 0, 0), (33, 17, 3, 5), (1, 40, 0, 1),
                             (40, 1, 7, 0)):
        tc = rng.normal(0, 1000, (h, w))
        bands = fdwt2d_97(tc, tx0, ty0, tx0 + w, ty0 + h, 3)
        ll = bands[(0, 0)]
        for r in range(1, 4):
            d = 1 << (3 - r)
            u0, v0 = -(-tx0 // d), -(-ty0 // d)
            u1, v1 = -(-(tx0 + w) // d), -(-(ty0 + h) // d)
            ll = sr2d_97(ll, bands[(r, 1)], bands[(r, 2)], bands[(r, 3)],
                         u0, v0, u1, v1)
        assert np.abs(ll - tc).max() < 1e-9


def _psnr12(a, img):
    mse = ((a.astype(np.float64) - img) ** 2).mean()
    return 10 * np.log10(4095.0 ** 2 / max(mse, 1e-12))


def test_97_full_quality_and_openjpeg_conformance():
    rng = np.random.default_rng(8)
    gy, gx = np.mgrid[0:128, 0:128]
    img = np.clip(2000 + 800 * np.sin(gy / 9) * np.cos(gx / 13)
                  + rng.normal(0, 200, (128, 128)), 0, 4095).astype(np.uint16)
    cs = encode_j2c(img, depth=12, wavelet="97")
    ours = _decode_own(cs)
    assert _psnr12(ours, img) > 80.0   # quantizer ceiling at base_step=1.0
    oj = _decode_openjpeg(cs)
    if oj is None:
        pytest.skip("Pillow lacks JPEG 2000 support")
    # Pillow scales depth-12 components to its 16-bit surface
    assert np.abs((oj.astype(np.int64) >> 4) - ours).max() <= 1


def test_97_rd_matches_or_beats_openjpeg():
    """PCRD truncation of our one-time 9/7 analysis, at OpenJPEG's own
    achieved byte sizes, must reach OpenJPEG's PSNR (small tolerance for
    hull-granularity ties) at every rate."""
    import io as _io
    try:
        from PIL import Image as PILImage
    except Exception:  # pragma: no cover
        pytest.skip("Pillow unavailable")
    rng = np.random.default_rng(1234)
    gy, gx = np.mgrid[0:256, 0:256]
    img = np.clip(2000 + 800 * np.sin(gy / 9) * np.cos(gx / 13)
                  + rng.normal(0, 200, (256, 256)), 0, 4095).astype(np.uint16)
    plan = J2CPlan(img, 12, False, levels=5, wavelet="97")
    for rate in (4, 16, 64):
        buf = _io.BytesIO()
        PILImage.fromarray(img).save(
            buf, format="JPEG2000", irreversible=True,
            quality_mode="rates", quality_layers=[rate])
        data = buf.getvalue()
        p_opj = _psnr12(np.array(PILImage.open(_io.BytesIO(data))), img)
        cs = plan.at_size(len(data))
        assert len(cs) <= len(data)
        p_ours = _psnr12(_decode_own(cs), img)
        assert p_ours >= p_opj - 0.1, (rate, p_ours, p_opj)


def test_quality_layers_snr_scalability():
    """A multi-layer stream truncated after layer l must decode within
    0.5 dB of a dedicated single-layer encode at that byte budget, and
    arbitrary (non-boundary) prefixes must decode without error at
    monotone quality.  Full stream stays third-party decodable."""
    rng = np.random.default_rng(5)
    gy, gx = np.mgrid[0:128, 0:128]
    img = np.clip(2000 + 800 * np.sin(gy / 9) * np.cos(gx / 13)
                  + rng.normal(0, 200, (128, 128)), 0, 4095).astype(
                      np.uint16)
    plan = J2CPlan(img, 12, False, wavelet="97")
    targets = [900, 2500, 8000]
    cs = plan.at_sizes(targets)
    assert len(cs) <= targets[-1]
    for t in targets:
        p_pref = _psnr12(_decode_own(cs[:t]), img)
        p_single = _psnr12(_decode_own(plan.at_size(t)), img)
        assert p_pref >= p_single - 0.5, (t, p_pref, p_single)
    prev = 0.0
    for t in (700, 1800, 5000, len(cs)):
        p = _psnr12(_decode_own(cs[:t]), img)
        assert p >= prev - 0.3
        prev = p
    oj = _decode_openjpeg(cs)
    if oj is not None:
        assert np.abs((oj.astype(np.int64) >> 4)
                      - _decode_own(cs)).max() <= 1


def test_jp2_container_roundtrip():
    from tpukit.io.j2c_enc import wrap_jp2
    from tpukit.io.jp2 import is_jp2
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (40, 56)).astype(np.uint8)
    cs = encode_j2c(img)
    jp2 = wrap_jp2(cs, 56, 40, 8, False)
    assert jp2[:12] == b"\x00\x00\x00\x0cjP  \r\n\x87\n"
    # our own decoder finds the codestream inside the boxes
    np.testing.assert_array_equal(_decode_own(jp2), img.astype(np.int64))
    oj = _decode_openjpeg(jp2)
    if oj is not None:
        np.testing.assert_array_equal(oj, img)


def test_band_norms_regression():
    # Pinned against the uncropped full-grid impulse synthesis (slow
    # original implementation); the support-cropped fast path must agree.
    ref = {(1, 1): 1.0383, (1, 3): 0.7188, (2, 1): 1.5922, (2, 3): 0.9219,
           (3, 1): 2.9197, (4, 1): 5.7028, (5, 1): 11.3367, (5, 3): 6.0215}
    for (nb, o), v in ref.items():
        assert abs(_band_norm_53(nb, o) - v) < 6e-4
    assert _band_norm_53(1, 1) == _band_norm_53(1, 2)


def test_truncated_recon_model_matches_decoder(rng):
    """J2CPlan.truncated_recon reproduces JP2Decoder's reconstruction of
    assemble(sel) BIT-EXACTLY at every truncation point — the model that
    lets the ebcot rate ladder skip per-point host tier-1 decodes."""
    from tpukit.io.j2c_enc import J2CPlan, at_size_multi
    from tpukit.io.jp2 import JP2Decoder

    for t in range(10):
        H, W = int(rng.integers(8, 130)), int(rng.integers(8, 130))
        depth = int(rng.integers(4, 17))
        signed = bool(rng.random() < 0.3)
        wavelet = "97" if t % 3 else "53"
        levels = int(rng.integers(1, 6))
        lo = -(1 << (depth - 1)) if signed else 0
        hi = lo + (1 << depth) - 1
        if t % 2:
            img = np.clip(np.cumsum(rng.integers(-9, 10, (H, W)), axis=1)
                          + (lo + hi) // 2, lo, hi)
        else:
            img = rng.integers(lo, hi + 1, (H, W))
        plan = J2CPlan(img, depth, signed, levels=levels, wavelet=wavelet)
        full = plan.lossless()
        ctx = (t, H, W, depth, signed, wavelet, levels)
        for target in (len(full), max(150, len(full) // 3),
                       max(100, len(full) // 10)):
            streams, sels = at_size_multi([plan], target, return_sel=True)
            dec = JP2Decoder(streams[0]).decode_component(0, 0, 0)
            mod = plan.truncated_recon(sels[0])
            np.testing.assert_array_equal(dec, mod, err_msg=str(ctx))


def test_size_model_matches_assembly(rng):
    """J2CPlan._size_at (native packet-header bit counting + numpy body
    sums) equals len(assemble(_select(lam))) EXACTLY for random slopes —
    the model the at_size_multi bisection trusts instead of assembling
    bytes per trial."""
    import math
    from tpukit.io.j2c_enc import J2CPlan

    for t in range(8):
        H, W = int(rng.integers(8, 200)), int(rng.integers(8, 200))
        depth = int(rng.integers(4, 17))
        signed = bool(rng.random() < 0.3)
        wavelet = "97" if t % 2 else "53"
        levels = int(rng.integers(1, 6))
        lo = -(1 << (depth - 1)) if signed else 0
        hi = lo + (1 << depth) - 1
        img = np.clip(np.cumsum(rng.integers(-7, 8, (H, W)), axis=0)
                      + (lo + hi) // 2, lo, hi)
        plan = J2CPlan(img, depth, signed, levels=levels, wavelet=wavelet)
        sl = plan._slopes()
        lams = [math.inf]
        if len(sl):
            lams += [float(x) for x in
                     rng.choice(sl, size=min(6, len(sl)), replace=False)]
            lams += [float(sl[0]) / 2, float(sl[-1]) * 2]
        for lam in lams:
            got = plan._size_at(lam)
            want = len(plan.assemble(plan._select(lam)))
            assert got == want, (t, H, W, depth, wavelet, levels, lam,
                                 got, want)


def test_native_synthesis_matches_numpy(rng):
    """Native j2k_sr2d_53/97 are bit-exact to jp2.sr2d_53/sr2d_97 over
    fuzzed geometries (odd dims, n==1 edges, negative values)."""
    from tpukit.io.j2c_enc import _sr2d_native
    from tpukit.io.jp2 import sr2d_53, sr2d_97

    for t in range(30):
        u1 = int(rng.integers(1, 97))
        v1 = int(rng.integers(1, 97))
        hw = (v1 + 1) // 2, (u1 + 1) // 2      # LL/ceil shapes at (0,0)
        lw = v1 // 2, u1 // 2
        ll = rng.integers(-5000, 5000, hw)
        hl = rng.integers(-5000, 5000, (hw[0], lw[1]))
        lh = rng.integers(-5000, 5000, (lw[0], hw[1]))
        hh = rng.integers(-5000, 5000, lw)
        got = _sr2d_native(ll, hl, lh, hh, u1, v1, rev=True)
        want = sr2d_53(ll, hl, lh, hh, 0, 0, u1, v1)
        np.testing.assert_array_equal(got, want, err_msg=f"53 t={t}")
        fs = [a * rng.uniform(0.1, 3.0) for a in (ll, hl, lh, hh)]
        gotf = _sr2d_native(*fs, u1, v1, rev=False)
        wantf = sr2d_97(*fs, 0, 0, u1, v1)
        np.testing.assert_array_equal(gotf, wantf, err_msg=f"97 t={t}")


def test_native_forward_dwt_matches_numpy(rng):
    """Native j2k_fd2d_97/53 (and the _fdwt2d_native pyramid wrapper) are
    bit-exact to the numpy fd2d_97/fd2d_53 lifting over fuzzed
    geometries, parities, and level counts — including the vertical
    row-wise restructure and the n==1 scaling-only edges."""
    import ctypes as ct
    from tpukit import native
    from tpukit.io.j2c_enc import (_fdwt2d_native, fd2d_53, fd2d_97,
                                   fdwt2d_53, fdwt2d_97)

    lib = native.load()
    for t in range(40):
        h = int(rng.integers(1, 70))
        w = int(rng.integers(1, 70))
        u0 = int(rng.integers(0, 4))
        v0 = int(rng.integers(0, 4))
        ev_u, ev_v = (-u0) % 2, (-v0) % 2
        od_u, od_v = 1 - ev_u, 1 - ev_v
        af = rng.normal(0, 500, (h, w)).astype(np.float64)
        ll, hl, lh, hh = fd2d_97(af.copy(), u0, v0, u0 + w, v0 + h)
        b = af.copy()
        assert lib.j2k_fd2d_97(
            b.ctypes.data_as(ct.POINTER(ct.c_double)), h, w, u0, v0) == 0
        np.testing.assert_array_equal(ll, b[ev_v::2, ev_u::2])
        np.testing.assert_array_equal(hl, b[ev_v::2, od_u::2])
        np.testing.assert_array_equal(lh, b[od_v::2, ev_u::2])
        np.testing.assert_array_equal(hh, b[od_v::2, od_u::2])
        ai = rng.integers(-5000, 5000, (h, w)).astype(np.int64)
        ll, hl, lh, hh = fd2d_53(ai.copy(), u0, v0, u0 + w, v0 + h)
        c = ai.copy()
        assert lib.j2k_fd2d_53(
            c.ctypes.data_as(ct.POINTER(ct.c_int64)), h, w, u0, v0) == 0
        np.testing.assert_array_equal(ll, c[ev_v::2, ev_u::2])
        np.testing.assert_array_equal(hh, c[od_v::2, od_u::2])
    # full-pyramid wrapper vs the numpy pyramids
    for levels in (1, 3, 5):
        a = rng.integers(-2000, 2000, (83, 61)).astype(np.int64)
        want = fdwt2d_53(a, 0, 0, 61, 83, levels)
        got = _fdwt2d_native(a, 0, 0, 61, 83, levels, "53")
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_array_equal(got[k], want[k], err_msg=str(k))
        wantf = fdwt2d_97(a.astype(np.float64), 0, 0, 61, 83, levels)
        gotf = _fdwt2d_native(a, 0, 0, 61, 83, levels, "97")
        for k in wantf:
            np.testing.assert_array_equal(gotf[k], wantf[k],
                                          err_msg=str(k))
