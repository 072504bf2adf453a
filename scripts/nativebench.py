#!/usr/bin/env python3
# -*- coding: utf-8 -*-
"""Microbenchmark for the native entropy stages (host C++), min-of-N.

These floors bound the two headline numbers (docs/SCALING.md): the
CCSDS-121 decode tail of the Case B anchor and the bit-plane enc+dec cost
per Case A rate point. Run with the machine otherwise idle.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def mintime(fn, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    from tpukit.native import ccsds121_host as ck
    from tpukit.codecs import wavelet_common as wc
    from tpukit.kernels import dwt as dwtk
    import jax.numpy as jnp

    rng = np.random.default_rng(7)

    # Case B-like stream (smooth spatial x spectral gains, 14-in-16)
    base = rng.normal(0, 1, (512, 512))
    k = np.ones(9) / 9.0
    base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, base)
    base = np.apply_along_axis(lambda c: np.convolve(c, k, "same"), 0, base)
    base = (base - base.min()) / (np.ptp(base) + 1e-9)
    gains = 0.6 + 0.8 * np.abs(np.sin(np.linspace(0.3, 5.8, 180)))[:, None, None]
    cube = np.clip((500 + 6000 * base)[None] * gains
                   + rng.normal(0, 12, (180, 512, 512)), -8192, 8191).astype(np.int16)
    cube = ((cube.view(np.uint16) >> 2) << 2).view(np.int16)
    flat = np.ascontiguousarray(np.moveaxis(cube.view(np.uint16), 0, -1)).ravel()

    bs = ck.encode(flat, 16)
    t_enc = mintime(lambda: ck.encode(flat, 16), 3)
    t_dec = mintime(lambda: ck.decode(bs, flat.size, 16), 5)
    assert np.array_equal(ck.decode(bs, flat.size, 16), flat)
    print(f"ccsds121 encode: {t_enc:.3f}s ({flat.size/t_enc/1e6:.0f} Ms/s)  "
          f"stream {len(bs)/1e6:.1f} MB")
    print(f"ccsds121 decode: {t_dec:.3f}s ({flat.size/t_dec/1e6:.0f} Ms/s)")

    # Case A-like quantized 9/7 coefficients at a mid quality
    gy, gx = np.mgrid[0:1024, 0:1024]
    tile = (np.clip(((800 + 2.5 * gy + 1.5 * gx) % 4096)[None]
                    + rng.integers(-400, 400, (4, 1024, 1024)), 0, 4095)
            .astype(np.float32))
    coefs = np.asarray(dwtk.dwt2(jnp.asarray(tile), "97", 5))
    order = wc.scan_order(1024, 1024, 5)
    from tpukit.codecs.j2k_codec import _subband_steps, base_step_for_quality
    steps = _subband_steps(1024, 1024, base_step_for_quality(35, 4095.0))
    qc = np.trunc(coefs / steps[None]).astype(np.int32)
    perm = qc.reshape(4, -1)[:, order]

    enc = [wc.bpc_encode(perm[b]) for b in range(4)]
    t_be = mintime(lambda: [wc.bpc_encode(perm[b]) for b in range(4)], 3)
    t_bd = mintime(lambda: [wc.bpc_decode(enc[b], perm.shape[1])
                            for b in range(4)], 3)
    for b in range(4):
        assert np.array_equal(wc.bpc_decode(enc[b], perm.shape[1]), perm[b])
    sz = sum(len(e) for e in enc)
    print(f"bpc encode (4 bands q35 1024^2): {t_be:.3f}s  stream {sz/1e6:.1f} MB")
    print(f"bpc decode (4 bands q35 1024^2): {t_bd:.3f}s")

    # lossless 5/3 case (deep planes)
    coefs53 = np.asarray(dwtk.dwt2(jnp.asarray(tile.astype(np.int32)), "53", 5))
    perm53 = coefs53.reshape(4, -1)[:, order]
    enc53 = [wc.bpc_encode(perm53[b]) for b in range(4)]
    t_be53 = mintime(lambda: [wc.bpc_encode(perm53[b]) for b in range(4)], 3)
    t_bd53 = mintime(lambda: [wc.bpc_decode(enc53[b], perm53.shape[1])
                              for b in range(4)], 3)
    sz53 = sum(len(e) for e in enc53)
    print(f"bpc encode lossless 5/3: {t_be53:.3f}s  stream {sz53/1e6:.1f} MB")
    print(f"bpc decode lossless 5/3: {t_bd53:.3f}s")


if __name__ == "__main__":
    main()
