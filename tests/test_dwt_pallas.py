# -*- coding: utf-8 -*-
"""Fused Pallas 9/7 DWT: parity with the jnp transform.

The kernel exists as the MEASURED answer to "would a fused Pallas
lifting kernel pay over XLA here" (docs/SCALING.md §8): on the real
chip it is bit-exact vs kernels.dwt.dwt2(..., "97") and 3.2x SLOWER
(13.1 vs 4.1 ms per 5-level canonical-stack transform) — the
interleaved-domain form Mosaic's lowering forces (no lane-strided
slicing) computes every lifting update for both parity classes and
masks half away. The suite pins the parity in interpreter mode; the
real-chip tier covers the compiled kernel.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")


def test_pallas_dwt_matches_jnp_interpret(rng):
    import jax.numpy as jnp
    from tpukit.kernels import dwt as dwtk
    from tpukit.kernels.dwt_pallas import dwt2_pallas

    x = rng.normal(0, 1000, (2, 128, 256)).astype(np.float32)
    for levels in (1, 3):
        a = np.asarray(dwtk.dwt2(jnp.asarray(x), "97", levels))
        b = np.asarray(dwt2_pallas(jnp.asarray(x), levels=levels,
                                   interpret=True))
        # same per-element arithmetic; interpreter vs XLA may contract
        # differently, so allow f32 round-off (the REAL chip measures
        # exactly 0.0 — tests/test_tpu_smoke.py)
        assert np.abs(a - b).max() <= 0.01
        # and the layout is the packed Mallat layout: energy per subband
        from tpukit.kernels.dwt import subband_slices
        for name, _, sl in subband_slices(128, 256, levels):
            np.testing.assert_allclose(
                a[(slice(None),) + sl], b[(slice(None),) + sl],
                atol=0.01, err_msg=name)
