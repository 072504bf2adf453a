# -*- coding: utf-8 -*-
"""Bit-depth packing ops: 12-in-16 rounding and k-LSB truncation.

Device (jnp) and host (np) implementations of the reference's two bit-depth
reductions:

  * ``to_12in16`` — round uint16 DN to multiples of 16, keeping 12 effective
    bits in 16-bit storage: ``(x + 8) >> 4 << 4``
    (reference tools/make_baseline_A.py:137-170, the rounding at :167).
  * ``trunc_klsb`` — zero the k least-significant bits: ``(u >> k) << k``
    applied through a uint16 bit-view so int16 inputs truncate on raw bits
    (reference tools/make_baseline_B.py:281-316, int16 view at :303-312).
"""

from __future__ import annotations

import numpy as np

try:
    import jax.numpy as jnp
except Exception:  # pragma: no cover
    jnp = None


def to_12in16(x):
    """Round uint16 samples to multiples of 16 (12 effective bits).

    Accepts numpy or jax arrays; stays in uint16. The +8 makes it
    round-to-nearest rather than floor (ties round up), exactly as
    reference make_baseline_A.py:167.
    """
    xp = jnp if (jnp is not None and not isinstance(x, np.ndarray)) else np
    u = x.astype(xp.uint16)
    return (((u + xp.uint16(8)) >> 4) << 4).astype(xp.uint16)


def trunc_klsb(x, k: int):
    """Zero the k LSBs of 16-bit samples through an unsigned bit-view.

    int16 input is reinterpreted as uint16, truncated, and reinterpreted
    back, preserving the reference's exact semantics for negative DN
    (make_baseline_B.py:303-312). k<=0 is the identity
    (make_baseline_B.py:282-283).
    """
    if k <= 0:
        return x
    if jnp is not None and not isinstance(x, np.ndarray):
        if x.dtype == jnp.int16:
            u = jax_bitcast(x, jnp.uint16)
            return jax_bitcast((u >> k) << k, jnp.int16)
        u = x.astype(jnp.uint16)
        return (((u >> k) << k)).astype(x.dtype)
    x = np.asarray(x)
    if x.dtype == np.int16:
        u = x.view(np.uint16)
        return (((u >> k) << k).astype(np.uint16)).view(np.int16)
    u = x.astype(np.uint16, copy=False)
    return (((u >> k) << k).astype(np.uint16)).astype(x.dtype, copy=False)


def jax_bitcast(x, dtype):
    import jax
    return jax.lax.bitcast_convert_type(x, dtype)


def effective_data_range(arr: np.ndarray, dtype_name: str) -> int:
    """Peak estimate for PSNR/SSIM from dtype + bit-packing heuristics.

    Port of reference tools/run_codec.py:86-117:
      uint8 -> 255; uint16 with all samples multiple of 16 and max <= 4095*16
      -> 4095 (12-in-16); other uint16 -> 65535; int16 with 2 zero LSBs in
      [-8192, 8191] -> 8191 (14-in-16); other int16 -> max(|min|, |max|).
    """
    if dtype_name == "uint8":
        return 255
    a = np.asarray(arr)
    if dtype_name == "uint16":
        au = a.astype(np.uint16, copy=False)
        mx = int(au.max()) if au.size else 0
        is_12in16 = not np.any((au & 0xF) != 0)
        if is_12in16 and mx <= 4095 * 16:
            return 4095
        return 65535
    if dtype_name == "int16":
        ai = a.astype(np.int16, copy=False)
        mn = min(0, int(ai.min())) if ai.size else 0
        mx = max(0, int(ai.max())) if ai.size else 0
        is_14in16 = not np.any((ai & 0x3) != 0)
        if is_14in16 and mn >= -8192 and mx <= 8191:
            return 8191
        return int(max(abs(mn), abs(mx)))
    try:
        return int(np.iinfo(np.dtype(dtype_name)).max)
    except Exception:
        return 65535
