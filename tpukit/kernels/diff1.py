# -*- coding: utf-8 -*-
"""Reversible spectral first-difference (diff1) over the band axis.

Device equivalents of the reference's per-band modular difference
(reference tools/codecs/ccsds121/ccsds121_wrap.py:67-85 and
tools/codecs/jpegls/jpegls_wrap.py:92-120). The reference's inverse is a
sequential per-band Python loop; here the inverse is a modular cumulative
sum over the band axis — a single associative scan on device.

Semantics preserved exactly:
  * uint16 : mod-2^16 difference / cumsum
  * int16  : same arithmetic through the uint16 bit-view
  * uint8  : mod-2^8  (the ccsds121 wrapper widens to uint16 first and
             narrows after — ccsds121_wrap.py:180-181 — which is the same
             result as direct mod-2^8)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _as_unsigned(x):
    if x.dtype == jnp.int16:
        return jax.lax.bitcast_convert_type(x, jnp.uint16), jnp.int16
    if x.dtype == jnp.int8:
        return jax.lax.bitcast_convert_type(x, jnp.uint8), jnp.int8
    return x, None


def _from_unsigned(u, signed_dtype):
    if signed_dtype is not None:
        return jax.lax.bitcast_convert_type(u, signed_dtype)
    return u


@jax.jit
def diff1_forward(cube: jax.Array) -> jax.Array:
    """R[0]=X[0]; R[b]=X[b]-X[b-1] (mod 2^N) along axis 0 of (B,H,W)."""
    u, sd = _as_unsigned(cube)
    prev = jnp.concatenate([jnp.zeros_like(u[:1]), u[:-1]], axis=0)
    r = (u - prev).astype(u.dtype)  # unsigned wrap == modular difference
    r = jnp.concatenate([u[:1], r[1:]], axis=0)
    return _from_unsigned(r, sd)


@jax.jit
def diff1_inverse(res: jax.Array) -> jax.Array:
    """X[b] = Σ_{i<=b} R[i] (mod 2^N): modular cumsum replaces the
    reference's sequential band loop (ccsds121_wrap.py:74, :84)."""
    u, sd = _as_unsigned(res)
    x = jax.lax.associative_scan(jnp.add, u, axis=0)  # wraps in unsigned
    return _from_unsigned(x.astype(u.dtype), sd)


# numpy fallbacks (host tools, full scenes on the non-device path)

def diff1_forward_np(cube: np.ndarray) -> np.ndarray:
    u = cube.view(np.uint16) if cube.dtype == np.int16 else cube
    out = u.copy()
    # unsigned subtract wraps == modular difference, no widening needed
    np.subtract(u[1:], u[:-1], out=out[1:])
    return out.view(cube.dtype)


def diff1_inverse_np(res: np.ndarray) -> np.ndarray:
    u = res.view(np.uint16) if res.dtype == np.int16 else res
    # accumulate in the native width: unsigned wraparound IS the mod-2^N
    # cumsum, and runs ~4x faster than widening to 64-bit
    out = np.add.accumulate(u, axis=0, dtype=u.dtype)
    return out.view(res.dtype)
