# -*- coding: utf-8 -*-
"""Exact on-device size model for the embedded bit-plane coder.

`native/src/bitplane.cpp` streams, per plane p (MSB→LSB):
  * one gate bit per not-yet-active group (activates when topg == p),
  * one significance bit per still-insignificant member of active groups,
    plus a sign bit for members that become significant at p,
  * one refinement bit per previously-significant coefficient.

Because every bit's plane membership is a closed-form function of the
coefficient's MSB index and its group's top plane, the total stream length
needs NO per-plane loop — it is a pure O(n) reduction:

  gates   = Σ_g (nplanes − max(topg_g, 0))        (gate-0 runs + the gate-1)
  members = Σ_i (topg_{g(i)} − max(msb_i, 0) + 1)  for groups with topg ≥ 0
  signs   = #{i : mag_i > 0}
  refine  = Σ_i max(msb_i, 0)

  bytes = 1 + ceil((gates+members+signs+refine) / 8)

This is the TPU-native "quantized-coefficient model" for the J2K /
CCSDS-122 codecs (SURVEY §2.3): rate ladders and rate-target searches can
price candidate quantizations entirely on device, with byte-exact
agreement with the host coder (tested in tests/test_bitplane_model.py).
The reference has no counterpart — its BPE/OpenJPEG rate control is
trial-encode-per-point in external binaries (ccsds122_wrap.py:110-121,
j2k_wrap.py:79-105).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

GROUP = 16  # must match bitplane.cpp


def _msb_index(mag: jax.Array) -> jax.Array:
    """31 - clz(mag); -1 for zero (matches bitplane.cpp msb_index)."""
    return 31 - jax.lax.clz(mag.astype(jnp.uint32)).astype(jnp.int32)


def bpc_size_bits(coefs: jax.Array, valid: jax.Array | None = None) -> jax.Array:
    """Exact bit count (excluding the 1-byte header) of bpc_encode over the
    last axis of ``coefs`` (int32, already in scan order). Leading axes are
    batch. ``valid`` masks padded tail entries (True = real coefficient);
    pad with zeros AND mark them invalid.
    """
    mag = jnp.abs(coefs).astype(jnp.uint32)
    if valid is None:
        w = jnp.ones(coefs.shape[-1], jnp.int32)
    else:
        w = valid.astype(jnp.int32)
    w = jnp.broadcast_to(w, coefs.shape)

    n = coefs.shape[-1]
    pad = (-n) % GROUP
    if pad:
        zpad = [(0, 0)] * (coefs.ndim - 1) + [(0, pad)]
        mag = jnp.pad(mag, zpad)
        w = jnp.pad(w, zpad)
    g = mag.shape[-1] // GROUP
    magg = mag.reshape(mag.shape[:-1] + (g, GROUP))
    wg = w.reshape(w.shape[:-1] + (g, GROUP))

    msb = _msb_index(magg)                      # (..., g, GROUP); -1 for 0
    topg = jnp.max(jnp.where(wg > 0, msb, -1), axis=-1)   # (..., g)
    nplanes = jnp.maximum(jnp.max(topg, axis=-1) + 1, 0)  # (...,)

    gates = jnp.sum(nplanes[..., None] - jnp.maximum(topg, 0), axis=-1)
    act = (topg >= 0)[..., None]                # group ever activates
    members = jnp.sum(
        jnp.where(act & (wg > 0),
                  topg[..., None] - jnp.maximum(msb, 0) + 1, 0),
        axis=(-2, -1))
    signs = jnp.sum((magg > 0) & (wg > 0), axis=(-2, -1)).astype(jnp.int32)
    refine = jnp.sum(jnp.where(wg > 0, jnp.maximum(msb, 0), 0),
                     axis=(-2, -1))
    # int32 is ample: one band's stream is < 2^31 bits (256 MB) by far
    return gates + members + signs + refine


def bpc_size_bytes(coefs: jax.Array, valid: jax.Array | None = None) -> jax.Array:
    """Exact byte length of bpc_encode (header byte included)."""
    bits = bpc_size_bits(coefs, valid)
    return 1 + (bits + 7) // 8


def bpc_size_bytes_host(coefs: np.ndarray) -> np.ndarray:
    """Host convenience wrapper (jits on default backend)."""
    return np.asarray(jax.jit(bpc_size_bytes)(jnp.asarray(coefs)))
