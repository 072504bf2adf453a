# -*- coding: utf-8 -*-
"""Fused Pallas 9/7 DWT: the lifting ladder as two VMEM-resident kernels
per level instead of XLA's ~16 unfused HBM passes.

Why this exists (SCALING §8): the chained-probe measurement showed the
XLA lifting at ~2.8 ms per 5-level transform of the canonical band
stack — far from the HBM roofline because every one of the eight 1-D
lifting steps per level re-touches the array in HBM. Here a whole 1-D
pass (4 lifting steps + scaling) runs fused over a block that lives in
VMEM, so each level costs two kernel read+write rounds plus one XLA
deinterleave/pack pass instead of ~sixteen HBM passes.

Kernel form: the lifting runs in the INTERLEAVED domain — each step
updates one parity class from full-width shifted neighbours with the
whole-point mirror (index -1 ≡ 1, n ≡ n-2) — because Mosaic does not
lower lane-axis strided slicing (x[:, 0::2] is a gather). Per element
this is the identical arithmetic to the split-domain lifting in
``kernels.dwt._fwd97_1d`` (the same equivalence the native row-wise
lifting in j2k_synth.cpp relies on, where it is pinned bit-exact in
f64); values agree with ``kernels.dwt.dwt2(..., "97")`` to f32
round-off, and the packed Mallat layout is identical.

Scope: irreversible 9/7 (f32), forward, even-sized H and W. The
canonical codec paths keep the jnp transform — this kernel is the
measured answer to "would Pallas pay on the DWT", exposed as
:func:`dwt2_pallas` for workloads where a standalone fast transform
matters.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_A97 = -1.586134342059924
_B97 = -0.052980118572961
_G97 = 0.882911075530934
_D97 = 0.443506852043971
_K97 = 1.230174104914001


def _lift_interleaved(x, axis: int):
    """Forward 9/7 lifting of an interleaved (even, odd, even, ...) axis:
    alpha on odd, beta on even, gamma on odd, delta on even, then the
    dwt2 scaling convention (even *K, odd /K). Neighbours are full-width
    shifts with the whole-point mirror; each step writes one parity
    class while reading only the other, so the masked in-place form is
    per-element identical to the split-domain lifting."""
    n = x.shape[axis]
    par = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis) % 2

    def nb(a):
        left = jnp.concatenate(
            [jax.lax.slice_in_dim(a, 1, 2, 1, axis),
             jax.lax.slice_in_dim(a, 0, n - 1, 1, axis)], axis=axis)
        right = jnp.concatenate(
            [jax.lax.slice_in_dim(a, 1, n, 1, axis),
             jax.lax.slice_in_dim(a, n - 2, n - 1, 1, axis)], axis=axis)
        return left + right

    def step(a, parity, c):
        return jnp.where(par == parity, a + c * nb(a), a)

    x = step(x, 1, _A97)
    x = step(x, 0, _B97)
    x = step(x, 1, _G97)
    x = step(x, 0, _D97)
    return jnp.where(par == 0, x * _K97, x / _K97)


def _hkernel(x_ref, o_ref):
    """Horizontal lifting over a (1, R, W) row block, interleaved out."""
    o_ref[0, :, :] = _lift_interleaved(x_ref[0, :, :], axis=1)


def _vkernel(x_ref, o_ref):
    """Vertical lifting over a (1, H, C) column block, interleaved out."""
    o_ref[0, :, :] = _lift_interleaved(x_ref[0, :, :], axis=0)


def _level97(x, rblk: int = 256, cblk: int = 256, interpret: bool = False):
    """One fused 2-D 9/7 analysis level of a (B, h, w) f32 stack:
    horizontal kernel, vertical kernel (both interleaved-domain), then
    one XLA deinterleave into the packed [LL|HL; LH|HH] layout — the
    same output as kernels.dwt._dwt2_once(x, "97")."""
    B, h, w = x.shape

    def fit(n, blk):
        # largest divisor of n that is <= blk (n itself when n <= blk) —
        # any even size works, not just multiples of the preferred block
        if n <= blk:
            return n
        for c in range(blk, 0, -1):
            if n % c == 0:
                return c
        return n
    rblk = fit(h, rblk)
    cblk = fit(w, cblk)

    xh = pl.pallas_call(
        _hkernel,
        grid=(B, h // rblk),
        in_specs=[pl.BlockSpec((1, rblk, w), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, rblk, w), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, h, w), jnp.float32),
        interpret=interpret,
    )(x)
    xv = pl.pallas_call(
        _vkernel,
        grid=(B, w // cblk),
        in_specs=[pl.BlockSpec((1, h, cblk), lambda b, j: (b, 0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, cblk), lambda b, j: (b, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, h, w), jnp.float32),
        interpret=interpret,
    )(xh)
    # pack (XLA): quadrants from the doubly-interleaved result
    ll = xv[:, 0::2, 0::2]
    hl = xv[:, 0::2, 1::2]
    lh = xv[:, 1::2, 0::2]
    hh = xv[:, 1::2, 1::2]
    top = jnp.concatenate([ll, hl], axis=-1)
    bot = jnp.concatenate([lh, hh], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


@partial(jax.jit, static_argnames=("levels", "interpret"))
def dwt2_pallas(x: jax.Array, levels: int = 3,
                interpret: bool = False) -> jax.Array:
    """Multilevel fused 9/7 DWT, packed Mallat layout — drop-in for
    ``kernels.dwt.dwt2(x, "97", levels)`` up to f32 round-off."""
    x = x.astype(jnp.float32)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    H, W = x.shape[-2], x.shape[-1]
    if H % (1 << levels) or W % (1 << levels):
        raise ValueError(
            f"H and W must be divisible by 2^levels "
            f"(got {H}x{W} at levels={levels}) — same even-size contract "
            f"as kernels.dwt.dwt2 on framework tiles")
    out = x
    for lv in range(levels):
        h, w = H >> lv, W >> lv
        sub = out[..., :h, :w]
        sub = _level97(sub, interpret=interpret)
        out = out.at[..., :h, :w].set(sub)
    return out[0] if squeeze else out
