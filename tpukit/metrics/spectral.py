# -*- coding: utf-8 -*-
"""Spectral-fidelity metrics for hyperspectral (Case B) cubes: SAM, SID, LMSE.

Device re-design of reference tools/run_codec.py:308-347, which materializes
two full float64 cubes and runs a Python-loop Sobel per band (the biggest
CPU sink in the reference harness per SURVEY §3.1). Here the spectral axis
is a reduction axis on device and the Sobel is a vectorized stencil over all
bands at once:

  * SAM — mean spectral angle (degrees) over valid pixels (:328-332)
  * SID — symmetric KL divergence of per-pixel positive-normalized spectra
    (:334-339)
  * LMSE — MSE of 3×3 Sobel gradient magnitudes, averaged over bands; the
    reference computes it over *all* pixels, ignoring the mask (:341-346) —
    replicated faithfully.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def sobel_mag(img: jax.Array) -> jax.Array:
    """3×3 Sobel gradient magnitude with edge padding, batched over leading
    axes. Same kernel taps as reference run_codec.py:123-137."""
    x = img.astype(jnp.float32)
    p = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)], mode="edge")

    def sh(di, dj):
        H, W = x.shape[-2], x.shape[-1]
        return jax.lax.dynamic_slice_in_dim(
            jax.lax.dynamic_slice_in_dim(p, di, H, axis=x.ndim - 2),
            dj, W, axis=x.ndim - 1)

    # kx = [[1,0,-1],[2,0,-2],[1,0,-1]], ky = kx.T-flip (run_codec.py:126-127)
    gx = (sh(0, 0) - sh(0, 2)) + 2.0 * (sh(1, 0) - sh(1, 2)) + (sh(2, 0) - sh(2, 2))
    gy = (sh(0, 0) + 2.0 * sh(0, 1) + sh(0, 2)) - (sh(2, 0) + 2.0 * sh(2, 1) + sh(2, 2))
    return jnp.sqrt(gx * gx + gy * gy)


def _sam_sid_sums(A: jax.Array, R: jax.Array, w: jax.Array):
    """Masked SAM/SID pixel sums (the per-pixel spectral reductions of
    spectral_stats, shared with the strip-streaming path)."""
    n = jnp.sum(w)

    # --- SAM (reference run_codec.py:328-332) ---
    # Mathematically identical to arccos(dot/(|a||r|)) but computed as
    # 2·atan2(‖û−v̂‖, ‖û+v̂‖) on unit spectra: stable in f32 for the small
    # angles that dominate near-lossless runs (arccos near 1 loses ~3 digits).
    na = jnp.sqrt(jnp.sum(A * A, axis=0)) + 1e-12
    nr = jnp.sqrt(jnp.sum(R * R, axis=0)) + 1e-12
    un = A / na[None]
    vn = R / nr[None]
    dnorm = jnp.sqrt(jnp.sum((un - vn) ** 2, axis=0))
    snorm = jnp.sqrt(jnp.sum((un + vn) ** 2, axis=0))
    ang = 2.0 * jnp.arctan2(dnorm, snorm)
    sam_sum = jnp.sum(ang * w)

    # --- SID (reference run_codec.py:334-339) ---
    Amin = jnp.min(A, axis=0)
    Rmin = jnp.min(R, axis=0)
    Ap = A - Amin[None] + 1e-12
    Rp = R - Rmin[None] + 1e-12
    Ap = Ap / jnp.sum(Ap, axis=0, keepdims=True)
    Rp = Rp / jnp.sum(Rp, axis=0, keepdims=True)
    log_ratio = jnp.log((Ap + 1e-15) / (Rp + 1e-15))
    sid_pix = jnp.sum(Ap * log_ratio, axis=0) - jnp.sum(Rp * log_ratio, axis=0)
    sid_sum = jnp.sum(sid_pix * w)
    return n, sam_sum, sid_sum


@jax.jit
def spectral_stats(ref: jax.Array, tst: jax.Array, valid: jax.Array) -> Dict[str, jax.Array]:
    """Device sums for SAM/SID/LMSE. ref/tst: (B,H,W); valid: (H,W) bool."""
    A = ref.astype(jnp.float32)
    R = tst.astype(jnp.float32)
    w = valid.astype(jnp.float32)
    n, sam_sum, sid_sum = _sam_sid_sums(A, R, w)

    # --- LMSE (reference run_codec.py:341-346 — unmasked by design) ---
    ea = sobel_mag(A)
    er = sobel_mag(R)
    d = ea - er
    lmse = jnp.mean(d * d)

    return {"n": n, "sam_sum": sam_sum, "sid_sum": sid_sum, "lmse": lmse}


@jax.jit
def spectral_stats_ladder(ref: jax.Array, recons: jax.Array,
                          valid: jax.Array):
    """vmap of spectral_stats over a stack of recons against one ref cube
    (the SAM/SID mask does not depend on the recon — reference
    run_codec.py:523-531 passes the baseline validity mask)."""
    return jax.vmap(lambda t: spectral_stats(ref, t, valid))(recons)


def assemble_spectral_many(stacked) -> list:
    """Stacked spectral stats fetch -> list of reference metric dicts."""
    n_arr = np.asarray(stacked["n"])
    out = []
    for i in range(len(n_arr)):
        n = float(n_arr[i])
        if n == 0:
            out.append({"sam_deg": float("nan"), "sid": float("nan"),
                        "lmse": float("nan")})
        else:
            out.append({
                "sam_deg": float(np.degrees(
                    float(np.asarray(stacked["sam_sum"])[i]) / n)),
                "sid": float(np.asarray(stacked["sid_sum"])[i]) / n,
                "lmse": float(np.asarray(stacked["lmse"])[i]),
            })
    return out


# ---------------------------------------------------------------------------
# Strip streaming: per-strip sums + merge (scene-scale sweeps)
# ---------------------------------------------------------------------------

from functools import partial as _partial


@_partial(jax.jit, static_argnames=("top", "bot", "left", "right"))
def spectral_stats_strip(ref: jax.Array, tst: jax.Array, valid: jax.Array,
                         top: int, bot: int, left: int = 0,
                         right: int = 0) -> Dict[str, jax.Array]:
    """Per-strip(-chunk) SAM/SID/LMSE sums for streamed merging.

    ref/tst are (B, rows+top+bot, cols+left+right) — the chunk plus halo
    rows/columns from the neighbouring chunks so the Sobel stencil sees the
    same neighbourhood it would in a whole-image pass (at true image edges
    the halo is 0 and edge padding applies, as in sobel_mag). ``valid``
    covers the interior only. SAM/SID are per-pixel spectral reductions,
    computed on the interior slice directly; LMSE returns a SUM plus count
    (the reference's mean over all pixels, run_codec.py:341-346, is
    reassembled by merge_spectral_stats)."""
    rows = ref.shape[1] - top - bot
    cols = ref.shape[2] - left - right

    def interior(x):
        x = jax.lax.dynamic_slice_in_dim(x, top, rows, axis=1)
        return jax.lax.dynamic_slice_in_dim(x, left, cols, axis=2)

    A = ref.astype(jnp.float32)
    R = tst.astype(jnp.float32)
    n, sam_sum, sid_sum = _sam_sid_sums(interior(A), interior(R),
                                        valid.astype(jnp.float32))
    d = interior(sobel_mag(A) - sobel_mag(R))
    return {"n": n, "sam_sum": sam_sum, "sid_sum": sid_sum,
            "lmse_sum": jnp.sum(d * d),
            "lmse_n": jnp.float32(d.size)}


def merge_spectral_stats(parts: list) -> Dict[str, float]:
    """Combine per-strip spectral sums into the reference metric dict."""
    n = sam = sid = lsum = ln = 0.0
    for p in parts:
        if p is None:
            continue
        n += float(np.asarray(p["n"], np.float64))
        sam += float(np.asarray(p["sam_sum"], np.float64))
        sid += float(np.asarray(p["sid_sum"], np.float64))
        lsum += float(np.asarray(p["lmse_sum"], np.float64))
        ln += float(np.asarray(p["lmse_n"], np.float64))
    if n == 0:
        # no valid pixels: all-NaN, matching compute_sam_sid_lmse and
        # assemble_spectral_many (the tile path's reference fallback)
        return {"sam_deg": float("nan"), "sid": float("nan"),
                "lmse": float("nan")}
    return {"sam_deg": float(np.degrees(sam / n)), "sid": sid / n,
            "lmse": (lsum / ln) if ln else float("nan")}


def compute_sam_sid_lmse(ref_cube: np.ndarray, tst_cube: np.ndarray,
                         valid: Optional[np.ndarray] = None) -> Dict[str, float]:
    """Host wrapper matching reference compute_sam_sid_lmse_caseB
    (run_codec.py:308-347): returns NaNs when no valid pixels."""
    ref_cube = np.asarray(ref_cube)
    tst_cube = np.asarray(tst_cube)
    B, H, W = ref_cube.shape
    vm = np.ones((H, W), dtype=bool) if valid is None else np.asarray(valid).astype(bool)
    s = spectral_stats(jnp.asarray(ref_cube), jnp.asarray(tst_cube), jnp.asarray(vm))
    n = float(s["n"])
    if n == 0:
        return {"sam_deg": float("nan"), "sid": float("nan"), "lmse": float("nan")}
    return {
        "sam_deg": float(np.degrees(float(s["sam_sum"]) / n)),
        "sid": float(s["sid_sum"]) / n,
        "lmse": float(s["lmse"]),
    }
