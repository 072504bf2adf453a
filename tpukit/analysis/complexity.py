# -*- coding: utf-8 -*-
"""Tile complexity analytics on device.

JAX redesign of reference tools/utils/tile_complexity.py — the metrics used
to select HC/LC tiles:

  * Redies-style gradient complexity: per-band finite-difference |∇|,
    per-pixel max across bands, mean/std ignoring nodata (:80-102)
  * Fourier metrics on the composite (band-summed, mean-removed) power
    spectrum: HF ratio above a radial cutoff, radial-profile MDF/MNF and
    the 1/f^alpha log-log slope (:107-217)
  * delentropy: Shannon entropy of the 2-D gradient histogram of the
    per-pixel max-across-bands proxy (:222-257)

All heavy stages (gradients, FFTs, radial binning via segment sums, the
2-D histogram) run as one jitted program per tile.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def finite_diff_grad(img: jax.Array):
    """Centered differences inside, one-sided at borders (reference :62-78)."""
    gx_mid = (img[..., :, 2:] - img[..., :, :-2]) * 0.5
    gx = jnp.concatenate([
        (img[..., :, 1:2] - img[..., :, 0:1]),
        gx_mid,
        (img[..., :, -1:] - img[..., :, -2:-1])], axis=-1)
    gy_mid = (img[..., 2:, :] - img[..., :-2, :]) * 0.5
    gy = jnp.concatenate([
        (img[..., 1:2, :] - img[..., 0:1, :]),
        gy_mid,
        (img[..., -1:, :] - img[..., -2:-1, :])], axis=-2)
    return gx, gy


@partial(jax.jit, static_argnames=("nbins_radial", "delent_bins"))
def _compute_device(arr: jax.Array, valid: jax.Array, hf_cut: float,
                    nbins_radial: int, alpha_fit_min: float,
                    alpha_fit_max: float, delent_bins: int,
                    delent_clip_pct: float) -> Dict[str, jax.Array]:
    B, H, W = arr.shape
    a = arr.astype(jnp.float32)
    v = valid.astype(jnp.float32)
    nv = jnp.sum(v)
    nv_safe = jnp.maximum(nv, 1.0)

    # ---- gradient complexity ----
    # The reference NaN-masks nodata before differencing
    # (tile_complexity.py gradient_complexity), so gradients that touch an
    # invalid pixel are excluded from the statistics. Equivalent masked
    # form: zero-fill invalid samples and keep only gradients whose whole
    # finite-difference stencil (a 3x3 cross, edge-replicated) is valid.
    af = jnp.where(valid[None], a, 0.0)
    gx, gy = finite_diff_grad(af)
    vp = jnp.pad(valid, 1, mode="edge")
    gvalid = (vp[1:-1, 1:-1] & vp[:-2, 1:-1] & vp[2:, 1:-1]
              & vp[1:-1, :-2] & vp[1:-1, 2:])
    gv = gvalid.astype(jnp.float32)
    ngv = jnp.maximum(jnp.sum(gv), 1.0)
    mag = jnp.sqrt(gx * gx + gy * gy)
    max_mag = jnp.max(jnp.where(gvalid[None], mag, -jnp.inf), axis=0)
    max_mag = jnp.where(gvalid, max_mag, 0.0)
    gmean = jnp.sum(max_mag * gv) / ngv
    gvar = jnp.sum((max_mag - gmean) ** 2 * gv) / ngv
    grad_mean = gmean
    grad_std = jnp.sqrt(gvar)

    # ---- composite power spectrum ----
    band_mean = jnp.sum(a * v[None], axis=(1, 2)) / nv_safe
    filled = jnp.where(valid[None], a, band_mean[:, None, None])
    filled = filled - jnp.mean(filled, axis=(1, 2), keepdims=True)
    F = jnp.fft.fft2(filled)
    P = jnp.sum(F.real * F.real + F.imag * F.imag, axis=0)
    total_power = jnp.sum(P)
    ps_median = jnp.median(P)
    ps_mean = jnp.mean(P)

    fy = jnp.fft.fftfreq(H)
    fx = jnp.fft.fftfreq(W)
    R = jnp.sqrt(fy[:, None] ** 2 + fx[None, :] ** 2)

    hf_power = jnp.sum(jnp.where(R >= hf_cut, P, 0.0))
    hf_ratio = hf_power / jnp.maximum(total_power, 1e-30)

    # radial profile via segment sums
    rmax = jnp.max(R)
    binw = rmax / nbins_radial
    # digitize semantics of the reference: bin i covers (edges[i], edges[i+1]]
    idx = jnp.clip(jnp.ceil(R / jnp.maximum(binw, 1e-12)).astype(jnp.int32) - 1,
                   0, nbins_radial - 1)
    Pr_sum = jax.ops.segment_sum(P.ravel(), idx.ravel(), nbins_radial)
    Cnt = jax.ops.segment_sum(jnp.ones_like(P.ravel()), idx.ravel(), nbins_radial)
    Pr = Pr_sum / jnp.maximum(Cnt, 1.0)
    r_centers = (jnp.arange(nbins_radial) + 0.5) * binw

    cumsum = jnp.cumsum(Pr)
    mdf = jnp.interp(0.5 * cumsum[-1], cumsum, r_centers)
    mnf = jnp.sum(r_centers * Pr) / jnp.maximum(jnp.sum(Pr), 1e-30)

    # alpha: slope of log10(Pr) vs log10(r) in the fit window
    fit_mask = ((r_centers >= alpha_fit_min) & (r_centers <= alpha_fit_max)
                & (Pr > 0))
    nfit = jnp.sum(fit_mask)
    x = jnp.where(fit_mask, jnp.log10(jnp.maximum(r_centers, 1e-12)), 0.0)
    y = jnp.where(fit_mask, jnp.log10(jnp.maximum(Pr, 1e-30)), 0.0)
    n = jnp.maximum(nfit.astype(jnp.float32), 1.0)
    xm = jnp.sum(x) / n
    ym = jnp.sum(y) / n
    sxx = jnp.sum(jnp.where(fit_mask, (x - xm) ** 2, 0.0))
    sxy = jnp.sum(jnp.where(fit_mask, (x - xm) * (y - ym), 0.0))
    slope = sxy / jnp.maximum(sxx, 1e-30)
    alpha = jnp.where(nfit >= 5, -slope, 0.0)

    # ---- delentropy on the per-pixel max band ----
    gray = jnp.max(jnp.where(valid[None], a, -jnp.inf), axis=0)
    gmean2 = jnp.sum(jnp.where(valid, gray, 0.0) * v) / nv_safe
    gray = jnp.where(valid, gray, gmean2)
    Gx, Gy = finite_diff_grad(gray)
    absg = jnp.concatenate([jnp.abs(Gx).ravel(), jnp.abs(Gy).ravel()])
    lim = jnp.percentile(absg, delent_clip_pct)
    lim = jnp.where(lim > 0, lim, 1.0)
    gxc = jnp.clip(Gx.ravel(), -lim, lim)
    gyc = jnp.clip(Gy.ravel(), -lim, lim)
    # histogram2d with bin edges linspace(-lim, lim, bins+1)
    scale = delent_bins / (2 * lim)
    bi = jnp.clip(((gxc + lim) * scale).astype(jnp.int32), 0, delent_bins - 1)
    bj = jnp.clip(((gyc + lim) * scale).astype(jnp.int32), 0, delent_bins - 1)
    flat = bi * delent_bins + bj
    H2 = jax.ops.segment_sum(jnp.ones_like(gxc), flat,
                             delent_bins * delent_bins)
    total = jnp.sum(H2)
    pr = H2 / jnp.maximum(total, 1.0)
    logp = jnp.where(pr > 0, jnp.log2(jnp.maximum(pr, 1e-30)), 0.0)
    delentropy = -jnp.sum(pr * logp)

    return {
        "grad_mean": grad_mean, "grad_std": grad_std,
        "hf_ratio": hf_ratio, "ps_median": ps_median, "ps_mean": ps_mean,
        "mdf": mdf, "mnf": mnf, "alpha": alpha,
        "delentropy_bits": delentropy,
        "total_power": total_power,
    }


def compute_all_arrays(arr: np.ndarray, nodata: Optional[float] = None,
                       hf_cut: float = 0.30, nbins_radial: int = 256,
                       alpha_fit_min: float = 0.02, alpha_fit_max: float = 0.45,
                       delent_bins: int = 256,
                       delent_clip_pct: float = 99.0) -> Dict[str, float]:
    """All complexity metrics for one (B,H,W) array (reference compute_all
    :262-288 surface, minus file I/O)."""
    arr = np.asarray(arr, dtype=np.float32)
    if nodata is not None:
        # a pixel is valid iff NO band holds nodata (the reference masks
        # per band; for real products nodata pixels are nodata in every
        # band, where the two rules coincide — pinned by test_complexity)
        valid = (arr != nodata).all(axis=0)
    else:
        valid = np.ones(arr.shape[1:], bool)
    out = _compute_device(jnp.asarray(arr), jnp.asarray(valid),
                          float(hf_cut), int(nbins_radial),
                          float(alpha_fit_min), float(alpha_fit_max),
                          int(delent_bins), float(delent_clip_pct))
    res = {k: float(v) for k, v in out.items()}
    if not np.isfinite(res["total_power"]) or res["total_power"] <= 0:
        for k in ("hf_ratio", "ps_median", "ps_mean", "mdf", "mnf", "alpha"):
            res[k] = 0.0
    res.pop("total_power")
    return res


def compute_all(path, **kw) -> Dict[str, object]:
    """File-level entry (reference :262-288): reads a GeoTIFF tile."""
    from tpukit.io import tiff
    with tiff.open(path) as ds:
        arr = ds.read(out_dtype="float32")
        meta = {"path": str(path), "width": ds.width, "height": ds.height,
                "bands": ds.count}
        nodata = ds.nodata
    out = dict(meta)
    out.update(compute_all_arrays(arr, nodata=nodata, **kw))
    return out
