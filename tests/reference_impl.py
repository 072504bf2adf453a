# -*- coding: utf-8 -*-
"""Independent float64 numpy oracles for metric parity tests.

These follow the formulas documented at the cited lines of the reference
harness (tools/run_codec.py) so the device implementations can be checked
against the exact semantics the CSV contract expects.
"""

import math

import numpy as np


def mse(a, b):
    d = a.astype(np.float64) - b.astype(np.float64)
    return float(np.mean(d * d))


def psnr(a, b, data_range):
    m = mse(a, b)
    if m == 0:
        return float("inf")
    return 20.0 * math.log10(data_range) - 10.0 * math.log10(m)


def ssim_global(a, b, data_range):
    # run_codec.py:67-80
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mu_x = float(np.mean(a)); mu_y = float(np.mean(b))
    sigma_x2 = float(np.var(a)); sigma_y2 = float(np.var(b))
    sigma_xy = float(np.mean((a - mu_x) * (b - mu_y)))
    L = data_range
    C1 = (0.01 * L) ** 2; C2 = (0.03 * L) ** 2
    num = (2 * mu_x * mu_y + C1) * (2 * sigma_xy + C2)
    den = (mu_x ** 2 + mu_y ** 2 + C1) * (sigma_x2 + sigma_y2 + C2)
    if den == 0:
        return 1.0
    return max(0.0, min(1.0, num / den))


def compute_metrics_oracle(ref, tst, rng, vm=None):
    """run_codec.py:240-304 on in-memory cubes with a precomputed mask."""
    B, H, W = ref.shape
    if vm is None:
        vm = np.ones((H, W), bool)
    use_mask = bool(np.any(vm))
    psnrs, ssims, maxerrs = [], [], []
    sse_total = 0.0; n_total = 0; rng_obs = 0.0
    for i in range(B):
        A = ref[i]; R = tst[i]
        if use_mask:
            a = A[vm]; r = R[vm]
        else:
            a = A; r = R
        diff = np.abs(a.astype(np.int32) - r.astype(np.int32))
        maxerrs.append(int(diff.max()) if diff.size else 0)
        psnrs.append(psnr(a, r, rng) if a.size else float("nan"))
        ssims.append(ssim_global(a, r, rng) if a.size else float("nan"))
        d = a.astype(np.float64) - r.astype(np.float64)
        sse_total += float(np.sum(d * d)); n_total += int(a.size)
        if a.size:
            rng_obs = max(rng_obs, float(np.max(np.abs(a))), float(np.max(np.abs(r))))
    if n_total > 0:
        rng_use = float(max(rng, rng_obs))
        psnr_total = float("inf") if sse_total == 0.0 else (
            20.0 * math.log10(rng_use) - 10.0 * math.log10(sse_total / n_total))
    else:
        psnr_total = float("nan")
    out = {
        "psnr_band_avg": float(np.nanmean(psnrs)),
        "ssim_band_avg": float(np.nanmean(ssims)),
        "psnr_global": psnr_total,
        "ssim_global": float(np.nanmean(ssims)),
        "max_abs_err": int(max(maxerrs)),
        "lossless": 1 if max(maxerrs) == 0 else 0,
    }
    for i, (p, s, m) in enumerate(zip(psnrs, ssims, maxerrs), start=1):
        out[f"psnr_b{i}"] = p; out[f"ssim_b{i}"] = s; out[f"maxerr_b{i}"] = m
    return out


def sobel_mag(img):
    # run_codec.py:123-137
    img = img.astype(np.float64)
    kx = np.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], dtype=np.float64)
    ky = np.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], dtype=np.float64)
    pimg = np.pad(img, 1, mode="edge")
    H, W = img.shape
    gx = np.zeros_like(img); gy = np.zeros_like(img)
    for i in range(3):
        for j in range(3):
            gx += kx[i, j] * pimg[i:i + H, j:j + W]
            gy += ky[i, j] * pimg[i:i + H, j:j + W]
    return np.sqrt(gx * gx + gy * gy)


def sam_sid_lmse_oracle(ref, tst, vm=None):
    # run_codec.py:308-347
    B, H, W = ref.shape
    A = ref.astype(np.float64); R = tst.astype(np.float64)
    vm = np.ones((H, W), bool) if vm is None else vm.astype(bool)
    vm_flat = vm.ravel()
    A2 = A.reshape(B, -1)[:, vm_flat]
    R2 = R.reshape(B, -1)[:, vm_flat]
    n = A2.shape[1]
    if n == 0:
        return {"sam_deg": float("nan"), "sid": float("nan"), "lmse": float("nan")}
    dot = np.sum(A2 * R2, axis=0)
    na = np.sqrt(np.sum(A2 * A2, axis=0)) + 1e-12
    nr = np.sqrt(np.sum(R2 * R2, axis=0)) + 1e-12
    cosang = np.clip(dot / (na * nr), -1.0, 1.0)
    sam_deg = float(np.degrees(np.mean(np.arccos(cosang))))
    Amin = A2.min(axis=0); Rmin = R2.min(axis=0)
    Ap = A2 - Amin + 1e-12; Rp = R2 - Rmin + 1e-12
    Ap /= np.sum(Ap, axis=0, keepdims=True)
    Rp /= np.sum(Rp, axis=0, keepdims=True)
    sid = float(np.mean(np.sum(Ap * np.log((Ap + 1e-15) / (Rp + 1e-15)), axis=0) +
                        np.sum(Rp * np.log((Rp + 1e-15) / (Ap + 1e-15)), axis=0)))
    lmse_acc = 0.0
    for b in range(B):
        lmse_acc += mse(sobel_mag(A[b]), sobel_mag(R[b]))
    return {"sam_deg": sam_deg, "sid": sid, "lmse": float(lmse_acc / B)}
