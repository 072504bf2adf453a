# -*- coding: utf-8 -*-
"""Sweep runner: the central benchmark harness.

tpukit's redesign of reference tools/run_codec.py:374-670. The reference
spends its time in per-(tile, rate, rep) subprocesses and numpy passes;
here each tile is loaded once into an HBM-resident cube, codecs run
in-process, and the metric suite is a fused device reduction. The CSV
outputs, directory layout, link model, resume semantics, and quicklook
artifacts match the reference contract:

  * outdir/<tile_id>/<rate_slug>/rep_XX/ with recon.tif, bit/, quicklook
    TIFs (reference :474-483)
  * resume: existing recon.tif is reused, wrapper timing zeroed (:489-492)
  * metrics.csv + metrics_mean.csv (csvio module)
  * link/E2E time accounting (:540-559)
"""

from __future__ import annotations

import math
import sys
import warnings
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

from tpukit.codecs.base import Codec, RateSpec
from tpukit.io import tiff
from tpukit.io.bitdepth import effective_data_range
from tpukit.io.manifest import guess_mask_path, load_indices
from tpukit.metrics import compute_metrics, compute_sam_sid_lmse
from tpukit.metrics.link import link_for_case
from tpukit.sweep import csvio
from tpukit.sweep.proc import MemorySampler


def log(s: str):
    print(s, flush=True, file=sys.stderr)


def rate_slug(rate_key: Optional[str], r) -> str:
    """'norate' or '<key>_<value-with-p>' (reference run_codec.py:474)."""
    if rate_key is None or rate_key == "none":
        return "norate"
    return str(rate_key).replace(" ", "") + "_" + str(r).replace(".", "p")


@dataclass
class SweepConfig:
    indices: Path
    codec: Codec
    codec_label: str
    outdir: Path
    rate_key: str = "none"
    rates: Optional[Sequence] = None
    reps: int = 1
    keep_bitstream: bool = False
    write_artifacts: bool = True          # recon.tif + quicklooks on disk
    quicklooks: bool = True
    ql_rgb: bool = False
    ql_err_global: int = 255
    ql_err_zoom: Optional[int] = None
    case: Optional[str] = None
    asset: Optional[str] = None
    link_mbps: Optional[float] = None
    link_eff: Optional[float] = None
    csv_decimal: str = ","
    codec_opts: Dict[str, object] = field(default_factory=dict)


def _normalize_rates(rate_key: str, rates) -> List:
    if rate_key == "none":
        return [None]
    out = []
    for r in (rates or []):
        try:
            if isinstance(r, str) and ("." in r or "e" in r.lower()):
                out.append(float(r))
            else:
                out.append(int(r))
        except (TypeError, ValueError):
            out.append(float(r))
    return out


def _pick_rgb_order(ds: tiff.Dataset, case_key: str) -> List[int]:
    """Case B picks RGB bands nearest λ 665/560/490 nm from band
    descriptions (reference run_codec.py:220-229); Case A uses [3,2,1]."""
    if case_key not in ("caseb", "b"):
        return [3, 2, 1]
    import re
    lams = []
    for d in (ds.descriptions or ()):
        m = re.search(r"lambda_nm\s*=\s*([0-9.]+)", d or "")
        lams.append(float(m.group(1)) if m else np.nan)
    arr = np.asarray(lams, float)
    if arr.size == 0 or not np.isfinite(arr).any():
        return [3, 2, 1]
    def nb(t):
        return int(np.nanargmin(np.abs(arr - t))) + 1
    return [nb(665.0), nb(560.0), nb(490.0)]


def run_sweep(cfg: SweepConfig) -> Dict[str, object]:
    outdir = Path(cfg.outdir).resolve()
    outdir.mkdir(parents=True, exist_ok=True)

    case_name, asset_name, items = load_indices(Path(cfg.indices))
    if cfg.case:
        case_name = cfg.case
    if cfg.asset:
        asset_name = cfg.asset
    case_key = str(case_name).lower()
    is_caseb = case_key in ("caseb", "b")

    link = link_for_case(case_name, cfg.link_mbps, cfg.link_eff)
    rates = _normalize_rates(cfg.rate_key, cfg.rates)
    rows: List[dict] = []

    for item in items:
        tile_id = item["tile_id"]
        src_path: Path = item["path"]
        if not Path(src_path).exists():
            raise FileNotFoundError(f"Missing {src_path}")
        ds = tiff.open(src_path)
        W, H, B = ds.width, ds.height, ds.count
        dtype_name = ds.dtypes[0]
        cube = ds.read()
        src_mask = ds.dataset_mask()
        nodata = ds.nodata
        geo = ds.geo
        rgb_order = _pick_rgb_order(ds, case_key)
        data_range = effective_data_range(cube, dtype_name)

        # user validity mask (explicit in manifest or <stem>_mask sibling)
        mask_path = item.get("mask") or guess_mask_path(src_path)
        valid_mask = None
        if mask_path and Path(mask_path).exists():
            try:
                with tiff.open(mask_path) as m:
                    mv = m.read(1) > 0
                if mv.shape == (H, W):
                    valid_mask = mv
                else:
                    warnings.warn(f"Mask {mask_path} shape mismatch; ignored.")
            except Exception:
                warnings.warn(f"Failed to read mask {mask_path}; ignored.")

        bytes_per_sample = 2 if dtype_name in ("uint16", "int16") else 1
        container_bytes = int(W * H * B * bytes_per_sample)
        raw16_bytes = int(W * H * B * 16 // 8)

        ql_params = None
        for r in rates:
            rk = None if cfg.rate_key == "none" else cfg.rate_key
            slug = rate_slug(rk, r)
            for rep in range(cfg.reps):
                run_dir = outdir / tile_id / slug / f"rep_{rep+1:02d}"
                recon_path = run_dir / "recon.tif"
                reused = False
                if cfg.write_artifacts and recon_path.exists():
                    log(f"[SKIP] Reusing reconstruction: {recon_path}")
                    with tiff.open(recon_path) as rds:
                        recon = rds.read()
                    meta: Dict[str, object] = {}
                    t_wrap = 0.0
                    bs_bytes = None
                    bit_dir = run_dir / "bit"
                    if bit_dir.exists():
                        bs_bytes = sum(p.stat().st_size
                                       for p in bit_dir.rglob("*") if p.is_file())
                    reused = True
                else:
                    with MemorySampler() as ms:
                        result = cfg.codec.run(
                            cube, dtype_name, RateSpec.of(rk, r),
                            keep_bitstream=cfg.keep_bitstream, **cfg.codec_opts)
                    if result.mem_comp_peak_bytes is None:
                        result.mem_comp_peak_bytes = ms.peak_bytes
                    if result.mem_dec_peak_bytes is None:
                        result.mem_dec_peak_bytes = ms.peak_bytes
                    recon = result.recon
                    meta = result.to_meta()
                    t_wrap = result.t_comp_s + result.t_dec_s
                    bs_bytes = result.bitstream_bytes
                    if cfg.write_artifacts:
                        run_dir.mkdir(parents=True, exist_ok=True)
                        tiff.write_geotiff(recon_path, recon, nodata=nodata,
                                           geo=geo,
                                           descriptions=ds.descriptions)
                        if cfg.keep_bitstream and result.bitstreams:
                            bit_dir = run_dir / "bit"
                            bit_dir.mkdir(parents=True, exist_ok=True)
                            for name, data in result.bitstreams.items():
                                (bit_dir / name).write_bytes(data)

                # quicklooks (reference run_codec.py:511-520 — regenerated
                # on every pass, including resumed reconstructions)
                if cfg.quicklooks and cfg.write_artifacts:
                    try:
                        from tpukit.viz import quicklooks as ql
                        run_dir.mkdir(parents=True, exist_ok=True)
                        if cfg.ql_rgb and B >= 3:
                            if ql_params is None:
                                ql_params = ql.stretch_params_from_baseline(
                                    src_path, rgb_order=rgb_order)
                            ql.write_rgb_8bit(src_path,
                                              run_dir / "baseline_RGB8.tif",
                                              ql_params, rgb_order=rgb_order)
                            ql.write_rgb_8bit(recon_path,
                                              run_dir / "recon_RGB8.tif",
                                              ql_params, rgb_order=rgb_order)
                        ql.write_error_max8(src_path, recon_path,
                                            run_dir / "recon",
                                            err_max_global=cfg.ql_err_global,
                                            err_max_zoom=cfg.ql_err_zoom)
                    except Exception as e:
                        log(f"[WARN] Quicklooks failed in {run_dir}: {e}")

                # metrics (device)
                met = compute_metrics(cube, recon, dtype_name=dtype_name,
                                      valid=valid_mask, nodata=nodata,
                                      ref_mask=src_mask,
                                      data_range=data_range)
                if is_caseb:
                    try:
                        if valid_mask is not None:
                            vm = valid_mask
                        else:
                            vm = src_mask > 0
                        met.update(compute_sam_sid_lmse(cube, recon, vm))
                    except Exception as e:
                        log(f"[WARN] SAM/SID/LMSE failed: {e}")
                        met.update({"sam_deg": float("nan"), "sid": float("nan"),
                                    "lmse": float("nan")})
                else:
                    met.update({"sam_deg": float("nan"), "sid": float("nan"),
                                "lmse": float("nan")})

                row: Dict[str, object] = {
                    "case": case_name, "asset": asset_name,
                    "codec": cfg.codec_label,
                    "rate_key": (rk or ""), "rate_value": ("" if rk is None else r),
                    "tile_id": tile_id,
                    "width": W, "height": H, "bands": B,
                    "in_bytes": container_bytes,
                    "link_mbps": link.mbps, "link_eff": link.eff,
                    "t_wrap_s": t_wrap,
                }
                for k in ("bitstream_bytes", "cr", "bpp", "t_comp_s", "t_dec_s",
                          "mem_comp_peak_mb", "mem_dec_peak_mb", "encoder",
                          "nearlossless_eps", "near",
                          "mem_comp_peak_bytes", "mem_dec_peak_bytes"):
                    if k in meta and meta[k] is not None:
                        row[k] = meta[k]
                if bs_bytes and bs_bytes > 0:
                    row["bitstream_bytes"] = int(bs_bytes)
                    row["bpp"] = (bs_bytes * 8.0) / (W * H * B)
                    row["cr"] = raw16_bytes / bs_bytes
                    t_link = link.t_link_s(bs_bytes)
                    row["t_link_tile_s"] = t_link
                    t_enc = meta.get("t_comp_s")
                    t_dec = meta.get("t_dec_s")
                    row["t_e2e_tile_s"] = link.t_e2e_s(bs_bytes, t_enc, t_dec, t_wrap)
                row.update(met)
                rows.append(row)
        ds.close()

    metrics_csv = csvio.write_metrics_csv(outdir / "metrics.csv", rows,
                                          cfg.csv_decimal)
    log(f"[OK] Wrote CSV: {metrics_csv.as_posix()} ({len(rows)} rows)")
    mean_csv = None
    if cfg.reps > 1 and rows:
        mean_csv = csvio.write_mean_csv(outdir / "metrics_mean.csv", rows,
                                        cfg.csv_decimal)
        log(f"[OK] Wrote aggregated CSV: {mean_csv.as_posix()}")
    return {"rows": rows, "metrics_csv": metrics_csv, "mean_csv": mean_csv}
