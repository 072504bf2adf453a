# -*- coding: utf-8 -*-
"""Sweep runner: the central benchmark harness.

tpukit's redesign of reference tools/run_codec.py:374-670. The reference
spends its time in per-(tile, rate, rep) subprocesses and numpy passes;
here the whole sweep is restructured around the device:

  * each tile cube is uploaded to HBM ONCE and closed over by the metric
    programs (the reference re-reads + re-copies it per (rate, rep),
    run_codec.py:472-529);
  * the rate ladder goes through ``Codec.sweep_rates``, which transform
    codecs override to amortize the device DWT across every rate point;
  * reconstructions from device codecs STAY on device (fetched only when
    recon.tif artifacts are requested), and all (rate × rep) metric
    reductions run as one vmapped device program per tile with a single
    stacked fetch — deterministic codecs contribute one metric lane per
    rate, shared across reps;
  * quicklooks are generated from the in-memory arrays (same file
    contract as the reference's path-based flow, quicklooks.py:76-207).

The CSV outputs, directory layout, link model, resume semantics, and
quicklook artifacts match the reference contract:

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
    # "dp" or "dp,sp": shard the (rates × reps) metric ladder over a
    # device mesh (tpukit/parallel/mesh.py). Falls back to the virtual CPU
    # mesh when fewer real devices exist (SURVEY §2.3 item 3).
    mesh: Optional[str] = None
    # scene streaming: explicit rows-per-strip, or None for automatic
    # (items over stream_auto_bytes stream when the codec is strip-exact);
    # see sweep/streaming.py
    stream_rows: Optional[int] = None
    stream_auto_bytes: int = 1 << 30


def _build_mesh(spec: str):
    import jax
    from tpukit.parallel.mesh import make_mesh

    parts = [int(v) for v in str(spec).split(",") if v != ""]
    dp = parts[0]
    sp = parts[1] if len(parts) > 1 else 1
    n = dp * sp
    devices = jax.devices()
    if len(devices) < n:
        devices = jax.devices("cpu")
    if len(devices) < n:
        raise ValueError(f"--mesh {spec} needs {n} devices, "
                         f"have {len(devices)}")
    return make_mesh(devices[:n], dp=dp, sp=sp)


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


@dataclass
class _Job:
    """One (rate, rep) execution slot of the sweep."""
    ri: int
    rep: int
    run_dir: Path
    reused: bool = False
    meta: Dict[str, object] = field(default_factory=dict)
    t_wrap: float = 0.0
    bs_bytes: Optional[int] = None
    recon: object = None        # np.ndarray (host) or jax.Array (device)
    bitstreams: Optional[Dict[str, bytes]] = None
    met_index: int = -1         # lane in the tile's metric stack


def _metric_chunk(B: int, H: int, W: int) -> int:
    """Recon lanes per metric launch, bounding f32 working set ≈ 2 GiB."""
    per_lane = B * H * W * 4 * 8  # ~8 f32 temporaries per lane worst case
    return max(1, int((2 << 30) // max(per_lane, 1)))


def _metric_pass_single(jax, jnp, ref_dev, vm_dev, sam_vm_dev, lanes, chunk,
                        nod_val, has_nodata, is_caseb, data_range,
                        quality_stats_ladder, spectral_stats_ladder,
                        assemble_quality_many, assemble_spectral_many):
    """Single-device metric ladder: one vmapped launch per chunk, one
    stacked fetch (the reference computes each pair serially on host,
    run_codec.py:472-529)."""
    nod = jnp.asarray(nod_val)
    met_rows: List[Dict[str, float]] = []
    for c0 in range(0, len(lanes), chunk):
        batch = lanes[c0:c0 + chunk]
        stack = jnp.stack([jnp.asarray(x) for x in batch])
        qs = quality_stats_ladder(ref_dev, stack, vm_dev, nod, has_nodata)
        if is_caseb:
            # warn-and-continue on SAM/SID/LMSE failure (§5.3 policy,
            # reference run_codec.py:523-531)
            try:
                ss = spectral_stats_ladder(ref_dev, stack, sam_vm_dev)
                qs_h, ss_h = jax.device_get((qs, ss))
                sams = assemble_spectral_many(ss_h)
            except Exception as e:
                log(f"[WARN] SAM/SID/LMSE failed: {e}")
                qs_h = jax.device_get(qs)
                sams = [{"sam_deg": float("nan"), "sid": float("nan"),
                         "lmse": float("nan")} for _ in batch]
            mets = assemble_quality_many(qs_h, float(data_range))
            for m, s in zip(mets, sams):
                m.update(s)
        else:
            qs_h = jax.device_get(qs)
            mets = assemble_quality_many(qs_h, float(data_range))
            for m in mets:
                m.update({"sam_deg": float("nan"), "sid": float("nan"),
                          "lmse": float("nan")})
        met_rows.extend(mets)
    return met_rows


def run_sweep(cfg: SweepConfig) -> Dict[str, object]:
    import jax
    import jax.numpy as jnp
    from tpukit.metrics.quality import (assemble_quality_many,
                                        quality_stats_ladder)
    from tpukit.metrics.spectral import (assemble_spectral_many,
                                         spectral_stats_ladder)

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
    rk = None if cfg.rate_key == "none" else cfg.rate_key
    rows: List[dict] = []
    mesh_obj = _build_mesh(cfg.mesh) if cfg.mesh else None
    ladder_steps: Dict[tuple, object] = {}

    for item in items:
        tile_id = item["tile_id"]
        src_path: Path = item["path"]
        if not Path(src_path).exists():
            raise FileNotFoundError(f"Missing {src_path}")
        ds = tiff.open(src_path)
        W, H, B = ds.width, ds.height, ds.count
        dtype_name = ds.dtypes[0]

        # scene-scale items stream in bounded host memory (strip-exact
        # codecs only; reference wrappers window scenes into 512² tiles,
        # ccsds121_wrap.py:170-219)
        from tpukit.sweep.streaming import stream_plan, sweep_item_streaming
        itemsize = 2 if dtype_name in ("uint16", "int16") else 1
        rows_blk = stream_plan(cfg.codec, H, W, B, itemsize,
                               cfg.stream_rows, cfg.stream_auto_bytes)
        if rows_blk is not None:
            log(f"[STREAM] {tile_id}: {H}x{W}x{B} in {rows_blk}-row strips")
            rows.extend(sweep_item_streaming(
                cfg, ds, item, rates, rk, is_caseb, link, rows_blk,
                case_name=case_name, asset_name=asset_name))
            ds.close()
            continue

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

        # reference-side validity components (reference run_codec.py:249-263):
        # dataset mask ∧ (every REF band != nodata) ∧ user mask. The
        # recon-side nodata exclusion is folded per lane on device.
        has_nodata = nodata is not None and math.isfinite(nodata)
        vm_base = src_mask > 0
        if has_nodata:
            vm_base = vm_base & np.all(cube != nodata, axis=0)
        if valid_mask is not None:
            vm_base = vm_base & valid_mask
        sam_vm = valid_mask if valid_mask is not None else (src_mask > 0)

        # one upload per tile; every metric program closes over these.
        # In mesh mode the inputs are device_put onto the mesh sharding
        # instead (never committed to the default backend first).
        if mesh_obj is None:
            ref_dev = jnp.asarray(cube)
            vm_dev = jnp.asarray(vm_base)
            sam_vm_dev = jnp.asarray(sam_vm) if is_caseb else None

        # ---- phase 1: execute the ladder (codec work) -------------------
        jobs: Dict[tuple, _Job] = {}
        for rep in range(cfg.reps):
            fresh_ix: List[int] = []
            for ri, r in enumerate(rates):
                run_dir = (outdir / tile_id / rate_slug(rk, r)
                           / f"rep_{rep+1:02d}")
                job = _Job(ri=ri, rep=rep, run_dir=run_dir)
                recon_path = run_dir / "recon.tif"
                if cfg.write_artifacts and recon_path.exists():
                    # resume: reuse recon, zero wrapper timing
                    # (reference run_codec.py:489-492)
                    log(f"[SKIP] Reusing reconstruction: {recon_path}")
                    with tiff.open(recon_path) as rds:
                        job.recon = rds.read()
                    job.reused = True
                    bit_dir = run_dir / "bit"
                    if bit_dir.exists():
                        job.bs_bytes = sum(p.stat().st_size
                                           for p in bit_dir.rglob("*")
                                           if p.is_file())
                else:
                    fresh_ix.append(ri)
                jobs[(ri, rep)] = job

            if fresh_ix:
                specs = [RateSpec.of(rk, rates[ri]) for ri in fresh_ix]
                # dataset context for codecs that honor it (ccsds123's
                # nodata fast paths, reference ccsds123_wrap.py:175-229)
                ctx = dict(cfg.codec_opts)
                ctx.setdefault("nodata", nodata)
                ctx.setdefault("dataset_mask", src_mask)
                with MemorySampler() as ms:
                    results = cfg.codec.sweep_rates(
                        cube, dtype_name, specs,
                        keep_bitstream=cfg.keep_bitstream, **ctx)
                for ri, res in zip(fresh_ix, results):
                    if res.mem_comp_peak_bytes is None:
                        res.mem_comp_peak_bytes = ms.phase_peak_bytes("comp")
                    if res.mem_dec_peak_bytes is None:
                        res.mem_dec_peak_bytes = ms.phase_peak_bytes("dec")
                    job = jobs[(ri, rep)]
                    job.recon = res.recon
                    job.meta = res.to_meta()
                    job.t_wrap = res.t_comp_s + res.t_dec_s
                    job.bs_bytes = res.bitstream_bytes
                    job.bitstreams = res.bitstreams

        # ---- lane plan ---------------------------------------------------
        # Deterministic codecs produce identical recons across reps, so
        # fresh reps share one lane per rate (metrics AND artifacts); each
        # resumed recon (arbitrary on-disk content) gets its own lane.
        lane_of: Dict[tuple, int] = {}
        lanes: List[object] = []
        for (ri, rep), job in sorted(jobs.items()):
            key = ("reused", ri, rep) if job.reused else ("fresh", ri)
            if key not in lane_of:
                lane_of[key] = len(lanes)
                lanes.append(job.recon)
            job.met_index = lane_of[key]

        # ---- phase 2: artifacts + quicklooks (host IO, from memory) -----
        # One device fetch + quicklook render per lane; identical rep
        # artifacts are file copies of the first rep's (the content is a
        # pure function of (cube, recon) — only the phase-1 timings differ
        # per rep, and those live in the CSV, not in the artifacts).
        if cfg.write_artifacts:
            import shutil
            ql_params = None
            rgb_ix = [i - 1 for i in rgb_order]
            lane_dir_done: Dict[int, Path] = {}
            for (ri, rep), job in sorted(jobs.items()):
                run_dir = job.run_dir
                if not job.reused and job.met_index in lane_dir_done:
                    src_dir = lane_dir_done[job.met_index]
                    run_dir.mkdir(parents=True, exist_ok=True)
                    for p in src_dir.iterdir():
                        if p.is_dir():
                            shutil.copytree(p, run_dir / p.name,
                                            dirs_exist_ok=True)
                        else:
                            shutil.copyfile(p, run_dir / p.name)
                    job.bitstreams = None
                    job.recon = None   # lanes[met_index] holds the content
                    continue
                recon_host = np.asarray(job.recon)
                if not job.reused:
                    run_dir.mkdir(parents=True, exist_ok=True)
                    tiff.write_geotiff(
                        run_dir / "recon.tif", recon_host,
                        nodata=nodata, geo=geo,
                        descriptions=ds.descriptions,
                        # validity-mask passthrough (ccsds123_wrap.py:279-283)
                        mask=(src_mask if getattr(cfg.codec,
                                                  "mask_passthrough", False)
                              else None))
                    if cfg.keep_bitstream and job.bitstreams:
                        bit_dir = run_dir / "bit"
                        bit_dir.mkdir(parents=True, exist_ok=True)
                        for name, data in job.bitstreams.items():
                            (bit_dir / name).write_bytes(data)
                        job.bitstreams = None
                # quicklooks (reference run_codec.py:511-520 — regenerated
                # on every pass, including resumed reconstructions)
                if cfg.quicklooks:
                    try:
                        from tpukit.viz import quicklooks as ql
                        run_dir.mkdir(parents=True, exist_ok=True)
                        src_valid = src_mask > 0
                        if has_nodata:
                            src_valid = src_valid & (cube[0] != nodata)
                        rec_mask_all = (np.all(recon_host != nodata, axis=0)
                                        if has_nodata
                                        else np.ones((H, W), bool))
                        if cfg.ql_rgb and B >= 3:
                            if ql_params is None:
                                ql_params = ql.stretch_params_from_arrays(
                                    cube[rgb_ix].astype(np.float32),
                                    src_valid)
                            ql.write_rgb_8bit_arrays(
                                cube[rgb_ix], run_dir / "baseline_RGB8.tif",
                                ql_params, geo=geo, mask=src_mask)
                            ql.write_rgb_8bit_arrays(
                                recon_host[rgb_ix],
                                run_dir / "recon_RGB8.tif", ql_params,
                                geo=geo,
                                mask=(rec_mask_all.astype(np.uint8) * 255))
                        ql_valid = src_valid & rec_mask_all
                        if has_nodata:
                            ql_valid = ql_valid & (recon_host[0] != nodata)
                        ql.write_error_max8_arrays(
                            cube, recon_host, ql_valid, run_dir / "recon",
                            err_max_global=cfg.ql_err_global,
                            err_max_zoom=cfg.ql_err_zoom, geo=geo)
                    except Exception as e:
                        log(f"[WARN] Quicklooks failed in {run_dir}: {e}")
                if not job.reused:
                    lane_dir_done[job.met_index] = run_dir

        # ---- phase 3: metrics — one vmapped device pass per tile --------

        chunk = _metric_chunk(B, H, W)
        met_rows: List[Dict[str, float]] = []
        nod_val = np.float32(nodata if has_nodata else 0.0)

        if mesh_obj is not None:
            # sharded ladder: lanes over dp, bands over sp (falls back to
            # sp=1 when the band count doesn't divide)
            from jax.sharding import NamedSharding, PartitionSpec as P
            from tpukit.parallel.mesh import make_mesh, sharded_metric_ladder
            m = mesh_obj
            sp = m.shape["sp"]
            if B % sp != 0:
                log(f"[WARN] bands={B} not divisible by sp={sp}; "
                    f"using sp=1 for this tile")
                sp = 1
            key = (sp, has_nodata, is_caseb)
            if key not in ladder_steps:
                if sp != m.shape["sp"]:
                    m = make_mesh(m.devices.ravel(),
                                  dp=m.devices.size, sp=1)
                ladder_steps[key] = (m, sharded_metric_ladder(
                    m, has_nodata, is_caseb))
            m, step = ladder_steps[key]
            lane_sh = NamedSharding(m, P("dp", "sp", None, None))
            rep_sh = NamedSharding(m, P())
            ref_m = jax.device_put(cube, NamedSharding(m, P("sp", None, None)))
            vm_m = jax.device_put(vm_base, rep_sh)
            sam_m = jax.device_put(sam_vm, rep_sh)
            nod_m = jax.device_put(nod_val, rep_sh)
            dp = m.shape["dp"]
            for c0 in range(0, len(lanes), max(chunk, dp)):
                batch = lanes[c0:c0 + max(chunk, dp)]
                n_real = len(batch)
                pad = (-n_real) % dp
                stack_np = np.stack([np.asarray(x) for x in batch]
                                    + [np.asarray(batch[-1])] * pad)
                stack = jax.device_put(stack_np, lane_sh)
                qs, ss = step(ref_m, stack, vm_m, sam_m, nod_m)
                if is_caseb:
                    qs_h, ss_h = jax.device_get((qs, ss))
                    mets = assemble_quality_many(qs_h, float(data_range))
                    sams = assemble_spectral_many(ss_h)
                    for mm, s in zip(mets, sams):
                        mm.update(s)
                else:
                    qs_h = jax.device_get(qs)
                    mets = assemble_quality_many(qs_h, float(data_range))
                    for mm in mets:
                        mm.update({"sam_deg": float("nan"),
                                   "sid": float("nan"),
                                   "lmse": float("nan")})
                met_rows.extend(mets[:n_real])
        else:
            met_rows.extend(_metric_pass_single(
                jax, jnp, ref_dev, vm_dev, sam_vm_dev, lanes, chunk,
                nod_val, has_nodata, is_caseb, data_range,
                quality_stats_ladder, spectral_stats_ladder,
                assemble_quality_many, assemble_spectral_many))

        # ---- phase 4: rows in canonical (rate outer, rep inner) order ---
        for ri, r in enumerate(rates):
            for rep in range(cfg.reps):
                job = jobs[(ri, rep)]
                met = met_rows[job.met_index]
                meta = job.meta
                row: Dict[str, object] = {
                    "case": case_name, "asset": asset_name,
                    "codec": cfg.codec_label,
                    "rate_key": (rk or ""),
                    "rate_value": ("" if rk is None else r),
                    "tile_id": tile_id,
                    "width": W, "height": H, "bands": B,
                    "in_bytes": container_bytes,
                    "link_mbps": link.mbps, "link_eff": link.eff,
                    "t_wrap_s": job.t_wrap,
                }
                for k in ("bitstream_bytes", "cr", "bpp", "t_comp_s",
                          "t_dec_s", "mem_comp_peak_mb", "mem_dec_peak_mb",
                          "encoder", "nearlossless_eps", "near",
                          "mem_comp_peak_bytes", "mem_dec_peak_bytes"):
                    if k in meta and meta[k] is not None:
                        row[k] = meta[k]
                bs_bytes = job.bs_bytes
                if bs_bytes and bs_bytes > 0:
                    row["bitstream_bytes"] = int(bs_bytes)
                    row["bpp"] = (bs_bytes * 8.0) / (W * H * B)
                    row["cr"] = raw16_bytes / bs_bytes
                    t_link = link.t_link_s(bs_bytes)
                    row["t_link_tile_s"] = t_link
                    row["t_e2e_tile_s"] = link.t_e2e_s(
                        bs_bytes, meta.get("t_comp_s"), meta.get("t_dec_s"),
                        job.t_wrap)
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
