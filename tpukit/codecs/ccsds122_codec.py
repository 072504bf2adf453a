# -*- coding: utf-8 -*-
"""CCSDS-122-class codec: band-by-band DWT bit-plane coding with per-band
bpp rate control.

Behavior surface mirrors the reference wrapper
(reference tools/codecs/ccsds122/ccsds122_wrap.py):
  * band-by-band processing of the full image (:148-192)
  * rate control: per-band bpp; --cr converts via
    bits_per_sample/CR per band (:97-104)
  * an effective-lossless request (target bpp >= native bits) drops the
    rate limit entirely (:107, :121)

The transform is the standard's reversible integer 9/7M DWT (3 levels,
CCSDS 122.0-B §3.3) on device; the entropy stage is tpukit's embedded
bit-plane coder, truncated at the per-band byte budget — functionally
equivalent rate control to the BPE's `-r {bpp}` (the reference's BPE is a
user-supplied Windows binary, so bitstream-level parity is out of scope
by construction; rate/quality behavior is the contract).
"""

from __future__ import annotations

import time
from typing import Dict

import jax.numpy as jnp
import numpy as np

from tpukit.codecs.base import Codec, CodecResult, RateSpec
from tpukit.codecs import wavelet_common as wc
from tpukit.kernels import dwt as dwtk
from tpukit.sweep.proc import mem_phase

LEVELS = 3


class CCSDS122Codec(Codec):
    name = "ccsds122"
    encoder_desc = "tpukit CCSDS-122-class (device 9/7M DWT + embedded bit-plane coder)"
    supports_lossy = True

    def budget_for(self, rate: RateSpec, B: int, H: int, W: int,
                   dtype_name: str):
        """RateSpec → (target_bpp_band, per-band byte budget; 0 = lossless)
        per reference ccsds122_wrap.py:97-121."""
        bits_per_sample = 16.0 if dtype_name in ("uint16", "int16") else 8.0
        if rate.key == "bpp" and rate.value is not None:
            target_bpp_band = float(rate.value)
        elif rate.key == "cr" and rate.value is not None:
            target_bpp_band = (bits_per_sample * B / max(rate.value, 1e-6)) / B
        else:
            target_bpp_band = bits_per_sample  # effectively lossless
        lossless_req = target_bpp_band >= (bits_per_sample - 1e-9)
        budget = 0 if lossless_req else int(target_bpp_band * H * W / 8.0)
        return target_bpp_band, budget

    def sweep_rates(self, cube: np.ndarray, dtype_name: str, specs,
                    keep_bitstream: bool = False, **opts) -> list:
        """Amortized rate ladder: one device 9/7M DWT feeds every budget
        point (the bit-plane stream is embedded, so each point re-encodes
        only up to its own budget). Reconstructions stay on device."""
        specs = list(specs)
        B, H, W = cube.shape
        work, H0, W0 = wc.pad_to_multiple(cube.astype(np.int32), 1 << LEVELS)
        Hp, Wp = work.shape[-2:]
        order = wc.scan_order(Hp, Wp, LEVELS)

        t0 = time.perf_counter()
        coefs = np.asarray(dwtk.dwt2(jnp.asarray(work), "97m", LEVELS))
        perm = coefs.reshape(B, -1)[:, order]
        t_dwt = time.perf_counter() - t0

        info = np.iinfo(cube.dtype)
        inv = wc.inverse_scan_order(Hp, Wp, LEVELS)
        out = []
        for spec in specs:
            target_bpp_band, budget = self.budget_for(spec, B, H, W,
                                                      dtype_name)
            t0 = time.perf_counter()
            with mem_phase("comp"):
                encoded = [wc.bpc_encode(perm[b], budget) for b in range(B)]
            t_comp = time.perf_counter() - t0 + t_dwt
            t0 = time.perf_counter()
            with mem_phase("dec"):
                planes = np.stack([
                    wc.bpc_decode(encoded[b], Hp * Wp)[inv].reshape(Hp, Wp)
                    for b in range(B)])
                recon = jnp.clip(
                    dwtk.idwt2(jnp.asarray(planes), "97m", LEVELS)
                    [:, :H0, :W0], info.min, info.max).astype(cube.dtype)
                recon.block_until_ready()
            t_dec = time.perf_counter() - t0
            out.append(CodecResult(
                codec="ccsds122_ext", encoder=self.encoder_desc,
                bitstream_bytes=sum(len(e) for e in encoded),
                recon=recon, t_comp_s=t_comp, t_dec_s=t_dec,
                bitstreams=({f"b{b+1:02d}.bit": e
                             for b, e in enumerate(encoded)}
                            if keep_bitstream else None),
                extras={"bands": int(B),
                        "bpp_target_band": float(target_bpp_band)}))
        return out

    def run(self, cube: np.ndarray, dtype_name: str, rate: RateSpec,
            keep_bitstream: bool = False, **opts) -> CodecResult:
        B, H, W = cube.shape
        target_bpp_band, budget_bytes = self.budget_for(rate, B, H, W,
                                                        dtype_name)

        work, H0, W0 = wc.pad_to_multiple(cube.astype(np.int32), 1 << LEVELS)
        Hp, Wp = work.shape[-2:]
        order = wc.scan_order(Hp, Wp, LEVELS)

        t0 = time.perf_counter()
        with mem_phase("comp"):
            coefs = np.asarray(dwtk.dwt2(jnp.asarray(work), "97m", LEVELS))
            encoded = [wc.bpc_encode(coefs[b].ravel()[order], budget_bytes)
                       for b in range(B)]
        t_comp = time.perf_counter() - t0
        sum_bytes = sum(len(e) for e in encoded)

        t0 = time.perf_counter()
        with mem_phase("dec"):
            planes = []
            for b in range(B):
                c = np.zeros(Hp * Wp, np.int32)
                c[order] = wc.bpc_decode(encoded[b], Hp * Wp)
                planes.append(c.reshape(Hp, Wp))
            rec = np.asarray(dwtk.idwt2(jnp.asarray(np.stack(planes)),
                                        "97m", LEVELS))
            info = np.iinfo(cube.dtype)
            recon = np.clip(rec[:, :H0, :W0], info.min,
                            info.max).astype(cube.dtype)
        t_dec = time.perf_counter() - t0

        streams: Dict[str, bytes] = {}
        if keep_bitstream:
            for b, e in enumerate(encoded):
                streams[f"b{b+1:02d}.bit"] = e

        return CodecResult(
            codec="ccsds122_ext",
            encoder=self.encoder_desc,
            bitstream_bytes=sum_bytes,
            recon=recon,
            t_comp_s=t_comp,
            t_dec_s=t_dec,
            bitstreams=streams if keep_bitstream else None,
            extras={
                "bands": int(B),
                "bpp_target_band": float(target_bpp_band),
            },
        )
