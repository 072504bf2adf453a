# -*- coding: utf-8 -*-
"""CCSDS-123-class hyperspectral lossless codec, TPU-first.

The reference wraps the CNES CCSDS-123 reference binaries per 512² tile
(reference tools/codecs/ccsds123/ccsds123_wrap.py:129-153, :212-276;
lossless only, :8). Those binaries are user-supplied and the standard's
sample-adaptive LMS weight update is serial in raster order — a hostile
fit for TPU. tpukit re-designs the predictor around closed-form adaptation
instead of per-sample LMS, keeping the same structure (spatial + adaptive
inter-band prediction + mapped residuals + block-adaptive Golomb coding):

  1. spatial stage: per-band row difference on the mod-2^16 ring —
     invertible by a modular cumulative sum (one associative scan),
     not a raster-order recurrence;
  2. spectral stage: per-band least-squares weights over the 3 previous
     bands' difference planes (+bias), solved on device as tiny batched
     normal equations (MXU), quantized to 4.12 fixed point and
     *transmitted* (720 bands ≈ 1.4 kB) — prediction is pure int32
     arithmetic, so encoder and decoder agree exactly by construction;
  3. residuals zigzag-mapped on the ring to uint16 and coded with the
     CCSDS-121 block-adaptive Golomb coder (no preprocessor).

Decode is a 180-step band scan (each step fully vectorized over H×W)
plus the modular cumsum — no per-sample sequential work anywhere.
"""

from __future__ import annotations

import struct
import time
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpukit.codecs.base import Codec, CodecResult, RateSpec, device_work
from tpukit.codecs import ccsds121 as dev121
from tpukit.native import ccsds121_host
from tpukit.sweep.proc import mem_phase

P = 3              # previous bands used by the spectral predictor
FRAC_BITS = 12     # 4.12 fixed-point weights
FEAT_CLAMP = 8191  # keeps products inside int32
_MAGIC = b"TK123\x02"

_ENTROPY = dict(bits=16, block_size=16, rsi=64, flags=0)  # no preprocessor


def _signed_view(ring_u16: jax.Array) -> jax.Array:
    """uint16 ring value -> signed int32 in [-32768, 32767]."""
    s = ring_u16.astype(jnp.int32)
    return jnp.where(s >= 32768, s - 65536, s)


def _zigzag(srel: jax.Array) -> jax.Array:
    return jnp.where(srel >= 0, 2 * srel, -2 * srel - 1).astype(jnp.uint16)


def _unzigzag(m: jax.Array) -> jax.Array:
    mi = m.astype(jnp.int32)
    return jnp.where(mi % 2 == 0, mi // 2, -((mi + 1) // 2))


def _row_diff_ring(xu: jax.Array) -> jax.Array:
    """D[0]=X[0]; D[y]=X[y]-X[y-1] (mod 2^16) along rows of (B,H,W)."""
    prev = jnp.concatenate([jnp.zeros_like(xu[:, :1]), xu[:, :-1]], axis=1)
    return (xu - prev).astype(jnp.uint16)


def _row_cumsum_ring(d: jax.Array) -> jax.Array:
    return jax.lax.associative_scan(jnp.add, d, axis=1).astype(jnp.uint16)


def _features(c: jax.Array) -> jax.Array:
    """(B,4,H,W) clamped features: previous 1..3 band planes + bias."""
    B = c.shape[0]
    feats = []
    for j in range(1, P + 1):
        shifted = jnp.concatenate(
            [jnp.zeros_like(c[:j]), c[:-j]], axis=0) if j < B else jnp.zeros_like(c)
        feats.append(jnp.clip(shifted, -FEAT_CLAMP, FEAT_CLAMP))
    feats.append(jnp.ones_like(c))
    return jnp.stack(feats, axis=1)


def _predict(feats_b: jax.Array, wq_b: jax.Array) -> jax.Array:
    """Integer prediction for one band: (4,H,W) feats × (4,) 4.12 weights."""
    acc = jnp.zeros(feats_b.shape[1:], jnp.int32)
    for i in range(P + 1):
        acc = acc + feats_b[i] * wq_b[i]
    return (acc + (1 << (FRAC_BITS - 1))) >> FRAC_BITS


@jax.jit
def encode_model(xu: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Device model: (B,H,W) uint16 ring samples -> (mapped residuals u16,
    per-band int16 weights)."""
    d = _row_diff_ring(xu)
    c = _signed_view(d)
    feats = _features(c)                       # (B,4,H,W)
    B, _, H, W = feats.shape

    # LS over rows >=1 (row 0 holds raw samples, not differences)
    mask = jnp.concatenate([jnp.zeros((1, W)), jnp.ones((H - 1, W))]).astype(jnp.float32)
    F = feats.astype(jnp.float32) * mask[None, None]
    T = c.astype(jnp.float32) * mask[None]
    Fm = F.reshape(B, P + 1, H * W)
    Tm = T.reshape(B, H * W)
    M = jnp.einsum("bfn,bgn->bfg", Fm, Fm) + 1e-3 * jnp.eye(P + 1)[None]
    v = jnp.einsum("bfn,bn->bf", Fm, Tm)
    w = jnp.linalg.solve(M, v[..., None])[..., 0]   # (B, 4)
    wq = jnp.clip(jnp.round(w * (1 << FRAC_BITS)), -32767, 32767).astype(jnp.int32)

    pred = jax.vmap(_predict)(feats, wq)       # (B,H,W) int32
    resid_ring = (c - pred).astype(jnp.int32) & 0xFFFF
    srel = _signed_view(resid_ring.astype(jnp.uint16))
    mapped = _zigzag(srel)
    return mapped, wq.astype(jnp.int16)


@jax.jit
def decode_model(mapped: jax.Array, wq: jax.Array) -> jax.Array:
    """Inverse: band scan rebuilding difference planes, then modular cumsum."""
    B, H, W = mapped.shape
    srel = _unzigzag(mapped)

    def band_step(carry, inp):
        # carry: (P,H,W) previous signed difference planes (most recent first)
        prev = carry
        srel_b, wq_b = inp
        feats = [jnp.clip(prev[j], -FEAT_CLAMP, FEAT_CLAMP) for j in range(P)]
        feats.append(jnp.ones((H, W), jnp.int32))
        acc = jnp.zeros((H, W), jnp.int32)
        for i in range(P + 1):
            acc = acc + feats[i] * wq_b[i].astype(jnp.int32)
        pred = (acc + (1 << (FRAC_BITS - 1))) >> FRAC_BITS
        ring = (pred + srel_b) & 0xFFFF
        c_b = _signed_view(ring.astype(jnp.uint16))
        new_carry = jnp.concatenate([c_b[None], prev[:-1]], axis=0)
        return new_carry, c_b

    init = jnp.zeros((P, H, W), jnp.int32)
    _, c = jax.lax.scan(band_step, init, (srel, wq))
    d = (c & 0xFFFF).astype(jnp.uint16)
    return _row_cumsum_ring(d)


class CCSDS123Codec(Codec):
    """predictor='ls' (default) is tpukit's TPU-first redesign: closed-form
    least-squares band weights transmitted in the stream, device band scan
    decode. predictor='standard' codes CCSDS 123.0-B conformant streams —
    the Blue Book's sample-adaptive predictor (local sums + per-sample LMS
    weight updates) and sample-adaptive GPO2 coder with the §5.3 header
    (native/src/ccsds123std.cpp), the same algorithm the reference runs
    through the CNES enc123/dec123 binaries (ccsds123_wrap.py:8)."""

    name = "ccsds123"
    encoder_desc = ("tpukit CCSDS-123-class (LS-adaptive inter-band predictor "
                    "+ block-adaptive Golomb)")
    std_desc = ("tpukit CCSDS-123.0-B (sample-adaptive predictor + "
                "sample-adaptive GPO2)")
    supports_lossy = False
    # the reference wrapper copies the source's validity mask into the
    # reconstruction (ccsds123_wrap.py:279-283 dst.write_mask)
    mask_passthrough = True
    # independent 512² tiles: row strips on the tile grid code
    # byte-identically to the whole image — enables scene streaming
    strip_exact = True

    def __init__(self, tile: int = 512, interleave: str = "bsq",
                 crop_nodata: bool = False, predictor: str = "ls",
                 pred_bands: int = 3, pred_mode: str = "full",
                 local_sums: str = "neighbor", entropy: str = "sample"):
        """``interleave`` is the §4.2 ENCODING order in standard mode
        (bsq|bil|bip — the reference wrapper's --interleave,
        ccsds123_wrap.py:116); the ls mode's streams are order-free
        (whole-cube device model) and record it as metadata only.
        ``pred_bands`` (P, 0..15), ``pred_mode`` (full|reduced) and
        ``local_sums`` (neighbor|column) parameterize the standard
        predictor (the CNES binaries' knobs, ccsds123_wrap.py:129-153);
        the ls predictor fixes its own P=3 transmitted-weights design."""
        if predictor not in ("ls", "standard"):
            raise ValueError(f"predictor must be ls|standard, "
                             f"got {predictor!r}")
        if interleave not in ("bsq", "bil", "bip"):
            raise ValueError(f"interleave must be bsq|bil|bip, "
                             f"got {interleave!r}")
        if pred_mode not in ("full", "reduced"):
            raise ValueError(f"pred_mode must be full|reduced, "
                             f"got {pred_mode!r}")
        if local_sums not in ("neighbor", "column"):
            raise ValueError(f"local_sums must be neighbor|column, "
                             f"got {local_sums!r}")
        if not 0 <= int(pred_bands) <= 15:
            raise ValueError(f"pred_bands must be in [0, 15], "
                             f"got {pred_bands}")
        if entropy not in ("sample", "block"):
            raise ValueError(f"entropy must be sample|block, "
                             f"got {entropy!r}")
        if entropy == "block" and predictor != "standard":
            raise ValueError("entropy='block' is a standard-mode option "
                             "(the ls predictor has its own fixed "
                             "CCSDS-121 backend)")
        self.entropy = entropy
        self.tile = tile
        self.interleave = interleave
        self.crop_nodata = crop_nodata
        self.predictor = predictor
        self.pred_bands = int(pred_bands)
        self.pred_mode = pred_mode
        self.local_sums = local_sums

    @staticmethod
    def _tile_all_nodata(tile_bsq: np.ndarray, nd, mask_win) -> bool:
        """Reference _tile_is_all_nodata (ccsds123_wrap.py:191-205):
        dataset-mask window all zero wins; else every band == nodata."""
        if mask_win is not None and (np.asarray(mask_win) == 0).all():
            return True
        if nd is not None:
            return bool((tile_bsq == np.asarray(nd, tile_bsq.dtype)).all())
        return False

    def run(self, cube: np.ndarray, dtype_name: str, rate: RateSpec,
            keep_bitstream: bool = False, nodata=None, dataset_mask=None,
            **opts) -> CodecResult:
        B, H, W = cube.shape
        tile = int(self.tile) if self.tile else max(H, W)
        crop = self.crop_nodata or bool(opts.get("crop_nodata", False))
        nd = None
        if nodata is not None and np.isfinite(nodata):
            nd = nodata

        # single-tile case (the canonical 512² tile): the reconstruction
        # stays DEVICE-resident — downstream metrics/artifact phases fetch
        # it batched (or not at all), the same contract as the J2K ladder.
        # Multi-tile scenes assemble on host.
        single = tile >= H and tile >= W
        recon = None if single else np.empty_like(cube)
        # bit-packed baselines (14-in-16 etc): code (x >> k) of the k
        # exactly-zero LSBs and shift back on decode — the residual/Rice
        # stages stop paying ~k bits/sample for constant zeros
        # (base.trailing_zero_shift; carried in the tile header)
        from tpukit.codecs.base import trailing_zero_shift
        shift = trailing_zero_shift(cube)
        # HBM-resident uint16 source (rides the runner's metric upload
        # when present — shared shape/dtype adoption rules in
        # base.device_work); tiles slice from it on device. The standard
        # path is host-only (serial per-sample recurrence) — no upload.
        devw = (device_work(cube, opts, 1, "uint16")
                if self.predictor == "ls" else None)
        streams: Dict[str, bytes] = {}
        sum_bytes = 0
        t_comp = t_dec = 0.0
        skipped = 0

        for y0 in range(0, H, tile):
            for x0 in range(0, W, tile):
                th = min(tile, H - y0)
                tw = min(tile, W - x0)
                tile_bsq = cube[:, y0:y0 + th, x0:x0 + tw]

                if crop and self._tile_all_nodata(
                        tile_bsq, nd,
                        None if dataset_mask is None
                        else dataset_mask[y0:y0 + th, x0:x0 + tw]):
                    # fast path: nothing coded, recon block filled with
                    # nodata (reference ccsds123_wrap.py:218-229)
                    fill = nd if nd is not None else 0
                    if single:
                        recon = np.full(cube.shape, fill, cube.dtype)
                    else:
                        recon[:, y0:y0 + th, x0:x0 + tw] = np.asarray(
                            fill, cube.dtype)
                    skipped += 1
                    continue

                if self.predictor == "standard":
                    # CCSDS 123.0-B conformant stream: the Blue Book's
                    # sample-adaptive recurrence is serial per sample, so
                    # this path runs in-process C++ (ccsds123_std)
                    from tpukit.codecs import ccsds123_std as std
                    signed = cube.dtype == np.int16
                    t0 = time.perf_counter()
                    with mem_phase("comp"):
                        bs = std.encode(
                            np.ascontiguousarray(tile_bsq).view(np.uint16),
                            is_signed=signed, P=self.pred_bands,
                            full_mode=self.pred_mode == "full",
                            colsum=self.local_sums == "column",
                            order=self.interleave, entropy=self.entropy)
                    t_comp += time.perf_counter() - t0
                    sum_bytes += len(bs)
                    if keep_bitstream:
                        streams[f"t_x{x0:05d}_y{y0:05d}.l123"] = bs
                    t0 = time.perf_counter()
                    with mem_phase("dec"):
                        rec = std.decode(bs).view(cube.dtype)
                        if single:
                            recon = rec
                        else:
                            recon[:, y0:y0 + th, x0:x0 + tw] = rec
                    t_dec += time.perf_counter() - t0
                    continue

                t0 = time.perf_counter()
                with mem_phase("comp"):
                    xd = devw[:, y0:y0 + th, x0:x0 + tw]
                    if shift:
                        xd = xd >> shift
                    mapped, wq = encode_model(xd)
                    wq_np = np.asarray(wq)
                    plan = None
                    if mapped.size % _ENTROPY["block_size"] == 0:
                        # entropy-code ON DEVICE (pack_words with the
                        # preprocessor off — residuals are already mapped):
                        # the download is the compressed stream, not the
                        # 2-byte/sample mapped cube, and the returned plan
                        # lets the decode phase run chunk-parallel with
                        # overlapped uploads
                        stream, plan = dev121.encode_device(
                            mapped.reshape(-1), bits=_ENTROPY["bits"],
                            J=_ENTROPY["block_size"], rsi=_ENTROPY["rsi"],
                            preprocess=False, return_plan=True)
                    else:
                        stream = ccsds121_host.encode(
                            np.asarray(mapped).ravel(), **_ENTROPY)
                    header = (_MAGIC +
                              struct.pack("<BHIII", shift, P, B, th, tw) +
                              wq_np.astype("<i2").tobytes())
                    bs = header + stream
                t_comp += time.perf_counter() - t0
                sum_bytes += len(bs)
                if keep_bitstream:
                    streams[f"t_x{x0:05d}_y{y0:05d}.bit"] = bs

                t0 = time.perf_counter()
                with mem_phase("dec"):
                    rec_dev = self._decode_device(bs, B, th, tw, plan=plan)
                    if cube.dtype == np.int16:
                        rec_dev = jax.lax.bitcast_convert_type(rec_dev,
                                                               jnp.int16)
                    elif cube.dtype != np.uint16:
                        rec_dev = rec_dev.astype(cube.dtype)
                    if single:
                        recon = jax.block_until_ready(rec_dev)
                    else:
                        recon[:, y0:y0 + th, x0:x0 + tw] = np.asarray(rec_dev)
                t_dec += time.perf_counter() - t0

        total_pixels = H * W
        bpp_total = sum_bytes * 8.0 / max(total_pixels, 1)
        return CodecResult(
            codec="ccsds123_ext",
            encoder=(self.std_desc if self.predictor == "standard"
                     else self.encoder_desc),
            bitstream_bytes=sum_bytes,
            recon=recon,
            t_comp_s=t_comp,
            t_dec_s=t_dec,
            bitstreams=streams if keep_bitstream else None,
            extras={
                "mode": "lossless_only",
                "predictor": self.predictor,
                "bands": int(B), "dtype": dtype_name, "tile": int(tile),
                "bpp_effective_total": float(bpp_total),
                "bpp_effective_per_band": float(bpp_total / max(B, 1)),
                "interleave": self.interleave,
                "tiles_skipped_nodata": int(skipped),
                **({"pred_bands": self.pred_bands,
                    "pred_mode": self.pred_mode,
                    "local_sums": self.local_sums,
                    "entropy": self.entropy}
                   if self.predictor == "standard" else {}),
            },
        )

    @staticmethod
    def _decode_device(bs: bytes, B: int, H: int, W: int,
                       plan=None) -> jax.Array:
        """Decode to a DEVICE-resident (B,H,W) uint16 ring cube. With an
        encode plan (chunk bit offsets), the host entropy decode runs
        chunk-by-chunk with each chunk's device upload started as soon as
        it lands — the upload hides the host decode entirely."""
        if bs[:len(_MAGIC)] != _MAGIC:
            raise ValueError("bad TK123 stream")
        off = len(_MAGIC)
        shift, p, b, h, w = struct.unpack_from("<BHIII", bs, off)
        off += struct.calcsize("<BHIII")
        if (p, b, h, w) != (P, B, H, W):
            raise ValueError("geometry mismatch")
        wq = np.frombuffer(bs, "<i2", count=B * (P + 1), offset=off)
        wq = wq.reshape(B, P + 1).astype(np.int16)
        off += B * (P + 1) * 2
        if plan is not None:
            mapped_dev = ccsds121_host.decode_to_device(bs[off:], plan)
            rec = decode_model(mapped_dev.reshape(B, H, W),
                               jnp.asarray(wq))
        else:
            mapped = ccsds121_host.decode(bs[off:], B * H * W, **_ENTROPY)
            rec = decode_model(jnp.asarray(mapped.reshape(B, H, W)),
                               jnp.asarray(wq))
        return (rec << shift) if shift else rec

    @staticmethod
    def _decode(bs: bytes, B: int, H: int, W: int) -> np.ndarray:
        return np.asarray(CCSDS123Codec._decode_device(bs, B, H, W))
