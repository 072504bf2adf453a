# -*- coding: utf-8 -*-
"""Shared machinery for the wavelet transform codecs (j2k, ccsds122):
device DWT -> embedded-scan coefficient ordering -> entropy backend
(auto-selected Rice / embedded bit-plane for J2K, embedded-only for
CCSDS-122's truncatable streams).
"""

from __future__ import annotations

import ctypes as ct
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from tpukit import native
from tpukit.kernels import dwt as dwtk


@lru_cache(maxsize=32)
def scan_order(H: int, W: int, levels: int) -> np.ndarray:
    """Flat index permutation: coarsest LL first, then HL/LH/HH per level
    from coarse to fine — the embedded-progressive scan."""
    idx = np.arange(H * W).reshape(H, W)
    parts = []
    subs = dwtk.subband_slices(H, W, levels)
    ll = subs[-1]
    parts.append(idx[ll[2]].ravel())
    for lv in range(levels - 1, -1, -1):
        for name, l, sl in subs[:-1]:
            if l == lv:
                parts.append(idx[sl].ravel())
    order = np.concatenate(parts)
    assert order.size == H * W
    return order


@lru_cache(maxsize=32)
def inverse_scan_order(H: int, W: int, levels: int) -> np.ndarray:
    order = scan_order(H, W, levels)
    inv = np.empty_like(order)
    inv[order] = np.arange(order.size)
    return inv


_DEV_ORDER_CACHE: dict = {}


def device_scan_orders(H: int, W: int, levels: int):
    """(order, inverse) scan permutations as DEVICE-resident arrays,
    cached per padded shape — uploaded once per process, shared by every
    codec that codes in embedded scan order."""
    import jax.numpy as jnp

    key = (H, W, levels)
    hit = _DEV_ORDER_CACHE.get(key)
    if hit is None:
        hit = (jnp.asarray(scan_order(H, W, levels)),
               jnp.asarray(inverse_scan_order(H, W, levels)))
        _DEV_ORDER_CACHE[key] = hit
    return hit


def pad_to_multiple(img: np.ndarray, m: int):
    H, W = img.shape[-2:]
    ph = (-H) % m
    pw = (-W) % m
    if ph == 0 and pw == 0:
        return img, H, W
    pads = [(0, 0)] * (img.ndim - 2) + [(0, ph), (0, pw)]
    return np.pad(img, pads, mode="edge"), H, W


_TLS = __import__("threading").local()


def _tls_buf(name: str, need: int, dtype) -> np.ndarray:
    """Reusable thread-local scratch buffer (the J2K/122 codecs fan coder
    calls across bands; the C calls release the GIL)."""
    buf = getattr(_TLS, name, None)
    if buf is None or buf.size < need:
        buf = np.empty(need, dtype)
        setattr(_TLS, name, buf)
    return buf


def bpc_encode(coef: np.ndarray, max_bytes: int = 0) -> bytes:
    """Native embedded bit-plane encode from int32 coefficients."""
    lib = native.load()
    c = np.ascontiguousarray(coef.ravel(), np.int32)
    buf = _tls_buf("buf", c.size * 8 + 1024, np.uint8)
    n = lib.bpc_encode(c.ctypes.data_as(ct.POINTER(ct.c_uint32)), c.size,
                       buf.ctypes.data_as(ct.POINTER(ct.c_uint8)), buf.size,
                       int(max_bytes))
    if n <= 0:
        raise RuntimeError(f"bpc_encode failed: {n}")
    return buf[:n].tobytes()


def bpc_encode_quant_ck(coefs: np.ndarray, inv_steps: np.ndarray,
                        inv_base: float, max_bytes: int = 0):
    """Fused deadzone quantize + embedded encode (one native pass).

    qc = trunc(coefs * (inv_steps * inv_base)) with the same f32
    association order as the numpy path and the device requantizer, so all
    three agree bit-for-bit. Returns (bitstream bytes, qc int32 array,
    s1, s2) where s1/s2 are sum(qc) and sum(qc*qc) mod 2^32 (signed int32
    wraparound) accumulated inside the quantize pass — the coefficient
    checksums against the device requantizer cost no extra host pass."""
    lib = native.load()
    c = np.ascontiguousarray(coefs.ravel(), np.float32)
    s = np.ascontiguousarray(inv_steps.ravel(), np.float32)
    if s.size != c.size:
        raise ValueError("inv_steps size mismatch")
    qc = np.empty(c.size, np.int32)
    buf = _tls_buf("buf", c.size * 8 + 1024, np.uint8)
    sums = np.zeros(2, np.uint32)
    fp = ct.POINTER(ct.c_float)
    u32p = ct.POINTER(ct.c_uint32)
    n = lib.bpc_encode_quant(c.ctypes.data_as(fp), s.ctypes.data_as(fp),
                             ct.c_float(inv_base),
                             qc.ctypes.data_as(u32p),
                             c.size,
                             buf.ctypes.data_as(ct.POINTER(ct.c_uint8)),
                             buf.size, int(max_bytes),
                             sums.ctypes.data_as(u32p))
    if n <= 0:
        raise RuntimeError(f"bpc_encode_quant failed: {n}")
    return buf[:n].tobytes(), qc, int(sums[0]), int(sums[1])


def bpc_encode_quant(coefs: np.ndarray, inv_steps: np.ndarray,
                     inv_base: float, max_bytes: int = 0):
    """bpc_encode_quant_ck without the checksums: (bitstream, qc)."""
    bs, qc, _, _ = bpc_encode_quant_ck(coefs, inv_steps, inv_base, max_bytes)
    return bs, qc


def bpc_decode(bitstream: bytes, n: int) -> np.ndarray:
    lib = native.load()
    b = np.frombuffer(bitstream, np.uint8)   # decoder reads only
    c = np.empty(n, np.int32)                # decoder fully overwrites
    r = lib.bpc_decode(b.ctypes.data_as(ct.POINTER(ct.c_uint8)), b.size,
                       c.ctypes.data_as(ct.POINTER(ct.c_uint32)), n)
    if r != n:
        raise RuntimeError(f"bpc_decode failed: {r}")
    return c


# ---------------------------------------------------------------------------
# Quadruple entropy backend for NON-truncating wavelet codecs (J2K).
#
# Quantized 9/7 (and reversible 5/3) coefficients are near-Laplacian, and
# the block-adaptive Rice/GPO2 coder (CCSDS-121 backend, byte-exact vs
# libaec, with an exact on-device size model) codes them ~0.55 bpp tighter
# than the embedded bit-plane coder at every rate; below ~1.5 bpp the
# planes turn sparse and the run-length backend (wrle, native/src/rle.cpp)
# beats Rice by 35-65% (measured; see docs/SCALING.md §7b). J2K's rate
# control is a bisection over the base quantization step priced by the
# size model — it never truncates streams — so embeddedness buys it
# nothing. Backend selection is per band and purely a function of the
# quantized coefficients (min over EXACT sizes; Rice and wrle need the
# values to fit int16), so the device size model and the host coder
# always agree:
#
#   header bit 7 set       -> zigzag + CCSDS-121 backend (nbit=16, no
#                             preprocessing — the DWT already decorrelated;
#                             log2 J in bits 0-2, log2(rsi)-1 in bits 3-4;
#                             bit 5 = Rice-split variant for the >int16
#                             fine-quantization regime, see SPLIT_FLAG)
#   header 0x40|nplanes    -> embedded bit-plane backend (bitplane.cpp;
#                             also the only backend CCSDS-122 uses, since
#                             its -r bpp surface requires truncation)
#   header 0x20            -> sparse run-length backend (rle.cpp; subband
#                             segment layout passed out-of-band)
# ---------------------------------------------------------------------------

RICE_MARK = 0x80
RICE_BITS = 16
# the wenc container is tpukit's own format, so the Rice block size is
# free to be larger than the aec CLI's J=8: J=64 amortizes the 4-bit
# block ID to 1/16 bit/sample (measured 0.33-0.45 bpp smaller streams at
# J2K rates, monotone across content classes). log2(J) rides in the
# header byte's low bits so the parameter can evolve per stream.
RICE_J = 64
RICE_RSI = 2
# sparse streams (nnz/n < 1/32) trade ID amortization for finer zero-run
# segmentation: (J=32, rsi=8) measures ~13% smaller at ~0.5 bpp. The
# selection rule (nnz * 32 < n) is an exact integer comparison mirrored
# by the device size model, so model and coder always pick the same
# config; both J/rsi ride in the header byte.
RICE_J_SPARSE = 32
RICE_RSI_SPARSE = 8


def _fits_rice(qc: np.ndarray) -> bool:
    """Rice backend applies iff zigzag(qc) fits RICE_BITS (qc in int16
    range). Mirrored on device by wenc_size_bytes. The RLE backend shares
    this eligibility gate (its device size model's magnitude sums are then
    int32-exact, see rle_size_bytes_model)."""
    return bool(qc.min() >= -32768 and qc.max() <= 32767)


# ---------------------------------------------------------------------------
# Third backend: sparse run-length + magnitude Rice ("wrle", native/src/
# rle.cpp). At low rates the quantized coefficient planes are sparse and the
# block-adaptive Rice backend costs 1.2-2.6x the order-0 entropy (measured);
# coding (gap, |v|-1, sign) per nonzero with per-subband optimal Rice
# parameters recovers most of that. Selected per band by EXACT size
# comparison against the Rice/bit-plane candidate (strictly smaller wins;
# the device model computes the same min, so model and coder always agree).
#   header byte 0x20 -> wrle backend (segment layout passed out-of-band:
#   the subband boundaries are a pure function of (Hp, Wp, levels) known to
#   both encoder and decoder)
# ---------------------------------------------------------------------------

RLE_MARK = 0x20
# saturation ceiling for the device model's int32-safe magnitude-cost sums:
# any candidate whose true cost reaches CAP bits is clamped to CAP. The
# exact-or-losing argument needs CAP to EXCEED every possible winning
# competitor (the Rice/bit-plane alternative never exceeds ~34
# bits/sample), so the ceiling scales with the plane size for large
# bands (_rle_cap_bits); int32 cost arithmetic bounds the model's domain
# to n <= ~2^26 samples per band — far above the 4096^2 = 2^24 of the
# largest real tile plane.
RLE_CAP_BITS = 1 << 29


def _rle_cap_bits(n: int) -> int:
    """Saturation ceiling > 34*n (any competitor's size), <= 2^30 - 1 so
    the pairwise saturating adds stay inside int32."""
    return RLE_CAP_BITS if 34 * n <= RLE_CAP_BITS else (1 << 30) - 1


@lru_cache(maxsize=32)
def subband_seg_bounds(H: int, W: int, levels: int):
    """Static (start, stop) pairs of each subband's span in scan order —
    the wrle backend's segment layout (same traversal as scan_order)."""
    subs = dwtk.subband_slices(H, W, levels)
    lens = []
    ll = subs[-1][2]
    lens.append((ll[0].stop - ll[0].start) * (ll[1].stop - ll[1].start))
    for lv in range(levels - 1, -1, -1):
        for name, l, sl in subs[:-1]:
            if l == lv:
                lens.append((sl[0].stop - sl[0].start)
                            * (sl[1].stop - sl[1].start))
    out, off = [], 0
    for n in lens:
        out.append((off, off + n))
        off += n
    assert off == H * W
    return tuple(out)


def _seg_lens(segbounds, n: int) -> np.ndarray:
    if segbounds is None:
        return np.array([n], np.int64)
    segs = np.array([b - a for a, b in segbounds], np.int64)
    if int(segs.sum()) != n:
        raise ValueError("segbounds do not cover the stream")
    return segs


def rle_size_host(qc: np.ndarray, segbounds=None) -> int:
    """Exact total stream bytes (incl. the marker byte) of the wrle
    backend for scan-ordered int32 coefficients."""
    lib = native.load()
    qc = np.ascontiguousarray(qc.ravel(), np.int32)
    segs = _seg_lens(segbounds, qc.size)
    bits = lib.wrle_size_bits(
        qc.ctypes.data_as(ct.POINTER(ct.c_int32)), qc.size,
        segs.ctypes.data_as(ct.POINTER(ct.c_longlong)), len(segs))
    if bits < 0:
        raise RuntimeError(f"wrle_size_bits failed: {bits}")
    return 1 + (int(bits) + 7) // 8


def rle_encode(qc: np.ndarray, segbounds=None,
               size_bytes: int | None = None) -> bytes:
    """``size_bytes``: the already-known rle_size_host result (callers do
    the min-selection sizing pass anyway) — skips a second native sizing
    pass. Without it the buffer is exact-sized here: adversarial
    magnitudes (beyond the int16 eligibility gate this backend is
    selected under) can cost far more than 8 bytes/sample in unary."""
    lib = native.load()
    qc = np.ascontiguousarray(qc.ravel(), np.int32)
    segs = _seg_lens(segbounds, qc.size)
    if size_bytes is None:
        bits = lib.wrle_size_bits(
            qc.ctypes.data_as(ct.POINTER(ct.c_int32)), qc.size,
            segs.ctypes.data_as(ct.POINTER(ct.c_longlong)), len(segs))
        if bits < 0:
            raise RuntimeError(f"wrle_size_bits failed: {bits}")
        size_bytes = 1 + (int(bits) + 7) // 8
    buf = _tls_buf("rle", int(size_bytes) + 64, np.uint8)
    n = lib.wrle_encode(
        qc.ctypes.data_as(ct.POINTER(ct.c_int32)), qc.size,
        segs.ctypes.data_as(ct.POINTER(ct.c_longlong)), len(segs),
        buf.ctypes.data_as(ct.POINTER(ct.c_uint8)), buf.size)
    if n < 0:
        raise RuntimeError(f"wrle_encode failed: {n}")
    return bytes([RLE_MARK]) + buf[:n].tobytes()


def rle_decode(bitstream: bytes, n: int, segbounds=None) -> np.ndarray:
    lib = native.load()
    b = np.frombuffer(bitstream, np.uint8)
    segs = _seg_lens(segbounds, n)
    out = np.empty(n, np.int32)
    r = lib.wrle_decode(
        b.ctypes.data_as(ct.POINTER(ct.c_uint8)), b.size,
        segs.ctypes.data_as(ct.POINTER(ct.c_longlong)), len(segs),
        out.ctypes.data_as(ct.POINTER(ct.c_int32)), n)
    if r != n:
        raise RuntimeError(f"wrle_decode failed: {r}")
    return out


@lru_cache(maxsize=64)
def _rle_model_consts(segbounds):
    """Static helper arrays for rle_size_bytes_model: per-position segment
    floor index (seg_start - 1, resets the prev-nonzero chain at segment
    boundaries) and the per-segment nnz field widths."""
    n = segbounds[-1][1]
    floor = np.empty(n, np.int32)
    widths = []
    for a, b in segbounds:
        floor[a:b] = a - 1
        widths.append(int(b - a).bit_length())
    return floor, np.asarray(widths, np.int32)


def rle_size_bytes_model(qc, segbounds=None):
    """EXACT device model of rle_size_host over the last axis (jnp, jit-
    and vmap-safe) for int16-range inputs (the shared fits_rice
    eligibility gate — callers clip first, as the j2k model does).

    Structure (kept to a few hundred traceable ops so jit compile stays
    bounded): ONE prev-nonzero max-scan over the whole axis with a static
    per-position floor handling segment resets (indices from earlier
    segments never exceed seg_start-1, so a max with the floor is exact);
    gap costs from 16 direct shift-sums per segment (always int32-exact:
    sum(gaps) <= seglen); magnitude costs from the 15-bit decomposition
    sum(m >> k) == sum_j S_j 2^(j-k), combined over a static (k, j) grid
    with terms and partial sums saturated at RLE_CAP_BITS — exact whenever
    the true cost is below CAP, and any clamped candidate is >= CAP, which
    both exceeds every winning candidate and loses the backend min() on
    host and device alike (see RLE_CAP_BITS)."""
    import jax

    n = qc.shape[-1]
    if segbounds is None:
        segbounds = ((0, n),)
    floor_np, widths_np = _rle_model_consts(tuple(segbounds))
    cap_bits = _rle_cap_bits(n)
    CAP = jnp.int32(cap_bits)

    nz = qc != 0
    idx = jnp.arange(n, dtype=jnp.int32)
    masked = jnp.where(nz, idx, jnp.int32(-1))
    incl = jax.lax.associative_scan(jnp.maximum, masked, axis=-1)
    prev = jnp.concatenate(
        [jnp.full(incl.shape[:-1] + (1,), -1, incl.dtype),
         incl[..., :-1]], axis=-1)
    prev = jnp.maximum(prev, jnp.asarray(floor_np))
    gap = jnp.where(nz, idx - prev - 1, 0)

    def seg_sums(row):
        # (..., n) -> (..., nsegs) static-slice reductions
        return jnp.stack([jnp.sum(row[..., a:b], axis=-1)
                          for a, b in segbounds], axis=-1)

    nnz = seg_sums(nz.astype(jnp.int32))                     # (..., S)
    # gap candidate costs: sum(gap >> k) exact in int32 (<= seglen)
    gcand = jnp.stack([seg_sums(gap >> k) for k in range(16)],
                      axis=-2)                               # (..., 16, S)
    ks = jnp.arange(1, 17, dtype=jnp.int32)[:, None]         # (16, 1) = k+1
    cost_g = jnp.min(gcand + nnz[..., None, :] * ks, axis=-2)

    # magnitude bit-plane sums: m = |v|-1 <= 32766 -> 15 bit planes
    mag = jnp.where(nz, jnp.abs(qc) - 1, 0)
    S = jnp.stack([seg_sums((mag >> j) & 1) for j in range(15)],
                  axis=-2)                                   # (..., 15, S)
    # static (k=16, j=15) term grid: S_j * 2^(j-k), clamped at CAP
    kk, jj = np.meshgrid(np.arange(16), np.arange(15), indexing="ij")
    sh = np.clip(jj - kk, 0, 31).astype(np.int32)
    valid = (jj >= kk)
    thresh = np.where(valid, cap_bits >> sh, np.int32(2 ** 31 - 1))
    sh_d = jnp.asarray(sh)[:, :, None]
    thr_d = jnp.asarray(thresh)[:, :, None]
    val_d = jnp.asarray(valid)[:, :, None]
    Sb = S[..., None, :, :]                                  # (...,1,15,S)
    term = jnp.where(val_d & (Sb > thr_d), CAP,
                     jnp.where(val_d, Sb << sh_d, 0))        # (...,16,15,S)
    # saturating pairwise tree over j: yields min(true_sum, CAP) exactly
    acc = term
    while acc.shape[-2] > 1:
        m2 = acc.shape[-2]
        if m2 % 2:
            acc = jnp.concatenate(
                [acc, jnp.zeros_like(acc[..., :1, :])], axis=-2)
            m2 += 1
        acc = jnp.minimum(acc[..., 0::2, :] + acc[..., 1::2, :], CAP)
    mcand = jnp.minimum(acc[..., 0, :] + nnz[..., None, :] * ks, CAP)
    cost_m = jnp.min(mcand, axis=-2)

    widths = jnp.asarray(widths_np)
    bits = widths + jnp.where(nnz > 0, 8 + cost_g + cost_m + nnz, 0)
    # saturating pairwise total over segments (a plain sum of up to ~16
    # CAP-clamped segments could overflow int32); exact below CAP
    acc2 = bits[..., :, None]
    while acc2.shape[-2] > 1:
        if acc2.shape[-2] % 2:
            acc2 = jnp.concatenate(
                [acc2, jnp.zeros_like(acc2[..., :1, :])], axis=-2)
        acc2 = jnp.minimum(acc2[..., 0::2, :] + acc2[..., 1::2, :], CAP)
    total = acc2[..., 0, 0]
    return 1 + (total + 7) // 8


def _rice_cfg(qc: np.ndarray):
    """(J, rsi) by the shared sparsity rule (see RICE_J_SPARSE)."""
    if int(np.count_nonzero(qc)) * 32 < qc.size:
        return RICE_J_SPARSE, RICE_RSI_SPARSE
    return RICE_J, RICE_RSI


def _rice_header(J: int, rsi: int) -> int:
    """0x80 | log2(J) in bits 0-2 | (log2(rsi) - 1) in bits 3-4. J=1 is
    never a valid block size, so a zero J field (a bare 0x80 header from
    the earliest wenc streams, which carried an implicit J=8/rsi=2) is
    decoded as that legacy config. Bit 5 (SPLIT_FLAG) marks the split
    variant: a second header byte carries s, the count of raw LSBs per
    zigzag value packed ahead of the Rice stream of the high parts."""
    return RICE_MARK | (J.bit_length() - 1) | ((rsi.bit_length() - 2) << 3)


# Rice-split variant: when the zigzag overflows 16 bits (very fine
# quantization), send s = bitlen(max zigzag) - 16 raw LSBs per sample and
# Rice-code the 16-bit high parts. Measured ~0.9 bpp under the embedded /
# run-length alternatives just past the int16 boundary, closing the rate
# dead zone that made --rate-fit undershoot ~8 bpp targets.
SPLIT_FLAG = 0x20


def _zigzag32(qc: np.ndarray) -> np.ndarray:
    """Zigzag of full-range int32 as uint32 (matches the device's
    wraparound (qc << 1) ^ (qc >> 31) trick bit-for-bit)."""
    q = qc.astype(np.int64)
    return (((q << 1) ^ (q >> 63)) & 0xFFFFFFFF).astype(np.uint32)


def _split_s(maxz: int) -> int:
    return max(0, int(maxz).bit_length() - 16)


def split_encode(qc: np.ndarray, J: int = RICE_J,
                 rsi: int = RICE_RSI) -> bytes:
    """[hdr | s | packed LSB planes (ceil(n*s/8) bytes) | Rice(z >> s)]."""
    from tpukit.native import ccsds121_host as ck

    qc = np.ascontiguousarray(qc.ravel(), np.int32)
    z = _zigzag32(qc)
    s = _split_s(int(z.max()) if z.size else 0)
    zhi = (z >> s).astype(np.uint16)
    if s:
        lsb = (z & ((1 << s) - 1)).astype(">u2")
        bits = np.unpackbits(lsb.view(np.uint8)).reshape(-1, 16)[:, 16 - s:]
        block = np.packbits(bits.ravel()).tobytes()
    else:
        block = b""
    return (bytes([_rice_header(J, rsi) | SPLIT_FLAG, s]) + block
            + ck.encode(zhi, RICE_BITS, J, rsi, flags=0))


def split_decode(bitstream: bytes, n: int) -> np.ndarray:
    from tpukit.native import ccsds121_host as ck

    if len(bitstream) < 2:
        raise RuntimeError("split stream truncated (no header)")
    hdr = bitstream[0]
    jf = hdr & 0x07
    J = 8 if jf == 0 else 1 << jf
    rsi = 1 << (((hdr >> 3) & 0x03) + 1)
    s = bitstream[1]
    if s > 16:
        raise RuntimeError(f"split stream corrupt: s={s} > 16")
    nlsb = (n * s + 7) // 8
    if len(bitstream) < 2 + nlsb:
        raise RuntimeError("split stream truncated (LSB block)")
    zhi = ck.decode(bitstream[2 + nlsb:], n, RICE_BITS, J, rsi, flags=0)
    z = zhi.astype(np.uint64) << s
    if s:
        bits = np.unpackbits(
            np.frombuffer(bitstream[2:2 + nlsb], np.uint8))[:n * s]
        w = (np.uint64(1) << np.arange(s - 1, -1, -1, dtype=np.uint64))
        z |= (bits.reshape(n, s).astype(np.uint64) * w).sum(
            axis=1, dtype=np.uint64)
    zi = z.astype(np.int64)
    return (((zi >> 1) ^ -(zi & 1)) & 0xFFFFFFFF).astype(np.uint32) \
        .astype(np.int32)


def split_size_host(qc: np.ndarray, J: int = RICE_J,
                    rsi: int = RICE_RSI) -> int:
    """Exact stream bytes of split_encode without materializing it."""
    from tpukit.native import ccsds121_host as ck

    qc = np.ascontiguousarray(qc.ravel(), np.int32)
    z = _zigzag32(qc)
    s = _split_s(int(z.max()) if z.size else 0)
    zhi = (z >> s).astype(np.uint16)
    return 2 + (qc.size * s + 7) // 8 + len(
        ck.encode(zhi, RICE_BITS, J, rsi, flags=0))


def zigzag_np(qc: np.ndarray) -> np.ndarray:
    q = qc.astype(np.int32)
    return np.where(q >= 0, 2 * q, -2 * q - 1).astype(np.uint16)


def unzigzag_np(z: np.ndarray) -> np.ndarray:
    z = z.astype(np.int32)
    return (z >> 1) ^ -(z & 1)


def wenc_encode(qc: np.ndarray, max_bytes: int = 0,
                segbounds=None) -> bytes:
    """Entropy-encode scan-ordered int32 coefficients with the
    auto-selected backend (strictly-smaller exact size wins; ties keep the
    Rice/bit-plane candidate — the device size model computes the same
    min, j2k_codec.wenc_size_bytes). ``max_bytes`` (byte budget) forces
    the embedded backend — only it has truncation semantics."""
    qc = np.ascontiguousarray(qc.ravel(), np.int32)
    if max_bytes:
        return bpc_encode(qc, max_bytes)
    fits = _fits_rice(qc)
    if qc.size % RICE_J == 0 and fits:
        from tpukit.native import ccsds121_host as ck
        J, rsi = _rice_cfg(qc)
        base = bytes([_rice_header(J, rsi)]) + ck.encode(
            zigzag_np(qc), RICE_BITS, J, rsi, flags=0)
        rle_bytes = rle_size_host(qc, segbounds)
        if rle_bytes < len(base):
            return rle_encode(qc, segbounds, size_bytes=rle_bytes)
        return base
    base = bpc_encode(qc)
    if fits:
        rle_bytes = rle_size_host(qc, segbounds)
        if rle_bytes < len(base):
            return rle_encode(qc, segbounds, size_bytes=rle_bytes)
    elif qc.size % RICE_J == 0 and split_size_host(qc) < len(base):
        return split_encode(qc)
    return base


def wenc_decode(bitstream: bytes, n: int, segbounds=None) -> np.ndarray:
    if bitstream and (bitstream[0] & RICE_MARK):
        from tpukit.native import ccsds121_host as ck
        if bitstream[0] & SPLIT_FLAG:
            return split_decode(bitstream, n)
        jf = bitstream[0] & 0x07
        J = 8 if jf == 0 else 1 << jf       # 0 == legacy implicit J=8
        rsi = 1 << (((bitstream[0] >> 3) & 0x03) + 1)
        z = ck.decode(bitstream[1:], n, RICE_BITS, J, rsi, flags=0)
        return unzigzag_np(z)
    if bitstream and (bitstream[0] & 0x40):   # 0x40|nplanes: bit-plane
        return bpc_decode(bitstream, n)
    if bitstream and bitstream[0] == RLE_MARK:
        return rle_decode(bitstream[1:], n, segbounds)
    raise RuntimeError(
        f"wenc stream has unknown backend marker "
        f"0x{bitstream[0]:02x}" if bitstream else "empty wenc stream")


def wenc_quant_encode_ck(coefs: np.ndarray, inv_steps: np.ndarray,
                         inv_base: float, segbounds=None):
    """Deadzone-quantize + auto-backend encode; returns
    (bitstream, qc, s1, s2) with the same wraparound-int32 checksums (and
    the same f32 multiply association order) as the device requantizer.

    The Rice case runs ONE fused native pass (ck121_quant_encode:
    quantize + checksums + zigzag + encode, no numpy temporaries), then
    compares the exact wrle candidate size (one native sizing pass over
    qc) and re-encodes only when wrle is strictly smaller — the same min
    the device size model computes. When the quantized values overflow
    int16 it reuses the already-quantized qc through the embedded backend
    (wrle shares the int16 eligibility gate)."""
    c = np.ascontiguousarray(coefs.ravel(), np.float32)
    s = np.ascontiguousarray(inv_steps.ravel(), np.float32)
    if s.size != c.size:
        raise ValueError("inv_steps size mismatch")
    n = c.size
    to_i32 = lambda v: v - (1 << 32) if v >= (1 << 31) else v
    if n % RICE_J == 0:
        lib = native.load()
        qc = np.empty(n, np.int32)
        out = _tls_buf("wq", n * 4 + 4096, np.uint8)
        sums = np.zeros(3, np.uint32)
        fp = ct.POINTER(ct.c_float)
        r = lib.ck121_quant_encode(
            c.ctypes.data_as(fp), s.ctypes.data_as(fp),
            ct.c_float(inv_base),
            qc.ctypes.data_as(ct.POINTER(ct.c_int32)), n, RICE_J, RICE_RSI,
            RICE_J_SPARSE, RICE_RSI_SPARSE,
            out.ctypes.data_as(ct.POINTER(ct.c_uint8)), out.size,
            sums.ctypes.data_as(ct.POINTER(ct.c_uint32)))
        if r > 0:
            rle_bytes = rle_size_host(qc, segbounds)
            if rle_bytes < 1 + r:
                return (rle_encode(qc, segbounds, size_bytes=rle_bytes),
                        qc, to_i32(int(sums[0])), to_i32(int(sums[1])))
            if sums[2]:
                hdr = _rice_header(RICE_J_SPARSE, RICE_RSI_SPARSE)
            else:
                hdr = _rice_header(RICE_J, RICE_RSI)
            return (bytes([hdr]) + out[:r].tobytes(), qc,
                    to_i32(int(sums[0])), to_i32(int(sums[1])))
        if r != -3:
            raise RuntimeError(f"ck121_quant_encode failed: {r}")
        # int16 overflow (very fine quantization): qc and checksums are
        # already computed — min of the embedded and Rice-split backends
        bpc = bpc_encode(qc)
        stream = (split_encode(qc) if split_size_host(qc) < len(bpc)
                  else bpc)
        return (stream, qc, to_i32(int(sums[0])), to_i32(int(sums[1])))
    # odd tail (never hit by padded tiles): plain numpy route
    qc = np.trunc(c * (s * np.float32(inv_base))).astype(np.int32)
    u = qc.astype(np.uint32)
    s1 = int(u.sum(dtype=np.uint64) & 0xFFFFFFFF)
    s2 = int((u * u).sum(dtype=np.uint64) & 0xFFFFFFFF)
    return wenc_encode(qc, segbounds=segbounds), qc, to_i32(s1), to_i32(s2)
