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
# Dual entropy backend for NON-truncating wavelet codecs (J2K).
#
# Quantized 9/7 (and reversible 5/3) coefficients are near-Laplacian, and
# the block-adaptive Rice/GPO2 coder (CCSDS-121 backend, byte-exact vs
# libaec, with an exact on-device size model) codes them ~0.55 bpp tighter
# than the embedded bit-plane coder at every rate (measured; see
# docs/SCALING.md §7b). J2K's rate control is a bisection over the base
# quantization step priced by the size model — it never truncates streams —
# so embeddedness buys it nothing. Backend selection is per band and purely
# a function of the quantized coefficients (Rice needs the zigzag to fit 16
# bits), so the device size model and the host coder always agree:
#
#   header bit 7 set       -> zigzag + CCSDS-121 backend (nbit=16, no
#                             preprocessing — the DWT already decorrelated;
#                             log2 J in bits 0-2, log2(rsi)-1 in bits 3-4)
#   header 0x40|nplanes    -> embedded bit-plane backend (bitplane.cpp;
#                             also the only backend CCSDS-122 uses, since
#                             its -r bpp surface requires truncation)
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
    range). Mirrored on device by wenc_size_bytes."""
    return bool(qc.min() >= -32768 and qc.max() <= 32767)


def _rice_cfg(qc: np.ndarray):
    """(J, rsi) by the shared sparsity rule (see RICE_J_SPARSE)."""
    if int(np.count_nonzero(qc)) * 32 < qc.size:
        return RICE_J_SPARSE, RICE_RSI_SPARSE
    return RICE_J, RICE_RSI


def _rice_header(J: int, rsi: int) -> int:
    """0x80 | log2(J) in bits 0-2 | (log2(rsi) - 1) in bits 3-4. J=1 is
    never a valid block size, so a zero J field (a bare 0x80 header from
    the earliest wenc streams, which carried an implicit J=8/rsi=2) is
    decoded as that legacy config."""
    return RICE_MARK | (J.bit_length() - 1) | ((rsi.bit_length() - 2) << 3)


def zigzag_np(qc: np.ndarray) -> np.ndarray:
    q = qc.astype(np.int32)
    return np.where(q >= 0, 2 * q, -2 * q - 1).astype(np.uint16)


def unzigzag_np(z: np.ndarray) -> np.ndarray:
    z = z.astype(np.int32)
    return (z >> 1) ^ -(z & 1)


def wenc_encode(qc: np.ndarray, max_bytes: int = 0) -> bytes:
    """Entropy-encode scan-ordered int32 coefficients with the
    auto-selected backend. ``max_bytes`` (byte budget) forces the embedded
    backend — only it has truncation semantics."""
    qc = np.ascontiguousarray(qc.ravel(), np.int32)
    if max_bytes == 0 and qc.size % RICE_J == 0 and _fits_rice(qc):
        from tpukit.native import ccsds121_host as ck
        J, rsi = _rice_cfg(qc)
        return bytes([_rice_header(J, rsi)]) + ck.encode(
            zigzag_np(qc), RICE_BITS, J, rsi, flags=0)
    return bpc_encode(qc, max_bytes)


def wenc_decode(bitstream: bytes, n: int) -> np.ndarray:
    if bitstream and (bitstream[0] & RICE_MARK):
        from tpukit.native import ccsds121_host as ck
        jf = bitstream[0] & 0x07
        J = 8 if jf == 0 else 1 << jf       # 0 == legacy implicit J=8
        rsi = 1 << (((bitstream[0] >> 3) & 0x03) + 1)
        z = ck.decode(bitstream[1:], n, RICE_BITS, J, rsi, flags=0)
        return unzigzag_np(z)
    return bpc_decode(bitstream, n)


def wenc_quant_encode_ck(coefs: np.ndarray, inv_steps: np.ndarray,
                         inv_base: float):
    """Deadzone-quantize + auto-backend encode; returns
    (bitstream, qc, s1, s2) with the same wraparound-int32 checksums (and
    the same f32 multiply association order) as the device requantizer.

    The Rice case runs ONE fused native pass (ck121_quant_encode:
    quantize + checksums + zigzag + encode, no numpy temporaries); when
    the quantized values overflow int16 it reuses the already-quantized
    qc through the embedded backend."""
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
            if sums[2]:
                hdr = _rice_header(RICE_J_SPARSE, RICE_RSI_SPARSE)
            else:
                hdr = _rice_header(RICE_J, RICE_RSI)
            return (bytes([hdr]) + out[:r].tobytes(), qc,
                    to_i32(int(sums[0])), to_i32(int(sums[1])))
        if r != -3:
            raise RuntimeError(f"ck121_quant_encode failed: {r}")
        # int16 overflow (very fine quantization): qc and checksums are
        # already computed — embedded backend over qc
        return (bpc_encode(qc), qc,
                to_i32(int(sums[0])), to_i32(int(sums[1])))
    # odd tail (never hit by padded tiles): plain numpy route
    qc = np.trunc(c * (s * np.float32(inv_base))).astype(np.int32)
    u = qc.astype(np.uint32)
    s1 = int(u.sum(dtype=np.uint64) & 0xFFFFFFFF)
    s2 = int((u * u).sum(dtype=np.uint64) & 0xFFFFFFFF)
    return wenc_encode(qc), qc, to_i32(s1), to_i32(s2)
