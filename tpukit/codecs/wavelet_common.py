# -*- coding: utf-8 -*-
"""Shared machinery for the wavelet transform codecs (j2k, ccsds122):
device DWT -> embedded-scan coefficient ordering -> native bit-plane coder.
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


def pad_to_multiple(img: np.ndarray, m: int):
    H, W = img.shape[-2:]
    ph = (-H) % m
    pw = (-W) % m
    if ph == 0 and pw == 0:
        return img, H, W
    pads = [(0, 0)] * (img.ndim - 2) + [(0, ph), (0, pw)]
    return np.pad(img, pads, mode="edge"), H, W


_TLS = __import__("threading").local()


def bpc_encode(coef: np.ndarray, max_bytes: int = 0) -> bytes:
    """Native embedded bit-plane encode. The output buffer must be
    pre-zeroed (the coder's bulk zero-run path skips whole zero bytes), so
    a thread-local buffer is reused and only the bytes the previous call
    produced are re-zeroed — allocating+zeroing 8n bytes per call would
    dominate small-band encodes. Thread-local because the J2K/122 codecs
    fan encode calls across bands (the C call releases the GIL)."""
    lib = native.load()
    c = np.ascontiguousarray(coef.ravel(), np.int32)
    need = c.size * 8 + 1024
    buf = getattr(_TLS, "buf", None)
    if buf is None or buf.size < need:
        buf = np.zeros(need, np.uint8)
        _TLS.buf = buf
    n = lib.bpc_encode(c.ctypes.data_as(ct.POINTER(ct.c_uint32)), c.size,
                       buf.ctypes.data_as(ct.POINTER(ct.c_uint8)), buf.size,
                       int(max_bytes))
    if n <= 0:
        buf[:] = 0   # unknown write extent on failure
        raise RuntimeError(f"bpc_encode failed: {n}")
    out = buf[:n].tobytes()
    buf[:n] = 0      # restore the pre-zeroed invariant
    return out


def bpc_decode(bitstream: bytes, n: int) -> np.ndarray:
    lib = native.load()
    b = np.frombuffer(bitstream, np.uint8)   # decoder reads only
    c = np.empty(n, np.int32)                # decoder fully overwrites
    r = lib.bpc_decode(b.ctypes.data_as(ct.POINTER(ct.c_uint8)), b.size,
                       c.ctypes.data_as(ct.POINTER(ct.c_uint32)), n)
    if r != n:
        raise RuntimeError(f"bpc_decode failed: {r}")
    return c
