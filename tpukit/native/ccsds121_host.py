# -*- coding: utf-8 -*-
"""Host-side CCSDS-121 encode/decode (ctypes wrapper over the C++ coder).

Bit-exact with libaec (the engine behind the reference's `aec` CLI —
reference tools/codecs/ccsds121/ccsds121_wrap.py:129-136). Defaults mirror
``aec -n {nbit} in out``: block_size=8, rsi=2, preprocessing on, unsigned.
"""

from __future__ import annotations

import ctypes

import numpy as np

from tpukit import native

FLAG_PREPROCESS = 8
DEFAULT_BLOCK_SIZE = 8
DEFAULT_RSI = 2

_u16p = ctypes.POINTER(ctypes.c_uint16)
_u8p = ctypes.POINTER(ctypes.c_uint8)


def encode(samples: np.ndarray, bits: int = 16,
           block_size: int = DEFAULT_BLOCK_SIZE, rsi: int = DEFAULT_RSI,
           flags: int = FLAG_PREPROCESS) -> bytes:
    lib = native.load()
    x = np.ascontiguousarray(np.asarray(samples).ravel(), dtype=np.uint16)
    # worst case ≈ no-compression + IDs + refs; 4x + slack is generous
    out = np.zeros(x.size * 4 + 4096, np.uint8)
    n = lib.ck121_encode(x.ctypes.data_as(_u16p), x.size, bits, block_size,
                         rsi, flags, out.ctypes.data_as(_u8p), out.size)
    if n < 0:
        raise RuntimeError(f"ck121_encode failed: {n}")
    return out[:n].tobytes()


def decode(bitstream: bytes, n_samples: int, bits: int = 16,
           block_size: int = DEFAULT_BLOCK_SIZE, rsi: int = DEFAULT_RSI,
           flags: int = FLAG_PREPROCESS) -> np.ndarray:
    lib = native.load()
    b = np.frombuffer(bitstream, np.uint8).copy()
    out = np.zeros(n_samples, np.uint16)
    r = lib.ck121_decode(b.ctypes.data_as(_u8p), b.size, bits, block_size,
                         rsi, flags, out.ctypes.data_as(_u16p), n_samples)
    if r != n_samples:
        raise RuntimeError(f"ck121_decode failed: {r}")
    return out
