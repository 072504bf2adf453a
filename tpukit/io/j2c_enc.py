# -*- coding: utf-8 -*-
"""JPEG 2000 Part 1 encoder: Tier-1 code-block coding bindings.

The reference's J2K path shells out to OpenJPEG through gdal_translate
(reference tools/codecs/j2k/j2k_wrap.py:79-105), re-running the whole
encoder once per rate point.  tpukit encodes every code-block ONCE in
process (clean-room EBCOT tier-1 in native/src/j2k_t1enc.cpp) and gets
the entire rate ladder from PCRD-opt truncation: the encoder reports,
for every coding pass, the minimal byte length at which a decoder
reproduces that pass prefix and the exact squared-error reduction of the
midpoint reconstruction, so any rate target is a convex-hull search over
(length, distortion) points — no re-encode.

The encoder mirrors tpukit/io/jp2.py's tier-1 decoder (j2k_t1.cpp):
identical context formation and pass schedule, so enc->dec round-trips
are bit-exact for any pass prefix (tests/test_j2k_t1enc.py fuzzes this).
"""

from __future__ import annotations

import ctypes as ct
from dataclasses import dataclass

import numpy as np

from tpukit import native


@dataclass
class T1Block:
    """One encoded code-block with per-pass truncation metadata."""

    stream: bytes            # full terminated MQ segment
    npasses: int
    numbps: int              # magnitude bit-planes actually coded
    pass_len: np.ndarray     # (npasses,) int32 — minimal bytes per prefix
    pass_dist: np.ndarray    # (npasses,) float64 — cumulative SE reduction
    pass_tail: np.ndarray    # (npasses, 8) uint8 — [len, tail bytes...]

    def truncate(self, p: int) -> bytes:
        """Materialize the minimal stream decoding passes 0..p exactly."""
        if not 0 <= p < self.npasses:
            raise ValueError(f"pass {p} out of range 0..{self.npasses - 1}")
        tn = int(self.pass_tail[p, 0])
        prefix = int(self.pass_len[p]) - tn
        return self.stream[:prefix] + bytes(self.pass_tail[p, 1:1 + tn])


_ENC = None


def _load_t1enc():
    global _ENC
    if _ENC is None:
        lib = native.load()
        fn = lib.j2k_t1_encode
        fn.restype = ct.c_int64
        fn.argtypes = [ct.POINTER(ct.c_int32), ct.c_int, ct.c_int, ct.c_int,
                       ct.c_int, ct.POINTER(ct.c_uint8), ct.c_int64,
                       ct.POINTER(ct.c_int32), ct.POINTER(ct.c_double),
                       ct.POINTER(ct.c_uint8), ct.c_int,
                       ct.POINTER(ct.c_int64)]
        _ENC = fn
    return _ENC


def t1_encode_block(coefs: np.ndarray, orient: int, style: int = 0) -> T1Block:
    """Tier-1 encode one code-block of signed integer coefficients.

    coefs: (h, w) int array (sign-magnitude range fits int32).
    orient: 0=LL 1=HL 2=LH 3=HH.  style: only segsym (32) supported.
    """
    fn = _load_t1enc()
    h, w = coefs.shape
    c = np.ascontiguousarray(coefs, np.int32)
    # worst-case MQ output is well under 2 bytes/coefficient/plane but cap
    # generously; 32 planes x (h*w) bits / 8 + slack
    cap = 8 * w * h + 1024
    out = np.empty(cap, np.uint8)
    maxpasses = 1 + 3 * 31
    plen = np.zeros(maxpasses, np.int32)
    pdist = np.zeros(maxpasses, np.float64)
    ptail = np.zeros(maxpasses * 8, np.uint8)
    info = np.zeros(3, np.int64)
    r = fn(c.ctypes.data_as(ct.POINTER(ct.c_int32)), w, h, orient, style,
           out.ctypes.data_as(ct.POINTER(ct.c_uint8)), cap,
           plen.ctypes.data_as(ct.POINTER(ct.c_int32)),
           pdist.ctypes.data_as(ct.POINTER(ct.c_double)),
           ptail.ctypes.data_as(ct.POINTER(ct.c_uint8)), maxpasses,
           info.ctypes.data_as(ct.POINTER(ct.c_int64)))
    if r < 0:
        raise ValueError(f"tier-1 encode failed: {r}")
    npasses, numbps, total = int(info[0]), int(info[1]), int(info[2])
    return T1Block(stream=bytes(out[:total]), npasses=npasses, numbps=numbps,
                   pass_len=plen[:npasses].copy(),
                   pass_dist=pdist[:npasses].copy(),
                   pass_tail=ptail[:npasses * 8].reshape(-1, 8).copy())
