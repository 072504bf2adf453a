# -*- coding: utf-8 -*-
"""JPEG 2000 Part 1 (.j2c) encoder: standard-conformant codestreams.

The reference's J2K path shells out to OpenJPEG through gdal_translate
(reference tools/codecs/j2k/j2k_wrap.py:79-105), re-running the whole
encoder once per rate point.  tpukit encodes every code-block ONCE in
process (clean-room EBCOT tier-1 in native/src/j2k_t1enc.cpp) and gets
the entire rate ladder from PCRD-opt truncation: the encoder reports,
for every coding pass, the minimal byte length at which a decoder
reproduces that pass prefix and the exact squared-error reduction of the
midpoint reconstruction, so any rate target is a convex-hull search over
(length, distortion) points — no re-encode.

Layering on top of tier-1, this module assembles full ISO/IEC 15444-1
codestreams: forward DWT (reversible 5/3 or irreversible 9/7 — exact
inverses of tpukit/io/jp2.py's synthesis), dead-zone quantization with
QCD-representable per-band steps (9/7), tag-tree coded packet headers,
LRCP packets, and SIZ/COD/QCD markers.  Lossless 5/3 output round-trips
bit-exactly through tpukit's own JP2Decoder AND third-party decoders
(OpenJPEG via Pillow — tests/test_j2c_enc.py); 9/7 output decodes in
OpenJPEG to within +-1 LSB of our own decoder and, PCRD-truncated at
OpenJPEG's own achieved sizes, matches or beats OpenJPEG's PSNR at
every tested rate (0.25-4 bpp).

The tier-1 encoder mirrors tpukit/io/jp2.py's tier-1 decoder
(j2k_t1.cpp): identical context formation and pass schedule, so
enc->dec round-trips are bit-exact for any pass prefix
(tests/test_j2k_t1enc.py fuzzes this).
"""

from __future__ import annotations

import ctypes as ct
import math
import struct
from dataclasses import dataclass, field
from functools import lru_cache
from typing import Dict, List, Optional, Tuple

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


def t1_sig_plan(coefs: np.ndarray) -> np.ndarray:
    """Per-coefficient global pass index at which the coefficient becomes
    significant (-1 for zero magnitude) — the only data-dependent part of
    a tier-1 truncated decode (native j2k_t1_sig_plan). Together with the
    coefficients it makes the reconstruction of ANY pass-truncation point
    closed form (J2CPlan.truncated_recon)."""
    lib = native.load()
    h, w = coefs.shape
    c = np.ascontiguousarray(coefs, np.int32)
    out = np.empty((h, w), np.int32)
    r = lib.j2k_t1_sig_plan(
        c.ctypes.data_as(ct.POINTER(ct.c_int32)), w, h,
        out.ctypes.data_as(ct.POINTER(ct.c_int32)))
    if r < 0:
        raise ValueError(f"sig plan failed: {r}")
    return out


def _sr2d_native(ll: np.ndarray, hl: np.ndarray, lh: np.ndarray,
                 hh: np.ndarray, u1: int, v1: int,
                 rev: bool) -> np.ndarray:
    """One 2D synthesis level at origin (0, 0): the F.3.3 interleave in
    numpy (strided stores), the lifting in C++ (native j2k_sr2d_53/97 —
    bit-exact to jp2.sr2d_53/sr2d_97, pinned in tests/test_j2c_enc.py)."""
    lib = native.load()
    h, w = v1, u1
    if rev:
        a = np.zeros((h, w), np.int64)
    else:
        a = np.zeros((h, w), np.float64)
    a[0::2, 0::2] = ll
    a[0::2, 1::2] = hl
    a[1::2, 0::2] = lh
    a[1::2, 1::2] = hh
    if rev:
        r = lib.j2k_sr2d_53(a.ctypes.data_as(ct.POINTER(ct.c_int64)),
                            h, w, 0, 0)
    else:
        r = lib.j2k_sr2d_97(a.ctypes.data_as(ct.POINTER(ct.c_double)),
                            h, w, 0, 0)
    if r < 0:
        raise ValueError(f"native synthesis failed: {r}")
    return a


def _fdwt2d_native(tc: np.ndarray, tx0: int, ty0: int, tx1: int, ty1: int,
                   levels: int, wavelet: str):
    """Full forward DWT through the native lifting (j2k_fd2d_97/53 —
    bit-exact to fd2d_97/fd2d_53, fuzz-pinned in tests/test_j2c_enc.py);
    returns the same {(r, orient): array} dict as fdwt2d_97/fdwt2d_53.
    Returns None when the native library is unavailable (callers fall
    back to the numpy reference)."""
    try:
        lib = native.load()
        fn = (lib.j2k_fd2d_53 if wavelet == "53" else lib.j2k_fd2d_97)
    except Exception:
        return None
    rev = wavelet == "53"
    bands: Dict[Tuple[int, int], np.ndarray] = {}
    ll = np.ascontiguousarray(tc, np.int64 if rev else np.float64)
    assert ll.shape == (ty1 - ty0, tx1 - tx0)
    ptr_t = ct.POINTER(ct.c_int64 if rev else ct.c_double)
    for r in range(levels, 0, -1):
        d = 1 << (levels - r)
        u0, v0 = _ceil_div(tx0, d), _ceil_div(ty0, d)
        u1, v1 = _ceil_div(tx1, d), _ceil_div(ty1, d)
        h, w = v1 - v0, u1 - u0
        rc = fn(ll.ctypes.data_as(ptr_t), h, w, u0, v0)
        if rc < 0:
            raise ValueError(f"native analysis failed: {rc}")
        ev_u, ev_v = (-u0) % 2, (-v0) % 2
        od_u, od_v = 1 - ev_u, 1 - ev_v
        bands[(r, 1)] = ll[ev_v::2, od_u::2]
        bands[(r, 2)] = ll[od_v::2, ev_u::2]
        bands[(r, 3)] = ll[od_v::2, od_u::2]
        ll = np.ascontiguousarray(ll[ev_v::2, ev_u::2])
    bands[(0, 0)] = ll
    return bands


# ===========================================================================
# Forward reversible 5/3 DWT — the exact inverse of jp2.py's synthesis
# (_sr1d_53 / sr2d_53), including the absolute-coordinate parity and
# whole-point symmetric extension conventions (ITU-T T.800 F.4.8).
# ===========================================================================

def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def _fd1d_53(x: np.ndarray, i0: int) -> np.ndarray:
    """1D analysis along the last axis; the signal covers absolute
    coordinates [i0, i0+n).  Inverse of jp2._sr1d_53."""
    n = x.shape[-1]
    if n == 0:
        return x
    x = x.astype(np.int64)
    if n == 1:
        # single high-pass sample codes 2*X (inverse truncates Y/2)
        return 2 * x if i0 % 2 else x
    ext = np.concatenate([x[..., 1:2], x, x[..., -2:-1]], axis=-1)
    # ext[j] holds absolute coordinate i0 - 1 + j
    e0 = (i0 + 1) % 2   # smallest ext index with even absolute coordinate
    out = ext.copy()
    # step 1: odd coordinates   Y(2m+1) = X(2m+1) - floor((X(2m)+X(2m+2))/2)
    jo = np.arange(e0 + 1, n + 2, 2)
    jo = jo[(jo >= 1) & (jo <= n)]
    out[..., jo] = ext[..., jo] - ((ext[..., jo - 1] + ext[..., jo + 1]) >> 1)
    # re-extend the updated odds so even-boundary steps see reflected values
    out[..., 0] = out[..., 2]
    out[..., n + 1] = out[..., n - 1]
    # step 2: even coordinates  Y(2m) = X(2m) + floor((Y(2m-1)+Y(2m+1)+2)/4)
    je = np.arange(e0, n + 2, 2)
    je = je[(je >= 1) & (je <= n)]
    out[..., je] = ext[..., je] + ((out[..., je - 1] + out[..., je + 1] + 2) >> 2)
    return out[..., 1:n + 1]


def fd2d_53(a: np.ndarray, u0: int, v0: int, u1: int, v1: int):
    """One 2D analysis level over the region [u0,u1)x[v0,v1) (absolute
    coords).  Returns (ll, hl, lh, hh); exact inverse of jp2.sr2d_53."""
    assert a.shape == (v1 - v0, u1 - u0)
    # invert synthesis order: vertical first, then horizontal
    a = np.swapaxes(_fd1d_53(np.swapaxes(a, -1, -2), v0), -1, -2)
    a = _fd1d_53(a, u0)
    # 2D_DEINTERLEAVE: LL at (even,even) absolute coordinates
    ev_u = (-u0) % 2
    od_u = 1 - ev_u
    ev_v = (-v0) % 2
    od_v = 1 - ev_v
    ll = a[ev_v::2, ev_u::2]
    hl = a[ev_v::2, od_u::2]
    lh = a[od_v::2, ev_u::2]
    hh = a[od_v::2, od_u::2]
    return ll, hl, lh, hh


def fdwt2d_53(tc: np.ndarray, tx0: int, ty0: int, tx1: int, ty1: int,
              levels: int) -> Dict[Tuple[int, int], np.ndarray]:
    """Full forward 5/3 DWT of a tile-component covering [tx0,tx1) x
    [ty0,ty1).  Returns {(r, orient): coefficients} with r=0 the LL band
    and orient 1/2/3 = HL/LH/HH at resolutions 1..levels (jp2.py band
    numbering)."""
    bands: Dict[Tuple[int, int], np.ndarray] = {}
    ll = np.asarray(tc, np.int64)
    assert ll.shape == (ty1 - ty0, tx1 - tx0)
    for r in range(levels, 0, -1):
        d = 1 << (levels - r)
        u0, v0 = _ceil_div(tx0, d), _ceil_div(ty0, d)
        u1, v1 = _ceil_div(tx1, d), _ceil_div(ty1, d)
        ll, hl, lh, hh = fd2d_53(ll, u0, v0, u1, v1)
        bands[(r, 1)] = hl
        bands[(r, 2)] = lh
        bands[(r, 3)] = hh
    bands[(0, 0)] = ll
    return bands


# ===========================================================================
# Forward irreversible 9/7 DWT — exact inverse of jp2._sr1d_97 (T.800
# F.4.8.1): four lifting steps (alpha, beta, gamma, delta) then scaling
# even /K, odd *K, with the same absolute-coordinate extension machinery.
# ===========================================================================

from tpukit.io.jp2 import _A97, _B97, _D97, _G97, _K97  # noqa: E402


def _fd1d_97(x: np.ndarray, i0: int) -> np.ndarray:
    """1D 9/7 analysis along the last axis over absolute coords
    [i0, i0+n); float output.  Inverse of jp2._sr1d_97."""
    n = x.shape[-1]
    if n == 0:
        return x.astype(np.float64)
    x = x.astype(np.float64)
    if n == 1:
        return x / _K97 if i0 % 2 == 0 else x * _K97
    ext = np.concatenate([x[..., 1:2], x, x[..., -2:-1]], axis=-1)
    out = ext.copy()
    e0 = (i0 + 1) % 2   # smallest ext index with even absolute coordinate
    je = np.arange(e0, n + 2, 2)
    je = je[(je >= 1) & (je <= n)]
    jo = np.arange(e0 + 1, n + 2, 2)
    jo = jo[(jo >= 1) & (jo <= n)]

    def _reext(a):
        a[..., 0] = a[..., 2]
        a[..., n + 1] = a[..., n - 1]

    out[..., jo] = ext[..., jo] + _A97 * (ext[..., jo - 1] + ext[..., jo + 1])
    _reext(out)
    out[..., je] = out[..., je] + _B97 * (out[..., je - 1] + out[..., je + 1])
    _reext(out)
    out[..., jo] = out[..., jo] + _G97 * (out[..., jo - 1] + out[..., jo + 1])
    _reext(out)
    out[..., je] = out[..., je] + _D97 * (out[..., je - 1] + out[..., je + 1])
    res = out[..., 1:n + 1]
    ev = ((np.arange(n) + i0) % 2) == 0
    return np.where(ev, res / _K97, res * _K97)


def fd2d_97(a: np.ndarray, u0: int, v0: int, u1: int, v1: int):
    """One 2D 9/7 analysis level over [u0,u1)x[v0,v1); inverse of
    jp2.sr2d_97."""
    assert a.shape == (v1 - v0, u1 - u0)
    a = np.swapaxes(_fd1d_97(np.swapaxes(a, -1, -2), v0), -1, -2)
    a = _fd1d_97(a, u0)
    ev_u = (-u0) % 2
    od_u = 1 - ev_u
    ev_v = (-v0) % 2
    od_v = 1 - ev_v
    return (a[ev_v::2, ev_u::2], a[ev_v::2, od_u::2],
            a[od_v::2, ev_u::2], a[od_v::2, od_u::2])


def fdwt2d_97(tc: np.ndarray, tx0: int, ty0: int, tx1: int, ty1: int,
              levels: int) -> Dict[Tuple[int, int], np.ndarray]:
    """Full forward 9/7 DWT; same band keying as fdwt2d_53."""
    bands: Dict[Tuple[int, int], np.ndarray] = {}
    ll = np.asarray(tc, np.float64)
    assert ll.shape == (ty1 - ty0, tx1 - tx0)
    for r in range(levels, 0, -1):
        d = 1 << (levels - r)
        u0, v0 = _ceil_div(tx0, d), _ceil_div(ty0, d)
        u1, v1 = _ceil_div(tx1, d), _ceil_div(ty1, d)
        ll, hl, lh, hh = fd2d_97(ll, u0, v0, u1, v1)
        bands[(r, 1)] = hl
        bands[(r, 2)] = lh
        bands[(r, 3)] = hh
    bands[(0, 0)] = ll
    return bands


# ===========================================================================
# Packet-header bit writer + tag-tree encoder — mirrors of jp2.HdrBits /
# jp2.TagTree (B.10.1 / B.10.2 in T.800).
# ===========================================================================

class HdrBitWriter:
    """Bit writer with 0xFF bit-stuffing; exact inverse of jp2.HdrBits."""

    def __init__(self):
        self.buf = bytearray()
        self.cur = 0
        self.bits = 0   # bits collected into cur
        self.cap = 8    # capacity of current byte (7 right after an 0xFF)

    def put(self, b: int):
        self.cur = (self.cur << 1) | (b & 1)
        self.bits += 1
        if self.bits == self.cap:
            self.buf.append(self.cur)
            self.cap = 7 if self.cur == 0xFF else 8
            self.cur = 0
            self.bits = 0

    def put_bits(self, v: int, n: int):
        for k in range(n - 1, -1, -1):
            self.put((v >> k) & 1)

    def flush(self) -> bytes:
        """Byte-align (zero padding); emit the stuffed zero byte a reader's
        flush skips when the last full byte was 0xFF."""
        if self.bits:
            # zero-padded partial byte can never be 0xFF (cap-bits > 0)
            self.buf.append(self.cur << (self.cap - self.bits))
        elif self.cap == 7:   # last appended byte was 0xFF
            self.buf.append(0)
        self.cur, self.bits, self.cap = 0, 0, 8
        return bytes(self.buf)


class TagTreeEnc:
    """Tag-tree encoder; bit-for-bit mirror of jp2.TagTree.decode."""

    def __init__(self, w: int, h: int, leaves: np.ndarray):
        dims: List[Tuple[int, int]] = []
        ww, hh = w, h
        while True:
            dims.append((ww, hh))
            if ww == 1 and hh == 1:
                break
            ww, hh = _ceil_div(ww, 2), _ceil_div(hh, 2)
        self.dims = dims
        self.off = []
        o = 0
        for a, b in dims:
            self.off.append(o)
            o += a * b
        self.vmin = [0] * o
        self.known = [False] * o
        # node value = min over descendant leaves
        self.value = [0] * o
        lv_vals = np.asarray(leaves, np.int64).reshape(h, w)
        for lv, (a, b) in enumerate(dims):
            if lv:
                lv_vals = np.minimum.reduceat(
                    lv_vals, np.arange(0, lv_vals.shape[0], 2), axis=0)
                lv_vals = np.minimum.reduceat(
                    lv_vals, np.arange(0, lv_vals.shape[1], 2), axis=1)
            self.value[self.off[lv]:self.off[lv] + a * b] = (
                lv_vals.reshape(-1).tolist())

    def _path(self, i: int, j: int) -> List[int]:
        p = []
        for lv, (a, b) in enumerate(self.dims):
            p.append(self.off[lv] + j * a + i)
            i //= 2
            j //= 2
        return p[::-1]

    def encode(self, bw: HdrBitWriter, i: int, j: int,
               threshold: int) -> bool:
        """Emit exactly the bits jp2.TagTree.decode(i, j, threshold) will
        read; returns True iff leaf value < threshold."""
        low = 0
        for n in self._path(i, j):
            if self.vmin[n] < low:
                self.vmin[n] = low
            while not self.known[n] and self.vmin[n] < threshold:
                if self.vmin[n] < self.value[n]:
                    bw.put(0)
                    self.vmin[n] += 1
                else:
                    bw.put(1)
                    self.known[n] = True
            low = self.vmin[n]
            if low >= threshold:
                return False
        return True


def _put_npasses(bw: HdrBitWriter, n: int):
    """Number-of-coding-passes codeword (B.10.6); mirror of the reader in
    jp2.JP2Decoder._read_packets."""
    if n == 1:
        bw.put(0)
    elif n == 2:
        bw.put(1)
        bw.put(0)
    elif n <= 5:
        bw.put_bits(0b11, 2)
        bw.put_bits(n - 3, 2)
    elif n <= 36:
        bw.put_bits(0b11, 2)
        bw.put_bits(3, 2)
        bw.put_bits(n - 6, 5)
    else:
        bw.put_bits(0b11, 2)
        bw.put_bits(3, 2)
        bw.put_bits(31, 5)
        bw.put_bits(n - 37, 7)


# ===========================================================================
# Per-band synthesis basis norms (5/3) for PCRD distortion weighting
# ===========================================================================

@lru_cache(maxsize=None)
def _band_norm_53(nb: int, orient: int) -> float:
    """Interior L2 norm of the reversible 5/3 synthesis basis for a band
    nb decomposition levels deep (orient 0=LL 1=HL 2=LH 3=HH), averaged
    over the 2x2 polyphase positions (same method as
    codecs/j2k_codec._subband_norms, but through the integer synthesis
    actually used here — scaled impulses make rounding negligible)."""
    from tpukit.io.jp2 import sr2d_53
    if nb == 0:
        return 1.0
    S = 1 << 16
    size = 16
    tot = 0.0
    for dy in (0, 1):
        for dx in (0, 1):
            zb = [np.zeros((size, size), np.int64) for _ in range(4)]
            zb[orient][size // 2 + dy, size // 2 + dx] = S
            a = sr2d_53(zb[0], zb[1], zb[2], zb[3],
                        0, 0, 2 * size, 2 * size)
            x0 = y0 = 0
            for _ in range(nb - 1):
                # The impulse response has compact support: crop `a` to its
                # nonzero bounding box (+4-sample zero margin, wider than
                # any 5/3 lifting reach) between levels, tracking absolute
                # coordinates, so arrays stay ~O(2^nb) wide instead of the
                # full 2^nb x 2^nb resolution grid.
                ys, xs = np.nonzero(a)
                m = 4
                ry0 = max(0, int(ys.min()) - m)
                ry1 = min(a.shape[0], int(ys.max()) + 1 + m)
                rx0 = max(0, int(xs.min()) - m)
                rx1 = min(a.shape[1], int(xs.max()) + 1 + m)
                a = a[ry0:ry1, rx0:rx1]
                x0, y0 = x0 + rx0, y0 + ry0
                z = np.zeros(a.shape, np.int64)
                a = sr2d_53(a, z, z, z, 2 * x0, 2 * y0,
                            2 * (x0 + a.shape[1]), 2 * (y0 + a.shape[0]))
                x0, y0 = 2 * x0, 2 * y0
            tot += float((a.astype(np.float64) ** 2).sum()) / (S * S)
    return math.sqrt(tot / 4.0)


@lru_cache(maxsize=None)
def _band_norm_97(nb: int, orient: int) -> float:
    """Interior L2 norm of the irreversible 9/7 synthesis basis, nb levels
    deep; same support-cropped impulse method as _band_norm_53 but through
    jp2.sr2d_97 in float."""
    from tpukit.io.jp2 import sr2d_97
    if nb == 0:
        return 1.0
    size = 16
    tot = 0.0
    for dy in (0, 1):
        for dx in (0, 1):
            zb = [np.zeros((size, size), np.float64) for _ in range(4)]
            zb[orient][size // 2 + dy, size // 2 + dx] = 1.0
            a = sr2d_97(zb[0], zb[1], zb[2], zb[3], 0, 0, 2 * size, 2 * size)
            x0 = y0 = 0
            for _ in range(nb - 1):
                ay = np.abs(a) > 1e-12
                ys, xs = np.nonzero(ay)
                m = 6  # 9/7 lifting reach per level is wider than 5/3's
                ry0 = max(0, int(ys.min()) - m)
                ry1 = min(a.shape[0], int(ys.max()) + 1 + m)
                rx0 = max(0, int(xs.min()) - m)
                rx1 = min(a.shape[1], int(xs.max()) + 1 + m)
                a = a[ry0:ry1, rx0:rx1]
                x0, y0 = x0 + rx0, y0 + ry0
                z = np.zeros(a.shape, np.float64)
                a = sr2d_97(a, z, z, z, 2 * x0, 2 * y0,
                            2 * (x0 + a.shape[1]), 2 * (y0 + a.shape[0]))
                x0, y0 = 2 * x0, 2 * y0
            tot += float((a ** 2).sum())
    return math.sqrt(tot / 4.0)


# ===========================================================================
# PCRD-opt: per-block convex hulls + global lambda search
# ===========================================================================

def _hull_points(pass_len: np.ndarray, wdist: np.ndarray):
    """Convex-hull truncation candidates: (pass_idx, len, slope) with
    strictly decreasing slope (dD/dL against the previous hull point,
    starting from the empty-block origin)."""
    hull: List[Tuple[int, int, float, float]] = []   # (p, L, D, slope_in)
    for p in range(len(pass_len)):
        L, D = int(pass_len[p]), float(wdist[p])
        while True:
            pl, pd = (hull[-1][1], hull[-1][2]) if hull else (0, 0.0)
            if D <= pd:
                L = -1  # no distortion gain beyond the previous point
                break
            dl = L - pl
            slope = math.inf if dl <= 0 else (D - pd) / dl
            if hull and slope >= hull[-1][3]:
                hull.pop()
                continue
            break
        if L >= 0:
            hull.append((p, L, float(wdist[p]), slope))
    return hull


# ===========================================================================
# Codestream assembly (single tile, single component, LRCP, 1 layer)
# ===========================================================================

_GUARD = 2


@dataclass
class _EncBand:
    r: int
    orient: int
    x0: int
    y0: int
    x1: int
    y1: int
    cw: int = 0
    ch: int = 0
    cbx0: int = 0
    cby0: int = 0
    blocks: list = field(default_factory=list)      # T1Block | None per cb
    hulls: list = field(default_factory=list)       # hull per cb
    coefs: list = field(default_factory=list)       # int32 quantized per cb
    sigplans: list = field(default_factory=list)    # lazy t1_sig_plan per cb
    numbps: int = 1                                 # Mb signalled via QCD
    maxbps: int = 0                                 # deepest block numbps
    eps: int = 0                                    # QCD exponent (9/7)
    mant: int = 0                                   # QCD mantissa (9/7)
    step: float = 1.0                               # Delta_b (9/7)


@dataclass
class _EncRes:
    r: int
    trx0: int
    try0: int
    trx1: int
    try1: int
    npw: int
    nph: int
    xcb: int
    ycb: int
    bands: List[_EncBand] = field(default_factory=list)


class J2CPlan:
    """Analysis result of one image: every code-block tier-1 encoded once
    with its convex-hull truncation candidates.  assemble() materializes a
    standard codestream for any byte budget without re-encoding."""

    def __init__(self, img: np.ndarray, depth: int, signed: bool,
                 levels: int = 5, xcb: int = 6, ycb: int = 6,
                 wavelet: str = "53", base_step: float = 1.0):
        img = np.asarray(img)
        if img.ndim != 2:
            raise ValueError("single-component (H, W) images only")
        if wavelet not in ("53", "97"):
            raise ValueError("wavelet must be '53' or '97'")
        h, w = img.shape
        if h < 1 or w < 1:
            raise ValueError("empty image")
        self.h, self.w = h, w
        self.depth, self.signed, self.levels = depth, bool(signed), levels
        self.xcb, self.ycb = xcb, ycb
        self.wavelet = wavelet
        self.guard = _GUARD
        # image-domain quantizer granularity for the 9/7 path: Delta_b =
        # base_step / norm_b, so every band contributes the same
        # reconstruction-error density at full quality (~83 dB ceiling for
        # 12-bit content at 1.0, matching OpenJPEG's default)
        self.base_step = float(base_step)
        tc = img.astype(np.int64)
        if not self.signed:
            tc = tc - (1 << (depth - 1))   # DC level shift (G.1.2)
        coeffs = _fdwt2d_native(tc, 0, 0, w, h, levels, wavelet)
        if coeffs is None:                 # numpy reference fallback
            if wavelet == "53":
                coeffs = fdwt2d_53(tc, 0, 0, w, h, levels)
            else:
                coeffs = fdwt2d_97(tc.astype(np.float64), 0, 0, w, h,
                                   levels)

        ppx = ppy = 15   # maximal precincts (Scod precinct flag unset)
        self.res: List[_EncRes] = []
        for r in range(levels + 1):
            d = 1 << (levels - r)
            trx1, try1 = _ceil_div(w, d), _ceil_div(h, d)
            npw = _ceil_div(trx1, 1 << ppx) if trx1 > 0 else 0
            nph = _ceil_div(try1, 1 << ppy) if try1 > 0 else 0
            excb = min(xcb, ppx - 1 if r > 0 else ppx)
            eycb = min(ycb, ppy - 1 if r > 0 else ppy)
            rinfo = _EncRes(r, 0, 0, trx1, try1, npw, nph, excb, eycb)
            nb = levels - r + 1
            if r == 0:
                geo = [(0, 0, 0)]
            else:
                geo = [(1, 1, 0), (2, 0, 1), (3, 1, 1)]
            for orient, xob, yob in geo:
                if r == 0:
                    bx1, by1 = _ceil_div(w, d), _ceil_div(h, d)
                else:
                    hstep = 1 << (nb - 1)
                    bx1 = _ceil_div(w - hstep * xob, 1 << nb)
                    by1 = _ceil_div(h - hstep * yob, 1 << nb)
                band = _EncBand(r, orient, 0, 0, max(bx1, 0), max(by1, 0))
                arr = coeffs[(r, orient)]
                assert arr.shape == (band.y1, band.x1), (
                    (r, orient, arr.shape, band.y1, band.x1))
                nbn = levels - r + 1 if r > 0 else levels
                norm = (_band_norm_53 if wavelet == "53"
                        else _band_norm_97)(nbn, orient)
                if wavelet == "97":
                    self._quantize_band(band, norm)
                    arr = (np.sign(arr)
                           * np.floor(np.abs(arr) / band.step)).astype(
                               np.int64)
                wgt = (band.step * norm) ** 2
                self._encode_band(band, arr, rinfo, wgt)
                rinfo.bands.append(band)
            self.res.append(rinfo)
        if wavelet == "97":
            # enough guard bits that every block's magnitude planes fit
            # under the signalled Mb = eps + guard - 1 (E-2)
            need = max((b.maxbps - b.eps + 1 for ri in self.res
                        for b in ri.bands), default=2)
            self.guard = min(7, max(2, need))
            for ri in self.res:
                for b in ri.bands:
                    b.numbps = b.eps + self.guard - 1

    def _quantize_band(self, band: _EncBand, norm: float):
        """Pick the QCD-representable step closest to base_step/norm
        (E-3: Delta_b = 2^(Rb - eps) * (1 + mant/2^11), Rb = depth+gain)."""
        gain = (0, 1, 1, 2)[band.orient]
        rb = self.depth + gain
        target = self.base_step / norm
        eps = rb - math.floor(math.log2(target))
        if eps > 31:
            eps = 31
        if eps < 0:
            eps = 0
        mant = int(round((target / 2.0 ** (rb - eps) - 1.0) * 2048.0))
        if mant >= 2048:   # rounding carried into the next octave
            mant = 0
            eps = max(0, eps - 1)
        mant = max(0, min(2047, mant))
        band.eps, band.mant = eps, mant
        band.step = float(2.0 ** (rb - eps) * (1.0 + mant / 2048.0))

    # -- per-band tier-1 encode --------------------------------------------
    def _encode_band(self, band: _EncBand, arr: np.ndarray, rinfo: _EncRes,
                     wgt: float):
        if band.x1 <= band.x0 or band.y1 <= band.y0:
            band.cw = band.ch = 0
            return
        xcb, ycb = rinfo.xcb, rinfo.ycb
        band.cbx0 = band.x0 >> xcb
        band.cby0 = band.y0 >> ycb
        band.cw = _ceil_div(band.x1, 1 << xcb) - band.cbx0
        band.ch = _ceil_div(band.y1, 1 << ycb) - band.cby0
        mb = 1
        for cj in range(band.ch):
            for ci in range(band.cw):
                gx0 = max((band.cbx0 + ci) << xcb, band.x0)
                gy0 = max((band.cby0 + cj) << ycb, band.y0)
                gx1 = min((band.cbx0 + ci + 1) << xcb, band.x1)
                gy1 = min((band.cby0 + cj + 1) << ycb, band.y1)
                sub = arr[gy0 - band.y0:gy1 - band.y0,
                          gx0 - band.x0:gx1 - band.x0]
                blk = t1_encode_block(sub, band.orient)
                band.coefs.append(np.ascontiguousarray(sub, np.int32))
                band.sigplans.append(None)
                if blk.numbps == 0:
                    band.blocks.append(None)
                    band.hulls.append([])
                else:
                    band.blocks.append(blk)
                    band.hulls.append(
                        _hull_points(blk.pass_len, blk.pass_dist * wgt))
                    mb = max(mb, blk.numbps)
        band.numbps = band.maxbps = mb

    # -- selection ------------------------------------------------------------
    def _slopes(self) -> np.ndarray:
        cached = getattr(self, "_slopes_arr", None)
        if cached is not None:
            return cached
        s = []
        for rinfo in self.res:
            for band in rinfo.bands:
                for hull in band.hulls:
                    s.extend(pt[3] for pt in hull)
        fin = sorted({x for x in s if math.isfinite(x)})
        self._slopes_arr = np.asarray(fin)
        return self._slopes_arr

    def _select(self, lam: float) -> List[List[Optional[int]]]:
        """Per band (flattened over res order), per code-block: chosen pass
        index (deepest hull point with slope >= lam) or None."""
        sel = []
        for rinfo in self.res:
            for band in rinfo.bands:
                picks: List[Optional[int]] = []
                for hull in band.hulls:
                    p = None
                    for (pi, _, _, slope) in hull:
                        if slope >= lam:
                            p = pi
                        else:
                            break
                    picks.append(p)
                sel.append(picks)
        return sel

    def _select_all(self) -> List[List[Optional[int]]]:
        sel = []
        for rinfo in self.res:
            for band in rinfo.bands:
                sel.append([b.npasses - 1 if b is not None else None
                            for b in band.blocks])
        return sel

    # -- exact size model (no byte emission) -------------------------------------
    def _sel_tables(self):
        """Flat per-resolution arrays for the exact-size fast path: hull
        slopes/passes/lengths concatenated over every code-block (slopes
        strictly descending within a block), zero-bitplane leaves, and
        grid dims.  Valid only for the one-precinct layout every tile
        <= 4096x4096 has (ppx=ppy=15); _size_at guards on that."""
        tabs = getattr(self, "_tabs", None)
        if tabs is not None:
            return tabs
        tabs = []
        for rinfo in self.res:
            pw = np.array([b.cw for b in rinfo.bands], np.int32)
            ph = np.array([b.ch for b in rinfo.bands], np.int32)
            hoffs = [0]
            hs, hn, hl = [], [], []
            zbp_parts = []
            for band in rinfo.bands:
                zbp = np.zeros(band.ch * band.cw, np.int64)
                for n, blk in enumerate(band.blocks):
                    hull = band.hulls[n]
                    if blk is not None:
                        zbp[n] = band.numbps - blk.numbps
                    hs.append(np.array([pt[3] for pt in hull], np.float64))
                    hn.append(np.array([pt[0] + 1 for pt in hull], np.int32))
                    hl.append(np.array([pt[1] for pt in hull], np.int64))
                    hoffs.append(hoffs[-1] + len(hull))
                zbp_parts.append(zbp)
            tabs.append({
                "pw": pw, "ph": ph,
                "zbp": (np.concatenate(zbp_parts) if zbp_parts
                        else np.empty(0, np.int64)),
                "hoffs": np.asarray(hoffs, np.int64),
                "hs": (np.concatenate(hs) if hs else np.empty(0)),
                "hn": (np.concatenate(hn) if hn
                       else np.empty(0, np.int32)),
                "hl": (np.concatenate(hl) if hl
                       else np.empty(0, np.int64)),
            })
        self._tabs = tabs
        return tabs

    def _fast_size_ok(self) -> bool:
        return all(r.npw == 1 and r.nph == 1 for r in self.res)

    def _size_at(self, lam: float) -> int:
        """Exact len(assemble(_select(lam))) without assembling: body
        bytes are the hulls' pass_len picks; packet-header bits (tag
        trees, npasses codewords, Lblock, 0xFF stuffing) are counted by
        the native mirror of _packet (j2k_pkt1_hdr_size).  Equality with
        real assembly is pinned in tests/test_j2c_enc.py."""
        lib = native.load()
        total = self._fixed_size()
        for tab in self._sel_tables():
            nblocks = int(tab["hoffs"].shape[0]) - 1
            m = tab["hs"] >= lam
            cs = np.concatenate(([0], np.cumsum(m)))
            cnt = cs[tab["hoffs"][1:]] - cs[tab["hoffs"][:-1]]
            inc = cnt > 0
            npn = np.zeros(nblocks, np.int32)
            slen = np.zeros(nblocks, np.int64)
            if inc.any():
                sel_idx = (tab["hoffs"][:-1] + cnt - 1)[inc]
                npn[inc] = tab["hn"][sel_idx]
                slen[inc] = tab["hl"][sel_idx]
            hdr = lib.j2k_pkt1_hdr_size(
                len(tab["pw"]),
                tab["pw"].ctypes.data_as(ct.POINTER(ct.c_int32)),
                tab["ph"].ctypes.data_as(ct.POINTER(ct.c_int32)),
                npn.ctypes.data_as(ct.POINTER(ct.c_int32)),
                tab["zbp"].ctypes.data_as(ct.POINTER(ct.c_int64)),
                slen.ctypes.data_as(ct.POINTER(ct.c_int64)))
            if hdr < 0:
                raise ValueError(f"packet size model failed: {hdr}")
            total += int(hdr) + int(slen.sum())
        return total

    def _fixed_size(self) -> int:
        fx = getattr(self, "_fixed", None)
        if fx is None:
            # main header + SOT (12) + SOD (2) + EOC (2)
            fx = self._fixed = len(self._main_header(1)) + 16
        return fx

    # -- packet + marker assembly ----------------------------------------------
    def _precinct_cb_range(self, rinfo: _EncRes, band: _EncBand,
                           pi: int, pj: int):
        ppx = ppy = 15
        px0 = max(pi << ppx, rinfo.trx0)
        py0 = max(pj << ppy, rinfo.try0)
        px1 = min((pi + 1) << ppx, rinfo.trx1)
        py1 = min((pj + 1) << ppy, rinfo.try1)
        if px1 <= px0 or py1 <= py0:
            return 0, 0, 0, 0
        if rinfo.r == 0:
            qx0, qy0, qx1, qy1 = px0, py0, px1, py1
        else:
            xob = 1 if band.orient in (1, 3) else 0
            yob = 1 if band.orient in (2, 3) else 0
            qx0 = _ceil_div(px0 - xob, 2)
            qy0 = _ceil_div(py0 - yob, 2)
            qx1 = _ceil_div(px1 - xob, 2)
            qy1 = _ceil_div(py1 - yob, 2)
        qx0, qy0 = max(qx0, band.x0), max(qy0, band.y0)
        qx1, qy1 = min(qx1, band.x1), min(qy1, band.y1)
        if qx1 <= qx0 or qy1 <= qy0:
            return 0, 0, 0, 0
        ci0 = (qx0 >> rinfo.xcb) - band.cbx0
        cj0 = (qy0 >> rinfo.ycb) - band.cby0
        ci1 = _ceil_div(qx1, 1 << rinfo.xcb) - band.cbx0
        cj1 = _ceil_div(qy1, 1 << rinfo.ycb) - band.cby0
        return ci0, cj0, ci1, cj1

    def _tile_body(self, sels: List[List[List[Optional[int]]]]) -> bytes:
        """LRCP packet stream for a LAYERED selection: sels[l] is the
        cumulative per-band/per-block chosen pass index for quality layer
        l (monotone: sels[l+1] extends sels[l]).  Each layer's packet
        carries only the incremental passes; inclusion tag trees, zbp
        trees and Lblock state persist per precinct across layers, and
        the first-inclusion layer is what the inclusion tree codes
        (B.10.4)."""
        L = len(sels)
        band_sels: Dict[int, List[List[Optional[int]]]] = {}
        bi = 0
        for rinfo in self.res:
            for band in rinfo.bands:
                band_sels[id(band)] = [sels[l][bi] for l in range(L)]
                bi += 1
        # per-band emitted-pass state; per-precinct coding state
        emitted: Dict[int, list] = {
            bid: [None] * len(s[0]) for bid, s in band_sels.items()}
        prec: Dict[Tuple[int, int, int], tuple] = {}
        out = bytearray()
        for l in range(L):
            for rinfo in self.res:
                for pj in range(rinfo.nph):
                    for pi in range(rinfo.npw):
                        out += self._packet(rinfo, pi, pj, band_sels,
                                            emitted, prec, l, L)
        return bytes(out)

    def _packet(self, rinfo: _EncRes, pi: int, pj: int, band_sels,
                emitted, prec, l: int, L: int) -> bytes:
        contrib = []   # (band, ci0, cj0, pw, ph, [(n, li, lj, prev, cur)])
        any_new = False
        for band in rinfo.bands:
            if band.cw == 0:
                continue
            ci0, cj0, ci1, cj1 = self._precinct_cb_range(rinfo, band, pi, pj)
            sel_l = band_sels[id(band)][l]
            cbs = []
            for cj in range(cj0, cj1):
                for ci in range(ci0, ci1):
                    n = cj * band.cw + ci
                    cur = sel_l[n] if band.blocks[n] is not None else None
                    prev = emitted[id(band)][n]
                    cbs.append((n, ci - ci0, cj - cj0, prev, cur))
                    if cur is not None and (prev is None or cur > prev):
                        any_new = True
            contrib.append((band, ci0, cj0, ci1 - ci0, cj1 - cj0, cbs))
        bw = HdrBitWriter()
        if not any_new:
            bw.put(0)                     # empty packet
            return bw.flush()
        bw.put(1)
        body = bytearray()
        for (band, ci0, cj0, pw, ph, cbs) in contrib:
            if not cbs:
                continue
            key = (id(band), pi, pj)
            if key not in prec:
                # inclusion leaves: the layer at which each block FIRST
                # contributes (L = never within this stream)
                first = np.full((ph, pw), L, np.int64)
                zbp_vals = np.zeros((ph, pw), np.int64)
                sels_all = band_sels[id(band)]
                for (n, li, lj, _, _) in cbs:
                    if band.blocks[n] is None:
                        continue
                    for ll in range(L):
                        if sels_all[ll][n] is not None:
                            first[lj, li] = ll
                            break
                    zbp_vals[lj, li] = band.numbps - band.blocks[n].numbps
                prec[key] = (TagTreeEnc(pw, ph, first),
                             TagTreeEnc(pw, ph, zbp_vals),
                             np.full((ph, pw), 3, np.int64))
            itree, ztree, lblock = prec[key]
            for (n, li, lj, prev, cur) in cbs:
                new = cur is not None and (prev is None or cur > prev)
                if prev is None:
                    inc = itree.encode(bw, li, lj, l + 1)
                    assert inc == new
                else:
                    bw.put(1 if new else 0)
                if not new:
                    continue
                if prev is None:
                    zb = 1
                    while not ztree.encode(bw, li, lj, zb):
                        zb += 1
                blk = band.blocks[n]
                npn = cur + 1 - (prev + 1 if prev is not None else 0)
                _put_npasses(bw, npn)
                # chunk: raw stream slice for non-final contributions (the
                # continuation must see the true bytes); the adjusted
                # minimal tail only when no later layer extends this block
                p0 = int(blk.pass_len[prev]) if prev is not None else 0
                is_final = not any(
                    band_sels[id(band)][ll][n] is not None
                    and band_sels[id(band)][ll][n] > cur
                    for ll in range(l + 1, L))
                if is_final:
                    chunk = blk.truncate(cur)[p0:]
                else:
                    chunk = blk.stream[p0:int(blk.pass_len[cur])]
                seglen = len(chunk)
                nfloor = int(math.floor(math.log2(npn)))
                need = max(0, seglen.bit_length() - nfloor
                           - int(lblock[lj, li]))
                for _ in range(need):
                    bw.put(1)
                bw.put(0)
                lblock[lj, li] += need
                bw.put_bits(seglen, int(lblock[lj, li]) + nfloor)
                body += chunk
                emitted[id(band)][n] = cur
        return bw.flush() + bytes(body)

    def _main_header(self, nlayers: int = 1) -> bytes:
        out = bytearray(b"\xffO")                     # SOC (0xFF4F)
        ssiz = (self.depth - 1) | (0x80 if self.signed else 0)
        out += struct.pack(">HHHIIIIIIIIHBBB", 0xFF51, 41, 0,
                           self.w, self.h, 0, 0, self.w, self.h, 0, 0,
                           1, ssiz, 1, 1)             # SIZ
        out += struct.pack(">HHBBHBBBBBB", 0xFF52, 12, 0, 0, nlayers, 0,
                           self.levels, self.xcb - 2, self.ycb - 2,
                           0, 1 if self.wavelet == "53" else 0)   # COD, LRCP
        nb = 3 * self.levels + 1
        if self.wavelet == "53":
            out += struct.pack(">HHB", 0xFF5C, 3 + nb, (self.guard << 5) | 0)
            for rinfo in self.res:                    # QCD exponents
                for band in rinfo.bands:
                    eps = max(0, min(31, band.numbps - self.guard + 1))
                    out.append(eps << 3)
        else:   # scalar expounded (style 2): 16-bit (eps, mant) per band
            out += struct.pack(">HHB", 0xFF5C, 3 + 2 * nb,
                               (self.guard << 5) | 2)
            for rinfo in self.res:
                for band in rinfo.bands:
                    out += struct.pack(">H", (band.eps << 11) | band.mant)
        return bytes(out)

    def assemble(self, sel: List[List[Optional[int]]]) -> bytes:
        return self.assemble_layered([sel])

    def assemble_layered(self, sels) -> bytes:
        """Codestream with len(sels) quality layers; sels must be
        cumulative (each layer's selection extends the previous)."""
        body = self._tile_body(sels)
        psot = 2 + 10 + 2 + len(body)
        out = bytearray(self._main_header(len(sels)))
        out += struct.pack(">HHHIBB", 0xFF90, 10, 0, psot, 0, 1)   # SOT
        out += b"\xff\x93" + body                                  # SOD
        out += b"\xff\xd9"                                         # EOC
        return bytes(out)

    # -- truncated-decode model -------------------------------------------------
    def _band_recon_cache(self, rinfo: _EncRes, band: _EncBand):
        """Per-band full-array model inputs, built once: significance-plan
        pass indexes (native replay, per code-block), magnitudes, signs,
        MSB planes, and the code-block region slices."""
        cache = getattr(band, "_rc", None)
        if cache is not None:
            return cache
        shape = (band.y1 - band.y0, band.x1 - band.x0)
        sig = np.full(shape, -1, np.int32)
        mag = np.zeros(shape, np.int32)     # |coef| of int32 tier-1 input
        sgn = np.zeros(shape, np.int8)
        regions = []
        xcb, ycb = rinfo.xcb, rinfo.ycb
        for n in range(len(band.blocks)):
            cj, ci = divmod(n, band.cw)
            gx0 = max((band.cbx0 + ci) << xcb, band.x0)
            gy0 = max((band.cby0 + cj) << ycb, band.y0)
            gx1 = min((band.cbx0 + ci + 1) << xcb, band.x1)
            gy1 = min((band.cby0 + cj + 1) << ycb, band.y1)
            sl = (slice(gy0 - band.y0, gy1 - band.y0),
                  slice(gx0 - band.x0, gx1 - band.x0))
            regions.append(sl)
            if band.blocks[n] is None:
                continue
            coefs = band.coefs[n]
            s = band.sigplans[n]
            if s is None:
                s = band.sigplans[n] = t1_sig_plan(coefs)
            sig[sl] = s
            mag[sl] = np.abs(coefs)
            sgn[sl] = np.sign(coefs).astype(np.int8)
        # MSB plane per coefficient (exact: frexp exponent)
        p0 = np.zeros(shape, np.int8)
        nz = mag > 0
        p0[nz] = (np.frexp(mag[nz].astype(np.float64))[1] - 1) \
            .astype(np.int8)
        band._rc = (sig, mag, sgn, p0, regions)
        return band._rc

    def _band_recon(self, rinfo: _EncRes, band: _EncBand, picks,
                    rev: bool) -> np.ndarray:
        shape = (band.y1 - band.y0, band.x1 - band.x0)
        arr = np.zeros(shape, np.int64 if rev else np.float64)
        if band.cw == 0 or arr.size == 0:
            return arr
        sig, mag, sgn, p0, regions = self._band_recon_cache(rinfo, band)
        # per-block truncation scalars broadcast to full-band maps
        Km = np.zeros(shape, np.int32)
        ql = np.zeros(shape, np.int32)
        any_inc = False
        for n, pick in enumerate(picks):
            blk = band.blocks[n]
            if blk is None or pick is None:
                continue
            any_inc = True
            K = pick + 1
            # refinement bits of plane q sit in the MRP at global pass
            # index 2 + 3*(M-2-q); decoded iff index <= K-1
            Km[regions[n]] = K
            ql[regions[n]] = max(blk.numbps - 2 - ((K - 3) // 3), 0)
        if not any_inc:
            return arr
        # fused native pass (j2k_band_recon) — same closed forms as the
        # numpy expressions below, which stay as the oracle fallback
        try:
            lib = native.load()
        except Exception:
            lib = None
        if lib is not None:
            r = lib.j2k_band_recon(
                sig.ctypes.data_as(ct.POINTER(ct.c_int32)),
                mag.ctypes.data_as(ct.POINTER(ct.c_int32)),
                sgn.ctypes.data_as(ct.POINTER(ct.c_int8)),
                p0.ctypes.data_as(ct.POINTER(ct.c_int8)),
                Km.ctypes.data_as(ct.POINTER(ct.c_int32)),
                ql.ctypes.data_as(ct.POINTER(ct.c_int32)),
                arr.size, float(band.step), 1 if rev else 0,
                arr.ctypes.data_as(ct.c_void_p))
            if r == 0:
                return arr
        alive = (sig >= 0) & (sig < Km)
        lastp = np.minimum(p0, ql).astype(np.int64)
        mag_dec = np.where(alive,
                           mag.astype(np.int64)
                           & ~((np.int64(1) << lastp) - 1), 0)
        if rev:
            half = np.where(lastp >= 1,
                            (np.int64(1) << np.maximum(lastp, 1)) >> 1,
                            0)
            return np.where(mag_dec > 0,
                            sgn.astype(np.int64) * (mag_dec + half), 0)
        half = 0.5 * np.exp2(lastp.astype(np.float64))
        return np.where(mag_dec > 0,
                        sgn.astype(np.float64) * (mag_dec + half)
                        * band.step, 0.0)

    def truncated_recon(self, sel: List[List[Optional[int]]]) -> np.ndarray:
        """Reconstruct EXACTLY what tpukit's JP2 decoder returns for
        ``assemble(sel)`` — without assembling or entropy-decoding
        anything. The native sig-plan replay (j2k_t1_sig_plan, once per
        code-block, cached) gives the pass at which each coefficient
        becomes significant; everything else about a pass truncation is
        closed form — the MSB plane is bit_length(|q|)-1, refinement bits
        live at fixed MRP pass indexes, and the decoder reconstructs at
        the per-coefficient midpoint 0.5·2^lastp (jp2.band_array_f /
        band_array). Same synthesis (sr2d_53/97), level shift and
        clipping as JP2Decoder.decode_component; model==decoder equality
        is pinned in tests/test_j2c_enc.py."""
        rev = self.wavelet == "53"
        arrs = []
        bi = 0
        for rinfo in self.res:
            for band in rinfo.bands:
                arrs.append(self._band_recon(rinfo, band, sel[bi], rev))
                bi += 1
        ll = arrs[0]
        ai = 1
        for r in range(1, self.levels + 1):
            hl, lh, hh = arrs[ai], arrs[ai + 1], arrs[ai + 2]
            ai += 3
            d = 1 << (self.levels - r)
            ll = _sr2d_native(ll, hl, lh, hh,
                              _ceil_div(self.w, d), _ceil_div(self.h, d),
                              rev)
        shift = 0 if self.signed else (1 << (self.depth - 1))
        lo = -(1 << (self.depth - 1)) if self.signed else 0
        if rev:
            return ll + shift
        return np.clip(np.rint(ll) + shift, lo,
                       lo + (1 << self.depth) - 1).astype(np.int64)

    # -- public assembly -------------------------------------------------------
    def lossless(self) -> bytes:
        """All passes of every block: bit-exact for the 5/3 reversible
        path; the quantizer-ceiling quality for the 9/7 path.  Cached —
        rate ladders probe it once per target."""
        full = getattr(self, "_lossless", None)
        if full is None:
            full = self._lossless = self.assemble(self._select_all())
        return full

    def at_sizes(self, targets) -> bytes:
        """Quality-progressive stream: one layer per ascending budget."""
        return _plan_at_sizes(self, targets)

    def at_size(self, target_bytes: int) -> bytes:
        """Largest codestream <= target_bytes (PCRD-opt lambda search);
        falls back to the lossless stream when the budget allows it."""
        full = self.lossless()
        if len(full) <= target_bytes:
            return full
        slopes = self._slopes()
        lo, hi = 0, len(slopes)          # lambda = slopes[i]; size dec in i
        best = self.assemble(self._select(math.inf))
        if len(best) > target_bytes:
            return best                  # headers alone exceed the budget
        while lo < hi:
            mid = (lo + hi) // 2
            lam = slopes[mid]
            cs = self.assemble(self._select(lam))
            if len(cs) <= target_bytes:
                best = cs
                hi = mid                 # try smaller lambda (bigger size)
            else:
                lo = mid + 1
        return best


def _plan_at_sizes(plan: "J2CPlan", targets) -> bytes:
    """Quality-progressive codestream: one layer per ascending byte
    budget.  Truncating the stream after layer l's packets decodes at
    roughly the quality a single-layer encode at targets[l] would give —
    standard J2K SNR scalability from the same one-time tier-1 analysis."""
    targets = sorted(int(t) for t in targets)
    slopes = plan._slopes()
    nid = len(slopes)          # candidate ids: nid=minimal, -1=all passes

    def sel_at(i):
        if i < 0:
            return plan._select_all()
        if i >= nid:
            return plan._select(math.inf)
        return plan._select(float(slopes[i]))

    sels: list = []
    prev = nid
    for t in targets:
        if prev > -1 and len(plan.assemble_layered(
                sels + [sel_at(-1)])) <= t:
            prev = -1
            sels.append(sel_at(-1))
            continue
        lo, hi = 0, prev       # smaller id = deeper selection
        best = prev
        while lo < hi:
            mid = (lo + hi) // 2
            if len(plan.assemble_layered(sels + [sel_at(mid)])) <= t:
                best = mid
                hi = mid
            else:
                lo = mid + 1
        prev = best
        sels.append(sel_at(best))
    return plan.assemble_layered(sels)


def wrap_jp2(codestream: bytes, w: int, h: int, depth: int,
             signed: bool) -> bytes:
    """Wrap a raw .j2c codestream in the minimal ISO 15444-1 JP2 file
    container (I.5): signature + ftyp + jp2h(ihdr, colr greyscale) + jp2c
    — what the reference's gdal_translate J2K path emits as .jp2 files
    (reference j2k_wrap.py:79-99)."""
    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    sig = box(b"jP  ", b"\r\n\x87\n")
    ftyp = box(b"ftyp", b"jp2 " + struct.pack(">I", 0) + b"jp2 ")
    bpc = (depth - 1) | (0x80 if signed else 0)
    ihdr = box(b"ihdr", struct.pack(">IIHBBBB", h, w, 1, bpc, 7, 0, 0))
    colr = box(b"colr", struct.pack(">BBBI", 1, 0, 0, 17))  # greyscale
    jp2h = box(b"jp2h", ihdr + colr)
    return sig + ftyp + jp2h + box(b"jp2c", codestream)


def at_size_multi(plans: List["J2CPlan"], target_bytes: int,
                  return_sel: bool = False):
    """Globally PCRD-optimal allocation of ONE byte budget across several
    single-component plans (e.g. the bands of a cube): a single
    rate-distortion slope threshold governs every code-block of every
    plan, so bytes flow to whichever band buys the most distortion —
    the multi-component generalization of J2CPlan.at_size.

    ``return_sel=True`` also returns the per-plan pass selections, so
    callers can reconstruct via the truncated-decode model
    (J2CPlan.truncated_recon) instead of entropy-decoding the streams.

    The bisection runs on the exact size MODEL (J2CPlan._size_at: numpy
    body sums + native packet-header bit counting) — bytes are assembled
    once, at the final slope, instead of at every trial."""
    full = [p.lossless() for p in plans]
    if sum(len(c) for c in full) <= target_bytes:
        sels = [p._select_all() for p in plans]
        return (full, sels) if return_sel else full
    slopes = np.unique(np.concatenate(
        [p._slopes() for p in plans] or [np.empty(0)]))

    if all(p._fast_size_ok() for p in plans):
        def size_at(lam: float) -> int:
            return sum(p._size_at(lam) for p in plans)

        best_lam = math.inf
        if size_at(math.inf) <= target_bytes:
            lo, hi = 0, len(slopes)
            while lo < hi:
                mid = (lo + hi) // 2
                if size_at(float(slopes[mid])) <= target_bytes:
                    best_lam = float(slopes[mid])
                    hi = mid
                else:
                    lo = mid + 1
        # (headers alone over budget -> minimal lam=inf stream, as before)
        best_sel = [p._select(best_lam) for p in plans]
        best = [p.assemble(s) for p, s in zip(plans, best_sel)]
        return (best, best_sel) if return_sel else best

    def at(lam: float):
        sels = [p._select(lam) for p in plans]
        return [p.assemble(s) for p, s in zip(plans, sels)], sels

    best, best_sel = at(math.inf)
    if sum(len(c) for c in best) > target_bytes:
        # headers alone exceed the budget
        return (best, best_sel) if return_sel else best
    lo, hi = 0, len(slopes)
    while lo < hi:
        mid = (lo + hi) // 2
        cs, sels = at(float(slopes[mid]))
        if sum(len(c) for c in cs) <= target_bytes:
            best, best_sel = cs, sels
            hi = mid
        else:
            lo = mid + 1
    return (best, best_sel) if return_sel else best


def encode_j2c(img: np.ndarray, depth: Optional[int] = None,
               signed: Optional[bool] = None, levels: int = 5,
               target_bytes=None, wavelet: str = "53") -> bytes:
    """Encode a single-component image to a standard .j2c codestream.

    wavelet "53" (reversible): lossless unless target_bytes is given.
    wavelet "97" (irreversible): PCRD-truncated lossy at target_bytes,
    or the quantizer-ceiling quality when no target is given.
    target_bytes may be a LIST of ascending budgets: the stream then
    carries one quality layer per budget (SNR scalability — truncate
    after any layer to get that budget's quality)."""
    img = np.asarray(img)
    if signed is None:
        signed = img.dtype.kind == "i"
    if depth is None:
        if img.dtype.kind in "iu":
            depth = img.dtype.itemsize * 8
        else:
            raise ValueError("depth required for non-integer input")
    plan = J2CPlan(img, depth, signed, levels, wavelet=wavelet)
    if target_bytes is None:
        return plan.lossless()
    if isinstance(target_bytes, (list, tuple)):
        return plan.at_sizes(target_bytes)
    return plan.at_size(target_bytes)
