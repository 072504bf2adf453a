# -*- coding: utf-8 -*-
"""ctypes binding to the system CharLS — *oracle only*.

The reference's JPEG-LS path runs CharLS through
``imagecodecs.jpegls_encode/decode`` (reference
tools/codecs/jpegls/encode_one_band.py:56, decode_one_band.py:30).
tpukit's own clean-room ITU-T T.87 implementation
(tpukit/native/src/jpegls.cpp) is cross-validated against this binding in
tests: CharLS must decode tpukit streams and tpukit must decode CharLS
streams, sample-exactly. It is NOT used on any production path.

ABI: CharLS 2.x C API (charls/public_types.h) — every call returns a
``charls_jpegls_errc`` int32, 0 == success.
"""

from __future__ import annotations

import ctypes as ct
import ctypes.util
from typing import Optional, Tuple

import numpy as np


class _FrameInfo(ct.Structure):
    _fields_ = [("width", ct.c_uint32), ("height", ct.c_uint32),
                ("bits_per_sample", ct.c_int32),
                ("component_count", ct.c_int32)]


_lib: Optional[ct.CDLL] = None
_checked = False


def _load() -> Optional[ct.CDLL]:
    global _lib, _checked
    if _checked:
        return _lib
    _checked = True
    for name in ("libcharls.so.2", "libcharls.so",
                 ctypes.util.find_library("charls") or ""):
        if not name:
            continue
        try:
            lib = ct.CDLL(name)
            lib.charls_jpegls_encoder_create.restype = ct.c_void_p
            lib.charls_jpegls_decoder_create.restype = ct.c_void_p
            _lib = lib
            break
        except OSError:
            continue
    return _lib


def available() -> bool:
    return _load() is not None


def _ck(rc: int, what: str):
    if rc != 0:
        raise RuntimeError(f"CharLS {what} failed: errc={rc}")


class _PresetParams(ct.Structure):
    _fields_ = [("maximum_sample_value", ct.c_int32),
                ("threshold1", ct.c_int32), ("threshold2", ct.c_int32),
                ("threshold3", ct.c_int32), ("reset_value", ct.c_int32)]


def encode(img: np.ndarray, near: int = 0, bits: int = 16,
           presets: Optional[Tuple[int, int, int, int, int]] = None) -> bytes:
    """Encode one grayscale plane (H, W) uint8/uint16 -> .jls bytes.
    ``presets`` = (maxval, t1, t2, t3, reset) forces an LSE segment."""
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img)
    H, W = img.shape
    fi = _FrameInfo(W, H, int(bits), 1)
    enc = ct.c_void_p(lib.charls_jpegls_encoder_create())
    try:
        _ck(lib.charls_jpegls_encoder_set_frame_info(enc, ct.byref(fi)),
            "set_frame_info")
        _ck(lib.charls_jpegls_encoder_set_near_lossless(
            enc, ct.c_int32(int(near))), "set_near_lossless")
        if presets is not None:
            pp = _PresetParams(*[int(v) for v in presets])
            _ck(lib.charls_jpegls_encoder_set_preset_coding_parameters(
                enc, ct.byref(pp)), "set_presets")
        cap = ct.c_size_t(0)
        _ck(lib.charls_jpegls_encoder_get_estimated_destination_size(
            enc, ct.byref(cap)), "estimate_size")
        out = (ct.c_uint8 * max(cap.value, 4096))()
        _ck(lib.charls_jpegls_encoder_set_destination_buffer(
            enc, out, ct.c_size_t(len(out))), "set_destination")
        _ck(lib.charls_jpegls_encoder_encode_from_buffer(
            enc, img.ctypes.data_as(ct.c_void_p),
            ct.c_size_t(img.nbytes), ct.c_uint32(0)), "encode")
        n = ct.c_size_t(0)
        _ck(lib.charls_jpegls_encoder_get_bytes_written(enc, ct.byref(n)),
            "bytes_written")
        return bytes(bytearray(out)[:n.value])
    finally:
        lib.charls_jpegls_encoder_destroy(enc)


def decode(stream: bytes) -> Tuple[np.ndarray, int]:
    """Decode a .jls stream -> ((H, W) array, near)."""
    lib = _load()
    assert lib is not None
    src = (ct.c_uint8 * len(stream)).from_buffer_copy(stream)
    dec = ct.c_void_p(lib.charls_jpegls_decoder_create())
    try:
        _ck(lib.charls_jpegls_decoder_set_source_buffer(
            dec, src, ct.c_size_t(len(stream))), "set_source")
        _ck(lib.charls_jpegls_decoder_read_header(dec), "read_header")
        fi = _FrameInfo()
        _ck(lib.charls_jpegls_decoder_get_frame_info(dec, ct.byref(fi)),
            "get_frame_info")
        near = ct.c_int32(0)
        _ck(lib.charls_jpegls_decoder_get_near_lossless(
            dec, ct.c_int32(0), ct.byref(near)), "get_near")
        nbytes = ct.c_size_t(0)
        _ck(lib.charls_jpegls_decoder_get_destination_size(
            dec, ct.c_uint32(0), ct.byref(nbytes)), "destination_size")
        dtype = np.uint16 if fi.bits_per_sample > 8 else np.uint8
        out = np.zeros((fi.height, fi.width), dtype)
        assert out.nbytes == nbytes.value, (out.nbytes, nbytes.value)
        _ck(lib.charls_jpegls_decoder_decode_to_buffer(
            dec, out.ctypes.data_as(ct.c_void_p),
            ct.c_size_t(out.nbytes), ct.c_uint32(0)), "decode")
        return out, int(near.value)
    finally:
        lib.charls_jpegls_decoder_destroy(dec)
