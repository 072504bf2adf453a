# -*- coding: utf-8 -*-
"""ctypes oracle over the system libopenjp2 — the REAL engine behind the
reference's J2K path (gdal_translate -of JP2OpenJPEG, reference
j2k_wrap.py:79-105).  Used by tests to cross-validate tpukit's clean-room
JPEG 2000 codec pair, with full control of the code-block style bits
(selective AC bypass, termall, causal, reset, segsym) that Pillow's
binding does not expose.

No openjpeg headers ship on this box, so the encoder-parameters struct is
treated as an opaque buffer: opj_set_default_encoder_parameters fills it
and the few fields we set are located by scanning for their distinctive
default values (numresolution=6, cblockw=cblockh=64, roi_compno=-1).
Every discovered offset is sanity-checked; available() returns False
rather than guessing if the layout does not match.
"""

from __future__ import annotations

import ctypes as ct
import os
import tempfile
from typing import Optional, Tuple

import numpy as np

_OPJ_CODEC_J2K = 0
_OPJ_CLRSPC_GRAY = 2

_lib = None
_enc_off: Optional[Tuple[int, int, int, int, int]] = None


def _load():
    global _lib, _enc_off
    if _lib is not None:
        return _lib
    try:
        lib = ct.CDLL("libopenjp2.so.7")
    except OSError:
        try:
            lib = ct.CDLL("libopenjp2.so")
        except OSError:
            _lib = False
            return False
    lib.opj_version.restype = ct.c_char_p
    lib.opj_create_compress.restype = ct.c_void_p
    lib.opj_create_compress.argtypes = [ct.c_int]
    lib.opj_create_decompress.restype = ct.c_void_p
    lib.opj_create_decompress.argtypes = [ct.c_int]
    lib.opj_set_default_encoder_parameters.argtypes = [ct.c_void_p]
    lib.opj_set_default_decoder_parameters.argtypes = [ct.c_void_p]
    lib.opj_image_create.restype = ct.c_void_p
    lib.opj_image_create.argtypes = [ct.c_uint32, ct.c_void_p, ct.c_int]
    lib.opj_image_destroy.argtypes = [ct.c_void_p]
    lib.opj_setup_encoder.restype = ct.c_int
    lib.opj_setup_encoder.argtypes = [ct.c_void_p, ct.c_void_p, ct.c_void_p]
    lib.opj_setup_decoder.restype = ct.c_int
    lib.opj_setup_decoder.argtypes = [ct.c_void_p, ct.c_void_p]
    lib.opj_stream_create_default_file_stream.restype = ct.c_void_p
    lib.opj_stream_create_default_file_stream.argtypes = [ct.c_char_p,
                                                          ct.c_int]
    lib.opj_stream_destroy.argtypes = [ct.c_void_p]
    lib.opj_destroy_codec.argtypes = [ct.c_void_p]
    for fn, argn in (("opj_start_compress", 3), ("opj_encode", 2),
                     ("opj_end_compress", 2), ("opj_decode", 3),
                     ("opj_end_decompress", 2)):
        f = getattr(lib, fn)
        f.restype = ct.c_int
        f.argtypes = [ct.c_void_p] * argn
    lib.opj_read_header.restype = ct.c_int
    lib.opj_read_header.argtypes = [ct.c_void_p, ct.c_void_p,
                                    ct.POINTER(ct.c_void_p)]

    # discover encoder-parameter offsets from the defaults
    buf = (ct.c_uint8 * 262144)()
    lib.opj_set_default_encoder_parameters(ct.byref(buf))
    i32 = np.frombuffer(bytearray(buf), np.int32).copy()
    hits = [i for i in range(len(i32) - 5)
            if i32[i] == 6 and i32[i + 1] == 64 and i32[i + 2] == 64
            and i32[i + 5] == -1]          # numres, cbw, cbh, .., roi=-1
    if len(hits) != 1 or hits[0] < 202 or i32[hits[0] - 201] != 0:
        _lib = False
        return False
    i = hits[0]
    # (numresolution, mode/cblk_sty, irreversible, tcp_numlayers, rates[0])
    _enc_off = (i, i + 3, i + 4, i - 201, i - 200)
    _lib = lib
    return lib


def available() -> bool:
    return bool(_load())


class _CmptParm(ct.Structure):
    _fields_ = [("dx", ct.c_uint32), ("dy", ct.c_uint32),
                ("w", ct.c_uint32), ("h", ct.c_uint32),
                ("x0", ct.c_uint32), ("y0", ct.c_uint32),
                ("prec", ct.c_uint32), ("bpp", ct.c_uint32),
                ("sgnd", ct.c_uint32)]


def _image_comp0(img_ptr: int):
    """(w, h, prec, sgnd, data_ptr) of component 0; layout of
    opj_image_t / opj_image_comp_t is stable across openjpeg 2.x."""
    u32 = ct.cast(img_ptr, ct.POINTER(ct.c_uint32))
    numcomps = u32[4]
    comps = ct.cast(img_ptr + 24, ct.POINTER(ct.c_void_p))[0]
    c = ct.cast(comps, ct.POINTER(ct.c_uint32))
    w, h, prec, sgnd = c[2], c[3], c[6], c[8]
    data = ct.cast(comps + 48, ct.POINTER(ct.c_void_p))[0]
    return numcomps, w, h, prec, sgnd, data


def encode(img: np.ndarray, depth: int, signed: bool = False,
           cblk_sty: int = 0, irreversible: bool = False,
           rate: float = 0.0, levels: int = 5, prog: int = 0,
           sop: bool = False, eph: bool = False,
           precinct: Optional[int] = None) -> bytes:
    """Encode a single-component image to .j2c with explicit code-block
    style bits (Scod: 1=bypass 2=reset 4=termall 8=causal 16=predictable
    32=segsym), progression order (0..4 = LRCP RLCP RPCL PCRL CPRL),
    optional SOP/EPH markers and a uniform precinct size (log2).  rate is
    an OpenJPEG compression ratio (0 = lossless allocation)."""
    lib = _load()
    if not lib:
        raise RuntimeError("libopenjp2 unavailable")
    h, w = img.shape
    buf = (ct.c_uint8 * 262144)()
    lib.opj_set_default_encoder_parameters(ct.byref(buf))
    i32 = ct.cast(buf, ct.POINTER(ct.c_int32))
    f32 = ct.cast(buf, ct.POINTER(ct.c_float))
    off_res, off_mode, off_irr, off_layers, off_rate0 = _enc_off
    nres = min(levels + 1, 1 + max(0, min(w, h).bit_length() - 3))
    i32[off_res] = nres
    i32[off_mode] = int(cblk_sty)
    i32[off_irr] = 1 if irreversible else 0
    i32[off_layers] = 1
    f32[off_rate0] = float(rate)
    i32[5] = 1                          # cp_disto_alloc
    i32[13] = int(prog)                 # prog_order (csty is i32[12])
    if sop:
        i32[12] |= 2
    if eph:
        i32[12] |= 4
    if precinct is not None:
        # roi_compno is off_res+5; then roi_shift, res_spec, prcw_init[33],
        # prch_init[33] (openjpeg.h field order)
        i32[12] |= 1
        i32[off_res + 7] = 1                       # res_spec
        i32[off_res + 8] = 1 << precinct           # prcw_init[0]
        i32[off_res + 41] = 1 << precinct          # prch_init[0]

    parm = _CmptParm(1, 1, w, h, 0, 0, depth, depth, 1 if signed else 0)
    image = lib.opj_image_create(1, ct.byref(parm), _OPJ_CLRSPC_GRAY)
    if not image:
        raise RuntimeError("opj_image_create failed")
    u32 = ct.cast(image, ct.POINTER(ct.c_uint32))
    u32[0], u32[1], u32[2], u32[3] = 0, 0, w, h           # x0 y0 x1 y1
    _, cw, chh, cprec, _, data = _image_comp0(image)
    assert (cw, chh, cprec) == (w, h, depth), "comp layout mismatch"
    arr = np.ctypeslib.as_array(ct.cast(data, ct.POINTER(ct.c_int32)),
                                shape=(h * w,))
    arr[:] = np.asarray(img, np.int64).ravel().astype(np.int32)

    codec = lib.opj_create_compress(_OPJ_CODEC_J2K)
    try:
        if not lib.opj_setup_encoder(codec, ct.byref(buf), image):
            raise RuntimeError("opj_setup_encoder failed")
        fd, path = tempfile.mkstemp(suffix=".j2c")
        os.close(fd)
        try:
            stream = lib.opj_stream_create_default_file_stream(
                path.encode(), 0)
            try:
                if not (lib.opj_start_compress(codec, image, stream)
                        and lib.opj_encode(codec, stream)
                        and lib.opj_end_compress(codec, stream)):
                    raise RuntimeError("opj encode failed")
            finally:
                lib.opj_stream_destroy(stream)
            with open(path, "rb") as f:
                return f.read()
        finally:
            os.unlink(path)
    finally:
        lib.opj_destroy_codec(codec)
        lib.opj_image_destroy(image)


def decode(data: bytes) -> np.ndarray:
    """Decode a .j2c/.jp2 buffer through libopenjp2; returns component 0
    as int64 (no depth rescaling, unlike Pillow's binding)."""
    lib = _load()
    if not lib:
        raise RuntimeError("libopenjp2 unavailable")
    fd, path = tempfile.mkstemp(suffix=".j2c")
    with os.fdopen(fd, "wb") as f:
        f.write(data)
    try:
        codec = lib.opj_create_decompress(_OPJ_CODEC_J2K)
        image_p = ct.c_void_p()
        try:
            dbuf = (ct.c_uint8 * 262144)()
            lib.opj_set_default_decoder_parameters(ct.byref(dbuf))
            if not lib.opj_setup_decoder(codec, ct.byref(dbuf)):
                raise RuntimeError("opj_setup_decoder failed")
            stream = lib.opj_stream_create_default_file_stream(
                path.encode(), 1)
            try:
                if not lib.opj_read_header(stream, codec,
                                           ct.byref(image_p)):
                    raise RuntimeError("opj_read_header failed")
                if not (lib.opj_decode(codec, stream, image_p)
                        and lib.opj_end_decompress(codec, stream)):
                    raise RuntimeError("opj decode failed")
            finally:
                lib.opj_stream_destroy(stream)
            _, w, h, prec, sgnd, data_ptr = _image_comp0(image_p.value)
            arr = np.ctypeslib.as_array(
                ct.cast(data_ptr, ct.POINTER(ct.c_int32)),
                shape=(int(h) * int(w),)).astype(np.int64)
            return arr.reshape(int(h), int(w))
        finally:
            if image_p.value:
                lib.opj_image_destroy(image_p)
            lib.opj_destroy_codec(codec)
    finally:
        os.unlink(path)
