# -*- coding: utf-8 -*-
"""Codec registry: name -> constructor, with reference-label aliases so
CSV codec ids from the reference map onto tpukit codecs
(reference overlay_means.py:26-34 CODEC_LABELS keys)."""

from __future__ import annotations

from typing import Callable, Dict

_ALIASES = {
    "ccsds121_ext": "ccsds121",
    "ccsds122_ext": "ccsds122",
    "ccsds123_ext": "ccsds123",
    "jpegls_subproc": "jpegls",
    "j2k_gdal": "j2k",
    "png_lossless": "png",
}


def _builtins() -> Dict[str, Callable]:
    reg: Dict[str, Callable] = {}
    from tpukit.codecs.ccsds121_codec import CCSDS121Codec
    reg["ccsds121"] = CCSDS121Codec
    try:
        from tpukit.codecs.jpegls_codec import JPEGLSCodec
        reg["jpegls"] = JPEGLSCodec
    except ImportError:
        pass
    try:
        from tpukit.codecs.png_codec import PNGCodec
        reg["png"] = PNGCodec
    except ImportError:
        pass
    try:
        from tpukit.codecs.j2k_codec import J2KCodec
        reg["j2k"] = J2KCodec
    except ImportError:
        pass
    try:
        from tpukit.codecs.ccsds122_codec import CCSDS122Codec
        reg["ccsds122"] = CCSDS122Codec
    except ImportError:
        pass
    try:
        from tpukit.codecs.ccsds123_codec import CCSDS123Codec
        reg["ccsds123"] = CCSDS123Codec
    except ImportError:
        pass
    return reg


def create(name: str, **opts):
    key = _ALIASES.get(name, name)
    reg = _builtins()
    if key not in reg:
        raise KeyError(f"Unknown codec '{name}'. Known: {sorted(reg)}")
    return reg[key](**opts)


def names():
    return sorted(_builtins())
