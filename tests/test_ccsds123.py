# -*- coding: utf-8 -*-
"""CCSDS-123-class codec: lossless exactness + spectral-redundancy gains."""

import numpy as np
import pytest

from tpukit.codecs.base import RateSpec
from tpukit.codecs.ccsds123_codec import CCSDS123Codec


@pytest.fixture
def spectral_cube(rng):
    """Spectrally correlated int16 cube (shared spatial base × band gains)."""
    base = rng.integers(500, 3000, (32, 32)).astype(np.float64)
    gains = 1.0 + 0.3 * np.sin(np.linspace(0, 6, 16))
    cube = (base[None] * gains[:, None, None]
            + rng.normal(0, 8, (16, 32, 32))).astype(np.int16)
    return ((cube.view(np.uint16) >> 2) << 2).view(np.int16)


def test_lossless_roundtrip(spectral_cube):
    res = CCSDS123Codec().run(spectral_cube, "int16", RateSpec.none())
    np.testing.assert_array_equal(res.recon, spectral_cube)
    assert res.codec == "ccsds123_ext"
    assert res.extras["mode"] == "lossless_only"


def test_exploits_spectral_redundancy(spectral_cube):
    from tpukit.codecs.ccsds121_codec import CCSDS121Codec
    r123 = CCSDS123Codec().run(spectral_cube, "int16", RateSpec.none())
    r121 = CCSDS121Codec(tile=32, preproc="none").run(
        spectral_cube, "int16", RateSpec.none())
    assert r123.bitstream_bytes < r121.bitstream_bytes, \
        "inter-band predictor must beat the 1-D coder on correlated bands"


def test_uint16_and_random(rng):
    cube = rng.integers(0, 65536, (6, 16, 16)).astype(np.uint16)
    res = CCSDS123Codec().run(cube, "uint16", RateSpec.none())
    np.testing.assert_array_equal(res.recon, cube)


def test_keep_bitstream_and_decode_from_stream(spectral_cube):
    res = CCSDS123Codec().run(spectral_cube, "int16", RateSpec.none(),
                              keep_bitstream=True)
    bs = res.bitstreams["cube.tk123"]
    assert len(bs) == res.bitstream_bytes
    B, H, W = spectral_cube.shape
    out = CCSDS123Codec._decode(bs, B, H, W)
    np.testing.assert_array_equal(out.view(np.int16), spectral_cube)
