# -*- coding: utf-8 -*-
import io

import numpy as np
import pytest

from tpukit.codecs.base import RateSpec
from tpukit.codecs.png_codec import PNGCodec, png_encode, png_decode, _png_decode_py


def test_png_roundtrip_16bit(rng):
    img = rng.integers(0, 65536, (37, 53)).astype(np.uint16)
    bs = png_encode(img, 6)
    np.testing.assert_array_equal(png_decode(bs), img)
    np.testing.assert_array_equal(_png_decode_py(bs), img)


def test_png_roundtrip_8bit(rng):
    img = rng.integers(0, 256, (21, 19)).astype(np.uint8)
    bs = png_encode(img, 9)
    np.testing.assert_array_equal(png_decode(bs), img)
    np.testing.assert_array_equal(_png_decode_py(bs), img)


def test_png_readable_by_pillow(rng):
    PIL = pytest.importorskip("PIL.Image")
    img = (np.cumsum(rng.integers(-9, 10, (40, 40)), axis=1) % 4096).astype(np.uint16)
    bs = png_encode(img, 6)
    arr = np.array(PIL.open(io.BytesIO(bs)))
    np.testing.assert_array_equal(arr.astype(np.uint16), img)


def test_png_compresses_smooth(rng):
    base = np.tile(np.arange(256, dtype=np.uint16) * 16, (64, 1))
    bs = png_encode(base, 6)
    assert len(bs) < base.nbytes // 4


def test_codec_lossless(tile_caseB):
    codec = PNGCodec(zlevel=6)
    res = codec.run(tile_caseB, "int16", RateSpec.of("quality", 50))  # rate ignored
    np.testing.assert_array_equal(res.recon, tile_caseB)
    assert res.codec == "png_lossless"
    assert res.extras["zlevel"] == 6


def test_codec_keep_bitstream(tile_caseA):
    res = PNGCodec().run(tile_caseA, "uint16", RateSpec.none(), keep_bitstream=True)
    assert set(res.bitstreams) == {f"b{i:02d}.png" for i in range(1, 5)}

def test_compat_writer_matches_reference_chain(rng):
    """writer='compat' must produce byte-identical PNGs to the reference's
    imageio-first writer chain (png_wrap.py:86-99), so PNG baseline sizes
    (CR/bpp columns) reproduce exactly."""
    iio = pytest.importorskip("imageio.v3")
    from tpukit.codecs.png_codec import png_encode_compat
    imgs = [rng.integers(0, 65536, (48, 40)).astype(np.uint16),
            (np.tile(np.arange(64, dtype=np.uint16) * 13, (32, 1))),
            rng.integers(0, 256, (20, 30)).astype(np.uint8)]
    for img in imgs:
        for z in (1, 6, 9):
            buf = io.BytesIO()
            iio.imwrite(buf, img, extension=".png", compress_level=z)
            bs = png_encode_compat(img, z)
            assert bs == buf.getvalue()
            np.testing.assert_array_equal(
                png_decode(bs).astype(img.dtype), img)


def test_codec_compat_writer_lossless(tile_caseB):
    pytest.importorskip("imageio.v3")
    res = PNGCodec(zlevel=6, writer="compat").run(
        tile_caseB, "int16", RateSpec.none(), keep_bitstream=True)
    np.testing.assert_array_equal(res.recon, tile_caseB)
    assert res.extras["writer"] == "compat"
