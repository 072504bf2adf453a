# -*- coding: utf-8 -*-
"""Code-block style conformance against the REAL libopenjp2.

The reference's J2K engine is OpenJPEG (behind gdal_translate,
reference j2k_wrap.py:79-105).  Pillow's binding cannot set code-block
styles, so these tests drive libopenjp2 directly through the ctypes
oracle (tpukit/native/openjpeg_oracle.py) to produce streams using
selective AC bypass (Scod 1), termall (4), reset (2), causal (8) and
segsym (32) — the multi-codeword-segment styles the tier-1/packet pair
decodes via t1_segments/block_segs."""

import numpy as np
import pytest

from tpukit.io.jp2 import JP2Decoder, t1_segments
from tpukit.native import openjpeg_oracle as oo

pytestmark = pytest.mark.skipif(not oo.available(),
                                reason="libopenjp2 oracle unavailable")


@pytest.fixture
def img(rng):
    gy, gx = np.mgrid[0:96, 0:96]
    return np.clip(2000 + 800 * np.sin(gy / 9) * np.cos(gx / 13)
                   + rng.normal(0, 200, (96, 96)), 0, 4095).astype(np.uint16)


def test_segment_schedule():
    # default: one MQ segment
    assert t1_segments(0, 7) == [(0, 7, False)]
    # termall: one segment per pass, all MQ without bypass
    assert t1_segments(4, 4) == [(0, 1, False), (1, 1, False),
                                 (2, 1, False), (3, 1, False)]
    # bypass: MQ passes 0..9, then raw {SPP,MRP} / MQ {CUP} alternation
    segs = t1_segments(1, 16)
    assert segs[0] == (0, 10, False)
    assert segs[1] == (10, 2, True)    # SPP+MRP raw
    assert segs[2] == (12, 1, False)   # CUP MQ
    assert segs[3] == (13, 2, True)
    assert segs[4] == (15, 1, False)
    # termall+bypass: singleton segments with the bypass raw flags
    tb = t1_segments(5, 12)
    assert [s[1] for s in tb] == [1] * 12
    assert [s[2] for s in tb] == [False] * 10 + [True, True]


@pytest.mark.parametrize("sty", [1, 4, 5, 9, 36, 47])
def test_lossless_styles_sample_exact(img, sty):
    cs = oo.encode(img, 12, False, cblk_sty=sty)
    dec = JP2Decoder(cs).decode_component(0, 0, 0)
    np.testing.assert_array_equal(dec, img.astype(np.int64))


@pytest.mark.parametrize("sty", [1, 4, 5])
def test_lossy_styles_match_openjpeg(img, sty):
    for rate in (8.0, 32.0):
        cs = oo.encode(img, 12, False, cblk_sty=sty,
                       irreversible=True, rate=rate)
        ours = JP2Decoder(cs).decode_component(0, 0, 0)
        theirs = oo.decode(cs)
        assert np.abs(ours - theirs).max() <= 1


def test_signed_bypass(rng):
    s = rng.integers(-3000, 3000, (77, 41)).astype(np.int16)
    cs = oo.encode(s, 13, True, cblk_sty=1)
    np.testing.assert_array_equal(
        JP2Decoder(cs).decode_component(0, 0, 0), s.astype(np.int64))


@pytest.mark.parametrize("prog", [1, 2, 3, 4])
def test_progression_orders(img, prog):
    """RLCP/RPCL/PCRL/CPRL packet orders, with and without precincts and
    SOP/EPH, decode sample-exactly (150x200 forces unaligned precinct
    grids at several resolutions)."""
    im = img[:img.shape[0] - 6, :]   # non-square, odd-ish geometry
    for prec in (None, 5):
        for sop in (False, True):
            cs = oo.encode(im, 12, False, prog=prog, precinct=prec,
                           sop=sop, eph=sop)
            dec = JP2Decoder(cs).decode_component(0, 0, 0)
            np.testing.assert_array_equal(dec, im.astype(np.int64))


def test_bypass_with_precincts(img):
    cs = oo.encode(img, 12, False, cblk_sty=1, prog=3, precinct=5)
    np.testing.assert_array_equal(
        JP2Decoder(cs).decode_component(0, 0, 0), img.astype(np.int64))


def _pil():
    try:
        from PIL import Image
        return Image
    except Exception:  # pragma: no cover
        return None


@pytest.fixture
def rgb(rng):
    gy, gx = np.mgrid[0:80, 0:112]
    base = np.stack([(120 + 80 * np.sin(gy / 9 + k)).astype(np.int64)
                     for k in range(3)], -1)
    return np.clip(base + rng.integers(0, 30, base.shape),
                   0, 255).astype(np.uint8)


@pytest.mark.parametrize("mct", [0, 1])
def test_multicomponent_lossless(rgb, mct):
    """RGB codestreams (packets interleave components; mct=1 adds the
    reversible RCT) decode bit-exactly."""
    import io
    PIL = _pil()
    if PIL is None:
        pytest.skip("Pillow unavailable")
    buf = io.BytesIO()
    PIL.fromarray(rgb, "RGB").save(buf, "JPEG2000", irreversible=False,
                                   mct=mct)
    dec = JP2Decoder(buf.getvalue())
    ours = np.stack([dec.decode_component(0, 0, c) for c in range(3)], -1)
    np.testing.assert_array_equal(ours, rgb.astype(np.int64))


@pytest.mark.parametrize("mct", [0, 1])
def test_multicomponent_irreversible_matches_pillow(rgb, mct):
    """Irreversible RGB (ICT when mct=1), rate-allocated over 3 quality
    layers, decodes within +-1 LSB of OpenJPEG's own reconstruction."""
    import io
    PIL = _pil()
    if PIL is None:
        pytest.skip("Pillow unavailable")
    buf = io.BytesIO()
    PIL.fromarray(rgb, "RGB").save(buf, "JPEG2000", irreversible=True,
                                   quality_mode="rates",
                                   quality_layers=[24, 12, 4], mct=mct)
    d = buf.getvalue()
    pil = np.asarray(PIL.open(io.BytesIO(d))).astype(np.int64)
    dec = JP2Decoder(d)
    ours = np.stack([dec.decode_component(0, 0, c) for c in range(3)], -1)
    assert np.abs(ours - pil).max() <= 1


def test_oracle_agrees_with_pillow_on_defaults(img):
    """The ctypes oracle and Pillow drive the same libopenjp2 — their
    default-style lossless streams must decode identically."""
    cs = oo.encode(img, 12, False)
    np.testing.assert_array_equal(oo.decode(cs), img.astype(np.int64))
