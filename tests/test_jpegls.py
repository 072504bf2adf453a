# -*- coding: utf-8 -*-
"""JPEG-LS (T.87) codec tests: round-trip, NEAR bound, rate search, diff1."""

import numpy as np
import pytest

from tpukit.codecs.base import RateSpec
from tpukit.codecs.jpegls_codec import (JPEGLSCodec, derive_near, jls_decode,
                                        jls_encode)


def test_lossless_roundtrip_fuzz(rng):
    for _ in range(30):
        W = int(rng.integers(1, 64))
        H = int(rng.integers(1, 64))
        bits = int(rng.choice([8, 12, 16]))
        img = rng.integers(0, (1 << bits), (H, W)).astype(np.uint16)
        bs = jls_encode(img, 0, bits)
        np.testing.assert_array_equal(jls_decode(bs, W, H), img)


def test_near_bound(rng):
    img = (np.cumsum(rng.integers(-9, 10, (64, 64)), axis=1) % 4096).astype(np.uint16)
    for near in (1, 3, 10, 50):
        bs = jls_encode(img, near, 16)
        y = jls_decode(bs, 64, 64)
        maxerr = np.abs(img.astype(np.int32) - y.astype(np.int32)).max()
        assert maxerr <= near


def test_near_monotone_rate(rng):
    img = (np.cumsum(rng.integers(-20, 21, (128, 128)), axis=1) % 4096).astype(np.uint16)
    sizes = [len(jls_encode(img, n, 16)) for n in (0, 1, 4, 16, 64)]
    assert sizes == sorted(sizes, reverse=True), sizes


def test_jls_stream_is_standard_shaped(rng):
    img = rng.integers(0, 65536, (8, 8)).astype(np.uint16)
    bs = jls_encode(img, 0, 16)
    assert bs[:2] == b"\xff\xd8"           # SOI
    assert bs[2:4] == b"\xff\xf7"          # SOF55
    assert bs[-2:] == b"\xff\xd9"          # EOI
    assert bs[6] == 16                      # P
    # no unstuffed marker bytes inside entropy data
    i = bs.index(b"\xff\xda") + 10
    body = bs[i:-2]
    for j in range(len(body) - 1):
        if body[j] == 0xFF:
            assert body[j + 1] < 0x80, "missing bit-stuffing after FF"


def test_derive_near_targets_bpp(rng):
    band = (np.cumsum(rng.integers(-40, 41, (128, 128)), axis=1) % 4096).astype(np.uint16)
    lossless_bpp = 8.0 * len(jls_encode(band, 0, 16)) / band.size
    target = lossless_bpp / 2
    near = derive_near(RateSpec.of("bpp", target), band, "uint16")
    assert 1 <= near <= 255
    got_bpp = 8.0 * len(jls_encode(band, near, 16)) / band.size
    assert got_bpp < lossless_bpp
    assert abs(got_bpp - target) / target < 0.5  # coarse ladder, coarse bound


def test_codec_lossless_int16(tile_caseB):
    codec = JPEGLSCodec(preproc="none")
    res = codec.run(tile_caseB, "int16", RateSpec.none())
    np.testing.assert_array_equal(res.recon, tile_caseB)
    assert res.extras["nearlossless_eps"] == 0
    assert res.bitstream_bytes > 0


def test_codec_diff1_lossless(tile_caseB):
    codec = JPEGLSCodec(preproc="diff1")
    res = codec.run(tile_caseB, "int16", RateSpec.none())
    np.testing.assert_array_equal(res.recon, tile_caseB)
    assert res.extras["preproc"] == "diff1"


def test_codec_near_disables_diff1(tile_caseB, capsys):
    codec = JPEGLSCodec(preproc="diff1")
    res = codec.run(tile_caseB, "int16", RateSpec.of("nearlossless_eps", 4))
    assert res.extras["preproc"] == "none"
    err = np.abs(res.recon.astype(np.int32) - tile_caseB.astype(np.int32)).max()
    assert err <= 4


def test_codec_keep_bitstream(tile_caseA):
    codec = JPEGLSCodec()
    res = codec.run(tile_caseA, "uint16", RateSpec.none(), keep_bitstream=True)
    assert len(res.bitstreams) == 4
    assert sum(len(v) for v in res.bitstreams.values()) == res.bitstream_bytes


def test_decoder_survives_corrupt_streams(rng):
    """Truncated / bit-flipped / garbage streams must fail cleanly
    (RuntimeError from a negative native rc), never crash or overrun —
    includes the run-remainder bounds case (cnt == W - col)."""
    from tpukit.codecs.jpegls_codec import jls_decode, jls_encode

    img = rng.integers(0, 1 << 12, (24, 31)).astype(np.uint16)
    good = jls_encode(img, 0, 12)
    np.testing.assert_array_equal(jls_decode(good, 31, 24), img)
    streams = [good[:k] for k in range(2, len(good), 7)]
    for _ in range(300):
        b = bytearray(good)
        for _ in range(int(rng.integers(1, 6))):
            b[int(rng.integers(2, len(b)))] ^= 1 << int(rng.integers(0, 8))
        streams.append(bytes(b))
    streams.append(bytes(rng.integers(0, 256, 64, dtype=np.uint8)))
    ok = bad = 0
    for s in streams:
        try:
            out = jls_decode(s, 31, 24)
            assert out.shape == (24, 31)
            ok += 1
        except RuntimeError:
            bad += 1
    assert ok + bad == len(streams)
