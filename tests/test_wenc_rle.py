# -*- coding: utf-8 -*-
"""Sparse run-length (wrle) entropy backend: round-trip, exact device size
model, and min-selection agreement with the host coder.

The reference's J2K engine is an external binary (reference
tools/codecs/j2k/j2k_wrap.py), so the lossy per-band format is tpukit's
own; the invariant under test is the framework's: the device size model
(j2k_codec.wenc_size_bytes) must equal the host coder's stream length
byte-for-byte for ANY coefficient input, or device-resident rate control
would disagree with materialized streams."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpukit.codecs import wavelet_common as wc
from tpukit.codecs.j2k_codec import wenc_size_bytes


def _sparse(rng, n, dens, lo=-32768, hi=32768):
    q = np.zeros(n, np.int32)
    k = int(round(n * dens))
    if k:
        pos = rng.choice(n, k, replace=False)
        v = rng.integers(lo, hi, k).astype(np.int32)
        v[v == 0] = 7
        q[pos] = v
    return q


SEGLAYOUTS = [
    (4096, None),
    (4096, ((0, 1024), (1024, 2048), (2048, 4096))),
    (300, ((0, 1), (1, 4), (4, 300))),
    (128 * 128, "subbands"),
]


@pytest.mark.parametrize("n,segb", SEGLAYOUTS)
@pytest.mark.parametrize("dens", [0.0, 0.001, 0.02, 0.3, 1.0])
def test_rle_roundtrip_and_model(rng, n, segb, dens):
    if segb == "subbands":
        segb = wc.subband_seg_bounds(128, 128, 3)
    q = _sparse(rng, n, dens)
    bs = wc.rle_encode(q, segb)
    assert bs[0] == wc.RLE_MARK
    assert np.array_equal(wc.rle_decode(bs[1:], n, segb), q)
    assert len(bs) == wc.rle_size_host(q, segb)
    model = int(np.asarray(
        wc.rle_size_bytes_model(jnp.asarray(q[None]), segb))[0])
    assert model == len(bs)


def test_rle_extremes(rng):
    n = 256
    segb = ((0, 128), (128, 256))
    # extreme magnitudes at the int16 eligibility edge, adjacent nonzeros,
    # nnz == seglen in one segment, empty other segment
    q = np.zeros(n, np.int32)
    q[:128] = rng.choice([-32768, 32767, -1, 1], 128).astype(np.int32)
    bs = wc.rle_encode(q, segb)
    assert np.array_equal(wc.rle_decode(bs[1:], n, segb), q)
    model = int(np.asarray(
        wc.rle_size_bytes_model(jnp.asarray(q[None]), segb))[0])
    assert model == len(bs)


def test_rle_malformed_stream_rejected():
    with pytest.raises(RuntimeError):
        wc.rle_decode(b"\xff\xff\xff\xff", 64, None)


def test_wenc_decode_rejects_unknown_marker_and_bad_split():
    with pytest.raises(RuntimeError):
        wc.wenc_decode(b"\x01\x02\x03", 16)          # marker 0x01 invalid
    with pytest.raises(RuntimeError):
        wc.wenc_decode(b"", 16)
    # split header with corrupt s byte / truncated LSB block
    with pytest.raises(RuntimeError):
        wc.split_decode(bytes([0xA6, 200, 0, 0]), 4096)
    with pytest.raises(RuntimeError):
        wc.split_decode(bytes([0xA6, 16]), 4096)


def test_wenc_min_selection_agreement(rng):
    """Across the density sweep, len(wenc_encode) == device model and the
    stream decodes — regardless of which backend won."""
    segb = wc.subband_seg_bounds(128, 128, 3)
    n = 128 * 128
    seen = set()
    for dens in (0.0, 0.0005, 0.004, 0.03, 0.15, 0.5, 0.95):
        q = _sparse(rng, n, dens, -300, 300)
        bs = wc.wenc_encode(q, segbounds=segb)
        seen.add(bs[0] & 0xE0)
        model = int(np.asarray(wenc_size_bytes(jnp.asarray(q[None]),
                                               segb))[0])
        assert model == len(bs), (dens, hex(bs[0]))
        assert np.array_equal(wc.wenc_decode(bs, n, segb), q)
    assert wc.RLE_MARK in seen          # sparse points pick wrle
    assert wc.RICE_MARK in seen         # dense points keep Rice


def test_wenc_rle_selected_only_when_strictly_smaller(rng):
    """At 1% density on a 64k plane wrle must win (its regime), and the
    winning stream must be strictly smaller than the Rice alternative."""
    from tpukit.native import ccsds121_host as ck

    segb = wc.subband_seg_bounds(256, 256, 5)
    q = _sparse(rng, 256 * 256, 0.01, -64, 64)
    bs = wc.wenc_encode(q, segbounds=segb)
    assert bs[0] == wc.RLE_MARK
    J, rsi = wc._rice_cfg(q)
    rice = 1 + len(ck.encode(wc.zigzag_np(q), wc.RICE_BITS, J, rsi,
                             flags=0))
    assert len(bs) < rice


def test_quant_encode_ck_matches_wenc_encode(rng):
    """The fused native quantize+encode path picks the same backend and
    emits the same bytes as quantize-then-wenc_encode."""
    segb = wc.subband_seg_bounds(64, 64, 3)
    n = 64 * 64
    coefs = (rng.normal(0, 1, n) *
             (rng.random(n) < 0.02)).astype(np.float32) * 900
    inv_steps = np.full(n, 1 / 16.0, np.float32)
    for inv_base in (1.0, 0.125):
        bs, qc, s1, s2 = wc.wenc_quant_encode_ck(coefs, inv_steps,
                                                 np.float32(inv_base),
                                                 segbounds=segb)
        qc2 = np.trunc(coefs * (inv_steps * np.float32(inv_base))) \
            .astype(np.int32)
        assert np.array_equal(qc, qc2)
        assert bs == wc.wenc_encode(qc2, segbounds=segb)
        assert np.array_equal(wc.wenc_decode(bs, n, segb), qc2)


def test_split_roundtrip_model_and_boundary_continuity(rng):
    """Rice-split variant (zigzag > 16 bits): exact round-trip incl.
    int32 extremes, model == host, and selection continuity across the
    int16 boundary (the 8 bpp rate dead zone it was built to close)."""
    q = rng.integers(-2 ** 31, 2 ** 31, 4096).astype(np.int32)
    q[0], q[1] = -2 ** 31, 2 ** 31 - 1
    bs = wc.split_encode(q)
    assert bs[0] & wc.RICE_MARK and bs[0] & wc.SPLIT_FLAG
    assert np.array_equal(wc.split_decode(bs, q.size), q)
    assert len(bs) == wc.split_size_host(q)

    # overflow regime through the full selection: split or bpc wins,
    # model byte-agrees, stream decodes
    for scale in (3e4, 3e5, 3e6):
        q = (rng.standard_t(2.5, 4096) * scale).astype(np.int64)
        q = np.clip(q, -2 ** 31 + 1, 2 ** 31 - 1).astype(np.int32)
        q[0] = 2 ** 20                      # force !fits16
        bs = wc.wenc_encode(q)
        model = int(np.asarray(wenc_size_bytes(jnp.asarray(q[None])))[0])
        assert model == len(bs), (scale, hex(bs[0]))
        assert np.array_equal(wc.wenc_decode(bs, q.size), q)


def test_old_backend_streams_still_decode(rng):
    """Back-compat: streams whose min-selection picked Rice or the embedded
    coder decode through the same dispatch, with and without segbounds."""
    n = 4096
    dense = rng.integers(-2000, 2000, n).astype(np.int32)  # Rice wins
    bs = wc.wenc_encode(dense)
    assert bs[0] & wc.RICE_MARK
    assert np.array_equal(wc.wenc_decode(bs, n), dense)
    big = rng.integers(-900000, 900000, n).astype(np.int32)  # !fits -> bpc
    bs = wc.wenc_encode(big)
    assert (bs[0] & 0xC0) == 0x40
    assert np.array_equal(wc.wenc_decode(bs, n), big)
