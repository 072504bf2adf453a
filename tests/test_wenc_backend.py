# -*- coding: utf-8 -*-
"""Dual entropy backend for the J2K wavelet codec (wavelet_common.wenc_*):
auto-selection between the CCSDS-121 Rice backend (zigzag fits 16 bits)
and the embedded bit-plane coder, round-trip exactness, and byte-exact
agreement between the host coder and the device size model
(j2k_codec.wenc_size_bytes)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpukit.codecs import wavelet_common as wc
from tpukit.codecs.j2k_codec import wenc_size_bytes


def test_rice_selected_and_roundtrip(rng):
    q = (rng.standard_t(3, 4096) * 40).astype(np.int32)
    bs = wc.wenc_encode(q)
    assert bs[0] & wc.RICE_MARK
    assert np.array_equal(wc.wenc_decode(bs, q.size), q)


def test_overflow_picks_bitplane_or_split(rng):
    """Zigzag > 16 bits disqualifies the plain Rice and wrle candidates;
    the min of the embedded coder and the Rice-split variant wins, and
    the model agrees either way."""
    import jax.numpy as jnp
    q = (rng.standard_t(3, 4096) * 40).astype(np.int32)
    q[7] = 1 << 20                       # zigzag > 16 bits
    bs = wc.wenc_encode(q)
    assert (not (bs[0] & wc.RICE_MARK)) or (bs[0] & wc.SPLIT_FLAG)
    assert np.array_equal(wc.wenc_decode(bs, q.size), q)
    model = int(np.asarray(wenc_size_bytes(jnp.asarray(q[None])))[0])
    assert model == len(bs)


def test_budget_forces_embedded_backend(rng):
    """A byte budget (CCSDS-122-style truncation) must use the embedded
    coder — the Rice stream is not truncatable."""
    q = (rng.standard_t(3, 4096) * 40).astype(np.int32)
    bs = wc.wenc_encode(q, max_bytes=256)
    assert not (bs[0] & wc.RICE_MARK) and len(bs) <= 256


def test_zigzag_involution(rng):
    q = rng.integers(-32768, 32768, 10000).astype(np.int32)
    assert np.array_equal(wc.unzigzag_np(wc.zigzag_np(q)), q)


def test_model_matches_coder_both_backends(rng):
    for t in range(24):
        n = 4096 if t % 2 else 512
        scale = 10 ** rng.uniform(0, 4.5)
        q = np.clip((rng.standard_t(3, n) * scale).astype(np.int64),
                    -2 ** 28, 2 ** 28 - 1).astype(np.int32)
        bs = wc.wenc_encode(q)
        model = int(np.asarray(wenc_size_bytes(jnp.asarray(q[None])))[0])
        assert model == len(bs), (t, scale, hex(bs[0]))
        assert np.array_equal(wc.wenc_decode(bs, n), q)


def test_quant_encode_ck_matches_plain(rng):
    """wenc_quant_encode_ck's quantization + checksums match the separate
    numpy quantize + wenc_encode route bit-for-bit."""
    coefs = rng.normal(0, 300, 4096).astype(np.float32)
    inv_steps = (1.0 / rng.uniform(0.5, 8.0, 4096)).astype(np.float32)
    for inv_base in (np.float32(0.25), np.float32(1 / 24.0)):
        bs, qc, s1, s2 = wc.wenc_quant_encode_ck(coefs, inv_steps, inv_base)
        qc2 = np.trunc(coefs * (inv_steps * inv_base)).astype(np.int32)
        assert np.array_equal(qc, qc2)
        assert bs == wc.wenc_encode(qc2)
        u = qc2.astype(np.uint32)
        exp1 = int(u.sum(dtype=np.uint64) & 0xFFFFFFFF)
        exp2 = int((u * u).sum(dtype=np.uint64) & 0xFFFFFFFF)
        to_i32 = lambda v: v - (1 << 32) if v >= (1 << 31) else v
        assert (s1, s2) == (to_i32(exp1), to_i32(exp2))


def test_mixed_backend_quality_ladder_roundtrip(rng):
    """A ladder spanning fine quantization (int16 overflow -> embedded
    backend) and coarse (Rice backend) through the REAL codec: stream
    sizes equal the model-first path and recons match exactly."""
    from tpukit.codecs.base import RateSpec
    from tpukit.codecs.registry import create

    base = rng.integers(300, 3000, (64, 64)).astype(np.int32)
    cube = ((np.clip(base[None] + rng.integers(-200, 200, (2, 64, 64)),
                     0, 4095)) << 4).astype(np.uint16)
    specs = [RateSpec.of("quality", q) for q in (20, 60, 100)]
    codec = create("j2k", entropy="device")
    with_streams = codec.sweep_rates(cube, "uint16", specs,
                                     keep_bitstream=True)
    model_first = codec.sweep_rates(cube, "uint16", specs)
    backends = set()
    for a, b in zip(with_streams, model_first):
        assert a.bitstream_bytes == b.bitstream_bytes
        assert a.bitstream_bytes == sum(len(v) for v in a.bitstreams.values())
        np.testing.assert_array_equal(np.asarray(a.recon),
                                      np.asarray(b.recon))
        backends.update(v[0] for v in a.bitstreams.values())
    # the ladder genuinely exercised distinct backends: plain Rice at
    # coarse quality, and at q=100 (int16 overflow) the min of the
    # embedded coder and the Rice-split variant
    from tpukit.codecs.wavelet_common import RICE_MARK, SPLIT_FLAG
    assert any((m & RICE_MARK) and not (m & SPLIT_FLAG) for m in backends)
    assert any((m & SPLIT_FLAG) or not (m & RICE_MARK) for m in backends)
    assert len(backends) >= 2


def test_sparse_config_selected_and_matches_model(rng):
    """The Rice candidate's (J=32, rsi=8) sparse config still follows the
    shared nnz rule (mirrored by the device model inside the min), and the
    full wenc selection stays byte-agreed with the model: at 1% density
    the wrle backend must now win outright, at 20% Rice keeps the stream."""
    import jax.numpy as jnp
    for frac in (0.01, 0.2):
        q = np.zeros(4096, np.int32)
        k = max(1, int(frac * q.size))
        ix = rng.choice(q.size, k, replace=False)
        q[ix] = rng.integers(-2000, 2000, k)
        # the rule itself (drives the Rice candidate on both sides)
        J, rsi = wc._rice_cfg(q)
        assert (J == wc.RICE_J_SPARSE) == (frac == 0.01)
        bs = wc.wenc_encode(q)
        # with large magnitudes at these densities the run-length backend
        # wins outright (Rice pays per sample, wrle per nonzero)
        assert bs[0] == wc.RLE_MARK
        assert np.array_equal(wc.wenc_decode(bs, q.size), q)
        model = int(np.asarray(wenc_size_bytes(jnp.asarray(q[None])))[0])
        assert model == len(bs), (frac, model, len(bs))
    # a dense plane keeps the Rice backend, with the rule's dense config
    qd = (rng.standard_t(3, 4096) * 40).astype(np.int32)
    bs = wc.wenc_encode(qd)
    assert bs[0] & wc.RICE_MARK
    assert (1 << (bs[0] & 0x07)) == wc._rice_cfg(qd)[0]


def test_quant_encode_sparse_agrees(rng):
    """The fused native pass picks the same config as the plain route."""
    coefs = np.zeros(4096, np.float32)
    ix = rng.choice(4096, 50, replace=False)
    coefs[ix] = rng.normal(0, 3000, 50)
    inv_steps = np.full(4096, 0.25, np.float32)
    bs, qc, s1, s2 = wc.wenc_quant_encode_ck(coefs, inv_steps,
                                             np.float32(1.0))
    qc2 = np.trunc(coefs * (inv_steps * np.float32(1.0))).astype(np.int32)
    assert np.array_equal(qc, qc2)
    assert bs == wc.wenc_encode(qc2)
