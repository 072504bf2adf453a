# -*- coding: utf-8 -*-
"""Device model of the CCSDS 122.0-B BPE (codecs/bpe122_model.py) vs the
native coder (native/src/bpe122.cpp): byte counts and truncated-decode
reconstructions must agree EXACTLY — this is what lets the ccsds122 rate
ladder run HBM-resident while emitting standard-structured streams."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpukit.codecs import bpe122
from tpukit.codecs import bpe122_model as bm
from tpukit.kernels import dwt as dwtk


@pytest.fixture(scope="module")
def jitted():
    return (jax.jit(bm.bpe_stream_layout), jax.jit(bm.bpe_decode_at))


def _blocks(c):
    Hp, Wp = c.shape
    g, _ = bpe122.block_indices(Hp, Wp)
    wexp = bpe122.weight_exp_map(Hp, Wp)
    return ((c.astype(np.int32) << wexp).reshape(-1))[g]


def _cases(rng):
    yield "zeros", np.zeros((16, 16), np.int32)
    d = np.zeros((16, 16), np.int32)
    d[:2, :2] = [[100, -3], [7, 2]]
    yield "dc-only", d
    yield "small", rng.integers(-5, 6, (16, 16)).astype(np.int32)
    yield "rand", rng.integers(-2000, 2000, (32, 48)).astype(np.int32)
    yield "ragged", rng.integers(-900, 900, (24, 40)).astype(np.int32)
    sp = rng.integers(-20, 21, (32, 32)).astype(np.int32)
    sp[rng.random((32, 32)) < 0.85] = 0
    yield "sparse", sp
    gy, gx = np.mgrid[0:64, 0:64]
    img = (2000 * np.sin(gy / 9.0) * np.cos(gx / 13.0) + 4000).astype(
        np.int32)
    yield "dwt", np.asarray(dwtk.dwt2(jnp.asarray(img), "97m", 3))


def test_size_model_matches_coder(rng, jitted):
    layout_j, _ = jitted
    for name, c in _cases(rng):
        blocks = _blocks(c)
        bs = bpe122.bpe_encode_blocks(blocks)
        got = int(layout_j(jnp.asarray(blocks))["full_bytes"])
        assert got == len(bs), (name, got, len(bs))


def test_truncated_decode_matches_coder(rng, jitted):
    layout_j, decode_j = jitted
    for name, c in _cases(rng):
        Hp, Wp = c.shape
        nb = (Hp // 8) * (Wp // 8)
        blocks = _blocks(c)
        full = bpe122.bpe_encode_blocks(blocks)
        layout = layout_j(jnp.asarray(blocks))
        budgets = sorted({0, 30, 61, len(full) // 4, len(full) // 2,
                          len(full) - 3, len(full), len(full) + 50})
        for budget in budgets:
            bs = (bpe122.bpe_encode_blocks(blocks, seg_byte_limit=budget)
                  if budget > 0 else full)
            dec_c = bpe122.bpe_decode_blocks(bs, nb)
            rec_m, nbytes_m = decode_j(layout, budget)
            assert int(nbytes_m) == len(bs), (name, budget)
            assert np.array_equal(np.asarray(rec_m)[:nb], dec_c), \
                (name, budget)


def test_fuzz_model_parity(rng, jitted):
    layout_j, decode_j = jitted
    for _ in range(10):
        Hp, Wp = 32, 32                       # one shape: no recompiles
        mag = int(rng.choice([1, 4, 90, 4000, 150000]))
        c = rng.integers(-mag, mag + 1, (Hp, Wp)).astype(np.int32)
        if rng.random() < 0.4:
            c[rng.random((Hp, Wp)) < 0.7] = 0
        blocks = _blocks(c)
        full = bpe122.bpe_encode_blocks(blocks)
        layout = layout_j(jnp.asarray(blocks))
        assert int(layout["full_bytes"]) == len(full)
        nb = (Hp // 8) * (Wp // 8)
        for budget in (int(rng.integers(29, max(30, len(full) + 10))), 0):
            bs = (bpe122.bpe_encode_blocks(blocks, seg_byte_limit=budget)
                  if budget > 0 else full)
            rec_m, nbytes_m = decode_j(layout, budget)
            assert int(nbytes_m) == len(bs), budget
            assert np.array_equal(np.asarray(rec_m)[:nb],
                                  bpe122.bpe_decode_blocks(bs, nb)), budget
