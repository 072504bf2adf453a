# -*- coding: utf-8 -*-
"""CCSDS-121 golden-bitstream parity: tpukit coder vs system libaec.

The reference's CCSDS-121 path is the `aec` CLI over libaec
(reference tools/codecs/ccsds121/ccsds121_wrap.py:129-136); byte-equality
with libaec therefore *is* bitstream parity with the reference.
"""

import numpy as np
import pytest

from tpukit.native import ccsds121_host as ck
from tpukit.native import libaec_oracle as ae

pytestmark = pytest.mark.skipif(not ae.available(), reason="libaec oracle absent")

CONFIGS = [
    (16, 8, 2, 8),    # aec CLI defaults for -n 16 (the reference invocation)
    (16, 16, 4, 8),
    (16, 8, 16, 8),
    (8, 8, 2, 8),
    (12, 8, 2, 8),
    (16, 32, 8, 8),
    (16, 8, 2, 0),    # no preprocessing
    (16, 64, 64, 8),
    (16, 8, 128, 8),  # multi-segment RSIs (ROS paths)
]


def _gen(rng, n, bits):
    hi = int(rng.integers(1, bits + 1))
    kind = int(rng.integers(0, 5))
    mx = 2 ** bits
    if kind == 0:
        return rng.integers(0, 2 ** hi, n).astype(np.uint16)
    if kind == 1:
        return (np.cumsum(rng.integers(-5, 6, n)).astype(np.int64) % mx).astype(np.uint16)
    if kind == 2:
        x = np.zeros(n, np.uint16)
        idx = rng.integers(0, n, max(1, n // 8))
        x[idx] = rng.integers(0, 2 ** hi, idx.size).astype(np.uint16)
        return x
    if kind == 3:
        x = np.full(n, int(rng.integers(0, mx)), np.uint16)
        ii = rng.integers(0, n, max(1, n // 16))
        x[ii] = ((x[ii].astype(np.int64) + rng.integers(0, 4, ii.size)) % mx).astype(np.uint16)
        return x
    return rng.integers(0, mx, n).astype(np.uint16)


@pytest.mark.parametrize("cfg", CONFIGS, ids=[str(c) for c in CONFIGS])
def test_byte_exact_vs_libaec(cfg, rng):
    bits, J, rsi, flags = cfg
    for trial in range(40):
        n = int(rng.choice([1, 2, 4, 8, 16])) * J
        x = _gen(rng, n, bits)
        mine = ck.encode(x, bits, J, rsi, flags)
        ref = ae.encode(x, bits, J, rsi, flags)
        assert mine == ref, f"bitstream mismatch cfg={cfg} trial={trial}"
        y = ck.decode(ref, n, bits, J, rsi, flags)
        np.testing.assert_array_equal(y, x)


def test_roundtrip_caseB_like(tile_caseB):
    # int16 14-in-16 cube through the uint16 bit-view (the wrapper passes
    # raw int16 bytes to aec without -s: reference ccsds121_wrap.py:188)
    cube = tile_caseB.view(np.uint16)
    flat = np.moveaxis(cube, 0, -1).ravel()  # BIP order (reference default)
    bs = ck.encode(flat, 16)
    assert ae.encode(flat, 16) == bs
    y = ck.decode(bs, flat.size, 16)
    np.testing.assert_array_equal(y, flat)


def test_compresses_smooth_data(rng):
    # smooth spatial ramps (realistic imagery) must actually shrink
    base = np.linspace(1000, 3000, 64 * 64).astype(np.uint16)
    x = (base + rng.integers(0, 8, base.size)).astype(np.uint16)
    bs = ck.encode(x, 16)
    assert len(bs) < x.nbytes // 2


def test_zeros_and_edge_patterns():
    for pattern in [np.zeros(640, np.uint16),
                    np.full(640, 65535, np.uint16),
                    np.tile(np.array([0, 65535], np.uint16), 320)]:
        bs = ck.encode(pattern, 16)
        assert bs == ae.encode(pattern, 16)
        np.testing.assert_array_equal(ck.decode(bs, pattern.size), pattern)


def test_parallel_decode_matches_serial(rng):
    """decode_parallel reconstructs exactly from the plan's chunk bit
    offsets (ck121_decode_seg), across content regimes: noise, constant
    runs (ROS), zero runs, and a non-chunk-aligned remainder chunk."""
    from tpukit.codecs import ccsds121 as dev
    import jax.numpy as jnp

    n = (1 << 20) + 4096   # forces a remainder chunk at chunk=1<<18
    x = rng.integers(0, 1 << 14, n).astype(np.uint16)
    x[100000:220000] = 7
    x[400000:450000] = 0
    x[800000:800512] = 65535
    bs = ck.encode(x, 16)
    plan = dev.encode_plan(jnp.asarray(x), bits=16, chunk=1 << 18)
    assert plan is not None
    assert ck.encode_parallel(x, plan) == bs
    np.testing.assert_array_equal(ck.decode_parallel(bs, plan), x)


def test_partial_final_block_matches_libaec(rng):
    """Sample counts that are not whole J=8 blocks: the coder pads by
    repeating the last sample — libaec's exact convention — so streams
    stay byte-identical and decode trims back (a 489x489-style odd tile
    used to crash with an opaque error)."""
    from tpukit.native import ccsds121_host as ck

    for bits in (9, 12, 16):
        for n in (1, 3, 13, 1089, 4356):
            x = rng.integers(0, 1 << bits, n).astype(np.uint16)
            bs = ck.encode(x, bits)
            assert bs == ae.encode(x, bits), (bits, n)
            np.testing.assert_array_equal(ck.decode(bs, n, bits), x)


def test_codec_odd_tile_geometry(rng):
    """The full codec round-trips an odd single-band tile losslessly."""
    from tpukit.codecs.base import RateSpec
    from tpukit.codecs.registry import create

    cube = rng.integers(0, 4096, (1, 33, 33)).astype(np.uint16)
    res = create("ccsds121", tile=512, preproc="none").run(
        cube, "uint16", RateSpec.none())
    np.testing.assert_array_equal(np.asarray(res.recon), cube)
    assert res.bitstream_bytes > 0


def test_device_size_model_partial_block(rng):
    """encode_size pads like the coder, so odd-n sizes stay exact."""
    import jax.numpy as jnp
    from tpukit.codecs import ccsds121 as ck_dev
    from tpukit.native import ccsds121_host as ck

    for n in (13, 1089):
        x = rng.integers(0, 65536, n).astype(np.uint16)
        model = int(np.asarray(ck_dev.encode_size(jnp.asarray(x))))
        assert model == len(ck.encode(x, 16)), n
