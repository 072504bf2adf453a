# -*- coding: utf-8 -*-
import numpy as np
import jax.numpy as jnp

from tpukit.io.bitdepth import to_12in16, trunc_klsb, effective_data_range


def _ref_to_12in16(arr):
    # reference make_baseline_A.py:167
    return (((arr.astype(np.uint16) + 8) >> 4) << 4).astype(np.uint16)


def test_to_12in16_matches_reference(rng):
    x = rng.integers(0, 65535, size=(4, 33, 47), dtype=np.uint16)
    np.testing.assert_array_equal(to_12in16(x), _ref_to_12in16(x))
    np.testing.assert_array_equal(np.asarray(to_12in16(jnp.asarray(x))), _ref_to_12in16(x))


def test_to_12in16_edges():
    x = np.array([0, 7, 8, 15, 16, 65527, 65528, 65535], dtype=np.uint16)
    got = to_12in16(x)
    # +8 then >>4<<4: 65528+8 wraps to 0 (same as reference uint16 arithmetic)
    exp = _ref_to_12in16(x)
    np.testing.assert_array_equal(got, exp)


def test_trunc_klsb_uint16(rng):
    x = rng.integers(0, 65535, size=(100,), dtype=np.uint16)
    got = trunc_klsb(x, 2)
    np.testing.assert_array_equal(got, (x >> 2) << 2)
    assert trunc_klsb(x, 0) is x


def test_trunc_klsb_int16_bitview(rng):
    # reference make_baseline_B.py:303-312: int16 truncated through uint16 view
    x = rng.integers(-32768, 32767, size=(100,)).astype(np.int16)
    got = trunc_klsb(x, 2)
    exp = (((x.view(np.uint16) >> 2) << 2).astype(np.uint16)).view(np.int16)
    np.testing.assert_array_equal(got, exp)
    # jax path
    got_j = np.asarray(trunc_klsb(jnp.asarray(x), 2))
    np.testing.assert_array_equal(got_j, exp)


def test_effective_data_range():
    # 12-in-16 uint16 -> 4095 (reference run_codec.py:94-102)
    a = (np.arange(100, dtype=np.uint16) << 4)
    assert effective_data_range(a, "uint16") == 4095
    # non-multiple of 16 -> 65535
    assert effective_data_range(np.array([17], np.uint16), "uint16") == 65535
    # 14-in-16 int16 -> 8191 (reference run_codec.py:103-113)
    b = (np.arange(-100, 100, dtype=np.int16) << 2)
    assert effective_data_range(b, "int16") == 8191
    # int16 out of 14-bit range -> observed max abs
    c = np.array([-20000, 400], np.int16)
    assert effective_data_range(c, "int16") == 20000
    assert effective_data_range(np.zeros(4, np.uint8), "uint8") == 255
