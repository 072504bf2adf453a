# -*- coding: utf-8 -*-
"""Golden bitstreams for the embedded bit-plane coder.

The coder's output is a FORMAT: recon.tif artifacts, bitstream_bytes,
bpp/CR columns, and resume's byte sums all depend on it, and optimized
SIMD paths must not change a single bit. These hashes were captured from
the reference implementation (round 2) and pin both the encoded stream
and the decoded (possibly truncation-midpoint) reconstruction, including
budget-truncated streams whose tail semantics are the subtle part.
"""

import hashlib

import numpy as np
import pytest

from tpukit.codecs import wavelet_common as wc

GOLDEN = [
    # (name, n, inv_base, max_bytes, sha256(enc)[:16], sha256(dec)[:16])
    ("zeros", 5000, 1.0, 0, "6e340b9cffb37a98", "28b4f41a7f3ee6d8"),
    ("ones", 4097, 1.0, 0, "e81165d4506aa29a", "df4635842436a159"),
    ("laplace30", 100000, 1.0, 0, "42dae178e38f09bb", "1c0f09bbe682947a"),
    ("laplace30_q8", 100000, 0.125, 0, "ff553788a20dd1d2", "43fd259a269d5e15"),
    ("sparse", 70001, 1.0, 0, "a0d087761ad20075", "476cca4767d2c45a"),
    ("big", 33333, 1.0, 0, "84d0b316b0dfec83", "b582624e264c72b2"),
    ("trunc500", 50000, 1.0, 500, "9ff830ddae6d224a", "0ca16991953e1948"),
    ("trunc_tiny", 50000, 1.0, 7, "5b443b2635f1846f", "f9abd1a84c72e880"),
    ("mixed_steps", 65536, 0.25, 0, "ea16b94914bcfb13", "0062173e1497a653"),
]


def _case_input(name, n):
    rng = np.random.default_rng(7)
    if name == "zeros":
        return np.zeros(n, np.float32)
    if name == "ones":
        return np.ones(n, np.float32)
    if name in ("laplace30", "laplace30_q8"):
        return rng.laplace(0, 30, n).astype(np.float32)
    if name == "sparse":
        c = np.zeros(n, np.float32)
        c[::97] = rng.laplace(0, 9000, len(c[::97]))
        return c
    if name == "big":
        return np.full(n, 1 << 19, np.float32)
    if name in ("trunc500", "trunc_tiny"):
        return rng.laplace(0, 200, n).astype(np.float32)
    if name == "mixed_steps":
        return rng.laplace(0, 60, n).astype(np.float32)
    raise AssertionError(name)


@pytest.mark.parametrize("name,n,inv_base,max_bytes,h_enc,h_dec", GOLDEN)
def test_bitplane_golden(name, n, inv_base, max_bytes, h_enc, h_dec):
    c = _case_input(name, n)
    steps = (np.repeat(np.array([1.0, 0.5, 0.25, 2.0], np.float32), n // 4)
             if name == "mixed_steps" else np.ones(n, np.float32))
    enc, qc = wc.bpc_encode_quant(c, steps, np.float32(inv_base),
                                  max_bytes=max_bytes)
    dec = wc.bpc_decode(enc, n)
    assert hashlib.sha256(enc).hexdigest()[:16] == h_enc
    assert hashlib.sha256(dec.tobytes()).hexdigest()[:16] == h_dec
    if not max_bytes:       # complete stream: exact round trip
        np.testing.assert_array_equal(dec, qc)
