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
    # Captured from the round-2 PEXT/PDEP unit-layout coder (sig bits then
    # sign bits per group unit; header byte carries the 0x40 format mark).
    # Full-stream decode hashes are IDENTICAL to the previous interleaved
    # layout — the reordering changes the stream, never the reconstruction;
    # stream sizes are bit-count-identical too (the device size model is
    # layout-independent). Only truncated-tail decodes may differ: units
    # are now atomic at the cut.
    ("zeros", 5000, 1.0, 0, "c3641f8544d7c02f", "28b4f41a7f3ee6d8"),
    ("ones", 4097, 1.0, 0, "a8d3da9ae0de3972", "df4635842436a159"),
    ("laplace30", 100000, 1.0, 0, "8c4b5e6f89f2e898", "1c0f09bbe682947a"),
    ("laplace30_q8", 100000, 0.125, 0, "5e5654702730a75e", "43fd259a269d5e15"),
    ("sparse", 70001, 1.0, 0, "5f9cd94e6c10c8ad", "476cca4767d2c45a"),
    ("big", 33333, 1.0, 0, "8c4a1839c3324bd2", "b582624e264c72b2"),
    ("trunc500", 50000, 1.0, 500, "83145dbfb94092a1", "00b6aff162fd1312"),
    ("trunc_tiny", 50000, 1.0, 7, "ae64385faae185da", "f9abd1a84c72e880"),
    ("mixed_steps", 65536, 0.25, 0, "a5902298b896d09c", "0062173e1497a653"),
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


def test_bitplane_rejects_unmarked_streams():
    """Streams without the 0x40 header mark (pre-round-2 layout, foreign
    bytes) must error loudly instead of decoding garbage."""
    enc, _ = wc.bpc_encode_quant(np.ones(64, np.float32),
                                 np.ones(64, np.float32), np.float32(1.0))
    assert enc[0] & 0x40
    for bad0 in (enc[0] & ~0x40, enc[0] | 0x80):
        bad = bytes([bad0]) + enc[1:]
        with pytest.raises(RuntimeError):
            wc.bpc_decode(bad, 64)


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
