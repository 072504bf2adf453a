# -*- coding: utf-8 -*-
"""Golden stream vectors: the CCSDS-122/123 formats are pinned byte-for-
byte against committed files (tests/vectors/, regenerated consciously
via tests/vectors/generate.py).

No reference `bpe.exe` / CNES binary exists in this environment
(reference README.md:84-90 makes the user supply them), so these vectors
(a) make any stream-format drift loud and (b) give a future environment
holding the real binaries a minutes-long validation path: encode the
committed .npy inputs with the reference coder and compare, or check the
committed streams' header fields against the normative tables.
"""
import json
import os

import numpy as np
import pytest

VEC = os.path.join(os.path.dirname(__file__), "vectors")


def _load(name: str) -> bytes:
    with open(os.path.join(VEC, name), "rb") as f:
        return f.read()


@pytest.fixture(scope="module")
def expected():
    with open(os.path.join(VEC, "expected.json")) as f:
        return json.load(f)


class BitCursor:
    """MSB-first bit reader for header parsing (documentation-grade:
    mirrors native/src/bitio.hpp's writer order)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def take(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v


def parse_bpe122_header(stream: bytes) -> dict:
    """Parse one segment header of tpukit's CCSDS 122.0-B-structured
    stream (native/src/bpe122.cpp:616-652): Part 1A (3 bytes), Part 1B
    (1 byte, last segment only), Part 2 (5 bytes), Part 3 (3 bytes),
    Part 4 (8 bytes)."""
    bc = BitCursor(stream)
    h = {
        "start_img": bc.take(1), "end_img": bc.take(1),
        "segment_count": bc.take(8),
        "bitdepth_dc": bc.take(5), "bitdepth_ac": bc.take(5),
        "reserved_1a": bc.take(1),
        "part2": bc.take(1), "part3": bc.take(1), "part4": bc.take(1),
    }
    if h["end_img"]:
        h["pad_rows"] = bc.take(3)
        bc.take(5)
    assert h["part2"] and h["part3"] and h["part4"], \
        "tpukit streams are self-describing: all parts always emitted"
    h["seg_byte_limit"] = bc.take(27)
    h["dc_stop"] = bc.take(1)
    h["bitplane_stop"] = bc.take(5)
    h["stage_stop"] = bc.take(2)
    h["use_fill"] = bc.take(1)
    bc.take(4)
    h["S"] = bc.take(20)
    h["opt_dc_select"] = bc.take(1)
    h["opt_ac_select"] = bc.take(1)
    bc.take(2)
    h["dwt_type"] = bc.take(1)          # 1 = integer 9/7M
    h["extended_depth"] = bc.take(1)
    h["signed_pixels"] = bc.take(1)
    h["pixel_bitdepth"] = bc.take(4)    # 0 encodes 16
    h["image_width"] = bc.take(20)
    h["transpose"] = bc.take(1)
    h["codeword_len"] = bc.take(3)
    h["custom_wt"] = bc.take(1)
    bc.take(20)
    bc.take(12)
    assert bc.pos % 8 == 0
    h["header_bytes"] = bc.pos // 8
    return h


# ---------------------------------------------------------------------------


@pytest.mark.parametrize("tag,bpp", [("bpp1", 1.0), ("bpp8", 8.0)])
def test_ccsds122_stream_bytes_pinned(expected, tag, bpp):
    """Re-encoding the committed input reproduces the committed stream
    byte-for-byte (DWT, weights, gaggle coding, truncation — the whole
    pipeline)."""
    from tpukit.codecs.base import RateSpec
    from tpukit.codecs.ccsds122_codec import CCSDS122Codec

    fn = f"ccsds122_{tag}.bpe"
    tile = np.load(os.path.join(VEC, expected[fn]["input"]))
    res = CCSDS122Codec(entropy="bpe").run(
        tile, "uint16", RateSpec.of("bpp", bpp), keep_bitstream=True)
    stream = next(iter(res.bitstreams.values()))
    golden = _load(fn)
    assert stream == golden, (
        f"CCSDS-122 stream format drifted from the committed vector {fn} "
        f"({len(stream)} vs {len(golden)} bytes). If the change is "
        f"intentional, rerun tests/vectors/generate.py and review the "
        f"diff.")
    err = int(np.abs(np.asarray(res.recon).astype(np.int64)
                     - tile.astype(np.int64)).max())
    assert err == expected[fn]["recon_max_abs_err"]


def test_ccsds122_header_fields(expected):
    """Part 1A/1B/2/3/4 fields of the committed vectors parse to the
    values the format specifies (single segment, S=64 blocks for 64x64,
    integer 9/7M DWT, 16-bit unsigned pixels, width 64)."""
    for tag in ("bpp1", "bpp8"):
        fn = f"ccsds122_{tag}.bpe"
        h = parse_bpe122_header(_load(fn))
        assert h["start_img"] == 1 and h["end_img"] == 1
        assert h["segment_count"] == 0
        assert h["header_bytes"] == 20       # Part 1B present (EndImg)
        assert h["S"] == 64                  # (64/8)^2 8x8 blocks
        assert h["opt_dc_select"] == 1 and h["opt_ac_select"] == 1
        assert h["dwt_type"] == 1            # integer 9/7M
        assert h["signed_pixels"] == 0
        assert h["pixel_bitdepth"] == 0      # 0 encodes 16
        assert h["image_width"] == 64
        assert h["pad_rows"] == 0
        assert h["seg_byte_limit"] == len(_load(fn))
        assert 0 < h["bitdepth_ac"] <= h["bitdepth_dc"] <= 24


def test_ccsds122_vectors_decode(expected):
    """tpukit's independent decoder reads the committed streams (the
    device model's truncated reconstruction path is pinned elsewhere;
    this guards the committed bytes themselves)."""
    from tpukit.codecs import bpe122

    for tag in ("bpp1", "bpp8"):
        fn = f"ccsds122_{tag}.bpe"
        blocks = bpe122.bpe_decode_blocks(_load(fn), 64)
        assert blocks.shape == (64, 64)
        assert np.abs(blocks).max() > 0


def test_ccsds123_stream_bytes_pinned(expected):
    """Re-encoding the committed cube under every committed config
    reproduces the committed stream byte-for-byte."""
    from tpukit.codecs import ccsds123_std as std

    cube = np.load(os.path.join(VEC, "ccsds123_input_5x16x16_i16.npy"))
    configs = {
        "ccsds123_bsq_full.l123": dict(order="bsq"),
        "ccsds123_bip_full.l123": dict(order="bip"),
        "ccsds123_bil_full.l123": dict(order="bil"),
        "ccsds123_bsq_reduced_colsum_p2.l123": dict(
            order="bsq", full_mode=False, colsum=True, P=2),
        "ccsds123_bsq_block.l123": dict(order="bsq", entropy="block"),
    }
    for fn, kw in configs.items():
        stream = std.encode(cube.view(np.uint16), is_signed=True, **kw)
        golden = _load(fn)
        assert stream == golden, (
            f"CCSDS-123 stream format drifted from {fn}. If intentional, "
            f"rerun tests/vectors/generate.py and review the diff.")
        assert np.array_equal(std.decode(stream).view(np.int16), cube)
        assert std.stream_info(stream) == expected[fn]["header"]


def test_ccsds122_stage_word_trace(expected):
    """Field-level parse of EVERY entropy-coded stage-1..3 word in the
    committed vectors (native decode trace): [plane, stage, gaggle,
    word_len, restricted, option, value] per word. Pins the exact word
    inventory so a future Blue-Book Tables 4-9..4-17 transcription has a
    ready differential surface: re-run the trace, diff options/values
    against the normative tables word by word."""
    from tpukit.codecs import bpe122

    # class option counts as coded in the stream (bpe122.cpp CLASSES):
    # len 2 -> 1 coded option (+1 uncoded), len 3 -> 2, len 4 -> 3
    n_coded = {2: 1, 3: 2, 4: 3}
    pinned = {
        # (total words, stage-1, stage-2, stage-3, planes touched)
        "ccsds122_bpp1.bpe": (947, 163, 510, 274, (7, 11)),
        "ccsds122_bpp8.bpe": (4804, 270, 955, 3579, (1, 11)),
    }
    for fn, (total, s1, s2, s3, (pmin, pmax)) in pinned.items():
        stream = _load(fn)
        hdr = parse_bpe122_header(stream)
        blocks, tr = bpe122.bpe_decode_trace(stream, 64)
        # trace-enabled decode is the plain decode
        np.testing.assert_array_equal(blocks,
                                      bpe122.bpe_decode_blocks(stream, 64))
        assert len(tr) == total, (fn, len(tr))
        st = tr[:, 1]
        assert [(st == k).sum() for k in (1, 2, 3)] == [s1, s2, s3], fn
        # field invariants, every word
        plane, stage, gag, wlen, restr, opt, val = tr.T
        assert plane.min() == pmin and plane.max() == pmax
        assert (plane < hdr["bitdepth_ac"]).all()
        assert set(np.unique(stage)) <= {1, 2, 3}
        ngag = (hdr["S"] + 15) // 16
        assert (gag >= 0).all() and (gag < ngag).all()
        assert set(np.unique(wlen)) <= {1, 2, 3, 4}
        assert set(np.unique(restr)) <= {0, 1}
        for L in (2, 3, 4):
            m = wlen == L
            if not m.any():
                continue
            # option in [0, n_coded] (n_coded = the uncoded fallback)
            assert opt[m].min() >= 0 and opt[m].max() <= n_coded[L], fn
            # word values fit the length; restricted words are nonzero
            assert (val[m] >= 0).all() and (val[m] < (1 << L)).all()
            mr = m & (restr == 1)
            if mr.any():
                assert (val[mr] > 0).all(), fn
        # single-bit words carry no option machinery
        m1 = wlen == 1
        if m1.any():
            assert set(np.unique(opt[m1])) == {-1}
            assert set(np.unique(val[m1])) <= {0, 1}
        # stage-1 words are parent-transition words: never single-bit
        assert (wlen[st == 1] >= 1).all()
        # per (plane, gaggle, class) the option is constant (selected
        # once per plane via the ID field — OptACSelect machinery)
        for L in (2, 3, 4):
            m = wlen == L
            key = plane[m].astype(np.int64) * 1000 + gag[m]
            for k in np.unique(key):
                assert len(np.unique(opt[m][key == k])) == 1, (fn, L, k)
