# -*- coding: utf-8 -*-
"""Reference-shell compatibility: drive tpukit's own wrapper CLI through the
external-subprocess seam, proving any reference-contract wrapper works."""

import sys

import numpy as np
import pytest

from tpukit.codecs.base import RateSpec
from tpukit.codecs.shell import ShellCodec


def test_shell_codec_runs_wrapper_cli(rng):
    cube = rng.integers(0, 4096, (3, 32, 32)).astype(np.uint16)
    codec = ShellCodec([sys.executable, "-m", "tpukit", "codec-ccsds121"],
                       ["--tile", "32", "--preproc", "none"])
    res = codec.run(cube, "uint16", RateSpec.none(), keep_bitstream=True)
    np.testing.assert_array_equal(res.recon, cube)
    assert res.codec == "ccsds121_ext"
    assert res.bitstream_bytes > 0
    assert res.bitstreams and any(k.endswith(".aec") for k in res.bitstreams)
    assert res.t_comp_s > 0


def test_shell_codec_rate_passthrough(rng):
    cube = rng.integers(0, 4096, (2, 32, 32)).astype(np.uint16)
    codec = ShellCodec([sys.executable, "-m", "tpukit", "codec-jpegls"])
    res = codec.run(cube, "uint16", RateSpec.of("nearlossless_eps", 2))
    err = np.abs(res.recon.astype(int) - cube.astype(int)).max()
    assert 0 < err <= 2 or err == 0
    assert res.extras.get("nearlossless_eps") == 2
