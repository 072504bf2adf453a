# -*- coding: utf-8 -*-
"""bench.py's synthetic canonical inputs: the workload definition the
driver measures every round. Pin the geometry and bit-packing contracts
(and that the script stays importable) so a bench edit cannot silently
change what the headline measures."""
import importlib.util
import os

import numpy as np


def _bench():
    path = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    spec = importlib.util.spec_from_file_location("bench_under_test", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_casea_tiles_are_canonical_12in16():
    bm = _bench()
    rng = np.random.default_rng(2026)
    tiles = bm.make_casea_tiles(rng)
    assert set(tiles) == {"HC", "LC"}
    for t in tiles.values():
        assert t.shape == (4, 1024, 1024) and t.dtype == np.uint16
        # 12-in-16: four zero LSBs (reference make_baseline_A to_12in16)
        assert (t & 0xF).max() == 0
        assert t.max() <= 0xFFF0
    # HC really is higher-complexity than LC (gradient energy)
    def g(t):
        return float(np.abs(np.diff(t.astype(np.int32), axis=-1)).mean())
    assert g(tiles["HC"]) > 2 * g(tiles["LC"])


def test_caseb_cube_is_canonical_14in16():
    bm = _bench()
    rng = np.random.default_rng(2026)
    cube = bm.make_caseb_cube(rng)
    assert cube.shape == (180, 512, 512) and cube.dtype == np.int16
    # 14-in-16: two zero LSBs through the uint16 bit-view (reference
    # make_baseline_B trunc_uint16 semantics)
    assert (cube.view(np.uint16) & 0x3).max() == 0
    # values live in the 14-bit domain and actually exceed 12 bits
    # (EnMAP-like radiances, distinct from the 12-in-16 Case A packing)
    assert -8192 <= cube.min() and cube.max() <= 8191
    assert cube.max() > 4095
