# -*- coding: utf-8 -*-
"""JP2 / JPEG 2000 Part 1 decoder: sample-exact vs OpenJPEG (via Pillow)
on reversible 5/3 codestreams — the Sentinel-2 ingest path
(reference make_baseline_A.py:13-19 uses rasterio/GDAL for this)."""

import warnings

import numpy as np
import pytest

PIL = pytest.importorskip("PIL.Image")

from tpukit.io.jp2 import JP2Decoder, is_jp2, open_raster, read_jp2  # noqa: E402

warnings.filterwarnings("ignore", category=DeprecationWarning)


def _write_jp2(path, arr, **kw):
    im = PIL.fromarray(arr)
    im.save(str(path), irreversible=False, quality_mode="lossless", **kw)


@pytest.mark.parametrize("size", [8, 16, 33, 64, 100])
def test_lossless_exact_random(tmp_path, rng, size):
    a = rng.integers(0, 32768, (size, size)).astype(np.uint16)
    p = tmp_path / "t.jp2"
    _write_jp2(p, a)
    np.testing.assert_array_equal(read_jp2(p), a)


def test_lossless_exact_rectangular_odd(tmp_path, rng):
    a = rng.integers(0, 4096, (37, 61)).astype(np.uint16)
    p = tmp_path / "t.jp2"
    _write_jp2(p, a)
    np.testing.assert_array_equal(read_jp2(p), a)


def test_multiple_tiles(tmp_path, rng):
    """Multi-tile codestream. Pillow's OpenJPEG *encoder* is not lossless
    on offset tiles, so the oracle is OpenJPEG's own decode (tpukit must
    be sample-identical to it)."""
    a = rng.integers(0, 4096, (70, 90)).astype(np.uint16)
    p = tmp_path / "t.jp2"
    _write_jp2(p, a, tile_size=(32, 32))
    dec = JP2Decoder(p.read_bytes())
    assert dec.ntx * dec.nty > 1
    oracle = np.asarray(PIL.open(str(p)), np.uint16)
    np.testing.assert_array_equal(read_jp2(p), oracle)
    # the origin tile is bit-exact vs the source in any case
    np.testing.assert_array_equal(read_jp2(p)[:32, :32], a[:32, :32])


def test_quality_layers_lossless_final(tmp_path, rng):
    a = rng.integers(0, 4096, (48, 48)).astype(np.uint16)
    p = tmp_path / "t.jp2"
    _write_jp2(p, a, quality_layers=[40, 10, 0])
    dec = JP2Decoder(p.read_bytes())
    assert dec.cod.layers == 3
    np.testing.assert_array_equal(read_jp2(p), a)


@pytest.mark.parametrize("prog", ["LRCP", "RLCP", "RPCL"])
def test_progression_orders(tmp_path, rng, prog):
    a = rng.integers(0, 4096, (40, 40)).astype(np.uint16)
    p = tmp_path / "t.jp2"
    _write_jp2(p, a, progression=prog)
    np.testing.assert_array_equal(read_jp2(p), a)


def test_smooth_image_zero_runs(tmp_path):
    g = (np.add.outer(np.arange(64), np.arange(64)) * 31 % 4096)
    a = g.astype(np.uint16)
    p = tmp_path / "t.jp2"
    _write_jp2(p, a)
    np.testing.assert_array_equal(read_jp2(p), a)


def test_is_jp2_and_open_raster(tmp_path, rng):
    from tpukit.io import tiff

    a = rng.integers(0, 4096, (16, 16)).astype(np.uint16)
    pj = tmp_path / "t.jp2"
    _write_jp2(pj, a)
    pt = tmp_path / "t.tif"
    tiff.write_geotiff(pt, a)
    assert is_jp2(pj) and not is_jp2(pt)
    with open_raster(pj) as ds:
        assert (ds.width, ds.height, ds.count) == (16, 16, 1)
        assert ds.dtypes[0] == "uint16"
        np.testing.assert_array_equal(ds.read(1), a)
        win = tiff.Window(4, 2, 8, 6)
        np.testing.assert_array_equal(ds.read(1, window=win), a[2:8, 4:12])
    with open_raster(pt) as ds:
        np.testing.assert_array_equal(ds.read(1), a)


def test_baseline_a_from_jp2_bands(tmp_path, rng):
    """make-baseline-a consumes .jp2 band files directly (VERDICT item 6)."""
    from tpukit.pipelines.baseline_a import CaseAConfig, run

    bands = []
    base = rng.integers(0, 4000, (64, 64)).astype(np.uint16)
    for i, name in enumerate(("B02", "B03", "B04", "B08")):
        arr = np.clip(base + i * 13, 0, 4095).astype(np.uint16)
        p = tmp_path / f"{name}.jp2"
        _write_jp2(p, arr)
        bands.append(p)
    cfg = CaseAConfig(band_paths=bands, outdir=tmp_path / "out",
                      scene_w=48, scene_h=40, tile_w=16, tile_h=16,
                      hc_off=(0, 0), lc_off=(16, 16), quicklooks=False)
    out = run(cfg)
    from tpukit.io import tiff
    with tiff.open(out["scene12"]) as ds:
        assert ds.count == 4
        assert (ds.width, ds.height) == (48, 40)


def test_zero_decomposition_levels(tmp_path, rng):
    """NL=0 codestreams (num_resolutions=1): the whole tile-component is
    one LL band; band_rect's half-step term must vanish, not crash."""
    a = rng.integers(0, 32768, (40, 52)).astype(np.uint16)
    p = tmp_path / "nl0.jp2"
    _write_jp2(p, a, num_resolutions=1)
    np.testing.assert_array_equal(read_jp2(p), a)


def test_dataset_reuses_parsed_decoder(tmp_path, rng):
    a = rng.integers(0, 32768, (24, 24)).astype(np.uint16)
    p = tmp_path / "ds.jp2"
    _write_jp2(p, a)
    ds = open_raster(p)
    np.testing.assert_array_equal(ds.read()[0], a)
