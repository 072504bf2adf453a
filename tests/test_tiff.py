# -*- coding: utf-8 -*-
"""GeoTIFF round-trip tests for the self-contained reader/writer."""

import numpy as np
import pytest

from tpukit.io import tiff


def _roundtrip(tmp_path, arr, **kw):
    p = tmp_path / "t.tif"
    tiff.write_geotiff(p, arr, **kw)
    with tiff.open(p) as ds:
        out = ds.read()
        return ds.meta, out, ds


@pytest.mark.parametrize("dtype,lo,hi", [
    (np.uint8, 0, 255), (np.uint16, 0, 65535), (np.int16, -32768, 32767),
])
def test_roundtrip_dtypes(tmp_path, rng, dtype, lo, hi):
    arr = rng.integers(lo, hi, size=(3, 40, 52)).astype(dtype)
    meta, out, _ = _roundtrip(tmp_path, arr)
    assert out.dtype == dtype
    assert out.shape == arr.shape
    np.testing.assert_array_equal(out, arr)


def test_roundtrip_tiled_vs_strips(tmp_path, rng):
    arr = rng.integers(0, 65535, size=(2, 77, 91), dtype=np.uint16)
    for tiled in (True, False):
        p = tmp_path / f"t_{tiled}.tif"
        tiff.write_geotiff(p, arr, tiled=tiled, blockxsize=32, blockysize=32)
        with tiff.open(p) as ds:
            np.testing.assert_array_equal(ds.read(), arr)


def test_deflate_predictor(tmp_path, rng):
    arr = rng.integers(0, 4096, size=(1, 64, 64), dtype=np.uint16)
    p = tmp_path / "t.tif"
    tiff.write_geotiff(p, arr, compress="DEFLATE", predictor=2, blockxsize=32, blockysize=32)
    with tiff.open(p) as ds:
        np.testing.assert_array_equal(ds.read(), arr)
    # deflate should actually shrink a smooth gradient
    grad = np.tile(np.arange(64, dtype=np.uint16), (64, 1))[None]
    p2 = tmp_path / "g.tif"
    tiff.write_geotiff(p2, grad, compress="DEFLATE", predictor=2)
    assert p2.stat().st_size < grad.nbytes


def test_window_read(tmp_path, rng):
    arr = rng.integers(0, 65535, size=(4, 100, 120), dtype=np.uint16)
    p = tmp_path / "t.tif"
    tiff.write_geotiff(p, arr, blockxsize=32, blockysize=32)
    with tiff.open(p) as ds:
        win = tiff.Window(17, 23, 50, 40)
        np.testing.assert_array_equal(ds.read(window=win), arr[:, 23:63, 17:67])
        np.testing.assert_array_equal(ds.read(2, window=win), arr[1, 23:63, 17:67])
        np.testing.assert_array_equal(ds.read([3, 1]), arr[[2, 0]])


def test_nodata_and_mask(tmp_path, rng):
    arr = rng.integers(1, 1000, size=(2, 30, 30), dtype=np.uint16)
    arr[:, :5, :] = 0
    p = tmp_path / "t.tif"
    tiff.write_geotiff(p, arr, nodata=0)
    with tiff.open(p) as ds:
        assert ds.nodata == 0
        m = ds.dataset_mask()
        assert m.shape == (30, 30)
        assert (m[:5] == 0).all() and (m[5:] == 255).all()

    mask = np.ones((30, 30), dtype=np.uint8)
    mask[:, :7] = 0
    p2 = tmp_path / "m.tif"
    tiff.write_geotiff(p2, arr, mask=mask)
    with tiff.open(p2) as ds:
        m = ds.dataset_mask()
        assert (m[:, :7] == 0).all() and (m[:, 7:] == 255).all()
        np.testing.assert_array_equal(ds.read(), arr)  # mask does not alter data


def test_descriptions_roundtrip(tmp_path, rng):
    arr = rng.integers(0, 100, size=(3, 16, 16), dtype=np.uint16)
    descs = ["lambda_nm=665.00", "lambda_nm=560.00", None]
    p = tmp_path / "t.tif"
    tiff.write_geotiff(p, arr, descriptions=descs)
    with tiff.open(p) as ds:
        assert ds.descriptions[0] == "lambda_nm=665.00"
        assert ds.descriptions[1] == "lambda_nm=560.00"
        assert ds.descriptions[2] is None


def test_transform_roundtrip(tmp_path, rng):
    arr = rng.integers(0, 100, size=(1, 8, 8), dtype=np.uint16)
    tr = (10.0, 0.0, 500000.0, 0.0, -10.0, 4600000.0)
    p = tmp_path / "t.tif"
    tiff.write_geotiff(p, arr, transform=tr)
    with tiff.open(p) as ds:
        assert np.allclose(ds.transform, tr)
        # geo passthrough on copy
        p2 = tmp_path / "t2.tif"
        tiff.write_geotiff(p2, ds.read(), geo=ds.geo)
    with tiff.open(p2) as ds2:
        assert np.allclose(ds2.transform, tr)


def test_bigtiff(tmp_path, rng):
    arr = rng.integers(0, 65535, size=(1, 32, 32), dtype=np.uint16)
    p = tmp_path / "big.tif"
    tiff.write_geotiff(p, arr, bigtiff=True)
    with tiff.open(p) as ds:
        np.testing.assert_array_equal(ds.read(), arr)


def test_window_transform():
    tr = (10.0, 0.0, 100.0, 0.0, -10.0, 200.0)
    wt = tiff.window_transform(tiff.Window(3, 5, 4, 4), tr)
    assert wt == (10.0, 0.0, 130.0, 0.0, -10.0, 150.0)


def test_float32(tmp_path, rng):
    arr = rng.random(size=(2, 20, 20)).astype(np.float32)
    meta, out, _ = _roundtrip(tmp_path, arr)
    np.testing.assert_array_equal(out, arr)


def test_one_bit_internal_mask(tmp_path):
    """1-bit packed planes (GDAL/rasterio internal masks) must be unpacked
    bitwise, not misread as bytes."""
    PIL = pytest.importorskip("PIL.Image")
    from tpukit.io import tiff
    m = np.zeros((20, 33), np.uint8)
    m[3:15, 5:29] = 1
    img = PIL.fromarray(m.astype(bool))
    p = tmp_path / "mask1bit.tif"
    img.save(p)
    with tiff.Dataset(p) as ds:
        got = ds.read(1)
    np.testing.assert_array_equal(got.astype(bool), m.astype(bool))


def test_sparse_output_roundtrip(tmp_path, rng):
    """SPARSE_OK-equivalent writing: all-nodata blocks get offset 0 and
    read back as nodata fill (reference ccsds123_wrap.py:175-177)."""
    nd = -7
    cube = rng.integers(-2000, 2000, (3, 48, 48)).astype(np.int16)
    cube[:, :16, :] = nd  # top row of 16x16 blocks: all nodata
    p = tmp_path / "sparse.tif"
    tiff.write_geotiff(p, cube, nodata=float(nd), blockxsize=16,
                       blockysize=16, sparse_ok=True)
    dense = tmp_path / "dense.tif"
    tiff.write_geotiff(dense, cube, nodata=float(nd), blockxsize=16,
                       blockysize=16)
    assert p.stat().st_size < dense.stat().st_size
    with tiff.open(p) as ds:
        np.testing.assert_array_equal(ds.read(), cube)
        assert ds.nodata == nd


def test_sparse_output_zero_fill_without_nodata(tmp_path):
    arr = np.zeros((32, 32), np.uint16)
    arr[20:25, 20:25] = 77
    p = tmp_path / "z.tif"
    tiff.write_geotiff(p, arr, blockxsize=16, blockysize=16, sparse_ok=True)
    with tiff.open(p) as ds:
        np.testing.assert_array_equal(ds.read(1), arr)


def test_stripwriter_is_crash_safe(tmp_path, rng):
    """An unclosed StripWriter must never leave a final-named file: strips
    stream into .part and only close() (which emits the IFD) renames."""
    data = rng.integers(0, 65535, (2, 8, 16)).astype(np.uint16)
    p = tmp_path / "out.tif"
    w = tiff.StripWriter(p, count=2, height=8, width=16, dtype=np.uint16,
                         rows_per_strip=4)
    w.write(0, data[:, :4])
    assert not p.exists()
    assert p.with_name("out.tif.part").exists()
    w.abort()
    assert not p.with_name("out.tif.part").exists()
    # full write-close produces the final file, readable
    w = tiff.StripWriter(p, count=2, height=8, width=16, dtype=np.uint16,
                         rows_per_strip=4)
    w.write(0, data[:, :4])
    w.write(4, data[:, 4:])
    assert w.close() == p
    with tiff.open(p) as ds:
        np.testing.assert_array_equal(ds.read(), data)
