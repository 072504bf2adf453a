# -*- coding: utf-8 -*-
"""Baseline pipelines on synthetic miniature products."""

import numpy as np
import pytest

from tpukit.io import tiff
from tpukit.io.manifest import load_manifest
from tpukit.pipelines import baseline_a, baseline_b


def test_case_a_end_to_end(tmp_path, rng):
    # four synthetic 10m "JP2" bands as GeoTIFFs, 300x200
    paths = []
    tr = (10.0, 0.0, 500000.0, 0.0, -10.0, 4600000.0)
    for name in ("B02", "B03", "B04", "B08"):
        arr = rng.integers(100, 4000, (1, 200, 300)).astype(np.uint16)
        p = tmp_path / f"T29TNH_{name}_10m.tif"
        tiff.write_geotiff(p, arr, transform=tr)
        paths.append(p)
    cfg = baseline_a.CaseAConfig(
        band_paths=paths, outdir=tmp_path / "baseline",
        scene_w=256, scene_h=128, tile_w=64, tile_h=64,
        hc_off=(10, 20), lc_off=(128, 30), col_off=0, row_off=0)
    res = baseline_a.run(cfg)
    with tiff.open(res["scene12"]) as ds:
        assert ds.count == 4
        data = ds.read()
        assert not np.any(data & 0xF)        # 12-in-16 guaranteed
    m = load_manifest(res["index"])
    assert {i.tile_id for i in m.items} == {"HC", "LC"}
    for item in m.items:
        with tiff.open(item.path) as ds:
            assert (ds.width, ds.height) == (64, 64)
            assert not np.any(ds.read() & 0xF)
    # quicklooks exist
    assert (tmp_path / "baseline" / "caseA_scene_2k10k_12in16_RGB8.tif").exists()


@pytest.fixture
def enmap_product(tmp_path, rng):
    """Two adjacent synthetic EnMAP tiles + metadata XML + flag products."""
    nb = 12
    tr0 = (30.0, 0.0, 600000.0, 0.0, -30.0, 4700000.0)
    tr1 = (30.0, 0.0, 600000.0 + 30.0 * 64, 0.0, -30.0, 4700000.0)
    for k, tr in (("001", tr0), ("002", tr1)):
        cube = rng.integers(-2000, 8000, (nb, 48, 64)).astype(np.int16)
        tiff.write_geotiff(tmp_path / f"ENMAP-DT01-{k}-SPECTRAL_IMAGE.TIF",
                           cube, transform=tr, nodata=-32768)
        flags = np.zeros((1, 48, 64), np.uint16)
        flags[0, :6, :] = 0b10  # cloud bit (index 1)
        tiff.write_geotiff(tmp_path / f"ENMAP-DT01-{k}-QL_QUALITY_TESTFLAGS.TIF",
                           flags, transform=tr)
        pixm = np.zeros((1, 48, 64), np.uint8)
        pixm[0, -3:, :] = 1
        tiff.write_geotiff(tmp_path / f"ENMAP-DT01-{k}-QL_PIXELMASK.TIF",
                           pixm, transform=tr)
    bands_xml = "\n".join(
        f"<bandID number='{i+1}'><wavelengthCenterOfBand>{420+20*i}"
        f"</wavelengthCenterOfBand><badBand>{1 if i == 3 else 0}</badBand></bandID>"
        for i in range(nb))
    (tmp_path / "ENMAP-DT01-METADATA.XML").write_text(
        f"<root><bands>{bands_xml}</bands>"
        "<flagBit index='1' meaning='quality cloud'/>"
        "<flagBit index='2' meaning='quality shadow'/></root>")
    return tmp_path


def test_case_b_end_to_end(tmp_path, enmap_product):
    cfg = baseline_b.CaseBConfig(
        input_raw=enmap_product, output=tmp_path / "out", dt="DT01",
        target_bands=8, tile_size=32, lc=(4, 4), hc=(72, 8), k=2,
        err_mode="mean")
    res = baseline_b.run(cfg)
    with tiff.open(res["scene14"]) as ds:
        assert ds.count == 8
        assert ds.width == 128 and ds.height == 48     # mosaic of 2x 64-wide
        data = ds.read()
        nd = ds.nodata
        body = data[data != nd]
        assert not np.any(body.view(np.uint16) & 0x3)  # 14-in-16
        assert ds.descriptions[0].startswith("lambda_nm=")
    # mask excludes cloud rows and pixelmask rows
    with tiff.open(res["mask"]) as ds:
        m = ds.read(1)
        assert (m[:6] == 0).all()      # cloud bit
        assert (m[-3:] == 0).all()     # pixelmask
        assert m[10:40].any()
    assert res["used_bits"] == {"cloud": 1, "shadow": 2}
    m = load_manifest(res["index"])
    assert {i.tile_id for i in m.items} == {"LC", "HC"}
    for item in m.items:
        assert item.mask is not None and item.mask.exists()
        with tiff.open(item.path) as ds:
            assert (ds.width, ds.height) == (32, 32)


def test_pick_bands_skips_bad_and_uniform():
    lambdas = np.linspace(400, 2400, 20)
    bad = np.zeros(20, bool)
    bad[5] = True
    sel = baseline_b.pick_bands(20, lambdas, bad, 10)
    assert len(sel) == 10
    assert 6 not in sel  # 1-based index of the bad band
    assert sel == sorted(sel)


def test_scene_error_map_modes(rng):
    a = rng.integers(0, 4000, (4, 16, 16)).astype(np.int16)
    b = baseline_b.np.asarray(a).copy()
    b[:, :4] += 3
    for mode in ("max", "mean", "rms", "p95", "count3"):
        u8, emax = baseline_b.scene_error_map(a, b, None, mode, 2)
        assert u8.shape == (16, 16)
        assert u8[:4].max() > 0
        assert u8[8:].max() == 0
