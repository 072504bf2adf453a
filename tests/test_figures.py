# -*- coding: utf-8 -*-
"""Figure layer: consume metrics_mean.csv written by the sweep and render
every figure family without error."""

import numpy as np
import pandas as pd
import pytest

from tpukit.sweep import csvio
from tpukit.viz import figures


@pytest.fixture
def mean_csv(tmp_path, rng):
    rows = []
    for codec in ("j2k_gdal", "jpegls_subproc"):
        for tile in ("HC", "LC"):
            for i, q in enumerate((10, 35, 60, 90)):
                bs = int(40000 / (i + 1))
                for rep in range(2):
                    rows.append({
                        "case": "caseA", "asset": "tile_1024", "codec": codec,
                        "encoder": "x", "nearlossless_eps": None,
                        "rate_key": "quality", "rate_value": q,
                        "tile_id": tile, "width": 64, "height": 64, "bands": 4,
                        "in_bytes": 32768, "bitstream_bytes": bs + rep,
                        "bpp": (bs + rep) * 8 / (64 * 64 * 4),
                        "cr": 32768 / (bs + rep),
                        "psnr_band_avg": 30 + q / 4, "ssim_band_avg": 0.8,
                        "psnr_global": 30 + q / 4 + (1 if tile == "LC" else 0),
                        "ssim_global": 0.8 + q / 1000,
                        "max_abs_err": 90 - q, "lossless": 0,
                        "sam_deg": float("nan"), "sid": float("nan"),
                        "lmse": float("nan"),
                        "t_comp_s": 0.1 + i / 10, "t_dec_s": 0.05,
                        "t_wrap_s": 0.2, "mem_comp_peak_mb": 100 + i,
                        "mem_dec_peak_mb": 90, "link_mbps": 1.0,
                        "link_eff": 0.8, "t_link_tile_s": 1.0,
                        "t_e2e_tile_s": 1.2,
                        "psnr_b1": 30.0, "ssim_b1": 0.8, "maxerr_b1": 5,
                    })
    p = tmp_path / "metrics_mean.csv"
    csvio.write_mean_csv(p, rows)
    return p


def test_rd_curves(tmp_path, mean_csv):
    df = figures.read_csv_smart(mean_csv)
    out = figures.plot_rd(df, tmp_path / "fig" / "rd", ymetric="psnr",
                          codec="j2k_gdal", anchors={"j2k_gdal": "quality=35"},
                          interp=True)
    assert len(out) == 3  # combined + HC + LC
    for p in out:
        assert p.exists() and p.stat().st_size > 1000


def test_overlay_and_pareto(tmp_path, mean_csv):
    df = figures.load_and_merge([mean_csv], dedup=True)
    out = figures.overlay_rd(df, tmp_path / "fig" / "ov",
                             anchors={"jpegls_subproc": "quality=60"})
    assert len(out) == 2
    pareto = figures.pareto_plots(df, tmp_path / "fig" / "ov", tile="HC")
    assert len(pareto) == 3


def test_iso_rate_bars(tmp_path, mean_csv):
    df = figures.read_csv_smart(mean_csv)
    p = figures.iso_rate_psnr_bars(df, tmp_path / "fig" / "iso", tile="LC",
                                   cr_list=(1.5, 2.5))
    assert p is not None and p.exists()


def test_caseb_bars(tmp_path, mean_csv):
    df = figures.read_csv_smart(mean_csv)
    out = figures.caseb_bars(df, tmp_path / "bars")
    assert len(out) == 3
    for p in out:
        assert p.exists()


def test_interp_helpers():
    x = np.array([1.0, 2.0, 4.0])
    y = np.array([10.0, 20.0, 40.0])
    xi, yi = figures.interp_curve_xy(x, y, 7)
    assert len(xi) == 7 and yi[0] == 10 and yi[-1] == 40
    at = figures.interp_y_at_x(x, y, [3.0, 9.0])
    assert at[0] == 30.0 and np.isnan(at[1])
    assert figures.interp_x_at_y(x, y, 20.0) == 2.0
