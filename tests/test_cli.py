# -*- coding: utf-8 -*-
"""CLI surface: wrapper JSON contract + runner + figures end-to-end."""

import json
import subprocess
import sys

import numpy as np
import pytest

from tpukit.io import tiff, write_manifest


@pytest.fixture
def tile_file(tmp_path, rng):
    cube = rng.integers(0, 4096, (4, 32, 32)).astype(np.uint16)
    p = tmp_path / "tile.tif"
    tiff.write_geotiff(p, cube, nodata=None)
    return p, cube


def _run_inproc(fn, argv, capsys):
    rc = fn(argv)
    out = capsys.readouterr().out
    assert rc == 0
    return json.loads(out.strip().splitlines()[-1])


def test_wrapper_json_contract_ccsds121(tile_file, tmp_path, capsys):
    from tpukit.cli.wrappers import ccsds121_main
    p, cube = tile_file
    out = tmp_path / "recon.tif"
    bit = tmp_path / "bit"
    meta = _run_inproc(ccsds121_main,
                       ["--in", str(p), "--out", str(out),
                        "--keep-bitstream", str(bit),
                        "--tile", "32", "--preproc", "none"], capsys)
    # field set of the reference JSON protocol
    for k in ("codec", "encoder", "bitstream_bytes", "t_comp_s", "t_dec_s",
              "mem_comp_peak_mb", "mem_dec_peak_mb"):
        assert k in meta, k
    assert meta["codec"] == "ccsds121_ext"
    assert meta["bitstream_bytes"] > 0
    with tiff.open(out) as ds:
        np.testing.assert_array_equal(ds.read(), cube)
    assert list(bit.glob("*.aec"))


def test_wrapper_jpegls_near(tile_file, tmp_path, capsys):
    from tpukit.cli.wrappers import jpegls_main
    p, cube = tile_file
    out = tmp_path / "recon.tif"
    meta = _run_inproc(jpegls_main,
                       ["--in", str(p), "--out", str(out),
                        "--nearlossless_eps", "3"], capsys)
    assert meta["nearlossless_eps"] == 3
    with tiff.open(out) as ds:
        err = np.abs(ds.read().astype(int) - cube.astype(int)).max()
    assert err <= 3


def test_run_codec_cli_end_to_end(tmp_path, rng, capsys):
    from tpukit.cli.main import run_codec_main
    cube = rng.integers(0, 4096, (4, 32, 32)).astype(np.uint16)
    p = tmp_path / "t.tif"
    tiff.write_geotiff(p, cube)
    idx = tmp_path / "idx.json"
    write_manifest(idx, "caseA", "tile_1024", [{"tile_id": "HC", "path": p}])
    rc = run_codec_main([
        "--indices", str(idx), "--codec", "j2k",
        "--rate-key", "quality", "--rates", "20", "60",
        "--outdir", str(tmp_path / "runs"), "--reps", "2",
        "--no-artifacts"])
    assert rc == 0
    assert (tmp_path / "runs" / "metrics.csv").exists()
    assert (tmp_path / "runs" / "metrics_mean.csv").exists()
    txt = (tmp_path / "runs" / "metrics.csv").read_text()
    assert txt.count("\n") == 5  # header + 2 rates x 2 reps
    assert "j2k" in txt


def test_main_dispatch_help(capsys):
    from tpukit.cli.main import main
    assert main([]) == 0
    out = capsys.readouterr().out
    assert "run-codec" in out and "codec-ccsds121" in out


def test_doctor_cli(capsys):
    """Environment health check passes on a correctly provisioned box and
    smoke round-trips every codec."""
    from tpukit.cli.main import doctor_main
    assert doctor_main(["--smoke"]) == 0
    out = capsys.readouterr().out
    assert "all required checks passed" in out
    for name in ("ccsds121", "jpegls", "png", "j2k", "ccsds122",
                 "ccsds123"):
        assert f"codec {name}" in out


def test_tile_complexity_cli(tile_file, capsys):
    from tpukit.cli.main import tile_complexity_main
    p, _ = tile_file
    rc = tile_complexity_main([str(p), "--json"])
    assert rc == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "grad_mean" in m and m["bands"] == 4


def test_run_codec_profile_flag(tmp_path, rng):
    """--profile wraps the sweep in a jax.profiler trace and writes the
    TensorBoard/xprof artifacts."""
    from tpukit.cli.main import run_codec_main
    cube = rng.integers(0, 4096, (1, 32, 32)).astype(np.uint16)
    p = tmp_path / "t.tif"
    tiff.write_geotiff(p, cube)
    idx = tmp_path / "idx.json"
    write_manifest(idx, "caseA", "tile_1024", [{"tile_id": "HC", "path": p}])
    trace_dir = tmp_path / "trace"
    rc = run_codec_main([
        "--indices", str(idx), "--codec", "png", "--rate-key", "none",
        "--outdir", str(tmp_path / "runs"), "--reps", "1", "--no-artifacts",
        "--profile", str(trace_dir)])
    assert rc == 0
    planes = list(trace_dir.rglob("*.xplane.pb"))
    assert planes, f"no xplane trace written under {trace_dir}"


def test_all_six_codecs_end_to_end(tmp_path, rng):
    """One small sweep through run-codec for EVERY codec family — the
    cross-codec integration guard (rate-bearing codecs get one lossy
    point, lossless-only ones run at norate)."""
    from tpukit.cli.main import run_codec_main
    from tpukit.io import tiff, write_manifest
    from tpukit.sweep import csvio

    base = rng.integers(300, 3000, (32, 32)).astype(np.int32)
    cube = np.clip(base[None] + rng.integers(-60, 60, (4, 32, 32)),
                   0, 4095).astype(np.uint16)
    p = tmp_path / "t.tif"
    tiff.write_geotiff(p, cube)
    idx = tmp_path / "idx.json"
    write_manifest(idx, "caseA", "tile", [{"tile_id": "T", "path": p}])

    plans = {
        "ccsds121": ["--rate-key", "none", "--preproc", "none",
                     "--tile", "32"],
        "ccsds123": ["--rate-key", "none", "--tile", "32",
                     "--interleave", "bsq"],
        "png": ["--rate-key", "none", "--zlevel", "1"],
        "jpegls": ["--rate-key", "nearlossless_eps", "--rates", "2"],
        "j2k": ["--rate-key", "quality", "--rates", "40"],
        "ccsds122": ["--rate-key", "bpp", "--rates", "2.0"],
    }
    lossless = {"ccsds121", "ccsds123", "png"}
    for codec, extra in plans.items():
        out = tmp_path / f"runs_{codec}"
        run_codec_main(["--indices", str(idx), "--codec", codec,
                        "--outdir", str(out), "--keep-bitstream", *extra])
        df = csvio.read_csv_smart(out / "metrics.csv")
        assert len(df) == 1, codec
        row = df.iloc[0]
        assert row["bitstream_bytes"] > 0, codec
        assert row["cr"] > 0.5, codec
        if codec in lossless:
            assert row["lossless"] == 1, codec
        else:
            assert row["max_abs_err"] <= (2 if codec == "jpegls"
                                          else 4096), codec
        # recon + bitstream artifacts on disk
        rep = next((out / "T").rglob("recon.tif"))
        with tiff.open(rep) as ds:
            assert ds.read().shape == cube.shape
        assert any((rep.parent / "bit").iterdir()), codec
