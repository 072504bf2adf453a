# -*- coding: utf-8 -*-
"""External-binary template seam (codecs/extern.py): the reference's
--enc-cmd/--dec-cmd rebinding surface (ccsds121_wrap.py:117-118,
ccsds122_wrap.py:59-62, ccsds123_wrap.py:106-112) driven by fake `cp`
"store" codecs — round-trip, placeholder expansion, diff1 preprocessing,
NoData tile skipping, rate-flag drop, and the wrapper CLI integration."""

import json
import sys

import numpy as np
import pytest

from tpukit.codecs.base import RateSpec
from tpukit.codecs.extern import ExternalCodec, drop_rate_flag, template_to_list


CP_ENC = "cp {in} {out}"
CP_DEC = "cp {in} {out}"


@pytest.fixture
def cube(rng):
    x = rng.integers(0, 4096, size=(3, 40, 56), dtype=np.uint16)
    return (x << 4).astype(np.uint16)


def test_template_to_list_variants():
    assert template_to_list("aec -n {nbit} {in} {out}") == \
        ["aec", "-n", "{nbit}", "{in}", "{out}"]
    assert template_to_list(["a", "{in}"]) == ["a", "{in}"]
    with pytest.raises(TypeError):
        template_to_list(7)


def test_drop_rate_flag():
    toks = ["bpe", "-e", "{in}", "-o", "{out}", "-r", "{bpp}", "-w", "{w}"]
    assert drop_rate_flag(toks) == ["bpe", "-e", "{in}", "-o", "{out}",
                                    "-w", "{w}"]


@pytest.mark.parametrize("interleave", ["bip", "bil", "bsq"])
def test_tile_store_roundtrip(cube, interleave):
    c = ExternalCodec(CP_ENC, CP_DEC, structure="tile", tile=32,
                      interleave=interleave, preproc="none", name="ext")
    res = c.run(cube, "uint16", RateSpec.none(), keep_bitstream=True)
    assert np.array_equal(np.asarray(res.recon), cube)
    assert res.bitstream_bytes == cube.nbytes  # store codec: raw size
    assert res.t_comp_s > 0 and res.t_dec_s > 0
    # 40x56 at tile 32 -> 2x2 grid of tiles, one stream each
    assert len(res.bitstreams) == 4
    assert res.codec == "ext"


def test_tile_store_diff1_inverts(cube):
    """The store codec sees the diff1-preprocessed stream; ExternalCodec
    must apply the inverse so the recon equals the input
    (ccsds121_wrap.py:176-183 semantics)."""
    c = ExternalCodec(CP_ENC, CP_DEC, structure="tile", tile=64,
                      interleave="bsq", preproc="diff1")
    res = c.run(cube, "uint16", RateSpec.none())
    assert np.array_equal(np.asarray(res.recon), cube)


def test_tile_crop_nodata_skips(cube):
    """All-NoData tiles are skipped entirely: copied through, no
    subprocess, excluded from bitstream_bytes (ccsds123_wrap.py:191-229)."""
    nod = 0
    cube = cube.copy()
    cube[:, :, :32] = nod                 # left 32-wide column of tiles
    c = ExternalCodec(CP_ENC, CP_DEC, structure="tile", tile=32,
                      interleave="bsq", crop_nodata=True)
    res = c.run(cube, "uint16", RateSpec.none(), nodata=nod)
    assert np.array_equal(np.asarray(res.recon), cube)
    assert res.extras["skipped_nodata_tiles"] == 2   # 2 tile rows x 1 col
    coded = cube[:, :, 32:].nbytes
    assert res.bitstream_bytes == coded


def test_tile_crop_nodata_dataset_mask(cube):
    """Dataset mask takes precedence over the nodata DN for the skip
    decision (ccsds123_wrap.py:191-206)."""
    mask = np.ones(cube.shape[1:], np.uint8) * 255
    mask[:, :32] = 0
    c = ExternalCodec(CP_ENC, CP_DEC, structure="tile", tile=32,
                      interleave="bsq", crop_nodata=True)
    res = c.run(cube, "uint16", RateSpec.none(), dataset_mask=mask)
    assert res.extras["skipped_nodata_tiles"] == 2
    assert np.array_equal(np.asarray(res.recon), cube)


def test_band_store_roundtrip_and_bpp(cube):
    """Band mode: per-band planes, {bpp} placeholder from --cr conversion
    (ccsds122_wrap.py:97-104), effective-lossless drops -r."""
    enc = sys.executable + \
        " -c \"import shutil,sys;shutil.copy(sys.argv[1],sys.argv[2])\"" \
        " {in} {out}"
    c = ExternalCodec(enc, enc, structure="band", name="ext122")
    B = cube.shape[0]
    # cr=4 on 16-bit: per-band bpp = (16*B/4)/B = 4.0
    res = c.run(cube, "uint16", RateSpec.of("cr", 4.0))
    assert res.extras["bpp_req_band"] == pytest.approx(4.0)
    assert not res.extras["lossless_requested"]
    assert np.array_equal(np.asarray(res.recon), cube)
    # no rate key -> effective lossless -> '-r {bpp}' dropped from template
    c2 = ExternalCodec("cp -r {bpp} {in} {out}".replace("-r {bpp} ", "") ,
                       CP_DEC, structure="band")
    res2 = c2.run(cube, "uint16", RateSpec.none())
    assert res2.extras["lossless_requested"]


def test_band_rate_drop_removes_tokens(cube):
    """A template carrying '-r {bpp}' must lose the pair on effective
    lossless — `cp` would otherwise die on the unknown flag."""
    c = ExternalCodec("cp -r {bpp} {in} {out}", CP_DEC, structure="band")
    res = c.run(cube, "uint16", RateSpec.none())
    assert np.array_equal(np.asarray(res.recon), cube)


def test_failing_binary_raises(cube):
    c = ExternalCodec("false", "false", structure="tile", tile=64)
    with pytest.raises(RuntimeError, match="External codec failed"):
        c.run(cube, "uint16", RateSpec.none())


def test_wrapper_cli_enc_cmd(tmp_path, cube, capsys):
    """codec-ccsds121 --enc-cmd/--dec-cmd routes through ExternalCodec and
    keeps the JSON-last-line protocol."""
    from tpukit.cli.wrappers import ccsds121_main
    from tpukit.io import tiff

    src = tmp_path / "in.tif"
    out = tmp_path / "recon.tif"
    tiff.write_geotiff(src, cube)
    rc = ccsds121_main(["--in", str(src), "--out", str(out),
                        "--preproc", "diff1", "--tile", "32",
                        "--enc-cmd", CP_ENC, "--dec-cmd", CP_DEC])
    assert rc == 0
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta["codec"] == "ccsds121_ext"
    assert meta["bitstream_bytes"] == cube.nbytes
    with tiff.open(out) as ds:
        assert np.array_equal(ds.read(), cube)


def test_wrapper_cli_requires_both(tmp_path, cube):
    from tpukit.cli.wrappers import ccsds121_main
    from tpukit.io import tiff
    src = tmp_path / "in.tif"
    tiff.write_geotiff(src, cube)
    with pytest.raises(SystemExit):
        ccsds121_main(["--in", str(src), "--out", str(tmp_path / "o.tif"),
                       "--enc-cmd", CP_ENC])


def test_wrapper_validate_14bit_warns(tmp_path, capsys):
    """--validate-14bit warns on DN beyond the 14-bit effective range
    (reference ccsds121_wrap.py:151-158)."""
    from tpukit.cli.wrappers import ccsds121_main
    from tpukit.io import tiff

    cube = np.full((2, 16, 16), 40000, np.uint16)   # > 16383
    src = tmp_path / "in14.tif"
    tiff.write_geotiff(src, cube)
    ccsds121_main(["--in", str(src), "--out", str(tmp_path / "r.tif"),
                   "--preproc", "none", "--tile", "16",
                   "--validate-14bit"])
    assert "exceed unsigned 14-bit range" in capsys.readouterr().err


def test_tile_structure_rejects_rate(cube):
    """Tile-structured external codecs are lossless-only (the reference
    ccsds121/123 wrappers accept no rate flags) — a rate request must
    raise, not be silently ignored."""
    c = ExternalCodec(CP_ENC, CP_DEC, structure="tile", tile=32)
    assert not c.supports_lossy
    with pytest.raises(ValueError, match="lossless-only"):
        c.run(cube, "uint16", RateSpec.of("bpp", 2.0))


def test_band_structure_rejects_signed(cube):
    """Band mode takes unsigned planes only — an int16 cube viewed as
    uint16 would lossy-code across the 0/65535 wrap."""
    c = ExternalCodec(CP_ENC, CP_DEC, structure="band")
    assert c.supports_lossy
    with pytest.raises(ValueError, match="uint16/uint8"):
        c.run(cube.view(np.int16), "int16", RateSpec.none())
