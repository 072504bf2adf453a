# -*- coding: utf-8 -*-
import json

from tpukit.io.manifest import load_indices, write_manifest, load_manifest


def test_load_indices_dict(tmp_path):
    p = tmp_path / "idx.json"
    p.write_text(json.dumps({
        "case": "caseB", "asset": "tile_512",
        "items": [
            {"tile_id": "LC", "path": "a.tif", "mask": "a_mask.tif"},
            {"tile_id": "HC", "path": "b.tif"},
        ]}))
    case, asset, items = load_indices(p)
    assert case == "caseB" and asset == "tile_512"
    assert items[0]["tile_id"] == "LC" and items[0]["mask"].name == "a_mask.tif"
    assert "mask" not in items[1]


def test_load_indices_bare_list(tmp_path):
    p = tmp_path / "idx.json"
    p.write_text(json.dumps([{"tile_id": "X", "path": "x.tif"}]))
    case, asset, items = load_indices(p)
    assert case == "caseA" and asset == "tile_1024" and len(items) == 1


def test_write_and_reload(tmp_path):
    p = tmp_path / "idx.json"
    write_manifest(p, "caseA", "tile_1024",
                   [{"tile_id": "HC", "path": tmp_path / "hc.tif"}])
    m = load_manifest(p)
    assert m.case == "caseA" and m.items[0].tile_id == "HC"
