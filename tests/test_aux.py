"""Auxiliary subsystems: checkpoint/resume, viz export, config, CLI."""

import json
import os

import numpy as np
import pytest

from rfx.config import CoverageConfig, TraceConfig, resolve_scene
from rfx.utils.checkpoint import ChunkAccumulator, run_chunked
from rfx.viz import scene_to_html


def test_chunk_accumulator_resume(tmp_path):
    d = str(tmp_path / "acc")
    calls = []

    def chunk(cid):
        calls.append(cid)
        return {"ir": np.full(4, float(cid + 1))}

    out = run_chunked(chunk, 3, d)
    assert np.allclose(out["ir"], 1 + 2 + 3)
    assert calls == [0, 1, 2]

    # Resume: nothing re-runs, result intact
    calls.clear()
    out2 = run_chunked(chunk, 3, d)
    assert calls == []
    assert np.allclose(out2["ir"], 6)

    # Extend: only the new chunk runs
    out3 = run_chunked(chunk, 4, d)
    assert calls == [3]
    assert np.allclose(out3["ir"], 10)


def test_chunk_accumulator_idempotent_add(tmp_path):
    acc = ChunkAccumulator(str(tmp_path / "a"))
    acc.add(0, {"x": np.ones(2)})
    acc.add(0, {"x": np.ones(2) * 100})  # ignored: already done
    assert np.allclose(acc.result()["x"], 1.0)
    # Fresh instance reloads from disk
    acc2 = ChunkAccumulator(str(tmp_path / "a"))
    assert acc2.done_chunks == {0}
    assert np.allclose(acc2.result()["x"], 1.0)


def test_scene_html_contains_geometry(box_room):
    paths = [np.asarray([[0, 0, 2], [5, 5, 2]], np.float32)]
    pairs = [(np.asarray([1.0, 2.0, 3.0]), (10, 200, 30))]
    html = scene_to_html(
        mesh=box_room, tx_pos=[0, 0, 2], rx_pos=[5, 5, 2], rx_radius=0.5,
        paths=paths, point_color_pairs=pairs,
    )
    assert "THREE" in html or "three" in html
    assert '"mesh"' in html and '"faces"' in html
    assert '"paths"' in html and '"colored_points"' in html
    # Embedded JSON parses back
    start = html.index("const SCENE = ") + len("const SCENE = ")
    end = html.index(";\n", start)
    payload = json.loads(html[start:end])
    assert len(payload["mesh"]["vertices"]) == box_room.num_vertices
    assert payload["rx_radius"] == 0.5


def test_config_roundtrip_and_grid():
    cfg = CoverageConfig(scene="room", num_rays=1000)
    cfg2 = CoverageConfig.from_json(cfg.to_json())
    assert cfg2 == cfg
    grid = cfg.grid_points()
    # Reference sweep: 16 x 16 x 8 = 2048 points (ref coverage.py:38-40)
    assert grid.shape == (2048, 3)
    assert grid.min() == -15.0 and grid.max() == 15.0


def test_resolve_scene_named_and_path(tmp_path):
    m = resolve_scene("room")
    assert m.num_faces > 0
    with pytest.raises((OSError, ValueError)):
        resolve_scene(str(tmp_path / "missing.stl"))


def test_cli_cir_smoke(tmp_path, capsys):
    from rfx.cli import main

    out = str(tmp_path / "scene.html")
    rc = main([
        "cir", "--scene", "room", "--rays", "2000", "--bounces", "2",
        "--tx", "5", "5", "2", "--rx", "-5", "-5", "2", "--rx-radius", "1.5",
        "--out", out,
    ])
    assert rc == 0
    assert os.path.exists(out)
    text = capsys.readouterr().out
    assert "RX power" in text
