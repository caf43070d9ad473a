import os

import numpy as np
import pytest

from rfx.geometry import (
    icosphere,
    load_stl,
    make_box,
    make_empty_scene,
    make_room,
    make_terrain,
    merge_meshes,
    save_stl,
)


def test_box_is_closed_and_counted():
    m = make_box()
    assert m.num_vertices == 8
    assert m.num_faces == 12
    # Closed surface: every edge shared by exactly 2 faces.
    edges = {}
    for f in m.faces:
        for a, b in ((f[0], f[1]), (f[1], f[2]), (f[2], f[0])):
            key = (min(a, b), max(a, b))
            edges[key] = edges.get(key, 0) + 1
    assert all(c == 2 for c in edges.values())


def test_box_surface_area():
    m = make_box(lo=(0, 0, 0), hi=(2, 3, 4))
    tri = m.triangles()
    areas = 0.5 * np.linalg.norm(np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1)
    assert np.isclose(areas.sum(), 2 * (2 * 3 + 3 * 4 + 2 * 4))


def test_icosphere_matches_reference_refinement():
    # ref tracer.py:27 uses a subdivisions=1 icosphere: 42 verts / 80 faces.
    s = icosphere(center=(1, 2, 3), radius=0.1, subdivisions=1)
    assert s.num_vertices == 42
    assert s.num_faces == 80
    r = np.linalg.norm(s.vertices - np.array([1, 2, 3], np.float32), axis=1)
    np.testing.assert_allclose(r, 0.1, rtol=1e-5)


def test_stl_roundtrip(tmp_path):
    m = make_terrain(grid=16, seed=3)
    p = str(tmp_path / "t.stl")
    save_stl(m, p)
    m2 = load_stl(p)
    assert m2.num_faces == m.num_faces
    # Triangle soups must match exactly (up to corner dedup order).
    t1 = np.sort(m.triangles().reshape(m.num_faces, -1), axis=0)
    t2 = np.sort(m2.triangles().reshape(m2.num_faces, -1), axis=0)
    np.testing.assert_array_equal(t1, t2)


@pytest.mark.skipif(not os.path.exists("/root/reference/models/room.stl"), reason="reference mirror absent")
def test_load_reference_room():
    m = load_stl("/root/reference/models/room.stl")
    assert m.num_faces == 44  # SURVEY.md C10
    lo, hi = m.bounds()
    size = hi - lo
    assert size[0] == pytest.approx(31.6, abs=0.5)
    assert size[2] == pytest.approx(15.8, abs=0.5)


def test_terrain_shapes():
    m = make_terrain(grid=32, extent=10.0, seed=1)
    assert m.num_vertices == 32 * 32
    assert m.num_faces == 2 * 31 * 31
    lo, hi = m.bounds()
    assert lo[0] == pytest.approx(-5.0, abs=1e-4)
    assert hi[1] == pytest.approx(5.0, abs=1e-4)


def test_merge_and_empty_scene():
    m = merge_meshes([make_empty_scene(), make_room()])
    assert m.num_faces == 24
    assert m.num_vertices == 16
