"""BVH construction + traversal: parity against the brute-force intersector
(SURVEY.md 4: 'BVH traversal vs brute-force all-triangles argmin')."""

import numpy as np
import pytest

import jax.numpy as jnp

from rfx.bvh import build_bvh
from rfx.geometry import make_terrain
from rfx.ops.bvh_traverse import make_bvh_env_hit
from rfx.ops.intersect import is_hit, mesh_soa, ray_mesh_closest_hit_brute


def _random_rays(mesh, n, rng):
    lo = mesh.vertices.min(0) - 1.0
    hi = mesh.vertices.max(0) + 1.0
    o = jnp.asarray(rng.uniform(lo, hi, (n, 3)), jnp.float32)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, jnp.asarray(d, jnp.float32)


def _assert_matches_brute(mesh, flat, n=2048, seed=0):
    v0, e1, e2, normals = mesh_soa(jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces))
    o, d = _random_rays(mesh, n, np.random.default_rng(seed))
    tb, fb = ray_mesh_closest_hit_brute(o, d, v0, e1, e2)
    ta, fa, _nrm = make_bvh_env_hit(flat)(o, d, v0, e1, e2, normals)
    assert bool(jnp.all(is_hit(ta) == is_hit(tb)))
    hit = is_hit(tb)
    assert bool(jnp.allclose(jnp.where(hit, ta, 0), jnp.where(hit, tb, 0), rtol=1e-5, atol=1e-4))
    assert bool(jnp.all(jnp.where(hit, fa, -1) == jnp.where(hit, fb, -1)))


def test_bvh_matches_brute_room(room_mesh):
    _assert_matches_brute(room_mesh, build_bvh(room_mesh))


def test_bvh_matches_brute_terrain():
    mesh = make_terrain(grid=24, extent=40.0, seed=1)
    _assert_matches_brute(mesh, build_bvh(mesh))


def test_bvh_structure_invariants():
    mesh = make_terrain(grid=16, extent=30.0, seed=2)
    flat = build_bvh(mesh, leaf_size=8)
    n = flat.n_nodes
    assert flat.skip[0] == n  # root subtree spans all nodes
    leaves = flat.tri_count > 0
    # Leaves recover every original face exactly once
    faces = flat.tri_face[flat.tri_face >= 0]
    assert sorted(faces.tolist()) == list(range(mesh.num_faces))
    # Preorder: every internal node's left child is node+1
    assert np.all(flat.skip > np.arange(n))
    # Padded leaf ranges align to the leaf quantum
    assert np.all(flat.tri_start[leaves] % 8 == 0)


def test_native_builder_matches_numpy_traversal():
    pytest.importorskip("ctypes")
    from rfx.ops.native_lib import build_bvh_native, native_available

    if not native_available():
        pytest.skip("native builder toolchain unavailable")
    mesh = make_terrain(grid=24, extent=40.0, seed=3)
    _assert_matches_brute(mesh, build_bvh_native(mesh, 8), seed=4)


def test_bvh_big_leaf_size():
    mesh = make_terrain(grid=24, extent=40.0, seed=5)
    flat = build_bvh(mesh, leaf_size=128)
    assert flat.n_padded_tris % 128 == 0
    _assert_matches_brute(mesh, flat, seed=6)


@pytest.mark.parametrize("arity", [4, 8])
def test_collapse_bvh_parity_and_invariants(arity):
    """n-ary collapse (round 5): leaves — and the triangle SoA — must be
    untouched, the preorder/skip structure must stay well-formed, and
    traversal results must be identical to the binary tree's."""
    from rfx.bvh import collapse_bvh

    mesh = make_terrain(grid=24, extent=40.0, seed=1)
    flat = build_bvh(mesh, method="numpy")
    wide = collapse_bvh(flat, arity)
    assert wide.n_nodes < flat.n_nodes
    assert wide.max_depth() < flat.max_depth()
    # identical leaf set (padded ranges) and shared triangle arrays
    lb = sorted(zip(flat.tri_start[flat.tri_count > 0].tolist(),
                    flat.tri_count[flat.tri_count > 0].tolist()))
    lw = sorted(zip(wide.tri_start[wide.tri_count > 0].tolist(),
                    wide.tri_count[wide.tri_count > 0].tolist()))
    assert lb == lw
    assert wide.tri_v0 is flat.tri_v0 and wide.tri_face is flat.tri_face
    # preorder/skip invariants + arity bound
    n = wide.n_nodes
    assert wide.skip[0] == n
    assert np.all(wide.skip > np.arange(n))
    assert max(len(wide.children(i)) for i in range(n)
               if wide.tri_count[i] == 0) <= arity
    _assert_matches_brute(mesh, wide)


def test_native_sah_builder_matches_numpy_quality():
    """The C++ binned-SAH split (round 5) must produce a tree of the same
    size class as the numpy SAH builder and identical traversal results."""
    from rfx.ops.native_lib import build_bvh_native, native_available

    if not native_available():
        pytest.skip("native builder unavailable")
    mesh = make_terrain(grid=24, extent=40.0, seed=1)
    f_np = build_bvh(mesh, method="numpy")
    f_cc = build_bvh_native(mesh, 8, split="sah")
    assert abs(f_cc.n_nodes - f_np.n_nodes) <= 0.05 * f_np.n_nodes
    _assert_matches_brute(mesh, f_cc)
