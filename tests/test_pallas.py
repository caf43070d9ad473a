"""Pallas traversal kernel: interpret-mode parity with the brute intersector
(compiled-mode parity runs on real TPU hardware via bench.py, not CI)."""

import numpy as np

import jax.numpy as jnp

from rfx.geometry import make_terrain
from rfx.ops.intersect import is_hit, mesh_soa, ray_mesh_closest_hit_brute
from rfx.ops.pallas_trace import make_pallas_env_hit


def test_pallas_interpret_matches_brute(room_mesh):
    env_hit = make_pallas_env_hit(room_mesh, interpret=True)
    v0, e1, e2, normals = mesh_soa(jnp.asarray(room_mesh.vertices), jnp.asarray(room_mesh.faces))
    rng = np.random.default_rng(0)
    n = 1024
    o = jnp.asarray(rng.uniform(-14, 14, (n, 3)), jnp.float32)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    tp, fp, npn = env_hit(o, d, v0, e1, e2, normals)
    tb, fb = ray_mesh_closest_hit_brute(o, d, v0, e1, e2)
    hit = is_hit(tb)
    assert bool(jnp.all(is_hit(tp) == hit))
    assert bool(jnp.allclose(jnp.where(hit, tp, 0), jnp.where(hit, tb, 0), rtol=1e-5, atol=1e-4))
    assert bool(jnp.all(jnp.where(hit, fp, -1) == jnp.where(hit, fb, -1)))
    # kernel-folded normals match the mesh normals of the hit faces (up to sign
    # conventions both are cross(e1, e2) normalized -> identical)
    want = normals[jnp.clip(fb, 0, None)]
    assert bool(jnp.allclose(jnp.where(hit[:, None], npn, 0), jnp.where(hit[:, None], want, 0), atol=1e-5))


def test_pallas_interpret_terrain_nonaligned_batch():
    mesh = make_terrain(grid=16, extent=30.0, seed=7)
    env_hit = make_pallas_env_hit(mesh, interpret=True)
    v0, e1, e2, normals = mesh_soa(jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces))
    rng = np.random.default_rng(8)
    n = 777  # forces tile padding
    o = jnp.asarray(rng.uniform([-15, -15, 0], [15, 15, 15], (n, 3)), jnp.float32)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    tp, fp, _n = env_hit(o, d, v0, e1, e2, normals)
    tb, fb = ray_mesh_closest_hit_brute(o, d, v0, e1, e2)
    hit = is_hit(tb)
    assert tp.shape == (n,)
    assert bool(jnp.all(is_hit(tp) == hit))
    assert bool(jnp.all(jnp.where(hit, fp, -1) == jnp.where(hit, fb, -1)))


def test_pallas_interpret_streaming_matches_brute():
    """HBM-streaming mode (force_stream: leaf blocks DMA'd per drain instead
    of VMEM-resident triangles) must match brute exactly. Exercises the
    >512k-triangle code path on a small mesh."""
    from rfx.bvh import build_bvh
    from rfx.ops.pallas_trace import PALLAS_BLOCK

    mesh = make_terrain(grid=16, extent=30.0, seed=7)
    flat = build_bvh(mesh, leaf_size=PALLAS_BLOCK)
    env_hit = make_pallas_env_hit(flat, interpret=True, force_stream=True)
    v0, e1, e2, normals = mesh_soa(jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces))
    rng = np.random.default_rng(9)
    n = 2048
    o = jnp.asarray(rng.uniform([-15, -15, 0], [15, 15, 15], (n, 3)), jnp.float32)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    tp, fp, npn = env_hit(o, d, v0, e1, e2, normals)
    tb, fb = ray_mesh_closest_hit_brute(o, d, v0, e1, e2)
    hit = is_hit(tb)
    assert bool(jnp.all(is_hit(tp) == hit))
    assert bool(jnp.allclose(jnp.where(hit, tp, 0), jnp.where(hit, tb, 0), rtol=1e-5, atol=1e-4))
    assert bool(jnp.all(jnp.where(hit, fp, -1) == jnp.where(hit, fb, -1)))
