"""Round-3 kernel v6 (packed OR-reduce node tests): compiled parity + timing.

Runs the full compiled parity suite, then times the kernel on the flagship
coherent bounce-0 batch and the divergent dense bounce-1 state, at k_spec
8 and 16 (the packed reduce makes wider speculation nearly free).
"""
from __future__ import annotations

import sys
import time
import os

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from test_tpu_compiled import run_compiled_parity_checks

from rfx import physics, sampler
from rfx.bvh import build_bvh
from rfx.geometry import make_terrain
from rfx.ops.intersect import is_hit, mesh_soa
from rfx.ops.pallas_trace import PALLAS_LEAF, make_pallas_env_hit
from rfx.tracer import Scene

_ = np.asarray(jnp.ones((8, 128)))

ncap = run_compiled_parity_checks()
print(f"# compiled parity ok (captured {ncap})", flush=True)

N = 5_242_880
mesh = make_terrain(grid=128, extent=60.0, seed=0)
scene = Scene.from_mesh(mesh)
flat = build_bvh(mesh, leaf_size=PALLAS_LEAF)
v0, e1, e2, normals = mesh_soa(scene.vertices, scene.faces)
tx = jnp.asarray([10.0, 0.0, 25.0], jnp.float32)
dirs = sampler.morton_sphere_directions(jax.random.PRNGKey(0), N)


def timeit4(f, *args, reps=3, inner=4):
    outs = [f(*args) for _ in range(inner)]
    jax.block_until_ready(outs)
    _ = np.asarray(jax.tree_util.tree_leaves(outs)[0]).ravel()[:1]
    ts = []
    for _i in range(reps):
        t0 = time.perf_counter()
        outs = [f(*args) for _ in range(inner)]
        leaf = jax.tree_util.tree_leaves(outs[-1])[0]
        _ = np.asarray(leaf.ravel()[0])
        ts.append((time.perf_counter() - t0) / inner)
    return min(ts), outs[-1]


o = jnp.broadcast_to(tx, (N, 3))
d = dirs

for ks in (8, 16):
    env_hit = make_pallas_env_hit(flat, k_spec=ks)

    @jax.jit
    def query(o, d, env_hit=env_hit):
        t, face, nrm = env_hit(o, d, v0, e1, e2, normals)
        return t, nrm

    dt0, (t, nrm) = timeit4(query, o, d)
    print(f"k_spec={ks}: bounce-0 coherent {dt0*1e3:8.2f} ms ({N/dt0/1e6:6.1f} Mr/s)", flush=True)

    @jax.jit
    def bounce_state(o, d, t, nrm):
        hit = is_hit(t)
        newp = jnp.where(hit[:, None], o + d * jnp.where(hit, t, 0.0)[:, None], 1e9)
        newd = jnp.where(hit[:, None], physics.reflect(d, nrm), d)
        return newp, newd

    o1, d1 = bounce_state(o, d, t, nrm)
    dt1, _ = timeit4(query, o1, d1)
    print(f"k_spec={ks}: bounce-1 full     {dt1*1e3:8.2f} ms", flush=True)
