"""Sweep kernel configs (leaf, tile_rays, K_SPEC via env) on the real bounce
states of the flagship workload. Prints ms per query for bounce 0 (coherent)
and bounce 1 (decohered, 19% alive) — the two dominant costs."""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from rfx import physics, sampler
from rfx.bvh import build_bvh
from rfx.geometry import make_terrain
from rfx.ops.intersect import is_hit, mesh_soa
from rfx.ops.pallas_trace import make_pallas_env_hit
from rfx.tracer import Scene

N = 5_242_880
INNER = 6
_ = np.asarray(jnp.ones((8, 128)))

mesh = make_terrain(grid=128, extent=60.0, seed=0)
scene = Scene.from_mesh(mesh)
v0, e1, e2, normals = mesh_soa(scene.vertices, scene.faces)
tx = jnp.asarray([10.0, 0.0, 25.0], jnp.float32)
dirs = sampler.morton_sphere_directions(jax.random.PRNGKey(0), N)

# Build the two dominant bounce states with the default backend.
env0 = make_pallas_env_hit(build_bvh(mesh, leaf_size=16))


@jax.jit
def q(o, d):
    t, f, nrm = env0(o, d, v0, e1, e2, normals)
    return t, nrm


@jax.jit
def adv(o, d, t, nrm):
    hit = is_hit(t)
    newp = jnp.where(hit[:, None], o + d * jnp.where(hit, t, 0.0)[:, None], 1e9)
    newd = jnp.where(hit[:, None], physics.reflect(d, nrm), d)
    return newp, newd


o0 = jnp.broadcast_to(tx, (N, 3))
d0 = dirs
t, nrm = q(o0, d0)
o1, d1 = adv(o0, d0, t, nrm)
jax.block_until_ready(o1)


def timeit(env_hit, o, d):
    @jax.jit
    def f(o, d):
        s = jnp.float32(0.0)
        for i in range(INNER):
            t, _f, _n = env_hit(o + s * 1e-12, d, v0, e1, e2, normals)
            s = s + t.min() * 0
        return s

    s = f(o, d); _ = float(s)
    ts = []
    for _i in range(3):
        t0 = time.perf_counter(); s = f(o, d); _ = float(s)
        ts.append(time.perf_counter() - t0)
    return (min(ts) - 0.026) / INNER


configs = [
    dict(leaf=16, tile_rays=1024),
    dict(leaf=32, tile_rays=1024),
    dict(leaf=64, tile_rays=1024),
    dict(leaf=16, tile_rays=512),
    dict(leaf=16, tile_rays=2048),
    dict(leaf=32, tile_rays=2048),
]

for cfg in configs:
    flat = build_bvh(mesh, leaf_size=cfg["leaf"])
    eh = make_pallas_env_hit(flat, tile_rays=cfg["tile_rays"])
    dt0 = timeit(eh, o0, d0)
    dt1 = timeit(eh, o1, d1)
    print(
        f"leaf={cfg['leaf']:3d} tile={cfg['tile_rays']:4d}: "
        f"b0 {dt0*1e3:7.2f} ms ({N/dt0/1e6:6.1f} Mr/s)  "
        f"b1 {dt1*1e3:7.2f} ms ({N/dt1/1e6:6.1f} Mr/s)  sum {1e3*(dt0+dt1):7.2f}"
    )
