"""Separate relay sync overhead from true device time; find the per-tile floor.

Times f by chaining `inner` dependent calls inside one jit, one sync at the
end — the relay's ~24 ms round-trip is then paid once per measurement.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from rfx import physics, sampler
from rfx.geometry import make_terrain
from rfx.ops.intersect import make_env_intersector, mesh_soa, is_hit
from rfx.tracer import Scene

N = 5_242_880

mesh = make_terrain(grid=128, extent=60.0, seed=0)
scene = Scene.from_mesh(mesh)
v0, e1, e2, normals = mesh_soa(scene.vertices, scene.faces)
tx = jnp.asarray([10.0, 0.0, 25.0], jnp.float32)
dirs = sampler.morton_sphere_directions(jax.random.PRNGKey(0), N)
_ = np.asarray(jnp.ones((8, 128)))  # enter relay sync mode

INNER = 8


def timeit_chain(make_f, o, d, reps=3):
    """make_f(env_hit) -> jitted fn(o, d) returning scalar; chains INNER calls."""
    f = make_f()
    s = f(o, d)
    _ = float(s)
    ts = []
    for _i in range(reps):
        t0 = time.perf_counter()
        s = f(o, d)
        _ = float(s)
        ts.append(time.perf_counter() - t0)
    return min(ts)


# Null chain: relay + jit dispatch overhead only.
@jax.jit
def null_chain(o, d):
    s = jnp.float32(0.0)
    for i in range(INNER):
        s = s + o[0, 0] * i
    return s


s = null_chain(dirs, dirs); _ = float(s)
t0 = time.perf_counter(); s = null_chain(dirs, dirs); _ = float(s)
print(f"null chain sync overhead: {(time.perf_counter()-t0)*1e3:.1f} ms")

for tile_rays in (1024, 2048, 4096):
    env_hit = make_env_intersector("pallas", mesh=mesh, tile_rays=tile_rays)

    def make_f(env_hit=env_hit):
        @jax.jit
        def f(o, d):
            s = jnp.float32(0.0)
            for i in range(INNER):
                # perturb origin so nothing is CSE'd; dependent via s
                t, face, nrm = env_hit(o + s * 1e-9, d, v0, e1, e2, normals)
                s = s + t.min()
            return s
        return f

    o = jnp.broadcast_to(tx, (N, 3))
    dt = timeit_chain(make_f, o, dirs) / INNER
    print(f"tile_rays={tile_rays}: bounce-0 coherent query {dt*1e3:7.2f} ms  {N/dt/1e6:7.1f} Mrays/s")

# All-dead floor (every ray parked at 1e9): per-tile fixed cost.
env_hit = make_env_intersector("pallas", mesh=mesh)

def make_f():
    @jax.jit
    def f(o, d):
        s = jnp.float32(0.0)
        for i in range(INNER):
            t, face, nrm = env_hit(o + s, d, v0, e1, e2, normals)
            s = s + t.min() * 0.0
        return s
    return f

o_dead = jnp.full((N, 3), 1e9, jnp.float32)
dt = timeit_chain(make_f, o_dead, dirs) / INNER
print(f"all-dead floor (tile_rays=1024): {dt*1e3:7.2f} ms  ({dt/5120*1e6:.2f} us/tile)")

# Natural-order bounce states, amortized: how expensive are bounces 1-3 truly?
env_hit_j = make_env_intersector("pallas", mesh=mesh)

@jax.jit
def query1(o, d):
    t, face, nrm = env_hit_j(o, d, v0, e1, e2, normals)
    return t, nrm

@jax.jit
def advance(o, d, t, nrm):
    hit = is_hit(t)
    newp = jnp.where(hit[:, None], o + d * jnp.where(hit, t, 0.0)[:, None], 1e9)
    newd = jnp.where(hit[:, None], physics.reflect(d, nrm), d)
    return newp, newd

o = jnp.broadcast_to(tx, (N, 3)); d = dirs
states = []
for b in range(4):
    states.append((o, d))
    t, nrm = query1(o, d)
    o, d = advance(o, d, t, nrm)

for b, (o, d) in enumerate(states):
    def make_f(o=o, d=d):
        @jax.jit
        def f(o, d):
            s = jnp.float32(0.0)
            for i in range(INNER):
                t, face, nrm = env_hit_j(o + s * 1e-9, d, v0, e1, e2, normals)
                s = s + t.min() * 0.0
            return s
        return f
    dt = timeit_chain(make_f, o, d) / INNER
    # tile aliveness in natural order
    alive = np.asarray(jnp.max(jnp.abs(o), axis=1) < 1e8).reshape(-1, 1024)
    n_alive = alive.sum()
    tiles_any = (alive.any(axis=1)).sum()
    print(
        f"bounce {b}: device query {dt*1e3:7.2f} ms ({N/dt/1e6:6.1f} Mr/s)  "
        f"alive={n_alive} rays in {tiles_any}/5120 tiles"
    )
