"""Per-phase attribution of the flagship-bench gap (VERDICT.md weak #1).

Measures, on the real TPU:
  1. kernel-only throughput on the coherent bounce-0 batch
  2. kernel-only throughput on the actual bounce-1/2/3 ray states
     (decohered reflections, parked dead rays) — with and without re-sort
  3. alive-ray counts per bounce (how much work compaction can remove)
  4. cost of a 5.2M-element argsort + carry gather (the re-sort overhead)
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
B = 4

mesh = make_terrain(grid=128, extent=60.0, seed=0)
scene = Scene.from_mesh(mesh)
env_hit = make_env_intersector("pallas", mesh=mesh)
v0, e1, e2, normals = mesh_soa(scene.vertices, scene.faces)

tx = jnp.asarray([10.0, 0.0, 25.0], jnp.float32)
dirs = sampler.morton_sphere_directions(jax.random.PRNGKey(0), N)

# enter relay sync mode
_ = np.asarray(jnp.ones((8, 128)))


def timeit(f, *args, reps=3, inner=1):
    out = f(*args)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    ts = []
    for _i in range(reps):
        t0 = time.perf_counter()
        for _j in range(inner):
            out = f(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(leaf.ravel()[0])
        ts.append((time.perf_counter() - t0) / inner)
    return min(ts), out


@jax.jit
def query(o, d):
    t, face, nrm = env_hit(o, d, v0, e1, e2, normals)
    return t, nrm


@jax.jit
def bounce_state(o, d, t, nrm):
    """Advance one bounce: reflect at hits, park misses."""
    hit = is_hit(t)
    newp = jnp.where(hit[:, None], o + d * jnp.where(hit, t, 0.0)[:, None], 1e9)
    newd = jnp.where(hit[:, None], physics.reflect(d, nrm), d)
    return newp, newd


@jax.jit
def resort(o, d):
    keys = sampler.direction_morton_keys(d)
    dead = jnp.max(jnp.abs(o), axis=1) > 1e8
    keys = jnp.where(dead, jnp.uint32(0xFFFFFFFF), keys)
    order = jnp.argsort(keys)
    return o[order], d[order]


o = jnp.broadcast_to(tx, (N, 3))
d = dirs

dt, (t, nrm) = timeit(query, o, d)
print(f"bounce 0 (coherent spawn):   query {dt*1e3:8.2f} ms  {N/dt/1e6:7.1f} Mrays/s  alive={N}")

for b in range(1, B):
    o, d = bounce_state(o, d, t, nrm)
    alive = int(jnp.sum(jnp.max(jnp.abs(o), axis=1) < 1e8))
    dt_raw, _ = timeit(query, o, d)
    dt_sort, (o2, d2) = timeit(resort, o, d)
    dt_sorted, (t2, nrm2) = timeit(query, o2, d2)
    print(
        f"bounce {b}: alive={alive:8d} ({100*alive/N:5.1f}%)  "
        f"query-unsorted {dt_raw*1e3:8.2f} ms ({N/dt_raw/1e6:6.1f} Mr/s)  "
        f"sort {dt_sort*1e3:6.2f} ms  query-sorted {dt_sorted*1e3:8.2f} ms ({N/dt_sorted/1e6:6.1f} Mr/s)"
    )
    # continue the walk with unsorted state (matches current tracer)
    t, nrm = query(o, d)

# cost of gathering a full carry (12 f32 planes) by a permutation
perm = jnp.argsort(sampler.direction_morton_keys(d))
carry = [jnp.zeros((N,), jnp.float32) for _ in range(12)]


@jax.jit
def gather_carry(perm, *arrs):
    return tuple(a[perm] for a in arrs)


dt, _ = timeit(gather_carry, perm, *carry)
print(f"carry gather (12 planes):    {dt*1e3:8.2f} ms")
