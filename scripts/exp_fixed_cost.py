"""Round-3 experiment 3: attribute the ~7-9 ms fixed cost per Pallas query.

exp_compact2 found a bounce-3 dense batch (9 tiles!) still costs 8.9 ms
inner-amortized. Suspects: the AoS->SoA transpose of (N, 3) rays into
(3, tiles, sub, 128) planes, tile_cones, and the output reshape/stack in
pallas_closest_hit. Times each piece, plus the kernel entered directly in
plane layout (what an end-to-end SoA tracer would pay).
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from rfx import sampler
from rfx.bvh import build_bvh
from rfx.geometry import make_terrain
from rfx.ops.pallas_trace import (
    PALLAS_LEAF,
    _PallasBVH,
    make_pallas_env_hit,
    pallas_closest_hit,
    pallas_hit_planes,
    tile_cones,
)

N = 5_242_880
TILE = 2048
SUB = TILE // 128

mesh = make_terrain(grid=128, extent=60.0, seed=0)
flat = build_bvh(mesh, leaf_size=PALLAS_LEAF)
pb = _PallasBVH(flat)

tx = jnp.asarray([10.0, 0.0, 25.0], jnp.float32)
dirs = sampler.morton_sphere_directions(jax.random.PRNGKey(0), N)
o = jnp.broadcast_to(tx, (N, 3))

_ = np.asarray(jnp.ones((8, 128)))


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


@jax.jit
def to_planes(o, d):
    tiles = o.shape[0] // TILE
    return o.T.reshape(3, tiles, SUB, 128), d.T.reshape(3, tiles, SUB, 128)


@jax.jit
def cones_only(oT, dT):
    return tile_cones(oT, dT)


@jax.jit
def query_aos(o, d):
    return pallas_closest_hit(pb, o, d)


@jax.jit
def query_planes(oT, dT):
    return pallas_hit_planes(pb, oT, dT)


dt, (oT, dT) = timeit4(to_planes, o, dirs)
print(f"AoS->SoA transpose (o+d, {N} rays): {dt*1e3:7.2f} ms", flush=True)
dt, _ = timeit4(cones_only, oT, dT)
print(f"tile_cones:                         {dt*1e3:7.2f} ms", flush=True)
dt, _ = timeit4(query_aos, o, dirs)
print(f"pallas_closest_hit (AoS in/out):    {dt*1e3:7.2f} ms", flush=True)
dt, _ = timeit4(query_planes, oT, dT)
print(f"pallas_hit_planes (SoA in/out):     {dt*1e3:7.2f} ms", flush=True)

# tiny batch (replicates the bounce-3 dense case: 9 tiles)
n_small = 9 * TILE
os_, ds_ = o[:n_small], dirs[:n_small]
dt, (oTs, dTs) = timeit4(to_planes, os_, ds_)
print(f"small transpose ({n_small}):          {dt*1e3:7.2f} ms", flush=True)
dt, _ = timeit4(query_aos, os_, ds_)
print(f"small pallas_closest_hit:           {dt*1e3:7.2f} ms", flush=True)
dt, _ = timeit4(query_planes, oTs, dTs)
print(f"small pallas_hit_planes:            {dt*1e3:7.2f} ms", flush=True)

# null dispatch cost through the relay for calibration
@jax.jit
def null(x):
    return x + 1.0

dt, _ = timeit4(null, jnp.ones((8, 128)))
print(f"null dispatch:                      {dt*1e3:7.2f} ms", flush=True)
