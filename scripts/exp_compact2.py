"""Round-3 experiment 2: upper bound of alive-ray compaction.

exp_compact.py showed alive rays already cluster (19.6% of 128-ray rows alive
at 19.1% alive) and fine-grained pos keys don't help (tiles still span many
direction cells). Here: extract ONLY the alive rays into a dense batch and
time the kernel under different orderings — the true ceiling for any
compaction scheme. Timing uses inner=4 pipelined dispatches per sync so the
~26 ms relay round-trip amortizes like bench.py's protocol.

Keys tried on the dense alive batch:
  orig     — spawn order (Morton-adjacent at spawn, scrambled by capture holes)
  posC+dir — C-bit x,y position block (coarse!) then 10-bit direction Morton
  dir+pos  — direction first, position second (known bad at full batch)
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from rfx import physics, sampler
from rfx.bvh import build_bvh
from rfx.geometry import make_terrain
from rfx.ops.intersect import is_hit, mesh_soa
from rfx.ops.pallas_trace import PALLAS_LEAF, make_pallas_env_hit
from rfx.tracer import Scene

N = 5_242_880
B = 4

mesh = make_terrain(grid=128, extent=60.0, seed=0)
scene = Scene.from_mesh(mesh)
flat = build_bvh(mesh, leaf_size=PALLAS_LEAF)
env_hit = make_pallas_env_hit(flat)
env_hit_1024 = make_pallas_env_hit(flat, tile_rays=1024)
v0, e1, e2, normals = mesh_soa(scene.vertices, scene.faces)

tx = jnp.asarray([10.0, 0.0, 25.0], jnp.float32)
dirs = sampler.morton_sphere_directions(jax.random.PRNGKey(0), N)

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
def query(o, d):
    t, face, nrm = env_hit(o, d, v0, e1, e2, normals)
    return t, nrm


@jax.jit
def query1024(o, d):
    t, face, nrm = env_hit_1024(o, d, v0, e1, e2, normals)
    return t, nrm


@jax.jit
def bounce_state(o, d, t, nrm):
    hit = is_hit(t)
    newp = jnp.where(hit[:, None], o + d * jnp.where(hit, t, 0.0)[:, None], 1e9)
    newd = jnp.where(hit[:, None], physics.reflect(d, nrm), d)
    return newp, newd


def spread16(v):
    v = v.astype(jnp.uint32)
    v = (v | (v << 8)) & jnp.uint32(0x00FF00FF)
    v = (v | (v << 4)) & jnp.uint32(0x0F0F0F0F)
    v = (v | (v << 2)) & jnp.uint32(0x33333333)
    v = (v | (v << 1)) & jnp.uint32(0x55555555)
    return v


def pos_morton(o, bits, lo=-60.0, hi=60.0):
    q = lambda x: jnp.clip(((x - lo) / (hi - lo) * (1 << bits)).astype(jnp.int32), 0, (1 << bits) - 1)
    return spread16(q(o[:, 0])) | (spread16(q(o[:, 1])) << 1)


def dense_alive(o, d):
    alive = np.asarray(jnp.max(jnp.abs(o), axis=1) < 1e8)
    idx = np.nonzero(alive)[0]
    on = np.asarray(o)[idx]
    dn = np.asarray(d)[idx]
    pad = (-len(idx)) % 2048
    if pad:
        on = np.concatenate([on, np.full((pad, 3), 1e9, np.float32)])
        dn = np.concatenate([dn, np.tile(np.asarray([0, 0, 1], np.float32), (pad, 1))])
    return jnp.asarray(on), jnp.asarray(dn), len(idx)


# walk to bounce states
o = jnp.broadcast_to(tx, (N, 3))
d = dirs
t, nrm = query(o, d)

# calibrate: full-batch coherent query (inner-amortized)
dt0, _ = timeit4(query, o, d)
print(f"bounce 0 full coherent: {dt0*1e3:8.2f} ms/query ({N/dt0/1e6:6.1f} Mr/s)", flush=True)

for b in range(1, B):
    o, d = bounce_state(o, d, t, nrm)
    oa, da, nalive = dense_alive(o, d)
    m = oa.shape[0]

    dt_full, _ = timeit4(query, o, d)
    print(f"\nbounce {b}: alive={nalive} ({100*nalive/N:.1f}%), dense batch {m}", flush=True)
    print(f"  full-batch unsorted        : {dt_full*1e3:8.2f} ms", flush=True)

    orders = {"orig": None}
    for c in (2, 3, 4, 6):
        k = (pos_morton(oa, c).astype(jnp.uint32) << jnp.uint32(20)) | sampler.direction_morton_keys(da, bits=10)
        orders[f"pos{c}+dir"] = jnp.argsort(k)
    kd = (sampler.direction_morton_keys(da, bits=8).astype(jnp.uint32) << jnp.uint32(16)) | (pos_morton(oa, 8) & jnp.uint32(0xFFFF))
    orders["dir+pos"] = jnp.argsort(kd)

    for name, perm in orders.items():
        if perm is None:
            o2, d2 = oa, da
        else:
            o2, d2 = oa[perm], da[perm]
            jax.block_until_ready(o2)
        dt2048, _ = timeit4(query, o2, d2)
        dt1024, _ = timeit4(query1024, o2, d2)
        print(
            f"  dense[{name:9s}] tile2048 {dt2048*1e3:8.2f} ms ({nalive/dt2048/1e6:6.1f} Mr-alive/s) | tile1024 {dt1024*1e3:8.2f} ms",
            flush=True,
        )

    t, nrm = query(o, d)

# machinery at row granularity: 40960-key argsort + row gather of 13 planes
ROWS = N // 128
keys = jnp.asarray(np.random.default_rng(0).integers(0, 2**31, ROWS, dtype=np.int32))
dt_s, order = timeit4(lambda k: jnp.argsort(k), keys)
planes13 = jnp.zeros((13, ROWS, 128), jnp.float32)


@jax.jit
def row_gather(order, p):
    return p[:, order, :]


dt_g, _ = timeit4(row_gather, order, planes13)
print(f"\nrow machinery: argsort({ROWS}) {dt_s*1e3:6.2f} ms, 13-plane row gather {dt_g*1e3:6.2f} ms", flush=True)
