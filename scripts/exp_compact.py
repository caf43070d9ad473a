"""Compaction/re-sort design experiments on real bounce states (round 3).

profile_bounces.py showed direction-only per-ray Morton re-sort makes late
bounces WORSE (bounce 1: 96 ms sorted vs 51 ms unsorted) because it scatters
ray origins, and a per-ray carry gather costs 1.5 s through XLA. This script
measures the alternatives that could actually pay:

  1. How clustered alive rays already are at 128/1024/2048-ray granularity
     (natural Morton-spawn clustering) per bounce.
  2. Oracle per-ray sorts with position-aware keys (pos-Morton,
     pos-then-dir) -> kernel time on the re-sorted state (upper bound of the
     achievable win; ignores sort cost).
  3. Chunk-granularity permutation (1024-ray blocks, key = dead-flag +
     Morton of mean alive position [+ dir]) -> kernel time, plus the cost of
     the chunk argsort and of the chunked XLA gather (rows of 4 KB may hit
     bandwidth where per-element gathers crawl).
  4. Re-sorted state on smaller kernel tiles (denser dead-tile exits).
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from rfx import physics, sampler
from rfx.geometry import make_terrain
from rfx.ops.intersect import make_env_intersector, mesh_soa, is_hit
from rfx.ops.pallas_trace import make_pallas_env_hit
from rfx.bvh import build_bvh
from rfx.ops.pallas_trace import PALLAS_LEAF
from rfx.tracer import Scene

N = 5_242_880
B = 4
CH = 1024  # chunk granularity for the cheap permutation

mesh = make_terrain(grid=128, extent=60.0, seed=0)
scene = Scene.from_mesh(mesh)
flat = build_bvh(mesh, leaf_size=PALLAS_LEAF)
env_hit = make_pallas_env_hit(flat)
env_hit_1024 = make_pallas_env_hit(flat, tile_rays=1024)
env_hit_512 = make_pallas_env_hit(flat, tile_rays=512)
v0, e1, e2, normals = mesh_soa(scene.vertices, scene.faces)

tx = jnp.asarray([10.0, 0.0, 25.0], jnp.float32)
dirs = sampler.morton_sphere_directions(jax.random.PRNGKey(0), N)

_ = np.asarray(jnp.ones((8, 128)))  # relay sync mode


def timeit(f, *args, reps=3):
    out = f(*args)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    ts = []
    for _i in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(leaf.ravel()[0])
        ts.append(time.perf_counter() - t0)
    return min(ts), out


@jax.jit
def query(o, d):
    t, face, nrm = env_hit(o, d, v0, e1, e2, normals)
    return t, nrm


@jax.jit
def query1024(o, d):
    t, face, nrm = env_hit_1024(o, d, v0, e1, e2, normals)
    return t, nrm


@jax.jit
def query512(o, d):
    t, face, nrm = env_hit_512(o, d, v0, e1, e2, normals)
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


def pos_morton(o, bits=10, lo=-60.0, hi=60.0):
    q = lambda x: jnp.clip(((x - lo) / (hi - lo) * (1 << bits)).astype(jnp.int32), 0, (1 << bits) - 1)
    return spread16(q(o[:, 0])) | (spread16(q(o[:, 1])) << 1)  # terrain: x,y carry the info


@jax.jit
def key_pos(o, d):
    dead = jnp.max(jnp.abs(o), axis=1) > 1e8
    return jnp.where(dead, jnp.uint32(0xFFFFFFFF), pos_morton(o))


@jax.jit
def key_posdir(o, d):
    dead = jnp.max(jnp.abs(o), axis=1) > 1e8
    p = pos_morton(o, bits=8) << jnp.uint32(16)  # 16-bit coarse position block
    dk = sampler.direction_morton_keys(d, bits=8)  # 16-bit dir cell within it
    return jnp.where(dead, jnp.uint32(0xFFFFFFFF), p | dk)


@jax.jit
def apply_perm(perm, o, d):
    return o[perm], d[perm]


@jax.jit
def chunk_keys(o, d):
    """Per-1024-chunk key: dead chunks last; alive chunks by Morton of their
    mean alive position (chunks are spawn-coherent so the mean is tight)."""
    oc = o.reshape(-1, CH, 3)
    alive = jnp.max(jnp.abs(oc), axis=2) < 1e8  # (NB, CH)
    cnt = jnp.sum(alive, axis=1)
    mean = jnp.sum(jnp.where(alive[:, :, None], oc, 0.0), axis=1) / jnp.maximum(cnt, 1)[:, None]
    k = pos_morton(mean)
    return jnp.where(cnt > 0, k, jnp.uint32(0xFFFFFFFF)), cnt


@jax.jit
def chunk_perm_apply(o, d):
    k, cnt = chunk_keys(o, d)
    order = jnp.argsort(k)
    oc = o.reshape(-1, CH, 3)[order].reshape(-1, 3)
    dc = d.reshape(-1, CH, 3)[order].reshape(-1, 3)
    return oc, dc


@jax.jit
def chunk_gather_13(order, *planes):
    return tuple(p.reshape(-1, CH)[order].reshape(-1) for p in planes)


# ---- walk to each bounce and measure ----
o = jnp.broadcast_to(tx, (N, 3))
d = dirs
t, nrm = query(o, d)

for b in range(1, B):
    o, d = bounce_state(o, d, t, nrm)
    ov = o  # keep unsorted state for the walk

    alive = np.asarray(jnp.max(jnp.abs(o), axis=1) < 1e8)
    nalive = int(alive.sum())
    for g in (128, 1024, 2048):
        frac = float(np.mean(alive.reshape(-1, g).any(axis=1)))
        print(f"bounce {b}: granularity {g:5d}: {frac*100:5.1f}% chunks alive", flush=True)

    dt_un, _ = timeit(query, o, d)
    print(f"bounce {b}: alive={nalive} unsorted query {dt_un*1e3:8.2f} ms", flush=True)

    # oracle per-ray sorts (sort cost excluded — argsort+gather timed once below)
    for name, keyf in (("pos", key_pos), ("posdir", key_posdir)):
        perm = jnp.argsort(keyf(o, d))
        o2, d2 = apply_perm(perm, o, d)
        jax.block_until_ready(o2)
        dt_s, _ = timeit(query, o2, d2)
        dt_s1k, _ = timeit(query1024, o2, d2)
        dt_s512, _ = timeit(query512, o2, d2)
        print(
            f"bounce {b}: oracle sort[{name}] query {dt_s*1e3:8.2f} ms | tile1024 {dt_s1k*1e3:8.2f} ms | tile512 {dt_s512*1e3:8.2f} ms",
            flush=True,
        )

    # chunk-granularity permutation (the cheap realizable one)
    dt_cp, (o3, d3) = timeit(chunk_perm_apply, o, d)
    dt_c, _ = timeit(query, o3, d3)
    dt_c1k, _ = timeit(query1024, o3, d3)
    print(
        f"bounce {b}: chunk-perm apply {dt_cp*1e3:8.2f} ms; query {dt_c*1e3:8.2f} ms | tile1024 {dt_c1k*1e3:8.2f} ms",
        flush=True,
    )

    t, nrm = query(ov, d)

# permutation machinery costs in isolation
k, cnt = chunk_keys(o, d)
dt_keys, _ = timeit(chunk_keys, o, d)
dt_sort, order = timeit(lambda kk: jnp.argsort(kk), k)
planes = [jnp.zeros((N,), jnp.float32) for _ in range(13)]
dt_g13, _ = timeit(chunk_gather_13, order, *planes)
print(f"chunk perm costs: keys {dt_keys*1e3:6.2f} ms, argsort({N//CH}) {dt_sort*1e3:6.2f} ms, 13-plane chunked gather {dt_g13*1e3:6.2f} ms", flush=True)
