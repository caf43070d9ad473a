"""Host-side EXACT simulation of the Pallas tile-uniform BVH walk.

Replays the kernel's traversal semantics (preorder skip-pointer walk, per-ray
slab test capped at per-ray t_best, 8-leaf batched drains updating t_best)
in numpy on sampled tiles of the real bounce states dumped by
exp_dump_states.py. Reports node visits and drains per tile at each bounce —
the attribution the device can't give us (is the divergent-tile cost node
tests or leaf MT work?).
"""
import numpy as np

from rfx.bvh import build_bvh
from rfx.geometry import make_terrain
from rfx.ops.pallas_trace import PALLAS_LEAF

TILE = 2048
GROUP = 128 // PALLAS_LEAF

mesh = make_terrain(grid=128, extent=60.0, seed=0)
flat = build_bvh(mesh, leaf_size=PALLAS_LEAF)

n = flat.n_nodes
center = 0.5 * (flat.aabb_min + flat.aabb_max)
half = 0.5 * (flat.aabb_max - flat.aabb_min)
base = np.where(flat.tri_count > 0, flat.tri_start, -1)
skip = flat.skip
tv0, te1, te2 = flat.tri_v0, flat.tri_e1, flat.tri_e2
P = tv0.shape[0]

states = np.load("/tmp/walk_states.npz")


def slab(o, inv, t_best, k):
    lo = (center[k] - half[k] - o) * inv
    hi = (center[k] + half[k] - o) * inv
    t_near = np.minimum(lo, hi).max(axis=1)
    t_far = np.maximum(lo, hi).min(axis=1)
    return (t_near <= np.minimum(t_far, t_best)) & (t_far >= 1e-4)


def mt(o, d, t_best, bases):
    idx = np.concatenate([np.arange(b, b + PALLAS_LEAF) for b in bases])
    idx = np.minimum(idx, P - 1)
    a, b_, c = tv0[idx], te1[idx], te2[idx]
    pv = np.cross(d[:, None, :], c[None])
    det = np.einsum("tj,rtj->rt", b_, pv)
    ok = np.abs(det) > 1e-12
    inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
    tv = o[:, None, :] - a[None]
    u = np.einsum("rtj,rtj->rt", tv, pv) * inv
    qv = np.cross(tv, b_[None])
    v = np.einsum("rj,rtj->rt", d, qv) * inv
    t = np.einsum("tj,rtj->rt", c, qv) * inv
    ok &= (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-4)
    t = np.where(ok, t, np.inf)
    return np.minimum(t_best, t.min(axis=1))


def sim_tile(o, d):
    inv = np.where(np.abs(d) > 1e-30, 1.0 / np.where(np.abs(d) > 1e-30, d, 1), 1e30)
    alive = np.abs(o).max(axis=1) < 1e8
    if not alive.any():
        return 0, 0
    t_best = np.full(len(o), np.inf, np.float32)
    visits = drains = 0
    pending = []
    node = 0
    while node < n:
        visits += 1
        hit = slab(o, inv, t_best, node).any()
        if hit and base[node] >= 0:
            pending.append(base[node])
            if len(pending) == GROUP:
                t_best = mt(o, d, t_best, pending)
                drains += 1
                pending = []
        node = node + 1 if (hit and base[node] < 0) else skip[node]
    if pending:
        t_best = mt(o, d, t_best, pending + [pending[-1]] * (GROUP - len(pending)))
        drains += 1
    return visits, drains


rng = np.random.default_rng(0)
for b in (0, 1, 2):
    o_all, d_all = states[f"o{b}"], states[f"d{b}"]
    n_tiles = len(o_all) // TILE
    vs, ds_, alive_tiles = [], [], 0
    sample = rng.choice(n_tiles, 48, replace=False)
    for ti in sample:
        o = o_all[ti * TILE : (ti + 1) * TILE].astype(np.float64)
        d = d_all[ti * TILE : (ti + 1) * TILE].astype(np.float64)
        v, dr = sim_tile(o, d)
        if v or dr:
            alive_tiles += 1
            vs.append(v)
            ds_.append(dr)
    vs, ds_ = np.asarray(vs), np.asarray(ds_)
    if len(vs):
        print(
            f"bounce {b}: {alive_tiles}/48 sampled tiles alive; visits/tile "
            f"mean {vs.mean():7.1f} p90 {np.percentile(vs, 90):7.1f} max {vs.max():5d}; "
            f"drains/tile mean {ds_.mean():6.1f} p90 {np.percentile(ds_, 90):6.1f} max {ds_.max():4d} "
            f"(total nodes {n})",
            flush=True,
        )
