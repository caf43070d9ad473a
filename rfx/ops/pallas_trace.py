"""BVH closest-hit as a Pallas TPU kernel.

TPU-native replacement for warp's CUDA `wp.mesh_query_ray`
(ref kernel.py:71,82). Design (see /opt/skills/guides/pallas_guide.md):

- **Tile-uniform speculative traversal**: each grid program owns a tile of
  TILE_RAYS rays held in VMEM as (8, 128)-aligned component planes. One
  *scalar* preorder cursor walks the flat skip-pointer BVH (rfx.bvh layout);
  at every node the *whole tile* runs the slab test on the VPU. The tile
  descends iff any ray hits the node box. This trades redundant box tests for
  a branch-free, gather-free inner loop — the shape TPU wants. Ray tiles are
  coherent for primary rays (shared TX origin), which keeps the visited-node
  union close to the per-ray optimum.
- **Leaf test**: leaves hold LEAF_SIZE-padded contiguous triangle ranges, so
  the leaf loop is a fully unrolled LEAF_SIZE-step masked Moller-Trumbore of
  the tile against one triangle per step (triangle data read as scalars,
  broadcast over the tile).
- Node AABBs/topology and the leaf-reordered triangle SoA live VMEM-resident
  as (rows, n) planes (lane-padded; a few MB for ~100 k-triangle meshes).
  Larger meshes need HBM streaming — not yet implemented (size-guarded).

The public entry `make_pallas_env_hit` carries the same custom VJP contract
as rfx.ops.bvh_traverse: straight-through hit selection, closed-form t
backward for the selected face.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rfx.bvh import LEAF_SIZE, FlatBVH
from rfx.ops.intersect import MISS, T_MIN_EPS, closed_form_t, is_hit

__all__ = ["make_pallas_env_hit", "pallas_closest_hit", "PALLAS_TILE_RAYS"]

PALLAS_TILE_RAYS = 1024  # rays per grid program: 8 sublanes x 128 lanes
_SUB = PALLAS_TILE_RAYS // 128  # 8


def _kernel(nodef_ref, nodei_ref, trif_ref, o_ref, d_ref, t_ref, idx_ref):
    """One ray tile vs the whole BVH.

    nodef: (8, n_nodes) f32 — rows 0-5 = aabb min xyz, max xyz
    nodei: (8, n_nodes) i32 — rows 0-2 = tri_start, tri_count, skip
    trif:  (16, P) f32 — rows 0-8 = v0.xyz, e1.xyz, e2.xyz (leaf-reordered,
           padded rows are degenerate and never hit)
    o, d:  (3, 1, 8, 128) f32 ray tile component planes (singleton = tile dim)
    out t: (1, 8, 128) f32, idx: (1, 8, 128) i32 (padded-triangle index, -1 miss)
    """
    import jax.lax as lax

    n_nodes = nodef_ref.shape[1]

    ox, oy, oz = o_ref[0, 0], o_ref[1, 0], o_ref[2, 0]
    dx, dy, dz = d_ref[0, 0], d_ref[1, 0], d_ref[2, 0]
    # Safe reciprocal directions for the slab test (IEEE inf-free).
    big = jnp.float32(1e30)
    eps = jnp.float32(1e-30)
    inv_x = jnp.where(jnp.abs(dx) > eps, 1.0 / jnp.where(jnp.abs(dx) > eps, dx, 1.0), big)
    inv_y = jnp.where(jnp.abs(dy) > eps, 1.0 / jnp.where(jnp.abs(dy) > eps, dy, 1.0), big)
    inv_z = jnp.where(jnp.abs(dz) > eps, 1.0 / jnp.where(jnp.abs(dz) > eps, dz, 1.0), big)

    t_min = jnp.float32(T_MIN_EPS)

    def leaf_body(start, t_best, tri_best):
        for l in range(LEAF_SIZE):
            ti = start + l
            v0x = trif_ref[0, ti]
            v0y = trif_ref[1, ti]
            v0z = trif_ref[2, ti]
            e1x = trif_ref[3, ti]
            e1y = trif_ref[4, ti]
            e1z = trif_ref[5, ti]
            e2x = trif_ref[6, ti]
            e2y = trif_ref[7, ti]
            e2z = trif_ref[8, ti]
            # pvec = d x e2 (tile-vector x scalar-broadcast triangle)
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            valid = jnp.abs(det) > 1e-12
            inv_det = jnp.where(valid, 1.0 / jnp.where(valid, det, 1.0), 0.0)
            tvx = ox - v0x
            tvy = oy - v0y
            tvz = oz - v0z
            u = (tvx * px + tvy * py + tvz * pz) * inv_det
            # qvec = tvec x e1
            qx = tvy * e1z - tvz * e1y
            qy = tvz * e1x - tvx * e1z
            qz = tvx * e1y - tvy * e1x
            v = (dx * qx + dy * qy + dz * qz) * inv_det
            t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            ok = valid & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > t_min)
            upd = ok & (t < t_best)
            t_best = jnp.where(upd, t, t_best)
            tri_best = jnp.where(upd, ti, tri_best)
        return t_best, tri_best

    def body(state):
        node, t_best, tri_best = state
        bminx = nodef_ref[0, node]
        bminy = nodef_ref[1, node]
        bminz = nodef_ref[2, node]
        bmaxx = nodef_ref[3, node]
        bmaxy = nodef_ref[4, node]
        bmaxz = nodef_ref[5, node]
        lox = (bminx - ox) * inv_x
        hix = (bmaxx - ox) * inv_x
        loy = (bminy - oy) * inv_y
        hiy = (bmaxy - oy) * inv_y
        loz = (bminz - oz) * inv_z
        hiz = (bmaxz - oz) * inv_z
        t_near = jnp.maximum(
            jnp.maximum(jnp.minimum(lox, hix), jnp.minimum(loy, hiy)),
            jnp.minimum(loz, hiz),
        )
        t_far = jnp.minimum(
            jnp.minimum(jnp.maximum(lox, hix), jnp.maximum(loy, hiy)),
            jnp.maximum(loz, hiz),
        )
        box_hit = (t_near <= jnp.minimum(t_far, t_best)) & (t_far >= t_min)
        any_hit = jnp.any(box_hit)

        count = nodei_ref[1, node]
        start = nodei_ref[0, node]
        skip = nodei_ref[2, node]
        is_leaf = count > 0

        t_best, tri_best = lax.cond(
            any_hit & is_leaf,
            lambda tb, ib: leaf_body(start, tb, ib),
            lambda tb, ib: (tb, ib),
            t_best,
            tri_best,
        )
        # Internal + any ray in the box: descend to node+1; otherwise jump the
        # skip pointer (for a leaf, skip == node+1 in preorder).
        node = jnp.where(any_hit & ~is_leaf, node + 1, skip)
        return node, t_best, tri_best

    def cond(state):
        return state[0] < n_nodes

    t0 = jnp.full((_SUB, 128), 1e30, jnp.float32)  # == intersect.MISS, as a literal
    i0 = jnp.full((_SUB, 128), -1, jnp.int32)
    _, t_best, tri_best = lax.while_loop(cond, body, (jnp.int32(0), t0, i0))
    t_ref[0] = t_best
    idx_ref[0] = jnp.where(is_hit(t_best), tri_best, -1)


def _pack_bvh(flat: FlatBVH):
    """Host-side packing into kernel-friendly planes (see _kernel docstring)."""
    n = flat.n_nodes
    nodef = np.zeros((8, n), np.float32)
    nodef[0:3] = flat.aabb_min.T
    nodef[3:6] = flat.aabb_max.T
    nodei = np.zeros((8, n), np.int32)
    nodei[0] = flat.tri_start
    nodei[1] = flat.tri_count
    nodei[2] = flat.skip
    p = flat.n_padded_tris
    trif = np.zeros((16, p), np.float32)
    trif[0:3] = flat.tri_v0.T
    trif[3:6] = flat.tri_e1.T
    trif[6:9] = flat.tri_e2.T
    return jnp.asarray(nodef), jnp.asarray(nodei), jnp.asarray(trif)


@partial(jax.jit, static_argnames=("interpret",))
def _pallas_hit_padded(nodef, nodei, trif, o, d, *, interpret=False):
    """(N, 3) rays (N multiple of PALLAS_TILE_RAYS) -> (t, padded_tri_idx)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = o.shape[0]
    tiles = n // PALLAS_TILE_RAYS
    oT = o.T.reshape(3, tiles, _SUB, 128)
    dT = d.T.reshape(3, tiles, _SUB, 128)

    grid = (tiles,)
    t, idx = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, nodef.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, nodei.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, trif.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 1, _SUB, 128), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 1, _SUB, 128), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, _SUB, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _SUB, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tiles, _SUB, 128), jnp.float32),
            jax.ShapeDtypeStruct((tiles, _SUB, 128), jnp.int32),
        ],
        interpret=interpret,
    )(nodef, nodei, trif, oT, dT)
    return t.reshape(n), idx.reshape(n)


class _PallasBVH:
    def __init__(self, flat: FlatBVH, interpret: bool = False):
        self.flat = flat
        self.nodef, self.nodei, self.trif = _pack_bvh(flat)
        self.tri_face = jnp.asarray(flat.tri_face)
        self.tri_v0 = jnp.asarray(flat.tri_v0)
        self.tri_e1 = jnp.asarray(flat.tri_e1)
        self.tri_e2 = jnp.asarray(flat.tri_e2)
        self.interpret = interpret


def pallas_closest_hit(pb: _PallasBVH, o, d):
    """Forward closest hit: (t, face, padded_tri_idx). Pads the ray batch to
    the tile quantum with dead rays."""
    n = o.shape[0]
    pad = (-n) % PALLAS_TILE_RAYS
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], d.dtype), (pad, 3))])
    t, idx = _pallas_hit_padded(pb.nodef, pb.nodei, pb.trif, o, d, interpret=pb.interpret)
    t, idx = t[:n], idx[:n]
    face = jnp.where(idx >= 0, pb.tri_face[jnp.maximum(idx, 0)], -1)
    return t, face, idx


def make_pallas_env_hit(flat: FlatBVH, interpret: bool = False):
    """env_hit(o, d, v0, e1, e2) -> (t, face) with Pallas forward + custom VJP
    (straight-through selection; closed-form t backward on the selected face,
    cotangents scattered to ray arrays only — the BVH triangle copy is treated
    as constant, matching rfx.ops.bvh_traverse's non-differentiable-tris mode).
    """
    pb = _PallasBVH(flat, interpret=interpret)

    @jax.custom_vjp
    def env_hit_op(o, d):
        t, face, _ = pallas_closest_hit(pb, o, d)
        return t, face

    def fwd(o, d):
        t, face, idx = pallas_closest_hit(pb, o, d)
        return (t, face), (o, d, idx, t)

    def bwd(res, cotangents):
        o, d, idx, t = res
        g_t, _ = cotangents
        sel = jnp.maximum(idx, 0)
        hit = (idx >= 0) & is_hit(t)
        g = jnp.where(hit, g_t, 0.0)

        def t_of(o_, d_):
            return closed_form_t(o_, d_, pb.tri_v0[sel], pb.tri_e1[sel], pb.tri_e2[sel])

        _, vjp = jax.vjp(t_of, o, d)
        go, gd = vjp(g)
        return go, gd

    env_hit_op.defvjp(fwd, bwd)

    def env_hit(o, d, v0, e1, e2):
        return env_hit_op(o, d)

    return env_hit
