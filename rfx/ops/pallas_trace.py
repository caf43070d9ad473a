"""BVH closest-hit as a Pallas TPU kernel.

TPU-native replacement for warp's CUDA `wp.mesh_query_ray`
(ref kernel.py:71,82). Design (see /opt/skills/guides/pallas_guide.md):

- **Tile-uniform speculative traversal**: each grid program owns a tile of
  TILE_RAYS rays in VMEM. One *scalar* preorder cursor walks the flat
  skip-pointer BVH (rfx.bvh layout); node metadata lives in **SMEM** (scalar
  reads by dynamic index — Mosaic forbids lane-dynamic VMEM loads), and at
  every node the whole tile runs the slab test on the VPU as (8, 128) planes.
  The tile descends iff any ray hits the node box. Redundant box tests are
  the price for a branch-free, gather-free inner loop — the shape TPU wants;
  tiles are coherent for primary rays (shared TX origin).
- **Leaf test**: leaves hold PALLAS_LEAF=128 triangles. A leaf visit reads one
  (16, 128) component-plane block (components on sublanes, triangles on
  lanes — no lane padding, no scalar extraction) and intersects all
  TILE_RAYS x 128 pairs at once: ray components reshaped to (TILE, 1)
  columns broadcast against (1, 128) triangle rows, ~40 VPU ops on
  (TILE, 128) intermediates, then a lane-axis min/argmin folds into the
  per-ray best. Per-ray pruning inside the box test uses a tile-wide scalar
  t_cap (conservative, refreshed after each leaf).
- Per-mesh data is VMEM/SMEM-resident: ~(P/128) x 16 x 128 x 4 B triangles
  (e.g. 2.1 MB at 33 k tris) + (8, n_nodes) SMEM metadata. Meshes beyond
  ~500 k triangles need HBM streaming — guarded, future work.

The public entry `make_pallas_env_hit` carries the same custom-VJP contract
as rfx.ops.bvh_traverse: straight-through hit selection, closed-form t
backward for the selected face.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rfx.bvh import FlatBVH, build_bvh
from rfx.ops.intersect import T_MIN_EPS, closed_form_t, is_hit

__all__ = ["make_pallas_env_hit", "pallas_closest_hit", "PALLAS_TILE_RAYS", "PALLAS_LEAF"]

PALLAS_TILE_RAYS = 1024  # rays per grid program
PALLAS_LEAF = 128  # triangles per leaf block == lane width
_SUB = PALLAS_TILE_RAYS // 128  # ray sublane rows in (8, 128) plane layout
_MISS = 1e30  # == intersect.MISS as a literal (no captured traced constants)


def _kernel(nodef_ref, nodei_ref, trif_ref, o_ref, d_ref, t_ref, idx_ref):
    """One ray tile vs the whole BVH.

    nodef: SMEM (8, n_nodes) f32 — rows 0-5 = aabb min xyz / max xyz
    nodei: SMEM (8, n_nodes) i32 — rows 0-2 = leaf block index (-1 internal),
           tri_count, skip
    trif:  VMEM (n_blocks, 16, 128) f32 — rows 0-8 = v0/e1/e2 xyz planes,
           triangles on lanes (padding lanes are degenerate, never hit)
    o, d:  VMEM (3, 1, 8, 128) f32 ray component planes for this tile
    out t: (1, TILE, 1) f32;  idx: (1, TILE, 1) i32 padded-tri index (-1 miss)
    """
    import jax.lax as lax

    n_nodes = nodef_ref.shape[1]
    t_min = jnp.float32(T_MIN_EPS)

    ox8, oy8, oz8 = o_ref[0, 0], o_ref[1, 0], o_ref[2, 0]
    dx8, dy8, dz8 = d_ref[0, 0], d_ref[1, 0], d_ref[2, 0]
    eps = jnp.float32(1e-30)
    big = jnp.float32(1e30)

    def inv(v):
        ok = jnp.abs(v) > eps
        return jnp.where(ok, 1.0 / jnp.where(ok, v, 1.0), big)

    ix8, iy8, iz8 = inv(dx8), inv(dy8), inv(dz8)

    # Column layouts for the leaf cross-product math.
    col = lambda a: a.reshape(PALLAS_TILE_RAYS, 1)
    oxc, oyc, ozc = col(ox8), col(oy8), col(oz8)
    dxc, dyc, dzc = col(dx8), col(dy8), col(dz8)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, PALLAS_LEAF), 1)

    def leaf_visit(blk, base, t_best, tri_best):
        tri = trif_ref[blk]  # (16, 128)
        v0x, v0y, v0z = tri[0:1], tri[1:2], tri[2:3]  # (1, 128) rows
        e1x, e1y, e1z = tri[3:4], tri[4:5], tri[5:6]
        e2x, e2y, e2z = tri[6:7], tri[7:8], tri[8:9]
        # pvec = d x e2 — (TILE, 1) x (1, 128) -> (TILE, 128)
        px = dyc * e2z - dzc * e2y
        py = dzc * e2x - dxc * e2z
        pz = dxc * e2y - dyc * e2x
        det = e1x * px + e1y * py + e1z * pz
        valid = jnp.abs(det) > 1e-12
        inv_det = jnp.where(valid, 1.0 / jnp.where(valid, det, 1.0), 0.0)
        tvx = oxc - v0x
        tvy = oyc - v0y
        tvz = ozc - v0z
        u = (tvx * px + tvy * py + tvz * pz) * inv_det
        qx = tvy * e1z - tvz * e1y
        qy = tvz * e1x - tvx * e1z
        qz = tvx * e1y - tvy * e1x
        v = (dxc * qx + dyc * qy + dzc * qz) * inv_det
        t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        ok = valid & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > t_min)
        t = jnp.where(ok, t, _MISS)
        tl = jnp.min(t, axis=1, keepdims=True)  # (TILE, 1)
        ll = jnp.min(jnp.where(t <= tl, lane, PALLAS_LEAF), axis=1, keepdims=True)
        upd = tl < t_best
        t_best = jnp.where(upd, tl, t_best)
        tri_best = jnp.where(upd, base + ll, tri_best)
        return t_best, tri_best

    def body(state):
        node, t_best, tri_best, t_cap = state
        bminx = nodef_ref[0, node]
        bminy = nodef_ref[1, node]
        bminz = nodef_ref[2, node]
        bmaxx = nodef_ref[3, node]
        bmaxy = nodef_ref[4, node]
        bmaxz = nodef_ref[5, node]
        lox = (bminx - ox8) * ix8
        hix = (bmaxx - ox8) * ix8
        loy = (bminy - oy8) * iy8
        hiy = (bmaxy - oy8) * iy8
        loz = (bminz - oz8) * iz8
        hiz = (bmaxz - oz8) * iz8
        t_near = jnp.maximum(
            jnp.maximum(jnp.minimum(lox, hix), jnp.minimum(loy, hiy)),
            jnp.minimum(loz, hiz),
        )
        t_far = jnp.minimum(
            jnp.minimum(jnp.maximum(lox, hix), jnp.maximum(loy, hiy)),
            jnp.maximum(loz, hiz),
        )
        box_hit = (t_near <= jnp.minimum(t_far, t_cap)) & (t_far >= t_min)
        any_hit = jnp.any(box_hit)

        blk = nodei_ref[0, node]
        skip = nodei_ref[2, node]
        is_leaf = blk >= 0

        def do_leaf(args):
            tb, ib = args
            tb, ib = leaf_visit(blk, blk * PALLAS_LEAF, tb, ib)
            return tb, ib, jnp.max(tb)

        t_best, tri_best, t_cap = lax.cond(
            any_hit & is_leaf,
            do_leaf,
            lambda args: (args[0], args[1], t_cap),
            (t_best, tri_best),
        )
        node = jnp.where(any_hit & ~is_leaf, node + 1, skip)
        return node, t_best, tri_best, t_cap

    def cond(state):
        return state[0] < n_nodes

    t0 = jnp.full((PALLAS_TILE_RAYS, 1), _MISS, jnp.float32)
    i0 = jnp.full((PALLAS_TILE_RAYS, 1), -1, jnp.int32)
    _, t_best, tri_best, _ = lax.while_loop(
        cond, body, (jnp.int32(0), t0, i0, jnp.float32(_MISS))
    )
    t_ref[0] = t_best
    idx_ref[0] = jnp.where(t_best < 1e29, tri_best, -1)


def _pack_bvh(flat: FlatBVH):
    """Host-side packing into kernel layouts (see _kernel docstring)."""
    n = flat.n_nodes
    nodef = np.zeros((8, n), np.float32)
    nodef[0:3] = flat.aabb_min.T
    nodef[3:6] = flat.aabb_max.T
    nodei = np.zeros((8, n), np.int32)
    # Leaf block index (tri_start is PALLAS_LEAF-aligned for leaf_size=128
    # builds); -1 marks internal nodes.
    nodei[0] = np.where(flat.tri_count > 0, flat.tri_start // PALLAS_LEAF, -1)
    nodei[1] = flat.tri_count
    nodei[2] = flat.skip
    p = flat.n_padded_tris
    assert p % PALLAS_LEAF == 0, "flat BVH must be built with leaf_size=128"
    blocks = p // PALLAS_LEAF
    trif = np.zeros((blocks, 16, PALLAS_LEAF), np.float32)
    trif[:, 0:3] = flat.tri_v0.T.reshape(3, blocks, PALLAS_LEAF).transpose(1, 0, 2)
    trif[:, 3:6] = flat.tri_e1.T.reshape(3, blocks, PALLAS_LEAF).transpose(1, 0, 2)
    trif[:, 6:9] = flat.tri_e2.T.reshape(3, blocks, PALLAS_LEAF).transpose(1, 0, 2)
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

    t, idx = pl.pallas_call(
        _kernel,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 1, _SUB, 128), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 1, _SUB, 128), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, PALLAS_TILE_RAYS, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PALLAS_TILE_RAYS, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tiles, PALLAS_TILE_RAYS, 1), jnp.float32),
            jax.ShapeDtypeStruct((tiles, PALLAS_TILE_RAYS, 1), jnp.int32),
        ],
        interpret=interpret,
    )(nodef, nodei, trif, oT, dT)
    return t.reshape(n), idx.reshape(n)


class _PallasBVH:
    def __init__(self, flat: FlatBVH, interpret: bool = False):
        if flat.n_padded_tris > 512 * 1024:
            raise NotImplementedError(
                "pallas backend keeps triangles VMEM-resident; "
                f"{flat.n_padded_tris} padded tris exceed the 512k guard "
                "(HBM streaming not yet implemented)"
            )
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
        d = jnp.concatenate(
            [d, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], d.dtype), (pad, 3))]
        )
    t, idx = _pallas_hit_padded(pb.nodef, pb.nodei, pb.trif, o, d, interpret=pb.interpret)
    t, idx = t[:n], idx[:n]
    face = jnp.where(idx >= 0, pb.tri_face[jnp.maximum(idx, 0)], -1)
    return t, face, idx


def make_pallas_env_hit(flat_or_mesh, interpret: bool = False):
    """env_hit(o, d, v0, e1, e2) -> (t, face) with Pallas forward + custom VJP
    (straight-through selection; closed-form t backward on the selected face,
    cotangents to the ray arrays — the BVH triangle copy is constant, matching
    rfx.ops.bvh_traverse's non-differentiable-tris mode).

    Accepts a FlatBVH built with leaf_size=PALLAS_LEAF, or a TriangleMesh
    (builds one).
    """
    if isinstance(flat_or_mesh, FlatBVH):
        flat = flat_or_mesh
    else:
        flat = build_bvh(flat_or_mesh, leaf_size=PALLAS_LEAF)
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
