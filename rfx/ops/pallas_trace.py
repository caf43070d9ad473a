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
  (128, 16) block (triangles on sublanes, the 9 v0/e1/e2 components on
  lanes) and slices each component as a (128, 1) column; ray components are
  (1, 128) rows of the tile's (SUB, 128) planes. Their product broadcasts to
  (128 tris, 128 rays) — a pure outer-product pattern, no transpose, no
  shape cast (Mosaic rejects (8,128)->(N,1) casts). A static unrolled loop
  over the tile's SUB ray rows covers the whole tile; the sublane-axis
  min/argmin folds each (128, 128) candidate plane into that row's best.
  The box test prunes per-ray against each ray's current best t.
- **Coherence is load-bearing**: tiles must be tight direction cones or the
  speculative walk degenerates to brute force (measured 12x on terrain).
  Spawn rays with `rfx.sampler.morton_sphere_directions`, or sort arbitrary
  batches by `rfx.sampler.direction_morton_keys` first.
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

__all__ = ["make_pallas_env_hit", "pallas_closest_hit", "PALLAS_TILE_RAYS", "PALLAS_LEAF", "PALLAS_BLOCK"]

PALLAS_TILE_RAYS = 1024  # default rays per grid program (tunable via tile_rays=)
PALLAS_BLOCK = 128  # triangle-block sublane height (storage quantum)
PALLAS_LEAF = 32  # default triangles per leaf (sub-block); divisor of 128
_MISS = 1e30  # == intersect.MISS as a literal (no captured traced constants)
_K_SPEC = 8  # speculative preorder run length (see _kernel body)


def _kernel(nodef_ref, nodei_ref, trif_ref, o_ref, d_ref, t_ref, idx_ref, agenda_ref, *, sub, leaf):
    """One ray tile vs the whole BVH.

    nodef: SMEM (8, n_nodes) f32 — rows 0-5 = aabb min xyz / max xyz
    nodei: SMEM (8, n_nodes) i32 — rows 0-2 = padded-tri start (-1 internal),
           tri_count, skip
    trif:  VMEM (n_blocks, 128, 16) f32 — triangles on sublanes, lanes 0-8 =
           v0/e1/e2 xyz (padding triangles are degenerate, never hit). A leaf
           is a `leaf`-row sub-block at a leaf-aligned sublane offset — small
           leaves cut the dominant cost (leaf Moller-Trumbore) proportionally
           while only deepening the cheap box-test walk logarithmically.
    o, d:  VMEM (3, 1, SUB, 128) f32 ray component planes for this tile
    out t: (1, SUB, 128) f32;  idx: (1, SUB, 128) i32 padded-tri index (-1 miss)
    """
    from jax.experimental import pallas as pl
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

    group = PALLAS_BLOCK // leaf  # leaves per batched MT pass

    # Per-group index folding constants.
    slot_col = jax.lax.broadcasted_iota(jnp.int32, (PALLAS_BLOCK, 1), 0) // leaf
    loc_col = jax.lax.broadcasted_iota(jnp.int32, (PALLAS_BLOCK, 1), 0) % leaf
    big_i = jnp.int32(2**30)

    def group_visit(bases, t_best, tri_best):
        """Batched MT over `group` leaves (PALLAS_BLOCK candidate tris).

        Each individual leaf visit carries ~5 us of fixed cost on v5e (dynamic
        sublane-slice load, branch, state plumbing) that dwarfs the 16-128
        triangle tests it performs; concatenating `group` pending leaves into
        one 128-row pass amortizes all of it. `bases` may contain duplicates
        (flush padding) — duplicate candidates tie on t and resolve to the
        same min gidx, so results are unchanged.
        """
        tris = []
        for b in bases:
            blk = b // PALLAS_BLOCK
            off = pl.multiple_of(b % PALLAS_BLOCK, leaf)
            tris.append(trif_ref[blk, pl.ds(off, leaf), :])  # (leaf, 16)
        tri = tris[0] if group == 1 else jnp.concatenate(tris, axis=0)  # (128, 16)
        # Global padded-tri index of every candidate row.
        gbase = jnp.zeros((PALLAS_BLOCK, 1), jnp.int32)
        for g, b in enumerate(bases):
            gbase = jnp.where(slot_col == g, b, gbase)
        gidx_col = gbase + loc_col  # (128, 1)

        v0x, v0y, v0z = tri[:, 0:1], tri[:, 1:2], tri[:, 2:3]  # (128, 1) cols
        e1x, e1y, e1z = tri[:, 3:4], tri[:, 4:5], tri[:, 5:6]
        e2x, e2y, e2z = tri[:, 6:7], tri[:, 7:8], tri[:, 8:9]
        t_rows, i_rows = [], []
        for r in range(sub):  # static unroll over the tile's ray rows
            oxr, oyr, ozr = ox8[r : r + 1, :], oy8[r : r + 1, :], oz8[r : r + 1, :]
            dxr, dyr, dzr = dx8[r : r + 1, :], dy8[r : r + 1, :], dz8[r : r + 1, :]
            # pvec = d x e2 — (128, 1) x (1, 128) -> (128 tris, 128 rays)
            px = e2z * dyr - e2y * dzr
            py = e2x * dzr - e2z * dxr
            pz = e2y * dxr - e2x * dyr
            det = e1x * px + e1y * py + e1z * pz
            valid = jnp.abs(det) > 1e-12
            inv_det = jnp.where(valid, 1.0 / jnp.where(valid, det, 1.0), 0.0)
            tvx = oxr - v0x
            tvy = oyr - v0y
            tvz = ozr - v0z
            u = (tvx * px + tvy * py + tvz * pz) * inv_det
            # qvec = tvec x e1
            qx = tvy * e1z - tvz * e1y
            qy = tvz * e1x - tvx * e1z
            qz = tvx * e1y - tvy * e1x
            v = (dxr * qx + dyr * qy + dzr * qz) * inv_det
            t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            ok = valid & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > t_min)
            t = jnp.where(ok, t, _MISS)
            tl = jnp.min(t, axis=0, keepdims=True)  # (1, 128) per-ray best
            ii = jnp.min(
                jnp.where(t <= tl, gidx_col, big_i), axis=0, keepdims=True
            )
            tb = t_best[r : r + 1, :]
            ib = tri_best[r : r + 1, :]
            upd = tl < tb
            t_rows.append(jnp.where(upd, tl, tb))
            i_rows.append(jnp.where(upd, ii, ib))
        t_best = jnp.concatenate(t_rows, axis=0)
        tri_best = jnp.concatenate(i_rows, axis=0)
        return t_best, tri_best

    def box_any_hit(nk, t_best):
        bminx = nodef_ref[0, nk]
        bminy = nodef_ref[1, nk]
        bminz = nodef_ref[2, nk]
        bmaxx = nodef_ref[3, nk]
        bmaxy = nodef_ref[4, nk]
        bmaxz = nodef_ref[5, nk]
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
        # Per-ray pruning against each ray's current best hit (tighter than
        # any tile-wide scalar cap; t_best is already in registers/VMEM).
        box_hit = (t_near <= jnp.minimum(t_far, t_best)) & (t_far >= t_min)
        return jnp.any(box_hit)

    def pop_group(args):
        tb, ib, c = args
        bases = [agenda_ref[c - group + g] for g in range(group)]
        tb, ib = group_visit(bases, tb, ib)
        return tb, ib, c - group

    def body(state):
        node, count, t_best, tri_best = state
        # Speculative K-run: the serial bottleneck of a one-node-at-a-time
        # walk is the vector->scalar `any()` reduce feeding the next cursor
        # value (~2 us of dead latency per node on v5e). Testing K consecutive
        # preorder nodes up front makes the K reduces data-independent so
        # their latencies overlap; the cursor then advances through the
        # precomputed hit bits with cheap scalar logic. Preorder contiguity
        # makes the speculation mostly useful: a descending traversal visits
        # exactly node+1, and skip targets inside the window reuse its bits.
        hits = [box_any_hit(node + k, t_best) for k in range(_K_SPEC)]
        metas = [(nodei_ref[0, node + k], nodei_ref[2, node + k]) for k in range(_K_SPEC)]
        cur = node
        for k in range(_K_SPEC):
            base_k, skip_k = metas[k]
            valid = cur == node + k
            hit = valid & hits[k]
            is_leaf = base_k >= 0
            take = hit & is_leaf

            # Hit leaves go on the agenda; MT runs in batched group passes.
            # The store is UNCONDITIONAL — branches (pl.when / lax.cond) cost
            # ~350 ns of pipeline drain each on v5e, which dominated earlier
            # designs (~70 branches/tile = 25 us). When `take` is false the
            # cursor doesn't advance, so the junk entry is overwritten by the
            # next taken leaf (or never read — `count` bounds valid entries).
            agenda_ref[count] = base_k
            count = count + take.astype(jnp.int32)
            # Leaf hit advances to skip_k too (a leaf's skip is its preorder
            # successor); internal hit descends to the next preorder node.
            nxt = jnp.where(hit & ~is_leaf, cur + 1, skip_k)
            cur = jnp.where(valid, nxt, cur)

        # Drain one full group if pending — the single branch per K-run body.
        # Worst case adds _K_SPEC entries/body and drains `group`, so the
        # agenda stays bounded for group >= _K_SPEC; smaller groups rely on
        # the 64-slot headroom plus one drain per subsequent body.
        t_best, tri_best, count = lax.cond(
            count >= group, pop_group, lambda a: a, (t_best, tri_best, count)
        )
        return cur, count, t_best, tri_best

    def cond(state):
        return state[0] < n_nodes

    t0 = jnp.full((sub, 128), _MISS, jnp.float32)
    i0 = jnp.full((sub, 128), -1, jnp.int32)
    _, count, t_best, tri_best = lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0), t0, i0)
    )

    # Drain everything still pending; slots below index 0 duplicate entry 0
    # (harmless, see group_visit). Never entered when nothing is pending —
    # agenda slot 0 is uninitialized then.
    def flush_body(args):
        tb, ib, c = args
        bases = [agenda_ref[jnp.maximum(c - group + g, 0)] for g in range(group)]
        tb, ib = group_visit(bases, tb, ib)
        return tb, ib, jnp.maximum(c - group, 0)

    t_best, tri_best, _ = lax.while_loop(
        lambda args: args[2] > 0, flush_body, (t_best, tri_best, count)
    )
    t_ref[0] = t_best
    idx_ref[0] = jnp.where(t_best < 1e29, tri_best, -1)


def _pack_bvh(flat: FlatBVH):
    """Host-side packing into kernel layouts (see _kernel docstring)."""
    n = flat.n_nodes
    npad = n + _K_SPEC - 1  # speculative window may read past the last node
    nodef = np.zeros((8, npad), np.float32)
    nodef[0:3, :n] = flat.aabb_min.T
    nodef[3:6, :n] = flat.aabb_max.T
    nodef[0:3, n:] = 1e30  # inverted box: padding nodes never hit
    nodef[3:6, n:] = -1e30
    nodei = np.zeros((8, npad), np.int32)
    # Padded-tri start for leaves (leaf_size-aligned by the builder); -1 marks
    # internal nodes.
    nodei[0, :n] = np.where(flat.tri_count > 0, flat.tri_start, -1)
    nodei[0, n:] = -1
    nodei[1, :n] = flat.tri_count
    nodei[2, :n] = flat.skip
    # Padding nodes jump past the padded end: the kernel's loop bound is the
    # PADDED node count, so a skip of `n` would strand the cursor on a
    # padding node forever (skip==self -> infinite loop -> device fault).
    nodei[2, n:] = npad
    p = flat.n_padded_tris
    pad = (-p) % PALLAS_BLOCK
    blocks = (p + pad) // PALLAS_BLOCK

    def padded(a):
        return np.concatenate([a, np.zeros((pad, 3), np.float32)]) if pad else a

    trif = np.zeros((blocks, PALLAS_BLOCK, 16), np.float32)
    trif[:, :, 0:3] = padded(flat.tri_v0).reshape(blocks, PALLAS_BLOCK, 3)
    trif[:, :, 3:6] = padded(flat.tri_e1).reshape(blocks, PALLAS_BLOCK, 3)
    trif[:, :, 6:9] = padded(flat.tri_e2).reshape(blocks, PALLAS_BLOCK, 3)
    return jnp.asarray(nodef), jnp.asarray(nodei), jnp.asarray(trif)


@partial(jax.jit, static_argnames=("interpret", "sub", "leaf"))
def _pallas_hit_padded(nodef, nodei, trif, o, d, *, interpret=False, sub=8, leaf=PALLAS_LEAF):
    """(N, 3) rays (N multiple of sub*128) -> (t, padded_tri_idx)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = o.shape[0]
    tile = sub * 128
    tiles = n // tile
    oT = o.T.reshape(3, tiles, sub, 128)
    dT = d.T.reshape(3, tiles, sub, 128)

    t, idx = pl.pallas_call(
        partial(_kernel, sub=sub, leaf=leaf),
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 1, sub, 128), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 1, sub, 128), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, sub, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sub, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tiles, sub, 128), jnp.float32),
            jax.ShapeDtypeStruct((tiles, sub, 128), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((256,), jnp.int32)],  # pending-leaf agenda
        interpret=interpret,
    )(nodef, nodei, trif, oT, dT)
    return t.reshape(n), idx.reshape(n)


class _PallasBVH:
    def __init__(self, flat: FlatBVH, interpret: bool = False, tile_rays: int = PALLAS_TILE_RAYS):
        if 128 % flat.leaf_size or flat.leaf_size < 8:
            raise ValueError("pallas backend needs leaf_size in {8,16,32,64,128}")
        if flat.n_padded_tris > 512 * 1024:
            raise NotImplementedError(
                "pallas backend keeps triangles VMEM-resident; "
                f"{flat.n_padded_tris} padded tris exceed the 512k guard "
                "(HBM streaming not yet implemented)"
            )
        if tile_rays % 128:
            raise ValueError("tile_rays must be a multiple of 128")
        self.flat = flat
        self.nodef, self.nodei, self.trif = _pack_bvh(flat)
        self.tri_face = jnp.asarray(flat.tri_face)
        self.tri_v0 = jnp.asarray(flat.tri_v0)
        self.tri_e1 = jnp.asarray(flat.tri_e1)
        self.tri_e2 = jnp.asarray(flat.tri_e2)
        self.interpret = interpret
        self.tile_rays = tile_rays
        self.leaf = flat.leaf_size


def pallas_closest_hit(pb: _PallasBVH, o, d):
    """Forward closest hit: (t, face, padded_tri_idx). Pads the ray batch to
    the tile quantum with dead rays."""
    n = o.shape[0]
    pad = (-n) % pb.tile_rays
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate(
            [d, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], d.dtype), (pad, 3))]
        )
    t, idx = _pallas_hit_padded(
        pb.nodef, pb.nodei, pb.trif, o, d,
        interpret=pb.interpret, sub=pb.tile_rays // 128, leaf=pb.leaf,
    )
    t, idx = t[:n], idx[:n]
    face = jnp.where(idx >= 0, pb.tri_face[jnp.maximum(idx, 0)], -1)
    return t, face, idx


def make_pallas_env_hit(flat_or_mesh, interpret: bool = False, tile_rays: int = PALLAS_TILE_RAYS):
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
    pb = _PallasBVH(flat, interpret=interpret, tile_rays=tile_rays)

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
