"""BVH closest-hit as a Pallas TPU kernel.

TPU-native replacement for warp's CUDA `wp.mesh_query_ray`
(ref kernel.py:71,82). Measured on v5e: ~300-420 Mrays/s device time for
coherent 5.2M-ray batches against a 32k-triangle terrain (tile_rays 1024 /
2048), exact-match against the jnp reference traversal and the brute
intersector (re-verified on every TPU bench run by bench.py's prologue).

Design (see /opt/skills/guides/pallas_guide.md):

- **Tile-uniform traversal**: each grid program owns TILE_RAYS rays in VMEM.
  One scalar preorder cursor walks the flat skip-pointer BVH (rfx.bvh
  layout); node metadata lives in SMEM (scalar reads by dynamic index —
  Mosaic forbids lane-dynamic VMEM loads). Two pluggable node tests:
  * "box" (default): per-ray slab test on (SUB, 128) planes + an any()
    reduce — tight per-ray closest-hit pruning; measured ~2x faster than the
    cone test on terrain despite the per-node reduce.
  * "cone": pure-scalar test of a per-tile bounding cone (apex/axis/angle
    from `tile_cones`, computed vectorized outside the kernel) against node
    AABBs with a linearly-expanding radius — no vector state per node at
    all; kept for workloads where reduces dominate.
- **Speculative K-runs**: K=8 (tunable k_spec<=16) consecutive preorder nodes are tested per loop
  body so their tests are data-independent and pipeline; the cursor then
  advances through the precomputed hit bits with scalar selects. Preorder
  contiguity makes the speculation mostly useful (descent visits node+1).
- **SMEM ring-buffer leaf agenda**: pending hit leaves are pushed to a
  32-slot SMEM scratch ring with dynamic-index stores (supported by Mosaic;
  only *lane*-dynamic VMEM loads are forbidden). head/tail scalars ride the
  while carry. This replaced round 1's 16-slot scalar-register agenda whose
  128 selects per body dominated the scalar-core critical path (measured:
  ring agenda ~1.6x faster end-to-end on the terrain workload).
- **Dead-tile early exit**: a tile whose rays are all parked (cone sentinel
  cos > 1.5) starts its cursor at n_nodes — the while loop never runs. With
  the bounce loop parking dead rays, late bounces cost ~0.3 us/dead tile
  instead of ~2 us (measured: the all-dead 5120-tile floor fell 10.1 -> 1.6 ms).
- **Batched leaf MT**: a drain concatenates `128/leaf` pending leaves into
  one (128, 16) candidate block and intersects all TILE_RAYS x 128 pairs on
  the VPU. Layout: triangles on sublanes as (128, 1) component columns
  against (1, 128) ray rows — a pure outer-product broadcast, no transpose,
  no shape cast (Mosaic rejects (8,128)->(N,1) casts). A static unrolled
  loop covers the tile's SUB ray rows; sublane-axis min-folds pick each
  ray's best hit.
- **Results live in the output refs**, not loop carries: group passes fold
  hits straight into t/idx/face/normal refs, so conds and while boundaries
  carry only scalars.
- **Gather-free hit attributes**: the winning triangle's unit normal and
  face id are packed in trif lanes 9-12 and folded in-kernel with
  tie-broken select-min reductions, so downstream consumers (the bounce
  loop needs the normal every bounce) never issue an N-sized gather.
- **Coherence is load-bearing**: tiles must be tight direction cones or the
  tile-uniform walk degenerates toward brute force (measured ~12x on
  terrain). Spawn rays with `rfx.sampler.morton_sphere_directions`, or sort
  arbitrary batches by `rfx.sampler.direction_morton_keys` first.
- **Hardware budgets** (verified by compile errors): SMEM totals ~1 MB —
  node/cone tables are stored transposed (minor dim = long dim) because SMEM
  rows are padded, and the tile axis is chunked at 8192 tiles/call; the
  scoped VMEM limit is raised via CompilerParams (trif + 6 output blocks
  exceed the 16 MB default). Meshes beyond ~500k padded triangles switch to
  **HBM streaming**: leaf_size = 128 (one storage block per leaf, 8x fewer
  nodes so the SMEM node table scales to multi-million-triangle meshes) and
  each drain DMAs its lane-padded (128, 128) block HBM->VMEM.

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
from rfx.ops.intersect import T_MAX, T_MIN_EPS, closed_form_t, is_hit

__all__ = [
    "make_pallas_env_hit",
    "pallas_closest_hit",
    "pallas_hit_planes",
    "PALLAS_TILE_RAYS",
    "PALLAS_LEAF",
    "PALLAS_BLOCK",
]

PALLAS_TILE_RAYS = 2048  # default rays per grid program (tunable via tile_rays=);
# sweep on the terrain workload (scripts/sweep_kernel.py): 2048 beats 1024 on
# the coherent bounce (12.5 vs 14.5 ms) and halves the dead-tile floor for
# late bounces; 512 loses badly, 4096 is flat.
PALLAS_BLOCK = 128  # triangle-block sublane height (storage quantum)
PALLAS_LEAF = 16  # default triangles per leaf (sub-block); divisor of 128
_MISS = 1e30  # == intersect.MISS as a literal (no captured traced constants)
_K_SPEC = 8  # default speculative preorder run length
_K_MAX = 16  # node tables are padded for the largest supported k_spec
_AGENDA_CAP = 32  # SMEM ring slots; pending <= (group-1) + _K_SPEC < 32


def _kernel(nodef_ref, nodei_ref, cone_ref, trif_ref, o_ref, d_ref,
            t_ref, idx_ref, fc_ref, nx_ref, ny_ref, nz_ref, tcap_ref, agenda_ref,
            *tri_scratch, sub, leaf, node_test="box", stream=False, k_spec=_K_SPEC):
    """One ray tile vs the whole BVH.

    nodef: SMEM (6, n_nodes) f32 — rows 0-2 = aabb center, 3-5 = aabb
           half-extents (lean layout: SMEM is the scaling limit for large
           meshes — 1M tris @ leaf 128 is ~24k nodes)
    nodei: SMEM (2, n_nodes) i32 — rows: padded-tri start (-1 internal), skip
    cone:  SMEM (10, tiles) f32 — per-tile ray cone from `tile_cones` (rows:
           0-2 apex, 3 apex radius, 4-6 axis, 7 cos(half-angle),
           8 sin(half-angle); cos > 1.5 marks an all-dead tile). Transposed so
           SMEM row padding stays bounded.
    trif:  VMEM (n_blocks, 128, 16) f32 — triangles on sublanes; lanes:
           0-2 v0, 3-5 e1, 6-8 e2, 9-11 unit geometric normal, 12 face id
           (exact in f32 below 2^24), 13-15 zero. Padding triangles are
           degenerate (never hit) with face id -1.
    o, d:  VMEM (3, 1, SUB, 128) f32 ray component planes for this tile
    out:   t (1, SUB, 128) f32; idx (padded-tri index, -1 miss) i32;
           fc (face id, -1 miss) i32; nx/ny/nz (unit normal, 0 on miss) f32
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import jax.lax as lax

    n_nodes = nodef_ref.shape[1]
    t_min = jnp.float32(T_MIN_EPS)

    ox8, oy8, oz8 = o_ref[0, 0], o_ref[1, 0], o_ref[2, 0]
    dx8, dy8, dz8 = d_ref[0, 0], d_ref[1, 0], d_ref[2, 0]
    big = jnp.float32(1e30)

    if node_test == "box":
        eps = jnp.float32(1e-30)

        def inv(v):
            ok = jnp.abs(v) > eps
            return jnp.where(ok, 1.0 / jnp.where(ok, v, 1.0), big)

        ix8, iy8, iz8 = inv(dx8), inv(dy8), inv(dz8)

    tile_id = pl.program_id(0)
    c_ax = cone_ref[0, tile_id]
    c_ay = cone_ref[1, tile_id]
    c_az = cone_ref[2, tile_id]
    c_r0 = cone_ref[3, tile_id]
    c_dx = cone_ref[4, tile_id]
    c_dy = cone_ref[5, tile_id]
    c_dz = cone_ref[6, tile_id]
    c_cos = cone_ref[7, tile_id]
    c_sin = cone_ref[8, tile_id]
    dead_tile = c_cos > 1.5
    wide = c_cos < 0.2  # cone too wide for the angular test: always descend

    group = PALLAS_BLOCK // leaf  # leaves per batched MT pass

    # Per-group index folding constants.
    slot_col = jax.lax.broadcasted_iota(jnp.int32, (PALLAS_BLOCK, 1), 0) // leaf
    loc_col = jax.lax.broadcasted_iota(jnp.int32, (PALLAS_BLOCK, 1), 0) % leaf
    big_i = jnp.int32(2**30)

    def group_visit(bases, head_for_slot=None):
        """Batched MT over `group` leaves (PALLAS_BLOCK candidate tris),
        folding results straight into the output refs.

        Accumulating through refs instead of loop-carried values keeps every
        surrounding cond/while branch scalar-only — measured: a lax.cond
        carrying (SUB, 128) planes costs ~3 us of state plumbing on v5e,
        and that (not compute) dominated earlier designs.

        `bases` may contain duplicates (flush padding) — duplicates tie on t
        and the gidx tie-break resolves every folded attribute to the same
        triangle, so results are unchanged.
        """
        t_best = t_ref[0]
        tri_best = idx_ref[0]
        fc_best = fc_ref[0]
        nx_best, ny_best, nz_best = nx_ref[0], ny_ref[0], nz_ref[0]
        if stream:
            # HBM-resident triangles (>512k-tri meshes). The block's DMA was
            # started when the leaf was PUSHED onto the agenda (up to 8 in
            # flight, one slot per pending leaf), so the drain usually only
            # pays the wait. Slot index = pending-leaf counter mod 8, matching
            # the push side.
            tri_buf, dma_sem = tri_scratch
            blk = bases[0] // PALLAS_BLOCK
            slot = head_for_slot & jnp.int32(7)
            cp = pltpu.make_async_copy(
                trif_ref.at[blk], tri_buf.at[slot], dma_sem.at[slot]
            )
            cp.wait()
            tri = tri_buf[slot]  # (128, 128); lanes 16+ are alignment padding
        else:
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
        cnx, cny, cnz = tri[:, 9:10], tri[:, 10:11], tri[:, 11:12]
        cfc = tri[:, 12:13]
        t_rows, i_rows, f_rows, nx_rows, ny_rows, nz_rows = [], [], [], [], [], []
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
            # Unique-winner mask (ties broken by min gidx) so every folded
            # attribute comes from the SAME triangle.
            sel = (t <= tl) & (gidx_col == ii)
            fl = jnp.min(jnp.where(sel, cfc, big), axis=0, keepdims=True)
            nxl = jnp.min(jnp.where(sel, cnx, big), axis=0, keepdims=True)
            nyl = jnp.min(jnp.where(sel, cny, big), axis=0, keepdims=True)
            nzl = jnp.min(jnp.where(sel, cnz, big), axis=0, keepdims=True)
            tb = t_best[r : r + 1, :]
            upd = tl < tb
            t_rows.append(jnp.where(upd, tl, tb))
            i_rows.append(jnp.where(upd, ii, tri_best[r : r + 1, :]))
            f_rows.append(jnp.where(upd, fl.astype(jnp.int32), fc_best[r : r + 1, :]))
            nx_rows.append(jnp.where(upd, nxl, nx_best[r : r + 1, :]))
            ny_rows.append(jnp.where(upd, nyl, ny_best[r : r + 1, :]))
            nz_rows.append(jnp.where(upd, nzl, nz_best[r : r + 1, :]))
        new_t = jnp.concatenate(t_rows, axis=0)
        if node_test == "cone":
            # Scalar far plane for traversal pruning — only the cone test
            # reads it; in box mode (the default) the store was dead work,
            # one max-reduce per drain (round-5 finding, mirrored from the
            # fused kernel where removing it was measured free).
            tcap_ref[0, 0] = jnp.max(new_t)
        t_ref[0] = new_t
        idx_ref[0] = jnp.concatenate(i_rows, axis=0)
        fc_ref[0] = jnp.concatenate(f_rows, axis=0)
        nx_ref[0] = jnp.concatenate(nx_rows, axis=0)
        ny_ref[0] = jnp.concatenate(ny_rows, axis=0)
        nz_ref[0] = jnp.concatenate(nz_rows, axis=0)

    def cone_node_hit(nk, t_cap):
        """Scalar cone-vs-node-AABB test (conservative, no vector state).

        The cone is treated as its axis ray with a radius that grows as
        w(t) = r0 + sin(theta) * t; the slab test expands each AABB
        half-extent by w(t), which linearizes into per-axis bounds:
            |c_i - t a_i| <= h_i + r0 + sin * t
        ->  t >= (c_i - h_i - r0) / (a_i + sin)   [entry, denom > 0]
            t <= (c_i + h_i + r0) / (a_i - sin)   [exit when a_i > sin]
        This is much tighter than a bounding-sphere test for the flat, wide
        boxes of terrain meshes. Wide cones (sin ~ 1) degrade gracefully:
        denominators go non-positive and the bound drops away (conservative).
        """
        t_lo = jnp.float32(0.0)
        t_hi = jnp.minimum(t_cap, jnp.float32(T_MAX))
        for ci, ai, hrow in (
            (nodef_ref[0, nk] - c_ax, c_dx, 3),
            (nodef_ref[1, nk] - c_ay, c_dy, 4),
            (nodef_ref[2, nk] - c_az, c_dz, 5),
        ):
            h = nodef_ref[hrow, nk] + c_r0
            # entry: need t*(a_i + sin) >= c_i - h (lower side) and
            #        t*(sin - a_i) >= -(c_i + h) (upper side)
            dp = ai + c_sin
            dm = ai - c_sin
            lo1 = (ci - h) / jnp.where(dp > 1e-12, dp, 1.0)
            # infeasible when the slab lies ahead on an axis the cone
            # cannot advance along (dp <= 0 and c_i - h > 0)
            inf1 = (dp <= 1e-12) & (ci - h > 0.0)
            hi1 = (ci + h) / jnp.where(dm > 1e-12, dm, 1.0)
            unb1 = dm <= 1e-12  # no exit bound on this side
            t_lo = jnp.maximum(t_lo, jnp.where(dp > 1e-12, jnp.maximum(lo1, 0.0), 0.0))
            t_hi = jnp.where(inf1, jnp.float32(-1.0), jnp.where(unb1, t_hi, jnp.minimum(t_hi, hi1)))
            # mirrored axis (cone pointing the other way): -c_i case
            dp2 = -ai + c_sin
            dm2 = -ai - c_sin
            lo2 = (-ci - h) / jnp.where(dp2 > 1e-12, dp2, 1.0)
            inf2 = (dp2 <= 1e-12) & (-ci - h > 0.0)
            hi2 = (-ci + h) / jnp.where(dm2 > 1e-12, dm2, 1.0)
            unb2 = dm2 <= 1e-12
            t_lo = jnp.maximum(t_lo, jnp.where(dp2 > 1e-12, jnp.maximum(lo2, 0.0), 0.0))
            t_hi = jnp.where(inf2, jnp.float32(-1.0), jnp.where(unb2, t_hi, jnp.minimum(t_hi, hi2)))
        return (~dead_tile) & (t_lo <= t_hi)

    def box_node_hit(nk, t_best):
        """Per-ray slab test + any() reduce. Prunes 2-3x better than the cone
        test (each ray caps at its own current best t) at the price of one
        ~350 ns vector->scalar reduce per node — amortize with big tiles."""
        cx = nodef_ref[0, nk]
        cy = nodef_ref[1, nk]
        cz = nodef_ref[2, nk]
        hx = nodef_ref[3, nk]
        hy = nodef_ref[4, nk]
        hz = nodef_ref[5, nk]
        lox = (cx - hx - ox8) * ix8
        hix = (cx + hx - ox8) * ix8
        loy = (cy - hy - oy8) * iy8
        hiy = (cy + hy - oy8) * iy8
        loz = (cz - hz - oz8) * iz8
        hiz = (cz + hz - oz8) * iz8
        t_near = jnp.maximum(
            jnp.maximum(jnp.minimum(lox, hix), jnp.minimum(loy, hiy)),
            jnp.minimum(loz, hiz),
        )
        t_far = jnp.minimum(
            jnp.minimum(jnp.maximum(lox, hix), jnp.maximum(loy, hiy)),
            jnp.maximum(loz, hiz),
        )
        box_hit = (t_near <= jnp.minimum(t_far, t_best)) & (t_far >= jnp.float32(T_MIN_EPS))
        return jnp.any(box_hit)

    cap_mask = jnp.int32(_AGENDA_CAP - 1)

    def body(state):
        node, head, tail = state
        if node_test == "box":
            t_best = t_ref[0]
            hits = [box_node_hit(node + k, t_best) for k in range(k_spec)]
        else:
            t_cap = tcap_ref[0, 0]  # scalar far-plane from the last drain
            hits = [cone_node_hit(node + k, t_cap) for k in range(k_spec)]
        metas = [(nodei_ref[0, node + k], nodei_ref[1, node + k]) for k in range(k_spec)]
        cur = node
        for k in range(k_spec):
            base_k, skip_k = metas[k]
            valid = cur == node + k
            hit = valid & hits[k]
            is_leaf = base_k >= 0
            take = hit & is_leaf
            # Push hit leaves onto the SMEM ring (dynamic-index scalar store —
            # replaces round 1's 16 selects per spec node, the scalar-core
            # bottleneck).

            @pl.when(take)
            def _(b=base_k, t=tail):
                agenda_ref[t & cap_mask] = b
                if stream:
                    # Prefetch: start this leaf's HBM->VMEM block copy now;
                    # the drain waits on it. Slots never collide: pending
                    # leaves are bounded by 8 (group == 1 drains everything
                    # each body) and there are 8 buffers.
                    tri_buf, dma_sem = tri_scratch
                    slot = t & jnp.int32(7)
                    pltpu.make_async_copy(
                        trif_ref.at[b // PALLAS_BLOCK], tri_buf.at[slot],
                        dma_sem.at[slot],
                    ).start()

            tail = tail + take.astype(jnp.int32)
            # Leaf hit advances to skip_k too (a leaf's skip is its preorder
            # successor); internal hit descends to the next preorder node.
            nxt = jnp.where(hit & ~is_leaf, cur + 1, skip_k)
            cur = jnp.where(valid, nxt, cur)
        # Drain full groups — max(1, k_spec/group) scalar-predicated passes
        # per body keep the pending count bounded (<= group-1 + k_spec at the
        # drain point). The pl.when body only touches refs, so the branch
        # carries no vector state.
        for _ in range(max(1, k_spec // group)):
            drained = tail - head >= group

            @pl.when(drained)
            def _(h=head):
                group_visit([agenda_ref[(h + g) & cap_mask] for g in range(group)], h)

            head = head + jnp.where(drained, group, 0)
        return cur, head, tail

    def cond(state):
        return state[0] < n_nodes

    # Output refs double as hit accumulators during traversal.
    t_ref[0] = jnp.full((sub, 128), _MISS, jnp.float32)
    idx_ref[0] = jnp.full((sub, 128), -1, jnp.int32)
    fc_ref[0] = jnp.full((sub, 128), -1, jnp.int32)
    nx_ref[0] = jnp.zeros((sub, 128), jnp.float32)
    ny_ref[0] = jnp.zeros((sub, 128), jnp.float32)
    nz_ref[0] = jnp.zeros((sub, 128), jnp.float32)
    tcap_ref[0, 0] = jnp.float32(_MISS)

    # Dead tiles (cone sentinel) start past the last node: the traversal
    # while-loop never runs and the tile costs only the output init.
    node0 = jnp.where(dead_tile, jnp.int32(n_nodes), jnp.int32(0))
    _, head, tail = lax.while_loop(
        cond, body, (node0, jnp.int32(0), jnp.int32(0))
    )

    # Drain the partial tail; ring entries at/past `tail` duplicate the last
    # valid entry (duplicates are harmless — see group_visit).
    def flush_body(state):
        head, tail = state
        last = tail - 1
        bases = [
            agenda_ref[jnp.minimum(head + g, last) & cap_mask] for g in range(group)
        ]
        group_visit(bases, head)
        return jnp.minimum(head + group, tail), tail

    lax.while_loop(lambda s: s[0] < s[1], flush_body, (head, tail))

    # Miss masking (t stays at the MISS sentinel; idx/fc already -1 there,
    # normals already 0 — nothing read them before a first hit fold).


def _pack_bvh(flat: FlatBVH):
    """Host-side packing into kernel layouts (see _kernel docstring)."""
    n = flat.n_nodes
    npad = n + _K_MAX - 1  # speculative window may read past the last node
    nodef = np.zeros((6, npad), np.float32)
    center = 0.5 * (flat.aabb_min + flat.aabb_max)
    half = 0.5 * (flat.aabb_max - flat.aabb_min)
    nodef[0:3, :n] = center.T
    nodef[3:6, :n] = half.T
    # Padding nodes sit far away with zero extent; if a pathological cone
    # still "hits" one they are internal (-1 base) and the cursor just walks
    # +1 through the <= k_spec-1 of them to the exit.
    nodef[0:3, n:] = 4e18
    nodei = np.zeros((2, npad), np.int32)
    # Row 0: padded-tri start for leaves (leaf_size-aligned by the builder);
    # -1 marks internal nodes. Row 1: skip pointer.
    nodei[0, :n] = np.where(flat.tri_count > 0, flat.tri_start, -1)
    nodei[0, n:] = -1
    nodei[1, :n] = flat.skip
    # Padding nodes jump past the padded end: the kernel's loop bound is the
    # PADDED node count, so a skip of `n` would strand the cursor on a
    # padding node forever (skip==self -> infinite loop -> device fault).
    nodei[1, n:] = npad
    p = flat.n_padded_tris
    pad = (-p) % PALLAS_BLOCK
    blocks = (p + pad) // PALLAS_BLOCK

    def padded3(a):
        return np.concatenate([a, np.zeros((pad, 3), np.float32)]) if pad else a

    nrm = np.cross(flat.tri_e1, flat.tri_e2)
    nrm = nrm / np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-30)
    face = flat.tri_face.astype(np.float32)
    if pad:
        face = np.concatenate([face, np.full((pad,), -1.0, np.float32)])

    trif = np.zeros((blocks, PALLAS_BLOCK, 16), np.float32)
    trif[:, :, 0:3] = padded3(flat.tri_v0).reshape(blocks, PALLAS_BLOCK, 3)
    trif[:, :, 3:6] = padded3(flat.tri_e1).reshape(blocks, PALLAS_BLOCK, 3)
    trif[:, :, 6:9] = padded3(flat.tri_e2).reshape(blocks, PALLAS_BLOCK, 3)
    trif[:, :, 9:12] = padded3(nrm).reshape(blocks, PALLAS_BLOCK, 3)
    trif[:, :, 12] = face.reshape(blocks, PALLAS_BLOCK)
    return jnp.asarray(nodef), jnp.asarray(nodei), jnp.asarray(trif)


DEAD_RAY_POS = 1e8  # |origin| beyond this marks a parked (dead) ray


def tile_cones(oT, dT):
    """Per-tile bounding cones for the scalar traversal: (10, tiles) f32 rows
    [apex xyz, apex radius, axis xyz, cos, sin, 0]. Rays parked beyond
    DEAD_RAY_POS are excluded; an all-dead tile gets cos=2 (never hits).
    Vectorized XLA over the whole batch — off the kernel's critical path."""
    alive = jnp.max(jnp.abs(oT), axis=0) < DEAD_RAY_POS  # (tiles, sub, 128)
    a3 = alive[None]
    cnt = jnp.sum(alive, axis=(1, 2))  # (tiles,)
    any_alive = cnt > 0

    omin = jnp.min(jnp.where(a3, oT, jnp.inf), axis=(2, 3))  # (3, tiles)
    omax = jnp.max(jnp.where(a3, oT, -jnp.inf), axis=(2, 3))
    apex = jnp.where(any_alive[None], 0.5 * (omin + omax), 0.0)
    dist2 = jnp.sum((oT - apex[:, :, None, None]) ** 2, axis=0)
    r0 = jnp.sqrt(jnp.max(jnp.where(alive, dist2, 0.0), axis=(1, 2)))

    dsum = jnp.sum(jnp.where(a3, dT, 0.0), axis=(2, 3))  # (3, tiles)
    norm = jnp.sqrt(jnp.sum(dsum * dsum, axis=0))
    ok = norm > 1e-6
    axis = jnp.where(ok[None], dsum / jnp.maximum(norm, 1e-30)[None], 
                     jnp.asarray([0.0, 0.0, 1.0], jnp.float32)[:, None])
    cosd = jnp.sum(axis[:, :, None, None] * dT, axis=0)  # (tiles, sub, 128)
    cmin = jnp.min(jnp.where(alive, cosd, 1.0), axis=(1, 2))
    # Directions spanning more than a hemisphere (or cancelling out) fall
    # back to the always-descend wide path.
    cmin = jnp.where(ok, cmin, -1.0)
    cmin = jnp.where(any_alive, cmin, 2.0)  # dead-tile sentinel
    sin = jnp.sqrt(jnp.maximum(1.0 - jnp.minimum(cmin, 1.0) ** 2, 0.0))

    tiles = oT.shape[1]
    cone = jnp.zeros((10, tiles), jnp.float32)
    cone = cone.at[0:3, :].set(apex)
    cone = cone.at[3, :].set(r0)
    cone = cone.at[4:7, :].set(axis)
    cone = cone.at[7, :].set(cmin)
    cone = cone.at[8, :].set(sin)
    return cone


@partial(jax.jit, static_argnames=("interpret", "sub", "leaf", "node_test", "stream", "k_spec"))
def _pallas_hit_tiled(nodef, nodei, trif, oT, dT, *, interpret=False, sub=8, leaf=PALLAS_LEAF, node_test="box", stream=False, k_spec=_K_SPEC):
    """Tiled rays (3, tiles, sub, 128) -> per-ray planes (tiles, sub, 128):
    (t, padded_tri_idx, face, nx, ny, nz)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # Chunk the tile axis so the node tables + per-tile cone table stay
    # within the ~1 MB SMEM budget (cone: 10 rows x chunk x 4 B; node tables
    # scale with the mesh — 1M tris @ leaf 128 is ~760 KB, leaving ~4k tiles
    # per chunk).
    node_bytes = nodef.size * 4 + nodei.size * 4
    budget = 830 * 1024  # leave slack for scratch + spill (measured: ~150 KB of
    # SMEM beyond the tables at compile time)
    max_tiles = max(1024, min(8192, (budget - node_bytes) // (10 * 4)))
    total = oT.shape[1]
    if total > max_tiles:
        n_chunks = -(-total // max_tiles)
        per = -(-total // n_chunks)
        pad = n_chunks * per - total
        if pad:
            oT = jnp.concatenate(
                [oT, jnp.full((3, pad) + oT.shape[2:], 2e8, oT.dtype)], axis=1
            )  # parked rays: dead-tile cones, instant exit
            dT = jnp.concatenate(
                [dT, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], dT.dtype)[:, None, None, None], (3, pad) + dT.shape[2:])], axis=1
            )
        chunks = [
            _pallas_hit_tiled(
                nodef, nodei, trif,
                oT[:, i * per : (i + 1) * per], dT[:, i * per : (i + 1) * per],
                interpret=interpret, sub=sub, leaf=leaf, node_test=node_test,
                stream=stream, k_spec=k_spec,
            )
            for i in range(n_chunks)
        ]
        return tuple(
            jnp.concatenate([c[j] for c in chunks], axis=0)[:total] for j in range(6)
        )

    cone = tile_cones(oT, dT)
    tiles = oT.shape[1]
    plane = lambda dt: jax.ShapeDtypeStruct((tiles, sub, 128), dt)
    spec = pl.BlockSpec((1, sub, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    scratch = [
        pltpu.SMEM((1, 1), jnp.float32),  # traversal far plane
        pltpu.SMEM((_AGENDA_CAP,), jnp.int32),  # pending-leaf ring
    ]
    if stream:
        # Triangle blocks stay in HBM; pushes start one lane-padded (128, 128)
        # block copy per pending leaf into this 8-deep VMEM ring (leaf == 128
        # enforced by _PallasBVH; only the first 16 lanes carry data — HBM
        # slices must be 128-lane aligned). 8 buffers never collide: group==1
        # drains every pending leaf each body, bounding in-flight copies at 8.
        scratch += [
            pltpu.VMEM((8, PALLAS_BLOCK, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((8,)),
        ]
        trif_spec = pl.BlockSpec(memory_space=pl.ANY)
    else:
        trif_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        partial(_kernel, sub=sub, leaf=leaf, node_test=node_test, stream=stream,
                k_spec=k_spec),
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            trif_spec,
            pl.BlockSpec((3, 1, sub, 128), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 1, sub, 128), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[spec] * 6,
        out_shape=[
            plane(jnp.float32),
            plane(jnp.int32),
            plane(jnp.int32),
            plane(jnp.float32),
            plane(jnp.float32),
            plane(jnp.float32),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,  # trif copy + 6 out blocks pass 16 MB
        ),
        interpret=interpret,
    )(nodef, nodei, cone, trif, oT, dT)
    return outs


STREAM_TRI_THRESHOLD = 512 * 1024  # beyond this, triangles stay in HBM


class _PallasBVH:
    def __init__(self, flat: FlatBVH, interpret: bool = False, tile_rays: int = PALLAS_TILE_RAYS,
                 node_test: str = "box", force_stream: bool = False, k_spec: int = _K_SPEC):
        if 128 % flat.leaf_size or flat.leaf_size < 16:
            # leaf < 16 would make group = 128/leaf exceed _K_SPEC, so a body
            # could enqueue more leaves than its drain phase can retire.
            raise ValueError("pallas backend needs leaf_size in {16,32,64,128}")
        # Large meshes (ref main.py:21's apollo_17 is a big terrain scan)
        # don't fit VMEM: keep triangle blocks in HBM and DMA one (128, 16)
        # block per leaf drain. leaf == PALLAS_BLOCK makes each drain exactly
        # one aligned block, so the node table also shrinks 8x and stays
        # within the SMEM budget up to multi-million-triangle meshes.
        self.stream = force_stream or (flat.n_padded_tris > STREAM_TRI_THRESHOLD)
        if self.stream and flat.leaf_size != PALLAS_BLOCK:
            raise ValueError(
                f"streaming (>{STREAM_TRI_THRESHOLD} padded tris) requires "
                f"leaf_size={PALLAS_BLOCK}; build the BVH with "
                f"build_bvh(mesh, leaf_size={PALLAS_BLOCK})"
            )
        if tile_rays % 128:
            raise ValueError("tile_rays must be a multiple of 128")
        self.flat = flat
        self.nodef, self.nodei, self.trif = _pack_bvh(flat)
        if self.stream:
            # HBM slices must be lane-aligned (Mosaic: last dim % 128 == 0):
            # pad the 16 attribute lanes to 128. 8x HBM footprint, but only
            # large meshes stream and the DMA is still one 64 KB block/drain.
            self.trif = jnp.pad(self.trif, ((0, 0), (0, 0), (0, 128 - 16)))
        self.tri_face = jnp.asarray(flat.tri_face)
        self.tri_v0 = jnp.asarray(flat.tri_v0)
        self.tri_e1 = jnp.asarray(flat.tri_e1)
        self.tri_e2 = jnp.asarray(flat.tri_e2)
        self.interpret = interpret
        self.tile_rays = tile_rays
        self.leaf = flat.leaf_size
        self.node_test = node_test
        if not 1 <= k_spec <= _K_MAX:
            raise ValueError(f"k_spec must be in [1, {_K_MAX}]")
        self.k_spec = k_spec

    def live_trif(self, v0, e1, e2):
        """Repack the kernel triangle blocks from live (original-order)
        vertex-derived arrays. Static leaf permutation — a pure gather, so the
        forward tracks vertex motion (hit selection still culls with the
        host-built node AABBs; rebuild the BVH when vertices move materially).
        """
        flat = self.flat
        p = flat.n_padded_tris
        idx = jnp.asarray(np.maximum(flat.tri_face, 0))
        padm = jnp.asarray((flat.tri_face < 0))[:, None]
        zero3 = jnp.float32(0.0)
        lv0 = jnp.where(padm, zero3, v0[idx])
        le1 = jnp.where(padm, zero3, e1[idx])
        le2 = jnp.where(padm, zero3, e2[idx])
        n = jnp.cross(le1, le2)
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=1, keepdims=True), 1e-30)
        face = jnp.asarray(flat.tri_face, jnp.float32)
        pad = (-p) % PALLAS_BLOCK
        if pad:
            z = jnp.zeros((pad, 3), jnp.float32)
            lv0 = jnp.concatenate([lv0, z])
            le1 = jnp.concatenate([le1, z])
            le2 = jnp.concatenate([le2, z])
            n = jnp.concatenate([n, z])
            face = jnp.concatenate([face, jnp.full((pad,), -1.0, jnp.float32)])
        blocks = (p + pad) // PALLAS_BLOCK
        cols = jnp.concatenate(
            [lv0, le1, le2, n, face[:, None], jnp.zeros((p + pad, 3), jnp.float32)],
            axis=1,
        )  # (P', 16)
        out = cols.reshape(blocks, PALLAS_BLOCK, 16)
        if self.stream:
            out = jnp.pad(out, ((0, 0), (0, 0), (0, 128 - 16)))  # lane alignment
        return out


def pallas_hit_planes(pb: _PallasBVH, oT, dT, trif=None):
    """SoA entry: rays as (3, tiles, sub, 128) component planes (the tracer's
    native layout — no AoS transposes). Returns (t, idx, face, nx, ny, nz)
    planes of shape (tiles, sub, 128). `trif` overrides the baked triangle
    blocks (live vertex-derived repack for differentiable-tris mode)."""
    return _pallas_hit_tiled(
        pb.nodef, pb.nodei, pb.trif if trif is None else trif, oT, dT,
        interpret=pb.interpret, sub=oT.shape[2], leaf=pb.leaf,
        node_test=pb.node_test, stream=pb.stream, k_spec=pb.k_spec,
    )


def pallas_closest_hit(pb: _PallasBVH, o, d, trif=None):
    """AoS entry: (N, 3) rays -> (t, face, padded_tri_idx, nrm (N, 3)). Pads
    the ray batch to the tile quantum with dead rays. Face ids and normals
    come from the in-kernel fold — no N-sized gather."""
    n = o.shape[0]
    pad = (-n) % pb.tile_rays
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate(
            [d, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], d.dtype), (pad, 3))]
        )
    m = o.shape[0]
    sub = pb.tile_rays // 128
    tiles = m // pb.tile_rays
    oT = o.T.reshape(3, tiles, sub, 128)
    dT = d.T.reshape(3, tiles, sub, 128)
    t, idx, face, nx, ny, nz = pallas_hit_planes(pb, oT, dT, trif)
    nrm = jnp.stack([nx.reshape(m), ny.reshape(m), nz.reshape(m)], axis=1)[:n]
    return t.reshape(m)[:n], face.reshape(m)[:n], idx.reshape(m)[:n], nrm


def make_pallas_env_hit(flat_or_mesh, interpret: bool = False, tile_rays: int = PALLAS_TILE_RAYS,
                        node_test: str = "box", differentiable_tris: bool = False,
                        force_stream: bool = False, k_spec: int = _K_SPEC):
    """env_hit(o, d, v0, e1, e2, normals) -> (t, face, nrm) with Pallas
    forward + custom VJP (straight-through selection; closed-form t backward
    on the selected face, cotangents to the ray arrays).

    The normal comes from the in-kernel fold, NOT from `normals` (which is
    ignored) — no N-sized gather on the bounce loop's critical path.

    differentiable_tris=True additionally emits triangle cotangents to the
    (v0, e1, e2) arguments in original face order (the kernel reports original
    face ids): the backward re-evaluates, for each selected face, both the
    closed-form t AND the unit geometric normal nrm = unit(cross(e1, e2)) —
    the normal drives the specular reflection, so vertex gradients through the
    bounce direction flow too — and scatter-adds their VJPs at the face index.
    Hit selection (BVH walk) still uses the host-built triangle copy: if
    vertices move materially, rebuild the BVH (same caveat as
    rfx.ops.bvh_traverse, which this matches; BASELINE.md "vertex positions"
    gradient target, ref tracer.py:22-24 geometry-as-data).

    Accepts a FlatBVH built with leaf_size=PALLAS_LEAF, or a TriangleMesh
    (builds one).
    """
    if isinstance(flat_or_mesh, FlatBVH):
        flat = flat_or_mesh
    else:
        # Big meshes build straight into the streaming layout (fat leaves =
        # one HBM block per drain); small ones use the VMEM-resident layout.
        # The 0.75 factor leaves headroom for leaf padding; the exact padded
        # count is re-checked after the build for the boundary sliver.
        big = flat_or_mesh.num_faces > 0.75 * STREAM_TRI_THRESHOLD
        flat = build_bvh(flat_or_mesh, leaf_size=PALLAS_BLOCK if big else PALLAS_LEAF)
        if not big and flat.n_padded_tris > STREAM_TRI_THRESHOLD:
            flat = build_bvh(flat_or_mesh, leaf_size=PALLAS_BLOCK)
    pb = _PallasBVH(flat, interpret=interpret, tile_rays=tile_rays, node_test=node_test,
                    force_stream=force_stream, k_spec=k_spec)

    if not differentiable_tris:
        @jax.custom_vjp
        def env_hit_op(o, d):
            t, face, _, nrm = pallas_closest_hit(pb, o, d)
            return t, face, nrm

        def fwd(o, d):
            t, face, idx, nrm = pallas_closest_hit(pb, o, d)
            return (t, face, nrm), (o, d, idx, t)

        def bwd(res, cotangents):
            o, d, idx, t = res
            g_t, _, _ = cotangents  # face is int; normal is piecewise const in (o, d)
            sel = jnp.maximum(idx, 0)
            hit = (idx >= 0) & is_hit(t)
            g = jnp.where(hit, g_t, 0.0)
            # Sanitize non-hit lanes BEFORE the inner vjp: parked rays sit at
            # |o| ~ 1e9, where the closed-form-t derivative's intermediate
            # products overflow f32 to inf, and 0-cotangent x inf = NaN
            # poisons every upstream gradient (round-5 bug: flagship n1 grad
            # NaN through the bounce-direction chain; plain-FD value 611.16).
            o_s = jnp.where(hit[:, None], o, 0.0)
            d_s = jnp.where(hit[:, None], d, 1.0)
            # Barrier: stops XLA from fusing the zeroing selects back into
            # the surrounding trace graph, where the fused form re-associates
            # into 0 x inf (the same compiled-only NaN class as the MISS
            # sentinel note at the top of rfx.ops.intersect; clean under
            # jax_debug_nans' unfused execution, NaN when fused).
            o_s, d_s, g = jax.lax.optimization_barrier((o_s, d_s, g))

            def t_of(o_, d_):
                return closed_form_t(o_, d_, pb.tri_v0[sel], pb.tri_e1[sel], pb.tri_e2[sel])

            _, vjp = jax.vjp(t_of, o_s, d_s)
            go, gd = vjp(g)
            return go, gd

        env_hit_op.defvjp(fwd, bwd)

        def env_hit(o, d, v0, e1, e2, normals):
            return env_hit_op(o, d)

        return env_hit

    @jax.custom_vjp
    def env_hit_diff(o, d, v0, e1, e2):
        t, face, _, nrm = pallas_closest_hit(pb, o, d, pb.live_trif(v0, e1, e2))
        return t, face, nrm

    def fwd_diff(o, d, v0, e1, e2):
        t, face, idx, nrm = pallas_closest_hit(pb, o, d, pb.live_trif(v0, e1, e2))
        # Residuals keep the ORIGINAL-order triangle args (not the BVH copy)
        # so cotangents land on the caller's differentiable arrays.
        return (t, face, nrm), (o, d, v0, e1, e2, face, t)

    def bwd_diff(res, cotangents):
        o, d, v0, e1, e2, face, t = res
        g_t, _, g_nrm = cotangents
        sel = jnp.maximum(face, 0)  # face = original mesh face id
        hit = (face >= 0) & is_hit(t)
        g = jnp.where(hit, g_t, 0.0)
        gn = jnp.where(hit[:, None], g_nrm, 0.0)
        # See bwd above: non-hit (parked, |o|~1e9) lanes overflow the t-VJP's
        # intermediates to inf; 0 x inf = NaN. Evaluate at safe inputs, with
        # a barrier so XLA cannot fuse the zeroing selects away (compiled-only
        # NaN otherwise; clean under jax_debug_nans' unfused execution).
        o_s = jnp.where(hit[:, None], o, 0.0)
        d_s = jnp.where(hit[:, None], d, 1.0)
        o_s, d_s, g, gn = jax.lax.optimization_barrier((o_s, d_s, g, gn))

        # Barrier on the gathered triangle rows too: a traced-table gather
        # inside the scan's backward is the known XLA-TPU miscompile class
        # (rfx.ops.intersect.hit_normal_from_edges documents the forward-side
        # instance) — round 5 found the backward-side one: non-captured rays
        # received huge garbage material gradients through this path.
        fv0, fe1, fe2 = jax.lax.optimization_barrier((v0[sel], e1[sel], e2[sel]))

        def t_of(o_, d_, a, b, c):
            return closed_form_t(o_, d_, a, b, c)

        _, vjp_t = jax.vjp(t_of, o_s, d_s, fv0, fe1, fe2)
        go, gd, gv0, ge1, ge2 = vjp_t(g)

        def nrm_of(b, c):
            n = jnp.cross(b, c)
            return n / jnp.maximum(jnp.linalg.norm(n, axis=1, keepdims=True), 1e-30)

        _, vjp_n = jax.vjp(nrm_of, fe1, fe2)
        ge1n, ge2n = vjp_n(gn)

        mask = jnp.where(hit[:, None], 1.0, 0.0)
        gv0_full = jnp.zeros_like(v0).at[sel].add(gv0 * mask)
        ge1_full = jnp.zeros_like(e1).at[sel].add((ge1 + ge1n) * mask)
        ge2_full = jnp.zeros_like(e2).at[sel].add((ge2 + ge2n) * mask)
        return go, gd, gv0_full, ge1_full, ge2_full

    env_hit_diff.defvjp(fwd_diff, bwd_diff)

    def env_hit(o, d, v0, e1, e2, normals):
        return env_hit_diff(o, d, v0, e1, e2)

    return env_hit
