"""Fused multi-bounce trace as ONE Pallas TPU kernel (the round-3 fast path).

Motivation (measured, scripts/profile_bounces.py + scripts/exp_fixed_cost.py,
committed in PROFILE_r03.json): with the per-query kernel the bounce loop pays
~7-9 ms of XLA glue per bounce — AoS->SoA transposes of the (N, 3) carry,
tile_cones, output reshape/stack — plus the full 13-plane carry round-trip
through HBM every bounce. At 4 bounces that glue is ~30 ms of the 80 ms
flagship trace, more than any single walk. Bounce 3 (0.3% rays alive) still
cost ~10 ms: almost pure overhead.

This kernel runs the ENTIRE bounce loop per ray tile on-chip: spawn state,
per-bounce receiver-sphere test, BVH walk (same tile-uniform skip-pointer
traversal + batched Moller-Trumbore drains as rfx.ops.pallas_trace, which see
for the design rationale), specular reflection, Fresnel accumulation, capture
folding — the carry never leaves VMEM. HBM traffic collapses to: direction
planes in, four result planes out. The receiver test is the analytic sphere
(the facade's default; ref tracer.py:26-30 tessellates an icosphere — that
parity mode stays on the scan path).

Semantics match rfx.tracer.trace_to_rx exactly (same capture rule
`t_env > t_rx` as ref kernel.py:85, same persistent alive mask, same parking
of dead rays): parity-tested in tests/test_fused.py and re-verified compiled
on every TPU bench run. The Fresnel factor is computed algebraically from
cos(bend) = 1 - 2 (d.n)^2 — sin(theta) = sqrt(1 - (d.n)^2), cos(theta) =
|d.n| — which is the same s-polarised power coefficient as
rfx.physics.fresnel_bounce_amplitude (ref tracer.py:34-61) without the
arccos/arcsin round-trip (no transcendentals on the hot path; equal to the
scan path within f32 tolerance, modulo its clip epsilons).

Forward-only: gradients keep using the scan path with per-query custom-VJP
intersectors (rfx.tracer.trace_to_rx). The facade selects this kernel for
non-differentiated forward traces.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rfx.bvh import FlatBVH, build_bvh
from rfx.ops.intersect import MISS_THRESHOLD, T_MIN_EPS
from rfx.ops.pallas_trace import (
    PALLAS_BLOCK,
    PALLAS_LEAF,
    PALLAS_TILE_RAYS,
    STREAM_TRI_THRESHOLD,
    _AGENDA_CAP,
    _K_SPEC,
    _MISS,
    _pack_bvh,
)

__all__ = ["make_fused_tracer", "make_diff_fused_tracer", "fused_trace_planes",
           "replay_from_faces"]

_DEAD = 1e9  # parked-ray origin (matches rfx.tracer's park sentinel)


def _fused_kernel(scal_ref, nodef_ref, nodei_ref, d_in_ref, trif_ref,
                  capt_ref, capa_ref, capd_ref, nb_ref, *rest,
                  sub, leaf, max_bounces, stream=False, k_spec=_K_SPEC,
                  pack=False, record_faces=False, cone_filter=False,
                  count_stats=False, stream_depth=1):
    """One ray tile, all bounces.

    scal:  SMEM (16,) f32 — [0:3] tx, [3:6] rx, [6] rx_radius^2, [7] n1,
           [8] n2, rest zero.
    nodef: SMEM (6, n_nodes) f32 — aabb center rows 0-2, half-extent rows 3-5
    nodei: SMEM (2, n_nodes) i32 — padded-tri start (-1 internal), skip
    d_in:  VMEM (3, 1, SUB, 128) f32 spawn direction planes for this tile
    out:   capt (1, SUB, 128) i32 (0/1); capa, capd f32; nb i32
    trif:  VMEM (n_blocks, 128, 16) f32 triangle blocks (HBM when stream)
    scratch: per-tile ray state planes (VMEM (SUB, 128)): o/d/inv components,
           walk accumulators t/nx/ny/nz, amp, dist, alive (f32 0/1)
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import jax.lax as lax

    # Optional face recording (the differentiable-replay backward's record;
    # see fused docstring): one extra output ref + one extra walk accumulator.
    rest = list(rest)
    faces_ref = rest.pop(0) if record_faces else None
    stats_ref = rest.pop(0) if count_stats else None
    o_s, d_s, i_s, t_s, nx_s, ny_s, nz_s, amp_s, dist_s, alive_s = rest[:10]
    rest = rest[10:]
    fc_s = rest.pop(0) if record_faces else None
    cone_s = rest.pop(0) if cone_filter else None
    stat_s = rest.pop(0) if count_stats else None
    alive_sm, agenda_ref, *tri_scratch = rest

    n_nodes = nodef_ref.shape[1]
    t_min = jnp.float32(T_MIN_EPS)
    big = jnp.float32(1e30)
    miss_th = jnp.float32(MISS_THRESHOLD)
    # Streaming drains one leaf per visit (the DMA unit is a 128-row block;
    # leaf < 128 slices the landed block — round-5: finer streamed leaves cut
    # the 128-candidate overdraw that dominates large-mesh traces).
    group = 1 if stream else PALLAS_BLOCK // leaf
    cap_mask = jnp.int32(_AGENDA_CAP - 1)
    loc_col = jax.lax.broadcasted_iota(jnp.int32, (PALLAS_BLOCK, 1), 0) % leaf
    slot_col = jax.lax.broadcasted_iota(jnp.int32, (PALLAS_BLOCK, 1), 0) // leaf

    tx0, tx1, tx2 = scal_ref[0], scal_ref[1], scal_ref[2]
    rx0, rx1, rx2 = scal_ref[3], scal_ref[4], scal_ref[5]
    r2 = scal_ref[6]
    n1 = scal_ref[7]
    n2 = scal_ref[8]

    # --- spawn state -------------------------------------------------------
    o_s[0] = jnp.full((sub, 128), tx0, jnp.float32)
    o_s[1] = jnp.full((sub, 128), tx1, jnp.float32)
    o_s[2] = jnp.full((sub, 128), tx2, jnp.float32)
    d_s[0] = d_in_ref[0, 0]
    d_s[1] = d_in_ref[1, 0]
    d_s[2] = d_in_ref[2, 0]
    amp_s[:] = jnp.ones((sub, 128), jnp.float32)
    dist_s[:] = jnp.zeros((sub, 128), jnp.float32)
    alive_s[:] = jnp.ones((sub, 128), jnp.float32)
    capt_ref[0] = jnp.zeros((sub, 128), jnp.int32)
    capa_ref[0] = jnp.zeros((sub, 128), jnp.float32)
    capd_ref[0] = jnp.zeros((sub, 128), jnp.float32)
    nb_ref[0] = jnp.zeros((sub, 128), jnp.int32)
    if record_faces:
        faces_ref[0] = jnp.full((max_bounces, sub, 128), -1, jnp.int32)
    if count_stats:
        for j in range(2 * max_bounces):
            stat_s[j] = jnp.int32(0)

    def group_visit(bases, head_for_slot):
        """Batched MT over `len(bases)` leaves, folding t and the winning
        triangle's unit normal into the walk accumulator refs. Same layout
        and tie-break discipline as pallas_trace._kernel.group_visit.

        `bases` may be any length 1..group: the walk drains full groups
        (PALLAS_BLOCK candidates), while the flush drains its remainder with
        right-sized blocks (len*leaf candidate rows) — round-5 fix: the old
        duplicate-padded full-block flush cost a full 128-candidate MT pass
        per tile-bounce even when only 1-2 leaves were pending, ~1.3 us of
        pure padding waste per tile at bounce 0."""
        k = len(bases)
        nrows = k * leaf
        t_best = t_s[:]
        nx_best, ny_best, nz_best = nx_s[:], ny_s[:], nz_s[:]
        fc_best = fc_s[:] if record_faces else None
        if stream:
            tri_buf, dma_sem = tri_scratch
            slot = head_for_slot & jnp.int32(15)
            pltpu.make_async_copy(
                trif_ref.at[bases[0] // PALLAS_BLOCK], tri_buf.at[slot],
                dma_sem.at[slot],
            ).wait()
            if leaf == PALLAS_BLOCK:
                tri = tri_buf[slot]
            else:
                off = pl.multiple_of(bases[0] % PALLAS_BLOCK, leaf)
                tri = tri_buf[slot, pl.ds(off, leaf), :]
        else:
            tris = []
            for b in bases:
                blk = b // PALLAS_BLOCK
                off = pl.multiple_of(b % PALLAS_BLOCK, leaf)
                tris.append(trif_ref[blk, pl.ds(off, leaf), :])
            tri = tris[0] if k == 1 else jnp.concatenate(tris, axis=0)
        if nrows == PALLAS_BLOCK:
            slot_c, loc_c = slot_col, loc_col
        else:
            slot_c = jax.lax.broadcasted_iota(jnp.int32, (nrows, 1), 0) // leaf
            loc_c = jax.lax.broadcasted_iota(jnp.int32, (nrows, 1), 0) % leaf
        gbase = jnp.zeros((nrows, 1), jnp.int32)
        for g, b in enumerate(bases):
            gbase = jnp.where(slot_c == g, b, gbase)
        gidx_col = gbase + loc_c
        big_i = jnp.int32(2**30)

        v0x, v0y, v0z = tri[:, 0:1], tri[:, 1:2], tri[:, 2:3]
        e1x, e1y, e1z = tri[:, 3:4], tri[:, 4:5], tri[:, 5:6]
        e2x, e2y, e2z = tri[:, 6:7], tri[:, 7:8], tri[:, 8:9]
        cnx, cny, cnz = tri[:, 9:10], tri[:, 10:11], tri[:, 11:12]
        cfc = tri[:, 12:13] if record_faces else None
        ox8, oy8, oz8 = o_s[0], o_s[1], o_s[2]
        dx8, dy8, dz8 = d_s[0], d_s[1], d_s[2]

        def row_work(r):
            # Per-row fold straight into the accumulator refs (no plane-wide
            # concat): lets the streaming path predicate whole ray rows.
            oxr, oyr, ozr = ox8[r : r + 1, :], oy8[r : r + 1, :], oz8[r : r + 1, :]
            dxr, dyr, dzr = dx8[r : r + 1, :], dy8[r : r + 1, :], dz8[r : r + 1, :]
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
            qx = tvy * e1z - tvz * e1y
            qy = tvz * e1x - tvx * e1z
            qz = tvx * e1y - tvy * e1x
            v = (dxr * qx + dyr * qy + dzr * qz) * inv_det
            t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            ok = valid & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > t_min)
            t = jnp.where(ok, t, _MISS)
            tl = jnp.min(t, axis=0, keepdims=True)
            ii = jnp.min(jnp.where(t <= tl, gidx_col, big_i), axis=0, keepdims=True)
            sel = (t <= tl) & (gidx_col == ii)
            nxl = jnp.min(jnp.where(sel, cnx, big), axis=0, keepdims=True)
            nyl = jnp.min(jnp.where(sel, cny, big), axis=0, keepdims=True)
            nzl = jnp.min(jnp.where(sel, cnz, big), axis=0, keepdims=True)
            tb = t_best[r : r + 1, :]
            upd = tl < tb
            t_s[pl.ds(r, 1)] = jnp.where(upd, tl, tb)
            nx_s[pl.ds(r, 1)] = jnp.where(upd, nxl, nx_best[r : r + 1, :])
            ny_s[pl.ds(r, 1)] = jnp.where(upd, nyl, ny_best[r : r + 1, :])
            nz_s[pl.ds(r, 1)] = jnp.where(upd, nzl, nz_best[r : r + 1, :])
            if record_faces:
                fcl = jnp.min(jnp.where(sel, cfc, big), axis=0, keepdims=True)
                fc_s[pl.ds(r, 1)] = jnp.where(upd, fcl, fc_best[r : r + 1, :])

        # (No traversal far-plane store here: unlike pallas_trace, nothing in
        # this kernel reads it — the box test caps per-ray at t_s — and the
        # max-reduce per drain sat on the serial path. Removed in round 5.)
        # NOTE (round-5 negative result, exp_r5_stream.py): predicating each
        # row on a per-row any-alive SMEM flag (pl.when around row_work) to
        # skip dead rows in streaming drains LOSES ~20% end-to-end (32k-tri
        # leaf128: 101.8 -> 123.6 ms; 1M-tri: 344 -> 429 ms) — branch issue
        # overhead and lost cross-row pipelining exceed the skipped VPU work,
        # the same failure mode as the r4 scalar cone pre-filter.
        for r in range(sub):
            row_work(r)

    def box_node_mask(nk):
        """Per-ray slab test -> (sub, 128) bool hit mask (no reduce; the
        caller packs masks from several nodes into one scalar reduce)."""
        t_best = t_s[:]
        cx = nodef_ref[0, nk]
        cy = nodef_ref[1, nk]
        cz = nodef_ref[2, nk]
        hx = nodef_ref[3, nk]
        hy = nodef_ref[4, nk]
        hz = nodef_ref[5, nk]
        ox8, oy8, oz8 = o_s[0], o_s[1], o_s[2]
        ix8, iy8, iz8 = i_s[0], i_s[1], i_s[2]
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
        box_hit = (t_near <= jnp.minimum(t_far, t_best)) & (t_far >= t_min)
        return box_hit

    def compute_cone():
        """Per-bounce bounding cone of the ALIVE rays, computed in-kernel
        (9 masked reduces + vector math, amortized over the walk's node
        tests). Stored in SMEM cone_s: [0:3] apex, [3:6] axis, [6] r0,
        [7] growth rate 2*sin(theta_max/2) (strictly conservative per-axis
        deviation bound — note sin(theta_max), which pallas_trace's cone
        uses, is NOT an upper bound of |d - axis| for wide angles),
        [8] wide flag (1.0 = skip cone tests)."""
        a = alive_s[:]
        dx, dy, dz = d_s[0], d_s[1], d_s[2]
        cnt = jnp.maximum(jnp.sum(a), 1.0)
        sx = jnp.sum(a * dx)
        sy = jnp.sum(a * dy)
        sz = jnp.sum(a * dz)
        nrm = jnp.sqrt(sx * sx + sy * sy + sz * sz)
        ok = nrm > 1e-6
        inv = 1.0 / jnp.where(ok, nrm, 1.0)
        ax, ay, az = sx * inv, sy * inv, sz * inv
        cosm = jnp.min(jnp.where(a > 0.5, dx * ax + dy * ay + dz * az, 1.0))
        apx = jnp.sum(a * o_s[0]) / cnt
        apy = jnp.sum(a * o_s[1]) / cnt
        apz = jnp.sum(a * o_s[2]) / cnt
        dev = jnp.maximum(
            jnp.abs(o_s[0] - apx),
            jnp.maximum(jnp.abs(o_s[1] - apy), jnp.abs(o_s[2] - apz)),
        )
        r0 = jnp.max(jnp.where(a > 0.5, dev, 0.0))
        grow = jnp.sqrt(jnp.maximum(2.0 * (1.0 - cosm), 0.0))
        wide = (~ok) | (cosm < 0.5)
        cone_s[0] = apx
        cone_s[1] = apy
        cone_s[2] = apz
        cone_s[3] = ax
        cone_s[4] = ay
        cone_s[5] = az
        cone_s[6] = r0
        cone_s[7] = grow
        cone_s[8] = jnp.where(wide, 1.0, 0.0)

    def cone_node_hit(nk):
        """Scalar conservative cone-vs-node-AABB test (True = maybe hit, and
        always True for wide cones). Expands each AABB half-extent by
        r0 + grow * t and intersects the per-axis t-intervals of the axis
        ray (see rfx.ops.pallas_trace.cone_node_hit for the derivation).

        Scene-scale assumption (round-4 advisor): the initial t_hi of 1e6
        bounds the cone's reach, so a node only reachable beyond t=1e6 scene
        units could be culled even though a ray might legally hit it (ray
        queries themselves use MISS_THRESHOLD ~1e30). Scenes must therefore
        fit within ~1e6 units of the TX for cone_filter=True (every bundled
        scene is <100 units; the filter is also default-off — it measured
        3.3x slower, CONE_r04.json)."""
        wide = cone_s[8] > 0.5
        c_sin = cone_s[7]
        c_r0 = cone_s[6]
        t_lo = jnp.float32(0.0)
        t_hi = jnp.float32(1.0e6)
        for ci, ai, hrow in (
            (nodef_ref[0, nk] - cone_s[0], cone_s[3], 3),
            (nodef_ref[1, nk] - cone_s[1], cone_s[4], 4),
            (nodef_ref[2, nk] - cone_s[2], cone_s[5], 5),
        ):
            h = nodef_ref[hrow, nk] + c_r0
            dp = ai + c_sin
            dm = ai - c_sin
            lo1 = (ci - h) / jnp.where(dp > 1e-12, dp, 1.0)
            inf1 = (dp <= 1e-12) & (ci - h > 0.0)
            hi1 = (ci + h) / jnp.where(dm > 1e-12, dm, 1.0)
            unb1 = dm <= 1e-12
            t_lo = jnp.maximum(t_lo, jnp.where(dp > 1e-12, jnp.maximum(lo1, 0.0), 0.0))
            t_hi = jnp.where(inf1, jnp.float32(-1.0), jnp.where(unb1, t_hi, jnp.minimum(t_hi, hi1)))
            dp2 = -ai + c_sin
            dm2 = -ai - c_sin
            lo2 = (-ci - h) / jnp.where(dp2 > 1e-12, dp2, 1.0)
            inf2 = (dp2 <= 1e-12) & (-ci - h > 0.0)
            hi2 = (-ci + h) / jnp.where(dm2 > 1e-12, dm2, 1.0)
            unb2 = dm2 <= 1e-12
            t_lo = jnp.maximum(t_lo, jnp.where(dp2 > 1e-12, jnp.maximum(lo2, 0.0), 0.0))
            t_hi = jnp.where(inf2, jnp.float32(-1.0), jnp.where(unb2, t_hi, jnp.minimum(t_hi, hi2)))
        return wide | (t_lo <= t_hi)

    def packed_hits(node):
        """Test k_spec speculative nodes with k_spec/2 scalar reduces instead
        of k_spec: pack two nodes' 0/1 masks into disjoint f32 count fields
        (node A at 1, node B at 2048) and lane-sum once. Per-field counts are
        <= sub*128 = 1024 < 2048, so the fields stay exact in the f32
        mantissa (max total 1024 + 1024*2048 = 2^21 + 2^10 < 2^24) and unpack
        exactly with one floor-divide. f32 sum-reduce is used (not i32/bit
        ops): it is the one cross-lane reduction Mosaic demonstrably handles
        well in this kernel.

        Measured on hardware (scripts/exp_r3_staged.py, TPU v5e, flagship
        workload): pack=True LOSES — 83.0 vs 90.2 Mrays/s unpacked. The
        extra float mul/floor/compare per pair costs more than the saved
        `any` reduce, i.e. the walk is less reduce-latency-bound than the
        interpret-mode model predicted. Kept (default off) because the
        packing trick is load-bearing documentation for future reduce-bound
        kernels and is parity-tested both ways in tests/test_fused.py."""
        lanes = sub * 128
        baseval = float(2 ** (lanes.bit_length()))  # smallest pow2 > lanes
        if not pack or lanes * baseval > 2 ** 24:  # exactness bound
            return [jnp.any(box_node_mask(node + k)) for k in range(k_spec)]
        hits = []
        base = jnp.float32(baseval)
        for k0 in range(0, k_spec, 2):
            m0 = box_node_mask(node + k0)
            if k0 + 1 < k_spec:
                m1 = box_node_mask(node + k0 + 1)
                packed = m0.astype(jnp.float32) + m1.astype(jnp.float32) * base
                tot = jnp.sum(packed)
                f1 = jnp.floor(tot / base)
                hits.append(tot - f1 * base > 0.0)
                hits.append(f1 > 0.0)
            else:
                hits.append(jnp.sum(m0.astype(jnp.float32)) > 0.0)
        return hits

    def walk_body(state):
        node, head, tail = state
        if cone_filter:
            # Scalar cone pre-filter: the vector slab test + its cross-lane
            # reduce (the walk's dominant cost) only runs on nodes the tile's
            # bounding cone can reach. Compute all k cone bits first so the
            # scalar tests pipeline ahead of the branches.
            cone_bits = [cone_node_hit(node + k) for k in range(k_spec)]
            hits = [
                jax.lax.cond(
                    cone_bits[k],
                    lambda nk=node + k: jnp.any(box_node_mask(nk)),
                    lambda: jnp.bool_(False),
                )
                for k in range(k_spec)
            ]
        else:
            hits = packed_hits(node)
        metas = [(nodei_ref[0, node + k], nodei_ref[1, node + k]) for k in range(k_spec)]
        cur = node
        for k in range(k_spec):
            base_k, skip_k = metas[k]
            valid = cur == node + k
            hit = valid & hits[k]
            is_leaf = base_k >= 0
            take = hit & is_leaf

            @pl.when(take)
            def _(b=base_k, t=tail):
                agenda_ref[t & cap_mask] = b
                if stream:
                    tri_buf, dma_sem = tri_scratch
                    slot = t & jnp.int32(15)
                    pltpu.make_async_copy(
                        trif_ref.at[b // PALLAS_BLOCK], tri_buf.at[slot],
                        dma_sem.at[slot],
                    ).start()

            tail = tail + take.astype(jnp.int32)
            nxt = jnp.where(hit & ~is_leaf, cur + 1, skip_k)
            cur = jnp.where(valid, nxt, cur)
        # Streaming with stream_depth > 1 defers each drain until at least
        # stream_depth leaves are pending, giving every block's DMA that many
        # extra windows to complete before its wait (depth 1 = drain
        # immediately, the pre-round-5 behavior).
        min_pending = stream_depth if stream else group
        for _ in range(max(1, k_spec // group)):
            drained = tail - head >= min_pending

            @pl.when(drained)
            def _(h=head):
                group_visit([agenda_ref[(h + g) & cap_mask] for g in range(group)], h)

            head = head + jnp.where(drained, group, 0)
        return cur, head, tail

    def flush_full(state):
        head, tail = state
        group_visit([agenda_ref[(head + g) & cap_mask] for g in range(group)], head)
        return head + group, tail

    def flush_pending(head, tail):
        """Drain everything left on the agenda: full groups first, then the
        remainder (< group leaves) via binary-sized partial drains — no
        duplicate padding (see group_visit)."""
        head, tail = lax.while_loop(
            lambda s: s[1] - s[0] >= group, flush_full, (head, tail)
        )
        kk = group // 2
        while kk >= 1:
            take = tail - head >= kk

            @pl.when(take)
            def _(h=head, k=kk):
                group_visit([agenda_ref[(h + g) & cap_mask] for g in range(k)], h)

            head = head + jnp.where(take, kk, 0)
            kk //= 2

    eps = jnp.float32(1e-30)

    def inv_plane(v):
        ok = jnp.abs(v) > eps
        return jnp.where(ok, 1.0 / jnp.where(ok, v, 1.0), big)

    def bounce_body(b):
        # Reset walk accumulators.
        t_s[:] = jnp.full((sub, 128), _MISS, jnp.float32)
        nx_s[:] = jnp.zeros((sub, 128), jnp.float32)
        ny_s[:] = jnp.zeros((sub, 128), jnp.float32)
        nz_s[:] = jnp.zeros((sub, 128), jnp.float32)
        if record_faces:
            fc_s[:] = jnp.full((sub, 128), -1.0, jnp.float32)
        i_s[0] = inv_plane(d_s[0])
        i_s[1] = inv_plane(d_s[1])
        i_s[2] = inv_plane(d_s[2])
        if cone_filter:
            compute_cone()

        # The bounce while_loop's condition guarantees at least one alive ray,
        # so the walk always engages here.
        if count_stats:
            # Counter-instrumented walk (round-5: measure the scalar-walk
            # roofline instead of modeling it): windows = walk_body
            # iterations, leaf visits = final agenda tail.
            _, head, tail, nwin = lax.while_loop(
                lambda s: s[0] < n_nodes,
                lambda s: (*walk_body(s[:3]), s[3] + 1),
                (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0)),
            )
            stat_s[2 * b] = nwin
            stat_s[2 * b + 1] = tail
        else:
            _, head, tail = lax.while_loop(
                lambda s: s[0] < n_nodes, walk_body,
                (jnp.int32(0), jnp.int32(0), jnp.int32(0))
            )
        flush_pending(head, tail)

        # --- physics + capture fold (vector, per plane) --------------------
        ox, oy, oz = o_s[0], o_s[1], o_s[2]
        dx, dy, dz = d_s[0], d_s[1], d_s[2]
        alive = alive_s[:] > 0.5
        t_env = t_s[:]
        nx, ny, nz = nx_s[:], ny_s[:], nz_s[:]

        # Analytic receiver sphere (matches rfx.ops.intersect.ray_sphere_hit).
        ocx, ocy, ocz = ox - rx0, oy - rx1, oz - rx2
        bq = ocx * dx + ocy * dy + ocz * dz
        cq = ocx * ocx + ocy * ocy + ocz * ocz - r2
        disc = bq * bq - cq
        sph = disc > 0.0
        s = jnp.sqrt(jnp.where(sph, disc, 1.0))
        t0 = -bq - s
        t1 = -bq + s
        t_rx = jnp.where(t0 > t_min, t0, jnp.where(t1 > t_min, t1, _MISS))
        t_rx = jnp.where(sph, t_rx, _MISS)

        env_hit = t_env < miss_th
        rx_win = alive & (t_rx < miss_th) & (t_env > t_rx)
        env_b = alive & (~rx_win) & env_hit

        amp = amp_s[:]
        dist = dist_s[:]
        capt_ref[0] = capt_ref[0] | rx_win.astype(jnp.int32)
        capa_ref[0] = jnp.where(rx_win, amp, capa_ref[0])
        capd_ref[0] = jnp.where(rx_win, dist + t_rx, capd_ref[0])
        nb_ref[0] = nb_ref[0] + env_b.astype(jnp.int32)
        if record_faces:
            fplane = jnp.where(env_b, fc_s[:].astype(jnp.int32), -1)
            faces_ref[0, pl.ds(b, 1)] = fplane[None]

        # Specular reflect + algebraic s-pol Fresnel (see module docstring):
        # w = d.n; sin(theta) = sqrt(1 - w^2), cos(theta) = |w|.
        w = dx * nx + dy * ny + dz * nz
        rdx = dx - 2.0 * w * nx
        rdy = dy - 2.0 * w * ny
        rdz = dz - 2.0 * w * nz
        aw = jnp.abs(w)
        sin_t = jnp.sqrt(jnp.maximum(1.0 - aw * aw, 0.0))
        sr = (n2 * sin_t) / n1
        cos_i = jnp.sqrt(jnp.maximum(1.0 - sr * sr, 0.0))
        num = n2 * cos_i - n1 * aw
        den = n2 * cos_i + n1 * aw
        den_ok = den != 0.0
        ratio = num / jnp.where(den_ok, den, 1.0)
        fres = jnp.where((sr <= 1.0) & den_ok, jnp.minimum(ratio * ratio, 1.0), 0.0)

        t_adv = jnp.where(env_b, t_env, 0.0)
        o_s[0] = jnp.where(env_b, ox + dx * t_adv, jnp.float32(_DEAD))
        o_s[1] = jnp.where(env_b, oy + dy * t_adv, jnp.float32(_DEAD))
        o_s[2] = jnp.where(env_b, oz + dz * t_adv, jnp.float32(_DEAD))
        d_s[0] = jnp.where(env_b, rdx, dx)
        d_s[1] = jnp.where(env_b, rdy, dy)
        d_s[2] = jnp.where(env_b, rdz, dz)
        amp_s[:] = jnp.where(env_b, amp * fres, amp)
        dist_s[:] = dist + t_adv
        alive_s[:] = env_b.astype(jnp.float32)
        # Any-alive as an SMEM scalar computed HERE (amid the fold's vector
        # work, where the reduce overlaps) instead of a vector max-reduce in
        # the while cond, which serialized ~0.3 us per tile-bounce between
        # bounces (round-5 counter-driven decomposition).
        alive_sm[0, 0] = jnp.max(alive_s[:])
        return b + 1

    # Whole-tile early exit: a dead ray never revives, so once every ray in
    # the tile is dead the remaining bounces cost nothing (measured: with a
    # fori_loop, bounces 2-3 at 2.7%/0.3% alive still paid ~13/7 ms of
    # physics-fold + loop overhead across the mostly-dead grid).
    alive_sm[0, 0] = jnp.float32(1.0)
    lax.while_loop(
        lambda b: (b < max_bounces) & (alive_sm[0, 0] > 0.5),
        bounce_body,
        jnp.int32(0),
    )
    if count_stats:
        # Per-tile counters out: row 0, lane 2b = windows, lane 2b+1 = leaf
        # visits of bounce b (zeros for bounces the early exit skipped).
        row = jax.lax.broadcasted_iota(jnp.int32, (sub, 128), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (sub, 128), 1)
        plane = jnp.zeros((sub, 128), jnp.int32)
        for j in range(2 * max_bounces):
            plane = jnp.where((row == 0) & (col == j), stat_s[j], plane)
        stats_ref[0] = plane


@partial(jax.jit, static_argnames=("sub", "leaf", "max_bounces", "stream", "k_spec",
                                   "interpret", "pack", "record_faces", "cone_filter",
                                   "count_stats", "stream_depth"))
def fused_trace_planes(nodef, nodei, trif, dT, scal, *, sub, leaf, max_bounces,
                       stream=False, k_spec=_K_SPEC, interpret=False, pack=False,
                       record_faces=False, cone_filter=False, count_stats=False,
                       stream_depth=1):
    """Direction planes (3, tiles, sub, 128) + scalar params (16,) f32 ->
    (captured i32, cap_amp f32, cap_dist f32, num_bounces i32) planes of
    shape (tiles, sub, 128). With record_faces also returns a
    (tiles, max_bounces, sub, 128) i32 plane of per-bounce hit face ids
    (-1 where the ray did not env-bounce) — the differentiable replay's
    record (see make_diff_fused_tracer)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tiles = dT.shape[1]
    plane = lambda dt: jax.ShapeDtypeStruct((tiles, sub, 128), dt)
    out_spec = pl.BlockSpec((1, sub, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out_specs = [out_spec] * 4
    out_shape = [
        plane(jnp.int32),
        plane(jnp.float32),
        plane(jnp.float32),
        plane(jnp.int32),
    ]
    sp = lambda: pltpu.VMEM((sub, 128), jnp.float32)
    scratch = [
        pltpu.VMEM((3, sub, 128), jnp.float32),  # o
        pltpu.VMEM((3, sub, 128), jnp.float32),  # d
        pltpu.VMEM((3, sub, 128), jnp.float32),  # inv d
        sp(), sp(), sp(), sp(),  # t, nx, ny, nz
        sp(), sp(), sp(),  # amp, dist, alive
    ]
    if record_faces:
        out_specs = out_specs + [
            pl.BlockSpec((1, max_bounces, sub, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        ]
        out_shape = out_shape + [
            jax.ShapeDtypeStruct((tiles, max_bounces, sub, 128), jnp.int32)
        ]
        scratch = scratch + [sp()]  # fc accumulator
    if count_stats:
        out_specs = out_specs + [out_spec]
        out_shape = out_shape + [plane(jnp.int32)]
    if cone_filter:
        scratch = scratch + [pltpu.SMEM((12,), jnp.float32)]  # per-bounce cone
    if count_stats:
        scratch = scratch + [pltpu.SMEM((2 * max_bounces,), jnp.int32)]
    scratch += [
        pltpu.SMEM((1, 1), jnp.float32),  # any-alive scalar for the bounce cond
        pltpu.SMEM((_AGENDA_CAP,), jnp.int32),  # pending-leaf ring
    ]
    if stream:
        scratch += [
            # 16-deep ring (round 5): with stream_depth > 1 the walk keeps
            # up to stream_depth-1+k_spec <= 15 block copies in flight so a
            # drain's DMA has had several windows to land.
            pltpu.VMEM((16, PALLAS_BLOCK, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((16,)),
        ]
        trif_spec = pl.BlockSpec(memory_space=pl.ANY)
    else:
        trif_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_fused_kernel, sub=sub, leaf=leaf, max_bounces=max_bounces,
                stream=stream, k_spec=k_spec, pack=pack, record_faces=record_faces,
                cone_filter=cone_filter, count_stats=count_stats,
                stream_depth=stream_depth),
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scal
            pl.BlockSpec(memory_space=pltpu.SMEM),  # nodef
            pl.BlockSpec(memory_space=pltpu.SMEM),  # nodei
            pl.BlockSpec((3, 1, sub, 128), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
            trif_spec,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(scal, nodef, nodei, dT, trif)


class FusedTracer:
    """Callable fused tracer bound to one scene's BVH.

    fused(directions (N, 3), tx (3,), rx (3,), rx_radius, n1, n2)
      -> rfx.tracer.TraceResult (captured, amplitude, distance, num_bounces,
         path_vertices=None), each field (N,).
    """

    # Measured on the flagship workload (scripts/exp_fused_sweep.py +
    # exp_r3_staged.py + the round-5 fine sweep, TPU v5e): 1280-ray tiles
    # (sub=10) beat every power-of-two — 50.7 ms/trace vs 54.4 at 1024, 56.0
    # at 2048, and the immediate NEIGHBORS 1152/1408 both regress to ~58 —
    # verified stable across interleaved reruns with identical capture sets
    # (/tmp jobs logged in PROFILE_r05). 512/256 fall off a cliff (70/48
    # Mrays/s). k_spec=8 beats 4 and 16 at every tile size, and pack=False
    # beats pack=True (90.2 vs 83.0; see packed_hits docstring).
    DEFAULT_TILE_RAYS = 1280
    # Streaming meshes invert the tradeoff (round-5 sweep at 1M tris,
    # scripts/exp_r5_stream2.py: 512 -> 276 ms vs 1024 -> 344, 2048 -> 587):
    # the 128-candidate block drains dominate there, and tighter tiles visit
    # fewer blocks per ray.
    DEFAULT_TILE_RAYS_STREAM = 512

    #: Streaming drain-deferral depth: a drain waits until this many leaves
    #: are pending, so each block's HBM DMA gets that many extra walk windows
    #: to land before its wait. Swept at 1M tris/tile 512 (round 5): depth 3
    #: beats 1 (258.8 vs 275.5 ms) and 6 regresses slightly (262.2).
    DEFAULT_STREAM_DEPTH = 3

    def __init__(self, flat: FlatBVH, *, max_bounces: int,
                 tile_rays: int | None = None, k_spec: int = _K_SPEC,
                 interpret: bool = False, force_stream: bool = False,
                 pack: bool = False, cone_filter: bool = False,
                 count_stats: bool = False, stream_depth: int | None = None):
        if tile_rays is None:
            will_stream = force_stream or (flat.n_padded_tris > STREAM_TRI_THRESHOLD)
            tile_rays = (self.DEFAULT_TILE_RAYS_STREAM if will_stream
                         else self.DEFAULT_TILE_RAYS)
        if 128 % flat.leaf_size or flat.leaf_size < 16:
            raise ValueError("fused tracer needs leaf_size in {16,32,64,128}")
        self.stream = force_stream or (flat.n_padded_tris > STREAM_TRI_THRESHOLD)
        if self.stream and PALLAS_BLOCK % flat.leaf_size:
            raise ValueError(
                f"streaming needs leaf_size dividing {PALLAS_BLOCK} "
                f"(got {flat.leaf_size})"
            )
        if tile_rays % 128:
            raise ValueError("tile_rays must be a multiple of 128")
        self.nodef, self.nodei, self.trif = _pack_bvh(flat)
        if self.stream:
            self.trif = jnp.pad(self.trif, ((0, 0), (0, 0), (0, 128 - 16)))
        self.leaf = flat.leaf_size
        self.tile_rays = tile_rays
        self.max_bounces = max_bounces
        self.k_spec = k_spec
        self.pack = pack
        self.cone_filter = cone_filter
        self.count_stats = count_stats
        self.stream_depth = (stream_depth if stream_depth is not None
                             else (self.DEFAULT_STREAM_DEPTH if self.stream else 1))
        self.interpret = interpret

    def arrays(self):
        """(nodef, nodei, trif) — pass these through an OUTER jit's arguments
        and hand them back via __call__(arrays=...): closing over them bakes
        them into the traced computation as constants, and for streaming-size
        meshes (trif ~67 MB at 1M tris) the AOT compile payload then exceeds
        the relay's request limit (HTTP 413, observed on v5e)."""
        return self.nodef, self.nodei, self.trif

    def __call__(self, directions, tx_pos, rx_pos, rx_radius, n1=5.0, n2=1.0,
                 record_faces: bool = False, arrays=None):
        """Traceable (jit-safe) end to end: plane packing, the fused kernel,
        unpacking. Callers may wrap this (plus IR binning) in one jit so the
        whole CIR is a single device program — for large meshes pass
        `arrays=self.arrays()` through that jit's arguments (see arrays()).
        With record_faces=True returns (TraceResult, (max_bounces, N) i32
        per-bounce face ids) — the differentiable replay's record."""
        n = directions.shape[0]
        pad = (-n) % self.tile_rays
        d = directions.astype(jnp.float32)
        if pad:
            # Padding rays point straight up from the TX; their results are
            # sliced off below (even a capture would be discarded).
            d = jnp.concatenate(
                [d, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (pad, 3))]
            )
        m = d.shape[0]
        sub = self.tile_rays // 128
        tiles = m // self.tile_rays
        dT = d.T.reshape(3, tiles, sub, 128)
        scal = jnp.zeros((16,), jnp.float32)
        scal = scal.at[0:3].set(jnp.asarray(tx_pos, jnp.float32))
        scal = scal.at[3:6].set(jnp.asarray(rx_pos, jnp.float32))
        r = jnp.asarray(rx_radius, jnp.float32)
        scal = scal.at[6].set(r * r)
        scal = scal.at[7].set(jnp.asarray(n1, jnp.float32))
        scal = scal.at[8].set(jnp.asarray(n2, jnp.float32))
        if record_faces and self.trif.shape[0] * PALLAS_BLOCK > 2 ** 24:
            # Face ids ride f32 lanes (trif lane 12 + the fc accumulator);
            # above 2^24 they lose integer exactness and the replay backward
            # would silently gather wrong faces.
            raise ValueError(
                "record_faces supports up to 2^24 padded triangles "
                f"(mesh has {self.trif.shape[0] * PALLAS_BLOCK})"
            )
        nodef, nodei, trif = arrays if arrays is not None else (
            self.nodef, self.nodei, self.trif)
        outs = fused_trace_planes(
            nodef, nodei, trif, dT, scal,
            sub=sub, leaf=self.leaf, max_bounces=self.max_bounces,
            stream=self.stream, k_spec=self.k_spec, interpret=self.interpret,
            pack=self.pack, record_faces=record_faces,
            cone_filter=self.cone_filter, count_stats=self.count_stats,
            stream_depth=self.stream_depth,
        )
        capt, capa, capd, nb = outs[:4]
        from rfx.tracer import TraceResult

        result = TraceResult(
            captured=capt.reshape(m)[:n].astype(bool),
            amplitude=capa.reshape(m)[:n],
            distance=capd.reshape(m)[:n],
            num_bounces=nb.reshape(m)[:n],
        )
        extras = [result]
        k = 4
        if record_faces:
            # (tiles, B, sub, 128) -> (B, N)
            extras.append(
                jnp.moveaxis(outs[k], 1, 0).reshape(self.max_bounces, m)[:, :n])
            k += 1
        if self.count_stats:
            # (tiles, 2B) i32: per-tile [windows_b0, leaves_b0, windows_b1, ...]
            extras.append(outs[k][:, 0, : 2 * self.max_bounces])
        return extras[0] if len(extras) == 1 else tuple(extras)


def replay_from_faces(vertices, faces_tbl, tx_pos, directions, rx_pos, rx_radius,
                      bounce_faces, captured, num_bounces, *, n1=5.0, n2=1.0):
    """Differentiable closed-form replay of a recorded fused trace.

    The fused kernel records WHICH face each ray hit per bounce
    (bounce_faces (B, N) i32, -1 = no bounce) plus capture flags/counts; this
    function recomputes (amplitude, distance) for the captured rays in plain
    JAX with the hit *selection* frozen (straight-through, the same treatment
    as the per-query custom-VJP intersectors): per bounce, one closed-form
    Moller-Trumbore t on the recorded face, edge-derived normal, specular
    reflection, Fresnel factor; at the capture step, the analytic sphere hit.
    Cost is O(B*N) gathers + vector math — NO BVH re-traversal — so the
    VJP of the whole multi-bounce trace is a cheap dense pipeline.

    Differentiable in: vertices, tx_pos, directions, rx_pos, rx_radius.
    Outputs match the kernel's (amplitude, distance) within f32 tolerance
    (the kernel's algebraic Fresnel == physics.fresnel_bounce_amplitude).
    """
    from rfx import physics
    from rfx.ops.intersect import closed_form_t, ray_sphere_hit

    B = bounce_faces.shape[0]
    f32 = jnp.float32
    d = directions.astype(f32)
    zeros = jnp.zeros_like(d[:, 0])
    o = jnp.asarray(tx_pos, f32)[None, :] + zeros[:, None]
    amp = zeros + 1.0
    dist = zeros
    cap_amp = zeros
    cap_dist = zeros
    v0_all = vertices[faces_tbl[:, 0]]
    e1_all = vertices[faces_tbl[:, 1]] - v0_all
    e2_all = vertices[faces_tbl[:, 2]] - v0_all
    rx = jnp.asarray(rx_pos, f32)

    for b in range(B):
        env_b = bounce_faces[b] >= 0
        cap_b = captured & (num_bounces == b)
        # Capture at this step: amplitude/distance frozen at entry state.
        t_rx = ray_sphere_hit(o, d, rx, rx_radius)
        t_rx_safe = jnp.where(cap_b & (t_rx < MISS_THRESHOLD), t_rx, 0.0)
        cap_amp = jnp.where(cap_b, amp, cap_amp)
        cap_dist = jnp.where(cap_b, dist + t_rx_safe, cap_dist)
        # Env bounce on the recorded face.
        f = jnp.clip(bounce_faces[b], 0, None)
        fv0, fe1, fe2 = v0_all[f], e1_all[f], e2_all[f]
        t_env = closed_form_t(o, d, fv0, fe1, fe2)
        t_adv = jnp.where(env_b, t_env, 0.0)
        nrm = jnp.cross(fe1, fe2)
        nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=1, keepdims=True), 1e-30)
        d_out = physics.reflect(d, nrm)
        fres = physics.fresnel_bounce_amplitude(physics.bend_angle(d, d_out), n1, n2)
        o = jnp.where(env_b[:, None], o + d * t_adv[:, None], o)
        d = jnp.where(env_b[:, None], d_out, d)
        amp = jnp.where(env_b, amp * fres, amp)
        dist = dist + t_adv
    # A capture at step B (after the last allowed bounce) cannot happen in the
    # kernel (the loop runs exactly max_bounces iterations), so num_bounces of
    # a captured ray is always < B.
    return cap_amp, cap_dist


def make_diff_fused_tracer(flat_or_mesh, faces_tbl, *, max_bounces: int, n1=5.0,
                           n2=1.0, grad_args=("vertices", "tx_pos", "directions",
                                              "rx_pos", "rx_radius"),
                           bwd_max_captured: int = 1 << 17, **kwargs):
    """Differentiable fused tracer: Pallas megakernel forward + recorded-face
    replay backward (round-3 VERDICT #4: fused backward without re-traversal).

    Returns diff_trace(vertices, tx_pos, directions, rx_pos, rx_radius) ->
    TraceResult. Gradients flow to every argument named in `grad_args` via
    the replay's VJP; the forward's capture/bounce-count/face record is
    straight-through (the same selection-freezing as the per-query
    intersectors' custom VJPs).

    `grad_args` restricts which arguments receive real cotangents (the rest
    get symbolic zeros); `bwd_max_captured` bounds the CAPTURED-SUBSET
    backward (round-5, exp_r5_gradprof.py): only captured rays carry nonzero
    loss cotangents (non-captured amplitude/distance are masked out of every
    IR), yet the naive backward replayed ALL N rays — 26.5 ms forward +
    ~27 ms VJP at 2.6M rays for ~1.7k captured. The backward now compacts to
    the captured rays via size-bounded jnp.nonzero (jit-static shape) and
    scatters the direction cotangent back. If a trace captures more than
    bwd_max_captured rays (131072 default — ~100x any measured workload),
    every cotangent is poisoned to NaN so the truncation can never pass
    silently.

    `faces_tbl` is the scene's (F, 3) int32 face-index table; `vertices` is
    passed at call time so vertex gradients flow. The BVH (and the kernel's
    triangle blocks) are built once from the mesh — a caller optimizing
    vertices should rebuild per geometry update (hit topology changes are
    non-differentiable anyway).
    """
    fused = make_fused_tracer(flat_or_mesh, max_bounces=max_bounces, **kwargs)
    faces_tbl = jnp.asarray(faces_tbl)
    arg_names = ("vertices", "tx_pos", "directions", "rx_pos", "rx_radius")
    diff_mask = tuple(a in grad_args for a in arg_names)

    @jax.custom_vjp
    def diff_trace(vertices, tx_pos, directions, rx_pos, rx_radius):
        r, _ = _fwd(vertices, tx_pos, directions, rx_pos, rx_radius)
        return r

    def _fwd(vertices, tx_pos, directions, rx_pos, rx_radius):
        out = fused(directions, tx_pos, rx_pos, rx_radius, n1=n1, n2=n2,
                    record_faces=True)
        result, bounce_faces = out
        res = (vertices, tx_pos, directions, rx_pos, rx_radius,
               bounce_faces, result.captured, result.num_bounces)
        return result, res

    def _bwd(res, g):
        vertices, tx_pos, directions, rx_pos, rx_radius, bf, cap, nb = res
        n = directions.shape[0]
        m = min(bwd_max_captured, n)
        cap_idx = jnp.nonzero(cap, size=m, fill_value=0)[0]
        ncap = jnp.sum(cap.astype(jnp.int32))
        valid = jnp.arange(m) < ncap
        overflow = ncap > m
        d_sub = directions[cap_idx]
        bf_sub = bf[:, cap_idx]
        nb_sub = nb[cap_idx]
        g_amp = jnp.where(valid, g.amplitude[cap_idx], 0.0)
        g_dist = jnp.where(valid, g.distance[cap_idx], 0.0)
        args = (vertices, tx_pos, d_sub, rx_pos,
                jnp.asarray(rx_radius, jnp.float32))
        live = [a for a, mk in zip(args, diff_mask) if mk]

        def amp_dist(*live_args):
            it = iter(live_args)
            full = [next(it) if mk else jax.lax.stop_gradient(a)
                    for a, mk in zip(args, diff_mask)]
            v, t, dirs, rx, rr = full
            return replay_from_faces(v, faces_tbl, t, dirs, rx, rr, bf_sub,
                                     valid, nb_sub, n1=n1, n2=n2)

        _, vjp = jax.vjp(amp_dist, *live)
        cots = iter(vjp((g_amp, g_dist)))
        poison = lambda x: jnp.where(overflow, jnp.float32(jnp.nan), x)
        out = []
        for (name, a, mk) in zip(arg_names, args, diff_mask):
            if not mk:
                # symbolic-zero-ish: full-shape zeros for the ORIGINAL arg
                out.append(jnp.zeros_like(directions) if name == "directions"
                           else jnp.zeros_like(a))
                continue
            c = next(cots)
            if name == "directions":
                c = jnp.zeros_like(directions).at[cap_idx].add(
                    jnp.where(valid[:, None], c, 0.0))
            out.append(poison(c))
        return tuple(out)

    diff_trace.defvjp(_fwd, _bwd)
    return diff_trace


# Default n-ary collapse for the fused walk (see rfx.bvh.collapse_bvh): the
# tile-uniform walk pays ~fixed cost per k_spec-node window, so fewer, fatter
# nodes mean fewer windows. Swept on hardware in round 5
# (scripts/exp_r5_arity.py).
FUSED_DEFAULT_ARITY = 2


def make_fused_tracer(flat_or_mesh, *, max_bounces: int,
                      arity: int | None = None, **kwargs) -> FusedTracer:
    """Build a FusedTracer from a FlatBVH or a TriangleMesh (builds the BVH
    with the same leaf-size policy as make_pallas_env_hit: 16 for
    VMEM-resident meshes, 128 for >512k-padded-tri HBM-streaming ones).
    `arity` collapses the tree n-ary for the walk (default
    FUSED_DEFAULT_ARITY; ignored when a prebuilt FlatBVH is passed)."""
    if arity is None:
        arity = FUSED_DEFAULT_ARITY
    if isinstance(flat_or_mesh, FlatBVH):
        flat = flat_or_mesh
    else:
        big = flat_or_mesh.num_faces > 0.75 * STREAM_TRI_THRESHOLD
        flat = build_bvh(flat_or_mesh, leaf_size=PALLAS_BLOCK if big else PALLAS_LEAF,
                         arity=arity)
        if not big and flat.n_padded_tris > STREAM_TRI_THRESHOLD:
            flat = build_bvh(flat_or_mesh, leaf_size=PALLAS_BLOCK, arity=arity)
    return FusedTracer(flat, max_bounces=max_bounces, **kwargs)
