"""Batched per-receiver CIR histograms as one Pallas kernel (exact coverage).

The coverage engine's exact metric builds a full impulse response per receiver
(ref coverage.py:45-55 derives dBm from each per-RX IR). Doing that as one
XLA histogram per receiver — scatter-add or the one-hot MXU matmul of
rfx.cir._bincount_matmul — round-trips the (Q, chunk) / (128, chunk) one-hot
operands through HBM for every receiver (measured 71 s for 2048 receivers x
1M rays x 2 bounces on v5e, HBM-bound on one-hot traffic).

This kernel fuses the whole per-receiver pipeline in VMEM:

    sphere test (ray_sphere_hit algebra) -> first-capture-along-bounce
    selection (ref kernel.py:85 rule) -> delay binning (truncating,
    ref tracer.py:115) -> one-hot MXU histogram accumulation

for a tile of R_TILE receivers per grid row, streaming segment chunks once
from HBM.

Two hardware lessons are baked in (both measured on v5e):

1. Dot orientation. The histogram dot must be a standard (M, K) @ (K, N)
   matmul: contraction over the lhs LANES and the rhs SUBLANES. The naive
   formulation contracts the segment axis in the LANES of both one-hots,
   which forces a per-dot relayout inside Mosaic and ran ~100x slower than
   the XLA-level equivalent. Here the accumulator is kept TRANSPOSED —
   acc_T[r%, q] with the low bin bits on the sublane axis — so the dot is
   dot(bm (128, 128), a_T (128, Q)): bm's segment axis in lanes (built from
   the natural lane-major chunk), a_T's in sublanes (built from one
   (1, 128) -> (128, 1) vector relayout per active subtile). The final
   (128, Q) -> (Q, 128) untranspose happens once, outside the kernel, in XLA.

2. Capture sparsity. Only segments whose ray actually enters this receiver's
   sphere contribute; for realistic sweeps that is a tiny fraction. Each
   128-segment subtile is gated on `any(weight != 0)` (one cross-lane reduce)
   and contributes zero MXU/relayout work when empty, so the dense cost
   collapses to the unavoidable per-receiver sphere tests.

Forward-only (the exact coverage metric is a reporting path; the
differentiable solver path uses soft binning through the XLA engine).
Parity: bit-equivalent binning semantics vs rfx.cir.bin_impulse_response
(hard mode) — tested against the lax.map engine in interpret mode.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rfx.ops.intersect import MISS, MISS_THRESHOLD, T_MIN_EPS

_MISS = float(MISS)  # python float: jnp constants can't be captured by kernels

__all__ = ["coverage_hist_pallas"]

R_TILE = 8  # receivers per grid row
C_CHUNK = 2048  # segments (rays) per grid column
_SUB = 128  # segment subtile (one lane tile) for the gated histogram dots


def _kernel(planes_ref, centers_ref, out_ref, w_s, qr_s, *, B, Q, nbins,
            light_speed_mps, sample_rate_hz, t_min):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ox = planes_ref[0]
    oy = planes_ref[1]
    oz = planes_ref[2]
    dx = planes_ref[3]
    dy = planes_ref[4]
    dz = planes_ref[5]
    t_env = planes_ref[6]
    amp = planes_ref[7]
    dist = planes_ref[8]
    alive = planes_ref[9] > 0.5  # (B, C)

    K = C_CHUNK // _SUB
    # Full-shape iotas + explicit broadcast_to: a compare that implicitly
    # broadcasts BOTH operands ((1,128) vs (128,1)) is rejected by Mosaic
    # ("Invalid input layout" on the vector.broadcast); single-operand
    # broadcasts against full-shape iotas compile and run (probed on v5e).
    qi_full = jax.lax.broadcasted_iota(jnp.int32, (_SUB, Q), 1)
    ri_full = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _SUB), 0)

    for r in range(R_TILE):
        cx = centers_ref[r, 0]
        cy = centers_ref[r, 1]
        cz = centers_ref[r, 2]
        rad = centers_ref[r, 3]
        ocx = ox - cx
        ocy = oy - cy
        ocz = oz - cz
        b = ocx * dx + ocy * dy + ocz * dz
        c2 = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
        disc = b * b - c2
        hit = disc > 0.0
        s = jnp.sqrt(jnp.where(hit, disc, 1.0))
        t0 = -b - s
        t1 = -b + s
        t_rx = jnp.where(t0 > t_min, t0, jnp.where(t1 > t_min, t1, _MISS))
        t_rx = jnp.where(hit, t_rx, _MISS)
        win = alive & (t_rx < MISS_THRESHOLD) & (t_env > t_rx)  # (B, C)

        prev = jnp.zeros((1, C_CHUNK), jnp.bool_)
        for bb in range(B):
            wb = win[bb:bb + 1, :]
            first = wb & ~prev  # first capture along the bounce axis
            prev = prev | wb
            total = dist[bb:bb + 1, :] + t_rx[bb:bb + 1, :]
            # Same two f32 ops as rfx.cir.bin_impulse_response (d / c * rate):
            # a prefolded (rate/c) multiplier rounds differently and moves
            # ~260 ppm of segments across a bin boundary (measured), breaking
            # the bit-equivalence this kernel promises vs the map engine.
            binf = total / light_speed_mps * sample_rate_hz
            bin_i = binf.astype(jnp.int32)  # truncation (ref tracer.py:115)
            valid = first & (bin_i >= 0) & (bin_i < nbins)
            w = jnp.where(valid, amp[bb:bb + 1, :], 0.0)  # (1, C)
            bin_i = jnp.clip(bin_i, 0, Q * 128 - 1)
            # Round-trip the rows through VMEM scratch: per-k slices must be
            # LOADED from a ref (clean offset-0 layout). Slicing the computed
            # (1, C) values directly hands the broadcast an offset layout,
            # which Mosaic rejects ("Invalid input layout", probed on v5e).
            w_s[:] = w
            qr_s[0:1, :] = bin_i // 128
            qr_s[1:2, :] = bin_i % 128
            for k in range(K):
                w_k = w_s[:, k * _SUB:(k + 1) * _SUB]  # (1, 128)

                @pl.when(jnp.any(w_k != 0.0))
                def _(w_k=w_k, k=k, r=r):
                    q_k = qr_s[0:1, k * _SUB:(k + 1) * _SUB]
                    rr_k = qr_s[1:2, k * _SUB:(k + 1) * _SUB]
                    # bm[r%, c] = [rr_k[c] == r%]  — segments in LANES
                    bm = (jnp.broadcast_to(rr_k, (_SUB, _SUB)) == ri_full
                          ).astype(jnp.float32)  # (128, 128)
                    # a_T[c, q'] = w_k[c] * [q_k[c] == q'] — segments in
                    # SUBLANES (one (1,128)->(128,1) relayout each, only on
                    # capture-active subtiles)
                    w_col = w_k.reshape(_SUB, 1)
                    q_col = q_k.reshape(_SUB, 1)
                    a_t = jnp.where(
                        jnp.broadcast_to(q_col, (_SUB, Q)) == qi_full,
                        jnp.broadcast_to(w_col, (_SUB, Q)), 0.0,
                    )  # (128, Q)
                    # HIGHEST, not rfx.cir.BINNING_PRECISION (HIGH): Mosaic
                    # only lowers DEFAULT/HIGHEST in-kernel ("Unsupported dot
                    # precision: HIGH", measured round 5 on v5e). Both HIGH
                    # (map engine) and HIGHEST decompose the one-hot operand's
                    # {0,1} values into bf16 with zero residual, so every
                    # partial product is exact and the two engines still sum
                    # the same exact values in the same order — the binning
                    # equivalence holds despite the differing constants.
                    out_ref[pl.ds(r * _SUB, _SUB), :] += jax.lax.dot_general(
                        bm, a_t, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )


@partial(
    jax.jit,
    static_argnames=("nbins", "light_speed_mps", "sample_rate_hz", "interpret"),
)
def coverage_hist_pallas(
    segs,
    rx_centers,
    rx_radius,
    *,
    nbins: int,
    light_speed_mps: float,
    sample_rate_hz: float,
    interpret: bool = False,
):
    """(M, nbins) hard-binned impulse responses for M receiver spheres.

    `segs` is an EnvSegments whose `amplitude` the caller has already scaled
    by tx_power / num_rays. Semantics identical to mapping
    rfx.coverage._rx_ir_from_segments over receivers (soft=False).
    """
    B, N = segs.t_env.shape
    planes = jnp.stack(
        [
            segs.origin[..., 0], segs.origin[..., 1], segs.origin[..., 2],
            segs.direction[..., 0], segs.direction[..., 1], segs.direction[..., 2],
            segs.t_env,
            segs.amplitude,
            segs.distance,
            segs.alive.astype(jnp.float32),
        ]
    )  # (10, B, N)
    pad_n = (-N) % C_CHUNK
    if pad_n:
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, pad_n)))  # alive pads to 0
    n_pad = N + pad_n

    m = rx_centers.shape[0]
    pad_m = (-m) % R_TILE
    centers = jnp.concatenate(
        [
            rx_centers.astype(jnp.float32),
            jnp.full((m, 1), jnp.float32(rx_radius)),
        ],
        axis=1,
    )
    if pad_m:
        # Padded receivers have radius 0: (oc.d)^2 - |oc|^2 <= 0 for unit d
        # (Cauchy-Schwarz), so they can never register a hit.
        centers = jnp.pad(centers, ((0, pad_m), (0, 0)))
    m_pad = m + pad_m

    Q = -(-nbins // 128)
    grid = (m_pad // R_TILE, n_pad // C_CHUNK)
    out = pl.pallas_call(
        partial(
            _kernel,
            B=B,
            Q=Q,
            nbins=nbins,
            light_speed_mps=float(light_speed_mps),
            sample_rate_hz=float(sample_rate_hz),
            t_min=T_MIN_EPS,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((10, B, C_CHUNK), lambda i, j: (0, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((R_TILE, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R_TILE * _SUB, Q), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad * _SUB, Q), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, C_CHUNK), jnp.float32),  # w row
            pltpu.VMEM((2, C_CHUNK), jnp.int32),  # q, r% rows
        ],
        interpret=interpret,
    )(planes, centers)
    # Untranspose the accumulator once in XLA: (M*128, Q) -> (M, nbins) with
    # bin = q*128 + r%.
    out = out.reshape(m_pad, _SUB, Q).transpose(0, 2, 1).reshape(m_pad, Q * 128)
    return out[:m, :nbins]
