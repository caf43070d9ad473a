"""Differentiable inverse solve: optimize TX pose + material refractive index
against a target coverage map (BASELINE.json config 5).

The loss runs the full tracer (soft delay binning so delay gradients flow,
rfx.cir.bin_impulse_response) optionally under shard_map on a ('rays', 'rx')
device mesh; jax.grad differentiates through the trace scan and the psum
collectives, so parameter gradients all-reduce over ICI as part of the
backward pass.

The reference has no counterpart (no optimization, no gradients anywhere) —
this subsystem exists because differentiability is the point of the TPU
rebuild (BASELINE.json north star).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from rfx.cir import bin_impulse_response
from rfx.ops.intersect import is_hit, ray_sphere_hit
from rfx.tracer import Scene, trace_env

__all__ = ["InverseParams", "coverage_irs_soft", "make_inverse_solver"]


class InverseParams(NamedTuple):
    tx_pos: jnp.ndarray  # (3,)
    log_n1: jnp.ndarray  # scalar; n1 = exp(log_n1) keeps the index positive


def coverage_irs_soft(
    vertices,
    faces,
    tx_pos,
    n1,
    directions,
    rx_centers,
    rx_radius,
    *,
    num_rays: int,
    max_bounces: int,
    nbins: int,
    light_speed_mps: float,
    sample_rate_hz: float,
    n2=1.0,
    env_hit=None,
):
    """(M, nbins) soft-binned impulse responses, normalised by the *global*
    ray count (`num_rays` may exceed directions.shape[0] under sharding, where
    each shard produces a partial IR that sums across shards)."""
    segs = trace_env(
        Scene(vertices, faces), tx_pos, directions,
        max_bounces=max_bounces, n1=n1, n2=n2, env_hit=env_hit,
    )
    B, N = segs.t_env.shape
    o = segs.origin.reshape(B * N, 3)
    d = segs.direction.reshape(B * N, 3)

    def one_rx(center):
        t_rx = ray_sphere_hit(o, d, center, rx_radius).reshape(B, N)
        win = segs.alive & is_hit(t_rx) & (segs.t_env > t_rx)
        seen = jnp.cumsum(win.astype(jnp.int32), axis=0) - win.astype(jnp.int32)
        first = win & (seen == 0)
        amp = jnp.where(first, segs.amplitude, 0.0).reshape(-1) / num_rays
        dist = jnp.where(first, segs.distance + jnp.where(first, t_rx, 0.0), 0.0).reshape(-1)
        return bin_impulse_response(
            amp, dist, first.reshape(-1), nbins=nbins,
            light_speed_mps=light_speed_mps, sample_rate_hz=sample_rate_hz, soft=True,
        )

    return jax.vmap(one_rx)(rx_centers)


def make_inverse_solver(
    scene: Scene,
    directions,
    rx_centers,
    rx_radius,
    target_energy,
    *,
    max_bounces: int,
    nbins: int,
    light_speed_mps: float = 2.998e8,
    sample_rate_hz: float = 100e9,
    learning_rate: float = 0.05,
    mesh=None,
    env_hit=None,
):
    """Returns (init_fn, step_fn) for the inverse solve.

    step_fn(params, opt_state) -> (params, opt_state, loss). When `mesh` (with
    axes 'rays' and 'rx') is given, rays shard over 'rays' and receivers over
    'rx'; per-shard partial IRs psum over 'rays' *before* the energy square
    (IR energy is quadratic in the ray sum, so shards must combine first), and
    the loss psums over 'rx'.
    """
    opt = optax.adam(learning_rate)
    num_rays = int(directions.shape[0])
    num_rx = int(rx_centers.shape[0])

    def irs_fn(params: InverseParams, dirs, centers):
        return coverage_irs_soft(
            scene.vertices, scene.faces, params.tx_pos, jnp.exp(params.log_n1),
            dirs, centers, rx_radius,
            num_rays=num_rays, max_bounces=max_bounces, nbins=nbins,
            light_speed_mps=light_speed_mps, sample_rate_hz=sample_rate_hz,
            env_hit=env_hit,
        )

    if mesh is None:
        def loss_fn(params):
            irs = irs_fn(params, directions, rx_centers)
            energy = jnp.sum(irs * irs, axis=1)
            return jnp.mean((energy - target_energy) ** 2)
    else:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        def local_loss(params, dirs, centers, tgt):
            partial_irs = irs_fn(params, dirs, centers)  # (M/rx, nbins) partial
            irs = jax.lax.psum(partial_irs, "rays")  # complete each receiver
            energy = jnp.sum(irs * irs, axis=1)
            se = jnp.sum((energy - tgt) ** 2)
            return jax.lax.psum(se, "rx") / num_rx

        # check_vma=False: the VMA checker rejects the *backward* scan (rx-
        # varying cotangents meet a rays-varying forward carry) even though the
        # per-device computation and the psum transposes are correct — the
        # error message itself names this workaround.
        sharded = shard_map(
            local_loss,
            mesh=mesh,
            in_specs=(P(), P("rays"), P("rx"), P("rx")),
            out_specs=P(),
            check_vma=False,
        )

        def loss_fn(params):
            return sharded(params, directions, rx_centers, target_energy)

    @jax.jit
    def step_fn(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def init_fn(tx0, n1_0=5.0):
        params = InverseParams(
            tx_pos=jnp.asarray(tx0, jnp.float32),
            log_n1=jnp.log(jnp.asarray(n1_0, jnp.float32)),
        )
        return params, opt.init(params)

    return init_fn, step_fn
