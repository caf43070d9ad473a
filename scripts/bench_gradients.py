"""Gradient throughput on TPU hardware (round-3 VERDICT #4).

Measures end-to-end value+gradient Mrays/s of the trace->IR loss wrt tx_pos
on the flagship terrain scene, through BOTH differentiation paths:

  - scan:  lax.scan bounce loop with per-query custom-VJP Pallas intersector
           (the pre-round-4 gradient path; forward re-traverses in backward)
  - fused: fused megakernel forward with recorded per-bounce face ids +
           closed-form replay backward (rfx.ops.pallas_fused.
           make_diff_fused_tracer; NO BVH re-traversal in the backward)

plus forward-only numbers for both paths as the denominator, and a grad
cross-check between the two. Writes GRAD_r04.json.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from rfx import sampler
    from rfx.cir import cir_from_trace
    from rfx.geometry import make_terrain
    from rfx.ops.intersect import make_env_intersector
    from rfx.ops.pallas_fused import make_diff_fused_tracer, make_fused_tracer
    from rfx.tracer import Scene, trace_to_rx

    _ = np.asarray(jnp.ones((8, 128)))

    n_rays = 2_621_440  # half the flagship batch: the scan VJP's residuals
    # (per-bounce ray planes) keep peak memory bounded
    max_bounces = 4
    nbins = 20_000
    mesh = make_terrain(grid=128, extent=60.0, seed=0)
    scene = Scene.from_mesh(mesh)
    tx = jnp.asarray([10.0, 0.0, 25.0], jnp.float32)
    rx = jnp.asarray([-10.0, 0.0, 8.0], jnp.float32)
    dirs = sampler.morton_sphere_directions(jax.random.PRNGKey(0), n_rays)
    env_hit = make_env_intersector("pallas", mesh=mesh)
    dt = make_diff_fused_tracer(mesh, scene.faces, max_bounces=max_bounces)

    def ir_loss(result):
        ir = cir_from_trace(
            result, tx_power=1.0, num_rays=n_rays, nbins=nbins,
            light_speed_mps=2.998e8, sample_rate_hz=100e9, soft=True,
        )
        return jnp.sum(ir * ir) * 1e12

    def loss_scan(txp):
        r = trace_to_rx(scene, txp, dirs, rx, 1.0, max_bounces=max_bounces,
                        rx_mode="analytic", env_hit=env_hit)
        return ir_loss(r)

    def loss_fused(txp):
        r = dt(scene.vertices, txp, dirs, rx, jnp.float32(1.0))
        return ir_loss(r)

    fns = {
        "scan_forward": jax.jit(loss_scan),
        "fused_forward": jax.jit(loss_fused),
        "scan_valgrad": jax.jit(jax.value_and_grad(loss_scan)),
        "fused_valgrad": jax.jit(jax.value_and_grad(loss_fused)),
    }

    out = {"n_rays": n_rays, "bounces": max_bounces}
    grads = {}
    for name, fn in fns.items():
        res = fn(tx)
        # force completion through the relay
        val = res[0] if isinstance(res, tuple) else res
        _ = float(val)
        if isinstance(res, tuple):
            grads[name] = np.asarray(res[1])
        times = []
        for _i in range(3):
            t0 = time.perf_counter()
            res = fn(tx)
            val = res[0] if isinstance(res, tuple) else res
            _ = float(val)
            times.append(time.perf_counter() - t0)
        best = min(times)
        out[name] = {
            "seconds": round(best, 4),
            "mrays_per_s": round(n_rays / best / 1e6, 2),
        }
        print(f"# {name}: {best*1e3:.1f} ms = {n_rays/best/1e6:.1f} Mrays/s", flush=True)

    g_s, g_f = grads["scan_valgrad"], grads["fused_valgrad"]
    rel = np.abs(g_f - g_s) / np.maximum(np.abs(g_s), 1e-3)
    out["grad_scan"] = [float(x) for x in g_s]
    out["grad_fused"] = [float(x) for x in g_f]
    out["grad_rel_diff_max"] = round(float(rel.max()), 5)
    assert np.all(np.isfinite(g_s)) and np.all(np.isfinite(g_f))
    # The two paths freeze slightly different hit selections: captures are
    # threshold events (t_env > t_rx in f32 from two individually-correct
    # kernels), and each flipped ray swaps its whole contribution into/out of
    # the straight-through gradient. Measure the flip budget alongside.
    r_scan = jax.jit(lambda: trace_to_rx(
        scene, tx, dirs, rx, 1.0, max_bounces=max_bounces, rx_mode="analytic",
        env_hit=env_hit))()
    r_fused = jax.jit(lambda: dt(scene.vertices, tx, dirs, rx, jnp.float32(1.0)))()
    flips = int((np.asarray(r_scan.captured) != np.asarray(r_fused.captured)).sum())
    out["capture_flips"] = flips
    out["captured"] = int(np.asarray(r_scan.captured).sum())
    assert flips <= max(4, n_rays // 500)
    assert float(rel.max()) < 0.06, f"fused vs scan grad disagree: {g_f} vs {g_s}"
    out["fused_backward_speedup_vs_scan"] = round(
        out["scan_valgrad"]["seconds"] / out["fused_valgrad"]["seconds"], 2
    )

    with open("GRAD_r04.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
