"""Round-5 gradient evidence (VERDICT r4 next #4) -> GRAD_r05.json.

(a) Per-ray breakdown of the fused-replay vs scan tx-gradient disagreement
    (4.4% aggregate in GRAD_r04 with zero capture flips): both paths'
    gradients are decomposed per captured ray by giving every ray its OWN
    tx row (loss(TX (K,3)) with ray i spawned at TX_i — one backward pass
    yields the full per-ray decomposition; summing rows reproduces the
    aggregate exactly). The comparison then separates
      - per-ray derivative disagreement (numerics: scan VJP vs closed-form
        replay, both with frozen selection), from
      - cancellation amplification (|sum| << sum|.| makes a tiny per-ray
        error look large in the aggregate), and
      - geometry mismatches (different recorded faces between kernels).
(c) Replay-backward profile: fused valgrad with full grad_args (vertex
    cotangent scatter-adds included) vs grad_args=('tx_pos',) — the round-5
    fix that skips the (F,3) scatter streams for tx-only losses.
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
    from rfx.ops.intersect import (MISS_THRESHOLD, closed_form_t,
                                   make_env_intersector, ray_sphere_hit)
    from rfx.ops.pallas_fused import make_diff_fused_tracer, make_fused_tracer
    from rfx.tracer import Scene, TraceResult, trace_to_rx
    from rfx import physics

    _ = np.asarray(jnp.ones((8, 128)))

    n_rays = 2_621_440
    B = 4
    nbins = 20_000
    mesh = make_terrain(grid=128, extent=60.0, seed=0)
    scene = Scene.from_mesh(mesh)
    tx = jnp.asarray([10.0, 0.0, 25.0], jnp.float32)
    rx = jnp.asarray([-10.0, 0.0, 8.0], jnp.float32)
    rr = jnp.float32(1.0)
    dirs = sampler.morton_sphere_directions(jax.random.PRNGKey(0), n_rays)
    env_hit = make_env_intersector("pallas", mesh=mesh)

    def ir_loss(result):
        ir = cir_from_trace(
            result, tx_power=1.0, num_rays=n_rays, nbins=nbins,
            light_speed_mps=2.998e8, sample_rate_hz=100e9, soft=True,
        )
        return jnp.sum(ir * ir) * 1e12

    def loss_scan(txp):
        r = trace_to_rx(scene, txp, dirs, rx, rr, max_bounces=B,
                        rx_mode="analytic", env_hit=env_hit)
        return ir_loss(r)

    out = {"n_rays": n_rays, "bounces": B}

    # ---- (c) valgrad timing: full grad_args vs tx-only --------------------
    variants = {
        "full": make_diff_fused_tracer(mesh, scene.faces, max_bounces=B),
        "tx_only": make_diff_fused_tracer(
            mesh, scene.faces, max_bounces=B, grad_args=("tx_pos",)),
    }
    fns = {"scan_valgrad": jax.jit(jax.value_and_grad(loss_scan))}
    for name, dt in variants.items():
        def loss_fused(txp, _dt=dt):
            return ir_loss(_dt(scene.vertices, txp, dirs, rx, rr))
        fns[f"fused_valgrad_{name}"] = jax.jit(jax.value_and_grad(loss_fused))
        if name == "full":
            fns["fused_forward"] = jax.jit(loss_fused)

    grads = {}
    for name, fn in fns.items():
        res = fn(tx)
        val = res[0] if isinstance(res, tuple) else res
        _ = float(val)
        if isinstance(res, tuple):
            grads[name] = np.asarray(res[1])
        ts = []
        for _i in range(3):
            t0 = time.perf_counter()
            res = fn(tx)
            _ = float(res[0] if isinstance(res, tuple) else res)
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        out[name] = {"seconds": round(best, 4),
                     "mrays_per_s": round(n_rays / best / 1e6, 2)}
        print(f"# {name}: {best*1e3:.1f} ms = {n_rays/best/1e6:.1f} Mrays/s",
              flush=True)

    g_s = grads["scan_valgrad"]
    g_f = grads["fused_valgrad_full"]
    g_ftx = grads["fused_valgrad_tx_only"]
    assert np.allclose(g_f, g_ftx, rtol=1e-5), "grad_args must not change the tx grad"
    rel = np.abs(g_f - g_s) / np.maximum(np.abs(g_s), 1e-3)
    out["grad_scan"] = [float(x) for x in g_s]
    out["grad_fused"] = [float(x) for x in g_f]
    out["grad_rel_diff_max"] = round(float(rel.max()), 5)

    # ---- (a) per-ray decomposition ---------------------------------------
    ft = make_fused_tracer(mesh, max_bounces=B)
    r_f, bf = jax.jit(lambda: ft(dirs, tx, rx, rr, record_faces=True))()
    cap = np.asarray(r_f.captured)
    nb = np.asarray(r_f.num_bounces)
    bf = np.asarray(bf)
    idx = np.where(cap)[0]
    K = int(idx.size)
    out["captured"] = K
    pad = (-K) % 256
    sel = np.concatenate([idx, np.repeat(idx[:1], pad)])
    dirs_k = jnp.asarray(np.asarray(dirs)[sel])
    bf_k = jnp.asarray(bf[:, sel])
    nb_k = jnp.asarray(nb[sel])
    act = jnp.asarray(np.arange(sel.size) < K)
    TX0 = jnp.broadcast_to(tx, (sel.size, 3)).astype(jnp.float32)
    v0_all = scene.vertices[scene.faces[:, 0]]
    e1_all = scene.vertices[scene.faces[:, 1]] - v0_all
    e2_all = scene.vertices[scene.faces[:, 2]] - v0_all

    def subset_result_replay(TXK):
        o = TXK
        d = dirs_k
        z = jnp.zeros_like(d[:, 0])
        amp, dist, cap_amp, cap_dist = z + 1.0, z, z, z
        for b in range(B):
            env_b = bf_k[b] >= 0
            cap_b = act & (nb_k == b)
            t_rx = ray_sphere_hit(o, d, rx, rr)
            t_rx_safe = jnp.where(cap_b & (t_rx < MISS_THRESHOLD), t_rx, 0.0)
            cap_amp = jnp.where(cap_b, amp, cap_amp)
            cap_dist = jnp.where(cap_b, dist + t_rx_safe, cap_dist)
            f = jnp.clip(bf_k[b], 0, None)
            fv0, fe1, fe2 = v0_all[f], e1_all[f], e2_all[f]
            t_env = closed_form_t(o, d, fv0, fe1, fe2)
            t_adv = jnp.where(env_b, t_env, 0.0)
            nrm = jnp.cross(fe1, fe2)
            nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=1, keepdims=True), 1e-30)
            d_out = physics.reflect(d, nrm)
            fres = physics.fresnel_bounce_amplitude(physics.bend_angle(d, d_out), 5.0, 1.0)
            o = jnp.where(env_b[:, None], o + d * t_adv[:, None], o)
            d = jnp.where(env_b[:, None], d_out, d)
            amp = jnp.where(env_b, amp * fres, amp)
            dist = dist + t_adv
        return TraceResult(captured=act, amplitude=cap_amp, distance=cap_dist,
                           num_bounces=nb_k)

    def subset_loss_replay(TXK):
        return ir_loss(subset_result_replay(TXK))

    def subset_loss_scan(TXK):
        r = trace_to_rx(scene, TXK, dirs_k, rx, rr, max_bounces=B,
                        rx_mode="analytic", env_hit=env_hit, active=act)
        return ir_loss(r)

    J_r = np.asarray(jax.jit(jax.grad(subset_loss_replay))(TX0))[:K]
    J_s = np.asarray(jax.jit(jax.grad(subset_loss_scan))(TX0))[:K]
    sum_r, sum_s = J_r.sum(0), J_s.sum(0)

    # f64 anchor: the identical subset replay + soft-bin loss in float64 —
    # the per-ray ground truth both f32 paths are compared against. MUST run
    # on CPU: the TPU has no f64 units (first attempt silently produced
    # garbage — every ray's distance collapsed and the loss came out 210x).
    cpu = jax.devices("cpu")[0]
    jax.config.update("jax_enable_x64", True)
    f64 = jnp.float64
    # Host copies pinned to CPU: every array the f64 graph touches must live
    # there or jit would place the computation back on the f64-less TPU.
    bf_np = np.asarray(bf_k)
    nb_np = np.asarray(nb_k)
    act_np = np.asarray(act)
    with jax.default_device(cpu):
        dirs64 = jnp.asarray(np.asarray(dirs_k), f64)
        v064 = jnp.asarray(np.asarray(v0_all), f64)
        e164 = jnp.asarray(np.asarray(e1_all), f64)
        e264 = jnp.asarray(np.asarray(e2_all), f64)
        rx64 = jnp.asarray(np.asarray(rx), f64)
        bf64 = jnp.asarray(bf_np)
        nb64 = jnp.asarray(nb_np)
        act64 = jnp.asarray(act_np)

    def subset_loss64(TXK):
        o = TXK
        d = dirs64
        z = jnp.zeros_like(d[:, 0])
        amp, dist, cap_amp, cap_dist = z + 1.0, z, z, z
        for b in range(B):
            env_b = bf64[b] >= 0
            cap_b = act64 & (nb64 == b)
            t_rx = ray_sphere_hit(o, d, rx64, jnp.asarray(1.0, f64))
            t_rx_safe = jnp.where(cap_b & (t_rx < MISS_THRESHOLD), t_rx, 0.0)
            cap_amp = jnp.where(cap_b, amp, cap_amp)
            cap_dist = jnp.where(cap_b, dist + t_rx_safe, cap_dist)
            f = jnp.clip(bf64[b], 0, None)
            fv0, fe1, fe2 = v064[f], e164[f], e264[f]
            t_env = closed_form_t(o, d, fv0, fe1, fe2)
            t_adv = jnp.where(env_b, t_env, 0.0)
            nrm = jnp.cross(fe1, fe2)
            nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=1, keepdims=True), 1e-30)
            d_out = physics.reflect(d, nrm)
            fres = physics.fresnel_bounce_amplitude(
                physics.bend_angle(d, d_out), 5.0, 1.0)
            o = jnp.where(env_b[:, None], o + d * t_adv[:, None], o)
            d = jnp.where(env_b[:, None], d_out, d)
            amp = jnp.where(env_b, amp * fres, amp)
            dist = dist + t_adv
        # inline f64 soft-binned quadratic IR loss (cir.bin_impulse_response
        # soft semantics, scatter method, amp scaled by tx_power/num_rays)
        delay = cap_dist / 2.998e8 * 100e9
        a = jnp.where(act64, cap_amp, 0.0) / n_rays
        lo = jnp.floor(delay)
        w = delay - lo
        lo_i = lo.astype(jnp.int32)
        vlo = act64 & (lo_i >= 0) & (lo_i < nbins)
        vhi = act64 & (lo_i + 1 >= 0) & (lo_i + 1 < nbins)
        ir = jnp.zeros((nbins,), f64)
        ir = ir.at[jnp.clip(lo_i, 0, nbins - 1)].add(jnp.where(vlo, a * (1 - w), 0.0))
        ir = ir.at[jnp.clip(lo_i + 1, 0, nbins - 1)].add(jnp.where(vhi, a * w, 0.0))
        return jnp.sum(ir * ir) * 1e12

    with jax.default_device(cpu):
        TX64 = jnp.asarray(np.asarray(TX0), f64)
        l64 = float(subset_loss64(TX64))
        l32 = float(subset_loss_replay(TX0))
        assert abs(l64 - l32) < 0.01 * abs(l64), (l64, l32)  # same loss, f64 vs f32
        J64 = np.asarray(jax.grad(subset_loss64)(TX64))[:K]
    jax.config.update("jax_enable_x64", False)

    sum64 = J64.sum(0)
    gross = float(np.abs(J64).sum())
    scale = gross / K  # typical per-ray gradient magnitude
    err_s = np.linalg.norm(J_s - J64, axis=1) / scale
    err_r = np.linalg.norm(J_r - J64, axis=1) / scale

    def q(x):
        return {"p50": round(float(np.median(x)), 5),
                "p99": round(float(np.quantile(x, 0.99)), 5),
                "max": round(float(x.max()), 5)}

    out["per_ray"] = {
        "what": "per-ray tx-gradient decomposition of the soft-IR loss over "
                "the captured set (per-ray TX rows; rows sum to the exact "
                "aggregate). err = |J_f32 - J_f64| / mean|J_f64|.",
        "sum_replay_f32": [float(x) for x in sum_r],
        "sum_scan_f32": [float(x) for x in sum_s],
        "sum_f64_truth": [float(x) for x in sum64],
        "aggregate_fused_vjp": [float(x) for x in g_f],
        "aggregate_scan_vjp": [float(x) for x in g_s],
        "gross_abs_sum_f64": gross,
        "cancellation_factor": [
            round(float(np.abs(J64[:, a]).sum() / max(abs(sum64[a]), 1e-9)), 1)
            for a in range(3)
        ],
        "per_ray_err_scan_vs_f64": q(err_s),
        "per_ray_err_replay_vs_f64": q(err_r),
        "aggregate_err_pct_of_gross": {
            "scan_f32": round(100 * float(np.linalg.norm(g_s - sum64) / gross), 4),
            "fused_vjp_f32": round(100 * float(np.linalg.norm(g_f - sum64) / gross), 4),
            "replay_subset_f32": round(100 * float(np.linalg.norm(sum_r - sum64) / gross), 4),
        },
    }
    dn = np.linalg.norm(J_s - J_r, axis=1)
    top = np.argsort(-dn)[:20]

    # Geometry agreement on the top-disagreeing rays: grazing-angle marker
    # |d.n| per bounce from the replay chain.
    def min_absdotn(i):
        o = np.asarray(tx, np.float64)
        d = np.asarray(dirs_k[i], np.float64)
        m = 1.0
        for b in range(B):
            f = int(bf_k[b, i])
            if f < 0:
                continue
            n = np.cross(np.asarray(e1_all[f]), np.asarray(e2_all[f]))
            n /= max(np.linalg.norm(n), 1e-30)
            m = min(m, abs(float(np.dot(d, n))))
            d = d - 2 * np.dot(d, n) * n
        return m

    out["per_ray"]["top20_min_absdotn"] = round(
        float(np.median([min_absdotn(i) for i in top])), 4)
    all_sample = np.random.default_rng(0).choice(K, size=min(K, 200), replace=False)
    out["per_ray"]["median_min_absdotn"] = round(
        float(np.median([min_absdotn(i) for i in all_sample])), 4)

    with open("GRAD_r05.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
