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
    out["per_ray"] = {
        "sum_replay_vs_aggregate_fused": [float(x) for x in sum_r],
        "sum_scan_vs_aggregate_scan": [float(x) for x in sum_s],
        "gross_abs_sum": [float(x) for x in np.abs(J_s).sum(0)],
        "net_abs": [float(abs(x)) for x in sum_s],
        "cancellation_factor": [
            round(float(np.abs(J_s[:, a]).sum() / max(abs(sum_s[a]), 1e-9)), 1)
            for a in range(3)
        ],
    }
    dn = np.linalg.norm(J_s - J_r, axis=1)
    mag = np.maximum(np.linalg.norm(J_s, axis=1), 1e-6)
    rel_i = dn / mag
    hist, edges = np.histogram(np.log10(np.maximum(rel_i, 1e-8)),
                               bins=[-8, -6, -5, -4, -3, -2, -1, 0, 2])
    out["per_ray"]["rel_diff_hist_log10_bins"] = [float(e) for e in edges]
    out["per_ray"]["rel_diff_hist"] = [int(h) for h in hist]
    out["per_ray"]["rel_diff_median"] = float(np.median(rel_i))
    out["per_ray"]["rel_diff_p99"] = float(np.quantile(rel_i, 0.99))
    out["per_ray"]["rel_diff_max"] = float(rel_i.max())
    top = np.argsort(-dn)[:20]
    out["per_ray"]["top20_share_of_disagreement"] = round(
        float(dn[top].sum() / max(dn.sum(), 1e-12)), 3)

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
