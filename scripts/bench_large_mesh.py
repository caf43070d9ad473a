"""Large-mesh hardware proof: >=1M-triangle terrain through the HBM-streaming
Pallas path, compiled on the real TPU (round-2 VERDICT missing #3; round-5
VERDICT next #3: native SAH build, counter-based attribution, tile-512
streaming default).

The reference's flagship scene is the apollo_17 landing-site terrain scan
(ref main.py:21), a large STL missing from the mirror (SURVEY.md C10); the
stand-in is a 724x724 procedural crater field = 1,045,458 triangles — the
same size class. Beyond STREAM_TRI_THRESHOLD the kernel keeps triangle
blocks in HBM and DMAs one (128, 128) block per pending leaf (leaf = 128),
so this run exercises that path end-to-end, compiled.

Outputs LARGEMESH_r05.json:
  - subsample parity: streaming-TPU query vs the independent jnp BVH
    traversal on CPU (16k rays), plus capture-level trace agreement
  - multi-bounce end-to-end Mrays/s on the 5.24M-ray x 4-bounce CIR workload
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from rfx import sampler
    from rfx.bvh import build_bvh
    from rfx.cir import cir_from_trace
    from rfx.geometry import make_terrain
    from rfx.ops.intersect import is_hit, mesh_soa
    from rfx.ops.pallas_trace import PALLAS_BLOCK, make_pallas_env_hit
    from rfx.ops.bvh_traverse import make_bvh_env_hit
    from rfx.tracer import Scene

    _ = np.asarray(jnp.ones((8, 128)))
    out = {}

    t0 = time.perf_counter()
    mesh = make_terrain(grid=724, extent=120.0, seed=0)
    out["triangles"] = int(mesh.num_faces)
    t_mesh = time.perf_counter() - t0

    t0 = time.perf_counter()
    flat = build_bvh(mesh, leaf_size=PALLAS_BLOCK)
    out["bvh_build_seconds"] = round(time.perf_counter() - t0, 2)
    out["bvh_nodes"] = int(flat.n_nodes)
    out["padded_tris"] = int(flat.n_padded_tris)

    env_hit = make_pallas_env_hit(flat)  # auto-selects streaming at this size
    from rfx.ops.pallas_trace import STREAM_TRI_THRESHOLD, _PallasBVH  # noqa: F401

    assert flat.n_padded_tris > STREAM_TRI_THRESHOLD, "not actually streaming-sized"
    out["streaming"] = True

    scene = Scene.from_mesh(mesh)
    v0, e1, e2, normals = mesh_soa(scene.vertices, scene.faces)
    tx = jnp.asarray([10.0, 0.0, 30.0], jnp.float32)
    rx = jnp.asarray([-15.0, 5.0, 12.0], jnp.float32)

    # ---- parity: 16k-ray subsample, streaming TPU vs jnp BVH walk on CPU ----
    # No outer jit: the inner pallas jit receives the BVH arrays as runtime
    # ARGUMENTS; an outer jit would close over them as constants, and at this
    # mesh size the AOT compile payload then exceeds the relay's request
    # limit (HTTP 413).
    n_par = 16384
    dirs_par = sampler.morton_sphere_directions(jax.random.PRNGKey(7), n_par)
    o_par = jnp.broadcast_to(tx, (n_par, 3))
    tp, fp, _n = env_hit(o_par, dirs_par, v0, e1, e2, normals)
    tp = np.asarray(tp)
    fp = np.asarray(fp)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        bvh_hit = make_bvh_env_hit(build_bvh(mesh))  # independent leaf-16 SAH tree
        vc, ec1, ec2, nc = mesh_soa(jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces))
        tc, fc, _ = jax.jit(lambda o, d: bvh_hit(o, d, vc, ec1, ec2, nc))(
            jax.device_put(o_par, cpu), jax.device_put(dirs_par, cpu)
        )
        tc = np.asarray(tc)
        fc = np.asarray(fc)

    hit_c = tc < 1e29
    hit_p = tp < 1e29
    mask_mism = int((hit_c != hit_p).sum())
    both = hit_c & hit_p
    t_ok = np.allclose(tp[both], tc[both], rtol=1e-4, atol=1e-3)
    f_mism = int((fp[both] != fc[both]).sum())
    # f32 ties between abutting terrain triangles may pick either face; t must
    # still agree wherever faces differ.
    out["parity_16k"] = {
        "hits": int(hit_c.sum()),
        "hit_mask_mismatch": mask_mism,
        "t_allclose": bool(t_ok),
        "face_mismatch": f_mism,
    }
    assert mask_mism <= n_par // 2000, f"hit-mask mismatch {mask_mism}"
    assert t_ok, "t mismatch vs jnp BVH reference"
    assert f_mism <= max(4, int(both.sum()) // 1000), f"face mismatch {f_mism}"

    # ---- end-to-end multi-bounce throughput ----
    n_rays = 5_242_880
    max_bounces = 4
    nbins = 20_000
    dirs = sampler.morton_sphere_directions(jax.random.PRNGKey(0), n_rays)

    reps = 2  # traces per dispatch (compile memory stays bounded)

    # ---- fused megakernel through the HBM-streaming layout (flagship) ----
    # The BVH arrays ride the jit's ARGUMENTS (FusedTracer.arrays()) so the
    # compile payload stays bounded; see the parity-leg comment.
    from rfx.ops.pallas_fused import FusedTracer

    ft = FusedTracer(flat, max_bounces=max_bounces)
    assert ft.stream, "fused tracer did not select streaming at this size"

    @jax.jit
    def run_fused(arrays, directions, tx_pos, rx_pos):
        s = jnp.float32(0.0)
        ncap = jnp.int32(0)
        for i in range(reps):
            txi = tx_pos + jnp.asarray([0.0, 0.0, 1.0], jnp.float32) * i
            r = ft(directions, txi, rx_pos, 2.0, arrays=arrays)
            ir = cir_from_trace(
                r, tx_power=1.0, num_rays=n_rays, nbins=nbins,
                light_speed_mps=2.998e8, sample_rate_hz=100e9,
            )
            s = s + ir.sum()
            ncap = ncap + r.captured.sum()
        return s, ncap

    arrays = ft.arrays()
    s, ncap_f = run_fused(arrays, dirs, tx, rx)
    assert float(s) > 0 and int(ncap_f) > 0, "fused large-mesh trace captured nothing"
    out["fused_captured"] = int(ncap_f)
    out["rays"] = n_rays
    out["bounces"] = max_bounces
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        s, _nc = run_fused(arrays, dirs, tx, rx)
        _ = float(s)
        times.append(time.perf_counter() - t0)
    best_f = min(times) / reps
    out["fused_seconds_per_trace"] = round(best_f, 4)
    out["fused_mrays_per_s"] = round(n_rays / best_f / 1e6, 2)
    out["tile_rays"] = ft.tile_rays

    # ---- counter-based attribution (round-5 VERDICT #3: no more unexplained
    # 6.5x gap). Constants: 0.233 us/window (ARITY_r05 cross-arity fit),
    # 0.28 us DMA delta per leaf visit (exp_r5_stream.py stream-vs-resident
    # isolation on an identical tree); the remainder is the 128-candidate
    # batched-MT drain work, VPU-issue-bound (the SMEM node-table budget
    # forces leaf=128 at this mesh size: a 27.8k-node leaf-64 table already
    # fails to compile, measured).
    fts = FusedTracer(flat, max_bounces=max_bounces, count_stats=True)
    _rs, wstats = fts(dirs, tx, rx, 2.0, arrays=arrays)
    wstats = np.asarray(wstats)
    win_total = int(wstats[:, 0::2].sum())
    leaf_total = int(wstats[:, 1::2].sum())
    win_ms = win_total * 0.233e-3
    dma_ms = leaf_total * 0.28e-3
    out["walk_counters"] = {
        "windows_per_bounce": wstats[:, 0::2].sum(0).tolist(),
        "leaf_visits_per_bounce": wstats[:, 1::2].sum(0).tolist(),
        "attribution_ms": {
            "windows": round(win_ms, 1),
            "dma": round(dma_ms, 1),
            "drains_fold_fixed": round(best_f * 1e3 - win_ms - dma_ms, 1),
        },
        "negative_results": [
            "per-row alive gating of drains: -20% end-to-end (branch overhead)",
            "leaf<128 streamed tables exceed the ~850KB SMEM budget at 1M tris",
            "tile 1024/2048: 344/587 ms vs 276 at 512 (exp_r5_stream2)",
        ],
    }

    # ---- per-query cross-check at reduced scale (capture-level agreement) ---
    # An eager per-bounce loop over the directly-called per-query intersector
    # (same capture rule as rfx.tracer.trace_to_rx's scan step): the scan path
    # itself cannot be outer-jitted at this mesh size (its closure bakes the
    # BVH arrays into the compile payload -> relay HTTP 413), and
    # jax.closure_convert does not hoist concrete constants.
    from rfx.ops.intersect import ray_sphere_hit, is_hit

    n_small = 1_048_576
    dirs_small = dirs[:n_small]
    pos = jnp.broadcast_to(tx, (n_small, 3))
    d = dirs_small
    alive = jnp.ones((n_small,), bool)
    captured = jnp.zeros((n_small,), bool)
    dist = jnp.zeros((n_small,), jnp.float32)
    capd = jnp.zeros((n_small,), jnp.float32)
    for _b in range(max_bounces):
        t_rxq = ray_sphere_hit(pos, d, rx, 2.0)
        t_env, face, nrm = env_hit(pos, d, v0, e1, e2, normals)
        rx_win = alive & is_hit(t_rxq) & (t_env > t_rxq)
        env_b = alive & ~rx_win & is_hit(t_env)
        captured = captured | rx_win
        capd = jnp.where(rx_win, dist + t_rxq, capd)
        t_adv = jnp.where(env_b, t_env, 0.0)
        pos = jnp.where(env_b[:, None], pos + d * t_adv[:, None], jnp.float32(1e9))
        d_out = d - 2.0 * jnp.sum(d * nrm, axis=1, keepdims=True) * nrm
        d = jnp.where(env_b[:, None], d_out, d)
        dist = dist + t_adv
        alive = env_b
    ncap_s = int(captured.sum())
    dsum_s = float(jnp.where(captured, capd, 0.0).sum())
    r_f = ft(dirs_small, tx, rx, 2.0)
    ncap_fs = int(r_f.captured.sum())
    dsum_fs = float(jnp.where(r_f.captured, r_f.distance, 0.0).sum())
    out["perquery_vs_fused_1M"] = {
        "perquery_captured": ncap_s,
        "fused_captured": ncap_fs,
        "perquery_dist_sum": round(dsum_s, 2),
        "fused_dist_sum": round(dsum_fs, 2),
    }
    assert abs(ncap_s - ncap_fs) <= max(4, ncap_s // 200), (
        f"fused vs per-query capture divergence: {ncap_fs} vs {ncap_s}"
    )

    with open("LARGEMESH_r05.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
