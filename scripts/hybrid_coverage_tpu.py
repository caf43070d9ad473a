"""Hybrid coverage metric at reference scale on TPU (round-3 VERDICT #5 done
condition: max error <= ~1 dB at 2048 receivers with <2x slowdown vs
pure-fast).

Same workload as scripts/coverage_exact_tpu.py (2048 receivers, 1M rays,
2 bounces, room scene). Writes HYBRID_r04.json with the hybrid-vs-exact error
distribution, flag fraction, and timing vs the pure-fast path.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from rfx import sampler
    from rfx.coverage import (
        coverage_dbm_fast, coverage_dbm_hybrid, coverage_irs, make_grid,
    )
    from rfx.cir import rx_power_dbm
    from rfx.geometry import make_room
    from rfx.tracer import Scene

    _ = np.asarray(jnp.ones((8, 128)))

    scene = Scene.from_mesh(make_room())
    grid = jnp.asarray(make_grid(range(-15, 16, 2), range(-15, 16, 2), range(0, 16, 2)))
    n_rays = 1_048_576
    dirs = sampler.morton_sphere_directions(jax.random.PRNGKey(0), n_rays)
    tx = jnp.asarray([3.0, 2.0, 2.0], jnp.float32)
    window = 100e-9
    rate = 100e9
    nbins = int(window * rate)
    kw = dict(max_bounces=2, num_rays=n_rays, sample_window_s=window,
              sample_rate_hz=rate, rx_batch=8)

    # ground truth: exact metric (batched Pallas engine)
    irs = coverage_irs(scene, tx, dirs, grid, 0.5, max_bounces=2, nbins=nbins,
                       num_rays=n_rays, sample_rate_hz=rate, rx_batch=8)
    exact, _ = rx_power_dbm(irs, window)
    exact = np.asarray(exact)

    fast = np.asarray(coverage_dbm_fast(scene, tx, dirs, grid, 0.5, **kw))
    t0 = time.perf_counter()
    fast = np.asarray(coverage_dbm_fast(scene, tx, dirs, grid, 0.5, **kw))
    t_fast = time.perf_counter() - t0

    hybrid, n_flagged = coverage_dbm_hybrid(scene, tx, dirs, grid, 0.5, **kw)
    t0 = time.perf_counter()
    hybrid, n_flagged = coverage_dbm_hybrid(scene, tx, dirs, grid, 0.5, **kw)
    t_hybrid = time.perf_counter() - t0

    ok = np.isfinite(exact)
    e_fast = np.abs(fast[ok] - exact[ok])
    e_hyb = np.abs(hybrid[ok] - exact[ok])
    out = {
        "receivers": int(grid.shape[0]),
        "rays": n_rays,
        "fast_seconds_warm": round(t_fast, 2),
        "hybrid_seconds_warm": round(t_hybrid, 2),
        "hybrid_slowdown_vs_fast": round(t_hybrid / t_fast, 2),
        "n_flagged": int(n_flagged),
        "fast_err_dB": {"median": round(float(np.median(e_fast)), 3),
                        "p95": round(float(np.percentile(e_fast, 95)), 3),
                        "max": round(float(e_fast.max()), 3)},
        "hybrid_err_dB": {"median": round(float(np.median(e_hyb)), 3),
                          "p95": round(float(np.percentile(e_hyb, 95)), 3),
                          "max": round(float(e_hyb.max()), 3)},
    }
    print(json.dumps(out))
    with open("HYBRID_r04.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
