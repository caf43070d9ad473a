"""Exact-metric coverage at reference scale on TPU (VERDICT.md #8).

Runs the reference coverage workload (2048 receivers on the [-15,15]^2 x
[0,14] grid, 1M rays, 2 bounces — ref coverage.py:12-16,38-40) through the
EXACT path (per-receiver 20k-bin IR -> convolution dBm, ref coverage.py:45-55),
not the phasor fast path. Writes examples/coverage_exact_dbm.npy and prints
timing + exact-vs-fast deltas. The per-receiver scatter-add that made this
path cost ~38 s in round 1 is now an MXU histogram (rfx.cir._bincount_matmul).
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from rfx import sampler
    from rfx.coverage import coverage_dbm_fast, coverage_irs, make_grid
    from rfx.cir import rx_power_dbm
    from rfx.geometry import make_room
    from rfx.tracer import Scene

    _ = np.asarray(jnp.ones((8, 128)))

    scene_mesh = make_room()
    scene = Scene.from_mesh(scene_mesh)
    grid = jnp.asarray(make_grid(range(-15, 16, 2), range(-15, 16, 2), range(0, 16, 2)))
    n_rays = 1_048_576
    dirs = sampler.morton_sphere_directions(jax.random.PRNGKey(0), n_rays)
    tx = jnp.asarray([3.0, 2.0, 2.0], jnp.float32)
    window = 100e-9  # ref coverage.py:13
    rate = 100e9
    nbins = int(window * rate)

    def run_exact():
        irs = coverage_irs(
            scene, tx, dirs, grid, 0.5,
            max_bounces=2, nbins=nbins, num_rays=n_rays, sample_rate_hz=rate,
            rx_batch=8,
        )
        dbm, _ = rx_power_dbm(irs, window)
        return np.asarray(dbm)

    t0 = time.perf_counter()
    dbm_exact = run_exact()
    t_exact = time.perf_counter() - t0  # includes compile
    t0 = time.perf_counter()
    dbm_exact = run_exact()
    t_exact_warm = time.perf_counter() - t0

    def run_fast():
        return np.asarray(coverage_dbm_fast(
            scene, tx, dirs, grid, 0.5,
            max_bounces=2, num_rays=n_rays, sample_window_s=window, sample_rate_hz=rate,
            rx_batch=8,
        ))

    t0 = time.perf_counter()
    dbm_fast = run_fast()
    t_fast = time.perf_counter() - t0
    t0 = time.perf_counter()
    dbm_fast = run_fast()
    t_fast_warm = time.perf_counter() - t0

    finite = np.isfinite(dbm_exact) & np.isfinite(dbm_fast)
    delta = np.abs(dbm_exact[finite] - dbm_fast[finite])
    out = np.concatenate([np.asarray(grid), dbm_exact[:, None]], axis=1).astype(np.float32)
    np.save("examples/coverage_exact_dbm.npy", out)
    payload = {
        "receivers": int(grid.shape[0]),
        "rays": n_rays,
        "exact_seconds": round(t_exact, 2),
        "exact_seconds_warm": round(t_exact_warm, 2),
        "fast_seconds": round(t_fast, 2),
        "fast_seconds_warm": round(t_fast_warm, 2),
        "reached": int(finite.sum()),
        "exact_dbm_range": [float(np.nanmin(dbm_exact[finite])), float(np.nanmax(dbm_exact[finite]))],
        "exact_vs_fast_dB": {"median": round(float(np.median(delta)), 3),
                              "p95": round(float(np.percentile(delta, 95)), 3),
                              "max": round(float(delta.max()), 3)},
    }
    print(json.dumps(payload))
    with open("COVERAGE_EXACT_r05.json", "w") as f:
        json.dump(payload, f)


if __name__ == "__main__":
    main()
