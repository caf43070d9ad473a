"""Round-4 roofline experiment: scalar cone pre-filter in the fused kernel.

Measures the flagship workload with cone_filter on/off, plus the per-bounce
split with the filter on (compare BOUNCE_SPLIT_r04.json).
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from rfx import sampler
    from rfx.geometry import make_terrain
    from rfx.ops.pallas_fused import make_fused_tracer

    _ = np.asarray(jnp.ones((8, 128)))
    n_rays = 5_242_880
    mesh = make_terrain(grid=128, extent=60.0, seed=0)
    tx = jnp.asarray([10.0, 0.0, 25.0], jnp.float32)
    rx = jnp.asarray([-10.0, 0.0, 8.0], jnp.float32)
    dirs = sampler.morton_sphere_directions(jax.random.PRNGKey(0), n_rays)
    reps = 4

    def measure(ft):
        @jax.jit
        def run(d, t, r):
            s = jnp.float32(0.0)
            for i in range(reps):
                res = ft(d, t + jnp.asarray([0.0, 0.0, 1.0], jnp.float32) * i, r, 1.0)
                s = s + res.distance.sum() + res.captured.sum()
            return s

        s = run(dirs, tx, rx); ref = float(s)
        times = []
        for _i in range(3):
            t0 = time.perf_counter()
            s = run(dirs, tx, rx)
            assert float(s) == ref
            times.append(time.perf_counter() - t0)
        return min(times) / reps * 1e3

    out = {"n_rays": n_rays}
    for cone in (False, True):
        ms = measure(make_fused_tracer(mesh, max_bounces=4, cone_filter=cone))
        out[f"cone_{cone}_ms"] = round(ms, 2)
        out[f"cone_{cone}_mrays"] = round(n_rays / ms * 1e-3, 1)
        print(f"# cone_filter={cone}: {ms:.2f} ms = {n_rays/ms*1e-3:.1f} Mrays/s", flush=True)

    # per-bounce split with the filter on
    split = {}
    for mb in (1, 2, 3, 4):
        ms = measure(make_fused_tracer(mesh, max_bounces=mb, cone_filter=True))
        split[mb] = round(ms, 2)
        print(f"# cone max_bounces={mb}: {ms:.2f} ms", flush=True)
    out["cone_split_ms"] = split
    print(json.dumps(out))
    with open("CONE_r04.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
