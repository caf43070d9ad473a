"""Round-4: per-bounce cost split of the FUSED kernel on the flagship workload.

Runs the fused tracer at max_bounces = 1..4 on the same 5.24M-ray terrain
workload; successive differences attribute wall-clock to each bounce level
(the early-exit while_loop means dead tiles skip later bounces, so the diffs
are the true marginal cost). Informs where the round-4 roofline work goes
(scalar proxy node tests for the coherent bounce-0 walk vs divergent-tile
work at bounce 1+).
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

    out = {"n_rays": n_rays, "per_max_bounces_ms": {}}
    reps = 4
    for mb in (1, 2, 3, 4):
        ft = make_fused_tracer(mesh, max_bounces=mb)

        @jax.jit
        def run(d, t, r):
            s = jnp.float32(0.0)
            for i in range(reps):
                res = ft(d, t + jnp.asarray([0.0, 0.0, 1.0], jnp.float32) * i, r, 1.0)
                s = s + res.distance.sum() + res.captured.sum()
            return s

        s = run(dirs, tx, rx); _ = float(s)  # compile+warm
        times = []
        for _i in range(3):
            t0 = time.perf_counter()
            s = run(dirs, tx, rx)
            _ = float(s)
            times.append(time.perf_counter() - t0)
        ms = min(times) / reps * 1e3
        out["per_max_bounces_ms"][mb] = round(ms, 2)
        print(f"# max_bounces={mb}: {ms:.2f} ms/trace", flush=True)

    ms = out["per_max_bounces_ms"]
    out["marginal_ms"] = {
        "bounce0": ms[1],
        "bounce1": round(ms[2] - ms[1], 2),
        "bounce2": round(ms[3] - ms[2], 2),
        "bounce3": round(ms[4] - ms[3], 2),
    }
    out["mrays_per_s_4b"] = round(n_rays / ms[4] * 1e-3, 1)
    print(json.dumps(out))
    with open("BOUNCE_SPLIT_r04.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
