"""TPU sharded-vs-plain point (round-3 VERDICT #7): cached sharded_cir on a
1-device TPU mesh vs plain jit of the same CIR, on real hardware. Writes
SCALING_r04.json (copies SCALING_r03's CPU-mesh data + adds the TPU row).
"""
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
    from rfx.parallel import make_mesh, sharded_cir
    from rfx.tracer import Scene, trace_to_rx

    _ = np.asarray(jnp.ones((8, 128)))

    n_rays = 1_048_576
    max_bounces = 4
    nbins = 20_000
    mesh_geo = make_terrain(grid=128, extent=60.0, seed=0)
    scene = Scene.from_mesh(mesh_geo)
    env_hit = make_env_intersector("pallas", mesh=mesh_geo)
    tx = jnp.asarray([10.0, 0.0, 25.0], jnp.float32)
    rx = jnp.asarray([-10.0, 0.0, 8.0], jnp.float32)
    dirs = sampler.morton_sphere_directions(jax.random.PRNGKey(0), n_rays)
    dmesh = make_mesh({"rays": 1})

    @jax.jit
    def plain(vertices, faces, txp, rxp, d):
        r = trace_to_rx(Scene(vertices, faces), txp, d, rxp, 1.0,
                        max_bounces=max_bounces, rx_mode="analytic",
                        env_hit=env_hit)
        return cir_from_trace(r, tx_power=1.0, num_rays=n_rays, nbins=nbins,
                              light_speed_mps=2.998e8, sample_rate_hz=100e9)

    def sharded():
        return sharded_cir(scene, tx, dirs, rx, 1.0, dmesh,
                           max_bounces=max_bounces, nbins=nbins, env_hit=env_hit)

    def timeit(fn, reps=5):
        r = fn(); _ = float(jnp.asarray(r).sum())  # compile + sync
        ts = []
        for _i in range(reps):
            t0 = time.perf_counter()
            r = fn()
            _ = float(jnp.asarray(r).sum())
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_plain = timeit(lambda: plain(scene.vertices, scene.faces, tx, rx, dirs))
    t_shard = timeit(sharded)
    ir_p = np.asarray(plain(scene.vertices, scene.faces, tx, rx, dirs))
    ir_s = np.asarray(sharded())
    bit_identical = bool(np.array_equal(ir_p, ir_s))

    point = {
        "backend": str(jax.devices()[0].platform),
        "device": str(jax.devices()[0]),
        "rays": n_rays, "bounces": max_bounces, "nbins": nbins,
        "plain_jit_seconds": round(t_plain, 4),
        "sharded_1dev_seconds": round(t_shard, 4),
        "sharded_overhead_pct": round(100.0 * (t_shard / t_plain - 1.0), 1),
        "ir_bit_identical": bit_identical,
    }
    print(json.dumps(point))

    with open("SCALING_r04.json") as f:
        base = json.load(f)
    base["tpu_sharded_point"] = point
    base["harness"] = base["harness"] + " + scripts/tpu_sharded_point.py (round 4: real-TPU row)"
    with open("SCALING_r05.json", "w") as f:
        json.dump(base, f, indent=1)


if __name__ == "__main__":
    main()
