"""Scaling-efficiency harness: sharded-CIR throughput vs device count.

BASELINE.md's north star asks for >=90% rays/s scaling efficiency at
1 chip / 1 host / >=2 hosts. This box exposes ONE real TPU chip, so the
harness demonstrates the measurement protocol on whatever mesh is available:

  python bench_scaling.py                 # real backend (1 device here)
  RFX_SCALING_CPU=8 python bench_scaling.py   # 8 virtual CPU devices

For a multi-host run, start one process per host with
`rfx.parallel.initialize_multihost(...)` env-configured; the same script then
measures the global mesh. Per-device work is fixed (weak scaling): N rays per
device, so ideal scaling keeps ms/step constant and efficiency is
t(1) / t(d).

Prints one JSON line per device count plus a summary efficiency line.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    if os.environ.get("RFX_SCALING_CPU"):
        import jax

        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={os.environ['RFX_SCALING_CPU']}"
        ).strip()
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from rfx import sampler
    from rfx.geometry import make_room, make_terrain
    from rfx.ops.intersect import make_env_intersector
    from rfx.parallel import make_mesh, sharded_cir
    from rfx.tracer import Scene

    devices = jax.devices()
    on_tpu = devices[0].platform == "tpu"
    if on_tpu:
        # Enter the relay's synchronous mode so timings are honest (see
        # bench.py and the axon quirks memory note).
        _ = np.asarray(jnp.ones((8, 128)))

    rays_per_device = 1_048_576 if on_tpu else 65_536  # compute-dominated shards
    bounces = 4 if on_tpu else 2
    nbins = 20_000 if on_tpu else 2_000

    if on_tpu:
        mesh_obj = make_terrain(grid=128, extent=60.0, seed=0)
        env_hit = make_env_intersector("pallas", mesh=mesh_obj)
    else:
        mesh_obj = make_room()
        env_hit = None
    scene = Scene.from_mesh(mesh_obj)
    tx = jnp.asarray([10.0, 0.0, 25.0] if on_tpu else [3.0, 2.0, 2.0], jnp.float32)
    rx = jnp.asarray([-10.0, 0.0, 8.0] if on_tpu else [-8.0, -5.0, 3.0], jnp.float32)

    counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= len(devices)]
    results = {}
    for nd in counts:
        n = rays_per_device * nd  # weak scaling: fixed work per device
        dirs = sampler.morton_sphere_directions(jax.random.PRNGKey(0), n)
        dmesh = make_mesh({"rays": nd}, devices[:nd])

        if nd == 1 and on_tpu:
            # The axon relay executes shard_map programs ~20-50x slower than
            # the identical plain-jit program even on a one-device mesh (the
            # degenerate psum seems to force per-dispatch syncs), so the
            # single-chip anchor uses the equivalent unsharded pipeline
            # (tests/test_dist.py proves bit-equality of the two paths).
            import jax.numpy as _jnp
            from rfx.cir import cir_from_trace
            from rfx.tracer import trace_to_rx

            @jax.jit
            def _plain(verts, faces, txp, rxp, d):
                res = trace_to_rx(Scene(verts, faces), txp, d, rxp, 1.0,
                                  max_bounces=bounces, rx_mode="analytic",
                                  env_hit=env_hit)
                return cir_from_trace(res, tx_power=1.0, num_rays=n, nbins=nbins,
                                      light_speed_mps=2.998e8,
                                      sample_rate_hz=100e9)

            def run():
                return _plain(scene.vertices, scene.faces, tx, rx, dirs).sum()
        else:
            def run():
                ir = sharded_cir(
                    scene, tx, dirs, rx, 1.0, dmesh,
                    max_bounces=bounces, nbins=nbins, rx_mode="analytic",
                    env_hit=env_hit,
                )
                return ir.sum()

        import resource

        s = run()
        _ = float(s)  # compile + sync
        ts = []
        r0 = resource.getrusage(resource.RUSAGE_SELF)
        for _i in range(3):
            t0 = time.perf_counter()
            s = run()
            _ = float(s)
            ts.append(time.perf_counter() - t0)
        r1 = resource.getrusage(resource.RUSAGE_SELF)
        cpu_s = (r1.ru_utime - r0.ru_utime) + (r1.ru_stime - r0.ru_stime)
        best = min(ts)
        # Host core-seconds per shard-step: on the 2-core CI box every virtual
        # device timeshares the same silicon, so wall-clock "efficiency" is
        # bounded by cores/(d * util_1) no matter how good the sharding is.
        # Constant core-seconds per shard as d grows is the honest signal that
        # the sharded program adds no per-device compute overhead.
        core_s_per_shard = cpu_s / 3 / nd if not on_tpu else None
        results[nd] = (best, core_s_per_shard)
        rec = {
            "devices": nd,
            "rays": n,
            "seconds": round(best, 4),
            "mrays_per_s": round(n / best / 1e6, 2),
        }
        if core_s_per_shard is not None:
            rec["host_core_seconds_per_shard"] = round(core_s_per_shard, 4)
        print(json.dumps(rec))

    if len(results) > 1:
        base, base_core = results[counts[0]]
        for nd in counts[1:]:
            best, core = results[nd]
            rec = {"devices": nd, "weak_scaling_efficiency": round(base / best, 3)}
            if core is not None and base_core:
                # compute efficiency net of host-core timesharing: ratio of
                # per-shard core-seconds (1.0 = sharding adds zero compute)
                rec["core_seconds_efficiency"] = round(base_core / core, 3)
            print(json.dumps(rec))


if __name__ == "__main__":
    main()
