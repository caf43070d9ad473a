"""Headline benchmark: Mrays/s for a full multi-bounce CIR trace on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload mirrors the reference's primary entry point (ref main.py:15-21:
5M rays x 4 bounces, terrain scene, 20000-bin IR). The reference publishes no
numbers (BASELINE.md); vs_baseline is measured against an assumed 100 Mrays/s
for the Warp reference on a modern NVIDIA GPU — a deliberately generous
estimate, documented here so the ratio is interpretable.

Scene selection: the apollo_17 terrain stand-in (procedural crater field,
SURVEY.md C10 notes the original STL is a missing blob) once a large-mesh
backend (BVH/Pallas) is available; otherwise the 44-triangle room with the
brute-force intersector.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_EST_MRAYS = 100.0


def main():
    import jax
    import jax.numpy as jnp

    from rfx import sampler
    from rfx.cir import cir_from_trace
    from rfx.geometry import load_stl, make_room, make_terrain
    from rfx.ops.intersect import make_env_intersector
    from rfx.tracer import Scene, trace_to_rx

    n_rays = 5_000_000
    max_bounces = 4
    nbins = 20_000

    # Prefer the large terrain once an accelerated backend exists.
    try:
        from rfx.ops.bvh_backend import available as bvh_available
    except ImportError:
        bvh_available = lambda: False

    if bvh_available():
        mesh = make_terrain(grid=128, extent=60.0, seed=0)
        env_hit = make_env_intersector("bvh", mesh=mesh)
        scene_name = "terrain(32k tris)"
    else:
        try:
            mesh = load_stl("/root/reference/models/room.stl")
        except (OSError, ValueError):
            mesh = make_room()
        env_hit = make_env_intersector("brute")
        scene_name = f"room({mesh.num_faces} tris)"

    scene = Scene.from_mesh(mesh)
    tx = jnp.asarray([10.0, 0.0, 5.0], jnp.float32)
    rx = jnp.asarray([-10.0, 0.0, 5.0], jnp.float32)
    key = jax.random.PRNGKey(0)
    dirs = sampler.sphere_directions(key, n_rays)

    @jax.jit
    def run(vertices, faces, tx_pos, rx_pos, directions):
        result = trace_to_rx(
            Scene(vertices, faces), tx_pos, directions, rx_pos, 0.1,
            max_bounces=max_bounces, rx_mode="analytic", env_hit=env_hit,
        )
        ir = cir_from_trace(
            result, tx_power=1.0, num_rays=n_rays, nbins=nbins,
            light_speed_mps=2.998e8, sample_rate_hz=100e9,
        )
        return ir, result.captured.sum()

    # Warm-up compile.
    ir, ncap = run(scene.vertices, scene.faces, tx, rx, dirs)
    jax.block_until_ready(ir)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        ir, ncap = run(scene.vertices, scene.faces, tx, rx, dirs)
        jax.block_until_ready(ir)
        times.append(time.perf_counter() - t0)

    best = min(times)
    mrays = n_rays / best / 1e6
    print(
        json.dumps(
            {
                "metric": f"CIR trace throughput ({scene_name}, {max_bounces} bounces, {n_rays} rays)",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / REFERENCE_EST_MRAYS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
