"""Sweep BVH leaf size for the fused megakernel on the flagship workload.

Rationale: the fused walk is reduce-latency-bound (~125 ns per node test
round-trip) while leaf drains amortize over the whole tile (~1.5 us per
128-triangle drain against 1024 rays). A bigger leaf halves the node count
(fewer reduces) at the cost of more MT work — the old per-query sweep
preferred leaf=16, but the fused kernel's cost balance differs.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from rfx import sampler
from rfx.bvh import build_bvh
from rfx.geometry import make_terrain
from rfx.ops.pallas_fused import FusedTracer, fused_trace_planes

_ = np.asarray(jnp.ones((8, 128)))

mesh = make_terrain(grid=128, extent=60.0, seed=0)
tx = jnp.asarray([10.0, 0.0, 25.0], jnp.float32)
rx = jnp.asarray([-10.0, 0.0, 8.0], jnp.float32)
bounces = 4
n_rays = 5_242_880
dirs = sampler.morton_sphere_directions(jax.random.PRNGKey(0), n_rays)
reps = 4

for leaf in (16, 32, 64):
    for k_spec in (4, 8):
        flat = build_bvh(mesh, leaf_size=leaf)
        ft = FusedTracer(flat, max_bounces=bounces, k_spec=k_spec)
        sub = ft.tile_rays // 128
        tiles = n_rays // ft.tile_rays
        dT = dirs.astype(jnp.float32).T.reshape(3, tiles, sub, 128)
        scal = jnp.zeros((16,), jnp.float32)
        scal = scal.at[0:3].set(tx).at[3:6].set(rx).at[6].set(1.0)
        scal = scal.at[7].set(5.0).at[8].set(1.0)

        @jax.jit
        def run(dT, scal, _ft=ft, _sub=sub):
            s = jnp.float32(0.0)
            for i in range(reps):
                sc = scal.at[2].add(jnp.float32(i))
                capt, capa, capd, nb = fused_trace_planes(
                    _ft.nodef, _ft.nodei, _ft.trif, dT, sc,
                    sub=_sub, leaf=_ft.leaf, max_bounces=bounces,
                    stream=_ft.stream, k_spec=_ft.k_spec)
                s = s + capa.sum() + capt.sum()
            return s

        s = run(dT, scal)
        _ = float(s)
        times = []
        for _i in range(3):
            t0 = time.perf_counter()
            s = run(dT, scal)
            _ = float(s)
            times.append(time.perf_counter() - t0)
        best = min(times) / reps
        print(f"leaf={leaf:3d} k={k_spec:2d} nodes={flat.n_nodes:5d}: "
              f"{n_rays/best/1e6:7.2f} Mrays/s ({best*1e3:.1f} ms/trace)",
              flush=True)
