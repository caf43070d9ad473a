"""Round-3 sweep: leaf size x k_spec on the real flagship workload.

The host walk simulation (exp_sim_walk.py) + device timings put the cost in
the traversal BODY (8 speculative node tests ~1 us, reduces included); drains
are minor (1-6/tile). Bigger leaves shrink the node count (and so the body
count) at the price of more Moller-Trumbore candidates per leaf — this sweep
measures the end-to-end trade on the actual 5.24M-ray x 4-bounce CIR trace.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from rfx import sampler
from rfx.bvh import build_bvh
from rfx.cir import cir_from_trace
from rfx.geometry import make_terrain
from rfx.ops.pallas_trace import make_pallas_env_hit
from rfx.tracer import Scene, trace_to_rx

N = 5_242_880
B = 4
NBINS = 20_000

mesh = make_terrain(grid=128, extent=60.0, seed=0)
scene = Scene.from_mesh(mesh)
tx = jnp.asarray([10.0, 0.0, 25.0], jnp.float32)
rx = jnp.asarray([-10.0, 0.0, 8.0], jnp.float32)
dirs = sampler.morton_sphere_directions(jax.random.PRNGKey(0), N)

_ = np.asarray(jnp.ones((8, 128)))


def timeit4(f, *args, reps=3, inner=2):
    outs = [f(*args) for _ in range(inner)]
    jax.block_until_ready(outs)
    _ = np.asarray(jax.tree_util.tree_leaves(outs)[0]).ravel()[:1]
    ts = []
    for _i in range(reps):
        t0 = time.perf_counter()
        outs = [f(*args) for _ in range(inner)]
        leaf = jax.tree_util.tree_leaves(outs[-1])[0]
        _ = np.asarray(leaf.ravel()[0])
        ts.append((time.perf_counter() - t0) / inner)
    return min(ts), outs[-1]


ref_ir = None
for leaf in (16, 32, 64):
    flat = build_bvh(mesh, leaf_size=leaf)
    for ks in (8, 16):
        env_hit = make_pallas_env_hit(flat, k_spec=ks)

        @jax.jit
        def full_trace(verts, faces, d, env_hit=env_hit):
            res = trace_to_rx(Scene(verts, faces), tx, d, rx, 1.0,
                              max_bounces=B, rx_mode="analytic", env_hit=env_hit)
            ir = cir_from_trace(res, tx_power=1.0, num_rays=N, nbins=NBINS,
                                light_speed_mps=2.998e8, sample_rate_hz=100e9)
            return ir, res.captured.sum()

        dt, (ir, ncap) = timeit4(full_trace, scene.vertices, scene.faces, dirs)
        ir_np = np.asarray(ir)
        if ref_ir is None:
            ref_ir = ir_np
            tag = "(reference)"
        else:
            tag = "IR==ref" if np.allclose(ir_np, ref_ir, rtol=1e-5, atol=1e-12) else "IR MISMATCH!"
        print(
            f"leaf={leaf:3d} k_spec={ks:2d} (nodes {flat.n_nodes:5d}): "
            f"{dt*1e3:8.2f} ms/trace  {N/dt/1e6:6.1f} Mrays/s  cap={int(ncap)}  {tag}",
            flush=True,
        )
