"""Round-5 flagship re-sweep after the partial-flush + dead-reduce fixes:
the r3 tile/k_spec optimum (1024/8) was measured with the old padded-flush
drain economics; re-check 512/1024/2048 x k_spec 4/8."""

import json
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
n_rays = 5_242_880
dirs = sampler.morton_sphere_directions(jax.random.PRNGKey(0), n_rays)
flat = build_bvh(mesh, leaf_size=16, method="numpy")
out = {}
for tile_rays in (512, 1024, 2048):
    for k_spec in (4, 8):
        sub = tile_rays // 128
        tiles = n_rays // tile_rays
        dT = dirs.astype(jnp.float32).T.reshape(3, tiles, sub, 128)
        scal = jnp.zeros((16,), jnp.float32)
        scal = scal.at[0:3].set(tx).at[3:6].set(rx).at[6].set(1.0)
        scal = scal.at[7].set(5.0).at[8].set(1.0)
        ft = FusedTracer(flat, max_bounces=4, tile_rays=tile_rays, k_spec=k_spec)

        @jax.jit
        def run(dT, scal, _ft=ft, _sub=sub):
            s = jnp.float32(0.0)
            for i in range(4):
                sc = scal.at[2].add(jnp.float32(i))
                o = fused_trace_planes(
                    _ft.nodef, _ft.nodei, _ft.trif, dT, sc,
                    sub=_sub, leaf=_ft.leaf, max_bounces=4,
                    stream=False, k_spec=k_spec)
                s = s + o[1].sum() + o[0].sum()
            return s

        _ = float(run(dT, scal))
        ts = []
        for _i in range(3):
            t0 = time.perf_counter()
            _ = float(run(dT, scal))
            ts.append(time.perf_counter() - t0)
        ms = min(ts) / 4 * 1e3
        key = f"t{tile_rays}_k{k_spec}"
        out[key] = {"ms": round(ms, 2), "mrays": round(n_rays / ms / 1e3, 2)}
        print(key, json.dumps(out[key]), flush=True)
with open("/tmp/exp_r5_flagship_sweep.json", "w") as f:
    json.dump(out, f, indent=1)
