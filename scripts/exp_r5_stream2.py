"""Round-5 streaming leaf-size A/B at 1M tris: leaf128 (r4 layout) vs
leaf64+arity4 (finer streamed leaves, collapsed tree to fit SMEM)."""

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

tx = jnp.asarray([10.0, 0.0, 30.0], jnp.float32)
rx = jnp.asarray([-15.0, 5.0, 12.0], jnp.float32)
n_rays = 5_242_880
dirs = sampler.morton_sphere_directions(jax.random.PRNGKey(0), n_rays)
tile_rays = 1024  # overridden per variant below
sub = tile_rays // 128
tiles = n_rays // tile_rays
dT = dirs.astype(jnp.float32).T.reshape(3, tiles, sub, 128)
scal = jnp.zeros((16,), jnp.float32)
scal = scal.at[0:3].set(tx).at[3:6].set(rx).at[6].set(4.0)
scal = scal.at[7].set(5.0).at[8].set(1.0)

mesh = make_terrain(grid=724, extent=120.0, seed=0)
out = {}
base_capt = None
for name, leaf, arity in (("t256", 128, 2), ("t128", 128, 2)):
    tile_rays = int(name[1:])
    sub = tile_rays // 128
    tiles = n_rays // tile_rays
    dT = dirs.astype(jnp.float32).T.reshape(3, tiles, sub, 128)
    t0 = time.perf_counter()
    flat = build_bvh(mesh, leaf_size=leaf, arity=arity)
    t_b = time.perf_counter() - t0
    try:
        ft = FusedTracer(flat, max_bounces=4, tile_rays=tile_rays,
                         force_stream=True)

        @jax.jit
        def run(arrays, dT, scal, _ft=ft):
            s = jnp.float32(0.0)
            c = jnp.int32(0)
            for i in range(2):
                sc = scal.at[2].add(jnp.float32(i))
                o = fused_trace_planes(
                    arrays[0], arrays[1], arrays[2], dT, sc,
                    sub=sub, leaf=_ft.leaf, max_bounces=4,
                    stream=True, k_spec=_ft.k_spec)
                s = s + o[1].sum()
                c = c + o[0].sum()
            return s, c

        arrays = ft.arrays()
        s, c = run(arrays, dT, scal)
        _ = float(s)
        capt = int(c) // 2
        if base_capt is None:
            base_capt = capt
        ts = []
        for _i in range(3):
            t0 = time.perf_counter()
            s, c = run(arrays, dT, scal)
            _ = float(s)
            ts.append(time.perf_counter() - t0)
        ms = min(ts) / 2 * 1e3
        out[name] = {"nodes": int(flat.n_nodes), "build_s": round(t_b, 2),
                     "ms": round(ms, 2), "mrays": round(n_rays / ms / 1e3, 2),
                     "captured": capt}
    except Exception as e:  # SMEM overflow etc.
        out[name] = {"nodes": int(flat.n_nodes), "error": str(e)[:200]}
    print(name, json.dumps(out[name]), flush=True)

assert all("error" in v or v["captured"] == base_capt for v in out.values()), out
with open("/tmp/exp_r5_stream2.json", "w") as f:
    json.dump(out, f, indent=1)
