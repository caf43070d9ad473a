"""Round-5: measure the partial-flush-drain fix on the flagship workload.

Before (r4): the flush padded every drain to a full 128-candidate MT block by
duplicating leaves — ~1.3 us of padding waste per tile-bounce at bounce 0
(5120 tiles, ~2.2 pending leaves each). After: binary-sized partial drains
(64/32/16 candidate rows). Prints the pipelined (reps=4) and per-B timings to
compare against /tmp/split.log's pre-fix numbers (B=1: 20.66, B=2: 41.96,
B=3: 52.30, B=4: 58.21 ms).
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
n_rays = 5_242_880
dirs = sampler.morton_sphere_directions(jax.random.PRNGKey(0), n_rays)
reps = 4
tile_rays = 1024
sub = tile_rays // 128
tiles = n_rays // tile_rays
dT = dirs.astype(jnp.float32).T.reshape(3, tiles, sub, 128)
scal = jnp.zeros((16,), jnp.float32)
scal = scal.at[0:3].set(tx).at[3:6].set(rx).at[6].set(1.0)
scal = scal.at[7].set(5.0).at[8].set(1.0)

flat = build_bvh(mesh, leaf_size=16, method="numpy")

for B in (1, 4):
    ft = FusedTracer(flat, max_bounces=B, tile_rays=tile_rays)

    @jax.jit
    def run(dT, scal, _ft=ft, _B=B):
        s = jnp.float32(0.0)
        for i in range(reps):
            sc = scal.at[2].add(jnp.float32(i))
            capt, capa, capd, nb = fused_trace_planes(
                _ft.nodef, _ft.nodei, _ft.trif, dT, sc,
                sub=sub, leaf=_ft.leaf, max_bounces=_B,
                stream=_ft.stream, k_spec=_ft.k_spec)
            s = s + capa.sum() + capt.sum()
        return s

    _ = float(run(dT, scal))
    ts = []
    for _i in range(3):
        t0 = time.perf_counter()
        _ = float(run(dT, scal))
        ts.append(time.perf_counter() - t0)
    best = min(ts) / reps
    print(f"B={B}: {best*1e3:.2f} ms/trace  ({n_rays/best/1e6:.2f} Mrays/s)",
          flush=True)
