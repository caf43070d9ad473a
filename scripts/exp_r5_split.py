"""Round-5 walk decomposition: regress per-bounce marginal cost against the
measured in-kernel counters (windows, leaf visits, alive tiles).

The arity sweep (ARITY_r05.json) measured 0.233 us/window with a 33.6 ms
fixed part at the flagship workload — so the r03/r04 "~1 us/window, walk is
~95% of trace" model is wrong. This script finds what the fixed part is made
of: per-bounce marginal times (max_bounces=1..4, pipelined reps=4) regressed
on per-bounce windows / leaves / alive-tiles from the count_stats kernel.
"""

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
reps = 4
tile_rays = 1024
sub = tile_rays // 128
tiles = n_rays // tile_rays
dT = dirs.astype(jnp.float32).T.reshape(3, tiles, sub, 128)
scal = jnp.zeros((16,), jnp.float32)
scal = scal.at[0:3].set(tx).at[3:6].set(rx).at[6].set(1.0)
scal = scal.at[7].set(5.0).at[8].set(1.0)

flat = build_bvh(mesh, leaf_size=16, method="numpy")

ms_at_B = {}
for B in (1, 2, 3, 4):
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
    ms_at_B[B] = min(ts) / reps * 1e3
    print(f"B={B}: {ms_at_B[B]:.2f} ms/trace", flush=True)

# Counters at B=4 give the per-bounce regressors.
fts = FusedTracer(flat, max_bounces=4, tile_rays=tile_rays, count_stats=True)
_r, stats = fts(dirs, tx, rx, 1.0)
s_np = np.asarray(stats)
win_b = s_np[:, 0::2].sum(0).astype(float)
leaf_b = s_np[:, 1::2].sum(0).astype(float)
tiles_b = (s_np[:, 0::2] > 0).sum(0).astype(float)
print("windows/bounce", win_b.tolist())
print("leaves/bounce", leaf_b.tolist())
print("alive tiles/bounce", tiles_b.tolist())

marg = np.array([ms_at_B[1], ms_at_B[2] - ms_at_B[1], ms_at_B[3] - ms_at_B[2],
                 ms_at_B[4] - ms_at_B[3]])
# bounce-0 marginal also carries the dispatch+spawn fixed cost: model
# marg_b = w*win_b + l*leaf_b + f*tiles_b + (c0 if b==0)
A = np.stack([win_b, leaf_b, tiles_b, np.array([1.0, 0, 0, 0])], axis=1)
coef, res, *_ = np.linalg.lstsq(A, marg, rcond=None)
out = {
    "ms_at_B": {str(k): round(v, 2) for k, v in ms_at_B.items()},
    "marginal_ms": [round(float(m), 2) for m in marg],
    "windows_per_bounce": win_b.tolist(),
    "leaves_per_bounce": leaf_b.tolist(),
    "alive_tiles_per_bounce": tiles_b.tolist(),
    "fit": {
        "us_per_window": round(float(coef[0]) * 1e3, 4),
        "us_per_leaf_visit": round(float(coef[1]) * 1e3, 4),
        "us_per_alive_tile_bounce": round(float(coef[2]) * 1e3, 4),
        "dispatch_fixed_ms": round(float(coef[3]), 3),
    },
    "note": "exactly-determined 4x4 solve; interpret with the arity sweep's "
            "independent 0.233 us/window estimate as a cross-check",
}
print(json.dumps(out["fit"]), flush=True)
with open("/tmp/exp_r5_split.json", "w") as f:
    json.dump(out, f, indent=1)
