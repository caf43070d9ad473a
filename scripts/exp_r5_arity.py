"""Round-5 sweep: n-ary BVH collapse for the fused walk, + measured windows.

VERDICT r4 next #1: the revised roofline says the scalar core driving the
tile-uniform walk is the bound (~1 us per 8-node speculative window), and
windows scale with nodes visited. Collapsing the binary SAH tree to arity
4/8/16 (rfx.bvh.collapse_bvh) cuts the node count ~33-45%; this script
measures, on the flagship workload (bench.py: terrain 32k tris, 5.24M rays x
4 bounces):

  - end-to-end trace throughput per arity (pipelined reps=4)
  - in-kernel window + leaf-visit counters per arity (count_stats=True)

The (windows, time) pairs across arities also give a *measured* per-window
cost — the counter-based roofline the bench JSON should carry (VERDICT #2).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from rfx import sampler
from rfx.bvh import build_bvh, collapse_bvh
from rfx.geometry import make_terrain
from rfx.ops.pallas_fused import FusedTracer, fused_trace_planes

_ = np.asarray(jnp.ones((8, 128)))  # enter relay sync mode

mesh = make_terrain(grid=128, extent=60.0, seed=0)
tx = jnp.asarray([10.0, 0.0, 25.0], jnp.float32)
rx = jnp.asarray([-10.0, 0.0, 8.0], jnp.float32)
bounces = 4
n_rays = 5_242_880
dirs = sampler.morton_sphere_directions(jax.random.PRNGKey(0), n_rays)
reps = 4
tile_rays = 1024

flat_bin = build_bvh(mesh, leaf_size=16, method="numpy")
out = {"arities": []}

for arity in (2, 4, 8, 16):
    flat = collapse_bvh(flat_bin, arity)
    ft = FusedTracer(flat, max_bounces=bounces, tile_rays=tile_rays)
    sub = tile_rays // 128
    tiles = n_rays // tile_rays
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
        _ = float(run(dT, scal))
        times.append(time.perf_counter() - t0)
    best = min(times) / reps

    # Counter pass (instrumented kernel, separate timing not recorded).
    fts = FusedTracer(flat, max_bounces=bounces, tile_rays=tile_rays,
                      count_stats=True)
    _r, stats = fts(dirs, tx, rx, 1.0)
    s_np = np.asarray(stats)
    win_b = s_np[:, 0::2].sum(0)
    leaf_b = s_np[:, 1::2].sum(0)
    rec = {
        "arity": arity,
        "n_nodes": flat.n_nodes,
        "depth": flat.max_depth(),
        "mrays": round(n_rays / best / 1e6, 2),
        "ms_per_trace": round(best * 1e3, 2),
        "windows_per_bounce": win_b.tolist(),
        "leaves_per_bounce": leaf_b.tolist(),
        "windows_total": int(win_b.sum()),
        "leaves_total": int(leaf_b.sum()),
    }
    out["arities"].append(rec)
    print(json.dumps(rec), flush=True)

# Linear fit t = a + b*windows + c*leaves over the arity points (leaves are
# ~constant across arities so the fit is effectively t vs windows).
ts = np.array([r["ms_per_trace"] for r in out["arities"]])
ws = np.array([r["windows_total"] for r in out["arities"]], dtype=np.float64)
ls = np.array([r["leaves_total"] for r in out["arities"]], dtype=np.float64)
A = np.stack([np.ones_like(ws), ws], axis=1)
coef, *_ = np.linalg.lstsq(A, ts, rcond=None)
out["fit"] = {
    "fixed_ms": round(float(coef[0]), 3),
    "us_per_window": round(float(coef[1]) * 1e3, 4),
    "note": "t_trace[ms] ~= fixed + us_per_window * windows_total / 1000",
}
print(json.dumps(out["fit"]), flush=True)
with open("/tmp/exp_r5_arity.json", "w") as f:
    json.dump(out, f, indent=1)
