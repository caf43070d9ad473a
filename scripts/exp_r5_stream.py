"""Round-5 streaming-path attribution (VERDICT r4 next #3).

The 1M-tri streaming trace ran at 15.45 Mrays/s vs ~100 at 32k (r4) with no
per-phase split. Three measurements here:

1. 1M-tri counter trace: windows + leaf visits per bounce (count_stats).
2. DMA cost isolation: the SAME 32k-tri mesh built at leaf=128, traced with
   force_stream=True vs False — identical tree, identical walk and drains,
   the only difference is the per-drain HBM->VMEM DMA (+ the lane-padded
   128-wide triangle loads). The delta per leaf visit prices the DMA.
3. Native-SAH build time at 1M tris (build_bvh auto now selects the C++
   builder above 100k tris).
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
from rfx.ops.pallas_trace import PALLAS_BLOCK

_ = np.asarray(jnp.ones((8, 128)))
out = {}

tx = jnp.asarray([10.0, 0.0, 30.0], jnp.float32)
rx = jnp.asarray([-15.0, 5.0, 12.0], jnp.float32)
n_rays = 5_242_880
dirs = sampler.morton_sphere_directions(jax.random.PRNGKey(0), n_rays)
tile_rays = 1024
sub = tile_rays // 128
tiles = n_rays // tile_rays
dT = dirs.astype(jnp.float32).T.reshape(3, tiles, sub, 128)


def scal_for(txv, rxv, rr):
    s = jnp.zeros((16,), jnp.float32)
    s = s.at[0:3].set(txv).at[3:6].set(rxv).at[6].set(rr * rr)
    return s.at[7].set(5.0).at[8].set(1.0)


def time_tracer(ft, scal, reps=2):
    @jax.jit
    def run(arrays, dT, scal):
        s = jnp.float32(0.0)
        for i in range(reps):
            sc = scal.at[2].add(jnp.float32(i))
            outs = fused_trace_planes(
                arrays[0], arrays[1], arrays[2], dT, sc,
                sub=sub, leaf=ft.leaf, max_bounces=4,
                stream=ft.stream, k_spec=ft.k_spec)
            s = s + outs[1].sum() + outs[0].sum()
        return s

    arrays = ft.arrays()
    _ = float(run(arrays, dT, scal))
    ts = []
    for _i in range(3):
        t0 = time.perf_counter()
        _ = float(run(arrays, dT, scal))
        ts.append(time.perf_counter() - t0)
    return min(ts) / reps


# ---- leg 2 first (small mesh, fast): DMA isolation at leaf=128 ----
mesh32 = make_terrain(grid=128, extent=60.0, seed=0)
tx32 = jnp.asarray([10.0, 0.0, 25.0], jnp.float32)
rx32 = jnp.asarray([-10.0, 0.0, 8.0], jnp.float32)
flat128 = build_bvh(mesh32, leaf_size=PALLAS_BLOCK, method="numpy")
res = {}
for stream in (False, True):
    ft = FusedTracer(flat128, max_bounces=4, tile_rays=tile_rays,
                     force_stream=stream)
    ms = time_tracer(ft, scal_for(tx32, rx32, 1.0)) * 1e3
    res["stream" if stream else "resident"] = round(ms, 2)
    print(f"32k-tri leaf128 stream={stream}: {ms:.2f} ms", flush=True)
# counters (stream layout; same tree/walk either way)
fts = FusedTracer(flat128, max_bounces=4, tile_rays=tile_rays,
                  force_stream=True, count_stats=True)
_r, stats = fts(dirs, tx32, rx32, 1.0)
s32 = np.asarray(stats)
res["windows_per_bounce"] = s32[:, 0::2].sum(0).tolist()
res["leaves_per_bounce"] = s32[:, 1::2].sum(0).tolist()
leaves32 = float(s32[:, 1::2].sum())
res["dma_us_per_leaf"] = round((res["stream"] - res["resident"]) / leaves32 * 1e3, 3)
out["leaf128_dma_isolation"] = res
print(json.dumps(res), flush=True)

# ---- leg 3: 1M-tri native build ----
t0 = time.perf_counter()
mesh1m = make_terrain(grid=724, extent=120.0, seed=0)
t_gen = time.perf_counter() - t0
t0 = time.perf_counter()
flat1m = build_bvh(mesh1m, leaf_size=PALLAS_BLOCK)  # auto -> native SAH
t_build = time.perf_counter() - t0
out["build_1m"] = {"triangles": int(mesh1m.num_faces),
                   "gen_seconds": round(t_gen, 2),
                   "bvh_build_seconds": round(t_build, 2),
                   "nodes": int(flat1m.n_nodes)}
print(json.dumps(out["build_1m"]), flush=True)

# ---- leg 1: 1M-tri trace timing + counters ----
ft1 = FusedTracer(flat1m, max_bounces=4, tile_rays=tile_rays)
assert ft1.stream
ms1 = time_tracer(ft1, scal_for(tx, rx, 2.0)) * 1e3
fts1 = FusedTracer(flat1m, max_bounces=4, tile_rays=tile_rays, count_stats=True)
_r, stats1 = fts1(dirs, tx, rx, 2.0)
s1m = np.asarray(stats1)
win_b = s1m[:, 0::2].sum(0)
leaf_b = s1m[:, 1::2].sum(0)
tiles_b = (s1m[:, 0::2] > 0).sum(0)
out["trace_1m"] = {
    "ms_per_trace": round(ms1, 2),
    "mrays": round(n_rays / ms1 / 1e3, 2),
    "windows_per_bounce": win_b.tolist(),
    "leaves_per_bounce": leaf_b.tolist(),
    "alive_tiles_per_bounce": tiles_b.tolist(),
}
# Attribution using the flagship-calibrated constants: 0.233 us/window
# (ARITY_r05 fit) + measured DMA delta per leaf + resident-drain share.
win_ms = float(win_b.sum()) * 0.233e-3
dma_ms = float(leaf_b.sum()) * out["leaf128_dma_isolation"]["dma_us_per_leaf"] * 1e-3
out["trace_1m"]["attribution"] = {
    "windows_ms_at_0.233us": round(win_ms, 2),
    "dma_ms_at_measured_delta": round(dma_ms, 2),
    "residual_ms_drains_fold_fixed": round(ms1 - win_ms - dma_ms, 2),
}
print(json.dumps(out["trace_1m"]), flush=True)
with open("/tmp/exp_r5_stream.json", "w") as f:
    json.dump(out, f, indent=1)
