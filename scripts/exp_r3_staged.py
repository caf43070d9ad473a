"""Round-3 staged TPU experiment: pack-compile canary -> flagship A/B -> leaf sweep.

Prints progress line by line so a relay wedge mid-run still leaves evidence of
the last good stage. Run detached; do not kill mid-compile (see memory:
axon-relay-fragility).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from rfx import sampler
from rfx.bvh import build_bvh
from rfx.geometry import make_terrain
from rfx.ops.pallas_fused import FusedTracer, make_fused_tracer, fused_trace_planes

def stamp(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)

_ = np.asarray(jnp.ones((8, 128)))
stamp("stage 0: transfer OK")

small = make_terrain(grid=16, extent=30.0, seed=3)
dirs_s = sampler.morton_sphere_directions(jax.random.PRNGKey(4), 2048)
txs = jnp.asarray([2.0, 1.0, 9.0], jnp.float32)
rxs = jnp.asarray([-5.0, 2.0, 6.0], jnp.float32)

t0 = time.perf_counter()
ft_nopack = make_fused_tracer(small, max_bounces=3, pack=False)
o1 = ft_nopack(dirs_s, txs, rxs, 1.0)
c1 = int(o1.captured.sum())
stamp(f"stage 1: fused pack=False small compile+run {time.perf_counter()-t0:.1f}s captured {c1}")

t0 = time.perf_counter()
ft_pack = make_fused_tracer(small, max_bounces=3, pack=True)
o2 = ft_pack(dirs_s, txs, rxs, 1.0)
c2 = int(o2.captured.sum())
assert (np.asarray(o1.captured) == np.asarray(o2.captured)).all()
stamp(f"stage 2: fused pack=True small compile+run {time.perf_counter()-t0:.1f}s captured {c2} (parity OK)")

# --- flagship A/B ---
mesh = make_terrain(grid=128, extent=60.0, seed=0)
tx = jnp.asarray([10.0, 0.0, 25.0], jnp.float32)
rx = jnp.asarray([-10.0, 0.0, 8.0], jnp.float32)
bounces = 4
n_rays = 5_242_880
dirs = sampler.morton_sphere_directions(jax.random.PRNGKey(0), n_rays)
reps = 4

def time_cfg(label, flat, k_spec, pack):
    ft = FusedTracer(flat, max_bounces=bounces, k_spec=k_spec, pack=pack)
    sub = ft.tile_rays // 128
    tiles = n_rays // ft.tile_rays
    dT = dirs.astype(jnp.float32).T.reshape(3, tiles, sub, 128)
    scal = jnp.zeros((16,), jnp.float32)
    scal = scal.at[0:3].set(tx).at[3:6].set(rx).at[6].set(1.0)
    scal = scal.at[7].set(5.0).at[8].set(1.0)

    @jax.jit
    def run(dT, scal):
        s = jnp.float32(0.0)
        for i in range(reps):
            sc = scal.at[2].add(jnp.float32(i))
            capt, capa, capd, nb = fused_trace_planes(
                ft.nodef, ft.nodei, ft.trif, dT, sc,
                sub=sub, leaf=ft.leaf, max_bounces=bounces,
                stream=ft.stream, k_spec=ft.k_spec, pack=ft.pack)
            s = s + capa.sum() + capt.sum()
        return s

    s = run(dT, scal); _ = float(s)
    ts = []
    for _i in range(3):
        t0 = time.perf_counter(); s = run(dT, scal); _ = float(s)
        ts.append(time.perf_counter() - t0)
    best = min(ts) / reps
    stamp(f"{label}: {n_rays/best/1e6:7.2f} Mrays/s ({best*1e3:.1f} ms/trace)")
    return best

flat16 = build_bvh(mesh, leaf_size=16)
time_cfg("stage 3: flagship leaf16 k8 pack=False", flat16, 8, False)
time_cfg("stage 4: flagship leaf16 k8 pack=True ", flat16, 8, True)
time_cfg("stage 5: flagship leaf16 k16 pack=True", flat16, 16, True)

flat32 = build_bvh(mesh, leaf_size=32)
time_cfg("stage 6: flagship leaf32 k8 pack=True ", flat32, 8, True)
flat64 = build_bvh(mesh, leaf_size=64)
time_cfg("stage 7: flagship leaf64 k8 pack=True ", flat64, 8, True)
stamp("done")
