"""Round-3 follow-up sweep around the staged winner (leaf16 k8 pack=False):
vary k_spec and tile_rays with pack=False on the flagship workload."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from rfx import sampler
from rfx.bvh import build_bvh
from rfx.geometry import make_terrain
from rfx.ops.pallas_fused import FusedTracer, fused_trace_planes


def stamp(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


_ = np.asarray(jnp.ones((8, 128)))
stamp("transfer OK")

mesh = make_terrain(grid=128, extent=60.0, seed=0)
tx = jnp.asarray([10.0, 0.0, 25.0], jnp.float32)
rx = jnp.asarray([-10.0, 0.0, 8.0], jnp.float32)
bounces = 4
n_rays = 5_242_880
dirs = sampler.morton_sphere_directions(jax.random.PRNGKey(0), n_rays)
reps = 4
flat16 = build_bvh(mesh, leaf_size=16)


def time_cfg(label, flat, k_spec, pack, tile_rays):
    ft = FusedTracer(flat, max_bounces=bounces, k_spec=k_spec, pack=pack,
                     tile_rays=tile_rays)
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


time_cfg("k4  pack=F tile1024", flat16, 4, False, 1024)
time_cfg("k8  pack=F tile2048", flat16, 8, False, 2048)
time_cfg("k8  pack=F tile512 ", flat16, 8, False, 512)
time_cfg("k16 pack=F tile1024", flat16, 16, False, 1024)
time_cfg("k8  pack=F tile1024", flat16, 8, False, 1024)
stamp("done")
