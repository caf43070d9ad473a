"""Round-5 fine tile sweep verification: 1280 vs 1024 interleaved (PROFILE_r05
"tile_1280" entry; also ran 1152/1408/1536 one-shot — see the committed logs
in that artifact). Usage: python scripts/exp_r5_tile_fine.py on TPU."""
import time
import jax, jax.numpy as jnp, numpy as np
from rfx import sampler
from rfx.bvh import build_bvh
from rfx.geometry import make_terrain
from rfx.ops.pallas_fused import FusedTracer, fused_trace_planes

_ = np.asarray(jnp.ones((8, 128)))
n_rays = 5_242_880
dirs = sampler.morton_sphere_directions(jax.random.PRNGKey(0), n_rays)
mesh = make_terrain(grid=128, extent=60.0, seed=0)
flat = build_bvh(mesh, leaf_size=16, method="numpy")
tx = jnp.asarray([10.0, 0.0, 25.0], jnp.float32)
rx = jnp.asarray([-10.0, 0.0, 8.0], jnp.float32)
scal = jnp.zeros((16,), jnp.float32).at[0:3].set(tx).at[3:6].set(rx).at[6].set(1.0).at[7].set(5.0).at[8].set(1.0)

caps = {}
for rounds in range(2):  # interleave to cancel drift
    for tr in (1024, 1280):
        sub = tr // 128
        tiles = n_rays // tr
        dT = dirs.astype(jnp.float32).T.reshape(3, tiles, sub, 128)
        ft = FusedTracer(flat, max_bounces=4, tile_rays=tr)

        @jax.jit
        def run(arrays, dT, scal, _ft=ft, _sub=sub):
            s = jnp.float32(0.0)
            c = jnp.int32(0)
            for i in range(4):
                sc = scal.at[2].add(jnp.float32(i))
                o = fused_trace_planes(arrays[0], arrays[1], arrays[2], dT, sc,
                                       sub=_sub, leaf=_ft.leaf, max_bounces=4,
                                       stream=False, k_spec=_ft.k_spec)
                s = s + o[1].sum(); c = c + o[0].sum()
            return s, c
        arrays = ft.arrays()
        s, c = run(arrays, dT, scal); _ = float(s)
        caps[tr] = int(c)
        ts = []
        for _i in range(4):
            t0 = time.perf_counter(); s, c = run(arrays, dT, scal); _ = float(s); ts.append(time.perf_counter() - t0)
        print(f"round {rounds} tile {tr}: min {min(ts)/4*1e3:.2f} ms  all {[round(t/4*1e3,1) for t in ts]}", flush=True)
print("captured:", caps)
