"""Round-3 experiment: fused megakernel compiled-on-TPU parity + throughput.

Parity: 64k rays x 4 bounces vs the scan-path tracer (same tolerance as
tests/test_fused.py). Throughput: the flagship bench workload (5.24M rays x 4
bounces, terrain 32k tris) through the fused kernel, timed with the same
relay-sync protocol as bench.py.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from rfx import sampler
from rfx.geometry import make_terrain
from rfx.ops.intersect import make_env_intersector
from rfx.ops.pallas_fused import make_fused_tracer
from rfx.tracer import Scene, trace_to_rx

_ = np.asarray(jnp.ones((8, 128)))  # enter relay sync mode

# --- parity at 64k rays -----------------------------------------------------
mesh = make_terrain(grid=128, extent=60.0, seed=0)
scene = Scene.from_mesh(mesh)
tx = jnp.asarray([10.0, 0.0, 25.0], jnp.float32)
rx = jnp.asarray([-10.0, 0.0, 8.0], jnp.float32)
bounces = 4

n_small = 65536
dirs_s = sampler.morton_sphere_directions(jax.random.PRNGKey(0), n_small)
env_hit = make_env_intersector("pallas", mesh=mesh)
ref = trace_to_rx(scene, tx, dirs_s, rx, 1.0, max_bounces=bounces,
                  rx_mode="analytic", env_hit=env_hit)
ft = make_fused_tracer(mesh, max_bounces=bounces)
out = ft(dirs_s, tx, rx, 1.0)
ref_c = np.asarray(ref.captured)
out_c = np.asarray(out.captured)
print(f"parity: ref captured {ref_c.sum()}, fused captured {out_c.sum()}", flush=True)
assert (ref_c == out_c).all(), f"capture mismatch: {np.sum(ref_c != out_c)} rays"
assert (np.asarray(ref.num_bounces) == np.asarray(out.num_bounces)).all()
m = ref_c
assert np.allclose(np.asarray(ref.amplitude)[m], np.asarray(out.amplitude)[m],
                   rtol=2e-5, atol=1e-7)
assert np.allclose(np.asarray(ref.distance)[m], np.asarray(out.distance)[m],
                   rtol=1e-5, atol=1e-4)
print("parity OK (compiled TPU, 64k rays x 4 bounces)", flush=True)

# --- throughput at flagship scale --------------------------------------------
n_rays = 5_242_880
dirs = sampler.morton_sphere_directions(jax.random.PRNGKey(0), n_rays)

reps = 4

@jax.jit
def run(dT, scal):
    from rfx.ops.pallas_fused import fused_trace_planes
    s = jnp.float32(0.0)
    nc = jnp.int32(0)
    for i in range(reps):
        sc = scal.at[2].add(jnp.float32(i))
        capt, capa, capd, nb = fused_trace_planes(
            ft.nodef, ft.nodei, ft.trif, dT, sc,
            sub=ft.tile_rays // 128, leaf=ft.leaf, max_bounces=bounces,
            stream=ft.stream, k_spec=ft.k_spec)
        s = s + capa.sum()
        nc = nc + capt.sum()
    return s, nc

sub = ft.tile_rays // 128
tiles = n_rays // ft.tile_rays
dT = dirs.astype(jnp.float32).T.reshape(3, tiles, sub, 128)
scal = jnp.zeros((16,), jnp.float32)
scal = scal.at[0:3].set(tx).at[3:6].set(rx).at[6].set(1.0)
scal = scal.at[7].set(5.0).at[8].set(1.0)

s, nc = run(dT, scal)
print(f"warmup: sum={float(s):.4f} ncap={int(nc)}", flush=True)

times = []
for _ in range(3):
    t0 = time.perf_counter()
    s, nc = run(dT, scal)
    _ = float(s)
    times.append(time.perf_counter() - t0)
best = min(times) / reps
print(f"fused: {n_rays/best/1e6:.2f} Mrays/s  (best {best*1e3:.1f} ms/trace, times {[f'{t*1e3:.0f}' for t in times]})", flush=True)
