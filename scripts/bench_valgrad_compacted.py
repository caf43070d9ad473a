"""Round-5 captured-subset-backward valgrad timing (GRAD_r05
"fused_valgrad_compacted_bwd" entry): appends the measured number to
GRAD_r05.json. Usage: python scripts/bench_valgrad_compacted.py on TPU."""
import json, time
import jax, jax.numpy as jnp, numpy as np
from rfx import sampler
from rfx.cir import cir_from_trace
from rfx.geometry import make_terrain
from rfx.ops.pallas_fused import make_diff_fused_tracer
from rfx.tracer import Scene

_ = np.asarray(jnp.ones((8, 128)))
n_rays = 2_621_440
B = 4
mesh = make_terrain(grid=128, extent=60.0, seed=0)
scene = Scene.from_mesh(mesh)
tx = jnp.asarray([10.0, 0.0, 25.0], jnp.float32)
rx = jnp.asarray([-10.0, 0.0, 8.0], jnp.float32)
dirs = sampler.morton_sphere_directions(jax.random.PRNGKey(0), n_rays)
dt = make_diff_fused_tracer(mesh, scene.faces, max_bounces=B)

def ir_loss(result):
    ir = cir_from_trace(result, tx_power=1.0, num_rays=n_rays, nbins=20000,
                        light_speed_mps=2.998e8, sample_rate_hz=100e9, soft=True)
    return jnp.sum(ir * ir) * 1e12

f = jax.jit(jax.value_and_grad(lambda t: ir_loss(dt(scene.vertices, t, dirs, rx, jnp.float32(1.0)))))
v, g = f(tx); _ = float(v)
print('grad (compacted bwd):', np.asarray(g))
ts = []
for _i in range(3):
    t0 = time.perf_counter(); v, g = f(tx); _ = float(v); ts.append(time.perf_counter() - t0)
best = min(ts)
print(f'fused_valgrad_compacted: {best*1e3:.1f} ms = {n_rays/best/1e6:.2f} Mrays/s')
d = json.load(open('GRAD_r05.json'))
d['fused_valgrad_compacted_bwd'] = {'seconds': round(best, 4), 'mrays_per_s': round(n_rays/best/1e6, 2),
    'grad': [float(x) for x in np.asarray(g)],
    'what': 'round-5 captured-subset backward (bwd_max_captured nonzero-compaction)'}
json.dump(d, open('GRAD_r05.json', 'w'), indent=1)
