"""Round-5: decompose the fused valgrad's 210 ms (12.5 Mrays/s vs 43 forward)
into components: record-forward kernel, replay forward, replay VJP, and the
soft-IR loss VJP. (The vertex-scatter hypothesis was measured FALSE:
grad_args=('tx_pos',) changed nothing — exp_r5_grad.py.)"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from rfx import sampler
from rfx.cir import cir_from_trace
from rfx.geometry import make_terrain
from rfx.ops.pallas_fused import make_fused_tracer, replay_from_faces
from rfx.tracer import Scene, TraceResult

_ = np.asarray(jnp.ones((8, 128)))

n_rays = 2_621_440
B = 4
nbins = 20_000
mesh = make_terrain(grid=128, extent=60.0, seed=0)
scene = Scene.from_mesh(mesh)
tx = jnp.asarray([10.0, 0.0, 25.0], jnp.float32)
rx = jnp.asarray([-10.0, 0.0, 8.0], jnp.float32)
rr = jnp.float32(1.0)
dirs = sampler.morton_sphere_directions(jax.random.PRNGKey(0), n_rays)
ft = make_fused_tracer(mesh, max_bounces=B)


def ir_loss(result):
    ir = cir_from_trace(result, tx_power=1.0, num_rays=n_rays, nbins=nbins,
                        light_speed_mps=2.998e8, sample_rate_hz=100e9, soft=True)
    return jnp.sum(ir * ir) * 1e12


def timed(name, fn, *args):
    r = fn(*args)
    _ = float(jax.tree_util.tree_leaves(r)[0].sum())
    ts = []
    for _i in range(3):
        t0 = time.perf_counter()
        r = fn(*args)
        _ = float(jax.tree_util.tree_leaves(r)[0].sum())
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1e3:.1f} ms", flush=True)
    return min(ts), r


out = {}
# 1. plain forward (no record)
f_plain = jax.jit(lambda d: ft(d, tx, rx, rr).amplitude)
out["fwd_plain_ms"], _ = timed("fwd_plain", f_plain, dirs)
# 2. record forward
f_rec = jax.jit(lambda d: ft(d, tx, rx, rr, record_faces=True))
t, (res, bf) = timed("fwd_record", f_rec, dirs)
out["fwd_record_ms"] = t
res = TraceResult(captured=jnp.asarray(np.asarray(res.captured)),
                  amplitude=jnp.asarray(np.asarray(res.amplitude)),
                  distance=jnp.asarray(np.asarray(res.distance)),
                  num_bounces=jnp.asarray(np.asarray(res.num_bounces)))
bf = jnp.asarray(np.asarray(bf))
# 3. replay forward from the record
f_rep = jax.jit(lambda t_: replay_from_faces(
    scene.vertices, scene.faces, t_, dirs, rx, rr, bf,
    jnp.asarray(res.captured), jnp.asarray(res.num_bounces)))
out["replay_fwd_ms"], _ = timed("replay_fwd", f_rep, tx)
# 4. replay valgrad (loss = soft IR energy of replayed amp/dist)


def replay_loss(t_):
    a, d_ = replay_from_faces(scene.vertices, scene.faces, t_, dirs, rx, rr,
                              bf, jnp.asarray(res.captured),
                              jnp.asarray(res.num_bounces))
    return ir_loss(TraceResult(captured=jnp.asarray(res.captured), amplitude=a,
                               distance=d_, num_bounces=jnp.asarray(res.num_bounces)))


f_rvg = jax.jit(jax.value_and_grad(replay_loss))
out["replay_valgrad_ms"], _ = timed("replay_valgrad", f_rvg, tx)
# 5. loss-only valgrad wrt (amp, dist) — the cir soft-binning VJP cost


def loss_only(a, d_):
    return ir_loss(TraceResult(captured=jnp.asarray(res.captured), amplitude=a,
                               distance=d_, num_bounces=jnp.asarray(res.num_bounces)))


f_lvg = jax.jit(jax.value_and_grad(loss_only, argnums=(0, 1)))
out["cir_valgrad_ms"], _ = timed("cir_valgrad", f_lvg, res.amplitude, res.distance)
out["note"] = ("fused full valgrad ~210 ms (GRAD_r05). Components: "
               "fwd_record + replay_valgrad ~ expected total; the gap vs the "
               "sum is XLA fusion/glue.")
print(json.dumps(out))
with open("/tmp/exp_r5_gradprof.json", "w") as f:
    json.dump(out, f, indent=1)
