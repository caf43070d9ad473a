"""Validate the restructured FD check: linear-in-trace loss is FD-stable."""
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from rfx.geometry import make_room
from rfx.ops.intersect import make_env_intersector
from rfx.tracer import Scene, trace_to_rx
from oracle import sample_sphere_directions

room = make_room()
scene = Scene.from_mesh(room)
env_hit = make_env_intersector("brute")
dirs = jnp.asarray(sample_sphere_directions(2048, seed=21))
tx0 = jnp.asarray([4.0, 3.0, 6.0], jnp.float32)
rxp = jnp.asarray([-6.0, -4.0, 5.0], jnp.float32)

rng = np.random.default_rng(7)
w = jnp.asarray(rng.normal(size=(2048,)), jnp.float32)
u = jnp.asarray(rng.normal(size=(2048,)), jnp.float32)


@jax.jit
def loss_smooth(txp):
    r = trace_to_rx(
        scene, txp, dirs, rxp, 2.0, max_bounces=2, rx_mode="analytic",
        env_hit=env_hit,
    )
    cap = r.captured.astype(jnp.float32)
    return jnp.sum(cap * (w * r.distance + 10.0 * u * r.amplitude))


l0 = float(loss_smooth(tx0))
g = jax.jit(jax.grad(loss_smooth))(tx0)
print(f"loss0={l0:.6g} grad={np.asarray(g)}")
for eps in (1e-3, 3e-4, 3e-3):
    for a in range(3):
        tp = np.asarray(tx0).copy(); tp[a] += eps
        tm = np.asarray(tx0).copy(); tm[a] -= eps
        fd = (float(loss_smooth(jnp.asarray(tp))) - float(loss_smooth(jnp.asarray(tm)))) / (2 * eps)
        ad = float(g[a])
        ok = abs(ad - fd) < 0.05 * max(abs(fd), abs(ad), 1e-3)
        print(f"eps={eps:g} axis={a}: ad={ad:.6g} fd={fd:.6g} ok={ok}")
