"""Find the per-ray discontinuity that breaks the tx-grad FD check."""
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from rfx.cir import cir_from_trace
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


@jax.jit
def trace(txp):
    return trace_to_rx(
        scene, txp, dirs, rxp, 2.0, max_bounces=2, rx_mode="analytic",
        env_hit=env_hit,
    )


@jax.jit
def loss_tx(txp):
    r = trace(txp)
    ir = cir_from_trace(
        r, tx_power=5.0, num_rays=dirs.shape[0], nbins=512,
        light_speed_mps=2.998e8, sample_rate_hz=10e9, soft=True,
    )
    return jnp.sum(ir * ir) * 1e12


# fine scan of loss along axis 0
eps_list = np.linspace(-2e-3, 2e-3, 41)
losses = []
for e in eps_list:
    t = np.asarray(tx0).copy(); t[0] += e
    losses.append(float(loss_tx(jnp.asarray(t))))
losses = np.array(losses)
for e, l in zip(eps_list, losses):
    print(f"  dx={e:+.5f}  loss={l:.7g}")

# per-ray distance/amplitude jumps between +-1e-3 on axis 0
tp = np.asarray(tx0).copy(); tp[0] += 1e-3
tm = np.asarray(tx0).copy(); tm[0] -= 1e-3
rp = trace(jnp.asarray(tp)); rm = trace(jnp.asarray(tm))
cap = np.asarray(rp.captured) & np.asarray(rm.captured)
dd = np.abs(np.asarray(rp.distance) - np.asarray(rm.distance))
da = np.abs(np.asarray(rp.amplitude) - np.asarray(rm.amplitude))
idx = np.where(cap)[0]
order = np.argsort(-dd[idx])
print("\ncaptured rays sorted by |d_dist| across 2e-3 tx move:")
for i in idx[order][:10]:
    print(f"  ray {i}: ddist={dd[i]:.5g} damp={da[i]:.5g} "
          f"dist={float(rp.distance[i]):.4f} amp={float(rp.amplitude[i]):.5g} "
          f"nb={int(rp.num_bounces[i])}")
