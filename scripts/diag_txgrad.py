"""Diagnose the failing compiled tx-gradient FD check (VERDICT r3 #1).

Runs the identical loss_tx graph from tests/test_tpu_compiled.py on CPU with
the brute intersector, checking:
  a) does the captured set flip between tx0 +/- eps per axis?
  b) AD vs FD agreement on CPU (rules the compiled-TPU lowering in or out)
  c) eps sweep
"""
import sys

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


l0 = float(loss_tx(tx0))
g = jax.jit(jax.grad(loss_tx))(tx0)
print(f"loss0={l0:.6g} grad={np.asarray(g)}")

cap0 = np.asarray(trace(tx0).captured)
print(f"captured at tx0: {cap0.sum()}")

for eps in (1e-3, 1e-4, 3e-4, 3e-3, 1e-2):
    for a in range(3):
        tp = np.asarray(tx0).copy(); tp[a] += eps
        tm = np.asarray(tx0).copy(); tm[a] -= eps
        rp = trace(jnp.asarray(tp))
        rm = trace(jnp.asarray(tm))
        capp = np.asarray(rp.captured); capm = np.asarray(rm.captured)
        nflip = int((capp != capm).sum())
        nbounce_flip = int(
            (np.asarray(rp.num_bounces)[capp & capm]
             != np.asarray(rm.num_bounces)[capp & capm]).sum())
        lp = float(loss_tx(jnp.asarray(tp))); lm = float(loss_tx(jnp.asarray(tm)))
        fd = (lp - lm) / (2 * eps)
        ad = float(g[a])
        ok = abs(ad - fd) < 0.08 * max(abs(fd), abs(ad), 1e-3)
        print(f"eps={eps:g} axis={a}: ad={ad:.5g} fd={fd:.5g} ok={ok} "
              f"capture_flips={nflip} bounce_flips={nbounce_flip}")
