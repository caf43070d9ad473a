"""Attribute the non-traversal ~38 ms of the flagship trace: rx sphere query,
physics, 20k-bin scatter-add, scan plumbing."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from rfx import physics, sampler
from rfx.cir import bin_impulse_response
from rfx.geometry import make_terrain
from rfx.ops.intersect import ray_sphere_hit
from rfx.tracer import Scene, trace_to_rx
from rfx.ops.intersect import make_env_intersector

N = 5_242_880
INNER = 8
_ = np.asarray(jnp.ones((8, 128)))

key = jax.random.PRNGKey(0)
dirs = sampler.morton_sphere_directions(key, N)
o = jnp.broadcast_to(jnp.asarray([10.0, 0.0, 25.0], jnp.float32), (N, 3))
rx = jnp.asarray([-10.0, 0.0, 8.0], jnp.float32)
amp = jax.random.uniform(key, (N,))
dist = jax.random.uniform(key, (N,), minval=0.0, maxval=500.0)
cap = amp > 0.99


def timeit(f, *args):
    s = f(*args); _ = float(s)
    ts = []
    for _i in range(3):
        t0 = time.perf_counter(); s = f(*args); _ = float(s)
        ts.append(time.perf_counter() - t0)
    return (min(ts) - 0.026) / INNER  # subtract relay sync


@jax.jit
def f_rx(o, d):
    s = jnp.float32(0.0)
    for i in range(INNER):
        t = ray_sphere_hit(o + s * 1e-12, d, rx, 1.0)
        s = s + t.min() * 0
    return s


@jax.jit
def f_scatter(a, di, c):
    s = jnp.float32(0.0)
    for i in range(INNER):
        ir = bin_impulse_response(a + s, di, c, nbins=20_000,
                                  light_speed_mps=2.998e8, sample_rate_hz=100e9)
        s = s + ir.sum() * 0
    return s


@jax.jit
def f_physics(d, nrm):
    s = jnp.float32(0.0)
    for i in range(INNER):
        d2 = physics.reflect(d + s, nrm)
        fres = physics.fresnel_bounce_amplitude(physics.bend_angle(d, d2), 5.0, 1.0)
        s = s + fres.min() * 0
    return s


print(f"rx sphere query (x1):  {timeit(f_rx, o, dirs)*1e3:7.2f} ms")
print(f"20k-bin scatter (x1):  {timeit(f_scatter, amp, dist, cap)*1e3:7.2f} ms")
print(f"reflect+fresnel (x1):  {timeit(f_physics, dirs, dirs)*1e3:7.2f} ms")

# Whole trace (4 bounces) for cross-check
mesh = make_terrain(grid=128, extent=60.0, seed=0)
scene = Scene.from_mesh(mesh)
env_hit = make_env_intersector("pallas", mesh=mesh)


@jax.jit
def f_trace(d):
    r = trace_to_rx(scene, jnp.asarray([10.0, 0.0, 25.0], jnp.float32), d, rx, 1.0,
                    max_bounces=4, rx_mode="analytic", env_hit=env_hit)
    return r.captured.sum()


s = f_trace(dirs); _ = float(s)
ts = []
for _i in range(3):
    t0 = time.perf_counter(); s = f_trace(dirs); _ = float(s)
    ts.append(time.perf_counter() - t0)
dt = min(ts) - 0.026
print(f"trace_to_rx 4 bounces (no binning): {dt*1e3:7.2f} ms  -> {N/dt/1e6:.1f} Mrays/s")
