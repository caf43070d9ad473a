"""Dump real bounce states (o, d) of the flagship workload to /tmp for the
host-side walk simulation (exp_sim_walk.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from rfx import physics, sampler
from rfx.bvh import build_bvh
from rfx.geometry import make_terrain
from rfx.ops.intersect import is_hit, mesh_soa
from rfx.ops.pallas_trace import PALLAS_LEAF, make_pallas_env_hit
from rfx.tracer import Scene

N = 5_242_880
mesh = make_terrain(grid=128, extent=60.0, seed=0)
scene = Scene.from_mesh(mesh)
flat = build_bvh(mesh, leaf_size=PALLAS_LEAF)
env_hit = make_pallas_env_hit(flat)
v0, e1, e2, normals = mesh_soa(scene.vertices, scene.faces)
tx = jnp.asarray([10.0, 0.0, 25.0], jnp.float32)
dirs = sampler.morton_sphere_directions(jax.random.PRNGKey(0), N)


@jax.jit
def query(o, d):
    t, face, nrm = env_hit(o, d, v0, e1, e2, normals)
    return t, nrm


@jax.jit
def bounce_state(o, d, t, nrm):
    hit = is_hit(t)
    newp = jnp.where(hit[:, None], o + d * jnp.where(hit, t, 0.0)[:, None], 1e9)
    newd = jnp.where(hit[:, None], physics.reflect(d, nrm), d)
    return newp, newd


o = jnp.broadcast_to(tx, (N, 3))
d = dirs
states = {"o0": np.asarray(o), "d0": np.asarray(d)}
t, nrm = query(o, d)
for b in (1, 2):
    o, d = bounce_state(o, d, t, nrm)
    states[f"o{b}"] = np.asarray(o)
    states[f"d{b}"] = np.asarray(d)
    t, nrm = query(o, d)
np.savez("/tmp/walk_states.npz", **states)
print("saved", {k: v.shape for k, v in states.items()})
