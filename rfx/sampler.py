"""Ray direction sampling.

TPU-native replacement for warp's per-thread counter-based PRNG + unit-sphere
sampling (ref kernel.py:51-52): a threefry key folded over the ray batch, with
the standard (z, phi) uniform-sphere construction. Explicit direction arrays
can always be injected instead, so oracle and TPU runs trace identical rays
(SURVEY.md 2.2: the Warp PRNG is deliberately not replicated bit-exactly).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("n",))
def sphere_directions(key: jax.Array, n: int) -> jnp.ndarray:
    """(n, 3) float32 directions uniform on the unit sphere."""
    kz, kp = jax.random.split(key)
    z = jax.random.uniform(kz, (n,), minval=-1.0, maxval=1.0)
    phi = jax.random.uniform(kp, (n,), minval=0.0, maxval=2.0 * jnp.pi)
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=1).astype(jnp.float32)


@partial(jax.jit, static_argnames=("n",))
def stratified_sphere_directions(key: jax.Array, n: int) -> jnp.ndarray:
    """Stratified (z, phi) sampling: jitter within an (n_z x n_phi) lattice.

    Variance-reduction upgrade over the reference's unstratified sampler
    (ref kernel.py:51-52 has no stratification); same uniform marginal law.
    """
    m = int(n**0.5)
    while n % m:
        m -= 1
    nz, nphi = m, n // m
    kz, kp = jax.random.split(key)
    iz = jnp.arange(nz, dtype=jnp.float32)
    ip = jnp.arange(nphi, dtype=jnp.float32)
    z = (iz[:, None] + jax.random.uniform(kz, (nz, nphi))) / nz * 2.0 - 1.0
    phi = (ip[None, :] + jax.random.uniform(kp, (nz, nphi))) / nphi * 2.0 * jnp.pi
    z = z.reshape(-1)
    phi = phi.reshape(-1)
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=1).astype(jnp.float32)


def pad_directions(directions: jnp.ndarray, multiple: int) -> tuple[jnp.ndarray, int]:
    """Pad a direction batch to a multiple (dead rays get a fixed direction and
    are masked out by the caller via the valid count). Returns (padded, n_valid)."""
    n = directions.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return directions, n
    pad = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], directions.dtype), (rem, 3))
    return jnp.concatenate([directions, pad], axis=0), n
