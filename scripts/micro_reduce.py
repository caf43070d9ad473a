"""Microbench: per-body cost of 8 scalar any()-reduces vs packed roll-fold OR.

Runs a kernel that repeats the node-test body M times on dummy data and
reports ns/body. Also times a bare reduce and a bare roll to calibrate.
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB, M, K = 8, 50_000, 8


def mk(style):
    def kernel(x_ref, o_ref):
        x = x_ref[:]

        def body(i, carry):
            # 8 fake slab tests (cheap vector math dependent on carry)
            masks = [(x + carry + k) > 0.5 for k in range(K)]
            if style == "reduces":
                hits = [jnp.any(m) for m in masks]
                s = jnp.float32(0.0)
                for h in hits:
                    s = s + h.astype(jnp.float32)
            elif style == "rollfold":
                bits = jnp.zeros((SUB, 128), jnp.int32)
                for k, m in enumerate(masks):
                    bits = bits | jnp.where(m, jnp.int32(1 << k), 0)
                for sh in (64, 32, 16, 8, 4, 2, 1):
                    bits = bits | pltpu.roll(bits, sh, 1)
                for sh in (4, 2, 1):
                    bits = bits | pltpu.roll(bits, sh, 0)
                sb = jnp.max(bits)
                s = jnp.float32(0.0)
                for k in range(K):
                    s = s + ((sb >> k) & 1).astype(jnp.float32)
            elif style == "sumpack":
                # int32 sum-reduce, 2 nodes per reduce (16-bit count fields)
                s = jnp.float32(0.0)
                for k0 in range(0, K, 2):
                    f = (
                        masks[k0].astype(jnp.int32)
                        + masks[k0 + 1].astype(jnp.int32) * (1 << 16)
                    )
                    tot = jnp.sum(f)
                    s = s + ((tot & 0xFFFF) > 0).astype(jnp.float32)
                    s = s + ((tot >> 16) > 0).astype(jnp.float32)
            elif style == "novec":
                s = jnp.float32(0.0)
                for k, m in enumerate(masks):
                    s = s + m[0, 0].astype(jnp.float32) * 0.0
            return carry + s * 1e-9

        r = jax.lax.fori_loop(0, M, body, jnp.float32(0.0))
        o_ref[0, 0] = r

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(x)

    return run


x = jnp.array(np.random.rand(SUB, 128), jnp.float32)
_ = np.asarray(jnp.ones((8, 128)))

for style in ("reduces", "rollfold", "sumpack"):
    try:
        f = mk(style)
        r = f(x)
        _ = float(r[0, 0])
        ts = []
        for _i in range(3):
            t0 = time.perf_counter()
            r = f(x)
            _ = float(r[0, 0])
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(f"{style:9s}: {dt*1e9/M:8.1f} ns/body (total {dt*1e3:.1f} ms incl ~28ms sync)")
    except Exception as e:
        print(f"{style:9s}: FAILED {type(e).__name__}: {str(e)[:200]}")
