"""True multi-process distributed execution (VERDICT.md missing #3).

Spawns two OS processes, each with ONE local CPU device, connected via
jax.distributed.initialize (localhost coordinator). The 'rays' mesh spans
both processes, so sharded_cir's psum runs as a real cross-process
collective — the same code path a multi-host TPU pod executes over DCN.

The result must match a single-process run of the identical workload
(allclose: the two partial histograms sum in a different f32 order).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "multiproc_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_sharded_cir_matches_single(tmp_path):
    # No pytest-timeout plugin in the image; the communicate(timeout=240)
    # below is the real hang guard.
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # The workers pin their own platform/device count; scrub the test
    # session's fake-device flags so each process gets exactly one device.
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"

    outs = [str(tmp_path / f"ir{i}.npy") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coord, "2", str(i), outs[i]],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        logs.append(out)
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i]}"

    ir0 = np.load(outs[0])
    ir1 = np.load(outs[1])
    # Replicated output: both processes hold the complete psum'd IR.
    np.testing.assert_allclose(ir0, ir1, rtol=0, atol=0)

    # Single-process reference of the identical workload.
    import jax
    import jax.numpy as jnp

    from rfx import sampler
    from rfx.geometry import make_room
    from rfx.parallel import make_mesh, sharded_cir
    from rfx.tracer import Scene

    scene = Scene.from_mesh(make_room())
    dirs = sampler.morton_sphere_directions(jax.random.PRNGKey(0), 4096)
    mesh = make_mesh({"rays": 2}, jax.devices("cpu")[:2])
    ir_ref = np.asarray(
        sharded_cir(
            scene,
            jnp.asarray([3.0, 2.0, 2.0], jnp.float32),
            dirs,
            jnp.asarray([-8.0, -5.0, 3.0], jnp.float32),
            1.0,
            mesh,
            max_bounces=3,
            nbins=2000,
            sample_rate_hz=10e9,
            rx_mode="analytic",
        )
    )
    assert ir0.sum() > 0, "multi-process trace captured nothing"
    np.testing.assert_allclose(ir0, ir_ref, rtol=1e-5, atol=1e-12)
