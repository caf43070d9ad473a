"""Opt-in compiled-mode Pallas parity on real TPU hardware (VERDICT.md #4).

Skipped in CI (conftest forces CPU; compiled Mosaic kernels need a TPU).
Run on the bench box with:

    RFX_TPU_TESTS=1 python -m pytest tests/test_tpu_compiled.py -q -p no:cacheprovider

bench.py invokes the same checks as its prologue, so every recorded TPU bench
run re-verifies compiled-kernel correctness (exact match against the brute
intersector, plus a full multi-bounce trace_to_rx parity run).
"""

import os

import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    os.environ.get("RFX_TPU_TESTS", "") != "1",
    reason="compiled-TPU parity is opt-in (set RFX_TPU_TESTS=1 on a TPU box)",
)


def _tpu_available():
    import jax

    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:
        return False


def run_compiled_parity_checks():
    """Compiled Pallas kernel vs brute intersector; called by bench.py too.

    The brute reference MUST be chunked on TPU: an unchunked 65k-ray x 4.4k-tri
    Moller-Trumbore materializes multi-GB (rays x tris, 3) intermediates and
    OOMs the chip (RESOURCE_EXHAUSTED; a crashed relay worker can then return
    garbage instead of raising — observed, and it mimics a kernel bug).
    """
    import jax
    import jax.numpy as jnp

    from rfx.geometry import make_terrain
    from rfx.ops.intersect import (
        is_hit,
        make_env_intersector,
        mesh_soa,
        ray_mesh_closest_hit_brute,
    )
    from rfx.ops.pallas_trace import make_pallas_env_hit
    from rfx.tracer import Scene, trace_to_rx

    mesh = make_terrain(grid=48, extent=40.0, seed=3)
    scene = Scene.from_mesh(mesh)
    v0, e1, e2, normals = mesh_soa(scene.vertices, scene.faces)
    env_hit = make_pallas_env_hit(mesh)  # compiled (interpret=False)

    # 1. single-query exact match, including the non-tile-aligned batch path
    rng = np.random.default_rng(11)
    for n in (4096, 777):
        o = jnp.asarray(rng.uniform([-18, -18, 2], [18, 18, 20], (n, 3)), jnp.float32)
        d = rng.normal(size=(n, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d = jnp.asarray(d, jnp.float32)
        tp, fp, npn = env_hit(o, d, v0, e1, e2, normals)
        tb, fb = ray_mesh_closest_hit_brute(o, d, v0, e1, e2)
        hit = is_hit(tb)
        assert bool(jnp.all(is_hit(tp) == hit)), f"hit-mask mismatch at n={n}"
        assert bool(
            jnp.allclose(jnp.where(hit, tp, 0), jnp.where(hit, tb, 0), rtol=1e-5, atol=1e-4)
        ), f"t mismatch at n={n}"
        assert bool(jnp.all(jnp.where(hit, fp, -1) == jnp.where(hit, fb, -1))), (
            f"face mismatch at n={n}"
        )
        want = normals[jnp.clip(fb, 0, None)]
        assert bool(
            jnp.allclose(
                jnp.where(hit[:, None], npn, 0), jnp.where(hit[:, None], want, 0), atol=1e-5
            )
        ), f"normal mismatch at n={n}"

    # 2. full multi-bounce trace parity: pallas backend vs (chunked) brute
    from rfx import sampler

    n_rays = 16384
    tx = jnp.asarray([3.0, -2.0, 14.0], jnp.float32)
    rx = jnp.asarray([-6.0, 5.0, 6.0], jnp.float32)
    dirs = sampler.morton_sphere_directions(jax.random.PRNGKey(5), n_rays)
    brute_hit = make_env_intersector("brute", ray_chunk=4096)

    rp = jax.jit(
        lambda: trace_to_rx(
            scene, tx, dirs, rx, 1.5, max_bounces=4, rx_mode="analytic", env_hit=env_hit
        )
    )()
    rb = jax.jit(
        lambda: trace_to_rx(
            scene, tx, dirs, rx, 1.5, max_bounces=4, rx_mode="analytic", env_hit=brute_hit
        )
    )()
    cp = np.asarray(rp.captured)
    cb = np.asarray(rb.captured)
    # Captures are threshold events (t_env > t_rx with f32 t from two different
    # but individually-correct kernels): allow a sub-0.2% boundary-flip budget.
    n_mism = int((cp != cb).sum())
    assert n_mism <= max(2, n_rays // 500), (
        f"multi-bounce capture mismatch: {n_mism} of {n_rays} "
        f"(pallas {int(cp.sum())}, brute {int(cb.sum())})"
    )
    both = jnp.asarray(cp & cb)
    assert bool(
        jnp.allclose(
            jnp.where(both, rp.amplitude, 0), jnp.where(both, rb.amplitude, 0),
            rtol=2e-4, atol=1e-7,
        )
    ), "multi-bounce amplitude mismatch"
    assert bool(
        jnp.allclose(
            jnp.where(both, rp.distance, 0), jnp.where(both, rb.distance, 0),
            rtol=1e-4, atol=1e-3,
        )
    ), "multi-bounce distance mismatch"
    nb_ok = np.asarray(rp.num_bounces)[np.asarray(both)] == np.asarray(rb.num_bounces)[np.asarray(both)]
    assert bool(nb_ok.all()), "bounce-count mismatch on agreeing captures"
    return int(cb.sum())


def run_compiled_fused_checks():
    """Fused megakernel vs the scan-path tracer, both compiled on TPU.

    The fused kernel (rfx.ops.pallas_fused) is the facade's default forward
    path on TPU; this demands exact capture/num_bounces agreement and
    float-tolerance amplitude/distance agreement against the per-query scan
    loop at 64k rays x 4 bounces. Called by bench.py's prologue. Returns the
    capture count.
    """
    import jax
    import jax.numpy as jnp

    from rfx import sampler
    from rfx.geometry import make_terrain
    from rfx.ops.intersect import make_env_intersector
    from rfx.ops.pallas_fused import make_fused_tracer
    from rfx.tracer import Scene, trace_to_rx

    mesh = make_terrain(grid=128, extent=60.0, seed=0)
    scene = Scene.from_mesh(mesh)
    tx = jnp.asarray([10.0, 0.0, 25.0], jnp.float32)
    rx = jnp.asarray([-10.0, 0.0, 8.0], jnp.float32)
    dirs = sampler.morton_sphere_directions(jax.random.PRNGKey(0), 65536)
    env_hit = make_env_intersector("pallas", mesh=mesh)
    ref = trace_to_rx(scene, tx, dirs, rx, 1.0, max_bounces=4,
                      rx_mode="analytic", env_hit=env_hit)
    out = make_fused_tracer(mesh, max_bounces=4)(dirs, tx, rx, 1.0)
    rc = np.asarray(ref.captured)
    oc = np.asarray(out.captured)
    assert (rc == oc).all(), f"fused capture mismatch: {int((rc != oc).sum())} rays"
    assert (np.asarray(ref.num_bounces) == np.asarray(out.num_bounces)).all(), (
        "fused bounce-count mismatch"
    )
    assert np.allclose(np.asarray(ref.amplitude)[rc], np.asarray(out.amplitude)[rc],
                       rtol=2e-5, atol=1e-7), "fused amplitude mismatch"
    assert np.allclose(np.asarray(ref.distance)[rc], np.asarray(out.distance)[rc],
                       rtol=1e-5, atol=1e-4), "fused distance mismatch"
    assert int(rc.sum()) > 0, "fused parity workload captured nothing"
    return int(rc.sum())


def run_compiled_gradient_checks():
    """FD-verify gradients through the COMPILED Pallas backend on the TPU.

    The interpret-mode FD test (test_gradients.py) proves the VJP algebra;
    this proves the compiled Mosaic lowering of the same graph — the exact
    risk class that already produced one silent compiled-only miscompile
    (commit 87b261d: scan-gather of traced normals; rfx/ops/intersect.py
    hit_normal_from_edges documents it). Called by bench.py's prologue so
    every recorded TPU bench run re-verifies it. Returns the number of
    FD comparisons performed.
    """
    import jax
    import jax.numpy as jnp

    from rfx.cir import cir_from_trace
    from rfx.geometry import make_room
    from rfx.ops.intersect import make_env_intersector
    from rfx.tracer import Scene, trace_to_rx
    from oracle import sample_sphere_directions

    checks = 0

    # 1. vertex gradients through compiled differentiable_tris (live_trif
    #    repack + scatter-add backward). Box room: rays crossing a moved edge
    #    flip between coplanar wall triangles, keeping FD honest.
    room = make_room()
    scene = Scene.from_mesh(room)
    env_hit = make_env_intersector("pallas", mesh=room, differentiable_tris=True)
    dirs = jnp.asarray(sample_sphere_directions(2048, seed=21))
    tx = jnp.asarray([4.0, 3.0, 6.0], jnp.float32)
    rxp = jnp.asarray([-6.0, -4.0, 5.0], jnp.float32)

    @jax.jit
    def loss_v(vertices):
        r = trace_to_rx(
            Scene(vertices, scene.faces), tx, dirs, rxp, 2.0,
            max_bounces=2, rx_mode="analytic", env_hit=env_hit,
        )
        return jnp.sum(jnp.where(r.captured, r.amplitude * r.distance, 0.0))

    v0 = scene.vertices
    g = jax.jit(jax.grad(loss_v))(v0)
    assert np.all(np.isfinite(np.asarray(g))), "compiled vertex grad non-finite"
    assert float(jnp.sum(jnp.abs(g))) > 0.0, "compiled vertex grad identically zero"
    rng = np.random.default_rng(5)
    u = jnp.asarray(rng.normal(size=v0.shape), jnp.float32)
    u = u / jnp.linalg.norm(u)
    eps = 2e-3
    fd = (float(loss_v(v0 + eps * u)) - float(loss_v(v0 - eps * u))) / (2 * eps)
    ad = float(jnp.vdot(g, u))
    assert abs(ad - fd) < 0.08 * max(abs(fd), abs(ad), 1e-3), (
        f"compiled vertex grad vs FD: ad={ad} fd={fd}"
    )
    checks += 1

    # 2. compiled tx gradients through the Pallas backend, FD-checked on a
    #    loss that is LINEAR in the traced outputs (w*distance + u*amplitude).
    #    The previous round FD-checked sum(ir^2) of the soft-binned CIR and
    #    failed (BENCH_r03 rc=1, ad=-3.03e8 vs fd=-5.62e8): that loss is
    #    piecewise-linear with kinks every ~0.2 mm of tx motion (35 paths x
    #    3 cm bins x path-length sensitivity ~4), so central differences at
    #    ANY eps average over several slope changes and cannot match the exact
    #    local AD derivative — the r4 diag_txgrad scripts (pruned in r5, see
    #    git history at ba25c96) reproduced the identical AD value (-3.01e8)
    #    and the identical FD instability on CPU with the brute intersector,
    #    proving the compiled lowering was never wrong. A linear functional of
    #    (distance, amplitude) has no binning kinks and is FD-stable across
    #    eps in [3e-4, 3e-3].
    env_hit_nd = make_env_intersector("pallas", mesh=room)
    rngw = np.random.default_rng(7)
    w = jnp.asarray(rngw.normal(size=(dirs.shape[0],)), jnp.float32)
    uw = jnp.asarray(rngw.normal(size=(dirs.shape[0],)), jnp.float32)
    tx0 = jnp.asarray([4.0, 3.0, 6.0], jnp.float32)

    def make_loss_smooth(env):
        @jax.jit
        def loss_smooth(txp):
            r = trace_to_rx(
                scene, txp, dirs, rxp, 2.0, max_bounces=2, rx_mode="analytic",
                env_hit=env,
            )
            cap = r.captured.astype(jnp.float32)
            return jnp.sum(cap * (w * r.distance + 10.0 * uw * r.amplitude))

        return loss_smooth

    loss_smooth = make_loss_smooth(env_hit_nd)
    gtx = jax.jit(jax.grad(loss_smooth))(tx0)
    assert np.all(np.isfinite(np.asarray(gtx))), "compiled tx grad non-finite"
    eps = 1e-3
    for a in range(3):
        tp = np.asarray(tx0).copy(); tp[a] += eps
        tm = np.asarray(tx0).copy(); tm[a] -= eps
        fd = (float(loss_smooth(jnp.asarray(tp))) - float(loss_smooth(jnp.asarray(tm)))) / (2 * eps)
        ga = float(gtx[a])
        assert abs(ga - fd) < 0.08 * max(abs(fd), abs(ga), 1e-3), (
            f"compiled tx grad vs FD on axis {a}: ad={ga} fd={fd}"
        )
        checks += 1

    # 3. the full trace-to-IR loss (soft binning, the kinked one): compiled
    #    Pallas AD must agree with compiled brute-XLA AD on the same graph —
    #    a direct cross-implementation check of the Pallas custom-VJP lowering
    #    that sidesteps the FD curvature problem entirely.
    def make_loss_ir(env):
        @jax.jit
        def loss_ir(txp):
            r = trace_to_rx(
                scene, txp, dirs, rxp, 2.0, max_bounces=2, rx_mode="analytic",
                env_hit=env,
            )
            ir = cir_from_trace(
                r, tx_power=5.0, num_rays=dirs.shape[0], nbins=512,
                light_speed_mps=2.998e8, sample_rate_hz=10e9, soft=True,
            )
            return jnp.sum(ir * ir) * 1e12

        return loss_ir

    g_pallas = np.asarray(jax.jit(jax.grad(make_loss_ir(env_hit_nd)))(tx0))
    g_brute = np.asarray(
        jax.jit(jax.grad(make_loss_ir(make_env_intersector("brute", ray_chunk=512))))(tx0)
    )
    assert np.all(np.isfinite(g_pallas)), "compiled IR-loss tx grad non-finite"
    rel = np.abs(g_pallas - g_brute) / np.maximum(np.abs(g_brute), 1e-3)
    assert float(rel.max()) < 0.03, (
        f"compiled IR-loss grad pallas vs brute: {g_pallas} vs {g_brute}"
    )
    checks += 1

    # 4. FLAGSHIP-SCALE (32k-tri terrain) n1 + vertex gradient checks
    #    (round-4 VERDICT #4b: gradient coverage at scale was tx-only; the
    #    room checks above run on 44 triangles).
    from rfx.geometry import make_terrain
    from rfx.ops.bvh_traverse import make_bvh_env_hit
    from rfx.bvh import build_bvh

    terr = make_terrain(grid=128, extent=60.0, seed=0)
    tscene = Scene.from_mesh(terr)
    tdirs = jnp.asarray(sample_sphere_directions(16384, seed=33))
    ttx = jnp.asarray([10.0, 0.0, 25.0], jnp.float32)
    trx = jnp.asarray([-10.0, 0.0, 8.0], jnp.float32)
    env_terr_nd = make_env_intersector("pallas", mesh=terr)
    env_terr_dt = make_env_intersector("pallas", mesh=terr, differentiable_tris=True)

    def make_loss_n1(env):
        @jax.jit
        def loss_n1(n1):
            r = trace_to_rx(tscene, ttx, tdirs, trx, 1.5, max_bounces=3,
                            rx_mode="analytic", env_hit=env, n1=n1)
            # n1 only enters the smooth Fresnel factor: selection never
            # moves, so plain FD on the amplitude sum is clean.
            return jnp.sum(jnp.where(r.captured, r.amplitude, 0.0)) * 1e3

        return loss_n1

    loss_n1 = make_loss_n1(env_terr_nd)
    g_n1 = float(jax.jit(jax.grad(loss_n1))(jnp.asarray(5.0)))
    eps = 1e-2
    fd_n1 = (float(loss_n1(jnp.asarray(5.0 + eps))) -
             float(loss_n1(jnp.asarray(5.0 - eps)))) / (2 * eps)
    assert np.isfinite(g_n1) and g_n1 != 0.0
    assert abs(g_n1 - fd_n1) < 0.05 * max(abs(fd_n1), 1e-6), (
        f"flagship n1 grad vs FD: ad={g_n1} fd={fd_n1}"
    )
    # Regression (round-5 NaN bug): through the differentiable-tris backend
    # the same n1 gradient used to come out NaN — parked-ray lanes (|o|~1e9)
    # overflowed the closed-form-t VJP to inf and 0 x inf = NaN poisoned the
    # whole chain. The backward now evaluates at sanitized lanes; the two
    # backends must agree.
    g_n1_dt = float(jax.jit(jax.grad(make_loss_n1(env_terr_dt)))(jnp.asarray(5.0)))
    assert np.isfinite(g_n1_dt), "difftris n1 grad non-finite (NaN regression)"
    assert abs(g_n1_dt - g_n1) < 0.02 * max(abs(g_n1), 1e-6), (g_n1_dt, g_n1)
    checks += 1

    # Vertex gradients at flagship scale: FD is f32-noise-limited here
    # (16k-ray sums drown a 5e-4 step), so the check is CROSS-IMPLEMENTATION
    # AD agreement — compiled Pallas differentiable-tris backward vs the
    # independent jnp BVH-traversal backward on the identical loss (the same
    # discipline as check 3's pallas-vs-brute). FD coverage for the vertex
    # VJP algebra itself lives in check 1 (room scale) and
    # tests/test_gradients.py.
    wt = jnp.asarray(np.random.default_rng(11).normal(size=(16384,)), jnp.float32)
    env_terr_bvh = make_bvh_env_hit(build_bvh(terr), differentiable_tris=True)

    def make_loss_vt(env):
        @jax.jit
        def loss_vt(vertices):
            r = trace_to_rx(Scene(vertices, tscene.faces), ttx, tdirs, trx, 1.5,
                            max_bounces=3, rx_mode="analytic", env_hit=env)
            cap = r.captured.astype(jnp.float32)
            return jnp.sum(cap * (wt * r.distance + 10.0 * r.amplitude))

        return loss_vt

    tv0 = tscene.vertices
    g_v = jax.jit(jax.grad(make_loss_vt(env_terr_dt)))(tv0)
    g_v_ref = jax.jit(jax.grad(make_loss_vt(env_terr_bvh)))(tv0)
    assert np.all(np.isfinite(np.asarray(g_v))), "flagship vertex grad non-finite"
    assert float(jnp.sum(jnp.abs(g_v))) > 0.0
    num = float(jnp.linalg.norm(g_v - g_v_ref))
    den = float(jnp.linalg.norm(g_v_ref))
    assert num < 0.02 * max(den, 1e-6), (
        f"flagship vertex grad pallas vs bvh backend: |diff|={num} |ref|={den}"
    )
    checks += 1
    return checks


@requires_tpu
def test_compiled_pallas_matches_brute_on_tpu():
    import jax

    jax.config.update("jax_platforms", "")  # undo conftest's CPU pin
    if not _tpu_available():
        pytest.skip("no TPU device visible")
    ncap = run_compiled_parity_checks()
    assert ncap > 0, "parity workload captured nothing (degenerate test)"


@requires_tpu
def test_compiled_fused_matches_scan_on_tpu():
    import jax

    jax.config.update("jax_platforms", "")  # undo conftest's CPU pin
    if not _tpu_available():
        pytest.skip("no TPU device visible")
    assert run_compiled_fused_checks() > 0


@requires_tpu
def test_compiled_gradients_match_fd_on_tpu():
    import jax

    jax.config.update("jax_platforms", "")  # undo conftest's CPU pin
    if not _tpu_available():
        pytest.skip("no TPU device visible")
    assert run_compiled_gradient_checks() >= 5
