"""Fused multi-bounce megakernel: interpret-mode parity with the scan-path
tracer (compiled-mode parity runs on real TPU via bench.py's prologue and the
opt-in RFX_TPU_TESTS cases in test_tpu_compiled.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from rfx import sampler
from rfx.geometry import make_terrain
from rfx.ops.pallas_fused import make_fused_tracer
from rfx.tracer import Scene, trace_to_rx


def _assert_trace_match(ref, fused_out):
    capt, amp, dist = fused_out.captured, fused_out.amplitude, fused_out.distance
    assert int(ref.captured.sum()) > 0  # the workload captures something
    assert bool(jnp.all(ref.captured == capt))
    assert bool(jnp.all(ref.num_bounces == fused_out.num_bounces))
    m = np.asarray(ref.captured)
    assert np.allclose(
        np.asarray(ref.amplitude)[m], np.asarray(amp)[m], rtol=2e-5, atol=1e-7
    )
    assert np.allclose(
        np.asarray(ref.distance)[m], np.asarray(dist)[m], rtol=1e-5, atol=1e-4
    )


import pytest


@pytest.mark.slow
@pytest.mark.parametrize("pack,cone", [(True, False), (False, False), (False, True)])
def test_fused_interpret_matches_scan_tracer(pack, cone):
    """All node-test styles: packed f32 pairs / per-node any / scalar cone
    pre-filter (conservative — must not change any result)."""
    mesh = make_terrain(grid=16, extent=30.0, seed=3)
    scene = Scene.from_mesh(mesh)
    n, bounces = 2048, 3
    dirs = sampler.morton_sphere_directions(jax.random.PRNGKey(4), n)
    tx = jnp.asarray([2.0, 1.0, 9.0], jnp.float32)
    rx = jnp.asarray([-5.0, 2.0, 6.0], jnp.float32)

    ref = trace_to_rx(scene, tx, dirs, rx, 1.0, max_bounces=bounces, rx_mode="analytic")
    ft = make_fused_tracer(mesh, max_bounces=bounces, interpret=True, pack=pack,
                           cone_filter=cone)
    _assert_trace_match(ref, ft(dirs, tx, rx, 1.0))


def test_fused_interpret_nonaligned_batch_and_materials():
    """Tile padding (N not a multiple of tile_rays) is sliced off, and the
    n1/n2 material scalars reach the in-kernel Fresnel."""
    mesh = make_terrain(grid=12, extent=24.0, seed=9)
    scene = Scene.from_mesh(mesh)
    n, bounces = 700, 2
    dirs = sampler.morton_sphere_directions(jax.random.PRNGKey(1), n)
    tx = jnp.asarray([1.0, -2.0, 7.0], jnp.float32)
    rx = jnp.asarray([-4.0, 3.0, 5.0], jnp.float32)

    ref = trace_to_rx(
        scene, tx, dirs, rx, 1.5, max_bounces=bounces, rx_mode="analytic",
        n1=3.0, n2=1.2,
    )
    ft = make_fused_tracer(mesh, max_bounces=bounces, interpret=True, tile_rays=256)
    _assert_trace_match(ref, ft(dirs, tx, rx, 1.5, n1=3.0, n2=1.2))


@pytest.mark.slow
def test_facade_fused_path_matches_scan_cir():
    """Tracer(backend='pallas') routes compute_cir through the fused
    megakernel; the IR must match the scan path's (backend='bvh') bin for
    bin. Interpret mode stands in for the compiled TPU path (which the bench
    prologue re-verifies on hardware)."""
    from rfx.api import Tracer

    mesh = make_terrain(grid=16, extent=30.0, seed=3)
    n = 4096
    dirs = sampler.morton_sphere_directions(jax.random.PRNGKey(2), n)
    tx = jnp.asarray([2.0, 1.0, 9.0], jnp.float32)
    rx = jnp.asarray([-5.0, 2.0, 6.0], jnp.float32)

    tr_fused = Tracer(mesh, max_bounces=3, tx_num_rays=n, backend="pallas",
                      interpret=True)
    assert tr_fused._fused is not None
    # record_paths=False forces the fused routing (the "auto" default records
    # paths for small batches like this one, which takes the scan fallback —
    # covered by test_api.test_record_paths_auto).
    paths, ir_fused = tr_fused.compute_cir(tx, 1.0, rx, 1.0, directions=dirs,
                                           record_paths=False)
    assert paths == []

    tr_scan = Tracer(mesh, max_bounces=3, tx_num_rays=n, backend="bvh")
    assert tr_scan._fused is None
    _, ir_scan = tr_scan.compute_cir(tx, 1.0, rx, 1.0, directions=dirs)

    assert ir_fused.sum() > 0
    assert np.allclose(ir_fused, ir_scan, rtol=1e-4, atol=1e-9)


@pytest.mark.parametrize("leaf,arity", [(128, 2), pytest.param(64, 4, marks=pytest.mark.slow), pytest.param(32, 4, marks=pytest.mark.slow)])
def test_fused_interpret_streaming_layout(leaf, arity):
    """HBM-streaming triangle layout (128-row DMA blocks) through the fused
    bounce loop. leaf < 128 drains a leaf-sized slice of the landed block
    (round-5: finer streamed leaves cut the 128-candidate overdraw); arity
    collapse keeps the SMEM node table bounded at large mesh sizes."""
    from rfx.bvh import build_bvh

    mesh = make_terrain(grid=16, extent=30.0, seed=3)
    scene = Scene.from_mesh(mesh)
    n, bounces = 1024, 2
    dirs = sampler.morton_sphere_directions(jax.random.PRNGKey(7), n)
    tx = jnp.asarray([2.0, 1.0, 9.0], jnp.float32)
    rx = jnp.asarray([-5.0, 2.0, 6.0], jnp.float32)

    ref = trace_to_rx(scene, tx, dirs, rx, 1.0, max_bounces=bounces, rx_mode="analytic")
    flat = build_bvh(mesh, leaf_size=leaf, arity=arity)
    ft = make_fused_tracer(flat, max_bounces=bounces, interpret=True, force_stream=True)
    _assert_trace_match(ref, ft(dirs, tx, rx, 1.0))


@pytest.mark.slow
def test_fused_record_faces_and_replay_matches():
    """record_faces output is consistent (face >= 0 exactly where a bounce
    happened) and the differentiable replay reproduces the kernel's
    amplitude/distance from the record alone (no traversal)."""
    from rfx.ops.pallas_fused import replay_from_faces

    mesh = make_terrain(grid=16, extent=30.0, seed=3)
    scene = Scene.from_mesh(mesh)
    n, bounces = 2048, 3
    dirs = sampler.morton_sphere_directions(jax.random.PRNGKey(4), n)
    tx = jnp.asarray([2.0, 1.0, 9.0], jnp.float32)
    rx = jnp.asarray([-5.0, 2.0, 6.0], jnp.float32)

    ft = make_fused_tracer(mesh, max_bounces=bounces, interpret=True)
    result, bf = ft(dirs, tx, rx, 1.0, record_faces=True)
    bf = np.asarray(bf)
    nb = np.asarray(result.num_bounces)
    assert bf.shape == (bounces, n)
    # face recorded exactly at the first num_bounces steps of each ray...
    counts = (bf >= 0).sum(axis=0)
    # ...except rays still alive after the last bounce also record that hit.
    assert np.all((counts == nb) | (counts == np.minimum(nb + 1, bounces)))
    assert np.all(bf[(np.arange(bounces)[:, None] < nb[None, :])] >= 0)

    amp, dist = replay_from_faces(
        scene.vertices, scene.faces, tx, dirs, rx, jnp.float32(1.0),
        jnp.asarray(bf), result.captured, result.num_bounces,
    )
    m = np.asarray(result.captured)
    assert m.sum() > 0
    assert np.allclose(np.asarray(amp)[m], np.asarray(result.amplitude)[m],
                       rtol=5e-5, atol=1e-7)
    assert np.allclose(np.asarray(dist)[m], np.asarray(result.distance)[m],
                       rtol=2e-5, atol=2e-4)


@pytest.mark.slow
def test_diff_fused_gradients_match_scan_path():
    """make_diff_fused_tracer: fused forward + replay backward must agree with
    the scan path's custom-VJP gradients (same straight-through selection)."""
    from rfx.ops.pallas_fused import make_diff_fused_tracer

    mesh = make_terrain(grid=16, extent=30.0, seed=3)
    scene = Scene.from_mesh(mesh)
    n, bounces = 1024, 3
    dirs = sampler.morton_sphere_directions(jax.random.PRNGKey(4), n)
    tx = jnp.asarray([2.0, 1.0, 9.0], jnp.float32)
    rx = jnp.asarray([-5.0, 2.0, 6.0], jnp.float32)

    dt = make_diff_fused_tracer(mesh, scene.faces, max_bounces=bounces,
                                interpret=True)

    def loss_fused(txp, verts):
        r = dt(verts, txp, dirs, rx, jnp.float32(1.0))
        return jnp.sum(jnp.where(r.captured, r.amplitude * r.distance, 0.0))

    def loss_scan(txp, verts):
        r = trace_to_rx(Scene(verts, scene.faces), txp, dirs, rx, 1.0,
                        max_bounces=bounces, rx_mode="analytic")
        return jnp.sum(jnp.where(r.captured, r.amplitude * r.distance, 0.0))

    lf = float(loss_fused(tx, scene.vertices))
    ls = float(loss_scan(tx, scene.vertices))
    assert abs(lf - ls) < 1e-4 * max(abs(ls), 1e-6)
    gf_tx, gf_v = jax.grad(loss_fused, argnums=(0, 1))(tx, scene.vertices)
    gs_tx, gs_v = jax.grad(loss_scan, argnums=(0, 1))(tx, scene.vertices)
    assert np.all(np.isfinite(np.asarray(gf_tx)))
    np.testing.assert_allclose(np.asarray(gf_tx), np.asarray(gs_tx),
                               rtol=2e-3, atol=1e-8)
    # 1% rtol: the replay's closed-form t and the scan path's custom-VJP use
    # different (equivalent) algebra; f32 rounding differs in the last bits.
    np.testing.assert_allclose(np.asarray(gf_v), np.asarray(gs_v),
                               rtol=1e-2, atol=1e-6 * max(1.0, float(np.abs(np.asarray(gs_v)).max())))


@pytest.mark.slow
def test_fused_record_faces_streaming_layout():
    """Face recording must also work through the HBM-streaming triangle
    blocks (face id rides lane 12 of the padded (128,128) block)."""
    from rfx.bvh import build_bvh
    from rfx.ops.pallas_fused import replay_from_faces

    mesh = make_terrain(grid=16, extent=30.0, seed=3)
    scene = Scene.from_mesh(mesh)
    n, bounces = 1024, 2
    dirs = sampler.morton_sphere_directions(jax.random.PRNGKey(7), n)
    tx = jnp.asarray([2.0, 1.0, 9.0], jnp.float32)
    rx = jnp.asarray([-5.0, 2.0, 6.0], jnp.float32)

    flat = build_bvh(mesh, leaf_size=128)
    ft = make_fused_tracer(flat, max_bounces=bounces, interpret=True, force_stream=True)
    result, bf = ft(dirs, tx, rx, 1.0, record_faces=True)
    amp, dist = replay_from_faces(
        scene.vertices, scene.faces, tx, dirs, rx, jnp.float32(1.0),
        bf, result.captured, result.num_bounces,
    )
    m = np.asarray(result.captured)
    assert m.sum() > 0
    assert np.allclose(np.asarray(amp)[m], np.asarray(result.amplitude)[m],
                       rtol=5e-5, atol=1e-7)
    assert np.allclose(np.asarray(dist)[m], np.asarray(result.distance)[m],
                       rtol=2e-5, atol=2e-4)
