import numpy as np
import pytest

from oracle import OracleTracer, fresnel_bounce_amplitude, sample_sphere_directions
from rfx.geometry import make_room


def _reference_scalar_fresnel(angle_between):
    """The reference's scalar _bounce_amplitude (ref tracer.py:34-61),
    re-expressed with math ops for cross-checking the vectorised version."""
    import math

    if math.isnan(angle_between):
        return 0.0
    theta = (math.pi / 2) - (angle_between / 2)
    n_1, n_2 = 5.0, 1.0
    theta_i = math.asin((n_2 * math.sin(theta)) / n_1)
    num = n_2 * math.cos(theta_i) - n_1 * math.cos(theta)
    denom = n_2 * math.cos(theta_i) + n_1 * math.cos(theta)
    amp = -((num / denom) ** 2)
    amp = max(amp, -1.0)
    if math.isnan(amp):
        return 0.0
    return -amp


def test_fresnel_matches_reference_scalar():
    angles = np.linspace(0.0, np.pi, 101)
    vec = fresnel_bounce_amplitude(angles)
    ref = np.array([_reference_scalar_fresnel(a) for a in angles])
    np.testing.assert_allclose(vec, ref, rtol=1e-12, atol=1e-15)
    assert np.all(vec >= 0.0)
    assert np.all(vec <= 1.0)
    # NaN guard
    assert fresnel_bounce_amplitude(np.array([np.nan]))[0] == 0.0


def test_sphere_directions_are_unit_and_uniform():
    d = sample_sphere_directions(200_000, seed=7)
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)
    # Mean should vanish; each z-band equally likely.
    assert np.abs(d.mean(axis=0)).max() < 0.01
    hist, _ = np.histogram(d[:, 2], bins=10, range=(-1, 1))
    assert hist.min() > 0.9 * hist.mean()


def test_los_path_geometry(box_room):
    """A ray aimed straight at the receiver yields a 2-vertex LOS path with
    amplitude tx_power/N and delay = distance/c."""
    tx = np.array([10.0, 0.0, 5.0])
    rx = np.array([-10.0, 0.0, 5.0])
    tracer = OracleTracer(box_room, max_bounces=4)
    d = (rx - tx) / np.linalg.norm(rx - tx)
    dirs = np.array([d, [0.0, 0.0, 1.0]], dtype=np.float32)  # second ray goes up
    paths, ir = tracer.compute_cir(tx, tx_power=1.0, rx_pos=rx, rx_radius=0.1, directions=dirs)
    los = [p for p in paths if len(p) == 2]
    assert len(los) == 1
    dist = np.linalg.norm(los[0][1] - los[0][0])
    # Hits the near side of a radius-0.1 sphere 20 m away.
    assert dist == pytest.approx(19.9, abs=0.02)
    bin_idx = int(dist / 2.998e8 * 100e9)
    assert ir[bin_idx] >= 0.5  # amplitude 1/2 from the LOS ray


def test_single_bounce_ceiling_path(box_room):
    """TX and RX on the floor axis: a ray aimed at the ceiling midpoint between
    them must reflect once and be captured."""
    tx = np.array([5.0, 0.0, 5.0])
    rx = np.array([-5.0, 0.0, 5.0])
    tracer = OracleTracer(box_room, max_bounces=4)
    # Ceiling at z=15.8 (room top). Mirror-image construction.
    lo, hi = box_room.bounds()
    ceil_z = hi[2]
    target = np.array([0.0, 0.0, ceil_z])
    d = (target - tx) / np.linalg.norm(target - tx)
    paths, ir = tracer.compute_cir(tx, 1.0, rx, 0.1, d[None, :].astype(np.float32))
    assert len(paths) == 1
    p = paths[0]
    assert len(p) == 3  # tx, ceiling, rx-sphere
    assert p[1][2] == pytest.approx(ceil_z, abs=1e-3)
    # Amplitude is tx_power/N * one Fresnel factor.
    amp, dist = tracer.path_amplitude_and_distance(p, 1.0, 1)
    seg1 = p[1] - p[0]
    seg2 = p[2] - p[1]
    ang = np.arccos(np.dot(seg1, seg2) / (np.linalg.norm(seg1) * np.linalg.norm(seg2)))
    assert amp == pytest.approx(float(fresnel_bounce_amplitude(ang)), rel=1e-9)
    straight = np.linalg.norm(p[1] - p[0]) + np.linalg.norm(p[2] - p[1])
    assert dist == pytest.approx(straight, rel=1e-9)


def test_max_bounces_limits_paths(box_room):
    tx = np.array([10.0, 0.0, 5.0])
    rx = np.array([-10.0, 0.0, 5.0])
    dirs = sample_sphere_directions(500, seed=5)
    t1 = OracleTracer(box_room, max_bounces=1)
    t4 = OracleTracer(box_room, max_bounces=4)
    p1, _ = t1.compute_cir(tx, 1.0, rx, 0.5, dirs)
    p4, _ = t4.compute_cir(tx, 1.0, rx, 0.5, dirs)
    assert len(p4) >= len(p1)
    assert all(len(p) <= 2 for p in p1)
    assert all(len(p) <= 5 for p in p4)


def test_analytic_vs_icosphere_rx(box_room):
    """The analytic-sphere RX mode must closely agree with the reference's
    80-face icosphere mode (capture cross-sections differ by ~1-2%)."""
    tx = np.array([10.0, 0.0, 5.0])
    rx = np.array([-10.0, 0.0, 5.0])
    dirs = sample_sphere_directions(2000, seed=11)
    ico = OracleTracer(box_room, max_bounces=2, rx_mode="icosphere")
    ana = OracleTracer(box_room, max_bounces=2, rx_mode="analytic")
    pi_, ir_i = ico.compute_cir(tx, 1.0, rx, 1.0, dirs)
    pa_, ir_a = ana.compute_cir(tx, 1.0, rx, 1.0, dirs)
    assert len(pi_) > 0
    assert abs(len(pi_) - len(pa_)) <= max(2, 0.1 * len(pa_))
    assert np.abs(ir_i.sum() - ir_a.sum()) < 0.15 * max(ir_a.sum(), 1e-12)


def test_delay_binning_truncates(box_room):
    """int() truncation semantics for delay bins (ref tracer.py:115)."""
    tx = np.array([10.0, 0.0, 5.0])
    rx = np.array([-10.0, 0.0, 5.0])
    tracer = OracleTracer(box_room, max_bounces=1)
    d = (rx - tx) / np.linalg.norm(rx - tx)
    paths, ir = tracer.compute_cir(tx, 1.0, rx, 0.1, d[None, :].astype(np.float32))
    amp, dist = tracer.path_amplitude_and_distance(paths[0], 1.0, 1)
    expected_bin = int((dist / 2.998e8) * 100e9)
    assert ir[expected_bin] == pytest.approx(amp)
    assert np.count_nonzero(ir) == 1


def test_warp_quirk_compat_extends_captured_paths(box_room):
    """warp_quirk_compat=True reproduces the reference kernel's latent
    per-iteration `ray_finished` reset (ref kernel.py:58-59): a captured ray
    keeps tracing from the RX-sphere surface and typically re-captures at the
    sphere's exit, appending the chord through the sphere to its recorded
    path. Default mode terminates at the first capture (intended semantics).
    """
    tx = np.array([0.0, 0.0, 5.0])
    rxp = np.array([6.0, 0.0, 5.0])
    # one ray aimed straight at the receiver, LOS inside the box room
    dirs = np.array([[1.0, 0.0, 0.0]], np.float32)

    plain = OracleTracer(box_room, max_bounces=4, rx_mode="analytic")
    quirk = OracleTracer(box_room, max_bounces=4, rx_mode="analytic",
                         warp_quirk_compat=True)
    p0 = plain.trace_paths(tx, rxp, 1.0, dirs)
    p1 = quirk.trace_paths(tx, rxp, 1.0, dirs)
    assert len(p0) == 1 and len(p1) == 1
    # intended semantics: TX -> sphere entry (2 vertices)
    assert p0[0].shape == (2, 3)
    np.testing.assert_allclose(p0[0][1], [5.0, 0.0, 5.0], atol=1e-6)
    # quirk semantics: the ray re-captures at the sphere exit -> longer path
    # whose prefix is the intended path
    assert p1[0].shape[0] > 2
    np.testing.assert_allclose(p1[0][:2], p0[0], atol=1e-6)
    np.testing.assert_allclose(p1[0][2], [7.0, 0.0, 5.0], atol=1e-6)


def test_warp_quirk_compat_agrees_when_no_recapture(box_room):
    """For rays that never revisit the receiver, both modes agree."""
    rng = np.random.default_rng(3)
    dirs = rng.normal(size=(128, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    dirs = dirs.astype(np.float32)
    tx = np.array([4.0, 4.0, 4.0])
    rxp = np.array([-40.0, -40.0, 40.0])  # receiver far outside the room: no captures
    plain = OracleTracer(box_room, max_bounces=3, rx_mode="analytic")
    quirk = OracleTracer(box_room, max_bounces=3, rx_mode="analytic",
                         warp_quirk_compat=True)
    assert len(plain.trace_paths(tx, rxp, 1.0, dirs)) == 0
    assert len(quirk.trace_paths(tx, rxp, 1.0, dirs)) == 0
