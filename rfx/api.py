"""User-facing facade mirroring the reference `Tracer` API.

Reference: `Tracer(mesh, c, rate, window, max_bounces, n_rays)` then
`compute_cir(tx_pos, tx_power, rx_pos, rx_radius) -> (paths, ir)`
(ref tracer.py:12, tracer.py:63). Differences by design (SURVEY.md 7):

- everything hot runs on-device under jit; no per-call receiver BVH rebuild
  (ref tracer.py:65), no kernel-cache clearing (ref tracer.py:14), no host
  CIR loop;
- `compute_coverage` traces once for all receivers (the reference re-traces
  per grid point, ref coverage.py:38-43);
- ray directions come from a JAX PRNG key or an injected array (for oracle
  parity), not a per-thread CUDA PRNG.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rfx import cir as cir_mod
from rfx import sampler
from rfx.coverage import coverage_dbm_fast, coverage_irs
from rfx.geometry import TriangleMesh
from rfx.ops.intersect import make_env_intersector
from rfx.tracer import Scene, extract_paths, trace_to_rx
from rfx.utils.logging import get_logger, log_trace_stats

__all__ = ["Tracer"]

_LANE_MULTIPLE = 1024  # pad ray batches for clean TPU tiling


class Tracer:
    """Differentiable TPU RF ray tracer with the reference's call shape."""

    def __init__(
        self,
        environment: TriangleMesh,
        light_speed_mps: float = 2.998e8,
        sample_rate_hz: float = 100e9,
        sample_window_s: float = 200.0e-9,
        max_bounces: int = 4,
        tx_num_rays: int = 5_000_000,
        *,
        n1: float = 5.0,
        n2: float = 1.0,
        rx_mode: str = "analytic",
        backend: str = "auto",
        seed: int = 0,
        interpret: bool = False,
    ):
        # `interpret=True` runs the Pallas kernels in interpreter mode (CI on
        # CPU exercises the exact facade paths the TPU runs compiled).
        # rx_mode default matches TraceConfig ("analytic" = exact sphere —
        # faster and exact; the coverage engine only supports it). Pass
        # "icosphere" for the reference's 80-face tessellation when strict
        # geometric parity with ref tracer.py:26-30 is required.
        self.mesh = environment
        self.scene = Scene.from_mesh(environment)
        self.light_speed_mps = float(light_speed_mps)
        self.sample_rate_hz = float(sample_rate_hz)
        self.sample_window_s = float(sample_window_s)
        self.max_bounces = int(max_bounces)
        self.tx_num_rays = int(tx_num_rays)
        self.n1 = float(n1)
        self.n2 = float(n2)
        self.rx_mode = rx_mode
        self.nbins = int(sample_window_s * sample_rate_hz)
        self.key = jax.random.PRNGKey(seed)
        self.log = get_logger("rfx.api")

        if backend == "auto":
            # Brute-force Moller-Trumbore is the right call for small meshes.
            # Above ~2k triangles, the flagship Pallas traversal kernel is the
            # default on real accelerators (mirroring the reference, where the
            # fast path IS the default path, ref tracer.py:75-79); the jnp
            # while-loop BVH walk remains the CPU default (Pallas interpret
            # mode is far slower than compiled XLA there).
            if environment.num_faces <= 2048:
                backend = "brute"
            else:
                on_accel = jax.devices()[0].platform != "cpu"
                backend = "pallas" if on_accel else "bvh"
        self.backend = backend
        env_kw = {"interpret": True} if (interpret and backend == "pallas") else {}
        self.env_hit = make_env_intersector(backend, mesh=environment, **env_kw)

        # Flagship forward path: the fused multi-bounce megakernel keeps the
        # whole bounce loop's ray state in VMEM (rfx.ops.pallas_fused; ~35%
        # faster than the per-query scan loop on TPU). It bakes in the
        # analytic receiver sphere and records no paths, so the scan path
        # remains the fallback for record_paths=True, icosphere parity mode,
        # and gradients.
        self._fused = None
        if backend == "pallas" and rx_mode == "analytic":
            from rfx.ops.pallas_fused import make_fused_tracer

            self._fused = make_fused_tracer(environment, max_bounces=self.max_bounces,
                                            interpret=interpret)
            self._fused_cir_fn = jax.jit(self._fused_cir_impl)

        self._cir_fn = jax.jit(
            partial(
                self._cir_impl,
                record_paths=False,
            )
        )
        self._cir_paths_fn = jax.jit(partial(self._cir_impl, record_paths=True))

    # -- internals ------------------------------------------------------------
    def _cir_impl(self, vertices, faces, tx_pos, tx_power, rx_pos, rx_radius,
                  directions, active, *, record_paths: bool):
        scene = Scene(vertices, faces)
        result = trace_to_rx(
            scene,
            tx_pos,
            directions,
            rx_pos,
            rx_radius,
            max_bounces=self.max_bounces,
            n1=self.n1,
            n2=self.n2,
            rx_mode=self.rx_mode,
            env_hit=self.env_hit,
            record_paths=record_paths,
            active=active,
        )
        ir = cir_mod.cir_from_trace(
            result,
            tx_power=tx_power,
            num_rays=self.tx_num_rays,
            nbins=self.nbins,
            light_speed_mps=self.light_speed_mps,
            sample_rate_hz=self.sample_rate_hz,
        )
        return result, ir

    def _fused_cir_impl(self, tx_pos, tx_power, rx_pos, rx_radius, directions):
        result = self._fused(directions, tx_pos, rx_pos, rx_radius,
                             n1=self.n1, n2=self.n2)
        ir = cir_mod.cir_from_trace(
            result,
            tx_power=tx_power,
            num_rays=self.tx_num_rays,
            nbins=self.nbins,
            light_speed_mps=self.light_speed_mps,
            sample_rate_hz=self.sample_rate_hz,
        )
        return result.captured.sum(), ir

    def _directions(self, directions):
        if directions is None:
            self.key, sub = jax.random.split(self.key)
            dirs = sampler.sphere_directions(sub, self.tx_num_rays)
        else:
            dirs = jnp.asarray(directions, jnp.float32)
        padded, n_valid = sampler.pad_directions(dirs, _LANE_MULTIPLE)
        active = jnp.arange(padded.shape[0]) < n_valid
        return padded, active

    # -- reference-parity API -------------------------------------------------
    #: record_paths="auto" records paths only for batches at or below this
    #: ray count (a 256k-ray x 4-bounce path buffer is ~12 MB — interactive
    #: scale; the flagship 5M-ray buffer is 240 MB and stays opt-in).
    AUTO_PATHS_MAX_RAYS = 262_144

    def compute_cir(self, tx_pos, tx_power, rx_pos, rx_radius, *,
                    directions=None, record_paths="auto",
                    max_paths: int = 10_000):
        """(paths, impulse_response) — reference semantics (ref tracer.py:63).

        `directions`: optional (N, 3) array for reproducible runs; defaults to
        tx_num_rays fresh PRNG directions. Returns numpy outputs.

        `record_paths` defaults to "auto": the reference always returns the
        cleaned path list (ref tracer.py:90-97,121), but recording paths
        materializes a (B, N, 3) buffer (240 MB at 5M rays x 4 bounces — the
        reference round-trips that much every call, ref tracer.py:67-84).
        "auto" keeps the drop-in contract for interactive batch sizes
        (<= AUTO_PATHS_MAX_RAYS rays record paths like the reference) while
        large batches skip recording and return `paths == []`. Pass
        True/False to force either behavior.

        Performance cliff (documented): the fused megakernel forward path is
        only used when backend='pallas', rx_mode='analytic', AND
        record_paths=False. record_paths=True, icosphere parity mode, or
        differentiating through the trace all fall back to the ~35%-slower
        per-query scan tracer (and record_paths additionally materializes the
        path buffer). For viz, prefer a second small-ray-count record_paths
        call over recording paths on the full batch.
        """
        import time

        t0 = time.perf_counter()
        if record_paths == "auto":
            n_req = (self.tx_num_rays if directions is None
                     else int(np.shape(directions)[0]))
            record_paths = n_req <= self.AUTO_PATHS_MAX_RAYS
        if self._fused is not None and not record_paths:
            if directions is None:
                self.key, sub = jax.random.split(self.key)
                dirs = sampler.sphere_directions(sub, self.tx_num_rays)
            else:
                dirs = jnp.asarray(directions, jnp.float32)
            ncap, ir = self._fused_cir_fn(
                jnp.asarray(tx_pos, jnp.float32),
                jnp.asarray(tx_power, jnp.float32),
                jnp.asarray(rx_pos, jnp.float32),
                jnp.asarray(rx_radius, jnp.float32),
                dirs,
            )
            ir = jax.block_until_ready(ir)
            elapsed = time.perf_counter() - t0
            log_trace_stats(self.log, n_rays=int(dirs.shape[0]),
                            bounces=self.max_bounces, captured=int(ncap),
                            seconds=elapsed)
            return [], np.asarray(ir)
        dirs, active = self._directions(directions)
        fn = self._cir_paths_fn if record_paths else self._cir_fn
        result, ir = fn(
            self.scene.vertices,
            self.scene.faces,
            jnp.asarray(tx_pos, jnp.float32),
            jnp.asarray(tx_power, jnp.float32),
            jnp.asarray(rx_pos, jnp.float32),
            jnp.asarray(rx_radius, jnp.float32),
            dirs,
            active,
        )
        ir = jax.block_until_ready(ir)
        elapsed = time.perf_counter() - t0
        n_rays = int(dirs.shape[0])
        log_trace_stats(self.log, n_rays=n_rays, bounces=self.max_bounces,
                        captured=int(result.captured.sum()), seconds=elapsed)
        paths = (
            extract_paths(np.asarray(tx_pos, np.float32), result, max_paths)
            if record_paths
            else []
        )
        return paths, np.asarray(ir)

    def compute_coverage(self, tx_pos, tx_power, rx_centers, rx_radius, *,
                         directions=None, rx_batch: int = 64):
        """(M, nbins) impulse responses for M receivers from a single trace.

        Inherits this Tracer's rx_mode. Performance note (documented cliff):
        rx_mode="icosphere" (the reference's 80-face tessellation,
        ref tracer.py:26-30) runs only through the slow map engine — measured
        ~8x the analytic engine's cost at the reference 2048-receiver
        workload (~71 s vs 6.7 s warm on v5e, COVERAGE_EXACT_r04) — because
        the batched Pallas histogram kernel bakes in the analytic sphere.
        Use the default rx_mode="analytic" unless strict geometric parity
        with the reference's tessellated receiver is required (the two agree
        to ~1-2% capture cross-section, tests/test_oracle.py)."""
        dirs, active = self._directions(directions)
        irs = coverage_irs(
            self.scene,
            jnp.asarray(tx_pos, jnp.float32),
            dirs,
            jnp.asarray(rx_centers, jnp.float32),
            jnp.asarray(rx_radius, jnp.float32),
            max_bounces=self.max_bounces,
            nbins=self.nbins,
            num_rays=self.tx_num_rays,
            light_speed_mps=self.light_speed_mps,
            sample_rate_hz=self.sample_rate_hz,
            tx_power=tx_power,
            n1=self.n1,
            n2=self.n2,
            rx_batch=rx_batch,
            env_hit=self.env_hit,
            active=active,
            rx_mode=self.rx_mode,
        )
        return np.asarray(jax.block_until_ready(irs))

    def compute_coverage_dbm_fast(self, tx_pos, tx_power, rx_centers, rx_radius, *,
                                  carrier_hz: float = 2.4e9, directions=None,
                                  rx_batch: int = 64):
        """(M,) dBm per receiver via the phasor fast path (no per-RX impulse
        response; see rfx.coverage.coverage_dbm_fast for speed/accuracy)."""
        dirs, active = self._directions(directions)
        dbm = coverage_dbm_fast(
            self.scene,
            jnp.asarray(tx_pos, jnp.float32),
            dirs,
            jnp.asarray(rx_centers, jnp.float32),
            jnp.asarray(rx_radius, jnp.float32),
            max_bounces=self.max_bounces,
            num_rays=self.tx_num_rays,
            sample_window_s=self.sample_window_s,
            sample_rate_hz=self.sample_rate_hz,
            carrier_hz=carrier_hz,
            light_speed_mps=self.light_speed_mps,
            tx_power=tx_power,
            n1=self.n1,
            n2=self.n2,
            rx_batch=rx_batch,
            env_hit=self.env_hit,
            active=active,
        )
        return np.asarray(jax.block_until_ready(dbm))

    def compute_coverage_dbm_hybrid(self, tx_pos, tx_power, rx_centers, rx_radius, *,
                                    carrier_hz: float = 2.4e9, directions=None,
                                    rx_batch: int = 64,
                                    cancel_threshold: float = 0.5,
                                    spread_threshold_s: float = 10e-9,
                                    exact_fallback_frac: float = 0.15):
        """((M,) dBm, n_flagged): phasor fast path with exact re-evaluation of
        receivers flagged as cancellation-dominated (bounded worst-case error;
        see rfx.coverage.coverage_dbm_hybrid). When more than
        `exact_fallback_frac` of receivers are flagged, every receiver is
        re-evaluated through the exact engine instead (same single trace) —
        cheaper than the padded subset and strictly more accurate."""
        from rfx.coverage import coverage_dbm_hybrid

        dirs, active = self._directions(directions)
        dbm, n_flagged = coverage_dbm_hybrid(
            self.scene,
            jnp.asarray(tx_pos, jnp.float32),
            dirs,
            jnp.asarray(rx_centers, jnp.float32),
            jnp.asarray(rx_radius, jnp.float32),
            max_bounces=self.max_bounces,
            num_rays=self.tx_num_rays,
            sample_window_s=self.sample_window_s,
            sample_rate_hz=self.sample_rate_hz,
            carrier_hz=carrier_hz,
            light_speed_mps=self.light_speed_mps,
            tx_power=tx_power,
            n1=self.n1,
            n2=self.n2,
            rx_batch=rx_batch,
            env_hit=self.env_hit,
            active=active,
            cancel_threshold=cancel_threshold,
            spread_threshold_s=spread_threshold_s,
            exact_fallback_frac=exact_fallback_frac,
        )
        return dbm, n_flagged

    def rx_power_dbm(self, impulse_response, carrier_hz: float = 2.4e9):
        """Reference RX-power metric (ref main.py:46-55)."""
        dbm, _ = cir_mod.rx_power_dbm(
            jnp.asarray(impulse_response), self.sample_window_s, carrier_hz
        )
        return np.asarray(dbm)
