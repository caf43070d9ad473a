"""Channel-impulse-response assembly and RX-power metrics (on-device).

The reference accumulates the CIR on the host in a Python loop over paths
(ref tracer.py:101-117) and derives RX power by convolving with a carrier
sine on the CPU (ref main.py:46-55). Both run here as vectorised XLA ops:
binning is a scatter-add (deterministic on TPU), the convolution is a direct
`lax.conv` so exact zeros stay exactly zero (parity with np.convolve's
nonzero-sample selection; an FFT path would fill zeros with roundoff noise).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["bin_impulse_response", "cir_from_trace", "rx_power_dbm", "rx_power_dbm_phasor", "to_dbm"]

# Precision for the map engine's one-hot selection-sum matmuls. TPU DEFAULT
# truncates f32 operands toward bf16 (~0.15% bin error, measured). HIGH
# (3 bf16 passes) is exact here: the one-hot operand's {0,1} values decompose
# into bf16 with zero residual, so every partial product is exact and the f32
# accumulation sums the same nonzero values in the same order as HIGHEST — at
# half HIGHEST's cost. The Pallas coverage kernel uses HIGHEST for the same
# sums only because Mosaic cannot lower HIGH in-kernel ("Unsupported dot
# precision: HIGH", measured round 5); by the argument above the two engines
# still produce bit-equivalent bins.
BINNING_PRECISION = jax.lax.Precision.HIGH


def _bincount_matmul(bins: jnp.ndarray, weights: jnp.ndarray, nbins: int) -> jnp.ndarray:
    """Weighted histogram as two one-hot matmuls (MXU) instead of scatter-add.

    XLA's TPU scatter processes updates at ~130M/s (measured: 40.7 ms for the
    flagship 5.2M-ray x 20k-bin IR — a third of the whole trace). Decomposing
    bin = q*128 + r turns the histogram into IR[q, r] = sum_n w_n [q_n==q][r_n==r]
    = (onehot_q * w) @ onehot_r^T — dense MXU work in f32 (measured ~4 ms).
    Rays are chunked so the one-hot intermediates stay bounded. Invalid bins
    must already be masked to weight 0 AND clipped into range by the caller.

    Exact same values as the scatter path up to f32 summation order;
    deterministic (fixed chunking and reduction order).
    """
    q_size = -(-nbins // 128)
    n = bins.shape[0]
    chunk = 262_144
    if n % chunk:
        pad = (-n) % chunk
        bins = jnp.concatenate([bins, jnp.zeros((pad,), bins.dtype)])
        weights = jnp.concatenate([weights, jnp.zeros((pad,), weights.dtype)])
        n = bins.shape[0]
    n_chunks = n // chunk
    qs = (bins // 128).reshape(n_chunks, chunk)
    rs = (bins % 128).reshape(n_chunks, chunk)
    ws = weights.reshape(n_chunks, chunk)
    qi = jnp.arange(q_size, dtype=bins.dtype)
    ri = jnp.arange(128, dtype=bins.dtype)

    def step(acc, args):
        q, r, w = args
        a = jnp.where(q[None, :] == qi[:, None], w[None, :], 0.0)  # (Q, C)
        b = (r[None, :] == ri[:, None]).astype(w.dtype)  # (128, C)
        # See BINNING_PRECISION: exact for one-hot selection sums.
        return acc + jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=BINNING_PRECISION,
        ), None

    acc0 = jnp.zeros((q_size, 128), jnp.float32)
    acc, _ = jax.lax.scan(step, acc0, (qs, rs, ws))
    return acc.reshape(q_size * 128)[:nbins]


def bin_impulse_response(
    amplitude: jnp.ndarray,
    distance: jnp.ndarray,
    captured: jnp.ndarray,
    *,
    nbins: int,
    light_speed_mps: float,
    sample_rate_hz: float,
    soft: bool = False,
    method: str = "auto",
):
    """Scatter per-path amplitudes into delay bins.

    Hard mode reproduces the reference exactly: bin = int(distance/c * rate)
    (truncation, ref tracer.py:115), out-of-window paths dropped, amplitudes
    summed. Soft mode linearly splits each amplitude between the two
    neighbouring bins so d(IR)/d(distance) is nonzero — required for delay
    gradients in the inverse solve (hard binning is piecewise constant).

    method: 'scatter' (XLA scatter-add), 'matmul' (one-hot MXU histogram,
    ~10x faster on TPU for multi-million-ray batches), or 'auto' (matmul on
    TPU for large batches, scatter otherwise).
    """
    delay = distance / light_speed_mps * sample_rate_hz
    amp = jnp.where(captured, amplitude, 0.0)
    if method == "auto":
        on_tpu = jax.devices()[0].platform != "cpu"
        method = "matmul" if (on_tpu and amplitude.shape[0] >= 65536) else "scatter"
    if soft:
        lo = jnp.floor(delay)
        w = delay - lo
        lo_i = lo.astype(jnp.int32)
        valid_lo = captured & (lo_i >= 0) & (lo_i < nbins)
        valid_hi = captured & (lo_i + 1 >= 0) & (lo_i + 1 < nbins)
        if method == "matmul":
            ir = _bincount_matmul(
                jnp.clip(lo_i, 0, nbins - 1), jnp.where(valid_lo, amp * (1.0 - w), 0.0), nbins
            )
            return ir + _bincount_matmul(
                jnp.clip(lo_i + 1, 0, nbins - 1), jnp.where(valid_hi, amp * w, 0.0), nbins
            )
        ir = jnp.zeros((nbins,), amp.dtype)
        ir = ir.at[jnp.clip(lo_i, 0, nbins - 1)].add(jnp.where(valid_lo, amp * (1.0 - w), 0.0))
        ir = ir.at[jnp.clip(lo_i + 1, 0, nbins - 1)].add(jnp.where(valid_hi, amp * w, 0.0))
        return ir
    bins = delay.astype(jnp.int32)  # truncation toward zero, matches int()
    valid = captured & (bins >= 0) & (bins < nbins)
    if method == "matmul":
        return _bincount_matmul(
            jnp.clip(bins, 0, nbins - 1), jnp.where(valid, amp, 0.0), nbins
        )
    ir = jnp.zeros((nbins,), amp.dtype)
    return ir.at[jnp.clip(bins, 0, nbins - 1)].add(jnp.where(valid, amp, 0.0))


def cir_from_trace(
    result,
    *,
    tx_power,
    num_rays: int,
    nbins: int,
    light_speed_mps: float,
    sample_rate_hz: float,
    soft: bool = False,
    method: str = "auto",
):
    """TraceResult -> impulse response. Per-path amplitude starts at
    tx_power / N (ref tracer.py:103) times the accumulated Fresnel product."""
    amp = result.amplitude * (tx_power / num_rays)
    return bin_impulse_response(
        amp,
        result.distance,
        result.captured,
        nbins=nbins,
        light_speed_mps=light_speed_mps,
        sample_rate_hz=sample_rate_hz,
        soft=soft,
        method=method,
    )


def to_dbm(power):
    return 10.0 * jnp.log10(power / 1e-3)


@partial(jax.jit, static_argnames=("carrier_hz", "sample_window_s"))
def rx_power_dbm(
    impulse_response: jnp.ndarray,
    sample_window_s: float,
    carrier_hz: float = 2.4e9,
):
    """Reference RX-power metric (ref main.py:46-55): convolve the IR with a
    carrier sine ('same' mode), mean-square over nonzero samples, dBm.

    Accepts (nbins,) or a batched (M, nbins) IR (the coverage engine).
    Returns -inf dBm where nothing was received.
    """
    squeeze = impulse_response.ndim == 1
    ir = jnp.atleast_2d(impulse_response)
    m, nbins = ir.shape
    t = jnp.linspace(0.0, sample_window_s, nbins)
    kernel = jnp.sin(2.0 * jnp.pi * carrier_hz * t)

    # np.convolve(a, k, mode='same') == full conv trimmed to start at
    # (len(k)-1)//2. Express as lax.conv with explicit padding.
    lhs = ir[:, None, :]  # (M, 1, nbins)
    rhs = kernel[::-1][None, None, :]  # flip: convolution, not correlation
    lo = (nbins - 1) // 2
    hi = nbins - 1 - lo
    out = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(1,),
        padding=[(nbins - 1 - lo, nbins - 1 - hi)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )[:, 0, :]
    # 'same' trimming: np takes indices [lo, lo+nbins) of the full conv; the
    # padding above already yields exactly nbins outputs starting at lo.
    nz = out != 0.0
    count = jnp.sum(nz, axis=1)
    power = jnp.where(
        count > 0, jnp.sum(jnp.where(nz, out**2, 0.0), axis=1) / jnp.maximum(count, 1), 0.0
    )
    dbm = jnp.where(count > 0, to_dbm(jnp.maximum(power, 1e-300)), -jnp.inf)
    if squeeze:
        return dbm[0], out[0]
    return dbm, out


def rx_power_dbm_phasor(
    amplitude: jnp.ndarray,
    distance: jnp.ndarray,
    captured: jnp.ndarray,
    *,
    sample_window_s: float,
    nbins: int,
    light_speed_mps: float,
    sample_rate_hz: float,
    carrier_hz: float = 2.4e9,
    return_cancellation: bool = False,
):
    """RX power WITHOUT materializing the impulse response.

    The reference metric convolves the sparse IR with a single-frequency
    carrier sine and takes the mean square over nonzero samples
    (ref main.py:46-55). A superposition of same-frequency sinusoids is one
    sinusoid: signal[n] ~ Im(A e^{i w t_n}) with A = sum_k ir[k] e^{-i w t_k},
    so mean(signal^2) ~ |A|^2 / 2 exactly, up to 'same'-mode edge truncation
    (sub-0.2 dB when path delays sit well inside the window; validated
    against the exact path in tests). This turns the coverage engine's
    per-receiver scatter-add (the dominant cost: ~18 ms per 2M segments on
    v5e, x2048 receivers) into a pure reduction.

    Delay quantization matches the binned IR exactly: bin = int(d/c * rate),
    t_k = bin * window/(nbins-1) (the exact metric's linspace grid).
    Out-of-window paths are dropped like the binning path. Returns dBm
    (-inf when nothing was captured).
    """
    delay_bins = (distance / light_speed_mps * sample_rate_hz).astype(jnp.int32)
    valid = captured & (delay_bins >= 0) & (delay_bins < nbins)
    amp = jnp.where(valid, amplitude, 0.0)
    t_k = delay_bins.astype(jnp.float32) * (sample_window_s / (nbins - 1))
    phase = 2.0 * jnp.pi * carrier_hz * t_k
    # Truncation model: a spike at bin k only excites output samples
    # [max(k-lo, 0), min(k+hi, nbins-1)] of the 'same' convolution — support
    # s_k = min(k + hi + 1, nbins) for k < lo. Weight each phasor by
    # sqrt(s_k) (min(s_i, s_j) ~ sqrt(s_i s_j) for clustered delays) and
    # normalize by the union support, so the mean-over-nonzero-samples
    # semantics of the exact metric carry over.
    hi = nbins - 1 - (nbins - 1) // 2
    s_k = jnp.where(valid, jnp.minimum(delay_bins + hi + 1, nbins).astype(jnp.float32), 0.0)
    w_k = jnp.sqrt(s_k)
    a_re = jnp.sum(amp * w_k * jnp.cos(phase))
    a_im = jnp.sum(amp * w_k * jnp.sin(phase))
    n_nz = jnp.maximum(jnp.max(s_k), 1.0)
    power = 0.5 * (a_re * a_re + a_im * a_im) / n_nz
    any_hit = jnp.any(valid)
    dbm = jnp.where(any_hit, to_dbm(jnp.maximum(power, 1e-300)), -jnp.inf)
    if not return_cancellation:
        return dbm
    # Cancellation diagnostic: coherent |A|^2 over the incoherent sum of the
    # same weighted phasors. Near 1 when one arrival dominates or phases
    # align; << 1 under destructive interference — exactly the regime where
    # the single-phasor model's 'same'-convolution truncation error blows up
    # (each spike's truncated sinusoid tail survives cancellation that the
    # phasor sum assumes; COVERAGE_EXACT_r03 measured up to 20 dB there).
    incoherent = jnp.sum((amp * w_k) ** 2)
    ratio = (a_re * a_re + a_im * a_im) / jnp.maximum(incoherent, 1e-300)
    ratio = jnp.where(any_hit, ratio, 1.0)
    # Power-weighted delay spread (seconds): the second failure mode of the
    # single-support phasor model is well-SEPARATED spikes (the sqrt(s_i s_j)
    # cross-term support approximation degrades as spikes move apart), which
    # shows up even without cancellation. Both diagnostics feed the hybrid's
    # exact-fallback decision (rfx.coverage.coverage_dbm_hybrid).
    wgt = (amp * w_k) ** 2
    wsum = jnp.maximum(jnp.sum(wgt), 1e-300)
    t_mean = jnp.sum(wgt * t_k) / wsum
    spread = jnp.sqrt(jnp.maximum(jnp.sum(wgt * (t_k - t_mean) ** 2) / wsum, 0.0))
    spread = jnp.where(any_hit, spread, 0.0)
    return dbm, ratio, spread
