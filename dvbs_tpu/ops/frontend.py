"""Sample-domain front end: AGC, mixer, matched filter, timing recovery.

Feed-forward, block-parallel replacements for the reference's per-sample
feedback loops (SURVEY.md sec. 5 "long-context"):

- AGC: block power normalization (vs FastAGC's per-sample recursion,
  agc_rate=1e-4 — converges to the same fixed point).
- Carrier: lag-1 autocorrelation coarse CFO estimator + open-loop NCO
  (vs FLL band-edge / outer FED feedback driving FreqShift,
  module_dvbs2_demod.cpp:318-331).
- Matched filter: direct FIR convolution (65-tap RRC, alpha=0.35).
- Timing: Oerder-Meyr square-law estimator on a 2x interpolated stream
  (vs Gardner's 128-phase polyphase + sign-ML feedback loop,
  gardner.cpp:89-149), then one polyphase interpolation to the symbol
  grid.  Block-feed-forward: no recurrences, fully batchable.

All functions are jit-friendly: static shapes, no data-dependent Python
control flow.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..tx.channel import rrc_taps  # same pulse both sides (matched pair)


def agc(x: jax.Array) -> jax.Array:
    """Normalize block to unit average power."""
    p = jnp.mean(jnp.abs(x) ** 2)
    return x * jax.lax.rsqrt(p + 1e-12)


def coarse_cfo_estimate(x: jax.Array) -> jax.Array:
    """CFO in rad/sample from the lag-1 autocorrelation.

    At 2 samples/symbol the half-symbol-lag autocorrelation of an
    RRC-shaped PSK signal is real-positive up to the CFO rotation, so
    angle(sum x[n] conj(x[n-1])) estimates the per-sample CFO with +-pi
    pull-in.
    """
    r = jnp.sum(x[1:] * jnp.conj(x[:-1]))
    return jnp.angle(r)


def qpsk_residual_freq(z: jax.Array) -> jax.Array:
    """Residual carrier frequency of a QPSK symbol stream, rad/symbol.

    4th-power spectral line: the peak bin of FFT(z^4) sits at 4x the
    residual frequency. Parabolic interpolation refines to a small
    fraction of a bin; pull-in +-pi/4 rad/symbol. This is the
    feed-forward replacement for the FLL/Costas frequency acquisition the
    reference runs per sample (fll.cpp:135-149).
    """
    n = z.shape[-1]
    spec = jnp.abs(jnp.fft.fft(z ** 4))
    k = jnp.argmax(spec)
    km = (k - 1) % n
    kp = (k + 1) % n
    a, b, c = spec[km], spec[k], spec[kp]
    delta = 0.5 * (a - c) / (a - 2 * b + c + 1e-12)
    kf = k + jnp.clip(delta, -0.5, 0.5)
    kf = jnp.where(kf > n / 2, kf - n, kf)   # signed frequency
    return (2 * jnp.pi * kf / n) / 4.0


def mix(x: jax.Array, freq: jax.Array, phase: jax.Array = 0.0) -> jax.Array:
    """Open-loop NCO: multiply by exp(-j(freq*n + phase)) (FreqShift
    equivalent, freq in rad/sample)."""
    n = jnp.arange(x.shape[-1])
    return x * jnp.exp(-1j * (freq * n + phase)).astype(x.dtype)


def fir_filter(x: jax.Array, taps: np.ndarray) -> jax.Array:
    """Centered FIR ('same' length). Complex in, real taps."""
    t = jnp.asarray(taps, jnp.float32)
    re = jnp.convolve(jnp.real(x), t, mode="same")
    im = jnp.convolve(jnp.imag(x), t, mode="same")
    return (re + 1j * im).astype(jnp.complex64)


def matched_filter(x: jax.Array, ntaps: int = 65, alpha: float = 0.35,
                   sps: float = 2.0) -> jax.Array:
    return fir_filter(x, rrc_taps(ntaps, alpha, sps))


# ---------------------------------------------------------------------------
# Timing recovery
# ---------------------------------------------------------------------------

@functools.lru_cache()
def _halfband_taps(n: int = 47) -> np.ndarray:
    """Interpolate-by-2 filter (windowed sinc at half-integer offsets)."""
    k = np.arange(n) - n // 2
    h = np.sinc(k / 2.0) * np.blackman(n)
    return (h / h[n // 2] * 0.5).astype(np.float32)


def oerder_meyr_tau(y2: jax.Array) -> jax.Array:
    """Timing phase from a 2 sps block: interpolate to 4 sps, square-law,
    extract the symbol-rate line.  Returns tau in [-0.5, 0.5) symbols;
    symbol instants sit at 2 sps positions 2k - 2*tau.
    """
    n2 = y2.shape[-1]
    up = jnp.zeros(2 * n2, jnp.complex64).at[::2].set(y2)
    up = fir_filter(up, _halfband_taps()) * 2.0
    e = jnp.abs(up) ** 2
    n = jnp.arange(2 * n2)
    # symbol rate = fs4/4 -> tone exp(-j 2pi n/4)
    s = jnp.sum(e * jnp.exp(-1j * (jnp.pi / 2) * n))
    # convention: symbol instants sit at 2 sps positions 2k - 2*tau
    return jnp.angle(s) / (2 * jnp.pi)


@functools.lru_cache()
def interp_bank(n_phases: int = 128, n_taps: int = 8) -> np.ndarray:
    """Windowed-sinc polyphase interpolator bank [n_phases, n_taps]
    (same structure as the reference's Gardner bank, gardner.h:29)."""
    bank = np.zeros((n_phases, n_taps), np.float32)
    half = n_taps / 2.0
    for p in range(n_phases):
        mu = p / n_phases
        k = np.arange(n_taps) - (n_taps // 2 - 1)
        t = k - mu
        w = 0.54 + 0.46 * np.cos(np.pi * t / half)   # Hamming centered on t=0
        h = np.sinc(t) * np.where(np.abs(t) <= half, w, 0.0)
        bank[p] = h / h.sum()
    return bank


def resample_at(y: jax.Array, t: jax.Array, n_phases: int = 128,
                n_taps: int = 8) -> jax.Array:
    """Evaluate y (uniform grid) at fractional positions t via the
    polyphase bank. Positions outside the valid range clamp."""
    bank = jnp.asarray(interp_bank(n_phases, n_taps))
    i0 = jnp.floor(t).astype(jnp.int32)
    mu = t - i0
    ph = jnp.clip(jnp.round(mu * n_phases).astype(jnp.int32), 0, n_phases - 1)
    base = i0 - (n_taps // 2 - 1)
    offs = jnp.arange(n_taps)
    idx = jnp.clip(base[:, None] + offs[None, :], 0, y.shape[-1] - 1)
    taps = bank[ph]                                   # [M, n_taps]
    return jnp.sum(y[idx] * taps, axis=-1).astype(jnp.complex64)


def recover_symbols(y2: jax.Array, n_windows: int = 8,
                    tau_hint: jax.Array | None = None) -> tuple[jax.Array, jax.Array]:
    """Block feed-forward timing recovery at 2 sps.

    Estimates tau per sub-window (handles sample-clock drift across the
    block), unwraps, fits linearly, and interpolates one output symbol per
    2 input samples. Returns (symbols [n2//2], tau_path [n_windows]).

    tau_hint: expected tau at the block start (previous block's ending
    tau) — the unwrapped path is shifted by a whole number of symbols to
    meet it, which keeps the symbol grid continuous across blocks.
    """
    z, tau_u, _ = recover_symbols_full(y2, n_windows, tau_hint)
    return z, tau_u


def recover_symbols_full(y2: jax.Array, n_windows: int = 8,
                         tau_hint: jax.Array | None = None):
    """As recover_symbols but also returns tau extrapolated to the block
    end (the next block's tau_hint)."""
    n2 = y2.shape[-1]
    win = (n2 // n_windows) & ~1   # even stride: odd sample offsets alias
    taus = jnp.stack([oerder_meyr_tau(y2[i * win:(i + 1) * win])
                      for i in range(n_windows)])  # tau by half a symbol
    # unwrap mod 1 symbol
    d = jnp.diff(taus)
    d = d - jnp.round(d)
    tau_u = taus[0] + jnp.concatenate([jnp.zeros(1), jnp.cumsum(d)])
    if tau_hint is not None:
        # NaN hint = "no hint" (first block)
        k = jnp.where(jnp.isnan(tau_hint), 0.0,
                      jnp.round(tau_hint - tau_u[0]))
        tau_u = tau_u + k
    # linear fit tau(n) on centered/scaled regressor (float32-safe)
    centers = (jnp.arange(n_windows) + 0.5) * win
    c0 = jnp.mean(centers)
    scale = centers[-1] - centers[0] + 1e-9
    u = (centers - c0) / scale
    slope = jnp.sum(u * (tau_u - jnp.mean(tau_u))) / jnp.sum(u * u)
    k = jnp.arange(n2 // 2)
    n_nom = 2.0 * k
    tau_n = jnp.mean(tau_u) + slope * (n_nom - c0) / scale
    t = jnp.clip(n_nom - 2.0 * tau_n, 0.0, n2 - 1.0)
    tau_end = jnp.mean(tau_u) + slope * (n2 - c0) / scale
    return resample_at(y2, t), tau_u, tau_end
