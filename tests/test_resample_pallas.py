"""Fused Pallas resampler vs the XLA barrel+Farrow (interpret mode)."""
import numpy as np
import jax
import jax.numpy as jnp

from dvbs_tpu.ops import frontend
from dvbs_tpu.ops import resample_pallas as rp


def _mk(C, S, seed=0, drift=1e-5):
    rng = np.random.default_rng(seed)
    n2 = 2 * S + 64
    y = (rng.normal(size=(C, n2)) + 1j * rng.normal(size=(C, n2))
         ).astype(np.complex64)
    k = np.arange(S)
    t = np.stack([2.0 * k + 0.3 + 0.17 * c + (1 + 0.2 * c) * drift * k
                  for c in range(C)]).astype(np.float32)
    return jnp.asarray(y), jnp.asarray(t)


def test_matches_xla_resampler():
    y, t = _mk(3, 8192)
    ref = jax.vmap(frontend.resample_windowed)(y, t)
    got = rp._resample_batched(y, t, interpret=True)
    assert np.abs(np.asarray(ref) - np.asarray(got)).max() < 1e-5


def test_matches_on_ragged_block():
    # S not a multiple of the 256-symbol tile exercises edge padding
    y, t = _mk(2, 4096 + 128, seed=1)
    ref = jax.vmap(frontend.resample_windowed)(y, t)
    got = rp._resample_batched(y, t, interpret=True)
    assert np.abs(np.asarray(ref) - np.asarray(got)).max() < 1e-5


def test_negative_and_large_drift():
    # r spans negative and multi-sample shifts (delay up to ~3 samples)
    rng = np.random.default_rng(2)
    S = 8192
    n2 = 2 * S + 64
    y = (rng.normal(size=(2, n2)) + 1j * rng.normal(size=(2, n2))
         ).astype(np.complex64)
    k = np.arange(S)
    t = np.stack([2.0 * k - 1.4 + 4e-5 * k,
                  2.0 * k + 3.2 - 3e-5 * k]).astype(np.float32)
    ref = jax.vmap(frontend.resample_windowed)(jnp.asarray(y),
                                               jnp.asarray(t))
    got = rp._resample_batched(jnp.asarray(y), jnp.asarray(t),
                               interpret=True)
    assert np.abs(np.asarray(ref) - np.asarray(got)).max() < 1e-5
