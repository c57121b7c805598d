"""Block decision-directed LMS equalizer tests."""
import numpy as np
import jax.numpy as jnp

from dvbs_tpu.spec import constellations, modcod
from dvbs_tpu.ops import equalizer


def test_lms_corrects_multipath():
    rng = np.random.default_rng(0)
    syms = constellations.points(modcod.QPSK)[
        rng.integers(0, 4, 16384)].astype(np.complex64)
    ch = np.array([1.0, 0.3, 0.15j])
    rx = np.convolve(syms, ch)[:len(syms)].astype(np.complex64)
    rx += (rng.normal(0, 0.05, len(rx)) +
           1j * rng.normal(0, 0.05, len(rx))).astype(np.complex64)
    evm_in = float(np.mean(np.abs(rx[2000:] - syms[2000:]) ** 2))
    eq = np.asarray(equalizer.lms_equalize(jnp.asarray(rx)))
    evm_out = float(np.mean(np.abs(eq[4000:] - syms[4000:]) ** 2))
    assert evm_out < evm_in * 0.3


def test_lms_transparent_on_clean_signal():
    rng = np.random.default_rng(1)
    syms = constellations.points(modcod.QPSK)[
        rng.integers(0, 4, 8192)].astype(np.complex64)
    eq = np.asarray(equalizer.lms_equalize(jnp.asarray(syms)))
    evm = float(np.mean(np.abs(eq[2048:] - syms[2048:]) ** 2))
    assert evm < 1e-3
