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


def test_receiver_equalize_hook_e2e():
    """DVBS2Receiver(equalize=True) decodes through a mild multipath
    channel that the unequalized front end also faces (LDPC absorbs what
    the equalizer leaves); asserts the hook is wired and harmless."""
    from dvbs_tpu.models.dvbs2 import DVBS2Receiver
    from dvbs_tpu.tx import dvbs2_mod, channel

    cfg = modcod.get_config(4, short=True)
    pkts = dvbs2_mod.random_ts_packets(120, seed=5)
    bb = dvbs2_mod.ts_to_bbframes(pkts, cfg)
    tx = dvbs2_mod.bbframes_to_plframes(bb, cfg).reshape(-1)
    x = channel.shape(tx, sps=2)
    # static 2-ray echo at symbol spacing + noise
    echo = np.zeros(3, np.complex64)
    echo[0], echo[2] = 1.0, 0.18 - 0.1j
    x = np.convolve(x, echo)[:len(x)]
    y = channel.impair(x, snr_db=9.0, cfo=0.004 * np.pi, seed=6)

    rx = DVBS2Receiver(mc=4, short=True, block_symbols=1 << 15,
                       equalize=True)
    res = rx.process_symbols_block(y[:2 * (1 << 15)])
    assert res.frame_ok.any(), "no frame decoded with equalizer enabled"
