"""Arbitrary-rate ingest: polyphase resampler + channelizer.

Replaces the host machinery the reference gets from SDR++ (VFO pinned to
2x symbolrate, main.cpp:129; runtime samplerate/symbolrate coupling,
main.cpp:217-243) — the repo's receivers consume exactly 2 sps, and
ops/resample.py converts any capture rate to that.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from dvbs_tpu.ops.resample import (Channelizer, StreamingResampler,
                                   rate_fraction, rational_resample)
from dvbs_tpu.spec import modcod
from dvbs_tpu.tx import channel, dvbs2_mod


def _tone_snr(L, M, f0):
    n = M * 4096
    x = np.exp(2j * np.pi * f0 * np.arange(n)).astype(np.complex64)
    y = np.asarray(rational_resample(jnp.asarray(x), L, M))
    t = np.arange(len(y))
    ref = np.exp(2j * np.pi * (f0 * M / L) * t)
    sl = slice(200, len(y) - 200)
    ph = np.vdot(ref[sl], y[sl])
    ph /= abs(ph)
    err = y[sl] - ph * ref[sl]
    return 10 * np.log10(np.mean(np.abs(y[sl]) ** 2) /
                         np.mean(np.abs(err) ** 2))


@pytest.mark.parametrize("L,M", [(2, 5), (2, 3), (1, 2), (4, 5)])
def test_tone_fidelity_through_band(L, M):
    """A tone anywhere in the DVB occupied band (<=0.675 x output
    Nyquist at rolloff 0.35) must come through with >40 dB fidelity."""
    outnyq = 0.5 * L / M
    for frac in (0.1, 0.5, 0.675):
        snr = _tone_snr(L, M, frac * outnyq)
        assert snr > 40, f"f0={frac}*outNyq: {snr:.1f} dB"


def test_rate_fraction():
    fr = rate_fraction(5e6, 1e6)
    assert (fr.numerator, fr.denominator) == (2, 5)
    assert rate_fraction(2.0001e6, 1e6).denominator <= 64
    with pytest.raises(ValueError):
        rate_fraction(1.9e6, 1e6)


def test_streaming_matches_oneshot_exactly():
    """Chunked streaming output is bit-identical to the one-shot
    resample — the overlap window covers the filter support."""
    n = 5 * 8192
    rng = np.random.default_rng(0)
    x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    sr = StreamingResampler(samplerate=5.0, symbolrate=1.0, chunk_hint=2048)
    ys = np.concatenate([sr.feed(x[i:i + 3001])
                         for i in range(0, n, 3001)])
    yo = np.asarray(rational_resample(jnp.asarray(x), sr.L, sr.M))
    assert len(ys) > 0.9 * len(yo)
    np.testing.assert_array_equal(ys, yo[:len(ys)])


def test_e2e_decode_from_2p5_sps_capture():
    """A 2.5 sps DVB-S2 capture (samplerate = 5 x symbolrate / 2 sps
    nominal x 1.25) resampled to 2 sps decodes end to end."""
    from dvbs_tpu.models.dvbs2 import DVBS2Receiver
    cfg = modcod.get_config(4, short=True)
    pkts = dvbs2_mod.random_ts_packets(160, seed=7)
    bb = dvbs2_mod.ts_to_bbframes(pkts, cfg)
    tx = dvbs2_mod.bbframes_to_plframes(bb, cfg).reshape(-1)
    x5 = channel.shape(tx, sps=5)
    y5 = channel.impair(x5, snr_db=8.0, cfo=0.004 * np.pi, seed=8)
    sr = StreamingResampler(samplerate=5.0, symbolrate=1.0)
    y2 = sr.feed(y5)
    rx = DVBS2Receiver(mc=4, short=True, block_symbols=1 << 15)
    res = rx.process_symbols_block(y2[:2 * (1 << 15)])
    assert res.frame_ok.sum() >= len(res.frame_ok) - 1


def test_channelizer_two_carrier_wideband():
    """One wideband capture carrying two independent DVB-S2 carriers at
    +-1.5 MHz (samplerate 8 MHz, 1 Msym/s each) splits into two 2 sps
    basebands that each decode their own payload — the multi-VFO bank."""
    from dvbs_tpu.models.dvbs2 import DVBS2Receiver
    cfg = modcod.get_config(4, short=True)
    fs = 8e6
    offs = (-1.5e6, +1.5e6)
    txs = []
    for c, f in enumerate(offs):
        pkts = dvbs2_mod.random_ts_packets(160, seed=20 + c)
        bb = dvbs2_mod.ts_to_bbframes(pkts, cfg)
        tx = dvbs2_mod.bbframes_to_plframes(bb, cfg).reshape(-1)
        x8 = channel.shape(tx, sps=8)        # 8 sps = fs for 1 Msym/s
        n = len(x8)
        up = x8 * np.exp(2j * np.pi * (f / fs) * np.arange(n)
                         ).astype(np.complex64)
        txs.append(up)
    n = min(map(len, txs))
    wide = sum(t[:n] for t in txs) / np.sqrt(2)
    rng = np.random.default_rng(3)
    wide = wide + (rng.normal(0, 0.05, n) +
                   1j * rng.normal(0, 0.05, n)).astype(np.complex64)

    chz = Channelizer(fs, [(f, 1e6) for f in offs])
    outs = chz.feed(wide)
    for c in range(2):
        y2 = outs[c]
        assert len(y2) >= 2 * (1 << 15), f"carrier {c}: {len(y2)} samples"
        rx = DVBS2Receiver(mc=4, short=True, block_symbols=1 << 15)
        res = rx.process_symbols_block(y2[:2 * (1 << 15)])
        assert res.frame_ok.sum() >= 1, f"carrier {c} failed to decode"
