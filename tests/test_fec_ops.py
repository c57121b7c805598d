"""Tests: TX oracle, LDPC decoder op, soft demapper."""
import numpy as np
import pytest

from dvbs_tpu.spec import modcod, ldpc_spec, bbheader, constellations, interleaver
from dvbs_tpu.tx import dvbs2_mod, channel
from dvbs_tpu.ops import ldpc_qc
from dvbs_tpu.ops import demap as demap_op


def _decode(llr, table, n_iters=16):
    """decode_qc with the (hard, trials, ok) convention these tests use."""
    import jax.numpy as jnp
    hard, nbad, trials = ldpc_qc.decode_qc(
        jnp.asarray(llr, jnp.float32), table, n_iters=n_iters)
    return np.asarray(hard), np.asarray(trials), np.asarray(nbad) == 0


def test_ldpc_decode_clean_and_noisy():
    code = ldpc_spec.get_code("C4")
    rng = np.random.default_rng(0)
    B = 3
    info = rng.integers(0, 2, (B, code.K)).astype(np.uint8)
    cw = code.encode(info)
    sig = (1 - 2 * cw.astype(np.float32)) * 60
    # clean: the syndrome clears within the first sweep
    hard, it, ok = _decode(sig, "C4")
    assert np.all(ok) and np.all(it <= 1)
    np.testing.assert_array_equal(hard, cw)
    # noisy at ~1 dB Es/N0 per bit-channel
    sigma = np.sqrt(10 ** (-0.1))
    y = (1 - 2 * cw.astype(np.float32)) + rng.normal(0, sigma, cw.shape)
    llr = y * 50
    hard, it, ok = _decode(llr.astype(np.float32), "C4", n_iters=60)
    assert np.all(ok), f"not converged: {it}"
    np.testing.assert_array_equal(hard, cw)


def test_ldpc_reports_failure_on_garbage():
    rng = np.random.default_rng(1)
    llr = rng.normal(0, 50, (2, 16200)).astype(np.float32)
    hard, it, ok = _decode(llr, "C4", n_iters=8)
    assert not ok.any()
    assert np.all(it == 8)


@pytest.mark.parametrize("kind", [modcod.QPSK, modcod.PSK8, modcod.APSK16])
def test_demap_hard_matches_nearest(kind):
    rng = np.random.default_rng(2)
    pts = constellations.points(kind)
    m = modcod.MOD_BITS[kind]
    syms = rng.integers(0, len(pts), 500)
    x = pts[syms] + (rng.normal(0, 0.02, 500) +
                     1j * rng.normal(0, 0.02, 500)).astype(np.complex64)
    llrs = np.asarray(demap_op.soft_demap(x, kind))
    assert llrs.shape == (500, m)
    assert np.all(np.abs(llrs) <= 127.0 + 1e-4)
    bits = np.asarray(demap_op.hard_decision(llrs)).reshape(-1)
    expect = constellations.symbols_to_bits(syms, kind)
    np.testing.assert_array_equal(bits, expect)


def test_tx_bbframe_structure():
    cfg = modcod.get_config(4, short=True)
    pkts = dvbs2_mod.random_ts_packets(80, seed=3)
    state = dvbs2_mod.TSStreamState()
    bb = dvbs2_mod.ts_to_bbframes(pkts, cfg, state)
    assert bb.shape[1] == cfg.kbch // 8
    from dvbs_tpu.spec import scrambling
    frame0 = scrambling.bb_scramble_bytes(bb[0])
    assert bbheader.bbheader_check(frame0)
    hdr = bbheader.BBHeader.parse(frame0)
    assert hdr.dfl == cfg.kbch - 80
    assert hdr.ts_gs == bbheader.TS_GS_TRANSPORT
    assert bbheader.validate(hdr, cfg.kbch)
    # SYNCD of frame 0 is 0 (stream starts on a unit boundary)
    assert hdr.syncd == 0
    # frame 1 SYNCD: (-df_bytes) mod 188 bytes
    frame1 = scrambling.bb_scramble_bytes(bb[1])
    hdr1 = bbheader.BBHeader.parse(frame1)
    df_bytes = (cfg.kbch - 80) // 8
    assert hdr1.syncd == ((-df_bytes) % 188) * 8


def test_tx_full_frame_roundtrip_to_llrs():
    """TX frame -> perfect channel -> demap -> deinterleave -> LDPC(clean)
    -> BCH bits match."""
    cfg = modcod.get_config(4, short=True)
    pkts = dvbs2_mod.random_ts_packets(60, seed=4)
    bb = dvbs2_mod.ts_to_bbframes(pkts, cfg)
    frames = dvbs2_mod.bbframes_to_plframes(bb[:1], cfg)
    f = frames[0]
    # PLHEADER present
    from dvbs_tpu.spec import plheader, scrambling as scr
    np.testing.assert_allclose(f[:90], plheader.plheader_symbols(cfg.pls_code),
                               atol=1e-6)
    payload = scr.pl_descramble(f[90:])
    llrs = np.asarray(demap_op.soft_demap(payload, cfg.constellation)).reshape(-1)
    cw_llr = interleaver.deinterleave_llrs(llrs, cfg.constellation,
                                           cfg.framesize, cfg.rate)
    hard, it, ok = _decode(cw_llr[None, :], cfg.ldpc_table)
    assert ok[0] and it[0] <= 1
    # info part = BCH codeword of the scrambled bbframe
    from dvbs_tpu.spec import bch_spec
    bits = np.unpackbits(bb[0])
    expect = bch_spec.encode(bits, cfg.framesize, cfg.rate)
    np.testing.assert_array_equal(hard[0, :cfg.nbch], expect)


def test_tx_pilots_layout():
    cfg = modcod.get_config(4, short=False, pilots=True)
    payload = np.exp(1j * np.random.default_rng(5).uniform(
        0, 2 * np.pi, cfg.payload_len)).astype(np.complex64)
    frame = dvbs2_mod.assemble_plframe(payload, cfg)
    assert len(frame) == cfg.plframe_len
    from dvbs_tpu.spec import scrambling as scr
    descr = scr.pl_descramble(frame[90:])
    pos = dvbs2_mod.pilot_symbol_positions(cfg)
    assert len(pos) == cfg.pilot_blocks
    pilot = (1 + 1j) / np.sqrt(2)
    for p in pos:
        np.testing.assert_allclose(descr[p - 90:p - 90 + 36], pilot, atol=1e-5)


def test_channel_rrc_matched_pair():
    """TX shape + RX matched filter + symbol-rate sampling recovers symbols."""
    rng = np.random.default_rng(6)
    syms = (constellations.points(modcod.QPSK)
            [rng.integers(0, 4, 2000)]).astype(np.complex64)
    x = channel.shape(syms, sps=2)
    h = channel.rrc_taps(65, 0.35, 2)
    y = np.convolve(x, h)[32:32 + len(x)]
    est = y[::2]
    est /= np.sqrt(np.mean(np.abs(est) ** 2))
    # ignore filter edge transients
    err = np.abs(est[40:-40] - syms[40:-40])
    assert np.quantile(err, 0.9) < 0.1
