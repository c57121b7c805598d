"""DVBSBankStream: continuous multi-carrier DVB-S streaming on CPU.

Seam-clean continuity (every emitted bit gets real Viterbi context on
both sides via the overlap window), contiguous TS equality per carrier,
watchdog relock after signal corruption, and checkpoint/resume.
"""
import numpy as np
import pytest

from dvbs_tpu.tx import dvbs_mod, channel
from dvbs_tpu.parallel.dvbs_bank import DVBSBankStream

C = 2
BLOCK = 1 << 15            # samples/carrier/block (16k symbols)


def _carrier(seed, n_groups=40, cfo=0.01, delay=0.3, snr=12.0):
    ts = dvbs_mod.random_ts_groups(n_groups, seed=seed)
    tx = dvbs_mod.DVBSModulator(rate="1/2").ts_to_symbols(ts)
    x = channel.shape(tx, sps=2)
    y = channel.impair(x, snr_db=snr, cfo=cfo, delay_samples=delay,
                       sco_ppm=12.0, seed=seed + 1)
    return y, ts.reshape(-1, 188)


def _contiguous(got: bytes, sent: np.ndarray) -> int:
    g = np.frombuffer(got, np.uint8).reshape(-1, 188)
    assert len(g) > 0
    i0 = sent.tobytes().find(g[0].tobytes())
    assert i0 >= 0 and i0 % 188 == 0
    k0 = i0 // 188
    assert np.array_equal(g, sent[k0:k0 + len(g)]), \
        "TS output is not a contiguous run of the TX packets"
    return len(g)


def test_dvbs_bank_stream_seams():
    y0, s0 = _carrier(11, cfo=0.012, delay=0.2)
    y1, s1 = _carrier(12, cfo=-0.02, delay=0.7)
    n = min(len(y0), len(y1)) // BLOCK * BLOCK
    st = DVBSBankStream(C, rate="1/2", block_samples=BLOCK, ingest="f16")
    outs = [bytearray(), bytearray()]
    chunk = BLOCK * 2 // 3            # misaligned feeds cross seams
    for lo in range(0, n, chunk):
        for c, o in zip(st.feed([y0[lo:lo + chunk], y1[lo:lo + chunk]]),
                        outs):
            o.extend(c)
    assert st.locked.all()
    assert (st.ber < 0.05).all()
    m0 = _contiguous(bytes(outs[0]), s0)
    m1 = _contiguous(bytes(outs[1]), s1)
    # several blocks' worth of packets, strictly contiguous
    assert m0 >= 100 and m1 >= 100
    assert bytes(outs[0]) != bytes(outs[1])


def test_dvbs_bank_stream_relock_watchdog():
    """Kill carrier 1 mid-stream (noise only), keep carrier 0 clean:
    the struck carrier must unlock via the 20-strike watchdog and
    relock when the signal returns, without disturbing carrier 0."""
    y0, s0 = _carrier(21, n_groups=40)
    y1, s1 = _carrier(22, n_groups=40, cfo=-0.015)
    n = 32 * BLOCK
    y0 = np.tile(y0, -(-n // len(y0)))[:n]
    y1b = np.tile(y1, -(-n // len(y1)))[:n].copy()
    rng = np.random.default_rng(5)
    # blocks 3..25: carrier 1 is pure noise (signal loss) — long enough
    # to exhaust the reference's 20-strike budget
    kill = slice(3 * BLOCK, 26 * BLOCK)
    nk = 26 * BLOCK - 3 * BLOCK
    y1b[kill] = (rng.standard_normal(nk) +
                 1j * rng.standard_normal(nk)).astype(np.complex64)
    st = DVBSBankStream(C, rate="1/2", block_samples=BLOCK, ingest="f16")
    # tighter strike budget for the test (reference uses 20 blocks)
    out0 = bytearray()
    relocked = False
    unlocked_seen = False
    for lo in range(0, n, BLOCK):
        o = st.feed([y0[lo:lo + BLOCK], y1b[lo:lo + BLOCK]])
        out0.extend(o[0])
        if not st.locked[1]:
            unlocked_seen = True
        if unlocked_seen and st.locked[1] and st.ber[1] < 0.05:
            relocked = True
    assert st.locked[0], "clean carrier must never unlock"
    assert unlocked_seen, "watchdog must unlock the dead carrier"
    assert relocked, "carrier must relock after the signal returns"
    _contiguous(bytes(out0), np.tile(s0, (40, 1)))


def test_dvbs_bank_stream_checkpoint():
    y0, s0 = _carrier(31)
    y1, s1 = _carrier(32, cfo=-0.008)
    n = 6 * BLOCK

    def run(split):
        st = DVBSBankStream(C, rate="1/2", block_samples=BLOCK,
                            ingest="f16")
        outs = [bytearray(), bytearray()]
        for c, o in zip(st.feed([y0[:split], y1[:split]]), outs):
            o.extend(c)
        st2 = DVBSBankStream(C, rate="1/2", block_samples=BLOCK,
                             ingest="f16")
        st2.set_state(st.get_state())
        for c, o in zip(st2.feed([y0[split:n], y1[split:n]]), outs):
            o.extend(c)
        return bytes(outs[0]), bytes(outs[1])

    a = run(2 * BLOCK + BLOCK // 3)
    b = run(4 * BLOCK + 17)
    assert a == b and len(a[0]) > 0
    _contiguous(a[0], s0)
    _contiguous(a[1], s1)


def test_dvbs_bank_stream_rate34_lock_drop():
    """Rates with nonzero depuncture-alignment drops shrink the FIFO at
    lock time; feed must re-check block availability before stacking
    (regression: reshape/ragged-stack crash at first lock)."""
    def carrier(seed, cfo):
        ts = dvbs_mod.random_ts_groups(30, seed=seed)
        tx = dvbs_mod.DVBSModulator(rate="3/4").ts_to_symbols(ts)
        x = channel.shape(tx, sps=2)
        return channel.impair(x, snr_db=14.0, cfo=cfo, delay_samples=0.4,
                              seed=seed + 1), ts.reshape(-1, 188)

    y0, s0 = carrier(71, 0.01)
    y1, s1 = carrier(72, -0.014)
    n = min(len(y0), len(y1)) // BLOCK * BLOCK
    st = DVBSBankStream(C, rate="3/4", block_samples=BLOCK, ingest="f16")
    outs = [bytearray(), bytearray()]
    # feed in EXACT block-sized chunks (the crash trigger: lock drops
    # leave the FIFO just under a block)
    for lo in range(0, n, BLOCK):
        for c, o in zip(st.feed([y0[lo:lo + BLOCK], y1[lo:lo + BLOCK]]),
                        outs):
            o.extend(c)
    assert st.locked.all() and (st.ber < 0.05).all()
    m0 = _contiguous(bytes(outs[0]), s0)
    m1 = _contiguous(bytes(outs[1]), s1)
    assert m0 >= 60 and m1 >= 60
