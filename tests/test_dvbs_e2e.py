"""End-to-end DVB-S tests: TX oracle -> channel -> auto-locking receiver."""
import numpy as np
import pytest

from dvbs_tpu.tx import dvbs_mod, channel
from dvbs_tpu.models.dvbs import DVBSReceiver
from dvbs_tpu.spec import dvbs_fec


def _run(rate="1/2", snr_db=12.0, cfo=0.0, phase=0.7, delay=0.4,
         sco_ppm=10.0, n_groups=40, seed=0, n_blocks=3,
         block_symbols=1 << 16, fixed_rate=None):
    ts = dvbs_mod.random_ts_groups(n_groups, seed=seed)
    tx = dvbs_mod.DVBSModulator(rate=rate)
    syms = tx.ts_to_symbols(ts)
    x = channel.shape(syms, sps=2)
    y = channel.impair(x, snr_db=snr_db, cfo=cfo, phase=phase,
                       delay_samples=delay, sco_ppm=sco_ppm, seed=seed + 1)
    rx = DVBSReceiver(rate=fixed_rate, block_symbols=block_symbols)
    pkts = []
    n = 2 * block_symbols
    used = 0
    for b in range(n_blocks):
        if used + n > len(y):
            break
        res = rx.process_block(y[used:used + n])
        used += rx.last_consumed   # API contract: advance by consumed
        pkts.append(res.ts_packets)
    got = np.concatenate(pkts) if pkts else np.zeros((0, 188), np.uint8)
    return got, ts.reshape(-1, 188), rx


@pytest.mark.parametrize("rate", ["1/2", "3/4"])
def test_dvbs_e2e_rate(rate):
    got, sent, rx = _run(rate=rate, n_groups=60)
    assert rx.locked and rx.rate == rate
    assert rx.ber < 0.05
    sset = {r.tobytes(): i for i, r in enumerate(sent)}
    idx = [sset.get(r.tobytes(), -1) for r in got]
    matched = [i for i in idx if i >= 0]
    # deinterleaver warm-up corrupts the first ~12 packets; after that the
    # stream must be contiguous
    assert len(matched) >= len(got) - 16, f"{len(matched)}/{len(got)}"
    runs = np.diff(matched)
    assert np.all(runs == 1)


def test_dvbs_e2e_rotated_carrier():
    # phase near 90deg: receiver must lock via rotation hypothesis
    got, sent, rx = _run(rate="1/2", phase=np.pi / 2 + 0.1, n_groups=60)
    assert rx.locked
    sset = {r.tobytes() for r in sent}
    matched = sum(1 for r in got if r.tobytes() in sset)
    assert matched >= len(got) - 16


def test_dvbs_e2e_inverted_carrier():
    # phase near 180deg: deframer must detect inverted sync
    got, sent, rx = _run(rate="1/2", phase=np.pi + 0.05, n_groups=60)
    assert rx.locked
    sset = {r.tobytes() for r in sent}
    matched = sum(1 for r in got if r.tobytes() in sset)
    assert matched >= len(got) - 16


def test_dvbs_e2e_noisy():
    got, sent, rx = _run(rate="1/2", snr_db=5.0, cfo=0.01 * np.pi,
                         n_groups=60)
    assert rx.locked
    sset = {r.tobytes() for r in sent}
    matched = sum(1 for r in got if r.tobytes() in sset)
    assert matched >= len(got) - 16
    assert rx.rs_avg_errors < 2.0
