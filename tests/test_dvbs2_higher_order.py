"""DVB-S2 higher-order constellation E2E (8PSK/16APSK/32APSK)."""
import numpy as np
import pytest

from dvbs_tpu.spec import modcod, scrambling
from dvbs_tpu.tx import dvbs2_mod, channel
from dvbs_tpu.models.dvbs2 import DVBS2Receiver


def _run(mc, snr_db, pilots):
    cfg = modcod.get_config(mc, short=True, pilots=pilots)
    pkts = dvbs2_mod.random_ts_packets(400, seed=1)
    bb = dvbs2_mod.ts_to_bbframes(pkts, cfg)
    tx = dvbs2_mod.bbframes_to_plframes(bb, cfg).reshape(-1)
    x = channel.shape(tx, sps=2)
    y = channel.impair(x, snr_db=snr_db, cfo=0.005 * np.pi, phase=0.8,
                       delay_samples=0.4, sco_ppm=10.0, seed=2)
    rx = DVBS2Receiver(mc=mc, short=True, pilots=pilots,
                       block_symbols=1 << 15)
    res = rx.process_symbols_block(y[:2 * (1 << 15)])
    expect = {f.tobytes() for f in scrambling.bb_scramble_bytes(bb)}
    exact = sum(1 for f in res.bbframes if f.tobytes() in expect)
    return res, exact, cfg


@pytest.mark.parametrize("mc,snr,pilots", [
    (13, 10.0, True),    # 8PSK 2/3 with pilots
    (13, 11.0, False),   # 8PSK 2/3 pilotless (decision-directed track)
    (13, 6.0, False),    # 8PSK 2/3 pilotless near-threshold (the
                         # freq-refined DD pass, ~5 dB under the old one)
    (12, 6.0, False),    # 8PSK 3/5 pilotless (column-twist deint)
    (18, 13.0, True),    # 16APSK 2/3 with pilots
    (18, 14.0, False),
    (24, 17.0, True),    # 32APSK 3/4 with pilots
    (24, 18.0, False),
])
def test_higher_order_e2e(mc, snr, pilots):
    res, exact, cfg = _run(mc, snr, pilots)
    assert res.frame_ok.all(), (res.ldpc_trials, res.bch_corrections)
    assert exact == len(res.bbframes) >= 1
    assert (res.detected_pls == cfg.pls_code).all()
