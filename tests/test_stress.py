"""Stress conditions: phase noise and large carrier offsets."""
import numpy as np
import pytest

from dvbs_tpu.spec import modcod, scrambling
from dvbs_tpu.tx import dvbs2_mod, channel
from dvbs_tpu.models.dvbs2 import DVBS2Receiver


@pytest.mark.parametrize("kw,pilots", [
    (dict(snr_db=7.0, phase_noise_std=2e-3), True),    # Wiener phase noise
    (dict(snr_db=7.0, phase_noise_std=1e-3), False),   # V&V must track it
    (dict(snr_db=7.0, cfo=0.1 * np.pi), False),        # CFO = 10% of fs
])
def test_s2_stress(kw, pilots):
    cfg = modcod.get_config(4, short=True, pilots=pilots)
    pkts = dvbs2_mod.random_ts_packets(300, seed=1)
    bb = dvbs2_mod.ts_to_bbframes(pkts, cfg)
    tx = dvbs2_mod.bbframes_to_plframes(bb, cfg).reshape(-1)
    y = channel.impair(channel.shape(tx, 2), seed=2, **kw)
    rx = DVBS2Receiver(mc=4, short=True, pilots=pilots,
                       block_symbols=1 << 15)
    res = rx.process_symbols_block(y[:2 << 15])
    assert res.frame_ok.all(), (res.ldpc_trials, res.bch_corrections)
    expect = {f.tobytes() for f in scrambling.bb_scramble_bytes(bb)}
    assert sum(1 for f in res.bbframes if f.tobytes() in expect) == \
        len(res.bbframes)
