"""Auto-MODCOD: the 50-frame consistency vote reconfigures the stream."""
import numpy as np

from dvbs_tpu.spec import modcod
from dvbs_tpu.tx import dvbs2_mod, channel
from dvbs_tpu.models.driver import DVBS2Stream


def test_auto_modcod_switches_configuration():
    # transmit 8PSK 2/3 short frames; receiver starts configured for
    # QPSK 1/2 short with auto_modcod on
    cfg_true = modcod.get_config(13, short=True, pilots=False)
    pkts = dvbs2_mod.random_ts_packets(1200, seed=5)
    bb = dvbs2_mod.ts_to_bbframes(pkts, cfg_true)
    tx = dvbs2_mod.bbframes_to_plframes(bb, cfg_true).reshape(-1)
    x = channel.shape(tx, sps=2)
    y = channel.impair(x, snr_db=11.0, cfo=0.005 * np.pi, delay_samples=0.3,
                       seed=6)
    y = np.concatenate([y, y, y])   # ~34 confident votes per pass

    stream = DVBS2Stream(mc=4, short=True, pilots=False,
                         block_symbols=1 << 15, auto_modcod=True)
    switched_to = []
    stream.on_modcod_switch = lambda cfg: switched_to.append(cfg)
    out = bytearray()
    step = 120000
    for i in range(0, len(y), step):
        out.extend(stream.feed(y[i:i + step]))
    # the PLS detector sees 8PSK 2/3 (pls 54) on every frame; after the
    # 50-frame vote the stream must have reconfigured and started decoding
    assert stream.cfg.modcod == 13, stream.cfg
    # the persistence hook (CLI writes the vote back to Config, as the
    # reference does, main.cpp:383-408) fired with the new config
    assert len(switched_to) == 1 and switched_to[0].modcod == 13
    assert stream.metrics.detected_modcod == 13
    got = np.frombuffer(bytes(out), np.uint8)
    got = got[:len(got) // 188 * 188].reshape(-1, 188)
    sent = {r.tobytes() for r in pkts.reshape(-1, 188)}
    matched = sum(1 for r in got if r.tobytes() in sent)
    assert matched >= max(1, len(got) - 2)
    assert len(got) > 50
