"""Self-contained loopback demo: modulate -> impair -> demodulate -> verify.

Run (CPU):  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/loopback_demo.py
Run (TPU):  python examples/loopback_demo.py
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from dvbs_tpu.spec import modcod
from dvbs_tpu.tx import dvbs2_mod, channel
from dvbs_tpu.models.driver import DVBS2Stream

MC, SHORT, PILOTS = 4, True, False           # QPSK 1/2, short frames
SNR_DB, CFO = 4.0, 0.015 * np.pi

cfg = modcod.get_config(MC, short=SHORT, pilots=PILOTS)
print(f"MODCOD {MC}: {cfg.constellation} {cfg.rate} {cfg.framesize} "
      f"pilots={cfg.pilots} (PLS {cfg.pls_code})")

pkts = dvbs2_mod.random_ts_packets(600, seed=1)
bb = dvbs2_mod.ts_to_bbframes(pkts, cfg)
tx_syms = dvbs2_mod.bbframes_to_plframes(bb, cfg).reshape(-1)
iq = channel.impair(channel.shape(tx_syms, sps=2), snr_db=SNR_DB, cfo=CFO,
                    delay_samples=0.6, sco_ppm=20.0, seed=2)
print(f"channel: {SNR_DB} dB Es/N0, CFO {CFO:.4f} rad/sample, "
      f"0.6-sample delay, 20 ppm clock offset -> {len(iq)} samples")

rx = DVBS2Stream(mc=MC, short=SHORT, pilots=PILOTS, block_symbols=1 << 15)
ts = bytearray()
for i in range(0, len(iq), 120000):
    ts.extend(rx.feed(iq[i:i + 120000]))

got = np.frombuffer(bytes(ts), np.uint8)
got = got[:len(got) // 188 * 188].reshape(-1, 188)
sent = {r.tobytes() for r in pkts.reshape(-1, 188)}
ok = sum(1 for r in got if r.tobytes() in sent)
m = rx.metrics
print(f"recovered {len(got)} TS packets, {ok} byte-exact "
      f"({m.frames_ok}/{m.frames_seen} frames, sync {m.pl_sync_best_match:.2f}, "
      f"max LDPC trials {m.ldpc_trials}, detected MODCOD {m.detected_modcod})")
assert ok == len(got) > 0
print("loopback OK")
