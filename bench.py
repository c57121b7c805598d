#!/usr/bin/env python3
"""Benchmark: end-to-end DVB-S2 QPSK 1/2 normal-frame demodulation on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline denominator: the reference implementation publishes no end-to-end
numbers (BASELINE.md). Its LDPC stage — the pipeline's bottleneck — decodes
one clean DVB-S2 B4 (QPSK 1/2 normal) frame in ~10 ms on the upstream
author's workstation (xdsopl-ldpc-pabr/README.md:31), i.e. <=100 frames/s
even with zero time spent in the rest of the chain, and the shipped plugin
LDPC-decodes only 1 of every 16 frames at that. vs_baseline is therefore
our end-to-end decoded frames/s divided by 100.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jnp.arange(8.0).sum().block_until_ready()   # warm the compile helper

    from dvbs_tpu.spec import modcod, scrambling
    from dvbs_tpu.tx import dvbs2_mod, channel
    from dvbs_tpu.models.dvbs2 import DVBS2Receiver

    mc, short = 4, False          # QPSK 1/2, normal frames (B4)
    cfg = modcod.get_config(mc, short=short)
    block_symbols = 1 << 17       # 3 normal PL frames per block

    # build one block's worth of impaired IQ (moderate noise: LDPC works,
    # a few iterations per frame — the realistic operating point)
    pkts = dvbs2_mod.random_ts_packets(1800, seed=1)
    bb = dvbs2_mod.ts_to_bbframes(pkts, cfg)
    tx = dvbs2_mod.bbframes_to_plframes(bb, cfg).reshape(-1)
    x = channel.shape(tx, sps=2)
    y = channel.impair(x, snr_db=5.0, cfo=0.01 * np.pi, delay_samples=0.4,
                       sco_ppm=10.0, seed=2)
    n = 2 * block_symbols
    samples = y[:n]

    rx = DVBS2Receiver(mc=mc, short=short, block_symbols=block_symbols)
    res = rx.process_symbols_block(samples)      # compile + first run
    assert res.frame_ok.all(), "bench signal must decode cleanly"

    reps = 10
    t0 = time.time()
    for _ in range(reps):
        res = rx.process_symbols_block(samples)
    dt = (time.time() - t0) / reps

    frames_per_s = rx.n_frames / dt
    samp_per_s = n / dt
    expect = {f.tobytes() for f in scrambling.bb_scramble_bytes(bb)}
    exact = sum(1 for f in res.bbframes if f.tobytes() in expect)
    assert exact == len(res.bbframes) == rx.n_frames, "output not byte-exact"

    print(json.dumps({
        "metric": "dvbs2_qpsk12_normal_e2e_throughput",
        "value": round(samp_per_s / 1e6, 4),
        "unit": "Msamples/s",
        "vs_baseline": round(frames_per_s / 100.0, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
