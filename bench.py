#!/usr/bin/env python3
"""Benchmark: 8-carrier DVB-S2 QPSK 1/2 normal-frame demodulation, one TPU chip.

This is the BASELINE.json north-star configuration: an 8-carrier channel
bank demodulated END TO END — front end + sync + demap on device, all
128 frames per block LDPC-decoded in ONE int8 Pallas kernel call
(ops/ldpc_pallas), BCH syndromes on device, BB descramble + TS parse on
host — with the carriers vmapped into one device program per block and
a 3-deep software pipeline (upload block i+1 / compute block i /
fetch+host-parse block i-1 all overlapped), mirroring the streaming
driver's dispatch/finalize split (models/driver.py).

Headline value = DEVICE-RESIDENT throughput (input already in HBM):
the north star is "aggregate Msamples/s per chip" (BASELINE.json), a
compute metric, and the harness reaches its chip through a debugging
tunnel whose bandwidth swings 5-97 MB/s between sessions — an ingest
path no production deployment has (PCIe/DMA feeds a real TPU host at
GB/s, far above this workload's 16 MB/s-per-100-Msamp/s need). The
tunnel-bound end-to-end TS rate is still measured, asserted correct
(decoded TS bytes must match the transmitted stream), and reported in
the secondary fields.

Input is packed 4-bit IQ (frontend.pack_cs4, 1 byte/sample) — at the
5 dB operating point 4-bit quantization costs ~0 extra LDPC trials
(tests/test_carrier_bank.py).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline denominator: measured from the reference's own code compiled
headless at -O3 -march=native (tools/bench_reference.py -> REFBENCH.json,
BASELINE.md "Reference measured"): the equal-output-quality 8-carrier
aggregate bound on this host's 4-core Xeon is 4 cores x 15.35 Msamples/s
(coding stack only, all 16 SIMD lanes gated, zero front-end cost — strictly
generous to the reference) = 61.4 Msamples/s. vs_baseline is our aggregate
samples/s divided by that.
"""
import json
import sys
import time

import numpy as np

N_CARRIERS = 8


def main():
    import jax
    import jax.numpy as jnp
    jnp.arange(8.0).sum().block_until_ready()   # warm the device claim

    from dvbs_tpu.spec import modcod, scrambling, bch_spec
    from dvbs_tpu.tx import dvbs2_mod, channel
    from dvbs_tpu.parallel.mesh import build_carrier_bank, bank_block_symbols
    from dvbs_tpu.io.bbframe_parser import BBFrameParser

    mc, short = 4, False          # QPSK 1/2, normal frames (B4)
    cfg = modcod.get_config(mc, short=short)
    # block sized so the bank's 8 carriers yield exactly 128 frames —
    # one full int8 Pallas LDPC kernel batch (ops/ldpc_pallas)
    BLOCK = bank_block_symbols(N_CARRIERS, mc=mc, short=short)

    # one block of impaired IQ at the realistic operating point (5 dB:
    # a few LDPC trials per frame), broadcast to all carriers
    pkts = dvbs2_mod.random_ts_packets(1800, seed=1)
    bb = dvbs2_mod.ts_to_bbframes(pkts, cfg)
    tx = dvbs2_mod.bbframes_to_plframes(bb, cfg).reshape(-1)
    x = channel.shape(tx, sps=2)
    y = channel.impair(x, snr_db=5.0, cfo=0.01 * np.pi, delay_samples=0.4,
                       sco_ppm=10.0, seed=2)
    n = 2 * BLOCK
    from dvbs_tpu.ops import frontend
    s4 = frontend.pack_cs4(y[:n])
    samples = np.broadcast_to(s4, (N_CARRIERS, n)).copy()

    step, _ = build_carrier_bank(N_CARRIERS, mc=mc, short=short,
                                 block_symbols=BLOCK, fec="pallas",
                                 ingest="cs4")
    out = step(jnp.asarray(samples))            # compile + first run
    out_h = jax.device_get(out)
    assert out_h["ldpc_ok"].all(), "bench signal must decode cleanly"
    assert not out_h["bch_bad"].any(), "bench frames must be BCH-clean"

    kb = cfg.kbch // 8

    def host_process(h):
        """BB descramble + TS parse of one fetched block (per carrier)."""
        total = 0
        kbb = h["kbch_bytes"].reshape(N_CARRIERS, -1, kb)
        for c in range(N_CARRIERS):
            parser = BBFrameParser(cfg.kbch)
            frames = np.stack([scrambling.bb_scramble_bytes(fr)
                               for fr in kbb[c]])
            total += len(parser.feed(frames))
        return total

    # correctness: the host path must reproduce the transmitted TS bytes
    ts0 = host_process(out_h)
    sent = pkts.tobytes()
    parser = BBFrameParser(cfg.kbch)
    frames = np.stack([scrambling.bb_scramble_bytes(fr)
                       for fr in out_h["kbch_bytes"][:out_h["kbch_bytes"]
                                                     .shape[0] // N_CARRIERS]])
    got = parser.feed(frames)
    assert len(got) >= 188 * 20 and sent.find(got[:188 * 5]) >= 0, \
        "decoded TS does not match the transmitted stream"

    # ---- HEADLINE: device-resident block rate (input already in HBM) —
    # the pure compute rate a PCIe/DMA-ingest deployment sustains
    dev_in = jax.device_put(jnp.asarray(samples))
    _ = step(dev_in)
    np.asarray(jax.device_get(_["ldpc_ok"]))   # sync (axon
    #                                            block_until_ready no-op)
    t0 = time.time()
    dev_reps = 10
    for _i in range(dev_reps):
        o = step(dev_in)
    np.asarray(jax.device_get(o["ldpc_ok"]))
    dev_ms = (time.time() - t0) / dev_reps * 1e3
    dev_msps = N_CARRIERS * n / (dev_ms * 1e-3) / 1e6

    # ---- secondary: tunnel-fed end-to-end TS rate, 3-deep pipeline
    # (upload i+1 || compute i || fetch + host-parse i-1). Rep count
    # adapts to the tunnel's mood so a 5 MB/s session still finishes.
    t0 = time.time()
    up = jax.device_put(jnp.asarray(samples))
    np.asarray(jax.device_get(up[0, :1]))
    up_s = time.time() - t0
    reps = int(np.clip(30.0 / max(up_s, 1e-3), 3, 10))
    fetch_keys = ("kbch_bytes", "ldpc_ok", "bch_bad", "trials")
    prev = None
    ts_bytes = 0
    t0 = time.time()
    for _ in range(reps):
        dev_next = jax.device_put(jnp.asarray(samples))
        out = step(dev_next)
        if prev is not None:
            h = {k: np.asarray(jax.device_get(prev[k])) for k in fetch_keys}
            ts_bytes += host_process(h)
        prev = out
    h = {k: np.asarray(jax.device_get(prev[k])) for k in fetch_keys}
    ts_bytes += host_process(h)
    dt = (time.time() - t0) / reps
    assert ts_bytes >= reps * ts0 * 0.9
    e2e_msps = N_CARRIERS * n / dt / 1e6

    print(json.dumps({
        "metric": "dvbs2_qpsk12_8carrier_device_throughput",
        "value": round(dev_msps, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(dev_msps * 1e6 / 61.4e6, 4),
        "device_block_ms": round(dev_ms, 2),
        "e2e_ts_msamples_per_s": round(e2e_msps, 4),
        "e2e_vs_baseline": round(e2e_msps * 1e6 / 61.4e6, 4),
        "tunnel_mb_per_s": round(samples.nbytes / max(up_s, 1e-3) / 1e6, 1),
        "ingest": "cs4 (1 B/sample); e2e rides the axon debug tunnel",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
