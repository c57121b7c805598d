#!/usr/bin/env python3
"""Benchmark: 8-carrier DVB-S2 QPSK 1/2 normal-frame demodulation, one TPU chip.

This is the BASELINE.json north-star configuration: an 8-carrier channel
bank demodulated END TO END — front end + sync + demap + LDPC (one int8
B=128 Pallas kernel) + BCH syndromes + BB descramble all on device, TS
parse in native C++ on host — with the carriers vmapped into one device
program per block and a 3-deep software pipeline (upload block i+1 /
compute block i / fetch+host-parse block i-1 all overlapped), mirroring
the streaming driver's dispatch/finalize split (models/driver.py).

Headline value = DEVICE-RESIDENT throughput (input already in HBM):
the official metric per BASELINE.md "Official metric" — a compute
number, because the harness reaches its chip through a debugging
tunnel whose bandwidth swings 5-97 MB/s between sessions, an ingest
path no production deployment has (PCIe/DMA feeds a real TPU host at
GB/s, far above this workload's 16 MB/s-per-100-Msamp/s need at cs4).
The quality gate stays end-to-end: every carrier's decoded TS bytes
must match ITS OWN transmitted stream (8 distinct signals), and the
host tail's standalone throughput is measured and reported
(host_stage_msamples_per_s) to prove the host stages sustain the
device rate — so the end-to-end number is bounded by upload bytes/s
alone.

Input is packed 4-bit IQ (frontend.pack_cs4, 1 byte/sample) — at the
5 dB operating point 4-bit quantization costs ~0 extra LDPC trials
(tests/test_carrier_bank.py).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
plus secondary fields: e2e rate, host-stage rate, sustained ingest
MB/s measured over the pipelined loop, and the DVB-S device-resident
chain rate (dvbs_* fields, vs REFBENCH viterbi_12_synced).

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
REF_AGGREGATE = 61.4e6          # 4 cores x 15.35 Msamples/s (BASELINE.md)
REF_DVBS_PER_CORE = 6.785e6     # REFBENCH viterbi_12_synced


def bench_dvbs_device(jax, jnp):
    """Device-resident DVB-S throughput: 8-carrier locked-chain bank
    (front end + depuncture + Viterbi + re-encode BER + bitpack fused,
    models/dvbs.py), input already in HBM. Quality gate: every
    carrier's bits run through the native C++ host tail (deframe +
    deinterleave + RS + descramble) and must reproduce that carrier's
    OWN transmitted TS packets. Returns (msps, block_ms, host_msps)."""
    from dvbs_tpu.parallel.dvbs_bank import build_dvbs_bank
    from dvbs_tpu.io.native import NativeDVBSTail
    from dvbs_tpu.tx import dvbs_mod, channel

    n = 2 * (1 << 16)
    sigs, sents = [], []
    for c in range(N_CARRIERS):
        ts = dvbs_mod.random_ts_groups(6, seed=40 + c)
        mod = dvbs_mod.DVBSModulator(rate="1/2")
        tx = mod.ts_to_symbols(ts)
        x = channel.shape(tx, sps=2)
        y = channel.impair(x, snr_db=8.0, cfo=(0.004 + 0.002 * c) * np.pi,
                           delay_samples=0.2 + 0.1 * c, seed=50 + c)
        assert len(y) >= n
        sigs.append(y[:n])
        sents.append({r.tobytes() for r in ts.reshape(-1, 188)})
    from dvbs_tpu.ops import frontend
    samples = np.stack([frontend.pack_cs4(s) for s in sigs])

    step, _ = build_dvbs_bank(N_CARRIERS, rate="1/2", block_samples=n)
    out = step(jnp.asarray(samples))
    ber = np.asarray(jax.device_get(out["ber"]))
    assert (ber < 0.05).all(), f"bench DVB-S chains must be clean: {ber}"
    n_pairs = out["n_pairs"]
    bitsp = np.asarray(jax.device_get(out["bits"]))
    bits = np.unpackbits(bitsp, axis=1)[:, :n_pairs]
    for c in range(N_CARRIERS):
        got = NativeDVBSTail().feed(np.ascontiguousarray(bits[c]))
        matched = sum(1 for r in got if r.tobytes() in sents[c])
        assert len(got) >= 8 and matched >= len(got) - 16, \
            f"carrier {c}: TS mismatch ({matched}/{len(got)})"

    # host-tail standalone rate: C++ deframe+deint+RS+descramble must
    # sustain the device rate (each rep re-syncs at the block seam —
    # strictly pessimistic)
    bits_c = [np.ascontiguousarray(bits[c]) for c in range(N_CARRIERS)]
    tails = [NativeDVBSTail() for _ in range(N_CARRIERS)]
    for c in range(N_CARRIERS):
        tails[c].feed(bits_c[c])
    t0 = time.time()
    host_reps = 5
    for _ in range(host_reps):
        for c in range(N_CARRIERS):
            tails[c].feed(bits_c[c])
    host_msps = N_CARRIERS * n * host_reps / (time.time() - t0) / 1e6

    dev_in = jax.device_put(jnp.asarray(samples))
    o = step(dev_in)
    np.asarray(jax.device_get(o["ber"]))       # sync
    t0 = time.time()
    reps = 10
    for _ in range(reps):
        o = step(dev_in)
    np.asarray(jax.device_get(o["ber"]))
    ms = (time.time() - t0) / reps * 1e3
    return N_CARRIERS * n / (ms * 1e-3) / 1e6, ms, host_msps


def main():
    import jax
    import jax.numpy as jnp
    jnp.arange(8.0).sum().block_until_ready()   # warm the device claim

    from dvbs_tpu.spec import modcod
    from dvbs_tpu.tx import dvbs2_mod, channel
    from dvbs_tpu.parallel.mesh import build_carrier_bank, bank_block_symbols
    from dvbs_tpu.io import native as io_native
    assert io_native.available(), "run `make -C native` first"
    from dvbs_tpu.io.native import NativeTSParser

    mc, short = 4, False          # QPSK 1/2, normal frames (B4)
    cfg = modcod.get_config(mc, short=short)
    # block sized so the bank's 8 carriers yield exactly 128 frames —
    # one full int8 Pallas LDPC kernel batch (ops/ldpc_pallas)
    BLOCK = bank_block_symbols(N_CARRIERS, mc=mc, short=short)
    n = 2 * BLOCK
    kb = cfg.kbch // 8

    # one block of impaired IQ at the realistic operating point (5 dB:
    # a few LDPC trials per frame) — a DISTINCT signal per carrier
    # (independent payload/CFO/delay) so the vote, early-exit gate and
    # per-carrier TS check all see mixed conditions
    from dvbs_tpu.ops import frontend
    sigs, sents = [], []
    for c in range(N_CARRIERS):
        pkts = dvbs2_mod.random_ts_packets(1800, seed=10 + c)
        bb = dvbs2_mod.ts_to_bbframes(pkts, cfg)
        tx = dvbs2_mod.bbframes_to_plframes(bb, cfg).reshape(-1)
        x = channel.shape(tx, sps=2)
        y = channel.impair(x, snr_db=5.0, cfo=(0.008 + 0.002 * c) * np.pi,
                           delay_samples=0.2 + 0.1 * c, sco_ppm=10.0,
                           seed=20 + c)
        assert len(y) >= n
        sigs.append(frontend.pack_cs4(y[:n]))
        sents.append(pkts.tobytes())
    samples = np.stack(sigs)

    step, _ = build_carrier_bank(N_CARRIERS, mc=mc, short=short,
                                 block_symbols=BLOCK, fec="pallas",
                                 ingest="cs4")
    out = step(jnp.asarray(samples))            # compile + first run
    out_h = {k: np.asarray(jax.device_get(v)) for k, v in out.items()}
    assert out_h["ldpc_ok"].all(), "bench signal must decode cleanly"
    assert not out_h["bch_bad"].any(), "bench frames must be BCH-clean"

    def host_process(h, parsers):
        """Host tail of one fetched block: native TS parse per carrier
        (BB descramble already happened on device)."""
        total = 0
        kbb = np.ascontiguousarray(h["kbch_bytes"].reshape(N_CARRIERS, -1, kb))
        for c in range(N_CARRIERS):
            total += len(parsers[c].feed(kbb[c]))
        return total

    # correctness: every carrier's host path must reproduce ITS OWN
    # transmitted TS bytes
    parsers = [NativeTSParser(cfg.kbch) for _ in range(N_CARRIERS)]
    kbb = np.ascontiguousarray(out_h["kbch_bytes"].reshape(N_CARRIERS, -1, kb))
    ts0 = 0
    for c in range(N_CARRIERS):
        got = parsers[c].feed(kbb[c])
        assert len(got) >= 188 * 20 and sents[c].find(got[:188 * 5]) >= 0, \
            f"carrier {c}: decoded TS does not match its transmitted stream"
        ts0 += len(got)

    # ---- host-stage standalone throughput: proves the host tail
    # sustains (far exceeds) the device rate, so e2e is bounded by
    # ingest alone
    parsers = [NativeTSParser(cfg.kbch) for _ in range(N_CARRIERS)]
    host_process(out_h, parsers)               # warm/resync
    t0 = time.time()
    host_reps = 20
    for _ in range(host_reps):
        host_process(out_h, parsers)
    host_s = (time.time() - t0) / host_reps
    host_msps = N_CARRIERS * n / host_s / 1e6

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
    parsers = [NativeTSParser(cfg.kbch) for _ in range(N_CARRIERS)]
    prev = None
    ts_bytes = 0
    t0 = time.time()
    for _ in range(reps):
        dev_next = jax.device_put(jnp.asarray(samples))
        out = step(dev_next)
        if prev is not None:
            h = {k: np.asarray(jax.device_get(prev[k])) for k in fetch_keys}
            ts_bytes += host_process(h, parsers)
        prev = out
    h = {k: np.asarray(jax.device_get(prev[k])) for k in fetch_keys}
    ts_bytes += host_process(h, parsers)
    dt = (time.time() - t0) / reps
    assert ts_bytes >= reps * ts0 * 0.9
    e2e_msps = N_CARRIERS * n / dt / 1e6
    # sustained ingest over the WHOLE pipelined loop (upload bytes /
    # wall time): a lower bound on the tunnel's sustained rate, unlike
    # a single device_put sample which can eat a latency spike
    ingest_mb_per_s = samples.nbytes * reps / (dt * reps) / 1e6

    # ---- DVB-S chain, device-resident (REFBENCH viterbi_12_synced is
    # the per-core bar: 6.79 Msamples/s)
    dvbs_msps, dvbs_ms, dvbs_host_msps = bench_dvbs_device(jax, jnp)

    print(json.dumps({
        "metric": "dvbs2_qpsk12_8carrier_device_throughput",
        "value": round(dev_msps, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(dev_msps * 1e6 / REF_AGGREGATE, 4),
        "device_block_ms": round(dev_ms, 2),
        "host_stage_msamples_per_s": round(host_msps, 1),
        "e2e_ts_msamples_per_s": round(e2e_msps, 4),
        "e2e_vs_baseline": round(e2e_msps * 1e6 / REF_AGGREGATE, 4),
        "ingest_mb_per_s_sustained": round(ingest_mb_per_s, 1),
        "dvbs_device_msamples_per_s": round(dvbs_msps, 2),
        "dvbs_block_ms": round(dvbs_ms, 2),
        "dvbs_vs_ref_core": round(dvbs_msps * 1e6 / REF_DVBS_PER_CORE, 3),
        "dvbs_host_stage_msamples_per_s": round(dvbs_host_msps, 1),
        "ingest": "cs4 (1 B/sample); e2e rides the axon debug tunnel",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
