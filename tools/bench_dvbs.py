#!/usr/bin/env python3
"""Benchmark: DVB-S QPSK Viterbi chain, one TPU chip (BASELINE config 1).

Streams a rate-1/2 QPSK signal through DVBSStream end to end (device
front end + batched Viterbi; host deframe/deinterleave/RS/descramble)
and reports aggregate samples/s plus the stage split. Reference
denominator: 6.75 Msamples/s/core measured from the reference's own
Viterbi+RS compiled headless (REFBENCH.json / BASELINE.md).

Run on the real chip: python tools/bench_dvbs.py
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

BLOCK_SYMBOLS = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 18


def main():
    import jax
    import jax.numpy as jnp
    jnp.arange(8.0).sum().block_until_ready()

    from dvbs_tpu.models.dvbs import DVBSStream
    from dvbs_tpu.tx import dvbs_mod, channel

    ts = dvbs_mod.random_ts_groups(360, seed=3)
    mod = dvbs_mod.DVBSModulator(rate="1/2")
    tx = mod.ts_to_symbols(ts)
    y = channel.impair(channel.shape(tx, sps=2), snr_db=9.0,
                       cfo=0.004 * np.pi, seed=4)

    s = DVBSStream(rate="1/2", block_symbols=BLOCK_SYMBOLS)
    # warm up: first feed compiles the front + viterbi programs
    warm = 4 * BLOCK_SYMBOLS
    out0 = s.feed(y[:warm])
    assert s.metrics.viterbi_lock, "bench signal must lock"

    t0 = time.time()
    out = s.feed(y[warm:])
    dt = time.time() - t0
    n = len(y) - warm
    sent = ts.tobytes()
    got = out0 + out
    assert len(got) >= 188 * 100 and sent.find(got[:188 * 5]) >= 0, \
        "TS output does not match the transmitted stream"

    samp_per_s = n / dt

    # ---- 8-carrier device-resident bank: vmap the locked fused chain
    # (front + depuncture + Viterbi + BER) over a carrier axis — the
    # DVB-S analogue of the S2 bank in parallel/mesh.py
    C = 8
    rx = s.rx
    nblk = 2 * rx.block_symbols
    chain, n_pairs = rx._get_locked_chain(nblk)
    vm_chain = jax.jit(jax.vmap(chain))
    blk = y[warm:warm + nblk]
    rms = np.sqrt(np.mean(np.abs(blk) ** 2))
    ri = np.stack([(blk.real / rms).astype(np.float16),
                   (blk.imag / rms).astype(np.float16)])
    ric = np.broadcast_to(ri, (C, 2, nblk)).copy()
    hints = np.broadcast_to(np.asarray(rx._hints, np.float32), (C, 5)).copy()
    hints[:, 4] = 1.0          # fresh acquisition per carrier
    carry = np.zeros((C, len(rx._llr_carry)), np.float32)
    dev = (jax.device_put(jnp.asarray(ric)),
           jax.device_put(jnp.asarray(hints)),
           jax.device_put(jnp.asarray(carry)))
    out = vm_chain(*dev)
    ber0 = np.asarray(jax.device_get(out["ber"]))
    assert (ber0 < 0.15).all(), f"bank must stay locked, ber={ber0}"
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        out = vm_chain(*dev)
    np.asarray(jax.device_get(out["ber"]))   # sync
    dev_dt = (time.time() - t0) / reps
    bank_msps = C * nblk / dev_dt / 1e6

    print(json.dumps({
        "metric": "dvbs_qpsk12_e2e_ts_throughput",
        "value": round(samp_per_s / 1e6, 4),
        "unit": "Msamples/s",
        "vs_baseline": round(samp_per_s / 6.75e6, 4),
        "bank8_device_resident_msamples_per_s": round(bank_msps, 2),
        "bank8_device_vs_baseline_4core": round(
            bank_msps * 1e6 / (4 * 6.75e6), 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
