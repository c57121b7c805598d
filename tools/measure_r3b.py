#!/usr/bin/env python3
"""Round-3 TPU batch 2: fused bank step + selector-span sweep.

1. Bank step at W=64 default (fused single-jit program: front end +
   Pallas FEC — saves one dispatch RTT vs the chained pair).
2. _RESAMPLE_SPAN sweep (8 / 6 / 4): the one-hot selector's candidate
   count is 2*SP+3, directly scaling the timing stage's vector-op count.
3. bench.py-style pipelined e2e for the headline number.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

N_CARRIERS = 8


def sync(x):
    import jax
    import jax.numpy as jnp
    leaf = jax.tree_util.tree_leaves(x)[0]
    probe = jnp.real(leaf).reshape(-1)[:1].astype(jnp.float32)
    np.asarray(jax.device_get(probe))


def timeit(fn, *args, reps=5):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / reps, out


def main():
    import jax
    import jax.numpy as jnp
    t0 = time.time()
    jnp.arange(8.0).sum().block_until_ready()
    print(f"device claim: {time.time() - t0:.1f}s", flush=True)

    from dvbs_tpu.spec import modcod
    from dvbs_tpu.tx import dvbs2_mod, channel
    from dvbs_tpu.ops import frontend
    from dvbs_tpu.parallel.mesh import build_carrier_bank, \
        bank_block_symbols

    mc, short = 4, False
    cfg = modcod.get_config(mc, short=short)
    BLOCK = bank_block_symbols(N_CARRIERS, mc=mc, short=short)
    pkts = dvbs2_mod.random_ts_packets(1800, seed=1)
    bb = dvbs2_mod.ts_to_bbframes(pkts, cfg)
    tx = dvbs2_mod.bbframes_to_plframes(bb, cfg).reshape(-1)
    x = channel.shape(tx, sps=2)
    y = channel.impair(x, snr_db=5.0, cfo=0.01 * np.pi, delay_samples=0.4,
                       sco_ppm=10.0, seed=2)
    n = 2 * BLOCK
    s4 = frontend.pack_cs4(y[:n])
    samples = np.broadcast_to(s4, (N_CARRIERS, n)).copy()
    dev4 = jax.device_put(jnp.asarray(samples))
    sync(dev4)
    print("upload done", flush=True)

    for sp in (8, 6, 4):
        frontend._RESAMPLE_SPAN = sp
        step, _ = build_carrier_bank(N_CARRIERS, mc=mc, short=short,
                                     block_symbols=BLOCK, fec="pallas",
                                     ingest="cs4")
        t, out = timeit(step, dev4)
        ok = np.asarray(jax.device_get(out["ldpc_ok"]))
        tr = np.asarray(jax.device_get(out["trials"]))
        msps = N_CARRIERS * n / t / 1e6
        print(f"fused bank SP={sp}: {t * 1e3:.2f} ms = {msps:.1f} Msamp/s "
              f"({msps / 61.4:.2f}x), ok {ok.sum()}/{ok.size}, "
              f"trials mean {tr.mean():.2f}", flush=True)
        if sp == 8:
            step8 = step
    frontend._RESAMPLE_SPAN = 8

    # pipelined e2e (bench.py's loop) with the SP=8 fused step
    reps = 10
    prev = None
    fetch_keys = ("kbch_bytes", "ldpc_ok", "bch_bad", "trials")
    t0 = time.time()
    for _ in range(reps):
        dev_next = jax.device_put(jnp.asarray(samples))
        out = step8(dev_next)
        if prev is not None:
            h = {k: np.asarray(jax.device_get(prev[k])) for k in fetch_keys}
        prev = out
    h = {k: np.asarray(jax.device_get(prev[k])) for k in fetch_keys}
    dt = (time.time() - t0) / reps
    print(f"pipelined e2e (no host parse): {dt * 1e3:.1f} ms = "
          f"{N_CARRIERS * n / dt / 1e6:.1f} Msamp/s", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
