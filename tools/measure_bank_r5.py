#!/usr/bin/env python3
"""Round-5: fused S2 bank step with the XLA barrel resampler vs the
fused Pallas resampler kernel (ops/resample_pallas), on chip."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

N_CARRIERS = 8


def main():
    import jax
    import jax.numpy as jnp
    t0 = time.time()
    jnp.arange(8.0).sum().block_until_ready()
    print(f"device claim: {time.time() - t0:.1f}s", flush=True)

    from dvbs_tpu.spec import modcod
    from dvbs_tpu.ops import frontend
    from dvbs_tpu.tx import dvbs2_mod, channel
    from dvbs_tpu.parallel.mesh import build_carrier_bank, bank_block_symbols

    mc, short = 4, False
    cfg = modcod.get_config(mc, short=short)
    BLOCK = bank_block_symbols(N_CARRIERS, mc=mc, short=short)
    n = 2 * BLOCK

    sigs = []
    for c in range(N_CARRIERS):
        pkts = dvbs2_mod.random_ts_packets(1800, seed=10 + c)
        bb = dvbs2_mod.ts_to_bbframes(pkts, cfg)
        tx = dvbs2_mod.bbframes_to_plframes(bb, cfg).reshape(-1)
        x = channel.shape(tx, sps=2)
        y = channel.impair(x, snr_db=5.0, cfo=(0.008 + 0.002 * c) * np.pi,
                           delay_samples=0.2 + 0.1 * c, sco_ppm=10.0,
                           seed=20 + c)
        sigs.append(frontend.pack_cs4(y[:n]))
    dev = jax.device_put(jnp.asarray(np.stack(sigs)))
    print("signals uploaded", flush=True)

    def sync(o):
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(o)[0]))

    def tloop(fn, x, reps=10):
        o = fn(x)
        sync(o)
        t0 = time.time()
        for _ in range(reps):
            o = fn(x)
        sync(o)
        return (time.time() - t0) / reps * 1e3

    from dvbs_tpu.ops import ldpc_pallas
    res = {}
    steps = {}
    combos = [("xla", "natural"), ("pallas", "natural"),
              ("pallas", "oriented")]
    for rep in range(2):
        for rs, sched in combos:
            frontend.RESAMPLER_IMPL = rs
            ldpc_pallas.SCHEDULE = sched
            key = f"{rs}/{sched}"
            if key not in steps:
                steps[key], _ = build_carrier_bank(
                    N_CARRIERS, mc=mc, short=short, block_symbols=BLOCK,
                    fec="pallas", ingest="cs4")
            step = steps[key]
            tb = tloop(step, dev)
            out = step(dev)
            ok = np.asarray(jax.device_get(out["ldpc_ok"]))
            tr = np.asarray(jax.device_get(out["trials"]))
            kb = np.asarray(jax.device_get(out["kbch_bytes"]))
            res.setdefault(key, []).append((tb, kb))
            print(f"[{key:16s}] fused bank step: {tb:.2f} ms = "
                  f"{N_CARRIERS*n/tb/1e3:.1f} Msamp/s  "
                  f"ldpc_ok={ok.sum()}/128 trials mean {tr.mean():.2f}",
                  flush=True)
    frontend.RESAMPLER_IMPL = "auto"
    ldpc_pallas.SCHEDULE = "natural"
    ref = res["xla/natural"][0][1]
    for key, vals in res.items():
        same = all(np.array_equal(ref, kb) for _, kb in vals)
        best = min(tb for tb, _ in vals)
        print(f"{key}: best {best:.2f} ms, outputs identical: {same}",
              flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
