#!/usr/bin/env python3
"""Round-3 TPU measurement batch (one process — device-claim lottery).

1. Timing-resampler window-count sweep at bench scale (the a156cca
   coefficient-fold regression measured 243 ms for this stage; the
   restored one-hot select + adaptive windows is the fix under test).
2. Fused vm_core at bench scale per window count.
3. Full bank step (vm_core + Pallas FEC) with the chosen default.
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
    from dvbs_tpu.models.dvbs2 import DVBS2Receiver

    mc, short = 4, False
    cfg = modcod.get_config(mc, short=short)
    BLOCK = bank_block_symbols(N_CARRIERS, mc=mc, short=short)
    print(f"block {BLOCK} symbols/carrier", flush=True)
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

    auto_w = frontend._auto_windows(BLOCK)
    print(f"auto windows at this scale: {auto_w}", flush=True)

    orig_auto = frontend._auto_windows
    results = {}
    for W in (auto_w, 16, 64):
        if W in results:
            continue
        frontend._auto_windows = lambda S, W=W: W if S % W == 0 \
            else orig_auto(S)
        rx = DVBS2Receiver(mc=mc, short=short, block_symbols=BLOCK)
        vm_core = jax.jit(
            lambda p, core=rx._sym_fn: jax.vmap(core)(
                frontend.unpack_cs4(p)))
        t, out = timeit(vm_core, dev4)
        results[W] = t
        print(f"  vm_core W={W:3d}: {t * 1e3:7.2f} ms", flush=True)
    frontend._auto_windows = orig_auto

    # full bank step at the default
    step, _ = build_carrier_bank(N_CARRIERS, mc=mc, short=short,
                                 block_symbols=BLOCK, fec="pallas",
                                 ingest="cs4")
    t, out = timeit(step, dev4)
    ok = np.asarray(jax.device_get(out["ldpc_ok"]))
    tr = np.asarray(jax.device_get(out["trials"]))
    msps = N_CARRIERS * n / t / 1e6
    print(f"bank step: {t * 1e3:.2f} ms = {msps:.1f} Msamples/s "
          f"({msps / 61.4:.2f}x baseline), ok {ok.sum()}/{ok.size}, "
          f"trials mean {tr.mean():.1f}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
