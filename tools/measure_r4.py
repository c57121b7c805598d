#!/usr/bin/env python3
"""Round-4 TPU batch: LDPC layout + FIR precision + selector span.

One process (device-claim lottery), device-resident timings only (the
tunnel is non-stationary). Measures, in order:

1. fused 8-carrier bank step, current defaults (reshape LDPC layout,
   bf16 matched filter, kernel-online syndrome) — headline block ms
2. matched filter bf16 vs HIGHEST-f32 (fused core only)
3. Pallas LDPC decode alone: syndrome kernel vs xla, n_iters 8 vs 12
4. _RESAMPLE_SPAN sweep 8/6/4 on the fused bank
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
    from dvbs_tpu.ops import frontend, ldpc_pallas
    from dvbs_tpu.models.dvbs2 import DVBS2Receiver
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
    one = np.stack([y[:n].real, y[:n].imag]).astype(np.float16)
    devf = jax.device_put(jnp.asarray(
        np.broadcast_to(one, (N_CARRIERS, 2, n)).copy()))
    sync(dev4)
    sync(devf)
    print("upload done", flush=True)

    def bank_ms(step, dev):
        t, out = timeit(step, dev)
        ok = np.asarray(jax.device_get(out["ldpc_ok"]))
        tr = np.asarray(jax.device_get(out["trials"]))
        bad = np.asarray(jax.device_get(out["bch_bad"]))
        msps = N_CARRIERS * n / t / 1e6
        return t, out, (f"{t * 1e3:6.2f} ms = {msps:6.1f} Msamp/s "
                        f"({msps / 61.4:.2f}x)  ok {ok.sum()}/{ok.size} "
                        f"bch_bad {bad.sum()}  trials mean {tr.mean():.2f}")

    # ---- 1. fused bank, current defaults -----------------------------
    step, _ = build_carrier_bank(N_CARRIERS, mc=mc, short=short,
                                 block_symbols=BLOCK, fec="pallas",
                                 ingest="cs4")
    t, out, msg = bank_ms(step, dev4)
    print(f"bank default       {msg}", flush=True)

    # ---- 2. matched filter precision (fused core only) ---------------
    rx = DVBS2Receiver(mc=mc, short=short, block_symbols=BLOCK)
    vm_core = jax.jit(jax.vmap(rx._sym_fn))
    t, core_out = timeit(vm_core, devf)
    print(f"vm_core bf16 MF    {t * 1e3:6.2f} ms", flush=True)

    orig_fir = frontend.fir_filter
    frontend.fir_filter = \
        lambda xx, taps, bf16=True: orig_fir(xx, taps, bf16=False)
    rx_hi = DVBS2Receiver(mc=mc, short=short, block_symbols=BLOCK)
    vm_hi = jax.jit(jax.vmap(rx_hi._sym_fn))
    t, _ = timeit(vm_hi, devf)
    print(f"vm_core f32hi MF   {t * 1e3:6.2f} ms", flush=True)
    frontend.fir_filter = orig_fir

    # ---- 3. Pallas decode alone ---------------------------------------
    llrs = core_out["llrs"].reshape(N_CARRIERS * rx.n_frames, -1)
    li8 = jax.jit(ldpc_pallas.quantize_llrs)(llrs)
    sync(li8)
    for iters in (8, 12):
        for syn in ("kernel", "xla"):
            dec = jax.jit(lambda l, it=iters, sy=syn:
                          ldpc_pallas.decode_qc_pallas(
                              l, cfg.ldpc_table, n_iters=it, syndrome=sy))
            t, (hard, bad, tr) = timeit(dec, li8)
            badh = np.asarray(jax.device_get(bad))
            trh = np.asarray(jax.device_get(tr))
            print(f"pallas it={iters:2d} syn={syn:6s} {t * 1e3:6.2f} ms  "
                  f"({128 / t:5.0f} fr/s) bad_frames "
                  f"{(badh > 0).sum()} trials mean {trh.mean():.2f}",
                  flush=True)

    # ---- 4. selector span sweep ---------------------------------------
    orig_sp = frontend._RESAMPLE_SPAN
    for sp in (8, 6, 4):
        frontend._RESAMPLE_SPAN = sp
        steps, _ = build_carrier_bank(N_CARRIERS, mc=mc, short=short,
                                      block_symbols=BLOCK, fec="pallas",
                                      ingest="cs4")
        t, out, msg = bank_ms(steps, dev4)
        print(f"bank SP={sp}          {msg}", flush=True)
    frontend._RESAMPLE_SPAN = orig_sp
    print("done", flush=True)


if __name__ == "__main__":
    main()
