#!/usr/bin/env python3
"""Round-4: fused S2 bank step timing after the deint/unwrap fixes,
plus a bisect of the sum-vs-fused gap (front-end program vs FEC program
vs one fused program). Run on the real chip."""
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
    from dvbs_tpu.ops import frontend, ldpc_pallas
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

    # fused step (the bench program)
    step, _ = build_carrier_bank(N_CARRIERS, mc=mc, short=short,
                                 block_symbols=BLOCK, fec="pallas",
                                 ingest="cs4")
    tb = tloop(step, dev)
    out = step(dev)
    ok = np.asarray(jax.device_get(out["ldpc_ok"]))
    tr = np.asarray(jax.device_get(out["trials"]))
    print(f"fused bank step: {tb:.2f} ms = {N_CARRIERS*n/tb/1e3:.1f} Msamp/s"
          f"  ldpc_ok={ok.sum()}/128 trials mean {tr.mean():.2f}", flush=True)

    # bisect: front-end program alone, then FEC program alone
    from dvbs_tpu.models.dvbs2 import DVBS2Receiver
    rx = DVBS2Receiver(mc=mc, short=short, block_symbols=BLOCK)
    core = rx._sym_fn
    N = cfg.nldpc

    @jax.jit
    def front_only(p):
        out = jax.vmap(core)(frontend.unpack_cs4(p))
        return out["llrs"].reshape(N_CARRIERS * rx.n_frames, N)

    tf = tloop(front_only, dev)
    llrs = front_only(dev)
    sync(llrs)

    @jax.jit
    def fec_only(l):
        h, nb, t = ldpc_pallas.decode_qc_pallas(
            ldpc_pallas.quantize_llrs(l), cfg.ldpc_table, n_iters=12)
        return h[:, :64], nb, t

    tfec = tloop(fec_only, llrs)
    print(f"front-end program: {tf:.2f} ms   fec program: {tfec:.2f} ms  "
          f"sum {tf+tfec:.2f} vs fused {tb:.2f}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
