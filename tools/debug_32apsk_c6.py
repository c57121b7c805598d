#!/usr/bin/env python3
"""Diagnose the bench 32APSK carrier-6 failure: per-carrier sync
quality / PLS / trials from the fused bank, then single-carrier
sensitivity sweeps over the suspect parameters (seed, delay, cfo)."""
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    jnp.arange(8.0).sum().block_until_ready()

    import bench as bm
    from dvbs_tpu.spec import modcod
    from dvbs_tpu.ops import frontend
    from dvbs_tpu.parallel.mesh import build_carrier_bank, bank_block_symbols

    mc, snr_db = 24, 14.5
    cfg = modcod.get_config(mc, short=False, pilots=True)
    BLOCK = bank_block_symbols(bm.N_CARRIERS, mc=mc, short=False, pilots=True)
    n = 2 * BLOCK

    def mk(seed, cfo, delay):
        y, _ = bm.s2_carrier_signal(cfg, 700, seed, cfo, delay,
                                    snr_db=snr_db)
        return frontend.pack_cs4(y[:n])

    step, _ = build_carrier_bank(bm.N_CARRIERS, mc=mc, short=False,
                                 pilots=True, block_symbols=BLOCK,
                                 fec="pallas", ingest="cs4", n_iters=12)

    def run(sigs, tag):
        out = step(jnp.asarray(np.stack(sigs)))
        h = {k: np.asarray(jax.device_get(v)) for k, v in out.items()}
        F = h["quality"].shape[1]
        okc = h["ldpc_ok"].reshape(bm.N_CARRIERS, F).sum(1)
        trc = h["trials"].reshape(bm.N_CARRIERS, F).mean(1)
        print(f"[{tag}] ok/carrier {okc.tolist()}  q "
              f"{np.round(h['quality'].min(1), 3).tolist()}  "
              f"trials {np.round(trc, 1).tolist()}", flush=True)
        if "pls" in h:
            print(f"    pls rows ok: "
                  f"{(h['pls'] == cfg.pls_code).all(1).tolist()}", flush=True)
        return h

    # 1. the bench configuration verbatim
    bench_sigs = [mk(110 + 3 * c, (0.006 + 0.002 * c) * np.pi,
                     0.25 + 0.1 * c) for c in range(bm.N_CARRIERS)]
    run(bench_sigs, "bench verbatim")

    # 2. isolate: carrier 6's signal alone in every lane
    c6 = mk(128, 0.018 * np.pi, 0.85)
    run([c6] * bm.N_CARRIERS, "c6 in all lanes")

    # 3. sensitivity: vary one parameter at a time from c6's values
    run([mk(129, 0.018 * np.pi, 0.85)] * bm.N_CARRIERS, "c6 seed+1")
    run([mk(128, 0.016 * np.pi, 0.85)] * bm.N_CARRIERS, "c6 cfo-")
    run([mk(128, 0.018 * np.pi, 0.45)] * bm.N_CARRIERS, "c6 delay .45")
    print("done", flush=True)


if __name__ == "__main__":
    main()
