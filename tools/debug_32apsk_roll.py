#!/usr/bin/env python3
"""A/B the 32APSK 3/4 pilots bank gate (bench.py:203) between the two
LDPC roll implementations on identical inputs — decides whether the
pltpu.roll lowering changed numerics at this operating point or the
gate failure predates it."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    jnp.arange(8.0).sum().block_until_ready()

    import bench as bm
    from dvbs_tpu.spec import modcod
    from dvbs_tpu.ops import frontend, ldpc_pallas
    from dvbs_tpu.parallel.mesh import build_carrier_bank, bank_block_symbols

    mc, snr_db = 24, 14.5
    cfg = modcod.get_config(mc, short=False, pilots=True)
    BLOCK = bank_block_symbols(bm.N_CARRIERS, mc=mc, short=False, pilots=True)
    n = 2 * BLOCK
    sigs = []
    for c in range(bm.N_CARRIERS):
        y, sent = bm.s2_carrier_signal(cfg, 700, 110 + 3 * c,
                                       (0.006 + 0.002 * c) * np.pi,
                                       0.25 + 0.1 * c, snr_db=snr_db)
        sigs.append(frontend.pack_cs4(y[:n]))
    samples = jnp.asarray(np.stack(sigs))
    print("signals ready", flush=True)

    orig = ldpc_pallas.decode_qc_pallas
    results = {}
    try:
        for impl in ("prim", "buffer"):
            def forced(l8, table, impl=impl, **kw):
                kw["roll_impl"] = impl
                return orig(l8, table, **kw)
            ldpc_pallas.decode_qc_pallas = forced
            step, _ = build_carrier_bank(bm.N_CARRIERS, mc=mc, short=False,
                                         pilots=True, block_symbols=BLOCK,
                                         fec="pallas", ingest="cs4",
                                         n_iters=12)
            t0 = time.time()
            out = step(samples)
            h = {k: np.asarray(jax.device_get(v)) for k, v in out.items()}
            print(f"{impl}: ldpc_ok {h['ldpc_ok'].sum()}/{h['ldpc_ok'].size} "
                  f"bch_bad {h['bch_bad'].sum()} "
                  f"trials mean {h['trials'].mean():.2f} "
                  f"max {h['trials'].max()}  ({time.time()-t0:.1f}s)",
                  flush=True)
            results[impl] = h
    finally:
        ldpc_pallas.decode_qc_pallas = orig

    a, b = results["prim"], results["buffer"]
    print("ok masks equal:", (a["ldpc_ok"] == b["ldpc_ok"]).all(), flush=True)
    print("trials equal:", (a["trials"] == b["trials"]).all(), flush=True)
    print("hard bytes equal:",
          (a["kbch_bytes"] == b["kbch_bytes"]).all(), flush=True)
    bad = np.flatnonzero(~a["ldpc_ok"].reshape(-1))
    print("failing lanes (prim):", bad[:20], flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
