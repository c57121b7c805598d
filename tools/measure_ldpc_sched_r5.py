#!/usr/bin/env python3
"""Per-sweep LDPC kernel: oriented posterior storage vs the natural
schedule, on chip (B4, fixed 12 sweeps + early exit), bit-exactness
asserted on the Mosaic lowering."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    jnp.arange(8.0).sum().block_until_ready()

    from dvbs_tpu.spec import modcod, ldpc_spec, bch_spec
    from dvbs_tpu.tx import dvbs2_mod
    from dvbs_tpu.ops import ldpc_pallas

    cfg = modcod.get_config(4, short=False)   # QPSK 1/2 normal (B4)
    rng = np.random.default_rng(0)
    code = ldpc_spec.get_code(cfg.ldpc_table)

    def coded_llrs(F, seed):
        pkts = dvbs2_mod.random_ts_packets(22 * F + 22, seed=seed)
        bb = dvbs2_mod.ts_to_bbframes(pkts, cfg)[:F]
        lls = []
        for f in range(F):
            cw = code.encode(bch_spec.encode(
                np.unpackbits(bb[f]), cfg.framesize, cfg.rate))
            sig = (1.0 - 2.0 * cw.astype(np.float32)) * 8.0
            sig += rng.standard_normal(len(sig)).astype(np.float32) * 4.4
            lls.append(sig)
        return np.stack(lls)

    def sync(o):
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(o)[0]))

    def tloop(fn, x, reps=10):
        o = fn(x)
        sync(o)
        t0 = time.time()
        for _ in range(reps):
            o = fn(x)
        sync(o)
        return (time.time() - t0) / reps * 1e3, o

    B = ldpc_pallas.B
    l128 = ldpc_pallas.quantize_llrs(jnp.asarray(coded_llrs(B, 1)))

    base_fx = base_ee = None
    for sched in ("natural", "oriented", "natural", "oriented"):
        def dec_fx(l8, sched=sched):
            return ldpc_pallas.decode_qc_pallas(
                l8, cfg.ldpc_table, n_iters=12, early_exit=False,
                schedule=sched)

        def dec_ee(l8, sched=sched):
            return ldpc_pallas.decode_qc_pallas(
                l8, cfg.ldpc_table, n_iters=12, early_exit=True,
                schedule=sched)

        tfx, ofx = tloop(jax.jit(dec_fx), l128)
        tee, oee = tloop(jax.jit(dec_ee), l128)
        ofx = [np.asarray(x) for x in ofx]
        oee = [np.asarray(x) for x in oee]
        if base_fx is None:
            base_fx, base_ee = ofx, oee
            eq = "baseline"
        else:
            ok = all((a == b).all() for a, b in zip(ofx, base_fx)) \
                and all((a == b).all() for a, b in zip(oee, base_ee))
            eq = "bit-exact" if ok else "MISMATCH"
        print(f"{sched:9s} fixed12 {tfx:7.2f} ms ({tfx/12.0:.3f}/sweep)"
              f"  early-exit {tee:7.2f} ms  [{eq}]", flush=True)
    print("trials mean", float(np.mean(base_ee[2])), flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
