#!/usr/bin/env python3
"""VERDICT r3 item 7 evidence: cyclic lane padding in the B=128 Pallas
LDPC kernel is free-riding on lane width, not redundant compute.

int8 lanes are 128 wide on this hardware: a hypothetical B=32 kernel
would pad its tiles to 128 lanes anyway, so decoding 2 distinct frames
cyclically repeated to 128 lanes costs the SAME wall time as 128
distinct frames — and far less than the XLA chunked path at small F.
This script measures all three on chip.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    jnp.arange(8.0).sum().block_until_ready()

    from dvbs_tpu.spec import modcod
    from dvbs_tpu.tx import dvbs2_mod
    from dvbs_tpu.ops import ldpc_pallas, ldpc_qc

    cfg = modcod.get_config(4, short=False)
    rng = np.random.default_rng(0)

    from dvbs_tpu.spec import ldpc_spec, bch_spec
    code = ldpc_spec.get_code(cfg.ldpc_table)

    def coded_llrs(F, seed):
        pkts = dvbs2_mod.random_ts_packets(22 * F + 22, seed=seed)
        bb = dvbs2_mod.ts_to_bbframes(pkts, cfg)[:F]   # scrambled domain
        lls = []
        for f in range(F):
            cw = code.encode(bch_spec.encode(
                np.unpackbits(bb[f]), cfg.framesize, cfg.rate))
            sig = (1.0 - 2.0 * cw.astype(np.float32)) * 8.0
            sig += rng.standard_normal(len(sig)).astype(np.float32) * 5.2
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
        return (time.time() - t0) / reps * 1e3

    B = ldpc_pallas.B

    @jax.jit
    def pallas_decode(l8):
        h, nb, tr = ldpc_pallas.decode_qc_pallas(
            l8, cfg.ldpc_table, n_iters=12)
        return h[:, :64], nb, tr

    # 128 distinct frames
    l128 = ldpc_pallas.quantize_llrs(jnp.asarray(coded_llrs(B, 1)))
    t128 = tloop(pallas_decode, l128)
    # 2 distinct frames cyclically padded to 128 lanes
    l2 = np.asarray(jax.device_get(ldpc_pallas.quantize_llrs(
        jnp.asarray(coded_llrs(2, 2)))))
    l2p = jnp.asarray(np.tile(l2, (B // 2, 1)))
    t2 = tloop(pallas_decode, l2p)
    print(f"pallas 128 distinct: {t128:.2f} ms", flush=True)
    print(f"pallas 2-cyclic-padded: {t2:.2f} ms "
          f"(overhead {100 * (t2 / t128 - 1):.1f}%)", flush=True)

    # XLA chunked path at F=16 (the VMEM-resident decoder)
    l16 = jnp.asarray(coded_llrs(16, 3))

    @jax.jit
    def xla_decode(l):
        h, nb, tr = ldpc_qc.decode_qc(l, cfg.ldpc_table, n_iters=12)
        return h[:, :64], nb, tr
    t16 = tloop(xla_decode, l16, reps=5)
    print(f"xla F=16 chunk: {t16:.2f} ms "
          f"({t16 / 16 * 1e3:.0f} us/frame vs pallas "
          f"{t128 / 128 * 1e3:.0f} us/frame)", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
