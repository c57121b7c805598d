"""S2 fused-bank block-size sweep: does doubling the per-carrier block
(256 frames total = 2 Pallas LDPC calls) amortize the front overhead?"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

C = 8


def main():
    import jax
    import jax.numpy as jnp
    jnp.arange(8.0).sum().block_until_ready()
    from dvbs_tpu.spec import modcod
    from dvbs_tpu.ops import frontend
    from dvbs_tpu.tx import dvbs2_mod, channel
    from dvbs_tpu.parallel.mesh import build_carrier_bank, bank_block_symbols

    mc, short = 4, False
    cfg = modcod.get_config(mc, short=short)
    for ft in (128, 256):
        BLOCK = bank_block_symbols(C, mc=mc, short=short, frames_total=ft)
        n = 2 * BLOCK
        sigs = []
        for c in range(C):
            pkts = dvbs2_mod.random_ts_packets(2600, seed=10 + c)
            bb = dvbs2_mod.ts_to_bbframes(pkts, cfg)
            tx = dvbs2_mod.bbframes_to_plframes(bb, cfg).reshape(-1)
            reps = -(-n // (2 * len(tx))) + 1
            x = channel.shape(np.tile(tx, reps), sps=2)
            y = channel.impair(x, snr_db=5.0,
                               cfo=(0.008 + 0.002 * c) * np.pi,
                               delay_samples=0.2 + 0.1 * c, sco_ppm=10.0,
                               seed=20 + c)
            sigs.append(frontend.pack_cs4(y[:n]))
        step, _ = build_carrier_bank(C, mc=mc, short=short,
                                     block_symbols=BLOCK, fec="pallas",
                                     ingest="cs4")
        dev = jax.device_put(jnp.asarray(np.stack(sigs)))
        out = step(dev)
        ok = np.asarray(jax.device_get(out["ldpc_ok"]))
        t0 = time.perf_counter()
        for _ in range(10):
            out = step(dev)
        np.asarray(jax.device_get(out["ldpc_ok"]))
        ms = (time.perf_counter() - t0) / 10 * 1e3
        print(f"frames_total={ft}: block {n} samp/carrier, {ms:6.2f} ms = "
              f"{C * n / ms / 1e3:6.1f} Msamp/s  ldpc_ok={ok.sum()}/{ok.size}",
              flush=True)


if __name__ == "__main__":
    main()
