"""DVB-S streaming-bank block-size sweep with the Pallas Viterbi.

The XLA-scan bank measured HBM-bound at larger batches (CLAUDE.md);
the Pallas ACS keeps decisions in VMEM, so re-test whether bigger
blocks amortize the front-end fixed costs. Steady-state step timing
only (locked stream, hints warm).
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

C = 8


def main():
    import jax
    import jax.numpy as jnp
    jnp.arange(8.0).sum().block_until_ready()
    from dvbs_tpu.parallel.dvbs_bank import DVBSBankStream
    from dvbs_tpu.tx import dvbs_mod, channel
    from dvbs_tpu.ops import frontend

    for shift in (16, 17, 18):
        n = 2 * (1 << shift)
        blocks = 4
        need = (blocks + 1) * n
        sigs = []
        for c in range(C):
            ts = dvbs_mod.random_ts_groups(40, seed=40 + c)
            mod = dvbs_mod.DVBSModulator(rate="1/2")
            tx = mod.ts_to_symbols(ts)
            reps = -(-need // (2 * len(tx)))
            x = channel.shape(np.tile(tx, reps), sps=2)
            y = channel.impair(x, snr_db=8.0,
                               cfo=(0.004 + 0.002 * c) * np.pi,
                               delay_samples=0.2 + 0.1 * c, sco_ppm=10.0,
                               seed=50 + c)
            sigs.append(frontend.pack_cs4(y[:need]))
        st = DVBSBankStream(C, rate="1/2", block_samples=n, ingest="cs4")
        for lo in range(0, need, n):
            st.feed([s[lo:lo + n] for s in sigs])
        assert st.locked.all() and (st.ber < 0.05).all(), st.ber
        dev_in = st.last_debug["dev_in"]
        hints = st.last_debug["hints"]
        out = st.step(dev_in, jnp.asarray(hints))
        np.asarray(jax.device_get(out["ber"]))
        t0 = time.perf_counter()
        for _ in range(10):
            out = st.step(dev_in, jnp.asarray(hints))
        np.asarray(jax.device_get(out["ber"]))
        ms = (time.perf_counter() - t0) / 10 * 1e3
        print(f"block 2^{shift}/carrier: {ms:6.2f} ms = "
              f"{C * n / ms / 1e3:6.1f} Msamp/s", flush=True)


if __name__ == "__main__":
    main()
