#!/usr/bin/env python3
"""On-chip throughput for the higher-order constellations (16APSK 2/3,
32APSK 3/4, pilots on): fused 8-carrier pallas-FEC banks with the
contiguous-TS gate. Recorded in PROFILE_r4.md (secondary coverage
beyond the BASELINE configs; bench.py stays lean)."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

N_CARRIERS = 8


def run_config(jax, jnp, mc, snr_db, label):
    from dvbs_tpu.spec import modcod
    from dvbs_tpu.parallel.mesh import build_carrier_bank, bank_block_symbols
    from dvbs_tpu.io.native import NativeTSParser
    from dvbs_tpu.ops import frontend
    from dvbs_tpu.tx import dvbs2_mod, channel

    cfg = modcod.get_config(mc, short=False, pilots=True)
    BLOCK = bank_block_symbols(N_CARRIERS, mc=mc, short=False, pilots=True)
    n = 2 * BLOCK
    kb = cfg.kbch // 8
    sigs, sents = [], []
    for c in range(N_CARRIERS):
        pkts = dvbs2_mod.random_ts_packets(
            (kb // 188 + 2) * 20, seed=600 + 7 * c + mc)
        bb = dvbs2_mod.ts_to_bbframes(pkts, cfg)
        tx = dvbs2_mod.bbframes_to_plframes(bb, cfg).reshape(-1)
        x = channel.shape(tx, sps=2)
        y = channel.impair(x, snr_db=snr_db,
                           cfo=(0.004 + 0.002 * c) * np.pi,
                           delay_samples=0.2 + 0.1 * c, sco_ppm=10.0,
                           seed=700 + c)
        assert len(y) >= n, (len(y), n)
        sigs.append(frontend.pack_cs4(y[:n]))
        sents.append(pkts.reshape(-1, 188))
    samples = np.stack(sigs)
    step, _ = build_carrier_bank(N_CARRIERS, mc=mc, short=False,
                                 pilots=True, block_symbols=BLOCK,
                                 fec="pallas", ingest="cs4")
    out = step(jnp.asarray(samples))
    h = {k: np.asarray(jax.device_get(v)) for k, v in out.items()}
    ok = h["ldpc_ok"]
    assert ok.all(), f"{label}: {ok.sum()}/{ok.size} frames decoded"
    assert not h["bch_bad"].any()
    F = h["quality"].shape[1]
    kbb = np.ascontiguousarray(h["kbch_bytes"].reshape(N_CARRIERS, F, kb))
    for c in range(N_CARRIERS):
        got = np.frombuffer(NativeTSParser(cfg.kbch).feed(kbb[c]),
                            np.uint8).reshape(-1, 188)
        sb = sents[c].tobytes()
        i0 = sb.find(got[0].tobytes())
        assert i0 >= 0 and i0 % 188 == 0
        k0 = i0 // 188
        assert np.array_equal(got, sents[c][k0:k0 + len(got)]), \
            f"{label} c{c}: TS not contiguous"

    dev_in = jax.device_put(jnp.asarray(samples))
    o = step(dev_in)
    np.asarray(jax.device_get(o["ldpc_ok"]))
    t0 = time.time()
    for _ in range(10):
        o = step(dev_in)
    np.asarray(jax.device_get(o["ldpc_ok"]))
    ms = (time.time() - t0) / 10 * 1e3
    msps = N_CARRIERS * n / (ms * 1e-3) / 1e6
    tr = np.asarray(jax.device_get(o["trials"]))
    print(f"{label}: {ms:.2f} ms = {msps:.1f} Msamp/s "
          f"(trials mean {tr.mean():.2f}, TS contiguous x{N_CARRIERS})",
          flush=True)
    return msps, ms


def main():
    import jax
    import jax.numpy as jnp
    jnp.arange(8.0).sum().block_until_ready()
    run_config(jax, jnp, 18, 11.0, "16apsk23_pilots")
    run_config(jax, jnp, 24, 14.5, "32apsk34_pilots")
    print("done", flush=True)


if __name__ == "__main__":
    main()
