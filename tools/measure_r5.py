#!/usr/bin/env python3
"""Round-3 TPU measurement session (one process, batched — the device
claim can take minutes):

1. S2 8-carrier bank at bench shape: block ms (headline), plus split
   front-vs-FEC timing and LDPC sweep-count sensitivity
2. DVB-S 8-carrier bank: block ms across Viterbi segment core sizes
3. host-stage (native TS parse) standalone rate
4. pipelined e2e + sustained ingest MB/s

Run: python tools/measure_r5.py [dvbs_cores...]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
N_CARRIERS = 8


def sync(jax, x):
    np.asarray(jax.device_get(x))


def main():
    import jax
    import jax.numpy as jnp
    t0 = time.time()
    jnp.arange(8.0).sum().block_until_ready()
    print(f"device claim: {time.time() - t0:.1f}s", flush=True)

    from dvbs_tpu.spec import modcod
    from dvbs_tpu.tx import dvbs2_mod, dvbs_mod, channel
    from dvbs_tpu.parallel.mesh import build_carrier_bank, bank_block_symbols
    from dvbs_tpu.parallel.dvbs_bank import build_dvbs_bank
    from dvbs_tpu.ops import frontend
    from dvbs_tpu.io.native import NativeTSParser, available
    assert available()

    mc, short = 4, False
    cfg = modcod.get_config(mc, short=short)
    BLOCK = bank_block_symbols(N_CARRIERS, mc=mc, short=short)
    n = 2 * BLOCK
    kb = cfg.kbch // 8

    sigs, sents = [], []
    for c in range(N_CARRIERS):
        pkts = dvbs2_mod.random_ts_packets(1800, seed=10 + c)
        bb = dvbs2_mod.ts_to_bbframes(pkts, cfg)
        tx = dvbs2_mod.bbframes_to_plframes(bb, cfg).reshape(-1)
        x = channel.shape(tx, sps=2)
        y = channel.impair(x, snr_db=5.0, cfo=(0.008 + 0.002 * c) * np.pi,
                           delay_samples=0.2 + 0.1 * c, sco_ppm=10.0,
                           seed=20 + c)
        sigs.append(frontend.pack_cs4(y[:n]))
        sents.append(pkts.tobytes())
    samples = np.stack(sigs)
    print(f"S2 signals built: {N_CARRIERS} x {n} samples", flush=True)

    # ---- 1. S2 bank -----------------------------------------------------
    step, _ = build_carrier_bank(N_CARRIERS, mc=mc, short=short,
                                 block_symbols=BLOCK, fec="pallas",
                                 ingest="cs4")
    dev_in = jax.device_put(jnp.asarray(samples))
    t0 = time.time()
    out = step(dev_in)
    sync(jax, out["ldpc_ok"])
    print(f"S2 bank compile+run: {time.time() - t0:.1f}s", flush=True)
    out_h = {k: np.asarray(jax.device_get(v)) for k, v in out.items()}
    print(f"  ok={out_h['ldpc_ok'].sum()}/128 bch_bad={out_h['bch_bad'].sum()}"
          f" trials mean {out_h['trials'].mean():.2f}", flush=True)

    def t_block(fn, arg, key, reps=10):
        o = fn(arg)
        sync(jax, o[key] if isinstance(o, (dict, tuple)) else o)
        t0 = time.time()
        for _ in range(reps):
            o = fn(arg)
        sync(jax, o[key] if isinstance(o, (dict, tuple)) else o)
        return (time.time() - t0) / reps * 1e3

    ms = t_block(step, dev_in, "ldpc_ok")
    print(f"S2 bank block: {ms:.2f} ms = {N_CARRIERS * n / ms / 1e3:.1f} "
          f"Msamp/s ({N_CARRIERS * n / ms / 1e3 / 61.4:.2f}x)", flush=True)

    # front-only split (same program minus FEC): vmapped core
    from dvbs_tpu.models.dvbs2 import DVBS2Receiver
    rx = DVBS2Receiver(mc=mc, short=short, block_symbols=BLOCK,
                       max_ldpc_trials=12)
    core = rx._sym_fn

    @jax.jit
    def front_only(packed):
        out = jax.vmap(core)(frontend.unpack_cs4(packed))
        return out["llrs"].sum(), out["quality"]

    msf = t_block(front_only, dev_in, 1)
    print(f"  front-only: {msf:.2f} ms; implied FEC+pack: {ms - msf:.2f} ms",
          flush=True)

    # ---- 3. host stage ----------------------------------------------------
    def host_process(h, parsers):
        total = 0
        kbb = np.ascontiguousarray(h["kbch_bytes"].reshape(N_CARRIERS, -1, kb))
        for c in range(N_CARRIERS):
            total += len(parsers[c].feed(kbb[c]))
        return total

    parsers = [NativeTSParser(cfg.kbch) for _ in range(N_CARRIERS)]
    ts0 = host_process(out_h, parsers)
    assert ts0 > 0
    for c in range(N_CARRIERS):
        p2 = NativeTSParser(cfg.kbch)
        got = p2.feed(np.ascontiguousarray(
            out_h["kbch_bytes"].reshape(N_CARRIERS, -1, kb)[c]))
        assert len(got) >= 188 * 20 and sents[c].find(got[:188 * 5]) >= 0, c
    print("  per-carrier TS correctness ok", flush=True)
    t0 = time.time()
    reps = 30
    for _ in range(reps):
        host_process(out_h, parsers)
    host_ms = (time.time() - t0) / reps * 1e3
    print(f"host stage: {host_ms:.2f} ms/block = "
          f"{N_CARRIERS * n / host_ms / 1e3:.0f} Msamp/s", flush=True)

    # ---- 4. e2e pipeline --------------------------------------------------
    fetch_keys = ("kbch_bytes", "ldpc_ok", "bch_bad", "trials")
    prev = None
    reps = 8
    t0 = time.time()
    for _ in range(reps):
        dev_next = jax.device_put(jnp.asarray(samples))
        o = step(dev_next)
        if prev is not None:
            h = {k: np.asarray(jax.device_get(prev[k])) for k in fetch_keys}
            host_process(h, parsers)
        prev = o
    h = {k: np.asarray(jax.device_get(prev[k])) for k in fetch_keys}
    host_process(h, parsers)
    dt = (time.time() - t0) / reps
    print(f"e2e pipelined: {dt * 1e3:.1f} ms/block = "
          f"{N_CARRIERS * n / dt / 1e6:.1f} Msamp/s; sustained ingest "
          f"{samples.nbytes / dt / 1e6:.1f} MB/s", flush=True)

    # ---- 2. DVB-S bank -----------------------------------------------------
    nd = 2 * (1 << 16)
    dsigs = []
    for c in range(N_CARRIERS):
        ts = dvbs_mod.random_ts_groups(6, seed=40 + c)
        mod = dvbs_mod.DVBSModulator(rate="1/2")
        tx = mod.ts_to_symbols(ts)
        x = channel.shape(tx, sps=2)
        y = channel.impair(x, snr_db=8.0, cfo=(0.004 + 0.002 * c) * np.pi,
                           delay_samples=0.2 + 0.1 * c, seed=50 + c)
        dsigs.append(y[:nd])
    dsamples = np.stack([frontend.pack_cs4(s) for s in dsigs])
    ddev = jax.device_put(jnp.asarray(dsamples))

    cores = [int(a) for a in sys.argv[1:]] or [512, 1024, 2048, 256]
    for corelen in cores:
        stepd, _ = build_dvbs_bank(N_CARRIERS, rate="1/2", block_samples=nd,
                                   core=corelen)
        t0 = time.time()
        o = stepd(ddev)
        sync(jax, o["ber"])
        ct = time.time() - t0
        ber = np.asarray(jax.device_get(o["ber"]))
        msd = t_block(stepd, ddev, "ber")
        print(f"DVB-S bank core={corelen}: {msd:.2f} ms = "
              f"{N_CARRIERS * nd / msd / 1e3:.1f} Msamp/s "
              f"({N_CARRIERS * nd / msd / 1e3 / 6.785:.1f}x ref core) "
              f"ber max {ber.max():.4f} (compile {ct:.0f}s)", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
