#!/usr/bin/env python3
"""One-process TPU measurement batch (device-claim lottery: never split
measurements across processes).

Covers the round-2 perf loop:
  1. Pallas LDPC early-exit kernel on hardware: correctness, real
     per-frame trials, wall time at the 5 dB operating point vs the
     fixed-sweep run.
  2. Bank vm_core with the restructured timing resampler.
  3. Full bank step (vm_core + Pallas FEC) at bench scale.
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
    from dvbs_tpu.parallel.mesh import build_carrier_bank, \
        bank_block_symbols
    from dvbs_tpu.models.dvbs2 import DVBS2Receiver

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

    # ---- 1. Pallas LDPC early exit on hardware -----------------------
    rx = DVBS2Receiver(mc=mc, short=short, block_symbols=BLOCK)
    vm_core = jax.jit(jax.vmap(rx._sym_fn))
    dev = jax.device_put(jnp.asarray(frontend.unpack_cs4(
        jnp.asarray(samples))))
    core_out = vm_core(dev)
    llrs = ldpc_pallas.quantize_llrs(
        core_out["llrs"].reshape(N_CARRIERS * rx.n_frames, -1))
    sync(llrs)

    dec_ee = jax.jit(lambda l: ldpc_pallas.decode_qc_pallas(
        l, cfg.ldpc_table, n_iters=12, early_exit=True))
    dec_fx = jax.jit(lambda l: ldpc_pallas.decode_qc_pallas(
        l, cfg.ldpc_table, n_iters=12, early_exit=False))
    t_ee, (h_ee, bad_ee, tr_ee) = timeit(dec_ee, llrs)
    t_fx, (h_fx, bad_fx, tr_fx) = timeit(dec_fx, llrs)
    bad_ee = np.asarray(bad_ee)
    tr = np.asarray(tr_ee)
    same = np.array_equal(np.asarray(h_ee), np.asarray(h_fx))
    print(f"ldpc pallas B=128 @5dB: early-exit {t_ee*1e3:.2f} ms "
          f"({128/t_ee:.0f} fr/s), fixed-12 {t_fx*1e3:.2f} ms "
          f"({128/t_fx:.0f} fr/s)", flush=True)
    print(f"  bad==0: {(bad_ee == 0).all()}, trials min/med/max: "
          f"{tr.min()}/{int(np.median(tr))}/{tr.max()}, "
          f"hard equal fixed: {same}", flush=True)

    # ---- 2+3. bank step at bench scale --------------------------------
    step, _ = build_carrier_bank(N_CARRIERS, mc=mc, short=short,
                                 block_symbols=BLOCK, fec="pallas",
                                 ingest="cs4")
    dev4 = jax.device_put(jnp.asarray(samples))
    t_core, _ = timeit(vm_core, dev)
    print(f"bank vm_core (new resampler): {t_core*1e3:.2f} ms", flush=True)
    t_step, out = timeit(step, dev4)
    out_h = {k: np.asarray(v) for k, v in
             jax.device_get({k: out[k] for k in
                             ("ldpc_ok", "bch_bad", "trials")}).items()}
    print(f"bank full step: {t_step*1e3:.2f} ms = "
          f"{N_CARRIERS*n/t_step/1e6:.1f} Msamples/s "
          f"(vs_baseline {N_CARRIERS*n/t_step/61.4e6:.2f})", flush=True)
    print(f"  ldpc_ok all: {out_h['ldpc_ok'].all()}, bch_bad any: "
          f"{out_h['bch_bad'].any()}, trials max: "
          f"{out_h['trials'].max()}", flush=True)

    # ---- 4. vm_core stage split at bench scale (next-opt guidance) ---
    try:
        from dvbs_tpu.spec import interleaver, scrambling
        from dvbs_tpu.ops import plsync, plphase, plhdr, demap
        L, F = cfg.plframe_len, rx.n_frames
        payload_idx = plphase.payload_indices(cfg)  # noqa: F841
        descr = np.conj(scrambling.pl_scrambler_phasors()[:L - 90])
        deint = interleaver.deinterleave_perm(
            cfg.constellation, cfg.framesize, cfg.rate)

        def v(f):
            return jax.jit(jax.vmap(f))

        def phase_demap(frames):
            fed = plphase.coarse_fed_common(frames, cfg)
            frames = plphase.apply_freq(frames, jnp.broadcast_to(fed, (F,)))
            flr = plphase.lr_freq_common(frames, cfg)
            frames = plphase.apply_freq(frames, jnp.broadcast_to(flr, (F,)))
            theta0 = plphase.header_phase(frames, cfg)
            frames_c = plphase.derotate(frames, theta0[:, None])
            payload = frames_c[:, 90:] * descr[None, :]
            vv = plphase.qpsk_vv_track(payload, jnp.zeros(F))
            payload = plphase.derotate(payload, vv)
            pls_idx, _ = plhdr.detect_pls(frames_c[:, :90])
            llrs = demap.soft_demap(payload, cfg.constellation,
                                    cfg.g1, cfg.g2)
            return llrs.reshape(F, -1)[:, deint], pls_idx

        cx = v(lambda ri: (ri[0].astype(jnp.float32) + 1j *
                           ri[1].astype(jnp.float32)))(dev)
        prev, outs = cx, {}
        for name, fn in [
            ("agc", v(frontend.agc)),
            ("cfo+mix", v(lambda xx: frontend.mix(
                xx, frontend.coarse_cfo_estimate(xx)))),
            ("matched_filter", v(frontend.matched_filter)),
            ("timing_recovery", v(lambda yy: frontend.recover_symbols(
                yy, n_windows=16)[0])),
        ]:
            t, prev = timeit(fn, prev)
            outs[name] = prev
            print(f"  stage {name:16s} {t*1e3:7.2f} ms", flush=True)
        z = outs["timing_recovery"]
        t, sc = timeit(v(lambda s: plsync.correlate(s)[0]), z)
        print(f"  stage {'plsync_correlate':16s} {t*1e3:7.2f} ms",
              flush=True)
        loc = v(lambda s: plsync.locate_frames(
            s, L, F, margin=rx.edge_margin))(sc)
        t, frames = timeit(v(lambda zz, ss: plsync.extract_frames(
            zz, ss, L)), z, loc[0])
        print(f"  stage {'locate+extract':16s} {t*1e3:7.2f} ms", flush=True)
        t, _ = timeit(v(phase_demap), frames)
        print(f"  stage {'phase+demap':16s} {t*1e3:7.2f} ms", flush=True)
    except Exception as e:   # stage split is advisory; keep 1-3 results
        print(f"stage split failed: {e!r}", flush=True)

    # ---- 5. DVB-S chain (BASELINE config 1) in the same process ------
    try:
        import tools.bench_dvbs as bd
        print("dvbs bench:", flush=True)
        bd.main()
    except Exception as e:
        print(f"dvbs bench failed: {e!r}", flush=True)

    # ---- 6. the driver's own bench.py line, same process -------------
    try:
        import bench
        print("bench.py:", flush=True)
        bench.main()
    except Exception as e:
        print(f"bench.py failed: {e!r}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    sys.exit(main())
