#!/usr/bin/env python3
"""Round-3 stage profile at bench scale — dispatch-overhead-free.

Round-2 finding: a single jitted call through the axon tunnel carries
~13 ms of host dispatch latency, so timing stages as separate jit calls
measures the tunnel, not the stage. This script times each stage with
IN-PROGRAM repetition instead: one jit running the stage N times on
slightly different inputs (rolled — defeats CSE), minus the same
program at N=1, divided by N-1. Dispatch cost cancels.

Run on the real chip: python tools/measure_r6.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

N_CARRIERS = 8
NREP = 3


def main():
    import jax
    import jax.numpy as jnp
    t0 = time.time()
    jnp.arange(8.0).sum().block_until_ready()
    print(f"device claim: {time.time() - t0:.1f}s", flush=True)

    from dvbs_tpu.spec import modcod, interleaver, scrambling
    from dvbs_tpu.ops import frontend, plsync, plphase, plhdr, demap, bch
    from dvbs_tpu.ops import ldpc_pallas
    from dvbs_tpu.tx import dvbs2_mod, channel
    from dvbs_tpu.models.dvbs2 import DVBS2Receiver
    from dvbs_tpu.parallel.mesh import build_carrier_bank, bank_block_symbols

    mc, short = 4, False
    cfg = modcod.get_config(mc, short=short)
    BLOCK = bank_block_symbols(N_CARRIERS, mc=mc, short=short)
    n = 2 * BLOCK
    rx = DVBS2Receiver(mc=mc, short=short, block_symbols=BLOCK)
    L, F = cfg.plframe_len, rx.n_frames
    print(f"BLOCK={BLOCK} frames/carrier={F}", flush=True)

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
    samples = np.stack(sigs)
    dev = jax.device_put(jnp.asarray(samples))
    print("signals uploaded", flush=True)

    def sync(x):
        np.asarray(jax.device_get(x))

    def probe(o):
        leaves = [v for v in jax.tree_util.tree_leaves(o)]
        acc = jnp.zeros((), jnp.float32)
        for v in leaves[:3]:
            acc = acc + jnp.real(v).reshape(-1)[:1].astype(jnp.float32)[0]
        return acc.reshape(1)

    def tloop(fn, x, reps=8):
        o = fn(x)
        sync(o)
        t0 = time.time()
        for _ in range(reps):
            o = fn(x)
        sync(o)
        return (time.time() - t0) / reps * 1e3

    def stage_cost(name, fn, x, nrep=NREP, axis=-1):
        """fn: device pytree -> pytree. Returns per-call ms net of
        dispatch: (t_many - t_one)/(nrep-1). The N inputs are rolled
        copies (defeats CSE); axis=0 rolls the batch axis instead, for
        stages whose cost depends on per-frame content (LDPC early
        exit) — frames stay intact, only lane order changes."""
        def jitter(a, i):
            return jax.tree_util.tree_map(
                lambda v: jnp.roll(v, i, axis=axis), a)

        @jax.jit
        def one(x):
            return probe(fn(x))

        @jax.jit
        def many(x):
            acc = jnp.zeros((1,), jnp.float32)
            for i in range(nrep):
                acc = acc + probe(fn(jitter(x, i)))
            return acc
        t1 = tloop(one, x)
        tn = tloop(many, x)
        ms = (tn - t1) / (nrep - 1)
        print(f"  {name:22s} {ms:7.2f} ms   (1x={t1:.2f} {nrep}x={tn:.2f})",
              flush=True)
        return ms

    # ---- materialize intermediates on device --------------------------
    payload_idx = plphase.payload_indices(cfg)
    descr = np.conj(scrambling.pl_scrambler_phasors()[:L - 90])
    deint = interleaver.deinterleave_perm(cfg.constellation, cfg.framesize,
                                          cfg.rate)

    def front_pre(p):
        ri = frontend.unpack_cs4(p)
        s = (ri[0].astype(jnp.float32) + 1j * ri[1].astype(jnp.float32)
             ).astype(jnp.complex64)
        x = frontend.agc(s)
        cfo = frontend.coarse_cfo_estimate(x)
        return frontend.mix(x, cfo)

    vm = lambda f: jax.jit(jax.vmap(f))
    xm = vm(front_pre)(dev)
    ym = vm(frontend.matched_filter)(xm)
    z = vm(lambda yy: frontend.recover_symbols(yy, n_windows=16)[0])(ym)
    sc = vm(lambda zz: plsync.correlate(zz)[0])(z)
    starts = vm(lambda s: plsync.locate_frames(s, L, F,
                                               margin=rx.edge_margin)[0])(sc)
    frames = jax.jit(jax.vmap(
        lambda zz, ss: plsync.extract_frames(zz, ss, L)))(z, starts)
    sync(jnp.abs(frames).sum())
    print("intermediates ready", flush=True)

    def tau_path(yy):
        terms = frontend._oerder_meyr_terms(yy)
        W = 16
        win = (yy.shape[-1] // W) & ~1
        taus = jnp.stack([
            jnp.angle(jnp.sum(terms[i * win:(i + 1) * win])) / (2 * jnp.pi)
            for i in range(W)])
        return taus

    def phase_chain(fr):
        fed = plphase.coarse_fed_common(fr, cfg)
        fr = plphase.apply_freq(fr, jnp.broadcast_to(fed, (F,)))
        flr = plphase.lr_freq_common(fr, cfg)
        fr = plphase.apply_freq(fr, jnp.broadcast_to(flr, (F,)))
        theta0 = plphase.header_phase(fr, cfg)
        fr_c = plphase.derotate(fr, theta0[:, None])
        payload = fr_c[:, 90:] * descr[None, :]
        vv = plphase.qpsk_vv_track(payload, jnp.zeros(F))
        return plphase.derotate(payload, vv), fr_c[:, :90]

    payload, hdr = jax.jit(jax.vmap(phase_chain))(frames)
    llrs = vm(lambda p: demap.soft_demap(
        p, cfg.constellation, cfg.g1, cfg.g2).reshape(F, -1)[:, deint]
    )(payload).reshape(N_CARRIERS * F, -1)
    llr8 = jax.jit(ldpc_pallas.quantize_llrs)(llrs)
    sync(jnp.abs(llr8).sum())
    print("llrs ready", flush=True)

    # ---- per-stage costs ----------------------------------------------
    print("stage costs (net of dispatch):", flush=True)
    total = 0.0
    total += stage_cost("unpack+agc+cfo+mix", lambda p: jax.vmap(front_pre)(p), dev)
    total += stage_cost("matched_filter", lambda x: jax.vmap(frontend.matched_filter)(x), xm)
    total += stage_cost("om_tau_path", lambda y: jax.vmap(tau_path)(y), ym)
    total += stage_cost("recover_symbols(full)", lambda y: jax.vmap(
        lambda yy: frontend.recover_symbols(yy, n_windows=16)[0])(y), ym)
    total += stage_cost("plsync_correlate", lambda z_: jax.vmap(
        lambda zz: plsync.correlate(zz)[0])(z_), z)
    total += stage_cost("locate+extract", lambda sz: jax.vmap(
        lambda s_, z_: plsync.extract_frames(
            z_, plsync.locate_frames(s_, L, F, margin=rx.edge_margin)[0], L)
    )(sz[0], sz[1]), (sc, z))
    total += stage_cost("phase_chain", lambda fr: jax.vmap(phase_chain)(fr),
                        frames)
    total += stage_cost("plhdr_detect", lambda h: jax.vmap(plhdr.detect_pls)(h), hdr)
    total += stage_cost("demap+deint", lambda p: jax.vmap(
        lambda pp: demap.soft_demap(pp, cfg.constellation, cfg.g1, cfg.g2
                                    ).reshape(F, -1)[:, deint])(p), payload)
    total += stage_cost("quantize_llrs", ldpc_pallas.quantize_llrs, llrs)

    def fec_sweeps(k):
        def f(l8):
            h, nb, tr = ldpc_pallas.decode_qc_pallas(
                l8, cfg.ldpc_table, n_iters=k, early_exit=False)
            return h[:, :64], nb
        return f
    s1 = stage_cost("pallas 1 sweep", fec_sweeps(1), llr8, nrep=3, axis=0)
    s4 = stage_cost("pallas 4 sweeps", fec_sweeps(4), llr8, nrep=3, axis=0)
    print(f"  -> per-sweep marginal {(s4 - s1) / 3:.2f} ms", flush=True)

    def ee_fec(l8):
        h, nb, tr = ldpc_pallas.decode_qc_pallas(
            l8, cfg.ldpc_table, n_iters=12, early_exit=True)
        return h[:, :64], nb, tr
    see = stage_cost("pallas early-exit(12)", ee_fec, llr8, nrep=3, axis=0)
    total += see

    from dvbs_tpu.ops import frontend as fr_ops
    bb_mask = scrambling.bb_scrambler_byte_mask(cfg.kbch // 8)
    hard = jax.jit(lambda l8: ldpc_pallas.decode_qc_pallas(
        l8, cfg.ldpc_table, n_iters=4, early_exit=False)[0])(llr8)
    sync(hard[:, :8])

    def packcheck(h):
        bb = bch.syndrome_nonzero(h[:, :cfg.nbch], cfg.framesize, cfg.rate)
        return fr_ops.pack_bits_to_bytes(h[:, :cfg.kbch]) ^ bb_mask, bb
    total += stage_cost("bch_syn+pack+xor", packcheck, hard, axis=0)

    print(f"  SUM of stages        {total:7.2f} ms", flush=True)

    # ---- reference: the real fused bank step --------------------------
    step, _ = build_carrier_bank(N_CARRIERS, mc=mc, short=short,
                                 block_symbols=BLOCK, fec="pallas",
                                 ingest="cs4")
    tb = tloop(step, dev, reps=10)
    print(f"fused bank step: {tb:.2f} ms = "
          f"{N_CARRIERS * n / tb / 1e3:.1f} Msamp/s", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
