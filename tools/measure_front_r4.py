#!/usr/bin/env python3
"""Round-4: cumulative bisect of the S2 bank front-end program.
Each variant is the vmapped core truncated at a stage, returning a
small probe (no big fetches). Run on the real chip."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

N_CARRIERS = 8


def main():
    import jax
    import jax.numpy as jnp
    t0 = time.time()
    jnp.arange(8.0).sum().block_until_ready()
    print(f"device claim: {time.time() - t0:.1f}s", flush=True)

    from dvbs_tpu.spec import modcod, interleaver, scrambling
    from dvbs_tpu.ops import frontend, plsync, plphase, plhdr, demap
    from dvbs_tpu.tx import dvbs2_mod, channel
    from dvbs_tpu.parallel.mesh import bank_block_symbols
    from dvbs_tpu.models.dvbs2 import DVBS2Receiver

    mc, short = 4, False
    cfg = modcod.get_config(mc, short=short)
    BLOCK = bank_block_symbols(N_CARRIERS, mc=mc, short=short)
    n = 2 * BLOCK
    rx = DVBS2Receiver(mc=mc, short=short, block_symbols=BLOCK)
    L, F = cfg.plframe_len, rx.n_frames
    margin = rx.edge_margin

    rng = np.random.default_rng(0)
    sigs = []
    for c in range(N_CARRIERS):
        pkts = dvbs2_mod.random_ts_packets(200, seed=10 + c)
        bb = dvbs2_mod.ts_to_bbframes(pkts, cfg)
        tx = dvbs2_mod.bbframes_to_plframes(bb, cfg).reshape(-1)
        reps = -(-BLOCK // len(tx)) + 1
        tx = np.tile(tx, reps)
        x = channel.shape(tx, sps=2)
        y = channel.impair(x, snr_db=5.0, cfo=(0.008 + 0.002 * c) * np.pi,
                           delay_samples=0.2 + 0.1 * c, sco_ppm=10.0,
                           seed=20 + c)
        sigs.append(frontend.pack_cs4(y[:n]))
    dev = jax.device_put(jnp.asarray(np.stack(sigs)))
    print("signals uploaded", flush=True)

    descr = np.conj(scrambling.pl_scrambler_phasors()[:L - 90])

    def upto(stage):
        def one(p):
            ri = frontend.unpack_cs4(p)
            s = (ri[0].astype(jnp.float32) + 1j * ri[1].astype(jnp.float32)
                 ).astype(jnp.complex64)
            x = frontend.agc(s)
            cfo = frontend.coarse_cfo_estimate(x)
            x = frontend.mix(x, cfo)
            if stage == "mix":
                return jnp.sum(jnp.abs(x) ** 2).reshape(1)
            y = frontend.matched_filter(x)
            if stage == "mf":
                return jnp.sum(jnp.abs(y) ** 2).reshape(1)
            z, _ = frontend.recover_symbols(y, n_windows=16)
            if stage == "timing":
                return jnp.sum(jnp.abs(z) ** 2).reshape(1)
            score, _ = plsync.correlate(z)
            starts, quality = plsync.locate_frames(score, L, F, margin=margin)
            frames = plsync.extract_frames(z, starts, L)
            if stage == "sync":
                return jnp.sum(jnp.abs(frames[:, :4]) ** 2).reshape(1)
            fed = plphase.coarse_fed_common(frames, cfg)
            frames2 = plphase.apply_freq(frames, jnp.broadcast_to(fed, (F,)))
            flr = plphase.lr_freq_common(frames2, cfg)
            frames2 = plphase.apply_freq(frames2, jnp.broadcast_to(flr, (F,)))
            theta0 = plphase.header_phase(frames2, cfg)
            if stage == "fed":
                return jnp.sum(theta0).reshape(1)
            frames_c = plphase.derotate(frames2, theta0[:, None])
            payload = frames_c[:, 90:] * descr[None, :]
            vv = plphase.qpsk_vv_track(payload, jnp.zeros(F))
            payload = plphase.derotate(payload, vv)
            if stage == "vv":
                return jnp.sum(jnp.abs(payload[:, :4]) ** 2).reshape(1)
            pls_idx, pls_conf = plhdr.detect_pls(frames_c[:, :90])
            llrs = demap.soft_demap(payload, cfg.constellation, cfg.g1,
                                    cfg.g2)
            llrs = interleaver.deinterleave_device(
                llrs, cfg.constellation, cfg.framesize, cfg.rate)
            return (jnp.sum(llrs, axis=1) + pls_idx).reshape(F)

        @jax.jit
        def f(p):
            return jnp.sum(jax.vmap(one)(p))
        return f

    def sync(o):
        np.asarray(jax.device_get(o))

    def tloop(fn, x, reps=10):
        o = fn(x)
        sync(o)
        t0 = time.time()
        for _ in range(reps):
            o = fn(x)
        sync(o)
        return (time.time() - t0) / reps * 1e3

    prev = 0.0
    for stage in ("mix", "mf", "timing", "sync", "fed", "vv", "demap"):
        ms = tloop(upto(stage), dev)
        print(f"  upto {stage:8s} {ms:7.2f} ms  (+{ms - prev:.2f})",
              flush=True)
        prev = ms

    # the real full core (with scatter side-channel etc.), small probe
    core = rx._sym_fn

    @jax.jit
    def full(p):
        out = jax.vmap(core)(frontend.unpack_cs4(p))
        return sum(jnp.sum(v) for k, v in out.items()
                   if k in ("quality", "freq", "pls_conf")) + \
            jnp.sum(out["llrs"][:, :, ::997])
    ms = tloop(full, dev)
    print(f"  full core        {ms:7.2f} ms", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
