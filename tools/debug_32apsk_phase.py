#!/usr/bin/env python3
"""Phase-error anatomy of the 32APSK bench corner (CPU).

Runs the bank front end manually (same ops the fused step uses) and
compares the derotated payload symbols of each frame directly against
the TX payload truth: per-64-symbol-group phase error angle(mean
rx*conj(tx)) and EVM, averaged over frames, for the passing (0.016pi)
and failing (0.018pi) CFOs.  Pinpoints whether the elevated edge BER is
(a) a phase ramp in the unanchored tail, (b) header-anchor error at the
frame start, or (c) a non-phase (timing/amplitude) impairment.
"""
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax.numpy as jnp

    from dvbs_tpu.spec import modcod, constellations, interleaver, \
        ldpc_spec, bch_spec
    from dvbs_tpu.spec import scrambling
    from dvbs_tpu.tx import dvbs2_mod, channel
    from dvbs_tpu.ops import frontend, plsync, plphase
    from dvbs_tpu.parallel.mesh import bank_block_symbols

    mc, snr_db, seed, delay = 24, 14.5, 128, 0.85
    cfg = modcod.get_config(mc, short=False, pilots=True)
    BLOCK = bank_block_symbols(8, mc=mc, short=False, pilots=True)
    n = 2 * BLOCK
    L = cfg.plframe_len

    pkts = dvbs2_mod.random_ts_packets(700, seed=seed)
    bb = dvbs2_mod.ts_to_bbframes(pkts, cfg)
    # TX payload symbols per frame (pre-scrambling, post-modulation)
    bits = np.unpackbits(bb, axis=1)
    code = ldpc_spec.get_code(cfg.ldpc_table)
    pays = []
    for i in range(bb.shape[0]):
        cw = code.encode(bch_spec.encode(bits[i], cfg.framesize, cfg.rate))
        stream = interleaver.interleave_bits(cw, cfg.constellation,
                                             cfg.framesize, cfg.rate)
        syms = constellations.bits_to_symbols(stream, cfg.constellation)
        pays.append(constellations.modulate(syms, cfg.constellation,
                                            cfg.g1, cfg.g2))
    pays = np.asarray(pays)                       # [n_tx, payload_len]
    tx = dvbs2_mod.bbframes_to_plframes(bb, cfg).reshape(-1)
    x = channel.shape(tx, sps=2)

    from dvbs_tpu.models.dvbs2 import DVBS2Receiver
    rx = DVBS2Receiver(mc=mc, short=False, pilots=True,
                       block_symbols=BLOCK, max_ldpc_trials=12)
    F = rx.n_frames
    descr = np.conj(scrambling.pl_scrambler_phasors()[:L - 90])
    payload_idx = plphase.payload_indices(cfg)

    for cfo_pi in (0.016, 0.018):
        y = channel.impair(x, snr_db=snr_db, cfo=cfo_pi * np.pi,
                           delay_samples=delay, sco_ppm=10.0,
                           seed=seed + 1)[:n]
        p = frontend.pack_cs4(y)
        ri = np.asarray(frontend.unpack_cs4(jnp.asarray(p[None]))[0])
        samples = (ri[0] + 1j * ri[1]).astype(np.complex64)
        xx = frontend.agc(jnp.asarray(samples))
        cfo = frontend.coarse_cfo_estimate(xx)
        xx = frontend.mix(xx, cfo)
        yy = frontend.matched_filter(xx)
        z, _ = frontend.recover_symbols(yy, n_windows=16)
        score, _ = plsync.correlate(z)
        starts, quality = plsync.locate_frames(score, L, F, margin=256)
        frames = plsync.extract_frames(z, starts, L)
        fed = plphase.coarse_fed_common(frames, cfg)
        frames = plphase.apply_freq(frames, jnp.broadcast_to(fed, (F,)))
        flr = plphase.lr_freq_common(frames, cfg)
        frames = plphase.apply_freq(frames, jnp.broadcast_to(flr, (F,)))
        theta0 = plphase.header_phase(frames, cfg)
        phase = plphase.pilot_anchor_phases(frames, cfg, theta0)
        frames_c = plphase.derotate(frames, phase)
        payload = np.asarray(plphase.extract_payload(frames_c, cfg) *
                             descr[None, payload_idx - 90])   # [F, P]
        # align frames to TX payloads by best correlation of frame 0
        c0 = np.array([np.abs(np.vdot(pays[k][:2000], payload[0][:2000]))
                       for k in range(len(pays))])
        k0 = int(np.argmax(c0))
        P = payload.shape[1]
        G = 64
        ng = P // G
        perr = np.zeros((F, ng))
        evm = np.zeros((F, ng))
        for f in range(F):
            txp = pays[k0 + f]
            r = (payload[f] * np.conj(txp))[:ng * G].reshape(ng, G)
            perr[f] = np.angle(r.sum(axis=1))
            e = (payload[f] - txp)[:ng * G].reshape(ng, G)
            evm[f] = np.sqrt((np.abs(e) ** 2).mean(axis=1))
        print(f"cfo {cfo_pi:5.3f}pi  fed+flr {float(fed + flr):+.5f}  "
              f"k0={k0}", flush=True)
        m = np.abs(perr).mean(axis=0)
        print("  |phase err| per group (mrad), every 8th group:",
              np.round(1e3 * m[::8], 1).tolist(), flush=True)
        print("  tail 12 groups:", np.round(1e3 * m[-12:], 1).tolist(),
              flush=True)
        print("  head 12 groups:", np.round(1e3 * m[:12], 1).tolist(),
              flush=True)
        print("  EVM per group, every 16th:",
              np.round(evm.mean(axis=0)[::16], 3).tolist(), flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
