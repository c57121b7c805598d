#!/usr/bin/env python3
"""Per-stage TPU profile of the 8-carrier bank block program.

Times each pipeline stage as its own jitted program at bank scale
(vmapped over carriers) with device-resident inputs, so the stage split
of the ~100 ms bank step is visible. Also sweeps LDPC fec_chunk sizes
and measures the int8-IQ upload variant.

Run on the real chip: `python tools/profile_tpu.py` (one process — the
device claim lottery makes multi-process measurement useless).
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

N_CARRIERS = 8
# per-carrier block symbols; pass an int argv[1] to profile at another
# scale (e.g. the bench's bank_block_symbols(8) ~ 566k)
BLOCK = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 17


def sync(x):
    """Force completion (axon block_until_ready is a no-op; complex64
    fetches are unimplemented, so fetch a 1-element real derivative)."""
    import jax
    import jax.numpy as jnp
    leaf = jax.tree_util.tree_leaves(x)[0]
    probe = jnp.real(leaf).reshape(-1)[:1].astype(jnp.float32)
    np.asarray(jax.device_get(probe))


def timeit(fn, *args, reps=5):
    import jax
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

    from dvbs_tpu.spec import modcod, interleaver, scrambling
    from dvbs_tpu.ops import frontend, plsync, plphase, plhdr, demap
    from dvbs_tpu.tx import dvbs2_mod, channel
    from dvbs_tpu.models.dvbs2 import DVBS2Receiver

    mc, short = 4, False
    cfg = modcod.get_config(mc, short=short)
    rx = DVBS2Receiver(mc=mc, short=short, block_symbols=BLOCK)
    L, F = cfg.plframe_len, rx.n_frames
    print(f"frames/carrier {F}, total {N_CARRIERS * F}", flush=True)

    pkts = dvbs2_mod.random_ts_packets(1800, seed=1)
    bb = dvbs2_mod.ts_to_bbframes(pkts, cfg)
    tx = dvbs2_mod.bbframes_to_plframes(bb, cfg).reshape(-1)
    x = channel.shape(tx, sps=2)
    y = channel.impair(x, snr_db=5.0, cfo=0.01 * np.pi, delay_samples=0.4,
                       sco_ppm=10.0, seed=2)
    n = 2 * BLOCK
    one = np.stack([y[:n].real, y[:n].imag]).astype(np.float16)
    samples = np.broadcast_to(one, (N_CARRIERS, 2, n)).copy()

    dev = jax.device_put(jnp.asarray(samples))
    sync(dev)

    # ---- stage-by-stage (vmapped over carriers) ----------------------
    payload_idx = plphase.payload_indices(cfg)
    descr = np.conj(scrambling.pl_scrambler_phasors()[:L - 90])
    deint = interleaver.deinterleave_perm(cfg.constellation, cfg.framesize,
                                          cfg.rate)

    def v(f):
        return jax.jit(jax.vmap(f))

    to_c = v(lambda ri: (ri[0].astype(jnp.float32) +
                         1j * ri[1].astype(jnp.float32)).astype(jnp.complex64))
    st_agc = v(frontend.agc)
    st_cfo = v(frontend.coarse_cfo_estimate)
    st_mix = v(frontend.mix)
    st_mf = v(frontend.matched_filter)
    st_tim = v(lambda yy: frontend.recover_symbols(yy, n_windows=16)[0])
    st_corr = v(lambda z: plsync.correlate(z)[0])
    st_loc = v(lambda s: plsync.locate_frames(s, L, F, margin=rx.edge_margin))
    st_ext = v(lambda zz, ss: plsync.extract_frames(zz, ss, L))

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
        pls_idx, pls_conf = plhdr.detect_pls(frames_c[:, :90])
        llrs = demap.soft_demap(payload, cfg.constellation, cfg.g1, cfg.g2)
        return llrs.reshape(F, -1)[:, deint], pls_idx

    st_phase = v(phase_demap)

    stages = []
    def st(name, fn, *args):
        t, out = timeit(fn, *args)
        stages.append((name, t))
        print(f"  {name:18s} {t * 1e3:7.2f} ms", flush=True)
        return out
    cx = st("to_complex", to_c, dev)
    xa = st("agc", st_agc, cx)
    cfo = st("coarse_cfo", st_cfo, xa)
    xm = st("mix", st_mix, xa, cfo)
    ym = st("matched_filter", st_mf, xm)
    z = st("timing_recovery", st_tim, ym)
    sc = st("plsync_correlate", st_corr, z)
    loc = st("locate_frames", st_loc, sc)
    starts = loc[0]
    frames = st("extract", st_ext, z, starts)
    pd = st("phase+demap", st_phase, frames)
    tot = sum(s[1] for s in stages)
    print(f"  sum of stages      {tot * 1e3:7.2f} ms", flush=True)

    # whole fused _sym_fn for comparison
    vm_core = jax.jit(jax.vmap(rx._sym_fn))
    t, core_out = timeit(vm_core, dev)
    print(f"fused vm_core        {t * 1e3:7.2f} ms", flush=True)

    # ---- fec chunk sweep --------------------------------------------
    llrs = core_out["llrs"].reshape(N_CARRIERS * F, -1)
    sync(llrs)
    total = N_CARRIERS * F
    from dvbs_tpu.ops import ldpc_qc
    for chunk in (8, 12, 24, 32):
        if total % chunk and chunk > total:
            continue
        dec = jax.jit(lambda l: ldpc_qc.decode_qc(
            l, cfg.ldpc_table, n_iters=20))
        import math
        nch = math.ceil(total / chunk)
        pad = nch * chunk

        def run_all(l):
            outs = []
            for lo in range(0, pad, chunk):
                sl = jax.lax.dynamic_slice(
                    l, (min(lo, total - chunk), 0), (chunk, l.shape[1]))
                outs.append(dec(sl)[1])
            return jnp.stack(outs)
        t, bad = timeit(run_all, llrs)
        print(f"  fec chunk={chunk:3d} ({nch} calls) {t * 1e3:7.2f} ms  "
              f"({total / t:.0f} fr/s)", flush=True)

    # ---- int8 upload variant ----------------------------------------
    sn = samples / (np.abs(samples).max() + 1e-9)
    s8 = np.clip(np.round(sn * 127), -127, 127).astype(np.int8)
    up16 = jax.jit(lambda a: a)
    t, _ = timeit(lambda: jax.device_put(jnp.asarray(samples)), reps=5)
    print(f"upload f16 {samples.nbytes / 1e6:.1f} MB: {t * 1e3:.1f} ms "
          f"({samples.nbytes / t / 1e6:.0f} MB/s)", flush=True)
    t, _ = timeit(lambda: jax.device_put(jnp.asarray(s8)), reps=5)
    print(f"upload i8  {s8.nbytes / 1e6:.1f} MB: {t * 1e3:.1f} ms "
          f"({s8.nbytes / t / 1e6:.0f} MB/s)", flush=True)

    # int8 -> complex on device then full core: does dequant cost anything
    deq = v(lambda ri: (ri[0].astype(jnp.float32) +
                        1j * ri[1].astype(jnp.float32)).astype(jnp.complex64)
            / 127.0)
    dev8 = jax.device_put(jnp.asarray(s8))
    t, _ = timeit(deq, dev8)
    print(f"dequant i8->c64: {t * 1e3:.2f} ms", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
