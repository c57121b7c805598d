#!/usr/bin/env python3
"""32APSK 3/4 margin study (VERDICT r4 #6): frame-error rate and LDPC
trials vs Es/N0 for OUR demap chain (exact-LLR demap -> device
deinterleave -> per-frame rms-8 int8 quantization, with and without
4-bit cs4-style symbol quantization) against the REFERENCE demap chain
(constellation.cpp demod_soft_calc npwr=1.0 + s2_deinterleaver) on
IDENTICAL noisy symbols, both decoded by their own LDPC (ours:
ops/ldpc_qc decode_qc@12 sweeps; reference: refshim ldpc_decode@16).

Quantifies where the 14.5 dB bench operating point's margin goes.
Runs on CPU (JAX_PLATFORMS=cpu recommended).
"""
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")


def main():
    import jax.numpy as jnp
    import ref_oracle as R
    from dvbs_tpu.spec import modcod, scrambling, interleaver
    from dvbs_tpu.ops import demap, ldpc_qc, ldpc_pallas
    from dvbs_tpu.spec import interleaver as itl
    from dvbs_tpu.tx import dvbs2_mod

    mc = 24
    cfg = modcod.get_config(mc, short=False, pilots=False)
    NF = 16
    pkts = dvbs2_mod.random_ts_packets(
        (cfg.kbch // 8 // 188 + 2) * (NF + 1), seed=3)
    bb = dvbs2_mod.ts_to_bbframes(pkts, cfg)
    frames = dvbs2_mod.bbframes_to_plframes(bb, cfg)[:NF]
    payloads = np.stack([scrambling.pl_descramble(f[90:]) for f in frames])

    def cs4_syms(y):
        """4-bit mid-rise quantization of I/Q at the cs4 scale (the
        pack_cs4 sample path, applied at symbol level)."""
        s = 2.5                       # frontend.pack_cs4 target rms (LSB)
        rms = np.sqrt(np.mean(np.abs(y) ** 2))
        q = np.clip(np.round(y.real * (s / rms)), -7, 7) / (s / rms) + \
            1j * (np.clip(np.round(y.imag * (s / rms)), -7, 7) / (s / rms))
        return q.astype(np.complex64)

    rng = np.random.default_rng(7)
    print(f"{'EsN0':>5s} | {'ours FER':>9s} {'trials':>6s} | "
          f"{'ours+cs4 FER':>12s} {'trials':>6s} | "
          f"{'ref FER':>8s} {'trials':>6s}")
    for snr in (13.5, 14.0, 14.5, 15.0, 15.5):
        sigma2 = 10 ** (-snr / 10)
        noise = np.sqrt(sigma2 / 2) * (
            rng.standard_normal(payloads.shape) +
            1j * rng.standard_normal(payloads.shape))
        ys = (payloads + noise).astype(np.complex64)

        def ours(ysym):
            # the exact production path: exact-LLR demap -> structured
            # deinterleave -> rms-8 int8 quantization -> the B=128
            # Pallas OMS kernel (interpret mode on CPU), cyclic lane
            # padding as mesh.make_fec_pallas does
            llr = demap.soft_demap(jnp.asarray(ysym), cfg.constellation,
                                   cfg.g1, cfg.g2)
            llr = itl.deinterleave_device(llr, cfg.constellation,
                                          cfg.framesize, cfg.rate)
            l8 = ldpc_pallas.quantize_llrs(llr)
            c = l8.shape[0]
            chunk = jnp.tile(l8, (-(-ldpc_pallas.B // c), 1)
                             )[:ldpc_pallas.B]
            hard, bad, tr = ldpc_pallas.decode_qc_pallas(
                chunk, cfg.ldpc_table, n_iters=12, interpret=True)
            return (np.asarray(bad)[:c] > 0), np.asarray(tr)[:c]

        fe1, tr1 = ours(ys)
        fe2, tr2 = ours(cs4_syms(ys))

        fer_r, trr = [], []
        for f in range(NF):
            llr_sym = R.constellation_soft_demod(
                ys[f], cfg.constellation, cfg.g1 or 0.0, cfg.g2 or 0.0, 1.0)
            llr = R.s2_deinterleave(llr_sym.reshape(-1),
                                    cfg.constellation, False, cfg.rate)
            _, t = R.ldpc_decode(llr, False, cfg.rate, max_trials=16)
            fer_r.append(t < 0)
            trr.append(t if t >= 0 else 16)
        print(f"{snr:5.1f} | {fe1.mean():9.3f} {tr1.mean():6.1f} | "
              f"{fe2.mean():12.3f} {tr2.mean():6.1f} | "
              f"{np.mean(fer_r):8.3f} {np.mean(trr):6.1f}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
