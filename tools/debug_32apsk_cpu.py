#!/usr/bin/env python3
"""CPU repro of the bench 32APSK carrier-6 gate failure (VERDICT r4 #1).

The on-chip A/B (tools/debug_32apsk_roll.py) proved the LDPC pltpu.roll
change is NOT the cause (prim/buffer bit-identical) and the sensitivity
run (tools/debug_32apsk_c6.py) isolated the trigger to CFO: 0.016pi
passes, 0.018pi fails, 0.020pi passes (non-monotonic!), independent of
seed and delay.  This script reproduces the corner on CPU at bank
per-carrier geometry and maps WHERE the demapped bits go bad: per-frame
raw BER vs the true LDPC codeword, per-16th-of-frame BER profile, and
the per-frame freq estimate — separating residual-frequency error
(uniform BER, freq off) from phase-interpolation drift (BER ramps
between pilot anchors).
"""
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax.numpy as jnp

    from dvbs_tpu.spec import modcod, ldpc_spec, bch_spec, interleaver
    from dvbs_tpu.tx import dvbs2_mod, channel
    from dvbs_tpu.ops import frontend
    from dvbs_tpu.models.dvbs2 import DVBS2Receiver
    from dvbs_tpu.parallel.mesh import bank_block_symbols

    mc, snr_db, seed, delay = 24, 14.5, 128, 0.85
    cfg = modcod.get_config(mc, short=False, pilots=True)
    BLOCK = bank_block_symbols(8, mc=mc, short=False, pilots=True)
    n = 2 * BLOCK

    # truth codewords for the whole TX stream
    pkts = dvbs2_mod.random_ts_packets(700, seed=seed)
    bb = dvbs2_mod.ts_to_bbframes(pkts, cfg)
    bits = np.unpackbits(bb, axis=1)
    code = ldpc_spec.get_code(cfg.ldpc_table)
    cws = []
    for i in range(bb.shape[0]):
        cw = code.encode(bch_spec.encode(bits[i], cfg.framesize, cfg.rate))
        cws.append(cw)
    cws = np.asarray(cws, np.uint8)
    tx = dvbs2_mod.bbframes_to_plframes(bb, cfg).reshape(-1)
    x = channel.shape(tx, sps=2)

    rx = DVBS2Receiver(mc=mc, short=False, pilots=True,
                       block_symbols=BLOCK, max_ldpc_trials=12)
    F = rx.n_frames

    for cfo_pi in (0.016, 0.017, 0.018, 0.019, 0.020):
        y = channel.impair(x, snr_db=snr_db, cfo=cfo_pi * np.pi,
                           delay_samples=delay, sco_ppm=10.0,
                           seed=seed + 1)[:n]
        p = frontend.pack_cs4(y)
        ri = np.asarray(frontend.unpack_cs4(jnp.asarray(p[None]))[0])
        out = rx._sym_fn(jnp.asarray(ri))
        llrs = np.asarray(out["llrs"])          # [F, nldpc]
        hard = (llrs < 0).astype(np.uint8)
        # align each RX frame to its TX codeword by min-BER match
        bers, prof = [], []
        for f in range(F):
            b = (hard[f][None, :] != cws).mean(axis=1)
            k = int(np.argmin(b))
            bers.append(b[k])
            seg = (hard[f] != cws[k]).reshape(16, -1).mean(axis=1)
            prof.append(seg)
        bers = np.asarray(bers)
        prof = np.asarray(prof)
        wf = int(np.argmax(bers))
        print(f"cfo {cfo_pi:5.3f}pi: cfo_est {float(out['cfo'][0]):+.5f} "
              f"({cfo_pi * np.pi:+.5f} true rad/sample) "
              f"freq/frame {np.round(np.asarray(out['freq']), 5).tolist()}",
              flush=True)
        print(f"    frame BER {np.round(bers, 3).tolist()}", flush=True)
        print(f"    worst frame {wf} profile/16 "
              f"{np.round(prof[wf], 3).tolist()}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
