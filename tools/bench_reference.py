#!/usr/bin/env python3
"""Measure the reference implementation headless (-O3 -march=native).

BASELINE.md's open action item: the reference plugin publishes no numbers,
so the honest perf denominator must be measured from its own code. This
tool times the compiled reference coding stack (native/refshim, built from
/root/reference/src/demod at -O3 -march=native) through persistent-handle
C++ timing loops (ctypes/ construction overhead excluded):

  * LDPC layered offset-min-sum decode (bbframe_ldpc.cpp:123-139 via
    layered_decoder.hh:121-133): as-shipped lane-0 gating (blocks=1) and
    the fair all-16-lane best case (blocks=16), clean and at the 5 dB
    operating point used by bench.py.
  * BCH decode (bbframe_bch.cpp:380-405), clean and with bit errors.
  * Viterbi_DVBS steady-state SYNCED decode (viterbi_all.cpp:209-273).
  * RS(204,188) via libcorrect (dvbs_reedsolomon.h:26-47).

The front-end DSP (AGC/FLL/Gardner/PLL) cannot be compiled headless — it
is templated against SDR++ core headers that are not vendored — so the
derived end-to-end numbers below EXCLUDE front-end cost. That strictly
favors the reference: the real plugin is slower than this bound.

Writes REFBENCH.json and prints a BASELINE.md-ready table.
"""
from __future__ import annotations

import json
import os
import platform
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import ref_oracle as R  # noqa: E402


def qpsk_llrs(code_bits: np.ndarray, snr_db: float | None,
              seed: int = 0) -> np.ndarray:
    """QPSK-modulate a codeword, add AWGN at Es/N0 = snr_db, and produce
    int8 LLRs with the same quantization as tests/test_interop.py."""
    bits = code_bits.reshape(-1, 2)
    sym = ((1 - 2.0 * bits[:, 0]) + 1j * (1 - 2.0 * bits[:, 1])) / np.sqrt(2)
    if snr_db is None:
        y = sym
        sigma2 = 0.1
    else:
        rng = np.random.default_rng(seed)
        sigma2 = 10 ** (-snr_db / 10)
        noise = (rng.standard_normal(len(sym)) +
                 1j * rng.standard_normal(len(sym))) * np.sqrt(sigma2 / 2)
        y = sym + noise
    llr = np.empty(code_bits.size, np.float64)
    llr[0::2] = 2 * np.sqrt(2) * y.real / sigma2
    llr[1::2] = 2 * np.sqrt(2) * y.imag / sigma2
    return np.clip(np.round(llr), -127, 127).astype(np.int8)


def bench_ldpc(results: dict) -> None:
    from dvbs_tpu.spec import ldpc_spec, modcod
    W = R.ldpc_simd_width()
    for mc, short, label in [(4, False, "B4_normal"), (4, True, "C4_short")]:
        cfg = modcod.get_config(mc, short=short)
        code = ldpc_spec.get_code(cfg.ldpc_table)
        rng = np.random.default_rng(7)
        llrs_clean, llrs_5db = [], []
        for w in range(W):
            info = rng.integers(0, 2, code.K).astype(np.uint8)
            cw = code.encode(info)
            llrs_clean.append(qpsk_llrs(cw, None))
            llrs_5db.append(qpsk_llrs(cw, 5.0, seed=w))
        llrs_clean = np.stack(llrs_clean)
        llrs_5db = np.stack(llrs_5db)

        for cond, llrs in [("clean", llrs_clean), ("5db", llrs_5db)]:
            reps = 40 if short else 10
            # as shipped: syndrome gate on lane 0 only -> 1 useful frame
            t1, tr1 = R.ldpc_bench(llrs, short, cfg.rate, blocks=1,
                                   reps=reps)
            # fair best case: all 16 lanes decoded and gated
            tw, trw = R.ldpc_bench(llrs, short, cfg.rate, blocks=W,
                                   reps=reps)
            results[f"ldpc_{label}_{cond}"] = {
                "as_shipped_frames_per_s": round(1.0 / t1, 1),
                "as_shipped_trials": tr1,
                "all16_frames_per_s": round(W / tw, 1),
                "all16_trials": trw,
                "sec_per_call_all16": tw,
            }
            print(f"ldpc {label} {cond}: shipped {1.0/t1:8.1f} fr/s "
                  f"({tr1:.1f} trials) | 16-lane {W/tw:8.1f} fr/s "
                  f"({trw:.1f} trials)", flush=True)


def bench_bch(results: dict) -> None:
    from dvbs_tpu.spec import modcod
    for mc, short, label in [(4, False, "normal_12"), (4, True, "short_12")]:
        cfg = modcod.get_config(mc, short=short)
        rng = np.random.default_rng(3)
        data = rng.integers(0, 2, cfg.kbch).astype(np.uint8)
        cw = R.bch_encode(data, short, cfg.rate)
        reps = 200
        t_clean = R.bch_bench(cw, short, cfg.rate, nerr=0, reps=reps)
        t_err = R.bch_bench(cw, short, cfg.rate, nerr=8, reps=reps)
        results[f"bch_{label}"] = {
            "clean_frames_per_s": round(1.0 / t_clean, 1),
            "8err_frames_per_s": round(1.0 / t_err, 1),
            "sec_per_frame_clean": t_clean,
            "sec_per_frame_8err": t_err,
        }
        print(f"bch {label}: clean {1.0/t_clean:8.1f} fr/s | "
              f"8 errs {1.0/t_err:8.1f} fr/s", flush=True)


def bench_viterbi(results: dict) -> None:
    from dvbs_tpu.tx.dvbs_mod import DVBSModulator, random_ts_groups
    mod = DVBSModulator(rate="1/2")
    ts = random_ts_groups(24, seed=3)
    syms = mod.ts_to_symbols(ts)
    soft = np.zeros(2 * len(syms), np.int8)
    soft[0::2] = np.clip(np.round(syms.real * 100), -127, 127)
    soft[1::2] = np.clip(np.round(syms.imag * 100), -127, 127)
    vit = R.ViterbiDVBS(0.15, 20, 8192)
    for i in range(0, len(soft) - 8192, 8192):
        vit.work(soft[i:i + 8192])
    assert vit.state == 1 and vit.rate == 0, "reference viterbi must lock"
    buf = soft[:8192]
    t, nbytes = R.viterbi_bench(vit, buf, reps=200)
    # 8192 soft values = 4096 QPSK symbols = 8192 samples at 2 samp/sym
    results["viterbi_12_synced"] = {
        "soft_symbols_per_s": round(4096 / t, 1),
        "msamples_per_s": round(8192 / t / 1e6, 3),
        "sec_per_8192_buf": t,
    }
    print(f"viterbi 1/2 synced: {4096/t/1e6:.3f} Msym/s "
          f"({8192/t/1e6:.3f} Msamp/s at 2 sps)", flush=True)


def bench_rs(results: dict) -> None:
    from dvbs_tpu.spec import rs_spec
    rng = np.random.default_rng(5)
    pkts = rng.integers(0, 256, (8, 188)).astype(np.uint8)
    frame = np.stack([rs_spec.encode(pkts[p]) for p in range(8)]).reshape(-1)
    t_clean = R.rs_bench(frame, nerr=0, reps=2000)
    t_err = R.rs_bench(frame, nerr=4, reps=2000)
    results["rs_204_188"] = {
        "clean_superframes_per_s": round(1.0 / t_clean, 1),
        "4err_superframes_per_s": round(1.0 / t_err, 1),
        "sec_per_superframe_clean": t_clean,
        "sec_per_superframe_4err": t_err,
    }
    print(f"rs(204,188) 8-packet frame: clean {1.0/t_clean:8.1f} fr/s | "
          f"4 errs/pkt {1.0/t_err:8.1f} fr/s", flush=True)


def derive(results: dict) -> None:
    """Coding-stack-only end-to-end bounds (per core; front end excluded)."""
    # DVB-S2 QPSK 1/2 normal, no pilots: PLFRAME = 90 + 360*90 = 32490
    # symbols = 64980 samples at 2 samples/symbol per FECFRAME.
    spf = 2 * (90 + 360 * 90)
    ld = results["ldpc_B4_normal_5db"]
    bch = results["bch_normal_12"]
    t_shipped = 1.0 / ld["as_shipped_frames_per_s"] + \
        bch["sec_per_frame_8err"]
    t_16 = ld["sec_per_call_all16"] / 16 + bch["sec_per_frame_8err"]
    results["derived_s2_qpsk12_msamples_per_s_per_core"] = {
        "as_shipped": round(spf / t_shipped / 1e6, 3),
        "all16_lanes": round(spf / t_16 / 1e6, 3),
    }
    # DVB-S 1/2: viterbi dominates; RS adds per 1632-byte super-frame
    # (= 1632*8*2 soft symbols at rate 1/2 = 26112 symbols = 52224 samples)
    vt = results["viterbi_12_synced"]["sec_per_8192_buf"] / 8192  # per samp
    rs = results["rs_204_188"]["sec_per_superframe_4err"] / 52224
    results["derived_dvbs_qpsk12_msamples_per_s_per_core"] = round(
        1.0 / (vt + rs) / 1e6, 3)
    d = results["derived_s2_qpsk12_msamples_per_s_per_core"]
    print(f"derived S2 QPSK1/2 bound/core: shipped {d['as_shipped']} "
          f"Msamp/s, 16-lane {d['all16_lanes']} Msamp/s; DVB-S "
          f"{results['derived_dvbs_qpsk12_msamples_per_s_per_core']} "
          f"Msamp/s", flush=True)


def main() -> int:
    results: dict = {
        "host": {
            "cpu": platform.processor() or "unknown",
            "nproc": os.cpu_count(),
            "flags": "-O3 -march=native",
            "measured_utc": time.strftime("%Y-%m-%d %H:%M:%S",
                                          time.gmtime()),
        },
        "simd_width": R.ldpc_simd_width(),
    }
    try:
        results["host"]["cpu"] = [
            ln.split(":", 1)[1].strip()
            for ln in open("/proc/cpuinfo")
            if ln.startswith("model name")][0]
    except Exception:
        pass
    bench_ldpc(results)
    bench_bch(results)
    bench_viterbi(results)
    bench_rs(results)
    derive(results)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "..", "REFBENCH.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {os.path.normpath(out)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
