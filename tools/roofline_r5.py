#!/usr/bin/env python3
"""Roofline/MFU accounting for the fused S2 bank step (VERDICT r4 #7).

Static accounting from the program's actual array shapes: HBM bytes
moved (reads+writes of the major arrays per stage, assuming perfect
fusion WITHIN a stage — a lower bound) and MXU/VPU op counts.  Prints
a per-stage table + the roofline floors vs TPU v5e peaks, to compare
against the measured 13.5 ms step.
"""
import sys

sys.path.insert(0, ".")

import numpy as np

from dvbs_tpu.spec import modcod
from dvbs_tpu.ops import frontend, ldpc_pallas
from dvbs_tpu.parallel.mesh import bank_block_symbols

# TPU v5e (jax device_kind "TPU v5 lite") public peaks
HBM_GBS = 819.0          # GB/s
MXU_BF16 = 197e12        # FLOP/s
MXU_F32 = MXU_BF16 / 6   # HIGHEST-precision f32 = 6 bf16 passes
VPU_OPS = 3.6e12         # ~8x128 lanes x 4 ALUs x 0.9 GHz, elementwise/s

C = 8
mc, short = 4, False
cfg = modcod.get_config(mc, short=short)
S = bank_block_symbols(C, mc=mc, short=short)
n2 = 2 * S
F = 16                   # frames/carrier (128 lanes total)
L = cfg.plframe_len
N = cfg.nldpc
c64, f32, i8 = 8, 4, 1

rows = []


def stage(name, hbm_mb, mxu_gflop=0.0, vpu_gops=0.0, note=""):
    rows.append((name, hbm_mb, mxu_gflop, vpu_gops, note))


# ---- per-block totals (x C carriers where per-carrier) ----
# ingest + agc + coarse CFO + mix: read cs4 (1 B/sample), unpack,
# 2 reduction passes + 1 rewrite of the complex stream
stage("unpack+agc+cfo+mix",
      C * (n2 * 1 + 3 * n2 * c64) / 1e6,
      vpu_gops=C * n2 * 30 / 1e9, note="3 passes over c64 stream")
# matched filter: window build + bf16 matmul [2nb, blk+K-1]x[blk+K-1, blk]
nb = n2 // 256
stage("matched filter (MXU bf16)",
      C * (2 * n2 * c64 + 2 * nb * 320 * 2) / 1e6,
      mxu_gflop=C * 2 * (2 * nb) * 320 * 256 / 1e9)
# O&M timing terms: interpolator FIRs (shared pass) + window sums
stage("O&M tau estimate",
      C * (3 * n2 * c64) / 1e6,
      mxu_gflop=C * 2 * (2 * nb) * (256 + 47) * 256 / 1e9,
      vpu_gops=C * n2 * 12 / 1e9)
# resample: parity-split matmul + rows build (4 planes, 4x dup) + kernel
bias = 1 << (frontend._shift_bits_for(S) - 1)
nt = S // 256
WEp = 4 * 256
rows_mb = 4 * nt * WEp * f32
stage("resample prep (split mm + rows)",
      C * (2 * n2 * f32 * 2 + 2 * rows_mb) / 1e6,
      mxu_gflop=C * 2 * (2 * nb) * 512 * 512 / 1e9,
      note=f"rows 4x{nt}x{WEp} f32 w+r")
stage("resample kernel (Pallas)",
      C * (rows_mb + S * f32 + 2 * S * f32) / 1e6,
      vpu_gops=C * (9 * 4 * nt * 700 * 2 + S * 10 * 13 * 2) / 1e9,
      note="barrel selects + Farrow FMAs in VMEM")
# PL sync: correlate matmul + locate/extract
stage("plsync correlate+locate",
      C * (3 * S * c64) / 1e6,
      mxu_gflop=C * 2 * S * 114 * 2 / 1e9)
# phase chain: FED/L&R (header+... passes), anchor track, derotate
stage("phase chain",
      C * (6 * F * L * c64) / 1e6,
      vpu_gops=C * F * L * 40 / 1e9)
# demap + deint + quantize
P = N // 2
stage("demap+deint+quant",
      C * (F * P * c64 + 2 * F * N * f32 + F * N * i8) / 1e6,
      vpu_gops=C * F * P * 25 / 1e9)
# FEC: 3.02 avg sweeps, msgs [q, Dmax, 384, 128] i8 r+w per sweep,
# posteriors VMEM-resident; VPU ~18 int32 passes per edge tile
kt = ldpc_pallas.kernel_tables(cfg.ldpc_table)
q, Dmax = kt["q"], kt["Dmax"]
sweeps = 3.02
msgs_mb = q * Dmax * 384 * 128 * i8 / 1e6
stage("LDPC (B=128, 3.02 sweeps)",
      sweeps * 2 * msgs_mb + 2 * (128 * N * i8) / 1e6,
      vpu_gops=sweeps * q * Dmax * 18 * 384 * 128 / 1e9,
      note=f"msgs {msgs_mb:.0f} MB/sweep r+w")
# BCH syndromes (GF(2) matmul against parity matrix) + pack + BB xor
stage("BCH+pack+descramble",
      (128 * N * i8 + 3 * 128 * cfg.kbch / 8) / 1e6,
      mxu_gflop=2 * 128 * cfg.nbch * 192 / 2 / 1e9)

tot_mb = sum(r[1] for r in rows)
tot_mxu = sum(r[2] for r in rows)
tot_vpu = sum(r[3] for r in rows)
print(f"{'stage':34s} {'HBM MB':>8s} {'MXU GF':>8s} {'VPU Gop':>8s}  note")
for nm, mb, mx, vp, note in rows:
    print(f"{nm:34s} {mb:8.1f} {mx:8.2f} {vp:8.2f}  {note}")
print("-" * 78)
print(f"{'TOTAL':34s} {tot_mb:8.1f} {tot_mxu:8.2f} {tot_vpu:8.2f}")
t_hbm = tot_mb / 1e3 / HBM_GBS * 1e3
t_mxu = tot_mxu * 1e9 / MXU_BF16 * 1e3
t_vpu = tot_vpu * 1e9 / VPU_OPS * 1e3
print(f"\nfloors: HBM {t_hbm:.2f} ms | MXU(bf16) {t_mxu:.3f} ms | "
      f"VPU {t_vpu:.2f} ms")
print(f"binding floor (max, overlappable): {max(t_hbm, t_mxu, t_vpu):.2f} ms"
      f"  -> measured 13.5 ms = "
      f"{max(t_hbm, t_mxu, t_vpu) / 13.5 * 100:.0f}% of roofline")
