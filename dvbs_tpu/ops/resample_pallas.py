"""Fused barrel-shift + Farrow resampler — Pallas TPU kernel.

Drop-in accelerator for ops/frontend.resample_windowed (the timing-
recovery interpolator: per-tile integer delay alignment + narrow-band
Farrow fractional interpolation, semantics of the reference's
polyphase clock recovery, complex_fd.cpp:152-157 / gardner.h:29).

The XLA formulation pays the log2(range) barrel passes and the Farrow
tap passes as separate HBM-resident array ops (~4.5 ms of the S2 bank
block at bench scale, PROFILE_r5).  Here one kernel makes ONE pass
over the samples: each grid step DMAs a chunk of tile rows from HBM,
runs the whole masked-select barrel and the 10-tap polynomial
evaluation in VMEM, and writes only the output symbols back.

Mosaic facts that shaped the layout (each cost a failed lowering):
- ANY-memory-space operands cannot be vmapped -> the kernel is
  explicitly carrier-batched (grid (C, chunks)) and the public wrapper
  carries a jax.custom_batching.custom_vmap rule, so the carrier
  banks' vmapped per-carrier core hits the batched kernel unchanged;
- jnp's x[:, 0::2] emits a GATHER and lax.slice strides other than 1
  are rejected -> the even/odd sample planes are pre-split in XLA
  (one stride-2 pass over the input, done once) and the kernel works
  on parity planes throughout: a shift of the interleaved stream by
  rb is a shift of both planes by rb>>1 plus a parity swap when rb is
  odd, which also HALVES the barrel's masked-select traffic and drops
  one stage.

Layout: each parity plane is reshaped [nt_pad, TS] so a sublane row
holds one tile's 256 even (odd) samples; a chunk of TC tiles plus
overflow rows gives every row's window by static lane concats (no
gathers).  Each barrel stage is a [TC, w] masked lane-slice select
keyed on a [TC, 1] per-tile shift input.

Numerics match resample_windowed exactly (same padded buffer, same
clipped shifts, same Farrow coefficients, f32 ops in the same order);
asserted in tests/test_resample_pallas.py and the on-chip prototype
tools/proto_resample_pallas.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.custom_batching import custom_vmap
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import frontend

TS = frontend._TILE_SYM            # 256 symbols per tile (512 samples)
TAPS = frontend._FARROW_TAPS       # 10
DEG = frontend._FARROW_DEG         # 9

# rows-buffer dtype flag ("f32" | "bf16"), read at trace time. bf16
# halves the rows build's HBM traffic — the single largest item of the
# S2 block's roofline (708 of 2290 MB, BASELINE.md). The samples are
# already bf16-matmul products of 4-8-bit quantized IQ well under the
# AWGN floor, so the extra rounding is invisible next to channel noise
# (decode-level equivalence asserted on chip before flipping the
# default; accuracy vs the 128-phase oracle in tests).
ROWS_DTYPE = "f32"


def _kernel(e_re, e_im, o_re, o_im, u_ref, rb_ref,
            ore_ref, oim_ref, *, TC, WE, shift_bits, coef, rows_bf16):
    # rows[t, x] = plane_pp[TS*tile + x], x < WE — built in XLA (an
    # in-kernel lane concat crashes this Mosaic build, bisect v6)
    if rows_bf16:
        re_, ie_ = e_re[0].astype(jnp.float32), e_im[0].astype(jnp.float32)
        ro_, io_ = o_re[0].astype(jnp.float32), o_im[0].astype(jnp.float32)
    else:
        re_, ie_ = e_re[0], e_im[0]
        ro_, io_ = o_re[0], o_im[0]

    rbv = rb_ref[0]                     # [TC, 1] per-tile shifts
    hv = rbv >> 1
    odd = (rbv & 1) != 0

    # barrel both parity planes by h = rb>>1 (log2 masked stages)
    w = WE
    planes = [re_, ie_, ro_, io_]
    for b in reversed(range(shift_bits - 1)):
        step = 1 << b
        bit = ((hv >> b) & 1) != 0
        w -= step
        planes = [jnp.where(bit, p[:, step:step + w], p[:, :w])
                  for p in planes]
    re_, ie_, ro_, io_ = planes
    # parity swap for odd rb: even-tap plane <- odd-shifted, odd-tap
    # plane <- even shifted one further
    e_pre = jnp.where(odd, ro_[:, :w - 1], re_[:, :w - 1])
    e_pim = jnp.where(odd, io_[:, :w - 1], ie_[:, :w - 1])
    o_pre = jnp.where(odd, re_[:, 1:w], ro_[:, :w - 1])
    o_pim = jnp.where(odd, ie_[:, 1:w], io_[:, :w - 1])

    u = u_ref[0]
    out_re = jnp.zeros((TC, TS), jnp.float32)
    out_im = jnp.zeros((TC, TS), jnp.float32)
    for ci in range(TAPS):
        tap = jnp.full((TC, TS), coef[ci][0], jnp.float32)
        for dg in range(1, DEG + 1):
            tap = tap * u + coef[ci][dg]
        pre = e_pre if ci % 2 == 0 else o_pre
        pim = e_pim if ci % 2 == 0 else o_pim
        out_re = out_re + tap * pre[:, ci // 2:ci // 2 + TS]
        out_im = out_im + tap * pim[:, ci // 2:ci // 2 + TS]
    ore_ref[0] = out_re
    oim_ref[0] = out_im


@functools.lru_cache()
def _parity_mats():
    """[2*TS, TS] 0/1 matrices: columns 0:TS//2 pick even elements of a
    2*TS sample block, TS//2:TS the odd ones (wait: [2*TS] -> TS evens)
    — Pe[i, j] = 1 iff i == 2j; Po[i, j] = 1 iff i == 2j+1."""
    Pe = np.zeros((2 * TS, TS), np.float32)
    Po = np.zeros((2 * TS, TS), np.float32)
    for j in range(TS):
        Pe[2 * j, j] = 1.0
        Po[2 * j + 1, j] = 1.0
    return np.concatenate([Pe, Po], axis=1)    # [2*TS, 2*TS]


@functools.partial(jax.jit, static_argnames=("shift_bits", "tc",
                                             "interpret", "rows_bf16"))
def _resample_core(y_re, y_im, u, rb, *, shift_bits, tc=16,
                   interpret=False, rows_bf16=False):
    """Batched core. y_re/y_im: [C, n2] f32 samples; u: [C, nt, TS] f32
    Farrow band coordinate; rb: [C, nt] int32 biased shifts.
    Returns ([C, nt, TS] f32) x2."""
    C, nt = u.shape[0], u.shape[1]
    bias = 1 << (shift_bits - 1)
    TC = tc
    ntp = -(-nt // TC) * TC
    nck = ntp // TC
    # parity-plane window per tile: even index k of tile t reads
    # plane[TS*t + (rb>>1) (+1) + k + ci//2], so WE covers TS + TAPS/2
    # + max(h)+1 = TS + bias + 6 columns
    WE = TS + bias + 6
    extra = -(-WE // TS)            # overflow rows for the lane concat
    pad_rows = max(extra, TC)       # the shifted ext reshape reads to
    need = (ntp + pad_rows) * TS    # row TC+ntp-1
    P = jnp.asarray(_parity_mats())

    def blk(y):
        # pad + parity split. A stride-2 lane slice of the [C, 2M] f32
        # stream is an 11 ms relayout at bank scale (tools/
        # split_resample_pallas.py main3); a 0/1 permutation MATMUL of
        # the [., 2*TS] blocks rides the MXU at ~0.1 ms instead. f32
        # HIGHEST keeps it exact (one 1 per column -> each output is a
        # single unrounded f32 copy).
        ypp = jnp.pad(y, ((0, 0), (bias + 4, 0)))
        if ypp.shape[1] < 2 * need:
            ypp = jnp.pad(ypp, ((0, 0), (0, 2 * need - ypp.shape[1])))
        else:
            ypp = ypp[:, :2 * need]
        a = ypp.reshape(C * (ntp + pad_rows), 2 * TS)
        eo = jnp.dot(a, P, precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
        ev = eo[:, :TS].reshape(C, ntp + pad_rows, TS)
        od = eo[:, TS:].reshape(C, ntp + pad_rows, TS)
        return ev, od

    ye_re, yo_re = blk(y_re)
    ye_im, yo_im = blk(y_im)
    if ntp != nt:
        u = jnp.concatenate(
            [u, jnp.zeros((C, ntp - nt, TS), u.dtype)], axis=1)
        rb = jnp.concatenate(
            [rb, jnp.full((C, ntp - nt), bias, rb.dtype)], axis=1)

    def rows_from(plane):
        # overlapped per-tile windows [C, ntp, >=WE] from shifted-row
        # FULL-WIDTH slices of the [., TS] reshape + ONE lane concat —
        # in XLA, where lane concats are legal (in-kernel they crash
        # this Mosaic build, tools/bisect_resample_kernel2.py v6; and a
        # manual-DMA pl.ds slice of an ANY ref crashes too, v1 — so
        # the rows are materialized and streamed by the standard
        # auto-double-buffered BlockSpec pipeline). All parts full
        # width: a skinny tail concat relayouts.
        parts = [plane[:, m:m + ntp, :] for m in range(extra)]
        if len(parts) == 1:
            return parts[0]
        return jnp.concatenate(parts, axis=2)

    ye_re, ye_im = rows_from(ye_re), rows_from(ye_im)
    yo_re, yo_im = rows_from(yo_re), rows_from(yo_im)
    if rows_bf16:
        ye_re, ye_im = (a.astype(jnp.bfloat16) for a in (ye_re, ye_im))
        yo_re, yo_im = (a.astype(jnp.bfloat16) for a in (yo_re, yo_im))
    coef_np, _, _ = frontend._farrow_coeffs()
    coef = tuple(tuple(float(v) for v in row) for row in coef_np)
    kern = functools.partial(_kernel, TC=TC, WE=WE,
                             shift_bits=shift_bits, coef=coef,
                             rows_bf16=rows_bf16)
    vspec = pl.BlockSpec((1, TC, TS), lambda c, k: (c, k, 0),
                         memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((1, TC, extra * TS), lambda c, k: (c, k, 0),
                         memory_space=pltpu.VMEM)
    out_re, out_im = pl.pallas_call(
        kern,
        grid=(C, nck),
        in_specs=[rspec, rspec, rspec, rspec,
                  vspec,                                 # u
                  pl.BlockSpec((1, TC, 1), lambda c, k: (c, k, 0),
                               memory_space=pltpu.VMEM)],   # rb
        out_specs=[vspec, vspec],
        out_shape=[
            jax.ShapeDtypeStruct((C, ntp, TS), jnp.float32),
            jax.ShapeDtypeStruct((C, ntp, TS), jnp.float32),
        ],
        interpret=interpret,
    )(ye_re, ye_im, yo_re, yo_im, u, rb[..., None])
    return out_re[:, :nt], out_im[:, :nt]


def _resample_batched(y2: jax.Array, t: jax.Array, tc: int = 32,
                      interpret: bool = False) -> jax.Array:
    """[C, n2] complex x [C, S] -> [C, S] complex via the batched core.
    Mirrors frontend.resample_windowed's shift/band computation."""
    C, S = t.shape
    nt = -(-S // TS)
    Sp = nt * TS
    shift_bits = frontend._shift_bits_for(S)
    bias = 1 << (shift_bits - 1)
    coef_np, mid, halfr = frontend._farrow_coeffs()
    k = jnp.arange(Sp, dtype=t.dtype)
    tp = jnp.pad(t, ((0, 0), (0, Sp - S)), mode="edge") if Sp != S else t
    g = tp - 2 * k[None, :]
    gt = g.reshape(C, nt, TS)
    r = jnp.round(0.5 * (gt[:, :, TS // 2 - 1] + gt[:, :, TS // 2])
                  ).astype(jnp.int32)
    rb = jnp.clip(r + bias, 0, 2 * bias - 1)
    d = gt - r[:, :, None].astype(t.dtype) + 4.0
    u = ((jnp.clip(d, frontend._FARROW_LO, frontend._FARROW_HI) - mid)
         / halfr).astype(jnp.float32)
    out_re, out_im = _resample_core(
        jnp.real(y2).astype(jnp.float32), jnp.imag(y2).astype(jnp.float32),
        u, rb, shift_bits=shift_bits, tc=tc, interpret=interpret,
        rows_bf16=ROWS_DTYPE == "bf16")
    out = out_re.reshape(C, Sp)[:, :S] + 1j * out_im.reshape(C, Sp)[:, :S]
    return out.astype(jnp.complex64)


@custom_vmap
def resample_windowed_pallas(y2: jax.Array, t: jax.Array) -> jax.Array:
    """Pallas drop-in for frontend.resample_windowed(y2, t).

    Same tile/shift/Farrow semantics (docstring there); the barrel and
    tap evaluation run fused in one kernel pass.  vmap over the leading
    (carrier) axis routes into the same explicitly-batched kernel via
    custom_vmap (the carrier banks vmap their per-carrier core).
    """
    return _resample_batched(y2[None], t[None])[0]


@resample_windowed_pallas.def_vmap
def _resample_vmap_rule(axis_size, in_batched, y2, t):
    yb, tb = in_batched
    if not yb:
        y2 = jnp.broadcast_to(y2[None], (axis_size,) + y2.shape)
    if not tb:
        t = jnp.broadcast_to(t[None], (axis_size,) + t.shape)
    return _resample_batched(y2, t), True
