"""Fused barrel-shift + Farrow resampler — Pallas TPU kernel.

Drop-in accelerator for ops/frontend.resample_windowed (the timing-
recovery interpolator: per-tile integer delay alignment + narrow-band
Farrow fractional interpolation, semantics of the reference's
polyphase clock recovery, complex_fd.cpp:152-157 / gardner.h:29).

The XLA formulation pays the log2(range) barrel passes and the Farrow
tap passes as separate HBM-resident array ops (~3 ms of the 14.15 ms
S2 bank block, PROFILE_r4/r5).  Here one kernel makes ONE pass over
the samples: each grid step DMAs a chunk of tile rows from HBM, does
the whole masked-select barrel, the even/odd plane split, and the
10-tap polynomial evaluation in VMEM, and writes only the output
symbols back.  HBM traffic drops from ~(log2(range)+4) passes to
read-once + write-once.

Layout: the padded sample stream is reshaped [nt_pad, 2*TS] so each
sublane row IS one tile's 512 samples; a chunk of TC tiles plus two
overflow rows gives every row's [width] window by two static lane
concats (no gathers).  The per-tile integer shifts ride scalar
prefetch; each barrel stage is a [TC, width] masked lane-slice select.

Numerics match resample_windowed exactly (same padded buffer, same
clipped shifts, same Farrow coefficients, f32 ops in the same order);
equality is asserted in tests/test_resample_pallas.py and the TPU
prototype tools/proto_resample_pallas.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import frontend

TS = frontend._TILE_SYM            # 256 symbols per tile (512 samples)
TAPS = frontend._FARROW_TAPS       # 10
DEG = frontend._FARROW_DEG         # 9


def _kernel(rb_ref, yb_re, yb_im, u_ref, ore_ref, oim_ref,
            a_re, a_im, sem, *, TC, width, shift_bits, coef):
    k = pl.program_id(0)

    # DMA the chunk's tile rows (+2 overflow rows for the lane concat)
    cp_re = pltpu.make_async_copy(
        yb_re.at[pl.ds(k * TC, TC + 2), :], a_re, sem.at[0])
    cp_im = pltpu.make_async_copy(
        yb_im.at[pl.ds(k * TC, TC + 2), :], a_im, sem.at[1])
    cp_re.start()
    cp_im.start()
    cp_re.wait()
    cp_im.wait()

    def rows_of(a):
        # rows[t, x] = ypp[2*TS*(k*TC + t) + x], x < width (width < 4*TS)
        if width <= 2 * TS:
            return a[0:TC, 0:width]
        return jnp.concatenate(
            [a[0:TC, :], a[1:TC + 1, 0:width - 2 * TS]], axis=1)

    r_re = rows_of(a_re)
    r_im = rows_of(a_im)

    # per-tile shifts as a [TC, 1] vector of prefetched scalars
    rbv = jnp.concatenate(
        [rb_ref[k * TC + t].reshape(1, 1) for t in range(TC)], axis=0)

    # barrel: drop rb columns from the left, log2 masked stages
    w = width
    for b in reversed(range(shift_bits)):
        step = 1 << b
        bit = ((rbv >> b) & 1) != 0
        w -= step
        r_re = jnp.where(bit, r_re[:, step:step + w], r_re[:, :w])
        r_im = jnp.where(bit, r_im[:, step:step + w], r_im[:, :w])

    # even/odd sample planes (contiguous per-tap slices below)
    half = w // 2
    e_re = r_re[:, 0::2][:, :half]
    e_im = r_im[:, 0::2][:, :half]
    o_re = r_re[:, 1::2][:, :half]
    o_im = r_im[:, 1::2][:, :half]

    u = u_ref[:]
    out_re = jnp.zeros((TC, TS), jnp.float32)
    out_im = jnp.zeros((TC, TS), jnp.float32)
    for ci in range(TAPS):
        tap = jnp.full((TC, TS), coef[ci][0], jnp.float32)
        for dg in range(1, DEG + 1):
            tap = tap * u + coef[ci][dg]
        pre = e_re if ci % 2 == 0 else o_re
        pim = e_im if ci % 2 == 0 else o_im
        out_re = out_re + tap * pre[:, ci // 2:ci // 2 + TS]
        out_im = out_im + tap * pim[:, ci // 2:ci // 2 + TS]
    ore_ref[:] = out_re
    oim_ref[:] = out_im


@functools.partial(jax.jit, static_argnames=("shift_bits", "tc", "interpret"))
def _resample_core(y_re, y_im, u, rb, *, shift_bits, tc=8,
                   interpret=False):
    """y_re/y_im: [n2] f32 input samples; u: [nt, TS] f32 Farrow band
    coordinate; rb: [nt] int32 biased shifts. Returns ([nt, TS] f32) x2."""
    nt = u.shape[0]
    bias = 1 << (shift_bits - 1)
    width = 2 * TS + (2 * bias - 1) + TAPS
    TC = tc
    ntp = -(-nt // TC) * TC
    nck = ntp // TC
    # padded/reshaped sample planes: row t = ypp[512*t : 512*t + 512]
    need = (ntp + 2) * 2 * TS
    def blk(y):
        ypp = jnp.pad(y, (bias + 4, 0))
        ypp = jnp.pad(ypp, (0, need - ypp.shape[0])) if ypp.shape[0] < need \
            else ypp[:need]
        return ypp.reshape(ntp + 2, 2 * TS)
    yb_re, yb_im = blk(y_re), blk(y_im)
    if ntp != nt:
        u = jnp.concatenate(
            [u, jnp.zeros((ntp - nt, TS), u.dtype)], axis=0)
        rb = jnp.concatenate(
            [rb, jnp.full((ntp - nt,), bias, rb.dtype)], axis=0)
    coef_np, _, _ = frontend._farrow_coeffs()
    coef = tuple(tuple(float(v) for v in row) for row in coef_np)
    kern = functools.partial(_kernel, TC=TC, width=width,
                             shift_bits=shift_bits, coef=coef,
)
    out_re, out_im = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nck,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),     # yb_re
                pl.BlockSpec(memory_space=pl.ANY),     # yb_im
                pl.BlockSpec((TC, TS), lambda k, *_: (k, 0),
                             memory_space=pltpu.VMEM),    # u
            ],
            out_specs=[
                pl.BlockSpec((TC, TS), lambda k, *_: (k, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TC, TS), lambda k, *_: (k, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((TC + 2, 2 * TS), jnp.float32),   # a_re
                pltpu.VMEM((TC + 2, 2 * TS), jnp.float32),   # a_im
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((ntp, TS), jnp.float32),
            jax.ShapeDtypeStruct((ntp, TS), jnp.float32),
        ],
        interpret=interpret,
    )(rb, yb_re, yb_im, u)
    return out_re[:nt], out_im[:nt]


def resample_windowed_pallas(y2: jax.Array, t: jax.Array,
                             tc: int = 8,
                             interpret: bool = False) -> jax.Array:
    """Pallas drop-in for frontend.resample_windowed(y2, t).

    Same tile/shift/Farrow semantics (docstring there); the barrel and
    tap evaluation run fused in one kernel pass.
    """
    S = t.shape[-1]
    nt = -(-S // TS)
    Sp = nt * TS
    shift_bits = frontend._shift_bits_for(S)
    bias = 1 << (shift_bits - 1)
    coef_np, mid, halfr = frontend._farrow_coeffs()
    k = jnp.arange(Sp, dtype=t.dtype)
    tp = jnp.pad(t, (0, Sp - S), mode="edge") if Sp != S else t
    g = tp - 2 * k
    gt = g.reshape(nt, TS)
    r = jnp.round(0.5 * (gt[:, TS // 2 - 1] + gt[:, TS // 2])
                  ).astype(jnp.int32)
    rb = jnp.clip(r + bias, 0, 2 * bias - 1)
    d = gt - r[:, None].astype(t.dtype) + 4.0
    u = ((jnp.clip(d, frontend._FARROW_LO, frontend._FARROW_HI) - mid)
         / halfr).astype(jnp.float32)
    out_re, out_im = _resample_core(
        jnp.real(y2).astype(jnp.float32), jnp.imag(y2).astype(jnp.float32),
        u, rb, shift_bits=shift_bits, tc=tc, interpret=interpret)
    out = out_re.reshape(Sp)[:S] + 1j * out_im.reshape(Sp)[:S]
    return out.astype(jnp.complex64)
