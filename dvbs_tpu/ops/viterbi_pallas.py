"""Radix-8 Viterbi ACS + traceback — Pallas TPU kernel (DVB-S K=7).

The high-throughput companion of ops/viterbi.py (pure XLA lax.scan):
same overlapped-segment batching, but the whole forward ACS recursion
AND the one-hot traceback run inside ONE kernel with the path metrics
and the decision history resident in VMEM, so the ~15 us/step XLA scan
floor (PROFILE_r4.md "DVB-S Viterbi: measured design space") disappears
— a fori_loop step here costs the VPU work and nothing else.

The TPU-native trick is the layout. With radix 2^k and states
ns = hi*2^(6-k) + lo, the predecessor of ns under fused input j is
prev = lo*2^k + j.  Store the path metrics in DIGIT-SWAPPED order
stored[j*2^(6-k) + lo] = pm[lo*2^k + j]; then

  - candidate expansion (each stored row replicated 2^k times, rows
    ordered (j, lo, hi)) plus the branch metrics is ONE MXU matmul of
    a constant [512, 72] matrix against [stored_pm; r] — no gather
    (TPU sublane gathers serialize; pltpu.repeat only tiles);
  - the max-reduction over j is k contiguous-HALF folds (j is the
    major digit) — static 8-aligned slices, no strided access;
  - the fold output lands in (lo, hi) row order, which at k == 3
    (and only k == 3: the digit swap (a,b)->(b,a) must relate equal
    3-bit digits) IS the digit-swapped storage order the next step
    needs.  Zero per-step relayout, by construction.

Traceback mirrors it in NATURAL state order: expanding the one-hot
state vector over candidate j (rows (s, j)) and summing over hi (the
major digit -> contiguous folds) yields the predecessor one-hot
directly in natural order.  The fold-order -> natural-order decision
permutation is folded into the traceback's expansion matrix (RepP),
keeping the forward critical path free of it.

The reference decodes this code with a one-step-at-a-time SSE ACS
kernel over 8192-bit blocks (cc_decoder.cpp:56-92, viterbi_all.cpp:
209-273); here ~1024 overlapped segments decode in parallel with the
trellis walked 3 steps per iteration.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .viterbi import _trellis_k, N_STATES

K = 3                 # radix-8: the self-consistent-layout radix
R = 1 << K            # 8 fused inputs per step


@functools.lru_cache()
def _tables_k3():
    """(M_fwd [512, 72], Rep [512, 64], RepP [512, 64], Bm [8, 64]) f32.

    M_fwd fuses the candidate expansion with the branch metrics: row
    L = (j, lo, hi) has a 1 at column (j*8 + lo) — the digit-swapped
    stored-pm row of predecessor lo*8 + j — and the expected +-1
    outputs (earliest (X, Y) first) of the branch prev -> ns
    (ns = hi*8 + lo) in columns 64:70, so one MXU matmul of M_fwd
    against [stored_pm; r] yields all 512 candidates.  Rep is the
    element-repeat matrix (row s*8+j -> column s); RepP = Rep @ P
    where P is the digit-swap permutation (natural row ns = hi*8+lo
    from fold-output row lo*8+hi) — the traceback reads the forward's
    raw fold-order decisions through RepP, so the forward never pays
    the permutation.  Bm[i, s] = bit i (earliest-first) of s's top-3
    'hi' digits — the k fused input bits of the step that ENTERED
    state s.
    """
    sign, bits_hi = _trellis_k(K)            # sign [64, 8, 6]
    M_fwd = np.zeros((N_STATES * R, N_STATES + R), np.float32)
    for j in range(R):
        for lo in range(R):
            for hi in range(R):
                ns = hi * R + lo
                L = (j * R + lo) * R + hi
                M_fwd[L, j * R + lo] = 1.0
                M_fwd[L, N_STATES:N_STATES + 2 * K] = sign[ns, j]
    Rep = np.zeros((N_STATES * R, N_STATES), np.float32)
    for s in range(N_STATES):
        for j in range(R):
            Rep[s * R + j, s] = 1.0
    P = np.zeros((N_STATES, N_STATES), np.float32)
    for hi in range(R):
        for lo in range(R):
            P[hi * R + lo, lo * R + hi] = 1.0
    Bm = np.zeros((R, N_STATES), np.float32)
    for s in range(N_STATES):
        for i in range(K):
            Bm[i, s] = (s >> (K + i)) & 1
    return M_fwd, Rep, Rep @ P, Bm


def _kernel(r_ref, m_ref, rep_ref, repp_ref, bm_ref, bits_ref, decs,
            obuf, osem, *, nsteps, expand):
    B = r_ref.shape[3]
    gb = pl.program_id(0)
    # traceback expansion rows are (state s, candidate j) = s*8 + j
    # (int32 iota then cast: Mosaic's tpu.iota is integer-only)
    jiota = (jax.lax.broadcasted_iota(
        jnp.int32, (N_STATES * R, B), 0) % R).astype(jnp.float32)

    def rep8(x):
        # sublane element-repeat via broadcast+reshape (lane dim fixed)
        return jnp.broadcast_to(x[:, None, :], (N_STATES, R, B)
                                ).reshape(N_STATES * R, B)

    def fwd(t, pm):
        r = r_ref[0, t].astype(jnp.float32)                # [8, B]
        if expand == "matmul":
            v = jnp.concatenate([pm, r], axis=0)           # [72, B]
            cand = jnp.dot(m_ref[:], v,
                           preferred_element_type=jnp.float32)
        else:
            # branch metrics off the critical chain (depend on r only);
            # the pm-dependent chain is repeat + add + folds
            bm = jnp.dot(m_ref[:, N_STATES:], r,
                         preferred_element_type=jnp.float32)
            cand = rep8(pm) + bm                           # rows (j,lo,hi)
        a, b = cand[0:256], cand[256:512]
        w = b > a
        c = jnp.where(w, b, a)
        idx = jnp.where(w, 4.0, 0.0)
        a, b = c[0:128], c[128:256]
        ia, ib = idx[0:128], idx[128:256]
        w = b > a
        c = jnp.where(w, b, a)
        idx = jnp.where(w, ib + 2.0, ia)
        a, b = c[0:64], c[64:128]
        ia, ib = idx[0:64], idx[64:128]
        w = b > a
        c = jnp.where(w, b, a)                             # rows (lo,hi)
        idx = jnp.where(w, ib + 1.0, ia)
        # decisions stored RAW in fold order (lo, hi); the traceback's
        # RepP expansion performs the natural-order permutation
        decs[pl.ds(t * N_STATES, N_STATES), :] = idx.astype(jnp.int8)
        return c                                           # next stored pm

    pm0 = jnp.zeros((N_STATES, B), jnp.float32)
    jax.lax.fori_loop(0, nsteps, fwd, pm0)

    # traceback from state 0 (any state: the segment wings absorb the
    # boundary, ops/viterbi.py docstring) in natural state order
    oh0 = (jax.lax.broadcasted_iota(jnp.int32, (N_STATES, B), 0) == 0
           ).astype(jnp.float32)

    def out_dma(slot, t):
        return pltpu.make_async_copy(obuf.at[slot], bits_ref.at[gb, t],
                                     osem.at[slot])

    def tb(i, oh):
        t = nsteps - 1 - i
        slot = jax.lax.rem(i, 2)
        # the k input bits of step t are the hi digits of the state at
        # time t+1 — emit BEFORE stepping back.  bits stream to the
        # HBM output via a 2-slot DMA staging buffer: keeping the full
        # [nsteps, 8, B] bits block in VMEM (auto-double-buffered)
        # overflowed the 16 MB budget next to the decision scratch at
        # larger grids.
        @pl.when(i >= 2)
        def _():
            out_dma(slot, t + 2).wait()
        obuf[slot] = jnp.dot(bm_ref[:], oh,
                             preferred_element_type=jnp.float32)
        out_dma(slot, t).start()
        dec = decs[pl.ds(t * N_STATES, N_STATES), :].astype(jnp.float32)
        # rows (s, rep j): keep the branch whose decision matches j
        if expand == "matmul":
            ohx = jnp.dot(rep_ref[:], oh,
                          preferred_element_type=jnp.float32)
        else:
            ohx = rep8(oh)
        decx = jnp.dot(repp_ref[:], dec,
                       preferred_element_type=jnp.float32)
        x = ohx * (decx == jiota).astype(jnp.float32)
        # sum over hi (major digit of s) -> rows (lo, j) = natural
        # order of prev = lo*8 + j
        x = x[0:256] + x[256:512]
        x = x[0:128] + x[128:256]
        return x[0:64] + x[64:128]

    jax.lax.fori_loop(0, nsteps, tb, oh0)
    # drain the in-flight output DMAs (steps nsteps-1 and nsteps-2)
    for k in range(min(2, nsteps)):
        i = nsteps - 1 - k
        out_dma(i % 2, nsteps - 1 - i).wait()


def select_decoder(impl: str = "auto"):
    """Resolve "auto"/"xla"/"pallas" to a decode_segments callable at
    program-BUILD time: the Pallas kernel on a real TPU backend, the
    XLA lax.scan decoder on CPU (where Mosaic cannot compile and
    interpret mode would be ~100x slower than XLA)."""
    if impl == "auto":
        impl = "xla" if jax.default_backend() == "cpu" else "pallas"
    if impl == "pallas":
        return decode_segments_pallas
    if impl != "xla":
        raise ValueError(f"unknown viterbi impl {impl!r}")
    from .viterbi import decode_segments
    return decode_segments


@functools.partial(jax.jit, static_argnames=("interpret", "bt", "expand"))
def decode_segments_pallas(llrs: jax.Array, interpret: bool = False,
                           bt: int = 512, expand: str = "matmul"
                           ) -> jax.Array:
    """llrs [B, T, 2] float (positive = bit 0) -> bits [B, T] uint8.

    Drop-in for ops/viterbi.decode_segments at bank scale.  B pads to a
    multiple of `bt` lanes (grid-step batch width), T to a multiple of
    3 with zero-LLR (erasure) steps — appended zeros never change which
    path wins, and traceback through them follows the surviving path,
    exactly as the XLA version's padding argument.  Traceback starts
    from state 0 rather than the argmax end state; callers consume only
    the segment cores, where every start state's traceback has merged
    onto the survivor path (wings >= 15 constraint lengths).

    bt/expand are measured knobs (tools/measure_vit_pallas_r4.py):
    bt=256 halves the number of sequential grid x loop iterations;
    expand="reshape" moves the pm expansion off the MXU (broadcast+
    reshape) leaving only VPU work on the recursion's critical path.
    """
    M_fwd, Rep, RepP, Bm = _tables_k3()
    B, T, _ = llrs.shape
    Tk = -(-T // K) * K
    nsteps = Tk // K
    bt = min(bt, -(-B // 128) * 128)   # don't pad small batches to bt
    # decision scratch is nsteps*64*bt int8 in VMEM: cap it at ~8 MB so
    # long segments (big core) narrow the lane width instead of OOMing
    bt_cap = max(128, (8 << 20) // (nsteps * N_STATES) // 128 * 128)
    bt = min(bt, bt_cap)
    Bp = -(-B // bt) * bt
    nb = Bp // bt
    x = jnp.zeros((Bp, Tk, 2), jnp.float32)
    x = x.at[:B, :T].set(llrs.astype(jnp.float32))
    # [Bp, nsteps, 6] -> [nb, nsteps, 8, bt] (step-major, batch on
    # lanes); bf16 halves the kernel's input block VMEM — the LLRs are
    # 4..8-bit quantized channel values, so the 8-bit mantissa is
    # lossless headroom for 6-term branch-metric sums
    r = x.reshape(nb, bt, nsteps, 2 * K).transpose(0, 2, 3, 1)
    r = jnp.pad(r, ((0, 0), (0, 0), (0, 2), (0, 0))).astype(jnp.bfloat16)

    kern = functools.partial(_kernel, nsteps=nsteps, expand=expand)
    bits = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, nsteps, R, bt), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N_STATES * R, N_STATES + R),
                             lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((N_STATES * R, N_STATES), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N_STATES * R, N_STATES), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, N_STATES), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((nsteps * N_STATES, bt), jnp.int8),
                pltpu.VMEM((2, R, bt), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nb, nsteps, R, bt), jnp.float32),
        interpret=interpret,
    )(r, jnp.asarray(M_fwd), jnp.asarray(Rep), jnp.asarray(RepP),
      jnp.asarray(Bm))

    # [nb, nsteps, 8, bt] -> [Bp, Tk]; rows 0:3 are the k bits
    out = bits[:, :, :K, :].transpose(0, 3, 1, 2).reshape(Bp, Tk)
    return (out[:B, :T] > 0.5).astype(jnp.uint8)
