"""Batched Viterbi decoder for the DVB-S K=7 rate-1/2 code (JAX).

TPU-native replacement for the reference's volk `spiral` ACS kernel +
chainback (/root/reference/src/demod/dvbs/viterbi/cc_decoder.cpp:56-92,
295-302): instead of streaming 8192-bit blocks with start-state chaining,
the stream is cut into overlapping segments decoded in parallel — the
64-state add-compare-select runs as a lax.scan over time with all
segments on the batch axis, and the wings (>= 15 constraint lengths)
absorb the unknown boundary states, so the core bits equal a streaming
decode.

Soft convention: float LLRs, positive = bit 0, 0 = erasure (depunctured).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..spec import dvbs_fec

N_STATES = 64


@functools.lru_cache()
def _trellis():
    """Precompute predecessor/branch tables.

    prev[ns, j]: predecessor state (j = dropped LSB of the predecessor),
    sign[ns, j, 2]: expected (X, Y) as +-1 (+1 = bit 0) for that branch.
    """
    prev = np.zeros((N_STATES, 2), np.int32)
    sign = np.zeros((N_STATES, 2, 2), np.float32)
    for ns in range(N_STATES):
        b = ns >> 5
        base = (ns & 0x1F) << 1
        for j in range(2):
            s = base | j
            v = (b << 6) | s
            x = bin(v & dvbs_fec.G1).count("1") & 1
            y = bin(v & dvbs_fec.G2).count("1") & 1
            prev[ns, j] = s
            sign[ns, j, 0] = 1.0 - 2.0 * x
            sign[ns, j, 1] = 1.0 - 2.0 * y
    return prev, sign


@functools.partial(jax.jit, static_argnames=())
def decode_segments(llrs: jax.Array) -> jax.Array:
    """llrs [B, T, 2] float (positive = bit 0) -> bits [B, T] uint8.

    Unknown start state (all path metrics equal), traceback from the
    best end state.
    """
    prev_np, sign_np = _trellis()
    prev = jnp.asarray(prev_np)            # [64, 2]
    sign = jnp.asarray(sign_np)            # [64, 2, 2]
    B, T, _ = llrs.shape

    def acs(pm, r):
        # r: [B, 2] soft pair; pm: [B, 64]
        bm = jnp.einsum("bk,sjk->bsj", r, sign)      # [B, 64, 2]
        cand = pm[:, prev] + bm                      # [B, 64, 2]
        dec = jnp.argmax(cand, axis=2)               # [B, 64]
        newpm = jnp.max(cand, axis=2)
        # normalize to avoid drift
        newpm = newpm - jnp.max(newpm, axis=1, keepdims=True)
        return newpm, dec.astype(jnp.uint8)

    pm0 = jnp.zeros((B, N_STATES), jnp.float32) + 0.0 * llrs[:, 0, 0:1]
    pm, decs = jax.lax.scan(acs, pm0, jnp.swapaxes(llrs, 0, 1))  # decs [T, B, 64]

    end = jnp.argmax(pm, axis=1).astype(jnp.int32)               # [B]

    def trace(state, dec_t):
        j = jnp.take_along_axis(dec_t, state[:, None], axis=1)[:, 0]  # [B]
        bit = (state >> 5).astype(jnp.uint8)
        pstate = ((state & 0x1F) << 1) | j.astype(jnp.int32)
        return pstate, bit

    _, bits_rev = jax.lax.scan(trace, end, decs, reverse=True)
    # bits_rev[t] is the input bit at time t (collected in forward order
    # because scan(reverse=True) emits outputs aligned with inputs)
    return jnp.swapaxes(bits_rev, 0, 1)                           # [B, T]


def segment_stream(llrs: np.ndarray, core: int = 2048, wing: int = 96):
    """Cut [n, 2] stream into overlapping segments [B, core+2*wing, 2].

    Returns (segments, n_core_bits). Stream edges are zero-padded
    (erasures).
    """
    n = len(llrs)
    B = max(1, -(-n // core))
    padded = np.zeros((B * core + 2 * wing, 2), llrs.dtype)
    padded[wing:wing + n] = llrs[:B * core]
    segs = np.stack([padded[i * core:i * core + core + 2 * wing]
                     for i in range(B)])
    return segs, n


def decode_stream(llrs: np.ndarray, core: int = 2048, wing: int = 96
                  ) -> np.ndarray:
    """Convenience host path: [n, 2] float -> [n] uint8 decoded bits."""
    segs, n = segment_stream(llrs, core, wing)
    bits = np.asarray(decode_segments(jnp.asarray(segs, jnp.float32)))
    return bits[:, wing:wing + core].reshape(-1)[:n]
