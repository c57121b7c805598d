"""Batched DVB-S2 LDPC decoder for TPU (JAX/XLA).

Design (vs the reference's SIMD layered decoder,
/root/reference/src/demod/dvbs2/codings/xdsopl-ldpc-pabr/layered_decoder.hh):

- Frames ride the trailing (lane) axis: LLRs are laid out (N+1, B) so the
  per-check gathers/scatters become contiguous row operations over the
  batch lanes — the TPU analogue of the reference's int8x16 SIMD lanes,
  except *all* B frames are decoded (the reference fills only lane 0 of
  16, bbframe_ldpc.cpp:129-133).
- The check-node graph is one dense [R, deg_max] variable-index matrix,
  padded with a sentinel column N whose LLR is pinned at +BIG (checks are
  near-uniform degree in DVB-S2, so padding waste is tiny).
- Flooding offset-min-sum with per-frame early-exit masking inside one
  lax.while_loop: all frames run until every frame's syndrome clears or
  max_trials is hit; converged frames are frozen. Divergent per-frame
  trial counts are reported like the reference's `ldpc_trials` metric.

LLR convention: positive = bit 0 (matches the demapper and the
reference's hard-slice `buf[i] < 0` in module_dvbs2_demod.cpp:358-360).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..spec import ldpc_spec

_BIG = 1e9  # sentinel LLR magnitude for padding column


@functools.lru_cache()
def check_index_matrix(table: str) -> np.ndarray:
    """[R, deg_max] variable indices per check node, padded with N."""
    code = ldpc_spec.get_code(table)
    groups = code.check_edges
    dmax = max(d for d, _, _ in groups)
    idx = np.full((code.R, dmax), code.N, np.int32)
    for d, checks, vi in groups:
        idx[checks, :d] = vi
    return idx


def _sign(x):
    return jnp.where(x < 0, -1.0, 1.0)


@functools.partial(jax.jit, static_argnames=("table", "max_trials", "beta"))
def decode(llr: jax.Array, table: str, max_trials: int = 32,
           beta: float = 2.0):
    """Decode a batch of frames.

    llr: [B, N] float32, positive = bit 0 (demapper scale, roughly +-50..127).
    Returns (hard_bits [B, N] uint8, trials [B] int32, ok [B] bool).
    trials = iterations actually spent on that frame (== max_trials when the
    frame failed to converge; `ok` reports syndrome success).
    """
    idx = jnp.asarray(check_index_matrix(table))      # [R, D]
    code = ldpc_spec.get_code(table)
    N, R = code.N, code.R
    B = llr.shape[0]
    D = idx.shape[1]

    # lane-major layout: [N+1, B]
    ext = jnp.concatenate(
        [llr.T.astype(jnp.float32), jnp.full((1, B), _BIG, jnp.float32)], axis=0)
    msgs = jnp.zeros((R, D, B), jnp.float32)

    def syndrome_ok(ext):
        hard = (ext[idx] < 0).astype(jnp.int32)        # [R, D, B]
        parity = jnp.sum(hard, axis=1) % 2             # [R, B]
        return ~(parity.astype(bool).any(axis=0))      # [B]

    def body(carry):
        ext, msgs, it, done = carry
        q = ext[idx] - msgs                            # [R, D, B]
        mag = jnp.abs(q)
        sgn = _sign(q)
        total_sign = jnp.prod(sgn, axis=1)             # [R, B]
        m1 = jnp.min(mag, axis=1)                      # [R, B]
        am = jnp.argmin(mag, axis=1)                   # [R, B]
        col = jax.lax.broadcasted_iota(jnp.int32, (R, D, B), 1)
        mag2 = jnp.where(col == am[:, None, :], _BIG, mag)
        m2 = jnp.min(mag2, axis=1)                     # [R, B]
        excl_min = jnp.where(col == am[:, None, :], m2[:, None, :],
                             m1[:, None, :])
        excl_sign = total_sign[:, None, :] * sgn
        new_msgs = excl_sign * jnp.maximum(excl_min - beta, 0.0)
        # freeze converged frames
        active = (~done).astype(jnp.float32)[None, None, :]
        new_msgs = msgs + (new_msgs - msgs) * active
        delta = new_msgs - msgs
        ext = ext.at[idx].add(delta)
        ext = ext.at[N].set(_BIG)                      # re-pin sentinel row
        ok = syndrome_ok(ext)
        it = it + (~done).astype(jnp.int32)
        done = done | ok
        return ext, new_msgs, it, done

    def cond(carry):
        _, _, it, done = carry
        return (~jnp.all(done)) & (it.max() < max_trials)

    it0 = jnp.zeros(B, jnp.int32)
    done0 = syndrome_ok(ext)
    ext, msgs, it, done = jax.lax.while_loop(
        cond, body, (ext, msgs, it0, done0))
    hard = (ext[:N] < 0).astype(jnp.uint8).T           # [B, N]
    return hard, it, done


def decode_np(llr: np.ndarray, table: str, max_trials: int = 32,
              beta: float = 2.0):
    """Convenience wrapper returning numpy arrays."""
    h, t, ok = decode(jnp.asarray(llr), table, max_trials, beta)
    return np.asarray(h), np.asarray(t), np.asarray(ok)
