"""Pallas radix-8 Viterbi ACS kernel (ops/viterbi_pallas.py).

Interpret mode on CPU: the kernel's segment-core bits must equal the
XLA lax.scan decoder's (ops/viterbi.py) bit for bit — wings may differ
(the kernel tracebacks from state 0 instead of the argmax end state,
and breaks metric ties differently; both are absorbed by the >= 15
constraint-length wings, cc_decoder.cpp:295-302 analogue).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from dvbs_tpu.spec import dvbs_fec
from dvbs_tpu.ops import viterbi, viterbi_pallas


def _encode(bits):
    bp = np.concatenate([np.zeros(6, np.int64), bits])
    n = len(bits)
    x = np.zeros(n, np.int64)
    y = np.zeros(n, np.int64)
    for j in range(7):
        if (dvbs_fec.G1 >> j) & 1:
            x += bp[j:j + n]
        if (dvbs_fec.G2 >> j) & 1:
            y += bp[j:j + n]
    return np.stack([x % 2, y % 2], 1)


def _make_llrs(rng, B, T, sigma=0.8):
    llrs = np.zeros((B, T, 2), np.float32)
    truth = np.zeros((B, T), np.int64)
    for b in range(B):
        bits = rng.integers(0, 2, T)
        llrs[b] = (1 - 2 * _encode(bits)) * 2.0 + rng.normal(
            0, sigma, (T, 2))
        truth[b] = bits
    return llrs, truth


def test_core_equals_xla():
    rng = np.random.default_rng(0)
    B, T, wing = 8, 99, 24
    llrs, truth = _make_llrs(rng, B, T)
    ref = np.asarray(viterbi.decode_segments(jnp.asarray(llrs)))
    got = np.asarray(viterbi_pallas.decode_segments_pallas(
        jnp.asarray(llrs), interpret=True))
    core = slice(wing, T - wing)
    assert (got[:, core] == ref[:, core]).all()
    assert (got[:, core] == truth[:, core]).all()


def test_multi_tile_padding_and_erasures():
    """B not a lane multiple (pads to 2 grid tiles), T % 3 != 0
    (zero-LLR step padding), plus depuncture-style erasure columns."""
    rng = np.random.default_rng(7)
    B, T, wing = 130, 151, 30
    llrs, truth = _make_llrs(rng, B, T)
    llrs[:, ::3, 1] = 0.0                    # erasures survive decode
    ref = np.asarray(viterbi.decode_segments(jnp.asarray(llrs)))
    got = np.asarray(viterbi_pallas.decode_segments_pallas(
        jnp.asarray(llrs), interpret=True, bt=128))
    core = slice(wing, T - wing)
    assert (got[:, core] == ref[:, core]).all()
    assert (got[:, core] == truth[:, core]).all()
