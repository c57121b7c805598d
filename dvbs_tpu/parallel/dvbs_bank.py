"""Multi-carrier DVB-S bank: the locked Viterbi chain for N carriers
fused into ONE device program per block.

The DVB-S analogue of parallel/mesh.build_carrier_bank: the reference
runs one single-threaded plugin instance per carrier (max instances
fixed, main.cpp:30) whose SYNCED steady state is the volk ACS kernel
chain (viterbi_all.cpp:209-273, cc_decoder.cpp:56-92); here the bank's
front ends are vmapped and every carrier's Viterbi segments decode in
one batched lax.scan (ops/viterbi.py), so the per-step ACS work is
N_carriers*segments wide — the shape the TPU wants.

Acquisition stays on host: the first step() call runs the existing
per-carrier lock search (models/dvbs.DVBSReceiver._try_lock) on the
front-end output, then compiles the steady-state bank with each
carrier's (rotation, depuncture-alignment) baked in — the same
acquire-once-then-SYNCED lifecycle as the reference, and what its
measured viterbi_12_synced baseline times (REFBENCH.json).

Each block is demodulated with first-block semantics (fresh coarse CFO
/ timing / V&V estimates — every estimator is feed-forward, so there
is no warm-up penalty); streaming state continuity across blocks lives
in models/dvbs.DVBSStream, which shares the same device chain.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..spec import dvbs_fec
from ..ops import frontend, plphase, viterbi

TEST_BITS = 2048


def _front_first(ri):
    """First-block front end for one carrier: int8/float re+im [2, n] ->
    serialized (I, Q) soft symbols [n] float32 (mirrors the hints=first
    path of models/dvbs.DVBSReceiver._build_front)."""
    s = (ri[0].astype(jnp.float32) +
         1j * ri[1].astype(jnp.float32)).astype(jnp.complex64)
    x = frontend.agc(s)
    cfo = frontend.coarse_cfo_estimate(x)
    x = frontend.mix(x, cfo)
    y = frontend.matched_filter(x)
    z, _ = frontend.recover_symbols(y, n_windows=16)
    f4 = frontend.qpsk_residual_freq(z)
    S = z.shape[-1]
    z = z * jnp.exp(-1j * f4 * jnp.arange(S)).astype(z.dtype)
    ph = plphase.qpsk_vv_track(z[None, :], jnp.zeros(1))[0]
    zc = z * jnp.exp(-1j * ph).astype(z.dtype)
    return jnp.stack([jnp.real(zc), jnp.imag(zc)], axis=1).reshape(-1)


def unpack_cs4_host(packed: np.ndarray) -> np.ndarray:
    """Host-side inverse of frontend.pack_cs4 (for the lock pass)."""
    hi = ((packed.astype(np.int16) >> 4) ^ 8) - 8
    lo = ((packed.astype(np.int16) & 15) ^ 8) - 8
    return (hi + 1j * lo).astype(np.complex64)


def build_dvbs_bank(n_carriers: int, rate: str = "1/2",
                    block_samples: int = 1 << 17, core: int = 512,
                    wing: int = 96, ingest: str = "cs4"):
    """Returns (step, example). step(samples) -> dict(bits [C, nb] uint8
    packed decoded bits, ber [C] float32 re-encode BER, n_pairs int).

    samples: [C, n] uint8 packed cs4 IQ (ingest="cs4") or [C, 2, n]
    float16 re/im (ingest="f16"). The first call locks each carrier on
    host (rotation x alignment hypothesis search) and compiles the
    steady-state program; subsequent calls are one fused device step.
    """
    if ingest not in ("cs4", "f16"):
        raise ValueError(f"unknown ingest format {ingest!r}")
    C, n = n_carriers, block_samples
    px, py = dvbs_fec.PUNCTURE[rate]
    p = len(px)
    pat = np.stack([px, py], axis=1).reshape(-1).astype(bool)
    n_kept = int(pat.sum())
    pat_idx = np.nonzero(pat)[0]
    # uniform stream length across carriers regardless of each one's
    # alignment drop (drops are < 2*n_kept)
    max_drop = 2 * n_kept
    n_use = (n - max_drop) // n_kept * n_kept
    periods = n_use // n_kept
    n_pairs = periods * p
    B = -(-n_pairs // core)
    TB = min(TEST_BITS, n_pairs)

    state = {"fn": None}

    def _lock(samples):
        """Host acquisition pass: run the front once for ALL carriers
        (one jitted program — eager per-op dispatch is both slow and
        UNIMPLEMENTED for some ops on the axon TPU backend), then
        search (rotation, drop) per carrier with the stock lock logic."""
        from ..models.dvbs import DVBSReceiver
        if ingest == "cs4":
            sc = np.stack([unpack_cs4_host(np.asarray(samples[c]))
                           for c in range(C)])
            ri = np.stack([sc.real, sc.imag], axis=1).astype(np.float32)
        else:
            ri = np.asarray(samples, np.float32)
        softs = np.asarray(jax.jit(jax.vmap(_front_first))(
            jnp.asarray(ri))).astype(np.float32)
        rots, drops = [], []
        for c in range(C):
            rx = DVBSReceiver(rate=rate, block_symbols=n // 2)
            rx._try_lock(softs[c])
            if not rx.locked:
                raise RuntimeError(f"carrier {c}: no Viterbi lock "
                                   f"(best BER {rx.ber:.3f})")
            rots.append(rx.rotation)
            drops.append(rx.drop)
        return np.array(rots), np.array(drops)

    def _build(rots, drops):
        @jax.jit
        def bank(samples):
            if ingest == "cs4":
                ri = frontend.unpack_cs4(samples)
            else:
                ri = samples
            soft = jax.vmap(_front_first)(ri)          # [C, n] serial
            dls = []
            for c in range(C):
                s = soft[c]
                if rots[c]:
                    pr = s.reshape(-1, 2)
                    s = jnp.stack([pr[:, 1], -pr[:, 0]], axis=1
                                  ).reshape(-1)
                s = jax.lax.slice(s, (int(drops[c]),),
                                  (int(drops[c]) + n_use,))
                used = s.reshape(periods, n_kept)
                dl2 = jnp.zeros((periods, 2 * p), jnp.float32)
                dl2 = dl2.at[:, pat_idx].set(used)   # static scatter
                dls.append(dl2.reshape(-1, 2))
            dl = jnp.stack(dls)                       # [C, n_pairs, 2]
            padded = jnp.zeros((C, B * core + 2 * wing, 2), jnp.float32)
            padded = padded.at[:, wing:wing + n_pairs].set(dl)
            segs = jnp.stack([jax.lax.slice(
                padded, (0, i * core, 0),
                (C, i * core + core + 2 * wing, 2))
                for i in range(B)], axis=1)           # [C, B, T, 2]
            bits_seg = viterbi.decode_segments(
                segs.reshape(C * B, core + 2 * wing, 2))
            bits = bits_seg.reshape(C, B, -1)[:, :, wing:wing + core] \
                .reshape(C, -1)[:, :n_pairs]
            # re-encode BER over the first TB pairs per carrier (the
            # SYNCED watchdog, viterbi_all.cpp:209-273)
            bp = jnp.concatenate(
                [jnp.zeros((C, 6), bits.dtype), bits[:, :TB]], axis=1)

            def enc(poly):
                acc = jnp.zeros((C, TB), jnp.int32)
                for j in range(7):
                    if (poly >> j) & 1:
                        acc = acc + bp[:, j:j + TB].astype(jnp.int32)
                return acc % 2
            exy = jnp.stack([enc(dvbs_fec.G1), enc(dvbs_fec.G2)], axis=2)
            chunk = dl[:, :TB]
            maskz = chunk != 0
            hard = (chunk < 0).astype(jnp.int32)
            nm = jnp.sum(maskz, axis=(1, 2))
            ber = jnp.sum(jnp.where(maskz, (exy != hard).astype(jnp.int32),
                                    0), axis=(1, 2)) / jnp.maximum(nm, 1)
            nb8 = -(-n_pairs // 8) * 8
            bits_p = jnp.concatenate(
                [bits, jnp.zeros((C, nb8 - n_pairs), bits.dtype)], axis=1)
            return dict(bits=frontend.pack_bits_to_bytes(bits_p),
                        ber=ber.astype(jnp.float32))
        return bank

    def step(samples):
        if state["fn"] is None:
            rots, drops = _lock(samples)
            state["fn"] = _build(rots, drops)
        out = dict(state["fn"](samples))
        out["n_pairs"] = n_pairs
        return out

    if ingest == "cs4":
        example = np.zeros((C, n), np.uint8)
    else:
        example = np.zeros((C, 2, n), np.float16)
    return step, example
