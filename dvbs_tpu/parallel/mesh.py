"""Channel-parallel demodulation over a device mesh.

The reference runs one single-threaded plugin instance per carrier
(max instances fixed, main.cpp:30). Here a bank of N carriers is sharded
over a 1-D `carrier` mesh axis with shard_map: each device demodulates
its local carriers (vmapped single-carrier block program) and the lock
metrics are aggregated across the mesh with a psum — the TPU-native
equivalent of SURVEY.md sec. 2.5's "data parallelism over carriers".
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..spec import modcod
from ..models.dvbs2 import DVBS2Receiver


def build_multi_carrier(n_devices: int, carriers_per_device: int = 1,
                        mc: int = 4, short: bool = True,
                        block_symbols: int = 1 << 15):
    """Build a jitted multi-carrier demod step over an n_devices mesh.

    Returns (step_fn, example_input, mesh). step_fn maps
    [C, 2, n_samples] float32 -> dict of per-carrier outputs plus the
    mesh-aggregated lock count ("locked", shape [1]).
    """
    devices = np.array(jax.devices()[:n_devices])
    mesh = Mesh(devices, ("carrier",))
    rx = DVBS2Receiver(mc=mc, short=short, block_symbols=block_symbols)
    core = rx._sym_fn
    fec = rx._fec2_fn or rx._fec_fn     # full trial budget (no host
                                        # escalation inside shard_map)
    C = n_devices * carriers_per_device
    n = 2 * block_symbols

    def local_step(samples_ri):          # [C/D, 2, n]
        out = jax.vmap(core)(samples_ri)
        llrs = out.pop("llrs")           # [c, F, N]: decode all lanes at once
        c, F, N = llrs.shape
        fd = fec(llrs.reshape(c * F, N))
        ok = fd["ldpc_ok"].reshape(c, F)
        locked = jax.lax.psum(jnp.sum(ok.astype(jnp.int32)), "carrier")
        return dict(hard=fd["hard"].reshape(c, F, N),
                    trials=fd["trials"].reshape(c, F),
                    ldpc_ok=ok, quality=out["quality"],
                    pls=out["pls"], locked=jnp.reshape(locked, (1,)))

    step = jax.jit(shard_map(
        local_step, mesh=mesh,
        in_specs=(P("carrier", None, None),),
        out_specs=dict(hard=P("carrier"), trials=P("carrier"),
                       ldpc_ok=P("carrier"), quality=P("carrier"),
                       pls=P("carrier"), locked=P()),
    ))
    example = np.zeros((C, 2, n), np.float16)
    return step, example, mesh


def bank_block_symbols(n_carriers: int = 8, mc: int = 4,
                       short: bool = False, pilots: bool = False,
                       frames_total: int = 128) -> int:
    """Smallest per-carrier block that brings the bank's frame total to
    `frames_total` (the Pallas LDPC kernel's batch width) WITHOUT
    exceeding it — when n_carriers doesn't divide frames_total the
    total rounds DOWN, so one cyclically lane-padded kernel call still
    covers the block (padding is free, PROFILE_r4.md)."""
    cfg = modcod.get_config(mc, short=short, pilots=pilots)
    per = max(1, frames_total // n_carriers)
    raw = (per + 1) * cfg.plframe_len + 2 * 256 + 90
    # round up to a multiple of 64 (timing-recovery window divisibility)
    return -(-raw // 64) * 64


def build_carrier_bank(n_carriers: int, mc: int = 4, short: bool = False,
                       pilots: bool = False,
                       block_symbols: int = 1 << 17, n_iters: int = 12,
                       fec_chunk: int = 24, fec: str = "auto",
                       ingest: str = "cs8", interpret_pallas: bool = False,
                       stream_outputs: bool = False,
                       n_iters_full: int = 32):
    """Single-device multi-carrier bank: the whole bank demodulates in one
    device program per block (vmap over the carrier axis), which amortizes
    the per-call host<->device latency — the BASELINE.json 8-carrier
    aggregate configuration on one chip.

    Input is int8 IQ ([C, 2, n], the native cs8 SDR capture format —
    half the tunnel bytes of float16; the on-device AGC renormalizes).
    ingest="cs4" instead takes packed 4-bit IQ ([C, n] uint8, see
    frontend.pack_cs4) — 1 byte/sample, halving transport again at ~0
    sensitivity cost at the 5 dB operating point; the nibbles are
    sign-extended on device. The decoded kbch systematic bits are
    packed to bytes ON DEVICE (a [8]-dot per byte) so the output fetch
    is 8x smaller.

    fec: "pallas" decodes all lanes in one int8 B=128 kernel call
    (ops/ldpc_pallas; requires carriers*frames == 128 — size the block
    with bank_block_symbols); "xla" runs decode_qc in `fec_chunk` lane
    chunks (the VMEM-resident path, any frame total, real per-frame
    trial counts; fec_chunk=24 measured cliff-free on hardware — 18.4 ms
    per call, tools/profile_tpu.py — the VMEM cliff starts at B=32);
    "auto" picks pallas iff the total is exactly 128.

    Returns (step_fn, example_input): step(samples_i8 [C, 2, n]) ->
    dict(kbch_bytes [C*F, kbch/8] uint8, trials [C*F], ldpc_ok [C*F],
    bch_bad [C*F], quality [C, F], pls [C, F]).

    stream_outputs=True adds the fields the streaming driver
    (models/bank_stream.DVBS2BankStream) needs: starts [C, F] (located
    frame starts, for cross-block boundary continuity), cfo [C]
    (applied coarse CFO), hard [C*F, nldpc] (device-resident hard
    bits — only BCH-flagged rows are ever fetched for host repair) and
    llrs [C*F, nldpc] (device-resident, for the rare full-budget
    escalation rerun) — and the return becomes (step_fn, example,
    escalate_fn) where escalate_fn(llrs) reruns the whole lane set at
    the full `n_iters_full` trial budget (the host-level analogue of
    the reference's bad()-gated retry, layered_decoder.hh:121-133).
    """
    import jax.numpy as jnp
    rx = DVBS2Receiver(mc=mc, short=short, pilots=pilots,
                       block_symbols=block_symbols,
                       max_ldpc_trials=n_iters)
    core = rx._sym_fn
    F = rx.n_frames
    N = rx.cfg.nldpc
    kbch = rx.cfg.kbch
    total = n_carriers * F
    from ..ops import ldpc_pallas
    if fec == "auto":
        fec = "pallas" if total == ldpc_pallas.B else "xla"

    if ingest not in ("cs8", "cs4"):
        raise ValueError(f"unknown ingest format {ingest!r}")
    if ingest == "cs4":
        from ..ops import frontend
        vm_core = jax.jit(lambda p: jax.vmap(core)(frontend.unpack_cs4(p)))
    else:
        vm_core = jax.jit(jax.vmap(core))

    from ..spec import scrambling
    bb_mask = scrambling.bb_scrambler_byte_mask(kbch // 8)

    def pack_and_check(hard):
        # kbch_bytes come back BB-descrambled (fixed byte-mask XOR on
        # device, bbframe_descramble.cpp:122-143) — the host tail goes
        # straight to the TS/GSE parser
        from ..ops import bch, frontend
        bch_bad = bch.syndrome_nonzero(hard[:, :rx.cfg.nbch],
                                       rx.cfg.framesize, rx.cfg.rate)
        packed = frontend.pack_bits_to_bytes(hard[:, :kbch]) ^ bb_mask
        return packed, bch_bad

    def make_fec_xla(iters):
        @jax.jit
        def fec_xla(llrs):
            from ..ops import ldpc_qc
            hard, n_bad, trials = ldpc_qc.decode_qc(
                llrs, rx.cfg.ldpc_table, n_iters=iters)
            packed, bch_bad = pack_and_check(hard)
            d = dict(kbch_bytes=packed, trials=trials,
                     ldpc_ok=n_bad == 0, bch_bad=bch_bad)
            if stream_outputs:
                d["hard"] = hard
            return d
        return fec_xla

    def make_fec_pallas(iters):
        Bk = ldpc_pallas.B

        def decode_tiled(llr_q):
            """Any lane count through the B=128 kernel: cyclic lane
            padding is FREE (int8 lanes are 128 wide regardless;
            trials/compute parity asserted in tests/test_ldpc_pallas.py,
            measured in PROFILE_r4.md 'Variable-batch')."""
            outs = []
            for lo in range(0, llr_q.shape[0], Bk):
                chunk = llr_q[lo:lo + Bk]
                c = chunk.shape[0]
                if c < Bk:
                    chunk = jnp.tile(chunk, (-(-Bk // c), 1))[:Bk]
                h, nb, tr = ldpc_pallas.decode_qc_pallas(
                    chunk, rx.cfg.ldpc_table, n_iters=iters,
                    interpret=interpret_pallas)
                outs.append((h[:c], nb[:c], tr[:c]))
            return tuple(jnp.concatenate([o[i] for o in outs])
                         for i in range(3))

        @jax.jit
        def fec_pallas(llrs):
            # interpret_pallas=True runs the kernel in Pallas interpret
            # mode so the full pallas-FEC bank is CPU-testable (tests)
            hard, n_bad, trials = decode_tiled(
                ldpc_pallas.quantize_llrs(llrs))
            packed, bch_bad = pack_and_check(hard)
            # trials = per-frame sweep at which the in-kernel online
            # syndrome first read zero (n_iters if never) — the
            # reference's trials-used-or-max metric; the sweep loop also
            # exits early once the whole batch is clean
            d = dict(kbch_bytes=packed, trials=trials,
                     ldpc_ok=n_bad == 0, bch_bad=bch_bad)
            if stream_outputs:
                d["hard"] = hard
            return d
        return fec_pallas

    fec_xla = make_fec_xla(n_iters)
    fec_pallas = make_fec_pallas(n_iters)

    def make_escalate():
        """Full-budget rerun over every lane (chunked on the xla path
        to stay under the decode_qc VMEM cliff)."""
        if fec == "pallas":
            return make_fec_pallas(n_iters_full)
        full = make_fec_xla(n_iters_full)

        def escalate(llrs):
            parts = [full(llrs[lo:min(lo + fec_chunk, total)])
                     for lo in range(0, total, fec_chunk)]
            return {k: jnp.concatenate([p[k] for p in parts])
                    for k in parts[0]}
        return escalate

    if fec == "pallas":
        # ONE fused program: the "separate jit per stage" rule exists for
        # the XLA decode_qc (its all-VMEM schedule dies inside a bigger
        # program, CLAUDE.md); the Pallas kernel manages VMEM explicitly,
        # so fusing front end + FEC saves a dispatch round trip per block
        # (~5 ms through the axon tunnel) and lets XLA overlap the demap
        # tail with the decode prologue.
        from ..ops import frontend

        def unpack(p):
            return frontend.unpack_cs4(p) if ingest == "cs4" else p

        @jax.jit
        def fused_step(samples):
            out = jax.vmap(core)(unpack(samples))
            llrs = out.pop("llrs").reshape(total, N)
            fd = fec_pallas(llrs)
            fd.update(quality=out["quality"], pls=out["pls"],
                      pls_conf=out["pls_conf"])
            if stream_outputs:
                fd.update(starts=out["starts"], cfo=out["cfo"],
                          freq=out["freq"], llrs=llrs)
            return fd
        if ingest == "cs4":
            example = np.zeros((n_carriers, 2 * block_symbols), np.uint8)
        else:
            example = np.zeros((n_carriers, 2, 2 * block_symbols), np.int8)
        if stream_outputs:
            return fused_step, example, make_escalate()
        return fused_step, example

    def step(samples_i8):
        # NOTE deliberately not one fused jit: the XLA QC LDPC decoder
        # must run as its own program to keep its schedule (CLAUDE.md);
        # intermediate arrays stay on device between the chained calls.
        out = vm_core(samples_i8)
        llrs = out.pop("llrs").reshape(total, N)
        # plain slicing: the tail chunk keeps its true (smaller)
        # size — a clamped fixed-size dynamic_slice would duplicate
        # rows and misalign frames against quality/pls
        parts = [fec_xla(llrs[lo:min(lo + fec_chunk, total)])
                 for lo in range(0, total, fec_chunk)]
        fd = {k: jnp.concatenate([p[k] for p in parts])
              for k in parts[0]}
        fd.update(quality=out["quality"], pls=out["pls"],
                  pls_conf=out["pls_conf"])
        if stream_outputs:
            fd.update(starts=out["starts"], cfo=out["cfo"],
                      freq=out["freq"], llrs=llrs)
        return fd

    if ingest == "cs4":
        example = np.zeros((n_carriers, 2 * block_symbols), np.uint8)
    else:
        example = np.zeros((n_carriers, 2, 2 * block_symbols), np.int8)
    if stream_outputs:
        return step, example, make_escalate()
    return step, example


def build_carrier_bank_sharded(n_devices: int, carriers_per_device: int = 1,
                               mc: int = 4, short: bool = False,
                               pilots: bool = False,
                               block_symbols: int | None = None,
                               n_iters: int = 12, fec_chunk: int = 24,
                               n_iters_full: int = 32,
                               ingest: str = "cs8"):
    """Mesh-sharded bank program with DVBS2BankStream's output contract.

    The production streaming driver (models/bank_stream.DVBS2BankStream)
    takes any (step, example, escalate) triple via its `program=`
    parameter; this builds one whose step is a shard_map over a
    `carrier` device mesh — each device demodulates and FEC-decodes its
    local carriers, and the driver's host tail (escalation gating, BCH
    repair, per-carrier TS parse, damped-advance continuity) runs
    unchanged on the gathered outputs. This is the multi-chip scale
    story of SURVEY.md sec. 2.5 applied to the STREAMING receiver, not
    just a one-shot block demod (cf. build_multi_carrier).

    FEC is the XLA chunked path (the Pallas kernel stays the
    single-device fast path; per-shard lane counts are small anyway).
    Returns (step, example, escalate).
    """
    devices = np.array(jax.devices()[:n_devices])
    mesh = Mesh(devices, ("carrier",))
    if block_symbols is None:
        block_symbols = bank_block_symbols(
            n_devices * carriers_per_device, mc=mc, short=short,
            pilots=pilots)
    rx = DVBS2Receiver(mc=mc, short=short, pilots=pilots,
                       block_symbols=block_symbols,
                       max_ldpc_trials=n_iters)
    core = rx._sym_fn
    F = rx.n_frames
    N = rx.cfg.nldpc
    kbch = rx.cfg.kbch
    cl = carriers_per_device
    C = n_devices * cl
    n = 2 * block_symbols

    from ..spec import scrambling
    from ..ops import bch, frontend, ldpc_qc
    bb_mask = scrambling.bb_scrambler_byte_mask(kbch // 8)

    def pack_and_check(hard):
        bch_bad = bch.syndrome_nonzero(hard[:, :rx.cfg.nbch],
                                       rx.cfg.framesize, rx.cfg.rate)
        packed = frontend.pack_bits_to_bytes(hard[:, :kbch]) ^ bb_mask
        return packed, bch_bad

    def fec_local(llrs, iters):
        parts = []
        for lo in range(0, cl * F, fec_chunk):
            chunk = llrs[lo:min(lo + fec_chunk, cl * F)]
            hard, n_bad, trials = ldpc_qc.decode_qc(
                chunk, rx.cfg.ldpc_table, n_iters=iters)
            packed, bch_bad = pack_and_check(hard)
            parts.append(dict(kbch_bytes=packed, trials=trials,
                              ldpc_ok=n_bad == 0, bch_bad=bch_bad,
                              hard=hard))
        return {k: jnp.concatenate([p[k] for p in parts])
                for k in parts[0]}

    def unpack(p):
        return frontend.unpack_cs4(p) if ingest == "cs4" else p

    def local_step(samples):
        out = jax.vmap(core)(unpack(samples))
        llrs = out.pop("llrs").reshape(cl * F, N)
        fd = fec_local(llrs, n_iters)
        fd.update(quality=out["quality"], pls=out["pls"],
                  pls_conf=out["pls_conf"],
                  starts=out["starts"], cfo=out["cfo"],
                  freq=out["freq"], llrs=llrs)
        return fd

    lane_specs = dict(kbch_bytes=P("carrier"), trials=P("carrier"),
                      ldpc_ok=P("carrier"), bch_bad=P("carrier"),
                      hard=P("carrier"), llrs=P("carrier"))
    step = jax.jit(shard_map(
        local_step, mesh=mesh,
        in_specs=(P("carrier"),),
        out_specs=dict(quality=P("carrier"), pls=P("carrier"),
                       pls_conf=P("carrier"),
                       starts=P("carrier"), cfo=P("carrier"),
                       freq=P("carrier"), **lane_specs),
    ))

    def local_esc(llrs):
        return fec_local(llrs, n_iters_full)

    escalate = jax.jit(shard_map(
        local_esc, mesh=mesh, in_specs=(P("carrier"),),
        out_specs=lane_specs))

    if ingest == "cs4":
        example = np.zeros((C, n), np.uint8)
    else:
        example = np.zeros((C, 2, n), np.int8)
    return step, example, escalate
