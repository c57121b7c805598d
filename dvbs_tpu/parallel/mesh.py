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
from jax.experimental.shard_map import shard_map

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
    fec = rx._fec_fn
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


def build_carrier_bank(n_carriers: int, mc: int = 4, short: bool = False,
                       block_symbols: int = 1 << 17, max_ldpc_trials: int = 20,
                       fec_chunk: int = 12):
    """Single-device multi-carrier bank: the whole bank demodulates in one
    device program per block (vmap over the carrier axis), which amortizes
    the per-call host<->device latency — the BASELINE.json 8-carrier
    aggregate configuration on one chip.

    The LDPC stage runs in lane chunks of `fec_chunk` frames so its
    working set stays VMEM-resident (see CLAUDE.md).
    Returns (step_fn, example_input): step(samples_ri [C, 2, n]) ->
    dict(hard [C*F, N], ldpc_ok [C*F], quality [C, F], pls [C, F]).
    """
    import jax.numpy as jnp
    rx = DVBS2Receiver(mc=mc, short=short, block_symbols=block_symbols,
                       max_ldpc_trials=max_ldpc_trials)
    core = rx._sym_fn
    fec = rx._fec_fn
    F = rx.n_frames
    N = rx.cfg.nldpc
    total = n_carriers * F

    vm_core = jax.jit(jax.vmap(core))
    slice_llrs = jax.jit(
        lambda l, lo: jax.lax.dynamic_slice(l, (lo, 0), (fec_chunk, N)),
        static_argnames=())

    def step(samples_ri):
        # NOTE deliberately not one fused jit: the QC LDPC decoder must run
        # as its own program to keep its all-VMEM schedule (CLAUDE.md);
        # intermediate arrays stay on device between the chained calls.
        out = vm_core(samples_ri)
        llrs = out.pop("llrs").reshape(total, N)
        hards, oks = [], []
        for lo in range(0, total, fec_chunk):
            fd = fec(slice_llrs(llrs, lo))
            hards.append(fd["hard"])
            oks.append(fd["ldpc_ok"])
        return dict(hard=jnp.concatenate(hards),
                    ldpc_ok=jnp.concatenate(oks),
                    quality=out["quality"], pls=out["pls"])

    example = np.zeros((n_carriers, 2, 2 * block_symbols), np.float16)
    return step, example
