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
    C = n_devices * carriers_per_device
    n = 2 * block_symbols

    def local_step(samples_ri):          # [C/D, 2, n]
        out = jax.vmap(core)(samples_ri)
        ok = out["ldpc_ok"]
        locked = jax.lax.psum(jnp.sum(ok.astype(jnp.int32)), "carrier")
        return dict(hard=out["hard"], trials=out["trials"],
                    ldpc_ok=ok, quality=out["quality"],
                    pls=out["pls"], locked=jnp.reshape(locked, (1,)))

    step = jax.jit(shard_map(
        local_step, mesh=mesh,
        in_specs=(P("carrier", None, None),),
        out_specs=dict(hard=P("carrier"), trials=P("carrier"),
                       ldpc_ok=P("carrier"), quality=P("carrier"),
                       pls=P("carrier"), locked=P()),
    ))
    example = np.zeros((C, 2, n), np.float32)
    return step, example, mesh
