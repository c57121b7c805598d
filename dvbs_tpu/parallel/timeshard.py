"""Time-block sharding: one carrier's stream split across the mesh.

The complement of parallel/mesh.py's carrier axis (SURVEY.md sec. 2.5
rows 5-7): a single high-rate carrier is sharded along TIME — each
device owns a contiguous slice of samples and decodes the PL frames
that start inside it. The slices are processed exactly like the
streaming driver's consecutive blocks (models/driver.py), whose
windows overlap by `block - advance` samples; here that overlap is an
overlap-save halo fetched from the right neighbor over ICI with a
single `jax.lax.ppermute` — no host round trip, no sample gaps.

Every front-end stage is local-plus-halo (65-tap RRC, timing windows,
90-symbol PL correlation), so with the halo attached each shard's
output is EXACTLY the single-device streaming output of its block —
asserted by tests/test_timeshard.py.

The last shard's halo wraps around to shard 0 (ppermute is a ring);
its trailing frames read wrapped samples, so a streaming caller feeds
slabs with one warm-up shard of overlap, or ignores the final shard's
tail frame like the host FIFO does.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..models.dvbs2 import DVBS2Receiver


def build_time_sharded(n_devices: int, mc: int = 4, short: bool = True,
                       block_symbols: int = 1 << 15):
    """Build a jitted time-sharded demod step over an n_devices mesh.

    Returns (step_fn, example_input, mesh, advance_samples).
    step_fn maps [D, 2, A] float32/float16 (device d owns samples
    [d*A, (d+1)*A) of one carrier's 2-sps stream, A = advance_samples)
    -> per-shard outputs stacked on axis 0; equivalent to running the
    serial block receiver at fixed nominal advance on each window.
    """
    devices = np.array(jax.devices()[:n_devices])
    mesh = Mesh(devices, ("time",))
    rx = DVBS2Receiver(mc=mc, short=short, block_symbols=block_symbols)
    A = 2 * rx.n_frames * rx.cfg.plframe_len     # samples owned per shard
    n = 2 * block_symbols
    halo = n - A
    if halo <= 0:
        raise ValueError(f"block {block_symbols} yields no overlap "
                         f"(halo {halo})")
    hops = -(-halo // A)                 # neighbors the halo spans
    core = rx._sym_fn
    fec = rx._fec2_fn or rx._fec_fn     # full trial budget (no host
                                        # escalation inside shard_map)
    right = [(d, (d - 1) % n_devices) for d in range(n_devices)]

    def local_step(chunk):               # [1, 2, A] on each device
        chunk = chunk[0]
        # overlap-save halo: the head of the right neighbor(s) rides
        # ICI to extend this shard's window to a full block; each hop
        # forwards one more slice around the ring
        parts, nxt = [chunk], chunk
        for _ in range(hops):
            nxt = jax.lax.ppermute(nxt, "time", right)
            parts.append(nxt)
        window = jnp.concatenate(parts, axis=-1)[:, :n]        # [2, n]
        out = core(window)
        fd = fec(out.pop("llrs"))
        out.pop("scatter")
        out.update(fd)
        return {k: v[None] for k, v in out.items()}

    step = jax.jit(shard_map(
        local_step, mesh=mesh,
        in_specs=(P("time", None, None),),
        out_specs=P("time"),
    ))
    example = np.zeros((n_devices, 2, A), np.float32)
    return step, example, mesh, A


def build_grid_sharded(n_carriers: int, n_time: int, mc: int = 4,
                       short: bool = True, block_symbols: int = 1 << 15,
                       devices: np.ndarray | None = None):
    """2D carrier x time sharding: the full scale-out shape of
    BASELINE config 5 (N-carrier bank spread over a slice / multiple
    hosts) as ONE SPMD program over a {carrier, time} mesh.

    Each device owns a contiguous A-sample slice of ONE carrier's
    stream; the overlap-save halo rides `ppermute` around the TIME ring
    only — collectives over a named axis act within each slice of the
    other axes, so every carrier keeps an independent halo ring and
    there is zero cross-carrier traffic (carriers are embarrassingly
    parallel, SURVEY.md sec. 2.5).

    Returns (step_fn, example_input, mesh, advance_samples); step_fn
    maps [C, T, 2, A] -> per-shard outputs stacked on [C, T, ...].

    `devices` overrides the [C, T] device grid — multi-host callers lay
    the time axis across hosts so the halo ppermute rides DCN
    (tools/dryrun_multihost.py).
    """
    ndev = n_carriers * n_time
    if devices is None:
        devices = np.array(jax.devices()[:ndev]).reshape(n_carriers, n_time)
    assert devices.shape == (n_carriers, n_time)
    mesh = Mesh(devices, ("carrier", "time"))
    rx = DVBS2Receiver(mc=mc, short=short, block_symbols=block_symbols)
    A = 2 * rx.n_frames * rx.cfg.plframe_len
    n = 2 * block_symbols
    halo = n - A
    if halo <= 0:
        raise ValueError(f"block {block_symbols} yields no overlap "
                         f"(halo {halo})")
    hops = -(-halo // A)
    core = rx._sym_fn
    fec = rx._fec2_fn or rx._fec_fn
    right = [(d, (d - 1) % n_time) for d in range(n_time)]

    def local_step(chunk):               # [1, 1, 2, A] on each device
        chunk = chunk[0, 0]
        parts, nxt = [chunk], chunk
        for _ in range(hops):
            nxt = jax.lax.ppermute(nxt, "time", right)
            parts.append(nxt)
        window = jnp.concatenate(parts, axis=-1)[:, :n]        # [2, n]
        out = core(window)
        fd = fec(out.pop("llrs"))
        out.pop("scatter")
        out.update(fd)
        return {k: v[None, None] for k, v in out.items()}

    step = jax.jit(shard_map(
        local_step, mesh=mesh,
        in_specs=(P("carrier", "time", None, None),),
        out_specs=P("carrier", "time"),
    ))
    example = np.zeros((n_carriers, n_time, 2, A), np.float32)
    return step, example, mesh, A
