#!/usr/bin/env python3
"""Bisect which construct of the resample kernel crashes the Mosaic
remote compiler (HTTP 500, no message).  Builds the kernel up in
stages; compiles+runs each on the chip at small scale."""
import sys
import functools

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    jnp.arange(8.0).sum().block_until_ready()

    TC, TS, extra = 8, 256, 4
    shift_bits = 9
    bias = 1 << (shift_bits - 1)
    WE = TS + bias + 6
    C, nck = 2, 4
    ntp = nck * TC

    def make(stage):
        def kern(e_re, o_re, u_ref, rb_ref, ore_ref, ae_re, ao_re, sem):
            c = pl.program_id(0)
            k = pl.program_id(1)
            cps = [pltpu.make_async_copy(
                h.at[c, pl.ds(k * TC, TC + extra), :], v, sem.at[i])
                for i, (h, v) in enumerate(((e_re, ae_re), (o_re, ao_re)))]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()
            if stage == "dma":
                ore_ref[0] = ae_re[0:TC, :] + ao_re[0:TC, :]
                return

            def rows_of(a):
                chunks = []
                covered = 0
                m = 0
                while covered < WE:
                    cc = min(TS, WE - covered)
                    chunks.append(a[m:m + TC, 0:cc])
                    covered += cc
                    m += 1
                return jnp.concatenate(chunks, axis=1)
            re_ = rows_of(ae_re)
            ro_ = rows_of(ao_re)
            if stage == "rows":
                ore_ref[0] = re_[:, :TS] + ro_[:, :TS]
                return
            rbv = rb_ref[0]
            hv = rbv >> 1
            odd = (rbv & 1) != 0
            if stage == "rb":
                ore_ref[0] = (re_[:, :TS] + ro_[:, :TS]
                              + hv.astype(jnp.float32))
                return
            w = WE
            planes = [re_, ro_]
            for b in reversed(range(shift_bits - 1)):
                step = 1 << b
                bit = ((hv >> b) & 1) != 0
                w -= step
                planes = [jnp.where(bit, p[:, step:step + w], p[:, :w])
                          for p in planes]
            re_, ro_ = planes
            if stage == "barrel":
                ore_ref[0] = re_[:, :TS] + ro_[:, :TS]
                return
            e_pre = jnp.where(odd, ro_[:, :w - 1], re_[:, :w - 1])
            o_pre = jnp.where(odd, re_[:, 1:w], ro_[:, :w - 1])
            if stage == "swap":
                ore_ref[0] = e_pre[:, :TS] + o_pre[:, :TS]
                return
            u = u_ref[0]
            out = jnp.zeros((TC, TS), jnp.float32)
            for ci in range(10):
                tap = jnp.full((TC, TS), 0.1, jnp.float32)
                for dg in range(1, 10):
                    tap = tap * u + 0.01 * dg
                p = e_pre if ci % 2 == 0 else o_pre
                out = out + tap * p[:, ci // 2:ci // 2 + TS]
            ore_ref[0] = out
        return kern

    rng = np.random.default_rng(0)
    e = jnp.asarray(rng.normal(size=(C, ntp + extra, TS)).astype(np.float32))
    o = jnp.asarray(rng.normal(size=(C, ntp + extra, TS)).astype(np.float32))
    u = jnp.asarray(rng.normal(size=(C, ntp, TS)).astype(np.float32))
    rb = jnp.asarray(
        rng.integers(0, 2 * bias, size=(C, ntp, 1)).astype(np.int32))
    vspec = pl.BlockSpec((1, TC, TS), lambda c, k: (c, k, 0),
                         memory_space=pltpu.VMEM)
    for stage in ("dma", "rows", "rb", "barrel", "swap", "full"):
        try:
            out = pl.pallas_call(
                make(stage),
                grid=(C, nck),
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                    vspec,
                    pl.BlockSpec((1, TC, 1), lambda c, k: (c, k, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=vspec,
                scratch_shapes=[
                    pltpu.VMEM((TC + extra, TS), jnp.float32),
                    pltpu.VMEM((TC + extra, TS), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
                out_shape=jax.ShapeDtypeStruct((C, ntp, TS), jnp.float32),
            )(e, o, u, rb)
            v = float(np.asarray(jax.device_get(out[0, 0, :2])).sum())
            print(f"{stage}: OK ({v:.3f})", flush=True)
        except Exception as ex:
            print(f"{stage}: FAILED {type(ex).__name__}: {str(ex)[:200]}",
                  flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
