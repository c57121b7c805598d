#!/usr/bin/env python3
"""Finer structural bisect for the Mosaic remote-compiler crash: start
from a minimal known-good kernel and add one structural feature at a
time (ANY input + DMA, multi-DMA sem array, 2-D grid, squeezed-block
output)."""
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    jnp.arange(8.0).sum().block_until_ready()

    TC, TS, extra = 8, 256, 4
    nck = 4
    ntp = nck * TC
    C = 2
    rng = np.random.default_rng(0)

    def run(tag, fn):
        try:
            out = fn()
            v = float(np.asarray(jax.device_get(out)).sum())
            print(f"{tag}: OK ({v:.3f})", flush=True)
        except Exception as ex:
            print(f"{tag}: FAILED {type(ex).__name__}: {str(ex)[:160]}",
                  flush=True)

    # v0: plain VMEM blocks, 1-D grid
    def v0():
        x = jnp.asarray(rng.normal(size=(ntp, TS)).astype(np.float32))

        def k0(x_ref, o_ref):
            o_ref[:] = x_ref[:] * 2.0
        return pl.pallas_call(
            k0, grid=(nck,),
            in_specs=[pl.BlockSpec((TC, TS), lambda k: (k, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TC, TS), lambda k: (k, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ntp, TS), jnp.float32),
        )(x)
    run("v0 vmem-only", v0)

    # v1: one ANY input, DMA with dynamic sublane offset, scalar sem
    def v1():
        x = jnp.asarray(rng.normal(size=(ntp + extra, TS))
                        .astype(np.float32))

        def k1(x_hbm, o_ref, a, sem):
            k = pl.program_id(0)
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(k * TC, TC + extra), :], a, sem)
            cp.start()
            cp.wait()
            o_ref[:] = a[0:TC, :] * 2.0
        return pl.pallas_call(
            k1, grid=(nck,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((TC, TS), lambda k: (k, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((TC + extra, TS), jnp.float32),
                            pltpu.SemaphoreType.DMA],
            out_shape=jax.ShapeDtypeStruct((ntp, TS), jnp.float32),
        )(x)
    run("v1 any+dma", v1)

    # v2: two ANY inputs, sem array (2,)
    def v2():
        x = jnp.asarray(rng.normal(size=(ntp + extra, TS))
                        .astype(np.float32))
        y = jnp.asarray(rng.normal(size=(ntp + extra, TS))
                        .astype(np.float32))

        def k2(x_hbm, y_hbm, o_ref, a, b, sem):
            k = pl.program_id(0)
            cps = [pltpu.make_async_copy(
                h.at[pl.ds(k * TC, TC + extra), :], v, sem.at[i])
                for i, (h, v) in enumerate(((x_hbm, a), (y_hbm, b)))]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()
            o_ref[:] = a[0:TC, :] + b[0:TC, :]
        return pl.pallas_call(
            k2, grid=(nck,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
            out_specs=pl.BlockSpec((TC, TS), lambda k: (k, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((TC + extra, TS), jnp.float32),
                            pltpu.VMEM((TC + extra, TS), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,))],
            out_shape=jax.ShapeDtypeStruct((ntp, TS), jnp.float32),
        )(x, y)
    run("v2 two-any sem-array", v2)

    # v3: 2-D grid, 3-D ANY input indexed [c, ds, :]
    def v3():
        x = jnp.asarray(rng.normal(size=(C, ntp + extra, TS))
                        .astype(np.float32))

        def k3(x_hbm, o_ref, a, sem):
            c = pl.program_id(0)
            k = pl.program_id(1)
            cp = pltpu.make_async_copy(
                x_hbm.at[c, pl.ds(k * TC, TC + extra), :], a, sem)
            cp.start()
            cp.wait()
            o_ref[0] = a[0:TC, :] * 2.0
        return pl.pallas_call(
            k3, grid=(C, nck),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, TC, TS), lambda c, k: (c, k, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((TC + extra, TS), jnp.float32),
                            pltpu.SemaphoreType.DMA],
            out_shape=jax.ShapeDtypeStruct((C, ntp, TS), jnp.float32),
        )(x)
    run("v3 2d-grid", v3)

    # v4: v3 but squeeze via .at[c] ref then ds on result
    def v4():
        x = jnp.asarray(rng.normal(size=(C, ntp + extra, TS))
                        .astype(np.float32))

        def k4(x_hbm, o_ref, a, sem):
            c = pl.program_id(0)
            k = pl.program_id(1)
            cp = pltpu.make_async_copy(
                x_hbm.at[c].at[pl.ds(k * TC, TC + extra), :], a, sem)
            cp.start()
            cp.wait()
            o_ref[0] = a[0:TC, :] * 2.0
        return pl.pallas_call(
            k4, grid=(C, nck),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, TC, TS), lambda c, k: (c, k, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((TC + extra, TS), jnp.float32),
                            pltpu.SemaphoreType.DMA],
            out_shape=jax.ShapeDtypeStruct((C, ntp, TS), jnp.float32),
        )(x)
    run("v4 chained-at", v4)
    print("done", flush=True)


if __name__ == "__main__" and "--two" not in sys.argv:
    main()

def main2():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    jnp.arange(8.0).sum().block_until_ready()

    TC, TS, extra = 8, 256, 4
    nck = 4
    ntp = nck * TC
    C = 2
    rng = np.random.default_rng(0)

    def run(tag, fn):
        try:
            out = fn()
            v = float(np.asarray(jax.device_get(out)).sum())
            print(f"{tag}: OK ({v:.3f})", flush=True)
        except Exception as ex:
            print(f"{tag}: FAILED {type(ex).__name__}: {str(ex)[:160]}",
                  flush=True)

    x4 = jnp.asarray(rng.normal(size=(C, nck, TC + extra, TS))
                     .astype(np.float32))
    u3 = jnp.asarray(rng.normal(size=(C, ntp, TS)).astype(np.float32))
    rb3 = jnp.asarray(rng.integers(0, 16, size=(C, ntp, 1))
                      .astype(np.int32))
    vspec = pl.BlockSpec((1, TC, TS), lambda c, k: (c, k, 0),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((1, 1, TC + extra, TS), lambda c, k: (c, k, 0, 0),
                         memory_space=pltpu.VMEM)

    # v5: 4-D blocked input, squeeze-read, 2-D grid
    def v5():
        def k5(x_ref, o_ref):
            a = x_ref[0, 0]
            o_ref[0] = a[0:TC, :] * 2.0
        return pl.pallas_call(
            k5, grid=(C, nck), in_specs=[cspec], out_specs=vspec,
            out_shape=jax.ShapeDtypeStruct((C, ntp, TS), jnp.float32),
        )(x4)
    run("v5 4d-block", v5)

    # v6: + rows concat
    def v6():
        WE = TS + 260
        def k6(x_ref, o_ref):
            a = x_ref[0, 0]
            chunks = []
            covered = 0
            m = 0
            while covered < WE:
                cc = min(TS, WE - covered)
                chunks.append(a[m:m + TC, 0:cc])
                covered += cc
                m += 1
            r = jnp.concatenate(chunks, axis=1)
            o_ref[0] = r[:, :TS] * 2.0
        return pl.pallas_call(
            k6, grid=(C, nck), in_specs=[cspec], out_specs=vspec,
            out_shape=jax.ShapeDtypeStruct((C, ntp, TS), jnp.float32),
        )(x4)
    run("v6 rows-concat", v6)

    # v7: + rb block (1, TC, 1) read
    def v7():
        def k7(x_ref, rb_ref, o_ref):
            a = x_ref[0, 0]
            rbv = rb_ref[0]
            o_ref[0] = a[0:TC, :] + rbv.astype(jnp.float32)
        return pl.pallas_call(
            k7, grid=(C, nck),
            in_specs=[cspec,
                      pl.BlockSpec((1, TC, 1), lambda c, k: (c, k, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=vspec,
            out_shape=jax.ShapeDtypeStruct((C, ntp, TS), jnp.float32),
        )(x4, rb3)
    run("v7 rb-block", v7)

    # v8: + masked barrel over 8 stages
    def v8():
        WE = TS + 260
        def k8(x_ref, rb_ref, o_ref):
            a = x_ref[0, 0]
            chunks = []
            covered = 0
            m = 0
            while covered < WE:
                cc = min(TS, WE - covered)
                chunks.append(a[m:m + TC, 0:cc])
                covered += cc
                m += 1
            r = jnp.concatenate(chunks, axis=1)
            rbv = rb_ref[0]
            hv = rbv >> 1
            w = WE
            for b in reversed(range(8)):
                step = 1 << b
                bit = ((hv >> b) & 1) != 0
                w -= step
                r = jnp.where(bit, r[:, step:step + w], r[:, :w])
            o_ref[0] = r[:, :TS]
        return pl.pallas_call(
            k8, grid=(C, nck),
            in_specs=[cspec,
                      pl.BlockSpec((1, TC, 1), lambda c, k: (c, k, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=vspec,
            out_shape=jax.ShapeDtypeStruct((C, ntp, TS), jnp.float32),
        )(x4, rb3)
    run("v8 barrel", v8)
    print("done2", flush=True)


if __name__ == "__main__" and "--two" in sys.argv:
    main2()
