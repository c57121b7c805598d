#!/usr/bin/env python3
"""Split the fused resampler's 10.7 ms between the XLA prep (parity
split + rows build) and the Pallas kernel: time (a) prep only, (b) the
kernel on prebuilt device-resident rows, (c) prep variants."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    jnp.arange(8.0).sum().block_until_ready()

    from dvbs_tpu.ops import frontend
    from dvbs_tpu.ops import resample_pallas as rp
    from dvbs_tpu.parallel.mesh import bank_block_symbols

    C = 8
    S = bank_block_symbols(C, mc=4, short=False)
    TS = rp.TS
    shift_bits = frontend._shift_bits_for(S)
    bias = 1 << (shift_bits - 1)
    WE = TS + bias + 6
    nt = S // TS
    TC = 16
    ntp = -(-nt // TC) * TC
    nck = ntp // TC
    pad_rows = max(-(-WE // TS), TC)
    rng = np.random.default_rng(0)

    def timeit(fn, *args, reps=20):
        o = fn(*args)
        np.asarray(jax.device_get(o[0].ravel()[:4] if isinstance(o, (tuple, list))
                                  else o.ravel()[:4]))
        t0 = time.time()
        for _ in range(reps):
            o = fn(*args)
        np.asarray(jax.device_get(o[0].ravel()[:4] if isinstance(o, (tuple, list))
                                  else o.ravel()[:4]))
        return (time.time() - t0) / reps * 1e3

    n2 = 2 * S + 64
    y_re = jax.device_put(jnp.asarray(
        rng.normal(size=(C, n2)).astype(np.float32)))
    y_im = jax.device_put(jnp.asarray(
        rng.normal(size=(C, n2)).astype(np.float32)))

    need = (ntp + pad_rows) * TS

    @jax.jit
    def prep(yr, yi):
        outs = []
        for y in (yr, yi):
            ypp = jnp.pad(y, ((0, 0), (bias + 4, 0)))
            ypp = jnp.pad(ypp, ((0, 0), (0, max(0, 2 * need - ypp.shape[1]))))[:, :2 * need]
            for par in (0, 1):
                plane = ypp[:, par::2].reshape(C, ntp + pad_rows, TS)
                parts = []
                covered = 0
                m = 0
                while covered < WE:
                    cc = min(TS, WE - covered)
                    parts.append(plane[:, m:m + ntp, :cc])
                    covered += cc
                    m += 1
                outs.append(jnp.concatenate(parts, axis=2))
        return outs

    ms = timeit(prep, y_re, y_im)
    print(f"XLA prep (4 rows planes): {ms:.3f} ms", flush=True)

    rows = [jax.device_put(r) for r in prep(y_re, y_im)]
    u = jax.device_put(jnp.asarray(
        rng.normal(size=(C, ntp, TS)).astype(np.float32)))
    rb = jax.device_put(jnp.asarray(rng.integers(
        0, 2 * bias, size=(C, ntp)).astype(np.int32)))

    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    coef_np, _, _ = frontend._farrow_coeffs()
    coef = tuple(tuple(float(v) for v in row) for row in coef_np)

    for TCk in (8, 16, 32):
        ntp2 = -(-nt // TCk) * TCk
        if ntp2 != ntp:
            continue
        nck2 = ntp // TCk
        kern = functools.partial(rp._kernel, TC=TCk, WE=WE,
                                 shift_bits=shift_bits, coef=coef)
        vspec = pl.BlockSpec((1, TCk, TS), lambda c, k: (c, k, 0),
                             memory_space=pltpu.VMEM)
        rspec = pl.BlockSpec((1, TCk, WE), lambda c, k: (c, k, 0),
                             memory_space=pltpu.VMEM)

        @jax.jit
        def kernel_only(r0, r1, r2, r3, uu, rbb):
            return pl.pallas_call(
                kern,
                grid=(C, nck2),
                in_specs=[rspec, rspec, rspec, rspec, vspec,
                          pl.BlockSpec((1, TCk, 1), lambda c, k: (c, k, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=[vspec, vspec],
                out_shape=[
                    jax.ShapeDtypeStruct((C, ntp, TS), jnp.float32),
                    jax.ShapeDtypeStruct((C, ntp, TS), jnp.float32),
                ],
            )(r0, r1, r2, r3, uu, rbb[..., None])

        try:
            ms = timeit(kernel_only, *rows, u, rb)
            print(f"kernel only TC={TCk:2d}: {ms:.3f} ms", flush=True)
        except Exception as e:
            print(f"kernel only TC={TCk}: FAILED {str(e)[:150]}", flush=True)
    print("done", flush=True)


if __name__ == "__main__" and "--three" not in sys.argv:
    main()

def main3():
    import jax
    import jax.numpy as jnp
    import time
    jnp.arange(8.0).sum().block_until_ready()
    from dvbs_tpu.ops import frontend
    from dvbs_tpu.ops import resample_pallas as rp
    from dvbs_tpu.parallel.mesh import bank_block_symbols
    C = 8
    S = bank_block_symbols(C, mc=4, short=False)
    TS = rp.TS
    shift_bits = frontend._shift_bits_for(S)
    bias = 1 << (shift_bits - 1)
    WE = TS + bias + 6
    nt = S // TS
    TC = 16
    ntp = -(-nt // TC) * TC
    nchunks = -(-WE // TS)       # 4
    pad_rows = max(nchunks, TC)
    need = (ntp + pad_rows) * TS
    rng = np.random.default_rng(0)
    n2 = 2 * S + 64
    y_re = jax.device_put(jnp.asarray(rng.normal(size=(C, n2)).astype(np.float32)))
    y_im = jax.device_put(jnp.asarray(rng.normal(size=(C, n2)).astype(np.float32)))

    def timeit(fn, *args, reps=20):
        o = fn(*args)
        np.asarray(jax.device_get(o[0].ravel()[:4]))
        t0 = time.time()
        for _ in range(reps):
            o = fn(*args)
        np.asarray(jax.device_get(o[0].ravel()[:4]))
        return (time.time() - t0) / reps * 1e3

    @jax.jit
    def prep_full(yr, yi):
        outs = []
        for y in (yr, yi):
            ypp = jnp.pad(y, ((0, 0), (bias + 4, 0)))
            ypp = jnp.pad(ypp, ((0, 0), (0, max(0, 2 * need - ypp.shape[1]))))[:, :2 * need]
            for par in (0, 1):
                plane = ypp[:, par::2].reshape(C, ntp + pad_rows, TS)
                parts = [plane[:, m:m + ntp, :] for m in range(nchunks)]
                outs.append(jnp.concatenate(parts, axis=2))   # [C, ntp, 4*TS]
        return outs
    ms = timeit(prep_full, y_re, y_im)
    print(f"prep full-width 4-chunk concat: {ms:.3f} ms", flush=True)

    @jax.jit
    def prep_parity_only(yr, yi):
        outs = []
        for y in (yr, yi):
            ypp = jnp.pad(y, ((0, 0), (bias + 4, 0)))
            ypp = jnp.pad(ypp, ((0, 0), (0, max(0, 2 * need - ypp.shape[1]))))[:, :2 * need]
            for par in (0, 1):
                outs.append(ypp[:, par::2].reshape(C, ntp + pad_rows, TS) * 1.0)
        return outs
    ms = timeit(prep_parity_only, y_re, y_im)
    print(f"prep parity-split only: {ms:.3f} ms", flush=True)
    print("done3", flush=True)


if __name__ == "__main__" and "--three" in sys.argv:
    main3()
