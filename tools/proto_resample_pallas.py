#!/usr/bin/env python3
"""On-chip prototype: fused Pallas resampler vs XLA resample_windowed.

Correctness (max abs err on realistic drift) + timing at bank scale
(8 carriers x bench block), single-carrier and vmapped, for a few TC
chunk sizes.  Run on the real chip.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    t0 = time.time()
    jnp.arange(8.0).sum().block_until_ready()
    print(f"device claim: {time.time() - t0:.1f}s", flush=True)

    from dvbs_tpu.ops import frontend
    from dvbs_tpu.ops import resample_pallas as rp
    from dvbs_tpu.parallel.mesh import bank_block_symbols

    C = 8
    S = bank_block_symbols(C, mc=4, short=False)
    n2 = 2 * S + 64
    rng = np.random.default_rng(0)
    y = (rng.normal(size=(C, n2)) + 1j * rng.normal(size=(C, n2))
         ).astype(np.complex64)
    k = np.arange(S)
    t = np.stack([2.0 * k + 0.3 + 0.1 * c + (1 + 0.1 * c) * 1e-5 * k
                  for c in range(C)]).astype(np.float32)
    # complex64 host->device transfers are unimplemented on axon:
    # ship stacked re/im and combine on device
    yri = jax.device_put(jnp.asarray(
        np.stack([y.real, y.imag], axis=1).astype(np.float32)))
    yd = jax.jit(lambda a: (a[:, 0] + 1j * a[:, 1]).astype(jnp.complex64)
                 )(yri)
    td = jax.device_put(jnp.asarray(t))

    def fetch(o):
        return (np.asarray(jax.device_get(jnp.real(o))) +
                1j * np.asarray(jax.device_get(jnp.imag(o))))

    xla = jax.jit(jax.vmap(frontend.resample_windowed))
    ref = xla(yd, td)
    refh = fetch(ref)

    def timeit(fn, *args, reps=20):
        o = fn(*args)
        np.asarray(jax.device_get(jnp.real(o[:1, :4])))
        t0 = time.time()
        for _ in range(reps):
            o = fn(*args)
        np.asarray(jax.device_get(jnp.real(o[:1, :4])))
        return (time.time() - t0) / reps * 1e3

    ms = timeit(xla, yd, td)
    print(f"XLA vmapped resample_windowed: {ms:.3f} ms", flush=True)

    for tc in (8, 16, 32):
        try:
            pk = jax.jit(lambda yy, tt, tc=tc:
                         rp._resample_batched(yy, tt, tc=tc))
            got = fetch(pk(yd, td))
            err = np.abs(got - refh).max()
            ms = timeit(pk, yd, td)
            print(f"pallas batched tc={tc:2d}: {ms:.3f} ms  "
                  f"max err {err:.2e}", flush=True)
        except Exception as e:
            print(f"pallas batched tc={tc:2d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
    try:
        pk = jax.jit(jax.vmap(rp.resample_windowed_pallas))
        got = fetch(pk(yd, td))
        err = np.abs(got - refh).max()
        ms = timeit(pk, yd, td)
        print(f"pallas via custom_vmap: {ms:.3f} ms  max err {err:.2e}",
              flush=True)
    except Exception as e:
        print(f"custom_vmap: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
