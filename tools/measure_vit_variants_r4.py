"""On-chip variant sweep for the Pallas Viterbi kernel knobs."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from dvbs_tpu.ops import viterbi, viterbi_pallas


def sync(x):
    np.asarray(jax.device_get(x[:1, :4]))


def bench(fn, arg, n=30):
    out = fn(arg)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(arg)
    sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    B, T = 1024, 704
    x = jnp.asarray(rng.normal(0, 2, (B, T, 2)).astype(np.float32))
    t_xla = bench(lambda a: viterbi.decode_segments(a), x)
    print(f"xla radix-16 scan: {t_xla:.2f} ms", flush=True)
    for bt in (128, 256, 512):
        for expand in ("matmul", "reshape"):
            try:
                t = bench(lambda a: viterbi_pallas.decode_segments_pallas(
                    a, bt=bt, expand=expand), x)
                print(f"pallas bt={bt} expand={expand}: {t:.2f} ms",
                      flush=True)
            except Exception as e:
                print(f"pallas bt={bt} expand={expand}: FAIL "
                      f"{type(e).__name__}: {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
