"""On-chip timing: Pallas radix-8 Viterbi vs XLA radix-16 scan.

Bank scale [1024, 704, 2] (8 carriers x 128 segments of core 512 +
2*96 wings). Forces sync with a small fetch (block_until_ready is a
no-op on axon, CLAUDE.md).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from dvbs_tpu.ops import viterbi, viterbi_pallas


def sync(x):
    np.asarray(jax.device_get(x[:1, :4]))


def bench(fn, arg, n=20):
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
    for B, T in ((1024, 704), (256, 2240)):
        llrs = rng.normal(0, 2, (B, T, 2)).astype(np.float32)
        x = jnp.asarray(llrs)
        t_xla = bench(lambda a: viterbi.decode_segments(a), x)
        t_pal = bench(lambda a: viterbi_pallas.decode_segments_pallas(a), x)
        print(f"[{B},{T}] xla {t_xla:.2f} ms   pallas {t_pal:.2f} ms "
              f"({t_xla / t_pal:.2f}x)", flush=True)
        # spot equality on real-ish data (random llrs: compare anyway on
        # a real encoded batch below)
    from dvbs_tpu.spec import dvbs_fec
    B, T, wing = 256, 704, 96
    def encode(bits):
        bp = np.concatenate([np.zeros(6, np.int64), bits])
        xx = np.zeros(len(bits), np.int64); yy = np.zeros(len(bits), np.int64)
        for j in range(7):
            if (dvbs_fec.G1 >> j) & 1: xx += bp[j:j+len(bits)]
            if (dvbs_fec.G2 >> j) & 1: yy += bp[j:j+len(bits)]
        return np.stack([xx % 2, yy % 2], 1)
    llrs = np.zeros((B, T, 2), np.float32)
    for b in range(B):
        bits = rng.integers(0, 2, T)
        llrs[b] = (1 - 2 * encode(bits)) * 2.0 + rng.normal(0, 0.8, (T, 2))
    x = jnp.asarray(llrs)
    ref = np.asarray(jax.device_get(viterbi.decode_segments(x)))
    got = np.asarray(jax.device_get(
        viterbi_pallas.decode_segments_pallas(x)))
    core = slice(wing, T - wing)
    print("core mismatch on chip:",
          int((got[:, core] != ref[:, core]).sum()), "of",
          got[:, core].size, flush=True)


if __name__ == "__main__":
    main()
