"""DVB-S carrier bank (parallel/dvbs_bank.py) on CPU: 2 distinct
carriers through the fused locked chain, host tail to bit-exact TS."""
import numpy as np
import jax.numpy as jnp

from dvbs_tpu.tx import dvbs_mod, channel
from dvbs_tpu.ops import frontend
from dvbs_tpu.parallel.dvbs_bank import build_dvbs_bank
from dvbs_tpu.models.dvbs import DVBSReceiver


def test_dvbs_bank_two_carriers_ts_out():
    C = 2
    n = 2 * (1 << 16)
    sigs, sents = [], []
    for c in range(C):
        ts = dvbs_mod.random_ts_groups(6, seed=30 + c)
        mod = dvbs_mod.DVBSModulator(rate="1/2")
        tx = mod.ts_to_symbols(ts)
        x = channel.shape(tx, sps=2)
        y = channel.impair(x, snr_db=10.0, cfo=(0.003 + 0.004 * c) * np.pi,
                           delay_samples=0.2 + 0.3 * c, seed=31 + c)
        assert len(y) >= n
        sigs.append(y[:n])
        sents.append(ts.reshape(-1, 188))
    samples = np.stack([frontend.pack_cs4(s) for s in sigs])

    step, example = build_dvbs_bank(C, rate="1/2", block_samples=n)
    assert samples.shape == example.shape and samples.dtype == example.dtype
    out = step(jnp.asarray(samples))
    ber = np.asarray(out["ber"])
    assert (ber < 0.02).all(), f"re-encode BER too high: {ber}"
    n_pairs = out["n_pairs"]
    bits = np.unpackbits(np.asarray(out["bits"]), axis=1)[:, :n_pairs]
    # carrier independence: different payloads decode to different bits
    assert not np.array_equal(bits[0], bits[1])

    # host tail (deframe -> deinterleave -> RS -> descramble) recovers
    # each carrier's own TS packets
    for c in range(C):
        rx = DVBSReceiver(rate="1/2", block_symbols=n // 2)
        res = rx._host_tail(bits[c], None, n // 2)
        got = res.ts_packets
        assert len(got) >= 8, f"carrier {c}: only {len(got)} TS packets"
        sset = {r.tobytes() for r in sents[c]}
        matched = sum(1 for r in got if r.tobytes() in sset)
        assert matched >= len(got) - 16, f"carrier {c}: {matched}/{len(got)}"
