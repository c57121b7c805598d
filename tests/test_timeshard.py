"""Time-block sharding over an 8-device CPU mesh: halo exchange makes
each shard's decode exactly equal to the serial streaming blocks."""
import numpy as np
import pytest
import jax

from dvbs_tpu.spec import modcod
from dvbs_tpu.tx import dvbs2_mod, channel


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_time_sharded_equals_serial_blocks():
    from dvbs_tpu.parallel.timeshard import build_time_sharded
    from dvbs_tpu.models.dvbs2 import DVBS2Receiver

    D = 8
    mc, short, B = 4, True, 1 << 15
    step, example, mesh, A = build_time_sharded(D, mc=mc, short=short,
                                                block_symbols=B)

    cfg = modcod.get_config(mc, short=short)
    pkts = dvbs2_mod.random_ts_packets(1600, seed=21)
    bb = dvbs2_mod.ts_to_bbframes(pkts, cfg)
    tx = dvbs2_mod.bbframes_to_plframes(bb, cfg).reshape(-1)
    x = channel.shape(tx, sps=2)
    y = channel.impair(x, snr_db=8.0, cfo=0.006 * np.pi, delay_samples=0.3,
                       seed=22)
    need = D * A + (2 * B - A)          # shards + the wrap halo's worth
    assert len(y) >= need, f"signal too short: {len(y)} < {need}"

    sl = y[:D * A]
    shards = np.stack([np.stack([sl[d * A:(d + 1) * A].real,
                                 sl[d * A:(d + 1) * A].imag])
                       for d in range(D)]).astype(np.float32)
    # normalize like dispatch_block does (per-shard scale is fine: AGC
    # renormalizes on device)
    out = step(shards)
    ok = np.asarray(out["ldpc_ok"])                    # [D, F]
    hard = np.asarray(out["hard"])                     # [D, F, N]
    starts = np.asarray(out["starts"])                 # [D, F]

    # serial reference: the same windows through the plain receiver
    rx = DVBS2Receiver(mc=mc, short=short, block_symbols=B)
    n = 2 * B
    for d in range(D - 1):              # last shard reads wrapped halo
        res_dev_ok, res_dev_hard = ok[d], hard[d]
        window = y[d * A: d * A + n]
        ref = rx.process_symbols_block(window)
        assert res_dev_ok.all(), f"shard {d}: {res_dev_ok}"
        assert ref.frame_ok.all()
        # frame starts must match the serial locator exactly
        np.testing.assert_array_equal(
            starts[d], np.asarray(ref.last_frame_end) -
            rx.cfg.plframe_len - np.arange(rx.n_frames - 1, -1, -1) *
            rx.cfg.plframe_len)

    # decoded frames across shards must reproduce the transmitted
    # BBFRAME sequence contiguously: no gap, no duplicate at any shard
    # boundary (bb is the TX oracle's scrambled [n, kbch/8] array)
    kbch = cfg.kbch
    got = [np.packbits(hard[d, f, :kbch]).tobytes()
           for d in range(D - 1) for f in range(hard.shape[1])]
    sent = [fr.tobytes() for fr in bb]
    first = sent.index(got[0])
    assert got == sent[first:first + len(got)], \
        "shard outputs are not the contiguous transmitted BBFRAME sequence"
