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


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_grid_sharded_carriers_by_time():
    """2D {carrier: 4, time: 2} mesh: each carrier's halo ring is
    independent (DISTINCT per-carrier signals decode to their own
    streams), and each wrap-free shard matches the serial receiver."""
    from dvbs_tpu.parallel.timeshard import build_grid_sharded
    from dvbs_tpu.models.dvbs2 import DVBS2Receiver

    C, T = 4, 2
    mc, short, B = 4, True, 1 << 15
    step, example, mesh, A = build_grid_sharded(C, T, mc=mc, short=short,
                                                block_symbols=B)
    cfg = modcod.get_config(mc, short=short)
    sigs, bbs = [], []
    for c in range(C):
        pkts = dvbs2_mod.random_ts_packets(500, seed=30 + c)
        bb = dvbs2_mod.ts_to_bbframes(pkts, cfg)
        tx = dvbs2_mod.bbframes_to_plframes(bb, cfg).reshape(-1)
        x = channel.shape(tx, sps=2)
        y = channel.impair(x, snr_db=8.0, cfo=(0.002 + 0.002 * c) * np.pi,
                           delay_samples=0.1 * c, seed=40 + c)
        need = T * A + 2 * B - A        # shards + a full serial window
        assert len(y) >= need
        sigs.append(y[:need])
        bbs.append([fr.tobytes() for fr in bb])
    shards = np.stack([
        np.stack([np.stack([s[t * A:(t + 1) * A].real,
                            s[t * A:(t + 1) * A].imag])
                  for t in range(T)]) for s in sigs]).astype(np.float32)
    assert shards.shape == (C, T, 2, A)
    assert shards.shape == example.shape
    out = step(shards)
    ok = np.asarray(out["ldpc_ok"])                    # [C, T, F]
    hard = np.asarray(out["hard"])                     # [C, T, F, N]
    kbch = cfg.kbch
    rx = DVBS2Receiver(mc=mc, short=short, block_symbols=B)
    for c in range(C):                  # shard (c, 0) is wrap-free
        assert ok[c, 0].all(), f"carrier {c}: {ok[c, 0]}"
        got = [np.packbits(hard[c, 0, f, :kbch]).tobytes()
               for f in range(hard.shape[2])]
        sent = bbs[c]
        first = sent.index(got[0])
        assert got == sent[first:first + len(got)], \
            f"carrier {c} did not decode its own stream"
        # and matches the serial receiver on the same window
        ref = rx.process_symbols_block(sigs[c][:2 * B])
        assert ref.frame_ok.all()
    # cross-carrier distinctness (a broadcast bug would alias carriers)
    assert not np.array_equal(hard[0, 0], hard[1, 0])
