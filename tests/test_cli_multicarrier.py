"""Multi-carrier CLI: one wideband capture -> N per-carrier receivers
through the channelizer bank (the reference needs one plugin instance
per carrier, main.cpp:30)."""
import numpy as np

from dvbs_tpu.spec import modcod
from dvbs_tpu.tx import dvbs2_mod, channel
from dvbs_tpu import cli


def _carrier_iq(seed: int) -> tuple[np.ndarray, bytes]:
    cfg = modcod.get_config(4, short=True)
    pkts = dvbs2_mod.random_ts_packets(100, seed=seed)
    bb = dvbs2_mod.ts_to_bbframes(pkts, cfg)
    tx = dvbs2_mod.bbframes_to_plframes(bb, cfg).reshape(-1)
    x = channel.shape(tx, sps=25)[::5]           # 5 samples/symbol
    return x, pkts.tobytes()


def test_two_carrier_wideband_decode(tmp_path):
    # two QPSK 1/2 short carriers at -1.2 and +1.3 (symbolrate 1.0)
    # inside a 5.0-rate wideband capture
    a, sent_a = _carrier_iq(21)
    b, sent_b = _carrier_iq(22)
    n = min(len(a), len(b))
    t = np.arange(n)
    wide = (a[:n] * np.exp(2j * np.pi * (-1.2 / 5.0) * t) +
            b[:n] * np.exp(2j * np.pi * (+1.3 / 5.0) * t)
            ).astype(np.complex64)
    wide = channel.impair(wide, snr_db=18.0, seed=23)
    path = tmp_path / "wide.cf32"
    wide.tofile(path)
    out = tmp_path / "out.ts"
    rc = cli.main(["--iq", str(path), "--mode", "s2", "--modcod", "4",
                   "--framesize", "short",
                   "--samplerate", "5.0", "--symbolrate", "1.0",
                   "--offset", "-1.2", "--carrier", "1.3:1.0",
                   "--block-symbols", str(1 << 15),
                   "--out", str(out)])
    assert rc == 0
    d0 = out.read_bytes()
    d1 = (tmp_path / "out.ts.c1").read_bytes()
    assert len(d0) >= 188 * 8 and len(d1) >= 188 * 8
    for lo in range(0, len(d0) - 187, 188):
        assert d0[lo:lo + 188] in sent_a
    for lo in range(0, len(d1) - 187, 188):
        assert d1[lo:lo + 188] in sent_b
    # carriers are independent: outputs differ
    assert d0[:188] != d1[:188]


def test_two_carrier_dvbs_bank(tmp_path):
    """mode=s with --carrier and --rate routes through the fused
    DVBSBankStream (one device program for both carriers)."""
    from dvbs_tpu.tx import dvbs_mod
    from dvbs_tpu.tx import channel as ch

    def carrier(seed):
        ts = dvbs_mod.random_ts_groups(30, seed=seed)
        x = ch.shape(dvbs_mod.DVBSModulator(rate="1/2").ts_to_symbols(ts),
                     sps=10)[::2]               # 5 samples/symbol wideband
        return x, ts.tobytes()

    a, sent_a = carrier(51)
    b, sent_b = carrier(52)
    n = min(len(a), len(b))
    t = np.arange(n)
    wide = (a[:n] * np.exp(2j * np.pi * (-1.1 / 5.0) * t) +
            b[:n] * np.exp(2j * np.pi * (+1.4 / 5.0) * t)
            ).astype(np.complex64)
    wide = channel.impair(wide, snr_db=20.0, seed=53)
    path = tmp_path / "wide_s.cf32"
    wide.tofile(path)
    out = tmp_path / "out_s.ts"
    rc = cli.main(["--iq", str(path), "--mode", "s", "--rate", "1/2",
                   "--samplerate", "5.0", "--symbolrate", "1.0",
                   "--offset", "-1.1", "--carrier", "1.4:1.0",
                   "--block-symbols", str(1 << 15),
                   "--out", str(out)])
    assert rc == 0
    d0 = out.read_bytes()
    d1 = (tmp_path / "out_s.ts.c1").read_bytes()
    assert len(d0) >= 188 * 20 and len(d1) >= 188 * 20
    for lo in range(0, len(d0) - 187, 188):
        assert d0[lo:lo + 188] in sent_a
    for lo in range(0, len(d1) - 187, 188):
        assert d1[lo:lo + 188] in sent_b
    assert d0[:188] != d1[:188]
