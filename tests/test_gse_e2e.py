"""GSE mode end to end over RF: PDUs -> GSE BBFRAMEs -> channel -> GRE."""
import numpy as np

from dvbs_tpu.spec import modcod, bbheader
from dvbs_tpu.tx import dvbs2_mod, gse_mod, channel
from dvbs_tpu.models.driver import DVBS2Stream


def test_gse_stream_over_rf():
    cfg = modcod.get_config(4, short=True)
    rng = np.random.default_rng(0)
    pdus = [rng.integers(1, 256, 300 + 17 * i).astype(np.uint8).tobytes()
            for i in range(20)]
    pkts = []
    for i, p in enumerate(pdus):
        if i % 3 == 0 and len(p) > 400:
            pkts += gse_mod.gse_packets_fragmented(p, frag_id=i % 8,
                                                   chunk=200)
        else:
            pkts.append(gse_mod.gse_packet_unfrag(p))
    bb = gse_mod.gse_to_bbframes(pkts, cfg.kbch)
    # repeat the content so every PDU also appears mid-stream (first/last
    # frames fall outside the locator margins / FIFO tail)
    bb = np.concatenate([bb, bb, bb])
    frames = dvbs2_mod.bbframes_to_plframes(bb, cfg).reshape(-1)
    x = channel.shape(frames, sps=2)
    y = channel.impair(x, snr_db=8.0, cfo=0.005 * np.pi, delay_samples=0.3,
                       seed=1)
    stream = DVBS2Stream(mc=4, short=True, block_symbols=1 << 15)
    out = bytearray()
    for i in range(0, len(y), 120000):
        out.extend(stream.feed(y[i:i + 120000]))
    assert len(out) > 0
    # GRE stream: every PDU appears wrapped with proto 0x0800
    blob = bytes(out)
    found = sum(1 for p in pdus if (b"\x00\x00\x08\x00" + p) in blob)
    assert found == len(pdus), f"only {found}/{len(pdus)} PDUs recovered"
    # header metrics reflect GSE mode
    assert stream.metrics.last_header.ts_gs == bbheader.TS_GS_GENERIC_CONTINUOUS


def test_stream_checkpoint_roundtrip():
    from dvbs_tpu.tx import dvbs2_mod as m
    cfg = modcod.get_config(4, short=True)
    pkts = m.random_ts_packets(400, seed=3)
    bb = m.ts_to_bbframes(pkts, cfg)
    tx = m.bbframes_to_plframes(bb, cfg).reshape(-1)
    y = channel.impair(channel.shape(tx, 2), snr_db=10.0, seed=4)
    s1 = DVBS2Stream(mc=4, short=True, block_symbols=1 << 15)
    half = len(y) // 2
    out1 = s1.feed(y[:half])
    st = s1.get_state()
    # resume in a fresh object
    s2 = DVBS2Stream(mc=4, short=True, block_symbols=1 << 15)
    s2.set_state(st)
    out2 = s2.feed(y[half:])
    # continuation: combined output is a contiguous run of the input TS
    got = np.frombuffer(out1 + out2, np.uint8)
    got = got[:len(got) // 188 * 188].reshape(-1, 188)
    sent = pkts.reshape(-1, 188)
    first = got[0].tobytes()
    offs = [i for i in range(len(sent)) if sent[i].tobytes() == first]
    assert offs
    np.testing.assert_array_equal(got, sent[offs[0]:offs[0] + len(got)])
