"""Streaming-driver tests: multi-block continuity, no lost frames."""
import numpy as np

from dvbs_tpu.spec import modcod
from dvbs_tpu.tx import dvbs2_mod, channel
from dvbs_tpu.models.driver import DVBS2Stream


def test_stream_recovers_full_ts():
    cfg = modcod.get_config(4, short=True)
    pkts = dvbs2_mod.random_ts_packets(800, seed=10)
    bb = dvbs2_mod.ts_to_bbframes(pkts, cfg)
    tx = dvbs2_mod.bbframes_to_plframes(bb, cfg).reshape(-1)
    x = channel.shape(tx, sps=2)
    y = channel.impair(x, snr_db=7.0, cfo=0.01 * np.pi, delay_samples=0.4,
                       sco_ppm=15.0, seed=11)
    stream = DVBS2Stream(mc=4, short=True, block_symbols=1 << 15)
    out = bytearray()
    step = 40000
    for i in range(0, len(y), step):
        out.extend(stream.feed(y[i:i + step]))
    got = np.frombuffer(bytes(out), np.uint8).reshape(-1, 188)
    sent = pkts.reshape(-1, 188)
    assert np.all(got[:, 0] == 0x47)
    # the emitted TS must be a long contiguous error-free run of the input
    assert len(got) >= len(sent) * 0.75, (len(got), len(sent))
    first = got[0].tobytes()
    offs = [i for i in range(len(sent)) if sent[i].tobytes() == first]
    assert offs, "first output packet not found in input"
    o = offs[0]
    np.testing.assert_array_equal(got, sent[o:o + len(got)])
    m = stream.metrics
    assert m.frames_ok == m.frames_seen
    assert m.detected_modcod == 4 and m.detected_shortframes

    # observability surface (profiling.PipelineStats): the driver's
    # always-on counters must reflect the run, and report() must carry
    # the stage clocks + the real per-frame LDPC trial histogram
    st = stream.stats
    assert st.blocks > 1
    assert st.frames_ok == m.frames_ok and st.frames_seen == m.frames_seen
    assert st.ts_bytes_out == len(out)
    assert sum(st.trial_hist.values()) == st.frames_seen
    assert max(st.trial_hist) <= 32 and min(st.trial_hist) >= 1
    rep = st.report()
    for token in ("blocks", "frames", "ldpc trials:", "dispatch",
                  "finalize"):
        assert token in rep, f"{token!r} missing from report:\n{rep}"
