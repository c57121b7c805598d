"""Native C++ components vs the pure-Python references (byte-identical)."""
import subprocess
import numpy as np
import pytest

from dvbs_tpu.io import native
from dvbs_tpu.io.ts_deframer import TSDeframer as PyDeframer
from dvbs_tpu.io.bbframe_parser import BBFrameParser
from dvbs_tpu.spec import modcod, scrambling
from dvbs_tpu.tx import dvbs2_mod


@pytest.fixture(scope="module", autouse=True)
def build_native():
    subprocess.run(["make", "-C", "native"], check=True,
                   capture_output=True)
    assert native.available()


def _frame_bits(seed, n_frames=6, flip=None, invert=False):
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, (n_frames, 1632)).astype(np.uint8)
    frames[:, ::204] = 0x47
    frames[:, 0] = 0xB8
    stream = np.concatenate([rng.integers(0, 2, 777).astype(np.uint8),
                             np.unpackbits(frames.reshape(-1))])
    if invert:
        stream = 1 - stream
    if flip is not None:
        stream[flip] ^= 1
    return frames, stream


@pytest.mark.parametrize("invert", [False, True])
def test_deframer_native_matches_python(invert):
    frames, bits = _frame_bits(0, invert=invert)
    py, nat = PyDeframer(), native.NativeTSDeframer()
    # feed in uneven chunks to exercise state carry
    outs_p, outs_n = [], []
    for i in range(0, len(bits), 40000):
        outs_p.append(py.feed(bits[i:i + 40000]))
        outs_n.append(nat.feed(bits[i:i + 40000]))
    p = np.concatenate(outs_p)
    n = np.concatenate(outs_n)
    np.testing.assert_array_equal(p, n)
    assert len(p) >= len(frames) - 1
    assert nat.locked and nat.inverted == invert
    assert nat.frames_ok == py.frames_ok


def test_tsparser_native_matches_python():
    cfg = modcod.get_config(4, short=True)
    pkts = dvbs2_mod.random_ts_packets(120, seed=3)
    bb = scrambling.bb_scramble_bytes(dvbs2_mod.ts_to_bbframes(pkts, cfg))
    py = BBFrameParser(cfg.kbch)
    nat = native.NativeTSParser(cfg.kbch)
    out_p = b"".join(py.feed(bb[i:i + 1]) for i in range(len(bb)))
    out_n = b"".join(nat.feed(bb[i:i + 1]) for i in range(len(bb)))
    assert out_p == out_n
    assert len(out_p) > 0
    assert nat.last_bb_proc == py.last_bb_proc


def test_tsparser_native_resync_on_bad_frame():
    cfg = modcod.get_config(4, short=True)
    pkts = dvbs2_mod.random_ts_packets(200, seed=4)
    bb = scrambling.bb_scramble_bytes(dvbs2_mod.ts_to_bbframes(pkts, cfg))
    bad = bb.copy()
    bad[2, 40] ^= 0xFF
    py = BBFrameParser(cfg.kbch)
    nat = native.NativeTSParser(cfg.kbch)
    assert py.feed(bad) == nat.feed(bad)


def test_tsparser_native_gse_matches_python():
    """Native GSE->GRE path is byte-identical to the python parser,
    including fragmented PDUs across BBFRAME boundaries and mark_gap
    recovery."""
    from dvbs_tpu.tx import gse_mod
    cfg = modcod.get_config(4, short=True)
    rng = np.random.default_rng(7)
    pkts = []
    for i in range(40):
        pdu = rng.integers(0, 256, rng.integers(40, 800)).astype(
            np.uint8).tobytes()
        if i % 3 == 0:
            pkts += gse_mod.gse_packets_fragmented(pdu, frag_id=i % 8,
                                                   chunk=200)
        else:
            pkts.append(gse_mod.gse_packet_unfrag(pdu))
    bb = scrambling.bb_scramble_bytes(gse_mod.gse_to_bbframes(pkts, cfg.kbch))
    py = BBFrameParser(cfg.kbch)
    nat = native.NativeTSParser(cfg.kbch)
    out_p, out_n = b"", b""
    for i in range(len(bb)):
        if i == len(bb) // 2:       # simulate a lost frame mid-stream
            py.mark_gap()
            nat.mark_gap()
            continue
        out_p += py.feed(bb[i:i + 1])
        out_n += nat.feed(bb[i:i + 1])
    assert len(out_p) > 0
    assert out_p == out_n


def test_tsparser_native_gse_truncated_header():
    """A GSE header cut off by the data-field boundary must not read
    past the frame buffer (regression: heap OOB read) and must match
    the python parser byte for byte."""
    from tests.test_bbframe_parser import _truncated_gse_frames
    cfg = modcod.get_config(4, short=True)
    for trailer in (bytes([0b10110000 | 0x0F, 0xFF]),   # start, needs 7
                    bytes([0b01110000 | 0x0F, 0xFF]),   # end, needs 3
                    bytes([0b00110000 | 0x0F, 0xFF])):  # cont., needs 3
        frames = _truncated_gse_frames(cfg.kbch, trailer)
        py = BBFrameParser(cfg.kbch)
        nat = native.NativeTSParser(cfg.kbch)
        out_p = py.feed(frames)
        out_n = nat.feed(frames)
        assert out_p == out_n
        assert bytes([0xA5]) * 16 in out_n


def test_tsparser_native_gse_large_fragmented_pdu():
    """A PDU reassembled across many BBFRAMEs (30 KB in 200-byte
    fragments) is emitted in a single feed() call — regression for the
    output-capacity bound (the GRE flush used to assume the output
    never exceeds one frame's data field)."""
    from dvbs_tpu.tx import gse_mod
    cfg = modcod.get_config(4, short=True)
    rng = np.random.default_rng(11)
    pdu = rng.integers(0, 256, 30000).astype(np.uint8).tobytes()
    # a filler frame first: the resync after initial sync acquisition
    # enters frame 0 at its SYNCD (tail padding), so frame 0's packets
    # are sacrificial by design
    filler = [gse_mod.gse_packet_unfrag(b"\xAA" * 800)]
    pkts = filler + gse_mod.gse_packets_fragmented(pdu, frag_id=1,
                                                   chunk=200)
    bb = scrambling.bb_scramble_bytes(
        gse_mod.gse_to_bbframes(pkts, cfg.kbch))
    py = BBFrameParser(cfg.kbch)
    nat = native.NativeTSParser(cfg.kbch)
    out_p = b"".join(py.feed(bb[i:i + 1]) for i in range(len(bb)))
    out_n = b"".join(nat.feed(bb[i:i + 1]) for i in range(len(bb)))
    assert out_p == out_n
    assert pdu in out_p           # the whole PDU came through GRE-wrapped
