"""Tests for the host BBFRAME -> TS / GSE->GRE parser."""
import numpy as np
import pytest

from dvbs_tpu.spec import modcod, scrambling, bbheader
from dvbs_tpu.tx import dvbs2_mod, gse_mod
from dvbs_tpu.io.bbframe_parser import BBFrameParser, crc32_checksum


def _plaintext_bbframes(pkts, cfg, state=None):
    bb = dvbs2_mod.ts_to_bbframes(pkts, cfg, state)
    return scrambling.bb_scramble_bytes(bb)


def test_ts_roundtrip_exact():
    cfg = modcod.get_config(4, short=True)
    pkts = dvbs2_mod.random_ts_packets(100, seed=0)
    frames = _plaintext_bbframes(pkts, cfg)
    p = BBFrameParser(cfg.kbch)
    out = p.feed(frames)
    assert len(out) % 188 == 0
    got = np.frombuffer(out, np.uint8).reshape(-1, 188)
    assert np.all(got[:, 0] == 0x47)
    sent = pkts.reshape(-1, 188)
    # first packet may be skipped by initial sync; all emitted must match a
    # contiguous run of sent packets
    n = len(got)
    assert n >= len(frames) * ((cfg.kbch - 80) // 8) // 188 - 2
    for off in range(3):
        if np.array_equal(got, sent[off:off + n]):
            break
    else:
        raise AssertionError("TS output is not a contiguous run of input")


def test_ts_resync_after_bad_frame():
    cfg = modcod.get_config(4, short=True)
    pkts = dvbs2_mod.random_ts_packets(200, seed=1)
    frames = _plaintext_bbframes(pkts, cfg)
    # corrupt frame 2 (CRC fails -> dropped, parser must resync via SYNCD)
    bad = frames.copy()
    bad[2, 40] ^= 0xFF
    p = BBFrameParser(cfg.kbch)
    out = p.feed(bad)
    got = np.frombuffer(out, np.uint8).reshape(-1, 188)
    assert np.all(got[:, 0] == 0x47)
    sent_set = {bytes(r.tobytes()) for r in pkts.reshape(-1, 188)}
    matches = sum(1 for r in got if r.tobytes() in sent_set)
    # everything emitted after resync must be a real packet
    assert matches >= len(got) - 1
    assert p.synched


def test_ts_partial_packet_across_frames():
    cfg = modcod.get_config(4, short=True)
    df_bytes = (cfg.kbch - 80) // 8
    assert df_bytes % 188 != 0  # precondition for the test to be meaningful
    pkts = dvbs2_mod.random_ts_packets(60, seed=2)
    frames = _plaintext_bbframes(pkts, cfg)
    p = BBFrameParser(cfg.kbch)
    # feed frame by frame: reassembly state must carry across calls
    outs = b"".join(p.feed(frames[i:i + 1]) for i in range(len(frames)))
    got = np.frombuffer(outs, np.uint8).reshape(-1, 188)
    sent = pkts.reshape(-1, 188)
    assert np.array_equal(got, sent[:len(got)])


def test_gse_unfragmented_roundtrip():
    cfg = modcod.get_config(4, short=True)
    pdus = [bytes([i + 1]) * (50 + i) for i in range(8)]
    pkts = [gse_mod.gse_packet_unfrag(p, 0x0800) for p in pdus]
    frames = scrambling.bb_scramble_bytes(
        gse_mod.gse_to_bbframes(pkts, cfg.kbch))
    parser = BBFrameParser(cfg.kbch)
    parser.synched = True   # steady state: resync-frame loss tested in interop
    out = parser.feed(frames)
    # parse GRE stream back
    buf = memoryview(out)
    recovered = []
    i = 0
    while i < len(buf):
        assert buf[i] == 0 and buf[i + 1] == 0
        proto = (buf[i + 2] << 8) | buf[i + 3]
        assert proto == 0x0800
        # GRE has no length field; PDUs here are distinguishable by content
        i += 4
        start = i
        # consume until next GRE header (all our pdus are constant-byte)
        b0 = buf[start]
        ln = 0
        while i < len(buf) and buf[i] == b0:
            i += 1
            ln += 1
        recovered.append(bytes(buf[start:start + ln]))
    assert recovered == pdus


def test_gse_fragmented_roundtrip():
    cfg = modcod.get_config(4, short=True)
    rng = np.random.default_rng(3)
    pdu = rng.integers(0, 256, 4000).astype(np.uint8).tobytes()
    pkts = gse_mod.gse_packets_fragmented(pdu, frag_id=5, chunk=700)
    assert len(pkts) > 3
    frames = scrambling.bb_scramble_bytes(
        gse_mod.gse_to_bbframes(pkts, cfg.kbch))
    parser = BBFrameParser(cfg.kbch)
    parser.synched = True   # steady state: resync-frame loss tested in interop
    out = parser.feed(frames)
    assert not parser.last_gse_crc_err
    assert out[:2] == b"\x00\x00"
    assert out[2:4] == b"\x08\x00"
    assert out[4:] == pdu


def test_gse_crc_error_detected():
    cfg = modcod.get_config(4, short=True)
    pdu = bytes(range(256)) * 4
    pkts = gse_mod.gse_packets_fragmented(pdu, frag_id=1, chunk=300)
    # corrupt a middle fragment payload byte
    mid = bytearray(pkts[1])
    mid[10] ^= 1
    pkts[1] = bytes(mid)
    frames = scrambling.bb_scramble_bytes(
        gse_mod.gse_to_bbframes(pkts, cfg.kbch))
    parser = BBFrameParser(cfg.kbch)
    parser.synched = True   # steady state: resync-frame loss tested in interop
    out = parser.feed(frames)
    assert parser.last_gse_crc_err
    assert out == b""


def _truncated_gse_frames(kbch: int, trailer: bytes) -> np.ndarray:
    """Two plain (descrambled) GSE BBFRAMEs: an all-padding filler (sync
    acquisition) then a frame whose data field ends EXACTLY with
    `trailer` — a GSE header cut off by the frame boundary. A full
    unfragmented packet fills everything before it, so the data-field
    walk lands on the truncated header with no room for its body."""
    from dvbs_tpu.spec import bbheader
    from dvbs_tpu.tx import gse_mod
    df_bytes = (kbch - 80) // 8
    pkt = gse_mod.gse_packet_unfrag(b"\xA5" * (df_bytes - len(trailer) - 4))
    df = pkt + trailer
    assert len(df) == df_bytes
    out = np.zeros((2, kbch // 8), np.uint8)
    hdr = bbheader.BBHeader(ts_gs=bbheader.TS_GS_GENERIC_CONTINUOUS,
                            upl=0, dfl=kbch - 80, sync=0,
                            syncd=kbch - 80 - 16)
    out[0, :10] = hdr.pack()                      # filler: all padding
    out[1, :10] = hdr.pack()
    out[1, 10:] = np.frombuffer(df, np.uint8)
    return out


@pytest.mark.parametrize("trailer", [
    bytes([0b10110000 | 0x0F, 0xFF]),   # start fragment, needs >=7 bytes
    bytes([0b01110000 | 0x0F, 0xFF]),   # end fragment, needs >=3
    bytes([0b00110000 | 0x0F, 0xFF]),   # continuation, needs >=3
])
def test_gse_truncated_header_at_frame_end(trailer):
    """A GSE header whose body is cut off by the data-field boundary
    (e.g. after a BCH miscorrection) must not index past the frame —
    regression for an out-of-bounds read; the parser leaves the frame
    and keeps working."""
    cfg = modcod.get_config(4, short=True)
    frames = _truncated_gse_frames(cfg.kbch, trailer)
    parser = BBFrameParser(cfg.kbch)
    out = parser.feed(frames)                     # must not raise
    # the full unfragmented packet before the trailer still comes out
    assert bytes([0xA5]) * 16 in out
    # and the parser still works on a following clean frame
    pdu = bytes(range(200))
    nxt = scrambling.bb_scramble_bytes(gse_mod.gse_to_bbframes(
        [gse_mod.gse_packet_unfrag(pdu)], cfg.kbch))   # descrambled
    out2 = parser.feed(nxt)
    assert pdu in out2


def test_crc32_vector():
    # independent check: CRC-32/BZIP2 (poly 0x04C11DB7, init per caller)
    import binascii
    data = np.frombuffer(b"123456789", np.uint8)
    ours = crc32_checksum(data, 0xFFFFFFFF) ^ 0xFFFFFFFF
    assert ours == 0xFC891918  # CRC-32/BZIP2 check value
