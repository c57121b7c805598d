"""CLI runtime-control surface (--control): the stdin equivalent of the
reference's GUI menu + setSymbolrate/setSamplerate (main.cpp:217-249).
"""
import io
import os
import sys

import numpy as np
import pytest

from dvbs_tpu.spec import modcod
from dvbs_tpu.tx import dvbs2_mod, channel
from dvbs_tpu import cli


@pytest.fixture()
def capture(tmp_path):
    """Short-frame S2 capture at 2.7 samples/symbol with +0.2 offset."""
    cfg = modcod.get_config(4, short=True)
    pkts = dvbs2_mod.random_ts_packets(120, seed=5)
    bb = dvbs2_mod.ts_to_bbframes(pkts, cfg)
    tx = dvbs2_mod.bbframes_to_plframes(bb, cfg).reshape(-1)
    x = channel.shape(tx, sps=27)[::10]          # 2.7 sps
    t = np.arange(len(x))
    x = (x * np.exp(2j * np.pi * (0.2 / 2.7) * t)).astype(np.complex64)
    x = channel.impair(x, snr_db=12.0, seed=6)
    path = tmp_path / "cap.cf32"
    x.astype(np.complex64).tofile(path)
    return str(path), pkts.tobytes()


def _stdin_with(monkeypatch, text: str):
    """Real-fd stdin replacement (select() needs an actual pipe)."""
    r, w = os.pipe()
    os.write(w, text.encode())
    os.close(w)
    monkeypatch.setattr(sys, "stdin", os.fdopen(r, "r"))


def test_udp_live_ingest(tmp_path):
    """--iq udp://:port streams datagrams into the same block pipeline:
    a 2-sps capture sent over localhost UDP decodes to the transmitted
    TS, and the CLI exits on the idle timeout."""
    import socket
    import threading

    cfg = modcod.get_config(4, short=True)
    pkts = dvbs2_mod.random_ts_packets(120, seed=9)
    bb = dvbs2_mod.ts_to_bbframes(pkts, cfg)
    tx = dvbs2_mod.bbframes_to_plframes(bb, cfg).reshape(-1)
    y = channel.impair(channel.shape(tx, sps=2), snr_db=12.0, seed=10)
    raw = np.empty(2 * len(y), np.float32)
    raw[0::2], raw[1::2] = y.real, y.imag

    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.bind(("127.0.0.1", 0))          # pick a free port
    port = sock.getsockname()[1]
    sock.close()

    def sender():
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        data = raw.tobytes()
        step = 4096 * 8                   # 4k samples per datagram
        for lo in range(0, len(data), step):
            s.sendto(data[lo:lo + step], ("127.0.0.1", port))
        s.close()

    out = tmp_path / "out.ts"
    th = threading.Timer(1.0, sender)    # let the CLI bind first
    th.start()
    try:
        rc = cli.main(["--iq", f"udp://:{port}", "--mode", "s2",
                       "--modcod", "4", "--framesize", "short",
                       "--block-symbols", str(1 << 15),
                       "--udp-idle-timeout", "10",
                       "--out", str(out)])
    finally:
        th.join()
    assert rc == 0
    data = out.read_bytes()
    sent = pkts.tobytes()
    assert len(data) >= 188 * 10
    for lo in range(0, len(data) - 187, 188):
        assert data[lo:lo + 188] in sent


def test_control_commands_apply_and_decode(tmp_path, capture, monkeypatch):
    path, sent = capture
    out = tmp_path / "out.ts"
    # a benign rate re-command (same values: channelizer rebuild path),
    # a metrics dump, and an unknown command (error path)
    _stdin_with(monkeypatch, "metrics\nsymbolrate 1.0\nbogus\n")
    rc = cli.main(["--iq", path, "--mode", "s2", "--modcod", "4",
                   "--framesize", "short", "--samplerate", "2.7",
                   "--symbolrate", "1.0", "--offset", "0.2",
                   "--block-symbols", str(1 << 15),
                   "--out", str(out), "--control"])
    assert rc == 0
    data = out.read_bytes()
    assert len(data) >= 188 * 10
    for lo in range(0, len(data) - 187, 188):
        assert data[lo:lo + 188] in sent


def test_control_modcod_switch(tmp_path, capture, monkeypatch):
    """A runtime 'modcod' command reconfigures the stream (wrong modcod
    -> nothing decodes; the command is consumed before the first block)."""
    path, _ = capture
    out = tmp_path / "out.ts"
    _stdin_with(monkeypatch, "modcod 12 short nopilots\n")
    rc = cli.main(["--iq", path, "--mode", "s2", "--modcod", "4",
                   "--framesize", "short", "--samplerate", "2.7",
                   "--symbolrate", "1.0", "--offset", "0.2",
                   "--block-symbols", str(1 << 15),
                   "--out", str(out), "--control"])
    assert rc == 0
    assert out.read_bytes() == b""   # 8PSK 3/5 config cannot decode QPSK


def test_set_params_public_api():
    from dvbs_tpu.models.driver import DVBS2Stream
    s = DVBS2Stream(mc=4, short=True, block_symbols=1 << 15)
    s.set_params(mc=12)
    assert s.cfg.modcod == 12 and s.cfg.framesize == "short"
    s.set_params(pilots=True)
    assert s.cfg.modcod == 12 and s.cfg.framesize == "short"
    assert s.cfg.pilots
    # a framesize the block cannot hold is rejected cleanly
    import pytest as _pytest
    with _pytest.raises(ValueError):
        s.set_params(short=False)


def test_state_file_resume(tmp_path, capture):
    """--state-file: a receiver killed and restarted mid-capture
    continues the stream (same TS bytes as one uninterrupted run)."""
    path, sent = capture
    x = np.fromfile(path, np.complex64)

    ref_out = tmp_path / "ref.ts"
    cli.main(["--iq", path, "--format", "cf32", "--mode", "s2",
              "--modcod", "4", "--framesize", "short",
              "--block-symbols", str(1 << 15),
              "--samplerate", "2.7e6", "--symbolrate", "1e6",
              "--offset", "0.2e6",
              "--out", str(ref_out)])
    ref = ref_out.read_bytes()
    assert len(ref) >= 188 * 50 and sent.find(ref[:188 * 5]) >= 0

    cut = len(x) // 2
    a_path, b_path = tmp_path / "a.cf32", tmp_path / "b.cf32"
    x[:cut].tofile(a_path)
    x[cut:].tofile(b_path)
    st = tmp_path / "state.pkl"
    outs = []
    for p in (a_path, b_path):
        o = tmp_path / (p.stem + ".ts")
        cli.main(["--iq", str(p), "--format", "cf32", "--mode", "s2",
                  "--modcod", "4", "--framesize", "short",
                  "--block-symbols", str(1 << 15),
                  "--samplerate", "2.7e6", "--symbolrate", "1e6",
                  "--offset", "0.2e6",
                  "--state-file", str(st), "--out", str(o)])
        outs.append(o.read_bytes())
    assert outs[0] + outs[1] == ref, "restart-and-resume != uninterrupted"
