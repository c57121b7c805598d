"""Streaming driver: sample FIFO -> block receiver -> BBFRAME parser.

Host-side orchestration equivalent of the reference's plugin shell
(main.cpp): feeds fixed-size blocks to the jitted receiver, maintains
frame-boundary continuity across blocks, runs the BBFrame TS/GSE parser,
aggregates the GUI metric set (SURVEY.md sec. 3.5) and applies the
50-frame auto-MODCOD consistency vote (main.cpp:375-408).
"""
from __future__ import annotations

import collections
import dataclasses

import numpy as np

from ..spec import modcod
from ..io.bbframe_parser import BBFrameParser
from .dvbs2 import DVBS2Receiver


@dataclasses.dataclass
class Metrics:
    """Rolling metric set mirroring the reference GUI's fields."""
    pl_sync_best_match: float = 0.0
    ldpc_trials: int = 0
    bch_corrections: int = 0
    bch_quality: float = 100.0       # 100 - corrections*0.1 (main.cpp:468-476)
    detected_modcod: int = 0
    detected_shortframes: bool = False
    detected_pilots: bool = False
    frames_seen: int = 0
    frames_ok: int = 0
    bbframes_processed: int = 0
    bbframes_total: int = 0
    coarse_cfo: float = 0.0
    last_header: object = None    # bbheader.BBHeader of the latest BBFRAME
                                  # (MPEGTS/GSE, SIS/MIS, CCM/ACM, ISSY,
                                  # NPD, rolloff — main.cpp:495-500)


class DVBS2Stream:
    """Continuous DVB-S2 demodulation with auto-MODCOD support."""

    GUARD = 64

    def __init__(self, mc: int = 4, short: bool = False, pilots: bool = False,
                 block_symbols: int = 1 << 17, auto_modcod: bool = False,
                 max_ldpc_trials: int = 32):
        self.auto_modcod = auto_modcod
        self.block_symbols = block_symbols
        self.max_ldpc_trials = max_ldpc_trials
        self._fifo = np.zeros(0, np.complex64)
        self._vote = collections.deque(maxlen=50)
        self.metrics = Metrics()
        self._configure(mc, short, pilots)

    def _configure(self, mc: int, short: bool, pilots: bool):
        self.rx = DVBS2Receiver(mc=mc, short=short, pilots=pilots,
                                block_symbols=self.block_symbols,
                                max_ldpc_trials=self.max_ldpc_trials)
        self.cfg = self.rx.cfg
        self.parser = BBFrameParser(self.cfg.kbch)

    def feed(self, samples: np.ndarray) -> bytes:
        """Feed 2-sps samples; returns TS/GRE bytes produced."""
        self._fifo = np.concatenate([self._fifo,
                                     np.asarray(samples, np.complex64)])
        out = bytearray()
        n = 2 * self.block_symbols
        while len(self._fifo) >= n:
            res = self.rx.process_symbols_block(self._fifo[:n])
            out.extend(self.parser.feed(res.bbframes))
            self._update_metrics(res)
            self._maybe_switch_modcod(res)
            # consume up to (last frame end - margin - guard) so the next
            # block's first boundary falls inside the locate window
            last_end = int(res.last_frame_end)
            adv = 2 * max(last_end - self.rx.edge_margin - self.GUARD,
                          self.cfg.plframe_len)   # floor guarantees progress
            self._fifo = self._fifo[adv:]
        return bytes(out)

    def _update_metrics(self, res):
        m = self.metrics
        m.pl_sync_best_match = float(res.sync_quality.mean())
        m.ldpc_trials = int(res.ldpc_trials.max(initial=0))
        good = res.bch_corrections[res.bch_corrections >= 0]
        m.bch_corrections = int(good.max(initial=0))
        m.bch_quality = max(0.0, 100.0 - float(good.mean()) * 0.1) \
            if len(good) else 0.0
        m.frames_seen += len(res.frame_ok)
        m.frames_ok += int(res.frame_ok.sum())
        m.bbframes_total = self.parser.last_bb_cnt
        m.bbframes_processed = self.parser.last_bb_proc
        m.last_header = self.parser.last_header
        m.coarse_cfo = res.coarse_cfo
        if len(res.detected_pls):
            pls = int(np.bincount(res.detected_pls).argmax())
            m.detected_modcod = (pls >> 2) & 0x1F
            m.detected_shortframes = bool((pls >> 1) & 1)
            m.detected_pilots = bool(pls & 1)

    # -- loop-state checkpointing (SURVEY.md sec. 5: all mutable DSP state
    # is a small pytree; config + this dict give seamless restart) --------
    def get_state(self) -> dict:
        return dict(pls_code=self.cfg.pls_code,
                    vote=list(self._vote),
                    fifo=self._fifo.copy(),
                    parser_count=self.parser.count,
                    parser_partial=self.parser.partial.copy(),
                    parser_synched=self.parser.synched)

    def set_state(self, st: dict):
        cfg = modcod.from_pls_code(st["pls_code"])
        self._configure(cfg.modcod, cfg.framesize == "short", cfg.pilots)
        self._vote = collections.deque(st["vote"], maxlen=50)
        self._fifo = st["fifo"].copy()
        self.parser.count = st["parser_count"]
        self.parser.partial = st["parser_partial"].copy()
        self.parser.synched = st["parser_synched"]

    def _maybe_switch_modcod(self, res):
        """50-frame consistency vote (main.cpp:383-408).

        Only confident detections vote: while misconfigured (wrong frame
        length), the locator lands off-SOF on some frames and their PLS
        reads are noise — the soft-correlation confidence separates them.
        """
        conf = res.detected_pls_conf if res.detected_pls_conf is not None \
            else np.ones(len(res.detected_pls))
        for pls, c in zip(res.detected_pls, conf):
            if c >= 0.7:
                self._vote.append(int(pls))
        if not self.auto_modcod or len(self._vote) < 50:
            return
        # 90% supermajority (the reference requires strict unanimity over
        # every frame, main.cpp:383-395, but its per-frame re-correlation
        # never sees misaligned frames; our block locator does while the
        # configured frame length is wrong, so near-miss codewords occur)
        vals, counts = np.unique(np.array(self._vote), return_counts=True)
        top = int(vals[counts.argmax()])
        if counts.max() >= 45 and top != self.cfg.pls_code and \
                (top >> 2) in range(1, 29):
            mc, short, pilots = (top >> 2), bool(top & 2), bool(top & 1)
            try:
                self._configure(mc, short, pilots)
                self._vote.clear()
            except ValueError:
                pass
