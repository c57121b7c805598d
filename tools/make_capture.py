#!/usr/bin/env python3
"""Generate a DVB-S/S2 IQ capture with the TX oracle (test-vector maker).

Examples:
  python tools/make_capture.py --mode s2 --modcod 4 --framesize short \
      --packets 600 --snr 6 --cfo 0.02 --out capture.cf32 --ts sent.ts
  python tools/make_capture.py --mode s --rate 3/4 --groups 60 \
      --snr 9 --out dvbs.cf32 --ts sent.ts

The capture is interleaved float32 IQ at 2 samples/symbol — feed it back
with `python -m dvbs_tpu.cli --iq capture.cf32 ...` and compare the output
to the --ts file.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from dvbs_tpu.spec import modcod  # noqa: E402
from dvbs_tpu.tx import dvbs2_mod, dvbs_mod, channel  # noqa: E402
from dvbs_tpu.io.source import write_iq_file  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["s", "s2"], default="s2")
    ap.add_argument("--modcod", type=int, default=4)
    ap.add_argument("--framesize", choices=["normal", "short"],
                    default="short")
    ap.add_argument("--pilots", action="store_true")
    ap.add_argument("--rate", default="1/2", help="DVB-S code rate")
    ap.add_argument("--packets", type=int, default=600)
    ap.add_argument("--groups", type=int, default=60,
                    help="DVB-S 8-packet dispersal groups")
    ap.add_argument("--snr", type=float, default=None, help="Es/N0 dB")
    ap.add_argument("--cfo", type=float, default=0.0,
                    help="carrier offset, fraction of symbol rate")
    ap.add_argument("--phase", type=float, default=0.0)
    ap.add_argument("--sco-ppm", type=float, default=0.0)
    ap.add_argument("--delay", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", required=True)
    ap.add_argument("--ts", default=None, help="also save the TS bytes")
    a = ap.parse_args(argv)

    if a.mode == "s2":
        cfg = modcod.get_config(a.modcod, short=a.framesize == "short",
                                pilots=a.pilots)
        ts = dvbs2_mod.random_ts_packets(a.packets, seed=a.seed)
        bb = dvbs2_mod.ts_to_bbframes(ts, cfg)
        syms = dvbs2_mod.bbframes_to_plframes(bb, cfg).reshape(-1)
    else:
        ts = dvbs_mod.random_ts_groups(a.groups, seed=a.seed)
        syms = dvbs_mod.DVBSModulator(rate=a.rate).ts_to_symbols(ts)

    x = channel.shape(syms, sps=2)
    y = channel.impair(x, snr_db=a.snr, cfo=a.cfo * 2 * np.pi / 2,
                       phase=a.phase, sco_ppm=a.sco_ppm,
                       delay_samples=a.delay, seed=a.seed + 1)
    write_iq_file(a.out, y)
    if a.ts:
        np.asarray(ts, np.uint8).tofile(a.ts)
    print(f"wrote {a.out}: {len(y)} samples "
          f"({len(ts) // 188} TS packets, mode {a.mode})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
