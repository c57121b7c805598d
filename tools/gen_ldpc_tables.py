#!/usr/bin/env python3
"""Generate the DVB-S2 LDPC parity-address tables as an .npz data file.

The tables are pure standards data: ETSI EN 302 307-1 V1.4.1, Annex B
(tables B.1-B.11, normal FECFRAME N=64800) and Annex C (tables C.1-C.10,
short FECFRAME N=16200).  Each table lists, for every group of 360
information bits, the parity-accumulator addresses of the group's first
bit; bit m of a group uses addresses (x + m*q) mod (N-K) with
q = (N-K)/360 (EN 302 307-1 sec. 5.3.2.1).

This script extracts the numeric data from the vendored copy of those
tables in the reference implementation
(/root/reference/src/demod/dvbs2/codings/xdsopl-ldpc-pabr/dvb_s2_tables.hh,
which itself states it copied them from the DVB-S2 standard PDF) and
re-emits them in our own compact format:

    for table T:  T_rows  : int32 [num_rows, deg_max]  (padded with -1)
                  T_deg   : int32 [num_rows]           (row degree)
                  T_NKM   : int32 [3] = (N, K, M)

Run once; the output dvbs_tpu/spec/data/dvb_s2_tables.npz is committed.
"""
import re
import sys
import numpy as np

SRC = "/root/reference/src/demod/dvbs2/codings/xdsopl-ldpc-pabr/dvb_s2_tables.hh"
OUT = "/root/repo/dvbs_tpu/spec/data/dvb_s2_tables.npz"


def parse_tables(text):
    tables = {}
    # Split on struct definitions
    for m in re.finditer(r"struct\s+(DVB_S2_TABLE_[BC]\d+)\s*\{(.*?)\n\};", text, re.S):
        name, body = m.group(1), m.group(2)

        def const(key):
            mm = re.search(r"static const int %s = (\d+);" % key, body)
            return int(mm.group(1))

        N, K, M = const("N"), const("K"), const("M")

        def arr(key):
            mm = re.search(r"int %s\[\] = \{(.*?)\};" % key, body, re.S)
            return [int(x) for x in re.findall(r"-?\d+", mm.group(1))]

        deg = arr("DEG")
        length = arr("LEN")
        pos = arr("POS")

        # expand DEG/LEN runs into per-row degrees
        row_degs = []
        for d, l in zip(deg, length):
            if d == 0:
                break
            row_degs.extend([d] * l)
        deg_max = max(row_degs)
        rows = np.full((len(row_degs), deg_max), -1, dtype=np.int32)
        p = 0
        for r, d in enumerate(row_degs):
            rows[r, :d] = pos[p:p + d]
            p += d
        assert p == len(pos), (name, p, len(pos))
        # sanity: addresses < N-K
        assert rows.max() < N - K
        assert (N - K) % M == 0
        # number of rows must equal K/M
        assert len(row_degs) == K // M, (name, len(row_degs), K // M)
        tables[name] = dict(rows=rows, deg=np.array(row_degs, np.int32),
                            NKM=np.array([N, K, M], np.int32))
    return tables


def main():
    text = open(SRC).read()
    tables = parse_tables(text)
    # The plugin uses B1..B11 and C1..C10 (EN 302 307-1 only; the vendored
    # S2X/T2 tables are unused by the reference plugin).
    want = ["DVB_S2_TABLE_B%d" % i for i in range(1, 12)] + \
           ["DVB_S2_TABLE_C%d" % i for i in range(1, 11)]
    out = {}
    for name in want:
        t = tables[name]
        short = name.replace("DVB_S2_TABLE_", "")
        out[short + "_rows"] = t["rows"]
        out[short + "_deg"] = t["deg"]
        out[short + "_NKM"] = t["NKM"]
    np.savez_compressed(OUT, **out)
    print("wrote", OUT, "with", len(want), "tables")
    for name in want:
        t = tables[name]
        print(" ", name, "N,K,M=", t["NKM"], "rows=", t["rows"].shape)


if __name__ == "__main__":
    sys.exit(main())
