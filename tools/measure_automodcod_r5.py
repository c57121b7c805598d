#!/usr/bin/env python3
"""Bank auto-MODCOD on the REAL chip (VERDICT r4 #8): the 8-carrier
production bank (pallas FEC, cs4 ingest) starts configured QPSK 1/2
while the carriers transmit QPSK 2/3; the confidence-gated per-carrier
votes reach bank unanimity, the device program REBUILDS mid-stream on
the chip, and post-switch TS is byte-exact contiguous per carrier."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

C = 8


def main():
    import jax
    import jax.numpy as jnp
    t0 = time.time()
    jnp.arange(8.0).sum().block_until_ready()
    print(f"device claim: {time.time() - t0:.1f}s", flush=True)

    from dvbs_tpu.spec import modcod
    from dvbs_tpu.tx import dvbs2_mod, channel
    from dvbs_tpu.ops import frontend
    from dvbs_tpu.models.bank_stream import DVBS2BankStream
    from dvbs_tpu.parallel.mesh import bank_block_symbols

    TX_MC = 6          # carriers transmit QPSK 2/3 (same symbol geometry)
    SHORT = True
    block = bank_block_symbols(C, mc=4, short=SHORT)   # configured mc=4
    F_cfg = None

    sigs, sents = [], []
    for c in range(C):
        cfg = modcod.get_config(TX_MC, short=SHORT)
        pkts = dvbs2_mod.random_ts_packets(1400, seed=300 + 3 * c)
        bb = dvbs2_mod.ts_to_bbframes(pkts, cfg)
        tx = dvbs2_mod.bbframes_to_plframes(bb, cfg).reshape(-1)
        x = channel.shape(tx, sps=2)
        y = channel.impair(x, snr_db=8.0, cfo=(0.004 + 0.002 * c) * np.pi,
                           delay_samples=0.2 + 0.1 * c, sco_ppm=10.0,
                           seed=301 + 3 * c)
        sigs.append(frontend.pack_cs4(y))
        sents.append(pkts.reshape(-1, 188))
    slen = min(len(s) for s in sigs)
    print(f"signals: {slen} samples/carrier", flush=True)

    switches = []
    st = DVBS2BankStream(C, mc=4, short=SHORT, block_symbols=block,
                         fec="pallas", ingest="cs4", vote_frames=16,
                         on_modcod_switch=lambda cfg: switches.append(
                             (cfg.modcod, cfg.framesize, cfg.pilots)))
    outs = [bytearray() for _ in range(C)]
    n = 2 * block
    fed = 0
    t0 = time.time()
    while fed + n <= slen:
        for c, o in zip(st.feed([s[fed:fed + n] for s in sigs]), outs):
            o.extend(c)
        fed += n
        if len(switches) and fed // n >= (slen // n) - 1:
            break
    for c, o in zip(st.flush(), outs):
        o.extend(c)
    dt = time.time() - t0
    print(f"streamed {fed} samples/carrier in {dt:.1f}s; "
          f"switches: {switches}", flush=True)
    assert switches == [(TX_MC, "short", False)], switches
    assert st.cfg.modcod == TX_MC

    per_frame = st.cfg.kbch // 8 // 188
    total = 0
    for c in range(C):
        g = np.frombuffer(bytes(outs[c]), np.uint8)
        assert len(g) % 188 == 0
        gp = g.reshape(-1, 188)
        assert len(gp) > 0, f"c{c}: no TS"
        sb = sents[c].tobytes()
        i0 = sb.find(gp[0].tobytes())
        assert i0 >= 0 and i0 % 188 == 0, f"c{c}: first pkt not in TX"
        assert np.array_equal(gp, sents[c][i0 // 188:i0 // 188 + len(gp)]), \
            f"c{c}: not contiguous"
        total += len(gp)
        print(f"c{c}: {len(gp)} contiguous byte-exact packets", flush=True)
    assert total >= C * 2 * st.F * per_frame
    print("ON-CHIP BANK AUTO-MODCOD: vote -> rebuild -> contiguous TS OK",
          flush=True)


if __name__ == "__main__":
    main()
