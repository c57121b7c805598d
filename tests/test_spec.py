"""Unit tests for the standards layer (dvbs_tpu.spec)."""
import numpy as np
import pytest

from dvbs_tpu.spec import (modcod, plheader, scrambling, gf2m, bch_spec,
                           ldpc_spec, constellations, interleaver)


# ---------------------------------------------------------------------------
# modcod tables
# ---------------------------------------------------------------------------

def test_modcod_roundtrip():
    for mc in range(1, 29):
        for short in (False, True):
            if short and modcod._MODCODS[mc][1] == "9/10":
                continue
            cfg = modcod.get_config(mc, short=short, pilots=False)
            assert modcod.get_modcod(cfg.constellation, cfg.rate) == mc
            assert cfg.nbch == cfg.kbch + bch_spec.num_parity_bits(
                cfg.framesize, cfg.bch_t)
            # LDPC info length equals nbch
            code = ldpc_spec.get_code(cfg.ldpc_table)
            assert code.K == cfg.nbch
            assert code.N == cfg.nldpc


def test_pls_code_format():
    cfg = modcod.get_config(4, short=True, pilots=True)
    assert cfg.pls_code == (4 << 2) | 2 | 1
    assert modcod.from_pls_code(cfg.pls_code) == cfg


def test_pilot_blocks():
    # QPSK normal: 360 slots -> pilots after every 16 slots except at end
    cfg = modcod.get_config(4, short=False, pilots=True)
    assert cfg.pilot_blocks == 22   # (360/16 - 1) = 21.5 -> reference loop: 22
    assert cfg.plframe_len == (360 + 1) * 90 + cfg.pilot_blocks * 36
    cfg0 = modcod.get_config(4, short=False, pilots=False)
    assert cfg0.plframe_len == (360 + 1) * 90


# ---------------------------------------------------------------------------
# PL header
# ---------------------------------------------------------------------------

def test_sof_symbols_pi2bpsk():
    s = plheader.sof_symbols()
    assert len(s) == 26
    np.testing.assert_allclose(np.abs(s), 1.0, atol=1e-6)
    # consecutive symbols are +-90 degrees apart (pi/2-BPSK)
    d = s[1:] * np.conj(s[:-1])
    np.testing.assert_allclose(np.abs(d.real), 0, atol=1e-6)


def test_pls_codewords_structure():
    cw = plheader.pls_codewords()
    assert len(cw) == 128
    assert len(np.unique(cw)) == 128
    bits = plheader.pls_bit_matrix()
    # Complementary structure: after descrambling, even/odd bit pairs are
    # equal for even index (pilots off) and complementary for odd index.
    scr = np.array([(plheader.PLS_SCRAMBLING >> (63 - i)) & 1
                    for i in range(64)], np.uint8)
    for idx in (0, 2, 64, 126):
        b = bits[idx] ^ scr
        assert np.all(b[0::2] == b[1::2])
    for idx in (1, 3, 65, 127):
        b = bits[idx] ^ scr
        assert np.all(b[0::2] != b[1::2])


def test_pls_min_distance_sample():
    # Reed-Muller-derived codewords: pairwise Hamming distance >= 32
    bits = plheader.pls_bit_matrix().astype(np.int32)
    d = (bits[:16, None, :] != bits[None, :16, :]).sum(-1)
    d += np.eye(16, dtype=np.int32) * 64
    assert d.min() >= 32


def test_header_diff_templates_detect_sof():
    # simulate a noiseless header and check the differential correlator peaks
    pls_code = (4 << 2) | 2
    hdr = plheader.plheader_symbols(pls_code)
    z = np.concatenate([np.exp(1j * np.arange(50)), hdr,
                        np.exp(1j * 1.7 * np.arange(60))])
    d = np.zeros(len(z), np.complex64)
    d[1:] = z[1:] * np.conj(z[:-1])
    sof_t, pls_t = plheader.header_diff_templates()
    best, best_i = -1, -1
    for i in range(len(z) - 90):
        w = d[i:i + 90]
        csof = (w * sof_t).sum()
        cpls = (w * pls_t).sum()
        c = max(abs(csof + cpls), abs(csof - cpls)) / (25 + 32)
        if c > best:
            best, best_i = c, i
    assert best_i == 50
    assert best > 0.9


# ---------------------------------------------------------------------------
# scramblers
# ---------------------------------------------------------------------------

def test_pl_scrambler_first_values():
    rn = scrambling.pl_scrambler_sequence()
    assert rn[0] == 0  # x=...1, y=all ones -> zn = 1^1 = 0
    assert set(np.unique(rn)).issubset({0, 1, 2, 3})
    # scramble/descramble roundtrip
    sym = (np.random.default_rng(0).standard_normal(1000) +
           1j * np.random.default_rng(1).standard_normal(1000)).astype(np.complex64)
    s = scrambling.pl_scramble(sym, start=7)
    r = scrambling.pl_descramble(s, start=7)
    np.testing.assert_allclose(r, sym, atol=1e-5)


def test_bb_scrambler_involution():
    data = np.random.default_rng(2).integers(0, 256, 1000).astype(np.uint8)
    s = scrambling.bb_scramble_bytes(data)
    assert not np.array_equal(s, data)
    np.testing.assert_array_equal(scrambling.bb_scramble_bytes(s), data)


def test_bb_scrambler_prbs_start():
    # PRBS 1+x^14+x^15 seed 100101010000000: first output bits
    bits = scrambling.bb_scrambler_bits(16)
    assert bits[0] == 0  # x14=0, x15=0 at start
    # period check over a short window: sequence must not be all zero
    assert scrambling.bb_scrambler_bits(100).sum() > 0


def test_dvbs_dispersal_roundtrip():
    rng = np.random.default_rng(3)
    pkts = rng.integers(0, 256, 8 * 188).astype(np.uint8)
    pkts[::188] = 0x47
    tx = scrambling.dvbs_scramble_group(pkts)
    assert tx[0] == 0xB8
    assert np.all(tx[188::188] == 0x47)
    rx = scrambling.dvbs_descramble_group(tx)
    np.testing.assert_array_equal(rx, pkts)


# ---------------------------------------------------------------------------
# GF / BCH
# ---------------------------------------------------------------------------

def test_gf256_basics():
    gf = gf2m.gf256()
    a = np.arange(1, 256)
    np.testing.assert_array_equal(gf.mul(a, gf.inv(a)), np.ones(255))
    assert gf.mul(2, 3) == gf2m.gf256().mul(3, 2)


def test_bch_min_polys_match_standard():
    """First minimal polynomials from EN 302 307-1 table 6a (as transcribed
    in bbframe_bch.cpp:252-255) vs our algorithmic computation."""
    gf = bch_spec.field_for(modcod.NORMAL)
    polyn01 = [1, 0, 1, 1, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1]
    polyn02 = [1, 1, 0, 0, 1, 1, 1, 0, 1, 0, 0, 0, 0, 0, 0, 0, 1]
    polyn03 = [1, 0, 1, 1, 1, 1, 0, 1, 1, 1, 1, 1, 0, 0, 0, 0, 1]
    np.testing.assert_array_equal(gf.minimal_polynomial(1), polyn01)
    np.testing.assert_array_equal(gf.minimal_polynomial(3), polyn02)
    np.testing.assert_array_equal(gf.minimal_polynomial(5), polyn03)
    gfs = bch_spec.field_for(modcod.SHORT)
    polys01 = [1, 1, 0, 1, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 1]
    polys02 = [1, 0, 0, 0, 0, 0, 1, 0, 1, 0, 0, 1, 0, 0, 1]
    np.testing.assert_array_equal(gfs.minimal_polynomial(1), polys01)
    np.testing.assert_array_equal(gfs.minimal_polynomial(3), polys02)


def test_bch_parity_sizes():
    assert bch_spec.num_parity_bits(modcod.NORMAL, 12) == 192
    assert bch_spec.num_parity_bits(modcod.NORMAL, 10) == 160
    assert bch_spec.num_parity_bits(modcod.NORMAL, 8) == 128
    assert bch_spec.num_parity_bits(modcod.SHORT, 12) == 168


def test_bch_encode_decode_short():
    rng = np.random.default_rng(4)
    fs, rate = modcod.SHORT, "1/2"
    kbch, nbch, t = modcod.BCH_PARAMS[(fs, rate)]
    msg = rng.integers(0, 2, kbch).astype(np.uint8)
    code = bch_spec.encode(msg, fs, rate)
    assert len(code) == nbch
    # clean decode
    out, nerr = bch_spec.decode(code, fs, rate)
    assert nerr == 0
    # flip t errors -> corrected
    bad = code.copy()
    pos = rng.choice(nbch, size=t, replace=False)
    bad[pos] ^= 1
    out, nerr = bch_spec.decode(bad, fs, rate)
    assert nerr == t
    np.testing.assert_array_equal(out, code)
    # t+3 errors -> failure reported (usually detectable)
    bad2 = code.copy()
    pos2 = rng.choice(nbch, size=t + 3, replace=False)
    bad2[pos2] ^= 1
    _, nerr2 = bch_spec.decode(bad2, fs, rate)
    assert nerr2 == -1 or nerr2 > 0  # -1 expected; miscorrection tolerated


# ---------------------------------------------------------------------------
# LDPC structure + encoder
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("table", ["C4", "B4"])
def test_ldpc_encode_satisfies_checks(table):
    code = ldpc_spec.get_code(table)
    rng = np.random.default_rng(5)
    info = rng.integers(0, 2, code.K).astype(np.uint8)
    cw = code.encode(info)
    assert cw.shape == (code.N,)
    assert code.check_syndrome(cw) == 0
    # a corrupted word must fail checks
    bad = cw.copy()
    bad[123] ^= 1
    assert code.check_syndrome(bad) > 0


def test_ldpc_links_total_matches_reference_counts():
    # LINKS_TOTAL for B1 is 194399 (dvb_s2_tables.hh:21) = info links + R + (R-1)
    code = ldpc_spec.get_code("B1")
    info_links = int((code.info_addr >= 0).sum())
    assert info_links + code.R + (code.R - 1) == 194399


def test_ldpc_check_edges_cover_all_vars():
    code = ldpc_spec.get_code("C4")
    seen = np.zeros(code.N, np.int64)
    total_checks = 0
    for deg, checks, vi in code.check_edges:
        assert vi.shape == (len(checks), deg)
        np.add.at(seen, vi.ravel(), 1)
        total_checks += len(checks)
    assert total_checks == code.R
    assert np.all(seen[:code.K] >= 1)
    # parity bit column degree: 2 except last
    assert seen[code.N - 1] == 1
    assert np.all(seen[code.K:code.N - 1] == 2)


# ---------------------------------------------------------------------------
# constellations + interleaver
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("kind", [modcod.QPSK, modcod.PSK8, modcod.APSK16,
                                  modcod.APSK32])
def test_constellation_unit_power(kind):
    pts = constellations.points(kind)
    np.testing.assert_allclose(np.mean(np.abs(pts) ** 2), 1.0, atol=1e-6)
    assert len(np.unique(np.round(pts, 6))) == len(pts)


def test_qpsk_standard_mapping():
    pts = constellations.points(modcod.QPSK)
    s = 1 / np.sqrt(2)
    np.testing.assert_allclose(pts[0], s + 1j * s, atol=1e-6)   # 00 -> (+,+)
    np.testing.assert_allclose(pts[1], s - 1j * s, atol=1e-6)   # 01 -> (+,-)
    np.testing.assert_allclose(pts[2], -s + 1j * s, atol=1e-6)  # 10 -> (-,+)
    np.testing.assert_allclose(pts[3], -s - 1j * s, atol=1e-6)  # 11 -> (-,-)


def test_8psk_standard_mapping():
    pts = constellations.points(modcod.PSK8)
    np.testing.assert_allclose(pts[0b000], np.exp(1j * np.pi / 4), atol=1e-6)
    np.testing.assert_allclose(pts[0b100], 1.0 + 0j, atol=1e-6)
    np.testing.assert_allclose(pts[0b110], np.exp(-3j * np.pi / 4), atol=1e-6)


def test_bits_symbols_roundtrip():
    rng = np.random.default_rng(6)
    bits = rng.integers(0, 2, 30).astype(np.uint8)
    syms = constellations.bits_to_symbols(bits, modcod.PSK8)
    back = constellations.symbols_to_bits(syms, modcod.PSK8)
    np.testing.assert_array_equal(back, bits)


@pytest.mark.parametrize("kind,rate", [(modcod.PSK8, "3/5"), (modcod.PSK8, "2/3"),
                                       (modcod.APSK16, "2/3"),
                                       (modcod.APSK32, "3/4")])
def test_interleaver_roundtrip(kind, rate):
    n = 64800
    rng = np.random.default_rng(7)
    cw = rng.integers(0, 2, n).astype(np.uint8)
    stream = interleaver.interleave_bits(cw, kind, modcod.NORMAL, rate)
    back = interleaver.deinterleave_llrs(stream, kind, modcod.NORMAL, rate)
    np.testing.assert_array_equal(back, cw)
    assert not np.array_equal(stream, cw)


def test_8psk_interleaver_column_structure():
    # non-3/5: codeword[j] (first column) must be bit y2 of symbol j
    perm = interleaver.deinterleave_perm(modcod.PSK8, modcod.NORMAL, "2/3")
    assert perm[0] == 2 and perm[1] == 5
    # 3/5: swapped column order (s2_deinterleaver.cpp:26-37)
    perm35 = interleaver.deinterleave_perm(modcod.PSK8, modcod.NORMAL, "3/5")
    assert perm35[2 * 21600] == 2
    assert perm35[0] == 0 + 0 * 3  # y0 at offset 0 ... position 3j+0


def test_deinterleave_device_equals_perm_gather():
    """The structured (slice+concat) device deinterleave must equal the
    perm-gather definition for every interleaved mode family."""
    import jax.numpy as jnp
    from dvbs_tpu.spec import interleaver, modcod as mc

    cases = [(mc.QPSK, "normal", "1/2"), (mc.PSK8, "normal", "3/4"),
             (mc.PSK8, "normal", "3/5"), (mc.PSK8, "short", "2/3"),
             (mc.APSK16, "normal", "3/4"), (mc.APSK16, "short", "8/9"),
             (mc.APSK32, "normal", "4/5")]
    rng = np.random.default_rng(3)
    for kind, fs, rate in cases:
        perm = interleaver.deinterleave_perm(kind, fs, rate)
        n = len(perm)
        m = mc.MOD_BITS[kind]
        stream = rng.standard_normal((2, n)).astype(np.float32)
        want = stream[:, perm]
        got = np.asarray(interleaver.deinterleave_device(
            jnp.asarray(stream.reshape(2, n // m, m)), kind, fs, rate))
        assert np.array_equal(got, want), (kind, fs, rate)


def test_extract_payload_equals_index_form():
    import jax.numpy as jnp
    from dvbs_tpu.ops import plphase
    from dvbs_tpu.spec import modcod as mc
    rng = np.random.default_rng(5)
    for mcn, short in ((14, False), (4, True), (18, False)):
        cfg = mc.get_config(mcn, short=short, pilots=True)
        idx = plphase.payload_indices(cfg)
        fr = (rng.standard_normal((3, cfg.plframe_len)) +
              1j * rng.standard_normal((3, cfg.plframe_len))
              ).astype(np.complex64)
        want = fr[:, idx]
        got = np.asarray(plphase.extract_payload(jnp.asarray(fr), cfg))
        assert np.array_equal(got, want), (mcn, short)
