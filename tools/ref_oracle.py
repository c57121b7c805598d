"""ctypes bridge to the compiled reference implementation (test oracle).

Wraps native/refshim/libref_oracle.so, which compiles the reference's
SDR++-free coding stack (/root/reference/src/demod: LDPC, BCH, scramblers,
deinterleavers, CC/RS codecs, TS deframer, BBFrame TS/GSE parser) behind a
C ABI. Used by tests/test_interop.py to cross-validate this framework's
spec/ops implementations bit-for-bit, and by tools/bench_reference.py to
measure the reference's throughput as the honest perf baseline.
"""
from __future__ import annotations

import ctypes
import functools
import os
import subprocess

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "..", "native", "refshim")
_LIB = os.path.join(_DIR, "libref_oracle.so")

# reference enum values (dvbs2/dvbs2.h)
RATES = {"1/4": 0, "1/3": 1, "2/5": 2, "1/2": 3, "3/5": 4, "2/3": 5,
         "3/4": 6, "4/5": 7, "5/6": 8, "8/9": 10, "9/10": 11}
CONSTELS = {"qpsk": 0, "8psk": 1, "16apsk": 2, "32apsk": 3}

u8p = ctypes.POINTER(ctypes.c_uint8)
i8p = ctypes.POINTER(ctypes.c_int8)


def build() -> None:
    subprocess.run(["make", "-C", _DIR, "-s"], check=True)


@functools.lru_cache()
def lib() -> ctypes.CDLL:
    if not os.path.exists(_LIB):
        build()
    L = ctypes.CDLL(_LIB)
    L.ref_viterbi_create.restype = ctypes.c_void_p
    L.ref_viterbi_create.argtypes = [ctypes.c_float, ctypes.c_int,
                                     ctypes.c_int]
    L.ref_viterbi_ber.restype = ctypes.c_float
    L.ref_viterbi_ber.argtypes = [ctypes.c_void_p]
    L.ref_viterbi_destroy.argtypes = [ctypes.c_void_p]
    L.ref_viterbi_work.argtypes = [ctypes.c_void_p, i8p, ctypes.c_int, u8p]
    L.ref_viterbi_state.argtypes = [ctypes.c_void_p]
    L.ref_viterbi_rate.argtypes = [ctypes.c_void_p]
    L.ref_forney_create.restype = ctypes.c_void_p
    L.ref_forney_destroy.argtypes = [ctypes.c_void_p]
    L.ref_forney_deinterleave.argtypes = [ctypes.c_void_p, u8p, u8p]
    L.ref_forney_interleave.argtypes = [ctypes.c_void_p, u8p, u8p]
    L.ref_dvbs_scrambler_create.restype = ctypes.c_void_p
    L.ref_dvbs_scrambler_destroy.argtypes = [ctypes.c_void_p]
    L.ref_dvbs_descramble.argtypes = [ctypes.c_void_p, u8p]
    L.ref_deframer_create.restype = ctypes.c_void_p
    L.ref_deframer_destroy.argtypes = [ctypes.c_void_p]
    L.ref_deframer_work.argtypes = [ctypes.c_void_p, u8p, ctypes.c_int, u8p]
    L.ref_deframer_state.argtypes = [ctypes.c_void_p]
    L.ref_tsparser_create.restype = ctypes.c_void_p
    L.ref_tsparser_create.argtypes = [ctypes.c_int]
    L.ref_tsparser_destroy.argtypes = [ctypes.c_void_p]
    L.ref_tsparser_work.argtypes = [ctypes.c_void_p, u8p, ctypes.c_int,
                                    u8p, ctypes.c_int]
    L.ref_tsparser_header.argtypes = [ctypes.c_void_p,
                                      ctypes.POINTER(ctypes.c_int)]
    L.ref_modcod_cfg.argtypes = [ctypes.c_int] * 3 + \
        [ctypes.POINTER(ctypes.c_int)] * 4 + \
        [ctypes.POINTER(ctypes.c_float)] * 2
    dp = ctypes.POINTER(ctypes.c_double)
    L.ref_ldpc_bench_create.restype = ctypes.c_void_p
    L.ref_ldpc_bench_create.argtypes = [ctypes.c_int, ctypes.c_int]
    L.ref_ldpc_bench_destroy.argtypes = [ctypes.c_void_p]
    L.ref_ldpc_bench_run.restype = ctypes.c_long
    L.ref_ldpc_bench_run.argtypes = [ctypes.c_void_p, i8p, ctypes.c_int,
                                     ctypes.c_int, ctypes.c_int, dp]
    L.ref_bch_bench_run.restype = ctypes.c_long
    L.ref_bch_bench_run.argtypes = [ctypes.c_int, ctypes.c_int, u8p,
                                    ctypes.c_int, ctypes.c_int,
                                    ctypes.c_int, dp]
    L.ref_viterbi_bench_run.restype = ctypes.c_long
    L.ref_viterbi_bench_run.argtypes = [ctypes.c_void_p, i8p, ctypes.c_int,
                                        u8p, ctypes.c_int, dp]
    L.ref_rs_bench_run.restype = ctypes.c_long
    L.ref_rs_bench_run.argtypes = [u8p, ctypes.c_int, ctypes.c_int, dp]
    return L


def _u8(a):
    return np.ascontiguousarray(a, np.uint8).ctypes.data_as(u8p)


def _i8(a):
    return np.ascontiguousarray(a, np.int8).ctypes.data_as(i8p)


def available() -> bool:
    try:
        lib()
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


# ----------------------------------------------------------------- LDPC
def ldpc_simd_width() -> int:
    return lib().ref_ldpc_simd_width()


def ldpc_sizes(shortf: bool, rate: str) -> tuple[int, int]:
    n, k = ctypes.c_int(), ctypes.c_int()
    lib().ref_ldpc_sizes(int(shortf), RATES[rate],
                         ctypes.byref(n), ctypes.byref(k))
    return n.value, k.value


def ldpc_encode(info_bits: np.ndarray, shortf: bool, rate: str) -> np.ndarray:
    """info bits [K] (0/1) -> codeword bits [N]."""
    n, k = ldpc_sizes(shortf, rate)
    assert info_bits.shape == (k,)
    frame = np.zeros(n // 8, np.uint8)
    frame[:k // 8] = np.packbits(info_bits.astype(np.uint8))
    frame = np.ascontiguousarray(frame)
    lib().ref_ldpc_encode(int(shortf), RATES[rate], _u8(frame))
    return np.unpackbits(frame)


def ldpc_decode(llr: np.ndarray, shortf: bool, rate: str,
                max_trials: int = 16) -> tuple[np.ndarray, int]:
    """int8 LLR [N] (positive = bit 0 in ref convention? NO: the reference
    uses positive = bit 1 is `< 0` hard slicing... see note) -> (hard bits
    [N], trials). Reference hard decision: bit = (llr < 0) after decode
    (bbframe_ldpc.cpp:154), i.e. negative soft value = bit 1... actually
    `code[i] = ... < 0` in encode packing; decode leaves posteriors where
    positive = bit 0."""
    llr = np.ascontiguousarray(llr, np.int8).copy()
    trials = lib().ref_ldpc_decode(int(shortf), RATES[rate], _i8(llr),
                                   max_trials)
    return (llr < 0).astype(np.uint8), trials


def ldpc_decode_batch(llrs: np.ndarray, shortf: bool, rate: str,
                      max_trials: int = 16) -> tuple[np.ndarray, int]:
    """[W, N] int8 -> ([W, N] hard bits, trials used by the batched call)."""
    W = ldpc_simd_width()
    assert llrs.shape[0] == W
    buf = np.ascontiguousarray(llrs, np.int8).copy()
    trials = lib().ref_ldpc_decode_batch(int(shortf), RATES[rate], _i8(buf),
                                         max_trials)
    return (buf < 0).astype(np.uint8), trials


# ------------------------------------------------------------------ BCH
def bch_sizes(shortf: bool, rate: str) -> tuple[int, int]:
    kbch, nbch = ctypes.c_int(), ctypes.c_int()
    lib().ref_bch_sizes(int(shortf), RATES[rate],
                        ctypes.byref(kbch), ctypes.byref(nbch))
    return kbch.value, nbch.value


def bch_encode(data_bits: np.ndarray, shortf: bool, rate: str) -> np.ndarray:
    """[kbch] bits -> [nbch] bits (data + parity)."""
    kbch, nbch = bch_sizes(shortf, rate)
    assert data_bits.shape == (kbch,)
    frame = np.zeros(nbch // 8, np.uint8)
    frame[:kbch // 8] = np.packbits(data_bits.astype(np.uint8))
    frame = np.ascontiguousarray(frame)
    lib().ref_bch_encode(int(shortf), RATES[rate], _u8(frame))
    return np.unpackbits(frame)


def bch_decode(code_bits: np.ndarray, shortf: bool, rate: str
               ) -> tuple[np.ndarray, int]:
    """[nbch] bits -> (corrected [nbch] bits, n_corrections or -1)."""
    frame = np.ascontiguousarray(np.packbits(code_bits.astype(np.uint8)))
    ncorr = lib().ref_bch_decode(int(shortf), RATES[rate], _u8(frame))
    return np.unpackbits(frame), ncorr


# ----------------------------------------------------- BB descrambler
def bb_descramble(frame_bytes: np.ndarray, shortf: bool,
                  rate: str) -> np.ndarray:
    buf = np.ascontiguousarray(frame_bytes, np.uint8).copy()
    lib().ref_bb_descramble(int(shortf), RATES[rate], _u8(buf))
    return buf


# ------------------------------------------------------- PL scrambler
def pl_scrambler_rn(n: int = 4096) -> np.ndarray:
    out = np.zeros(n, np.uint8)
    lib().ref_pl_scrambler_rn(_u8(out), n)
    return out


# --------------------------------------------------- S2 deinterleaver
def s2_deinterleave(llr: np.ndarray, constel: str, shortf: bool,
                    rate: str) -> np.ndarray:
    buf = np.ascontiguousarray(llr, np.int8)
    out = np.zeros_like(buf)
    lib().ref_s2_deinterleave(CONSTELS[constel], int(shortf), RATES[rate],
                              _i8(buf), _i8(out))
    return out


def s2_interleave(bits: np.ndarray, constel: str, shortf: bool,
                  rate: str) -> np.ndarray:
    buf = np.ascontiguousarray(bits, np.uint8)
    out = np.zeros_like(buf)
    lib().ref_s2_interleave(CONSTELS[constel], int(shortf), RATES[rate],
                            _u8(buf), _u8(out))
    return out


# ------------------------------------------------------- SOF/PLS defs
def pls_codewords() -> np.ndarray:
    out = np.zeros(128, np.uint64)
    lib().ref_pls_codewords(out.ctypes.data_as(
        ctypes.POINTER(ctypes.c_uint64)))
    return out


def sof_symbols() -> np.ndarray:
    out = np.zeros(52, np.float32)
    lib().ref_sof_symbols(out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out[::2] + 1j * out[1::2]


# --------------------------------------------------- soft demapper
# constellation_type_t values (constellation.h:9-16)
_CONST_TYPES = {"bpsk": 0, "qpsk": 1, "oqpsk": 2, "8psk": 3,
                "16apsk": 4, "32apsk": 5}


def constellation_soft_demod(syms: np.ndarray, kind: str,
                             g1: float = 0.0, g2: float = 0.0,
                             npwr: float = 1.0) -> np.ndarray:
    """Reference exact-LLR soft demap (demod_soft_calc,
    constellation.cpp:205-270) with its internal scale chain and
    clamp-by-halving. syms: [n] complex around unit power ->
    [n, mod_bits] int8 (negative = bit 1)."""
    L = lib()
    L.ref_constellation_create.restype = ctypes.c_void_p
    L.ref_constellation_create.argtypes = [ctypes.c_int, ctypes.c_float,
                                           ctypes.c_float]
    L.ref_constellation_destroy.argtypes = [ctypes.c_void_p]
    L.ref_constellation_bits.argtypes = [ctypes.c_void_p]
    fp = ctypes.POINTER(ctypes.c_float)
    L.ref_constellation_demod_soft.argtypes = [
        ctypes.c_void_p, fp, ctypes.c_int, ctypes.c_float, i8p]
    h = L.ref_constellation_create(_CONST_TYPES[kind], float(g1), float(g2))
    m = L.ref_constellation_bits(h)
    s = np.ascontiguousarray(
        np.stack([syms.real, syms.imag], axis=-1).astype(np.float32))
    out = np.empty((len(syms), m), np.int8)
    L.ref_constellation_demod_soft(h, s.ctypes.data_as(fp), len(syms),
                                   float(npwr), out.ctypes.data_as(i8p))
    L.ref_constellation_destroy(h)
    return out


# ------------------------------------------------------- MODCOD table
def modcod_cfg(mc: int, shortf: bool, pilots: bool) -> dict:
    slots, constel, rate, fs = (ctypes.c_int() for _ in range(4))
    g1, g2 = ctypes.c_float(), ctypes.c_float()
    lib().ref_modcod_cfg(mc, int(shortf), int(pilots),
                         ctypes.byref(slots), ctypes.byref(constel),
                         ctypes.byref(rate), ctypes.byref(fs),
                         ctypes.byref(g1), ctypes.byref(g2))
    return dict(slots=slots.value, constellation=constel.value,
                rate=rate.value, framesize=fs.value,
                g1=g1.value, g2=g2.value)


# --------------------------------------------------------- CC codec
def cc_encode(bits: np.ndarray) -> np.ndarray:
    """[n] bits -> [2n] coded bits (K=7, polys 79/109)."""
    n = len(bits)
    inb = np.ascontiguousarray(bits, np.uint8)
    out = np.zeros(2 * n, np.uint8)
    lib().ref_cc_encode(_u8(inb), n, _u8(out))
    return out


def cc_decode(soft: np.ndarray, nbits: int | None = None) -> np.ndarray:
    """Unsigned soft symbols (0..255, 255 = strong 1) -> [nbits] bits.

    The reference decoder reads 2*(nbits + 6) soft symbols (it consumes
    k-1 = 6 tail symbol pairs past the frame, cc_decoder.cpp:306) and
    writes one bit per output byte."""
    if nbits is None:
        nbits = len(soft) // 2 - 6
    assert len(soft) >= 2 * (nbits + 6), "need 6 tail symbol pairs"
    inb = np.ascontiguousarray(soft, np.uint8)
    out = np.zeros(nbits, np.uint8)
    lib().ref_cc_decode(_u8(inb), nbits, _u8(out))
    return out


# ------------------------------------------- auto-rate Viterbi_DVBS
class ViterbiDVBS:
    def __init__(self, ber_thresh: float = 0.15, max_outsync: int = 20,
                 buf_size: int = 8192):
        self._h = lib().ref_viterbi_create(ber_thresh, max_outsync, buf_size)

    def work(self, soft: np.ndarray) -> np.ndarray:
        """int8 interleaved I/Q soft symbols -> decoded packed bytes."""
        soft = np.ascontiguousarray(soft, np.int8)
        out = np.zeros(len(soft), np.uint8)
        n = lib().ref_viterbi_work(self._h, _i8(soft), len(soft), _u8(out))
        return out[:n]

    @property
    def state(self) -> int:
        return lib().ref_viterbi_state(self._h)

    @property
    def ber(self) -> float:
        return lib().ref_viterbi_ber(self._h)

    @property
    def rate(self) -> int:
        return lib().ref_viterbi_rate(self._h)

    def __del__(self):
        try:
            lib().ref_viterbi_destroy(self._h)
        except Exception:
            pass


# ------------------------------------------------------ RS(204,188)
def rs_decode(data204: np.ndarray) -> tuple[np.ndarray, int]:
    buf = np.ascontiguousarray(data204, np.uint8).copy()
    err = lib().ref_rs_decode(_u8(buf))
    return buf, err


def rs_encode(data188: np.ndarray) -> np.ndarray:
    """RS(204,188) parity via libcorrect with the reference decoder's
    exact parameters (dvbs_reedsolomon.h:17)."""
    L = lib()
    L.ref_rs_encode.argtypes = [u8p, u8p]
    out = np.zeros(204, np.uint8)
    rc = L.ref_rs_encode(_u8(np.ascontiguousarray(data188, np.uint8)),
                         _u8(out))
    assert rc == 0
    return out


# ------------------------------------------- Forney deinterleaver
class ForneyDeinterleaver:
    def __init__(self):
        self._h = lib().ref_forney_create()

    def deinterleave(self, frame1632: np.ndarray) -> np.ndarray:
        buf = np.ascontiguousarray(frame1632, np.uint8)
        out = np.zeros_like(buf)
        lib().ref_forney_deinterleave(self._h, _u8(buf), _u8(out))
        return out

    def interleave(self, stream: np.ndarray) -> np.ndarray:
        """TX-direction convolutional interleave (dvbs_interleaving.h:
        45-56, 12 bytes per call); stateful across calls like the
        reference's FIFOs."""
        buf = np.ascontiguousarray(stream, np.uint8)
        assert len(buf) % 12 == 0
        out = np.zeros_like(buf)
        for i in range(0, len(buf), 12):
            lib().ref_forney_interleave(self._h, _u8(buf[i:i + 12]),
                                        _u8(out[i:i + 12]))
        return out

    def __del__(self):
        try:
            lib().ref_forney_destroy(self._h)
        except Exception:
            pass


# ------------------------------------- DVB-S energy dispersal
def dvbs_descramble(frame1632: np.ndarray) -> np.ndarray:
    h = lib().ref_dvbs_scrambler_create()
    buf = np.ascontiguousarray(frame1632, np.uint8).copy()
    lib().ref_dvbs_descramble(h, _u8(buf))
    lib().ref_dvbs_scrambler_destroy(h)
    return buf


# ------------------------------------------------- TS deframer
class TSDeframer:
    def __init__(self):
        self._h = lib().ref_deframer_create()

    def work(self, bits: np.ndarray) -> np.ndarray:
        """unpacked bits in -> packed frames out ([n_frames, 1632])."""
        bits = np.ascontiguousarray(bits, np.uint8)
        out = np.zeros(len(bits) // 8 + 1632, np.uint8)
        n = lib().ref_deframer_work(self._h, _u8(bits), len(bits), _u8(out))
        return out[:n * 1632].reshape(-1, 1632)

    @property
    def state(self) -> int:
        return lib().ref_deframer_state(self._h)

    def __del__(self):
        try:
            lib().ref_deframer_destroy(self._h)
        except Exception:
            pass


# --------------------------------------------- BBFrame TS parser
class BBFrameTSParser:
    def __init__(self, kbch: int):
        self._h = lib().ref_tsparser_create(kbch)
        self.kbch = kbch

    def work(self, bbframes: np.ndarray) -> bytes:
        """[n_frames, kbch/8] descrambled BBFRAME bytes -> output bytes
        (188-byte TS packets or GRE-wrapped GSE PDUs)."""
        flat = np.ascontiguousarray(bbframes, np.uint8).reshape(-1)
        cnt = (len(flat) * 8) // self.kbch
        outsize = len(flat) * 2 + 65536
        out = np.zeros(outsize, np.uint8)
        n = lib().ref_tsparser_work(self._h, _u8(flat), cnt, _u8(out),
                                    outsize)
        return out[:n].tobytes()

    def header(self) -> dict:
        f = (ctypes.c_int * 14)()
        lib().ref_tsparser_header(self._h, f)
        keys = ["ts_gs", "sis_mis", "ccm_acm", "issyi", "npd", "ro", "isi",
                "upl", "dfl", "sync", "syncd", "bb_cnt", "bb_proc",
                "ts_errs"]
        return dict(zip(keys, [int(x) for x in f]))

    def __del__(self):
        try:
            lib().ref_tsparser_destroy(self._h)
        except Exception:
            pass


# ----------------------------------------------- benchmark bridges
def ldpc_bench(llrs: np.ndarray, shortf: bool, rate: str, *,
               max_trials: int = 16, blocks: int | None = None,
               reps: int = 1) -> tuple[float, float]:
    """Time `reps` decodes of the [W, N] int8 LLR batch with one persistent
    decoder (C++ loop, std::chrono). Returns (seconds_per_call,
    mean_trials_used_per_call)."""
    W = ldpc_simd_width()
    assert llrs.shape[0] == W
    if blocks is None:
        blocks = W
    h = lib().ref_ldpc_bench_create(int(shortf), RATES[rate])
    try:
        buf = np.ascontiguousarray(llrs, np.int8)
        el = ctypes.c_double()
        total = lib().ref_ldpc_bench_run(h, _i8(buf), max_trials, blocks,
                                         reps, ctypes.byref(el))
    finally:
        lib().ref_ldpc_bench_destroy(h)
    return el.value / reps, total / reps


def bch_bench(code_bits: np.ndarray, shortf: bool, rate: str, *,
              nerr: int = 0, reps: int = 1) -> float:
    """Seconds per BCH decode of the packed codeword with nerr bit flips."""
    frame = np.ascontiguousarray(np.packbits(code_bits.astype(np.uint8)))
    el = ctypes.c_double()
    lib().ref_bch_bench_run(int(shortf), RATES[rate], _u8(frame),
                            len(frame), nerr, reps, ctypes.byref(el))
    return el.value / reps


def viterbi_bench(vit: "ViterbiDVBS", soft: np.ndarray,
                  reps: int = 1) -> tuple[float, float]:
    """Time reps runs of a (pre-SYNCED) Viterbi_DVBS over the soft buffer.
    Returns (seconds_per_call, bytes_out_per_call)."""
    buf = np.ascontiguousarray(soft, np.int8)
    out = np.zeros(len(buf), np.uint8)
    el = ctypes.c_double()
    produced = lib().ref_viterbi_bench_run(vit._h, _i8(buf), len(buf),
                                           _u8(out), reps, ctypes.byref(el))
    return el.value / reps, produced / reps


def rs_bench(frame1632: np.ndarray, *, nerr: int = 0,
             reps: int = 1) -> float:
    """Seconds per 8-packet RS(204,188) frame decode with nerr byte errors
    per packet."""
    buf = np.ascontiguousarray(frame1632, np.uint8)
    el = ctypes.c_double()
    lib().ref_rs_bench_run(_u8(buf), nerr, reps, ctypes.byref(el))
    return el.value / reps
