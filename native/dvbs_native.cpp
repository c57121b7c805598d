// Native host-side byte/bit state machines for dvbs_tpu.
//
// The reference implements its deframers in C++ (dvbs_ts_deframer.cpp,
// bbframe_ts_parser.cpp); these are the equivalent runtime components for
// this framework, exposed with a C ABI for ctypes. Python fallbacks with
// identical behavior live in dvbs_tpu/io/ (cross-checked by tests).
//
// Build: make -C native   ->  native/libdvbs_native.so

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

constexpr int FRAME_BYTES = 8 * 204;
constexpr int FRAME_BITS = FRAME_BYTES * 8;
constexpr int MAX_ERRS = 8;
const uint8_t SYNCS[8] = {0xB8, 0x47, 0x47, 0x47, 0x47, 0x47, 0x47, 0x47};

inline int popcount8(uint8_t v) { return __builtin_popcount(v); }

// ---------------------------------------------------------------- deframer

struct Deframer {
    std::vector<uint8_t> bits;   // one bit per byte (0/1)
    bool locked = false;
    bool inverted = false;
    int bad_streak = 0;
    int max_resync_errors = 4;
    long frames_ok = 0;
    long sync_errors = 0;
};

static uint8_t pack_byte(const uint8_t* b) {
    uint8_t v = 0;
    for (int i = 0; i < 8; i++) v = (v << 1) | (b[i] & 1);
    return v;
}

// total sync-byte bit errors for a candidate offset
static void sync_errs(const uint8_t* bits, int off, int* normal, int* inv) {
    int e = 0;
    for (int k = 0; k < 8; k++) {
        uint8_t by = pack_byte(bits + off + k * 204 * 8);
        e += popcount8(by ^ SYNCS[k]);
    }
    *normal = e;
    *inv = 64 - e;
}

static bool search(const Deframer& d, int* off_out, bool* inv_out) {
    if ((int)d.bits.size() < 2 * FRAME_BITS) return false;
    int best = 65, best_off = -1;
    bool best_inv = false;
    for (int off = 0; off < FRAME_BITS; off++) {
        int n, inv;
        sync_errs(d.bits.data(), off, &n, &inv);
        if (n < best) { best = n; best_off = off; best_inv = false; }
        if (inv < best) { best = inv; best_off = off; best_inv = true; }
        if (best == 0) break;
    }
    if (best <= MAX_ERRS) { *off_out = best_off; *inv_out = best_inv; return true; }
    return false;
}

}  // namespace

extern "C" {

void* deframer_create(int max_resync_errors) {
    auto* d = new Deframer();
    d->max_resync_errors = max_resync_errors;
    return d;
}

void deframer_destroy(void* h) { delete static_cast<Deframer*>(h); }

int deframer_locked(void* h) { return static_cast<Deframer*>(h)->locked; }
int deframer_inverted(void* h) { return static_cast<Deframer*>(h)->inverted; }
long deframer_frames_ok(void* h) { return static_cast<Deframer*>(h)->frames_ok; }
long deframer_sync_errors(void* h) { return static_cast<Deframer*>(h)->sync_errors; }

// feed n bits (one per byte); writes up to max_frames*1632 bytes into out.
// returns number of frames emitted.
int deframer_feed(void* h, const uint8_t* in_bits, long n,
                  uint8_t* out, int max_frames) {
    auto* d = static_cast<Deframer*>(h);
    d->bits.insert(d->bits.end(), in_bits, in_bits + n);
    int emitted = 0;
    for (;;) {
        if (!d->locked) {
            int off; bool inv;
            if (!search(*d, &off, &inv)) {
                if ((long)d->bits.size() > 4L * FRAME_BITS)
                    d->bits.erase(d->bits.begin(),
                                  d->bits.end() - 2L * FRAME_BITS);
                break;
            }
            d->bits.erase(d->bits.begin(), d->bits.begin() + off);
            d->locked = true;
            d->inverted = inv;
            d->bad_streak = 0;
        }
        if ((long)d->bits.size() < FRAME_BITS || emitted >= max_frames) break;
        uint8_t frame[FRAME_BYTES];
        const uint8_t inv_mask = d->inverted ? 0xFF : 0x00;
        for (int i = 0; i < FRAME_BYTES; i++)
            frame[i] = pack_byte(d->bits.data() + i * 8) ^ inv_mask;
        int errs = 0;
        for (int k = 0; k < 8; k++)
            errs += popcount8(frame[k * 204] ^ SYNCS[k]);
        if (errs <= MAX_ERRS) {
            memcpy(out + emitted * FRAME_BYTES, frame, FRAME_BYTES);
            emitted++;
            d->frames_ok++;
            d->bad_streak = 0;
            d->bits.erase(d->bits.begin(), d->bits.begin() + FRAME_BITS);
        } else {
            d->sync_errors++;
            if (++d->bad_streak > d->max_resync_errors) {
                d->locked = false;
                d->bad_streak = 0;
                d->bits.erase(d->bits.begin(), d->bits.begin() + 8);
            } else {
                memcpy(out + emitted * FRAME_BYTES, frame, FRAME_BYTES);
                emitted++;
                d->bits.erase(d->bits.begin(), d->bits.begin() + FRAME_BITS);
            }
        }
    }
    return emitted;
}

// ---- deframer checkpoint/resume (same role as tsparser_*_state) -----
// blob layout: locked(1) inverted(1) bad_streak(le32) frames_ok(le64)
//              sync_errors(le64) nbits(le64) bits[]  — identical to the
//              python TSDeframer's format so the two are interchangeable.

static void put32d(std::vector<uint8_t>& v, uint32_t x) {
    v.push_back(x & 0xFF); v.push_back((x >> 8) & 0xFF);
    v.push_back((x >> 16) & 0xFF); v.push_back((x >> 24) & 0xFF);
}
static void put64d(std::vector<uint8_t>& v, uint64_t x) {
    put32d(v, (uint32_t)(x & 0xFFFFFFFFu));
    put32d(v, (uint32_t)(x >> 32));
}
static uint32_t get32d(const uint8_t* p) {
    return (uint32_t)p[0] | ((uint32_t)p[1] << 8) |
           ((uint32_t)p[2] << 16) | ((uint32_t)p[3] << 24);
}
static uint64_t get64d(const uint8_t* p) {
    return (uint64_t)get32d(p) | ((uint64_t)get32d(p + 4) << 32);
}

long deframer_state_size(void* h) {
    return 2 + 4 + 8 + 8 + 8 + (long)static_cast<Deframer*>(h)->bits.size();
}

void deframer_get_state(void* h, uint8_t* out) {
    auto* d = static_cast<Deframer*>(h);
    std::vector<uint8_t> v;
    v.push_back(d->locked); v.push_back(d->inverted);
    put32d(v, (uint32_t)d->bad_streak);
    put64d(v, (uint64_t)d->frames_ok);
    put64d(v, (uint64_t)d->sync_errors);
    put64d(v, (uint64_t)d->bits.size());
    v.insert(v.end(), d->bits.begin(), d->bits.end());
    memcpy(out, v.data(), v.size());
}

int deframer_set_state(void* h, const uint8_t* in, long n) {
    auto* d = static_cast<Deframer*>(h);
    if (n < 2 + 4 + 8 + 8 + 8) return -1;
    long q = 0;
    d->locked = in[q++]; d->inverted = in[q++];
    d->bad_streak = (int)get32d(in + q); q += 4;
    d->frames_ok = (long)get64d(in + q); q += 8;
    d->sync_errors = (long)get64d(in + q); q += 8;
    uint64_t nb = get64d(in + q); q += 8;
    if (q + (long)nb > n) return -1;
    d->bits.assign(in + q, in + q + nb);
    return 0;
}

// ------------------------------------------------- TS / GSE parser

struct GSESlot {
    bool active = false;
    uint8_t frag_id = 0;
    unsigned proto = 0;
    std::vector<uint8_t> buf;
    uint32_t crc = 0;
};

struct TSParser {
    int kbch_bytes = 0;
    bool synched = false;
    int count = 0;
    uint8_t partial[188];
    long bb_proc = 0;
    long bb_cnt = 0;
    GSESlot gse[3];
    bool gse_crc_err = false;
    long sync_errors = 0;   // SYNCD-vs-count mismatches (upstream splices)
    uint8_t last_hdr[10] = {0};   // latest validated BBHEADER (metrics)
    bool has_hdr = false;
};

static uint32_t crc32_tab_[256];
static bool crc32_init_done_ = false;

static void crc32_init() {
    // same generator construction as the reference
    // (bbframe_ts_parser.cpp:85-95): poly 0x04C11DB7, MSB-first
    if (crc32_init_done_) return;
    for (uint32_t i = 0; i < 256; i++) {
        uint32_t k = 0;
        for (uint32_t j = (i << 24) | 0x800000; j != 0x80000000; j <<= 1)
            k = (k << 1) ^ (((k ^ j) & 0x80000000) ? 0x04C11DB7u : 0u);
        crc32_tab_[i] = k;
    }
    crc32_init_done_ = true;
}

static uint32_t crc32_update(const uint8_t* p, long n, uint32_t crc) {
    for (long i = 0; i < n; i++)
        crc = (crc << 8) ^ crc32_tab_[((crc >> 24) ^ p[i]) & 0xFF];
    return crc;
}

static void emit_gre(std::vector<uint8_t>& out, unsigned proto,
                     const uint8_t* payload, long n) {
    // minimal GRE header (bbframe_ts_parser.cpp:259-268)
    out.push_back(0); out.push_back(0);
    out.push_back((proto >> 8) & 0xFF);
    out.push_back(proto & 0xFF);
    out.insert(out.end(), payload, payload + n);
}

// GSE data-field walk — same wire-format state machine as the python
// BBFrameParser._feed_gse (itself mirroring bbframe_ts_parser.cpp:212-384)
static void feed_gse(TSParser* p, const uint8_t* df, long dfl_bytes, long pos,
                     std::vector<uint8_t>& out) {
    crc32_init();
    long q = pos;
    while (q < dfl_bytes - 1) {
        unsigned h1 = df[q], h2 = df[q + 1];
        unsigned start = (h1 >> 7) & 1, end = (h1 >> 6) & 1;
        unsigned lt = (h1 >> 4) & 3;
        if (!start && !end && lt == 0) break;   // padding
        long glen = ((h1 & 0x0F) << 8) | h2;
        if (start && end) {
            if (q + 4 > dfl_bytes) break;
            unsigned proto = (df[q + 2] << 8) | df[q + 3];
            long ds = 4; glen -= 2;
            if (lt == 0b00) { ds += 6; glen -= 6; }
            else if (lt == 0b10) { ds += 3; glen -= 3; }
            if (glen < 0 || q + ds + glen > dfl_bytes) break;
            emit_gre(out, proto, df + q + ds, glen);
            q += ds + glen;
        } else if (start) {
            if (q + 7 > dfl_bytes) break;   // truncated start header
            uint8_t frag = df[q + 2];
            unsigned proto = (df[q + 5] << 8) | df[q + 6];
            long ds = 7; glen -= 5;
            long maclen = (lt == 0b00) ? 6 : (lt == 0b10) ? 3 : 0;
            const uint8_t* mac = df + q + ds;
            ds += maclen; glen -= maclen;
            if (glen < 0 || q + ds + glen > dfl_bytes) break;
            for (int rid = 0; rid < 3; rid++) {
                GSESlot& sl = p->gse[rid];
                if (!sl.active || sl.frag_id == frag) {
                    sl.active = true;
                    sl.frag_id = frag;
                    sl.proto = proto;
                    sl.buf.assign(df + q + ds, df + q + ds + glen);
                    uint32_t crc = 0xFFFFFFFFu;
                    crc = crc32_update(df + q + 3, 2, crc);
                    crc = crc32_update(df + q + 5, 2, crc);
                    if (maclen) crc = crc32_update(mac, maclen, crc);
                    crc = crc32_update(df + q + ds, glen, crc);
                    sl.crc = crc;
                    break;
                }
            }
            q += ds + glen;
        } else if (end) {
            if (q + 3 > dfl_bytes) break;   // truncated end header
            uint8_t frag = df[q + 2];
            long ds = 3; glen -= 1;
            if (glen < 4 || q + ds + glen > dfl_bytes) break;
            for (int rid = 0; rid < 3; rid++) {
                GSESlot& sl = p->gse[rid];
                if (sl.active && sl.frag_id == frag) {
                    sl.active = false;
                    long dn = glen - 4;
                    sl.buf.insert(sl.buf.end(), df + q + ds, df + q + ds + dn);
                    uint32_t crc = crc32_update(df + q + ds, dn, sl.crc);
                    uint32_t rx = ((uint32_t)df[q + ds + dn] << 24) |
                                  ((uint32_t)df[q + ds + dn + 1] << 16) |
                                  ((uint32_t)df[q + ds + dn + 2] << 8) |
                                  (uint32_t)df[q + ds + dn + 3];
                    p->gse_crc_err = (crc != rx);
                    if (crc == rx)
                        emit_gre(out, sl.proto, sl.buf.data(),
                                 (long)sl.buf.size());
                    break;
                }
            }
            q += ds + glen;
        } else {
            if (q + 3 > dfl_bytes) break;   // truncated continuation header
            uint8_t frag = df[q + 2];
            long ds = 3; glen -= 1;
            if (glen < 0 || q + ds + glen > dfl_bytes) break;
            for (int rid = 0; rid < 3; rid++) {
                GSESlot& sl = p->gse[rid];
                if (sl.active && sl.frag_id == frag) {
                    sl.buf.insert(sl.buf.end(), df + q + ds, df + q + ds + glen);
                    sl.crc = crc32_update(df + q + ds, glen, sl.crc);
                    break;
                }
            }
            q += ds + glen;
        }
    }
}

static unsigned crc8_bits(const uint8_t* bytes, int nbits) {
    // reference check_crc8: reflected poly 0xAB, MSB-first bits
    unsigned crc = 0;
    for (int n = 0; n < nbits; n++) {
        int b = ((bytes[n / 8] >> (7 - (n % 8))) & 1) ^ (crc & 1);
        crc >>= 1;
        if (b) crc ^= 0xAB;
    }
    return crc;
}

void* tsparser_create(int kbch_bits) {
    auto* p = new TSParser();
    p->kbch_bytes = kbch_bits / 8;
    return p;
}

void tsparser_destroy(void* h) { delete static_cast<TSParser*>(h); }
long tsparser_bb_proc(void* h) { return static_cast<TSParser*>(h)->bb_proc; }
long tsparser_sync_errors(void* h) { return static_cast<TSParser*>(h)->sync_errors; }

// upstream frame loss (LDPC/BCH failure): drop partial reassembly and
// realign at the next frame's SYNCD (python BBFrameParser.mark_gap)
void tsparser_mark_gap(void* h) {
    auto* p = static_cast<TSParser*>(h);
    p->synched = false;
    p->count = 0;
    for (int i = 0; i < 3; i++) {       // drop partial GSE reassembly too
        p->gse[i].active = false;
        p->gse[i].buf.clear();
    }
}

// frames: n * kbch_bytes plaintext BBFRAMEs. Writes at most out_cap
// bytes into out (excess output is dropped — GSE PDUs reassembled across
// many frames can exceed n*kbch; callers size out_cap accordingly).
// returns bytes written (188-byte TS packets or GRE-wrapped PDUs).
long tsparser_feed(void* h, const uint8_t* frames, int n, uint8_t* out,
                   long out_cap) {
    auto* p = static_cast<TSParser*>(h);
    long out_p = 0;
    std::vector<uint8_t> gre;
    p->bb_proc = 0;   // per-call counts (reference last_bb_proc semantics)
    p->bb_cnt = 0;
    for (int f = 0; f < n; f++) {
        const uint8_t* bbf = frames + (long)f * p->kbch_bytes;
        p->bb_cnt++;
        if (crc8_bits(bbf, 80) != 0) { p->synched = false; continue; }
        unsigned ts_gs = bbf[0] >> 6;
        unsigned issyi = (bbf[0] >> 3) & 1;
        unsigned npd = (bbf[0] >> 2) & 1;
        unsigned upl = (bbf[2] << 8) | bbf[3];
        unsigned dfl = (bbf[4] << 8) | bbf[5];
        unsigned syncd = (bbf[7] << 8) | bbf[8];
        unsigned max_dfl = p->kbch_bytes * 8 - 80;
        if (dfl > max_dfl || (int)syncd >= (int)dfl - 8 || dfl % 8) {
            p->synched = false;
            continue;
        }
        memcpy(p->last_hdr, bbf, 10);   // metrics side channel
        p->has_hdr = true;
        if (ts_gs == 0b01) {
            // GSE (generic continuous), mirrored from the python parser
            p->bb_proc++;
            if (issyi || npd || upl != 0) continue;
            long pos = 0;
            if (!p->synched) {
                long skip = syncd / 8 + 1;
                if (skip > (long)(dfl / 8)) continue;
                pos = skip;
                p->synched = true;
            }
            feed_gse(p, bbf + 10, dfl / 8, pos, gre);
            continue;
        }
        if (ts_gs != 0b11) continue;   // packetized/reserved: ignored
        p->bb_proc++;
        const uint8_t* df = bbf + 10;
        long pos = 0, df_len = dfl / 8;
        // SYNCD consistency (see dvbs_tpu/io/bbframe_parser.py): while
        // synched, syncd/8 must equal (187 - count) mod 188 or the byte
        // stream jumped upstream — resync instead of free-running
        // (which would shift every later packet; the reference
        // free-runs, bbframe_ts_parser.cpp:193)
        if (p->synched && (long)(syncd / 8) != (187 - (long)p->count % 188 + 188) % 188) {
            p->synched = false;
            p->sync_errors++;
        }
        if (!p->synched) {
            long skip = syncd / 8 + 1;
            if (skip > df_len) continue;
            pos = skip;
            p->count = 0;
            p->synched = true;
        }
        if (p->count > 0) {
            int take = (int)std::min<long>(188 - p->count, df_len - pos);
            memcpy(p->partial + p->count, df + pos, take);
            p->count += take;
            pos += take;
            if (p->count == 188 && out_p + 188 <= out_cap) {
                out[out_p++] = 0x47;
                memcpy(out + out_p, p->partial, 187);
                out_p += 187;
                p->count = 0;
            } else if (p->count == 188) {
                p->count = 0;           // capacity exhausted: drop packet
            }
        }
        while (df_len - pos >= 188 && out_p + 188 <= out_cap) {
            out[out_p++] = 0x47;
            memcpy(out + out_p, df + pos, 187);
            out_p += 187;
            pos += 188;
        }
        long tail = df_len - pos;
        if (tail > 0) {
            memcpy(p->partial, df + pos, tail);
            p->count = (int)tail;
        }
    }
    if (!gre.empty()) {
        long take = std::min<long>((long)gre.size(), out_cap - out_p);
        if (take > 0) {
            memcpy(out + out_p, gre.data(), take);
            out_p += take;
        }
    }
    return out_p;
}

// latest validated BBHEADER (10 raw bytes); returns 0 if none seen yet
int tsparser_last_header(void* h, uint8_t* hdr10) {
    auto* p = static_cast<TSParser*>(h);
    if (!p->has_hdr) return 0;
    memcpy(hdr10, p->last_hdr, 10);
    return 1;
}

// ---- checkpoint/resume: serialize the parser's mutable state --------
// blob layout: synched(1) has_hdr(1) gse_crc_err(1) count(le32)
//              partial[188] last_hdr[10]
//              3x { active(1) frag(1) proto(le16) crc(le32) len(le32) buf }

static void put32(std::vector<uint8_t>& v, uint32_t x) {
    v.push_back(x & 0xFF); v.push_back((x >> 8) & 0xFF);
    v.push_back((x >> 16) & 0xFF); v.push_back((x >> 24) & 0xFF);
}
static uint32_t get32(const uint8_t* p) {
    return (uint32_t)p[0] | ((uint32_t)p[1] << 8) |
           ((uint32_t)p[2] << 16) | ((uint32_t)p[3] << 24);
}

long tsparser_state_size(void* h) {
    auto* p = static_cast<TSParser*>(h);
    long n = 3 + 4 + 188 + 10 + 4;   // +4: sync_errors (appended, le32)
    for (int i = 0; i < 3; i++) n += 1 + 1 + 2 + 4 + 4 + (long)p->gse[i].buf.size();
    return n;
}

void tsparser_get_state(void* h, uint8_t* out) {
    auto* p = static_cast<TSParser*>(h);
    std::vector<uint8_t> v;
    v.push_back(p->synched); v.push_back(p->has_hdr);
    v.push_back(p->gse_crc_err);
    put32(v, (uint32_t)p->count);
    v.insert(v.end(), p->partial, p->partial + 188);
    v.insert(v.end(), p->last_hdr, p->last_hdr + 10);
    for (int i = 0; i < 3; i++) {
        const GSESlot& sl = p->gse[i];
        v.push_back(sl.active); v.push_back(sl.frag_id);
        v.push_back(sl.proto & 0xFF); v.push_back((sl.proto >> 8) & 0xFF);
        put32(v, sl.crc);
        put32(v, (uint32_t)sl.buf.size());
        v.insert(v.end(), sl.buf.begin(), sl.buf.end());
    }
    put32(v, (uint32_t)p->sync_errors);   // appended (readers tolerate absence)
    memcpy(out, v.data(), v.size());
}

int tsparser_set_state(void* h, const uint8_t* in, long n) {
    auto* p = static_cast<TSParser*>(h);
    long q = 0;
    if (n < 3 + 4 + 188 + 10) return -1;
    p->synched = in[q++]; p->has_hdr = in[q++]; p->gse_crc_err = in[q++];
    p->count = (int)get32(in + q); q += 4;
    memcpy(p->partial, in + q, 188); q += 188;
    memcpy(p->last_hdr, in + q, 10); q += 10;
    for (int i = 0; i < 3; i++) {
        if (q + 12 > n) return -1;
        GSESlot& sl = p->gse[i];
        sl.active = in[q++]; sl.frag_id = in[q++];
        sl.proto = (unsigned)in[q] | ((unsigned)in[q + 1] << 8); q += 2;
        sl.crc = get32(in + q); q += 4;
        uint32_t len = get32(in + q); q += 4;
        if (q + (long)len > n) return -1;
        sl.buf.assign(in + q, in + q + len); q += len;
    }
    p->sync_errors = (q + 4 <= n) ? (long)get32(in + q) : 0;
    return 0;
}

}  // extern "C"

// ------------------------------------------------------- DVB-S host tail
// Post-Viterbi byte pipeline, fused: deframe -> Forney convolutional
// deinterleave (I=12, M=17) -> RS(204,188) decode -> energy-dispersal
// descramble -> TS packets. The reference runs this chain in C++ too
// (dvbs_ts_deframer.cpp, dvbs_interleaving.h:58-70 RX direction,
// dvbs_reedsolomon.h:17-47 via libcorrect fcr=0 nroots=16, and the
// dispersal PRBS of dvbs_scrambling.h); this one mirrors the python
// DVBSReceiver._host_tail (dvbs_tpu/models/dvbs.py) byte-for-byte so
// the two are interchangeable, including checkpoint state.

namespace rs204 {

constexpr int NK = 204, KK = 188, NROOTS = 16, TT = 8, PRIM = 0x11D;
static uint8_t gf_exp[512];
static uint8_t gf_log[256];
static bool gf_ready = false;

static void gf_init() {
    if (gf_ready) return;
    int x = 1;
    for (int i = 0; i < 255; i++) {
        gf_exp[i] = (uint8_t)x;
        gf_log[x] = (uint8_t)i;
        x <<= 1;
        if (x & 0x100) x ^= PRIM;
    }
    for (int i = 255; i < 512; i++) gf_exp[i] = gf_exp[i - 255];
    gf_log[0] = 0;  // never read (gmul/gdiv gate on zero operands)
    gf_ready = true;
}

static inline uint8_t gmul(uint8_t a, uint8_t b) {
    if (!a || !b) return 0;
    return gf_exp[gf_log[a] + gf_log[b]];
}
static inline uint8_t gdiv(uint8_t a, uint8_t b) {
    if (!a) return 0;
    return gf_exp[(gf_log[a] + 255 - gf_log[b]) % 255];
}
// evaluate poly (coeff index = power, degree deg) at alpha^e (e mod 255)
static uint8_t poly_eval(const uint8_t* c, int deg, int e) {
    uint8_t x = gf_exp[((e % 255) + 255) % 255];
    uint8_t acc = 0;
    for (int k = deg; k >= 0; k--) acc = gmul(acc, x) ^ c[k];
    return acc;
}

// Decode one codeword in place. Returns corrected byte count, or -1 on
// failure (codeword left unchanged) — the reference's error accounting
// (dvbs_reedsolomon.h:26-47).
static int decode(uint8_t* code) {
    gf_init();
    uint8_t S[NROOTS];
    bool clean = true;
    for (int j = 0; j < NROOTS; j++) {
        uint8_t aj = gf_exp[j];
        uint8_t acc = 0;
        for (int i = 0; i < NK; i++) acc = gmul(acc, aj) ^ code[i];
        S[j] = acc;
        clean = clean && (acc == 0);
    }
    if (clean) return 0;
    // Berlekamp-Massey
    uint8_t C[NROOTS + 1] = {1}, B[NROOTS + 1] = {1}, Tp[NROOTS + 1];
    int L = 0, m = 1;
    uint8_t b = 1;
    for (int n = 0; n < NROOTS; n++) {
        uint8_t d = S[n];
        for (int i = 1; i <= L; i++) d ^= gmul(C[i], S[n - i]);
        if (d == 0) {
            m++;
        } else if (2 * L <= n) {
            memcpy(Tp, C, sizeof(C));
            uint8_t coef = gdiv(d, b);
            for (int i = m; i <= NROOTS; i++) C[i] ^= gmul(coef, B[i - m]);
            L = n + 1 - L;
            memcpy(B, Tp, sizeof(B));
            b = d;
            m = 1;
        } else {
            uint8_t coef = gdiv(d, b);
            for (int i = m; i <= NROOTS; i++) C[i] ^= gmul(coef, B[i - m]);
            m++;
        }
    }
    if (L > TT) return -1;
    // Chien search: error at byte i <=> Lambda(alpha^-(203-i)) == 0
    int err_idx[TT];
    int nerr = 0;
    for (int i = 0; i < NK; i++) {
        if (poly_eval(C, L, -(NK - 1 - i)) == 0) {
            if (nerr >= L) return -1;      // more roots than degree
            err_idx[nerr++] = i;
        }
    }
    if (nerr != L) return -1;
    // Forney: Omega = S(x)*Lambda(x) mod x^16;
    // e_i = X_i * Omega(X_i^-1) / Lambda'(X_i^-1)   (fcr = 0)
    uint8_t om[NROOTS];
    for (int i = 0; i < NROOTS; i++) {
        uint8_t acc = 0;
        int jmax = i < L ? i : L;
        for (int j = 0; j <= jmax; j++) acc ^= gmul(C[j], S[i - j]);
        om[i] = acc;
    }
    uint8_t dC[(NROOTS + 1) / 2];      // Lambda'(x) in x^2: odd coeffs
    int ndc = 0;
    for (int k = 1; k <= NROOTS; k += 2) dC[ndc++] = C[k];
    uint8_t mag[TT];
    for (int k = 0; k < nerr; k++) {
        int p = NK - 1 - err_idx[k];
        uint8_t omv = poly_eval(om, NROOTS - 1, -p);
        // Lambda' at x = alpha^-p: sum dC[t] * alpha^(-2*p*t)
        uint8_t x2 = gf_exp[(((-2 * p) % 255) + 255) % 255];
        uint8_t lam = 0, xp = 1;
        for (int t = 0; t < ndc; t++) {
            lam ^= gmul(dC[t], xp);
            xp = gmul(xp, x2);
        }
        if (lam == 0) return -1;
        mag[k] = gmul(gf_exp[p % 255], gdiv(omv, lam));
    }
    for (int k = 0; k < nerr; k++) code[err_idx[k]] ^= mag[k];
    // verify: recompute syndromes; on failure restore the input
    for (int j = 0; j < NROOTS; j++) {
        uint8_t aj = gf_exp[j];
        uint8_t acc = 0;
        for (int i = 0; i < NK; i++) acc = gmul(acc, aj) ^ code[i];
        if (acc != 0) {
            for (int k = 0; k < nerr; k++) code[err_idx[k]] ^= mag[k];
            return -1;
        }
    }
    return L;
}

}  // namespace rs204

namespace {

constexpr int GROUP = 8 * 188;         // one dispersal group of TS bytes

// PRBS 1+x^14+x^15 byte mask for one group (seed 100101010000000,
// restarts per group, sync bytes never scrambled) — same construction
// as dvbs_tpu/spec/scrambling.dvbs_dispersal_mask
static uint8_t disp_mask[GROUP];
static bool disp_ready = false;
static void disp_init() {
    if (disp_ready) return;
    unsigned reg = 0x4A80;             // 0b100101010000000
    memset(disp_mask, 0, sizeof(disp_mask));
    for (int i = 1; i < GROUP; i++) {
        uint8_t by = 0;
        for (int k = 0; k < 8; k++) {
            unsigned bit = ((reg >> 1) ^ reg) & 1;
            reg = (reg >> 1) | (bit << 14);
            by = (by << 1) | bit;
        }
        disp_mask[i] = by;
    }
    for (int i = 0; i < GROUP; i += 188) disp_mask[i] = 0;
    disp_ready = true;
}

struct DVBSTail {
    Deframer df;
    uint8_t ring[12][187];             // branch j delays (11-j)*17 <= 187
    int rpos[12] = {0};
    std::vector<uint8_t> fifo;         // deinterleaved bytes pending sync
    bool group_sync = false;
    // per-feed stats (reset each dvbstail_feed)
    long last_frames = 0, last_groups_ok = 0, last_rs_n = 0;
    double last_rs_sum = 0.0;
    DVBSTail() { memset(ring, 0, sizeof(ring)); }
};

}  // namespace

extern "C" {

void* dvbstail_create(int max_resync_errors) {
    disp_init();
    rs204::gf_init();
    auto* t = new DVBSTail();
    t->df.max_resync_errors = max_resync_errors;
    return t;
}

void dvbstail_destroy(void* h) { delete static_cast<DVBSTail*>(h); }

long dvbstail_frames(void* h) { return static_cast<DVBSTail*>(h)->last_frames; }
long dvbstail_groups_ok(void* h) { return static_cast<DVBSTail*>(h)->last_groups_ok; }
long dvbstail_rs_count(void* h) { return static_cast<DVBSTail*>(h)->last_rs_n; }
double dvbstail_rs_avg(void* h) {
    auto* t = static_cast<DVBSTail*>(h);
    return t->last_rs_n ? t->last_rs_sum / t->last_rs_n : 0.0;
}
long dvbstail_sync_errors(void* h) {
    return static_cast<DVBSTail*>(h)->df.sync_errors;
}
long dvbstail_frames_total(void* h) {
    return static_cast<DVBSTail*>(h)->df.frames_ok;
}
long dvbstail_pending(void* h) {
    return (long)static_cast<DVBSTail*>(h)->fifo.size();
}

// feed n post-Viterbi hard bits (one per byte); writes descrambled TS
// bytes (multiples of 1504) into out. Returns bytes written.
long dvbstail_feed(void* h, const uint8_t* bits, long n,
                   uint8_t* out, long max_bytes) {
    auto* t = static_cast<DVBSTail*>(h);
    t->last_frames = t->last_groups_ok = t->last_rs_n = 0;
    t->last_rs_sum = 0.0;
    long maxf = n / FRAME_BITS + 2;
    std::vector<uint8_t> frames((size_t)maxf * FRAME_BYTES);
    int nf = deframer_feed(&t->df, bits, n, frames.data(), (int)maxf);
    t->last_frames = nf;

    size_t base = t->fifo.size();
    t->fifo.resize(base + (size_t)nf * FRAME_BYTES);
    for (int f = 0; f < nf; f++) {
        const uint8_t* in = &frames[(size_t)f * FRAME_BYTES];
        uint8_t* o = &t->fifo[base + (size_t)f * FRAME_BYTES];
        for (int i = 0; i < FRAME_BYTES; i++) {
            int j = i % 12;
            int d = (11 - j) * 17;
            if (d == 0) {
                o[i] = in[i];
            } else {
                o[i] = t->ring[j][t->rpos[j]];
                t->ring[j][t->rpos[j]] = in[i];
                t->rpos[j] = (t->rpos[j] + 1) % d;
            }
        }
    }

    long emitted = 0;
    size_t head = 0;
    while (t->fifo.size() - head >= 204) {
        size_t nw = (t->fifo.size() - head) / 204;
        if (!t->group_sync) {
            size_t k = 0;
            while (k < nw && t->fifo[head + k * 204] != 0xB8) k++;
            if (k == nw) {             // keep the last whole codeword
                head += (nw - 1) * 204;
                break;
            }
            head += k * 204;
            t->group_sync = true;
            nw -= k;
        }
        if (nw < 8) break;
        uint8_t* grp = &t->fifo[head];
        if (grp[0] != 0xB8) { t->group_sync = false; continue; }
        head += 8 * 204;
        if (emitted + GROUP > max_bytes) break;
        uint8_t* dst = out + emitted;
        bool grp_clean = true;
        for (int k = 0; k < 8; k++) {
            uint8_t cw[204];
            memcpy(cw, grp + k * 204, 204);
            int ne = rs204::decode(cw);
            t->last_rs_sum += (ne >= 0) ? ne : 8;
            t->last_rs_n++;
            grp_clean = grp_clean && ne >= 0;
            memcpy(dst + k * 188, cw, 188);
        }
        t->last_groups_ok += grp_clean;
        for (int i = 0; i < GROUP; i++) dst[i] ^= disp_mask[i];
        dst[0] = 0x47;
        emitted += GROUP;
    }
    t->fifo.erase(t->fifo.begin(), t->fifo.begin() + head);
    return emitted;
}

// ---- checkpoint: pieces exposed separately so the python wrapper can
// build the SAME state dict as the pure-python receiver (deframer blob,
// 12 deinterleaver FIFOs oldest-first, pending byte fifo, group_sync)

void* dvbstail_deframer(void* h) { return &static_cast<DVBSTail*>(h)->df; }
int dvbstail_group_sync(void* h) {
    return static_cast<DVBSTail*>(h)->group_sync;
}
void dvbstail_set_group_sync(void* h, int v) {
    static_cast<DVBSTail*>(h)->group_sync = v != 0;
}

// deinterleaver FIFOs: total 17*(1+2+..+11) = 1122 bytes, branch 0
// first, each branch serialized oldest-first (matches the python
// ConvDeinterleaver.fifos list layout)
void dvbstail_get_fifos(void* h, uint8_t* out) {
    auto* t = static_cast<DVBSTail*>(h);
    long q = 0;
    for (int j = 0; j < 12; j++) {
        int d = (11 - j) * 17;
        for (int i = 0; i < d; i++)
            out[q++] = t->ring[j][(t->rpos[j] + i) % d];
    }
}
void dvbstail_set_fifos(void* h, const uint8_t* in) {
    auto* t = static_cast<DVBSTail*>(h);
    long q = 0;
    for (int j = 0; j < 12; j++) {
        int d = (11 - j) * 17;
        for (int i = 0; i < d; i++) t->ring[j][i] = in[q++];
        t->rpos[j] = 0;
    }
}

void dvbstail_get_fifo(void* h, uint8_t* out) {
    auto* t = static_cast<DVBSTail*>(h);
    memcpy(out, t->fifo.data(), t->fifo.size());
}
int dvbstail_set_fifo(void* h, const uint8_t* in, long n) {
    if (n < 0) return -1;
    static_cast<DVBSTail*>(h)->fifo.assign(in, in + n);
    return 0;
}

}  // extern "C"
