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
    long n = 3 + 4 + 188 + 10;
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
    return 0;
}

}  // extern "C"
