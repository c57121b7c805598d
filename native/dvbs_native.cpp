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

// ------------------------------------------------------------- TS parser

struct TSParser {
    int kbch_bytes = 0;
    bool synched = false;
    int count = 0;
    uint8_t partial[188];
    long bb_proc = 0;
    long bb_cnt = 0;
};

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

// frames: n * kbch_bytes plaintext BBFRAMEs. out must hold n*kbch bytes.
// returns bytes written (whole 188-byte TS packets, 0x47-sync'd).
long tsparser_feed(void* h, const uint8_t* frames, int n, uint8_t* out) {
    auto* p = static_cast<TSParser*>(h);
    long out_p = 0;
    p->bb_proc = 0;   // per-call counts (reference last_bb_proc semantics)
    p->bb_cnt = 0;
    for (int f = 0; f < n; f++) {
        const uint8_t* bbf = frames + (long)f * p->kbch_bytes;
        p->bb_cnt++;
        if (crc8_bits(bbf, 80) != 0) { p->synched = false; continue; }
        unsigned ts_gs = bbf[0] >> 6;
        unsigned dfl = (bbf[4] << 8) | bbf[5];
        unsigned syncd = (bbf[7] << 8) | bbf[8];
        unsigned max_dfl = p->kbch_bytes * 8 - 80;
        if (dfl > max_dfl || (int)syncd >= (int)dfl - 8 || dfl % 8) {
            p->synched = false;
            continue;
        }
        if (ts_gs != 0b11) continue;   // GSE handled by the python parser
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
            if (p->count == 188) {
                out[out_p++] = 0x47;
                memcpy(out + out_p, p->partial, 187);
                out_p += 187;
                p->count = 0;
            }
        }
        while (df_len - pos >= 188) {
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
    return out_p;
}

}  // extern "C"
