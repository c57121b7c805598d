// The reference's common/utils.cpp drags in nng (HTTP client) for unrelated
// helpers; the oracle build needs only the two soft-conversion functions
// declared in common/utils.h (behavior per common/utils.cpp:11-30).
#include <cstdint>

void signed_soft_to_unsigned(int8_t *in, uint8_t *out, int nsamples) {
    for (int i = 0; i < nsamples; i++) {
        out[i] = in[i] + 127;
        if (out[i] == 128)  // 128 marks erased symbols
            out[i] = 127;
    }
}

void char_array_to_uchar(int8_t *in, uint8_t *out, int nsamples) {
    for (int i = 0; i < nsamples; i++) {
        long lp = (long)in[i] + 128;
        if (lp < 0)
            lp = 0;
        if (lp > 255)
            lp = 255;
        out[i] = lp;
    }
}
