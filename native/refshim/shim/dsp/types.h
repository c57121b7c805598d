// Minimal stand-in for SDR++'s <dsp/types.h>, just enough to compile the
// reference's SDR++-free coding components as a test oracle (the member
// operators below exist only because constellation.cpp uses them; the
// semantics are the standard complex ones SDR++ core provides).
#pragma once

#include <cmath>

namespace dsp {
    struct complex_t {
        float re;
        float im;

        complex_t operator+(const complex_t& o) const {
            return complex_t{re + o.re, im + o.im};
        }
        complex_t operator-(const complex_t& o) const {
            return complex_t{re - o.re, im - o.im};
        }
        complex_t operator*(const complex_t& o) const {
            return complex_t{re * o.re - im * o.im,
                             re * o.im + im * o.re};
        }
        complex_t operator*(float s) const {
            return complex_t{re * s, im * s};
        }
        complex_t operator/(float s) const {
            return complex_t{re / s, im / s};
        }
        complex_t conj() const { return complex_t{re, -im}; }
        float amplitude() const { return sqrtf(re * re + im * im); }
        float phase() const { return atan2f(im, re); }
    };
}
