// Minimal stand-in for SDR++'s <dsp/types.h>, just enough to compile the
// reference's SDR++-free coding components as a test oracle.
#pragma once

namespace dsp {
    struct complex_t {
        float re;
        float im;
    };
}
