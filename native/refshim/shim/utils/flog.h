// Minimal stand-in for SDR++'s <utils/flog.h> (logging macros the
// reference's constellation.cpp pulls in; the oracle build discards logs).
#pragma once

namespace flog {
    template <typename... A> inline void info(A...) {}
    template <typename... A> inline void warn(A...) {}
    template <typename... A> inline void error(A...) {}
    template <typename... A> inline void debug(A...) {}
}
