// Stub for volk's aligned-vector allocator: plain std::vector is fine for
// the oracle build (the generic fixed kernel has no alignment requirement).
#pragma once
#include <cstdint>
#include <vector>

namespace volk {
template <class T>
using vector = std::vector<T>;
}
