// Stub for <volk/volk.h>: cc_decoder.cpp only queries the kernel registry
// to look for "spiral"/"neonspiral"; reporting zero implementations makes it
// fall back to the bundled fixed generic kernel (the bit-exact reference
// behavior on machines without those volk kernels).
#pragma once
#include <cstddef>
#include <cstdint>
#include <cstring>
#include <sstream>
#include <stdexcept>
#include <string>

struct volk_func_desc {
    const char **impl_names;
    const int *impl_deps;
    const bool *impl_alignment;
    size_t n_impls;
};
typedef volk_func_desc volk_func_desc_t;

// Referenced by the (unreached) spiral/neonspiral wrappers in
// volk_k7_r2_generic_fixed.h; never called because n_impls == 0 above.
static inline void volk_8u_x4_conv_k7_r2_8u_manual(
    unsigned char *, unsigned char *, unsigned char *, unsigned char *,
    unsigned int, unsigned int, unsigned char *, const char *) {}

static inline volk_func_desc volk_8u_x4_conv_k7_r2_8u_get_func_desc() {
    volk_func_desc d;
    d.impl_names = nullptr;
    d.impl_deps = nullptr;
    d.impl_alignment = nullptr;
    d.n_impls = 0;
    return d;
}
