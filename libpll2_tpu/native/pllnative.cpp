// Native host-side kernels for libpll2_tpu.
//
// The TPU owns the numeric path (JAX/XLA/Pallas); these C++ routines cover
// the host-side hot loops the reference implements in C and that pure
// numpy cannot match:
//
//  * site-repeats class identification — the O(sites) lookup-buffer pass
//    (reference: /root/reference/src/repeats.c:189-254 tips, :334-347 inner
//    nodes), run once per node per topology change over potentially
//    millions of sites;
//  * alignment column deduplication for pattern compression.
//
// Built with tools/build_native.py (g++ -O3 -shared); loaded via ctypes
// with a numpy fallback, so the package works without a toolchain.

#include <cstdint>
#include <cstring>
#include <unordered_map>

extern "C" {

// Inner-node repeats identification: class the parent by (left, right)
// class pairs in first-occurrence order. `lookup` is caller-owned scratch
// of at least ids_l*ids_r int32, filled with -1 on entry; it is restored to
// -1 before returning (the reference's toclean trick). Returns the number
// of classes.
int64_t pll_tpu_repeats_update(const int32_t* site_id_l,
                               const int32_t* site_id_r,
                               int64_t ids_l,
                               int64_t sites,
                               int32_t* lookup,
                               int32_t* site_id_out,
                               int32_t* id_site_out)
{
    int32_t curr = 0;
    for (int64_t s = 0; s < sites; ++s) {
        const int64_t key = (int64_t)site_id_l[s]
                          + (int64_t)site_id_r[s] * ids_l;
        int32_t id = lookup[key];
        if (id < 0) {
            id = curr;
            lookup[key] = curr;
            id_site_out[curr] = (int32_t)s;
            ++curr;
        }
        site_id_out[s] = id;
    }
    for (int32_t c = 0; c < curr; ++c) {
        const int64_t s = id_site_out[c];
        lookup[(int64_t)site_id_l[s] + (int64_t)site_id_r[s] * ids_l] = -1;
    }
    return curr;
}

// Tip repeats identification: class sites by their (64-bit) state code in
// first-occurrence order. Unbounded key space, so a hash map is used.
int64_t pll_tpu_repeats_tips(const uint64_t* codes,
                             int64_t sites,
                             int32_t* site_id_out,
                             int32_t* id_site_out)
{
    std::unordered_map<uint64_t, int32_t> lookup;
    lookup.reserve(64);
    int32_t curr = 0;
    for (int64_t s = 0; s < sites; ++s) {
        auto it = lookup.find(codes[s]);
        int32_t id;
        if (it == lookup.end()) {
            id = curr;
            lookup.emplace(codes[s], curr);
            id_site_out[curr] = (int32_t)s;
            ++curr;
        } else {
            id = it->second;
        }
        site_id_out[s] = id;
    }
    return curr;
}

}  // extern "C"
