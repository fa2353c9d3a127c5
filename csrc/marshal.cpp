// Native host-side marshalling for wasmsnark_tpu.
//
// The runtime's host<->device boundary moves large flat binary blobs
// (proving keys in the tools/buildpkey.js layout, witness files in the
// tools/buildwitness.js layout) into limb-major uint32 planes [n_limbs, B]
// that device kernels consume.  This is the data-loader tier: the reference
// keeps it in JS over typed arrays (src/bn128.js:581-604 header slicing);
// here it is C++ compiled to a shared library and bound via ctypes, with a
// numpy fallback when the library is not built (utils/native.py).
//
// Layout contract (matches utils/serialize.py):
//   input : B elements, each elem_bytes little-endian bytes
//   output: uint32 planes, out[limb * B + b] = 16-bit limb `limb` of elem b

#include <cstdint>
#include <cstddef>
#include <cstring>

extern "C" {

// Flat LE fixed-width elements -> limb-major 16-bit planes in uint32 lanes.
// out must hold n_limbs * n_elems uint32.
void bytes_to_planes(const uint8_t* data, size_t n_elems, size_t elem_bytes,
                     uint32_t* out, size_t n_limbs) {
    const size_t half = elem_bytes / 2;
    const size_t k = half < n_limbs ? half : n_limbs;
    if (k < n_limbs) {
        std::memset(out + k * n_elems, 0,
                    (n_limbs - k) * n_elems * sizeof(uint32_t));
    }
    for (size_t b = 0; b < n_elems; ++b) {
        const uint8_t* e = data + b * elem_bytes;
        for (size_t l = 0; l < k; ++l) {
            out[l * n_elems + b] =
                (uint32_t)e[2 * l] | ((uint32_t)e[2 * l + 1] << 8);
        }
    }
}

// Inverse: limb-major planes -> flat LE fixed-width elements.
void planes_to_bytes(const uint32_t* planes, size_t n_limbs, size_t n_elems,
                     uint8_t* out, size_t elem_bytes) {
    const size_t half = elem_bytes / 2;
    const size_t k = half < n_limbs ? half : n_limbs;
    std::memset(out, 0, n_elems * elem_bytes);
    for (size_t b = 0; b < n_elems; ++b) {
        uint8_t* e = out + b * elem_bytes;
        for (size_t l = 0; l < k; ++l) {
            const uint32_t v = planes[l * n_elems + b];
            e[2 * l] = (uint8_t)(v & 0xFF);
            e[2 * l + 1] = (uint8_t)((v >> 8) & 0xFF);
        }
    }
}

// Strided point-component extraction: from an array of B points of
// point_bytes each, pull component `comp` (32B at offset comp*32) of every
// point into limb planes — one pass over the pkey section, no intermediate
// slices.  (src/bn128.js does the equivalent with typed-array slicing.)
void points_to_planes(const uint8_t* data, size_t n_points,
                      size_t point_bytes, size_t comp, uint32_t* out,
                      size_t n_limbs) {
    const size_t k = 16 < n_limbs ? 16 : n_limbs;  // 32B -> 16 limbs
    if (k < n_limbs) {
        std::memset(out + k * n_points, 0,
                    (n_limbs - k) * n_points * sizeof(uint32_t));
    }
    for (size_t b = 0; b < n_points; ++b) {
        const uint8_t* e = data + b * point_bytes + comp * 32;
        for (size_t l = 0; l < k; ++l) {
            out[l * n_points + b] =
                (uint32_t)e[2 * l] | ((uint32_t)e[2 * l + 1] << 8);
        }
    }
}

// Sparse QAP section parser (tools/buildpkey.js:79-89 record layout):
// per signal: u32 nCoefs, then nCoefs x (u32 coefIdx, n8-byte Fr Mont).
// Pass 1 returns the total coefficient count (or (size_t)-1 on a
// truncated section); pass 2 fills sig_idx/coef_idx (int32) and copies
// the packed Fr bytes contiguously for one vectorized limb decompose.
static inline uint32_t rd_u32(const uint8_t* p) {
    uint32_t v;
    std::memcpy(&v, p, 4);
    return v;  // little-endian hosts only (x86/ARM this image)
}

size_t count_sparse_coefs(const uint8_t* data, size_t len, size_t n_signals,
                          size_t n8) {
    size_t off = 0, total = 0;
    const size_t rec = 4 + n8;
    for (size_t i = 0; i < n_signals; ++i) {
        if (off + 4 > len) return (size_t)-1;
        const uint32_t n = rd_u32(data + off);
        off += 4 + (size_t)n * rec;
        if (off > len) return (size_t)-1;
        total += n;
    }
    return total;
}

void parse_sparse(const uint8_t* data, size_t n_signals, size_t n8,
                  int32_t* sig_idx, int32_t* coef_idx, uint8_t* coef_bytes) {
    size_t off = 0, k = 0;
    for (size_t i = 0; i < n_signals; ++i) {
        const uint32_t n = rd_u32(data + off);
        off += 4;
        for (uint32_t j = 0; j < n; ++j, ++k) {
            sig_idx[k] = (int32_t)i;
            coef_idx[k] = (int32_t)rd_u32(data + off);
            off += 4;
            std::memcpy(coef_bytes + k * n8, data + off, n8);
            off += n8;
        }
    }
}

}  // extern "C"
