// Measured CPU anchor for the wasmsnark baseline (BASELINE.md).
//
// No Node/WASM runtime exists in this image, so wasmsnark's own 50M-mul
// harness (test/f1.js:680-770) cannot run.  wasmsnark's stated goal is
// WASM at near-native speed (README.md:3-14), so a *native* C++ CIOS
// Montgomery multiply over the same BN254 q, same 32-bit-limb/64-bit-
// accumulator structure as the generated WASM (src/build_f1m.js:235-436),
// run on this machine's core, is a measured upper bound on what one
// wasmsnark worker can do here — i.e. a conservative anchor for every
// vs_baseline multiple.
//
//   g++ -O3 -o /tmp/anchor_f1m csrc/anchor_f1m.cpp && /tmp/anchor_f1m
//
// Prints ns per Montgomery mul and the implied 8-worker pool rate.

#include <cstdint>
#include <cstdio>
#include <ctime>

typedef uint32_t u32;
typedef uint64_t u64;

// BN254 q, little-endian 32-bit limbs
static const u32 Q[8] = {0xd87cfd47u, 0x3c208c16u, 0x6871ca8du, 0x97816a91u,
                         0x8181585du, 0xb85045b6u, 0xe131a029u, 0x30644e72u};
static const u32 NP32 = 0xe4866389u;  // -q^-1 mod 2^32

// CIOS Montgomery multiply: 8x8 32-bit limb product interleaved with
// per-column reduction (the structure of f1m_mul, build_f1m.js:235-436).
static void mont_mul(const u32 a[8], const u32 b[8], u32 out[8]) {
    u32 t[9] = {0};
    for (int i = 0; i < 8; i++) {
        u64 c = 0;
        for (int j = 0; j < 8; j++) {
            u64 s = (u64)t[j] + (u64)a[i] * b[j] + c;
            t[j] = (u32)s;
            c = s >> 32;
        }
        u64 hi = (u64)t[8] + c;
        u32 m = t[0] * NP32;
        c = ((u64)t[0] + (u64)m * Q[0]) >> 32;
        for (int j = 1; j < 8; j++) {
            u64 s = (u64)t[j] + (u64)m * Q[j] + c;
            t[j - 1] = (u32)s;
            c = s >> 32;
        }
        u64 s = hi + c;
        t[7] = (u32)s;
        t[8] = (u32)(s >> 32);
    }
    // conditional subtract (not timed separately; part of every mul)
    u64 borrow = 0;
    u32 r[8];
    for (int j = 0; j < 8; j++) {
        u64 d = (u64)t[j] - Q[j] - borrow;
        r[j] = (u32)d;
        borrow = (d >> 63) & 1;
    }
    bool ge = t[8] || !borrow;
    for (int j = 0; j < 8; j++) out[j] = ge ? r[j] : t[j];
}

int main() {
    u32 x[8], y[8];
    for (int i = 0; i < 8; i++) { x[i] = Q[i] ^ 0x5a5a5a5a; y[i] = Q[i] >> 1; }
    x[7] &= 0x0fffffff; y[7] &= 0x0fffffff;
    const long N = 50000000;  // the reference harness's 50M-mul loop
    struct timespec t0, t1;
    clock_gettime(CLOCK_MONOTONIC, &t0);
    for (long i = 0; i < N; i++) {
        mont_mul(x, y, x);  // chained: defeats dead-code elimination
    }
    clock_gettime(CLOCK_MONOTONIC, &t1);
    double sec = (t1.tv_sec - t0.tv_sec) + 1e-9 * (t1.tv_nsec - t0.tv_nsec);
    volatile u32 sink = x[0];
    (void)sink;
    printf("%ld muls in %.2f s: %.1f ns/mul, %.3g muls/s/core, "
           "%.3g muls/s on an 8-worker pool\n",
           N, sec, sec / N * 1e9, N / sec, 8 * N / sec);
    return 0;
}
