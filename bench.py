"""Benchmark driver: BN128 G1 MSM throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "points/s", "vs_baseline": x, ...}

Baseline anchor (documented, since the reference publishes no numbers and
node.js is absent from this image — BASELINE.md):  wasmsnark's production
MSM (g1m_multiexp2, w=7; src/build_multiexp.js:583-838) performs ~367
Jacobian adds per 7-point group (256 accumulator adds + ~111 expected lazy
subset-sum fills) ~= 52 adds/point; at ~16 Montgomery muls/add and the
~80 ns/mul wasmsnark's own 50M-mul harness exhibits on a modern core
(test/f1.js:680-770 class hardware), that is ~67 us/point/core, or
~1.2e5 points/s on the reference's default 8-worker pool
(src/bn128.js:209-215).  vs_baseline = ours / 1.2e5.

Env knobs: BENCH_MSM_BITS (default 18), BENCH_WINDOW_BITS (default 16).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from wasmsnark_tpu.models.bn128 import bn128, R
    from wasmsnark_tpu.ops.fp import FpDevice
    from wasmsnark_tpu.ops.towers import FpAdapter
    from wasmsnark_tpu.ops.curve import JacobianDevice
    from wasmsnark_tpu.ops.msm import MSMDevice
    from wasmsnark_tpu.utils.serialize import ints_to_limbs

    bits = int(os.environ.get("BENCH_MSM_BITS", "18"))
    wbits = int(os.environ.get("BENCH_WINDOW_BITS", "12"))
    n = 1 << bits

    m = bn128()
    Fp = FpDevice(m.fp_spec)
    G1d = JacobianDevice(FpAdapter(Fp))
    msm = MSMDevice(G1d, window_bits=wbits)

    # --- inputs: distinct pseudo-random points k_i * G built on device ---
    rng = np.random.default_rng(0)
    kbits = jnp.asarray(rng.integers(0, 2, size=(64, n), dtype=np.uint32))
    gen = m.G1.affine(m.g1_gen)
    base = tuple(
        jnp.broadcast_to(jnp.asarray(Fp.pack_mont([c])), (Fp.L, n))
        for c in gen[:3]
    )

    @jax.jit
    def make_points(kbits):
        def body(i, acc):
            acc = G1d.double(acc)
            added = G1d.add(acc, base)
            return G1d.select(kbits[i] != 0, added, acc)
        zero = G1d.zero_like(base)
        return jax.lax.fori_loop(0, 64, body, zero)

    t0 = time.time()
    points = jax.block_until_ready(make_points(kbits))
    gen_time = time.time() - t0

    scalars = jnp.asarray(ints_to_limbs(
        [int.from_bytes(rng.bytes(32), "little") % R for _ in range(n)], 16))

    from wasmsnark_tpu.ops.msm import fold_windows

    def full(scalars, points):
        win = run(scalars, points)
        xs = Fp.unpack_mont(np.asarray(win[0]))
        ys = Fp.unpack_mont(np.asarray(win[1]))
        zs = Fp.unpack_mont(np.asarray(win[2]))
        return fold_windows(m.G1, list(zip(xs, ys, zs)), wbits)

    run = jax.jit(msm.msm)
    t0 = time.time()
    full(scalars, points)
    compile_time = time.time() - t0

    reps = 3
    t0 = time.time()
    for _ in range(reps):
        res = full(scalars, points)
    dt = (time.time() - t0) / reps

    pps = n / dt
    baseline = 1.2e5  # wasmsnark 8-worker CPU anchor (see module docstring)
    out = {
        "metric": f"BN128 G1 MSM points/sec/chip @ 2^{bits}",
        "value": round(pps, 1),
        "unit": "points/s",
        "vs_baseline": round(pps / baseline, 3),
        "msm_seconds": round(dt, 3),
        "window_bits": wbits,
        "compile_seconds": round(compile_time, 1),
        "point_gen_seconds": round(gen_time, 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
