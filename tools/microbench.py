"""Per-op microbenchmarks mirroring the reference's harness points
(SURVEY.md §6): Montgomery mul throughput (the reference's 50M-mul loops,
test/f1.js:680-770), NTT throughput at 2^16/2^20, batched curve adds, and
the single-pairing latency printout (test/bn128.js:389-395).

Usage:  python tools/microbench.py [--ops fp,ntt,curve,pairing]
Prints one JSON line per measurement.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _bench(fn, *args, reps=5):
    import jax
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    return (time.time() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ops", default="fp,ntt,curve,pairing")
    ap.add_argument("--batch", type=int, default=1 << 20)
    args = ap.parse_args()
    which = set(args.ops.split(","))

    import jax
    import jax.numpy as jnp
    from wasmsnark_tpu.models.bn128 import bn128, R
    from wasmsnark_tpu.ops.fp import FpDevice
    from wasmsnark_tpu.ops.towers import FpAdapter
    from wasmsnark_tpu.ops.curve import JacobianDevice, map_leaf
    from wasmsnark_tpu.utils.serialize import ints_to_limbs

    dev = jax.devices()[0].platform
    m = bn128()
    Fp = FpDevice(m.fp_spec)
    rng = np.random.default_rng(1)

    def emit(metric, value, unit, **kw):
        print(json.dumps({"metric": metric, "value": round(value, 1),
                          "unit": unit, "device": dev, **kw}), flush=True)

    if "fp" in which:
        B = args.batch
        xs = jnp.asarray(ints_to_limbs(
            [int.from_bytes(rng.bytes(32), "little") % m.F1.q
             for _ in range(256)], 16))
        x = jnp.tile(xs, (1, B // 256))
        mul = jax.jit(Fp.mont_mul)
        t = _bench(mul, x, x)
        # the reference's anchor: 50M muls on one core ~ 80 ns/mul
        emit("f1m_mul throughput", B / t, "muls/s", batch=B,
             ns_per_mul=round(1e9 * t / B, 3))

    if "ntt" in which:
        from wasmsnark_tpu.ops.ntt import NTTDevice
        Fr = FpDevice(m.fr_spec)
        ntt = NTTDevice(m.ntt_spec, Fr)
        for bits in (16, 20):
            n = 1 << bits
            ev = jnp.asarray(ints_to_limbs(
                [int.from_bytes(rng.bytes(32), "little") % R
                 for _ in range(256)], 16))
            ev = jnp.tile(ev, (1, n // 256))
            f = jax.jit(ntt.fft)
            t = _bench(f, ev)
            emit(f"NTT 2^{bits}", n / t, "points/s", seconds=round(t, 4))

    if "curve" in which:
        B = args.batch // 4
        G1d = JacobianDevice(FpAdapter(Fp))
        gen = m.G1.affine(m.g1_gen)
        P = tuple(jnp.broadcast_to(jnp.asarray(Fp.pack_mont([c])), (Fp.L, B))
                  for c in gen[:3])
        add = jax.jit(G1d.add)
        t = _bench(add, P, P)
        emit("g1 complete add throughput", B / t, "adds/s", batch=B)

    if "pairing" in which:
        from wasmsnark_tpu.ops.pairing import bn128_pairing_device
        pd = bn128_pairing_device()
        p1 = m.G1.affine(m.G1.times_scalar(m.g1_gen, 10))
        q1 = m.G2.affine(m.g2_gen)
        for nb in (1, 64):
            g1 = pd.pack_g1([(p1[0], p1[1])] * nb)
            g2 = pd.pack_g2([(q1[0], q1[1])] * nb)
            full = jax.jit(
                lambda a, b: pd.final_exponentiation(pd.miller_loop(a, b)))
            t = _bench(full, g1, g2, reps=3)
            emit(f"BN128 pairing batch={nb}", 1e3 * t, "ms/batch",
                 per_pairing_ms=round(1e3 * t / nb, 2))


if __name__ == "__main__":
    main()
