"""Stage-level MSM profile on the real chip: argsort / seg-scan / bucket
gather / triangle fold timed separately (each stage jitted in isolation,
block_until_ready bracketing).  Usage:

    python tools/profile_msm.py [--bits 18] [--window 12]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=18)
    ap.add_argument("--window", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from wasmsnark_tpu.models.bn128 import bn128, R
    from wasmsnark_tpu.ops.fp import FpDevice
    from wasmsnark_tpu.ops.towers import FpAdapter
    from wasmsnark_tpu.ops.curve import JacobianDevice, map_leaf
    from wasmsnark_tpu.ops.msm import MSMDevice
    from wasmsnark_tpu.ops.scan import seg_scan_parts, prefix_scan, reduce_last
    from wasmsnark_tpu.utils.serialize import ints_to_limbs

    n = 1 << args.bits
    m = bn128()
    Fp = FpDevice(m.fp_spec)
    C = JacobianDevice(FpAdapter(Fp))
    msm = MSMDevice(C, window_bits=args.window)

    rng = np.random.default_rng(0)
    # synthetic distinct points: mont-form planes from a doubling ladder
    gen = m.G1.affine(m.g1_gen)
    base = tuple(jnp.broadcast_to(jnp.asarray(Fp.pack_mont([c])), (Fp.L, n))
                 for c in gen[:3])
    kbits = jnp.asarray(rng.integers(0, 2, size=(40, n), dtype=np.uint32))

    @jax.jit
    def make_points(kbits):
        def body(i, acc):
            acc = C.double(acc)
            added = C.add(acc, base)
            take = kbits[i] != 0
            return map_leaf2(added, acc, take)

        def map_leaf2(a, b, take):
            return jax.tree.map(lambda x, y: jnp.where(take[None], x, y), a, b)

        acc = jax.tree.map(lambda a: jnp.zeros_like(a), base)
        return jax.lax.fori_loop(0, 40, body, acc)

    points = jax.block_until_ready(make_points(kbits))
    scalars = jnp.asarray(
        ints_to_limbs([int(x) for x in
                       rng.integers(0, 1 << 62, size=n)], 16)) \
        if False else jnp.asarray(np.asarray(
            ints_to_limbs([int.from_bytes(rng.bytes(32), "little") % R
                           for _ in range(n)], 16)))

    d_all = jax.jit(msm._digits)(scalars)
    W, N = d_all.shape
    B = 1 << msm.c
    print(f"n=2^{args.bits} c={msm.c} W={W} buckets/window={B}")

    # stage jits
    @jax.jit
    def stage_sort(d_all):
        order = jnp.argsort(d_all, axis=-1)
        d = jnp.take_along_axis(d_all, order, axis=-1)
        return order, d

    @jax.jit
    def stage_gather(order, points):
        return map_leaf(points, lambda a: jnp.take(a, order, axis=-1))

    @jax.jit
    def stage_scan(d, p):
        prev = jnp.concatenate(
            [jnp.full((W, 1), 0xFFFFFFFF, jnp.uint32), d[:, :-1]], axis=-1)
        flags = d != prev
        return seg_scan_parts(C, flags, p)

    @jax.jit
    def stage_buckets(d, local, incoming, K):
        bvals = jnp.arange(B, dtype=jnp.uint32)
        counts = jnp.zeros((W, B), jnp.int32).at[
            jnp.arange(W, dtype=jnp.int32)[:, None], d.astype(jnp.int32)
        ].add(1, mode="drop")
        ends = jnp.cumsum(counts, axis=-1)
        pos = jnp.maximum(ends - 1, 0)
        hit = jnp.take_along_axis(
            d, pos.astype(jnp.uint32), axis=-1) == bvals[None, :]
        start = ends - counts
        c_idx = pos // K
        crosses = hit & (start < c_idx * K)

        def take_at(idx):
            return lambda a: jnp.take_along_axis(
                a, jnp.broadcast_to(idx, a.shape[:-1] + (B,)), axis=-1)

        g = map_leaf(local, take_at(pos))
        inc = map_leaf(incoming, take_at(c_idx))
        sel = C.select(crosses, C.add(g, inc), g)
        return map_leaf(sel, lambda a: jnp.where(hit, a, jnp.zeros_like(a)))

    @jax.jit
    def stage_fold(buckets):
        rev = map_leaf(buckets, lambda a: a[..., 1:][..., ::-1])
        pref = prefix_scan(C, rev)
        win = reduce_last(C, pref)
        return map_leaf(win, lambda a: a[..., 0])

    def timeit(fn, *a, reps=3):
        out = jax.block_until_ready(fn(*a))  # compile
        t0 = time.time()
        for _ in range(reps):
            out = jax.block_until_ready(fn(*a))
        return (time.time() - t0) / reps, out

    t_sort, (order, d) = timeit(stage_sort, d_all)
    t_gather, p = timeit(stage_gather, order, points)
    t_scan, (local, incoming, K) = timeit(stage_scan, d, p)
    t_buckets, buckets = timeit(
        lambda d, l, i: stage_buckets(d, l, i, K), d, local, incoming)
    t_fold, win = timeit(stage_fold, buckets)
    total = t_sort + t_gather + t_scan + t_buckets + t_fold
    for name, t in [("argsort", t_sort), ("point-gather", t_gather),
                    ("seg-scan", t_scan), ("bucket-gather", t_buckets),
                    ("triangle-fold", t_fold)]:
        print(f"{name:14s} {t*1e3:9.1f} ms  {100*t/total:5.1f}%")
    print(f"{'total':14s} {total*1e3:9.1f} ms  -> {n/total:,.0f} points/s")


if __name__ == "__main__":
    main()
