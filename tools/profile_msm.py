"""Stage-level MSM profile on the real chip: signed-recode / argsort /
point gather / mixed seg-scan / bucket gather / triangle fold timed
separately (each stage jitted in isolation, block_until_ready bracketing).
Stages mirror ops/msm.py MSMDevice._window_group for one window group.

    python tools/profile_msm.py [--bits 18] [--window 16] [--groups 8]
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
    ap.add_argument("--window", type=int, default=16)
    ap.add_argument("--groups", type=int, default=8,
                    help="windows per group (group_windows)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import random

    from wasmsnark_tpu.models.bn128 import bn128, R
    from wasmsnark_tpu.ops.fp import FpDevice
    from wasmsnark_tpu.ops.towers import FpAdapter
    from wasmsnark_tpu.ops.curve import JacobianDevice, map_leaf
    from wasmsnark_tpu.ops.msm import MSMDevice
    from wasmsnark_tpu.ops.fixed_base import FixedBase
    from wasmsnark_tpu.ops.scan import seg_scan_parts_mixed, prefix_scan, reduce_last
    from wasmsnark_tpu.utils.serialize import ints_to_limbs_fast

    n = 1 << args.bits
    m = bn128()
    Fp = FpDevice(m.fp_spec)
    C = JacobianDevice(FpAdapter(Fp))
    msm = MSMDevice(C, window_bits=args.window, group_windows=args.groups)

    rng = random.Random(0)
    ks = [rng.randrange(1, R) for _ in range(n)]
    fb = FixedBase(C, m.G1, m.g1_gen, Fp.pack_mont, 16 * m.fr_spec.n_limbs)
    points = jax.block_until_ready(
        jax.jit(fb.points_affine)(jnp.asarray(ints_to_limbs_fast(ks, 16))))
    scalars = jnp.asarray(ints_to_limbs_fast(
        [rng.randrange(R) for _ in range(n)], 16))

    mag_all, neg_all = jax.jit(msm.signed_digits)(scalars)
    G = min(args.groups, mag_all.shape[0])
    mag, neg = mag_all[:G], neg_all[:G]
    W_total, N = mag_all.shape
    B = (1 << (msm.c - 1)) + 1
    print(f"n=2^{args.bits} c={msm.c} W={W_total} group={G} "
          f"buckets/window={B}")

    @jax.jit
    def stage_sort(mag, neg):
        order = jnp.argsort(mag, axis=-1)
        d = jnp.take_along_axis(mag, order, axis=-1)
        sgn = jnp.take_along_axis(neg, order, axis=-1)
        return order, d, sgn

    @jax.jit
    def stage_gather(order, sgn, points):
        F = C.F
        p = map_leaf(points, lambda a: jnp.take(a, order, axis=-1))
        return (p[0], F.select(sgn, F.neg(p[1]), p[1]))

    @jax.jit
    def stage_scan(d, p):
        prev = jnp.concatenate(
            [jnp.full((G, 1), 0xFFFFFFFF, jnp.uint32), d[:, :-1]], axis=-1)
        flags = d != prev
        return seg_scan_parts_mixed(C, flags, p)

    @jax.jit
    def stage_buckets(d, local, incoming, K):
        bvals = jnp.arange(B, dtype=jnp.uint32)
        counts = jnp.zeros((G, B), jnp.int32).at[
            jnp.arange(G, dtype=jnp.int32)[:, None], d.astype(jnp.int32)
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

    t_sort, (order, d, sgn) = timeit(stage_sort, mag, neg)
    t_gather, p = timeit(stage_gather, order, sgn, points)
    t_scan, (local, incoming, K) = timeit(stage_scan, d, p)
    t_buckets, buckets = timeit(
        lambda d, l, i: stage_buckets(d, l, i, K), d, local, incoming)
    t_fold, win = timeit(stage_fold, buckets)
    total = t_sort + t_gather + t_scan + t_buckets + t_fold
    n_groups = -(-W_total // G)
    for name, t in [("argsort", t_sort), ("gather+neg", t_gather),
                    ("mixed-scan", t_scan), ("bucket-gather", t_buckets),
                    ("triangle-fold", t_fold)]:
        print(f"{name:14s} {t*1e3:9.1f} ms  {100*t/total:5.1f}%")
    est = total * n_groups
    print(f"{'group total':14s} {total*1e3:9.1f} ms x {n_groups} groups "
          f"~= {est*1e3:.0f} ms -> {n/est:,.0f} points/s")


if __name__ == "__main__":
    main()
