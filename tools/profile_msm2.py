"""Fine-grained MSM stage profile mirroring ops/msm.py exactly.

profile_msm.py's bucket stage drifted (it still times the round-1
histogram-scatter; production uses searchsorted) — this tool times the
REAL _window_group sub-steps plus the full msm()/msm_point() programs, so
the stage sum can be reconciled against the end-to-end number.

    python tools/profile_msm2.py [--bits 20] [--window 16] [--groups 8]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=20)
    ap.add_argument("--window", type=int, default=16)
    ap.add_argument("--groups", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import random

    from wasmsnark_tpu.models.bn128 import bn128, R
    from wasmsnark_tpu.ops.fp import FpDevice
    from wasmsnark_tpu.ops.towers import FpAdapter
    from wasmsnark_tpu.ops.curve import JacobianDevice, map_leaf
    from wasmsnark_tpu.ops.msm import MSMDevice, fold_windows_device
    from wasmsnark_tpu.ops.fixed_base import FixedBase
    from wasmsnark_tpu.ops.scan import (
        seg_scan_parts_mixed, prefix_scan, reduce_last)
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
    F = C.F
    print(f"n=2^{args.bits} c={msm.c} W={W_total} group={G} "
          f"buckets/window={B}")

    def timeit(fn, *a, reps=3):
        g = jax.jit(fn)
        out = jax.block_until_ready(g(*a))
        t0 = time.time()
        for _ in range(reps):
            out = jax.block_until_ready(g(*a))
        return (time.time() - t0) / reps, out

    # ---- stage 1 decomposed ----
    t_sort, order = timeit(
        lambda mg: jnp.argsort(mg, axis=-1, stable=False), mag)
    t_dsgn, (d, sgn) = timeit(
        lambda mg, ng, o: (jnp.take_along_axis(mg, o, axis=-1),
                           jnp.take_along_axis(ng, o, axis=-1)),
        mag, neg, order)
    t_pgather, p_raw = timeit(
        lambda pts, o: map_leaf(pts, lambda a: jnp.take(a, o, axis=-1)),
        points, order)
    t_neg, p = timeit(
        lambda pr, sg: (pr[0], F.select(sg, F.neg(pr[1]), pr[1])),
        p_raw, sgn)

    # ---- stage 2: mixed segmented scan ----
    def scan_stage(d, p):
        prev = jnp.concatenate(
            [jnp.full((G, 1), 0xFFFFFFFF, jnp.uint32), d[:, :-1]], axis=-1)
        flags = d != prev
        return seg_scan_parts_mixed(C, flags, p)

    t_scan, (local, incoming, K) = timeit(scan_stage, d, p)

    # ---- stage 3: searchsorted + run-end gather (mirrors msm.py) ----
    def bucket_stage(d, local, incoming):
        bvals = jnp.arange(B, dtype=jnp.uint32)
        bq = jnp.broadcast_to(bvals[None, :], (G, B))
        start = jax.vmap(
            lambda ds, v: jnp.searchsorted(ds, v, side="left"))(
            d, bq).astype(jnp.int32)
        ends = jax.vmap(
            lambda ds, v: jnp.searchsorted(ds, v, side="right"))(
            d, bq).astype(jnp.int32)
        pos = jnp.maximum(ends - 1, 0)
        hit = ends > start
        c_idx = pos // K
        crosses = hit & (start < c_idx * K)

        def take_at(idx):
            return lambda a: jnp.take_along_axis(
                a, jnp.broadcast_to(idx, a.shape[:-1] + (B,)), axis=-1)

        g = map_leaf(local, take_at(pos))
        inc = map_leaf(incoming, take_at(c_idx))
        fixed = C.add(g, inc)
        sel = C.select(crosses, fixed, g)
        return map_leaf(
            sel, lambda a: jnp.where(hit, a, jnp.zeros_like(a)))

    t_buckets, buckets = timeit(bucket_stage, d, local, incoming)

    # sub-split: searchsorted alone
    def ss_only(d):
        bvals = jnp.arange(B, dtype=jnp.uint32)
        bq = jnp.broadcast_to(bvals[None, :], (G, B))
        s = jax.vmap(lambda ds, v: jnp.searchsorted(ds, v, side="left"))(d, bq)
        e = jax.vmap(lambda ds, v: jnp.searchsorted(ds, v, side="right"))(d, bq)
        return s, e
    t_ss, _ = timeit(ss_only, d)

    # ---- stage 4: triangle fold ----
    def fold_stage(buckets):
        rev = map_leaf(buckets, lambda a: a[..., 1:][..., ::-1])
        pref = prefix_scan(C, rev)
        win = reduce_last(C, pref)
        return map_leaf(win, lambda a: a[..., 0])

    t_tri, _ = timeit(fold_stage, buckets)

    # ---- full programs ----
    t_digits, _ = timeit(msm.signed_digits, scalars)
    t_msm, wins = timeit(msm.msm, scalars, points)
    t_fold, _ = timeit(
        lambda w: fold_windows_device(C, w, msm.c), wins)
    t_full, _ = timeit(msm.msm_point, scalars, points)

    n_groups = -(-W_total // G)
    stages = [("argsort", t_sort), ("digit+sign gather", t_dsgn),
              ("point gather", t_pgather), ("neg select", t_neg),
              ("mixed-scan", t_scan), ("bucket stage", t_buckets),
              ("  (searchsorted only)", t_ss), ("triangle-fold", t_tri)]
    total = sum(t for nm, t in stages if not nm.startswith("  "))
    for nm, t in stages:
        print(f"{nm:22s} {t*1e3:9.1f} ms")
    print(f"{'group total':22s} {total*1e3:9.1f} ms x {n_groups} groups "
          f"~= {total*n_groups*1e3:.0f} ms")
    print(f"{'signed_digits':22s} {t_digits*1e3:9.1f} ms")
    print(f"{'msm() windows':22s} {t_msm*1e3:9.1f} ms")
    print(f"{'window fold':22s} {t_fold*1e3:9.1f} ms")
    print(f"{'msm_point full':22s} {t_full*1e3:9.1f} ms "
          f"-> {n/t_full:,.0f} points/s")


if __name__ == "__main__":
    main()
