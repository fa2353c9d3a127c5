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
    ap.add_argument("--dbits", type=int, default=12,
                    help="log2 distinct base points (tiled to n: MSM cost "
                         "depends only on scalars, and n distinct "
                         "fixed-base points OOM at 2^20)")
    ap.add_argument("--sweep", default="",
                    help="comma list of group_windows values: time the full "
                         "msm_point for each (reuses the generated points)")
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

    n, nd = 1 << args.bits, 1 << min(args.bits, args.dbits)
    m = bn128()
    Fp = FpDevice(m.fp_spec)
    C = JacobianDevice(FpAdapter(Fp))
    msm = MSMDevice(C, window_bits=args.window, group_windows=args.groups)

    rng = random.Random(0)
    ks = [rng.randrange(1, R) for _ in range(nd)]
    fb = FixedBase(C, m.G1, m.g1_gen, Fp.pack_mont, 16 * m.fr_spec.n_limbs)
    from wasmsnark_tpu.utils.chiptime import sync, time_reps, read_latency
    base = jax.jit(fb.points_affine)(
        jnp.asarray(ints_to_limbs_fast(ks, 16)))
    points = jax.tree.map(lambda a: jnp.tile(a, (1, n // nd)), base)
    sync(points)
    scalars = jnp.asarray(ints_to_limbs_fast(
        [rng.randrange(R) for _ in range(n)], 16))
    print(f"tunnel read latency: {read_latency()*1e3:.0f} ms")

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
        out = g(*a)
        sync(out)  # compile + complete (axon block_until_ready is a no-op)
        return time_reps(g, *a, reps=reps, warm=False), out

    # ---- stage 1: one sort (key packs magnitude+sign, payload lane) ----
    from wasmsnark_tpu.ops.msm import _gather_rows, _gather_rows_per_window

    def sort_stage(mg, ng):
        key = (mg << 1) | ng.astype(jnp.uint32)
        lane = jnp.broadcast_to(
            jnp.arange(N, dtype=jnp.int32)[None, :], (G, N))
        skey, order = jax.lax.sort((key, lane), num_keys=1, is_stable=False)
        return skey >> 1, (skey & 1).astype(bool), order

    t_sort, (d, sgn, order) = timeit(sort_stage, mag, neg)

    # ---- stage 2: packed row-major point gather + neg select ----
    from wasmsnark_tpu.ops.msm import _pack_rows, _unpack_gathered
    t_trans, _ = timeit(lambda pts: _pack_rows(pts)[0], points)
    rows, meta = _pack_rows(points)  # meta holds a treedef (host-side)
    t_pgather, p_raw = timeit(
        lambda rw, o: _unpack_gathered(_gather_rows(rw, o), meta),
        rows, order)
    t_neg, p = timeit(
        lambda pr, sg: (pr[0], F.select(sg, F.neg(pr[1]), pr[1])),
        p_raw, sgn)

    # ---- stage 3: mixed segmented scan ----
    def scan_stage(d, p):
        prev = jnp.concatenate(
            [jnp.full((G, 1), 0xFFFFFFFF, jnp.uint32), d[:, :-1]], axis=-1)
        flags = d != prev
        return seg_scan_parts_mixed(C, flags, p)

    t_scan, (local, incoming, K) = timeit(scan_stage, d, p)

    # ---- stage 4: MXU one-hot histogram -> run ends ----
    def hist_stage(mg):
        hi = (mg >> 7).astype(jnp.int32)
        lo = (mg & 127).astype(jnp.int32)
        n_hi = (B - 2 >> 7) + 1
        hist = jnp.zeros((G, n_hi, 128), jnp.int32)
        step = min(N, 1 << 17)
        for s in range(0, N, step):
            oh_hi = (hi[:, None, s:s + step]
                     == jnp.arange(n_hi, dtype=jnp.int32)[None, :, None]
                     ).astype(jnp.int8)
            oh_lo = (lo[:, s:s + step, None]
                     == jnp.arange(128, dtype=jnp.int32)[None, None, :]
                     ).astype(jnp.int8)
            hist = hist + jax.lax.dot_general(
                oh_hi, oh_lo, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)
        ends = jnp.cumsum(hist.reshape(G, n_hi * 128), axis=-1)[:, :B - 1]
        return jnp.concatenate(
            [ends, jnp.full((G, 1), N, jnp.int32)], axis=-1)

    t_hist, ends = timeit(hist_stage, mag)

    # ---- stage 5: run-end extraction (row gathers) + bucket select ----
    def extract_stage(ends, local, incoming):
        start = jnp.concatenate(
            [jnp.zeros((G, 1), jnp.int32), ends[:, :-1]], axis=-1)
        pos = jnp.maximum(ends - 1, 0)
        hit = ends > start
        c_idx = pos // K
        crosses = hit & (start < c_idx * K)
        g = _gather_rows_per_window(local, pos)
        inc = _gather_rows_per_window(incoming, c_idx)
        fixed = C.add(g, inc)
        sel = C.select(crosses, fixed, g)
        return map_leaf(
            sel, lambda a: jnp.where(hit, a, jnp.zeros_like(a)))

    t_buckets, buckets = timeit(extract_stage, ends, local, incoming)

    # ---- stage 6: triangle fold ----
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
    stages = [("sort(key,lane)", t_sort),
              ("  row transpose (1x/msm)", t_trans),
              ("point row-gather", t_pgather), ("neg select", t_neg),
              ("mixed-scan", t_scan), ("MXU histogram", t_hist),
              ("run-end extract", t_buckets), ("triangle-fold", t_tri)]
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

    # ---- group-size sweep (reuses points; full msm_point per gw) ----
    for gw in [int(x) for x in args.sweep.split(",") if x]:
        msm_g = MSMDevice(C, window_bits=args.window, group_windows=gw)
        t_g, _ = timeit(msm_g.msm_point, scalars, points)
        print(f"gw={gw:<3d} msm_point        {t_g*1e3:9.1f} ms "
              f"-> {n/t_g:,.0f} points/s")


if __name__ == "__main__":
    main()
