"""Multi-scalar multiplication (the prover's hot kernel) — TPU-native design.

The reference's MSM (src/build_multiexp.js) uses a batched-window subset-sum
scheme with lazily memoized tables and 256 per-bit accumulators — a
depth-optimized design for a scalar machine with random access.  Neither
memoized lookups nor data-dependent scatter vectorize on a TPU, so this is a
**bucketed Pippenger re-design** (SURVEY.md §7 step 4) with the bucket
accumulation expressed as sort + segmented scan, and with *all windows
processed as one batch axis* so the whole MSM is a handful of large fused
ops, not a loop:

  * window width = 16 bits = the limb width, so the digit matrix is exactly
    the scalar limb array [n_windows, N] — no recoding pass;
  * one vectorized argsort sorts every window's digits at once; one gather
    pulls points into [.., n_windows, N];
  * one inclusive segmented scan (jax.lax.associative_scan, log-depth,
    ~2N*W complete adds) turns equal-digit runs into running bucket sums;
    the run ends are scattered (unique indices per window, flattened with a
    per-window offset) into [.., n_windows, 2^16] bucket arrays;
  * the triangle fold sum_b b*S_b = sum_{b'} suffix_sum(S)_{b'} is one more
    batched associative scan over the bucket axis + a log tree reduce;
  * window results fold with a fori_loop (16 doublings + 1 add per window),
    traced once.

Completeness: the group combiner is the branch-free complete add
(ops/curve.py), so repeated points, zero points, inverse pairs, zero
scalars, and unreduced 256-bit scalars (the reference's r/s randomization
convention, src/bn128.js:642-704) are all handled per lane.

Result equals g1m_multiexp2's group sum (test replays the
test/bn128_prover.js:9-49 equivalence pattern against the oracle MSM).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .curve import JacobianDevice, map_leaf
from .scan import seg_scan_parts, prefix_scan, reduce_last
from ..fields.spec import LIMB_BITS


class MSMDevice:
    def __init__(self, curve: JacobianDevice, window_bits: int = 8):
        """window_bits: any width 1..16.  The cost model: sort + segmented
        scan scale with n_windows = ceil(256/c) while the bucket triangle
        scales with 2^c; c ~ 8-13 balances them on TPU (empirically c=8 at
        2^18; larger MSMs amortize bigger windows).  Analogue of the
        reference's tuned w=7 (src/bn128.js:109)."""
        assert 1 <= window_bits <= LIMB_BITS
        self.curve = curve
        self.c = window_bits

    def _digits(self, scalar_limbs):
        """[n_limbs, N] 16-bit limbs -> [n_windows, N] c-bit digits, LSB
        window first.  Windows may straddle limb boundaries: each is
        reassembled from the (at most two) limbs it overlaps."""
        c = self.c
        L, N = scalar_limbs.shape
        if c == LIMB_BITS:
            return scalar_limbs
        total_bits = L * LIMB_BITS
        n_win = (total_bits + c - 1) // c
        mask = jnp.uint32((1 << c) - 1)
        rows = []
        for w in range(n_win):
            lo_bit = c * w
            li, off = lo_bit // LIMB_BITS, lo_bit % LIMB_BITS
            val = scalar_limbs[li] >> off
            if off + c > LIMB_BITS and li + 1 < L:
                val = val | (scalar_limbs[li + 1] << (LIMB_BITS - off))
            rows.append(val & mask)
        return jnp.stack(rows, axis=0)

    def msm(self, scalar_limbs, points):
        """scalar_limbs: uint32 [n_limbs, N] — the scalars' 16-bit limb
        decomposition, LSB first.  points: (X, Y, Z) pytree, leaves
        [..., N], Montgomery-form Jacobian.  Returns per-window sums,
        leaves [..., n_windows] (LSB window first) — fold with
        fold_windows() on the host."""
        C = self.curve
        d_all = self._digits(jnp.asarray(scalar_limbs, jnp.uint32))
        W, N = d_all.shape
        B = 1 << self.c  # buckets per window
        scalar_limbs = d_all

        # ---- 1. sort each window's digits; gather points per window ----
        order = jnp.argsort(scalar_limbs, axis=-1)            # [W, N]
        d = jnp.take_along_axis(scalar_limbs, order, axis=-1)  # [W, N]
        p = map_leaf(points, lambda a: jnp.take(a, order, axis=-1))  # [.., W, N]

        # ---- 2. chunk-local segmented scan over the point axis ----
        # Only run-END values are consumed (bucket totals), so the full
        # two-pass segmented scan is overkill: one chunk-local pass + the
        # per-chunk incoming prefixes halve the dominant add count
        # (N*W adds instead of 2*N*W; the fixup below is <= 2^c*W adds).
        prev = jnp.concatenate(
            [jnp.full((W, 1), 0xFFFFFFFF, jnp.uint32), d[:, :-1]], axis=-1)
        flags = d != prev                                      # [W, N]
        local, incoming, K = seg_scan_parts(C, flags, p)

        # ---- 3. dense bucket array by binary search (gather, no scatter) ----
        # Each bucket's total is the run-end entry of its digit in the sorted
        # order.  A data-dependent scatter serializes badly on TPU (measured
        # ~70% of MSM wall time); instead an integer histogram + cumsum
        # finds, per bucket b, the index of the last sorted entry with
        # digit <= b — if that entry's digit == b the bucket is that run's
        # total, else the bucket is empty.
        bvals = jnp.arange(B, dtype=jnp.uint32)
        counts = jnp.zeros((W, B), jnp.int32).at[
            jnp.arange(W, dtype=jnp.int32)[:, None], d.astype(jnp.int32)
        ].add(1, mode="drop")
        ends = jnp.cumsum(counts, axis=-1)                      # [W, B]
        pos = jnp.maximum(ends - 1, 0)
        hit = jnp.take_along_axis(d, pos.astype(jnp.uint32), axis=-1) == bvals[None, :]
        # run start position; a run crossing its chunk boundary needs the
        # chunk's incoming prefix combined in (one add per bucket)
        start = ends - counts                                   # [W, B]
        c_idx = pos // K
        crosses = hit & (start < c_idx * K)

        def take_at(idx):
            return lambda a: jnp.take_along_axis(
                a, jnp.broadcast_to(idx, a.shape[:-1] + (B,)), axis=-1)

        g = map_leaf(local, take_at(pos))
        inc = map_leaf(incoming, take_at(c_idx))
        fixed = C.add(g, inc)
        sel = C.select(crosses, fixed, g)
        # zeroing X/Y/Z of empty buckets yields Z = 0 -> the complete add
        # treats them as the zero point; Y=0 is fine since Z=0 dominates.
        buckets = map_leaf(
            sel, lambda a: jnp.where(hit, a, jnp.zeros_like(a)))  # [.., W, B]

        # ---- 4. triangle fold: sum_{b>=1} b*S_b = sum suffix sums ----
        rev = map_leaf(buckets, lambda a: a[..., 1:][..., ::-1])  # S_{B-1}..S_1
        pref = prefix_scan(C, rev)                                # suffix sums
        win = reduce_last(C, pref)                                # [.., W, 1]
        # Window sums [.., W] are returned; the final MSB->LSB fold
        # (c doublings + 1 add per window, batch-1 work) belongs on the host
        # — the reference likewise folds tiny sequential tails on the main
        # thread while workers do the wide work (src/bn128.js:374-380).
        return map_leaf(win, lambda a: a[..., 0])


def fold_windows(oracle_curve, window_points, window_bits: int):
    """Host-side MSB->LSB fold of per-window sums (oracle bigint points)."""
    res = oracle_curve.zero()
    for p in reversed(window_points):
        for _ in range(window_bits):
            res = oracle_curve.double(res)
        res = oracle_curve.add(res, p)
    return res
