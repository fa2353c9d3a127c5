"""Multi-scalar multiplication (the prover's hot kernel) — TPU-native design.

The reference's MSM (src/build_multiexp.js) uses a batched-window subset-sum
scheme with lazily memoized tables and 256 per-bit accumulators — a
depth-optimized design for a scalar machine with random access.  Neither
memoized lookups nor data-dependent scatter vectorize on a TPU, so this is a
**bucketed Pippenger re-design** (SURVEY.md §7 step 4) with the bucket
accumulation expressed as sort + segmented scan, and with *all windows
processed as one batch axis* so the whole MSM is a handful of large fused
ops, not a loop:

  * scalars are recoded to **signed digits** in [-2^(c-1), 2^(c-1)]
    (the device analogue of build_timesscalarnaf.js's signed-digit ladder):
    negative digits flip the point's Y, halving the bucket range — the
    triangle fold and bucket arrays cost 2^(c-1)+1 instead of 2^c;
  * points enter **affine** ((X, Y), zero = (0, 0) — the pkey storage form,
    tools/buildpkey.js), so the dominant accumulation pass uses the mixed
    add madd-2007-bl (11 muls) instead of the complete add (16), and point
    gathers move 2/3 the bytes;
  * one vectorized argsort sorts every window's digit magnitudes at once;
    one gather pulls points into [.., n_windows, N];
  * one chunk-local segmented scan (lax.scan, log-depth carry recursion,
    ~N*W mixed adds) turns equal-digit runs into running bucket sums; the
    run ends are located per bucket with a histogram + cumsum (gather, no
    scatter);
  * the triangle fold sum_b b*S_b = sum_{b'} suffix_sum(S)_{b'} is one more
    batched associative scan over the bucket axis + a log tree reduce;
  * windows are processed in groups of `group_windows` so peak HBM for the
    gathered/scanned point arrays stays bounded at large N (2^20-point
    MSMs with 16-bit windows would otherwise materialize multi-GB
    intermediates);
  * the per-window results fold to one point ON DEVICE (fold_windows_device:
    c doublings + 1 add per window under fori_loop), so a prover can
    dispatch many MSMs back-to-back with no host round-trip between them
    (the reference's equivalent concurrency: 5 MSMs in flight over the
    worker pool, src/bn128.js:607-622).

Completeness: the group combiners are the branch-free complete add/madd
(ops/curve.py), so repeated points, zero points, inverse pairs, zero
scalars, and unreduced 256-bit scalars (the reference's r/s randomization
convention, src/bn128.js:642-704) are all handled per lane.

Result equals g1m_multiexp2's group sum (tests replay the
test/bn128_prover.js:9-49 equivalence pattern against the oracle MSM,
including the production window width).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from .curve import map_leaf
from .scan import seg_scan_parts_mixed, prefix_scan, reduce_last
from ..fields.spec import LIMB_BITS


def _gather_rows(rows, order):
    """Row gather: rows [N, *lead] (lane index MAJOR — each gathered row is
    the contiguous limb data of one point coordinate), order [G, N] ->
    [*lead, G, N].  TPU row gathers run at full speed for rows up to
    ~64 B and fall off a CLIFF above that (a [N, 32]-u32 gather costs
    5.6x a [N, 16]-u32 one — tools/gather_micro.py, honest-sync), while
    minor-axis (lane) gathers scalarize entirely.  Callers keep rows at or
    under 16 u32 via the 16-bit pair packing in _pack_rows."""
    G, N = order.shape
    (W,) = rows.shape[1:]
    flat = order.reshape(-1)
    # keep each gathered row at or under 16 u32 (64 B): wider row matrices
    # (G2's 4 packed coords, the Jacobian extraction's 3) are gathered as
    # independent <=64 B column groups, each at full row-gather speed
    parts = []
    for s in range(0, W, 16):
        g = jnp.take(rows[:, s:s + 16], flat, axis=0)
        parts.append(jnp.transpose(
            g.reshape(G, N, g.shape[-1]), (2, 0, 1)))
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def _pack_rows(tree):
    """Pytree with 16-bit limb-plane leaves [L_i, N] -> (rows
    [N, ceil(sum L_i / 2)] u32, meta).  Every limb value is 16-bit (the
    canonical Montgomery plane layout), so ADJACENT LIMB PAIRS ARE PACKED
    TWO PER u32: a BN128 affine point (2 coords x 16 limbs) becomes one
    64-byte row — at or under the TPU row-gather sweet spot — instead of a
    128-byte row that gathers 5.6x slower (tools/gather_micro.py C vs C2).
    _unpack_gathered splits the pairs back out with shift/mask (cheap
    elementwise VPU work) after the gather."""
    leaves, treedef = jax.tree.flatten(tree)
    N = leaves[0].shape[-1]
    planes = jnp.concatenate([a.reshape(-1, N) for a in leaves], axis=0)
    tot = planes.shape[0]
    if tot % 2:
        planes = jnp.concatenate(
            [planes, jnp.zeros((1, N), planes.dtype)], axis=0)
    packed = (planes[0::2] & 0xFFFF) | (planes[1::2] << 16)
    rows = packed.T                                          # [N, ceil/2]
    sizes = [int(np.prod(a.shape[:-1])) for a in leaves]
    shapes = [a.shape[:-1] for a in leaves]
    return rows, (treedef, sizes, shapes, tot)


def _unpack_gathered(g, meta):
    """g [ceil(sum L_i / 2), G, N] (output of _gather_rows on 16-bit-pair
    packed rows) -> pytree with leaves [*lead_i, G, N]."""
    treedef, sizes, shapes, tot = meta
    full = jnp.stack([g & 0xFFFF, g >> 16], axis=1)
    full = full.reshape((2 * g.shape[0],) + g.shape[1:])[:tot]
    out, off = [], 0
    for sz, shp in zip(sizes, shapes):
        out.append(full[off:off + sz].reshape(shp + g.shape[1:]))
        off += sz
    return jax.tree.unflatten(treedef, out)


def _gather_rows_per_window(tree, idx):
    """Per-window row gather of a whole pytree: leaves [*lead_i, G, S],
    idx [G, B] -> leaves [*lead_i, G, B].  All leaves are packed into one
    [G*S, sum L_i] row matrix so the extraction is ONE flat row gather
    (the minor-axis take_along_axis this replaces was ~50x slower).
    B << S here (bucket run-ends out of the full point axis), so the
    gather itself is ~3 ms and the dominant cost is the row-matrix
    transpose — 16-bit pair packing does not pay off at this shape
    (measured: it DOUBLED the stage by adding a pack pass over the
    3.4 GB scan output)."""
    leaves, treedef = jax.tree.flatten(tree)
    G, S = leaves[0].shape[-2:]
    B = idx.shape[-1]
    sizes = [int(np.prod(a.shape[:-2])) for a in leaves]
    shapes = [a.shape[:-2] for a in leaves]
    rows = jnp.concatenate(
        [jnp.moveaxis(a.reshape(-1, G, S), 0, -1) for a in leaves],
        axis=-1).reshape(G * S, -1)                          # [G*S, totL]
    flat = (jnp.arange(G, dtype=jnp.int32)[:, None] * S
            + idx.astype(jnp.int32)).reshape(-1)
    g = jnp.take(rows, flat, axis=0).reshape(G, B, -1)
    g = jnp.moveaxis(g, -1, 0)                               # [totL, G, B]
    out, off = [], 0
    for sz, shp in zip(sizes, shapes):
        out.append(g[off:off + sz].reshape(shp + (G, B)))
        off += sz
    return jax.tree.unflatten(treedef, out)


def window_digits(scalar_limbs, c: int):
    """[n_limbs, *B] 16-bit limbs -> [n_windows, *B] c-bit digits, LSB
    window first; windows may straddle limb boundaries."""
    L = scalar_limbs.shape[0]
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


def signed_window_digits(scalar_limbs, c: int):
    """Signed-digit recode: scalar = sum_w mag_w * (-1)^neg_w * 2^(c*w),
    mag in [0, 2^(c-1)].  Returns (mag [W+1, *B] uint32, neg [W+1, *B]
    bool) — one extra window for the final carry.  The vectorized
    counterpart of the reference's NAF recode
    (src/build_timesscalarnaf.js:79-96): signed digits halve the table /
    bucket range per window."""
    d = window_digits(jnp.asarray(scalar_limbs, jnp.uint32), c)
    half = jnp.uint32(1 << (c - 1))
    full = jnp.uint32(1 << c)
    mags, negs = [], []
    carry = jnp.zeros_like(d[0])
    for w in range(d.shape[0]):
        t = d[w] + carry                  # <= 2^c
        neg = t > half
        mags.append(jnp.where(neg, full - t, t))
        negs.append(neg)
        carry = neg.astype(jnp.uint32)
    mags.append(carry)
    negs.append(jnp.zeros_like(negs[0]))
    return jnp.stack(mags, axis=0), jnp.stack(negs, axis=0)


def times_scalar_signed_device(curve, points, scalar_limbs,
                               window_bits: int = 4):
    """Batched signed-window scalar multiplication — the device counterpart
    of the reference's NAF ladder (build_timesscalarnaf.js:195-220, the
    production timesScalar of the projective curves): per window of c bits,
    c doublings plus ONE add of a signed multiple d*P, d in
    [-2^(c-1), 2^(c-1)] selected from a 2^(c-1)+1 entry on-the-fly table —
    ~(1 + 1/c) group ops per scalar bit instead of the plain ladder's 2.

    Curve-generic over the complete-group-law devices (Jacobian and
    projective).  points: (X, Y, Z) leaves [.., *B]; scalar_limbs:
    [Ls, *B] canonical 16-bit planes; every lane multiplies its point by
    its own scalar."""
    c = window_bits
    mag, neg = signed_window_digits(scalar_limbs, c)      # [W, *B]

    # table T[k] = k*P per lane, k = 0 .. 2^(c-1)
    T = [curve.zero_like(points), points]
    for _ in range((1 << (c - 1)) - 1):
        T.append(curve.add(T[-1], points))
    table = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *T)  # [K, .., B]
    K = len(T)

    def body(acc, mn):
        m, n = mn
        for _ in range(c):
            acc = curve.double(acc)
        pick = curve.zero_like(points)
        for k in range(1, K):
            pick = curve.select(m == k, map_leaf(table, lambda a: a[k]), pick)
        pick = curve.select(n, curve.neg(pick), pick)
        return curve.add(acc, pick), None

    # MSB-first over the windows
    rev = lambda a: a[::-1]
    acc, _ = jax.lax.scan(
        body, curve.zero_like(points), (rev(mag), rev(neg)))
    return acc


class MSMDevice:
    def __init__(self, curve, window_bits: int = 16,
                 group_windows: int | None = None,
                 chunk_steps: int = 256):
        """window_bits: 1..16.  Cost model: the sort + segmented scan scale
        with n_windows = ceil(256/c)+1 while the bucket triangle scales with
        2^(c-1); on TPU the scan dominates, so c = 16 (n_windows minimal)
        is the production choice for large N — the analogue of the
        reference's tuned w=7 (src/bn128.js:109).  group_windows bounds how
        many windows are materialized at once (HBM knob).  chunk_steps is
        the segmented scan's sequential chunk length: the scan runs
        chunk_steps sequential combiner steps at N/chunk_steps-wide lanes,
        so smaller values trade per-step dispatch overhead against lane
        width (tools/profile_msm2.py sweeps it)."""
        assert 1 <= window_bits <= LIMB_BITS
        self.curve = curve
        self.c = window_bits
        self.gw = group_windows
        self.chunk_steps = chunk_steps

    def _auto_gw(self, W: int, N: int, points) -> int:
        """HBM-aware window-group width.  Working set per point-window slot
        is ~2.75x the affine point bytes (one gathered affine copy + the
        scan's Jacobian outputs) plus the sort keys; pick the largest group
        width that fits the budget, then EQUALIZE group sizes so no slots
        are wasted on padding (17 windows at gw=8 would run 3 groups = 24
        slots, 29% of the MSM spent on all-zero pad windows — the round-4
        configuration's single biggest loss; gw=6 runs the same 3 groups at
        18 slots, and a 2^20-point G1 MSM fits a SINGLE 17-window group in
        ~6 GB, measured 900k points/s vs 664k at gw=8)."""
        aff_bytes = sum(
            int(np.prod(a.shape[:-1])) * a.dtype.itemsize
            for a in jax.tree.leaves(points))
        slot = 2.75 * aff_bytes + 16
        budget = float(os.environ.get("WASMSNARK_TPU_MSM_HBM", 10e9))
        # XLA tiles the window axis at sublane granularity: a [.., G, N]
        # buffer physically occupies roundup(G, 8) rows (a G2 gw=9 group
        # padded 9 -> 16 OOMed at 15.8/15.75 GB), so feasibility must use
        # the PADDED group width.  Iterate group counts smallest-first so
        # the fewest (equalized) groups that fit win.
        for k in range(1, W + 1):
            gw = -(-W // k)
            if slot * (-(-gw // 8) * 8) * N <= budget:
                return gw
        # <= 8 windows all pad to the same 8-row tile; if even that misses
        # the budget the estimate is beyond what grouping can fix
        return min(8, W)

    # -- digit decomposition --------------------------------------------------

    def signed_digits(self, scalar_limbs):
        """Signed c-bit window recode (see signed_window_digits)."""
        return signed_window_digits(scalar_limbs, self.c)

    # -- one window group -----------------------------------------------------

    def _window_group(self, mag, neg, point_rows):
        """mag/neg: [G, N] digit magnitudes/signs.  point_rows:
        (packed_rows [N, sum L], meta) from _pack_rows over the affine
        (X, Y) pytree — on TPU a gather of contiguous rows runs ~50x
        faster than a gather along the minor (lane) axis, and packing
        every coordinate into one row matrix amortizes the near-constant
        per-row gather cost across X|Y (and tower components)
        (tools/gather_micro.py, honest-sync numbers).  Returns per-window
        sums, leaves [.., G], Jacobian."""
        C = self.curve
        F = C.F
        G, N = mag.shape
        B = (1 << (self.c - 1)) + 1           # buckets 0..2^(c-1)

        # ---- 1. ONE sort per window: key packs (magnitude, sign) with the
        # lane index as payload — the sorted keys hand back the grouped
        # digits and signs directly (the old argsort + two take_along_axis
        # re-gathers cost 14x the sort itself).  Grouping only needs runs of
        # equal MAGNITUDE; the sign riding the low bit just orders -P before
        # +P inside a run, which the bucket sum is invariant to.
        key = (mag << 1) | neg.astype(jnp.uint32)             # 17 bits
        lane = jnp.broadcast_to(
            jnp.arange(N, dtype=jnp.int32)[None, :], (G, N))
        skey, order = jax.lax.sort((key, lane), num_keys=1, is_stable=False)
        d = skey >> 1                                         # [G, N] sorted
        sgn = (skey & 1).astype(bool)

        # ---- 2. ONE packed row gather for every coordinate ----
        rows, meta = point_rows
        px, py = _unpack_gathered(_gather_rows(rows, order), meta)
        # negative digit -> add -P = (X, -Y); fused cond-negate kernel
        # (one memory pass vs neg + select's two)
        cneg = getattr(F, "cneg",
                       lambda m, a: F.select(m, F.neg(a), a))
        p = (px, cneg(sgn, py))

        # ---- 3. chunk-local mixed segmented scan over the point axis ----
        prev = jnp.concatenate(
            [jnp.full((G, 1), 0xFFFFFFFF, jnp.uint32), d[:, :-1]], axis=-1)
        flags = d != prev                                     # [G, N]
        local, incoming, K = seg_scan_parts_mixed(
            C, flags, p, chunk_steps=self.chunk_steps)

        # ---- 4. dense bucket array: run ends via MXU histogram ----
        # Each bucket's total is the run-end entry of its digit in the
        # sorted order, at position ends[b]-1 where ends[b] = #{i: d_i <= b}
        # is the cumulative histogram.  The histogram is computed scatter-
        # free as a 2-level one-hot int8 matmul (hist2d[hi, lo] =
        # onehot_hi^T @ onehot_lo, exact integer counts on the MXU) +
        # integer cumsum — ~3 ms where two vectorized binary searches over
        # the sorted digits cost ~180 ms (log-depth minor-axis gathers).
        # The top bucket b = 2^(c-1) (hi index 256) needs no column:
        # ends[B-1] = N identically.
        hi = (mag >> 7).astype(jnp.int32)                     # [G, N] 0..256
        lo = (mag & 127).astype(jnp.int32)
        n_hi = (B - 2 >> 7) + 1                               # 256 for c=16
        hist = jnp.zeros((G, n_hi, 128), jnp.int32)
        step = min(N, 1 << 17)  # bound one-hot materialization if unfused
        for s in range(0, N, step):
            oh_hi = (hi[:, None, s:s + step]
                     == jnp.arange(n_hi, dtype=jnp.int32)[None, :, None]
                     ).astype(jnp.int8)                       # [G, n_hi, n]
            oh_lo = (lo[:, s:s + step, None]
                     == jnp.arange(128, dtype=jnp.int32)[None, None, :]
                     ).astype(jnp.int8)                       # [G, n, 128]
            hist = hist + jax.lax.dot_general(
                oh_hi, oh_lo, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)
        ends = jnp.cumsum(hist.reshape(G, n_hi * 128), axis=-1)[:, :B - 1]
        ends = jnp.concatenate(
            [ends, jnp.full((G, 1), N, jnp.int32)], axis=-1)  # [G, B]
        start = jnp.concatenate(
            [jnp.zeros((G, 1), jnp.int32), ends[:, :-1]], axis=-1)
        pos = jnp.maximum(ends - 1, 0)
        hit = ends > start
        c_idx = pos // K
        crosses = hit & (start < c_idx * K)

        # run-end extraction: one packed row gather over the whole pytree
        g = _gather_rows_per_window(local, pos)
        inc = _gather_rows_per_window(incoming, c_idx)
        fixed = C.add(g, inc)
        sel = C.select(crosses, fixed, g)
        # zeroing X/Y/Z of empty buckets yields Z = 0 -> the complete add
        # treats them as the zero point; Y=0 is fine since Z=0 dominates.
        buckets = map_leaf(
            sel, lambda a: jnp.where(hit, a, jnp.zeros_like(a)))  # [.., G, B]

        # ---- 5. triangle fold: sum_{b>=1} b*S_b = sum suffix sums ----
        rev = map_leaf(buckets, lambda a: a[..., 1:][..., ::-1])
        pref = prefix_scan(C, rev)                            # suffix sums
        win = reduce_last(C, pref)                            # [.., G, 1]
        return map_leaf(win, lambda a: a[..., 0])

    # -- full MSM -------------------------------------------------------------

    def msm(self, scalar_limbs, points):
        """scalar_limbs: uint32 [n_limbs, N] — the scalars' 16-bit limb
        decomposition, LSB first.  points: affine (X, Y) pytree, leaves
        [.., N], Montgomery form, zero = (0, 0).  Returns per-window signed
        sums, Jacobian leaves [.., n_windows] (LSB window first) — fold with
        fold_windows_device() on device or fold_windows() on the host."""
        assert len(points) == 2, "MSM consumes affine (X, Y) points"
        mag, neg = self.signed_digits(scalar_limbs)
        W, N = mag.shape
        # one packed row-major transpose of ALL point coordinates, shared
        # by every window group ([N, sum L]; ~1 ms/GB on TPU)
        rows = _pack_rows(points)
        gw = self.gw if self.gw is not None else self._auto_gw(W, N, points)
        if gw >= W:
            return self._window_group(mag, neg, rows)
        # run the groups under lax.scan: ONE traced copy of the window-group
        # graph regardless of group count (a Python loop would replicate the
        # sort+scan+fold graph per group — minutes of extra XLA compile),
        # while still bounding the gathered/scanned intermediates to one
        # group's worth of HBM at a time.
        pad = (-W) % gw
        if pad:  # zero digits -> empty buckets -> zero window sums
            mag = jnp.concatenate(
                [mag, jnp.zeros((pad, N), mag.dtype)], axis=0)
            neg = jnp.concatenate(
                [neg, jnp.zeros((pad, N), neg.dtype)], axis=0)
        ngroups = (W + pad) // gw

        def body(_, mn):
            m, n = mn
            return None, self._window_group(m, n, rows)

        _, wins = jax.lax.scan(
            body, None,
            (mag.reshape(ngroups, gw, N), neg.reshape(ngroups, gw, N)))
        # wins leaves [ngroups, .., gw] -> [.., ngroups*gw] -> [.., W]
        out = map_leaf(wins, lambda a: jnp.moveaxis(a, 0, -2).reshape(
            a.shape[1:-1] + (ngroups * gw,)))
        return map_leaf(out, lambda a: a[..., :W]) if pad else out

    def msm_point(self, scalar_limbs, points):
        """Full device MSM: per-window sums + on-device window fold.
        Returns one Jacobian point (leaves with the window axis reduced
        away, batch shape [])."""
        win = self.msm(scalar_limbs, points)
        return fold_windows_device(self.curve, win, self.c)


def fold_windows_device(curve, win, window_bits: int):
    """MSB->LSB window fold on device: c doublings + 1 add per window
    (batch-1 tail work, ~W*(c+1) group ops).  win: Jacobian leaves
    [.., W].  Returns leaves [..]."""
    W = jax.tree.leaves(win)[0].shape[-1]

    def body(i, acc):
        w = W - 1 - i
        acc = jax.lax.fori_loop(
            0, window_bits, lambda _, a: curve.double(a), acc)
        pw = map_leaf(
            win, lambda a: jax.lax.dynamic_slice_in_dim(a, w, 1, -1)[..., 0])
        return curve.add(acc, pw)

    zero = curve.zero_like(map_leaf(win, lambda a: a[..., 0]))
    return jax.lax.fori_loop(0, W, body, zero)


def fold_windows(oracle_curve, window_points, window_bits: int):
    """Host-side MSB->LSB fold of per-window sums (oracle bigint points)."""
    res = oracle_curve.zero()
    for p in reversed(window_points):
        for _ in range(window_bits):
            res = oracle_curve.double(res)
        res = oracle_curve.add(res, p)
    return res
