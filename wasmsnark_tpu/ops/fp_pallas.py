"""Pallas TPU kernel for the batched Montgomery multiply — the hot inner op.

Why: the pure-jnp CIOS in ops/fp.py materializes [L, L, B] partial-product
intermediates in HBM per multiply (the Toeplitz shear) plus a lax.scan over
limbs with dynamic slices — ~100x more HBM traffic than the 3 [L, B] arrays
that actually need to move.  MSM/NTT/pairing are built almost entirely out of
mont_mul, so the whole framework is HBM-bound on that op.  This kernel keeps
the entire product + interleaved Montgomery reduction in VMEM/registers:
traffic is exactly x, y in and r out.

Algorithm parity: identical math to FpDevice.mont_mul (same 16-bit limb CIOS
re-derivation of f1m_mul, src/build_f1m.js:235-436); results are bit-equal,
and the property tests run both paths against the bigint oracle.

Layout: limb-major [L, B] uint32 blocks; batch rides the 128-wide lane axis,
limbs ride sublanes.  The limb loops are unrolled at trace time (static L),
exactly as the reference unrolls per-modulus WASM.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.spec import FieldSpec, LIMB_BITS, LIMB_MASK

MASK = jnp.uint32(LIMB_MASK)

# Lane tile: batch columns per kernel instance.  (L, TILE_B) u32 blocks;
# VMEM footprint ~ (3L + 2L+2) * TILE_B * 4 bytes ~= 0.8 MB at L=16.
TILE_B = 2048


# ---------------------------------------------------------------------------
# Value-level helpers: operate on (L, 8, T8) uint32 VALUES inside a kernel.
# Shared by the mont-mul kernel, the add/sub kernels, and the fused curve
# kernels (ops/curve_pallas.py).
# ---------------------------------------------------------------------------


def _expand(a, L, bshape):
    """Broadcast [L, *b] against a full batch shape, inserting missing
    leading batch axes (numpy right-aligned broadcasting does not cover
    e.g. [L, 1] -> [L, 188, 2])."""
    extra = len(bshape) - (a.ndim - 1)
    a = a.reshape((L,) + (1,) * extra + a.shape[1:])
    return jnp.broadcast_to(a, (L,) + bshape)


def _q_tensor(L, q_limbs):
    """(L, 1, 1) modulus-limb tensor built from literals via iota+select —
    Pallas kernels cannot capture array constants, and an input operand per
    kernel would bloat every signature."""
    idx = jax.lax.broadcasted_iota(jnp.uint32, (L, 1, 1), 0)
    Q = jnp.zeros((L, 1, 1), jnp.uint32)
    for k, qk in enumerate(q_limbs):
        if qk:
            Q = jnp.where(idx == k, jnp.uint32(qk), Q)
    return Q


def _mm_vals_block(L, np16, q_limbs, X, Y):
    """Montgomery product of two in-register (L, 8, T8) values.

    The anti-diagonal accumulation uses whole-(L,8,T8)-block updates
    (static-index dynamic_update_slice) rather than per-row adds: the
    trace is O(L) ops instead of O(L^2), keeping Mosaic compile time sane
    for 48-limb fields (and every pallas call site in a large graph pays
    its own kernel compile)."""
    shape = X.shape[1:]
    Q = _q_tensor(L, q_limbs)
    acc = jnp.zeros((2 * L + 1,) + shape, jnp.uint32)

    def block_add(acc, lo_row, block):
        """acc[lo_row : lo_row+len(block)] += block via static slice+concat
        (Mosaic has no dynamic_update_slice on values; empty slices are
        invalid vector types, so they are omitted)."""
        n = block.shape[0]
        parts = []
        if lo_row > 0:
            parts.append(acc[:lo_row])
        parts.append(acc[lo_row:lo_row + n] + block)
        if lo_row + n < acc.shape[0]:
            parts.append(acc[lo_row + n:])
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    for i in range(L):
        p = X[i][None] * Y                  # (L, 8, T8) exact 16x16 -> 32
        acc = block_add(acc, i, p & LIMB_MASK)
        acc = block_add(acc, i + 1, p >> LIMB_BITS)
    for i in range(L):
        m = (acc[i] * np16) & LIMB_MASK
        pq = m[None] * Q                    # (L, 8, T8)
        acc = block_add(acc, i, pq & LIMB_MASK)
        acc = block_add(acc, i + 1, pq >> LIMB_BITS)
        acc = block_add(acc, i + 1, (acc[i] >> LIMB_BITS)[None])

    res = []
    carry = None
    for k in range(L):
        t = acc[L + k] if carry is None else acc[L + k] + carry
        res.append(t & LIMB_MASK)
        carry = t >> LIMB_BITS
    r = jnp.stack(res, axis=0)
    return _cond_sub_q(L, q_limbs, r, carry)


def _mm_vals_rows(L, np16, q_limbs, X, Y):
    """Row-unrolled CIOS: O(L^2) trace ops but minimal VMEM traffic — the
    fast-runtime variant for the hot small-limb fields."""
    acc = [None] * (2 * L + 1)

    def bump(k, v):
        acc[k] = v if acc[k] is None else acc[k] + v

    for i in range(L):
        p = X[i][None] * Y                  # (L, 8, T8) exact 16x16 -> 32
        lo = p & LIMB_MASK
        hi = p >> LIMB_BITS
        for j in range(L):
            bump(i + j, lo[j])
            bump(i + j + 1, hi[j])
    zero = jnp.zeros_like(X[0])
    acc = [zero if a is None else a for a in acc]

    for i in range(L):
        m = (acc[i] * np16) & LIMB_MASK
        for j in range(L):
            pq = m * q_limbs[j]
            acc[i + j] = acc[i + j] + (pq & LIMB_MASK)
            acc[i + j + 1] = acc[i + j + 1] + (pq >> LIMB_BITS)
        acc[i + 1] = acc[i + 1] + (acc[i] >> LIMB_BITS)

    res = []
    carry = None
    for k in range(L):
        t = acc[L + k] if carry is None else acc[L + k] + carry
        res.append(t & LIMB_MASK)
        carry = t >> LIMB_BITS
    r = jnp.stack(res, axis=0)
    return _cond_sub_q(L, q_limbs, r, carry)


# Row-unrolled kernels run ~5x faster but their Mosaic compiles scale with
# L^2 (and every pallas call site pays its own kernel compile); 48-limb
# fields flip the trade-off.
MM_BLOCK_LIMB_THRESHOLD = 32


def mm_vals(L, np16, q_limbs, X, Y):
    """Montgomery product of two in-register (L, 8, T8) values (CIOS; same
    math as FpDevice.mont_mul / the reference's f1m_mul)."""
    if L > MM_BLOCK_LIMB_THRESHOLD:
        return _mm_vals_block(L, np16, q_limbs, X, Y)
    return _mm_vals_rows(L, np16, q_limbs, X, Y)


def _cond_sub_q(L, q_limbs, r, top_carry):
    """r - q if (value >= q) else r, for r < 2q (top_carry = 2^(16L) limb)."""
    lend = 1 << LIMB_BITS
    borrow = None
    diff = []
    for k in range(L):
        d = r[k] + (lend - q_limbs[k])
        if borrow is not None:
            d = d - borrow
        diff.append(d & LIMB_MASK)
        borrow = 1 - (d >> LIMB_BITS)
    d = jnp.stack(diff, axis=0)
    if top_carry is None:
        take = (borrow == 0)[None]
    else:
        take = ((top_carry != 0) | (borrow == 0))[None]
    return jnp.where(take, d, r)


def add_vals(L, q_limbs, X, Y):
    """(X + Y) mod q on in-register values."""
    s = []
    carry = None
    for k in range(L):
        t = X[k] + Y[k]
        if carry is not None:
            t = t + carry
        s.append(t & LIMB_MASK)
        carry = t >> LIMB_BITS
    return _cond_sub_q(L, q_limbs, jnp.stack(s, axis=0), carry)


def sub_vals(L, q_limbs, X, Y):
    """(X - Y) mod q = X + q - Y with borrow lending, then cond-sub."""
    lend = 1 << LIMB_BITS
    s = []
    carry = None
    for k in range(L):
        t = X[k] + (lend - 1 + q_limbs[k]) - Y[k]
        t = t + carry if carry is not None else t + 1
        s.append(t & LIMB_MASK)
        carry = t >> LIMB_BITS
    return _cond_sub_q(L, q_limbs, jnp.stack(s, axis=0), carry - 1)


def is_zero_vals(X):
    """(8, T8) bool mask: element == 0."""
    nz = X[0]
    for k in range(1, X.shape[0]):
        nz = nz | X[k]
    return nz == 0


def _mont_mul_kernel(L: int, np16: int, q_limbs: tuple, x_ref, y_ref, o_ref):
    """One (L, 8, T8) tile: full CIOS Montgomery product in VMEM.

    Blocks are 3D — limb-major, with the batch split (8 sublanes, T8 lanes)
    so every per-limb row op is a full (8, T8) VPU tile.  All field
    constants are baked in as Python int literals (Pallas kernels cannot
    capture traced arrays; this mirrors the reference's per-modulus codegen
    specialization).
    """
    o_ref[:] = mm_vals(L, np16, q_limbs, x_ref[:], y_ref[:])


@functools.lru_cache(maxsize=None)
def _mont_mul_call(spec: FieldSpec):
    """Build the pallas_call for one field spec (jit-cacheable)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = spec.n_limbs
    kern = functools.partial(
        _mont_mul_kernel, L, spec.np16, spec.q_limbs)

    def run(x, y):
        # x, y: (L, 8, B8)
        B8 = x.shape[2]
        t8 = TILE_B // 8
        grid = (B8 // t8,) if B8 >= t8 else (1,)
        tile = t8 if B8 >= t8 else B8
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((L, 8, tile), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, 8, tile), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((L, 8, tile), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((L, 8, B8), jnp.uint32),
        )(x, y)

    # inline jit: the traced jaxpr is cached by (fun, avals) across call
    # sites, so composite programs (MSM scans, fixed-base ladders, provers)
    # stop re-tracing this kernel body at every use — measured 0.47 s per
    # mont-mul TRACE without it, ~0 with (the groth16 setup spent 300+ s
    # of its 800 s wall purely re-tracing Pallas kernels).  inline=True
    # splices the jaxpr into the caller: no call boundary in the lowered
    # HLO, XLA fusion unaffected.
    return jax.jit(run, inline=True)


def mont_mul_pallas(spec: FieldSpec, x, y):
    """Batched Montgomery multiply via the fused VMEM kernel.

    Accepts any batch shape (leaves [L, *B]); broadcasts x against y, pads
    the flattened batch to the (8 x lane) tile, dispatches, and restores
    shape.
    """
    L = spec.n_limbs
    bshape = jnp.broadcast_shapes(x.shape[1:], y.shape[1:])
    x = _expand(x, L, bshape)
    y = _expand(y, L, bshape)
    B = int(np.prod(bshape)) if bshape else 1
    xf = x.reshape(L, B)
    yf = y.reshape(L, B)
    # pad to a multiple of the tile (or one full (8, 128) tile for tiny B)
    step = TILE_B if B >= TILE_B else 1024
    pad = (-B) % step
    if pad:
        xf = jnp.pad(xf, ((0, 0), (0, pad)))
        yf = jnp.pad(yf, ((0, 0), (0, pad)))
    Bp = B + pad
    out = _mont_mul_call(spec)(xf.reshape(L, 8, Bp // 8),
                               yf.reshape(L, 8, Bp // 8))
    out = out.reshape(L, Bp)
    if pad:
        out = out[:, :B]
    return out.reshape((L,) + bshape)


# ---------------------------------------------------------------------------
# Modular add / sub — elementwise chains, one VMEM pass
# ---------------------------------------------------------------------------

def _mod_addsub_kernel(L: int, q_limbs: tuple, is_sub: bool,
                       x_ref, y_ref, o_ref):
    """(x +/- y) mod q on one (L, 8, T8) tile (f1m_add/f1m_sub parity)."""
    if is_sub:
        o_ref[:] = sub_vals(L, q_limbs, x_ref[:], y_ref[:])
    else:
        o_ref[:] = add_vals(L, q_limbs, x_ref[:], y_ref[:])


@functools.lru_cache(maxsize=None)
def _addsub_call(spec: FieldSpec, is_sub: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = spec.n_limbs
    kern = functools.partial(_mod_addsub_kernel, L, spec.q_limbs, is_sub)

    def run(x, y):
        B8 = x.shape[2]
        t8 = TILE_B // 8
        grid = (B8 // t8,) if B8 >= t8 else (1,)
        tile = t8 if B8 >= t8 else B8
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((L, 8, tile), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, 8, tile), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((L, 8, tile), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((L, 8, B8), jnp.uint32),
        )(x, y)

    # inline jit: the traced jaxpr is cached by (fun, avals) across call
    # sites, so composite programs (MSM scans, fixed-base ladders, provers)
    # stop re-tracing this kernel body at every use — measured 0.47 s per
    # mont-mul TRACE without it, ~0 with (the groth16 setup spent 300+ s
    # of its 800 s wall purely re-tracing Pallas kernels).  inline=True
    # splices the jaxpr into the caller: no call boundary in the lowered
    # HLO, XLA fusion unaffected.
    return jax.jit(run, inline=True)


def _dispatch_2in(spec: FieldSpec, call, x, y):
    L = spec.n_limbs
    bshape = jnp.broadcast_shapes(x.shape[1:], y.shape[1:])
    x = _expand(x, L, bshape)
    y = _expand(y, L, bshape)
    B = int(np.prod(bshape)) if bshape else 1
    xf = x.reshape(L, B)
    yf = y.reshape(L, B)
    step = TILE_B if B >= TILE_B else 1024
    pad = (-B) % step
    if pad:
        xf = jnp.pad(xf, ((0, 0), (0, pad)))
        yf = jnp.pad(yf, ((0, 0), (0, pad)))
    Bp = B + pad
    out = call(xf.reshape(L, 8, Bp // 8), yf.reshape(L, 8, Bp // 8))
    out = out.reshape(L, Bp)
    if pad:
        out = out[:, :B]
    return out.reshape((L,) + bshape)


def mod_add_pallas(spec: FieldSpec, x, y):
    return _dispatch_2in(spec, _addsub_call(spec, False), x, y)


def mod_sub_pallas(spec: FieldSpec, x, y):
    return _dispatch_2in(spec, _addsub_call(spec, True), x, y)


def _cneg_kernel(L: int, q_limbs: tuple, f_ref, y_ref, o_ref):
    """o = f ? (q - y, with -0 = 0) : y on one (L, 8, T8) tile — the MSM's
    signed-digit point negation fused into ONE memory pass (a separate
    neg + select costs two full passes over the gathered Y planes,
    ~43 ms/group at 2^20 vs ~3 ms fused)."""
    y = y_ref[:]
    n = sub_vals(L, q_limbs, jnp.zeros_like(y), y)
    o_ref[:] = jnp.where(f_ref[:][None] != 0, n, y)


@functools.lru_cache(maxsize=None)
def _cneg_call(spec: FieldSpec):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = spec.n_limbs
    kern = functools.partial(_cneg_kernel, L, spec.q_limbs)

    def run(f, y):
        B8 = y.shape[2]
        t8 = TILE_B // 8
        grid = (B8 // t8,) if B8 >= t8 else (1,)
        tile = t8 if B8 >= t8 else B8
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((8, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, 8, tile), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((L, 8, tile), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((L, 8, B8), jnp.uint32),
        )(f, y)

    # inline jit: the traced jaxpr is cached by (fun, avals) across call
    # sites, so composite programs (MSM scans, fixed-base ladders, provers)
    # stop re-tracing this kernel body at every use — measured 0.47 s per
    # mont-mul TRACE without it, ~0 with (the groth16 setup spent 300+ s
    # of its 800 s wall purely re-tracing Pallas kernels).  inline=True
    # splices the jaxpr into the caller: no call boundary in the lowered
    # HLO, XLA fusion unaffected.
    return jax.jit(run, inline=True)


def mod_cneg_pallas(spec: FieldSpec, flag, y):
    """flag ? -y : y (mod q).  flag: bool/int, shape = y.shape[1:]."""
    L = spec.n_limbs
    bshape = y.shape[1:]
    f = jnp.broadcast_to(jnp.asarray(flag, jnp.uint32), bshape)
    B = int(np.prod(bshape)) if bshape else 1
    yf = y.reshape(L, B)
    ff = f.reshape(B)
    step = TILE_B if B >= TILE_B else 1024
    pad = (-B) % step
    if pad:
        yf = jnp.pad(yf, ((0, 0), (0, pad)))
        ff = jnp.pad(ff, (0, pad))
    Bp = B + pad
    out = _cneg_call(spec)(ff.reshape(8, Bp // 8),
                           yf.reshape(L, 8, Bp // 8))
    out = out.reshape(L, Bp)
    if pad:
        out = out[:, :B]
    return out.reshape((L,) + bshape)


class ValAdapter:
    """Field adapter over in-register (L, 8, T8) VALUES — the same protocol
    as towers.FpAdapter but usable *inside* a Pallas kernel, so the tower
    composition classes (F2Device/F3Device) build fused extension-field
    kernels out of the exact same Python code that builds the composed-op
    path.  This is the kernel-side mirror of the reference's prefix-callback
    tower composition (build_f2m.js / build_f3m.js)."""

    def __init__(self, L, np16, q_limbs):
        self.L = L
        self.np16 = np16
        self.q_limbs = q_limbs

    def mul(self, a, b):
        return mm_vals(self.L, self.np16, self.q_limbs, a, b)

    def square(self, a):
        return mm_vals(self.L, self.np16, self.q_limbs, a, a)

    def add(self, a, b):
        return add_vals(self.L, self.q_limbs, a, b)

    def sub(self, a, b):
        return sub_vals(self.L, self.q_limbs, a, b)

    def neg(self, a):
        return sub_vals(self.L, self.q_limbs, jnp.zeros_like(a), a)

    def is_zero(self, a):
        return is_zero_vals(a)

    def eq(self, a, b):
        m = a[0] == b[0]
        for k in range(1, a.shape[0]):
            m = m & (a[k] == b[k])
        return m

    def select(self, mask, a, b):
        return jnp.where(mask[None], a, b)

    def zero_like(self, a):
        return jnp.zeros_like(a)

    def one_like(self, a):
        raise NotImplementedError("pass one_mont explicitly in kernels")

    def mul_small(self, a, k: int):
        r = a
        for _ in range(k - 1):
            r = self.add(r, a)
        return r


# ---------------------------------------------------------------------------
# Fused NTT butterfly: (u, v, w) -> (u + v*w, u - v*w) in one VMEM pass
# ---------------------------------------------------------------------------

def _butterfly_kernel(L: int, np16: int, q_limbs: tuple,
                      u_ref, v_ref, w_ref, o0_ref, o1_ref):
    t = mm_vals(L, np16, q_limbs, v_ref[:], w_ref[:])
    U = u_ref[:]
    o0_ref[:] = add_vals(L, q_limbs, U, t)
    o1_ref[:] = sub_vals(L, q_limbs, U, t)


@functools.lru_cache(maxsize=None)
def _butterfly_call(spec: FieldSpec):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = spec.n_limbs
    kern = functools.partial(_butterfly_kernel, L, spec.np16, spec.q_limbs)

    def run(u, v, w):
        B8 = u.shape[2]
        t8 = TILE_B // 8
        grid = (B8 // t8,) if B8 >= t8 else (1,)
        tile = t8 if B8 >= t8 else B8
        spec_ = pl.BlockSpec((L, 8, tile), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[spec_] * 3,
            out_specs=(spec_, spec_),
            out_shape=(jax.ShapeDtypeStruct((L, 8, B8), jnp.uint32),
                       jax.ShapeDtypeStruct((L, 8, B8), jnp.uint32)),
        )(u, v, w)

    # inline jit: the traced jaxpr is cached by (fun, avals) across call
    # sites, so composite programs (MSM scans, fixed-base ladders, provers)
    # stop re-tracing this kernel body at every use — measured 0.47 s per
    # mont-mul TRACE without it, ~0 with (the groth16 setup spent 300+ s
    # of its 800 s wall purely re-tracing Pallas kernels).  inline=True
    # splices the jaxpr into the caller: no call boundary in the lowered
    # HLO, XLA fusion unaffected.
    return jax.jit(run, inline=True)


def butterfly_pallas(spec: FieldSpec, u, v, w):
    """Batched butterfly on [L, *B] planes (w broadcasts against u/v)."""
    L = spec.n_limbs
    bshape = jnp.broadcast_shapes(u.shape[1:], v.shape[1:], w.shape[1:])
    arrs = [_expand(c, L, bshape) for c in (u, v, w)]
    B = int(np.prod(bshape)) if bshape else 1
    step = TILE_B if B >= TILE_B else 1024
    pad = (-B) % step
    flat = []
    for c in arrs:
        c = c.reshape(L, B)
        if pad:
            c = jnp.pad(c, ((0, 0), (0, pad)))
        flat.append(c.reshape(L, 8, (B + pad) // 8))
    o0, o1 = _butterfly_call(spec)(*flat)
    outs = []
    for o in (o0, o1):
        o = o.reshape(L, B + pad)
        if pad:
            o = o[:, :B]
        outs.append(o.reshape((L,) + bshape))
    return outs[0], outs[1]
