"""Batched prime-field arithmetic on TPU: uint32 limb planes, limb-major.

The TPU-native inversion of wasmsnark's design: the reference emits
*depth-optimized scalar* WASM (one field op at a time, fully unrolled Comba /
CIOS over 32-bit limbs in i64 accumulators — src/build_int.js:285-380,
src/build_f1m.js:235-436).  Here every op is *batch-vectorized*: a field
element is a column of 16-bit limbs stored in a uint32 array of shape
[n_limbs, *batch], so one `mont_mul` performs B multiplications with the
batch axis riding the 8x128 VPU lanes.  The limb loop is unrolled at trace
time over a compile-time n_limbs, exactly as the reference specializes per
modulus at codegen time.

Width / overflow invariants (all arithmetic is exact in uint32):

* limbs are 16-bit, so a limb product is < 2^32 (exact);
* CIOS column accumulators receive at most ~4*n_limbs lo/hi 16-bit terms plus
  small carries, keeping columns < 2^23 for n_limbs <= 64 (MNT6753's 48 limbs
  included) — far below 2^32;
* `m = acc_i * np16 mod 2^16` is computed on the *unnormalized* column: only
  acc_i mod 2^16 matters and uint32 wraparound preserves it.

This is the same invariant family that makes the reference's width-32-limb /
width-64-accumulator CIOS exact, transposed to 16/32.

All functions are pure jnp (jit-friendly); a Pallas fused kernel for the
mont_mul hot path lives in ops/fp_pallas.py.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.spec import FieldSpec, LIMB_BITS, LIMB_MASK
from ..utils import serialize

MASK = jnp.uint32(LIMB_MASK)
U32 = jnp.uint32


@functools.lru_cache(maxsize=1)
def _use_pallas() -> bool:
    """Fused VMEM mont_mul kernel on TPU backends (ops/fp_pallas.py);
    the pure-jnp path remains for CPU tests and as the oracle-checked
    reference implementation.  Opt out with WASMSNARK_TPU_NO_PALLAS=1."""
    if os.environ.get("WASMSNARK_TPU_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


class FpDevice:
    """Device kernels for one prime field (specialized per FieldSpec)."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.L = spec.n_limbs
        # static constant planes, shape [L, 1] so they broadcast over batch
        self.q_np = np.array(spec.q_limbs, dtype=np.uint32)[:, None]
        self.r2_np = np.array(spec.limbs(spec.R2), dtype=np.uint32)[:, None]
        self.one_mont_np = np.array(spec.limbs(spec.one_mont), dtype=np.uint32)[:, None]
        self.np16 = np.uint32(spec.np16)

    # -- host <-> device marshalling ----------------------------------------

    def pack(self, values) -> np.ndarray:
        """list[int] (canonical) -> uint32 [L, B]."""
        return serialize.ints_to_limbs(values, self.L)

    def unpack(self, arr) -> list[int]:
        return serialize.limbs_to_ints(np.asarray(arr))

    def pack_mont(self, values) -> np.ndarray:
        s = self.spec
        return serialize.ints_to_limbs([s.to_mont(v) for v in values], self.L)

    def unpack_mont(self, arr) -> list[int]:
        s = self.spec
        return [s.from_mont(v) for v in self.unpack(arr)]

    # -- carry / borrow primitives -------------------------------------------

    def normalize(self, x):
        """Full carry propagation to 16-bit limbs.  Input columns may hold up
        to 32-bit values; output value is preserved modulo 2^(16L) with the
        final carry returned separately.

        Returns (limbs [L, *B] in [0, 2^16), carry_out [*B])."""

        def step(c, row):
            t = row + c
            return t >> LIMB_BITS, t & MASK

        c, outs = jax.lax.scan(step, jnp.zeros_like(x[0]), x)
        return outs, c

    def _sub_limbs(self, x, y):
        """x - y with borrow chain; both normalized [L,*B].
        Returns (diff [L,*B], borrow_out [*B] in {0,1})."""
        lend = jnp.uint32(1 << LIMB_BITS)

        def step(b, xy):
            xi, yi = xy
            d = xi + lend - yi - b
            return jnp.uint32(1) - (d >> LIMB_BITS), d & MASK

        y = jnp.broadcast_to(y, x.shape)
        b, outs = jax.lax.scan(step, jnp.zeros_like(x[0]), (x, y))
        return outs, b

    def cond_sub_q(self, x):
        """x - q if x >= q else x (normalized input < 2^(16L))."""
        d, borrow = self._sub_limbs(x, self.q_limbs_like(x))
        keep = (borrow != 0)  # borrow => x < q => keep x
        return jnp.where(keep[None, ...], x, d)

    def _cond_sub_plane(self, x, plane_np):
        d, borrow = self._sub_limbs(
            x, jnp.broadcast_to(
                jnp.asarray(plane_np).reshape((self.L,) + (1,) * (x.ndim - 1)),
                x.shape))
        return jnp.where((borrow != 0)[None, ...], x, d)

    def reduce_wide_sum(self, acc):
        """Reduce column-accumulated sums of Montgomery-form elements mod q.

        acc: [L, *B] uint32 where column k holds the (un-carried) sum of up
        to 2^16 16-bit limbs — i.e. the raw result of scatter-adding < 2^16
        field elements limb-wise (used by pol_constructLC).  The represented
        value is sum(acc_k 2^16k) < 2^16 * q * ... ; after carry
        normalization it is lo + carry*2^(16L) with carry < 2^16.

        carry*2^(16L) mod q = montmul(carry, R^2) since R = 2^(16L); lo is
        brought below q by descending conditional subtracts of 2^j*q.
        """
        lo, carry = self.normalize(acc)
        J = LIMB_BITS * self.L - self.spec.q.bit_length()
        for j in range(J, -1, -1):
            shifted = (self.spec.q << j)
            plane = np.array(
                [(shifted >> (LIMB_BITS * i)) & LIMB_MASK for i in range(self.L)],
                dtype=np.uint32)[:, None]
            lo = self._cond_sub_plane(lo, plane)
        c_elem = jnp.zeros_like(lo).at[0].set(carry)
        fold = self.mont_mul(c_elem, jnp.asarray(self.r2_np))
        return self.add(lo, fold)

    def q_limbs_like(self, x):
        q = jnp.asarray(self.q_np)
        return jnp.broadcast_to(q.reshape((self.L,) + (1,) * (x.ndim - 1)), x.shape)

    # -- ring ops -------------------------------------------------------------

    def add(self, x, y):
        """(x + y) mod q; x, y canonical-or-Montgomery (form-agnostic),
        normalized, < q.  Mirrors f1m_add (build_f1m.js:67-83)."""
        if _use_pallas():
            from .fp_pallas import mod_add_pallas
            return mod_add_pallas(self.spec, jnp.asarray(x, U32),
                                  jnp.asarray(y, U32))
        s, carry = self.normalize(x + y)
        # x + y < 2q < 2^(16L) so carry == 0 always; fold anyway for safety
        del carry
        return self.cond_sub_q(s)

    def sub(self, x, y):
        """(x - y) mod q.  Computes x + q - y (never underflows), then
        conditional subtract.  Mirrors f1m_sub (build_f1m.js:85-101)."""
        if _use_pallas():
            from .fp_pallas import mod_sub_pallas
            return mod_sub_pallas(self.spec, jnp.asarray(x, U32),
                                  jnp.asarray(y, U32))
        # limbwise x_i + q_i - y_i may underflow in uint32 when q_i < y_i;
        # add a 2^16 lend per limb; d's top bits encode net carry + 1.
        # carry state: keep top = (net carry + 1) as a biased value so it
        # stays non-negative in uint32; applied next step as (top - 1).
        lend = jnp.uint32(1 << LIMB_BITS)

        def step(top_prev, xqy):
            xi, qi, yi = xqy
            d = xi + qi + (lend - jnp.uint32(1)) + top_prev - yi
            return d >> LIMB_BITS, d & MASK

        qb = self.q_limbs_like(x)
        yb = jnp.broadcast_to(y, x.shape)
        init = jnp.ones(x.shape[1:], U32)
        _, s = jax.lax.scan(step, init, (x, qb, yb))
        return self.cond_sub_q(s)

    def q_limb(self, i):
        return jnp.uint32(int(self.q_np[i, 0]))

    def neg(self, x):
        """(-x) mod q = q - x, with -0 = 0 (f1m_neg semantics)."""
        d, _ = self._sub_limbs(self.q_limbs_like(x), x)
        zero = self.is_zero(x)
        return jnp.where(zero[None, ...], x, d)

    # -- Montgomery multiplication (the hot kernel) ---------------------------

    def _product_columns(self, x, y):
        """All partial products accumulated into 2L columns (deferred carry).

        The anti-diagonal accumulation sum_{i+j=k} lo(x_i*y_j) is realized as
        a Toeplitz shear: pad rows to width 2L, flatten, re-view with row
        stride 2L-1 — pure reshapes (free in XLA) — then one sum over rows.
        Out-of-band reads land in the previous row's zero padding.
        """
        L = self.L
        bshape = jnp.broadcast_shapes(x.shape[1:], y.shape[1:])
        # numpy right-alignment would pair the limb axis with batch dims when
        # ranks differ (e.g. constants [L, 1] against [L, G, B]); align the
        # *batch* dims right by inserting singleton axes after the limb axis
        def _align(a):
            if a.shape[1:] != bshape:
                a = a.reshape((L,) + (1,) * (len(bshape) - a.ndim + 1)
                              + a.shape[1:])
                a = jnp.broadcast_to(a, (L,) + bshape)
            return a
        x, y = _align(x), _align(y)
        P = x[:, None] * y[None, :]            # [L, L, *B], exact 16x16->32
        lo = P & MASK
        hi = P >> LIMB_BITS

        def shear_sum(A):
            # A [L, L, *B] -> S [2L-1, *B], S[k] = sum_i A[i, k-i]
            Ap = jnp.concatenate(
                [A, jnp.zeros((L, L) + bshape, U32)], axis=1
            )  # [L, 2L, *B]
            flat = Ap.reshape((2 * L * L,) + bshape)
            D = flat[: L * (2 * L - 1)].reshape((L, 2 * L - 1) + bshape)
            return jnp.sum(D, axis=0, dtype=U32)

        s_lo = shear_sum(lo)                   # columns 0 .. 2L-2
        s_hi = shear_sum(hi)                   # columns 1 .. 2L-1 (offset 1)
        z1 = jnp.zeros((1,) + bshape, U32)
        acc = jnp.concatenate([s_lo, z1], axis=0) + jnp.concatenate([z1, s_hi], axis=0)
        return acc                              # [2L, *B], columns < 2^21

    def mont_mul(self, x, y):
        """CIOS Montgomery product: returns x*y*R^{-1} mod q, canonical.

        Semantics of f1m_mul (build_f1m.js:235-436) — product + per-column
        reduction — re-derived for 16-bit limb planes with deferred carries
        (see module docstring for bounds).  The product phase is one shear
        gather + reduce; the inherently sequential reduction phase is a
        lax.scan over limb index (body traced once — keeps composite kernels
        like the MSM's scan combiners cheap to trace and compile).
        Supports broadcasting: y may be [L, 1] against x [L, B].

        On TPU the fused Pallas kernel (ops/fp_pallas.py) replaces this
        body: identical math, all intermediates in VMEM.
        """
        if _use_pallas():
            from .fp_pallas import mont_mul_pallas
            return mont_mul_pallas(self.spec, jnp.asarray(x, U32),
                                   jnp.asarray(y, U32))
        L = self.L
        x = jnp.asarray(x, U32)
        y = jnp.asarray(y, U32)
        bshape = jnp.broadcast_shapes(x.shape[1:], y.shape[1:])
        acc = self._product_columns(x, y)       # [2L, *B]
        # one zero guard row so the scan's (L+1)-row window fits at i = L-1
        acc = jnp.concatenate([acc, jnp.zeros((1,) + bshape, U32)], axis=0)
        q = jnp.asarray(self.q_np).reshape((L,) + (1,) * len(bshape))
        zrow = jnp.zeros((1,) + bshape, U32)

        def step(a, i):
            win = jax.lax.dynamic_slice_in_dim(a, i, L + 1, axis=0)
            m = (win[0] * self.np16) & MASK
            pq = m[None] * q                    # [L, *B], exact
            upd = (jnp.concatenate([pq & MASK, zrow], axis=0)
                   + jnp.concatenate([zrow, pq >> LIMB_BITS], axis=0))
            win = win + upd                     # win[0] now ≡ 0 mod 2^16
            win = win.at[1].add(win[0] >> LIMB_BITS)
            return jax.lax.dynamic_update_slice_in_dim(a, win, i, axis=0), None

        acc, _ = jax.lax.scan(step, acc, jnp.arange(L, dtype=jnp.int32))
        # result value = sum acc[L..2L-1] * 2^(16k) < 2q (the top guard row
        # and the final normalize carry are provably zero: n_limbs sizing
        # gives bitlen(q) <= 16L - 1 so 2q < 2^(16L)).
        res, _carry = self.normalize(acc[L:2 * L])
        return self.cond_sub_q(res)

    def mont_sqr(self, x):
        return self.mont_mul(x, x)

    def to_mont(self, x):
        """x -> x*R mod q = montmul(x, R^2) (build_f1m.js:749)."""
        return self.mont_mul(x, jnp.asarray(self.r2_np))

    def from_mont(self, x):
        """x -> x*R^{-1} mod q = montmul(x, 1) (build_f1m.js:758-770)."""
        one = np.zeros((self.L, 1), dtype=np.uint32)
        one[0, 0] = 1
        return self.mont_mul(x, jnp.asarray(one))

    # -- predicates -----------------------------------------------------------

    def is_zero(self, x):
        return jnp.all(x == 0, axis=0)

    def eq(self, x, y):
        return jnp.all(x == y, axis=0)

    def select(self, mask, a, b):
        """mask [*B] -> a where mask else b (branch-free select)."""
        return jnp.where(mask[None, ...], a, b)

    # -- exponentiation / inversion (batched, fixed exponent) -----------------

    def mont_pow_const(self, x, e: int):
        """x^e for Montgomery-form x, static exponent (square-and-multiply,
        MSB-first — the shared ladder of build_timesscalar.js).

        Long exponents use lax.scan over a bit array so the ladder body is
        traced/compiled once (XLA-friendly control flow), not unrolled.
        """
        r = jnp.broadcast_to(
            jnp.asarray(self.one_mont_np).reshape((self.L,) + (1,) * (x.ndim - 1)),
            x.shape,
        ).astype(U32)
        bits = [int(b) for b in bin(e)[2:]]
        if len(bits) <= 8:  # tiny exponent: unroll
            for bit in bits:
                r = self.mont_sqr(r)
                if bit:
                    r = self.mont_mul(r, x)
            return r
        bit_arr = jnp.asarray(np.array(bits, dtype=np.uint32))

        def body(rc, bit):
            rc = self.mont_sqr(rc)
            rm = self.mont_mul(rc, x)
            return jnp.where(bit != 0, rm, rc), None

        r, _ = jax.lax.scan(body, r, bit_arr)
        return r

    def mont_inv(self, x):
        """Batched inversion via Fermat: x^(q-2) (Montgomery form in/out)."""
        return self.mont_pow_const(x, self.spec.q - 2)

    def batch_inv(self, xs):
        """Simultaneous inversion (Montgomery's trick): K same-shape
        Montgomery elements inverted with ONE Fermat ladder + 3(K-1) muls,
        vs K ladders (a ladder is ~2*log2(q) muls — ~1500 for MNT6753).

        The reference pays one extended-Euclid int_inverseMod per element
        (build_int.js:926-1054, wrapped by f1m_inverse at
        build_f1m.js:772-782); data-dependent Euclid loops don't map to
        XLA, so the TPU design amortizes one Fermat ladder across the set
        instead.  Zero inputs invert to zero (Fermat semantics), protected
        from poisoning the shared product chain by a masked substitution.

        xs: sequence of [L, *B] arrays -> list of their inverses."""
        xs = list(xs)
        if len(xs) == 1:
            return [self.mont_inv(xs[0])]
        one = jnp.broadcast_to(
            jnp.asarray(self.one_mont_np).reshape(
                (self.L,) + (1,) * (xs[0].ndim - 1)),
            xs[0].shape).astype(U32)
        zmask = [self.is_zero(x) for x in xs]
        safe = [self.select(m, one, x) for m, x in zip(zmask, xs)]
        pref = [safe[0]]
        for x in safe[1:]:
            pref.append(self.mont_mul(pref[-1], x))
        u = self.mont_inv(pref[-1])
        out = [None] * len(xs)
        for i in range(len(xs) - 1, 0, -1):
            out[i] = self.mont_mul(u, pref[i - 1])
            u = self.mont_mul(u, safe[i])
        out[0] = u
        zero = jnp.zeros_like(xs[0])
        return [self.select(m, zero, o) for m, o in zip(zmask, out)]

    # -- convenience constants -------------------------------------------------

    def zeros(self, *batch):
        return jnp.zeros((self.L,) + tuple(batch), dtype=U32)

    def one_mont(self, *batch):
        return jnp.broadcast_to(
            jnp.asarray(self.one_mont_np).reshape((self.L,) + (1,) * len(batch)),
            (self.L,) + tuple(batch),
        ).astype(U32)


@functools.lru_cache(maxsize=None)
def fp_device(spec: FieldSpec) -> FpDevice:
    return FpDevice(spec)


# ---------------------------------------------------------------------------
# Dynamic-scalar ops (per-lane exponents): f1m_exp / timesScalar parity
# ---------------------------------------------------------------------------

def _scalar_bits_msb(scalar_limbs, n_bits):
    """[Ls, *B] 16-bit limb planes -> iterator spec for an MSB-first ladder:
    returns uint32 [n_bits, *B] bit array."""
    import jax.numpy as jnp
    Ls = scalar_limbs.shape[0]
    rows = []
    for k in range(n_bits - 1, -1, -1):
        li, off = k // LIMB_BITS, k % LIMB_BITS
        if li < Ls:
            rows.append((scalar_limbs[li] >> off) & jnp.uint32(1))
        else:
            rows.append(jnp.zeros_like(scalar_limbs[0]))
    return jnp.stack(rows, axis=0)


class FpDynamic:
    """Per-lane dynamic exponentiation on an FpDevice — the batched analogue
    of f1m_exp (build_f1m.js:1015-1023 via the shared ladder,
    build_timesscalar.js): every lane carries its own exponent."""

    def __init__(self, fp: FpDevice):
        self.fp = fp

    def exp(self, x, exp_limbs, n_bits=None):
        """x [L, *B] Montgomery; exp_limbs [Ls, *B] 16-bit planes (canonical
        scalars).  Returns x^e per lane (Montgomery)."""
        F = self.fp
        n_bits = n_bits or exp_limbs.shape[0] * LIMB_BITS
        bits = _scalar_bits_msb(jnp.asarray(exp_limbs, U32), n_bits)
        r = jnp.broadcast_to(
            jnp.asarray(F.one_mont_np).reshape((F.L,) + (1,) * (x.ndim - 1)),
            x.shape).astype(U32)

        def body(r, bit):
            r = F.mont_sqr(r)
            rm = F.mont_mul(r, x)
            return F.select(bit != 0, rm, r), None

        r, _ = jax.lax.scan(body, r, bits)
        return r


def times_scalar_device(curve, points, scalar_limbs, n_bits=None):
    """Batched double-and-add scalar multiplication: every lane multiplies
    its point by its own scalar (g1m_timesScalar semantics,
    build_timesscalar.js, complete group law so all edge cases fold in).

    points: (X, Y, Z) leaves [.., *B]; scalar_limbs: [Ls, *B]."""
    n_bits = n_bits or scalar_limbs.shape[0] * LIMB_BITS
    bits = _scalar_bits_msb(jnp.asarray(scalar_limbs, U32), n_bits)
    acc = curve.zero_like(points)

    def body(acc, bit):
        acc = curve.double(acc)
        added = curve.add(acc, points)
        return curve.select(bit != 0, added, acc), None

    acc, _ = jax.lax.scan(body, acc, bits)
    return acc


class FpSqrt:
    """Batched Tonelli-Shanks square root + Euler criterion on device —
    f1m_sqrt / f1m_isSquare parity (build_f1m.js:809-897), branch-free:
    the reference's data-dependent while loop becomes a fixed s-1 round
    ladder with per-lane masked updates (uniform Tonelli).

    Sign normalization matches f1m_sqrt: the returned root has an even
    canonical value (f1m_isNegative = LSB, build_f1m.js:133-149)."""

    def __init__(self, fp: FpDevice):
        self.fp = fp
        s, t, z, nqr = fp.spec._tonelli
        self.s, self.t = s, t
        # c0 = nqr^t in Montgomery form
        self.c0_np = fp.pack_mont([z])

    def is_square(self, x):
        """Euler criterion on Montgomery-form x: mask [*B] (0 counts as
        square, like the reference returning early for 0)."""
        F = self.fp
        e = (F.spec.q - 1) // 2
        p = F.mont_pow_const(x, e)
        one = jnp.broadcast_to(
            jnp.asarray(F.one_mont_np).reshape((F.L,) + (1,) * (x.ndim - 1)),
            x.shape).astype(U32)
        return F.eq(p, one) | F.is_zero(x)

    def sqrt(self, x):
        """Square root of Montgomery-form x (valid where is_square; garbage
        lanes elsewhere — callers mask).  Returns Montgomery form."""
        F = self.fp
        s, t = self.s, self.t
        # One shared ladder for both Tonelli seeds (t is odd):
        #   u = x^((t-1)/2);  r = u*x = x^((t+1)/2);  b = r*u = x^t
        # — halves the dominant big-exponent cost vs two ladders.
        u = F.mont_pow_const(x, (t - 1) // 2)
        r = F.mont_mul(u, x)
        b = F.mont_mul(r, u)
        c = jnp.broadcast_to(
            jnp.asarray(self.c0_np).reshape((F.L,) + (1,) * (x.ndim - 1)),
            x.shape).astype(U32)
        one = jnp.broadcast_to(
            jnp.asarray(F.one_mont_np).reshape((F.L,) + (1,) * (x.ndim - 1)),
            x.shape).astype(U32)
        for i in range(s - 2, -1, -1):
            # i repeated squarings via fori_loop: one traced body per round
            # (each pallas call site pays its own kernel compile, so an
            # unrolled O(s^2) squaring chain is prohibitive to build).
            if i > 0:
                d = jax.lax.fori_loop(0, i, lambda _, v: F.mont_sqr(v), b)
            else:
                d = b
            not_one = ~F.eq(d, one)
            r = F.select(not_one, F.mont_mul(r, c), r)
            c = F.mont_sqr(c)
            b = F.select(not_one, F.mont_mul(b, c), b)
        # sign-normalize: canonical LSB must be 0
        canon = F.from_mont(r)
        neg = F.neg(r)
        odd = (canon[0] & jnp.uint32(1)) != 0
        r = F.select(odd, neg, r)
        # sqrt(0) = 0
        return F.select(F.is_zero(x), x, r)
