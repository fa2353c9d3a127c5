"""Extension-field device kernels (batched, branch-free).

Mirrors the tower-composition pattern of build_f2m.js / build_f3m.js: each
extension takes a base-field kernel object plus a `mul_nr` callback (multiply
by the non-residue), so F2 over Fp serves BN128/BLS12-381 G2 and F3 over Fp
serves MNT6753, and higher towers (F6 = F3 over F2, F12 = F2 over F6)
compose the same way on device.

Element convention: a tuple of base-field elements (pytree), each a uint32
limb-plane array.  Tuples keep the curve/scan machinery generic across
towers and make JAX pytree transforms (scan, associative_scan, shard_map)
work unmodified.
"""

from __future__ import annotations

import jax.numpy as jnp

from .fp import FpDevice


class FpAdapter:
    """Wrap FpDevice in the generic tower element protocol (elem = 1-tuple is
    avoided: elements are bare [L, *B] arrays)."""

    def __init__(self, fp: FpDevice):
        self.fp = fp

    def mul(self, a, b):
        return self.fp.mont_mul(a, b)

    def square(self, a):
        return self.fp.mont_sqr(a)

    def add(self, a, b):
        return self.fp.add(a, b)

    def sub(self, a, b):
        return self.fp.sub(a, b)

    def neg(self, a):
        return self.fp.neg(a)

    def cneg(self, mask, a):
        """mask ? -a : a, fused into one memory pass on TPU (the MSM's
        signed-digit sign application)."""
        from .fp import _use_pallas
        if _use_pallas():
            from .fp_pallas import mod_cneg_pallas
            return mod_cneg_pallas(self.fp.spec, mask, a)
        return self.fp.select(mask, self.fp.neg(a), a)

    def is_zero(self, a):
        return self.fp.is_zero(a)

    def eq(self, a, b):
        return self.fp.eq(a, b)

    def select(self, mask, a, b):
        return self.fp.select(mask, a, b)

    def zero_like(self, a):
        return jnp.zeros_like(a)

    def one_like(self, a):
        return jnp.broadcast_to(
            jnp.asarray(self.fp.one_mont_np).reshape(
                (self.fp.L,) + (1,) * (a.ndim - 1)
            ),
            a.shape,
        ).astype(jnp.uint32)

    def mul_small(self, a, k: int):
        """a * k for tiny static k via repeated addition (k <= 8)."""
        r = a
        for _ in range(k - 1):
            r = self.add(r, a)
        return r

    def inv(self, a):
        """Batched inverse (Fermat ladder, ops/fp.py mont_inv)."""
        return self.fp.mont_inv(a)


class F2Device:
    """Quadratic extension over a base adapter; elements are (c0, c1) tuples.

    Formula parity with build_f2m.js: Karatsuba 3M mul (:127-163),
    complex-style 2M square (:186-227), norm-based inverse (:353-383).
    """

    def __init__(self, base, mul_nr):
        self.base = base
        self.mul_nr = mul_nr

    def mul(self, a, b):
        F = self.base
        m0 = F.mul(a[0], b[0])
        m1 = F.mul(a[1], b[1])
        t = F.mul(F.add(a[0], a[1]), F.add(b[0], b[1]))
        return (F.add(m0, self.mul_nr(m1)), F.sub(F.sub(t, m0), m1))

    def square(self, a):
        F = self.base
        ab = F.mul(a[0], a[1])
        t = F.mul(F.add(a[0], a[1]), F.add(a[0], self.mul_nr(a[1])))
        return (F.sub(F.sub(t, ab), self.mul_nr(ab)), F.add(ab, ab))

    def add(self, a, b):
        F = self.base
        return (F.add(a[0], b[0]), F.add(a[1], b[1]))

    def sub(self, a, b):
        F = self.base
        return (F.sub(a[0], b[0]), F.sub(a[1], b[1]))

    def neg(self, a):
        F = self.base
        return (F.neg(a[0]), F.neg(a[1]))

    def cneg(self, mask, a):
        F = self.base
        if hasattr(F, "cneg"):
            return (F.cneg(mask, a[0]), F.cneg(mask, a[1]))
        return self.select(mask, self.neg(a), a)

    def conjugate(self, a):
        return (a[0], self.base.neg(a[1]))

    def is_zero(self, a):
        return self.base.is_zero(a[0]) & self.base.is_zero(a[1])

    def eq(self, a, b):
        return self.base.eq(a[0], b[0]) & self.base.eq(a[1], b[1])

    def select(self, mask, a, b):
        F = self.base
        return (F.select(mask, a[0], b[0]), F.select(mask, a[1], b[1]))

    def zero_like(self, a):
        F = self.base
        return (F.zero_like(a[0]), F.zero_like(a[1]))

    def one_like(self, a):
        F = self.base
        return (F.one_like(a[0]), F.zero_like(a[1]))

    def mul_small(self, a, k: int):
        F = self.base
        return (F.mul_small(a[0], k), F.mul_small(a[1], k))

    def mul_base(self, a, b_base):
        F = self.base
        return (F.mul(a[0], b_base), F.mul(a[1], b_base))

    def inv(self, a):
        """Inverse via norm (build_f2m.js:353-383); composes through the
        tower — the base inverse recurses down to the Fp Fermat ladder."""
        F = self.base
        t = F.sub(F.square(a[0]), self.mul_nr(F.square(a[1])))
        ti = F.inv(t)
        return (F.mul(a[0], ti), F.neg(F.mul(a[1], ti)))


class F3Device:
    """Cubic extension; elements (c0, c1, c2).  Parity with build_f3m.js."""

    def __init__(self, base, mul_nr):
        self.base = base
        self.mul_nr = mul_nr

    def mul(self, a, b):
        F = self.base
        nr = self.mul_nr
        v0 = F.mul(a[0], b[0])
        v1 = F.mul(a[1], b[1])
        v2 = F.mul(a[2], b[2])
        t01 = F.mul(F.add(a[0], a[1]), F.add(b[0], b[1]))
        t12 = F.mul(F.add(a[1], a[2]), F.add(b[1], b[2]))
        t02 = F.mul(F.add(a[0], a[2]), F.add(b[0], b[2]))
        c0 = F.add(v0, nr(F.sub(F.sub(t12, v1), v2)))
        c1 = F.add(F.sub(F.sub(t01, v0), v1), nr(v2))
        c2 = F.add(F.sub(F.sub(t02, v0), v2), v1)
        return (c0, c1, c2)

    def square(self, a):
        F = self.base
        nr = self.mul_nr
        s0 = F.square(a[0])
        ab = F.mul(a[0], a[1])
        s1 = F.add(ab, ab)
        s2 = F.square(F.add(F.sub(a[0], a[1]), a[2]))
        bc = F.mul(a[1], a[2])
        s3 = F.add(bc, bc)
        s4 = F.square(a[2])
        return (
            F.add(s0, nr(s3)),
            F.add(s1, nr(s4)),
            F.sub(F.add(F.add(s1, s2), s3), F.add(s0, s4)),
        )

    def add(self, a, b):
        F = self.base
        return tuple(F.add(x, y) for x, y in zip(a, b))

    def sub(self, a, b):
        F = self.base
        return tuple(F.sub(x, y) for x, y in zip(a, b))

    def neg(self, a):
        F = self.base
        return tuple(F.neg(x) for x in a)

    def is_zero(self, a):
        F = self.base
        return F.is_zero(a[0]) & F.is_zero(a[1]) & F.is_zero(a[2])

    def eq(self, a, b):
        F = self.base
        return F.eq(a[0], b[0]) & F.eq(a[1], b[1]) & F.eq(a[2], b[2])

    def select(self, mask, a, b):
        F = self.base
        return tuple(F.select(mask, x, y) for x, y in zip(a, b))

    def zero_like(self, a):
        F = self.base
        return tuple(F.zero_like(x) for x in a)

    def one_like(self, a):
        F = self.base
        return (F.one_like(a[0]), F.zero_like(a[1]), F.zero_like(a[2]))

    def mul_small(self, a, k: int):
        F = self.base
        return tuple(F.mul_small(x, k) for x in a)

    def mul_base(self, a, b_base):
        F = self.base
        return tuple(F.mul(x, b_base) for x in a)

    def inv(self, a):
        """Inverse via adjugate (build_f3m.js:389-444): for x = a0 + a1 v
        + a2 v^2 with v^3 = nr,  x^-1 = (A + B v + C v^2) / N with
        A = a0^2 - nr a1 a2, B = nr a2^2 - a0 a1, C = a1^2 - a0 a2,
        N = a0 A + nr (a2 B + a1 C).  Composes through the tower."""
        F = self.base
        nr = self.mul_nr
        A = F.sub(F.square(a[0]), nr(F.mul(a[1], a[2])))
        B = F.sub(nr(F.square(a[2])), F.mul(a[0], a[1]))
        C = F.sub(F.square(a[1]), F.mul(a[0], a[2]))
        N = F.add(F.mul(a[0], A),
                  nr(F.add(F.mul(a[2], B), F.mul(a[1], C))))
        Ni = F.inv(N)
        return (F.mul(A, Ni), F.mul(B, Ni), F.mul(C, Ni))


def gs_cyclotomic_square(B, mul_nr, f):
    """Granger-Scott cyclotomic squaring, generic over the quadratic-over-
    cubic tower shape ((a0,a1,a2),(b0,b1,b2)) with w^2 = v, v^3 = nr:
    9 base-field squarings instead of a full quadratic-tower square
    (the reference's __cyclotomicSquare, build_bn128.js:980-1089).

    B is the base adapter (F2Device for the F12 towers, FpAdapter for
    MNT6753's F6); mul_nr multiplies by the cubic non-residue.  Valid only
    on the cyclotomic subgroup (after the easy part of the final
    exponentiation), where the algebraic relations of unitary elements
    make the compressed form exact."""
    (a0, a1, a2), (b0, b1, b2) = f

    def two(x):
        return B.add(x, x)

    def three(x):
        return B.add(two(x), x)

    def sq2(x, y):
        """(x^2, y^2, 2xy) with one squaring for the cross term."""
        sx, sy = B.square(x), B.square(y)
        cross = B.sub(B.sub(B.square(B.add(x, y)), sx), sy)
        return sx, sy, cross

    s_b1, s_a0, c_a0b1 = sq2(b1, a0)
    s_a2, s_b0, c_a2b0 = sq2(a2, b0)
    s_b2, s_a1, c_a1b2 = sq2(b2, a1)
    t0 = B.add(mul_nr(s_b1), s_a0)
    t2 = B.add(mul_nr(s_a2), s_b0)
    t4 = B.add(mul_nr(s_b2), s_a1)
    t8 = mul_nr(c_a1b2)
    na0 = B.sub(three(t0), two(a0))
    na1 = B.sub(three(t2), two(a1))
    na2 = B.sub(three(t4), two(a2))
    nb0 = B.add(three(t8), two(b0))
    nb1 = B.add(three(c_a0b1), two(b1))
    nb2 = B.add(three(c_a2b0), two(b2))
    return ((na0, na1, na2), (nb0, nb1, nb2))
