"""Complete projective group law (a = 0) — Renes-Costello-Batina formulas.

The MSM scan combiner must be *complete* (equal points, inverses, zeros all
correct with no data-dependent branches).  The masked-Jacobian approach in
ops/curve.py pays 23 field muls (generic add + doubling path + selects); the
RCB complete addition for y^2 = x^3 + b in homogeneous projective
coordinates ("Complete addition formulas for prime order elliptic curves",
EUROCRYPT 2016, Algorithm 7) needs 12 muls + 2 muls by the constant 3b and
zero selects — completeness is algebraic, which is exactly what a vector
machine wants.  This replaces the reference's branchy Jacobian add
(build_curve_jacobian_a0.js:280-385) on the MSM hot path; the Jacobian
kernels remain for parity tests.

Closed form (a=0, b3 = 3b):
  X3 = (X1Y2+X2Y1)(Y1Y2-b3 Z1Z2) - b3(Y1Z2+Y2Z1)(X1Z2+X2Z1)
  Y3 = (Y1Y2+b3 Z1Z2)(Y1Y2-b3 Z1Z2) + 3X1X2 * b3(X1Z2+X2Z1)
  Z3 = (Y1Z2+Y2Z1)(Y1Y2+b3 Z1Z2) + (X1Y2+X2Y1) * 3X1X2

Zero is (0, 1, 0) (any Z = 0), identical to the reference's convention.
Works over any tower adapter; `mul_b3` is a callback (for G1 b = 3 so
b3 = 9 = a few cheap additions; for the BN128 twist b3 = 3*TwistCoefB, a
full constant multiply).
"""

from __future__ import annotations


class CompleteCurveDevice:
    """y^2 = x^3 + b over `field`, homogeneous projective, complete add."""

    def __init__(self, field, mul_b3):
        self.F = field
        self.mul_b3 = mul_b3

    def is_zero(self, p):
        return self.F.is_zero(p[2])

    def zero_like(self, p):
        F = self.F
        return (F.zero_like(p[0]), F.one_like(p[1]), F.zero_like(p[2]))

    def select(self, mask, p, q):
        F = self.F
        return tuple(F.select(mask, a, b) for a, b in zip(p, q))

    def neg(self, p):
        return (p[0], self.F.neg(p[1]), p[2])

    def add(self, p, q):
        F = self.F
        X1, Y1, Z1 = p
        X2, Y2, Z2 = q
        t0 = F.mul(X1, X2)
        t1 = F.mul(Y1, Y2)
        t2 = F.mul(Z1, Z2)
        t3 = F.mul(F.add(X1, Y1), F.add(X2, Y2))
        t3 = F.sub(t3, F.add(t0, t1))          # X1Y2 + X2Y1
        t4 = F.mul(F.add(Y1, Z1), F.add(Y2, Z2))
        t4 = F.sub(t4, F.add(t1, t2))          # Y1Z2 + Y2Z1
        t5 = F.mul(F.add(X1, Z1), F.add(X2, Z2))
        t5 = F.sub(t5, F.add(t0, t2))          # X1Z2 + X2Z1
        three_t0 = F.add(F.add(t0, t0), t0)    # 3 X1X2
        b3z = self.mul_b3(t2)                  # b3 Z1Z2
        b3x = self.mul_b3(t5)                  # b3 (X1Z2 + X2Z1)
        s = F.add(t1, b3z)                     # Y1Y2 + b3 Z1Z2
        d = F.sub(t1, b3z)                     # Y1Y2 - b3 Z1Z2
        X3 = F.sub(F.mul(t3, d), F.mul(t4, b3x))
        Y3 = F.add(F.mul(s, d), F.mul(three_t0, b3x))
        Z3 = F.add(F.mul(t4, s), F.mul(t3, three_t0))
        return (X3, Y3, Z3)

    def double(self, p):
        return self.add(p, p)

    def eq(self, p, q):
        """Projective cross-compare."""
        F = self.F
        ex = F.eq(F.mul(p[0], q[2]), F.mul(q[0], p[2]))
        ey = F.eq(F.mul(p[1], q[2]), F.mul(q[1], p[2]))
        both_zero = self.is_zero(p) & self.is_zero(q)
        one_zero = self.is_zero(p) ^ self.is_zero(q)
        return (ex & ey & ~one_zero) | both_zero
