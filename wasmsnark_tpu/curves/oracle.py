"""Host oracle for elliptic-curve groups (bigint, any base field).

Two group laws, matching the reference's two curve generators:

* `JacobianCurve` — short Weierstrass y^2 = x^3 + b (a = 0), Jacobian
  coordinates; formulas add-2007-bl / dbl-2009-l, the exact formulas of
  src/build_curve_jacobian_a0.js (BN128 / BLS12-381 G1 and G2).
* `ProjectiveCurve` — general y^2 = x^3 + a*x + b, projective coordinates,
  formulas of src/build_curve_projective.js (MNT6753 G1/G2), including the
  mixed add/sub variants and the NAF scalar ladder.

Points are tuples (X, Y, Z) of base-field elements.  Zero is (0, 1, 0),
matching the reference's representation (build_curve_jacobian_a0.js G1zero).
"""

from __future__ import annotations


class JacobianCurve:
    """y^2 = x^3 + b over `F` in Jacobian coordinates (x=X/Z^2, y=Y/Z^3)."""

    def __init__(self, F, name=""):
        self.F = F
        self.name = name

    def zero(self):
        return (self.F.zero(), self.F.one(), self.F.zero())

    def is_zero(self, p):
        return self.F.is_zero(p[2])

    def from_affine(self, x, y):
        return (x, y, self.F.one())

    def neg(self, p):
        return (p[0], self.F.neg(p[1]), p[2])

    def double(self, p):
        # dbl-2009-l (build_curve_jacobian_a0.js:174-235)
        F = self.F
        if self.is_zero(p):
            return p
        X, Y, Z = p
        A = F.square(X)
        B = F.square(Y)
        C = F.square(B)
        t = F.square(F.add(X, B))
        D = F.sub(F.sub(t, A), C)
        D = F.add(D, D)  # 2*((X+B)^2 - A - C)
        E = F.add(F.add(A, A), A)
        G = F.square(E)
        X3 = F.sub(G, F.add(D, D))
        eightC = F.add(C, C)
        eightC = F.add(eightC, eightC)
        eightC = F.add(eightC, eightC)
        Y3 = F.sub(F.mul(E, F.sub(D, X3)), eightC)
        YZ = F.mul(Y, Z)
        Z3 = F.add(YZ, YZ)
        return (X3, Y3, Z3)

    def add(self, p, q):
        # add-2007-bl with zero/equal fast paths
        # (build_curve_jacobian_a0.js:280-385)
        F = self.F
        if self.is_zero(p):
            return q
        if self.is_zero(q):
            return p
        X1, Y1, Z1 = p
        X2, Y2, Z2 = q
        Z1Z1 = F.square(Z1)
        Z2Z2 = F.square(Z2)
        U1 = F.mul(X1, Z2Z2)
        U2 = F.mul(X2, Z1Z1)
        S1 = F.mul(Y1, F.mul(Z2, Z2Z2))
        S2 = F.mul(Y2, F.mul(Z1, Z1Z1))
        if F.eq(U1, U2):
            if F.eq(S1, S2):
                return self.double(p)
            return self.zero()
        H = F.sub(U2, U1)
        t = F.add(H, H)
        I = F.square(t)
        J = F.mul(H, I)
        r = F.sub(S2, S1)
        r = F.add(r, r)
        V = F.mul(U1, I)
        X3 = F.sub(F.sub(F.square(r), J), F.add(V, V))
        S1J = F.mul(S1, J)
        Y3 = F.sub(F.mul(r, F.sub(V, X3)), F.add(S1J, S1J))
        Z3t = F.sub(F.sub(F.square(F.add(Z1, Z2)), Z1Z1), Z2Z2)
        Z3 = F.mul(Z3t, H)
        return (X3, Y3, Z3)

    def sub(self, p, q):
        return self.add(p, self.neg(q))

    def eq(self, p, q):
        # cross-normalized compare (build_curve_jacobian_a0.js:115-172)
        F = self.F
        if self.is_zero(p):
            return self.is_zero(q)
        if self.is_zero(q):
            return False
        Z1Z1 = F.square(p[2])
        Z2Z2 = F.square(q[2])
        if not F.eq(F.mul(p[0], Z2Z2), F.mul(q[0], Z1Z1)):
            return False
        return F.eq(F.mul(p[1], F.mul(q[2], Z2Z2)), F.mul(q[1], F.mul(p[2], Z1Z1)))

    def affine(self, p):
        F = self.F
        if self.is_zero(p):
            return self.zero()
        zi = F.inv(p[2])
        zi2 = F.square(zi)
        return (F.mul(p[0], zi2), F.mul(p[1], F.mul(zi, zi2)), F.one())

    def times_scalar(self, p, s: int):
        """Plain MSB-first double-and-add (build_timesscalar.js)."""
        if s == 0 or self.is_zero(p):
            return self.zero()
        if s < 0:
            p = self.neg(p)
            s = -s
        r = self.zero()
        for bit in bin(s)[2:]:
            r = self.double(r)
            if bit == "1":
                r = self.add(r, p)
        return r

    def msm(self, points, scalars):
        """Oracle multi-exponentiation: sum_i scalars[i] * points[i].

        Semantics of g1m_multiexp/g1m_multiexp2 (build_multiexp.js) — the
        scalars are plain unsigned integers of any width; same group result.
        """
        acc = self.zero()
        for p, s in zip(points, scalars):
            acc = self.add(acc, self.times_scalar(p, s))
        return acc


class ProjectiveCurve:
    """y^2 = x^3 + a*x + b over `F`, projective (x=X/Z, y=Y/Z).

    Formulas of src/build_curve_projective.js: add-1998-cmo-2 add (:291-408),
    doubling with the `fnMulByA` callback (:202-288), mixed add/sub
    (:412-577), NAF scalar ladder (:682-691 via build_timesscalarnaf.js).
    `mul_a` is a callback computing a*x in the base field, mirroring the
    reference's fnMulByA parameterization.
    """

    def __init__(self, F, mul_a, name=""):
        self.F = F
        self.mul_a = mul_a
        self.name = name

    def zero(self):
        return (self.F.zero(), self.F.one(), self.F.zero())

    def is_zero(self, p):
        return self.F.is_zero(p[2])

    def from_affine(self, x, y):
        return (x, y, self.F.one())

    def neg(self, p):
        return (p[0], self.F.neg(p[1]), p[2])

    def double(self, p):
        # dbl-2007-bl-style projective doubling (build_curve_projective.js:202-288)
        F = self.F
        if self.is_zero(p):
            return p
        X, Y, Z = p
        XX = F.square(X)
        ZZ = F.square(Z)
        w = F.add(self.mul_a(ZZ), F.add(F.add(XX, XX), XX))
        YZ = F.mul(Y, Z)
        s = F.add(YZ, YZ)
        ss = F.square(s)
        sss = F.mul(s, ss)
        R = F.mul(Y, s)
        RR = F.square(R)
        XR = F.square(F.add(X, R))
        B = F.sub(F.sub(XR, XX), RR)
        h = F.sub(F.square(w), F.add(B, B))
        X3 = F.mul(h, s)
        Y3 = F.sub(F.mul(w, F.sub(B, h)), F.add(RR, RR))
        Z3 = sss
        return (X3, Y3, Z3)

    def add(self, p, q):
        # add-1998-cmo-2 (build_curve_projective.js:291-408)
        F = self.F
        if self.is_zero(p):
            return q
        if self.is_zero(q):
            return p
        X1, Y1, Z1 = p
        X2, Y2, Z2 = q
        Y1Z2 = F.mul(Y1, Z2)
        Y2Z1 = F.mul(Y2, Z1)
        X1Z2 = F.mul(X1, Z2)
        X2Z1 = F.mul(X2, Z1)
        if F.eq(X1Z2, X2Z1):
            if F.eq(Y1Z2, Y2Z1):
                return self.double(p)
            return self.zero()
        u = F.sub(Y2Z1, Y1Z2)
        uu = F.square(u)
        v = F.sub(X2Z1, X1Z2)
        vv = F.square(v)
        vvv = F.mul(v, vv)
        R = F.mul(vv, X1Z2)
        ZZ = F.mul(Z1, Z2)
        A = F.sub(F.mul(uu, ZZ), F.add(vvv, F.add(R, R)))
        X3 = F.mul(v, A)
        Y3 = F.sub(F.mul(u, F.sub(R, A)), F.mul(vvv, Y1Z2))
        Z3 = F.mul(vvv, ZZ)
        return (X3, Y3, Z3)

    def sub(self, p, q):
        return self.add(p, self.neg(q))

    def eq(self, p, q):
        F = self.F
        if self.is_zero(p):
            return self.is_zero(q)
        if self.is_zero(q):
            return False
        if not F.eq(F.mul(p[0], q[2]), F.mul(q[0], p[2])):
            return False
        return F.eq(F.mul(p[1], q[2]), F.mul(q[1], p[2]))

    def affine(self, p):
        F = self.F
        if self.is_zero(p):
            return self.zero()
        zi = F.inv(p[2])
        return (F.mul(p[0], zi), F.mul(p[1], zi), F.one())

    @staticmethod
    def naf(s: int):
        """Non-adjacent form digits, LSB first (build_timesscalarnaf.js)."""
        digits = []
        while s > 0:
            if s & 1:
                d = 2 - (s % 4)
                digits.append(d)
                s -= d
            else:
                digits.append(0)
            s >>= 1
        return digits

    def times_scalar(self, p, s: int):
        """NAF ladder (reference timesScalar for projective curves)."""
        if s == 0 or self.is_zero(p):
            return self.zero()
        if s < 0:
            p = self.neg(p)
            s = -s
        digits = self.naf(s)
        r = self.zero()
        for d in reversed(digits):
            r = self.double(r)
            if d == 1:
                r = self.add(r, p)
            elif d == -1:
                r = self.sub(r, p)
        return r

    def msm(self, points, scalars):
        acc = self.zero()
        for p, s in zip(points, scalars):
            acc = self.add(acc, self.times_scalar(p, s))
        return acc
