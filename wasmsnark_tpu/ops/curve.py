"""Branch-free batched elliptic-curve group law on TPU.

The reference's Jacobian add (build_curve_jacobian_a0.js:280-385) branches on
zero operands and on the add-vs-double degeneracy.  On a vector machine every
lane takes a different branch, so here all paths are computed and combined
with masked selects (SURVEY.md hard part #2): one `add` evaluates the generic
add-2007-bl result, the dbl-2009-l result, and the zero/identity cases, then
selects per lane.  ~23 field muls per complete add vs the reference's 16 —
the price of completeness, repaid by 128-wide lanes.

Points are (X, Y, Z) pytrees of field elements (tower tuples compose), with
zero represented by any Z = 0 (canonical zero is (0, 1, 0) like the
reference's G1zero).  Works over any field adapter from ops/towers.py, so
the same class instantiates G1 (Fp) and G2 (Fp2), exactly as the reference
instantiates buildCurve twice with different prefixes.
"""

from __future__ import annotations

import jax.numpy as jnp


class JacobianDevice:
    """y^2 = x^3 + b, a = 0 (BN128 / BLS12-381 G1 and G2)."""

    def __init__(self, field):
        self.F = field

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

    def _raw_double(self, p):
        # dbl-2009-l (build_curve_jacobian_a0.js:174-235); valid for Z=0
        # inputs only up to the Z3=0 invariant, which is all we need.
        F = self.F
        X, Y, Z = p
        A = F.square(X)
        B = F.square(Y)
        C = F.square(B)
        D = F.sub(F.sub(F.square(F.add(X, B)), A), C)
        D = F.add(D, D)
        E = F.add(F.add(A, A), A)
        G = F.square(E)
        X3 = F.sub(G, F.add(D, D))
        eight_c = F.add(C, C)
        eight_c = F.add(eight_c, eight_c)
        eight_c = F.add(eight_c, eight_c)
        Y3 = F.sub(F.mul(E, F.sub(D, X3)), eight_c)
        YZ = F.mul(Y, Z)
        Z3 = F.add(YZ, YZ)
        return (X3, Y3, Z3)

    def _fused_spec(self):
        """FieldSpec when the fused Pallas curve kernel applies (base-field
        curve, i.e. G1 over Fp; tower curves compose per-op kernels)."""
        from .fp import _use_pallas
        from .towers import FpAdapter
        if isinstance(self.F, FpAdapter) and _use_pallas():
            return self.F.fp.spec
        return None

    def double(self, p):
        """Complete doubling: double(0) = 0 (raw formula already yields Z=0
        for zero input, but Y may leave canonical form — reselect)."""
        spec = self._fused_spec()
        if spec is not None:
            from .curve_pallas import jac_double_pallas
            return jac_double_pallas(spec, p)
        d = self._raw_double(p)
        return self.select(self.is_zero(p), p, d)

    def add(self, p, q):
        """Complete addition (all degeneracies resolved by select)."""
        spec = self._fused_spec()
        if spec is not None:
            from .curve_pallas import jac_add_pallas
            return jac_add_pallas(spec, p, q)
        F = self.F
        X1, Y1, Z1 = p
        X2, Y2, Z2 = q
        Z1Z1 = F.square(Z1)
        Z2Z2 = F.square(Z2)
        U1 = F.mul(X1, Z2Z2)
        U2 = F.mul(X2, Z1Z1)
        S1 = F.mul(Y1, F.mul(Z2, Z2Z2))
        S2 = F.mul(Y2, F.mul(Z1, Z1Z1))
        H = F.sub(U2, U1)
        r = F.sub(S2, S1)
        r = F.add(r, r)
        HH = F.add(H, H)
        I = F.square(HH)
        J = F.mul(H, I)
        V = F.mul(U1, I)
        X3 = F.sub(F.sub(F.square(r), J), F.add(V, V))
        S1J = F.mul(S1, J)
        Y3 = F.sub(F.mul(r, F.sub(V, X3)), F.add(S1J, S1J))
        Z3 = F.mul(F.sub(F.sub(F.square(F.add(Z1, Z2)), Z1Z1), Z2Z2), H)
        gen = (X3, Y3, Z3)

        p_zero = self.is_zero(p)
        q_zero = self.is_zero(q)
        h_zero = F.is_zero(H)
        r_zero = F.is_zero(r)

        dbl = self._raw_double(p)
        # H==0, r==0 -> same point: double;  H==0, r!=0 -> inverse: zero
        zero = self.zero_like(p)
        out = self.select(h_zero & r_zero, dbl, gen)
        out = self.select(h_zero & ~r_zero, zero, out)
        out = self.select(q_zero, p, out)
        out = self.select(p_zero, q, out)
        return out

    def sub(self, p, q):
        return self.add(p, self.neg(q))

    # -- mixed (Jacobian + affine) arithmetic ---------------------------------
    #
    # The MSM's dominant pass adds *affine* pkey points into Jacobian
    # accumulators; exploiting Z2 = 1 (madd-2007-bl specialization of the
    # reference's add, build_curve_jacobian_a0.js:280-385) drops ~5 field
    # muls per add and a third of the gather traffic.  Affine zero is
    # encoded (0, 0) — the pkey converter's convention for points at
    # infinity (tools/buildpkey.js stores zero points as all-zero bytes).

    def is_zero_affine(self, q):
        return self.F.is_zero(q[0]) & self.F.is_zero(q[1])

    def promote(self, q):
        """Affine (X, Y) -> Jacobian (X, Y, 1); (0, 0) -> (0, 1, 0)."""
        F = self.F
        zero = self.is_zero_affine(q)
        return (q[0],
                F.select(zero, F.one_like(q[1]), q[1]),
                F.select(zero, F.zero_like(q[0]), F.one_like(q[0])))

    def madd(self, p, q):
        """Complete mixed addition: p Jacobian + q affine (X, Y)."""
        spec = self._fused_spec()
        if spec is not None:
            from .curve_pallas import jac_madd_pallas
            return jac_madd_pallas(spec, p, q)
        F = self.F
        X1, Y1, Z1 = p
        X2, Y2 = q
        Z1Z1 = F.square(Z1)
        U2 = F.mul(X2, Z1Z1)
        S2 = F.mul(Y2, F.mul(Z1, Z1Z1))
        H = F.sub(U2, X1)
        r = F.sub(S2, Y1)
        r = F.add(r, r)
        HH = F.add(H, H)
        I = F.square(HH)
        J = F.mul(H, I)
        V = F.mul(X1, I)
        X3 = F.sub(F.sub(F.square(r), J), F.add(V, V))
        S1J = F.mul(Y1, J)
        Y3 = F.sub(F.mul(r, F.sub(V, X3)), F.add(S1J, S1J))
        Z3 = F.mul(F.add(Z1, Z1), H)
        gen = (X3, Y3, Z3)

        p_zero = self.is_zero(p)
        q_zero = self.is_zero_affine(q)
        h_zero = F.is_zero(H)
        r_zero = F.is_zero(r)

        dbl = self._raw_double(p)
        zero = self.zero_like(p)
        out = self.select(h_zero & r_zero, dbl, gen)
        out = self.select(h_zero & ~r_zero, zero, out)
        out = self.select(q_zero, p, out)
        out = self.select(p_zero, self.promote(q), out)
        return out

    def eq(self, p, q):
        """Cross-normalized equality (build_curve_jacobian_a0.js:115-172)."""
        F = self.F
        Z1Z1 = F.square(p[2])
        Z2Z2 = F.square(q[2])
        ex = F.eq(F.mul(p[0], Z2Z2), F.mul(q[0], Z1Z1))
        ey = F.eq(F.mul(p[1], F.mul(q[2], Z2Z2)), F.mul(q[1], F.mul(p[2], Z1Z1)))
        both_zero = self.is_zero(p) & self.is_zero(q)
        one_zero = self.is_zero(p) ^ self.is_zero(q)
        return (ex & ey & ~one_zero) | both_zero

    # -- reductions -----------------------------------------------------------

    def tree_reduce(self, p, axis_size: int):
        """Sum 2^k points along the last batch axis by halving (log depth).

        p leaves have shape [..., axis_size]; returns leaves [..., 1]."""
        import jax.numpy as jnp  # local to keep module import light

        n = axis_size
        assert n & (n - 1) == 0, "tree_reduce needs a power-of-two axis"
        while n > 1:
            half = n // 2
            left = tuple(map_leaf(c, lambda a: a[..., :half]) for c in p)
            right = tuple(map_leaf(c, lambda a: a[..., half:n]) for c in p)
            p = self.add(left, right)
            n = half
        return p


def map_leaf(x, fn):
    """Apply fn to each array leaf of a tower element (nested tuples)."""
    if isinstance(x, tuple):
        return tuple(map_leaf(c, fn) for c in x)
    return fn(x)


class ProjectiveDevice:
    """y^2 = x^3 + a*x + b over any field adapter, projective coordinates —
    the branch-free batched analogue of build_curve_projective.js (MNT6753
    G1/G2).  `mul_a` is the multiply-by-a callback, mirroring the
    reference's fnMulByA parameterization (build_curve_projective.js:202).

    Zero is any Z = 0 (canonical (0, 1, 0)); degeneracies (zero operands,
    P == Q, P == -Q) are resolved with masked selects per lane.
    """

    def __init__(self, field, mul_a):
        self.F = field
        self.mul_a = mul_a

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

    def _raw_double(self, p):
        # projective doubling with mulByA (build_curve_projective.js:202-288)
        F = self.F
        X, Y, Z = p
        XX = F.mul(X, X)
        ZZ = F.mul(Z, Z)
        w = F.add(self.mul_a(ZZ), F.add(F.add(XX, XX), XX))
        YZ = F.mul(Y, Z)
        s = F.add(YZ, YZ)
        ss = F.mul(s, s)
        sss = F.mul(s, ss)
        R = F.mul(Y, s)
        RR = F.mul(R, R)
        XR = F.mul(F.add(X, R), F.add(X, R))
        B = F.sub(F.sub(XR, XX), RR)
        h = F.sub(F.mul(w, w), F.add(B, B))
        X3 = F.mul(h, s)
        Y3 = F.sub(F.mul(w, F.sub(B, h)), F.add(RR, RR))
        Z3 = sss
        return (X3, Y3, Z3)

    def double(self, p):
        d = self._raw_double(p)
        return self.select(self.is_zero(p), p, d)

    def add(self, p, q):
        # add-1998-cmo-2 (build_curve_projective.js:291-408), complete
        F = self.F
        X1, Y1, Z1 = p
        X2, Y2, Z2 = q
        Y1Z2 = F.mul(Y1, Z2)
        Y2Z1 = F.mul(Y2, Z1)
        X1Z2 = F.mul(X1, Z2)
        X2Z1 = F.mul(X2, Z1)
        u = F.sub(Y2Z1, Y1Z2)
        v = F.sub(X2Z1, X1Z2)
        uu = F.mul(u, u)
        vv = F.mul(v, v)
        vvv = F.mul(v, vv)
        R = F.mul(vv, X1Z2)
        ZZ = F.mul(Z1, Z2)
        A = F.sub(F.mul(uu, ZZ), F.add(vvv, F.add(R, R)))
        X3 = F.mul(v, A)
        Y3 = F.sub(F.mul(u, F.sub(R, A)), F.mul(vvv, Y1Z2))
        Z3 = F.mul(vvv, ZZ)
        gen = (X3, Y3, Z3)

        p_zero = self.is_zero(p)
        q_zero = self.is_zero(q)
        v_zero = F.is_zero(v)
        u_zero = F.is_zero(u)

        dbl = self._raw_double(p)
        zero = self.zero_like(p)
        out = self.select(v_zero & u_zero, dbl, gen)
        out = self.select(v_zero & ~u_zero, zero, out)
        out = self.select(q_zero, p, out)
        out = self.select(p_zero, q, out)
        return out

    def sub(self, p, q):
        return self.add(p, self.neg(q))

    def eq(self, p, q):
        F = self.F
        ex = F.eq(F.mul(p[0], q[2]), F.mul(q[0], p[2]))
        ey = F.eq(F.mul(p[1], q[2]), F.mul(q[1], p[2]))
        both_zero = self.is_zero(p) & self.is_zero(q)
        one_zero = self.is_zero(p) ^ self.is_zero(q)
        return (ex & ey & ~one_zero) | both_zero
