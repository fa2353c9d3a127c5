"""BN128 optimal-ate pairing on device — batched over pairing *pairs*.

TPU-native inversion of the reference's pairing architecture: wasmsnark farms
each Miller loop of a pairing product to a worker and multiplies the results
on the main thread (src/mnt6753.js:944-1087 pattern; for BN128 the whole
pairingEq4 runs scalar on one instance, src/bn128.js:786 →
build_bn128.js:1287-1317).  Here the *pairs axis is a batch axis*: all Miller
loops of a pairing-product equation — and of as many independent equations as
you like — execute in the same lanes, so verification throughput scales with
batch size (the production use-case: a verification server).

Algorithm (validated bit-exact against the host oracle pairing, which itself
is validated against wasmsnark's committed proof artifacts):

* inversion-free Miller loop over homogeneous twist coordinates; per-step
  line values are scaled by subfield factors (2YZ^2 and lambda_d in Fp2),
  which the final exponentiation kills — same principle as the reference's
  unnormalized prepareG2 coefficients (build_bn128.js:277-457);
* line value is sparse: components at w^0 (F2), w^1, w^3 = v*w of
  F12 = F2[v,w] — mirror of the reference's ELL_0/ELL_VW/ELL_VV triple
  consumed by __mulBy024 (build_bn128.js:613-753);
* two Frobenius add-steps with host-precomputed twist constants
  gamma_1j = xi^((q-1)/j'), gamma_2j = xi^((q^2-1)/j') (mulByQ,
  build_bn128.js:459-575);
* final exponentiation = one lax.scan square-and-multiply over the static
  bit string of (q^12-1)/r (the reference's easy/cyclotomic-hard split,
  build_bn128.js:943-1262, computes the same exponent).

The ate-loop structure is static, so the Miller loop is a lax.scan over the
loop-bit array with both the double-only and double+add paths computed and
selected per step — branch-free control flow, traced once.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .fp import FpDevice
from .towers import FpAdapter, F2Device, F3Device
from .curve import map_leaf


class Bn128PairingDevice:
    """Device pairing engine for BN128 (specialized per the module oracle)."""

    def __init__(self):
        from ..models.bn128 import bn128, Q, ATE_LOOP_COUNT

        self.m = bn128()
        self.Q = Q
        self.fp = FpDevice(self.m.fp_spec)
        base = FpAdapter(self.fp)
        self.base = base
        self.F2d = F2Device(base, base.neg)

        # xi = 9 + u; mul by xi: (9 a0 - a1, a0 + 9 a1)
        def mul_xi(a):
            F = base
            n0 = F.sub(F.mul_small(a[0], 9), a[1])
            n1 = F.add(a[0], F.mul_small(a[1], 9))
            return (n0, n1)

        self.mul_xi = mul_xi
        self.F6d = F3Device(self.F2d, mul_xi)

        def mul_nr12(a):  # (a0,a1,a2) in F6 -> (xi*a2, a0, a1)
            return (mul_xi(a[2]), a[0], a[1])

        self.F12d = F2Device(self.F6d, mul_nr12)

        # static Miller-loop bit string (MSB skipped), MSB-first
        self.loop_bits = np.array(
            [int(b) for b in bin(ATE_LOOP_COUNT)[3:]], dtype=np.uint32)

        # host-precomputed twist-Frobenius constants (Fp2, canonical ->
        # Montgomery limb planes [L, 1])
        F2o = self.m.F2
        xi = self.m.xi
        g12 = F2o.exp(xi, (Q - 1) // 3)
        g13 = F2o.exp(xi, (Q - 1) // 2)
        g22 = F2o.exp(xi, (Q * Q - 1) // 3)
        g23 = F2o.exp(xi, (Q * Q - 1) // 2)
        self._g12 = self._const_f2(g12)
        self._g13 = self._const_f2(g13)
        self._g22 = self._const_f2(g22)
        self._g23 = self._const_f2(g23)

        # final exponentiation bit string
        from ..models.bn128 import R
        self.finexp_bits = np.array(
            [int(b) for b in bin((Q ** 12 - 1) // R)[2:]], dtype=np.uint32)

    # -- constants / marshalling ----------------------------------------------

    def _const_f2(self, v):
        return (jnp.asarray(self.fp.pack_mont([v[0]])),
                jnp.asarray(self.fp.pack_mont([v[1]])))

    def pack_g1(self, points):
        """list of oracle-affine (x, y) -> ((xP), (yP)) device planes."""
        xs = self.fp.pack_mont([p[0] for p in points])
        ys = self.fp.pack_mont([p[1] for p in points])
        return (jnp.asarray(xs), jnp.asarray(ys))

    def pack_g2(self, points):
        """list of oracle-affine Fp2 points -> F2 element pair of planes."""
        def comp(i, j):
            return jnp.asarray(self.fp.pack_mont([p[i][j] for p in points]))
        return ((comp(0, 0), comp(0, 1)), (comp(1, 0), comp(1, 1)))

    def unpack_f12(self, el):
        """device F12 tuple -> list of oracle nested tuples (canonical)."""
        flat = []
        def rec(x):
            if isinstance(x, tuple):
                for c in x:
                    rec(c)
            else:
                flat.append(self.fp.unpack_mont(np.asarray(x)))
        rec(el)
        n = len(flat[0])
        def shape(vals):
            i = iter(vals)
            return tuple(tuple((next(i), next(i)) for _ in range(3)) for _ in range(2))
        return [shape([flat[k][b] for k in range(12)]) for b in range(n)]

    # -- sparse line element ----------------------------------------------------

    def _sparse(self, a0, b0, b1):
        F = self.base
        z2 = (F.zero_like(a0[0]), F.zero_like(a0[0]))
        return ((a0, z2, z2), (b0, b1, z2))

    # -- fused-kernel dispatch (ops/tower_pallas.py) ---------------------------

    def _fused(self):
        from .fp import _use_pallas
        return _use_pallas()

    def _f12_mul(self, a, b):
        if self._fused():
            from .tower_pallas import f12_mul_pallas
            return f12_mul_pallas(self.fp.spec, a, b)
        return self.F12d.mul(a, b)

    def _f12_sqr(self, a):
        if self._fused():
            from .tower_pallas import f12_sqr_pallas
            return f12_sqr_pallas(self.fp.spec, a)
        return self.F12d.square(a)

    # -- Miller loop steps (validated against the oracle, see module doc) ------

    def _dbl_step(self, X, Y, Z, xP, yP):
        if self._fused():
            from .tower_pallas import miller_dbl_pallas
            (a0, b0, b1), Xn, Yn, Zn = miller_dbl_pallas(
                self.fp.spec, X, Y, Z, xP, yP)
            return self._sparse(a0, b0, b1), Xn, Yn, Zn
        F2 = self.F2d
        F = self.base
        X2 = F2.square(X); Y2 = F2.square(Y); Z2 = F2.square(Z)
        Y2Z = F2.mul(Y2, Z)
        YZ2 = F2.mul(Y, Z2)
        a0 = F2.mul_base(F2.add(YZ2, YZ2), yP)
        b0 = F2.mul_base(F2.neg(F2.mul_small(F2.mul(X2, Z), 3)), xP)
        X3c = F2.mul(X2, X)
        b1 = F2.sub(F2.mul_small(X3c, 3), F2.mul_small(Y2Z, 2))
        X4 = F2.square(X2)
        t1 = F2.sub(F2.mul_small(X4, 9), F2.mul_small(F2.mul(X, Y2Z), 8))
        Xn = F2.mul(F2.mul_small(F2.mul(Y, Z), 2), t1)
        Yn = F2.sub(
            F2.sub(F2.mul_small(F2.mul(X3c, Y2Z), 36),
                   F2.mul_small(F2.mul(X4, X2), 27)),
            F2.mul_small(F2.square(Y2Z), 8))
        Zn = F2.mul_small(F2.mul(F2.mul(Y2, Y), F2.mul(Z2, Z)), 8)
        del F
        return self._sparse(a0, b0, b1), Xn, Yn, Zn

    def _add_step(self, X, Y, Z, x2, y2, xP, yP):
        if self._fused():
            from .tower_pallas import miller_add_pallas
            (a0, b0, b1), Xn, Yn, Zn = miller_add_pallas(
                self.fp.spec, X, Y, Z, x2, y2, xP, yP)
            return self._sparse(a0, b0, b1), Xn, Yn, Zn
        F2 = self.F2d
        th = F2.sub(F2.mul(y2, Z), Y)
        lm = F2.sub(F2.mul(x2, Z), X)
        a0 = F2.mul_base(lm, yP)
        b0 = F2.mul_base(F2.neg(th), xP)
        b1 = F2.sub(F2.mul(th, x2), F2.mul(lm, y2))
        C = F2.square(th); D = F2.square(lm); E = F2.mul(lm, D)
        Fv = F2.mul(Z, C); G = F2.mul(X, D)
        H = F2.sub(F2.sub(Fv, F2.mul_small(G, 2)), E)
        Xn = F2.mul(lm, H)
        Yn = F2.sub(F2.mul(th, F2.sub(G, H)), F2.mul(E, Y))
        Zn = F2.mul(Z, E)
        return self._sparse(a0, b0, b1), Xn, Yn, Zn

    def miller_loop(self, g1, g2):
        """g1 = (xP, yP) planes [L, *B]; g2 = ((x0,x1),(y0,y1)) F2 planes.
        Returns the (scaled) Miller value as a device F12 element.

        Zero points are not representable in affine marshalling — callers
        handle e(0, .) = 1 on the host (the verification protocol never
        pairs the zero point)."""
        F2d, F12 = self.F2d, self.F12d
        xP, yP = g1
        xQ, yQ = g2
        f = self._f12_one(xP)
        X, Y, Z = xQ, yQ, F2d.one_like(xQ)

        bits = jnp.asarray(self.loop_bits)

        def body(carry, bit):
            f, X, Y, Z = carry
            l, X, Y, Z = self._dbl_step(X, Y, Z, xP, yP)
            f = self._f12_mul(self._f12_sqr(f), l)
            la, Xa, Ya, Za = self._add_step(X, Y, Z, xQ, yQ, xP, yP)
            fa = self._f12_mul(f, la)
            take = bit != 0
            f = F12.select(take, fa, f)
            X = F2d.select(take, Xa, X)
            Y = F2d.select(take, Ya, Y)
            Z = F2d.select(take, Za, Z)
            return (f, X, Y, Z), None

        (f, X, Y, Z), _ = jax.lax.scan(body, (f, X, Y, Z), bits)

        # Frobenius correction add-steps (build_bn128.js:530-575)
        def bcast(c, like):
            return map_leaf(c, lambda a: jnp.broadcast_to(
                a.reshape((a.shape[0],) + (1,) * (like.ndim - 1)), like.shape))
        g12 = bcast(self._g12, xP)
        g13 = bcast(self._g13, xP)
        g22 = bcast(self._g22, xP)
        g23 = bcast(self._g23, xP)
        x1 = F2d.mul(F2d.conjugate(xQ), g12)
        y1 = F2d.mul(F2d.conjugate(yQ), g13)
        l, X, Y, Z = self._add_step(X, Y, Z, x1, y1, xP, yP)
        f = self._f12_mul(f, l)
        x2 = F2d.mul(xQ, g22)
        y2 = F2d.neg(F2d.mul(yQ, g23))
        l, X, Y, Z = self._add_step(X, Y, Z, x2, y2, xP, yP)
        f = self._f12_mul(f, l)
        return f

    def _f12_one(self, like):
        F = self.base
        one = F.one_like(like)
        z = F.zero_like(like)
        return (((one, z), (z, z), (z, z)), ((z, z), (z, z), (z, z)))

    def final_exponentiation(self, f):
        """f^((q^12-1)/r) via square-and-multiply scan over static bits."""
        F12 = self.F12d
        bits = jnp.asarray(self.finexp_bits[1:])  # MSB implicit
        def body(r, bit):
            r = self._f12_sqr(r)
            rm = self._f12_mul(r, f)
            return F12.select(bit != 0, rm, r), None
        r, _ = jax.lax.scan(body, f, bits)
        return r

    def pairing_product(self, g1, g2, n_pairs: int):
        """Batched pairing-product: inputs have a leading pairs axis folded
        into the batch (leaf shape [L, n_pairs, B]); Miller loops run in
        lanes, the product reduces the pairs axis (log tree), then one final
        exponentiation on [L, B].  This is the device analogue of
        bn128_pairingEqN (build_bn128.js:1287-1317) with the worker farm
        replaced by lanes."""
        f = self.miller_loop(g1, g2)  # leaves [L, n_pairs, B]
        k = n_pairs
        while k > 1:
            assert k % 2 == 0, "pad pairs to a power of two"
            half = k // 2
            left = map_leaf(f, lambda a: a[:, :half])
            right = map_leaf(f, lambda a: a[:, half:k])
            f = self._f12_mul(left, right)
            k = half
        f = map_leaf(f, lambda a: a[:, 0])
        return self.final_exponentiation(f)

    def is_one(self, el):
        """Batched F12 == 1 check (Montgomery form) -> bool [*B]."""
        one = self._f12_one(el[0][0][0])
        return self.F12d.eq(el, one)


@functools.lru_cache(maxsize=1)
def bn128_pairing_device() -> Bn128PairingDevice:
    return Bn128PairingDevice()


class Bls12381PairingDevice:
    """Device pairing engine for BLS12-381 — same architecture as the BN128
    engine (batched pairs in lanes, inversion-free scaled-line Miller loop,
    full-exponent final exponentiation), with the BLS specifics: xi = 1 + u,
    M-type twist (line components at w^0 / v*w / v^2*w, xi factor on the
    w^0 term), **negative** ate loop x = -0xd201000000010000 — the Miller
    value is conjugated after the loop (equals inversion under the final
    exponentiation) — and no Frobenius correction steps
    (build_bls12381.js:228-231, :849).  The scaled-line algebra is validated
    against the oracle pairing."""

    XI = (1, 1)

    def __init__(self):
        from ..models.bls12381 import bls12381, Q, R, ATE_LOOP_COUNT

        self.m = bls12381()
        self.fp = FpDevice(self.m.fp_spec)
        base = FpAdapter(self.fp)
        self.base = base
        self.F2d = F2Device(base, base.neg)

        def mul_xi(a):  # xi = 1 + u
            return (base.sub(a[0], a[1]), base.add(a[0], a[1]))

        self.F6d = F3Device(self.F2d, mul_xi)

        def mul_nr12(a):
            return (mul_xi(a[2]), a[0], a[1])

        self.F12d = F2Device(self.F6d, mul_nr12)

        self.loop_bits = np.array(
            [int(b) for b in bin(ATE_LOOP_COUNT)[3:]], dtype=np.uint32)
        self.finexp_bits = np.array(
            [int(b) for b in bin((Q ** 12 - 1) // R)[2:]], dtype=np.uint32)

    # marshalling shares the BN128 engine's layout
    pack_g1 = Bn128PairingDevice.pack_g1
    pack_g2 = Bn128PairingDevice.pack_g2
    unpack_f12 = Bn128PairingDevice.unpack_f12
    _f12_one = Bn128PairingDevice._f12_one
    _fused = Bn128PairingDevice._fused
    is_one = Bn128PairingDevice.is_one

    def _sparse(self, a0, b1, b2):
        F = self.base
        z2 = (F.zero_like(a0[0]), F.zero_like(a0[0]))
        return ((a0, z2, z2), (z2, b1, b2))

    def _f12_mul(self, a, b):
        if self._fused():
            from .tower_pallas import f12_mul_pallas
            return f12_mul_pallas(self.fp.spec, a, b, xi=self.XI)
        return self.F12d.mul(a, b)

    def _f12_sqr(self, a):
        if self._fused():
            from .tower_pallas import f12_sqr_pallas
            return f12_sqr_pallas(self.fp.spec, a, xi=self.XI)
        return self.F12d.square(a)

    def _mul_xi(self, a):  # xi = 1 + u
        F = self.base
        return (F.sub(a[0], a[1]), F.add(a[0], a[1]))

    def _dbl_step(self, X, Y, Z, xP, yP):
        if self._fused():
            from .tower_pallas import miller_dbl_pallas
            (a0, b1, b2), Xn, Yn, Zn = miller_dbl_pallas(
                self.fp.spec, X, Y, Z, xP, yP, xi=self.XI, mtwist=True)
            return self._sparse(a0, b1, b2), Xn, Yn, Zn
        F2 = self.F2d
        X2 = F2.square(X); Y2 = F2.square(Y); Z2 = F2.square(Z)
        Y2Z = F2.mul(Y2, Z)
        YZ2 = F2.mul(Y, Z2)
        a0 = F2.mul_base(self._mul_xi(F2.add(YZ2, YZ2)), yP)
        X3c = F2.mul(X2, X)
        b1 = F2.sub(F2.mul_small(X3c, 3), F2.mul_small(Y2Z, 2))
        b2 = F2.mul_base(F2.neg(F2.mul_small(F2.mul(X2, Z), 3)), xP)
        X4 = F2.square(X2)
        t1 = F2.sub(F2.mul_small(X4, 9), F2.mul_small(F2.mul(X, Y2Z), 8))
        Xn = F2.mul(F2.mul_small(F2.mul(Y, Z), 2), t1)
        Yn = F2.sub(
            F2.sub(F2.mul_small(F2.mul(X3c, Y2Z), 36),
                   F2.mul_small(F2.mul(X4, X2), 27)),
            F2.mul_small(F2.square(Y2Z), 8))
        Zn = F2.mul_small(F2.mul(F2.mul(Y2, Y), F2.mul(Z2, Z)), 8)
        return self._sparse(a0, b1, b2), Xn, Yn, Zn

    def _add_step(self, X, Y, Z, x2, y2, xP, yP):
        if self._fused():
            from .tower_pallas import miller_add_pallas
            (a0, b1, b2), Xn, Yn, Zn = miller_add_pallas(
                self.fp.spec, X, Y, Z, x2, y2, xP, yP, xi=self.XI, mtwist=True)
            return self._sparse(a0, b1, b2), Xn, Yn, Zn
        F2 = self.F2d
        th = F2.sub(F2.mul(y2, Z), Y)
        lm = F2.sub(F2.mul(x2, Z), X)
        a0 = F2.mul_base(self._mul_xi(lm), yP)
        b1 = F2.sub(F2.mul(th, x2), F2.mul(lm, y2))
        b2 = F2.mul_base(F2.neg(th), xP)
        C = F2.square(th); D = F2.square(lm); E = F2.mul(lm, D)
        Fv = F2.mul(Z, C); G = F2.mul(X, D)
        H = F2.sub(F2.sub(Fv, F2.mul_small(G, 2)), E)
        Xn = F2.mul(lm, H)
        Yn = F2.sub(F2.mul(th, F2.sub(G, H)), F2.mul(E, Y))
        Zn = F2.mul(Z, E)
        return self._sparse(a0, b1, b2), Xn, Yn, Zn

    def miller_loop(self, g1, g2):
        F2d, F12 = self.F2d, self.F12d
        xP, yP = g1
        xQ, yQ = g2
        f = self._f12_one(xP)
        X, Y, Z = xQ, yQ, F2d.one_like(xQ)
        bits = jnp.asarray(self.loop_bits)

        def body(carry, bit):
            f, X, Y, Z = carry
            l, X, Y, Z = self._dbl_step(X, Y, Z, xP, yP)
            f = self._f12_mul(self._f12_sqr(f), l)
            la, Xa, Ya, Za = self._add_step(X, Y, Z, xQ, yQ, xP, yP)
            fa = self._f12_mul(f, la)
            take = bit != 0
            f = F12.select(take, fa, f)
            X = F2d.select(take, Xa, X)
            Y = F2d.select(take, Ya, Y)
            Z = F2d.select(take, Za, Z)
            return (f, X, Y, Z), None

        (f, X, Y, Z), _ = jax.lax.scan(body, (f, X, Y, Z), bits)
        # negative loop: conjugate (== inverse after final exponentiation)
        return (f[0], self.F6d.neg(f[1]))

    final_exponentiation = Bn128PairingDevice.final_exponentiation
    pairing_product = Bn128PairingDevice.pairing_product


@functools.lru_cache(maxsize=1)
def bls12381_pairing_device() -> Bls12381PairingDevice:
    return Bls12381PairingDevice()
