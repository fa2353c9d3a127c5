#!/usr/bin/env python3
"""Independent Groth16 verifier for alt_bn128 (snarkjs "groth" format).

Deliberately standalone: this file imports NOTHING from wasmsnark_tpu and
shares no code with it — it is the external cross-check demanded by the
reference's own interop test (test/bn128_prover.js:73-78 verifies generated
proofs against snarkjs's verification key).  Proofs produced by the TPU
prover must verify here, through an implementation with a completely
different structure:

  * plain (non-Montgomery) bigint arithmetic mod p;
  * Fp12 as the polynomial ring Fp[x]/(x^12 - 18 x^6 + 82) — the standard
    whole-tower representation (as used by py_ecc and EIP-197 reference
    code) instead of the 2-over-3-over-2 tower;
  * affine Miller loop with line functions evaluated directly in Fp12;
  * final exponentiation by the full (p^12 - 1)/r exponent — no cyclotomic
    shortcuts.

Verification equation (Groth16):
    e(A, B) == e(alfa1, beta2) * e(vk_x, gamma2) * e(C, delta2)
with vk_x = IC0 + sum_i input_i * IC_i.

CLI:  python tools/external_verifier.py <vk.json> <public.json> <proof.json>
"""

import json
import sys

P = 21888242871839275222246405745257275088696311157297823662689037894645226208583
R = 21888242871839275222246405745257275088548364400416034343698204186575808495617
ATE_LOOP_COUNT = 29793968203157093288
LOG_ATE_LOOP_COUNT = 63

# Fp12 modulus polynomial x^12 - 18x^6 + 82  (so x^12 = 18x^6 - 82)
FQ12_MOD = [82, 0, 0, 0, 0, 0, -18, 0, 0, 0, 0, 0]  # low -> high, degree 12


def _inv(a, p=P):
    return pow(a % p, -1, p)


class Poly:
    """Element of Fp[x]/(modulus) with integer coefficient list (low-first)."""

    __slots__ = ("c", "mod")

    def __init__(self, coeffs, mod):
        self.c = [x % P for x in coeffs]
        self.mod = mod

    @property
    def deg(self):
        return len(self.mod)

    def __add__(self, o):
        return Poly([a + b for a, b in zip(self.c, o.c)], self.mod)

    def __sub__(self, o):
        return Poly([a - b for a, b in zip(self.c, o.c)], self.mod)

    def __mul__(self, o):
        if isinstance(o, int):
            return Poly([a * o for a in self.c], self.mod)
        d = self.deg
        b = [0] * (2 * d - 1)
        for i, ai in enumerate(self.c):
            if ai:
                for j, bj in enumerate(o.c):
                    b[i + j] += ai * bj
        # reduce by x^d = -mod[0..d-1]
        for i in range(2 * d - 2, d - 1, -1):
            top = b[i] % P
            if top:
                b[i] = 0
                for j, mj in enumerate(self.mod):
                    b[i - d + j] -= top * mj
        return Poly(b[:d], self.mod)

    def __eq__(self, o):
        return all((a - b) % P == 0 for a, b in zip(self.c, o.c))

    def inv(self):
        """Extended Euclid over Fp[x]."""
        d = self.deg
        lm, hm = [1] + [0] * d, [0] * (d + 1)
        low = list(self.c) + [0]
        high = list(self.mod) + [1]

        def pdeg(p):
            for i in range(len(p) - 1, -1, -1):
                if p[i] % P:
                    return i
            return 0

        def poly_rounded_div(a, b):
            da, db = pdeg(a), pdeg(b)
            temp = list(a)
            o = [0] * len(a)
            for i in range(da - db, -1, -1):
                q = temp[db + i] * _inv(b[db]) % P
                o[i] = q
                for ci in range(db + 1):
                    temp[ci + i] -= q * b[ci]
            return [x % P for x in o]

        while pdeg(low):
            rq = poly_rounded_div(high, low)
            nm = [x for x in hm]
            new = [x for x in high]
            for i in range(d + 1):
                for j in range(d + 1 - i):
                    nm[i + j] -= lm[i] * rq[j]
                    new[i + j] -= low[i] * rq[j]
            nm = [x % P for x in nm]
            new = [x % P for x in new]
            lm, low, hm, high = nm, new, lm, low
        inv0 = _inv(low[0])
        return Poly([ci * inv0 % P for ci in lm[:d]], self.mod)

    def __pow__(self, e):
        result = Poly([1] + [0] * (self.deg - 1), self.mod)
        base = self
        while e:
            if e & 1:
                result = result * base
            base = base * base
            e >>= 1
        return result


def fq12(coeffs):
    return Poly(coeffs, FQ12_MOD)


FQ12_ONE = fq12([1] + [0] * 11)
FQ2_MOD = [1, 0]  # x^2 + 1


def fq2(c0, c1):
    return Poly([c0, c1], FQ2_MOD)


# -- curve ops over a generic field (affine tuples, None = infinity) ----------

def is_on_curve(pt, b):
    if pt is None:
        return True
    x, y = pt
    return y * y - x * x * x == b


def double(pt):
    if pt is None:
        return None
    x, y = pt
    if isinstance(x, int):
        lam = 3 * x * x % P * _inv(2 * y % P) % P
        nx = (lam * lam - 2 * x) % P
        ny = (lam * (x - nx) - y) % P
        return (nx, ny)
    lam = (x * x * 3) * (y * 2).inv()
    nx = lam * lam - x - x
    ny = lam * (x - nx) - y
    return (nx, ny)


def add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if isinstance(x1, int):
        if x1 == x2 and y1 == y2:
            return double(p1)
        if x1 == x2:
            return None
        lam = (y2 - y1) * _inv(x2 - x1) % P
        nx = (lam * lam - x1 - x2) % P
        ny = (lam * (x1 - nx) - y1) % P
        return (nx, ny)
    if x1 == x2 and y1 == y2:
        return double(p1)
    if x1 == x2:
        return None
    lam = (y2 - y1) * (x2 - x1).inv()
    nx = lam * lam - x1 - x2
    ny = lam * (x1 - nx) - y1
    return (nx, ny)


def multiply(pt, n):
    if n == 0 or pt is None:
        return None
    res = None
    while n:
        if n & 1:
            res = add(res, pt)
        pt = double(pt)
        n >>= 1
    return res


def neg(pt):
    if pt is None:
        return None
    x, y = pt
    if isinstance(x, int):
        return (x, (-y) % P)
    return (x, Poly([-c for c in y.c], y.mod))


# -- twist: G2 (over Fp2) -> curve over Fp12 ----------------------------------

W = fq12([0, 1] + [0] * 10)
W2 = W * W
W3 = W2 * W


def twist(pt):
    if pt is None:
        return None
    x, y = pt  # Poly over FQ2_MOD
    # map u -> x^6 - 9 (the standard embedding for x^12-18x^6+82)
    xc = [(x.c[0] - 9 * x.c[1]) % P, x.c[1]]
    yc = [(y.c[0] - 9 * y.c[1]) % P, y.c[1]]
    nx = fq12([xc[0]] + [0] * 5 + [xc[1]] + [0] * 5)
    ny = fq12([yc[0]] + [0] * 5 + [yc[1]] + [0] * 5)
    return (nx * W2, ny * W3)


def cast_g1_fq12(pt):
    if pt is None:
        return None
    x, y = pt
    return (fq12([x] + [0] * 11), fq12([y] + [0] * 11))


# -- pairing ------------------------------------------------------------------

def linefunc(p1, p2, t):
    x1, y1 = p1
    x2, y2 = p2
    xt, yt = t
    if not x1 == x2:
        m = (y2 - y1) * (x2 - x1).inv()
        return m * (xt - x1) - (yt - y1)
    if y1 == y2:
        m = (x1 * x1 * 3) * (y1 * 2).inv()
        return m * (xt - x1) - (yt - y1)
    return xt - x1


def miller_loop(q, p):
    """q, p: points over Fp12 (q from twisted G2, p embedded G1)."""
    if q is None or p is None:
        return FQ12_ONE
    r = q
    f = FQ12_ONE
    for i in range(LOG_ATE_LOOP_COUNT, -1, -1):
        f = f * f * linefunc(r, r, p)
        r = double(r)
        if ATE_LOOP_COUNT & (2 ** i):
            f = f * linefunc(r, q, p)
            r = add(r, q)
    q1 = (q[0] ** P, q[1] ** P)
    nq2 = (q1[0] ** P, Poly([-c for c in (q1[1] ** P).c], FQ12_MOD))
    f = f * linefunc(r, q1, p)
    r = add(r, q1)
    f = f * linefunc(r, nq2, p)
    return f ** ((P ** 12 - 1) // R)


def pairing(q_g2, p_g1):
    return miller_loop(twist(q_g2), cast_g1_fq12(p_g1))


# -- JSON marshalling (snarkjs decimal-string format) -------------------------

def _g1(v):
    x, y, z = int(v[0]), int(v[1]), int(v[2])
    if z == 0:
        return None
    zi = _inv(z)
    return (x * zi % P, y * zi % P)


def _g2(v):
    xs, ys, zs = v
    x = fq2(int(xs[0]), int(xs[1]))
    y = fq2(int(ys[0]), int(ys[1]))
    z0, z1 = int(zs[0]), int(zs[1])
    if z0 == 0 and z1 == 0:
        return None
    if z0 == 1 and z1 == 0:
        return (x, y)
    z = fq2(z0, z1)
    zi = z.inv()
    return (x * zi, y * zi)


def groth16_verify_external(vk: dict, public_inputs, proof: dict) -> bool:
    ic = [_g1(p) for p in vk["IC"]]
    if len(public_inputs) + 1 != len(ic):
        return False
    vk_x = ic[0]
    for i, s in enumerate(public_inputs):
        s = int(s)
        if not 0 <= s < R:
            return False
        vk_x = add(vk_x, multiply(ic[i + 1], s))

    A = _g1(proof["pi_a"])
    B = _g2(proof["pi_b"])
    C = _g1(proof["pi_c"])
    alfa1 = _g1(vk["vk_alfa_1"])
    beta2 = _g2(vk["vk_beta_2"])
    gamma2 = _g2(vk["vk_gamma_2"])
    delta2 = _g2(vk["vk_delta_2"])

    # on-curve checks (b = 3 for G1; b2 = 3/(9+u) for G2)
    xi_inv = fq2(9, 1).inv()
    b2 = xi_inv * 3
    for pt in (A, C, vk_x, alfa1):
        if pt is not None:
            x, y = pt
            if (y * y - x * x * x - 3) % P != 0:
                return False
    for pt in (B, beta2, gamma2, delta2):
        if pt is not None:
            x, y = pt
            if not (y * y - x * x * x) == b2:
                return False

    lhs = pairing(B, A)
    rhs = (pairing(beta2, alfa1)
           * pairing(gamma2, vk_x)
           * pairing(delta2, C))
    return lhs == rhs


def main(argv):
    if len(argv) != 4:
        print(__doc__)
        return 2
    with open(argv[1]) as f:
        vk = json.load(f)
    with open(argv[2]) as f:
        pub = json.load(f)
    if not isinstance(pub, list):
        pub = [pub]
    with open(argv[3]) as f:
        proof = json.load(f)
    ok = groth16_verify_external(vk, pub, proof)
    print("OK" if ok else "INVALID")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv))
