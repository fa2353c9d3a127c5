"""Device curve group law + MSM vs the bigint oracle.

Covers the reference's test surface: G1/G2 add/double consistency and
degenerate cases (test/bn128.js), and the multiexp equivalence pattern of
test/bn128_prover.js:9-49 (same group sum from independent algorithms).
"""

import random

import jax
import jax.numpy as jnp
import pytest

from wasmsnark_tpu.models.bn128 import bn128, R
from wasmsnark_tpu.ops.fp import FpDevice
from wasmsnark_tpu.ops.towers import FpAdapter, F2Device
from wasmsnark_tpu.ops.curve import JacobianDevice
from wasmsnark_tpu.ops.msm import MSMDevice, fold_windows
from wasmsnark_tpu.utils.serialize import ints_to_limbs

m = bn128()
Fp = FpDevice(m.fp_spec)
A1 = FpAdapter(Fp)
G1d = JacobianDevice(A1)
G2d = JacobianDevice(F2Device(A1, A1.neg))


def pack_g1(points):
    return (Fp.pack_mont([p[0] for p in points]),
            Fp.pack_mont([p[1] for p in points]),
            Fp.pack_mont([p[2] for p in points]))


def unpack_g1(p):
    return list(zip(Fp.unpack_mont(p[0]), Fp.unpack_mont(p[1]), Fp.unpack_mont(p[2])))


def pack_g2(points):
    def pack_f2(vals):
        return (Fp.pack_mont([v[0] for v in vals]), Fp.pack_mont([v[1] for v in vals]))
    return tuple(pack_f2([p[i] for p in points]) for i in range(3))


def unpack_g2(p):
    comps = [(Fp.unpack_mont(c[0]), Fp.unpack_mont(c[1])) for c in p]
    nb = len(comps[0][0])
    return [tuple((comps[i][0][j], comps[i][1][j]) for i in range(3)) for j in range(nb)]


def eq_or_zero(curve, exp, got):
    if curve.is_zero(exp):
        return curve.is_zero(got)
    return curve.eq(exp, got)


def test_g1_complete_add_degeneracies():
    random.seed(3)
    g = m.g1_gen
    pts = [m.G1.times_scalar(g, random.randrange(1, R)) for _ in range(4)]
    z = m.G1.zero()
    P = [pts[0], pts[1], pts[2], pts[2], z, pts[3], z]
    Q = [pts[1], pts[0], pts[2], m.G1.neg(pts[2]), pts[3], z, z]
    got = unpack_g1(jax.jit(G1d.add)(pack_g1(P), pack_g1(Q)))
    for i, (p, q) in enumerate(zip(P, Q)):
        assert eq_or_zero(m.G1, m.G1.add(p, q), got[i]), i
    gotd = unpack_g1(jax.jit(G1d.double)(pack_g1(P)))
    for i, p in enumerate(P):
        assert eq_or_zero(m.G1, m.G1.double(p), gotd[i]), i


def test_g2_complete_add():
    random.seed(4)
    g2 = m.g2_gen
    pts = [m.G2.times_scalar(g2, random.randrange(1, R)) for _ in range(3)]
    z = m.G2.zero()
    P = [pts[0], pts[1], pts[1], z]
    Q = [pts[1], pts[1], m.G2.neg(pts[1]), pts[2]]
    got = unpack_g2(jax.jit(G2d.add)(pack_g2(P), pack_g2(Q)))
    for i, (p, q) in enumerate(zip(P, Q)):
        assert eq_or_zero(m.G2, m.G2.add(p, q), got[i]), i


@pytest.mark.parametrize("window_bits", [4])
def test_g1_msm_vs_oracle(window_bits):
    """Multiexp equivalence (pattern of test/bn128_prover.js:9-49): adversarial
    input with repeats, zero point, negation pair, zero scalar, unreduced
    256-bit scalar."""
    random.seed(9)
    g = m.g1_gen
    n = 32
    pts = [m.G1.affine(m.G1.times_scalar(g, random.randrange(1, R)))
           for _ in range(n - 4)]
    pts += [pts[0], pts[0], m.G1.zero(), m.G1.neg(pts[1])]
    scalars = [random.randrange(R) for _ in range(n - 3)] + [0, 2 ** 256 - 1, 7]
    S = jnp.asarray(ints_to_limbs(scalars, 16))
    P = pack_g1(pts)
    msm = MSMDevice(G1d, window_bits=window_bits)
    win = unpack_g1(jax.jit(msm.msm)(S, P))
    got = fold_windows(m.G1, win, window_bits)
    assert eq_or_zero(m.G1, m.G1.msm(pts, scalars), got)
