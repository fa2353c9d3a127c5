"""Tower-level parity tests: sparse-vs-dense multiplies, gamma-table
Frobenius vs exp-by-q^i, cyclotomic square vs square, unitarity.

Port of the reference's deep tower suites (test/bls12381.js:577-741 sparse
mul1/mul01/mul014 vs dense, Frobenius 1-10 vs exponentiation, cyclotomic
square vs square, unitary property :643; test/bn128.js:131-180 mulBy024
pattern) to the oracle tier — fast, no device compile.
"""

import random

import pytest

from wasmsnark_tpu.models.bn128 import bn128, Q as BN_Q
from wasmsnark_tpu.models.bls12381 import bls12381, Q as BLS_Q


def _rand2(q, rng):
    return (rng.randrange(q), rng.randrange(q))


def _rand6(q, rng):
    return tuple(_rand2(q, rng) for _ in range(3))


def _rand12(q, rng):
    return (_rand6(q, rng), _rand6(q, rng))


def _unitary(m, q, rng):
    """A random element of the cyclotomic subgroup: the easy-part image
    f^((q^6-1)(q^2+1)) of a random f (build_bn128.js:943-978)."""
    F = m.F12
    f = _rand12(q, rng)
    t = F.mul(F.conjugate(f), F.inv(f))          # f^(q^6 - 1)
    return F.mul(F.exp(t, q * q), t)             # ^(q^2 + 1)


@pytest.mark.parametrize("name", ["bn128", "bls12381"])
def test_frobenius_vs_exp(name):
    """Gamma-table Frobenius i = 1..10 equals exp by q^i
    (test/bn128.js / test/bls12381.js Frobenius suites)."""
    m, q = (bn128(), BN_Q) if name == "bn128" else (bls12381(), BLS_Q)
    rng = random.Random(7)
    f = _rand12(q, rng)
    fr = f
    for i in range(1, 11):
        fr = m.frobenius(fr)                      # compose power-1 maps
        assert m.F12.eq(fr, m.frobenius(f, i)), f"{name} frob^{i} compose"
        if i <= 3 or i in (6, 10):                # exp check on a subset
            assert m.F12.eq(fr, m.F12.exp(f, q ** i)), f"{name} frob {i}"


@pytest.mark.parametrize("name", ["bn128", "bls12381"])
def test_frobenius_12_identity(name):
    m, q = (bn128(), BN_Q) if name == "bn128" else (bls12381(), BLS_Q)
    f = _rand12(q, random.Random(8))
    g = f
    for _ in range(12):
        g = m.frobenius(g)
    assert m.F12.eq(g, f)


def test_bls_sparse_mul_by_1_vs_dense():
    m = bls12381()
    rng = random.Random(9)
    a = _rand6(BLS_Q, rng)
    c1 = _rand2(BLS_Q, rng)
    z2 = (0, 0)
    dense = m.F6.mul(a, (z2, c1, z2))
    assert m.F6.eq(m.F6.mul_by_1(a, c1), dense)


def test_bls_sparse_mul_by_01_vs_dense():
    m = bls12381()
    rng = random.Random(10)
    a = _rand6(BLS_Q, rng)
    c0, c1 = _rand2(BLS_Q, rng), _rand2(BLS_Q, rng)
    z2 = (0, 0)
    dense = m.F6.mul(a, (c0, c1, z2))
    assert m.F6.eq(m.F6.mul_by_01(a, c0, c1), dense)
    # degenerate coefficients
    assert m.F6.eq(m.F6.mul_by_01(a, z2, c1), m.F6.mul(a, (z2, c1, z2)))
    assert m.F6.eq(m.F6.mul_by_01(a, c0, z2), m.F6.mul(a, (c0, z2, z2)))


def test_bls_mul_by_014_vs_dense():
    m = bls12381()
    rng = random.Random(11)
    f = _rand12(BLS_Q, rng)
    c0, c1, c4 = (_rand2(BLS_Q, rng) for _ in range(3))
    z2 = (0, 0)
    sparse_el = ((c0, c1, z2), (z2, c4, z2))
    assert m.F12.eq(m.mul_by_014(f, c0, c1, c4), m.F12.mul(f, sparse_el))
    # with a zero coefficient slot
    assert m.F12.eq(m.mul_by_014(f, c0, z2, c4),
                    m.F12.mul(f, ((c0, z2, z2), (z2, c4, z2))))


def test_bn_mul_line_vs_dense():
    """The device Miller loop's line shape ((a0,0,0),(b0,b1,0)) — the
    __mulBy024 analogue (test/bn128.js:131-180 pattern)."""
    m = bn128()
    rng = random.Random(12)
    f = _rand12(BN_Q, rng)
    a0, b0, b1 = (_rand2(BN_Q, rng) for _ in range(3))
    z2 = (0, 0)
    line = ((a0, z2, z2), (b0, b1, z2))
    assert m.F12.eq(m.mul_line(f, a0, b0, b1), m.F12.mul(f, line))
    assert m.F12.eq(m.mul_line(f, a0, z2, b1),
                    m.F12.mul(f, ((a0, z2, z2), (z2, b1, z2))))


@pytest.mark.parametrize("name", ["bn128", "bls12381"])
def test_cyclotomic_square_vs_square(name):
    """GS squaring equals the full square on the cyclotomic subgroup but
    NOT on general elements (test/bls12381.js cyclotomic suite)."""
    m, q = (bn128(), BN_Q) if name == "bn128" else (bls12381(), BLS_Q)
    rng = random.Random(13)
    u = _unitary(m, q, rng)
    assert m.F12.eq(m.cyclotomic_square(u), m.F12.square(u))
    sq = u
    for _ in range(4):
        sq = m.cyclotomic_square(sq)
    assert m.F12.eq(sq, m.F12.exp(u, 16))


@pytest.mark.parametrize("name", ["bn128", "bls12381"])
def test_unitarity(name):
    """After the easy part, conjugate == inverse (the unitary property,
    test/bls12381.js:643)."""
    m, q = (bn128(), BN_Q) if name == "bn128" else (bls12381(), BLS_Q)
    u = _unitary(m, q, random.Random(14))
    F = m.F12
    assert F.eq(F.conjugate(u), F.inv(u))
    assert F.eq(F.mul(u, F.conjugate(u)), F.one())
