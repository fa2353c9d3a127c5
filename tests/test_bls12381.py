"""BLS12-381 oracle tests — the capability set of test/bls12381.js:
tower arithmetic identities, G1/G2 group laws, r*G = 0, unitary property,
pairing bilinearity with the negative ate loop."""

import pytest

from wasmsnark_tpu.models.bls12381 import bls12381, Q, R


@pytest.fixture(scope="module")
def m():
    return bls12381()


def test_fr_ntt_capability(m):
    # Fr has 2-adicity 32 (the BLS12-381 NTT domain, build_fft.js:29-34)
    assert m.ntt_spec.max_bits == 32
    w = m.ntt_spec.roots[2]
    assert pow(w, 4, R) == 1 and pow(w, 2, R) != 1


def test_f2_tower_identities(m):
    F2 = m.F2
    a = (12345, 67890)
    # inverse and Karatsuba mul agree: a * a^-1 == 1
    assert F2.eq(F2.mul(a, F2.inv(a)), F2.one())
    # square == mul(a, a) (complex-style 2M path vs 3M path)
    assert F2.eq(F2.square(a), F2.mul(a, a))
    # conjugate: a * conj(a) lands in the base field
    prod = F2.mul(a, F2.conjugate(a))
    assert prod[1] == 0


def test_f12_tower_identities(m):
    F12 = m.F12
    a = (((1, 2), (3, 4), (5, 6)), ((7, 8), (9, 10), (11, 12)))
    assert F12.eq(F12.mul(a, F12.inv(a)), F12.one())
    assert F12.eq(F12.square(a), F12.mul(a, a))
    # Frobenius via exp: a^(q^12) == a
    assert F12.eq(F12.exp(a, Q ** 12), a)


def test_g1_group_law_and_order(m):
    g = m.g1_gen
    assert m.G1.eq(m.G1.add(g, g), m.G1.double(g))
    assert m.G1.is_zero(m.G1.times_scalar(g, R))
    g5 = m.G1.times_scalar(g, 5)
    assert m.G1.eq(m.G1.add(m.G1.times_scalar(g, 2), m.G1.times_scalar(g, 3)), g5)


def test_g2_group_law_and_order(m):
    g = m.g2_gen
    assert m.G2.eq(m.G2.add(g, g), m.G2.double(g))
    assert m.G2.is_zero(m.G2.times_scalar(g, R))


def test_untwist_lands_on_curve(m):
    # psi(G2gen) satisfies y^2 = x^3 + 4 over Fp12
    F12 = m.F12
    a = m.G2.affine(m.g2_gen)
    x, y = m.untwist_g2((a[0], a[1]))
    lhs = F12.square(y)
    rhs = F12.add(F12.mul(F12.square(x), x), m._embed_fp(4))
    assert F12.eq(lhs, rhs)


def test_pairing_bilinearity(m):
    # e(10 G1, G2) == e(G1, 10 G2) == e(G1, G2)^10 (test/bls12381.js:673)
    a = 10
    e1 = m.pairing(m.G1.times_scalar(m.g1_gen, a), m.g2_gen)
    e2 = m.pairing(m.g1_gen, m.G2.times_scalar(m.g2_gen, a))
    assert m.F12.eq(e1, e2)
    e3 = m.F12.exp(m.pairing(m.g1_gen, m.g2_gen), a)
    assert m.F12.eq(e1, e3)
    assert not m.F12.eq(e1, m.F12.one())


def test_pairing_unitary(m):
    # e(P,Q) * e(-P,Q) == 1 and conj(e) == e^-1 (unitary, test/bls12381.js:643)
    e = m.pairing(m.g1_gen, m.g2_gen)
    en = m.pairing(m.G1.neg(m.g1_gen), m.g2_gen)
    assert m.F12.eq(m.F12.mul(e, en), m.F12.one())
    conj = (e[0], m.F6.neg(e[1]))
    assert m.F12.eq(conj, m.F12.inv(e))


def test_pairing_eq_product(m):
    assert m.pairing_eq([(m.g1_gen, m.g2_gen), (m.G1.neg(m.g1_gen), m.g2_gen)])
    assert not m.pairing_eq([(m.g1_gen, m.g2_gen)])


def test_device_field_kernels_on_bls_fp(m):
    """The batched device kernels are curve-generic: run the mont_mul
    property test on the 381-bit BLS Fp (24 limbs of 16 bits)."""
    import numpy as np
    from wasmsnark_tpu.ops.fp import FpDevice

    F = FpDevice(m.fp_spec)
    rng = np.random.default_rng(7)
    xs = [int(rng.integers(0, 1 << 62)) * 3 % Q for _ in range(8)] + [0, 1, Q - 1]
    ys = [Q - 2, 1, 0] + [int(rng.integers(0, 1 << 62)) ** 2 % Q for _ in range(8)]
    x = F.pack_mont(xs)
    y = F.pack_mont(ys)
    out = F.unpack_mont(np.asarray(F.mont_mul(x, y)))
    for xi, yi, oi in zip(xs, ys, out):
        assert oi == xi * yi % Q
