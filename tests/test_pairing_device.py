"""Device pairing engine vs host oracle.

Fast tier (always): one doubling + one addition Miller step and the sparse
line layout, checked against the oracle's group law and the validated
scaled-line algebra on tiny batches (compiles in seconds on CPU).

Slow tier (WASMSNARK_TPU_SLOW_TESTS=1, or on a real TPU via bench): the full
Miller loop + final exponentiation equals the oracle pairing bit-exactly,
and groth16_verify_batch separates good/tampered proofs.
"""

import os

import numpy as np
import pytest

import jax

from wasmsnark_tpu.models.bn128 import bn128
from wasmsnark_tpu.ops.pairing import bn128_pairing_device

SLOW = os.environ.get("WASMSNARK_TPU_SLOW_TESTS") == "1"


@pytest.fixture(scope="module")
def pd():
    return bn128_pairing_device()


def _to_oracle_f2(pd, el):
    F = pd.fp
    return tuple(F.unpack_mont(np.asarray(c))[0] for c in el)


def test_f2_device_mul_matches_oracle(pd):
    """Cheap always-on check: device F2 Karatsuba mul == oracle (3 muls)."""
    m = pd.m
    a = (123456789, 987654321)
    b = (555, m.F1.q - 7)
    pa = (np.asarray(pd.fp.pack_mont([a[0]])), np.asarray(pd.fp.pack_mont([a[1]])))
    pb = (np.asarray(pd.fp.pack_mont([b[0]])), np.asarray(pd.fp.pack_mont([b[1]])))
    got = jax.jit(pd.F2d.mul)(pa, pb)
    assert _to_oracle_f2(pd, got) == m.F2.mul(a, b)


@pytest.mark.skipif(not SLOW, reason="set WASMSNARK_TPU_SLOW_TESTS=1")
def test_miller_step_updates_match_group_law(pd):
    """The homogeneous dbl/add point updates equal the oracle group law."""
    m = pd.m
    F2o = m.F2
    a2 = m.G2.affine(m.G2.times_scalar(m.g2_gen, 777))
    g1a = m.G1.affine(m.g1_gen)

    g1 = pd.pack_g1([(g1a[0], g1a[1])])
    g2 = pd.pack_g2([(a2[0], a2[1])])
    xQ, yQ = g2
    one = pd.F2d.one_like(xQ)

    @jax.jit
    def step(xQ, yQ, one, xP, yP):
        l, X, Y, Z = pd._dbl_step(xQ, yQ, one, xP, yP)
        l2, X2, Y2, Z2 = pd._add_step(X, Y, Z, xQ, yQ, xP, yP)
        return (X, Y, Z), (X2, Y2, Z2)

    (X, Y, Z), (X2, Y2, Z2) = step(xQ, yQ, one, g1[0], g1[1])

    # device homogeneous -> oracle affine
    def aff(X, Y, Z):
        x, y, z = (_to_oracle_f2(pd, c) for c in (X, Y, Z))
        zi = F2o.inv(z)
        return (F2o.mul(x, zi), F2o.mul(y, zi))

    d2 = m.G2.affine(m.G2.double(m.G2.from_affine(a2[0], a2[1])))
    got = aff(X, Y, Z)
    assert F2o.eq(got[0], d2[0]) and F2o.eq(got[1], d2[1])

    d3 = m.G2.affine(m.G2.times_scalar(m.G2.from_affine(a2[0], a2[1]), 3))
    got3 = aff(X2, Y2, Z2)
    assert F2o.eq(got3[0], d3[0]) and F2o.eq(got3[1], d3[1])


@pytest.mark.skipif(not SLOW, reason="set WASMSNARK_TPU_SLOW_TESTS=1")
def test_f12_device_tower_mul(pd):
    """Device F12 mul/square against the oracle tower on random elements."""
    m = pd.m
    import random
    rng = random.Random(5)
    Q = m.F1.q

    def rand_f12():
        return tuple(tuple((rng.randrange(Q), rng.randrange(Q)) for _ in range(3))
                     for _ in range(2))

    a, b = rand_f12(), rand_f12()

    def pack(el):
        return tuple(tuple(
            (np.asarray(pd.fp.pack_mont([c2[0]])), np.asarray(pd.fp.pack_mont([c2[1]])))
            for c2 in c6) for c6 in el)

    got_mul = jax.jit(pd.F12d.mul)(pack(a), pack(b))
    got_sqr = jax.jit(pd.F12d.square)(pack(a))
    assert pd.unpack_f12(got_mul)[0] == m.F12.mul(a, b)
    assert pd.unpack_f12(got_sqr)[0] == m.F12.square(a)


def _pack_f12(pd, el):
    return tuple(tuple(
        (np.asarray(pd.fp.pack_mont([c2[0]])),
         np.asarray(pd.fp.pack_mont([c2[1]])))
        for c2 in c6) for c6 in el)


def test_frobenius_and_cyclotomic_square(pd):
    """frobenius(p^j) == oracle exp by q^j; Granger-Scott square == full
    square on a unitary (cyclotomic-subgroup) element.  Small always-on
    checks pinning the fast final-exponentiation machinery."""
    import random
    m = pd.m
    Q = m.F1.q
    rng = random.Random(11)
    f = tuple(tuple((rng.randrange(Q), rng.randrange(Q)) for _ in range(3))
              for _ in range(2))
    fd = _pack_f12(pd, f)
    for j in (1, 2, 3):
        got = pd.unpack_f12(jax.jit(lambda x, j=j: pd.frobenius(x, j))(fd))[0]
        assert got == m.F12.exp(f, Q ** j), f"frobenius power {j}"
    # easy-part image is in the cyclotomic subgroup
    u = m.F12.exp(f, (Q ** 6 - 1) * (Q ** 2 + 1))
    ud = _pack_f12(pd, u)
    got = pd.unpack_f12(jax.jit(pd.cyclotomic_square)(ud))[0]
    assert got == m.F12.square(u)


@pytest.mark.skipif(not SLOW, reason="compile-heavy on 1-vCPU CPU (r5 tier timing); chip tier runs it")
def test_f12_inverse_device(pd):
    import random
    m = pd.m
    Q = m.F1.q
    rng = random.Random(13)
    f = tuple(tuple((rng.randrange(Q), rng.randrange(Q)) for _ in range(3))
              for _ in range(2))
    got = pd.unpack_f12(jax.jit(pd.F12d.inv)(_pack_f12(pd, f)))[0]
    assert got == m.F12.inv(f)


@pytest.mark.skipif(not SLOW, reason="set WASMSNARK_TPU_SLOW_TESTS=1")
def test_final_exponentiation_chain_vs_scan(pd):
    """The z-chain final exponentiation equals the full-exponent ladder
    (and both equal the oracle) on a random element."""
    import random
    m = pd.m
    Q = m.F1.q
    rng = random.Random(17)
    f = tuple(tuple((rng.randrange(Q), rng.randrange(Q)) for _ in range(3))
              for _ in range(2))
    fd = _pack_f12(pd, f)
    from wasmsnark_tpu.models.bn128 import R
    want = m.F12.exp(f, (Q ** 12 - 1) // R)
    got = pd.unpack_f12(jax.jit(pd.final_exponentiation)(fd))[0]
    assert got == want


@pytest.mark.skipif(not SLOW, reason="set WASMSNARK_TPU_SLOW_TESTS=1")
def test_full_pairing_matches_oracle(pd):
    m = pd.m
    a = 10
    p1 = m.G1.affine(m.G1.times_scalar(m.g1_gen, a))
    q1 = m.G2.affine(m.g2_gen)
    g1 = pd.pack_g1([(p1[0], p1[1])])
    g2 = pd.pack_g2([(q1[0], q1[1])])
    e = jax.jit(lambda a, b: pd.final_exponentiation(pd.miller_loop(a, b)))(g1, g2)
    e_o = m.final_exponentiation(m.miller_loop((p1[0], p1[1]), (q1[0], q1[1])))
    assert pd.unpack_f12(e)[0] == e_o


def test_bls12381_frobenius_and_cyc_sqr():
    import random
    from wasmsnark_tpu.ops.pairing import bls12381_pairing_device
    pd2 = bls12381_pairing_device()
    m = pd2.m
    Q = m.F1.q
    rng = random.Random(19)
    f = tuple(tuple((rng.randrange(Q), rng.randrange(Q)) for _ in range(3))
              for _ in range(2))
    fd = _pack_f12(pd2, f)
    for j in (1, 2):
        got = pd2.unpack_f12(
            jax.jit(lambda x, j=j: pd2.frobenius(x, j))(fd))[0]
        assert got == m.F12.exp(f, Q ** j)
    u = m.F12.exp(f, (Q ** 6 - 1) * (Q ** 2 + 1))
    got = pd2.unpack_f12(jax.jit(pd2.cyclotomic_square)(_pack_f12(pd2, u)))[0]
    assert got == m.F12.square(u)


@pytest.mark.skipif(not SLOW, reason="48-limb composed compile ~10min on CPU")
def test_mnt6753_frobenius_and_cyc_sqr():
    import random
    from wasmsnark_tpu.ops.pairing import mnt6753_pairing_device
    pd3 = mnt6753_pairing_device()
    m = pd3.m
    Q = m.F1.q
    rng = random.Random(23)
    f = ((rng.randrange(Q), rng.randrange(Q), rng.randrange(Q)),
         (rng.randrange(Q), rng.randrange(Q), rng.randrange(Q)))

    def pack6(el):
        return (tuple(np.asarray(pd3.fp.pack_mont([c])) for c in el[0]),
                tuple(np.asarray(pd3.fp.pack_mont([c])) for c in el[1]))

    got = pd3.unpack_f6(jax.jit(pd3.frobenius)(pack6(f)))[0]
    assert got == m.F6.exp(f, Q)
    u = m.F6.exp(f, (Q ** 3 - 1) * (Q + 1))
    got = pd3.unpack_f6(jax.jit(pd3.cyclotomic_square)(pack6(u)))[0]
    assert got == m.F6.square(u)


@pytest.mark.skipif(not SLOW, reason="set WASMSNARK_TPU_SLOW_TESTS=1")
def test_bls12381_device_pairing_matches_oracle():
    from wasmsnark_tpu.ops.pairing import bls12381_pairing_device
    pd2 = bls12381_pairing_device()
    m = pd2.m
    p1 = m.G1.affine(m.G1.times_scalar(m.g1_gen, 10))
    q1 = m.G2.affine(m.g2_gen)
    g1 = pd2.pack_g1([(p1[0], p1[1])])
    g2 = pd2.pack_g2([(q1[0], q1[1])])
    e = jax.jit(lambda a, b: pd2.final_exponentiation(pd2.miller_loop(a, b)))(g1, g2)
    e_o = m.final_exponentiation(m.miller_loop((p1[0], p1[1]), (q1[0], q1[1])))
    assert pd2.unpack_f12(e)[0] == e_o


@pytest.mark.skipif(not SLOW, reason="set WASMSNARK_TPU_SLOW_TESTS=1")
def test_mnt6753_device_pairing_matches_oracle():
    from wasmsnark_tpu.ops.pairing import mnt6753_pairing_device
    pd3 = mnt6753_pairing_device()
    m = pd3.m
    p1 = m.G1.affine(m.G1.times_scalar(m.g1_gen, 10))
    q1 = m.G2.affine(m.g2_gen)
    g1 = pd3.pack_g1([(p1[0], p1[1])])
    g2 = pd3.pack_g2([(q1[0], q1[1])])
    e = jax.jit(lambda a, b: pd3.final_exponentiation(pd3.miller_loop(a, b)))(g1, g2)
    e_o = m.final_exponentiation(m.miller_loop((p1[0], p1[1]), (q1[0], q1[1])))
    assert pd3.unpack_f6(e)[0] == e_o


# ---------------------------------------------------------------------------
# Prepared pairing inputs (prepareG2 / PRECOMPUTE pattern)
# ---------------------------------------------------------------------------


def _unpack_tree(pd, tree):
    return jax.tree.map(
        lambda a: pd.fp.unpack_mont(np.asarray(a)), tree)


@pytest.mark.skipif(not SLOW, reason="compile-heavy on 1-vCPU CPU (r5 tier timing); chip tier runs it")
def test_prepared_coefs_match_direct_steps_bn(pd):
    """Fast tier: the pre-P coefficients emitted by prepare_g2 reproduce the
    direct _dbl_step/_add_step line values at P for the first two schedule
    steps (dbl, then dbl-or-add per the ate bits)."""
    from wasmsnark_tpu.ops.pairing import _step_flags
    m = pd.m
    q2 = m.G2.affine(m.G2.times_scalar(m.g2_gen, 5))
    p1 = m.G1.affine(m.G1.times_scalar(m.g1_gen, 3))
    g1 = pd.pack_g1([(p1[0], p1[1])])
    g2 = pd.pack_g2([(q2[0], q2[1])])
    xQ, yQ = g2

    coeffs = jax.jit(pd.prepare_g2)(g2)
    flags = _step_flags(pd.loop_bits, n_corr=2)
    assert jax.tree.leaves(coeffs)[0].shape[0] == len(flags)

    @jax.jit
    def direct(g1, g2):
        xP, yP = g1
        xQ, yQ = g2
        one = pd.F2d.one_like(xQ)
        l1, X, Y, Z = pd._dbl_step(xQ, yQ, one, xP, yP)
        if flags[1]:
            l2, _, _, _ = pd._add_step(X, Y, Z, xQ, yQ, xP, yP)
        else:
            l2, _, _, _ = pd._dbl_step(X, Y, Z, xP, yP)
        return l1, l2

    @jax.jit
    def prepared(g1, coeffs):
        c0 = jax.tree.map(lambda a: a[0], coeffs)
        c1 = jax.tree.map(lambda a: a[1], coeffs)
        return (pd._line_from_coefs(c0, g1[0], g1[1]),
                pd._line_from_coefs(c1, g1[0], g1[1]))

    d1, d2 = direct(g1, g2)
    p1l, p2l = prepared(g1, coeffs)
    assert _unpack_tree(pd, d1) == _unpack_tree(pd, p1l)
    assert _unpack_tree(pd, d2) == _unpack_tree(pd, p2l)


@pytest.mark.skipif(not SLOW, reason="compile-heavy on 1-vCPU CPU (r5 tier timing); chip tier runs it")
def test_prepared_coefs_match_direct_steps_mnt():
    """Fast tier, MNT6753: prepared coefficients reproduce the direct
    mnt_dbl/add_formula line values (first two schedule steps)."""
    from wasmsnark_tpu.ops.pairing import mnt6753_pairing_device, _step_flags
    pd3 = mnt6753_pairing_device()
    m = pd3.m
    q2 = m.G2.affine(m.G2.times_scalar(m.g2_gen, 5))
    p1 = m.G1.affine(m.G1.times_scalar(m.g1_gen, 3))
    g1 = pd3.pack_g1([(p1[0], p1[1])])
    g2 = pd3.pack_g2([(q2[0], q2[1])])
    flags = _step_flags(pd3.loop_bits)

    @jax.jit
    def direct(g1, g2):
        xP, yP = g1
        xQ, yQ = g2
        one = pd3.F3d.one_like(xQ)
        l1, X, Y, Z = pd3._dbl_step(xQ, yQ, one, xP, yP)
        if flags[1]:
            l2, _, _, _ = pd3._add_step(X, Y, Z, xQ, yQ, xP, yP)
        else:
            l2, _, _, _ = pd3._dbl_step(X, Y, Z, xP, yP)
        return l1, l2

    @jax.jit
    def prepared(g1, g2):
        coeffs = pd3.prepare_g2(g2)
        c0 = jax.tree.map(lambda a: a[0], coeffs)
        c1 = jax.tree.map(lambda a: a[1], coeffs)
        return (pd3._line_from_coefs(c0, g1[0], g1[1]),
                pd3._line_from_coefs(c1, g1[0], g1[1]))

    d1, d2 = direct(g1, g2)
    p1l, p2l = prepared(g1, g2)
    assert _unpack_tree(pd3, d1) == _unpack_tree(pd3, p1l)
    assert _unpack_tree(pd3, d2) == _unpack_tree(pd3, p2l)


@pytest.mark.skipif(not SLOW, reason="set WASMSNARK_TPU_SLOW_TESTS=1")
def test_prepared_miller_loop_matches_direct_bn(pd):
    """miller_loop_prepared(g1, prepare_g2(g2)) == miller_loop(g1, g2)
    bit-exactly (incl. the two Frobenius correction steps)."""
    m = pd.m
    p1 = m.G1.affine(m.G1.times_scalar(m.g1_gen, 10))
    q2 = m.G2.affine(m.G2.times_scalar(m.g2_gen, 7))
    g1 = pd.pack_g1([(p1[0], p1[1])])
    g2 = pd.pack_g2([(q2[0], q2[1])])
    want = jax.jit(pd.miller_loop)(g1, g2)
    got = jax.jit(
        lambda g1, g2: pd.miller_loop_prepared(g1, pd.prepare_g2(g2)))(g1, g2)
    assert pd.unpack_f12(got) == pd.unpack_f12(want)


@pytest.mark.skipif(not SLOW, reason="set WASMSNARK_TPU_SLOW_TESTS=1")
def test_prepared_miller_loop_matches_direct_bls():
    from wasmsnark_tpu.ops.pairing import bls12381_pairing_device
    pd2 = bls12381_pairing_device()
    m = pd2.m
    p1 = m.G1.affine(m.G1.times_scalar(m.g1_gen, 10))
    q2 = m.G2.affine(m.G2.times_scalar(m.g2_gen, 7))
    g1 = pd2.pack_g1([(p1[0], p1[1])])
    g2 = pd2.pack_g2([(q2[0], q2[1])])
    want = jax.jit(pd2.miller_loop)(g1, g2)
    got = jax.jit(
        lambda g1, g2: pd2.miller_loop_prepared(g1, pd2.prepare_g2(g2)))(g1, g2)
    assert pd2.unpack_f12(got) == pd2.unpack_f12(want)


@pytest.mark.skipif(not SLOW, reason="compile-heavy on 1-vCPU CPU (r5 tier timing); chip tier runs it")
def test_prepared_coefs_match_direct_steps_bls():
    """Fast tier, BLS12-381: prepared coefficients reproduce the direct
    _dbl_step/_add_step line values (first two schedule steps)."""
    from wasmsnark_tpu.ops.pairing import bls12381_pairing_device, _step_flags
    pd2 = bls12381_pairing_device()
    m = pd2.m
    q2 = m.G2.affine(m.G2.times_scalar(m.g2_gen, 5))
    p1 = m.G1.affine(m.G1.times_scalar(m.g1_gen, 3))
    g1 = pd2.pack_g1([(p1[0], p1[1])])
    g2 = pd2.pack_g2([(q2[0], q2[1])])
    flags = _step_flags(pd2.loop_bits)

    @jax.jit
    def direct(g1, g2):
        xP, yP = g1
        xQ, yQ = g2
        one = pd2.F2d.one_like(xQ)
        l1, X, Y, Z = pd2._dbl_step(xQ, yQ, one, xP, yP)
        if flags[1]:
            l2, _, _, _ = pd2._add_step(X, Y, Z, xQ, yQ, xP, yP)
        else:
            l2, _, _, _ = pd2._dbl_step(X, Y, Z, xP, yP)
        return l1, l2

    @jax.jit
    def prepared(g1, g2):
        coeffs = pd2.prepare_g2(g2)
        c0 = jax.tree.map(lambda a: a[0], coeffs)
        c1 = jax.tree.map(lambda a: a[1], coeffs)
        return (pd2._line_from_coefs(c0, g1[0], g1[1]),
                pd2._line_from_coefs(c1, g1[0], g1[1]))

    d1, d2 = direct(g1, g2)
    p1l, p2l = prepared(g1, g2)
    assert _unpack_tree(pd2, d1) == _unpack_tree(pd2, p1l)
    assert _unpack_tree(pd2, d2) == _unpack_tree(pd2, p2l)
