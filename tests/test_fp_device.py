"""Device prime-field kernels vs bigint oracle on adversarial grids.

Port of the reference's oracle-test pattern (test/f1.js: every op compared
against big-integer host arithmetic over helpers.genValues grids, for several
moduli including tiny primes and all three production fields).
"""

import jax
import pytest

from wasmsnark_tpu.fields.spec import FieldSpec
from wasmsnark_tpu.ops.fp import FpDevice

from conftest import gen_values

BN128_Q = 21888242871839275222246405745257275088696311157297823662689037894645226208583
BN128_R = 21888242871839275222246405745257275088548364400416034343698204186575808495617
BLS_Q = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB
MNT_Q = int(
    "0x01C4C62D92C41110229022EEE2CDADB7F997505B8FAFED5EB7E8F96C97D87307FDB925E8A0ED8D9"
    "9D124D9A15AF79DB117E776F218059DB80F0DA5CB537E38685ACCE9767254A4638810719AC425F0E3"
    "9D54522CDD119F5E9063DE245E8001", 16)

MODULI = [
    ("tiny101", 101),
    ("two_limb", (1 << 31) - 1),
    ("bn128_fp", BN128_Q),
    ("bn128_fr", BN128_R),
    ("bls12381_fp", BLS_Q),
]

MODULI_SLOW = [("mnt6753_fp", MNT_Q)]


def _vectors(q):
    vals = gen_values(q)
    n = len(vals)
    xs = [vals[i % n] for i in range(2 * n)]
    ys = [vals[(i * 7 + 3) % n] for i in range(2 * n)]
    return xs, ys


@pytest.mark.parametrize("name,q", MODULI + MODULI_SLOW, ids=lambda v: str(v)[:12])
def test_field_ops_vs_oracle(name, q):
    spec = FieldSpec(q, name)
    F = FpDevice(spec)
    xs, ys = _vectors(q)
    X, Y = F.pack(xs), F.pack(ys)
    R, Rinv = spec.R, pow(spec.R, -1, q)

    add = F.unpack(jax.jit(F.add)(X, Y))
    sub = F.unpack(jax.jit(F.sub)(X, Y))
    neg = F.unpack(jax.jit(F.neg)(X))
    mul = F.unpack(jax.jit(F.mont_mul)(X, Y))
    sqr = F.unpack(jax.jit(F.mont_sqr)(X))
    tm = F.unpack(jax.jit(F.to_mont)(X))
    fm = F.unpack(jax.jit(F.from_mont)(X))

    for i, (a, b) in enumerate(zip(xs, ys)):
        assert add[i] == (a + b) % q
        assert sub[i] == (a - b) % q
        assert neg[i] == (-a) % q
        assert mul[i] == a * b * Rinv % q, (name, i, a, b)
        assert sqr[i] == a * a * Rinv % q
        assert tm[i] == a * R % q
        assert fm[i] == a * Rinv % q


@pytest.mark.parametrize("name,q", MODULI[2:4], ids=lambda v: str(v)[:12])
def test_inverse_and_pow(name, q):
    spec = FieldSpec(q, name)
    F = FpDevice(spec)
    vals = [v for v in gen_values(q, n_random=8) if v != 0][:12]
    Xm = F.pack([v * spec.R % q for v in vals])
    inv = F.unpack(jax.jit(F.mont_inv)(Xm))
    for v, g in zip(vals, inv):
        assert g == pow(v, -1, q) * spec.R % q
    # exp with a small exponent
    p7 = F.unpack(jax.jit(lambda x: F.mont_pow_const(x, 7))(Xm))
    for v, g in zip(vals, p7):
        assert g == pow(v, 7, q) * spec.R % q


@pytest.mark.parametrize("name,q", MODULI[2:4], ids=lambda v: str(v)[:12])
def test_batch_inv(name, q):
    """Montgomery-trick simultaneous inversion: one Fermat ladder for K
    elements, zeros pass through as zero (int_inverseMod/f1m_inverse
    parity, build_int.js:926-1054 / build_f1m.js:772-782)."""
    spec = FieldSpec(q, name)
    F = FpDevice(spec)
    vals = gen_values(q, n_random=8)[:12]
    vals[3] = 0  # zero lane must not poison the shared product chain
    cols = [[(v * (k + 1) + k) % q for v in vals] for k in range(4)]
    Xs = [F.pack([v * spec.R % q for v in col]) for col in cols]
    outs = jax.jit(lambda xs: F.batch_inv(xs))(Xs)
    for col, o in zip(cols, outs):
        got = F.unpack(o)
        for v, g in zip(col, got):
            want = 0 if v == 0 else pow(v, -1, q) * spec.R % q
            assert g == want
    # K=1 fast path
    (o1,) = jax.jit(lambda xs: F.batch_inv(xs))([Xs[0]])
    for v, g in zip(cols[0], F.unpack(o1)):
        assert g == (0 if v == 0 else pow(v, -1, q) * spec.R % q)


def test_broadcast_mul():
    spec = FieldSpec(BN128_R)
    F = FpDevice(spec)
    xs = gen_values(BN128_R, n_random=4)
    X = F.pack(xs)
    c = 1234567890123456789
    C = F.pack([c])
    got = F.unpack(jax.jit(F.mont_mul)(X, C))
    Rinv = pow(spec.R, -1, BN128_R)
    for a, g in zip(xs, got):
        assert g == a * c * Rinv % BN128_R


def test_predicates():
    spec = FieldSpec(BN128_R)
    F = FpDevice(spec)
    X = F.pack([0, 1, 5, 0])
    Y = F.pack([0, 2, 5, 1])
    assert list(jax.jit(F.is_zero)(X)) == [True, False, False, True]
    assert list(jax.jit(F.eq)(X, Y)) == [True, False, True, False]
