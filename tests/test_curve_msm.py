"""Device curve group law + MSM vs the bigint oracle.

Covers the reference's test surface: G1/G2 add/double consistency and
degenerate cases (test/bn128.js), and the multiexp equivalence pattern of
test/bn128_prover.js:9-49 (same group sum from independent algorithms).
"""

import os
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


def pack_g1_affine(points):
    """Oracle points -> affine (x, y) planes; zero encoded (0, 0) (the pkey
    storage convention the MSM consumes)."""
    aff = [(0, 0) if m.G1.is_zero(p) else m.G1.affine(p)[:2] for p in points]
    return (Fp.pack_mont([a[0] for a in aff]),
            Fp.pack_mont([a[1] for a in aff]))


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


@pytest.mark.parametrize("window_bits", [
    4,
    pytest.param(16, marks=pytest.mark.skipif(
        os.environ.get("WASMSNARK_TPU_SLOW_TESTS") != "1",
        reason="c=16 builds 2^15+1 bucket lanes (~3 min compile+compute "
               "on CPU); covered by bench.py's checked 2^20 run on chip")),
])
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
    P = pack_g1_affine(pts)
    msm = MSMDevice(G1d, window_bits=window_bits)
    win = unpack_g1(jax.jit(msm.msm)(S, P))
    got = fold_windows(m.G1, win, window_bits)
    assert eq_or_zero(m.G1, m.G1.msm(pts, scalars), got)


def test_g1_msm_production_config():
    """Oracle cross-check at the production configuration: window 12,
    n = 2^14 — exercises the >256-lane segmented-scan recursion, the
    window-group loop, the chunk-crossing bucket fixup, and the signed-digit
    recode at scale.  Points are a tiled set of 128 distinct generator
    multiples so the expected sum is one host scalar mul."""
    random.seed(31)
    n, window_bits = 1 << 14, 12
    ks = [random.randrange(1, R) for _ in range(128)]
    base_pts = [m.G1.affine(m.G1.times_scalar(m.g1_gen, k)) for k in ks]
    P0 = pack_g1_affine(base_pts)
    reps = n // 128
    P = tuple(jnp.tile(jnp.asarray(c), (1, reps)) for c in P0)
    scalars = [random.randrange(R) for _ in range(n)]
    S = jnp.asarray(ints_to_limbs(scalars, 16))
    msm = MSMDevice(G1d, window_bits=window_bits, group_windows=8)
    win = unpack_g1(jax.jit(msm.msm)(S, P))
    got = fold_windows(m.G1, win, window_bits)
    expected_k = sum(s * ks[i % 128] for i, s in enumerate(scalars)) % R
    expected = m.G1.times_scalar(m.g1_gen, expected_k)
    assert eq_or_zero(m.G1, expected, got)


def test_g1_msm_point_device_fold():
    """msm_point (device window fold) == host fold_windows."""
    random.seed(12)
    n = 24
    pts = [m.G1.affine(m.G1.times_scalar(m.g1_gen, random.randrange(1, R)))
           for _ in range(n)]
    scalars = [random.randrange(R) for _ in range(n)]
    S = jnp.asarray(ints_to_limbs(scalars, 16))
    P = pack_g1_affine(pts)
    msm = MSMDevice(G1d, window_bits=8)
    dev = jax.jit(msm.msm_point)(S, P)
    got = unpack_g1(tuple(c[:, None] for c in dev))[0]
    assert eq_or_zero(m.G1, m.G1.msm(pts, scalars), got)


def test_g2_msm_vs_oracle():
    """G2 MSM (tower field) through the same signed/affine machinery."""
    random.seed(13)
    n = 16
    pts = [m.G2.affine(m.G2.times_scalar(m.g2_gen, random.randrange(1, R)))
           for _ in range(n - 1)] + [m.G2.zero()]
    aff = [((0, 0), (0, 0)) if m.G2.is_zero(p) else (p[0], p[1]) for p in pts]

    def pack_f2(vals):
        return (Fp.pack_mont([v[0] for v in vals]),
                Fp.pack_mont([v[1] for v in vals]))

    P = (pack_f2([a[0] for a in aff]), pack_f2([a[1] for a in aff]))
    scalars = [random.randrange(R) for _ in range(n - 1)] + [0]
    S = jnp.asarray(ints_to_limbs(scalars, 16))
    msm = MSMDevice(G2d, window_bits=8)
    win = unpack_g2(jax.jit(msm.msm)(S, P))
    got = fold_windows(m.G2, win, 8)
    assert eq_or_zero(m.G2, m.G2.msm(pts, scalars), got)


def test_g1_madd_vs_oracle():
    """Mixed add (Jacobian + affine) degeneracies: generic, same point,
    inverse pair, affine zero, Jacobian zero, both zero."""
    random.seed(17)
    pts = [m.G1.times_scalar(m.g1_gen, random.randrange(1, R))
           for _ in range(3)]
    z = m.G1.zero()
    P = [pts[0], pts[1], pts[1], pts[2], z, z]
    Qo = [pts[1], pts[1], m.G1.neg(pts[1]), z, pts[0], z]
    # q operand must be affine
    Qo = [q if m.G1.is_zero(q) else m.G1.from_affine(*m.G1.affine(q)[:2])
          for q in Qo]
    got = unpack_g1(jax.jit(G1d.madd)(pack_g1(P), pack_g1_affine(Qo)))
    for i, (p, q) in enumerate(zip(P, Qo)):
        assert eq_or_zero(m.G1, m.G1.add(p, q), got[i]), i


def test_g1_msm_sharded_2d_mesh():
    """Point-axis sharding over a hierarchical (host x chip) mesh — the
    multi-slice layout: partial window sums gather hierarchically (ICI
    within a host row, DCN across).  Virtual 8-CPU mesh as 2 x 4; N not a
    multiple of the mesh size (internal padding)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from wasmsnark_tpu.parallel.mesh import make_mesh_2d, msm_sharded
    random.seed(21)
    n = 42  # deliberately not divisible by 8
    pts = [m.G1.affine(m.G1.times_scalar(m.g1_gen, random.randrange(1, R)))
           for _ in range(n)]
    scalars = [random.randrange(R) for _ in range(n)]
    mesh = make_mesh_2d(2, 4)
    msm = MSMDevice(G1d, window_bits=4)
    run = msm_sharded(msm, mesh, axis=("host", "points"))
    win = unpack_g1(run(jnp.asarray(ints_to_limbs(scalars, 16)),
                        pack_g1_affine(pts)))
    got = fold_windows(m.G1, win, 4)
    assert eq_or_zero(m.G1, m.G1.msm(pts, scalars), got)
