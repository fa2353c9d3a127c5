"""Batched projective group law (build_curve_projective.js semantics) vs the
host oracle.

Fast tier: a toy short-Weierstrass curve y^2 = x^3 + 3x + 11 over a 2-limb
prime — same generic ProjectiveDevice code path as MNT6753 but cheap to
compile on CPU.  Slow tier (WASMSNARK_TPU_SLOW_TESTS=1): the real 753-bit
MNT6753 G1 and G2-over-F3 instantiations."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wasmsnark_tpu.fields.spec import FieldSpec
from wasmsnark_tpu.fields import oracle as fo
from wasmsnark_tpu.curves.oracle import ProjectiveCurve
from wasmsnark_tpu.ops.fp import FpDevice
from wasmsnark_tpu.ops.towers import FpAdapter, F3Device
from wasmsnark_tpu.ops.curve import ProjectiveDevice

SLOW = os.environ.get("WASMSNARK_TPU_SLOW_TESTS") == "1"

P = (1 << 61) - 1  # Mersenne prime, 4 limbs
A_TOY = 3


@pytest.fixture(scope="module")
def toy():
    spec = FieldSpec(P, "toy61")
    F = fo.Fp(spec)
    curve = ProjectiveCurve(F, lambda z: F.mul(A_TOY, z), "toy")
    # y^2 = x^3 + 3x + 11: x=2 -> y^2 = 25 -> y=5
    gen = curve.from_affine(2, 5)
    Fp = FpDevice(spec)
    a_mont = np.asarray(Fp.pack_mont([A_TOY]))
    dev = ProjectiveDevice(
        FpAdapter(Fp), lambda z: Fp.mont_mul(z, jnp.asarray(a_mont)))
    return spec, F, curve, gen, Fp, dev


def _pack(Fp, plist):
    return tuple(jnp.asarray(Fp.pack_mont([p[i] for p in plist]))
                 for i in range(3))


def test_projective_add_all_cases(toy):
    spec, F, curve, gen, Fp, dev = toy
    import random
    rng = random.Random(3)
    pts = [curve.times_scalar(gen, rng.randrange(1, 1 << 40)) for _ in range(4)]
    zero = curve.zero()
    Pl = [pts[0], pts[1], zero, pts[2], pts[3]]
    Ql = [pts[0], curve.neg(pts[1]), pts[2], zero, pts[0]]
    out = jax.jit(dev.add)(_pack(Fp, Pl), _pack(Fp, Ql))
    xs, ys, zs = (Fp.unpack_mont(np.asarray(c)) for c in out)
    for i in range(len(Pl)):
        want = curve.add(Pl[i], Ql[i])
        if curve.is_zero(want):
            assert zs[i] == 0
        else:
            assert curve.eq((xs[i], ys[i], zs[i]), want)


def test_projective_double_and_ladder(toy):
    spec, F, curve, gen, Fp, dev = toy
    Pl = [gen, curve.zero(), curve.double(gen)]
    out = jax.jit(dev.double)(_pack(Fp, Pl))
    xs, ys, zs = (Fp.unpack_mont(np.asarray(c)) for c in out)
    for i in range(len(Pl)):
        want = curve.double(Pl[i])
        if curve.is_zero(want):
            assert zs[i] == 0
        else:
            assert curve.eq((xs[i], ys[i], zs[i]), want)


@pytest.mark.skipif(not SLOW, reason="set WASMSNARK_TPU_SLOW_TESTS=1")
def test_mnt6753_g1_device():
    from wasmsnark_tpu.models.mnt6753 import mnt6753, R, A
    m = mnt6753()
    Fp = FpDevice(m.fp_spec)
    a_mont = np.asarray(Fp.pack_mont([A]))
    dev = ProjectiveDevice(
        FpAdapter(Fp), lambda z: Fp.mont_mul(z, jnp.asarray(a_mont)))
    pts = [m.g1_gen, m.G1.times_scalar(m.g1_gen, 12345)]
    out = jax.jit(dev.add)(_pack(Fp, pts), _pack(Fp, list(reversed(pts))))
    xs, ys, zs = (Fp.unpack_mont(np.asarray(c)) for c in out)
    want = m.G1.add(pts[0], pts[1])
    assert m.G1.eq((xs[0], ys[0], zs[0]), want)
    assert m.G1.eq((xs[1], ys[1], zs[1]), want)


@pytest.mark.skipif(not SLOW, reason="set WASMSNARK_TPU_SLOW_TESTS=1")
def test_mnt6753_g2_over_f3_device():
    from wasmsnark_tpu.models.mnt6753 import mnt6753, A, NR
    m = mnt6753()
    Fp = FpDevice(m.fp_spec)
    base = FpAdapter(Fp)
    nr_mont = jnp.asarray(Fp.pack_mont([NR]))
    F3d = F3Device(base, lambda z: Fp.mont_mul(z, nr_mont))
    a_mont = jnp.asarray(Fp.pack_mont([A]))

    def mul_a2(z):  # a2 = A*v^2: (z0,z1,z2) -> (A*nr*z1, A*nr*z2, A*z0)
        anr = Fp.mont_mul(a_mont, nr_mont)
        return (Fp.mont_mul(z[1], anr), Fp.mont_mul(z[2], anr),
                Fp.mont_mul(z[0], a_mont))

    G2d = ProjectiveDevice(F3d, mul_a2)
    g = m.G2.affine(m.g2_gen)

    def pack3(pts):
        return tuple(
            tuple(jnp.asarray(Fp.pack_mont([p[i][j] for p in pts]))
                  for j in range(3))
            for i in range(3))

    out = jax.jit(G2d.double)(pack3([g]))
    got = tuple(
        tuple(Fp.unpack_mont(np.asarray(out[i][j]))[0] for j in range(3))
        for i in range(3))
    want = m.G2.double(m.G2.from_affine(g[0], g[1]))
    assert m.G2.eq(got, want)


@pytest.mark.skipif(not SLOW, reason="set WASMSNARK_TPU_SLOW_TESTS=1")
def test_mnt6753_device_group_map_and_pedersen():
    """Batched device groupMap + Pedersen hash vs the oracle (the oracle is
    itself validated bit-exact against the Coda verifier test vectors)."""
    import random
    from wasmsnark_tpu.models.mnt6753 import mnt6753, Q
    from wasmsnark_tpu.models.mnt6753_device import mnt6753_device

    md = mnt6753_device()
    m = md.m
    F = md.fp

    ts = [1, 12345, Q - 7]
    out = jax.jit(md.group_map)(jnp.asarray(F.pack(ts)))
    xs = F.unpack_mont(np.asarray(out[0]))
    ys = F.unpack_mont(np.asarray(out[1]))
    for i, tv in enumerate(ts):
        want = m.group_map(tv)
        assert xs[i] == want[0] and ys[i] == want[1]

    rng = random.Random(4)
    nbits = 4 * 754
    b1 = [rng.randrange(2) for _ in range(nbits)]
    b2 = [rng.randrange(2) for _ in range(nbits)]
    bits = jnp.asarray(np.array([b1, b2], dtype=np.uint32).T)
    got = F.unpack(np.asarray(jax.jit(md.pedersen_hash)(bits)))
    assert got[0] == m.pedersen_hash(b1)
    assert got[1] == m.pedersen_hash(b2)
