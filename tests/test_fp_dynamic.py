"""Dynamic-scalar device ops vs oracle: per-lane exponentiation, batched
double-and-add scalar multiplication, Tonelli sqrt / Euler is_square
(f1m_exp / timesScalar / f1m_sqrt / f1m_isSquare parity) — on small fields
so CPU compiles stay cheap; the same code paths serve the production
254/381/753-bit specs."""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wasmsnark_tpu.fields.spec import FieldSpec
from wasmsnark_tpu.fields.oracle import Fp as OracleFp
from wasmsnark_tpu.curves.oracle import JacobianCurve
from wasmsnark_tpu.ops.fp import FpDevice, FpSqrt, FpDynamic, times_scalar_device
from wasmsnark_tpu.ops.towers import FpAdapter
from wasmsnark_tpu.ops.curve import JacobianDevice
from wasmsnark_tpu.utils.serialize import ints_to_limbs

P61 = (1 << 61) - 1
P97 = 97  # 2-adicity 5: exercises multi-round Tonelli


def test_sqrt_is_square_high_2adicity():
    rng = random.Random(1)
    for q in (P97, P61):
        spec = FieldSpec(q)
        F = FpDevice(spec)
        S = FpSqrt(F)
        vals = [0, 1, 4, q - 1] + [rng.randrange(q) for _ in range(12)]
        x = jnp.asarray(F.pack_mont(vals))
        is_sq = np.asarray(jax.jit(S.is_square)(x))
        roots = F.unpack_mont(np.asarray(jax.jit(S.sqrt)(x)))
        for v, msk, r in zip(vals, is_sq, roots):
            assert bool(msk) == spec.is_square(v)
            if spec.is_square(v):
                assert r == spec.sqrt(v)
                assert r == 0 or (r & 1) == 0  # even-canonical sign


def test_dynamic_exp_per_lane():
    spec = FieldSpec(P61)
    F = FpDevice(spec)
    dyn = FpDynamic(F)
    rng = random.Random(2)
    xs = [rng.randrange(spec.q) for _ in range(6)]
    es = [rng.randrange(1 << 40) for _ in range(4)] + [0, 1]
    x = jnp.asarray(F.pack_mont(xs))
    e = jnp.asarray(ints_to_limbs(es, 3))
    got = F.unpack_mont(np.asarray(jax.jit(
        lambda a, b: dyn.exp(a, b, 48))(x, e)))
    assert all(g == pow(v, ee, spec.q) for g, v, ee in zip(got, xs, es))


def test_times_scalar_device_per_lane():
    spec = FieldSpec(P61)
    F = FpDevice(spec)
    OF = OracleFp(spec)
    oc = JacobianCurve(OF)
    # toy a=0 curve y^2 = x^3 + 7
    x0 = next(c for c in range(2, 100)
              if spec.is_square((c ** 3 + 7) % spec.q))
    gen = oc.from_affine(x0, spec.sqrt((x0 ** 3 + 7) % spec.q))
    G = JacobianDevice(FpAdapter(F))
    pts = [gen, oc.times_scalar(gen, 5), oc.zero()]
    scl = [12345, 999, 777]
    P = tuple(jnp.asarray(F.pack_mont([p[i] for p in pts])) for i in range(3))
    sc = jnp.asarray(ints_to_limbs(scl, 2))
    out = jax.jit(lambda p, s: times_scalar_device(G, p, s, 32))(P, sc)
    xs_, ys_, zs_ = (F.unpack_mont(np.asarray(c)) for c in out)
    for i in range(3):
        want = oc.times_scalar(pts[i], scl[i])
        if oc.is_zero(want):
            assert zs_[i] == 0
        else:
            assert oc.eq((xs_[i], ys_[i], zs_[i]), want)


def test_times_scalar_signed_device_matches_oracle():
    """Signed-window ladder (build_timesscalarnaf.js parity) vs the plain
    oracle ladder, incl. zero point / zero scalar / max-window digits."""
    from wasmsnark_tpu.ops.msm import times_scalar_signed_device
    spec = FieldSpec(P61)
    F = FpDevice(spec)
    OF = OracleFp(spec)
    oc = JacobianCurve(OF)
    x0 = next(c for c in range(2, 100)
              if spec.is_square((c ** 3 + 7) % spec.q))
    gen = oc.from_affine(x0, spec.sqrt((x0 ** 3 + 7) % spec.q))
    G = JacobianDevice(FpAdapter(F))
    pts = [gen, oc.times_scalar(gen, 3), oc.zero(), gen]
    scl = [0xFFFF8001, 999, 777, 0]
    P = tuple(jnp.asarray(F.pack_mont([p[i] for p in pts])) for i in range(3))
    sc = jnp.asarray(ints_to_limbs(scl, 2))
    out = jax.jit(lambda p, s: times_scalar_signed_device(G, p, s, 4))(P, sc)
    xs_, ys_, zs_ = (F.unpack_mont(np.asarray(c)) for c in out)
    for i in range(4):
        want = oc.times_scalar(pts[i], scl[i])
        if oc.is_zero(want):
            assert zs_[i] == 0
        else:
            assert oc.eq((xs_[i], ys_[i], zs_[i]), want)
