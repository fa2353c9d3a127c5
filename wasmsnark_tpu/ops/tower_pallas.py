"""Fused extension-tower and Miller-step Pallas kernels (BN128).

One F12 multiply composed from per-op kernels is ~54 separate Montgomery-mul
dispatches; the XLA graph of a full Miller loop + final exponentiation built
that way takes tens of minutes to compile and is HBM-bound at run time.
These kernels fuse whole tower operations (F12 mul/square) and whole Miller
steps (doubling / mixed-add with line evaluation) into single VMEM programs:
the scan bodies of ops/pairing.py become a handful of kernel calls.

The tower math inside each kernel is built by the *same* composition classes
(towers.F2Device / F3Device) over fp_pallas.ValAdapter — kernel and
composed-op paths share one implementation of the Karatsuba/CH-SQR formulas,
mirroring the reference's single tower codegen reused per prefix.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.spec import FieldSpec
from .fp_pallas import ValAdapter, TILE_B, _expand
from .towers import F2Device, F3Device

# F12 leaf order: ((c00, c01), (c10, c11), (c20, c21)) x 2  -> 12 planes
N12 = 12


def _towers(L, np16, q_limbs, xi):
    """ValAdapter-based F2/F6/F12 towers; xi = (c0, c1) is the small
    sextic non-residue c0 + c1*u (BN128: 9 + u; BLS12-381: 1 + u)."""
    base = ValAdapter(L, np16, q_limbs)
    F2 = F2Device(base, base.neg)
    c0, c1 = xi

    def smul(a, k):
        return base.mul_small(a, k) if k > 1 else a

    def mul_xi(a):
        return (base.sub(smul(a[0], c0), smul(a[1], c1)),
                base.add(smul(a[0], c1), smul(a[1], c0)))

    F6 = F3Device(F2, mul_xi)

    def mul_nr12(a):
        return (mul_xi(a[2]), a[0], a[1])

    F12 = F2Device(F6, mul_nr12)
    return base, F2, F6, F12


def _flatten12(el):
    out = []

    def rec(x):
        if isinstance(x, tuple):
            for c in x:
                rec(c)
        else:
            out.append(x)

    rec(el)
    return out


def _unflatten12(flat):
    i = iter(flat)
    return tuple(
        tuple((next(i), next(i)) for _ in range(3)) for _ in range(2))


def _f12_mul_kernel(L, np16, q_limbs, xi, square, *refs):
    _, _, _, F12 = _towers(L, np16, q_limbs, xi)
    if square:
        a = _unflatten12([r[:] for r in refs[:N12]])
        out = F12.square(a)
        outs = refs[N12:]
    else:
        a = _unflatten12([r[:] for r in refs[:N12]])
        b = _unflatten12([r[:] for r in refs[N12:2 * N12]])
        out = F12.mul(a, b)
        outs = refs[2 * N12:]
    for r, v in zip(outs, _flatten12(out)):
        r[:] = v


def _f12_cyc_sqr_kernel(L, np16, q_limbs, xi, *refs):
    """Granger-Scott cyclotomic square fused into one VMEM program."""
    from .towers import gs_cyclotomic_square
    _, F2, F6, _ = _towers(L, np16, q_limbs, xi)
    a = _unflatten12([r[:] for r in refs[:N12]])
    out = gs_cyclotomic_square(F2, F6.mul_nr, a)
    for r, v in zip(refs[N12:], _flatten12(out)):
        r[:] = v


def _miller_dbl_kernel(L, np16, q_limbs, xi, *refs):
    """In: X,Y,Z (6 planes, F2 homogeneous twist coords), xP, yP (2 planes).
    Out: sparse line (a0, b0, b1 -> 6 planes) + new X,Y,Z (6 planes).

    Formulas validated against the oracle pairing (ops/pairing.py doc)."""
    base, F2, _, _ = _towers(L, np16, q_limbs, xi)
    X = (refs[0][:], refs[1][:])
    Y = (refs[2][:], refs[3][:])
    Z = (refs[4][:], refs[5][:])
    xP = refs[6][:]
    yP = refs[7][:]

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

    outs = refs[8:]
    for r, v in zip(outs, [a0[0], a0[1], b0[0], b0[1], b1[0], b1[1],
                           Xn[0], Xn[1], Yn[0], Yn[1], Zn[0], Zn[1]]):
        r[:] = v


def _miller_add_kernel(L, np16, q_limbs, xi, *refs):
    """In: X,Y,Z (6), x2,y2 (4, F2 affine), xP,yP (2).
    Out: sparse line (6) + new X,Y,Z (6)."""
    base, F2, _, _ = _towers(L, np16, q_limbs, xi)
    X = (refs[0][:], refs[1][:])
    Y = (refs[2][:], refs[3][:])
    Z = (refs[4][:], refs[5][:])
    x2 = (refs[6][:], refs[7][:])
    y2 = (refs[8][:], refs[9][:])
    xP = refs[10][:]
    yP = refs[11][:]

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

    outs = refs[12:]
    for r, v in zip(outs, [a0[0], a0[1], b0[0], b0[1], b1[0], b1[1],
                           Xn[0], Xn[1], Yn[0], Yn[1], Zn[0], Zn[1]]):
        r[:] = v


def _miller_dbl_mtwist_kernel(L, np16, q_limbs, xi, *refs):
    """M-twist (psi divides by w powers: BLS12-381) doubling step.
    Line components land at w^0, v*w, v^2*w with the xi factor on the
    w^0 term: a0 = xi*2YZ^2*yP, b1 = 3X^3 - 2Y^2 Z, b2 = -3X^2 Z xP
    (validated against the oracle pairing)."""
    base, F2, _, _ = _towers(L, np16, q_limbs, xi)
    c0, c1 = xi

    def mul_xi2(a):
        s = lambda v, k: base.mul_small(v, k) if k > 1 else v
        return (base.sub(s(a[0], c0), s(a[1], c1)),
                base.add(s(a[0], c1), s(a[1], c0)))

    X = (refs[0][:], refs[1][:])
    Y = (refs[2][:], refs[3][:])
    Z = (refs[4][:], refs[5][:])
    xP = refs[6][:]
    yP = refs[7][:]

    X2 = F2.square(X); Y2 = F2.square(Y); Z2 = F2.square(Z)
    Y2Z = F2.mul(Y2, Z)
    YZ2 = F2.mul(Y, Z2)
    a0 = F2.mul_base(mul_xi2(F2.add(YZ2, YZ2)), yP)
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

    outs = refs[8:]
    for r, v in zip(outs, [a0[0], a0[1], b1[0], b1[1], b2[0], b2[1],
                           Xn[0], Xn[1], Yn[0], Yn[1], Zn[0], Zn[1]]):
        r[:] = v


def _miller_add_mtwist_kernel(L, np16, q_limbs, xi, *refs):
    """M-twist mixed-add step: a0 = xi*lm*yP, b1 = th*x2 - lm*y2,
    b2 = -th*xP."""
    base, F2, _, _ = _towers(L, np16, q_limbs, xi)
    c0, c1 = xi

    def mul_xi2(a):
        s = lambda v, k: base.mul_small(v, k) if k > 1 else v
        return (base.sub(s(a[0], c0), s(a[1], c1)),
                base.add(s(a[0], c1), s(a[1], c0)))

    X = (refs[0][:], refs[1][:])
    Y = (refs[2][:], refs[3][:])
    Z = (refs[4][:], refs[5][:])
    x2 = (refs[6][:], refs[7][:])
    y2 = (refs[8][:], refs[9][:])
    xP = refs[10][:]
    yP = refs[11][:]

    th = F2.sub(F2.mul(y2, Z), Y)
    lm = F2.sub(F2.mul(x2, Z), X)
    a0 = F2.mul_base(mul_xi2(lm), yP)
    b1 = F2.sub(F2.mul(th, x2), F2.mul(lm, y2))
    b2 = F2.mul_base(F2.neg(th), xP)
    C = F2.square(th); D = F2.square(lm); E = F2.mul(lm, D)
    Fv = F2.mul(Z, C); G = F2.mul(X, D)
    H = F2.sub(F2.sub(Fv, F2.mul_small(G, 2)), E)
    Xn = F2.mul(lm, H)
    Yn = F2.sub(F2.mul(th, F2.sub(G, H)), F2.mul(E, Y))
    Zn = F2.mul(Z, E)

    outs = refs[12:]
    for r, v in zip(outs, [a0[0], a0[1], b1[0], b1[1], b2[0], b2[1],
                           Xn[0], Xn[1], Yn[0], Yn[1], Zn[0], Zn[1]]):
        r[:] = v


# kernels are heavy; narrow lane tile keeps VMEM in budget
TOWER_TILE_B = 1024


@functools.lru_cache(maxsize=None)
def _tower_call(spec: FieldSpec, kind: str, xi: tuple = (9, 1)):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = spec.n_limbs
    if kind == "f12mul":
        kern = functools.partial(_f12_mul_kernel, L, spec.np16, spec.q_limbs,
                                 xi, False)
        n_in, n_out = 24, 12
    elif kind == "f12sqr":
        kern = functools.partial(_f12_mul_kernel, L, spec.np16, spec.q_limbs,
                                 xi, True)
        n_in, n_out = 12, 12
    elif kind == "f12cyc":
        kern = functools.partial(_f12_cyc_sqr_kernel, L, spec.np16,
                                 spec.q_limbs, xi)
        n_in, n_out = 12, 12
    elif kind == "mdbl":
        kern = functools.partial(_miller_dbl_kernel, L, spec.np16,
                                 spec.q_limbs, xi)
        n_in, n_out = 8, 12
    elif kind == "madd":
        kern = functools.partial(_miller_add_kernel, L, spec.np16,
                                 spec.q_limbs, xi)
        n_in, n_out = 12, 12
    elif kind == "mdbl_m":
        kern = functools.partial(_miller_dbl_mtwist_kernel, L, spec.np16,
                                 spec.q_limbs, xi)
        n_in, n_out = 8, 12
    elif kind == "madd_m":
        kern = functools.partial(_miller_add_mtwist_kernel, L, spec.np16,
                                 spec.q_limbs, xi)
        n_in, n_out = 12, 12
    else:  # pragma: no cover
        raise ValueError(kind)

    def run(*arrs):
        B8 = arrs[0].shape[2]
        t8 = TOWER_TILE_B // 8
        grid = (B8 // t8,) if B8 >= t8 else (1,)
        tile = t8 if B8 >= t8 else B8
        spec_ = pl.BlockSpec((L, 8, tile), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[spec_] * n_in,
            out_specs=(spec_,) * n_out,
            out_shape=tuple(
                jax.ShapeDtypeStruct((L, 8, B8), jnp.uint32)
                for _ in range(n_out)),
        )(*arrs)

    # inline jit: the traced jaxpr is cached by (fun, avals) across call
    # sites, so composite programs (MSM scans, fixed-base ladders, provers)
    # stop re-tracing this kernel body at every use — measured 0.47 s per
    # mont-mul TRACE without it, ~0 with (the groth16 setup spent 300+ s
    # of its 800 s wall purely re-tracing Pallas kernels).  inline=True
    # splices the jaxpr into the caller: no call boundary in the lowered
    # HLO, XLA fusion unaffected.
    return jax.jit(run, inline=True)


def _dispatch(spec: FieldSpec, kind: str, arrays, xi=(9, 1)):
    """arrays: flat list of [L, *B] planes (same bshape)."""
    L = spec.n_limbs
    bshape = jnp.broadcast_shapes(*[a.shape[1:] for a in arrays])
    B = int(np.prod(bshape)) if bshape else 1
    step = TOWER_TILE_B if B >= TOWER_TILE_B else 1024
    pad = (-B) % step
    flat = []
    for c in arrays:
        c = _expand(c, L, bshape).reshape(L, B)
        if pad:
            c = jnp.pad(c, ((0, 0), (0, pad)))
        flat.append(c.reshape(L, 8, (B + pad) // 8))
    outs = _tower_call(spec, kind, tuple(xi))(*flat)
    res = []
    for o in outs:
        o = o.reshape(L, B + pad)
        if pad:
            o = o[:, :B]
        res.append(o.reshape((L,) + bshape))
    return res


def f12_mul_pallas(spec, a, b, xi=(9, 1)):
    out = _dispatch(spec, "f12mul", _flatten12(a) + _flatten12(b), xi)
    return _unflatten12(out)


def f12_sqr_pallas(spec, a, xi=(9, 1)):
    return _unflatten12(_dispatch(spec, "f12sqr", _flatten12(a), xi))


def f12_cyc_sqr_pallas(spec, a, xi=(9, 1)):
    return _unflatten12(_dispatch(spec, "f12cyc", _flatten12(a), xi))


def miller_dbl_pallas(spec, X, Y, Z, xP, yP, xi=(9, 1), mtwist=False):
    out = _dispatch(spec, "mdbl_m" if mtwist else "mdbl",
                    [X[0], X[1], Y[0], Y[1], Z[0], Z[1], xP, yP], xi)
    a0, b0, b1 = (out[0], out[1]), (out[2], out[3]), (out[4], out[5])
    Xn, Yn, Zn = (out[6], out[7]), (out[8], out[9]), (out[10], out[11])
    return (a0, b0, b1), Xn, Yn, Zn


def miller_add_pallas(spec, X, Y, Z, x2, y2, xP, yP, xi=(9, 1), mtwist=False):
    out = _dispatch(spec, "madd_m" if mtwist else "madd",
                    [X[0], X[1], Y[0], Y[1], Z[0], Z[1],
                     x2[0], x2[1], y2[0], y2[1], xP, yP], xi)
    a0, b0, b1 = (out[0], out[1]), (out[2], out[3]), (out[4], out[5])
    Xn, Yn, Zn = (out[6], out[7]), (out[8], out[9]), (out[10], out[11])
    return (a0, b0, b1), Xn, Yn, Zn


# ---------------------------------------------------------------------------
# MNT6753: F3/F6 tower + Miller-step kernels (48-limb field, F6 = F3[w])
# ---------------------------------------------------------------------------

def _mnt_towers(L, np16, q_limbs, nr=11):
    base = ValAdapter(L, np16, q_limbs)
    F3 = F3Device(base, lambda a: base.mul_small(a, nr))
    def mulv(a):  # * v: (a0, a1, a2) -> (nr*a2, a0, a1)
        return (base.mul_small(a[2], nr), a[0], a[1])
    F6 = F2Device(F3, mulv)
    return base, F3, F6, mulv


def mnt_dbl_formula(base, F3, mulv, X, Y, Z, xP, yP, a_small=11):
    """Shared doubling-step formulas (kernel and composed paths):
    line a0 = 2YZ^2*yP * v^2 ; b = W X - 2Y^2 Z - W Z xP v, W = 3X^2 + a2 Z^2
    with a2 = a_small * v^2; update = homogeneous doubling with a != 0.
    Validated against the oracle pairing (reduced ate equality)."""
    def scal(a, s):
        return tuple(base.mul(c, s) for c in a)
    X2 = F3.mul(X, X); Z2 = F3.mul(Z, Z); Y2 = F3.mul(Y, Y)
    a2Z2 = F3.mul_small(mulv(mulv(Z2)), a_small)
    W = F3.add(F3.mul_small(X2, 3), a2Z2)
    YZ = F3.mul(Y, Z)
    Y2Z = F3.mul(Y2, Z)
    YZ2 = F3.mul(Y, Z2)
    a0 = mulv(mulv(scal(F3.mul_small(YZ2, 2), yP)))
    b = F3.sub(F3.mul(W, X),
               F3.add(F3.mul_small(Y2Z, 2), mulv(scal(F3.mul(W, Z), xP))))
    W2 = F3.mul(W, W)
    XY2Z = F3.mul(X, Y2Z)
    Xn = F3.mul(F3.mul_small(YZ, 2), F3.sub(W2, F3.mul_small(XY2Z, 8)))
    Yn = F3.sub(F3.mul(W, F3.sub(F3.mul_small(XY2Z, 12), W2)),
                F3.mul_small(F3.mul(F3.mul(Y2, Y2), Z2), 8))
    Zn = F3.mul_small(F3.mul(F3.mul(Y2, Y), F3.mul(Z2, Z)), 8)
    return (a0, b), Xn, Yn, Zn


def mnt_add_formula(base, F3, mulv, X, Y, Z, x2, y2, xP, yP):
    """Shared mixed-add-step formulas: line a0 = lm*yP*v^2 ;
    b = th*x2 - y2*lm - th*xP*v."""
    def scal(a, s):
        return tuple(base.mul(c, s) for c in a)
    th = F3.sub(F3.mul(y2, Z), Y)
    lm = F3.sub(F3.mul(x2, Z), X)
    a0 = mulv(mulv(scal(lm, yP)))
    b = F3.sub(F3.mul(th, x2), F3.add(F3.mul(y2, lm), mulv(scal(th, xP))))
    C = F3.mul(th, th); D = F3.mul(lm, lm); E = F3.mul(lm, D)
    Fv = F3.mul(Z, C); G = F3.mul(X, D)
    H = F3.sub(F3.sub(Fv, F3.mul_small(G, 2)), E)
    Xn = F3.mul(lm, H)
    Yn = F3.sub(F3.mul(th, F3.sub(G, H)), F3.mul(E, Y))
    Zn = F3.mul(Z, E)
    return (a0, b), Xn, Yn, Zn


def _f6_mul_kernel(L, np16, q_limbs, square, *refs):
    _, _, F6, _ = _mnt_towers(L, np16, q_limbs)
    def un6(flat):
        return ((flat[0], flat[1], flat[2]), (flat[3], flat[4], flat[5]))
    if square:
        a = un6([r[:] for r in refs[:6]])
        out = F6.square(a)
        outs = refs[6:]
    else:
        a = un6([r[:] for r in refs[:6]])
        b = un6([r[:] for r in refs[6:12]])
        out = F6.mul(a, b)
        outs = refs[12:]
    flat = [*out[0], *out[1]]
    for r, v in zip(outs, flat):
        r[:] = v


def _mnt_f6_cyc_kernel(L, np16, q_limbs, *refs):
    from .towers import gs_cyclotomic_square
    base, _, _, _ = _mnt_towers(L, np16, q_limbs)
    a = ((refs[0][:], refs[1][:], refs[2][:]),
         (refs[3][:], refs[4][:], refs[5][:]))
    out = gs_cyclotomic_square(base, lambda x: base.mul_small(x, 11), a)
    for r, v in zip(refs[6:], [*out[0], *out[1]]):
        r[:] = v


def _mnt_mdbl_kernel(L, np16, q_limbs, *refs):
    base, F3, F6, mulv = _mnt_towers(L, np16, q_limbs)
    X = tuple(refs[i][:] for i in range(3))
    Y = tuple(refs[i][:] for i in range(3, 6))
    Z = tuple(refs[i][:] for i in range(6, 9))
    xP = refs[9][:]
    yP = refs[10][:]
    (a0, b), Xn, Yn, Zn = mnt_dbl_formula(base, F3, mulv, X, Y, Z, xP, yP)
    for r, v in zip(refs[11:], [*a0, *b, *Xn, *Yn, *Zn]):
        r[:] = v


def _mnt_madd_kernel(L, np16, q_limbs, *refs):
    base, F3, F6, mulv = _mnt_towers(L, np16, q_limbs)
    X = tuple(refs[i][:] for i in range(3))
    Y = tuple(refs[i][:] for i in range(3, 6))
    Z = tuple(refs[i][:] for i in range(6, 9))
    x2 = tuple(refs[i][:] for i in range(9, 12))
    y2 = tuple(refs[i][:] for i in range(12, 15))
    xP = refs[15][:]
    yP = refs[16][:]
    (a0, b), Xn, Yn, Zn = mnt_add_formula(
        base, F3, mulv, X, Y, Z, x2, y2, xP, yP)
    for r, v in zip(refs[17:], [*a0, *b, *Xn, *Yn, *Zn]):
        r[:] = v


@functools.lru_cache(maxsize=None)
def _mnt_call(spec: FieldSpec, kind: str):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = spec.n_limbs
    if kind == "f6mul":
        kern = functools.partial(_f6_mul_kernel, L, spec.np16, spec.q_limbs,
                                 False)
        n_in, n_out = 12, 6
    elif kind == "f6sqr":
        kern = functools.partial(_f6_mul_kernel, L, spec.np16, spec.q_limbs,
                                 True)
        n_in, n_out = 6, 6
    elif kind == "f6cyc":
        kern = functools.partial(_mnt_f6_cyc_kernel, L, spec.np16,
                                 spec.q_limbs)
        n_in, n_out = 6, 6
    elif kind == "mdbl":
        kern = functools.partial(_mnt_mdbl_kernel, L, spec.np16, spec.q_limbs)
        n_in, n_out = 11, 15
    elif kind == "madd":
        kern = functools.partial(_mnt_madd_kernel, L, spec.np16, spec.q_limbs)
        n_in, n_out = 17, 15
    else:  # pragma: no cover
        raise ValueError(kind)

    def run(*arrs):
        B8 = arrs[0].shape[2]
        t8 = TOWER_TILE_B // 8
        grid = (B8 // t8,) if B8 >= t8 else (1,)
        tile = t8 if B8 >= t8 else B8
        spec_ = pl.BlockSpec((L, 8, tile), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[spec_] * n_in,
            out_specs=(spec_,) * n_out,
            out_shape=tuple(
                jax.ShapeDtypeStruct((L, 8, B8), jnp.uint32)
                for _ in range(n_out)),
        )(*arrs)

    # inline jit: the traced jaxpr is cached by (fun, avals) across call
    # sites, so composite programs (MSM scans, fixed-base ladders, provers)
    # stop re-tracing this kernel body at every use — measured 0.47 s per
    # mont-mul TRACE without it, ~0 with (the groth16 setup spent 300+ s
    # of its 800 s wall purely re-tracing Pallas kernels).  inline=True
    # splices the jaxpr into the caller: no call boundary in the lowered
    # HLO, XLA fusion unaffected.
    return jax.jit(run, inline=True)


def _flat6(el):
    return [*el[0], *el[1]]


def _un6(flat):
    return ((flat[0], flat[1], flat[2]), (flat[3], flat[4], flat[5]))


def mnt_f6_mul_pallas(spec, a, b):
    return _un6(_dispatch_named(spec, "f6mul", _flat6(a) + _flat6(b)))


def mnt_f6_sqr_pallas(spec, a):
    return _un6(_dispatch_named(spec, "f6sqr", _flat6(a)))


def mnt_f6_cyc_sqr_pallas(spec, a):
    return _un6(_dispatch_named(spec, "f6cyc", _flat6(a)))


def mnt_miller_dbl_pallas(spec, X, Y, Z, xP, yP):
    out = _dispatch_named(spec, "mdbl", [*X, *Y, *Z, xP, yP])
    return ((tuple(out[0:3]), tuple(out[3:6])),
            tuple(out[6:9]), tuple(out[9:12]), tuple(out[12:15]))


def mnt_miller_add_pallas(spec, X, Y, Z, x2, y2, xP, yP):
    out = _dispatch_named(spec, "madd", [*X, *Y, *Z, *x2, *y2, xP, yP])
    return ((tuple(out[0:3]), tuple(out[3:6])),
            tuple(out[6:9]), tuple(out[9:12]), tuple(out[12:15]))


def _dispatch_named(spec: FieldSpec, kind: str, arrays):
    L = spec.n_limbs
    bshape = jnp.broadcast_shapes(*[a.shape[1:] for a in arrays])
    B = int(np.prod(bshape)) if bshape else 1
    step = TOWER_TILE_B if B >= TOWER_TILE_B else 1024
    pad = (-B) % step
    flat = []
    for c in arrays:
        c = _expand(c, L, bshape).reshape(L, B)
        if pad:
            c = jnp.pad(c, ((0, 0), (0, pad)))
        flat.append(c.reshape(L, 8, (B + pad) // 8))
    outs = _mnt_call(spec, kind)(*flat)
    res = []
    for o in outs:
        o = o.reshape(L, B + pad)
        if pad:
            o = o[:, :B]
        res.append(o.reshape((L,) + bshape))
    return res
