"""Fused complete Jacobian add/double Pallas kernels (G1 over Fp).

Why: a complete curve add is ~31 Montgomery muls plus ~40 add/subs.  Composed
from per-op kernels, every intermediate round-trips HBM (~12 KB moved per
point-add); fused, traffic is exactly the 6-in/3-out coordinates (~0.6 KB) —
a ~20x HBM reduction on the MSM's dominant op (the segmented-scan combines
and bucket folds of ops/msm.py).

Semantics are identical to JacobianDevice.add/double (ops/curve.py): the
branch-free complete group law — generic add-2007-bl result, dbl-2009-l
result, and all degeneracies (zero operands, P == Q, P == -Q) resolved with
masked selects per lane, mirroring the branches of
build_curve_jacobian_a0.js:280-385 as predication.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.spec import FieldSpec
from .fp_pallas import (
    TILE_B, mm_vals, add_vals, sub_vals, is_zero_vals, _expand)


def _dbl_vals(L, np16, q, one_mont, X, Y, Z):
    """dbl-2009-l on in-register values; valid (returns Z3=0) for Z=0."""
    mm = lambda a, b: mm_vals(L, np16, q, a, b)
    add = lambda a, b: add_vals(L, q, a, b)
    sub = lambda a, b: sub_vals(L, q, a, b)
    A = mm(X, X)
    B = mm(Y, Y)
    C = mm(B, B)
    xb = add(X, B)
    t = mm(xb, xb)
    D = sub(sub(t, A), C)
    D = add(D, D)
    E = add(add(A, A), A)
    G = mm(E, E)
    X3 = sub(G, add(D, D))
    eight_c = add(C, C)
    eight_c = add(eight_c, eight_c)
    eight_c = add(eight_c, eight_c)
    Y3 = sub(mm(E, sub(D, X3)), eight_c)
    YZ = mm(Y, Z)
    Z3 = add(YZ, YZ)
    return X3, Y3, Z3


def _jac_add_kernel(L: int, np16: int, q: tuple, one_mont: tuple,
                    x1_ref, y1_ref, z1_ref, x2_ref, y2_ref, z2_ref,
                    ox_ref, oy_ref, oz_ref):
    mm = lambda a, b: mm_vals(L, np16, q, a, b)
    add = lambda a, b: add_vals(L, q, a, b)
    sub = lambda a, b: sub_vals(L, q, a, b)

    X1, Y1, Z1 = x1_ref[:], y1_ref[:], z1_ref[:]
    X2, Y2, Z2 = x2_ref[:], y2_ref[:], z2_ref[:]

    Z1Z1 = mm(Z1, Z1)
    Z2Z2 = mm(Z2, Z2)
    U1 = mm(X1, Z2Z2)
    U2 = mm(X2, Z1Z1)
    S1 = mm(Y1, mm(Z2, Z2Z2))
    S2 = mm(Y2, mm(Z1, Z1Z1))
    H = sub(U2, U1)
    r = sub(S2, S1)
    r = add(r, r)
    HH = add(H, H)
    I = mm(HH, HH)
    J = mm(H, I)
    V = mm(U1, I)
    X3 = sub(sub(mm(r, r), J), add(V, V))
    S1J = mm(S1, J)
    Y3 = sub(mm(r, sub(V, X3)), add(S1J, S1J))
    z12 = add(Z1, Z2)
    Z3 = mm(sub(sub(mm(z12, z12), Z1Z1), Z2Z2), H)

    dX, dY, dZ = _dbl_vals(L, np16, q, one_mont, X1, Y1, Z1)

    p_zero = is_zero_vals(Z1)[None]          # (1, 8, T8)
    q_zero = is_zero_vals(Z2)[None]
    h_zero = is_zero_vals(H)[None]
    r_zero = is_zero_vals(r)[None]

    one = jnp.stack(
        [jnp.full_like(X1[0], one_mont[k]) for k in range(L)], axis=0)
    zero = jnp.zeros_like(X1)

    same = h_zero & r_zero                   # P == Q -> double
    inv = h_zero & ~r_zero                   # P == -Q -> zero point

    ox = jnp.where(same, dX, X3)
    oy = jnp.where(same, dY, Y3)
    oz = jnp.where(same, dZ, Z3)
    ox = jnp.where(inv, zero, ox)
    oy = jnp.where(inv, one, oy)
    oz = jnp.where(inv, zero, oz)
    ox = jnp.where(q_zero, X1, ox)
    oy = jnp.where(q_zero, Y1, oy)
    oz = jnp.where(q_zero, Z1, oz)
    ox = jnp.where(p_zero, X2, ox)
    oy = jnp.where(p_zero, Y2, oy)
    oz = jnp.where(p_zero, Z2, oz)

    ox_ref[:] = ox
    oy_ref[:] = oy
    oz_ref[:] = oz


def _jac_madd_kernel(L: int, np16: int, q: tuple, one_mont: tuple,
                     x1_ref, y1_ref, z1_ref, x2_ref, y2_ref,
                     ox_ref, oy_ref, oz_ref):
    """Complete mixed add: (X1,Y1,Z1) Jacobian + (X2,Y2) affine
    (madd-2007-bl specialization, Z2 = 1; affine zero = (0,0)).
    11 Montgomery muls on the generic path vs the full add's 16."""
    mm = lambda a, b: mm_vals(L, np16, q, a, b)
    add = lambda a, b: add_vals(L, q, a, b)
    sub = lambda a, b: sub_vals(L, q, a, b)

    X1, Y1, Z1 = x1_ref[:], y1_ref[:], z1_ref[:]
    X2, Y2 = x2_ref[:], y2_ref[:]

    Z1Z1 = mm(Z1, Z1)
    U2 = mm(X2, Z1Z1)
    S2 = mm(Y2, mm(Z1, Z1Z1))
    H = sub(U2, X1)
    r = sub(S2, Y1)
    r = add(r, r)
    HH = add(H, H)
    I = mm(HH, HH)
    J = mm(H, I)
    V = mm(X1, I)
    X3 = sub(sub(mm(r, r), J), add(V, V))
    S1J = mm(Y1, J)
    Y3 = sub(mm(r, sub(V, X3)), add(S1J, S1J))
    Z3 = mm(add(Z1, Z1), H)

    dX, dY, dZ = _dbl_vals(L, np16, q, one_mont, X1, Y1, Z1)

    p_zero = is_zero_vals(Z1)[None]
    q_zero = (is_zero_vals(X2) & is_zero_vals(Y2))[None]
    h_zero = is_zero_vals(H)[None]
    r_zero = is_zero_vals(r)[None]

    one = jnp.stack(
        [jnp.full_like(X1[0], one_mont[k]) for k in range(L)], axis=0)
    zero = jnp.zeros_like(X1)

    same = h_zero & r_zero
    inv = h_zero & ~r_zero

    ox = jnp.where(same, dX, X3)
    oy = jnp.where(same, dY, Y3)
    oz = jnp.where(same, dZ, Z3)
    ox = jnp.where(inv, zero, ox)
    oy = jnp.where(inv, one, oy)
    oz = jnp.where(inv, zero, oz)
    ox = jnp.where(q_zero, X1, ox)
    oy = jnp.where(q_zero, Y1, oy)
    oz = jnp.where(q_zero, Z1, oz)
    # p == 0 -> promote(q): (X2, Y2, 1), and (0, 1, 0) when q is zero too
    ox = jnp.where(p_zero, X2, ox)
    oy = jnp.where(p_zero, jnp.where(q_zero, one, Y2), oy)
    oz = jnp.where(p_zero, jnp.where(q_zero, zero, one), oz)

    ox_ref[:] = ox
    oy_ref[:] = oy
    oz_ref[:] = oz


def _jac_dbl_kernel(L: int, np16: int, q: tuple, one_mont: tuple,
                    x_ref, y_ref, z_ref, ox_ref, oy_ref, oz_ref):
    X, Y, Z = x_ref[:], y_ref[:], z_ref[:]
    dX, dY, dZ = _dbl_vals(L, np16, q, one_mont, X, Y, Z)
    zero_mask = is_zero_vals(Z)[None]
    ox_ref[:] = jnp.where(zero_mask, X, dX)
    oy_ref[:] = jnp.where(zero_mask, Y, dY)
    oz_ref[:] = jnp.where(zero_mask, Z, dZ)


# Fused kernels have ~6x the VMEM working set of a single mul; use a
# narrower lane tile so spills stay off (t8 = TILE/8 must stay a multiple
# of the 128-lane register width).
CURVE_TILE_B = 1024


@functools.lru_cache(maxsize=None)
def _curve_call(spec: FieldSpec, kind: str):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = spec.n_limbs
    one_mont = tuple(spec.limbs(spec.one_mont))
    if kind == "add":
        kern = functools.partial(
            _jac_add_kernel, L, spec.np16, spec.q_limbs, one_mont)
        n_in = 6
    elif kind == "madd":
        kern = functools.partial(
            _jac_madd_kernel, L, spec.np16, spec.q_limbs, one_mont)
        n_in = 5
    else:
        kern = functools.partial(
            _jac_dbl_kernel, L, spec.np16, spec.q_limbs, one_mont)
        n_in = 3

    def run(*arrs):
        B8 = arrs[0].shape[2]
        t8 = CURVE_TILE_B // 8
        grid = (B8 // t8,) if B8 >= t8 else (1,)
        tile = t8 if B8 >= t8 else B8
        spec_ = pl.BlockSpec((L, 8, tile), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[spec_] * n_in,
            out_specs=(spec_,) * 3,
            out_shape=tuple(
                jax.ShapeDtypeStruct((L, 8, B8), jnp.uint32)
                for _ in range(3)),
        )(*arrs)
        return out

    # inline jit: the traced jaxpr is cached by (fun, avals) across call
    # sites, so composite programs (MSM scans, fixed-base ladders, provers)
    # stop re-tracing this kernel body at every use — measured 0.47 s per
    # mont-mul TRACE without it, ~0 with (the groth16 setup spent 300+ s
    # of its 800 s wall purely re-tracing Pallas kernels).  inline=True
    # splices the jaxpr into the caller: no call boundary in the lowered
    # HLO, XLA fusion unaffected.
    return jax.jit(run, inline=True)


def _dispatch(spec: FieldSpec, kind: str, coords):
    """coords: list of [L, *B] arrays (same bshape). Returns 3 arrays."""
    L = spec.n_limbs
    bshape = jnp.broadcast_shapes(*[c.shape[1:] for c in coords])
    B = int(np.prod(bshape)) if bshape else 1
    step = CURVE_TILE_B if B >= CURVE_TILE_B else 1024
    pad = (-B) % step
    flat = []
    for c in coords:
        c = _expand(c, L, bshape).reshape(L, B)
        if pad:
            c = jnp.pad(c, ((0, 0), (0, pad)))
        flat.append(c.reshape(L, 8, (B + pad) // 8))
    outs = _curve_call(spec, kind)(*flat)
    res = []
    for o in outs:
        o = o.reshape(L, B + pad)
        if pad:
            o = o[:, :B]
        res.append(o.reshape((L,) + bshape))
    return tuple(res)


def jac_add_pallas(spec: FieldSpec, p, q):
    """Complete Jacobian add on (X, Y, Z) limb-plane triples."""
    bshape = jnp.broadcast_shapes(*[c.shape[1:] for c in (*p, *q)])
    coords = [_expand(c, spec.n_limbs, bshape) for c in (*p, *q)]
    return _dispatch(spec, "add", coords)


def jac_madd_pallas(spec: FieldSpec, p, q):
    """Complete mixed add: p = (X, Y, Z) Jacobian, q = (X, Y) affine."""
    coords_in = (*p, *q)
    bshape = jnp.broadcast_shapes(*[c.shape[1:] for c in coords_in])
    coords = [_expand(c, spec.n_limbs, bshape) for c in coords_in]
    return _dispatch(spec, "madd", coords)


def jac_double_pallas(spec: FieldSpec, p):
    bshape = jnp.broadcast_shapes(*[c.shape[1:] for c in p])
    coords = [_expand(c, spec.n_limbs, bshape) for c in p]
    return _dispatch(spec, "dbl", coords)
