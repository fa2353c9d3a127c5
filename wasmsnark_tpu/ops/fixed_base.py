"""Batched fixed-base scalar multiplication + batch affine normalization.

The trusted setup must produce millions of [k_i]G points (pkey point arrays,
tools/buildpkey.js sections).  The reference generates its keys offline with
snarkjs; here the setup itself is a first-class device program so 2^20-scale
keys materialize in seconds:

  * a small host-precomputed window table T[w][d] = d * 2^(c*w) * G
    (c = 8 -> 256-entry tables, one per 8-bit window) is shipped to device
    once per base point;
  * each output point is the sum over windows of one gathered table entry —
    a lax.scan of complete mixed adds at full batch width (~31 adds per
    point at 256-bit scalars, all lanes in parallel);
  * results are normalized to affine Montgomery planes with ONE batched
    Fermat inversion pass (Z^(q-2) over all lanes), the storage form of the
    pkey format and the MSM's input form.

Tower-generic: the same class serves G1 (Fp) and G2 (Fp2) through the field
adapters, exactly as every other curve kernel here.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .curve import map_leaf
from ..fields.spec import LIMB_BITS


class FixedBase:
    """curve_dev: JacobianDevice (or any complete-group-law device with
    madd/promote).  oracle_curve/generator: host bigint group + base point
    used to precompute the window table.  pack_comp: function mapping a list
    of canonical base-field coordinates to Montgomery limb planes — for
    towers, applied per component."""

    def __init__(self, curve_dev, oracle_curve, generator, pack_comp,
                 scalar_bits: int, window_bits: int = 8):
        self.curve = curve_dev
        self.c = window_bits
        self.W = (scalar_bits + window_bits - 1) // window_bits
        C = oracle_curve
        # T[w][d] = d * 2^(c*w) * G, affine canonical (zero -> None)
        base = generator
        table = []
        for w in range(self.W):
            row, acc = [C.zero()], C.zero()
            for _ in range((1 << window_bits) - 1):
                acc = C.add(acc, base)
                row.append(acc)
            table.append(row)
            for _ in range(window_bits):
                base = C.double(base)
        # affine coords, zeros encoded (0, 0)
        def aff(p):
            if C.is_zero(p):
                return None
            return C.affine(p)

        flat = [aff(p) for row in table for p in row]
        zero_xy = self._zero_coords(flat)
        xs = [p[0] if p else zero_xy for p in flat]
        ys = [p[1] if p else zero_xy for p in flat]
        D = 1 << window_bits
        # pack per tower component -> leaves [L, W, D]
        self.tx = map_leaf(self._transpose(xs),
                           lambda vs: pack_comp(vs).reshape(-1, self.W, D))
        self.ty = map_leaf(self._transpose(ys),
                           lambda vs: pack_comp(vs).reshape(-1, self.W, D))

    @staticmethod
    def _zero_coords(flat):
        """A zero element with the same tower structure as the coords."""
        for p in flat:
            if p is not None:
                x = p[0]
                return map_leaf(x, lambda _: 0) if isinstance(x, tuple) else 0
        return 0

    @staticmethod
    def _transpose(vals):
        """list of (possibly nested-tuple) coords -> same nesting of lists."""
        if isinstance(vals[0], tuple):
            return tuple(FixedBase._transpose([v[i] for v in vals])
                         for i in range(len(vals[0])))
        return list(vals)

    def _digits(self, scalar_limbs):
        c = self.c
        per = LIMB_BITS // c if c <= LIMB_BITS else 1
        assert LIMB_BITS % c == 0, "window must divide the limb width"
        rows = []
        mask = jnp.uint32((1 << c) - 1)
        for w in range(self.W):
            li, sub = w // per, w % per
            if li < scalar_limbs.shape[0]:
                rows.append((scalar_limbs[li] >> (c * sub)) & mask)
            else:
                rows.append(jnp.zeros_like(scalar_limbs[0]))
        return jnp.stack(rows, axis=0)  # [W, N]

    def points_jac(self, scalar_limbs):
        """scalar_limbs: [Ls, N] canonical 16-bit planes.  Returns Jacobian
        points, leaves [L, N] (Montgomery)."""
        C = self.curve
        d = self._digits(jnp.asarray(scalar_limbs, jnp.uint32))  # [W, N]
        W = self.W
        D = 1 << self.c
        flat_idx = (jnp.arange(W, dtype=jnp.int32)[:, None] * D
                    + d.astype(jnp.int32)).reshape(-1)           # [W*N]

        def gather(tab):
            # tab leaf [L, W, D] -> rows [W*D, L]; one flat row gather ->
            # [W, N, L] -> [W, L, N] (scan axis leading).  Row-major gathers
            # are ~50x faster than minor-axis lane gathers on TPU
            # (tools/gather_micro.py; same layout trick as ops/msm.py).
            def g(a):
                L = a.shape[0]
                rows = a.reshape(L, W * D).T                     # [W*D, L]
                out = jnp.take(rows, flat_idx, axis=0)           # [W*N, L]
                return jnp.moveaxis(out.reshape(W, d.shape[1], L), -1, 1)
            return map_leaf(tab, g)

        gx, gy = gather(self.tx), gather(self.ty)

        def step(acc, xy):
            return C.madd(acc, xy), None

        first = (map_leaf(gx, lambda a: a[0]), map_leaf(gy, lambda a: a[0]))
        init = C.zero_like(C.promote(first))
        acc, _ = jax.lax.scan(step, init, (gx, gy))
        return acc

    def points_affine(self, scalar_limbs):
        """[k_i]G as affine Montgomery planes ((X, Y), zero = (0, 0)) —
        pkey storage form."""
        return batch_to_affine(self.curve, self.points_jac(scalar_limbs))


def batch_to_affine(curve_dev, p):
    """Jacobian -> affine Montgomery planes, batched: one Fermat inversion
    ladder over all lanes (F.inv), then X/Z^2, Y/Z^3.  Zero points map to
    (0, 0) — the pkey/MSM affine-zero encoding."""
    F = curve_dev.F
    X, Y, Z = p
    zero = curve_dev.is_zero(p)
    zi = F.inv(F.select(zero, F.one_like(Z), Z))
    zi2 = F.square(zi)
    ax = F.mul(X, zi2)
    ay = F.mul(Y, F.mul(zi, zi2))
    ax = F.select(zero, F.zero_like(ax), ax)
    ay = F.select(zero, F.zero_like(ay), ay)
    return (ax, ay)
