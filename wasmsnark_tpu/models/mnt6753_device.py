"""MNT6753 device kernels: batched Pedersen hash and deterministic group map.

The reference computes the Bowe-Gabizon hash-to-curve pipeline one proof at
a time inside a worker (PEDERSEN_HASH command, src/mnt6753.js:251-263, then
blake2s on the main thread and mnt6753_groupMap in WASM).  Here both ends
are batched device programs: N proofs' bit strings hash in lanes (the
~1000 windowed point-adds of build_pedersenhash.js become ~6 batched
complete adds over a [188, N] accumulator grid plus a 187-step fold), and
the group map's three candidate x values are evaluated branch-free with
masked selects (build_mnt6753.js:1385-1511 semantics, including the
f1m_sqrt even-canonical sign convention).  blake2s stays on the host
(hashlib), exactly as the reference keeps it in JS.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.fp import FpDevice, FpSqrt, U32
from ..ops.towers import FpAdapter
from ..ops.curve import ProjectiveDevice, map_leaf
from .mnt6753 import mnt6753, Q, A, B as CURVE_B
from .mnt6753_constants import (
    GROUP_MAP_CONIC_C, GROUP_MAP_PROJ_Z, PEDERSEN_CHUNK_SIZE, PEDERSEN_BASES)


class Mnt6753Device:
    def __init__(self):
        self.m = mnt6753()
        self.fp = FpDevice(self.m.fp_spec)
        self.sq = FpSqrt(self.fp)
        a_mont = jnp.asarray(self.fp.pack_mont([A]))
        self.G1d = ProjectiveDevice(
            FpAdapter(self.fp), lambda z: self.fp.mont_mul(z, a_mont))
        self._const = lambda v: jnp.asarray(self.fp.pack_mont([v]))

    # -- group map (build_mnt6753.js:1385-1511, branch-free) -------------------

    def group_map(self, t):
        """t: [L, *B] canonical limb planes -> projective G1 point planes
        (Montgomery form), the same point as Mnt6753.group_map per lane."""
        F = self.fp
        tm = F.to_mont(jnp.asarray(t, U32))
        conic = self._const(GROUP_MAP_CONIC_C)
        projz = self._const(GROUP_MAP_PROJ_Z)
        one = self._const(1)
        half = self._const(pow(2, -1, Q))
        a_m = self._const(A)
        b_m = self._const(CURVE_B)

        # Fraction-tracked form: with s = 2*N1/D1 (N1 = ct+projz,
        # D1 = ct*t+1) the reference's two *chained* inversions
        # (s-denominator then y-denominator) decouple algebraically —
        # z = (projz*D1 - 2*N1)/D1 and y = (D1 - 2*N1*t)/D1, so
        # v = z/y - half needs inv(D1 - 2*N1*t), and y itself needs
        # inv(D1); both come out of ONE shared Fermat ladder via
        # batch_inv (~1500 Montgomery muls saved per call).
        # (Assumes D1 != 0, i.e. conic*t^2 != -1 — the reference's
        # inverseMod path makes the same non-exceptional assumption.)
        ct = F.mont_mul(conic, tm)
        d1 = F.add(F.mont_mul(ct, tm), one)
        two_n1 = F.add(F.add(ct, projz), F.add(ct, projz))
        y_num = F.sub(d1, F.mont_mul(two_n1, tm))
        z_num = F.sub(F.mont_mul(projz, d1), two_n1)
        inv_ynum, inv_d1 = F.batch_inv([y_num, d1])
        v = F.sub(F.mont_mul(z_num, inv_ynum), half)
        y = F.mont_mul(y_num, inv_d1)

        def rhs(x):
            return F.add(
                F.add(F.mont_mul(F.mont_sqr(x), x), F.mont_mul(a_m, x)), b_m)

        x1 = v
        x2 = F.neg(F.add(one, v))
        x3 = F.add(one, F.mont_sqr(y))
        y1, y2c, y3 = rhs(x1), rhs(x2), rhs(x3)
        # one Euler ladder for both candidates (stacked on a new axis)
        m12 = self.sq.is_square(jnp.stack([y1, y2c], axis=1))
        m1, m2 = m12[0], m12[1]
        # first candidate with square RHS wins (same order as the reference)
        x = F.select(m1, x1, F.select(m2, x2, x3))
        ysq = F.select(m1, y1, F.select(m2, y2c, y3))
        yy = self.sq.sqrt(ysq)
        one_b = jnp.broadcast_to(one.reshape((F.L,) + (1,) * (x.ndim - 1)),
                                 x.shape).astype(U32)
        return (x, yy, one_b)

    # -- Pedersen hash (build_pedersenhash.js, batched) -------------------------

    @functools.cached_property
    def _window_tables(self):
        """Host-precomputed per-window {1B..4B} affine tables.

        Returns (tx, ty) numpy [L, n_win_max, 4] for the maximum bit length
        used by the verifier: two G1 points (1+753 bits each) plus two
        G2-over-Fp3 points (1+3*753 bits each) = 6028 bits -> 2010 windows
        (mnt6753.js:645-658; within the 12-base x 188-window table)."""
        m = self.m
        n = PEDERSEN_CHUNK_SIZE
        nbits = 2 * (1 + 753) + 2 * (1 + 3 * 753)
        n_win = (nbits + 2) // 3
        table = m._pedersen_table  # [base][sel] projective oracle points
        xs, ys = [], []
        for w in range(n_win):
            base = table[w // n]
            row_x, row_y = [], []
            for sel in range(4):
                p = m.G1.affine(base[sel])
                row_x.append(p[0])
                row_y.append(p[1])
            xs.append(row_x)
            ys.append(row_y)
        L = self.fp.L
        tx = np.zeros((L, n_win, 4), dtype=np.uint32)
        ty = np.zeros((L, n_win, 4), dtype=np.uint32)
        for w in range(n_win):
            tx[:, w, :] = self.fp.pack_mont(xs[w])
            ty[:, w, :] = self.fp.pack_mont(ys[w])
        return tx, ty

    def pedersen_hash(self, bits):
        """bits: uint32 [nbits, B] (0/1) -> canonical affine x-coordinate
        limb planes [L, B] (g1m_pedersenHash result semantics)."""
        F = self.fp
        G = self.G1d
        n = PEDERSEN_CHUNK_SIZE
        nbits, Bn = bits.shape
        n_win = (nbits + 2) // 3
        pad3 = 3 * n_win - nbits
        if pad3:
            bits = jnp.concatenate(
                [bits, jnp.zeros((pad3, Bn), U32)], axis=0)
        b3 = bits.reshape(n_win, 3, Bn)
        sel = b3[:, 0] | (b3[:, 1] << 1)          # [n_win, B]
        sign = b3[:, 2]

        tx_np, ty_np = self._window_tables
        assert n_win <= tx_np.shape[1], "bit string longer than table"
        tx = jnp.asarray(tx_np[:, :n_win])         # [L, n_win, 4]
        ty = jnp.asarray(ty_np[:, :n_win])

        # one-hot select of (sel+1)*Base per window
        def pick(tab):
            out = jnp.zeros((F.L, n_win, Bn), U32)
            for k in range(4):
                out = jnp.where((sel == k)[None], tab[:, :, k:k + 1], out)
            return out

        px = pick(tx)
        py = pick(ty)
        py = F.select(sign != 0, F.neg(py), py)     # signed digit
        one_m = jnp.broadcast_to(
            jnp.asarray(F.one_mont_np).reshape(F.L, 1, 1), px.shape).astype(U32)

        # group windows by accumulator index k = w mod chunkSize
        n_chunks = (n_win + n - 1) // n
        padw = n_chunks * n - n_win
        def padwin(a, zval=0):
            return jnp.concatenate(
                [a, jnp.full((F.L, padw, Bn), zval, U32)], axis=1) if padw else a
        px = padwin(px).reshape(F.L, n_chunks, n, Bn)
        py = padwin(py).reshape(F.L, n_chunks, n, Bn)
        pz = padwin(one_m).reshape(F.L, n_chunks, n, Bn)  # pad z=0 -> zero pt

        acc = (px[:, 0], py[:, 0], pz[:, 0])
        for c in range(1, n_chunks):
            acc = G.add(acc, (px[:, c], py[:, c], pz[:, c]))

        # fold: res = acc[n-1]; for k = n-2..0: res = 16*res + acc[k]
        res = map_leaf(acc, lambda a: a[:, n - 1])
        ks = jnp.arange(n - 2, -1, -1, dtype=jnp.int32)

        def body(res, k):
            for _ in range(4):
                res = G.double(res)
            step = map_leaf(acc, lambda a: jnp.take(a, k, axis=1))
            return G.add(res, step), None

        res, _ = jax.lax.scan(body, res, ks)

        # affine x, canonical
        zi = F.mont_inv(res[2])
        x_aff = F.mont_mul(res[0], zi)
        return F.from_mont(x_aff)


@functools.lru_cache(maxsize=1)
def mnt6753_device() -> Mnt6753Device:
    return Mnt6753Device()
