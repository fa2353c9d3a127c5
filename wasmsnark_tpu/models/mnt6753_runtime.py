"""MNT6753 runtime: the Bowe-Gabizon verifier (src/mnt6753.js parity).

API mirror of the reference's Mnt6753 class:

    reference (src/mnt6753.js)        here
    --------------------------        ----
    verifySync(vk, input, proof)      verify_sync(vk, input, proof)
    verify(vk, input, proof)          verify(vk, input, proof)
    verifyFused(vk, input, proof)     verify_fused(vk, input, proof)
    (no batch API)                    bowe_gabizon_verify_batch(vk, ...)

verify_sync is the host-bigint oracle path (mnt6753.js:614-726 semantics).
verify / verify_fused are DEVICE programs — the TPU-native re-design of the
reference's worker-pool DAGs (mnt6753.js:944-1087 / :779-941): instead of
farming 5 Miller loops (or line-function arrays) to a worker pool, N proofs
ride the batch lanes of two jitted programs:

  program 1: batched Pedersen hash over the proofs' bit strings
             (device, models/mnt6753_device.py)
     host  : blake2s per proof (the reference also keeps blake2s in JS)
  program 2: groupMap -> 5-pair randomized pairing product vs alphaBeta^rho
             (verify: independent Miller lanes + tree product;
              verify_fused: single fused Miller loop, one f squaring per
              iteration — the fusedMillerLoop analogue)

The rho randomization (16 random bytes) merges check1^rho * check2 into ONE
product e(rho A, B) e(-rho vk_x, G2) e(-rho C, dp) e(Ys, dp) e(-Z, delta)
== alphaBeta^rho, exactly as the reference's async verify does
(mnt6753.js:1070-1083) — one final exponentiation for both checks.

Verification protocol (mnt6753.js:614-726):
  1. bits := [A.y&1, bits753(A.x), B.y.a&1, bits753(B.x.{a,b,c}),
              C.y&1, bits753(C.x), dp.y.a&1, bits753(dp.x.{a,b,c})]
  2. vk_x := query[0] + sum_i input[i] * query[i+1]
  3. check1: e(A,B) * e(-vk_x, G2gen) * e(-C, deltaPrime) == alphaBeta
  4. ys := groupMap(blake2s(pedersenHash(bits)[x, 95 bytes LE]))
  5. check2: e(ys, deltaPrime) * e(-Z, delta) == 1
"""

from __future__ import annotations

import functools
import hashlib
import os

import numpy as np

from .mnt6753 import mnt6753, Q
from ..utils.serialize import parse_bigint, is_ocam_num, int_to_bytes_le


def _bits753(v: int):
    """LSB-first 753 bits of a canonical field value (unpackBits over the
    96-byte LE memory image, mnt6753.js:373-379)."""
    return [(v >> i) & 1 for i in range(753)]


class Mnt6753Runtime:
    def __init__(self):
        self.m = mnt6753()

    # -- JSON marshalling (setF1/setF3/setF6/setG1Affine/setG2Affine,
    #    mnt6753.js:492-537; values decimal strings or OCaml num triples) ----

    def _f1(self, e):
        return parse_bigint(e) % Q

    def _f3(self, e):
        return (self._f1(e["a"]), self._f1(e["b"]), self._f1(e["c"]))

    def _f6(self, e):
        return (self._f3(e["a"]), self._f3(e["b"]))

    def _g1_affine(self, e):
        return self.m.G1.from_affine(self._f1(e["x"]), self._f1(e["y"]))

    def _g2_affine(self, e):
        return self.m.G2.from_affine(self._f3(e["x"]), self._f3(e["y"]))

    # -- hash input bit string (mnt6753.js:645-658) ---------------------------

    @staticmethod
    def _g1_bits(p_affine):
        return [p_affine[1] & 1] + _bits753(p_affine[0])

    @staticmethod
    def _g2_bits(p_affine):
        x, y = p_affine[0], p_affine[1]
        return [y[0] & 1] + _bits753(x[0]) + _bits753(x[1]) + _bits753(x[2])

    def calculate_ys(self, a_aff, b_aff, c_aff, dp_aff):
        """Pedersen-hash the proof points, blake2s, group-map to G1
        (calculateYS, mnt6753.js:730-777)."""
        bits = (self._g1_bits(a_aff) + self._g2_bits(b_aff)
                + self._g1_bits(c_aff) + self._g2_bits(dp_aff))
        ped_x = self.m.pedersen_hash(bits)
        digest = hashlib.blake2s(int_to_bytes_le(ped_x, 96)[:95]).digest()
        t = int.from_bytes(digest, "little")
        return self.m.group_map(t)

    # -- verifier --------------------------------------------------------------

    def verify_sync(self, verification_key: dict, inputs, proof: dict) -> bool:
        m = self.m
        if inputs is None:
            inputs = []
        elif not isinstance(inputs, list) or is_ocam_num(inputs):
            inputs = [inputs]

        A = m.G1.affine(self._g1_affine(proof["a"]))
        Bp = m.G2.affine(self._g2_affine(proof["b"]))
        C = m.G1.affine(self._g1_affine(proof["c"]))
        dp = m.G2.affine(self._g2_affine(proof["deltaPrime"]))

        query = verification_key["query"]
        if len(inputs) + 1 != len(query):
            return False
        vk_x = self._g1_affine(query[0])
        for i, raw in enumerate(inputs):
            # scalar is the raw 753-bit value, no mod-r reduction
            # (g1m_timesScalar over SIZEF1 bytes, mnt6753.js:673-676)
            s = parse_bigint(raw)
            vk_x = m.G1.add(vk_x, m.G1.times_scalar(self._g1_affine(query[i + 1]), s))

        alpha_beta = self._f6(verification_key["alphaBeta"])
        valid1 = m.pairing_eq(
            [(A, Bp), (m.G1.neg(vk_x), m.g2_gen), (m.G1.neg(C), dp)],
            expected=alpha_beta,
        )
        if not valid1:
            return False

        ys = self.calculate_ys(A, Bp, C, dp)
        Z = self._g1_affine(proof["z"])
        delta = self._g2_affine(verification_key["delta"])
        return m.pairing_eq([(ys, dp), (m.G1.neg(Z), delta)])

    # -- device-batched verification ------------------------------------------

    def _marshal(self, verification_key: dict, inputs, proof: dict):
        """Host marshalling shared by the device paths: affine proof points,
        vk_x ladder, rho randomization, alphaBeta^rho.  Returns None when
        the input count mismatches the query (verify returns False)."""
        m = self.m
        if inputs is None:
            inputs = []
        elif not isinstance(inputs, list) or is_ocam_num(inputs):
            inputs = [inputs]
        query = verification_key["query"]
        if len(inputs) + 1 != len(query):
            return None

        A = m.G1.affine(self._g1_affine(proof["a"]))
        Bp = m.G2.affine(self._g2_affine(proof["b"]))
        C = m.G1.affine(self._g1_affine(proof["c"]))
        dp = m.G2.affine(self._g2_affine(proof["deltaPrime"]))
        Z = m.G1.affine(self._g1_affine(proof["z"]))
        delta = m.G2.affine(self._g2_affine(verification_key["delta"]))

        vk_x = self._g1_affine(query[0])
        for i, raw in enumerate(inputs):
            s = parse_bigint(raw)
            vk_x = m.G1.add(
                vk_x, m.G1.times_scalar(self._g1_affine(query[i + 1]), s))

        # rho: 16 random bytes (mnt6753.js:789-800) — scales A, vk_x, C and
        # the alphaBeta comparison target, merging both pairing checks
        rho = int.from_bytes(os.urandom(16), "little")
        aff = lambda p: m.G1.affine(p)[:2]
        rA = aff(m.G1.times_scalar(m.G1.from_affine(*A[:2]), rho))
        n_vkx = aff(m.G1.neg(m.G1.times_scalar(vk_x, rho)))
        nC = aff(m.G1.neg(m.G1.times_scalar(m.G1.from_affine(*C[:2]), rho)))
        nZ = aff(m.G1.neg(m.G1.from_affine(*Z[:2])))
        alpha_beta = self._f6(verification_key["alphaBeta"])
        ab_rho = m.F6.exp(alpha_beta, rho)

        bits = (self._g1_bits(A) + self._g2_bits(Bp)
                + self._g1_bits(C) + self._g2_bits(dp))
        return {
            # pair order: (rho A, B), (-rho vk_x, G2gen), (-rho C, dp),
            #             (-Z, delta), (Ys, dp) — Ys appended on device;
            # G2gen and delta ride the per-vk prepared-coefficient cache,
            # only the varying (B, dp) G2 points are marshalled per call
            "g1_4": [rA, n_vkx, nC, nZ],
            "g2_var": [(Bp[0], Bp[1]), (dp[0], dp[1])],
            "delta": (delta[0], delta[1]),
            "expected": ab_rho,
            "bits": bits,
        }

    @functools.cached_property
    def _dev(self):
        from .mnt6753_device import mnt6753_device
        return mnt6753_device()

    @functools.cached_property
    def _pd(self):
        from ..ops.pairing import mnt6753_pairing_device
        return mnt6753_pairing_device()

    @functools.cached_property
    def _jit(self):
        import jax
        dev, pd = self._dev, self._pd

        def assemble(t, g1x4, g1y4, g2_var, fixed_coeffs):
            """Shared front half: group-map Ys onto the g1 pair axis; build
            the 5-pair prepared coefficient stack [B, G2gen, dp, delta, dp]
            from the per-call prepared (B, dp) and the per-vk prepared
            (G2gen, delta).  dp's ladder runs ONCE and feeds both its slots
            (the reference pays two Miller loops for dp; the PRECOMPUTE
            pattern here shares the G2 work, src/mnt6753.js:151-176)."""
            import jax.numpy as jnp
            ys_x, ys_y, _ = dev.group_map(t)
            g1 = (jnp.concatenate([g1x4, ys_x[:, None]], axis=1),
                  jnp.concatenate([g1y4, ys_y[:, None]], axis=1))
            prep = pd.prepare_g2(g2_var)        # leaves [S, L, 2, N]
            N = g1[0].shape[-1]

            def five(v, f):
                fb = jnp.broadcast_to(f[:, :, 0:1, None],
                                      f.shape[:2] + (1, N))
                gb = jnp.broadcast_to(f[:, :, 1:2, None],
                                      f.shape[:2] + (1, N))
                return jnp.concatenate(
                    [v[:, :, 0:1], fb, v[:, :, 1:2], gb, v[:, :, 1:2]],
                    axis=2)

            coeffs = jax.tree.map(five, prep, fixed_coeffs)
            return g1, coeffs

        def check(t, g1x4, g1y4, g2_var, fixed_coeffs, exp):
            g1, coeffs = assemble(t, g1x4, g1y4, g2_var, fixed_coeffs)
            e = pd.pairing_products_prepared(g1, coeffs, fused=False)
            return pd.is_eq_planes(e, exp)

        def check_fused(t, g1x4, g1y4, g2_var, fixed_coeffs, exp):
            g1, coeffs = assemble(t, g1x4, g1y4, g2_var, fixed_coeffs)
            e = pd.pairing_products_prepared(g1, coeffs, fused=True)
            return pd.is_eq_planes(e, exp)

        return {
            "pedersen": jax.jit(dev.pedersen_hash),
            "check": jax.jit(check),
            "check_fused": jax.jit(check_fused),
            "prepare": jax.jit(pd.prepare_g2),
        }

    def _fixed_coeffs(self, delta_aff):
        """Per-vk prepared pairing inputs: the ate-ladder line coefficients
        of the two FIXED G2 points of the verification equation (G2gen and
        vk.delta), computed once and reused across every verify call —
        leaves [S, L, 2] on device."""
        m = self.m
        key = delta_aff
        cache = getattr(self, "_fixed_cache", None)
        if cache is None:
            cache = self._fixed_cache = {}
        if key not in cache:
            g2gen = m.G2.affine(m.g2_gen)
            packed = self._pd.pack_g2(
                [(g2gen[0], g2gen[1]), (delta_aff[0], delta_aff[1])])
            if len(cache) >= 4:
                cache.clear()
            cache[key] = self._jit["prepare"](packed)
        return cache[key]

    def _verify_device(self, verification_key, inputs_list, proofs,
                       fused: bool) -> list[bool]:
        """N proofs in batch lanes through the two device programs."""
        import jax.numpy as jnp

        ms = [self._marshal(verification_key, inp, prf)
              for inp, prf in zip(inputs_list, proofs)]
        ok_idx = [i for i, mm in enumerate(ms) if mm is not None]
        results = [False] * len(ms)
        if not ok_idx:
            return results
        batch = [ms[i] for i in ok_idx]
        N = len(batch)
        fp, pd = self._dev.fp, self._pd

        # program 1: batched Pedersen hash
        bits = np.asarray([mm["bits"] for mm in batch], dtype=np.uint32).T
        ped_x = fp.unpack(np.asarray(self._jit["pedersen"](jnp.asarray(bits))))

        # host: blake2s of the 95-byte LE x image (mnt6753.js:766)
        ts = [int.from_bytes(
            hashlib.blake2s(int_to_bytes_le(x, 96)[:95]).digest(), "little")
            for x in ped_x]

        # program 2: groupMap + 5-pair randomized product vs alphaBeta^rho
        from ..utils.serialize import ints_to_limbs
        t_planes = jnp.asarray(ints_to_limbs(ts, fp.L))
        g1x4 = jnp.asarray(np.stack(
            [fp.pack_mont([mm["g1_4"][k][0] for mm in batch])
             for k in range(4)], axis=1))
        g1y4 = jnp.asarray(np.stack(
            [fp.pack_mont([mm["g1_4"][k][1] for mm in batch])
             for k in range(4)], axis=1))

        def g2comp(i, j):
            return jnp.asarray(np.stack(
                [fp.pack_mont([mm["g2_var"][k][i][j] for mm in batch])
                 for k in range(2)], axis=1))

        g2_var = (tuple(g2comp(0, j) for j in range(3)),
                  tuple(g2comp(1, j) for j in range(3)))
        exp = pd.pack_f6([mm["expected"] for mm in batch])
        fixed = self._fixed_coeffs(batch[0]["delta"])

        key = "check_fused" if fused else "check"
        ok = np.asarray(self._jit[key](
            t_planes, g1x4, g1y4, g2_var, fixed, exp))
        for pos, i in enumerate(ok_idx):
            results[i] = bool(ok[pos])
        return results

    def bowe_gabizon_verify_batch(self, verification_key, inputs_list,
                                  proofs, fused: bool = True) -> list[bool]:
        """Batched device verification: N proofs ride the kernel lanes of
        one Pedersen program + one groupMap/pairing program — the TPU-native
        answer to the reference's worker pool (amortizes the Miller-loop
        ladder across proofs instead of across cores)."""
        return self._verify_device(verification_key, inputs_list, proofs,
                                   fused=fused)

    def verify(self, verification_key, inputs, proof) -> bool:
        """Device verification (batch of 1) — independent Miller lanes +
        tree product (the reference verify's 5-worker DAG, collapsed into
        lanes)."""
        return self._verify_device(
            verification_key, [inputs], [proof], fused=False)[0]

    def verify_fused(self, verification_key, inputs, proof) -> bool:
        """Device verification through the fused Miller loop (verifyFused
        analogue: one running f, line values combined per iteration)."""
        return self._verify_device(
            verification_key, [inputs], [proof], fused=True)[0]

    # reference API alias (main_mnt6753.js:26-44); the sync name keeps the
    # host-oracle path for environments without a device
    bowe_gabizon_verifier = verify_sync
