"""MNT6753 runtime: the Bowe-Gabizon verifier (src/mnt6753.js parity).

API mirror of the reference's Mnt6753 class:

    reference (src/mnt6753.js)        here
    --------------------------        ----
    verifySync(vk, input, proof)      verify_sync(vk, input, proof)
    verify(vk, input, proof)          verify(vk, input, proof)
    verifyFused(vk, input, proof)     verify_fused(vk, input, proof)

The reference's async variants farm 5 Miller loops / line-function arrays to
a worker pool and randomize with alphaBeta^rho (mnt6753.js:779-1087); the
final boolean is identical to verifySync.  Here the protocol DAG is one
computation (device batching of the pairing work lands with the F6 device
towers), so all three entry points share one implementation.

Verification protocol (mnt6753.js:614-726):
  1. bits := [A.y&1, bits753(A.x), B.y.a&1, bits753(B.x.{a,b,c}),
              C.y&1, bits753(C.x), dp.y.a&1, bits753(dp.x.{a,b,c})]
  2. vk_x := query[0] + sum_i input[i] * query[i+1]
  3. check1: e(A,B) * e(-vk_x, G2gen) * e(-C, deltaPrime) == alphaBeta
  4. ys := groupMap(blake2s(pedersenHash(bits)[x, 95 bytes LE]))
  5. check2: e(ys, deltaPrime) * e(-Z, delta) == 1
"""

from __future__ import annotations

import hashlib

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

    # The reference's async/fused variants return the same boolean; the
    # worker-DAG they implement (mnt6753.js:779-1087) is collapsed here.
    verify = verify_sync
    verify_fused = verify_sync

    # reference API aliases (main_mnt6753.js:26-44)
    bowe_gabizon_verifier = verify_sync
