"""Groth16 verifier for BN128 — semantics of src/bn128.js:722-791.

The verification equation, exactly as the reference evaluates it:

    e(A, B) * e(-vk_x, gamma_2) * e(-C, delta_2) * e(-alfa_1, beta_2) == 1

with vk_x = IC[0] + sum_i input[i] * IC[i+1], and every public input checked
to be < r (bn128.js:776: `if int_gte(input, r) return false`).

Round 1 runs the pairing on the host oracle (the reference runs it on the
main-thread WASM instance — batch-1 pairing is latency work either way); the
device pairing path lands with the F6/F12 device towers.
"""

from __future__ import annotations

from ..models.bn128 import bn128, R
from ..utils.serialize import parse_bigint


def _g1_from_json(m, pt):
    x, y, z = (parse_bigint(c) for c in pt[:3])
    if z == 0:
        return m.G1.zero()
    # normalize: reference JSON always has z==1 for affine points
    p = (m.F1.elem(x), m.F1.elem(y), m.F1.elem(z))
    return m.G1.affine(p) if z != 1 else p


def _g2_from_json(m, pt):
    xs, ys, zs = pt[:3]
    x = (parse_bigint(xs[0]) % m.q_f1, parse_bigint(xs[1]) % m.q_f1)
    y = (parse_bigint(ys[0]) % m.q_f1, parse_bigint(ys[1]) % m.q_f1)
    z = (parse_bigint(zs[0]) % m.q_f1, parse_bigint(zs[1]) % m.q_f1)
    if z == (0, 0):
        return m.G2.zero()
    p = (x, y, z)
    return m.G2.affine(p) if z != (1, 0) else p


class _M:
    pass


def groth16_verify(vk: dict, inputs, proof: dict) -> bool:
    """Verify a proof against a snarkjs-style verification key JSON.

    `vk`: dict with vk_alfa_1, vk_beta_2, vk_gamma_2, vk_delta_2, IC.
    `inputs`: list of public inputs (ints / decimal strings); a scalar or
    OCaml-num value is wrapped, mirroring bn128.js:724-728.
    `proof`: dict with pi_a (G1), pi_b (G2), pi_c (G1).
    """
    m = bn128()
    m.q_f1 = m.F1.q

    if inputs is None:
        inputs = []
    elif not isinstance(inputs, list):
        inputs = [inputs]

    A = _g1_from_json(m, proof["pi_a"])
    B = _g2_from_json(m, proof["pi_b"])
    C = _g1_from_json(m, proof["pi_c"])

    alfa1 = _g1_from_json(m, vk["vk_alfa_1"])
    beta2 = _g2_from_json(m, vk["vk_beta_2"])
    gamma2 = _g2_from_json(m, vk["vk_gamma_2"])
    delta2 = _g2_from_json(m, vk["vk_delta_2"])
    ic = [_g1_from_json(m, p) for p in vk["IC"]]

    if len(inputs) + 1 != len(ic):
        return False

    vk_x = ic[0]
    for i, raw in enumerate(inputs):
        v = parse_bigint(raw)
        if v >= R:  # input < r check (bn128.js:776)
            return False
        vk_x = m.G1.add(vk_x, m.G1.times_scalar(ic[i + 1], v))

    return m.pairing_eq([
        (A, B),
        (m.G1.neg(vk_x), gamma2),
        (m.G1.neg(C), delta2),
        (m.G1.neg(alfa1), beta2),
    ])
