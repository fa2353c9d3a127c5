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

from ..models.bn128 import bn128
from ..utils.serialize import parse_bigint


def _module(curve: str):
    if curve == "bn128":
        return bn128()
    if curve == "bls12381":
        from ..models.bls12381 import bls12381
        return bls12381()
    raise ValueError(f"unknown curve {curve!r}")


def _g1_from_json(m, pt):
    x, y, z = (parse_bigint(c) for c in pt[:3])
    if z == 0:
        return m.G1.zero()
    # normalize: reference JSON always has z==1 for affine points
    p = (m.F1.elem(x), m.F1.elem(y), m.F1.elem(z))
    return m.G1.affine(p) if z != 1 else p


def _g2_from_json(m, pt):
    q = m.F1.q
    xs, ys, zs = pt[:3]
    x = (parse_bigint(xs[0]) % q, parse_bigint(xs[1]) % q)
    y = (parse_bigint(ys[0]) % q, parse_bigint(ys[1]) % q)
    z = (parse_bigint(zs[0]) % q, parse_bigint(zs[1]) % q)
    if z == (0, 0):
        return m.G2.zero()
    p = (x, y, z)
    return m.G2.affine(p) if z != (1, 0) else p


class _M:
    pass


def groth16_verify(vk: dict, inputs, proof: dict,
                   curve: str = "bn128") -> bool:
    """Verify a proof against a snarkjs-style verification key JSON.

    `vk`: dict with vk_alfa_1, vk_beta_2, vk_gamma_2, vk_delta_2, IC.
    `inputs`: list of public inputs (ints / decimal strings); a scalar or
    OCaml-num value is wrapped, mirroring bn128.js:724-728.
    `proof`: dict with pi_a (G1), pi_b (G2), pi_c (G1).
    """
    m = _module(curve)
    R = m.Fr.q

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


# ---------------------------------------------------------------------------
# Batched device verification (TPU-native capability beyond the reference)
# ---------------------------------------------------------------------------

def groth16_verify_batch(vk: dict, inputs_list, proofs,
                         curve: str = "bn128") -> list:
    """Verify N proofs against one verification key in a single device
    program.

    The reference verifies one proof at a time on the main-thread WASM
    instance (bn128.js:722-791).  Here the four Miller loops of the pairing
    equation and all N proofs share one jitted computation: leaves are
    [L, 4, N] limb planes, the pairs axis reduces with two F12 muls, and one
    final exponentiation closes the equation — verification throughput
    scales with N (the production use-case: a verification server draining
    a proof queue).

    Falls back to per-proof host verification for lanes with degenerate
    (zero) points; the equation math is identical either way.
    """
    import numpy as np

    m = _module(curve)
    R = m.Fr.q
    n = len(proofs)
    assert len(inputs_list) == n

    if curve == "bn128":
        from ..ops.pairing import bn128_pairing_device
        pd = bn128_pairing_device()
    else:
        from ..ops.pairing import bls12381_pairing_device
        pd = bls12381_pairing_device()

    g1_rows = [[], [], [], []]   # A, -vk_x, -C, -alfa1
    g2_rows = [[], [], [], []]   # B, gamma2, delta2, beta2
    ok_host = [True] * n

    alfa1 = _g1_from_json(m, vk["vk_alfa_1"])
    beta2 = _g2_from_json(m, vk["vk_beta_2"])
    gamma2 = _g2_from_json(m, vk["vk_gamma_2"])
    delta2 = _g2_from_json(m, vk["vk_delta_2"])
    ic = [_g1_from_json(m, p) for p in vk["IC"]]
    g1_gen_aff = m.G1.affine(m.g1_gen)
    g2_gen_aff = m.G2.affine(m.g2_gen)

    for i, (inputs, proof) in enumerate(zip(inputs_list, proofs)):
        if inputs is None:
            inputs = []
        elif not isinstance(inputs, list):
            inputs = [inputs]
        try:
            A = _g1_from_json(m, proof["pi_a"])
            B = _g2_from_json(m, proof["pi_b"])
            C = _g1_from_json(m, proof["pi_c"])
            if len(inputs) + 1 != len(ic):
                raise ValueError("bad input count")
            vk_x = ic[0]
            for j, raw in enumerate(inputs):
                v = parse_bigint(raw)
                if v >= R:
                    raise ValueError("input >= r")
                vk_x = m.G1.add(vk_x, m.G1.times_scalar(ic[j + 1], v))
            pts1 = [A, m.G1.neg(vk_x), m.G1.neg(C), m.G1.neg(alfa1)]
            pts2 = [B, gamma2, delta2, beta2]
            if any(m.G1.is_zero(p) for p in pts1) or any(
                    m.G2.is_zero(p) for p in pts2):
                raise ValueError("zero point")
            for k in range(4):
                a1 = m.G1.affine(pts1[k])
                a2 = m.G2.affine(pts2[k])
                g1_rows[k].append((a1[0], a1[1]))
                g2_rows[k].append((a2[0], a2[1]))
        except (ValueError, KeyError, TypeError):
            # keep lanes rectangular: pair (G, -G) x (H, H) which cannot
            # satisfy the equation; mark lane decided on host
            ok_host[i] = None
            for k in range(4):
                g1_rows[k].append((g1_gen_aff[0], g1_gen_aff[1]))
                g2_rows[k].append((g2_gen_aff[0], g2_gen_aff[1]))

    g1 = pd.pack_g1([p for row in g1_rows for p in row])   # [L, 4N]
    from ..ops.curve import map_leaf
    g1 = map_leaf(g1, lambda a: a.reshape(a.shape[0], 4, n))
    # only pair 0's G2 (pi_b) varies per proof; gamma2/delta2/beta2 are
    # vk constants and ride the prepared-coefficient cache (the prepareG2
    # pattern, build_bn128.js:459-575) — 3 of the 4 G2 ate ladders are
    # precomputed once per vk instead of re-run per batch
    g2_b = pd.pack_g2(g2_rows[0])
    g2_b = map_leaf(g2_b, lambda a: a.reshape(a.shape[0], 1, n))
    fixed = _prepared_vk_coeffs(pd, (gamma2, delta2, beta2), m)

    run = _pairing_batch_jit(pd)
    ok = np.asarray(run(g1, g2_b, fixed))
    return [bool(ok[i]) if ok_host[i] is True else False for i in range(n)]


def _prepared_vk_coeffs(pd, g2_fixed, m):
    """Prepared line coefficients for the vk's fixed G2 points
    (gamma2, delta2, beta2) — device leaves [S, L, 3], cached per vk."""
    import jax
    cache = getattr(pd, "_vk_prep_cache", None)
    if cache is None:
        cache = pd._vk_prep_cache = {}
    pts = tuple(m.G2.affine(p) for p in g2_fixed)
    key = tuple((p[0], p[1]) for p in pts)
    if key not in cache:
        if len(cache) >= 4:
            cache.clear()
        if not hasattr(pd, "_prepare_jit"):
            pd._prepare_jit = jax.jit(pd.prepare_g2)
        cache[key] = pd._prepare_jit(pd.pack_g2(list(key)))
    return cache[key]


def _pairing_batch_jit(pd):
    import jax
    import jax.numpy as jnp
    if not hasattr(pd, "_batch_jit"):
        def run(g1, g2_b, fixed):
            # g1 leaves [L, 4, N]; g2_b F2 leaves [L, 1, N];
            # fixed coeff leaves [S, L, 3]
            prep_b = pd.prepare_g2(g2_b)        # leaves [S, L, 1, N]
            N = g1[0].shape[-1]
            coeffs = jax.tree.map(
                lambda b, f: jnp.concatenate(
                    [b, jnp.broadcast_to(f[..., None],
                                         f.shape[:2] + (3, N))], axis=2),
                prep_b, fixed)
            e = pd.pairing_product_prepared(g1, coeffs, 4)
            return pd.is_one(e)
        pd._batch_jit = jax.jit(run)
    return pd._batch_jit
