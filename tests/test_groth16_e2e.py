"""End-to-end Groth16: reference artifacts + own setup/prove/verify.

Mirrors the reference's e2e layers (SURVEY.md §4): the verifier is checked
against wasmsnark's committed real proof (example/bn128), and the prover is
exercised on a generated circuit (the reference's own multi-MB pkey blobs
are stripped from the snapshot — .MISSING_LARGE_BLOBS)."""

import json
import os

import pytest

import wasmsnark_tpu
from wasmsnark_tpu.groth16.setup import square_chain_circuit, square_chain_witness, setup
from wasmsnark_tpu.groth16.pkey import (
    write_witness, parse_pkey, read_witness)
from wasmsnark_tpu.models.bn128 import bn128

REF = "/root/reference/example/bn128"


@pytest.fixture(scope="module")
def rt():
    return wasmsnark_tpu.build_bn128()


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not mounted")
def test_verify_reference_proof(rt):
    vk = json.load(open(f"{REF}/verification_key.json"))
    pub = json.load(open(f"{REF}/public.json"))
    proof = json.load(open(f"{REF}/proof_good.json"))
    assert rt.groth16_verify(vk, pub, proof) is True
    bad = json.loads(json.dumps(proof))
    bad["pi_a"][0] = str(int(bad["pi_a"][0]) + 1)
    assert rt.groth16_verify(vk, pub, bad) is False
    assert rt.groth16_verify(vk, pub[:-1], proof) is False


def test_pkey_roundtrip():
    r1cs = square_chain_circuit(2)
    pkey, vk, _ = setup(r1cs, seed=3)
    m = bn128()
    pk = parse_pkey(pkey, m.fp_spec, m.fr_spec)
    assert pk.n_signals == r1cs.n_signals
    assert pk.n_public == 1
    assert pk.domain_size == 4
    # alfa1 must be on the curve
    x, y = pk.alfa1
    assert (y * y - (x ** 3 + 3)) % m.F1.q == 0
    # sparse LC round trip: polsA nnz == total constraint-A entries
    assert len(pk.pols_a.sig_idx) == 4  # 2 square constraints + 2 binding rows


def test_witness_roundtrip():
    m = bn128()
    wit = square_chain_witness(2, 9)
    data = write_witness(wit, m.fr_spec)
    arr = read_witness(data, m.fr_spec)
    from wasmsnark_tpu.utils.serialize import limbs_to_ints
    assert limbs_to_ints(arr) == [v % m.Fr.q for v in wit]


def test_prove_and_verify_own_circuit(rt):
    r1cs = square_chain_circuit(3)
    pkey, vk, _ = setup(r1cs, seed=1)
    wit = square_chain_witness(3, 5)
    m = bn128()
    proof = rt.groth16_gen_proof(write_witness(wit, m.fr_spec), pkey, rng=7)
    pub = [str(wit[1])]
    assert rt.groth16_verify(vk, pub, proof) is True
    # zero randomness hook (reference debug convention, bn128.js:665-667)
    proof0 = rt.groth16_gen_proof(write_witness(wit, m.fr_spec), pkey,
                                  rng=lambda n: b"\0" * n)
    assert rt.groth16_verify(vk, pub, proof0) is True
    # invalid witness -> proof must not verify
    bad = list(wit)
    bad[3] += 1
    pbad = rt.groth16_gen_proof(write_witness(bad, m.fr_spec), pkey, rng=7)
    assert rt.groth16_verify(vk, pub, pbad) is False


def test_construct_lc_matches_oracle():
    """Segmented cumsum LC (no device scatter/sort) vs bigint accumulation,
    with duplicate destinations and empty buckets (build_pol.js:62-144
    semantics)."""
    import random
    import numpy as np
    import jax.numpy as jnp
    from wasmsnark_tpu.models.bn128 import bn128
    from wasmsnark_tpu.ops.fp import FpDevice
    from wasmsnark_tpu.ops.pol import SparseLC, construct_lc
    from wasmsnark_tpu.utils.serialize import ints_to_limbs

    m = bn128()
    Fr = FpDevice(m.fr_spec)
    q = m.Fr.q
    random.seed(5)
    domain, nsig, nnz = 16, 6, 40
    sig_idx = [random.randrange(nsig) for _ in range(nnz)]
    coef_idx = [random.choice([0, 3, 3, 3, 7, 7, 15]) for _ in range(nnz)]
    coefs = [random.randrange(q) for _ in range(nnz)]
    signals = [random.randrange(q) for _ in range(nsig)]
    lc = SparseLC(
        sig_idx=np.array(sig_idx, np.int32),
        coef_idx=np.array(coef_idx, np.int32),
        coefs=Fr.pack_mont(coefs),
        domain_size=domain)
    sig_m = Fr.to_mont(jnp.asarray(ints_to_limbs(signals, Fr.L)))
    out = Fr.unpack_mont(np.asarray(construct_lc(Fr, lc, sig_m)))
    exp = [0] * domain
    for s, c, v in zip(sig_idx, coef_idx, coefs):
        exp[c] = (exp[c] + signals[s] * v) % q
    assert out == exp


@pytest.mark.skipif(
    os.environ.get("WASMSNARK_TPU_SLOW_TESTS") != "1"
    or not os.path.exists(REF),
    reason="device pairing compile is heavy; set WASMSNARK_TPU_SLOW_TESTS=1")
def test_groth16_verify_batch_device(rt):
    """Batched DEVICE verification through the prepared-coefficient path
    (gamma2/delta2/beta2 ride the per-vk prepareG2 cache,
    build_bn128.js:459-575): the committed reference proof verifies, a
    tampered copy fails, and a second batch with the same vk reuses the
    cached prepared coefficients."""
    from wasmsnark_tpu.groth16.verifier import groth16_verify_batch
    vk = json.load(open(f"{REF}/verification_key.json"))
    pub = json.load(open(f"{REF}/public.json"))
    proof = json.load(open(f"{REF}/proof_good.json"))
    bad = json.loads(json.dumps(proof))
    bad["pi_a"][0] = str(int(bad["pi_a"][0]) + 1)
    got = groth16_verify_batch(vk, [pub, pub], [proof, bad])
    assert got == [True, False]
    # steady state: same vk -> prepared coeffs cached, one more batch
    got = groth16_verify_batch(vk, [pub], [proof])
    assert got == [True]


@pytest.mark.skipif(
    os.environ.get("WASMSNARK_TPU_SLOW_TESTS") != "1"
    or not os.path.exists(REF),
    reason="173 s of trace/compile on a 1-vCPU box (r5 tier timing)")
def test_groth16_verify_batch_program_traces():
    """Fast tier: the batched device-verification program (prepared pi_b
    ladder + per-vk fixed-G2 prepared coefficients + 4-pair product + final
    exponentiation) traces end-to-end on real marshalled inputs via
    jax.eval_shape — no backend compile (the SLOW test above executes it).
    Guards the prepared-coefficient assembly against shape/structure bugs
    on every default-tier run."""
    import jax
    import numpy as np
    from wasmsnark_tpu.groth16 import verifier as V
    from wasmsnark_tpu.ops.pairing import bn128_pairing_device

    vk = json.load(open(f"{REF}/verification_key.json"))
    pub = json.load(open(f"{REF}/public.json"))
    proof = json.load(open(f"{REF}/proof_good.json"))

    pd = bn128_pairing_device()
    V._pairing_batch_jit(pd)          # materialize, then patch
    real = pd._batch_jit
    calls = []

    def fake(g1, g2_b, fixed):
        out = jax.eval_shape(real, g1, g2_b, fixed)
        calls.append(out)
        assert out.shape == (2,)
        return np.zeros(out.shape, bool)

    pd._batch_jit = fake
    try:
        got = V.groth16_verify_batch(vk, [pub, pub], [proof, proof])
    finally:
        pd._batch_jit = real
    assert got == [False, False]      # fake returns zeros
    assert len(calls) == 1
