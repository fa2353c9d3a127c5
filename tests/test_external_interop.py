"""External-verifier interop: proofs produced by the TPU prover must verify
in an implementation that shares no code with the framework
(tools/external_verifier.py — plain-bigint, whole-tower Fp12, affine Miller
loop, full-exponent final exp).

The reference's own interop evidence is test/bn128_prover.js:73-78
(groth16Verify vs snarkjs's committed verification key); its proving-key
blobs are stripped from the snapshot (.MISSING_LARGE_BLOBS), so the
equivalent here is: (a) validate the external verifier itself against the
reference's committed proof/vk artifacts, (b) cross-check a
framework-generated proof with it.

Both are SLOW-gated: the external verifier does ~4 pure-Python pairings
(minutes on one core by design — it optimizes for independence, not speed).
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

SLOW = os.environ.get("WASMSNARK_TPU_SLOW_TESTS") == "1"
REF_EX = "/root/reference/example/bn128"


@pytest.mark.skipif(not SLOW, reason="pure-python pairings; set "
                                     "WASMSNARK_TPU_SLOW_TESTS=1")
@pytest.mark.skipif(not os.path.exists(REF_EX), reason="reference unavailable")
def test_external_verifier_accepts_reference_proof():
    """The external verifier, checked against reference-produced data:
    example/bn128/proof_good.json must verify under the committed
    verification_key.json + public.json."""
    from external_verifier import groth16_verify_external
    with open(os.path.join(REF_EX, "verification_key.json")) as f:
        vk = json.load(f)
    with open(os.path.join(REF_EX, "public.json")) as f:
        pub = json.load(f)
    with open(os.path.join(REF_EX, "proof_good.json")) as f:
        proof = json.load(f)
    assert groth16_verify_external(vk, pub, proof) is True


@pytest.mark.skipif(not SLOW, reason="pure-python pairings; set "
                                     "WASMSNARK_TPU_SLOW_TESTS=1")
def test_generated_proof_verifies_externally():
    """Full loop: own setup -> device prove -> INDEPENDENT verify."""
    from external_verifier import groth16_verify_external
    from wasmsnark_tpu.groth16.setup import (
        setup, square_chain_circuit, square_chain_witness)
    from wasmsnark_tpu.groth16.prover import Groth16Prover

    k = 6
    r1cs = square_chain_circuit(k)
    pkey, vk, _ = setup(r1cs, seed=11, accel=False)
    wit = square_chain_witness(k, 0xBEEF)
    proof = Groth16Prover(msm_window_bits=4).prove(wit, pkey, rng=77)
    assert groth16_verify_external(vk, [str(wit[1])], proof) is True

    # tampered public input must fail
    assert groth16_verify_external(vk, [str(wit[1] + 1)], proof) is False
