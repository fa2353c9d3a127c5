"""Bn128 production runtime — the analogue of the reference's `Bn128` class
(src/bn128.js), minus the worker pool: parallelism lives inside jitted XLA
programs and sharded meshes instead of postMessage workers.

    rt = wasmsnark_tpu.build_bn128()
    proof = rt.groth16_gen_proof(witness_bytes, pkey_bytes)
    ok    = rt.groth16_verify(vk_json, public_inputs, proof_json)
"""

from __future__ import annotations

from ..models.bn128 import bn128
from .verifier import groth16_verify as _verify


class Bn128Runtime:
    def __init__(self):
        self.module = bn128()

    # -- prover (src/bn128.js:580-720) ---------------------------------------
    def groth16_gen_proof(self, witness, pkey, *, rng=None):
        """witness: bytes (flat LE 32B Fr values, tools/buildwitness.js
        format) or list[int]; pkey: bytes in tools/buildpkey.js layout.
        Returns {pi_a, pi_b, pi_c} with decimal-string coordinates."""
        from .prover import groth16_gen_proof
        return groth16_gen_proof(witness, pkey, rng=rng)

    # -- verifier (src/bn128.js:722-791) --------------------------------------
    def groth16_verify(self, verification_key, inputs, proof) -> bool:
        return _verify(verification_key, inputs, proof)

    def groth16_verify_batch(self, verification_key, inputs_list, proofs):
        """Verify N proofs in one device program (lanes = proofs); see
        groth16.verifier.groth16_verify_batch."""
        from .verifier import groth16_verify_batch
        return groth16_verify_batch(verification_key, inputs_list, proofs)


class Bls12381Runtime:
    """BLS12-381 module + Groth16 runtime.

    The reference builds the complete bls12381 WASM module (field/curve/
    FFT/multiexp/pairing, src/bls12381/build_bls12381.js) but wires no
    prover orchestrator for it (SURVEY.md §2.2).  Here the curve-generic
    Groth16 pipeline serves BLS12-381 directly, so this runtime exposes
    the full prove/verify surface on top of the assembled module.

    Attribute access falls through to the curve module, so this object is
    a drop-in for `bls12381()` (fields, curves, pairing oracle)."""

    def __init__(self):
        from ..models.bls12381 import bls12381
        self.module = bls12381()

    def __getattr__(self, name):
        return getattr(self.module, name)

    def groth16_gen_proof(self, witness, pkey, *, rng=None):
        from .prover import groth16_gen_proof
        return groth16_gen_proof(witness, pkey, rng=rng, curve="bls12381")

    def groth16_verify(self, verification_key, inputs, proof) -> bool:
        return _verify(verification_key, inputs, proof, curve="bls12381")

    def groth16_verify_batch(self, verification_key, inputs_list, proofs):
        from .verifier import groth16_verify_batch
        return groth16_verify_batch(verification_key, inputs_list, proofs,
                                    curve="bls12381")
