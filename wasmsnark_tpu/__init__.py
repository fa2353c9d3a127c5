"""wasmsnark_tpu — a TPU-native zkSNARK (Groth16) proving framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
iden3/wasmsnark: Montgomery field arithmetic, NTT/QAP pipeline, Pippenger
multi-exponentiation, pairings, and a Groth16 prover/verifier over BN128,
plus BLS12-381 and MNT6753 field/curve stacks — batch-vectorized over TPU
lanes and sharded over device meshes instead of hand-unrolled WASM over a
worker pool.

Public API (mirrors the reference's index.js:20-22):

    build_bn128()    -> Bn128Runtime   (groth16_gen_proof / groth16_verify)
    build_f1(q)      -> F1Runtime      (single-field arithmetic runtime)
    build_mnt6753()  -> Mnt6753Runtime (Bowe-Gabizon verifier)
"""

__version__ = "0.1.0"

from .api import build_bn128, build_f1, build_mnt6753  # noqa: F401
