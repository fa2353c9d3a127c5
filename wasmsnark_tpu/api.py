"""Top-level runtime constructors (reference API parity: index.js:20-22).

The reference exposes async builders because WASM compilation is async; here
construction is synchronous (JAX compiles lazily on first call), but we keep
the same three entry points and method names so a wasmsnark user can map 1:1:

    reference                         wasmsnark_tpu
    ---------                         -------------
    await buildBn128()                build_bn128()
    bn128.groth16GenProof(w, pk)      rt.groth16_gen_proof(witness, pkey)
    bn128.groth16Verify(vk, in, prf)  rt.groth16_verify(vk, inputs, proof)
    await buildF1(q)                  build_f1(q)
    await buildMnt6753()              build_mnt6753()
"""

from __future__ import annotations


def build_bn128():
    from .groth16.runtime import Bn128Runtime
    return Bn128Runtime()


def build_f1(q: int):
    from .fields.runtime import F1Runtime
    return F1Runtime(q)


def build_mnt6753():
    from .models.mnt6753_runtime import Mnt6753Runtime
    return Mnt6753Runtime()


def build_bls12381():
    """BLS12-381 runtime: the assembled curve module (field/curve/pairing,
    attribute passthrough) plus a full Groth16 prove/verify surface — a
    capability the reference stops short of (it builds the bls12381 WASM
    module but wires no prover, SURVEY.md §2.2)."""
    from .groth16.runtime import Bls12381Runtime
    return Bls12381Runtime()
