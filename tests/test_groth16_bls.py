"""Groth16 over BLS12-381 — a capability the reference stops short of.

The reference builds the complete bls12381 WASM module (field/curve/FFT/
multiexp/pairing, src/bls12381/build_bls12381.js) but wires no prover
orchestrator for it (SURVEY.md §2.2).  Our Groth16 pipeline is curve-generic
(every kernel is specialized by FieldSpec), so setup/prove/verify work over
BLS12-381 unchanged; these tests pin that wiring end-to-end.
"""

import os

import pytest

import wasmsnark_tpu
from wasmsnark_tpu.groth16.setup import (
    square_chain_circuit, square_chain_witness, setup)
from wasmsnark_tpu.groth16.pkey import (
    write_witness, parse_pkey, read_witness)
from wasmsnark_tpu.models.bls12381 import bls12381, R


@pytest.fixture(scope="module")
def rt():
    return wasmsnark_tpu.build_bls12381()


def test_runtime_passthrough(rt):
    # the runtime doubles as the assembled curve module (reference parity:
    # buildBls12381 returns the module object)
    assert rt.module.F1.q == rt.F1.q
    g = rt.G1.times_scalar(rt.g1_gen, 7)
    assert not rt.G1.is_zero(g)


def test_pkey_roundtrip_48_byte_elements():
    m = bls12381()
    r1cs = square_chain_circuit(2)
    pkey, vk, _ = setup(r1cs, seed=3, module=m)
    pk = parse_pkey(pkey, m.fp_spec, m.fr_spec)
    assert pk.n_signals == r1cs.n_signals
    assert pk.domain_size == 4
    # alfa1 must be on the BLS curve y^2 = x^3 + 4
    x, y = pk.alfa1
    assert (y * y - (x ** 3 + 4)) % m.F1.q == 0
    # G2 beta2 on the twist y^2 = x^3 + 4(1+u)
    F2 = m.F2
    bx, by = pk.beta2
    lhs = F2.square(by)
    rhs = F2.add(F2.mul(F2.square(bx), bx), (4, 4))
    assert F2.eq(lhs, rhs)


def test_witness_roundtrip():
    m = bls12381()
    wit = square_chain_witness(2, 9, r=R)
    data = write_witness(wit, m.fr_spec)
    arr = read_witness(data, m.fr_spec)
    from wasmsnark_tpu.utils.serialize import limbs_to_ints
    assert limbs_to_ints(arr) == [v % R for v in wit]


@pytest.mark.skipif(os.environ.get("WASMSNARK_TPU_SLOW_TESTS") != "1",
                    reason="full BLS prover compile ~8 min on CPU; the "
                           "pipeline is curve-generic and the BN128 e2e "
                           "prove covers it in the default tier")
def test_prove_and_verify_bls(rt):
    m = bls12381()
    r1cs = square_chain_circuit(3)
    pkey, vk, _ = setup(r1cs, seed=1, module=m)
    wit = square_chain_witness(3, 5, r=R)
    proof = rt.groth16_gen_proof(write_witness(wit, m.fr_spec), pkey, rng=7)
    pub = [str(wit[1])]
    assert rt.groth16_verify(vk, pub, proof) is True
    # tampered proof must fail
    import json
    bad = json.loads(json.dumps(proof))
    bad["pi_a"][0] = str(int(bad["pi_a"][0]) + 1)
    assert rt.groth16_verify(vk, pub, bad) is False
    # invalid witness -> proof must not verify
    badw = list(wit)
    badw[3] += 1
    pbad = rt.groth16_gen_proof(write_witness(badw, m.fr_spec), pkey, rng=7)
    assert rt.groth16_verify(vk, pub, pbad) is False
