"""MNT6753 oracle tests — the capability set of test/mnt6753.js and
test/mnt6753_verifier.js: projective group laws, r*G = 0, pairing
bilinearity, Pedersen hash, group map, and the Bowe-Gabizon verifier on the
Coda-produced test vectors."""

import json
import os

import pytest

from wasmsnark_tpu.models.mnt6753 import mnt6753, Q, R
from wasmsnark_tpu.models.mnt6753_runtime import Mnt6753Runtime

REF_DATA = "/root/reference/test/data"


@pytest.fixture(scope="module")
def m():
    return mnt6753()


def test_g1_group_law(m):
    g = m.g1_gen
    # add vs double consistency (test/mnt6753.js pattern)
    assert m.G1.eq(m.G1.add(g, g), m.G1.double(g))
    g3a = m.G1.add(m.G1.double(g), g)
    g3b = m.G1.times_scalar(g, 3)
    assert m.G1.eq(g3a, g3b)
    # mixed add with affine second operand
    assert m.G1.eq(m.G1.add(m.G1.double(g), m.G1.affine(g)), g3a)


def test_g1_order(m):
    assert m.G1.is_zero(m.G1.times_scalar(m.g1_gen, R))


def test_g2_group_law_and_order(m):
    g = m.g2_gen
    assert m.G2.eq(m.G2.add(g, g), m.G2.double(g))
    assert m.G2.is_zero(m.G2.times_scalar(g, R))


def test_naf_ladder_matches_plain(m):
    # NAF ladder (build_timesscalarnaf.js) == plain ladder semantics
    g = m.g1_gen
    for s in [1, 2, 3, 7, 0xDEADBEEF, R - 1]:
        r1 = m.G1.times_scalar(g, s)
        # compute via binary ladder on the oracle
        r2 = m.G1.zero()
        for bit in bin(s)[2:]:
            r2 = m.G1.double(r2)
            if bit == "1":
                r2 = m.G1.add(r2, g)
        assert m.G1.eq(r1, r2)


def test_pairing_bilinearity(m):
    # e(aP, Q) == e(P, aQ) == e(P, Q)^a (test/mnt6753.js:421-541 pattern)
    a = 10
    e1 = m.pairing(m.G1.times_scalar(m.g1_gen, a), m.g2_gen)
    e2 = m.pairing(m.g1_gen, m.G2.times_scalar(m.g2_gen, a))
    assert m.F6.eq(e1, e2)
    e3 = m.F6.exp(m.pairing(m.g1_gen, m.g2_gen), a)
    assert m.F6.eq(e1, e3)
    assert not m.F6.eq(e1, m.F6.one())


def test_pairing_product_equation(m):
    # e(P, Q) * e(-P, Q) == 1
    assert m.pairing_eq([(m.g1_gen, m.g2_gen), (m.G1.neg(m.g1_gen), m.g2_gen)])


def test_group_map_lands_on_curve(m):
    from wasmsnark_tpu.models.mnt6753_constants import A, B
    for t in [1, 2, 12345, Q - 7]:
        p = m.group_map(t)
        x, y = p[0], p[1]
        assert (y * y - (x ** 3 + A * x + B)) % Q == 0


def test_pedersen_hash_zero_bits(m):
    # all-zero bits: every window adds 1*Base_k -> deterministic nonzero x
    x1 = m.pedersen_hash([0] * 9)
    x2 = m.pedersen_hash([0] * 9)
    assert x1 == x2
    assert 0 < x1 < Q
    # different input -> different hash
    assert m.pedersen_hash([1] + [0] * 8) != x1


def test_pedersen_chunk_boundary(m):
    # chunk-boundary sizes exercised by test/mnt6753.js:543-743 (188*3, 189*3)
    n = 188 * 3
    a = m.pedersen_hash([1, 0, 1] * 188)
    b = m.pedersen_hash([1, 0, 1] * 189)
    assert a != b


@pytest.mark.skipif(not os.path.exists(REF_DATA), reason="reference data unavailable")
@pytest.mark.parametrize("name", ["mnt6753verifier_testvector.json",
                                  "mnt6753verifier_testvector2.json"])
def test_bowe_gabizon_verifier_testvectors(name):
    """End-to-end verifier parity with the reference's committed Coda/OCaml
    test vectors (test/mnt6753_verifier.js)."""
    with open(os.path.join(REF_DATA, name)) as f:
        tv = json.load(f)
    rt = Mnt6753Runtime()
    assert rt.verify_sync(tv["verificationKey"], tv["input"], tv["proof"]) is True


@pytest.mark.skipif(not os.path.exists(REF_DATA), reason="reference data unavailable")
def test_bowe_gabizon_verifier_rejects_tampered():
    with open(os.path.join(REF_DATA, "mnt6753verifier_testvector.json")) as f:
        tv = json.load(f)
    rt = Mnt6753Runtime()
    bad = json.loads(json.dumps(tv["proof"]))
    # tamper with z.x (an OCam num [f, f, [u32...]])
    bad["z"]["x"][2][0] = (bad["z"]["x"][2][0] + 1) % (1 << 32)
    assert rt.verify_sync(tv["verificationKey"], tv["input"], bad) is False


SLOW = os.environ.get("WASMSNARK_TPU_SLOW_TESTS") == "1"


@pytest.mark.skipif(not SLOW or not os.path.exists(REF_DATA),
                    reason="MNT device pairing compile is heavy; set "
                           "WASMSNARK_TPU_SLOW_TESTS=1")
@pytest.mark.parametrize("fused", [False, True], ids=["lanes", "fused"])
def test_bowe_gabizon_device_verifier_testvectors(fused):
    """The DEVICE Bowe-Gabizon path (batched Pedersen + groupMap + 5-pair
    randomized pairing product) on both Coda vectors at once — the batch
    analogue of the reference's worker-pool verify/verifyFused
    (src/mnt6753.js:944-1087 / :779-941)."""
    tvs = []
    for name in ["mnt6753verifier_testvector.json",
                 "mnt6753verifier_testvector2.json"]:
        with open(os.path.join(REF_DATA, name)) as f:
            tvs.append(json.load(f))
    rt = Mnt6753Runtime()
    # both vectors share a verification key in-protocol? they don't need to:
    # batch per vk
    for tv in tvs:
        got = rt.bowe_gabizon_verify_batch(
            tv["verificationKey"], [tv["input"]], [tv["proof"]], fused=fused)
        assert got == [True]
    # tampered proof must fail through the device path too
    bad = json.loads(json.dumps(tvs[0]["proof"]))
    bad["z"]["x"][2][0] = (bad["z"]["x"][2][0] + 1) % (1 << 32)
    got = rt.bowe_gabizon_verify_batch(
        tvs[0]["verificationKey"],
        [tvs[0]["input"], tvs[0]["input"]],
        [tvs[0]["proof"], bad], fused=fused)
    assert got == [True, False]


@pytest.mark.skipif(not SLOW or not os.path.exists(REF_DATA),
                    reason="reference data unavailable")
def test_bowe_gabizon_device_program_traces():
    """Fast tier: the COMPOSED device verifier program (groupMap + prepared
    5-pair Miller product + final exponentiation) traces end-to-end with
    the real marshalled Coda-vector inputs — jax.eval_shape instead of
    execution, because the 48-limb XLA:CPU compile is infeasible (the SLOW
    test above and BENCH_MNT=1 execute it on a real accelerator).  Catches
    shape/structure bugs in the prepared-coefficient assembly without a
    backend compile; the Pedersen program still executes for real."""
    import jax
    import numpy as np

    with open(os.path.join(REF_DATA, "mnt6753verifier_testvector.json")) as f:
        tv = json.load(f)
    rt = Mnt6753Runtime()
    traced = {"prepare": 0, "check_fused": 0}
    jits = rt._jit  # materialize the cached_property before patching

    real_prepare = jits["prepare"]
    real_check = jits["check_fused"]

    def fake_prepare(packed):
        traced["prepare"] += 1
        return jax.eval_shape(real_prepare, packed)

    def fake_check(*args):
        traced["check_fused"] += 1
        out = jax.eval_shape(real_check, *args)
        assert out.shape == (2,), out.shape
        assert out.dtype == np.bool_ or str(out.dtype) == "bool"
        return np.zeros(out.shape, bool)

    jits["prepare"] = fake_prepare
    jits["check_fused"] = fake_check
    try:
        got = rt.bowe_gabizon_verify_batch(
            tv["verificationKey"], [tv["input"]] * 2, [tv["proof"]] * 2,
            fused=True)
    finally:
        jits["prepare"] = real_prepare
        jits["check_fused"] = real_check
    assert got == [False, False]  # fake check returns zeros
    assert traced == {"prepare": 1, "check_fused": 1}
