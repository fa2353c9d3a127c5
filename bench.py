"""Benchmark driver: BN128 proving-stack throughput on one TPU chip.

Prints ONE JSON line.  Headline metric: G1 MSM points/sec/chip at 2^20
(BASELINE.json), with the supporting sweep carried as extra keys:
Fr Montgomery-mul throughput, NTT 2^20 wall time, full Groth16 prove
latency on a 2^20-constraint circuit, and correctness checks for each
(the MSM result is verified against a host scalar-mul identity; the proof
is verified with the oracle verifier).

Baseline anchor (documented, since the reference publishes no numbers and
node.js is absent from this image — BASELINE.md):  wasmsnark's production
MSM (g1m_multiexp2, w=7; src/build_multiexp.js:583-838) performs ~52
Jacobian adds per point at ~16 Montgomery muls/add and the ~80 ns/mul
wasmsnark's own 50M-mul harness exhibits on a modern core
(test/f1.js:680-770 class hardware): ~67 us/point/core, or ~1.2e5 points/s
on the reference's default 8-worker pool (src/bn128.js:209-215).
vs_baseline = ours / 1.2e5.

Section order is evidence-first: a startup snapshot with the device lands
on stdout within seconds, the cheap Fr section provides a real measured
fallback headline within ~1 min, and only then does the (compile-heavy)
MSM section run and overwrite the headline — so a driver-side kill at ANY
point leaves a parseable JSON line (rounds 3/4 both lost their numbers to
a kill during the MSM cold compile).

Env knobs: BENCH_MSM_BITS (default 20), BENCH_WINDOW_BITS (default 16),
BENCH_PROVE_BITS (default = BENCH_MSM_BITS; 0 skips the prove section),
BENCH_SKIP_NTT / BENCH_SKIP_FR / BENCH_SKIP_MSM (set to skip sections).
"""

import json
import os
import sys
import time

import numpy as np


def _time_reps(fn, reps=3):
    """Per-call device time.  NOTE: the axon tunnel's block_until_ready
    returns at dispatch, not completion — chiptime forces a real host-read
    sync and subtracts the tunnel latency (utils/chiptime.py)."""
    from wasmsnark_tpu.utils.chiptime import time_reps
    return time_reps(fn, reps=reps)


def _module():
    """BENCH_CURVE selects the curve family (default bn128; bls12381 is the
    beyond-reference configuration — same pipeline, 24-limb field)."""
    name = os.environ.get("BENCH_CURVE", "bn128")
    if name == "bls12381":
        from wasmsnark_tpu.models.bls12381 import bls12381
        return name, bls12381()
    from wasmsnark_tpu.models.bn128 import bn128
    return name, bn128()


def bench_msm(out, snap=None):
    import jax
    import jax.numpy as jnp
    import random

    from wasmsnark_tpu.ops.fp import FpDevice
    from wasmsnark_tpu.ops.towers import FpAdapter
    from wasmsnark_tpu.ops.curve import JacobianDevice
    from wasmsnark_tpu.ops.msm import MSMDevice
    from wasmsnark_tpu.ops.fixed_base import FixedBase
    from wasmsnark_tpu.utils.serialize import ints_to_limbs_fast

    bits = int(os.environ.get("BENCH_MSM_BITS", "20"))
    wbits = int(os.environ.get("BENCH_WINDOW_BITS", "16"))
    n = 1 << bits
    snap = snap or (lambda: None)

    cname, m = _module()
    R = m.Fr.q
    Fp = FpDevice(m.fp_spec)
    G1d = JacobianDevice(FpAdapter(Fp))
    gw = os.environ.get("BENCH_GROUP_WINDOWS")
    msm = MSMDevice(G1d, window_bits=wbits,
                    group_windows=int(gw) if gw else None)

    # --- inputs: k_i * G via the fixed-base engine.  Distinct points are
    # generated for a 2^BENCH_DISTINCT_BITS base set and tiled up to n:
    # MSM cost is independent of point VALUES (the gather/sort/bucket work
    # depends only on the random scalars), while generating n fully distinct
    # points costs ~10 minutes of fixed-base work at 2^20 — which blew the
    # driver's bench budget (BENCH_r03 rc=124).  Verification stays exact:
    # expected = (sum_i s_i * k_{i mod D}) * G.
    rng = random.Random(0)
    dbits = min(bits, int(os.environ.get("BENCH_DISTINCT_BITS", "12")))
    nd = 1 << dbits
    ks = [rng.randrange(1, R) for _ in range(nd)]
    scal_ints = [rng.randrange(R) for _ in range(n)]
    from wasmsnark_tpu.utils.chiptime import sync
    out["msm_phase"] = "point_gen"
    snap()  # a driver kill during point-gen/compile still leaves a marker
    t0 = time.time()
    fb = FixedBase(G1d, m.G1, m.g1_gen, Fp.pack_mont, 16 * m.fr_spec.n_limbs)
    base_pts = jax.jit(fb.points_affine)(
        jnp.asarray(ints_to_limbs_fast(ks, 16)))
    reps = n // nd
    points = jax.tree.map(lambda a: jnp.tile(a, (1, reps)), base_pts)
    sync(points)
    gen_time = time.time() - t0
    scalars = jnp.asarray(ints_to_limbs_fast(scal_ints, 16))
    out["point_gen_seconds"] = round(gen_time, 1)
    out["msm_phase"] = "compile"
    snap()

    run = jax.jit(msm.msm_point)
    t0 = time.time()
    res = run(scalars, points)
    sync(res)
    compile_time = time.time() - t0
    out["msm_phase"] = "run"
    out["msm_compile_seconds"] = round(compile_time, 1)
    snap()

    dt = _time_reps(lambda: run(scalars, points))
    out.pop("msm_phase", None)

    # --- correctness: sum s_i * (k_{i mod D} G) == (sum s_i k_{i mod D}) G ---
    got = tuple(Fp.unpack_mont(np.asarray(c)[:, None])[0] for c in res)
    expected_k = sum(s * ks[i % nd] for i, s in enumerate(scal_ints)) % R
    expected = m.G1.times_scalar(m.g1_gen, expected_k)
    ok = bool(m.G1.eq(expected, got)) if not m.G1.is_zero(expected) \
        else bool(m.G1.is_zero(got))

    out.update({
        "metric": f"{cname.upper()} G1 MSM points/sec/chip @ 2^{bits}",
        "value": round(n / dt, 1),
        "unit": "points/s",
        "vs_baseline": round(n / dt / 1.2e5, 3),
        "msm_seconds": round(dt, 3),
        "msm_result_ok": ok,
        "window_bits": wbits,
        "distinct_points_log2": dbits,
    })
    return ok


def bench_ntt(out):
    import jax
    import jax.numpy as jnp
    from wasmsnark_tpu.models.bn128 import bn128
    from wasmsnark_tpu.ops.fp import FpDevice
    from wasmsnark_tpu.ops.ntt import NTTDevice

    bits = int(os.environ.get("BENCH_NTT_BITS", "20"))
    m = bn128()
    Fr = FpDevice(m.fr_spec)
    ntt = NTTDevice(m.ntt_spec, Fr)
    rng = np.random.default_rng(1)
    x = jnp.asarray(
        rng.integers(0, 1 << 16, size=(m.fr_spec.n_limbs, 1 << bits),
                     dtype=np.uint32))
    from wasmsnark_tpu.utils.chiptime import sync
    # plan as a runtime input: baked-constant twiddles at 2^22+ serialize
    # to hundreds of MB of MLIR (HTTP 413 on the remote-compile tunnel)
    plan = jax.device_put(ntt.plan(bits))
    fwd = jax.jit(lambda a, p: ntt.fft(a, plan=p))
    t0 = time.time()
    sync(fwd(x, plan))
    compile_t = time.time() - t0
    dt = _time_reps(lambda: fwd(x, plan))
    out.update({
        f"ntt_2^{bits}_seconds": round(dt, 4),
        "ntt_compile_seconds": round(compile_t, 1),
    })


def bench_fr_mul(out):
    import jax
    import jax.numpy as jnp
    from wasmsnark_tpu.models.bn128 import bn128
    from wasmsnark_tpu.ops.fp import FpDevice

    m = bn128()
    Fr = FpDevice(m.fr_spec)
    B = 1 << 20
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.integers(0, 1 << 16, size=(Fr.L, B), dtype=np.uint32))
    CH = 16

    @jax.jit
    def chain(x):
        for _ in range(CH):
            x = Fr.mont_mul(x, x)
        return x

    dt = _time_reps(lambda: chain(x))
    out["fr_mont_mul_per_sec"] = round(CH * B / dt, 0)
    if out.get("unit") in (None, "startup"):
        # Fallback headline until the MSM section overwrites it: a driver
        # kill mid-MSM-compile still leaves a real measured metric (the
        # round-3/4 lesson).  Anchor: wasmsnark's ~80 ns/mul 50M-loop
        # (test/f1.js:680-770) x 8 workers = 1e8 muls/s.
        out.update({
            "metric": "BN128 Fr Montgomery mul/sec/chip (MSM pending)",
            "value": out["fr_mont_mul_per_sec"],
            "unit": "mul/s",
            "vs_baseline": round(CH * B / dt / 1e8, 2),
        })


def bench_prove(out):
    import jax
    from wasmsnark_tpu.groth16.setup import (
        setup, square_chain_circuit, square_chain_witness)
    from wasmsnark_tpu.groth16.prover import Groth16Prover
    from wasmsnark_tpu.groth16.verifier import groth16_verify

    bits = int(os.environ.get(
        "BENCH_PROVE_BITS", os.environ.get("BENCH_MSM_BITS", "20")))
    if bits == 0:
        return True
    cname, m = _module()
    k = (1 << bits) - 2  # constraints + 2 binding rows -> domain exactly 2^bits
    t0 = time.time()
    r1cs = square_chain_circuit(k)
    pkey, vk, _ = setup(r1cs, seed=3,
                        module=(m if cname != "bn128" else None))
    setup_t = time.time() - t0
    wit = square_chain_witness(k, 0xABCDEF, r=m.Fr.q)

    prover = Groth16Prover(curve=cname)
    t0 = time.time()
    proof = prover.prove(wit, pkey, rng=42)
    first = time.time() - t0
    t0 = time.time()
    proof = prover.prove(wit, pkey, rng=43)
    steady = time.time() - t0
    ok = groth16_verify(vk, [wit[1]], proof, curve=cname)
    out.update({
        f"prove_2^{bits}_seconds": round(steady, 2),
        "prove_first_call_seconds": round(first, 1),
        "setup_seconds": round(setup_t, 1),
        "proof_verified": bool(ok),
    })
    return bool(ok)


def bench_pairing(out):
    """Single BN128 pairing latency + batched verification throughput
    (the test/bn128.js:389-395 'time to compute a single pairing' point and
    the production batched-verify path).  Opt-in: BENCH_PAIRING=1 — the
    pairing engine's first compile is large; the persistent cache makes
    reruns cheap."""
    import jax
    from wasmsnark_tpu.ops.pairing import bn128_pairing_device
    pd = bn128_pairing_device()
    m = pd.m
    p1 = m.G1.affine(m.G1.times_scalar(m.g1_gen, 7))
    q1 = m.G2.affine(m.G2.times_scalar(m.g2_gen, 9))

    def one(g1, g2):
        return pd.final_exponentiation(pd.miller_loop(g1, g2))

    run = jax.jit(one)
    g1 = pd.pack_g1([(p1[0], p1[1])])
    g2 = pd.pack_g2([(q1[0], q1[1])])
    from wasmsnark_tpu.utils.chiptime import sync
    t0 = time.time()
    e = run(g1, g2)
    sync(e)
    out["pairing_compile_seconds"] = round(time.time() - t0, 1)
    dt = _time_reps(lambda: run(g1, g2))
    out["pairing_single_ms"] = round(dt * 1e3, 1)
    # correctness: e(7G1, 9G2) == e(G1, G2)^63
    exp = m.final_exponentiation(m.miller_loop(
        m.G1.affine(m.g1_gen)[:2], m.G2.affine(m.g2_gen)[:2]))
    exp = m.F12.exp(exp, 63)
    out["pairing_ok"] = bool(pd.unpack_f12(e)[0] == exp)
    # batched: 64 pairings in lanes
    B = 64
    g1b = pd.pack_g1([(p1[0], p1[1])] * B)
    g2b = pd.pack_g2([(q1[0], q1[1])] * B)
    sync(run(g1b, g2b))
    dt = _time_reps(lambda: run(g1b, g2b))
    out["pairing_batch64_per_sec"] = round(B / dt, 1)
    return out["pairing_ok"]


def bench_verify_batch(out):
    """Steady-state batched Groth16 verification (the verification-server
    configuration): N proofs per call through the device pairing with the
    vk's three fixed G2 ladders riding the prepared-coefficient cache
    (prepareG2 pattern, build_bn128.js:459-575).  Opt-in: BENCH_VERIFY=1;
    needs the committed reference proof."""
    ref = "/root/reference/test/data"
    if not os.path.exists(f"{ref}/proof_good.json"):
        return True
    import json as _json
    from wasmsnark_tpu.groth16.verifier import groth16_verify_batch
    vk = _json.load(open(f"{ref}/verification_key.json"))
    pub = _json.load(open(f"{ref}/public.json"))
    proof = _json.load(open(f"{ref}/proof_good.json"))
    B = int(os.environ.get("BENCH_VERIFY_BATCH", "16"))
    t0 = time.time()
    got = groth16_verify_batch(vk, [pub] * B, [proof] * B)
    out["verify_batch_compile_seconds"] = round(time.time() - t0, 1)
    t0 = time.time()
    got = groth16_verify_batch(vk, [pub] * B, [proof] * B)
    dt = time.time() - t0
    out[f"verify_batch{B}_seconds"] = round(dt, 3)
    out["verify_batch_proofs_per_sec"] = round(B / dt, 1)
    out["verify_batch_ok"] = bool(all(got))
    return out["verify_batch_ok"]


def bench_mnt_verify(out):
    """MNT6753 Bowe-Gabizon verification: host-oracle latency vs the batched
    device path (BASELINE.md MNT row).  Opt-in: BENCH_MNT=1; needs the
    reference's Coda test vector."""
    path = "/root/reference/test/data/mnt6753verifier_testvector.json"
    if not os.path.exists(path):
        return True
    import json as _json
    from wasmsnark_tpu.models.mnt6753_runtime import Mnt6753Runtime
    with open(path) as f:
        tv = _json.load(f)
    rt = Mnt6753Runtime()
    t0 = time.time()
    ok_host = rt.verify_sync(tv["verificationKey"], tv["input"], tv["proof"])
    out["mnt_verify_host_seconds"] = round(time.time() - t0, 2)
    B = int(os.environ.get("BENCH_MNT_BATCH", "16"))
    # one tampered lane (a.x limb flipped) must REJECT while the rest
    # accept — the device path must discriminate, not rubber-stamp
    bad = _json.loads(_json.dumps(tv["proof"]))
    bad["a"]["x"][2][0] ^= 1
    proofs = [tv["proof"]] * (B - 1) + [bad]
    t0 = time.time()
    got = rt.bowe_gabizon_verify_batch(
        tv["verificationKey"], [tv["input"]] * B, proofs)
    out["mnt_verify_device_compile_seconds"] = round(time.time() - t0, 1)
    t0 = time.time()
    got = rt.bowe_gabizon_verify_batch(
        tv["verificationKey"], [tv["input"]] * B, proofs)
    dt = time.time() - t0
    out[f"mnt_verify_device_batch{B}_seconds"] = round(dt, 2)
    out["mnt_verify_device_per_proof_seconds"] = round(dt / B, 3)
    out["mnt_verify_tampered_rejected"] = bool(not got[-1])
    out["mnt_verify_ok"] = bool(
        ok_host and all(got[:-1]) and not got[-1])
    return out["mnt_verify_ok"]


def _init_backend():
    """Initialize the JAX backend, falling back to CPU if the preferred
    backend (e.g. the axon TPU tunnel) is unavailable.  Returns
    (devices, fallback_note or None).  Never raises: an outage must still
    yield one parseable JSON line (round-2 lesson: BENCH_r02 recorded a raw
    traceback and rc=1 when the TPU pool was down)."""
    import jax
    try:
        return jax.devices(), None
    except Exception as e:  # backend init failed — retry on host CPU
        note = f"{type(e).__name__}: {e}"
        try:
            os.environ["JAX_PLATFORMS"] = "cpu"
            os.environ.pop("PALLAS_AXON_POOL_IPS", None)
            jax.config.update("jax_platforms", "cpu")
            return jax.devices("cpu"), note
        except Exception as e2:
            raise RuntimeError(f"{note}; cpu fallback: {e2}") from e2


def _note(msg):
    """Progress marker on stderr (stdout is reserved for the JSON
    lines); timestamps let an operator see which section a long run is in."""
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


_T0 = time.time()


def _snapshot(out, ok):
    """Print the current results as one complete JSON line after every
    section, so a driver-side `timeout` kill still leaves the latest
    parseable line on stdout (round-3 lesson: BENCH_r03 rc=124 recorded
    parsed:null because the single final print never ran).  Each snapshot
    supersedes the previous; the final one carries the verdict."""
    out["all_checks_ok"] = bool(ok)
    out["elapsed_seconds"] = round(time.time() - _T0, 1)
    print(json.dumps(out), flush=True)


def _deadline_left():
    """Seconds remaining in the global bench budget (BENCH_DEADLINE_S,
    default 520 — under the driver's kill timeout; the evidence-first
    section order means a kill never loses already-printed numbers)."""
    return float(os.environ.get("BENCH_DEADLINE_S", "520")) - (time.time() - _T0)


def main():
    out = {}
    ok = True
    try:
        _note("backend init")
        devices, backend_error = _init_backend()
        out["device"] = str(devices[0])
        out.update({"metric": "bench startup (no section completed)",
                    "value": 0, "unit": "startup", "vs_baseline": 0})
        if backend_error is not None:
            out["backend_error"] = backend_error
            out["backend_fallback"] = "cpu"
            # CPU can't finish the 2^20 production shapes in bench budget;
            # scale down so the outage round still records real numbers.
            os.environ.setdefault("BENCH_MSM_BITS", "14")
            os.environ.setdefault("BENCH_NTT_BITS", "14")
            os.environ.setdefault("BENCH_PROVE_BITS", "0")
        _snapshot(out, ok)  # first parseable line within seconds of start
        # Sections: the cheap Fr section runs FIRST so a real measured
        # metric lands on stdout within ~1 min even if the MSM section is
        # later killed mid-compile (round-3/4 lesson: two null driver
        # benches).  The MSM section then overwrites the headline.  Each
        # section is exception-isolated: one failure must not cost the
        # others their numbers.
        sections = [
            ("fr", "BENCH_SKIP_FR", 0, bench_fr_mul),
            ("msm", "BENCH_SKIP_MSM", 60,
             lambda o: bench_msm(o, snap=lambda: _snapshot(o, ok))),
            ("ntt", "BENCH_SKIP_NTT", 60, bench_ntt),
            ("prove", "BENCH_SKIP_PROVE", 230, bench_prove),
        ]
        for name, skip_env, est_s, fn in sections:
            if os.environ.get(skip_env):
                continue
            if _deadline_left() < est_s:
                out.setdefault("sections_skipped", []).append(
                    f"{name}: deadline ({round(_deadline_left())}s left)")
                continue
            _note(f"{name} section")
            try:
                r = fn(out)
                if isinstance(r, bool):
                    ok = r and ok
            except Exception as e:
                ok = False
                out.setdefault("section_errors", {})[name] = (
                    f"{type(e).__name__}: {e}"[:300])
            _snapshot(out, ok)
        for env, label, fn in [("BENCH_PAIRING", "pairing", bench_pairing),
                               ("BENCH_VERIFY", "batched-verify", bench_verify_batch),
                               ("BENCH_MNT", "MNT verify", bench_mnt_verify)]:
            if os.environ.get(env):
                _note(f"{label} section")
                try:
                    ok = fn(out) and ok
                except Exception as e:
                    ok = False
                    out.setdefault("section_errors", {})[label] = (
                        f"{type(e).__name__}: {e}"[:300])
                _snapshot(out, ok)
        _note("done")
        _snapshot(out, ok)
        return 0 if ok else 1
    except Exception as e:
        import traceback
        out.setdefault("metric", "bench error")
        out.setdefault("value", 0)
        out.setdefault("unit", "error")
        out.setdefault("vs_baseline", 0)
        out["error"] = f"{type(e).__name__}: {e}"
        out["traceback_tail"] = traceback.format_exc().splitlines()[-3:]
        out["all_checks_ok"] = False
        print(json.dumps(out))
        return 1


if __name__ == "__main__":
    sys.exit(main())
