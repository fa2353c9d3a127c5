"""Production-scale end-to-end Groth16: setup -> prove -> verify at 2^BITS.

The reference's e2e evidence is a real multi-MB pkey prove
(test/bn128_prover.js:50-78, blobs stripped from this snapshot); this is
the framework's equivalent at a chosen domain size, with every stage timed
and peak host RSS recorded:

  1. trusted setup on the device fixed-base engine (5 point sections),
  2. first + steady-state prove (device-resident pkey across calls),
  3. oracle verification (host bigint),
  4. independent external verification (tools/external_verifier.py —
     shares no code with the framework).

Usage:
    python tools/prove_scale.py [bits=20] [window=auto]

Env: PROVE_SCALE_STEADY=0 skips the second prove (halves wall time when
only the cold number is wanted).  Prints one JSON line.
"""

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(bits: int = 20, window: int | None = None) -> int:
    out = {"bits": bits}
    t_all = time.time()
    import jax
    out["device"] = str(jax.devices()[0])

    from wasmsnark_tpu.groth16.setup import (
        setup, square_chain_circuit, square_chain_witness)
    from wasmsnark_tpu.groth16.prover import Groth16Prover
    from wasmsnark_tpu.groth16.verifier import groth16_verify
    from wasmsnark_tpu.models.bn128 import bn128

    m = bn128()
    k = (1 << bits) - 2   # + 2 binding rows -> domain exactly 2^bits
    t0 = time.time()
    r1cs = square_chain_circuit(k)
    out["r1cs_seconds"] = round(time.time() - t0, 1)
    t0 = time.time()
    pkey, vk, _ = setup(r1cs, seed=3)
    out["setup_seconds"] = round(time.time() - t0, 1)
    out["pkey_mb"] = round(len(pkey) / 1e6, 1)
    wit = square_chain_witness(k, 0xABCDEF, r=m.Fr.q)

    prover = Groth16Prover(msm_window_bits=window)
    t0 = time.time()
    proof = prover.prove(wit, pkey, rng=42)
    out["prove_first_seconds"] = round(time.time() - t0, 1)
    if os.environ.get("PROVE_SCALE_STEADY", "1") != "0":
        t0 = time.time()
        proof = prover.prove(wit, pkey, rng=43)
        out["prove_steady_seconds"] = round(time.time() - t0, 2)

    t0 = time.time()
    ok = groth16_verify(vk, [wit[1]], proof)
    out["oracle_verify_seconds"] = round(time.time() - t0, 2)
    out["oracle_verified"] = bool(ok)

    from external_verifier import groth16_verify_external
    t0 = time.time()
    ok2 = groth16_verify_external(vk, [str(wit[1])], proof)
    out["external_verify_seconds"] = round(time.time() - t0, 2)
    out["external_verified"] = bool(ok2)

    out["peak_rss_gb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2)
    out["total_seconds"] = round(time.time() - t_all, 1)
    out["ok"] = bool(ok and ok2)
    print(json.dumps(out))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    bits = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    window = int(sys.argv[2]) if len(sys.argv) > 2 else None
    sys.exit(main(bits, window))
