#!/usr/bin/env python3
"""BN128 Groth16 end-to-end demo — the CLI analogue of the reference's
browser demo page (example/bn128/index.html + main.js, README.md:59-107):
load/create proving key + witness, push the button (here: run), show the
proof and the time it took, then verify.

Usage:
    python examples/bn128/prove_demo.py [--bits K] [--dir DIR] [--curve C]

With --dir, the pkey/witness binaries are written there on first run and
reused afterwards (the reference fetches pre-built proving_key.bin +
witness.bin the same way); without it everything stays in memory.  --bits
sets the circuit size (domain 2^K; default 10).  --curve picks bn128
(default) or bls12381 — the latter is a capability the reference never
wired (SURVEY.md §2.2).

The generated proof is checked twice:
  * with the in-framework verifier (pairing product equation), and
  * with tools/external_verifier.py — an independent plain-bigint
    implementation that shares no code with the framework.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=10,
                    help="log2 of the constraint domain (default 10)")
    ap.add_argument("--dir", default=None,
                    help="cache dir for pkey/witness/vk artifacts")
    ap.add_argument("--curve", default="bn128",
                    choices=["bn128", "bls12381"])
    ap.add_argument("--skip-external", action="store_true",
                    help="skip the independent external verifier "
                         "(pure-Python pairings; slow)")
    args = ap.parse_args()

    from wasmsnark_tpu.groth16.setup import (
        setup, square_chain_circuit, square_chain_witness)
    from wasmsnark_tpu.groth16.prover import Groth16Prover
    from wasmsnark_tpu.groth16.verifier import groth16_verify
    from wasmsnark_tpu.groth16.pkey import write_witness
    from wasmsnark_tpu.models.bn128 import R as R_BN

    if args.curve == "bls12381":
        from wasmsnark_tpu.models.bls12381 import bls12381
        module, r = bls12381(), bls12381().Fr.q
    else:
        module, r = None, R_BN

    k = (1 << args.bits) - 2  # +2 binding rows -> domain exactly 2^bits
    x = 0xC0FFEE

    # ---- setup (offline preprocessing, tools/buildpkey.js role) ----
    vk_path = args.dir and os.path.join(args.dir, f"vk_{args.curve}_{args.bits}.json")
    pk_path = args.dir and os.path.join(args.dir, f"pkey_{args.curve}_{args.bits}.bin")
    if pk_path and os.path.exists(pk_path):
        with open(pk_path, "rb") as f:
            pkey = f.read()
        with open(vk_path) as f:
            vk = json.load(f)
        print(f"loaded proving key: {pk_path} ({len(pkey)/1e6:.1f} MB)")
    else:
        t0 = time.time()
        r1cs = square_chain_circuit(k)
        pkey, vk, _ = setup(r1cs, seed=1, module=module)
        print(f"setup: 2^{args.bits} domain, {len(pkey)/1e6:.1f} MB pkey, "
              f"{time.time()-t0:.1f}s")
        if pk_path:
            os.makedirs(args.dir, exist_ok=True)
            with open(pk_path, "wb") as f:
                f.write(pkey)
            with open(vk_path, "w") as f:
                json.dump(vk, f)

    wit = square_chain_witness(k, x, r=r)
    from wasmsnark_tpu.models.bn128 import bn128
    fr_spec = (module or bn128()).fr_spec
    witness_bin = write_witness(wit, fr_spec)

    # ---- prove (the reference demo's button handler) ----
    prover = Groth16Prover(curve=args.curve)
    t0 = time.time()
    proof = prover.prove(witness_bin, pkey)
    first = time.time() - t0
    t0 = time.time()
    proof = prover.prove(witness_bin, pkey)
    steady = time.time() - t0
    print(f"Time to compute the zk proof: {steady*1000:.0f} ms "
          f"(first call incl. compile: {first:.1f} s)")
    print(json.dumps(proof, indent=1)[:400] + " ...")

    # ---- verify ----
    public = [wit[1]]
    ok = groth16_verify(vk, public, proof, curve=args.curve)
    print(f"framework verifier: {'OK' if ok else 'INVALID'}")
    if not ok:
        return 1

    if args.curve == "bn128" and not args.skip_external:
        sys.path.insert(0, os.path.join(
            os.path.dirname(__file__), "..", "..", "tools"))
        from external_verifier import groth16_verify_external
        t0 = time.time()
        ok2 = groth16_verify_external(vk, [str(p) for p in public], proof)
        print(f"external (independent) verifier: "
              f"{'OK' if ok2 else 'INVALID'} ({time.time()-t0:.1f}s)")
        if not ok2:
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
