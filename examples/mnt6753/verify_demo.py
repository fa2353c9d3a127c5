#!/usr/bin/env python3
"""MNT6753 Bowe-Gabizon verifier demo — the CLI analogue of the reference's
example/mnt6753/index.html + verifier.js page, which A/B-tests a reference
verifier against the WASM implementation on Coda-generated test vectors.

Here the A/B test is host-oracle vs device:
  * verify_sync — pure-host bigint path (the reference verifySync);
  * verify / verify_fused — the batched device programs (worker-pool DAG
    analogue, src/mnt6753.js:944-1087 / :779-941).

Usage:
    python examples/mnt6753/verify_demo.py [vector.json ...] [--device]

Without arguments it looks for the Coda test vectors in the reference
checkout (/root/reference/test/data).  --device also runs the device path
(first call pays the pairing-engine compile).
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

REF_DATA = "/root/reference/test/data"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("vectors", nargs="*",
                    help="verifier test-vector JSON files "
                         "(default: the Coda vectors in the reference repo)")
    ap.add_argument("--device", action="store_true",
                    help="also run the batched device verifier")
    args = ap.parse_args()

    paths = args.vectors or sorted(
        glob.glob(os.path.join(REF_DATA, "mnt6753verifier_testvector*.json")))
    if not paths:
        print("no test vectors found; pass paths explicitly")
        return 2

    from wasmsnark_tpu.models.mnt6753_runtime import Mnt6753Runtime
    rt = Mnt6753Runtime()

    rc = 0
    for path in paths:
        with open(path) as f:
            tv = json.load(f)
        t0 = time.time()
        ok = rt.verify_sync(tv["verificationKey"], tv["input"], tv["proof"])
        dt = time.time() - t0
        print(f"{os.path.basename(path)}: host verify_sync -> "
              f"{'OK' if ok else 'INVALID'} ({dt:.2f}s)")
        rc |= 0 if ok else 1

    if args.device:
        with open(paths[0]) as f:
            tv = json.load(f)
        n = 4  # batch the same proof to show lane amortization
        t0 = time.time()
        got = rt.bowe_gabizon_verify_batch(
            tv["verificationKey"], [tv["input"]] * n, [tv["proof"]] * n)
        first = time.time() - t0
        t0 = time.time()
        got = rt.bowe_gabizon_verify_batch(
            tv["verificationKey"], [tv["input"]] * n, [tv["proof"]] * n)
        steady = time.time() - t0
        print(f"device batch-{n} verify (fused Miller): {got} "
              f"({steady:.2f}s steady, {steady/n:.2f}s/proof; "
              f"first call incl. compile {first:.0f}s)")
        rc |= 0 if all(got) else 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
