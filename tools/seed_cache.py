"""Publish XLA persistent-cache entries as committed build artifacts.

The reference commits its generated WASM (build/*_wasm.js,
tools/buildwasm_bn128.js:8-29) so production never regenerates code; this
framework's equivalent heavy "build" step is the XLA backend compile of the
big jitted programs (the 2^20 MSM alone is a ~15-minute compile on a
1-vCPU host).  This tool copies the current .jax_cache entries into
build/xla_cache/, which wasmsnark_tpu/__init__.py seeds back into the
process cache on import — a fresh machine then runs the default bench and
dryrun shapes with zero backend compiles.

Usage:
    python tools/seed_cache.py [--min-mb 0.5] [--max-total-mb 600]

Run it AFTER executing the programs to publish (e.g. `python bench.py`) on
the target device class; entries are keyed by program fingerprint + device
kind, so TPU entries only hit on the same TPU generation.
"""

import argparse
import os
import shutil

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-mb", type=float, default=0.0,
                    help="skip entries smaller than this (cheap recompiles)")
    ap.add_argument("--max-total-mb", type=float, default=600.0,
                    help="abort if the published set would exceed this")
    ap.add_argument("--src", default=os.path.join(ROOT, ".jax_cache"))
    ap.add_argument("--dst", default=os.path.join(ROOT, "build", "xla_cache"))
    args = ap.parse_args()

    names = sorted(os.listdir(args.src))
    picked = [n for n in names
              if os.path.getsize(os.path.join(args.src, n))
              >= args.min_mb * 1e6]
    total = sum(os.path.getsize(os.path.join(args.src, n)) for n in picked)
    if total > args.max_total_mb * 1e6:
        raise SystemExit(
            f"refusing: {total/1e6:.0f} MB > --max-total-mb "
            f"{args.max_total_mb:.0f} (prune .jax_cache first)")
    os.makedirs(args.dst, exist_ok=True)
    for n in picked:
        dst = os.path.join(args.dst, n)
        if not (os.path.exists(dst)
                and os.path.getsize(dst)
                == os.path.getsize(os.path.join(args.src, n))):
            shutil.copy2(os.path.join(args.src, n), dst)
        print(f"{os.path.getsize(dst)/1e6:8.1f} MB  {n}")
    print(f"published {len(picked)} entries, {total/1e6:.0f} MB -> {args.dst}")


if __name__ == "__main__":
    main()
