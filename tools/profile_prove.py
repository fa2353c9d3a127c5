"""Per-stage profile of the full Groth16 prove pipeline.

Times each device program of Groth16Prover.prove() in isolation — CALC_H,
the four padded G1 MSMs, the G2 MSM — plus the host phases (witness
marshal, pkey upload, point readback, proof assembly), so the end-to-end
prove latency can be reconciled stage by stage (the prove-side analogue of
tools/profile_msm2.py; reference dataflow: src/bn128.js:580-720).

    python tools/profile_prove.py [--bits 20] [--reps 3]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--curve", default="bn128")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from wasmsnark_tpu.groth16.setup import (
        setup, square_chain_circuit, square_chain_witness)
    from wasmsnark_tpu.groth16.prover import Groth16Prover, _module
    from wasmsnark_tpu.groth16.verifier import groth16_verify
    from wasmsnark_tpu.utils.chiptime import sync, time_reps, read_latency
    from wasmsnark_tpu.utils.serialize import ints_to_limbs

    m = _module(args.curve)
    k = (1 << args.bits) - 2
    t0 = time.time()
    r1cs = square_chain_circuit(k)
    pkey, vk, _ = setup(r1cs, seed=3,
                        module=(m if args.curve != "bn128" else None))
    print(f"setup: {time.time()-t0:.1f}s")
    wit = square_chain_witness(k, 0xABCDEF, r=m.Fr.q)

    prover = Groth16Prover(curve=args.curve)
    pk = pkey  # rebound to the parsed ProvingKey after the first prove

    # ---- host: witness marshal ----
    t0 = time.time()
    signals = ints_to_limbs([int(v) % m.Fr.q for v in wit],
                            m.fr_spec.n_limbs)
    t_marshal = time.time() - t0
    print(f"witness marshal (host):      {t_marshal*1e3:8.1f} ms")

    # ---- full prove, cold then steady (includes everything) ----
    t0 = time.time()
    proof = prover.prove(wit, pk, rng=42)
    print(f"prove cold (compile):        {time.time()-t0:8.1f} s")
    times = []
    for i in range(args.reps):
        t0 = time.time()
        proof = prover.prove(wit, pk, rng=43 + i)
        times.append(time.time() - t0)
    steady = min(times)
    print(f"prove steady (end-to-end):   {steady*1e3:8.1f} ms   "
          f"(all reps: {[round(t, 2) for t in times]})")
    ok = groth16_verify(vk, [wit[1]], proof, curve=args.curve)
    print(f"proof verified: {ok}")
    print(f"tunnel read latency:         {read_latency()*1e3:8.1f} ms")

    # ---- device stages in isolation (programs are now warm) ----
    from wasmsnark_tpu.groth16.pkey import ProvingKey
    if not isinstance(pk, ProvingKey):
        pk = prover._pk_cache[id(pkey)][1]
    dev = getattr(pk, "_device_points")
    n_pad = dev["n_pad"]
    sig_dev = jnp.asarray(signals)

    def pad_sc(s):
        if s.shape[-1] >= n_pad:
            return s
        return jnp.concatenate(
            [s, jnp.zeros(s.shape[:-1] + (n_pad - s.shape[-1],), s.dtype)],
            axis=-1)

    t = time_reps(lambda: prover.calc_h(pk, sig_dev), reps=args.reps)
    print(f"calc_h:                      {t*1e3:8.1f} ms")
    h = prover.calc_h(pk, sig_dev)
    sync(h)

    stages = [
        ("msm g1 A", lambda: prover._msm("g1", pad_sc(sig_dev),
                                         dev["points_a"])),
        ("msm g1 B1", lambda: prover._msm("g1", pad_sc(sig_dev),
                                          dev["points_b1"])),
        ("msm g2 B2", lambda: prover._msm("g2", sig_dev, dev["points_b2"])),
        ("msm g1 C", lambda: prover._msm(
            "g1", pad_sc(sig_dev[:, pk.n_public + 1:]), dev["points_c"])),
        ("msm g1 H", lambda: prover._msm("g1", pad_sc(h), dev["h_exps"])),
    ]
    total = t
    for name, fn in stages:
        t = time_reps(fn, reps=args.reps)
        total += t
        print(f"{name + ':':28s} {t*1e3:8.1f} ms")

    # ---- overlap: all 6 dispatched back-to-back, one sync ----
    def all6():
        hh = prover.calc_h(pk, sig_dev)
        outs = [fn() for _, fn in stages[:-1]]
        outs.append(prover._msm("g1", pad_sc(hh), dev["h_exps"]))
        return outs

    t_all = time_reps(all6, reps=args.reps)
    print(f"sum of stages:               {total*1e3:8.1f} ms")
    print(f"all-dispatched (overlap):    {t_all*1e3:8.1f} ms")

    # ---- host: readback + assembly ----
    outs = all6()
    t0 = time.time()
    pts = [prover._g1_host(outs[0]), prover._g1_host(outs[1])]
    del pts
    t_read = time.time() - t0
    print(f"readback 2 G1 points (host): {t_read*1e3:8.1f} ms")
    resid = steady - t_all
    print(f"residual (steady - device):  {resid*1e3:8.1f} ms   "
          f"(host marshal/readback/assembly + dispatch overhead)")


if __name__ == "__main__":
    main()
