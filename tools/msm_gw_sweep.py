"""Time msm_point at several group_windows values (tiled points, honest
sync).  Usage: python -u tools/msm_gw_sweep.py --bits 20 --sweep 8,9,17"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=20)
    ap.add_argument("--window", type=int, default=16)
    ap.add_argument("--dbits", type=int, default=12)
    ap.add_argument("--sweep", default="9,17",
                help="comma list of gw or gw:chunk_steps variants")
    ap.add_argument("--check", action="store_true",
                    help="verify each variant's result against the scalar-"
                         "product identity (host, slow-ish)")
    args = ap.parse_args()

    import random
    import time
    import jax
    import jax.numpy as jnp
    import numpy as np

    from wasmsnark_tpu.models.bn128 import bn128, R
    from wasmsnark_tpu.ops.fp import FpDevice
    from wasmsnark_tpu.ops.towers import FpAdapter
    from wasmsnark_tpu.ops.curve import JacobianDevice
    from wasmsnark_tpu.ops.msm import MSMDevice
    from wasmsnark_tpu.ops.fixed_base import FixedBase
    from wasmsnark_tpu.utils.serialize import ints_to_limbs_fast
    from wasmsnark_tpu.utils.chiptime import sync, time_reps, read_latency

    n, nd = 1 << args.bits, 1 << args.dbits
    m = bn128()
    Fp = FpDevice(m.fp_spec)
    C = JacobianDevice(FpAdapter(Fp))
    rng = random.Random(0)
    ks = [rng.randrange(1, R) for _ in range(nd)]
    scal_ints = [rng.randrange(R) for _ in range(n)]

    t0 = time.time()
    fb = FixedBase(C, m.G1, m.g1_gen, Fp.pack_mont, 16 * m.fr_spec.n_limbs)
    base = jax.jit(fb.points_affine)(jnp.asarray(ints_to_limbs_fast(ks, 16)))
    points = jax.tree.map(lambda a: jnp.tile(a, (1, n // nd)), base)
    sync(points)
    print(f"point gen+tile {time.time()-t0:.1f}s  "
          f"read latency {read_latency()*1e3:.0f} ms", flush=True)
    scalars = jnp.asarray(ints_to_limbs_fast(scal_ints, 16))

    expected = None
    if args.check:
        ek = sum(s * ks[i % nd] for i, s in enumerate(scal_ints)) % R
        expected = m.G1.affine(m.G1.times_scalar(m.g1_gen, ek))

    for spec in [x for x in args.sweep.split(",") if x]:
        gw, _, cs = spec.partition(":")
        gw, cs = int(gw), int(cs or 256)
        msm = MSMDevice(C, window_bits=args.window, group_windows=gw,
                        chunk_steps=cs)
        run = jax.jit(msm.msm_point)
        t0 = time.time()
        res = run(scalars, points)
        sync(res)
        ct = time.time() - t0
        dt = time_reps(run, scalars, points, reps=3, warm=False)
        line = (f"gw={gw:<3d} cs={cs:<4d} {dt*1e3:9.1f} ms -> "
                f"{n/dt:,.0f} points/s (compile {ct:.0f}s)")
        if expected is not None:
            got = tuple(Fp.unpack_mont(np.asarray(c)[:, None])[0]
                        for c in res)
            ok = bool(m.G1.eq(expected, got))
            line += f"  check={'OK' if ok else 'FAIL'}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
