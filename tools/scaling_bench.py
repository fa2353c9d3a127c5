"""Sharded-MSM scaling measurement on the virtual CPU mesh.

Multi-chip hardware is not reachable from this box (single tunneled TPU),
so this measures what CAN be measured honestly here: the *work overhead*
of the sharded SPMD program vs the unsharded one, on a virtual
`--xla_force_host_platform_device_count` CPU mesh where every "device"
shares one physical core.  On shared cores, wall clock is proportional to
TOTAL work, so

    overhead(D)            = t_sharded(D) / t_unsharded
    projected_efficiency(D)= t_unsharded / t_sharded(D)

projected_efficiency is the scaling efficiency D real chips would see if
ICI collective latency were free (the per-device partials are ~KB, so the
collective term is negligible at MSM sizes; the real limiter is exactly
this work overhead — per-shard sort/scan fixed costs that don't shrink
with N/D).  This quantifies the §2.5 story the same way the reference's
chunk-per-worker split is bounded by per-chunk table-rebuild overhead
(src/bn128.js:353-415, src/build_multiexp.js:295-362).

    python tools/scaling_bench.py [--bits 18] [--devices 1,2,4,8]
"""

import argparse
import os
import sys
import time

# The axon sitecustomize registers + pins the tunneled TPU at interpreter
# start whenever PALLAS_AXON_POOL_IPS is set — in-process env edits come
# too late (JAX_PLATFORMS=cpu is ignored and, worse, timings become
# dispatch-only lies on the async tunnel).  Re-exec once with a cleaned
# environment, exactly like __graft_entry__.dryrun_multichip.
if os.environ.get("PALLAS_AXON_POOL_IPS"):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS")
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags += " --xla_force_host_platform_device_count=8"
    if "xla_cpu_max_isa" not in flags:
        flags += " --xla_cpu_max_isa=AVX2"
    env["XLA_FLAGS"] = flags.strip()
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=18)
    ap.add_argument("--window", type=int, default=16)
    ap.add_argument("--dbits", type=int, default=8)
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import random
    import numpy as np
    import jax
    import jax.numpy as jnp

    from wasmsnark_tpu.models.bn128 import bn128, R
    from wasmsnark_tpu.ops.fp import FpDevice
    from wasmsnark_tpu.ops.towers import FpAdapter
    from wasmsnark_tpu.ops.curve import JacobianDevice
    from wasmsnark_tpu.ops.msm import MSMDevice
    from wasmsnark_tpu.parallel.mesh import make_mesh, msm_sharded_point

    n, nd = 1 << args.bits, 1 << args.dbits
    m = bn128()
    Fp = FpDevice(m.fp_spec)
    C = JacobianDevice(FpAdapter(Fp))

    # distinct base points from the host oracle (cheap at 2^dbits), tiled
    rng = random.Random(0)
    ks = [rng.randrange(1, R) for _ in range(nd)]
    aff = [m.G1.affine(m.G1.times_scalar(m.g1_gen, k)) for k in ks]
    bx = jnp.asarray(Fp.pack_mont([p[0] for p in aff]))
    by = jnp.asarray(Fp.pack_mont([p[1] for p in aff]))
    reps = n // nd
    points = (jnp.tile(bx, (1, reps)), jnp.tile(by, (1, reps)))
    scal_ints = [rng.randrange(R) for _ in range(n)]
    from wasmsnark_tpu.utils.serialize import ints_to_limbs_fast
    scalars = jnp.asarray(ints_to_limbs_fast(scal_ints, 16))

    expected_k = sum(s * ks[i % nd] for i, s in enumerate(scal_ints)) % R
    expected = m.G1.times_scalar(m.g1_gen, expected_k)

    def check(res):
        got = tuple(Fp.unpack_mont(np.asarray(c)[:, None])[0] for c in res)
        return bool(m.G1.eq(expected, got))

    def timeit(fn):
        t0 = time.time()
        out = fn()
        jax.block_until_ready(out)
        compile_t = time.time() - t0
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            out = fn()
            jax.block_until_ready(out)
            ts.append(time.time() - t0)
        return min(ts), compile_t, out

    results = {}
    msm = MSMDevice(C, window_bits=args.window, group_windows=8)
    run1 = jax.jit(msm.msm_point)
    t1, ct, res = timeit(lambda: run1(scalars, points))
    ok = check(res)
    print(f"unsharded:        {t1:7.2f} s   (compile {ct:.0f} s, ok={ok})")
    results["unsharded"] = t1

    for d in [int(x) for x in args.devices.split(",")]:
        if d > len(jax.devices()):
            continue
        mesh = make_mesh(d)
        rund = msm_sharded_point(msm, mesh)
        td, ct, res = timeit(lambda: rund(scalars, points))
        ok = check(res)
        eff = t1 / td
        print(f"sharded D={d}:      {td:7.2f} s   (compile {ct:.0f} s, "
              f"ok={ok}, work overhead {td/t1:.2f}x, "
              f"projected efficiency {eff*100:.0f}%)")
        results[d] = td

    print("\nprojected multi-chip scaling (collectives ~free at KB sizes):")
    for d, td in results.items():
        if d == "unsharded":
            continue
        print(f"  D={d}: speedup {d * t1 / td:.2f}x of 1 chip, "
              f"efficiency {100 * t1 / td:.0f}%")


if __name__ == "__main__":
    main()
