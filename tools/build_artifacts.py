"""Build the committed program-artifact bundle for the multichip dryrun.

The reference's build step writes generated WASM into build/*_wasm.js
(tools/buildwasm_bn128.js:8-29) so production never regenerates code.
This is the same step for the TPU framework: trace + lower the sharded
prover programs ONCE on the target host class and serialize them with
jax.export into build/dryrun/.  __graft_entry__.dryrun_multichip then
deserializes instead of tracing (~90 s of Python tracing + StableHLO
lowering per process skipped); the persistent XLA cache covers the
backend compile.

Run (same env the driver uses for the dryrun):

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python tools/build_artifacts.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Same env as the driver's dryrun: CPU backend, 8 virtual devices, and the
# ISA cap that keeps persistent-cache entries loadable (see __graft_entry__).
# On axon-tunnel machines the sitecustomize registers AND config-pins the
# TPU at interpreter start, so in-process env edits are ignored — re-exec
# once with a cleaned environment (otherwise the bundle is built with
# platform=axon and the CPU dryrun rejects it, silently re-tracing: the
# round-4 MULTICHIP 3m37s recompile).
if os.environ.get("PALLAS_AXON_POOL_IPS") \
        or os.environ.get("JAX_PLATFORMS", "cpu") != "cpu":
    _env = dict(os.environ)
    _env.pop("PALLAS_AXON_POOL_IPS", None)
    _env["JAX_PLATFORMS"] = "cpu"
    _flags = _env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
    if "xla_cpu_max_isa" not in _flags:
        _flags = (_flags + " --xla_cpu_max_isa=AVX2").strip()
    _env["XLA_FLAGS"] = _flags
    os.execve(sys.executable, [sys.executable] + sys.argv, _env)

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_max_isa" not in _flags:
    _flags = (_flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = _flags


def main(n_devices: int = 8) -> None:
    import jax

    from wasmsnark_tpu.artifacts import save_bundle
    from wasmsnark_tpu.groth16.setup import (
        setup, square_chain_circuit, square_chain_witness)
    from wasmsnark_tpu.groth16.prover import Groth16Prover
    from wasmsnark_tpu.groth16.verifier import groth16_verify
    from wasmsnark_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) >= n_devices, "need n_devices devices"
    mesh = make_mesh(n_devices, axis="points")

    # EXACTLY the dryrun problem (__graft_entry__.dryrun_multichip)
    k = 8
    r1cs = square_chain_circuit(k)
    pkey, vk, _ = setup(r1cs, seed=7, accel=False)
    wit = square_chain_witness(k, 11)

    prover = Groth16Prover(msm_window_bits=4, curve="bn128", mesh=mesh)
    prover._export_capture = {}
    t0 = time.time()
    proof = prover.prove(wit, pkey, rng=123)
    assert groth16_verify(vk, [wit[1]], proof), "artifact-build proof bad"
    d = save_bundle("dryrun", prover._export_capture)
    sizes = {n: os.path.getsize(os.path.join(d, f"{n}.hlo")) // 1024
             for n in prover._export_capture}
    print(f"bundle {d}: {sizes} KiB, built in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
