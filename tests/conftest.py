"""Test configuration: force a virtual 8-device CPU mesh.

Must run before the first `import jax` anywhere in the test process, so the
env mutation lives at conftest import time.  Sharding tests then see 8
devices; kernel tests run on the CPU backend with identical uint32 semantics
to TPU.
"""

import os

# Default to the CPU backend with an 8-device virtual mesh; an ambient
# JAX_PLATFORMS (e.g. the axon TPU plugin on dev machines) is honored so
# the suite runs on the fastest available backend — kernel semantics are
# identical (uint32 lanes) and the device-count-gated sharding tests
# skip themselves on single-chip platforms (the driver's
# dryrun_multichip covers the sharded path on the virtual mesh).
# WASMSNARK_TPU_TEST_BACKEND forces a specific backend either way.
if "WASMSNARK_TPU_TEST_BACKEND" in os.environ:
    os.environ["JAX_PLATFORMS"] = os.environ["WASMSNARK_TPU_TEST_BACKEND"]
    # chip tier: a real accelerator backend compiles the heavy composed
    # programs in minutes, so the SLOW set (production window c=16 MSM,
    # BLS12-381 e2e, composed device pairings, external interop, 2^20/2^21
    # scale runs) is enabled automatically — one command exercises the
    # production configuration:
    #     WASMSNARK_TPU_TEST_BACKEND=axon python -m pytest tests/ -q
    if os.environ["JAX_PLATFORMS"] not in ("cpu",):
        os.environ.setdefault("WASMSNARK_TPU_SLOW_TESTS", "1")
else:
    # default tier runs on CPU: fast, parallel-safe, and does not contend
    # for the single tunneled TPU (the axon sitecustomize hook force-selects
    # the TPU whenever PALLAS_AXON_POOL_IPS is set, overriding
    # JAX_PLATFORMS — clear it so "cpu" really means cpu)
    os.environ["JAX_PLATFORMS"] = "cpu"
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# Cap the CPU codegen ISA: without this, XLA:CPU embeds tuning
# pseudo-features (+prefer-no-scatter/+prefer-no-gather) in persistent-cache
# entries that the AOT loader's host-feature check then rejects — every test
# process recompiles everything.  AVX2 entries round-trip cleanly, making
# the .jax_cache actually deliver its no-recompile guarantee on CPU.
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu") \
        and "xla_cpu_max_isa" not in flags:
    flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = flags

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    # The axon sitecustomize registers AND config-pins the tunneled TPU at
    # interpreter start (before conftest can run), so the env pop above is
    # not enough on axon-tunnel machines: jax.config wins over JAX_PLATFORMS.
    # Re-assert cpu through the config — this must happen before the first
    # backend init, which is why jax is imported right here.
    import jax
    jax.config.update("jax_platforms", "cpu")

import random  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _seed():
    random.seed(12345)


def gen_values(q: int, n_random: int = 24):
    """Adversarial value grid (port of test/helpers/helpers.js:3-24): 0, 1,
    2, q-1, q-2, (q-1)/2 +- 1, and 2^k +- {2,1,0} at every 16-bit boundary,
    plus uniform randoms."""
    vs = [0, 1, 2, q - 1, q - 2, q // 2, q // 2 + 1]
    for k in range(16, q.bit_length(), 16):
        for d in (-2, -1, 0, 1, 2):
            v = (1 << k) + d
            if 0 <= v < q:
                vs.append(v)
    vs += [random.randrange(q) for _ in range(n_random)]
    return vs
