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
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

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
