"""Production-scale execution checks (SLOW tier: ~15 min each on one CPU
core; instant rerun on chip via the persistent cache).

The reference's production sizes are domain 2^20+ and multi-million-point
MSMs (src/bn128.js:580-720); these pin correctness at that scale:
  * a full 2^20-point G1 MSM at the production window (c=16) against a
    scalar-identity oracle (points tiled from 256 distinct multiples);
  * a 2^21 NTT/INTT roundtrip (the CALC_H pipeline's largest transform).
"""

import os
import random

import numpy as np
import pytest

SLOW = os.environ.get("WASMSNARK_TPU_SLOW_TESTS") == "1"
pytestmark = pytest.mark.skipif(
    not SLOW, reason="set WASMSNARK_TPU_SLOW_TESTS=1 (production-scale runs)")


def test_msm_2pow20_production_window():
    import jax
    import jax.numpy as jnp
    from wasmsnark_tpu.models.bn128 import bn128, R
    from wasmsnark_tpu.ops.fp import FpDevice
    from wasmsnark_tpu.ops.towers import FpAdapter
    from wasmsnark_tpu.ops.curve import JacobianDevice
    from wasmsnark_tpu.ops.msm import MSMDevice
    from wasmsnark_tpu.utils.serialize import ints_to_limbs_fast

    m = bn128()
    Fp = FpDevice(m.fp_spec)
    G1d = JacobianDevice(FpAdapter(Fp))
    random.seed(99)
    n = 1 << 20
    ks = [random.randrange(1, R) for _ in range(256)]
    base = [m.G1.affine(m.G1.times_scalar(m.g1_gen, k)) for k in ks]
    P0 = (Fp.pack_mont([p[0] for p in base]),
          Fp.pack_mont([p[1] for p in base]))
    P = tuple(jnp.tile(jnp.asarray(c), (1, n // 256)) for c in P0)
    scalars = [random.randrange(R) for _ in range(n)]
    S = jnp.asarray(ints_to_limbs_fast(scalars, 16))
    msm = MSMDevice(G1d, window_bits=16, group_windows=8)
    res = jax.jit(msm.msm_point)(S, P)
    got = tuple(Fp.unpack_mont(np.asarray(c)[:, None])[0] for c in res)
    expected_k = sum(s * ks[i % 256] for i, s in enumerate(scalars)) % R
    assert m.G1.eq(m.G1.times_scalar(m.g1_gen, expected_k), got)


def test_ntt_2pow21_roundtrip():
    import jax
    import jax.numpy as jnp
    from wasmsnark_tpu.models.bn128 import bn128
    from wasmsnark_tpu.ops.fp import FpDevice
    from wasmsnark_tpu.ops.ntt import NTTDevice

    m = bn128()
    Fr = FpDevice(m.fr_spec)
    ntt = NTTDevice(m.ntt_spec, Fr)
    rng = np.random.default_rng(3)
    n = 1 << 21
    x = rng.integers(0, 1 << 16, size=(Fr.L, n), dtype=np.uint32)
    x[-1] &= 0x0FFF  # canonical field elements (< 2^252 < r)
    x = jnp.asarray(x)
    y = jax.jit(lambda a: ntt.ifft(ntt.fft(a)))(x)
    assert bool(jnp.array_equal(x, Fr.cond_sub_q(y)))


def test_ntt_2pow22_domain_sharded_roundtrip():
    """Domain-axis-sharded 2^22 roundtrip on the virtual 8-device mesh —
    the sharded-NTT leg of the reference's scale axis (its Fr 2-adicity
    admits domains to 2^28, build_fft.js:29-34).  GSPMD inserts the
    collectives between butterfly super-stages (SURVEY.md §2.5)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from wasmsnark_tpu.models.bn128 import bn128
    from wasmsnark_tpu.ops.fp import FpDevice
    from wasmsnark_tpu.ops.ntt import NTTDevice

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = Mesh(np.array(devs[:8]), ("d",))
    sh = NamedSharding(mesh, P(None, "d"))

    m = bn128()
    Fr = FpDevice(m.fr_spec)
    ntt = NTTDevice(m.ntt_spec, Fr)
    rng = np.random.default_rng(4)
    n = 1 << 22
    x = rng.integers(0, 1 << 16, size=(Fr.L, n), dtype=np.uint32)
    x[-1] &= 0x0FFF
    xd = jax.device_put(jnp.asarray(x), sh)
    # plans as runtime inputs (baked twiddle constants at 2^22 bloat the
    # serialized program past transport/constant-folding limits)
    pf = jax.device_put(ntt.plan(22))
    pi = jax.device_put(ntt.plan(22, inverse=True))
    y = jax.jit(lambda a, f, i: ntt.ifft(ntt.fft(a, plan=f), plan=i),
                out_shardings=sh)(xd, pf, pi)
    assert bool(jnp.array_equal(jnp.asarray(x), Fr.cond_sub_q(y)))
