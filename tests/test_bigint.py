"""Big-integer division / modular inversion kernels vs Python ints.

Mirrors the reference's int test surface (test/int.js: div and inverseMod
over adversarial grids) against ops/bigint.py's fixed-trip device kernels.
"""

import random

import numpy as np
import pytest

from conftest import gen_values

import jax  # noqa: E402

from wasmsnark_tpu.ops.bigint import int_div, inverse_mod  # noqa: E402
from wasmsnark_tpu.utils.serialize import ints_to_limbs_fast  # noqa: E402


def _pack(vals, n_limbs):
    """ints -> [L, B] uint32 16-bit limb planes."""
    return np.asarray(ints_to_limbs_fast(list(vals), n_limbs))


def _unpack(arr):
    arr = np.asarray(arr)
    return [sum(int(arr[i, j]) << (16 * i) for i in range(arr.shape[0]))
            for j in range(arr.shape[1])]


Q_BN = 21888242871839275222246405745257275088696311157297823662689037894645226208583


def test_int_div_grid():
    """x = q*y + r, 0 <= r < y over the adversarial grid (div contract of
    src/build_int.js:710-924)."""
    random.seed(7)
    xs, ys = [], []
    grid = gen_values(1 << 256, n_random=12)
    for x in grid[:24]:
        y = random.choice([1, 2, 3, 0xFFFF, Q_BN,
                           random.randrange(1, 1 << 128),
                           random.randrange(1, 1 << 250)])
        xs.append(x % (1 << 256))
        ys.append(y)
    # divide-by-zero lane: defined as q=0, r=x truncated to y's width
    xs.append(12345)
    ys.append(0)
    L = 16
    q, r = jax.jit(int_div)(_pack(xs, L), _pack(ys, L))
    qs, rs = _unpack(q), _unpack(r)
    for x, y, qq, rr in zip(xs, ys, qs, rs):
        if y == 0:
            assert qq == 0 and rr == x % (1 << 256)
        else:
            assert qq == x // y, (x, y)
            assert rr == x % y, (x, y)


def test_int_div_mixed_widths():
    """Dividend wider than divisor ([32 limbs] / [16 limbs])."""
    random.seed(8)
    xs = [random.randrange(1 << 500) for _ in range(6)] + [0, 1]
    ys = [random.randrange(1, 1 << 200) for _ in range(6)] + [3, 1]
    q, r = jax.jit(int_div)(_pack(xs, 32), _pack(ys, 16))
    for x, y, qq, rr in zip(xs, ys, _unpack(q), _unpack(r)):
        assert qq == x // y and rr == x % y


@pytest.mark.parametrize("m", [
    Q_BN,
    21888242871839275222246405745257275088548364400416034343698204186575808495617,
    0xFFFF_FFFB,   # small 32-bit prime
    3 * 5 * 7 * 11 * 13 * 17 * 19 * 23,  # odd composite
])
def test_inverse_mod_grid(m):
    """inverse_mod(x, m) * x = 1 (mod m) for units; 0 for non-units
    (int_inverseMod contract, src/build_int.js:926-1054)."""
    random.seed(9)
    xs = [v % m for v in gen_values(m, n_random=8)]
    xs += [m - 1, 1, 0, m + 7 if m.bit_length() < 250 else 0]
    L = 16
    inv = jax.jit(inverse_mod)(_pack(xs, L), _pack([m] * len(xs), L))
    for x, iv in zip(xs, _unpack(inv)):
        import math
        if math.gcd(x, m) == 1:
            assert (iv * x) % m == 1, (x, m)
            assert 0 <= iv < m
        else:
            assert iv == 0, (x, m)


def test_inverse_mod_x_above_m():
    """Unreduced x (x > m) inverts to the inverse of x mod m."""
    m = 0xFFFF_FFFB
    xs = [m + 2, 5 * m + 3, (1 << 200) + 11]
    inv = jax.jit(inverse_mod)(_pack(xs, 16), _pack([m] * len(xs), 16))
    for x, iv in zip(xs, _unpack(inv)):
        assert (iv * x) % m == 1
