"""NTT device kernels vs direct DFT oracle (reference: test/fft.js semantics,
build_fft.js root-of-unity conventions including the odd-coset flag)."""

import random

import jax

from wasmsnark_tpu.fields.spec import FieldSpec, NTTSpec
from wasmsnark_tpu.ops.fp import FpDevice
from wasmsnark_tpu.ops.ntt import NTTDevice

R = 21888242871839275222246405745257275088548364400416034343698204186575808495617

spec = FieldSpec(R, "bn128_fr")
nspec = NTTSpec(spec)
F = FpDevice(spec)
N = NTTDevice(nspec, F)


def _direct(coeffs, w, q, n):
    return [sum(coeffs[j] * pow(w, j * k, q) for j in range(n)) % q for k in range(n)]


def test_root_tables():
    # roots[i] is a primitive 2^i-th root; the tower squares down
    q = spec.q
    assert nspec.max_bits == 28  # BN128 Fr 2-adicity (build_fft.js:29-34)
    for i in range(1, nspec.max_bits + 1):
        assert pow(nspec.roots[i], 2, q) == nspec.roots[i - 1]
    assert nspec.roots[0] == 1
    assert nspec.roots[1] == q - 1


def test_fft_matches_direct_dft():
    q = spec.q
    bits, n = 5, 32
    a = [random.randrange(q) for _ in range(n)]
    got = F.unpack_mont(jax.jit(N.fft)(F.pack_mont(a)))
    assert got == _direct(a, nspec.roots[bits], q, n)


def test_fft_odd_coset():
    q = spec.q
    bits, n = 4, 16
    w2n = nspec.roots[bits + 1]
    a = [random.randrange(q) for _ in range(n)]
    got = F.unpack_mont(jax.jit(lambda x: N.fft(x, odd=True))(F.pack_mont(a)))
    exp = [sum(a[j] * pow(w2n, j * (2 * k + 1), q) for j in range(n)) % q
           for k in range(n)]
    assert got == exp


def test_ifft_roundtrip():
    q = spec.q
    n = 64
    a = [random.randrange(q) for _ in range(n)]
    A = F.pack_mont(a)
    assert F.unpack_mont(jax.jit(N.ifft)(jax.jit(N.fft)(A))) == a


def test_2n_domain_interleave():
    """The CALC_H trick (src/bn128.js:147-158): evals of a degree-<N poly on
    the 2N domain = interleave(fft(a), fft(a, odd=True))."""
    q = spec.q
    n = 16
    w2n = nspec.roots[5]
    a = [random.randrange(q) for _ in range(n)]
    A = F.pack_mont(a)
    ev = F.unpack_mont(jax.jit(N.fft)(A))
    evo = F.unpack_mont(jax.jit(lambda x: N.fft(x, odd=True))(A))
    inter = []
    for i in range(n):
        inter += [ev[i], evo[i]]
    exp = [sum(a[j] * pow(w2n, j * t, q) for j in range(n)) % q for t in range(2 * n)]
    assert inter == exp
