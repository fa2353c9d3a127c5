"""Radix-2 NTT over a prime field on TPU — semantics of src/build_fft.js.

Structure: the reference runs an in-place iterative Cooley-Tukey loop, one
butterfly at a time (build_fft.js:223-372).  Here each stage is one batched
tensor op over the whole domain: the [L, N] limb-plane array is reshaped to
[L, groups, 2, half] and the half-sized twiddle plane broadcasts across
groups, so a stage costs one batched Montgomery mul (N/2 lanes) + one add +
one sub.  log2(N) stages total; the bit-reverse permutation is a single
gather.

The `odd` flag reproduces the reference's odd-coset evaluation trick
(build_fft.js:276-287): with odd=True the stage-s twiddles start at
w_{2m} = roots[s+1] instead of 1, so the transform evaluates the input
polynomial at the *odd* powers of the 2N-th root of unity.  This is what lets
the QAP pipeline evaluate a degree-<N polynomial on a 2N domain with two
N-point transforms and no padding (src/bn128.js:147-158) — halving peak
memory, which matters even more on-chip than it did in WASM.

Inverse transform: rawfft + "finalInverse" = index mirror i <-> N-i fused
with the 1/N scaling (build_fft.js:550-648).

All values in Montgomery form, like the reference's frm-prefixed pipeline.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.spec import FieldSpec, NTTSpec
from .fp import FpDevice


class NTTDevice:
    def __init__(self, ntt_spec: NTTSpec, fp: FpDevice | None = None):
        self.spec = ntt_spec
        self.field = ntt_spec.field
        self.F = fp or FpDevice(ntt_spec.field)
        self._tw_cache: dict = {}

    # -- host-side precomputed tables ----------------------------------------

    @functools.lru_cache(maxsize=32)
    def _bitrev(self, bits: int) -> np.ndarray:
        n = 1 << bits
        idx = np.arange(n)
        rev = np.zeros(n, dtype=np.int32)
        for b in range(bits):
            rev |= ((idx >> b) & 1) << (bits - 1 - b)
        return rev

    def _twiddles(self, bits: int, odd: bool) -> list[np.ndarray]:
        """Per-stage twiddle planes [L, 2^(s-1)] in Montgomery form.

        Stage s (1-based) uses w_m = roots[s]; odd mode starts the chain at
        w_{2m} = roots[s+1] (build_fft.js:276-287)."""
        key = (bits, odd)
        if key in self._tw_cache:
            return self._tw_cache[key]
        q = self.field.q
        roots = self.spec.roots
        tabs = []
        for s in range(1, bits + 1):
            half = 1 << (s - 1)
            w = roots[s]
            cur = roots[s + 1] if odd else 1
            vals = []
            for _ in range(half):
                vals.append(cur * self.field.R % q)  # Montgomery
                cur = cur * w % q
            tabs.append(serialize_limbs(vals, self.field.n_limbs))
        self._tw_cache[key] = tabs
        return tabs

    def _invn(self, bits: int) -> np.ndarray:
        """(1/2^bits) in Montgomery form, [L, 1]."""
        v = self.spec.inv2[bits] * self.field.R % self.field.q
        return serialize_limbs([v], self.field.n_limbs)

    # -- runtime-argument plans -------------------------------------------------

    def plan(self, bits: int, odd: bool = False, inverse: bool = False):
        """Precomputed tables for one transform as a pytree of HOST arrays.

        Passed to fft/ifft as the `plan=` argument, the tables enter the
        jitted program as *runtime inputs* instead of baked HLO constants.
        This is what makes production domains compile: at 2^20 the twiddle
        stack alone is ~64 MB/transform, and the reference's CALC_H pipeline
        composes five transforms — constant-baking inflates the serialized
        program past what any AOT/remote-compile transport accepts (the
        round-3 HTTP 413) and stalls XLA constant folding.  Callers
        device_put the plan once and reuse it across calls, the device
        analogue of the reference instantiating its FFT tables once per
        WASM memory (build_fft.js:58-117)."""
        p = {"rev": self._bitrev(bits).astype(np.int32),
             "tw": tuple(self._twiddles(bits, odd))}
        if inverse:
            n = 1 << bits
            p["mirror"] = np.concatenate(
                [[0], np.arange(n - 1, 0, -1)]).astype(np.int32)
            p["invn"] = self._invn(bits)
        return p

    # -- transforms ------------------------------------------------------------

    def fft(self, x, odd: bool = False, plan=None):
        """In-order DFT of Montgomery-form coefficients x [L, N].

        odd=False: X_k = sum_j x_j w_N^{jk}
        odd=True:  X_k = sum_j x_j w_{2N}^{j(2k+1)}  (odd-coset evaluation)

        plan: optional pytree from self.plan(bits, odd) — host arrays bake
        as constants (small-domain convenience), traced arrays stay runtime
        inputs (production path).
        """
        L, n = x.shape
        bits = n.bit_length() - 1
        assert 1 << bits == n, "size must be a power of two"
        assert bits <= self.spec.max_bits, "domain exceeds field 2-adicity"
        if plan is None:
            plan = self.plan(bits, odd)
        x = jnp.take(x, jnp.asarray(plan["rev"]), axis=1)
        tabs = plan["tw"]
        assert len(tabs) == bits, "plan/domain mismatch"
        for s in range(1, bits + 1):
            half = 1 << (s - 1)
            groups = n >> s
            xv = x.reshape(L, groups, 2, half)
            u = xv[:, :, 0, :]
            v = xv[:, :, 1, :]
            tw = jnp.asarray(tabs[s - 1])[:, None, :]  # [L, 1, half]
            from .fp import _use_pallas
            if _use_pallas():
                from .fp_pallas import butterfly_pallas
                x0, x1 = butterfly_pallas(self.field, u, v, tw)
            else:
                t = self.F.mont_mul(v, tw)
                x0 = self.F.add(u, t)
                x1 = self.F.sub(u, t)
            x = jnp.stack([x0, x1], axis=2).reshape(L, n)
        return x

    def ifft(self, x, odd: bool = False, plan=None):
        """Inverse DFT: rawfft + mirror + 1/N (build_fft.js _ifft).

        plan: optional pytree from self.plan(bits, odd, inverse=True)."""
        L, n = x.shape
        if plan is None:
            plan = self.plan(n.bit_length() - 1, odd, inverse=True)
        y = self.fft(x, odd, plan=plan)
        # finalInverse: out[0] = y[0]/N; out[i] = y[N-i]/N
        y = jnp.take(y, jnp.asarray(plan["mirror"]), axis=1)
        return self.F.mont_mul(y, jnp.asarray(plan["invn"]))

    # -- vector helpers (build_fft.js:374-547) ---------------------------------

    def mul_n(self, a, b):
        return self.F.mont_mul(a, b)

    def to_mont_n(self, a):
        return self.F.to_mont(a)

    def from_mont_n(self, a):
        return self.F.from_mont(a)


def serialize_limbs(vals, n_limbs) -> np.ndarray:
    from ..utils.serialize import ints_to_limbs_fast
    return ints_to_limbs_fast(vals, n_limbs)
