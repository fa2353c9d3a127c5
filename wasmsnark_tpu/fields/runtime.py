"""F1Runtime — the analogue of the reference's `buildF1(q)` (src/f1.js).

The reference's F1 runtime exposes scalar in/out helpers (putInt/getInt),
canonical-form mul/add/sub/inverse wrappers over the Montgomery kernels, and
a `test_F1(n)` benchmark loop (src/f1.js:123-132).  Here the same surface is
batched: every method takes/returns lists of python ints, runs on device in
one vectorized call, and `bench_mul(n)` measures device Montgomery-multiply
throughput (the moral equivalent of testF1's 1M-mul loop).
"""

from __future__ import annotations

import time

import jax
import numpy as np

from .spec import FieldSpec
from ..ops.fp import FpDevice
from ..ops.bigint import int_div, inverse_mod


class F1Runtime:
    def __init__(self, q: int):
        self.q = q
        self.spec = FieldSpec(q, "f1")
        self.F = FpDevice(self.spec)
        # canonical-form ops: f1 semantics (build_f1.js:44-76) — inputs and
        # outputs canonical; mul does montmul + R2 fixup like f1_mul.
        self._mul = jax.jit(lambda x, y: self.F.mont_mul(self.F.to_mont(x), y))
        self._add = jax.jit(self.F.add)
        self._sub = jax.jit(self.F.sub)
        self._neg = jax.jit(self.F.neg)
        self._sqr = jax.jit(lambda x: self.F.mont_sqr(self.F.to_mont(x)))
        self._inv = jax.jit(
            lambda x: self.F.from_mont(self.F.mont_inv(self.F.to_mont(x)))
        )
        # big-integer tier (int_div / int_inverseMod parity,
        # src/build_int.js:710-1054): true divmod on arbitrary values and a
        # binary-extended-GCD inverse that, unlike the Fermat ladder above,
        # does not require q prime (any odd modulus)
        self._idiv = jax.jit(int_div)
        self._invmod = jax.jit(lambda x: inverse_mod(x, self.F.q_limbs_like(x)))

    # -- canonical-form batched API -----------------------------------------

    def mul(self, xs, ys):
        return self.F.unpack(self._mul(self.F.pack(xs), self.F.pack(ys)))

    def square(self, xs):
        return self.F.unpack(self._sqr(self.F.pack(xs)))

    def add(self, xs, ys):
        return self.F.unpack(self._add(self.F.pack(xs), self.F.pack(ys)))

    def sub(self, xs, ys):
        return self.F.unpack(self._sub(self.F.pack(xs), self.F.pack(ys)))

    def neg(self, xs):
        return self.F.unpack(self._neg(self.F.pack(xs)))

    def inverse(self, xs):
        return self.F.unpack(self._inv(self.F.pack(xs)))

    # -- big-integer tier ------------------------------------------------------

    def divmod(self, xs, ys):
        """True integer divmod per lane (int_div, src/build_int.js:710-924);
        values need not be < q — anything fitting the limb width works."""
        q, r = self._idiv(self.F.pack(xs), self.F.pack(ys))
        return self.F.unpack(q), self.F.unpack(r)

    def inverse_gcd(self, xs):
        """x^-1 mod q by binary extended GCD (int_inverseMod parity,
        src/build_int.js:926-1054) — valid for any odd q, prime or not;
        non-units return 0."""
        return self.F.unpack(self._invmod(self.F.pack(xs)))

    # -- benchmark loop (test_F1 parity, src/f1.js:123-132) -------------------

    def bench_mul(self, n: int, batch: int = 1 << 16) -> dict:
        """Run >= n Montgomery multiplications on device; returns throughput.

        Unlike the reference's scalar 1M-iteration WASM loop, the batch axis
        carries the parallelism: `reps` chained batched muls keep data on
        device, so the measurement is kernel throughput, not dispatch.
        """
        rng = np.random.default_rng(0)
        x = rng.integers(0, 1 << 16, size=(self.spec.n_limbs, batch), dtype=np.uint32)
        reps = max(1, n // batch)

        @jax.jit
        def chain(x):
            def body(_, y):
                return self.F.mont_mul(y, x)
            return jax.lax.fori_loop(0, reps, body, x)

        chain(x).block_until_ready()  # compile
        t0 = time.perf_counter()
        chain(x).block_until_ready()
        dt = time.perf_counter() - t0
        total = reps * batch
        return {"muls": total, "seconds": dt, "muls_per_sec": total / dt}
