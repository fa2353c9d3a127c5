"""Field specifications: compile-time parameters for every prime field.

The reference (wasmsnark) specializes WASM code per modulus at build time
(src/build_f1m.js:27-46 derives n64, R, R2, np32 from q).  Here the same role
is played by a frozen `FieldSpec`: a hashable, static object that JAX kernels
close over, so every jitted kernel is specialized per field exactly like the
generated WASM was.

TPU-native representation choice
--------------------------------
TPUs have no native 64-bit integer lanes, so the reference's 32-bit limbs in
i64 accumulators (build_int.js) do not translate.  We use **16-bit limbs held
in uint32 lanes**: a product of two limbs is < 2^32 (exact in uint32), and the
classic CIOS invariant t + a_i*b_j + carry <= 2^32 - 1 holds exactly at limb
width 16 / accumulator width 32, mirroring the width-32/width-64 invariant the
reference relies on.  With deferred carries, column accumulators stay < 2^23.

Montgomery radix: R = 2^(16 * n_limbs).  For BN128 (254-bit q) n_limbs = 16 so
R = 2^256, matching the reference's R = 2^(64*n64) (build_f1m.js:35) —
to/from-Montgomery forms are therefore bit-identical with wasmsnark's.
"""

from __future__ import annotations

import dataclasses
import functools

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


def _inv_mod(a: int, m: int) -> int:
    return pow(a, -1, m)


@dataclasses.dataclass(frozen=True)
class FieldSpec:
    """Static parameters of a prime field Fq with 16-bit limb layout."""

    q: int
    name: str = "f"

    # ---- derived, all computed in __post_init__ ----
    n_limbs: int = dataclasses.field(init=False)
    bits: int = dataclasses.field(init=False)
    R: int = dataclasses.field(init=False)          # Montgomery radix mod q
    R2: int = dataclasses.field(init=False)         # R^2 mod q
    R3: int = dataclasses.field(init=False)
    np16: int = dataclasses.field(init=False)       # -q^{-1} mod 2^16
    half: int = dataclasses.field(init=False)       # (q-1)//2
    one_mont: int = dataclasses.field(init=False)   # R mod q  (1 in Mont form)

    def __post_init__(self):
        q = self.q
        if q % 2 == 0:
            raise ValueError("q must be odd")
        bits = q.bit_length()
        # Match the reference's sizing rule: n64 = floor((bitlen(q-1)-1)/64)+1
        # (build_f1m.js:27); with 16-bit limbs we use 64-bit groups of 4 limbs
        # so that byte sizes (n8 = n64*8) line up with wasmsnark's memory
        # layout and serialization formats.
        n64 = (max((q - 1).bit_length(), 1) - 1) // 64 + 1
        n_limbs = n64 * 4
        R = (1 << (LIMB_BITS * n_limbs)) % q
        object.__setattr__(self, "bits", bits)
        object.__setattr__(self, "n_limbs", n_limbs)
        object.__setattr__(self, "R", R)
        object.__setattr__(self, "R2", (R * R) % q)
        object.__setattr__(self, "R3", (R * R * R) % q)
        object.__setattr__(self, "np16", (-_inv_mod(q, 1 << LIMB_BITS)) % (1 << LIMB_BITS))
        object.__setattr__(self, "half", (q - 1) // 2)
        object.__setattr__(self, "one_mont", R % q)

    # -- scalar host helpers (used by the oracle and converters) ------------

    @property
    def n8(self) -> int:
        """Size of one element in bytes (wasmsnark n8)."""
        return self.n_limbs * LIMB_BITS // 8

    def to_mont(self, a: int) -> int:
        return (a * self.R) % self.q

    def from_mont(self, a: int) -> int:
        return (a * _inv_mod(self.R, self.q)) % self.q

    def limbs(self, a: int) -> list[int]:
        """Little-endian 16-bit limb decomposition (length n_limbs)."""
        a %= self.q
        return [(a >> (LIMB_BITS * i)) & LIMB_MASK for i in range(self.n_limbs)]

    def from_limbs(self, limbs) -> int:
        acc = 0
        for i, l in enumerate(limbs):
            acc |= int(l) << (LIMB_BITS * i)
        return acc

    @functools.cached_property
    def q_limbs(self) -> tuple[int, ...]:
        # NOTE: not via self.limbs(), which canonicalizes mod q (q -> 0).
        return tuple((self.q >> (LIMB_BITS * i)) & LIMB_MASK for i in range(self.n_limbs))

    def is_square(self, a: int) -> bool:
        """Euler criterion (reference f1m_isSquare, build_f1m.js:860-897)."""
        a %= self.q
        if a == 0:
            return True
        return pow(a, (self.q - 1) // 2, self.q) == 1

    @functools.cached_property
    def _tonelli(self):
        """(s, t, nqr^t) for Tonelli-Shanks, nqr = smallest non-residue.

        Mirrors build_f1m.js:784-807: q-1 = 2^s * t with t odd, and the
        reference picks the smallest non-residue starting from 2.
        """
        q = self.q
        s, t = 0, q - 1
        while t % 2 == 0:
            s += 1
            t //= 2
        nqr = 2
        while pow(nqr, (q - 1) // 2, q) == 1:
            nqr += 1
        return s, t, pow(nqr, t, q), nqr

    def sqrt(self, a: int) -> int | None:
        """Tonelli-Shanks square root, sign-normalized like the reference:
        f1m_sqrt negates the root when f1m_isNegative(R) — and f1m's
        isNegative is the **LSB of the canonical form** (build_f1m.js:133-149),
        so the returned root always has an even canonical value."""
        q = self.q
        a %= q
        if a == 0:
            return 0
        if not self.is_square(a):
            return None
        s, t, z, _ = self._tonelli
        m = s
        c = z
        u = pow(a, (t + 1) // 2, q)  # candidate root
        b = pow(a, t, q)
        while b != 1:
            # find least i with b^(2^i) == 1
            i, bb = 0, b
            while bb != 1:
                bb = bb * bb % q
                i += 1
            e = pow(c, 1 << (m - i - 1), q)
            c = e * e % q
            u = u * e % q
            b = b * c % q
            m = i
        if u & 1:  # f1m_isNegative = LSB of canonical form
            u = q - u
        return u


@dataclasses.dataclass(frozen=True)
class NTTSpec:
    """Roots-of-unity tables for radix-2 NTT over a prime field.

    Mirrors build_fft.js:29-72: max_bits = 2-adicity of q-1; nr = smallest
    quadratic non-residue starting from 2; w[max_bits] = nr^rem; w[i] =
    w[i+1]^2, so w[i] is a primitive 2^i-th root of unity.  inv2[i] =
    (2^i)^{-1}.
    """

    field: FieldSpec

    max_bits: int = dataclasses.field(init=False)
    roots: tuple[int, ...] = dataclasses.field(init=False)      # canonical form
    inv2: tuple[int, ...] = dataclasses.field(init=False)       # canonical form

    def __post_init__(self):
        q = self.field.q
        rem = q - 1
        max_bits = 0
        while rem % 2 == 0:
            max_bits += 1
            rem //= 2
        nr = 2
        while pow(nr, q >> 1, q) == 1:
            nr += 1
        w = [0] * (max_bits + 1)
        w[max_bits] = pow(nr, rem, q)
        for i in range(max_bits - 1, -1, -1):
            w[i] = w[i + 1] * w[i + 1] % q
        inv2 = [pow(1 << i, -1, q) for i in range(max_bits + 1)]
        object.__setattr__(self, "max_bits", max_bits)
        object.__setattr__(self, "roots", tuple(w))
        object.__setattr__(self, "inv2", tuple(inv2))
