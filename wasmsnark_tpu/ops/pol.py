"""QAP linear combination — device analogue of src/build_pol.js.

pol_constructLC walks sparse per-signal polynomial lists and accumulates
res[coefIdx] += signal_i * coef (build_pol.js:62-144).  On TPU the sparse
walk becomes one batched Montgomery multiply of every (signal, coef) pair
followed by a segmented reduction into the domain array — with NO device
scatter (TPU scatter serializes) and NO device sort:

  * the sparsity pattern is static per proving key, so entries are sorted
    by destination index ON THE HOST at parse time, and each domain
    index's run boundaries [start, end) are precomputed with
    np.searchsorted;
  * on device the sorted products take one inclusive cumsum along the
    entry axis; bucket sums are differences of the cumsum at the (static)
    run boundaries.  uint32 arithmetic is modular, so the difference is
    exact whenever a single bucket's true sum < 2^32 — guaranteed by the
    < 2^16 contributions x < 2^16 limb values bound (asserted below);
  * one wide-sum modular reduction per column folds the deferred carries
    (fp.reduce_wide_sum), exactly as before.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from .fp import FpDevice


@dataclasses.dataclass
class SparseLC:
    """Host-preprocessed sparse QAP matrix (one of polsA / polsB).

    Constructed with entries in any order; __post_init__ sorts them by
    destination index and precomputes the per-domain-index run boundaries
    (all static host work, done once per proving key).

    sig_idx[k]  : which signal multiplies entry k     (sorted by coef_idx)
    coef_idx[k] : which domain evaluation index receives it (ascending)
    coefs       : [L, nnz] Montgomery-form Fr limb planes
    """

    sig_idx: np.ndarray
    coef_idx: np.ndarray
    coefs: np.ndarray
    domain_size: int

    def __post_init__(self):
        counts = np.bincount(self.coef_idx, minlength=self.domain_size)
        assert counts.max(initial=0) < (1 << 16), (
            "constructLC requires < 2^16 contributions per domain index; "
            "chunk the LC accumulation for denser circuits")
        order = np.argsort(self.coef_idx, kind="stable")
        self.sig_idx = np.ascontiguousarray(self.sig_idx[order])
        self.coef_idx = np.ascontiguousarray(self.coef_idx[order])
        self.coefs = np.ascontiguousarray(self.coefs[:, order])
        dom = np.arange(self.domain_size)
        self._start = np.searchsorted(self.coef_idx, dom, side="left")
        self._end = np.searchsorted(self.coef_idx, dom, side="right")
        self._hit = (self._end > self._start)
        # gather positions (clamped; masked out when empty/at origin)
        self._pos_end = np.maximum(self._end - 1, 0).astype(np.int32)
        self._pos_start = np.maximum(self._start - 1, 0).astype(np.int32)
        self._has_prev = (self._start > 0)


def lc_arrays(lc: SparseLC) -> dict:
    """The SparseLC tables as a pytree, for passing into a jitted program
    as runtime inputs.  At production scale the [L, nnz] coefficient plane
    is ~10^2 MB per matrix — baked as HLO constants (the legacy path) that
    inflates the serialized program past remote-compile transport limits
    and stalls XLA constant folding; as arguments it uploads once and the
    program stays small and shape-generic."""
    return {
        "sig_idx": lc.sig_idx.astype(np.int32),
        "coefs": lc.coefs,
        "pos_end": lc._pos_end,
        "pos_start": lc._pos_start,
        "has_prev": lc._has_prev,
        "hit": lc._hit,
    }


def construct_lc(F: FpDevice, lc, signals_mont):
    """signals_mont: [L, nSignals] Montgomery.  Returns [L, domain] Montgomery
    evaluations of sum_i signal_i * P_i on the domain.

    lc: a SparseLC (tables bake as constants — small-circuit convenience) or
    an lc_arrays() pytree of possibly-traced arrays (production path)."""
    arrs = lc if isinstance(lc, dict) else lc_arrays(lc)
    domain_size = arrs["hit"].shape[-1]
    sig = jnp.take(signals_mont, jnp.asarray(arrs["sig_idx"]), axis=1)
    prods = F.mont_mul(sig, jnp.asarray(arrs["coefs"]))     # [L, nnz] < 2^16 limbs
    ps = jnp.cumsum(prods, axis=1, dtype=jnp.uint32)        # wraps mod 2^32
    at_end = jnp.take(ps, jnp.asarray(arrs["pos_end"]), axis=1)
    at_prev = jnp.take(ps, jnp.asarray(arrs["pos_start"]), axis=1)
    prev = jnp.where(jnp.asarray(arrs["has_prev"])[None, :], at_prev,
                     jnp.zeros_like(at_prev))
    acc = jnp.where(jnp.asarray(arrs["hit"])[None, :], at_end - prev,
                    jnp.zeros((F.L, domain_size), jnp.uint32))
    return F.reduce_wide_sum(acc)
