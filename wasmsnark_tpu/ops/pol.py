"""QAP linear combination — device analogue of src/build_pol.js.

pol_constructLC walks sparse per-signal polynomial lists and accumulates
res[coefIdx] += signal_i * coef (build_pol.js:62-144).  On TPU the sparse
walk becomes: one batched Montgomery multiply of every (signal, coef) pair,
then a scatter-add of 16-bit limb planes into the domain array — exact in
uint32 for up to 2^16 contributions per domain index (asserted at pkey
conversion) — followed by one wide-sum modular reduction per column.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from .fp import FpDevice


@dataclasses.dataclass
class SparseLC:
    """Host-preprocessed sparse QAP matrix (one of polsA / polsB).

    sig_idx[k]  : which signal multiplies entry k
    coef_idx[k] : which domain evaluation index receives it
    coefs       : [L, nnz] Montgomery-form Fr limb planes
    """

    sig_idx: np.ndarray
    coef_idx: np.ndarray
    coefs: np.ndarray
    domain_size: int

    def __post_init__(self):
        counts = np.bincount(self.coef_idx, minlength=self.domain_size)
        assert counts.max(initial=0) < (1 << 16), (
            "constructLC scatter requires < 2^16 contributions per domain "
            "index; chunk the LC accumulation for denser circuits")


def construct_lc(F: FpDevice, lc: SparseLC, signals_mont):
    """signals_mont: [L, nSignals] Montgomery.  Returns [L, domain] Montgomery
    evaluations of sum_i signal_i * P_i on the domain."""
    sig = jnp.take(signals_mont, jnp.asarray(lc.sig_idx, dtype=jnp.int32), axis=1)
    prods = F.mont_mul(sig, jnp.asarray(lc.coefs))          # [L, nnz] < 2^16 limbs
    acc = jnp.zeros((F.L, lc.domain_size), dtype=jnp.uint32)
    acc = acc.at[:, jnp.asarray(lc.coef_idx, dtype=jnp.int32)].add(prods)
    return F.reduce_wide_sum(acc)
