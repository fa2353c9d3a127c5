"""Segmented scans/reductions over group elements with few compiled bodies.

jax.lax.associative_scan instantiates its combiner ~2x per recursion level;
with a combiner as heavy as a complete elliptic-curve add (~23 field muls)
that costs minutes of XLA compile for 2^20-point scans.  These helpers get
the same O(N) work with a *constant* number of traced combiner bodies:

  * reshape the scan axis into [chunks, steps]; a lax.scan over `steps`
    (ONE traced body) performs the in-chunk inclusive segmented scan at full
    lane width (chunks x other batch dims);
  * recurse on the per-chunk carries (a factor-`steps` smaller problem);
  * a second scan pass replays the chunks with each chunk's incoming prefix
    as the initial carry — the segmented operator itself then applies the
    prefix to exactly the positions before the chunk's first boundary.

Segment flags follow the classic segmented-scan algebra: flag[i]=1 means
position i starts a new segment; the operator
    (f1, v1) (+) (f2, v2) = (f1|f2, f2 ? v2 : v1+v2)
is associative, which is what makes the chunk decomposition valid.

Used by the MSM bucket accumulation (flags = digit-run starts) and, with
all-zero flags, as a plain prefix scan for the Pippenger triangle fold.
Total work ~= 2N combiner applications — the same as associative_scan — but
with ~3 traced bodies per recursion level and ~2 levels in practice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .curve import map_leaf


def _n_last(tree):
    return jax.tree.leaves(tree)[0].shape[-1]


def _pad_last(tree, pad, value_fn):
    return map_leaf(tree, lambda a: jnp.concatenate(
        [a, value_fn(a, pad)], axis=-1)) if pad else tree


def seg_scan(curve, flags, values, seq_threshold: int = 256, chunk_steps: int = 256):
    """Inclusive segmented scan along the last axis of every leaf.

    flags: bool [*batch, N] (one fewer leading dim than leaves, which carry a
    limb axis first) — True where a new segment starts.
    values: point pytree, leaves [limbs..., *batch, N].
    Returns the scanned pytree (same shapes)."""
    C = curve
    N = _n_last(values)

    def step(carry, xs):
        f, v = xs
        acc = C.select(f, v, C.add(carry, v))
        return acc, acc

    if N <= seq_threshold:
        fl = jnp.moveaxis(flags, -1, 0)
        vals = map_leaf(values, lambda a: jnp.moveaxis(a, -1, 0))
        init = C.zero_like(map_leaf(values, lambda a: a[..., 0]))
        _, out = jax.lax.scan(step, init, (fl, vals))
        return map_leaf(out, lambda a: jnp.moveaxis(a, 0, -1))

    # pad to a multiple of chunk_steps with flagged zero elements (isolated
    # one-element segments — they cannot disturb real positions)
    K = chunk_steps
    pad = (-N) % K
    if pad:
        flags = jnp.concatenate(
            [flags, jnp.ones(flags.shape[:-1] + (pad,), bool)], axis=-1)
        zero = C.zero_like(map_leaf(values, lambda a: a[..., :1]))
        values = jax.tree.map(
            lambda v, z: jnp.concatenate(
                [v, jnp.broadcast_to(z, z.shape[:-1] + (pad,))], axis=-1),
            values, zero)
    Np = N + pad
    Cn = Np // K

    def to_chunks(a):
        # [..., Np] -> [K, ..., Cn] (chunk c = positions c*K .. c*K+K-1)
        return jnp.moveaxis(a.reshape(a.shape[:-1] + (Cn, K)), -1, 0)

    def from_chunks(a):
        # [K, *mid, Cn] -> [*mid, Np]
        mid = a.shape[1:-1]
        return jnp.moveaxis(a, 0, -1).reshape(mid + (Np,))

    fl = to_chunks(flags)
    vals = map_leaf(values, to_chunks)

    # pass 1: chunk-local scan, keep only the final carries
    init = C.zero_like(map_leaf(vals, lambda a: a[0]))
    chunk_last, _ = jax.lax.scan(lambda c, xs: (step(c, xs)[0], None), init, (fl, vals))

    # recurse on chunk carries, shift to exclusive (chunk c gets c-1's result)
    any_flag = jnp.any(fl, axis=0)
    carried = seg_scan(curve, any_flag, chunk_last, seq_threshold, chunk_steps)
    zeroc = C.zero_like(map_leaf(carried, lambda a: a[..., :1]))
    incoming = jax.tree.map(
        lambda z, a: jnp.concatenate([z, a[..., :-1]], axis=-1), zeroc, carried)

    # pass 2: replay with incoming prefixes as initial carries
    _, out = jax.lax.scan(step, incoming, (fl, vals))
    res = map_leaf(out, from_chunks)
    return map_leaf(res, lambda a: a[..., :N]) if pad else res


def seg_scan_parts(curve, flags, values, chunk_steps: int = 256):
    """Chunk-local segmented scan + per-chunk incoming prefixes — the
    half-work variant for consumers that only read *run-end* values (the
    MSM bucket totals): one lax.scan pass over the data instead of two.

    Returns (local, incoming, K):
      * local: same shapes as values; the inclusive segmented scan
        restarted at every chunk boundary (chunks of K positions);
      * incoming: leaves [*batch, Cn]; the global segmented prefix carried
        into each chunk (i.e. the scan value at the end of chunk c-1,
        already combined across earlier chunks);
      * K: the chunk size used.
    A run-end at global position p (chunk c = p // K) has global value
        local[p]                    if its run starts inside chunk c,
        local[p] (+) incoming[c]    if the run crosses the chunk start
    — sorted input guarantees the incoming carry belongs to that same run.
    """
    C = curve
    N = _n_last(values)

    def step(carry, xs):
        f, v = xs
        acc = C.select(f, v, C.add(carry, v))
        return acc, acc

    if N <= chunk_steps:
        fl = jnp.moveaxis(flags, -1, 0)
        vals = map_leaf(values, lambda a: jnp.moveaxis(a, -1, 0))
        init = C.zero_like(map_leaf(values, lambda a: a[..., 0]))
        _, out = jax.lax.scan(step, init, (fl, vals))
        local = map_leaf(out, lambda a: jnp.moveaxis(a, 0, -1))
        incoming = C.zero_like(map_leaf(values, lambda a: a[..., :1]))
        return local, incoming, max(N, 1)

    K = chunk_steps
    pad = (-N) % K
    if pad:
        flags = jnp.concatenate(
            [flags, jnp.ones(flags.shape[:-1] + (pad,), bool)], axis=-1)
        zero = C.zero_like(map_leaf(values, lambda a: a[..., :1]))
        values = jax.tree.map(
            lambda v, z: jnp.concatenate(
                [v, jnp.broadcast_to(z, z.shape[:-1] + (pad,))], axis=-1),
            values, zero)
    Np = N + pad
    Cn = Np // K

    def to_chunks(a):
        return jnp.moveaxis(a.reshape(a.shape[:-1] + (Cn, K)), -1, 0)

    def from_chunks(a):
        mid = a.shape[1:-1]
        return jnp.moveaxis(a, 0, -1).reshape(mid + (Np,))

    fl = to_chunks(flags)
    vals = map_leaf(values, to_chunks)

    # single data pass: chunk-local inclusive scan, keeping outputs
    init = C.zero_like(map_leaf(vals, lambda a: a[0]))
    chunk_last, out = jax.lax.scan(step, init, (fl, vals))
    local = map_leaf(out, from_chunks)
    if pad:
        local = map_leaf(local, lambda a: a[..., :N])

    # combine chunk carries (factor-K smaller problem), shift exclusive
    any_flag = jnp.any(fl, axis=0)
    carried = seg_scan(curve, any_flag, chunk_last, chunk_steps, chunk_steps)
    zeroc = C.zero_like(map_leaf(carried, lambda a: a[..., :1]))
    incoming = jax.tree.map(
        lambda z, a: jnp.concatenate([z, a[..., :-1]], axis=-1),
        zeroc, carried)
    return local, incoming, K


def seg_scan_parts_mixed(curve, flags, aff, chunk_steps: int = 256):
    """seg_scan_parts with *affine* input values — the MSM fast path.

    aff: affine point pytree ((X, Y); zero encoded (0, 0)), leaves
    [limbs..., *batch, N].  The chunk-local combiner is the cheaper mixed
    add (curve.madd, Z2 = 1), with segment restarts promoting the affine
    value to Jacobian; only the factor-K-smaller carry recursion pays for
    full Jacobian adds.  Returns (local, incoming, K) exactly like
    seg_scan_parts, with local/incoming in Jacobian coordinates."""
    C = curve
    N = _n_last(aff)

    def step(carry, xs):
        f, v = xs
        acc = C.select(f, C.promote(v), C.madd(carry, v))
        return acc, acc

    def jac_zero_like(tree_aff):
        return C.zero_like(C.promote(map_leaf(tree_aff, lambda a: a[..., 0])))

    if N <= chunk_steps:
        fl = jnp.moveaxis(flags, -1, 0)
        vals = map_leaf(aff, lambda a: jnp.moveaxis(a, -1, 0))
        init = jac_zero_like(aff)
        _, out = jax.lax.scan(step, init, (fl, vals))
        local = map_leaf(out, lambda a: jnp.moveaxis(a, 0, -1))
        incoming = map_leaf(init, lambda a: a[..., None])
        return local, incoming, max(N, 1)

    K = chunk_steps
    pad = (-N) % K
    if pad:
        # affine zero is all-zero coords; flagged -> isolated one-element
        # segments that cannot disturb real positions
        flags = jnp.concatenate(
            [flags, jnp.ones(flags.shape[:-1] + (pad,), bool)], axis=-1)
        aff = map_leaf(aff, lambda a: jnp.concatenate(
            [a, jnp.zeros(a.shape[:-1] + (pad,), a.dtype)], axis=-1))
    Np = N + pad
    Cn = Np // K

    def to_chunks(a):
        return jnp.moveaxis(a.reshape(a.shape[:-1] + (Cn, K)), -1, 0)

    def from_chunks(a):
        mid = a.shape[1:-1]
        return jnp.moveaxis(a, 0, -1).reshape(mid + (Np,))

    fl = to_chunks(flags)
    vals = map_leaf(aff, to_chunks)

    # batch shape here already includes the chunk axis: carry leaves must be
    # [limbs..., *batch, Cn], i.e. the promoted shape of one chunk row
    init = C.zero_like(C.promote(map_leaf(vals, lambda a: a[0])))
    chunk_last, out = jax.lax.scan(step, init, (fl, vals))
    local = map_leaf(out, from_chunks)
    if pad:
        local = map_leaf(local, lambda a: a[..., :N])

    # combine chunk carries (Jacobian; full complete-add path)
    any_flag = jnp.any(fl, axis=0)
    carried = seg_scan(curve, any_flag, chunk_last, chunk_steps, chunk_steps)
    zeroc = C.zero_like(map_leaf(carried, lambda a: a[..., :1]))
    incoming = jax.tree.map(
        lambda z, a: jnp.concatenate([z, a[..., :-1]], axis=-1),
        zeroc, carried)
    return local, incoming, K


def prefix_scan(curve, values, **kw):
    """Plain inclusive prefix scan (segmented scan with no boundaries)."""
    leaf = jax.tree.leaves(values)[0]
    flags = jnp.zeros(leaf.shape[1:], dtype=bool)
    return seg_scan(curve, flags, values, **kw)


def reduce_last(curve, values, seq_threshold: int = 64, chunk_steps: int = 64):
    """Sum along the last axis with O(1) traced bodies; returns leaves [..., 1]."""
    C = curve

    def step(carry, v):
        return C.add(carry, v), None

    N = _n_last(values)
    while N > seq_threshold:
        K = chunk_steps
        pad = (-N) % K
        if pad:
            zero = C.zero_like(map_leaf(values, lambda a: a[..., :1]))
            values = jax.tree.map(
                lambda v, z: jnp.concatenate(
                    [v, jnp.broadcast_to(z, z.shape[:-1] + (pad,))], axis=-1),
                values, zero)
        Cn = (N + pad) // K
        vals = map_leaf(values, lambda a: jnp.moveaxis(
            a.reshape(a.shape[:-1] + (Cn, K)), -1, 0))
        init = C.zero_like(map_leaf(vals, lambda a: a[0]))
        values, _ = jax.lax.scan(step, init, vals)
        N = Cn

    vals = map_leaf(values, lambda a: jnp.moveaxis(a, -1, 0))
    init = C.zero_like(map_leaf(values, lambda a: a[..., 0]))
    total, _ = jax.lax.scan(step, init, vals)
    return map_leaf(total, lambda a: a[..., None])
