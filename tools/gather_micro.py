"""Microbenchmark: which gather layout is fast on this TPU?

The MSM profile shows the two gathers (points into sorted order, bucket
run-ends out of the scanned array) dominate at 80% of the wall.  Candidate
layouts for gathering N random rows of a [16, N] limb-plane array:

  A. lane-gather (current): jnp.take(a[L, N], idx[G, N], axis=-1)
  B. row-gather + transpose: a.T -> [N, L]; jnp.take(rows, idx, axis=0)
     -> [G, N, L]; transpose back to [L, G, N]
  C. row-gather, coords packed [N, 2L] (X|Y in one row) -> one gather for
     both coordinates
"""

import time
import numpy as np
import jax
import jax.numpy as jnp

L, N, G = 16, 1 << 20, 8
rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, 1 << 16, (L, N), np.uint32))
y = jnp.asarray(rng.integers(0, 1 << 16, (L, N), np.uint32))
idx = jnp.asarray(rng.integers(0, N, (G, N), np.uint32))


def t(f, *a, reps=5):
    out = jax.block_until_ready(jax.jit(f)(*a))
    t0 = time.time()
    for _ in range(reps):
        out = jax.block_until_ready(jax.jit(f)(*a))
    leaves = jax.tree.leaves(out)
    return (time.time() - t0) / reps


def lane_gather(x, y, idx):
    return (jnp.take(x, idx, axis=-1), jnp.take(y, idx, axis=-1))


def row_gather(x, y, idx):
    xr = x.T  # [N, L]
    yr = y.T
    gx = jnp.take(xr, idx.reshape(-1), axis=0).reshape(G, N, L)
    gy = jnp.take(yr, idx.reshape(-1), axis=0).reshape(G, N, L)
    return (jnp.moveaxis(gx, -1, 0), jnp.moveaxis(gy, -1, 0))


def row_gather_packed(x, y, idx):
    rows = jnp.concatenate([x.T, y.T], axis=1)  # [N, 2L]
    g = jnp.take(rows, idx.reshape(-1), axis=0).reshape(G, N, 2 * L)
    g = jnp.moveaxis(g, -1, 0)
    return g[:L], g[L:]


def transpose_only(x, y, idx):
    return (x.T, y.T)


# small-output gather (the bucket run-end shape): B values out of N lanes
B = 32769
idx_b = jnp.asarray(rng.integers(0, N, (G, B), np.uint32))


def lane_gather_small(x, idx_b):
    return jnp.take_along_axis(
        jnp.broadcast_to(x[:, None, :], (L, G, N)),
        jnp.broadcast_to(idx_b[None], (L, G, B)), axis=-1)


def row_gather_small(x, idx_b):
    g = jnp.take(x.T, idx_b.reshape(-1), axis=0).reshape(G, B, L)
    return jnp.moveaxis(g, -1, 0)


for name, f, a in [
    ("A lane-gather [L,N]ix[G,N]", lane_gather, (x, y, idx)),
    ("B row-gather+transpose", row_gather, (x, y, idx)),
    ("C row-gather packed 2L", row_gather_packed, (x, y, idx)),
    ("  (transpose alone)", transpose_only, (x, y, idx)),
    ("D lane-gather small B", lane_gather_small, (x, idx_b)),
    ("E row-gather small B", row_gather_small, (x, idx_b)),
]:
    dt = t(f, *a)
    print(f"{name:28s} {dt*1e3:9.2f} ms")
