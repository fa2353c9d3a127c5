"""Microbenchmark: which gather layout is fast on this TPU?

The MSM profile (tools/profile_msm2.py, honest chiptime syncs) shows the
gathers dominate: point gather 248 ms/group, run-end extraction ~280
ms/group, digit gather 168 ms/group — vs 104 ms for all the EC compute.
Candidate layouts for gathering N random rows of a [16, N] limb-plane
array:

  A. lane-gather (current): jnp.take(a[L, N], idx[G, N], axis=-1)
  B. row-gather + transpose: a.T -> [N, L]; jnp.take(rows, idx, axis=0)
     -> [G, N, L]; transpose back to [L, G, N]
  C. row-gather, coords packed [N, 2L] (X|Y in one row) -> one gather for
     both coordinates
  D/E. the bucket run-end shape: B=32769 positions out of N=2^20 lanes.

NOTE: block_until_ready is dispatch-only on the axon tunnel —
utils/chiptime.py forces real completion.
"""

import sys, os, time
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from wasmsnark_tpu.utils.chiptime import sync, time_reps, read_latency

L, N, G = 16, 1 << 20, 8
rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, 1 << 16, (L, N), np.uint32))
y = jnp.asarray(rng.integers(0, 1 << 16, (L, N), np.uint32))
xr = jnp.asarray(rng.integers(0, 1 << 16, (N, L), np.uint32))
xyr = jnp.asarray(rng.integers(0, 1 << 16, (N, 2 * L), np.uint32))
idx = jnp.asarray(rng.integers(0, N, (G, N), np.uint32))
sync((x, y, xr, xyr, idx))
print(f"read latency {read_latency()*1e3:.0f} ms")


def lane_gather(x, y, idx):
    return (jnp.take(x, idx, axis=-1), jnp.take(y, idx, axis=-1))


def lane_gather_one(x, idx):
    return jnp.take(x, idx, axis=-1)


def row_gather(xr, idx):
    g = jnp.take(xr, idx.reshape(-1), axis=0).reshape(G, N, L)
    return jnp.moveaxis(g, -1, 0)


def row_gather_notrans(xr, idx):
    return jnp.take(xr, idx.reshape(-1), axis=0)


def row_gather_packed(xyr, idx):
    g = jnp.take(xyr, idx.reshape(-1), axis=0).reshape(G, N, 2 * L)
    g = jnp.moveaxis(g, -1, 0)
    return g[:L], g[L:]


xyp = jnp.asarray(rng.integers(0, 1 << 32, (N, L), np.uint32))  # 2x16b packed


def row_gather_u32packed(xyp, idx):
    """Both coords' 16-bit limbs packed two-per-u32: rows are 64 B instead
    of 128 B; unpack back to [2L] planes with shift/mask after the gather."""
    g = jnp.take(xyp, idx.reshape(-1), axis=0).reshape(G, N, L)
    g = jnp.moveaxis(g, -1, 0)
    return (g & 0xFFFF, g >> 16)


def transpose_only(x):
    return x.T


def big_transpose(g):  # [G, N, L] -> [L, G, N]
    return jnp.moveaxis(g, -1, 0)


# small-output gather (the bucket run-end shape): B values out of N lanes
B = 32769
idx_b = jnp.asarray(rng.integers(0, N, (G, B), np.uint32))
gbig = jnp.asarray(rng.integers(0, 1 << 16, (G, N, L), np.uint32))
sync((idx_b, gbig))


def lane_gather_small(x, idx_b):
    return jnp.take_along_axis(
        jnp.broadcast_to(x[:, None, :], (L, G, N)),
        jnp.broadcast_to(idx_b[None], (L, G, B)), axis=-1)


def row_gather_small(xr, idx_b):
    g = jnp.take(xr, idx_b.reshape(-1), axis=0).reshape(G, B, L)
    return jnp.moveaxis(g, -1, 0)


for name, f, a in [
    ("A lane-gather 2x[L,N] ix[G,N]", lane_gather, (x, y, idx)),
    ("A1 lane-gather 1x[L,N]", lane_gather_one, (x, idx)),
    ("B row-gather [N,L]+transpose", row_gather, (xr, idx)),
    ("B1 row-gather no transpose", row_gather_notrans, (xr, idx)),
    ("C row-gather packed [N,2L]", row_gather_packed, (xyr, idx)),
    ("C2 row-gather u32-packed [N,L]", row_gather_u32packed, (xyp, idx)),
    ("  transpose [L,N]->[N,L]", transpose_only, (x,)),
    ("  transpose [G,N,L]->[L,G,N]", big_transpose, (gbig,)),
    ("D lane-gather small B", lane_gather_small, (x, idx_b)),
    ("E row-gather small B", row_gather_small, (xr, idx_b)),
]:
    g = jax.jit(f)
    sync(g(*a))
    dt = time_reps(g, *a, reps=3, warm=False)
    print(f"{name:30s} {dt*1e3:9.2f} ms")
