"""Multi-chip sharding — the TPU-native replacement for the worker pool.

The reference's entire distribution story is: split MSM points into
contiguous chunks, one postMessage per worker, linear reduce of partial sums
on the main thread (src/bn128.js:353-415), plus task-parallel protocol steps
over the same pool.  Here the same dataflow is a single SPMD program:

  * MSM: shard_map over a "points" mesh axis — every device runs the full
    bucketed Pippenger on its shard (ops/msm.py), then one all_gather of the
    per-device partial sums (3 field elements each — bytes, not buffers) and
    a replicated fold.  This is communication-optimal: points never move,
    only 96/192-byte partials ride ICI, exactly like the reference's
    transferable-ArrayBuffer partials but without a host hop.
  * NTT / elementwise pipelines: annotate the domain axis with a sharding
    and let XLA GSPMD insert the all-to-alls between butterfly super-stages
    (SURVEY.md §2.5's "domain-axis sharding").

No failure handling is lost relative to the reference: it had none
(TERMINATE = process.exit, bn128.js:167).  SPMD scheduling is static in the
compiled program.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.curve import JacobianDevice, map_leaf
from ..ops.msm import MSMDevice
from ..ops.scan import reduce_last


def make_mesh(n_devices: int | None = None, axis: str = "points") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def make_mesh_2d(n_hosts: int, chips_per_host: int | None = None,
                 axes: tuple = ("host", "points")) -> Mesh:
    """Hierarchical (host x chip) mesh — the multi-slice/DCN layout.

    Collectives over the trailing (chip) axis ride ICI within a host's
    slice; the leading (host) axis crosses DCN.  The MSM's partial-sum
    gather is a few hundred bytes per device, so a flattened
    P(("host", "points")) sharding keeps the DCN leg trivial — XLA lowers
    the all_gather hierarchically.  On a single host this still validates
    the program structure (the driver's virtual 8-CPU mesh runs it as
    2 x 4)."""
    devs = jax.devices()
    per = chips_per_host or len(devs) // n_hosts
    n = n_hosts * per
    assert n <= len(devs), f"need {n} devices, have {len(devs)}"
    return Mesh(np.array(devs[:n]).reshape(n_hosts, per), axes)


def msm_sharded(msm: MSMDevice, mesh: Mesh, axis="points"):
    """Returns a jitted sharded MSM: scalars [Lr, N], affine points (X, Y)
    leaves [.., N] sharded along N; result = per-window sums, Jacobian
    leaves [.., n_windows], replicated (fold with
    ops.msm.fold_windows_device on device or fold_windows on the host).

    Per-device partial *window sums* ride ICI (n_windows points each — a few
    KB), the points never move: the same dataflow as the reference's
    chunk-per-worker + partial reduce (src/bn128.js:353-415), minus the host
    relay.  N is padded internally to a mesh multiple (zero scalars on
    affine-zero points carry weight 0), so callers can feed pkey arrays of
    any length.

    axis may be one mesh axis name or a tuple of names (e.g.
    ("host", "points") from make_mesh_2d): points then shard over the
    flattened axes and the partial gather lowers hierarchically
    (ICI within a host, DCN across)."""
    C = msm.curve
    axis = axis if isinstance(axis, tuple) else (axis,)
    D = int(np.prod([mesh.shape[a] for a in axis]))

    def local(scalars, points):
        win = msm.msm(scalars, points)           # Jacobian leaves [.., W]
        # gather partials: [.., W, D], then fold over devices
        gath = map_leaf(
            win, lambda a: jax.lax.all_gather(a, axis, axis=a.ndim))
        red = reduce_last(C, gath)               # [.., W, 1]
        return map_leaf(red, lambda a: a[..., 0])

    def build(scalars, points):
        n = scalars.shape[-1]
        pad = (-n) % D
        if pad:
            scalars = jnp.pad(scalars, ((0, 0), (0, pad)))
            points = map_leaf(points, lambda a: jnp.pad(
                a, [(0, 0)] * (a.ndim - 1) + [(0, pad)]))
        pt_specs = map_leaf(points, lambda a: P(*([None] * (a.ndim - 1) + [axis])))
        # output tree is Jacobian (X, Y, Z) with the same leaf layout as the
        # affine inputs plus a Z mirroring X
        jac_like = (points[0], points[1], points[0])
        return shard_map(
            local, mesh=mesh,
            in_specs=(P(None, axis), pt_specs),
            out_specs=map_leaf(jac_like, lambda a: P(*([None] * a.ndim))),
            check_vma=False,
        )(scalars, points)

    return jax.jit(build)


def msm_sharded_point(msm: MSMDevice, mesh: Mesh, axis: str = "points"):
    """Sharded MSM folded to a single Jacobian point on device — the form
    the mesh-aware prover consumes (no host round-trip per MSM)."""
    from ..ops.msm import fold_windows_device

    sharded = msm_sharded(msm, mesh, axis)

    def run(scalars, points):
        win = sharded(scalars, points)
        return fold_windows_device(msm.curve, win, msm.c)

    # jit the whole pipeline: without this the window fold (W fori_loop
    # steps of batch-1 group ops) dispatches eagerly op-by-op per call
    return jax.jit(run)
