"""Site-axis distribution over a TPU device mesh.

The reference library is single-process; its consumers (RAxML-NG/ExaML)
scale by giving each MPI rank a slice of alignment columns and reducing
per-rank logL/d1/d2 sums (design affordance visible in
reference: /root/reference/src/pll.c:1112 pattern weights and the per-site
outputs of /root/reference/src/likelihood.c:122). The TPU-native equivalent
replaces MPI with the JAX collective stack:

  * one `jax.sharding.Mesh` over the pod slice with a single `'sites'` axis;
  * CLVs/scalers/pattern-weights/invariant flags sharded on their site axis,
    P-matrices/eigensystems/topology replicated (tiny);
  * the only cross-device communication the math needs are three scalar
    reductions — logL sum, d1 sum, d2 sum (see
    reference: /root/reference/src/core_likelihood.c:200-207 and
    /root/reference/src/core_derivatives.c:844-848, plain weighted sums over
    sites) — which XLA lowers to `psum` over ICI when we annotate shardings
    and jit (GSPMD). No halo exchange: every site is independent given the
    shared P-matrices.

Because every kernel in ops/ treats the site axis elementwise until the
final reduction, sharding is purely an annotation exercise: `shard_partition`
re-places the big per-site arrays with NamedShardings and all jitted ops
run SPMD unchanged.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SITES_AXIS = "sites"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the site axis (the library's data-parallel axis)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (SITES_AXIS,))


def clv_sharding(mesh: Mesh) -> NamedSharding:
    """CLV layout is [node, rate, state, site] — shard the site lanes."""
    return NamedSharding(mesh, P(None, None, None, SITES_AXIS))


def scaler_sharding(mesh: Mesh, rate_scalers: bool) -> NamedSharding:
    spec = P(None, None, SITES_AXIS) if rate_scalers else P(None, SITES_AXIS)
    return NamedSharding(mesh, spec)


def site_vector_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(SITES_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_partition(partition, mesh: Mesh) -> None:
    """Re-place a Partition's site-major arrays across the mesh, in place.

    Requires `sites_padded % mesh.size == 0`; create the partition with
    `sites_alignment=mesh.size` (or a multiple) to guarantee it. P-matrices
    are replicated — they are [edges, rates, states, states], independent of
    sites, and every shard needs all of them.
    """
    n = mesh.devices.size
    if partition.repeats is not None:
        # class identity is a per-shard property (SURVEY §7: repeats are a
        # compute-saving dedup, local to each rank's site slice in the
        # reference's MPI consumers). The pooled class-column layout has
        # no site axis to shard; distribute by splitting the alignment
        # into per-device partitions (each with its own repeats tables)
        # and summing logL/d1/d2 — the PartitionedEngine pattern.
        raise ValueError(
            "site-repeats partitions cannot be sharded on the site axis: "
            "split the alignment into per-device partitions (each with "
            "local repeats classes) and reduce their logL/d1/d2 sums, as "
            "the reference's MPI consumers do (see partitioned.py)")
    if partition.sites_padded % n:
        raise ValueError(
            f"sites_padded={partition.sites_padded} not divisible by mesh "
            f"size {n}; create the partition with sites_alignment={n}")
    partition.clv = jax.device_put(partition.clv, clv_sharding(mesh))
    partition.scale_buffer = jax.device_put(
        partition.scale_buffer,
        scaler_sharding(mesh, partition.rate_scalers))
    partition.pmatrix = jax.device_put(partition.pmatrix, replicated(mesh))
    partition.mesh = mesh
