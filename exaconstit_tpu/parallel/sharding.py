"""Device-mesh sharding of the mechanics system.

The reference's only distributed strategy is domain decomposition over
elements via MPI/metis (SURVEY.md section 2.3).  The TPU-native mapping:

* all quadrature/element arrays (state, stress, per-element stiffness,
  connectivity) shard on their leading element axis across a 1-D
  ``jax.sharding.Mesh`` axis ``"elems"``;
* nodal T-vectors (coordinates, velocity, residual) are replicated —
  E->T scatter-adds become per-device partial sums + an all-reduce that
  the SPMD partitioner inserts automatically (the analog of MFEM's
  P^T prolongation transpose, src/mechanics_operator_ext.cpp:149-157);
* Krylov dot products run on replicated vectors, so no extra collectives.

For meshes that don't divide the device count, elements are padded with
copies of element 0 whose contributions are masked to zero.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_device_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("elems",))


def elem_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("elems"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_elements(n_elems: int, n_shards: int) -> int:
    """Padded element count (next multiple of n_shards)."""
    return ((n_elems + n_shards - 1) // n_shards) * n_shards
