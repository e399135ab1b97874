"""Finite-element space: global numbering, gather/scatter, essential dofs.

This is the TPU-native replacement for MFEM's ParFiniteElementSpace +
element restriction / prolongation operator pair
(src/mechanics_operator.cpp:227-235, src/mechanics_operator_ext.cpp):

* The "T-vector" is a dense ``(num_nodes, 3)`` array (replicated across the
  device mesh in the sharded driver — see exaconstit_tpu.parallel).
* T -> E ("element restriction") is a gather with static indices.
* E -> T transpose is a scatter-add (``Array.at[].add``), which XLA lowers
  to an efficient sorted scatter since the indices are compile-time
  constants per mesh.
* Essential (Dirichlet) dofs are a static boolean mask ``(num_nodes, 3)``
  built per boundary attribute and component, replicating
  mfem SetEssentialBC + BCData::getComponents semantics
  (src/BCData.cpp:73-118, src/mechanics_operator.cpp:279-285).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..mesh.voxel import HexMesh
from .reference import RefElement, ref_element


@dataclasses.dataclass
class FESpace:
    mesh: HexMesh
    ref: RefElement
    conn: jnp.ndarray  # (nelems, nen) int32 on device

    @classmethod
    def create(cls, mesh: HexMesh) -> "FESpace":
        return cls(mesh=mesh, ref=ref_element(mesh.order),
                   conn=jnp.asarray(mesh.conn))

    @property
    def num_nodes(self):
        return self.mesh.num_nodes

    @property
    def num_elems(self):
        return self.mesh.num_elems

    @property
    def nqpts(self):
        return self.ref.nqpts

    @property
    def nnodes_per_elem(self):
        return self.ref.nnodes

    # -- T <-> E maps ------------------------------------------------------
    def gather(self, tvec):
        """(num_nodes, 3) -> (nelems, nen, 3)."""
        return tvec[self.conn]

    def scatter_add(self, evec):
        """(nelems, nen, 3) -> (num_nodes, 3) transpose-gather (sum-shared)."""
        out = jnp.zeros((self.num_nodes, 3), dtype=evec.dtype)
        return out.at[self.conn.reshape(-1)].add(
            evec.reshape(-1, 3), indices_are_sorted=False,
            unique_indices=False)

    # -- essential dofs ----------------------------------------------------
    def ess_mask(self, active: dict) -> np.ndarray:
        """Boolean (num_nodes, 3) mask of constrained dofs.

        active: {bdr_attr: (bool, bool, bool)} component activation.
        """
        mask = np.zeros((self.num_nodes, 3), dtype=bool)
        for attr, comps in active.items():
            nodes = self.mesh.bdr_nodes.get(int(attr))
            if nodes is None:
                continue
            for c in range(3):
                if comps[c]:
                    mask[nodes, c] = True
        return mask
