"""Block-partitioned (slab) domain decomposition with halo exchange.

Scale-ready analog of the reference's MPI domain decomposition: elements
are split into contiguous blocks across the device mesh, every device
owns the nodes its elements touch (boundary node planes are shared with
the neighboring block), and the E->T scatter-add becomes a LOCAL
scatter-add plus a neighbor-only halo exchange (``jax.lax.ppermute``) —
per-matvec communication is O(surface), not O(nodes), unlike the
replicated-node path in parallel/sharding.py (which all-reduces a full
``(num_nodes, 3)`` array per Krylov matvec).  This mirrors MFEM's
P/P^T prolongation pair (src/mechanics_operator_ext.cpp:149-157), where
neighbor exchange also hides inside the parallel assembly.

The partition is computed from the connectivity alone, so it works for
voxel and file meshes alike; the only requirement is that node sharing
is neighbor-local in the element ordering (true for lexicographic voxel
ordering and for meshes ordered along one axis).  Reductions (dots,
norms, volume averages) mask non-owned node copies and ``psum``.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class SlabPartition:
    """Static partition data (numpy, stacked over the shard axis)."""

    n_shards: int
    ne_per: int            # elements per shard (padded)
    n_loc: int             # local node slots per shard (max, padded)
    m_halo: int            # halo exchange slots (max, padded)
    glob_nodes: np.ndarray  # (S, n_loc) global node id per local slot (-1 pad)
    conn_local: np.ndarray  # (S, ne_per, nen) local node indices
    elem_mask: np.ndarray   # (S, ne_per) 1.0 for real elements
    owner_mask: np.ndarray  # (S, n_loc + 1) 1.0 where this shard owns node
    send_up: np.ndarray     # (S, m_halo) local idx shared with shard s+1
    recv_dn: np.ndarray     # (S, m_halo) local idx for data from shard s-1
    send_dn: np.ndarray     # (S, m_halo) local idx shared with shard s-1
    recv_up: np.ndarray     # (S, m_halo) local idx for data from shard s+1
    elem_perm: np.ndarray   # (S * ne_per,) original element index (padded)

    @property
    def trash(self):
        """Dead local row used for halo/scatter padding."""
        return self.n_loc


def build_slab_partition(conn: np.ndarray, num_nodes: int,
                         n_shards: int) -> SlabPartition:
    """Partition elements into contiguous blocks; derive local numbering,
    ownership, and neighbor halo exchange lists.

    Raises ValueError if any node is shared between non-adjacent blocks
    (the caller should fall back to the replicated-node path).
    """
    ne = conn.shape[0]
    nen = conn.shape[1]
    ne_per = (ne + n_shards - 1) // n_shards
    ne_pad = ne_per * n_shards
    perm = np.arange(ne_pad)
    perm[ne:] = 0  # pad with copies of element 0 (masked)
    conn_pad = conn[perm]  # (ne_pad, nen)
    elem_mask = (perm_mask := np.zeros(ne_pad))
    perm_mask[:ne] = 1.0
    blocks = conn_pad.reshape(n_shards, ne_per, nen)
    mask_blk = elem_mask.reshape(n_shards, ne_per)

    glob, conn_local, owner, shared_up = [], [], [], []
    node_owner = np.full(num_nodes, -1, dtype=np.int64)
    for s in range(n_shards):
        nodes = np.unique(blocks[s])
        glob.append(nodes)
        lut = np.full(num_nodes, -1, dtype=np.int64)
        lut[nodes] = np.arange(nodes.size)
        conn_local.append(lut[blocks[s]])
        first = node_owner[nodes] == -1
        node_owner[nodes[first]] = s
        owner.append(node_owner[nodes] == s)

    # neighbor sharing (and check nothing is shared farther than +-1)
    seen_by = {}
    for s in range(n_shards):
        for nd in glob[s]:
            seen_by.setdefault(int(nd), []).append(s)
    for nd, ss in seen_by.items():
        if ss[-1] - ss[0] > 1:
            raise ValueError(
                f"node {nd} shared by non-adjacent blocks {ss}; "
                "slab partition needs axis-ordered elements")

    for s in range(n_shards):
        if s + 1 < n_shards:
            sh = np.intersect1d(glob[s], glob[s + 1])
        else:
            sh = np.zeros(0, dtype=np.int64)
        shared_up.append(sh)

    n_loc = max(g.size for g in glob)
    m_halo = max(1, max(sh.size for sh in shared_up))
    trash = n_loc

    S = n_shards
    glob_nodes = np.full((S, n_loc), -1, dtype=np.int64)
    conn_l = np.zeros((S, ne_per, nen), dtype=np.int32)
    owner_mask = np.zeros((S, n_loc + 1))
    send_up = np.full((S, m_halo), trash, dtype=np.int32)
    recv_dn = np.full((S, m_halo), trash, dtype=np.int32)
    send_dn = np.full((S, m_halo), trash, dtype=np.int32)
    recv_up = np.full((S, m_halo), trash, dtype=np.int32)
    for s in range(S):
        g = glob[s]
        glob_nodes[s, :g.size] = g
        conn_l[s] = conn_local[s]
        owner_mask[s, :g.size] = owner[s].astype(float)
        lut = np.full(num_nodes, trash, dtype=np.int64)
        lut[g] = np.arange(g.size)
        if s + 1 < S:
            sh = shared_up[s]
            send_up[s, :sh.size] = lut[sh]
            # shard s+1's local indices of the same (sorted) globals
            lut1 = np.full(num_nodes, trash, dtype=np.int64)
            lut1[glob[s + 1]] = np.arange(glob[s + 1].size)
            recv_dn[s + 1, :sh.size] = lut1[sh]
            send_dn[s + 1, :sh.size] = lut1[sh]
            recv_up[s, :sh.size] = lut[sh]

    return SlabPartition(
        n_shards=S, ne_per=ne_per, n_loc=n_loc, m_halo=m_halo,
        glob_nodes=glob_nodes, conn_local=conn_l, elem_mask=mask_blk,
        owner_mask=owner_mask, send_up=send_up, recv_dn=recv_dn,
        send_dn=send_dn, recv_up=recv_up, elem_perm=perm)


class SlabOps:
    """Device-side slab operations (for use INSIDE shard_map over a 1-D
    ``"shards"`` mesh axis).

    All per-shard constant index arrays are closed over as sharded
    jnp arrays with leading shard axis; methods take/return the local
    block WITHOUT the leading shard axis of size 1 (callers squeeze).
    """

    def __init__(self, part: SlabPartition, mesh: Mesh):
        self.part = part
        self.mesh = mesh
        self.AXIS = mesh.axis_names[0]
        shard = NamedSharding(mesh, P(self.AXIS))
        put = lambda a: jax.device_put(jnp.asarray(a), shard)
        self.conn_local = put(part.conn_local)
        self.elem_mask = put(part.elem_mask)
        self.owner_mask = put(part.owner_mask)
        self.send_up = put(part.send_up)
        self.recv_dn = put(part.recv_dn)
        self.send_dn = put(part.send_dn)
        self.recv_up = put(part.recv_up)
        self.perm_fwd = [(i, i + 1) for i in range(part.n_shards - 1)]
        self.perm_bwd = [(i + 1, i) for i in range(part.n_shards - 1)]

    # ---- conversions (host side) ------------------------------------------
    def to_local(self, tvec_global: np.ndarray) -> np.ndarray:
        """(num_nodes, c) -> (S, n_loc + 1, c) with zero trash row."""
        p = self.part
        out = np.zeros((p.n_shards, p.n_loc + 1) + tvec_global.shape[1:],
                       dtype=tvec_global.dtype)
        for s in range(p.n_shards):
            g = p.glob_nodes[s]
            real = g >= 0
            out[s, :real.sum()] = tvec_global[g[real]]
        return out

    def to_global(self, tvec_local: np.ndarray,
                  num_nodes: int) -> np.ndarray:
        """(S, n_loc + 1, c) -> (num_nodes, c), owner rows win."""
        p = self.part
        out = np.zeros((num_nodes,) + tvec_local.shape[2:],
                       dtype=tvec_local.dtype)
        for s in range(p.n_shards):
            g = p.glob_nodes[s]
            own = (p.owner_mask[s, :p.n_loc] > 0) & (g >= 0)
            out[g[own]] = tvec_local[s, :p.n_loc][own]
        return out

    # ---- inside-shard_map kernels -----------------------------------------
    def gather(self, x_loc, conn_local):
        """x_loc (n_loc+1, c...) -> (ne_per, nen, c...)."""
        return x_loc[conn_local]

    def scatter_add_halo(self, evec, conn_local, send_up, recv_dn, send_dn,
                         recv_up):
        """(ne_per, nen, 3) -> (n_loc+1, 3) with neighbor halo exchange."""
        p = self.part
        nl = p.n_loc + 1
        y = jnp.zeros((nl, 3), dtype=evec.dtype)
        y = y.at[conn_local.reshape(-1)].add(evec.reshape(-1, 3))
        y = y.at[p.trash].set(0.0)
        # exchange ORIGINAL partials in both directions, then add
        up = y[send_up]      # partials for nodes shared with s+1
        dn = y[send_dn]      # partials for nodes shared with s-1
        from_below = jax.lax.ppermute(up, self.AXIS, self.perm_fwd)
        from_above = jax.lax.ppermute(dn, self.AXIS, self.perm_bwd)
        y = y.at[recv_dn].add(from_below)
        y = y.at[recv_up].add(from_above)
        return y.at[p.trash].set(0.0)

    def dot(self, a_loc, b_loc, owner_mask):
        """Owner-masked global dot product (psum over shards)."""
        local = jnp.sum(a_loc * b_loc * owner_mask[:, None])
        return jax.lax.psum(local, self.AXIS)
