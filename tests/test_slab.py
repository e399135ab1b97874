"""Slab (block) domain decomposition: partition + halo-exchange assembly.

Verifies the shard_map scatter-add-with-halo path against the dense
single-device scatter, ownership/dot-product correctness, and the
partition invariants, on an 8-device virtual CPU mesh.
"""

from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return Mesh(np.array(jax.devices()[:8]), ("shards",))


def _voxel(ncuts):
    from exaconstit_tpu.mesh.voxel import make_cartesian_mesh
    return make_cartesian_mesh(ncuts, [1.0, 1.0, 1.0], order=1)


def test_partition_invariants():
    from exaconstit_tpu.parallel.slab import build_slab_partition

    mesh = _voxel([3, 3, 8])
    part = build_slab_partition(np.asarray(mesh.conn), mesh.num_nodes, 8)
    # every real element appears exactly once in the permutation
    ne = mesh.num_elems
    assert sorted(part.elem_perm[part.elem_mask.reshape(-1) > 0]) == \
        list(range(ne))
    # local connectivity maps back to the global one
    for s in range(part.n_shards):
        g = np.concatenate([part.glob_nodes[s], [-999]])  # trash slot
        back = g[part.conn_local[s]]
        orig = np.asarray(mesh.conn)[part.elem_perm.reshape(
            part.n_shards, part.ne_per)[s]]
        np.testing.assert_array_equal(back, orig)
    # each node owned exactly once
    owners = np.zeros(mesh.num_nodes)
    for s in range(part.n_shards):
        real = part.glob_nodes[s] >= 0
        owners[part.glob_nodes[s][real]] += \
            part.owner_mask[s, :part.n_loc][real]
    np.testing.assert_array_equal(owners, 1.0)


def test_nonadjacent_sharing_rejected():
    from exaconstit_tpu.parallel.slab import build_slab_partition

    mesh = _voxel([2, 2, 2])
    conn = np.asarray(mesh.conn)
    # scramble element order so blocks share nodes across distance
    rng = np.random.default_rng(0)
    with pytest.raises(ValueError):
        build_slab_partition(conn[rng.permutation(len(conn))],
                             mesh.num_nodes, 4)


def test_scatter_halo_matches_dense(mesh8):
    from exaconstit_tpu.parallel.slab import SlabOps, build_slab_partition

    mesh = _voxel([3, 4, 8])
    conn = np.asarray(mesh.conn)
    part = build_slab_partition(conn, mesh.num_nodes, 8)
    ops = SlabOps(part, mesh8)

    rng = np.random.default_rng(1)
    evec = rng.normal(size=(mesh.num_elems, conn.shape[1], 3))
    # dense reference
    dense = np.zeros((mesh.num_nodes, 3))
    np.add.at(dense, conn.reshape(-1), evec.reshape(-1, 3))

    evec_blk = (evec[part.elem_perm]
                * part.elem_mask.reshape(-1)[:, None, None]).reshape(
        part.n_shards, part.ne_per, conn.shape[1], 3)

    @partial(shard_map, mesh=mesh8,
             in_specs=(P("shards"),) * 6, out_specs=P("shards"))
    def scat(e, cl, su, rd, sd, ru):
        return ops.scatter_add_halo(e[0], cl[0], su[0], rd[0], sd[0],
                                    ru[0])[None]

    y_loc = scat(jnp.asarray(evec_blk), ops.conn_local, ops.send_up,
                 ops.recv_dn, ops.send_dn, ops.recv_up)
    got = ops.to_global(np.asarray(y_loc), mesh.num_nodes)
    np.testing.assert_allclose(got, dense, rtol=0, atol=1e-12)

    # ALL copies (not just owned) must agree with the dense result --
    # the halo exchange makes every shard's shared rows complete
    y_np = np.asarray(y_loc)
    for s in range(part.n_shards):
        real = part.glob_nodes[s] >= 0
        np.testing.assert_allclose(y_np[s, :part.n_loc][real],
                                   dense[part.glob_nodes[s][real]],
                                   atol=1e-12)


def test_owner_masked_dot(mesh8):
    from exaconstit_tpu.parallel.slab import SlabOps, build_slab_partition

    mesh = _voxel([2, 3, 8])
    part = build_slab_partition(np.asarray(mesh.conn), mesh.num_nodes, 8)
    ops = SlabOps(part, mesh8)
    rng = np.random.default_rng(2)
    a = rng.normal(size=(mesh.num_nodes, 3))
    b = rng.normal(size=(mesh.num_nodes, 3))
    a_loc, b_loc = ops.to_local(a), ops.to_local(b)

    @partial(shard_map, mesh=mesh8, in_specs=(P("shards"),) * 3,
             out_specs=P())
    def dot(al, bl, om):
        return ops.dot(al[0], bl[0], om[0])

    got = float(dot(jnp.asarray(a_loc), jnp.asarray(b_loc), ops.owner_mask))
    np.testing.assert_allclose(got, float((a * b).sum()), rtol=1e-12)
