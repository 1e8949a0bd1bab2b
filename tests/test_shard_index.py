"""Sharded-index mode (SURVEY §2.5 TP analog): routed occ/invPsi/SA
probes over a genome-coordinate-sharded index == the replicated
DeviceIndex, on the 8-virtual-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpubwa.dist.mesh import make_mesh
from tpubwa.dist.shard_index import (ShardedIndex, inv_psi_sharded,
                                     occ4_all_sharded, run_sharded,
                                     sa_lookup_sharded)
from tpubwa.index.builder import build_index
from tpubwa.index.device import (DeviceIndex, inv_psi, occ4_all, sa_lookup)
from tpubwa.utils import dna


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(77)
    genome = dna.decode(rng.integers(0, 4, 30_000).astype(np.uint8))
    idx = build_index([("c1", genome)])
    didx = DeviceIndex.from_host(idx)
    mesh = make_mesh(8)
    sidx = ShardedIndex.from_device_index(didx, mesh)
    return didx, sidx, mesh


def test_sharding_actually_shards(world):
    didx, sidx, mesh = world
    # each device holds 1/8 of the occ rows (footprint claim of the mode)
    shard = sidx.occ_fused.addressable_shards[0]
    assert shard.data.shape[0] * 8 == sidx.occ_fused.shape[0]
    assert sidx.occ_rows_per_shard == shard.data.shape[0]


def test_occ4_routed_matches_replicated(world):
    didx, sidx, mesh = world
    rng = np.random.default_rng(1)
    ks = jnp.asarray(rng.integers(-1, 2 * int(didx.l_pac), 512),
                     dtype=didx.L2.dtype)
    want = occ4_all(didx, ks)
    got = run_sharded(mesh, occ4_all_sharded, sidx, ks)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_invpsi_routed_matches_replicated(world):
    didx, sidx, mesh = world
    rng = np.random.default_rng(2)
    ks = jnp.asarray(rng.integers(0, 2 * int(didx.l_pac), 512),
                     dtype=didx.L2.dtype)
    want = inv_psi(didx, ks)
    got = run_sharded(mesh, inv_psi_sharded, sidx, ks)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sa_walk_routed_matches_replicated(world):
    didx, sidx, mesh = world
    rng = np.random.default_rng(3)
    ks = jnp.asarray(rng.integers(1, 2 * int(didx.l_pac), 256),
                     dtype=didx.L2.dtype)
    valid = jnp.asarray(rng.integers(0, 2, 256).astype(bool))
    want = sa_lookup(didx, ks, valid)
    got = run_sharded(mesh, sa_lookup_sharded, sidx, ks, valid)
    np.testing.assert_array_equal(
        np.asarray(got)[np.asarray(valid)],
        np.asarray(want)[np.asarray(valid)])


def test_backward_search_routed_matches_replicated(world):
    """Full backward search of random queries — the seeding hot loop —
    step-for-step identical over the sharded index."""
    from tpubwa.dist.shard_index import backward_ext_sharded
    from tpubwa.index.device import backward_ext
    didx, sidx, mesh = world
    rng = np.random.default_rng(4)
    B, Q = 64, 21
    qs = rng.integers(0, 4, (B, Q)).astype(np.int32)
    dt = didx.L2.dtype

    def search(step_fn, holder):
        k = jnp.zeros((B,), dt)
        s = jnp.full((B,), 2 * int(didx.l_pac) + 1, dt)
        ks, ss = [], []
        for j in range(Q - 1, -1, -1):
            c = jnp.asarray(qs[:, j])
            alive = s > 0
            k2, s2 = step_fn(holder, jnp.where(alive, k, 1),
                             jnp.where(alive, s, 1),
                             jnp.where(alive, c, 0))
            k = jnp.where(alive & (s2 > 0), k2, k)
            s = jnp.where(alive, jnp.maximum(s2, 0), s)
            ks.append(k); ss.append(s)
        return jnp.stack(ks), jnp.stack(ss)

    want = search(backward_ext, didx)

    def sharded_search(sidx_):
        return search(lambda h, k, s, c: backward_ext_sharded(h, k, s, c),
                      sidx_)

    got = run_sharded(mesh, sharded_search, sidx)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))
