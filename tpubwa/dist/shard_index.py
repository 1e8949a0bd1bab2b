"""Sharded-index mode: the FM-index split by genome coordinate across the
mesh (SURVEY.md §2.5 "index sharding (optional TP analog)").

The replicated index costs ~6.5 GB HBM/chip at GRCh38 scale (docs/
SCALING.md); sharding the three big arrays — fused occ rows, sampled SA,
packed genome rows — across N chips cuts that to ~1/N + the replicated
small remainder, buying headroom for bigger read batches or larger
genomes (e.g. pan-genome references) at the price of one collective per
index probe round.

Routing design (XLA collectives, not point-to-point): every index probe
is a (rank -> row) lookup whose owner shard is ``row // rows_per_shard``.
A probe round all_gathers the query block across the mesh (queries are a
few KB — the ROWS are the gigabytes), each device answers the queries
whose rows it owns from its local shard, and a psum combines the
disjoint answers. Traffic per round is O(mesh * queries), independent of
index size, and rides ICI. This is the `ppermute`-free formulation of
SNIPPETS.md's request-routing pattern: for the small per-step query
blocks of the seeding walk an all_gather+psum is one fused collective
and beats two ppermute rounds (request + response) at these sizes.

What is wired today: the three probe primitives (occ4 checkpoint row,
invPsi/LF step, SA resolution walk) + equivalence tests vs the
replicated DeviceIndex on an 8-virtual-device mesh (tests/
test_shard_index.py). The seeding walk consumes these through the same
(didx-like, rank) -> count signatures as index.device, so switching
collect_smems_lut to a sharded index is a didx-object swap, not an
algorithm change; it stays off the default path because the replicated
index is faster whenever it fits (the north-star configs).
[bwa: bwt.c :: bwt_occ, bwt_invPsi, bwt_sa]
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..index.device import (DeviceIndex, _count_first, _row_cp, sel4,
                            sel_vec)
from .mesh import READS_AXIS


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ShardedIndex:
    """DeviceIndex with occ_fused/sa_samples/pac_rows sharded row-wise
    over the mesh axis; small arrays (L2, ann_end) replicated.

    Shard geometry is static: rows are padded to mesh-size multiples, and
    each device owns the contiguous block [device_id * rows_per_shard,
    +rows_per_shard) — genome-coordinate sharding, matching the survey's
    TP-analog description.
    """
    l_pac: int
    primary: int
    sa_intv: int
    occ_rows_per_shard: int
    sa_rows_per_shard: int
    L2: jnp.ndarray
    occ_fused: jnp.ndarray     # (n_cp_padded, 8) sharded on rows
    sa_samples: jnp.ndarray    # (n_samp_padded,) sharded
    ann_end: jnp.ndarray

    def tree_flatten(self):
        return ((self.L2, self.occ_fused, self.sa_samples, self.ann_end),
                (self.l_pac, self.primary, self.sa_intv,
                 self.occ_rows_per_shard, self.sa_rows_per_shard))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], aux[1], aux[2], aux[3], aux[4], children[0],
                   children[1], children[2], children[3])

    @staticmethod
    def from_device_index(didx: DeviceIndex, mesh: Mesh) -> "ShardedIndex":
        n = mesh.devices.size
        occ = np.asarray(didx.occ_fused)
        pad_o = (-occ.shape[0]) % n
        if pad_o:
            occ = np.concatenate(
                [occ, np.zeros((pad_o, 8), occ.dtype)], axis=0)
        sa = np.asarray(didx.sa_samples)
        pad_s = (-sa.shape[0]) % n
        if pad_s:
            sa = np.concatenate([sa, np.zeros(pad_s, sa.dtype)])
        sh = NamedSharding(mesh, P(READS_AXIS))
        return ShardedIndex(
            l_pac=didx.l_pac, primary=didx.primary, sa_intv=didx.sa_intv,
            occ_rows_per_shard=occ.shape[0] // n,
            sa_rows_per_shard=sa.shape[0] // n,
            L2=didx.L2,
            occ_fused=jax.device_put(occ, sh),
            sa_samples=jax.device_put(sa, sh),
            ann_end=didx.ann_end,
        )


def _routed_rows(rows_local, want_row, axis=READS_AXIS):
    """The routing core: fetch global rows `want_row` (B,) from the
    row-sharded (R_local, F) array. all_gather the wanted row ids, answer
    locally-owned ones, psum the disjoint answers. Runs INSIDE shard_map;
    want_row may be replicated or per-device (caller chooses specs)."""
    R_local = rows_local.shape[0]
    my = jax.lax.axis_index(axis)
    base = my.astype(want_row.dtype) * R_local
    local_idx = want_row - base
    mine = (local_idx >= 0) & (local_idx < R_local)
    got = rows_local[jnp.clip(local_idx, 0, R_local - 1).astype(jnp.int32)]
    got = jnp.where(mine[..., None] if got.ndim > want_row.ndim
                    else mine, got, 0)
    return jax.lax.psum(got, axis)


def occ4_all_sharded(sidx: ShardedIndex, k):
    """occ of all 4 bases at conceptual index k — the sharded analog of
    index.device.occ4_all; call inside shard_map with k replicated."""
    n = jnp.where(k < 0, 0, k + 1 - (k >= sidx.primary).astype(k.dtype))
    n = jnp.maximum(n, 0)
    r = jnp.maximum(n - 1, 0) >> 6
    row = _routed_rows(sidx.occ_fused, r)
    m = (n - r * 64).astype(jnp.int32)
    words = row[..., 4:8].astype(jnp.uint32)
    cnts = jnp.stack(
        [_count_first(words, jnp.full_like(m, c), m) for c in range(4)],
        axis=-1)
    return row[..., 0:4].astype(jnp.int32) + cnts


def inv_psi_sharded(sidx: ShardedIndex, k):
    """LF step on conceptual rank over the sharded occ rows."""
    x = k - (k > sidx.primary).astype(k.dtype)
    row = _routed_rows(sidx.occ_fused, (x >> 6))
    word = sel4(row[..., 4:8].astype(jnp.int32),
                ((x >> 4) & 3).astype(jnp.int32)).astype(jnp.uint32)
    c = ((word >> (2 * (x & 15)).astype(jnp.uint32)) &
         jnp.uint32(3)).astype(jnp.int32)
    cnt = _row_cp(row.astype(jnp.uint32), c) + _count_first(
        row[..., 4:8].astype(jnp.uint32), c,
        ((x & 63) + 1).astype(jnp.int32))
    res = sel_vec(sidx.L2, c, 4) + cnt
    return jnp.where(k == sidx.primary, 0, res).astype(k.dtype)


def occ1_sharded(sidx: ShardedIndex, k, c):
    """Count of base c in stored-BWT[0..k] inclusive (conceptual k) —
    sharded analog of index.device.occ1, one routed row per query."""
    n = jnp.where(k < 0, 0, k + 1 - (k >= sidx.primary).astype(k.dtype))
    n = jnp.maximum(n, 0)
    r = jnp.maximum(n - 1, 0) >> 6
    row = _routed_rows(sidx.occ_fused, r)
    m = (n - r * 64).astype(jnp.int32)
    return _row_cp(row.astype(jnp.uint32), c) + _count_first(
        row[..., 4:8].astype(jnp.uint32), c, m)


def backward_ext_sharded(sidx: ShardedIndex, k, s, c):
    """Backward extension of interval (k, s) by base c over the sharded
    index [bwa: bwt.c :: bwt_extend is_back=1] — the seeding hot loop's
    probe. Two stacked occ queries ride ONE routing round."""
    ks = jnp.stack([k - 1, k - 1 + s], axis=0)
    occ = occ1_sharded(sidx, ks, jnp.stack([c, c], axis=0))
    k2 = sel_vec(sidx.L2, c, 4) + 1 + occ[0]
    s2 = occ[1] - occ[0]
    return k2, s2


def sa_lookup_sharded(sidx: ShardedIndex, k, valid):
    """Batched bwt_sa over the sharded index: lockstep invPsi rounds (each
    one collective) until every live lane hits a sampled rank, then a
    routed fetch from the sharded SA samples."""
    mask = sidx.sa_intv - 1

    def body(state):
        kk, steps, live = state
        live = live & ((kk & mask) != 0)
        k2 = jnp.where(live, inv_psi_sharded(sidx, jnp.where(live, kk, 0)),
                       kk)
        return k2, steps + live.astype(kk.dtype), live

    def cond(state):
        return jnp.any(state[2])

    k0 = jnp.where(valid, k, 0)
    kf, steps, _ = jax.lax.while_loop(
        cond, body, (k0, jnp.zeros_like(k0), valid))
    samp_row = (kf >> int(np.log2(sidx.sa_intv)))
    samp = _routed_rows(sidx.sa_samples, samp_row)
    return steps + samp


def run_sharded(mesh: Mesh, fn, sidx: ShardedIndex, *args):
    """Helper: jit(shard_map(...)) a probe over replicated query args.

    The sharded arrays keep their P(axis) spec; queries and outputs are
    replicated (every device sees every query — the rows are what's big).
    """
    shard_specs = dataclasses.replace(
        jax.tree_util.tree_map(lambda _: P(), sidx),
        occ_fused=P(READS_AXIS), sa_samples=P(READS_AXIS))

    wrapped = jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=(shard_specs,) + tuple(P() for _ in args),
        out_specs=P(),
        check_vma=False,
    ))
    return wrapped(sidx, *args)
