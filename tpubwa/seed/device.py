"""Device SMEM seeding: per-end backward search (see ARCHITECTURE.md).

STATUS: differential-testing oracle (and `_emit_mask` donor for seed/lut.py).
Production seeding is seed/lut.py; this first-generation walk is kept as an
independent implementation of the b_v(j) formulation for cross-checks in
tests/test_device_seed.py.

Replaces the reference's per-read sequential ``bwt_smem1`` anchor loop
[ref: worker1/MemChain.scala :: generateChains; bwa: bwt.c :: bwt_smem1a,
bwamem.c :: mem_collect_intv] with an equivalent massively-parallel
formulation: (B reads x L end positions) independent backward walks in
lockstep. For threshold v, b_v(j) = minimal start s.t. read[b_v(j), j)
occurs >= v times; the SMEM set is exactly {[b_v(j), j) : b_v(j) < b_v(j+1)}
(proof sketch in ARCHITECTURE.md). Output order (sorted by start,end) matches
mem_collect_intv's sort.

Round 2 re-seeding (long low-occ SMEMs, from the midpoint, v = occ+1) reruns
the same walk with a per-read threshold and coverage mask, capped at
``max_reseed`` candidates; reads exceeding any cap get overflow=True and are
routed to the host oracle (identical semantics, lower throughput).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..index.device import DeviceIndex, backward_ext

NEG = -1


@dataclasses.dataclass(frozen=True)
class SeedConfig:
    max_smems: int = 32      # per read, after both rounds
    max_reseed: int = 2      # round-2 candidates per read
    min_seed_len: int = 19
    split_len: int = 28      # ceil(min_seed_len * split_factor)
    split_width: int = 10


def _per_end_walk(didx: DeviceIndex, seqs: jnp.ndarray, lens: jnp.ndarray,
                  v: jnp.ndarray):
    """For every read b and end j in [1..L]: walk left while occ >= v[b].

    seqs: (B, L) int32 codes 0..4 (pad 4); lens: (B,); v: (B,) threshold.
    Returns b_start, k, s each (B, L+1) indexed by j (entry 0 unused);
    b_start[b, j] == j means "no match of length >= 1".
    """
    B, L = seqs.shape
    j = jnp.arange(1, L + 1, dtype=jnp.int32)[None, :]          # (1, L)
    c0 = seqs  # lane jj <-> end j=jj+1, whose last base is seqs[:, jj]
    valid0 = (j <= lens[:, None]) & (c0 < 4)
    c0c = jnp.where(valid0, c0, 0).astype(jnp.int32)
    k = didx.L2[c0c] + 1
    s = didx.L2[c0c + 1] - didx.L2[c0c]
    ok0 = valid0 & (s >= v[:, None])
    k = jnp.where(ok0, k, 0)
    s = jnp.where(ok0, s, 0)
    bpos = jnp.where(ok0, j - 1, j)       # current start
    live = ok0 & (bpos > 0)

    def cond(st):
        return jnp.any(st[3])

    def body(st):
        k, s, bpos, live = st
        i = bpos - 1                                   # position to absorb
        c = jnp.take_along_axis(seqs, jnp.maximum(i, 0), axis=1)
        can = live & (c < 4)
        csafe = jnp.where(can, c, 0).astype(jnp.int32)
        k2, s2 = backward_ext(didx, jnp.where(can, k, 1),
                              jnp.where(can, s, 1), csafe)
        good = can & (s2 >= v[:, None])
        k = jnp.where(good, k2, k)
        s = jnp.where(good, s2, s)
        bpos = jnp.where(good, i, bpos)
        live = good & (bpos > 0)
        return k, s, bpos, live

    k, s, bpos, _ = jax.lax.while_loop(cond, body, (k, s, bpos, live))
    # prepend a dummy column so arrays index naturally by j in [1..L]
    pad = jnp.zeros((B, 1), dtype=jnp.int32)
    return (jnp.concatenate([pad, bpos], axis=1),
            jnp.concatenate([pad, k], axis=1),
            jnp.concatenate([pad, s], axis=1))


def _emit_mask(bstart, lens, v_len_min, cover_mid=None):
    """SMEM emission mask over ends j in [1..L].

    bstart: (B, L+1); maximality b(j) < b(j+1) (b(len+1) := +inf), length
    >= v_len_min, and optionally b(j) <= mid < j (round-2 coverage).
    """
    B, L1 = bstart.shape
    L = L1 - 1
    j = jnp.arange(1, L + 1, dtype=jnp.int32)[None, :]
    b_j = bstart[:, 1:]
    b_next = jnp.concatenate(
        [bstart[:, 2:], jnp.full((B, 1), jnp.int32(2**30))], axis=1)
    b_next = jnp.where(j + 1 > lens[:, None], jnp.int32(2**30), b_next)
    mask = (j <= lens[:, None]) & (b_j < b_next) & (b_j < j)
    mask &= (j - b_j) >= v_len_min
    if cover_mid is not None:
        mask &= (b_j <= cover_mid[:, None]) & (cover_mid[:, None] < j)
    return mask


def _compact(mask, arrays, max_out):
    """Scatter masked (B, L) entries into (B, max_out) slots in j order.

    Returns compacted arrays, count (B,), overflow (B,).
    """
    B = mask.shape[0]
    pos = jnp.cumsum(mask, axis=1) - 1
    count = mask.sum(axis=1).astype(jnp.int32)
    overflow = count > max_out
    slot = jnp.where(mask & (pos < max_out), pos, max_out)  # dump slot
    outs = []
    for a in arrays:
        out = jnp.zeros((B, max_out + 1), dtype=a.dtype)
        out = out.at[jnp.arange(B)[:, None], slot].set(
            jnp.where(mask, a, 0), mode="drop")
        outs.append(out[:, :max_out])
    return outs, jnp.minimum(count, max_out), overflow


@partial(jax.jit, static_argnums=(3,))
def collect_smems(didx: DeviceIndex, seqs: jnp.ndarray, lens: jnp.ndarray,
                  cfg: SeedConfig):
    """Both seeding rounds. seqs: (B, L) uint8/int32 codes; lens: (B,).

    Returns dict with (B, max_smems) arrays qb, qe, k, s; n (B,); overflow (B,).
    Exactly matches oracle.Oracle.smems() row order (sorted by (qb, qe)).
    """
    seqs = seqs.astype(jnp.int32)
    lens = lens.astype(jnp.int32)
    B, L = seqs.shape
    ones = jnp.ones((B,), dtype=jnp.int32)

    # ---- round 1 ----
    b1, k1, s1 = _per_end_walk(didx, seqs, lens, ones)
    m1 = _emit_mask(b1, lens, cfg.min_seed_len)
    j_idx = jnp.broadcast_to(jnp.arange(1, L + 1, dtype=jnp.int32)[None, :],
                             (B, L))
    (qb1, qe1, kk1, ss1), n1, ovf1 = _compact(
        m1, [b1[:, 1:], j_idx, k1[:, 1:], s1[:, 1:]], cfg.max_smems)

    # ---- round 2 candidates: long + low-occ round-1 SMEMs ----
    slot_valid = jnp.arange(cfg.max_smems)[None, :] < n1[:, None]
    cand = slot_valid & ((qe1 - qb1) >= cfg.split_len) & \
        (ss1 <= cfg.split_width)
    # take the first max_reseed candidates in order
    cand_rank = jnp.cumsum(cand, axis=1) - 1
    n_cand = cand.sum(axis=1)
    ovf_cand = n_cand > cfg.max_reseed

    r2_qb = jnp.zeros((B, L), dtype=jnp.int32)  # per-round-2 outputs collected
    all_qb, all_qe, all_k, all_s, all_mask = [qb1], [qe1], [kk1], [ss1], [
        slot_valid]
    r2_order = []
    for r in range(cfg.max_reseed):
        sel = cand & (cand_rank == r)
        has = sel.any(axis=1)
        mid = jnp.where(
            has, ((qb1 + qe1) >> 1).max(axis=1, initial=0, where=sel), 0)
        v_r = jnp.where(has, ss1.max(axis=1, initial=0, where=sel) + 1,
                        jnp.int32(2**30))
        b2, k2, s2 = _per_end_walk(didx, seqs, lens, v_r)
        m2 = _emit_mask(b2, lens, cfg.min_seed_len, cover_mid=mid)
        m2 &= has[:, None]
        (qb2, qe2, kk2, ss2), n2, ovf2 = _compact(
            m2, [b2[:, 1:], j_idx, k2[:, 1:], s2[:, 1:]], cfg.max_smems)
        all_qb.append(qb2)
        all_qe.append(qe2)
        all_k.append(kk2)
        all_s.append(ss2)
        all_mask.append(jnp.arange(cfg.max_smems)[None, :] < n2[:, None])
        r2_order.append(ovf2)

    qb = jnp.concatenate(all_qb, axis=1)
    qe = jnp.concatenate(all_qe, axis=1)
    kk = jnp.concatenate(all_k, axis=1)
    ss = jnp.concatenate(all_s, axis=1)
    msk = jnp.concatenate(all_mask, axis=1)

    # stable sort by (qb, qe), invalid slots last — matches the oracle's
    # stable_sort by info with round order as tiebreak (fits int32: L <= 2^14)
    key = jnp.where(msk, qb * (L + 2) + qe, jnp.int32(2**30))
    order = jnp.argsort(key, axis=1, stable=True)
    take = lambda a: jnp.take_along_axis(a, order, axis=1)
    qb, qe, kk, ss, msk = take(qb), take(qe), take(kk), take(ss), take(msk)
    n_total = msk.sum(axis=1).astype(jnp.int32)
    overflow = ovf1 | ovf_cand | (n_total > cfg.max_smems)
    for o in r2_order:
        overflow |= o
    n_out = jnp.minimum(n_total, cfg.max_smems)
    return dict(
        qb=qb[:, : cfg.max_smems], qe=qe[:, : cfg.max_smems],
        k=kk[:, : cfg.max_smems], s=ss[:, : cfg.max_smems],
        n=n_out, overflow=overflow,
    )
