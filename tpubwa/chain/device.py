"""Device seed chaining + chain filtering.

Exact vectorized replication of [bwa: bwamem.c :: mem_chain, test_and_merge,
mem_chain_flt, mem_chain_weight] (reference flow
[ref: worker1/MemChain.scala, MemChainFilter.scala]): seeds are visited in
SMEM order x occurrence order; each probes the most-recent chain whose pos is
the greatest <= rbeg (the B-tree "lower" lookup; tie rule pinned in
docs/PARITY.md) and merges or opens a new chain. Chain weights (query/ref
coverage union) are accumulated online, which is exact because seeds arrive
with non-decreasing qbeg/rbeg within a chain.

Everything is (B reads) batch-parallel with a sequential fori over seed
slots; per step the work is O(MAX_CHAINS) masked vector ops.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..index.device import DeviceIndex, sa_lookup
from ..ops.window import slice_rows

NEG31 = -(2**31) + 1  # plain int: no backend init at import time


@dataclasses.dataclass(frozen=True)
class ChainConfig:
    max_seeds: int = 128
    max_chains: int = 32
    max_occ: int = 500
    max_chain_gap: int = 10000
    w: int = 100
    min_seed_len: int = 19
    mask_level: float = 0.50
    drop_ratio: float = 0.50
    max_chain_extend: int = 1 << 30
    min_chain_weight: int = 0
    # budget of SA-resolved seeds per read ON AVERAGE across the batch: the
    # invPsi walk runs on a dense (B*sa_dense,) array so dead lanes don't
    # burn gather bandwidth; batches whose total seed count exceeds the
    # budget overflow the affected reads to the host oracle
    sa_dense: int = 8


def pos2rid(didx: DeviceIndex, fwd_pos: jnp.ndarray) -> jnp.ndarray:
    """[bwa: bntseq.c :: bns_pos2rid] via searchsorted over sequence ends."""
    return jnp.searchsorted(didx.ann_end, fwd_pos, side="right").astype(
        jnp.int32)


def intv2rid(didx: DeviceIndex, rb: jnp.ndarray, ln: jnp.ndarray) -> jnp.ndarray:
    """[bwa: bntseq.c :: bns_intv2rid]: -2 if bridging strands, -1 if
    bridging sequences, else the sequence id."""
    re = rb + ln
    cross = (rb < didx.l_pac) & (re > didx.l_pac)
    fb = jnp.where(rb >= didx.l_pac, 2 * didx.l_pac - 1 - rb, rb)
    fe_pos = re - 1
    fe = jnp.where(fe_pos >= didx.l_pac, 2 * didx.l_pac - 1 - fe_pos, fe_pos)
    rid_b = pos2rid(didx, fb)
    rid_e = pos2rid(didx, fe)
    rid = jnp.where(rid_b == rid_e, rid_b, jnp.int32(-1))
    return jnp.where(cross, jnp.int32(-2), rid)


def _excl_cummax(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    inc = jax.lax.associative_scan(jnp.maximum, x, axis=axis)
    pad = jnp.full_like(jnp.take(inc, jnp.array([0]), axis=axis), NEG31)
    return jnp.concatenate(
        [pad, jax.lax.slice_in_dim(inc, 0, x.shape[axis] - 1, axis=axis)],
        axis=axis)


@partial(jax.jit, static_argnums=(2,))
def seeds_from_smems(didx: DeviceIndex, smems: dict, cfg: ChainConfig):
    """Expand SMEM intervals into located seeds (SA-resolved), bwa order.

    Returns dict: rbeg, qbeg, len, rid (B, max_seeds); valid mask; l_rep (B,);
    overflow (B,).
    """
    qb, qe, k, s, n = (smems[x] for x in ("qb", "qe", "k", "s", "n"))
    B, M = qb.shape
    # pos >= 0 marks SMEMs whose (unique) text position is pre-resolved by
    # the seeding stage (seed.lut s==1 shortcut): no SA walk needed
    pos = smems.get("pos", jnp.full((B, M), -1, k.dtype))
    slot = jnp.arange(M, dtype=jnp.int32)[None, :]
    vs = slot < n[:, None]
    slen = qe - qb
    # step/cnt are bounded by text/max_occ resp. max_occ — int32 everywhere
    step = jnp.where(s > cfg.max_occ,
                     s // cfg.max_occ, 1).astype(jnp.int32)
    cnt = jnp.where(vs, jnp.minimum(s, cfg.max_occ), 0).astype(jnp.int32)

    # frac_rep numerator [bwa: bwamem.c :: mem_chain]: union of repetitive
    # SMEM spans; smems are sorted by (qb, qe) so a running max suffices
    big = vs & (s > cfg.max_occ)
    qe_rep = jnp.where(big, qe, NEG31)
    prev_max = jnp.maximum(_excl_cummax(qe_rep), 0)
    contrib = jnp.where(big, jnp.clip(qe - jnp.maximum(qb, prev_max), 0), 0)
    l_rep = contrib.sum(axis=1, dtype=jnp.int32)

    # flatten (smem, occurrence) pairs into seed slots, preserving order.
    # All index plumbing below is gather-free where offsets would be
    # O(B*S): slot->smem ownership is a one-hot (B,S,M) contraction on the
    # MXU, batch flattening uses the row-prefix property (live lanes are
    # the first total[b] of each row), and the SA write-back is a variable
    # row slice (ops.window.slice_rows).
    offs = jnp.cumsum(cnt, axis=1) - cnt          # exclusive prefix
    total = cnt.sum(axis=1, dtype=jnp.int32)
    S = cfg.max_seeds
    sid = jnp.arange(S, dtype=jnp.int32)[None, :]                  # (1, S)
    own_oh = (offs[:, None, :] <= sid[:, :, None]) & \
        (sid[:, :, None] < (offs + cnt)[:, None, :])               # (B,S,M)
    # 64-bit fields (k, pos on large genomes) ride the int32 MXU
    # contraction as exact (hi, lo) halves — see seed.lut._split64
    from ..seed.lut import _join64, _split64
    parts, widths = [], []
    for a in (offs, cnt, k, step, qb, slen, pos):
        if a.dtype == jnp.int64:
            hi, lo = _split64(a)
            parts += [hi, lo]
            widths.append(2)
        else:
            parts.append(a)
            widths.append(1)
    fields = jnp.stack(parts, axis=-1)                             # (B,M,F')
    taken = jax.lax.dot_general(
        own_oh.astype(jnp.int32), fields,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)                          # (B,S,F')
    cols, f = [], 0
    for w in widths:
        cols.append(_join64(taken[..., f], taken[..., f + 1]) if w == 2
                    else taken[..., f])
        f += w
    t_offs, t_cnt, t_k, t_step, qbeg, ln, t_pos = cols
    t = sid - t_offs
    seed_valid = sid < total[:, None]
    rank = t_k + t * t_step
    # each owned slot copies its SMEM's pos verbatim (s==1 SMEMs have
    # exactly one occurrence, so slot -> position is 1:1); unowned slots
    # contract to 0 — mask them back to the -1 sentinel
    t_pos = jnp.where(seed_valid, t_pos, -1)
    # --- dense compaction before the invPsi walk: live lanes are row
    # prefixes, so read b's seeds occupy dense rows [rowstart[b], +total[b])
    D = B * cfg.sa_dense
    rowstart = jnp.cumsum(total) - total
    over_budget = rowstart + total > D
    tot_eff = jnp.where(over_budget, 0, total)
    rowstart = jnp.cumsum(tot_eff) - tot_eff
    # read owning each dense lane: scatter row starts, then a running max
    mark = jnp.full((D + 1,), -1, jnp.int32).at[
        jnp.where(tot_eff > 0, rowstart, D)].set(
        jnp.arange(B, dtype=jnp.int32), mode="drop")[:D]
    b_for = jax.lax.associative_scan(jnp.maximum, mark)
    b_forc = jnp.clip(b_for, 0, B - 1)
    j_in = jnp.arange(D, dtype=jnp.int32) - rowstart[b_forc]
    dense_live = (b_for >= 0) & (j_in < tot_eff[b_forc]) & (j_in >= 0)
    flat_idx = jnp.clip(b_forc * S + j_in, 0, B * S - 1)
    dense_rank = jnp.where(dense_live, rank.reshape(-1)[flat_idx], 1)
    dense_pos = jnp.where(dense_live, t_pos.reshape(-1)[flat_idx], -1)
    walk_live = dense_live & (dense_pos < 0)   # pre-resolved lanes skip
    dense_sa = sa_lookup(didx, jnp.where(walk_live, dense_rank, 1), walk_live)
    dense_sa = jnp.where(dense_pos >= 0, dense_pos, dense_sa)
    rbeg = slice_rows(dense_sa, rowstart, S)
    seed_valid = seed_valid & ~over_budget[:, None]
    rbeg = jnp.where(seed_valid, rbeg, 0)
    rid = intv2rid(didx, rbeg, ln)
    rid = jnp.where(seed_valid, rid, -1)
    overflow = smems["overflow"] | (total > S) | over_budget
    return dict(rbeg=rbeg, qbeg=qbeg, len=ln,
                rid=rid, valid=seed_valid & (rid >= 0), l_rep=l_rep,
                overflow=overflow)


@partial(jax.jit, static_argnums=(2,))
def chain_seeds(didx: DeviceIndex, seeds: dict, cfg: ChainConfig):
    """mem_chain: sequential insertion of seeds into pos-keyed chains.

    The insertion loop is dispatch-bound (a few small (B, C) kernels per
    seed slot), so UNROLL seed slots per while iteration: the body is a
    no-op for invalid slots (all update masks carry sv), making body∘body
    exact. Per-seed arrays are padded by UNROLL columns so the last
    group's dynamic slices stay in bounds.
    """
    UNROLL = 4
    rbeg, qbeg, ln, valid = (seeds[x] for x in ("rbeg", "qbeg", "len",
                                                "valid"))
    rid_s = seeds["rid"]
    B, S = rbeg.shape
    padc = lambda a, fill: jnp.concatenate(
        [a, jnp.full((B, UNROLL), fill, a.dtype)], axis=1)
    rbeg = padc(rbeg, 0)
    qbeg = padc(qbeg, 0)
    ln = padc(ln, 0)
    valid = padc(valid, False)
    rid_s = padc(rid_s, -1)
    C = cfg.max_chains
    zi = lambda: jnp.zeros((B, C), jnp.int32)
    zp = lambda: jnp.zeros((B, C), rbeg.dtype)   # text-position fields
    st = dict(
        pos=zp(), rid=zi() - 1, first_qb=zi(), first_rb=zp(), last_qb=zi(),
        last_rb=zp(), last_len=zi(), end_q=zi(), w_q=zi(), end_r=zp(),
        w_r=zi(), n=jnp.zeros((B,), jnp.int32),
        chain_id=jnp.full((B, S + UNROLL), -1, jnp.int32),
        overflow=seeds["overflow"],
    )
    l_pac = didx.l_pac
    cidx_row = jnp.arange(C, dtype=jnp.int32)[None, :]
    rows = jnp.arange(B)

    def body(j, st):
        sv = valid[:, j]
        rb, qb2, ll, rd = rbeg[:, j], qbeg[:, j], ln[:, j], rid_s[:, j]
        exists = cidx_row < st["n"][:, None]
        cand = exists & (st["pos"] <= rb[:, None])
        has = cand.any(axis=1)
        maxpos = jnp.max(jnp.where(cand, st["pos"], NEG31), axis=1)
        tie = cand & (st["pos"] == maxpos[:, None])
        cidx = jnp.max(jnp.where(tie, cidx_row, -1), axis=1)  # newest chain
        cidx_c = jnp.clip(cidx, 0, C - 1)
        g = lambda a: a[rows, cidx_c]
        # --- test_and_merge [bwa: bwamem.c :: test_and_merge] ---
        same_rid = rd == g(st["rid"])
        qend = g(st["last_qb"]) + g(st["last_len"])
        rend = g(st["last_rb"]) + g(st["last_len"])
        contained = (qb2 >= g(st["first_qb"])) & (qb2 + ll <= qend) & \
            (rb >= g(st["first_rb"])) & (rb + ll <= rend)
        strand_block = ((g(st["last_rb"]) < l_pac) |
                        (g(st["first_rb"]) < l_pac)) & (rb >= l_pac)
        x = qb2 - g(st["last_qb"])
        y = rb - g(st["last_rb"])
        chainable = (y >= 0) & (x - y <= cfg.w) & (y - x <= cfg.w) & \
            (x - g(st["last_len"]) < cfg.max_chain_gap) & \
            (y - g(st["last_len"]) < cfg.max_chain_gap)
        m_noapp = sv & has & same_rid & contained
        m_app = sv & has & same_rid & ~contained & ~strand_block & chainable
        new = sv & ~(m_noapp | m_app)
        room = st["n"] < C
        nslot = jnp.where(new & room, st["n"], -1)
        st["overflow"] = st["overflow"] | (new & ~room)

        upd_at = jnp.where(m_app, cidx, nslot)          # -1 = no update
        onehot = cidx_row == upd_at[:, None]            # (B, C)
        def set_field(name, val_app, val_new):
            v = jnp.where(m_app, val_app, val_new)
            st[name] = jnp.where(onehot, v[:, None], st[name])
        # last seed fields (both merge-append and new chain)
        set_field("last_qb", qb2, qb2)
        set_field("last_rb", rb, rb)
        set_field("last_len", ll, ll)
        # weight accumulators [bwa: bwamem.c :: mem_chain_weight], online
        wq_add = jnp.where(qb2 >= g(st["end_q"]), ll,
                           jnp.clip(qb2 + ll - g(st["end_q"]), 0))
        wr_add = jnp.where(rb >= g(st["end_r"]), ll,
                           jnp.clip(rb + ll - g(st["end_r"]), 0)
                           ).astype(jnp.int32)  # bounded by seed length
        set_field("w_q", g(st["w_q"]) + wq_add, ll)
        set_field("w_r", g(st["w_r"]) + wr_add, ll)
        set_field("end_q", jnp.maximum(g(st["end_q"]), qb2 + ll), qb2 + ll)
        set_field("end_r", jnp.maximum(g(st["end_r"]), rb + ll), rb + ll)
        # new-chain-only fields
        new_oh = onehot & new[:, None]
        for name, val in (("pos", rb), ("rid", rd), ("first_qb", qb2),
                          ("first_rb", rb)):
            st[name] = jnp.where(new_oh, val[:, None], st[name])
        st["n"] = st["n"] + (new & room).astype(jnp.int32)
        # contained seeds (m_noapp) are absorbed but NOT stored [bwa:
        # test_and_merge returns 1 without pushing], so they get no slot
        assigned = jnp.where(m_app, cidx, jnp.where(new & room, nslot, -1))
        st["chain_id"] = st["chain_id"].at[:, j].set(
            jnp.where(sv, assigned, -1))
        return st

    # dynamic trip count: slots past the last valid seed in the whole batch
    # are no-ops — don't pay for the (B,C) body there
    jmax = jnp.max(jnp.where(
        valid, jnp.arange(S + UNROLL, dtype=jnp.int32)[None, :] + 1, 0))

    def group(c):
        j, s = c
        for u in range(UNROLL):
            s = body(j + u, s)
        return j + UNROLL, s

    st = jax.lax.while_loop(lambda c: c[0] < jmax, group,
                            (jnp.int32(0), st))[1]
    st["chain_id"] = st["chain_id"][:, :S]
    st["weight"] = jnp.minimum(
        jnp.minimum(st["w_q"], st["w_r"]), jnp.int32(2**30 - 1))
    return st


@partial(jax.jit, static_argnums=(1,))
def chain_filter(chains: dict, cfg: ChainConfig):
    """mem_chain_flt: weight sort + overlap-based drop/shadow marking.

    Returns: order (B, C) sorted chain indices, kept (B, C) in sorted order
    (0=dropped, 1=shadowed-first, 2=kept-with-overlap, 3=primary-kept).
    """
    B, C = chains["pos"].shape
    exists = jnp.arange(C, dtype=jnp.int32)[None, :] < chains["n"][:, None]
    w = jnp.where(exists & (chains["weight"] >= cfg.min_chain_weight),
                  chains["weight"], -1)
    beg = chains["first_qb"]
    end = chains["last_qb"] + chains["last_len"]
    # stable sort: weight desc, then pos, then qbeg (bwa ties are unstable;
    # this total order is mirrored by the oracle)
    order = jnp.lexsort((beg, chains["pos"], -w), axis=1).astype(jnp.int32)
    take = lambda a: jnp.take_along_axis(a, order, axis=1)
    w_s, beg_s, end_s = take(w), take(beg), take(end)
    # pad UNROLL columns of invalid chains so the unrolled loop's dynamic
    # column accesses stay in bounds (padded slots have w=-1 -> never
    # valid, never kept, no effect on the overlap scan)
    UNROLL = 2
    padc = lambda a, fill: jnp.concatenate(
        [a, jnp.full((B, UNROLL), fill, a.dtype)], axis=1)
    w_s, beg_s, end_s = padc(w_s, -1), padc(beg_s, 0), padc(end_s, 0)
    valid_s = w_s >= jnp.maximum(cfg.min_chain_weight, 0)
    idxs = jnp.arange(C + UNROLL, dtype=jnp.int32)[None, :]

    kept = jnp.where(valid_s & (idxs == 0), 3, 0)
    first = jnp.full((B, C + UNROLL), -1, jnp.int32)

    def body(i, carry):
        kept, first = carry
        vi = valid_s[:, i]
        wi, bi, ei = w_s[:, i], beg_s[:, i], end_s[:, i]
        in_kept = (idxs < i) & (kept >= 2)
        b_max = jnp.maximum(beg_s, bi[:, None])
        e_min = jnp.minimum(end_s, ei[:, None])
        li = (ei - bi)[:, None]
        lj = end_s - beg_s
        min_l = jnp.minimum(li, lj)
        sig = in_kept & (e_min > b_max) & \
            ((e_min - b_max) >= min_l * cfg.mask_level) & \
            (min_l < cfg.max_chain_gap)
        dropc = sig & (wi[:, None] < w_s * cfg.drop_ratio) & \
            ((w_s - wi[:, None]) >= 2 * cfg.min_seed_len)
        bpos = jnp.min(jnp.where(dropc, idxs, C), axis=1)
        considered = idxs <= bpos[:, None]
        first = jnp.where(sig & considered & (first < 0) & vi[:, None],
                          i, first)
        large = (sig & considered).any(axis=1)
        drop = bpos < C
        ki = jnp.where(vi & ~drop, jnp.where(large, 2, 3), 0)
        kept = kept.at[:, i].set(ki)
        return kept, first

    imax = jnp.max(chains["n"])
    kept, first = jax.lax.while_loop(
        lambda c: c[0] < imax,
        lambda c: (c[0] + UNROLL,) + tuple(
            body(c[0] + 1, body(c[0], c[1:]))),
        (jnp.int32(1), kept, first))[1:]
    kept, first = kept[:, :C], first[:, :C]
    # chains pointed at by a kept chain's `first` become shadowed (kept=1),
    # unconditionally, as in bwa
    src = (kept >= 2) & (first >= 0)
    tgt = jnp.where(src, first, C)  # scatter target; column C = dump slot
    kept_pad = jnp.concatenate([kept, jnp.zeros((B, 1), jnp.int32)], axis=1)
    kept_pad = kept_pad.at[jnp.arange(B)[:, None], tgt].set(1, mode="drop")
    kept = kept_pad[:, :C]
    # max_chain_extend cap [bwa: the ++k >= opt->max_chain_extend loop]
    shad = ((kept == 1) | (kept == 2)).astype(jnp.int32)
    cum = jnp.cumsum(shad, axis=1)
    kept = jnp.where((kept < 3) & (cum >= cfg.max_chain_extend), 0, kept)
    return dict(order=order, kept=kept)
