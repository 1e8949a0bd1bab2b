"""Device seed-extension orchestration — exact mem_chain2aln semantics.

Replicates [bwa: bwamem.c :: mem_chain2aln] over a batch of reads: chains are
visited in filtered order, seeds within a chain longest-first; each seed is
containment-tested against the regions found so far, and surviving seeds run
left/right banded extensions (with bwa's band-doubling retry) through the
batched kernel in tpubwa/extend/jax_extend.py. One extension round processes
at most one seed per read, exactly preserving the scalar visit order; skipped
seeds cost only vector ops. [ref: worker1/MemChainToAlign.scala]

Output: per-read AlnReg arrays (push order identical to the oracle), handed
to the native finishing path (dedup/primary/SAM) or the device finisher.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..index.device import DeviceIndex, text_base
from ..ops.window import (query_window_asc, query_window_desc,
                          text_window_asc, text_window_desc)
from .jax_extend import ksw_extend_batch

NEG31 = -(2**31) + 1
POS31 = 2**31 - 1


@dataclasses.dataclass(frozen=True)
class ExtendConfig:
    max_regs: int = 32
    w: int = 100
    zdrop: int = 100
    a: int = 1
    b: int = 4
    o_del: int = 6
    e_del: int = 1
    o_ins: int = 6
    e_ins: int = 1
    pen_clip5: int = 5
    pen_clip3: int = 5
    max_band_try: int = 2
    use_pallas: bool = False  # TPU: run the VMEM-resident Pallas SW kernel
    tail_rows: int = 8        # reads with >1 extension round: B // tail_rows
    full_rounds: int = 1      # full-width extension rounds before the tail
    #                           (2 on repeat-rich large genomes, where most
    #                           reads extend a second chain)


def cal_max_gap(cfg: ExtendConfig, qlen):
    """[bwa: bwamem.c :: cal_max_gap]; qlen may be traced or static."""
    l_del = (qlen * cfg.a - cfg.o_del) // cfg.e_del + 1
    l_ins = (qlen * cfg.a - cfg.o_ins) // cfg.e_ins + 1
    if isinstance(qlen, int):
        return min(max(l_del, l_ins, 1), cfg.w * 2)
    l = jnp.maximum(jnp.maximum(l_del, l_ins), 1)
    return jnp.minimum(l, 2 * cfg.w)


def _seq_window(didx: DeviceIndex, start, length, cap: int):
    """Gather text[start : start+length) into a (cap,) int32 row (pad 4)."""
    idx = start + jnp.arange(cap, dtype=jnp.int32)
    ok = jnp.arange(cap, dtype=jnp.int32) < length
    base = text_base(didx, jnp.clip(idx, 0, 2 * didx.l_pac - 1))
    return jnp.where(ok, base, 4)


@partial(jax.jit, static_argnums=(5,))
def extend_chains(didx: DeviceIndex, seqs, lens, seeds: dict, chains: dict,
                  cfg: ExtendConfig, flt: dict | None = None):
    """Run mem_chain2aln for all kept chains of all reads.

    seqs: (B, L) int32; lens: (B,); seeds/chains/flt from tpubwa.chain.device.
    Returns dict of (B, max_regs) reg arrays + n (B,) + overflow (B,).
    """
    B, L = seqs.shape
    S = seeds["rbeg"].shape[1]
    C = chains["pos"].shape[1]
    R = cfg.max_regs
    WREF = L + 2 * cal_max_gap(cfg, L)
    rows = jnp.arange(B)
    l_pac = didx.l_pac

    rbeg_s = seeds["rbeg"]
    qbeg_s = seeds["qbeg"]
    len_s = seeds["len"]
    cid_s = chains["chain_id"]                       # (B, S), -1 = unstored
    stored = cid_s >= 0

    # ---- chain rank in filtered order; rank = C for dropped chains ----
    # one-hot contractions, not scatter/gather: these are (B*S)-offset ops
    # and XLA TPU pays ~40-150ns PER offset; the (B,C,C)/(B,S,C) selects
    # are pure VPU
    order, kept = flt["order"], flt["kept"]          # (B, C) each
    cio = jnp.arange(C, dtype=jnp.int32)
    ord_oh = order[:, :, None] == cio[None, None, :]           # (B, p, c)
    rank_of = jnp.min(jnp.where(ord_oh & (kept > 0)[:, :, None],
                                cio[None, :, None], C), axis=1)  # (B, C)
    cid_oh = jnp.clip(cid_s, 0)[:, :, None] == cio[None, None, :]  # (B,S,C)
    seed_rank = jnp.where(
        stored,
        jnp.sum(jnp.where(cid_oh, rank_of[:, None, :], 0), axis=2,
                dtype=jnp.int32), C)

    # ---- rmax windows per chain [the max-possible-span computation] ----
    gap_l = cal_max_gap(cfg, qbeg_s)
    gap_r = cal_max_gap(cfg, lens[:, None] - qbeg_s - len_s)
    bnd = rbeg_s - (qbeg_s + gap_l)
    end = rbeg_s + len_s + (lens[:, None] - qbeg_s - len_s) + gap_r
    big = jnp.asarray(jnp.iinfo(bnd.dtype).max // 4, bnd.dtype)
    in_chain = cid_oh & stored[:, :, None]                       # (B, S, C)
    rmax0 = jnp.min(jnp.where(in_chain, bnd[:, :, None], big), axis=1)
    rmax1 = jnp.max(jnp.where(in_chain, end[:, :, None], -big), axis=1)
    rmax0 = jnp.clip(rmax0, 0)
    rmax1 = jnp.minimum(rmax1, 2 * l_pac)
    # strand-boundary split, decided by the chain's first seed
    first_rb = chains["first_rb"]
    crosses = (rmax0 < l_pac) & (l_pac < rmax1)
    rmax1 = jnp.where(crosses & (first_rb < l_pac), l_pac, rmax1)
    rmax0 = jnp.where(crosses & (first_rb >= l_pac), l_pac, rmax0)
    # clip to the sequence holding the first seed, on its strand
    # [bwa: bntseq.c :: bns_fetch_seq]
    fpos = jnp.where(first_rb >= l_pac, 2 * l_pac - 1 - first_rb, first_rb)
    rid_c = jnp.searchsorted(didx.ann_end, fpos, side="right").astype(
        jnp.int32)
    seq_b = jnp.where(rid_c > 0,
                      didx.ann_end[jnp.clip(rid_c - 1, 0)], 0)
    seq_e = didx.ann_end[jnp.clip(rid_c, 0, didx.ann_end.shape[0] - 1)]
    is_rev_c = first_rb >= l_pac
    lo = jnp.where(is_rev_c, 2 * l_pac - seq_e, seq_b)
    hi = jnp.where(is_rev_c, 2 * l_pac - seq_b, seq_e)
    rmax0 = jnp.maximum(rmax0, lo)
    rmax1 = jnp.minimum(rmax1, hi)

    # ---- processing order: (chain rank, len desc, slot desc) ----
    key = seed_rank * (L + 1) * S + (L - len_s) * S + (S - 1 -
                                                       jnp.arange(S)[None, :])
    key = jnp.where(stored & (seed_rank < C), key, POS31)
    pair_order = jnp.argsort(key, axis=1).astype(jnp.int32)   # (B, S)
    n_pairs = (key < POS31).sum(axis=1).astype(jnp.int32)

    ctx = dict(pair_order=pair_order, n_pairs=n_pairs, qbeg_s=qbeg_s,
               rbeg_s=rbeg_s, len_s=len_s, cid_s=cid_s,
               rmax0=rmax0, rmax1=rmax1, crid=chains["rid"],
               seqs=seqs, lens=lens)

    st = dict(
        ptr=jnp.zeros((B,), jnp.int32),
        skipped=jnp.zeros((B, S), bool),
        n=jnp.zeros((B,), jnp.int32),
        overflow=chains["overflow"],
        rb=jnp.zeros((B, R), rbeg_s.dtype),
        re=jnp.zeros((B, R), rbeg_s.dtype),
        qb=jnp.zeros((B, R), jnp.int32), qe=jnp.zeros((B, R), jnp.int32),
        score=jnp.zeros((B, R), jnp.int32),
        truesc=jnp.zeros((B, R), jnp.int32),
        w=jnp.zeros((B, R), jnp.int32),
        seedcov=jnp.zeros((B, R), jnp.int32),
        seedlen0=jnp.zeros((B, R), jnp.int32),
        cid=jnp.full((B, R), -1, jnp.int32),
        rid=jnp.full((B, R), -1, jnp.int32),
    )

    sel_cond, sel_body, run_extension, act_fn = _engine(didx, cfg, ctx)

    # ---- full-width rounds: round 1 extends virtually every read once;
    # on repeat-rich genomes a second round catches the common
    # second-chain extension before the compacted tail ----
    for _ in range(max(cfg.full_rounds, 1)):
        st = jax.lax.while_loop(sel_cond, sel_body, st)
        st = jax.lax.cond(jnp.any(act_fn(st)), run_extension,
                          lambda s: s, st)
    # advance past seeds the full-round regions now contain (VPU-only), so
    # only reads that truly need another EXTENSION enter the tail
    st = jax.lax.while_loop(sel_cond, sel_body, st)

    # ---- tail rounds: reads with >1 surviving extension task are rare
    # (typically <1%: a second chain, or a seed the containment test kept),
    # so the remaining rounds run on a row-compacted sub-batch instead of
    # re-running full-width kernels until the slowest read finishes ----
    from ..seed.lut import _compact_rows
    Dr = min(max(B // cfg.tail_rows, 32), B)
    active = st["ptr"] < n_pairs
    srcrow, rpos, room, dv = _compact_rows(active, Dr)
    st["overflow"] = st["overflow"] | (active & ~room)
    sub_ctx = {k: v[srcrow] for k, v in ctx.items()}
    sub_ctx["n_pairs"] = jnp.where(dv, sub_ctx["n_pairs"], 0)
    sub_st = {k: v[srcrow] for k, v in st.items()}
    s2_cond, s2_body, run2, act2 = _engine(didx, cfg, sub_ctx)

    def tail_cond(s):
        return jnp.any(s["ptr"] < sub_ctx["n_pairs"])

    def tail_body(s):
        s = jax.lax.while_loop(s2_cond, s2_body, s)
        return jax.lax.cond(jnp.any(act2(s)), run2, lambda x: x, s)

    sub_st = jax.lax.while_loop(tail_cond, tail_body, sub_st)
    rp = jnp.clip(rpos, 0, Dr - 1)
    sel = active & room
    for k2 in st:
        v = sub_st[k2][rp]
        st[k2] = jnp.where(sel if st[k2].ndim == 1 else sel[:, None],
                           v, st[k2])
    return st


def _engine(didx: DeviceIndex, cfg: ExtendConfig, ctx: dict):
    """Build the per-round machinery over a row set (full batch or a
    compacted sub-batch): containment-skip advance, one-seed-per-read
    banded extension, and the active predicate. All lookups are one-hot
    VPU selects; ctx rows define the batch width."""
    pair_order = ctx["pair_order"]
    n_pairs = ctx["n_pairs"]
    qbeg_s, rbeg_s, len_s = ctx["qbeg_s"], ctx["rbeg_s"], ctx["len_s"]
    cid_s = ctx["cid_s"]
    stored = cid_s >= 0
    rmax0, rmax1 = ctx["rmax0"], ctx["rmax1"]
    seqs, lens = ctx["seqs"], ctx["lens"]
    B, L = seqs.shape
    S = qbeg_s.shape[1]
    C = rmax0.shape[1]
    R = cfg.max_regs
    WREF = L + 2 * cal_max_gap(cfg, L)

    s_iota = jnp.arange(S, dtype=jnp.int32)[None, :]

    def row_pick(arr, col):
        """arr[b, col[b]] via one-hot select — XLA per-offset gather cost
        (~40-150ns/offset) makes a (B,) gather pricier than a (B, S) VPU
        mask-sum."""
        oh = s_iota == col[:, None]
        return jnp.sum(jnp.where(oh, arr, 0), axis=1, dtype=arr.dtype)

    def cur_slot(st):
        p = jnp.clip(st["ptr"], 0, S - 1)
        return row_pick(pair_order, p), st["ptr"] < n_pairs

    def containment_skip(st):
        """True for reads whose CURRENT seed should be skipped (no SW)."""
        slot, active = cur_slot(st)
        sqb = row_pick(qbeg_s, slot)
        srb = row_pick(rbeg_s, slot)
        sln = row_pick(len_s, slot)
        scid = row_pick(cid_s, slot)
        ridx = jnp.arange(R)[None, :]
        vr = ridx < st["n"][:, None]
        cont = vr & (srb[:, None] >= st["rb"]) & \
            (srb[:, None] + sln[:, None] <= st["re"]) & \
            (sqb[:, None] >= st["qb"]) & \
            (sqb[:, None] + sln[:, None] <= st["qe"])
        len_ok = (sln[:, None] - st["seedlen0"]) * 10 <= lens[:, None]
        qd = sqb[:, None] - st["qb"]
        rd = srb[:, None] - st["rb"]
        mg = cal_max_gap(cfg, jnp.minimum(qd, rd))
        ww = jnp.minimum(mg, st["w"])
        front = (qd - rd < ww) & (rd - qd < ww)
        qd2 = st["qe"] - (sqb[:, None] + sln[:, None])
        rd2 = st["re"] - (srb[:, None] + sln[:, None])
        mg2 = cal_max_gap(cfg, jnp.minimum(qd2, rd2))
        ww2 = jnp.minimum(mg2, st["w"])
        back = (qd2 - rd2 < ww2) & (rd2 - qd2 < ww2)
        around = (cont & len_ok & (front | back)).any(axis=1)
        # overlapping-seed rescue scan within the same chain [the srt scan]
        t_len, t_qb, t_rb = len_s, qbeg_s, rbeg_s
        longer = (t_len > sln[:, None]) | \
            ((t_len == sln[:, None]) &
             (jnp.arange(S)[None, :] > slot[:, None]))
        same_chain = cid_s == scid[:, None]
        unskipped = ~st["skipped"]
        c1 = (sqb[:, None] <= t_qb) & \
            (sqb[:, None] + sln[:, None] - t_qb >= (sln[:, None] >> 2)) & \
            (t_qb - sqb[:, None] != t_rb - srb[:, None])
        c2 = (t_qb <= sqb[:, None]) & \
            (t_qb + t_len - sqb[:, None] >= (sln[:, None] >> 2)) & \
            (sqb[:, None] - t_qb != srb[:, None] - t_rb)
        thr = (t_len * 100 >= sln[:, None] * 95)
        rescue = (stored & same_chain & longer & unskipped & thr &
                  (c1 | c2)).any(axis=1)
        return active & around & ~rescue, active

    # selection loop: advance past skippable seeds (no extension needed)
    def sel_cond(st):
        skip, active = containment_skip(st)
        return jnp.any(skip)

    def sel_body(st):
        skip, active = containment_skip(st)
        slot, _ = cur_slot(st)
        st = dict(st)
        oh = (s_iota == slot[:, None]) & skip[:, None]
        st["skipped"] = st["skipped"] | oh
        st["ptr"] = st["ptr"] + skip.astype(jnp.int32)
        return st

    c_iota = jnp.arange(C, dtype=jnp.int32)[None, :]

    def chain_pick(arr, cid):
        oh = c_iota == cid[:, None]
        return jnp.sum(jnp.where(oh, arr, 0), axis=1, dtype=arr.dtype)

    def run_extension(st):
        slot, active = cur_slot(st)
        sqb = row_pick(qbeg_s, slot)
        srb = row_pick(rbeg_s, slot)
        sln = row_pick(len_s, slot)
        scid = jnp.clip(row_pick(cid_s, slot), 0, C - 1)
        r0 = chain_pick(rmax0, scid)
        r1 = chain_pick(rmax1, scid)

        # ---- left extension: reversed query prefix / reversed ref window
        do_l = active & (sqb > 0)
        lq_len = jnp.where(do_l, sqb, 0)
        # window lengths are < WREF — int32 regardless of position width
        lt_len = jnp.where(do_l, srb - r0, 0).astype(jnp.int32)
        qi = jnp.arange(L, dtype=jnp.int32)[None, :]
        lq = jnp.where(qi < lq_len[:, None],
                       query_window_desc(seqs, sqb, L), 4)
        ti = jnp.arange(WREF, dtype=jnp.int32)[None, :]
        lt = jnp.where(ti < lt_len[:, None],
                       text_window_desc(didx, srb, WREF), 4)
        h0 = sln * cfg.a

        def run_try(q, ql, t, tl, h, eb, act, prev0):
            """bwa's band-doubling retry loop: try i+1 runs only if try i
            changed the score (vs the score entering the try) AND its
            max_off >= aw/2 + aw/4. prev0 is a->score entering try 0
            (-1 for left extension, the post-left score for right)."""
            def run_kernel(aw, act_mask):
                if cfg.use_pallas:
                    from ..ops.sw_pallas import ksw_extend_pallas
                    o = ksw_extend_pallas(
                        q, ql, t, tl, h, jnp.full((B,), aw, jnp.int32),
                        jnp.full((B,), eb, jnp.int32), act_mask,
                        cfg.o_del, cfg.e_del, cfg.o_ins, cfg.e_ins,
                        cfg.zdrop, cfg.a, cfg.b)
                    return tuple(o[:, c] for c in range(6))
                return ksw_extend_batch(
                    q, ql, t, tl, h, jnp.full((B,), aw, jnp.int32),
                    jnp.full((B,), eb, jnp.int32), act_mask,
                    jnp.asarray(_scmat(cfg)), None, cfg.o_del, cfg.e_del,
                    cfg.o_ins, cfg.e_ins, cfg.zdrop)

            aw0 = cfg.w
            sc, qle, tle, gtle, gsc, moff = run_kernel(aw0, act)
            used_w = jnp.full((B,), aw0, jnp.int32)
            prev_sc = prev0
            for i in range(1, cfg.max_band_try):
                aw1 = cfg.w << i
                retry = act & (sc != prev_sc) & \
                    (moff >= (aw0 >> 1) + (aw0 >> 2))
                # skip the doubled-band kernel entirely when no lane retries
                res2 = jax.lax.cond(
                    jnp.any(retry),
                    lambda r=retry, aw=aw1: jnp.stack(
                        run_kernel(aw, r), axis=1),
                    lambda: jnp.zeros((B, 6), jnp.int32))
                sc2, qle2, tle2, gtle2, gsc2, moff2 = (
                    res2[:, c] for c in range(6))
                prev_sc = sc
                sc = jnp.where(retry, sc2, sc)
                qle = jnp.where(retry, qle2, qle)
                tle = jnp.where(retry, tle2, tle)
                gtle = jnp.where(retry, gtle2, gtle)
                gsc = jnp.where(retry, gsc2, gsc)
                moff = jnp.where(retry, moff2, moff)
                used_w = jnp.where(retry, aw1, used_w)
                aw0 = aw1
            return sc, qle, tle, gtle, gsc, used_w

        lsc, lqle, ltle, lgtle, lgsc, lw = run_try(
            lq, lq_len, lt, lt_len, h0, cfg.pen_clip5, do_l,
            jnp.full((B,), -1, jnp.int32))
        to_end_l = do_l & (lgsc > 0) & (lgsc > lsc - cfg.pen_clip5)
        # note bwa: local if gscore <= 0 or gscore <= score - pen_clip
        qb_new = jnp.where(do_l, jnp.where(to_end_l, 0, sqb - lqle), 0)
        rb_new = jnp.where(do_l,
                           jnp.where(to_end_l, srb - lgtle, srb - ltle),
                           srb)
        score_l = jnp.where(do_l, lsc, sln * cfg.a)
        truesc_l = jnp.where(do_l, jnp.where(to_end_l, lgsc, lsc),
                             sln * cfg.a)
        aw_l = jnp.where(do_l, lw, cfg.w)

        # ---- right extension
        qe0 = sqb + sln
        do_r = active & (qe0 != lens)
        rq_len = jnp.where(do_r, lens - qe0, 0)
        rt_len = jnp.where(do_r, r1 - (srb + sln), 0).astype(jnp.int32)
        rq = jnp.where(qi < rq_len[:, None],
                       query_window_asc(seqs, qe0, L), 4)
        rt = jnp.where(ti < rt_len[:, None],
                       text_window_asc(didx, srb + sln, WREF), 4)
        rsc, rqle, rtle, rgtle, rgsc, rw = run_try(
            rq, rq_len, rt, rt_len, score_l, cfg.pen_clip3, do_r, score_l)
        to_end_r = do_r & (rgsc > 0) & (rgsc > rsc - cfg.pen_clip3)
        # no right extension -> qe = l_query (seed already reaches the end)
        qe_new = jnp.where(do_r, jnp.where(to_end_r, lens, qe0 + rqle), lens)
        re_new = jnp.where(do_r,
                           jnp.where(to_end_r, srb + sln + rgtle,
                                     srb + sln + rtle),
                           srb + sln)
        score_f = jnp.where(do_r, rsc, score_l)
        truesc_f = truesc_l + jnp.where(
            do_r, jnp.where(to_end_r, rgsc, rsc) - score_l, 0)
        aw_r = jnp.where(do_r, rw, cfg.w)

        # ---- seedcov over this chain's stored seeds
        scid_raw = row_pick(cid_s, slot)
        incov = stored & (cid_s == scid_raw[:, None]) & \
            (qbeg_s >= qb_new[:, None]) & \
            (qbeg_s + len_s <= qe_new[:, None]) & \
            (rbeg_s >= rb_new[:, None]) & \
            (rbeg_s + len_s <= re_new[:, None])
        seedcov = jnp.where(incov, len_s, 0).sum(axis=1, dtype=jnp.int32)

        # ---- push reg
        room = st["n"] < R
        push = active
        st = dict(st)
        st["overflow"] = st["overflow"] | (push & ~room)
        tgt = jnp.where(push & room, st["n"], R)
        r_iota = jnp.arange(R, dtype=jnp.int32)[None, :]
        oh_tgt = r_iota == tgt[:, None]          # all-False row when tgt == R
        def put(name, val):
            st[name] = jnp.where(oh_tgt, val[:, None].astype(st[name].dtype),
                                 st[name])
        put("rb", rb_new)
        put("re", re_new)
        put("qb", qb_new)
        put("qe", qe_new)
        put("score", score_f)
        put("truesc", truesc_f)
        put("w", jnp.maximum(aw_l, aw_r))
        put("seedcov", seedcov)
        put("seedlen0", sln)
        put("cid", scid_raw)
        put("rid", chain_pick(ctx["crid"], scid))
        st["n"] = st["n"] + (push & room).astype(jnp.int32)
        st["ptr"] = st["ptr"] + active.astype(jnp.int32)
        return st

    def act_fn(st):
        return st["ptr"] < n_pairs

    return sel_cond, sel_body, run_extension, act_fn


def _scmat(cfg: ExtendConfig):
    import numpy as np
    m = np.full((5, 5), -1, dtype=np.int32)
    for i in range(4):
        for j in range(4):
            m[i, j] = cfg.a if i == j else -cfg.b
    return m
