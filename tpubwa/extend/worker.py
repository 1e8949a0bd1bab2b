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
from ..seed.lut import _compact_rows, _join64, _split64
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
    # -- task-parallel engine (the default): ALL candidate extensions are
    # precomputed in two flat kernel batches and the exact visit order is
    # replayed kernel-free; the round engine above remains for the
    # big-caps tier (unbounded extensions/read) and as an A/B reference
    task_parallel: bool = True
    cand_rows: int = 1        # candidate task budget: B*cand_mult // cand_rows
    cand_mult: int = 1        # >1 on repeat-rich large genomes (more
    #                           surviving extensions per read)
    retry_rows: int = 8       # compacted band-retry sub-batch: B // retry_rows


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


@partial(jax.jit, static_argnums=(5, 7))
def extend_chains(didx: DeviceIndex, seqs, lens, seeds: dict, chains: dict,
                  cfg: ExtendConfig, flt: dict | None = None,
                  _stop_after: str = ""):
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
               seqs=seqs, lens=lens, seed_rank=seed_rank)

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
    if _stop_after == "pre":
        return st
    if cfg.task_parallel:
        return _extend_taskpar(didx, cfg, ctx, st, _stop_after)

    # ---- full-width rounds: round 1 extends virtually every read once;
    # on repeat-rich genomes a second round catches the common
    # second-chain extension before the compacted tail ----
    for _ in range(max(cfg.full_rounds, 1)):
        st = jax.lax.while_loop(sel_cond, sel_body, st)
        if _stop_after == "sel1":
            return st
        st = jax.lax.cond(jnp.any(act_fn(st)), run_extension,
                          lambda s: s, st)
    if _stop_after == "round1":
        return st
    # advance past seeds the full-round regions now contain (VPU-only), so
    # only reads that truly need another EXTENSION enter the tail
    st = jax.lax.while_loop(sel_cond, sel_body, st)
    if _stop_after == "sel2":
        return st

    # ---- tail rounds: reads with >1 surviving extension task are rare
    # (typically <1%: a second chain, or a seed the containment test kept),
    # so the remaining rounds run on a row-compacted sub-batch instead of
    # re-running full-width kernels until the slowest read finishes ----
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


def _row_pick(arr, col):
    """arr[b, col[b]] via one-hot select — XLA per-offset gather cost
    (~40-150ns/offset) makes a (B,) gather pricier than a (B, S) VPU
    mask-sum."""
    s_iota = jnp.arange(arr.shape[1], dtype=jnp.int32)[None, :]
    oh = s_iota == col[:, None]
    return jnp.sum(jnp.where(oh, arr, 0), axis=1, dtype=arr.dtype)


def _kernel_call(cfg: ExtendConfig, q, ql, t, tl, h, eb: int, aw: int, act):
    """One banded-extension kernel invocation at width q.shape[0]."""
    B = q.shape[0]
    if cfg.use_pallas:
        from ..ops.sw_pallas import ksw_extend_pallas
        o = ksw_extend_pallas(
            q, ql, t, tl, h, jnp.full((B,), aw, jnp.int32),
            jnp.full((B,), eb, jnp.int32), act,
            cfg.o_del, cfg.e_del, cfg.o_ins, cfg.e_ins,
            cfg.zdrop, cfg.a, cfg.b)
        return tuple(o[:, c] for c in range(6))
    return ksw_extend_batch(
        q, ql, t, tl, h, jnp.full((B,), aw, jnp.int32),
        jnp.full((B,), eb, jnp.int32), act,
        jnp.asarray(_scmat(cfg)), None, cfg.o_del, cfg.e_del,
        cfg.o_ins, cfg.e_ins, cfg.zdrop)


def _run_try(cfg: ExtendConfig, q, ql, t, tl, h, eb: int, act, prev0):
    """bwa's band-doubling retry loop: try i+1 runs only if try i changed
    the score (vs the score entering the try) AND its max_off >= aw/2 +
    aw/4. prev0 is the score entering try 0 (-1 for left extension, the
    post-left score for right).

    Retrying lanes are a small minority, so the doubled-band kernel runs
    on a row-compacted sub-batch (B // retry_rows); lanes that don't fit
    are covered by a cond-guarded full-width call (rare)."""
    B = q.shape[0]
    aw0 = cfg.w
    sc, qle, tle, gtle, gsc, moff = _kernel_call(cfg, q, ql, t, tl, h, eb,
                                                 aw0, act)
    used_w = jnp.full((B,), aw0, jnp.int32)
    prev_sc = prev0
    for i in range(1, cfg.max_band_try):
        aw1 = cfg.w << i
        retry = act & (sc != prev_sc) & \
            (moff >= (aw0 >> 1) + (aw0 >> 2))
        if cfg.retry_rows > 1 and B >= 256:
            Dr = min(max(B // cfg.retry_rows, 32), B)
            srcrow, rpos, room, dv = _compact_rows(retry, Dr)
            actc = dv & retry[srcrow]

            def go_c(sr=srcrow, am=actc, aw=aw1):
                return jnp.stack(_kernel_call(
                    cfg, q[sr], ql[sr], t[sr], tl[sr], h[sr], eb, aw, am),
                    axis=1)

            resc = jax.lax.cond(jnp.any(actc), go_c,
                                lambda: jnp.zeros((Dr, 6), jnp.int32))
            back = resc[jnp.clip(rpos, 0, Dr - 1)]
            covered = retry & room
            left = retry & ~room
            res_f = jax.lax.cond(
                jnp.any(left),
                lambda r=left, aw=aw1: jnp.stack(
                    _kernel_call(cfg, q, ql, t, tl, h, eb, aw, r), axis=1),
                lambda: jnp.zeros((B, 6), jnp.int32))
            res2 = jnp.where(covered[:, None], back, res_f)
        else:
            res2 = jax.lax.cond(
                jnp.any(retry),
                lambda r=retry, aw=aw1: jnp.stack(
                    _kernel_call(cfg, q, ql, t, tl, h, eb, aw, r), axis=1),
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


def _compute_ext(didx: DeviceIndex, cfg: ExtendConfig, seqs, lens,
                 sqb, srb, sln, r0, r1, active):
    """Left+right banded extension for one flat task batch (any width).

    A task = (read row, seed, chain rmax window); the result depends ONLY
    on these inputs — never on previously pushed regions — which is what
    makes the precompute+replay engine exact. Mirrors the per-seed body of
    [bwa: bwamem.c :: mem_chain2aln] (left ext with h0 = seedlen*a, right
    ext seeded with the left score, band-doubling retries, clip-vs-to-end
    decision).

    Returns dict: qb, rb, qe, re, score, truesc, w  (per task).
    """
    B, L = seqs.shape
    WREF = L + 2 * cal_max_gap(cfg, L)
    qi = jnp.arange(L, dtype=jnp.int32)[None, :]
    ti = jnp.arange(WREF, dtype=jnp.int32)[None, :]

    # ---- left extension: reversed query prefix / reversed ref window
    do_l = active & (sqb > 0)
    lq_len = jnp.where(do_l, sqb, 0)
    # window lengths are < WREF — int32 regardless of position width
    lt_len = jnp.where(do_l, srb - r0, 0).astype(jnp.int32)
    lq = jnp.where(qi < lq_len[:, None],
                   query_window_desc(seqs, sqb, L), 4)
    lt = jnp.where(ti < lt_len[:, None],
                   text_window_desc(didx, srb, WREF), 4)
    h0 = sln * cfg.a
    lsc, lqle, ltle, lgtle, lgsc, lw = _run_try(
        cfg, lq, lq_len, lt, lt_len, h0, cfg.pen_clip5, do_l,
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
    rsc, rqle, rtle, rgtle, rgsc, rw = _run_try(
        cfg, rq, rq_len, rt, rt_len, score_l, cfg.pen_clip3, do_r, score_l)
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
    return dict(qb=qb_new, rb=rb_new, qe=qe_new, re=re_new, score=score_f,
                truesc=truesc_f, w=jnp.maximum(aw_l, aw_r))


def _seedcov(qbeg_r, rbeg_r, len_r, cid_r, scid, qb, qe, rb, re):
    """Sum of lengths of the chain's stored seeds fully inside the region
    box — rows are per task (any width)."""
    incov = (cid_r >= 0) & (cid_r == scid[:, None]) & \
        (qbeg_r >= qb[:, None]) & (qbeg_r + len_r <= qe[:, None]) & \
        (rbeg_r >= rb[:, None]) & (rbeg_r + len_r <= re[:, None])
    return jnp.where(incov, len_r, 0).sum(axis=1, dtype=jnp.int32)


def _extend_taskpar(didx: DeviceIndex, cfg: ExtendConfig, ctx: dict, st,
                    _stop_after: str = ""):
    """Precompute-then-replay engine (the production tier-1 path).

    Exactness argument: a seed's extension result depends only on (seed,
    chain rmax) — never on previously pushed regions — so every extension
    the scalar order could need can be computed ahead of the sequential
    walk.  The walk's only sequential decision is WHICH seeds get pushed:
    skip(seed) = contained-in-some-reg & ~rescue, where `contained` is
    monotone INcreasing and `rescue` monotone DEcreasing in (regs so far,
    seeds skipped so far).  Phase 2 therefore evaluates skip against the
    minimal state (round-1 regs only, empty skipped set), which UNDER-
    skips: the candidate set is a superset of the seeds the exact replay
    extends.  Phase 4 replays the exact [bwa: bwamem.c :: mem_chain2aln]
    visit order kernel-free, pushing precomputed results; a missing
    precompute (candidate budget overflow) flags the read for the host
    oracle, trading throughput, never correctness.

    Phases:
      1. first-seed extension for every read (one flat kernel batch);
      2. optimistic candidate mask over all (read, seed) pairs;
      3. candidate extensions (second flat kernel batch, row-compacted);
      4. kernel-free exact replay (containment/rescue machinery of
         _engine + precomputed pushes).
    """
    pair_order, n_pairs = ctx["pair_order"], ctx["n_pairs"]
    qbeg_s, rbeg_s, len_s = ctx["qbeg_s"], ctx["rbeg_s"], ctx["len_s"]
    cid_s = ctx["cid_s"]
    rmax0, rmax1 = ctx["rmax0"], ctx["rmax1"]
    crid = ctx["crid"]
    seqs, lens = ctx["seqs"], ctx["lens"]
    B, L = seqs.shape
    S = qbeg_s.shape[1]
    C = rmax0.shape[1]
    R = cfg.max_regs
    stored = cid_s >= 0
    rows32 = jnp.arange(B, dtype=jnp.int32)
    s_iota = jnp.arange(S, dtype=jnp.int32)[None, :]
    pos_dt = rbeg_s.dtype

    # ---- phase 1: the first seed in processing order, every read ----
    slot0 = jnp.clip(pair_order[:, 0], 0, S - 1)
    active0 = n_pairs > 0
    sqb0 = _row_pick(qbeg_s, slot0)
    srb0 = _row_pick(rbeg_s, slot0)
    sln0 = _row_pick(len_s, slot0)
    scid0 = _row_pick(cid_s, slot0)
    scid0c = jnp.clip(scid0, 0, C - 1)
    r0_0 = _row_pick(rmax0, scid0c)
    r1_0 = _row_pick(rmax1, scid0c)
    ext0 = _compute_ext(didx, cfg, seqs, lens, sqb0, srb0, sln0,
                        r0_0, r1_0, active0)
    cov0 = _seedcov(qbeg_s, rbeg_s, len_s, cid_s, scid0,
                    ext0["qb"], ext0["qe"], ext0["rb"], ext0["re"])
    rid0 = _row_pick(crid, scid0c)
    if _stop_after == "tp1":
        st = dict(st)
        st["rb"] = st["rb"] + ext0["rb"][:, None]
        return st

    # ---- phase 2: optimistic candidate mask (superset — see above) ----
    # containment of every stored seed vs the round-1 region only
    rb0, re0 = ext0["rb"], ext0["re"]
    qb0, qe0 = ext0["qb"], ext0["qe"]
    w0 = ext0["w"]
    cont = (rbeg_s >= rb0[:, None]) & (rbeg_s + len_s <= re0[:, None]) & \
        (qbeg_s >= qb0[:, None]) & (qbeg_s + len_s <= qe0[:, None])
    len_ok = (len_s - sln0[:, None]) * 10 <= lens[:, None]
    qd = qbeg_s - qb0[:, None]
    rd = rbeg_s - rb0[:, None]
    ww = jnp.minimum(cal_max_gap(cfg, jnp.minimum(qd, rd)), w0[:, None])
    front = (qd - rd < ww) & (rd - qd < ww)
    qd2 = qe0[:, None] - (qbeg_s + len_s)
    rd2 = re0[:, None] - (rbeg_s + len_s)
    ww2 = jnp.minimum(cal_max_gap(cfg, jnp.minimum(qd2, rd2)), w0[:, None])
    back = (qd2 - rd2 < ww2) & (rd2 - qd2 < ww2)
    around0 = active0[:, None] & cont & len_ok & (front | back)

    # pairwise rescue scan with the skipped set empty (superset):
    # diagonal inequality via exact (hi, lo) int32 halves — the (B, S, S)
    # cube stays int32/bool even on int64 genomes
    diag = rbeg_s - qbeg_s
    d_hi, d_lo = _split64(diag.astype(jnp.int64))
    diag_neq = (d_hi[:, :, None] != d_hi[:, None, :]) | \
        (d_lo[:, :, None] != d_lo[:, None, :])
    t_len = len_s[:, None, :]
    t_qb = qbeg_s[:, None, :]
    s_ln = len_s[:, :, None]
    s_qb = qbeg_s[:, :, None]
    longer = (t_len > s_ln) | ((t_len == s_ln) &
                               (s_iota[:, None, :] > s_iota[:, :, None]))
    same_chain = stored[:, None, :] & \
        (cid_s[:, None, :] == cid_s[:, :, None])
    c1 = (s_qb <= t_qb) & (s_qb + s_ln - t_qb >= (s_ln >> 2)) & diag_neq
    c2 = (t_qb <= s_qb) & (t_qb + t_len - s_qb >= (s_ln >> 2)) & diag_neq
    thr = t_len * 100 >= s_ln * 95
    rescue0 = (same_chain & longer & thr & (c1 | c2)).any(axis=2)

    seed_rank = ctx["seed_rank"]
    first_oh = active0[:, None] & (s_iota == slot0[:, None])
    cand = stored & (seed_rank < C) & (~around0 | rescue0) & ~first_oh
    if _stop_after == "tp2":
        st = dict(st)
        st["n"] = st["n"] + cand.sum(axis=1, dtype=jnp.int32)
        return st

    # ---- phase 3: flat candidate task batch ----
    K = max(B * cfg.cand_mult // max(cfg.cand_rows, 1), 64)
    flat_cand = cand.reshape(-1)
    cs = jnp.cumsum(flat_cand.astype(jnp.int32))
    tpos = cs - 1
    fits = flat_cand & (tpos < K)
    st = dict(st)
    st["overflow"] = st["overflow"] | \
        (cand & ~fits.reshape(B, S)).any(axis=1)
    src = jnp.searchsorted(cs, jnp.arange(1, K + 1, dtype=jnp.int32)) \
        .astype(jnp.int32)
    srcc = jnp.clip(src, 0, B * S - 1)
    tvalid = jnp.arange(K, dtype=jnp.int32) < cs[-1]
    srow = srcc // S
    sslot = srcc % S
    # per-task scalars: ONE packed row gather (int64 fields ride as halves)
    rb_hi, rb_lo = _split64(rbeg_s.astype(jnp.int64))
    packed_in = jnp.stack([qbeg_s, len_s, cid_s, rb_hi, rb_lo],
                          axis=-1).reshape(B * S, 5)
    tk = packed_in[srcc]
    sqb_t, sln_t, scid_t = tk[:, 0], tk[:, 1], tk[:, 2]
    srb_t = _join64(tk[:, 3], tk[:, 4]).astype(pos_dt)
    scid_tc = jnp.clip(scid_t, 0, C - 1)
    r0_t = rmax0.reshape(-1)[srow * C + scid_tc]
    r1_t = rmax1.reshape(-1)[srow * C + scid_tc]
    rid_t = crid.reshape(-1)[srow * C + scid_tc]
    seqs_t = seqs[srow]
    lens_t = lens[srow]
    # candidate tasks skew repeat-heavy: band-retry rates are far above
    # the first-seed batch's, so give the compacted retry more rows
    cfg3 = dataclasses.replace(cfg, retry_rows=min(cfg.retry_rows, 4))
    ext3 = _compute_ext(didx, cfg3, seqs_t, lens_t, sqb_t, srb_t, sln_t,
                        r0_t, r1_t, tvalid)
    cov3 = _seedcov(qbeg_s[srow], rbeg_s[srow], len_s[srow], cid_s[srow],
                    scid_t, ext3["qb"], ext3["qe"], ext3["rb"], ext3["re"])

    # ---- scatter both phases into the (B*S, 12) precompute table ----
    def pack_rows(ext, cov, sln_v, rid_v, width):
        hi, lo = _split64(ext["rb"].astype(jnp.int64))
        return jnp.stack([
            hi, lo, (ext["re"] - ext["rb"]).astype(jnp.int32),
            ext["qb"], ext["qe"], ext["score"], ext["truesc"], ext["w"],
            cov, sln_v, rid_v, jnp.ones((width,), jnp.int32)], axis=1)

    rows0 = pack_rows(ext0, cov0, sln0, rid0, B)
    rows3 = pack_rows(ext3, cov3, sln_t, rid_t, K)
    idx0 = jnp.where(active0, rows32 * S + slot0, B * S)
    idx3 = jnp.where(tvalid, srcc, B * S)
    pre = jnp.zeros((B * S, 12), jnp.int32) \
        .at[idx0].set(rows0, mode="drop") \
        .at[idx3].set(rows3, mode="drop")
    if _stop_after == "tp3":
        st["rb"] = st["rb"] + pre[:, 1].reshape(B, S)[:, :1]
        return st

    # ---- phase 4: exact kernel-free replay. One fused step processes
    # ONE seed per read (skip OR push its precomputed region) — exactly
    # the scalar visit semantics — so the loop runs max(n_pairs) steps
    # total; steps are unrolled 4x (a step is a no-op for finished reads)
    # to amortize the dispatch-bound launch overhead ----
    _, _, _, _, containment_skip = _engine(didx, cfg, ctx,
                                           want_skip_fn=True)
    r_iota = jnp.arange(R, dtype=jnp.int32)[None, :]

    def step(stt):
        p = jnp.clip(stt["ptr"], 0, S - 1)
        slot = _row_pick(pair_order, p)
        skip, active = containment_skip(stt)
        stt = dict(stt)
        oh = (s_iota == slot[:, None]) & skip[:, None]
        stt["skipped"] = stt["skipped"] | oh
        do_push = active & ~skip
        fidx = jnp.clip(rows32 * S + slot, 0, B * S - 1)
        v = pre[fidx]
        have = (v[:, 11] > 0) & do_push
        rb = _join64(v[:, 0], v[:, 1]).astype(pos_dt)
        re = rb + v[:, 2]
        room = stt["n"] < R
        do = have & room
        stt["overflow"] = stt["overflow"] | (do_push & ~have) | \
            (have & ~room)
        tgt = jnp.where(do, stt["n"], R)
        oh_tgt = r_iota == tgt[:, None]

        def put(name, val):
            stt[name] = jnp.where(
                oh_tgt, val[:, None].astype(stt[name].dtype), stt[name])
        put("rb", rb)
        put("re", re)
        put("qb", v[:, 3])
        put("qe", v[:, 4])
        put("score", v[:, 5])
        put("truesc", v[:, 6])
        put("w", v[:, 7])
        put("seedcov", v[:, 8])
        put("seedlen0", v[:, 9])
        put("cid", _row_pick(cid_s, slot))
        put("rid", v[:, 10])
        stt["n"] = stt["n"] + do.astype(jnp.int32)
        stt["ptr"] = stt["ptr"] + active.astype(jnp.int32)
        return stt

    def step4(stt):
        for _ in range(4):
            stt = step(stt)
        return stt

    st = jax.lax.while_loop(lambda s: jnp.any(s["ptr"] < n_pairs),
                            step4, st)
    return st


def _engine(didx: DeviceIndex, cfg: ExtendConfig, ctx: dict,
            want_skip_fn: bool = False):
    """Build the per-round machinery over a row set (full batch or a
    compacted sub-batch): containment-skip advance, one-seed-per-read
    banded extension, and the active predicate. All lookups are one-hot
    VPU selects; ctx rows define the batch width. With want_skip_fn, the
    raw containment_skip predicate is appended to the return tuple (the
    task-parallel replay fuses it with its precomputed pushes)."""
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
        ext = _compute_ext(didx, cfg, seqs, lens, sqb, srb, sln, r0, r1,
                           active)
        scid_raw = row_pick(cid_s, slot)
        seedcov = _seedcov(qbeg_s, rbeg_s, len_s, cid_s, scid_raw,
                           ext["qb"], ext["qe"], ext["rb"], ext["re"])

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
        put("rb", ext["rb"])
        put("re", ext["re"])
        put("qb", ext["qb"])
        put("qe", ext["qe"])
        put("score", ext["score"])
        put("truesc", ext["truesc"])
        put("w", ext["w"])
        put("seedcov", seedcov)
        put("seedlen0", sln)
        put("cid", scid_raw)
        put("rid", chain_pick(ctx["crid"], scid))
        st["n"] = st["n"] + (push & room).astype(jnp.int32)
        st["ptr"] = st["ptr"] + active.astype(jnp.int32)
        return st

    def act_fn(st):
        return st["ptr"] < n_pairs

    if want_skip_fn:
        return sel_cond, sel_body, run_extension, act_fn, containment_skip
    return sel_cond, sel_body, run_extension, act_fn


def _scmat(cfg: ExtendConfig):
    import numpy as np
    m = np.full((5, 5), -1, dtype=np.int32)
    for i in range(4):
        for j in range(4):
            m[i, j] = cfg.a if i == j else -cfg.b
    return m
