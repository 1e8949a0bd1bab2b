"""Anchor-based SMEM seeding — bwa's own algorithm, batched as a lockstep
state machine.

STATUS: differential-testing oracle. Production seeding is seed/lut.py
(``Aligner(seed_impl="lut")``, the default); this module is kept because it
implements the SAME semantics by a structurally different algorithm, so the
cross-check tests (tests/test_anchor_seed.py, tests/test_device_seed.py)
catch formulation bugs that a single implementation cannot.

Exact port of [bwa: bwt.c :: bwt_smem1a (max_intv=0); bwamem.c ::
mem_collect_intv]: per read, anchors advance to the end of the longest
forward match; each anchor runs a bidirectional forward pass (collecting the
interval stack on size changes) and a backward pass (emitting maximal
intervals); round 2 re-seeds long low-occ SMEMs from their midpoint with
min_intv = occ+1.

Why this replaces seed/device.py's per-end walk as the default: the per-end
formulation does Theta(L^2/2) occ queries per clean read (every suffix walks
to its start); the anchor algorithm does ~2L. Measured 10-50x less gather
traffic — and FM-index gather bandwidth is the whole seeding game
(SURVEY.md §7). The per-end module remains as an independent implementation
used to cross-check this one in tests.

Every read advances one state-machine step per lockstep iteration:
  PH_ANCHOR: advance x / init the forward pass          (no gathers)
  PH_FWD:    one forward extension                      (2 fused gathers)
  PH_BINIT:  reverse the collected stack                (no gathers)
  PH_BWD:    extend ALL stack entries left by one base  (2*SMAX gathers)
  PH_R2:     scan for the next round-2 candidate        (no gathers)
  PH_DONE
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..index.device import DeviceIndex, occ4_all, sa_lookup, sel4, sel_vec
from ..ops.window import query_window_asc, text_window_asc

(PH_ANCHOR, PH_FWD, PH_BINIT, PH_BWD, PH_R2, PH_DONE,
 PH_LOC, PH_CMP) = range(8)
BIG = 2**30


@dataclasses.dataclass(frozen=True)
class AnchorSeedConfig:
    max_smems: int = 32   # global emission capacity per read
    smax: int = 16        # interval-stack capacity (distinct sizes)
    bwd_dense: int = 0    # >0: run backward-extension gathers on a dense
    #                       (B*bwd_dense,) array instead of (B, smax) —
    #                       saves gather bandwidth at the cost of scatters;
    #                       0 (default): direct (B, smax) extension, which
    #                       measures faster on v5e where iteration overhead,
    #                       not bandwidth, dominates
    min_seed_len: int = 19
    split_len: int = 28
    split_width: int = 10
    unroll: int = 1       # state-machine steps per while_loop iteration —
    #                       amortizes TPU per-iteration launch overhead
    fast_s1: bool = True  # s==1 forward fast path: once the interval is
    #                       unique, SA-locate it (invPsi walk) and finish the
    #                       match with ONE vectorized text comparison instead
    #                       of ~L sequential FM extensions. k is invariant
    #                       while s==1 (the unique member suffix is fixed)
    #                       and l is dead in the backward pass, so the
    #                       emitted (qb, qe, k, s) are exactly bwt_smem1's.
    row_dense: int = 4    # >0: compact PH_BWD rows to a (B/row_dense, SM)
    #                       dense grid before the occ gathers (rows that
    #                       don't fit overflow to the host oracle);
    #                       0: extend the full (B, SM) grid every step


def _fwd_ext(didx, k, l, s, c_ext):
    """Forward extension by query base via complement on the l side
    [bwa: bwt_extend is_back=0]. c_ext = 3 - q[i]. Returns k', l', s'."""
    lo = occ4_all(didx, l - 1)                  # (..., 4)
    hi = occ4_all(didx, l - 1 + s)
    s_all = hi - lo
    new_l = sel_vec(didx.L2, c_ext, 4) + 1 + sel4(lo, c_ext)
    sent = ((l <= didx.primary) & (l + s - 1 >= didx.primary)).astype(
        jnp.int32)
    k3 = k + sent
    k2 = k3 + s_all[..., 3]
    k1 = k2 + s_all[..., 2]
    k0 = k1 + s_all[..., 1]
    new_k = jnp.select([c_ext == 3, c_ext == 2, c_ext == 1], [k3, k2, k1],
                       k0)
    new_s = sel4(s_all, c_ext)
    return new_k, new_l, new_s


def _bwd_ext(didx, k, l, s, c):
    """Backward extension by base c [bwa: bwt_extend is_back=1]."""
    lo = occ4_all(didx, k - 1)
    hi = occ4_all(didx, k - 1 + s)
    s_all = hi - lo
    new_k = sel_vec(didx.L2, c, 4) + 1 + sel4(lo, c)
    sent = ((k <= didx.primary) & (k + s - 1 >= didx.primary)).astype(
        jnp.int32)
    l3 = l + sent
    l2 = l3 + s_all[..., 3]
    l1 = l2 + s_all[..., 2]
    l0 = l1 + s_all[..., 1]
    new_l = jnp.select([c == 3, c == 2, c == 1], [l3, l2, l1], l0)
    new_s = sel4(s_all, c)
    return new_k, new_l, new_s


@partial(jax.jit, static_argnums=(3,))
def collect_smems_anchor(didx: DeviceIndex, seqs: jnp.ndarray,
                         lens: jnp.ndarray, cfg: AnchorSeedConfig):
    """Same output contract as seed.device.collect_smems: dict with
    (B, max_smems) qb/qe/k/s sorted by (qb, qe), n, overflow."""
    seqs = seqs.astype(jnp.int32)
    lens = lens.astype(jnp.int32)
    B, L = seqs.shape
    M, SM = cfg.max_smems, cfg.smax
    rows = jnp.arange(B)
    sidx = jnp.arange(SM, dtype=jnp.int32)[None, :]
    # row_dense waiting can serialize synchronized backward phases — give
    # those runs extra headroom (hard_stop still falls back to the oracle)
    iter_max = (6 + 2 * max(cfg.row_dense - 1, 0)) * L \
        + 16 * (1 + cfg.max_smems // 4)

    zB = jnp.zeros((B,), jnp.int32)
    zS = jnp.zeros((B, SM), jnp.int32)
    st = dict(
        ph=jnp.where(lens > 0, PH_ANCHOR, PH_DONE).astype(jnp.int32),
        round1=jnp.ones((B,), bool),
        x=zB, i=zB, x_ret=zB,
        min_intv=zB + 1,
        ik_k=zB, ik_l=zB, ik_s=zB, ik_qe=zB,
        st_k=zS, st_l=zS, st_s=zS, st_qe=zS, n_st=zB,   # curr/prev stack
        last_start=zB + BIG,
        out_qb=jnp.zeros((B, M), jnp.int32),
        out_qe=jnp.zeros((B, M), jnp.int32),
        out_k=jnp.zeros((B, M), jnp.int32),
        out_s=jnp.zeros((B, M), jnp.int32),
        n_out=zB, n_out_r1=zB, cand_ptr=zB,
        overflow=jnp.zeros((B,), bool),
        loc_k=zB,                          # s==1 fast-path: rank to locate
        s1_blk=jnp.zeros((B,), bool),      # fast path bailed for this pass
        it=jnp.int32(0),
    )

    li = jnp.arange(L, dtype=jnp.int32)[None, :]

    def seq_at(pos):
        # one-hot row select, not a gather: per-offset gather cost on TPU
        # (~40-150ns) dwarfs the (B, L) VPU mask-sum
        oh = li == jnp.clip(pos, 0, L - 1)[:, None]
        return jnp.sum(jnp.where(oh, seqs, 0), axis=1, dtype=jnp.int32)

    def push_stack(st, mask, k, l, s, qe):
        # one-hot select instead of scatter: TPU scatters serialize
        n = st["n_st"]
        st["overflow"] = st["overflow"] | (mask & (n >= SM))
        ok = mask & (n < SM)
        oh = ok[:, None] & (sidx == n[:, None])
        for name, val in (("st_k", k), ("st_l", l), ("st_s", s),
                          ("st_qe", qe)):
            st[name] = jnp.where(oh, val[:, None], st[name])
        st["n_st"] = n + ok.astype(jnp.int32)
        return st

    midx = jnp.arange(M, dtype=jnp.int32)[None, :]

    def emit(st, mask, qb, qe, k, s):
        keep = mask & ((qe - qb) >= cfg.min_seed_len)
        n = st["n_out"]
        st["overflow"] = st["overflow"] | (keep & (n >= M))
        ok = keep & (n < M)
        oh = ok[:, None] & (midx == n[:, None])
        for name, val in (("out_qb", qb), ("out_qe", qe), ("out_k", k),
                          ("out_s", s)):
            st[name] = jnp.where(oh, val[:, None], st[name])
        st["n_out"] = n + ok.astype(jnp.int32)
        return st

    def _bwd_dense(st, act, cb):
        # dense compaction: only live stack entries pay for occ gathers
        D = B * cfg.bwd_dense
        fa = act.reshape(-1)
        gpos = jnp.cumsum(fa) - 1
        inb = fa & (gpos < D)
        dest = jnp.where(inb, gpos, D)
        def to_dense(a, fill):
            buf = jnp.full((D + 1,), fill, jnp.int32)
            return buf.at[dest].set(
                jnp.where(inb, a.reshape(-1), fill), mode="drop")[:D]
        dk = to_dense(st["st_k"], 1)
        dl = to_dense(st["st_l"], 1)
        ds = to_dense(st["st_s"], 1)
        dc = to_dense(jnp.broadcast_to(cb[:, None], (B, SM)), 0)
        nk_d, nl_d, ns_d = _bwd_ext(didx, dk, dl, ds, dc)
        def from_dense(d, old):
            dpad = jnp.concatenate([d, jnp.zeros((1,), jnp.int32)])
            v = dpad[jnp.minimum(gpos, D)].reshape(B, SM)
            return jnp.where(act & inb.reshape(B, SM), v, old)
        bk = from_dense(nk_d, st["st_k"])
        bl = from_dense(nl_d, st["st_l"])
        bs = from_dense(ns_d, jnp.zeros((B, SM), jnp.int32))
        st["overflow"] = st["overflow"] | (fa & ~inb).reshape(B, SM).any(1)
        return st, bk, bl, bs

    def body(st):
        st = dict(st)
        ph = st["ph"]

        # ---------- PH_ANCHOR: round-1 anchor advance / F init ----------
        p0 = ph == PH_ANCHOR
        qx = seq_at(st["x"])
        r1_done = p0 & (st["x"] >= lens)
        skipN = p0 & ~r1_done & (qx > 3)
        startF = p0 & ~r1_done & ~skipN
        st["x"] = jnp.where(skipN, st["x"] + 1, st["x"])

        # ---------- PH_R2: next round-2 candidate ----------
        p4 = ph == PH_R2
        slot = jnp.arange(M, dtype=jnp.int32)[None, :]
        is_cand = (slot >= st["cand_ptr"][:, None]) & \
            (slot < st["n_out_r1"][:, None]) & \
            ((st["out_qe"] - st["out_qb"]) >= cfg.split_len) & \
            (st["out_s"] <= cfg.split_width)
        nxt = jnp.min(jnp.where(is_cand, slot, M), axis=1)
        has_cand = p4 & (nxt < M)
        r2_done = p4 & ~has_cand
        nxt_c = jnp.clip(nxt, 0, M - 1)
        oh_nxt = slot == nxt_c[:, None]
        pick = lambda a: jnp.sum(jnp.where(oh_nxt, a, 0), axis=1,
                                 dtype=jnp.int32)
        c_qb = pick(st["out_qb"])
        c_qe = pick(st["out_qe"])
        c_s = pick(st["out_s"])
        mid = (c_qb + c_qe) >> 1
        qmid = seq_at(mid)
        st["cand_ptr"] = jnp.where(has_cand, nxt + 1, st["cand_ptr"])
        startF2 = has_cand & (qmid <= 3)
        # a candidate whose midpoint is N: smem1 is a no-op; stay in PH_R2
        st["x"] = jnp.where(startF2, mid, st["x"])
        st["min_intv"] = jnp.where(startF2, c_s + 1, st["min_intv"])
        st["round1"] = st["round1"] & ~startF2

        # common F init
        fi = startF | startF2
        c0 = jnp.where(startF, qx, qmid)
        c0 = jnp.where(fi, c0, 0)
        L2c0 = sel_vec(didx.L2, c0, 4)
        L2c1 = sel_vec(didx.L2, c0 + 1, 5)
        st["ik_k"] = jnp.where(fi, L2c0 + 1, st["ik_k"])
        st["ik_l"] = jnp.where(fi, sel_vec(didx.L2, 3 - c0, 4) + 1,
                               st["ik_l"])
        st["ik_s"] = jnp.where(fi, L2c1 - L2c0, st["ik_s"])
        st["ik_qe"] = jnp.where(fi, st["x"] + 1, st["ik_qe"])
        st["i"] = jnp.where(fi, st["x"] + 1, st["i"])
        st["n_st"] = jnp.where(fi, 0, st["n_st"])
        st["last_start"] = jnp.where(fi, BIG, st["last_start"])
        st["s1_blk"] = st["s1_blk"] & ~fi

        st["ph"] = jnp.where(r1_done, PH_R2,
                             jnp.where(fi, PH_FWD,
                                       jnp.where(r2_done, PH_DONE, ph)))

        # The forward/backward sections carry the expensive occ gathers;
        # gate each behind a batch-wide cond so iterations where no lane
        # is in that phase skip the gathers entirely (e.g. the first ~L
        # iterations are pure forward passes).
        def fwd_section(st):
            st = dict(st)
            # ---------- PH_FWD ----------
            p1 = st["ph"] == PH_FWD
            p1 = p1 & (ph == PH_FWD)  # lanes that were ALREADY in FWD this iter
            qi = seq_at(st["i"])
            at_end = p1 & ((st["i"] >= lens) | (qi > 3))
            ext = p1 & ~at_end
            c_ext = jnp.where(ext, 3 - qi, 0)
            nk, nl, ns = _fwd_ext(
                didx, jnp.where(ext, st["ik_k"], 1),
                jnp.where(ext, st["ik_l"], 1),
                jnp.where(ext, st["ik_s"], 1), c_ext)
            size_chg = ext & (ns != st["ik_s"])
            push = at_end | size_chg
            st = push_stack(st, push, st["ik_k"], st["ik_l"], st["ik_s"],
                            st["ik_qe"])
            small = size_chg & (ns < st["min_intv"])
            to_b = at_end | small
            adv = ext & ~small
            st["ik_k"] = jnp.where(adv, nk, st["ik_k"])
            st["ik_l"] = jnp.where(adv, nl, st["ik_l"])
            st["ik_s"] = jnp.where(adv, ns, st["ik_s"])
            st["ik_qe"] = jnp.where(adv, st["i"] + 1, st["ik_qe"])
            st["i"] = jnp.where(adv, st["i"] + 1, st["i"])
            st["ph"] = jnp.where(to_b, PH_BINIT, st["ph"])
            if cfg.fast_s1:
                # unique interval: switch to SA-locate + direct text compare
                # (only reachable in round 1 — in round 2 min_intv >= 2, so
                # ns==1 takes the `small` exit before `adv`)
                go_loc = adv & (ns == 1) & ~st["s1_blk"]
                st["loc_k"] = jnp.where(go_loc, nk, st["loc_k"])
                st["ph"] = jnp.where(go_loc, PH_LOC, st["ph"])

            # ---------- PH_BINIT (gather-free; runs in the same iteration the
            # forward pass ended, or one iteration after a PH_CMP finish) ----
            p2 = (st["ph"] == PH_BINIT) & (to_b | (ph == PH_BINIT))
            # reverse stack so longest match (smallest s) comes first.
            # One-hot sum, NOT take_along_axis: a (B,SM)-offset gather costs
            # ~32ns/offset on TPU; the (B,SM,SM) select is pure VPU.
            n = st["n_st"]
            ii = jnp.arange(SM, dtype=jnp.int32)[None, :, None]
            jj = jnp.arange(SM, dtype=jnp.int32)[None, None, :]
            rev_oh = (ii + jj) == (n[:, None, None] - 1)
            take = lambda a: jnp.sum(
                jnp.where(rev_oh, a[:, None, :], 0), axis=2,
                dtype=jnp.int32)
            for name in ("st_k", "st_l", "st_s", "st_qe"):
                st[name] = jnp.where(p2[:, None], take(st[name]), st[name])
            st["x_ret"] = jnp.where(p2 & st["round1"], st["st_qe"][:, 0],
                                    st["x_ret"])
            st["i"] = jnp.where(p2, st["x"] - 1, st["i"])
            st["ph"] = jnp.where(p2, PH_BWD, st["ph"])

            return st

        def bwd_section(st):
            st = dict(st)
            # ---------- PH_BWD ----------
            p3 = (st["ph"] == PH_BWD) & (ph == PH_BWD)
            qi2 = seq_at(st["i"])
            has_c = p3 & (st["i"] >= 0) & (qi2 < 4)
            cb = jnp.where(has_c, qi2, 0)
            in_st = sidx < st["n_st"][:, None]
            act = in_st & has_c[:, None]
            if cfg.row_dense > 0:
                # ROW compaction: only reads currently taking a backward
                # step pay for occ gathers. Gather/scatter index counts stay
                # O(B) (row indices), never O(B*SM) — XLA TPU gather cost is
                # per offset, so this is ~SM*B/Dr cheaper than extending the
                # full (B, SM) grid when few reads are in PH_BWD. Rows that
                # don't fit into the Dr dense rows simply WAIT (stay in
                # PH_BWD, stepped next iteration) — correct by construction,
                # just extra iterations when many reads sync up.
                Dr = max(min(B // cfg.row_dense, B), 8)
                rpos = jnp.cumsum(has_c.astype(jnp.int32)) - 1
                room = has_c & (rpos < Dr)
                dest = jnp.where(room, rpos, Dr)
                srcrow = jnp.zeros((Dr + 1,), jnp.int32).at[dest].set(
                    jnp.arange(B, dtype=jnp.int32), mode="drop")[:Dr]
                dk = st["st_k"][srcrow]
                dl = st["st_l"][srcrow]
                ds = st["st_s"][srcrow]
                dcb = cb[srcrow]
                # dead dense rows point at read 0 (scatter fill) — their
                # results are never applied (act is False there)
                dact = sidx < st["n_st"][srcrow][:, None]
                nk, nl, ns = _bwd_ext(
                    didx, jnp.where(dact, dk, 1), jnp.where(dact, dl, 1),
                    jnp.where(dact, ds, 1),
                    jnp.broadcast_to(dcb[:, None], dk.shape))
                rb_i = jnp.clip(rpos, 0, Dr - 1)
                act = act & room[:, None]
                bk = jnp.where(act, nk[rb_i], st["st_k"])
                bl = jnp.where(act, nl[rb_i], st["st_l"])
                bs = jnp.where(act, ns[rb_i], 0)
                # rows that step this iteration: got a dense slot, or have
                # no base to extend (their entries all fail, no gather)
                p3 = p3 & (room | ~has_c)
                has_c = has_c & room
            elif cfg.bwd_dense == 0:
                bk, bl, bs = _bwd_ext(
                    didx, jnp.where(act, st["st_k"], 1),
                    jnp.where(act, st["st_l"], 1),
                    jnp.where(act, st["st_s"], 1),
                    jnp.where(act, cb[:, None], 0))
                bs = jnp.where(act, bs, 0)
                bk = jnp.where(act, bk, st["st_k"])
                bl = jnp.where(act, bl, st["st_l"])
                st = st  # no budget overflow in direct mode
            else:
                st, bk, bl, bs = _bwd_dense(st, act, cb)
            fail = in_st & (~has_c[:, None] | (bs < st["min_intv"][:, None]))
            surv = in_st & ~fail
            # output: first failing entry with no survivor before it
            first_fail = jnp.min(jnp.where(fail, sidx, SM), axis=1)
            first_surv = jnp.min(jnp.where(surv, sidx, SM), axis=1)
            do_out = p3 & (first_fail < SM) & (first_fail < first_surv) & \
                (st["i"] + 1 < st["last_start"])
            ff = jnp.clip(first_fail, 0, SM - 1)
            oh_ff = sidx == ff[:, None]
            pick_ff = lambda a: jnp.sum(jnp.where(oh_ff, a, 0), axis=1,
                                        dtype=jnp.int32)
            st = emit(st, do_out, st["i"] + 1, pick_ff(st["st_qe"]),
                      pick_ff(st["st_k"]), pick_ff(st["st_s"]))
            # bwa tracks the last RECORDED entry's start (containment skips do
            # not move it)
            st["last_start"] = jnp.where(do_out, st["i"] + 1, st["last_start"])
            # new stack: survivors, consecutive equal-s deduped (keep first)
            prev_s = jnp.where(surv, bs, -1)
            # nearest survivor before j: running "last survivor s" scan via cummax
            # on (index-tagged) values — O(SM^2) mask trick is simpler at SM=16
            before = (sidx[:, :, None] > jnp.arange(SM)[None, None, :])
            surv_b = surv[:, None, :] & before                     # (B, j, j')
            lastj = jnp.max(jnp.where(surv_b, jnp.arange(SM)[None, None, :], -1),
                            axis=2)
            # one-hot select (VPU) instead of a (B,SM)-offset gather
            lastj_oh = lastj[:, :, None] == jnp.arange(SM)[None, None, :]
            s_before = jnp.where(
                lastj >= 0,
                jnp.sum(jnp.where(lastj_oh, bs[:, None, :], 0), axis=2,
                        dtype=jnp.int32), -1)
            keep = surv & ((bs != s_before) | (lastj < 0))
            kpos = jnp.cumsum(keep, axis=1) - 1
            new_n = keep.sum(axis=1, dtype=jnp.int32)
            # row-local permutation via a one-hot (B, SM, SM) select (no scatter)
            oh_c = keep[:, None, :] & (kpos[:, None, :] == sidx[0][None, :, None])
            def compact(vals, old):
                arr = jnp.sum(jnp.where(oh_c, vals[:, None, :], 0), axis=2,
                              dtype=jnp.int32)
                return jnp.where(p3[:, None], arr, old)
            nst_k = compact(bk, st["st_k"])
            nst_l = compact(bl, st["st_l"])
            nst_s = compact(bs, st["st_s"])
            nst_qe = compact(st["st_qe"], st["st_qe"])
            st["st_k"], st["st_l"], st["st_s"], st["st_qe"] = (nst_k, nst_l,
                                                               nst_s, nst_qe)
            st["n_st"] = jnp.where(p3, new_n, st["n_st"])
            empty = p3 & (new_n == 0)
            st["i"] = jnp.where(p3 & ~empty, st["i"] - 1, st["i"])
            # smem1 finished: round 1 -> next anchor; round 2 -> next candidate
            st["x"] = jnp.where(empty & st["round1"], st["x_ret"], st["x"])
            st["ph"] = jnp.where(empty,
                                 jnp.where(st["round1"], PH_ANCHOR, PH_R2),
                                 st["ph"])
            return st

        def loc_section(st):
            # s==1 fast path [bwa: bwt_smem1 forward loop, s invariant]:
            # the unique suffix's text position comes from one SA walk;
            # the rest of the forward match is ONE vectorized window
            # compare instead of ~L sequential FM extensions. k is
            # invariant while every extension succeeds (the one l-window
            # occurrence is the matching base, so no higher-ranked counts
            # accumulate), so the pushed (k, s=1, qe) is exactly what the
            # FM loop would push at its final size change / end-of-query.
            st = dict(st)
            p = st["ph"] == PH_LOC
            pos = sa_lookup(didx, jnp.where(p, st["loc_k"], 0), p)
            i = st["i"]
            tstart = pos + (i - st["x"])        # text pos of q[i]'s mate
            qw = query_window_asc(seqs, i, L)   # q[i + j]
            tw = text_window_asc(
                didx, jnp.clip(tstart, 0, 2 * didx.l_pac - 1), L)
            jj = jnp.arange(L, dtype=jnp.int32)[None, :]
            # the window is strand-contiguous only up to the fwd/rev
            # boundary; a match still alive there must bail to FM steps
            bound = jnp.where(tstart < didx.l_pac, didx.l_pac,
                              2 * didx.l_pac)
            tcap = bound - tstart
            qcap = lens - i
            okm = (qw == tw) & (qw <= 3) & (jj < tcap[:, None]) & \
                (jj < qcap[:, None])
            m = jnp.cumprod(okm.astype(jnp.int32), axis=1).sum(
                axis=1, dtype=jnp.int32)
            bail = p & (m == tcap) & (m < qcap) & (seq_at(i + m) <= 3)
            fin = p & ~bail
            st = push_stack(st, fin, st["ik_k"], st["ik_l"], st["ik_s"],
                            i + m)
            st["s1_blk"] = st["s1_blk"] | bail
            st["ph"] = jnp.where(fin, PH_BINIT,
                                 jnp.where(bail, PH_FWD, st["ph"]))
            return st

        st = jax.lax.cond(jnp.any((ph == PH_FWD) | (ph == PH_BINIT)),
                          fwd_section, lambda s: dict(s), st)
        st = jax.lax.cond(jnp.any(ph == PH_BWD), bwd_section,
                          lambda s: dict(s), st)
        st = jax.lax.cond(jnp.any(st["ph"] == PH_LOC), loc_section,
                          lambda s: dict(s), st)

        # close round 1 bookkeeping when transitioning to PH_R2 from anchor
        st["n_out_r1"] = jnp.where(r1_done, st["n_out"], st["n_out_r1"])

        st["it"] = st["it"] + 1
        hard_stop = st["it"] >= iter_max
        st["overflow"] = st["overflow"] | (hard_stop & (st["ph"] != PH_DONE))
        st["ph"] = jnp.where(hard_stop, PH_DONE, st["ph"])
        return st

    def cond(st):
        return jnp.any(st["ph"] != PH_DONE)

    def body_k(st):
        for _ in range(cfg.unroll):
            st = body(st)
        return st

    st = jax.lax.while_loop(cond, body_k, st)

    # final sort by (qb, qe), stable — matches the oracle's stable sort
    msk = jnp.arange(M)[None, :] < st["n_out"][:, None]
    key = jnp.where(msk, st["out_qb"] * (L + 2) + st["out_qe"], BIG)
    order = jnp.argsort(key, axis=1, stable=True).astype(jnp.int32)
    take = lambda a: jnp.take_along_axis(a, order, axis=1)
    return dict(
        qb=take(st["out_qb"]), qe=take(st["out_qe"]), k=take(st["out_k"]),
        s=take(st["out_s"]), n=st["n_out"], overflow=st["overflow"],
        it=st["it"],
    )
