"""Batched banded affine-gap extension — exact ksw_extend2 semantics in JAX.

The device replacement for the reference's JNI batched Smith-Waterman kernel
[ref: worker1/BWAMemWorker1Batched.scala; bwa: ksw.c :: ksw_extend2]: tasks
arrive as flat padded arrays (query, target, h0, w), one row of the DP runs
per loop step as a Q-wide vector op, the insertion chain F is a max-plus
prefix scan, and band bookkeeping (clip, live-shrink, z-drop, early break)
reproduces the scalar kernel bit-for-bit — the golden tests demand exact
(score, qle, tle, gtle, gscore, max_off) equality against the C++ oracle.

This is also the semantic reference for the Pallas TPU kernel in
tpubwa/ops/sw_pallas.py; keep the two in lockstep.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG = -(2**30)


def _excl_cummax(x):
    inc = jax.lax.associative_scan(jnp.maximum, x)
    return jnp.concatenate([jnp.full((1,), NEG, x.dtype), inc[:-1]])


def _extend_one(query, qlen, target, tlen, h0, w_in, end_bonus, valid,
                scmat, o_del, e_del, o_ins, e_ins, zdrop):
    """One extension task. query: (Q,) int32 codes (pad arbitrary);
    target: (T,) int32. Returns (score, qle, tle, gtle, gscore, max_off)."""
    Q = query.shape[0]
    oe_del, oe_ins = o_del + e_del, o_ins + e_ins
    jj = jnp.arange(Q + 1, dtype=jnp.int32)
    max_sc = jnp.max(scmat)

    # band clip [bwa: the max_ins/max_del adjustment]; integer division is
    # equivalent to bwa's double math after the max(.,1) clamp (e=1 default)
    max_ins = (qlen * max_sc + end_bonus - o_ins) // e_ins + 1
    max_ins = jnp.maximum(max_ins, 1)
    max_del = (qlen * max_sc + end_bonus - o_del) // e_del + 1
    max_del = jnp.maximum(max_del, 1)
    w = jnp.minimum(jnp.minimum(w_in, max_ins), max_del).astype(jnp.int32)

    # first row of eh (index shifted: eh_h[j] holds H(i-1, j-1))
    eh_h0 = jnp.where(jj == 0, h0,
                      jnp.maximum(h0 - o_ins - e_ins * jj, 0))
    eh_h0 = jnp.where(jj <= qlen, eh_h0, 0)
    eh_e0 = jnp.zeros(Q + 1, jnp.int32)

    # per-column match scores: S(i, j) = scmat[target[i], query[j]]
    qcode = jnp.clip(query, 0, 4)

    init = dict(
        i=jnp.int32(0), eh_h=eh_h0, eh_e=eh_e0,
        beg=jnp.int32(0), end=qlen.astype(jnp.int32),
        mx=h0.astype(jnp.int32), max_i=jnp.int32(-1), max_j=jnp.int32(-1),
        max_ie=jnp.int32(-1), gscore=jnp.int32(-1), max_off=jnp.int32(0),
        done=~valid | (qlen <= 0) | (tlen <= 0),
    )

    def cond(st):
        return (~st["done"]) & (st["i"] < tlen)

    def body(st):
        i = st["i"]
        beg = jnp.maximum(st["beg"], i - w)
        end = jnp.minimum(jnp.minimum(st["end"], i + w + 1), qlen)
        tc = jnp.clip(target[jnp.clip(i, 0, target.shape[0] - 1)], 0, 4)
        S = scmat[tc, qcode]                       # (Q,)
        in_band = (jj[:-1] >= beg) & (jj[:-1] < end)

        Mprev = st["eh_h"][:-1]                    # H(i-1, j-1) at column j
        M = jnp.where(Mprev != 0, Mprev + S, 0)
        M = jnp.where(in_band, M, NEG)
        h1_init = jnp.where(beg == 0,
                            jnp.maximum(h0 - (o_del + e_del * (i + 1)), 0), 0)
        e = jnp.where(in_band, st["eh_e"][:-1], NEG)
        # F chain: f(beg)=0; f(j+1) = max(f(j)-e_ins, max(M(j)-oe_ins, 0))
        g = jnp.where(in_band, jnp.maximum(M - oe_ins, 0), NEG)
        A = g + e_ins * jj[:-1]
        # F(j) = max_{beg<=j'<j} (g(j') - e_ins*(j-1-j')), floored at 0
        f = _excl_cummax(A) - e_ins * (jj[:-1] - 1)
        f = jnp.maximum(jnp.where(jj[:-1] > beg, f, 0), 0)
        f = jnp.where(in_band, f, 0)
        # H and next-row E
        # NOTE h includes the M<=0 floor through e,f >= 0
        h = jnp.maximum(jnp.maximum(M, e), f)
        h = jnp.where(in_band, h, NEG)
        e_next = jnp.maximum(jnp.maximum(M - oe_del, 0), e - e_del)
        e_next = jnp.where(in_band, e_next, st["eh_e"][:-1])

        # row max, LAST argmax [ksw tie rule: mj updates when h >= m]
        mm = jnp.max(jnp.where(in_band, h, 0), initial=0)
        is_max = in_band & (h == mm) & (mm > 0)
        mj = jnp.max(jnp.where(is_max, jj[:-1], -1), initial=-1)

        # write-back with the index shift: eh_h[j+1] = H(i, j); eh_h[beg]=h1
        eh_h = st["eh_h"]
        h_sh = jnp.concatenate([jnp.zeros(1, jnp.int32), h])  # index j+1
        upd_h = (jj >= beg) & (jj <= end)
        eh_h = jnp.where(upd_h,
                         jnp.where(jj == beg, h1_init,
                                   jnp.where(jj <= end, h_sh, eh_h)), eh_h)
        eh_e = st["eh_e"]
        upd_e = (jj[:-1] >= beg) & (jj[:-1] < end)
        eh_e_new = jnp.where(upd_e, e_next, eh_e[:-1])
        eh_e = jnp.concatenate([eh_e_new, eh_e[-1:]])
        eh_e = jnp.where(jj == end, 0, eh_e)

        # to-query-end score
        h1_last = jnp.where(end > beg, h[jnp.clip(end - 1, 0, Q - 1)],
                            h1_init)
        reach = end == qlen
        # ksw tie rule: max_ie updates when h1 >= gscore
        new_ie = jnp.where(reach & (h1_last >= st["gscore"]), i,
                           st["max_ie"])
        new_gs = jnp.where(reach, jnp.maximum(st["gscore"], h1_last),
                           st["gscore"])

        # break / max update / z-drop [exact ksw_extend2 order]
        done_now = mm == 0
        better = mm > st["mx"]
        mx = jnp.where(better, mm, st["mx"])
        max_i = jnp.where(better, i, st["max_i"])
        max_j = jnp.where(better, mj, st["max_j"])
        max_off = jnp.where(better,
                            jnp.maximum(st["max_off"], jnp.abs(mj - i)),
                            st["max_off"])
        di = i - st["max_i"]
        dj = mj - st["max_j"]
        zd = jnp.where(
            di > dj,
            st["mx"] - mm - (di - dj) * e_del > zdrop,
            st["mx"] - mm - (dj - di) * e_ins > zdrop)
        done_now = done_now | (~better & (zdrop > 0) & zd)

        # live-band shrink over UPDATED eh in [beg, end]
        live = (eh_h != 0) | (eh_e != 0)
        scan_lo = live & (jj >= beg) & (jj < end)
        beg2 = jnp.min(jnp.where(scan_lo, jj, end), initial=Q + 1)
        beg2 = jnp.minimum(beg2, end)
        scan_hi = live & (jj >= beg2) & (jj <= end)
        last_live = jnp.max(jnp.where(scan_hi, jj, beg2 - 1), initial=-1)
        end2 = jnp.minimum(last_live + 2, qlen)

        return dict(
            i=i + 1, eh_h=eh_h, eh_e=eh_e, beg=beg2, end=end2,
            mx=mx, max_i=max_i, max_j=max_j, max_ie=new_ie, gscore=new_gs,
            max_off=max_off, done=st["done"] | done_now,
        )

    st = jax.lax.while_loop(cond, body, init)
    return (st["mx"], st["max_j"] + 1, st["max_i"] + 1, st["max_ie"] + 1,
            st["gscore"], st["max_off"])


@partial(jax.jit, static_argnums=(10, 11, 12, 13, 14))
def ksw_extend_batch(query, qlen, target, tlen, h0, w, end_bonus, valid,
                     scmat, _unused, o_del=6, e_del=1, o_ins=6, e_ins=1,
                     zdrop=100):
    """Vectorized over tasks. query: (N, Q) int32; target: (N, T) int32.

    Returns six (N,) int32 arrays: score, qle, tle, gtle, gscore, max_off.
    """
    fn = jax.vmap(
        lambda q, ql, t, tl, h, ww, eb, v: _extend_one(
            q, ql, t, tl, h, ww, eb, v, scmat, o_del, e_del, o_ins, e_ins,
            zdrop))
    return fn(query, qlen, target, tlen, h0, w, end_bonus, valid)


# ---------------------------------------------------------------------------
# local alignment (ksw_align forward pass) — exact native/ksw.cpp::local_fwd
# semantics [bwa: ksw.c :: ksw_u8 with KSW_XSUBO], used by mate rescue
# [bwa: bwamem_pair.c :: mem_matesw]. Semantic reference for the Pallas
# kernel in tpubwa/ops/sw_pallas.py :: ksw_local_pallas.
# ---------------------------------------------------------------------------

def _local_one(query, qlen, target, tlen, valid, minsc, scmat,
               o_del, e_del, o_ins, e_ins, want_sub):
    """One unbanded local-SW task. Returns (score, te, qe, score2, te2)."""
    Q = query.shape[0]
    T = target.shape[0]
    oe_del, oe_ins = o_del + e_del, o_ins + e_ins
    jj = jnp.arange(Q, dtype=jnp.int32)
    qcode = jnp.clip(query, 0, 4)
    in_q = jj < qlen

    def row(carry, i):
        H, E = carry
        live = valid & (i < tlen)
        tc = jnp.clip(target[jnp.clip(i, 0, T - 1)], 0, 4)
        S = scmat[tc, qcode]
        Hd = jnp.concatenate([jnp.zeros(1, jnp.int32), H[:-1]])
        M = jnp.maximum(Hd + S, 0)
        G = jnp.maximum(M, E)
        A = (G - oe_ins) + e_ins * jj
        F = jnp.maximum(_excl_cummax(A) - e_ins * (jj - 1), 0)
        Hn = jnp.where(in_q, jnp.maximum(G, F), 0)
        En = jnp.where(in_q, jnp.maximum(
            jnp.maximum(E - e_del, Hn - oe_del), 0), 0)
        imax = jnp.max(Hn, initial=0)
        imj = jnp.min(jnp.where((Hn == imax) & (imax > 0), jj, Q + 1),
                      initial=Q + 1)
        imj = jnp.where(imax > 0, imj, -1)
        H2 = jnp.where(live, Hn, H)
        E2 = jnp.where(live, En, E)
        return (H2, E2), (jnp.where(live, imax, 0), imj)

    (_, _), (imaxs, imjs) = jax.lax.scan(
        row, (jnp.zeros(Q, jnp.int32), jnp.zeros(Q, jnp.int32)),
        jnp.arange(T, dtype=jnp.int32))

    # best: strictly-greater update => earliest row of the global max
    def pick(carry, x):
        best, te, qe, i = carry
        imax, imj = x
        better = imax > best
        return (jnp.where(better, imax, best), jnp.where(better, i, te),
                jnp.where(better, imj, qe), i + 1), None

    (best, te, qe, _), _ = jax.lax.scan(
        pick, (jnp.int32(0), jnp.int32(-1), jnp.int32(-1), jnp.int32(0)),
        (imaxs, imjs))

    if not want_sub:
        return best, te, qe, jnp.int32(0), jnp.int32(-1)

    # score2: bwa's quirky run tracking — a run's position is the row of its
    # last max UPDATE; adjacency is tested against that row, so
    # non-improving rows can split runs [native/ksw.cpp :: local_fwd]
    lo, hi = te - qlen, te + qlen

    def run(carry, x):
        bf, bs, ans2, ate2, i = carry
        imax = x
        elig = valid & (i < tlen) & (imax >= minsc)
        new_run = elig & (bs + 1 != i)
        fin = new_run & (bs >= 0)
        outside = (bs < lo) | (bs > hi)
        upd = fin & outside & (bf > ans2)
        ans2 = jnp.where(upd, bf, ans2)
        ate2 = jnp.where(upd, bs, ate2)
        grow = elig & ~new_run & (imax > bf)
        bf2 = jnp.where(new_run, imax, jnp.where(grow, imax, bf))
        bs2 = jnp.where(new_run, i, jnp.where(grow, i, bs))
        return (bf2, bs2, ans2, ate2, i + 1), None

    (bf, bs, ans2, ate2, _), _ = jax.lax.scan(
        run, (jnp.int32(0), jnp.int32(-2), jnp.int32(0), jnp.int32(-1),
              jnp.int32(0)), imaxs)
    fin = bs >= 0
    upd = fin & ((bs < lo) | (bs > hi)) & (bf > ans2)
    ans2 = jnp.where(upd, bf, ans2)
    ate2 = jnp.where(upd, bs, ate2)
    return best, te, qe, ans2, ate2


@partial(jax.jit, static_argnums=(6, 7, 8, 9, 10, 11))
def ksw_local_batch(query, qlen, target, tlen, valid, minsc, scmat_tuple,
                    o_del=6, e_del=1, o_ins=6, e_ins=1, want_sub=True):
    """Batched unbanded local SW. query: (N, Q) int32; target: (N, T) int32;
    minsc: (N,) int32 (score2-eligibility threshold).

    Returns five (N,) int32 arrays: score, te, qe, score2, te2 — exact
    native/ksw.cpp::local_fwd semantics.
    """
    import numpy as np
    scmat = jnp.asarray(np.array(scmat_tuple, np.int32).reshape(5, 5))
    fn = jax.vmap(
        lambda q, ql, t, tl, v, ms: _local_one(
            q, ql, t, tl, v, ms, scmat, o_del, e_del, o_ins, e_ins,
            want_sub))
    out = fn(query, qlen, target, tlen, valid, minsc)
    return out
