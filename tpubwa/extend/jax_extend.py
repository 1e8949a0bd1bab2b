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
