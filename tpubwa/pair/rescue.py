"""Device mate-rescue: batched ksw_align + rescue-task orchestration.

TPU-native replacement for the reference's per-pair mate-rescue SW
[bwa: bwamem_pair.c :: mem_matesw; ksw.c :: ksw_align2 with
KSW_XSTART|KSW_XSUBO] (reference flow [ref: worker2/MemSamPe.scala]).

Design (SURVEY.md §2.4 "same Pallas kernel family, local-alignment mode"):
the native PE finisher extracts every rescue window a batch COULD run
(a superset — the per-call skip logic only prunes), all windows run as one
batched device local-alignment (forward pass for score/end/subopt, reverse
pass on the (qe, te) prefixes for the start), and the scalar pairing logic
replays with the precomputed results injected. Identical semantics to the
sequential scalar loop because window coordinates depend only on the
pre-rescue region lists and the insert-size stats, never on earlier
rescues.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def _scmat_tuple(a: int, b: int):
    m = np.full((5, 5), -1, dtype=np.int32)
    for i in range(4):
        for j in range(4):
            m[i, j] = a if i == j else -b
    return tuple(int(v) for v in m.reshape(-1))


def _rev_prefix(rows: jnp.ndarray, end: jnp.ndarray) -> jnp.ndarray:
    """out[r, j] = rows[r, end[r] - j] (j <= end), else 4 — the reversed
    prefix used by ksw_align's start-extraction pass."""
    from ..seed.lut import _shift_rows
    W = rows.shape[1]
    flipped = rows[:, ::-1]
    return _shift_rows(flipped, W - 1 - end, W)


@partial(jax.jit, static_argnums=(6, 7, 8, 9, 10, 11, 12))
def ksw_align_batch(query, qlen, target, tlen, minsc, valid,
                    o_del=6, e_del=1, o_ins=6, e_ins=1, a_sc=1, b_sc=4,
                    use_pallas=False):
    """Batched [bwa: ksw.c :: ksw_align2(XSTART|XSUBO)].

    query: (N, Q) int codes; target: (N, T); qlen/tlen/minsc/valid: (N,).
    Returns (N, 7) int32: score, tb, te, qb, qe, score2, te2 (tb/qb = -1
    when score < minsc, matching the scalar no-start-extraction path).
    """
    query = query.astype(jnp.int32)
    target = target.astype(jnp.int32)
    qlen = qlen.astype(jnp.int32)
    tlen = tlen.astype(jnp.int32)
    minsc = minsc.astype(jnp.int32)

    if use_pallas:
        from ..ops.sw_pallas import ksw_local_pallas
        fwd = ksw_local_pallas(query, qlen, target, tlen, minsc, valid,
                               o_del, e_del, o_ins, e_ins, a_sc, b_sc,
                               want_sub=True)
        score, te, qe, score2, te2 = (fwd[:, c] for c in range(5))
    else:
        from ..extend.jax_extend import ksw_local_batch
        score, te, qe, score2, te2 = ksw_local_batch(
            query, qlen, target, tlen, valid, minsc,
            _scmat_tuple(a_sc, b_sc), o_del, e_del, o_ins, e_ins, True)

    need = valid & (score >= minsc) & (te >= 0)
    rq = _rev_prefix(query, jnp.where(need, qe, 0))
    rt = _rev_prefix(target, jnp.where(need, te, 0))
    big = jnp.full_like(minsc, 0x10000)
    if use_pallas:
        from ..ops.sw_pallas import ksw_local_pallas
        rev = ksw_local_pallas(rq, qe + 1, rt, te + 1, big, need,
                               o_del, e_del, o_ins, e_ins, a_sc, b_sc,
                               want_sub=False)
        _, rte, rqe = rev[:, 0], rev[:, 1], rev[:, 2]
    else:
        from ..extend.jax_extend import ksw_local_batch
        _, rte, rqe, _, _ = ksw_local_batch(
            rq, qe + 1, rt, te + 1, need, big,
            _scmat_tuple(a_sc, b_sc), o_del, e_del, o_ins, e_ins, False)
    qb = jnp.where(need, qe - rqe, -1)
    tb = jnp.where(need, te - rte, -1)
    return jnp.stack([score, tb, te, qb, qe, score2, te2], axis=1)


@partial(jax.jit, static_argnums=(7, 8, 9))
def _rescue_batch_device(didx, seqs, lens, mate_row, is_rev, rb, wlen,
                         T, minsc, kw):
    """Assemble + run all rescue windows of a batch on device.

    seqs: (B, L) the batch reads; mate_row/is_rev/rb/wlen: (N,) task arrays
    from native mem_rescue_tasks. The query is the mate read (revcomp'd on
    device when the orientation demands it); the target is the predicted
    text window. Returns (N, 7) int32 ksw_align rows.
    """
    from ..ops.window import text_window_asc
    from ..seed.lut import _shift_rows
    seqs = seqs.astype(jnp.int32)
    L = seqs.shape[1]
    q0 = seqs[mate_row]
    la = lens[mate_row].astype(jnp.int32)
    flipped = q0[:, ::-1]
    rq = _shift_rows(flipped, L - la, L)
    rq = jnp.where(rq <= 3, 3 - rq, 4)
    q = jnp.where(is_rev[:, None] != 0, rq, q0)
    q = jnp.where(jnp.arange(L, dtype=jnp.int32)[None, :] < la[:, None],
                  q, 4)
    t = text_window_asc(didx, rb, T)
    t = jnp.where(jnp.arange(T, dtype=jnp.int32)[None, :] < wlen[:, None],
                  t, 4)
    return ksw_align_batch(q, la, t, wlen,
                           jnp.full(q.shape[0], minsc, jnp.int32),
                           jnp.ones(q.shape[0], bool), *kw)


def dispatch_rescue_tasks(didx, batch_seqs, batch_lens, tasks, id0, opt,
                          use_pallas):
    """Enqueue the rescue device call WITHOUT blocking. Returns (device
    array, n) — download with `np.asarray(dev)[:n]` when the result is
    actually needed (the PE stream overlaps this with the next batch's
    worker1)."""
    if len(tasks) == 0:
        return None, 0
    n = len(tasks)
    # power-of-2 task-count buckets: a 64-multiple quantum still produced
    # a fresh kernel COMPILE (~minutes on remote TPU) for nearly every
    # batch; pow2 buckets make the shape set tiny and stable. Padded rows
    # are tlen-sorted into tiles that exit after one DP row.
    cap = 256
    while cap < n:
        cap <<= 1
    pad = cap - n
    if pad:
        tasks = np.concatenate(
            [tasks, np.tile(tasks[-1:], (pad, 1))], axis=0)
    p_local = (tasks[:, 0] - id0).astype(np.int64)
    mate_row = (2 * p_local + (1 - tasks[:, 1])).astype(np.int32)
    is_rev = tasks[:, 4].astype(np.int32)
    rb = tasks[:, 5]
    wlen = (tasks[:, 6] - tasks[:, 5]).astype(np.int32)
    T = max(256, int(-(-int(wlen.max()) // 256)) * 256)
    kw = (opt.o_del, opt.e_del, opt.o_ins, opt.e_ins, opt.a, opt.b,
          use_pallas)
    out = _rescue_batch_device(
        didx, jnp.asarray(batch_seqs), jnp.asarray(batch_lens),
        jnp.asarray(mate_row), jnp.asarray(is_rev),
        jnp.asarray(rb.astype(np.int64 if didx.pos_dtype == jnp.int64
                              else np.int32)),
        jnp.asarray(wlen), T, int(opt.min_seed_len * opt.a), kw)
    return out, n


def run_rescue_tasks(didx, batch_seqs, batch_lens, tasks, id0, opt,
                     use_pallas):
    """Blocking driver: task rows (n, 8) int64 (pair, end, j, dir, is_rev,
    rb, re, rid) -> (n, 7) int32 ksw_align results via one device call."""
    dev, n = dispatch_rescue_tasks(didx, batch_seqs, batch_lens, tasks,
                                   id0, opt, use_pallas)
    if dev is None:
        return np.zeros((0, 7), np.int32)
    return np.asarray(dev, np.int32)[:n]
