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
