"""Pallas TPU kernel for batched banded extension (ksw_extend2 semantics).

The speed-of-light version of tpubwa/extend/jax_extend.py (which remains the
bit-exact reference and CPU fallback): one kernel invocation processes the
whole task batch; DP state (eh arrays + per-task band/max scalars) lives in
VMEM for the entire row loop, so HBM traffic is inputs+outputs only. Tasks
run across sublanes, query columns across lanes; the insertion chain F is a
log-step max-plus scan along lanes.

Semantics contract: identical (score, qle, tle, gtle, gscore, max_off) to
native/ksw.cpp :: ksw_extend2 — enforced by tests against both the oracle
and the JAX reference kernel.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(2**30)


def _pick_tile(N, vmem_rows):
    """Task-tile size for the grid: Mosaic requires the second-to-last
    block dim be a multiple of 8 (unless it equals the array dim), so floor
    the VMEM-budget row count to a multiple of 8 and never exceed N rounded
    up to 8.  Callers pad the batch to a multiple of the returned tile.
    Regression guard for BENCH_r03: T=768 gave tile=42 and Q=256 gave
    tile=85, both rejected by the TPU lowering."""
    tile = max(8, (vmem_rows // 8) * 8)
    return min(tile, ((N + 7) // 8) * 8)


def _sort_perm(tlen, valid):
    """Ascending-(valid, tlen) task permutation. The DP loop of each grid
    tile runs until the SLOWEST task in the tile finishes, so grouping
    tasks of similar target length (and pushing invalid tasks into tiles
    that exit after one iteration) cuts the total sequential row count
    from n_tiles * max(tlen) to ~sum of per-tile quantiles."""
    key = jnp.where(valid.astype(bool), tlen.astype(jnp.int32), -1)
    return jnp.argsort(key).astype(jnp.int32)


def _apply_perm(mat, perm):
    """Row permutation. For small N an MXU one-hot contraction beats XLA's
    per-offset row-gather cost; the f32 matmul is exact only for values
    < 2^24 (codes <= 4 and int16-range scalars here). Above the size
    threshold — where the N x N one-hot would also balloon HBM — use a
    plain row gather (N offsets), which has no value-range contract."""
    N = mat.shape[0]
    if N > 4096 or jnp.issubdtype(mat.dtype, jnp.int64):
        return jnp.take(mat, perm, axis=0)
    oh = (perm[:, None] == jnp.arange(N, dtype=jnp.int32)[None, :]
          ).astype(jnp.float32)
    out = jnp.matmul(oh, mat.astype(jnp.float32),
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.round(out).astype(mat.dtype)


def _lane_shift_right(x, sh, fill):
    """Shift along the lane axis (last dim): out[..., j] = x[..., j-sh].

    sh is STATIC — a concatenate of static slices, not jnp.roll: roll
    builds int64 index arithmetic under x64, which Mosaic cannot lower.
    """
    if sh == 0:
        return x
    pad = jnp.full((x.shape[0], sh), fill, x.dtype)
    return jnp.concatenate([pad, x[:, : x.shape[1] - sh]], axis=1)


def _excl_cummax_lanes(a):
    """Exclusive running max along lanes via log-step doubling."""
    x = _lane_shift_right(a, 1, NEG)
    sh = 1
    while sh < a.shape[1]:
        x = jnp.maximum(x, _lane_shift_right(x, sh, NEG))
        sh <<= 1
    return x


def _kernel(q_ref, t_ref, scal_ref, out_ref, *, T, LANES, o_del, e_del,
            o_ins, e_ins, zdrop, a_sc, b_sc):
    N = q_ref.shape[0]
    oe_del, oe_ins = o_del + e_del, o_ins + e_ins
    # bind every static scalar as a typed int32: under jax_enable_x64 a
    # bare python int entering a lax op becomes a weak i64[] scalar, and
    # Mosaic cannot lower 64-bit converts (infinite _convert_helper loop)
    o_del, e_del, o_ins, e_ins, zdrop, a_sc, b_sc, oe_del, oe_ins = (
        jnp.int32(v) for v in (o_del, e_del, o_ins, e_ins, zdrop, a_sc,
                               b_sc, oe_del, oe_ins))
    jj = jax.lax.broadcasted_iota(jnp.int32, (N, LANES), 1)
    qlen = scal_ref[:, 0:1]
    tlen = scal_ref[:, 1:2]
    h0 = scal_ref[:, 2:3]
    w_in = scal_ref[:, 3:4]
    eb = scal_ref[:, 4:5]
    valid = scal_ref[:, 5:6] != 0

    q = q_ref[:, :]                           # (N, LANES) int32 codes

    # band clip [bwa: max_ins/max_del adjustment]
    max_ins = jnp.maximum((qlen * a_sc + eb - o_ins) // e_ins + 1, 1)
    max_del = jnp.maximum((qlen * a_sc + eb - o_del) // e_del + 1, 1)
    w = jnp.minimum(jnp.minimum(w_in, max_ins), max_del)

    # first eh row (index-shifted: eh_h[j] = H(i-1, j-1))
    eh_h0 = jnp.where(jj == 0, h0, jnp.maximum(h0 - o_ins - e_ins * jj, 0))
    eh_h0 = jnp.where(jj <= qlen, eh_h0, 0)
    eh_e0 = jnp.zeros((N, LANES), jnp.int32)

    z = jnp.zeros((N, 1), jnp.int32)
    init = (jnp.zeros((N, 1), jnp.int32),      # i
            eh_h0, eh_e0,
            z,                                  # beg
            qlen,                               # end
            h0,                                 # mx
            z - 1, z - 1, z - 1,                # max_i, max_j, max_ie
            z - 1,                              # gscore
            z,                                  # max_off
            (~valid | (qlen <= 0) | (tlen <= 0)).astype(jnp.int32))  # done

    def cond(st):
        i, *_, done = st
        # int32 max, not jnp.any: Mosaic lowers boolean reductions through
        # a float helper that re-traces under x64 (f64 is unsupported)
        live = ((done == 0) & (i < tlen)).astype(jnp.int32)
        return jnp.max(live) > 0

    def body(st):
        (i, eh_h, eh_e, beg0, end0, mx0, max_i0, max_j0, max_ie0, gscore0,
         max_off0, done) = st
        live = (done == 0) & (i < tlen)
        beg = jnp.maximum(beg0, i - w)
        end = jnp.minimum(jnp.minimum(end0, i + w + 1), qlen)
        # target column i per task — Mosaic has no per-row lane gather, so
        # select via one-hot compare + row max (T is small)
        isafe = jnp.clip(i, 0, T - 1)
        tt = jax.lax.broadcasted_iota(jnp.int32, (N, T), 1)
        tc = jnp.max(jnp.where(tt == isafe, t_ref[:, :], -1), axis=1,
                     keepdims=True)
        # match score without a table gather
        S = jnp.where((tc == q) & (tc < 4) & (q < 4), a_sc,
                      jnp.where((tc > 3) | (q > 3), -1, -b_sc))
        in_band = (jj >= beg) & (jj < end)

        M = jnp.where(eh_h != 0, eh_h + S, 0)
        M = jnp.where(in_band, M, NEG)
        h1_init = jnp.where(beg == 0,
                            jnp.maximum(h0 - (o_del + e_del * (i + 1)), 0), 0)
        e = jnp.where(in_band, eh_e, NEG)
        g = jnp.where(in_band, jnp.maximum(M - oe_ins, 0), NEG)
        A = g + e_ins * jj
        f = _excl_cummax_lanes(A) - e_ins * (jj - 1)
        f = jnp.maximum(jnp.where(jj > beg, f, 0), 0)
        f = jnp.where(in_band, f, 0)
        h = jnp.maximum(jnp.maximum(M, e), f)
        h_band = jnp.where(in_band, h, NEG)
        e_next = jnp.maximum(jnp.maximum(M - oe_del, 0), e - e_del)
        e_next = jnp.where(in_band, e_next, eh_e)

        mm = jnp.max(jnp.where(in_band, h_band, 0), axis=1, keepdims=True)
        is_max = in_band & (h_band == mm) & (mm > 0)
        mj = jnp.max(jnp.where(is_max, jj, -1), axis=1, keepdims=True)

        # eh write-back with the index shift
        h_sh = _lane_shift_right(h_band, 1, 0)
        upd_h = (jj >= beg) & (jj <= end)
        eh_h_new = jnp.where(
            upd_h, jnp.where(jj == beg, h1_init, h_sh), eh_h)
        upd_e = (jj >= beg) & (jj < end)
        eh_e_new = jnp.where(upd_e, e_next, eh_e)
        eh_e_new = jnp.where(jj == end, 0, eh_e_new)

        # to-query-end score: H(i, end-1)
        h1_last_v = jnp.max(
            jnp.where(jj == jnp.maximum(end - 1, 0), h_band, NEG), axis=1,
            keepdims=True)
        h1_last = jnp.where(end > beg, h1_last_v, h1_init)
        reach = end == qlen
        new_ie = jnp.where(reach & (h1_last >= gscore0), i, max_ie0)
        new_gs = jnp.where(reach, jnp.maximum(gscore0, h1_last), gscore0)

        done_now = mm == 0
        better = mm > mx0
        mx = jnp.where(better, mm, mx0)
        max_i = jnp.where(better, i, max_i0)
        max_j = jnp.where(better, mj, max_j0)
        max_off = jnp.where(better,
                            jnp.maximum(max_off0, jnp.abs(mj - i)), max_off0)
        di = i - max_i0
        dj = mj - max_j0
        # int select then one compare (Mosaic can't select between bools)
        zpen = jnp.where(di > dj, (di - dj) * e_del, (dj - di) * e_ins)
        zd = (mx0 - mm - zpen) > zdrop
        done_now = done_now | ((better == 0) & (zdrop > 0) & zd)

        # live-band shrink over updated eh in [beg, end]
        alive = (eh_h_new != 0) | (eh_e_new != 0)
        scan_lo = alive & (jj >= beg) & (jj < end)
        beg2 = jnp.min(jnp.where(scan_lo, jj, end), axis=1, keepdims=True)
        beg2 = jnp.minimum(beg2, end)
        scan_hi = alive & (jj >= beg2) & (jj <= end)
        last_live = jnp.max(jnp.where(scan_hi, jj, beg2 - 1), axis=1,
                            keepdims=True)
        end2 = jnp.minimum(last_live + 2, qlen)

        # freeze finished tasks
        frz = lambda new, old: jnp.where(live, new, old)
        frz2 = lambda new, old: jnp.where(live, new, old)
        return (frz(i + 1, i), frz2(eh_h_new, eh_h), frz2(eh_e_new, eh_e),
                frz(beg2, beg0), frz(end2, end0), frz(mx, mx0),
                frz(max_i, max_i0), frz(max_j, max_j0), frz(new_ie, max_ie0),
                frz(new_gs, gscore0), frz(max_off, max_off0),
                jnp.where(live, done | done_now.astype(jnp.int32), done))

    # 2 DP rows per loop iteration: body is idempotent for finished tasks
    # (live-masked state freeze), so body∘body under the same cond is
    # exact and halves the while_loop cond/bookkeeping overhead
    st = jax.lax.while_loop(cond, lambda s: body(body(s)), init)
    (_, _, _, _, _, mx, max_i, max_j, max_ie, gscore, max_off, _) = st
    out = jnp.concatenate(
        [mx, max_j + 1, max_i + 1, max_ie + 1, gscore, max_off], axis=1)
    out_ref[:, :] = out


def _local_kernel(q_ref, t_ref, scal_ref, out_ref, *, T, LANES, o_del,
                  e_del, o_ins, e_ins, a_sc, b_sc, want_sub):
    """Unbanded local SW (ksw_align forward pass) — exact
    native/ksw.cpp::local_fwd semantics; see jax_extend.ksw_local_batch
    for the scan-level reference. Tasks across sublanes, query across
    lanes; target rows stream sequentially; per-row maxima are stored in a
    VMEM (N, T) scratch for the score2 run-tracking pass."""
    N = q_ref.shape[0]
    o_del, e_del, o_ins, e_ins, a_sc, b_sc = (
        jnp.int32(v) for v in (o_del, e_del, o_ins, e_ins, a_sc, b_sc))
    oe_del, oe_ins = o_del + e_del, o_ins + e_ins
    jj = jax.lax.broadcasted_iota(jnp.int32, (N, LANES), 1)
    tt = jax.lax.broadcasted_iota(jnp.int32, (N, T), 1)
    qlen = scal_ref[:, 0:1]
    tlen = scal_ref[:, 1:2]
    minsc = scal_ref[:, 2:3]
    valid = scal_ref[:, 3:4] != 0
    q = q_ref[:, :]
    in_q = jj < qlen

    zrow = jnp.zeros((N, LANES), jnp.int32)
    z1 = jnp.zeros((N, 1), jnp.int32)
    # per-row maxima scratch exists only for the score2 run-tracking pass;
    # the want_sub=False reverse pass carries a 1-wide dummy (and its
    # callers budget VMEM at 2 rows of T instead of 3)
    init = (z1,                     # i
            zrow, zrow,             # H, E
            z1,                     # best
            z1 - 1, z1 - 1,         # te, qe
            jnp.zeros((N, T if want_sub else 1), jnp.int32))

    def cond(st):
        i = st[0]
        live = (valid & (i < tlen)).astype(jnp.int32)
        return jnp.max(live) > 0

    def body(st):
        i, H, E, best, te, qe, imax_arr = st
        live = valid & (i < tlen)
        isafe = jnp.clip(i, 0, T - 1)
        tc = jnp.max(jnp.where(tt == isafe, t_ref[:, :], -1), axis=1,
                     keepdims=True)
        S = jnp.where((tc == q) & (tc < 4) & (q < 4), a_sc,
                      jnp.where((tc > 3) | (q > 3), -1, -b_sc))
        Hd = _lane_shift_right(H, 1, 0)
        M = jnp.maximum(Hd + S, 0)
        G = jnp.maximum(M, E)
        A = (G - oe_ins) + e_ins * jj
        F = jnp.maximum(_excl_cummax_lanes(A) - e_ins * (jj - 1), 0)
        Hn = jnp.where(in_q, jnp.maximum(G, F), 0)
        En = jnp.where(in_q, jnp.maximum(
            jnp.maximum(E - e_del, Hn - oe_del), 0), 0)
        imax = jnp.max(Hn, axis=1, keepdims=True)
        imj = jnp.min(jnp.where((Hn == imax) & (imax > 0), jj, LANES + 1),
                      axis=1, keepdims=True)
        imj = jnp.where(imax > 0, imj, -1)
        better = live & (imax > best)
        best2 = jnp.where(better, imax, best)
        te2 = jnp.where(better, i, te)
        qe2 = jnp.where(better, imj, qe)
        if want_sub:
            imax_arr = jnp.where((tt == isafe) & live, imax, imax_arr)
        return (i + 1, jnp.where(live, Hn, H), jnp.where(live, En, E),
                best2, te2, qe2, imax_arr)

    # 2 rows per iteration (see the extend kernel note; body live-masks)
    i, H, E, best, te, qe, imax_arr = jax.lax.while_loop(
        cond, lambda s: body(body(s)), init)

    if want_sub:
        # run tracking over the stored row maxima [local_fwd's b list]:
        # a run's position is the row of its last max update; adjacency is
        # tested against that row; filter vs [te-qlen, te+qlen] at the end
        lo, hi = te - qlen, te + qlen

        def rcond(st):
            i = st[0]
            live = (valid & (i < tlen)).astype(jnp.int32)
            return jnp.max(live) > 0

        def rbody(st):
            i, bf, bs, ans2, ate2 = st
            live = valid & (i < tlen)
            isafe = jnp.clip(i, 0, T - 1)
            im = jnp.max(jnp.where(tt == isafe, imax_arr, -1), axis=1,
                         keepdims=True)
            elig = live & (im >= minsc)
            new_run = elig & (bs + 1 != i)
            fin = new_run & (bs >= 0)
            upd = fin & ((bs < lo) | (bs > hi)) & (bf > ans2)
            ans2 = jnp.where(upd, bf, ans2)
            ate2 = jnp.where(upd, bs, ate2)
            grow = elig & (new_run == False) & (im > bf)  # noqa: E712
            bf2 = jnp.where(new_run | grow, im, bf)
            bs2 = jnp.where(new_run | grow, i, bs)
            return i + 1, bf2, bs2, ans2, ate2

        _, bf, bs, ans2, ate2 = jax.lax.while_loop(
            rcond, lambda s: rbody(rbody(s)), (z1, z1, z1 - 2, z1, z1 - 1))
        upd = (bs >= 0) & ((bs < lo) | (bs > hi)) & (bf > ans2)
        ans2 = jnp.where(upd, bf, ans2)
        ate2 = jnp.where(upd, bs, ate2)
    else:
        ans2 = z1
        ate2 = z1 - 1

    out_ref[:, :] = jnp.concatenate([best, te, qe, ans2, ate2], axis=1)


@partial(jax.jit,
         static_argnames=("o_del", "e_del", "o_ins", "e_ins", "a_sc",
                          "b_sc", "want_sub", "interpret"))
def ksw_local_pallas(query, qlen, target, tlen, minsc, valid,
                     o_del=6, e_del=1, o_ins=6, e_ins=1, a_sc=1, b_sc=4,
                     want_sub=True, interpret=False):
    """Batched unbanded local SW on TPU. query: (N, Q) int; target: (N, T)
    int; qlen/tlen/minsc/valid: (N,).

    Returns (N, 5) int32: score, te, qe, score2, te2 — exact
    native/ksw.cpp::local_fwd semantics (ksw_align forward pass).
    """
    N, Q = query.shape
    T = target.shape[1]
    LANES = max(128, ((Q + 127) // 128) * 128)
    qpad = jnp.full((N, LANES), 4, jnp.int32)
    qpad = qpad.at[:, :Q].set(query.astype(jnp.int32))
    tpad = target.astype(jnp.int32)
    scal = jnp.stack([qlen.astype(jnp.int32), tlen.astype(jnp.int32),
                      minsc.astype(jnp.int32),
                      valid.astype(jnp.int32)], axis=1)
    # group similar-tlen tasks into the same grid tile (per-tile DP loops
    # exit at the tile's slowest task); un-permuted on output below
    perm = _sort_perm(scal[:, 1], scal[:, 3])
    qpad = _apply_perm(qpad, perm)
    tpad = _apply_perm(tpad, perm)
    scal = _apply_perm(scal, perm)
    kernel = partial(_local_kernel, T=T, LANES=LANES, o_del=o_del,
                     e_del=e_del, o_ins=o_ins, e_ins=e_ins, a_sc=a_sc,
                     b_sc=b_sc, want_sub=want_sub)
    # explicit VMEM accounting (each grid tile pays a sequential DP loop
    # to its slowest task, so bigger tiles = proportionally fewer
    # sequential rows): Mosaic's scoped-vmem stack holds ~4 copies of the
    # carries/temps (double-buffered in+out), measured 16B x (8 rows of
    # LANES + 3 rows of T) per task; target 12 MB of the 16 MB limit.
    # The (N, T) imax_arr scratch only exists when want_sub — the rescue
    # reverse pass (want_sub=False) gets the bigger tiles it can afford
    t_rows = 3 if want_sub else 2
    tile = _pick_tile(N, (12 << 20) // (16 * (8 * LANES + t_rows * T)))
    if N % tile:
        pad_n = tile - N % tile
        qpad = jnp.concatenate(
            [qpad, jnp.full((pad_n, LANES), 4, jnp.int32)])
        tpad = jnp.concatenate([tpad, jnp.full((pad_n, T), 4, jnp.int32)])
        scal = jnp.concatenate([scal, jnp.zeros((pad_n, 4), jnp.int32)])
    Np = qpad.shape[0]
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(Np // tile,),
            out_shape=jax.ShapeDtypeStruct((Np, 5), jnp.int32),
            in_specs=[
                pl.BlockSpec((tile, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, T), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 4), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, 5), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(qpad, tpad, scal)
    inv = jnp.zeros((N,), jnp.int32).at[perm].set(
        jnp.arange(N, dtype=jnp.int32))
    return _apply_perm(out[:N], inv)


@partial(jax.jit,
         static_argnames=("o_del", "e_del", "o_ins", "e_ins", "zdrop",
                          "a_sc", "b_sc", "interpret"))
def ksw_extend_pallas(query, qlen, target, tlen, h0, w, end_bonus, valid,
                      o_del=6, e_del=1, o_ins=6, e_ins=1, zdrop=100,
                      a_sc=1, b_sc=4, interpret=False):
    """query: (N, Q<=127) int; target: (N, T) int; scalars (N,).

    Returns (N, 6) int32: score, qle, tle, gtle, gscore, max_off — exact
    ksw_extend2 semantics with the bwa 5x5 matrix (match a, mismatch -b,
    N scores -1).
    """
    N, Q = query.shape
    T = target.shape[1]
    LANES = max(128, ((Q + 1 + 127) // 128) * 128)
    qpad = jnp.full((N, LANES), 4, jnp.int32)
    qpad = qpad.at[:, :Q].set(query.astype(jnp.int32))
    tpad = target.astype(jnp.int32)
    scal = jnp.stack([qlen.astype(jnp.int32), tlen.astype(jnp.int32),
                      h0.astype(jnp.int32), w.astype(jnp.int32),
                      end_bonus.astype(jnp.int32),
                      valid.astype(jnp.int32)], axis=1)
    # tlen-sorted tile assignment (see ksw_local_pallas)
    perm = _sort_perm(scal[:, 1], scal[:, 5])
    qpad = _apply_perm(qpad, perm)
    tpad = _apply_perm(tpad, perm)
    scal = _apply_perm(scal, perm)
    kernel = partial(_kernel, T=T, LANES=LANES, o_del=o_del, e_del=e_del,
                     o_ins=o_ins, e_ins=e_ins, zdrop=zdrop, a_sc=a_sc,
                     b_sc=b_sc)
    # tile tasks across the grid so DP state fits in VMEM: measured 16B x
    # (8 rows of LANES + 2 rows of T) per task (4 scoped copies — see the
    # local-kernel note; a 976-task tile at T=290 OOMed at 24.19M/16M);
    # target 12 MB of the 16 MB limit
    tile = _pick_tile(N, (12 << 20) // (16 * (8 * LANES + 2 * T)))
    if N % tile:
        pad_n = tile - N % tile
        qpad = jnp.concatenate(
            [qpad, jnp.full((pad_n, LANES), 4, jnp.int32)])
        tpad = jnp.concatenate([tpad, jnp.full((pad_n, T), 4, jnp.int32)])
        scal = jnp.concatenate([scal, jnp.zeros((pad_n, 6), jnp.int32)])
    Np = qpad.shape[0]
    # Trace the kernel with x64 DISABLED: under jax_enable_x64 every bare
    # python literal inside the kernel becomes a weak i64[] scalar operand,
    # and Mosaic cannot lower 64-bit converts. All kernel inputs/outputs
    # are explicit int32, so semantics are unchanged.
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(Np // tile,),
            out_shape=jax.ShapeDtypeStruct((Np, 6), jnp.int32),
            in_specs=[
                pl.BlockSpec((tile, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, T), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 6), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, 6), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(qpad, tpad, scal)
    inv = jnp.zeros((N,), jnp.int32).at[perm].set(
        jnp.arange(N, dtype=jnp.int32))
    return _apply_perm(out[:N], inv)
