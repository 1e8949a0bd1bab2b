"""Per-end SMEM seeding with a k-mer jump table and an s==1 SA shortcut.

Third-generation seeding design (after seed/device.py's per-end walk and
seed/anchor.py's lockstep anchor machine). Motivation, measured on v5e:
every XLA gather/scatter op costs ~70us FIXED plus ~5ns/offset, and a
lockstep state machine pays that fixed cost x ~8 ops x ~266 iterations
(~650 ms / 4096 reads).  This module restructures seeding so the whole
batch finishes in O(10) lockstep iterations:

  1. **k-mer jump table**: the bidirectional FM interval (k, s) of every
     length-k0 string is precomputed host-side (plus, for unique k-mers,
     the resolved text position).  Every (read, end) walk starts at length
     k0 with ONE row gather instead of k0 sequential FM extensions.
  2. **per-end walks**: for threshold v, b_v(j) = minimal start such that
     read[b_v(j), j) occurs >= v times; the SMEM set is exactly
     {[b_v(j), j) : b_v(j) < b_v(j+1), length >= min_seed_len} (see
     ARCHITECTURE.md for the equivalence proof vs [bwa: bwt.c::bwt_smem1a,
     bwamem.c::mem_collect_intv]).  All B x L ends extend in lockstep; the
     next query base is a diagonal shift (one dynamic-slice, no gather).
  3. **s==1 shortcut**: once an interval is unique its text position is
     known (from the jump table, or one batched SA walk), and the rest of
     the walk is ONE vectorized text comparison instead of per-base FM
     extensions.  This bounds FM iterations by ~log4(genome)-k0 instead of
     the read length.

Exactness with a truncated table (k0 <= min_seed_len): an end whose k0-mer
is absent (or below threshold) has b(j) > j-k0 >= j-min_seed_len, so it can
never emit; and the only other consumer of b(j) is end j-1's maximality
test b(j-1) < b(j), where an emitting j-1 has b(j-1) <= j-1-min_seed_len
< j-k0+1 <= b(j), so the test's outcome is exact no matter what in-range
placeholder we store.  We store b(j) := j ("no match") for such lanes.

Reads whose s==1 text comparison would have to cross the forward/reverse
strand boundary (probability ~L/l_pac) are flagged overflow and realigned
by the host oracle, preserving exactness.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from ..index.builder import FMIndex
from ..index.device import DeviceIndex, backward_ext, sa_lookup
from ..ops.window import text_window_asc, text_window_desc
from .device import _emit_mask

BIG = 2**30


# --------------------------------------------------------------------------
# host-side jump-table construction
# --------------------------------------------------------------------------

def _popcount32_np(x: np.ndarray) -> np.ndarray:
    x = x - ((x >> np.uint32(1)) & np.uint32(0x55555555))
    x = (x & np.uint32(0x33333333)) + ((x >> np.uint32(2)) & np.uint32(0x33333333))
    x = (x + (x >> np.uint32(4))) & np.uint32(0x0F0F0F0F)
    return ((x * np.uint32(0x01010101)) >> np.uint32(24)).astype(np.int64)


def _occ1_vec(idx: FMIndex, k: np.ndarray, c: int) -> np.ndarray:
    """Vectorized [bwa: bwt.c :: bwt_occ]: count of base c in
    stored-BWT[0..k] inclusive, conceptual (sentinel-aware) index k."""
    k = k.astype(np.int64)
    n = np.where(k < 0, 0, k + 1 - (k >= idx.primary))
    n = np.maximum(n, 0)
    r = np.maximum(n - 1, 0) >> 6
    cp = idx.occ_cp[r, c].astype(np.int64)
    m = n - r * 64
    w = idx.bwt_words[(r * 4)[:, None] + np.arange(4)]          # (N, 4)
    pat = np.uint32(c * 0x55555555)
    x = w ^ pat
    neq = (x | (x >> np.uint32(1))) & np.uint32(0x55555555)
    eq = neq ^ np.uint32(0x55555555)
    valid = np.clip(m[:, None] - np.arange(4) * 16, 0, 16)
    sh = np.where(valid >= 16, 0, 2 * valid).astype(np.uint32)
    mask = np.where(valid >= 16, np.uint32(0xFFFFFFFF),
                    (np.uint32(1) << sh) - np.uint32(1))
    return cp + _popcount32_np(eq & mask).sum(axis=1)


def _invpsi_vec(idx: FMIndex, k: np.ndarray) -> np.ndarray:
    """Vectorized [bwa: bwt.c :: bwt_invPsi] (LF step on conceptual rank)."""
    x = k - (k > idx.primary)
    word = idx.bwt_words[x >> 4]
    c = ((word >> (2 * (x & 15)).astype(np.uint32)) & np.uint32(3)).astype(
        np.int64)
    # occ of c in stored-BWT[0..x] inclusive (x is a stored index already)
    r = x >> 6
    cp = idx.occ_cp[r, c].astype(np.int64)
    m = (x & 63) + 1
    w = idx.bwt_words[(r * 4)[:, None] + np.arange(4)]
    pat = (c.astype(np.uint32) * np.uint32(0x55555555))[:, None]
    y = w ^ pat
    neq = (y | (y >> np.uint32(1))) & np.uint32(0x55555555)
    eq = neq ^ np.uint32(0x55555555)
    valid = np.clip(m[:, None] - np.arange(4) * 16, 0, 16)
    sh = np.where(valid >= 16, 0, 2 * valid).astype(np.uint32)
    mask = np.where(valid >= 16, np.uint32(0xFFFFFFFF),
                    (np.uint32(1) << sh) - np.uint32(1))
    cnt = _popcount32_np(eq & mask).sum(axis=1)
    res = idx.L2[c] + cp + cnt
    return np.where(k == idx.primary, 0, res)


def default_k0(idx: FMIndex, min_seed_len: int) -> int:
    """Table depth: ~log4 of the text so the average surviving interval is
    O(1), capped by memory (12 -> 256 MB) and by min_seed_len (exactness)."""
    text_len = max(2 * idx.l_pac, 4)
    by_genome = int(np.ceil(np.log(text_len) / np.log(4.0)))
    return max(1, min(12, min_seed_len, by_genome + 1))


def build_kmer_lut_arrays(idx: FMIndex, k0: int):
    """(K, S, P) int32 arrays of size 4^k0: backward-search interval
    (k, s) of every k0-mer (code: leftmost base = highest digit), and for
    unique k-mers (s == 1) the resolved text position P (else -1)."""
    L2 = idx.L2.astype(np.int64)
    K = (L2[:4] + 1).astype(np.int64)
    S = (L2[1:5] - L2[:4]).astype(np.int64)
    for m in range(2, k0 + 1):
        n_prev = 4 ** (m - 1)
        Kn = np.empty(4 * n_prev, np.int64)
        Sn = np.empty(4 * n_prev, np.int64)
        alive = S > 0
        kq = np.where(alive, K, 1)
        sq = np.where(alive, S, 1)
        for c in range(4):
            lo = _occ1_vec(idx, kq - 1, c)
            hi = _occ1_vec(idx, kq - 1 + sq, c)
            s2 = hi - lo
            Kn[c * n_prev:(c + 1) * n_prev] = np.where(alive, L2[c] + 1 + lo, 0)
            Sn[c * n_prev:(c + 1) * n_prev] = np.where(
                alive & (s2 > 0), s2, 0)
        K, S = Kn, Sn

    # resolve unique entries' positions: batched bwt_sa walk
    P = np.full(K.shape[0], -1, np.int64)
    u = np.flatnonzero(S == 1)
    if u.size:
        kk = K[u].copy()
        steps = np.zeros(u.size, np.int64)
        intv = idx.sa_intv
        live = (kk % intv) != 0
        while live.any():
            kk[live] = _invpsi_vec(idx, kk[live])
            steps[live] += 1
            live = live & ((kk % intv) != 0)
        P[u] = steps + idx.sa_samples[kk // intv]
    dt = np.int32 if 2 * idx.l_pac < 2**31 else np.int64
    return K.astype(dt), S.astype(dt), P.astype(dt)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class KmerLUT:
    """k-mer jump table. Rows are packed to 8 bytes — the table is the
    biggest random-gather target in seeding, and gather throughput drops
    with table footprint: field0 = text position when s == 1 (k is then
    never needed: the occurrence is known), else the interval rank k."""
    k0: int                    # static
    ksp: jnp.ndarray           # pos_dtype[4^k0, 2]: (pos-if-s==1-else-k, s)

    def tree_flatten(self):
        return ((self.ksp,), (self.k0,))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], children[0])

    @staticmethod
    def build(idx: FMIndex, k0: int | None = None,
              min_seed_len: int = 19,
              cache: str | Path | None = None) -> "KmerLUT":
        if k0 is None:
            k0 = default_k0(idx, min_seed_len)
        # index identity: a stale cache built from a DIFFERENT genome at the
        # same path would silently return wrong intervals — fingerprint by
        # l_pac, primary and a strided occ-table checksum
        stride = max(1, idx.occ_cp.shape[0] // 1024)
        fp = np.array([idx.l_pac, idx.primary,
                       int(idx.occ_cp[::stride].sum(dtype=np.uint64))],
                      dtype=np.int64)
        if cache is not None:
            cache = Path(cache)
            if cache.exists():
                z = np.load(str(cache))
                if (int(z["k0"]) == k0 and z["ksp"].shape[1] == 2
                        and "fp" in z and np.array_equal(z["fp"], fp)):
                    return KmerLUT(k0, jnp.asarray(z["ksp"]))
        K, S, P = build_kmer_lut_arrays(idx, k0)
        ksp = np.stack([np.where(S == 1, P, K), S], axis=1)
        if cache is not None:
            np.savez(str(cache), k0=k0, ksp=ksp, fp=fp)
        return KmerLUT(k0, jnp.asarray(ksp))


# --------------------------------------------------------------------------
# device walk
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class LutSeedConfig:
    max_smems: int = 32      # per read, after both rounds
    max_reseed: int = 3      # round-2 candidates per read
    min_seed_len: int = 19
    split_len: int = 28
    split_width: int = 10
    # dense-domain budgets (per-offset gather cost makes dead lanes
    # expensive; live work is compacted before the loops). Lanes/reads that
    # do not fit a budget overflow their read to the host oracle.
    fm_full: int = 3         # full-width lockstep FM steps before compacting
    fm_dense: int = 32       # FM-loop survivor lanes: B*L // fm_dense
    offdiag_dense: int = 8   # off-diagonal fallback lanes: B*L // offdiag_dense
    r2_rows: int = 2         # round-2 candidate reads: B // r2_rows


def _kmer_codes(seqs: jnp.ndarray, lens: jnp.ndarray, k0: int,
                min_len: int):
    """Per end j (lane jj = j-1): code of read[j-k0, j) with the leftmost
    base as the highest base-4 digit; valid iff the window is in-read and
    N-free. k0 static shifts, no gathers.

    Ends j < min_len are excluded: they can never emit (length < min_len),
    and the only consumer of their b(j) is end j-1's maximality test,
    which is exact for any placeholder > j-1-min_len (we store b=j).

    Implemented as ONE MXU matmul against a banded weight matrix:
    shifted-concat formulations relayout the 128-lane minor dimension k0
    times (~4 ms each on v5e, ~45 ms total), and channel-1 convs lower
    pathologically.  Exact in f32 because codes < 4^k0 <= 4^12 < 2^24.
    Lanes jj < k0-1 (incomplete windows) are masked invalid, so no left
    padding is needed."""
    B, L = seqs.shape
    assert k0 <= 12, "f32 matmul codes require 4^k0 < 2^24"
    p = np.arange(L)[:, None]
    q = np.arange(L)[None, :]
    d = q - p                                    # weight 4^d for d in [0,k0)
    Wc = np.where((d >= 0) & (d < k0),
                  4.0 ** np.clip(d, 0, k0 - 1), 0.0).astype(np.float32)
    Wn = ((d >= 0) & (d < k0)).astype(np.float32)
    lhs_c = jnp.where(seqs > 3, 0, seqs).astype(jnp.float32)
    lhs_n = (seqs > 3).astype(jnp.float32)
    # Precision.HIGHEST: the TPU MXU default truncates f32 inputs to bf16,
    # which destroys exactness of the integer codes
    mm = lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)
    code = jnp.round(mm(lhs_c, jnp.asarray(Wc))).astype(jnp.int32)
    bad = mm(lhs_n, jnp.asarray(Wn)) > 0.5
    jj = jnp.arange(L, dtype=jnp.int32)[None, :]
    valid = (jj >= max(k0, min_len) - 1) & (jj + 1 <= lens[:, None]) & ~bad
    return code, valid


def _compact_rows(mask_b: jnp.ndarray, Dr: int):
    """Compact rows with mask into Dr dense slots.

    Returns (srcrow (Dr,), rpos (B,), room (B,), dense_valid (Dr,)):
    dense row r maps to read srcrow[r]; read b (if room) maps to dense row
    rpos[b]. One O(B) scatter."""
    B = mask_b.shape[0]
    rpos = jnp.cumsum(mask_b.astype(jnp.int32)) - 1
    room = mask_b & (rpos < Dr)
    dest = jnp.where(room, rpos, Dr)
    srcrow = jnp.zeros((Dr + 1,), jnp.int32).at[dest].set(
        jnp.arange(B, dtype=jnp.int32), mode="drop")[:Dr]
    n = jnp.minimum(rpos[-1] + 1, Dr) if B else jnp.int32(0)
    dense_valid = jnp.arange(Dr, dtype=jnp.int32) < n
    return srcrow, rpos, room, dense_valid


def _walk_lut(didx: DeviceIndex, lut: KmerLUT, seqs: jnp.ndarray,
              lens: jnp.ndarray, v: jnp.ndarray, shortcut: bool,
              cfg: LutSeedConfig, codes=None, lane_min=None,
              _stop_after: str = ""):
    """Per-end walk from the k0-mer start.  seqs (B, L) int32, v (B,).

    Returns (bstart, k, s, pos) each (B, L+1) indexed by end j (entry 0
    unused; pos >= 0 only for s==1-resolved lanes) and overflow (B,) —
    reads that exceeded a dense budget or whose text comparison hit the
    strand boundary (realigned by the host oracle).

    Structure (per-offset gather cost dominates, so every phase runs on a
    compacted live set):
      LUT start -> dense-lane FM loop (only s>=2 lanes) -> batched SA walk
      for lanes that became unique mid-loop -> per-READ diagonal text
      comparison (one genome window per read finishes ALL its unique
      lanes) -> row-compacted per-lane fallback for off-diagonal lanes.
    """
    def _stopped(stage, *arrs):
        # debug-only partial-pipeline exit (perf bisection)
        B, L = seqs.shape
        z = jnp.zeros((B, L + 1), jnp.int32)
        out = [z, z, z, z, jnp.zeros((B,), bool), jnp.int32(0)]
        for i, a in enumerate(arrs):
            out[i] = a
        return tuple(out)
    B, L = seqs.shape
    k0 = lut.k0
    l_pac = didx.l_pac
    j = jnp.arange(1, L + 1, dtype=jnp.int32)[None, :]
    jj = jnp.arange(L, dtype=jnp.int32)[None, :]

    if codes is not None and len(codes) == 3:
        valid, f0, sl = codes          # pre-gathered LUT rows (round 2)
    else:
        code, valid = (codes if codes is not None
                       else _kmer_codes(seqs, lens, k0, cfg.min_seed_len))
        row = lut.ksp[jnp.clip(code, 0, lut.ksp.shape[0] - 1)]  # (B, L, 2)
        f0, sl = row[..., 0], row[..., 1]
    if lane_min is not None:
        # round-2 re-seeding emits only SMEMs covering mid (b <= mid < j),
        # so ends j <= mid never emit and never feed a needed maximality
        # test — drop their lanes entirely
        valid = valid & (j > lane_min[:, None])
    kl = jnp.where(sl == 1, 0, f0)     # rank (unused when unique)
    pl = jnp.where(sl == 1, f0, -1)    # position (unique entries only)
    okv = valid & (sl >= v[:, None]) & (sl > 0)
    bpos = jnp.where(okv, j - k0, j)
    k = jnp.where(okv, kl, 0)
    s = jnp.where(okv, sl, 0)

    if shortcut:
        v1 = (v == 1)[:, None]
        sa_now = okv & (s == 1) & v1
        pos1 = jnp.where(sa_now, pl, -1)
    else:
        sa_now = jnp.zeros((B, L), bool)
        pos1 = jnp.full((B, L), -1, jnp.int32)
    fm = okv & ~sa_now & (bpos > 0)
    overflow = jnp.zeros((B,), bool)
    sa_mid = jnp.zeros((B, L), bool)     # became unique mid-walk
    v_b = v[:, None]
    v1_b = v_b == 1
    if _stop_after == "lut":
        return _stopped("lut", jnp.pad(bpos, ((0, 0), (1, 0))),
                        jnp.pad(k, ((0, 0), (1, 0))))

    # ---- FM stage 1: a few full-width lockstep steps. Live lanes all
    # start together and stop forever on failure, so at step t the next
    # base is a STATIC diagonal slice of seqs — no gathers except occ.
    padded = jnp.concatenate(
        [jnp.full((B, L), 4, jnp.int32), seqs.astype(jnp.int32)], axis=1)
    it = jnp.int32(0)
    # clamp: for batches narrower than k0 + fm_full the diagonal slice
    # start L - k0 - t would wrap negative (wrong width, trace error)
    for t in range(max(0, min(cfg.fm_full, L - k0))):
        c = padded[:, L - k0 - t: 2 * L - k0 - t]
        can = fm & (c < 4)
        k2, s2 = backward_ext(didx, jnp.where(can, k, 1),
                              jnp.where(can, s, 1), jnp.where(can, c, 0))
        good = can & (s2 >= v_b)
        k = jnp.where(good, k2, k)
        s = jnp.where(good, s2, s)
        bpos = jnp.where(good, bpos - 1, bpos)
        if shortcut:
            new_sa = good & (s2 == 1) & v1_b
            sa_mid = sa_mid | new_sa
        else:
            new_sa = jnp.zeros_like(good)
        fm = good & ~new_sa & (bpos > 0)

    if _stop_after == "fm1":
        return _stopped("fm1", jnp.pad(bpos, ((0, 0), (1, 0))),
                        jnp.pad(k, ((0, 0), (1, 0))),
                        jnp.pad(s, ((0, 0), (1, 0))))

    # ---- FM stage 2: compact the (few) survivors and loop to completion
    BL = B * L
    D = max(BL // cfg.fm_dense, 256)
    fm_f = fm.reshape(-1)
    cs = jnp.cumsum(fm_f.astype(jnp.int32))
    dpos = cs - 1                                     # dense slot per lane
    overflow |= (fm & (dpos.reshape(B, L) >= D)).any(axis=1)
    src = jnp.searchsorted(cs, jnp.arange(1, D + 1, dtype=jnp.int32)) \
        .astype(jnp.int32)
    srcc = jnp.clip(src, 0, BL - 1)
    dvalid = jnp.arange(D, dtype=jnp.int32) < cs[-1]
    kd = k.reshape(-1)[srcc]
    sd = s.reshape(-1)[srcc]
    bd = bpos.reshape(-1)[srcc]
    b_of = srcc // L
    vd = v[b_of]
    v1d = vd == 1
    seqs_f = seqs.reshape(-1).astype(jnp.int32)

    def fm_body(st):
        t, kd, sd, bd, live, sad = st
        i = bd - 1
        c = seqs_f[jnp.clip(b_of * L + i, 0, BL - 1)]
        can = live & (c < 4) & (i >= 0)
        k2, s2 = backward_ext(didx, jnp.where(can, kd, 1),
                              jnp.where(can, sd, 1),
                              jnp.where(can, c, 0))
        good = can & (s2 >= vd)
        kd = jnp.where(good, k2, kd)
        sd = jnp.where(good, s2, sd)
        bd = jnp.where(good, bd - 1, bd)
        if shortcut:
            new_sa = good & (s2 == 1) & v1d
            sad = sad | new_sa
        else:
            new_sa = jnp.zeros_like(good)
        live = good & ~new_sa & (bd > 0)
        return t + 1, kd, sd, bd, live, sad

    # 2 FM steps per iteration: fm_body freezes dead lanes, so body∘body
    # is exact and halves the dispatch-bound loop overhead
    it, kd, sd, bd, _, sad = jax.lax.while_loop(
        lambda st: jnp.any(st[4]) & (st[0] < L),
        lambda st: fm_body(fm_body(st)),
        (jnp.int32(0), kd, sd, bd, dvalid & fm_f[srcc], jnp.zeros((D,), bool)))

    # write back: one packed row gather (B*L, 4); bd/sad ride along in the
    # rank dtype and are cast back after the gather
    packed = jnp.stack([kd, sd, bd.astype(kd.dtype),
                        sad.astype(kd.dtype)], axis=1)
    back = packed[jnp.clip(dpos, 0, D - 1)].reshape(B, L, 4)
    took = fm & (dpos.reshape(B, L) < D)
    k = jnp.where(took, back[..., 0], k)
    s = jnp.where(took, back[..., 1], s)
    bpos = jnp.where(took, back[..., 2].astype(jnp.int32), bpos)
    if _stop_after == "fm2":
        return _stopped("fm2", jnp.pad(bpos, ((0, 0), (1, 0))),
                        jnp.pad(k, ((0, 0), (1, 0))),
                        jnp.pad(s, ((0, 0), (1, 0))))
    if shortcut:
        # mid-walk unique lanes carry a rank but NOT a position; most are
        # finished by the diagonal comparison below without any SA walk
        sa_mid = sa_mid | (took & (back[..., 3] > 0))
        sa_all = sa_now | sa_mid

        # ---- per-READ diagonal text comparison: one genome window per
        # read + a cummax over the mismatch mask finishes every unique
        # lane whose occurrence lies on the read's reference diagonal.
        # The reference diagonal comes from a position-known (LUT-unique)
        # lane; reads with none resolve ONE lane by a (B,)-sized SA walk.
        first_k = jnp.min(jnp.where(sa_now, jj, L), axis=1)
        has_k = first_k < L
        oh_k = sa_now & (jj == first_k[:, None])
        diag_known = jnp.sum(jnp.where(oh_k, pos1 - bpos, 0), axis=1,
                             dtype=pos1.dtype)
        first_m = jnp.min(jnp.where(sa_mid, jj, L), axis=1)
        has_m = (first_m < L) & ~has_k
        oh_m = sa_mid & (jj == first_m[:, None])
        k_first = jnp.sum(jnp.where(oh_m, k, 0), axis=1, dtype=k.dtype)
        b_first = jnp.sum(jnp.where(oh_m, bpos, 0), axis=1, dtype=bpos.dtype)
        pos_first = sa_lookup(didx, jnp.where(has_m, k_first, 1), has_m)
        ref_diag = jnp.where(has_k, diag_known, pos_first - b_first)
        has_sa = has_k | has_m
        floor = jnp.where(ref_diag >= l_pac, l_pac, 0)
        ceil = jnp.where(ref_diag >= l_pac, 2 * l_pac, l_pac)
        diag_ok = has_sa & (ref_diag >= floor) & \
            (ref_diag + lens <= ceil)
        tw = text_window_asc(didx, jnp.clip(ref_diag, 0, 2 * l_pac - 1), L)
        mism = (seqs != tw) | (seqs > 3) | (jj >= lens[:, None])
        lastm = jax.lax.associative_scan(
            jnp.maximum, jnp.where(mism, jj, -1), axis=1)        # (B, L)
        b_diag = lastm + 1
        # a lane is on-diagonal if its known position says so, or (rank-
        # only lanes) if its matched segment [bpos, j) matches the diagonal
        # — then the s==1 occurrence IS the diagonal one, exactly
        ondiag = diag_ok[:, None] & (
            (sa_now & (pos1 - bpos == ref_diag[:, None]))
            | (sa_mid & (b_diag <= bpos)))
        offdiag = sa_all & ~ondiag
        bpos = jnp.where(ondiag, b_diag, bpos)
        pos1 = jnp.where(ondiag, ref_diag[:, None] + b_diag, pos1)
        if _stop_after == "diag":
            return _stopped("diag", jnp.pad(bpos, ((0, 0), (1, 0))),
                            jnp.pad(k, ((0, 0), (1, 0))),
                            jnp.pad(s, ((0, 0), (1, 0))),
                            jnp.pad(pos1, ((0, 0), (1, 0))))

        # ---- off-diagonal fallback: per-lane SA resolve + window compare
        # on a dense lane set (off-diagonal lanes are a few % of B*L —
        # error-aliased k-mers with a random unique hit elsewhere)
        off_f = offdiag.reshape(-1)
        cs3 = jnp.cumsum(off_f.astype(jnp.int32))
        D3 = max(BL // cfg.offdiag_dense, 256)
        dpos3 = cs3 - 1
        overflow |= (offdiag & (dpos3.reshape(B, L) >= D3)).any(axis=1)
        src3 = jnp.searchsorted(
            cs3, jnp.arange(1, D3 + 1, dtype=jnp.int32)).astype(jnp.int32)
        src3c = jnp.clip(src3, 0, BL - 1)
        live3 = jnp.arange(D3, dtype=jnp.int32) < cs3[-1]
        b_of3 = src3c // L
        bp3 = jnp.where(live3, bpos.reshape(-1)[src3c], 0)
        p3 = jnp.where(live3, pos1.reshape(-1)[src3c], 1)
        need3 = live3 & (p3 < 0)       # rank-only lanes: resolve here
        k3 = jnp.where(need3, k.reshape(-1)[src3c], 1)
        p3 = jnp.where(need3, sa_lookup(didx, k3, need3), p3)
        revq = seqs[:, ::-1].astype(jnp.int8)
        rows3 = revq[b_of3]                                      # (D3, L)
        qw = _shift_rows(rows3, L - bp3, L)
        tw2 = text_window_desc(didx, jnp.clip(p3, 1, 2 * l_pac),
                               L).astype(jnp.int8)
        tcap = jnp.where(p3 >= l_pac, p3 - l_pac, p3)
        eq = (qw == tw2) & (qw >= 0) & (qw <= 3)
        e_raw = jnp.cumprod(eq.astype(jnp.int8), axis=1).sum(
            axis=1, dtype=jnp.int32)
        e3 = jnp.minimum(jnp.minimum(e_raw, bp3), tcap).astype(jnp.int32)
        e3 = jnp.where(live3, e3, 0)
        crossed3 = live3 & (tcap < bp3) & (e_raw >= tcap)
        packed3 = jnp.stack([e3.astype(p3.dtype),
                             crossed3.astype(p3.dtype), p3], axis=1)
        back3 = packed3[jnp.clip(dpos3, 0, D3 - 1)].reshape(B, L, 3)
        took3 = offdiag & (dpos3.reshape(B, L) < D3)
        e3b = back3[..., 0].astype(jnp.int32)
        bpos = jnp.where(took3, bpos - e3b, bpos)
        pos1 = jnp.where(took3, back3[..., 2] - e3b, pos1)
        overflow |= (took3 & (back3[..., 1] > 0)).any(axis=1)

        sa_now = sa_all
        s = jnp.where(sa_now, 1, s)
        k = jnp.where(sa_now, -1, k)

    cat = lambda a: jnp.concatenate(
        [jnp.zeros((B, 1), a.dtype), a], axis=1)
    return cat(bpos.astype(jnp.int32)), cat(k), cat(s), \
        cat(pos1 if shortcut else jnp.full((B, L), -1, k.dtype)), \
        overflow, it


def _shift_rows(rows: jnp.ndarray, sh: jnp.ndarray, W: int) -> jnp.ndarray:
    """out[r, i] = rows[r, sh[r] + i] (binary-decomposed shifts, fill 4)."""
    R, NB = rows.shape
    out = rows
    bit = 1
    fill = jnp.asarray(4, rows.dtype)
    while bit < NB:
        shifted = jnp.concatenate(
            [out[:, bit:], jnp.full((R, bit), fill, rows.dtype)], axis=1)
        out = jnp.where(((sh & bit) != 0)[:, None], shifted, out)
        bit <<= 1
    return out[:, :W]


def _split64(a):
    """int64 -> (hi, lo) int32 halves with hi*2**30 + lo == a exactly
    (arithmetic >> keeps the identity for negatives too). Lets 64-bit
    position fields ride the int32 MXU one-hot contractions."""
    return (a >> 30).astype(jnp.int32), \
        (a & ((1 << 30) - 1)).astype(jnp.int32)


def _join64(hi, lo):
    return hi.astype(jnp.int64) * (1 << 30) + lo.astype(jnp.int64)


def _compact_sorted(mask, key, arrays, max_out):
    """Compact masked lanes (already in emission = end-j order) into the
    first slots. One (B, M, L) one-hot contraction on the MXU — an argsort
    here costs ~5-10 ms per round on v5e; `key` is unused (kept for call
    -site clarity: lanes arrive sorted by it). int64 position fields are
    split into int32 (hi, lo) halves around the contraction (exact: the
    one-hot dot selects exactly one element per output slot).

    Returns compacted arrays (B, max_out) in their input dtypes, count,
    overflow.
    """
    del key
    B, L = mask.shape
    pos = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1
    count = mask.sum(axis=1, dtype=jnp.int32)
    overflow = count > max_out
    sel = mask & (pos < max_out)
    oh = ((pos[:, None, :] == jnp.arange(max_out, dtype=jnp.int32)
           [None, :, None]) & sel[:, None, :]).astype(jnp.int32)  # (B,M,L)
    parts, widths = [], []
    for a in arrays:
        if a.dtype == jnp.int64:
            hi, lo = _split64(a)
            parts += [hi, lo]
            widths.append(2)
        else:
            parts.append(a.astype(jnp.int32))
            widths.append(1)
    stacked = jnp.stack(parts, axis=-1)                           # (B,L,F')
    taken = jax.lax.dot_general(
        oh, stacked, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)                         # (B,M,F')
    n = jnp.minimum(count, max_out)
    slot_ok = jnp.arange(max_out, dtype=jnp.int32)[None, :] < n[:, None]
    outs, f = [], 0
    for a, w in zip(arrays, widths):
        if w == 2:
            v = _join64(taken[..., f], taken[..., f + 1])
        else:
            v = taken[..., f]
        outs.append(jnp.where(slot_ok, v, 0).astype(a.dtype))
        f += w
    return outs, n, overflow


@partial(jax.jit, static_argnums=(4,))
def collect_smems_lut(didx: DeviceIndex, lut: KmerLUT, seqs: jnp.ndarray,
                      lens: jnp.ndarray, cfg: LutSeedConfig):
    """Both seeding rounds [bwa: bwamem.c :: mem_collect_intv].

    Returns dict with (B, max_smems) arrays qb, qe, k, s, pos; n (B,);
    overflow (B,).  pos >= 0 marks s==1 SMEMs whose text position is
    already resolved (k is -1 there); downstream seed resolution uses pos
    directly and walks the SA only for s >= 2 entries.
    Row order matches oracle.Oracle.smems() (sorted by (qb, qe), stable).
    """
    seqs = seqs.astype(jnp.int32)
    lens = lens.astype(jnp.int32)
    B, L = seqs.shape
    M = cfg.max_smems
    ones = jnp.ones((B,), jnp.int32)
    j_idx = jnp.broadcast_to(jnp.arange(1, L + 1, dtype=jnp.int32)[None, :],
                             (B, L))

    # ---- round 1 (the LUT rows are gathered ONCE and reused by every
    # round-2 walk — the jump table is the largest random-gather target)
    code, cvalid = _kmer_codes(seqs, lens, lut.k0, cfg.min_seed_len)
    lrow = lut.ksp[jnp.clip(code, 0, lut.ksp.shape[0] - 1)]
    lrows = (cvalid, lrow[..., 0], lrow[..., 1])
    b1, k1, s1, p1, ovf_w, _ = _walk_lut(didx, lut, seqs, lens, ones, True,
                                         cfg, lrows)
    m1 = _emit_mask(b1, lens, cfg.min_seed_len)
    (qb1, qe1, kk1, ss1, pp1), n1, ovf1 = _compact_sorted(
        m1, j_idx, [b1[:, 1:], j_idx, k1[:, 1:], s1[:, 1:], p1[:, 1:]], M)
    # round-1 compaction is in end (j) order — the order the oracle visits
    # candidates for round-2 re-seeding

    # ---- round 2: long low-occ round-1 SMEMs re-seeded from the midpoint.
    # Candidate reads are a small minority, so each round-2 walk runs on a
    # row-compacted sub-batch (budget B // r2_rows).
    slot_valid = jnp.arange(M)[None, :] < n1[:, None]
    cand = slot_valid & ((qe1 - qb1) >= cfg.split_len) & \
        (ss1 <= cfg.split_width)
    cand_rank = jnp.cumsum(cand.astype(jnp.int32), axis=1) - 1
    n_cand = cand.sum(axis=1, dtype=jnp.int32)
    ovf_cand = n_cand > cfg.max_reseed

    all_qb, all_qe, all_k, all_s, all_p = ([qb1], [qe1], [kk1], [ss1], [pp1])
    all_n = [n1]
    overflow = ovf1 | ovf_cand | ovf_w
    for r in range(cfg.max_reseed):
        sel = cand & (cand_rank == r)
        has = sel.any(axis=1)
        mid = jnp.where(
            has, ((qb1 + qe1) >> 1).max(axis=1, initial=0, where=sel), 0)
        v_r = jnp.where(has, ss1.max(axis=1, initial=0, where=sel) + 1,
                        jnp.asarray(jnp.iinfo(ss1.dtype).max // 2,
                                    ss1.dtype))
        # nearly every read has ONE candidate (any long unique SMEM
        # qualifies), so r=0 runs full-width; later candidates are rare
        # and run on a row-compacted sub-batch
        # candidate #1: nearly every read; #2: ~1/4 of reads; #3+: rare
        Dr = B if r == 0 else max(B // (cfg.r2_rows * (4 ** (r - 1))), 8)
        if r == 0:
            srcrow = jnp.arange(B, dtype=jnp.int32)
            rpos = srcrow
            room = jnp.ones((B,), bool)
            dv = jnp.ones((Dr,), bool)
        else:
            srcrow, rpos, room, dv = _compact_rows(has, Dr)
            overflow |= has & ~room
        j_idx_d = jnp.broadcast_to(
            jnp.arange(1, L + 1, dtype=jnp.int32)[None, :], (Dr, L))
        codes_r = (lrows if r == 0
                   else tuple(a[srcrow] for a in lrows))
        b2, k2, s2, p2, ovf2w, _ = _walk_lut(
            didx, lut, seqs[srcrow], lens[srcrow], v_r[srcrow], False, cfg,
            codes_r, lane_min=mid[srcrow])
        m2 = _emit_mask(b2, lens[srcrow], cfg.min_seed_len,
                        cover_mid=mid[srcrow])
        m2 &= dv[:, None] & has[srcrow][:, None]
        (qb2d, qe2d, kk2d, ss2d, pp2d), n2d, ovf2d = _compact_sorted(
            m2, j_idx_d, [b2[:, 1:], j_idx_d, k2[:, 1:], s2[:, 1:],
                          p2[:, 1:]], M)
        rp = jnp.clip(rpos, 0, Dr - 1)
        ok = has & room
        exp = lambda d, fill=0: jnp.where(ok[:, None], d[rp],
                                          jnp.full((B, M), fill, d.dtype))
        all_qb.append(exp(qb2d))
        all_qe.append(exp(qe2d))
        all_k.append(exp(kk2d))
        all_s.append(exp(ss2d))
        all_p.append(exp(pp2d, -1))
        all_n.append(jnp.where(ok, n2d[rp], 0))
        overflow |= jnp.where(ok, (ovf2d | ovf2w)[rp], False)

    qb = jnp.concatenate(all_qb, axis=1)
    qe = jnp.concatenate(all_qe, axis=1)
    kk = jnp.concatenate(all_k, axis=1)
    ss = jnp.concatenate(all_s, axis=1)
    pp = jnp.concatenate(all_p, axis=1)
    msk = jnp.concatenate(
        [jnp.arange(M)[None, :] < n[:, None] for n in all_n], axis=1)

    # final stable sort by (qb, qe) with round order as tiebreak — matches
    # the oracle's ordering (fits int32: L <= 2^14)
    key = jnp.where(msk, qb * (L + 2) + qe, jnp.int32(BIG))
    order = jnp.argsort(key, axis=1, stable=True)[:, :M].astype(jnp.int32)
    take = lambda a: jnp.take_along_axis(a, order, axis=1)
    n_total = msk.sum(axis=1, dtype=jnp.int32)
    overflow = overflow | (n_total > M)
    n_out = jnp.minimum(n_total, M)
    return dict(
        qb=take(qb), qe=take(qe), k=take(kk), s=take(ss), pos=take(pp),
        n=n_out, overflow=overflow,
    )
