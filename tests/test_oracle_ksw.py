"""Golden checks of the native ksw kernels against independent naive DPs.

The naive references implement bwa's cell semantics (M-separated affine gaps:
E/F open from the M state only) as full unbanded matrices — an independent
transcription used to validate the banded/early-exit production kernels in
the regime where band and z-drop are inert.
"""
import numpy as np
import pytest

from tpubwa.opts import MemOptions
from tpubwa import oracle

OPT = MemOptions()


def ref_extend(query, target, opt, h0):
    """Unbanded, no-zdrop extension DP. Returns (score, H) with H the full
    (t+1, q+1) matrix so tie-broken end positions can be validated."""
    q, t = len(query), len(target)
    mat = opt.scmat.astype(np.int64)
    oe_del, oe_ins = opt.o_del + opt.e_del, opt.o_ins + opt.e_ins
    H = np.zeros((t + 1, q + 1), dtype=np.int64)
    M = np.zeros((t + 1, q + 1), dtype=np.int64)
    E = np.zeros((t + 1, q + 1), dtype=np.int64)
    F = np.zeros((t + 1, q + 1), dtype=np.int64)
    H[0, 0] = h0
    if q >= 1:
        H[0, 1] = max(h0 - oe_ins, 0)
        for j in range(2, q + 1):
            H[0, j] = H[0, j - 1] - opt.e_ins if H[0, j - 1] > opt.e_ins else 0
    for i in range(1, t + 1):
        H[i, 0] = max(h0 - (opt.o_del + opt.e_del * i), 0)
    for i in range(1, t + 1):
        for j in range(1, q + 1):
            m = H[i - 1, j - 1]
            m = m + mat[target[i - 1], query[j - 1]] if m else 0
            M[i, j] = m
            E[i, j] = max(M[i - 1, j] - oe_del, E[i - 1, j] - opt.e_del, 0)
            F[i, j] = max(M[i, j - 1] - oe_ins, F[i, j - 1] - opt.e_ins, 0)
            H[i, j] = max(m, E[i, j], F[i, j])
    return H


@pytest.mark.parametrize("trial", range(40))
def test_extend_matches_naive(trial):
    rng = np.random.default_rng(trial)
    qlen = int(rng.integers(1, 40))
    tlen = int(rng.integers(1, 60))
    target = rng.integers(0, 4, tlen).astype(np.uint8)
    related = rng.random() < 0.6 and tlen >= qlen
    if related:
        query = target[:qlen].copy()
        for _ in range(int(rng.integers(0, 4))):
            p = int(rng.integers(0, qlen))
            query[p] = (query[p] + 1) % 4
    else:
        query = rng.integers(0, 4, qlen).astype(np.uint8)
    # h0 large enough that bwa's all-zero-row early break cannot fire before
    # the naive DP agrees (see ksw_extend2's `if (mm == 0) break`)
    h0 = int(rng.integers(15, 45))
    score, qle, tle, gtle, gscore, _ = oracle.ksw_extend(
        query, target, OPT, w=1000, end_bonus=0, h0=h0, zdrop=10**6)
    H = ref_extend(query, target, OPT, h0)
    inner_best = int(H[1:, 1:].max()) if qlen and tlen else 0
    assert score == max(h0, inner_best)
    # reported end positions must achieve the reported score
    if score > h0:
        assert H[tle, qle] == score
    # gscore: the band is always clipped to ~qlen (max_ins rule) and shrinks
    # past dead cells, so the last query column may legitimately never be
    # visited for unrelated sequences. The banded value can never exceed the
    # unbanded one; demand equality only when the alignment rides the
    # diagonal (related case), where the path stays in band.
    ref_gscore = int(H[1:, -1].max()) if tlen else -1
    assert gscore <= max(ref_gscore, 0) or gscore == ref_gscore
    if related and tlen >= qlen and qlen >= 10:
        assert gscore == ref_gscore
        assert H[gtle, -1] == gscore


def ref_global(query, target, opt):
    """Unbanded global affine DP, gaps open from M only (bwa semantics)."""
    q, t = len(query), len(target)
    NEG = -(1 << 28)
    mat = opt.scmat.astype(np.int64)
    oe_del, oe_ins = opt.o_del + opt.e_del, opt.o_ins + opt.e_ins
    M = np.full((t + 1, q + 1), NEG, dtype=np.int64)
    E = np.full((t + 1, q + 1), NEG, dtype=np.int64)
    F = np.full((t + 1, q + 1), NEG, dtype=np.int64)
    M[0, 0] = 0
    for j in range(1, q + 1):
        F[0, j] = -(opt.o_ins + opt.e_ins * j)
    for i in range(1, t + 1):
        E[i, 0] = -(opt.o_del + opt.e_del * i)
    for i in range(1, t + 1):
        for j in range(1, q + 1):
            h_diag = max(M[i - 1, j - 1], E[i - 1, j - 1], F[i - 1, j - 1])
            M[i, j] = h_diag + mat[target[i - 1], query[j - 1]]
            E[i, j] = max(M[i - 1, j] - oe_del, E[i - 1, j] - opt.e_del)
            F[i, j] = max(M[i, j - 1] - oe_ins, F[i, j - 1] - opt.e_ins)
    return int(max(M[t, q], E[t, q], F[t, q]))


@pytest.mark.parametrize("trial", range(25))
def test_global_matches_naive(trial):
    rng = np.random.default_rng(100 + trial)
    tlen = int(rng.integers(5, 50))
    target = rng.integers(0, 4, tlen).astype(np.uint8)
    query = target.copy()
    for _ in range(int(rng.integers(0, 3))):
        p = int(rng.integers(0, len(query)))
        query[p] = (query[p] + 1 + rng.integers(0, 3)) % 4
    if rng.random() < 0.5 and len(query) > 6:
        p = int(rng.integers(1, len(query) - 3))
        query = np.concatenate([query[:p], query[p + int(rng.integers(1, 3)):]])
    score, cigar = oracle.ksw_global(query, target, OPT, w=200)
    assert score == ref_global(query, target, OPT)
    qlen_c = sum(l for l, op in cigar if op in (0, 1))
    tlen_c = sum(l for l, op in cigar if op in (0, 2))
    assert qlen_c == len(query) and tlen_c == len(target)


def test_global_exact_match():
    rng = np.random.default_rng(5)
    t = rng.integers(0, 4, 30).astype(np.uint8)
    score, cigar = oracle.ksw_global(t, t, OPT, w=10)
    assert score == 30 * OPT.a
    assert cigar == [(30, 0)]


def test_global_single_deletion():
    rng = np.random.default_rng(7)
    t = rng.integers(0, 4, 40).astype(np.uint8)
    q = np.concatenate([t[:15], t[18:]])  # 3-base deletion in query
    score, cigar = oracle.ksw_global(q, t, OPT, w=10)
    assert score == 37 * OPT.a - OPT.o_del - 3 * OPT.e_del
    assert cigar == [(15, 0), (3, 2), (22, 0)]


def test_align_local_basic():
    rng = np.random.default_rng(6)
    target = rng.integers(0, 4, 200).astype(np.uint8)
    query = target[50:130].copy()
    r = oracle.ksw_align_local(query, target, OPT, minsc=19)
    assert r["score"] == 80 * OPT.a
    assert r["tb"] == 50 and r["te"] == 129
    assert r["qb"] == 0 and r["qe"] == 79


def test_align_local_second_best():
    rng = np.random.default_rng(8)
    target = rng.integers(0, 4, 400).astype(np.uint8)
    query = target[30:80].copy()          # 50bp at pos 30
    target[300:345] = target[30:75]       # 45bp duplicate at pos 300
    r = oracle.ksw_align_local(query, target, OPT, minsc=19)
    assert r["score"] == 50
    assert r["tb"] == 30
    assert r["score2"] == 45              # the duplicate, outside the window
