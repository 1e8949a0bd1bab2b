"""Batched local alignment (ksw_align: mate-rescue SW) == scalar oracle.

Covers the JAX reference (extend/jax_extend.ksw_local_batch), the Pallas
kernel in interpret mode (ops/sw_pallas.ksw_local_pallas), and the combined
forward+start-extraction wrapper (pair/rescue.ksw_align_batch) against
native/ksw.cpp :: ksw_align [bwa: ksw.c :: ksw_align2 XSTART|XSUBO].
"""
import numpy as np
import pytest
import jax.numpy as jnp

from tpubwa.opts import MemOptions
from tpubwa.oracle import ksw_align_local
from tpubwa.extend.jax_extend import ksw_local_batch
from tpubwa.ops.sw_pallas import ksw_local_pallas
from tpubwa.pair.rescue import ksw_align_batch, _scmat_tuple

OPT = MemOptions()
KEYS = ("score", "tb", "te", "qb", "qe", "score2", "te2")


def gen_tasks(seed, n=48, maxq=100, maxt=320):
    """Mix of random, planted (with errors), duplicated (subopt hits), and
    N-containing tasks — the score2 run-splitting quirk needs repeats."""
    rng = np.random.default_rng(seed)
    qs = np.full((n, maxq), 4, np.uint8)
    ts = np.full((n, maxt), 4, np.uint8)
    qlen = rng.integers(5, maxq + 1, n).astype(np.int32)
    tlen = rng.integers(10, maxt + 1, n).astype(np.int32)
    for i in range(n):
        t = rng.integers(0, 4, tlen[i]).astype(np.uint8)
        q = rng.integers(0, 4, qlen[i]).astype(np.uint8)
        if i % 3 == 0 and tlen[i] > qlen[i]:
            off = rng.integers(0, tlen[i] - qlen[i] + 1)
            q = t[off:off + qlen[i]].copy()
            nerr = rng.integers(0, 6)
            pos = rng.integers(0, qlen[i], nerr)
            q[pos] = (q[pos] + rng.integers(1, 4, nerr)) % 4
        if i % 5 == 0 and tlen[i] > 2 * qlen[i]:
            off2 = rng.integers(qlen[i], tlen[i] - qlen[i] + 1)
            t[off2:off2 + qlen[i]] = q % 4
        if i % 7 == 0:
            q[rng.integers(0, qlen[i], 2)] = 4
        qs[i, :qlen[i]] = q
        ts[i, :tlen[i]] = t
    return qs, qlen, ts, tlen


def oracle_rows(qs, qlen, ts, tlen, minsc):
    return np.array([
        [ksw_align_local(qs[i, :qlen[i]], ts[i, :tlen[i]], OPT,
                         int(minsc[i]))[k] for k in KEYS]
        for i in range(len(qlen))])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ksw_align_batch_matches_oracle(seed):
    qs, qlen, ts, tlen = gen_tasks(seed)
    minsc = np.full(len(qlen), OPT.min_seed_len * OPT.a, np.int32)
    got = np.asarray(ksw_align_batch(
        jnp.asarray(qs), jnp.asarray(qlen), jnp.asarray(ts),
        jnp.asarray(tlen), jnp.asarray(minsc),
        jnp.ones(len(qlen), bool)))
    want = oracle_rows(qs, qlen, ts, tlen, minsc)
    np.testing.assert_array_equal(got, want)


def test_local_pallas_interpret_matches_reference():
    qs, qlen, ts, tlen = gen_tasks(3, n=24, maxt=256)
    minsc = np.full(len(qlen), 19, np.int32)
    valid = jnp.ones(len(qlen), bool)
    ref = ksw_local_batch(
        jnp.asarray(qs, jnp.int32), jnp.asarray(qlen),
        jnp.asarray(ts, jnp.int32), jnp.asarray(tlen), valid,
        jnp.asarray(minsc), _scmat_tuple(OPT.a, OPT.b),
        OPT.o_del, OPT.e_del, OPT.o_ins, OPT.e_ins, True)
    pal = ksw_local_pallas(
        jnp.asarray(qs, jnp.int32), jnp.asarray(qlen),
        jnp.asarray(ts, jnp.int32), jnp.asarray(tlen),
        jnp.asarray(minsc), valid, OPT.o_del, OPT.e_del, OPT.o_ins,
        OPT.e_ins, OPT.a, OPT.b, want_sub=True, interpret=True)
    got = np.stack([np.asarray(r) for r in ref], axis=1)
    np.testing.assert_array_equal(np.asarray(pal), got)


def test_invalid_and_empty_tasks():
    qs = np.full((4, 16), 0, np.uint8)
    ts = np.full((4, 32), 0, np.uint8)
    qlen = np.array([8, 0, 8, 8], np.int32)
    tlen = np.array([16, 16, 0, 16], np.int32)
    valid = jnp.asarray([True, True, True, False])
    minsc = np.full(4, 19, np.int32)
    got = np.asarray(ksw_align_batch(
        jnp.asarray(qs), jnp.asarray(qlen), jnp.asarray(ts),
        jnp.asarray(tlen), jnp.asarray(minsc), valid))
    # row 0: all-A query on all-A target -> full-length hit
    w = ksw_align_local(qs[0, :8], ts[0, :16], OPT, 19)
    assert list(got[0]) == [w[k] for k in KEYS]
    # degenerate/invalid rows report no alignment
    for r in (1, 2, 3):
        assert got[r][0] <= 0
