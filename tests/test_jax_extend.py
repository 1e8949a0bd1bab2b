"""JAX ksw_extend batch kernel: exact equality vs the C++ oracle kernel."""
import numpy as np
import pytest
import jax.numpy as jnp

from tpubwa.opts import MemOptions
from tpubwa import oracle
from tpubwa.extend.jax_extend import ksw_extend_batch

OPT = MemOptions()
SCMAT = jnp.asarray(OPT.scmat.astype(np.int32))


def run_batch(tasks, w=100, end_bonus=5, zdrop=100):
    """tasks: list of (query, target, h0). Pads and runs both kernels."""
    N = len(tasks)
    Q = max(len(q) for q, _, _ in tasks)
    T = max(len(t) for _, t, _ in tasks)
    qa = np.full((N, Q), 4, np.int32)
    ta = np.full((N, T), 4, np.int32)
    ql = np.zeros(N, np.int32)
    tl = np.zeros(N, np.int32)
    h0 = np.zeros(N, np.int32)
    for i, (q, t, h) in enumerate(tasks):
        qa[i, : len(q)] = q
        ta[i, : len(t)] = t
        ql[i], tl[i], h0[i] = len(q), len(t), h
    ws = np.full(N, w, np.int32)
    eb = np.full(N, end_bonus, np.int32)
    out = ksw_extend_batch(
        jnp.asarray(qa), jnp.asarray(ql), jnp.asarray(ta), jnp.asarray(tl),
        jnp.asarray(h0), jnp.asarray(ws), jnp.asarray(eb),
        jnp.ones(N, bool), SCMAT, None,
        OPT.o_del, OPT.e_del, OPT.o_ins, OPT.e_ins, zdrop)
    dev = np.stack([np.asarray(x) for x in out], axis=1)
    ref = np.array([
        oracle.ksw_extend(q, t, OPT, w=w, end_bonus=end_bonus, h0=int(h),
                          zdrop=zdrop)
        for q, t, h in tasks])
    return dev, ref


def gen_tasks(rng, n, maxq=60, maxt=100, related_p=0.7):
    tasks = []
    for _ in range(n):
        qlen = int(rng.integers(1, maxq))
        tlen = int(rng.integers(1, maxt))
        target = rng.integers(0, 4, tlen).astype(np.int32)
        if rng.random() < related_p and tlen >= 5:
            query = target[: min(qlen, tlen)].copy()
            for _ in range(int(rng.integers(0, 4))):
                p = int(rng.integers(0, len(query)))
                query[p] = (query[p] + 1 + rng.integers(0, 3)) % 4
            if rng.random() < 0.3 and len(query) > 8:
                p = int(rng.integers(1, len(query) - 4))
                dl = int(rng.integers(1, 4))
                query = np.concatenate([query[:p], query[p + dl:]])
        else:
            query = rng.integers(0, 4, qlen).astype(np.int32)
        h0 = int(rng.integers(1, len(query) + 30))
        tasks.append((query, target, h0))
    return tasks


@pytest.mark.parametrize("seed", range(6))
def test_extend_batch_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    tasks = gen_tasks(rng, 40)
    dev, ref = run_batch(tasks)
    assert np.array_equal(dev, ref), np.argwhere(dev != ref)


def test_extend_narrow_band_and_zdrop():
    rng = np.random.default_rng(99)
    tasks = gen_tasks(rng, 30, maxq=80, maxt=160)
    dev, ref = run_batch(tasks, w=3, zdrop=10)
    assert np.array_equal(dev, ref), np.argwhere(dev != ref)


def test_extend_realistic_left_right():
    """Tasks shaped like real chain2aln calls: seed at qbeg, reversed."""
    rng = np.random.default_rng(7)
    genome = rng.integers(0, 4, 4000).astype(np.int32)
    tasks = []
    for i in range(25):
        pos = int(rng.integers(200, 3600))
        read = genome[pos : pos + 100].copy()
        for _ in range(3):
            p = int(rng.integers(0, 100))
            read[p] = (read[p] + 1) % 4
        qbeg = int(rng.integers(5, 60))
        seedlen = 19
        # left extension: reversed prefix vs reversed ref window
        qs = read[:qbeg][::-1].copy()
        rs = genome[pos - 100 : pos + qbeg][::-1].copy()
        tasks.append((qs, rs, seedlen * OPT.a))
        # right extension
        qe = qbeg + seedlen
        tasks.append((read[qe:].copy(),
                      genome[pos + qe : pos + qe + 180].copy(), 30))
    dev, ref = run_batch(tasks, w=100, end_bonus=OPT.pen_clip5)
    assert np.array_equal(dev, ref), np.argwhere(dev != ref)
