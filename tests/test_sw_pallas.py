"""Pallas SW kernel (interpret mode on CPU) == JAX reference == oracle."""
import numpy as np
import pytest
import jax.numpy as jnp

from tpubwa.opts import MemOptions
from tpubwa import oracle
from tpubwa.ops.sw_pallas import ksw_extend_pallas

OPT = MemOptions()


def run_pallas(tasks, w=100, end_bonus=5, zdrop=100):
    N = len(tasks)
    Q = min(max(max(len(q) for q, _, _ in tasks), 1), 127)
    T = max(max(len(t) for _, t, _ in tasks), 1)
    qa = np.full((N, Q), 4, np.int32)
    ta = np.full((N, T), 4, np.int32)
    ql = np.zeros(N, np.int32); tl = np.zeros(N, np.int32)
    h0 = np.zeros(N, np.int32)
    for i, (q, t, h) in enumerate(tasks):
        qa[i, :len(q)] = q; ta[i, :len(t)] = t
        ql[i], tl[i], h0[i] = len(q), len(t), h
    out = ksw_extend_pallas(
        jnp.asarray(qa), jnp.asarray(ql), jnp.asarray(ta), jnp.asarray(tl),
        jnp.asarray(h0), jnp.full(N, w, jnp.int32),
        jnp.full(N, end_bonus, jnp.int32), jnp.ones(N, bool),
        OPT.o_del, OPT.e_del, OPT.o_ins, OPT.e_ins, zdrop, OPT.a, OPT.b,
        interpret=True)
    ref = np.array([
        oracle.ksw_extend(q, t, OPT, w=w, end_bonus=end_bonus, h0=int(h),
                          zdrop=zdrop) for q, t, h in tasks])
    return np.asarray(out), ref


def gen(rng, n, maxq=100, maxt=200):
    tasks = []
    for _ in range(n):
        qlen = int(rng.integers(1, maxq))
        tlen = int(rng.integers(1, maxt))
        target = rng.integers(0, 4, tlen).astype(np.int32)
        if rng.random() < 0.7 and tlen >= 5:
            query = target[: min(qlen, tlen)].copy()
            for _ in range(int(rng.integers(0, 4))):
                p = int(rng.integers(0, len(query)))
                query[p] = (query[p] + 1 + rng.integers(0, 3)) % 4
            if rng.random() < 0.3 and len(query) > 8:
                p = int(rng.integers(1, len(query) - 4))
                query = np.concatenate([query[:p],
                                        query[p + int(rng.integers(1, 4)):]])
        else:
            query = rng.integers(0, 4, qlen).astype(np.int32)
        tasks.append((query, target, int(rng.integers(1, len(query) + 30))))
    return tasks


@pytest.mark.parametrize("seed", range(3))
def test_pallas_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    dev, ref = run_pallas(gen(rng, 24))
    assert np.array_equal(dev, ref), np.argwhere(dev != ref)


def test_pallas_narrow_band_zdrop():
    rng = np.random.default_rng(42)
    dev, ref = run_pallas(gen(rng, 16), w=3, zdrop=10)
    assert np.array_equal(dev, ref), np.argwhere(dev != ref)
