"""Compiled-TPU pytest lane (@pytest.mark.tpu).

Run with `TPUBWA_TPU_TESTS=1 python -m pytest tests -m tpu` on a machine
with a chip; skipped otherwise. This is the in-suite version of
scripts/tpu_smoke.py (which remains the exhaustive pre-snapshot sweep):
kernel parity at the shapes that crashed in round 3 plus one e2e batch,
so a kernel that only breaks under the Mosaic TPU lowering can never ship
through a green CPU suite again.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "scripts"))
sys.path.insert(0, str(REPO))

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def tpu_backend():
    import jax
    if jax.default_backend() != "tpu":
        pytest.skip("no TPU visible")
    return jax.default_backend()


@pytest.mark.parametrize("Q,T,N", [(100, 290, 600), (151, 768, 300),
                                   (256, 1024, 200)])
def test_kernel_parity(tpu_backend, Q, T, N):
    import jax.numpy as jnp
    from tpu_smoke import gen_tasks
    from tpubwa.opts import MemOptions
    from tpubwa.extend.jax_extend import ksw_extend_batch, ksw_local_batch
    from tpubwa.ops.sw_pallas import ksw_extend_pallas, ksw_local_pallas
    from tpubwa.pair.rescue import _scmat_tuple

    opt = MemOptions()
    scmat = np.full((5, 5), -1, np.int32)
    for i in range(4):
        for j in range(4):
            scmat[i, j] = opt.a if i == j else -opt.b
    qs, qlen, ts, tlen = gen_tasks(Q * 13 + T, n=N, maxq=Q, maxt=T)
    valid = jnp.ones(len(qlen), bool)
    h0 = jnp.asarray(np.random.default_rng(T).integers(
        10, Q, len(qlen)).astype(np.int32))
    w = jnp.full((len(qlen),), opt.w, jnp.int32)
    eb = jnp.full((len(qlen),), 5, jnp.int32)
    ref = ksw_extend_batch(
        jnp.asarray(qs, jnp.int32), jnp.asarray(qlen),
        jnp.asarray(ts, jnp.int32), jnp.asarray(tlen), h0, w, eb, valid,
        jnp.asarray(scmat), None, opt.o_del, opt.e_del, opt.o_ins,
        opt.e_ins, opt.zdrop)
    pal = ksw_extend_pallas(
        jnp.asarray(qs, jnp.int32), jnp.asarray(qlen),
        jnp.asarray(ts, jnp.int32), jnp.asarray(tlen), h0, w, eb, valid,
        opt.o_del, opt.e_del, opt.o_ins, opt.e_ins, opt.zdrop, opt.a, opt.b)
    want = np.stack([np.asarray(r) for r in ref], axis=1)
    np.testing.assert_array_equal(np.asarray(pal), want)

    minsc = jnp.full((len(qlen),), opt.min_seed_len * opt.a, jnp.int32)
    refl = ksw_local_batch(
        jnp.asarray(qs, jnp.int32), jnp.asarray(qlen),
        jnp.asarray(ts, jnp.int32), jnp.asarray(tlen), valid, minsc,
        _scmat_tuple(opt.a, opt.b), opt.o_del, opt.e_del, opt.o_ins,
        opt.e_ins, True)
    pall = ksw_local_pallas(
        jnp.asarray(qs, jnp.int32), jnp.asarray(qlen),
        jnp.asarray(ts, jnp.int32), jnp.asarray(tlen), minsc, valid,
        opt.o_del, opt.e_del, opt.o_ins, opt.e_ins, opt.a, opt.b,
        want_sub=True)
    wantl = np.stack([np.asarray(r) for r in refl], axis=1)
    np.testing.assert_array_equal(np.asarray(pall), wantl)


@pytest.fixture(scope="module")
def bench_aligner(tpu_backend):
    import bench as B
    from tpubwa.opts import MemOptions
    from tpubwa.pipeline import Aligner
    idx = B.get_index()
    aln = Aligner(idx, MemOptions(),
                  lut_cache=REPO / "build" /
                  f"bench_lut_hard_{B.GENOME_LEN}.npz")
    fwd = idx.get_seq(0, idx.l_pac).astype(np.uint8)
    return aln, fwd


def test_e2e_se_parity(bench_aligner):
    from tpubwa.io import fastx
    aln, fwd = bench_aligner
    recs = fastx.simulate_reads(fwd, 256, read_len=100, error_rate=0.01,
                                indel_rate=0.001, seed=71)
    b = fastx.batch_reads(recs, max_len=100)
    assert aln.align_se(b, id0=0) == \
        aln.oracle.align_se(b, aln.opt, id0=0, rg_id="")


def test_e2e_pe_parity(bench_aligner):
    from tpubwa.io import fastx
    aln, fwd = bench_aligner
    pe = fastx.simulate_reads(fwd, 256, read_len=150, paired=True,
                              error_rate=0.01, indel_rate=0.001, seed=72,
                              insert_mean=400, insert_std=50)
    bp = fastx.batch_reads(pe, max_len=150)
    assert aln.align_pe(bp, id0=0) == \
        aln.oracle.align_pe(bp, aln.opt, id0=0, rg_id="")[0]
