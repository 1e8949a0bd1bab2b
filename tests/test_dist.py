"""Mesh data parallelism on the 8-virtual-device CPU backend (SURVEY §4.3).

Checks the two distribution invariants the reference relied on Spark for:
sharded worker1 output equals single-device output, and the pestat psum
histogram equals the global histogram.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpubwa.dist.mesh import insert_size_psum, make_mesh, worker1_sharded, \
    worker1_step
from tpubwa.index.builder import build_index
from tpubwa.index.device import DeviceIndex
from tpubwa.io import fastx
from tpubwa.opts import MemOptions
from tpubwa.pipeline import configs_from_opts
from tpubwa.utils import dna


@pytest.fixture(scope="module")
def world():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    rng = np.random.default_rng(31)
    genome = dna.decode(rng.integers(0, 4, 8000).astype(np.uint8))
    idx = build_index([("c", genome)])
    didx = DeviceIndex.from_host(idx)
    fwd = dna.encode(genome)
    recs = fastx.simulate_reads(fwd, 32, read_len=100, error_rate=0.02,
                                seed=1)
    batch = fastx.batch_reads(recs)
    opt = MemOptions()
    cfgs = configs_from_opts(opt)
    from tpubwa.seed.lut import KmerLUT
    lut = KmerLUT.build(idx, min_seed_len=opt.min_seed_len)
    return didx, lut, batch, cfgs


def test_sharded_worker1_matches_single(world):
    didx, lut, batch, (scfg, ccfg, ecfg) = world
    mesh = make_mesh(8)
    seqs = jnp.asarray(batch.seqs.astype(np.int32))
    lens = jnp.asarray(batch.lens)
    out_sharded = worker1_sharded(mesh, didx, seqs, lens, scfg, ccfg, ecfg,
                                  lut)
    out_single = jax.jit(
        lambda d, s, l, u: worker1_step(d, s, l, u, scfg=scfg, ccfg=ccfg,
                                        ecfg=ecfg))(didx, seqs, lens, lut)
    for k in out_single:
        a, b = np.asarray(out_sharded[k]), np.asarray(out_single[k])
        assert np.array_equal(a, b), k


def test_insert_size_psum_matches_global(world):
    didx, lut, batch, _ = world
    mesh = make_mesh(8)
    rng = np.random.default_rng(2)
    inserts = rng.integers(0, 900, 64).astype(np.int32)
    ok = rng.random(64) < 0.8
    hist = np.asarray(insert_size_psum(mesh, jnp.asarray(inserts),
                                       jnp.asarray(ok), max_ins=1000))
    ref = np.bincount(inserts[ok], minlength=1001)
    assert np.array_equal(hist, ref)
    assert hist.sum() == ok.sum()
