"""int64 (>1 Gbp-class) device-index path: every device stage must produce
identical results when positions/ranks are carried as int64 — the dtype a
GRCh38-scale index uses (2*l_pac >= 2**31, SURVEY.md §2.5 "index replicated
in HBM"). A small genome is WIDENED to int64 so the large-genome code paths
(hi/lo MXU splits, int32 gather-index casts, int64 while-loop carries) run
in CI without building a 3 Gbp index.
"""
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from tpubwa.chain.device import ChainConfig, chain_filter, chain_seeds, \
    seeds_from_smems
from tpubwa.extend.worker import ExtendConfig, extend_chains
from tpubwa.index.builder import build_index
from tpubwa.index.device import DeviceIndex
from tpubwa.io import fastx
from tpubwa.opts import MemOptions
from tpubwa.pipeline import configs_from_opts
from tpubwa.seed.lut import KmerLUT, collect_smems_lut
from tpubwa.utils import dna


def widen(didx: DeviceIndex) -> DeviceIndex:
    return dataclasses.replace(
        didx,
        L2=didx.L2.astype(jnp.int64),
        sa_samples=didx.sa_samples.astype(jnp.int64),
        ann_end=didx.ann_end.astype(jnp.int64),
    )


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(5)
    genome = dna.decode(rng.integers(0, 4, 60_000).astype(np.uint8))
    idx = build_index([("chrT", genome)])
    didx = DeviceIndex.from_host(idx)
    lut = KmerLUT.build(idx)
    recs = fastx.simulate_reads(dna.encode(genome), 24, read_len=100,
                                error_rate=0.02, indel_rate=0.005, seed=2)
    batch = fastx.batch_reads(recs)
    scfg, ccfg, ecfg = configs_from_opts(MemOptions())
    return idx, didx, lut, batch, (scfg, ccfg, ecfg)


def test_int64_worker1_matches_int32(world):
    idx, didx, lut, batch, (scfg, ccfg, ecfg) = world
    didx64 = widen(didx)
    lut64 = KmerLUT(lut.k0, lut.ksp.astype(jnp.int64))
    seqs = jnp.asarray(batch.seqs.astype(np.int32))
    lens = jnp.asarray(batch.lens)

    outs = {}
    for tag, dd, ll in (("32", didx, lut), ("64", didx64, lut64)):
        smems = collect_smems_lut(dd, ll, seqs, lens, scfg)
        seeds = seeds_from_smems(dd, smems, ccfg)
        ch = chain_seeds(dd, seeds, ccfg)
        flt = chain_filter(ch, ccfg)
        st = extend_chains(dd, seqs, lens, seeds, ch, ecfg, flt)
        outs[tag] = (smems, seeds, st)

    sm32, sd32, st32 = outs["32"]
    sm64, sd64, st64 = outs["64"]
    assert sm64["k"].dtype == jnp.int64 and sm64["pos"].dtype == jnp.int64
    for f in ("qb", "qe", "s", "n", "overflow", "k", "pos"):
        np.testing.assert_array_equal(np.asarray(sm32[f]),
                                      np.asarray(sm64[f]), err_msg=f)
    assert sd64["rbeg"].dtype == jnp.int64
    for f in ("rbeg", "qbeg", "len", "rid", "valid", "overflow"):
        np.testing.assert_array_equal(np.asarray(sd32[f]),
                                      np.asarray(sd64[f]), err_msg=f)
    assert st64["rb"].dtype == jnp.int64
    for f in ("rb", "re", "qb", "qe", "score", "truesc", "n", "overflow"):
        np.testing.assert_array_equal(np.asarray(st32[f]),
                                      np.asarray(st64[f]), err_msg=f)


def test_int64_packed_roundtrip(world):
    """The 6-word packed transfer reconstructs >32-bit rb exactly."""
    from tpubwa.pipeline import Aligner
    idx, didx, lut, batch, _ = world
    aln = Aligner(idx, MemOptions())
    aln.didx = widen(aln.didx)
    aln.lut = KmerLUT(aln.lut.k0, aln.lut.ksp.astype(jnp.int64))
    buf = np.asarray(aln.worker1_packed(jnp.asarray(batch.seqs),
                                        jnp.asarray(batch.lens)))
    n, ovf, l_rep, flat = aln._unpack_host(buf, batch.n)
    assert flat.dtype == np.int64
    # independently recompute through the unwidened path
    aln2 = Aligner(idx, MemOptions())
    buf2 = np.asarray(aln2.worker1_packed(jnp.asarray(batch.seqs),
                                          jnp.asarray(batch.lens)))
    n2, ovf2, _, flat2 = aln2._unpack_host(buf2, batch.n)
    np.testing.assert_array_equal(n, n2)
    np.testing.assert_array_equal(flat, flat2)


def test_int64_sam_equal(world):
    """End-to-end SAM text identical between int32 and int64 index."""
    from tpubwa.pipeline import Aligner
    idx, _, _, batch, _ = world
    aln32 = Aligner(idx, MemOptions())
    sam32 = aln32.align_se(batch, id0=0)
    aln64 = Aligner(idx, MemOptions())
    aln64.didx = widen(aln64.didx)
    aln64.lut = KmerLUT(aln64.lut.k0, aln64.lut.ksp.astype(jnp.int64))
    sam64 = aln64.align_se(batch, id0=0)
    assert sam32 == sam64
