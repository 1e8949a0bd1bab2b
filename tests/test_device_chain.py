"""Device chaining + filtering golden-tested against the oracle."""
import numpy as np
import pytest
import jax.numpy as jnp

from tpubwa.index.builder import build_index
from tpubwa.index.device import DeviceIndex
from tpubwa.io import fastx
from tpubwa.opts import MemOptions
from tpubwa.oracle import Oracle
from tpubwa.seed.device import SeedConfig, collect_smems
from tpubwa.chain.device import (ChainConfig, chain_filter, chain_seeds,
                                 seeds_from_smems)
from tpubwa.utils import dna

OPT = MemOptions()
SCFG = SeedConfig(min_seed_len=OPT.min_seed_len, split_len=OPT.split_len,
                  split_width=OPT.split_width)
CCFG = ChainConfig(max_occ=OPT.max_occ, max_chain_gap=OPT.max_chain_gap,
                   w=OPT.w, min_seed_len=OPT.min_seed_len,
                   mask_level=OPT.mask_level, drop_ratio=OPT.drop_ratio)


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(123)
    g = rng.integers(0, 4, 15000).astype(np.uint8)
    g[7000:7300] = g[2000:2300]   # 300bp duplicate: multi-chain reads
    g[11000:11080] = g[2100:2180]
    genome = dna.decode(g)
    idx = build_index([("chrA", genome[:9000]), ("chrB", genome[9000:])])
    return idx, DeviceIndex.from_host(idx), Oracle(idx), dna.encode(genome)


def device_chains(didx, batch, filtered):
    smems = collect_smems(didx, jnp.asarray(batch.seqs.astype(np.int32)),
                          jnp.asarray(batch.lens), SCFG)
    seeds = seeds_from_smems(didx, smems, CCFG)
    ch = chain_seeds(didx, seeds, CCFG)
    out = []
    rbeg = np.asarray(seeds["rbeg"])
    qbeg = np.asarray(seeds["qbeg"])
    ln = np.asarray(seeds["len"])
    chain_id = np.asarray(ch["chain_id"])
    n = np.asarray(ch["n"])
    pos = np.asarray(ch["pos"])
    ovf = np.asarray(ch["overflow"])
    if filtered:
        flt = chain_filter(ch, CCFG)
        order = np.asarray(flt["order"])
        kept = np.asarray(flt["kept"])
    B = batch.n
    for b in range(B):
        if filtered:
            cids = [int(order[b, i]) for i in range(order.shape[1])
                    if kept[b, i] > 0]
        else:
            cids = sorted(range(int(n[b])), key=lambda c: (int(pos[b, c]), c))
        rows = []
        for c in cids:
            for s in range(chain_id.shape[1]):
                if chain_id[b, s] == c:
                    rows.append((int(rbeg[b, s]), int(qbeg[b, s]),
                                 int(ln[b, s]), cids.index(c)))
        out.append(rows)
    return out, ovf


def compare(didx, orc, recs, filtered):
    batch = fastx.batch_reads(recs)
    dev, ovf = device_chains(didx, batch, filtered)
    n_checked = 0
    for b in range(batch.n):
        if ovf[b]:
            continue
        host = orc.chains(batch.seqs[b][: batch.lens[b]], OPT,
                          filtered=filtered)
        host_rows = [tuple(int(x) for x in r) for r in host]
        assert dev[b] == host_rows, f"read {b}"
        n_checked += 1
    return n_checked


def test_chains_unfiltered_clean(world):
    idx, didx, orc, fwd = world
    recs = fastx.simulate_reads(fwd[:9000], 20, read_len=100, seed=1)
    assert compare(didx, orc, recs, filtered=False) >= 18


def test_chains_unfiltered_noisy(world):
    idx, didx, orc, fwd = world
    recs = fastx.simulate_reads(fwd[:9000], 24, read_len=100,
                                error_rate=0.04, seed=2)
    assert compare(didx, orc, recs, filtered=False) >= 20


def test_chains_repeats(world):
    idx, didx, orc, fwd = world
    recs = [fastx.FastxRecord(f"r{p}", dna.decode(fwd[p:p + 100]))
            for p in (7000, 7100, 7150, 7250, 2050, 10990, 11010)]
    assert compare(didx, orc, recs, filtered=False) >= 6
    assert compare(didx, orc, recs, filtered=True) >= 6


def test_chains_filtered(world):
    idx, didx, orc, fwd = world
    recs = fastx.simulate_reads(fwd, 30, read_len=100, error_rate=0.02,
                                seed=3)
    assert compare(didx, orc, recs, filtered=True) >= 27


def test_chains_chimeric(world):
    """Reads stitched from two loci -> multiple chains, filter decisions."""
    idx, didx, orc, fwd = world
    rng = np.random.default_rng(4)
    recs = []
    for i in range(8):
        p1 = int(rng.integers(0, 8000))
        p2 = int(rng.integers(0, 8000))
        part = int(rng.integers(30, 70))
        seq = np.concatenate([fwd[p1:p1 + part], fwd[p2:p2 + 100 - part]])
        recs.append(fastx.FastxRecord(f"chi{i}", dna.decode(seq)))
    compare(didx, orc, recs, filtered=False)
    compare(didx, orc, recs, filtered=True)


def test_cross_contig_and_strand_seeds(world):
    """Seeds spanning the chrA/chrB boundary or strand boundary are dropped."""
    idx, didx, orc, fwd = world
    recs = [
        fastx.FastxRecord("bnd", dna.decode(fwd[8950:9050])),
        fastx.FastxRecord("rev", dna.decode(dna.revcomp(fwd[4000:4100]))),
    ]
    assert compare(didx, orc, recs, filtered=True) == 2
