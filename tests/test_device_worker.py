"""Device chain2aln orchestration golden-tested vs the oracle (pre-dedup)."""
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
from tpubwa.extend.worker import ExtendConfig, extend_chains
from tpubwa.utils import dna

OPT = MemOptions()
SCFG = SeedConfig(min_seed_len=OPT.min_seed_len, split_len=OPT.split_len,
                  split_width=OPT.split_width)
CCFG = ChainConfig(max_occ=OPT.max_occ, max_chain_gap=OPT.max_chain_gap,
                   w=OPT.w, min_seed_len=OPT.min_seed_len,
                   mask_level=OPT.mask_level, drop_ratio=OPT.drop_ratio)
ECFG = ExtendConfig(w=OPT.w, zdrop=OPT.zdrop, a=OPT.a, b=OPT.b,
                    o_del=OPT.o_del, e_del=OPT.e_del, o_ins=OPT.o_ins,
                    e_ins=OPT.e_ins, pen_clip5=OPT.pen_clip5,
                    pen_clip3=OPT.pen_clip3)


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(321)
    g = rng.integers(0, 4, 16000).astype(np.uint8)
    g[7000:7300] = g[2000:2300]
    genome = dna.decode(g)
    idx = build_index([("chrA", genome[:10000]), ("chrB", genome[10000:])])
    return idx, DeviceIndex.from_host(idx), Oracle(idx), dna.encode(genome)


def run_device(didx, batch):
    seqs = jnp.asarray(batch.seqs.astype(np.int32))
    lens = jnp.asarray(batch.lens)
    smems = collect_smems(didx, seqs, lens, SCFG)
    seeds = seeds_from_smems(didx, smems, CCFG)
    ch = chain_seeds(didx, seeds, CCFG)
    flt = chain_filter(ch, CCFG)
    st = extend_chains(didx, seqs, lens, seeds, ch, ECFG, flt)
    return st


FIELDS = ("rb", "re", "qb", "qe", "seedcov", "score", "truesc", "seedlen0",
          "w")


def compare(didx, orc, recs):
    batch = fastx.batch_reads(recs)
    st = run_device(didx, batch)
    arr = {f: np.asarray(st[f]) for f in FIELDS}
    n = np.asarray(st["n"])
    ovf = np.asarray(st["overflow"])
    checked = 0
    for b in range(batch.n):
        if ovf[b]:
            continue
        host = orc.regs(batch.seqs[b][: batch.lens[b]], OPT, stage=0)
        dev = [tuple(int(arr[f][b, i]) for f in FIELDS) for i in range(n[b])]
        hst = [tuple(int(x) for x in r[:9]) for r in host]
        # host row layout at stage 0:
        # rb, re, qb, qe, seedcov, score, truesc, seedlen0, csub, sub_n, w, sec
        hst = [(r[0], r[1], r[2], r[3], r[4], r[5], r[6], r[7], r[10])
               for r in [tuple(int(x) for x in row) for row in host]]
        assert dev == hst, f"read {b}:\ndev={dev}\nhst={hst}"
        checked += 1
    return checked


def test_regs_clean(world):
    idx, didx, orc, fwd = world
    recs = fastx.simulate_reads(fwd[:10000], 16, read_len=100, seed=1)
    assert compare(didx, orc, recs) >= 15


def test_regs_noisy(world):
    idx, didx, orc, fwd = world
    recs = fastx.simulate_reads(fwd[:10000], 24, read_len=100,
                                error_rate=0.04, seed=2)
    assert compare(didx, orc, recs) >= 20


def test_regs_indels(world):
    idx, didx, orc, fwd = world
    rng = np.random.default_rng(5)
    recs = []
    for i in range(16):
        p = int(rng.integers(0, 9000))
        r = fwd[p : p + 110].copy()
        q = int(rng.integers(10, 90))
        dl = int(rng.integers(1, 6))
        if rng.random() < 0.5:
            r = np.concatenate([r[:q], r[q + dl:]])[:100]  # deletion
        else:
            ins = rng.integers(0, 4, dl).astype(np.uint8)
            r = np.concatenate([r[:q], ins, r[q:]])[:100]  # insertion
        recs.append(fastx.FastxRecord(f"ind{i}", dna.decode(r[:100])))
    assert compare(didx, orc, recs) >= 14


def test_regs_repeats_and_chimeras(world):
    idx, didx, orc, fwd = world
    rng = np.random.default_rng(6)
    recs = [fastx.FastxRecord(f"rep{p}", dna.decode(fwd[p:p + 100]))
            for p in (7000, 7100, 7190, 2050)]
    for i in range(6):
        p1, p2 = int(rng.integers(0, 9000)), int(rng.integers(0, 9000))
        cut = int(rng.integers(30, 70))
        seq = np.concatenate([fwd[p1:p1 + cut], fwd[p2:p2 + 100 - cut]])
        recs.append(fastx.FastxRecord(f"chi{i}", dna.decode(seq)))
    assert compare(didx, orc, recs) >= 8


def test_regs_reverse_strand(world):
    idx, didx, orc, fwd = world
    recs = fastx.simulate_reads(fwd[:10000], 12, read_len=100,
                                error_rate=0.02, seed=7)
    # simulate_reads already mixes strands; add pure revcomp reads
    recs += [fastx.FastxRecord(f"rc{p}",
                               dna.decode(dna.revcomp(fwd[p:p + 100])))
             for p in (500, 4000, 12000)]
    assert compare(didx, orc, recs) >= 13
