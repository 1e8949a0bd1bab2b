"""Anchor-based SMEM seeding == oracle (and == the per-end implementation)."""
import numpy as np
import pytest
import jax.numpy as jnp

from tpubwa.index.builder import build_index
from tpubwa.index.device import DeviceIndex
from tpubwa.io import fastx
from tpubwa.opts import MemOptions
from tpubwa.oracle import Oracle
from tpubwa.seed.anchor import AnchorSeedConfig, collect_smems_anchor
from tpubwa.utils import dna

OPT = MemOptions()
ACFG = AnchorSeedConfig(min_seed_len=OPT.min_seed_len,
                        split_len=OPT.split_len,
                        split_width=OPT.split_width)


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(77)
    g = rng.integers(0, 4, 12000).astype(np.uint8)
    g[6000:6200] = g[1000:1200]
    g[9000:9060] = g[2000:2060]
    genome = dna.decode(g)
    idx = build_index([("chr1", genome)])
    return idx, DeviceIndex.from_host(idx), Oracle(idx), dna.encode(genome)


def cmp_smems(didx, orc, reads, lens):
    out = collect_smems_anchor(didx, jnp.asarray(reads), jnp.asarray(lens),
                               ACFG)
    qb, qe = np.asarray(out["qb"]), np.asarray(out["qe"])
    kk, ss = np.asarray(out["k"]), np.asarray(out["s"])
    n, ovf = np.asarray(out["n"]), np.asarray(out["overflow"])
    checked = 0
    for b in range(len(reads)):
        if ovf[b]:
            continue
        host = orc.smems(reads[b][: lens[b]], OPT)
        dev = [(int(kk[b, i]), int(ss[b, i]), int(qb[b, i]), int(qe[b, i]))
               for i in range(n[b])]
        hst = [(int(r[0]), int(r[2]), int(r[3]), int(r[4])) for r in host]
        assert dev == hst, f"read {b}\ndev={dev}\nhst={hst}"
        checked += 1
    return checked, ovf


def test_anchor_clean(world):
    idx, didx, orc, fwd = world
    b = fastx.batch_reads(fastx.simulate_reads(fwd, 24, read_len=100, seed=2))
    n, ovf = cmp_smems(didx, orc, b.seqs.astype(np.int32), b.lens)
    assert n == 24 and not ovf.any()


def test_anchor_noisy(world):
    idx, didx, orc, fwd = world
    b = fastx.batch_reads(fastx.simulate_reads(fwd, 32, read_len=100,
                                               error_rate=0.04, seed=3))
    n, _ = cmp_smems(didx, orc, b.seqs.astype(np.int32), b.lens)
    assert n >= 30


def test_anchor_repeats(world):
    idx, didx, orc, fwd = world
    recs = [fastx.FastxRecord(f"r{p}", dna.decode(fwd[p:p + 100]))
            for p in (6000, 6040, 6080, 990, 8990, 9000)]
    b = fastx.batch_reads(recs)
    n, ovf = cmp_smems(didx, orc, b.seqs.astype(np.int32), b.lens)
    assert not ovf.any() and n == 6


def test_anchor_N_short_junk(world):
    idx, didx, orc, fwd = world
    r1 = dna.decode(fwd[100:200])
    r1 = r1[:50] + "N" + r1[51:]
    recs = [
        fastx.FastxRecord("n1", r1),
        fastx.FastxRecord("short", dna.decode(fwd[300:310])),
        fastx.FastxRecord("alln", "N" * 30),
        fastx.FastxRecord("nedge", "N" * 10 + dna.decode(fwd[700:790])),
    ]
    b = fastx.batch_reads(recs)
    n, ovf = cmp_smems(didx, orc, b.seqs.astype(np.int32), b.lens)
    assert not ovf.any() and n == 4


def test_anchor_mixed_lengths(world):
    idx, didx, orc, fwd = world
    rng = np.random.default_rng(4)
    recs = []
    for i in range(16):
        ln = int(rng.integers(25, 150))
        p = int(rng.integers(0, len(fwd) - ln))
        seq = fwd[p : p + ln].copy()
        for _ in range(int(rng.integers(0, 4))):
            q = int(rng.integers(0, ln))
            seq[q] = (seq[q] + 1) % 4
        recs.append(fastx.FastxRecord(f"m{i}", dna.decode(seq)))
    b = fastx.batch_reads(recs, max_len=160)
    cmp_smems(didx, orc, b.seqs.astype(np.int32), b.lens)
