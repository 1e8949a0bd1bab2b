"""Tier-2 big-caps device path: repeat-dense reads that overflow the fast
tier's caps stay ON DEVICE (and byte-exact) instead of falling back to the
host oracle."""
import numpy as np
import pytest

from tpubwa.index.builder import build_index
from tpubwa.io import fastx
from tpubwa.pipeline import Aligner
from tpubwa.utils import dna


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(55)
    unit = rng.integers(0, 4, 200).astype(np.uint8)
    parts = [rng.integers(0, 4, 3000).astype(np.uint8)]
    for _ in range(60):       # 60 near-identical copies: each SMEM -> 60
        c = unit.copy()       # seeds, beyond the fast tier's 128-seed cap
        #                       in aggregate but inside tier-2's 640
        p = rng.integers(0, 200, 2)
        c[p] = (c[p] + 1) % 4
        parts.append(c)
        parts.append(rng.integers(0, 4, 40).astype(np.uint8))
    parts.append(rng.integers(0, 4, 3000).astype(np.uint8))
    g = np.concatenate(parts)
    idx = build_index([("rep", dna.decode(g))])
    return idx, Aligner(idx), g, unit


def test_repeat_read_uses_tier2_not_oracle(world):
    idx, aln, g, unit = world
    rng = np.random.default_rng(6)
    recs = [fastx.FastxRecord(f"u_{i}",
                              dna.decode(g[p:p + 100]))
            for i, p in enumerate(rng.integers(0, 2900, 6))]
    recs.append(fastx.FastxRecord("rep_read", dna.decode(unit[:100])))
    batch = fastx.batch_reads(recs, max_len=100)
    aln.stats = {"reads": 0, "fallback_reads": 0}
    dev = aln.align_se(batch, id0=0)
    want = aln.oracle.align_se(batch, aln.opt, id0=0)
    assert dev == want
    # the repeat read must have been rescued by tier-2, not the oracle
    assert aln.stats["fallback_reads"] == 0


@pytest.fixture(scope="module")
def world3():
    # ~800 near-identical copies: one SMEM family yields ~800 seeds —
    # beyond tier-2's 640 cap, inside tier-3's 1280
    rng = np.random.default_rng(56)
    unit = rng.integers(0, 4, 120).astype(np.uint8)
    parts = [rng.integers(0, 4, 2000).astype(np.uint8)]
    for _ in range(800):
        c = unit.copy()
        p = rng.integers(0, 120, 1)
        c[p] = (c[p] + 1) % 4
        parts.append(c)
        parts.append(rng.integers(0, 4, 10).astype(np.uint8))
    parts.append(rng.integers(0, 4, 2000).astype(np.uint8))
    g = np.concatenate(parts)
    idx = build_index([("rep3", dna.decode(g))])
    # TIER3_MIN=8 would skip a single overflow read; force the path
    aln = Aligner(idx)
    aln.TIER3_MIN = 1
    return idx, aln, g, unit


def test_megarepeat_read_uses_tier3_not_oracle(world3):
    idx, aln, g, unit = world3
    rng = np.random.default_rng(7)
    recs = [fastx.FastxRecord(f"u_{i}", dna.decode(g[p:p + 100]))
            for i, p in enumerate(rng.integers(0, 1900, 6))]
    recs.append(fastx.FastxRecord("rep_read", dna.decode(unit[:100])))
    batch = fastx.batch_reads(recs, max_len=100)
    aln.stats = {"reads": 0, "fallback_reads": 0}
    dev = aln.align_se(batch, id0=0)
    want = aln.oracle.align_se(batch, aln.opt, id0=0)
    assert dev == want
    assert aln.stats["fallback_reads"] == 0
