"""Property + truth tests of the oracle's full per-read pipeline."""
import numpy as np
import pytest

from tpubwa.index.builder import build_index
from tpubwa.io import fastx
from tpubwa.opts import MemOptions
from tpubwa.oracle import Oracle
from tpubwa.utils import dna

OPT = MemOptions()


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(42)
    genome = dna.decode(rng.integers(0, 4, 20000).astype(np.uint8))
    idx = build_index([("chr1", genome)])
    orc = Oracle(idx)
    fwd = dna.encode(genome)
    text = np.concatenate([fwd, dna.revcomp(fwd)])
    return idx, orc, text, fwd


def count_occ(text, pat):
    n, m = len(text), len(pat)
    if m == 0 or m > n:
        return 0
    windows = np.lib.stride_tricks.sliding_window_view(text, m)
    return int((windows == pat).all(axis=1).sum())


def test_smems_are_maximal_exact_matches(world):
    idx, orc, text, fwd = world
    rng = np.random.default_rng(1)
    for t in range(10):
        pos = int(rng.integers(0, len(fwd) - 120))
        read = fwd[pos : pos + 100].copy()
        # plant two mismatches to split SMEMs
        for p in (30, 71):
            read[p] = (read[p] + 1) % 4
        rows = orc.smems(read, OPT)
        assert len(rows) >= 1
        for k, l, s, qb, qe in rows:
            pat = read[qb:qe]
            assert qe - qb >= OPT.min_seed_len
            assert s == count_occ(text, pat), "interval size == #occurrences"
            # maximality: extending in either direction loses occurrences
            if qb > 0 and qe < len(read):
                assert count_occ(text, read[qb - 1 : qe]) < s or \
                       count_occ(text, read[qb : qe + 1]) < s


def test_exact_read_single_reg(world):
    idx, orc, text, fwd = world
    rng = np.random.default_rng(2)
    pos = int(rng.integers(0, len(fwd) - 100))
    read = fwd[pos : pos + 100]
    regs = orc.regs(read, OPT)
    assert len(regs) == 1
    rb, re, qb, qe, rid, score = regs[0][:6]
    assert (rb, re, qb, qe) == (pos, pos + 100, 0, 100)
    assert score == 100 * OPT.a
    assert rid == 0


def test_align_se_exact_reads(world):
    idx, orc, text, fwd = world
    reads = fastx.simulate_reads(fwd, 60, read_len=100, error_rate=0.0, seed=3)
    batch = fastx.batch_reads(reads)
    sam = orc.align_se(batch, OPT)
    lines = sam.strip().split("\n")
    assert len(lines) == 60
    for line in lines:
        f = line.split("\t")
        name, flag, rname, pos, mapq, cigar = f[0], int(f[1]), f[2], int(f[3]), int(f[4]), f[5]
        _, i, true_pos, strand = name.split("_")
        assert rname == "chr1"
        assert cigar == "100M"
        assert pos == int(true_pos) + 1, name
        assert (flag & 0x10 != 0) == (strand == "1")
        assert mapq > 0
        assert "NM:i:0" in line
        assert "MD:Z:100" in line


def test_align_se_with_errors(world):
    idx, orc, text, fwd = world
    reads = fastx.simulate_reads(fwd, 40, read_len=100, error_rate=0.02, seed=4)
    batch = fastx.batch_reads(reads)
    sam = orc.align_se(batch, OPT)
    lines = sam.strip().split("\n")
    n_correct = 0
    for line in lines:
        f = line.split("\t")
        name, flag, pos = f[0], int(f[1]), int(f[3])
        if flag & 0x4:
            continue
        true_pos = int(name.split("_")[2])
        if pos == true_pos + 1:
            n_correct += 1
    assert n_correct >= 38  # ~2% errors should rarely move a 100bp read


def test_align_se_unmapped_junk(world):
    idx, orc, text, fwd = world
    rng = np.random.default_rng(9)
    # a read over a 4-letter alphabet that (with high prob.) shares no 19-mer
    junk = rng.integers(0, 4, 100).astype(np.uint8)
    while count_occ(text, junk[:25]):
        junk = rng.integers(0, 4, 100).astype(np.uint8)
    batch = fastx.batch_reads([fastx.FastxRecord("junk", dna.decode(junk))])
    sam = orc.align_se(batch, OPT)
    f = sam.strip().split("\t")
    assert int(f[1]) & 0x4
    assert f[2] == "*"


def test_reverse_strand_cigar_orientation(world):
    idx, orc, text, fwd = world
    pos = 5000
    read = dna.revcomp(fwd[pos : pos + 100])
    # delete 4 bases in read => deletion relative to ref
    read = np.concatenate([read[:40], read[44:]])
    batch = fastx.batch_reads([fastx.FastxRecord("r", dna.decode(read))])
    sam = orc.align_se(batch, OPT)
    f = sam.strip().split("\t")
    assert int(f[1]) & 0x10
    assert f[5].count("D") == 1
    # position maps to the forward-strand start
    assert int(f[3]) == pos + 1


def test_deterministic_across_batching(world):
    idx, orc, text, fwd = world
    reads = fastx.simulate_reads(fwd, 20, read_len=100, error_rate=0.01, seed=6)
    full = orc.align_se(fastx.batch_reads(reads), OPT, id0=0)
    parts = [
        orc.align_se(fastx.batch_reads(reads[:10]), OPT, id0=0),
        orc.align_se(fastx.batch_reads(reads[10:]), OPT, id0=10),
    ]
    assert full == "".join(parts)
