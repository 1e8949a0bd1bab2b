"""End-to-end SE pipeline: device worker1 + native finish == pure oracle SAM.

This is BASELINE config 1 correctness: single-end reads, single chip,
SAM-exact output.
"""
import numpy as np
import pytest

from tpubwa.index.builder import build_index
from tpubwa.io import fastx
from tpubwa.opts import MemOptions
from tpubwa.pipeline import Aligner
from tpubwa.utils import dna

OPT = MemOptions()


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(555)
    g = rng.integers(0, 4, 20000).astype(np.uint8)
    g[9000:9250] = g[3000:3250]  # repeat
    genome = dna.decode(g)
    idx = build_index([("chr1", genome[:12000]), ("chr2", genome[12000:])])
    return idx, Aligner(idx), dna.encode(genome)


def assert_sam_equal(aln, recs, seed_note=""):
    batch = fastx.batch_reads(recs)
    dev_sam = aln.align_se(batch, id0=0)
    orc_sam = aln.oracle.align_se(batch, aln.opt, id0=0)
    if dev_sam != orc_sam:
        d, o = dev_sam.split("\n"), orc_sam.split("\n")
        for i, (a, b) in enumerate(zip(d, o)):
            assert a == b, f"{seed_note} line {i}:\ndev: {a}\norc: {b}"
        assert len(d) == len(o), seed_note
    return dev_sam


def test_e2e_clean(world):
    idx, aln, fwd = world
    recs = fastx.simulate_reads(fwd[:12000], 32, read_len=100, seed=1)
    sam = assert_sam_equal(aln, recs, "clean")
    # spot-check truth (reads inside the planted repeat may map to either
    # copy with equal score; accept both)
    for line in sam.strip().split("\n"):
        f = line.split("\t")
        true_pos = int(f[0].split("_")[2])
        ok = {true_pos + 1}
        if 2900 <= true_pos <= 3250:
            ok.add(true_pos + 6001)
        if 8900 <= true_pos <= 9250:
            ok.add(true_pos - 5999)
        assert int(f[3]) in ok, line


def test_e2e_noisy(world):
    idx, aln, fwd = world
    recs = fastx.simulate_reads(fwd[:12000], 48, read_len=100,
                                error_rate=0.03, seed=2)
    assert_sam_equal(aln, recs, "noisy")


def test_e2e_indels_and_chimeras(world):
    idx, aln, fwd = world
    rng = np.random.default_rng(3)
    recs = []
    for i in range(20):
        p = int(rng.integers(0, 11000))
        r = fwd[p : p + 112].copy()
        q = int(rng.integers(15, 85))
        dl = int(rng.integers(1, 7))
        if rng.random() < 0.5:
            r = np.concatenate([r[:q], r[q + dl:]])
        else:
            r = np.concatenate([r[:q], rng.integers(0, 4, dl).astype(np.uint8),
                                r[q:]])
        recs.append(fastx.FastxRecord(f"iv{i}", dna.decode(r[:100])))
    for i in range(8):
        p1, p2 = int(rng.integers(0, 11000)), int(rng.integers(0, 11000))
        cut = int(rng.integers(35, 65))
        seq = np.concatenate([fwd[p1:p1 + cut], fwd[p2:p2 + 100 - cut]])
        recs.append(fastx.FastxRecord(f"ch{i}", dna.decode(seq)))
    assert_sam_equal(aln, recs, "indel")


def test_e2e_repeats_unmapped_N(world):
    idx, aln, fwd = world
    rng = np.random.default_rng(4)
    recs = [fastx.FastxRecord(f"rep{p}", dna.decode(fwd[p:p + 100]))
            for p in (9000, 9100, 9140, 3050)]
    junk = rng.integers(0, 4, 100).astype(np.uint8)
    recs.append(fastx.FastxRecord("junk", dna.decode(junk)))
    nread = dna.decode(fwd[500:600])
    recs.append(fastx.FastxRecord("withN", nread[:40] + "N" * 5 + nread[45:]))
    assert_sam_equal(aln, recs, "repeat")


def test_e2e_batch_invariance(world):
    """Same reads, different batch split -> identical SAM (determinism)."""
    idx, aln, fwd = world
    recs = fastx.simulate_reads(fwd[:12000], 20, read_len=100,
                                error_rate=0.02, seed=5)
    full = aln.align_se(fastx.batch_reads(recs), id0=0)
    parts = (aln.align_se(fastx.batch_reads(recs[:7]), id0=0) +
             aln.align_se(fastx.batch_reads(recs[7:]), id0=7))
    assert full == parts


def test_e2e_header(world):
    idx, aln, fwd = world
    hdr = aln.sam_header()
    assert "@SQ\tSN:chr1\tLN:12000" in hdr
    assert "@SQ\tSN:chr2\tLN:8000" in hdr
