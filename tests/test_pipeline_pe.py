"""Device PE pipeline == oracle PE SAM (BASELINE config 2)."""
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
    rng = np.random.default_rng(999)
    g = rng.integers(0, 4, 25000).astype(np.uint8)
    g[12000:12200] = g[4000:4200]
    genome = dna.decode(g)
    idx = build_index([("chr1", genome)])
    return idx, Aligner(idx), dna.encode(genome)


def test_pe_device_matches_oracle(world):
    idx, aln, fwd = world
    recs = fastx.simulate_reads(fwd, 48, read_len=100, paired=True,
                                error_rate=0.01, seed=1,
                                insert_mean=320, insert_std=25)
    batch = fastx.batch_reads(recs)
    dev = aln.align_pe(batch, id0=0)
    orc, _ = aln.oracle.align_pe(batch, aln.opt, id0=0)
    d, o = dev.split("\n"), orc.split("\n")
    for i, (x, y) in enumerate(zip(d, o)):
        assert x == y, f"line {i}:\ndev: {x}\norc: {y}"
    assert len(d) == len(o)


def test_pe_device_with_rescue_and_junk(world):
    idx, aln, fwd = world
    recs = fastx.simulate_reads(fwd, 40, read_len=100, paired=True,
                                error_rate=0.02, seed=2)
    rng = np.random.default_rng(3)
    # heavy-error mate (rescue path) + junk mate (unmapped path)
    frag = fwd[8000:8300]
    r2 = dna.revcomp(frag[-100:]).copy()
    for p in range(0, 100, 6):
        r2[p] = (r2[p] + 1 + rng.integers(0, 3)) % 4
    recs.append(fastx.FastxRecord("resc", dna.decode(frag[:100])))
    recs.append(fastx.FastxRecord("resc", dna.decode(r2)))
    recs.append(fastx.FastxRecord("junk", dna.decode(fwd[2000:2100])))
    recs.append(fastx.FastxRecord("junk",
                                  dna.decode(rng.integers(0, 4, 100).astype(np.uint8))))
    batch = fastx.batch_reads(recs)
    dev = aln.align_pe(batch, id0=0)
    orc, _ = aln.oracle.align_pe(batch, aln.opt, id0=0)
    assert dev == orc


def test_pe_repeat_pairs(world):
    idx, aln, fwd = world
    recs = fastx.simulate_reads(fwd, 30, read_len=100, paired=True, seed=4,
                                insert_mean=300, insert_std=20)
    # pairs anchored in the planted duplicate
    for i, p in enumerate((12000, 12050, 4020)):
        frag = fwd[p : p + 280]
        recs.append(fastx.FastxRecord(f"rep{i}", dna.decode(frag[:100])))
        recs.append(fastx.FastxRecord(f"rep{i}",
                                      dna.decode(dna.revcomp(frag[-100:]))))
    batch = fastx.batch_reads(recs)
    dev = aln.align_pe(batch, id0=0)
    orc, _ = aln.oracle.align_pe(batch, aln.opt, id0=0)
    assert dev == orc


def test_pe_device_rescue_really_runs(world):
    """The batched device rescue must (a) generate tasks for a batch with
    a rescuable mate and (b) cover every window the scalar replay needs —
    zero inject-table misses (the extraction-superset property)."""
    idx, aln, fwd = world
    rng = np.random.default_rng(11)
    recs = fastx.simulate_reads(fwd, 60, read_len=100, paired=True,
                                error_rate=0.01, seed=5,
                                insert_mean=320, insert_std=25)
    # heavy-error mates so seeding fails but rescue SW succeeds
    for k, p in enumerate((3000, 9000, 15000)):
        frag = fwd[p:p + 300]
        r2 = dna.revcomp(frag[-100:]).copy()
        for q in range(0, 100, 7):
            r2[q] = (r2[q] + 1 + rng.integers(0, 3)) % 4
        recs.append(fastx.FastxRecord(f"resc{k}", dna.decode(frag[:100])))
        recs.append(fastx.FastxRecord(f"resc{k}", dna.decode(r2)))
    batch = fastx.batch_reads(recs)
    lib = aln.oracle._lib
    lib.tb_rescue_miss_reset()
    aln.stats.pop("rescue_tasks", None)
    dev = aln.align_pe(batch, id0=0)
    assert aln.stats.get("rescue_tasks", 0) > 0
    assert lib.tb_rescue_miss_count() == 0
    orc, _ = aln.oracle.align_pe(batch, aln.opt, id0=0)
    assert dev == orc


def test_pe_stream_matches_align_pe(world):
    idx, aln, fwd = world
    recs = fastx.simulate_reads(fwd, 64, read_len=100, paired=True,
                                error_rate=0.01, seed=6,
                                insert_mean=320, insert_std=25)
    batches = [fastx.batch_reads(recs[i:i + 16]) for i in range(0, 64, 16)]
    got = "".join(aln.align_pe_stream(batches, id0=0))
    want = ""
    n = 0
    for b in batches:
        want += aln.align_pe(b, id0=n)
        n += b.n // 2
    assert got == want
