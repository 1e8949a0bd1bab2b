"""250bp reads: soft-clipping, supplementary alignments (BASELINE config 5
semantics at small scale) — device pipeline vs oracle byte-equality plus
flag/CIGAR structure checks."""
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
    rng = np.random.default_rng(777)
    genome = dna.decode(rng.integers(0, 4, 30000).astype(np.uint8))
    idx = build_index([("chr1", genome)])
    return idx, Aligner(idx), dna.encode(genome)


def test_250bp_device_matches_oracle(world):
    idx, aln, fwd = world
    recs = fastx.simulate_reads(fwd, 24, read_len=250, error_rate=0.02,
                                seed=1)
    batch = fastx.batch_reads(recs)
    dev = aln.align_se(batch, id0=0)
    orc = aln.oracle.align_se(batch, aln.opt, id0=0)
    assert dev == orc


def test_250bp_split_reads_supplementary(world):
    """Chimeric 250bp reads -> primary + supplementary (0x800, hard clips)."""
    idx, aln, fwd = world
    rng = np.random.default_rng(2)
    recs = []
    for i in range(8):
        p1 = int(rng.integers(0, 25000))
        p2 = int(rng.integers(0, 25000))
        cut = int(rng.integers(100, 150))
        seq = np.concatenate([fwd[p1:p1 + cut], fwd[p2:p2 + 250 - cut]])
        recs.append(fastx.FastxRecord(f"split{i}", dna.decode(seq)))
    batch = fastx.batch_reads(recs)
    dev = aln.align_se(batch, id0=0)
    orc = aln.oracle.align_se(batch, aln.opt, id0=0)
    assert dev == orc
    lines = [l.split("\t") for l in dev.strip().split("\n")]
    by_name = {}
    for f in lines:
        by_name.setdefault(f[0], []).append(f)
    n_with_supp = 0
    for name, rows in by_name.items():
        if len(rows) >= 2:
            prim = [r for r in rows if not int(r[1]) & 0x800]
            supp = [r for r in rows if int(r[1]) & 0x800]
            assert len(prim) == 1
            n_with_supp += bool(supp)
            for s in supp:
                assert "H" in s[5], "supplementary records hard-clip"
                assert "S" not in s[5]
            assert "H" not in prim[0][5]
    assert n_with_supp >= 6  # most chimeras split into two alignments


def test_soft_clip_adapterish(world):
    """Reads with 30bp of foreign sequence at the 3' end soft-clip it."""
    idx, aln, fwd = world
    rng = np.random.default_rng(3)
    recs = []
    for i in range(6):
        p = int(rng.integers(0, 25000))
        core = fwd[p : p + 220]
        junk = rng.integers(0, 4, 30).astype(np.uint8)
        recs.append(fastx.FastxRecord(f"ad{i}",
                                      dna.decode(np.concatenate([core, junk]))))
    batch = fastx.batch_reads(recs)
    dev = aln.align_se(batch, id0=0)
    assert dev == aln.oracle.align_se(batch, aln.opt, id0=0)
    for line in dev.strip().split("\n"):
        f = line.split("\t")
        if int(f[1]) & (0x800 | 0x100):
            continue
        assert f[5].endswith("S") or f[5].startswith(
            tuple(str(d) for d in range(10))) and "S" in f[5], f[5]


def test_supplementary_sa_tag(world):
    """Every non-secondary record of a split read carries SA:Z listing the
    other non-secondary records [bwa: mem_aln2sam SA block]."""
    idx, aln, fwd = world
    rng = np.random.default_rng(5)
    recs = []
    for i in range(4):
        p1 = int(rng.integers(0, 25000))
        p2 = int(rng.integers(0, 25000))
        seq = np.concatenate([fwd[p1:p1 + 120], fwd[p2:p2 + 130]])
        recs.append(fastx.FastxRecord(f"sa{i}", dna.decode(seq)))
    batch = fastx.batch_reads(recs)
    out = aln.align_se(batch, id0=0)
    by_name = {}
    for line in out.strip().split("\n"):
        f = line.split("\t")
        by_name.setdefault(f[0], []).append(f)
    n_sa = 0
    for name, rows in by_name.items():
        nonsec = [r for r in rows if not int(r[1]) & 0x100]
        if len(nonsec) < 2:
            continue
        n_sa += 1
        for r in nonsec:
            tags = {t.split(":", 1)[0]: t for t in r[11:]}
            assert "SA" in tags, f"{name}: missing SA on flag {r[1]}"
            entries = [e for e in tags["SA"].split(":", 2)[2].split(";") if e]
            assert len(entries) == len(nonsec) - 1
            # each entry names one of the other records' rname,pos,strand
            others = {(o[2], o[3], "-" if int(o[1]) & 0x10 else "+")
                      for o in nonsec if o is not r}
            got = {(e.split(",")[0], e.split(",")[1], e.split(",")[2])
                   for e in entries}
            assert got == others
    assert n_sa >= 3
