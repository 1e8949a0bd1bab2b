"""Paired-end oracle: pestat recovery, proper pairing, mate rescue, flags.

BASELINE config 2 semantics: PE reads vs a small reference with insert-size
inference and proper-pair flags.
"""
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
    rng = np.random.default_rng(888)
    genome = dna.decode(rng.integers(0, 4, 30000).astype(np.uint8))
    idx = build_index([("chr1", genome)])
    return idx, Oracle(idx), dna.encode(genome)


def make_pairs(fwd, n, seed=0, **kw):
    recs = fastx.simulate_reads(fwd, n, read_len=100, paired=True,
                                seed=seed, **kw)
    return fastx.batch_reads(recs)


def parse(sam):
    out = []
    for line in sam.strip().split("\n"):
        f = line.split("\t")
        out.append(dict(name=f[0], flag=int(f[1]), rname=f[2], pos=int(f[3]),
                        mapq=int(f[4]), cigar=f[5], rnext=f[6],
                        pnext=int(f[7]), tlen=int(f[8]), line=line))
    return out


def test_pe_basic_proper_pairs(world):
    idx, orc, fwd = world
    batch = make_pairs(fwd, 64, seed=1, error_rate=0.01,
                       insert_mean=350, insert_std=30)
    sam, pes = orc.align_pe(batch, OPT)
    recs = parse(sam)
    assert len(recs) == 128
    # FR orientation (dir=1) must be inferred, others failed
    assert pes[1][2] == 0, pes
    assert pes[0][2] == 1 and pes[2][2] == 1 and pes[3][2] == 1
    assert 250 < pes[1][3] < 450   # avg insert
    n_proper = 0
    for i in range(0, len(recs), 2):
        r1, r2 = recs[i], recs[i + 1]
        assert r1["name"] == r2["name"]
        assert r1["flag"] & 0x1 and r2["flag"] & 0x1
        assert (r1["flag"] & 0x40) and (r2["flag"] & 0x80)
        if r1["flag"] & 0x2:
            n_proper += 1
            # opposite strands, same chromosome, mirror mate fields
            assert (r1["flag"] & 0x10 != 0) != (r2["flag"] & 0x10 != 0)
            assert r1["rnext"] == "=" and r2["rnext"] == "="
            assert r1["pnext"] == r2["pos"] and r2["pnext"] == r1["pos"]
            assert r1["tlen"] == -r2["tlen"] != 0
            # position matches the simulated truth, modulo a leading
            # soft-clip when an error sits at the fragment edge
            _, _, tp, ins = r1["name"].split("_")
            fwd_rec = r1 if not r1["flag"] & 0x10 else r2
            lead = 0
            c = fwd_rec["cigar"]
            if "S" in c.split("M")[0]:
                lead = int(c.split("S")[0])
            lo = min(r1["pos"], r2["pos"])
            assert lo == int(tp) + 1 + lead, (r1, r2)
            if lead == 0 and "S" not in r1["cigar"] + r2["cigar"]:
                assert abs(r1["tlen"]) == int(ins)
    assert n_proper >= 60


def test_pe_mate_rescue(world):
    idx, orc, fwd = world
    # 63 clean pairs to establish the insert distribution + 1 pair whose
    # end-2 has heavy errors (unseedable) -> rescued by mate SW
    recs = fastx.simulate_reads(fwd, 63, read_len=100, paired=True, seed=2,
                                insert_mean=300, insert_std=20)
    pos = 15000
    frag = fwd[pos : pos + 300]
    r1 = frag[:100].copy()
    r2 = dna.revcomp(frag[-100:]).copy()
    rng = np.random.default_rng(3)
    # mutate every 6th base of r2: max exact match ~6bp < min_seed_len
    for p in range(0, 100, 6):
        r2[p] = (r2[p] + 1 + rng.integers(0, 3)) % 4
    recs.append(fastx.FastxRecord("rescue_me", dna.decode(r1)))
    recs.append(fastx.FastxRecord("rescue_me", dna.decode(r2)))
    batch = fastx.batch_reads(recs)
    sam, pes = orc.align_pe(batch, OPT)
    recs_out = [r for r in parse(sam) if r["name"] == "rescue_me"]
    assert len(recs_out) == 2
    r1o = recs_out[0] if recs_out[0]["flag"] & 0x40 else recs_out[1]
    r2o = recs_out[1] if recs_out[0]["flag"] & 0x40 else recs_out[0]
    assert not (r2o["flag"] & 0x4), "mate rescue should map end 2"
    # local rescue may clip the mutated edges; demand the right neighborhood
    assert pos + 195 <= r2o["pos"] <= pos + 215, r2o
    assert r1o["flag"] & 0x2


def test_pe_one_end_unmapped(world):
    idx, orc, fwd = world
    recs = fastx.simulate_reads(fwd, 32, read_len=100, paired=True, seed=4)
    rng = np.random.default_rng(5)
    junk = rng.integers(0, 4, 100).astype(np.uint8)
    recs.append(fastx.FastxRecord("halfpair", dna.decode(fwd[5000:5100])))
    recs.append(fastx.FastxRecord("halfpair", dna.decode(junk)))
    batch = fastx.batch_reads(recs)
    sam, _ = orc.align_pe(batch, OPT)
    out = [r for r in parse(sam) if r["name"] == "halfpair"]
    mapped = [r for r in out if not r["flag"] & 0x4]
    unmapped = [r for r in out if r["flag"] & 0x4]
    # junk read may be rescued by mate SW (random 100-mer can exceed score
    # threshold in a 600bp window) — accept either outcome but check flags
    if unmapped:
        u = unmapped[0]
        m = mapped[0]
        assert m["flag"] & 0x8, "mate-unmapped flag"
        # unmapped end placed at its mate's coordinates
        assert u["rname"] == m["rname"] and u["pos"] == m["pos"]
        assert u["cigar"] == "*"
    else:
        assert len(mapped) == 2


def test_pe_deterministic(world):
    idx, orc, fwd = world
    batch = make_pairs(fwd, 40, seed=6, error_rate=0.02)
    sam1, _ = orc.align_pe(batch, OPT, id0=0)
    sam2, _ = orc.align_pe(batch, OPT, id0=0)
    assert sam1 == sam2


def test_pe_rf_orientation_improper(world):
    """Pairs violating the learned FR orientation lose the 0x2 flag."""
    idx, orc, fwd = world
    recs = fastx.simulate_reads(fwd, 40, read_len=100, paired=True, seed=7,
                                insert_mean=300, insert_std=20)
    # an outward-facing (RF) pair at a known locus
    pos = 20000
    r1 = dna.revcomp(fwd[pos : pos + 100])
    r2 = fwd[pos + 200 : pos + 300]
    recs.append(fastx.FastxRecord("rfpair", dna.decode(r1)))
    recs.append(fastx.FastxRecord("rfpair", dna.decode(r2)))
    batch = fastx.batch_reads(recs)
    sam, pes = orc.align_pe(batch, OPT)
    out = [r for r in parse(sam) if r["name"] == "rfpair"]
    assert len(out) == 2
    assert not (out[0]["flag"] & 0x2)
    assert not (out[0]["flag"] & 0x4) and not (out[1]["flag"] & 0x4)
