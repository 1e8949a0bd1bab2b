"""Mixed read-length batches through the bucketed device path == oracle.

VERDICT r2 item 10 / SURVEY.md §5.7: real FASTQ mixes lengths; the device
pipeline buckets reads to multiples of Aligner.BUCKET lanes so padding
waste stays bounded, and re-interleaves results into input order.
"""
import numpy as np
import pytest

from tpubwa.index.builder import build_index
from tpubwa.io import fastx
from tpubwa.opts import MemOptions
from tpubwa.pipeline import Aligner
from tpubwa.utils import dna


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(404)
    g = rng.integers(0, 4, 30000).astype(np.uint8)
    g[20000:20400] = g[5000:5400]          # a planted duplicate
    idx = build_index([("chrX", dna.decode(g))])
    return idx, Aligner(idx), g


def mixed_records(g, rng, lengths=(76, 100, 151, 250), n=48):
    recs = []
    for i in range(n):
        L = int(lengths[i % len(lengths)])
        p = int(rng.integers(0, len(g) - L))
        frag = g[p:p + L].copy()
        nerr = int(rng.integers(0, 3))
        for q in rng.integers(0, L, nerr):
            frag[q] = (frag[q] + 1 + rng.integers(0, 3)) % 4
        if rng.integers(0, 2):
            frag = dna.revcomp(frag)
        recs.append(fastx.FastxRecord(f"mix_{i}_{p}", dna.decode(frag)))
    return recs


def test_mixed_batch_matches_oracle(world):
    idx, aln, g = world
    recs = mixed_records(g, np.random.default_rng(7))
    batch = fastx.batch_reads(recs)
    assert batch.seqs.shape[1] == 250       # padded to the longest read
    dev = aln.align_se(batch, id0=0)
    want = aln.oracle.align_se(batch, aln.opt, id0=0)
    assert dev == want


def test_mixed_stream_matches_batch(world):
    idx, aln, g = world
    recs = mixed_records(g, np.random.default_rng(8), n=60)
    batches = [fastx.batch_reads(recs[i:i + 20]) for i in range(0, 60, 20)]
    got = "".join(aln.align_se_stream(batches, id0=0))
    want = ""
    n = 0
    for b in batches:
        want += aln.oracle.align_se(b, aln.opt, id0=n)
        n += b.n
    assert got == want


def test_uniform_batch_still_single_dispatch(world):
    idx, aln, g = world
    recs = mixed_records(g, np.random.default_rng(9), lengths=(100,), n=16)
    batch = fastx.batch_reads(recs, max_len=100)
    parts = aln._dispatch_se(batch)
    assert len(parts) == 1 and parts[0][0] is None
    assert aln._finish_se_dispatched(batch, parts, 0) == \
        aln.oracle.align_se(batch, aln.opt, id0=0)
