"""Device seeding (per-end backward search) golden-tested vs the oracle."""
import numpy as np
import pytest

from tpubwa.index.builder import build_index
from tpubwa.index.device import DeviceIndex, occ1, sa_lookup, text_base
from tpubwa.index import fmquery
from tpubwa.io import fastx
from tpubwa.opts import MemOptions
from tpubwa.oracle import Oracle
from tpubwa.seed.device import SeedConfig, collect_smems
from tpubwa.utils import dna

import jax.numpy as jnp

OPT = MemOptions()


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(77)
    # genome with a planted repeat to exercise round-2 re-seeding
    g = rng.integers(0, 4, 12000).astype(np.uint8)
    g[6000:6200] = g[1000:1200]  # 200bp duplicate
    g[9000:9060] = g[2000:2060]  # 60bp duplicate
    genome = dna.decode(g)
    idx = build_index([("chr1", genome)])
    return idx, DeviceIndex.from_host(idx), Oracle(idx), dna.encode(genome)


def test_occ1_matches_host(world):
    idx, didx, orc, fwd = world
    rng = np.random.default_rng(0)
    ks = np.concatenate([
        [-1, 0, 1, idx.primary - 1, idx.primary, idx.primary + 1,
         2 * idx.l_pac],
        rng.integers(0, 2 * idx.l_pac + 1, 64),
    ]).astype(np.int32)
    for c in range(4):
        dev = occ1(didx, jnp.asarray(ks), jnp.full(len(ks), c, jnp.int32))
        host = np.array([fmquery.occ1(idx, int(k), c) for k in ks])
        assert np.array_equal(np.asarray(dev), host), c


def test_sa_lookup_matches_host(world):
    idx, didx, orc, fwd = world
    rng = np.random.default_rng(1)
    ks = rng.integers(1, 2 * idx.l_pac + 1, 128).astype(np.int32)
    dev = sa_lookup(didx, jnp.asarray(ks), jnp.ones(len(ks), bool))
    host = np.array([fmquery.bwt_sa(idx, int(k)) for k in ks])
    assert np.array_equal(np.asarray(dev), host)


def test_text_base(world):
    idx, didx, orc, fwd = world
    pos = np.array([0, 5, idx.l_pac - 1, idx.l_pac, 2 * idx.l_pac - 1],
                   dtype=np.int32)
    dev = np.asarray(text_base(didx, jnp.asarray(pos)))
    host = np.array([idx.get_base(int(p)) for p in pos])
    assert np.array_equal(dev, host)


def _smem_cmp(didx, orc, reads, lens, cfg=None):
    cfg = cfg or SeedConfig(
        min_seed_len=OPT.min_seed_len, split_len=OPT.split_len,
        split_width=OPT.split_width)
    out = collect_smems(didx, jnp.asarray(reads), jnp.asarray(lens), cfg)
    qb, qe = np.asarray(out["qb"]), np.asarray(out["qe"])
    kk, ss = np.asarray(out["k"]), np.asarray(out["s"])
    n, ovf = np.asarray(out["n"]), np.asarray(out["overflow"])
    for b in range(len(reads)):
        host = orc.smems(reads[b][: lens[b]], OPT)  # rows (k, l, s, qb, qe)
        if ovf[b]:
            continue  # capped read: host fallback path
        dev_rows = [
            (int(kk[b, i]), int(ss[b, i]), int(qb[b, i]), int(qe[b, i]))
            for i in range(n[b])
        ]
        host_rows = [
            (int(r[0]), int(r[2]), int(r[3]), int(r[4])) for r in host
        ]
        assert dev_rows == host_rows, f"read {b}"
    return ovf


def test_smems_clean_reads(world):
    idx, didx, orc, fwd = world
    reads = fastx.simulate_reads(fwd, 24, read_len=100, error_rate=0.0, seed=2)
    batch = fastx.batch_reads(reads)
    ovf = _smem_cmp(didx, orc, batch.seqs.astype(np.int32), batch.lens)
    assert not ovf.any()


def test_smems_noisy_reads(world):
    idx, didx, orc, fwd = world
    reads = fastx.simulate_reads(fwd, 32, read_len=100, error_rate=0.03,
                                 seed=3)
    batch = fastx.batch_reads(reads)
    _smem_cmp(didx, orc, batch.seqs.astype(np.int32), batch.lens)


def test_smems_repeat_region(world):
    """Reads from the planted duplicates trigger round-2 re-seeding."""
    idx, didx, orc, fwd = world
    reads = []
    for start in (6000, 6040, 6080, 990, 8990, 9000):
        reads.append(fastx.FastxRecord(f"rep{start}",
                                       dna.decode(fwd[start:start + 100])))
    batch = fastx.batch_reads(reads)
    ovf = _smem_cmp(didx, orc, batch.seqs.astype(np.int32), batch.lens)
    assert not ovf.any()


def test_smems_with_N_and_short(world):
    idx, didx, orc, fwd = world
    r1 = dna.decode(fwd[100:200])
    r1 = r1[:50] + "N" + r1[51:]
    r2 = dna.decode(fwd[300:310])  # shorter than min_seed_len
    r3 = "N" * 30
    batch = fastx.batch_reads([
        fastx.FastxRecord("n1", r1),
        fastx.FastxRecord("short", r2),
        fastx.FastxRecord("alln", r3),
    ])
    ovf = _smem_cmp(didx, orc, batch.seqs.astype(np.int32), batch.lens)
    assert not ovf.any()


def test_smems_mixed_lengths(world):
    idx, didx, orc, fwd = world
    rng = np.random.default_rng(4)
    recs = []
    for i in range(12):
        ln = int(rng.integers(30, 150))
        p = int(rng.integers(0, len(fwd) - ln))
        seq = fwd[p : p + ln].copy()
        for _ in range(int(rng.integers(0, 3))):
            q = int(rng.integers(0, ln))
            seq[q] = (seq[q] + 1) % 4
        recs.append(fastx.FastxRecord(f"m{i}", dna.decode(seq)))
    batch = fastx.batch_reads(recs, max_len=160)
    _smem_cmp(didx, orc, batch.seqs.astype(np.int32), batch.lens)
