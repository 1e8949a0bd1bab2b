"""LUT-based per-end SMEM seeding golden-tested vs the oracle.

Covers: k-mer table correctness, SMEM-set parity (incl. round-2 re-seeding
on planted repeats), s==1 position resolution, N bases, short reads, and
seeds_from_smems consuming the pre-resolved positions.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from tpubwa.chain.device import ChainConfig, seeds_from_smems
from tpubwa.index import fmquery
from tpubwa.index.builder import build_index
from tpubwa.index.device import DeviceIndex
from tpubwa.io import fastx
from tpubwa.opts import MemOptions
from tpubwa.oracle import Oracle
from tpubwa.seed.lut import (KmerLUT, LutSeedConfig, build_kmer_lut_arrays,
                             collect_smems_lut, default_k0)
from tpubwa.utils import dna

OPT = MemOptions()


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(77)
    g = rng.integers(0, 4, 12000).astype(np.uint8)
    g[6000:6200] = g[1000:1200]  # 200bp duplicate (round-2 trigger)
    g[9000:9060] = g[2000:2060]  # 60bp duplicate
    genome = dna.decode(g)
    idx = build_index([("chr1", genome)])
    lut = KmerLUT.build(idx, min_seed_len=OPT.min_seed_len)
    return idx, DeviceIndex.from_host(idx), Oracle(idx), dna.encode(genome), lut


def test_lut_arrays_match_scalar_fm(world):
    idx, didx, orc, fwd, lut = world
    k0 = 4
    K, S, P = build_kmer_lut_arrays(idx, k0)
    rng = np.random.default_rng(3)
    for code in rng.integers(0, 4 ** k0, 40):
        kmer = [(int(code) >> (2 * (k0 - 1 - i))) & 3 for i in range(k0)]
        # scalar backward search, right-to-left
        k = int(idx.L2[kmer[-1]]) + 1
        s = int(idx.L2[kmer[-1] + 1] - idx.L2[kmer[-1]])
        for c in kmer[-2::-1]:
            if s <= 0:
                break
            lo = fmquery.occ1(idx, k - 1, c)
            hi = fmquery.occ1(idx, k - 1 + s, c)
            k = int(idx.L2[c]) + 1 + lo
            s = hi - lo
        s = max(s, 0)
        assert S[code] == s, code
        if s > 0:
            assert K[code] == k, code
        if s == 1:
            assert P[code] == fmquery.bwt_sa(idx, k), code


def _cmp_smems(didx, lut, orc, idx, reads, lens, cfg=None):
    cfg = cfg or LutSeedConfig(
        min_seed_len=OPT.min_seed_len, split_len=OPT.split_len,
        split_width=OPT.split_width)
    out = collect_smems_lut(didx, lut, jnp.asarray(reads), jnp.asarray(lens),
                            cfg)
    qb, qe = np.asarray(out["qb"]), np.asarray(out["qe"])
    kk, ss = np.asarray(out["k"]), np.asarray(out["s"])
    pp = np.asarray(out["pos"])
    n, ovf = np.asarray(out["n"]), np.asarray(out["overflow"])
    n_checked = 0
    for b in range(len(reads)):
        if ovf[b]:
            continue  # capped read: host fallback path
        host = orc.smems(reads[b][: lens[b]], OPT)  # rows (k, l, s, qb, qe)
        host_rows = [(int(r[2]), int(r[3]), int(r[4]), int(r[0]))
                     for r in host]  # (s, qb, qe, k)
        assert n[b] == len(host_rows), (b, n[b], host_rows)
        for i, (hs, hqb, hqe, hk) in enumerate(host_rows):
            assert (int(ss[b, i]), int(qb[b, i]), int(qe[b, i])) == \
                (hs, hqb, hqe), (b, i)
            if pp[b, i] >= 0:
                # resolved position must equal SA[k_oracle] (unique hit)
                assert hs == 1, (b, i)
                assert int(pp[b, i]) == fmquery.bwt_sa(idx, hk), (b, i)
            else:
                assert int(kk[b, i]) == hk, (b, i)
        n_checked += 1
    return n_checked


def test_smems_random_reads(world):
    idx, didx, orc, fwd, lut = world
    rng = np.random.default_rng(5)
    B, L = 48, 100
    starts = rng.integers(0, len(fwd) - L, B)
    reads = np.stack([fwd[s:s + L] for s in starts]).astype(np.int32)
    mut = rng.random(reads.shape) < 0.03
    reads = np.where(mut, (reads + rng.integers(1, 4, reads.shape)) % 4,
                     reads).astype(np.int32)
    lens = np.full(B, L, np.int32)
    assert _cmp_smems(didx, lut, orc, idx, reads, lens) > B // 2


def test_smems_repeat_reads_trigger_round2(world):
    idx, didx, orc, fwd, lut = world
    # reads from inside the planted 200bp duplicate: SMEMs there have occ 2.
    # Every lane here walks the FM loop (s stays 2 across the repeat), so
    # widen the dense budget — real batches mix repeat and unique reads,
    # and budget overflow correctly falls back to the oracle.
    B, L = 16, 100
    reads = np.stack([fwd[1000 + 7 * i: 1000 + 7 * i + L]
                      for i in range(B)]).astype(np.int32)
    lens = np.full(B, L, np.int32)
    cfg = LutSeedConfig(min_seed_len=OPT.min_seed_len,
                        split_len=OPT.split_len,
                        split_width=OPT.split_width, fm_dense=1)
    assert _cmp_smems(didx, lut, orc, idx, reads, lens, cfg) == B


def test_smems_with_ns_and_short_reads(world):
    idx, didx, orc, fwd, lut = world
    rng = np.random.default_rng(9)
    L = 80
    reads = np.full((6, L), 4, np.int32)
    lens = np.zeros(6, np.int32)
    r0 = fwd[200:280].astype(np.int32)
    reads[0, :L], lens[0] = r0, L                      # clean
    reads[1, :L], lens[1] = r0, L
    reads[1, 40] = 4                                   # N mid-read
    reads[2, :L], lens[2] = r0, L
    reads[2, :6] = 4                                   # N head
    reads[3, :10], lens[3] = fwd[300:310], 10          # shorter than k0
    reads[4, :30], lens[4] = fwd[400:430], 30          # short but seedable
    reads[5, :L] = rng.integers(0, 4, L)               # random (few SMEMs)
    lens[5] = L
    assert _cmp_smems(didx, lut, orc, idx, reads, lens) == 6


def test_seeds_use_resolved_positions(world):
    idx, didx, orc, fwd, lut = world
    rng = np.random.default_rng(12)
    B, L = 24, 100
    starts = rng.integers(0, len(fwd) - L, B)
    reads = np.stack([fwd[s:s + L] for s in starts]).astype(np.int32)
    lens = np.full(B, L, np.int32)
    cfg = LutSeedConfig(min_seed_len=OPT.min_seed_len,
                        split_len=OPT.split_len, split_width=OPT.split_width)
    sm = collect_smems_lut(didx, lut, jnp.asarray(reads), jnp.asarray(lens),
                           cfg)
    ccfg = ChainConfig()
    seeds = seeds_from_smems(didx, sm, ccfg)
    rbeg = np.asarray(seeds["rbeg"])
    valid = np.asarray(seeds["valid"])
    qbeg = np.asarray(seeds["qbeg"])
    slen = np.asarray(seeds["len"])
    ovf = np.asarray(seeds["overflow"])
    # every valid seed's reference window must equal the read window
    for b in range(B):
        if ovf[b]:
            continue
        for t in range(valid.shape[1]):
            if not valid[b, t]:
                continue
            ref = idx.get_seq(rbeg[b, t], rbeg[b, t] + slen[b, t])
            np.testing.assert_array_equal(
                ref.astype(np.int32),
                reads[b, qbeg[b, t]: qbeg[b, t] + slen[b, t]], err_msg=f"{b},{t}")


def test_default_k0_clamps(world):
    idx, _, _, _, _ = world
    assert default_k0(idx, 19) <= 12
    assert default_k0(idx, 7) == 7
