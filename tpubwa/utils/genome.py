"""Repeat-rich synthetic genome generator for benchmarks and scale tests.

A uniform-random genome is essentially repeat-free, which flatters an
aligner: no max_occ clipping, no re-seeding, no chain filtering pressure,
no oracle fallbacks. Real genomes are not like that — rRNA operons / IS
elements (bacteria), SINE/LINE interspersed repeats, segmental
duplications, microsatellites and homopolymers (human) drive exactly the
code paths a BWA-MEM-class aligner must get right (2-round re-seeding
[bwa: bwamem.c :: mem_collect_intv], occurrence clipping, chain drops).

This module plants those families at roughly realistic densities, fully
deterministic in the seed, scalable to Gbp sizes (vectorized background +
bounded python loops over repeat events).
"""
from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class RepeatProfile:
    """Densities as fractions of total genome length."""
    sine_density: float = 0.08      # ~300bp interspersed (Alu-like)
    line_density: float = 0.04      # ~6kb interspersed, 5'-truncated
    segdup_density: float = 0.03    # 10-50kb low-divergence duplications
    tandem_density: float = 0.02    # 1-6bp microsatellite expansions
    homopolymer_density: float = 0.005
    n_run_density: float = 0.001    # ambiguity holes (code 4)
    sine_divergence: float = 0.10   # per-copy substitution rate
    line_divergence: float = 0.15
    segdup_divergence: float = 0.015
    gc: float = 0.41


HUMAN = RepeatProfile()
BACTERIAL = RepeatProfile(
    # E. coli-like: 7 rRNA operons ≈ near-identical ~5kb copies, IS elements,
    # modest REP/microsatellite content, no segdups-at-scale
    sine_density=0.01, line_density=0.02, segdup_density=0.01,
    tandem_density=0.005, homopolymer_density=0.003, n_run_density=0.0,
    sine_divergence=0.03, line_divergence=0.01, segdup_divergence=0.005,
    gc=0.50)


def _rand_bases(rng: np.random.Generator, n: int, gc: float) -> np.ndarray:
    p = np.array([(1 - gc) / 2, gc / 2, gc / 2, (1 - gc) / 2])
    return rng.choice(4, size=n, p=p).astype(np.uint8)


def _mutate_copy(rng: np.random.Generator, seq: np.ndarray,
                 rate: float) -> np.ndarray:
    if rate <= 0:
        return seq
    out = seq.copy()
    m = rng.random(len(out)) < rate
    out[m] = (out[m] + rng.integers(1, 4, int(m.sum()))) % 4
    return out


def _plant_interspersed(rng, genome, consensus, density, divergence,
                        min_frac=0.4):
    """Paste diverged (possibly truncated) copies of one consensus until
    ~density of the genome is covered. Returns bases planted."""
    n = len(genome)
    target = int(n * density)
    planted = 0
    L = len(consensus)
    while planted < target:
        frac = min_frac + (1 - min_frac) * rng.random()
        m = max(20, int(L * frac))
        start = int(rng.integers(0, max(n - m, 1)))
        copy = _mutate_copy(rng, consensus[L - m:], divergence)
        if rng.random() < 0.5:  # strand
            copy = (3 - copy[::-1]).astype(np.uint8)
        genome[start:start + m] = copy[: n - start]
        planted += m
    return planted


def synthetic_genome(n: int, seed: int = 0,
                     profile: RepeatProfile = HUMAN,
                     chunk: int = 1 << 26) -> np.ndarray:
    """uint8 codes 0..3 (4 = N run) of length n, deterministic in seed."""
    rng = np.random.default_rng(seed)
    genome = np.empty(n, dtype=np.uint8)
    for i in range(0, n, chunk):
        genome[i:i + chunk] = _rand_bases(rng, min(chunk, n - i), profile.gc)

    # interspersed families (each family one consensus -> many copies)
    if profile.sine_density > 0:
        sine = _rand_bases(rng, 300, 0.55)
        _plant_interspersed(rng, genome, sine, profile.sine_density,
                            profile.sine_divergence)
    if profile.line_density > 0:
        line = _rand_bases(rng, 6000, 0.42)
        _plant_interspersed(rng, genome, line, profile.line_density,
                            profile.line_divergence, min_frac=0.05)

    # microsatellite expansions
    target = int(n * profile.tandem_density)
    planted = 0
    while planted < target:
        motif = _rand_bases(rng, int(rng.integers(1, 7)), 0.5)
        reps = int(rng.integers(10, 60))
        arr = np.tile(motif, reps)
        start = int(rng.integers(0, max(n - len(arr), 1)))
        genome[start:start + len(arr)] = arr[: n - start]
        planted += len(arr)

    # homopolymers
    target = int(n * profile.homopolymer_density)
    planted = 0
    while planted < target:
        m = int(rng.integers(8, 31))
        start = int(rng.integers(0, max(n - m, 1)))
        genome[start:start + m] = rng.integers(0, 4)
        planted += m

    # segmental duplications (copy spans of the already-assembled genome)
    target = int(n * profile.segdup_density)
    planted = 0
    while planted < target and n > 200_000:
        m = int(rng.integers(10_000, 50_001))
        src = int(rng.integers(0, n - m))
        dst = int(rng.integers(0, n - m))
        genome[dst:dst + m] = _mutate_copy(rng, genome[src:src + m].copy(),
                                           profile.segdup_divergence)
        planted += m

    # N runs last (holes survive everything)
    target = int(n * profile.n_run_density)
    planted = 0
    while planted < target:
        m = int(rng.integers(100, 10_001))
        start = int(rng.integers(0, max(n - m, 1)))
        genome[start:start + m] = 4
        planted += m
    return genome
