"""Shared genome/index/LUT cache logic for the scale scripts.

scale_prepare.py (CPU, build-only) and scale_bench.py (TPU, load+bench)
MUST agree on cache filenames, the genome seed, and the profile cutoff —
a drift would silently bench a different genome than was prepared.  Both
import from here.
"""
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
BUILD = REPO / "build"
GENOME_SEED = 7
HUMAN_PROFILE_MIN_MBP = 32


def cache_paths(glen: int):
    BUILD.mkdir(exist_ok=True)
    return (BUILD / f"scale_index_hard_{glen}.npz",
            BUILD / f"scale_genome_hard_{glen}.npy",
            BUILD / f"scale_lut_hard_{glen}.npz")


def get_genome(mbp: int, costs: dict | None = None, verbose=False):
    """Load or build+cache the scale genome; returns a (possibly mmapped)
    uint8 code array."""
    import numpy as np
    from tpubwa.utils import genome
    glen = mbp * 1_000_000
    _, gcache, _ = cache_paths(glen)
    t0 = time.time()
    if not gcache.exists():
        profile = (genome.HUMAN if mbp >= HUMAN_PROFILE_MIN_MBP
                   else genome.BACTERIAL)
        g = genome.synthetic_genome(glen, seed=GENOME_SEED, profile=profile)
        np.save(gcache, g)
        if verbose:
            print(f"genome built {time.time() - t0:.0f}s", flush=True)
    if costs is not None:
        costs["genome_s"] = round(time.time() - t0, 1)
    return np.load(gcache, mmap_mode="r")


def get_index(mbp: int, g, costs: dict | None = None, verbose=False):
    """Load or build+cache the FM-index for the scale genome."""
    import numpy as np
    import resource
    from tpubwa.index.builder import FMIndex, build_index
    glen = mbp * 1_000_000
    cache, _, _ = cache_paths(glen)
    costs = costs if costs is not None else {}
    t0 = time.time()
    if cache.exists():
        idx = FMIndex.load(cache)
        costs["index_load_s"] = round(time.time() - t0, 1)
        if verbose:
            print(f"index loaded {time.time() - t0:.0f}s", flush=True)
    else:
        idx = build_index([("scale_synth", np.asarray(g))])
        costs["index_build_s"] = round(time.time() - t0, 1)
        costs["index_build_rss_gb"] = round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 1)
        if verbose:
            print(f"index built {time.time() - t0:.0f}s", flush=True)
        t0 = time.time()
        idx.save(cache)
        costs["index_save_s"] = round(time.time() - t0, 1)
        if verbose:
            print(f"index saved {time.time() - t0:.0f}s", flush=True)
    return idx


def lut_cache_path(mbp: int) -> Path:
    return cache_paths(mbp * 1_000_000)[2]
