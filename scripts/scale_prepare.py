"""Build (and cache) the scale-config genome, FM-index, and k-mer LUT
WITHOUT touching the TPU, so scale_bench.py later only loads.

Run with JAX_PLATFORMS=cpu so it can overlap a TPU-bound bench process
(the TPU runtime is exclusive per process).

Usage: JAX_PLATFORMS=cpu python scripts/scale_prepare.py [genome_mbp]
"""
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    import numpy as np
    from tpubwa.index.builder import FMIndex, build_index
    from tpubwa.seed.lut import KmerLUT
    from tpubwa.opts import MemOptions
    from tpubwa.utils import genome

    mbp = int(sys.argv[1]) if len(sys.argv) > 1 else 3100
    glen = mbp * 1_000_000
    build_dir = REPO / "build"
    build_dir.mkdir(exist_ok=True)
    cache = build_dir / f"scale_index_hard_{glen}.npz"
    gcache = build_dir / f"scale_genome_hard_{glen}.npy"

    t0 = time.time()
    if not gcache.exists():
        profile = genome.HUMAN if mbp >= 32 else genome.BACTERIAL
        g = genome.synthetic_genome(glen, seed=7, profile=profile)
        np.save(gcache, g)
        print(f"genome built {time.time() - t0:.0f}s", flush=True)
    g = np.load(gcache, mmap_mode="r")

    t0 = time.time()
    if cache.exists():
        idx = FMIndex.load(cache)
        print(f"index loaded {time.time() - t0:.0f}s", flush=True)
    else:
        idx = build_index([("scale_synth", np.asarray(g))])
        print(f"index built {time.time() - t0:.0f}s", flush=True)
        t0 = time.time()
        idx.save(cache)
        print(f"index saved {time.time() - t0:.0f}s", flush=True)

    t0 = time.time()
    KmerLUT.build(idx, min_seed_len=MemOptions().min_seed_len,
                  cache=build_dir / f"scale_lut_hard_{glen}.npz")
    print(f"lut built {time.time() - t0:.0f}s", flush=True)
    print("scale_prepare done")


if __name__ == "__main__":
    main()
