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
    import scale_common as SC
    from tpubwa.seed.lut import KmerLUT
    from tpubwa.opts import MemOptions

    mbp = int(sys.argv[1]) if len(sys.argv) > 1 else 3100
    g = SC.get_genome(mbp, verbose=True)
    idx = SC.get_index(mbp, g, verbose=True)

    t0 = time.time()
    KmerLUT.build(idx, min_seed_len=MemOptions().min_seed_len,
                  cache=SC.lut_cache_path(mbp))
    print(f"lut built {time.time() - t0:.0f}s", flush=True)
    print("scale_prepare done")


if __name__ == "__main__":
    main()
