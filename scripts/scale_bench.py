"""Config-3 scale check: chr20-sized genome (64 Mbp), single chip.

Builds (and caches) a synthetic 64 Mbp index via the native SA-IS builder,
aligns simulated reads through the full device pipeline, verifies positions
against the simulation truth, and prints a JSON throughput line.

Usage: python scripts/scale_bench.py [n_reads] [genome_mbp]
"""
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    import numpy as np
    from tpubwa.index.builder import FMIndex, build_index, DEFAULT_SA_INTV
    from tpubwa.io import fastx
    from tpubwa.opts import MemOptions
    from tpubwa.pipeline import Aligner
    from tpubwa.utils import dna

    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    mbp = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    glen = mbp * 1_000_000
    cache = REPO / "build" / f"scale_index_{glen}_sa{DEFAULT_SA_INTV}.npz"
    t0 = time.time()
    if cache.exists():
        idx = FMIndex.load(cache)
        print(f"# index loaded {time.time()-t0:.0f}s", file=sys.stderr)
    else:
        rng = np.random.default_rng(7)
        genome = dna.decode(rng.integers(0, 4, glen).astype(np.uint8))
        idx = build_index([("chr20_synth", genome)])
        idx.save(cache)
        print(f"# index built {time.time()-t0:.0f}s ({mbp} Mbp)",
              file=sys.stderr)
    aln = Aligner(idx, MemOptions())
    fwd = idx.get_seq(0, idx.l_pac).astype(np.uint8)
    recs = fastx.simulate_reads(fwd, n_reads, read_len=100, error_rate=0.01,
                                seed=3)
    B = 4096
    batches = [fastx.batch_reads(recs[i:i + B], max_len=100)
               for i in range(0, n_reads, B)]
    _ = aln.align_se(batches[0], id0=0)  # compile
    t1 = time.time()
    n = 0
    n_correct = 0
    n_total = 0
    for b in batches:
        sam = aln.align_se(b, id0=n)
        n += b.n
        for line in sam.strip().split("\n"):
            f = line.split("\t")
            if int(f[1]) & (0x100 | 0x800):
                continue
            n_total += 1
            true_pos = int(f[0].split("_")[2])
            lead = int(f[5].split("S")[0]) if "S" in f[5].split("M")[0] else 0
            if int(f[3]) == true_pos + 1 + lead:
                n_correct += 1
    dt = time.time() - t1
    print(json.dumps({
        "metric": f"se_100bp_reads_per_s_chr20scale_{mbp}mbp",
        "value": round(n / dt, 1),
        "unit": "reads/s",
        "accuracy": round(n_correct / max(n_total, 1), 4),
    }))
    print(f"# {n} reads in {dt:.1f}s; {n_correct}/{n_total} at truth pos",
          file=sys.stderr)


if __name__ == "__main__":
    main()
