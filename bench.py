"""Benchmark harness: single-chip alignment throughput (BASELINE config 1).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: a 32-core CPU bwa-mem node aligns 100bp reads at roughly
250k reads/s (0.6-0.9 Mbp/s/core x 32, the usual 30x-WGS-in-~30-CPU-hours
figure); vs_baseline = our reads/s divided by that. The E.coli-scale
synthetic index (4.6 Mbp) is built once and cached in build/.
"""
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

BASELINE_READS_PER_S = 250_000.0
GENOME_LEN = 4_600_000
READ_LEN = 100
BATCH = 4096
TIMED_BATCHES = 5            # distinct batches, streamed (pipelined)
N_READS = BATCH * (TIMED_BATCHES + 1)


def get_index():
    import numpy as np
    from tpubwa.index.builder import FMIndex, build_index
    from tpubwa.utils import dna

    from tpubwa.index.builder import DEFAULT_SA_INTV
    cache = REPO / "build" / f"bench_index_{GENOME_LEN}_sa{DEFAULT_SA_INTV}.npz"
    if cache.exists():
        return FMIndex.load(cache)
    rng = np.random.default_rng(2024)
    genome = dna.decode(rng.integers(0, 4, GENOME_LEN).astype(np.uint8))
    idx = build_index([("U00096_synth", genome)])
    cache.parent.mkdir(exist_ok=True)
    idx.save(cache)
    return idx


def main():
    import numpy as np
    import jax
    from tpubwa.io import fastx
    from tpubwa.opts import MemOptions
    from tpubwa.pipeline import Aligner
    from tpubwa.utils import dna

    t0 = time.time()
    idx = get_index()
    aln = Aligner(idx, MemOptions(),
                  lut_cache=REPO / "build" / f"bench_lut_{GENOME_LEN}.npz")
    fwd = idx.get_seq(0, idx.l_pac).astype(np.uint8)
    recs = fastx.simulate_reads(fwd, N_READS, read_len=READ_LEN,
                                error_rate=0.01, seed=7)
    batches = [fastx.batch_reads(recs[i:i + BATCH], max_len=READ_LEN)
               for i in range(0, N_READS, BATCH)]
    # warm-up: compile the device pipeline
    _ = aln.align_se(batches[0], id0=0)
    t1 = time.time()
    n = sum(b.n for b in batches[1:])
    sams = list(aln.align_se_stream(batches[1:], id0=batches[0].n))
    dt = time.time() - t1
    assert sum(s.count("\n") for s in sams) >= n
    rps = n / dt
    print(json.dumps({
        "metric": "se_100bp_reads_per_s_per_chip",
        "value": round(rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(rps / BASELINE_READS_PER_S, 4),
    }))
    print(f"# setup {t1 - t0:.1f}s, timed {n} reads in {dt:.2f}s, "
          f"platform={jax.devices()[0].platform}", file=sys.stderr)


if __name__ == "__main__":
    main()
