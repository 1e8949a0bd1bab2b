"""Benchmark harness: single-chip alignment throughput (BASELINE config 1).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline", ...} where
the extra keys record workload honesty (oracle-fallback %, phase split,
device-busy estimate).

Baseline: a 32-core CPU bwa-mem node aligns 100bp reads at roughly
250k reads/s (0.6-0.9 Mbp/s/core x 32, the usual 30x-WGS-in-~30-CPU-hours
figure); vs_baseline = our reads/s divided by that.

Workload: a repeat-rich 4.6 Mbp bacterial-profile genome (rRNA-operon-like
near-identical multi-kb copies, IS elements, microsatellites, homopolymers
— tpubwa.utils.genome) with 1% substitution and 0.1% indel errors in the
reads, so max_occ clipping / re-seeding / gap alignment / oracle fallback
are all exercised. Index + LUT are built once and cached in build/.
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
BATCH = int(os.environ.get("TPUBWA_BENCH_BATCH", 4096))
TIMED_BATCHES = int(os.environ.get("TPUBWA_BENCH_TIMED", 8))
N_READS = BATCH * (TIMED_BATCHES + 1)
ERROR_RATE = 0.01
INDEL_RATE = 0.001


def get_index():
    import numpy as np
    from tpubwa.index.builder import FMIndex, build_index
    from tpubwa.utils import dna, genome

    from tpubwa.index.builder import DEFAULT_SA_INTV
    cache = REPO / "build" / \
        f"bench_index_hard_{GENOME_LEN}_sa{DEFAULT_SA_INTV}.npz"
    if cache.exists():
        return FMIndex.load(cache)
    g = genome.synthetic_genome(GENOME_LEN, seed=2024,
                                profile=genome.BACTERIAL)
    idx = build_index([("U00096_synth", dna.decode(g))])
    cache.parent.mkdir(exist_ok=True)
    idx.save(cache)
    return idx


def main():
    import numpy as np
    import jax
    from tpubwa.io import fastx
    from tpubwa.opts import MemOptions
    from tpubwa.pipeline import Aligner

    t0 = time.time()
    idx = get_index()
    aln = Aligner(idx, MemOptions(),
                  lut_cache=REPO / "build" / f"bench_lut_hard_{GENOME_LEN}.npz")
    fwd = idx.get_seq(0, idx.l_pac).astype(np.uint8)
    recs = fastx.simulate_reads(fwd, N_READS, read_len=READ_LEN,
                                error_rate=ERROR_RATE,
                                indel_rate=INDEL_RATE, seed=7)
    batches = [fastx.batch_reads(recs[i:i + BATCH], max_len=READ_LEN)
               for i in range(0, N_READS, BATCH)]
    # warm-up: compile the device pipeline
    _ = aln.align_se(batches[0], id0=0)
    t1 = time.time()

    # ---- timed, pipelined run ----
    aln.stats = {"reads": 0, "fallback_reads": 0}
    n = sum(b.n for b in batches[1:])
    sams = list(aln.align_se_stream(batches[1:], id0=batches[0].n))
    dt = time.time() - t1
    assert sum(s.count("\n") for s in sams) >= n
    rps = n / dt
    fb_pct = 100.0 * aln.stats["fallback_reads"] / max(aln.stats["reads"], 1)

    # ---- phase split (non-overlapped, one batch): device vs transfer vs
    # host finish; device_busy = device share of the pipelined wall time
    b = batches[1]
    seqs, lens = np.asarray(b.seqs), np.asarray(b.lens)
    td0 = time.time()
    dev = aln.worker1_packed(seqs, lens)
    jax.block_until_ready(dev)
    t_dev = time.time() - td0
    tt0 = time.time()
    buf = np.asarray(dev)
    t_xfer = time.time() - tt0
    th0 = time.time()
    _ = aln._finish_se_buf(b, buf, id0=0)
    t_host = time.time() - th0
    busy = min(100.0, 100.0 * t_dev / (dt / TIMED_BATCHES))

    # ---- paired-end throughput (BASELINE config 2: PE 150bp) ----
    PE_BATCH = 2048            # pairs
    pe_recs = fastx.simulate_reads(
        fwd, 2 * PE_BATCH * 3, read_len=150, paired=True, error_rate=0.01,
        indel_rate=0.001, seed=11, insert_mean=400, insert_std=50)
    pe_batches = [fastx.batch_reads(pe_recs[i:i + 2 * PE_BATCH],
                                    max_len=150)
                  for i in range(0, len(pe_recs), 2 * PE_BATCH)]
    _ = aln.align_pe(pe_batches[0], id0=0)      # compile
    aln.stats = {"reads": 0, "fallback_reads": 0}
    tp0 = time.time()
    pe_out = list(aln.align_pe_stream(pe_batches[1:], id0=PE_BATCH))
    pe_dt = time.time() - tp0
    pe_n = sum(b.n for b in pe_batches[1:])
    assert sum(s.count("\n") for s in pe_out) >= pe_n
    pe_rps = pe_n / pe_dt
    pe_fb = 100.0 * aln.stats["fallback_reads"] / max(aln.stats["reads"], 1)

    print(json.dumps({
        "metric": "se_100bp_reads_per_s_per_chip",
        "value": round(rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(rps / BASELINE_READS_PER_S, 4),
        "workload": "repeat-rich 4.6Mbp, 1% sub + 0.1% indel errors",
        "fallback_pct": round(fb_pct, 3),
        "phase_s_per_batch": {"device": round(t_dev, 4),
                              "transfer": round(t_xfer, 4),
                              "host_finish": round(t_host, 4)},
        "device_busy_pct": round(busy, 1),
        "pe_150bp_reads_per_s": round(pe_rps, 1),
        "pe_fallback_pct": round(pe_fb, 3),
        "setup_s": round(t1 - t0, 1),
    }))
    print(f"# setup {t1 - t0:.1f}s, timed {n} reads in {dt:.2f}s, "
          f"platform={jax.devices()[0].platform}", file=sys.stderr)


if __name__ == "__main__":
    main()
