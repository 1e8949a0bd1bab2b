"""Config-3/4 scale check: large-genome alignment through the PRODUCTION
device path, with byte-exact oracle SAM parity.

Builds (and caches) a repeat-rich synthetic genome + FM-index at the
requested scale — up to GRCh38 size (3100 Mbp forward = 6.2e9 text, int64
device coordinates) — via the native memory-lean SA-IS, aligns simulated
reads through the full device pipeline, byte-compares the SAM against the
scalar C++ oracle, and prints ONE JSON line with throughput, parity, and
build-cost numbers (VERDICT r2 items 1 and 9).

Usage: python scripts/scale_bench.py [n_reads] [genome_mbp]
  e.g.  python scripts/scale_bench.py 8192 64        # chr20-scale
        python scripts/scale_bench.py 8192 3100      # GRCh38-scale
"""
import json
import resource
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    import numpy as np
    import scale_common as SC
    from tpubwa.io import fastx
    from tpubwa.opts import MemOptions
    from tpubwa.pipeline import Aligner

    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    mbp = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    costs = {}
    g = SC.get_genome(mbp, costs)
    idx = SC.get_index(mbp, g, costs)

    t0 = time.time()
    aln = Aligner(idx, MemOptions(), lut_cache=SC.lut_cache_path(mbp))
    costs["aligner_init_s"] = round(time.time() - t0, 1)  # LUT + device put

    # simulate from the raw genome codes (N runs included) — no 2*l_pac
    # get_seq materialization at Gbp scale
    recs = fastx.simulate_reads(np.asarray(g), n_reads, read_len=100,
                                error_rate=0.01, indel_rate=0.001, seed=3)
    B = 4096
    batches = [fastx.batch_reads(recs[i:i + B], max_len=100)
               for i in range(0, n_reads, B)]
    t0 = time.time()
    _ = aln.align_se(batches[0], id0=0)  # compile
    costs["compile_s"] = round(time.time() - t0, 1)

    t1 = time.time()
    aln.stats = {"reads": 0, "fallback_reads": 0}
    # streamed: tier-2 dispatches and host-oracle fallback overlap the
    # next batch's device work, as in the production CLI path
    sams = []
    n = 0
    for sam in aln.align_se_stream(batches, id0=0):
        sams.append(sam)
        n += sam.count("\n")
        print(f"  batch done: {n} records, {time.time() - t1:.1f}s",
              file=sys.stderr, flush=True)
    dt = time.time() - t1

    # ---- oracle SAM parity (byte-exact) on a prefix of the read set ----
    n_par = min(n_reads, 2048)
    t0 = time.time()
    mism = 0
    checked = 0
    got_lines = "".join(sams).splitlines(True)
    # regroup oracle comparison per batch to reuse id0 numbering
    off = 0
    want_parts = []
    for b in batches:
        if off >= n_par:
            break
        sub = fastx.batch_reads(recs[off:off + min(b.n, n_par - off)],
                                max_len=100)
        want_parts.append(aln.oracle.align_se(sub, aln.opt, id0=off))
        off += sub.n
    want_lines = "".join(want_parts).splitlines(True)
    for wl in want_lines:
        if checked >= len(got_lines) or got_lines[checked] != wl:
            mism += 1
        checked += 1
    costs["parity_s"] = round(time.time() - t0, 1)
    fb = 100.0 * aln.stats["fallback_reads"] / max(aln.stats["reads"], 1)

    print(json.dumps({
        "metric": f"se_100bpreads_per_s_{mbp}mbp_repeatrich",
        "value": round(n / dt, 1),
        "unit": "reads/s",
        "genome_mbp": mbp,
        "pos_dtype": "int64" if 2 * idx.l_pac >= 2**31 else "int32",
        "parity_lines_checked": checked,
        "parity_mismatches": mism,
        "fallback_pct": round(fb, 2),
        "peak_rss_gb": round(rss_gb(), 1),
        "costs": costs,
    }), flush=True)
    print(f"# {n} reads in {dt:.1f}s; parity {checked - mism}/{checked}",
          file=sys.stderr)

    # ---- optional PE row (config 4's paired-end flow at genome scale) ----
    import os
    if os.environ.get("TPUBWA_SCALE_PE"):
        PE_PAIRS = 1024
        pe_recs = fastx.simulate_reads(
            np.asarray(g), 2 * PE_PAIRS * 2, read_len=150, paired=True,
            error_rate=0.01, indel_rate=0.001, seed=5, insert_mean=400,
            insert_std=50)
        pb = [fastx.batch_reads(pe_recs[i:i + 2 * PE_PAIRS], max_len=150)
              for i in range(0, len(pe_recs), 2 * PE_PAIRS)]
        t0 = time.time()
        _ = aln.align_pe(pb[0], id0=0)            # compile
        pe_compile = round(time.time() - t0, 1)
        aln.stats = {"reads": 0, "fallback_reads": 0}
        t0 = time.time()
        out = aln.align_pe(pb[1], id0=PE_PAIRS)
        pe_dt = time.time() - t0
        assert out.count("\n") >= pb[1].n
        pe_fb = 100.0 * aln.stats["fallback_reads"] / max(
            aln.stats["reads"], 1)
        print(json.dumps({
            "metric": f"pe_150bpreads_per_s_{mbp}mbp_repeatrich",
            "value": round(pb[1].n / pe_dt, 1),
            "unit": "reads/s",
            "genome_mbp": mbp,
            "pe_fallback_pct": round(pe_fb, 2),
            "pe_compile_s": pe_compile,
        }), flush=True)


if __name__ == "__main__":
    main()
