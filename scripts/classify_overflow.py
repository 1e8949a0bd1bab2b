"""Classify WHICH cap drives tier-1/tier-2 overflow at genome scale.

For a sample of simulated reads on the (cached) scale genome, computes the
oracle's per-read SMEM / seed / chain counts and compares them against
tier-1 and tier-2 cap sets — the data that decides where the fallback
burn-down effort goes (VERDICT r4 item 2).

Runs CPU-only (oracle + host index): JAX_PLATFORMS=cpu recommended so it
can overlap a TPU bench.

Usage: python scripts/classify_overflow.py [n_reads] [genome_mbp]
"""
import json
import sys
from collections import Counter
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import numpy as np


def main():
    import scale_common as SC
    from tpubwa.io import fastx
    from tpubwa.opts import MemOptions
    from tpubwa.oracle import Oracle

    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    mbp = int(sys.argv[2]) if len(sys.argv) > 2 else 3100
    print("loading genome...", flush=True)
    g = SC.get_genome(mbp)
    print("loading index...", flush=True)
    idx = SC.get_index(mbp, g)
    print("native oracle init...", flush=True)
    orc = Oracle(idx)
    opt = MemOptions()

    print("simulating reads...", flush=True)
    recs = fastx.simulate_reads(np.asarray(g), n_reads, read_len=100,
                                error_rate=0.01, indel_rate=0.001, seed=3)
    bb = fastx.batch_reads(recs, max_len=100)
    print("classifying...", flush=True)

    import os
    fast = os.environ.get("TPUBWA_CLASSIFY_FAST", "1") == "1"
    T1 = dict(smems=32, seeds=128, chains=32, regs=32)
    T2 = dict(smems=63, seeds=640, chains=64, regs=63)
    c = Counter()
    seed_tot = []
    for i in range(bb.n):
        seq = bb.seqs[i][: bb.lens[i]]
        sm = orc.smems(seq, opt)                # rows: qb, qe, k, s
        occ = np.minimum(sm[:, 3], opt.max_occ) if len(sm) else np.array([])
        n_smem = len(sm)
        n_seed = int(occ.sum()) if len(sm) else 0
        if fast:
            # chains/regs caps almost never bind alone; smem+seed counts
            # are enough to size tier caps and cost pennies per read
            n_chain = n_reg = 0
        else:
            n_chain = len(orc.chains(seq, opt, filtered=False))
            n_reg = len(orc.regs_pre(seq, opt)[0])
        seed_tot.append(n_seed)
        over1 = (n_smem > T1["smems"] or n_seed > T1["seeds"]
                 or n_chain > T1["chains"] or n_reg > T1["regs"])
        over2 = (n_smem > T2["smems"] or n_seed > T2["seeds"]
                 or n_chain > T2["chains"] or n_reg > T2["regs"])
        if over1:
            c["tier1_overflow"] += 1
        if over2:
            c["tier2_overflow"] += 1
            for k, cap in T2.items():
                v = dict(smems=n_smem, seeds=n_seed, chains=n_chain,
                         regs=n_reg)[k]
                if v > cap:
                    c[f"t2_cap_{k}"] += 1
        if (i + 1) % 256 == 0:
            print(f"  {i + 1}/{bb.n}", flush=True)
    st = np.array(seed_tot)
    out = {
        "n_reads": bb.n, "genome_mbp": mbp,
        **{k: int(v) for k, v in sorted(c.items())},
        "seed_count_p50": int(np.percentile(st, 50)),
        "seed_count_p90": int(np.percentile(st, 90)),
        "seed_count_p99": int(np.percentile(st, 99)),
        "seed_count_max": int(st.max()),
        "t2_need_seeds_cap_for_99pct": int(np.percentile(st, 99)),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
