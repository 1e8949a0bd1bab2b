"""Tier-1 seeding-budget tuner: for each candidate LutSeedConfig variant,
measure (a) steady-state worker1_packed wall time and (b) tier-1 overflow
count on the bench workload — the two sides of the tier-2 tradeoff
(overflowed reads cost a big-caps device re-run, ~0.45 s/batch).

Usage: python scripts/tune_budgets.py [batch] [variant ...]
  variant syntax: name=val,name=val (LutSeedConfig field overrides)
  default sweep if no variants given.
"""
import dataclasses
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import bench as B
    from tpubwa.io import fastx
    from tpubwa.opts import MemOptions
    from tpubwa.pipeline import Aligner

    args = [a for a in sys.argv[1:]]
    batch_n = int(args.pop(0)) if args and args[0].isdigit() else 4096

    idx = B.get_index()
    aln = Aligner(idx, MemOptions(),
                  lut_cache=REPO / "build" /
                  f"bench_lut_hard_{B.GENOME_LEN}.npz")
    fwd = idx.get_seq(0, idx.l_pac).astype(np.uint8)
    recs = fastx.simulate_reads(fwd, batch_n, read_len=B.READ_LEN,
                                error_rate=B.ERROR_RATE,
                                indel_rate=B.INDEL_RATE, seed=7)
    b = fastx.batch_reads(recs, max_len=B.READ_LEN)
    seqs = jnp.asarray(b.seqs)
    lens = jnp.asarray(b.lens)

    if args:
        variants = [dict(kv.split("=") for kv in a.split(","))
                    for a in args]
        variants = [{k: int(v) for k, v in d.items()} for d in variants]
    else:
        variants = [
            {},
            {"fm_dense": 16},
            {"fm_dense": 8},
            {"offdiag_dense": 4},
            {"fm_dense": 16, "offdiag_dense": 4},
            {"fm_dense": 8, "offdiag_dense": 4},
            {"max_reseed": 4},
        ]

    base_scfg = aln.scfg
    for ov in variants:
        scfg = dataclasses.replace(base_scfg, **ov)
        fn = aln._make_packed(scfg, aln.ccfg, aln.ecfg)
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(aln.didx, aln.lut, seqs, lens))
        t_compile = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn(aln.didx, aln.lut, seqs, lens))
            best = min(best, time.perf_counter() - t0)
        buf = np.asarray(out)
        counts = buf[:batch_n]
        n_ovf = int(((counts >> 6) & 1).sum())
        tag = ",".join(f"{k}={v}" for k, v in ov.items()) or "base"
        print(f"{tag:40s} w1={best*1e3:7.1f} ms  ovf={n_ovf:5d}/{batch_n}"
              f"  (compile {t_compile:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
