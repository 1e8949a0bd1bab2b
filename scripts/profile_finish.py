"""Host-finish profiling: where do the ~0.6 s/batch of SE host time go?

Runs on the CPU backend (no chip needed): drives worker1 for one bench-
workload batch, then times the host-side components separately —
_unpack_host, tier-2, and the native tb_finish_se_sam call at 1..k
threads. Coarse first; drill into native sections if the C++ dominates.
"""
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

import bench as B
from tpubwa.io import fastx
from tpubwa.opts import MemOptions
from tpubwa.pipeline import Aligner


def t(fn, reps=5):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn()
        best = min(best, time.perf_counter() - t0)
    return best, r


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    idx = B.get_index()
    aln = Aligner(idx, MemOptions(),
                  lut_cache=REPO / "build" / f"bench_lut_hard_{B.GENOME_LEN}.npz")
    fwd = idx.get_seq(0, idx.l_pac).astype(np.uint8)
    recs = fastx.simulate_reads(fwd, n, read_len=B.READ_LEN,
                                error_rate=B.ERROR_RATE,
                                indel_rate=B.INDEL_RATE, seed=7)
    batch = fastx.batch_reads(recs, max_len=B.READ_LEN)
    import jax.numpy as jnp
    t0 = time.time()
    buf = np.asarray(aln.worker1_packed(jnp.asarray(batch.seqs),
                                        jnp.asarray(batch.lens)))
    print(f"worker1 (cpu backend, incl compile): {time.time() - t0:.1f}s")

    dt, (ne, ovf, l_rep, flat) = t(lambda: aln._unpack_host(buf, batch.n))
    print(f"_unpack_host:        {dt * 1e3:8.1f} ms  "
          f"(regs={len(flat)}, ovf={int(ovf.sum())})")

    if ovf.any():
        dt, _ = t(lambda: aln._tier2(batch, ne.copy(), ovf.copy(),
                                     l_rep.copy(), flat.copy()), reps=2)
        print(f"_tier2:              {dt * 1e3:8.1f} ms")

    n2, ovf2, lrep2, flat2 = aln._unpack_host(buf, batch.n)
    if ovf2.any():
        n2, ovf2, lrep2, flat2 = aln._tier2(batch, n2, ovf2, lrep2, flat2)
    offs_all = np.concatenate([[0], np.cumsum(n2)])

    dt, sam1 = t(lambda: aln._finish_chunk(batch, n2, ovf2, lrep2, flat2,
                                           offs_all, 0, batch.n, 0,
                                           aln.oracle), reps=3)
    print(f"native finish (1t):  {dt * 1e3:8.1f} ms  "
          f"({batch.n / dt:,.0f} reads/s)")

    import concurrent.futures as cf
    for k in (2,):
        oracles = aln._finish_oracles(k)
        bounds = [round(batch.n * i / k) for i in range(k + 1)]

        def run_k():
            with cf.ThreadPoolExecutor(max_workers=k) as ex:
                futs = [ex.submit(aln._finish_chunk, batch, n2, ovf2,
                                  lrep2, flat2, offs_all, bounds[i],
                                  bounds[i + 1], 0, oracles[i])
                        for i in range(k)]
                return "".join(f.result() for f in futs)
        dt, samk = t(run_k, reps=3)
        print(f"native finish ({k}t):  {dt * 1e3:8.1f} ms  "
              f"({batch.n / dt:,.0f} reads/s)")
        assert samk == sam1

    # full path for reference
    dt, _ = t(lambda: aln._finish_se_buf(batch, buf, 0), reps=3)
    print(f"_finish_se_buf:      {dt * 1e3:8.1f} ms   (everything)")


if __name__ == "__main__":
    main()
