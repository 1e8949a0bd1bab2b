"""Device-stage wall timing of the production SE pipeline (LUT seeding)
on the bench workload. Per-stage jits are approximate (production fuses
the whole step into one XLA program), but the split shows where the
worker1 time goes.

Usage: python scripts/profile_phases.py [batch]
"""
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np
import jax
import jax.numpy as jnp

import bench as B


def sync(x):
    jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready")
        else a, x)


def main():
    batch_n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    from tpubwa.chain.device import chain_filter, chain_seeds, \
        seeds_from_smems
    from tpubwa.extend.worker import extend_chains
    from tpubwa.io import fastx
    from tpubwa.opts import MemOptions
    from tpubwa.pipeline import Aligner
    from tpubwa.seed.lut import collect_smems_lut

    idx = B.get_index()
    al = Aligner(idx, MemOptions(),
                 lut_cache=REPO / "build" / f"bench_lut_hard_{B.GENOME_LEN}.npz")
    fwd = idx.get_seq(0, idx.l_pac).astype(np.uint8)
    recs = fastx.simulate_reads(fwd, batch_n, read_len=B.READ_LEN,
                                error_rate=B.ERROR_RATE,
                                indel_rate=B.INDEL_RATE, seed=7)
    batch = fastx.batch_reads(recs, max_len=B.READ_LEN)
    seqs = jnp.asarray(batch.seqs)
    lens = jnp.asarray(batch.lens)

    fns = {
        "seed": jax.jit(lambda d, lu, s, l:
                        collect_smems_lut(d, lu, s, l, al.scfg)),
        "sa_walk": jax.jit(lambda d, sm: seeds_from_smems(d, sm, al.ccfg)),
        "chain": jax.jit(lambda d, se: chain_seeds(d, se, al.ccfg)),
        "filter": jax.jit(lambda c: chain_filter(c, al.ccfg)),
        "extend": jax.jit(lambda d, s, l, se, c, f:
                          extend_chains(d, s, l, se, c, al.ecfg, f)),
    }
    smems = fns["seed"](al.didx, al.lut, seqs, lens); sync(smems)
    seeds = fns["sa_walk"](al.didx, smems); sync(seeds)
    ch = fns["chain"](al.didx, seeds); sync(ch)
    flt = fns["filter"](ch); sync(flt)
    st = fns["extend"](al.didx, seqs, lens, seeds, ch, flt); sync(st)

    def timeit(f, *a, n=3):
        best = 1e9
        for _ in range(n):
            t0 = time.perf_counter(); r = f(*a); sync(r)
            best = min(best, time.perf_counter() - t0)
        return best, r

    t_seed, smems = timeit(fns["seed"], al.didx, al.lut, seqs, lens)
    t_sa, seeds = timeit(fns["sa_walk"], al.didx, smems)
    t_chain, ch = timeit(fns["chain"], al.didx, seeds)
    t_filter, flt = timeit(fns["filter"], ch)
    t_ext, st = timeit(fns["extend"], al.didx, seqs, lens, seeds, ch, flt)

    p = al.worker1_packed(seqs, lens); sync(p)
    t_w1, p = timeit(al.worker1_packed, seqs, lens)

    t0 = time.perf_counter()
    sam = al.align_se(batch)
    t_total = time.perf_counter() - t0
    print(f"backend={jax.default_backend()} batch={batch_n}")
    for k, v in [("seed (LUT SMEM walk)", t_seed), ("sa_walk", t_sa),
                 ("chain", t_chain), ("filter", t_filter),
                 ("extend", t_ext), ("worker1_packed (fused)", t_w1),
                 ("align_se total (incl host+tier2)", t_total)]:
        print(f"  {k:36s} {v*1e3:9.1f} ms   {batch_n/v:10.0f} reads/s")
    n_ovf = int(np.asarray(smems["overflow"]).sum())
    print(f"  seed overflows: {n_ovf}")
    print(f"  sam lines: {sam.count(chr(10))}")


if __name__ == "__main__":
    main()
