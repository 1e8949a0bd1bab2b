"""Phase-level wall timing of the SE pipeline on the current backend."""
import sys, time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(REPO))
import bench as B


def sync(x):
    jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready")
        else a, x)


def main():
    batch_n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    idx = B.get_index()
    from tpubwa.io.fastx import ReadBatch
    from tpubwa.pipeline import Aligner
    from tpubwa.utils import dna

    rng = np.random.default_rng(7)
    genome = idx.pac_decoded() if hasattr(idx, "pac_decoded") else None
    # sample reads from the genome like bench does
    from tpubwa.index.builder import FMIndex
    L = B.READ_LEN
    starts = rng.integers(0, B.GENOME_LEN - L, batch_n)
    gseq = B.get_index  # placeholder
    # rebuild genome deterministically (same seed as bench)
    g = np.random.default_rng(2024).integers(0, 4, B.GENOME_LEN).astype(np.uint8)
    reads = np.stack([g[s:s + L] for s in starts])
    # mutate ~1%
    mut = rng.random(reads.shape) < 0.01
    reads = np.where(mut, (reads + rng.integers(1, 4, reads.shape)) % 4,
                     reads).astype(np.uint8)
    batch = ReadBatch(seqs=reads, lens=np.full(batch_n, L, np.int32),
                      names=[f"r{i}" for i in range(batch_n)],
                      quals=[None] * batch_n)

    al = Aligner(idx)
    seqs = jnp.asarray(batch.seqs.astype(np.int32))
    lens = jnp.asarray(batch.lens)

    from tpubwa.seed.anchor import collect_smems_anchor
    from tpubwa.chain.device import chain_seeds, chain_filter, seeds_from_smems
    from tpubwa.extend.worker import extend_chains

    stage_fns = {}
    stage_fns["seed"] = jax.jit(lambda d, s, l: collect_smems_anchor(d, s, l, al.scfg))
    smems = stage_fns["seed"](al.didx, seqs, lens); sync(smems)
    stage_fns["sa"] = jax.jit(lambda d, sm: seeds_from_smems(d, sm, al.ccfg))
    seeds = stage_fns["sa"](al.didx, smems); sync(seeds)
    stage_fns["chain"] = jax.jit(lambda d, se: chain_seeds(d, se, al.ccfg))
    ch = stage_fns["chain"](al.didx, seeds); sync(ch)
    stage_fns["filter"] = jax.jit(lambda c: chain_filter(c, al.ccfg))
    flt = stage_fns["filter"](ch); sync(flt)
    stage_fns["extend"] = jax.jit(
        lambda d, s, l, se, c, f: extend_chains(d, s, l, se, c, al.ecfg, f))
    st = stage_fns["extend"](al.didx, seqs, lens, seeds, ch, flt); sync(st)

    def timeit(f, *a, n=3):
        best = 1e9
        for _ in range(n):
            t0 = time.perf_counter(); r = f(*a); sync(r)
            best = min(best, time.perf_counter() - t0)
        return best, r

    t_seed, smems = timeit(stage_fns["seed"], al.didx, seqs, lens)
    t_sa, seeds = timeit(stage_fns["sa"], al.didx, smems)
    t_chain, ch = timeit(stage_fns["chain"], al.didx, seeds)
    t_filter, flt = timeit(stage_fns["filter"], ch)
    t_ext, st = timeit(stage_fns["extend"], al.didx, seqs, lens, seeds, ch, flt)

    # full packed worker1
    p = al.worker1_packed(seqs, lens); sync(p)
    t_w1, p = timeit(al.worker1_packed, seqs, lens)

    # host finish
    t0 = time.perf_counter()
    sam = al.align_se(batch)
    t_total = time.perf_counter() - t0
    print(f"backend={jax.default_backend()} batch={batch_n}")
    for k, v in [("seed", t_seed), ("sa_walk", t_sa), ("chain", t_chain),
                 ("filter", t_filter), ("extend", t_ext),
                 ("worker1_packed", t_w1),
                 ("align_se total (incl host finish)", t_total)]:
        print(f"  {k:36s} {v*1e3:9.1f} ms   {batch_n/v:10.0f} reads/s")
    n_ovf = int(np.asarray(smems["overflow"]).sum())
    print(f"  seed overflows: {n_ovf}")
    print(f"  sam lines: {sam.count(chr(10))}")


if __name__ == "__main__":
    main()
