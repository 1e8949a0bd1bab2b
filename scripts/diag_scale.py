"""Overflow-source breakdown at scale: which device cap routes reads to the
oracle? Runs one batch through each worker1 stage on the cached scale index
and prints per-stage overflow counts (VERDICT r3 scaling work).

Usage: python scripts/diag_scale.py [genome_mbp] [batch]
"""
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from tpubwa.index.builder import FMIndex
    from tpubwa.io import fastx
    from tpubwa.opts import MemOptions
    from tpubwa.pipeline import Aligner
    from tpubwa.chain.device import chain_seeds, chain_filter, \
        seeds_from_smems
    from tpubwa.extend.worker import extend_chains

    mbp = int(sys.argv[1]) if len(sys.argv) > 1 else 3100
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    glen = mbp * 1_000_000
    t0 = time.time()
    idx = FMIndex.load(REPO / "build" / f"scale_index_hard_{glen}.npz")
    print(f"# index load {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    aln = Aligner(idx, MemOptions(),
                  lut_cache=REPO / "build" / f"scale_lut_hard_{glen}.npz")
    print(f"# aligner init {time.time()-t0:.1f}s", flush=True)
    g = np.load(REPO / "build" / f"scale_genome_hard_{glen}.npy",
                mmap_mode="r")
    recs = fastx.simulate_reads(np.asarray(g), B, read_len=100,
                                error_rate=0.01, indel_rate=0.001, seed=3)
    b = fastx.batch_reads(recs, max_len=100)
    seqs = jnp.asarray(np.asarray(b.seqs)).astype(jnp.int32)
    lens = jnp.asarray(np.asarray(b.lens))

    t0 = time.time()
    smems = aln._collect_smems(aln.didx, seqs, lens)
    jax.block_until_ready(smems)
    t_seed = time.time() - t0
    ovf_s = np.asarray(smems["overflow"])
    n_s = np.asarray(smems["n"])
    print(f"# smem stage {t_seed:.2f}s: overflow {ovf_s.sum()}/{B}, "
          f"n mean {n_s.mean():.1f} max {n_s.max()}", flush=True)

    seeds = seeds_from_smems(aln.didx, smems, aln.ccfg)
    jax.block_until_ready(seeds)
    ovf_seed = np.asarray(seeds["overflow"]) if "overflow" in seeds else 0
    nseed = np.asarray(seeds["n"]) if "n" in seeds else None
    print(f"# seeds: overflow {np.sum(ovf_seed)}/{B}"
          + (f", n mean {nseed.mean():.1f} max {nseed.max()}"
             if nseed is not None else ""), flush=True)

    ch = chain_seeds(aln.didx, seeds, aln.ccfg)
    jax.block_until_ready(ch)
    print(f"# chains: overflow {np.asarray(ch['overflow']).sum()}/{B}",
          flush=True)
    flt = chain_filter(ch, aln.ccfg)
    st = extend_chains(aln.didx, seqs, lens, seeds, ch, aln.ecfg, flt)
    jax.block_until_ready(st["n"])
    print(f"# extend: overflow {np.asarray(st['overflow']).sum()}/{B}, "
          f"regs mean {np.asarray(st['n']).mean():.2f}", flush=True)

    t0 = time.time()
    dev = aln.worker1_packed(seqs, lens)
    jax.block_until_ready(dev)
    t1 = time.time()
    dev = aln.worker1_packed(seqs, lens)
    jax.block_until_ready(dev)
    t2 = time.time()
    buf = np.asarray(dev)
    n, ovf, l_rep, flat = aln._unpack_host(buf, B)
    print(f"# packed: overflow {ovf.sum()}/{B} "
          f"(compile+run {t1-t0:.1f}s, steady {t2-t1:.2f}s)", flush=True)


if __name__ == "__main__":
    main()
