"""Tier-1 overflow breakdown on the bench workload: which stage/cap routes
reads to tier-2? Drives the unjitted stage functions once (jitted as a
whole) and reports per-source overflow counts.

Usage: python scripts/diag_caps.py [batch] [--smems N] [--seeds N]
       [--chains N] [--regs N]
"""
import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("batch", type=int, nargs="?", default=4096)
    ap.add_argument("--smems", type=int, default=32)
    ap.add_argument("--seeds", type=int, default=128)
    ap.add_argument("--chains", type=int, default=32)
    ap.add_argument("--regs", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import bench as B
    from tpubwa.chain.device import chain_filter, chain_seeds, \
        seeds_from_smems
    from tpubwa.extend.worker import extend_chains
    from tpubwa.io import fastx
    from tpubwa.opts import MemOptions
    from tpubwa.pipeline import Aligner, configs_from_opts
    from tpubwa.seed.lut import collect_smems_lut

    idx = B.get_index()
    aln = Aligner(idx, MemOptions(),
                  lut_cache=REPO / "build" / f"bench_lut_hard_{B.GENOME_LEN}.npz",
                  max_smems=args.smems, max_seeds=args.seeds,
                  max_chains=args.chains, max_regs=args.regs)
    fwd = idx.get_seq(0, idx.l_pac).astype(np.uint8)
    recs = fastx.simulate_reads(fwd, args.batch, read_len=B.READ_LEN,
                                error_rate=B.ERROR_RATE,
                                indel_rate=B.INDEL_RATE, seed=7)
    b = fastx.batch_reads(recs, max_len=B.READ_LEN)
    seqs = jnp.asarray(b.seqs)
    lens = jnp.asarray(b.lens)

    scfg, ccfg, ecfg = aln.scfg, aln.ccfg, aln.ecfg

    @jax.jit
    def stages(didx, lut, seqs, lens):
        smems = collect_smems_lut(didx, lut, seqs, lens, scfg)
        ovf_seed = smems["overflow"]
        seeds = seeds_from_smems(didx, smems, ccfg)
        ovf_sa = seeds["overflow"]
        ch = chain_seeds(didx, seeds, ccfg)
        ovf_chain = ch.get("overflow", ovf_sa)
        flt = chain_filter(ch, ccfg)
        st = extend_chains(didx, seqs, lens, seeds, ch, ecfg, flt)
        return (ovf_seed, ovf_sa, ovf_chain, st["overflow"], st["n"],
                smems["n"], ch["n"])

    t0 = time.time()
    o_seed, o_sa, o_chain, o_final, n_regs, n_smems, n_chains = \
        jax.block_until_ready(stages(aln.didx, aln.lut, seqs, lens))
    t_compile = time.time() - t0
    t0 = time.time()
    jax.block_until_ready(stages(aln.didx, aln.lut, seqs, lens))
    t_steady = time.time() - t0

    o_seed = np.asarray(o_seed)
    o_sa = np.asarray(o_sa)
    o_chain = np.asarray(o_chain)
    o_final = np.asarray(o_final)
    Bn = args.batch
    print(f"caps: smems={args.smems} seeds={args.seeds} "
          f"chains={args.chains} regs={args.regs}")
    print(f"overflow after seeding:   {int(o_seed.sum()):5d}/{Bn}")
    print(f"overflow after SA/seeds:  {int(o_sa.sum()):5d}/{Bn}  "
          f"(+{int((o_sa & ~o_seed).sum())})")
    print(f"overflow after chaining:  {int(o_chain.sum()):5d}/{Bn}  "
          f"(+{int((o_chain & ~o_sa).sum())})")
    print(f"overflow after extend:    {int(o_final.sum()):5d}/{Bn}  "
          f"(+{int((o_final & ~o_chain).sum())})")
    print(f"smems p50/p95/max: {np.percentile(np.asarray(n_smems), 50):.0f}/"
          f"{np.percentile(np.asarray(n_smems), 95):.0f}/"
          f"{np.asarray(n_smems).max()}")
    print(f"chains p50/p95/max: {np.percentile(np.asarray(n_chains), 50):.0f}/"
          f"{np.percentile(np.asarray(n_chains), 95):.0f}/"
          f"{np.asarray(n_chains).max()}")
    print(f"regs p50/p95/max: {np.percentile(np.asarray(n_regs), 50):.0f}/"
          f"{np.percentile(np.asarray(n_regs), 95):.0f}/"
          f"{np.asarray(n_regs).max()}")
    print(f"wall: compile {t_compile:.1f}s, steady {t_steady:.3f}s")


if __name__ == "__main__":
    main()
