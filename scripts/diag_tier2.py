"""Tier-2 overflow breakdown at scale: after the big-caps re-run, which cap
still routes reads to the oracle?

Usage: python scripts/diag_tier2.py [genome_mbp] [batch]
"""
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    import numpy as np
    import jax.numpy as jnp
    from tpubwa.index.builder import FMIndex
    from tpubwa.io import fastx
    from tpubwa.opts import MemOptions
    from tpubwa.pipeline import Aligner

    mbp = int(sys.argv[1]) if len(sys.argv) > 1 else 3100
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    glen = mbp * 1_000_000
    idx = FMIndex.load(REPO / "build" / f"scale_index_hard_{glen}.npz")
    aln = Aligner(idx, MemOptions(),
                  lut_cache=REPO / "build" / f"scale_lut_hard_{glen}.npz")
    g = np.load(REPO / "build" / f"scale_genome_hard_{glen}.npy",
                mmap_mode="r")
    recs = fastx.simulate_reads(np.asarray(g), B, read_len=100,
                                error_rate=0.01, indel_rate=0.001, seed=3)
    b = fastx.batch_reads(recs, max_len=100)
    seqs = jnp.asarray(np.asarray(b.seqs))
    lens = jnp.asarray(np.asarray(b.lens))

    t0 = time.time()
    buf = np.asarray(aln.worker1_packed(seqs, lens))
    n, ovf, l_rep, flat = aln._unpack_host(buf, B)
    print(f"# tier1: ovf {ovf.sum()}/{B} ({time.time()-t0:.1f}s)",
          flush=True)
    t0 = time.time()
    n2, ovf2, l2, flat2 = aln._tier2(b, n.copy(), ovf.copy(), l_rep.copy(),
                                     flat)
    print(f"# tier2: ovf {ovf2.sum()}/{B} ({time.time()-t0:.1f}s "
          f"incl compile)", flush=True)
    t0 = time.time()
    n3, ovf3, l3, flat3 = aln._tier2(b, n.copy(), ovf.copy(), l_rep.copy(),
                                     flat)
    print(f"# tier2 steady: {time.time()-t0:.2f}s", flush=True)

    # stage breakdown inside the big tier for the still-overflowing rows
    rows = np.flatnonzero(ovf2)
    if len(rows):
        import jax
        from tpubwa.chain.device import chain_seeds, chain_filter, \
            seeds_from_smems
        from tpubwa.extend.worker import extend_chains
        pad = (-len(rows)) % aln.TIER2_ROWS
        rsel = np.concatenate([rows, np.repeat(rows[-1:], pad)])
        s2 = jnp.asarray(np.ascontiguousarray(b.seqs[rsel])).astype(
            jnp.int32)
        ln2 = jnp.asarray(np.ascontiguousarray(b.lens[rsel]))
        aln._packed_big_fn()  # ensure big cfgs exist
        import dataclasses
        from tpubwa.pipeline import configs_from_opts
        big = dict(max_smems=63, max_seeds=640, max_chains=64, max_regs=63)
        scfg, ccfg, ecfg = configs_from_opts(
            aln.opt, seed_impl=aln.seed_impl,
            text_len=2 * int(idx.l_pac), **big)
        from tpubwa.seed.lut import LutSeedConfig
        if isinstance(scfg, LutSeedConfig):
            scfg = dataclasses.replace(scfg, fm_dense=4, offdiag_dense=2,
                                       r2_rows=1)
        ecfg = dataclasses.replace(ecfg, tail_rows=1)
        sm = aln._collect_smems(aln.didx, s2, ln2, None, scfg)
        print(f"# big smem ovf {np.asarray(sm['overflow'])[:len(rows)].sum()}"
              f", n max {np.asarray(sm['n']).max()}", flush=True)
        sd = seeds_from_smems(aln.didx, sm, ccfg)
        print(f"# big seeds ovf "
              f"{np.asarray(sd['overflow'])[:len(rows)].sum()}", flush=True)
        ch = chain_seeds(aln.didx, sd, ccfg)
        print(f"# big chains ovf "
              f"{np.asarray(ch['overflow'])[:len(rows)].sum()}", flush=True)
        st = extend_chains(aln.didx, s2, ln2, sd, ch, ecfg,
                           chain_filter(ch, ccfg))
        print(f"# big extend ovf "
              f"{np.asarray(st['overflow'])[:len(rows)].sum()}, "
              f"n max {np.asarray(st['n']).max()}", flush=True)


if __name__ == "__main__":
    main()
