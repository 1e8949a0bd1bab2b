"""Reliable worker1 stage bisection on the bench workload.

Times cumulative prefixes of the device pipeline (LUT gather -> fm1 ->
fm2 -> diag -> full seeding -> +sa_walk -> +chain -> +filter -> +extend ->
packed). Measurement rules learned on the axon platform (remote TPU):
  * fresh, never-before-seen batch content per repetition;
  * each wrapped stage reduces its outputs to ONE int32 checksum on
    device, and the rep is timed dispatch -> np.asarray(checksum) — the
    only sequence that reliably measures execution (block_until_ready
    alone can return immediately).

Usage: python scripts/time_stages.py [batch] [fm_dense]
"""
import dataclasses
import os
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
    from tpubwa.chain.device import chain_filter, chain_seeds, \
        seeds_from_smems
    from tpubwa.extend.worker import extend_chains
    from tpubwa.io import fastx
    from tpubwa.opts import MemOptions
    from tpubwa.pipeline import Aligner
    from tpubwa.seed.lut import collect_smems_lut, _walk_lut

    batch_n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    fmd = int(sys.argv[2]) if len(sys.argv) > 2 else 0

    idx = B.get_index()
    aln = Aligner(idx, MemOptions(),
                  lut_cache=REPO / "build" /
                  f"bench_lut_hard_{B.GENOME_LEN}.npz")
    scfg = aln.scfg if not fmd else dataclasses.replace(aln.scfg,
                                                        fm_dense=fmd)
    fwd = idx.get_seq(0, idx.l_pac).astype(np.uint8)
    REPS = 3

    def fresh():
        seed = int.from_bytes(os.urandom(4), "little") % (1 << 30)
        recs = fastx.simulate_reads(fwd, batch_n, read_len=B.READ_LEN,
                                    error_rate=B.ERROR_RATE,
                                    indel_rate=B.INDEL_RATE, seed=seed)
        bb = fastx.batch_reads(recs, max_len=B.READ_LEN)
        return jnp.asarray(bb.seqs), jnp.asarray(bb.lens)

    def csum(tree):
        leaves = [x for x in jax.tree_util.tree_leaves(tree)
                  if hasattr(x, "dtype")]
        tot = jnp.int32(0)
        for x in leaves:
            tot = tot + jnp.sum(x.astype(jnp.int32), dtype=jnp.int32)
        return tot

    def walk_prefix(stop):
        def f(didx, lut, seqs, lens):
            seqs = seqs.astype(jnp.int32)
            lens = lens.astype(jnp.int32)
            ones = jnp.ones((seqs.shape[0],), jnp.int32)
            return csum(_walk_lut(didx, lut, seqs, lens, ones, True, scfg,
                                  _stop_after=stop))
        return jax.jit(f)

    def upto(stage):
        def f(didx, lut, seqs, lens):
            sm = collect_smems_lut(didx, lut, seqs, lens, scfg)
            if stage == "smems":
                return csum(sm)
            seeds = seeds_from_smems(didx, sm, aln.ccfg)
            if stage == "sa_walk":
                return csum(seeds)
            ch = chain_seeds(didx, seeds, aln.ccfg)
            if stage == "chain":
                return csum(ch)
            flt = chain_filter(ch, aln.ccfg)
            if stage == "filter":
                return csum((ch, flt))
            st = extend_chains(didx, seqs, lens, seeds, ch, aln.ecfg, flt)
            return csum(st)
        return jax.jit(f)

    packed_fn = aln._make_packed(scfg, aln.ccfg, aln.ecfg)

    def packed(didx, lut, seqs, lens):
        return csum(packed_fn(didx, lut, seqs, lens))

    rows = [
        ("walk:lut", walk_prefix("lut")),
        ("walk:fm1", walk_prefix("fm1")),
        ("walk:fm2", walk_prefix("fm2")),
        ("walk:diag", walk_prefix("diag")),
        ("walk:full", walk_prefix("")),
        ("smems(all rounds)", upto("smems")),
        ("+sa_walk", upto("sa_walk")),
        ("+chain", upto("chain")),
        ("+filter", upto("filter")),
        ("+extend", upto("extend")),
        ("packed (prod)", jax.jit(packed)),
    ]
    prev = 0.0
    for name, fn in rows:
        np.asarray(fn(aln.didx, aln.lut, *fresh()))       # compile+warm
        best = float("inf")
        for _ in range(REPS):
            x = fresh()
            t0 = time.perf_counter()
            np.asarray(fn(aln.didx, aln.lut, *x))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:22s} {best*1e3:8.1f} ms   (+{(best-prev)*1e3:7.1f})",
              flush=True)
        prev = best


if __name__ == "__main__":
    main()
