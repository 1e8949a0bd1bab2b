"""Bisect the extension stage: preamble / sel loops / round-1 kernels /
tail rounds, plus isolated window-build and Pallas-kernel costs at the
production shapes.  Usage: python scripts/time_extend.py [batch]
"""
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
    from tpubwa.seed.lut import collect_smems_lut
    from tpubwa.ops.window import text_window_asc, text_window_desc, \
        query_window_asc, query_window_desc
    from tpubwa.ops.sw_pallas import ksw_extend_pallas

    batch_n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    idx = B.get_index()
    aln = Aligner(idx, MemOptions(),
                  lut_cache=REPO / "build" /
                  f"bench_lut_hard_{B.GENOME_LEN}.npz")
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

    def upto(stop):
        def f(didx, lut, seqs, lens):
            sm = collect_smems_lut(didx, lut, seqs, lens, aln.scfg)
            seeds = seeds_from_smems(didx, sm, aln.ccfg)
            ch = chain_seeds(didx, seeds, aln.ccfg)
            flt = chain_filter(ch, aln.ccfg)
            st = extend_chains(didx, seqs, lens, seeds, ch, aln.ecfg, flt,
                               _stop_after=stop)
            return csum(st)
        return jax.jit(f)

    # isolated window build at production width
    L = B.READ_LEN
    from tpubwa.extend.worker import cal_max_gap
    WREF = L + 2 * cal_max_gap(aln.ecfg, L)

    def win_fn(didx, lut, seqs, lens):
        B_ = seqs.shape[0]
        pos = (jnp.abs(jnp.sum(seqs, axis=1)) * 9973) % didx.l_pac
        pos = pos.astype(jnp.int64)
        lt = text_window_desc(didx, pos + 100, WREF)
        rt = text_window_asc(didx, pos + 100, WREF)
        lq = query_window_desc(seqs.astype(jnp.int32), lens // 2, L)
        rq = query_window_asc(seqs.astype(jnp.int32), lens // 2, L)
        return csum((lt, rt, lq, rq))
    win_fn = jax.jit(win_fn)

    # isolated pallas kernel, one call, production-ish tlen spread
    def kern_fn(didx, lut, seqs, lens):
        N = seqs.shape[0]
        q = seqs.astype(jnp.int32)
        t = jnp.tile(q[:, :WREF // L * L + L][:, :1], (1, WREF)) * 0 + \
            (jnp.arange(WREF)[None, :] % 4)
        ql = lens.astype(jnp.int32)
        tl = 100 + (jnp.arange(N, dtype=jnp.int32) * 37) % (WREF - 100)
        h0 = jnp.full((N,), 19, jnp.int32)
        out = ksw_extend_pallas(q, ql, t, tl, h0,
                                jnp.full((N,), 100, jnp.int32),
                                jnp.full((N,), 5, jnp.int32),
                                jnp.ones((N,), jnp.int32))
        return csum(out)
    kern_fn = jax.jit(kern_fn)

    if aln.ecfg.task_parallel:
        rows = [
            ("chain+filter+pre", upto("pre")),
            ("+tp1 first-seed", upto("tp1")),
            ("+tp2 cand mask", upto("tp2")),
            ("+tp3 cand kernels", upto("tp3")),
            ("+tp4 replay (full)", upto("")),
            ("windows only(x4)", win_fn),
            ("pallas kernel x1", kern_fn),
        ]
    else:
        rows = [
            ("chain+filter (base)", upto("pre")),  # incl. extend preamble
            ("+sel loop 1", upto("sel1")),
            ("+round1 kernels", upto("round1")),
            ("+sel loop 2", upto("sel2")),
            ("+tail (full)", upto("")),
            ("windows only(x4)", win_fn),
            ("pallas kernel x1", kern_fn),
        ]
    if aln.ecfg.task_parallel:
        # candidate-count stat: tp2 stores the per-read candidate count in n
        def cand_fn(didx, lut, seqs, lens):
            sm = collect_smems_lut(didx, lut, seqs, lens, aln.scfg)
            seeds = seeds_from_smems(didx, sm, aln.ccfg)
            ch = chain_seeds(didx, seeds, aln.ccfg)
            flt = chain_filter(ch, aln.ccfg)
            st = extend_chains(didx, seqs, lens, seeds, ch, aln.ecfg, flt,
                               _stop_after="tp2")
            return st["n"].sum(), st["n"].max()
        tot, mx = jax.jit(cand_fn)(aln.didx, aln.lut, *fresh())
        print(f"candidates: total={int(tot)} / B={batch_n} "
              f"max/read={int(mx)}", flush=True)

    prev = 0.0
    for name, fn in rows:
        np.asarray(fn(aln.didx, aln.lut, *fresh()))
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
