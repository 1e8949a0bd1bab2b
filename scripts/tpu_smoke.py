"""Compiled-TPU test lane: Pallas kernels + e2e parity on the real chip.

The pytest suite forces JAX_PLATFORMS=cpu (tests/conftest.py), so no test
ever lowers a Pallas kernel through the Mosaic TPU backend — which is how
two tile-shape crashes shipped in round 3 (BENCH_r03: ksw_local_pallas at
T=768; ksw_extend_pallas at Q=256). This script is the missing lane: run it
on the real chip before every round snapshot.

Coverage (SURVEY.md §4.1 — goldens must cover the production backend):
  1. Kernel sweep: both Pallas kernels COMPILED for TPU across the
     production shape envelope (Q in {100, 151, 256} x T in {256, 512,
     768, 1024}), exact-compared to the pure-JAX references
     (extend/jax_extend.py) on the same tasks.
  2. E2E parity vs the scalar oracle, with indels, on the three BASELINE
     read profiles: SE 100 bp, PE 150 bp with 400+-50 bp inserts (drives
     mate-rescue windows to T=768 — the BENCH_r03 crash shape), and
     SE 250 bp (the Q=256 extend bucket — the config-5 crash shape).

Writes TPU_SMOKE.json and exits nonzero on any mismatch.
"""
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np


def gen_tasks(seed, n, maxq, maxt):
    """Adversarial mix: random, planted-with-errors, duplicated (subopt
    hits for score2), and N-containing tasks (mirrors
    tests/test_local_align.py::gen_tasks)."""
    rng = np.random.default_rng(seed)
    qs = np.full((n, maxq), 4, np.uint8)
    ts = np.full((n, maxt), 4, np.uint8)
    qlen = rng.integers(5, maxq + 1, n).astype(np.int32)
    tlen = rng.integers(10, maxt + 1, n).astype(np.int32)
    for i in range(n):
        t = rng.integers(0, 4, tlen[i]).astype(np.uint8)
        q = rng.integers(0, 4, qlen[i]).astype(np.uint8)
        if i % 3 == 0 and tlen[i] > qlen[i]:
            off = rng.integers(0, tlen[i] - qlen[i] + 1)
            q = t[off:off + qlen[i]].copy()
            nerr = rng.integers(0, 6)
            pos = rng.integers(0, qlen[i], nerr)
            q[pos] = (q[pos] + rng.integers(1, 4, nerr)) % 4
        if i % 5 == 0 and tlen[i] > 2 * qlen[i]:
            off2 = rng.integers(qlen[i], tlen[i] - qlen[i] + 1)
            t[off2:off2 + qlen[i]] = q % 4
        if i % 7 == 0:
            q[rng.integers(0, qlen[i], 2)] = 4
        qs[i, :qlen[i]] = q
        ts[i, :tlen[i]] = t
    return qs, qlen, ts, tlen


def kernel_sweep():
    import jax.numpy as jnp
    from tpubwa.opts import MemOptions
    from tpubwa.extend.jax_extend import ksw_extend_batch, ksw_local_batch
    from tpubwa.ops.sw_pallas import ksw_extend_pallas, ksw_local_pallas
    from tpubwa.pair.rescue import _scmat_tuple

    opt = MemOptions()
    scmat = np.full((5, 5), -1, np.int32)
    for i in range(4):
        for j in range(4):
            scmat[i, j] = opt.a if i == j else -opt.b
    results = []
    # N values chosen to force non-trivial grids AND non-multiple-of-tile
    # padding at every shape.
    for Q in (100, 151, 256):
        for T in (256, 512, 768, 1024):
            qs, qlen, ts, tlen = gen_tasks(Q * 7 + T, n=100, maxq=Q, maxt=T)
            valid = jnp.ones(len(qlen), bool)
            # --- extend kernel (banded, h0-seeded) ---
            h0 = jnp.asarray(
                np.random.default_rng(T).integers(
                    10, Q, len(qlen)).astype(np.int32))
            w = jnp.full((len(qlen),), opt.w, jnp.int32)
            eb = jnp.full((len(qlen),), 5, jnp.int32)
            ref = ksw_extend_batch(
                jnp.asarray(qs, jnp.int32), jnp.asarray(qlen),
                jnp.asarray(ts, jnp.int32), jnp.asarray(tlen), h0, w, eb,
                valid, jnp.asarray(scmat), None, opt.o_del, opt.e_del,
                opt.o_ins, opt.e_ins, opt.zdrop)
            pal = ksw_extend_pallas(
                jnp.asarray(qs, jnp.int32), jnp.asarray(qlen),
                jnp.asarray(ts, jnp.int32), jnp.asarray(tlen), h0, w, eb,
                valid, opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
                opt.zdrop, opt.a, opt.b)
            want = np.stack([np.asarray(r) for r in ref], axis=1)
            ok_e = bool(np.array_equal(np.asarray(pal), want))
            # --- local kernel (mate-rescue, unbanded) ---
            minsc = jnp.full((len(qlen),), opt.min_seed_len * opt.a,
                             jnp.int32)
            refl = ksw_local_batch(
                jnp.asarray(qs, jnp.int32), jnp.asarray(qlen),
                jnp.asarray(ts, jnp.int32), jnp.asarray(tlen), valid,
                minsc, _scmat_tuple(opt.a, opt.b), opt.o_del, opt.e_del,
                opt.o_ins, opt.e_ins, True)
            pall = ksw_local_pallas(
                jnp.asarray(qs, jnp.int32), jnp.asarray(qlen),
                jnp.asarray(ts, jnp.int32), jnp.asarray(tlen), minsc,
                valid, opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
                opt.a, opt.b, want_sub=True)
            wantl = np.stack([np.asarray(r) for r in refl], axis=1)
            ok_l = bool(np.array_equal(np.asarray(pall), wantl))
            results.append({"Q": Q, "T": T, "extend_ok": ok_e,
                            "local_ok": ok_l})
            tag = "ok" if (ok_e and ok_l) else "FAIL"
            print(f"  kernel sweep Q={Q:4d} T={T:5d}: extend={ok_e} "
                  f"local={ok_l} [{tag}]", flush=True)

    # --- production-batch N: tile sizing is N-dependent, and a tile that
    # only materializes at large N can exceed the scoped-VMEM limit (the
    # r4 bench OOMed at tile=976 while this sweep's n=100 passed) ---
    # the third row pins the SE-250 envelope: the biggest tile for the
    # Q=256 LANES at the largest production T only materializes at large N
    for (NB, Q, T) in ((4500, 100, 290), (2100, 151, 640), (1300, 256, 1024)):
        qs, qlen, ts, tlen = gen_tasks(NB, n=NB, maxq=Q, maxt=T)
        valid = jnp.ones(len(qlen), bool)
        h0 = jnp.asarray(np.random.default_rng(NB).integers(
            10, Q, len(qlen)).astype(np.int32))
        w = jnp.full((len(qlen),), opt.w, jnp.int32)
        eb = jnp.full((len(qlen),), 5, jnp.int32)
        ref = ksw_extend_batch(
            jnp.asarray(qs, jnp.int32), jnp.asarray(qlen),
            jnp.asarray(ts, jnp.int32), jnp.asarray(tlen), h0, w, eb,
            valid, jnp.asarray(scmat), None, opt.o_del, opt.e_del,
            opt.o_ins, opt.e_ins, opt.zdrop)
        pal = ksw_extend_pallas(
            jnp.asarray(qs, jnp.int32), jnp.asarray(qlen),
            jnp.asarray(ts, jnp.int32), jnp.asarray(tlen), h0, w, eb,
            valid, opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
            opt.zdrop, opt.a, opt.b)
        want = np.stack([np.asarray(r) for r in ref], axis=1)
        ok_e = bool(np.array_equal(np.asarray(pal), want))
        minsc = jnp.full((len(qlen),), opt.min_seed_len * opt.a, jnp.int32)
        refl = ksw_local_batch(
            jnp.asarray(qs, jnp.int32), jnp.asarray(qlen),
            jnp.asarray(ts, jnp.int32), jnp.asarray(tlen), valid,
            minsc, _scmat_tuple(opt.a, opt.b), opt.o_del, opt.e_del,
            opt.o_ins, opt.e_ins, True)
        pall = ksw_local_pallas(
            jnp.asarray(qs, jnp.int32), jnp.asarray(qlen),
            jnp.asarray(ts, jnp.int32), jnp.asarray(tlen), minsc,
            valid, opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
            opt.a, opt.b, want_sub=True)
        wantl = np.stack([np.asarray(r) for r in refl], axis=1)
        ok_l = bool(np.array_equal(np.asarray(pall), wantl))
        results.append({"Q": Q, "T": T, "N": NB, "extend_ok": ok_e,
                        "local_ok": ok_l})
        tag = "ok" if (ok_e and ok_l) else "FAIL"
        print(f"  kernel sweep N={NB} Q={Q:4d} T={T:5d}: extend={ok_e} "
              f"local={ok_l} [{tag}]", flush=True)
    return results


def e2e_parity():
    import bench as B
    from tpubwa.io import fastx
    from tpubwa.opts import MemOptions
    from tpubwa.pipeline import Aligner

    idx = B.get_index()
    fwd = idx.get_seq(0, idx.l_pac).astype(np.uint8)
    results = []

    def compare(name, dev_sam, orc_sam):
        d = dev_sam.rstrip("\n").split("\n")
        o = orc_sam.rstrip("\n").split("\n")
        bad = [i for i, (a, b) in enumerate(zip(d, o)) if a != b]
        ok = len(d) == len(o) and not bad
        results.append({"config": name, "records": len(d),
                        "mismatches": len(bad), "ok": ok})
        print(f"  e2e {name}: {len(d)} records, {len(bad)} mismatches "
              f"[{'ok' if ok else 'FAIL'}]", flush=True)
        if bad:
            for i in bad[:3]:
                print("   DEV:", d[i])
                print("   ORC:", o[i])

    # config 1: SE 100 bp with subs + indels
    aln = Aligner(idx, MemOptions(),
                  lut_cache=REPO / "build" / f"bench_lut_hard_{B.GENOME_LEN}.npz")
    recs = fastx.simulate_reads(fwd, 512, read_len=100, error_rate=0.01,
                                indel_rate=0.001, seed=41)
    b = fastx.batch_reads(recs, max_len=100)
    compare("se_100bp", aln.align_se(b, id0=0),
            aln.oracle.align_se(b, aln.opt, id0=0, rg_id=""))

    # config 2 regression shape: PE 150 bp, 400+-50 inserts -> rescue
    # windows round to T=768 (the BENCH_r03 Pallas crash)
    pe = fastx.simulate_reads(fwd, 512, read_len=150, paired=True,
                              error_rate=0.01, indel_rate=0.001, seed=42,
                              insert_mean=400, insert_std=50)
    bp = fastx.batch_reads(pe, max_len=150)
    compare("pe_150bp_ins400", aln.align_pe(bp, id0=0),
            aln.oracle.align_pe(bp, aln.opt, id0=0, rg_id="")[0])

    # config 5 regression shape: SE 250 bp -> Q=256 extend bucket
    recs = fastx.simulate_reads(fwd, 256, read_len=250, error_rate=0.01,
                                indel_rate=0.001, seed=43)
    b = fastx.batch_reads(recs, max_len=250)
    compare("se_250bp", aln.align_se(b, id0=0),
            aln.oracle.align_se(b, aln.opt, id0=0, rg_id=""))
    return results


def main():
    import jax
    backend = jax.default_backend()
    if backend != "tpu":
        print(f"SKIP: backend is {backend!r}, need a real TPU", flush=True)
        raise SystemExit(2)
    t0 = time.time()
    print("== Pallas kernel sweep (compiled TPU vs JAX reference) ==",
          flush=True)
    kres = kernel_sweep()
    print("== E2E SAM parity vs scalar oracle (with indels) ==", flush=True)
    eres = e2e_parity()
    ok = all(r["extend_ok"] and r["local_ok"] for r in kres) and \
        all(r["ok"] for r in eres)
    out = {"ok": ok, "backend": backend, "kernel_sweep": kres,
           "e2e": eres, "wall_s": round(time.time() - t0, 1)}
    (REPO / "TPU_SMOKE.json").write_text(json.dumps(out, indent=1) + "\n")
    print(("PASS" if ok else "FAIL") +
          f" (wall {out['wall_s']}s) -> TPU_SMOKE.json", flush=True)
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
