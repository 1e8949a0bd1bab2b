"""Bisect the PE finish path: worker1 / transfer / isize / pestat-psum /
rescue-taskgen / rescue-kernel / native pair+SAM.  Mirrors
pipeline.Aligner._finish_pe_buf stage by stage with wall timings.

Usage: python scripts/profile_pe.py [pairs]
"""
import ctypes as C
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
    from tpubwa.oracle import to_copt
    from tpubwa.dist.mesh import pe_hist_psum
    from tpubwa.dist.multihost import hist_allreduce
    from tpubwa.pair.rescue import run_rescue_tasks

    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    idx = B.get_index()
    aln = Aligner(idx, MemOptions(),
                  lut_cache=REPO / "build" /
                  f"bench_lut_hard_{B.GENOME_LEN}.npz")
    fwd = idx.get_seq(0, idx.l_pac).astype(np.uint8)

    def fresh(seed):
        recs = fastx.simulate_reads(fwd, 2 * pairs, read_len=150,
                                    paired=True, error_rate=0.01,
                                    indel_rate=0.001, seed=seed,
                                    insert_mean=400, insert_std=50)
        return fastx.batch_reads(recs, max_len=150)

    # warm every jit
    b0 = fresh(1)
    aln.align_pe(b0, id0=0)

    batch = fresh(2)
    t = {}

    def tick(name, t0):
        t[name] = round((time.perf_counter() - t0) * 1e3, 1)

    t0 = time.perf_counter()
    dev = aln.worker1_packed(jnp.asarray(batch.seqs),
                             jnp.asarray(batch.lens))
    jax.block_until_ready(dev)
    tick("worker1_device", t0)
    t0 = time.perf_counter()
    buf = np.asarray(dev)
    tick("transfer", t0)

    opt_pe = aln.opt.replace(flag=aln.opt.flag | MemOptions.F_PE)
    t0 = time.perf_counter()
    n, ovf, l_rep, flat = aln._unpack_host(buf, batch.n)
    tick("unpack", t0)
    t0 = time.perf_counter()
    if ovf.any():
        n, ovf, l_rep, flat = aln._tier2(batch, n, ovf, l_rep, flat)
    tick("tier2", t0)

    lib = aln.oracle._lib
    copt = to_copt(opt_pe)
    seqs_h = np.ascontiguousarray(batch.seqs, dtype=np.uint8)
    lens_h = np.ascontiguousarray(batch.lens, dtype=np.int32)
    flat_h = np.ascontiguousarray(flat.astype(np.int64))
    n_h = np.ascontiguousarray(n.astype(np.int32))
    lrep_h = np.ascontiguousarray(l_rep.astype(np.int32))
    stride = seqs_h.shape[1]

    n_pairs = batch.n // 2
    dirs = np.zeros(max(n_pairs, 1), np.int32)
    isz = np.zeros(max(n_pairs, 1), np.int64)
    t0 = time.perf_counter()
    lib.tb_pe_isize(aln.oracle._h, C.byref(copt), seqs_h, lens_h,
                    batch.n, stride, flat_h, n_h, lrep_h, dirs, isz)
    tick("native_isize", t0)
    t0 = time.perf_counter()
    hist = pe_hist_psum(aln._pe_mesh(), dirs[:n_pairs], isz[:n_pairs],
                        aln.opt.max_ins)
    jax.block_until_ready(hist)
    tick("pestat_psum_device", t0)
    t0 = time.perf_counter()
    hist = hist_allreduce(hist)
    hist_h = np.ascontiguousarray(hist, dtype=np.int64)
    tick("pestat_dl", t0)

    rowsp = C.POINTER(C.c_int64)()
    t0 = time.perf_counter()
    n_t = lib.tb_pe_rescue_tasks(
        aln.oracle._h, C.byref(copt), seqs_h, lens_h, batch.n, stride,
        flat_h, n_h, lrep_h, hist_h.ctypes.data_as(C.c_void_p),
        aln.opt.max_ins, 0, C.byref(rowsp))
    tick("native_rescue_taskgen", t0)
    t["n_rescue_tasks"] = int(n_t)
    tasks_p = res_p = None
    if n_t:
        tasks = np.ctypeslib.as_array(
            rowsp, shape=(n_t * 8,)).reshape(n_t, 8).copy()
        t0 = time.perf_counter()
        res = run_rescue_tasks(aln.didx, batch.seqs, batch.lens, tasks, 0,
                               aln.opt, aln.ecfg.use_pallas)
        tick("rescue_kernel", t0)
        tasks_h = np.ascontiguousarray(tasks)
        res_h = np.ascontiguousarray(res)
        tasks_p = tasks_h.ctypes.data_as(C.c_void_p)
        res_p = res_h.ctypes.data_as(C.c_void_p)

    names = (C.c_char_p * batch.n)(*[s.encode() for s in batch.names])
    quals = (C.c_char_p * batch.n)(
        *[(q or "").encode() for q in batch.quals])
    out_len = C.c_int64(0)
    t0 = time.perf_counter()
    lib.tb_finish_pe_sam(
        aln.oracle._h, C.byref(copt), seqs_h, lens_h, names, quals,
        batch.n, stride, flat_h, n_h, lrep_h,
        hist_h.ctypes.data_as(C.c_void_p), aln.opt.max_ins,
        tasks_p, res_p, n_t, 0, b"", C.byref(out_len))
    tick("native_pair_sam", t0)

    total = sum(v for k, v in t.items() if k != "n_rescue_tasks")
    print({"pairs": pairs, **t, "sum_ms": round(total, 1)}, flush=True)

    # streamed throughput for reference
    bs = [fresh(10 + i) for i in range(4)]
    aln.stats = {"reads": 0, "fallback_reads": 0}
    t0 = time.perf_counter()
    out = list(aln.align_pe_stream(bs, id0=0))
    dt = time.perf_counter() - t0
    nn = sum(b.n for b in bs)
    print({"pe_stream_reads_per_s": round(nn / dt, 1)}, flush=True)


if __name__ == "__main__":
    main()
