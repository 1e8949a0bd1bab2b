"""ctypes wrapper around the native oracle (scalar BWA-MEM semantics).

The oracle is the golden spec for every device stage (SURVEY.md §4) and also
the production host-side finishing path. Built on demand with g++ (no
pybind11 in this environment); the .so is cached in build/.
"""
from __future__ import annotations

import ctypes as C
import subprocess
from pathlib import Path

import numpy as np

from ..index.builder import FMIndex
from ..opts import MemOptions

_REPO = Path(__file__).resolve().parents[2]
_SO = _REPO / "build" / "liboracle.so"
_SRC = sorted((_REPO / "native").glob("*.cpp"))

_lib = None


def _build() -> None:
    _SO.parent.mkdir(exist_ok=True)
    cmd = [
        "g++", "-O2", "-g", "-std=c++17", "-shared", "-fPIC",
        *[str(s) for s in _SRC], "-o", str(_SO),
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def get_lib() -> C.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    newest_src = max(s.stat().st_mtime for s in _SRC) if _SRC else 0
    hdrs = sorted((_REPO / "native").glob("*.h"))
    if hdrs:
        newest_src = max(newest_src, max(h.stat().st_mtime for h in hdrs))
    if not _SO.exists() or _SO.stat().st_mtime < newest_src:
        _build()
    _lib = C.CDLL(str(_SO))
    _declare(_lib)
    return _lib


class CMemOpt(C.Structure):
    """Must match native/fm.h :: MemOpt field-for-field."""
    _fields_ = [
        ("a", C.c_int32), ("b", C.c_int32),
        ("o_del", C.c_int32), ("e_del", C.c_int32),
        ("o_ins", C.c_int32), ("e_ins", C.c_int32),
        ("pen_unpaired", C.c_int32), ("pen_clip5", C.c_int32),
        ("pen_clip3", C.c_int32), ("w", C.c_int32), ("zdrop", C.c_int32),
        ("min_seed_len", C.c_int32), ("split_width", C.c_int32),
        ("max_occ", C.c_int32), ("max_chain_gap", C.c_int32),
        ("max_chain_extend", C.c_int32), ("min_chain_weight", C.c_int32),
        ("T", C.c_int32), ("flag", C.c_int32), ("max_ins", C.c_int32),
        ("max_matesw", C.c_int32), ("max_xa_hits", C.c_int32),
        ("split_factor", C.c_double), ("mask_level", C.c_double),
        ("drop_ratio", C.c_double), ("mask_level_redun", C.c_double),
        ("mapq_coef_len", C.c_double), ("xa_drop_ratio", C.c_double),
        ("mat", C.c_int8 * 25),
    ]


def to_copt(o: MemOptions) -> CMemOpt:
    c = CMemOpt()
    for name in ("a", "b", "o_del", "e_del", "o_ins", "e_ins", "pen_unpaired",
                 "pen_clip5", "pen_clip3", "w", "zdrop", "min_seed_len",
                 "split_width", "max_occ", "max_chain_gap", "max_chain_extend",
                 "min_chain_weight", "T", "flag", "max_ins", "max_matesw",
                 "split_factor", "mask_level", "drop_ratio",
                 "mask_level_redun", "mapq_coef_len", "xa_drop_ratio"):
        setattr(c, name, getattr(o, name))
    c.max_xa_hits = o.max_xa_hits
    mat = o.scmat.reshape(-1)
    for i in range(25):
        c.mat[i] = int(mat[i])
    return c


def _declare(lib: C.CDLL) -> None:
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
    i8p = np.ctypeslib.ndpointer(np.int8, flags="C")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
    lib.tb_idx_new.restype = C.c_void_p
    lib.tb_idx_new.argtypes = [
        C.c_int64, C.c_int64, C.c_int64, i64p, u32p, u32p, i64p, u8p,
        i64p, i64p, C.c_int, C.POINTER(C.c_char_p),
    ]
    lib.tb_idx_free.argtypes = [C.c_void_p]
    lib.tb_ksw_extend.argtypes = [
        C.c_int, u8p, C.c_int, u8p, C.c_int, C.c_int, C.c_int, C.c_int,
        C.c_int, C.c_int, C.c_int, C.c_int, i8p, i32p,
    ]
    lib.tb_ksw_global.restype = C.c_int
    lib.tb_ksw_global.argtypes = [
        C.c_int, u8p, C.c_int, u8p, C.c_int, C.c_int, C.c_int, C.c_int,
        C.c_int, i8p, u32p, C.c_int, C.POINTER(C.c_int),
    ]
    lib.tb_ksw_align.argtypes = [
        C.c_int, u8p, C.c_int, u8p, C.c_int, C.c_int, C.c_int, C.c_int,
        C.c_int, i8p, i32p,
    ]
    lib.tb_smems.restype = C.c_int
    lib.tb_smems.argtypes = [C.c_void_p, C.POINTER(CMemOpt), u8p, C.c_int,
                             C.POINTER(C.POINTER(C.c_int64))]
    lib.tb_chains.restype = C.c_int
    lib.tb_chains.argtypes = [C.c_void_p, C.POINTER(CMemOpt), u8p, C.c_int,
                              C.c_int, C.POINTER(C.POINTER(C.c_int64))]
    lib.tb_regs.restype = C.c_int
    lib.tb_regs.argtypes = [C.c_void_p, C.POINTER(CMemOpt), u8p, C.c_int,
                            C.c_int64, C.c_int,
                            C.POINTER(C.POINTER(C.c_int64))]
    lib.tb_align_se_sam.restype = C.c_void_p  # char*; sliced manually
    lib.tb_align_se_sam.argtypes = [
        C.c_void_p, C.POINTER(CMemOpt), u8p, i32p,
        C.POINTER(C.c_char_p), C.POINTER(C.c_char_p), C.c_int, C.c_int,
        C.c_int64, C.c_char_p, C.POINTER(C.c_int64),
    ]
    lib.tb_finish_se_sam.restype = C.c_void_p
    lib.tb_finish_se_sam.argtypes = [
        C.c_void_p, C.POINTER(CMemOpt), u8p, i32p,
        C.POINTER(C.c_char_p), C.POINTER(C.c_char_p), C.c_int, C.c_int,
        i64p, i32p, i32p, C.c_int64, C.c_char_p, C.POINTER(C.c_int64),
    ]
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C")
    lib.tb_sais.restype = C.c_int
    lib.tb_sais.argtypes = [u8p, C.c_int64, i64p]
    lib.tb_regs_pre.restype = C.c_int
    lib.tb_regs_pre.argtypes = [C.c_void_p, C.POINTER(CMemOpt), u8p, C.c_int,
                                C.POINTER(C.POINTER(C.c_int64)), i32p]
    lib.tb_align_pe_sam.restype = C.c_void_p
    lib.tb_align_pe_sam.argtypes = [
        C.c_void_p, C.POINTER(CMemOpt), u8p, i32p,
        C.POINTER(C.c_char_p), C.POINTER(C.c_char_p), C.c_int, C.c_int,
        C.c_int64, C.c_char_p, f64p, C.POINTER(C.c_int64),
    ]
    lib.tb_finish_pe_sam.restype = C.c_void_p
    lib.tb_finish_pe_sam.argtypes = [
        C.c_void_p, C.POINTER(CMemOpt), u8p, i32p,
        C.POINTER(C.c_char_p), C.POINTER(C.c_char_p), C.c_int, C.c_int,
        i64p, i32p, i32p, C.c_void_p, C.c_int, C.c_void_p, C.c_void_p,
        C.c_int, C.c_int64, C.c_char_p, C.POINTER(C.c_int64),
    ]
    lib.tb_pe_isize.restype = C.c_int
    lib.tb_pe_isize.argtypes = [
        C.c_void_p, C.POINTER(CMemOpt), u8p, i32p, C.c_int, C.c_int,
        i64p, i32p, i32p, i32p, i64p,
    ]
    lib.tb_pe_rescue_tasks.restype = C.c_int
    lib.tb_pe_rescue_tasks.argtypes = [
        C.c_void_p, C.POINTER(CMemOpt), u8p, i32p, C.c_int, C.c_int,
        i64p, i32p, i32p, C.c_void_p, C.c_int, C.c_int64,
        C.POINTER(C.POINTER(C.c_int64)),
    ]


def ksw_extend(query, target, opt: MemOptions, w=None, end_bonus=0, h0=0,
               zdrop=None):
    """Scalar ksw_extend2. Returns (score, qle, tle, gtle, gscore, max_off)."""
    lib = get_lib()
    query = np.ascontiguousarray(query, dtype=np.uint8)
    target = np.ascontiguousarray(target, dtype=np.uint8)
    out = np.zeros(6, dtype=np.int32)
    mat = np.ascontiguousarray(opt.scmat.reshape(-1))
    lib.tb_ksw_extend(len(query), query, len(target), target, opt.o_del,
                      opt.e_del, opt.o_ins, opt.e_ins,
                      opt.w if w is None else w, end_bonus,
                      opt.zdrop if zdrop is None else zdrop, h0, mat, out)
    return tuple(int(x) for x in out)


def ksw_global(query, target, opt: MemOptions, w=None):
    """Scalar ksw_global2. Returns (score, cigar list of (len, op))."""
    lib = get_lib()
    query = np.ascontiguousarray(query, dtype=np.uint8)
    target = np.ascontiguousarray(target, dtype=np.uint8)
    cap = len(query) + len(target) + 2
    cig = np.zeros(cap, dtype=np.uint32)
    n = C.c_int(0)
    mat = np.ascontiguousarray(opt.scmat.reshape(-1))
    score = lib.tb_ksw_global(len(query), query, len(target), target,
                              opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
                              opt.w if w is None else w, mat, cig, cap,
                              C.byref(n))
    return score, [(int(c) >> 4, int(c) & 0xF) for c in cig[: n.value]]


def ksw_align_local(query, target, opt: MemOptions, minsc=0):
    """Scalar local SW. Returns dict(score, tb, te, qb, qe, score2, te2)."""
    lib = get_lib()
    query = np.ascontiguousarray(query, dtype=np.uint8)
    target = np.ascontiguousarray(target, dtype=np.uint8)
    out = np.zeros(7, dtype=np.int32)
    mat = np.ascontiguousarray(opt.scmat.reshape(-1))
    lib.tb_ksw_align(len(query), query, len(target), target, opt.o_del,
                     opt.e_del, opt.o_ins, opt.e_ins, minsc, mat, out)
    keys = ("score", "tb", "te", "qb", "qe", "score2", "te2")
    return dict(zip(keys, (int(x) for x in out)))


class Oracle:
    """Holds a native index handle over a (kept-alive) FMIndex."""

    def __init__(self, idx: FMIndex):
        lib = get_lib()
        # keep contiguous arrays alive for the lifetime of the handle
        self._keep = dict(
            L2=np.ascontiguousarray(idx.L2, dtype=np.int64),
            bwt_words=np.ascontiguousarray(idx.bwt_words, dtype=np.uint32),
            occ_cp=np.ascontiguousarray(idx.occ_cp, dtype=np.uint32),
            sa_samples=np.ascontiguousarray(idx.sa_samples, dtype=np.int64),
            pac=np.ascontiguousarray(idx.pac, dtype=np.uint8),
            ann_off=np.ascontiguousarray(
                [a.offset for a in idx.anns], dtype=np.int64),
            ann_len=np.ascontiguousarray(
                [a.length for a in idx.anns], dtype=np.int64),
        )
        names = [a.name.encode() for a in idx.anns]
        self._names_arr = (C.c_char_p * len(names))(*names)
        self.rnames = [a.name for a in idx.anns]
        self._lib = lib
        self._h = lib.tb_idx_new(
            idx.l_pac, idx.primary, idx.sa_intv, self._keep["L2"],
            self._keep["bwt_words"], self._keep["occ_cp"],
            self._keep["sa_samples"], self._keep["pac"],
            self._keep["ann_off"], self._keep["ann_len"], len(names),
            self._names_arr)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.tb_idx_free(self._h)
            self._h = None

    def smems(self, seq, opt: MemOptions):
        """[(k, l, s, qbeg, qend)] after both seeding rounds."""
        seq = np.ascontiguousarray(seq, dtype=np.uint8)
        rows = C.POINTER(C.c_int64)()
        n = self._lib.tb_smems(self._h, C.byref(to_copt(opt)), seq, len(seq),
                               C.byref(rows))
        return np.ctypeslib.as_array(rows, shape=(n, 5)).copy() if n else \
            np.empty((0, 5), dtype=np.int64)

    def chains(self, seq, opt: MemOptions, filtered=True):
        """Seed rows (rbeg, qbeg, len, chain_id) after chaining (+filter)."""
        seq = np.ascontiguousarray(seq, dtype=np.uint8)
        rows = C.POINTER(C.c_int64)()
        n = self._lib.tb_chains(self._h, C.byref(to_copt(opt)), seq, len(seq),
                                1 if filtered else 0, C.byref(rows))
        return np.ctypeslib.as_array(rows, shape=(n, 4)).copy() if n else \
            np.empty((0, 4), dtype=np.int64)

    def regs(self, seq, opt: MemOptions, read_id=0, stage=1):
        """AlnReg rows. stage 0: pre-dedup (rb,re,qb,qe,seedcov,score,
        truesc,seedlen0,csub,sub_n,w,sec); stage 1: post-dedup; stage 2:
        post-primary-marking (rid/sub in cols 4/7)."""
        seq = np.ascontiguousarray(seq, dtype=np.uint8)
        rows = C.POINTER(C.c_int64)()
        n = self._lib.tb_regs(self._h, C.byref(to_copt(opt)), seq, len(seq),
                              read_id, stage, C.byref(rows))
        return np.ctypeslib.as_array(rows, shape=(n, 12)).copy() if n else \
            np.empty((0, 12), dtype=np.int64)

    def regs_pre(self, seq, opt: MemOptions):
        """Pre-dedup regions in the device/finish 10-field layout + l_rep."""
        seq = np.ascontiguousarray(seq, dtype=np.uint8)
        rows = C.POINTER(C.c_int64)()
        l_rep = np.zeros(1, dtype=np.int32)
        n = self._lib.tb_regs_pre(self._h, C.byref(to_copt(opt)), seq,
                                  len(seq), C.byref(rows), l_rep)
        arr = (np.ctypeslib.as_array(rows, shape=(n, 10)).copy() if n
               else np.empty((0, 10), dtype=np.int64))
        return arr, int(l_rep[0])

    def align_pe(self, batch, opt: MemOptions, id0=0, rg_id=""):
        """Paired-end SAM for an interleaved ReadBatch (pair i = rows
        2i, 2i+1). Returns (sam_text, pes) where pes is a (4, 5) array of
        (low, high, failed, avg, std) per orientation FF/FR/RF/RR."""
        opt = opt.replace(flag=opt.flag | MemOptions.F_PE)
        seqs = np.ascontiguousarray(batch.seqs, dtype=np.uint8)
        lens = np.ascontiguousarray(batch.lens, dtype=np.int32)
        names = (C.c_char_p * batch.n)(*[n.encode() for n in batch.names])
        quals = (C.c_char_p * batch.n)(
            *[(q or "").encode() for q in batch.quals])
        pes = np.zeros((4, 5), dtype=np.float64)
        out_len = C.c_int64(0)
        ptr = self._lib.tb_align_pe_sam(
            self._h, C.byref(to_copt(opt)), seqs, lens, names, quals,
            batch.n, seqs.shape[1], id0, rg_id.encode(),
            np.ascontiguousarray(pes.reshape(-1)), C.byref(out_len))
        return C.string_at(ptr, out_len.value).decode(), pes

    def align_se(self, batch, opt: MemOptions, id0=0, rg_id="") -> str:
        """Full single-end SAM body text for a ReadBatch."""
        seqs = np.ascontiguousarray(batch.seqs, dtype=np.uint8)
        lens = np.ascontiguousarray(batch.lens, dtype=np.int32)
        names = (C.c_char_p * batch.n)(*[n.encode() for n in batch.names])
        quals = (C.c_char_p * batch.n)(
            *[(q or "").encode() for q in batch.quals])
        out_len = C.c_int64(0)
        ptr = self._lib.tb_align_se_sam(
            self._h, C.byref(to_copt(opt)), seqs, lens, names, quals,
            batch.n, seqs.shape[1] if seqs.ndim == 2 else len(seqs),
            id0, rg_id.encode(), C.byref(out_len))
        return C.string_at(ptr, out_len.value).decode()
