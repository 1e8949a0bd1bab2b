"""End-to-end single-end alignment pipeline: device worker1 + native finish.

The production data path (ARCHITECTURE.md):
  FASTQ batch -> device: SMEM seeding, chaining, chain filter, batched banded
  extension -> AlnRegs to host -> native C++: dedup/patch, primary marking,
  MAPQ, CIGAR (banded global), SAM text.
Reads whose device caps overflowed (too many SMEMs/seeds/chains/regs) are
re-aligned entirely by the scalar oracle — identical semantics, so caps trade
only throughput, never correctness.

Maps to the reference's FastMap.memSingleEndMapping -> worker1 -> worker2 flow
[ref: FastMap.scala; worker1/BWAMemWorker1.scala; worker2/BWAMemWorker2.scala].
"""
from __future__ import annotations

import ctypes as C

import numpy as np
import jax
import jax.numpy as jnp

from .chain.device import ChainConfig, chain_filter, chain_seeds, \
    seeds_from_smems
from .extend.worker import ExtendConfig, extend_chains
from .index.builder import FMIndex
from .index.device import DeviceIndex
from .io.fastx import ReadBatch
from .opts import MemOptions
from .oracle import Oracle, to_copt
from .seed.anchor import AnchorSeedConfig, collect_smems_anchor

REG_FIELDS = ("rb", "re", "qb", "qe", "score", "truesc", "w", "seedcov",
              "seedlen0", "rid")


def configs_from_opts(opt: MemOptions, max_smems=32, max_seeds=128,
                      max_chains=32, max_regs=32):
    scfg = AnchorSeedConfig(max_smems=max_smems,
                            min_seed_len=opt.min_seed_len,
                            split_len=opt.split_len,
                            split_width=opt.split_width)
    ccfg = ChainConfig(max_seeds=max_seeds, max_chains=max_chains,
                       max_occ=opt.max_occ, max_chain_gap=opt.max_chain_gap,
                       w=opt.w, min_seed_len=opt.min_seed_len,
                       mask_level=opt.mask_level, drop_ratio=opt.drop_ratio,
                       max_chain_extend=min(opt.max_chain_extend, 1 << 30),
                       min_chain_weight=opt.min_chain_weight)
    use_pallas = jax.default_backend() == "tpu"
    ecfg = ExtendConfig(max_regs=max_regs, w=opt.w, zdrop=opt.zdrop, a=opt.a,
                        b=opt.b, o_del=opt.o_del, e_del=opt.e_del,
                        o_ins=opt.o_ins, e_ins=opt.e_ins,
                        pen_clip5=opt.pen_clip5, pen_clip3=opt.pen_clip3,
                        use_pallas=use_pallas)
    return scfg, ccfg, ecfg


class Aligner:
    """Holds host+device index state and runs batches end to end."""

    def __init__(self, idx: FMIndex, opt: MemOptions = MemOptions(),
                 rg_id: str = "", **caps):
        self.idx = idx
        self.opt = opt
        self.rg_id = rg_id
        self.didx = DeviceIndex.from_host(idx)
        self.oracle = Oracle(idx)
        self.scfg, self.ccfg, self.ecfg = configs_from_opts(opt, **caps)
        self._packed_fn = None

    def worker1_device(self, seqs: jnp.ndarray, lens: jnp.ndarray):
        """Device half: returns the reg-state dict from extend_chains."""
        smems = collect_smems_anchor(self.didx, seqs, lens, self.scfg)
        seeds = seeds_from_smems(self.didx, smems, self.ccfg)
        ch = chain_seeds(self.didx, seeds, self.ccfg)
        flt = chain_filter(ch, self.ccfg)
        st = extend_chains(self.didx, seqs, lens, seeds, ch, self.ecfg, flt)
        st["l_rep"] = seeds["l_rep"]
        return st

    def worker1_packed(self, seqs: jnp.ndarray, lens: jnp.ndarray):
        """worker1 with all outputs packed into ONE int32 array so a single
        host transfer suffices (the tunnel/PCIe round trip dominates
        otherwise). Layout: (B, 3 + R*len(REG_FIELDS)) =
        [n, overflow, l_rep, rb[0..R), re[0..R), ...]."""
        if self._packed_fn is None:
            def packed(didx, seqs, lens):
                st = self.worker1_device_inner(didx, seqs, lens)
                cols = [st["n"][:, None],
                        st["overflow"].astype(jnp.int32)[:, None],
                        st["l_rep"][:, None]]
                cols += [st[f] for f in REG_FIELDS]
                return jnp.concatenate(cols, axis=1)
            self._packed_fn = jax.jit(packed)
        return self._packed_fn(self.didx, seqs, lens)

    def worker1_device_inner(self, didx, seqs, lens):
        smems = collect_smems_anchor(didx, seqs, lens, self.scfg)
        seeds = seeds_from_smems(didx, smems, self.ccfg)
        ch = chain_seeds(didx, seeds, self.ccfg)
        flt = chain_filter(ch, self.ccfg)
        st = extend_chains(didx, seqs, lens, seeds, ch, self.ecfg, flt)
        st["l_rep"] = seeds["l_rep"]
        return st

    def align_se(self, batch: ReadBatch, id0: int = 0) -> str:
        """Returns SAM body text for the batch (deterministic in id0)."""
        seqs = jnp.asarray(batch.seqs.astype(np.int32))
        lens = jnp.asarray(batch.lens)
        packed = np.asarray(self.worker1_packed(seqs, lens))  # ONE transfer
        R = self.ecfg.max_regs
        n = packed[:, 0]
        ovf = packed[:, 1].astype(bool)
        l_rep = packed[:, 2]
        arr = {f: packed[:, 3 + i * R: 3 + (i + 1) * R]
               for i, f in enumerate(REG_FIELDS)}

        out_parts: list[str] = []
        # group maximal runs of non-overflow reads into single native calls
        i = 0
        while i < batch.n:
            if ovf[i]:
                sub = _slice_batch(batch, i, i + 1)
                out_parts.append(
                    self.oracle.align_se(sub, self.opt, id0=id0 + i,
                                         rg_id=self.rg_id))
                i += 1
                continue
            j = i
            while j < batch.n and not ovf[j]:
                j += 1
            out_parts.append(self._finish_run(batch, arr, n, l_rep, i, j,
                                              id0))
            i = j
        return "".join(out_parts)

    def align_pe(self, batch: ReadBatch, id0: int = 0) -> str:
        """Paired-end SAM for an interleaved batch (pair i = rows 2i, 2i+1).

        Device worker1 computes per-end regions; reads that overflowed the
        device caps get host-computed regions (identical semantics); the
        native finisher then runs dedup + pestat + mate rescue + pairing +
        SAM [ref: FastMap.memPairEndMapping; bwa: mem_sam_pe].
        """
        opt_pe = self.opt.replace(flag=self.opt.flag | MemOptions.F_PE)
        seqs = jnp.asarray(batch.seqs.astype(np.int32))
        lens = jnp.asarray(batch.lens)
        packed = np.asarray(self.worker1_packed(seqs, lens))
        R = self.ecfg.max_regs
        n = packed[:, 0].copy()
        ovf = packed[:, 1].astype(bool)
        l_rep = packed[:, 2].copy()
        nf = len(REG_FIELDS)
        rows_per_read: list[np.ndarray] = []
        for b in range(batch.n):
            if ovf[b]:
                rows, lr = self.oracle.regs_pre(
                    batch.seqs[b][: batch.lens[b]], self.opt)
                rows_per_read.append(rows)
                n[b] = len(rows)
                l_rep[b] = lr
            else:
                rows = np.stack(
                    [packed[b, 3 + i * R: 3 + i * R + n[b]]
                     for i in range(nf)], axis=1)
                rows_per_read.append(rows.astype(np.int32))
        flat = (np.concatenate(rows_per_read, axis=0)
                if rows_per_read else np.empty((0, nf), np.int32))
        lib = self.oracle._lib
        seqs_h = np.ascontiguousarray(batch.seqs, dtype=np.uint8)
        lens_h = np.ascontiguousarray(batch.lens, dtype=np.int32)
        names = (C.c_char_p * batch.n)(*[s.encode() for s in batch.names])
        quals = (C.c_char_p * batch.n)(
            *[(q or "").encode() for q in batch.quals])
        out_len = C.c_int64(0)
        ptr = lib.tb_finish_pe_sam(
            self.oracle._h, C.byref(to_copt(opt_pe)), seqs_h, lens_h, names,
            quals, batch.n, seqs_h.shape[1],
            np.ascontiguousarray(flat.astype(np.int32)),
            np.ascontiguousarray(n.astype(np.int32)),
            np.ascontiguousarray(l_rep.astype(np.int32)),
            None, 0, id0, self.rg_id.encode(), C.byref(out_len))
        return C.string_at(ptr, out_len.value).decode()

    def _finish_run(self, batch, arr, n, l_rep, i, j, id0) -> str:
        lib = self.oracle._lib
        sub = _slice_batch(batch, i, j)
        m = j - i
        counts = n[i:j].astype(np.int32)
        flat = np.zeros((int(counts.sum()), len(REG_FIELDS)), dtype=np.int32)
        off = 0
        for b in range(i, j):
            for r in range(n[b]):
                flat[off] = [arr[f][b, r] for f in REG_FIELDS]
                off += 1
        seqs = np.ascontiguousarray(sub.seqs, dtype=np.uint8)
        lens = np.ascontiguousarray(sub.lens, dtype=np.int32)
        names = (C.c_char_p * m)(*[s.encode() for s in sub.names])
        quals = (C.c_char_p * m)(*[(q or "").encode() for q in sub.quals])
        out_len = C.c_int64(0)
        ptr = lib.tb_finish_se_sam(
            self.oracle._h, C.byref(to_copt(self.opt)), seqs, lens, names,
            quals, m, seqs.shape[1], np.ascontiguousarray(flat),
            np.ascontiguousarray(counts),
            np.ascontiguousarray(l_rep[i:j].astype(np.int32)),
            id0 + i, self.rg_id.encode(), C.byref(out_len))
        return C.string_at(ptr, out_len.value).decode()

    def sam_header(self, extra_pg: str = "tpubwa") -> str:
        lines = []
        for a in self.idx.anns:
            lines.append(f"@SQ\tSN:{a.name}\tLN:{a.length}")
        if self.rg_id:
            lines.append(f"@RG\tID:{self.rg_id}")
        lines.append(f"@PG\tID:{extra_pg}\tPN:{extra_pg}")
        return "\n".join(lines) + "\n"


def _slice_batch(batch: ReadBatch, i: int, j: int) -> ReadBatch:
    return ReadBatch(seqs=batch.seqs[i:j], lens=batch.lens[i:j],
                     names=batch.names[i:j], quals=batch.quals[i:j])
