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
import dataclasses

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
from .seed.lut import KmerLUT, LutSeedConfig, collect_smems_lut

REG_FIELDS = ("rb", "re", "qb", "qe", "score", "truesc", "w", "seedcov",
              "seedlen0", "rid")


def configs_from_opts(opt: MemOptions, max_smems=32, max_seeds=128,
                      max_chains=32, max_regs=32, seed_impl="lut",
                      text_len: int | None = None,
                      seed_kw: dict | None = None,
                      sa_dense: int | None = None):
    if seed_impl == "lut":
        # dense-walk budgets scale with the genome: the k-mer jump table is
        # capped at k0 <= 12, so on a large text most length-k0 intervals
        # are still multi-occurrence and the walk must (a) run more
        # full-width lockstep steps before compacting (until the random
        # k-mer existence probability collapses, ~log4(text) bases) and
        # (b) leave room for the repeat-family lanes that survive
        # indefinitely. Budgets verified by scripts/diag_scale.py.
        if text_len is None:
            text_len = 1 << 23
        import math
        lg4 = math.ceil(math.log(max(text_len, 4)) / math.log(4.0))
        k0 = max(1, min(12, opt.min_seed_len, lg4 + 1))
        fm_full = max(3, lg4 - k0 + 2)
        # fm_dense=16 everywhere below 1 Gbp: at 32 the dense FM loop's
        # survivor budget binds on repeat-rich genomes and routes ~16% of
        # the bench batch to tier-2 (~0.45 s/batch of big-caps device
        # re-runs); the wider loop itself costs only ~13 ms/batch
        # (scripts/tune_budgets.py + time_stages.py, round 4)
        fm_dense = 16 if text_len < 1 << 30 else 8
        offdiag_dense = 8 if text_len < 1 << 26 else 4
        kw = dict(max_smems=max_smems, min_seed_len=opt.min_seed_len,
                  split_len=opt.split_len, split_width=opt.split_width,
                  fm_full=fm_full, fm_dense=fm_dense,
                  offdiag_dense=offdiag_dense)
        kw.update(seed_kw or {})
        scfg = LutSeedConfig(**kw)
    else:
        scfg = AnchorSeedConfig(max_smems=max_smems,
                                min_seed_len=opt.min_seed_len,
                                split_len=opt.split_len,
                                split_width=opt.split_width)
    use_pallas = jax.default_backend() == "tpu"
    big = text_len is not None and text_len >= 1 << 30
    if sa_dense is None:
        # the dense SA-walk budget must hold the batch's TOTAL seed count:
        # on repeat-rich Gbp genomes the p50 read carries ~36 seeds and the
        # p90 ~177 (scripts/classify_overflow.py at 1.1 Gbp), so the
        # average-8 budget silently overflowed ~13% of reads to the host
        # oracle — the round-4 genome-scale wall. sa_dense=max_seeds can
        # never overflow; small genomes keep the lean budget (their walk
        # is also 8x shorter at sa_intv=4).
        sa_dense = max_seeds if big else 8
    ccfg = ChainConfig(max_seeds=max_seeds, max_chains=max_chains,
                       max_occ=opt.max_occ, max_chain_gap=opt.max_chain_gap,
                       w=opt.w, min_seed_len=opt.min_seed_len,
                       mask_level=opt.mask_level, drop_ratio=opt.drop_ratio,
                       max_chain_extend=min(opt.max_chain_extend, 1 << 30),
                       min_chain_weight=opt.min_chain_weight,
                       sa_dense=sa_dense)
    ecfg = ExtendConfig(max_regs=max_regs, w=opt.w, zdrop=opt.zdrop, a=opt.a,
                        b=opt.b, o_del=opt.o_del, e_del=opt.e_del,
                        o_ins=opt.o_ins, e_ins=opt.e_ins,
                        pen_clip5=opt.pen_clip5, pen_clip3=opt.pen_clip3,
                        use_pallas=use_pallas,
                        full_rounds=2 if big else 1,
                        tail_rows=4 if big else 8,
                        cand_mult=4 if big else 1)
    return scfg, ccfg, ecfg


class Aligner:
    """Holds host+device index state and runs batches end to end."""

    def __init__(self, idx: FMIndex, opt: MemOptions = MemOptions(),
                 rg_id: str = "", seed_impl: str = "lut",
                 lut_cache=None, **caps):
        self.idx = idx
        self.opt = opt
        self.rg_id = rg_id
        self.didx = DeviceIndex.from_host(idx)
        self.oracle = Oracle(idx)
        self.seed_impl = seed_impl
        self._explicit_caps = dict(caps)
        self.scfg, self.ccfg, self.ecfg = configs_from_opts(
            opt, seed_impl=seed_impl, text_len=2 * int(idx.l_pac), **caps)
        self.lut = (KmerLUT.build(idx, min_seed_len=opt.min_seed_len,
                                  cache=lut_cache)
                    if seed_impl == "lut" else None)
        self._packed_fn = None
        self._mesh = None       # lazy 1-device mesh for the pestat psum
        self._oracle_pool = [self.oracle]   # per-finish-thread handles
        # running workload-honesty counters (reset freely by callers):
        # fallback_reads = reads realigned by the host oracle after a
        # device-cap overflow — the benchmark reports this rate
        self.stats = {"reads": 0, "fallback_reads": 0}

    def worker1_device(self, seqs: jnp.ndarray, lens: jnp.ndarray):
        """Device half: returns the reg-state dict from extend_chains."""
        smems = self._collect_smems(self.didx, seqs, lens)
        seeds = seeds_from_smems(self.didx, smems, self.ccfg)
        ch = chain_seeds(self.didx, seeds, self.ccfg)
        flt = chain_filter(ch, self.ccfg)
        st = extend_chains(self.didx, seqs, lens, seeds, ch, self.ecfg, flt)
        st["l_rep"] = seeds["l_rep"]
        return st

    # regs/read capacity of the compact transfer buffer; reads needing more
    # fall back to the oracle (mean regs/read is ~1 on real data)
    CAP_FACTOR = 4

    # tier-1 caps scale with read length: a 150 bp read legitimately
    # carries ~1.5x the SMEMs/seeds of a 100 bp read, and an undersized
    # cap routes 5-8% of PE batches through the ~1 s blocking tier-2 call
    # (the round-4 PE/SE gap). Buckets keep the jit count bounded.
    # longer reads also carry MORE 2nd-round reseed candidates (>3 at
    # 150 bp on repeat-rich genomes) — measured: max_reseed=6 + full-width
    # r=1 + a wider off-diagonal budget take 150 bp overflow from 11% to 0
    _CAP_BUCKETS = ((100, {}),
                    (160, dict(max_smems=48, max_seeds=192,
                               max_chains=48, max_regs=48,
                               seed_kw=dict(max_reseed=5, r2_rows=1,
                                            offdiag_dense=4))),
                    (1 << 30, dict(max_smems=63, max_seeds=288,
                                   max_chains=63, max_regs=63,
                                   seed_kw=dict(max_reseed=6, r2_rows=1,
                                                offdiag_dense=4))))

    def _packed_for_len(self, L: int):
        """The packed worker1 jit whose caps match read length L."""
        if self._explicit_caps or L <= self._CAP_BUCKETS[0][0]:
            if self._packed_fn is None:
                self._packed_fn = self._make_packed(self.scfg, self.ccfg,
                                                    self.ecfg)
            return self._packed_fn
        fns = getattr(self, "_packed_by_len", None)
        if fns is None:
            fns = self._packed_by_len = {}
        for bound, caps in self._CAP_BUCKETS[1:]:
            if L <= bound:
                break
        if bound not in fns:
            scfg, ccfg, ecfg = configs_from_opts(
                self.opt, seed_impl=self.seed_impl,
                text_len=2 * int(self.idx.l_pac), **caps)
            fns[bound] = self._make_packed(scfg, ccfg, ecfg)
        return fns[bound]

    def worker1_packed(self, seqs: jnp.ndarray, lens: jnp.ndarray):
        """worker1 with all outputs compacted + bit-packed into ONE int32
        array so a single, small host transfer suffices (device->host
        bandwidth over the interconnect dominates the batch wall time
        otherwise; the (B, R) reg grid is ~97% padding at R=32).

        Layout: [counts(B) | regs(cap, 6) row-major], cap = CAP_FACTOR*B.
          counts[b] = n_eff | overflow<<6 | l_rep<<7
          reg words: w0=rb low 32 bits; w1=(re-rb)|qb<<16;
                     w2=(qe-qb)|score<<16; w3=truesc|w<<16;
                     w4=seedcov|seedlen0<<10|rid<<20; w5=rb high bits
                     (always 0 below 2 Gbp text — kept for a uniform
                     layout; GRCh38 positions need 33 bits).
        Regs of read b occupy rows [sum(n_eff[:b]), +n_eff[b]) — offsets are
        recomputed on host from counts. Any read whose fields exceed the bit
        budgets (or whose regs would overflow cap) gets overflow=1, n_eff=0
        and is realigned by the oracle, so packing never affects output.
        """
        return self._packed_for_len(int(seqs.shape[1]))(
            self.didx, self.lut, seqs, lens)

    def _make_packed(self, scfg, ccfg, ecfg, cap_factor: int | None = None):
        R = ecfg.max_regs
        assert R <= 1023          # 10-bit count field
        cap_factor = cap_factor if cap_factor is not None else \
            self.CAP_FACTOR

        def packed(didx, lut, seqs, lens):
            seqs = seqs.astype(jnp.int32)   # uint8 over the wire
            st = self._device_inner(didx, seqs, lens, lut, scfg, ccfg,
                                    ecfg)
            B = seqs.shape[0]
            cap = cap_factor * B
            rb, re = st["rb"], st["re"]
            qb, qe = st["qb"], st["qe"]
            score, truesc = st["score"], st["truesc"]
            w, seedcov = st["w"], st["seedcov"]
            seedlen0, rid = st["seedlen0"], st["rid"]
            ridx = jnp.arange(R, dtype=jnp.int32)[None, :]
            valid0 = ridx < st["n"][:, None]

            def inrange(v, hi):
                return (v >= 0) & (v <= hi)

            ok = (inrange(re - rb, 0xFFFF) & inrange(qb, 0x7FFF)
                  & inrange(qe - qb, 0xFFFF) & inrange(score, 0x7FFF)
                  & inrange(truesc, 0xFFFF) & inrange(w, 0x7FFF)
                  & inrange(seedcov, 0x3FF) & inrange(seedlen0, 0x3FF)
                  & inrange(rid, 0x7FF))
            ovf = st["overflow"] | jnp.any(valid0 & ~ok, axis=1)
            ne = jnp.where(ovf, 0, st["n"])
            off = jnp.cumsum(ne) - ne
            capovf = off + ne > cap
            ovf = ovf | capovf
            ne = jnp.where(capovf, 0, ne)

            if rb.dtype == jnp.int64:
                rb_lo = (rb & 0xFFFFFFFF).astype(jnp.uint32) \
                    .astype(jnp.int32)   # wraps: reinterpret low word
                rb_hi = (rb >> 32).astype(jnp.int32)
            else:
                rb_lo = rb
                rb_hi = jnp.zeros_like(rb)
            words = jnp.stack([
                rb_lo,
                (re - rb).astype(jnp.int32) | (qb << 16),
                (qe - qb) | (score << 16),
                truesc | (w << 16),
                seedcov | (seedlen0 << 10) | (rid << 20),
                rb_hi,
            ], axis=-1).reshape(B * R, 6)
            valid = (ridx < ne[:, None]).reshape(-1)
            csum = jnp.cumsum(valid.astype(jnp.int32))
            src = jnp.searchsorted(csum, jnp.arange(1, cap + 1,
                                                    dtype=jnp.int32))
            rows = jnp.where((src < B * R)[:, None],
                             words[jnp.clip(src, 0, B * R - 1)], 0)
            counts = (ne | ovf.astype(jnp.int32) << 10
                      | st["l_rep"] << 11)
            return jnp.concatenate([counts, rows.reshape(-1)])

        return jax.jit(packed)

    def _unpack_host(self, buf: np.ndarray, B: int):
        """Inverse of worker1_packed's packing: returns (n, ovf, l_rep,
        flat regs (total, 10) int64 in REG_FIELDS order)."""
        counts = buf[:B]
        ne = counts & 1023
        ovf = ((counts >> 10) & 1).astype(bool)
        l_rep = counts >> 11
        total = int(ne.sum())
        rows = buf[B:].reshape(-1, 6)[:total].astype(np.int64)
        rb = (rows[:, 5] << 32) | (rows[:, 0] & 0xFFFFFFFF)
        re = rb + (rows[:, 1] & 0xFFFF)
        qb = rows[:, 1] >> 16
        qe = qb + (rows[:, 2] & 0xFFFF)
        score = rows[:, 2] >> 16
        truesc = rows[:, 3] & 0xFFFF
        w = rows[:, 3] >> 16
        seedcov = rows[:, 4] & 0x3FF
        seedlen0 = (rows[:, 4] >> 10) & 0x3FF
        rid = rows[:, 4] >> 20
        flat = np.stack([rb, re, qb, qe, score, truesc, w, seedcov,
                         seedlen0, rid], axis=1).astype(np.int64)
        return ne.astype(np.int32), ovf, l_rep.astype(np.int32), flat

    def _collect_smems(self, didx, seqs, lens, lut=None, scfg=None):
        scfg = scfg or self.scfg
        if self.seed_impl == "lut":
            return collect_smems_lut(didx, lut if lut is not None
                                     else self.lut, seqs, lens, scfg)
        return collect_smems_anchor(didx, seqs, lens, scfg)

    def _device_inner(self, didx, seqs, lens, lut, scfg, ccfg, ecfg):
        smems = self._collect_smems(didx, seqs, lens, lut, scfg)
        seeds = seeds_from_smems(didx, smems, ccfg)
        ch = chain_seeds(didx, seeds, ccfg)
        flt = chain_filter(ch, ccfg)
        st = extend_chains(didx, seqs, lens, seeds, ch, ecfg, flt)
        st["l_rep"] = seeds["l_rep"]
        return st

    def worker1_device_inner(self, didx, seqs, lens, lut=None):
        return self._device_inner(didx, seqs, lens, lut, self.scfg,
                                  self.ccfg, self.ecfg)

    # ---- tier-2: big-caps device path for reads that overflow the fast
    # tier's static caps (repeat-dense reads: a single max_occ=500 SMEM
    # yields 500 seeds). Only reads overflowing BOTH tiers reach the host
    # oracle, so the common case stays on the small fast kernels.
    TIER2_ROWS = 512          # sub-batch row quantum for the big tier

    def _packed_big_fn(self):
        if getattr(self, "_packed_big", None) is None:
            big = dict(max_smems=63, max_seeds=640, max_chains=64,
                       max_regs=63)
            scfg, ccfg, ecfg = configs_from_opts(
                self.opt, seed_impl=self.seed_impl,
                text_len=2 * int(self.idx.l_pac), sa_dense=640, **big)
            if isinstance(scfg, LutSeedConfig):
                scfg = dataclasses.replace(scfg, fm_dense=4,
                                           offdiag_dense=2, r2_rows=1,
                                           max_reseed=8)
            # tier-2 reads are repeat-dense (up to max_chains extensions
            # each), which made the ROUND engine run tens of sequential
            # window+kernel rounds per call at genome scale; the
            # task-parallel engine with a 16x candidate budget covers the
            # worst single read (640 seeds) and turns that into one flat
            # kernel batch. Reads beyond the budget fall to the oracle —
            # the same failure mode the seed cap already has.
            ecfg = dataclasses.replace(ecfg, tail_rows=1,
                                       task_parallel=True,
                                       cand_mult=16, retry_rows=2)
            self._packed_big = self._make_packed(scfg, ccfg, ecfg)
        return self._packed_big

    # below this many overflow reads, tier-2 is skipped and the scalar
    # oracle realigns them on the host instead: the big-caps device call
    # costs ~0.3 s of device time regardless of row count (it pads to
    # TIER2_ROWS and serializes with the next batch's worker1 on the
    # device queue), while a handful of oracle reads run on a spare core
    # UNDER the next batch's device compute
    TIER2_MIN = 64

    # ---- tier-3: the p99 seed tail. classify_overflow at 1.1/3.1 Gbp:
    # seed-count p99 ~1120 > tier-2's 640 cap, and each such read costs
    # ~0.1 s in the scalar oracle — the genome-scale wall-clock tail.
    TIER3_ROWS = 128
    TIER3_MIN = 8

    def _packed_big3_fn(self):
        if getattr(self, "_packed_big3", None) is None:
            # chains AND regions scale together: a multi-repeat-family
            # read forms ~one chain per occurrence (each a distinct kept
            # locus), and every kept chain yields a region — bwa then
            # marks all but one secondary. Hundreds of each.
            big = dict(max_smems=63, max_seeds=1280, max_chains=512,
                       max_regs=512)
            scfg, ccfg, ecfg = configs_from_opts(
                self.opt, seed_impl=self.seed_impl,
                text_len=2 * int(self.idx.l_pac), sa_dense=1280, **big)
            if isinstance(scfg, LutSeedConfig):
                # full-width dense budgets: a tier-3 batch is ALL
                # repeat-monsters, so per-batch survivor budgets sized for
                # mixed traffic would overflow immediately
                scfg = dataclasses.replace(scfg, fm_dense=1,
                                           offdiag_dense=1, r2_rows=1,
                                           max_reseed=8)
            # ROUND engine here: a mega-repeat read extends hundreds of
            # seeds and the task-parallel engine's optimistic candidate
            # superset degenerates (round-1 containment captures almost
            # nothing when every seed sits on a different diagonal), so
            # the flat budget would need B*max_seeds tasks. Sequential
            # rounds at 128 rows are ~1 s/call and exact by construction.
            ecfg = dataclasses.replace(ecfg, tail_rows=1,
                                       task_parallel=False, retry_rows=2)
            self._packed_big3 = self._make_packed(scfg, ccfg, ecfg,
                                                  cap_factor=512)
        return self._packed_big3

    def _tier3(self, batch: ReadBatch, n, ovf, l_rep, flat):
        """Re-run remaining overflow reads (typically >640-seed repeat
        monsters) through the 1280-seed device path; anything left after
        this goes to the oracle."""
        rows = np.flatnonzero(ovf)
        if len(rows) < self.TIER3_MIN:
            return n, ovf, l_rep, flat
        pad = (-len(rows)) % self.TIER3_ROWS
        rsel = np.concatenate([rows, np.repeat(rows[-1:], pad)])
        seqs = jnp.asarray(np.ascontiguousarray(batch.seqs[rsel]))
        lens2 = jnp.asarray(np.ascontiguousarray(batch.lens[rsel]))
        dev = self._packed_big3_fn()(self.didx, self.lut, seqs, lens2)
        return self._tier2_merge(batch, n, ovf, l_rep, flat,
                                 (rows, rsel, dev))

    def _tier2_dispatch(self, batch: ReadBatch, ovf):
        """Issue the big-caps device call for tier-1-overflow reads.

        Returns (rows, rsel, device_buffer) with the device work IN FLIGHT
        (nothing blocks until _tier2_merge downloads it), or None when no
        read overflowed (or few enough that the host oracle is cheaper) —
        so callers can finish the clean reads on the host while tier-2
        computes."""
        rows = np.flatnonzero(ovf)
        self.stats["tier1_ovf"] = self.stats.get("tier1_ovf", 0) + len(rows)
        # relative gate: the big-caps call costs ~0.3-1.0 s of device time
        # regardless of count; below ~6% of the batch the host oracle
        # (~0.7 ms/read, overlapped with the next batch's device work) is
        # cheaper. At genome scale overflow rates are far above the gate
        # and tier-2 still runs. NOTE the overlap argument holds for the
        # streamed paths (align_se_stream/align_pe_stream); in plain
        # align_se/align_pe the sub-gate oracle realignments run serially
        # on the finish path — acceptable, those entry points are the
        # non-production compile/debug ones.
        if len(rows) < max(self.TIER2_MIN, batch.n // 16):
            return None
        pad = (-len(rows)) % self.TIER2_ROWS
        rsel = np.concatenate([rows, np.repeat(rows[-1:], pad)])
        seqs = jnp.asarray(np.ascontiguousarray(batch.seqs[rsel]))
        lens2 = jnp.asarray(np.ascontiguousarray(batch.lens[rsel]))
        return rows, rsel, self._packed_big_fn()(self.didx, self.lut,
                                                 seqs, lens2)

    def _tier2_merge(self, batch: ReadBatch, n, ovf, l_rep, flat, t2):
        """Download the tier-2 result (blocks on the device) and splice the
        re-run reads' regions back in; returns updated (n, ovf, l_rep,
        flat)."""
        rows, rsel, dev = t2
        buf = np.asarray(dev)
        n2, ovf2, lrep2, flat2 = self._unpack_host(buf, len(rsel))
        offs2 = np.concatenate([[0], np.cumsum(n2)])
        offs = np.concatenate([[0], np.cumsum(n)])
        per_read: list = []
        for b in range(batch.n):
            per_read.append(flat[offs[b]:offs[b + 1]])
        for k, r in enumerate(rows):
            n[r] = n2[k]
            ovf[r] = ovf2[k]
            l_rep[r] = lrep2[k]
            per_read[r] = flat2[offs2[k]:offs2[k + 1]]
        flat = (np.concatenate(per_read, axis=0) if batch.n
                else np.empty((0, len(REG_FIELDS)), np.int64))
        return n, ovf, l_rep, flat

    def _tier2(self, batch: ReadBatch, n, ovf, l_rep, flat):
        """Re-run tier-1-overflow reads through the big-caps device path
        (then tier-3 for the seed-count tail) and merge results; returns
        updated (n, ovf, l_rep, flat)."""
        t2 = self._tier2_dispatch(batch, ovf)
        if t2 is not None:
            n, ovf, l_rep, flat = self._tier2_merge(batch, n, ovf, l_rep,
                                                    flat, t2)
        if ovf.any():
            n, ovf, l_rep, flat = self._tier3(batch, n, ovf, l_rep, flat)
        return n, ovf, l_rep, flat

    # read-length bucket granularity (SURVEY.md §5.7 "read-length bucketing
    # so padding waste stays bounded"): a mixed-length batch is split into
    # per-bucket device calls, each padded to a multiple of BUCKET lanes,
    # and the outputs are re-interleaved into input order before finishing
    BUCKET = 64

    def align_se(self, batch: ReadBatch, id0: int = 0) -> str:
        """Returns SAM body text for the batch (deterministic in id0).

        Mixed-length batches route through per-bucket device calls; padding
        waste per read is < BUCKET lanes instead of (max_len - len).
        """
        return self._finish_se_dispatched(batch, self._dispatch_se(batch),
                                          id0)

    def _dispatch_se(self, batch: ReadBatch):
        """Issue (async) worker1 device calls for a batch. Returns a list
        of (rows, device_buffer, n_sub): one entry for a uniform batch,
        one per length bucket for a mixed batch."""
        lens = np.asarray(batch.lens)
        W = batch.seqs.shape[1]
        wb = min(int(np.max(-(-lens // self.BUCKET)) * self.BUCKET), W) \
            if batch.n else W
        if batch.n == 0 or wb >= W:
            # uniform enough: one full-width call (also the fast path the
            # fixed-length benchmarks compile once)
            seqs = jnp.asarray(batch.seqs)  # uint8 over the wire
            return [(None, self.worker1_packed(seqs, jnp.asarray(lens)),
                     batch.n)]
        if np.min(lens) > wb - self.BUCKET:
            # single-bucket batch padded wider than its bucket (e.g. all
            # 76 bp reads in a max_len=250 batch): truncate the device call
            # to the bucket width so padding waste stays < BUCKET lanes
            seqs = jnp.asarray(np.ascontiguousarray(batch.seqs[:, :wb]))
            return [(None, self.worker1_packed(seqs, jnp.asarray(lens)),
                     batch.n)]
        parts = []
        wbs = np.minimum((-(-lens // self.BUCKET)) * self.BUCKET, W)
        for w in sorted(set(int(x) for x in wbs)):
            rows = np.flatnonzero(wbs == w)
            pad = (-len(rows)) % 128      # bound distinct jit shapes
            rsel = np.concatenate([rows, np.repeat(rows[-1:], pad)])
            seqs = jnp.asarray(np.ascontiguousarray(batch.seqs[rsel, :w]))
            parts.append((rows, self.worker1_packed(
                seqs, jnp.asarray(lens[rsel])), len(rsel)))
        return parts

    def _finish_se_dispatched(self, batch: ReadBatch, parts, id0: int):
        if len(parts) == 1 and parts[0][0] is None:
            return self._finish_se_buf(batch, np.asarray(parts[0][1]), id0)
        B = batch.n
        n = np.zeros(B, np.int32)
        ovf = np.zeros(B, bool)
        l_rep = np.zeros(B, np.int32)
        per_read: list = [None] * B
        for rows, dev, n_sub in parts:
            ns, ovfs, lrs, flats = self._unpack_host(np.asarray(dev), n_sub)
            offs = np.concatenate([[0], np.cumsum(ns)])
            for k, r in enumerate(rows):
                n[r] = ns[k]
                ovf[r] = ovfs[k]
                l_rep[r] = lrs[k]
                per_read[r] = flats[offs[k]:offs[k + 1]]
        flat = (np.concatenate(per_read, axis=0) if B
                else np.empty((0, len(REG_FIELDS)), np.int64))
        return self._finish_se_parts(batch, n, ovf, l_rep, flat, id0)

    def align_se_stream(self, batches, id0: int = 0, depth: int = 2):
        """Pipelined SE alignment over an iterable of ReadBatches.

        Dispatches worker1 for up to `depth` batches ahead (async), so the
        device computes batch i+1 while the host downloads/finishes batch i
        — the Spark-free analog of the reference's overlapping stages.
        Yields SAM body text per batch, in order.

        Items may also be (ReadBatch, explicit_id0) pairs — used by the
        resumable CLI shard path, where skipped (already-done) batches
        leave gaps in the global read numbering.
        """
        pending: list[tuple[ReadBatch, object, int]] = []
        n = id0
        for item in batches:
            b, i0 = item if isinstance(item, tuple) else (item, None)
            if i0 is not None:
                n = i0
            pending.append((b, self._dispatch_se(b), n))
            n += b.n
            if len(pending) >= depth:
                bb, parts, i0 = pending.pop(0)
                yield self._finish_se_dispatched(bb, parts, i0)
        for bb, parts, i0 in pending:
            yield self._finish_se_dispatched(bb, parts, i0)

    def _finish_se_buf(self, batch: ReadBatch, buf: np.ndarray,
                       id0: int) -> str:
        n, ovf, l_rep, flat = self._unpack_host(buf, batch.n)
        return self._finish_se_parts(batch, n, ovf, l_rep, flat, id0)

    def _finish_se_parts(self, batch: ReadBatch, n, ovf, l_rep, flat,
                         id0: int) -> str:
        self.stats["reads"] += batch.n
        t2 = self._tier2_dispatch(batch, ovf) if ovf.any() else None
        if t2 is None:
            if ovf.any():
                # tier-2's gate routed these to the host — but mega-repeat
                # reads are exactly where the scalar oracle is slowest, so
                # give the seed-tail tier a chance first (its caps are a
                # superset of tier-2's)
                n, ovf, l_rep, flat = self._tier3(batch, n, ovf, l_rep,
                                                  flat)
            offs_all = np.concatenate([[0], np.cumsum(n)])
            # any remaining overflow rows go straight to the host oracle
            self.stats["fallback_reads"] += int(ovf.sum())
            return self._finish_threaded(batch, n, ovf, l_rep, flat,
                                         offs_all, id0)
        offs_all = np.concatenate([[0], np.cumsum(n)])

        # tier-2 is IN FLIGHT on the device: finish the clean reads' runs
        # on the host now so the big-caps re-run costs (almost) no wall
        # time, then splice the tier-2 results in and finish the rest.
        # Output pieces carry their start read index and are joined in
        # order — byte-identical to the serial path.
        pieces: list[tuple[int, str]] = []
        B = batch.n
        i = 0
        while i < B:
            if ovf[i]:
                i += 1
                continue
            j = i
            while j < B and not ovf[j]:
                j += 1
            pieces.append((i, self._finish_run(
                batch, flat[offs_all[i]:offs_all[j]], n, l_rep, i, j, id0,
                self.oracle)))
            i = j

        rows = t2[0]
        n, ovf, l_rep, flat = self._tier2_merge(batch, n, ovf, l_rep,
                                                flat, t2)
        if ovf.any():
            n, ovf, l_rep, flat = self._tier3(batch, n, ovf, l_rep, flat)
        self.stats["fallback_reads"] += int(ovf.sum())
        offs2 = np.concatenate([[0], np.cumsum(n)])
        k = 0
        while k < len(rows):
            r = int(rows[k])
            if ovf[r]:
                sub = _slice_batch(batch, r, r + 1)
                pieces.append((r, self.oracle.align_se(
                    sub, self.opt, id0=id0 + r, rg_id=self.rg_id)))
                k += 1
                continue
            # group tier-2-resolved reads that are adjacent in read order
            k2 = k + 1
            while (k2 < len(rows) and int(rows[k2]) == r + (k2 - k)
                   and not ovf[int(rows[k2])]):
                k2 += 1
            j = int(rows[k2 - 1]) + 1
            pieces.append((r, self._finish_run(
                batch, flat[offs2[r]:offs2[j]], n, l_rep, r, j, id0,
                self.oracle)))
            k = k2
        pieces.sort(key=lambda p: p[0])
        return "".join(s for _, s in pieces)

    def _finish_threaded(self, batch, n, ovf, l_rep, flat, offs_all,
                         id0: int) -> str:
        """Native finish over contiguous read chunks, threaded when the
        host has cores to spare (the ctypes calls release the GIL and each
        chunk runs on its own native handle). Joined in order — output is
        byte-identical to the serial path."""
        k = min(self._n_finish_threads(), max(batch.n // 256, 1))
        if k <= 1:
            return self._finish_chunk(batch, n, ovf, l_rep, flat, offs_all,
                                      0, batch.n, id0, self.oracle)
        import concurrent.futures as cf
        bounds = [round(batch.n * t / k) for t in range(k + 1)]
        oracles = self._finish_oracles(k)
        with cf.ThreadPoolExecutor(max_workers=k) as ex:
            futs = [ex.submit(self._finish_chunk, batch, n, ovf, l_rep,
                              flat, offs_all, bounds[t], bounds[t + 1],
                              id0, oracles[t])
                    for t in range(k)]
            return "".join(f.result() for f in futs)

    def _n_finish_threads(self) -> int:
        """Leave one core for the dispatching Python thread: on a 2-core
        host, 2 finish threads measured SLOWER than 1 (GIL-holding numpy
        slices + pool overhead exceed the win — scripts/profile_finish.py)."""
        import os
        return max(1, min(8, (os.cpu_count() or 2) - 1))

    def _finish_oracles(self, k: int):
        """Per-thread native handles over the same (kept-alive) index."""
        while len(self._oracle_pool) < k:
            self._oracle_pool.append(Oracle(self.idx))
        return self._oracle_pool[:k]

    def _finish_chunk(self, batch, n, ovf, l_rep, flat, offs_all, lo, hi,
                      id0, oracle) -> str:
        out_parts: list[str] = []
        # group maximal runs of non-overflow reads into single native calls
        i = lo
        while i < hi:
            if ovf[i]:
                sub = _slice_batch(batch, i, i + 1)
                out_parts.append(
                    oracle.align_se(sub, self.opt, id0=id0 + i,
                                    rg_id=self.rg_id))
                i += 1
                continue
            j = i
            while j < hi and not ovf[j]:
                j += 1
            out_parts.append(self._finish_run(
                batch, flat[offs_all[i]:offs_all[j]], n, l_rep, i, j, id0,
                oracle))
            i = j
        return "".join(out_parts)

    def align_pe(self, batch: ReadBatch, id0: int = 0) -> str:
        """Paired-end SAM for an interleaved batch (pair i = rows 2i, 2i+1).

        The TPU-native PE flow [ref: FastMap.memPairEndMapping;
        bwa: mem_sam_pe]:
          1. device worker1 per end (overflowed reads get host-computed
             regions, identical semantics);
          2. per-pair insert samples (native) -> orientation histogram
             psum'd over the device mesh -> pestat from the histogram
             (the reference's driver collect+broadcast as one collective);
          3. all mate-rescue SW windows of the batch in ONE device
             local-alignment call (pair/rescue.py);
          4. native pairing/flags/TLEN/SAM replay with the device results
             injected.
        """
        seqs = jnp.asarray(batch.seqs)  # uint8 over the wire
        lens = jnp.asarray(batch.lens)
        buf = np.asarray(self.worker1_packed(seqs, lens))
        return self._finish_pe_buf(batch, buf, id0)

    def align_pe_stream(self, batches, id0: int = 0, depth: int = 2):
        """Pipelined PE alignment. Dispatch ORDER is the whole game: the
        device queue is FIFO, so batch i's small PE calls (pestat psum,
        rescue kernel) must be enqueued BEFORE batch i+1's worker1 — else
        each waits out a ~worker1 of queue latency (the round-4 4x PE/SE
        gap). Per batch: download worker1 -> stage A (host isize, psum,
        hist, native task gen, rescue DISPATCH) -> enqueue next worker1 ->
        stage B (rescue download + native pair/SAM, overlapped with the
        next batch's device time). Yields SAM text per batch."""
        prev: tuple[ReadBatch, object, int] | None = None
        n = id0
        for item in batches:
            b, i0x = item if isinstance(item, tuple) else (item, None)
            if i0x is not None:
                n = i0x
            if prev is not None:
                bb, dev, i0 = prev
                ctx = self._pe_stage_a(bb, np.asarray(dev), i0)
                devb = self.worker1_packed(jnp.asarray(b.seqs),
                                           jnp.asarray(b.lens))
                sam = self._pe_stage_b(ctx)
                yield sam
            else:
                devb = self.worker1_packed(jnp.asarray(b.seqs),
                                           jnp.asarray(b.lens))
            prev = (b, devb, n)
            n += b.n // 2
        if prev is not None:
            bb, dev, i0 = prev
            yield self._pe_stage_b(self._pe_stage_a(bb, np.asarray(dev),
                                                    i0))

    def _pe_mesh(self):
        if self._mesh is None:
            from .dist.mesh import make_mesh
            self._mesh = make_mesh(1, local=True)
        return self._mesh

    def _finish_pe_buf(self, batch: ReadBatch, buf: np.ndarray,
                       id0: int) -> str:
        return self._pe_stage_b(self._pe_stage_a(batch, buf, id0))

    def _pe_stage_a(self, batch: ReadBatch, buf: np.ndarray, id0: int):
        """PE finish, part A: unpack + tier-2 + native isize sampling +
        pestat histogram collective + native rescue-task generation +
        rescue kernel DISPATCH. Returns the context for _pe_stage_b with
        the rescue device call in flight (nothing downloads it here), so
        the stream can enqueue the next batch's worker1 behind it."""
        from .dist.mesh import pe_hist_psum
        from .pair.rescue import dispatch_rescue_tasks
        opt_pe = self.opt.replace(flag=self.opt.flag | MemOptions.F_PE)
        n, ovf, l_rep, flat = self._unpack_host(buf, batch.n)
        if ovf.any():
            n, ovf, l_rep, flat = self._tier2(batch, n, ovf, l_rep, flat)
        self.stats["reads"] += batch.n
        self.stats["fallback_reads"] += int(ovf.sum())
        if ovf.any():
            offs = np.concatenate([[0], np.cumsum(n)])
            parts: list[np.ndarray] = []
            for b in range(batch.n):
                if ovf[b]:
                    rows, lr = self.oracle.regs_pre(
                        batch.seqs[b][: batch.lens[b]], self.opt)
                    parts.append(rows)
                    n[b] = len(rows)
                    l_rep[b] = lr
                else:
                    parts.append(flat[offs[b]:offs[b + 1]])
            flat = (np.concatenate(parts, axis=0) if parts
                    else np.empty((0, len(REG_FIELDS)), np.int64))
        lib = self.oracle._lib
        copt = to_copt(opt_pe)
        seqs_h = np.ascontiguousarray(batch.seqs, dtype=np.uint8)
        lens_h = np.ascontiguousarray(batch.lens, dtype=np.int32)
        flat_h = np.ascontiguousarray(flat.astype(np.int64))
        n_h = np.ascontiguousarray(n.astype(np.int32))
        lrep_h = np.ascontiguousarray(l_rep.astype(np.int32))
        stride = seqs_h.shape[1]

        # ---- pestat: native per-pair samples -> device histogram psum ----
        n_pairs = batch.n // 2
        dirs = np.zeros(max(n_pairs, 1), np.int32)
        isz = np.zeros(max(n_pairs, 1), np.int64)
        lib.tb_pe_isize(self.oracle._h, C.byref(copt), seqs_h, lens_h,
                        batch.n, stride, flat_h, n_h, lrep_h, dirs, isz)
        hist = pe_hist_psum(self._pe_mesh(), dirs[:n_pairs], isz[:n_pairs],
                            self.opt.max_ins)
        from .dist.multihost import hist_allreduce
        hist = hist_allreduce(hist)   # DCN leg; no-op single-process
        hist_h = np.ascontiguousarray(hist, dtype=np.int64)

        # ---- mate rescue: one batched device local-alignment call,
        # dispatched async ----
        rowsp = C.POINTER(C.c_int64)()
        n_t = lib.tb_pe_rescue_tasks(
            self.oracle._h, C.byref(copt), seqs_h, lens_h, batch.n, stride,
            flat_h, n_h, lrep_h, hist_h.ctypes.data_as(C.c_void_p),
            self.opt.max_ins, id0, C.byref(rowsp))
        self.stats["rescue_tasks"] = self.stats.get("rescue_tasks", 0) + n_t
        tasks = res_dev = None
        if n_t:
            tasks = np.ctypeslib.as_array(
                rowsp, shape=(n_t * 8,)).reshape(n_t, 8).copy()
            res_dev, _ = dispatch_rescue_tasks(
                self.didx, batch.seqs, batch.lens, tasks, id0, self.opt,
                self.ecfg.use_pallas)
        return dict(batch=batch, id0=id0, copt=copt, seqs_h=seqs_h,
                    lens_h=lens_h, flat_h=flat_h, n_h=n_h, lrep_h=lrep_h,
                    stride=stride, hist_h=hist_h, n_t=n_t, tasks=tasks,
                    res_dev=res_dev)

    def _pe_stage_b(self, ctx: dict) -> str:
        """PE finish, part B: download the rescue results (blocks on the
        device) and run the native pairing/flags/TLEN/SAM replay."""
        batch = ctx["batch"]
        lib = self.oracle._lib
        n_t = ctx["n_t"]
        if n_t:
            res = np.asarray(ctx["res_dev"], np.int32)[:n_t]
            tasks_h = np.ascontiguousarray(ctx["tasks"])
            res_h = np.ascontiguousarray(res)
            tasks_p = tasks_h.ctypes.data_as(C.c_void_p)
            res_p = res_h.ctypes.data_as(C.c_void_p)
        else:
            tasks_p = res_p = None

        names = (C.c_char_p * batch.n)(*[s.encode() for s in batch.names])
        quals = (C.c_char_p * batch.n)(
            *[(q or "").encode() for q in batch.quals])
        out_len = C.c_int64(0)
        ptr = lib.tb_finish_pe_sam(
            self.oracle._h, C.byref(ctx["copt"]), ctx["seqs_h"],
            ctx["lens_h"], names, quals, batch.n, ctx["stride"],
            ctx["flat_h"], ctx["n_h"], ctx["lrep_h"],
            ctx["hist_h"].ctypes.data_as(C.c_void_p), self.opt.max_ins,
            tasks_p, res_p, n_t, ctx["id0"], self.rg_id.encode(),
            C.byref(out_len))
        return C.string_at(ptr, out_len.value).decode()

    def _finish_run(self, batch, flat, n, l_rep, i, j, id0,
                    oracle=None) -> str:
        oracle = oracle or self.oracle
        lib = oracle._lib
        sub = _slice_batch(batch, i, j)
        m = j - i
        counts = n[i:j].astype(np.int32)
        seqs = np.ascontiguousarray(sub.seqs, dtype=np.uint8)
        lens = np.ascontiguousarray(sub.lens, dtype=np.int32)
        names = (C.c_char_p * m)(*[s.encode() for s in sub.names])
        quals = (C.c_char_p * m)(*[(q or "").encode() for q in sub.quals])
        out_len = C.c_int64(0)
        ptr = lib.tb_finish_se_sam(
            oracle._h, C.byref(to_copt(self.opt)), seqs, lens, names,
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
