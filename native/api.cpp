// extern "C" API for ctypes (no pybind11 in this environment).
// Buffers passed from numpy stay owned by Python; the handle only stores
// pointers, so Python must keep the arrays alive while the handle exists
// (the tpubwa.oracle wrapper guarantees this).
#include <cstring>
#include <string>
#include <vector>

#include "fm.h"
#include "mem.h"
#include "oracle.h"

using namespace tb;

namespace {
struct Handle {
  FMIdx idx;
  std::vector<std::string> rnames;
  // scratch result storage: valid until the next call on this handle
  std::vector<int64_t> i64;
  std::vector<int32_t> i32;
  std::vector<uint32_t> u32;
  std::string str;
};
}  // namespace

extern "C" {

void *tb_idx_new(int64_t l_pac, int64_t primary, int64_t sa_intv,
                 const int64_t *L2, const uint32_t *bwt_words,
                 const uint32_t *occ_cp, const int64_t *sa_samples,
                 const uint8_t *pac, const int64_t *ann_off,
                 const int64_t *ann_len, int n_anns, const char **names) {
  Handle *h = new Handle;
  h->idx.l_pac = l_pac;
  h->idx.primary = primary;
  h->idx.sa_intv = sa_intv;
  h->idx.L2 = L2;
  h->idx.bwt_words = bwt_words;
  h->idx.occ_cp = occ_cp;
  h->idx.sa_samples = sa_samples;
  h->idx.pac = pac;
  h->idx.ann_off = ann_off;
  h->idx.ann_len = ann_len;
  h->idx.n_anns = n_anns;
  for (int i = 0; i < n_anns; ++i) h->rnames.emplace_back(names[i]);
  return h;
}

void tb_idx_free(void *hp) { delete (Handle *)hp; }

// --- kernel-level entry points (golden targets for Pallas) ---------------
void tb_ksw_extend(int qlen, const uint8_t *query, int tlen,
                   const uint8_t *target, int o_del, int e_del, int o_ins,
                   int e_ins, int w, int end_bonus, int zdrop, int h0,
                   const int8_t *mat, int *out6) {
  ExtendResult r = ksw_extend2(qlen, query, tlen, target, 5, mat, o_del, e_del,
                               o_ins, e_ins, w, end_bonus, zdrop, h0);
  out6[0] = r.score;
  out6[1] = r.qle;
  out6[2] = r.tle;
  out6[3] = r.gtle;
  out6[4] = r.gscore;
  out6[5] = r.max_off;
}

int tb_ksw_global(int qlen, const uint8_t *query, int tlen,
                  const uint8_t *target, int o_del, int e_del, int o_ins,
                  int e_ins, int w, const int8_t *mat, uint32_t *cigar_out,
                  int cigar_cap, int *n_cigar) {
  std::vector<uint32_t> cig;
  int score = ksw_global2(qlen, query, tlen, target, 5, mat, o_del, e_del,
                          o_ins, e_ins, w, &cig);
  *n_cigar = (int)cig.size();
  for (int i = 0; i < (int)cig.size() && i < cigar_cap; ++i)
    cigar_out[i] = cig[i];
  return score;
}

void tb_ksw_align(int qlen, const uint8_t *query, int tlen,
                  const uint8_t *target, int o_del, int e_del, int o_ins,
                  int e_ins, int minsc, const int8_t *mat, int *out7) {
  AlignResult r =
      ksw_align(qlen, query, tlen, target, 5, mat, o_del, e_del, o_ins, e_ins,
                minsc);
  out7[0] = r.score;
  out7[1] = r.tb;
  out7[2] = r.te;
  out7[3] = r.qb;
  out7[4] = r.qe;
  out7[5] = r.score2;
  out7[6] = r.te2;
}

// --- stage-level entry points --------------------------------------------
// smems: returns n; per-smem rows (k, l, s, qbeg, qend) in handle i64 scratch
int tb_smems(void *hp, const MemOpt *opt, const uint8_t *seq, int len,
             const int64_t **rows) {
  Handle *h = (Handle *)hp;
  std::vector<BiIntv> mem;
  collect_intv(*opt, h->idx, len, seq, &mem);
  h->i64.clear();
  for (auto &p : mem) {
    h->i64.push_back(p.k);
    h->i64.push_back(p.l);
    h->i64.push_back(p.s);
    h->i64.push_back((int64_t)(p.info >> 32));
    h->i64.push_back((int64_t)(uint32_t)p.info);
  }
  *rows = h->i64.data();
  return (int)mem.size();
}

// chains after mem_chain (+ optional filter): rows (rbeg, qbeg, len, chain_id)
int tb_chains(void *hp, const MemOpt *opt, const uint8_t *seq, int len,
              int do_filter, const int64_t **rows) {
  Handle *h = (Handle *)hp;
  auto chains = mem_chain(*opt, h->idx, len, seq);
  if (do_filter) mem_chain_flt(*opt, &chains);
  h->i64.clear();
  for (size_t ci = 0; ci < chains.size(); ++ci)
    for (auto &s : chains[ci].seeds) {
      h->i64.push_back(s.rbeg);
      h->i64.push_back(s.qbeg);
      h->i64.push_back(s.len);
      h->i64.push_back((int64_t)ci);
    }
  *rows = h->i64.data();
  return (int)(h->i64.size() / 4);
}

// alignment regions: rows of 12 int64s. stage: 0 = pre-dedup (raw
// chain2aln output), 1 = post-dedup, 2 = post-primary-marking
int tb_regs(void *hp, const MemOpt *opt, const uint8_t *seq, int len,
            int64_t id, int stage, const int64_t **rows) {
  Handle *h = (Handle *)hp;
  std::vector<AlnReg> regs;
  if (stage == 0) {
    auto chains = mem_chain(*opt, h->idx, len, seq);
    mem_chain_flt(*opt, &chains);
    for (auto &c : chains) mem_chain2aln(*opt, h->idx, len, seq, c, &regs);
  } else {
    regs = mem_align1(*opt, h->idx, len, seq, id);
    if (stage >= 2) mem_mark_primary_se(*opt, &regs, id);
  }
  h->i64.clear();
  for (auto &r : regs) {
    h->i64.push_back(r.rb);
    h->i64.push_back(r.re);
    h->i64.push_back(r.qb);
    h->i64.push_back(r.qe);
    h->i64.push_back(stage == 0 ? r.seedcov : r.rid);
    h->i64.push_back(r.score);
    h->i64.push_back(r.truesc);
    h->i64.push_back(stage == 0 ? r.seedlen0 : r.sub);
    h->i64.push_back(r.csub);
    h->i64.push_back(r.sub_n);
    h->i64.push_back(r.w);
    h->i64.push_back(r.secondary);
  }
  *rows = h->i64.data();
  return (int)regs.size();
}

// pre-dedup regions in the finish layout (rb,re,qb,qe,score,truesc,w,
// seedcov,seedlen0,rid) + l_rep — used to substitute host-computed regions
// for reads that overflowed the device caps in the PE path
int tb_regs_pre(void *hp, const MemOpt *opt, const uint8_t *seq, int len,
                const int64_t **rows, int32_t *l_rep_out) {
  Handle *h = (Handle *)hp;
  auto chains = mem_chain(*opt, h->idx, len, seq);
  double frac = chains.empty() ? 0. : chains[0].frac_rep;
  *l_rep_out = (int32_t)(frac * len + .499);
  mem_chain_flt(*opt, &chains);
  std::vector<AlnReg> regs;
  for (auto &c : chains) mem_chain2aln(*opt, h->idx, len, seq, c, &regs);
  h->i64.clear();
  for (auto &r : regs) {
    h->i64.push_back(r.rb);
    h->i64.push_back(r.re);
    h->i64.push_back(r.qb);
    h->i64.push_back(r.qe);
    h->i64.push_back(r.score);
    h->i64.push_back(r.truesc);
    h->i64.push_back(r.w);
    h->i64.push_back(r.seedcov);
    h->i64.push_back(r.seedlen0);
    h->i64.push_back(r.rid);
  }
  *rows = h->i64.data();
  return (int)regs.size();
}

// Finishing path for device-computed regions: dedup + primary marking +
// SAM emission on AlnRegs produced by the TPU worker1. This is the
// production host half of the pipeline (ARCHITECTURE.md device/host split).
// regs: flat (sum(n_regs), 10) int64 rows per read, fields
// (rb, re, qb, qe, score, truesc, w, seedcov, seedlen0, rid).
const char *tb_finish_se_sam(void *hp, const MemOpt *opt, const uint8_t *seqs,
                             const int32_t *lens, const char **names,
                             const char **quals, int n_reads, int stride,
                             const int64_t *regs_flat, const int32_t *n_regs,
                             const int32_t *l_rep, int64_t id0,
                             const char *rg_id, int64_t *out_len) {
  Handle *h = (Handle *)hp;
  h->str.clear();
  size_t off = 0;
  for (int i = 0; i < n_reads; ++i) {
    const uint8_t *seq = seqs + (size_t)i * stride;
    int len = lens[i];
    std::vector<AlnReg> regs(n_regs[i]);
    for (int r = 0; r < n_regs[i]; ++r) {
      const int64_t *row = regs_flat + (off + r) * 10;
      AlnReg &a = regs[r];
      a.rb = row[0];
      a.re = row[1];
      a.qb = (int)row[2];
      a.qe = (int)row[3];
      a.score = (int)row[4];
      a.truesc = (int)row[5];
      a.w = (int)row[6];
      a.seedcov = (int)row[7];
      a.seedlen0 = (int)row[8];
      a.rid = (int)row[9];
      a.frac_rep = (double)l_rep[i] / len;
    }
    off += n_regs[i];
    mem_sort_dedup_patch(*opt, h->idx, seq, &regs);
    mem_mark_primary_se(*opt, &regs, id0 + i);
    h->str += mem_reg2sam_se(*opt, h->idx, names[i], len, seq,
                             quals && quals[i] && quals[i][0] ? quals[i]
                                                             : nullptr,
                             &regs, 0, h->rnames, rg_id ? rg_id : "");
  }
  *out_len = (int64_t)h->str.size();
  return h->str.c_str();
}

// single-end SAM for a batch of fixed-stride reads; returns blob in handle str
const char *tb_align_se_sam(void *hp, const MemOpt *opt, const uint8_t *seqs,
                            const int32_t *lens, const char **names,
                            const char **quals, int n_reads, int stride,
                            int64_t id0, const char *rg_id, int64_t *out_len) {
  Handle *h = (Handle *)hp;
  h->str.clear();
  for (int i = 0; i < n_reads; ++i) {
    const uint8_t *seq = seqs + (size_t)i * stride;
    int len = lens[i];
    auto regs = mem_align1(*opt, h->idx, len, seq, id0 + i);
    mem_mark_primary_se(*opt, &regs, id0 + i);
    h->str += mem_reg2sam_se(*opt, h->idx, names[i], len, seq,
                             quals && quals[i] && quals[i][0] ? quals[i] : nullptr,
                             &regs, 0, h->rnames, rg_id ? rg_id : "");
  }
  *out_len = (int64_t)h->str.size();
  return h->str.c_str();
}

}  // extern "C"

#include "pe.h"

namespace tb {
extern int g_rescue_inject_miss;
}

extern "C" {

// #scalar fallbacks taken while an inject table was present (tests assert 0
// — the task extraction must be a superset of the windows actually run)
int tb_rescue_miss_count() { return tb::g_rescue_inject_miss; }
void tb_rescue_miss_reset() { tb::g_rescue_inject_miss = 0; }

// Paired-end batch: reads interleaved (pair i = reads 2i, 2i+1).
// Computes worker1 regions for all ends, per-batch insert statistics
// [bwa: mem_pestat], then per-pair rescue/pairing/SAM [bwa: mem_sam_pe].
// pes_out: 4 x (low, high, failed, avg, std) doubles (may be null).
const char *tb_align_pe_sam(void *hp, const MemOpt *opt, const uint8_t *seqs,
                            const int32_t *lens, const char **names,
                            const char **quals, int n_reads, int stride,
                            int64_t id0, const char *rg_id, double *pes_out,
                            int64_t *out_len) {
  Handle *h = (Handle *)hp;
  h->str.clear();
  std::vector<std::vector<AlnReg>> regs(n_reads);
  for (int i = 0; i < n_reads; ++i)
    regs[i] = mem_align1(*opt, h->idx, lens[i], seqs + (size_t)i * stride,
                         id0 + (i >> 1));
  PeStat pes[4];
  mem_pestat(*opt, h->idx.l_pac, regs, pes);
  if (pes_out)
    for (int d = 0; d < 4; ++d) {
      pes_out[d * 5 + 0] = pes[d].low;
      pes_out[d * 5 + 1] = pes[d].high;
      pes_out[d * 5 + 2] = pes[d].failed;
      pes_out[d * 5 + 3] = pes[d].avg;
      pes_out[d * 5 + 4] = pes[d].std;
    }
  for (int i = 0; i + 1 < n_reads; i += 2) {
    std::string name2[2] = {names[i], names[i + 1]};
    int l2[2] = {lens[i], lens[i + 1]};
    const uint8_t *s2[2] = {seqs + (size_t)i * stride,
                            seqs + (size_t)(i + 1) * stride};
    const char *q2[2] = {
        quals && quals[i] && quals[i][0] ? quals[i] : nullptr,
        quals && quals[i + 1] && quals[i + 1][0] ? quals[i + 1] : nullptr};
    std::vector<AlnReg> a2[2] = {regs[i], regs[i + 1]};
    std::string out2[2];
    mem_sam_pe(*opt, h->idx, pes, id0 + (i >> 1), name2, l2, s2, q2, a2,
               h->rnames, rg_id ? rg_id : "", out2);
    h->str += out2[0];
    h->str += out2[1];
  }
  *out_len = (int64_t)h->str.size();
  return h->str.c_str();
}

// rebuild per-read AlnReg lists from the flat device layout and run the
// deterministic dedup/patch — shared by the PE phase-1 (isize sampling,
// rescue-task extraction) and phase-2 (finish) entry points so every phase
// sees identical region lists.
static void rebuild_dedup(Handle *h, const MemOpt &opt, const uint8_t *seqs,
                          const int32_t *lens, int n_reads, int stride,
                          const int64_t *regs_flat, const int32_t *n_regs,
                          const int32_t *l_rep,
                          std::vector<std::vector<AlnReg>> *regs) {
  regs->resize(n_reads);
  size_t off = 0;
  for (int i = 0; i < n_reads; ++i) {
    auto &ri = (*regs)[i];
    ri.resize(n_regs[i]);
    for (int r = 0; r < n_regs[i]; ++r) {
      const int64_t *row = regs_flat + (off + r) * 10;
      AlnReg &a = ri[r];
      a.rb = row[0]; a.re = row[1]; a.qb = (int)row[2]; a.qe = (int)row[3];
      a.score = (int)row[4]; a.truesc = (int)row[5]; a.w = (int)row[6];
      a.seedcov = (int)row[7]; a.seedlen0 = (int)row[8]; a.rid = (int)row[9];
      a.frac_rep = (double)l_rep[i] / lens[i];
    }
    off += n_regs[i];
    mem_sort_dedup_patch(opt, h->idx, seqs + (size_t)i * stride, &ri);
  }
}

// PE phase 0: per-pair insert-size sample [the sampling loop of
// bwa: mem_pestat] from device-computed regions. dir_out[p] in 0..3 or -1
// when the pair is not unique enough; isize_out[p] the insert. The caller
// histograms these on device and psums across the mesh (SURVEY.md §2.5
// "cross-node reduction"), then feeds mem_pestat_from_hist.
int tb_pe_isize(void *hp, const MemOpt *opt, const uint8_t *seqs,
                const int32_t *lens, int n_reads, int stride,
                const int64_t *regs_flat, const int32_t *n_regs,
                const int32_t *l_rep, int32_t *dir_out, int64_t *isize_out) {
  Handle *h = (Handle *)hp;
  std::vector<std::vector<AlnReg>> regs;
  rebuild_dedup(h, *opt, seqs, lens, n_reads, stride, regs_flat, n_regs,
                l_rep, &regs);
  int n_pairs = n_reads / 2;
  mem_pestat_samples(*opt, h->idx.l_pac, regs, dir_out, isize_out);
  return n_pairs;
}

// PE phase 1: extract every mate-rescue window the batch could run (a
// superset; see pe.h) so one batched device local-alignment call covers
// the whole batch. Returns task count; rows (n, 8) int64 in handle scratch.
int tb_pe_rescue_tasks(void *hp, const MemOpt *opt, const uint8_t *seqs,
                       const int32_t *lens, int n_reads, int stride,
                       const int64_t *regs_flat, const int32_t *n_regs,
                       const int32_t *l_rep, const int64_t *hist4,
                       int max_ins_hist, int64_t id0, const int64_t **rows) {
  Handle *h = (Handle *)hp;
  std::vector<std::vector<AlnReg>> regs;
  rebuild_dedup(h, *opt, seqs, lens, n_reads, stride, regs_flat, n_regs,
                l_rep, &regs);
  PeStat pes[4];
  if (hist4) mem_pestat_from_hist(*opt, hist4, max_ins_hist, pes);
  else mem_pestat(*opt, h->idx.l_pac, regs, pes);
  h->i64.clear();
  for (int i = 0; i + 1 < n_reads; i += 2) {
    std::vector<AlnReg> a2[2] = {regs[i], regs[i + 1]};
    int l2[2] = {lens[i], lens[i + 1]};
    mem_rescue_tasks(*opt, h->idx, pes, a2, l2, id0 + (i >> 1), &h->i64);
  }
  *rows = h->i64.data();
  return (int)(h->i64.size() / 8);
}

// PE finishing on device-computed regions (the production path): same layout
// as tb_finish_se_sam for regs, but pairs + pestat from a histogram.
// hist4: 4 x (max_ins+1) int64 insert histogram (already psum'd across the
// mesh on device) — or null to compute pestat from the regions directly.
// rsc_tasks/rsc_res (n_rsc rows): device-computed mate-rescue results from
// phase 1, injected into the scalar replay (null -> scalar rescue SW).
const char *tb_finish_pe_sam(void *hp, const MemOpt *opt, const uint8_t *seqs,
                             const int32_t *lens, const char **names,
                             const char **quals, int n_reads, int stride,
                             const int64_t *regs_flat, const int32_t *n_regs,
                             const int32_t *l_rep, const int64_t *hist4,
                             int max_ins_hist, const int64_t *rsc_tasks,
                             const int32_t *rsc_res, int n_rsc, int64_t id0,
                             const char *rg_id, int64_t *out_len) {
  Handle *h = (Handle *)hp;
  h->str.clear();
  std::vector<std::vector<AlnReg>> regs;
  rebuild_dedup(h, *opt, seqs, lens, n_reads, stride, regs_flat, n_regs,
                l_rep, &regs);
  PeStat pes[4];
  if (hist4) mem_pestat_from_hist(*opt, hist4, max_ins_hist, pes);
  else mem_pestat(*opt, h->idx.l_pac, regs, pes);
  RescueInject inj{rsc_tasks, rsc_res, n_rsc};
  const RescueInject *pinj = rsc_tasks && rsc_res ? &inj : nullptr;
  for (int i = 0; i + 1 < n_reads; i += 2) {
    std::string name2[2] = {names[i], names[i + 1]};
    int l2[2] = {lens[i], lens[i + 1]};
    const uint8_t *s2[2] = {seqs + (size_t)i * stride,
                            seqs + (size_t)(i + 1) * stride};
    const char *q2[2] = {
        quals && quals[i] && quals[i][0] ? quals[i] : nullptr,
        quals && quals[i + 1] && quals[i + 1][0] ? quals[i + 1] : nullptr};
    std::vector<AlnReg> a2[2] = {regs[i], regs[i + 1]};
    std::string out2[2];
    mem_sam_pe(*opt, h->idx, pes, id0 + (i >> 1), name2, l2, s2, q2, a2,
               h->rnames, rg_id ? rg_id : "", out2, pinj, id0 + (i >> 1));
    h->str += out2[0];
    h->str += out2[1];
  }
  *out_len = (int64_t)h->str.size();
  return h->str.c_str();
}

}  // extern "C"
