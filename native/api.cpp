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

// alignment regions: rows of 12 int64s
int tb_regs(void *hp, const MemOpt *opt, const uint8_t *seq, int len,
            int64_t id, int mark_primary, const int64_t **rows) {
  Handle *h = (Handle *)hp;
  auto regs = mem_align1(*opt, h->idx, len, seq, id);
  if (mark_primary) mem_mark_primary_se(*opt, &regs, id);
  h->i64.clear();
  for (auto &r : regs) {
    h->i64.push_back(r.rb);
    h->i64.push_back(r.re);
    h->i64.push_back(r.qb);
    h->i64.push_back(r.qe);
    h->i64.push_back(r.rid);
    h->i64.push_back(r.score);
    h->i64.push_back(r.truesc);
    h->i64.push_back(r.sub);
    h->i64.push_back(r.csub);
    h->i64.push_back(r.sub_n);
    h->i64.push_back(r.w);
    h->i64.push_back(r.secondary);
  }
  *rows = h->i64.data();
  return (int)regs.size();
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
