// FM-index queries + SMEM collection — scalar reference semantics.
// Mirrors [bwa: bwt.c :: bwt_occ, bwt_2occ4, bwt_extend, bwt_sa, bwt_smem1a]
// and [bwa: bntseq.c :: bns_get_seq, bns_fetch_seq, bns_pos2rid, bns_depos].
// Operates on the numpy-owned index layout produced by
// tpubwa/index/builder.py (uint32 BWT words, occ checkpoints every 64 bases).
#include "fm.h"

#include <algorithm>

namespace tb {

int64_t FMIdx::occ1(int64_t k, int c) const {
  if (k < 0) return 0;
  if (k >= primary) --k;
  if (k < 0) return 0;
  int64_t cp = occ_cp[(k / kOccInterval) * 4 + c];
  int64_t base = (k / kOccInterval) * kOccInterval;
  int64_t cnt = 0;
  for (int64_t j = base; j <= k; ++j) cnt += bwt_base(j) == c;
  return cp + cnt;
}

void FMIdx::occ4(int64_t k, int64_t cnt[4]) const {
  if (k < 0) { cnt[0] = cnt[1] = cnt[2] = cnt[3] = 0; return; }
  if (k >= primary) --k;
  if (k < 0) { cnt[0] = cnt[1] = cnt[2] = cnt[3] = 0; return; }
  const uint32_t *cp = &occ_cp[(k / kOccInterval) * 4];
  for (int c = 0; c < 4; ++c) cnt[c] = cp[c];
  int64_t base = (k / kOccInterval) * kOccInterval;
  for (int64_t j = base; j <= k; ++j) ++cnt[bwt_base(j)];
}

void FMIdx::extend(const BiIntv &ik, BiIntv ok[4], bool is_back) const {
  // [bwa: bwt.c :: bwt_extend] — occ runs on x[!is_back]
  int64_t tk[4], tl[4];
  // x[!is_back]: occ runs on the l-side for forward extension (is_back=0
  // -> x[1]) and on the k-side for backward (is_back=1 -> x[0]).
  int64_t x_side = is_back ? ik.k : ik.l;
  int64_t x_other = is_back ? ik.l : ik.k;
  occ4(x_side - 1, tk);
  occ4(x_side - 1 + ik.s, tl);
  int64_t ok_side[4], ok_s[4], ok_other[4];
  for (int c = 0; c < 4; ++c) {
    ok_side[c] = L2[c] + 1 + tk[c];
    ok_s[c] = tl[c] - tk[c];
  }
  int sentinel = (x_side <= primary && x_side + ik.s - 1 >= primary) ? 1 : 0;
  ok_other[3] = x_other + sentinel;
  ok_other[2] = ok_other[3] + ok_s[3];
  ok_other[1] = ok_other[2] + ok_s[2];
  ok_other[0] = ok_other[1] + ok_s[1];
  for (int c = 0; c < 4; ++c) {
    ok[c].k = is_back ? ok_side[c] : ok_other[c];
    ok[c].l = is_back ? ok_other[c] : ok_side[c];
    ok[c].s = ok_s[c];
    ok[c].info = ik.info;
  }
}

int64_t FMIdx::inv_psi(int64_t k) const {
  if (k == primary) return 0;
  int64_t x = k - (k > primary ? 1 : 0);
  int c = bwt_base(x);
  return L2[c] + occ1(k, c);
}

int64_t FMIdx::sa(int64_t k) const {
  int64_t s = 0, mask = sa_intv - 1;
  while (k & mask) {
    ++s;
    k = inv_psi(k);
  }
  return s + sa_samples[k / sa_intv];
}

uint8_t FMIdx::text_base(int64_t pos) const {
  int64_t p = pos < l_pac ? pos : 2 * l_pac - 1 - pos;
  uint8_t b = (pac[p >> 2] >> ((~p & 3) << 1)) & 3;
  return pos < l_pac ? b : 3 - b;
}

void FMIdx::get_seq(int64_t beg, int64_t end, uint8_t *out) const {
  for (int64_t i = beg; i < end; ++i) out[i - beg] = text_base(i);
}

int64_t FMIdx::depos(int64_t pos, int *is_rev) const {
  *is_rev = pos >= l_pac;
  return *is_rev ? 2 * l_pac - 1 - pos : pos;
}

int FMIdx::pos2rid(int64_t fwd_pos) const {
  // [bwa: bntseq.c :: bns_pos2rid] — binary search over annotation offsets
  if (fwd_pos >= l_pac) return -1;
  int lo = 0, hi = n_anns - 1;
  while (lo < hi) {
    int mid = (lo + hi) / 2;
    if (fwd_pos >= ann_off[mid] + ann_len[mid]) lo = mid + 1;
    else hi = mid;
  }
  return lo;
}

int FMIdx::intv2rid(int64_t rb, int64_t re) const {
  // [bwa: bntseq.c :: bns_intv2rid]
  if (rb < l_pac && re > l_pac) return -2;  // bridges fwd/rev boundary
  int is_rev;
  int rid_b = pos2rid(depos(rb, &is_rev));
  int rid_e = rb < re ? pos2rid(depos(re - 1, &is_rev)) : rid_b;
  return rid_b == rid_e ? rid_b : -1;
}

void FMIdx::fetch_seq(int64_t *beg, int64_t mid, int64_t *end, int *rid,
                      std::vector<uint8_t> *out) const {
  // [bwa: bntseq.c :: bns_fetch_seq] — clip [beg,end) to the sequence
  // containing mid (on mid's strand) and return the bases.
  int is_rev;
  int64_t fm = depos(mid, &is_rev);
  *rid = pos2rid(fm);
  int64_t seq_b = ann_off[*rid], seq_e = ann_off[*rid] + ann_len[*rid];
  int64_t b = *beg, e = *end;
  if (!is_rev) {
    b = std::max(b, seq_b);
    e = std::min(e, seq_e);
  } else {
    b = std::max(b, 2 * l_pac - seq_e);
    e = std::min(e, 2 * l_pac - seq_b);
  }
  *beg = b;
  *end = e;
  out->resize(e - b);
  get_seq(b, e, out->data());
}

// ---------------------------------------------------------------------------
// SMEM collection [bwa: bwt.c :: bwt_smem1a] (max_intv fixed at 0: the
// LAST-like 3rd round is off, matching bwa <=0.7.10 / opts.max_mem_intv=0).
// ---------------------------------------------------------------------------
int smem1(const FMIdx &idx, int len, const uint8_t *q, int x, int64_t min_intv,
          std::vector<BiIntv> *mem) {
  mem->clear();
  if (q[x] > 3) return x + 1;
  if (min_intv < 1) min_intv = 1;
  std::vector<BiIntv> a[2];
  std::vector<BiIntv> *prev = &a[0], *curr = &a[1];
  BiIntv ik = idx.set_intv(q[x]);
  ik.info = x + 1;
  BiIntv ok[4];
  int i;
  for (i = x + 1; i < len; ++i) {  // forward extension
    if (q[i] < 4) {
      int c = 3 - q[i];
      idx.extend(ik, ok, false);
      if (ok[c].s != ik.s) {
        curr->push_back(ik);
        if (ok[c].s < min_intv) break;
      }
      ik = ok[c];
      ik.info = i + 1;
    } else {
      curr->push_back(ik);
      break;
    }
  }
  if (i == len) curr->push_back(ik);
  std::reverse(curr->begin(), curr->end());  // longest (smallest intv) first
  int ret = (int)(uint32_t)curr->front().info;
  std::swap(curr, prev);

  for (i = x - 1; i >= -1; --i) {  // backward extension
    int c = i < 0 ? -1 : (q[i] < 4 ? q[i] : -1);
    curr->clear();
    for (size_t j = 0; j < prev->size(); ++j) {
      const BiIntv &p = (*prev)[j];
      if (c >= 0) idx.extend(p, ok, true);
      if (c < 0 || ok[c].s < min_intv) {
        if (curr->empty()) {  // longest match at this left endpoint
          if (mem->empty() || i + 1 < (int)(mem->back().info >> 32)) {
            BiIntv out = p;
            out.info |= (uint64_t)(i + 1) << 32;
            mem->push_back(out);
          }
        }
      } else if (curr->empty() || ok[c].s != curr->back().s) {
        ok[c].info = p.info;
        curr->push_back(ok[c]);
      }
    }
    if (curr->empty()) break;
    std::swap(curr, prev);
  }
  std::reverse(mem->begin(), mem->end());  // sorted by start coordinate
  return ret;
}

// [bwa: bwamem.c :: mem_collect_intv] — two seeding rounds + sort by info.
void collect_intv(const MemOpt &opt, const FMIdx &idx, int len,
                  const uint8_t *seq, std::vector<BiIntv> *out) {
  out->clear();
  std::vector<BiIntv> mem1;
  int split_len = (int)(opt.min_seed_len * opt.split_factor + .499);
  int x = 0;
  while (x < len) {
    if (seq[x] < 4) {
      x = smem1(idx, len, seq, x, 1, &mem1);
      for (auto &p : mem1) {
        int slen = (int)((uint32_t)p.info - (p.info >> 32));
        if (slen >= opt.min_seed_len) out->push_back(p);
      }
    } else ++x;
  }
  size_t old_n = out->size();
  for (size_t k = 0; k < old_n; ++k) {
    BiIntv p = (*out)[k];
    int start = (int)(p.info >> 32), end = (int)(uint32_t)p.info;
    if (end - start < split_len || p.s > opt.split_width) continue;
    smem1(idx, len, seq, (start + end) >> 1, p.s + 1, &mem1);
    for (auto &q2 : mem1)
      if ((int)((uint32_t)q2.info - (q2.info >> 32)) >= opt.min_seed_len)
        out->push_back(q2);
  }
  std::stable_sort(out->begin(), out->end(),
                   [](const BiIntv &a, const BiIntv &b) { return a.info < b.info; });
}

}  // namespace tb
