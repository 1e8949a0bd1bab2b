// Paired-end pipeline — scalar reference semantics.
// Mirrors [bwa: bwamem_pair.c :: mem_pestat, mem_matesw, mem_pair,
// mem_sam_pe] (reference flow [ref: worker2/MemSamPe.scala]).
// Deterministic tie rules documented in docs/PARITY.md.
#include "pe.h"

#include <algorithm>
#include <cmath>
#include <cstring>

namespace tb {

// diagnosing counter: inject-table lookups that missed and fell back to the
// scalar kernel (0 in correct operation — the extraction is a superset)
int g_rescue_inject_miss = 0;

static constexpr double MIN_RATIO = 0.8;
static constexpr int MIN_DIR_CNT = 10;
static constexpr double MIN_DIR_RATIO = 0.05;
static constexpr double OUTLIER_BOUND = 2.0;
static constexpr double MAPPING_BOUND = 3.0;
static constexpr double MAX_STDDEV = 4.0;

static inline int raw_mapq(int diff, int a) {
  return (int)(6.02 * diff / a + .499);
}

int mem_infer_dir(int64_t l_pac, int64_t b1, int64_t b2, int64_t *dist) {
  int r1 = b1 >= l_pac, r2 = b2 >= l_pac;
  int64_t p2 = (r1 == r2) ? b2 : (l_pac << 1) - 1 - b2;
  *dist = p2 > b1 ? p2 - b1 : b1 - p2;
  return ((r1 == r2) ? 0 : 1) ^ (p2 > b1 ? 0 : 3);
}

// "unique enough" test for pestat sampling [bwa: cal_sub]
static int cal_sub(const MemOpt &opt, const std::vector<AlnReg> &r) {
  size_t j;
  for (j = 1; j < r.size(); ++j) {
    int b_max = std::max(r[j].qb, r[0].qb);
    int e_min = std::min(r[j].qe, r[0].qe);
    if (e_min > b_max) {
      int min_l = std::min(r[j].qe - r[j].qb, r[0].qe - r[0].qb);
      if (e_min - b_max >= min_l * opt.mask_level) break;
    }
  }
  return j < r.size() ? r[j].score : opt.min_seed_len * opt.a;
}

static void pestat_core(const MemOpt &opt, std::vector<int64_t> isize[4],
                        PeStat pes[4]) {
  for (int d = 0; d < 4; ++d) {
    PeStat *r = &pes[d];
    auto &q = isize[d];
    *r = PeStat{};
    if ((int)q.size() < MIN_DIR_CNT) {
      r->failed = 1;
      continue;
    }
    r->failed = 0;
    std::sort(q.begin(), q.end());
    int n = (int)q.size();
    int p25 = (int)q[(int)(.25 * n + .499)];
    int p50 = (int)q[(int)(.50 * n + .499)];
    int p75 = (int)q[(int)(.75 * n + .499)];
    (void)p50;
    r->low = (int)(p25 - OUTLIER_BOUND * (p75 - p25) + .499);
    if (r->low < 1) r->low = 1;
    r->high = (int)(p75 + OUTLIER_BOUND * (p75 - p25) + .499);
    double avg = 0;
    int x = 0;
    for (int64_t v : q)
      if (v >= r->low && v <= r->high) avg += (double)v, ++x;
    avg /= x;
    double var = 0;
    for (int64_t v : q)
      if (v >= r->low && v <= r->high) var += (v - avg) * (v - avg);
    r->avg = avg;
    r->std = std::sqrt(var / x);
    r->low = (int)(p25 - MAPPING_BOUND * (p75 - p25) + .499);
    r->high = (int)(p75 + MAPPING_BOUND * (p75 - p25) + .499);
    if (r->low > r->avg - MAX_STDDEV * r->std)
      r->low = (int)(r->avg - MAX_STDDEV * r->std + .499);
    if (r->high < r->avg + MAX_STDDEV * r->std)
      r->high = (int)(r->avg + MAX_STDDEV * r->std + .499);
    if (r->low < 1) r->low = 1;
  }
  size_t mx = 0;
  for (int d = 0; d < 4; ++d) mx = std::max(mx, isize[d].size());
  for (int d = 0; d < 4; ++d)
    if (!pes[d].failed && (double)isize[d].size() < (double)mx * MIN_DIR_RATIO)
      pes[d].failed = 1;
}

void mem_pestat_samples(const MemOpt &opt, int64_t l_pac,
                        const std::vector<std::vector<AlnReg>> &regs,
                        int32_t *dir_out, int64_t *isize_out) {
  for (size_t i = 0; i + 1 < regs.size(); i += 2) {
    size_t p = i / 2;
    dir_out[p] = -1;
    isize_out[p] = 0;
    const auto &r0 = regs[i], &r1 = regs[i + 1];
    if (r0.empty() || r1.empty()) continue;
    if (cal_sub(opt, r0) > MIN_RATIO * r0[0].score) continue;
    if (cal_sub(opt, r1) > MIN_RATIO * r1[0].score) continue;
    if (r0[0].rid != r1[0].rid) continue;
    int64_t is;
    int dir = mem_infer_dir(l_pac, r0[0].rb, r1[0].rb, &is);
    if (is >= 1 && is <= opt.max_ins) {
      dir_out[p] = dir;
      isize_out[p] = is;
    }
  }
}

void mem_pestat(const MemOpt &opt, int64_t l_pac,
                const std::vector<std::vector<AlnReg>> &regs, PeStat pes[4]) {
  size_t n_pairs = regs.size() / 2;
  std::vector<int32_t> dir(n_pairs);
  std::vector<int64_t> is(n_pairs);
  mem_pestat_samples(opt, l_pac, regs, dir.data(), is.data());
  std::vector<int64_t> isize[4];
  for (size_t p = 0; p < n_pairs; ++p)
    if (dir[p] >= 0) isize[dir[p]].push_back(is[p]);
  pestat_core(opt, isize, pes);
}

void mem_pestat_from_hist(const MemOpt &opt, const int64_t *hist4,
                          int max_ins, PeStat pes[4]) {
  std::vector<int64_t> isize[4];
  for (int d = 0; d < 4; ++d)
    for (int v = 1; v <= max_ins; ++v) {
      int64_t c = hist4[(size_t)d * (max_ins + 1) + v];
      for (int64_t t = 0; t < c; ++t) isize[d].push_back(v);
    }
  pestat_core(opt, isize, pes);
}

// mate-window geometry for direction r [the rb/re computation inside
// bwa: mem_matesw], shared by the scalar path and the device-batch task
// extraction. Returns true when the SW would actually run (same sequence
// as the anchor and a window long enough to seed).
static bool matesw_window(const MemOpt &opt, const FMIdx &idx,
                          const PeStat *pe, const AlnReg &a, int l_ms, int r,
                          int *is_rev_out, int64_t *rb_out, int64_t *re_out,
                          int *rid_out, std::vector<uint8_t> *ref) {
  int64_t l_pac = idx.l_pac;
  int is_rev = (r >> 1) != (r & 1);  // whether to revcomp the mate
  int is_larger = !(r >> 1);         // whether the mate has larger coords
  int64_t rb, re;
  if (!is_rev) {
    rb = is_larger ? a.rb + pe->low : a.rb - pe->high;
    re = (is_larger ? a.rb + pe->high : a.rb - pe->low) + l_ms;
  } else {
    rb = (is_larger ? a.rb + pe->low : a.rb - pe->high) - l_ms;
    re = is_larger ? a.rb + pe->high : a.rb - pe->low;
  }
  if (rb < 0) rb = 0;
  if (re > l_pac << 1) re = l_pac << 1;
  int rid = -1;
  if (rb < re) idx.fetch_seq(&rb, (rb + re) >> 1, &re, &rid, ref);
  *is_rev_out = is_rev;
  *rb_out = rb;
  *re_out = re;
  *rid_out = rid;
  return rid == a.rid && re - rb >= opt.min_seed_len;
}

int mem_matesw(const MemOpt &opt, const FMIdx &idx, const PeStat pes[4],
               const AlnReg &a, int l_ms, const uint8_t *ms,
               std::vector<AlnReg> *ma, const RescueInject *inj, int64_t pid,
               int end_i, int reg_j) {
  int64_t l_pac = idx.l_pac;
  int skip[4], n = 0;
  for (int r = 0; r < 4; ++r) skip[r] = pes[r].failed ? 1 : 0;
  for (auto &m : *ma) {  // orientations already satisfied by an existing hit
    int64_t dist;
    int r = mem_infer_dir(l_pac, a.rb, m.rb, &dist);
    if (dist >= pes[r].low && dist <= pes[r].high) skip[r] = 1;
  }
  if (skip[0] + skip[1] + skip[2] + skip[3] == 4) return 0;
  for (int r = 0; r < 4; ++r) {
    if (skip[r]) continue;
    int is_rev, rid;
    int64_t rb, re;
    std::vector<uint8_t> ref;
    if (matesw_window(opt, idx, &pes[r], a, l_ms, r, &is_rev, &rb, &re, &rid,
                      &ref)) {
      AlignResult aln;
      bool have = false;
      if (inj) {  // device-computed result for this (pair, end, reg, dir)
        // tasks are emitted in ascending pid order (mem_rescue_tasks walks
        // pairs sequentially): binary-search the pid range, then scan only
        // that pair's few rows — keeps rescue-heavy batches O(n log n)
        int lo = 0, hi = inj->n;
        while (lo < hi) {
          int mid = (lo + hi) / 2;
          if (inj->tasks[(size_t)mid * 8] < pid) lo = mid + 1;
          else hi = mid;
        }
        for (int t = lo; t < inj->n && inj->tasks[(size_t)t * 8] == pid;
             ++t) {
          const int64_t *row = inj->tasks + (size_t)t * 8;
          if (row[1] == end_i && row[2] == reg_j && row[3] == r) {
            const int32_t *q = inj->res + (size_t)t * 7;
            aln.score = q[0];
            aln.tb = q[1];
            aln.te = q[2];
            aln.qb = q[3];
            aln.qe = q[4];
            aln.score2 = q[5];
            aln.te2 = q[6];
            have = true;
            break;
          }
        }
      }
      if (!have) {
        if (inj) ++g_rescue_inject_miss;
        std::vector<uint8_t> rev;
        const uint8_t *seq;
        if (is_rev) {
          rev.resize(l_ms);
          for (int i = 0; i < l_ms; ++i)
            rev[l_ms - 1 - i] = ms[i] < 4 ? 3 - ms[i] : 4;
          seq = rev.data();
        } else seq = ms;
        aln = ksw_align(l_ms, seq, (int)(re - rb), ref.data(), 5, opt.mat,
                        opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
                        opt.min_seed_len * opt.a);
      }
      if (aln.score >= opt.min_seed_len && aln.qb >= 0) {
        AlnReg b;
        b.rid = a.rid;
        b.qb = is_rev ? l_ms - (aln.qe + 1) : aln.qb;
        b.qe = is_rev ? l_ms - aln.qb : aln.qe + 1;
        b.rb = is_rev ? (l_pac << 1) - (rb + aln.te + 1) : rb + aln.tb;
        b.re = is_rev ? (l_pac << 1) - (rb + aln.tb) : rb + aln.te + 1;
        b.score = aln.score;
        b.truesc = aln.score;
        b.csub = aln.score2;
        b.secondary = -1;
        b.seedcov = (int)(std::min(b.re - b.rb, (int64_t)(b.qe - b.qb)) >> 1);
        b.w = opt.w;
        // sorted insertion by score [bwa: the manual insertion loop]
        size_t t = 0;
        while (t < ma->size() && (*ma)[t].score >= b.score) ++t;
        ma->insert(ma->begin() + t, b);
        ++n;
      }
    }
  }
  return n;
}

void mem_rescue_tasks(const MemOpt &opt, const FMIdx &idx,
                      const PeStat pes[4], const std::vector<AlnReg> a[2],
                      const int l_seq[2], int64_t pid,
                      std::vector<int64_t> *out) {
  if (opt.flag & 0x20) return;  // MEM_F_NO_RESCUE
  int64_t l_pac = idx.l_pac;
  for (int i = 0; i < 2; ++i) {
    // the b[] selection of mem_sam_pe, over the pre-rescue lists
    std::vector<const AlnReg *> b;
    for (auto &r : a[i])
      if (r.score >= a[i][0].score - opt.pen_unpaired) b.push_back(&r);
    for (size_t j = 0; j < b.size() && (int)j < opt.max_matesw; ++j) {
      const AlnReg &ar = *b[j];
      // pre-rescue skip state: later scalar-replay skips are a superset
      int skip[4];
      for (int r = 0; r < 4; ++r) skip[r] = pes[r].failed ? 1 : 0;
      for (auto &m : a[!i]) {
        int64_t dist;
        int r = mem_infer_dir(l_pac, ar.rb, m.rb, &dist);
        if (dist >= pes[r].low && dist <= pes[r].high) skip[r] = 1;
      }
      if (skip[0] + skip[1] + skip[2] + skip[3] == 4) continue;
      for (int r = 0; r < 4; ++r) {
        if (skip[r]) continue;
        int is_rev, rid;
        int64_t rb, re;
        std::vector<uint8_t> ref;
        if (matesw_window(opt, idx, &pes[r], ar, l_seq[!i], r, &is_rev, &rb,
                          &re, &rid, &ref)) {
          int64_t row[8] = {pid, i, (int64_t)j, r, is_rev, rb, re, rid};
          out->insert(out->end(), row, row + 8);
        }
      }
    }
  }
}

int mem_pair(const MemOpt &opt, const FMIdx &idx, const PeStat pes[4],
             const std::vector<AlnReg> a[2], int64_t id, int *sub, int *n_sub,
             int z[2]) {
  int64_t l_pac = idx.l_pac;
  struct Key {
    uint64_t x, y;
  };
  std::vector<Key> v;
  for (int r = 0; r < 2; ++r)
    for (size_t i = 0; i < a[r].size(); ++i) {
      const AlnReg &e = a[r][i];
      // rid-composed forward coordinate [bwa: key.x = rid<<32 | chrpos]
      uint64_t fwd = e.rb < l_pac ? e.rb : (l_pac << 1) - 1 - e.rb;
      uint64_t x = (uint64_t)e.rid << 32 |
                   (fwd - (e.rid > 0 ? idx.ann_off[e.rid] : 0));
      v.push_back(Key{
          x,
          (uint64_t)e.score << 32 | i << 2 | (uint64_t)(e.rb >= l_pac) << 1 |
              (uint64_t)r});
    }
  std::stable_sort(v.begin(), v.end(), [](const Key &p, const Key &q) {
    return p.x < q.x || (p.x == q.x && p.y < q.y);
  });
  int y[4] = {-1, -1, -1, -1};
  struct Cand {
    int q;
    size_t order;
    int k, i;
  };
  std::vector<Cand> u;
  for (size_t i = 0; i < v.size(); ++i) {
    for (int r = 0; r < 2; ++r) {
      int dir = r << 1 | ((v[i].y >> 1) & 1);
      if (pes[dir].failed) continue;
      int which = r << 1 | (((int)v[i].y & 1) ^ 1);
      if (y[which] < 0) continue;
      for (int k = y[which]; k >= 0; --k) {
        if (((int)v[k].y & 3) != which) continue;
        int64_t dist = (int64_t)v[i].x - (int64_t)v[k].x;
        if (dist > pes[dir].high) break;
        if (dist < pes[dir].low) continue;
        double ns = (dist - pes[dir].avg) / pes[dir].std;
        int q = (int)((v[i].y >> 32) + (v[k].y >> 32) +
                      .721 * std::log(2. * std::erfc(std::fabs(ns) *
                                                     M_SQRT1_2)) *
                          opt.a + .499);
        if (q < 0) q = 0;
        u.push_back(Cand{q, u.size(), k, (int)i});
      }
    }
    y[(int)v[i].y & 3] = (int)i;
  }
  if (u.empty()) {
    *sub = *n_sub = 0;
    return 0;
  }
  int tmp = std::max({opt.a + opt.b, opt.o_del + opt.e_del,
                      opt.o_ins + opt.e_ins});
  // best pair = max q, ties by later insertion order (docs/PARITY.md)
  std::stable_sort(u.begin(), u.end(), [](const Cand &p, const Cand &q) {
    return p.q < q.q || (p.q == q.q && p.order < q.order);
  });
  const Cand &best = u.back();
  *sub = u.size() > 1 ? u[u.size() - 2].q : 0;
  *n_sub = 0;
  for (size_t t = 0; t + 1 < u.size(); ++t)
    if (u[t].q + tmp >= best.q) ++*n_sub;
  z[(int)v[best.i].y & 1] = (int)((uint32_t)v[best.i].y >> 2);
  z[(int)v[best.k].y & 1] = (int)((uint32_t)v[best.k].y >> 2);
  (void)id;
  return best.q;
}

void mem_sam_pe(const MemOpt &opt, const FMIdx &idx, const PeStat pes[4],
                int64_t id, const std::string name[2], const int l_seq[2],
                const uint8_t *seq[2], const char *qual[2],
                std::vector<AlnReg> a[2], const std::vector<std::string> &rn,
                const std::string &rg, std::string out[2],
                const RescueInject *inj, int64_t pid) {
  int z[2] = {0, 0}, subo = 0, n_sub = 0, extra_flag = 1;
  int64_t l_pac = idx.l_pac;
  // ---- mate rescue ----
  if (!(opt.flag & 0x20)) {  // MEM_F_NO_RESCUE
    std::vector<AlnReg> b[2];
    for (int i = 0; i < 2; ++i)
      for (auto &r : a[i])
        if (r.score >= a[i][0].score - opt.pen_unpaired) b[i].push_back(r);
    for (int i = 0; i < 2; ++i)
      for (size_t j = 0; j < b[i].size() && (int)j < opt.max_matesw; ++j)
        mem_matesw(opt, idx, pes, b[i][j], l_seq[!i], seq[!i], &a[!i], inj,
                   pid, i, (int)j);
  }
  int n_pri[2];
  for (int i = 0; i < 2; ++i) {
    mem_mark_primary_se(opt, &a[i], id << 1 | i);
    n_pri[i] = (int)a[i].size();  // no ALT contigs
  }
  int o;
  if (!(opt.flag & 0x4) && n_pri[0] && n_pri[1] &&
      (o = mem_pair(opt, idx, pes, a, id, &subo, &n_sub, z)) > 0) {
    // multi-hit check: another primary above threshold?
    int is_multi[2];
    for (int i = 0; i < 2; ++i) {
      int j;
      for (j = 1; j < n_pri[i]; ++j)
        if (a[i][j].secondary < 0 && a[i][j].score >= opt.T) break;
      is_multi[i] = j < n_pri[i];
    }
    if (!is_multi[0] && !is_multi[1]) {
      int q_se[2];
      int score_un = a[0][0].score + a[1][0].score - opt.pen_unpaired;
      int sub2 = std::max(subo, score_un);
      int q_pe = raw_mapq(o - sub2, opt.a);
      if (n_sub > 0) q_pe -= (int)(4.343 * std::log(n_sub + 1.) + .499);
      q_pe = std::min(std::max(q_pe, 0), 60);
      q_pe = (int)(q_pe * (1. - .5 * (a[0][0].frac_rep + a[1][0].frac_rep)) +
                   .499);
      if (o > score_un) {  // pairing wins
        for (int i = 0; i < 2; ++i) {
          AlnReg *c = &a[i][z[i]];
          if (c->secondary >= 0) {
            c->sub = a[i][c->secondary].score;
            c->secondary = -2;
          }
          q_se[i] = mem_approx_mapq_se(opt, *c);
        }
        for (int i = 0; i < 2; ++i) {
          q_se[i] = q_se[i] > q_pe
                        ? q_se[i]
                        : (q_pe < q_se[i] + 40 ? q_pe : q_se[i] + 40);
          q_se[i] = std::min(
              q_se[i], raw_mapq(a[i][z[i]].score - a[i][z[i]].csub, opt.a));
        }
        extra_flag |= 2;
      } else {
        z[0] = z[1] = 0;
        q_se[0] = mem_approx_mapq_se(opt, a[0][0]);
        q_se[1] = mem_approx_mapq_se(opt, a[1][0]);
      }
      // emit exactly one record per end + XA
      Aln h[2];
      for (int i = 0; i < 2; ++i) {
        h[i] = mem_reg2aln(opt, idx, l_seq[i], seq[i], &a[i][z[i]]);
        h[i].mapq = q_se[i];
        h[i].flag |= (0x40 << i) | extra_flag;
        h[i].flag &= ~0x100;  // chosen pair records are primary
      }
      // XA strings: reuse the SE generator by marking z as the XA primary
      for (int i = 0; i < 2; ++i) {
        std::string xa = gen_alt_for(opt, idx, a[i], l_seq[i], seq[i], rn,
                                     z[i]);
        h[i].xa = xa;
      }
      std::string s0, s1;
      aln2sam_one(opt, rn, &s0, name[0], l_seq[0], seq[0], qual[0], h[0],
                  &h[1], 0, rg);
      aln2sam_one(opt, rn, &s1, name[1], l_seq[1], seq[1], qual[1], h[1],
                  &h[0], 0, rg);
      out[0] = s0;
      out[1] = s1;
      return;
    }
  }
  // ---- no_pairing path ----
  Aln h[2];
  for (int i = 0; i < 2; ++i) {
    int which = -1;
    for (size_t j = 0; j < a[i].size(); ++j)
      if (a[i][j].secondary < 0 && a[i][j].score >= opt.T) {
        which = (int)j;
        break;
      }
    if (which >= 0)
      h[i] = mem_reg2aln(opt, idx, l_seq[i], seq[i], &a[i][which]);
    else h[i] = mem_reg2aln(opt, idx, l_seq[i], seq[i], nullptr);
  }
  if (!(opt.flag & 0x4) && h[0].rid == h[1].rid && h[0].rid >= 0 &&
      !a[0].empty() && !a[1].empty()) {
    int64_t dist;
    int d = mem_infer_dir(l_pac, a[0][0].rb, a[1][0].rb, &dist);
    if (!pes[d].failed && dist >= pes[d].low && dist <= pes[d].high)
      extra_flag |= 2;
  }
  out[0] = mem_reg2sam_se_mate(opt, idx, name[0], l_seq[0], seq[0], qual[0],
                               &a[0], 0x41 | extra_flag, rn, rg, &h[1]);
  out[1] = mem_reg2sam_se_mate(opt, idx, name[1], l_seq[1], seq[1], qual[1],
                               &a[1], 0x81 | extra_flag, rn, rg, &h[0]);
}

}  // namespace tb
