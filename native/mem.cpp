// Core BWA-MEM per-read pipeline — scalar reference semantics.
// Mirrors [bwa: bwamem.c :: mem_chain, mem_chain_flt, mem_chain2aln,
// mem_sort_dedup_patch, mem_mark_primary_se, mem_approx_mapq_se, mem_reg2aln,
// mem_reg2sam, mem_aln2sam] and [bwa: bwa.c :: bwa_gen_cigar2].
// Tie-breaking uses stable sorts on fully-ordered keys so the device (JAX)
// path can reproduce results exactly; see docs/PARITY.md.
#include "mem.h"

#include <algorithm>
#include <cassert>
#include <cmath>
#include <cstring>
#include <map>

namespace tb {

static constexpr int MAX_BAND_TRY = 2;

uint64_t hash_64(uint64_t key) {  // [bwa: bwamem.c :: hash_64]
  key += ~(key << 32);
  key ^= (key >> 22);
  key += ~(key << 13);
  key ^= (key >> 8);
  key += (key << 3);
  key ^= (key >> 15);
  key += ~(key << 27);
  key ^= (key >> 31);
  return key;
}

int64_t cal_max_gap(const MemOpt &opt, int qlen) {
  // [bwa: bwamem.c :: cal_max_gap]
  int l_del = (int)((double)(qlen * opt.a - opt.o_del) / opt.e_del + 1.);
  int l_ins = (int)((double)(qlen * opt.a - opt.o_ins) / opt.e_ins + 1.);
  int l = l_del > l_ins ? l_del : l_ins;
  l = l > 1 ? l : 1;
  return l < opt.w << 1 ? l : opt.w << 1;
}

// ---------------------------------------------------------------------------
// Chaining [bwa: bwamem.c :: mem_chain, test_and_merge]
// ---------------------------------------------------------------------------
static bool test_and_merge(const MemOpt &opt, int64_t l_pac, MemChain *c,
                           const MemSeed &p, int seed_rid) {
  const MemSeed &last = c->seeds.back();
  int64_t qend = last.qbeg + last.len, rend = last.rbeg + last.len;
  if (seed_rid != c->rid) return false;
  if (p.qbeg >= c->seeds[0].qbeg && p.qbeg + p.len <= qend &&
      p.rbeg >= c->seeds[0].rbeg && p.rbeg + p.len <= rend)
    return true;  // contained seed; do nothing
  if ((last.rbeg < l_pac || c->seeds[0].rbeg < l_pac) && p.rbeg >= l_pac)
    return false;  // different strands
  int64_t x = p.qbeg - last.qbeg;  // non-negative by construction
  int64_t y = p.rbeg - last.rbeg;
  if (y >= 0 && x - y <= opt.w && y - x <= opt.w &&
      x - last.len < opt.max_chain_gap && y - last.len < opt.max_chain_gap) {
    c->seeds.push_back(p);
    return true;
  }
  return false;
}

std::vector<MemChain> mem_chain(const MemOpt &opt, const FMIdx &idx, int len,
                                const uint8_t *seq) {
  std::vector<MemChain> out;
  if (len < opt.min_seed_len) return out;
  std::vector<BiIntv> mem;
  collect_intv(opt, idx, len, seq, &mem);
  // frac_rep: fraction of query covered by over-repetitive SMEMs
  int64_t l_rep = 0;
  {
    int b = 0, e = 0;
    for (auto &p : mem) {
      if (p.s <= opt.max_occ) continue;
      int sb = (int)(p.info >> 32), se = (int)(uint32_t)p.info;
      if (sb > e) { l_rep += e - b; b = sb; e = se; }
      else e = std::max(e, se);
    }
    l_rep += e - b;
  }
  // chains keyed by pos in an ordered multimap (the reference's B-tree).
  // Tie rule when several chains share pos: the most recently created one is
  // probed (multimap keeps equal keys in insertion order; --upper_bound hits
  // the last). bwa's kbtree leaves this unspecified; we pin it down so the
  // device path can match exactly (docs/PARITY.md).
  std::multimap<int64_t, MemChain> tree;
  for (auto &p : mem) {
    int slen = (int)((uint32_t)p.info - (p.info >> 32));
    int64_t step = p.s > opt.max_occ ? p.s / opt.max_occ : 1;
    int64_t count = 0;
    for (int64_t k = 0; k < p.s && count < opt.max_occ; k += step, ++count) {
      MemSeed s;
      s.rbeg = idx.sa(p.k + k);
      s.qbeg = (int)(p.info >> 32);
      s.score = s.len = slen;
      int rid = idx.intv2rid(s.rbeg, s.rbeg + s.len);
      if (rid < 0) continue;  // bridging sequences or the strand boundary
      bool to_add = true;
      if (!tree.empty()) {
        auto it = tree.upper_bound(s.rbeg);  // closest chain with pos <= rbeg
        if (it != tree.begin()) {
          --it;
          if (test_and_merge(opt, idx.l_pac, &it->second, s, rid))
            to_add = false;
        }
      }
      if (to_add) {
        MemChain c;
        c.pos = s.rbeg;
        c.rid = rid;
        c.seeds.push_back(s);
        tree.emplace(c.pos, std::move(c));
      }
    }
  }
  out.reserve(tree.size());
  for (auto &kv : tree) {
    kv.second.frac_rep = (double)l_rep / len;
    out.push_back(std::move(kv.second));
  }
  return out;
}

// ---------------------------------------------------------------------------
// Chain filtering [bwa: bwamem.c :: mem_chain_flt, mem_chain_weight]
// ---------------------------------------------------------------------------
static int chain_weight(const MemChain &c) {
  int64_t end = 0;
  int w = 0, tmp;
  for (auto &s : c.seeds) {
    if (s.qbeg >= end) w += s.len;
    else if (s.qbeg + s.len > end) w += (int)(s.qbeg + s.len - end);
    end = std::max<int64_t>(end, s.qbeg + s.len);
  }
  tmp = w;
  w = 0;
  end = 0;
  for (auto &s : c.seeds) {
    if (s.rbeg >= end) w += s.len;
    else if (s.rbeg + s.len > end) w += (int)(s.rbeg + s.len - end);
    end = std::max<int64_t>(end, s.rbeg + s.len);
  }
  w = std::min(w, tmp);
  return w < (1 << 30) ? w : (1 << 30) - 1;
}

static inline int chn_beg(const MemChain &c) { return c.seeds[0].qbeg; }
static inline int chn_end(const MemChain &c) {
  return c.seeds.back().qbeg + c.seeds.back().len;
}

int mem_chain_flt(const MemOpt &opt, std::vector<MemChain> *chains) {
  auto &a = *chains;
  if (a.empty()) return 0;
  size_t k2 = 0;
  for (size_t i = 0; i < a.size(); ++i) {
    a[i].first = -1;
    a[i].kept = 0;
    a[i].w = chain_weight(a[i]);
    if (a[i].w >= opt.min_chain_weight) {
      if (k2 != i) a[k2] = std::move(a[i]);
      ++k2;
    }
  }
  a.resize(k2);
  if (a.empty()) return 0;
  // weight desc; ties by (pos, qbeg) for full determinism (bwa: unstable)
  std::stable_sort(a.begin(), a.end(), [](const MemChain &x, const MemChain &y) {
    if (x.w != y.w) return x.w > y.w;
    if (x.pos != y.pos) return x.pos < y.pos;
    return chn_beg(x) < chn_beg(y);
  });
  std::vector<int> kept_idx;
  a[0].kept = 3;
  kept_idx.push_back(0);
  for (size_t i = 1; i < a.size(); ++i) {
    bool large_ovlp = false;
    size_t k = 0;
    for (; k < kept_idx.size(); ++k) {
      int j = kept_idx[k];
      int b_max = std::max(chn_beg(a[j]), chn_beg(a[i]));
      int e_min = std::min(chn_end(a[j]), chn_end(a[i]));
      if (e_min > b_max) {
        int li = chn_end(a[i]) - chn_beg(a[i]);
        int lj = chn_end(a[j]) - chn_beg(a[j]);
        int min_l = std::min(li, lj);
        if (e_min - b_max >= min_l * opt.mask_level &&
            min_l < opt.max_chain_gap) {
          large_ovlp = true;
          if (a[j].first < 0) a[j].first = (int)i;
          if (a[i].w < a[j].w * opt.drop_ratio &&
              a[j].w - a[i].w >= opt.min_seed_len << 1)
            break;
        }
      }
    }
    if (k == kept_idx.size()) {
      kept_idx.push_back((int)i);
      a[i].kept = large_ovlp ? 2 : 3;
    }
  }
  for (int j : kept_idx)
    if (a[j].first >= 0) a[a[j].first].kept = 1;
  // cap the number of shadowed (kept=1/2) chains to extend
  {
    size_t i = 0;
    int k = 0;
    for (; i < a.size(); ++i) {
      if (a[i].kept == 0 || a[i].kept == 3) continue;
      if (++k >= opt.max_chain_extend) break;
    }
    for (; i < a.size(); ++i)
      if (a[i].kept < 3) a[i].kept = 0;
  }
  size_t m = 0;
  for (size_t i = 0; i < a.size(); ++i)
    if (a[i].kept != 0) {
      if (m != i) a[m] = std::move(a[i]);
      ++m;
    }
  a.resize(m);
  return (int)m;
}

// ---------------------------------------------------------------------------
// Seed extension [bwa: bwamem.c :: mem_chain2aln]
// ---------------------------------------------------------------------------
void mem_chain2aln(const MemOpt &opt, const FMIdx &idx, int l_query,
                   const uint8_t *query, const MemChain &c,
                   std::vector<AlnReg> *av) {
  if (c.seeds.empty()) return;
  int64_t l_pac = idx.l_pac;
  int64_t rmax0 = l_pac << 1, rmax1 = 0;
  for (auto &t : c.seeds) {
    int64_t b = t.rbeg - (t.qbeg + cal_max_gap(opt, t.qbeg));
    int64_t e = t.rbeg + t.len +
                ((l_query - t.qbeg - t.len) +
                 cal_max_gap(opt, l_query - t.qbeg - t.len));
    rmax0 = std::min(rmax0, b);
    rmax1 = std::max(rmax1, e);
  }
  rmax0 = std::max<int64_t>(rmax0, 0);
  rmax1 = std::min(rmax1, l_pac << 1);
  if (rmax0 < l_pac && l_pac < rmax1) {  // crossing the strand boundary
    if (c.seeds[0].rbeg < l_pac) rmax1 = l_pac;
    else rmax0 = l_pac;
  }
  int rid;
  std::vector<uint8_t> rseq;
  idx.fetch_seq(&rmax0, c.seeds[0].rbeg, &rmax1, &rid, &rseq);
  assert(rid == c.rid);

  // visit seeds longest-first; ties by original index (stable)
  std::vector<uint64_t> srt(c.seeds.size());
  for (size_t i = 0; i < c.seeds.size(); ++i)
    srt[i] = (uint64_t)c.seeds[i].score << 32 | i;
  std::stable_sort(srt.begin(), srt.end());

  for (int k = (int)c.seeds.size() - 1; k >= 0; --k) {
    if (srt[k] == UINT64_MAX) continue;
    const MemSeed &s = c.seeds[(uint32_t)srt[k]];
    size_t i;
    for (i = 0; i < av->size(); ++i) {  // has this region been explored?
      const AlnReg &p = (*av)[i];
      if (s.rbeg < p.rb || s.rbeg + s.len > p.re || s.qbeg < p.qb ||
          s.qbeg + s.len > p.qe)
        continue;  // not fully contained
      if (s.len - p.seedlen0 > .1 * l_query) continue;
      int qd = s.qbeg - p.qb;
      int64_t rd = s.rbeg - p.rb;
      int64_t mg = cal_max_gap(opt, (int)std::min<int64_t>(qd, rd));
      int64_t w = std::min<int64_t>(mg, p.w);
      if (qd - rd < w && rd - qd < w) break;  // leading region close
      qd = p.qe - (s.qbeg + s.len);
      rd = p.re - (s.rbeg + s.len);
      mg = cal_max_gap(opt, (int)std::min<int64_t>(qd, rd));
      w = std::min<int64_t>(mg, p.w);
      if (qd - rd < w && rd - qd < w) break;  // trailing region close
    }
    if (i < av->size()) {  // contained: extend only if an overlapping seed
      size_t j;            // on a different diagonal exists in this chain
      for (j = k + 1; j < c.seeds.size(); ++j) {
        if (srt[j] == UINT64_MAX) continue;
        const MemSeed &t = c.seeds[(uint32_t)srt[j]];
        if (t.len < s.len * .95) continue;
        if (s.qbeg <= t.qbeg && s.qbeg + s.len - t.qbeg >= s.len >> 2 &&
            t.qbeg - s.qbeg != t.rbeg - s.rbeg)
          break;
        if (t.qbeg <= s.qbeg && t.qbeg + t.len - s.qbeg >= s.len >> 2 &&
            s.qbeg - t.qbeg != s.rbeg - t.rbeg)
          break;
      }
      if (j == c.seeds.size()) {  // no such seed: skip extension
        srt[k] = UINT64_MAX;
        continue;
      }
    }

    AlnReg a;
    int aw0 = opt.w, aw1 = opt.w;
    a.w = opt.w;
    a.score = a.truesc = -1;
    a.rid = c.rid;
    int max_off0 = 0, max_off1 = 0;

    if (s.qbeg) {  // left extension (reversed prefix)
      std::vector<uint8_t> qs(s.qbeg), rs(s.rbeg - rmax0);
      for (int ii = 0; ii < s.qbeg; ++ii) qs[ii] = query[s.qbeg - 1 - ii];
      int64_t tmp = s.rbeg - rmax0;
      for (int64_t ii = 0; ii < tmp; ++ii) rs[ii] = rseq[tmp - 1 - ii];
      ExtendResult er{};
      for (int ii = 0; ii < MAX_BAND_TRY; ++ii) {
        int prev = a.score;
        aw0 = opt.w << ii;
        er = ksw_extend2(s.qbeg, qs.data(), (int)tmp, rs.data(), 5, opt.mat,
                         opt.o_del, opt.e_del, opt.o_ins, opt.e_ins, aw0,
                         opt.pen_clip5, opt.zdrop, s.len * opt.a);
        a.score = er.score;
        max_off0 = er.max_off;
        if (a.score == prev || max_off0 < (aw0 >> 1) + (aw0 >> 2)) break;
      }
      if (er.gscore <= 0 || er.gscore <= a.score - opt.pen_clip5) {  // local
        a.qb = s.qbeg - er.qle;
        a.rb = s.rbeg - er.tle;
        a.truesc = a.score;
      } else {  // to-end
        a.qb = 0;
        a.rb = s.rbeg - er.gtle;
        a.truesc = er.gscore;
      }
    } else {
      a.score = a.truesc = s.len * opt.a;
      a.qb = 0;
      a.rb = s.rbeg;
    }

    if (s.qbeg + s.len != l_query) {  // right extension
      int qe = s.qbeg + s.len, sc0 = a.score;
      int64_t re = s.rbeg + s.len - rmax0;
      assert(re >= 0);
      ExtendResult er{};
      for (int ii = 0; ii < MAX_BAND_TRY; ++ii) {
        int prev = a.score;
        aw1 = opt.w << ii;
        er = ksw_extend2(l_query - qe, query + qe, (int)(rmax1 - rmax0 - re),
                         rseq.data() + re, 5, opt.mat, opt.o_del, opt.e_del,
                         opt.o_ins, opt.e_ins, aw1, opt.pen_clip3, opt.zdrop,
                         sc0);
        a.score = er.score;
        max_off1 = er.max_off;
        if (a.score == prev || max_off1 < (aw1 >> 1) + (aw1 >> 2)) break;
      }
      if (er.gscore <= 0 || er.gscore <= a.score - opt.pen_clip3) {  // local
        a.qe = qe + er.qle;
        a.re = rmax0 + re + er.tle;
        a.truesc += a.score - sc0;
      } else {  // to-end
        a.qe = l_query;
        a.re = rmax0 + re + er.gtle;
        a.truesc += er.gscore - sc0;
      }
    } else {
      a.qe = l_query;
      a.re = s.rbeg + s.len;
    }

    a.seedcov = 0;
    for (auto &t : c.seeds)
      if (t.qbeg >= a.qb && t.qbeg + t.len <= a.qe && t.rbeg >= a.rb &&
          t.rbeg + t.len <= a.re)
        a.seedcov += t.len;
    a.w = std::max(aw0, aw1);
    a.seedlen0 = s.len;
    a.frac_rep = c.frac_rep;
    av->push_back(a);
  }
}

// ---------------------------------------------------------------------------
// Dedup / patch [bwa: bwamem.c :: mem_sort_dedup_patch, mem_patch_reg]
// ---------------------------------------------------------------------------
static constexpr double PATCH_MAX_R_BW = 0.15;
static constexpr double PATCH_MIN_SC_RATIO = 0.90;

static int mem_patch_reg(const MemOpt &opt, const FMIdx &idx,
                         const uint8_t *query, const AlnReg &a, const AlnReg &b,
                         int *_w) {
  if (a.rb < idx.l_pac && b.rb >= idx.l_pac) return 0;  // different strands
  if (a.qb >= b.qb || a.qe >= b.qe || a.re >= b.re) return 0;  // not colinear
  int64_t wl = (a.re - b.rb) - (a.qe - b.qb);
  wl = wl > 0 ? wl : -wl;
  double r = (double)(a.re - b.rb) / (b.re - a.rb) -
             (double)(a.qe - b.qb) / (b.qe - a.qb);
  r = r > 0. ? r : -r;
  if (a.re < b.rb || a.qe < b.qb) {  // no overlap
    if (wl > opt.w << 1 || r >= PATCH_MAX_R_BW) return 0;
  } else if (wl > opt.w << 2 || r >= PATCH_MAX_R_BW * 2) return 0;
  int64_t w = wl + std::max(a.w, b.w);
  w = std::min<int64_t>(w, opt.w << 2);
  int q_s = (int)((double)(b.qe - a.qb) / ((b.qe - b.qb) + (a.qe - a.qb)) *
                      (b.score + a.score) + .499);
  int r_s = (int)((double)(b.re - a.rb) / ((b.re - b.rb) + (a.re - a.rb)) *
                      (b.score + a.score) + .499);
  int pred = std::max(q_s, r_s);
  int64_t rb = a.rb, re = b.re;
  int rid;
  std::vector<uint8_t> rseq;
  idx.fetch_seq(&rb, (a.rb + b.re) >> 1, &re, &rid, &rseq);
  if (rb != a.rb || re != b.re) return 0;  // window clipped: give up
  int score = ksw_global2(b.qe - a.qb, query + a.qb, (int)(re - rb),
                          rseq.data(), 5, opt.mat, opt.o_del, opt.e_del,
                          opt.o_ins, opt.e_ins, (int)w, nullptr);
  if ((double)score / pred < PATCH_MIN_SC_RATIO) return 0;
  *_w = (int)w;
  return score;
}

int mem_sort_dedup_patch(const MemOpt &opt, const FMIdx &idx,
                         const uint8_t *query, std::vector<AlnReg> *av) {
  auto &a = *av;
  int n = (int)a.size();
  if (n <= 1) return n;
  // sort by END position (ties: rb, qb for determinism)
  std::stable_sort(a.begin(), a.end(), [](const AlnReg &x, const AlnReg &y) {
    if (x.re != y.re) return x.re < y.re;
    if (x.rb != y.rb) return x.rb < y.rb;
    return x.qb < y.qb;
  });
  for (auto &p : a) p.n_comp = 1;
  for (int i = 1; i < n; ++i) {
    AlnReg *p = &a[i];
    if (p->rid != a[i - 1].rid || p->rb >= a[i - 1].re + opt.max_chain_gap)
      continue;
    for (int j = i - 1;
         j >= 0 && p->rid == a[j].rid && p->rb < a[j].re + opt.max_chain_gap;
         --j) {
      AlnReg *q = &a[j];
      if (q->qe == q->qb) continue;  // excluded
      int64_t or_ = q->re - p->rb;
      int64_t oq = q->qb < p->qb ? q->qe - p->qb : p->qe - q->qb;
      int64_t mr = std::min(q->re - q->rb, p->re - p->rb);
      int64_t mq = std::min<int64_t>(q->qe - q->qb, p->qe - p->qb);
      if (or_ > opt.mask_level_redun * mr && oq > opt.mask_level_redun * mq) {
        if (p->score < q->score) {
          p->qe = p->qb;
          break;
        } else q->qe = q->qb;
      } else if (q->rb < p->rb) {
        int w = 0, score = mem_patch_reg(opt, idx, query, *q, *p, &w);
        if (score > 0) {  // merge q into p
          p->n_comp += q->n_comp + 1;
          p->seedcov = std::max(p->seedcov, q->seedcov);
          p->sub = std::max(p->sub, q->sub);
          p->csub = std::max(p->csub, q->csub);
          p->qb = q->qb;
          p->rb = q->rb;
          p->truesc = p->score = score;
          p->w = w;
          q->qb = q->qe;
        }
      }
    }
  }
  int m = 0;
  for (int i = 0; i < n; ++i)
    if (a[i].qe > a[i].qb) a[m++] = a[i];
  a.resize(m);
  n = m;
  // score desc; ties rb, qb [bwa: mem_ars sort]
  std::stable_sort(a.begin(), a.end(), [](const AlnReg &x, const AlnReg &y) {
    if (x.score != y.score) return x.score > y.score;
    if (x.rb != y.rb) return x.rb < y.rb;
    return x.qb < y.qb;
  });
  for (int i = 1; i < n; ++i)
    if (a[i].score == a[i - 1].score && a[i].rb == a[i - 1].rb &&
        a[i].qb == a[i - 1].qb)
      a[i].qe = a[i].qb;
  m = 0;
  for (int i = 0; i < n; ++i)
    if (a[i].qe > a[i].qb) a[m++] = a[i];
  a.resize(m);
  return m;
}

// ---------------------------------------------------------------------------
// Primary marking + MAPQ [bwa: bwamem.c :: mem_mark_primary_se,
// mem_approx_mapq_se]
// ---------------------------------------------------------------------------
void mem_mark_primary_se(const MemOpt &opt, std::vector<AlnReg> *av,
                         int64_t id) {
  auto &a = *av;
  int n = (int)a.size();
  if (n == 0) return;
  for (int i = 0; i < n; ++i) {
    a[i].sub = 0;
    a[i].secondary = a[i].secondary_all = -1;
    a[i].hash = hash_64((uint64_t)(id + i));
  }
  std::stable_sort(a.begin(), a.end(), [](const AlnReg &x, const AlnReg &y) {
    if (x.score != y.score) return x.score > y.score;
    return x.hash < y.hash;
  });
  int tmp = opt.a + opt.b;
  tmp = std::max(tmp, opt.o_del + opt.e_del);
  tmp = std::max(tmp, opt.o_ins + opt.e_ins);
  std::vector<int> z;
  z.push_back(0);
  for (int i = 1; i < n; ++i) {
    size_t k;
    for (k = 0; k < z.size(); ++k) {
      int j = z[k];
      int b_max = std::max(a[j].qb, a[i].qb);
      int e_min = std::min(a[j].qe, a[i].qe);
      if (e_min > b_max) {
        int min_l = std::min(a[i].qe - a[i].qb, a[j].qe - a[j].qb);
        if (e_min - b_max >= min_l * opt.mask_level) {  // significant overlap
          if (a[j].sub == 0) a[j].sub = a[i].score;
          if (a[j].score - a[i].score <= tmp) ++a[j].sub_n;
          break;
        }
      }
    }
    if (k == z.size()) z.push_back(i);
    else a[i].secondary = z[k];
  }
  // no ALT-contig handling: secondary_all mirrors secondary
  for (int i = 0; i < n; ++i) a[i].secondary_all = a[i].secondary;
}

int mem_approx_mapq_se(const MemOpt &opt, const AlnReg &a) {
  int sub = a.sub ? a.sub : opt.min_seed_len * opt.a;
  sub = std::max(sub, a.csub);
  if (sub >= a.score) return 0;
  int l = std::max<int64_t>(a.qe - a.qb, a.re - a.rb);
  double identity = 1. - (double)(l * opt.a - a.score) / (opt.a + opt.b) / l;
  int mapq;
  if (a.score == 0) mapq = 0;
  else if (opt.mapq_coef_len > 0) {
    double tmp = l < opt.mapq_coef_len ? 1. : std::log(opt.mapq_coef_len) / std::log(l);
    tmp *= identity * identity;
    mapq = (int)(6.02 * (a.score - sub) / opt.a * tmp * tmp + .499);
  } else {
    mapq = (int)(30.0 * (1. - (double)sub / a.score) * std::log((double)a.seedcov) + .499);
  }
  if (a.sub_n > 0) mapq -= (int)(4.343 * std::log(a.sub_n + 1.) + .499);
  mapq = std::min(mapq, 60);
  mapq = std::max(mapq, 0);
  mapq = (int)(mapq * (1. - a.frac_rep) + .499);
  return mapq;
}

// ---------------------------------------------------------------------------
// reg -> aln (global realignment + CIGAR + NM/MD)
// [bwa: bwamem.c :: mem_reg2aln, infer_bw] [bwa: bwa.c :: bwa_gen_cigar2]
// ---------------------------------------------------------------------------
static inline int infer_bw(int l1, int l2, int score, int a, int q, int r) {
  if (l1 == l2 && l1 * a - score < (q + r - a) << 1) return 0;
  int w = (int)((double)(std::min(l1, l2) * a - score - q) / r + 2.);
  return std::max(w, std::abs(l1 - l2));
}

static int gen_cigar(const MemOpt &opt, const FMIdx &idx, int w_, int l_query,
                     const uint8_t *query_in, int64_t rb, int64_t re,
                     int *score, std::vector<uint32_t> *cigar, int *NM,
                     std::string *md) {
  cigar->clear();
  *NM = -1;
  if (l_query <= 0 || rb >= re || (rb < idx.l_pac && re > idx.l_pac)) return -1;
  std::vector<uint8_t> rseq(re - rb);
  idx.get_seq(rb, re, rseq.data());
  std::vector<uint8_t> query(query_in, query_in + l_query);
  int64_t rlen = re - rb;
  if (rb >= idx.l_pac) {  // reverse both so indels left-align on fwd strand
    std::reverse(query.begin(), query.end());
    std::reverse(rseq.begin(), rseq.end());
  }
  if (l_query == rlen && w_ == 0) {  // no gap possible
    cigar->push_back((uint32_t)l_query << 4 | 0);
    *score = 0;
    for (int i = 0; i < l_query; ++i)
      *score += opt.mat[rseq[i] * 5 + query[i]];
  } else {
    int max_ins =
        (int)((double)(((l_query + 1) >> 1) * opt.mat[0] - opt.o_ins) / opt.e_ins + 1.);
    int max_del =
        (int)((double)(((l_query + 1) >> 1) * opt.mat[0] - opt.o_del) / opt.e_del + 1.);
    int max_gap = std::max(std::max(max_ins, max_del), 1);
    int w = (int)((max_gap + std::abs((int)(rlen - l_query)) + 1) >> 1);
    w = std::min(w, w_);
    int min_w = std::abs((int)(rlen - l_query)) + 3;
    w = std::max(w, min_w);
    *score = ksw_global2(l_query, query.data(), (int)rlen, rseq.data(), 5,
                         opt.mat, opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
                         w, cigar);
  }
  {  // NM and MD
    const char *int2base = rb < idx.l_pac ? "ACGTN" : "TGCAN";
    int x = 0, y = 0, u = 0, n_mm = 0, n_gap = 0;
    md->clear();
    for (size_t k = 0; k < cigar->size(); ++k) {
      int op = (*cigar)[k] & 0xf, len = (*cigar)[k] >> 4;
      if (op == 0) {
        for (int i = 0; i < len; ++i) {
          if (query[x + i] != rseq[y + i]) {
            *md += std::to_string(u);
            *md += int2base[rseq[y + i]];
            ++n_mm;
            u = 0;
          } else ++u;
        }
        x += len;
        y += len;
      } else if (op == 2) {
        if (k > 0 && k + 1 < cigar->size()) {
          *md += std::to_string(u);
          *md += '^';
          for (int i = 0; i < len; ++i) *md += int2base[rseq[y + i]];
          u = 0;
          n_gap += len;
        }
        y += len;
      } else if (op == 1) {
        x += len;
        n_gap += len;
      }
    }
    *md += std::to_string(u);
    *NM = n_mm + n_gap;
  }
  return 0;
}

Aln mem_reg2aln(const MemOpt &opt, const FMIdx &idx, int l_query,
                const uint8_t *query, const AlnReg *ar) {
  Aln a;
  if (ar == nullptr || ar->rb < 0 || ar->re < 0) {
    a.rid = -1;
    a.pos = -1;
    a.flag |= 0x4;
    return a;
  }
  int qb = ar->qb, qe = ar->qe;
  int64_t rb = ar->rb, re = ar->re;
  a.mapq = ar->secondary < 0 ? mem_approx_mapq_se(opt, *ar) : 0;
  if (ar->secondary >= 0) a.flag |= 0x100;
  int tmp = infer_bw(qe - qb, (int)(re - rb), ar->truesc, opt.a, opt.o_del, opt.e_del);
  int w2 = infer_bw(qe - qb, (int)(re - rb), ar->truesc, opt.a, opt.o_ins, opt.e_ins);
  w2 = std::max(w2, tmp);
  if (w2 > opt.w) w2 = std::min(w2, ar->w);
  int score = 0, NM = -1, last_sc = -(1 << 30);
  for (int i = 0; i < 3; ++i) {
    w2 = std::min(w2, opt.w << 2);
    gen_cigar(opt, idx, w2, qe - qb, query + qb, rb, re, &score, &a.cigar, &NM,
              &a.md);
    if (score == last_sc || w2 == opt.w << 2) break;
    last_sc = score;
    w2 <<= 1;
    if (!(score < ar->truesc - opt.a)) break;
  }
  a.NM = NM;
  int is_rev;
  int64_t pos = idx.depos(rb < idx.l_pac ? rb : re - 1, &is_rev);
  a.is_rev = is_rev;
  if (!a.cigar.empty()) {  // squeeze out leading/trailing deletions
    if ((a.cigar.front() & 0xf) == 2) {
      pos += a.cigar.front() >> 4;
      a.cigar.erase(a.cigar.begin());
    } else if ((a.cigar.back() & 0xf) == 2) {
      a.cigar.pop_back();
    }
  }
  if (qb != 0 || qe != l_query) {  // soft clips
    int clip5 = is_rev ? l_query - qe : qb;
    int clip3 = is_rev ? qb : l_query - qe;
    if (clip5) a.cigar.insert(a.cigar.begin(), (uint32_t)clip5 << 4 | 3);
    if (clip3) a.cigar.push_back((uint32_t)clip3 << 4 | 3);
  }
  a.rid = idx.pos2rid(pos);
  a.pos = pos - idx.ann_off[a.rid];
  a.score = ar->score;
  a.sub = std::max(ar->sub, ar->csub);
  return a;
}

// ---------------------------------------------------------------------------
// Full worker1 pipeline
// ---------------------------------------------------------------------------
std::vector<AlnReg> mem_align1(const MemOpt &opt, const FMIdx &idx, int l_query,
                               const uint8_t *seq, int64_t id) {
  std::vector<MemChain> chains = mem_chain(opt, idx, l_query, seq);
  mem_chain_flt(opt, &chains);
  std::vector<AlnReg> regs;
  for (auto &c : chains) mem_chain2aln(opt, idx, l_query, seq, c, &regs);
  mem_sort_dedup_patch(opt, idx, seq, &regs);
  (void)id;
  return regs;
}

// ---------------------------------------------------------------------------
// SAM emission [bwa: bwamem.c :: mem_reg2sam, mem_aln2sam, mem_gen_alt]
// ---------------------------------------------------------------------------
static int64_t get_rlen(const std::vector<uint32_t> &cigar) {
  int64_t l = 0;
  for (uint32_t c : cigar) {
    int op = c & 0xf;
    if (op == 0 || op == 2) l += c >> 4;
  }
  return l;
}

void aln2sam_one(const MemOpt &opt, const std::vector<std::string> &rnames,
                 std::string *str, const std::string &name, int l_seq,
                 const uint8_t *seq, const char *qual, const Aln &p_in,
                 const Aln *m, int which, const std::string &rg_id,
                 const Aln *list, int n_list) {
  Aln p = p_in;  // copy: flags are modified below
  p.flag |= m ? 0x1 : 0;
  p.flag |= p.rid < 0 ? 0x4 : 0;
  p.flag |= m && m->rid < 0 ? 0x8 : 0;
  Aln mate;
  bool has_m = m != nullptr;
  if (has_m) mate = *m;
  if (p.rid < 0 && has_m && mate.rid >= 0) {
    p.rid = mate.rid;
    p.pos = mate.pos;
    p.is_rev = mate.is_rev;
    p.cigar.clear();
  }
  if (has_m && mate.rid < 0 && p.rid >= 0) {
    mate.rid = p.rid;
    mate.pos = p.pos;
    mate.is_rev = p.is_rev;
    mate.cigar.clear();
  }
  p.flag |= p.is_rev ? 0x10 : 0;
  p.flag |= has_m && mate.is_rev ? 0x20 : 0;

  *str += name;
  *str += '\t';
  *str += std::to_string((p.flag & 0xffff) | (p.flag & 0x10000 ? 0x100 : 0));
  *str += '\t';
  if (p.rid >= 0) {
    *str += rnames[p.rid];
    *str += '\t';
    *str += std::to_string(p.pos + 1);
    *str += '\t';
    *str += std::to_string(p.mapq);
    *str += '\t';
    if (!p.cigar.empty()) {
      for (uint32_t c : p.cigar) {
        int op = c & 0xf;
        if (!(opt.flag & 0x200) && (op == 3 || op == 4))
          op = which ? 4 : 3;  // hard-clip supplementary records
        *str += std::to_string(c >> 4);
        *str += "MIDSH"[op];
      }
    } else *str += '*';
  } else *str += "*\t0\t0\t*";
  *str += '\t';
  if (has_m && mate.rid >= 0) {
    if (p.rid == mate.rid) *str += '=';
    else *str += rnames[mate.rid];
    *str += '\t';
    *str += std::to_string(mate.pos + 1);
    *str += '\t';
    if (p.rid == mate.rid && !p.cigar.empty() && !mate.cigar.empty()) {
      int64_t p0 = p.pos + (p.is_rev ? get_rlen(p.cigar) - 1 : 0);
      int64_t p1 = mate.pos + (mate.is_rev ? get_rlen(mate.cigar) - 1 : 0);
      *str += std::to_string(-(p0 - p1 + (p0 > p1 ? 1 : p0 < p1 ? -1 : 0)));
    } else *str += '0';
  } else *str += "*\t0\t0";
  *str += '\t';
  if (p.flag & 0x100) {
    *str += "*\t*";
  } else {
    int qb = 0, qe = l_seq;
    if (!p.cigar.empty() && which && !(opt.flag & 0x200)) {
      if ((p.cigar.front() & 0xf) == 4 || (p.cigar.front() & 0xf) == 3)
        qb += p.cigar.front() >> 4;
      if ((p.cigar.back() & 0xf) == 4 || (p.cigar.back() & 0xf) == 3)
        qe -= p.cigar.back() >> 4;
    }
    static const char *B = "ACGTN";
    if (!p.is_rev) {
      for (int i = qb; i < qe; ++i) *str += B[seq[i]];
      *str += '\t';
      if (qual) for (int i = qb; i < qe; ++i) *str += qual[i];
      else *str += '*';
    } else {
      for (int i = qe - 1; i >= qb; --i) *str += B[seq[i] < 4 ? 3 - seq[i] : 4];
      *str += '\t';
      if (qual) for (int i = qe - 1; i >= qb; --i) *str += qual[i];
      else *str += '*';
    }
  }
  if (!p.cigar.empty()) {
    *str += "\tNM:i:";
    *str += std::to_string(p.NM);
    *str += "\tMD:Z:";
    *str += p.md;
  }
  if (p.score >= 0) {
    *str += "\tAS:i:";
    *str += std::to_string(p.score);
  }
  if (p.sub >= 0) {
    *str += "\tXS:i:";
    *str += std::to_string(p.sub);
  }
  if (!rg_id.empty()) {
    *str += "\tRG:Z:";
    *str += rg_id;
  }
  if (!(p.flag & 0x100) && list) {
    // SA:Z on every non-secondary record when other non-secondary records
    // exist [bwa: mem_aln2sam SA block]
    int i;
    for (i = 0; i < n_list; ++i)
      if (i != which && !(list[i].flag & 0x100)) break;
    if (i < n_list) {
      *str += "\tSA:Z:";
      for (i = 0; i < n_list; ++i) {
        const Aln &r = list[i];
        if (i == which || (r.flag & 0x100)) continue;
        *str += rnames[r.rid];
        *str += ',';
        *str += std::to_string(r.pos + 1);
        *str += ',';
        *str += r.is_rev ? '-' : '+';
        *str += ',';
        for (uint32_t c : r.cigar) {
          *str += std::to_string(c >> 4);
          *str += "MIDSH"[c & 0xf];
        }
        *str += ',';
        *str += std::to_string(r.mapq);
        *str += ',';
        *str += std::to_string(r.NM);
        *str += ';';
      }
    }
  }
  if (!p.xa.empty()) {
    *str += "\tXA:Z:";
    *str += p.xa;
  }
  *str += '\n';
}

// XA strings for secondaries [bwa: bwamem_extra.c :: mem_gen_alt]
std::vector<std::string> gen_alt(const MemOpt &opt, const FMIdx &idx,
                                        const std::vector<AlnReg> &a,
                                        int l_query, const uint8_t *query,
                                        const std::vector<std::string> &rnames) {
  std::vector<std::string> XA(a.size());
  std::vector<int> cnt(a.size(), 0);
  auto pri_idx = [&](int i) -> int {
    int k = a[i].secondary_all;
    if (k >= 0 && a[i].score >= a[k].score * opt.xa_drop_ratio) return k;
    return -1;
  };
  for (size_t i = 0; i < a.size(); ++i) {
    int r = pri_idx((int)i);
    if (r >= 0) ++cnt[r];
  }
  std::vector<std::string> alt(a.size());
  for (size_t i = 0; i < a.size(); ++i) {
    int r = pri_idx((int)i);
    if (r < 0 || cnt[r] > opt.max_xa_hits) continue;
    Aln t = mem_reg2aln(opt, idx, l_query, query, &a[i]);
    std::string s = rnames[t.rid];
    s += ',';
    s += t.is_rev ? '-' : '+';
    s += std::to_string(t.pos + 1);
    s += ',';
    for (uint32_t c : t.cigar) {
      s += std::to_string(c >> 4);
      s += "MIDSH"[c & 0xf];
    }
    s += ',';
    s += std::to_string(t.NM);
    s += ';';
    alt[r] += s;
  }
  return alt;
}

std::string gen_alt_for(const MemOpt &opt, const FMIdx &idx,
                        const std::vector<AlnReg> &a, int l_query,
                        const uint8_t *seq,
                        const std::vector<std::string> &rnames, int pri) {
  if (opt.flag & 0x8) return "";
  auto alt = gen_alt(opt, idx, a, l_query, seq, rnames);
  return pri >= 0 && pri < (int)alt.size() ? alt[pri] : "";
}

std::string mem_reg2sam_se_mate(const MemOpt &opt, const FMIdx &idx,
                                const std::string &name, int l_query,
                                const uint8_t *seq, const char *qual,
                                std::vector<AlnReg> *av, int extra_flag,
                                const std::vector<std::string> &rnames,
                                const std::string &rg_id, const Aln *mate) {
  auto &a = *av;
  std::vector<std::string> XA;
  if (!(opt.flag & 0x8))  // MEM_F_ALL off: emit secondaries via XA
    XA = gen_alt(opt, idx, a, l_query, seq, rnames);
  std::vector<Aln> aa;
  std::string str;
  int l = 0;
  for (size_t k = 0; k < a.size(); ++k) {
    AlnReg &p = a[k];
    if (p.score < opt.T) continue;
    if (p.secondary >= 0 && !(opt.flag & 0x8)) continue;
    if (p.secondary >= 0 && p.score < a[p.secondary].score * opt.drop_ratio)
      continue;
    Aln q = mem_reg2aln(opt, idx, l_query, seq, &p);
    q.xa = XA.empty() ? "" : XA[k];
    q.flag |= extra_flag;
    if (p.secondary >= 0) q.sub = -1;
    if (l && p.secondary < 0) q.flag |= (opt.flag & 0x10) ? 0x10000 : 0x800;
    if (l && q.mapq > aa[0].mapq) q.mapq = aa[0].mapq;
    ++l;
    aa.push_back(std::move(q));
  }
  if (aa.empty()) {
    Aln t = mem_reg2aln(opt, idx, l_query, seq, nullptr);
    t.flag |= extra_flag;
    aln2sam_one(opt, rnames, &str, name, l_query, seq, qual, t, mate, 0,
                rg_id);
  } else {
    for (size_t k = 0; k < aa.size(); ++k)
      aln2sam_one(opt, rnames, &str, name, l_query, seq, qual, aa[k], mate,
                  (int)k, rg_id, aa.data(), (int)aa.size());
  }
  return str;
}

std::string mem_reg2sam_se(const MemOpt &opt, const FMIdx &idx,
                           const std::string &name, int l_query,
                           const uint8_t *seq, const char *qual,
                           std::vector<AlnReg> *av, int extra_flag,
                           const std::vector<std::string> &rnames,
                           const std::string &rg_id) {
  return mem_reg2sam_se_mate(opt, idx, name, l_query, seq, qual, av,
                             extra_flag, rnames, rg_id, nullptr);
}

}  // namespace tb
