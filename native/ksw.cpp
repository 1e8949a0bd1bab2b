// Banded affine-gap DP kernels — scalar reference semantics.
// Mirrors [bwa: ksw.c :: ksw_extend2, ksw_global2, ksw_align2/ksw_u8].
// Written from algorithm knowledge; see docs/PARITY.md for deviations
// (int32 arithmetic instead of saturating u8/i16 SIMD lanes).
#include "oracle.h"

#include <cstdlib>
#include <cstring>
#include <algorithm>

namespace tb {

namespace {
struct EH { int h, e; };
constexpr int MINUS_INF = -0x40000000;
}  // namespace

ExtendResult ksw_extend2(int qlen, const uint8_t *query, int tlen,
                         const uint8_t *target, int m, const int8_t *mat,
                         int o_del, int e_del, int o_ins, int e_ins, int w,
                         int end_bonus, int zdrop, int h0) {
  ExtendResult r{};
  int oe_del = o_del + e_del, oe_ins = o_ins + e_ins;
  if (h0 < 0) h0 = 0;
  std::vector<int8_t> qp((size_t)qlen * m);  // query profile
  for (int k = 0, i = 0; k < m; ++k) {
    const int8_t *p = &mat[k * m];
    for (int j = 0; j < qlen; ++j) qp[i++] = p[query[j]];
  }
  std::vector<EH> eh(qlen + 1, EH{0, 0});
  // first row
  eh[0].h = h0;
  if (qlen > 0) eh[1].h = h0 > oe_ins ? h0 - oe_ins : 0;
  for (int j = 2; j <= qlen && eh[j - 1].h > e_ins; ++j)
    eh[j].h = eh[j - 1].h - e_ins;
  // clip the band width by the maximum possible gap length
  int max_sc = 0;
  for (int i = 0; i < m * m; ++i) max_sc = std::max<int>(max_sc, mat[i]);
  int max_ins = (int)((double)(qlen * max_sc + end_bonus - o_ins) / e_ins + 1.);
  max_ins = std::max(max_ins, 1);
  w = std::min(w, max_ins);
  int max_del = (int)((double)(qlen * max_sc + end_bonus - o_del) / e_del + 1.);
  max_del = std::max(max_del, 1);
  w = std::min(w, max_del);
  // DP loop
  int max = h0, max_i = -1, max_j = -1, max_ie = -1, gscore = -1, max_off = 0;
  int beg = 0, end = qlen;
  for (int i = 0; i < tlen; ++i) {
    int f = 0, h1, mm = 0, mj = -1;
    const int8_t *q = &qp[(size_t)target[i] * qlen];
    if (beg < i - w) beg = i - w;
    if (end > i + w + 1) end = i + w + 1;
    if (end > qlen) end = qlen;
    if (beg == 0) {
      h1 = h0 - (o_del + e_del * (i + 1));
      if (h1 < 0) h1 = 0;
    } else h1 = 0;
    int j = beg;
    for (; j < end; ++j) {
      // eh[j] = {H(i-1,j-1), E(i,j)} on entry; f = F(i,j); h1 = H(i,j-1)
      EH *p = &eh[j];
      int M = p->h, e = p->e;
      p->h = h1;
      M = M ? M + q[j] : 0;  // disallow a CIGAR like "100M3I3D20M"
      int h = M > e ? M : e;
      h = h > f ? h : f;
      h1 = h;
      mj = mm > h ? mj : j;
      mm = mm > h ? mm : h;
      int t = M - oe_del;
      t = t > 0 ? t : 0;
      e -= e_del;
      e = e > t ? e : t;
      p->e = e;
      t = M - oe_ins;
      t = t > 0 ? t : 0;
      f -= e_ins;
      f = f > t ? f : t;
    }
    eh[end].h = h1;
    eh[end].e = 0;
    if (j == qlen) {
      max_ie = gscore > h1 ? max_ie : i;
      gscore = gscore > h1 ? gscore : h1;
    }
    if (mm == 0) break;
    if (mm > max) {
      max = mm, max_i = i, max_j = mj;
      max_off = std::max(max_off, std::abs(mj - i));
    } else if (zdrop > 0) {
      if (i - max_i > mj - max_j) {
        if (max - mm - ((i - max_i) - (mj - max_j)) * e_del > zdrop) break;
      } else {
        if (max - mm - ((mj - max_j) - (i - max_i)) * e_ins > zdrop) break;
      }
    }
    // shrink the live band for the next row
    for (j = beg; j < end && eh[j].h == 0 && eh[j].e == 0; ++j) {}
    beg = j;
    for (j = end; j >= beg && eh[j].h == 0 && eh[j].e == 0; --j) {}
    end = j + 2 < qlen ? j + 2 : qlen;
  }
  r.score = max;
  r.qle = max_j + 1;
  r.tle = max_i + 1;
  r.gtle = max_ie + 1;
  r.gscore = gscore;
  r.max_off = max_off;
  return r;
}

static void push_cigar(std::vector<uint32_t> &c, int op, int len) {
  if (c.empty() || (int)(c.back() & 0xf) != op)
    c.push_back((uint32_t)len << 4 | op);
  else
    c.back() += (uint32_t)len << 4;
}

int ksw_global2(int qlen, const uint8_t *query, int tlen, const uint8_t *target,
                int m, const int8_t *mat, int o_del, int e_del, int o_ins,
                int e_ins, int w, std::vector<uint32_t> *cigar) {
  int oe_del = o_del + e_del, oe_ins = o_ins + e_ins;
  if (cigar) cigar->clear();
  if (qlen == 0 || tlen == 0) {
    if (cigar) {
      if (qlen) push_cigar(*cigar, 1, qlen);
      if (tlen) push_cigar(*cigar, 2, tlen);
    }
    return 0;
  }
  int n_col = std::min(qlen, 2 * w + 1);
  std::vector<uint8_t> z(cigar ? (size_t)n_col * tlen : 0);
  std::vector<int8_t> qp((size_t)qlen * m);
  for (int k = 0, i = 0; k < m; ++k) {
    const int8_t *p = &mat[k * m];
    for (int j = 0; j < qlen; ++j) qp[i++] = p[query[j]];
  }
  std::vector<EH> eh(qlen + 1);
  eh[0].h = 0;
  eh[0].e = MINUS_INF;
  int j;
  for (j = 1; j <= qlen && j <= w; ++j)
    eh[j] = EH{-(o_ins + e_ins * j), MINUS_INF};
  for (; j <= qlen; ++j) eh[j] = EH{MINUS_INF, MINUS_INF};  // outside the band
  for (int i = 0; i < tlen; ++i) {
    int f = MINUS_INF, h1;
    const int8_t *q = &qp[(size_t)target[i] * qlen];
    uint8_t *zi = cigar ? &z[(size_t)i * n_col] : nullptr;
    int beg = i > w ? i - w : 0;
    int end = i + w + 1 < qlen ? i + w + 1 : qlen;
    h1 = beg == 0 ? -(o_del + e_del * (i + 1)) : MINUS_INF;
    for (j = beg; j < end; ++j) {
      // eh[j] = {H(i-1,j-1), E(i,j)}; f = F(i,j); h1 = H(i,j-1)
      EH *p = &eh[j];
      int mv = p->h, e = p->e;
      uint8_t d;
      p->h = h1;
      mv += q[j];
      d = mv >= e ? 0 : 1;
      int h = mv >= e ? mv : e;
      d = h >= f ? d : 2;
      h = h >= f ? h : f;
      h1 = h;
      int t = mv - oe_del;
      e -= e_del;
      d |= e > t ? 1 << 2 : 0;
      e = e > t ? e : t;
      p->e = e;
      t = mv - oe_ins;
      f -= e_ins;
      d |= f > t ? 2 << 4 : 0;
      f = f > t ? f : t;
      if (zi) zi[j - beg] = d;
    }
    eh[end].h = h1;
    eh[end].e = MINUS_INF;
  }
  int score = eh[qlen].h;
  if (cigar) {  // backtrack: which-state machine over 2-bit codes
    std::vector<uint32_t> rc;
    int i = tlen - 1, which = 0;
    int k = (i + w + 1 < qlen ? i + w + 1 : qlen) - 1;
    while (i >= 0 && k >= 0) {
      uint8_t tmp = z[(size_t)i * n_col + (k - (i > w ? i - w : 0))];
      which = tmp >> (which << 1) & 3;
      if (which == 0) { push_cigar(rc, 0, 1); --i; --k; }
      else if (which == 1) { push_cigar(rc, 2, 1); --i; }
      else { push_cigar(rc, 1, 1); --k; }
    }
    if (i >= 0) push_cigar(rc, 2, i + 1);
    if (k >= 0) push_cigar(rc, 1, k + 1);
    cigar->assign(rc.rbegin(), rc.rend());
  }
  return score;
}

namespace {
// Forward local-SW pass: best score/end, per-column maxima recorded into runs
// for sub-optimal extraction [bwa: ksw.c :: ksw_u8 semantics, int32 math].
struct FwdResult { int score, te, qe, score2, te2; };

FwdResult local_fwd(int qlen, const uint8_t *query, int tlen,
                    const uint8_t *target, int m, const int8_t *mat, int o_del,
                    int e_del, int o_ins, int e_ins, int minsc) {
  int oe_del = o_del + e_del, oe_ins = o_ins + e_ins;
  std::vector<int8_t> qp((size_t)qlen * m);
  for (int k = 0, i = 0; k < m; ++k) {
    const int8_t *p = &mat[k * m];
    for (int j = 0; j < qlen; ++j) qp[i++] = p[query[j]];
  }
  std::vector<int> H(qlen + 1, 0), E(qlen + 1, 0);
  int best = 0, te = -1, qe = -1;
  std::vector<std::pair<int, int>> b;  // (col_max, target_pos) runs
  for (int i = 0; i < tlen; ++i) {
    const int8_t *q = &qp[(size_t)target[i] * qlen];
    int f = 0, h_diag = 0, imax = 0, imax_j = -1;
    for (int j = 0; j < qlen; ++j) {
      int h = h_diag + q[j];
      h_diag = H[j + 1];
      if (h < 0) h = 0;
      int e = E[j + 1];
      h = std::max(h, e);
      h = std::max(h, f);
      H[j + 1] = h;
      if (h > imax) imax = h, imax_j = j;
      // local-alignment e/f update uses H, not M [bwa: ksw.c :: ksw_u8]
      e = std::max(e - e_del, h - oe_del);
      E[j + 1] = std::max(e, 0);
      f = std::max(f - e_ins, h - oe_ins);
      f = std::max(f, 0);
    }
    if (imax > best) best = imax, te = i, qe = imax_j;
    if (imax >= minsc) {  // record column-run maxima for score2
      if (b.empty() || b.back().second + 1 != i)
        b.emplace_back(imax, i);
      else if (b.back().first < imax)
        b.back() = {imax, i};
    }
  }
  FwdResult r{best, te, qe, 0, -1};
  int low = te - qlen, high = te + qlen;
  for (auto &p : b)
    if ((p.second < low || p.second > high) && p.first > r.score2)
      r.score2 = p.first, r.te2 = p.second;
  return r;
}
}  // namespace

AlignResult ksw_align(int qlen, const uint8_t *query, int tlen,
                      const uint8_t *target, int m, const int8_t *mat,
                      int o_del, int e_del, int o_ins, int e_ins,
                      int xtra_minsc) {
  FwdResult f = local_fwd(qlen, query, tlen, target, m, mat, o_del, e_del,
                          o_ins, e_ins, xtra_minsc > 0 ? xtra_minsc : 0x10000);
  AlignResult r{f.score, f.te, f.qe, -1, -1, f.score2, f.te2};
  if (f.score < xtra_minsc || f.te < 0) return r;  // no start extraction
  // reverse pass on the prefixes ending at (qe, te) to find the start
  std::vector<uint8_t> rq(query, query + f.qe + 1), rt(target, target + f.te + 1);
  std::reverse(rq.begin(), rq.end());
  std::reverse(rt.begin(), rt.end());
  FwdResult g = local_fwd((int)rq.size(), rq.data(), (int)rt.size(), rt.data(),
                          m, mat, o_del, e_del, o_ins, e_ins, 0x10000);
  r.qb = f.qe - g.qe;
  r.tb = f.te - g.te;
  return r;
}

}  // namespace tb
