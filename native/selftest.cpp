// Native smoke test — built standalone (with sanitizers in
// scripts/check_native.sh) to exercise the oracle end-to-end without
// Python: builds a toy index the same way tpubwa.index.builder does,
// aligns synthetic reads, checks invariants.
#ifdef TB_SELFTEST
#include <cassert>
#include <cstring>
#include <algorithm>
#include <cstdio>
#include <random>
#include <string>
#include <vector>

#include "fm.h"
#include "mem.h"
#include "oracle.h"

extern "C" int tb_sais(const uint8_t *T, int64_t n, int64_t *sa_out);

using namespace tb;

static MemOpt default_opt() {
  MemOpt o{};
  o.a = 1; o.b = 4; o.o_del = o.o_ins = 6; o.e_del = o.e_ins = 1;
  o.pen_unpaired = 17; o.pen_clip5 = o.pen_clip3 = 5; o.w = 100;
  o.zdrop = 100; o.min_seed_len = 19; o.split_width = 10; o.max_occ = 500;
  o.max_chain_gap = 10000; o.max_chain_extend = 1 << 30;
  o.min_chain_weight = 0; o.T = 30; o.flag = 0; o.max_ins = 10000;
  o.max_matesw = 50; o.max_xa_hits = 5;
  o.split_factor = 1.5; o.mask_level = .5; o.drop_ratio = .5;
  o.mask_level_redun = .95; o.mapq_coef_len = 50.; o.xa_drop_ratio = .8;
  int k = 0;
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 5; ++j)
      o.mat[k++] = j < 4 ? (i == j ? 1 : -4) : -1;
  for (int j = 0; j < 5; ++j) o.mat[k++] = -1;
  return o;
}

int main() {
  std::mt19937 rng(42);
  const int64_t L = 20000;
  std::vector<uint8_t> fwd(L);
  for (auto &b : fwd) b = rng() & 3;
  std::vector<uint8_t> text(2 * L);
  for (int64_t i = 0; i < L; ++i) text[i] = fwd[i];
  for (int64_t i = 0; i < L; ++i) text[L + i] = 3 - fwd[L - 1 - i];
  std::vector<int64_t> sa(2 * L);
  tb_sais(text.data(), 2 * L, sa.data());
  // spot-check SA ordering
  for (int t = 0; t < 200; ++t) {
    int64_t i = rng() % (2 * L - 1);
    const uint8_t *a = &text[sa[i]], *b = &text[sa[i + 1]];
    int64_t la = 2 * L - sa[i], lb = 2 * L - sa[i + 1];
    int cmp = std::memcmp(a, b, (size_t)std::min(la, lb));
    assert(cmp < 0 || (cmp == 0 && la < lb));
  }
  // build BWT structures matching tpubwa/index/builder.py
  int64_t primary = 0;
  std::vector<uint8_t> bwt(2 * L);
  bwt[0] = text[2 * L - 1];
  int64_t row = 1;
  for (int64_t j = 0; j < 2 * L; ++j) {
    if (sa[j] == 0) { primary = j + 1; continue; }
    bwt[row++] = text[sa[j] - 1];
  }
  // occ checkpoints + words
  int64_t n = 2 * L;
  int64_t n_cp = (n + 63) / 64 + 1;
  std::vector<uint32_t> occ_cp(n_cp * 4, 0), words(n_cp * 4, 0);
  {
    int64_t cnt[4] = {0, 0, 0, 0};
    for (int64_t i = 0; i < (n_cp - 1) * 64; ++i) {
      if (i % 64 == 0)
        for (int c = 0; c < 4; ++c) occ_cp[(i / 64) * 4 + c] = (uint32_t)cnt[c];
      uint8_t b = i < n ? bwt[i] : 0;
      if (i < n) ++cnt[b];
      words[i / 16] |= (uint32_t)b << (2 * (i % 16));
    }
    for (int c = 0; c < 4; ++c) occ_cp[(n_cp - 1) * 4 + c] = (uint32_t)cnt[c];
  }
  int64_t L2[5] = {0, 0, 0, 0, 0};
  for (int64_t i = 0; i < n; ++i) ++L2[text[i] + 1];
  for (int c = 1; c < 5; ++c) L2[c] += L2[c - 1];
  std::vector<int64_t> sam((n + 1 + 7) / 8 + 1);
  {
    std::vector<int64_t> conc(n + 1);
    conc[0] = -1;
    for (int64_t j = 0; j < n; ++j) conc[j + 1] = sa[j];
    for (int64_t i = 0; i * 8 <= n; ++i) sam[i] = conc[i * 8];
  }
  std::vector<uint8_t> pac((L + 3) / 4, 0);
  for (int64_t i = 0; i < L; ++i)
    pac[i >> 2] |= fwd[i] << ((~i & 3) << 1);
  int64_t ann_off[1] = {0}, ann_len[1] = {L};

  FMIdx idx;
  idx.l_pac = L; idx.primary = primary; idx.sa_intv = 8;
  idx.L2 = L2; idx.bwt_words = words.data(); idx.occ_cp = occ_cp.data();
  idx.sa_samples = sam.data(); idx.pac = pac.data();
  idx.ann_off = ann_off; idx.ann_len = ann_len; idx.n_anns = 1;

  MemOpt opt = default_opt();
  std::vector<std::string> rn{"chr1"};
  int aligned = 0;
  for (int t = 0; t < 50; ++t) {
    int64_t pos = rng() % (L - 120);
    std::vector<uint8_t> read(fwd.begin() + pos, fwd.begin() + pos + 100);
    for (int e = 0; e < 2; ++e) read[rng() % 100] = rng() & 3;
    auto regs = mem_align1(opt, idx, 100, read.data(), t);
    mem_mark_primary_se(opt, &regs, t);
    std::string sam_text = mem_reg2sam_se(opt, idx, "r", 100, read.data(),
                                          nullptr, &regs, 0, rn, "");
    if (!regs.empty() && regs[0].rb == pos && regs[0].qb == 0) ++aligned;
    assert(sam_text.find('\t') != std::string::npos);
  }
  std::printf("selftest: %d/50 exact-position alignments, OK\n", aligned);
  assert(aligned >= 40);
  return 0;
}
#endif
