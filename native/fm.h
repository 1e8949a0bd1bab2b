// FM-index view over numpy-owned buffers + option struct shared with Python.
#pragma once
#include <cstdint>
#include <vector>

namespace tb {

constexpr int kOccInterval = 64;     // must match tpubwa/index/builder.py
constexpr int kBasesPerWord = 16;

// Bidirectional SA interval [bwa: bwt.h :: bwtintv_t]
struct BiIntv {
  int64_t k, l, s;
  uint64_t info;  // (query_start<<32)|query_end
};

// POD mirror of tpubwa.opts.MemOptions. Field order/types must match the
// ctypes.Structure in tpubwa/oracle/__init__.py exactly (ints first, then
// doubles, then the matrix, so native padding is predictable).
struct MemOpt {
  int32_t a, b, o_del, e_del, o_ins, e_ins;
  int32_t pen_unpaired, pen_clip5, pen_clip3, w, zdrop;
  int32_t min_seed_len, split_width, max_occ, max_chain_gap, max_chain_extend;
  int32_t min_chain_weight, T, flag, max_ins, max_matesw, max_xa_hits;
  double split_factor, mask_level, drop_ratio, mask_level_redun;
  double mapq_coef_len, xa_drop_ratio;
  int8_t mat[25];
};

struct FMIdx {
  int64_t l_pac = 0;
  int64_t primary = 0;
  int64_t sa_intv = 32;
  const int64_t *L2 = nullptr;        // [5]
  const uint32_t *bwt_words = nullptr;
  const uint32_t *occ_cp = nullptr;   // [n_cp][4] row-major
  const int64_t *sa_samples = nullptr;
  const uint8_t *pac = nullptr;
  const int64_t *ann_off = nullptr;   // [n_anns]
  const int64_t *ann_len = nullptr;
  int n_anns = 0;

  inline int bwt_base(int64_t j) const {
    return (bwt_words[j / kBasesPerWord] >> (2 * (j % kBasesPerWord))) & 3;
  }
  inline BiIntv set_intv(int base) const {  // [bwa: bwt.h :: bwt_set_intv]
    return BiIntv{L2[base] + 1, L2[3 - base] + 1, L2[base + 1] - L2[base], 0};
  }
  int64_t occ1(int64_t k, int c) const;
  void occ4(int64_t k, int64_t cnt[4]) const;
  void extend(const BiIntv &ik, BiIntv ok[4], bool is_back) const;
  int64_t inv_psi(int64_t k) const;
  int64_t sa(int64_t k) const;
  uint8_t text_base(int64_t pos) const;
  void get_seq(int64_t beg, int64_t end, uint8_t *out) const;
  int64_t depos(int64_t pos, int *is_rev) const;
  int pos2rid(int64_t fwd_pos) const;
  int intv2rid(int64_t rb, int64_t re) const;
  void fetch_seq(int64_t *beg, int64_t mid, int64_t *end, int *rid,
                 std::vector<uint8_t> *out) const;
};

int smem1(const FMIdx &idx, int len, const uint8_t *q, int x, int64_t min_intv,
          std::vector<BiIntv> *mem);
void collect_intv(const MemOpt &opt, const FMIdx &idx, int len,
                  const uint8_t *seq, std::vector<BiIntv> *out);

}  // namespace tb
