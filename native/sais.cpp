// SA-IS suffix array construction — the native index-builder core.
// Replaces the external `bwa index` dependency (SURVEY.md §2.4: the
// reference consumes stock bwa-index output; we build our own). Linear-time
// SA-IS (induced sorting) written from the published algorithm (Nong, Zhang
// & Chan 2009); handles genome-scale inputs where the numpy prefix-doubling
// fallback (tpubwa/index/builder.py) becomes too slow.
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// Generic SA-IS over an integer string s[0..n-1] with alphabet [0, K).
// s must end with a unique smallest sentinel s[n-1] = 0.
template <typename S>
void sais_core(const S *s, int64_t *sa, int64_t n, int64_t K) {
  std::vector<bool> is_s(n);  // S-type?
  is_s[n - 1] = true;
  for (int64_t i = n - 2; i >= 0; --i)
    is_s[i] = s[i] < s[i + 1] || (s[i] == s[i + 1] && is_s[i + 1]);
  auto is_lms = [&](int64_t i) { return i > 0 && is_s[i] && !is_s[i - 1]; };

  std::vector<int64_t> bkt(K + 1);
  auto bucket_ends = [&](bool tail) {
    std::fill(bkt.begin(), bkt.end(), 0);
    for (int64_t i = 0; i < n; ++i) ++bkt[s[i] + 1];
    for (int64_t i = 1; i <= K; ++i) bkt[i] += bkt[i - 1];
    // bkt[c] = start of bucket c; for tail we want one-past-end
    if (tail) {
      std::vector<int64_t> t(K);
      for (int64_t c = 0; c < K; ++c) t[c] = bkt[c + 1];
      for (int64_t c = 0; c < K; ++c) bkt[c] = t[c];
    }
  };

  auto induce = [&](const std::vector<int64_t> &lms) {
    std::fill(sa, sa + n, -1);
    bucket_ends(true);
    for (int64_t i = (int64_t)lms.size() - 1; i >= 0; --i)
      sa[--bkt[s[lms[i]]]] = lms[i];
    bucket_ends(false);
    for (int64_t i = 0; i < n; ++i) {
      int64_t j = sa[i] - 1;
      if (sa[i] > 0 && !is_s[j]) sa[bkt[s[j]]++] = j;
    }
    bucket_ends(true);
    for (int64_t i = n - 1; i >= 0; --i) {
      int64_t j = sa[i] - 1;
      if (sa[i] > 0 && is_s[j]) sa[--bkt[s[j]]] = j;
    }
  };

  std::vector<int64_t> lms;
  for (int64_t i = 1; i < n; ++i)
    if (is_lms(i)) lms.push_back(i);
  induce(lms);

  // name LMS substrings in SA order
  std::vector<int64_t> name(n, -1);
  int64_t n_names = 0, prev = -1;
  for (int64_t i = 0; i < n; ++i) {
    int64_t p = sa[i];
    if (p <= 0 || !is_lms(p)) continue;
    bool same = false;
    if (prev >= 0) {
      same = true;
      for (int64_t d = 0;; ++d) {
        bool le1 = is_lms(p + d) && d > 0, le2 = is_lms(prev + d) && d > 0;
        if (s[p + d] != s[prev + d] || is_s[p + d] != is_s[prev + d]) {
          same = false;
          break;
        }
        if (le1 || le2) {
          same = le1 && le2;
          break;
        }
      }
    }
    if (!same) ++n_names;
    name[p] = n_names - 1;
    prev = p;
  }
  std::vector<int64_t> s1(lms.size());
  for (size_t i = 0; i < lms.size(); ++i) s1[i] = name[lms[i]];

  std::vector<int64_t> sa1(lms.size());
  if (n_names == (int64_t)lms.size()) {
    for (size_t i = 0; i < lms.size(); ++i) sa1[s1[i]] = (int64_t)i;
  } else {
    sais_core<int64_t>(s1.data(), sa1.data(), (int64_t)s1.size(), n_names);
  }
  std::vector<int64_t> ordered(lms.size());
  for (size_t i = 0; i < lms.size(); ++i) ordered[i] = lms[sa1[i]];
  induce(ordered);
}

}  // namespace

extern "C" {

// Suffix array of T[0..n) (codes 0..3) with implicit terminal sentinel
// smaller than all symbols; writes ranks of the n non-empty suffixes —
// exactly the contract of tpubwa.index.builder.suffix_array_doubling.
int tb_sais(const uint8_t *T, int64_t n, int64_t *sa_out) {
  if (n <= 0) return 0;
  std::vector<uint8_t> s(n + 1);
  for (int64_t i = 0; i < n; ++i) s[i] = T[i] + 1;  // shift for sentinel 0
  s[n] = 0;
  std::vector<int64_t> sa(n + 1);
  sais_core<uint8_t>(s.data(), sa.data(), n + 1, 5);
  // sa[0] is the sentinel suffix; drop it
  std::memcpy(sa_out, sa.data() + 1, sizeof(int64_t) * n);
  return 0;
}

}  // extern "C"
