// SA-IS suffix array construction — the native index-builder core.
// Replaces the external `bwa index` dependency (SURVEY.md §2.4: the
// reference consumes stock bwa-index output; we build our own). Linear-time
// SA-IS (induced sorting) written from the published algorithm (Nong, Zhang
// & Chan 2009), in the memory-lean formulation: the SA buffer doubles as
// storage for LMS names and the reduced problem, and substring names are
// stored at pos>>1 (adjacent positions cannot both be LMS), so peak memory
// is ~8n (SA) + n (shifted text copy) + n/8 (type bits) — a 6.2e9-char
// human-scale text fits a 125 GB host.
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int64_t EMPTY = -1;

// Generic SA-IS over an integer string s[0..n-1] with alphabet [0, K).
// s must end with a unique smallest sentinel s[n-1] = 0. sa has room for n.
template <typename S>
void sais_core(const S *s, int64_t *sa, int64_t n, int64_t K) {
  if (n == 1) {
    sa[0] = 0;
    return;
  }
  // ---- S/L types, bit-packed ----
  std::vector<uint64_t> tbits((n + 63) / 64, 0);
  auto set_s = [&](int64_t i) { tbits[i >> 6] |= 1ull << (i & 63); };
  auto is_s = [&](int64_t i) { return (tbits[i >> 6] >> (i & 63)) & 1; };
  set_s(n - 1);
  for (int64_t i = n - 2; i >= 0; --i)
    if (s[i] < s[i + 1] || (s[i] == s[i + 1] && is_s(i + 1))) set_s(i);
  auto is_lms = [&](int64_t i) { return i > 0 && is_s(i) && !is_s(i - 1); };

  std::vector<int64_t> bkt(K + 1);
  auto bucket = [&](bool tail) {
    std::fill(bkt.begin(), bkt.end(), 0);
    for (int64_t i = 0; i < n; ++i) ++bkt[s[i] + 1];
    for (int64_t i = 1; i <= K; ++i) bkt[i] += bkt[i - 1];
    if (tail) {  // bkt[c] = one-past-end of bucket c
      for (int64_t c = 0; c < K; ++c) bkt[c] = bkt[c + 1];
    }
  };

  auto induce_LS = [&]() {  // from seeded LMS entries in sa
    bucket(false);
    for (int64_t i = 0; i < n; ++i) {
      int64_t j = sa[i] - 1;
      if (sa[i] > 0 && !is_s(j)) sa[bkt[s[j]]++] = j;
    }
    bucket(true);
    for (int64_t i = n - 1; i >= 0; --i) {
      int64_t j = sa[i] - 1;
      if (sa[i] > 0 && is_s(j)) sa[--bkt[s[j]]] = j;
    }
  };

  // ---- stage 1: sort LMS substrings by induction ----
  std::fill(sa, sa + n, EMPTY);
  bucket(true);
  for (int64_t i = n - 1; i >= 1; --i)
    if (is_lms(i)) sa[--bkt[s[i]]] = i;
  induce_LS();

  // compact sorted LMS positions into sa[0..n1)
  int64_t n1 = 0;
  for (int64_t i = 0; i < n; ++i)
    if (sa[i] > 0 && is_lms(sa[i])) sa[n1++] = sa[i];

  // ---- name LMS substrings, names live at sa[n1 + (pos>>1)] ----
  std::fill(sa + n1, sa + n, EMPTY);
  int64_t n_names = 0, prev = -1;
  for (int64_t i = 0; i < n1; ++i) {
    int64_t p = sa[i];
    bool same = false;
    if (prev >= 0) {
      same = true;
      for (int64_t d = 0;; ++d) {
        bool le1 = d > 0 && is_lms(p + d), le2 = d > 0 && is_lms(prev + d);
        if (s[p + d] != s[prev + d] || is_s(p + d) != is_s(prev + d)) {
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
    sa[n1 + (p >> 1)] = n_names - 1;
    prev = p;
  }

  // gather names in text order -> reduced string s1 = sa[n - n1 .. n)
  int64_t *s1 = sa + n - n1;
  for (int64_t i = n1 + (n - 1 >> 1), j = n - 1; i >= n1; --i)
    if (sa[i] != EMPTY) sa[j--] = sa[i];

  // ---- recurse (or direct inverse) into sa[0..n1) ----
  if (n_names < n1) {
    sais_core<int64_t>(s1, sa, n1, n_names);
  } else {
    for (int64_t i = 0; i < n1; ++i) sa[s1[i]] = i;
  }

  // rewrite s1 slot with LMS positions in text order, then map sa1 -> text
  for (int64_t i = 1, j = 0; i < n; ++i)
    if (is_lms(i)) s1[j++] = i;
  for (int64_t i = 0; i < n1; ++i) sa[i] = s1[sa[i]];

  // ---- final induce from the fully sorted LMS order ----
  std::fill(sa + n1, sa + n, EMPTY);
  bucket(true);
  for (int64_t i = n1 - 1; i >= 0; --i) {
    int64_t j = sa[i];
    sa[i] = EMPTY;
    sa[--bkt[s[j]]] = j;
  }
  induce_LS();
}

}  // namespace

extern "C" {

// Suffix array of T[0..n) (codes 0..3) with implicit terminal sentinel
// smaller than all symbols; writes ranks of the n non-empty suffixes —
// exactly the contract of tpubwa.index.builder.suffix_array_doubling.
// sa_out must have room for n + 1 entries (entry n is scratch; the result
// occupies sa_out[0..n) after the in-place shift).
int tb_sais(const uint8_t *T, int64_t n, int64_t *sa_out) {
  if (n <= 0) return 0;
  std::vector<uint8_t> s(n + 1);
  for (int64_t i = 0; i < n; ++i) s[i] = T[i] + 1;  // shift for sentinel 0
  s[n] = 0;
  sais_core<uint8_t>(s.data(), sa_out, n + 1, 5);
  // sa_out[0] is the sentinel suffix; drop it in place
  std::memmove(sa_out, sa_out + 1, sizeof(int64_t) * n);
  return 0;
}

}  // extern "C"
