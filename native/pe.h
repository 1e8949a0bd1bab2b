// Paired-end pipeline types [bwa: bwamem_pair.c].
#pragma once
#include "mem.h"

namespace tb {

struct PeStat {  // [bwa: bwamem.h :: mem_pestat_t]
  int low = 0, high = 0, failed = 1;
  double avg = 0., std = 0.;
};

// orientation of b2 relative to b1: 0=FF 1=FR 2=RF 3=RR
int mem_infer_dir(int64_t l_pac, int64_t b1, int64_t b2, int64_t *dist);

// insert-size statistics over a batch of pairs [bwa: mem_pestat]
void mem_pestat(const MemOpt &opt, int64_t l_pac,
                const std::vector<std::vector<AlnReg>> &regs, PeStat pes[4]);

// the sampling half of mem_pestat, one row per pair: dir_out[p] in 0..3
// (or -1 when the pair is not unique enough / out of range) and the insert
// size. The device path histograms these and psums across the mesh.
void mem_pestat_samples(const MemOpt &opt, int64_t l_pac,
                        const std::vector<std::vector<AlnReg>> &regs,
                        int32_t *dir_out, int64_t *isize_out);

// same statistics from a precomputed insert histogram per orientation —
// the device path's psum'd histograms feed this (ARCHITECTURE.md)
void mem_pestat_from_hist(const MemOpt &opt, const int64_t *hist4,
                          int max_ins, PeStat pes[4]);

// Precomputed mate-rescue SW results (one batched device local-alignment
// call per read batch) injected into the scalar pairing replay. tasks rows
// are 8 int64 (pair, end, reg_j, dir, is_rev, rb, re, rid); res rows are
// 7 int32 (score, tb, te, qb, qe, score2, te2) in ksw_align order.
struct RescueInject {
  const int64_t *tasks = nullptr;
  const int32_t *res = nullptr;
  int n = 0;
};

// SW rescue of an unfound mate [bwa: mem_matesw]; returns #regions added.
// inj != null replays the decision logic with device-computed SW results
// (falling back to the scalar kernel for any missing task).
int mem_matesw(const MemOpt &opt, const FMIdx &idx, const PeStat pes[4],
               const AlnReg &a, int l_ms, const uint8_t *ms,
               std::vector<AlnReg> *ma, const RescueInject *inj = nullptr,
               int64_t pid = 0, int end_i = 0, int reg_j = 0);

// Extract every rescue window pair `pid` COULD run — a superset of the
// windows the sequential scalar loop runs, because the per-call skip logic
// only prunes (rescue inserts can only ADD satisfied orientations) and the
// window coordinates depend only on the pre-rescue region lists + pes.
// Appends 8-int64 rows (layout above) to *out.
void mem_rescue_tasks(const MemOpt &opt, const FMIdx &idx,
                      const PeStat pes[4], const std::vector<AlnReg> a[2],
                      const int l_seq[2], int64_t pid,
                      std::vector<int64_t> *out);

// best pairing across both ends [bwa: mem_pair]; returns pair score or 0
int mem_pair(const MemOpt &opt, const FMIdx &idx, const PeStat pes[4],
             const std::vector<AlnReg> a[2], int64_t id, int *sub, int *n_sub,
             int z[2]);

// full per-pair finishing -> two SAM record groups [bwa: mem_sam_pe]
void mem_sam_pe(const MemOpt &opt, const FMIdx &idx, const PeStat pes[4],
                int64_t id, const std::string name[2], const int l_seq[2],
                const uint8_t *seq[2], const char *qual[2],
                std::vector<AlnReg> a[2], const std::vector<std::string> &rn,
                const std::string &rg, std::string out[2],
                const RescueInject *inj = nullptr, int64_t pid = 0);

}  // namespace tb
