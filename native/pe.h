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

// same statistics from a precomputed insert histogram per orientation —
// the device path's psum'd histograms feed this (ARCHITECTURE.md)
void mem_pestat_from_hist(const MemOpt &opt, const int64_t *hist4,
                          int max_ins, PeStat pes[4]);

// SW rescue of an unfound mate [bwa: mem_matesw]; returns #regions added
int mem_matesw(const MemOpt &opt, const FMIdx &idx, const PeStat pes[4],
               const AlnReg &a, int l_ms, const uint8_t *ms,
               std::vector<AlnReg> *ma);

// best pairing across both ends [bwa: mem_pair]; returns pair score or 0
int mem_pair(const MemOpt &opt, const FMIdx &idx, const PeStat pes[4],
             const std::vector<AlnReg> a[2], int64_t id, int *sub, int *n_sub,
             int z[2]);

// full per-pair finishing -> two SAM record groups [bwa: mem_sam_pe]
void mem_sam_pe(const MemOpt &opt, const FMIdx &idx, const PeStat pes[4],
                int64_t id, const std::string name[2], const int l_seq[2],
                const uint8_t *seq[2], const char *qual[2],
                std::vector<AlnReg> a[2], const std::vector<std::string> &rn,
                const std::string &rg, std::string out[2]);

}  // namespace tb
