// Core BWA-MEM pipeline types (oracle + host finishing path).
#pragma once
#include <string>
#include <vector>

#include "fm.h"
#include "oracle.h"

namespace tb {

struct MemSeed {  // [bwa: bwamem.c :: mem_seed_t]
  int64_t rbeg;
  int qbeg, len, score;
};

struct MemChain {  // [bwa: bwamem.c :: mem_chain_t]
  int64_t pos;
  int rid = -1, w = 0, kept = 0, first = -1;
  double frac_rep = 0.;
  std::vector<MemSeed> seeds;
};

struct AlnReg {  // [bwa: bwamem.h :: mem_alnreg_t]
  int64_t rb = 0, re = 0;
  int qb = 0, qe = 0, rid = -1;
  int score = 0, truesc = 0, sub = 0, csub = 0, sub_n = 0;
  int w = 0, seedcov = 0, secondary = -1, secondary_all = -1;
  int seedlen0 = 0, n_comp = 1;
  uint64_t hash = 0;
  double frac_rep = 0.;
};

struct Aln {  // [bwa: bwamem.h :: mem_aln_t]
  int64_t pos = -1;
  int rid = -1, flag = 0, is_rev = 0, mapq = 0, NM = -1;
  int score = -1, sub = -1;
  std::vector<uint32_t> cigar;  // len<<4|op, op: 0=M 1=I 2=D 3=S 4=H
  std::string md, xa;
};

// Stage entry points (each independently golden-testable from Python)
std::vector<MemChain> mem_chain(const MemOpt &opt, const FMIdx &idx, int len,
                                const uint8_t *seq);
int mem_chain_flt(const MemOpt &opt, std::vector<MemChain> *chains);
void mem_chain2aln(const MemOpt &opt, const FMIdx &idx, int l_query,
                   const uint8_t *query, const MemChain &c,
                   std::vector<AlnReg> *av);
int mem_sort_dedup_patch(const MemOpt &opt, const FMIdx &idx,
                         const uint8_t *query, std::vector<AlnReg> *a);
void mem_mark_primary_se(const MemOpt &opt, std::vector<AlnReg> *a, int64_t id);
int mem_approx_mapq_se(const MemOpt &opt, const AlnReg &a);
Aln mem_reg2aln(const MemOpt &opt, const FMIdx &idx, int l_query,
                const uint8_t *query, const AlnReg *ar);

// Full per-read region pipeline [ref: worker1/BWAMemWorker1.scala :: bwaMemWorker1]
std::vector<AlnReg> mem_align1(const MemOpt &opt, const FMIdx &idx, int l_query,
                               const uint8_t *seq, int64_t id);

// regs -> SAM text (single-end) [bwa: bwamem.c :: mem_reg2sam, mem_aln2sam]
std::string mem_reg2sam_se(const MemOpt &opt, const FMIdx &idx,
                           const std::string &name, int l_query,
                           const uint8_t *seq, const char *qual,
                           std::vector<AlnReg> *a, int extra_flag,
                           const std::vector<std::string> &rnames,
                           const std::string &rg_id);
std::string mem_reg2sam_se_mate(const MemOpt &opt, const FMIdx &idx,
                                const std::string &name, int l_query,
                                const uint8_t *seq, const char *qual,
                                std::vector<AlnReg> *a, int extra_flag,
                                const std::vector<std::string> &rnames,
                                const std::string &rg_id, const Aln *mate);

uint64_t hash_64(uint64_t key);
int64_t cal_max_gap(const MemOpt &opt, int qlen);

// single SAM record emission [bwa: mem_aln2sam]. `list`/`n_list` are the
// read's full non-secondary record list: a non-0x100 record gets an SA:Z
// tag listing every OTHER non-0x100 record (chimeric/supplementary links).
void aln2sam_one(const MemOpt &opt, const std::vector<std::string> &rnames,
                 std::string *str, const std::string &name, int l_seq,
                 const uint8_t *seq, const char *qual, const Aln &p,
                 const Aln *mate, int which, const std::string &rg_id,
                 const Aln *list = nullptr, int n_list = 0);

// XA string for the region at index `pri` [bwa: mem_gen_alt]
std::string gen_alt_for(const MemOpt &opt, const FMIdx &idx,
                        const std::vector<AlnReg> &a, int l_query,
                        const uint8_t *seq,
                        const std::vector<std::string> &rnames, int pri);

}  // namespace tb
