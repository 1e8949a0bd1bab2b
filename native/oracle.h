// tpubwa native oracle — scalar BWA-MEM-semantics reference implementation.
//
// Role (SURVEY.md §2.4 / §4): the environment has no bwa binary and the
// reference mount is empty, so this library IS the operative spec for SAM
// semantics. Every JAX/Pallas stage is golden-tested against it. It also
// serves as the host-side finishing path (CIGAR/NM/MD/SAM emission) of the
// production pipeline, mirroring how the reference kept its hot kernel
// native behind a JNI boundary [ref: worker1/BWAMemWorker1Batched.scala].
//
// Algorithm semantics follow bwa-mem 0.7.x (written from algorithmic
// knowledge, not copied): [bwa: ksw.c], [bwa: bwt.c], [bwa: bwamem.c],
// [bwa: bwamem_pair.c]. Deliberate deviations are documented in
// docs/PARITY.md (stable sorts for tie determinism; no ALT-contig handling).
#pragma once
#include <cstdint>
#include <vector>

namespace tb {

struct ExtendResult {
  int score;    // best local-extension score
  int qle, tle; // query/target lengths of the best local extension
  int gtle;     // target length of the best to-query-end extension
  int gscore;   // best to-query-end score (-1 if none)
  int max_off;  // max band offset seen when the max was updated
};

// Banded affine-gap extension from a seed [bwa: ksw.c :: ksw_extend2].
ExtendResult ksw_extend2(int qlen, const uint8_t *query, int tlen,
                         const uint8_t *target, int m, const int8_t *mat,
                         int o_del, int e_del, int o_ins, int e_ins, int w,
                         int end_bonus, int zdrop, int h0);

// Banded global alignment with traceback [bwa: ksw.c :: ksw_global2].
// Returns score; cigar filled with (len<<4|op), op: 0=M 1=I 2=D.
int ksw_global2(int qlen, const uint8_t *query, int tlen, const uint8_t *target,
                int m, const int8_t *mat, int o_del, int e_del, int o_ins,
                int e_ins, int w, std::vector<uint32_t> *cigar);

struct AlignResult {     // [bwa: ksw.h :: kswr_t]
  int score;             // best score
  int te, qe;            // end positions (inclusive) on target/query
  int tb, qb;            // start positions (from reverse pass); -1 if not computed
  int score2, te2;       // second-best score & target end outside the window
};

// Local SW with sub-optimal tracking and start-position extraction,
// used by mate rescue [bwa: ksw.c :: ksw_align2 with KSW_XSTART|KSW_XSUBO].
AlignResult ksw_align(int qlen, const uint8_t *query, int tlen,
                      const uint8_t *target, int m, const int8_t *mat,
                      int o_del, int e_del, int o_ins, int e_ins, int xtra_minsc);

}  // namespace tb
