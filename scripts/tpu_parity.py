"""TPU-vs-oracle SAM parity spot check on the real chip.

CPU golden tests can't catch TPU-only numerics (e.g. MXU bf16 matmul
truncation); this drives the production device path on the TPU and
compares every SAM record against the scalar oracle. Run after any
change that touches the device pipeline."""
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np


def main(n_reads=2048, error_rate=0.02, indel_rate=0.002, seed=3):
    import bench as B
    from tpubwa.io import fastx
    from tpubwa.opts import MemOptions
    from tpubwa.pipeline import Aligner

    idx = B.get_index()
    aln = Aligner(idx, MemOptions(),
                  lut_cache=REPO / "build" / f"bench_lut_{B.GENOME_LEN}.npz")
    fwd = idx.get_seq(0, idx.l_pac).astype(np.uint8)
    recs = fastx.simulate_reads(fwd, n_reads, read_len=100,
                                error_rate=error_rate,
                                indel_rate=indel_rate, seed=seed)
    batch = fastx.batch_reads(recs, max_len=100)
    dev_sam = aln.align_se(batch, id0=0)
    orc_sam = aln.oracle.align_se(batch, aln.opt, id0=0, rg_id="")
    d_lines = dev_sam.rstrip("\n").split("\n")
    o_lines = orc_sam.rstrip("\n").split("\n")
    assert len(d_lines) == len(o_lines), (len(d_lines), len(o_lines))
    bad = [i for i, (a, b) in enumerate(zip(d_lines, o_lines)) if a != b]
    if bad:
        for i in bad[:5]:
            print("DEV:", d_lines[i])
            print("ORC:", o_lines[i])
        raise SystemExit(f"FAIL: {len(bad)}/{len(d_lines)} records differ")
    print(f"TPU parity: PASS ({len(d_lines)} SAM records identical)")


if __name__ == "__main__":
    main()
