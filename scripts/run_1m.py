"""Config-4 dress rehearsal: 1M-pair PE run vs the 3.1 Gbp genome through
the production CLI, with a mid-run kill + manifest resume (VERDICT r4
item 5).

Steps:
  1. generate two-file FASTQ (1M pairs, 150 bp, 400+-50 inserts) from the
     cached scale genome (skipped if present);
  2. `tpubwa align idx r1.fq r2.fq --shard-dir ...` with a WALL-CLOCK KILL
     partway (SIGKILL, no cleanup) — simulates a preempted host;
  3. re-run the same command; the manifest skips completed batches;
  4. merge shards, count records, write RUN_1M.json.

Usage: python scripts/run_1m.py [pairs] [kill_after_s] [genome_mbp]
"""
import json
import os
import re
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import numpy as np


def gen_fastq(g, pairs, r1_path, r2_path):
    from tpubwa.io import fastx
    if r1_path.exists() and r2_path.exists():
        return 0.0
    t0 = time.time()
    CH = 50_000
    g = np.asarray(g)
    with open(r1_path, "w") as f1, open(r2_path, "w") as f2:
        done = 0
        while done < pairs:
            n = min(CH, pairs - done)
            recs = fastx.simulate_reads(
                g, 2 * n, read_len=150, paired=True, error_rate=0.01,
                indel_rate=0.001, seed=1000 + done, insert_mean=400,
                insert_std=50)
            for i, r in enumerate(recs):
                # unique names across chunks
                name = f"p{done + i // 2}_{r.name}"
                q = r.qual or "I" * len(r.seq)
                (f1 if i % 2 == 0 else f2).write(
                    f"@{name}\n{r.seq}\n+\n{q}\n")
            done += n
            print(f"  fastq {done}/{pairs} pairs", flush=True)
    return round(time.time() - t0, 1)


def main():
    import scale_common as SC

    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    kill_after = float(sys.argv[2]) if len(sys.argv) > 2 else 600.0
    mbp = int(sys.argv[3]) if len(sys.argv) > 3 else 3100
    glen = mbp * 1_000_000
    idx_path, _, lut_path = SC.cache_paths(glen)
    assert idx_path.exists(), "run scripts/scale_prepare.py first"
    g = SC.get_genome(mbp)

    work = REPO / "build" / f"run1m_{mbp}"
    work.mkdir(parents=True, exist_ok=True)
    r1, r2 = work / "r_1.fq", work / "r_2.fq"
    out = {"pairs": pairs, "genome_mbp": mbp}
    out["fastq_gen_s"] = gen_fastq(g, pairs, r1, r2)

    sd = work / "shards"
    # 4096 reads = 2048 pairs/batch — the PE device shapes the bench
    # already compiled (a fresh batch width would cold-compile for ~10 min)
    cmd = [sys.executable, "-m", "tpubwa", "align", str(idx_path),
           str(r1), str(r2), "--batch-size", "4096",
           "--shard-dir", str(sd)]
    env = dict(os.environ, PYTHONPATH=os.pathsep.join(
        [str(REPO)] + os.environ.get("PYTHONPATH", "").split(os.pathsep)),
        TPUBWA_LUT_CACHE=str(lut_path))

    # ---- phase 1: run with a hard kill partway ----
    t0 = time.time()
    p = subprocess.Popen(cmd, env=env, stdout=subprocess.DEVNULL,
                         stderr=subprocess.PIPE, text=True)
    killed = False
    batches_before = 0
    lines1 = []
    while True:
        line = p.stderr.readline()
        if not line:
            break
        lines1.append(line)
        if "batch" in line:
            batches_before += 1
        sys.stderr.write(line)
        if time.time() - t0 > kill_after and not killed and \
                batches_before >= 2:
            p.send_signal(signal.SIGKILL)
            killed = True
            break
    p.wait()
    out["phase1_s"] = round(time.time() - t0, 1)
    out["phase1_killed"] = killed
    out["phase1_batches"] = batches_before

    # ---- phase 2: resume ----
    t0 = time.time()
    r = subprocess.run(cmd, env=env, capture_output=True, text=True)
    out["phase2_s"] = round(time.time() - t0, 1)
    out["phase2_rc"] = r.returncode
    m = re.findall(r"batch (\d+):", r.stderr)
    out["phase2_first_batch"] = int(m[0]) if m else None
    out["resume_skipped_done"] = (out["phase2_first_batch"] or 0) > 0 \
        if killed else None
    mt = re.search(r"total (\d+) records in ([0-9.]+)s", r.stderr)
    if mt:
        out["phase2_records"] = int(mt.group(1))
        out["phase2_reads_per_s"] = round(
            int(mt.group(1)) / float(mt.group(2)), 1)

    # ---- merge + count ----
    shards = sorted(sd.glob("shard_*.sam"))
    out["n_shards"] = len(shards)
    n_rec = sum(1 for s in shards for line in open(s)
                if not line.startswith("@"))
    out["total_records"] = n_rec
    out["records_ok"] = n_rec >= 2 * pairs
    out["total_wall_s"] = round(out["phase1_s"] + out["phase2_s"], 1)
    out["reads_per_s_overall"] = round(2 * pairs / out["total_wall_s"], 1)
    (REPO / "RUN_1M.json").write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
