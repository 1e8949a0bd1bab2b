"""Real 2-process multi-host execution (BASELINE config 4 machinery).

Spawns two OS processes connected through jax.distributed (CPU backend,
Gloo collectives), drives the CLI's --multihost path end to end — per-host
input shards, deterministic --id0 read numbering, per-host SAM shards,
cross-host pestat histogram all-reduce — and byte-compares the merged
output against a single-process run over the same reads
[ref: SURVEY.md §4.3 "multi-host without a cluster"].
"""
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from tpubwa.index.builder import build_index
from tpubwa.io import fastx
from tpubwa.utils import dna

REPO = Path(__file__).resolve().parents[1]
PORT = 39331


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    d = tmp_path_factory.mktemp("mh")
    rng = np.random.default_rng(77)
    g = rng.integers(0, 4, 40000).astype(np.uint8)
    idx = build_index([("chrM", dna.decode(g))])
    idx.save(d / "ref.npz")
    return d, g


def write_fq(path, recs):
    with open(path, "w") as f:
        for r in recs:
            f.write(f"@{r.name}\n{r.seq}\n+\n{'I' * len(r.seq)}\n")


def mh_env(pid, nproc=2):
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORM_NAME": "cpu",
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "JAX_COORDINATOR_ADDRESS": f"localhost:{PORT + pid // 2}",
        "JAX_NUM_PROCESSES": str(nproc),
        "JAX_PROCESS_ID": str(pid % 2),
    })
    return env


def run_cli(args, env=None):
    return subprocess.run(
        [sys.executable, "-m", "tpubwa.cli", *args], cwd=str(REPO),
        env=env, capture_output=True, text=True, timeout=900)


def body(path):
    return "".join(l for l in Path(path).read_text().splitlines(True)
                   if not l.startswith("@"))


def launch_pair(args0, args1):
    p0 = subprocess.Popen([sys.executable, "-m", "tpubwa.cli", *args0],
                          cwd=str(REPO), env=mh_env(0),
                          stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    p1 = subprocess.Popen([sys.executable, "-m", "tpubwa.cli", *args1],
                          cwd=str(REPO), env=mh_env(1),
                          stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    o0, e0 = p0.communicate(timeout=900)
    o1, e1 = p1.communicate(timeout=900)
    assert p0.returncode == 0, e0.decode()[-2000:]
    assert p1.returncode == 0, e1.decode()[-2000:]


def test_multihost_se_matches_single(world):
    d, g = world
    recs = fastx.simulate_reads(g, 64, read_len=100, error_rate=0.01,
                                seed=21)
    write_fq(d / "a.fq", recs[:32])
    write_fq(d / "b.fq", recs[32:])

    env1 = mh_env(0)
    for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
              "JAX_PROCESS_ID"):
        env1.pop(k)
    # --se: two positional FASTQs now default to bwa-style mate-pair mode
    r = run_cli(["align", "--oracle", "--platform", "cpu", "--se",
                 str(d / "ref.npz"), str(d / "a.fq"), str(d / "b.fq"),
                 "-o", str(d / "single.sam")], env=env1)
    assert r.returncode == 0, r.stderr[-2000:]

    base = ["align", "--oracle", "--platform", "cpu", "--multihost",
            str(d / "ref.npz"), str(d / "a.fq"), str(d / "b.fq"),
            "-o", str(d / "mh.sam")]
    launch_pair(base + ["--id0", "0"], base + ["--id0", "32"])
    merged = body(d / "mh.host0000.sam") + body(d / "mh.host0001.sam")
    assert merged == body(d / "single.sam")
    assert merged.count("\n") >= 64


def test_multihost_pe_pestat_allreduce(world):
    """PE through the device path on both hosts: the insert-size histogram
    is all-reduced across processes, so each host's pairing decisions use
    the GLOBAL statistics and the merged output is byte-identical to one
    single-process run over all pairs."""
    d, g = world
    recs = fastx.simulate_reads(g, 32, read_len=100, paired=True,
                                error_rate=0.01, seed=22,
                                insert_mean=320, insert_std=25)
    write_fq(d / "p0.fq", recs[:32])     # 16 pairs, interleaved
    write_fq(d / "p1.fq", recs[32:])

    env1 = mh_env(0)
    for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
              "JAX_PROCESS_ID"):
        env1.pop(k)
    r = run_cli(["align", "-p", "--platform", "cpu", "--batch-size", "64",
                 str(d / "ref.npz"), str(d / "p0.fq"), str(d / "p1.fq"),
                 "-o", str(d / "pe_single.sam")], env=env1)
    assert r.returncode == 0, r.stderr[-2000:]

    base = ["align", "-p", "--platform", "cpu", "--multihost",
            "--batch-size", "64",
            str(d / "ref.npz"), str(d / "p0.fq"), str(d / "p1.fq"),
            "-o", str(d / "pe_mh.sam")]
    launch_pair(base + ["--id0", "0"], base + ["--id0", "32"])
    merged = body(d / "pe_mh.host0000.sam") + body(d / "pe_mh.host0001.sam")
    assert merged == body(d / "pe_single.sam")
    assert "\t99\t" in merged  # proper pairs made it through


def test_multihost_pe_uneven_batches(world):
    """Hosts with UNEQUAL PE batch counts (host 0: 3 batches, host 1: 1)
    must not deadlock the pestat all-reduce: pe_plan agrees on the global
    round count up front and pe_drain contributes zero histograms for the
    short host's missing rounds (round-3 verdict weak #5 / advisor
    finding). The run must complete and be deterministic."""
    d, g = world
    recs = fastx.simulate_reads(g, 64, read_len=100, paired=True,
                                error_rate=0.01, seed=23,
                                insert_mean=320, insert_std=25)
    # 3 files -> round-robin gives host 0 files {0,2} (32 pairs -> 3
    # batches at 24 reads/batch) and host 1 file {1} (16 pairs -> 2
    # batches): unequal counts, the old lockstep would block 600s and die
    write_fq(d / "u0.fq", recs[:64])      # 32 pairs
    write_fq(d / "u1.fq", recs[64:96])    # 16 pairs
    write_fq(d / "u2.fq", recs[96:])      # 16 pairs

    base = ["align", "-p", "--platform", "cpu", "--multihost",
            "--batch-size", "24",
            str(d / "ref.npz"), str(d / "u0.fq"), str(d / "u1.fq"),
            str(d / "u2.fq")]
    for tag in ("x", "y"):   # run twice: outputs must be byte-identical
        launch_pair(base + ["--id0", "0",
                            "-o", str(d / f"pe_un{tag}.sam")],
                    base + ["--id0", "96",
                            "-o", str(d / f"pe_un{tag}.sam")])
    m0 = body(d / "pe_unx.host0000.sam") + body(d / "pe_unx.host0001.sam")
    m1 = body(d / "pe_uny.host0000.sam") + body(d / "pe_uny.host0001.sam")
    assert m0 == m1
    assert m0.count("\n") >= 128
    assert "\t99\t" in m0
