"""Aux subsystems: multihost sharding helpers, phase timer."""
from pathlib import Path

from tpubwa.dist.multihost import host_shard_of, initialize, shard_output_path
from tpubwa.utils.profiling import PhaseTimer


def test_initialize_single_host(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert initialize() == (0, 1)


def test_host_shard_partition():
    paths = [f"r{i}.fq" for i in range(10)]
    got = [host_shard_of(paths, p, 4) for p in range(4)]
    flat = sorted(str(x) for shard in got for x in shard)
    assert flat == sorted(paths)
    assert all(len(s) >= 2 for s in got)
    # deterministic regardless of input order
    assert host_shard_of(paths[::-1], 1, 4) == got[1]


def test_shard_output_path():
    p = shard_output_path("out/run.sam", 3)
    assert p.name == "run.host0003.sam"


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    rep = t.report()
    assert "a" in rep and "b" in rep and t.counts["a"] == 2
