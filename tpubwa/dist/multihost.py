"""Multi-host orchestration (BASELINE config 4 scaffolding).

The reference ran one Spark executor per node with HDFS-distributed input
(SURVEY.md §1 S1/S2). The TPU-native equivalent: `jax.distributed` for the
pod slice, per-host FASTQ shards (no network filesystem), per-host SAM shard
files, and a deterministic host-0 merge (`tpubwa merge`). The only runtime
cross-host traffic is the pestat psum (rides ICI/DCN inside jit) —
everything else is embarrassingly parallel.

This environment exposes a single chip, so the multi-host path is exercised
via the virtual-device mesh tests (tests/test_dist.py) and the driver's
dryrun_multichip; the functions here are the production entry points.
"""
from __future__ import annotations

import os
from pathlib import Path


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> tuple[int, int]:
    """Bring up jax.distributed (no-op on a single host).

    Returns (process_id, num_processes). Arguments default from the standard
    env vars (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID)
    or TPU metadata when available.
    """
    import jax

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None:
        return 0, 1  # single host
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes or int(os.environ["JAX_NUM_PROCESSES"]),
        process_id=process_id if process_id is not None
        else int(os.environ["JAX_PROCESS_ID"]),
    )
    return jax.process_index(), jax.process_count()


def host_shard_of(paths: list[str | Path], process_id: int,
                  num_processes: int) -> list[Path]:
    """Static per-host split of input FASTQ files (the HDFS-chunk analog).

    Files are assigned round-robin by sorted order so every host computes
    the same assignment without communication.
    """
    ordered = sorted(Path(p) for p in paths)
    return [p for i, p in enumerate(ordered) if i % num_processes == process_id]


def shard_output_path(base: str | Path, process_id: int) -> Path:
    """Per-host SAM shard path; merge with `tpubwa merge` on host 0."""
    base = Path(base)
    return base.with_name(f"{base.stem}.host{process_id:04d}{base.suffix}")
