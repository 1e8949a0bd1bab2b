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


def barrier(name: str, timeout_ms: int = 1_800_000) -> None:
    """KV-store barrier across processes (no-op single-process). Used at
    the end of a --multihost run so hosts with very different batch/compile
    times reach jax.distributed's shutdown barrier together."""
    import jax

    if jax.process_count() == 1:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    pid, n = jax.process_index(), jax.process_count()
    client.key_value_set(f"tpubwa/barrier/{name}/{pid}", "1")
    for p in range(n):
        client.blocking_key_value_get(f"tpubwa/barrier/{name}/{p}",
                                      timeout_ms)


_hist_seq = 0


def hist_allreduce(hist, timeout_ms: int = 600_000):
    """Sum per-host pestat histograms across processes — the DCN leg of the
    reference's driver collect+broadcast [ref: FastMap.memPairEndMapping
    pestat collect; SURVEY.md §5.8 "pestat collect+broadcast"].

    No-op in a single-process run. In a multi-process run every host must
    call this once per batch (lockstep), which the CLI's --multihost input
    sharding guarantees by splitting work per batch index.

    Rides the jax.distributed coordinator's key-value store rather than a
    device collective: the histogram is ~320 KB once per batch, hosts can
    be minutes apart (first-batch compile skew), and the coordinator is the
    exact analog of the reference's Spark driver for this reduction.
    """
    import jax

    if jax.process_count() == 1:
        return hist
    import base64

    import numpy as np

    from jax._src import distributed

    global _hist_seq
    seq = _hist_seq
    _hist_seq += 1
    client = distributed.global_state.client
    pid, n = jax.process_index(), jax.process_count()
    h = np.ascontiguousarray(hist, dtype=np.int64)
    client.key_value_set(f"tpubwa/pestat/{seq}/{pid}",
                         base64.b64encode(h.tobytes()).decode())
    total = np.zeros_like(h)
    for p in range(n):
        raw = client.blocking_key_value_get(f"tpubwa/pestat/{seq}/{p}",
                                            timeout_ms)
        total += np.frombuffer(base64.b64decode(raw),
                               np.int64).reshape(h.shape)
    return total
