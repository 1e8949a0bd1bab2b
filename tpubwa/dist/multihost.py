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


def _kv_client():
    """The jax.distributed coordinator KV client.

    This reaches into the private ``jax._src`` namespace (there is no public
    KV-store API yet); isolate and version-guard the access here so a JAX
    upgrade breaks exactly one function with a clear message.
    """
    try:
        from jax._src import distributed
        client = distributed.global_state.client
    except (ImportError, AttributeError) as e:  # moved/renamed in a new JAX
        raise RuntimeError(
            "tpubwa multihost needs the jax.distributed coordinator "
            "key-value store (jax._src.distributed.global_state.client); "
            "this JAX version does not expose it — update "
            "tpubwa/dist/multihost.py::_kv_client") from e
    if client is None:
        raise RuntimeError("jax.distributed is not initialized "
                           "(call multihost.initialize() first)")
    return client


def barrier(name: str, timeout_ms: int = 1_800_000) -> None:
    """KV-store barrier across processes (no-op single-process). Used at
    the end of a --multihost run so hosts with very different batch/compile
    times reach jax.distributed's shutdown barrier together."""
    import jax

    if jax.process_count() == 1:
        return
    client = _kv_client()
    pid, n = jax.process_index(), jax.process_count()
    client.key_value_set(f"tpubwa/barrier/{name}/{pid}", "1")
    for p in range(n):
        client.blocking_key_value_get(f"tpubwa/barrier/{name}/{p}",
                                      timeout_ms)


# Global PE-reduction state: seq = next reduce round, own/total = this
# host's / the agreed global batch count (None until pe_plan), shape = the
# histogram shape for zero-contribution rounds.
_pe = {"seq": 0, "own": None, "total": None, "shape": None}


def pe_plan(n_batches: int, max_ins: int, timeout_ms: int = 600_000) -> int:
    """Agree on the global PE reduce-round count BEFORE aligning.

    Every host announces how many PE batches it will process; the global
    round count is the max. Hosts with fewer batches participate in the
    remaining rounds with zero histograms (pe_drain), so uneven per-host
    inputs — round-robin file sharding with an odd file count, or
    --shard-dir resume skipping different numbers of batches per host —
    can no longer deadlock or silently mis-pair the reduction
    (round-3 advisor finding, multihost.py:104).

    Returns the global round count. Single-process: records the plan and
    returns n_batches.
    """
    import jax

    _pe.update(seq=0, own=int(n_batches), shape=(4, max_ins + 1))
    if jax.process_count() == 1:
        _pe["total"] = int(n_batches)
        return int(n_batches)
    client = _kv_client()
    pid, n = jax.process_index(), jax.process_count()
    client.key_value_set(f"tpubwa/pe_plan/{pid}", str(int(n_batches)))
    counts = [int(client.blocking_key_value_get(f"tpubwa/pe_plan/{p}",
                                                timeout_ms))
              for p in range(n)]
    _pe["total"] = max(counts)
    return _pe["total"]


def pe_drain() -> None:
    """Participate with zero histograms in the reduce rounds of hosts that
    have more PE batches than this one; call after the host's last batch.
    No-op without a pe_plan or when this host had the most batches."""
    import numpy as np

    if _pe["total"] is None:
        return
    while _pe["seq"] < _pe["total"]:
        hist_allreduce(np.zeros(_pe["shape"], np.int64))
    _pe.update(own=None, total=None)


def hist_skip() -> None:
    """Zero-contribution reduce for a batch this host skips (e.g. a
    --shard-dir manifest hit on resume): keeps every host's reduce
    sequence aligned to the global batch ordinal."""
    import numpy as np

    if _pe["shape"] is None:
        raise RuntimeError("hist_skip() requires a pe_plan()")
    hist_allreduce(np.zeros(_pe["shape"], np.int64))


def hist_allreduce(hist, timeout_ms: int = 600_000):
    """Sum per-host pestat histograms across processes — the DCN leg of the
    reference's driver collect+broadcast [ref: FastMap.memPairEndMapping
    pestat collect; SURVEY.md §5.8 "pestat collect+broadcast"].

    No-op in a single-process run. In a multi-process run every host must
    call this once per global batch ordinal, in order; uneven per-host
    batch counts are handled by pe_plan + pe_drain/hist_skip (zero
    contributions), and over-running an agreed plan raises instead of
    blocking on a key that will never arrive.

    Rides the jax.distributed coordinator's key-value store rather than a
    device collective: the histogram is ~320 KB once per batch, hosts can
    be minutes apart (first-batch compile skew), and the coordinator is the
    exact analog of the reference's Spark driver for this reduction.
    """
    import jax

    if jax.process_count() == 1:
        _pe["seq"] += 1
        return hist
    import base64

    import numpy as np

    seq = _pe["seq"]
    if _pe["total"] is not None and seq >= _pe["total"]:
        raise RuntimeError(
            f"hist_allreduce round {seq} exceeds the agreed pe_plan of "
            f"{_pe['total']} rounds — per-host batch counts diverged from "
            "the plan")
    _pe["seq"] = seq + 1
    client = _kv_client()
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
    # Completing round `seq` proves every host finished round seq-1 (each
    # published its seq key only after reading all seq-1 keys), so our own
    # seq-1 key can no longer be awaited by anyone: delete it to bound
    # coordinator memory over long runs (round-3 advisor finding).
    if seq > 0:
        try:
            client.key_value_delete(f"tpubwa/pestat/{seq - 1}/{pid}")
        except Exception:
            pass  # cleanup is best-effort; never fail the reduction
    return total
