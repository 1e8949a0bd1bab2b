"""Device-mesh data parallelism — the shard_map replacement for Spark RDDs.

The reference's only compute parallelism is data parallelism over reads
(Spark partitions of FASTQ chunks, SURVEY.md §2.5); here a 1-D ``reads`` mesh
axis shards the batch, the FM-index is replicated into every chip's HBM (the
``sc.broadcast(bwaIdx)`` analog), and the one true cross-device reduction —
pair-end insert-size statistics [bwa: bwamem_pair.c :: mem_pestat] — rides a
``psum`` histogram over ICI instead of a driver collect+broadcast.

Multi-host: per-host FASTQ shards feed the host's local devices; output SAM
shards are written per host and concatenated deterministically by read id.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..chain.device import chain_filter, chain_seeds, seeds_from_smems
from ..extend.worker import extend_chains
from ..seed.anchor import collect_smems_anchor
from ..seed.lut import LutSeedConfig, collect_smems_lut

READS_AXIS = "reads"


def make_mesh(n_devices: int | None = None, axis: str = READS_AXIS,
              local: bool = False) -> Mesh:
    """local=True restricts to this process's addressable devices — required
    for per-host meshes in a jax.distributed run (a mesh containing another
    host's devices cannot materialize results here)."""
    devs = jax.local_devices() if local else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def worker1_step(didx, seqs, lens, lut=None, *, scfg, ccfg, ecfg):
    """The full per-shard device step (seed -> chain -> filter -> extend)."""
    if isinstance(scfg, LutSeedConfig):
        smems = collect_smems_lut(didx, lut, seqs, lens, scfg)
    else:
        smems = collect_smems_anchor(didx, seqs, lens, scfg)
    seeds = seeds_from_smems(didx, smems, ccfg)
    ch = chain_seeds(didx, seeds, ccfg)
    flt = chain_filter(ch, ccfg)
    st = extend_chains(didx, seqs, lens, seeds, ch, ecfg, flt)
    return dict(
        n=st["n"], overflow=st["overflow"], rb=st["rb"], re=st["re"],
        qb=st["qb"], qe=st["qe"], score=st["score"], truesc=st["truesc"],
        w=st["w"], seedcov=st["seedcov"], seedlen0=st["seedlen0"],
        rid=st["rid"], l_rep=seeds["l_rep"],
    )


def worker1_sharded(mesh: Mesh, didx, seqs, lens, scfg, ccfg, ecfg, lut=None):
    """Data-parallel worker1 over the mesh: reads sharded, index (and the
    k-mer jump table) replicated into every chip's HBM.

    Uses shard_map, not jit auto-partitioning: worker1 is embarrassingly
    parallel over reads, so each device runs a purely LOCAL program with
    zero collectives. Under GSPMD the partitioner placed an all-reduce
    (batch-wide dynamic trip counts) inside per-device while loops on the
    int64 index path — devices diverged on loop exit and deadlocked the
    collective rendezvous (reproduced on an 8-device CPU mesh). shard_map
    makes the no-communication contract explicit, and per-shard trip
    counts are also tighter (each device loops only for its own reads).

    seqs: (B, L) with B divisible by mesh size. Returns the reg dict with
    outputs sharded along the reads axis (device-resident).
    """
    spec_b = P(READS_AXIS)
    local = partial(worker1_step, scfg=scfg, ccfg=ccfg, ecfg=ecfg)
    fn = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), spec_b, spec_b, P()),
        out_specs=spec_b,
        check_vma=False,   # didx/lut are replicated inputs used freely
    ))
    return fn(didx, seqs, lens, lut)


def pe_hist_psum(mesh: Mesh, dirs, inserts, max_ins: int):
    """Orientation-bucketed insert-size histogram, psum'd over the mesh —
    the production pestat reduction [bwa: mem_pestat's driver collect ->
    broadcast, SURVEY.md §2.5 "cross-node reduction"].

    dirs: (P,) int32 in -1..3 (-1 = pair not sampled); inserts: (P,) int.
    Inputs may be host arrays of any length; they are padded to the mesh
    size here. Returns the replicated (4, max_ins+1) int64 histogram ready
    for native mem_pestat_from_hist.
    """
    dirs = np.asarray(dirs, np.int32)
    inserts = np.asarray(inserts, np.int64)
    n = mesh.devices.size
    pad = (-len(dirs)) % max(n, 1)
    if pad:
        dirs = np.concatenate([dirs, np.full(pad, -1, np.int32)])
        inserts = np.concatenate([inserts, np.zeros(pad, np.int64)])

    def hist_fn(d, ins):
        ok = d >= 0
        idx = (jnp.clip(d, 0, 3) * (max_ins + 1)
               + jnp.clip(ins, 0, max_ins).astype(jnp.int32))
        h = jnp.zeros((4 * (max_ins + 1),), jnp.int32).at[idx].add(
            ok.astype(jnp.int32))
        return jax.lax.psum(h, READS_AXIS)

    fn = jax.jit(jax.shard_map(hist_fn, mesh=mesh,
                               in_specs=(P(READS_AXIS), P(READS_AXIS)),
                               out_specs=P()))
    out = fn(jnp.asarray(dirs), jnp.asarray(inserts))
    return np.asarray(out, np.int64).reshape(4, max_ins + 1)


def insert_size_psum(mesh: Mesh, inserts, valid, max_ins: int):
    """Cross-chip insert-size histogram — the pestat all-reduce.

    inserts/valid: (B,) sharded along reads. Returns the replicated global
    histogram (max_ins+1,) int32, computed with a psum over the mesh
    (replacing the reference's driver collect+broadcast).
    """
    def hist_fn(ins, ok):
        clipped = jnp.clip(ins, 0, max_ins)
        h = jnp.zeros((max_ins + 1,), jnp.int32).at[clipped].add(
            ok.astype(jnp.int32))
        return jax.lax.psum(h, READS_AXIS)

    fn = jax.shard_map(hist_fn, mesh=mesh,
                       in_specs=(P(READS_AXIS), P(READS_AXIS)),
                       out_specs=P())
    return fn(inserts, valid)
