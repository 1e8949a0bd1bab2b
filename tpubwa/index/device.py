"""Device-resident FM-index: jnp arrays + vectorized occ primitives.

The HBM analog of the reference's broadcast ``BWAIdxType`` (SURVEY.md §1 L3):
one replicated copy per chip. Coordinate width scales with the genome
(``pos_dtype``): int32 while 2*l_pac < 2**31, int64 beyond — GRCh38's
bidirectional text is ~6.2e9, so ranks/positions need 33 bits. Per-base
occurrence COUNTS stay int32 on every genome a chip can hold (count of one
base <= text/2 < 2**31 — guarded at build time), and every gather INDEX
(occ row = rank >> 6, pac row = pos >> 7) also fits int32, so the only
int64 arithmetic is cheap adds/compares on rank values.

Performance-critical layout decision (SURVEY.md §7 "FM-index gather
bandwidth"): occ checkpoints and the BWT words of their 64-base block are
FUSED into one 32-byte row (``occ_fused[cp, 0:4]`` = counts, ``[4:8]`` =
packed 2-bit bases), so every occ query and every invPsi step costs exactly
ONE row gather. Semantics identical to [bwa: bwt.c :: bwt_occ, bwt_invPsi].
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .builder import BASES_PER_WORD, OCC_INTERVAL, FMIndex


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceIndex:
    l_pac: int                 # static
    primary: int               # static
    sa_intv: int               # static
    L2: jnp.ndarray            # pos_dtype[5]
    occ_fused: jnp.ndarray     # uint32[n_cp, 8]: cp counts + block words
    sa_samples: jnp.ndarray    # pos_dtype[n_samp]
    pac: jnp.ndarray           # uint8[ceil(l_pac/4)]
    pac_rows: jnp.ndarray      # uint32[n_prow, 8]: pac as 32B rows (128
    #                            bases/row) — contiguous text windows are
    #                            fetched as a few ROW gathers (per-offset
    #                            gather cost) instead of per-base gathers
    ann_end: jnp.ndarray       # int32[n_anns]: offset+length per sequence

    def tree_flatten(self):
        return ((self.L2, self.occ_fused, self.sa_samples,
                 self.pac, self.pac_rows, self.ann_end),
                (self.l_pac, self.primary, self.sa_intv))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], aux[1], aux[2], *children)

    @property
    def pos_dtype(self):
        """Width of text positions / FM ranks for this genome."""
        return jnp.int64 if 2 * self.l_pac >= 2**31 else jnp.int32

    @staticmethod
    def from_host(idx: FMIndex) -> "DeviceIndex":
        if int(idx.occ_cp.max(initial=0)) >= 2**31:
            raise NotImplementedError(
                "per-base occurrence counts exceed int32; genomes this "
                "skewed need the sharded-index mode")
        pos_dtype = jnp.int64 if 2 * idx.l_pac >= 2**31 else jnp.int32
        n_cp = idx.occ_cp.shape[0]
        words = np.zeros(n_cp * 4, dtype=np.uint32)
        words[: len(idx.bwt_words)] = idx.bwt_words
        fused = np.concatenate(
            [idx.occ_cp.astype(np.uint32), words.reshape(n_cp, 4)], axis=1)
        n_prow = -(-int(idx.pac.shape[0]) // 32) + 1   # +1 pad row
        pac_pad = np.zeros(n_prow * 32, dtype=np.uint8)
        pac_pad[: idx.pac.shape[0]] = idx.pac
        pac_rows = pac_pad.view(np.uint32).reshape(n_prow, 8)
        return DeviceIndex(
            l_pac=int(idx.l_pac),
            primary=int(idx.primary),
            sa_intv=int(idx.sa_intv),
            L2=jnp.asarray(idx.L2, dtype=pos_dtype),
            occ_fused=jnp.asarray(fused),
            sa_samples=jnp.asarray(idx.sa_samples, dtype=pos_dtype),
            pac=jnp.asarray(idx.pac, dtype=jnp.uint8),
            pac_rows=jnp.asarray(pac_rows),
            ann_end=jnp.asarray(
                np.array([a.offset + a.length for a in idx.anns]),
                dtype=pos_dtype),
        )


def sel4(arr: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """arr[..., c] for c in {0..3} WITHOUT a gather: XLA lowers
    take_along_axis to a per-offset gather (~40-150ns/offset on TPU — as
    expensive as a whole occ row fetch), while this 4-way select is pure VPU.
    arr: (..., 4); c: (...) int32."""
    return (jnp.where(c == 0, arr[..., 0], 0)
            + jnp.where(c == 1, arr[..., 1], 0)
            + jnp.where(c == 2, arr[..., 2], 0)
            + jnp.where(c == 3, arr[..., 3], 0))


def sel_vec(vec: jnp.ndarray, c: jnp.ndarray, n: int) -> jnp.ndarray:
    """vec[c] for a tiny static-length vec (e.g. L2[5]) without a gather.
    Result keeps vec's dtype (L2 is pos_dtype)."""
    out = jnp.zeros(c.shape, vec.dtype)
    for i in range(n):
        out = jnp.where(c == i, vec[i], out)
    return out


def _popcount32(x: jnp.ndarray) -> jnp.ndarray:
    """SWAR popcount of uint32 lanes."""
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def _eq_bits(words: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Per-2-bit-slot equality mask: bit 2*j set iff slot j == c."""
    pat = (c.astype(jnp.uint32) * jnp.uint32(0x55555555))
    x = words ^ pat
    neq = (x | (x >> 1)) & jnp.uint32(0x55555555)
    return neq ^ jnp.uint32(0x55555555)


def _count_first(words: jnp.ndarray, c: jnp.ndarray,
                 m: jnp.ndarray) -> jnp.ndarray:
    """Count of base c in the first m (0..64) bases of a 4-word block.

    words: (..., 4) uint32; c: (...); m: (...).
    """
    eq = _eq_bits(words, c[..., None])
    valid = jnp.clip(m[..., None] - jnp.arange(4, dtype=m.dtype) * 16, 0, 16)
    mask = jnp.where(
        valid >= 16,
        jnp.uint32(0xFFFFFFFF),
        (jnp.uint32(1) << (2 * valid).astype(jnp.uint32)) - jnp.uint32(1),
    )
    return _popcount32(eq & mask).sum(axis=-1, dtype=jnp.int32)


def _row_cp(row: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Checkpoint count for base c from a fused row (..., 8)."""
    return sel4(row[..., 0:4].astype(jnp.int32), c.astype(jnp.int32))


def occ_prefix(didx: DeviceIndex, n: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """#occurrences of base c in stored-BWT[0, n). ONE fused-row gather.
    Returns int32 (counts < 2**31 by the build-time guard)."""
    r = jnp.maximum(n - 1, 0) >> 6
    row = didx.occ_fused[r.astype(jnp.int32)]  # (..., 8); row index < 2**31
    m = (n - r * 64).astype(jnp.int32)         # in [0, 64]
    return _row_cp(row, c) + _count_first(row[..., 4:8], c, m)


def occ4_all(didx: DeviceIndex, k: jnp.ndarray) -> jnp.ndarray:
    """occ of all 4 bases at conceptual index k inclusive — ONE gather,
    four popcount passes over the same fused row [bwa: bwt_2occ4]."""
    n = jnp.where(k < 0, 0, k + 1 - (k >= didx.primary).astype(k.dtype))
    n = jnp.maximum(n, 0)
    r = jnp.maximum(n - 1, 0) >> 6
    row = didx.occ_fused[r.astype(jnp.int32)]
    m = (n - r * 64).astype(jnp.int32)
    words = row[..., 4:8]
    cnts = jnp.stack(
        [_count_first(words, jnp.full_like(m, c), m) for c in range(4)],
        axis=-1)
    return row[..., 0:4].astype(jnp.int32) + cnts


def occ1(didx: DeviceIndex, k: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """bwa bwt_occ: count of c in stored-BWT[0..k] inclusive, conceptual k."""
    n = jnp.where(k < 0, 0, k + 1 - (k >= didx.primary).astype(k.dtype))
    return occ_prefix(didx, jnp.maximum(n, 0), c)


def bwt_base(didx: DeviceIndex, j: jnp.ndarray) -> jnp.ndarray:
    """Stored-BWT base at position j (any int dtype) -> int32 code."""
    row = didx.occ_fused[(j >> 6).astype(jnp.int32)]
    word = sel4(row[..., 4:8].astype(jnp.int32),
                ((j >> 4) & 3).astype(jnp.int32)).astype(jnp.uint32)
    return ((word >> (2 * (j & 15)).astype(jnp.uint32)) &
            jnp.uint32(3)).astype(jnp.int32)


def backward_ext(didx: DeviceIndex, k: jnp.ndarray, s: jnp.ndarray,
                 c: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Backward extension of interval (k, s) by base c (k-side only).

    [bwa: bwt.c :: bwt_extend is_back=1, single base]. The two occ queries
    are stacked into one gather batch.
    """
    ks = jnp.stack([k - 1, k - 1 + s], axis=0)
    occ = occ1(didx, ks, jnp.stack([c, c], axis=0))
    k2 = didx.L2[c] + 1 + occ[0]
    s2 = occ[1] - occ[0]
    return k2, s2


def inv_psi(didx: DeviceIndex, k: jnp.ndarray) -> jnp.ndarray:
    """LF step on conceptual rank [bwa: bwt.c :: bwt_invPsi] — one gather:
    the BWT base at x and its occ count come from the same fused row."""
    x = k - (k > didx.primary).astype(k.dtype)
    row = didx.occ_fused[(x >> 6).astype(jnp.int32)]
    word = sel4(row[..., 4:8].astype(jnp.int32),
                ((x >> 4) & 3).astype(jnp.int32)).astype(jnp.uint32)
    c = ((word >> (2 * (x & 15)).astype(jnp.uint32)) &
         jnp.uint32(3)).astype(jnp.int32)
    cnt = _row_cp(row, c) + _count_first(row[..., 4:8], c,
                                         ((x & 63) + 1).astype(jnp.int32))
    res = sel_vec(didx.L2, c, 4) + cnt
    return jnp.where(k == didx.primary, 0, res).astype(k.dtype)


def sa_lookup(didx: DeviceIndex, k: jnp.ndarray,
              valid: jnp.ndarray) -> jnp.ndarray:
    """Batched bwt_sa: walk invPsi until a sampled rank [bwa: bwt.c :: bwt_sa].

    k: int32[...] conceptual ranks; valid: bool[...] lanes to resolve.
    Lockstep until every live lane hits a sampled rank.
    """
    mask = didx.sa_intv - 1

    def body(state):
        k, steps, live = state
        live = live & ((k & mask) != 0)
        k2 = jnp.where(live, inv_psi(didx, jnp.where(live, k, 0)), k)
        return k2, steps + live.astype(k.dtype), live

    def cond(state):
        _, _, live = state
        return jnp.any(live)

    k0 = jnp.where(valid, k, 0)
    # 2 invPsi steps per iteration (body freezes finished lanes)
    kf, steps, _ = jax.lax.while_loop(
        cond, lambda s: body(body(s)), (k0, jnp.zeros_like(k0), valid))
    # sample index < (2L+1)/sa_intv < 2**31 for every supported genome
    samp = didx.sa_samples[
        (kf >> int(np.log2(didx.sa_intv))).astype(jnp.int32)]
    return steps + samp


def text_base(didx: DeviceIndex, pos: jnp.ndarray) -> jnp.ndarray:
    """Base of the bidirectional text at pos [bwa: bntseq.c :: _get_pac]."""
    p = jnp.where(pos < didx.l_pac, pos, 2 * didx.l_pac - 1 - pos)
    byte = didx.pac[(p >> 2).astype(jnp.int32)]
    b = ((byte >> ((~p & 3) << 1).astype(jnp.uint8)) & 3).astype(jnp.int32)
    return jnp.where(pos < didx.l_pac, b, 3 - b)
