"""Device-resident FM-index: jnp arrays + vectorized occ primitives.

The HBM analog of the reference's broadcast ``BWAIdxType`` (SURVEY.md §1 L3):
one replicated copy per chip (sharded mode for >1 Gbp genomes lives in
tpubwa/dist). All coordinates int32 — valid while 2*l_pac < 2**31.

occ(k, c) = checkpoint gather + SWAR popcount over <=4 uint32 BWT words,
semantics identical to [bwa: bwt.c :: bwt_occ] including the sentinel-row
index shift (see tpubwa/index/builder.py for the layout).
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
    L2: jnp.ndarray            # int32[5]
    bwt_words: jnp.ndarray     # uint32[n_words]
    occ_cp: jnp.ndarray        # int32[n_cp, 4]
    sa_samples: jnp.ndarray    # int32[n_samp]
    pac: jnp.ndarray           # uint8[ceil(l_pac/4)]
    ann_end: jnp.ndarray       # int32[n_anns]: offset+length per sequence

    def tree_flatten(self):
        return ((self.L2, self.bwt_words, self.occ_cp, self.sa_samples,
                 self.pac, self.ann_end), (self.l_pac, self.primary,
                                           self.sa_intv))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], aux[1], aux[2], *children)

    @staticmethod
    def from_host(idx: FMIndex) -> "DeviceIndex":
        if 2 * idx.l_pac >= 2**31:
            raise NotImplementedError(
                "int32 device index supports genomes < 1 Gbp; "
                "use the sharded-index mode (tpubwa.dist) for larger")
        return DeviceIndex(
            l_pac=int(idx.l_pac),
            primary=int(idx.primary),
            sa_intv=int(idx.sa_intv),
            L2=jnp.asarray(idx.L2, dtype=jnp.int32),
            bwt_words=jnp.asarray(idx.bwt_words, dtype=jnp.uint32),
            occ_cp=jnp.asarray(idx.occ_cp.astype(np.int64), dtype=jnp.int32),
            sa_samples=jnp.asarray(idx.sa_samples, dtype=jnp.int32),
            pac=jnp.asarray(idx.pac, dtype=jnp.uint8),
            ann_end=jnp.asarray(
                np.array([a.offset + a.length for a in idx.anns]),
                dtype=jnp.int32),
        )


def _popcount32(x: jnp.ndarray) -> jnp.ndarray:
    """SWAR popcount of uint32 lanes."""
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def _eq_bits(words: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Per-2-bit-slot equality mask: bit 2*j set iff slot j == c.

    words: uint32[...]; c broadcastable int32 in {0..3}.
    """
    pat = (c.astype(jnp.uint32) * jnp.uint32(0x55555555))
    x = words ^ pat
    neq = (x | (x >> 1)) & jnp.uint32(0x55555555)
    return neq ^ jnp.uint32(0x55555555)


def occ_prefix(didx: DeviceIndex, n: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """#occurrences of base c in stored-BWT[0, n). Vectorized over n/c.

    n: int32[...] in [0, 2*l_pac]; c: int32[...] in {0..3}.
    """
    cp_idx = n >> 6
    partial_n = n & 63  # bases past the checkpoint
    cp = didx.occ_cp[cp_idx, c]
    # gather the 4 words of this block: word index = cp_idx*4 + [0..3]
    widx = cp_idx[..., None] * 4 + jnp.arange(4, dtype=n.dtype)
    words = didx.bwt_words[widx]                       # (..., 4) uint32
    eq = _eq_bits(words, c[..., None])
    # valid slots per word: clamp(partial - w*16, 0, 16)
    valid = jnp.clip(partial_n[..., None] - jnp.arange(4, dtype=n.dtype) * 16,
                     0, 16)
    full = valid >= 16
    mask = jnp.where(
        full,
        jnp.uint32(0xFFFFFFFF),
        (jnp.uint32(1) << (2 * valid).astype(jnp.uint32)) - jnp.uint32(1),
    )
    cnt = _popcount32(eq & mask).sum(axis=-1)
    return cp + cnt


def occ1(didx: DeviceIndex, k: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """bwa bwt_occ: count of c in stored-BWT[0..k] inclusive, conceptual k."""
    n = jnp.where(k < 0, 0, k + 1 - (k >= didx.primary).astype(k.dtype))
    return occ_prefix(didx, jnp.maximum(n, 0), c)


def bwt_base(didx: DeviceIndex, j: jnp.ndarray) -> jnp.ndarray:
    """Stored-BWT base at position j (int32)."""
    word = didx.bwt_words[j >> 4]
    return ((word >> (2 * (j & 15)).astype(jnp.uint32)) &
            jnp.uint32(3)).astype(jnp.int32)


def backward_ext(didx: DeviceIndex, k: jnp.ndarray, s: jnp.ndarray,
                 c: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Backward extension of interval (k, s) by base c (k-side only).

    [bwa: bwt.c :: bwt_extend is_back=1, single base] — the l-side is not
    tracked (only needed for bidirectional search; the per-end formulation
    in tpubwa/seed avoids it, see ARCHITECTURE.md).
    """
    occ_lo = occ1(didx, k - 1, c)
    occ_hi = occ1(didx, k - 1 + s, c)
    k2 = didx.L2[c] + 1 + occ_lo
    s2 = occ_hi - occ_lo
    return k2, s2


def inv_psi(didx: DeviceIndex, k: jnp.ndarray) -> jnp.ndarray:
    """LF step on conceptual rank [bwa: bwt.c :: bwt_invPsi]."""
    x = k - (k > didx.primary).astype(k.dtype)
    c = bwt_base(didx, x)
    res = didx.L2[c] + occ1(didx, k, c)
    return jnp.where(k == didx.primary, 0, res)


def sa_lookup(didx: DeviceIndex, k: jnp.ndarray,
              valid: jnp.ndarray) -> jnp.ndarray:
    """Batched bwt_sa: walk invPsi until a sampled rank [bwa: bwt.c :: bwt_sa].

    k: int32[...] conceptual ranks; valid: bool[...] lanes to resolve.
    Lockstep over at most sa_intv-1 steps.
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
    kf, steps, _ = jax.lax.while_loop(
        cond, body, (k0, jnp.zeros_like(k0), valid))
    return steps + didx.sa_samples[kf >> int(np.log2(didx.sa_intv))]


def text_base(didx: DeviceIndex, pos: jnp.ndarray) -> jnp.ndarray:
    """Base of the bidirectional text at pos [bwa: bntseq.c :: _get_pac]."""
    p = jnp.where(pos < didx.l_pac, pos, 2 * didx.l_pac - 1 - pos)
    byte = didx.pac[p >> 2]
    b = ((byte >> ((~p & 3) << 1).astype(jnp.uint8)) & 3).astype(jnp.int32)
    return jnp.where(pos < didx.l_pac, b, 3 - b)
