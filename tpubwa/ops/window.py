"""Gather-free contiguous text windows from the 2-bit packed genome.

XLA TPU gathers cost ~tens of ns PER OFFSET, so building a (B, W) reference
window with `text_base` (B*W offsets) dominates the extension stage. Here a
window costs a handful of 32-byte ROW gathers (B * (W/128 + 2) offsets) plus
pure VPU work: word-level variable shift (binary decomposition), 2-bit
decode, base-level variable shift.

Semantics match index.device.text_base ([bwa: bntseq.c :: _get_pac] with the
reverse strand reconstructed as 3 - pac[2*l_pac-1-pos]); windows must not
cross the forward/reverse boundary for lanes the caller consumes (bwa's
extension windows never do — rmax is clipped at l_pac).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..index.device import DeviceIndex


def _var_shift_left(x: jnp.ndarray, s: jnp.ndarray, W: int,
                    fill) -> jnp.ndarray:
    """out[b, i] = x[b, s[b] + i] for s[b] in [0, NB); `fill` past the end.

    Binary-decomposed static shifts: log2(NB) selects, no gather.
    """
    B, NB = x.shape
    out = x
    bit = 1
    while bit < NB:
        shifted = jnp.concatenate(
            [out[:, bit:], jnp.full((B, bit), fill, x.dtype)], axis=1)
        out = jnp.where(((s & bit) != 0)[:, None], shifted, out)
        bit <<= 1
    return out[:, :W]


def _decode_words(w: jnp.ndarray, reverse: bool = False) -> jnp.ndarray:
    """(B, NW) uint32 pac words -> (B, NW*16) int32 bases.

    reverse=False: text order. reverse=True: bases of each word emitted in
    reversed order (combined with word-reversal this yields the fully
    base-reversed sequence).
    """
    B, NW = w.shape
    t = jnp.arange(16, dtype=jnp.uint32)
    if reverse:
        t = t[::-1]
    # byte k = t>>2 (little-endian in the word), base j = t&3 at bits
    # 2*(3-j) of its byte [bwa pac layout]
    sh = 8 * (t >> 2) + 2 * (3 - (t & 3))
    bases = (w[..., None] >> sh[None, None, :]) & jnp.uint32(3)
    return bases.reshape(B, NW * 16).astype(jnp.int32)


def _window_from_pac(didx: DeviceIndex, a_base: jnp.ndarray, r0: jnp.ndarray,
                     W: int, NROW: int, backward: jnp.ndarray):
    """Window over pac space: out[b, j] = pac_base(a_base[b] +- j).

    a_base is an absolute pac position; r0 = the first fetched row
    (a_base inside rows [r0, r0+NROW)). backward selects the -j direction.
    """
    # pac row index < l_pac/128 < 2**31 for every supported genome
    idx = r0.astype(jnp.int32)[:, None] + \
        jnp.arange(NROW, dtype=jnp.int32)[None, :]
    idx = jnp.clip(idx, 0, didx.pac_rows.shape[0] - 1)
    rows = didx.pac_rows[idx]                        # (B, NROW, 8)
    w = rows.reshape(rows.shape[0], NROW * 8)        # (B, NW) words
    NW = NROW * 8
    a = jnp.clip(a_base - (r0 << 7), 0, NROW * 128 - 1).astype(jnp.int32)

    # word-level shift first (cheap), then decode, then base-level shift
    NWOUT = W // 16 + 2
    fwd = _var_shift_left(
        _decode_words(_var_shift_left(w, a >> 4, NWOUT, jnp.uint32(0))),
        a & 15, W, 0)

    # backward: out[j] = base(a - j) = baseR[ar + j] where baseR is the
    # fully base-reversed fetched span and ar = NB-1-a
    ar = (NW * 16 - 1) - a
    bwd = _var_shift_left(
        _decode_words(_var_shift_left(w[:, ::-1], ar >> 4, NWOUT,
                                      jnp.uint32(0)), reverse=True),
        ar & 15, W, 0)

    return jnp.where(backward[:, None], bwd, fwd)


def text_window_asc(didx: DeviceIndex, start: jnp.ndarray,
                    W: int) -> jnp.ndarray:
    """out[b, j] = text(start[b] + j), j in [0, W). Per-row strand from
    start; lanes crossing the strand boundary are caller-masked."""
    l_pac = didx.l_pac
    rev = start >= l_pac
    # pac position of element j: fwd -> start + j (ascending);
    # rev -> (2*l_pac - 1 - start) - j (descending), complemented
    a0 = jnp.where(rev, 2 * l_pac - 1 - start, start)
    a0c = jnp.clip(a0, 0, l_pac - 1)
    NROW = W // 128 + 2
    # first fetched row must cover the whole +-W span
    r0 = jnp.where(rev, jnp.clip(a0c - (W - 1), 0, l_pac) >> 7, a0c >> 7)
    out = _window_from_pac(didx, a0c, r0, W, NROW, rev)
    return jnp.where(rev[:, None], 3 - out, out)


def text_window_desc(didx: DeviceIndex, end: jnp.ndarray,
                     W: int) -> jnp.ndarray:
    """out[b, j] = text(end[b] - 1 - j), j in [0, W)."""
    l_pac = didx.l_pac
    e1 = end - 1
    rev = e1 >= l_pac
    a0 = jnp.where(rev, 2 * l_pac - 1 - e1, e1)
    a0c = jnp.clip(a0, 0, l_pac - 1)
    NROW = W // 128 + 2
    # fwd reads descending from a0 (needs rows down to a0-W+1);
    # rev reads ascending from a0
    r0 = jnp.where(rev, a0c >> 7, jnp.clip(a0c - (W - 1), 0, l_pac) >> 7)
    out = _window_from_pac(didx, a0c, r0, W, NROW, ~rev)
    return jnp.where(rev[:, None], 3 - out, out)


def slice_rows(flat: jnp.ndarray, starts: jnp.ndarray, S: int,
               fill=0) -> jnp.ndarray:
    """out[b, j] = flat[starts[b] + j], j in [0, S) — variable row slices
    of a 1-D array with only O(B) gather offsets.

    Fetches 128-lane blocks (B * (S/128 + 2) offsets) then aligns with a
    binary-decomposed shift. `fill` is returned past the end of flat.
    """
    D = flat.shape[0]
    BLK = 128
    nblk = S // BLK + 2
    flat_pad = jnp.concatenate(
        [flat, jnp.full(((-D) % BLK + BLK,), fill, flat.dtype)])
    blocks = flat_pad.reshape(-1, BLK)
    s0 = jnp.clip(starts, 0, D)
    b0 = s0 >> 7
    idx = jnp.clip(b0[:, None] + jnp.arange(nblk, dtype=jnp.int32)[None, :],
                   0, blocks.shape[0] - 1)
    rows = blocks[idx].reshape(starts.shape[0], nblk * BLK)
    return _var_shift_left(rows, s0 & (BLK - 1), S, fill)


def query_window_asc(seqs: jnp.ndarray, start: jnp.ndarray,
                     W: int) -> jnp.ndarray:
    """out[b, j] = seqs[b, start[b] + j] (0-fill past L). No gather."""
    B, L = seqs.shape
    pad = jnp.zeros((B, max(W - 1, 1)), seqs.dtype)
    return _var_shift_left(jnp.concatenate([seqs, pad], axis=1),
                           jnp.clip(start, 0, L), W, 0)


def query_window_desc(seqs: jnp.ndarray, end: jnp.ndarray,
                      W: int) -> jnp.ndarray:
    """out[b, j] = seqs[b, end[b] - 1 - j] (0-fill before 0). No gather."""
    B, L = seqs.shape
    rev = seqs[:, ::-1]
    pad = jnp.zeros((B, max(W - 1, 1)), seqs.dtype)
    return _var_shift_left(jnp.concatenate([rev, pad], axis=1),
                           jnp.clip(L - end, 0, L), W, 0)
