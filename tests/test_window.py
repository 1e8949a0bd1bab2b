"""Gather-free text/query windows vs direct per-base indexing."""
import numpy as np
import jax.numpy as jnp
import pytest

from tpubwa.index.builder import build_index
from tpubwa.index.device import DeviceIndex, text_base
from tpubwa.ops.window import (query_window_asc, query_window_desc,
                               text_window_asc, text_window_desc)
from tpubwa.utils import dna


@pytest.fixture(scope="module")
def didx():
    rng = np.random.default_rng(42)
    genome = dna.decode(rng.integers(0, 4, 5000).astype(np.uint8))
    return DeviceIndex.from_host(build_index([("t", genome)]))


def _truth(didx, pos):
    return np.asarray(text_base(didx, jnp.asarray(pos)))


@pytest.mark.parametrize("W", [96, 200])
def test_text_window_asc(didx, W):
    l_pac = didx.l_pac
    rng = np.random.default_rng(0)
    starts = np.concatenate([
        rng.integers(0, l_pac - W, 40),            # forward, interior
        rng.integers(l_pac, 2 * l_pac - W, 40),    # reverse, interior
        [0, l_pac - W, l_pac, 2 * l_pac - W],      # edges
    ]).astype(np.int32)
    out = np.asarray(text_window_asc(didx, jnp.asarray(starts), W))
    j = np.arange(W)
    truth = _truth(didx, starts[:, None] + j[None, :])
    np.testing.assert_array_equal(out, truth)


@pytest.mark.parametrize("W", [96, 200])
def test_text_window_desc(didx, W):
    l_pac = didx.l_pac
    rng = np.random.default_rng(1)
    ends = np.concatenate([
        rng.integers(W, l_pac, 40),                # forward, interior
        rng.integers(l_pac + W, 2 * l_pac, 40),    # reverse, interior
        [W, l_pac, l_pac + W, 2 * l_pac],          # edges
    ]).astype(np.int32)
    out = np.asarray(text_window_desc(didx, jnp.asarray(ends), W))
    j = np.arange(W)
    truth = _truth(didx, ends[:, None] - 1 - j[None, :])
    np.testing.assert_array_equal(out, truth)


def test_query_windows():
    rng = np.random.default_rng(2)
    B, L, W = 16, 100, 64
    seqs = rng.integers(0, 4, (B, L)).astype(np.int32)
    starts = rng.integers(0, L, B).astype(np.int32)
    out = np.asarray(query_window_asc(jnp.asarray(seqs),
                                      jnp.asarray(starts), W))
    for b in range(B):
        for j in range(W):
            want = seqs[b, starts[b] + j] if starts[b] + j < L else 0
            assert out[b, j] == want, (b, j)
    ends = rng.integers(0, L + 1, B).astype(np.int32)
    out = np.asarray(query_window_desc(jnp.asarray(seqs),
                                       jnp.asarray(ends), W))
    for b in range(B):
        for j in range(W):
            want = seqs[b, ends[b] - 1 - j] if ends[b] - 1 - j >= 0 else 0
            assert out[b, j] == want, (b, j)
