"""FM-index construction/query invariants, checked against brute force."""
import numpy as np
import pytest

from tpubwa.index.builder import build_index, suffix_array_doubling
from tpubwa.index import fmquery
from tpubwa.utils import dna


def random_genome(n, seed=0):
    rng = np.random.default_rng(seed)
    return dna.decode(rng.integers(0, 4, size=n).astype(np.uint8))


@pytest.fixture(scope="module")
def idx_and_text():
    g = random_genome(2000, seed=3)
    idx = build_index([("chr1", g)])
    fwd = dna.encode(g)
    text = np.concatenate([fwd, dna.revcomp(fwd)])
    return idx, text


def test_dna_roundtrip():
    g = random_genome(257, seed=1)
    c = dna.encode(g)
    assert dna.decode(c) == g
    assert np.array_equal(dna.unpack_2bit(dna.pack_2bit(c), len(c)), c)
    assert dna.decode(dna.revcomp(dna.revcomp(c))) == g


def test_suffix_array_matches_sorted(idx_and_text):
    _, text = idx_and_text
    t = text[:500]
    sa = suffix_array_doubling(t)
    suffixes = sorted(range(len(t)), key=lambda i: tuple(t[i:]))
    assert np.array_equal(sa, np.array(suffixes))


def test_get_seq_matches_text(idx_and_text):
    idx, text = idx_and_text
    assert np.array_equal(idx.get_seq(0, len(text)), text)
    assert np.array_equal(idx.get_seq(1500, 2500), text[1500:2500])


def test_occ_vs_bruteforce(idx_and_text):
    idx, text = idx_and_text
    n = len(text)
    sa = suffix_array_doubling(text)
    # reconstruct conceptual BWT
    bwt_c = np.empty(n + 1, dtype=np.int64)
    bwt_c[0] = text[-1]
    row = 1
    for j in range(n):
        if sa[j] == 0:
            bwt_c[row] = -1  # sentinel
        else:
            bwt_c[row] = text[sa[j] - 1]
        row += 1
    primary = int(np.flatnonzero(bwt_c == -1)[0])
    assert primary == idx.primary
    stored = bwt_c[bwt_c >= 0]
    rng = np.random.default_rng(0)
    ks = np.concatenate([[-1, 0, 1, primary - 1, primary, primary + 1, n],
                         rng.integers(0, n + 1, size=40)])
    for k in ks:
        for c in range(4):
            kk = int(k)
            if kk < 0:
                expect = 0
            else:
                kk2 = kk - 1 if kk >= primary else kk
                expect = int(np.sum(stored[: kk2 + 1] == c)) if kk2 >= 0 else 0
            assert fmquery.occ1(idx, int(k), c) == expect, (k, c)


def test_sa_resolution(idx_and_text):
    idx, text = idx_and_text
    sa = suffix_array_doubling(text)
    rng = np.random.default_rng(1)
    for j in rng.integers(0, len(text), size=50):
        # conceptual rank = j+1
        assert fmquery.bwt_sa(idx, int(j) + 1) == int(sa[j])


def test_backward_search_finds_all_occurrences(idx_and_text):
    idx, text = idx_and_text
    rng = np.random.default_rng(2)
    n = len(text)
    for trial in range(25):
        plen = int(rng.integers(3, 20))
        start = int(rng.integers(0, n - plen))
        pat = text[start : start + plen]
        # bwa-style backward search with bidirectional intervals
        ik = fmquery.init_interval(idx, int(pat[-1]))
        ok = True
        for b in pat[-2::-1]:
            cand = fmquery.bwt_extend(idx, ik, is_back=True)[int(b)]
            if cand.s == 0:
                ok = False
                break
            ik = cand
        # brute force occurrences (pattern can't span the fwd/rev boundary
        # in the brute scan; the FM-index text is one string so scan it all)
        occs = {
            i
            for i in range(n - plen + 1)
            if np.array_equal(text[i : i + plen], pat)
        }
        assert ok and ik.s == len(occs)
        found = {fmquery.bwt_sa(idx, ik.k + i) for i in range(ik.s)}
        assert found == occs


def test_forward_extension(idx_and_text):
    idx, text = idx_and_text
    # forward extension: ok[3 - base] per bwa convention
    pat = text[100:110]
    ik = fmquery.init_interval(idx, int(pat[0]))
    for b in pat[1:]:
        ik = fmquery.bwt_extend(idx, ik, is_back=False)[3 - int(b)]
        assert ik.s > 0
    occs = sum(
        1 for i in range(len(text) - len(pat) + 1)
        if np.array_equal(text[i : i + len(pat)], pat)
    )
    assert ik.s == occs


def test_amb_handling():
    g = "ACGT" * 50 + "NNNN" + "ACGT" * 50
    idx = build_index([("c", g)])
    assert idx.ambs.shape == (1, 2)
    assert idx.ambs[0, 0] == 200 and idx.ambs[0, 1] == 4
    assert idx.l_pac == len(g)


def test_save_load(tmp_path, idx_and_text):
    idx, _ = idx_and_text
    p = tmp_path / "idx.npz"
    idx.save(p)
    idx2 = idx.load(p)
    assert idx2.primary == idx.primary
    assert np.array_equal(idx2.bwt_words, idx.bwt_words)
    assert np.array_equal(idx2.sa_samples, idx.sa_samples)
    assert idx2.anns[0].name == idx.anns[0].name
