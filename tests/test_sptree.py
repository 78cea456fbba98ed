"""Tree-structured WSP (Sptree) vs the naive pair loop (TST_PS_ALG)."""

import time

import numpy as np
import pytest

from prrn_aln_tpu import alphabet as ab, scoring
from prrn_aln_tpu.config import default_params
from prrn_aln_tpu.msa.msa import msa_from_strings
from prrn_aln_tpu.msa import distance, tree as tmod
from prrn_aln_tpu.msa.wsp import wsp_score
from prrn_aln_tpu.msa.sptree import sptree_wsp

AA = "ARNDCQEGHILKMFPSTWYV"


def _random_msa(rng, n, L, gap_p=0.15):
    rows = []
    base = [AA[rng.integers(0, 20)] for _ in range(L)]
    for i in range(n):
        row = [c if rng.random() > 0.2 else AA[rng.integers(0, 20)]
               for c in base]
        row = [("-" if rng.random() < gap_p else c) for c in row]
        rows.append("".join(row))
    # no all-gap columns
    cols = np.array([list(r) for r in rows])
    keep = ~(cols == "-").all(axis=0)
    rows = ["".join(r) for r in cols[:, keep]]
    return msa_from_strings(rows, ab.PROTEIN, [f"s{i}" for i in range(n)])


@pytest.mark.parametrize("seed,n,L", [(0, 5, 60), (1, 9, 120), (2, 16, 80)])
def test_sptree_equals_naive(seed, n, L):
    rng = np.random.default_rng(seed)
    m = _random_msa(rng, n, L)
    params = default_params(ab.PROTEIN, "prrn")
    mtx, _ = scoring.build_matrix(ab.PROTEIN, params)
    d = distance.msa_distance_matrix(m.codes)
    t = tmod.upgma(d, n)
    pairwt, _ = tmod.calc_pair_weights(t)
    naive = wsp_score(m, mtx, v=params.v, pairwt=pairwt)
    treed, pw2 = sptree_wsp(m, mtx, v=params.v, tree=t)
    assert np.allclose(pw2, pairwt)
    assert treed == pytest.approx(naive, rel=1e-5, abs=1e-3)


def test_sptree_faster_at_width():
    """The reference's TST_PS_ALG claim: tree scoring beats the naive
    pair loop on wide MSAs (fspscore.cc:924-991)."""
    rng = np.random.default_rng(3)
    m = _random_msa(rng, 48, 200)
    params = default_params(ab.PROTEIN, "prrn")
    mtx, _ = scoring.build_matrix(ab.PROTEIN, params)
    d = distance.msa_distance_matrix(m.codes)
    t = tmod.upgma(d, 48)
    pairwt, _ = tmod.calc_pair_weights(t)
    t0 = time.perf_counter()
    naive = wsp_score(m, mtx, v=params.v, pairwt=pairwt)
    t_naive = time.perf_counter() - t0
    t0 = time.perf_counter()
    treed, _ = sptree_wsp(m, mtx, v=params.v, tree=t)
    t_tree = time.perf_counter() - t0
    assert treed == pytest.approx(naive, rel=1e-5, abs=1e-2)
    # vectorized tree pass should win clearly on 48 members
    assert t_tree < t_naive
