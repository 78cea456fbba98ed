"""Tree-structured WSP (Sptree) vs the naive pair loop (TST_PS_ALG)."""

import os
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


def test_sptree_column_pass_economy():
    """Deterministic form of the reference's TST_PS_ALG claim
    (fspscore.cc:924-991): the tree pass does one column scan per
    internal node (n-1 of them) instead of one per member pair
    (n(n-1)/2), and its result is exact."""
    rng = np.random.default_rng(3)
    n = 48
    m = _random_msa(rng, n, 200)
    params = default_params(ab.PROTEIN, "prrn")
    mtx, _ = scoring.build_matrix(ab.PROTEIN, params)
    d = distance.msa_distance_matrix(m.codes)
    t = tmod.upgma(d, n)
    pairwt, _ = tmod.calc_pair_weights(t)
    naive = wsp_score(m, mtx, v=params.v, pairwt=pairwt)
    treed, _ = sptree_wsp(m, mtx, v=params.v, tree=t)
    assert treed == pytest.approx(naive, rel=1e-5, abs=1e-2)
    internal = sum(1 for k in range(len(t.left)) if not t.is_leaf(k))
    assert internal == n - 1 < n * (n - 1) // 2


@pytest.mark.skipif(os.environ.get("PRRN_PERF") != "1",
                    reason="wall-clock comparison (set PRRN_PERF=1)")
def test_sptree_faster_at_width():
    """Wall-clock version, gated: tree scoring beats the naive pair
    loop on a 96-member MSA (min of 3 reps each)."""
    rng = np.random.default_rng(3)
    m = _random_msa(rng, 96, 400)
    params = default_params(ab.PROTEIN, "prrn")
    mtx, _ = scoring.build_matrix(ab.PROTEIN, params)
    d = distance.msa_distance_matrix(m.codes)
    t = tmod.upgma(d, 96)
    pairwt, _ = tmod.calc_pair_weights(t)
    t_naive = min(_timed(lambda: wsp_score(m, mtx, v=params.v,
                                           pairwt=pairwt))
                  for _ in range(3))
    t_tree = min(_timed(lambda: sptree_wsp(m, mtx, v=params.v,
                                           tree=t))
                 for _ in range(3))
    assert t_tree < t_naive


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0
