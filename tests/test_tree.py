"""Distances -> UPGMA -> weights parity against the reference pipeline."""

import json
from pathlib import Path

import numpy as np
import pytest

from prrn_aln_tpu import scoring
from prrn_aln_tpu.config import AlnParams
from prrn_aln_tpu.msa import distance, tree

FIX = Path(__file__).parent / "fixtures"
PAIR_FIX = json.loads((FIX / "pairwise_fixtures.json").read_text())
MTX, _ = scoring.protein_matrix(AlnParams(pam=150))


def _seqs(names):
    return [np.array(PAIR_FIX["seqs"][n]["codes"], dtype=np.int32)
            for n in names]


CASES = [
    ("tree_fixture7.json",
     ["ce13a1", "ce13a2", "ce13a3", "ce13a4", "ce13a5", "ce13a6", "ce13a7"]),
    ("tree_fixture4.json",
     ["ce13a3_t200", "ce13a5", "ce13a2", "ce13a6"]),
]


@pytest.mark.parametrize("fixture,names", CASES)
def test_distance_matrix(fixture, names):
    golden = json.loads((FIX / fixture).read_text())
    seqs = _seqs(names)
    d = distance.distance_matrix(seqs, MTX, u=2.0, v=9.0, sh=-60)
    np.testing.assert_allclose(d, golden["dist"], rtol=1e-4, atol=2e-3)


@pytest.mark.parametrize("fixture,names", CASES)
def test_upgma_and_weights(fixture, names):
    golden = json.loads((FIX / fixture).read_text())
    dist = np.array(golden["dist"])
    n = golden["n"]
    t = tree.upgma(dist, n)
    gn = golden["nodes"]
    for i, nd in enumerate(gn):
        assert (t.left[i] if t.left[i] >= 0 else -1) == nd["left"]
        assert (t.right[i] if t.right[i] >= 0 else -1) == nd["right"]
        np.testing.assert_allclose(t.height[i], nd["height"], rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(t.length[i], nd["length"], rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(t.res[i], nd["res"], rtol=1e-5, atol=1e-6)
        assert t.ndesc[i] == nd["ndesc"]

    wt = tree.calc_seq_weights(t)
    np.testing.assert_allclose(wt, golden["calcwt"], rtol=1e-5, atol=1e-6)

    pwt, leaf_vol = tree.calc_pair_weights(t)
    np.testing.assert_allclose(leaf_vol, golden["calcpw_wt"], rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(pwt, golden["pairwt"], rtol=1e-5, atol=1e-6)


def test_neighbor_joining():
    golden = json.loads((FIX / "tree_nj7.json").read_text())
    t = tree.neighbor_joining(np.array(golden["dist"]), golden["n"])
    for i, nd in enumerate(golden["nodes"]):
        assert (t.left[i] if t.left[i] >= 0 else -1) == nd["left"]
        assert (t.right[i] if t.right[i] >= 0 else -1) == nd["right"]
        np.testing.assert_allclose(t.height[i], nd["height"], rtol=1e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(t.length[i], nd["length"], rtol=1e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(t.res[i], nd["res"], rtol=1e-4, atol=1e-5)
