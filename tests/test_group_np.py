"""Group-to-group DP parity against reference align2 (scores + paths)."""

import json
from pathlib import Path

import numpy as np
import pytest

from prrn_aln_tpu import scoring, alphabet
from prrn_aln_tpu.config import AlnParams
from prrn_aln_tpu.msa.msa import msa_from_strings
from prrn_aln_tpu.msa import distance, tree
from prrn_aln_tpu.ops.window import stripe
from prrn_aln_tpu.ops.group_np import group_align_np

FIX = Path(__file__).parent / "fixtures"
GFIX = json.loads((FIX / "galign_fixtures.json").read_text())
MTX, _ = scoring.protein_matrix(AlnParams(pam=150))


def _build_msa(fname, weighted):
    info = GFIX["files"][fname]
    m = msa_from_strings(info["rows"], alphabet.PROTEIN, info["names"])
    if weighted:
        if m.many == 1:
            m.weight = np.array([1.0])
        elif m.many == 2:
            m.weight = np.array([0.5, 0.5])
        else:
            d = distance.msa_distance_matrix(m.codes)
            t = tree.upgma(d, m.many)
            m.weight = tree.calc_seq_weights(t)
    m.prepare(MTX.shape[0])
    return m


def _case_id(c):
    w = "w" if "wa" in c else "i"
    return f"{Path(c['a']).name}-{Path(c['b']).name}-{w}"


@pytest.mark.parametrize("case", GFIX["cases"], ids=_case_id)
def test_group_align(case):
    weighted = "wa" in case
    A = _build_msa(case["a"], weighted)
    B = _build_msa(case["b"], weighted)
    if case["swp"]:
        A, B = B, A
    if weighted:
        np.testing.assert_allclose(A.weight, case["wa"], rtol=1e-5)
        np.testing.assert_allclose(B.weight, case["wb"], rtol=1e-5)
    wdw = stripe(A.length, B.length, -60)
    score, skl = group_align_np(A, B, MTX, u=2.0, v=9.0, wdw=wdw)
    assert score == pytest.approx(case["score"], rel=2e-4, abs=0.05)
    want_skl = [tuple(p) for p in case["skl"]]
    if skl != want_skl:
        # float rounding can flip exact-tie decisions between equal-optimal
        # paths; accept iff both paths score identically under one model
        from prrn_aln_tpu.ops.path_score import score_path
        mine = score_path(A, B, MTX, skl, u=2.0, v=9.0)
        ref = score_path(A, B, MTX, want_skl, u=2.0, v=9.0)
        assert mine == pytest.approx(score, rel=1e-6, abs=1e-4)
        assert ref == pytest.approx(mine, rel=1e-6, abs=1e-3)
