"""Double-affine (long-gap) group alignment vs reference ls=3 fixtures."""

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
LS3 = json.loads((FIX / "galign_ls3.json").read_text())
MTX, _ = scoring.protein_matrix(AlnParams(pam=150))


def _build(fname, weighted):
    info = GFIX["files"][fname]
    m = msa_from_strings(info["rows"], alphabet.PROTEIN, info["names"])
    if weighted:
        if m.many == 1:
            m.weight = np.array([1.0])
        elif m.many == 2:
            m.weight = np.array([0.5, 0.5])
        else:
            d = distance.msa_distance_matrix(m.codes)
            m.weight = tree.calc_seq_weights(tree.upgma(d, m.many))
    m.prepare(MTX.shape[0])
    return m


@pytest.mark.parametrize("case", LS3["cases"],
                         ids=lambda c: f"{Path(c['a']).name}-{Path(c['b']).name}")
def test_double_affine_matches_reference(case):
    weighted = "wa" in case
    A = _build(case["a"], weighted)
    B = _build(case["b"], weighted)
    if case["swp"]:
        A, B = B, A
    wdw = stripe(A.length, B.length, -60)
    score, skl = group_align_np(A, B, MTX, u=2.0, v=9.0, wdw=wdw, ls=3)
    assert score == pytest.approx(case["score"], rel=2e-4, abs=0.05)


def _jx(A, B, **kw):
    from prrn_aln_tpu.ops.group import group_align
    wdw = stripe(A.length, B.length, -60)
    return group_align(A, B, MTX, u=2.0, v=9.0, wdw=wdw, **kw)


@pytest.mark.parametrize("case", LS3["cases"],
                         ids=lambda c: f"dev-{Path(c['a']).name}-{Path(c['b']).name}")
def test_double_affine_device_kernel_matches_reference(case):
    """The JAX wavefront kernel with ls=3 long-gap lanes reproduces the
    reference ls=3 fixture scores and the oracle's path."""
    weighted = "wa" in case
    A = _build(case["a"], weighted)
    B = _build(case["b"], weighted)
    if case["swp"]:
        A, B = B, A
    wdw = stripe(A.length, B.length, -60)
    s_np, k_np = group_align_np(A, B, MTX, u=2.0, v=9.0, wdw=wdw, ls=3)
    s_dv, k_dv = _jx(A, B, ls=3)
    assert s_dv == pytest.approx(case["score"], rel=2e-4, abs=0.05)
    assert s_dv == pytest.approx(s_np, rel=1e-5, abs=0.02)
    assert k_dv == k_np
