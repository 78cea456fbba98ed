"""Wavefront DP (NumPy reference) parity against reference golden scores."""

import json
from pathlib import Path

import numpy as np
import pytest

from prrn_aln_tpu import scoring
from prrn_aln_tpu.config import AlnParams
from prrn_aln_tpu.ops.window import stripe, Window
from prrn_aln_tpu.ops.pairwise_np import pairwise_score_np

FIX = Path(__file__).parent / "fixtures"


def _load():
    return json.loads((FIX / "pairwise_fixtures.json").read_text())


FIXTURE = _load()
PROT_MTX, _ = scoring.protein_matrix(AlnParams(pam=FIXTURE["matrices"]["protein_pam"]))
DNA_MTX, _ = scoring.dna_matrix(AlnParams(
    u=FIXTURE["matrices"]["dna_u"],
    n_mismatch=FIXTURE["matrices"]["dna_mismatch"]))


def _case_id(c):
    return f"{c['a']}-{c['b']}-lcl{c['lcl']}-sh{c['sh']}"


@pytest.mark.parametrize("case", FIXTURE["cases"], ids=_case_id)
def test_pairwise_score_matches_reference(case):
    a = np.array(FIXTURE["seqs"][case["a"]]["codes"], dtype=np.int64)
    b = np.array(FIXTURE["seqs"][case["b"]]["codes"], dtype=np.int64)
    molc = FIXTURE["seqs"][case["a"]]["molc"]
    mtx = PROT_MTX if molc == 1 else DNA_MTX
    wdw = stripe(len(a), len(b), case["sh"])
    assert (wdw.lw, wdw.up, wdw.width) == (case["lw"], case["up"], case["width"])
    lcl = case["lcl"]
    score = pairwise_score_np(
        a, b, mtx, u=case["u"], v=case["v"], wdw=wdw, tgapf=case["tgapf"],
        exgl_a=bool(lcl & 1), exgr_a=bool(lcl & 2),
        exgl_b=bool(lcl & 4), exgr_b=bool(lcl & 8),
        local=bool(lcl & 16),
    )
    assert score == pytest.approx(case["score"], rel=2e-5, abs=0.05)
