"""Forest-level parity vs the reference at sl-forest scale (N=19).

``tests/fixtures/fam19.fa`` concatenates the sample protein families
(pas/ce13a17.fa + pas/globin + pas/Multi_A + pas/Multi_B, 19 sequences)
and ``golden_prrn_fam19.txt`` is the actual reference output
(``prrn5 fam19.fa``, prrn version 5.2.0) for it — the first reference
golden exercising the N>=16 spanning-forest construction path
(reference: src/prrn5.cc:1300-1332 slf mode, src/sltree.cc).

Exact output parity is not expected at this scale (the forest build,
partition schedule and refinement acceptance order are heuristic), so
parity is asserted at the objective level: our de-novo pipeline's MSA
must score AT LEAST as well as the reference's under the shared WSP
objective (tree-weighted sum-of-pairs with the same matrix/penalties,
reference src/fspscore.cc).  The gated run (PRRN_FULL=1) executes the
full pipeline; the ungated test pins the golden's objective values so
fixture drift is caught in the default suite.

Measured when the golden was generated (see WSP convention in
msa/wsp.py; higher is better):

    reference: 551 cols, SP -30917.6, tree-WSP 8637.4
    ours:      529 cols, SP -29721.3, tree-WSP 8855.1  (better on both)
"""

import os

import numpy as np
import pytest

from prrn_aln_tpu import alphabet as ab
from prrn_aln_tpu import io as pio
from prrn_aln_tpu import scoring
from prrn_aln_tpu.config import default_params

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _objective(msa):
    from prrn_aln_tpu.msa import distance as dmod
    from prrn_aln_tpu.msa import tree as tmod
    from prrn_aln_tpu.msa import wsp
    mtx, _ = scoring.build_matrix(msa.molc, default_params(msa.molc,
                                                           "prrn"))
    d = dmod.msa_distance_matrix(msa.codes)
    t = tmod.upgma(d, msa.many)
    pairwt, _ = tmod.calc_pair_weights(t)
    sp = wsp.wsp_score(msa, mtx, v=9.0)
    wv = wsp.wsp_score(msa, mtx, v=9.0, pairwt=pairwt)
    return sp, wv


def _load(path):
    recs = pio.sniff_and_read(path)
    molc = ab.infer_molc(recs[0].seq)
    return pio.records_to_msa(recs, molc)


def test_golden_fam19_objective_pinned():
    """The reference MSA's objective under our scorer (fixture guard)."""
    msa = _load(os.path.join(FIX, "golden_prrn_fam19.txt"))
    assert msa.many == 19 and msa.length == 551
    sp, wv = _objective(msa)
    np.testing.assert_allclose(sp, -30917.6, atol=0.5)
    np.testing.assert_allclose(wv, 8637.4, atol=0.5)


@pytest.mark.skipif(os.environ.get("PRRN_FULL") != "1",
                    reason="full de-novo pipeline at N=19 (~2 min CPU); "
                           "set PRRN_FULL=1")
def test_slforest_beats_reference_wsp(tmp_path, capsys):
    """De-novo forest-path MSA scores >= the reference golden's WSP."""
    import sys
    from prrn_aln_tpu.cli import prrn_main
    out = tmp_path / "fam19_ours.txt"
    old = sys.argv
    try:
        sys.argv = ["prrn5", "-o", str(out),
                    os.path.join(FIX, "fam19.fa")]
        prrn_main()
    finally:
        sys.argv = old
    ours = _load(str(out))
    assert ours.many == 19
    ref_sp, ref_wv = (-30917.6, 8637.4)
    sp, wv = _objective(ours)
    assert wv >= ref_wv - 0.5, (wv, ref_wv)
    assert sp >= ref_sp - 0.5, (sp, ref_sp)
