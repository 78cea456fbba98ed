"""DNA end-to-end pipeline: distance/tree parity + alignment sanity.

The reference prrn5's de-novo DNA path scores nucleotides through the
protein/tron matrix (DEVIATIONS.md #1), so its default output is not a
meaningful golden; instead DNA parity is pinned at the component level
(pairwise fixtures, distance/tree fixture from the content-typed oracle)
and the pipeline is checked for self-consistency.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from prrn_aln_tpu import io, scoring, alphabet as ab
from prrn_aln_tpu.config import default_params
from prrn_aln_tpu.pipeline import build_msa
from prrn_aln_tpu.msa import distance, tree, wsp

FIX = Path(__file__).parent / "fixtures"


def test_dna_distance_and_tree_parity():
    golden = json.loads((FIX / "tree_dna6.json").read_text())
    recs = io.read_fasta(FIX / "dnafam.fa")
    params = default_params(ab.DNA, "prrn")
    mtx, _ = scoring.build_matrix(ab.DNA, params)
    seqs = [ab.encode(r.seq, ab.DNA) for r in recs]
    d = distance.distance_matrix(seqs, mtx, u=params.u, v=params.v,
                                 sh=params.sh)
    np.testing.assert_allclose(d, golden["dist"], rtol=1e-4, atol=2e-3)
    t = tree.upgma(np.array(golden["dist"]), golden["n"])
    for i, nd in enumerate(golden["nodes"]):
        assert (t.left[i] if t.left[i] >= 0 else -1) == nd["left"]
        assert (t.right[i] if t.right[i] >= 0 else -1) == nd["right"]


@pytest.mark.slow
def test_dna_pipeline_roundtrip():
    recs = io.read_fasta(FIX / "dnafam.fa")
    msa = build_msa(recs, randseed=0)
    assert msa.many == len(recs)
    # every row must decode back to its input sequence when degapped
    by_name = {r.name: r.seq.replace("-", "") for r in recs}
    for i, name in enumerate(msa.names):
        row = io.decode_row(msa, i).replace("-", "")
        assert row == by_name[name], name
    # refinement must not have hurt the objective vs progressive only
    prog = build_msa(recs, refine=False)
    params = default_params(ab.DNA, "prrn")
    mtx, _ = scoring.build_matrix(ab.DNA, params)
    d = distance.msa_distance_matrix(prog.codes)
    t = tree.upgma(d, prog.many)
    pairwt, _ = tree.calc_pair_weights(t)
    w_prog = wsp.wsp_score(prog, mtx, v=params.v, pairwt=pairwt)
    w_ref = wsp.wsp_score(msa, mtx, v=params.v, pairwt=pairwt)
    assert w_ref >= w_prog - 1e-6
