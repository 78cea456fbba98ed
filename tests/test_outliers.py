"""Dixon outlier detection."""

import numpy as np

from prrn_aln_tpu import scoring, alphabet
from prrn_aln_tpu.config import AlnParams
from prrn_aln_tpu.msa.msa import msa_from_strings
from prrn_aln_tpu.msa import distance, tree
from prrn_aln_tpu.msa.outliers import Dixon, find_outliers, outlier_report


def test_dixon_flags_extreme():
    data = np.array([1.0, 1.1, 0.9, 1.05, 8.0])
    d = Dixon(0.1)
    res = d.test(data)
    assert 4 in res                      # high outlier flagged
    assert all(o >= 0 or -o - 1 != 4 for o in res)

    # no outlier in homogeneous data
    assert Dixon(0.1).test(np.array([1.0, 1.2, 0.8, 1.1, 0.95])) == []


def test_find_outliers_on_indel_member():
    cons = "MKVLAAGFDDEERRKKLLQQWWYYHH"     # conserved block
    var = ["NPQSTG", "NPQATG", "NPQSSG", "NPASTG", "------"]
    rows = [cons + v + cons for v in var]  # one member deleted the middle
    m = msa_from_strings(rows, alphabet.PROTEIN)
    mtx, _ = scoring.protein_matrix(AlnParams(pam=150))
    d = distance.msa_distance_matrix(m.codes)
    t = tree.upgma(d, m.many)
    m.weight = tree.calc_seq_weights(t)
    outs = find_outliers(m, t, mtx)
    assert any(o.del_f + o.del_m + o.del_l > 0 for o in [outs[4]])
    assert sum(o.del_f + o.del_m + o.del_l for o in outs[:4]) == 0
    rep = outlier_report(m, outs)
    assert rep.count("\n") == 5
