"""Subset (-G grouping) parsing and group-constrained refinement."""

import numpy as np

from prrn_aln_tpu import alphabet as ab, scoring
from prrn_aln_tpu.config import default_params
from prrn_aln_tpu.msa.msa import msa_from_strings
from prrn_aln_tpu.msa.sets import Subset
from prrn_aln_tpu.msa.refine import refine_msa


def test_subset_parse_basic():
    ss = Subset.from_string(6, "1 2/3-5/6")
    assert ss.groups == [[0, 1], [2, 3, 4], [5]]
    assert ss.num == 3 and ss.elms == 6


def test_subset_parse_ranges_and_fill():
    # unmentioned members become singletons (rsubset default arm)
    ss = Subset.from_string(5, "2-4")
    assert ss.groups == [[1, 2, 3], [0], [4]]
    # singleton expansion "a-/b" form (NEG arm of sgetiarray)
    ss = Subset.from_string(4, "1-/4")
    assert ss.groups == [[0], [1], [2], [3]]
    # "a-b/" is an ordinary range closed by a group separator
    ss = Subset.from_string(5, "1-4/5")
    assert ss.groups == [[0, 1, 2, 3], [4]]


def test_subset_member_map_and_dedup():
    ss = Subset.from_string(4, "1 2 2/3")
    assert ss.groups == [[0, 1], [2], [3]]
    assert ss.member_to_group() == [0, 0, 1, 2]


def test_grouped_refinement_runs_and_respects_groups():
    rows = ["MKVL-AAGW", "MKVL-AAGW", "MKILWA-GW",
            "MKILWA-GW", "MRVLWAAG-", "MRVLWAAG-"]
    m = msa_from_strings(rows, ab.PROTEIN,
                         [f"s{i}" for i in range(6)])
    params = default_params(ab.PROTEIN, "prrn")
    mtx, _ = scoring.build_matrix(ab.PROTEIN, params)
    ss = Subset.from_string(6, "1 2/3 4/5 6")
    res = refine_msa(m, mtx, u=params.u, v=params.v, sh=params.sh,
                     maxitr=3, randseed=1, subset=ss)
    out = res.msa
    assert out.many == 6
    # paired members entered as a unit stay mutually aligned the same way
    for a, b in [(0, 1), (2, 3), (4, 5)]:
        occ_a = out.codes[a] > ab.GAP
        occ_b = out.codes[b] > ab.GAP
        # same original sequences -> identical rows must stay identical
        assert np.array_equal(out.codes[a][occ_a], m.codes[a][m.codes[a] > ab.GAP])
        assert np.array_equal(out.codes[b][occ_b], m.codes[b][m.codes[b] > ab.GAP])
