"""Corner-miss band-widen recovery (reference maln2.cc:1944-1952): a
stripe too narrow for the optimal path must trigger one full-width
retry instead of silently returning a clipped alignment."""

import numpy as np

from prrn_aln_tpu import alphabet as ab
from prrn_aln_tpu import scoring
from prrn_aln_tpu.config import AlnParams
from prrn_aln_tpu.msa.msa import msa_from_strings
from prrn_aln_tpu.ops.group import group_align, group_align_batch, \
    skl_in_band
from prrn_aln_tpu.ops.window import stripe

# B carries a long insertion: the optimal path leaves a narrow stripe
A_ROWS = ["MKVLAAGFDDEERRKKLL"]
B_ROWS = ["MKVLWWWWWWWWWWWWWWWWAAGFDDEERRKKLL"]


def _prep(rows, mtx):
    return msa_from_strings(rows, ab.PROTEIN).prepare(mtx.shape[0])


def test_group_align_band_retry():
    mtx, _ = scoring.protein_matrix(AlnParams(pam=250))
    A = _prep(A_ROWS, mtx)
    B = _prep(B_ROWS, mtx)
    narrow = stripe(A.length, B.length, 2)
    wide = stripe(A.length, B.length, -100)
    s_narrow, k_narrow = group_align(A, B, mtx, u=2.0, v=9.0, wdw=narrow)
    s_wide, k_wide = group_align(A, B, mtx, u=2.0, v=9.0, wdw=wide)
    # the narrow call must have recovered to the wide result
    assert s_narrow == s_wide
    assert k_narrow == k_wide


def test_group_align_batch_band_retry():
    mtx, _ = scoring.protein_matrix(AlnParams(pam=250))
    A = _prep(A_ROWS, mtx)
    B = _prep(B_ROWS, mtx)
    C = _prep(["MKVLAAGFDDEERRKQLL"], mtx)
    # sh=2 stripe is too narrow for (A, B) but fine for (A, C)
    got = group_align_batch([(A, B), (A, C)], mtx, u=2.0, v=9.0, sh=2,
                            pads=(2, 40))
    wide = stripe(A.length, B.length, -100)
    want_ab = group_align(A, B, mtx, u=2.0, v=9.0, wdw=wide)
    assert got[0][0] == want_ab[0]
    assert got[0][1] == want_ab[1]
    w2 = stripe(A.length, C.length, 2)
    assert skl_in_band(got[1][1], w2.lw, w2.up)
