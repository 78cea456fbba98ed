"""Range set algebra (reference src/css.cc)."""

from prrn_aln_tpu.msa.css import (normalize, cmnrng, uniterng, complerng,
                                  sumrng, getrng, foldrng, unfoldrng)


def test_basic_algebra():
    a = [(0, 10), (20, 30)]
    b = [(5, 25)]
    assert cmnrng(a, b) == [(5, 10), (20, 25)]
    assert uniterng(a, b) == [(0, 30)]
    assert complerng((0, 40), a) == [(10, 20), (30, 40)]
    assert sumrng(a) == 20
    assert normalize([(5, 3), (1, 4), (3, 6)]) == [(1, 6)]


def test_parse_and_fold():
    assert getrng("1..5, 8-10") == [(1, 5), (8, 10)]
    gaps = [(3, 2), (7, 1)]          # 2 gap cols after pos 3, 1 after 7
    folded = foldrng([(1, 5), (8, 10)], gaps)
    assert folded == [(1, 7), (11, 13)]
    assert unfoldrng(folded, gaps) == [(1, 5), (8, 10)]
