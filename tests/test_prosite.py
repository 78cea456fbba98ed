"""PROSITE pattern machinery (reference prs.cc; no data ships with the
reference, so the language + search is the parity surface)."""

from prrn_aln_tpu.utils import prosite as ps


def test_basic_elements():
    # PKC phosphorylation site PS00005: [ST]-x-[RK]
    assert ps.scan("ASARTKAA", "[ST]-x-[RK].") == [(1, 4)]
    assert ps.scan("ASARSKKA", "[ST]-x-[RK].") == [(1, 4), (4, 7)]


def test_negated_and_repeat():
    # N-glycosylation PS00001: N-{P}-[ST]-{P}
    pat = "N-{P}-[ST]-{P}."
    assert ps.scan("ANASAA", pat) == [(1, 5)]
    assert ps.scan("ANPSAA", pat) == []
    assert ps.scan("MNVTK", pat) == [(1, 5)]


def test_range_repeat_and_anchors():
    assert ps.scan("MAAAK", "<M-A(2,3)-K.") == [(0, 5)]
    assert ps.scan("XMAAK", "<M-A(2,3)-K.") == []
    assert ps.scan("CAAK", "C-A(2)-K>.") == [(0, 4)]
    assert ps.scan("CAAKX", "C-A(2)-K>.") == []


def test_overlapping_matches_found():
    assert ps.scan("SSRR", "[ST]-x-[RK].") == [(0, 3), (1, 4)]


def test_parse_dat(tmp_path):
    f = tmp_path / "prosite.dat"
    f.write_text(
        "ID   TEST_SITE; PATTERN.\n"
        "AC   PS99999;\n"
        "PA   [ST]-x-\n"
        "PA   [RK].\n"
        "//\n")
    recs = list(ps.parse_dat(str(f)))
    assert recs == [("TEST_SITE", "PS99999", "[ST]-x-[RK].")]
