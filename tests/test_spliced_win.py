"""Mid-size spliced gene-prediction parity vs reference goldens.

The fixture genome is the 2.3 kb window CET10B9[31401:33700] around the
cytochrome-P450 gene of the flagship `sample/test.sh` case
(aln -yl2 -L nas/CET10B9 pas/ce13a.msa); the goldens were produced by
the reference build on exactly these inputs (see SKILL verify recipe).
Unlike the PRRN_FULL-gated full-genome test, this runs in the default
suite and exercises everything that made the full case hard: a 7-member
weighted profile query (native `%` weights fitted to sum to many),
phase-2 introns (knot coordinates carry the acceptor-phase shift), the
;b/;m GSA intron-position bonus, and terminal signal anchoring.
"""

import re
from pathlib import Path

import pytest

from prrn_aln_tpu import io, alphabet as ab

FIX = Path(__file__).parent / "fixtures"

WIN_EXONS = [(215, 400), (456, 787), (842, 941), (989, 1545),
             (1616, 1759), (1805, 2039)]


def _golden_header(path):
    text = Path(path).read_text()
    m = re.search(r"join\(([^)]+)\)", text.replace("\n;C ", ""))
    exons = [tuple(map(int, p.split("..")))
             for p in m.group(1).replace(" ", "").split(",")]
    s = re.search(r"Score = +([-\d.]+) \( *([-\d.]+)\)", text)
    return exons, float(s.group(1)), float(s.group(2))


@pytest.fixture(scope="module")
def genome():
    return io.sniff_and_read(FIX / "cet10b9_win31401.fa")[0].seq


def test_window_single_exact(genome):
    """Single protein query: exact exon + score parity
    (golden_aln_yl2_win_single.txt, reference aln -yl2 -L)."""
    from prrn_aln_tpu.splice.hapi import spliced_align_h
    exons, rep, raw = _golden_header(FIX / "golden_aln_yl2_win_single.txt")
    q = io.sniff_and_read(FIX / "ce13a1_unaligned.fa")[0]
    res = spliced_align_h(genome, q.seq, gname="CETwin31401",
                          qname=q.name, engine="np")
    assert res.exons == exons == WIN_EXONS
    assert res.reported_score == pytest.approx(rep, abs=0.1)
    assert res.gs.score == pytest.approx(raw, abs=0.1)
    assert res.gs.mch == pytest.approx(515.0, abs=0.01)
    assert res.gs.mmc == pytest.approx(0.0, abs=0.01)


def test_window_profile_structure(genome):
    """7-member weighted-profile query (native MSA with % weights and
    ;b/;m intron annotations): exact exon structure; scores at the
    normalized (per-unit-pairweight) scale within 0.2% of the
    reference's weighted score / Vab (the residual is the per-member
    crg gap-open exactness, fwd2c.cc:106-147)."""
    from prrn_aln_tpu.splice.hapi import spliced_align_h
    exons, rep, raw = _golden_header(FIX / "golden_aln_yl2_win.txt")
    q = io.sniff_and_read("/root/reference/sample/pas/ce13a.msa") \
        if False else io.sniff_and_read(FIX / "ce13a.msa")
    msa = io.records_to_msa(q, ab.PROTEIN)
    assert msa.many == 7
    assert msa.weight is not None
    assert msa.weight.sum() == pytest.approx(7.0)
    res = spliced_align_h(genome, None, gname="CETwin31401",
                          qname=q[0].name, msa=msa, engine="np")
    assert res.exons == exons == WIN_EXONS
    vab = float(msa.weight.sum())
    assert res.gs.score == pytest.approx(raw / vab, rel=3e-3)
    # weighted identity statistics are normalized by Vab in the
    # reference output (maln2.cc:248-250)
    assert res.gs.mch == pytest.approx(321.6, abs=1.0)
    assert res.gs.mmc == pytest.approx(190.3, abs=1.5)
    # per-intron scores (O4 iScore column) are exact, incl. the
    # weighted -yJ intron-position bonus
    iscr = [e.iscr for e in res.gs.exons[:-1]]
    assert iscr == pytest.approx([24.7, 21.2, 22.9, 13.5, 19.1],
                                 abs=0.1)
