"""Restriction-site search (reference resite.cc semantics; the
reference binary only exposes it via the interactive menu -- see
utils/resite.py docstring)."""

import numpy as np

from prrn_aln_tpu.utils import resite as rz


def test_table_loads():
    enz = rz.load_enzymes()
    assert len(enz) > 300
    eco = rz.find_enzyme("EcoRI", enz)
    assert eco is not None and eco.pattern == "GAATTC" and eco.cut == 2


def test_exact_site():
    seq = "AAGAATTCTTGGAATTCA"
    eco = rz.find_enzyme("EcoRI")
    assert rz.respos(seq, eco) == [2, 11]


def test_iupac_degenerate():
    # AccI GTMKAC: M = A/C, K = G/T
    acc = rz.find_enzyme("Acc1")
    assert acc is not None
    assert rz.pattern_positions("TTGTATACTT", acc.pattern) == [2]
    assert rz.pattern_positions("TTGTCGACTT", acc.pattern) == [2]
    assert rz.pattern_positions("TTGTTAACTT", acc.pattern) == []


def test_n_in_sequence_not_matched_by_acgt():
    # degenerate residue in the SEQUENCE only matches if its bits are
    # covered by the pattern char (simplepat subset rule)
    eco = rz.find_enzyme("EcoRI")
    assert rz.pattern_positions("GANTTC", eco.pattern) == []
    assert rz.pattern_positions("GARTTC", "GARTTC") == [0]


def test_all_sites_skips_duplicate_patterns():
    seq = "AAGGCCTT" * 3
    hits = rz.all_sites(seq, 1)
    pats = [e.pattern for e, _ in hits]
    # reference skips only the *immediately preceding* printed pattern
    # (utn.cc:1310 strcmp vs rsq), so only consecutive dups vanish
    assert all(a != b for a, b in zip(pats, pats[1:]))
    assert any(e.pattern == "AGGCCT" for e, _ in hits)


def test_cli_smoke(capsys, tmp_path):
    from prrn_aln_tpu.cli import utn_main
    f = tmp_path / "x.fa"
    f.write_text(">x\nAAGAATTCTT\n")
    utn_main([str(f), "-z", "EcoRI"])
    out = capsys.readouterr().out
    assert "EcoRI" in out and "GAATTC" in out
    assert "    3 " in out                  # 1-based position
