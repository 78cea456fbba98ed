"""Species -T parameter tables (AlnParam -yI, Splice5/3 PWMs)."""

import os
from pathlib import Path

import numpy as np
import pytest

from prrn_aln_tpu import alphabet as ab
from prrn_aln_tpu.splice.species import (load_species, ipen_kwargs,
                                         read_patmat)
from prrn_aln_tpu.splice.penalty import IntronPenalty
from prrn_aln_tpu.splice.signals import SpliceSignals

TAB = Path("/root/reference/table")
pytestmark = pytest.mark.skipif(not TAB.exists(),
                                reason="reference table dir absent")


def test_load_species_angiosp(monkeypatch):
    monkeypatch.setenv("ALN_TAB", str(TAB))
    sp = load_species("Angiosp")
    assert "yI" in sp and sp["yI"][0] == 15
    assert sp["tabs"]["splice5_mtx"].shape[1] == 84
    kw = ipen_kwargs(sp)
    assert kw["llmt"] == 15 and kw["rlmt"] == 585
    # species intron-length distribution differs from the default
    ip_sp = IntronPenalty.build(**kw)
    ip_def = IntronPenalty.build()
    ls = [ip_sp.penalty(n) for n in range(60, 200, 20)]
    ld = [ip_def.penalty(n) for n in range(60, 200, 20)]
    assert not np.allclose(ls, ld)


def test_species_pwms_change_signals(monkeypatch):
    monkeypatch.setenv("ALN_TAB", str(TAB))
    sp = load_species("Angiosp")
    rng = np.random.default_rng(0)
    g = "".join("ACGT"[k] for k in rng.integers(0, 4, 300))
    g = g[:100] + "GTAAGT" + g[100:160] + "TTTCAG" + g[160:]
    bg = ab.encode(g, ab.DNA)
    s_def = SpliceSignals.build(bg)
    s_sp = SpliceSignals.build(bg, tabs=sp["tabs"])
    assert not np.allclose(s_def.sig5, s_sp.sig5)
    # canonicity marks are dinucleotide-based, unchanged by PWMs
    assert np.array_equal(s_def.cano5, s_sp.cano5)


def test_cli_species_runs(monkeypatch, tmp_path, capsys):
    monkeypatch.setenv("ALN_TAB", str(TAB))
    from prrn_aln_tpu.cli import aln_main
    gen = tmp_path / "g.fa"
    rng = np.random.default_rng(1)
    exon1 = "ATGGCTAAGGTTCTCGAGGCTTGGAAGGCT"
    exon2 = "GGTATCGATCCAGAGTTCTTCAAGGCTTAA"
    mid = "".join("ACGT"[k] for k in rng.integers(0, 4, 60))
    gen.write_text(f">g\n{exon1}GT{mid}AG{exon2}\n")
    cdna = tmp_path / "c.fa"
    cdna.write_text(f">c\n{exon1}{exon2}\n")
    rc = aln_main(["-G", "-T", "Angiosp", str(gen), str(cdna)])
    out = capsys.readouterr().out
    assert rc == 0 and out
