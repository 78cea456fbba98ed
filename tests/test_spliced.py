"""Spliced alignment (aln -G / fwd2s) parity tests.

Fixtures were produced by an instrumented reference build
(oracle `splice` mode: align2 over Fwd2s<RVPDJ_nv> with aln's
setdefparam defaults) and by the reference `aln -G -O<mode>` binary.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from prrn_aln_tpu import alphabet as ab, scoring
from prrn_aln_tpu.config import default_params
from prrn_aln_tpu.ops.spliced_np import spliced_align_np, stdskl
from prrn_aln_tpu.ops.window import stripe
from prrn_aln_tpu.splice import output as so
from prrn_aln_tpu.splice.api import spliced_align
from prrn_aln_tpu.splice.gsinfo import gene_structure
from prrn_aln_tpu.splice.penalty import IntronPenalty
from prrn_aln_tpu.splice.signals import SpliceSignals

FIX = Path(__file__).parent / "fixtures"


def _load(case):
    d = json.loads((FIX / f"splice_gen{case}.json").read_text())
    gen = "".join(l.strip() for l in
                  (FIX / f"gen{case}.fa").read_text().splitlines()
                  if not l.startswith(">"))
    cdna = "".join(l.strip() for l in
                   (FIX / f"cdna{case}.fa").read_text().splitlines()
                   if not l.startswith(">"))
    return d, gen, cdna


@pytest.fixture(scope="module", params=[1, 2])
def case(request):
    d, gen, cdna = _load(request.param)
    bg = ab.encode(gen, ab.DNA)
    ac = ab.encode(cdna, ab.DNA)
    mtx, _ = scoring.dna_matrix(default_params(ab.DNA, "aln"))
    sig = SpliceSignals.build(bg)
    ipen = IntronPenalty.build()
    w = stripe(len(ac), len(bg), -50)
    score, skl = spliced_align_np(ac, bg, sig, ipen, mtx,
                                  lw=w.lw, up=w.up)
    gs = gene_structure(ac, bg, skl, sig, ipen, mtx)
    return dict(n=request.param, d=d, gen=gen, cdna=cdna, sig=sig,
                ipen=ipen, score=score, skl=skl, gs=gs)


def test_intron_penalty_table(case):
    ref = np.array(case["d"]["penalty"])
    mine = np.array([case["ipen"].penalty(i) for i in range(len(ref))])
    assert np.abs(mine - ref).max() < 1e-3


def test_signal_arrays(case):
    d, sig = case["d"], case["sig"]
    assert ((np.array(d["donor"]) > 0) == (sig.cano5 > 0)).all()
    assert ((np.array(d["accpt"]) > 0) == (sig.cano3 > 0)).all()
    assert np.abs(np.array(d["sig5"]) - sig.sig5).max() < 1e-3
    assert np.abs(np.array(d["sig3"]) - sig.sig3).max() < 1e-3
    for m, n, v in d["sig53pair"][:200]:
        assert abs(sig.sig53_pair(m, n) - v) < 1e-3


def test_dp_score_and_path(case):
    d = case["d"]
    assert case["score"] == pytest.approx(d["score"], abs=1e-3)
    assert case["skl"] == [tuple(x) for x in d["skl"]]


def test_exon_records(case):
    d, gs = case["d"], case["gs"]
    refs = d["eijnc"][:-1]
    assert len(gs.exons) == len(refs)
    for mine, ref in zip(gs.exons, refs):
        assert (mine.left, mine.right) == (ref["left"], ref["right"])
        assert (mine.rleft, mine.rright) == (ref["rleft"], ref["rright"])
        assert (mine.mch, mine.mmc, mine.unp) == \
            (ref["mch"], ref["mmc"], ref["unp"])
        assert mine.escr == pytest.approx(ref["escr"], abs=2e-3)
        miscr = mine.iscr if mine.iscr > -1e29 else 0.0
        assert miscr == pytest.approx(ref["iscr"], abs=2e-3)
        assert mine.sig3 == pytest.approx(ref["sig3"], abs=2e-3)
        assert mine.sig5 == pytest.approx(ref["sig5"], abs=2e-3)
    assert gs.score == pytest.approx(d["fstat"]["val"], abs=2e-3)
    assert gs.mch == d["fstat"]["mch"]
    assert gs.mmc == d["fstat"]["mmc"]
    assert gs.gap == pytest.approx(d["fstat"]["gap"])
    assert gs.unp == d["fstat"]["unp"]


@pytest.mark.parametrize("mode,suffix", [
    (0, "O0"), (2, "O2"), (3, "O3"), (4, "O4"), (5, "O5"),
    (1, "default"),
])
def test_output_formats_byte_exact(case, mode, suffix):
    n = case["n"]
    golden = (FIX / f"aln_G_gen{n}_{suffix}.txt").read_text()
    res = spliced_align(case["gen"], case["cdna"],
                        gname=f"gen{n}", qname=f"cdna{n}")
    assert res.render(mode) == golden


def test_api_exons(case):
    n = case["n"]
    res = spliced_align(case["gen"], case["cdna"],
                        gname=f"gen{n}", qname=f"cdna{n}")
    want = [(r["left"] + 1, r["right"]) for r in case["d"]["eijnc"][:-1]]
    assert res.exons == want
    assert len(res.gs.cigar) > 0


def test_stdskl_interpolates_bend():
    # mixed segment is split diagonal-first
    assert stdskl([(0, 0), (5, 8)]) == [(0, 0), (5, 5), (5, 8)]
    # pure segments with direction change keep the bend knot
    assert stdskl([(0, 0), (5, 5), (5, 8), (9, 12)]) == \
        [(0, 0), (5, 5), (5, 8), (9, 12)]


def test_cli_spliced(tmp_path, capsys):
    from prrn_aln_tpu.cli import aln_main
    d, gen, cdna = _load(1)
    g = tmp_path / "g.fa"
    c = tmp_path / "c.fa"
    g.write_text(">gen1\n" + gen + "\n")
    c.write_text(">cdna1\n" + cdna + "\n")
    assert aln_main(["-G", "-O4", str(g), str(c)]) == 0
    out = capsys.readouterr().out
    assert out == (FIX / "aln_G_gen1_O4.txt").read_text()
