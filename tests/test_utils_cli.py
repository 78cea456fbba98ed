"""Utility CLI parity tests: iden, decomp, makmdm/makdbs, aln -M."""

import contextlib
import io as sio
import sys
from pathlib import Path

import numpy as np
import pytest

FIX = Path(__file__).parent / "fixtures"


def _capture(fn, argv):
    buf = sio.StringIO()
    err = sio.StringIO()
    with contextlib.redirect_stdout(buf):
        old = sys.stderr
        sys.stderr = err
        try:
            rc = fn(argv)
        finally:
            sys.stderr = old
    return rc, buf.getvalue(), err.getvalue()


@pytest.mark.parametrize("a,b,golden", [
    ("idn_a.fa", "idn_b.fa", "idn_dna.txt"),
    ("idn_p.fa", "idn_q.fa", "idn_pro.txt"),
])
def test_iden_byte_exact(a, b, golden):
    from prrn_aln_tpu.cli import iden_main
    rc, out, _ = _capture(iden_main, [str(FIX / a), str(FIX / b)])
    assert rc == 0
    assert out == (FIX / golden).read_text()


def test_iden_score_mode():
    from prrn_aln_tpu.cli import iden_main
    rc, out, _ = _capture(iden_main,
                          ["-O", "0", "-t", "50",
                           str(FIX / "idn_a.fa"), str(FIX / "idn_b.fa")])
    assert rc == 0
    assert out.split() == ["seqA", "seqB", "7"]


def test_decomp_split(tmp_path):
    from prrn_aln_tpu.cli import decomp_main
    src = tmp_path / "multi.fa"
    src.write_text(">sp|P12345|ABC_HUMAN test\nACDEFG\nHIKL\n"
                   ">seq-2.1 other\nMNPQ\n>plain\nWXYZ\n")
    outdir = tmp_path / "out"
    outdir.mkdir()
    rc, out, _ = _capture(decomp_main,
                          ["-p", str(outdir), str(src)])
    assert rc == 0
    # reference naming: last |-field, non-[alnum._] dropped
    assert sorted(p.name for p in outdir.iterdir()) == \
        ["ABC_HUMAN", "plain", "seq2.1"]
    assert (outdir / "ABC_HUMAN").read_text() == \
        ">sp|P12345|ABC_HUMAN test\nACDEFG\nHIKL\n"
    assert (outdir / "seq2.1").read_text() == ">seq-2.1 other\nMNPQ\n"


def test_makmdm_and_makdbs(tmp_path):
    from prrn_aln_tpu.cli import makmdm_main, makdbs_main
    rc, out, _ = _capture(makmdm_main, ["150", "-d", str(tmp_path)])
    assert rc == 0
    text = (tmp_path / "mdm150").read_text()
    assert text.startswith("# mdm150")
    assert len(text.splitlines()) == 26        # header + 25x25 matrix

    rc, out, _ = _capture(
        makdbs_main, [str(FIX / "dnafam.fa"), "-b",
                      str(tmp_path / "db")])
    assert rc == 0
    from prrn_aln_tpu.native import SeqDB
    db = SeqDB(tmp_path / "db")
    assert len(db) == 6


def test_aln_both_strands(tmp_path):
    import random
    from prrn_aln_tpu.cli import aln_main
    random.seed(5)
    s = "".join(random.choice("ACGT") for _ in range(120))
    comp = {"A": "T", "T": "A", "C": "G", "G": "C"}
    rc_seq = "".join(comp[c] for c in reversed(s))
    (tmp_path / "x.fa").write_text(">x\n" + s + "\n")
    (tmp_path / "y.fa").write_text(">y\n" + rc_seq + "\n")
    rc, out, err = _capture(
        aln_main, ["-M", str(tmp_path / "x.fa"), str(tmp_path / "y.fa")])
    assert rc == 0
    assert "strand -" in err
    assert "240.0" in err


def test_aln_local_colonies_byte_exact():
    from prrn_aln_tpu.cli import aln_main
    rc, out, _ = _capture(aln_main, ["-Ls", str(FIX / "loc_a.fa"),
                                     str(FIX / "loc_b.fa")])
    assert rc == 0
    assert out == (FIX / "loc_single.txt").read_text()
    rc, out, _ = _capture(aln_main, ["-Ls", "-C", "4", "-w", "300",
                                     str(FIX / "loc_a.fa"),
                                     str(FIX / "loc_b.fa")])
    assert rc == 0
    assert out == (FIX / "loc_multi.txt").read_text()


def test_swg_colonies_vs_oracle():
    import json
    from prrn_aln_tpu import alphabet as ab, scoring
    from prrn_aln_tpu.config import default_params
    from prrn_aln_tpu.ops.local_np import swg_colonies
    A = "".join(l.strip() for l in (FIX / "loc_a.fa").read_text()
                .splitlines() if not l.startswith(">"))
    B = "".join(l.strip() for l in (FIX / "loc_b.fa").read_text()
                .splitlines() if not l.startswith(">"))
    ca, cb = ab.encode(A, ab.DNA), ab.encode(B, ab.DNA)
    mtx, _ = scoring.dna_matrix(default_params(ab.DNA, "aln"))
    for mlt, sh, fn in ((1, -50, "swg1.json"), (2, 300, "swg2.json")):
        ref = json.loads((FIX / fn).read_text())["colonies"]
        mine = swg_colonies(ca, cb, mtx, mlt=mlt, sh=sh)
        assert [(c.val, c.mlb, c.mrb, c.nlb, c.nrb) for c in mine] == \
            [(r["val"], r["mlb"], r["mrb"], r["nlb"], r["nrb"])
             for r in ref]


def test_gaps_snapshot_roundtrip(tmp_path):
    """prntgap/readgap (prrn5.cc:287-309): snapshot + rebuild."""
    from prrn_aln_tpu import io, alphabet as ab
    recs = io.sniff_and_read(
        "/root/repo/tests/fixtures/golden_prrn_default7.txt")
    msa = io.records_to_msa(recs, ab.PROTEIN)
    f = tmp_path / "gaps.txt"
    io.write_gaps_list(msa, f)
    text = f.read_text()
    assert text.startswith(f"Gaps structure: {msa.many}\n")
    gl = io.read_gaps_list(f)
    rebuilt = io.apply_gaps_list(msa, gl)
    assert rebuilt.codes.shape == msa.codes.shape
    assert (rebuilt.codes == msa.codes).all()


def test_tree_sorted_output(tmp_path, capsys):
    """-ps reorders rows by tree leaf order; content preserved."""
    from prrn_aln_tpu import io, alphabet as ab
    recs = io.sniff_and_read(
        "/root/repo/tests/fixtures/golden_prrn_default7.txt")
    msa = io.records_to_msa(recs, ab.PROTEIN)
    ts = io.tree_sorted(msa)
    assert sorted(ts.names) == sorted(msa.names)
    for nm in msa.names:
        i, j = msa.names.index(nm), ts.names.index(nm)
        assert (msa.codes[i] == ts.codes[j]).all()


def test_prrn_progress_lines(tmp_path, capsys, monkeypatch):
    """-V emits the per-pass WSP progress line (prrn5.cc:772-780)."""
    import subprocess, sys
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "from prrn_aln_tpu.cli import prrn_main;"
         "prrn_main(['-V','-o','/dev/null',"
         "'/root/reference/sample/pas/ce13a17.fa'])"],
        capture_output=True, text=True, cwd="/root/repo", timeout=600)
    assert r.returncode == 0
    assert "<--" in r.stderr and "grp," in r.stderr
