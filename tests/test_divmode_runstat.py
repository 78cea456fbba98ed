"""Division modes (-J), RunStat (-E), checkpoint/resume, -e dumps."""

import numpy as np
import pytest

from prrn_aln_tpu import alphabet as ab, scoring
from prrn_aln_tpu.config import default_params
from prrn_aln_tpu.msa.msa import msa_from_strings
from prrn_aln_tpu.msa.refine import refine_msa
from prrn_aln_tpu.msa.wsp import wsp_score
from prrn_aln_tpu.utils.runstat import (RunStat, save_checkpoint,
                                        load_checkpoint)

ROWS = ["MKVL-AAGW", "MKVLWA-GW", "MKILWA-GW",
        "MRVLWAAG-", "MRVLWQAG-"]


def _setup():
    m = msa_from_strings(ROWS, ab.PROTEIN, [f"s{i}" for i in range(5)])
    params = default_params(ab.PROTEIN, "prrn")
    mtx, _ = scoring.build_matrix(ab.PROTEIN, params)
    return m, params, mtx


@pytest.mark.parametrize("divmode", ["one", "tree", "all", "part"])
def test_divmodes_never_degrade_wsp(divmode):
    m, params, mtx = _setup()
    before = wsp_score(m, mtx, v=params.v)
    res = refine_msa(m, mtx, u=params.u, v=params.v, sh=params.sh,
                     maxitr=2, randseed=1, divmode=divmode)
    after = wsp_score(res.msa, mtx, v=params.v)
    assert res.msa.many == 5
    assert after >= before - 1e-6
    # members preserved exactly
    for i in range(5):
        got = res.msa.codes[i][res.msa.codes[i] > ab.GAP]
        want = m.codes[i][m.codes[i] > ab.GAP]
        assert np.array_equal(got, want)


def test_runstat_stamps(tmp_path, capsys):
    rs = RunStat()
    dest = tmp_path / "stat.txt"
    rs.setfmessg(str(dest))
    rs.stamp(0)
    rs.stamp(1)
    rs.stamp(2)
    rs.conclude()
    text = dest.read_text()
    assert "secs" in text and "mins" in text
    assert len(text.split("\t")) == 3        # two intervals + total


def test_checkpoint_roundtrip(tmp_path):
    m, params, mtx = _setup()
    f = tmp_path / "ck.npz"
    save_checkpoint(f, m, randseed=7, iteration=3)
    back, meta = load_checkpoint(f)
    assert meta["randseed"] == 7 and meta["iteration"] == 3
    assert back.names == m.names
    assert np.array_equal(back.codes, m.codes)


def test_cli_resume_and_runstat(tmp_path):
    from prrn_aln_tpu.cli import prrn_main
    m, params, mtx = _setup()
    ck = tmp_path / "ck.npz"
    save_checkpoint(ck, m, randseed=1, iteration=0)
    out = tmp_path / "out.fa"
    stat = tmp_path / "stat.txt"
    rc = prrn_main(["--resume", str(ck), "-F", "fasta", "-o", str(out),
                    "-E", str(stat)])
    assert rc == 0
    assert out.read_text().startswith(">s0")
    assert "secs" in stat.read_text()
