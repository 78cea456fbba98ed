"""Best-of-n speculative refinement (reference P3, prrn5.cc:594-666):
the batched fan-out must reach the serial path's WSP optimum (the
acceptance order may differ — the reference's threaded mode has the same
freedom — but the objective must not regress), and the -r CLI flag must
drive it."""

import numpy as np
import pytest

from prrn_aln_tpu import alphabet as ab
from prrn_aln_tpu import scoring
from prrn_aln_tpu.config import AlnParams
from prrn_aln_tpu.msa.msa import msa_from_strings
from prrn_aln_tpu.msa.refine import refine_msa
from prrn_aln_tpu.msa.wsp import wsp_score
from prrn_aln_tpu.utils.crand import GlibcRand

ROWS = [
    "MKVLAAGF--DDEERRKKLLICW",
    "MKVLAAGFWEDEE-RRKQLLICW",
    "MKVLAGGF-DDEERRKKLLIC-W",
    "MKVLAAGFDDEE--RRQKLLICW",
    "MKV-AAGFDDEDRRKKLL--ICW",
    "MKVIAAGWFDDEERRKKLLICWW",
]


def _wsp(m, mtx):
    return wsp_score(m, mtx, v=9.0)


@pytest.mark.parametrize("nbatch", [2, 3])
def test_batched_fanout_reaches_serial_optimum(nbatch):
    mtx, _ = scoring.protein_matrix(AlnParams(pam=250))
    base = msa_from_strings(ROWS, ab.PROTEIN)

    serial = refine_msa(base, mtx, u=2.0, v=9.0, sh=-60, maxitr=10,
                        randseed=1, crand=GlibcRand(1))
    batched = refine_msa(base, mtx, u=2.0, v=9.0, sh=-60, maxitr=10,
                         randseed=1, crand=GlibcRand(1), nbatch=nbatch)

    assert serial.improvements > 0          # the case must exercise rir
    assert batched.improvements > 0
    ws = _wsp(serial.msa, mtx)
    wb = _wsp(batched.msa, mtx)
    assert wb >= ws - 1e-3 * max(1.0, abs(ws))


def test_cli_r_flag(tmp_path, capsys):
    from prrn_aln_tpu.cli import prrn_main
    fa = tmp_path / "toy.fa"
    fa.write_text("".join(f">s{i}\n{r.replace('-', '')}\n"
                          for i, r in enumerate(ROWS)))
    rc = prrn_main(["-r", "2", "-YH", "0", str(fa)])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count(">") == 0 or out            # native block output
    assert "s0" in out and "s5" in out
