"""Pallas spliced-H wave kernel vs the NumPy oracle.

The kernel (ops/pallas_spliced_h) is TPU-resident; interpret mode
executes its ~36k-wave grid through the Pallas interpreter at minutes
per case, so these tests only run against a real TPU backend
(PRRN_TPU_TESTS=1).  The standard windows (one-intron, two-intron,
api bonus, tiny) are asserted score- and knot-identical to the
oracle; CPU CI covers the same cases through the lax.scan engine
(test_spliced_h_jax.py), which the kernel is formula-identical to.
"""

import os
from pathlib import Path

import pytest

requires_tpu = pytest.mark.skipif(
    os.environ.get("PRRN_TPU_TESTS") != "1",
    reason="Pallas spliced kernel runs on TPU only "
           "(set PRRN_TPU_TESTS=1 on TPU hardware)")

NAS = Path("/root/reference/sample/nas")
PAS = Path("/root/reference/sample/pas")


@requires_tpu
@pytest.mark.parametrize("win,qlen", [
    ((31549, 32450), 60),      # one intron
    ((31549, 33100), 110),     # two introns
    ((31614, 31800), 30),      # tiny
])
def test_pallas_vs_oracle(win, qlen, monkeypatch):
    monkeypatch.setenv("PRRN_H_PALLAS", "1")
    from prrn_aln_tpu import io
    import sys
    sys.path.insert(0, str(Path(__file__).parent))
    import test_spliced_h_jax as T
    g = io.sniff_and_read(NAS / "CET10B9")[0].seq.upper()[win[0]:win[1]]
    recs = io.read_fasta(PAS / "ce13a17.fa")
    p = {r.name: r.seq for r in recs}["ce13a1"][:qlen]
    (s_np, k_np), (s_dv, k_dv) = T._run_both(g, p, sh_pct=100)
    assert abs(s_dv - s_np) <= 1e-3 * max(1.0, abs(s_np))
    assert k_dv == k_np
