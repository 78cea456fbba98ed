"""Substitution-matrix parity against reference-dumped golden matrices."""

import json
from pathlib import Path

import numpy as np
import pytest

from prrn_aln_tpu import scoring
from prrn_aln_tpu.config import AlnParams

FIX = Path(__file__).parent / "fixtures"


@pytest.mark.parametrize("pam", [60, 100, 150, 250, 290])
def test_protein_matrix_matches_reference(pam):
    golden = json.loads((FIX / f"pmtx{pam}.json").read_text())
    ref = np.array(golden["mtx"], dtype=np.float64)
    m, info = scoring.protein_matrix(AlnParams(pam=pam))
    assert m.shape == tuple([golden["dim"]] * 2)
    np.testing.assert_allclose(m, ref, rtol=0, atol=1e-6)
    assert info["pam"] == pam
    np.testing.assert_allclose(info["nrmlf"], golden["nrmlf"], rtol=1e-6)
    np.testing.assert_allclose(info["avtrc"], golden["avtrc"], rtol=1e-6)


def test_dna_matrix_matches_reference():
    golden = json.loads((FIX / "nmtx.json").read_text())
    ref = np.array(golden["mtx"], dtype=np.float64)
    # golden dump ran with the reference's swapped slot order: u=2, v=6, n=-4
    m, info = scoring.dna_matrix(AlnParams(u=2.0, v=6.0, n_mismatch=-4.0))
    assert m.shape == tuple([golden["dim"]] * 2)
    np.testing.assert_allclose(m, ref, rtol=0, atol=1e-6)


def test_self_score():
    m, _ = scoring.protein_matrix(AlnParams(pam=150))
    fix = json.loads((FIX / "pairwise_fixtures.json").read_text())
    for name, golden in fix["selfscr"].items():
        seq = fix["seqs"][name]
        if seq["molc"] != 1:
            continue
        codes = np.array(seq["codes"], dtype=np.int64)
        np.testing.assert_allclose(
            scoring.self_score(codes, m), golden, rtol=1e-5)


def test_named_matrix_files(monkeypatch):
    from pathlib import Path
    import numpy as np
    from prrn_aln_tpu import scoring, alphabet as ab
    tab = Path("/root/reference/table")
    if not tab.exists():
        import pytest
        pytest.skip("reference table dir absent")
    monkeypatch.setenv("ALN_TAB", str(tab))
    for name, ww, wc in (("vtml200", 15.0, -6.0), ("blosum62", 11.0, -2.0)):
        m = scoring.read_matrix_file(name)
        W = ab.encode("W", ab.PROTEIN)[0]
        C = ab.encode("C", ab.PROTEIN)[0]
        assert m[W, W] == ww
        assert m[W, C] == wc
        assert np.allclose(m, m.T)
