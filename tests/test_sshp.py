"""ssp propensity profiles vs reference makesshpprof dumps.

The fixtures were produced by a small harness linking the reference's
own ssprof/hyprof/hmprof routines (src/mseq.cc:864-1046) over the FULL
sequence range and dumping per-column profiles.  (In the shipped
binaries the subsystem is dormant: profiles are only ever requested
for consreg attack windows shorter than SSWIDTH=17, so makesshpprof
early-returns and -ys/-yh/-yr never change any output — see
DEVIATIONS.md.)

Fixture format: ``SEQ name many=M len=L elems=E`` / M ``R c1 c2 ...``
rows of reference residue codes / L ``P v1 .. vE`` profile rows.
"""

import os

import numpy as np
import pytest

from prrn_aln_tpu import alphabet as ab
from prrn_aln_tpu.msa import sshp

FIX = os.path.join(os.path.dirname(__file__), "fixtures")

# reference protein codes (seq.h:76-90): NIL=0 UNP=1 AMB=2 ALA=3..VAL=22
_REF_ALA = 3


def _load_fixture(name):
    rows, prof = [], []
    with open(os.path.join(FIX, name)) as fh:
        header = fh.readline().split()
        many = int(header[2].split("=")[1])
        length = int(header[3].split("=")[1])
        elems = int(header[4].split("=")[1])
        for line in fh:
            if line.startswith("R "):
                rows.append([int(t) for t in line.split()[1:]])
            elif line.startswith("P"):
                prof.append([float(t) for t in line.split()[1:]])
    codes = np.array(rows, np.int16)
    assert codes.shape == (many, length)
    prof = np.array(prof, np.float64)
    assert prof.shape == (length, elems)
    return codes, prof


def _map_codes(ref_codes):
    """Reference protein codes -> our alphabet codes."""
    out = np.full(ref_codes.shape, ab.ASX, np.int16)   # AMB-ish default
    out[ref_codes <= 1] = ab.GAP
    aa = (ref_codes >= _REF_ALA) & (ref_codes <= _REF_ALA + 19)
    out[aa] = (ref_codes[aa] - _REF_ALA) + ab.ALA
    return out


def _prm():
    return sshp.activate(scnd=1.0, hydr=1.0, hpmt=1.0, hpwing=3,
                         no_angle=1)


@pytest.fixture(autouse=True)
def _cleanup():
    yield
    sshp.deactivate()


@pytest.mark.parametrize("name", ["sshp_ce13a1.txt",
                                  "sshp_ce13a17msa.txt"])
def test_profile_matches_reference(name):
    codes_ref, prof_ref = _load_fixture(name)
    prm = _prm()
    assert prm is not None and prm.nelems == 5
    codes = _map_codes(codes_ref)
    prof = sshp.msa_profile(codes, None, prm)
    assert prof is not None and prof.shape == prof_ref.shape
    np.testing.assert_allclose(prof, prof_ref, rtol=0, atol=2e-4)


def test_score_image_is_weighted_dot():
    prm = _prm()
    rng = np.random.default_rng(0)
    pa = rng.normal(size=(7, 5)).astype(np.float32)
    pb = rng.normal(size=(9, 5)).astype(np.float32)
    img = sshp.score_image(pa, pb, prm)
    want = np.einsum("me,ne,e->mn", pa, pb, prm.factors)
    np.testing.assert_allclose(img, want, rtol=1e-5)


def test_short_sequence_inactive():
    prm = _prm()
    codes = np.full((1, 10), ab.ALA, np.int16)
    assert sshp.msa_profile(codes, None, prm) is None


def test_cli_flag_changes_alignment_score():
    """-ys/-yh genuinely alter our DP score image (unlike the dormant
    reference path)."""
    from prrn_aln_tpu.msa.msa import Msa
    from prrn_aln_tpu.msa import sshp as S

    rng = np.random.default_rng(1)
    codes = (rng.integers(0, 20, size=(2, 40)) + ab.ALA).astype(np.int8)
    A = Msa(codes=codes[:1], molc=ab.PROTEIN, names=["a"])
    B = Msa(codes=codes[1:], molc=ab.PROTEIN, names=["b"])
    assert S.pair_image(A, B) is None          # inactive
    S.activate(scnd=1.0, hydr=1.0)
    img = S.pair_image(A, B)
    assert img is not None and img.shape == (40, 40)
    assert np.abs(img).max() > 0
