"""Pallas group kernel vs lax.scan engine: identical planes and paths.

The Pallas wavefront kernel (ops/pallas_group.py) must reproduce the
scan engine (ops/group.py::_wavefront_core) — scores to float
reassociation accuracy and SKL paths exactly — on the same inputs,
including weighted members, uneven group sizes, banding, and the
reference galign fixtures (which are themselves golden-tested against
align2, src/maln2.cc:1875).  Runs in interpret mode off-TPU.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from prrn_aln_tpu import scoring, alphabet as ab
from prrn_aln_tpu.config import AlnParams
from prrn_aln_tpu.msa.msa import Msa, msa_from_strings
from prrn_aln_tpu.msa import distance, tree
from prrn_aln_tpu.ops import group as gops

FIX = Path(__file__).parent / "fixtures"
GFIX = json.loads((FIX / "galign_fixtures.json").read_text())
MTX, _ = scoring.protein_matrix(AlnParams(pam=150))


@pytest.fixture(autouse=True)
def _restore_engine():
    yield
    gops.USE_PALLAS_GROUP = None


def _rand_msa(rng, many, L, gap=0.08, weighted=False):
    codes = (rng.integers(0, 20, size=(many, L)) + ab.ALA).astype(np.int8)
    gaps = rng.random((many, L)) < gap
    codes[gaps] = ab.GAP
    codes[:, 0] = ab.ALA + rng.integers(0, 20)   # no all-gap column 0
    m = Msa(codes=codes, molc=ab.PROTEIN,
            names=[f"s{i}" for i in range(many)])
    if weighted:
        m.weight = rng.random(many).astype(np.float64) + 0.5
    m.prepare(MTX.shape[0])
    return m


def _run_both(pairs, pads, sh=-60, spb=0.0, scale=1.0):
    gops.USE_PALLAS_GROUP = False
    want = gops.group_align_batch(pairs, MTX, u=2.0, v=9.0, sh=sh,
                                  pads=pads, spb=spb, scale=scale)
    gops.USE_PALLAS_GROUP = True
    got = gops.group_align_batch(pairs, MTX, u=2.0, v=9.0, sh=sh,
                                 pads=pads, spb=spb, scale=scale)
    return want, got


def _check(want, got):
    for (sw, kw), (sg, kg) in zip(want, got):
        assert sg == pytest.approx(sw, rel=1e-5, abs=1e-3)
        assert kg == kw


def test_random_batch_matches_scan():
    rng = np.random.default_rng(11)
    pairs = [(_rand_msa(rng, rng.integers(1, 6), rng.integers(40, 90)),
              _rand_msa(rng, rng.integers(1, 6), rng.integers(40, 90)))
             for _ in range(6)]
    want, got = _run_both(pairs, pads=(6, 96))
    _check(want, got)


def test_weighted_narrow_band():
    rng = np.random.default_rng(5)
    pairs = [(_rand_msa(rng, 4, 70, weighted=True),
              _rand_msa(rng, 3, 80, weighted=True)) for _ in range(3)]
    want, got = _run_both(pairs, pads=(4, 96), sh=-30, scale=2.5)
    _check(want, got)


def test_single_pair_ls3_matches_scan():
    """group_align single-pair path incl. the double-affine (ls=3)
    long-gap lanes (fwd2c.h g2/f2)."""
    rng = np.random.default_rng(17)
    from prrn_aln_tpu.ops.window import stripe
    for ls in (1, 3):
        A = _rand_msa(rng, 3, 60)
        B = _rand_msa(rng, 2, 75)
        wdw = stripe(A.length, B.length, -60)
        gops.USE_PALLAS_GROUP = False
        sw, kw = gops.group_align(A, B, MTX, u=2.0, v=9.0, wdw=wdw,
                                  pads=(4, 96), ls=ls)
        gops.USE_PALLAS_GROUP = True
        sg, kg = gops.group_align(A, B, MTX, u=2.0, v=9.0, wdw=wdw,
                                  pads=(4, 96), ls=ls)
        assert sg == pytest.approx(sw, rel=1e-5, abs=1e-3)
        assert kg == kw


def test_galign_fixture_pairs():
    def build(fname, weighted):
        info = GFIX["files"][fname]
        m = msa_from_strings(info["rows"], ab.PROTEIN, info["names"])
        if weighted:
            if m.many == 1:
                m.weight = np.array([1.0])
            elif m.many == 2:
                m.weight = np.array([0.5, 0.5])
            else:
                d = distance.msa_distance_matrix(m.codes)
                t = tree.upgma(d, m.many)
                m.weight = tree.calc_seq_weights(t)
        m.prepare(MTX.shape[0])
        return m

    pairs = []
    for case in GFIX["cases"][:6]:
        weighted = "wa" in case
        A = build(case["a"], weighted)
        B = build(case["b"], weighted)
        if case["swp"]:
            A, B = B, A
        pairs.append((A, B))
    an_pad = max(m.many for ab_ in pairs for m in ab_)
    want, got = _run_both(pairs, pads=(an_pad, 64))
    _check(want, got)
