"""Pallas pairwise kernel vs the banded wavefront scorer (interpret mode
on CPU; the TPU-compiled kernel is validated in bench/TPU sessions)."""

import numpy as np
import pytest

import jax
from jax.experimental import pallas as pl

from prrn_aln_tpu import scoring
from prrn_aln_tpu.config import AlnParams
from prrn_aln_tpu.ops.pairwise import wavefront_scores


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kw):
        kw["interpret"] = True
        kw.pop("compiler_params", None)
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", patched)


def test_pallas_matches_wavefront(interpret_pallas):
    from prrn_aln_tpu.ops import pallas_pairwise as pp
    rng = np.random.default_rng(5)
    B, L = 8, 40
    mtx, _ = scoring.protein_matrix(AlnParams(pam=150))
    a = rng.integers(3, 23, size=(B, L)).astype(np.int32)
    b = rng.integers(3, 23, size=(B, L)).astype(np.int32)
    la = np.full(B, L, np.int32)
    la[1] = 30
    lb = np.full(B, L, np.int32)
    lb[2] = 25
    for i in range(B):
        a[i, la[i]:] = 0
        b[i, lb[i]:] = 0
    got = np.asarray(pp.pallas_pairwise_scores(a, b, la, lb, mtx,
                                               u=2.0, v=9.0))
    want = np.asarray(wavefront_scores(
        a, b, la, lb, -la, lb.astype(np.int32), mtx,
        np.full(B, 2.0, np.float32), np.full(B, 9.0, np.float32),
        np.ones(B, np.float32), np.zeros((B, 4), bool),
        nslot=int((lb + la).max()) + 3, nsteps=int((la + lb).max()),
        dim=25, local=False))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-4)


def test_pallas_banded_matches_wavefront(interpret_pallas):
    """Banded stripe (the production distance-pass configuration,
    reference stripe sh=-60, src/prrn5.cc:1272) must match the banded
    scan scorer slot for slot."""
    from prrn_aln_tpu.ops import pallas_pairwise as pp
    from prrn_aln_tpu.ops.window import stripe
    rng = np.random.default_rng(11)
    B, L = 8, 48
    mtx, _ = scoring.protein_matrix(AlnParams(pam=150))
    a = rng.integers(3, 23, size=(B, L)).astype(np.int32)
    b = rng.integers(3, 23, size=(B, L)).astype(np.int32)
    la = np.array([48, 30, 48, 40, 48, 25, 48, 33], np.int32)
    lb = np.array([48, 48, 22, 48, 37, 48, 29, 48], np.int32)
    for i in range(B):
        a[i, la[i]:] = 0
        b[i, lb[i]:] = 0
    wdws = [stripe(int(la[i]), int(lb[i]), -60) for i in range(B)]
    lw = np.array([w.lw for w in wdws], np.int32)
    up = np.array([w.up for w in wdws], np.int32)
    got = np.asarray(pp.pallas_pairwise_scores(
        a, b, la, lb, mtx, u=2.0, v=9.0, lw=lw, up=up))
    want = np.asarray(wavefront_scores(
        a, b, la, lb, lw, up, mtx,
        np.full(B, 2.0, np.float32), np.full(B, 9.0, np.float32),
        np.ones(B, np.float32), np.zeros((B, 4), bool),
        nslot=int(max(w.width for w in wdws)),
        nsteps=int((la + lb).max()), dim=25, local=False))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-4)


def test_pallas_production_distance_path(interpret_pallas, monkeypatch):
    """all_pairs_scores(backend='pallas') == backend='scan' on the
    distance-pass configuration."""
    from prrn_aln_tpu.msa import distance
    rng = np.random.default_rng(3)
    mtx, _ = scoring.protein_matrix(AlnParams(pam=150))
    seqs = [rng.integers(3, 23, size=rng.integers(25, 60)).astype(np.int32)
            for _ in range(7)]
    got = distance.all_pairs_scores(seqs, mtx, 2.0, 9.0, -60,
                                    backend="pallas")
    want = distance.all_pairs_scores(seqs, mtx, 2.0, 9.0, -60,
                                     backend="scan")
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-4)
